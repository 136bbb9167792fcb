package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Deterministic sampling for training-data curation. Everything here is
  * content-addressed (hash of a stable id), never RNG-seeded: the same
  * row lands in the same sample on every engine, every run, and every
  * partitioning — which is what makes a 100 TB sample reproducible,
  * auditable, and incrementally extendable (new data can be sampled
  * later without re-drawing the old rows).
  */
object Sampling {

  /** Stratified sample with per-stratum keep percentages: a row in
    * stratum `s` survives iff `hash(id) mod 100 < pct(s)` — so each
    * stratum is downsampled to (approximately) its quota while the
    * selection stays deterministic in row content.
    *
    * Scale shape: the rates table is tiny and BROADCAST; the hash filter
    * is a per-row codegen'd expression, so the whole operator is one
    * narrow scan-side pass — no shuffle, and Parquet column pruning
    * still applies to every untouched column. This is the standard
    * "rebalance the language/source mix" stage of an LLM data pipeline.
    *
    * @param rates      stratum value → keep percentage in [0, 100]
    * @param defaultPct keep percentage for strata absent from `rates`
    */
  def stratified(df: DataFrame, strataCol: String, idCol: String,
                 rates: Map[String, Int], defaultPct: Int): DataFrame = {
    require((rates.values ++ Seq(defaultPct)).forall(p => p >= 0 && p <= 100),
      s"keep percentages must be in [0, 100]: $rates default=$defaultPct")
    val spark = df.sparkSession
    import spark.implicits._
    val ratesDf = rates.toSeq.toDF(strataCol, "__keep_pct")
    df.join(broadcast(ratesDf), Seq(strataCol), "left")
      .filter(TextOps.hash60(col(idCol).cast("string")) % 100 <
        coalesce(col("__keep_pct"), lit(defaultPct)))
      .drop("__keep_pct")
  }
}
