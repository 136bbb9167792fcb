package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Union of all query groups. Keys must be unique across groups; the
  * `require` below guards against silent shadowing in the Map merge.
  *
  * Execution order matters for attributable benchmarks: `families`
  * exposes a DETERMINISTIC (family, sorted keys) sequence so Bench/Verify
  * timings stay comparable run-over-run even as queries are added — a
  * HashMap iteration order reshuffles whenever any key is added, which
  * made round-over-round per-query numbers incomparable.
  */
object Registry {
  private val groups: Seq[(String, Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      ("core", CoreQueries.queries, CoreQueries.oracleSql),
      ("feature", FeatureQueries.queries, FeatureQueries.oracleSql),
      ("window", WindowQueries.queries, WindowQueries.oracleSql),
      ("join", JoinQueries.queries, JoinQueries.oracleSql),
      ("text", TextQueries.queries, TextQueries.oracleSql),
      ("dedup", DedupQueries.queries, DedupQueries.oracleSql),
      ("sim", SimQueries.queries, SimQueries.oracleSql),
      ("rel", RelQueries.queries, RelQueries.oracleSql),
      ("ts", TsQueries.queries, TsQueries.oracleSql),
    )

  /** (family name, alphabetically ordered query keys) in declared group
    * order — the canonical execution order for Bench and Verify.
    */
  val families: Seq[(String, Seq[String])] =
    groups.map { case (name, qs, _) => name -> qs.keys.toSeq.sorted }

  val queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = groups.flatMap(_._2)
    require(all.map(_._1).distinct.size == all.size, "duplicate query keys across groups")
    all.toMap
  }

  val oracleSql: Map[String, String] = groups.flatMap(_._3).toMap
}
