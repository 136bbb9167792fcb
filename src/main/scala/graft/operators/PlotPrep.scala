package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Plot-data sink — the engine-side half of the reference's plot
  * utilities (`plot_cyclical_time_features` / `plot_dataset`,
  * powerdatapipeline/datapipeline/datapipeline_utilities.py:131-180,
  * which draw each feature column against the sample index and savefig).
  *
  * At engine scale a plot is a BOUNDED series, not raw points: no
  * renderer draws 100 TB, so the sink's job is to reduce each feature to
  * ≤ `nBuckets` rows carrying enough shape to draw faithfully — the
  * per-bucket mean plus the (min, max) envelope, the standard
  * min/max-decimation used by time-series dashboards (peaks survive;
  * a mean-only downsample would erase them). Rendering itself (the
  * reference's matplotlib side effect) stays outside the engine: any
  * plotting client draws the returned frame, and the CSV sink writes it.
  *
  * Scale design: bucket assignment is pure per-row integer arithmetic
  * against a broadcast 1-row (min, max) aggregate of the index column —
  * no sort, no window; then ONE map-side-combined aggregation over
  * (feature, bucket). Output is features × nBuckets rows regardless of
  * input size. The unpivot (explode of a features-long struct array)
  * multiplies rows BEFORE the partial aggregation but never shuffles
  * them — only (feature, bucket) partials move.
  */
object PlotPrep {

  /** Per-(feature, bucket) envelope: `feature, bucket, mean, vmin, vmax,
    * n`, buckets 0 until nBuckets over the [min, max] span of `indexCol`
    * (both endpoints inclusive; the max index lands in the last bucket).
    * `features` are (name, expression) pairs evaluated per row.
    *
    * Aggregates are rounded to 6 digits: feature expressions are
    * typically transcendental (sin/cos encodings), where engines'
    * last-ulp libm and summation-order differences sit ~1e-15 — far
    * inside a 6-digit boundary — and the true bucket mean of
    * transcendental values is never exactly ON a boundary (the
    * small-denominator-rational hazard that forbids rounding exact
    * decimal means does not apply).
    */
  def envelope(df: DataFrame, indexCol: String,
               features: Seq[(String, Column)], nBuckets: Int): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    val span = df.agg(min(col(indexCol)).as("mn"), max(col(indexCol)).as("mx"))
    val fv = array(features.map { case (n, c) =>
      struct(lit(n).as("feature"), c.cast("double").as("v"))
    }: _*)
    df.crossJoin(broadcast(span))
      .withColumn("bucket",
        expr(s"CAST((($indexCol - mn) * $nBuckets) DIV (mx - mn + 1) AS BIGINT)"))
      .select(col("bucket"), explode(fv).as("f"))
      .groupBy(col("f.feature").as("feature"), col("bucket"))
      .agg(round(avg(col("f.v")), 6).as("mean"),
        round(min(col("f.v")), 6).as("vmin"),
        round(max(col("f.v")), 6).as("vmax"),
        count(lit(1)).as("n"))
  }
}
