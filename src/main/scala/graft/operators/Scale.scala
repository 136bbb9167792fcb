package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-out utilities: skew-salted aggregation and bucketed layouts for
  * co-located joins. Nothing here changes query semantics — these are
  * plan-shape tools for the 100 TB deployment (AQE's skew handling
  * covers joins automatically; salting covers skewed *aggregations*,
  * which AQE does not split).
  */
object Scale {

  /** Two-stage skew-salted aggregation: stage 1 aggregates partial
    * states on (key, salt) — spreading a hot key over `saltBuckets`
    * reducers — stage 2 merges partials per key. Caller supplies
    * algebraic partial/merge pairs (sum/sum, count/sum, min/min...).
    *
    * Example: hot `user_id` count+sum:
    * {{{
    * Scale.saltedAgg(df, Seq("user_id"), 16,
    *   partials = Seq(count(lit(1)).as("n"), sum($"value").as("s")),
    *   merged   = Seq(sum($"n").as("n"), sum($"s").as("s")))
    * }}}
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltBuckets: Int,
                partials: Seq[Column], merged: Seq[Column]): DataFrame = {
    require(saltBuckets > 0)
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val stage1 = salted.groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partials.head, partials.tail: _*)
    stage1.groupBy(keys.map(col): _*)
      .agg(merged.head, merged.tail: _*)
  }

  /** Write a DataFrame bucketed + sorted by a join key so future
    * equi-joins/aggregations on that key read co-located, pre-sorted
    * buckets (no shuffle at read time). Saved as a table (bucketing
    * metadata lives in the catalog).
    */
  def writeBucketed(df: DataFrame, table: String, keyCol: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, keyCol)
      .sortBy(keyCol)
      .format("parquet")
      .saveAsTable(table)

  /** Hive-style partitioned parquet layout: one directory per value of
    * `partCols` (e.g. `lang=en/`, `dt=2026-01-01/`). At 100 TB this is
    * the difference between scanning the corpus and scanning a slice: a
    * filter on a partition column prunes whole directories at PLANNING
    * time (`PartitionFilters` in the scan, asserted in ScaleSpec), so a
    * per-language or per-day query never opens the other files.
    * Partition columns should be low-cardinality (each value is a
    * directory + at least one file; a high-cardinality partition key
    * produces millions of small files and kills the listing).
    */
  def writePartitioned(df: DataFrame, path: String, partCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partCols: _*).parquet(path)
}
