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

  /** Two-sided skew-salted equi-join: the probe (fact) side gets a
    * deterministic salt in [0, saltBuckets) and the build (dimension)
    * side is replicated once per salt value, so the join key becomes
    * (key, salt) and a hot probe key's rows spread over `saltBuckets`
    * tasks instead of landing in one. This is the standard mitigation
    * for the 100 TB fusion-join hot spot (one device/user id owning a
    * large fraction of the fact rows) when the dimension is too large
    * to broadcast — the case AQE's skew-join split also targets, but
    * salting works on the FIRST run (no runtime re-plan needed) and
    * under any join strategy.
    *
    * `saltExpr` must be deterministic (content-addressed, e.g. a row id
    * — the same convention as the sampling operators) so the join output
    * is reproducible row-for-row; the salt columns are internal and
    * dropped from the output, which is therefore EXACTLY the unsalted
    * join's output. Build-side replication costs |build| × saltBuckets
    * rows — size saltBuckets to the skew factor, not higher.
    *
    * The build side carries a SHUFFLE_HASH hint: with a dimension small
    * enough for the stats to suggest broadcasting (as in local testing),
    * Spark would otherwise pick a BroadcastHashJoin, where no skew
    * exists to mitigate; the hint pins the plan that the
    * too-big-to-broadcast production dimension would get.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, probeKey: String,
                 buildKey: String, saltExpr: Column, saltBuckets: Int): DataFrame = {
    require(saltBuckets > 0)
    val p = probe.withColumn("__psalt", pmod(saltExpr, lit(saltBuckets)).cast("int"))
    val b = build.withColumn("__bsalt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    p.join(b.hint("shuffle_hash"),
        p(probeKey) === b(buildKey) && col("__psalt") === col("__bsalt"))
      .drop("__psalt", "__bsalt")
  }

  /** Drop `table` and its warehouse directory if either survives from an
    * earlier session. The default session-scoped catalog forgets tables
    * across JVMs while their warehouse directories persist on disk; an
    * orphaned location then fails a fresh `saveAsTable` with
    * LOCATION_ALREADY_EXISTS even under overwrite mode, so rebuilding a
    * persisted artifact (index tables, bucketed relations) must clear
    * both the catalog entry and the stale path.
    */
  private def dropStale(df: DataFrame, table: String): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val path = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      table.toLowerCase(java.util.Locale.ROOT))
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) fs.delete(path, true)
  }

  /** Write a DataFrame bucketed + sorted by a join key so future
    * equi-joins/aggregations on that key read co-located, pre-sorted
    * buckets (no shuffle at read time). Saved as a table (bucketing
    * metadata lives in the catalog).
    */
  def writeBucketed(df: DataFrame, table: String, keyCol: String, buckets: Int): Unit = {
    dropStale(df, table)
    df.write.mode("overwrite")
      .bucketBy(buckets, keyCol)
      .sortBy(keyCol)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Append rows to an EXISTING bucketed table with a matching bucket
    * spec — the incremental-index write: new rows land in their key's
    * bucket files without touching (or re-shuffling) the base data.
    * The bucket spec must match [[writeBucketed]]'s or Spark rejects
    * the append.
    */
  def appendBucketed(df: DataFrame, table: String, keyCol: String, buckets: Int): Unit =
    df.write.mode("append")
      .bucketBy(buckets, keyCol)
      .sortBy(keyCol)
      .format("parquet")
      .saveAsTable(table)

  /** Plain (unbucketed) managed-table write with the same
    * stale-location handling as [[writeBucketed]] — for small persisted
    * artifacts (learned scales, codebook metadata) that no join keys on.
    */
  def saveTable(df: DataFrame, table: String): Unit = {
    dropStale(df, table)
    df.write.mode("overwrite").format("parquet").saveAsTable(table)
  }

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

  /** Morton/Z-order key over the low 16 bits of two dimensions — the
    * classic 4-step bit-spread interleave, pure codegen'd integer
    * arithmetic (the `zorder_key` query audits its locality contract;
    * RelQueries renders the same step list for the DuckDB oracle).
    */
  private val MortonSteps =
    Seq((8, 0x00FF00FFL), (4, 0x0F0F0F0FL), (2, 0x33333333L), (1, 0x55555555L))

  private def spread(c: Column): Column =
    MortonSteps.foldLeft(c) { case (v, (sh, m)) =>
      v.bitwiseOR(shiftleft(v, sh)).bitwiseAND(lit(m))
    }

  def mortonKey(x: Column, y: Column): Column =
    spread(x).bitwiseOR(shiftleft(spread(y), 1))

  /** Z-order-clustered parquet layout: range-partition + locally sort by
    * the Morton key, so every output FILE covers a narrow range of BOTH
    * constituent dimensions and the parquet footer min/max statistics
    * prune files for predicates on EITHER — one sort order, two
    * pruning dimensions (Delta's OPTIMIZE ZORDER BY; ScaleSpec proves
    * the file-level pruning win against the natural layout). `n` sets
    * the file count: at 100 TB pick it from the target file size
    * (~1 GB), not the executor count.
    */
  def writeZOrdered(df: DataFrame, path: String, zkey: Column, n: Int): Unit =
    df.repartitionByRange(n, zkey).sortWithinPartitions(zkey)
      .write.mode("overwrite").parquet(path)
}
