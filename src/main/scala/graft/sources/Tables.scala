package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver testdata layout
  * (`/root/testdata/sf{N}/{name}.parquet`, see repo:TESTDATA.md).
  *
  * The reference's only connector is CSV
  * (`powerdatapipeline/datapipeline/tfdataset.py:16-52`); our engine treats
  * parquet as the primary columnar source (scan-time column pruning +
  * predicate pushdown are free via Catalyst) and keeps CSV as a secondary
  * source in [[CsvSource]].
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
  /** `events.ts` normalization — the driver's testdata generator has
    * shipped two physical encodings across rounds, and the engine accepts
    * both, always landing on TimestampType µs UTC (DuckDB's view):
    *  - ns-precision INT64: read as a raw ns long (nanosAsLong, see
    *    [[graft.GraftSession]]) and truncated to µs here. Integer `div`
    *    (not double `/`): ns epochs ≈ 1.7e18 overflow double's 53-bit
    *    mantissa.
    *  - µs `isAdjustedToUTC=false`: read as TimestampType directly
    *    (inferTimestampNTZ off in [[graft.GraftSession]]). The NTZ branch
    *    below only fires for sessions configured outside GraftSession;
    *    with the UTC session zone the cast is instant-preserving.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val df = table(spark, sfDir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
}
