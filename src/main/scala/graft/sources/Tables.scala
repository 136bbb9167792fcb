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
  /** `events.ts` is ns-precision in the parquet; Spark reads it as a raw
    * ns long (see [[graft.GraftSession]]) and we truncate to a µs
    * timestamp here — matching DuckDB, whose TIMESTAMP is µs and which
    * truncates ns parquet on read. Integer `div` (not double `/`): ns
    * epochs ≈ 1.7e18 overflow double's 53-bit mantissa.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val df = table(spark, sfDir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ => df
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
}
