package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import graft.sources.Tables

/** Streaming flows driven synchronously with MemoryStream +
  * processAllAvailable over the real events table, then cross-checked
  * against the equivalent BATCH aggregation — the streaming/batch parity
  * contract.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def eventRows = Tables.events(spark, sf)
    .select(col("ts"), col("user_id"), col("value"))
    .as[(java.sql.Timestamp, Long, Double)].collect().toSeq

  test("streaming bucketMean matches the batch bucket aggregation") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val df = stream.toDF().toDF("ts", "user_id", "value")
    val agg = StreamingResample.bucketMean(df, "ts", "value", 3600L)
    val q = agg.writeStream.outputMode("complete").format("memory")
      .queryName("bucket_out").start()
    stream.addData(eventRows)
    q.processAllAvailable()
    val got = spark.sql("SELECT bucket_start, round(avg_value,6) AS a, n FROM bucket_out")
      .orderBy("bucket_start").collect()
    q.stop()
    val want = Tables.events(spark, sf)
      .groupBy(window(col("ts"), "3600 seconds").as("w"))
      .agg(round(avg(col("value")), 6).as("a"), count(lit(1)).as("n"))
      .select(col("w.start"), col("a"), col("n"))
      .orderBy("start").collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getTimestamp(0) == w.getTimestamp(0))
      assert(g.getDouble(1) == w.getDouble(1))
      assert(g.getLong(2) == w.getLong(2))
    }
  }

  test("streaming slidingStats produces per-key windows") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val df = stream.toDF().toDF("ts", "user_id", "value")
    val agg = StreamingResample.slidingStats(df, "ts", "user_id", "value", 7200L, 3600L)
    val q = agg.writeStream.outputMode("complete").format("memory")
      .queryName("slide_out").start()
    stream.addData(eventRows)
    q.processAllAvailable()
    val got = spark.table("slide_out")
    assert(got.count() > 0)
    assert(got.filter(col("min_value") > col("max_value")).count() == 0)
    q.stop()
  }

  test("file-source streaming: readStream over parquet drives the same bucket aggregation") {
    // the production-shaped path (schema-declared readStream over a
    // directory), unlike MemoryStream which bypasses source resolution
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    Tables.events(spark, sf).select(col("ts"), col("value")).write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val agg = StreamingResample.bucketMean(stream, "ts", "value", 86400L)
    val q = agg.writeStream.outputMode("complete").format("memory")
      .queryName("file_bucket_out").start()
    q.processAllAvailable()
    val got = spark.table("file_bucket_out").agg(sum("n")).head().getLong(0)
    q.stop()
    assert(got == Tables.events(spark, sf).count())
  }

  test("streaming adapt accumulates Welford state across batches to the batch stats") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[StreamingResample.KeyedValue]
    val out = StreamingResample.streamingAdapt(spark, stream.toDF(), "key", "value")
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("adapt_out").start()
    stream.addData(StreamingResample.KeyedValue(1, 10.0), StreamingResample.KeyedValue(1, 20.0))
    q.processAllAvailable()
    stream.addData(StreamingResample.KeyedValue(1, 30.0), StreamingResample.KeyedValue(2, 5.0))
    q.processAllAvailable()
    val rows = spark.table("adapt_out").orderBy("n").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    q.stop()
    // final key-1 state after both batches: n=3, mean=20, var_pop=200/3
    val k1 = rows.filter(_._1 == 1L).maxBy(_._2)
    assert(k1._2 == 3L && k1._3 == 20.0 && math.abs(k1._4 - 200.0 / 3) < 1e-9)
    val k2 = rows.filter(_._1 == 2L).head
    assert(k2._2 == 1L && k2._3 == 5.0)
  }

  test("FeatureStats JSON round-trips save/load") {
    val stats = graft.operators.FeatureSpace.adapt(
      Tables.events(spark, sf).withColumnRenamed("event_type", "cat"),
      Seq(graft.operators.FeatureSpace.Normalized("value"),
        graft.operators.FeatureSpace.OneHotString("cat")))
    val path = java.nio.file.Files.createTempFile("stats", ".json").toString
    stats.save(path)
    val back = graft.operators.FeatureSpace.FeatureStats.load(path)
    assert(back == stats)
  }

  test("stateful interval audit flags only irregular gaps across batches") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[StreamingResample.IntervalEvent]
    val out = StreamingResample.intervalAudit(
      spark, stream.toDF(), "key", "tsSec", expectedSec = 10L)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("audit_out").start()
    stream.addData(StreamingResample.IntervalEvent(1, 0), StreamingResample.IntervalEvent(1, 10))
    q.processAllAvailable()
    // second batch: state remembers ts=10; 25 is a bad gap (15), 35 is good
    stream.addData(StreamingResample.IntervalEvent(1, 25), StreamingResample.IntervalEvent(1, 35))
    q.processAllAvailable()
    val rows = spark.table("audit_out").orderBy("tsSec").collect()
    q.stop()
    assert(rows.map(_.getAs[Long]("tsSec")).toSeq == Seq(25L))
    assert(rows.head.getAs[Long]("intervalSec") == 15L)
  }
}
