package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

class ScaleSpec extends SparkSpec {

  test("saltedAgg equals plain aggregation on a skewed key") {
    // 90% of events share user_id via a synthetic hot key
    val skewed = Tables.events(spark, sf)
      .withColumn("k", when(col("event_id") % 10 =!= 0, 1L).otherwise(col("user_id")))
    val plain = skewed.groupBy("k")
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("s"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val salted = Scale.saltedAgg(skewed, Seq("k"), 16,
        partials = Seq(count(lit(1)).as("n"), sum(col("value")).as("s")),
        merged = Seq(sum(col("n")).as("n"), round(sum(col("s")), 4).as("s")))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(salted.keySet == plain.keySet)
    salted.foreach { case (k, (n, s)) =>
      assert(plain(k)._1 == n, s"count for $k")
      assert(math.abs(plain(k)._2 - s) < 1e-4, s"sum for $k")
    }
  }

  test("salted stage-1 actually spreads the hot key over multiple groups") {
    val skewed = Tables.events(spark, sf).withColumn("k", lit(1L))
    val spread = skewed
      .withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(8)))
      .groupBy("k", "__salt").count().count()
    assert(spread > 1)
  }

  test("partitioned layout prunes non-matching directories at planning time") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString + "/docs"
    Scale.writePartitioned(
      Tables.documents(spark, sf).select("doc_id", "lang", "n_chars"), dir, Seq("lang"))
    // one directory per language value
    val subdirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(subdirs.count(_.startsWith("lang=")) >= 4, subdirs.mkString(","))
    val back = spark.read.parquet(dir)
    val en = back.filter(col("lang") === "en")
    val plan = en.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), plan)
    val expected = Tables.documents(spark, sf).filter(col("lang") === "en").count()
    assert(en.count() == expected)
    // the pruned scan selects ONLY the en partition directory
    val scan = en.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.selectedPartitions.partitionCount == 1, scan.toString)
  }

  test("pipeline_curate survivors write partitioned by source and prune to one directory") {
    // ties the partitioned-layout machinery into the flagship funnel:
    // curated output lands hive-partitioned on the provenance column, so
    // a per-source consumer (re-train on one crawl, audit one vendor)
    // scans ONLY its slice — asserted at planning time, not hoped.
    val cur = graft.queries.TextQueries.queries("pipeline_curate")(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft_curate_part").toString + "/curated"
    Scale.writePartitioned(cur, dir, Seq("source"))
    val srcs = cur.select("source").distinct().collect().map(_.getString(0)).sorted
    assert(srcs.length > 1, s"fixture has ${srcs.length} sources")
    val pick = srcs.head
    val slice = spark.read.parquet(dir).filter(col("source") === pick)
    val plan = slice.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(source"), plan)
    val scan = slice.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.selectedPartitions.partitionCount == 1, scan.toString)
    // and the slice is exactly the funnel's rows for that source
    val want = cur.filter(col("source") === pick)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq
    val got = slice.select("doc_id", "n_re")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == want)
  }

  test("bucketed table join avoids the shuffle on the bucketed side") {
    // warehouse.dir is a static conf — the table lands in ./spark-warehouse
    // (gitignored); dropped again below
    Scale.writeBucketed(Tables.orders(spark, sf), "orders_b", "o_custkey", 8)
    val b = spark.table("orders_b")
    val agg = b.groupBy("o_custkey").agg(count(lit(1)).as("n"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan) // bucketing pre-partitions
    assert(agg.count() > 0)
    spark.sql("DROP TABLE IF EXISTS orders_b")
  }
}
