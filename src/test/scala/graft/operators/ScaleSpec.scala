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
    val cur = graft.queries.Registry.queries("pipeline_curate")(spark, sf)
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

  test("z-ordered layout: a two-dimensional predicate intersects FEWER files than the natural layout") {
    // the pruning a 100 TB scan gets for free from parquet footer
    // min/max once files cover narrow ranges of BOTH dimensions —
    // measured here as the count of files whose per-file [min, max]
    // envelope intersects the predicate box (exactly the decision the
    // reader's row-group/file skipping makes from the same stats)
    val nFiles = 8
    val li = Tables.lineitem(spark, sf)
      .select(col("l_partkey").bitwiseAND(lit(1023L)).as("x"),
        col("l_suppkey").bitwiseAND(lit(1023L)).as("y"))
    val base = java.nio.file.Files.createTempDirectory("zorder").toString
    li.repartition(nFiles).write.mode("overwrite").parquet(s"$base/plain")
    Scale.writeZOrdered(li.withColumn("zkey", Scale.mortonKey(col("x"), col("y"))),
      s"$base/zordered", col("zkey"), nFiles)

    def candidateFiles(path: String, xLo: Long, xHi: Long, yLo: Long, yHi: Long): Long =
      spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min(col("x")).as("x0"), max(col("x")).as("x1"),
          min(col("y")).as("y0"), max(col("y")).as("y1"))
        .filter(col("x1") >= xLo && col("x0") <= xHi && col("y1") >= yLo && col("y0") <= yHi)
        .count()

    // a selective box in both dims (x: 1/8 of the domain, y: low range)
    val plainCand = candidateFiles(s"$base/plain", 100, 227, 0, 3)
    val zCand = candidateFiles(s"$base/zordered", 100, 227, 0, 3)
    // the natural layout spreads every value range across every file —
    // all files are candidates; the z-ordered layout confines the box
    assert(plainCand == nFiles, s"plain layout candidates: $plainCand")
    assert(zCand < plainCand, s"z-ordered $zCand !< plain $plainCand")
    // identical answers either way — layout never changes semantics
    val p = spark.read.parquet(s"$base/plain")
      .filter(col("x").between(100, 227) && col("y").between(0, 3)).count()
    val z = spark.read.parquet(s"$base/zordered")
      .filter(col("x").between(100, 227) && col("y").between(0, 3)).count()
    assert(p == z)
  }
}
