package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BloomScreenSpec extends SparkSpec {

  private def planted(n: Int) = (0 until n).map(i => s"gram_$i")

  test("BloomArrayHits never misses a true member (one-sided error, planted)") {
    val members = planted(1000)
    val bloom = org.apache.spark.util.sketch.BloomFilter.create(1000, 0.001)
    members.foreach(bloom.putString)
    // every element a member -> count == array size, for every doc
    val df = spark.range(100).select(
      transform(sequence(lit(0), lit(9)),
        j => concat(lit("gram_"), (col("id") * 10 + j) % 1000)).as("arr"))
    val missed = df.select(BloomArrayHits(col("arr"), bloom).as("c"))
      .filter(col("c") =!= 10L).count()
    assert(missed == 0)
  }

  test("BloomArrayHits false-positive rate stays near the configured fpp") {
    val bloom = org.apache.spark.util.sketch.BloomFilter.create(10000, 0.001)
    planted(10000).foreach(bloom.putString)
    // 100k strings guaranteed OUTSIDE the planted set
    val hits = spark.range(100000)
      .select(array(concat(lit("other_"), col("id"))).as("arr"))
      .agg(sum(BloomArrayHits(col("arr"), bloom))).head().getLong(0)
    // expect ~0.1% of 100k = ~100; allow 5x headroom against hash luck
    assert(hits <= 500, s"fp hits = $hits")
  }

  test("null array -> null; null elements never counted") {
    val bloom = org.apache.spark.util.sketch.BloomFilter.create(10, 0.01)
    bloom.putString("x")
    val r = spark.sql(
      """SELECT CAST(NULL AS ARRAY<STRING>) AS nil,
        |       array('x', CAST(NULL AS STRING), 'x') AS holey""".stripMargin)
      .select(BloomArrayHits(col("nil"), bloom).as("a"),
        BloomArrayHits(col("holey"), bloom).as("b")).head()
    assert(r.isNullAt(0))
    assert(r.getLong(1) == 2L)
  }

  test("probe agrees with DataFrameStatFunctions-built sketch (build/probe byte parity)") {
    // build via stat.bloomFilter (the query's build path), probe via the
    // expression: every inserted string must be found
    val src = spark.range(5000).select(concat(lit("g_"), col("id")).as("gram"))
    val bloom = src.stat.bloomFilter("gram", 5000, 0.001)
    val missed = src.select(array(col("gram")).as("arr"))
      .select(BloomArrayHits(col("arr"), bloom).as("c"))
      .filter(col("c") =!= 1L).count()
    assert(missed == 0)
  }

  test("bloom screen production path: one projection, no join, no exchange, codegen'd") {
    val df = graft.queries.TextQueries.decontBloomScreen(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Exchange"), plan)
    // the probe projection stays inside WholeStageCodegen (the EvalOnce
    // barrier Project below it is non-codegen BY DESIGN — it exists to
    // stop Catalyst from splicing the shingle pipeline into consumers)
    val probe = plan.linesIterator
      .map(_.replaceAll("^[\\s+:|-]*", ""))
      .filter(_.contains("bloomarrayhits"))
      .toSeq
    assert(probe.nonEmpty && probe.forall(_.startsWith("*(")), plan)
  }

  test("aggregate overcount on the real corpus is fpp-bounded") {
    // exact hits per doc vs sketch hits per doc: overcount only, and the
    // total overcount is within 5x fpp of the clean-gram volume
    val out = graft.queries.TextQueries.decontaminateBloom(spark, sf).cache()
    try {
      assert(out.filter(col("bloom_no_miss") =!= 1L).count() == 0)
      val screen = graft.queries.TextQueries.decontBloomScreen(spark, sf)
      val joined = screen.join(out.select(col("doc_id"), col("n_hit")), Seq("doc_id"))
      val r = joined.agg(
        sum(col("n_hit_bloom") - col("n_hit")).as("over"),
        sum(col("n_grams") - col("n_hit")).as("clean")).head()
      val (over, clean) = (r.getLong(0), r.getLong(1))
      assert(over >= 0)
      assert(over <= math.max(5, (clean * 0.001 * 5).toLong), s"over=$over clean=$clean")
    } finally out.unpersist()
  }
}
