package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

class VectorSumAggSpec extends SparkSpec {
  import spark.implicits._

  test("vectorSum matches the posexplode formulation on real embeddings") {
    val e = graft.sources.Tables.embeddings(spark, sf)
    val fast = e.groupBy(col("label"))
      .agg(VectorSumAgg.vectorSum(col("embedding")).as("vsum"))
      .select(col("label"), posexplode(col("vsum")).as(Seq("pos", "x")))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val slow = e.select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos")).agg(sum(col("x").cast("double")).as("x"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(fast.keySet == slow.keySet)
    fast.foreach { case (k, v) =>
      assert(math.abs(v - slow(k)) < 1e-9, s"$k: $v vs ${slow(k)}") }
  }

  test("null arrays are skipped; an all-null group yields null") {
    val df = Seq(
      (1, Some(Array(1.0f, 2.0f))),
      (1, None),
      (1, Some(Array(10.0f, 20.0f))),
      (2, None)
    ).toDF("g", "v")
    val got = df.groupBy($"g").agg(VectorSumAgg.vectorSum($"v").as("s"))
      .collect().map(r => r.getInt(0) -> Option(r.get(1))).toMap
    assert(got(1).map(_.asInstanceOf[scala.collection.Seq[Double]].toSeq) == Some(Seq(11.0, 22.0)))
    assert(got(2).isEmpty)
  }

  test("zero-length arrays round-trip as empty, distinct from null") {
    val df = Seq((1, Array.empty[Float])).toDF("g", "v")
    val got = df.groupBy($"g").agg(VectorSumAgg.vectorSum($"v").as("s")).head()
    assert(!got.isNullAt(1) && got.getSeq[Double](1).isEmpty)
  }

  test("ragged arrays are an error, not silent truncation") {
    val df = Seq((1, Array(1.0f)), (1, Array(1.0f, 2.0f))).toDF("g", "v")
    val e = intercept[Exception] {
      df.groupBy($"g").agg(VectorSumAgg.vectorSum($"v")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("ragged")), e.getMessage)
  }

  test("double/int element types are accepted; strings rejected at analysis") {
    val d = Seq((1, Array(1.0, 2.0)), (1, Array(3.0, 4.0))).toDF("g", "v")
      .groupBy($"g").agg(VectorSumAgg.vectorSum($"v").as("s")).head().getSeq[Double](1)
    assert(d == Seq(4.0, 6.0))
    val i = Seq((1, Array(1, 2))).toDF("g", "v")
      .groupBy($"g").agg(VectorSumAgg.vectorSum($"v").as("s")).head().getSeq[Double](1)
    assert(i == Seq(1.0, 2.0))
    intercept[Exception] {
      Seq((1, Array("a"))).toDF("g", "v")
        .groupBy($"g").agg(VectorSumAgg.vectorSum($"v")).collect()
    }
  }

  test("plan: one ObjectHashAggregate with map-side partial_vector_sum, no Generate") {
    val e = graft.sources.Tables.embeddings(spark, sf)
    val p = e.groupBy(col("label"))
      .agg(VectorSumAgg.vectorSum(col("embedding")).as("vsum"))
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("ObjectHashAggregate"), p)
    assert(p.contains("partial_vector_sum"), p)
    assert(!p.contains("Generate"), p)
    // sanity: the Generate detector CAN fire on the posexplode form
    val old = e.select(posexplode(col("embedding")))
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(old.contains("Generate"), old)
  }
}
