package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PlotPrepSpec extends SparkSpec {
  import spark.implicits._

  test("envelope buckets span exactly [0, nBuckets) with endpoints in the edge buckets") {
    val df = (10L to 109L).map(i => (i, i.toDouble)).toDF("idx", "x")
    val env = PlotPrep.envelope(df, "idx", Seq("x" -> col("x")), nBuckets = 10).cache()
    val buckets = env.select("bucket").as[Long].collect().sorted
    assert(buckets.toSeq == (0L until 10L)) // every bucket present, none out of range
    // 100 rows into 10 buckets: exactly 10 per bucket
    assert(env.select("n").as[Long].collect().forall(_ == 10L))
    // min index -> bucket 0, max index -> bucket 9
    val b0 = env.filter($"bucket" === 0).head()
    val b9 = env.filter($"bucket" === 9).head()
    assert(b0.getAs[Double]("vmin") == 10.0 && b9.getAs[Double]("vmax") == 109.0)
    env.unpersist()
  }

  test("envelope preserves peaks a mean-only downsample would erase") {
    // flat signal with one spike: the spike bucket's max must carry it
    val df = (0L until 1000L).map(i => (i, if (i == 500L) 99.0 else 1.0)).toDF("idx", "x")
    val env = PlotPrep.envelope(df, "idx", Seq("x" -> col("x")), nBuckets = 20)
    val spike = env.filter($"bucket" === 10).head()
    assert(spike.getAs[Double]("vmax") == 99.0)
    assert(spike.getAs[Double]("vmin") == 1.0)
    // output stays bounded: 1 feature x 20 buckets
    assert(env.count() == 20)
  }

  test("envelope emits one series per feature") {
    val df = (0L until 100L).map(i => (i, i.toDouble, -i.toDouble)).toDF("idx", "a", "b")
    val env = PlotPrep.envelope(df, "idx",
      Seq("a" -> col("a"), "b" -> col("b")), nBuckets = 5)
    assert(env.count() == 10)
    assert(env.select("feature").distinct().as[String].collect().toSet == Set("a", "b"))
  }
}
