package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("nullProfile counts nulls and NaNs per column") {
    val df = Seq(
      (Some(1.0), Option("a")), (None, Option("b")),
      (Some(Double.NaN), None), (Some(2.0), Option("c"))
    ).toDF("x", "s")
    val p = Quality.nullProfile(df, Seq("x", "s")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(p("x") == (4L, 2L)) // one null + one NaN
    assert(p("s") == (4L, 1L))
  }

  test("allEqual detects constant and non-constant columns") {
    val df = Seq((1, 7), (2, 7), (3, 7)).toDF("a", "b")
    val r = df.agg(Quality.allEqual(col("a")), Quality.allEqual(col("b"))).head()
    assert(!r.getBoolean(0) && r.getBoolean(1))
  }

  test("errorsAsDf reports only failing checks with counts") {
    val df = Seq((1, 5.0), (2, -1.0), (3, 200.0)).toDF("id", "v")
    val errs = Quality.errorsAsDf(df, Seq(
      "v_nonnegative" -> (col("v") >= 0),
      "v_below_100" -> (col("v") < 100),
      "id_positive" -> (col("id") > 0)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(errs == Map("v_nonnegative" -> 1L, "v_below_100" -> 1L))
  }

  test("shuffled is a seeded deterministic permutation, independent of partitioning") {
    val df = (1 to 50).toDF("x")
    val a = graft.operators.WindowOps.shuffled(df, 7L).collect().map(_.getInt(0)).toSeq
    val b = graft.operators.WindowOps.shuffled(df.repartition(7), 7L).collect().map(_.getInt(0)).toSeq
    val c = graft.operators.WindowOps.shuffled(df, 8L).collect().map(_.getInt(0)).toSeq
    assert(a == b) // same seed, different partitioning -> same permutation
    assert(a != c)
    assert(a.sorted == (1 to 50))
  }

  test("constantInterval validates a regular grid") {
    val ok = Seq(10L, 20L, 30L).toDF("t")
      .select(graft.operators.WindowOps.lagInterval(col("t"), Seq.empty, Seq("t")).as("i"))
    assert(Quality.constantInterval(ok.filter(col("i").isNotNull), col("i"), 10L)
      .head().getBoolean(0))
    val bad = Seq(10L, 20L, 35L).toDF("t")
      .select(graft.operators.WindowOps.lagInterval(col("t"), Seq.empty, Seq("t")).as("i"))
    assert(!Quality.constantInterval(bad.filter(col("i").isNotNull), col("i"), 10L)
      .head().getBoolean(0))
  }
}
