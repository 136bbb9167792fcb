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

  test("addErrors corrupts exactly one cell by order position and renames the column") {
    // reference add_errors: df.loc[1,'vb'] = 1e7; rename va -> Va
    val df = Seq((3L, 5.0, 1.0), (1L, 6.0, 2.0), (2L, 7.0, 3.0)).toDF("id", "vb", "va")
      .repartition(3) // multi-partition: position must follow ORDER, not layout
    val bad = Quality.addErrors(df, Seq("id"), "vb", rowPos = 1,
      magnitude = 1e7, renameFrom = "va", renameTo = "Va")
    assert(bad.columns.toSeq == Seq("id", "vb", "Va"))
    val rows = bad.orderBy("id").collect().map(r => r.getLong(0) -> r.getDouble(1))
    // order by id: positions 0,1,2 = ids 1,2,3 -> id 2 corrupted
    assert(rows.toSeq == Seq(1L -> 6.0, 2L -> 1e7, 3L -> 5.0))
  }

  test("addErrors drives the negative paths: range check fires, schema audit detects the rename") {
    val df = Seq((1L, 5.0, 1.0), (2L, 6.0, 2.0), (3L, 7.0, 3.0)).toDF("id", "vb", "va")
    val bad = Quality.addErrors(df, Seq("id"), "vb", 1, 1e7, "va", "Va")
    // the plausibility check that passed on clean data now fails on exactly 1 row
    val clean = Quality.errorsAsDf(df, Seq("vb_plausible" -> (col("vb") < 1e6)))
    assert(clean.count() == 0)
    val errs = Quality.errorsAsDf(bad, Seq("vb_plausible" -> (col("vb") < 1e6)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(errs == Map("vb_plausible" -> 1L))
    // schema verification (check_csv_file semantics): expected names no longer match
    val expected = Seq("id", "vb", "va")
    val missing = expected.diff(bad.columns.toSeq)
    val unexpected = bad.columns.toSeq.diff(expected)
    assert(missing == Seq("va") && unexpected == Seq("Va"))
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
