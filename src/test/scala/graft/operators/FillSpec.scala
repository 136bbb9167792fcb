package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class FillSpec extends SparkSpec {
  import spark.implicits._

  // t: 0,10,20,30,40 ; v: 1, null, null, 4, null
  lazy val df = Seq(
    (0L, 0.0, Some(1.0)), (1L, 10.0, None), (2L, 20.0, None),
    (3L, 30.0, Some(4.0)), (4L, 40.0, None)
  ).toDF("id", "t", "v").cache()

  test("ffill carries the last observation forward") {
    val got = df.select(Fill.ffill(col("v"), Seq.empty, Seq("id")).as("f"))
      .orderBy("id" /* deterministic via plan order of df */).collect().map(_.getDouble(0))
    assert(got.toSeq == Seq(1.0, 1.0, 1.0, 4.0, 4.0))
  }

  test("bfill carries the next observation backward") {
    val got = df.select(col("id"), Fill.bfill(col("v"), Seq.empty, Seq("id")).as("b"))
      .orderBy("id").collect().map(r => Option(r.get(1)))
    assert(got.toSeq == Seq(Some(1.0), Some(4.0), Some(4.0), Some(4.0), None))
  }

  test("interpolate is linear in the time axis with edge fallbacks") {
    val got = df.select(col("id"),
        Fill.interpolate(col("v"), col("t"), Seq.empty, Seq("id")).as("x"))
      .orderBy("id").collect().map(_.getDouble(1))
    assert(got.toSeq == Seq(1.0, 2.0, 3.0, 4.0, 4.0)) // 1 + (4-1)*(10-0)/(30-0) = 2.0 etc
  }

  test("duplicate timestamps around a null fall back to ffill, not NaN") {
    val dup = Seq((0L, 10.0, Some(1.0)), (1L, 10.0, Option.empty[Double]), (2L, 10.0, Some(4.0)))
      .toDF("id", "t", "v")
    val got = dup.select(Fill.interpolate(col("v"), col("t"), Seq.empty, Seq("id")).as("x"))
      .orderBy("x").collect().map(_.getDouble(0))
    assert(!got.exists(_.isNaN))
    assert(got.toSeq == Seq(1.0, 1.0, 4.0))
  }

  test("leading nulls fall back to bfill") {
    val lead = Seq((0L, 0.0, Option.empty[Double]), (1L, 10.0, Some(5.0)))
      .toDF("id", "t", "v")
    val got = lead.select(Fill.interpolate(col("v"), col("t"), Seq.empty, Seq("id")).as("x"))
      .collect().map(_.getDouble(0))
    assert(got.toSeq == Seq(5.0, 5.0))
  }

  test("interpolateForward leaves leading nulls, interpolates interior, carries trailing") {
    // pandas interpolate(method='linear', limit_direction='forward'):
    // [nan, 1, nan, 3, nan] @ t=0,10,20,30,40 -> [nan, 1, 2, 3, 3]
    val s = Seq((0L, 0.0, Option.empty[Double]), (1L, 10.0, Some(1.0)),
      (2L, 20.0, Option.empty[Double]), (3L, 30.0, Some(3.0)), (4L, 40.0, Option.empty[Double]))
      .toDF("id", "t", "v")
    val got = s.select(col("id"),
        Fill.interpolateForward(col("v"), col("t"), Seq.empty, Seq("id")).as("x"))
      .orderBy("id").collect().map(r => Option(r.get(1)))
    assert(got.toSeq == Seq(None, Some(1.0), Some(2.0), Some(3.0), Some(3.0)))
  }

  test("fillMissing policy: ffill + >1-remaining backfill vs interpolate for avoided columns") {
    // reference fill_missing_values_in_df: instantaneous columns get
    // ffill (+ backfill only if >1 null remains); columns_to_avoid
    // (cumulative) get forward-only linear interpolation
    val s = Seq(
      // inst: 2 leading nulls -> ffill leaves 2 -> backfill kicks in
      // cum:  interior gap -> interpolated; leading null stays
      (0L, 0.0, Option.empty[Double], Option.empty[Double]),
      (1L, 10.0, Option.empty[Double], Some(10.0)),
      (2L, 20.0, Some(7.0), Option.empty[Double]),
      (3L, 30.0, Option.empty[Double], Some(30.0)),
      (4L, 40.0, Some(9.0), Some(40.0))
    ).toDF("id", "t", "inst", "cum")
    val got = Fill.fillMissing(s, Seq("inst", "cum"), Set("cum"), col("t"), Seq.empty, Seq("id"))
      .orderBy("id").collect()
      .map(r => (Option(r.get(r.fieldIndex("inst"))), Option(r.get(r.fieldIndex("cum")))))
    assert(got.toSeq == Seq(
      (Some(7.0), None),        // inst backfilled (2 > 1 remaining); cum leading null stays
      (Some(7.0), Some(10.0)),
      (Some(7.0), Some(20.0)),  // cum interpolated: 10 + (30-10)*(20-10)/(30-10)
      (Some(7.0), Some(30.0)),
      (Some(9.0), Some(40.0))))
  }

  test("fillMissing single residual leading null is left in place (reference >1 rule)") {
    val s = Seq(
      (0L, 0.0, Option.empty[Double]),
      (1L, 10.0, Some(5.0)),
      (2L, 20.0, Option.empty[Double])
    ).toDF("id", "t", "inst")
    val got = Fill.fillMissing(s, Seq("inst"), Set.empty, col("t"), Seq.empty, Seq("id"))
      .orderBy("id").collect().map(r => Option(r.get(r.fieldIndex("inst"))))
    // ffill -> [null, 5, 5]; exactly ONE null remains -> no backfill
    assert(got.toSeq == Seq(None, Some(5.0), Some(5.0)))
  }
}
