package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  // points 0..99; intervals of assorted spans, including bucket-straddling
  // (span 35 > width 10), sub-bucket (span 1), empty (hi == lo) and
  // inverted (hi < lo) ones
  private lazy val probe = (0L until 100L).map(p => (p, s"p$p")).toDF("pt", "tag")
  private lazy val intervals = Seq(
    (1L, 0L, 1L),    // [0,1): only point 0
    (2L, 5L, 40L),   // straddles 4 buckets
    (3L, 9L, 11L),   // crosses a bucket boundary
    (4L, 50L, 50L),  // empty
    (5L, 70L, 60L),  // inverted
    (6L, 95L, 200L), // runs past the domain
    (7L, 5L, 40L)    // duplicate range, distinct id
  ).toDF("iv_id", "lo", "hi")

  test("pointInInterval equals the cross-join reference, each pair exactly once") {
    val got = RangeJoin.pointInInterval(probe, intervals, "pt", "lo", "hi", 10L)
      .select("iv_id", "pt").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = probe.crossJoin(intervals)
      .filter(col("pt") >= col("lo") && col("pt") < col("hi"))
      .select("iv_id", "pt").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.sorted == want.sorted)
    assert(got.size == got.distinct.size, "a (interval, point) pair matched twice")
    // boundary semantics: lo inclusive, hi exclusive
    val byIv = got.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(byIv(1L) == Seq(0L))
    assert(byIv(2L) == (5L until 40L))
    assert(byIv(3L) == Seq(9L, 10L))
    assert(!byIv.contains(4L) && !byIv.contains(5L)) // empty + inverted drop
    assert(byIv(6L) == (95L until 100L))
    assert(byIv(7L) == byIv(2L))
  }

  test("bucket width does not change the result, only the plan economics") {
    def run(w: Long) = RangeJoin.pointInInterval(probe, intervals, "pt", "lo", "hi", w)
      .select("iv_id", "pt").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val base = run(10L)
    assert(run(1L) == base)
    assert(run(7L) == base)
    assert(run(1000L) == base)
  }

  test("the join is a hash equi-join on the bucket key, never a nested loop") {
    val p = RangeJoin.pointInInterval(probe, intervals, "pt", "lo", "hi", 10L)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("__bkt"), p)
  }

  test("negative domains bucket correctly (floor, not truncate-toward-zero)") {
    val pts = (-30L to 30L).toDF("pt")
    val ivs = Seq((1L, -25L, -4L), (2L, -5L, 6L)).toDF("iv_id", "lo", "hi")
    val got = RangeJoin.pointInInterval(pts, ivs, "pt", "lo", "hi", 10L)
      .select("iv_id", "pt").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = pts.crossJoin(ivs)
      .filter(col("pt") >= col("lo") && col("pt") < col("hi"))
      .select("iv_id", "pt").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.sorted == want.sorted)
    assert(got.size == got.distinct.size)
  }
}
