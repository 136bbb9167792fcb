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

  // left intervals of assorted spans vs right intervals, including pairs
  // sharing multiple buckets (both straddle), touching-not-overlapping
  // (a_hi == b_lo), identical ranges, and degenerate inputs
  private lazy val leftIv = Seq(
    (1L, 0L, 12L),   // crosses one boundary
    (2L, 5L, 40L),   // straddles 4 buckets
    (3L, 20L, 20L),  // empty
    (4L, 90L, 80L),  // inverted
    (5L, 55L, 95L)   // straddles 4+ buckets
  ).toDF("a_id", "a_lo", "a_hi")
  private lazy val rightIv = Seq(
    (10L, 12L, 15L), // touches a_id=1 at the boundary: NOT an overlap
    (11L, 11L, 13L), // overlaps a_id=1 by one unit
    (12L, 5L, 40L),  // identical to a_id=2: shares 4 buckets, must meet once
    (13L, 30L, 60L), // overlaps both 2 and 5
    (14L, 200L, 210L) // disjoint
  ).toDF("b_id", "b_lo", "b_hi")

  test("intervalOverlap equals the cross-join reference, each pair exactly once") {
    val got = RangeJoin.intervalOverlap(leftIv, rightIv, "a_lo", "a_hi", "b_lo", "b_hi", 10L)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // NB the bare predicate alone would claim the EMPTY interval [20,20)
    // "overlaps" [5,40) — it is only equivalent to nonempty intersection
    // when both intervals are themselves nonempty
    val want = leftIv.crossJoin(rightIv)
      .filter(col("a_lo") < col("b_hi") && col("b_lo") < col("a_hi")
        && col("a_hi") > col("a_lo") && col("b_hi") > col("b_lo"))
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.sorted == want.sorted)
    assert(got.size == got.distinct.size, "an (a, b) pair met in more than one bucket")
    val pairs = got.toSet
    assert(!pairs.contains((1L, 10L)), "half-open: touching intervals do not overlap")
    assert(pairs.contains((1L, 11L)))
    assert(pairs.contains((2L, 12L)) && pairs.contains((2L, 13L)) && pairs.contains((5L, 13L)))
    assert(!got.exists(p => p._1 == 3L || p._1 == 4L), "empty + inverted drop")
    assert(!got.exists(_._2 == 14L))
  }

  test("intervalOverlap: bucket width does not change the result") {
    def run(w: Long) = RangeJoin.intervalOverlap(leftIv, rightIv, "a_lo", "a_hi", "b_lo", "b_hi", w)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val base = run(10L)
    assert(run(1L) == base)
    assert(run(7L) == base)
    assert(run(1000L) == base)
  }

  test("intervalOverlap on negative domains (floor bucketing) matches the cross-join reference") {
    val l = Seq((1L, -25L, -4L), (2L, -5L, 6L)).toDF("a_id", "a_lo", "a_hi")
    val r = Seq((10L, -30L, -24L), (11L, -10L, 2L)).toDF("b_id", "b_lo", "b_hi")
    val got = RangeJoin.intervalOverlap(l, r, "a_lo", "a_hi", "b_lo", "b_hi", 10L)
      .select("a_id", "b_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    val want = l.crossJoin(r)
      .filter(col("a_lo") < col("b_hi") && col("b_lo") < col("a_hi"))
      .select("a_id", "b_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(got.sorted == want.sorted && got.size == got.distinct.size)
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

  test("bucketing is exact beyond 2^53 (epoch-nanosecond bounds)") {
    // doubles have 53 mantissa bits: around 2^60 the old
    // floor(double / width) bucketing collapsed adjacent values into
    // the wrong bucket. Adjacent 1-wide intervals at ~1.15e18 (epoch
    // nanos, 2036-ish) with bucketWidth 1: overlapping pairs must all
    // be found exactly once, non-overlapping ones not at all.
    val base = 1152921504606846976L // 2^60
    val l = Seq((1L, base, base + 2L), (2L, base + 5L, base + 7L))
      .toDF("a_id", "a_lo", "a_hi")
    val r = Seq((10L, base + 1L, base + 3L), (11L, base + 3L, base + 5L),
        (12L, base + 6L, base + 9L))
      .toDF("b_id", "b_lo", "b_hi")
    val got = RangeJoin.intervalOverlap(l, r, "a_lo", "a_hi", "b_lo", "b_hi", 1L)
      .select("a_id", "b_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    val want = l.crossJoin(r)
      .filter(col("a_lo") < col("b_hi") && col("b_lo") < col("a_hi"))
      .select("a_id", "b_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(want.nonEmpty && got.sorted == want.sorted)
    assert(got.size == got.distinct.size)
    // point lookup at the same magnitude
    val pts = Seq(base, base + 1L, base + 6L).toDF("pt")
    val hit = RangeJoin.pointInInterval(pts, l, "pt", "a_lo", "a_hi", 1L)
      .select("a_id", "pt").collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(hit.sorted == Seq((1L, base), (1L, base + 1L), (2L, base + 6L)))
  }
}
