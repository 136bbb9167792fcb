package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join without a nested loop — the missing Spark join
  * shape: `probe.point ∈ [interval.lo, interval.hi)`.
  *
  * Why: Spark plans a bare range predicate as BroadcastNestedLoopJoin
  * (or a cartesian product when neither side broadcasts) — O(|probe| ×
  * |intervals|) comparisons, the classic 100 TB scale-killer for
  * point-in-window joins (sessionization, maintenance windows,
  * validity-interval lookups). The standard fix, composed from existing
  * operators (SURVEY §7.3 preference order (a)): quantize the domain
  * into fixed-width buckets, explode each interval to the buckets it
  * covers, hash-equi-join probe points to interval fragments on the
  * bucket id, and refine with the exact predicate. Work becomes
  * O(|probe| + |intervals| · spanFactor + |matches|), all
  * shuffle-partitioned on the bucket key — no per-pair scan anywhere.
  *
  * Each probe row lands in exactly ONE bucket and an interval covers
  * each bucket at most once, so a qualifying (probe, interval) pair
  * meets exactly once — no dedup pass needed.
  *
  * `bucketWidth` tuning: explode factor per interval is
  * `span / bucketWidth + 1`. Pick it near the TYPICAL interval span —
  * wider wastes refine-filter work (more non-matching pairs share a
  * bucket), narrower multiplies the interval side. Skewed interval
  * lengths can mix widths by unioning two calls partitioned on span.
  */
object RangeJoin {

  /** Exact integer floor-division bucketing: `floor(c / width)` computed
    * entirely in LONG arithmetic — `pmod` shifts the value down to the
    * nearest multiple of the width, and SQL `div` (integral divide)
    * recovers the bucket id exactly. The previous
    * `floor(c.cast("double") / width)` lost precision for integral
    * bounds beyond 2^53 (epoch NANOS are ~2^60) and could silently
    * mis-bucket — dropping or double-emitting overlapping pairs
    * (ADVICE r17). RangeJoinSpec pins a beyond-2^53 fixture.
    */
  private def bucketOf(width: Long)(c: Column): Column = {
    val cl = c.cast("long")
    call_function("div", cl - pmod(cl, lit(width)), lit(width))
  }

  /** Join `probe` rows to every `intervals` row whose `[lo, hi)` range
    * contains the probe's `point`. All three range columns must be
    * integral (epoch seconds/micros, offsets…); `bucketWidth` is in the
    * same unit. Empty or inverted intervals (`hi <= lo`) match nothing
    * and are dropped before the explode (Spark's `sequence(a, b)` would
    * otherwise DESCEND for b < a and fabricate buckets).
    */
  def pointInInterval(probe: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String, hiCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val bkt = bucketOf(bucketWidth) _
    val iv = intervals
      .filter(col(hiCol) > col(loCol))
      .withColumn("__bkt", explode(sequence(bkt(col(loCol)), bkt(col(hiCol) - 1))))
    probe
      .withColumn("__bkt", bkt(col(pointCol)))
      .join(iv, Seq("__bkt"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bkt")
  }

  /** Interval-overlap join: every (`left`, `right`) pair whose ranges
    * `[loL, hiL)` × `[loR, hiR)` intersect — the second missing Spark
    * join shape (validity-interval × validity-interval: concurrent
    * sessions, ad-flight × campaign windows, maintenance × outage
    * attribution). A bare `loL < hiR AND loR < hiL` predicate plans a
    * nested loop; here BOTH sides explode to their covered buckets and
    * hash-equi-join on the bucket id. A pair sharing k buckets would
    * meet k times, so instead of a distinct pass (a full extra shuffle
    * of the match set) each pair is emitted ONLY in the bucket holding
    * its overlap start `max(loL, loR)`: floor is monotonic, so that
    * bucket is `greatest(bkt(loL), bkt(loR))`, both explode ranges
    * cover it, and the guard keeps exactly one meeting. Work is
    * O(Σ spans/width + matches), shuffle-partitioned on the bucket key.
    *
    * All four range columns must be INTEGRAL (epoch seconds/micros,
    * offsets…), the [[pointInInterval]] contract: the explode covers
    * `bkt(lo)..bkt(hi − 1)` and the dedup guard keys on the bucket of
    * `max(loL, loR)`, both of which assume `hi − 1` is "the last value
    * inside the interval" — fractional bounds would mis-bucket and
    * silently drop overlapping pairs. `bucketWidth` is in the same
    * unit. Column names must be disjoint across the two inputs (the
    * join emits both sides' columns). Empty/inverted intervals match
    * nothing and are dropped before the explode.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      loL: String, hiL: String, loR: String, hiR: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val bkt = bucketOf(bucketWidth) _
    val l = left.filter(col(hiL) > col(loL))
      .withColumn("__bkt", explode(sequence(bkt(col(loL)), bkt(col(hiL) - 1))))
    val r = right.filter(col(hiR) > col(loR))
      .withColumn("__bkt", explode(sequence(bkt(col(loR)), bkt(col(hiR) - 1))))
    l.join(r, Seq("__bkt"))
      .filter(col(loL) < col(hiR) && col(loR) < col(hiL)
        && col("__bkt") === greatest(bkt(col(loL)), bkt(col(loR))))
      .drop("__bkt")
  }
}
