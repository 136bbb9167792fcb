package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** As-of (nearest-prior) join as a first-class operator: for every left
  * row, attach the right row with the greatest `rightTime <= leftTime`
  * for the same key (optionally within `toleranceUs`), or nulls.
  *
  * This is the one reference-domain operator ("datafusion" of telemetry
  * streams sampled at different rates) that Spark's relational surface
  * genuinely lacks, so it takes the full §7.3(c) extension path:
  * logical `BinaryNode` → planner `Strategy` → `BinaryExecNode`,
  * registered through `SparkSessionExtensions` ([[GraftExtensions]]).
  *
  * Physical design (the 100 TB story): requires both children clustered
  * by key and sorted by (key, time) — EnsureRequirements inserts the
  * hash exchanges + sorts — then streams a single forward merge per
  * partition: O(n+m) per partition, O(1) state (one buffered right row
  * per live key), no row buffering, no range-join explosion. This is
  * strictly cheaper than the union+window formulation (JoinQueries
  * `join_asof`), which must co-shuffle *and* window-sort the union.
  *
  * v1 scope: key and time expressions must be LongType (covers the
  * id + epoch-µs shape of every time-series table here); left join only.
  *
  * Tie caveat: when multiple right rows share the matching (key, time),
  * which one wins is unspecified (the required ordering has no
  * tiebreak) — same as DuckDB's ASOF JOIN on duplicate times. The
  * union+window formulation additionally orders by an id column, so the
  * two formulations can differ on exact-time ties; keep right-side
  * (key, time) unique (true of the µs-truncated testdata) or pre-dedup.
  */
case class AsOfJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    toleranceUs: Long) extends BinaryNode {

  require(leftKey.dataType == LongType && rightKey.dataType == LongType &&
    leftTime.dataType == LongType && rightTime.dataType == LongType,
    "as-of join v1 requires LongType key and time expressions")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): AsOfJoin =
    copy(left = l, right = r)
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    toleranceUs: Long) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTimeB = BindReferences.bindReference(leftTime, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTimeB = BindReferences.bindReference(rightTime, right.output)
    val rightArity = right.output.size
    val outAttrs = output
    val tol = toleranceUs

    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightArity)
      val rBuf = rIt.buffered
      // one live candidate: the latest right row whose (key, time) is
      // <= the current left cursor
      var candKey = 0L
      var candTime = 0L
      var cand: InternalRow = null
      lIt.map { lrow =>
        val lkAny = lKeyB.eval(lrow)
        val ltAny = lTimeB.eval(lrow)
        // SQL join semantics: a null key or time matches nothing (without
        // this, null unboxes to 0L and null-keyed rows join key 0)
        if (lkAny == null || ltAny == null) {
          proj(joined(lrow, nullRight))
        } else {
          val lk = lkAny.asInstanceOf[Long]
          val lt = ltAny.asInstanceOf[Long]
          var advance = true
          while (advance && rBuf.hasNext) {
            val peek = rBuf.head
            val rkAny = rKeyB.eval(peek)
            val rtAny = rTimeB.eval(peek)
            if (rkAny == null || rtAny == null) {
              // null-keyed right rows sort first (NULLS FIRST) and can
              // never match — consume and drop
              rBuf.next()
            } else {
              val rk = rkAny.asInstanceOf[Long]
              if (rk < lk || (rk == lk && rtAny.asInstanceOf[Long] <= lt)) {
                val r = rBuf.next()
                if (rk == lk) {
                  cand = r.copy()
                  candKey = rk
                  candTime = rtAny.asInstanceOf[Long]
                }
              } else advance = false
            }
          }
          val matched = cand != null && candKey == lk &&
            (tol < 0 || lt - candTime <= tol)
          proj(joined(lrow, if (matched) cand else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): AsOfJoinExec =
    copy(left = l, right = r)
}

/** Planner strategy lowering the logical node to the exec. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tol) :: Nil
    case _ => Nil
  }
}

/** DataFrame-level API. */
object AsOf {

  /** Left as-of join: every `left` row + the nearest-prior `right` row
    * per key (within tolerance, if >= 0). Key and time columns must be
    * LongType and present under the given names (`timeCol` = (left
    * name, right name)). Output: `left.*` then `right.*`, right columns
    * that collide with a left name suffixed `__r`.
    *
    * The right side is re-aliased internally (fresh expression IDs):
    * when both inputs share lineage (self-as-of), the analyzer's
    * DeduplicateRelations rewrites the right subtree but cannot rewrite
    * a custom node's captured key expressions — re-aliasing makes the
    * captured attributes unconditionally consistent.
    */
  def joinLeft(left: DataFrame, right: DataFrame, keyCol: String, timeCol: (String, String),
               toleranceUs: Long = -1L): DataFrame = {
    import org.apache.spark.sql.functions.col
    val rightAliased = right.select(right.columns.map(c => col(c).as(c + "__r")).toSeq: _*)
    val lp = left.queryExecution.analyzed
    val rp = rightAliased.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String) = p.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"column $n not found in ${p.output.map(_.name)}"))
    val joined = GraftSqlBridge.ofRows(left.sparkSession,
      AsOfJoin(lp, rp,
        attr(lp, keyCol), attr(rp, keyCol + "__r"),
        attr(lp, timeCol._1), attr(rp, timeCol._2 + "__r"), toleranceUs))
    val rightNames = right.columns.map(n =>
      if (left.columns.contains(n)) n + "__r" else n)
    joined.toDF(left.columns ++ rightNames: _*)
  }
}
