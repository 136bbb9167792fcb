package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd random-hyperplane LSH bucket id: `nPlanes` sign bits
  * of integer-coefficient pseudo-hyperplane dot products over a numeric
  * array column.
  *
  * Why (SURVEY §7.3 preference order (b), same reasoning as
  * [[ArrayDotProduct]]): the composable formulation evaluates one
  * interpreted `aggregate(zip_with(...))` lambda chain PER PLANE per row
  * — 8 planes × 64 dims of boxed arithmetic, and a multi-table scheme
  * multiplies that by the table count. This expression computes all
  * plane sums in one tight dims×planes primitive loop inside
  * WholeStageCodegen.
  *
  * Semantics (must stay bit-identical to the DuckDB oracles and to
  * `Similarity.hyperplaneBucketViaAggregate`): for plane j the
  * coefficient at dim i is `((i*37 + (planeOffset+j)*101) % 19) - 9`
  * (all operands non-negative, so `%` agrees across languages); the dot
  * product accumulates left-to-right in doubles; bit j of the result is
  * set iff the sum is > 0. A NULL array yields bucket 0, never null —
  * the oracle's `CASE WHEN list_sum(NULL) > 0 … ELSE 0` and the
  * aggregate formulation's `when(d > 0, …).otherwise(0)` both collapse
  * null sums to 0. Null ELEMENTS contribute 0 (DuckDB `list_sum`
  * ignores nulls).
  */
case class HyperplaneBuckets(child: Expression, nPlanes: Int, planeOffset: Int)
    extends UnaryExpression {

  require(nPlanes >= 1 && nPlanes <= 63, s"nPlanes must be in [1, 63], got $nPlanes")
  require(planeOffset >= 0, s"planeOffset must be non-negative, got $planeOffset")

  override def dataType: DataType = LongType

  /** Never null: a null input array maps to bucket 0 (see class doc). */
  override def nullable: Boolean = false

  private def numericElem: Option[DataType] = child.dataType match {
    case ArrayType(t @ (FloatType | DoubleType | IntegerType | LongType | ShortType | ByteType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (numericElem.isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"argument must be an array of a primitive numeric type, got ${child.dataType}")

  // cached per-expression reader (the dispatch must not re-run per element)
  @transient private lazy val read: (ArrayData, Int) => Double = numericElem.get match {
    case FloatType => (a, i) => a.getFloat(i).toDouble
    case DoubleType => (a, i) => a.getDouble(i)
    case IntegerType => (a, i) => a.getInt(i).toDouble
    case LongType => (a, i) => a.getLong(i).toDouble
    case ShortType => (a, i) => a.getShort(i).toDouble
    case ByteType => (a, i) => a.getByte(i).toDouble
    case other => throw new IllegalStateException(s"unsupported element type $other")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L else nullSafeEval(v)
  }

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val acc = new Array[Double](nPlanes)
    var i = 0
    while (i < n) {
      val x = if (xs.isNullAt(i)) 0.0 else read(xs, i)
      var j = 0
      while (j < nPlanes) {
        acc(j) += x * (((i * 37 + (planeOffset + j) * 101) % 19) - 9)
        j += 1
      }
      i += 1
    }
    var bucket = 0L
    var j = 0
    while (j < nPlanes) {
      if (acc(j) > 0) bucket |= 1L << j
      j += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val getter = numericElem.get match {
      case FloatType => (a: String, i: String) => s"(double) $a.getFloat($i)"
      case DoubleType => (a: String, i: String) => s"$a.getDouble($i)"
      case IntegerType => (a: String, i: String) => s"(double) $a.getInt($i)"
      case LongType => (a: String, i: String) => s"(double) $a.getLong($i)"
      case ShortType => (a: String, i: String) => s"(double) $a.getShort($i)"
      case ByteType => (a: String, i: String) => s"(double) $a.getByte($i)"
      case other => throw new IllegalStateException(s"unsupported element type $other")
    }
    val childGen = child.genCode(ctx)
    val a = childGen.value.toString
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val n = ctx.freshName("n")
    val acc = ctx.freshName("acc")
    val x = ctx.freshName("x")
    val compute =
      s"""
         |int $n = $a.numElements();
         |double[] $acc = new double[$nPlanes];
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $a.isNullAt($i) ? 0.0 : ${getter(a, i)};
         |  for (int $j = 0; $j < $nPlanes; $j++) {
         |    $acc[$j] += $x * ((($i * 37 + ($planeOffset + $j) * 101) % 19) - 9);
         |  }
         |}
         |for (int $j = 0; $j < $nPlanes; $j++) {
         |  if ($acc[$j] > 0) ${ev.value} |= 1L << $j;
         |}
       """.stripMargin
    // manual null guard (not nullSafeCodeGen): a null input array must
    // yield bucket 0, and this expression is never null itself
    val guarded =
      if (child.nullable) s"if (!${childGen.isNull}) {\n$compute\n}" else compute
    ev.copy(code =
      code"""
            |${childGen.code}
            |long ${ev.value} = 0L;
            |$guarded
       """.stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}

object HyperplaneBuckets {
  /** Column-level entry point. */
  def buckets(vec: Column, nPlanes: Int, planeOffset: Int = 0): Column =
    GraftSqlBridge.column(HyperplaneBuckets(GraftSqlBridge.expression(vec), nPlanes, planeOffset))
}
