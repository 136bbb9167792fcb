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
  * set iff the sum is > 0. Null array → null; null elements contribute
  * 0 (DuckDB's `list_sum` ignores nulls).
  */
case class HyperplaneBuckets(child: Expression, nPlanes: Int, planeOffset: Int)
    extends UnaryExpression {

  require(nPlanes >= 1 && nPlanes <= 63, s"nPlanes must be in [1, 63], got $nPlanes")
  require(planeOffset >= 0, s"planeOffset must be non-negative, got $planeOffset")

  override def dataType: DataType = LongType

  private def numericElem: Option[DataType] = child.dataType match {
    case ArrayType(t @ (FloatType | DoubleType | IntegerType | LongType | ShortType | ByteType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (numericElem.isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"argument must be an array of a primitive numeric type, got ${child.dataType}")

  private def read(a: ArrayData, i: Int): Double = numericElem.get match {
    case FloatType => a.getFloat(i).toDouble
    case DoubleType => a.getDouble(i)
    case IntegerType => a.getInt(i).toDouble
    case LongType => a.getLong(i).toDouble
    case ShortType => a.getShort(i).toDouble
    case ByteType => a.getByte(i).toDouble
    case other => throw new IllegalStateException(s"unsupported element type $other")
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
    val getter = numericElem.get match {
      case FloatType => (a: String, i: String) => s"(double) $a.getFloat($i)"
      case DoubleType => (a: String, i: String) => s"$a.getDouble($i)"
      case IntegerType => (a: String, i: String) => s"(double) $a.getInt($i)"
      case LongType => (a: String, i: String) => s"(double) $a.getLong($i)"
      case ShortType => (a: String, i: String) => s"(double) $a.getShort($i)"
      case ByteType => (a: String, i: String) => s"(double) $a.getByte($i)"
      case other => throw new IllegalStateException(s"unsupported element type $other")
    }
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      val bucket = ctx.freshName("bucket")
      s"""
         |int $n = $a.numElements();
         |double[] $acc = new double[$nPlanes];
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $a.isNullAt($i) ? 0.0 : ${getter(a, i)};
         |  for (int $j = 0; $j < $nPlanes; $j++) {
         |    $acc[$j] += $x * ((($i * 37 + ($planeOffset + $j) * 101) % 19) - 9);
         |  }
         |}
         |long $bucket = 0L;
         |for (int $j = 0; $j < $nPlanes; $j++) {
         |  if ($acc[$j] > 0) $bucket |= 1L << $j;
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}

object HyperplaneBuckets {
  /** Column-level entry point. */
  def buckets(vec: Column, nPlanes: Int, planeOffset: Int = 0): Column =
    GraftSqlBridge.column(HyperplaneBuckets(GraftSqlBridge.expression(vec), nPlanes, planeOffset))
}
