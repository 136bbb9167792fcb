package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd dot product over two numeric array columns.
  *
  * Why a custom Catalyst `Expression` (SURVEY §7.3 / preference order
  * (b)): the composable formulation
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` routes through
  * HigherOrderFunction lambda evaluation, which is interpreted per
  * element (no codegen) and allocates an intermediate array per row. For
  * 64-dim embeddings crossed over thousands of candidate pairs that is
  * the hot loop of every similarity query. This expression emits a tight
  * primitive `for` loop via `doGenCode` — no allocation, stays inside
  * WholeStageCodegen — with an interpreted `eval` fallback.
  *
  * Semantics: elementwise double product summed left-to-right (the same
  * order as the `aggregate` formulation and DuckDB's `list_sum`, so
  * results stay bit-identical to the oracles). Null or
  * length-mismatched inputs yield null; null *elements* contribute 0.
  */
case class ArrayDotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  /** Always nullable: a length mismatch yields null even when both child
    * arrays are non-nullable (without this, codegen elides the isNull
    * slot and the mismatch branch can't signal).
    */
  override def nullable: Boolean = true

  private def numericElem(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType | IntegerType | LongType | ShortType | ByteType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (numericElem(left).isDefined && numericElem(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"arguments must be arrays of a primitive numeric type, got ${left.dataType} and ${right.dataType}")

  private def reader(t: DataType): (ArrayData, Int) => Double = t match {
    case FloatType => (a, i) => a.getFloat(i).toDouble
    case DoubleType => (a, i) => a.getDouble(i)
    case IntegerType => (a, i) => a.getInt(i).toDouble
    case LongType => (a, i) => a.getLong(i).toDouble
    case ShortType => (a, i) => a.getShort(i).toDouble
    case ByteType => (a, i) => a.getByte(i).toDouble
    case other => throw new IllegalStateException(s"unsupported element type $other")
  }

  @transient private lazy val leftRead = reader(numericElem(left).get)
  @transient private lazy val rightRead = reader(numericElem(right).get)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n != ys.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (xs.isNullAt(i)) 0.0 else leftRead(xs, i)
      val y = if (ys.isNullAt(i)) 0.0 else rightRead(ys, i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(arr: String, i: String, t: DataType): String = t match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case DoubleType => s"$arr.getDouble($i)"
      case IntegerType => s"(double) $arr.getInt($i)"
      case LongType => s"(double) $arr.getLong($i)"
      case ShortType => s"(double) $arr.getShort($i)"
      case ByteType => s"(double) $arr.getByte($i)"
      case other => throw new IllegalStateException(s"unsupported element type $other")
    }
    val lt = numericElem(left).get
    val rt = numericElem(right).get
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xv = $a.isNullAt($i) ? 0.0 : ${getter(a, i, lt)};
         |    double $yv = $b.isNullAt($i) ? 0.0 : ${getter(b, i, rt)};
         |    $acc += $xv * $yv;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

object ArrayDotProduct {
  /** Column-level entry point: `dot(a, b)`. */
  def dot(a: Column, b: Column): Column =
    GraftSqlBridge.column(ArrayDotProduct(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
