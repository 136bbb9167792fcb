package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Order-free integer core of a document's character-distribution
  * Shannon entropy: Σ over distinct codepoints of
  * `round(cnt · ln(cnt) · 10⁴)` as a long. The caller derives
  * H = ln(n) − S/(n·10⁴) in one exact-operand division — the
  * ts_changepoint/lm_score micro-unit pattern: every transcendental is
  * evaluated on a SMALL EXACT INTEGER argument and quantized before any
  * cross-row (or cross-engine reduction-order) summation, so a DuckDB
  * oracle that aggregates per-(doc, char) counts in a different order
  * reproduces the sum bit-exactly.
  *
  * Why a custom Expression (SURVEY §7.3 preference (b)): the
  * composable form is explode-per-character + a (doc, char) groupBy —
  * a shuffle whose record count is the CHARACTER count of the corpus
  * (~5 orders above the doc count at 100 TB). This computes the whole
  * per-doc histogram in one pass inside the row's own task: an int[128]
  * ASCII fast path plus a boxed map for the non-ASCII tail, zero
  * shuffle, stays inside WholeStageCodegen (the generated code calls
  * the static helper — one invocation per ROW, not per character).
  *
  * Codepoint-denominated like [[SubwordCount]]: supplementary
  * characters count once (both surrogate halves together), matching
  * Spark `length` and RE2's per-codepoint `(?s).` extraction.
  */
case class CharEntropySum(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"argument must be string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    CharEntropySum.sumE4(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.plans.CharEntropySum.sumE4($s);")

  override protected def withNewChildInternal(newChild: Expression): CharEntropySum =
    copy(child = newChild)
}

object CharEntropySum {
  private val Scale = 10000.0

  /** One-pass per-row histogram + quantized entropy core. Public static:
    * called from generated code.
    */
  def sumE4(s: UTF8String): Long = {
    val str = s.toString
    val ascii = new Array[Int](128)
    var other: java.util.HashMap[Integer, Integer] = null
    var i = 0
    val len = str.length
    while (i < len) {
      val cp = str.codePointAt(i)
      if (cp < 128) ascii(cp) += 1
      else {
        if (other == null) other = new java.util.HashMap[Integer, Integer]()
        val prev = other.get(Integer.valueOf(cp))
        other.put(Integer.valueOf(cp), Integer.valueOf(if (prev == null) 1 else prev.intValue + 1))
      }
      i += Character.charCount(cp)
    }
    var acc = 0L
    var c = 0
    while (c < 128) {
      val k = ascii(c)
      if (k > 1) acc += Math.round(k * Math.log(k) * Scale)
      c += 1
    }
    if (other != null) {
      val it = other.values.iterator
      while (it.hasNext) {
        val k = it.next().intValue
        if (k > 1) acc += Math.round(k * Math.log(k) * Scale)
      }
    }
    acc
  }

  def apply(c: Column): Column =
    GraftSqlBridge.column(CharEntropySum(GraftSqlBridge.expression(c)))
}
