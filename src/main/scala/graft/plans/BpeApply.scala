package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Learned-BPE application as a PLAN REFERENCE: the merge table rides
  * into generated code as one object (the [[BigramNllSketch]] pattern)
  * and every token is segmented in a single JVM pass — spaced
  * code-point expansion, the sentinel-spaced `String.replace` chain
  * (IDENTICAL semantics to the learner's application and the DuckDB
  * oracle's `replace`, including the documented run under-merge), then
  * a segment count. Replaces the `transform`/`aggregate` lambda chain
  * that evaluated ~14 interpreted string expressions per corpus token —
  * the repo's documented hot-path anti-pattern.
  */
case class BpeTokenSegments(child: Expression, model: BpeApplyModel)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"argument must be array<string> (tokens), got $other")
  }

  override def nullSafeEval(input: Any): Any =
    model.countSymbols(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("bpeModel", model, classOf[BpeApplyModel].getName)
    nullSafeCodeGen(ctx, ev, arr => s"${ev.value} = $m.countSymbols($arr);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenSegments =
    copy(child = newChild)
}

/** The applied merge chain: parallel pattern/replacement arrays in rank
  * order (each ` w1 w2 ` → ` w1w2 `). Serializable, ships inside the
  * plan to every task.
  */
final case class BpeApplyModel(patterns: Array[String], replacements: Array[String])
    extends Serializable {
  require(patterns.length == replacements.length)

  /** Public: called from generated code. Null tokens are skipped. */
  def countSymbols(toks: ArrayData): Long = {
    var total = 0L
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val w = toks.getUTF8String(i).toString
        val sb = new java.lang.StringBuilder(w.length * 2 + 2)
        sb.append(' ')
        var ci = 0
        while (ci < w.length) {
          val cp = w.codePointAt(ci)
          sb.appendCodePoint(cp)
          sb.append(' ')
          ci += Character.charCount(cp)
        }
        var seq = sb.toString
        var mi = 0
        while (mi < patterns.length) {
          seq = seq.replace(patterns(mi), replacements(mi))
          mi += 1
        }
        // count space-separated segments: transitions from ' ' to symbol
        var segs = 0L
        var j = 1
        while (j < seq.length) {
          if (seq.charAt(j) != ' ' && seq.charAt(j - 1) == ' ') segs += 1
          j += 1
        }
        total += segs
      }
      i += 1
    }
    total
  }
}

object BpeTokenSegments {
  def apply(toks: Column, model: BpeApplyModel): Column =
    GraftSqlBridge.column(BpeTokenSegments(GraftSqlBridge.expression(toks), model))
}
