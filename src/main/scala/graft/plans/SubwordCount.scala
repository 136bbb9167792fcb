package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match subword token count against a learned vocab —
  * the BPE-denominated `n_tok` for chunk/pack budgets (whitespace counts
  * under-estimate what a real tokenizer will emit; training-data token
  * budgets are subword-denominated).
  *
  * Semantics: the text splits into words on the ASCII whitespace class
  * (` \t\n\f\r` — exactly Java/RE2 `\S+`'s complement, so the
  * word boundaries match every oracle's `regexp_extract_all(text,
  * '\S+')`); within a word, scanning left to right, the LONGEST vocab
  * piece (length ≥ 2, up to `maxPieceLen`) starting at the cursor is
  * consumed, else one character is consumed as an implicit single-char
  * piece; each consumption counts one token. This is greedy
  * longest-match-first (WordPiece-style inference) — not a BPE merge
  * replay — which is the standard cheap approximation for counting.
  *
  * Scale shape: the vocab rides as ONE plan reference into generated
  * code (the [[BloomArrayHits]] pattern) — no join, no broadcast
  * relation, no per-row allocation beyond the scan; the count is a
  * tight loop inside whole-stage codegen.
  *
  * Offsets are Java char (UTF-16) units while SQL oracles index
  * codepoints — identical on ASCII corpora (the driver testdata is
  * ASCII; a production multilingual run would swap in codepoint
  * stepping the same way the decode quarantine documents its limits).
  */
case class SubwordCount(child: Expression, vocab: java.util.HashSet[String],
                        maxPieceLen: Int) extends UnaryExpression {
  require(maxPieceLen >= 2, s"maxPieceLen must be >= 2, got $maxPieceLen")

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"argument must be string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    SubwordCount.count(input.asInstanceOf[UTF8String].toString, vocab, maxPieceLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vocabRef = ctx.addReferenceObj("vocab", vocab, classOf[java.util.HashSet[String]].getName)
    nullSafeCodeGen(ctx, ev, str =>
      s"${ev.value} = graft.plans.SubwordCount.count($str.toString(), $vocabRef, $maxPieceLen);")
  }

  override protected def withNewChildInternal(newChild: Expression): SubwordCount =
    copy(child = newChild)
}

object SubwordCount {
  def apply(c: Column, vocab: Set[String], maxPieceLen: Int = 2): Column = {
    val hs = new java.util.HashSet[String]()
    vocab.foreach(hs.add)
    GraftSqlBridge.column(SubwordCount(GraftSqlBridge.expression(c), hs, maxPieceLen))
  }

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** The greedy matcher — shared by interpreted eval and generated code. */
  def count(s: String, vocab: java.util.HashSet[String], maxPieceLen: Int): Long = {
    var n = 0L
    var i = 0
    val len = s.length
    while (i < len) {
      if (isWs(s.charAt(i))) { i += 1 }
      else {
        // word end
        var e = i
        while (e < len && !isWs(s.charAt(e))) e += 1
        // greedy longest-match within [i, e)
        while (i < e) {
          var step = 1
          var l = math.min(maxPieceLen, e - i)
          while (l >= 2 && step == 1) {
            if (vocab.contains(s.substring(i, i + l))) step = l
            l -= 1
          }
          i += step
          n += 1
        }
      }
    }
    n
  }
}
