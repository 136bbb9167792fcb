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
  * (space, \t, \n, \x0B, \f, \r — Java's `\s`; RE2, which DuckDB's
  * `regexp_extract_all` implements, EXCLUDES \x0B from `\s`, so on text
  * containing a vertical tab the word boundaries diverge from a RE2
  * oracle's `\S+` — the driver corpus contains none, and that is the
  * one residual oracle caveat); within a word, scanning left to right,
  * the LONGEST vocab piece (length ≥ 2, up to `maxPieceLen`) starting
  * at the cursor is consumed, else one character is consumed as an
  * implicit single-char piece; each consumption counts one token. This
  * is greedy longest-match-first (WordPiece-style inference) — not a
  * BPE merge replay — which is the standard cheap approximation for
  * counting.
  *
  * Scale shape: the vocab rides as ONE plan reference into generated
  * code (the [[BloomArrayHits]] pattern) — no join, no broadcast
  * relation, no per-row allocation beyond the scan; the count is a
  * tight loop inside whole-stage codegen.
  *
  * All lengths and steps are CODEPOINT-denominated: `maxPieceLen` is a
  * codepoint count, the single-char fallback consumes one codepoint
  * (both halves of a surrogate pair together), and piece lookups slice
  * at codepoint boundaries — matching Spark's `substring`/`length`
  * (UTF8String counts codepoints) and every SQL oracle's `substr`/
  * `len`, so the learned vocab and this matcher index identically on
  * any corpus, ASCII or not (SubwordSpec pins accented de/es/fr and
  * astral-plane fixtures against a codepoint-indexed DuckDB replay).
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

  /** Char index after `l` codepoints from `i`, or -1 if fewer than `l`
    * codepoints remain before `e`. Whitespace is all BMP, so word
    * bounds stay char-scanned; only piece slicing needs the walk.
    */
  @inline private def endOfCodePoints(s: String, i: Int, e: Int, l: Int): Int = {
    var k = i
    var c = 0
    while (c < l && k < e) { k += Character.charCount(s.codePointAt(k)); c += 1 }
    if (c == l) k else -1
  }

  /** The greedy matcher — shared by interpreted eval and generated code.
    * Codepoint-stepped: on ASCII text every codepoint is one char and
    * this is byte-for-byte the char-stepped scan; on multi-byte text the
    * fallback consumes a full codepoint (never half a surrogate pair)
    * and piece lookups slice `maxPieceLen`-codepoint windows, matching
    * the codepoint-indexed vocab learner and SQL oracles exactly.
    */
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
          var step = -1
          var l = maxPieceLen
          while (l >= 2 && step < 0) {
            val end = endOfCodePoints(s, i, e, l)
            if (end > 0 && vocab.contains(s.substring(i, end))) step = end - i
            l -= 1
          }
          if (step < 0) step = Character.charCount(s.codePointAt(i))
          i += step
          n += 1
        }
      }
    }
    n
  }
}
