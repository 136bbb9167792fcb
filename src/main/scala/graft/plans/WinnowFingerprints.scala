package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct winnowing-selected fingerprint hashes of a text column
  * (Schleimer, Wilkerson & Aiken, SIGMOD 2003): hash every `k`-char
  * gram, slide a `w`-wide window over the hash stream, keep each
  * window's minimum, dedupe.
  *
  * Why (SURVEY §7.3 preference order (b), the ArrayDotProduct
  * reasoning): the composable formulation explodes positions (~chars
  * rows), evaluates `md5`+`conv` per row, then pays a doc-keyed
  * exchange + sort for the sliding-min window and a distinct shuffle —
  * measured 4.7 s at sf0.1 where this expression's one pass does the
  * same work per DOC row with a monotonic deque (amortized O(1) per
  * position) and no shuffle before the (already vocabulary-sized)
  * fingerprint relation exists.
  *
  * Exact semantic match with the declarative form (and the DuckDB
  * oracle): the per-gram hash is the first 14 hex digits of md5 parsed
  * base-16 — i.e. the digest's first 7 bytes big-endian, always in
  * [0, 2^56) — identical to `conv(substring(md5(substring(ct, p, k)),
  * 1, 14), 16, 10)`; windows start at every position p with
  * p + w - 1 ≤ P (P = len - k + 1); texts with P < w yield an empty
  * array (no full window exists). Ties inside a window pick the same
  * VALUE regardless of position, and only values are emitted.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1, s"gram length must be >= 1, got $k")
  require(w >= 1, s"window must be >= 1, got $w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"argument must be string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprints.selected(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, ct =>
      s"${ev.value} = graft.plans.WinnowFingerprints.selected($ct, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {

  /** One-pass selection: gram hashes, monotonic-deque sliding min,
    * first-seen-order dedupe. Gram boundaries count CODE POINTS — the
    * unit Spark `substring`/`length` and DuckDB `substr`/`len` agree
    * on — never UTF-16 char units, which diverge from both engines on
    * supplementary characters. The all-ASCII fast path (canonical text
    * is [a-z0-9 ] by construction) hashes straight from the byte
    * array; the fallback walks code-point offsets.
    */
  def selected(ct: UTF8String, k: Int, w: Int): ArrayData = {
    val s = ct.toString
    val md = java.security.MessageDigest.getInstance("MD5")
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val ascii = bytes.length == s.length
    // code-point count and per-code-point char offsets (ASCII: 1:1)
    val nCp = if (ascii) s.length else s.codePointCount(0, s.length)
    val p = nCp - k + 1
    if (p < w) return new GenericArrayData(Array.empty[Long])
    val cpOff: Array[Int] =
      if (ascii) null
      else {
        val o = new Array[Int](nCp + 1)
        var ci = 0
        var cp = 0
        while (cp < nCp) { o(cp) = ci; ci = s.offsetByCodePoints(ci, 1); cp += 1 }
        o(nCp) = s.length
        o
      }
    val hs = new Array[Long](p)
    var i = 0
    while (i < p) {
      val dig =
        if (ascii) { md.update(bytes, i, k); md.digest() }
        else md.digest(s.substring(cpOff(i), cpOff(i + k))
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var v = 0L
      var b = 0
      while (b < 7) { v = (v << 8) | (dig(b) & 0xffL); b += 1 }
      hs(i) = v
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val dq = new java.util.ArrayDeque[Int]()
    var j = 0
    while (j < p) {
      while (!dq.isEmpty && hs(dq.peekLast()) >= hs(j)) dq.pollLast()
      dq.addLast(j)
      if (j >= w - 1) {
        while (dq.peekFirst() <= j - w) dq.pollFirst()
        seen.add(hs(dq.peekFirst()))
      }
      j += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  def of(text: Column, k: Int, w: Int): Column =
    GraftSqlBridge.column(WinnowFingerprints(GraftSqlBridge.expression(text), k, w))
}
