package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min-Sketch bigram language model as a PLAN REFERENCE: the
  * streaming-deployable form of `lm_score`'s quality gate. The model —
  * a depth×width CMS of corpus bigram counts, the exact unigram counts
  * of the top-`headK` HEAD words only (driver memory bounded by
  * construction, independent of corpus vocabulary — see
  * [[graft.text.LmSketch]] for the head/tail one-sidedness proof), and
  * the exact vocab size — rides into generated code as one reference
  * object (the [[BloomArrayHits]] pattern), so scoring a document is a
  * single per-row pass with NO join against the corpus-sized bigram
  * relation: exactly what a stateless streaming admission stage needs.
  *
  * Returns the quantized integer NLL sum Σ round(ln((c(w1)+V)/(ĉ+1))·10⁴)
  * over the text's adjacent token pairs (the lm_score micro-unit
  * contract; same \S+ tokenization; < 2 tokens → 0).
  *
  * ONE-SIDED ERROR, the curateFullBloom symmetry: CMS counters only
  * ever over-count (ĉ ≥ c true, Cormode & Muthukrishnan 2005), the
  * unigram numerator never over-counts (exact for head words, the
  * conservative 0-floor for tail/OOV), ln is increasing and the quantization is
  * the SAME monotone half-up rounding Spark's `round` applies
  * (BigDecimal.valueOf, not Math.round — they disagree on doubles whose
  * shortest decimal form sits exactly on .5), so per doc
  * nll_sketch ≤ nll_exact ALWAYS: a threshold gate "mean NLL ≤ τ"
  * admits a SUPERSET of the exact path — the sketch can only ever admit
  * junk, never drop good data (LmSketchSpec pins the inequality
  * corpus-wide; `lm_gate_sketch` verifies it per doc in the oracle).
  */
case class BigramNllSketch(child: Expression, model: LmSketchModel)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"argument must be array<string> (tokens), got $other")
  }

  override def nullSafeEval(input: Any): Any =
    model.nllSumE4(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("lmSketch", model, classOf[LmSketchModel].getName)
    nullSafeCodeGen(ctx, ev, arr => s"${ev.value} = $m.nllSumE4($arr);")
  }

  override protected def withNewChildInternal(newChild: Expression): BigramNllSketch =
    copy(child = newChild)
}

/** The learned model: CMS counters (row-major depth×width), exact
  * unigram counts for the head vocabulary (≤ headK entries; absent =
  * conservative 0), exact vocab size. Serializable — it ships inside
  * the plan to every task (≤ a few MB at the default 4×16384 +
  * 2¹⁶-word head).
  */
final case class LmSketchModel(depth: Int, width: Int, counts: Array[Long],
                               uni: Map[String, Long], vSize: Long)
    extends Serializable {

  @transient private lazy val uniSet: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](math.max(uni.size * 2, 4))
    uni.foreach { case (w, c) => m.put(UTF8String.fromString(w), java.lang.Long.valueOf(c)) }
    m
  }

  def bucket(row: Int, w1: String, w2: String): Int =
    LmSketchModel.bucket(row, width, w1, w2)

  /** Min-over-rows count estimate — ≥ the true count by construction. */
  def estimate(w1: String, w2: String): Long = {
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = counts(r * width + bucket(r, w1, w2))
      if (c < best) best = c
      r += 1
    }
    best
  }

  /** Σ over adjacent pairs of the half-up-quantized per-bigram NLL.
    * Public: called from generated code.
    */
  def nllSumE4(toks: ArrayData): Long = {
    val n = toks.numElements()
    if (n < 2) return 0L
    var acc = 0L
    var i = 0
    var prev: UTF8String = toks.getUTF8String(0)
    i = 1
    while (i < n) {
      val cur = toks.getUTF8String(i)
      val ca = uniSet.get(prev)
      val caV = (if (ca == null) 0L else ca.longValue) + vSize
      val est = estimate(prev.toString, cur.toString)
      val x = Math.log(caV.toDouble / (est + 1L)) * 10000.0
      // Spark round semantics exactly: BigDecimal.valueOf (shortest
      // decimal form), HALF_UP — see the one-sidedness note above
      acc += java.math.BigDecimal.valueOf(x)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue
      prev = cur
      i += 1
    }
    acc
  }
}

object LmSketchModel {
  /** The ONE bucket definition — learner (graft.text.LmSketch) and
    * scorer index with the same hash or the sketch is garbage. Tokens
    * are \S+ so the space separator is unambiguous.
    */
  def bucket(row: Int, width: Int, w1: String, w2: String): Int =
    (scala.util.hashing.MurmurHash3.stringHash(w1 + " " + w2, row)
      & 0x7fffffff) % width
}

object BigramNllSketch {
  def apply(toks: Column, model: LmSketchModel): Column =
    GraftSqlBridge.column(BigramNllSketch(GraftSqlBridge.expression(toks), model))
}
