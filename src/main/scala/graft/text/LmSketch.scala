package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, count, lit}

import graft.plans.LmSketchModel

/** Learner for the CMS bigram LM ([[graft.plans.BigramNllSketch]]).
  *
  * Scale shape: the bigram-count relation NEVER collects — per-partition
  * CMS arrays merge through `treeAggregate` (each task folds its rows
  * into a local depth×width array; only the fixed-size arrays cross to
  * the driver, log-depth merge). The unigram side is DRIVER-BOUNDED BY
  * CONSTRUCTION: only the top-`headK` head words by corpus count are
  * collected (a `TakeOrderedAndProject` — O(headK) driver memory
  * independent of corpus vocabulary, unlike a full-vocab collect that
  * would hold 10⁸–10⁹ entries for an open `\S+` vocab at 100 TB). The
  * vocab size V stays exact (one scalar aggregate row).
  *
  * ONE-SIDED CONTRACT, preserved under the cap: the gate needs
  * nll_sketch ≤ nll_exact per document, which requires the unigram
  * NUMERATOR ĉ(w1)+V to never exceed the exact c(w1)+V — i.e. ĉ ≤ c
  * for every word. Head words carry their exact count (ĉ = c); every
  * word outside the head — tail vocabulary and genuine OOV alike —
  * scores ĉ = 0 ≤ c, the conservative floor. Both cases UNDER-estimate
  * the numerator, ln is increasing, and the CMS denominator only
  * over-counts, so the per-bigram (and hence per-doc summed) inequality
  * holds unconditionally. By Zipf's law the head words dominate token
  * occurrences, so the floor's slack concentrates on rare-word bigrams
  * — the sketch stays tight exactly where the admission decision is
  * made. Pinned corpus-wide in BigramNllSketchSpec ("head-capped
  * model") with headK forced below the vocabulary size.
  */
object LmSketch {
  val Depth = 4
  val Width = 1 << 14

  /** Exact-count head-vocabulary cap — the driver-memory bound. 2¹⁶
    * entries ≈ a few MB regardless of corpus size; raise it per
    * deployment, the contract holds for ANY value ≥ 0.
    */
  val DefaultHeadK = 1 << 16

  /** Learn from (w1, w2, c_ab) bigram counts and (w, c) unigram counts. */
  def learn(bigrams: DataFrame, unigrams: DataFrame,
            headK: Int = DefaultHeadK): LmSketchModel = {
    val d = Depth
    val wd = Width
    val counts = bigrams.select("w1", "w2", "c_ab").rdd.treeAggregate(new Array[Long](d * wd))(
      seqOp = (acc, row) => {
        val w1 = row.getString(0)
        val w2 = row.getString(1)
        val c = row.getLong(2)
        var r = 0
        while (r < d) {
          acc(r * wd + LmSketchModel.bucket(r, wd, w1, w2)) += c
          r += 1
        }
        acc
      },
      combOp = (a, b) => {
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      })
    val vSize = unigrams.agg(count(lit(1))).first().getLong(0)
    // top-headK by count (word tie-break for determinism): a bounded
    // TakeOrdered, never a full-vocab collect
    val uni = unigrams.select(col("w"), col("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(headK)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    LmSketchModel(d, wd, counts, uni, vSize)
  }
}
