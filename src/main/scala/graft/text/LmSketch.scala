package graft.text

import org.apache.spark.sql.DataFrame

import graft.plans.LmSketchModel

/** Learner for the CMS bigram LM ([[graft.plans.BigramNllSketch]]).
  *
  * Scale shape: the bigram-count relation NEVER collects — per-partition
  * CMS arrays merge through `treeAggregate` (each task folds its rows
  * into a local depth×width array; only the fixed-size arrays cross to
  * the driver, log-depth merge). The unigram map DOES collect — it is
  * vocab-bounded, the same contract as the subword vocab and the IVF
  * centroids, and the gate needs the numerator exact for the one-sided
  * inequality (an over-counted head word would push the sketch NLL
  * ABOVE the exact path and break the superset-admission guarantee).
  */
object LmSketch {
  val Depth = 4
  val Width = 1 << 14

  /** Learn from (w1, w2, c_ab) bigram counts and (w, c) unigram counts. */
  def learn(bigrams: DataFrame, unigrams: DataFrame): LmSketchModel = {
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
    val uni = unigrams.select("w", "c").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    LmSketchModel(d, wd, counts, uni, uni.size.toLong)
  }
}
