package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the CMS bigram model's contracts: learner/scorer bucket
  * agreement (estimate ≥ true count, ALWAYS), and the per-doc
  * one-sided NLL inequality against an exactly-computed reference.
  */
class BigramNllSketchSpec extends SparkSpec {
  import spark.implicits._

  private def modelOf(texts: String*): (LmSketchModel, Map[(String, String), Long], Map[String, Long]) = {
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val toks = docs.select(graft.text.TextOps.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
    val bc = toks.select(explode(expr(
        "zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1)," +
          " (a, b) -> struct(a AS w1, b AS w2))")).as("b"))
      .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2")).agg(count(lit(1)).as("c_ab"))
    val uni = docs.select(explode(graft.text.TextOps.tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val m = graft.text.LmSketch.learn(bc, uni)
    val bgm = bc.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val unim = uni.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (m, bgm, unim)
  }

  test("estimate never under-counts: CMS >= true for every trained bigram, and >= 0 for unseen") {
    val (m, bgm, _) = modelOf(
      "the cat sat on the mat", "the cat ran", "a dog sat on a log", "the cat sat")
    bgm.foreach { case ((w1, w2), c) =>
      assert(m.estimate(w1, w2) >= c, s"($w1,$w2): est ${m.estimate(w1, w2)} < true $c")
    }
    assert(m.estimate("never", "seen") >= 0L)
  }

  test("per-doc sketch NLL <= exact NLL (same quantization), equal when no collisions inflate") {
    val (m, bgm, unim) = modelOf(
      "the cat sat on the mat", "the cat ran", "a dog sat on a log", "the cat sat")
    def exactE4(text: String): Long = {
      val t = text.split("\\s+").filter(_.nonEmpty)
      t.sliding(2).map { case Array(a, b) =>
        val x = math.log((unim(a) + m.vSize).toDouble / (bgm((a, b)) + 1L)) * 10000.0
        java.math.BigDecimal.valueOf(x)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue
      }.sum
    }
    val df = Seq((0L, "the cat sat on the mat"), (1L, "a dog sat on a log")).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        BigramNllSketch(graft.text.TextOps.tokens(col("text")), m).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(0L) <= exactE4("the cat sat on the mat"))
    assert(got(1L) <= exactE4("a dog sat on a log"))
    // at 4x16384 cells and a handful of bigrams, collisions are absent:
    // the sketch reproduces the exact score
    assert(got(0L) == exactE4("the cat sat on the mat"))
  }

  test("head-capped model: headK below vocab size keeps nll_sketch <= nll_exact and the superset gate") {
    // the 100 TB contract — the driver-side map is bounded at headK
    // entries INDEPENDENT of corpus vocabulary, and the one-sided
    // inequality must survive the tail words flooring to 0
    val texts = Seq(
      "the cat sat on the mat", "the cat ran", "a dog sat on a log",
      "the cat sat", "zebra quokka axolotl wombat", "the the the the")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val toks = docs.select(graft.text.TextOps.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
    val bc = toks.select(explode(expr(
        "zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1)," +
          " (a, b) -> struct(a AS w1, b AS w2))")).as("b"))
      .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2")).agg(count(lit(1)).as("c_ab"))
    val uni = docs.select(explode(graft.text.TextOps.tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val vocabSize = uni.count()
    val headK = 4
    assert(headK < vocabSize, "cap must actually bite for this pin to mean anything")
    val capped = graft.text.LmSketch.learn(bc, uni, headK)
    assert(capped.uni.size == headK)
    assert(capped.vSize == vocabSize, "V stays exact under the cap")
    val full = graft.text.LmSketch.learn(bc, uni)
    val both = docs.select(col("doc_id"),
        BigramNllSketch(graft.text.TextOps.tokens(col("text")), capped).as("s_cap"),
        BigramNllSketch(graft.text.TextOps.tokens(col("text")), full).as("s_full"))
      .collect()
    both.foreach { r =>
      // full model is itself <= exact (previous test); capped only
      // lowers numerators, so capped <= full <= exact — and therefore
      // any "mean NLL <= tau" gate admits a superset of the exact set
      assert(r.getLong(1) <= r.getLong(2),
        s"doc ${r.getLong(0)}: capped ${r.getLong(1)} > full ${r.getLong(2)}")
    }
  }
}
