package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins [[CharEntropySum]]'s quantized-integer entropy core: closed-form
  * values on constructed strings, codepoint denomination on multibyte
  * and astral text, and agreement with the composable explode+groupBy
  * formulation it replaces.
  */
class CharEntropySumSpec extends SparkSpec {

  private def sums(texts: String*): Seq[Long] = {
    val df = spark.sql(texts.zipWithIndex
      .map { case (t, i) => s"($i, '${t.replace("'", "''")}')" }
      .mkString("SELECT * FROM VALUES ", ", ", " AS t(id, s)"))
    df.orderBy(col("id"))
      .select(CharEntropySum(col("s")).as("e"))
      .collect().map(_.getLong(0)).toSeq
  }

  private def e4(counts: Int*): Long =
    counts.filter(_ > 1).map(k => Math.round(k * Math.log(k) * 10000.0)).sum

  test("closed form on constructed histograms") {
    // "aaaa": one codepoint count 4 -> round(4 ln4 e4); "abab": two counts of 2
    assert(sums("aaaa", "abab", "abcd") ==
      Seq(e4(4), e4(2, 2), 0L))
    // derived H: uniform 4-char string has ln(4) entropy; constant has 0
    val n = 4.0
    assert(math.abs((math.log(n) - e4(4) / (n * 10000.0)) - 0.0) < 1e-4)        // "aaaa"
    assert(math.abs((math.log(n) - 0L / (n * 10000.0)) - math.log(4)) < 1e-12)  // "abcd"
  }

  test("codepoint-denominated: multibyte and astral characters count once each") {
    // U+00E9 (2 UTF-8 bytes) twice, U+1F600 (4 bytes, surrogate pair in
    // UTF-16) twice: both are ONE distinct codepoint with count 2
    assert(sums("éé", "😀😀") == Seq(e4(2), e4(2)))
  }

  test("matches the composable explode+groupBy formulation on real corpus text") {
    val docs = graft.sources.Tables.documents(spark, sf).limit(50)
      .filter(length(col("text")) > 0)
    val viaExpr = docs.select(col("doc_id"), CharEntropySum(col("text")).as("e"))
    val viaExplode = docs
      .select(col("doc_id"), explode(split(col("text"), "")).as("c"))
      .groupBy(col("doc_id"), col("c")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("cnt") > 1,
        round(col("cnt") * log(col("cnt")) * 10000.0).cast("long")).otherwise(0L)).as("e"))
    assert(viaExpr.join(viaExplode, Seq("doc_id"))
      .filter(viaExpr("e") =!= viaExplode("e")).count() == 0)
  }
}
