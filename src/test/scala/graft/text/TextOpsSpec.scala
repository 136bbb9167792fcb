package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("tokens and regexTokens split as specified") {
    val df = Seq("hello world  x2 (a-b)").toDF("t")
    val r = df.select(size(TextOps.tokens($"t")), size(TextOps.regexTokens($"t"))).head()
    assert(r.getInt(0) == 4)
    assert(r.getInt(1) == 9) // hello world x 2 ( a - b )
  }

  test("shingles3 yields n-2 shingles, empty below 3 tokens") {
    val df = Seq("a b c d", "a b").toDF("t")
    val r = df.select(size(TextOps.shingles3(TextOps.tokens($"t")))).collect().map(_.getInt(0))
    assert(r.toSeq == Seq(2, 0))
  }

  test("fingerprint canonicalizes case/punct/whitespace") {
    val df = Seq(("The  Quick dog!", "the quick dog")).toDF("a", "b")
    val r = df.select(TextOps.fingerprint($"a") === TextOps.fingerprint($"b")).head()
    assert(r.getBoolean(0))
  }

  test("hash60 is deterministic, salt changes it") {
    val df = Seq("x").toDF("t")
    val r = df.select(TextOps.hash60($"t"), TextOps.hash60($"t"),
      TextOps.hash60($"t", lit(1))).head()
    assert(r.getLong(0) == r.getLong(1))
    assert(r.getLong(0) != r.getLong(2))
    assert(r.getLong(0) >= 0)
  }

  test("langId picks the language with most stopword hits, tie -> lexicographic") {
    val df = Seq("der und das xyz", "the of and is", "zz yy xx").toDF("t")
    val r = df.select(TextOps.langId(TextOps.tokens($"t"), $"t")).collect().map(_.getString(0))
    assert(r(0) == "de")
    assert(r(1) == "en")
    assert(r(2) == "de") // all-zero tie -> lexicographically first
  }

  test("langId zh branch: Han-majority text is zh; sparse Han quotes and empty text are not") {
    // real Chinese (>=10% Han of non-space chars), a mostly-English doc
    // quoting two Han chars (2/26 < 10% -> vote), pure-Han no-space text,
    // and whitespace-only (no Han -> falls to the all-zero-tie vote)
    val df = Seq(
      "\u4eca\u5929\u5929\u6c14\u5f88\u597d \u6211\u4eec\u53bb\u516c\u56ed",
      "the word \u4e2d\u56fd appears once in this otherwise english sentence of the usual kind",
      "\u4e2d\u6587\u6587\u672c\u6ca1\u6709\u7a7a\u683c",
      "   ").toDF("t")
    val r = df.select(TextOps.langId(TextOps.tokens($"t"), $"t")).collect().map(_.getString(0))
    assert(r(0) == "zh")
    assert(r(1) == "en")
    assert(r(2) == "zh")
    assert(r(3) == "de") // no Han, no stopwords: all-zero tie -> first code
  }

  test("qualityScore is in [0,1]") {
    val df = Seq("the a of and is", "unique different tokens every one").toDF("t")
    val r = df.select(TextOps.qualityScore(TextOps.tokens($"t"), Seq("the", "a", "of", "and", "is")))
      .collect().map(_.getDouble(0))
    r.foreach(x => assert(x >= 0.0 && x <= 1.0))
  }

  test("shinglesN yields n-k+1 shingles of the right width, empty below k tokens") {
    val df = Seq("a b c d e", "a b c").toDF("t")
    val r = df.select(TextOps.shinglesN(TextOps.tokens($"t"), 4)).collect()
      .map(_.getSeq[String](0))
    assert(r(0) == Seq("a b c d", "b c d e"))
    assert(r(1) == Seq.empty)
    // n = 1 degenerates to the token array itself
    val one = df.select(TextOps.shinglesN(TextOps.tokens($"t"), 1)).head().getSeq[String](0)
    assert(one == Seq("a", "b", "c", "d", "e"))
  }

  test("maxMultiplicity is the per-row mode count, 0 on empty") {
    val df = Seq(
      (Seq("x", "y", "x", "z", "x"), 3L),
      (Seq("a", "b", "c"), 1L),
      (Seq.empty[String], 0L),
      (Seq("q", "q"), 2L),
    ).toDF("arr", "want")
    val bad = df.filter(TextOps.maxMultiplicity($"arr") =!= $"want").count()
    assert(bad == 0)
  }
}
