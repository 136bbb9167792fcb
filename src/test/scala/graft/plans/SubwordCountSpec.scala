package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins [[SubwordCount]]'s greedy longest-match semantics on a
  * constructed vocab, and that the generated-code path stays inside
  * whole-stage codegen (the expression's reason to exist).
  */
class SubwordCountSpec extends SparkSpec {

  private def counts(vocab: Set[String], maxLen: Int, texts: String*): Seq[Long] = {
    val df = spark.sql(texts.zipWithIndex
      .map { case (t, i) => s"($i, '${t.replace("'", "''")}')" }
      .mkString("SELECT * FROM VALUES ", ", ", " AS t(id, s)"))
    df.orderBy(col("id"))
      .select(SubwordCount(col("s"), vocab, maxLen).as("n"))
      .collect().map(_.getLong(0)).toSeq
  }

  test("greedy longest-match: vocab pieces consume, everything else is one char") {
    // vocab {ab, cd}: "abcd" -> ab|cd = 2; "acbd" -> a|c|b|d = 4;
    // "aabcd" -> a|ab|cd = 3 (greedy takes ab at pos 2, not a|b)
    assert(counts(Set("ab", "cd"), 2, "abcd", "acbd", "aabcd") == Seq(2L, 4L, 3L))
  }

  test("longest match wins over shorter at the same position") {
    // vocab {ab, abc}: "abcx" -> abc|x = 2 (not ab|c|x = 3)
    assert(counts(Set("ab", "abc"), 3, "abcx") == Seq(2L))
    // but a 3-piece is NOT taken when only the 2-prefix matches
    assert(counts(Set("ab"), 3, "abcx") == Seq(3L))
  }

  test("words split on the \\S+ whitespace class; empty/whitespace-only count 0") {
    // "ab ab\tab\nab" -> 4 pieces; whitespace never joins words into a match
    assert(counts(Set("ab"), 2, "ab ab\tab\nab", "", "   ") == Seq(4L, 0L, 0L))
    // "b a" with vocab {"b a"} must NOT match across the space
    assert(counts(Set("b a"), 3, "b a") == Seq(2L))
  }

  test("multi-byte text counts codepoints, not UTF-16 chars (DuckDB-replayed fixtures)") {
    // Expected values computed by a codepoint-indexed DuckDB greedy
    // replay (recursive CTE, substr/len semantics — the same shape as
    // tokenCountSubword's oracle), pinned here because ScalaTest can't
    // shell out to DuckDB. Hand-derivation of the de case:
    // über → üb|er = 2; prüfung → pr|üf|un|g = 4; größe → g|r|ö|ße = 4.
    assert(counts(Set("üb", "er", "pr", "üf", "un", "ße"), 2,
      "über prüfung größe") == Seq(10L))
    // años → añ|os = 2; señal → s|e|ñ|a|l = 5; camión → c|a|m|ió|n = 5
    assert(counts(Set("añ", "os", "ió"), 2, "años señal camión") == Seq(12L))
    // déjà → dé|jà = 2; l'été → l|'|ét|é = 4; çà → çà = 1
    assert(counts(Set("dé", "jà", "ét", "çà"), 2, "déjà l'été çà") == Seq(7L))
    // 3-codepoint piece on multi-byte text: über → übe|r = 2
    assert(counts(Set("übe"), 3, "über") == Seq(2L))
  }

  test("astral-plane codepoints: pieces slice at codepoint boundaries, fallback never splits a surrogate pair") {
    // 𝕏 (U+1D54F) and 𝕐 (U+1D550) are surrogate PAIRS in UTF-16: a
    // char-stepped matcher can never match the 2-codepoint piece 𝕏𝕐
    // (it slices 2 chars = just 𝕏) and would step half-pairs. Expected
    // (DuckDB replay): 𝕏𝕐ab → 𝕏𝕐|ab = 2; 𝕏a → 𝕏|a = 2; together 4.
    assert(counts(Set("𝕏𝕐", "ab"), 2, "𝕏𝕐ab", "𝕏a", "𝕏𝕐ab 𝕏a")
      == Seq(2L, 2L, 4L))
  }

  test("bounded cluster-side vocab learn equals the full-histogram driver filter") {
    // The production subwordVocab filters ≥1%-of-mass CLUSTER-side and
    // collects only survivors (≤100 rows by construction); this pins it
    // against the old unbounded path — collect the FULL piece histogram
    // and apply the identical integer threshold driver-side.
    import graft.text.TextOps
    val vocab = graft.queries.TextPack.subwordVocab(spark, sf)
    val rows = graft.sources.Tables.documents(spark, sf)
      .select(explode(TextOps.tokens(col("text"))).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("piece"))
      .groupBy(col("piece")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val total = rows.map(_._2).sum
    val expected = rows.filter(_._2 * 100 >= total).map(_._1).toSet
    assert(vocab == expected)
    assert(vocab.nonEmpty && vocab.size <= 100)
  }

  test("interpreted eval agrees with the codegen path") {
    val vocab = Set("th", "he", "in", "er")
    val df = spark.read.parquet(s"$sf/documents.parquet").limit(50)
    val viaExpr = df.select(SubwordCount(col("text"), vocab).as("n"))
      .agg(sum(col("n"))).head().getLong(0)
    val viaDriver = df.select(col("text")).collect().map { r =>
      val hs = new java.util.HashSet[String](); vocab.foreach(hs.add)
      SubwordCount.count(r.getString(0), hs, 2)
    }.sum
    assert(viaExpr == viaDriver && viaExpr > 0)
  }
}
