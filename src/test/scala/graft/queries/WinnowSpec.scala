package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec


/** Semantic pins for `dedup_winnow` (Schleimer, Wilkerson & Aiken,
  * SIGMOD 2003): the detection guarantee, the selection-density bound,
  * the document-frequency cap, and the identical-pair Jaccard identity.
  */
class WinnowSpec extends SparkSpec {

  private val K = DedupQueries.WinnowK
  private val W = DedupQueries.WinnowW

  private def docsDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("guarantee: a shared canonical substring of >= K+W-1 chars yields a shared fingerprint") {
    // two docs, disjoint vocabulary except one planted 30-char phrase
    // (> K+W-1 = 19 canonical chars): the paper's theorem says at least
    // one window inside the shared span selects the same k-gram hash
    val shared = "the quick brown fox jumps over"
    val a = s"alpha bravo charlie delta echo $shared foxtrot golf hotel india"
    val b = s"kilo lima mike november oscar $shared papa quebec romeo sierra"
    val fps = DedupQueries.winnowFingerprints(docsDf(Seq((0L, a), (1L, b))))
    val common = fps.filter(col("doc_id") === 0)
      .join(fps.filter(col("doc_id") === 1), Seq("h"), "left_semi").count()
    assert(common >= 1, "planted shared span must yield a shared fingerprint")
  }

  test("disjoint texts share nothing; selection density is bounded by the window count") {
    val a = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val b = "kilo lima mike november oscar papa quebec romeo sierra tango"
    val df = docsDf(Seq((0L, a), (1L, b)))
    val fps = DedupQueries.winnowFingerprints(df)
    val common = fps.filter(col("doc_id") === 0)
      .join(fps.filter(col("doc_id") === 1), Seq("h"), "left_semi").count()
    assert(common == 0, "disjoint vocabularies must not collide")
    // one selection per window start, de-duplicated: n_fps <= P - W + 1
    val bound = fps.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      .join(df.select(col("doc_id"),
        (length(graft.text.TextOps.canonicalText(col("text"))) - K + 1 - W + 1)
          .cast("long").as("max_n")), Seq("doc_id"))
    assert(bound.filter(col("n") > col("max_n")).count() == 0)
  }

  test("df cap: fingerprints shared by more than DfCap docs cannot pair documents") {
    // DfCap+5 docs that are IDENTICAL: every selected fingerprint has
    // df = 25 > 20, so the cap removes them all and no pair survives —
    // the boilerplate hot-key that would otherwise enumerate 25*24/2
    // candidate pairs is structurally excluded
    val boiler = "this content is repeated verbatim across every page of the site footer"
    val rows = (0L until (DedupQueries.WinnowDfCap + 5).toLong).map(i => (i, boiler))
    val tmp = writeDocsFixture(docsDf(rows))
    assert(graft.SparkEntry.queries("dedup_winnow")(spark, tmp).count() == 0)
  }

  test("two identical long docs pair with jaccard_e6 = 1000000") {
    val t = ("the winnowing fingerprint of an identical document pair must " +
      "coincide exactly so the jaccard reaches one million parts per million " +
      "with matching set sizes on both sides of the pair")
    val tmp = writeDocsFixture(docsDf(Seq((0L, t), (1L, t))))
    val out = graft.SparkEntry.queries("dedup_winnow")(spark, tmp).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 0L && r.getLong(1) == 1L)
    assert(r.getLong(2) == r.getLong(3), "equal fingerprint-set sizes")
    assert(r.getLong(4) == r.getLong(2), "full overlap")
    assert(r.getLong(5) == 1000000L)
  }

  test("non-ASCII fallback counts CODE POINTS (supplementary chars match a code-point reference)") {
    // canonicalText strips raw text to [a-z0-9 ] before the expression
    // today, but the expression must stay safe for direct reuse on raw
    // text: gram boundaries count code points (the Spark substring /
    // DuckDB substr unit), never UTF-16 chars — on supplementary
    // characters (2 chars, 1 code point) the two diverge
    val s = "ab😀cd ef🚀gh winnow fallback probe"
    def reference(text: String): Seq[Long] = {
      val cps = text.codePoints().toArray
      val p = cps.length - K + 1
      val md = java.security.MessageDigest.getInstance("MD5")
      val hs = (0 until p).map { i =>
        val g = new String(cps, i, K)
        val dig = md.digest(g.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        (0 until 7).foldLeft(0L)((v, b) => (v << 8) | (dig(b) & 0xffL))
      }
      val out = scala.collection.mutable.LinkedHashSet.empty[Long]
      for (j <- (W - 1) until p)
        out += ((j - W + 1) to j).map(hs).min
      out.toSeq
    }
    val got = spark.sql(s"SELECT 1").select(
        graft.plans.WinnowFingerprints.of(lit(s), K, W).as("fp"))
      .head().getSeq[Long](0).toSeq
    assert(got == reference(s))
    // and the ASCII fast path agrees with the same reference
    val ascii = "plain ascii winnow fallback probe text"
    val gotA = spark.sql(s"SELECT 1").select(
        graft.plans.WinnowFingerprints.of(lit(ascii), K, W).as("fp"))
      .head().getSeq[Long](0).toSeq
    assert(gotA == reference(ascii))
  }

  test("dedup_winnow is deterministic across runs") {
    val a = graft.SparkEntry.queries("dedup_winnow")(spark, sf).collect().toSeq
    val b = graft.SparkEntry.queries("dedup_winnow")(spark, sf).collect().toSeq
    assert(a == b)
  }

  test("incremental pairing equals an independent base-index recompute") {
    // reference built WITHOUT the persisted-index path: base df cap via
    // groupBy-count join (not the window), pairing re-derived — pins
    // that the memoized index serves exactly the published semantics
    val all = DedupQueries.winnowFingerprints(
      graft.sources.Tables.documents(spark, sf))
    val base = all.filter(col("doc_id") % 3 =!= 0)
    val keep = base.join(
      base.groupBy(col("h")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= DedupQueries.WinnowDfCap).select(col("h")),
      Seq("h"), "left_semi")
    val inc = all.filter(col("doc_id") % 3 === 0)
    val expected = inc.join(keep.select(col("doc_id").as("base_id"), col("h")), Seq("h"))
      .groupBy(col("doc_id"), col("base_id")).agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= DedupQueries.WinnowMinShared)
      .select(col("doc_id"), col("base_id"), col("n_shared"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = graft.SparkEntry.queries("dedup_winnow_incremental")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
    assert(got == expected)
  }

  test("winnow_stats: bands partition the fingerprint relation exactly") {
    val stats = graft.SparkEntry.queries("winnow_stats")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val fps = DedupQueries.winnowFingerprints(
      graft.sources.Tables.documents(spark, sf))
    val total = fps.count()
    assert(stats.values.map(_._2).sum == total,
      "postings across bands must conserve the fingerprint relation")
    val capped = stats.get("4_capped_out")
    capped.foreach { case (_, _, maxDf) =>
      assert(maxDf > DedupQueries.WinnowDfCap) }
    stats.get("1_singleton").foreach { case (nFps, nPost, maxDf) =>
      assert(nFps == nPost && maxDf == 1L) }
  }

  test("incremental pairs only cross the slice boundary") {
    val out = graft.SparkEntry.queries("dedup_winnow_incremental")(spark, sf).collect()
    out.foreach { r =>
      assert(r.getLong(0) % 3 == 0, "left side is the increment")
      assert(r.getLong(1) % 3 != 0, "right side is the base")
    }
  }
}
