package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Semantic pins for the diversity-selection operators added in r19:
  * `ann_mmr` (Carbonell & Goldstein 1998), `sample_coreset` (greedy
  * k-center, Gonzalez 1985 / Sener & Savarese 2018) and the
  * `vocab_coverage` OOV curve — greedy-order invariants, the
  * diversity/coverage dominance that justifies each operator over its
  * naive baseline, and curve monotonicity.
  */
class SelectionSpec extends SparkSpec {

  /** (id → unit-normalized vector) of the sf0.001 embeddings plus the
    * exact cosine — the driver-side truth kit for dominance checks
    * (bounded: the sf0.001 corpus).
    */
  private lazy val unitVecs: Map[Long, Array[Double]] = {
    val rows = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
    rows.map { r =>
      val v = r.getSeq[Number](1).map(_.doubleValue()).toArray
      val n = math.sqrt(v.map(x => x * x).sum)
      r.getLong(0) -> v.map(_ / n)
    }.toMap
  }
  private def cos(a: Long, b: Long): Double =
    unitVecs(a).zip(unitVecs(b)).map { case (x, y) => x * y }.sum
  private def maxPairCos(sel: Seq[Long]): Double =
    (for (a <- sel; b <- sel if a < b) yield cos(a, b)).max

  // ---------------------------------------------------------------- MMR

  test("tiny corpus: ann_mmr and sample_coreset emit the SHORTER list when the budget exceeds the pool") {
    // a corpus below MmrK / CoresetK must exhaust gracefully — the
    // unrolled oracles' per-step CTEs simply go empty, so the engine
    // side emits the shorter list instead of throwing on an empty
    // argmax (the r19 ADVICE divergence)
    val tmp = java.nio.file.Files.createTempDirectory("graft_tiny_emb")
    tmp.toFile.deleteOnExit()
    spark.sql(
      """SELECT CAST(id AS BIGINT) AS vec_id,
        |  transform(sequence(1, 8), i -> CAST(id * 31 + i * 7 AS FLOAT)) AS embedding,
        |  CAST(id % 2 AS INT) AS label
        |FROM range(5) AS t(id)""".stripMargin)
      .write.mode("overwrite").parquet(tmp.resolve("embeddings.parquet").toString)
    val d = tmp.toString
    val mmr = graft.SparkEntry.queries("ann_mmr")(spark, d)
      .orderBy(col("rank")).collect()
    // pool excludes the query (vec_id 0): 4 candidates < MmrK = 10
    assert(mmr.length == 4)
    assert(mmr.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L), "dense ranks")
    assert(mmr.map(_.getLong(1)).distinct.length == 4)
    val cs = graft.SparkEntry.queries("sample_coreset")(spark, d)
      .orderBy(col("rank")).collect()
    // the whole 5-vector corpus is selected, then the greedy stops
    assert(cs.length == 5)
    assert(cs.map(_.getLong(1)).sorted.toSeq == Seq(0L, 1L, 2L, 3L, 4L))
  }

  test("ann_mmr: rank 1 is the pure-relevance argmax; picks are distinct and from the pool") {
    val out = graft.SparkEntry.queries("ann_mmr")(spark, sf)
      .orderBy(col("rank")).collect()
    assert(out.length == SimQueries.MmrK)
    val ids = out.map(_.getLong(1)).toSeq
    assert(ids.distinct.size == ids.size)
    // rank 1 has zero redundancy and is the best-rel candidate
    assert(out.head.getDouble(3) == 0.0)
    val bestRel = unitVecs.keys.filter(_ != 0L).maxBy(id => (cos(0L, id), -id))
    assert(ids.head == bestRel)
  }

  test("ann_mmr: greedy MMR scores are non-increasing in rank") {
    // the pick set shrinks and the redundancy penalty grows pointwise,
    // so the attainable best score can only fall
    val m = graft.SparkEntry.queries("ann_mmr")(spark, sf)
      .orderBy(col("rank")).collect().map(_.getDouble(4))
    m.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a + 1e-12, s"mmr rose: $a -> $b") }
  }

  test("ann_mmr: the re-ranked list is strictly more diverse than top-k-by-relevance") {
    val picks = graft.SparkEntry.queries("ann_mmr")(spark, sf)
      .orderBy(col("rank")).collect().map(_.getLong(1)).toSeq
    val topK = unitVecs.keys.filter(_ != 0L).toSeq
      .sortBy(id => (-cos(0L, id), id)).take(SimQueries.MmrK)
    assert(maxPairCos(picks) < maxPairCos(topK),
      "MMR must reduce the worst within-list redundancy")
  }

  test("ann_mmr_batch: the q_id = 0 slice reproduces ann_mmr row for row") {
    val single = graft.SparkEntry.queries("ann_mmr")(spark, sf)
      .orderBy(col("rank")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    val slice = graft.SparkEntry.queries("ann_mmr_batch")(spark, sf)
      .filter(col("q_id") === 0).orderBy(col("rank")).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(slice.toSeq == single.toSeq, "batching must not change any query's list")
  }

  test("ann_mmr_batch: every query gets k distinct picks excluding itself") {
    val out = graft.SparkEntry.queries("ann_mmr_batch")(spark, sf).collect()
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L))
    byQ.foreach { case (q, rows) =>
      val ids = rows.map(_.getLong(2)).toSeq
      assert(ids.size == SimQueries.MmrK && ids.distinct.size == ids.size)
      assert(!ids.contains(q), "a query must not retrieve itself")
    }
  }

  // ------------------------------------------------------------ coreset

  test("sample_coreset: seed first, distinct picks, rank 2 is the global farthest point") {
    val out = graft.SparkEntry.queries("sample_coreset")(spark, sf)
      .orderBy(col("rank")).collect()
    assert(out.length == DedupQueries.CoresetK)
    val ids = out.map(_.getLong(1)).toSeq
    assert(ids.head == 0L && out.head.isNullAt(2))
    assert(ids.distinct.size == ids.size)
    val farthest = unitVecs.keys.filter(_ != 0L).minBy(id => (cos(0L, id), id))
    assert(ids(1) == farthest)
  }

  test("sample_coreset: the marginal max-cosine is non-decreasing (greedy k-center invariant)") {
    // each pick grows every point's max-sim to the selected set and
    // removes the current argmin, so the next argmin can only rise
    val ms = graft.SparkEntry.queries("sample_coreset")(spark, sf)
      .orderBy(col("rank")).collect().drop(1).map(_.getDouble(2))
    ms.sliding(2).foreach { case Array(a, b) =>
      assert(b >= a - 1e-12, s"maxsim fell: $a -> $b") }
  }

  test("sample_coreset: covers the corpus better than the first-k-ids baseline") {
    // k-center objective, cosine form: the worst-covered point's best
    // similarity to a center (higher = better coverage)
    val picks = graft.SparkEntry.queries("sample_coreset")(spark, sf)
      .orderBy(col("rank")).collect().map(_.getLong(1)).toSeq
    def objective(centers: Seq[Long]): Double =
      unitVecs.keys.toSeq.map(p => centers.map(c => cos(p, c)).max).min
    val baseline = unitVecs.keys.toSeq.sorted.take(DedupQueries.CoresetK)
    assert(objective(picks) > objective(baseline),
      "greedy coreset must out-cover a prefix sample of equal budget")
  }

  test("coreset_assign: total population conservation and per-center sanity") {
    val sel = graft.SparkEntry.queries("sample_coreset")(spark, sf)
      .collect().map(_.getLong(1)).toSet
    val out = graft.SparkEntry.queries("coreset_assign")(spark, sf)
      .orderBy(col("rank")).collect()
    assert(out.length == DedupQueries.CoresetK, "every center holds its own cell")
    assert(out.map(_.getLong(1)).toSet == sel, "report centers = selected centers")
    val n = graft.sources.Tables.embeddings(spark, sf).count()
    assert(out.map(_.getLong(2)).sum == n, "every corpus vector is assigned once")
    out.foreach { r =>
      val (nAsg, sumE6, minE6) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(minE6 * nAsg <= sumE6, "min below mean")
      assert(sumE6 <= 1000000L * nAsg, "cosine cannot exceed 1")
    }
  }

  test("coreset_assign: assignment is the argmax — recomputed independently per vector") {
    // independent driver-side recompute from unit vectors (10 sampled
    // vectors): the assigned center must be THE max-cosine center with
    // smallest-id tie-break
    val assigned = {
      // rebuild the per-vector assignment from the report is impossible
      // (it aggregates); recompute cells directly instead and compare
      // populations per center
      val centers = graft.SparkEntry.queries("sample_coreset")(spark, sf)
        .orderBy(col("rank")).collect().map(_.getLong(1)).toSeq
      val pops = unitVecs.keys.toSeq.map { v =>
        centers.map(c => (cos(v, c), c))
          .sortWith { case ((ca, ia), (cb, ib)) =>
            val x = java.lang.Double.compare(cb, ca)
            if (x != 0) x < 0 else ia < ib }.head._2
      }.groupBy(identity).map { case (c, xs) => c -> xs.size.toLong }
      pops
    }
    val got = graft.SparkEntry.queries("coreset_assign")(spark, sf)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got == assigned, "per-center populations must match the exact recompute")
  }

  test("ann_recall_matryoshka: harness shape, hit algebra, and the full-prefix identity") {
    val out = graft.SparkEntry.queries("ann_recall_matryoshka")(spark, sf).collect()
    assert(out.length == 30, "10 queries x 3 dim budgets")
    out.foreach { r =>
      val (hits, recall) = (r.getLong(2), r.getDouble(3))
      assert(hits >= 0 && hits <= 5)
      assert(recall == hits.toDouble / 5.0)
    }
    // verify by recomputing one query's truncated top-5 at dims=32 in
    // the PREFIX-WEIGHTED space the harness searches (w(i) = 8/(8+i),
    // 0-based; cosine is norm-invariant so weighting the unit vectors
    // equals weighting the raw ones)
    def weighted(id: Long): Array[Double] =
      unitVecs(id).zipWithIndex.map { case (x, i) => x * (8.0 / (i + 8.0)) }
    def cosW(a: Long, b: Long, dm: Int): Double = {
      val (x, y) = (weighted(a).take(dm), weighted(b).take(dm))
      val dot = x.zip(y).map { case (p, q) => p * q }.sum
      val nx = math.sqrt(x.map(v => v * v).sum); val ny = math.sqrt(y.map(v => v * v).sum)
      dot / (nx * ny)
    }
    val truth = unitVecs.keys.filter(_ != 0L).toSeq
      .sortBy(id => (-cosW(0L, id, 64), id)).take(5).toSet
    val approx32 = unitVecs.keys.filter(_ != 0L).toSeq
      .sortBy(id => (-cosW(0L, id, 32), id)).take(5).toSet
    val want = (approx32 & truth).size.toLong
    val got = out.filter(r => r.getLong(0) == 0L && r.getLong(1) == 32L).head.getLong(2)
    assert(got == want, s"dims=32 hits for q0 must match the exact recompute: $got vs $want")
  }

  test("ann_recall_matryoshka: the curve is monotone in dims and has signal at every budget") {
    // the r19 fixture was iid — recall@8 read 0.0 and the key couldn't
    // regress anything. On the prefix-weighted fixture the curve must
    // (a) be non-decreasing in the dim budget at EVERY sf and (b) sit
    // above a real floor, so a truncation-quality regression (broken
    // slice, wrong weights, wrong truth space) fails loudly.
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1").foreach { dir =>
      val byDims = graft.SparkEntry.queries("ann_recall_matryoshka")(spark, dir)
        .groupBy(col("dims")).agg(avg(col("recall")).as("r"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val curve = Seq(8L, 16L, 32L).map(byDims)
      curve.sliding(2).foreach { case Seq(a, b) =>
        assert(b >= a, s"recall must not drop with more dims at $dir: $curve")
      }
      assert(curve.head >= 0.15, s"recall@8 ${curve.head} has no signal at $dir")
      assert(curve.last >= 0.50, s"recall@32 ${curve.last} below floor at $dir")
    }
  }

  test("quality_calibration: deciles conserve the LM population; bands are ordered and exact") {
    val out = graft.SparkEntry.queries("quality_calibration")(spark, sf)
      .orderBy(col("decile")).collect()
    assert(out.length == 10)
    val lmPop = graft.SparkEntry.queries("lm_score")(spark, sf).count()
    assert(out.map(_.getLong(1)).sum == lmPop,
      "decile populations must conserve the scored-doc population")
    out.foreach { r =>
      val (n, p, e6, lo, hi) = (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))
      assert(p <= n && e6 == p * 1000000L / n)
      assert(lo <= hi)
    }
    // value bands must be disjoint and ascending decile over decile
    out.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(5) < b.getLong(4),
        "a value's ties land in one decile, so bands cannot overlap") }
  }

  // ----------------------------------------------------- vocab_coverage

  test("vocab_coverage: curve monotonicity and endpoint identities") {
    val out = graft.SparkEntry.queries("vocab_coverage")(spark, sf)
      .orderBy(col("v")).collect()
    assert(out.length == TextCorpus.CoverageBudgets.size)
    val covered = out.map(_.getLong(3))
    val oov = out.map(_.getLong(5))
    covered.sliding(2).foreach { case Array(a, b) => assert(b >= a) }
    oov.sliding(2).foreach { case Array(a, b) => assert(b <= a) }
    out.foreach { r =>
      val (v, nVocab, nTypes, cov, tot, o) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(nVocab == math.min(v, nTypes))
      assert(cov <= tot)
      assert(o == (tot - cov) * 1000000L / tot)
      if (nVocab == nTypes) assert(o == 0L, "full vocabulary covers everything")
    }
  }

  test("vocab_coverage: exact fixture — hand-counted bigram budgets") {
    import spark.implicits._
    // bigrams: "a b" x3 (docs 0,0,1), "b a" x1, "b c" x1, "c d" x1 ->
    // 6 occurrences, 4 types; top-64 covers all (budgets exceed types)
    val docsDf = Seq(
      (0L, "a b a b", "en", "s0", 7L),
      (1L, "a b c d", "en", "s0", 7L),
      (2L, "x", "en", "s0", 1L), // single token: no bigram, dropped
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = writeDocsFixture(docsDf)
    val out = graft.SparkEntry.queries("vocab_coverage")(spark, tmp)
      .orderBy(col("v")).collect()
    out.foreach { r =>
      assert(r.getLong(1) == 4L, "n_vocab = all 4 bigram types")
      assert(r.getLong(2) == 4L)
      assert(r.getLong(3) == 6L && r.getLong(4) == 6L)
      assert(r.getLong(5) == 0L)
    }
  }
}
