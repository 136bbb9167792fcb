package graft.dedup

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

class DedupSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", "s1"),
    (2L, "the quick brown fox jumps over the lazy cat", "s1"), // near-dup of 1
    (3L, "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG!!!", "s1"), // exact-dup of 1 after canon
    (4L, "completely different words entirely unrelated text here now", "s1"),
    (5L, "the quick brown fox jumps over the lazy dog", "s2") // exact raw dup, other block
  ).toDF("doc_id", "text", "source").cache()

  test("exactGroups collapses canonical duplicates and keeps min id") {
    val g = Dedup.exactGroups(docs, "text", "doc_id")
    assert(g.count() == 3) // {1,3,5}, {2}, {4}
    val big = g.filter($"n_docs" === 3).head()
    assert(big.getAs[Long]("keep_id") == 1L)
  }

  test("minhash signatures: identical texts share all signatures, near-dups most") {
    val sig = Dedup.minhashSignatures(docs, "text", "doc_id", 16)
    val byDoc = sig.groupBy("doc_id").agg(collect_list("minh")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(byDoc(1L) == byDoc(5L)) // same text, same sigs
    val shared12 = byDoc(1L).intersect(byDoc(2L)).size
    val shared14 = byDoc(1L).intersect(byDoc(4L)).size
    assert(shared12 > shared14) // near-dup shares more minhashes than unrelated
  }

  test("LSH banding surfaces the exact-dup pair and no unrelated pair") {
    val sig = Dedup.minhashSignatures(docs, "text", "doc_id", 16)
    val cand = Dedup.lshCandidatePairs(sig, "doc_id", 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((1L, 5L)))
    assert(!cand.contains((1L, 4L)) && !cand.contains((4L, 5L)))
  }

  test("jaccard verification: near-dups above, unrelated below threshold") {
    val persisted = Dedup.ngramJaccardPairsPersisted(docs, "text", "doc_id", "source", 0.3)
    val pairs = persisted.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    persisted.unpersist()
    assert(pairs.contains((1L, 2L))) // 7-of-9 shingles shared
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("simhash: identical docs get identical hashes; hamming(near-dup) < hamming(unrelated)") {
    val sh = Dedup.simhash48(docs, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(5L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sh(1L), sh(2L)) < hamming(sh(1L), sh(4L)))
  }

  test("end-to-end near-dup pipeline on real documents: sig -> candidates -> verify") {
    val real = Tables.documents(spark, sf).limit(200)
    val sig = Dedup.minhashSignatures(real, "text", "doc_id", 16)
    val cand = Dedup.lshCandidatePairs(sig, "doc_id", 4)
    // candidate generation must be far below the quadratic pair count
    assert(cand.count() < 200L * 199 / 2 / 10)
  }

  test("lshVerifiedPairsPersisted (self-contained form) equals the composable pipeline and returns persisted pairs") {
    // the one-shot API: persists+materializes internally, releases its
    // shingle index, hands back a persisted pair set
    val oneShot = Dedup.lshVerifiedPairsPersisted(docs, "text", "doc_id",
      k = 16, rowsPerBand = 4, threshold = 0.5)
    assert(oneShot.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
    val ex = Dedup.shingleHashRelation(docs, "text", "doc_id")
    val composed = Dedup.verifiedPairsFromHashes(ex, "doc_id", 16, 4, 0.5)
    def set(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(set(oneShot) == set(composed))
    // raw-identical texts (the shingle pipeline tokenizes RAW text — only
    // exactGroups canonicalizes) verify at jaccard 1.0
    assert(set(oneShot).contains((1L, 5L)))
    oneShot.unpersist()
  }

  test("clusterLabels resolves chains transitively to the component min; dupOfFirst does not") {
    val pairs = Seq((1L, 2L, 0.5), (2L, 3L, 0.5), (10L, 11L, 0.9))
      .toDF("id_a", "id_b", "jaccard")
    val m = Dedup.clusterLabels(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    // the gap clusterLabels closes: dupOfFirst records 3 -> 2, but 2 is
    // itself dropped as a dup of 1 — following dup_of lands on a dropped doc
    val d = Dedup.dupOfFirst(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d(3L) == 2L && d.contains(2L))
  }

  test("clusterLabels pointer jumping converges on a 32-node path and an empty input") {
    val path = (1L until 32L).map(i => (i, i + 1, 1.0)).toDF("id_a", "id_b", "jaccard")
    val m = Dedup.clusterLabels(path).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m.size == 32 && m.values.forall(_ == 1L))
    val empty = Seq.empty[(Long, Long, Double)].toDF("id_a", "id_b", "jaccard")
    assert(Dedup.clusterLabels(empty).collect().isEmpty)
  }

  test("clusterLabels adversarial: 10k-node path converges in O(log d) rounds, star in O(1)") {
    // the two extreme component shapes: a path maximizes diameter (the
    // pointer-jumping worst case), a star maximizes degree skew (one hot
    // node in every round's edge relaxation)
    val n = 10000
    val path = (0 until n - 1).map(i => (i.toLong, i.toLong + 1)).toDF("id_a", "id_b")
    val (labels, rounds) = Dedup.clusterLabelsWithRounds(path)
    assert(labels.count() == n)
    assert(labels.filter(col("canonical") =!= 0L).count() == 0,
      "every path node must resolve to the component min")
    // relax extends the labeled frontier by 1, the jump composes labels
    // (depth ~halves), so rounds = O(log2 diameter); +2 covers the first
    // frontier-building round and the final no-change detection round
    val bound = math.ceil(math.log((n - 1).toDouble) / math.log(2)).toInt + 2
    assert(rounds <= bound, s"path: $rounds rounds > bound $bound")
    val star = (1 until n).map(i => (0L, i.toLong)).toDF("id_a", "id_b")
    val (slabels, srounds) = Dedup.clusterLabelsWithRounds(star)
    assert(slabels.count() == n)
    assert(slabels.filter(col("canonical") =!= 0L).count() == 0,
      "every spoke must resolve to the hub")
    // hub label reaches every spoke in the first relaxation; the rest is
    // fixpoint detection — size-independent
    assert(srounds <= 3, s"star: $srounds rounds")
  }

  test("driver union-find and distributed fixpoint resolve identical components") {
    // clusterLabels takes the in-process fast path below
    // DriverComponentsMaxEdges; its output contract (canonical = exact
    // component min for every paired node) must be indistinguishable
    // from the distributed fixpoint's. A mixed graph: two chains, a
    // triangle with a chord, isolated pairs, ids out of order.
    val edges = Seq(
      (7L, 3L), (3L, 9L), (9L, 1L),          // chain resolving to 1
      (20L, 22L), (22L, 24L), (20L, 24L),    // triangle
      (24L, 21L),                            // chord extending it
      (100L, 50L),                           // isolated pair, reversed ids
      (6L, 6L)                               // self-loop must not corrupt
    ).toDF("id_a", "id_b")
    val fast = Dedup.clusterLabels(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Dedup.clusterLabelsWithRounds(edges)._1.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == dist, s"fast $fast != distributed $dist")
    assert(fast(7L) == 1L && fast(21L) == 20L && fast(100L) == 50L && fast(6L) == 6L)
  }

  test("chain fixture: jaccard(a,c) below threshold still resolves all of {a,b,c} to a") {
    // sliding windows over 16 distinct tokens: j(a,b)=j(b,c)=5/11 ≈ 0.45,
    // j(a,c)=2/14 ≈ 0.14 < 0.2 — the verified pairs form the chain a–b, b–c
    def words(from: Int, to: Int) = (from to to).map(i => f"w$i%02d").mkString(" ")
    val chain = Seq((1L, words(1, 10), "x"), (2L, words(4, 13), "x"), (3L, words(7, 16), "x"))
      .toDF("doc_id", "text", "source")
    val verified = Dedup.ngramJaccardPairsPersisted(chain, "text", "doc_id", "source",
      Dedup.LshParams.Threshold)
    val pairSet = verified.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairSet == Set((1L, 2L), (2L, 3L)), s"fixture pairs were $pairSet")
    val m = Dedup.clusterLabels(verified).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    verified.unpersist()
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("multi-table embedding LSH: sound, deduplicated, recall monotone in tables") {
    val emb = Tables.embeddings(spark, sf)
    val th = 0.2
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val one = pairSet(Dedup.embeddingLshPairs(emb, "vec_id", "embedding", 8, th))
    val multi = Dedup.embeddingLshPairsMulti(emb, "vec_id", "embedding",
      nPlanes = 8, nTables = 4, threshold = th)
    val multiRows = multi.collect()
    val multiSet = multiRows.map(r => (r.getLong(0), r.getLong(1))).toSet
    // dedup before verify: one output row per pair even with 4 tables
    assert(multiRows.length == multiSet.size)
    // soundness: every emitted pair really is above the cosine threshold
    assert(multiRows.forall(_.getAs[Double]("cos") >= th))
    // table 0 of the multi scheme IS the single-table scheme -> superset
    assert(one.subsetOf(multiSet))
    // and on this corpus the extra tables genuinely recover more pairs
    assert(multiSet.size > one.size,
      s"expected OR-amplification to add pairs: single=${one.size} multi=${multiSet.size}")
  }

  test("dedup_substring: planted shared span found with exact boundaries, overlaps merged") {
    // two docs share one verbatim 12-token region (>= K=8), surrounded
    // by unique filler; a third doc shares nothing. The 12-token region
    // yields 5 overlapping duplicated 8-gram windows per doc, which
    // must merge into ONE span of exactly 12 tokens.
    val shared = (1 to 12).map(i => s"common$i").mkString(" ")
    val a = s"alpha beta gamma $shared tail1 tail2"
    val b = s"x1 x2 x3 x4 $shared y1"
    val c = "nothing here resembles the others at all in any window of eight tokens"
    val docsDf = spark.sql(
      s"""SELECT * FROM VALUES
         |  (0L, '$a', 's'), (1L, '$b', 's'), (2L, '$c', 's')
         |  AS t(doc_id, text, source)""".stripMargin)
    val tmp = java.nio.file.Files.createTempDirectory("ssdocs")
    docsDf.write.mode("overwrite").parquet(tmp.resolve("documents.parquet").toString)
    val out = graft.queries.DedupQueries.queries("dedup_substring")(spark, tmp.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // both sharing docs report exactly one 12-token span; doc 2 absent
    assert(out == Seq((0L, 1L, 12L), (1L, 1L, 12L)), out.toString)
    // the removal transform drops exactly the span: doc 0 keeps its 5
    // unique tokens, doc 1 its 5, doc 2 everything; cleaned md5 equals
    // the md5 of the expected kept-token join
    val scrub = graft.queries.DedupQueries.queries("scrub_substring")(spark, tmp.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    def m(t: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(scrub == Seq(
      (0L, 17L, 5L, m("alpha beta gamma tail1 tail2")),
      (1L, 17L, 5L, m("x1 x2 x3 x4 y1")),
      (2L, 13L, 13L, m(c))), scrub.toString)
  }

  test("dedup_substring_incremental equals the full-corpus spans restricted to the increment") {
    import org.apache.spark.sql.functions.col
    // union equivalence: a gram is duplicated for an increment doc iff
    // >= 2 distinct docs of old UNION increment hold it, so the
    // incremental probe (old-index membership OR within-increment
    // count) must reproduce the full pipeline's spans exactly for
    // every increment doc — same span count, duplicated-token total
    // and token denominator
    val full = graft.queries.DedupQueries.queries("dedup_substring")(spark, sf)
      .filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), col("n_spans"), col("dup_tokens"), col("n_tokens"))
    val inc = graft.queries.DedupQueries.queries("dedup_substring_incremental")(spark, sf)
    val incCore = inc.select(col("doc_id"), col("n_spans"), col("dup_tokens"), col("n_tokens"))
    assert(full.exceptAll(incCore).count() == 0 && incCore.exceptAll(full).count() == 0,
      "incremental spans diverge from the full-corpus restriction")
    // every span carries at least one provenance flag, and this corpus
    // exercises both provenances
    val rows = inc.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("n_spans_old") + r.getAs[Long]("n_spans_inc")
      >= r.getAs[Long]("n_spans")))
    assert(rows.map(_.getAs[Long]("n_spans_old")).sum > 0)
    assert(rows.map(_.getAs[Long]("n_spans_inc")).sum > 0)
  }
}
