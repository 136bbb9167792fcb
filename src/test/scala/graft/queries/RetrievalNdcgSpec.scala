package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Quality locks for the round-17 retrieval/ordering keys: the oracle
  * gate proves cross-engine equality; these pin the RANKING-QUALITY and
  * ORDERING claims — nDCG floors for the lexical family (the lock
  * `ann_recall*` provides for ANN) and the seeded shuffle's permutation
  * algebra.
  */
class RetrievalNdcgSpec extends SparkSpec {

  test("retrieval_ndcg: both rankers hold their nDCG@15 floor, strictly below ideal") {
    val rows = graft.SparkEntry.queries("retrieval_ndcg")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq == Seq("bm25", "hybrid"))
    val byRanker = rows.map(r => r._1 -> r).toMap
    // regression floors (sf0.001 actuals: bm25 0.9158, hybrid 0.5749) —
    // a scoring/fusion regression that tanks ranking quality trips these
    // even when it stays deterministic enough to produce SOME hash
    assert(byRanker("bm25")._4 >= 0.85, s"bm25 nDCG ${byRanker("bm25")._4}")
    assert(byRanker("hybrid")._4 >= 0.50, s"hybrid nDCG ${byRanker("hybrid")._4}")
    rows.foreach { case (ranker, dcg, idcg, ndcg) =>
      // DCG never exceeds ideal, and the metric is discriminative (not a
      // trivially-saturated 1.0 — the gain function must separate docs)
      assert(dcg <= idcg, s"$ranker dcg $dcg > idcg $idcg")
      assert(ndcg < 1.0, s"$ranker nDCG saturated at 1.0 — gains not discriminative")
      assert(math.abs(ndcg - dcg.toDouble / idcg) < 1e-6)
    }
    // one shared ideal: same qrels for both rankers
    assert(rows.map(_._3).distinct.length == 1)
  }

  test("retrieval_ndcg: the lexical ranker beats the fused ranker on lexical qrels") {
    // hybrid blends a semantic list that the lexical gain function does
    // not reward, so pure-BM25 must dominate on these qrels — pins that
    // the fusion actually MOVES the ranking (rrf is not a no-op passthru
    // of the lexical list)
    val rows = graft.SparkEntry.queries("retrieval_ndcg")(spark, sf)
      .collect().map(r => (r.getString(0), r.getDouble(3))).toMap
    assert(rows("bm25") > rows("hybrid"),
      s"bm25 ${rows("bm25")} should beat hybrid ${rows("hybrid")} on lexical gains")
  }

  test("retrieval_ndcg_batch: every query in the batch holds its per-query floor") {
    val rows = graft.SparkEntry.queries("retrieval_ndcg_batch")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L), "one row per batch query, in order")
    rows.foreach { case (q, dcg, idcg, ndcg) =>
      // sf0.001 actuals: 0.566 / 0.625 / 0.658 / 0.675 — the fused
      // ranker must stay well above random on every query, not on average
      assert(ndcg >= 0.45, s"query $q nDCG $ndcg below floor")
      assert(ndcg < 1.0 && dcg <= idcg, s"query $q dcg $dcg idcg $idcg")
    }
    // per-query ideals differ (different qrels per query) — pins that the
    // evaluation is actually per-query, not a shared pooled ideal
    assert(rows.map(_._3).distinct.length > 1)
  }

  test("shuffle_seeded is a complete permutation: positions 1..n, bijective on doc_id, hash-ordered") {
    val out = graft.SparkEntry.queries("shuffle_seeded")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    val n = graft.sources.Tables.documents(spark, sf).count()
    assert(out.length == n)
    assert(out.map(_._1).toSeq == (1L to n).toSeq, "positions are exactly 1..n in order")
    assert(out.map(_._2).distinct.length == n, "every doc appears once")
    // the order IS the content-addressed hash order (ties broken by id)
    assert(out.map(t => (t._3, t._2)).toSeq == out.map(t => (t._3, t._2)).sortBy(identity).toSeq)
    // and it is not the trivial identity order (the hash actually shuffles)
    assert(out.map(_._2).toSeq != out.map(_._2).sorted.toSeq)
  }

  test("shuffle_seeded's order matches an INDEPENDENT MD5 oracle (content-addressed, not RNG)") {
    // recompute the permutation key from scratch in plain JVM MD5 — an
    // implementation that swapped the content-addressed hash for any
    // engine RNG (rand(seed) etc.) produces a different order and fails.
    // Content-addressing is also exactly what makes the permutation
    // append-stable: a doc's key depends only on (doc_id, seed), so a
    // grown corpus splices new docs in without reordering the old ones.
    def key(docId: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$docId#42".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val out = graft.SparkEntry.queries("shuffle_seeded")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    out.foreach { case (_, docId, h) =>
      assert(h == key(docId), s"doc $docId engine hash $h != jvm md5 ${key(docId)}")
    }
    val expected = out.map(_._2).sortBy(id => (key(id), id))
    assert(out.sortBy(_._1).map(_._2).toSeq == expected.toSeq,
      "positions are not the MD5-key order")
  }

  test("epoch_plan: greedy quality-first allocation spends the budget exactly, repeats capped at 4") {
    val rows = graft.SparkEntry.queries("epoch_plan")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(rows.nonEmpty)
    val totalUniq = rows.map(_._3).sum
    val budget = 2L * totalUniq
    // budget multiplier 2 < repeat cap 4 → the budget is fully spendable
    // and the greedy spends it EXACTLY (closed-form clamp = sequential greedy)
    assert(rows.map(_._5).sum == budget, s"alloc ${rows.map(_._5).sum} != budget $budget")
    rows.foreach { case (src, nDocs, uniq, _, alloc, epochs, partial, shareE6) =>
      assert(nDocs > 0 && uniq > 0)
      assert(epochs >= 0 && epochs <= 4, s"$src epochs $epochs")
      assert(alloc == epochs * uniq + partial, s"$src alloc decomposition")
      assert(partial >= 0 && partial < uniq, s"$src partial $partial")
      assert(shareE6 >= 0 && shareE6 <= 1000000L)
    }
    // quality-first: in (quality desc, source) order the epoch counts are
    // non-increasing — full repeats for the best sources, one marginal
    // straddler, nothing for the rest
    val byQuality = rows.sortBy(r => (-r._4, r._1)).map(_._6)
    assert(byQuality.zip(byQuality.tail).forall { case (a, b) => a >= b },
      s"epochs not monotone in quality order: ${byQuality.mkString(",")}")
    // at most ONE source straddles the budget boundary with a partial epoch
    assert(rows.count(_._7 > 0) <= 1)
  }

  test("epoch_plan_incremental equals the full-corpus plan (the O(increment) merge is exact)") {
    val full = graft.SparkEntry.queries("epoch_plan")(spark, sf).collect().toSeq
    val inc = graft.SparkEntry.queries("epoch_plan_incremental")(spark, sf).collect().toSeq
    assert(inc == full)
  }

  test("epochMergeIncrement handles DISPLACEMENT: a smaller-id increment canonical moves the fp's mass between sources") {
    // the synthetic corpus has no cross-slice duplicate fingerprints, so
    // the oracle gate never exercises this branch — plant it: base doc 10
    // (srcA) and increment doc 3 share a fingerprint; the full-corpus
    // min-id election belongs to doc 3 (srcB), so the merge must SUBTRACT
    // srcA's copy and ADD srcB's. Also: a new-fp increment doc (srcB) and
    // a LOSING increment dup (id 30 > base 20) that must change nothing.
    import spark.implicits._
    val base = Seq(
      (10L, "srcA", "alpha beta gamma delta"),     // displaced by inc doc 3
      (20L, "srcA", "epsilon zeta eta theta"),     // stays canonical vs inc 30
      (11L, "srcB", "iota kappa lambda mu")
    ).toDF("doc_id", "source", "text")
    val incr = Seq(
      (3L, "srcB", "alpha beta gamma delta"),      // displaces base 10
      (30L, "srcB", "epsilon zeta eta theta"),     // loses to base 20
      (6L, "srcB", "nu xi omicron pi rho")         // new fp
    ).toDF("doc_id", "source", "text")
    val baseFp = TextPack.epochKeepFirst(TextPack.epochDocFeatures(base))
    val baseStats = TextPack.epochStats(baseFp)
    val incCanon = TextPack.epochKeepFirst(TextPack.epochDocFeatures(incr))
    val merged = TextPack.epochMergeIncrement(baseFp, baseStats, incCanon)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // ground truth: the full-corpus election over base ∪ increment
    val expected = TextPack.epochStats(
      TextPack.epochKeepFirst(TextPack.epochDocFeatures(base.unionByName(incr))))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(merged == expected, s"merged $merged != full $expected")
    // and the displacement actually moved mass: srcA lost doc 10's tokens
    assert(expected("srcA")._1 == 1L, "srcA should hold only doc 20 after displacement")
    assert(expected("srcB")._1 == 3L, "srcB holds docs 11, 3 (displacing), 6 (new)")
  }

  test("pack_curriculum packs the same token mass as pack_sequences, in an annealed order") {
    val packed = graft.SparkEntry.queries("pack_sequences")(spark, sf)
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    val cur = graft.SparkEntry.queries("pack_curriculum")(spark, sf)
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    // same sequence ids and total token mass (the order permutes WITHIN
    // each source's concat stream; cuts stay at the same offsets)
    assert(cur.keySet == packed.keySet)
    // but the composition differs: the anneal actually moved docs
    assert(cur != packed, "curriculum order identical to doc order")
  }

  test("pack_shuffled packs the same token mass as pack_sequences, in different sequence composition") {
    val packed = graft.SparkEntry.queries("pack_sequences")(spark, sf)
      .agg(sum("n_tokens")).collect()(0).getLong(0)
    val shuffled = graft.SparkEntry.queries("pack_shuffled")(spark, sf)
    val shuffledTok = shuffled.agg(sum("n_tokens")).collect()(0).getLong(0)
    // identical corpus token mass — the shuffle permutes, never drops
    assert(shuffledTok == packed)
    // every sequence is full (SeqLen) except possibly each source's last
    val bySrc = shuffled.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
      .groupBy(_._1)
    bySrc.foreach { case (src, seqs) =>
      val maxSeq = seqs.map(_._2).max
      seqs.filter(_._2 < maxSeq).foreach { case (_, seqId, nTok) =>
        assert(nTok == 256L, s"$src seq $seqId not full: $nTok")
      }
    }
  }
}
