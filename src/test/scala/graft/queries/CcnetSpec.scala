package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Semantic pins for the round-17 source/language profiling additions:
  * the CCNet perplexity tertiles (`ccnet_bucket` / `ccnet_report`) and
  * the top-K vocabulary-overlap matrix (`vocab_overlap`). The oracle
  * gate proves cross-engine equality; these prove the queries compute
  * what their scaladocs CLAIM, by independent driver-side recomputation
  * from the registered upstream relations.
  */
class CcnetSpec extends SparkSpec {

  test("ccnet_bucket equals a driver-side tertile recompute; buckets are value-monotone with non-empty heads") {
    // independent side: per-doc mean_nll_e4 from the registered lm_score
    // key (the quality_rank_corr convention), langs from the raw table,
    // value-group tertiles via the shared driver-side fold
    val lm = graft.SparkEntry.queries("lm_score")(spark, sf).collect()
      .map(r => r.getLong(0) -> halfAway(r.getLong(2), r.getLong(1))).toMap
    val langOf = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = valueGroupTertiles(
      lm.toSeq.map { case (id, v) => (id, langOf(id), v) })
    val got = graft.SparkEntry.queries("ccnet_bucket")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3))).toSet
    assert(got == want,
      s"diff got-want ${(got -- want).take(5)} want-got ${(want -- got).take(5)}")

    // semantic pins: population = the LM-scorable docs exactly; per lang
    // the bucket is monotone in the score value (head values < middle
    // values < tail values) and head is never empty
    assert(got.map(_._1) == lm.keySet)
    got.groupBy(_._2).foreach { case (lang, rows) =>
      def vals(b: String) = rows.filter(_._4 == b).map(_._3)
      assert(vals("head").nonEmpty, s"$lang: empty head")
      for (h <- vals("head"); m <- vals("middle")) assert(h < m, s"$lang: head $h >= middle $m")
      for (m <- vals("middle"); t <- vals("tail")) assert(m < t, s"$lang: middle $m >= tail $t")
      // equal scores can never straddle buckets (the value-group contract
      // that makes the boundaries pure thresholds, streamable with zero state)
      rows.groupBy(_._3).foreach { case (v, g) =>
        assert(g.map(_._4).toSet.size == 1, s"$lang value $v straddles buckets")
      }
    }
  }

  test("ccnet_report closes on the per-doc bucket relation cell-for-cell") {
    val lmN = graft.SparkEntry.queries("lm_score")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val perDoc = graft.SparkEntry.queries("ccnet_bucket")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    val want = perDoc.groupBy(t => (t._2, t._4)).map { case ((lang, b), rows) =>
      (lang, b, rows.size.toLong, rows.map(t => lmN(t._1)).sum,
        rows.map(_._3).min, rows.map(_._3).max)
    }.toSet
    val got = graft.SparkEntry.queries("ccnet_report")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == want, s"got $got\nwant $want")
  }

  test("vocab_overlap equals a driver-side top-K Jaccard recompute over every source pair") {
    val K = 15
    val rows = graft.sources.Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val topk: Map[String, Set[String]] = rows.groupBy(_._1).map { case (src, ds) =>
      val counts = ds.flatMap(_._2.split("\\s+").filter(_.nonEmpty))
        .groupBy(identity).map { case (w, o) => w -> o.length.toLong }
      src -> counts.toSeq.sortBy { case (w, c) => (-c, w) }.take(K).map(_._1).toSet
    }
    val srcs = topk.keys.toSeq.sorted
    val want = (for {
      a <- srcs; b <- srcs if a < b
      sa = topk(a); sb = topk(b)
      inter = (sa & sb).size.toLong
    } yield (a, b, sa.size.toLong, sb.size.toLong, inter,
      inter * 1000000L / (sa.size + sb.size - inter))).toSet
    val got = graft.SparkEntry.queries("vocab_overlap")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == want,
      s"diff got-want ${(got -- want).take(5)} want-got ${(want -- got).take(5)}")
    // complete matrix: every unordered pair reported exactly once,
    // jaccard bounded in [0, 1e6]
    assert(got.size == srcs.size * (srcs.size - 1) / 2)
    assert(got.forall(t => t._6 >= 0L && t._6 <= 1000000L))
  }
}
