package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Union of all query groups. Keys must be unique across groups; the
  * `require` below guards against silent shadowing in the Map merge.
  *
  * Execution order matters for attributable benchmarks: `families`
  * exposes a DETERMINISTIC (family, sorted keys) sequence so Bench/Verify
  * timings stay comparable run-over-run even as queries are added — a
  * HashMap iteration order reshuffles whenever any key is added, which
  * made round-over-round per-query numbers incomparable.
  */
object Registry {
  private val groups: Seq[(String, Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      ("core", CoreQueries.queries, CoreQueries.oracleSql),
      ("feature", FeatureQueries.queries, FeatureQueries.oracleSql),
      ("window", WindowQueries.queries, WindowQueries.oracleSql),
      ("join", JoinQueries.queries, JoinQueries.oracleSql),
      ("text", TextQueries.queries, TextQueries.oracleSql),
      ("text", TextRetrieval.queries, TextRetrieval.oracleSql),
      ("text", TextPack.queries, TextPack.oracleSql),
      ("text", TextLm.queries, TextLm.oracleSql),
      ("text", TextEval.queries, TextEval.oracleSql),
      ("text", TextCorpus.queries, TextCorpus.oracleSql),
      ("dedup", DedupQueries.queries, DedupQueries.oracleSql),
      ("sim", SimQueries.queries, SimQueries.oracleSql),
      ("rel", RelQueries.queries, RelQueries.oracleSql),
      ("ts", TsQueries.queries, TsQueries.oracleSql),
    )

  /** (family name, alphabetically ordered query keys) in declared group
    * order — the canonical execution order for Bench and Verify.
    *
    * Multiple GROUPS may share one family name (TextQueries is split
    * across source files purely for maintainability — the split must
    * not change execution order, cache-clear boundaries, or family
    * totals, all keyed by family name): same-named groups merge into
    * one family whose keys sort alphabetically ACROSS the merged set,
    * exactly the pre-split order.
    */
  val families: Seq[(String, Seq[String])] = {
    val order = groups.map(_._1).distinct
    val byName = groups.groupBy(_._1)
    order.map { name =>
      name -> byName(name).flatMap(_._2.keys).sorted
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = groups.flatMap(_._2)
    require(all.map(_._1).distinct.size == all.size, "duplicate query keys across groups")
    all.toMap
  }

  val oracleSql: Map[String, String] = groups.flatMap(_._3).toMap

  /** Eval-HARNESS keys: queries whose job is to MEASURE another
    * operator against a ground truth (recall/precision/accuracy/
    * correlation locks, parameter sweeps, leakage audits) rather than
    * to produce a data artifact. Their cost is measurement cost —
    * brute-force truth sets, bounded query fan-outs, confusion
    * matrices — not operator cost, and they dominate the bench top-10,
    * so Bench reports family totals with and without them and flags
    * each in bench_full.json. Criterion for membership: deleting the
    * key would lose an EVALUATION of an operator, not the operator.
    */
  val harnessKeys: Set[String] = {
    val ks = Set(
      "ann_recall", "ann_recall_kmeans", "ann_recall_pq", "ann_recall_graph",
      "ann_graph_pathlen",
      "ann_recall_matryoshka",
      "ann_text_recall", "knn_accuracy",
      "dedup_lsh_recall", "dedup_lsh_precision", "dedup_lsh_tuning",
      "dedup_minhash_est",
      "retrieval_ndcg", "retrieval_ndcg_batch",
      "lang_id_eval", "rules_gate_eval", "rules_ablation", "watermark_eval",
      "quality_rank_corr", "quality_rules_report", "quality_calibration",
      "ts_forecast_eval", "split_leakage",
    )
    // a typo'd tag must fail loudly, not silently untag a key
    val unknown = ks -- queries.keySet
    require(unknown.isEmpty, s"harnessKeys not in queries: ${unknown.mkString(", ")}")
    ks
  }
}
