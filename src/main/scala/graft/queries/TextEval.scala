package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.ExactRound
import graft.sources.Tables
import graft.text.TextOps

/** Gate-measurement surface of the text family: the Gopher rule funnel
  * report, rule-gate evaluation and ablation, language-ID evaluation,
  * benchmark-side decontamination report, and the cheap-vs-LM quality
  * rank correlation — the measure-your-gates keys. Split out of
  * [[TextQueries]] (r18, file-size maintainability only): registered
  * under the SAME "text" family in [[Registry]] — execution order,
  * cache-clear boundaries, and family totals are unchanged. References
  * into [[TextQueries]] (decontamination grams, LM core, quality
  * formulas) are one-directional, so no initialization cycle can form.
  */
object TextEval {
  private type Q = (SparkSession, String) => DataFrame
  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)
  // ========================================================================
  // quality_rules_report — the Gopher rule funnel (Rae et al.,
  // arXiv:2112.11446 §A1.1, adapted to exact integer thresholds): per
  // source, how many docs fail each structural quality rule, and how
  // many pass ALL of them — the per-rule attribution a curation run
  // reads before tuning thresholds (a source failing mostly on
  // word-count needs different handling than one failing on
  // alpha-fraction). Rules, each an integer inequality (no doubles, so
  // the flags hash identically cross-engine):
  //   R1 word count        n ∈ [50, 100000]
  //   R2 mean word length  3 ≤ nonws/n ≤ 10      (3n ≤ nonws ≤ 10n)
  //   R3 symbol ratio      (#hash + #ellipsis)/n ≤ 0.1
  //                        (10·(3·n_hash + d3) ≤ 3·n, d3 = 3·#ellipsis)
  //   R4 stopword hits     ≥ 2 hits against the union stopword table
  //   R5 alpha fraction    ascii-alpha chars ≥ 0.8·nonws (5·na ≥ 4·nonws)
  // On this (all-ASCII synthetic) corpus R1 and R4 are the
  // discriminative rules — ~half the docs sit under the 50-word floor
  // and short docs miss the 2-stopword bar across every lang slice —
  // while R3/R5 pass vacuously (no symbols, no non-ASCII text); on a
  // real multilingual crawl R5 is what screens non-Latin scripts out
  // of an English-centric pipeline.
  //
  // Scale shape: every rule input is a scan-side codegen expression
  // (regexp_replace/length/replace/CountInSet); the only movement is
  // the map-side-combined per-source flag sums → ≤|sources| rows. At
  // 100 TB this is the textbook one-pass funnel report.
  // ========================================================================
  private val AllStop = TextOps.LangStopwords.flatMap(_._2).distinct
  private lazy val AllStopSqlList = AllStop.map(w => s"'$w'").mkString(",")

  /** Per-doc Gopher rule flags over any frame carrying `text` — the
    * shared scan-side stage of the batch report AND the streaming
    * admission gate ([[graft.streaming.StreamingCurate.rulesGate]]):
    * one definition, so the two cannot diverge. Input columns other
    * than `text` pass through; adds f_nword/f_wordlen/f_symbol/
    * f_stop/f_alpha (0/1 longs). Stateless and codegen-only — exactly
    * what makes the gate free on a stream.
    */
  private[graft] def qualityRuleFlags(df: DataFrame): DataFrame =
    df.withColumn("n", size(TextOps.tokens(col("text"))).cast("long"))
      .withColumn("nonws",
        length(regexp_replace(col("text"), "\\s", "")).cast("long"))
      .withColumn("na",
        length(regexp_replace(col("text"), "[^A-Za-z]", "")).cast("long"))
      .withColumn("n_hash",
        (length(col("text")) - length(expr("replace(text, '#', '')"))).cast("long"))
      .withColumn("d3",
        (length(col("text")) - length(expr("replace(text, '...', '')"))).cast("long"))
      .withColumn("n_stop", TextOps.wordSetCount(TextOps.tokens(col("text")), AllStop))
      .withColumn("f_nword",
        when(col("n") < 50 || col("n") > 100000, 1L).otherwise(0L))
      .withColumn("f_wordlen",
        when(col("nonws") < lit(3L) * col("n")
          || col("nonws") > lit(10L) * col("n"), 1L).otherwise(0L))
      .withColumn("f_symbol",
        when(lit(10L) * (lit(3L) * col("n_hash") + col("d3")) > lit(3L) * col("n"),
          1L).otherwise(0L))
      .withColumn("f_stop", when(col("n_stop") < 2, 1L).otherwise(0L))
      .withColumn("f_alpha",
        when(lit(5L) * col("na") < lit(4L) * col("nonws"), 1L).otherwise(0L))
      // the pass-all verdict is emitted HERE, once — the report, the
      // gate eval, and the streaming gate all consume this column, so
      // a sixth rule added above changes all three together
      .withColumn("pass_all",
        when(col("f_nword") + col("f_wordlen") + col("f_symbol")
          + col("f_stop") + col("f_alpha") === 0, 1L).otherwise(0L))
      .drop("n", "nonws", "na", "n_hash", "d3", "n_stop")

  /** The per-doc rule-flag relation (doc_id, source, five 0/1 flags,
    * pass_all — no text), memoized per (session, dir) and PERSISTED —
    * r21 optimization (guide §1.2 step 1): four keys
    * (`quality_rules_report`, `rules_gate_eval`, `rules_ablation`,
    * `quality_calibration`) each re-ran the tokenize + regexp flag scan
    * over the whole corpus; the flags are a pure function of `text`, so
    * one id-sized persisted relation serves them all. The STREAMING
    * gate keeps the stateless [[qualityRuleFlags]] projection — this
    * memo is batch-side reuse only, semantics shared via the one
    * definition.
    */
  private val ruleFlagsMemo =
    scala.collection.mutable.Map.empty[(SparkSession, String), DataFrame]
  private def ruleFlagsCore(s: SparkSession, d: String): DataFrame =
    RelationMemo.relation(ruleFlagsMemo, (s, d), "ruleFlagsCore") {
      qualityRuleFlags(docs(s, d).select(col("doc_id"), col("source"), col("text")))
        .drop("text").persist()
    }

  def qualityRulesReport(s: SparkSession, d: String): DataFrame = {
    val f = ruleFlagsCore(s, d)
    f.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("f_nword")).as("fail_nword"),
        sum(col("f_wordlen")).as("fail_wordlen"),
        sum(col("f_symbol")).as("fail_symbol"),
        sum(col("f_stop")).as("fail_stop"),
        sum(col("f_alpha")).as("fail_alpha"),
        sum(col("pass_all")).as("n_pass_all"))
      .orderBy(col("source"))
  }

  /** Per-doc rule-flag CTEs (`rfl` = doc_id, source, the five 0/1
    * flags) — ONE rendering shared by the report's and the gate-eval's
    * oracles, mirroring the single Spark-side [[qualityRuleFlags]].
    */
  private lazy val ruleFlagsCtesSql =
    s"""rf AS (
       |  SELECT doc_id, source,
       |    CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n,
       |    CAST(length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT) AS nonws,
       |    CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS na,
       |    CAST(length(text) - length(replace(text, '#', '')) AS BIGINT) AS n_hash,
       |    CAST(length(text) - length(replace(text, '...', '')) AS BIGINT) AS d3,
       |    CAST(len(list_filter(regexp_extract_all(text, '\\S+'),
       |      t -> t IN ($AllStopSqlList))) AS BIGINT) AS n_stop
       |  FROM documents),
       |rfl AS (
       |  SELECT doc_id, source,
       |    CASE WHEN n < 50 OR n > 100000 THEN 1 ELSE 0 END AS f_nword,
       |    CASE WHEN nonws < 3 * n OR nonws > 10 * n THEN 1 ELSE 0 END AS f_wordlen,
       |    CASE WHEN 10 * (3 * n_hash + d3) > 3 * n THEN 1 ELSE 0 END AS f_symbol,
       |    CASE WHEN n_stop < 2 THEN 1 ELSE 0 END AS f_stop,
       |    CASE WHEN 5 * na < 4 * nonws THEN 1 ELSE 0 END AS f_alpha
       |  FROM rf),
       |rflp AS (
       |  SELECT *, CASE WHEN f_nword + f_wordlen + f_symbol + f_stop + f_alpha = 0
       |    THEN 1 ELSE 0 END AS pass_all
       |  FROM rfl)""".stripMargin

  private lazy val qualityRulesReportSql =
    s"""WITH $ruleFlagsCtesSql
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(f_nword) AS BIGINT) AS fail_nword,
       |  CAST(sum(f_wordlen) AS BIGINT) AS fail_wordlen,
       |  CAST(sum(f_symbol) AS BIGINT) AS fail_symbol,
       |  CAST(sum(f_stop) AS BIGINT) AS fail_stop,
       |  CAST(sum(f_alpha) AS BIGINT) AS fail_alpha,
       |  CAST(sum(pass_all) AS BIGINT) AS n_pass_all
       |FROM rflp GROUP BY source ORDER BY source""".stripMargin

  // ========================================================================
  // rules_gate_eval — the cheap structural-rule gate scored against the
  // corpus-LM gate, per source: confusion counts (both-pass,
  // rules-only, lm-only, neither) and exact precision/recall_e6 of
  // "passes the rules" as a predictor of "passes the LM gate". The
  // gate-level (binary) companion of quality_rank_corr's rank-level
  // measurement, and the third eval in the measure-your-gates family
  // (lang_id_eval, quality_rank_corr): high precision ⇒ the free
  // codegen gate can prefilter before the LM scores anything; low
  // recall ⇒ the rules throw away docs the LM would keep, and the
  // thresholds need tuning before the funnel trusts them.
  //
  // Scale shape: flags are scan-side codegen (the shared
  // qualityRuleFlags projection); the LM side reuses the persisted
  // per-doc TextQueries.lmScoreCore relation (doc_id-keyed join); the confusion agg
  // partial-aggregates map-side to ≤|sources| rows, where the exact
  // integer ratios are free.
  // ========================================================================
  def rulesGateEval(s: SparkSession, d: String): DataFrame = {
    val rp = ruleFlagsCore(s, d)
      .select(col("doc_id"), col("source"), col("pass_all").as("rp"))
    val lm = TextQueries.lmScoreCore(s, d).select(col("doc_id"), col("n_bg"), col("nll_sum_e4"))
    rp.join(lm, Seq("doc_id"), "left")
      .withColumn("lp",
        when(col("nll_sum_e4").isNull
          || col("nll_sum_e4") <= col("n_bg") * lit(TextQueries.GateNllE4PerBigram), 1L)
          .otherwise(0L))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("rp") === 1 && col("lp") === 1, 1L).otherwise(0L)).as("n_both"),
        sum(when(col("rp") === 1 && col("lp") === 0, 1L).otherwise(0L)).as("n_rules_only"),
        sum(when(col("rp") === 0 && col("lp") === 1, 1L).otherwise(0L)).as("n_lm_only"),
        sum(when(col("rp") === 0 && col("lp") === 0, 1L).otherwise(0L)).as("n_neither"))
      .withColumn("precision_e6",
        when(col("n_both") + col("n_rules_only") > 0,
          expr(ExactRound.spark("n_both * 1000000", "n_both + n_rules_only")))
          .otherwise(lit(null).cast("long")))
      .withColumn("recall_e6",
        when(col("n_both") + col("n_lm_only") > 0,
          expr(ExactRound.spark("n_both * 1000000", "n_both + n_lm_only")))
          .otherwise(lit(null).cast("long")))
      .orderBy(col("source"))
  }

  private lazy val rulesGateEvalSql =
    s"""WITH $ruleFlagsCtesSql,
       |lm AS (SELECT doc_id, n_bg, nll_sum_e4 FROM (${TextQueries.lmScoreCoreSql})),
       |j AS (
       |  SELECT rflp.source, rflp.pass_all AS rp,
       |    CASE WHEN lm.nll_sum_e4 IS NULL
       |           OR lm.nll_sum_e4 <= lm.n_bg * ${TextQueries.GateNllE4PerBigram}
       |      THEN 1 ELSE 0 END AS lp
       |  FROM rflp LEFT JOIN lm USING (doc_id)),
       |ag AS (
       |  SELECT source, count(*) AS n_docs,
       |    CAST(sum(CASE WHEN rp = 1 AND lp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
       |    CAST(sum(CASE WHEN rp = 1 AND lp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_rules_only,
       |    CAST(sum(CASE WHEN rp = 0 AND lp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_lm_only,
       |    CAST(sum(CASE WHEN rp = 0 AND lp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neither
       |  FROM j GROUP BY source)
       |SELECT source, n_docs, n_both, n_rules_only, n_lm_only, n_neither,
       |  CASE WHEN n_both + n_rules_only > 0
       |    THEN CAST(${ExactRound.duck("n_both * 1000000", "n_both + n_rules_only")} AS BIGINT)
       |    ELSE NULL END AS precision_e6,
       |  CASE WHEN n_both + n_lm_only > 0
       |    THEN CAST(${ExactRound.duck("n_both * 1000000", "n_both + n_lm_only")} AS BIGINT)
       |    ELSE NULL END AS recall_e6
       |FROM ag ORDER BY source""".stripMargin

  // ========================================================================
  // rules_ablation — per-rule marginal contribution of the Gopher gate:
  // for each rule, how many docs it fails (n_fail, the report's
  // attribution) and how many it is the ONLY rule to fail (n_solo) —
  // exactly the docs that would be newly ADMITTED if that one rule were
  // dropped, i.e. the leave-one-out ablation a threshold-tuning run
  // reads. quality_rules_report's fail counts can't answer "which rule
  // is doing unique work": a rule whose failures are all shadowed by
  // other rules (n_solo = 0) can be removed without changing the
  // funnel's output, while a high-solo rule is load-bearing. solo_ppm =
  // n_solo·10⁶ div n_docs prices the ablation in corpus fraction (floor
  // div, the straddle_ppm convention). Long format (source, rule) so a
  // sixth rule adds rows, not columns.
  //
  // Scale shape: the flags are the SAME scan-side codegen projection
  // the report and the streaming gate share (qualityRuleFlags — one
  // definition, the three cannot diverge); the only movement is the
  // map-side-combined per-source agg to ≤|sources| rows, where the
  // 5-row stack reshape and the ppm are free. ONE documents scan, ONE
  // exchange, no join.
  // ========================================================================
  def rulesAblation(s: SparkSession, d: String): DataFrame = {
    val f = ruleFlagsCore(s, d)
      .withColumn("ft", col("f_nword") + col("f_wordlen") + col("f_symbol")
        + col("f_stop") + col("f_alpha"))
    val rules = Seq("alpha", "nword", "stop", "symbol", "wordlen")
    val ag = f.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      rules.flatMap { r =>
        Seq(sum(col(s"f_$r")).as(s"fl_$r"),
          sum(when(col(s"f_$r") === 1 && col("ft") === 1, 1L).otherwise(0L))
            .as(s"so_$r"))
      }: _*)
    val stackArgs = rules.map(r => s"'$r', fl_$r, so_$r").mkString(", ")
    ag.selectExpr("source", "n_docs",
        s"stack(${rules.length}, $stackArgs) AS (rule, n_fail, n_solo)")
      .withColumn("solo_ppm", expr("(n_solo * 1000000) div n_docs"))
      .select(col("source"), col("rule"), col("n_fail"), col("n_solo"),
        col("solo_ppm"))
      .orderBy(col("source"), col("rule"))
  }

  private lazy val rulesAblationSql = {
    val rules = Seq("alpha", "nword", "stop", "symbol", "wordlen")
    val legs = rules.map { r =>
      s"SELECT source, '$r' AS rule, fl_$r AS n_fail, so_$r AS n_solo, n_docs FROM ag"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH $ruleFlagsCtesSql,
       |ftot AS (
       |  SELECT source, f_nword, f_wordlen, f_symbol, f_stop, f_alpha,
       |    f_nword + f_wordlen + f_symbol + f_stop + f_alpha AS ft
       |  FROM rfl),
       |ag AS (
       |  SELECT source, count(*) AS n_docs,
       |    ${rules.map(r =>
             s"CAST(sum(f_$r) AS BIGINT) AS fl_$r, " +
             s"CAST(sum(CASE WHEN f_$r = 1 AND ft = 1 THEN 1 ELSE 0 END) AS BIGINT) AS so_$r")
             .mkString(",\n       |    ")}
       |  FROM ftot GROUP BY source),
       |lg AS (
       |  $legs)
       |SELECT source, rule, n_fail, n_solo,
       |  CAST((n_solo * 1000000) // n_docs AS BIGINT) AS solo_ppm
       |FROM lg ORDER BY source, rule""".stripMargin
  }

  // ========================================================================
  // lang_id_eval — the heuristic language-ID scored against the
  // corpus's ANNOTATED lang column: populated confusion-matrix cells
  // (lang → lang_pred counts) with per-lang totals and exact-integer
  // recall_e6. The eval that decides whether the heuristic is good
  // enough to gate on. r18 closed the classifier's structural zh hole
  // (TextOps.langId Han-fraction branch answers real Chinese text —
  // TextOpsSpec pins it), yet zh recall on THIS corpus stays 0, and
  // that is now a DATA finding the eval surfaces honestly: the
  // synthetic corpus's zh-LABELED docs contain zero Han characters at
  // every SF (verified sf0.001/0.01/0.1 — same English token soup as
  // every other label, no separating signal of any kind), so no
  // content-based classifier can recover those labels. A production
  // owner reading this row learns their labels, not their classifier,
  // are the problem — the other job a gate eval exists to do.
  // Scale: ONE map-side-combined agg to ≤ |langs|² rows; the
  // total/diagonal windows run over that tiny relation only.
  // ========================================================================
  def langIdEval(s: SparkSession, d: String): DataFrame = {
    val cm = docs(s, d)
      .select(col("lang"),
        TextOps.langId(TextOps.tokens(col("text")), col("text")).as("lang_pred"))
      .groupBy(col("lang"), col("lang_pred")).agg(count(lit(1)).as("n_docs"))
    val byLang = Window.partitionBy(col("lang"))
    cm.withColumn("lang_total", sum(col("n_docs")).over(byLang))
      .withColumn("diag", sum(when(col("lang") === col("lang_pred"), col("n_docs"))
        .otherwise(lit(0L))).over(byLang))
      .withColumn("recall_e6", expr("(diag * 1000000) div lang_total"))
      .select(col("lang"), col("lang_pred"), col("n_docs"),
        col("lang_total"), col("recall_e6"))
      .orderBy(col("lang"), col("lang_pred"))
  }

  private val langIdEvalSql = {
    def score(words: Seq[String]) =
      s"len(list_filter(toks, t -> t IN (${words.map(w => s"'$w'").mkString(",")})))"
    val langs = TextOps.LangStopwords.toMap
    s"""WITH lc AS (
       |  SELECT lang,
       |    CASE WHEN is_zh THEN 'zh'
       |         WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
       |         WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
       |         WHEN s_es >= s_fr THEN 'es'
       |         ELSE 'fr' END AS lang_pred
       |  FROM (
       |    SELECT lang, ${score(langs("de"))} AS s_de, ${score(langs("en"))} AS s_en,
       |      ${score(langs("es"))} AS s_es, ${score(langs("fr"))} AS s_fr,
       |      ${TextOps.isZhSql("text")} AS is_zh
       |    FROM (SELECT lang, text, regexp_extract_all(text, '\\S+') AS toks FROM documents))),
       |cm AS (
       |  SELECT lang, lang_pred, count(*) AS n_docs
       |  FROM lc GROUP BY lang, lang_pred)
       |SELECT lang, lang_pred, n_docs,
       |  CAST(sum(n_docs) OVER (PARTITION BY lang) AS BIGINT) AS lang_total,
       |  CAST((sum(CASE WHEN lang = lang_pred THEN n_docs ELSE 0 END)
       |      OVER (PARTITION BY lang) * 1000000)
       |    // sum(n_docs) OVER (PARTITION BY lang) AS BIGINT) AS recall_e6
       |FROM cm ORDER BY lang, lang_pred""".stripMargin
  }

  // ========================================================================
  // decontaminate_report — the contamination screen FLIPPED: per
  // BENCHMARK item, how compromised is the eval? `decontaminate` tells
  // the trainer which corpus docs to drop; this tells the evaluator
  // which benchmark items no longer measure generalization (their
  // content leaked into training data) — the report that accompanies
  // any published eval on a model trained over the corpus. Per bench
  // doc: distinct-shingle inventory, how many of those shingles appear
  // in ≥ 1 corpus doc (n_grams_leaked), how many corpus docs share ≥ 1
  // shingle (n_docs_hit), and the exact-integer leak fraction
  // (leak_e6 = leaked·10⁶ div grams). Same gram definition as the
  // screen (TextQueries.decontGramsCol — batch and stream hash identical grams).
  //
  // Scale shape: the bench side is SMALL by definition → its exploded
  // (bench_id, gram) relation broadcasts; the corpus side explodes
  // per-doc distinct shingles and hash-joins WITHOUT shuffling the
  // corpus; only matching rows — sparse by construction — reach the
  // two-distinct-count agg, keyed by bench_id (≤ bench-sized output).
  // ========================================================================
  def decontaminateReport(s: SparkSession, d: String): DataFrame = {
    val bench = TextQueries.decontBench(s, d)
    val benchEx = bench
      .select(col("bench_id"), explode(col("grams")).as("gram"))
    val matched = TextQueries.decontGrams(s, d, col("doc_id") % TextQueries.DecontBenchMod =!= 0)
      .select(col("doc_id").as("cdoc"), explode(col("grams")).as("gram"))
      .join(broadcast(benchEx), Seq("gram"))
    val perBench = matched.groupBy(col("bench_id"))
      .agg(countDistinct(col("gram")).as("hit_grams"),
        countDistinct(col("cdoc")).as("hit_docs"))
    bench.select(col("bench_id"),
        size(col("grams")).cast("long").as("n_grams"))
      .join(perBench, Seq("bench_id"), "left")
      .select(col("bench_id"), col("n_grams"),
        coalesce(col("hit_grams"), lit(0L)).as("n_grams_leaked"),
        coalesce(col("hit_docs"), lit(0L)).as("n_docs_hit"))
      .withColumn("leak_e6",
        when(col("n_grams") > 0,
          expr("(n_grams_leaked * 1000000) div n_grams")).otherwise(lit(0L)))
      .orderBy(col("bench_id"))
  }

  private val decontaminateReportSql =
    s"""WITH ${TextQueries.decontCtesSql},
      |bx AS (
      |  SELECT doc_id AS bench_id, unnest(grams) AS gram FROM dg
      |  WHERE doc_id % ${TextQueries.DecontBenchMod} = 0),
      |cx AS (SELECT doc_id AS cdoc, unnest(grams) AS gram FROM corpus),
      |pb AS (
      |  SELECT bench_id, count(DISTINCT gram) AS hit_grams,
      |    count(DISTINCT cdoc) AS hit_docs
      |  FROM bx JOIN cx USING (gram) GROUP BY bench_id)
      |SELECT dg.doc_id AS bench_id,
      |  CAST(len(grams) AS BIGINT) AS n_grams,
      |  CAST(coalesce(hit_grams, 0) AS BIGINT) AS n_grams_leaked,
      |  CAST(coalesce(hit_docs, 0) AS BIGINT) AS n_docs_hit,
      |  CAST(CASE WHEN len(grams) > 0
      |    THEN (coalesce(hit_grams, 0) * 1000000) // len(grams)
      |    ELSE 0 END AS BIGINT) AS leak_e6
      |FROM dg LEFT JOIN pb ON dg.doc_id = pb.bench_id
      |WHERE dg.doc_id % ${TextQueries.DecontBenchMod} = 0
      |ORDER BY bench_id""".stripMargin

  // ========================================================================
  // quality_rank_corr — Spearman rank agreement between the CHEAP
  // heuristic quality gate (QualityE6) and the EXPENSIVE corpus-LM gate
  // (mean bigram NLL), per source. The question a pipeline owner asks
  // before ordering the gates: if the cheap signal ranks documents the
  // way the LM does (rho near +1), it can prefilter aggressively and
  // the LM only scores survivors (the pipeline_curate_lm ordering); if
  // rho is low the heuristic is NOT a proxy and both gates must run.
  // Spearman over DISTINCT ranks is pure integer arithmetic: rank A =
  // row_number by (quality_e6 DESC, doc_id), rank B = row_number by
  // (mean_nll_e4 ASC, doc_id) — both tie-broken by doc_id and computed
  // over the LM-scorable population (n >= 2 tokens), d = rA − rB,
  // rho = 1 − 6·Σd² / (n(n²−1)), emitted as exact half-away rho_e6
  // (ExactRound — numerator may be negative). The LM side reuses the
  // persisted per-doc TextQueries.lmScoreCore relation (5th consumer); the quality
  // side is the shared QualityE6 interpolation on the same scan shape.
  //
  // Scale: the two rank windows share ONE hashpartitioning(source)
  // exchange; the per-doc LM join is doc_id-keyed; the Σd² agg
  // partial-aggregates map-side to |sources| rows. The rho numerator is
  // |n(n²−1) − 6Σd²|·10⁶·2 ≤ 2n³·10⁶ — past 2⁶³ at only ~16.6k docs per
  // source — so it runs in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB),
  // good to n ≈ 3.7×10¹⁰ docs per source; the ≤|sources|-row agg makes
  // the wide arithmetic free.
  // ========================================================================
  def qualityRankCorr(s: SparkSession, d: String): DataFrame = {
    val feats = docs(s, d)
      .withColumn("toks", graft.plans.EvalOnce(TextOps.tokens(col("text"))))
      .select(col("doc_id"), col("source"),
        size(col("toks")).cast("long").as("n"),
        TextOps.wordSetCount(col("toks"), TextQueries.enStop).cast("long").as("n_stop"),
        TextOps.distinctCount(col("toks")).as("n_dist"))
      .filter(col("n") >= 2) // the LM-scorable population, exactly
      .withColumn("q_e6", expr(TextQueries.QualityE6Expr))
    val lm = TextQueries.lmScoreCore(s, d).select(col("doc_id"),
      expr(ExactRound.spark("nll_sum_e4", "n_bg")).as("mean_nll_e4"))
    val bySrc = Window.partitionBy(col("source"))
    val ranked = feats.join(lm, Seq("doc_id"))
      .withColumn("r_q", row_number()
        .over(bySrc.orderBy(col("q_e6").desc, col("doc_id"))).cast("long"))
      .withColumn("r_l", row_number()
        .over(bySrc.orderBy(col("mean_nll_e4").asc, col("doc_id"))).cast("long"))
    ranked.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum((col("r_q") - col("r_l")) * (col("r_q") - col("r_l"))).as("sum_d2"))
      .withColumn("nd", col("n_docs").cast("decimal(38,0)"))
      .withColumn("rho_e6",
        when(col("n_docs") > 1, expr(ExactRound.spark(
          "(nd * (nd * nd - 1) - 6 * CAST(sum_d2 AS DECIMAL(38,0))) * 1000000",
          "nd * (nd * nd - 1)")).cast("long"))
          .otherwise(lit(null).cast("long")))
      .drop("nd")
      .orderBy(col("source"))
  }

  private lazy val qualityRankCorrSql =
    s"""WITH qf AS (
       |  SELECT doc_id, source, ${TextQueries.QualityE6Sql} AS q_e6
       |  FROM (
       |    SELECT doc_id, source,
       |      CAST(len(toks) AS BIGINT) AS n,
       |      CAST(len(list_filter(toks, tk -> tk IN (${TextQueries.EnStopSqlList}))) AS BIGINT) AS n_stop,
       |      CAST(len(list_distinct(toks)) AS BIGINT) AS n_dist
       |    FROM (SELECT doc_id, source, regexp_extract_all(text, '\\S+') AS toks
       |          FROM documents))
       |  WHERE n >= 2),
       |lmq AS (
       |  SELECT doc_id, ${ExactRound.duck("nll_sum_e4", "n_bg")} AS mean_nll_e4
       |  FROM (${TextQueries.lmScoreCoreSql})),
       |rk AS (
       |  SELECT source,
       |    CAST(row_number() OVER (PARTITION BY source
       |      ORDER BY q_e6 DESC, doc_id) AS BIGINT) AS r_q,
       |    CAST(row_number() OVER (PARTITION BY source
       |      ORDER BY mean_nll_e4 ASC, doc_id) AS BIGINT) AS r_l
       |  FROM qf JOIN lmq USING (doc_id)),
       |ag AS (
       |  SELECT source, count(*) AS n_docs,
       |    CAST(sum((r_q - r_l) * (r_q - r_l)) AS BIGINT) AS sum_d2
       |  FROM rk GROUP BY source)
       |SELECT source, n_docs, sum_d2,
       |  CASE WHEN n_docs > 1 THEN CAST(${ExactRound.duck(
              "(n_docs::HUGEINT * (n_docs::HUGEINT * n_docs::HUGEINT - 1) - 6 * sum_d2::HUGEINT) * 1000000",
              "n_docs::HUGEINT * (n_docs::HUGEINT * n_docs::HUGEINT - 1)")} AS BIGINT)
       |       ELSE NULL END AS rho_e6
       |FROM ag ORDER BY source""".stripMargin

  // ========================================================================
  // quality_calibration — the LM-score ↔ rule-gate calibration table:
  // docs bucketed into exact deciles of the bigram-LM mean NLL (the
  // lmScoreCore relation, lower = more fluent), each decile reporting
  // its Gopher-rules pass rate (exact-integer e6). The artifact a
  // curation owner reads to PICK an LM threshold: the decile where the
  // pass rate falls off is where the cheap structural gate and the
  // statistical score stop agreeing — quality_rank_corr says WHETHER
  // they agree (one rho per source), this says WHERE (the operating
  // point). Deciles are computed on the exact e4-quantized mean NLL
  // (the ExactRound algebra — no double round crosses the boundary):
  // per distinct score value, bucket = 1 + min(9, (docs-before·10) div
  // n) — a value's ties land in ONE decile, so the table is
  // deterministic under any row order.
  //
  // Scale shape: the decile window runs over the VALUE-GROUP relation,
  // whose cardinality is bounded by the e4 quantization RANGE (a few
  // 100k distinct values no matter how many docs), never corpus rows —
  // the reason the quantile_bucket chunk-offset decomposition isn't
  // needed here. Everything corpus-sized is one join of two memoized/
  // scan-side per-doc relations and a map-side-combined value count.
  // Docs with < 2 tokens have no bigram NLL and are outside the
  // calibration domain (inner join), matching lm_score's population.
  // ========================================================================
  def qualityCalibration(s: SparkSession, d: String): DataFrame = {
    val lm = TextQueries.lmScoreCore(s, d)
      .select(col("doc_id"),
        expr(ExactRound.spark("nll_sum_e4", "n_bg")).as("v"))
    val flags = ruleFlagsCore(s, d).select(col("doc_id"), col("pass_all"))
    val g = lm.join(flags, Seq("doc_id"))
      .groupBy(col("v")).agg(count(lit(1)).as("cnt"), sum(col("pass_all")).as("np"))
    val w = Window.orderBy(col("v"))
    g.withColumn("bf", coalesce(sum(col("cnt"))
        .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n", sum(col("cnt"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("decile", lit(1L) + least(lit(9L), expr("(bf * 10) div n")))
      .groupBy(col("decile"))
      .agg(sum(col("cnt")).as("n_docs"), sum(col("np")).as("n_pass"),
        min(col("v")).as("lo_nll_e4"), max(col("v")).as("hi_nll_e4"))
      .withColumn("pass_e6", expr(
        "CAST((CAST(n_pass AS DECIMAL(38,0)) * 1000000) div n_docs AS BIGINT)"))
      .select(col("decile"), col("n_docs"), col("n_pass"), col("pass_e6"),
        col("lo_nll_e4"), col("hi_nll_e4"))
      .orderBy(col("decile"))
  }

  private lazy val qualityCalibrationSql =
    s"""WITH $ruleFlagsCtesSql,
       |lm AS MATERIALIZED (SELECT * FROM (${TextQueries.lmScoreCoreSql})),
       |per AS (
       |  SELECT lm.doc_id,
       |    CAST(${ExactRound.duck("nll_sum_e4", "n_bg")} AS BIGINT) AS v,
       |    rflp.pass_all
       |  FROM lm JOIN rflp ON lm.doc_id = rflp.doc_id),
       |g AS (SELECT v, count(*) AS cnt, sum(pass_all) AS np FROM per GROUP BY v),
       |o AS (
       |  SELECT v, cnt, np,
       |    coalesce(sum(cnt) OVER (ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bf,
       |    sum(cnt) OVER () AS n
       |  FROM g),
       |b AS (SELECT 1 + least(9, (bf * 10) // n) AS decile, cnt, np, v FROM o)
       |SELECT CAST(decile AS BIGINT) AS decile, CAST(sum(cnt) AS BIGINT) AS n_docs,
       |  CAST(sum(np) AS BIGINT) AS n_pass,
       |  CAST((sum(np)::HUGEINT * 1000000) // sum(cnt) AS BIGINT) AS pass_e6,
       |  CAST(min(v) AS BIGINT) AS lo_nll_e4, CAST(max(v) AS BIGINT) AS hi_nll_e4
       |FROM b GROUP BY decile ORDER BY decile""".stripMargin

  val queries: Map[String, Q] = Map(
    "quality_calibration" -> (qualityCalibration _),
    "quality_rules_report" -> (qualityRulesReport _),
    "rules_gate_eval" -> (rulesGateEval _),
    "rules_ablation" -> (rulesAblation _),
    "lang_id_eval" -> (langIdEval _),
    "decontaminate_report" -> (decontaminateReport _),
    "quality_rank_corr" -> (qualityRankCorr _),
  )

  val oracleSql: Map[String, String] = Map(
    "quality_calibration" -> qualityCalibrationSql,
    "quality_rules_report" -> qualityRulesReportSql,
    "rules_gate_eval" -> rulesGateEvalSql,
    "rules_ablation" -> rulesAblationSql,
    "lang_id_eval" -> langIdEvalSql,
    "decontaminate_report" -> decontaminateReportSql,
    "quality_rank_corr" -> qualityRankCorrSql,
  )
}
