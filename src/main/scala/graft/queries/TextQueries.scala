package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.text.TextOps

/** Text-analysis queries over `documents` (training-data-pipeline
  * extensions): token/character statistics, quality scoring, heuristic
  * language-ID, token counting, canonical fingerprinting.
  *
  * All per-row expression pipelines — linear scans, no shuffle (except
  * the final presentation ORDER BY), no UDFs.
  */
object TextQueries {
  private type Q = (SparkSession, String) => DataFrame
  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  private val enStop = TextOps.LangStopwords.toMap.apply("en")

  // ========================================================================
  // text_stats — length/token statistics + stopword & lexical-diversity
  // ratios (quality-scoring inputs).
  // ========================================================================
  def textStats(s: SparkSession, d: String): DataFrame =
    docs(s, d).select(col("doc_id"), TextOps.tokens(col("text")).as("toks"),
        length(col("text")).cast("long").as("n_chars_calc"))
      .select(
        col("doc_id"), col("n_chars_calc"),
        size(col("toks")).cast("long").as("n_tokens"),
        // unrounded: integer-count numerators over identical token counts
        // give bit-identical quotients cross-engine, and k/n rationals sit
        // exactly on rounding half-boundaries for power-of-two n
        (aggregate(transform(col("toks"), t => length(t)), lit(0), (a, x) => a + x)
          .cast("double") / size(col("toks"))).as("avg_token_len"),
        (TextOps.wordSetCount(col("toks"), enStop).cast("double") / size(col("toks")))
          .as("stopword_ratio"),
        (size(array_distinct(col("toks"))).cast("double") / size(col("toks")))
          .as("distinct_ratio"))
      .orderBy(col("doc_id"))

  private val textStatsSql =
    """SELECT doc_id, n_chars_calc, n_tokens,
      |  sum_len / n_tokens AS avg_token_len,
      |  n_stop / n_tokens AS stopword_ratio,
      |  n_distinct / n_tokens AS distinct_ratio
      |FROM (
      |  SELECT doc_id,
      |    CAST(length(text) AS BIGINT) AS n_chars_calc,
      |    CAST(len(toks) AS BIGINT) AS n_tokens,
      |    CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) AS sum_len,
      |    CAST(len(list_filter(toks, t -> t IN ('the','and','of','is','a'))) AS DOUBLE) AS n_stop,
      |    CAST(len(list_distinct(toks)) AS DOUBLE) AS n_distinct
      |  FROM (SELECT doc_id, text, regexp_extract_all(text, '\S+') AS toks FROM documents))
      |ORDER BY doc_id""".stripMargin

  // ========================================================================
  // lang_id — stopword-hit heuristic over 4 language sets; ties break to
  // the lexicographically first code. True label kept for inspection.
  // ========================================================================
  def langId(s: SparkSession, d: String): DataFrame =
    docs(s, d).select(col("doc_id"), col("lang"),
        TextOps.langId(TextOps.tokens(col("text"))).as("lang_pred"))
      .orderBy(col("doc_id"))

  private val langIdSql = {
    def score(words: Seq[String]) =
      s"len(list_filter(toks, t -> t IN (${words.map(w => s"'$w'").mkString(",")})))"
    val de = score(TextOps.LangStopwords.toMap.apply("de"))
    val en = score(TextOps.LangStopwords.toMap.apply("en"))
    val es = score(TextOps.LangStopwords.toMap.apply("es"))
    val fr = score(TextOps.LangStopwords.toMap.apply("fr"))
    s"""SELECT doc_id, lang,
       |  CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
       |       WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
       |       WHEN s_es >= s_fr THEN 'es'
       |       ELSE 'fr' END AS lang_pred
       |FROM (
       |  SELECT doc_id, lang, $de AS s_de, $en AS s_en, $es AS s_es, $fr AS s_fr
       |  FROM (SELECT doc_id, lang, regexp_extract_all(text, '\\S+') AS toks FROM documents))
       |ORDER BY doc_id""".stripMargin
  }

  // ========================================================================
  // token_count — whitespace tokens vs BPE-ish regex tokens.
  // ========================================================================
  def tokenCount(s: SparkSession, d: String): DataFrame =
    docs(s, d).select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_ws"),
        size(TextOps.regexTokens(col("text"))).cast("long").as("n_re"))
      .orderBy(col("doc_id"))

  private val tokenCountSql =
    """SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_ws,
      |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_re
      |FROM documents ORDER BY doc_id""".stripMargin

  // ========================================================================
  // doc_fingerprint — canonicalize (lower, strip non-alnum, collapse ws)
  // then md5: the exact-dedup key.
  // ========================================================================
  def docFingerprint(s: SparkSession, d: String): DataFrame =
    docs(s, d).select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))

  private val docFingerprintSql =
    """SELECT doc_id,
      |  md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fp
      |FROM documents ORDER BY doc_id""".stripMargin

  // ========================================================================
  // text_quality — composite score: length term + stopword term +
  // lexical-diversity term. Computed in EXACT integer arithmetic scaled
  // by 1000n (score = (5·n·min(n,100) + 300·(n−n_stop) + 200·n_dist)
  // / (1000n)) then ONE identical double division, unrounded: the score
  // is a small-denominator rational that frequently sits exactly on
  // rounding half-boundaries (e.g. 0.48625 for n=16), where Spark's and
  // DuckDB's round() disagree.
  // ========================================================================
  def textQuality(s: SparkSession, d: String): DataFrame =
    docs(s, d).select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n"),
        TextOps.wordSetCount(col("toks"), enStop).cast("long").as("n_stop"),
        size(array_distinct(col("toks"))).cast("long").as("n_dist"))
      .select(col("doc_id"),
        ((lit(5L) * col("n") * least(col("n"), lit(100L))
          + lit(300L) * (col("n") - col("n_stop"))
          + lit(200L) * col("n_dist"))
          / (lit(1000.0) * col("n"))).as("score"))
      .orderBy(col("doc_id"))

  private val textQualitySql =
    """SELECT doc_id,
      |  (5 * n * least(n, 100) + 300 * (n - n_stop) + 200 * n_dist)
      |    / (1000.0 * n) AS score
      |FROM (
      |  SELECT doc_id,
      |    CAST(len(toks) AS BIGINT) AS n,
      |    CAST(len(list_filter(toks, t -> t IN ('the','and','of','is','a'))) AS BIGINT) AS n_stop,
      |    CAST(len(list_distinct(toks)) AS BIGINT) AS n_dist
      |  FROM (SELECT doc_id, regexp_extract_all(text, '\S+') AS toks FROM documents))
      |ORDER BY doc_id""".stripMargin

  // ========================================================================
  // term_freq — corpus term frequencies with document frequency: explode
  // tokens → two hash aggregations (map-side combined), top-k by count.
  // The scalable tf/df primitive for vocabulary building and IDF.
  // ========================================================================
  def termFreq(s: SparkSession, d: String): DataFrame =
    docs(s, d).select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
      .orderBy(col("tf").desc, col("term"))
      .limit(20)

  private val termFreqSql =
    """SELECT term, count(*) AS tf, count(DISTINCT doc_id) AS df
      |FROM (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS term FROM documents)
      |GROUP BY term ORDER BY tf DESC, term LIMIT 20""".stripMargin

  val queries: Map[String, Q] = Map(
    "term_freq" -> (termFreq _),
    "text_stats" -> (textStats _),
    "lang_id" -> (langId _),
    "token_count" -> (tokenCount _),
    "doc_fingerprint" -> (docFingerprint _),
    "text_quality" -> (textQuality _),
  )

  val oracleSql: Map[String, String] = Map(
    "term_freq" -> termFreqSql,
    "text_stats" -> textStatsSql,
    "lang_id" -> langIdSql,
    "token_count" -> tokenCountSql,
    "doc_fingerprint" -> docFingerprintSql,
    "text_quality" -> textQualitySql,
  )
}
