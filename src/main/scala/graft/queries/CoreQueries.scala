package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.functions.{Cyclical, TimeFns}
import graft.operators.{FeatureSpace, Fill, Quality, Resample, WindowOps}

/** Query implementations + DuckDB oracles, kept together per query so the
  * column-name/ordering contract stays in sync.
  */
object CoreQueries {
  private type Q = (SparkSession, String) => DataFrame

  // --- tiny helpers -------------------------------------------------------
  private def ev(s: SparkSession, d: String) = Tables.events(s, d)
  private def li(s: SparkSession, d: String) = Tables.lineitem(s, d)
  private val epochUs: Column = TimeFns.epochMicros(col("ts"))
  private val epochS: Column = TimeFns.epochSeconds(col("ts"))
  /** Exact cross-engine monetary sum: decimal-sum cast back to double. */
  private def dsum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  /** Exact mean of a 2-decimal column, UNROUNDED: sum the integer cents
    * (exact) and do ONE identical double division in both engines — the
    * result double is bit-identical, so no rounding is needed. Rounding
    * is actively harmful here: means over small groups are
    * small-denominator rationals that frequently sit EXACTLY on a
    * rounding half-boundary (e.g. 30.94375), where Spark (BigDecimal
    * half-up on the shortest decimal string) and DuckDB (multiply +
    * nearbyint) disagree.
    */
  private[queries] def exactMeanCents(c: Column): Column =
    sum(round(c * 100).cast("long")) / (count(c) * lit(100.0))

  /** DuckDB twin of [[exactMeanCents]] — interpolate into oracle SQL so
    * the formula exists once per engine.
    */
  private[queries] def exactMeanCentsSql(col: String): String =
    s"CAST(sum(CAST(round($col * 100) AS BIGINT)) AS DOUBLE) / (count($col) * 100.0)"

  // ========================================================================
  // §2.4 q1_agg — flagship grouped aggregate over lineitem (scan → hash agg
  // with map-side partial agg; at 100 TB this is one shuffle on two
  // low-cardinality keys — optimal).
  // ========================================================================
  def q1Agg(s: SparkSession, d: String): DataFrame =
    li(s, d).groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 4).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"),
        exactMeanCents(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  private val q1Sql =
    s"""SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 4) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |  ${exactMeanCentsSql("l_discount")} AS avg_disc,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ========================================================================
  // §2.1 scan_profile — row/null audit (investigate_csv_file re-expressed):
  // single agg pass, O(columns) output.
  // ========================================================================
  def scanProfile(s: SparkSession, d: String): DataFrame = {
    val cols = Seq("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate")
    Quality.nullProfile(li(s, d), cols).orderBy(col("column_name"))
  }

  private val scanProfileSql =
    """SELECT column_name, n_rows, n_null FROM (
      |  SELECT 'l_orderkey' AS column_name, count(*) AS n_rows,
      |         CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null FROM lineitem
      |  UNION ALL
      |  SELECT 'l_quantity', count(*),
      |         CAST(sum(CASE WHEN l_quantity IS NULL OR isnan(l_quantity) THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
      |  UNION ALL
      |  SELECT 'l_returnflag', count(*),
      |         CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
      |  UNION ALL
      |  SELECT 'l_shipdate', count(*),
      |         CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
      |) ORDER BY column_name""".stripMargin

  // ========================================================================
  // §2.1 scan_select_limit — projection + limit pushdown (csv_to_csvdataset
  // select_columns/take). Ordered before limit for determinism.
  // ========================================================================
  def scanSelectLimit(s: SparkSession, d: String): DataFrame =
    li(s, d).select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic data
      // (118k dup pairs at sf0.1) — order by every output column
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .limit(100)

  private val scanSelectLimitSql =
    """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
      |ORDER BY l_orderkey, l_linenumber, l_quantity LIMIT 100""".stripMargin

  // ========================================================================
  // §2.2 project / drop_columns / filter_eq
  // ========================================================================
  def project(s: SparkSession, d: String): DataFrame =
    ev(s, d).select(col("event_id"), col("user_id"), col("event_type"))
      .orderBy(col("event_id"))

  private val projectSql =
    "SELECT event_id, user_id, event_type FROM events ORDER BY event_id"

  def dropColumns(s: SparkSession, d: String): DataFrame =
    ev(s, d).drop("props", "ts").orderBy(col("event_id"))

  private val dropColumnsSql =
    "SELECT event_id, user_id, event_type, value FROM events ORDER BY event_id"

  def filterEq(s: SparkSession, d: String): DataFrame =
    ev(s, d).filter(col("event_type") === lit("purchase"))
      .select(col("event_id"), col("user_id"), col("value"))
      .orderBy(col("event_id"))

  private val filterEqSql =
    """SELECT event_id, user_id, value FROM events
      |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin

  // ========================================================================
  // §2.7 dt_concat / dt_to_epoch — datetime derivation without UDFs.
  // ========================================================================
  def dtConcat(s: SparkSession, d: String): DataFrame =
    ev(s, d).select(
      col("event_id"),
      date_format(col("ts"), "yyyy-MM-dd").as("date_block"),
      date_format(col("ts"), "HH:mm:ss").as("time_block"))
      .withColumn("datetimestamp", TimeFns.dtConcat(col("date_block"), col("time_block")))
      .orderBy(col("event_id"))

  private val dtConcatSql =
    """SELECT event_id,
      |  strftime(ts, '%Y-%m-%d') AS date_block,
      |  strftime(ts, '%H:%M:%S') AS time_block,
      |  strftime(ts, '%Y-%m-%d') || ' ' || strftime(ts, '%H:%M:%S') AS datetimestamp
      |FROM events ORDER BY event_id""".stripMargin

  def dtToEpoch(s: SparkSession, d: String): DataFrame =
    ev(s, d).select(
      col("event_id"),
      epochUs.as("epoch_us"),
      epochS.as("epoch_s"))
      .orderBy(col("event_id"))

  private val dtToEpochSql =
    """SELECT event_id, epoch_us(ts) AS epoch_us,
      |  CAST(floor(epoch_us(ts) / 1000000) AS BIGINT) AS epoch_s
      |FROM events ORDER BY event_id""".stripMargin

  // ========================================================================
  // §2.5 lag_interval — adjacent-row timestamp delta, partitioned by the
  // series key (user_id) so it parallelizes; exact bigint µs arithmetic.
  // ========================================================================
  def lagInterval(s: SparkSession, d: String): DataFrame =
    ev(s, d).select(col("event_id"), col("user_id"), epochUs.as("e_us"))
      .withColumn("interval_us",
        WindowOps.lagInterval(col("e_us"), Seq("user_id"), Seq("e_us", "event_id")))
      .select(col("event_id"), col("user_id"), col("interval_us"))
      .orderBy(col("event_id"))

  private val lagIntervalSql =
    """SELECT event_id, user_id,
      |  lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
      |    - epoch_us(ts) AS interval_us
      |FROM events ORDER BY event_id""".stripMargin

  // ========================================================================
  // §2.5 resample_down_filter — alignment filter (ts % interval == 0);
  // pushdown-friendly, no shuffle.
  // ========================================================================
  def resampleDownFilter(s: SparkSession, d: String): DataFrame =
    Resample.downsampleFilter(ev(s, d), "ts", 60L)
      .select(col("event_id"), epochS.as("epoch_s"))
      .orderBy(col("event_id"))

  private val resampleDownFilterSql =
    """SELECT event_id, CAST(floor(epoch_us(ts) / 1000000) AS BIGINT) AS epoch_s
      |FROM events
      |WHERE CAST(floor(epoch_us(ts) / 1000000) AS BIGINT) % 60 = 0
      |ORDER BY event_id""".stripMargin

  // ========================================================================
  // §2.4 agg_mean_var — adapt statistics in one pass (normalizer adapt).
  // ========================================================================
  def aggMeanVar(s: SparkSession, d: String): DataFrame =
    ev(s, d).agg(
      count(lit(1)).as("n"),
      exactMeanCents(col("value")).as("mean_value"),
      round(var_pop(col("value")), 4).as("var_pop_value"),
      round(stddev_pop(col("value")), 4).as("stddev_pop_value"),
      min(col("value")).as("min_value"),
      max(col("value")).as("max_value"))

  private val aggMeanVarSql =
    s"""SELECT count(*) AS n,
      |  ${exactMeanCentsSql("value")} AS mean_value,
      |  round(var_pop(value), 4) AS var_pop_value,
      |  round(stddev_pop(value), 4) AS stddev_pop_value,
      |  min(value) AS min_value,
      |  max(value) AS max_value
      |FROM events""".stripMargin

  // ========================================================================
  // §2.5 agg_time_bucket_mean — time-bucket grouped mean (pandas resample
  // .mean()); one hash-agg shuffle on the bucket key.
  // ========================================================================
  def aggTimeBucketMean(s: SparkSession, d: String): DataFrame =
    ev(s, d).groupBy(TimeFns.timeBucket(col("ts"), 300L).as("bucket_s"))
      .agg(exactMeanCents(col("value")).as("avg_value"), count(lit(1)).as("n"))
      .orderBy(col("bucket_s"))

  private val aggTimeBucketMeanSql =
    s"""SELECT CAST(floor(epoch_us(ts) / 300000000) * 300 AS BIGINT) AS bucket_s,
      |  ${exactMeanCentsSql("value")} AS avg_value,
      |  count(*) AS n
      |FROM events GROUP BY 1 ORDER BY bucket_s""".stripMargin

  // ========================================================================
  // §2.4 agg_time_span — max(ts)−min(ts) plus convert_seconds breakdown.
  // ========================================================================
  def aggTimeSpan(s: SparkSession, d: String): DataFrame = {
    val span = (max(epochUs) - min(epochUs)).as("span_us")
    val base = ev(s, d).agg(span)
    val spanS = (col("span_us") / lit(1000000L)).cast("long")
    val (dd, mm, ss) = TimeFns.convertSeconds(spanS)
    base.select(col("span_us"), spanS.as("span_s"),
      dd.cast("long").as("days"), mm.cast("long").as("minutes"), ss.cast("long").as("seconds"))
  }

  private val aggTimeSpanSql =
    """SELECT span_us,
      |  CAST(floor(span_us / 1000000) AS BIGINT) AS span_s,
      |  CAST(floor(CAST(floor(span_us / 1000000) AS BIGINT) / 86400) AS BIGINT) AS days,
      |  CAST(floor((CAST(floor(span_us / 1000000) AS BIGINT) % 86400) / 60) AS BIGINT) AS minutes,
      |  CAST(floor(span_us / 1000000) AS BIGINT) % 60 AS seconds
      |FROM (SELECT max(epoch_us(ts)) - min(epoch_us(ts)) AS span_us FROM events)""".stripMargin

  // ========================================================================
  // §2.4 agg_all_equal / distinct_vocab
  // ========================================================================
  def aggAllEqual(s: SparkSession, d: String): DataFrame =
    ev(s, d).groupBy(col("event_type"))
      .agg(Quality.allEqual(col("user_id")).as("all_user_equal"),
           countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("event_type"))

  private val aggAllEqualSql =
    """SELECT event_type, min(user_id) = max(user_id) AS all_user_equal,
      |  count(DISTINCT user_id) AS n_users
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  def distinctVocab(s: SparkSession, d: String): DataFrame =
    ev(s, d).select(col("event_type")).distinct().orderBy(col("event_type"))

  private val distinctVocabSql =
    "SELECT DISTINCT event_type FROM events ORDER BY event_type"

  // ========================================================================
  // §2.7 normalize_apply — (x−mean)/σ_pop with stats from a broadcastable
  // single-row aggregate (no single-partition window at scale).
  // ========================================================================
  def normalizeApply(s: SparkSession, d: String): DataFrame = {
    val e = ev(s, d)
    val stats = e.agg(avg(col("value")).as("m"), stddev_pop(col("value")).as("sd"))
    e.crossJoin(broadcast(stats))
      .select(col("event_id"),
        round((col("value") - col("m")) / col("sd"), 4).as("value_norm"))
      .orderBy(col("event_id"))
  }

  private val normalizeApplySql =
    """SELECT event_id, round((value - m) / sd, 4) AS value_norm
      |FROM events CROSS JOIN
      |  (SELECT avg(value) AS m, stddev_pop(value) AS sd FROM events)
      |ORDER BY event_id""".stripMargin

  // ========================================================================
  // §2.4 extension: agg_percentile — exact continuous quantiles (median,
  // p90) per group. Spark `percentile` and DuckDB `quantile_cont` share
  // the linear-interpolation definition; computed on identical sorted
  // inputs, rounded 4.
  // ========================================================================
  def aggPercentile(s: SparkSession, d: String): DataFrame =
    ev(s, d).groupBy(col("event_type"))
      .agg(round(percentile(col("value"), lit(0.5)), 4).as("p50"),
        round(percentile(col("value"), lit(0.9)), 4).as("p90"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  private val aggPercentileSql =
    """SELECT event_type,
      |  round(quantile_cont(value, 0.5), 4) AS p50,
      |  round(quantile_cont(value, 0.9), 4) AS p90,
      |  count(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ========================================================================
  // §2.4 extension: agg_corr — per-group Pearson correlation and
  // population covariance (order-dependent sums → round 4).
  // ========================================================================
  def aggCorr(s: SparkSession, d: String): DataFrame =
    li(s, d).groupBy(col("l_returnflag"))
      .agg(round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"),
        round(covar_pop(col("l_quantity"), col("l_discount")), 4).as("covar_qty_disc"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  private val aggCorrSql =
    """SELECT l_returnflag,
      |  round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
      |  round(covar_pop(l_quantity, l_discount), 4) AS covar_qty_disc,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ========================================================================
  // §2.1 fault_inject — the reference's add_errors corruptor
  // (pandas_utilities.py:50-52): one cell at order position 1 → 1e7, one
  // column renamed (va → Va analog). The corrupted frame is what the
  // Quality checks are proven against in QualitySpec.
  // ========================================================================
  def faultInject(s: SparkSession, d: String): DataFrame =
    graft.operators.Quality.addErrors(
        ev(s, d).select(col("event_id"), col("value"), col("event_type")),
        Seq("event_id"), "value", rowPos = 1, magnitude = 1e7,
        renameFrom = "event_type", renameTo = "EventType")
      .orderBy(col("event_id"))

  private val faultInjectSql =
    """WITH r AS (
      |  SELECT event_id, value, event_type,
      |    row_number() OVER (ORDER BY event_id) AS rn
      |  FROM events)
      |SELECT event_id,
      |  CASE WHEN rn = 2 THEN 1e7 ELSE value END AS value,
      |  event_type AS "EventType"
      |FROM r ORDER BY event_id""".stripMargin

  // ========================================================================
  // registry
  // ========================================================================
  // ========================================================================
  // agg_salted — skew-proof two-stage aggregation: partial states on
  // (key, salt) spread each hot key over 16 reducers before the per-key
  // merge. event_type has 5 values over the whole corpus — the worst-case
  // skew shape, where a single-stage shuffle sends ~N/5 rows to one
  // reducer and AQE cannot help (it splits skewed JOINS, not aggs). The
  // aggregated measures are exact integers (count + id sum), so the
  // two-stage regrouping is bit-identical to the oracle's plain GROUP BY.
  // ========================================================================
  def aggSalted(s: SparkSession, d: String): DataFrame =
    graft.operators.Scale.saltedAgg(
        ev(s, d).select(col("event_type"), col("event_id")),
        Seq("event_type"), saltBuckets = 16,
        partials = Seq(count(lit(1)).as("n"), sum(col("event_id")).as("sid")),
        merged = Seq(sum(col("n")).as("n_events"), sum(col("sid")).as("sum_id")))
      .orderBy(col("event_type"))

  private val aggSaltedSql =
    """SELECT event_type, count(*) AS n_events,
      |  CAST(sum(event_id) AS BIGINT) AS sum_id
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ========================================================================
  // sample_stratified — deterministic per-stratum quota sampling (the
  // "rebalance the language mix" stage of a training-data pipeline): a
  // doc survives iff hash60(doc_id) mod 100 < its language's keep
  // percentage. Content-addressed, so the sample is reproducible across
  // engines/partitionings and extends incrementally; the rates table is
  // broadcast and the filter is one codegen'd scan-side pass.
  // ========================================================================
  def sampleStratified(s: SparkSession, d: String): DataFrame =
    graft.operators.Sampling.stratified(Tables.documents(s, d),
        strataCol = "lang", idCol = "doc_id",
        rates = Map("en" -> 10, "zh" -> 50), defaultPct = 25)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))

  private val sampleStratifiedSql =
    """SELECT doc_id, lang, source, n_chars FROM documents
      |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 <
      |  CASE lang WHEN 'en' THEN 10 WHEN 'zh' THEN 50 ELSE 25 END
      |ORDER BY doc_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "q1_agg" -> (q1Agg _),
    "agg_salted" -> (aggSalted _),
    "sample_stratified" -> (sampleStratified _),
    "scan_profile" -> (scanProfile _),
    "scan_select_limit" -> (scanSelectLimit _),
    "project" -> (project _),
    "drop_columns" -> (dropColumns _),
    "filter_eq" -> (filterEq _),
    "dt_concat" -> (dtConcat _),
    "dt_to_epoch" -> (dtToEpoch _),
    "lag_interval" -> (lagInterval _),
    "resample_down_filter" -> (resampleDownFilter _),
    "agg_mean_var" -> (aggMeanVar _),
    "agg_time_bucket_mean" -> (aggTimeBucketMean _),
    "agg_time_span" -> (aggTimeSpan _),
    "agg_all_equal" -> (aggAllEqual _),
    "distinct_vocab" -> (distinctVocab _),
    "normalize_apply" -> (normalizeApply _),
    "agg_percentile" -> (aggPercentile _),
    "agg_corr" -> (aggCorr _),
    "fault_inject" -> (faultInject _),
  )

  val oracleSql: Map[String, String] = Map(
    "q1_agg" -> q1Sql,
    "agg_salted" -> aggSaltedSql,
    "sample_stratified" -> sampleStratifiedSql,
    "scan_profile" -> scanProfileSql,
    "scan_select_limit" -> scanSelectLimitSql,
    "project" -> projectSql,
    "drop_columns" -> dropColumnsSql,
    "filter_eq" -> filterEqSql,
    "dt_concat" -> dtConcatSql,
    "dt_to_epoch" -> dtToEpochSql,
    "lag_interval" -> lagIntervalSql,
    "resample_down_filter" -> resampleDownFilterSql,
    "agg_mean_var" -> aggMeanVarSql,
    "agg_time_bucket_mean" -> aggTimeBucketMeanSql,
    "agg_time_span" -> aggTimeSpanSql,
    "agg_all_equal" -> aggAllEqualSql,
    "distinct_vocab" -> distinctVocabSql,
    "normalize_apply" -> normalizeApplySql,
    "agg_percentile" -> aggPercentileSql,
    "agg_corr" -> aggCorrSql,
    "fault_inject" -> faultInjectSql,
  )
}
