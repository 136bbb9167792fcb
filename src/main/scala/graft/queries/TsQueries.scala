package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{ExactRound, TimeFns}
import graft.operators.TimeSeries
import graft.sources.Tables

/** Time-series analytics family: EWMA smoothing, rolling z-score anomaly
  * flags, lag-1 autocorrelation, and a key-skew report. The analytics a
  * sensor-data pipeline (the reference's power-meter domain) runs as QA
  * before windowing a channel into training sets — reference analogues:
  * the interval audit (preprocess_utilities.py get_interval) judges
  * sampling health, these judge VALUE health.
  *
  * Scale shape shared by the first three: ONE shuffle on the series key
  * (`user_id`), then sorted window work per partition; same-spec window
  * expressions fuse into a single Window exec (plan-guarded in
  * TimeSeriesSpec). skew_report is a two-level agg: per-key counts shuffle
  * on the key, the tiny key-count relation then aggregates to one row of
  * corpus stats joined back broadcast-style.
  */
object TsQueries {
  private type Q = (SparkSession, String) => DataFrame
  private def ev(s: SparkSession, d: String) = Tables.events(s, d)

  /** events + exact µs epoch: the ordered input shape (same as
    * WindowQueries.evE — deterministic (e_us, event_id) total order per
    * series).
    */
  private def evE(s: SparkSession, d: String) =
    ev(s, d).select(col("event_id"), col("user_id"), col("value"),
      TimeFns.epochMicros(col("ts")).as("e_us"))

  private val w = Window.partitionBy(col("user_id")).orderBy(col("e_us"), col("event_id"))
  private val overSql = "(PARTITION BY user_id ORDER BY epoch_us(ts), event_id)"

  private val EwmaLookback = 8
  private val EwmaDecay = 0.7

  // ========================================================================
  // ts_ewma — bounded-lookback EWMA smoothing per series. Spark side and
  // oracle SQL are generated from the same loop (TimeSeries.ewmaBounded /
  // ewmaBoundedSql) so term order and weight literals are bit-identical.
  // ========================================================================
  def tsEwma(s: SparkSession, d: String): DataFrame =
    evE(s, d)
      .select(col("event_id"), col("user_id"),
        round(TimeSeries.ewmaBounded(col("value"), w, EwmaLookback, EwmaDecay), 4).as("ewma"))
      .orderBy(col("event_id"))

  private val tsEwmaSql =
    s"""SELECT event_id, user_id,
       |  round(${TimeSeries.ewmaBoundedSql("value", overSql, EwmaLookback, EwmaDecay)}, 4) AS ewma
       |FROM events
       |ORDER BY event_id""".stripMargin

  // ========================================================================
  // ts_zscore_anomaly — rolling z-score against the trailing 20 readings
  // (current row excluded), anomaly flag from the ROUNDED z so the flag
  // can only differ between engines if the z column itself differs.
  // ========================================================================
  private val ZLookback = 20
  private val ZMinN = 8

  def tsZscoreAnomaly(s: SparkSession, d: String): DataFrame = {
    val z = round(TimeSeries.rollingZScore(col("value"), w, ZLookback, ZMinN), 4)
    evE(s, d)
      .select(col("event_id"), col("user_id"), z.as("z"))
      .withColumn("is_anomaly",
        when(col("z").isNotNull && abs(col("z")) > 3.0, 1L).otherwise(0L))
      .orderBy(col("event_id"))
  }

  private val tsZscoreAnomalySql =
    s"""WITH r AS (
       |  SELECT event_id, user_id, value,
       |    avg(value) OVER fr AS mu,
       |    stddev_samp(value) OVER fr AS sd,
       |    count(value) OVER fr AS n
       |  FROM events
       |  WINDOW fr AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
       |                ROWS BETWEEN $ZLookback PRECEDING AND 1 PRECEDING))
       |SELECT event_id, user_id,
       |  round(CASE WHEN n >= $ZMinN AND sd > 1e-9 THEN (value - mu) / sd END, 4) AS z,
       |  CAST(CASE WHEN n >= $ZMinN AND sd > 1e-9
       |              AND abs(round((value - mu) / sd, 4)) > 3.0
       |       THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
       |FROM r
       |ORDER BY event_id""".stripMargin

  // ========================================================================
  // ts_autocorr — lag-1 Pearson autocorrelation per series: one window
  // pass for the lag, one grouped agg on the same key (the lag's shuffle
  // partitioning is reused by the groupBy — no second exchange,
  // plan-guarded in TimeSeriesSpec).
  // ========================================================================
  def tsAutocorr(s: SparkSession, d: String): DataFrame =
    evE(s, d)
      .withColumn("v_lag", TimeSeries.lagged(col("value"), w, 1))
      .groupBy(col("user_id"))
      .agg(round(corr(col("value"), col("v_lag")), 4).as("autocorr_1"),
        count(col("v_lag")).as("n_pairs"))
      .orderBy(col("user_id"))

  private val tsAutocorrSql =
    """WITH r AS (
      |  SELECT user_id, value,
      |    lag(value, 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS v_lag
      |  FROM events)
      |SELECT user_id, round(corr(value, v_lag), 4) AS autocorr_1,
      |  count(v_lag) AS n_pairs
      |FROM r GROUP BY user_id ORDER BY user_id""".stripMargin

  // ========================================================================
  // skew_report — per-key distribution audit for shuffle planning: the
  // top-5 hottest keys with their share of rows and skew ratio
  // (count / mean-count). THE diagnostic a 100 TB job runs before picking
  // salting/AQE strategy for a join or agg on that key — agg_salted /
  // join_salted are the mitigations this report justifies. Exact integer
  // counts; one shuffle on the key; the key-count relation (≤ #keys rows)
  // is tiny, so the global stats cross-join is a broadcast of one row.
  // ========================================================================
  def skewReport(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.lineitem(s, d).groupBy(col("l_suppkey")).agg(count(lit(1)).as("cnt"))
    val stats = counts.agg(sum(col("cnt")).as("total"),
      count(lit(1)).as("n_keys"))
    counts.crossJoin(broadcast(stats))
      .select(col("l_suppkey"), col("cnt"),
        // ExactRound: round(cnt·100/total, 6) and round(cnt·n_keys/total, 4)
        // as pure-integer half-away divisions — counts are exact, so both
        // ratios can land on representable .5 halves (power-of-two totals)
        // where engines' double round() semantics diverge. Headroom:
        // cnt·2·10⁸ — fine to ~4·10¹⁰ rows per key; widen to DECIMAL at
        // full 100 TB key cardinalities.
        (expr(ExactRound.spark("cnt * 100000000", "total")).cast("double")
          / lit(1000000.0)).as("share_pct"),
        (expr(ExactRound.spark("cnt * n_keys * 10000", "total")).cast("double")
          / lit(10000.0)).as("skew_ratio"))
      .orderBy(col("cnt").desc, col("l_suppkey"))
      .limit(5)
  }

  private val skewReportSql =
    s"""WITH c AS (SELECT l_suppkey, count(*) AS cnt FROM lineitem GROUP BY l_suppkey),
      |s AS (SELECT sum(cnt) AS total, count(*) AS n_keys FROM c)
      |SELECT l_suppkey, cnt,
      |  CAST(${ExactRound.duck("cnt * 100000000", "total")} AS DOUBLE) / 1000000.0 AS share_pct,
      |  CAST(${ExactRound.duck("cnt * n_keys * 10000", "total")} AS DOUBLE) / 10000.0 AS skew_ratio
      |FROM c, s
      |ORDER BY cnt DESC, l_suppkey
      |LIMIT 5""".stripMargin

  // ========================================================================
  // ts_changepoint — CUSUM mean-shift detection per series (Page 1954):
  // the changepoint estimate is the reading where the cumulative sum of
  // deviations from the series mean attains its maximum magnitude —
  // argmax_i |Σ_{j≤i}(x_j − x̄)| — the classic offline single-changepoint
  // localizer. The QA step that answers "did this sensor's level shift,
  // and when?" before a series is windowed into training sets.
  //
  // Exactness design (why this verifies hash-identical cross-engine):
  // values enter as micro-units v_u = CAST(value AS DECIMAL(18,6))·10⁶
  // in BIGINT, so running sums, series totals, and the scaled deviation
  // dev_i = n·run_i − i·total (≡ n·10⁶·cusum_i) are EXACT integers —
  // no double is ever summed across rows, the argmax ordering is pure
  // integer comparison, and only the one reported cusum value performs
  // float division (identical single-op IEEE both engines; round(6) is
  // belt-and-braces). Headroom: |dev| ≤ n²·max|x|·10⁶ — for series up
  // to ~10⁵ readings at |x| ≤ 10³ this stays under 2⁶³; beyond that,
  // widen v_u to DECIMAL.
  //
  // Scale shape: ONE shuffle on the series key; the running sum, row
  // index, series total, and count are four window expressions over the
  // same (key, time) ordering (same-spec windows fuse); the argmax is a
  // row_number over the same partitioning — no second exchange.
  // ========================================================================
  def tsChangepoint(s: SparkSession, d: String): DataFrame = {
    val wAll = Window.partitionBy(col("user_id"))
    val sel = Window.partitionBy(col("user_id"))
      .orderBy(abs(col("dev")).desc, col("i"))
    evE(s, d)
      .withColumn("v_u",
        (col("value").cast("decimal(18,6)") * lit(1000000)).cast("long"))
      .withColumn("run", sum(col("v_u")).over(w))
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("total", sum(col("v_u")).over(wAll))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("dev", col("n") * col("run") - col("i") * col("total"))
      .withColumn("rn", row_number().over(sel)).filter(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("cp_event_id"), col("n"),
        // ExactRound: round(dev/(10⁶·n), 6) ≡ halfAway(dev, n)/10⁶ (the
        // 10⁶ scale cancels) — dev/n can sit exactly on a .5 half (n a
        // power of two), where engine double-round semantics diverge.
        // Signed: dev is a deviation. Headroom 2·|dev| — half the
        // scaladoc bound, still ≥10⁴-reading series at |x| ≤ 10³.
        (expr(ExactRound.spark("dev", "n")).cast("double")
          / lit(1000000.0)).as("cusum"))
      .orderBy(col("user_id"))
  }

  private val tsChangepointSql =
    s"""WITH r AS (
      |  SELECT user_id, event_id,
      |    sum(v_u) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS run,
      |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS BIGINT) AS i,
      |    sum(v_u) OVER (PARTITION BY user_id) AS total,
      |    count(*) OVER (PARTITION BY user_id) AS n
      |  FROM (SELECT *, CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v_u
      |        FROM events)),
      |d AS (SELECT user_id, event_id, n, i, n * run - i * total AS dev FROM r)
      |SELECT user_id, event_id AS cp_event_id, n,
      |  CAST(${ExactRound.duck("dev", "n")} AS DOUBLE) / 1000000.0 AS cusum
      |FROM d
      |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY abs(dev) DESC, i) = 1
      |ORDER BY user_id""".stripMargin

  // ========================================================================
  // ts_rolling_median — trailing-window rolling median per series: the
  // ROBUST smoother complementing ts_ewma (a single spike drags an
  // exponential mean for its whole lookback but never moves the
  // median), and the standard pre-filter before spike detection on
  // sensor channels. Window = current + 8 trailing readings; short
  // prefixes use the available rows with the LOWER median for even
  // counts (type-1, an actual data value — exact element selection, no
  // interpolated arithmetic to match cross-engine, the quantile_bucket
  // discrete-quantile convention).
  //
  // Scale shape: ONE shuffle on the series key (the family's shared
  // window partitioning); the collected window is BOUNDED (≤ 9
  // elements) so the per-row sort is O(1) — never a corpus-sized
  // structure.
  // ========================================================================
  private val MedianLookback = 8

  def tsRollingMedian(s: SparkSession, d: String): DataFrame = {
    val wm = w.rowsBetween(-MedianLookback, 0)
    evE(s, d).filter(col("value").isNotNull)
      .select(col("event_id"), col("user_id"),
        sort_array(collect_list(col("value")).over(wm)).as("win"))
      .select(col("event_id"), col("user_id"),
        element_at(col("win"), ((size(col("win")) + 1) / 2).cast("int")).as("median"))
      .orderBy(col("event_id"))
  }

  private val tsRollingMedianSql =
    s"""WITH r AS (
       |  SELECT event_id, user_id,
       |    list_sort(list(value) OVER (PARTITION BY user_id
       |      ORDER BY epoch_us(ts), event_id
       |      ROWS BETWEEN $MedianLookback PRECEDING AND CURRENT ROW)) AS win
       |  FROM events WHERE value IS NOT NULL)
       |SELECT event_id, user_id, win[CAST((len(win) + 1) // 2 AS INTEGER)] AS median
       |FROM r
       |ORDER BY event_id""".stripMargin

  // ========================================================================
  // ts_seasonal — hour-of-day seasonal profile per event_type: for each
  // (type, hour-of-day) cell the reading count, mean level, and the
  // seasonal component (cell mean − type-wide mean). The classical
  // periodic-baseline step of an additive decomposition (x = trend +
  // seasonal + residual): subtracting this profile from a series is
  // what deseasonalizes it before anomaly scoring (ts_zscore_anomaly
  // flags level outliers; WITH a diurnal cycle present those are
  // dominated by time-of-day unless this baseline is removed first).
  //
  // Exactness: values enter as the same DECIMAL(18,6) micro-units as
  // ts_changepoint, so cell sums and type totals are exact integers;
  // each mean is ONE double division of exact operands and the seasonal
  // component one subtraction — identical IEEE ops both engines;
  // round(6) is belt-and-braces. Hour-of-day is pure integer epoch
  // arithmetic (floor(µs/3.6e9) mod 24 — never the session-zone
  // `hour()`, which would tie the result to a timezone).
  //
  // Scale shape: ONE map-side-combined hash agg on (type, hour) — the
  // corpus never shuffles more than the ≤ |types|·24-row profile; the
  // type-total window runs over that tiny relation, not the corpus.
  // ========================================================================
  def tsSeasonal(s: SparkSession, d: String): DataFrame = {
    val wt = Window.partitionBy(col("event_type"))
    ev(s, d)
      .groupBy(col("event_type"),
        pmod(floor(TimeFns.epochMicros(col("ts")) / lit(3600000000L)).cast("long"),
          lit(24L)).as("hour"))
      .agg(sum((col("value").cast("decimal(18,6)") * lit(1000000)).cast("long")).as("cell_u"),
        count(lit(1)).as("n"))
      .withColumn("type_u", sum(col("cell_u")).over(wt))
      .withColumn("type_n", sum(col("n")).over(wt))
      // ExactRound: both means quantize to exact-integer micro-units via
      // halfAway(sum_u, n) — round-THEN-subtract for `seasonal` (instead
      // of rounding the difference) so each term stays a bounded integer
      // rational with no cross-term product that could overflow BIGINT;
      // both engines compute the identical integers, then one exact /10⁶.
      .select(col("event_type"), col("hour"), col("n"),
        (expr(ExactRound.spark("cell_u", "n")).cast("double")
          / lit(1000000.0)).as("hour_mean"),
        ((expr(ExactRound.spark("cell_u", "n"))
          - expr(ExactRound.spark("type_u", "type_n"))).cast("double")
          / lit(1000000.0)).as("seasonal"))
      .orderBy(col("event_type"), col("hour"))
  }

  private val tsSeasonalSql =
    s"""WITH h AS (
      |  SELECT event_type,
      |    CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) % 24 AS hour,
      |    sum(CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS cell_u,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |w AS (
      |  SELECT event_type, hour, n, cell_u,
      |    sum(cell_u) OVER (PARTITION BY event_type) AS type_u,
      |    sum(n) OVER (PARTITION BY event_type) AS type_n
      |  FROM h)
      |SELECT event_type, hour, n,
      |  CAST(${ExactRound.duck("cell_u", "n")} AS DOUBLE) / 1000000.0 AS hour_mean,
      |  CAST(${ExactRound.duck("cell_u", "n")}
      |    - ${ExactRound.duck("type_u", "type_n")} AS DOUBLE) / 1000000.0 AS seasonal
      |FROM w
      |ORDER BY event_type, hour""".stripMargin

  // ========================================================================
  // ts_seasonal_adjust — the APPLY step of the decomposition ts_seasonal
  // profiles: every reading minus its (type, hour-of-day) baseline mean,
  // i.e. the deseasonalized residual. This is what anomaly scoring
  // should run on when a diurnal cycle is present — ts_zscore_anomaly
  // over raw values flags time-of-day, not faults. Exactness: the
  // residual is ONE exact integer expression, v_u·n − cell_u (value and
  // cell sum both in DECIMAL(18,6) micro-units), divided once — the
  // same order-free contract as ts_seasonal; round(6) belt-and-braces.
  //
  // Scale shape: the profile is the same tiny ≤|types|·24-row relation,
  // joined back BROADCAST onto the scan — the corpus never shuffles;
  // the only wide agg is the map-side-combined profile build.
  // ========================================================================
  /** The (type, hour) profile in micro-unit form (cell_u, n) — shared
    * by the batch apply below and the streaming
    * [[graft.streaming.StreamingResample.seasonalAdjust]] (which
    * broadcast-joins this naturally-static relation onto a stream).
    */
  private[graft] def seasonalProfileU(s: SparkSession, d: String): DataFrame = {
    val vU = (col("value").cast("decimal(18,6)") * lit(1000000)).cast("long")
    val hourCol = pmod(floor(TimeFns.epochMicros(col("ts")) / lit(3600000000L)).cast("long"),
      lit(24L))
    ev(s, d).select(col("event_type"), vU.as("v_u"), hourCol.as("hour"))
      .groupBy(col("event_type"), col("hour"))
      .agg(sum(col("v_u")).as("cell_u"), count(lit(1)).as("n"))
  }

  def tsSeasonalAdjust(s: SparkSession, d: String): DataFrame = {
    val vU = (col("value").cast("decimal(18,6)") * lit(1000000)).cast("long")
    val hourCol = pmod(floor(TimeFns.epochMicros(col("ts")) / lit(3600000000L)).cast("long"),
      lit(24L))
    val base = ev(s, d).select(col("event_id"), col("event_type"),
      vU.as("v_u"), hourCol.as("hour"))
    base.join(broadcast(seasonalProfileU(s, d)), Seq("event_type", "hour"))
      .select(col("event_id"), col("event_type"), col("hour"),
        // ExactRound: round((v_u·n − cell_u)/(10⁶·n), 6) ≡
        // halfAway(v_u·n − cell_u, n)/10⁶ — signed integer rational
        (expr(ExactRound.spark("v_u * n - cell_u", "n")).cast("double")
          / lit(1000000.0)).as("resid"))
      .orderBy(col("event_id"))
  }

  private val tsSeasonalAdjustSql =
    s"""WITH b AS (
      |  SELECT event_id, event_type,
      |    CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v_u,
      |    CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) % 24 AS hour
      |  FROM events),
      |p AS (
      |  SELECT event_type, hour, CAST(sum(v_u) AS BIGINT) AS cell_u, count(*) AS n
      |  FROM b GROUP BY 1, 2)
      |SELECT b.event_id, b.event_type, b.hour,
      |  CAST(${ExactRound.duck("b.v_u * p.n - p.cell_u", "p.n")} AS DOUBLE)
      |    / 1000000.0 AS resid
      |FROM b JOIN p USING (event_type, hour)
      |ORDER BY event_id""".stripMargin

  // ========================================================================
  // ts_acf_multi — the autocorrelation FUNCTION, lags 1..5 per series
  // (ts_autocorr is the lag-1 point): the sampling-health profile that
  // distinguishes white noise (all lags ≈ 0), a random walk (slow
  // decay), and periodic structure (peak at the period) — what an
  // analyst reads before choosing a window size for supervised
  // examples. Pearson corr(value, lag_k value) per (series, k), n_pairs
  // alongside; round(4) per the corr convention ts_autocorr set.
  //
  // Scale shape: the FIVE lag columns are same-spec window expressions
  // over ONE series-key exchange (they fuse into a single Window exec),
  // the five corr aggs ride ONE groupBy on the same key — no second
  // exchange — and the wide row unpivots to (series, lag) with a
  // stack projection, not a join.
  // ========================================================================
  private val AcfMaxLag = 5

  def tsAcfMulti(s: SparkSession, d: String): DataFrame = {
    val lagged = (1 to AcfMaxLag).foldLeft(evE(s, d)) { (df, k) =>
      df.withColumn(s"v_lag$k", lag(col("value"), k).over(w))
    }
    val aggs = (1 to AcfMaxLag).flatMap { k =>
      Seq(round(corr(col("value"), col(s"v_lag$k")), 4).as(s"acf$k"),
        count(col(s"v_lag$k")).as(s"n$k"))
    }
    val stacked = (1 to AcfMaxLag)
      .map(k => s"${k}L, acf$k, n$k").mkString(", ")
    lagged.groupBy(col("user_id")).agg(aggs.head, aggs.tail: _*)
      .select(col("user_id"),
        expr(s"stack($AcfMaxLag, $stacked) AS (lag, acf, n_pairs)"))
      .select(col("user_id"), col("lag"), col("acf"), col("n_pairs"))
      .orderBy(col("user_id"), col("lag"))
  }

  private val tsAcfMultiSql = {
    val lagCols = (1 to AcfMaxLag)
      .map(k => s"lag(value, $k) OVER $overSql AS v_lag$k").mkString(",\n      |    ")
    val branches = (1 to AcfMaxLag).map(k =>
      s"SELECT user_id, CAST($k AS BIGINT) AS lag, round(corr(value, v_lag$k), 4) AS acf, count(v_lag$k) AS n_pairs FROM r GROUP BY user_id")
      .mkString("\n      |  UNION ALL ")
    s"""WITH r AS (
      |  SELECT user_id, value,
      |    $lagCols
      |  FROM events)
      |SELECT * FROM (
      |  $branches)
      |ORDER BY user_id, lag""".stripMargin
  }

  // ========================================================================
  // fill_seasonal — gap repair by SEASONAL PROFILE: missing readings
  // impute to their (type, hour-of-day) baseline mean instead of the
  // neighbor-based ffill/interpolation the reference ships
  // (pandas_utilities.py:131-152) — the right policy when gaps span
  // hours (a meter offline overnight: carrying the last evening value
  // forward fabricates a flat night; the hour profile restores the
  // diurnal shape). Missingness is synthesized deterministically
  // (event_id % 7 = 0 → null, ~14% — the fault_inject convention of a
  // reproducible corruption) so the oracle sees identical gaps; the
  // profile is learned from the OBSERVED readings only.
  //
  // Exactness: imputed values are the micro-unit profile means (one
  // exact division, round 6); observed values pass through UNTOUCHED
  // (no quantization round-trip). Scale: one map-side-combined profile
  // agg + one broadcast join — the ts_seasonal_adjust shape.
  // ========================================================================
  def fillSeasonal(s: SparkSession, d: String): DataFrame = {
    val vU = (col("value").cast("decimal(18,6)") * lit(1000000)).cast("long")
    val hourCol = pmod(floor(TimeFns.epochMicros(col("ts")) / lit(3600000000L)).cast("long"),
      lit(24L))
    val base = ev(s, d).select(col("event_id"), col("event_type"), col("value"),
      when(col("event_id") % 7 =!= 0, vU).as("v_u"), hourCol.as("hour"))
    val prof = base.filter(col("v_u").isNotNull)
      .groupBy(col("event_type"), col("hour"))
      .agg(sum(col("v_u")).as("cell_u"), count(lit(1)).as("n"))
    base.join(broadcast(prof), Seq("event_type", "hour"))
      .select(col("event_id"), col("event_type"), col("hour"),
        when(col("v_u").isNotNull, col("value"))
          .otherwise(expr(ExactRound.spark("cell_u", "n")).cast("double")
            / lit(1000000.0)).as("filled"),
        when(col("v_u").isNull, 1L).otherwise(0L).as("imputed"))
      .orderBy(col("event_id"))
  }

  private val fillSeasonalSql =
    s"""WITH b AS (
      |  SELECT event_id, event_type, value,
      |    CASE WHEN event_id % 7 <> 0
      |      THEN CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) END AS v_u,
      |    CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) % 24 AS hour
      |  FROM events),
      |p AS (
      |  SELECT event_type, hour, CAST(sum(v_u) AS BIGINT) AS cell_u, count(v_u) AS n
      |  FROM b WHERE v_u IS NOT NULL GROUP BY 1, 2)
      |SELECT b.event_id, b.event_type, b.hour,
      |  CASE WHEN b.v_u IS NOT NULL THEN b.value
      |       ELSE CAST(${ExactRound.duck("p.cell_u", "p.n")} AS DOUBLE) / 1000000.0
      |  END AS filled,
      |  CAST(CASE WHEN b.v_u IS NULL THEN 1 ELSE 0 END AS BIGINT) AS imputed
      |FROM b JOIN p USING (event_type, hour)
      |ORDER BY event_id""".stripMargin

  // ========================================================================
  // ts_forecast_eval — the forecast-baseline scorecard per event_type:
  // seasonal-naive (ŷ_t = y_{t−24h}, the diurnal repeat) scored against
  // the plain naive (ŷ_t = y_{t−1h}) on the hourly mean series, with
  // mase_e6 = SAE_seasonal·10⁶ div SAE_naive — Hyndman & Koehler's MASE
  // idea (naive error as the scale unit): mase < 10⁶ means the series
  // HAS exploitable diurnal structure (deseasonalize before anomaly
  // scoring, ts_seasonal's premise); ≥ 10⁶ means last-value is already
  // the better baseline and a seasonal model earns nothing. The cheap
  // go/no-go a forecasting pipeline reads before fitting anything.
  //
  // Exactness: hourly means quantize to integer micro-units via
  // ExactRound BEFORE any comparison (the ts_seasonal convention);
  // absolute errors and their sums are then exact integers, and mase is
  // one integer division. Evaluated only on buckets where BOTH lags
  // exist (gap hours drop out of the equi-joins) so the two methods
  // score the same points.
  //
  // Scale shape: ONE map-side-combined (type, hour-bucket) agg collapses
  // the corpus to the hourly relation (|types|·hours rows — time-
  // bounded, tiny at any corpus size); the two lag equi-joins and the
  // final per-type agg run over that relation only.
  // ========================================================================
  def tsForecastEval(s: SparkSession, d: String): DataFrame = {
    val hourly = ev(s, d)
      .groupBy(col("event_type"),
        floor(TimeFns.epochMicros(col("ts")) / lit(3600000000L)).cast("long").as("b"))
      .agg(sum((col("value").cast("decimal(18,6)") * lit(1000000)).cast("long")).as("sum_u"),
        count(lit(1)).as("n"))
      .select(col("event_type"), col("b"),
        expr(ExactRound.spark("sum_u", "n")).cast("long").as("m_u"))
    val s24 = hourly.select(col("event_type"), (col("b") + 24).as("b"), col("m_u").as("m24_u"))
    val s1 = hourly.select(col("event_type"), (col("b") + 1).as("b"), col("m_u").as("m1_u"))
    hourly.join(s24, Seq("event_type", "b")).join(s1, Seq("event_type", "b"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_eval"),
        sum(abs(col("m_u") - col("m24_u"))).as("sae_seasonal_u"),
        sum(abs(col("m_u") - col("m1_u"))).as("sae_naive_u"))
      // DECIMAL(38,0) widening before the ·10⁶ (the pack_buckets/zipf_fit
      // convention): sae is micro-unit-scaled, so a bare Long multiply
      // could wrap on large-value corpora while the HUGEINT oracle stays
      // exact
      .withColumn("mase_e6", expr(
        """CASE WHEN sae_naive_u > 0
          |THEN (CAST(sae_seasonal_u AS DECIMAL(38,0)) * 1000000) div sae_naive_u
          |END""".stripMargin)
        .cast("long"))
      .orderBy(col("event_type"))
  }

  private val tsForecastEvalSql =
    s"""WITH h AS (
      |  SELECT event_type,
      |    CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS b,
      |    CAST(sum(CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS BIGINT) AS sum_u,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |m AS (
      |  SELECT event_type, b,
      |    CAST(${ExactRound.duck("sum_u", "n")} AS BIGINT) AS m_u
      |  FROM h),
      |j AS (
      |  SELECT c.event_type, c.m_u, a.m_u AS m24_u, p.m_u AS m1_u
      |  FROM m c
      |  JOIN m a ON a.event_type = c.event_type AND a.b = c.b - 24
      |  JOIN m p ON p.event_type = c.event_type AND p.b = c.b - 1)
      |SELECT event_type, count(*) AS n_eval,
      |  CAST(sum(abs(m_u - m24_u)) AS BIGINT) AS sae_seasonal_u,
      |  CAST(sum(abs(m_u - m1_u)) AS BIGINT) AS sae_naive_u,
      |  CASE WHEN sum(abs(m_u - m1_u)) > 0
      |    THEN CAST((sum(abs(m_u - m24_u)) * 1000000) // sum(abs(m_u - m1_u)) AS BIGINT)
      |  END AS mase_e6
      |FROM j GROUP BY event_type ORDER BY event_type""".stripMargin

  val queries: Map[String, Q] = Map(
    "fill_seasonal" -> (fillSeasonal _),
    "ts_acf_multi" -> (tsAcfMulti _),
    "ts_seasonal_adjust" -> (tsSeasonalAdjust _),
    "ts_rolling_median" -> (tsRollingMedian _),
    "ts_seasonal" -> (tsSeasonal _),
    "ts_forecast_eval" -> (tsForecastEval _),
    "ts_changepoint" -> (tsChangepoint _),
    "ts_ewma" -> (tsEwma _),
    "ts_zscore_anomaly" -> (tsZscoreAnomaly _),
    "ts_autocorr" -> (tsAutocorr _),
    "skew_report" -> (skewReport _),
  )

  val oracleSql: Map[String, String] = Map(
    "fill_seasonal" -> fillSeasonalSql,
    "ts_acf_multi" -> tsAcfMultiSql,
    "ts_seasonal_adjust" -> tsSeasonalAdjustSql,
    "ts_rolling_median" -> tsRollingMedianSql,
    "ts_seasonal" -> tsSeasonalSql,
    "ts_forecast_eval" -> tsForecastEvalSql,
    "ts_changepoint" -> tsChangepointSql,
    "ts_ewma" -> tsEwmaSql,
    "ts_zscore_anomaly" -> tsZscoreAnomalySql,
    "ts_autocorr" -> tsAutocorrSql,
    "skew_report" -> skewReportSql,
  )
}
