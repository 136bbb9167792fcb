package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.functions.TimeFns
import graft.operators.{Fill, Quality, Resample, WindowOps}

/** Ordered / time-series queries: sliding windows, supervised splits,
  * fixed batching, prefix splits, offsets, upsample generation, ffill /
  * linear interpolation, synthetic timestamp derivation, systematic
  * sampling, null profiling, and the composite resample pipeline.
  * SURVEY.md §2.5/§2.6.
  *
  * Every windowed query partitions by the series key (`user_id`) so the
  * window work parallelizes per series at scale; the few global-order ones
  * (batch/split/offset — inherently total-order ops) are documented as
  * such and compute a single `row_number` pass.
  */
object WindowQueries {
  private type Q = (SparkSession, String) => DataFrame
  private def ev(s: SparkSession, d: String) = Tables.events(s, d)
  private val epochUs: Column = TimeFns.epochMicros(col("ts"))
  private val epochS: Column = TimeFns.epochSeconds(col("ts"))

  /** events + exact µs epoch, the shared input shape for ordered ops. */
  private def evE(s: SparkSession, d: String) =
    ev(s, d).select(col("event_id"), col("user_id"), col("value"), epochUs.as("e_us"))

  private val orderCols = Seq("e_us", "event_id")

  // ========================================================================
  // §2.5 sliding_window — size 5, shift 1, drop_remainder, per series.
  // Compared in exploded (anchor_id, pos, v) form.
  // ========================================================================
  def slidingWindow(s: SparkSession, d: String): DataFrame =
    WindowOps.slidingWindow(evE(s, d), col("value"), 5, Seq("user_id"), orderCols)
      .select(col("event_id").as("anchor_id"), posexplode(col("win")).as(Seq("pos", "v")))
      .select(col("anchor_id"), col("pos").cast("long").as("pos"), col("v"))
      .orderBy(col("anchor_id"), col("pos"))

  private val slidingWindowSql =
    """WITH r AS (
      |  SELECT event_id, user_id, value,
      |    row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn,
      |    count(*) OVER (PARTITION BY user_id) AS n
      |  FROM events)
      |SELECT a.event_id AS anchor_id, CAST(b.rn - a.rn AS BIGINT) AS pos, b.value AS v
      |FROM r a JOIN r b ON a.user_id = b.user_id AND b.rn >= a.rn AND b.rn <= a.rn + 4
      |WHERE a.rn + 4 <= a.n
      |ORDER BY anchor_id, pos""".stripMargin

  // ========================================================================
  // §2.5 window_supervised — window → (first W−1 = input, last = target).
  // ========================================================================
  def windowSupervised(s: SparkSession, d: String): DataFrame =
    WindowOps.supervisedWindow(evE(s, d), col("value"), 5, Seq("user_id"), orderCols)
      .select(col("event_id").as("anchor_id"), col("target"),
        posexplode(col("input")).as(Seq("pos", "input_v")))
      .select(col("anchor_id"), col("pos").cast("long").as("pos"),
        col("input_v"), col("target"))
      .orderBy(col("anchor_id"), col("pos"))

  private val windowSupervisedSql =
    """WITH r AS (
      |  SELECT event_id, user_id, value,
      |    row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn,
      |    count(*) OVER (PARTITION BY user_id) AS n
      |  FROM events),
      |t AS (
      |  SELECT a.event_id AS anchor_id, a.user_id, a.rn AS arn, b.value AS target
      |  FROM r a JOIN r b ON a.user_id = b.user_id AND b.rn = a.rn + 4
      |  WHERE a.rn + 4 <= a.n)
      |SELECT t.anchor_id, CAST(c.rn - t.arn AS BIGINT) AS pos, c.value AS input_v, t.target
      |FROM t JOIN r c ON c.user_id = t.user_id AND c.rn >= t.arn AND c.rn <= t.arn + 3
      |ORDER BY anchor_id, pos""".stripMargin

  // ========================================================================
  // §2.5 window_supervised_v2 — windowed_dataset_v2 column split: each
  // window row's vector → (cols 1.. = input, col 0 = target). Vector per
  // row = [value, user_id, event_id % 100]; compared in exploded
  // (anchor_id, pos, input_1, input_2, target_v) form with the inner
  // input array flattened to fixed columns (width known = D−1 = 2).
  // ========================================================================
  private def evVec(s: SparkSession, d: String) =
    evE(s, d).withColumn("vec", array(col("value"),
      col("user_id").cast("double"), (col("event_id") % 100).cast("double")))

  def windowSupervisedV2(s: SparkSession, d: String): DataFrame =
    WindowOps.supervisedWindowV2(evVec(s, d), col("vec"), 4, Seq("user_id"), orderCols)
      .select(col("event_id").as("anchor_id"),
        posexplode(arrays_zip(col("input"), col("target"))).as(Seq("pos", "z")))
      .select(col("anchor_id"), col("pos").cast("long").as("pos"),
        element_at(col("z.input"), 1).as("input_1"),
        element_at(col("z.input"), 2).as("input_2"),
        col("z.target").as("target_v"))
      .orderBy(col("anchor_id"), col("pos"))

  private val windowSupervisedV2Sql =
    """WITH r AS (
      |  SELECT event_id, user_id, value,
      |    row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn,
      |    count(*) OVER (PARTITION BY user_id) AS n
      |  FROM events)
      |SELECT a.event_id AS anchor_id, CAST(b.rn - a.rn AS BIGINT) AS pos,
      |  CAST(b.user_id AS DOUBLE) AS input_1,
      |  CAST(b.event_id % 100 AS DOUBLE) AS input_2,
      |  b.value AS target_v
      |FROM r a JOIN r b ON a.user_id = b.user_id AND b.rn >= a.rn AND b.rn <= a.rn + 3
      |WHERE a.rn + 3 <= a.n
      |ORDER BY anchor_id, pos""".stripMargin

  // ========================================================================
  // §2.5 window_gather — tf.gather(axis=1) index selection per window:
  // features = vec[[2,0]] (reordered), targets = vec[[1]] — exercises
  // arbitrary order and the feature/target overlap-free split.
  // ========================================================================
  def windowGather(s: SparkSession, d: String): DataFrame =
    WindowOps.windowGather(evVec(s, d), col("vec"), 4,
        featureIdx = Seq(2, 0), targetIdx = Seq(1), Seq("user_id"), orderCols)
      .select(col("event_id").as("anchor_id"),
        posexplode(arrays_zip(col("input"), col("target"))).as(Seq("pos", "z")))
      .select(col("anchor_id"), col("pos").cast("long").as("pos"),
        element_at(col("z.input"), 1).as("f_1"),
        element_at(col("z.input"), 2).as("f_2"),
        element_at(col("z.target"), 1).as("t_1"))
      .orderBy(col("anchor_id"), col("pos"))

  private val windowGatherSql =
    """WITH r AS (
      |  SELECT event_id, user_id, value,
      |    row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn,
      |    count(*) OVER (PARTITION BY user_id) AS n
      |  FROM events)
      |SELECT a.event_id AS anchor_id, CAST(b.rn - a.rn AS BIGINT) AS pos,
      |  CAST(b.event_id % 100 AS DOUBLE) AS f_1,
      |  b.value AS f_2,
      |  CAST(b.user_id AS DOUBLE) AS t_1
      |FROM r a JOIN r b ON a.user_id = b.user_id AND b.rn >= a.rn AND b.rn <= a.rn + 3
      |WHERE a.rn + 3 <= a.n
      |ORDER BY anchor_id, pos""".stripMargin

  // ========================================================================
  // §2.6 batch_fixed — fixed batches of 100, drop_remainder, global order
  // (inherently total-order; one row_number pass), per-batch aggregate out.
  // ========================================================================
  def batchFixed(s: SparkSession, d: String): DataFrame =
    WindowOps.fixedBatches(ev(s, d).select(col("event_id"), col("value")), 100,
        Seq.empty, Seq("event_id"))
      .groupBy(col("batch_id"))
      .agg(count(lit(1)).as("n_rows"), CoreQueries.exactMeanCents(col("value")).as("avg_value"),
        min(col("event_id")).as("min_id"), max(col("event_id")).as("max_id"))
      .orderBy(col("batch_id"))

  private val batchFixedSql =
    s"""WITH r AS (
      |  SELECT event_id, value, row_number() OVER (ORDER BY event_id) AS rn,
      |    count(*) OVER () AS n
      |  FROM events)
      |SELECT CAST(floor((rn - 1) / 100) AS BIGINT) AS batch_id, count(*) AS n_rows,
      |  ${CoreQueries.exactMeanCentsSql("value")} AS avg_value,
      |  min(event_id) AS min_id, max(event_id) AS max_id
      |FROM r WHERE (floor((rn - 1) / 100) + 1) * 100 <= n
      |GROUP BY 1 ORDER BY batch_id""".stripMargin

  // ========================================================================
  // §2.6 split_prefix — sequential 0.7/0.2/0.1 prefix split (NOT random;
  // reference uses keras split_dataset = first f·N rows).
  // ========================================================================
  def splitPrefix(s: SparkSession, d: String): DataFrame =
    WindowOps.prefixSplit(ev(s, d).select(col("event_id")), (0.7, 0.2, 0.1),
        Seq.empty, Seq("event_id"))
      .select(col("event_id"), col("split"))
      .orderBy(col("event_id"))

  private val splitPrefixSql =
    """WITH r AS (
      |  SELECT event_id, row_number() OVER (ORDER BY event_id) AS rn,
      |    count(*) OVER () AS n
      |  FROM events)
      |SELECT event_id,
      |  CASE WHEN rn <= floor(n * 0.7) THEN 'train'
      |       WHEN rn <= floor(n * 0.7) + floor(n * 0.2) THEN 'test'
      |       ELSE 'eval' END AS split
      |FROM r ORDER BY event_id""".stripMargin

  // ========================================================================
  // §2.6 offset_skip — skip first 100 rows in time order (reference
  // `.skip(45000)` DER warm-up).
  // ========================================================================
  def offsetSkip(s: SparkSession, d: String): DataFrame =
    WindowOps.offsetSkip(evE(s, d), 100, Seq.empty, orderCols)
      .select(col("event_id"))
      .orderBy(col("event_id"))

  private val offsetSkipSql =
    """WITH r AS (
      |  SELECT event_id, row_number() OVER (ORDER BY epoch_us(ts), event_id) AS rn
      |  FROM events)
      |SELECT event_id FROM r WHERE rn > 100 ORDER BY event_id""".stripMargin

  // ========================================================================
  // §2.5 resample_up_explode — upsample 300s→60s grid by repeat-fill:
  // a generator (explode(sequence)), shuffle-free.
  // ========================================================================
  def resampleUpExplode(s: SparkSession, d: String): DataFrame =
    Resample.upsampleRepeat(ev(s, d).select(col("event_id"), col("value"), col("ts")),
        "ts", 300L, 60L)
      .select(col("event_id"), col("value"), col("ts_up"))
      .orderBy(col("event_id"), col("ts_up"))

  private val resampleUpExplodeSql =
    """SELECT event_id, value, unnest(generate_series(b, b + 240, 60)) AS ts_up
      |FROM (
      |  SELECT event_id, value,
      |    CAST(floor(CAST(floor(epoch_us(ts) / 1000000) AS BIGINT) / 60) * 60 AS BIGINT) AS b
      |  FROM events)
      |ORDER BY event_id, ts_up""".stripMargin

  // ========================================================================
  // §2.5 resample_up_linear — upsample 300s→60s with LINEAR fill: the
  // reference declares `fill_method` with the linear path commented out
  // (tfdataset_resampling.py:22-25); realized by composing the repeat
  // grid generator with the forward-only interpolation window per user
  // series (Resample.upsampleLinear). Anchors keep their exact value;
  // interior grid points interpolate between consecutive anchors;
  // trailing points carry forward. One generator + one keyed window.
  // ========================================================================
  def resampleUpLinear(s: SparkSession, d: String): DataFrame =
    Resample.upsampleLinear(
        ev(s, d).select(col("event_id"), col("user_id"), col("value"), col("ts")),
        "ts", "value", 300L, 60L, Seq("user_id"), Seq("event_id"))
      .select(col("event_id"), col("ts_up"), col("value_lin"))
      .orderBy(col("event_id"), col("ts_up"))

  private val resampleUpLinearSql =
    """WITH up AS (
      |  SELECT event_id, user_id, value,
      |    CAST(floor(CAST(floor(epoch_us(ts) / 1000000) AS BIGINT) / 60) * 60 AS BIGINT) AS b
      |  FROM events),
      |g AS (
      |  SELECT event_id, user_id, value, b,
      |    unnest(generate_series(b, b + 240, 60)) AS ts_up
      |  FROM up),
      |a AS (
      |  SELECT event_id, user_id, ts_up, CAST(ts_up AS DOUBLE) AS t,
      |    CASE WHEN ts_up = b THEN value END AS v
      |  FROM g),
      |w AS (
      |  SELECT event_id, ts_up, v, t,
      |    last_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER win_b AS pt,
      |    last_value(CASE WHEN v IS NOT NULL THEN v END IGNORE NULLS) OVER win_b AS pv,
      |    first_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER win_a AS nt,
      |    first_value(CASE WHEN v IS NOT NULL THEN v END IGNORE NULLS) OVER win_a AS nv
      |  FROM a
      |  WINDOW
      |    win_b AS (PARTITION BY user_id ORDER BY ts_up, event_id
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |    win_a AS (PARTITION BY user_id ORDER BY ts_up, event_id
      |              ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
      |SELECT event_id, ts_up,
      |  CASE WHEN v IS NOT NULL THEN v
      |       WHEN pt IS NOT NULL AND nt IS NOT NULL AND nt <> pt
      |         THEN pv + (nv - pv) * (t - pt) / (nt - pt)
      |       WHEN pt IS NOT NULL THEN pv
      |       END AS value_lin
      |FROM w ORDER BY event_id, ts_up""".stripMargin

  // ========================================================================
  // §2.5 fill_forward — deterministic nulls injected (event_id % 7 == 0),
  // then last-observation-carried-forward per series.
  // ========================================================================
  def fillForward(s: SparkSession, d: String): DataFrame = {
    val e = evE(s, d).withColumn("v", when(col("event_id") % 7 =!= 0, col("value")))
    e.select(col("event_id"), col("user_id"),
        Fill.ffill(col("v"), Seq("user_id"), orderCols).as("v_filled"))
      .orderBy(col("event_id"))
  }

  private val fillForwardSql =
    """WITH r AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS e_us,
      |    CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
      |  FROM events)
      |SELECT event_id, user_id,
      |  last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY e_us, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
      |FROM r ORDER BY event_id""".stripMargin

  // ========================================================================
  // §2.5 fill_interpolate — linear interpolation between prev/next
  // non-null, weighted by the µs time axis; bfill/ffill fallbacks at the
  // edges (the reference's hardest window op, SURVEY §7.4).
  // ========================================================================
  def fillInterpolate(s: SparkSession, d: String): DataFrame = {
    val e = evE(s, d)
      .withColumn("v", when(col("event_id") % 7 =!= 0, col("value")))
      .withColumn("t", col("e_us").cast("double"))
    // unrounded: v and t are identical doubles in both engines, so the
    // interpolation arithmetic is bit-identical; the interpolated value
    // is a rational that can sit exactly on rounding half-boundaries
    e.select(col("event_id"),
        Fill.interpolate(col("v"), col("t"), Seq("user_id"), orderCols).as("v_interp"))
      .orderBy(col("event_id"))
  }

  private val fillInterpolateSql =
    """WITH r AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS e_us,
      |    CAST(epoch_us(ts) AS DOUBLE) AS t,
      |    CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
      |  FROM events),
      |w AS (
      |  SELECT event_id, v, t,
      |    last_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER win_b AS pt,
      |    last_value(CASE WHEN v IS NOT NULL THEN v END IGNORE NULLS) OVER win_b AS pv,
      |    first_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER win_a AS nt,
      |    first_value(CASE WHEN v IS NOT NULL THEN v END IGNORE NULLS) OVER win_a AS nv
      |  FROM r
      |  WINDOW
      |    win_b AS (PARTITION BY user_id ORDER BY e_us, event_id
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |    win_a AS (PARTITION BY user_id ORDER BY e_us, event_id
      |              ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
      |SELECT event_id,
      |  CASE WHEN v IS NOT NULL THEN v
      |       WHEN pt IS NOT NULL AND nt IS NOT NULL AND nt <> pt
      |         THEN pv + (nv - pv) * (t - pt) / (nt - pt)
      |       WHEN pt IS NOT NULL THEN pv
      |       ELSE nv END AS v_interp
      |FROM w ORDER BY event_id""".stripMargin

  // ========================================================================
  // §2.5 fill_policy — the reference's per-column fill DISPATCHER
  // (fill_missing_values_in_df): v_inst (instantaneous) → ffill with
  // conditional >1-remaining backfill; v_cum (cumulative, in
  // columns_to_avoid) → forward-only linear interpolation. Nulls injected
  // deterministically (%7 / %11).
  // ========================================================================
  def fillPolicy(s: SparkSession, d: String): DataFrame = {
    val e = evE(s, d)
      .withColumn("v_inst", when(col("event_id") % 7 =!= 0, col("value")))
      .withColumn("v_cum", when(col("event_id") % 11 =!= 0, col("value") * 2))
      .withColumn("t", col("e_us").cast("double"))
    Fill.fillMissing(e, Seq("v_inst", "v_cum"), Set("v_cum"), col("t"),
        Seq("user_id"), orderCols)
      .select(col("event_id"), col("v_inst"), col("v_cum"))
      .orderBy(col("event_id"))
  }

  private val fillPolicySql =
    """WITH r AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS e_us,
      |    CAST(epoch_us(ts) AS DOUBLE) AS t,
      |    CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v_inst,
      |    CASE WHEN event_id % 11 = 0 THEN NULL ELSE value * 2 END AS v_cum
      |  FROM events),
      |w AS (
      |  SELECT event_id, user_id, t, v_cum,
      |    last_value(v_inst IGNORE NULLS) OVER win_f AS ff,
      |    first_value(v_inst IGNORE NULLS) OVER win_b AS bf,
      |    last_value(CASE WHEN v_cum IS NOT NULL THEN t END IGNORE NULLS) OVER win_p AS pt,
      |    last_value(CASE WHEN v_cum IS NOT NULL THEN v_cum END IGNORE NULLS) OVER win_p AS pv,
      |    first_value(CASE WHEN v_cum IS NOT NULL THEN t END IGNORE NULLS) OVER win_n AS nt,
      |    first_value(CASE WHEN v_cum IS NOT NULL THEN v_cum END IGNORE NULLS) OVER win_n AS nv
      |  FROM r
      |  WINDOW
      |    win_f AS (PARTITION BY user_id ORDER BY e_us, event_id
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |    win_b AS (PARTITION BY user_id ORDER BY e_us, event_id
      |              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING),
      |    win_p AS (PARTITION BY user_id ORDER BY e_us, event_id
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |    win_n AS (PARTITION BY user_id ORDER BY e_us, event_id
      |              ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)),
      |f AS (
      |  SELECT event_id, ff, bf,
      |    sum(CASE WHEN ff IS NULL THEN 1 ELSE 0 END) OVER (PARTITION BY user_id) AS remaining,
      |    CASE WHEN v_cum IS NOT NULL THEN v_cum
      |         WHEN pt IS NOT NULL AND nt IS NOT NULL AND nt <> pt
      |           THEN pv + (nv - pv) * (t - pt) / (nt - pt)
      |         WHEN pt IS NOT NULL THEN pv
      |         ELSE NULL END AS v_cum_f
      |  FROM w)
      |SELECT event_id,
      |  CASE WHEN remaining > 1 THEN coalesce(ff, bf) ELSE ff END AS v_inst,
      |  v_cum_f AS v_cum
      |FROM f ORDER BY event_id""".stripMargin

  // ========================================================================
  // §2.1 derive_synthetic_ts — synthesize a timestamp column from the row
  // index (get_df_der: pd.date_range('2023-01-01', freq='S'),
  // pandas_utilities.py:42).
  // ========================================================================
  def deriveSyntheticTs(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"))
    WindowOps.withRowIdx(li, Seq.empty, Seq("l_orderkey", "l_linenumber"))
      .select(col("l_orderkey"), col("l_linenumber"),
        (lit(1672531200L) + col("rn").cast("long")).as("synth_epoch_s"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  private val deriveSyntheticTsSql =
    """SELECT l_orderkey, l_linenumber,
      |  1672531200 + row_number() OVER (ORDER BY l_orderkey, l_linenumber) AS synth_epoch_s
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ========================================================================
  // §2.6 sample_rate — deterministic systematic sample (the reference's
  // `downsampling_rate` knob is declared but never read; we implement a
  // reproducible variant; the seeded-random `df.sample` is in ScalaTest).
  // ========================================================================
  def sampleRate(s: SparkSession, d: String): DataFrame =
    ev(s, d).filter(col("event_id") % 10 === 0)
      .select(col("event_id"), col("value"))
      .orderBy(col("event_id"))

  private val sampleRateSql =
    """SELECT event_id, value FROM events
      |WHERE event_id % 10 = 0 ORDER BY event_id""".stripMargin

  // ========================================================================
  // §2.2 null_profile — per-column null counting over injected nulls
  // (NaN predicates, pandas_utilities.py:72-88 — intended semantics; the
  // reference's inverted check is documented in Quality).
  // ========================================================================
  def nullProfile(s: SparkSession, d: String): DataFrame = {
    val e = ev(s, d)
      .withColumn("value", when(col("event_id") % 7 =!= 0, col("value")))
      .withColumn("props", when(col("event_id") % 13 =!= 0, col("props")))
    Quality.nullProfile(e, Seq("props", "value")).orderBy(col("column_name"))
  }

  private val nullProfileSql =
    """SELECT column_name, n_rows, n_null FROM (
      |  SELECT 'props' AS column_name, count(*) AS n_rows,
      |    CAST(sum(CASE WHEN event_id % 13 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_null FROM events
      |  UNION ALL
      |  SELECT 'value', count(*),
      |    CAST(sum(CASE WHEN event_id % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT) FROM events
      |) ORDER BY column_name""".stripMargin

  // ========================================================================
  // §2.5 pipeline_resample — composite: epoch derive → alignment filter
  // (60s) → bucket mean (300s), the add_select_resample_csvdataset chain
  // (datapipeline.py:619-650).
  // ========================================================================
  def pipelineResample(s: SparkSession, d: String): DataFrame = {
    val aligned = Resample.downsampleFilter(ev(s, d), "ts", 60L)
    aligned.groupBy(graft.functions.TimeFns.timeBucket(col("ts"), 300L).as("bucket"))
      .agg(CoreQueries.exactMeanCents(col("value")).as("avg_value"))
      .orderBy(col("bucket"))
  }

  private val pipelineResampleSql =
    s"""SELECT CAST(floor(epoch_us(ts) / 300000000) * 300 AS BIGINT) AS bucket,
      |  ${CoreQueries.exactMeanCentsSql("value")} AS avg_value
      |FROM events
      |WHERE CAST(floor(epoch_us(ts) / 1000000) AS BIGINT) % 60 = 0
      |GROUP BY 1 ORDER BY bucket""".stripMargin

  // ========================================================================
  // sessionize — gap-based session windows: per user, a new session
  // starts when the gap to the previous event exceeds 30 minutes; each
  // session reduces to (n_events, start, end, duration). THE grouping
  // primitive for interaction logs / conversation corpora. Implemented
  // the distributed-safe way: one lag + one running sum over the SAME
  // per-user window (a single hash-partitioned sort, no self-join, no
  // session_window state), then a partial-aggregated groupBy on
  // (user, session). All arithmetic is exact integer epoch-micros, so
  // the boundary decision (gap > 30 min, strictly) is engine-identical.
  // ========================================================================
  private val SessionGapUs = 1800L * 1000000L

  /** The session relation UNORDERED (user_id, session_idx, n_events,
    * start_us, end_us, duration_us), memoized per (session, dir) and
    * PERSISTED — r21 optimization (guide §1.2/§2.4): `sessionize` and
    * `session_concurrency` both ran the two-window gap pipeline, and
    * the concurrency sweep additionally paid sessionize's presentation
    * ORDER BY range exchange just to destroy it with a groupBy. The
    * interval relation is session-sized (id columns only).
    */
  private val sessionMemo =
    scala.collection.mutable.Map.empty[(SparkSession, String), DataFrame]
  private def sessionCore(s: SparkSession, d: String): DataFrame =
    RelationMemo.relation(sessionMemo, (s, d), "sessionCore") {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("e_us"), col("event_id"))
      val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev(s, d)
        .select(col("user_id"), col("event_id"), epochUs.as("e_us"))
        .withColumn("gap", col("e_us") - lag(col("e_us"), 1).over(w))
        .withColumn("is_new",
          when(col("gap").isNull || col("gap") > SessionGapUs, 1L).otherwise(0L))
        .withColumn("session_idx", sum(col("is_new")).over(cum))
        .groupBy(col("user_id"), col("session_idx"))
        .agg(count(lit(1)).as("n_events"),
          min(col("e_us")).as("start_us"), max(col("e_us")).as("end_us"))
        .withColumn("duration_us", col("end_us") - col("start_us"))
        .persist()
    }

  def sessionize(s: SparkSession, d: String): DataFrame =
    sessionCore(s, d).orderBy(col("user_id"), col("session_idx"))

  /** The session CTE chain — ONE rendering shared by `sessionize` and
    * `session_concurrency` so the gap rule cannot silently diverge
    * between the interval builder and its consumers (the lshPipelineCtes
    * pattern).
    */
  private val sessionCtes =
    s"""e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS e_us FROM events),
      |g AS (
      |  SELECT user_id, event_id, e_us,
      |    e_us - lag(e_us) OVER (PARTITION BY user_id ORDER BY e_us, event_id) AS gap
      |  FROM e),
      |sess AS (
      |  SELECT user_id, e_us,
      |    sum(CASE WHEN gap IS NULL OR gap > $SessionGapUs THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY e_us, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
      |  FROM g)""".stripMargin

  private val sessionizeSql =
    s"""WITH $sessionCtes
      |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
      |  count(*) AS n_events, min(e_us) AS start_us, max(e_us) AS end_us,
      |  max(e_us) - min(e_us) AS duration_us
      |FROM sess GROUP BY user_id, session_idx
      |ORDER BY user_id, session_idx""".stripMargin

  // ========================================================================
  // session_concurrency — peak simultaneous sessions per active hour:
  // the capacity-planning view over the sessionize intervals (how many
  // users were mid-session at once — what a serving layer provisions
  // for). Classic boundary sweep: each [start, end] session emits
  // (start, +1) and (end+1, −1); per-timestamp deltas aggregate FIRST
  // (so coincident starts/ends are order-free), and the running sum of
  // nets IS the concurrency after each boundary; per-hour peak = max
  // over the hour's boundaries.
  //
  // Scale shape: the running sum is the quantile_bucket TWO-LEVEL
  // prefix sum, not a single global window — per-hour chunk nets (tiny
  // relation, single-partition window allowed) broadcast exclusive
  // offsets onto chunk-KEYED local cumulative windows. Boundary deltas
  // are map-side combined by timestamp. Hours without boundaries carry
  // the entering concurrency unchanged and are definitionally absent
  // (report covers ACTIVE hours). A production run over a persisted
  // session relation would start from that table; here the interval
  // builder is recomputed per branch (events-table scale, cheap — the
  // memo pattern applies if it ever isn't).
  // ========================================================================
  /** The chunk-keyed cumulated boundary relation (chunk, t, net, lrun)
    * — package-visible so PlanShapeSpec pins the scale shape on the
    * BUILD plan (sessionConcurrency materializes it, which truncates
    * the consumer's plan at a Scan ExistingRDD).
    */
  private[queries] def sessionBoundaryCore(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sess = sessionCore(s, d).select(col("start_us"), col("end_us"))
    val wloc = Window.partitionBy(col("chunk")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, 0)
    sess.select(explode(array(
        struct(col("start_us").as("t"), lit(1L).as("delta")),
        struct((col("end_us") + 1).as("t"), lit(-1L).as("delta")))).as("e"))
      .select(col("e.t").as("t"), col("e.delta").as("delta"))
      .withColumn("chunk", floor(col("t") / lit(3600000000L)).cast("long"))
      .repartition(col("chunk"))
      .groupBy(col("chunk"), col("t")).agg(sum(col("delta")).as("net"))
      .withColumn("lrun", sum(col("net")).over(wloc))
  }

  def sessionConcurrency(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // r22 (§2.4 share the exchange, cut the duplicated subtree): the
    // boundary relation is aggregated AND locally cumulated on ONE
    // hash(chunk) exchange — grouping by (chunk, t) after an explicit
    // chunk repartition satisfies both the aggregation's distribution
    // (chunk ⊆ keys) and the chunk-local window's, where groupBy(t)
    // alone forced a second exchange to re-key for the window. chunk is
    // a pure function of t, so (chunk, t) groups ≡ t groups. The tiny
    // cumulated relation is then materialized once (localCheckpoint —
    // boundary-count rows of four longs) so the offsets branch reads it
    // instead of replaying the whole subtree (the old plan built the
    // explode→aggregate pipeline twice: 48 nodes, 17 exchanges). The
    // per-chunk net needed for the offsets IS the chunk's last local
    // cumulative (max_by(lrun, t)) — exact integers, no re-aggregation
    // of net.
    val b = sessionBoundaryCore(s, d).localCheckpoint()
    val wch = Window.orderBy(col("chunk"))
    val offs = b.groupBy(col("chunk"))
      .agg(count(lit(1)).as("nb"), max_by(col("lrun"), col("t")).as("cnet"))
      .select(col("chunk"), col("nb"),
        coalesce(sum(col("cnet")).over(wch.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)).as("coff"))
    b.join(broadcast(offs), Seq("chunk"))
      .groupBy(col("chunk"), col("nb"))
      .agg(max(col("coff") + col("lrun")).as("peak"))
      .select((col("chunk") * 3600).as("hour_s"), col("nb").as("n_boundaries"), col("peak"))
      .orderBy(col("hour_s"))
  }

  private val sessionConcurrencySql =
    s"""WITH $sessionCtes,
      |iv AS (
      |  SELECT min(e_us) AS start_us, max(e_us) AS end_us
      |  FROM sess GROUP BY user_id, session_idx),
      |bd AS (
      |  SELECT t, CAST(sum(delta) AS BIGINT) AS net FROM (
      |    SELECT start_us AS t, 1 AS delta FROM iv
      |    UNION ALL SELECT end_us + 1, -1 FROM iv)
      |  GROUP BY t),
      |run AS (
      |  SELECT CAST(floor(t / 3600000000) AS BIGINT) AS chunk,
      |    sum(net) OVER (ORDER BY t) AS conc
      |  FROM bd)
      |SELECT chunk * 3600 AS hour_s, count(*) AS n_boundaries,
      |  CAST(max(conc) AS BIGINT) AS peak
      |FROM run GROUP BY chunk
      |ORDER BY hour_s""".stripMargin

  val queries: Map[String, Q] = Map(
    "sessionize" -> (sessionize _),
    "session_concurrency" -> (sessionConcurrency _),
    "sliding_window" -> (slidingWindow _),
    "window_supervised" -> (windowSupervised _),
    "window_supervised_v2" -> (windowSupervisedV2 _),
    "window_gather" -> (windowGather _),
    "batch_fixed" -> (batchFixed _),
    "split_prefix" -> (splitPrefix _),
    "offset_skip" -> (offsetSkip _),
    "resample_up_explode" -> (resampleUpExplode _),
    "resample_up_linear" -> (resampleUpLinear _),
    "fill_forward" -> (fillForward _),
    "fill_interpolate" -> (fillInterpolate _),
    "fill_policy" -> (fillPolicy _),
    "derive_synthetic_ts" -> (deriveSyntheticTs _),
    "sample_rate" -> (sampleRate _),
    "null_profile" -> (nullProfile _),
    "pipeline_resample" -> (pipelineResample _),
  )

  val oracleSql: Map[String, String] = Map(
    "sessionize" -> sessionizeSql,
    "session_concurrency" -> sessionConcurrencySql,
    "sliding_window" -> slidingWindowSql,
    "window_supervised" -> windowSupervisedSql,
    "window_supervised_v2" -> windowSupervisedV2Sql,
    "window_gather" -> windowGatherSql,
    "batch_fixed" -> batchFixedSql,
    "split_prefix" -> splitPrefixSql,
    "offset_skip" -> offsetSkipSql,
    "resample_up_explode" -> resampleUpExplodeSql,
    "resample_up_linear" -> resampleUpLinearSql,
    "fill_forward" -> fillForwardSql,
    "fill_interpolate" -> fillInterpolateSql,
    "fill_policy" -> fillPolicySql,
    "derive_synthetic_ts" -> deriveSyntheticTsSql,
    "sample_rate" -> sampleRateSql,
    "null_profile" -> nullProfileSql,
    "pipeline_resample" -> pipelineResampleSql,
  )
}
