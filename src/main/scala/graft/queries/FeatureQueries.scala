package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.functions.{Cyclical, TimeFns}
import graft.operators.{FeatureSpace, PlotPrep}

/** Feature-engineering queries: cyclical encodings, one-hot (int depth-5 +
  * learned string vocab), min-max rescale, vector pack, feature concat,
  * JSON extraction, and the end-to-end FeatureSpace adapt+apply composite.
  * SURVEY.md §2.7/§2.8.
  */
object FeatureQueries {
  private type Q = (SparkSession, String) => DataFrame
  private def ev(s: SparkSession, d: String) = Tables.events(s, d)
  private val epochUs: Column = TimeFns.epochMicros(col("ts"))
  private val epochS: Column = TimeFns.epochSeconds(col("ts"))

  // ========================================================================
  // §2.7 cyclical_features — sin/cos(t·2π/P) for P ∈ {minute, hour, day}.
  // Phase-reduced in exact integer µs (see Cyclical.pairReduced) so both
  // engines evaluate sin/cos on small arguments; round 6 absorbs the ≤1ulp
  // libm difference. Pure per-row math: codegen'd, shuffle-free.
  // ========================================================================
  def cyclicalFeatures(s: SparkSession, d: String): DataFrame = {
    val (sm, cm) = Cyclical.pairReduced(col("e_us"), Cyclical.SecondsPerMinute)
    val (sh, ch) = Cyclical.pairReduced(col("e_us"), Cyclical.SecondsPerHour)
    val (sd, cd) = Cyclical.pairReduced(col("e_us"), Cyclical.SecondsPerDay)
    ev(s, d).select(col("event_id"), epochUs.as("e_us"))
      .select(col("event_id"),
        round(sm, 6).as("sin_minute"), round(cm, 6).as("cos_minute"),
        round(sh, 6).as("sin_hour"), round(ch, 6).as("cos_hour"),
        round(sd, 6).as("sin_day"), round(cd, 6).as("cos_day"))
      .orderBy(col("event_id"))
  }

  private val cyclicalFeaturesSql =
    """SELECT event_id,
      |  round(sin((e_us % 60000000) * (2 * pi() / 60000000.0)), 6) AS sin_minute,
      |  round(cos((e_us % 60000000) * (2 * pi() / 60000000.0)), 6) AS cos_minute,
      |  round(sin((e_us % 3600000000) * (2 * pi() / 3600000000.0)), 6) AS sin_hour,
      |  round(cos((e_us % 3600000000) * (2 * pi() / 3600000000.0)), 6) AS cos_hour,
      |  round(sin((e_us % 86400000000) * (2 * pi() / 86400000000.0)), 6) AS sin_day,
      |  round(cos((e_us % 86400000000) * (2 * pi() / 86400000000.0)), 6) AS cos_day
      |FROM (SELECT event_id, epoch_us(ts) AS e_us FROM events)
      |ORDER BY event_id""".stripMargin

  // ========================================================================
  // §2.7 onehot_int — depth-5 indicator block over an int category
  // (reference hardcodes depth 5, datapipeline.py:239). Wide output,
  // `{col}_onehot_{i}` names as in the reference.
  // ========================================================================
  def onehotInt(s: SparkSession, d: String): DataFrame = {
    val cat = (col("user_id") % 5).cast("int")
    val stats = FeatureSpace.FeatureStats(Map.empty, Map.empty)
    val cols = FeatureSpace.expand(FeatureSpace.OneHotInt("cat", 5), stats)
      .map { case (n, c) => c.as(n) }
    ev(s, d).withColumn("cat", cat)
      .select(col("event_id") +: cols: _*)
      .orderBy(col("event_id"))
  }

  private val onehotIntSql =
    """SELECT event_id,
      |  CASE WHEN user_id % 5 = 0 THEN 1.0 ELSE 0.0 END AS cat_onehot_0,
      |  CASE WHEN user_id % 5 = 1 THEN 1.0 ELSE 0.0 END AS cat_onehot_1,
      |  CASE WHEN user_id % 5 = 2 THEN 1.0 ELSE 0.0 END AS cat_onehot_2,
      |  CASE WHEN user_id % 5 = 3 THEN 1.0 ELSE 0.0 END AS cat_onehot_3,
      |  CASE WHEN user_id % 5 = 4 THEN 1.0 ELSE 0.0 END AS cat_onehot_4
      |FROM events ORDER BY event_id""".stripMargin

  // ========================================================================
  // §2.7 onehot_string — vocab-learned one-hot in long (row-per-vocab-entry)
  // form: dynamic vocabulary without dynamic column names, so the oracle
  // stays plain SQL. The wide form is exercised in ScalaTest. The vocab
  // side of the cross join is tiny → broadcast NL join, no shuffle.
  // ========================================================================
  def onehotString(s: SparkSession, d: String): DataFrame = {
    val e = ev(s, d)
    val vocab = e.select(col("event_type").as("vocab")).distinct()
    e.crossJoin(broadcast(vocab))
      .select(col("event_id"), col("vocab"),
        when(col("event_type") === col("vocab"), 1.0).otherwise(0.0).as("indicator"))
      .orderBy(col("event_id"), col("vocab"))
  }

  private val onehotStringSql =
    """SELECT e.event_id, v.vocab,
      |  CASE WHEN e.event_type = v.vocab THEN 1.0 ELSE 0.0 END AS indicator
      |FROM events e CROSS JOIN (SELECT DISTINCT event_type AS vocab FROM events) v
      |ORDER BY e.event_id, v.vocab""".stripMargin

  // ========================================================================
  // §2.7 rescale_apply — min-max rescale with stats from a broadcast
  // single-row aggregate (FeatureSpace float_rescaled, datapipeline.py:293-295).
  // ========================================================================
  def rescaleApply(s: SparkSession, d: String): DataFrame = {
    val e = ev(s, d)
    val stats = e.agg(min(col("value")).as("mn"), max(col("value")).as("mx"))
    e.crossJoin(broadcast(stats))
      .select(col("event_id"),
        ((col("value") - col("mn")) / (col("mx") - col("mn"))).as("value_rescaled"))
      .orderBy(col("event_id"))
  }

  private val rescaleApplySql =
    """SELECT event_id, (value - mn) / (mx - mn) AS value_rescaled
      |FROM events CROSS JOIN (SELECT min(value) AS mn, max(value) AS mx FROM events)
      |ORDER BY event_id""".stripMargin

  // ========================================================================
  // §2.4 agg_min_max — per-group min/max (FeatureSpace adapt stats for
  // rescaled mode). Exact: min/max of doubles is order-independent.
  // ========================================================================
  def aggMinMax(s: SparkSession, d: String): DataFrame =
    ev(s, d).groupBy(col("event_type"))
      .agg(min(col("value")).as("min_value"), max(col("value")).as("max_value"),
           count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  private val aggMinMaxSql =
    """SELECT event_type, min(value) AS min_value, max(value) AS max_value, count(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ========================================================================
  // §2.7 vector_pack — stack columns into a dense vector (tfdataset.py:54-59);
  // compared in exploded (event_id, pos, v) form so the oracle needs no
  // array machinery. posexplode keeps the operator distributed.
  // ========================================================================
  def vectorPack(s: SparkSession, d: String): DataFrame = {
    val packed = ev(s, d).select(col("event_id"),
      array(col("value"), col("user_id").cast("double"), epochS.cast("double")).as("vec"))
    packed.select(col("event_id"), posexplode(col("vec")).as(Seq("pos", "v")))
      .select(col("event_id"), col("pos").cast("long").as("pos"), col("v"))
      .orderBy(col("event_id"), col("pos"))
  }

  private val vectorPackSql =
    """SELECT event_id, pos, v FROM (
      |  SELECT event_id, CAST(0 AS BIGINT) AS pos, value AS v FROM events
      |  UNION ALL
      |  SELECT event_id, 1, CAST(user_id AS DOUBLE) FROM events
      |  UNION ALL
      |  SELECT event_id, 2, CAST(CAST(floor(epoch_us(ts) / 1000000) AS BIGINT) AS DOUBLE) FROM events
      |) ORDER BY event_id, pos""".stripMargin

  // ========================================================================
  // §2.3 feature_concat — horizontal concat of two feature vectors
  // (concatenate_dataset_features, tfdataset.py:163-195): both branches are
  // columns of ONE DataFrame — never a positional zip of two scans.
  // ========================================================================
  def featureConcat(s: SparkSession, d: String): DataFrame = {
    val a = array(col("value"), col("value") * 2.0)
    val b = array(col("user_id").cast("double"))
    ev(s, d).select(col("event_id"), concat(a, b).as("vec"))
      .select(col("event_id"), posexplode(col("vec")).as(Seq("pos", "v")))
      .select(col("event_id"), col("pos").cast("long").as("pos"), col("v"))
      .orderBy(col("event_id"), col("pos"))
  }

  private val featureConcatSql =
    """SELECT event_id, pos, v FROM (
      |  SELECT event_id, CAST(0 AS BIGINT) AS pos, value AS v FROM events
      |  UNION ALL
      |  SELECT event_id, 1, value * 2.0 FROM events
      |  UNION ALL
      |  SELECT event_id, 2, CAST(user_id AS DOUBLE) FROM events
      |) ORDER BY event_id, pos""".stripMargin

  // ========================================================================
  // extension: json_extract_props — typed extraction from the events.props
  // JSON string (natural extension per SURVEY §2.7; the reference has no
  // JSON functions). Spark uses the native JSON path expression; the
  // oracle reaches the same value via regexp to avoid DuckDB extension
  // loading in the offline gate.
  // ========================================================================
  def jsonExtractProps(s: SparkSession, d: String): DataFrame =
    ev(s, d).select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .orderBy(col("event_id"))

  private val jsonExtractPropsSql =
    """SELECT event_id, CAST(regexp_extract(props, '([0-9]+)', 1) AS INT) AS k
      |FROM events ORDER BY event_id""".stripMargin

  // ========================================================================
  // §2.8 featurespace_full — adapt + apply end-to-end through the
  // FeatureSpace API: normalized value, rescaled value, depth-5 int
  // one-hot of user_id%5, reduced-phase cyclical hour pair. One adapt
  // aggregation pass -> literal stats -> pure-expression apply.
  // ========================================================================
  def featurespaceFull(s: SparkSession, d: String): DataFrame = {
    import FeatureSpace._
    val e = ev(s, d).withColumn("cat", (col("user_id") % 5).cast("int"))
    val specs = Seq(Normalized("value"), Rescaled("value"), OneHotInt("cat", 5))
    val stats = FeatureSpace.adapt(e, specs)
    val vStats = stats.numeric("value")
    val (sh, ch) = Cyclical.pairReduced(epochUs, Cyclical.SecondsPerHour)
    e.select(
        col("event_id"),
        round((col("value") - lit(vStats.mean)) / lit(math.sqrt(vStats.varPop)), 4).as("value_norm"),
        ((col("value") - lit(vStats.min)) / lit(vStats.max - vStats.min)).as("value_resc"),
        (col("cat") === 0).cast("double").as("cat_onehot_0"),
        (col("cat") === 1).cast("double").as("cat_onehot_1"),
        (col("cat") === 2).cast("double").as("cat_onehot_2"),
        (col("cat") === 3).cast("double").as("cat_onehot_3"),
        (col("cat") === 4).cast("double").as("cat_onehot_4"),
        round(sh, 6).as("sin_hour"), round(ch, 6).as("cos_hour"))
      .orderBy(col("event_id"))
  }

  private val featurespaceFullSql =
    """SELECT event_id,
      |  round((value - m) / sd, 4) AS value_norm,
      |  (value - mn) / (mx - mn) AS value_resc,
      |  CAST(user_id % 5 = 0 AS DOUBLE) AS cat_onehot_0,
      |  CAST(user_id % 5 = 1 AS DOUBLE) AS cat_onehot_1,
      |  CAST(user_id % 5 = 2 AS DOUBLE) AS cat_onehot_2,
      |  CAST(user_id % 5 = 3 AS DOUBLE) AS cat_onehot_3,
      |  CAST(user_id % 5 = 4 AS DOUBLE) AS cat_onehot_4,
      |  round(sin((epoch_us(ts) % 3600000000) * (2 * pi() / 3600000000.0)), 6) AS sin_hour,
      |  round(cos((epoch_us(ts) % 3600000000) * (2 * pi() / 3600000000.0)), 6) AS cos_hour
      |FROM events CROSS JOIN
      |  (SELECT avg(value) AS m, stddev_pop(value) AS sd,
      |          min(value) AS mn, max(value) AS mx FROM events)
      |ORDER BY event_id""".stripMargin

  // ========================================================================
  // §2.1 plot_prep — the plot sink's engine half (reference
  // plot_cyclical_time_features/plot_dataset draw feature columns vs the
  // sample index): a bounded min/max-decimated envelope — 100 buckets
  // over the event_id span, per-bucket mean/min/max of the hour+day
  // cyclical encodings. Pure integer bucket arithmetic against a
  // broadcast 1-row span, one map-side-combined aggregation; output size
  // is features × buckets regardless of input size. Rendering stays
  // outside the engine.
  // ========================================================================
  def plotPrep(s: SparkSession, d: String): DataFrame = {
    val (sh, ch) = Cyclical.pairReduced(col("e_us"), Cyclical.SecondsPerHour)
    val (sd, cd) = Cyclical.pairReduced(col("e_us"), Cyclical.SecondsPerDay)
    val src = ev(s, d).select(col("event_id"), epochUs.as("e_us"))
    PlotPrep.envelope(src, "event_id",
        Seq("sin_hour" -> sh, "cos_hour" -> ch, "sin_day" -> sd, "cos_day" -> cd),
        nBuckets = 100)
      .orderBy(col("feature"), col("bucket"))
  }

  private val plotPrepSql =
    """WITH src AS (SELECT event_id, epoch_us(ts) AS e_us FROM events),
      |sp AS (SELECT min(event_id) AS mn, max(event_id) AS mx FROM src),
      |b AS (
      |  SELECT ((event_id - mn) * 100) // (mx - mn + 1) AS bucket,
      |    sin((e_us % 3600000000) * (2 * pi() / 3600000000.0)) AS sin_hour,
      |    cos((e_us % 3600000000) * (2 * pi() / 3600000000.0)) AS cos_hour,
      |    sin((e_us % 86400000000) * (2 * pi() / 86400000000.0)) AS sin_day,
      |    cos((e_us % 86400000000) * (2 * pi() / 86400000000.0)) AS cos_day
      |  FROM src, sp),
      |u AS (
      |  SELECT bucket, 'sin_hour' AS feature, sin_hour AS v FROM b
      |  UNION ALL SELECT bucket, 'cos_hour', cos_hour FROM b
      |  UNION ALL SELECT bucket, 'sin_day', sin_day FROM b
      |  UNION ALL SELECT bucket, 'cos_day', cos_day FROM b)
      |SELECT feature, CAST(bucket AS BIGINT) AS bucket,
      |  round(avg(v), 6) AS mean, round(min(v), 6) AS vmin,
      |  round(max(v), 6) AS vmax, count(*) AS n
      |FROM u GROUP BY feature, bucket
      |ORDER BY feature, bucket""".stripMargin

  // ========================================================================
  // quantile_bucket — exact equal-frequency discretizer (the sklearn
  // KBinsDiscretizer(strategy='quantile') / pandas qcut feature): decile
  // buckets of l_extendedprice with per-bucket population and value
  // range. Boundary k (k=1..9) is the smallest value whose cumulative
  // count reaches ⌈k·n/10⌉ — a DISCRETE (type-1) quantile, chosen over
  // interpolated percentiles because every boundary is then an actual
  // data value and everything stays exact integer cents: no
  // interpolation arithmetic to match cross-engine. No boundary
  // relation is ever materialized: a value's bucket is CLOSED-FORM from
  // its own cumulative rank — the #(boundaries strictly below v) equals
  // #{k : prev_cum·10 ≥ k·n} = min(9, ⌊prev_cum·10/n⌋) where prev_cum
  // = cum − cnt (the rank just before v's first occurrence) — pure
  // ceil-free integer division, ties never straddle buckets.
  //
  // Scale shape: the corpus collapses to the DISTINCT-cents histogram
  // (ONE map-side-combined agg), and the cumulative rank over it is
  // TWO-LEVEL — a partition-friendly prefix sum, because 2-decimal
  // prices are nearly unique and a naive `sum OVER (ORDER BY cents)`
  // would be a single-task sort of the whole histogram (≈ the corpus).
  // Level 1: 65536-cent coarse chunks aggregate STRAIGHT off the scan
  // to a ≤ domain/65536-row relation whose running totals (exclusive
  // offset + grand total) ARE allowed a single-partition window
  // (hundreds of rows, flat in corpus size); level 2: within-chunk
  // cumulative sums run under a window KEYED by chunk; global cum =
  // broadcast chunk offset + local cum. The histogram is evaluated
  // once — bucket assignment and the final rollup are projections over
  // the same windowed relation.
  // ========================================================================
  private val QBuckets = 10

  def quantileBucket(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
    val li = Tables.lineitem(s, d)
      .select(cents.as("cents"), shiftright(cents, 16).as("chunk"))
    val wch = Window.orderBy(col("chunk"))
    val offs = li.groupBy(col("chunk")).agg(count(lit(1)).as("ctot"))
      .select(col("chunk"),
        coalesce(sum(col("ctot")).over(wch.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)).as("coff"),
        sum(col("ctot")).over(wch.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)).as("n"))
    val wloc = Window.partitionBy(col("chunk")).orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, 0)
    li.groupBy(col("chunk"), col("cents")).agg(count(lit(1)).as("cnt"))
      .withColumn("lcum", sum(col("cnt")).over(wloc))
      .join(broadcast(offs), Seq("chunk"))
      .select(col("cents"), col("cnt"),
        (lit(1) + least(lit(QBuckets - 1).cast("long"),
          expr(s"((coff + lcum - cnt) * $QBuckets) div n"))).as("bucket"))
      .groupBy(col("bucket"))
      .agg(sum(col("cnt")).as("n"),
        (min(col("cents")) / lit(100.0)).as("lo"),
        (max(col("cents")) / lit(100.0)).as("hi"))
      .orderBy(col("bucket"))
  }

  private val quantileBucketSql =
    s"""WITH li AS (
       |  SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
       |  FROM lineitem),
       |dv AS (SELECT cents, count(*) AS cnt FROM li GROUP BY cents),
       |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM dv),
       |cum AS (
       |  SELECT cents, cnt, CAST(sum(cnt) OVER (ORDER BY cents) AS BIGINT) AS cum
       |  FROM dv),
       |bkt AS (
       |  SELECT cents, cnt,
       |    1 + least(${QBuckets - 1}, ((cum - cnt) * $QBuckets) // n) AS bucket
       |  FROM cum, tot)
       |SELECT CAST(bucket AS BIGINT) AS bucket, CAST(sum(cnt) AS BIGINT) AS n,
       |  min(cents) / 100.0 AS lo, max(cents) / 100.0 AS hi
       |FROM bkt GROUP BY bucket ORDER BY bucket""".stripMargin

  val queries: Map[String, Q] = Map(
    "quantile_bucket" -> (quantileBucket _),
    "cyclical_features" -> (cyclicalFeatures _),
    "plot_prep" -> (plotPrep _),
    "onehot_int" -> (onehotInt _),
    "onehot_string" -> (onehotString _),
    "rescale_apply" -> (rescaleApply _),
    "agg_min_max" -> (aggMinMax _),
    "vector_pack" -> (vectorPack _),
    "feature_concat" -> (featureConcat _),
    "json_extract_props" -> (jsonExtractProps _),
    "featurespace_full" -> (featurespaceFull _),
  )

  val oracleSql: Map[String, String] = Map(
    "quantile_bucket" -> quantileBucketSql,
    "cyclical_features" -> cyclicalFeaturesSql,
    "plot_prep" -> plotPrepSql,
    "onehot_int" -> onehotIntSql,
    "onehot_string" -> onehotStringSql,
    "rescale_apply" -> rescaleApplySql,
    "agg_min_max" -> aggMinMaxSql,
    "vector_pack" -> vectorPackSql,
    "feature_concat" -> featureConcatSql,
    "json_extract_props" -> jsonExtractPropsSql,
    "featurespace_full" -> featurespaceFullSql,
  )
}
