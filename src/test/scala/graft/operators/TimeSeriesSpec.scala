package graft.operators

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private val w = Window.partitionBy(col("k")).orderBy(col("t"))

  test("ewmaBounded matches the hand-unrolled recurrence on a short series") {
    val df = Seq(("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 3L, 40.0))
      .toDF("k", "t", "v")
    val got = df.select(col("t"),
        TimeSeries.ewmaBounded(col("v"), w, lookback = 8, decay = 0.5).as("e"))
      .orderBy(col("t")).as[(Long, Double)].collect()
    // t=1: 10/1; t=2: (20 + .5*10)/1.5; t=3: (40 + .5*20 + .25*10)/1.75
    assert(got(0)._2 === 10.0)
    assert(math.abs(got(1)._2 - 25.0 / 1.5) < 1e-12)
    assert(math.abs(got(2)._2 - 52.5 / 1.75) < 1e-12)
  }

  test("ewmaBounded renormalizes at series start instead of biasing toward 0") {
    val df = Seq(("a", 1L, 7.0)).toDF("k", "t", "v")
    val got = df.select(TimeSeries.ewmaBounded(col("v"), w, 8, 0.7)).as[Double].head()
    assert(got === 7.0) // single point: EWMA is the point itself
  }

  test("ewmaBoundedSql is generated with the same weights and term order") {
    val sql = TimeSeries.ewmaBoundedSql("value", "(PARTITION BY k ORDER BY t)", 3, 0.7)
    // j=0 term has no lag; weight literals are exact double reprs
    assert(sql.contains(s"CAST(${math.pow(0.7, 2)} AS DOUBLE)"), sql)
    assert(sql.indexOf("CASE WHEN value IS NOT NULL") <
      sql.indexOf("lag(value, 1)"), sql)
  }

  test("rollingZScore excludes the current row and respects minN") {
    // 9 constant readings then a spike: the spike's trailing frame is the
    // 9 constants -> sd = 0 -> null z (guard), so plant variance instead.
    val base = (1 to 9).map(i => ("a", i.toLong, if (i % 2 == 0) 10.0 else 12.0))
    val df = (base :+ (("a", 10L, 100.0))).toDF("k", "t", "v")
    val z = df.select(col("t"),
        TimeSeries.rollingZScore(col("v"), w, lookback = 20, minN = 8).as("z"))
      .orderBy(col("t")).as[(Long, Option[Double])].collect()
    // rows 1..8 have < 8 trailing points -> null
    assert(z.take(8).forall(_._2.isEmpty))
    // row 10 judged against rows 1..9 only (mean ~11, sd ~1.05): huge z
    assert(z.last._2.exists(_ > 10.0))
    // and the spike itself is NOT in its own frame: z of row 10 computed
    // from trailing stats, so z >> (100-20)/80-style self-damped values
    assert(z(8)._2.exists(v => math.abs(v) < 2.0)) // row 9 is ordinary
  }

  test("ts family window expressions fuse into ONE Window exec per spec") {
    // ts_zscore_anomaly computes mu/sd/n over the same frame: one Window
    val p = graft.queries.TsQueries.tsZscoreAnomaly(spark, sf)
      .queryExecution.explainString(FormattedMode)
    val windows = p.linesIterator.count(_.matches("^\\(\\d+\\) Window.*"))
    assert(windows == 1, p)
  }

  test("ts_autocorr reuses the window's shuffle for the groupBy (no second exchange on user_id)") {
    val p = graft.queries.TsQueries.tsAutocorr(spark, sf)
      .queryExecution.explainString(FormattedMode)
    val exchanges = p.linesIterator.filter(_.contains("Exchange hashpartitioning(user_id")).size
    assert(exchanges <= 1, p)
  }

  test("skew_report flags the planted hot key first with exact share") {
    val rows = graft.queries.TsQueries.skewReport(spark, sf).collect()
    assert(rows.length == 5)
    // descending by count, exact integer counts, shares sum below 100
    val cnts = rows.map(_.getLong(1))
    assert(cnts.sameElements(cnts.sortBy(-_)))
    val shares = rows.map(_.getDouble(2))
    assert(shares.forall(s => s > 0 && s < 100))
    // skew_ratio = cnt * n_keys / total: > 1 for above-average keys
    assert(rows.map(_.getDouble(3)).forall(_ >= 1.0))
  }
}
