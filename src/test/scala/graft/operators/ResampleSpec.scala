package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables
import graft.functions.TimeFns

class ResampleSpec extends SparkSpec {
  // NOT cached: a cache() of a bare Tables.* relation registers an
  // InMemoryRelation that the shared-session CacheManager substitutes
  // into ANY later plan over the same table — PlanShapeSpec's
  // PushedFilters/ReadSchema asserts then see a cache scan instead of
  // the parquet scan when this suite happens to run first. sf0.001 is
  // small enough that re-reading costs nothing.
  lazy val events = Tables.events(spark, sf)

  test("upsampleRepeat 300->60 expands every row to 5") {
    val n = events.count()
    val up = Resample.upsampleRepeat(events, "ts", 300L, 60L)
    assert(up.count() == n * 5)
  }

  test("upsampleRepeat timestamps are on the 60s grid and span one 300s bucket") {
    val up = Resample.upsampleRepeat(events.limit(50), "ts", 300L, 60L)
    val bad = up.filter(col("ts_up") % 60 =!= 0).count()
    assert(bad == 0)
    val spans = up.groupBy(col("event_id"))
      .agg((max(col("ts_up")) - min(col("ts_up"))).as("span"))
      .filter(col("span") =!= 240).count()
    assert(spans == 0)
  }

  test("downsampleFilter keeps only aligned rows") {
    val down = Resample.downsampleFilter(events, "ts", 60L)
    val bad = down.filter(TimeFns.epochSeconds(col("ts")) % 60 =!= 0).count()
    assert(bad == 0)
    assert(down.count() < events.count())
  }

  test("bucketMean bucket count <= distinct buckets and averages bounded") {
    val bm = Resample.bucketMean(events, "ts", 3600L, Seq("value"))
    val mm = events.agg(min("value"), max("value")).head()
    val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
    val out = bm.agg(min("avg_value"), max("avg_value")).head()
    assert(out.getDouble(0) >= lo && out.getDouble(1) <= hi)
  }

  test("resample dispatcher: equal intervals is a no-op") {
    val same = Resample.resample(events, "ts", 300L, 300L)
    assert(same.count() == events.count())
  }

  test("upsampleLinear: anchors exact, interior points linear between consecutive anchors") {
    // two aligned anchors 300s apart with values 10 and 20: the four
    // interior grid points of the first expansion must read 12, 14, 16, 18
    // (exact halves of exact doubles — no tolerance needed), and the
    // second expansion's trailing points carry 20 forward.
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (1L, 7L, 10.0D, timestamp'2024-01-01 00:00:00'),
        |  (2L, 7L, 20.0D, timestamp'2024-01-01 00:05:00')
        |  AS t(event_id, user_id, value, ts)""".stripMargin)
    val out = Resample.upsampleLinear(df, "ts", "value", 300L, 60L,
        Seq("user_id"), Seq("event_id"))
      .select(col("event_id"), col("ts_up"), col("value_lin"))
      .orderBy(col("ts_up")).collect()
    assert(out.length == 10)
    assert(out.map(_.getDouble(2)).toSeq ==
      Seq(10.0, 12.0, 14.0, 16.0, 18.0, 20.0, 20.0, 20.0, 20.0, 20.0))
  }
}
