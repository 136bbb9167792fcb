package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables
import graft.functions.TimeFns

class ResampleSpec extends SparkSpec {
  lazy val events = Tables.events(spark, sf).cache()

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
}
