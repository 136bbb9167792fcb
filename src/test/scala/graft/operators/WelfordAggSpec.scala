package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

class WelfordAggSpec extends SparkSpec {
  import spark.implicits._

  test("typed one-pass stats match avg/var_pop/min/max on real data") {
    val values = Tables.events(spark, sf).select(col("value")).as[Double]
    val got = values.select(WelfordAgg.stats).head()
    val want = Tables.events(spark, sf)
      .agg(count(lit(1)), avg("value"), var_pop("value"), min("value"), max("value")).head()
    assert(got.n == want.getLong(0))
    assert(math.abs(got.mean - want.getDouble(1)) < 1e-9)
    assert(math.abs(got.varPop - want.getDouble(2)) < 1e-6)
    assert(got.min == want.getDouble(3) && got.max == want.getDouble(4))
  }

  test("merge is associative-enough: sharded merge equals single pass") {
    val xs = (1 to 1000).map(i => math.sin(i) * 100)
    val whole = xs.foldLeft(WelfordAgg.zero)(WelfordAgg.update)
    val shards = xs.grouped(137).map(_.foldLeft(WelfordAgg.zero)(WelfordAgg.update))
    val merged = shards.foldLeft(WelfordAgg.zero)(WelfordAgg.merge)
    assert(math.abs(WelfordAgg.finish(whole).varPop - WelfordAgg.finish(merged).varPop) < 1e-9)
    assert(whole.n == merged.n)
  }

  test("empty input yields NaN stats, zero count") {
    val st = WelfordAgg.finish(WelfordAgg.zero)
    assert(st.n == 0 && st.mean.isNaN)
  }

  test("statsUdaf skips nulls like the built-in aggregates") {
    val df = Seq(Some(1.0), None, Some(3.0), None, Some(8.0)).toDF("v")
    val r = df.agg(WelfordAgg.statsUdaf(col("v")).as("s")).select("s.*").head()
    assert(r.getAs[Long]("n") == 3)
    assert(math.abs(r.getAs[Double]("mean") - 4.0) < 1e-12)
    assert(r.getAs[Double]("min") == 1.0 && r.getAs[Double]("max") == 8.0)
  }

  test("FeatureSpace.numericStats one-pass and built-in formulations agree") {
    val df = Tables.events(spark, sf)
      .select(col("value"), (col("value") * 2).as("v2"))
    val w = FeatureSpace.numericStats(df, Seq("value", "v2"), onePass = true)
    val b = FeatureSpace.numericStats(df, Seq("value", "v2"), onePass = false)
    Seq("value", "v2").foreach { c =>
      assert(math.abs(w(c).mean - b(c).mean) < 1e-9)
      assert(math.abs(w(c).varPop - b(c).varPop) < 1e-6 * math.max(1.0, b(c).varPop))
      assert(w(c).min == b(c).min && w(c).max == b(c).max)
    }
  }
}
