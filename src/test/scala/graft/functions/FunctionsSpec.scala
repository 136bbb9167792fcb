package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("dtConcat + dtToEpoch roundtrip a known instant (UTC)") {
    val df = Seq(("2023-01-01", "00:00:10")).toDF("d", "t")
    val out = df.select(
      TimeFns.dtToEpoch(TimeFns.dtConcat(col("d"), col("t"))).as("e")).head()
    assert(out.getLong(0) == 1672531210L)
  }

  test("timeBucket floors to the interval grid") {
    val df = Seq(java.sql.Timestamp.valueOf("2023-01-01 00:04:59")).toDF("ts")
    val b = df.select(TimeFns.timeBucket(col("ts"), 300L)).head().getLong(0)
    assert(b == 1672531200L)
  }

  test("convertSeconds decomposes days/minutes/seconds") {
    val df = Seq(90061L).toDF("s") // 1d 1h 1m 1s
    val (d, m, sec) = TimeFns.convertSeconds(col("s"))
    val r = df.select(d.cast("long"), m.cast("long"), sec).head()
    assert(r.getLong(0) == 1L && r.getLong(1) == 61L && r.getLong(2) == 1L)
  }

  test("cyclical pair satisfies sin^2+cos^2=1 and period wraps") {
    val df = Seq(0L, 30L, 60L, 3600L).toDF("e")
    val (s, c) = Cyclical.pair(col("e"), Cyclical.SecondsPerMinute)
    val rows = df.select((s * s + c * c).as("one"), s.as("s")).collect()
    rows.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-12))
  }

  test("pairReduced equals pair up to fp noise (2pi periodicity)") {
    val df = Seq(1704067798L).toDF("e")
    val (s1, _) = Cyclical.pair(col("e"), Cyclical.SecondsPerHour)
    val (s2, _) = Cyclical.pairReduced(col("e") * 1000000L, Cyclical.SecondsPerHour)
    val r = df.select(abs(s1 - s2)).head().getDouble(0)
    assert(r < 1e-6)
  }

  test("reference-pi mode differs from principled pi (documented quirk)") {
    val df = Seq(12345L).toDF("e")
    val (s1, _) = Cyclical.pair(col("e"), Cyclical.SecondsPerDay)
    val (s2, _) = Cyclical.pair(col("e"), Cyclical.SecondsPerDay, Cyclical.ReferencePi)
    val r = df.select(abs(s1 - s2)).head().getDouble(0)
    assert(r > 0.0)
  }
}
