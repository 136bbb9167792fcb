package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

/** Value contracts for the sketch queries. The declared queries are
  * oracle-verified (they emit exact stats + in-Spark bound checks that
  * DuckDB expects as literal 1s); this spec keeps the TIGHTER raw
  * bounds on the underlying estimates plus the merge-invariance
  * property the oracle shape cannot express.
  */
class SketchSpec extends SparkSpec {

  test("sketch_distinct: HLL estimate within the configured rsd of exact, per group") {
    val rows = RelQueries.sketchDistinctRaw(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_users").toDouble
      val exact = r.getAs[Long]("exact_users").toDouble
      // rsd = 0.02 is a standard deviation, not a hard cap: allow 4 sigma
      assert(math.abs(approx - exact) / exact <= 0.08,
        s"${r.getAs[String]("event_type")}: approx=$approx exact=$exact")
    }
  }

  test("sketch_distinct query reports every group inside the 3-sigma oracle bound") {
    val rows = RelQueries.queries("sketch_distinct")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("bound_ok") == 1L,
      s"${r.getAs[String]("event_type")} outside bound"))
  }

  test("sketch_quantiles: GK ranks within 1/accuracy of the true ranks") {
    val ev = Tables.events(spark, sf).select("event_type", "value").cache()
    try {
      val approx = RelQueries.sketchQuantilesRaw(spark, sf).collect()
      approx.foreach { r =>
        val et = r.getAs[String]("event_type")
        val grp = ev.filter(col("event_type") === et)
        val n = grp.count()
        for ((p, colName) <- Seq(0.5 -> "p50", 0.95 -> "p95", 0.99 -> "p99")) {
          val v = r.getAs[Double](colName)
          // true rank of the returned value; accuracy=10000 → ±n/10000 ranks
          val rank = grp.filter(col("value") <= v).count().toDouble
          val tol = math.max(n / 10000.0, 1.0) + 1.0
          assert(math.abs(rank - p * n) <= tol,
            s"$et $colName: value=$v rank=$rank target=${p * n} ±$tol (n=$n)")
        }
      }
    } finally { ev.unpersist(false); () }
  }

  test("sketch_quantiles query reports every group/percentile inside the rank bound") {
    val rows = RelQueries.queries("sketch_quantiles")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      for (c <- Seq("p50_ok", "p95_ok", "p99_ok"))
        assert(r.getAs[Long](c) == 1L, s"${r.getAs[String]("event_type")} $c")
    }
  }

  test("sketches are order- and partitioning-invariant (mergeable aggregation)") {
    val a = RelQueries.sketchDistinctRaw(spark, sf)
      .select("event_type", "approx_users")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = Tables.events(spark, sf).repartition(17)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), rsd = 0.02).as("approx_users"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a.keySet == b.keySet)
    // HLL merges are exact unions of registers: same inputs → same estimate
    a.foreach { case (k, v) => assert(b(k) == v, s"$k: $v vs ${b(k)}") }
  }
}
