package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.TimeFns
import graft.sources.Tables

class AsOfJoinSpec extends SparkSpec {

  private def purchases = Tables.events(spark, sf)
    .filter(col("event_type") === "purchase")
    .select(col("event_id"), col("user_id"), col("value"),
      TimeFns.epochMicros(col("ts")).as("t_us"))

  private def clicks = Tables.events(spark, sf)
    .filter(col("event_type") === "click")
    .select(col("user_id"), TimeFns.epochMicros(col("ts")).as("c_us"),
      col("value").as("click_value"))

  test("custom exec plans AsOfJoinExec with exchanges inserted by EnsureRequirements") {
    val j = AsOf.joinLeft(purchases, clicks, "user_id", ("t_us", "c_us"))
    val p = j.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), p)
    assert(p.contains("Exchange hashpartitioning"), p)
    assert(p.contains("Sort ["), p)
    // no dangling attribute references (the `!` marker) — guards the
    // shared-lineage dedup hazard the internal re-alias exists for
    assert(!p.contains("!Exchange") && !p.contains("!Sort"), p)
  }

  test("matches the union+window formulation on real events") {
    val j = AsOf.joinLeft(purchases, clicks, "user_id", ("t_us", "c_us"))
      .select(col("event_id"), col("click_value"))
    val viaWindow = graft.queries.JoinQueries.joinAsof(spark, sf)
      .select(col("event_id"), col("last_click_value").as("click_value"))
    assert(j.count() == viaWindow.count())
    val diff = j.join(viaWindow, Seq("event_id"))
      .filter(!(j("click_value") <=> viaWindow("click_value"))).count()
    assert(diff == 0)
  }

  test("tolerance bounds the lookback") {
    val all = AsOf.joinLeft(purchases, clicks, "user_id", ("t_us", "c_us"))
    val tight = AsOf.joinLeft(purchases, clicks, "user_id", ("t_us", "c_us"),
      toleranceUs = 60L * 1000000)
    val nAll = all.filter(col("click_value").isNotNull).count()
    val nTight = tight.filter(col("click_value").isNotNull).count()
    assert(nTight < nAll)
    assert(tight.count() == all.count()) // left join keeps every purchase
  }

  test("unmatched keys produce null right side") {
    val left = spark.sql(
      "SELECT * FROM VALUES (CAST(99 AS BIGINT), CAST(100 AS BIGINT)) AS t(user_id, t_us)")
    val j = AsOf.joinLeft(left, clicks, "user_id", ("t_us", "c_us"))
    val r = j.collect()
    assert(r.length == 1 && r.head.isNullAt(r.head.fieldIndex("click_value")))
  }

  test("missing column errors name the column") {
    val e = intercept[IllegalArgumentException] {
      AsOf.joinLeft(purchases, clicks, "nope", ("t_us", "c_us"))
    }
    assert(e.getMessage.contains("nope"))
  }
}
