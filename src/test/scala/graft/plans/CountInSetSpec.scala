package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables
import graft.text.TextOps

class CountInSetSpec extends SparkSpec {

  private val en = TextOps.LangStopwords.toMap.apply("en")

  test("CountInSet matches the HOF filter formulation on the real corpus") {
    val toks = Tables.documents(spark, sf)
      .select(TextOps.tokens(col("text")).as("toks"))
    val diff = toks.select(
        (CountInSet(col("toks"), en) ===
          size(filter(col("toks"), t => t.isInCollection(en))).cast("long")).as("same"))
      .filter(!col("same")).count()
    assert(diff == 0)
  }

  test("ArrayDistinctCount matches size(array_distinct) on the real corpus") {
    val toks = Tables.documents(spark, sf)
      .select(TextOps.tokens(col("text")).as("toks"))
    val diff = toks.select(
        (ArrayDistinctCount(col("toks")) ===
          size(array_distinct(col("toks"))).cast("long")).as("same"))
      .filter(!col("same")).count()
    assert(diff == 0)
  }

  test("null array -> null; null elements: never match the set, count once as distinct") {
    val df = spark.sql(
      """SELECT CAST(NULL AS ARRAY<STRING>) AS nil,
        |       array('the', CAST(NULL AS STRING), 'the', 'x', CAST(NULL AS STRING)) AS holey,
        |       CAST(array() AS ARRAY<STRING>) AS empty""".stripMargin)
    val r = df.select(
      CountInSet(col("nil"), en).as("c_nil"),
      CountInSet(col("holey"), en).as("c_holey"),
      CountInSet(col("empty"), en).as("c_empty"),
      ArrayDistinctCount(col("nil")).as("d_nil"),
      ArrayDistinctCount(col("holey")).as("d_holey"),
      ArrayDistinctCount(col("empty")).as("d_empty")).head()
    assert(r.isNullAt(0))
    assert(r.getLong(1) == 2L) // 'the' twice; nulls never match
    assert(r.getLong(2) == 0L)
    assert(r.isNullAt(3))
    assert(r.getLong(4) == 3L) // the, x, null-as-one (array_distinct keeps one null)
    assert(r.getLong(5) == 0L)
  }

  test("both expressions stay inside WholeStageCodegen (no interpreted fallback)") {
    val df = Tables.documents(spark, sf)
      .select(TextOps.tokens(col("text")).as("toks"))
      .select(CountInSet(col("toks"), en).as("c"), ArrayDistinctCount(col("toks")).as("d"))
      .filter(col("c") >= 0 && col("d") >= 0)
    val plan = df.queryExecution.executedPlan.toString
    // '*(n)' prefixes mark operators inside a WholeStageCodegen stage; a
    // codegen-incapable expression would leave its Project/Filter bare
    val bare = plan.linesIterator
      .map(_.replaceAll("^[\\s+:|-]*", "")) // strip tree-drawing prefix
      .filter(n => n.startsWith("Project") || n.startsWith("Filter"))
      .toSeq
    assert(bare.isEmpty, plan) // codegen'd nodes render as "*(n) Project ..."
    assert(df.count() > 0)
  }
}
