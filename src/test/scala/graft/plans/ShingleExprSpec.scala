package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables
import graft.text.TextOps

/** Cross-checks the one-pass shingle expressions against the composed
  * interpreted reference (`maxMultiplicity(shinglesN)` /
  * `distinctCount(shinglesN)`) they replaced on the repetition paths.
  */
class ShingleExprSpec extends SparkSpec {

  test("MaxShingleMultiplicity matches maxMultiplicity(shinglesN) on the real corpus") {
    val toks = Tables.documents(spark, sf)
      .select(TextOps.tokens(col("text")).as("toks"))
    Seq(2, 3).foreach { n =>
      val diff = toks.select(
          (MaxShingleMultiplicity(col("toks"), n) ===
            TextOps.maxMultiplicity(TextOps.shinglesN(col("toks"), n))).as("same"))
        .filter(!col("same")).count()
      assert(diff == 0, s"n=$n")
    }
  }

  test("DistinctShingleCount matches distinctCount(shinglesN) on the real corpus") {
    val toks = Tables.documents(spark, sf)
      .select(TextOps.tokens(col("text")).as("toks"))
    Seq(3, 4).foreach { n =>
      val diff = toks.select(
          (DistinctShingleCount(col("toks"), n) ===
            TextOps.distinctCount(TextOps.shinglesN(col("toks"), n))).as("same"))
        .filter(!col("same")).count()
      assert(diff == 0, s"n=$n")
    }
  }

  test("edges: null array -> null, short array -> 0, null-element windows skipped, ties") {
    val df = spark.sql(
      """SELECT CAST(NULL AS ARRAY<STRING>) AS nil,
        |       array('a') AS short,
        |       array('a', CAST(NULL AS STRING), 'a', 'b', 'a', 'b') AS holey,
        |       array('x', 'y', 'x', 'y', 'x') AS tied""".stripMargin)
    val r = df.select(
      MaxShingleMultiplicity(col("nil"), 2).as("m_nil"),
      MaxShingleMultiplicity(col("short"), 2).as("m_short"),
      MaxShingleMultiplicity(col("holey"), 2).as("m_holey"),
      MaxShingleMultiplicity(col("tied"), 2).as("m_tied"),
      DistinctShingleCount(col("nil"), 2).as("d_nil"),
      DistinctShingleCount(col("short"), 2).as("d_short"),
      DistinctShingleCount(col("holey"), 2).as("d_holey"),
      DistinctShingleCount(col("tied"), 2).as("d_tied")).head()
    assert(r.isNullAt(0))
    assert(r.getLong(1) == 0L)
    // holey windows: [a,null] [null,a] skipped; "a b" twice, "b a" once
    assert(r.getLong(2) == 2L)
    // tied: "x y" twice, "y x" twice -> max 2
    assert(r.getLong(3) == 2L)
    assert(r.isNullAt(4))
    assert(r.getLong(5) == 0L)
    assert(r.getLong(6) == 2L) // {"a b", "b a"}
    assert(r.getLong(7) == 2L) // {"x y", "y x"}
  }

  test("both expressions stay inside WholeStageCodegen (no interpreted fallback)") {
    val df = Tables.documents(spark, sf)
      .select(TextOps.tokens(col("text")).as("toks"))
      .select(MaxShingleMultiplicity(col("toks"), 2).as("m"),
        DistinctShingleCount(col("toks"), 3).as("d"))
      .filter(col("m") >= 0 && col("d") >= 0)
    val plan = df.queryExecution.executedPlan.toString
    val bare = plan.linesIterator
      .map(_.replaceAll("^[\\s+:|-]*", "")) // strip tree-drawing prefix
      .filter(n => n.startsWith("Project") || n.startsWith("Filter"))
      .toSeq
    assert(bare.isEmpty, plan) // codegen'd nodes render as "*(n) Project ..."
    assert(df.count() > 0)
  }
}
