package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables
import graft.sim.Similarity
import graft.text.TextOps

/** The SQL function surface injected by [[GraftExtensions]]: every
  * registered function must (a) resolve from `spark.sql`, (b) agree
  * exactly with its DataFrame-API counterpart, and (c) reject bad
  * arities/parameters at analysis time.
  */
class ExtensionsSpec extends SparkSpec {

  test("graft_dot resolves in SQL and matches the scalar expectation") {
    val r = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .head().getDouble(0)
    assert(r == 32.0)
    // length mismatch -> null (the expression's documented contract)
    assert(spark.sql("SELECT graft_dot(array(1.0D), array(1.0D, 2.0D)) AS d").head().isNullAt(0))
  }

  test("graft_cosine / graft_hyperplane_bucket match the DataFrame API on real embeddings") {
    val e = Tables.embeddings(spark, sf).limit(50)
    e.createOrReplaceTempView("ext_emb")
    val viaSql = spark.sql(
      """SELECT vec_id, round(graft_cosine(embedding, embedding), 9) AS c,
        |  graft_hyperplane_bucket(embedding, 8) AS b,
        |  graft_hyperplane_bucket(embedding, 8, 8) AS b2
        |FROM ext_emb ORDER BY vec_id""".stripMargin).collect()
    val viaDf = e.select(col("vec_id"),
        round(Similarity.cosine(col("embedding"), col("embedding")), 9).as("c"),
        Similarity.hyperplaneBucket(col("embedding"), 8).as("b"),
        Similarity.hyperplaneBucket(col("embedding"), 8, 8).as("b2"))
      .orderBy("vec_id").collect()
    assert(viaSql.toSeq == viaDf.toSeq)
    // self-cosine is 1 up to fp rounding
    viaSql.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-6))
  }

  test("graft_fingerprint matches TextOps.fingerprint (the exact-dedup key) in SQL") {
    val d = Tables.documents(spark, sf).limit(20)
    d.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, graft_fingerprint(text) AS fp FROM ext_docs ORDER BY doc_id").collect()
    val viaDf = d.select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
      .orderBy("doc_id").collect()
    assert(viaSql.toSeq == viaDf.toSeq)
  }

  test("registered functions reject bad arity and non-literal parameters at analysis time") {
    intercept[Exception](spark.sql("SELECT graft_dot(array(1.0D))").collect())
    intercept[Exception](
      spark.sql("SELECT graft_hyperplane_bucket(array(1.0D))").collect())
    // nPlanes must be a literal, not a per-row column
    val err = intercept[Exception] {
      spark.sql("SELECT graft_hyperplane_bucket(array(1.0D), id) FROM range(1)").collect()
    }
    assert(err.getMessage.contains("literal"))
  }

  test("SQL-path graft_dot stays inside WholeStageCodegen") {
    Tables.embeddings(spark, sf).createOrReplaceTempView("ext_emb_cg")
    val df = spark.sql("SELECT sum(graft_dot(embedding, embedding)) FROM ext_emb_cg")
    df.collect() // AQE finalizes the physical plan only on execution
    val finalPlan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // AQE's plan rendering marks each WholeStageCodegen stage "*(n)"
    // (the stages sit inside QueryStageExec leaves, out of collect's
    // reach) — the aggregate over graft_dot must carry the marker
    val rendered = finalPlan.toString
    assert(rendered.contains("*(1) HashAggregate"), s"no codegen'd aggregate in:\n$rendered")
  }
}
