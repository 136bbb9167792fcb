package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sim.Similarity
import graft.sources.Tables

class ArrayDotProductSpec extends SparkSpec {

  test("codegen dot product is bit-identical to the aggregate formulation on real embeddings") {
    val e = Tables.embeddings(spark, sf).limit(200)
    val pairs = e.select(col("vec_id").as("a_id"), col("embedding").as("a"))
      .crossJoin(e.select(col("vec_id").as("b_id"), col("embedding").as("b")))
      .filter(col("a_id") < col("b_id")).limit(5000)
    val diff = pairs.select(
        (Similarity.dot(col("a"), col("b")) === Similarity.dotViaAggregate(col("a"), col("b")))
          .as("same"))
      .filter(!col("same")).count()
    assert(diff == 0)
  }

  test("null array -> null; length mismatch -> null; null elements -> 0 contribution") {
    val df = spark.sql(
      """SELECT ArrayDot.* FROM (SELECT 1) CROSS JOIN LATERAL (
        |  SELECT CAST(array(1.0, 2.0) AS ARRAY<DOUBLE>) AS a,
        |         CAST(array(3.0, 4.0) AS ARRAY<DOUBLE>) AS b,
        |         CAST(array(1.0) AS ARRAY<DOUBLE>) AS short,
        |         CAST(NULL AS ARRAY<DOUBLE>) AS nil,
        |         array(CAST(NULL AS DOUBLE), 2.0) AS holey) AS ArrayDot""".stripMargin)
    val r = df.select(
      Similarity.dot(col("a"), col("b")).as("ok"),
      Similarity.dot(col("a"), col("short")).as("mismatch"),
      Similarity.dot(col("a"), col("nil")).as("nullarr"),
      Similarity.dot(col("holey"), col("b")).as("holey")).head()
    assert(r.getDouble(0) == 11.0)
    assert(r.isNullAt(1) && r.isNullAt(2))
    assert(r.getDouble(3) == 8.0) // null elem contributes 0 -> 2*4
  }

  test("mixed element types (float x double, int x long) work") {
    val df = spark.sql(
      """SELECT CAST(array(1.5, 2.5) AS ARRAY<FLOAT>) AS f,
        |       CAST(array(2.0, 4.0) AS ARRAY<DOUBLE>) AS d,
        |       array(1, 2) AS i, CAST(array(3, 4) AS ARRAY<BIGINT>) AS l""".stripMargin)
    val r = df.select(Similarity.dot(col("f"), col("d")),
      Similarity.dot(col("i"), col("l"))).head()
    assert(r.getDouble(0) == 13.0)
    assert(r.getDouble(1) == 11.0)
  }

  test("string arrays are rejected at analysis time") {
    val df = spark.sql("SELECT array('a') AS s, array(1.0) AS d")
    val e = intercept[Exception] {
      df.select(Similarity.dot(col("s"), col("d"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("numeric"))
  }
}
