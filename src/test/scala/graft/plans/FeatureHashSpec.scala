package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins [[FeatureHashVector]]'s contracts: the codegen'd one-pass vector
  * equals the composable explode+groupBy construction built from the
  * engine-wide md5 hash column functions (the cross-engine definition
  * the oracle renders), and the signed-count invariants hold.
  */
class FeatureHashSpec extends SparkSpec {
  import spark.implicits._

  private val Dims = 32

  test("expression equals the composable hash60-based construction on real corpus text") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), graft.text.TextOps.tokens(col("text")).as("toks"))
      .limit(200).cache()
    val got = docs.select(col("doc_id"),
        FeatureHashVector(col("toks"), Dims).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // composable: one md5 per token via the 56-bit MinHash-family hash
    // (conv of the first 14 hex chars — NOT hash60's 15; and integer
    // `div`, not Column `/`, which is double division)
    val cells = docs.select(col("doc_id"), explode(col("toks")).as("w"))
      .select(col("doc_id"),
        conv(substring(md5(col("w")), 1, 14), 16, 10).cast("long").as("h"))
      .select(col("doc_id"),
        (col("h") % Dims).as("k"),
        when(expr(s"h div $Dims") % 2 === 0, 1L).otherwise(-1L).as("sgn"))
      .groupBy(col("doc_id"), col("k")).agg(sum(col("sgn")).as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1).toInt) -> r.getLong(2)).toMap
    got.foreach { case (id, vec) =>
      assert(vec.size == Dims)
      vec.zipWithIndex.foreach { case (v, k) =>
        assert(v == cells.getOrElse((id, k), 0L), s"doc $id dim $k")
      }
      // signed counts: total absolute mass never exceeds the token count
      val n = docs.filter(col("doc_id") === id).select(size(col("toks")))
        .head().getInt(0)
      assert(vec.map(math.abs).sum <= n)
    }
    assert(got.nonEmpty && got.values.exists(_.exists(_ != 0L)))
    docs.unpersist()
  }

  test("empty and null-free behavior: no tokens -> zero vector, bucket 0 downstream") {
    val df = Seq((1L, Seq.empty[String]), (2L, Seq("a", "a", "b")))
      .toDF("id", "toks")
      .select(col("id"), FeatureHashVector(col("toks"), Dims).as("v"),
        HyperplaneBuckets.buckets(FeatureHashVector(col("toks"), Dims), 8).as("b"))
    val rows = df.collect().map(r => r.getLong(0) -> (r.getSeq[Long](1), r.getLong(2))).toMap
    assert(rows(1L)._1.forall(_ == 0L) && rows(1L)._2 == 0L)
    // identical tokens accumulate in one dimension with one sign
    assert(rows(2L)._1.map(math.abs).max == 2L)
  }
}
