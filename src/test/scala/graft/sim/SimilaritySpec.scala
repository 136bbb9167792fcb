package graft.sim

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  lazy val vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f)),
    (2L, Array(0.9f, 0.1f, 0.0f)), // close to 1
    (3L, Array(0.0f, 1.0f, 0.0f)),
    (4L, Array(0.0f, 0.0f, 1.0f)),
    (5L, Array(-1.0f, 0.0f, 0.0f)) // antipode of 1
  ).toDF("vec_id", "embedding").cache()

  test("cosine: identity=1, orthogonal=0, antipodal=-1") {
    val r = vecs.filter($"vec_id" === 1).crossJoin(
        vecs.select($"vec_id".as("b_id"), $"embedding".as("b")))
      .select($"b_id", Similarity.cosine($"embedding", $"b").as("c"))
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(r(1L) - 1.0) < 1e-9)
    assert(math.abs(r(3L)) < 1e-9)
    assert(math.abs(r(5L) + 1.0) < 1e-9)
  }

  test("bruteForceTopK ranks the nearest first and excludes self") {
    val top = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", $"vec_id" === 1, 2)
      .orderBy("rank").collect()
    assert(top.length == 2)
    assert(top(0).getAs[Long]("n_id") == 2L) // closest
    assert(top.forall(_.getAs[Long]("n_id") != 1L))
  }

  test("hyperplane bucketing groups identical vectors and is total over real data") {
    val e = Tables.embeddings(spark, sf)
    val b = e.select(Similarity.hyperplaneBucket(col("embedding"), 8).as("bucket"))
    val n = b.count()
    assert(n == e.count())
    val nb = b.distinct().count()
    assert(nb > 1 && nb <= 256)
  }

  test("lshSearch returns a subset of brute-force results with correct cosines") {
    val e = Tables.embeddings(spark, sf)
    val brute = Similarity.bruteForceTopK(e, "vec_id", "embedding", col("vec_id") < 5, 50)
      .select($"q_id", $"n_id", $"cos").as[(Long, Long, Double)].collect()
      .map { case (q, n, c) => (q, n) -> c }.toMap
    val lsh = Similarity.lshSearch(e, "vec_id", "embedding", col("vec_id") < 5, 8, 50)
      .select($"q_id", $"n_id", $"cos").as[(Long, Long, Double)].collect()
    // every LSH result that brute-force also ranked must agree on cosine
    lsh.foreach { case (q, n, c) =>
      brute.get((q, n)).foreach(bc => assert(math.abs(bc - c) < 1e-9)) }
    assert(lsh.nonEmpty)
  }
}
