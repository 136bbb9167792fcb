package graft.sim

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Build-once/query-many index persistence: the reloaded artifacts must
  * be bit-identical to the learned ones, and the persisted-index search
  * path must return exactly the in-session results.
  */
class AnnPersistSpec extends SparkSpec {

  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("ann_ivf_persisted returns the identical top-k as ann_ivf_kmeans") {
    val persisted = graft.SparkEntry.queries("ann_ivf_persisted")(spark, sf).collect()
    val inSession = graft.SparkEntry.queries("ann_ivf_kmeans")(spark, sf).collect()
    assert(persisted.nonEmpty)
    assert(persisted.sameElements(inSession))
  }

  test("IVF and PQ-subspace codebooks round-trip bit-exactly through a table") {
    // full-width codebook (the IVF coarse quantizer shape)
    val full = Similarity.collectCentroids(
      Similarity.kmeansCentroids(emb.select(col("embedding")), "embedding", 3, 1))
    Similarity.saveCentroids(spark, full, "graft_test_codebook_full")
    assert(Similarity.loadCentroids(spark, "graft_test_codebook_full") == full)
    // 16-dim slice codebook (the PQ subspace shape)
    val sub = Similarity.collectCentroids(
      Similarity.kmeansCentroids(
        emb.select(slice(col("embedding"), 17, 16).as("sub")), "sub", 3, 1))
    Similarity.saveCentroids(spark, sub, "graft_test_codebook_sub")
    assert(Similarity.loadCentroids(spark, "graft_test_codebook_sub") == sub)
    // exactness matters because assignment argmax near ties depends on
    // every mantissa bit: double equality above IS the assignment parity
    assert(full.forall(c => c.cvec.nonEmpty && !c.cnrm.isNaN))
  }

  test("SQ8 scale constant round-trips bit-exactly through a table") {
    import spark.implicits._
    val scale = emb
      .select(aggregate(col("embedding"), lit(0.0d),
        (acc, x) => greatest(acc, abs(x.cast("double")))).as("m"))
      .agg(max(col("m"))).head().getDouble(0)
    graft.operators.Scale.saveTable(Seq(scale).toDF("maxabs"), "graft_test_sq8_scale")
    val back = spark.table("graft_test_sq8_scale").head().getDouble(0)
    assert(java.lang.Double.doubleToLongBits(back) ==
      java.lang.Double.doubleToLongBits(scale))
  }
}
