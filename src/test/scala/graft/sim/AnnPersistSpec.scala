package graft.sim

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Build-once/query-many index persistence: the reloaded artifacts must
  * be bit-identical to the learned ones, and the persisted-index search
  * path must return exactly the in-session results.
  */
class AnnPersistSpec extends SparkSpec {

  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("ann_ivf_persisted returns the identical top-k as the in-session adaptive ann_ivf_search") {
    // the persisted artifact IS the adaptive serving index (r20): same
    // graphCents codebook, same adaptiveNProbe budget — so reloading and
    // searching must reproduce the in-session serving key exactly
    val persisted = graft.SparkEntry.queries("ann_ivf_persisted")(spark, sf).collect()
    val inSession = graft.SparkEntry.queries("ann_ivf_search")(spark, sf).collect()
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

  test("IVF-PQ index persists: codebooks + coded corpus round-trip, search identical") {
    import graft.queries.SimQueries
    val subs = 0 until SimQueries.PqSubspaces
    // learn the composed index in-session (the adaptive-plane coarse
    // codebook the IVF-PQ keys serve with)
    val coarse = SimQueries.graphCents(spark, sf)
    val books = subs.map(j => SimQueries.ivfPqCentroids(spark, sf, j))
    // persist: coarse codebook, 4 residual codebooks, and the CODED
    // corpus (cell + 4 small codes per vector — the compressed artifact)
    // bucketed by cell so a probe reads co-located buckets
    Similarity.saveCentroids(spark, coarse, "graft_test_ivfpq_coarse")
    subs.foreach(j => Similarity.saveCentroids(spark, books(j), s"graft_test_ivfpq_book$j"))
    graft.operators.Scale.writeBucketed(
      SimQueries.ivfPqCodes(spark, sf), "graft_test_ivfpq_codes", "cell", 4)
    // reload EVERYTHING and search from persisted artifacts only
    val coarseBack = Similarity.loadCentroids(spark, "graft_test_ivfpq_coarse")
    val booksBack = subs.map(j => Similarity.loadCentroids(spark, s"graft_test_ivfpq_book$j"))
    assert(coarseBack == coarse && booksBack == books) // bit-exact codebooks
    val recon = SimQueries.ivfPqDecode(
      spark.table("graft_test_ivfpq_codes"), coarseBack, booksBack)
    val persisted = SimQueries.ivfPqSearch(spark, emb, recon, coarseBack,
      Similarity.adaptiveNProbe(coarseBack.size)).collect()
    val inSession = graft.SparkEntry.queries("ann_ivf_pq")(spark, sf).collect()
    assert(persisted.nonEmpty)
    assert(persisted.sameElements(inSession))
  }

  test("incremental IVF append equals re-ingesting the whole union") {
    import org.apache.spark.sql.functions.expr
    import graft.queries.SimQueries
    // the persisted base+appended index path
    val viaAppend = graft.SparkEntry.queries("ann_ivf_append")(spark, sf).collect()
    // re-ingest: learn on the SAME base slice, assign the whole corpus
    // in one pass, search directly — no tables. Learning is
    // deterministic, so this reproduces the persisted codebook exactly.
    val base = emb.filter(expr("vec_id % 5 <> 4"))
    val cents = Similarity.collectCentroids(
      Similarity.kmeansCentroids(base, "embedding",
        Similarity.adaptivePlanes(base.count()), 1))
    val union = emb.withColumn("kcell",
      Similarity.nearestCentroid(col("embedding"), cents))
    val direct = Similarity.ivfSearch(union, "vec_id", "embedding", "kcell",
        col("vec_id") < 10, k = 5,
        nProbe = Similarity.adaptiveNProbe(cents.size),
        centroids = Some(Similarity.localizeCentroids(spark, cents)))
      .orderBy(col("q_id"), col("rank")).collect()
    assert(viaAppend.nonEmpty)
    assert(viaAppend.sameElements(direct))
    // and the appended rows really are in the bucketed corpus: the
    // index serves increment-slice neighbors too
    assert(viaAppend.exists(r => r.getLong(2) % 5 == 4),
      "no increment-slice vector in any top-k — append not visible")
  }

  test("IVF-PQ codes append incrementally: base+appended equals one-pass encode") {
    import org.apache.spark.sql.functions.expr
    import graft.queries.SimQueries
    val subs = 0 until SimQueries.PqSubspaces
    val coarse = SimQueries.graphCents(spark, sf)
    val books = subs.map(j => SimQueries.ivfPqCentroids(spark, sf, j))
    // with codebooks FIXED, per-vector codes are deterministic — so a
    // codes table built from the base slice and APPENDED with the
    // increment's codes must serve searches identically to the
    // in-session one-pass encode (the ann_ivf_append contract lifted to
    // the composed index: daily increments join the compressed layout
    // without touching base rows or re-learning any quantizer)
    val codes = SimQueries.ivfPqCodes(spark, sf)
    graft.operators.Scale.writeBucketed(
      codes.filter(expr("vec_id % 5 <> 4")), "graft_test_ivfpq_codes_inc", "cell", 4)
    graft.operators.Scale.appendBucketed(
      codes.filter(expr("vec_id % 5 = 4")), "graft_test_ivfpq_codes_inc", "cell", 4)
    val recon = SimQueries.ivfPqDecode(
      spark.table("graft_test_ivfpq_codes_inc"), coarse, books)
    val viaAppend = SimQueries.ivfPqSearch(spark, emb, recon, coarse,
      Similarity.adaptiveNProbe(coarse.size)).collect()
    val inSession = graft.SparkEntry.queries("ann_ivf_pq")(spark, sf).collect()
    assert(viaAppend.nonEmpty)
    assert(viaAppend.sameElements(inSession))
  }

  test("ann_ivf_rebalance relearns past policy and equals the fresh-learned union index") {
    import graft.queries.SimQueries
    // on the driver corpus the appended slice is 20% of the index —
    // past RebalIncFracMax — so the policy must fire the relearn path:
    // the rebalanced tables are NOT the append tables
    val (centT, corpT) = SimQueries.ivfRebalanceTables(spark, sf)
    assert(centT.contains("ivfreb") && corpT.contains("ivfreb"),
      s"relearn did not fire: policy returned ($centT, $corpT)")
    // union equivalence: search over the rebalanced index equals the
    // fresh in-session union-learned index exactly
    val rebal = graft.SparkEntry.queries("ann_ivf_rebalance")(spark, sf).collect()
    val fresh = graft.SparkEntry.queries("ann_ivf_search")(spark, sf).collect()
    assert(rebal.nonEmpty)
    assert(rebal.sameElements(fresh))
  }

  test("the rebalance policy keeps a low-drift index as-is") {
    import graft.queries.SimQueries
    // the SAME decision function the table builder calls, on
    // audit-shaped counts: balanced cells with a tiny appended
    // fraction stay below both triggers, while either a hot cell or a
    // large appended fraction fires
    val fires = SimQueries.rebalancePolicyFires _
    assert(!fires(Seq(100L, 104L, 98L, 101L), 20L)) // ~5% appended, balanced
    assert(fires(Seq(100L, 410L, 98L, 101L), 20L))  // hot cell: skew > 2
    assert(fires(Seq(100L, 104L, 98L, 101L), 81L))  // 20% appended
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

  test("stale index memo rebuilds: a memo hit whose catalog tables vanished re-persists, same results") {
    import graft.queries.SimQueries
    // the second-SparkSession-in-one-JVM scenario: the process-wide memo
    // remembers (dir -> table names) but the session's catalog has no
    // such tables (a fresh session starts with a fresh in-memory
    // catalog). Simulated exactly by dropping the tables out from under
    // a populated memo — the tableExists guard must fall through to a
    // rebuild instead of handing back a dangling reference.
    val before = graft.SparkEntry.queries("ann_ivf_append")(spark, sf).collect()
    val (centT, corpT) = SimQueries.ivfAppendTables(spark, sf)
    spark.sql(s"DROP TABLE $centT")
    spark.sql(s"DROP TABLE $corpT")
    val (centT2, corpT2) = SimQueries.ivfAppendTables(spark, sf)
    assert(spark.catalog.tableExists(centT2) && spark.catalog.tableExists(corpT2),
      "guard did not rebuild the dropped tables")
    val after = graft.SparkEntry.queries("ann_ivf_append")(spark, sf).collect()
    assert(after.sameElements(before), "rebuilt index returned different results")
    // same drill for the build-once/query-many index
    val (pc, pt) = SimQueries.ivfIndexTables(spark, sf)
    spark.sql(s"DROP TABLE $pc")
    spark.sql(s"DROP TABLE $pt")
    val persistedBefore = graft.SparkEntry.queries("ann_ivf_persisted")(spark, sf).collect()
    assert(spark.catalog.tableExists(pc) && spark.catalog.tableExists(pt))
    assert(persistedBefore.nonEmpty)
  }
}
