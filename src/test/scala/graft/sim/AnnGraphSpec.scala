package graft.sim

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Semantic pins for the navigable-graph ANN family (`ann_graph_topk`,
  * `ann_recall_graph`): recall dominance over the IVF probe baseline at
  * comparable scored-candidate budget, graph-shape invariants, and
  * determinism.
  */
class AnnGraphSpec extends SparkSpec {

  private def emb = graft.sources.Tables.embeddings(spark, sf)

  test("recall@5 beats IVF nProbe=2 at comparable scored-candidate budget") {
    val graph = graft.SparkEntry.queries("ann_recall_graph")(spark, sf)
      .agg(sum(col("hits")).as("h"), count(lit(1)).as("n")).head()
    val graphHits = graph.getLong(0)
    // the IVF baseline from the same truth set: ann_recall's nProbe=2 rows
    val ivf = graft.SparkEntry.queries("ann_recall")(spark, sf)
      .filter(col("n_probe") === 2)
      .agg(sum(col("hits")).as("h"), count(lit(1)).as("n")).head()
    val ivfHits = ivf.getLong(0)
    assert(graph.getLong(1) == ivf.getLong(1), "same query set")
    assert(graphHits > ivfHits,
      s"graph hits $graphHits must beat IVF nProbe=2 hits $ivfHits")
    // budget: beam search scores <= hops*beam*(degree+1) + entries vertices
    // per query - a constant (1040ish) independent of corpus size, while
    // nProbe=2 scans ~2/10 of the corpus per query (400 at sf0.1, growing
    // linearly). The graph wins recall AND has the bounded serving cost.
  }

  test("kNN graph edges: bounded out-degree, no self-loops, neighbors are genuinely near") {
    val edges = graft.queries.SimQueries.knnGraphEdges(spark, sf)
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("d"))
    assert(deg.filter(col("d") > 12).count() == 0)
    assert(edges.filter(col("src") === col("dst")).count() == 0)
    // every corpus vector has at least one out-edge (cells are non-trivial)
    assert(deg.count() == emb.count())
  }

  test("persisted-graph search equals the in-session graph search row-for-row") {
    val live = graft.SparkEntry.queries("ann_graph_topk")(spark, sf).collect().toSeq
    val persisted = graft.SparkEntry.queries("ann_graph_persisted")(spark, sf).collect().toSeq
    assert(live == persisted)
  }

  test("append: batch insertion degrades recall vs rebuild but still dominates IVF nProbe=2") {
    val e = emb
    val bf = Similarity.bruteForceTopK(e, "vec_id", "embedding",
        col("vec_id") < 10, 5).select(col("q_id"), col("n_id"))
    def hits(df: org.apache.spark.sql.DataFrame) = df
      .select(col("q_id"), col("n_id"))
      .join(bf, Seq("q_id", "n_id"), "left_semi").count()
    val rebuild = hits(graft.SparkEntry.queries("ann_graph_topk")(spark, sf))
    val append = hits(graft.SparkEntry.queries("ann_graph_append")(spark, sf))
    val ivf2 = graft.SparkEntry.queries("ann_recall")(spark, sf)
      .filter(col("n_probe") === 2).agg(sum(col("hits"))).head().getLong(0)
    // the honest ordering: no back-edges toward the increment costs
    // recall vs a full rebuild, but the appended graph still beats the
    // IVF probe baseline (measured 36 vs 42 vs 15-of-50 at sf0.001)
    assert(append <= rebuild, s"append $append > rebuild $rebuild?")
    assert(append > ivf2, s"append $append must beat IVF nProbe=2 $ivf2")
  }

  test("append edge relation: base sources never link to increment members; increment sources exist") {
    val edges = graft.queries.SimQueries.graphAppendEdges(spark, sf)
    val isInc = (c: org.apache.spark.sql.Column) => c % 5 === 4
    // base edges were built before the batch arrived — a base->increment
    // edge would mean the "append" silently rebuilt the base
    assert(edges.filter(!isInc(col("src")) && isInc(col("dst"))).count() == 0)
    assert(edges.filter(isInc(col("src"))).count() > 0)
    // every increment vector got out-edges (it can be searched FROM)
    val incN = emb.filter(isInc(col("vec_id"))).count()
    assert(edges.filter(isInc(col("src"))).select(col("src")).distinct().count() == incN)
  }

  test("on a complete graph (all cells probed, degree >= n-1), one hop from any entry equals brute force") {
    // algorithm sanity: with the graph complete, the first expansion
    // reaches every vertex, so the beam top-5 IS the exact top-5 —
    // pins the scoring/tie-break algebra against bruteForceTopK
    val e = emb
    val n = e.count().toInt
    val complete = Similarity.knnGraph(e, "vec_id", "embedding", "label",
      probeCells = 10, degree = n - 1)
    // entryCells = 2, not 1: entries exclude the query itself, and a
    // low-id query IS its own cell's head — but a vector belongs to
    // exactly one cell, so it can be at most ONE head, and two entry
    // cells guarantee a non-self entry (the registered key uses 3)
    val got = Similarity.graphBeamSearch(e, "vec_id", "embedding", "label",
        complete, col("vec_id") < 5, entryCells = 2, beamWidth = 8,
        hops = 1, k = 5)
      .select(col("q_id"), col("rank"), col("n_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = Similarity.bruteForceTopK(e, "vec_id", "embedding",
        col("vec_id") < 5, 5)
      .select(col("q_id"), col("rank"), col("n_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("graph stats: conservation vs the edge relation, and the navigability cross-links exist") {
    val stats = graft.SparkEntry.queries("ann_graph_stats")(spark, sf).collect()
    val edges = graft.queries.SimQueries.knnGraphEdges(spark, sf)
    assert(stats.map(_.getAs[Long]("n_vertices")).sum == emb.count())
    assert(stats.map(_.getAs[Long]("n_edges")).sum == edges.count())
    stats.foreach { r =>
      val (e, x, p) = (r.getAs[Long]("n_edges"), r.getAs[Long]("n_cross_cell"),
        r.getAs[Long]("n_reciprocal"))
      assert(x <= e && p <= e)
      assert(r.getAs[Long]("cross_e6") == x * 1000000L / e)
      assert(r.getAs[Long]("recip_e6") == p * 1000000L / e)
      // the property beam search NEEDS: every cell has long-range links
      // out of itself (probeCells = 1 construction would zero this and
      // the index would silently degenerate to IVF nProbe=1)
      assert(x > 0, s"cell ${r.getAs[Long]("cell")} has no cross-cell edges")
    }
  }

  test("beam search is deterministic: two runs return identical rows") {
    val a = graft.SparkEntry.queries("ann_graph_topk")(spark, sf).collect().toSeq
    val b = graft.SparkEntry.queries("ann_graph_topk")(spark, sf).collect().toSeq
    assert(a == b)
    // exactly k=5 ranked neighbors per query, ranks 1..5
    val perQ = a.groupBy(_.getLong(0))
    perQ.foreach { case (_, rows) =>
      assert(rows.map(_.getLong(1)).sorted == Seq(1L, 2L, 3L, 4L, 5L))
    }
    // no self-neighbors
    assert(a.forall(r => r.getLong(0) != r.getLong(2)))
  }
}
