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
