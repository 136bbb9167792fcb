package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Brute-force cosine top-k is the correctness baseline; the scale paths
  * are (a) random-hyperplane LSH bucketing (per-row integer-coefficient
  * dot products → sign bits → bucket id; candidates only join within a
  * bucket) and (b) IVF-style partitioning by a coarse key (here the
  * `label` column stands in for a learned coarse quantizer): centroid
  * stats per partition, search within the probed partition only.
  *
  * All dot products run in double precision via `aggregate(zip_with(...))`
  * — deterministic left-to-right summation, cross-engine reproducible.
  */
object Similarity {

  /** Double-precision dot product of two array columns — a native
    * codegen'd Catalyst expression (see [[graft.plans.ArrayDotProduct]]);
    * same left-to-right summation as the composable
    * `aggregate(zip_with(...))` form but ~an order of magnitude faster
    * (primitive loop inside WholeStageCodegen vs interpreted lambdas).
    */
  def dot(a: Column, b: Column): Column = graft.plans.ArrayDotProduct.dot(a, b)

  /** The composable built-ins-only formulation (kept for reference and
    * as the cross-check in SimilaritySpec).
    */
  def dotViaAggregate(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: for each query row (filtered by
    * `isQuery`), the k nearest non-self rows by cosine, rank-ordered
    * (ties break on neighbor id). Norms are precomputed per side so the
    * cross join multiplies, not re-norms. The query side is broadcast —
    * the candidate scan stays partition-parallel.
    */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
                     isQuery: Column, k: Int): DataFrame = {
    val withNorm = df.select(col(idCol), col(vecCol), norm(col(vecCol)).as("nrm"))
    val q = withNorm.filter(isQuery)
      .select(col(idCol).as("q_id"), col(vecCol).as("q_vec"), col("nrm").as("q_nrm"))
    val c = withNorm
      .select(col(idCol).as("n_id"), col(vecCol).as("n_vec"), col("nrm").as("n_nrm"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("cos", dot(col("q_vec"), col("n_vec")) / (col("q_nrm") * col("n_nrm")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"), col("n_id"),
        round(col("cos"), 4).as("cos"))
  }

  /** Deterministic pseudo-hyperplane coefficient for (plane j, dim i):
    * small signed integers, exactly representable — sign decisions are
    * then reproducible across engines.
    */
  def planeCoef(j: Int, i: Column): Column = ((i * 37 + j * 101) % 19 - 9).cast("double")

  /** Random-hyperplane LSH bucket id from `nPlanes` sign bits.
    * `planeOffset` selects a disjoint plane family — table t of an
    * OR-amplified multi-table scheme passes `t * nPlanes` so its
    * hyperplanes are independent of table 0's.
    *
    * A native codegen'd expression (see [[graft.plans.HyperplaneBuckets]])
    * — the built-ins-only formulation below evaluates one interpreted
    * lambda chain per plane per row and measured ~10× slower on the
    * multi-table dedup query.
    */
  def hyperplaneBucket(vec: Column, nPlanes: Int, planeOffset: Int = 0): Column =
    graft.plans.HyperplaneBuckets.buckets(vec, nPlanes, planeOffset)

  /** The composable built-ins-only formulation (kept as the cross-check
    * in SimilaritySpec, like [[dotViaAggregate]]). Null elements are
    * coalesced to 0 before summing so the semantics match the codegen
    * expression and DuckDB's null-ignoring `list_sum` (a bare `acc + x`
    * would null the whole plane sum on the first null element).
    */
  def hyperplaneBucketViaAggregate(vec: Column, nPlanes: Int, planeOffset: Int = 0): Column = {
    val bits = (0 until nPlanes).map { j =>
      val d = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => coalesce(x.cast("double") * planeCoef(planeOffset + j, i), lit(0.0))),
        lit(0.0), (acc, x) => acc + x)
      when(d > 0, lit(1L << j)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** Per-cell centroids learned from the data: mean per (cell, dim) —
    * ONE aggregation over the exploded dims, map-side combined — packed
    * back into a dim-ordered `array<double>` with its norm. Components
    * are rounded to 6 digits: centroid means are independently
    * recomputed per engine at oracle time, and the rounding makes the
    * downstream argmax cell assignment engine-stable.
    */
  def ivfCentroids(df: DataFrame, cellCol: String, vecCol: String): DataFrame =
    df.select(col(cellCol).cast("long").as("cell"), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col("cell"), col("pos"))
      .agg(round(avg(col("x").cast("double")), 6).as("mu"))
      .groupBy(col("cell"))
      .agg(transform(sort_array(collect_list(struct(col("pos"), col("mu")))),
        s => s.getField("mu")).as("cvec"))
      .withColumn("cnrm", norm(col("cvec")))

  /** IVF-style ANN: learn [[ivfCentroids]] (one tiny aggregation), assign
    * each query vector to its nearest centroid by cosine (a broadcast of
    * ≤cells rows — the corpus never moves for assignment), then rank
    * candidates ONLY within the probed cell(s). The 100 TB shape of
    * similarity search: the per-query work is nProbe·|cell|, not
    * |corpus|, and the only corpus-wide pass is the centroid
    * aggregation. `nProbe` > 1 probes the n nearest cells — the standard
    * recall dial for points near cell boundaries.
    */
  def ivfSearch(df: DataFrame, idCol: String, vecCol: String, cellCol: String,
                isQuery: Column, k: Int, nProbe: Int = 1): DataFrame = {
    require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
    val cent = ivfCentroids(df, cellCol, vecCol)
    val e = df.select(col(idCol), col(cellCol).cast("long").as("cell"),
      col(vecCol), norm(col(vecCol)).as("nrm"))
    val q = e.filter(isQuery)
      .select(col(idCol).as("q_id"), col(vecCol).as("q_vec"), col("nrm").as("q_nrm"))
    val wa = Window.partitionBy(col("q_id")).orderBy(col("cos_c").desc, col("cell"))
    val assigned = q.crossJoin(broadcast(cent))
      .withColumn("cos_c", dot(col("q_vec"), col("cvec")) / (col("q_nrm") * col("cnrm")))
      .withColumn("rc", row_number().over(wa))
      .filter(col("rc") <= nProbe)
      .select(col("q_id"), col("q_vec"), col("q_nrm"), col("cell"))
    val c = e.select(col(idCol).as("n_id"), col("cell"), col(vecCol).as("n_vec"),
      col("nrm").as("n_nrm"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    c.join(broadcast(assigned), Seq("cell"))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("cos", dot(col("q_vec"), col("n_vec")) / (col("q_nrm") * col("n_nrm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"), col("n_id"),
        col("cell"), round(col("cos"), 4).as("cos"))
  }

  /** Bucketed ANN: assign buckets, then search only within the query's
    * bucket. Returns (q_id, n_id, cos) for same-bucket candidate pairs.
    */
  def lshSearch(df: DataFrame, idCol: String, vecCol: String,
                isQuery: Column, nPlanes: Int, k: Int): DataFrame = {
    val b = df.select(col(idCol), col(vecCol),
      hyperplaneBucket(col(vecCol), nPlanes).as("bucket"),
      norm(col(vecCol)).as("nrm"))
    val q = b.filter(isQuery)
      .select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
        col("bucket"), col("nrm").as("q_nrm"))
    val c = b.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"),
      col("bucket"), col("nrm").as("n_nrm"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("cos", dot(col("q_vec"), col("n_vec")) / (col("q_nrm") * col("n_nrm")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"), col("n_id"),
        round(col("cos"), 4).as("cos"))
  }
}
