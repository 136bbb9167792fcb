package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.dedup.Dedup
import graft.sim.Similarity

/** Deduplication queries over `documents` / `embeddings`
  * (training-data-pipeline extensions): exact fingerprint groups,
  * blocked n-gram Jaccard near-dup pairs, MinHash signatures, SimHash
  * signatures, embedding-cosine near-dup pairs.
  *
  * The LSH banding step (candidate generation from the MinHash
  * signatures) is exercised in ScalaTest (`DedupSpec`) — its output is an
  * intermediate candidate set, not a stable relation; the signatures and
  * the verified pairs ARE the stable, oracle-checkable relations.
  */
object DedupQueries {
  private type Q = (SparkSession, String) => DataFrame
  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  /** Shared DuckDB fragment: distinct 56-bit-hashed 3-gram shingles
    * (one md5 per shingle, first 14 hex digits — mirrors
    * [[Dedup.hashedShingleSet]]).
    */
  private val shinglesCte =
    """sh AS (
      |  SELECT doc_id, source, list_distinct(list_transform(
      |    list_transform(range(1, len(t) - 1),
      |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]),
      |    s -> ('0x' || substr(md5(s), 1, 14))::BIGINT)) AS sh
      |  FROM (SELECT doc_id, source, regexp_extract_all(text, '\S+') AS t FROM documents)
      |  WHERE len(t) >= 3)""".stripMargin

  // ========================================================================
  // dedup_exact — canonical-fingerprint group-by: one map-side-combined
  // aggregation; only (fp, id) shuffles, never the text.
  // ========================================================================
  def dedupExact(s: SparkSession, d: String): DataFrame =
    Dedup.exactGroups(docs(s, d), "text", "doc_id").orderBy(col("fp"))

  private val dedupExactSql =
    """SELECT md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fp,
      |  count(*) AS n_docs, min(doc_id) AS keep_id
      |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin

  // ========================================================================
  // dedup_ngram_jaccard — near-dup pairs by exact 3-gram Jaccard within a
  // blocking key (source). The block bounds the quadratic verify; at
  // scale the block is the LSH candidate set instead.
  // ========================================================================
  def dedupNgramJaccard(s: SparkSession, d: String): DataFrame =
    Dedup.ngramJaccardPairs(docs(s, d), "text", "doc_id", "source", 0.01)
      .orderBy(col("id_a"), col("id_b"))

  private val dedupNgramJaccardSql =
    s"""WITH $shinglesCte
       |SELECT id_a, id_b, inter / (la + lb - inter) AS jaccard
       |FROM (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) AS inter,
       |    CAST(len(a.sh) AS DOUBLE) AS la, CAST(len(b.sh) AS DOUBLE) AS lb
       |  FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id)
       |WHERE inter / (la + lb - inter) >= 0.01
       |ORDER BY id_a, id_b""".stripMargin

  // ========================================================================
  // dedup_minhash_sig — k=8 MinHash signatures in long form (doc_id, i,
  // minh): per-row expressions + a generator, shuffle-free; LSH banding
  // over these is in DedupSpec.
  // ========================================================================
  def dedupMinhashSig(s: SparkSession, d: String): DataFrame =
    Dedup.minhashSignatures(docs(s, d), "text", "doc_id", 8)
      .orderBy(col("doc_id"), col("i"))

  private val dedupMinhashSigSql =
    """WITH hp AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    list_transform(range(1, len(t) - 1),
      |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]),
      |    s -> md5(s))) AS hx
      |  FROM (SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM documents)
      |  WHERE len(t) >= 3)
      |SELECT doc_id, i, list_min(list_transform(hx, x ->
      |    (('0x' || substr(x, 1, 14))::BIGINT
      |     + i * ('0x' || substr(x, 15, 14))::BIGINT) & 72057594037927935)) AS minh
      |FROM hp, range(0, 8) r(i)
      |ORDER BY doc_id, i""".stripMargin

  // ========================================================================
  // dedup_simhash — 48-bit SimHash per doc: exploded (token × bit) votes,
  // two integer aggregations; cross-engine exact (pure integer math).
  // ========================================================================
  def dedupSimhash(s: SparkSession, d: String): DataFrame =
    Dedup.simhash48(docs(s, d), "text", "doc_id").orderBy(col("doc_id"))

  private val dedupSimhashSql =
    """WITH toks AS (
      |  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS tok FROM documents),
      |h AS (
      |  SELECT doc_id, ('0x' || substr(md5(tok), 1, 12))::BIGINT AS h FROM toks),
      |votes AS (
      |  SELECT doc_id, i,
      |    sum(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS vote
      |  FROM h, range(0, 48) r(i) GROUP BY doc_id, i)
      |SELECT doc_id,
      |  sum(CASE WHEN vote > 0 THEN (1::BIGINT << i) ELSE 0 END) AS simhash
      |FROM votes GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ========================================================================
  // dedup_embedding_cosine — near-dup pairs by embedding cosine within a
  // coarse block (label = IVF-cell stand-in). Double-precision
  // left-to-right dots both sides; threshold 0.3 (this corpus has no
  // tight clusters — max within-label cosine ≈ 0.47).
  // ========================================================================
  def dedupEmbeddingCosine(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("label"), col("embedding"),
      Similarity.norm(col("embedding")).as("nrm"))
    val a = e.select(col("vec_id").as("id_a"), col("label"),
      col("embedding").as("va"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("id_b"), col("label"),
      col("embedding").as("vb"), col("nrm").as("nb"))
    a.join(b, Seq("label"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos") >= 0.3)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
      .orderBy(col("id_a"), col("id_b"))
  }

  private val dedupEmbeddingCosineSql =
    """WITH e AS (
      |  SELECT vec_id, label, embedding,
      |    sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm
      |  FROM embeddings)
      |SELECT a.vec_id AS id_a, b.vec_id AS id_b, round(cos, 4) AS cos
      |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id,
      |  LATERAL (SELECT list_sum(list_transform(range(1, len(a.embedding) + 1),
      |    i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)) / (a.nrm * b.nrm) AS cos)
      |WHERE cos >= 0.3
      |ORDER BY id_a, id_b""".stripMargin

  val queries: Map[String, Q] = Map(
    "dedup_exact" -> (dedupExact _),
    "dedup_ngram_jaccard" -> (dedupNgramJaccard _),
    "dedup_minhash_sig" -> (dedupMinhashSig _),
    "dedup_simhash" -> (dedupSimhash _),
    "dedup_embedding_cosine" -> (dedupEmbeddingCosine _),
  )

  val oracleSql: Map[String, String] = Map(
    "dedup_exact" -> dedupExactSql,
    "dedup_ngram_jaccard" -> dedupNgramJaccardSql,
    "dedup_minhash_sig" -> dedupMinhashSigSql,
    "dedup_simhash" -> dedupSimhashSql,
    "dedup_embedding_cosine" -> dedupEmbeddingCosineSql,
  )
}
