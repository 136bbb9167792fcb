package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import graft.sources.Tables
import graft.multimodal.Multimodal

/** Streaming image dedup parity: the [[StreamingImage]] stages are
  * driven over micro-batch boundaries with MemoryStream and checked
  * against the batch `imageShared` pipeline stage by stage, then the
  * composed stream output is folded into cluster membership and asserted
  * EQUAL to the batch `dedup_image_cluster` resolution on the same
  * corpus — the streaming/batch parity contract of this family.
  */
class StreamingImageSpec extends SparkSpec {
  import spark.implicits._

  // batch ground truth; decode→hash is stateless and shared by both
  // sides, so parity tests target the STATEFUL streaming logic
  private lazy val payloadRows: Seq[(Long, Array[Byte])] =
    Multimodal.syntheticPixelPayloads(spark, Tables.documents(spark, sf))
      .as[(Long, Array[Byte])].collect().toSeq.sortBy(_._1)
  private lazy val batchHashes: Seq[(Long, Long)] =
    Multimodal.dhash56(spark,
        Multimodal.syntheticPixelPayloads(spark, Tables.documents(spark, sf)))
      .collect().toSeq.map(p => (p.asset_id, p.phash)).sortBy(_._1)

  test("streaming phashKeepFirst: in-stream decode, exact dups map to the min-id keeper") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(Long, Array[Byte])]
    val df = stream.toDF().toDF("asset_id", "payload")
    val out = StreamingImage.phashKeepFirst(spark, df)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("imgkf_out").start()
    val (b1, b2) = payloadRows.splitAt(payloadRows.size / 2)
    stream.addData(b1)
    q.processAllAvailable()
    stream.addData(b2)
    q.processAllAvailable()
    val got = spark.table("imgkf_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    q.stop()
    // batch exact groups: per phash with n >= 2, every member except the
    // min maps to the min (ids arrive in sorted micro-batches, so
    // first-arrival == min — the batch keeper election)
    val want = batchHashes.groupBy(_._2).iterator.flatMap { case (ph, members) =>
      val ids = members.map(_._1).sorted
      ids.tail.map(id => (id, ids.head, ph))
    }.toSet
    assert(got == want)
    assert(got.nonEmpty) // the corpus has exact perceptual dup groups
    // at least one duplicate's keeper sits in the earlier micro-batch
    val b1Ids = b1.map(_._1).toSet
    assert(got.exists { case (id, keep, _) => b1Ids.contains(keep) && !b1Ids.contains(id) })
  }

  test("streaming phashBandPairs equals batch hammingBandPairs verified at <= 6") {
    implicit val sc = spark.sqlContext
    val distinctHashes = batchHashes.map(_._2).distinct.sorted
    val stream = MemoryStream[Long]
    val df = stream.toDF().toDF("phash")
    val out = StreamingImage.phashBandPairs(spark, df)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("imgbp_out").start()
    val (b1, b2) = distinctHashes.splitAt(distinctHashes.size / 2)
    stream.addData(b1)
    q.processAllAvailable()
    stream.addData(b2)
    q.processAllAvailable()
    // per-band repeats collapse in the set, like batch's .distinct()
    val got = spark.table("imgbp_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    q.stop()
    val want = graft.dedup.Dedup.hammingBandPairs(
        batchHashes.toDF("asset_id", "phash"), "phash", nBands = 8, bitsPerBand = 7)
      .withColumn("hamming", expr("CAST(bit_count(phash_a ^ phash_b) AS BIGINT)"))
      .filter(col("hamming") <= 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    assert(got.nonEmpty)
    // at least one near-dup pair spans the micro-batch boundary
    val b1Set = b1.toSet
    assert(got.exists { case (a, b, _) => b1Set.contains(a) != b1Set.contains(b) })
  }

  test("streaming audio: ahashKeepFirst + audio-layout band pairs match the batch audio pipeline") {
    implicit val sc = spark.sqlContext
    val wavRows = Multimodal.syntheticWavReplicaPayloads(spark, Tables.documents(spark, sf))
      .as[(Long, Array[Byte])].collect().toSeq.sortBy(_._1)
    val batchAudio = Multimodal.audioDhashes(spark,
        Multimodal.syntheticWavReplicaPayloads(spark, Tables.documents(spark, sf)))
      .collect().toSeq.map(a => (a.asset_id, a.ahash)).sortBy(_._1)
    // stage 1: in-stream RIFF walk + keyed keep-first admission
    val stream = MemoryStream[(Long, Array[Byte])]
    val df = stream.toDF().toDF("asset_id", "payload")
    val out = StreamingImage.ahashKeepFirst(spark, df)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("audkf_out").start()
    val (b1, b2) = wavRows.splitAt(wavRows.size / 2)
    stream.addData(b1)
    q.processAllAvailable()
    stream.addData(b2)
    q.processAllAvailable()
    val got = spark.table("audkf_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    q.stop()
    val want = batchAudio.groupBy(_._2).iterator.flatMap { case (h, members) =>
      val ids = members.map(_._1).sorted
      ids.tail.map(id => (id, ids.head, h))
    }.toSet
    assert(got == want)
    // stage 2: band pairs with the audio layout (4 x 14-bit, <= 3)
    val distinctHashes = batchAudio.map(_._2).distinct.sorted
    val hs = MemoryStream[Long]
    val hdf = hs.toDF().toDF("ahash")
    val pout = StreamingImage.phashBandPairs(spark, hdf,
      nBands = 4, bitsPerBand = 14, maxHamming = 3, hashCol = "ahash")
    val pq = pout.writeStream.outputMode("append").format("memory")
      .queryName("audbp_out").start()
    val (h1, h2) = distinctHashes.splitAt(distinctHashes.size / 2)
    hs.addData(h1)
    pq.processAllAvailable()
    hs.addData(h2)
    pq.processAllAvailable()
    val gotPairs = spark.table("audbp_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    pq.stop()
    val wantPairs = graft.dedup.Dedup.hammingBandPairs(
        batchAudio.toDF("asset_id", "ahash"), "ahash", nBands = 4, bitsPerBand = 14)
      .withColumn("hamming", expr("CAST(bit_count(ahash_a ^ ahash_b) AS BIGINT)"))
      .filter(col("hamming") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotPairs == wantPairs)
    assert(gotPairs.nonEmpty) // planted replicas guarantee near-dups
  }

  test("composed streaming stages reproduce batch dedup_image_cluster membership") {
    implicit val sc = spark.sqlContext
    // stage: verified hash pairs (from the band stage's parity-checked
    // output shape) stream into the transitive cluster resolver; fold
    // the canonical revisions, keeping the latest per hash
    val pairs = graft.dedup.Dedup.hammingBandPairs(
        batchHashes.toDF("asset_id", "phash"), "phash", nBands = 8, bitsPerBand = 7)
      .withColumn("hamming", expr("CAST(bit_count(phash_a ^ phash_b) AS BIGINT)"))
      .filter(col("hamming") <= 6)
      .select(col("phash_a"), col("phash_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val stream = MemoryStream[(Long, Long)]
    val df = stream.toDF().toDF("id_a", "id_b")
    val out = StreamingDedup.clusterKeepFirst(spark, df)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("imgcl_out").start()
    val (p1, p2) = pairs.splitAt(pairs.size / 2)
    stream.addData(p1)
    q.processAllAvailable()
    stream.addData(p2)
    q.processAllAvailable()
    // fold: micro-batch emission order is the table's insertion order;
    // later revisions overwrite earlier ones per hash
    val folded = scala.collection.mutable.Map.empty[Long, Long]
    spark.table("imgcl_out").collect().foreach(r => folded(r.getLong(0)) = r.getLong(1))
    q.stop()
    // reconstruct membership exactly as dedup_image_cluster does: exact
    // groups (n >= 2) participate even as singleton components; cluster
    // label = canonical hash; kept asset = min asset id per cluster
    val grpN = batchHashes.groupBy(_._2).map { case (ph, m) => (ph, m.size) }
    val members = batchHashes
      .filter { case (_, ph) => grpN(ph) >= 2 || folded.contains(ph) }
      .map { case (id, ph) => (id, folded.getOrElse(ph, ph)) }
    val canonAsset = members.groupBy(_._2).map { case (c, m) => (c, m.map(_._1).min) }
    val got = members.map { case (id, c) => (id, canonAsset(c)) }.toSet
    val want = graft.queries.DedupQueries.dedupImageCluster(spark, sf)
      .select(col("asset_id"), col("canonical"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    assert(got.nonEmpty)
    // non-vacuous: some cluster spans multiple distinct hashes (true
    // near-dups, not just exact groups)
    assert(folded.exists { case (ph, c) => ph != c })
  }
}
