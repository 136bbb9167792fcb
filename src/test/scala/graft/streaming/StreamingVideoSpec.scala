package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import graft.sources.Tables
import graft.multimodal.Multimodal

/** Streaming video dedup parity: the [[StreamingVideo]] stages are
  * driven over micro-batch boundaries with MemoryStream and checked
  * stage by stage against the batch video pipeline, then the composed
  * stream output is folded into cluster membership and asserted EQUAL
  * to the batch `dedup_video_cluster` resolution on the same corpus —
  * the fourth modality completing the streaming admission funnel.
  */
class StreamingVideoSpec extends SparkSpec {
  import spark.implicits._

  private lazy val payloadRows: Seq[(Long, Array[Byte])] =
    Multimodal.syntheticY4mReplicaPayloads(spark, Tables.documents(spark, sf))
      .as[(Long, Array[Byte])].collect().toSeq.sortBy(_._1)

  // batch signatures via the BATCH SQL construction (frame hashes →
  // sorted struct list → md5 of the comma-joined decimal hashes) — an
  // independent recomputation, NOT the new one-pass Scala walker, so
  // byte-identity of the two constructions is what this pins
  private lazy val batchSigs: Seq[(Long, String)] =
    Multimodal.frameDhashes(spark,
        Multimodal.syntheticY4mReplicaPayloads(spark, Tables.documents(spark, sf)), step = 2)
      .toDF()
      .groupBy(col("asset_id"))
      .agg(sort_array(collect_list(struct(col("frame_idx"), col("fhash")))).as("fs"))
      .select(col("asset_id"),
        md5(concat_ws(",", expr("transform(fs, x -> CAST(x.fhash AS STRING))"))).as("csig"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(_._1)

  test("a valid zero-frame clip emits no signature — mirrors the batch pipeline's absence") {
    import org.apache.spark.sql.functions.col
    // a header-only y4m stream is valid but frameless: frameDhashes (and
    // the batch signature groupBy it feeds) has no rows for it, so the
    // streaming walker must emit nothing too — an md5-of-empty signature
    // would group every frameless clip as an exact dup of every other
    val headerOnly = Multimodal.y4mMono(4, 4, Seq.empty)
    val withFrames = Multimodal.y4mMono(4, 4, Seq(Array.fill(16)(7.toByte)))
    val df = spark.createDataFrame(Seq((1L, headerOnly), (2L, withFrames)))
      .toDF("asset_id", "payload")
    val sigs = Multimodal.clipSignatures(spark, df).collect()
    assert(sigs.map(_.asset_id).toSeq == Seq(2L))
    val hashes = Multimodal.frameDhashes(spark, df, step = 2).toDF()
      .select(col("asset_id")).distinct().collect().map(_.getLong(0)).toSeq
    assert(hashes == Seq(2L))
  }

  test("one-pass streaming clip signature is byte-identical to the batch md5 construction") {
    val streamed = Multimodal.clipSignatures(spark,
        Multimodal.syntheticY4mReplicaPayloads(spark, Tables.documents(spark, sf)))
      .collect().map(c => (c.asset_id, c.csig)).toSeq.sortBy(_._1)
    assert(streamed == batchSigs)
    assert(streamed.nonEmpty)
  }

  test("streaming sigKeepFirst: in-stream walk, exact clip dups map to the min-id keeper") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(Long, Array[Byte])]
    val df = stream.toDF().toDF("asset_id", "payload")
    val out = StreamingVideo.sigKeepFirst(spark, df)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("vidkf_out").start()
    // split by id parity, not midpoint: exact clip dups are ADJACENT ids
    // (the replica of doc k sits at k+1), so a midpoint split would keep
    // every dup group inside one micro-batch and the cross-batch keeper
    // assertion below would be vacuous. Keepers (even ids, the group
    // mins) land in b1, their replicas in b2.
    val (b1, b2) = payloadRows.partition(_._1 % 2 == 0)
    stream.addData(b1)
    q.processAllAvailable()
    stream.addData(b2)
    q.processAllAvailable()
    val got = spark.table("vidkf_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    q.stop()
    val want = batchSigs.groupBy(_._2).iterator.flatMap { case (sig, members) =>
      val ids = members.map(_._1).sorted
      ids.tail.map(id => (id, ids.head, sig))
    }.toSet
    assert(got == want)
    assert(got.nonEmpty) // the replica corpus has exact perceptual clip dups
    val b1Ids = b1.map(_._1).toSet
    assert(got.exists { case (id, keep, _) => b1Ids.contains(keep) && !b1Ids.contains(id) })
  }

  test("streaming clipBandPairs equals the batch dedup_video_phash verified pairs") {
    implicit val sc = spark.sqlContext
    // one representative per DISTINCT signature, the batch rep election
    val reps = Multimodal.clipSignatures(spark,
        Multimodal.syntheticY4mReplicaPayloads(spark, Tables.documents(spark, sf)))
      .collect().toSeq
      .groupBy(_.csig).map { case (_, m) => m.minBy(_.asset_id) }
      .toSeq.sortBy(_.csig)
      .map(c => (c.csig, c.frame_idxs, c.fhashes))
    val stream = MemoryStream[(String, Seq[Long], Seq[Long])]
    val df = stream.toDF().toDF("csig", "frame_idxs", "fhashes")
    val out = StreamingVideo.clipBandPairs(spark, df)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("vidbp_out").start()
    val (b1, b2) = reps.splitAt(reps.size / 2)
    stream.addData(b1)
    q.processAllAvailable()
    stream.addData(b2)
    q.processAllAvailable()
    val got = spark.table("vidbp_out").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    q.stop()
    val want = graft.queries.DedupQueries.dedupVideoPhash(spark, sf)
      .select(col("sig_a"), col("sig_b"), col("n_aligned"), col("total_hamming"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want)
    assert(got.nonEmpty) // planted replicas guarantee near-dup clips
    // at least one near-dup pair spans the micro-batch boundary
    val b1Sigs = b1.map(_._1).toSet
    assert(got.exists { case (a, b, _, _) => b1Sigs.contains(a) != b1Sigs.contains(b) })
  }

  test("composed streaming stages reproduce batch dedup_video_cluster membership") {
    implicit val sc = spark.sqlContext
    // signature-level pairs (parity-checked above) mapped to numeric rep
    // ids stream into the transitive cluster resolver
    val sigRep = batchSigs.groupBy(_._2).map { case (sig, m) => (sig, m.map(_._1).min) }
    val pairs = graft.queries.DedupQueries.dedupVideoPhash(spark, sf)
      .select(col("sig_a"), col("sig_b"))
      .collect().map(r => (sigRep(r.getString(0)), sigRep(r.getString(1)))).toSeq.sorted
    val stream = MemoryStream[(Long, Long)]
    val df = stream.toDF().toDF("id_a", "id_b")
    val out = StreamingDedup.clusterKeepFirst(spark, df)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("vidcl_out").start()
    val (p1, p2) = pairs.splitAt(pairs.size / 2)
    stream.addData(p1)
    q.processAllAvailable()
    stream.addData(p2)
    q.processAllAvailable()
    val folded = scala.collection.mutable.Map.empty[Long, Long]
    spark.table("vidcl_out").collect().foreach(r => folded(r.getLong(0)) = r.getLong(1))
    q.stop()
    // membership exactly as dedup_video_cluster: exact signature groups
    // (n >= 2) participate even as singleton components; canonical =
    // the component label of the signature's rep id (which is the
    // cluster min asset by construction)
    val grpN = batchSigs.groupBy(_._2).map { case (sig, m) => (sig, m.size) }
    val got = batchSigs
      .filter { case (_, sig) => grpN(sig) >= 2 || folded.contains(sigRep(sig)) }
      .map { case (id, sig) =>
        val rep = sigRep(sig)
        (id, folded.getOrElse(rep, rep))
      }.toSet
    val want = graft.queries.DedupQueries.dedupVideoCluster(spark, sf)
      .select(col("asset_id"), col("canonical"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    assert(got.nonEmpty)
    // non-vacuous: some cluster spans multiple distinct signatures
    assert(folded.exists { case (rep, c) => rep != c })
  }
}
