package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming micro-benchmark: drives the continuous operators
  * (curation funnel, exact dedup, LSH verify, sessionization, the
  * per-shard sequence packer, and the reference-core time-series pair:
  * watermarked bucket-mean + per-key Welford adapt) over the
  * sf dir's real tables fed as micro-batched in-memory streams, and
  * reports per-pipeline throughput AND state-store footprint — the two
  * signals the batch parity tests cannot see. At 100 TB the thing that
  * kills a long-running stream is state growth (one keep-first long per
  * surviving fingerprint, LSH bucket vectors, sessionize placeholders);
  * this artifact is the regression trap for it.
  *
  * Prints one JSON line per run (LAST line of stdout) and writes the
  * uncompacted copy to `streambench_full.json` in the working directory.
  * Metrics per pipeline, from the engine's own StreamingQueryProgress:
  * rows_in / rows_out / micro-batches / wall seconds / rows_per_sec,
  * plus state_rows and state_bytes from the final state operator
  * snapshot (numRowsTotal / memoryUsedBytes).
  *
  * Reference analogue: the seconds-per-epoch harness
  * (tfdataset_utilities.py:51-62) applied to the `use_streaming`
  * surface the reference declares but never built (config.py:89-90).
  */
object StreamBench {
  case class Result(name: String, rowsIn: Long, rowsOut: Long, batches: Long,
                    wallSec: Double, stateRows: Long, stateBytes: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val chunks = sys.env.getOrElse("SPARK_GRAFT_STREAM_CHUNKS", "10").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sc = spark.sqlContext

    // the corpora, collected once and replayed in `chunks` micro-batches
    val docRows = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)].collect().toSeq
    val evRows = graft.sources.Tables.events(spark, sfDir)
      .select(col("ts"), col("user_id"), col("event_id"))
      .as[(java.sql.Timestamp, Long, Long)].collect()
      .sortBy(e => (e._1.getTime, e._3)).toSeq
    val evVals = graft.sources.Tables.events(spark, sfDir)
      .select(col("ts"), col("user_id"), col("value"))
      .as[(java.sql.Timestamp, Long, Double)].collect()
      .sortBy(e => (e._1.getTime, e._2)).toSeq
    val contaminated = graft.queries.TextQueries.queries("decontaminate")(spark, sfDir)
      .filter(col("contaminated") === 1).select(col("doc_id")).cache()
    contaminated.count()
    // the Bloom variant's sketch: learned once from the static benchmark
    // slice, rides every micro-batch as a plan literal (no per-batch join)
    val benchSketch = graft.queries.TextQueries.benchBloom(spark, sfDir)
    // multimodal asset corpora (same synthetic generators as the batch
    // dedup_image_phash / dedup_audio_phash pipelines)
    val imgRows = graft.multimodal.Multimodal.syntheticPixelPayloads(
        spark, graft.sources.Tables.documents(spark, sfDir))
      .as[(Long, Array[Byte])].collect().toSeq
    val wavRows = graft.multimodal.Multimodal.syntheticWavReplicaPayloads(
        spark, graft.sources.Tables.documents(spark, sfDir))
      .as[(Long, Array[Byte])].collect().toSeq
    val vidRows = graft.multimodal.Multimodal.syntheticY4mReplicaPayloads(
        spark, graft.sources.Tables.documents(spark, sfDir))
      .as[(Long, Array[Byte])].collect().toSeq
    // the CMS bigram model, learned once batch-side (a plan literal on
    // the stream — the benchSketch lifecycle)
    val lmModel = graft.queries.TextQueries.lmSketchModel(spark, sfDir)
    // the data card's stream-static membership relations + the 4-column
    // doc stream it consumes (n_chars rides along for the length bands)
    val cardDup = graft.queries.TextQueries.dataCardDup(spark, sfDir).cache()
    val cardContam = graft.queries.TextQueries.dataCardContam(spark, sfDir).cache()
    cardDup.count(); cardContam.count()
    val docCardRows = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("n_chars").cast("long"), col("text"))
      .as[(Long, String, Long, String)].collect().toSeq
    // the CCNet gate's inputs: per-lang sketch-score thresholds learned
    // batch-side (≤|langs| rows, broadcast on the stream) and the
    // (doc_id, lang, text) stream shape
    val ccnetThresholds = graft.queries.TextLm.ccnetSketchThresholds(spark, sfDir).cache()
    ccnetThresholds.count()
    val docLangRows = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)].collect().toSeq
    // graph-index admission inputs: base-slice centroids (plan literals)
    // + base member relation (stream-static side), increment vectors as
    // the stream — the online half of ann_graph_append
    val graphBase = graft.sources.Tables.embeddings(spark, sfDir)
      .filter(expr("vec_id % 5 <> 4"))
    // the frozen base-learned adaptive-plane quantizer — the SAME codebook
    // the nightly ann_graph_append compaction assigns with
    val graphCents = graft.queries.SimQueries.graphAppendCents(spark, sfDir)
    val graphMembers = graft.queries.SimQueries.graphAdmitMembers(
      graphBase, graphCents).cache()
    graphMembers.count()
    // winnowing-fingerprint admission inputs: the df-capped base index
    // (the dedup_winnow_incremental persisted relation) as the
    // stream-static side, the increment doc slice as the stream
    val winnowIdx = graft.queries.DedupQueries.winnowIndex(spark, sfDir)
    winnowIdx.count()
    val docIncRows = docRows.filter(_._1 % 3 == 0)
    val embIncRows = graft.sources.Tables.embeddings(spark, sfDir)
      .filter(expr("vec_id % 5 = 4"))
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq
    // the full event feed (the stream-stream join's single firehose),
    // time-ordered so the watermark advances monotonically per chunk
    val evFullRows = graft.sources.Tables.events(spark, sfDir)
      .select(col("ts"), col("user_id"), col("event_id"), col("event_type"), col("value"))
      .as[(java.sql.Timestamp, Long, Long, String, Double)].collect()
      .sortBy(e => (e._1.getTime, e._3)).toSeq

    /** Feed `rows` to `pipe`'s input stream in `chunks` micro-batches,
      * draining each before the next (the steady-state regime), and pull
      * the engine's own progress counters afterwards.
      */
    def run[T: org.apache.spark.sql.Encoder](name: String, rows: Seq[T],
        cols: Seq[String], pipe: DataFrame => DataFrame,
        outputMode: String = "append"): Result = {
      val stream = MemoryStream[T]
      val out = pipe(stream.toDF().toDF(cols: _*))
      val q = out.writeStream.outputMode(outputMode).format("memory")
        .queryName(s"sb_$name").start()
      val size = math.max(1, (rows.size + chunks - 1) / chunks)
      val t0 = System.nanoTime()
      rows.grouped(size).foreach { g => stream.addData(g: _*); q.processAllAvailable() }
      val wall = (System.nanoTime() - t0) / 1e9
      val progress = q.recentProgress.toSeq
      val rowsIn = progress.map(_.numInputRows).sum
      val batches = progress.count(_.numInputRows > 0).toLong
      val st = progress.reverse.flatMap(p => Option(p.stateOperators).toSeq.flatten)
        .headOption
      val rowsOut = spark.table(s"sb_$name").count()
      q.stop()
      Result(name, rowsIn, rowsOut, batches, wall,
        st.map(_.numRowsTotal).getOrElse(0L),
        st.map(_.memoryUsedBytes).getOrElse(0L))
    }

    /** Like [[run]] but the pipeline is a `foreachBatch` serve stage:
      * each trigger's bounded query batch runs a BATCH computation
      * against persisted index artifacts and appends its result rows.
      * Zero state by construction (no stateful operators in the stream;
      * every batch is independent).
      */
    def runServe[T: org.apache.spark.sql.Encoder](name: String, rows: Seq[T],
        cols: Seq[String], serve: DataFrame => DataFrame): Result = {
      val stream = MemoryStream[T]
      val outRows = new java.util.concurrent.atomic.AtomicLong(0)
      val q = stream.toDF().toDF(cols: _*).writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                         _: Long) =>
          outRows.addAndGet(serve(batch).count()); ()
        }
        .queryName(s"sb_$name").start()
      val size = math.max(1, (rows.size + chunks - 1) / chunks)
      val t0 = System.nanoTime()
      rows.grouped(size).foreach { g => stream.addData(g: _*); q.processAllAvailable() }
      val wall = (System.nanoTime() - t0) / 1e9
      val progress = q.recentProgress.toSeq
      val rowsIn = progress.map(_.numInputRows).sum
      val batches = progress.count(_.numInputRows > 0).toLong
      val st = progress.reverse.flatMap(p => Option(p.stateOperators).toSeq.flatten)
        .headOption
      q.stop()
      Result(name, rowsIn, outRows.get(), batches, wall,
        st.map(_.numRowsTotal).getOrElse(0L),
        st.map(_.memoryUsedBytes).getOrElse(0L))
    }

    val results = Seq(
      run[(Long, String, String)]("curate", docRows, Seq("doc_id", "source", "text"),
        df => graft.streaming.StreamingCurate.curate(spark, df)),
      run[(Long, String, String)]("curate_full", docRows, Seq("doc_id", "source", "text"),
        df => graft.streaming.StreamingCurate.curateFull(spark, df, contaminated)),
      run[(Long, String, String)]("curate_full_bloom", docRows, Seq("doc_id", "source", "text"),
        df => graft.streaming.StreamingCurate.curateFullBloom(spark, df, benchSketch)),
      run[(Long, String, String)]("dedup_keep_first", docRows, Seq("doc_id", "source", "text"),
        df => graft.streaming.StreamingDedup.keepFirst(spark, df, "text", "doc_id")),
      run[(Long, String, String)]("lsh_verified", docRows, Seq("doc_id", "source", "text"),
        df => graft.streaming.StreamingDedup.lshVerified(spark, df, "text", "doc_id")),
      run[(java.sql.Timestamp, Long, Long)]("sessionize", evRows, Seq("ts", "user_id", "event_id"),
        df => graft.streaming.StreamingSessionize.sessionize(spark, df)),
      run[(Long, String, String)]("pack", docRows, Seq("doc_id", "source", "text"),
        df => graft.streaming.StreamingPack.pack(spark, df)),
      // the reference-core time-series half of the streaming surface:
      // watermarked tumbling bucket-mean (state = open windows) and the
      // per-key Welford adapt (O(1) state per key)
      run[(java.sql.Timestamp, Long, Double)]("bucket_mean", evVals, Seq("ts", "user_id", "value"),
        df => graft.streaming.StreamingResample.bucketMean(df, "ts", "value", 60)),
      run[(java.sql.Timestamp, Long, Double)]("welford_adapt", evVals, Seq("ts", "user_id", "value"),
        df => graft.streaming.StreamingResample.streamingAdapt(spark, df, "user_id", "value")),
      // the multimodal admission stages: in-stream decode→perceptual-hash
      // (stateless mapPartitions) + keyed keep-first — state is one row
      // per DISTINCT hash, never per asset
      run[(Long, Array[Byte])]("image_admit", imgRows, Seq("asset_id", "payload"),
        df => graft.streaming.StreamingImage.phashKeepFirst(spark, df)),
      run[(Long, Array[Byte])]("audio_admit", wavRows, Seq("asset_id", "payload"),
        df => graft.streaming.StreamingImage.ahashKeepFirst(spark, df)),
      // the VIDEO modality: in-stream y4m walk → whole-clip signature
      // (stateless, payload never shuffles) + keep-first keyed by the
      // DISTINCT signature string — completes the four-modality funnel
      run[(Long, Array[Byte])]("video_admit", vidRows, Seq("asset_id", "payload"),
        df => graft.streaming.StreamingVideo.sigKeepFirst(spark, df)),
      // the CMS LM gate: model as a plan reference, ZERO state rows —
      // throughput here is pure codegen scoring cost
      run[(Long, String, String)]("curate_lm", docRows, Seq("doc_id", "source", "text"),
        df => graft.streaming.StreamingCurate.curateLm(spark, df, lmModel)),
      // the live per-source data card: native stateful aggregation in
      // complete mode — state is O(sources x counters) however many docs
      // stream through; memberships join stream-static (batch-learned)
      run[(Long, String, Long, String)]("data_card", docCardRows,
        Seq("doc_id", "source", "n_chars", "text"),
        df => graft.streaming.StreamingCurate.dataCard(spark, df, cardDup, cardContam),
        outputMode = "complete"),
      // continuous retrieval-index admission: chunk → feature-hash embed
      // → per-table LSH buckets, all stateless codegen — throughput is
      // pure expression cost, zero state rows
      run[(Long, String)]("index_admit",
        docRows.map(t => (t._1, t._3)), Seq("doc_id", "text"),
        df => graft.queries.SimQueries.fhChunkVecsOn(df)
          .select(col("doc_id"), col("chunk_idx"), col("buckets"))),
      // the Gopher structural-rule gate: every rule input is a codegen
      // projection of the row's own text — ZERO state, the
      // cheap-gates-first front of the streaming funnel
      run[(Long, String, String)]("rules_gate", docRows, Seq("doc_id", "source", "text"),
        df => graft.streaming.StreamingCurate.rulesGate(spark, df)
          .select(col("doc_id"), col("source"))),
      // the CCNet head/middle/tail cut: CMS scoring (plan-literal model)
      // + two comparisons against a broadcast ≤|langs|-row threshold
      // relation — ZERO state, pure expression cost
      run[(Long, String, String)]("ccnet_assign",
        docLangRows, Seq("doc_id", "lang", "text"),
        df => graft.streaming.StreamingCurate.ccnetAssign(
          spark, df, lmModel, ccnetThresholds)),
      // the stream-stream shape: dual-watermark interval self-join —
      // state is BOTH join buffers, finite only because the time-range
      // condition lets the engine evict (the bound below pins that)
      run[(java.sql.Timestamp, Long, Long, String, Double)]("join_attrib",
        evFullRows, Seq("ts", "user_id", "event_id", "event_type", "value"),
        df => graft.streaming.StreamingJoin.attributedPurchases(df, tolSec = 3600L)),
      // continuous graph-index admission: assign primary cell (plan-
      // literal centroids) → score against that cell's members
      // (stream-static join) → emit scored candidate edges; the batch
      // compaction (ann_graph_append) finalizes top-degree selection.
      // ZERO state; rows_out fans out by the cell size.
      run[(Long, Array[Float])]("graph_admit",
        embIncRows, Seq("vec_id", "embedding"),
        df => graft.queries.SimQueries.graphAdmitCandidates(
          df, graphCents, graphMembers)),
      // winnowing-fingerprint admission: arriving docs' selected
      // fingerprints probe the published base index (stream-static
      // join); candidate (doc, base) hits out, the batch incremental
      // finalizes pair thresholds. ZERO state; rows_out fans out by
      // index hits.
      run[(Long, String, String)]("winnow_admit",
        docIncRows, Seq("doc_id", "source", "text"),
        df => graft.queries.DedupQueries.winnowAdmitCandidates(df, winnowIdx)),
      // watermark provenance gate: greenlist z-score per arriving doc
      // (Kirchenbauer et al. 2023 detection) — pure per-row expression
      // chain, ZERO state; the front-of-funnel synthetic-text screen
      run[(Long, String, String)]("watermark_gate",
        docRows, Seq("doc_id", "source", "text"),
        df => graft.queries.TextCorpus.watermarkScores(
          df.select(col("doc_id"), col("text")))),
      // EVENT-TIME bounded dedup: the engine's dropDuplicatesWithinWatermark
      // — state is the horizon's keys, evicted natively; contrasts with
      // dedup_keep_first's forever-state exact dedup above
      run[(java.sql.Timestamp, Long, Long, String, Double)]("dedup_ttl",
        evFullRows, Seq("ts", "user_id", "event_id", "event_type", "value"),
        df => graft.streaming.StreamingDedup.keepFirstWithinWatermark(
          df, Seq("user_id", "event_type"), "ts", "1 hour")),
      // STREAMING SERVE: each trigger's query batch beam-searched against
      // the persisted src-bucketed edge table via foreachBatch (per-query
      // top-k pruning needs a window per hop — inexpressible in the pure
      // streaming planner) — the low-latency lookup stage completing the
      // index lifecycle. ZERO state; rows_out = k per query.
      runServe[(Long, Array[Float])]("graph_serve",
        embIncRows, Seq("vec_id", "embedding"),
        batch => graft.queries.SimQueries.graphServeBatch(spark, sfDir, batch)),
      // STREAMING SERVE for the IVF index (the graph_serve symmetry on
      // the quantization axis): per-trigger query vectors probed
      // against the persisted codebook, ranked cell-locally against
      // the cell-bucketed corpus table (per-query top-k window →
      // foreachBatch). ZERO state; rows_out = k per query.
      runServe[(Long, Array[Float])]("ivf_serve",
        embIncRows, Seq("vec_id", "embedding"),
        batch => graft.queries.SimQueries.ivfServeBatch(spark, sfDir, batch)),
    )

    // ---- regression thresholds: the artifact asserts on itself ----
    // Three families of bounds, from loosest-coupled to tightest:
    //  - bytes per STATE ROW (scale-free: per-entity state size doesn't
    //    depend on corpus size) at ~2x the measured sf0.1 values — a
    //    state-schema regression (an accidentally retained text column,
    //    a vector where a hash belongs) trips this immediately;
    //  - STRUCTURAL state-row bounds — each pipeline's O(·) state shape
    //    stated as an inequality against its own run (pack: O(shards);
    //    bucket_mean: watermark-bounded open windows; keep-first: at
    //    most one row per input fingerprint) — an eviction bug that
    //    turns O(shards) into O(rows) trips this at any scale;
    //  - rows/sec floors set 10-20x BELOW measured idle throughput:
    //    only a catastrophic regression (per-row recompile, quadratic
    //    state scan) trips them, co-tenant box load cannot (the r12
    //    lesson: tight wall-clock bounds on a shared box false-alarm).
    // maxBytesPerStateRow applies only with >= 16 state rows (below that
    // the state store's fixed per-partition overhead dominates the
    // ratio); small-state pipelines get an absolute total-bytes cap
    // instead (their state is O(shards)/O(open windows) by construction,
    // so a total cap IS the right invariant).
    final case class Bound(maxBytesPerStateRow: Double,
                           maxStateRows: Result => Long,
                           minRowsPerSec: Double,
                           maxTotalStateBytes: Long = Long.MaxValue)
    val bounds: Map[String, Bound] = Map(
      "curate" -> Bound(600, r => r.rowsOut, 25),            // one fp row per survivor
      "curate_full" -> Bound(600, r => r.rowsOut, 25),
      // same keep-first state shape as curate_full; the screen itself is
      // stateless (sketch is a plan literal, not state)
      "curate_full_bloom" -> Bound(600, r => r.rowsOut, 25),
      "dedup_keep_first" -> Bound(600, r => r.rowsIn, 25),   // one row per distinct fp
      "lsh_verified" -> Bound(1400, r => 8 * r.rowsIn, 25),  // bands + shingle sets
      "sessionize" -> Bound(900, r => r.rowsIn, 500),        // one row per live user
      "pack" -> Bound(2100, _ => 64, 25, 2L << 20),          // ONE long per source shard
      "bucket_mean" -> Bound(250000, _ => 64, 500, 8L << 20), // open windows only
      "welford_adapt" -> Bound(900, r => r.rowsIn, 500),     // one row per key
      "image_admit" -> Bound(600, r => r.rowsIn, 25),        // one row per distinct phash
      "audio_admit" -> Bound(600, r => r.rowsIn, 25),        // one row per distinct ahash
      // one keeper long keyed by the 32-char signature string — the
      // per-distinct-signature state contract (bytes/row a bit above the
      // long-keyed modalities because the key is a string)
      "video_admit" -> Bound(900, r => r.rowsIn, 25),
      "curate_lm" -> Bound(600, _ => 0, 25, 1L << 20),       // STATELESS: zero state rows
      // one aggregation row per SOURCE regardless of corpus size; the
      // absolute caps are the structural invariant (sources is a small
      // fixed set), per-row bytes is meaningless at this cardinality
      "data_card" -> Bound(1 << 20, _ => 64, 25, 4L << 20),
      "index_admit" -> Bound(600, _ => 0, 25, 1L << 20),     // STATELESS
      "graph_admit" -> Bound(600, _ => 0, 25, 1L << 20),     // STATELESS
      "winnow_admit" -> Bound(600, _ => 0, 25, 1L << 20),    // STATELESS
      "watermark_gate" -> Bound(600, _ => 0, 25, 1L << 20),  // STATELESS
      "graph_serve" -> Bound(600, _ => 0, 25, 1L << 20),     // STATELESS (foreachBatch)
      "ivf_serve" -> Bound(600, _ => 0, 25, 1L << 20),       // STATELESS (foreachBatch)
      "rules_gate" -> Bound(600, _ => 0, 25, 1L << 20),      // STATELESS
      "ccnet_assign" -> Bound(600, _ => 0, 25, 1L << 20),    // STATELESS
      // join buffers must EVICT: without the time-range condition state
      // would hold every purchase/click ever seen (~40% of rowsIn);
      // rowsIn/10 only passes when the watermark horizon works. Measured
      // state is ~80 rows (sf0.1) — fixed per-partition store overhead
      // dominates bytes/row at that cardinality, so like pack/bucket_mean
      // the absolute byte cap is the meaningful size invariant
      "join_attrib" -> Bound(1 << 20, r => r.rowsIn / 10, 250, 8L << 20),
      // horizon keys only — eviction working means state ≪ stream keys;
      // per-row bytes meaningless at that cardinality (the join_attrib
      // rationale), absolute cap is the size invariant
      "dedup_ttl" -> Bound(1 << 20, r => r.rowsIn / 10, 250, 8L << 20),
    )
    val violations = results.flatMap { r =>
      bounds.get(r.name).toSeq.flatMap { b =>
        val perRow = if (r.stateRows > 0) r.stateBytes.toDouble / r.stateRows else 0.0
        val rps = r.rowsIn / math.max(r.wallSec, 1e-9)
        Seq(
          Option.when(r.stateRows >= 16 && perRow > b.maxBytesPerStateRow)(
            f"${r.name}: ${perRow}%.0f bytes/state-row > ${b.maxBytesPerStateRow}%.0f"),
          Option.when(r.stateRows > b.maxStateRows(r))(
            s"${r.name}: ${r.stateRows} state rows > structural bound ${b.maxStateRows(r)}"),
          Option.when(r.stateBytes > b.maxTotalStateBytes)(
            s"${r.name}: ${r.stateBytes} state bytes > cap ${b.maxTotalStateBytes}"),
          // floors only where input amortizes fixed micro-batch overhead
          // (the driver's canonical sf0.1 run always qualifies)
          Option.when(r.rowsIn >= 5000 && rps < b.minRowsPerSec)(
            f"${r.name}: ${rps}%.0f rows/sec < floor ${b.minRowsPerSec}%.0f"),
        ).flatten
      }
    }

    def row(r: Result): String =
      f"""{"name":"${r.name}","rows_in":${r.rowsIn},"rows_out":${r.rowsOut},""" +
      f""""batches":${r.batches},"wall_sec":${r.wallSec}%.3f,""" +
      f""""rows_per_sec":${r.rowsIn / math.max(r.wallSec, 1e-9)}%.0f,""" +
      f""""state_rows":${r.stateRows},"state_bytes":${r.stateBytes}}"""
    val violJson = violations.map(v => "\"" + v + "\"").mkString("[", ",", "]")
    val json = s"""{"sf":"$sfDir","chunks":$chunks,"violations":$violJson,""" +
      s""""pipelines":[${results.map(row).mkString(",")}]}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("streambench_full.json"), json)
    println(json)
    spark.stop()
    if (violations.nonEmpty) {
      // artifact is written and printed above; now fail LOUDLY so a
      // state/throughput regression cannot drift through a round unseen
      System.err.println(s"STREAMBENCH THRESHOLD VIOLATIONS:\n  ${violations.mkString("\n  ")}")
      sys.exit(1)
    }
  }
}
