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

    /** Feed `rows` to `pipe`'s input stream in `chunks` micro-batches,
      * draining each before the next (the steady-state regime), and pull
      * the engine's own progress counters afterwards.
      */
    def run[T: org.apache.spark.sql.Encoder](name: String, rows: Seq[T],
        cols: Seq[String], pipe: DataFrame => DataFrame): Result = {
      val stream = MemoryStream[T]
      val out = pipe(stream.toDF().toDF(cols: _*))
      val q = out.writeStream.outputMode("append").format("memory")
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

    val results = Seq(
      run[(Long, String, String)]("curate", docRows, Seq("doc_id", "source", "text"),
        df => graft.streaming.StreamingCurate.curate(spark, df)),
      run[(Long, String, String)]("curate_full", docRows, Seq("doc_id", "source", "text"),
        df => graft.streaming.StreamingCurate.curateFull(spark, df, contaminated)),
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
    )

    def row(r: Result): String =
      f"""{"name":"${r.name}","rows_in":${r.rowsIn},"rows_out":${r.rowsOut},""" +
      f""""batches":${r.batches},"wall_sec":${r.wallSec}%.3f,""" +
      f""""rows_per_sec":${r.rowsIn / math.max(r.wallSec, 1e-9)}%.0f,""" +
      f""""state_rows":${r.stateRows},"state_bytes":${r.stateBytes}}"""
    val json = s"""{"sf":"$sfDir","chunks":$chunks,"pipelines":[${results.map(row).mkString(",")}]}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("streambench_full.json"), json)
    println(json)
    spark.stop()
  }
}
