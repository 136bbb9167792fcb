package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.text.TextOps

/** Streaming counterparts of the exact-dedup family: a training-data
  * ingest pipeline dedups CONTINUOUSLY, not in one batch pass — each
  * arriving document is admitted iff its canonical fingerprint was never
  * seen (within the retention bound), and duplicates are mapped to their
  * keeper for provenance.
  *
  * Scale design: state is keyed by the 128-bit fingerprint, so it
  * hash-partitions across executors like the batch `exactGroups`
  * aggregation; only (fp → keeper id) longs are stored, never text.
  * `exactDedup` bounds state with the watermark
  * (`dropDuplicatesWithinWatermark` — the built-in evicts fingerprints
  * older than the watermark, the standard retention contract for
  * unbounded corpora); `keepFirst` keeps O(1) state per distinct
  * fingerprint, bounded by an optional idle-TTL (processing-time
  * timeout) for unbounded corpora.
  */
object StreamingDedup {

  /** First-occurrence pass-through: admit a document iff its canonical
    * fingerprint has not been seen within the watermark retention.
    * Appends the `fp` column (callers drop it if unwanted).
    */
  def exactDedup(docs: DataFrame, tsCol: String, textCol: String,
                 watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("fp", TextOps.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fp")

  case class FpDoc(fp: String, docId: Long)

  /** Incremental keep-first resolution (the streaming `dupOfFirst`):
    * per fingerprint, the first-admitted document becomes the keeper;
    * every later arrival emits (doc_id, dup_of = keeper). Within one
    * micro-batch arrival order is nondeterministic, so the batch's
    * members are ordered by id before admission (smallest id = keeper,
    * matching the batch `exactGroups`/`dupOfFirst` tie-break); across
    * micro-batches the EARLIER batch's keeper wins — true streaming
    * semantics.
    *
    * `ttl` bounds state on an unbounded corpus: a fingerprint idle
    * longer than the TTL is evicted (processing-time timeout), so a
    * later re-arrival of the same text is admitted as a NEW keeper —
    * the same retention trade [[exactDedup]] makes via its watermark.
    * `None` keeps state forever (bounded corpora / upstream retention).
    */
  def keepFirstFn(ttl: Option[String])(fp: String, rows: Iterator[FpDoc],
                  state: GroupState[Long]): Iterator[(Long, Long)] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val sorted = rows.map(_.docId).toSeq.sorted
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var keeper = if (state.exists) Some(state.get) else None
    sorted.foreach { id =>
      keeper match {
        case None => keeper = Some(id) // first ever seen: admit silently
        // a redelivery of the keeper itself (at-least-once sources) must
        // not emit (k, k) — that would mark the only copy a duplicate
        case Some(k) if id != k => out += ((id, k))
        case _ => ()
      }
    }
    keeper.foreach { k =>
      state.update(k)
      // re-arm on every batch that touches the key: TTL measures IDLE
      // time, so hot duplicates never expire mid-stream
      ttl.foreach(state.setTimeoutDuration)
    }
    out.iterator
  }

  /** Wire [[keepFirstFn]] over a streaming document frame: emits one
    * (doc_id, dup_of) row per detected duplicate. Pass `ttl` (e.g.
    * `"1 hour"`) to bound per-fingerprint state on unbounded corpora.
    */
  def keepFirst(spark: SparkSession, docs: DataFrame,
                textCol: String, idCol: String,
                ttl: Option[String] = None): DataFrame = {
    import spark.implicits._
    val timeout = if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
                  else GroupStateTimeout.NoTimeout
    docs
      .select(TextOps.fingerprint(col(textCol)).as("fp"), col(idCol).cast("long").as("docId"))
      .as[FpDoc]
      .groupByKey(_.fp)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(keepFirstFn(ttl))
      .toDF("doc_id", "dup_of")
  }
}
