package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming concat-and-cut sequence packing — the continuous counterpart
  * of the batch `pack_sequences` offset cumsum: per source shard, a
  * running token offset assigns every arriving document its global start
  * offset `st` and the training sequence (`st DIV seqLen`) it begins in.
  * The continuous training-data feed ends here: curate → chunk → PACK,
  * each stage streaming.
  *
  * State footprint is the operator's point: ONE long per source shard —
  * O(1) per shard, independent of document count (contrast
  * [[StreamingSessionize]]'s per-user rows). No watermark, no timeout,
  * nothing to evict: an offset never expires.
  *
  * Ordering semantics: a streaming packer packs in ARRIVAL order — the
  * honest continuous semantic (the batch query's doc_id order is a
  * presentation choice over a finite corpus). Within a micro-batch the
  * fold sorts by doc_id so each batch is deterministic; batch parity
  * (StreamingSpec) therefore holds exactly when the stream delivers each
  * shard's docs in doc_id order across batches, which is also what a
  * replayed corpus does.
  */
object StreamingPack {

  // doc_id/source are Options, NOT filtered away: the batch cumsum
  // (pack_sequences) only skips null n_tok — a row with a null id or
  // source but countable text still occupies offset space there (null
  // source is its own window partition, null doc_id sorts first), so
  // the stream must pack it too or the asserted batch parity breaks.
  case class Doc(doc_id: Option[Long], source: Option[String], n_tok: Long)
  case class PackState(off: Long)
  case class PackedDoc(doc_id: Option[Long], source: Option[String], st: Long,
                       n_tok: Long, seq_first: Long)

  /** Per-shard transition: fold this micro-batch's docs (sorted by
    * doc_id, None first — the window's asc_nulls_first) over the running
    * offset; emit one assignment row per doc.
    */
  def packFn(seqLen: Long)(
      source: Option[String], rows: Iterator[Doc],
      state: GroupState[PackState]): Iterator[PackedDoc] = {
    var off = state.getOption.map(_.off).getOrElse(0L)
    val out = rows.toSeq.sortBy(_.doc_id).map { d =>
      val st = off
      off += d.n_tok
      PackedDoc(d.doc_id, source, st, d.n_tok, st / seqLen)
    }
    state.update(PackState(off))
    out.iterator
  }

  /** Pack a document stream (doc_id, source, text): token counts follow
    * the batch convention (whitespace tokens + one EOD separator).
    */
  def pack(spark: SparkSession, docs: DataFrame, seqLen: Long = 256): DataFrame = {
    import spark.implicits._
    docs
      .select(col("doc_id"), col("source"),
        (size(graft.text.TextOps.tokens(col("text"))) + 1).cast("long").as("n_tok"))
      // filter ONLY on n_tok, mirroring the batch cumsum exactly: a null
      // n_tok contributes nothing to the batch window sum and its row
      // vanishes at the batch explode, so dropping it here is parity;
      // null doc_id/source ride through as Options (encoder-safe)
      .filter(col("n_tok").isNotNull)
      .as[Doc]
      .groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        packFn(seqLen))
      .toDF("doc_id", "source", "st", "n_tok", "seq_first")
  }
}
