package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream event-time joins — the one Structured Streaming shape
  * the per-key stateful modules (sessionize, keep-first, Welford) don't
  * cover: BOTH inputs are unbounded, so the engine must buffer each side
  * in state and the join condition itself has to bound that buffer.
  *
  * The reference declares streaming but never implements it
  * (powerdatapipeline config.py:89-90); its batch "datafusion" joins
  * (join_time_align / join_asof) imply exactly this incremental
  * counterpart: continuous attribution of one event stream against
  * another within a time tolerance.
  *
  * Scale design: the dual watermark + range predicate is what makes the
  * state FINITE — Spark derives a per-side state watermark from
  * `watermark ± tolSec` and evicts buffered rows the moment no future
  * input could still match them. Without the time-range condition the
  * buffers grow with the stream and the query is a slow OOM; with it,
  * state is O(rows inside the tolerance+watermark horizon), independent
  * of stream length. StreamBench pins that eviction structurally
  * (state rows ≪ input rows) and prices the throughput.
  */
object StreamingJoin {

  /** Continuous purchase←click attribution by self-splitting one event
    * stream: every (purchase, click) pair of the same user where the
    * click lands in `[p_ts − tolSec, p_ts]`. Inner join in append mode —
    * each pair emits exactly once, when both sides have arrived.
    *
    * Input columns: `ts, user_id, event_id, event_type, value`. The two
    * sides are filters of the SAME input stream (a stream-stream
    * self-join), so one ingest feeds both buffers — the shape a
    * single-firehose event bus serves.
    */
  def attributedPurchases(events: DataFrame, tolSec: Long,
                          watermark: String = "1 hour"): DataFrame = {
    val p = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_ts"), col("value").as("purchase_value"))
      .withWatermark("p_ts", watermark)
    val c = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"), col("value").as("click_value"))
      .withWatermark("c_ts", watermark)
    p.join(c,
        col("user_id") === col("c_user")
          && col("c_ts") <= col("p_ts")
          && col("c_ts") >= col("p_ts") - expr(s"INTERVAL $tolSec SECONDS"))
      .select(col("purchase_id"), col("user_id"), col("p_ts"),
        col("click_id"), col("purchase_value"), col("click_value"))
  }
}
