package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** Structured-Streaming counterparts of the batch time-series operators.
  *
  * The reference DECLARES streaming (`use_streaming` /
  * `streaming_data_source`, config.py:89-90) but never implements it —
  * this module delivers it: the resample/bucket-mean and windowed
  * feature flows as incremental queries with event-time watermarks.
  *
  * Scale design: tumbling/sliding windows + watermark bound the state
  * store; per-device keys partition state across executors; the
  * mapGroupsWithState interval audit keeps O(1) state per key.
  */
object StreamingResample {

  /** Streaming time-bucket mean (the incremental `get_downsampled_df`):
    * tumbling event-time window + watermark so late data is bounded and
    * state is evictable.
    */
  def bucketMean(events: DataFrame, tsCol: String, valueCol: String,
                 intervalSec: Long, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), s"$intervalSec seconds").as("w"))
      .agg(avg(col(valueCol)).as("avg_value"), count(lit(1)).as("n"))
      .select(col("w.start").as("bucket_start"), col("avg_value"), col("n"))

  /** Streaming per-key sliding aggregation (windowed features for a
    * device stream): sliding event-time window per key.
    */
  def slidingStats(events: DataFrame, tsCol: String, keyCol: String, valueCol: String,
                   windowSec: Long, slideSec: Long, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(col(keyCol), window(col(tsCol), s"$windowSec seconds", s"$slideSec seconds").as("w"))
      .agg(avg(col(valueCol)).as("avg_value"),
        min(col(valueCol)).as("min_value"), max(col(valueCol)).as("max_value"))
      .select(col(keyCol), col("w.start").as("window_start"),
        col("avg_value"), col("min_value"), col("max_value"))

  case class KeyedValue(key: Long, value: Double)

  /** Streaming per-key adapt: maintains a mergeable Welford state per key
    * (O(1) per key) and emits the running (count, mean, var_pop, min,
    * max) after every batch — the incremental counterpart of
    * `FeatureSpace.adapt` the reference's `use_streaming` flag promised.
    */
  def streamingAdapt(spark: SparkSession, events: DataFrame,
                     keyCol: String, valueCol: String): DataFrame = {
    import spark.implicits._
    import graft.operators.WelfordAgg
    events.select(col(keyCol).cast("long").as("key"), col(valueCol).cast("double").as("value"))
      // match batch adapt's null-skip (avg/var_pop ignore nulls); without
      // this a null value NPEs the encoder and kills the query
      .filter(col("key").isNotNull && col("value").isNotNull)
      .as[KeyedValue]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[KeyedValue], state: GroupState[WelfordAgg.Buf]) =>
          val start = if (state.exists) state.get else WelfordAgg.zero
          val buf = rows.foldLeft(start)((b, r) => WelfordAgg.update(b, r.value))
          state.update(buf)
          val st = WelfordAgg.finish(buf)
          Iterator.single((key, st.n, st.mean, st.varPop, st.min, st.max))
      }
      .toDF("key", "n", "mean", "var_pop", "min", "max")
  }

  case class WindowEvent(key: Long, tsSec: Long, value: Double)

  /** Continuous supervised-example generation — the streaming
    * counterpart of `windowed_dataset_v1` (`WindowOps.supervisedWindow`):
    * per series key, a ring buffer of the last `windowSize` values
    * (O(W) state, no watermark needed — the buffer never grows); each
    * arriving observation that completes a window emits
    * (key, tsSec-of-last-row, input = first W−1 values, target = last).
    * Within a micro-batch events are ordered by event time. Across
    * batches the ring buffer only ever APPENDS, so an event whose
    * timestamp is older than the last buffered one (a late cross-batch
    * arrival — e.g. a Kafka key spread over several partitions) cannot
    * be inserted in place; it is DETECTED AND DROPPED rather than
    * appended out of order, which would silently emit windows that
    * differ from the batch `supervisedWindow` result. Per-key in-order
    * delivery (file source, or one Kafka partition per key) therefore
    * gives exact batch parity; out-of-order delivery degrades to
    * batch-parity-minus-the-late-events, never to wrong windows.
    */
  def supervisedStream(spark: SparkSession, events: DataFrame,
                       keyCol: String, tsSecCol: String, valueCol: String,
                       windowSize: Int): DataFrame = {
    require(windowSize >= 2, s"windowSize must be >= 2, got $windowSize")
    import spark.implicits._
    events.select(col(keyCol).cast("long").as("key"),
        col(tsSecCol).cast("long").as("tsSec"), col(valueCol).cast("double").as("value"))
      .filter(col("key").isNotNull && col("tsSec").isNotNull && col("value").isNotNull)
      .as[WindowEvent]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[WindowEvent], state: GroupState[(Seq[Double], Long)]) =>
          val sorted = rows.toSeq.sortBy(e => (e.tsSec, e.value))
          var (buf, lastTs) = state.getOption.getOrElse((Seq.empty[Double], Long.MinValue))
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(Long, Long, Seq[Double], Double)]
          sorted.foreach { e =>
            if (e.tsSec >= lastTs) { // late regression: drop, don't mis-order
              buf = (buf :+ e.value).takeRight(windowSize)
              lastTs = e.tsSec
              if (buf.size == windowSize) out += ((key, e.tsSec, buf.init, buf.last))
            }
          }
          state.update((buf, lastTs))
          out.iterator
      }
      .toDF("key", "tsSec", "input", "target")
  }

  case class IntervalEvent(key: Long, tsSec: Long)
  case class IntervalAnomaly(key: Long, tsSec: Long, intervalSec: Long, expectedSec: Long)

  /** Stateful interval audit (the streaming `check_time_intervals`):
    * remembers the previous timestamp per key (O(1) state) and emits a
    * record whenever the gap deviates from the declared interval.
    */
  def intervalAuditFn(expectedSec: Long)(
      key: Long, events: Iterator[IntervalEvent],
      state: GroupState[Long]): Iterator[IntervalAnomaly] = {
    val sorted = events.toSeq.sortBy(_.tsSec)
    val out = scala.collection.mutable.ArrayBuffer.empty[IntervalAnomaly]
    var prev = if (state.exists) Some(state.get) else None
    sorted.foreach { e =>
      prev.foreach { p =>
        val gap = e.tsSec - p
        if (gap != expectedSec) out += IntervalAnomaly(key, e.tsSec, gap, expectedSec)
      }
      prev = Some(e.tsSec)
    }
    prev.foreach(state.update)
    out.iterator
  }

  /** Wire the interval audit over a streaming Dataset of events. */
  def intervalAudit(spark: SparkSession, events: DataFrame, keyCol: String, tsSecCol: String,
                    expectedSec: Long): DataFrame = {
    import spark.implicits._
    events.select(col(keyCol).cast("long").as("key"), col(tsSecCol).cast("long").as("tsSec"))
      .as[IntervalEvent]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        intervalAuditFn(expectedSec))
      .toDF()
  }

  case class TsEvent(key: Long, eventId: Long, eUs: Long, value: Double)
  case class MedianOut(event_id: Long, user_id: Long, median: Double)

  /** Per-key rolling-median state transition: the trailing window is
    * ≤ lookback+1 doubles per key — O(1) state, nothing to evict by
    * size. Within a micro-batch events sort by (event time, id) before
    * folding (batch arrival order is nondeterministic); across batches
    * the carried window assumes per-key time-monotonic delivery, the
    * same in-order contract the sessionize and interval-audit stages
    * document.
    */
  def rollingMedianFn(lookback: Int)(key: Long, rows: Iterator[TsEvent],
      state: GroupState[Seq[Double]]): Iterator[MedianOut] = {
    val sorted = rows.toSeq.sortBy(e => (e.eUs, e.eventId))
    var window = if (state.exists) state.get else Seq.empty[Double]
    val out = sorted.map { e =>
      window = (window :+ e.value).takeRight(lookback + 1)
      val srt = window.sorted
      MedianOut(e.eventId, key, srt((srt.size + 1) / 2 - 1))
    }
    state.update(window)
    out.iterator
  }

  /** Streaming counterpart of `ts_rolling_median`: the robust trailing
    * smoother as a continuous per-key operator, lower-median semantics
    * identical to the batch window (exact element selection — the spec
    * asserts bit-equality).
    */
  def rollingMedian(spark: SparkSession, events: DataFrame,
                    lookback: Int = 8): DataFrame = {
    import spark.implicits._
    events
      .filter(col("value").isNotNull)
      .select(col("user_id").cast("long").as("key"),
        col("event_id").cast("long").as("eventId"),
        unix_micros(col("ts")).as("eUs"), col("value").cast("double").as("value"))
      .as[TsEvent]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        rollingMedianFn(lookback))
      .toDF("event_id", "user_id", "median")
  }

  /** Deseasonalize a stream against a BATCH-LEARNED hour-of-day profile
    * (the `ts_seasonal` relation re-derived in micro-unit form): a
    * stream-static broadcast join — the profile is naturally static
    * (learned from history, refreshed by re-deploying), the stream
    * never shuffles, and there is NO state store. The continuous
    * counterpart of `ts_seasonal_adjust`, with the identical exact
    * residual expression (v_u·n − cell_u, one division), so batch and
    * stream residuals are bit-equal (StreamingSpec asserts it).
    */
  def seasonalAdjust(events: DataFrame, profile: DataFrame): DataFrame = {
    val vU = (col("value").cast("decimal(18,6)") * lit(1000000)).cast("long")
    val hourCol = pmod(
      floor(unix_micros(col("ts")) / lit(3600000000L)).cast("long"), lit(24L))
    events
      .select(col("event_id"), col("event_type"), vU.as("v_u"), hourCol.as("hour"))
      .join(broadcast(profile), Seq("event_type", "hour"))
      .select(col("event_id"), col("event_type"), col("hour"),
        // identical ExactRound expression as the batch ts_seasonal_adjust
        (expr(graft.functions.ExactRound.spark("v_u * n - cell_u", "n")).cast("double")
          / lit(1000000.0)).as("resid"))
  }
}
