package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.TimeFns

/** Streaming gap-based sessionization — the continuous counterpart of the
  * batch `sessionize` query (WindowQueries.scala): per user, a session
  * closes when no event arrives within the gap; each closed session emits
  * exactly one (user_id, session_idx, n_events, start_us, end_us,
  * duration_us) row, identical to the batch window's output.
  *
  * Built on `flatMapGroupsWithState` + event-time timeout rather than
  * Spark's `session_window`: the batch semantics are "a gap STRICTLY
  * greater than `gapUs` starts a new session" with exact integer
  * epoch-micro arithmetic, and the output carries a per-user 1-based
  * `session_idx` — neither of which `session_window` (gap merge on an
  * engine-chosen boundary, no session counter) reproduces.
  *
  * Mechanics: intermediate sessions close INLINE when the event that
  * breaches the gap arrives (no timeout involved — exact, regardless of
  * watermark); only the trailing open session needs the event-time
  * timeout, firing once the watermark passes `end + gap`. After the flush
  * the state keeps a closed placeholder (`n = 0`) so `session_idx`
  * continues across the user's next session.
  *
  * State footprint: 4 longs per user EVER SEEN, not per active user —
  * placeholders are what carry the session counter, so by default they
  * are never evicted, and a long-running stream with user churn grows
  * state monotonically. For that regime pass `placeholderTtlUs`: a
  * placeholder untouched for the TTL past its session's gap horizon is
  * removed (a second event-time timeout), trading exact `session_idx`
  * continuity — a user returning after the TTL restarts at idx 1 — for
  * bounded per-ACTIVE-user state. Session boundaries, counts, and
  * timestamps are unaffected by eviction; only the index restarts.
  *
  * Caveat shared with every watermark design: an event arriving AFTER its
  * session was flushed by timeout (i.e. later than the watermark delay)
  * starts a NEW session rather than reopening the emitted one — choose
  * `watermark` to cover source lateness.
  */
object StreamingSessionize {

  /** `ts` rides along purely as the watermark column (event-time timeout
    * requires it on the grouped input); the session logic uses only the
    * exact integer `e_us`.
    */
  case class Ev(user_id: Long, event_id: Long, e_us: Long,
                ts: java.sql.Timestamp)
  case class SessState(idx: Long, start_us: Long, end_us: Long, n: Long)
  case class SessionRow(user_id: Long, session_idx: Long, n_events: Long,
                        start_us: Long, end_us: Long, duration_us: Long)

  private def row(user: Long, s: SessState): SessionRow =
    SessionRow(user, s.idx, s.n, s.start_us, s.end_us, s.end_us - s.start_us)

  /** Per-user transition: fold this micro-batch's events (sorted by
    * (e_us, event_id), the batch query's order) into the open session,
    * emitting every session closed by a gap breach; on timeout, emit the
    * open session and leave a closed placeholder carrying the counter.
    */
  def sessionFn(gapUs: Long, placeholderTtlUs: Option[Long] = None)(
      user: Long, rows: Iterator[Ev],
      state: GroupState[SessState]): Iterator[SessionRow] = {
    if (state.hasTimedOut) {
      val s = state.get
      if (s.n == 0) {
        // placeholder TTL fired: evict the counter (session_idx restarts
        // at 1 if this user ever returns)
        state.remove()
        return Iterator.empty
      }
      state.update(SessState(s.idx, s.end_us, s.end_us, 0))
      placeholderTtlUs match {
        case Some(ttl) =>
          // second-stage timeout: reap the placeholder once the watermark
          // passes end + ttl (clamped above the watermark like below)
          val at = s.end_us / 1000 + ttl / 1000 + 1
          state.setTimeoutTimestamp(math.max(at, state.getCurrentWatermarkMs + 1))
        case None =>
          () // no new timeout: the placeholder is inert until the next event
      }
      return Iterator.single(row(user, s))
    }
    val evs = rows.toSeq.sortBy(e => (e.e_us, e.event_id))
    val closed = Seq.newBuilder[SessionRow]
    var st = state.getOption.orNull
    evs.foreach { e =>
      st = st match {
        case null => SessState(1, e.e_us, e.e_us, 1)
        case s if s.n == 0 => SessState(s.idx + 1, e.e_us, e.e_us, 1)
        case s if e.e_us - s.end_us > gapUs =>
          closed += row(user, s)
          SessState(s.idx + 1, e.e_us, e.e_us, 1)
        case s =>
          SessState(s.idx, math.min(s.start_us, e.e_us),
            math.max(s.end_us, e.e_us), s.n + 1)
      }
    }
    state.update(st)
    if (st.n > 0) {
      // timeout once the watermark passes end + gap (ms granularity, +1
      // so a watermark landing exactly on the boundary still means "no
      // event can close this session by gap"); clamp above the current
      // watermark — setTimeoutTimestamp rejects timestamps at or behind it
      val at = st.end_us / 1000 + gapUs / 1000 + 1
      state.setTimeoutTimestamp(math.max(at, state.getCurrentWatermarkMs + 1))
    }
    closed.result().iterator
  }

  /** Wire sessionization over a streaming event frame with `user_id`,
    * `event_id`, `ts` (timestamp) columns. Emits closed sessions; the
    * trailing session per user emits when the watermark passes its
    * gap horizon.
    */
  def sessionize(spark: SparkSession, events: DataFrame,
                 gapUs: Long = 1800L * 1000000L,
                 watermark: String = "0 seconds",
                 placeholderTtlUs: Option[Long] = None): DataFrame = {
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        TimeFns.epochMicros(col("ts")).as("e_us"), col("ts"))
      .withWatermark("ts", watermark)
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(sessionFn(gapUs, placeholderTtlUs))
      .toDF("user_id", "session_idx", "n_events", "start_us", "end_us",
        "duration_us")
  }
}
