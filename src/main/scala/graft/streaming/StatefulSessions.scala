package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming sessionization — the
  * `flatMapGroupsWithState` formulation a pipeline reaches for when a
  * session must carry state Spark's built-in `session_window`
  * aggregate can't express (arbitrary per-session accumulators,
  * early emission rules, side outputs). Semantics match the batch
  * `sessionize_events` contract: a new session starts when the gap to
  * the previous event is ≥ `gapMs`.
  *
  * Mechanics: keyed state holds ONE open session per user (constant
  * per key — state size is #active-users, sharded over the state
  * store, never a driver structure). Each micro-batch merges its
  * events into the open session, emitting every session it closes; a
  * session with no successor event closes via EVENT-TIME TIMEOUT when
  * the watermark passes `last + gap` — so the input stream must carry
  * `withWatermark("ts", …)`. Late-data contract: under
  * `EventTimeTimeout` the ENGINE drops input rows older than the
  * watermark before this function ever sees them (same filter as
  * watermarked aggregations — `FlatMapGroupsWithStateExec` applies its
  * late-event predicate exactly when the timeout is event-time), so a
  * straggler whose session already timed out is silently discarded,
  * never re-opened — pinned by WindowedStreamSpec. The residual hazard
  * is out-of-order arrival WITHIN the watermark: an event at or above
  * the watermark but older than the open session's last event fails
  * loudly rather than silently corrupting session boundaries.
  */
object StatefulSessions {

  case class OpenSession(startMs: Long, lastMs: Long, n: Long)
  case class Session(user_id: Long, session_start: Timestamp,
                     session_end: Timestamp, n_events: Long)

  /** Input columns: `user_id` (long), `ts` (timestamp, watermarked).
    * Output: one row per CLOSED session. */
  def sessions(stream: DataFrame, gapMs: Long): Dataset[Session] = {
    require(gapMs > 0, "gapMs must be positive")
    val spark = stream.sparkSession
    import spark.implicits._
    // NB: `ts` is selected UNCAST — a cast would re-derive the column
    // and silently strip the watermark tag the event-time timeout
    // requires (the analyzer then rejects the query)
    stream.select(col("user_id").cast("long"), col("ts"))
      .as[(Long, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, Timestamp)], state: GroupState[OpenSession]) =>
          def close(s: OpenSession) =
            Session(user, new Timestamp(s.startMs), new Timestamp(s.lastMs), s.n)
          if (state.hasTimedOut) {
            // watermark passed last+gap with no successor: the open
            // session can no longer grow
            val out = state.getOption.map(close).iterator
            state.remove()
            out
          } else {
            val ts = rows.map(_._2.getTime).toArray
            java.util.Arrays.sort(ts)
            var open = state.getOption
            open.foreach { s =>
              if (ts.nonEmpty && ts.head < s.lastMs)
                sys.error(s"sessions: out-of-order arrival for user=$user " +
                  s"(${ts.head} < open-session last ${s.lastMs}) — " +
                  "widen the watermark or repair the source ordering")
            }
            // No sub-watermark guard here: rows behind the watermark
            // never reach this function under EventTimeTimeout (the
            // engine's late-event filter runs first — see the class
            // contract), so every row observed here is ≥ the batch's
            // start-of-batch watermark by construction.
            val closed = Seq.newBuilder[Session]
            ts.foreach { t =>
              open = open match {
                case Some(s) if t - s.lastMs < gapMs =>
                  Some(s.copy(lastMs = t, n = s.n + 1))
                case Some(s) =>
                  closed += close(s)
                  Some(OpenSession(t, t, 1))
                case None =>
                  Some(OpenSession(t, t, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              // must be beyond the current watermark or Spark rejects
              // it; max() covers a key whose last event is already far
              // behind the global watermark
              state.setTimeoutTimestamp(
                math.max(s.lastMs + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            closed.result().iterator
          }
      }
  }
}
