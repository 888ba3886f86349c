package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event in a user's timeline (epoch seconds, second-truncated like the
  * batch sessionizer). */
case class SessionEvent(user_id: Long, event_id: Long, ep: Long)

/** The open (not yet closed) session carried across micro-batches. */
case class OpenSession(start_ep: Long, end_ep: Long, n_events: Long)

/** A closed session — emitted once, when a later event proves the gap. */
case class ClosedSession(user_id: Long, start_ep: Long, end_ep: Long, n_events: Long)

/** Custom-state sessionization via `flatMapGroupsWithState` (SURVEY §2.8):
  * the hand-rolled state-machine form of EventStreams.sessions, for
  * semantics `session_window` can't express (here: emit a session only
  * when a LATER event proves the gap closed it, never on a timer — so
  * results are identical in batch replay and incremental runs).
  *
  * State per user = the one open session (3 longs — bounded regardless of
  * history length). Events may arrive unsorted within a batch (sorted in
  * memory per group-batch; cross-batch order is the caller's contract,
  * e.g. file-source batches by mtime). The final open session per user is
  * never emitted — it could still grow; `drain` emits it in batch mode.
  */
object StatefulSessions {

  val DefaultGapSec = 1800L

  private def step(gapSec: Long)(
      userId: Long, events: Iterator[SessionEvent],
      state: GroupState[OpenSession]): Iterator[ClosedSession] = {
    val sorted = events.toSeq.sortBy(e => (e.ep, e.event_id))
    var open = state.getOption
    val closed = Seq.newBuilder[ClosedSession]
    sorted.foreach { e =>
      open match {
        case Some(s) if e.ep - s.end_ep <= gapSec =>
          open = Some(OpenSession(s.start_ep, e.ep, s.n_events + 1))
        case Some(s) =>
          closed += ClosedSession(userId, s.start_ep, s.end_ep, s.n_events)
          open = Some(OpenSession(e.ep, e.ep, 1))
        case None =>
          open = Some(OpenSession(e.ep, e.ep, 1))
      }
    }
    open.foreach(state.update)
    closed.result().iterator
  }

  /** Events (user_id, event_id, ts) → closed sessions. Works over a
    * streaming Dataset (incremental, checkpointed state) and a batch one
    * (single pass, empty initial state) — same code, same results.
    */
  def closedSessions(events: DataFrame, gapSec: Long = DefaultGapSec)
                    (implicit spark: SparkSession): Dataset[ClosedSession] = {
    import spark.implicits._
    events
      .select(col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("event_id"),
        unix_timestamp(date_trunc("second", col("ts"))).as("ep"))
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        step(gapSec))
  }

  /** Batch-mode helper: the still-open sessions (one per user) that
    * `closedSessions` intentionally withholds. closedSessions ∪ drain ==
    * the batch sessionizer's full output.
    */
  def drain(events: DataFrame, gapSec: Long = DefaultGapSec)
           (implicit spark: SparkSession): DataFrame =
    graft.ext.Events.sessionize(events, gapSec)
      .withColumn("__last", max(col("session_seq"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))))
      .where(col("session_seq") === col("__last"))
      .select(col("user_id"), col("start_ep"), col("end_ep"), col("n_events"))
}
