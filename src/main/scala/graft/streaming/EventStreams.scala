package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Structured Streaming forms of the event operators (SURVEY §2.8): the
  * reference's batch "process exactly the delta each run" model
  * (README.md:10-13) generalizes to continuous incremental processing.
  * Each transform is source-agnostic (`DataFrame => DataFrame`), so the
  * same code runs over `readStream` (incremental, stateful) and `read`
  * (batch backfill) — Spark's native batch/streaming unification.
  *
  * Scale: state is partitioned by group key in the state store; the
  * watermark bounds state size (late rows beyond it are dropped), which is
  * what makes the operators runnable indefinitely at 100 TB/day.
  */
object EventStreams {

  /** Watermarked tumbling-window counts — the streaming form of
    * Events.tumbling (X4). Append mode emits each hour once its watermark
    * passes; schema matches the batch form.
    */
  def tumblingCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).cast(LongType).as("hour_ts"),
        col("event_type"), col("n"))

  /** Watermarked sliding-window counts — the streaming form of
    * Events.slidingCounts (X43): hopping 1h windows every 15min, each
    * event counted in width/slide windows, state evicted per window as
    * the watermark passes its end. Schema matches the batch form.
    */
  def slidingCounts(events: DataFrame, width: String = "1 hour",
                    slide: String = "15 minutes",
                    watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).cast(LongType).as("win_ts"),
        col("event_type"), col("n"))

  /** Gap-based sessionization via the native session_window — the
    * streaming form of Events.sessionize (X5): sessions close when no
    * event arrives within `gap`, state evicted by the watermark.
    */
  def sessions(events: DataFrame, gap: String = "30 minutes",
               watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_timestamp(col("session_window.start")).cast(LongType).as("start_ep"),
        unix_timestamp(col("session_window.end")).cast(LongType).as("end_ep"),
        col("n_events"))

  /** Stream-stream interval join — the streaming twin of Events.correlate:
    * (A, B) pairs of the same user with B inside (A.ts, A.ts + within].
    * Both sides are watermarked and the join condition bounds event time
    * in BOTH directions, so each side's state store holds only `within` +
    * watermark worth of rows per user — the requirement for an unbounded
    * stream-stream inner join to run forever. Output schema matches the
    * batch form (user_id, a_id, b_id, gap_us).
    */
  def correlate(a: DataFrame, b: DataFrame, withinSec: Long,
                watermark: String = "2 hours"): DataFrame = {
    val av = a.select(col("user_id").as("a_user"), col("ts").as("a_ts"),
      col("event_id").as("a_id")).withWatermark("a_ts", watermark)
    val bv = b.select(col("user_id").as("b_user"), col("ts").as("b_ts"),
      col("event_id").as("b_id")).withWatermark("b_ts", watermark)
    av.join(bv, col("a_user") === col("b_user")
        && col("b_ts") > col("a_ts")
        && col("b_ts") <= col("a_ts") + expr(s"interval $withinSec seconds"))
      .select(col("a_user").as("user_id"), col("a_id"), col("b_id"),
        (unix_micros(col("b_ts")) - unix_micros(col("a_ts"))).as("gap_us"))
  }

  /** Streaming exact dedup — the continuous form of Dedup.exact (X1):
    * documents whose content hash was already seen within the watermark
    * horizon are dropped. State = one row per distinct hash, evicted once
    * the watermark passes — the property that lets a 100 TB/day ingest
    * dedup run forever with bounded state. (Cross-horizon dedup is the
    * batch job's mandate; the two compose.)
    */
  def dedupStream(docs: DataFrame, idCol: String, textCol: String,
                  tsCol: String, watermark: String = "24 hours"): DataFrame =
    docs
      .select(col(idCol), col(tsCol), md5(col(textCol)).as("h"))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("h")

  /** Deterministic streaming exact dedup — the aggregate form of
    * Dedup.exact: per content hash, keep min(id) and the copy count as a
    * streaming aggregation. Unlike [[dedupStream]]'s keep-first (whose
    * survivor depends on arrival order — right for bounded-state ingest,
    * wrong for an oracle), min() is arrival-order-independent, so the
    * complete-mode final table equals the batch dedup EXACTLY on any
    * interleaving of micro-batches. State = one row per distinct hash
    * (unbounded horizon — the batch-job mandate; compose with
    * [[dedupStream]] for watermark-bounded ingest).
    */
  def dedupAggStream(docs: DataFrame, idCol: String,
                     textCol: String): DataFrame =
    docs.select(md5(col(textCol)).as("h"), col(idCol))
      .groupBy("h")
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("n_dups"))

  /** Stream-static enrichment join + rollup — the remaining streaming join
    * form next to [[correlate]]'s stream-stream: each micro-batch of the
    * event stream joins a STATIC dimension (broadcast — the dim is
    * cluster-small while the stream is unbounded, so shuffling the stream
    * to meet it would be the scale error), then rolls up counts per
    * (dim attribute, event_type). Stateless join + streaming aggregation:
    * counts are arrival-order-independent, so the complete-mode final
    * table equals the batch join+group exactly on any micro-batch split.
    */
  def enrichedCounts(events: DataFrame, dim: DataFrame, eventKey: String,
                     dimKey: String, dimAttr: String): DataFrame =
    events.join(broadcast(dim), col(eventKey) === col(dimKey))
      .groupBy(col(dimAttr), col("event_type"))
      .agg(count(lit(1)).as("n"))
}
