package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sync.{SyncEngine, SyncResult}

/** Streaming driver for the sync engine: the reference's "re-run the tool
  * when HDFS changes" operational loop (README.md:10-13) as a checkpointed
  * Structured Streaming query. Each micro-batch must carry ONE complete
  * source snapshot of (shard_id, shard_length, hostname); the engine diffs
  * it against the catalog and applies the delta — the no-op fast path makes
  * unchanged snapshots free, exactly like the batch tool.
  *
  * `Trigger.AvailableNow` = "process whatever snapshots have arrived, then
  * stop": the cron-driven batch deployment. A processing-time trigger makes
  * it continuous. The checkpoint makes redelivery safe: sync is idempotent,
  * so an at-least-once replay of a snapshot converges to the same catalog.
  */
class StreamingSync(engine: SyncEngine, tableId: Long) {

  /** `workerApply`: when given, micro-batches run the FAULT-TOLERANT sync
    * (per-placement worker failures logged and skipped, structural guards
    * still abort — T4); omitted, the strict all-or-nothing path. A skipped
    * drop simply stays in the catalog and is retried by the next snapshot's
    * diff — the streaming loop IS the reference's "re-run until converged"
    * operational behavior.
    *
    * `onResult` receives each tolerant batch's SyncResult — the skipped-
    * operation accounting (the reference's log-and-skip log lines). The
    * default logs to stderr so persistent divergence (a host failing every
    * batch) is visible; wire it to metrics in a real deployment.
    */
  def start(snapshots: DataFrame, checkpoint: String,
            trigger: Trigger = Trigger.AvailableNow(),
            workerApply: Option[DataFrame => DataFrame] = None,
            onResult: SyncResult => Unit = StreamingSync.logSkipped): StreamingQuery =
    snapshots.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val pl = batch.select("shard_id", "shard_length", "hostname")
          val ids = pl.select("shard_id").distinct()
          workerApply match {
            case Some(apply) => onResult(engine.syncTolerant(tableId, ids, pl, apply))
            case None => engine.sync(tableId, ids, pl)
          }
        }
        ()
      }
      .start()
}

object StreamingSync {
  /** Default skipped-operation sink: one stderr line per sampled failed
    * worker op (mirrors HdfsSynchronizer's per-placement warnings), plus a
    * summary when the exact count exceeds the sample. */
  val logSkipped: SyncResult => Unit = r => {
    r.skipped.foreach { case (op, shard, len, host) =>
      System.err.println(
        s"[sync] skipped failed $op: shard=$shard length=$len host=$host " +
          s"(committed v${r.version})")
    }
    if (r.skippedCount > r.skipped.length)
      System.err.println(
        s"[sync] …and ${r.skippedCount - r.skipped.length} more skipped ops " +
          s"(committed v${r.version})")
  }
}
