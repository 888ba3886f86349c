package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ext.Similarity

/** Continuous ANN index ingest — the streaming twin of the incremental
  * append (X111/X112): each micro-batch of newly-arrived embeddings is
  * assigned to the FROZEN persisted centroid model and appended to the
  * hive-partitioned inverted lists (`Similarity.ivfIndexAppend`), so the
  * searchable index trails the embedding stream by one trigger interval
  * between scheduled model rebuilds.
  *
  * Why foreachBatch and not a streaming aggregation: the index write is a
  * BATCH sink contract (partitioned parquet append touching only the
  * batch's buckets) and the assignment is stateless per row — there is no
  * streaming state to manage, so the correct shape is the micro-batch
  * boundary Structured Streaming already provides. The checkpoint plus the
  * batchId-keyed idempotent append make restarts EXACTLY-ONCE: a replayed
  * batch either retracts and re-publishes its own token-prefixed files
  * (crash before the token's commit marker) or no-ops entirely (marker
  * present — `Similarity.ivfIndexAppendIdempotent`), so a crash-replay can
  * never park duplicate vectors in adjacent top-k ranks. The commit
  * markers make this hold even when a scheduled `ivfIndexCompact` runs
  * between the crash and the replay (compaction erases the file prefixes
  * but not the markers, and refuses to run over an unmarked in-flight
  * batch); StreamingSpec pins the whole matrix with an injected
  * crash-after-publish, restart-from-checkpoint run.
  *
  * `Trigger.AvailableNow` = "index whatever has arrived, then stop" (the
  * cron-driven ingest); a processing-time trigger makes it continuous.
  */
object StreamingIndexIngest {
  def start(deltas: DataFrame, idCol: String, vecCol: String, path: String,
            checkpoint: String,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    deltas.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          Similarity.ivfIndexAppendIdempotent(batch, idCol, vecCol, path,
            s"b$batchId")
        ()
      }
      .start()

  /** Streaming RETRACTION — the delete twin of [[start]] (X112b), closing
    * the streaming side of the index lifecycle: each micro-batch of
    * takedown ids is retracted from the persisted lists via the
    * token-idempotent delete, so a crash-replay is exactly-once by the
    * same commit-marker discipline. Append and delete tokens live in
    * structurally disjoint namespaces (`tokens/append/` vs
    * `tokens/delete/` markers, `A.<token>-` vs `D.<token>-` file
    * prefixes), so one index can be fed and retracted by two
    * checkpointed streams — the `b`/`d` batchId prefixes here are just
    * readability; serialization between the two streams is the caller's
    * single-mutator contract every index mutation shares. */
  def startRetract(ids: DataFrame, idCol: String, path: String,
                   checkpoint: String,
                   trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    ids.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          Similarity.ivfIndexDeleteIdempotent(batch, idCol, path,
            s"d$batchId")
        ()
      }
      .start()
}
