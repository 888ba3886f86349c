package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ext.Dedup

/** X117 — streaming near-duplicate classification against a FROZEN
  * corpus index: the streaming twin of the incremental delta dedup
  * (X45, `Dedup.dedupDeltaIndexed`). Each micro-batch of newly-arrived
  * documents is shingled, banded, and bucket-joined against the
  * prebuilt corpus-side [[Dedup.DeltaIndex]] — exact-hash match first,
  * LSH-candidate → verified-Jaccard best match second — and the
  * per-document verdicts (`exact_dup` / `near_dup` / `new`) are
  * published to a batchId-keyed parquet directory. This is the online
  * ingest gate a production corpus runs in front of its training set:
  * an arriving document is admitted, linked to its duplicate, or
  * dropped, within one trigger interval, at delta-sized cost (the
  * corpus is never re-shingled — its index frames are
  * delta-independent and cached).
  *
  * Why foreachBatch and not a streaming join: the classification is
  * row-local over the batch given the frozen index (candidate
  * generation, verification, and best-match selection key on the batch
  * doc's id), so there is no streaming state to manage — the
  * micro-batch boundary is the correct unit, exactly the
  * StreamingIndexIngest argument. CONTRACT: per-batch results equal
  * `dedupDeltaIndexed(index, batch)` verbatim, and because the df cap
  * is corpus-df based on both sides (the DeltaIndex carries the hot-
  * shingle set; a document's verdict depends only on its own shingles
  * and the frozen index, never on its batch-mates), ANY batch split
  * (maxFilesPerTrigger, chunked directory admission) yields the union
  * bit-identical to the one-shot batch operator over the whole delta —
  * both halves spec-pinned (StreamingSpec).
  *
  * Exactly-once: the output of batch `i` is `mode(overwrite)` into
  * `outDir/b<i>` — a checkpoint replay of the same batch rewrites the
  * same directory with the same rows (the classification is
  * deterministic), so restarts can neither duplicate nor lose
  * verdicts. Readers take the union `outDir/b*`.
  *
  * The index is FROZEN for the stream's lifetime — newly-arrived docs
  * are classified against the corpus, not against each other (exact
  * intra-stream dedup is X-streaming-dedup's job;
  * near-dup-vs-yesterday's-stream is the next scheduled index rebuild,
  * the same rebuild contract as the ANN index's X110b).
  */
object StreamingNearDup {
  def start(delta: DataFrame, idCol: String, textCol: String,
            index: Dedup.DeltaIndex, threshold: Double,
            outDir: String, checkpoint: String): StreamingQuery =
    delta.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Dedup.dedupDeltaIndexed(index, batch, idCol, textCol, threshold)
          .write.mode("overwrite").parquet(s"$outDir/b$batchId")
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}
