package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ext.TextIndex

/** X124 — continuous TEXT-index ingest: the lexical twin of the ANN
  * stream ingest (X112), completing the streaming side of the persisted
  * text index's lifecycle (build → append → STREAMED INGEST → rebuild)
  * exactly the way X112 completed the ANN side: each micro-batch of
  * newly-arrived documents tokenizes against the FROZEN stats artifact
  * and appends to only its tokens' bucket directories
  * ([[TextIndex.textIndexAppend]]), so the searchable index trails the
  * document stream by one trigger interval between scheduled rebuilds.
  *
  * foreachBatch, not a streaming aggregation, for the same reason as
  * X112: the index write is a BATCH sink contract and tokenization is
  * stateless per row — the micro-batch boundary is the right unit. The
  * checkpoint plus the batchId-keyed token-idempotent publish make
  * restarts EXACTLY-ONCE: a replayed batch retracts and re-publishes
  * its own `A.b<id>-` prefixed files (crash before its commit marker)
  * or no-ops entirely (marker present) — the discipline
  * [[graft.ext.Similarity.publishTokenStaged]] pins and both index
  * families share.
  *
  * df semantics under batching: a token the BASE index already knows
  * scores with the base's df on every appended row regardless of how
  * the stream is batched (each batch's pruned lookup finds it), so
  * probes for corpus-known terms are BATCH-SPLIT INVARIANT
  * (spec-pinned equal to the one-shot append across three forced
  * micro-batches). A brand-new token's df anchors to the FIRST batch
  * that introduces it (later batches find that value in the index) —
  * stale against the true union df by exactly the X110b rebuild
  * contract that also refreshes nd/avgdl. */
object StreamingTextIngest {
  def start(docs: DataFrame, idCol: String, textCol: String, path: String,
            checkpoint: String,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          TextIndex.textIndexAppend(batch, idCol, textCol, path, s"b$batchId")
        ()
      }
      .start()
}
