package graft.sync

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.meta.{MetaStore, MetadataDiff}
import graft.ops.CoreOps

/** Snapshot-inconsistency abort, mirroring the reference's global abort
  * conditions (HdfsSynchronizer.java:263-289). */
class SyncAbortException(msg: String) extends RuntimeException(msg)

/** The reference's whole program as one function (SURVEY §3.1):
  * source snapshot → five-way diff → validate → atomically apply.
  *
  * Where the reference walks O(shards × replicas) sequential RPC/JDBC round
  * trips (HdfsSynchronizer.java:226-318), this engine expresses each stage
  * as a declarative plan: the diffs are `except`s (shuffled hash
  * aggregations at scale), the guards are semi/anti joins, and the apply is
  * one atomic two-table commit. Node boundaries become shuffle boundaries.
  *
  * Idempotence (README.md:10-13): sync(sync(s)) == sync(s) — after a sync
  * the catalog equals the source snapshot, so the next diff is empty.
  * Atomicity (README.md:15-19): guards run BEFORE the commit; a violation
  * aborts with the catalog untouched.
  */
class SyncEngine(spark: SparkSession, store: MetaStore) {

  /** Diff the source snapshot against the catalog
    * (HdfsSynchronizer.java:142-205). `sourceIds` and `sourcePlacements`
    * arrive separately — like the reference's two NameNode scans — so they
    * can disagree; the guards catch that.
    *
    * @param sourceIds        one column `shard_id`
    * @param sourcePlacements columns (shard_id, shard_length, hostname)
    */
  def calculateDiff(tableId: Long, sourceIds: DataFrame,
                    sourcePlacements: DataFrame): MetadataDiff = {
    val catalogIds = store.shards.where(col("table_id") === tableId)
      .select("shard_id")
    val catalogPlacements = store.placements
    MetadataDiff(
      newShardIds = CoreOps.diffNew(sourceIds, catalogIds),
      oldShardIds = CoreOps.diffOld(sourceIds, catalogIds),
      catalogPlacements = catalogPlacements,
      newPlacements = CoreOps.diffNew(sourcePlacements, catalogPlacements),
      oldPlacements = CoreOps.diffOld(sourcePlacements, catalogPlacements))
  }

  /** Validate + apply (HdfsSynchronizer.java:215-332). Optional `stats`
    * (shard_id, min_value, max_value) attaches min/max statistics to new
    * shards — the --fetch-min-max path (§3.3), computed as ONE distributed
    * aggregation by the caller instead of per-shard round trips.
    * Returns the committed version.
    */
  def sync(tableId: Long, sourceIds: DataFrame, sourcePlacements: DataFrame,
           stats: Option[DataFrame] = None): Long = {
    val diff = calculateDiff(tableId, sourceIds, sourcePlacements)

    // The four diff frames each feed several consumers (no-op check,
    // guards, view maintenance, commit) — persist so each `except` runs
    // once instead of once per consumer.
    val cached = Seq(diff.newShardIds, diff.oldShardIds,
      diff.newPlacements, diff.oldPlacements)
    cached.foreach(_.persist())
    try {
      // No-op fast path (README.md:10-13: empty diff ⇒ "the application
      // does nothing"). ONE job over the union of all four diffs — which
      // also populates their caches for the stages below.
      val anyChange = cached
        .map(_.select(lit(1).as("one")))
        .reduce(_.union(_))
        .limit(1)
      if (anyChange.isEmpty) return store.currentVersion

      // Post-apply placement set (view maintenance, HdfsSynchronizer:253-257).
      // Unlike the general CoreOps.currentSet, no trailing distinct: the
      // inserted set (source − catalog) is disjoint from (catalog − deleted)
      // by construction, so the union is already a set — one shuffle fewer.
      val currentPlacements = diff.catalogPlacements
        .except(diff.oldPlacements)
        .union(diff.newPlacements)
        .persist()
      try {
        // Guard J5: a removed shard must have NO remaining placements
        // (HdfsSynchronizer.java:263-273).
        val orphans = CoreOps.orphanPlacements(diff.oldShardIds, currentPlacements, "shard_id")
        val orphanHead = orphans.limit(1).collect()
        if (orphanHead.nonEmpty)
          throw new SyncAbortException(
            s"shard ${orphanHead.head.getLong(0)} was removed but still has placements")

        // Guard J6: a new shard must have at least one placement
        // (HdfsSynchronizer.java:282-289).
        val unplaced = CoreOps.unplacedShards(diff.newShardIds, currentPlacements, "shard_id")
        val unplacedHead = unplaced.limit(1).collect()
        if (unplacedHead.nonEmpty)
          throw new SyncAbortException(
            s"shard ${unplacedHead.head.getLong(0)} is new but has no placements")

        // New shard rows, with optional min/max stats (CitusMasterNode:221-242).
        val newShardRows = {
          val base = diff.newShardIds
            .select(lit(tableId).as("table_id"), col("shard_id"),
              lit("f").as("storage"))
          stats match {
            case Some(st) => base.join(st, Seq("shard_id"), "left")
              .select(col("table_id"), col("shard_id"), col("storage"),
                col("min_value").cast("string"), col("max_value").cast("string"))
            case None => base
              .withColumn("min_value", lit(null).cast("string"))
              .withColumn("max_value", lit(null).cast("string"))
          }
        }
        val keptShards = store.shards
          .join(diff.oldShardIds, Seq("shard_id"), "left_anti")
        val newShards = keptShards.select(
            col("table_id"), col("shard_id"), col("storage"),
            col("min_value"), col("max_value"))
          .union(newShardRows)

        store.commit(newShards, currentPlacements)
      } finally currentPlacements.unpersist()
    } finally cached.foreach(_.unpersist())
  }

  /** Per-shard min/max of a partition column, as one distributed job —
    * the Spark replacement for the reference's per-shard SELECT min,max
    * loop (§3.3, CitusWorkerNode.java:140-165).
    */
  def computeStats(data: DataFrame, shardCol: String, partitionCol: String): DataFrame =
    CoreOps.minMaxPerGroup(data, shardCol, col(partitionCol))
      .withColumnRenamed(shardCol, "shard_id")
}
