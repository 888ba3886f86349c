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
  /** The apply stage exploits two algebraic collapses the reference's
    * incremental form hides (it HAD to apply deltas through JDBC; a
    * full-overwrite commit does not):
    *
    *   1. The post-apply placement set (catalog − old) ∪ new is exactly
    *      the SOURCE set: (catalog ∩ source) ∪ (source − catalog) =
    *      source. So view maintenance, both guards, and the commit read
    *      the cached source snapshot — the two placement-level `except`s
    *      (the dominant shuffles: full-width rows both directions)
    *      disappear from the apply path entirely.
    *   2. Placement row-diffs are then needed only for NO-OP DETECTION,
    *      and only when the id sets are identical — one count plus one
    *      one-directional except (equal counts + empty src−cat ⇒ sets
    *      equal), skipped whenever the id diff already proves a change.
    */
  def sync(tableId: Long, sourceIds: DataFrame, sourcePlacements: DataFrame,
           stats: Option[DataFrame] = None): Long = {
    val catalogIds = store.shards.where(col("table_id") === tableId)
      .select("shard_id")
    val catalogPlacements = store.placements
    val srcIds = sourceIds.select("shard_id").dropDuplicates().persist()
    val srcPl = sourcePlacements.select("shard_id", "shard_length", "hostname")
      .dropDuplicates().persist()
    val newShardIds = CoreOps.diffNew(srcIds, catalogIds).persist()
    val oldShardIds = CoreOps.diffOld(srcIds, catalogIds).persist()
    try {
      // No-op fast path (README.md:10-13): id diffs first (narrow, cheap);
      // placement comparison only if the id sets are identical.
      val idsChanged = !newShardIds.select(lit(1).as("one"))
        .union(oldShardIds.select(lit(1).as("one"))).limit(1).isEmpty
      val changed = idsChanged ||
        srcPl.count() != catalogPlacements.count() ||
        !srcPl.except(catalogPlacements).limit(1).isEmpty
      if (!changed) return store.currentVersion

      // Guard J5: a removed shard must have NO remaining placements in the
      // post-apply set — i.e. in the source snapshot
      // (HdfsSynchronizer.java:263-273).
      val orphanHead = CoreOps.orphanPlacements(oldShardIds, srcPl, "shard_id")
        .limit(1).collect()
      if (orphanHead.nonEmpty)
        throw new SyncAbortException(
          s"shard ${orphanHead.head.getLong(0)} was removed but still has placements")

      // Guard J6: a new shard must have at least one placement
      // (HdfsSynchronizer.java:282-289).
      val unplacedHead = CoreOps.unplacedShards(newShardIds, srcPl, "shard_id")
        .limit(1).collect()
      if (unplacedHead.nonEmpty)
        throw new SyncAbortException(
          s"shard ${unplacedHead.head.getLong(0)} is new but has no placements")

      // New shard rows, with optional min/max stats (CitusMasterNode:221-242).
      val newShardRows = {
        val base = newShardIds
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
        .join(oldShardIds, Seq("shard_id"), "left_anti")
      val newShards = keptShards.select(
          col("table_id"), col("shard_id"), col("storage"),
          col("min_value"), col("max_value"))
        .union(newShardRows)

      store.commit(newShards, srcPl)
    } finally
      Seq(srcIds, srcPl, newShardIds, oldShardIds).foreach(_.unpersist())
  }

  /** Per-shard min/max of a partition column, as one distributed job —
    * the Spark replacement for the reference's per-shard SELECT min,max
    * loop (§3.3, CitusWorkerNode.java:140-165).
    */
  def computeStats(data: DataFrame, shardCol: String, partitionCol: String): DataFrame =
    CoreOps.minMaxPerGroup(data, shardCol, col(partitionCol))
      .withColumnRenamed(shardCol, "shard_id")
}
