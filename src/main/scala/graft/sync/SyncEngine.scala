package graft.sync

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.meta.{MetaStore, MetadataDiff}
import graft.ops.CoreOps

/** Snapshot-inconsistency abort, mirroring the reference's global abort
  * conditions (HdfsSynchronizer.java:263-289). */
class SyncAbortException(msg: String) extends RuntimeException(msg)

/** Outcome of a fault-tolerant sync: the committed catalog version plus the
  * per-placement worker operations that failed and were skipped — the
  * set-oriented analog of the reference's log-and-skip accounting
  * (HdfsSynchronizer.java:228-251: `deletedShardPlacementSet` /
  * `insertedShardPlacementSet` track only the successes).
  *
  * `skippedCount` is exact; `skipped` is a driver-side SAMPLE of at most
  * `SyncEngine.maxSkippedSample` rows (op: "drop"|"create", shard_id,
  * shard_length, hostname). Under a systematic failure — one dead host
  * across a huge table — the skipped set is O(table placements); an
  * unbounded collect would OOM the driver where the reference streams one
  * log line per failure. Callers needing the full set re-derive it
  * distributed: diff the committed catalog against the source snapshot.
  */
case class SyncResult(version: Long, skippedCount: Long,
                      skipped: Array[(String, Long, Long, String)])

/** The reference's whole program as one function (SURVEY §3.1):
  * source snapshot → five-way diff → validate → atomically apply.
  *
  * Where the reference walks O(shards × replicas) sequential RPC/JDBC round
  * trips (HdfsSynchronizer.java:226-318), this engine expresses each stage
  * as a declarative plan: the diffs are `except`s (shuffled hash
  * aggregations at scale), the guards are semi/anti joins, and the apply is
  * one atomic two-table commit. Node boundaries become shuffle boundaries.
  *
  * Scoping: placements carry no table id (pg_dist_shard_placement has none);
  * the reference scopes them per table by joining through pg_dist_shard on
  * logicalrelid (CitusMasterNode.java:33-37, MASTER_FETCH_TABLE_SHARD_
  * PLACEMENTS). Same here — every diff/guard/no-op check runs against THIS
  * table's placements (semi-join on the table's catalog shard ids), and a
  * commit rewrites only this table's slice, preserving every other table's
  * rows. Shard ids are globally unique across tables (they are HDFS block
  * ids — HdfsSynchronizer.java:136-141), which is what makes the semi-join
  * scoping exact.
  *
  * Idempotence (README.md:10-13): sync(sync(s)) == sync(s) — after a sync
  * the catalog equals the source snapshot, so the next diff is empty.
  * Atomicity (README.md:15-19): guards run BEFORE the commit; a violation
  * aborts with the catalog untouched.
  */
class SyncEngine(spark: SparkSession, store: MetaStore) {

  /** This table's placement slice of the global placements table —
    * the MASTER_FETCH_TABLE_SHARD_PLACEMENTS analog. */
  private def scopedPlacements(catalogIds: DataFrame): DataFrame =
    store.placements.join(catalogIds.select("shard_id"), Seq("shard_id"), "left_semi")

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
    val catalogPlacements = scopedPlacements(catalogIds)
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
    *
    * The apply stage exploits two algebraic collapses the reference's
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
    *      and only when the id sets are identical — counts first (unequal
    *      sizes prove a change with no except shuffle at all), then one
    *      one-directional except (equal counts + empty src−cat ⇒ sets
    *      equal), skipped whenever the id diff already proves a change.
    *   3. When the id sets are identical, BOTH guards are vacuous (their
    *      inputs — the id diffs — are empty), so the guard job itself is
    *      skipped; it runs only on the id-changing path it can fail on.
    */
  def sync(tableId: Long, sourceIds: DataFrame, sourcePlacements: DataFrame,
           stats: Option[DataFrame] = None): Long = {
    // the version every diff below is derived from — the commit's
    // optimistic-concurrency token (a rival committing mid-sync makes the
    // commit throw ConcurrentCommitException instead of losing its update)
    val baseVersion = store.currentVersion
    val catalogIds = store.shards.where(col("table_id") === tableId)
      .select("shard_id")
    val catalogPlacements = scopedPlacements(catalogIds)
    val srcIds = sourceIds.select("shard_id").dropDuplicates().persist()
    val srcPl = sourcePlacements.select("shard_id", "shard_length", "hostname")
      .dropDuplicates().persist()
    val newShardIds = CoreOps.diffNew(srcIds, catalogIds).persist()
    val oldShardIds = CoreOps.diffOld(srcIds, catalogIds).persist()
    try {
      // No-op fast path (README.md:10-13): id diffs first — a union of two
      // persisted narrow sets, whose shuffles the apply path needs anyway
      // (putting more legs in the id-check union would drag their shuffle
      // stages into every apply-path job — parent stages run regardless of
      // which union partitions a take() probes). Only if the id sets are
      // identical does the placement comparison run: counts first (unequal
      // sizes prove a change with no except shuffle — srcPl is deduped, so
      // a dup-bearing catalog slice just reads as changed and gets
      // rewritten deduped), then ONE one-directional except — equal counts
      // plus empty src−cat proves set equality without the reverse except.
      // Both sides are scoped to this table — another table's rows must
      // not defeat the fast path.
      // coalesce(1) collapses the probe to ONE job with one task: a
      // limit(1) over a 64-partition union otherwise escalates through
      // ceil(log4(P)) jobs when the diffs are EMPTY (the steady-state
      // no-op case) — and empty cached partitions cost the single task
      // nothing to walk, while a non-empty diff short-circuits at its
      // first row either way.
      val one = (d: DataFrame) => d.select(lit(1).as("one"))
      val idsChanged =
        !one(newShardIds).union(one(oldShardIds)).coalesce(1).limit(1).isEmpty
      def placementsChanged: Boolean = {
        // both counts in ONE tagged-union job (no short-circuit exists
        // between them — they are only ever compared to each other)
        val counts = srcPl.select(lit("s").as("side"))
          .unionByName(catalogPlacements.select(lit("c").as("side")))
          .groupBy("side").count().collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        counts.getOrElse("s", 0L) != counts.getOrElse("c", 0L) ||
          !srcPl.except(catalogPlacements).coalesce(1).limit(1).isEmpty
      }
      val changed = idsChanged || placementsChanged
      if (!changed) return baseVersion

      // Guards J5 + J6 — skipped entirely when the id sets are unchanged
      // (both read the id diffs as their subject: no removed shard can be
      // orphaned and no new shard unplaced if neither exists). When they
      // can fail, both run as ONE job (they read the same persisted
      // inputs; a second action would only pay scheduler overhead again),
      // CONCURRENT with the commit's writes as its gate — a violation
      // still aborts with the catalog untouched (the pointer never flips):
      // J5 — a removed shard must have NO remaining placements in the
      // post-apply set, i.e. in the source snapshot
      // (HdfsSynchronizer.java:263-273); J6 — a new shard must have at
      // least one placement (HdfsSynchronizer.java:282-289).
      val guards = if (!idsChanged) None else Some(() =>
        checkGuards(oldShardIds, newShardIds, srcPl,
          orphanMsg = id => s"shard $id was removed but still has placements",
          unplacedMsg = id => s"shard $id is new but has no placements"))

      commitState(tableId, catalogIds, newShardIds, oldShardIds, srcPl, stats,
        baseVersion, shardsUnchanged = !idsChanged, gate = guards)
    } finally
      Seq(srcIds, srcPl, newShardIds, oldShardIds).foreach(_.unpersist())
  }

  /** T4 — fault-tolerant apply (HdfsSynchronizer.java:228-251, :339-364,
    * :373-415): per-placement worker failures are logged and SKIPPED, not
    * fatal; only the structural invariants abort:
    *
    *   - a failed drop whose shard survives (replica churn) → the placement
    *     simply stays in the catalog, retried next run;
    *   - a failed drop on a fully-removed shard → that shard still has a
    *     placement in the post-apply set → guard J5 aborts (the reference's
    *     "Could not remove shard placements for shardId");
    *   - a failed create → the placement is not inserted; fatal only if the
    *     shard ends with ZERO placements → guard J6 aborts ("Could not find
    *     shard placement for shardId").
    *
    * `workerApply` is the worker-side DDL stage: it receives the attempted
    * operations (op: "drop"|"create", shard_id, shard_length, hostname) and
    * must return them with an added boolean `ok` column — in a real
    * deployment a mapPartitions that executes DDL against each host and
    * catches per-row failures (the error-column-and-accumulate shape); the
    * default marks everything ok, reducing to the strict path. Unlike the
    * strict `sync`, the post-apply set here is NOT the source snapshot —
    * it is (catalog − successfulDrops) ∪ successfulCreates, the reference's
    * `currentShardPlacementSet` (HdfsSynchronizer.java:253-257).
    */
  def syncTolerant(tableId: Long, sourceIds: DataFrame,
                   sourcePlacements: DataFrame,
                   workerApply: DataFrame => DataFrame = SyncEngine.allOk,
                   stats: Option[DataFrame] = None): SyncResult = {
    val baseVersion = store.currentVersion
    val catalogIds = store.shards.where(col("table_id") === tableId)
      .select("shard_id")
    val catalogPlacements = scopedPlacements(catalogIds).persist()
    val srcIds = sourceIds.select("shard_id").dropDuplicates().persist()
    val srcPl = sourcePlacements.select("shard_id", "shard_length", "hostname")
      .dropDuplicates().persist()
    val newShardIds = CoreOps.diffNew(srcIds, catalogIds).persist()
    val oldShardIds = CoreOps.diffOld(srcIds, catalogIds).persist()
    val plCols = Seq(col("shard_id"), col("shard_length"), col("hostname"))
    val attempted = CoreOps.diffOld(srcPl, catalogPlacements)
      .select(lit("drop").as("op") +: plCols: _*)
      .unionByName(CoreOps.diffNew(srcPl, catalogPlacements)
        .select(lit("create").as("op") +: plCols: _*))
    val applied = workerApply(attempted).persist()
    try {
      // Bounded skipped accounting: exact count + a capped sample. Both
      // actions scan the persisted `applied`; only the sample is collected,
      // so a systematic failure (every op on one host) cannot OOM the
      // driver the way an unbounded collect would.
      val notOk = applied.where(!col("ok")).select(col("op") +: plCols: _*)
      val skipped = notOk.limit(SyncEngine.maxSkippedSample)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
      val skippedCount =
        if (skipped.length < SyncEngine.maxSkippedSample) skipped.length.toLong
        else notOk.count()

      // current = (catalog − successfulDrops) ∪ successfulCreates
      // (HdfsSynchronizer.java:253-257) — the guards and the commit all read
      // this set, NOT the source snapshot, because failures make them differ.
      val deleted = applied.where(col("op") === "drop" && col("ok")).select(plCols: _*)
      val inserted = applied.where(col("op") === "create" && col("ok")).select(plCols: _*)
      val current = CoreOps.currentSet(catalogPlacements, deleted, inserted).persist()

      try {
        // same single-job probe shape as the strict path (coalesce(1)
        // collapses the empty-diff take escalation)
        val idsChanged = !newShardIds.select(lit(1).as("one"))
          .union(oldShardIds.select(lit(1).as("one")))
          .coalesce(1).limit(1).isEmpty
        val anyApplied = !applied.where(col("ok")).coalesce(1).limit(1).isEmpty
        if (!idsChanged && !anyApplied)
          return SyncResult(baseVersion, skippedCount, skipped)

        // same vacuity argument as the strict path: a failed drop can only
        // orphan a REMOVED shard, a failed create only unplace a NEW one —
        // no id change, no failable guard
        val guards = if (!idsChanged) None else Some(() =>
          checkGuards(oldShardIds, newShardIds, current,
            orphanMsg = id => s"could not remove shard placements for shard $id",
            unplacedMsg = id => s"could not find shard placement for shard $id"))

        val v = commitState(tableId, catalogIds, newShardIds, oldShardIds,
          current, stats, baseVersion, shardsUnchanged = !idsChanged,
          gate = guards)
        SyncResult(v, skippedCount, skipped)
      } finally current.unpersist()
    } finally
      Seq(catalogPlacements, srcIds, srcPl, newShardIds, oldShardIds, applied)
        .foreach(_.unpersist())
  }

  /** Both structural guards evaluated in one Spark action: violating shard
    * ids arrive tagged, and the first row (orphans first, matching the
    * reference's check order) decides the abort message. */
  private def checkGuards(oldShardIds: DataFrame, newShardIds: DataFrame,
                          postApply: DataFrame,
                          orphanMsg: Long => String,
                          unplacedMsg: Long => String): Unit = {
    val head = CoreOps.orphanPlacements(oldShardIds, postApply, "shard_id")
      .select(col("shard_id"), lit("orphan").as("kind"))
      .unionByName(CoreOps.unplacedShards(newShardIds, postApply, "shard_id")
        .select(col("shard_id"), lit("unplaced").as("kind")))
      .coalesce(1).limit(1).collect()
    head.headOption.foreach { r =>
      throw new SyncAbortException(
        if (r.getString(1) == "orphan") orphanMsg(r.getLong(0))
        else unplacedMsg(r.getLong(0)))
    }
  }

  /** Shared commit tail: build the new shards table (kept + new, stats
    * attached — CitusMasterNode.java:221-242) and rewrite ONLY this table's
    * placement slice, preserving every other table's rows.
    *
    * `shardsUnchanged` (both id diffs proven empty — stats attach only to
    * NEW shards, so no row can differ) carries the shards table into the
    * new version as a filesystem copy instead of a scan+anti-join+union
    * rewrite: a placements-only sync writes placements and nothing else.
    */
  private def commitState(tableId: Long, catalogIds: DataFrame,
                          newShardIds: DataFrame, oldShardIds: DataFrame,
                          tablePlacements: DataFrame,
                          stats: Option[DataFrame],
                          baseVersion: Long,
                          shardsUnchanged: Boolean = false,
                          gate: Option[() => Unit] = None): Long = {
    val newShards = if (shardsUnchanged) None else Some {
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
      store.shards
        .join(oldShardIds, Seq("shard_id"), "left_anti")
        .select(col("table_id"), col("shard_id"), col("storage"),
          col("min_value"), col("max_value"))
        .union(newShardRows)
    }
    // Other tables' placements pass through untouched: the commit replaces
    // only the slice reachable from THIS table's (pre-sync) catalog ids.
    val otherPlacements = store.placements
      .join(catalogIds.select("shard_id"), Seq("shard_id"), "left_anti")
    store.commitVersion(newShards,
      Some(otherPlacements.union(tablePlacements)), None,
      expectedVersion = Some(baseVersion), gate = gate)
  }

  /** Per-shard min/max of a partition column, as one distributed job —
    * the Spark replacement for the reference's per-shard SELECT min,max
    * loop (§3.3, CitusWorkerNode.java:140-165).
    */
  def computeStats(data: DataFrame, shardCol: String, partitionCol: String): DataFrame =
    CoreOps.minMaxPerGroup(data, shardCol, col(partitionCol))
      .withColumnRenamed(shardCol, "shard_id")

  /** Catalog-resolved stats: the partition column comes from the table's
    * registered metadata — the reference resolves it the same way per sync
    * via `master_get_table_metadata` (CitusMasterNode.java:312-331) rather
    * than requiring callers to know it out-of-band.
    */
  def computeStats(tableId: Long, data: DataFrame, shardCol: String): DataFrame = {
    val partitionCol = store.partitionColumnOf(tableId).getOrElse(
      throw new SyncAbortException(
        s"no partition column registered for table $tableId"))
    computeStats(data, shardCol, partitionCol)
  }
}

object SyncEngine {
  /** Cap on the driver-side skipped-operation sample in SyncResult. */
  val maxSkippedSample = 1000

  /** Default worker stage: every DDL op succeeds (the strict-path limit of
    * the tolerant sync). */
  val allOk: DataFrame => DataFrame =
    _.withColumn("ok", lit(true))

  /** Deterministic failure injection for tests: an op fails iff
    * pred(row) — e.g. hash-based sampling — holds. */
  def failWhere(pred: Column): DataFrame => DataFrame =
    _.withColumn("ok", !pred)
}
