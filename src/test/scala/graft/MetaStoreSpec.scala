package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.meta.{ConcurrentCommitException, MetaStore, ShardInfo, ShardPlacement}
import graft.sync.{SyncAbortException, SyncEngine}

/** Table metadata (partition column — the master_get_table_metadata analog,
  * CitusMasterNode.java:312-331) and commit concurrency control. */
class MetaStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(): (MetaStore, String) = {
    val root = java.nio.file.Files.createTempDirectory("graft_ms_").toString
    (new MetaStore(spark, root), root)
  }
  private def seed(store: MetaStore): Unit =
    store.commit(
      Seq(ShardInfo(1L, 10L, "f", None, None)).toDF(),
      Seq(ShardPlacement(10L, 100L, "a")).toDF())

  test("registerTable stores and resolves the partition column") {
    val (store, _) = fresh()
    seed(store)
    assert(store.partitionColumnOf(1L).isEmpty)
    store.registerTable(1L, "lineitem", Some("l_shipdate"))
    assert(store.partitionColumnOf(1L).contains("l_shipdate"))
    // shards/placements carried forward unchanged
    assert(store.shards.count() == 1 && store.placements.count() == 1)
    // upsert replaces, does not duplicate
    store.registerTable(1L, "lineitem", Some("l_orderkey"))
    assert(store.tables.where(col("table_id") === 1L).count() == 1)
    assert(store.partitionColumnOf(1L).contains("l_orderkey"))
  }

  test("computeStats resolves the partition column from the catalog") {
    val (store, _) = fresh()
    seed(store)
    store.registerTable(1L, "t", Some("v"))
    val engine = new SyncEngine(spark, store)
    val data = Seq((10L, 3), (10L, 7), (11L, 5)).toDF("shard", "v")
    val stats = engine.computeStats(1L, data, "shard")
      .orderBy("shard_id").collect()
    assert(stats.map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq ==
      Seq((10L, "3", "7"), (11L, "5", "5")))
    // unregistered table → abort, mirroring the reference's fetch failure
    intercept[SyncAbortException] { engine.computeStats(99L, data, "shard") }
  }

  test("a claimed version cannot be committed twice (concurrency control)") {
    val (store, root) = fresh()
    seed(store) // v0
    // a rival writer claims v1 first
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new Path(root, "v1/_claim"), false).close()
    intercept[ConcurrentCommitException] { seed(store) }
    assert(store.currentVersion == 0L, "loser must not flip the pointer")
    assert(store.shards.count() == 1, "catalog unchanged after refused commit")
  }

  test("commit manifest records the written row counts, observed in-flight") {
    val (store, _) = fresh()
    store.commit(
      Seq(ShardInfo(1L, 10L, "f", None, None),
        ShardInfo(1L, 11L, "f", None, None)).toDF(),
      Seq(ShardPlacement(10L, 100L, "a"), ShardPlacement(10L, 100L, "b"),
        ShardPlacement(11L, 200L, "a")).toDF())
    assert(store.manifest(0L) ==
      Map("shards" -> 2L, "placements" -> 3L, "tables" -> 0L))
    // manifest counts equal what readers see
    assert(store.shards.count() == 2 && store.placements.count() == 3)
    // unknown / pre-manifest versions read as empty
    assert(store.manifest(99L).isEmpty)
  }

  test("carry-forward commit: unchanged tables copy at the FS level") {
    val (store, root) = fresh()
    store.commit(
      Seq(ShardInfo(1L, 10L, "f", None, None),
        ShardInfo(1L, 11L, "f", None, None)).toDF(),
      Seq(ShardPlacement(10L, 100L, "a")).toDF()) // v0
    // placements-only change: shards + tables carried forward as copies
    store.commitVersion(None,
      Some(Seq(ShardPlacement(10L, 100L, "a"),
        ShardPlacement(11L, 200L, "b")).toDF()), None,
      expectedVersion = Some(0L)) // v1
    assert(store.currentVersion == 1L)
    // carried content identical, written content replaced
    assert(store.shardsAt(1L).collect().toSet == store.shardsAt(0L).collect().toSet)
    assert(store.placements.count() == 2)
    // carried manifest counts come from the origin version's manifest
    assert(store.manifest(1L) ==
      Map("shards" -> 2L, "placements" -> 2L, "tables" -> 0L))
    // the copy is physical: v1 owns its own files (vacuuming v0 must not
    // break v1 readers — versions stay independently readable)
    store.vacuum(keepLast = 0)
    assert(store.shards.count() == 2 && store.placements.count() == 2)
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(root, "v0")))
  }

  test("a failing commit gate aborts with the catalog untouched") {
    val (store, _) = fresh()
    seed(store) // v0
    intercept[SyncAbortException] {
      store.commitVersion(
        Some(Seq(ShardInfo(1L, 11L, "f", None, None)).toDF()),
        Some(Seq(ShardPlacement(11L, 100L, "b")).toDF()), None,
        expectedVersion = Some(0L),
        gate = Some(() => throw new SyncAbortException("guard violated")))
    }
    assert(store.currentVersion == 0L, "gate failure must not flip the pointer")
    assert(store.shards.select("shard_id").collect().map(_.getLong(0)).toSet
      == Set(10L), "catalog unchanged after aborted commit")
    // the aborted claim is deleted — a retry targets the same version
    store.commit(
      Seq(ShardInfo(1L, 12L, "f", None, None)).toDF(),
      Seq(ShardPlacement(12L, 100L, "c")).toDF(),
      expectedVersion = Some(0L))
    assert(store.currentVersion == 1L)
  }

  test("stale-derivation commit is rejected (lost-update guard)") {
    val (store, _) = fresh()
    seed(store) // v0
    // writer A reads the catalog at v0, diffs, and commits → v1
    val baseA = store.currentVersion
    store.commit(
      Seq(ShardInfo(1L, 11L, "f", None, None)).toDF(),
      Seq(ShardPlacement(11L, 100L, "b")).toDF(),
      expectedVersion = Some(baseA))
    assert(store.currentVersion == 1L)
    // writer B ALSO derived its state from v0 (before A committed) but
    // commits after A: targeting v2, its claim succeeds — only the
    // expectedVersion check can catch that committing would silently drop
    // A's changes
    intercept[ConcurrentCommitException] {
      store.commit(
        Seq(ShardInfo(1L, 12L, "f", None, None)).toDF(),
        Seq(ShardPlacement(12L, 100L, "c")).toDF(),
        expectedVersion = Some(baseA))
    }
    assert(store.currentVersion == 1L, "loser must not flip the pointer")
    assert(store.shards.select("shard_id").collect().map(_.getLong(0)).toSet
      == Set(11L), "winner's state intact")
    // the loser's abandoned claim must not block a correct retry
    store.commit(
      Seq(ShardInfo(1L, 13L, "f", None, None)).toDF(),
      Seq(ShardPlacement(13L, 100L, "d")).toDF(),
      expectedVersion = Some(store.currentVersion))
    assert(store.currentVersion == 2L)
  }

  test("racing writers with one base version serialize: exactly one wins") {
    val (store, _) = fresh()
    seed(store) // v0
    // both writers derive from the SAME snapshot, then race the commit on
    // real threads — the claim + stale-derivation check must let exactly
    // one through, whichever thread wins the filesystem race
    val base = store.currentVersion
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    def attempt(id: Long): Future[Either[String, Long]] = Future {
      try Right(store.commit(
        Seq(ShardInfo(1L, id, "f", None, None)).toDF(),
        Seq(ShardPlacement(id, 100L, "h")).toDF(),
        expectedVersion = Some(base)))
      catch { case e: ConcurrentCommitException => Left(e.getMessage) }
    }
    val results = Await.result(
      Future.sequence(Seq(attempt(21L), attempt(22L))), Duration.Inf)
    val (wins, losses) = results.partition(_.isRight)
    assert(wins.size == 1 && losses.size == 1,
      s"exactly one racer must commit, got $results")
    // the loser re-reads and retries — now it succeeds
    val retryId = if (results.head.isLeft) 21L else 22L
    store.commit(
      Seq(ShardInfo(1L, retryId, "f", None, None)).toDF(),
      Seq(ShardPlacement(retryId, 100L, "h")).toDF(),
      expectedVersion = Some(store.currentVersion))
    assert(store.shards.select("shard_id").collect().map(_.getLong(0)).toSet
      == Set(retryId), "retry against the fresh state lands")
  }

  test("time travel, rollback, and commit-after-rollback") {
    val (store, _) = fresh()
    seed(store) // v0: shard 10
    store.commit(
      Seq(ShardInfo(1L, 11L, "f", None, None)).toDF(),
      Seq(ShardPlacement(11L, 100L, "b")).toDF()) // v1: shard 11
    assert(store.currentVersion == 1L)

    // time travel reads immutable history
    assert(store.shardsAt(0L).select("shard_id").collect().map(_.getLong(0)).toSeq
      == Seq(10L))
    assert(store.shardsAt(1L).select("shard_id").collect().map(_.getLong(0)).toSeq
      == Seq(11L))
    assert(store.shardsAt(99L).isEmpty)

    // rollback: O(1) pointer flip, head reads old content
    store.rollback(0L)
    assert(store.currentVersion == 0L)
    assert(store.shards.select("shard_id").collect().map(_.getLong(0)).toSeq
      == Seq(10L))
    intercept[IllegalArgumentException](store.rollback(99L))

    // commit after rollback claims PAST the abandoned version
    val v = store.commit(
      Seq(ShardInfo(1L, 12L, "f", None, None)).toDF(),
      Seq(ShardPlacement(12L, 100L, "c")).toDF())
    assert(v == 2L, s"must not overwrite abandoned v1, claimed v$v")
    assert(store.shardsAt(1L).count() == 1, "abandoned version still readable")

    // audit diff between versions: v0 {10} → v1 {11}
    val diff = store.changes(0L, 1L).collect()
      .map(r => (r.getLong(1), r.getString(2))).toSet
    assert(diff == Set((11L, "added"), (10L, "removed")), s"$diff")
    assert(store.changes(0L, 0L).isEmpty)
  }

  test("vacuum drops old versions, never the head or the retention window") {
    val (store, root) = fresh()
    (0 until 5).foreach(_ => seed(store)) // v0..v4
    assert(store.currentVersion == 4L)
    val removed = store.vacuum(keepLast = 2)
    assert(removed == Seq(0L, 1L), s"expected v0,v1 removed, got $removed")
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(root, "v0")) && fs.exists(new Path(root, "v2")))
    assert(store.shards.count() == 1, "head unaffected")
    assert(store.shardsAt(2L).count() == 1, "retention window readable")
    // a negative keepLast would make the cutoff EXCEED the head and delete
    // everything but the head itself — reject it outright
    intercept[IllegalArgumentException] { store.vacuum(keepLast = -1) }
  }

  test("repair clears a dead writer's stale claim; fresh claims stay protected") {
    val (store, root) = fresh()
    seed(store) // v0
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // dead writer: claimed v1, never committed
    fs.create(new Path(root, "v1/_claim"), false).close()
    intercept[ConcurrentCommitException] { seed(store) }

    // a FRESH claim (possibly a live writer) must not be repaired away
    assert(store.repair(olderThanMs = 60000).isEmpty)
    intercept[ConcurrentCommitException] { seed(store) }

    // age the claim past the threshold → repair unblocks commit
    fs.setTimes(new Path(root, "v1/_claim"), 1000L, -1)
    assert(store.repair(olderThanMs = 60000) == Seq(1L))
    seed(store)
    assert(store.currentVersion == 1L, "commit must proceed after repair")
  }

  test("old versions without a tables dir read as empty table metadata") {
    val (store, _) = fresh()
    seed(store)
    assert(store.tables.isEmpty)
    assert(store.partitionColumnOf(1L).isEmpty)
  }
}
