package graft

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.meta.{MetaStore, ShardInfo, ShardPlacement}
import graft.sync.{SyncAbortException, SyncEngine}

/** Randomized-snapshot properties (SURVEY §5.3) — the reference's README
  * contracts over arbitrary catalog/source pairs:
  *
  *   1. convergence:  after sync(S) the catalog equals S exactly
  *      (apply(diff(src,dst), dst) == src, HdfsSynchronizer.java:172-188)
  *   2. idempotence:  sync(sync(S)) == sync(S) and the second run commits
  *      nothing (README.md:10-13)
  *   3. atomicity:    an aborted sync leaves the catalog untouched
  *      (README.md:15-19)
  *
  * Deterministic seeds, snapshots drawn from a small id/host pool so
  * overlaps, replica churn, and negative shard ids all occur.
  */
class SyncPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val Hosts = Vector("a", "b", "c", "d")

  /** A consistent snapshot: every shard id has ≥1 placement. */
  private def genSnapshot(rnd: Random): Set[(Long, Long, String)] = {
    val ids = (-3L to 12L).filter(_ => rnd.nextDouble() < 0.4)
    ids.flatMap { id =>
      val len = rnd.nextInt(5) * 100L
      val replicas = 1 + rnd.nextInt(3)
      rnd.shuffle(Hosts).take(replicas).map(h => (id, len, h))
    }.toSet
  }

  private def idsOf(pl: Set[(Long, Long, String)]): Set[Long] = pl.map(_._1)

  private def idsDf(ids: Set[Long]): DataFrame = {
    import spark.implicits._
    ids.toSeq.toDF("shard_id")
  }
  private def plDf(pl: Set[(Long, Long, String)]): DataFrame = {
    import spark.implicits._
    pl.toSeq.map(x => ShardPlacement(x._1, x._2, x._3)).toDF()
  }

  private def freshStore(catalog: Set[(Long, Long, String)]): (MetaStore, SyncEngine) = {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_prop_meta_").toString
    val store = new MetaStore(spark, root)
    val shards = idsOf(catalog).toSeq
      .map(id => ShardInfo(1L, id, "f", None, None)).toDF()
    store.commit(shards, plDf(catalog))
    (store, new SyncEngine(spark, store))
  }

  private def catalogState(store: MetaStore): (Set[Long], Set[(Long, Long, String)]) = (
    store.shards.collect().map(_.getAs[Long]("shard_id")).toSet,
    store.placements.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet)

  test("property: convergence + idempotence over random snapshot pairs") {
    for (seed <- 1 to 8) {
      val rnd = new Random(seed)
      val catalog = genSnapshot(rnd)
      val source = genSnapshot(rnd)
      val (store, engine) = freshStore(catalog)

      engine.sync(1L, idsDf(idsOf(source)), plDf(source))
      assert(catalogState(store) == ((idsOf(source), source)),
        s"seed=$seed: catalog must equal the source snapshot after sync")

      val vBefore = store.currentVersion
      val v2 = engine.sync(1L, idsDf(idsOf(source)), plDf(source))
      assert(v2 == vBefore, s"seed=$seed: re-sync must be a no-op")
    }
  }

  test("property: aborted sync leaves the catalog untouched (atomicity)") {
    for (seed <- 101 to 106) {
      val rnd = new Random(seed)
      val catalog = genSnapshot(rnd)
      val source = genSnapshot(rnd)
      val (store, engine) = freshStore(catalog)
      val before = catalogState(store)
      val vBefore = store.currentVersion

      // Inconsistent pair: an extra id with no placements trips the
      // unplaced guard; dropping an id whose placement remains trips the
      // orphan guard. Both must abort without committing.
      val extraId = 99L + seed
      intercept[SyncAbortException] {
        engine.sync(1L, idsDf(idsOf(source) + extraId), plDf(source))
      }
      assert(catalogState(store) == before && store.currentVersion == vBefore,
        s"seed=$seed: unplaced-guard abort must not change the catalog")

      // Orphan guard needs the dropped id to be an OLD id (catalog − source),
      // so pick one present in both snapshots: dropping it from the source id
      // set while its placements survive makes it old-with-placements.
      val common = idsOf(source) intersect idsOf(catalog)
      if (common.nonEmpty) {
        val dropped = common.head
        intercept[SyncAbortException] {
          engine.sync(1L, idsDf(idsOf(source) - dropped), plDf(source))
        }
        assert(catalogState(store) == before && store.currentVersion == vBefore,
          s"seed=$seed: orphan-guard abort must not change the catalog")
      }
    }
  }

  test("metastore: a dangling uncommitted version dir is invisible to readers") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_crash_meta_").toString
    val store = new MetaStore(spark, root)
    store.commit(
      Seq(ShardInfo(1L, 1L, "f", None, None)).toDF(),
      Seq(ShardPlacement(1L, 10L, "a")).toDF())
    val committed = catalogState(store)
    // Simulate a crash mid-commit: v1 data written, pointer never flipped.
    Seq(ShardInfo(1L, 2L, "f", None, None)).toDF()
      .write.parquet(s"$root/v1/shards")
    Seq(ShardPlacement(2L, 20L, "b")).toDF()
      .write.parquet(s"$root/v1/placements")
    assert(catalogState(store) == committed,
      "readers must resolve the pointer, not the newest directory")
    assert(store.currentVersion == 0L)
  }
}
