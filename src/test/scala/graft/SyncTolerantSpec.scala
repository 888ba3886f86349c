package graft

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.meta.{MetaStore, ShardInfo, ShardPlacement}
import graft.sync.{SyncAbortException, SyncEngine}

/** T4 — partial-failure tolerance with compensation
  * (HdfsSynchronizer.java:228-251, :339-364, :373-415): per-placement
  * worker failures are logged and skipped; abort only on structural
  * violations (a removed shard retaining a placement, a new shard ending
  * with zero placements).
  */
class SyncTolerantSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshStore(): (MetaStore, SyncEngine) = {
    val root = java.nio.file.Files.createTempDirectory("graft_tol_meta_").toString
    val store = new MetaStore(spark, root)
    (store, new SyncEngine(spark, store))
  }
  private def ids(xs: Long*): DataFrame = xs.toDF("shard_id")
  private def pl(xs: (Long, Long, String)*): DataFrame =
    xs.map(x => ShardPlacement(x._1, x._2, x._3)).toDF()
  private def seed(store: MetaStore): Unit = {
    val shards = Seq(ShardInfo(1L, 10L, "f", None, None),
      ShardInfo(1L, 11L, "f", None, None)).toDF()
    store.commit(shards, pl((10L, 100L, "a"), (10L, 100L, "b"), (11L, 200L, "a")))
  }
  private def placementSet(store: MetaStore): Set[(Long, Long, String)] =
    store.placements.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
  private def shardIdSet(store: MetaStore): Set[Long] =
    store.shards.collect().map(_.getAs[Long]("shard_id")).toSet

  test("failed create of one replica is skipped; shard lands with the rest") {
    val (store, engine) = freshStore()
    seed(store)
    // new shard 12 with two replicas; the create on host "y" fails
    val res = engine.syncTolerant(1L, ids(10L, 11L, 12L),
      pl((10L, 100L, "a"), (10L, 100L, "b"), (11L, 200L, "a"),
        (12L, 5L, "y"), (12L, 5L, "z")),
      SyncEngine.failWhere(col("op") === "create" && col("hostname") === "y"))
    assert(res.skipped.toSet == Set(("create", 12L, 5L, "y")))
    assert(shardIdSet(store) == Set(10L, 11L, 12L))
    assert(placementSet(store) ==
      Set((10L, 100L, "a"), (10L, 100L, "b"), (11L, 200L, "a"), (12L, 5L, "z")),
      "the failed replica is absent, the successful one present")
  }

  test("all creates of a new shard failing aborts (guard J6), catalog untouched") {
    val (store, engine) = freshStore()
    seed(store)
    val before = (store.currentVersion, placementSet(store), shardIdSet(store))
    val e = intercept[SyncAbortException] {
      engine.syncTolerant(1L, ids(10L, 11L, 12L),
        pl((10L, 100L, "a"), (10L, 100L, "b"), (11L, 200L, "a"), (12L, 5L, "y")),
        SyncEngine.failWhere(col("op") === "create"))
    }
    assert(e.getMessage.contains("12"))
    assert((store.currentVersion, placementSet(store), shardIdSet(store)) == before)
  }

  test("failed drop on a surviving shard is tolerated; placement stays for retry") {
    val (store, engine) = freshStore()
    seed(store)
    // replica churn on shard 10: drop (10,100,b), add (10,100,c); the drop fails
    val res = engine.syncTolerant(1L, ids(10L, 11L),
      pl((10L, 100L, "a"), (10L, 100L, "c"), (11L, 200L, "a")),
      SyncEngine.failWhere(col("op") === "drop"))
    assert(res.skipped.toSet == Set(("drop", 10L, 100L, "b")))
    assert(placementSet(store) ==
      Set((10L, 100L, "a"), (10L, 100L, "b"), (10L, 100L, "c"), (11L, 200L, "a")),
      "the un-droppable placement remains; the next run retries it")
    // the retry with a healthy worker converges
    engine.syncTolerant(1L, ids(10L, 11L),
      pl((10L, 100L, "a"), (10L, 100L, "c"), (11L, 200L, "a")))
    assert(placementSet(store) ==
      Set((10L, 100L, "a"), (10L, 100L, "c"), (11L, 200L, "a")))
  }

  test("failed drop on a REMOVED shard aborts (guard J5), catalog untouched") {
    val (store, engine) = freshStore()
    seed(store)
    val before = (store.currentVersion, placementSet(store), shardIdSet(store))
    val e = intercept[SyncAbortException] {
      engine.syncTolerant(1L, ids(10L),
        pl((10L, 100L, "a"), (10L, 100L, "b")),
        SyncEngine.failWhere(col("op") === "drop" && col("shard_id") === 11L))
    }
    assert(e.getMessage.contains("11"))
    assert((store.currentVersion, placementSet(store), shardIdSet(store)) == before)
  }

  test("with no failures, tolerant sync equals strict sync (convergence)") {
    val (store, engine) = freshStore()
    seed(store)
    val res = engine.syncTolerant(1L, ids(10L, 12L),
      pl((10L, 100L, "x"), (12L, 5L, "y")))
    assert(res.skipped.isEmpty)
    assert(placementSet(store) == Set((10L, 100L, "x"), (12L, 5L, "y")))
    assert(shardIdSet(store) == Set(10L, 12L))
    // idempotent: re-run is a no-op
    val v = store.currentVersion
    assert(engine.syncTolerant(1L, ids(10L, 12L),
      pl((10L, 100L, "x"), (12L, 5L, "y"))).version == v)
  }

  test("property: random failure injection yields old-state-or-valid-state") {
    for (seed <- 1 to 6) {
      val rnd = new Random(seed)
      val catalogPl = (for {
        id <- -2L to 8L if rnd.nextDouble() < 0.5
        h <- Seq("a", "b", "c").take(1 + rnd.nextInt(2))
      } yield (id, (id.abs % 4) * 100L, h)).toSet
      val sourcePl = (for {
        id <- -2L to 8L if rnd.nextDouble() < 0.5
        h <- Seq("a", "b", "c").take(1 + rnd.nextInt(2))
      } yield (id, (id.abs % 4) * 100L, h)).toSet
      if (sourcePl.nonEmpty) {
        val (store, engine) = freshStore()
        store.commit(
          catalogPl.map(_._1).toSeq.distinct
            .map(ShardInfo(1L, _, "f", None, None)).toDF(),
          pl(catalogPl.toSeq: _*))
        val before = (placementSet(store), shardIdSet(store))
        // ~30% of worker ops fail, deterministically per row
        val inject = SyncEngine.failWhere(
          pmod(xxhash64(col("op"), col("shard_id"), col("hostname"), lit(seed)),
            lit(10L)) < 3)
        try {
          engine.syncTolerant(1L,
            ids(sourcePl.map(_._1).toSeq.distinct: _*), pl(sourcePl.toSeq: _*), inject)
          // committed: every cataloged shard has ≥1 placement, every
          // placement's shard is cataloged, and the state is BETWEEN the
          // old catalog and the source (nothing invented)
          val (plAfter, idsAfter) = (placementSet(store), shardIdSet(store))
          assert(plAfter.map(_._1).subsetOf(idsAfter))
          assert(idsAfter.forall(id => plAfter.exists(_._1 == id) ||
            !sourcePl.exists(_._1 == id)))
          assert(plAfter.subsetOf(catalogPl ++ sourcePl))
          assert(idsAfter == sourcePl.map(_._1),
            s"seed=$seed: shard ids must converge to the source id set")
        } catch {
          case _: SyncAbortException =>
            assert((placementSet(store), shardIdSet(store)) == before,
              s"seed=$seed: aborted tolerant sync must leave the catalog untouched")
        }
      }
    }
  }
}
