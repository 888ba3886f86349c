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

  test("old versions without a tables dir read as empty table metadata") {
    val (store, _) = fresh()
    seed(store)
    assert(store.tables.isEmpty)
    assert(store.partitionColumnOf(1L).isEmpty)
  }
}
