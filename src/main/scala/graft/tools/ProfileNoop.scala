package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.meta.MetaStore
import graft.ops.CoreOps
import graft.sync.SyncEngine

/** Builder-side profiler for the no-op sync fast path: replays each job the
  * engine runs when the diff is empty, timed individually.
  */
object ProfileNoop {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(0, 1000000).selectExpr("sum(id)").collect()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[noop] $label%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val src = Tables.load(spark, dir, "lineitem").select(
        col("l_orderkey").as("shard_id"),
        col("l_linenumber").cast(LongType).as("shard_length"),
        concat(lit("host"), (col("l_suppkey") % 7).cast(StringType)).as("hostname"))
      .distinct().persist()
    src.count()

    val root = java.nio.file.Files.createTempDirectory("graft_noopprof_").toString
    val store = new MetaStore(spark, root)
    val engine = new SyncEngine(spark, store)
    val ids = src.select("shard_id").distinct()
    engine.sync(1L, ids, src)
    println(s"[noop] catalog committed, v=${store.currentVersion}")

    time("full sync no-op (cold, first)")(engine.sync(1L, ids, src))

    // Replay the no-op path's jobs one by one.
    val catalogIds = store.shards.where(col("table_id") === 1L).select("shard_id")
    val catalogPlacements = store.placements
    val srcIds = time("srcIds dedup+persist")(
      { val d = ids.select("shard_id").dropDuplicates().persist(); d.count(); d })
    val srcPl = time("srcPl dedup+persist")(
      { val d = src.select("shard_id", "shard_length", "hostname")
          .dropDuplicates().persist(); d.count(); d })
    val newShardIds = CoreOps.diffNew(srcIds, catalogIds).persist()
    val oldShardIds = CoreOps.diffOld(srcIds, catalogIds).persist()
    time("idsChanged (union limit1 isEmpty)")(
      newShardIds.select(lit(1).as("one"))
        .union(oldShardIds.select(lit(1).as("one"))).limit(1).isEmpty)
    time("srcPl.count")(srcPl.count())
    time("catalogPlacements.count")(catalogPlacements.count())
    time("placements except limit1 isEmpty")(
      srcPl.except(catalogPlacements).limit(1).isEmpty)
    time("full sync no-op (engine)")(engine.sync(1L, ids, src))
    spark.stop()
  }
}
