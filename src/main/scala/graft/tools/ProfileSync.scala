package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.meta.MetaStore
import graft.sync.SyncEngine

/** Builder-side stage profiler for the q_sync_apply pipeline (not part of
  * the engine API). Prints per-stage wall times to locate the bottleneck.
  */
object ProfileSync {
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
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val src = Tables.load(spark, dir, "lineitem").select(
        col("l_orderkey").as("shard_id"),
        col("l_linenumber").cast(LongType).as("shard_length"),
        concat(lit("host"), (col("l_suppkey") % 7).cast(StringType)).as("hostname"))
      .distinct().persist()
    time("materialize src")(src.count())

    val ord = Tables.load(spark, dir, "orders")
    val catShards = ord.select(lit(1L).as("table_id"),
      col("o_orderkey").as("shard_id"), lit("f").as("storage"),
      lit(null).cast(StringType).as("min_value"),
      lit(null).cast(StringType).as("max_value"))
    val catPlacements = ord.select(col("o_orderkey").as("shard_id"),
      lit(1L).as("shard_length"),
      concat(lit("host"), (col("o_custkey") % 7).cast(StringType)).as("hostname"))
      .distinct()
    val root = java.nio.file.Files.createTempDirectory("graft_prof_meta_").toString
    val store = new MetaStore(spark, root)
    time("seed commit")(store.commit(catShards, catPlacements))

    val engine = new SyncEngine(spark, store)
    val ids = src.select("shard_id").distinct()
    time("sync (apply)")(engine.sync(1L, ids, src))
    time("sync (no-op re-run)")(engine.sync(1L, ids, src))
    time("readback orderBy count")(
      store.placements.orderBy("shard_id", "shard_length", "hostname").count())
    spark.stop()
  }
}
