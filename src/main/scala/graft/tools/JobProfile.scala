package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.meta.MetaStore
import graft.sync.SyncEngine
import scala.collection.concurrent.TrieMap

object JobProfile {
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
    val starts = TrieMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts(js.jobId) = (System.nanoTime(), Option(js.properties.getProperty("spark.job.description")).getOrElse(""))
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val (t0, desc) = starts.getOrElse(je.jobId, (0L, ""))
        println(f"[job] ${je.jobId}%3d ${(System.nanoTime() - t0)/1e9}%7.3f s  ${desc.take(80)}")
      }
    })
    spark.range(0, 1000000).selectExpr("sum(id)").collect()
    val src = Tables.load(spark, dir, "lineitem").select(
        col("l_orderkey").as("shard_id"),
        col("l_linenumber").cast(LongType).as("shard_length"),
        concat(lit("host"), (col("l_suppkey") % 7).cast(StringType)).as("hostname"))
      .distinct().persist()
    src.count()
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
    store.commit(catShards, catPlacements)
    val engine = new SyncEngine(spark, store)
    val ids = src.select("shard_id").distinct()
    println("=== sync (apply) ===")
    val t0 = System.nanoTime(); engine.sync(1L, ids, src)
    println(f"=== apply total ${(System.nanoTime()-t0)/1e9}%.2f s ===")
    println("=== sync (no-op) ===")
    val t1 = System.nanoTime(); engine.sync(1L, ids, src)
    println(f"=== noop total ${(System.nanoTime()-t1)/1e9}%.2f s ===")
    spark.stop()
  }
}
