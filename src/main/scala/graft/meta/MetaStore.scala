package graft.meta

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.types._

/** Parquet-backed metadata catalog with atomic multi-table commits.
  *
  * The reference keeps its catalog in PostgreSQL and wraps each sync in one
  * JDBC transaction (CitusMasterNode.java:108-126): observers see the old
  * state or the new state, never a partial apply (README.md:15-19). Here
  * the same contract is a versioned-directory layout with a single pointer
  * file — a minimal Delta-style log:
  *
  *   root/v<N>/shards/…parquet, root/v<N>/placements/…parquet
  *   root/_current                 ← contains "<N>"; one-file flip = commit
  *
  * Readers resolve `_current` then read that version's directories, so a
  * crash mid-write leaves a dangling uncommitted v<N+1> and an intact
  * catalog. Re-running sync converges (idempotence, README.md:10-13).
  * At scale the pointer flip is O(1) regardless of table size, and writes
  * are plain distributed parquet jobs.
  */
class MetaStore(spark: SparkSession, root: String) {

  val shardsSchema: StructType = StructType(Seq(
    StructField("table_id", LongType, nullable = false),
    StructField("shard_id", LongType, nullable = false),
    StructField("storage", StringType, nullable = false),
    StructField("min_value", StringType, nullable = true),
    StructField("max_value", StringType, nullable = true)))

  val placementsSchema: StructType = StructType(Seq(
    StructField("shard_id", LongType, nullable = false),
    StructField("shard_length", LongType, nullable = false),
    StructField("hostname", StringType, nullable = false)))

  private val rootPath = new Path(root)
  private def fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
  private val pointer = new Path(rootPath, "_current")

  def currentVersion: Long = {
    if (!fs.exists(pointer)) -1L
    else {
      val in = fs.open(pointer)
      try new String(in.readAllBytes(), "UTF-8").trim.toLong
      finally in.close()
    }
  }

  private def empty(schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  private def table(name: String, schema: StructType): DataFrame = {
    val v = currentVersion
    if (v < 0) empty(schema)
    else spark.read.schema(schema).parquet(s"$root/v$v/$name")
  }

  def shards: DataFrame = table("shards", shardsSchema)
  def placements: DataFrame = table("placements", placementsSchema)

  /** Typed views — the pipeline's row types as case-class Datasets
    * (SURVEY §1.3: metadata pipeline is typed, user data stays dynamic). */
  def shardsDs: Dataset[ShardInfo] = {
    import spark.implicits._
    shards.as[ShardInfo]
  }
  def placementsDs: Dataset[ShardPlacement] = {
    import spark.implicits._
    placements.as[ShardPlacement]
  }

  /** Atomically replace BOTH tables: write v<N+1> fully, then flip the
    * pointer (single-file overwrite). Old state remains readable until the
    * flip — the observable contract of the reference's master transaction.
    */
  def commit(newShards: DataFrame, newPlacements: DataFrame): Long = {
    val next = currentVersion + 1
    newShards.write.mode(SaveMode.Overwrite).parquet(s"$root/v$next/shards")
    newPlacements.write.mode(SaveMode.Overwrite).parquet(s"$root/v$next/placements")
    val out = fs.create(pointer, true)
    try out.write(next.toString.getBytes("UTF-8")) finally out.close()
    next
  }
}
