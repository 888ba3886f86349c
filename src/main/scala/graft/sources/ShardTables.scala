package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.CoreOps

/** Per-shard table registration — the engine's form of the reference's
  * worker-side DDL replay (S9–S11):
  *
  *   - the reference replays `master_get_table_ddl_events` DDL through
  *     `worker_apply_shard_ddl_command`, rewriting the table name to
  *     `<table>_<unsigned64(shardId)>` and pointing it at one block file
  *     (CitusWorkerNode.java:69-134); every create is preceded by
  *     `DROP ... IF EXISTS` so re-runs converge (README.md:10-13)
  *   - here a "shard table" is a catalog entry over one file/directory of
  *     a table's data; schema travels with the parquet footers, so the DDL
  *     event stream collapses to `CREATE TABLE ... USING parquet LOCATION`
  *
  * In Spark the per-shard table is rarely needed (a scan plans per-file
  * splits natively); it exists for parity and for workflows that address
  * shards individually (the min/max stats query did exactly that).
  */
object ShardTables {

  /** The shard table's name: `<table>_<unsigned64(shardId)>`, negative ids
    * rendered as id + 2^64 (CitusWorkerNode.java:185-193). */
  def shardTableName(table: String, shardId: Long): String = {
    val uid =
      if (shardId >= 0) BigInt(shardId)
      else BigInt(shardId) + (BigInt(1) << 64)
    s"${table}_$uid"
  }

  /** Idempotent create: drop-if-exists then create an external table over
    * `location` (the reference's T3 contract — re-registration converges,
    * never errors). Returns the table name.
    */
  def register(spark: SparkSession, table: String, shardId: Long,
               location: String): String = {
    val name = shardTableName(table, shardId)
    // escape the interpolated identifier/literal (the reference
    // parameterizes its worker DDL; string-built SQL must quote-escape or
    // a path containing ' or a name containing ` breaks the statement)
    val qName = name.replace("`", "``")
    val qLoc = location.replace("'", "''")
    spark.sql(s"DROP TABLE IF EXISTS `$qName`")
    spark.sql(s"CREATE TABLE `$qName` USING parquet LOCATION '$qLoc'")
    name
  }

  /** Idempotent drop (S11). */
  def drop(spark: SparkSession, table: String, shardId: Long): Unit =
    spark.sql(s"DROP TABLE IF EXISTS `${shardTableName(table, shardId).replace("`", "``")}`")

  /** The stats query the reference runs per new shard (§3.3): min/max of
    * the partition column over ONE shard table. The set-oriented form for
    * many shards at once is CoreOps.minMaxPerGroup; this per-shard form
    * exists for parity with `SELECT min(col), max(col) FROM table_<uid>`
    * (CitusWorkerNode.java:140-165).
    */
  def minMax(spark: SparkSession, table: String, shardId: Long,
             column: String): (Option[String], Option[String]) = {
    val row = spark.table(shardTableName(table, shardId))
      .agg(min(col(column)).cast("string"), max(col(column)).cast("string"))
      .collect().head
    (Option(row.getString(0)), Option(row.getString(1)))
  }
}
