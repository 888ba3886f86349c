package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.CoreOps

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry binds an operator from SURVEY §2's inventory to the fixture
  * tables with a total ORDER BY (oracle hash-matching requires deterministic
  * row order), and `oracleSql` carries the DuckDB-dialect equivalent with
  * IDENTICAL column names.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's core algorithm — snapshot diff + view maintenance
    * (current = existing − deleted ∪ inserted, HdfsSynchronizer.java:253-257)
    * — on the fixture isomorph. (q_diff_new itself is empty on TPC-H-shaped
    * data: every lineitem key exists in orders.)
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q_current_set")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── §2.5 O2 / §2.3 J4: set difference (the diff engine) ─────────────
    "q_diff_new" -> ((s, dir) => {
      CoreOps.diffNew(
        t(s, dir, "lineitem").select(col("l_orderkey").as("key")),
        t(s, dir, "orders").select(col("o_orderkey").as("key")))
        .orderBy("key")
    }),
    "q_diff_old" -> ((s, dir) => {
      CoreOps.diffOld(
        t(s, dir, "lineitem").select(col("l_orderkey").as("key")),
        t(s, dir, "orders").select(col("o_orderkey").as("key")))
        .orderBy("key")
    }),

    // ── §2.5 O3: view maintenance current = (existing − deleted) ∪ inserted
    "q_current_set" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      CoreOps.currentSet(
        li.select(col("l_orderkey").as("key")),
        li.where(col("l_returnflag") === "R").select(col("l_orderkey").as("key")),
        t(s, dir, "orders").where(col("o_orderstatus") === "F")
          .select(col("o_orderkey").as("key")))
        .orderBy("key")
    }),

    // ── §2.4 A2: distinct ────────────────────────────────────────────────
    "q_distinct_ids" -> ((s, dir) =>
      CoreOps.distinctIds(t(s, dir, "events"), "user_id").orderBy("user_id")),

    // ── §2.5 O1: multi-key total sort (ShardPlacement total order) ──────
    "q_multikey_sort" -> ((s, dir) =>
      CoreOps.multikeySort(
        t(s, dir, "lineitem").select("l_suppkey", "l_orderkey", "l_linenumber"),
        "l_suppkey", "l_orderkey", "l_linenumber")),

    // ── §2.1 S3 / §2.2 P3: catalog point lookup ──────────────────────────
    "q_meta_shard_ids" -> ((s, dir) =>
      CoreOps.pointLookup(t(s, dir, "orders"), "o_custkey", lit(42L))
        .select(col("o_orderkey").as("shard_id")).orderBy("shard_id")),

    // ── §2.1 S4 / §2.3 J1: catalog equi-join with filter + projection ───
    "q_meta_placements" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .where(col("c_mktsegment") === "BUILDING")
        .select(col("o_orderkey"), col("c_custkey"), col("c_name"))
        .orderBy("o_orderkey")
    }),

    // ── §2.3 J2: server-of-table lookup join ─────────────────────────────
    "q_server_of_table" -> ((s, dir) => {
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      n.join(r, n("n_regionkey") === r("r_regionkey"))
        .select(col("n_name"), col("r_name")).orderBy("n_name")
    }),

    // ── §2.3 J3 / §2.2 P4: semi-join probe ──────────────────────────────
    "q_placements_of_shards" -> ((s, dir) => {
      val urgent = t(s, dir, "orders").where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey").as("l_orderkey"))
      CoreOps.placementsOf(
        t(s, dir, "lineitem").select("l_orderkey", "l_linenumber", "l_suppkey"),
        urgent, "l_orderkey")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // ── §2.3 J5: orphan-placement violators ──────────────────────────────
    "q_orphan_placements" -> ((s, dir) => {
      val removed = t(s, dir, "orders").where(col("o_orderstatus") === "F")
        .select(col("o_orderkey").as("shard_id"))
      CoreOps.orphanPlacements(
        removed,
        t(s, dir, "lineitem").select(col("l_orderkey").as("shard_id")),
        "shard_id").distinct().orderBy("shard_id")
    }),

    // ── §2.3 J6: unplaced-shard violators ────────────────────────────────
    "q_unplaced_shards" -> ((s, dir) =>
      CoreOps.unplacedShards(
        t(s, dir, "orders").select(col("o_orderkey").as("shard_id")),
        t(s, dir, "lineitem").select(col("l_orderkey").as("shard_id")),
        "shard_id").orderBy("shard_id")),

    // ── §2.4 A1: min/max per group, string-coerced (MinMaxValue) ────────
    "q_minmax_per_group" -> ((s, dir) =>
      CoreOps.minMaxPerGroup(
        t(s, dir, "lineitem"), "l_suppkey", col("l_shipdate"),
        c => date_format(c, "yyyy-MM-dd HH:mm:ss"))
        .orderBy("l_suppkey")),

    // ── §2.4 A3: first-non-null across ordered candidates ───────────────
    "q_first_per_group" -> ((s, dir) => {
      val ev = t(s, dir, "events").withColumn(
        "stat", when(col("event_type") === "click", col("value")))
      CoreOps.firstNonNullPerGroup(ev, "user_id", Seq("ts", "event_id"), "stat")
        .orderBy("user_id")
    }),

    // ── §2.5 O4: explode / generator (block → replicas analog) ──────────
    "q_explode_replicas" -> ((s, dir) =>
      CoreOps.explodePositional(t(s, dir, "embeddings"), "vec_id", "embedding")
        .select(col("vec_id"), col("pos"),
          round(col("val").cast(DoubleType), 6).as("val"))
        .orderBy("vec_id", "pos")),

    // ── §2.5 O5: options-to-table generator ──────────────────────────────
    "q_options_to_table" -> ((s, dir) =>
      CoreOps.optionsToTable(t(s, dir, "events"), "event_id", "props")
        .orderBy("event_id", "option_name")),

    // ── §2.1 S10: unsigned 64-bit shard naming ───────────────────────────
    "q_unsigned_id" -> ((s, dir) =>
      t(s, dir, "orders")
        .select((col("o_orderkey") - 7500L).as("id"))
        .select(col("id"),
          CoreOps.unsignedId(col("id")).cast(StringType).as("uid"),
          CoreOps.shardTableName("shard", col("id")).as("shard_name"))
        .orderBy("id")),

    // ── §2.1 S1/S2: recursive file listing (NameNode walk analog) ───────
    "q_file_listing" -> ((s, dir) =>
      CoreOps.fileListing(s, dir).select("name").orderBy("name")),

    // ── headline agg: TPC-H Q1-style pricing summary (bench flagship) ───
    "q1_pricing" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast(DecimalType(38, 6))).cast(DoubleType).as("sum_qty"),
          sum(col("l_extendedprice").cast(DecimalType(38, 6))).cast(DoubleType).as("sum_base_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q_diff_new" ->
      """SELECT l_orderkey AS key FROM lineitem
         EXCEPT SELECT o_orderkey FROM orders ORDER BY key""",
    "q_diff_old" ->
      """SELECT o_orderkey AS key FROM orders
         EXCEPT SELECT l_orderkey FROM lineitem ORDER BY key""",
    "q_current_set" ->
      """SELECT key FROM (
           SELECT l_orderkey AS key FROM lineitem
           EXCEPT SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
           UNION SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
         ) ORDER BY key""",
    "q_distinct_ids" ->
      "SELECT DISTINCT user_id FROM events ORDER BY user_id",
    "q_multikey_sort" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber FROM lineitem
         ORDER BY l_suppkey, l_orderkey, l_linenumber""",
    "q_meta_shard_ids" ->
      "SELECT o_orderkey AS shard_id FROM orders WHERE o_custkey = 42 ORDER BY shard_id",
    "q_meta_placements" ->
      """SELECT o_orderkey, c_custkey, c_name FROM orders
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING' ORDER BY o_orderkey""",
    "q_server_of_table" ->
      """SELECT n_name, r_name FROM nation
         JOIN region ON n_regionkey = r_regionkey ORDER BY n_name""",
    "q_placements_of_shards" ->
      """SELECT l_orderkey, l_linenumber, l_suppkey FROM lineitem
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_orderkey = l_orderkey AND o_orderpriority = '1-URGENT')
         ORDER BY l_orderkey, l_linenumber""",
    "q_orphan_placements" ->
      """SELECT DISTINCT o_orderkey AS shard_id FROM orders
         WHERE o_orderstatus = 'F'
           AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
         ORDER BY shard_id""",
    "q_unplaced_shards" ->
      """SELECT o_orderkey AS shard_id FROM orders
         WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
         ORDER BY shard_id""",
    "q_minmax_per_group" ->
      """SELECT l_suppkey,
                strftime(min(l_shipdate), '%Y-%m-%d %H:%M:%S') AS min_value,
                strftime(max(l_shipdate), '%Y-%m-%d %H:%M:%S') AS max_value
         FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""",
    "q_first_per_group" ->
      """SELECT user_id, stat FROM (
           SELECT user_id, value AS stat,
                  row_number() OVER (PARTITION BY user_id
                    ORDER BY date_trunc('microseconds', ts), event_id) AS rn
           FROM events WHERE event_type = 'click'
         ) WHERE rn = 1 ORDER BY user_id""",
    "q_explode_replicas" ->
      """SELECT vec_id, CAST(i - 1 AS INT) AS pos,
                round(CAST(embedding[i] AS DOUBLE), 6) AS val
         FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
         ORDER BY vec_id, pos""",
    "q_options_to_table" ->
      """SELECT event_id,
                regexp_extract(props, '"([a-z]+)"', 1) AS option_name,
                CAST(regexp_extract(props, ': *([0-9]+)', 1) AS BIGINT) AS option_value
         FROM events ORDER BY event_id, option_name""",
    "q_unsigned_id" ->
      """SELECT id, CAST(uid AS VARCHAR) AS uid,
                'shard_' || CAST(uid AS VARCHAR) AS shard_name
         FROM (
           SELECT o_orderkey - 7500 AS id,
                  CASE WHEN o_orderkey - 7500 >= 0
                       THEN CAST(o_orderkey - 7500 AS DECIMAL(20,0))
                       ELSE CAST(o_orderkey - 7500 AS DECIMAL(20,0))
                            + CAST('18446744073709551616' AS DECIMAL(21,0)) END AS uid
           FROM orders
         ) ORDER BY id""",
    "q_file_listing" ->
      """SELECT name FROM (VALUES ('customer.parquet'), ('documents.parquet'),
           ('embeddings.parquet'), ('events.parquet'), ('lineitem.parquet'),
           ('nation.parquet'), ('orders.parquet'), ('part.parquet'),
           ('region.parquet'), ('supplier.parquet')) AS t(name)
         ORDER BY name""",
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
                count(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus"""
  )
}
