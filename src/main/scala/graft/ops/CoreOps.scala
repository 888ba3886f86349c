package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One listed file — the engine's "shard" row (SURVEY §1.1).
  * Mirrors the semantics of ShardPlacement.java:6-21 in the reference:
  * (id, length, host) — here (path, length) since locality is Spark-native.
  */
case class FileEntry(name: String, path: String, length: Long, isDir: Boolean)

/** Core relational operators — pure `DataFrame => DataFrame` functions, one
  * per SURVEY §2 inventory row. All are declarative (Catalyst-optimizable):
  * no collect-loops, no RDDs, no UDFs. At 100 TB each compiles to the plan
  * you'd hand-write: broadcast/sort-merge joins, partial aggregation,
  * parquet predicate pushdown.
  */
object CoreOps {

  // ── §2.1 S1/S2: recursive directory listing as a DataFrame ────────────
  /** Recursive file listing → DataFrame. Reference walks the NameNode with
    * cursor pagination, single-threaded (HdfsMasterNode.java:110-147).
    * Here the walk is a distributed FRONTIER EXPANSION (the shape of
    * Spark's own InMemoryFileIndex parallel partition discovery): each
    * BFS level lists exactly one directory depth on the executors and
    * only the discovered DIRECTORY paths return to the driver (file rows
    * stay distributed), so a lake whose fan-out appears below the first
    * level — 4 top dirs hiding 10⁶ nested dirs — still spreads across
    * the cluster instead of serializing on 4 tasks. Once the frontier is
    * wide enough to keep every slot busy (or the level cap is hit), one
    * final job walks each remaining subtree recursively. The Hadoop
    * configuration travels as plain key/value pairs (Configuration
    * itself is not serializable).
    */
  def fileListing(spark: SparkSession, dir: String,
                  parallelism: Int = 32): DataFrame =
    fileListingWithStats(spark, dir, parallelism)._1

  /** [[fileListing]] plus the per-level frontier sizes the BFS saw —
    * the observable seam the deep-tree distribution spec pins. */
  def fileListingWithStats(spark: SparkSession, dir: String,
                           parallelism: Int = 32,
                           maxBfsLevels: Int = 40): (DataFrame, Seq[Int]) = {
    import org.apache.hadoop.conf.Configuration
    import org.apache.hadoop.fs.Path
    import scala.jdk.CollectionConverters._
    import spark.implicits._

    def walk(fs: org.apache.hadoop.fs.FileSystem, p: Path): Seq[FileEntry] =
      fs.listStatus(p).toSeq.flatMap { st =>
        if (st.isDirectory) walk(fs, st.getPath)
        else Seq(FileEntry(st.getPath.getName, st.getPath.toString, st.getLen,
          isDir = false))
      }

    def listLevel(fs: org.apache.hadoop.fs.FileSystem, p: Path): Seq[FileEntry] =
      fs.listStatus(p).toSeq.map(st =>
        FileEntry(st.getPath.getName, st.getPath.toString, st.getLen,
          st.isDirectory))

    val rootPath = new Path(dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = rootPath.getFileSystem(conf)
    val rootEntries = listLevel(fs, rootPath) // only driver-side listing: one dir
    val rootDf = spark.createDataset(rootEntries.filter(!_.isDir)).toDF()
    val confKv = conf.iterator().asScala.map(e => (e.getKey, e.getValue)).toSeq
    // Expand level by level while the frontier is too narrow to keep the
    // cluster busy; collect only directory PATHS per level (bounded
    // metadata — the InMemoryFileIndex discovery pattern), never files.
    // Level RDDs are persisted because each is consumed twice: its dirs
    // are collected to drive the next level, its files feed the result.
    var frontier = rootEntries.filter(_.isDir).map(_.path)
    var level = 0
    val levelSizes = Seq.newBuilder[Int]
    var fileRdds = List.empty[org.apache.spark.rdd.RDD[FileEntry]]
    var persisted = List.empty[org.apache.spark.rdd.RDD[FileEntry]]
    val wide = parallelism * 4 // enough dirs that a recursive walk balances
    while (frontier.nonEmpty && frontier.size < wide && level < maxBfsLevels) {
      levelSizes += frontier.size
      val lvl = spark.sparkContext
        .parallelize(frontier, math.max(1, math.min(frontier.size, parallelism)))
        .mapPartitions { dirs =>
          val c = new Configuration(false)
          confKv.foreach { case (k, v) => c.set(k, v) }
          dirs.flatMap { d =>
            val p = new Path(d)
            listLevel(p.getFileSystem(c), p)
          }
        }
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      frontier = lvl.filter(_.isDir).map(_.path).collect().toSeq
      fileRdds ::= lvl.filter(!_.isDir)
      persisted ::= lvl
      level += 1
    }
    if (frontier.nonEmpty) {
      levelSizes += frontier.size
      fileRdds ::= spark.sparkContext
        .parallelize(frontier, math.max(1, math.min(frontier.size, parallelism)))
        .mapPartitions { dirs =>
          val c = new Configuration(false)
          confKv.foreach { case (k, v) => c.set(k, v) }
          dirs.flatMap { d =>
            val p = new Path(d)
            walk(p.getFileSystem(c), p)
          }
        }
    }
    // Materialize the union eagerly (file METADATA rows — the same scale
    // InMemoryFileIndex would hold on the driver, kept distributed here)
    // so every per-level RDD can be RELEASED now instead of living in the
    // result's lineage until driver GC. localCheckpoint blocks are
    // ContextCleaner-managed once the caller drops the frame.
    val df = fileRdds.foldLeft(rootDf)((acc, r) =>
      acc.union(spark.createDataset(r).toDF()))
      .localCheckpoint(true)
    persisted.foreach(_.unpersist(blocking = false))
    (df, levelSizes.result())
  }

  // ── §2.2 P3/P4: filters ───────────────────────────────────────────────
  /** Point lookup — pushed to the parquet scan as `PushedFilters: [EqualTo]`. */
  def pointLookup(df: DataFrame, key: String, value: Column): DataFrame =
    df.where(col(key) === value)

  // ── §2.3 J3: semi-join probe (placements ⋉ ids) ───────────────────────
  /** The reference's sorted-set range probe (HdfsSynchronizer.java:417-431)
    * as a relational left-semi join; Catalyst broadcasts the id side when
    * small.
    */
  def placementsOf(placements: DataFrame, ids: DataFrame, key: String): DataFrame =
    placements.join(ids.select(key), Seq(key), "left_semi")  // semi-join dedups the build side itself

  // ── §2.3 J5/J6: existence checks, returning violators ─────────────────
  /** Shard ids that still have placements (must be empty before delete —
    * HdfsSynchronizer.java:263-273). */
  def orphanPlacements(ids: DataFrame, placements: DataFrame, key: String): DataFrame =
    ids.join(placements, Seq(key), "left_semi")

  /** Shard ids with zero placements (must be empty before insert —
    * HdfsSynchronizer.java:282-289). */
  def unplacedShards(ids: DataFrame, placements: DataFrame, key: String): DataFrame =
    ids.join(placements, Seq(key), "left_anti")

  // ── §2.5 O2/O3: set algebra (the diff engine's core) ──────────────────
  /** new = source − target (HdfsSynchronizer.java:177-188). Set semantics
    * match the reference's TreeSet/HashSet: Spark's `except` is EXCEPT
    * DISTINCT, so no explicit dedup pass is needed on either side.
    */
  def diffNew(source: DataFrame, target: DataFrame): DataFrame =
    source.except(target)

  /** old = target − source. */
  def diffOld(source: DataFrame, target: DataFrame): DataFrame =
    target.except(source)

  /** View maintenance: current = (existing − deleted) ∪ inserted
    * (HdfsSynchronizer.java:253-257). UNION set semantics. */
  def currentSet(existing: DataFrame, deleted: DataFrame, inserted: DataFrame): DataFrame =
    existing.except(deleted).union(inserted).distinct()

  /** Keyed MERGE/upsert: source rows REPLACE target rows sharing their
    * key; unmatched target rows survive; unmatched source rows insert —
    * the update half the reference's insert/delete sinks (S5-S8) lack,
    * and the same plan Delta's MERGE lowers to when every match is an
    * UPDATE *: one left-anti join on the key plus a union. Shuffles on
    * the key only; at scale the anti join broadcasts whenever the source
    * delta is small, which is the common case. `source` must be unique
    * per key (pre-aggregate otherwise — a duplicated key would insert
    * both rows, which is MERGE's own cardinality error). */
  def upsert(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame =
    target.join(source.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(source)

  // ── §2.4 A1: min/max per group, stored as strings (MinMaxValue) ───────
  /** Per-shard min/max of the partition column, coerced to strings like
    * MinMaxValue.java:4-30 / CitusMasterNode.java:233-235. One distributed
    * job with map-side partial aggregation — replaces the reference's
    * per-shard JDBC round trips (SURVEY §3.3).
    */
  def minMaxPerGroup(df: DataFrame, group: String, valueCol: Column,
                     fmt: Column => Column = _.cast(StringType)): DataFrame =
    df.groupBy(col(group)).agg(
      fmt(min(valueCol)).as("min_value"),
      fmt(max(valueCol)).as("max_value"))

  // ── §2.4 A3: first-non-null across ordered candidates ─────────────────
  /** Replica-fallback semantics (HdfsSynchronizer.java:294-310): per group,
    * the value of the first candidate (in total `order`) whose value is
    * non-null. Deterministic: implemented as a ranking window over the
    * non-null rows, not `first(ignoreNulls)` (whose result depends on
    * partition order).
    */
  def firstNonNullPerGroup(df: DataFrame, group: String, order: Seq[String],
                           valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(group)).orderBy(order.map(col): _*)
    df.where(col(valueCol).isNotNull)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col(group), col(valueCol))
  }

  // ── §2.4 A2: distinct ─────────────────────────────────────────────────
  def distinctIds(df: DataFrame, cols: String*): DataFrame =
    df.select(cols.map(col): _*).distinct()

  // ── §2.5 O1: multi-key total sort ─────────────────────────────────────
  /** TreeSet total order (ShardPlacement.java:77-98) → global sort. At
    * scale this is a range-partitioned sort, Spark's native total order. */
  def multikeySort(df: DataFrame, keys: String*): DataFrame =
    df.orderBy(keys.map(col): _*)

  // ── §2.5 O4: explode / generator ──────────────────────────────────────
  /** One row per array element with its position — the reference's
    * block → replica fan-out (HdfsMasterNode.java:86-100). */
  def explodePositional(df: DataFrame, idCol: String, arrayCol: String): DataFrame =
    df.select(col(idCol), posexplode(col(arrayCol)).as(Seq("pos", "val")))

  // ── §2.5 O5: options-to-table (pg_options_to_table analog) ───────────
  /** Key/value text → (key, value) rows, like pg_options_to_table over
    * ftoptions (CitusMasterNode.java:338-381). Input here is a JSON-ish
    * string map; `from_json` + `explode` keeps it codegen-friendly.
    */
  def optionsToTable(df: DataFrame, idCol: String, optionsCol: String): DataFrame =
    df.select(col(idCol),
        explode(from_json(col(optionsCol), MapType(StringType, LongType)))
          .as(Seq("option_name", "option_value")))

  // ── §2.1 S10: unsigned 64-bit id rendering ────────────────────────────
  /** `tableName_<unsigned64(id)>` (CitusWorkerNode.java:185-193): negative
    * ids are rendered as id + 2^64. DECIMAL(20,0) — Long cannot hold 2^64.
    */
  private val TwoPow64 = lit(BigDecimal("18446744073709551616")).cast(DecimalType(21, 0))
  def unsignedId(id: Column): Column = {
    val d = id.cast(DecimalType(20, 0))
    when(id >= 0, d).otherwise((d.cast(DecimalType(21, 0)) + TwoPow64).cast(DecimalType(20, 0)))
  }
  def shardTableName(tableName: String, id: Column): Column =
    concat(lit(tableName), lit("_"), unsignedId(id).cast(StringType))

  // ── §4: statistics-driven pruning (the stats' purpose, README.md:42-46) ─
  /** Shards whose [min_value, max_value] interval overlaps [lo, hi] — the
    * partition-pruning predicate CitusDB evaluates against the stats this
    * tool stores. Stats are strings (MinMaxValue semantics); callers use an
    * order-preserving encoding (e.g. 'yyyy-MM-dd HH:mm:ss', zero-padded
    * numbers) so string comparison IS range comparison. Null stats (shard
    * never scanned) are conservatively kept — pruning may only skip shards
    * PROVEN disjoint. At scale this is the engine-side file-skipping step
    * that cuts a 100 TB scan to the overlapping shards before any data is
    * read; the same predicate shape Spark applies to parquet footers.
    */
  def pruneByStats(stats: DataFrame, lo: Column, hi: Column): DataFrame =
    stats.where(col("min_value").isNull || col("max_value").isNull
      || (col("min_value") <= hi && col("max_value") >= lo))

  // ── skew handling: salted equi-join ───────────────────────────────────
  /** Equi-join where `skewed`'s key distribution has heavy hitters that
    * would overload single shuffle partitions: each skewed row gets a
    * deterministic salt in [0, salts) (hash of the whole row — spreads a
    * hot key across `salts` partitions), the other side is replicated
    * `salts`×, and the join keys on (key, salt). Result equals the plain
    * join; shuffle skew drops by up to `salts`×. Use when AQE's runtime
    * skew-join split (enabled by default) isn't available — e.g. the skewed
    * aggregation feeding the join, or broadcast-ineligible sides.
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
                 salts: Int): DataFrame = {
    require(salts > 0)
    val left = skewed.withColumn("__salt",
      pmod(xxhash64(skewed.columns.map(col): _*), lit(salts.toLong)))
    val right = other.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    left.join(right, Seq(key, "__salt")).drop("__salt")
  }

  // ── X76: placement rebalance planner ──────────────────────────────────
  /** Compute the MOVE PLAN that balances shard counts across servers —
    * the operation a placement catalog exists to support (the reference
    * maintains placements; this plans their redistribution). Targets are
    * the exact balanced spread (N div S, the first N mod S servers in
    * server order holding one extra); each overloaded server gives up its
    * HIGHEST shard ids (deterministic choice), each move pairs with a
    * deficit slot by global index, so the plan is unique, minimal
    * (Σ surplus moves — no plan balances with fewer), and
    * engine-replayable.
    *
    * Scale shape: windows touch only SERVER-CARDINALITY frames (the
    * count ranks and the surplus/deficit prefix-sum offsets — broadcast
    * back); the placement-sized stages are a groupBy, a per-server rank
    * window (partitioned — no global window), and one integer-keyed
    * equi-join of movers to slots. Balances across servers PRESENT in
    * the frame; include empty servers by unioning zero-count rows
    * upstream.
    *
    * Output: (shard_id, from_server, to_server).
    */
  def rebalancePlan(placements: DataFrame, shardCol: String,
                    serverCol: String): DataFrame = {
    val pl = placements.select(col(shardCol).as("shard_id"),
      col(serverCol).as("server"))
      .where(col("shard_id").isNotNull && col("server").isNotNull)
    val counts = pl.groupBy("server").agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(sum(col("cnt")).cast(LongType).as("__N"),
      count(lit(1)).as("__S"))
    val cw = Window.orderBy("server") // server-cardinality frame only
    val ranked = counts.crossJoin(broadcast(totals))
      .withColumn("__i", row_number().over(cw).cast(LongType))
      .withColumn("target", expr("__N div __S") +
        when(col("__i") <= pmod(col("__N"), col("__S")), 1L).otherwise(0L))
      .withColumn("delta", col("cnt") - col("target"))
    val run = cw.rowsBetween(Window.unboundedPreceding, -1)
    val givers = ranked.where(col("delta") > 0)
      .withColumn("__off", coalesce(sum(col("delta")).over(run), lit(0L)))
      .select(col("server"), col("delta"), col("__off"))
    val takers = ranked.where(col("delta") < 0)
      .withColumn("__off", coalesce(sum(-col("delta")).over(run), lit(0L)))
      .select(col("server").as("to_server"), (-col("delta")).as("need"),
        col("__off"))
    val sw = Window.partitionBy("server").orderBy(col("shard_id").desc)
    val movers = pl.join(broadcast(givers), "server")
      .withColumn("__r", row_number().over(sw).cast(LongType))
      .where(col("__r") <= col("delta"))
      .select(col("shard_id"), col("server").as("from_server"),
        (col("__off") + col("__r")).as("__idx"))
    val slots = takers
      .select(col("to_server"), col("__off"),
        explode(sequence(lit(1L), col("need"))).as("__j"))
      .select(col("to_server"), (col("__off") + col("__j")).as("__idx"))
    movers.join(slots, "__idx")
      .select(col("shard_id"), col("from_server"), col("to_server"))
  }
}
