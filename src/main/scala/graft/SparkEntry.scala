package graft

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.CoreOps
import graft.ext.{Analytics, Dedup, Events, Media, Sampling, Similarity, SuffixOps, TextIndex, TextOps}
import graft.meta.MetaStore
import graft.sync.SyncEngine

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

  /** Unique memory-sink names for the streaming queries: a bench pass
    * re-runs each query in the same session, and a stopped query's sink
    * table must not be clobbered mid-read by the next run. */
  private val streamSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Per-JVM scratch root for query-constructed artifacts (persisted
    * indexes, catalogs, checkpoints, round-trip files): every query's
    * temp directory is a child of ONE root that a shutdown hook removes
    * recursively, so repeated driver/bench invocations cannot accumulate
    * index copies in the temp filesystem. Deletion at JVM exit, not
    * earlier — the returned DataFrames read these paths lazily. */
  private lazy val scratchRoot: java.nio.file.Path = {
    val root = java.nio.file.Files.createTempDirectory("graft_scratch_")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      org.apache.commons.io.FileUtils.deleteQuietly(root.toFile); ()
    }))
    root
  }

  private def scratch(prefix: String): String =
    java.nio.file.Files.createTempDirectory(scratchRoot, prefix).toString

  /** X129's standing-query registry, shared by the batch and streaming
    * percolation queries (and replayed as a VALUES literal in their
    * shared oracle): terms span both corpora vocabularies, query 3 is
    * vocabulary-dependent (fires at sf0.01, not in the GenData vocab),
    * query 4 never fires anywhere. */
  private def percolateRegistry(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      (1L, Seq("hash", "join")),
      (2L, Seq("table", "scan", "filter")),
      (3L, Seq("stream", "batch")),
      (4L, Seq("no_such_token_zzqx")),
      (5L, Seq("agg"))).toDF("qid", "terms")
  }

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
        // (orderkey, linenumber) is NOT unique in the synthetic fixtures —
        // all three columns are needed for a total order
        .orderBy("l_orderkey", "l_linenumber", "l_suppkey")
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

    // ── §4: stats-driven shard pruning (the stats' purpose, README:42-46)
    "q_stats_prune" -> ((s, dir) => {
      val stats = CoreOps.minMaxPerGroup(
        t(s, dir, "lineitem"), "l_orderkey", col("l_shipdate"),
        c => date_format(c, "yyyy-MM-dd HH:mm:ss"))
      CoreOps.pruneByStats(stats,
          lit("1995-06-01 00:00:00"), lit("1995-09-01 00:00:00"))
        .select(col("l_orderkey").as("shard_id"),
          col("min_value"), col("max_value"))
        .orderBy("shard_id")
    }),

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

    // ── §2.1 S1/S2: recursive file listing (NameNode walk analog),
    //    certified LAYOUT-INDEPENDENTLY: the walk discovers every data
    //    file under the root (single-file fixture tables AND directory-
    //    of-parts GenData tables), the discovered splits are then
    //    actually SCANNED per table and the row counts compared against
    //    the oracle's count(*) over the registered views — a part file
    //    the walk misses flips the count. Collecting the discovered
    //    (table, path) pairs is bounded file METADATA, the same set
    //    InMemoryFileIndex holds on the driver for planning any scan. ────
    "q_file_listing" -> ((s, dir) => {
      import s.implicits._
      val root = dir.stripSuffix("/")
      val data = CoreOps.fileListing(s, dir)
        .where(col("name").endsWith(".parquet") &&
          !col("name").startsWith(".") && !col("name").startsWith("_"))
        .withColumn("table_name",
          regexp_replace(
            regexp_extract(col("path"),
              java.util.regex.Pattern.quote(root) + "/([^/]+)", 1),
            "\\.parquet$", ""))
      // The row-count leg is DISTRIBUTED METADATA work end to end: the
      // file frame from the distributed walk (CoreOps' frontier
      // expansion) flows straight into a footer scan — each executor
      // task opens its partition's parquet footers and emits
      // (table_name, recordCount) — so NO file path ever resides on the
      // driver (the former spark.read.parquet(allPaths) needed the full
      // path list driver-side, the first thing to fall over at a
      // multi-million-file catalog). A row count is footer metadata —
      // exactly what a count(*) pushdown reads — so per-file cost is one
      // footer fetch, no data pages. Job count stays independent of
      // table count (one mapPartitions + one aggregation over all
      // tables, PlanSpec-pinned), and an empty catalog is naturally an
      // empty aggregate, no zero-path reader to special-case.
      // the session's Hadoop conf (spark.hadoop.*, fs credentials,
      // fs.defaultFS) travels to the tasks as plain key/value pairs —
      // the CoreOps.fileListing discipline; a bare task-side
      // Configuration() would read the wrong/unauthenticated filesystem
      // on any remote catalog (s3a/abfs/hdfs)
      import scala.jdk.CollectionConverters._
      val confKv = s.sparkContext.hadoopConfiguration.iterator().asScala
        .map(e => (e.getKey, e.getValue)).toSeq
      data.select(col("table_name"), col("path")).as[(String, String)]
        .mapPartitions { it =>
          val conf = new org.apache.hadoop.conf.Configuration(false)
          confKv.foreach { case (k, v) => conf.set(k, v) }
          it.map { case (tbl, p) =>
            val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
              org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
                new org.apache.hadoop.fs.Path(p), conf))
            try (tbl, rd.getRecordCount) finally rd.close()
          }
        }.toDF("table_name", "n_rows_file")
        .groupBy("table_name").agg(sum("n_rows_file").as("n_rows"))
        .orderBy("table_name")
    }),

    // ── headline agg: TPC-H Q1-style pricing summary (bench flagship) ───
    "q1_pricing" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast(DecimalType(38, 6))).cast(DoubleType).as("sum_qty"),
          sum(col("l_extendedprice").cast(DecimalType(38, 6))).cast(DoubleType).as("sum_base_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // ── SQL front door: the TPC-H Q3 shape (3-table join, filtered fact,
    //    top-10 revenue) submitted as TEXT through spark.sql over
    //    Tables.registerAll's temp views — the declared proof that the
    //    whole surface is reachable without the DataFrame API. Revenue is
    //    the integer-exact cents×basis-points product (DECIMAL(19,0)²
    //    partials, order-independent), ranked on the exact integer before
    //    the one double finish ─────────────────────────────────────────────
    "q_sql_q3" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT o_orderkey, o_orderpriority,
               CAST(CAST(rev AS DOUBLE) / 10000 AS DOUBLE) AS revenue,
               n_items
        FROM (
          SELECT o.o_orderkey, o.o_orderpriority,
                 sum(CAST(round(l.l_extendedprice * 100) AS DECIMAL(19,0)) *
                     CAST(round((1 - l.l_discount) * 100) AS DECIMAL(19,0)))
                   AS rev,
                 CAST(count(*) AS BIGINT) AS n_items
          FROM customer c
          JOIN orders o ON o.o_custkey = c.c_custkey
          JOIN lineitem l ON l.l_orderkey = o.o_orderkey
          WHERE c.c_mktsegment = 'BUILDING'
            AND o.o_orderdate < TIMESTAMP '1998-01-01'
            AND l.l_shipdate > TIMESTAMP '1998-01-01'
          GROUP BY o.o_orderkey, o.o_orderpriority
        )
        ORDER BY rev DESC, o_orderkey LIMIT 10""")
    }),

    // ── SQL front door #2: the EXTENSION surface reached as pure SQL
    //    text — graft_dot (native codegen dot product) and graft_hilbert
    //    (native codegen curve index) resolved by the SparkSessionExtensions
    //    registration, not the DataFrame call_function path. The dot runs
    //    over round(x*256)-quantized doubles (q_power_iter's proven
    //    quantization): integer-valued products ≤ 2^30 summed 64-deep stay
    //    exact in IEEE double in ANY order, so the BIGINT cast is
    //    partitioning-independent and the oracle can replay it as integer
    //    arithmetic ─────────────────────────────────────────────────────────
    "q_sql_graft_fn" -> ((s, dir) => {
      graft.GraftExtensions.ensure(s)
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT vec_id,
               CAST(graft_dot(
                 transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 256) AS DOUBLE)),
                 transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 256) AS DOUBLE)))
                 AS BIGINT) AS qnorm2,
               graft_hilbert(CAST(vec_id % 64 AS BIGINT),
                             CAST(label % 64 AS BIGINT), 6) AS h
        FROM embeddings
        ORDER BY vec_id""")
    }),

    // ── fact ⋈ broadcast-dim aggregate over the part dimension ──────────
    "q_brand_volume" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(
          sum(col("l_quantity").cast(DecimalType(38, 6))).cast(DoubleType).as("sum_qty"),
          count(lit(1)).as("n_items"))
        .orderBy("p_brand")),

    // ── §2.9 X1: exact dedup by content hash ─────────────────────────────
    "q_dedup_exact" -> ((s, dir) =>
      Dedup.exact(t(s, dir, "documents"), "doc_id", "text").orderBy("h")),

    // ── §2.9 X1i: segment-level dedup with reassembly — drop every
    //    repeated fixed-width token segment's later occurrences corpus-
    //    wide (the paragraph-dedup recipe: boilerplate vanishes, the
    //    unique body survives), reassemble each doc from its surviving
    //    segments in order. One shuffle keyed on segment text. ──────────
    "q_segment_dedup" -> ((s, dir) =>
      Dedup.segmentDedup(t(s, dir, "documents"), "doc_id", "text",
        segTokens = 8)
        .orderBy("doc_id")),

    // ── §2.9 X1b: MinHash + LSH near-dup candidate pairs ─────────────────
    "q_dedup_minhash" -> ((s, dir) =>
      Dedup.minHashLsh(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("da", "db")),

    // ── §2.9 X1c: SimHash fingerprints ───────────────────────────────────
    "q_dedup_simhash" -> ((s, dir) =>
      Dedup.simHash(t(s, dir, "documents"), "doc_id", "text").orderBy("doc_id")),

    // ── §2.9 X1c': SimHash near-dup PAIRS — pigeonhole banding (any pair
    //    within Hamming ≤ 7 agrees on one of 8 bands), bucket join on the
    //    band value, popcount(xor) verification. No all-pairs stage ───────
    "q_simhash_pairs" -> ((s, dir) =>
      Dedup.simHashPairs(t(s, dir, "documents"), "doc_id", "text",
        maxHamming = 7)
        .withColumn("hamming", col("hamming").cast(LongType))
        .orderBy("da", "db")),

    // ── §2.9 X1d: exact n-gram Jaccard near-dup pairs. maxDf caps the
    //    per-shingle join fan-out (df² pairs per hot shingle otherwise) ───
    "q_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccard(t(s, dir, "documents"), "doc_id", "text", 0.3,
        maxDf = 100)
        .orderBy("da", "db")),

    // ── §2.9 X130: exact similarity join via PREFIX FILTERING (SSJoin/
    //    ppjoin) — the lossless scale path for exact Jaccard pairs:
    //    candidates only where two docs share a shingle among their
    //    rarest |S|−⌈t|S|⌉+1 (the prefix pigeonhole), so the boilerplate
    //    df heavy tail that dominates the full self-join never
    //    generates candidates; verification is exact over full sets.
    //    Unlike LSH (X1b) it can never miss a qualifying pair —
    //    spec-pinned EQUAL to ngramJaccard at the same threshold ───────
    "q_prefix_join" -> ((s, dir) =>
      Dedup.prefixFilterJoin(t(s, dir, "documents"), "doc_id", "text",
        0.4, maxDf = 100)
        .orderBy("da", "db")),

    // ── §2.9 X1e: the composed scale pipeline — LSH candidates, exact
    //    Jaccard verification restricted to candidates, df-capped ─────────
    "q_dedup_verified" -> ((s, dir) =>
      Dedup.minHashVerified(t(s, dir, "documents"), "doc_id", "text", 0.3,
        maxDf = 100)
        .orderBy("da", "db")),

    // ── §2.9 X127: semi-supervised label propagation over the verified
    //    near-dup graph — every third doc seeds its source label; three
    //    clamped majority-vote rounds spread provenance across duplicate
    //    communities (the labeling CC can't express: majority resists a
    //    single spurious bridge edge, min-label merging doesn't).
    //    NULL-label (unreached) nodes are filtered on BOTH sides — NULL
    //    sort keys desync the engines ────────────────────────────────────
    "q_label_prop" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.labelPropagate(
        Dedup.minHashVerified(docs, "doc_id", "text", 0.3, maxDf = 100),
        "da", "db",
        docs.where(col("doc_id") % 3 === 0), "doc_id", "source",
        rounds = 3)
        .where(col("label").isNotNull)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // ── §2.9 X1g: dedup clusters — connected components over the LSH
    //    candidate graph (iterative min-label propagation; component id =
    //    min doc_id; singletons keep their own id) ────────────────────────
    "q_dedup_components" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.connectedComponents(
          docs.select(col("doc_id")),
          Dedup.minHashLsh(docs, "doc_id", "text"))
        .orderBy("doc_id")
    }),

    // ── §2.9 X1f: edit-distance-verified near-dups — LSH candidates,
    //    Levenshtein over a bounded prefix (O(pairs) verification) ────────
    "q_edit_distance" -> ((s, dir) =>
      Dedup.editDistancePairs(t(s, dir, "documents"), "doc_id", "text",
        maxDist = 40, prefixLen = 80)
        .orderBy("da", "db")),

    // ── §2.9: quality-threshold corpus cut — keep docs at/above the
    //    corpus median quality (exact percentile threshold, one scalar) ───
    "q_quality_filter" -> ((s, dir) =>
      TextOps.qualityFilter(t(s, dir, "documents"), "doc_id", "text",
        quantile = 0.5)
        .orderBy("doc_id")),

    // ── §2.9: embedding near-dup CLUSTERS — connected components over the
    //    thresholded cosine pair graph (same CC as the text dedup path) ───
    "q_embed_components" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Dedup.connectedComponents(
          emb.select(col("vec_id").as("doc_id")),
          Similarity.nearDupPairs(emb, "vec_id", "embedding", _ < 100,
            threshold = 0.35).select("da", "db"))
        .select(col("doc_id").as("vec_id"), col("component"))
        .orderBy("vec_id")
    }),

    // ── §2.9 X3f: salient terms per document — tf/df keyword extraction,
    //    integer-ranked (tf DESC, df ASC, tok), df-capped stopword cut ────
    "q_top_terms" -> ((s, dir) =>
      TextOps.topTerms(t(s, dir, "documents"), "doc_id", "text",
        k = 3, maxDfFrac = 0.8)
        .orderBy("doc_id", "rank")),

    // ── §2.9 X76: rebalance planner — unique minimal move plan to the
    //    exact balanced spread; windows only on server-sized frames ──────
    "q_rebalance_plan" -> ((s, dir) => {
      val pl = t(s, dir, "orders")
        .select(col("o_orderkey").as("shard_id"),
          pmod(col("o_custkey"), lit(10L)).as("server"))
      graft.ops.CoreOps.rebalancePlan(pl, "shard_id", "server")
        .orderBy("shard_id")
    }),

    // ── §2.9 X75: FIM splits — two md5-drawn character cuts, row-local;
    //    prefix||middle||suffix reconstructs the document ────────────────
    "q_fim_split" -> ((s, dir) =>
      TextOps.fimSplit(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    // ── §2.9 X74: span corruption — deterministic md5 masking, runs
    //    collapse to numbered sentinels, (input, target) example pairs ───
    "q_span_corrupt" -> ((s, dir) =>
      TextOps.spanCorrupt(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    // ── §2.9 X73: contrastive negative sampling — k uniform negatives
    //    per anchor over [1..N]∖{anchor} by exact rank arithmetic ────────
    "q_negatives" -> ((s, dir) =>
      Sampling.negativeSamples(t(s, dir, "documents"), "doc_id", k = 2)
        .orderBy("anchor_id", "slot")),

    // ── §2.9 X72: top-p (nucleus) mass cut — smallest per-source doc
    //    prefix covering 60% of character mass, integer boundary test ────
    "q_top_p_cut" -> ((s, dir) =>
      Sampling.topPMassCut(
        t(s, dir, "documents").select("doc_id", "source", "n_chars"),
        "source", "doc_id", "n_chars", pNum = 3L, pDen = 5L)
        .orderBy(col("source"), col("cum_w"), col("doc_id"))),

    // ── §2.9 X71: int8 quantization — row-local symmetric q=round(v·127/
    //    max|v|), no shuffle; the ANN memory-compression step ────────────
    // `scale` rendered to STRING for the contract: a DECIMAL(38,x)-typed
    // output column is the one schema shape the driver's hash treats as
    // engine-specific (r7: every decimal-output query hash-failed with
    // matching values; q_profile's VARCHAR rendering passes). Spark's
    // decimal→string is toPlainString — byte-identical to DuckDB's
    // VARCHAR cast at any scale (verified incl. 1e-12 edge).
    "q_quantize_int8" -> ((s, dir) =>
      Similarity.quantizeInt8(t(s, dir, "embeddings")
          .where(col("vec_id") < 50), "vec_id", "embedding")
        .withColumn("scale", col("scale").cast("string"))
        .orderBy("vec_id", "dim")),

    // ── §2.9 X70: class centroids — mean-pooling prototypes in LONG
    //    form: order-independent DECIMAL sums + integer counts ───────────
    // `s` rendered to STRING (decimal-output contract — q_quantize_int8
    // note); the exact DECIMAL sum is preserved digit-for-digit.
    "q_class_centroids" -> ((s, dir) =>
      Similarity.classCentroids(t(s, dir, "embeddings"), "embedding",
        "label")
        .withColumn("s", col("s").cast("string"))
        .orderBy("label", "dim")),

    // ── §2.9 X103: Johnson–Lindenstrauss sign projection — 64→8 dims via
    //    an md5-parity ±1 matrix in plan literals; exact dyadic sums, one
    //    pinned √outDim division + 6-dp round ─────────────────────────────
    "q_jl_project" -> ((s, dir) =>
      Similarity.jlProject(t(s, dir, "embeddings"), "vec_id", "embedding",
        inDim = 64, outDim = 8)
        .orderBy("vec_id", "j")),

    // ── §2.9 X104: dominant eigenvector by 6-round integer power
    //    iteration over the quantized Gram — one corpus pass builds the
    //    exact integer G (bounded artifact), the d-dim iteration is pure
    //    integer arithmetic, finish = one pinned Rayleigh division ────────
    "q_power_iter" -> ((s, dir) =>
      Similarity.powerIteration(t(s, dir, "embeddings"), "embedding",
        inDim = 64)
        .orderBy("d")),

    // ── §2.9 X78: embedding Gram matrix — upper-triangle second-moment
    //    DECIMAL sums, row-local pair expansion collapsing into map-side
    //    partials; the PCA/whitening seed artifact ───────────────────────
    // `s` rendered to STRING (decimal-output contract — q_quantize_int8
    // note); plain rendering is engine-identical even at scale 12.
    "q_gram_matrix" -> ((s, dir) =>
      Similarity.gramMatrix(t(s, dir, "embeddings"), "embedding")
        .withColumn("s", col("s").cast("string"))
        .orderBy("i", "j")),

    // ── §2.9 X69: KWIC concordance — row-local indexed-lambda hit
    //    positions (no corpus-sized explode), per-hit context slices ─────
    "q_concordance" -> ((s, dir) =>
      TextOps.concordance(t(s, dir, "documents"), "doc_id", "text",
        term = "spark", window = 3, k = 200)),

    // ── §2.9 X68: corpus encoding — apply the X50 vocabulary: id
    //    sequences (OOV→0) per doc, order restored by in-row struct sort.
    //    Vocab cut to top-50 so OOV is non-trivially exercised ───────────
    "q_encode_tokens" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val vocab = TextOps.buildVocab(d, "doc_id", "text",
        minDf = 2, maxVocab = 50)
      TextOps.encodeTokens(d, vocab, "doc_id", "text")
        .orderBy("doc_id")
    }),

    // ── §2.9 X67: reason-coded quality gate — failure bitmask per doc,
    //    integer cross-multiplied thresholds, map-only ───────────────────
    "q_filter_reasons" -> ((s, dir) =>
      TextOps.filterWithReasons(t(s, dir, "documents"), "doc_id", "text",
        minTokens = 30L, maxChars = 900L)
        .orderBy("doc_id")),

    // ── §2.9 X66: exact dedup with provenance — keeper + capped sorted
    //    removed-id list + distinct-source span, one hash shuffle ────────
    "q_dedup_provenance" -> ((s, dir) =>
      Dedup.exactWithProvenance(t(s, dir, "documents"), "doc_id", "text",
        "source")
        .orderBy("doc_id")),

    // ── §2.9 X65: equi-depth histogram — bucket populations equal ±1 by
    //    construction via the X47 two-phase rank; integer bucket math ────
    "q_equidepth" -> ((s, dir) =>
      Analytics.equiDepth(t(s, dir, "documents"), "n_chars", "doc_id",
        nBuckets = 8)
        .orderBy("bucket")),

    // ── §2.9 X64: join cardinality / skew diagnostic — exact inner-join
    //    size and heaviest key from the two key histograms, never the
    //    join itself ────────────────────────────────────────────────────
    // join_rows/top_rows rendered to STRING (decimal-output contract —
    // q_quantize_int8 note); scale-0 decimals render as plain integers.
    "q_join_estimate" -> ((s, dir) =>
      Analytics.joinCardinality(t(s, dir, "lineitem"), t(s, dir, "orders"),
        "l_orderkey", "o_orderkey")
        .withColumn("join_rows", col("join_rows").cast("string"))
        .withColumn("top_rows", col("top_rows").cast("string"))),

    // ── §2.9 X63: multi-type PII audit — email→SSN→phone→IPv4 staged
    //    scrub, each count taken on the previous stage's redaction. The
    //    corpus carries no PII, so the query constructs deterministic
    //    PII-bearing text from user ids — the oracle replays the same
    //    construction, making every detector's count non-trivially
    //    cross-checked ──────────────────────────────────────────────────
    "q_pii_audit" -> ((s, dir) => {
      val base = t(s, dir, "events").select(col("user_id")).distinct()
        .withColumn("text", concat(
          lit("contact u"), col("user_id"), lit("@ex.com or ("),
          lpad((col("user_id") % 800 + 100).cast("string"), 3, "0"),
          lit(") 555-"),
          lpad((col("user_id") % 10000).cast("string"), 4, "0"),
          when(col("user_id") % 3 === 0, lit(" ssn 123-45-6789"))
            .otherwise(lit("")),
          lit(" ip 10.0.0."), (col("user_id") % 256).cast("string")))
      TextOps.piiAudit(base, "user_id", "text").orderBy("doc_id")
    }),

    // ── §2.9 X62: trailing RANGE-frame rollup — per (user, active day)
    //    trailing-7-day count/value sum; key-distance frame ages gap days
    //    out exactly, DECIMAL sums kill double ulp drift ────────────────
    // trail_v rendered to STRING (decimal-output contract —
    // q_quantize_int8 note); the exact windowed DECIMAL sum survives.
    "q_trailing_7d" -> ((s, dir) =>
      Events.trailingDaily(t(s, dir, "events"), "user_id", "ts", "value")
        .withColumn("trail_v", col("trail_v").cast("string"))
        .orderBy("user_id", "day")),

    // ── §2.9 X61: record linkage — token-block candidates, row-local
    //    shared-token + levenshtein scoring, deterministic best match
    //    per probe (the delta-vs-catalog ER shape) ──────────────────────
    "q_record_linkage" -> ((s, dir) =>
      Dedup.recordLinkage(
        t(s, dir, "part").where(col("p_partkey") < 100),
        t(s, dir, "part"), "p_partkey", "p_name")
        .orderBy("da")),

    // ── §2.9 X60: text normalization — native codegen NFC (graft_nfc)
    //    + control strip + whitespace collapse, map-only ─────────────────
    "q_clean_text" -> ((s, dir) =>
      TextOps.cleanText(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    // ── §2.9 X59: column profiler — one-pass per-column row/non-null/
    //    exact-distinct counts + type-dispatched min/max rendering ───────
    "q_profile" -> ((s, dir) =>
      Analytics.profile(t(s, dir, "lineitem"),
        Seq("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate"))
        .orderBy("col_name")),

    // ── §2.9 X58: sparse tf-weighted cosine pairs — inverted-index
    //    (token-keyed) join, integer tf·idf-surrogate weights, cosine ≥ ½
    //    decided by exact cross-multiplication 4·dot² ≥ ‖a‖²·‖b‖² ───────
    //    maxDfFrac 0.1: the synthetic corpus has a 31-token vocabulary
    //    with most dfs at ~78% of docs — a web-scale Zipf tail this is
    //    not, so the declared query keeps only genuinely rare tokens to
    //    bound Σdf² (the pair-join size) the way the cap is meant to.
    "q_sparse_cosine" -> ((s, dir) =>
      TextOps.sparseCosinePairs(t(s, dir, "documents"), "doc_id", "text",
        maxDfFrac = 0.1)
        .orderBy("da", "db")),

    // ── §2.9 X57: CMS heavy hitters — exact top-k token counts (the
    //    oracle-checked columns); the count-min-sketch cross-check
    //    column cms_ok stays OUT of the hashed contract (the CMS bound
    //    holds with probability ≥ confidence per query, not certainly —
    //    a seed/eps/hash change could flip a row) and is asserted in
    //    TextOpsSpec instead ─────────────────────────────────────────────
    "q_heavy_hitters" -> ((s, dir) =>
      TextOps.heavyHitters(t(s, dir, "documents"), "doc_id", "text",
        k = 25)
        .select("token", "n")
        .orderBy(col("n").desc, col("token"))),

    // ── §2.9: corpus-rarity signal — per-doc distinct-vocabulary df
    //    facts (count, rarest token's df, total df mass); the integer-
    //    exact core of frequency-based quality filtering, one distinct
    //    (doc, token) frame reused for df agg and join-back ──────────────
    "q_token_rarity" -> ((s, dir) =>
      TextOps.tokenRarity(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    // ── §2.9 X77: cross-source vocabulary overlap — integer Jaccard
    //    pieces per source pair, one token-keyed distinct frame reused
    //    for both join sides; the mixture-design diagnostic ──────────────
    "q_vocab_overlap" -> ((s, dir) =>
      TextOps.sourceVocabOverlap(t(s, dir, "documents"), "source", "text")
        .orderBy("source_a", "source_b")),

    // ── §2.9: deterministic 10% sample — md5-bucket filter, reproducible
    //    across reruns/engines/layouts (no rand()) ────────────────────────
    "q_hash_sample" -> ((s, dir) =>
      Sampling.hashSample(t(s, dir, "documents"), "doc_id", 10)
        .select("doc_id", "lang")
        .orderBy("doc_id")),

    // ── §2.9: fixed-budget weighted sample — exactly n rows, inclusion
    //    probability ∝ weight (sequential Poisson order sampling); the
    //    priority is u/w with u an exactly-representable 52-bit md5
    //    integer, so the DuckDB oracle replays the ranking bit-for-bit ───
    "q_weighted_sample" -> ((s, dir) =>
      Sampling.weightedSample(t(s, dir, "documents"), "doc_id",
          col("n_chars"), 100)
        .select(col("doc_id"), col("lang"), col("n_chars").cast(LongType))
        .orderBy("doc_id")),

    // ── §2.9: √-temperature mixture sample — per-stratum budgets ∝
    //    sqrt(count) via integer-exact largest-remainder apportionment
    //    (sqrt is IEEE-exact; everything after is integer), the classic
    //    T=2 multilingual rebalancing schedule ──────────────────────────
    "q_sqrt_mixture" -> ((s, dir) =>
      Sampling.sqrtMixtureSample(t(s, dir, "documents"), "lang", "doc_id", 100)
        .select("doc_id", "lang")
        .orderBy("doc_id")),

    // ── §2.9: leakage-free train/valid/test split — assignment hashes the
    //    GROUP key (source), so all docs of a source share a split ────────
    "q_split_assign" -> ((s, dir) =>
      Sampling.splitAssign(t(s, dir, "documents"), "source",
        Seq(("train", 80), ("valid", 10), ("test", 10)))
        .select("doc_id", "source", "split")
        .orderBy("doc_id")),

    // ── §2.9 X118: pairwise source-distribution L1 distance — the
    //    frequency-weighted drift matrix mixture design runs before
    //    choosing sampling weights (X77 compares WHICH tokens exist;
    //    this compares HOW MASS spreads over them). Cross-multiplied
    //    DECIMAL(38,0) numerator (exact, divisions only in the one
    //    pinned double finish); numerator emitted as STRING ───────────────
    "q_source_drift" -> ((s, dir) =>
      TextOps.distributionL1(t(s, dir, "documents"), "source", "text")
        .orderBy("src_a", "src_b")),

    // ── §2.9 X116: temporal split with an EMBARGO gap (purged time-based
    //    split): train < boundary, test ≥ boundary+embargo, gap rows
    //    assigned to neither (so every entity's sides are separated by
    //    MORE than the embargo); per-row audit flags entities active in
    //    train AND test AND the discarded gap — the trajectories whose
    //    trailing-window features still reach across the boundary ───────
    "q_temporal_split" -> ((s, dir) =>
      Sampling.temporalSplit(t(s, dir, "events"), "event_id", "user_id",
        "ts", "2024-01-22 00:00:00", embargoSeconds = 172800L)
        .orderBy("id")),

    // ── §2.9: domain capping — at most 10 docs per source, deterministic
    //    md5-ranked keepers, WindowGroupLimit partial top-k per partition ──
    "q_cap_per_group" -> ((s, dir) =>
      Sampling.capPerGroup(t(s, dir, "documents"), "source", "doc_id", 10)
        .select("doc_id", "source")
        .orderBy("doc_id")),

    // ── §2.9: mixture reweighting by repetition — per-source repeat
    //    factors become deterministic epoch counts (floor + md5-bucket
    //    fractional part), map-side generator, no shuffle ─────────────────
    "q_epoch_repeat" -> ((s, dir) =>
      Sampling.epochRepeat(t(s, dir, "documents"), "doc_id",
          when(col("source").isin("src0", "src1"), lit(2.5))
            .when(col("source").isin("src2", "src3"), lit(0.4))
            .otherwise(lit(1.0)))
        .select(col("doc_id"), col("source"), col("epoch").cast(LongType))
        .orderBy("doc_id", "epoch")),

    // ── §2.9: split-leakage audit — MinHash-verified near-dup pairs whose
    //    members landed in different train/valid/test splits (the leakage
    //    source-grouped assignment is supposed to prevent) ────────────────
    "q_split_leakage" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = Dedup.minHashVerified(docs, "doc_id", "text", 0.3,
        maxDf = 100)
      val assign = Sampling.splitAssign(docs, "source",
        Seq(("train", 80), ("valid", 10), ("test", 10)))
      Sampling.splitLeakage(pairs, "da", "db", assign, "doc_id", "split")
        .orderBy("a", "b")
    }),

    // ── §2.9 X105: leakage-safe split — md5 bucket drawn from the CC
    //    component label, so cross-split dup pairs are zero by
    //    construction (the fix for what q_split_leakage measures) ─────────
    "q_leak_safe_split" -> ((s, dir) =>
      Dedup.leakSafeSplit(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    // ── §2.9 X106: cross-source duplication matrix — verified near-dup
    //    pairs rolled up per unordered source pair; diagonal = within-
    //    source dup pressure, off-diagonal = contamination flow ───────────
    "q_source_overlap" -> ((s, dir) =>
      Dedup.crossSourceDup(t(s, dir, "documents"), "doc_id", "text",
        "source")
        .orderBy("source_a", "source_b")),

    // ── §2.9 X1h: the COMPLETE dedup pipeline — exact dedup → LSH-verified
    //    near-dup pairs among survivors → connected components → canonical
    //    doc per input document (keep rows where doc_id == canonical) ─────
    "q_dedup_pipeline" -> ((s, dir) =>
      Dedup.dedupPipeline(t(s, dir, "documents"), "doc_id", "text",
        threshold = 0.3, maxDf = 100)
        .orderBy("doc_id")),

    // ── §2.9 X2: brute-force cosine top-k ────────────────────────────────
    "q_cosine_topk" -> ((s, dir) =>
      Similarity.bruteForceTopK(t(s, dir, "embeddings"), "vec_id", "embedding",
        _ < 10, k = 5)
        .withColumn("rank", col("rank").cast(LongType))
        .orderBy("pid", "rank")),

    // ── §2.9 X2b: embedding-cosine near-dup pairs ────────────────────────
    "q_embed_neardup" -> ((s, dir) =>
      Similarity.nearDupPairs(t(s, dir, "embeddings"), "vec_id", "embedding",
        _ < 100, threshold = 0.35)
        .orderBy("da", "db")),

    // ── §2.9 X113: HYBRID lexical+vector retrieval — per probe doc, a
    //    distinct-token-overlap candidate list (integer-scored inverted-
    //    index probe) and an exact-cosine candidate list are combined by
    //    reciprocal-rank fusion (score = Σ 1/(60+rank)); RRF consumes
    //    only ranks, so the fusion is engine-exact and the vector leg
    //    swaps 1:1 for the persisted partition-pruned ANN index at scale ─
    "q_hybrid_search" -> ((s, dir) =>
      Similarity.hybridTopK(t(s, dir, "documents"), "doc_id", "text",
        t(s, dir, "embeddings"), "vec_id", "embedding",
        _ < 10, k = 10)
        .orderBy("pid", "rank")),

    // ── §2.9 X114: k-NN classification — probe vectors labeled by
    //    majority vote of their k nearest labeled neighbors (the
    //    embedding-space quality/topic classifier); probes held out of
    //    the train side, so the artifact doubles as leave-out eval ─────
    "q_knn_classify" -> ((s, dir) =>
      Similarity.knnClassify(t(s, dir, "embeddings"), "vec_id", "embedding",
        "label", _ < 50, k = 7)
        .orderBy("pid")),

    // ── §2.9 X134: kNN-distance outlier score — each probe's k-th and
    //    mean cosine similarity to its nearest corpus neighbors: the
    //    embedding-space anomaly gate (low kth_sim = sits in no
    //    neighborhood). Integer-exact 1e-6-unit sum + one pinned
    //    division; the neighbor leg swaps 1:1 for the persisted IVF
    //    probe at 100 TB (knnOutlierIndexed, spec-pinned) ──────────────
    "q_knn_outlier" -> ((s, dir) =>
      Similarity.knnOutlier(t(s, dir, "embeddings"), "vec_id", "embedding",
        _ < 60, k = 10)
        .orderBy("pid")),

    // ── §2.9 X136: triplet mining — per labeled anchor, the best
    //    same-label candidate (positive) and the hardest different-label
    //    candidate (negative) within its cosine top-20; margin ready
    //    for a triplet loss. Candidate leg swaps 1:1 for the persisted
    //    IVF probe (tripletMineIndexed, spec-pinned) ────────────────────
    "q_triplet_mine" -> ((s, dir) =>
      Similarity.tripletMine(t(s, dir, "embeddings"), "vec_id",
        "embedding", "label", _ < 50, k = 20)
        .orderBy("pid")),

    // ── §2.9 X137: water-filling budget allocation — split a 310-row
    //    budget across sources as equally as availability allows
    //    (min(avail, level), integer-exact largest-remainder): the
    //    absolute-budget mixture step between X101's weights and
    //    X24b's temperature sampling ────────────────────────────────────
    "q_water_fill" -> ((s, dir) =>
      Sampling.waterFill(t(s, dir, "documents"), "source", budget = 310L)
        .orderBy("group")),

    // ── §2.9 X115: mutual k-NN pairs — reciprocal nearest neighbors
    //    within a bounded subset: the high-precision edge set for
    //    near-dup verification and kNN-graph clustering ────────────────
    "q_mutual_knn" -> ((s, dir) =>
      Similarity.mutualKnnPairs(t(s, dir, "embeddings"), "vec_id",
        "embedding", _ < 120, k = 5)
        .orderBy("da", "db")),

    // ── §2.9 X125: margin-based bitext mining (Artetxe & Schwenk 2019)
    //    — each source-side embedding's best target-side match by the
    //    RATIO margin (cosine normalized by both endpoints' average-kNN
    //    similarity), kept when margin > 1: the LASER/CCMatrix parallel-
    //    corpus criterion. Sides = label parity within a caller-bounded
    //    subset; at 100 TB the top-k legs swap 1:1 for per-side persisted
    //    IVF probes (marginMineIndexed, spec-pinned equal) ──────────────
    "q_bitext_mine" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings").where(col("vec_id") < 240)
      Similarity.marginMine(
        emb.where(pmod(col("label"), lit(2)) === 0),
        emb.where(pmod(col("label"), lit(2)) === 1),
        "vec_id", "embedding", k = 4, threshold = 1.0)
        .orderBy("src_id")
    }),

    // ── §2.9 X126: MMR-diversified retrieval (Carbonell & Goldstein
    //    1998) — from each probe's top-8 relevance candidates, greedily
    //    pick 4 maximizing λ·rel − (1−λ)·max-sim-to-selected (λ = 1/2):
    //    the redundancy-removal step in RAG context assembly; plain
    //    top-k returns k paraphrases of one passage. Integer micro-unit
    //    scoring, k unrolled argmax rounds, everything post-leg is
    //    |probes|·n² rows; candidate leg swaps for the persisted IVF
    //    probe at scale (mmrDiversifyIndexed, spec-pinned equal) ───────
    "q_mmr_diversify" -> ((s, dir) =>
      Similarity.mmrDiversify(t(s, dir, "embeddings"), "vec_id",
        "embedding", _ < 10, n = 8, k = 4)
        .orderBy("pid", "pick")),

    // ── §2.9 X128/X128b: ranking-quality eval — the int8-quantized
    //    search tier (exact integer dots over max-abs codes → fully
    //    oracle-replayable, unlike a float ANN tier) measured against
    //    the exact cosine ranking with MRR + binary-relevance nDCG@5
    //    (discounts = the fixed 1e-6-unit literal table; no runtime
    //    transcendentals). recallArtifact answers "is the true top-1
    //    in the list"; this answers WHERE it landed and how much gold
    //    mass ranks high — what the 8-bit trade actually costs ─────────
    "q_rank_metrics" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.rankMetrics(
        Similarity.int8TopK(emb, "vec_id", "embedding", _ < 10, k = 5),
        Similarity.bruteForceTopK(emb, "vec_id", "embedding", _ < 10,
          k = 5),
        k = 5)
        .orderBy("pid")
    }),

    // ── §2.9 X2g: filtered vector search — cosine top-k over a corpus
    //    confined by a metadata predicate (pushed into the scan, ranked
    //    after — k results guaranteed whenever ≥k rows pass; post-
    //    filtering an unfiltered top-k under-returns). Index twin
    //    ivfIndexProbeFiltered spec-pinned equal at nprobe=nCentroids ──
    "q_filtered_search" -> ((s, dir) =>
      Similarity.filteredTopK(t(s, dir, "embeddings"), "vec_id",
        "embedding", "label", _ < 4, _ < 10, k = 5)
        .orderBy("pid", "rank")),

    // ── §2.9 X56: semantic dedup (SemDeDup) — cluster-confined greedy
    //    prune. The cluster assignment is engine-side, so the declared
    //    artifact pairs the engine's removal against the FLAT greedy rule
    //    (max lower-id cosine ≥ τ — exactly SQL-replayable): removed_flat
    //    is a real data column the oracle recomputes, and subset_ok pins
    //    cluster-confined removal ⊆ flat removal (a cluster-mate witness
    //    is also a global witness). COST NOTE: the flat reference runs on
    //    a DETERMINISTIC 5 % md5-sampled probe subset (the hashSample
    //    discipline — same sample in any engine, on any layout), so the
    //    audit costs O(sample·n) dot products, not n²; the all-pairs form
    //    was 423 s at sf1 (42 % of the whole dump) for the same evidence.
    //    The production operator is semanticDedup's cluster-confined
    //    prune; this is its sampled brute-force differential, exactly the
    //    "sampled sub-corpus audit" a 100 TB deploy would schedule. ──────
    "q_semdedup" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val probe = (id: Column) => Sampling.hashBucket(id, 100) < 5
      val sd = Similarity.semanticDedup(emb, "vec_id", "embedding",
        threshold = 0.35, nCentroids = 16)
      val flat = Similarity.flatRemovalFlags(emb, "vec_id", "embedding",
        probe, threshold = 0.35)
      sd.join(flat, Seq("id"))
        .select(col("id").as("vec_id"), col("removed_flat"),
          (!col("removed") || col("removed_flat")).as("subset_ok"))
        .orderBy("vec_id")
    }),

    // ── §2.9 X2c: IVF approximate top-k (scale path). The ANN result set
    //    itself is engine-side (bucketing isn't oracle-expressible), so the
    //    declared artifact is deterministic recall accounting: for each
    //    probe, did the index recover at least one of the true top-k
    //    (computed exactly in the same query)? The oracle expects TRUE per
    //    probe. nprobe is high relative to the tiny fixture corpus (the
    //    floor must hold at 500 vectors); at scale nCentroids grows ~√n
    //    and nprobe stays a small constant fraction. ──────────────────────
    "q_ann_ivf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.recallArtifact(
          Similarity.ivfTopK(emb, "vec_id", "embedding", _ < 10, k = 5,
            nprobe = 16),
          Similarity.bruteForceTopK(emb, "vec_id", "embedding", _ < 10, k = 5),
          k = 5)
        .orderBy("pid")
    }),

    // ── §2.9 X110: PERSISTED IVF index — build once to parquet (bounded
    //    centroid model + hive-partitioned inverted lists), then probe the
    //    LOADED index with static partition pruning confining the scan to
    //    the probed buckets (PlanSpec pins the pruned partition count).
    //    Ranking math = ivfTopK, so the full-recall contract carries over ─
    "q_ann_persist" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val path = scratch("graft_ivfidx_")
      Similarity.ivfIndexBuild(emb, "vec_id", "embedding", path,
        nCentroids = 64, lloydIters = 1)
      Similarity.recallArtifact(
          Similarity.ivfIndexProbe(emb.where(col("vec_id") < 10),
            "vec_id", "embedding", path, k = 5, nprobe = 16),
          Similarity.bruteForceTopK(emb, "vec_id", "embedding", _ < 10, k = 5),
          k = 5)
        .orderBy("pid")
    }),

    // ── §2.9 X110c: persisted IVF+PQ index — the COMPRESSED on-disk
    //    index (packed PQ codes in hive-partitioned lists, ~16-64×
    //    smaller than the raw-vector lists), probed partition-pruned
    //    with an ADC scan + bounded exact re-rank against the source
    //    table; same versioned-pointer publish discipline as X110.
    //    Probe-completeness artifact (PQ recall is data-dependent →
    //    spec/gate floors, the q_ann_pq discipline) ────────────────────
    "q_ann_pq_persist" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val path = scratch("graft_pqidx_")
      Similarity.ivfpqIndexBuild(emb, "vec_id", "embedding", path,
        nCentroids = 64, m = 8, kCodes = 64)
      Similarity.probeCoverage(
          Similarity.ivfpqIndexProbe(emb.where(col("vec_id") < 10),
            "vec_id", "embedding", emb, path, k = 5, nprobe = 16,
            refine = Similarity.scaledRefine(emb.count())),
          Similarity.bruteForceTopK(emb, "vec_id", "embedding", _ < 10, k = 5),
          k = 5)
        .orderBy("pid")
    }),

    // ── §2.9 X111: INCREMENTAL index maintenance — build the persisted
    //    index on half the corpus, APPEND the other half against the
    //    frozen model (no re-fit, no rewrite of existing lists), then
    //    probe: neighbors from BOTH halves must surface. The ingest-batch
    //    lifecycle of a 100 TB embedding index between scheduled rebuilds ─
    "q_ann_append" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val path = scratch("graft_ivfapp_")
      Similarity.ivfIndexBuild(emb.where(col("vec_id") % 2 === 0),
        "vec_id", "embedding", path, nCentroids = 64, lloydIters = 1)
      Similarity.ivfIndexAppend(emb.where(col("vec_id") % 2 === 1),
        "vec_id", "embedding", path)
      Similarity.recallArtifact(
          Similarity.ivfIndexProbe(emb.where(col("vec_id") < 10),
            "vec_id", "embedding", path, k = 5, nprobe = 16),
          Similarity.bruteForceTopK(emb, "vec_id", "embedding", _ < 10, k = 5),
          k = 5)
        .orderBy("pid")
    }),

    // ── §2.9 X111b: INDEX COMPACTION — the "scheduled rebuild" step the
    //    append/streaming lifecycle names: two append batches leave small
    //    files in every touched bucket directory; ivfIndexCompact merges
    //    each bucket's files (hash repartition on the partition column +
    //    atomic directory swap) WITHOUT re-fitting the model. The
    //    declared artifact pins both halves of the contract per probe:
    //    recall is intact (found_true_neighbor) AND the probe result is
    //    BIT-IDENTICAL before vs after (same_after_compact — rank/nid/sim
    //    row-for-row). The before-probe is collected (bounded: |probes|·k
    //    rows) so lazy evaluation can't silently re-read the compacted
    //    index; the require pins that file count actually dropped. ──────
    "q_ann_compact" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val path = scratch("graft_ivfcmp_")
      // 32 buckets (not the persist/append queries' 64): compaction's
      // contract is file-count + probe-identity, which holds at any
      // width, and halving the directory tree halves the build/append/
      // rewrite I/O of what is by construction the most write-heavy
      // declared query; nprobe=16 of 32 covers MORE of the corpus than
      // the sibling queries' 16 of 64, so the recall half only gains
      Similarity.ivfIndexBuild(emb.where(col("vec_id") % 2 === 0),
        "vec_id", "embedding", path, nCentroids = 32, lloydIters = 1)
      Seq(1L, 3L).foreach { r =>
        Similarity.ivfIndexAppend(emb.where(col("vec_id") % 4 === r),
          "vec_id", "embedding", path)
      }
      def probe() = Similarity.ivfIndexProbe(emb.where(col("vec_id") < 10),
        "vec_id", "embedding", path, k = 5, nprobe = 16)
      val beforeDf = probe()
      val before = s.createDataFrame(
        java.util.Arrays.asList(beforeDf.collect(): _*), beforeDf.schema)
      val (f0, f1) = Similarity.ivfIndexCompact(s, path)
      require(f1 < f0, s"compact must reduce index files ($f0 -> $f1)")
      val after = probe()
      val bc = before.groupBy("pid").agg(count(lit(1)).as("nb"))
      val ac = after.groupBy("pid").agg(count(lit(1)).as("na"))
      val mc = before.join(after, Seq("pid", "rank", "nid", "sim"),
          "left_semi")
        .groupBy("pid").agg(count(lit(1)).as("nm"))
      val same = bc.join(ac, Seq("pid")).join(mc, Seq("pid"), "left")
        .select(col("pid"),
          (col("nb") === col("na") &&
            coalesce(col("nm"), lit(0L)) === col("nb"))
            .as("same_after_compact"))
      Similarity.recallArtifact(after,
          Similarity.bruteForceTopK(emb, "vec_id", "embedding", _ < 10,
            k = 5), k = 5)
        .join(same, Seq("pid"))
        .select(col("pid"), col("k"), col("found_true_neighbor"),
          col("same_after_compact"))
        .orderBy("pid")
    }),

    // ── §2.9 X111c: INDEX DELETE — the takedown step that closes the
    //    lifecycle: build on evens, append odds, then RETRACT 20% of the
    //    corpus (vec_id % 10 < 2) from the persisted lists BY ID, touching
    //    only the buckets that held them. The declared artifact pins the
    //    whole contract per probe: no retracted id remains in the index
    //    (require on an engine-side count), no retracted id surfaces as a
    //    neighbor (no_deleted_neighbor), and the probe still finds a true
    //    neighbor of the SURVIVING corpus (found_true_neighbor vs brute
    //    force over survivors) ───────────────────────────────────────────
    "q_ann_delete" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val path = scratch("graft_ivfdel_")
      Similarity.ivfIndexBuild(emb.where(col("vec_id") % 2 === 0),
        "vec_id", "embedding", path, nCentroids = 32, lloydIters = 1)
      Similarity.ivfIndexAppend(emb.where(col("vec_id") % 2 === 1),
        "vec_id", "embedding", path)
      Similarity.ivfIndexDeleteIdempotent(
        emb.where(col("vec_id") % 10 < 2).select("vec_id"),
        "vec_id", path, "d1")
      val leftover = s.read.parquet(Similarity.ivfIndexDataDir(s, path))
        .where(col("nid") % 10 < 2).count()
      require(leftover == 0,
        s"retracted ids must leave the index ($leftover rows remain)")
      val ann = Similarity.ivfIndexProbe(
        emb.where(col("vec_id") < 10 && col("vec_id") % 10 >= 2),
        "vec_id", "embedding", path, k = 5, nprobe = 16)
      val noDel = ann.groupBy("pid")
        .agg((sum(when(col("nid") % 10 < 2, 1).otherwise(0)) === 0)
          .as("no_deleted_neighbor"))
      Similarity.recallArtifact(ann,
          Similarity.bruteForceTopK(emb.where(col("vec_id") % 10 >= 2),
            "vec_id", "embedding", _ < 10, k = 5), k = 5)
        .join(noDel, Seq("pid"))
        .select(col("pid"), col("k"), col("found_true_neighbor"),
          col("no_deleted_neighbor"))
        .orderBy("pid")
    }),

    // ── §2.9 X110b: STAGED ATOMIC REBUILD — the "scheduled rebuild" the
    //    frozen-model lifecycle defers to: after an initial build plus an
    //    ingest batch, the model is RE-FIT over the full corpus at a new
    //    width, staged as sibling `centroids.v<N>`/`index.v<N>` versions,
    //    and published with the one atomic pointer flip (old index stays
    //    probeable through any pre-flip crash — SignLshSpec pins the
    //    crash window). The engine require()s the lifecycle facts a SQL
    //    oracle can't see: a NEW version is current, the predecessor pair
    //    survives the vacuum (in-flight-reader retention), the replay
    //    markers are reset, and the rebuilt lists hold the corpus exactly
    //    once. nprobe = nCentroids on the probe: coverage is total, so
    //    the top-k is exact cosine and found_true_neighbor is a
    //    deterministic contract, not a calibration (the pruned-probe
    //    contract is q_ann_persist's; this query pins the PUBLISH) ───────
    "q_ann_rebuild" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val path = scratch("graft_ivfreb_")
      Similarity.ivfIndexBuild(emb.where(col("vec_id") % 2 === 0),
        "vec_id", "embedding", path, nCentroids = 32, lloydIters = 1)
      Similarity.ivfIndexAppendIdempotent(emb.where(col("vec_id") % 2 === 1),
        "vec_id", "embedding", path, "ingest1")
      val listsBefore = Similarity.ivfIndexDataDir(s, path)
      val centBefore = Similarity.ivfCentroidsDir(s, path)
      Similarity.ivfIndexBuild(emb, "vec_id", "embedding", path,
        nCentroids = 16, lloydIters = 1)
      val listsAfter = Similarity.ivfIndexDataDir(s, path)
      require(listsAfter != listsBefore,
        "rebuild must publish a fresh lists version")
      require(Similarity.ivfCentroidsDir(s, path) != centBefore,
        "rebuild must publish a fresh model version")
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      require(fs.exists(new org.apache.hadoop.fs.Path(listsBefore)) &&
          fs.exists(new org.apache.hadoop.fs.Path(centBefore)),
        "the predecessor pair must survive the rebuild's vacuum")
      require(!fs.exists(new org.apache.hadoop.fs.Path(s"$path/tokens")),
        "a published rebuild resets the replay-token namespace")
      val nIdx = s.read.parquet(listsAfter).count()
      require(nIdx == emb.count(),
        s"rebuilt lists must hold the corpus exactly once ($nIdx)")
      Similarity.recallArtifact(
          Similarity.ivfIndexProbe(emb.where(col("vec_id") < 10),
            "vec_id", "embedding", path, k = 5, nprobe = 16),
          Similarity.bruteForceTopK(emb, "vec_id", "embedding", _ < 10, k = 5),
          k = 5)
        .orderBy("pid")
    }),

    // ── §2.8 + §2.9 X112: STREAMING index ingest — the embedding stream
    //    appends to the persisted index per micro-batch against the frozen
    //    model (foreachBatch → ivfIndexAppend); after the stream drains,
    //    probing across built + streamed halves keeps full recall. The
    //    continuous-ANN-ingest lifecycle between scheduled rebuilds ───────
    "q_stream_index" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val path = scratch("graft_ivfstr_")
      Similarity.ivfIndexBuild(emb.where(col("vec_id") % 2 === 0),
        "vec_id", "embedding", path, nCentroids = 64, lloydIters = 1)
      val q = graft.streaming.StreamingIndexIngest.start(
        Tables.loadStream(s, dir, "embeddings")
          .where(col("vec_id") % 2 === 1),
        "vec_id", "embedding", path,
        scratch("graft_ckpt_idx_"))
      q.awaitTermination()
      Similarity.recallArtifact(
          Similarity.ivfIndexProbe(emb.where(col("vec_id") < 10),
            "vec_id", "embedding", path, k = 5, nprobe = 16),
          Similarity.bruteForceTopK(emb, "vec_id", "embedding", _ < 10, k = 5),
          k = 5)
        .orderBy("pid")
    }),

    // ── §2.9 X2d: sign-LSH bucketed ANN — same deterministic recall
    //    artifact as q_ann_ivf (OR-amplified 8×4-bit signatures) ──────────
    "q_ann_lsh" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.recallArtifact(
          Similarity.signLshTopK(emb, "vec_id", "embedding", _ < 10,
            k = 5, nBits = 4, nTables = 8, dim = 64),
          Similarity.bruteForceTopK(emb, "vec_id", "embedding", _ < 10, k = 5),
          k = 5)
        .orderBy("pid")
    }),

    // ── §2.9 X2e: product-quantization ANN — compressed-code ADC scan +
    //    exact re-rank, same deterministic recall artifact ────────────────
    "q_ann_pq" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.probeCoverage(
          // 6-bit codebooks (kCodes=64) + refine=16: the r9 AnnRecall
          // calibration measured recall@5 = 1.0/0.90/0.80 at
          // sf0.001/0.01/0.1 vs 0.76/0.58/0.28 for the old
          // (kCodes=16, refine=8) — recall is scale-dependent and the old
          // defaults sank below the floor by sf0.1. 64 beats 256 as the
          // default: recall within 0.1 of the 8-bit fit at every scale,
          // 4× less fit/encode work, and 8×6=48 bits still PACK into the
          // one-long code column (the shift-and-mask codegen ADC path).
          // refine is CORPUS-ADAPTIVE (scaledRefine): fixed refine=16
          // measured 0.38 recall at sf1's 50k vectors — the re-ranked
          // fraction must track corpus size (≤sf0.1 fixtures unchanged,
          // floor 16; the probe-coverage hash is refine-independent)
          Similarity.pqTopK(emb, "vec_id", "embedding", _ < 10, k = 5,
            m = 8, kCodes = 64,
            refine = Similarity.scaledRefine(emb.count()), dim = 64),
          Similarity.bruteForceTopK(emb, "vec_id", "embedding", _ < 10, k = 5),
          k = 5)
        .orderBy("pid")
    }),

    // ── §2.9 X2f: IVF+PQ composed ANN — the corpus-scale tier: ADC scan
    //    and ranking window confined to each probe's nprobe IVF buckets
    //    over the compressed code table; same recall artifact ─────────────
    "q_ann_ivfpq" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.probeCoverage(
          // nprobe=32 + 6-bit codebooks + refine=16: measured recall@5 =
          // 0.88/0.88/0.74 at sf0.001/0.01/0.1 (old np=16/kCodes=16/r=8
          // defaults: 0.70→0.48 by sf0.1); kCodes=64 keeps the packed
          // codegen ADC — see AnnRecall + the bench loop's per-round
          // recall gate. refine corpus-adaptive like q_ann_pq (fixture
          // configs ≤sf0.1 bit-unchanged under the floor)
          Similarity.ivfpqTopK(emb, "vec_id", "embedding", _ < 10, k = 5,
            nprobe = 32, m = 8, kCodes = 64,
            refine = Similarity.scaledRefine(emb.count()), dim = 64),
          Similarity.bruteForceTopK(emb, "vec_id", "embedding", _ < 10, k = 5),
          k = 5)
        .orderBy("pid")
    }),

    // ── §2.9 X3: per-language corpus stats ──────────────────────────────
    "q_text_stats" -> ((s, dir) =>
      TextOps.textStats(t(s, dir, "documents"), "lang", "n_chars")
        .orderBy("lang")),

    // ── §2.9: language-ID heuristic ──────────────────────────────────────
    "q_langid" -> ((s, dir) =>
      TextOps.langId(t(s, dir, "documents"), "doc_id", "text").orderBy("doc_id")),

    // ── §2.9: quality scoring ────────────────────────────────────────────
    "q_quality_score" -> ((s, dir) =>
      TextOps.qualityScore(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    // ── §2.9: token counting ─────────────────────────────────────────────
    "q_token_count" -> ((s, dir) =>
      TextOps.tokenCount(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    // ── §2.9: document fingerprinting ────────────────────────────────────
    "q_fingerprint" -> ((s, dir) =>
      TextOps.fingerprint(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    // ── §2.9 X4: tumbling-window event aggregation ──────────────────────
    "q_event_tumbling" -> ((s, dir) =>
      Events.tumbling(t(s, dir, "events")).orderBy("hour_ts", "event_type")),

    // ── §2.9 X5: gap-based sessionization ────────────────────────────────
    "q_sessionize" -> ((s, dir) =>
      Events.sessionize(t(s, dir, "events")).orderBy("user_id", "session_seq")),

    // ── §2.9 X6: top-k per group (ranking window) ────────────────────────
    "q_topk_per_group" -> ((s, dir) =>
      Events.topKPerGroup(t(s, dir, "orders"), "o_orderpriority",
        "o_totalprice", "o_orderkey", 3)
        .select(col("o_orderpriority"), col("rank").cast(LongType).as("rank"),
          col("o_orderkey"), col("o_totalprice"))
        .orderBy("o_orderpriority", "rank")),

    // ── §2.9 X7: approx distinct next to exact. The sketch value itself
    //    has no cross-engine oracle; the emitted artifact is deterministic
    //    and DuckDB-checkable: the exact count plus a boolean asserting the
    //    HLL++ estimate landed within 5% of it (the oracle expects TRUE) ──
    "q_approx_distinct" -> ((s, dir) =>
      Events.approxDistinct(t(s, dir, "events"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("approx_users") - col("exact_users")) <=
            col("exact_users") * 0.05).as("within_5pct"))
        .orderBy("event_type")),

    // ── §2.9: multimodal feature extraction over REAL decoded units —
    //    each doc routed to its dispatch format's real codec (WAV/BMP/
    //    PNG/JPEG/GIF), features (unit count, first unit, mod-997
    //    checksum) computed from the DECODED stream, not the raw payload.
    //    Empty docs are filtered (no container to synthesize — same rule
    //    as q_media_frames) and the ASCII fixture contract (byte i ==
    //    ascii(char i), the oracle's spelling) is a CHECKED invariant:
    //    a non-ASCII doc would make text bytes ≠ per-char ascii() and is
    //    rejected loudly rather than silently hash-diverging ──────────────
    "q_media_features" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      Media.decodeFeatures(
          t(s, dir, "documents")
            .where(length(col("text")) > 0)
            // assert_true yields NULL on success (filter passes) and
            // THROWS on a non-ASCII doc; living inside the Filter keeps
            // it from being pruned the way a dropped column would be
            .where(assert_true(
              length(col("text")) === octet_length(col("text")),
              lit("q_media_features requires ASCII text (oracle contract)"))
              .isNull),
          "doc_id", "text")
        .orderBy("doc_id")
    }),

    // ── §2.9: multimodal frame sampling through the REAL ISO-BMFF demux —
    //    frames muxed into a genuine MP4, keyframe PAYLOADS read back out
    //    of mdat via the stsz/stsc/stco/stss sample tables. Frames are
    //    emitted hex-encoded: raw bytes aren't sortable/hashable by the
    //    pandas oracle harness — hex strings are, on both engines ─────────
    "q_media_frames" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      Media.mp4FramePayloads(t(s, dir, "documents"), "doc_id", "text",
          frameBytes = 64, stride = 2)
        .select(col("doc_id"), col("frame_no"),
          lower(hex(col("frame"))).as("frame"))
        .orderBy("doc_id", "frame_no")
    }),

    // ── §2.9: pixel-true VIDEO decode — MJPEG-in-MP4: real JPEG frames
    //    muxed into a real ISO-BMFF container, keyframes demuxed via the
    //    sample tables, pixels decoded per keyframe by the real JDK codec,
    //    verified by geometry + the bounded-reconstruction-error verdict
    //    (the q_media_jpeg contract, now per VIDEO keyframe) ──────────────
    "q_media_video" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      Media.mjpegVideoDecode(t(s, dir, "documents"), "doc_id", "text",
          width = 16, frameBytes = 64, stride = 2)
        .orderBy("doc_id", "frame_no")
    }),

    // ── §2.9: REAL container decode — synthesize a valid RIFF/WAVE PCM16
    //    file per doc, parse it back (chunk walk, LE fields, PCM energy);
    //    every output column travels through the binary container ────────
    "q_media_wav" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      Media.wavRoundTrip(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // ── §2.9: REAL container decode — 24-bit BMP (header validation,
    //    bottom-up padded pixel rows, channel sum) ───────────────────────
    // ── §2.9 X8b: pixel-intensity histogram over DECODED pixels — the
    //    image-side dedup/quality signal, whole codec path under oracle ───
    "q_media_histogram" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      Media.bmpHistogram(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id", "bucket")
    }),

    "q_media_bmp" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      Media.bmpRoundTrip(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // ── §2.9 X8: REAL compressed-image decode — PNG synthesized per
    //    document (zlib DEFLATE), then parsed back through CRC-verified
    //    chunks, Inflater, and scanline unfiltering; the channel sum is
    //    computed over the DECODED pixels ──────────────────────────────────
    "q_media_png" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      Media.pngRoundTrip(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // ── §2.9 X8: REAL palette-image round trip — own GIF87a codec (real
    //    LZW, 9→12-bit variable codes, sub-block framing); geometry and
    //    palette-resolved pixel sum come from the decoded container ──────
    "q_media_gif" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      Media.gifRoundTrip(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // ── §2.9 X8: REAL lossy-image decode — grayscale JPEG via the JDK's
    //    own codec (javax.imageio, headless); geometry from the DECODED
    //    header, reconstruction verified within a bounded mean pixel
    //    error (the lossy tier's analog of the exact channel sums) ──────
    "q_media_jpeg" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      Media.jpegRoundTrip(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // ── §2.9 X8: mixed-format decode DISPATCH — one binary column whose
    //    rows carry different formats (doc_id mod 4 → WAV/BMP/PNG/JPEG),
    //    each routed to its REAL decoder inside one per-partition pass;
    //    the heterogeneous-media shape of a production decode stage ──────
    "q_media_dispatch" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      Media.dispatchDecode(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // ── §2.9 X8: REAL video-container demux — frames muxed into genuine
    //    ISO-BMFF, then keyframes extracted by walking the
    //    stsz/stsc/stco/stss sample tables; only stss-marked samples'
    //    mdat byte ranges are read back (the 100 TB keyframe-sampling
    //    shape: container demux before any codec runs) ───────────────────
    "q_media_mp4" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      Media.mp4FrameSample(t(s, dir, "documents"), "doc_id", "text",
        frameBytes = 48, stride = 2)
        .orderBy("doc_id", "frame_no")
    }),

    // ── §2.9 X8c: H.264/AVC geometry — the metadata slice of inter-frame
    //    video: a real baseline SPS (Exp-Golomb, macroblock align + crop
    //    window, emulation prevention) per doc-derived geometry, wrapped
    //    in a real avcC record and parsed back by the independent bit
    //    reader; the oracle recomputes the geometry arithmetically, so
    //    writer/reader crop or golomb disagreements hash-diverge ─────────
    "q_media_avc" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      Media.avcGeometry(t(s, dir, "documents"), "doc_id")
        .orderBy("doc_id")
    }),

    // ── §2.9 X8: REAL image resize — BMP synthesized, nearest-neighbor
    //    downsampled ×2 (true pixel selection + re-encode), and the
    //    RESIZED container parsed back for geometry + channel sum ──────────
    "q_media_resize" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      Media.bmpResize(t(s, dir, "documents"), "doc_id", "text",
        width = 16, factor = 2)
        .orderBy("doc_id")
    }),

    // ── §2.9: backward as-of join — latest view at-or-before each
    //    purchase per user; union-scan formulation, ONE shuffle ──────────
    "q_asof_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val p = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("ep"), col("event_id"))
      val v = ev.where(col("event_type") === "view")
        .groupBy(col("user_id"), unix_micros(col("ts")).as("ep"))
        .agg(max(col("event_id")).as("view_event_id"))
      Analytics.asOfJoin(p, v, "user_id", "ep", "event_id", Seq("view_event_id"))
        .withColumnRenamed("r_ep", "view_ep")
        .orderBy("event_id")
    }),

    // ── §2.9: banded range join (broadcast band table) ──────────────────
    "q_range_join" -> ((s, dir) =>
      Analytics.bandJoin(t(s, dir, "part"), "p_size", "p_retailprice",
        Seq(("XS", 1, 10), ("S", 11, 20), ("M", 21, 30),
          ("L", 31, 40), ("XL", 41, 50)))
        .orderBy("band")),

    // ── §2.9: rollup / grouping-sets subtotals ──────────────────────────
    "q_rollup" -> ((s, dir) =>
      Analytics.rollup2(t(s, dir, "lineitem"),
        "l_returnflag", "l_linestatus", "l_quantity")
        .orderBy("l_returnflag", "l_linestatus")),

    // ── §2.9: CUBE — all four grouping sets in one Expand+aggregate ──────
    "q_cube" -> ((s, dir) =>
      Analytics.cube2(t(s, dir, "lineitem"),
        "l_returnflag", "l_linestatus", "l_quantity")
        .orderBy("l_returnflag", "l_linestatus")),

    // ── §2.9: inter-arrival gaps per user (lead/lag window surface) ──────
    "q_lag_gaps" -> ((s, dir) =>
      Events.interArrival(t(s, dir, "events"))
        .orderBy("event_id")),

    // ── §2.9: running total per user (decimal-exact prefix sums) ────────
    "q_running_total" -> ((s, dir) =>
      Analytics.runningTotal(
        t(s, dir, "events").withColumn("ep", unix_micros(col("ts"))),
        "user_id", "ep", "event_id", "value")
        .orderBy("user_id", "event_id")),

    // ── §2.9: pivot event types to count columns (explicit values) ──────
    "q_pivot" -> ((s, dir) =>
      Analytics.pivotCounts(t(s, dir, "events"), "user_id", "event_type",
        Seq("click", "error", "purchase", "signup", "view"))
        .orderBy("user_id")),

    // ── §2.9: exact interpolated quantiles per group ────────────────────
    "q_quantiles" -> ((s, dir) =>
      Analytics.quantiles(t(s, dir, "events"), "event_type", "value",
        Seq(0.25, 0.5, 0.75, 0.9), Seq("p25", "p50", "p75", "p90"))
        .orderBy("event_type")),

    // ── §2.5: INTERSECT — the complement of the diff engine's EXCEPT ────
    "q_intersect" -> ((s, dir) =>
      Analytics.intersectKeys(
        t(s, dir, "lineitem").select(col("l_orderkey").as("key")),
        t(s, dir, "orders").where(col("o_orderstatus") === "O")
          .select(col("o_orderkey").as("key")))
        .orderBy("key")),

    // ── §2.6 T1-T4 + §3.1: the WHOLE sync pipeline, end to end ──────────
    // Source snapshot derived from lineitem, catalog seeded from orders;
    // after sync the catalog placements must equal the source snapshot
    // exactly (diff convergence) — which is what the oracle asserts.
    // Exercises S5-S8 sinks, J4-J6 guards, O2/O3 algebra, T1 atomic commit.
    "q_sync_apply" -> ((s, dir) => {
      val src = t(s, dir, "lineitem").select(
        col("l_orderkey").as("shard_id"),
        col("l_linenumber").cast(LongType).as("shard_length"),
        concat(lit("host"), (col("l_suppkey") % 7).cast(StringType)).as("hostname"))
        .distinct()
        .persist()  // snapshot feeds both diff sides — scan+distinct once
      val ord = t(s, dir, "orders")
      val catShards = ord.select(lit(1L).as("table_id"),
        col("o_orderkey").as("shard_id"), lit("f").as("storage"),
        lit(null).cast(StringType).as("min_value"),
        lit(null).cast(StringType).as("max_value"))
      val catPlacements = ord.select(col("o_orderkey").as("shard_id"),
        lit(1L).as("shard_length"),
        concat(lit("host"), (col("o_custkey") % 7).cast(StringType)).as("hostname"))
        .distinct()
      val root = scratch("graft_meta_")
      val store = new MetaStore(s, root)
      store.commit(catShards, catPlacements)
      new SyncEngine(s, store).sync(1L, src.select("shard_id").distinct(), src)
      src.unpersist() // sync's actions all ran inside; result reads parquet
      store.placements.orderBy("shard_id", "shard_length", "hostname")
    }),

    // ── §3.3: the --fetch-min-max sync mode END TO END through the catalog
    // (HdfsSynchronizer.java:291-315 + CitusMasterNode.java:312-331): the
    // partition column is REGISTERED table metadata (master_get_table_
    // metadata analog), stats are ONE distributed min/max aggregation, and
    // the sync commit writes them into the new shard rows. Kept shards keep
    // their old (null) stats — the reference only attaches stats to shards
    // it inserts. Catalog seeded from F-status orders so the lineitem
    // snapshot yields both kept and new shards. ──────────────────────────
    "q_sync_stats" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val src = li.select(
        col("l_orderkey").as("shard_id"),
        col("l_linenumber").cast(LongType).as("shard_length"),
        concat(lit("host"), (col("l_suppkey") % 7).cast(StringType)).as("hostname"))
        .distinct()
        .persist()
      val ord = t(s, dir, "orders").where(col("o_orderstatus") === "F")
      val catShards = ord.select(lit(1L).as("table_id"),
        col("o_orderkey").as("shard_id"), lit("f").as("storage"),
        lit(null).cast(StringType).as("min_value"),
        lit(null).cast(StringType).as("max_value"))
      val catPlacements = ord.select(col("o_orderkey").as("shard_id"),
        lit(1L).as("shard_length"),
        concat(lit("host"), (col("o_custkey") % 7).cast(StringType)).as("hostname"))
        .distinct()
      val root = scratch("graft_meta_")
      val store = new MetaStore(s, root)
      store.commit(catShards, catPlacements)
      store.registerTable(1L, "lineitem", Some("l_partkey"))
      val eng = new SyncEngine(s, store)
      val stats = eng.computeStats(1L, li, "l_orderkey")
      eng.sync(1L, src.select("shard_id").distinct(), src, Some(stats))
      src.unpersist()
      store.shards.orderBy("shard_id")
    }),

    // ── §2.9 X108: DSIR importance scores (Xie et al. 2023) — rank every
    //    document by how target-like its hashed-token distribution is
    //    (target = the 'de' slice), then keep the top 5 per source: the
    //    distribution-matching data-selection pass. All-integer bucket
    //    weights (no ln — libm-dependent ulps would flip adjacent ranks);
    //    |buckets|-row weight table broadcast; WindowGroupLimit keeps the
    //    per-source rank partial ─────────────────────────────────────────
    "q_dsir_sample" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val scores = Sampling.dsirScore(docs, "doc_id", "text",
        col("lang") === "de", buckets = 64)
      val w = Window.partitionBy("source")
        .orderBy(col("dsir_score").desc, col("doc_id"))
      scores.join(docs.select("doc_id", "source"), "doc_id")
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= 5)
        .select(col("source"), col("rnk").cast(LongType).as("rnk"),
          col("doc_id"), col("n_tokens"), col("dsir_score"))
        .orderBy("source", "rnk")
    }),

    // ── §2.9 X109: preference-pair construction (the DPO/RLHF data
    //    shape) — per source, the i-th most lexically-diverse document
    //    paired with the i-th least, i ≤ 5; margin ≥ 0 and chosen ≠
    //    rejected by the 2i ≤ n guard. Integer diversity key
    //    (distinct·10⁶ div total — no ratio ulps); both rank filters plan
    //    WindowGroupLimit partials ──────────────────────────────────────
    "q_dpo_pairs" -> ((s, dir) => {
      val tok = t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          explode(TextOps.tokens(col("text"))).as("tok"))
        .where(length(col("tok")) > 0)
      val scored = tok.groupBy("source", "doc_id")
        .agg(countDistinct(col("tok")).as("d"), count(lit(1)).as("n"))
        .select(col("source"), col("doc_id"),
          expr("(d * 1000000L) div n").as("lex_score"))
      Sampling.preferencePairs(scored, "source", "doc_id", "lex_score", 5)
        .orderBy("source", "pair_id")
    }),

    // ── §2.9 X108b: DSIR importance RESAMPLING end to end — the published
    //    method's second half: the integer importance scores become order-
    //    sampling weights (u52/score priority, single IEEE division) and a
    //    fixed 100-doc budget is drawn ∝ score. Composition of X108 and
    //    the X45 weighted sampler; proves the selection pipeline COMPOSES ─
    "q_dsir_resample" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val scores = Sampling.dsirScore(docs, "doc_id", "text",
        col("lang") === "de", buckets = 64)
      Sampling.weightedSample(scores, "doc_id", col("dsir_score"), 100)
        .select(col("doc_id"), col("n_tokens"), col("dsir_score"))
        .orderBy("doc_id")
    }),

    // ── §2.9: training-mixture stratified sample — per-language rates,
    //    md5-bucket selection (nested, reproducible, engine-replayable) ────
    "q_stratified_sample" -> ((s, dir) =>
      Sampling.stratifiedSample(t(s, dir, "documents"), "lang", "doc_id",
        Seq("en" -> 50, "de" -> 20, "fr" -> 10), defaultPct = 5)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")),

    // ── §2.9: concat-and-chunk sequence packing — documents laid out per
    //    source in doc_id order, cut into 2048-token context windows ───────
    "q_pack_chunks" -> ((s, dir) =>
      Sampling.packChunks(
        t(s, dir, "documents").select(col("source"), col("doc_id"),
          size(TextOps.tokens(col("text"))).as("n_tokens")),
        "source", "doc_id", "n_tokens", budget = 2048)
        .orderBy("source", "doc_id")),

    // ── §2.9: the corpus pipeline END TO END — the composition a training
    //    corpus actually ships through: median quality cut → exact dedup
    //    (deterministic keeper) → leakage-free split by source → per-split
    //    document/token accounting. Every stage is one of the declared
    //    operators; this query proves they COMPOSE ─────────────────────────
    "q_corpus_pipeline" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val kept = docs.join(
        TextOps.qualityFilter(docs, "doc_id", "text", quantile = 0.5)
          .select("doc_id"),
        Seq("doc_id"), "left_semi")
      val surv = kept.join(
        Dedup.exact(kept, "doc_id", "text")
          .select(col("keeper").as("doc_id")),
        Seq("doc_id"), "left_semi")
      Sampling.splitAssign(surv, "source",
          Seq(("train", 80), ("valid", 10), ("test", 10)))
        .select(col("split"),
          size(TextOps.tokens(col("text"))).cast(LongType).as("nt"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("sum_tokens"))
        .orderBy("split")
    }),

    // ── §2.9: RAG-style overlapping text chunking — 500-char windows
    //    advancing by 400 (100 overlap); map-side explode, no shuffle ──────
    "q_chunk_text" -> ((s, dir) =>
      TextOps.chunkText(t(s, dir, "documents"), "doc_id", "text",
        size = 500, overlap = 100)
        .select(col("doc_id"), col("chunk_no"), col("chunk_start"),
          md5(col("chunk")).as("chunk_md5"),
          length(col("chunk")).cast(LongType).as("n_chars"))
        .orderBy("doc_id", "chunk_no")),

    // ── §2.9: intra-document repetition ratio (boilerplate signal) ────────
    "q_repetition" -> ((s, dir) =>
      TextOps.repetitionRatio(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    // ── §2.9: PII scrub — emails counted and redacted; 10% of docs get a
    //    deterministic synthesized email so the redaction path actually
    //    fires (the fixture corpus contains none); the audit artifact
    //    carries md5(redacted) instead of the full rewritten text ──────────
    "q_pii_redact" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 10 === 0,
          concat(col("text"), lit(" contact user"),
            col("doc_id").cast(StringType), lit("@example.com now")))
          .otherwise(col("text")).as("text"))
      TextOps.redactPii(d, "doc_id", "text")
        .select(col("doc_id"), col("n_emails"),
          md5(col("redacted")).as("redacted_md5"))
        .orderBy("doc_id")
    }),

    // ── §2.3: six-way star join (TPC-H Q5 shape) — local-supplier revenue
    //    per nation in one region; the fact table joins once per dimension
    //    and every dimension side broadcasts (Catalyst/AQE pick the order;
    //    the c_nationkey = s_nationkey residual makes it a genuine
    //    multi-predicate reorder problem, not a chain) ──────────────────────
    "q_local_volume" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val su = t(s, dir, "supplier")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(su, li("l_suppkey") === su("s_suppkey")
          && c("c_nationkey") === su("s_nationkey"))
        .join(n, su("s_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .where(r("r_name") === "ASIA")
        .groupBy(n("n_name").as("n_name"))
        .agg(count(lit(1)).as("n_items"),
          sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast(DecimalType(38, 6))).cast(DoubleType).as("revenue"))
        .orderBy("n_name")
    }),

    // ── §2.1 S5-S8 complement: keyed MERGE/upsert — 'O'-status orders get
    //    a repriced source row (replace), key 1 is a fresh insert, the
    //    rest of the target survives untouched ──────────────────────────────
    "q_upsert" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
        .select(col("o_orderkey").as("key"), col("o_totalprice").as("price"))
      val src = ord.where(col("key") % 100 === 0)
        .select(col("key"), round(col("price") * 2, 2).as("price"))
        .unionByName(s.range(1, 2).select(col("id").as("key"),
          lit(0.0).as("price")))
      CoreOps.upsert(ord, src, Seq("key"))
        .orderBy("key")
    }),

    // ── §2.9 / §2.1: partitioned layout + partition pruning — documents
    //    rewritten as lang=…/ directories, then a lang-filtered aggregate
    //    whose scan prunes whole partitions at planning time ───────────────
    "q_partition_prune" -> ((s, dir) => {
      val out = scratch("graft_part_")
      graft.sources.Layout
        .writePartitioned(s, t(s, dir, "documents"), out, Seq("lang"))
        .where(col("lang") === "en")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"))
        .orderBy("source")
    }),

    // ── §2.9 X9: small-files compaction — documents scattered over 32
    //    files, rewritten to the byte-target file count; the result reads
    //    THROUGH the compacted output (rows + id sum survive the rewrite,
    //    file count is the compaction contract) ─────────────────────────────
    "q_compact" -> ((s, dir) => {
      val tmp = scratch("graft_compact_")
      val src = tmp + "/src"; val dst = tmp + "/dst"
      t(s, dir, "documents").select("doc_id", "text")
        .repartition(32).write.mode("overwrite").parquet(src)
      val written = graft.sources.Layout.compact(s, src, dst,
        targetBytes = 512L * 1024 * 1024) // fixture bytes ≪ target → 1 file
      s.read.parquet(dst)
        .agg(count(lit(1)).as("n_rows"),
          sum(col("doc_id")).cast(LongType).as("sum_ids"))
        .select(col("n_rows"), col("sum_ids"),
          lit(written.toLong).as("n_files"))
    }),

    // ── catalog time travel + audit diff: two committed versions, then
    //    MetaStore.changes reads BOTH immutable snapshots (shardsAt) and
    //    reports added/removed shard rows — the versioned-layout feature
    //    the O(1) pointer flip buys ─────────────────────────────────────────
    "q_catalog_changes" -> ((s, dir) => {
      val root = scratch("graft_tt_")
      val store = new MetaStore(s, root)
      val ord = t(s, dir, "orders")
      def shardsOf(pred: Column) = ord.where(pred)
        .select(lit(1L).as("table_id"), col("o_orderkey").as("shard_id"),
          lit("f").as("storage"),
          lit(null).cast(StringType).as("min_value"),
          lit(null).cast(StringType).as("max_value"))
      def placementsOf(pred: Column) = ord.where(pred)
        .select(col("o_orderkey").as("shard_id"), lit(1L).as("shard_length"),
          lit("host0").as("hostname"))
      store.commit(shardsOf(col("o_orderstatus") === "F"),
        placementsOf(col("o_orderstatus") === "F"))          // v0
      store.commit(shardsOf(col("o_orderpriority") === "1-URGENT"),
        placementsOf(col("o_orderpriority") === "1-URGENT")) // v1
      store.changes(0L, 1L).orderBy("change", "shard_id")
    }),

    // ── §3.3: catalog RETENTION + TIME TRAVEL end to end — three committed
    //    versions, vacuum drops the oldest (reads of it degrade to empty,
    //    the Delta-VACUUM contract), rollback flips the pointer O(1); the
    //    per-version reads certify immutable history + the vacuum boundary ─
    "q_time_travel" -> ((s, dir) => {
      val root = scratch("graft_ttv_")
      val store = new MetaStore(s, root)
      val ord = t(s, dir, "orders")
      def shardsOf(pred: Column) = ord.where(pred)
        .select(lit(1L).as("table_id"), col("o_orderkey").as("shard_id"),
          lit("f").as("storage"),
          lit(null).cast(StringType).as("min_value"),
          lit(null).cast(StringType).as("max_value"))
      def placementsOf(pred: Column) = ord.where(pred)
        .select(col("o_orderkey").as("shard_id"), lit(1L).as("shard_length"),
          lit("host0").as("hostname"))
      store.commit(shardsOf(col("o_orderstatus") === "F"),
        placementsOf(col("o_orderstatus") === "F"))             // v0
      store.commit(shardsOf(col("o_orderpriority") === "1-URGENT"),
        placementsOf(col("o_orderpriority") === "1-URGENT"))    // v1
      store.commit(shardsOf(lit(true)), placementsOf(lit(true))) // v2
      store.vacuum(keepLast = 1)  // drops v0 (head-1 and head survive)
      store.rollback(1L)          // O(1) pointer flip, history untouched
      val cur = store.currentVersion
      // three catalog-sized counts — bounded metadata actions, the same
      // class as the sync engine's guard probes
      val rows = (0L to 2L).map(v =>
        (v, store.shardsAt(v).count(), v == cur))
      import s.implicits._
      rows.toDF("version", "n_shards", "is_current").orderBy("version")
    }),

    // ── skew handling: salted equi-join must EQUAL the plain join — the
    //    oracle is the unsalted SQL join, so any salt/replication slip
    //    (dropped row, double count) hash-mismatches ────────────────────────
    "q_salted_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_quantity"))
      val ord = t(s, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      CoreOps.saltedJoin(li, ord, "l_orderkey", salts = 8)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_quantity").cast(DecimalType(38, 6)))
            .cast(DoubleType).as("sum_qty"))
        .orderBy("o_orderpriority")
    }),

    // ── §2.9 X107: bucketed co-located join — both sides written bucketed
    //    by the join key (the layout shuffle paid ONCE at write), then the
    //    merge join AND the per-key aggregate run with ZERO data-path
    //    Exchange: the bucketing IS the partitioning for both (PlanSpec
    //    pins it; the only Exchange left is the oracle's final ORDER BY).
    //    The 100 TB shape for repeated large⋈large joins ───────────────────
    "q_bucket_join" -> ((s, dir) => {
      val wh = scratch("graft_bucket_")
      // per-invocation table names (suffix = the temp dir's unique tail):
      // fixed names leaked metastore entries pointing at dead temp dirs
      // and raced concurrent sessions sharing a warehouse. The catalog
      // entries are dropped in the finally — safe even though the result
      // is lazy, because Dataset construction analyzes eagerly (the
      // resolved relations capture the bucket spec and file paths) and
      // DROP TABLE on an external table leaves the data files in place.
      val tag = wh.replaceAll("[^0-9A-Za-z]", "").takeRight(16).toLowerCase
      val liTbl = s"graft_bucket_li_$tag"
      val ordTbl = s"graft_bucket_ord_$tag"
      try {
        t(s, dir, "lineitem").select("l_orderkey", "l_quantity")
          .write.mode("overwrite").option("path", s"$wh/li")
          .bucketBy(16, "l_orderkey").sortBy("l_orderkey")
          .saveAsTable(liTbl)
        t(s, dir, "orders").select("o_orderkey", "o_totalprice")
          .write.mode("overwrite").option("path", s"$wh/ord")
          .bucketBy(16, "o_orderkey").sortBy("o_orderkey")
          .saveAsTable(ordTbl)
        s.table(liTbl)
          .join(s.table(ordTbl).hint("merge"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderkey"))
          // quantities are integer-valued (TESTDATA.md) — cast-then-sum is
          // exact and order-independent, no DECIMAL needed
          .agg(count(lit(1)).as("n_items"),
            sum(col("l_quantity").cast(LongType)).as("sum_qty"))
          .orderBy("o_orderkey")
      } finally {
        s.sql(s"DROP TABLE IF EXISTS $liTbl")
        s.sql(s"DROP TABLE IF EXISTS $ordTbl")
      }
    }),

    // ── §2.9: event correlation (interval self-join) — view→click pairs
    //    within 1 hour per user; equi-join on user_id, window residual ─────
    "q_event_correlate" -> ((s, dir) =>
      Events.correlate(t(s, dir, "events"), "user_id", "event_type",
        "event_id", "ts", "view", "click", withinSec = 3600L)
        .orderBy("a_id", "b_id")),

    // ── §2.9: ordered conversion funnel — per-user earliest step times,
    //    each step strictly after the previous step's first completion ─────
    "q_funnel" -> ((s, dir) =>
      Analytics.funnel(t(s, dir, "events"), "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
        .orderBy("user_id")),

    // ── §2.9: cohort retention — integer epoch-week cohorts (calendar-free)
    //    by first event, distinct active users per week offset ─────────────
    "q_cohort" -> ((s, dir) =>
      Analytics.cohortRetention(t(s, dir, "events"), "user_id", "ts")
        .orderBy("cohort_week", "week_offset")),

    // ── §2.9: fixed-bin histogram — integer bin arithmetic, map-side
    //    collapse to ≤ nBins rows before one tiny shuffle ──────────────────
    "q_histogram" -> ((s, dir) =>
      Analytics.histogram(t(s, dir, "events"), "value", 0.0, 50.0, 10)
        .orderBy("bin")),

    // ── §2.9: semi-structured payload extraction — typed from_json parse
    //    of the events.props JSON column, aggregated per event type ────────
    "q_json_extract" -> ((s, dir) =>
      Events.jsonFieldStats(t(s, dir, "events"), "props", "k BIGINT", "k",
        "event_type")
        .orderBy("event_type")),

    // ── §2.9: benchmark-contamination check — the held-out 10% md5 bucket
    //    stands in for an eval benchmark; every remaining (training) doc is
    //    scored by distinct-trigram overlap against it ─────────────────────
    "q_contamination" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      Dedup.contamination(
        d.where(Sampling.hashBucket(col("doc_id"), 100) >= 10),
        d.where(Sampling.hashBucket(col("doc_id"), 100) < 10),
        "doc_id", "text", minOverlap = 20)
        .orderBy("doc_id")
    }),

    // ── §2.9: Bloom-prefiltered contamination — the scale path when the
    //    benchmark shingle set is broadcast-too-big: fitted Bloom blob as
    //    a literal, map-side probe, exact semi-join on survivors only
    //    (false positives removed → result identical to exact overlap) ────
    "q_bloom_contamination" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      // filter sized for the fixture benchmark (~35k distinct shingles at
      // sf0.1): 2^21 bits = 256 KB blob — ~60 bits/item, negligible FP.
      // Sizing only moves work between the bloom prune and the exact
      // semi-join; the result is identical at ANY size (FPs are removed
      // exactly), which is the operator's correctness contract.
      Dedup.bloomContamination(
        d.where(Sampling.hashBucket(col("doc_id"), 100) >= 15),
        d.where(Sampling.hashBucket(col("doc_id"), 100) < 15),
        "doc_id", "text", minOverlap = 20,
        expectedItems = 262144L, numBits = 2097152L)
        .orderBy("doc_id")
    }),

    // ── §2.9: exact-substring repeated spans (Lee et al. 2022) — verbatim
    //    64-char windows occurring in more than one document mark
    //    boilerplate that word-shingle Jaccard misses ─────────────────────
    "q_repeated_spans" -> ((s, dir) =>
      TextOps.repeatedSpans(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    // ── §2.9: mixed-language detection — per-chunk language-ID rolled up
    //    per doc (distinct langs, majority, minority fraction): the
    //    code-switch / concatenated-page filter signal ───────────────────
    "q_mixed_language" -> ((s, dir) =>
      TextOps.mixedLanguage(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    // ── §2.9: repeated-span REMOVAL — the cut half of Lee et al. 2022:
    //    shared windows merge into maximal spans, documents are rebuilt
    //    from the text between them (exact clean_text compared) ──────────
    "q_remove_spans" -> ((s, dir) =>
      TextOps.removeRepeatedSpans(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    // ── §2.9: FUZZY decontamination — cross-corpus MinHash+LSH candidates
    //    + exact Jaccard verification: catches paraphrased benchmark
    //    leakage that exact n-gram overlap misses. A 50/50 md5-bucket
    //    split stands in for the train/benchmark pair so the fixture's
    //    near-dup pairs land on both sides ───────────────────────────────
    "q_cross_contamination" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      Dedup.crossJaccardVerified(
        d.where(Sampling.hashBucket(col("doc_id"), 100) >= 50),
        d.where(Sampling.hashBucket(col("doc_id"), 100) < 50),
        "doc_id", "text", threshold = 0.3, maxDf = 100)
        .orderBy("da", "db")
    }),

    // ── §2.9 X39: deterministic global shuffle — the training-order
    //    permutation, computed by the two-phase bucket rank (no global
    //    window; bucket offsets broadcast) ─────────────────────────────────
    "q_shuffle_order" -> ((s, dir) =>
      Sampling.shuffleOrder(t(s, dir, "documents"), "doc_id", "epoch0")
        .select(col("doc_id"), col("pos"))
        .orderBy("pos")),

    // ── §2.9 X40: proportional source interleave — Bresenham mixture
    //    order: every prefix of the stream holds each source in
    //    proportion; integer-exact interleave key ──────────────────────────
    "q_interleave" -> ((s, dir) =>
      Sampling.interleave(t(s, dir, "documents"), "source", "doc_id")
        .select(col("doc_id"), col("source"), col("ikey"))
        .orderBy("ikey", "source", "doc_id")),

    // ── §2.9 X41: corpus bigram LM — conditional next-token counts,
    //    top-3 continuations per head token (integer-exact MLE pieces) ────
    "q_bigram_lm" -> ((s, dir) =>
      TextOps.bigramLm(t(s, dir, "documents"), "doc_id", "text", 3)
        .orderBy("w1", "rank")),

    // ── §2.9 X102: per-doc bigram novelty — share of bigram occurrences
    //    that are corpus-rare (count <= 2); the perplexity-filter stand-in
    //    with exact integers + one pinned division ─────────────────────────
    "q_bigram_novelty" -> ((s, dir) =>
      TextOps.bigramNovelty(t(s, dir, "documents"), "doc_id", "text",
        rareMax = 2)
        .orderBy("doc_id")),

    // ── §2.9 X42: near-dup graph degree — per-doc partner counts over the
    //    MinHash-verified pair graph (degree 0 for clean docs) ─────────────
    "q_dup_degree" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.dupDegree(docs,
        Dedup.minHashVerified(docs, "doc_id", "text", 0.3, maxDf = 100),
        "doc_id")
        .orderBy("doc_id")
    }),

    // ── §2.9 X43: sliding-window event counts — 1h windows every 15min,
    //    the hopping-window monitoring surface ─────────────────────────────
    "q_event_sliding" -> ((s, dir) =>
      Events.slidingCounts(t(s, dir, "events"))
        .orderBy("win_ts", "event_type")),

    // ── §2.9 X44: percentile winsorization — clamp to the [p05, p95]
    //    band before per-segment aggregation (robust feature cleaning) ────
    "q_winsorize" -> ((s, dir) =>
      Analytics.winsorize(t(s, dir, "customer"), "c_mktsegment", "c_acctbal",
        0.05, 0.95)
        .orderBy("c_mktsegment")),

    // ── §2.9 X79: per-group percentile rank — integer (rnk, n) pieces
    //    under the total (value, id) order; the cross-language score
    //    normalizer (rank within language, cut globally on rnk/n) ────────
    "q_percentile_rank" -> ((s, dir) =>
      Analytics.percentileRank(t(s, dir, "documents"), "lang", "n_chars",
        "doc_id")
        .orderBy("grp", "rnk")),

    // ── §2.9 X80: corpus diversity stats — per-source doc/token/trigram
    //    counts with exact distincts; the type-token-ratio and
    //    distinct-n-gram pieces that flag templated sources ──────────────
    "q_diversity" -> ((s, dir) =>
      TextOps.diversityStats(t(s, dir, "documents"), "source", "doc_id",
        "text")
        .orderBy("grp")),

    // ── §2.9 X45: incremental delta dedup — each doc of the 20% "new"
    //    bucket classified against the 80% "existing" corpus: exact md5
    //    match first, else best LSH-verified Jaccard match, else new ─────
    "q_dedup_delta" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      Dedup.dedupDelta(
        d.where(Sampling.hashBucket(col("doc_id"), 100) >= 20),
        d.where(Sampling.hashBucket(col("doc_id"), 100) < 20),
        "doc_id", "text", threshold = 0.3, maxDf = 100)
        .orderBy("doc_id")
    }),

    // ── §2.9 X119: corpus snapshot diff — content-aware added/removed/
    //    changed classification between two snapshots (the discovery step
    //    in front of every incremental pipeline: added∪changed feeds
    //    X45/X117/X111, removed feeds X111c). Old = buckets 0-89, new =
    //    buckets 10-99 with 40-49 content-modified → all three statuses ──
    "q_corpus_diff" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val b = Sampling.hashBucket(col("doc_id"), 100)
      Dedup.corpusDiff(
        d.where(b < 90),
        d.where(b >= 10).withColumn("text",
          when(b >= 40 && b < 50, concat(col("text"), lit(" v2")))
            .otherwise(col("text"))),
        "doc_id", "text")
        .orderBy("doc_id")
    }),

    // ── §2.9 X117: STREAMING near-dup classification — the streaming twin
    //    of X45: micro-batches of arriving docs classify (exact_dup /
    //    near_dup / new) against the FROZEN corpus DeltaIndex at
    //    delta-sized cost; batchId-keyed overwrite output = exactly-once
    //    under checkpoint replay. One AvailableNow trigger here, so the
    //    verdicts are bit-identical to the batch operator and share its
    //    oracle ──────────────────────────────────────────────────────────
    "q_stream_neardup" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val index = Dedup.buildDeltaIndex(
        d.where(Sampling.hashBucket(col("doc_id"), 100) >= 20),
        "doc_id", "text", maxDf = 100)
      val out = scratch("graft_snd_")
      try {
        val q = graft.streaming.StreamingNearDup.start(
          Tables.loadStream(s, dir, "documents")
            .where(Sampling.hashBucket(col("doc_id"), 100) < 20),
          "doc_id", "text", index, threshold = 0.3, out,
          scratch("graft_ckpt_"))
        q.awaitTermination()
      } finally index.unpersist()
      s.read.parquet(s"$out/b*").orderBy("doc_id")
    }),

    // ── §2.9 X46: token-budget selection — per source, keep the longest
    //    docs (ties by id) until 3000 chars of budget are filled ──────────
    "q_token_budget" -> ((s, dir) =>
      Sampling.tokenBudgetSelect(t(s, dir, "documents"), "source", "doc_id",
        col("n_chars"), "n_chars", 3000L)
        .select(col("doc_id"), col("source"), col("n_chars"),
          col("cum_tokens"))
        .orderBy("doc_id")),

    // ── §2.9 X47: curriculum rank — exact global rank by length via the
    //    value-bucketed two-phase rank (no single-reducer window), integer
    //    decile cut ────────────────────────────────────────────────────────
    "q_curriculum" -> ((s, dir) => {
      // the decile denominator counts exactly the RANKED rows (NULL
      // values/keys are excluded by rankByValue) — oracle filters alike
      val d = t(s, dir, "documents")
        .where(col("n_chars").isNotNull && col("doc_id").isNotNull)
      val total = d.agg(count(lit(1)).as("__tot"))
      Sampling.rankByValue(d, "n_chars", "doc_id")
        .crossJoin(broadcast(total))
        .select(col("doc_id"), col("n_chars"), col("rnk"),
          floor((col("rnk") - 1) * 10 / col("__tot")).cast(LongType)
            .as("decile"))
        .orderBy("doc_id")
    }),

    // ── §2.9 X48: trailing z-score anomaly over hourly event counts —
    //    integer-exact window sums, one sqrt + one division per score ─────
    "q_event_anomaly" -> ((s, dir) =>
      Events.anomaly(t(s, dir, "events"))
        .orderBy("win_ts", "event_type")),

    // ── §2.9 X49: sequence-length bucketing — fixed ladder, padding-waste
    //    accounting (the bucketed-batching loader diagnostic) ─────────────
    "q_length_buckets" -> ((s, dir) =>
      Sampling.lengthBuckets(t(s, dir, "documents"), "n_chars",
        Seq(64, 128, 256, 512))
        .orderBy("bucket")),

    // ── §2.9 X50: vocabulary construction — frequency-ranked token ids
    //    (count desc, md5 tiebreak) over the min-df-filtered vocab, rank
    //    via the two-phase bucket machinery ────────────────────────────────
    "q_build_vocab" -> ((s, dir) =>
      TextOps.buildVocab(t(s, dir, "documents"), "doc_id", "text",
        minDf = 2, maxVocab = 200)
        .orderBy("token_id")),

    // ── §2.9 X50b: OOV rate — per-doc tokenizer coverage against the
    //    top-50 vocabulary cut ────────────────────────────────────────────
    "q_oov_rate" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      TextOps.oovRate(d, "doc_id", "text",
        TextOps.buildVocab(d, "doc_id", "text", minDf = 2, maxVocab = 50))
        .orderBy("doc_id")
    }),

    // ── §2.9 X51: skip-gram co-occurrence — word2vec-style training
    //    pairs (±2 window) with integer PMI pieces, top-50 by count ───────
    "q_skipgram" -> ((s, dir) =>
      TextOps.skipgramPmi(t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("n_ab").desc, col("a").asc, col("b").asc)),

    // ── §2.9 X52: keyword search — integer-exact ranked retrieval
    //    (distinct-term coordination + tf tiebreak), top-10 ───────────────
    // ── §2.9 X129: percolation / reverse search — stored conjunctive
    //    queries (the alerting/subscription registry) matched by every
    //    document: registry explodes to broadcast term postings with
    //    the per-query term count denormalized, docs explode to
    //    distinct tokens, match = one term-keyed join + count = need.
    //    Query 4's term exists in no corpus (a standing alert that
    //    never fires must never fire); query 3 exercises the
    //    vocabulary-dependent case (matches at sf0.01, empty at sf1) ──
    "q_percolate" -> ((s, dir) =>
      TextOps.percolate(t(s, dir, "documents"), "doc_id", "text",
        percolateRegistry(s), "qid", "terms")
        .orderBy("doc_id", "qid")),

    // ── §2.8 + §2.9 X129b: STREAMING percolation — the registry's
    //    natural deployment: every arriving micro-batch of documents is
    //    matched against the broadcast standing queries (stream-static
    //    join + streaming conjunction count, complete mode). The
    //    conjunction's groupBy keys include doc_id, so batching can
    //    never change which queries a document fires — the final table
    //    equals the batch operator and SHARES its oracle; spec-pinned
    //    across three forced micro-batches in StreamingSpec ────────────
    "q_stream_percolate" -> ((s, dir) => {
      val name = s"graft_stream_perc_${streamSeq.incrementAndGet()}"
      val q = TextOps.percolate(Tables.loadStream(s, dir, "documents"),
          "doc_id", "text", percolateRegistry(s), "qid", "terms")
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", scratch("graft_ckpt_"))
        .start()
      q.awaitTermination()
      s.table(name).orderBy("doc_id", "qid")
    }),

    "q_keyword_search" -> ((s, dir) =>
      TextOps.keywordSearch(t(s, dir, "documents"), "doc_id", "text",
        Seq("spark", "join", "window"), k = 10)),

    // ── §2.9 X138: more-like-this (query by document) — doc 42's top-8
    //    salient terms (tf desc, df asc, stopword df-cap) fed through
    //    the integer-exact BM25 chain, self excluded, top-10 ───────────
    "q_more_like_this" -> ((s, dir) =>
      TextOps.moreLikeThis(t(s, dir, "documents"), "doc_id", "text",
        queryId = 42L, m = 8, k = 10)),

    // ── §2.9 X135: blocklist phrase matching — literal substring
    //    phrases (multi-token, so token-set percolation can't express
    //    them) counted map-side per document, hits only; one pattern
    //    can never fire (the non-vacuous negative) ─────────────────────
    "q_blocklist" -> ((s, dir) =>
      TextOps.blocklistHits(t(s, dir, "documents"), "doc_id", "text",
        Seq("hash join", "table scan", "slow query", "vector",
          "zzqx never"))
        .orderBy("doc_id", "pattern")),

    // ── §2.9 X53: BPE merge-candidate pairs — adjacent char-pair counts
    //    from the (word, count) vocab frame, top-20 merges ────────────────
    "q_bpe_merge" -> ((s, dir) =>
      TextOps.bpeMergePairs(t(s, dir, "documents"), "doc_id", "text",
        topK = 20)),

    // ── §2.9 X54: bigram-LM novelty pieces — per-doc integer familiarity
    //    vs the corpus bigram counts (the perplexity-filter core) ─────────
    "q_lm_novelty" -> ((s, dir) =>
      TextOps.bigramNovelty(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    // ── §2.9 X55: dup-graph triangles — cluster-density diagnostic over
    //    the MinHash-verified pair graph (chain vs clique) ────────────────
    "q_triangles" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.triangles(
        Dedup.minHashVerified(docs, "doc_id", "text", 0.3, maxDf = 100))
        .orderBy("a", "b", "c")
    }),

    // ── §2.9 X96: canonical document selection — per near-dup cluster,
    //    keep the best-QUALITY copy (components × quality argmax) ─────────
    "q_canonical_docs" -> ((s, dir) =>
      Dedup.canonicalDocs(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("component")),

    // ── §2.9 X81: fixed-point PageRank over the LSH near-dup graph —
    //    integer ranks (scale 10¹²), bit-identical on any engine ──────────
    "q_pagerank" -> ((s, dir) =>
      Dedup.pageRank(Dedup.minHashLsh(t(s, dir, "documents"), "doc_id", "text"))
        .orderBy(col("pr").desc, col("node").asc)),

    // ── §2.9 X81b: MinHash Jaccard estimation on LSH candidates — the
    //    integer agreeing-component numerator out of k=16 ─────────────────
    "q_jaccard_est" -> ((s, dir) =>
      Dedup.jaccardEstimate(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("da", "db")),

    // ── §2.9 X81c: dedup cluster size distribution — CC over the LSH
    //    graph rolled up to (size → clusters, docs) ───────────────────────
    "q_cluster_sizes" -> ((s, dir) =>
      Dedup.clusterSizes(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("size")),

    // ── §2.9 X97: k-core peel over the LSH candidate graph — the dense
    //    dup region (k=2 survivors of iterated degree peeling), with
    //    within-core degrees; fixed 8-round unroll on both engines,
    //    KCoreSpec asserts the fixture converges well inside it ──────────
    "q_kcore" -> ((s, dir) =>
      Dedup.kCore(Dedup.minHashLsh(t(s, dir, "documents"), "doc_id", "text"),
        k = 2, rounds = 8)
        .orderBy("node")),

    // ── §2.9 X81d: duplicated-byte accounting per group — where does a
    //    dedup pass pay for itself. Run on the event log (at-least-once
    //    delivery → repeated identical payloads per type); the fixture
    //    documents table has near-dups but zero exact copies ─────────────
    "q_dup_mass" -> ((s, dir) =>
      Dedup.dupMass(
          t(s, dir, "events").withColumn("n_chars", length(col("props"))),
          "event_type", "props", "n_chars")
        .orderBy("grp")),

    // ── §2.9 X82: per-group robust center/spread — exact median + MAD by
    //    order statistics over the grouped two-phase rank ─────────────────
    "q_mad" -> ((s, dir) =>
      Analytics.madByGroup(t(s, dir, "documents"), "lang", "n_chars",
        "doc_id")
        .orderBy("grp")),

    // ── §2.9 X83: key-skew diagnostic — exact integer Gini + p99/max of
    //    per-user event counts (the pre-shuffle salting decision) ─────────
    "q_skew_gini" -> ((s, dir) =>
      Analytics.skewGini(t(s, dir, "events"), "user_id")
        .orderBy("n_keys")),

    // ── §2.9 X84: BM25 retrieval in rational fixed point — rarity × tf
    //    saturation × length norm, all-integer scores ─────────────────────
    "q_bm25" -> ((s, dir) =>
      TextOps.bm25(t(s, dir, "documents"), "doc_id", "text",
        Seq("spark", "join", "window"), k = 20)),

    // ── §2.9 X120: persisted inverted text index — the corpus tokenized
    //    ONCE into hive-partitioned posting lists (dl/df denormalized
    //    onto the rows, stats as the bounded model, atomic pointer
    //    publish); the probe scans only the buckets its terms hash to
    //    and scores row-locally with the same integer-exact BM25 ───────
    "q_text_index" -> ((s, dir) => {
      val path = scratch("graft_txtidx_")
      TextIndex.buildTextIndex(t(s, dir, "documents"), "doc_id",
        "text", path, nBuckets = 16)
      TextIndex.textIndexTopK(s, Seq("spark", "join", "window"), path, k = 20)
    }),

    // ── §2.9 X120f: BOOLEAN-AND conjunctive probe — only documents
    //    matching EVERY query term, ranked by the same integer BM25 sum
    //    (Lucene MUST semantics; bag-of-words ranking can't express the
    //    all-terms bar). Same pruned buckets + pushed term filter as the
    //    disjunctive probe — the conjunction is one row-local predicate
    //    on the per-doc term count the rollup already carries ──────────
    "q_bool_search" -> ((s, dir) => {
      val path = scratch("graft_txtand_")
      TextIndex.buildTextIndex(t(s, dir, "documents"), "doc_id",
        "text", path, nBuckets = 16)
      // terms chosen to co-occur at EVERY fixture scale incl. the
      // GenData sf1 vocabulary, so the scale gate is never vacuous
      TextIndex.textIndexTopKAll(s, Seq("hash", "join", "table"), path,
        k = 20)
    }),

    // ── §2.9 X120b: text-index APPEND lifecycle — build on the even
    //    half, append the odd half against the FROZEN stats (nd/avgdl
    //    anchored to the base, appended rows carry the base's df where
    //    the token exists, else the batch's own — the ANN frozen-
    //    centroid contract on the lexical side), probe across both.
    //    Token-idempotent publish touches only the delta's buckets ─────
    "q_text_append" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val path = scratch("graft_txtapp_")
      TextIndex.buildTextIndex(docs.where(col("doc_id") % 2 === 0),
        "doc_id", "text", path, nBuckets = 16)
      TextIndex.textIndexAppend(docs.where(col("doc_id") % 2 === 1),
        "doc_id", "text", path, token = "t1")
      TextIndex.textIndexTopK(s, Seq("spark", "join", "window"), path, k = 20)
    }),

    // ── §2.9 X120e: PHRASE search over a POSITIONAL text index — the
    //    proximity query bag-of-words BM25 cannot express: postings
    //    store each token's sorted positions, a phrase occurrence at
    //    start s is s ∈ ⋂ᵢ(positionsᵢ − i), so the probe is a pruned
    //    bucket read + |phrase|−1 doc-keyed joins + a row-local
    //    array_intersect. Integer-exact, oracle = the token-array
    //    adjacency count ─────────────────────────────────────────────────
    "q_phrase_search" -> ((s, dir) => {
      val path = scratch("graft_txtpos_")
      TextIndex.buildTextIndex(t(s, dir, "documents"), "doc_id", "text",
        path, nBuckets = 16, positional = true)
      TextIndex.textIndexPhraseTopK(s, Seq("table", "hash"), path, k = 20)
    }),

    // ── §2.9 X120c: text-index DELETE — build on the full corpus, take
    //    down every doc_id ≡ 3 (mod 7), probe: deleted docs vanish,
    //    survivors score with their build-time (frozen) df/stats, so the
    //    oracle is the full-corpus scoring restricted to survivors ──────
    "q_text_delete" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val path = scratch("graft_txtdel_")
      TextIndex.buildTextIndex(docs, "doc_id", "text", path, nBuckets = 16)
      TextIndex.textIndexDelete(
        docs.where(col("doc_id") % 7 === 3).select("doc_id"),
        "doc_id", path, token = "d1")
      TextIndex.textIndexTopK(s, Seq("spark", "join", "window"), path, k = 20)
    }),

    // ── §2.9 X120d: text-index COMPACT — build on the even half, two
    //    appends leave small token-prefixed files per bucket, compaction
    //    re-clusters into a fresh pointer-flipped version; file count
    //    drops and the probe is bit-identical, so the oracle is
    //    q_text_append's (content never changes across a compact) ───────
    "q_text_compact" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val path = scratch("graft_txtcmp_")
      TextIndex.buildTextIndex(docs.where(col("doc_id") % 2 === 0),
        "doc_id", "text", path, nBuckets = 16)
      Seq(1L, 3L).foreach { r =>
        TextIndex.textIndexAppend(docs.where(col("doc_id") % 4 === r),
          "doc_id", "text", path, token = s"t$r")
      }
      val probeBefore = TextIndex
        .textIndexTopK(s, Seq("spark", "join", "window"), path, k = 20)
        .collect().toSeq
      val (f0, f1) = TextIndex.textIndexCompact(s, path)
      require(f1 < f0, s"compact must reduce index files ($f0 -> $f1)")
      val after = TextIndex
        .textIndexTopK(s, Seq("spark", "join", "window"), path, k = 20)
      require(after.collect().toSeq == probeBefore,
        "probe must be bit-identical across a compact")
      after
    }),

    // ── §2.8 + §2.9 X124: STREAMING text-index ingest — the lexical
    //    twin of q_stream_index: the document stream appends to the
    //    persisted posting lists per micro-batch against the frozen
    //    stats (foreachBatch → token-idempotent textIndexAppend); the
    //    probe across built + streamed halves replays the q_text_append
    //    oracle because corpus-known terms score batch-split-invariantly ─
    "q_stream_text_index" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val path = scratch("graft_txtstr_")
      TextIndex.buildTextIndex(docs.where(col("doc_id") % 2 === 0),
        "doc_id", "text", path, nBuckets = 16)
      val q = graft.streaming.StreamingTextIngest.start(
        Tables.loadStream(s, dir, "documents")
          .where(col("doc_id") % 2 === 1),
        "doc_id", "text", path, scratch("graft_ckpt_txt_"))
      q.awaitTermination()
      TextIndex.textIndexTopK(s, Seq("spark", "join", "window"), path, k = 20)
    }),

    // ── §2.9 X123: chunk-level retrieval pipeline (the RAG shape) —
    //    chunk every document (X36's 500/100 windows), tokenize the
    //    CHUNKS once into the persisted inverted index (X120), probe
    //    with the query terms: passage-granular BM25 where the scan
    //    touches only the probed buckets. chunk_id = doc_id·10⁵+chunk_no
    //    round-trips both halves through the index, GUARDED: the pack
    //    raise_errors on a ≥100k-chunk doc or out-of-range doc_id
    //    instead of silently aliasing another chunk ─────────────────────
    "q_chunk_retrieve" -> ((s, dir) => {
      val chunks = TextOps.chunkText(t(s, dir, "documents"), "doc_id",
          "text", size = 500, overlap = 100)
        .select(TextOps.packChunkId(col("doc_id"), col("chunk_no"))
          .as("chunk_id"), col("chunk"))
      val path = scratch("graft_chunkidx_")
      TextIndex.buildTextIndex(chunks, "chunk_id", "chunk", path,
        nBuckets = 16)
      TextIndex.textIndexTopK(s, Seq("spark", "join", "window"), path,
          k = 20)
        .select(expr("doc_id div 100000").as("__d"),
          pmod(col("doc_id"), lit(100000L)).as("chunk_no"),
          col("score"), col("n_terms"))
        .withColumnRenamed("__d", "doc_id")
        .select("doc_id", "chunk_no", "score", "n_terms")
        .orderBy(col("score").desc, col("doc_id"), col("chunk_no"))
    }),

    // ── §2.9 X122b: prefix trim — strip each source's common prefix
    //    from every doc (broadcast groups-sized prefix frame + map-side
    //    substring). The fixture synthesizes a real per-source banner
    //    ("[srcN] " prepended) so the trim is exercised, not an identity
    //    pass; the oracle replays the same construction ─────────────────
    "q_prefix_trim" -> ((s, dir) =>
      TextOps.prefixTrim(
        t(s, dir, "documents").withColumn("text",
          concat(lit("["), col("source"), lit("] "), col("text"))),
        "doc_id", "text", "source")
        .orderBy("doc_id")),

    // ── §2.9 X121: duplicate-window fraction — per doc, the share of
    //    its stride-1 8-token windows whose text occurred earlier in the
    //    corpus (the exact token-aligned "recycled text" signal); same
    //    skew-proof two-phase min first-occurrence as segment dedup ────
    "q_dup_windows" -> ((s, dir) =>
      Dedup.dupWindows(t(s, dir, "documents"), "doc_id", "text", w = 8)
        .orderBy("doc_id")),

    // ── §2.9 X131b: exact-substring CUT LIST — per doc, the merged
    //    token intervals covered by duplicated 4-token windows (first
    //    occurrence kept): the actionable ExactSubstr dedup artifact.
    //    X121's hashed-window machinery + one hash-keyed join back +
    //    a per-doc gaps-and-islands interval merge ─────────────────────
    "q_substr_cut" -> ((s, dir) =>
      Dedup.exactSubstrCut(t(s, dir, "documents"), "doc_id", "text", w = 4)
        .orderBy("doc_id", "span_start")),

    // ── §2.9 X131c: APPLY the cut list — remove every duplicated span
    //    and reassemble the clean corpus (row-local indexed filter over
    //    the token array against the bounded interval list) ────────────
    "q_substr_apply" -> ((s, dir) =>
      Dedup.exactSubstrApply(t(s, dir, "documents"), "doc_id", "text",
        w = 4)
        .orderBy("doc_id")),

    // ── §2.9 X131: generalized suffix array (prefix doubling) + exact
    //    longest-repeated-span extraction — the Lee et al. 2021
    //    ExactSubstr dedup machinery: top-20 adjacent-pair LCPs in SA
    //    order, each an exact byte-identical repeated token passage.
    //    O(log maxdoclen) distributed dense-rank rounds, sparse-table
    //    LCP descent over the checkpointed round frames ────────────────
    "q_suffix_lcp" -> ((s, dir) =>
      SuffixOps.longestRepeatedSpans(t(s, dir, "documents"), "doc_id",
        "text", k = 20)),

    // ── §2.9 X122: per-source common-prefix boilerplate — LCP of every
    //    doc in a source via LCP(lexicographic min, max): one min/max
    //    aggregation, then two-string arithmetic per source ────────────
    "q_source_prefix" -> ((s, dir) =>
      TextOps.sourcePrefix(t(s, dir, "documents"), "doc_id", "text",
        "source")
        .orderBy("source")),

    // ── §2.9 X85b: exact substring duplication — per-doc counts of
    //    24-char windows shared verbatim with another doc, under
    //    content-defined (alignment-free) window selection ────────────────
    "q_substring_dup" -> ((s, dir) =>
      Dedup.substringDup(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    // ── §2.9 X86: χ² token–label feature selection — top-10 tokens per
    //    language by the document-frequency 2×2 statistic ─────────────────
    "q_chi2_tokens" -> ((s, dir) =>
      TextOps.chiSquareTokens(t(s, dir, "documents"), "doc_id", "text",
        "lang", minDf = 5, topK = 10)
        .orderBy("label", "rk")),

    // ── §2.8 + §2.6: the STREAMING SYNC DRIVER, oracle-checked — the
    //    reference's cron loop as a checkpointed foreachBatch query: one
    //    micro-batch carries the full lineitem-derived snapshot, the
    //    engine diffs it against the orders-seeded catalog and commits
    //    atomically; the oracle asserts the committed placements equal
    //    the snapshot exactly (diff convergence THROUGH the stream) ───────
    "q_stream_sync" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
      val catShards = ord.select(lit(1L).as("table_id"),
        col("o_orderkey").as("shard_id"), lit("f").as("storage"),
        lit(null).cast(StringType).as("min_value"),
        lit(null).cast(StringType).as("max_value"))
      val catPlacements = ord.select(col("o_orderkey").as("shard_id"),
        lit(1L).as("shard_length"),
        concat(lit("host"), (col("o_custkey") % 7).cast(StringType)).as("hostname"))
        .distinct()
      val root = scratch("graft_meta_")
      val store = new MetaStore(s, root)
      store.commit(catShards, catPlacements)
      val snap = Tables.loadStream(s, dir, "lineitem").select(
        col("l_orderkey").as("shard_id"),
        col("l_linenumber").cast(LongType).as("shard_length"),
        concat(lit("host"), (col("l_suppkey") % 7).cast(StringType)).as("hostname"))
      val q = new graft.streaming.StreamingSync(new SyncEngine(s, store), 1L)
        .start(snap,
          scratch("graft_ckpt_sync_"))
      q.awaitTermination()
      store.placements.orderBy("shard_id", "shard_length", "hostname")
    }),

    // ── §2.8 + §2.9 X1: STREAMING exact dedup, oracle-checked — the
    //    aggregate (min-keeper) form whose complete-mode final table is
    //    arrival-order-independent and equals the batch Dedup.exact ───────
    "q_stream_dedup" -> ((s, dir) => {
      val name = s"graft_stream_dedup_${streamSeq.incrementAndGet()}"
      val q = graft.streaming.EventStreams
        .dedupAggStream(Tables.loadStream(s, dir, "documents"),
          "doc_id", "text")
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation",
          scratch("graft_ckpt_"))
        .start()
      q.awaitTermination()
      s.table(name).orderBy("h")
    }),

    // ── §2.8: STREAMING tumbling counts, oracle-checked end to end — the
    //    Structured Streaming pipeline (readStream → watermark → window →
    //    memory sink, Trigger.AvailableNow) run to completion inside the
    //    query; complete mode re-emits every window, so the final table
    //    equals the batch aggregation exactly and the DuckDB oracle
    //    certifies the STREAM's output, not a batch stand-in ──────────────
    "q_stream_tumbling" -> ((s, dir) => {
      val name = s"graft_stream_tumb_${streamSeq.incrementAndGet()}"
      val q = graft.streaming.EventStreams
        .tumblingCounts(Tables.loadStream(s, dir, "events"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation",
          scratch("graft_ckpt_"))
        .start()
      q.awaitTermination()
      s.table(name).orderBy("hour_ts", "event_type")
    }),

    // ── §2.8: STREAMING sliding (hopping) counts, oracle-checked — each
    //    event lands in width/slide windows via the streaming Expand; the
    //    complete-mode final table equals the batch hop aggregation ───────
    "q_stream_sliding" -> ((s, dir) => {
      val name = s"graft_stream_slide_${streamSeq.incrementAndGet()}"
      val q = graft.streaming.EventStreams
        .slidingCounts(Tables.loadStream(s, dir, "events"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation",
          scratch("graft_ckpt_"))
        .start()
      q.awaitTermination()
      s.table(name).orderBy("win_ts", "event_type")
    }),

    // ── §2.8: STREAMING gap-sessionization via the native session_window,
    //    oracle-checked end to end — sessions merge while events arrive
    //    within the 30 min gap (window end = last event + gap; an event at
    //    EXACTLY prev+gap still MERGES — Spark's merge test is inclusive,
    //    start <= currentEnd, proven by the sf1 sweep where 24 exact-1800s
    //    ties split under a >= oracle); complete mode re-emits every
    //    session, so the final
    //    table equals the batch gaps-and-islands exactly. Timestamps are
    //    second-truncated BEFORE the window so sub-second precision can't
    //    flip a boundary between engines (the q_sessionize discipline) ─────
    "q_stream_sessions" -> ((s, dir) => {
      val name = s"graft_stream_sess_${streamSeq.incrementAndGet()}"
      val q = graft.streaming.EventStreams
        .sessions(Tables.loadStream(s, dir, "events")
          .withColumn("ts", date_trunc("second", col("ts"))))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation",
          scratch("graft_ckpt_"))
        .start()
      q.awaitTermination()
      s.table(name).orderBy("user_id", "start_ep")
    }),

    // ── §2.8: STREAM-STREAM watermarked interval join, oracle-checked
    //    end to end — view→click pairs of the same user within 1 h, both
    //    sides watermarked with the join condition bounding event time in
    //    BOTH directions (the state-boundedness requirement for an
    //    unbounded inner join). Inner-join results emit immediately in
    //    append mode, so the final table equals the batch interval join
    //    (q_event_correlate's oracle) exactly ──────────────────────────────
    "q_stream_join" -> ((s, dir) => {
      val name = s"graft_stream_join_${streamSeq.incrementAndGet()}"
      val ev = Tables.loadStream(s, dir, "events")
      val q = graft.streaming.EventStreams
        .correlate(ev.where(col("event_type") === "view"),
          ev.where(col("event_type") === "click"), withinSec = 3600L)
        .writeStream.format("memory").queryName(name)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation",
          scratch("graft_ckpt_"))
        .start()
      q.awaitTermination()
      s.table(name).orderBy("a_id", "b_id")
    }),

    // ── §2.8: STREAM-STATIC broadcast enrichment join, oracle-checked
    //    end to end — each micro-batch of the event stream joins the
    //    customer→nation dimension (broadcast: the dim is cluster-small,
    //    the stream unbounded) and rolls up counts per (nation,
    //    event_type); complete mode + order-independent counts make the
    //    final table equal the batch join+group on any micro-batch split ──
    "q_stream_enrich" -> ((s, dir) => {
      val name = s"graft_stream_enrich_${streamSeq.incrementAndGet()}"
      val dim = Tables.load(s, dir, "customer")
        .join(Tables.load(s, dir, "nation"),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name"))
      val q = graft.streaming.EventStreams
        .enrichedCounts(Tables.loadStream(s, dir, "events"), dim,
          "user_id", "c_custkey", "n_name")
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation",
          scratch("graft_ckpt_"))
        .start()
      q.awaitTermination()
      s.table(name).orderBy("n_name", "event_type")
    }),

    // ── §2.8: custom-state sessionization (flatMapGroupsWithState),
    //    oracle-checked — the emit-only-on-proof state machine run in
    //    batch mode; closed sessions == gaps-and-islands minus each
    //    user's final (still-open) session ────────────────────────────────
    "q_stateful_sessions" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      graft.streaming.StatefulSessions.closedSessions(t(s, dir, "events"))
        .toDF()
        .orderBy("user_id", "start_ep")
    }),

    // ── Interchange-tier fidelity, oracle-checked: write the events
    //    slice to each format, read it back schema-explicit, aggregate —
    //    the oracle aggregates the PARQUET original, so a hash match
    //    proves the round trip preserved every value (ids, epochs, the
    //    raw doubles via shortest-repr serialization) with zero
    //    quarantined rows ────────────────────────────────────────────────
    "q_csv_roundtrip" -> ((s, dir) =>
      interchangeRoundTrip(s, dir, "csv")),
    "q_jsonl_roundtrip" -> ((s, dir) =>
      interchangeRoundTrip(s, dir, "jsonl")),
    "q_orc_roundtrip" -> ((s, dir) =>
      interchangeRoundTrip(s, dir, "orc")),

    // ── §2.9 X94: per-class centroid drift — cosine between each label's
    //    id-parity half-centroids, exact fixed-point vector algebra ───────
    "q_centroid_drift" -> ((s, dir) =>
      Similarity.centroidDrift(t(s, dir, "embeddings"), "vec_id",
        "embedding", "label")
        .orderBy("label")),

    // ── §2.9 X93: market-basket pair mining — parts co-ordered within
    //    an order, support ≥ 2, top-50 (basket-keyed self-join, never
    //    corpus²; deterministic (count, pair) cut) ─────────────────────────
    "q_basket_pairs" -> ((s, dir) =>
      Analytics.basketPairs(t(s, dir, "lineitem"), "l_orderkey",
        "l_partkey", minSupport = 2, topK = 50)),

    // ── §2.9 X93b: association rules — confidence + lift over the
    //    support-filtered pairs, ranked on rounded lift ────────────────────
    "q_assoc_rules" -> ((s, dir) =>
      Analytics.assocRules(t(s, dir, "lineitem"), "l_orderkey",
        "l_partkey", minSupport = 2, topK = 50)),

    // ── §2.9 X95: event-type transition matrix — the first-order Markov
    //    chain of user behavior, counts + row-normalized probabilities ────
    "q_event_transitions" -> ((s, dir) =>
      Analytics.eventTransitions(t(s, dir, "events"), "user_id", "ts",
        "event_type", "event_id")
        .orderBy("prev_type", "next_type")),

    // ── §2.9 X91: per-type least-squares trend + Pearson r from exact
    //    integer moments (x = epoch seconds, y = centi-units) ─────────────
    "q_linreg" -> ((s, dir) =>
      Analytics.linReg(
        t(s, dir, "events").select(col("event_type"),
          // pmod-floor form: DuckDB's `//` floors while Spark's `div`
          // truncates toward zero — pre-epoch sub-second timestamps would
          // land one second late under a bare div (the Tables.load hazard)
          expr("(unix_micros(ts) - pmod(unix_micros(ts), 1000000)) " +
            "div 1000000").as("xs"),
          round(col("value") * 100).cast(LongType).as("yc")),
        "event_type", "xs", "yc")
        .orderBy("grp")),

    // ── §2.9 X92: per-user time-weighted average value (step-and-hold
    //    integral over the observation span, centi-unit fixed point) ──────
    "q_twap" -> ((s, dir) =>
      Events.timeWeightedAvg(
        t(s, dir, "events").withColumn("vc",
          round(col("value") * 100).cast(LongType)),
        "user_id", "ts", "vc", "event_id")
        .orderBy("key")),

    // ── §2.9 X88: k-anonymity / l-diversity audit — per (event_type,
    //    day) quasi-identifier group sizes + sensitive-value diversity ────
    "q_k_anonymity" -> ((s, dir) =>
      Analytics.kAnonymity(
        t(s, dir, "events").withColumn("day",
          expr("(unix_micros(ts) - pmod(unix_micros(ts), 86400000000)) " +
            "div 86400000000")),
        Seq("event_type", "day"), "user_id", k = 5, l = 2)
        .orderBy("event_type", "day")),

    // ── §2.9 X99: t-closeness audit — per-group sensitive-distribution
    //    TVD vs global, exact integer mass over the common denominator ────
    "q_t_closeness" -> ((s, dir) =>
      Analytics.tCloseness(t(s, dir, "events"), Seq("event_type"), "user_id",
        t = 0.02)
        .orderBy("event_type")),

    // ── §2.9 X101: domain-mixture rebalance weights — per source, the
    //    char-weighted corpus share and the uniform-target sampling
    //    weight; exact integer counts, two pinned 6-dp divisions ──────────
    "q_domain_mix" -> ((s, dir) =>
      Analytics.domainMix(t(s, dir, "documents"), "source", "n_chars")
        .orderBy("domain")),

    // ── §2.9 X89: incremental aggregate maintenance — base state ⊎ delta
    //    state == full recompute (the oracle IS the full recompute) ───────
    "q_incremental_agg" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val base = Analytics.aggState(ev.where(col("event_id") % 10 < 8),
        Seq("user_id"), "value")
      val delta = Analytics.aggState(ev.where(col("event_id") % 10 >= 8),
        Seq("user_id"), "value")
      Analytics.mergeAggState(base, delta, Seq("user_id"))
        .select(col("user_id"), col("n").cast(LongType).as("n"),
          round(col("v").cast(DoubleType), 6).as("total"))
        .orderBy("user_id")
    }),

    // ── §2.9 X90: SCD type-2 apply — customer segment dimension folded
    //    with per-(customer, order-date) priority changes into the full
    //    validity-interval history ────────────────────────────────────────
    "q_scd2" -> ((s, dir) => {
      val base = t(s, dir, "customer").select(col("c_custkey").as("key"),
        col("c_mktsegment").as("attr"), lit("0000-00-00").as("valid_from"))
      val chg = t(s, dir, "orders").groupBy(col("o_custkey").as("key"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("valid_from"))
        .agg(min(col("o_orderpriority")).as("attr"))
      Analytics.scd2Apply(base, chg, "key", "attr", "valid_from")
        .orderBy("key", "valid_from")
    }),

    // ── §2.9 / SURVEY §2 layout: Z-order locality audit — per-curve-
    //    bucket 2-D bounding boxes proving BOTH dimensions stay narrow
    //    (the data-skipping property linear clustering lacks) ─────────────
    // ── §2.9 X100: Hilbert-curve layout audit — the locality-preserving
    //    sibling of the z-order audit, keyed by the native codegen
    //    graft_hilbert expression (consecutive cells always grid-adjacent,
    //    so 2-column range scans touch fewer clustered buckets) ───────────
    "q_hilbert_stats" -> ((s, dir) => {
      graft.GraftExtensions.ensure(s)
      val ev = t(s, dir, "events").select(
        pmod(col("event_id"), lit(4096)).cast(LongType).as("x"),
        pmod(col("user_id"), lit(4096)).cast(LongType).as("y"))
      ev.withColumn("h",
          call_function("graft_hilbert", col("x"), col("y"), lit(12)))
        .withColumn("bucket", shiftright(col("h"), 14).cast(LongType))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          min(col("x")).as("min_x"), max(col("x")).as("max_x"),
          min(col("y")).as("min_y"), max(col("y")).as("max_y"),
          min(col("h")).as("min_h"), max(col("h")).as("max_h"))
        .orderBy("bucket")
    }),

    "q_zorder_stats" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(
        pmod(col("event_id"), lit(4096)).cast(LongType).as("x"),
        pmod(col("user_id"), lit(4096)).cast(LongType).as("y"))
      ev.withColumn("z", graft.sources.Layout.zValue(col("x"), col("y"), 12))
        .withColumn("bucket", shiftright(col("z"), 14).cast(LongType))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          min(col("x")).as("min_x"), max(col("x")).as("max_x"),
          min(col("y")).as("min_y"), max(col("y")).as("max_y"),
          min(col("z")).as("min_z"), max(col("z")).as("max_z"))
        .orderBy("bucket")
    })
  )

  /** X120b/X124 share one oracle: the streaming ingest converges to the
    * one-shot append for corpus-known query terms (batch-split
    * invariance, spec-pinned). */
  private val oracleSqlTextAppend =
    """WITH tkarr AS (SELECT doc_id, doc_id % 2 = 0 AS is_base,
                regexp_split_to_array(trim(lower(text)), ' +') AS t
                      FROM documents),
       lens AS (SELECT doc_id, is_base, CAST(len(t) AS BIGINT) AS dl
                FROM tkarr),
       corp AS (SELECT count(*) AS nd, sum(dl) // count(*) AS avgdl
                FROM lens WHERE is_base),
       tk AS (SELECT doc_id, is_base, unnest(t) AS tok FROM tkarr),
       h AS (SELECT doc_id, is_base, tok, count(*) AS tf FROM tk
             WHERE tok IN ('spark', 'join', 'window') GROUP BY 1, 2, 3),
       dfb AS (SELECT tok, count(*) AS df FROM h WHERE is_base GROUP BY 1),
       dfd AS (SELECT tok, count(*) AS df FROM h WHERE NOT is_base
               GROUP BY 1),
       sc AS (SELECT h.doc_id,
                     CASE WHEN h.is_base THEN dfb.df
                          ELSE coalesce(dfb.df, dfd.df) END AS df,
                     lens.dl, h.tf
              FROM h JOIN lens ON lens.doc_id = h.doc_id
                     LEFT JOIN dfb ON dfb.tok = h.tok
                     LEFT JOIN dfd ON dfd.tok = h.tok),
       w AS (SELECT doc_id,
                    (greatest(corp.nd - df, 0) * 1000000) // (df + 1)
                      AS idf,
                    25 + (75 * ((dl * 100) // corp.avgdl)) // 100
                      AS inner_w,
                    tf
             FROM sc, corp),
       s AS (SELECT doc_id,
                    CAST(sum((idf * tf * 2200) //
                             (tf * 1000 + 12 * inner_w)) AS BIGINT)
                      AS score,
                    CAST(count(*) AS BIGINT) AS n_terms
             FROM w GROUP BY doc_id)
       SELECT doc_id, score, n_terms FROM s
       ORDER BY score DESC, doc_id LIMIT 20"""

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
         ORDER BY l_orderkey, l_linenumber, l_suppkey""",
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
    "q_stats_prune" ->
      """SELECT l_orderkey AS shard_id, mn AS min_value, mx AS max_value FROM (
           SELECT l_orderkey, strftime(min(l_shipdate), '%Y-%m-%d %H:%M:%S') mn,
                  strftime(max(l_shipdate), '%Y-%m-%d %H:%M:%S') mx
           FROM lineitem GROUP BY l_orderkey)
         WHERE mn <= '1995-09-01 00:00:00' AND mx >= '1995-06-01 00:00:00'
         ORDER BY shard_id""",
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
    // Layout-independent: the engine walks the directory tree, scans the
    // discovered splits per table, and reports row counts; the oracle
    // recomputes count(*) over the registered views. Green whether a
    // table is one fixture file or a GenData directory of part files —
    // and a part file the walk missed would flip the count.
    "q_file_listing" ->
      """SELECT table_name, CAST(n_rows AS BIGINT) AS n_rows FROM (
           SELECT 'customer' AS table_name, count(*) AS n_rows FROM customer
           UNION ALL SELECT 'documents', count(*) FROM documents
           UNION ALL SELECT 'embeddings', count(*) FROM embeddings
           UNION ALL SELECT 'events', count(*) FROM events
           UNION ALL SELECT 'lineitem', count(*) FROM lineitem
           UNION ALL SELECT 'nation', count(*) FROM nation
           UNION ALL SELECT 'orders', count(*) FROM orders
           UNION ALL SELECT 'part', count(*) FROM part
           UNION ALL SELECT 'region', count(*) FROM region
           UNION ALL SELECT 'supplier', count(*) FROM supplier
         ) ORDER BY table_name""",
    // graft_dot replayed as integer arithmetic over the same round(x*256)
    // quantization (exact — products ≤ 2^30, 64-deep sums ≤ 2^36);
    // graft_hilbert replayed as the 6-level unrolled xy2d walk (the same
    // MATERIALIZED-CTE discipline as q_hilbert_stats, here with ox
    // carrying vec_id so the walk joins back to its row)
    "q_sql_graft_fn" ->
      s"""WITH q AS MATERIALIZED (
           SELECT vec_id,
                  sum(CAST(round(CAST(embedding[i+1] AS DOUBLE) * 256) AS BIGINT)
                    * CAST(round(CAST(embedding[i+1] AS DOUBLE) * 256) AS BIGINT))
                    AS qnorm2
           FROM embeddings, unnest(range(0, len(embedding))) r(i)
           GROUP BY 1),
         h0 AS MATERIALIZED (
           SELECT vec_id AS ox, 0 AS oy,
                  vec_id % 64 AS x, label % 64 AS y, CAST(0 AS BIGINT) AS d
           FROM embeddings),
         ${(0 until 6).map(hilbertLevelSql(_, 6)).mkString(",\n         ")}
         SELECT q.vec_id, CAST(q.qnorm2 AS BIGINT) AS qnorm2,
                CAST(h6.d AS BIGINT) AS h
         FROM q JOIN h6 ON h6.ox = q.vec_id
         ORDER BY vec_id""",
    // the same text modulo dialect: the engine ranks and limits on the
    // exact integer rev before the single double finish, so the top-10
    // cut can never flip on a float ulp
    "q_sql_q3" ->
      """SELECT o_orderkey, o_orderpriority,
                CAST(CAST(rev AS DOUBLE) / 10000 AS DOUBLE) AS revenue,
                n_items
         FROM (
           SELECT o.o_orderkey, o.o_orderpriority,
                  sum(CAST(round(l.l_extendedprice * 100) AS DECIMAL(19,0)) *
                      CAST(round((1 - l.l_discount) * 100) AS DECIMAL(19,0)))
                    AS rev,
                  CAST(count(*) AS BIGINT) AS n_items
           FROM customer c
           JOIN orders o ON o.o_custkey = c.c_custkey
           JOIN lineitem l ON l.l_orderkey = o.o_orderkey
           WHERE c.c_mktsegment = 'BUILDING'
             AND o.o_orderdate < TIMESTAMP '1998-01-01'
             AND l.l_shipdate > TIMESTAMP '1998-01-01'
           GROUP BY o.o_orderkey, o.o_orderpriority
         )
         ORDER BY rev DESC, o_orderkey LIMIT 10""",
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
                count(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q_brand_volume" ->
      """SELECT p_brand,
                CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
                count(*) AS n_items
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_brand ORDER BY p_brand""",
    "q_dedup_exact" ->
      """SELECT md5(text) AS h, min(doc_id) AS keeper, count(*) AS n_dups
         FROM documents GROUP BY md5(text) ORDER BY h""",
    // Segment dedup: fixed-width token windows, global first occurrence
    // by (doc_id, seg_idx), reassembly = ordered string_agg of survivors
    // (NULL when everything was a duplicate — matched engine-side).
    "q_segment_dedup" ->
      """WITH tok AS (SELECT doc_id,
                             regexp_split_to_array(trim(lower(text)), ' +') toks
                      FROM documents),
         ix AS (SELECT doc_id, toks,
                       unnest(range(CAST((len(toks) + 7) // 8 AS BIGINT))) AS i
                FROM tok),
         seg AS (SELECT doc_id, i AS seg_idx,
                        array_to_string(toks[i*8+1 : i*8+8], ' ') AS seg
                 FROM ix),
         f AS (SELECT doc_id, seg_idx, seg,
                      row_number() OVER (PARTITION BY seg
                        ORDER BY doc_id, seg_idx) rn
               FROM seg)
         SELECT doc_id, count(*) AS n_segments,
                CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS kept_segments,
                md5(string_agg(seg, ' ' ORDER BY seg_idx)
                    FILTER (WHERE rn = 1)) AS text_hash,
                CAST(coalesce(len(string_agg(seg, ' ' ORDER BY seg_idx)
                    FILTER (WHERE rn = 1)), 0) AS BIGINT) AS out_chars
         FROM f GROUP BY doc_id ORDER BY doc_id""",
    // The shared text-grouped LSH chain (see lshCandSql: banded once per
    // DISTINCT text, doc pairs expanded from per-text doc lists — the
    // rewrite that keeps the oracle tractable inside the skewed-sf1
    // boilerplate clique).
    "q_dedup_minhash" ->
      s"""WITH $lshCandSql
         SELECT da, db FROM cand ORDER BY da, db""",
    // The q_dedup_verified CTE chain over the exact-dedup survivors, then
    // component labels via recursive CTE, then doc → keeper → canonical.
    "q_dedup_pipeline" ->
      """WITH RECURSIVE ex AS (SELECT md5(text) h, min(doc_id) keeper FROM documents GROUP BY 1),
         dk AS (SELECT d.doc_id, e.keeper FROM documents d JOIN ex e ON md5(d.text) = e.h),
         sv AS (SELECT doc_id, text FROM documents WHERE doc_id IN (SELECT keeper FROM ex)),
         toks AS MATERIALIZED (SELECT doc_id, regexp_split_to_array(trim(lower(text)), ' +') t FROM sv),
         tri AS MATERIALIZED (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
                 FROM toks, unnest(range(1, len(t)-1)) r(i)),
         mh AS MATERIALIZED (SELECT doc_id, k, min(md5(CAST(k AS VARCHAR) || '|' || sh)) m
                FROM tri, unnest(range(0,16)) kk(k) GROUP BY 1,2),
         sig AS MATERIALIZED (SELECT doc_id, list(m ORDER BY k) sig FROM mh GROUP BY 1),
         bands AS MATERIALIZED (SELECT doc_id, b,
                          md5(sig[4*b+1] || sig[4*b+2] || sig[4*b+3] || sig[4*b+4]) bh
                   FROM sig, unnest(range(0,4)) bb(b)),
         cand AS MATERIALIZED (SELECT DISTINCT a.doc_id da, c.doc_id db FROM bands a JOIN bands c
                  ON a.bh = c.bh AND a.b = c.b AND c.doc_id > a.doc_id),
         trif AS MATERIALIZED (SELECT * FROM tri WHERE sh IN (
                    SELECT sh FROM tri GROUP BY sh HAVING count(*) <= 100)),
         sz AS MATERIALIZED (SELECT doc_id, count(*) n FROM trif GROUP BY 1),
         inter AS MATERIALIZED (SELECT da, db, count(*) i FROM cand
                   JOIN trif a ON a.doc_id = da
                   JOIN trif c ON c.doc_id = db AND c.sh = a.sh
                   GROUP BY 1, 2),
         pairs AS (SELECT da, db FROM (
                     SELECT da, db, round(i / (sa.n + sb.n - i), 6) jaccard
                     FROM inter JOIN sz sa ON sa.doc_id = da JOIN sz sb ON sb.doc_id = db)
                   WHERE jaccard >= 0.3),
         e2 AS (SELECT da s, db d FROM pairs UNION ALL SELECT db, da FROM pairs),
         reach(n, l) AS (
           SELECT keeper, keeper FROM ex
           UNION
           SELECT e2.d, r.l FROM reach r JOIN e2 ON e2.s = r.n),
         comp AS (SELECT n, min(l) c FROM reach GROUP BY 1)
         SELECT dk.doc_id, comp.c AS canonical FROM dk
         JOIN comp ON dk.keeper = comp.n ORDER BY doc_id""",
    // Same LSH candidate CTEs as q_dedup_minhash (shared lshCandSql); the
    // component labels are reachability minima computed by a recursive
    // CTE at TEXT level (textCompSql — label sets stay linear in distinct
    // texts, where the per-doc spelling is quadratic in the clique).
    "q_dedup_components" ->
      s"""WITH RECURSIVE $lshCandSql,
         $textCompSql
         SELECT doc_id, c AS component FROM comp ORDER BY doc_id""",
    // the X1g recursive-CC chain composed with the X3 quality chain;
    // argmax on the ROUNDED quality with doc id tiebreak. CC at TEXT
    // level (shared lshCandSql + textCompSql).
    "q_canonical_docs" ->
      s"""WITH RECURSIVE $lshCandSql,
         $textCompSql,
         dcomp AS (SELECT doc_id, c AS component FROM comp),
         qq AS (SELECT doc_id, lower(text) t,
                       CAST(length(text) AS DOUBLE) len,
                       ' ' || lower(text) || ' ' p,
                       CAST(len(regexp_split_to_array(trim(lower(text)), ' +')) AS DOUBLE) ntok
                FROM documents),
         c2 AS (SELECT doc_id,
                 length(regexp_replace(t, '[^a-z]', '', 'g')) / len AS alpha,
                 (len - length(replace(t, ' ', ''))) / len AS space,
                 ((length(p)-length(replace(p,' the ','')))/5 + (length(p)-length(replace(p,' a ','')))/3
                  + (length(p)-length(replace(p,' of ','')))/4 + (length(p)-length(replace(p,' and ','')))/5) / ntok AS stop
                FROM qq),
         qs AS (SELECT doc_id,
                       round(alpha*0.5 + (1-space)*0.3 + least(stop*10, 1.0)*0.2, 6) AS quality
                FROM c2),
         j AS (SELECT dcomp.component, dcomp.doc_id, qs.quality
               FROM dcomp JOIN qs USING (doc_id)),
         rr AS (SELECT component, doc_id, quality,
                       row_number() OVER (PARTITION BY component
                         ORDER BY quality DESC, doc_id) rk,
                       count(*) OVER (PARTITION BY component) nm
                FROM j)
         SELECT component, doc_id AS keeper, CAST(nm AS BIGINT) n_members,
                quality AS best_quality
         FROM rr WHERE rk = 1 ORDER BY component""",
    // Same LSH candidate CTEs as q_dedup_minhash, plus bounded-prefix
    // Levenshtein verification (DuckDB's levenshtein = the classic DP).
    "q_edit_distance" ->
      """WITH toks AS MATERIALIZED (SELECT doc_id, regexp_split_to_array(trim(lower(text)), ' +') t
                       FROM documents),
         tri AS MATERIALIZED (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
                 FROM toks, unnest(range(1, len(t)-1)) r(i)),
         mh AS MATERIALIZED (SELECT doc_id, k, min(md5(CAST(k AS VARCHAR) || '|' || sh)) m
                FROM tri, unnest(range(0,16)) kk(k) GROUP BY 1,2),
         sig AS MATERIALIZED (SELECT doc_id, list(m ORDER BY k) sig FROM mh GROUP BY 1),
         bands AS MATERIALIZED (SELECT doc_id, b,
                          md5(sig[4*b+1] || sig[4*b+2] || sig[4*b+3] || sig[4*b+4]) bh
                   FROM sig, unnest(range(0,4)) bb(b)),
         cand AS MATERIALIZED (SELECT DISTINCT a.doc_id da, c.doc_id db FROM bands a JOIN bands c
                  ON a.bh = c.bh AND a.b = c.b AND c.doc_id > a.doc_id)
         SELECT da, db,
                CAST(levenshtein(substr(ta.text,1,80), substr(tb.text,1,80)) AS BIGINT) edit_dist
         FROM cand JOIN documents ta ON ta.doc_id = da
                   JOIN documents tb ON tb.doc_id = db
         WHERE levenshtein(substr(ta.text,1,80), substr(tb.text,1,80)) <= 40
         ORDER BY da, db""",
    "q_top_terms" ->
      """WITH tf AS (SELECT doc_id, tok, count(*) tf FROM (
                       SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), ' +')) tok
                       FROM documents) GROUP BY 1, 2),
         dfreq AS (SELECT tok, count(*) df FROM tf GROUP BY 1
                   HAVING count(*) <= 0.8 * (SELECT count(DISTINCT doc_id) FROM tf)),
         ranked AS (SELECT doc_id, tf.tok, tf.tf, dfreq.df,
                           row_number() OVER (PARTITION BY doc_id
                             ORDER BY tf.tf DESC, dfreq.df ASC, tf.tok ASC) rank
                    FROM tf JOIN dfreq ON tf.tok = dfreq.tok)
         SELECT doc_id, CAST(rank AS BIGINT) rank, tok, tf, df
         FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""",
    // Same construction: rank targets, prefix-sum offsets, top-surplus
    // shard choice, index-paired moves.
    "q_rebalance_plan" ->
      """WITH pl AS (SELECT o_orderkey AS shard_id,
                  o_custkey % 10 AS server FROM orders),
         c AS (SELECT server, count(*) cnt FROM pl GROUP BY 1),
         t AS (SELECT sum(cnt) nn, count(*) ss FROM c),
         r AS (SELECT server, cnt,
                  row_number() OVER (ORDER BY server) i FROM c),
         k AS (SELECT server, cnt, i,
                  (nn // ss) + (CASE WHEN i <= nn % ss THEN 1 ELSE 0 END)
                    AS target
               FROM r, t),
         d AS (SELECT server, cnt - target AS delta, i FROM k),
         g AS (SELECT server, delta,
                  coalesce(sum(delta) OVER (ORDER BY server
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS off
               FROM d WHERE delta > 0),
         tk AS (SELECT server AS to_server, -delta AS need,
                  coalesce(sum(-delta) OVER (ORDER BY server
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS off
                FROM d WHERE delta < 0),
         mv AS (SELECT pl.shard_id, pl.server AS from_server,
                  g.off + row_number() OVER (PARTITION BY pl.server
                    ORDER BY pl.shard_id DESC) AS idx,
                  g.delta,
                  row_number() OVER (PARTITION BY pl.server
                    ORDER BY pl.shard_id DESC) AS rr
                FROM pl JOIN g ON pl.server = g.server),
         mv2 AS (SELECT shard_id, from_server, idx FROM mv
                 WHERE rr <= delta),
         sl AS (SELECT to_server, off + j.j AS idx
                FROM tk, unnest(range(1, CAST(need AS BIGINT) + 1)) j(j))
         SELECT shard_id, from_server, to_server
         FROM mv2 JOIN sl USING (idx) ORDER BY shard_id""",
    // Same 52-bit draws mod (len+1); DuckDB substr mirrors Spark's
    // 1-based (pos, len) semantics.
    "q_fim_split" ->
      """WITH d AS (SELECT doc_id, text,
                  CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '|1'),
                    1, 13)) AS BIGINT) % (length(text) + 1) AS h1,
                  CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '|2'),
                    1, 13)) AS BIGINT) % (length(text) + 1) AS h2
           FROM documents),
         c AS (SELECT doc_id, text, least(h1, h2) c1, greatest(h1, h2) c2
               FROM d)
         SELECT doc_id,
                substr(text, 1, CAST(c1 AS INT)) AS prefix,
                substr(text, CAST(c1 AS INT) + 1, CAST(c2 - c1 AS INT))
                  AS middle,
                substr(text, CAST(c2 AS INT) + 1, length(text)) AS suffix
         FROM c ORDER BY doc_id""",
    // Same md5 mask rule, lag-based run starts, running sentinel count,
    // and ordered string_agg (NULL pieces skip on both engines).
    "q_span_corrupt" ->
      """WITH toks AS MATERIALIZED (SELECT doc_id,
                  regexp_split_to_array(trim(lower(text)), ' +') t
           FROM documents),
         p0 AS (SELECT doc_id, i, t[i+1] AS tok
                FROM toks, unnest(range(0, len(t))) r(i)
                WHERE length(t[i+1]) > 0),
         m AS (SELECT doc_id, i, tok,
                  (CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) ||
                    '|' || CAST(i AS VARCHAR)), 1, 13)) AS BIGINT) % 100)
                    < 15 AS mk
               FROM p0),
         r AS (SELECT doc_id, i, tok, mk,
                  mk AND NOT coalesce(lag(mk) OVER
                    (PARTITION BY doc_id ORDER BY i), FALSE) AS rs
               FROM m),
         s AS (SELECT doc_id, i, tok, mk, rs,
                  sum(CASE WHEN rs THEN 1 ELSE 0 END) OVER
                    (PARTITION BY doc_id ORDER BY i
                     ROWS UNBOUNDED PRECEDING) AS sid
               FROM r)
         SELECT doc_id,
                coalesce(string_agg(CASE WHEN NOT mk THEN tok
                    WHEN rs THEN '<X' || sid || '>' END, ' ' ORDER BY i), '')
                  AS input_text,
                coalesce(string_agg(CASE WHEN mk THEN
                    CASE WHEN rs THEN '<X' || sid || '> ' || tok
                         ELSE tok END END, ' ' ORDER BY i), '')
                  AS target_text,
                CAST(sum(CASE WHEN mk THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_masked,
                CAST(max(sid) AS BIGINT) AS n_spans
         FROM s GROUP BY doc_id ORDER BY doc_id""",
    // Same rank construction ('neg:' md5 order), same 52-bit draw and
    // step-past-anchor bijection.
    "q_negatives" ->
      """WITH r AS (SELECT doc_id,
                  row_number() OVER (
                    ORDER BY md5('neg:' || CAST(doc_id AS VARCHAR)), doc_id)
                    AS pos
           FROM documents),
         n AS (SELECT count(*) AS nn FROM r),
         p AS (SELECT r.doc_id AS anchor_id, r.pos AS ra, j.slot
               FROM r, n, unnest([1, 2]) j(slot) WHERE nn > 1),
         d AS (SELECT anchor_id, slot,
                  CAST(('0x' || substring(md5('neg|' ||
                    CAST(anchor_id AS VARCHAR) || '|' ||
                    CAST(slot AS VARCHAR)), 1, 13)) AS BIGINT) AS h,
                  ra
               FROM p),
         t AS (SELECT anchor_id, slot, ra,
                  (h % (nn - 1)) + 1 AS t0 FROM d, n),
         f AS (SELECT anchor_id, slot,
                  CASE WHEN t0 >= ra THEN t0 + 1 ELSE t0 END AS tt FROM t)
         SELECT anchor_id, CAST(slot AS BIGINT) AS slot, r.doc_id AS neg_id
         FROM f JOIN r ON r.pos = f.tt
         ORDER BY anchor_id, slot""",
    // Same (weight desc, key) order and integer cross-product boundary.
    "q_top_p_cut" ->
      """WITH r AS (SELECT doc_id, source, n_chars,
                  sum(n_chars) OVER (PARTITION BY source
                    ORDER BY n_chars DESC, doc_id
                    ROWS UNBOUNDED PRECEDING) cum_w,
                  sum(n_chars) OVER (PARTITION BY source) total_w
           FROM documents
           WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL)
         SELECT doc_id, source, n_chars, CAST(cum_w AS BIGINT) AS cum_w,
                CAST(total_w AS BIGINT) AS total_w
         FROM r WHERE (cum_w - n_chars) * 5 < total_w * 3
         ORDER BY source, cum_w, doc_id""",
    // Both engines round the same IEEE double v*127/mx; max-abs is an
    // order-independent fold. The double→DECIMAL cast goes THROUGH
    // VARCHAR: every DuckDB version renders the double's shortest
    // decimal repr (Double.toString semantics), which is what Spark's
    // Decimal(double) rounds — a direct double→DECIMAL cast rounds the
    // exact binary expansion in some engine versions (1-ulp drift).
    "q_quantize_int8" ->
      """WITH m AS (SELECT vec_id, embedding,
                  list_max(list_transform(embedding,
                    x -> abs(CAST(x AS DOUBLE)))) mx
           FROM embeddings WHERE vec_id < 50)
         SELECT vec_id, CAST(i AS BIGINT) AS dim,
                CASE WHEN mx = 0 THEN 0
                     ELSE CAST(round(CAST(embedding[i+1] AS DOUBLE) * 127 / mx)
                       AS BIGINT) END AS q,
                CAST(CAST(CAST(mx AS VARCHAR) AS DECIMAL(38,6)) AS VARCHAR)
                  AS scale
         FROM m, unnest(range(0, len(embedding))) r(i)
         ORDER BY vec_id, dim""",
    // Element-wise float→DECIMAL(38,6) casts, then exact decimal sums —
    // order-independent, so any partitioning agrees. double→DECIMAL goes
    // through VARCHAR (shortest-repr rounding, version-robust — see
    // q_quantize_int8).
    "q_class_centroids" ->
      """SELECT label, CAST(i AS BIGINT) AS dim,
                CAST(CAST(sum(CAST(CAST(CAST(embedding[i+1] AS DOUBLE)
                    AS VARCHAR) AS DECIMAL(38,6))) AS DECIMAL(38,6))
                  AS VARCHAR) AS s,
                CAST(count(*) AS BIGINT) AS n
         FROM embeddings, unnest(range(0, len(embedding))) r(i)
         GROUP BY 1, 2 ORDER BY label, dim""",
    // Same float→DOUBLE→DECIMAL chain as q_class_centroids; the product
    // is one IEEE double op so both engines hold the same dyadic, and
    // the VARCHAR hop pins shortest-repr rounding in every engine
    // version (see q_quantize_int8).
    // Integer power iteration replayed as 6 unrolled MATERIALIZED CTE
    // rounds over the same quantized integer Gram; HUGEINT carries the
    // products, `//` TRUNCATES toward zero (-7//2 = -3) exactly like the
    // engine's truncating BigInt `/` — do NOT change either side to a
    // flooring division, it diverges on negative components (see
    // powerIterRoundSql's docstring) — and the Rayleigh finish is one
    // correctly-rounded division + 6-dp round
    "q_power_iter" ->
      s"""WITH g AS MATERIALIZED (
           SELECT i, j,
                  sum(CAST(round(CAST(embedding[i+1] AS DOUBLE) * 256)
                        AS BIGINT)
                    * CAST(round(CAST(embedding[j+1] AS DOUBLE) * 256)
                        AS BIGINT)) AS g
           FROM embeddings,
                unnest(range(0, 64)) a(i), unnest(range(0, 64)) b(j)
           GROUP BY 1, 2),
         x0 AS (SELECT i AS d, CAST(1000000 + i AS HUGEINT) AS x
                FROM unnest(range(0, 64)) t(i)),
         ${(1 to 6).map(powerIterRoundSql).mkString(",\n         ")},
         num AS (SELECT sum(a.x * g.g * b.x) AS v
                 FROM g JOIN x6 a ON g.i = a.d JOIN x6 b ON g.j = b.d),
         den AS (SELECT sum(x * x) * 65536 AS v FROM x6)
         SELECT d, CAST(x AS BIGINT) AS x,
                CASE WHEN den.v = 0 THEN 0.0
                     ELSE round(CAST(num.v AS DOUBLE)
                                / CAST(den.v AS DOUBLE), 6) END AS eig
         FROM x6, num, den ORDER BY d""",
    // JL sign projection: the ±1 matrix is replayed from md5 PARITY of
    // "j_d" (first hex digit even -> +1), the same derivation the engine
    // bakes into plan literals; dyadic terms sum exactly in any order,
    // then one pinned /sqrt(8) + 6-dp round
    "q_jl_project" ->
      """WITH p AS (SELECT vec_id, j, d, CAST(embedding[d+1] AS DOUBLE) x
                    FROM embeddings,
                         unnest(range(0, 8)) jj(j),
                         unnest(range(0, 64)) dd(d)),
         s AS (SELECT vec_id, j,
                      sum(CASE WHEN (strpos('0123456789abcdef',
                             substr(md5(j || '_' || d), 1, 1)) - 1) % 2 = 0
                           THEN x ELSE -x END) AS t
               FROM p GROUP BY 1, 2)
         SELECT vec_id, CAST(j AS BIGINT) AS j,
                round(t / sqrt(8), 6) AS y
         FROM s ORDER BY vec_id, j""",
    "q_gram_matrix" ->
      """SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
                CAST(CAST(sum(CAST(CAST(CAST(embedding[i+1] AS DOUBLE)
                                 * CAST(embedding[j+1] AS DOUBLE) AS VARCHAR)
                          AS DECIMAL(38,12))) AS DECIMAL(38,12))
                  AS VARCHAR) AS s,
                CAST(count(*) AS BIGINT) AS n
         FROM embeddings,
              unnest(range(0, len(embedding))) r(i),
              unnest(range(0, len(embedding))) r2(j)
         WHERE j >= i
         GROUP BY 1, 2 ORDER BY i, j""",
    // Positional unnest(range) replays the hit positions; DuckDB slices
    // are 1-based inclusive and clamp at the ends like Spark's slice.
    "q_concordance" ->
      """WITH toks AS MATERIALIZED (SELECT doc_id,
                  regexp_split_to_array(trim(lower(text)), ' +') t
           FROM documents),
         hits AS (SELECT doc_id, i, t
                  FROM toks, unnest(range(0, len(t))) r(i)
                  WHERE t[i+1] = 'spark')
         SELECT doc_id, CAST(i AS BIGINT) AS pos,
                coalesce(array_to_string(t[greatest(1, i+1-3):i], ' '), '')
                  AS left_ctx,
                coalesce(array_to_string(t[i+2:i+1+3], ' '), '')
                  AS right_ctx
         FROM hits ORDER BY doc_id, pos LIMIT 200""",
    // Same vocab CTE as q_build_vocab (top-50 cut), positional explode
    // via unnest(range) (no WITH ORDINALITY in DuckDB 1.0), id order
    // restored by list(tid ORDER BY i).
    "q_encode_tokens" ->
      """WITH tok0 AS (SELECT doc_id,
                        unnest(regexp_split_to_array(trim(lower(text)), ' +'))
                          AS token
                      FROM documents),
         tokc AS (SELECT * FROM tok0 WHERE length(token) > 0),
         c AS (SELECT token, count(*) AS n, count(DISTINCT doc_id) AS df
               FROM tokc GROUP BY 1),
         f AS (SELECT * FROM c WHERE df >= 2),
         v AS (SELECT token,
                      row_number() OVER (ORDER BY n DESC, md5(token), token)
                        AS token_id
               FROM f QUALIFY token_id <= 50),
         toks AS MATERIALIZED (SELECT doc_id, regexp_split_to_array(trim(lower(text)), ' +') t
                  FROM documents),
         p AS (SELECT doc_id, i, t[i+1] AS token
               FROM toks, unnest(range(0, len(t))) r(i)
               WHERE length(t[i+1]) > 0),
         enc AS (SELECT doc_id, i, coalesce(v.token_id, 0) tid
                 FROM p LEFT JOIN v USING (token))
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                CAST(sum(CASE WHEN tid = 0 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_oov,
                array_to_string(list(tid ORDER BY i), ',') AS ids
         FROM enc GROUP BY doc_id ORDER BY doc_id""",
    // Same integer cross-multiplied rules; stopword hits via a list
    // lambda on the one token array (overlapping-regex-safe).
    "q_filter_reasons" ->
      """WITH b AS (SELECT doc_id, text,
                  regexp_split_to_array(trim(lower(text)), ' +') t
           FROM documents),
         m AS (SELECT doc_id,
                  CAST(len(t) AS BIGINT) nt,
                  CAST(len(list_distinct(t)) AS BIGINT) nd,
                  CAST(length(text) AS BIGINT) ln,
                  CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS BIGINT) alpha,
                  CAST(len(list_filter(t, x -> x IN ('the','a','of','and'))) AS BIGINT) stops
           FROM b)
         SELECT doc_id, nt AS n_tokens,
                CAST((CASE WHEN nt < 30 THEN 1 ELSE 0 END)
                   + (CASE WHEN ln > 900 THEN 2 ELSE 0 END)
                   + (CASE WHEN alpha * 100 < ln * 60 THEN 4 ELSE 0 END)
                   + (CASE WHEN (nt - nd) * 100 > nt * 50 THEN 8 ELSE 0 END)
                   + (CASE WHEN stops = 0 THEN 16 ELSE 0 END) AS BIGINT)
                  AS reasons,
                ((CASE WHEN nt < 30 THEN 1 ELSE 0 END)
                   + (CASE WHEN ln > 900 THEN 2 ELSE 0 END)
                   + (CASE WHEN alpha * 100 < ln * 60 THEN 4 ELSE 0 END)
                   + (CASE WHEN (nt - nd) * 100 > nt * 50 THEN 8 ELSE 0 END)
                   + (CASE WHEN stops = 0 THEN 16 ELSE 0 END)) = 0 AS kept
         FROM m ORDER BY doc_id""",
    // Same rank-capped collection; array_to_string(list_sort(...)) and
    // Spark's array_join(sort_array(...)) serialize identically, and
    // coalesce('') matches Spark's empty-list join.
    "q_dedup_provenance" ->
      """WITH g AS (SELECT md5(text) h, doc_id, source,
               row_number() OVER (PARTITION BY md5(text)
                 ORDER BY doc_id) rnk
           FROM documents)
         SELECT min(doc_id) AS doc_id,
                CAST(count(*) - 1 AS BIGINT) AS n_dups,
                coalesce(array_to_string(list_sort(list(doc_id)
                  FILTER (rnk BETWEEN 2 AND 101)), ','), '') AS removed_ids,
                CAST(count(DISTINCT source) AS BIGINT) AS n_sources
         FROM g GROUP BY h ORDER BY doc_id""",
    // The same (value, md5(key), key) total order drives row_number, so
    // the integer bucket assignment replays exactly.
    "q_equidepth" ->
      """WITH r AS (SELECT n_chars v,
                  row_number() OVER (ORDER BY n_chars,
                    md5(CAST(doc_id AS VARCHAR)), doc_id) rnk
           FROM documents
           WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL),
         t AS (SELECT count(*) n FROM r)
         SELECT ((rnk - 1) * 8) // n AS bucket,
                count(*) AS n_rows, min(v) AS lo, max(v) AS hi
         FROM r, t GROUP BY 1 ORDER BY bucket""",
    // Same histogram algebra: the join size is computed from per-key
    // counts, never by materializing the join. The per-key product runs
    // as DECIMAL(19,0)×DECIMAL(19,0) (width-stable: 19+19 ≤ 38, so no
    // engine-specific promotion/DOUBLE-fallback of an over-wide
    // DECIMAL(38,0)×BIGINT product), then one cast to the declared
    // DECIMAL(38,0). `top` is LEFT-joined so disjoint key sets still
    // report one row with NULL top_key, matching the engine.
    "q_join_estimate" ->
      """WITH ca AS (SELECT l_orderkey k, count(*) na FROM lineitem
                     WHERE l_orderkey IS NOT NULL GROUP BY 1),
         cb AS (SELECT o_orderkey k, count(*) nb FROM orders
                WHERE o_orderkey IS NOT NULL GROUP BY 1),
         j AS (SELECT ca.k,
                      CAST(CAST(na AS DECIMAL(19,0)) * CAST(nb AS DECIMAL(19,0))
                        AS DECIMAL(38,0)) AS prod
               FROM ca JOIN cb USING (k)),
         sa AS (SELECT count(*) n_keys_a, max(na) max_mult_a FROM ca),
         sb AS (SELECT count(*) n_keys_b, max(nb) max_mult_b FROM cb),
         sj AS (SELECT count(*) n_common,
                       CAST(CAST(coalesce(sum(prod), 0) AS DECIMAL(38,0))
                         AS VARCHAR) join_rows
                FROM j),
         top AS (SELECT CAST(k AS VARCHAR) top_key,
                        CAST(prod AS VARCHAR) top_rows
                 FROM j ORDER BY prod DESC, k LIMIT 1)
         SELECT * FROM sa CROSS JOIN sb CROSS JOIN sj
                   LEFT JOIN top ON TRUE""",
    // Same construction, same stage order; DuckDB counts via
    // len(regexp_extract_all) on the PREVIOUS stage's replacement, so the
    // two engines audit byte-identical intermediate texts.
    "q_pii_audit" ->
      """WITH txt AS (
           SELECT user_id AS doc_id,
                  'contact u' || user_id || '@ex.com or (' ||
                  lpad(CAST(user_id % 800 + 100 AS VARCHAR), 3, '0') ||
                  ') 555-' ||
                  lpad(CAST(user_id % 10000 AS VARCHAR), 4, '0') ||
                  CASE WHEN user_id % 3 = 0 THEN ' ssn 123-45-6789'
                       ELSE '' END ||
                  ' ip 10.0.0.' || CAST(user_id % 256 AS VARCHAR) AS t0
           FROM (SELECT DISTINCT user_id FROM events)),
         s1 AS (SELECT doc_id,
                  len(regexp_extract_all(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) n_email,
                  regexp_replace(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') t1
                FROM txt),
         s2 AS (SELECT doc_id, n_email,
                  len(regexp_extract_all(t1, '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b')) n_ssn,
                  regexp_replace(t1, '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '<SSN>', 'g') t2
                FROM s1),
         s3 AS (SELECT doc_id, n_email, n_ssn,
                  len(regexp_extract_all(t2, '(\+[0-9]{1,2}[ .-])?(\([0-9]{3}\)|\b[0-9]{3})[ .-][0-9]{3}[ .-][0-9]{4}\b')) n_phone,
                  regexp_replace(t2, '(\+[0-9]{1,2}[ .-])?(\([0-9]{3}\)|\b[0-9]{3})[ .-][0-9]{3}[ .-][0-9]{4}\b', '<PHONE>', 'g') t3
                FROM s2),
         s4 AS (SELECT doc_id, n_email, n_ssn, n_phone,
                  len(regexp_extract_all(t3, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) n_ip,
                  regexp_replace(t3, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g') t4
                FROM s3)
         SELECT doc_id, CAST(n_email AS BIGINT) AS n_email,
                CAST(n_ssn AS BIGINT) AS n_ssn,
                CAST(n_phone AS BIGINT) AS n_phone,
                CAST(n_ip AS BIGINT) AS n_ip, t4 AS redacted
         FROM s4 ORDER BY doc_id""",
    // Integer epoch-day RANGE frame replays exactly; DECIMAL(38,6) sums
    // are order-independent so the window accumulation cannot drift.
    // double→DECIMAL goes through VARCHAR (shortest-repr rounding,
    // version-robust — see q_quantize_int8); `//` is floor division,
    // matching the engine's pmod-based floor day bucketing.
    "q_trailing_7d" ->
      """WITH daily AS (
           SELECT user_id, epoch_us(ts) // 86400000000 AS day,
                  count(*) AS n,
                  sum(CAST(CAST(value AS VARCHAR) AS DECIMAL(38,6))) AS v
           FROM events GROUP BY 1, 2)
         SELECT user_id, day,
                CAST(sum(n) OVER w AS BIGINT) AS trail_n,
                CAST(CAST(sum(v) OVER w AS DECIMAL(38,6)) AS VARCHAR)
                  AS trail_v
         FROM daily
         WINDOW w AS (PARTITION BY user_id ORDER BY day
                      RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
         ORDER BY user_id, day""",
    // Same blocking → scoring → resolution stages; list_intersect and
    // array_intersect both return DISTINCT common elements, and DuckDB's
    // levenshtein is the same classic DP as Spark's codegen one.
    "q_record_linkage" ->
      """WITH lt AS (SELECT p_partkey id, trim(lower(p_name)) nm
                     FROM part WHERE p_partkey < 100),
         rt AS (SELECT p_partkey id, trim(lower(p_name)) nm FROM part),
         ltok AS (SELECT DISTINCT id, unnest(regexp_split_to_array(nm, ' +')) tok
                  FROM lt),
         rtok AS (SELECT DISTINCT id, unnest(regexp_split_to_array(nm, ' +')) tok
                  FROM rt),
         cand AS MATERIALIZED (SELECT DISTINCT a.id da, b.id db
                  FROM ltok a JOIN rtok b USING (tok) WHERE a.id <> b.id),
         scored AS (SELECT da, db,
             len(list_intersect(regexp_split_to_array(la.nm, ' +'),
                                regexp_split_to_array(lb.nm, ' +'))) shared,
             levenshtein(la.nm, lb.nm) ed
           FROM cand JOIN lt la ON la.id = da JOIN rt lb ON lb.id = db),
         best AS (SELECT da, db, shared, ed,
             row_number() OVER (PARTITION BY da
               ORDER BY ed, shared DESC, db) rk
           FROM scored)
         SELECT da, db, CAST(shared AS BIGINT) AS shared,
                CAST(ed AS BIGINT) AS edit_dist
         FROM best WHERE rk = 1 ORDER BY da""",
    // Same pipeline, DuckDB's nfc_normalize in place of graft_nfc; the
    // regex classes are the Java∩RE2 intersection so both engines agree.
    "q_clean_text" ->
      """WITH c AS (
           SELECT doc_id,
                  trim(regexp_replace(regexp_replace(nfc_normalize(text),
                    '[\x00-\x08\x0b\x0e-\x1f\x7f]', '', 'g'),
                    '[ \t\n\f\r]+', ' ', 'g')) AS clean_text,
                  length(text) AS n0
           FROM documents)
         SELECT doc_id, clean_text,
                CAST(n0 - length(clean_text) AS BIGINT) AS n_removed
         FROM c ORDER BY doc_id""",
    // Per-type min/max rendering matches the engine: integrals verbatim,
    // doubles via DECIMAL(38,6) fixed-point, timestamps as epoch µs.
    "q_profile" ->
      """WITH p AS (
           SELECT 'l_orderkey' AS col_name, count(*) AS n_rows,
                  count(l_orderkey) AS n_nonnull,
                  count(DISTINCT l_orderkey) AS n_distinct,
                  CAST(min(l_orderkey) AS VARCHAR) AS min_v,
                  CAST(max(l_orderkey) AS VARCHAR) AS max_v
           FROM lineitem
           UNION ALL
           SELECT 'l_quantity', count(*), count(l_quantity),
                  count(DISTINCT l_quantity),
                  CAST(CAST(min(l_quantity) AS DECIMAL(38,6)) AS VARCHAR),
                  CAST(CAST(max(l_quantity) AS DECIMAL(38,6)) AS VARCHAR)
           FROM lineitem
           UNION ALL
           SELECT 'l_returnflag', count(*), count(l_returnflag),
                  count(DISTINCT l_returnflag),
                  min(l_returnflag), max(l_returnflag)
           FROM lineitem
           UNION ALL
           SELECT 'l_shipdate', count(*), count(l_shipdate),
                  count(DISTINCT l_shipdate),
                  CAST(epoch_us(min(l_shipdate)) AS VARCHAR),
                  CAST(epoch_us(max(l_shipdate)) AS VARCHAR)
           FROM lineitem)
         SELECT * FROM p ORDER BY col_name""",
    // Same integer-weight construction as the engine: tf · least(N//df,
    // 1024) with a 0.5·N df cap; the cosine-≥½ cut replays as exact
    // integer cross-multiplication (DuckDB sums promote to hugeint).
    "q_sparse_cosine" ->
      """WITH tf AS (SELECT doc_id, tok, count(*) tf FROM (
                       SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), ' +')) tok
                       FROM documents) WHERE length(tok) > 0 GROUP BY 1, 2),
         n AS (SELECT count(DISTINCT doc_id) nd FROM tf),
         dfreq AS (SELECT tok, count(*) df FROM tf GROUP BY 1),
         w AS (SELECT doc_id, tok, tf * least(nd // df, 1024) AS w
               FROM tf JOIN dfreq USING (tok) CROSS JOIN n
               WHERE df <= nd * 0.1),
         norm AS (SELECT doc_id, sum(w*w) n2 FROM w GROUP BY 1),
         dots AS (SELECT a.doc_id da, b.doc_id db, sum(a.w*b.w) dot
                  FROM w a JOIN w b ON a.tok = b.tok AND b.doc_id > a.doc_id
                  GROUP BY 1, 2)
         SELECT da, db, CAST(dot AS BIGINT) AS dot,
                CAST(na.n2 AS BIGINT) AS na2, CAST(nb.n2 AS BIGINT) AS nb2
         FROM dots JOIN norm na ON na.doc_id = da
                   JOIN norm nb ON nb.doc_id = db
         WHERE 4*dot*dot >= na.n2 * nb.n2
         ORDER BY da, db""",
    // Exact top-k token counts under a total (n DESC, token ASC) order.
    // The CMS cross-check (estimate ∈ [true, true + ceil(eps·N)]) is a
    // PROBABILISTIC guarantee (≥ confidence per query), so it is a
    // spec-asserted engine diagnostic, not part of the hashed contract —
    // same policy as q_ann_*'s recall accounting.
    "q_heavy_hitters" ->
      """WITH tok AS (SELECT unnest(regexp_split_to_array(trim(lower(text)), ' +')) AS token
                      FROM documents)
         SELECT token, CAST(count(*) AS BIGINT) AS n
         FROM tok WHERE length(token) > 0
         GROUP BY token ORDER BY n DESC, token LIMIT 25""",
    "q_token_rarity" ->
      """WITH dt AS (SELECT DISTINCT doc_id, tok FROM (
                       SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), ' +')) tok
                       FROM documents)),
         dfreq AS (SELECT tok, count(*) df FROM dt GROUP BY 1)
         SELECT doc_id, CAST(count(*) AS BIGINT) n_distinct,
                CAST(min(df) AS BIGINT) min_df, CAST(sum(df) AS BIGINT) sum_df
         FROM dt JOIN dfreq USING (tok)
         GROUP BY doc_id ORDER BY doc_id""",
    // Distinct (source, token) vocabularies; inner pair join, so pairs
    // with empty intersection are absent on both engines.
    "q_vocab_overlap" ->
      """WITH v AS (SELECT DISTINCT source, tok FROM (
                      SELECT source, unnest(regexp_split_to_array(trim(lower(text)), ' +')) tok
                      FROM documents)
                    WHERE length(tok) > 0),
         n AS (SELECT source, count(*) nv FROM v GROUP BY 1)
         SELECT a.source AS source_a, b.source AS source_b,
                CAST(count(*) AS BIGINT) AS inter,
                CAST(min(na.nv) AS BIGINT) AS n_a,
                CAST(min(nb.nv) AS BIGINT) AS n_b
         FROM v a JOIN v b ON a.tok = b.tok AND a.source < b.source
         JOIN n na ON na.source = a.source
         JOIN n nb ON nb.source = b.source
         GROUP BY 1, 2 ORDER BY source_a, source_b""",
    // √-temperature mixture: integer-exact budget apportionment
    // (floor(sqrt(cnt)*2^20) weights, largest-remainder), then the same
    // 52-bit md5 order sampling per stratum.
    "q_sqrt_mixture" ->
      """WITH c AS (SELECT lang, count(*) cnt FROM documents
               WHERE lang IS NOT NULL AND doc_id IS NOT NULL GROUP BY 1),
         w AS (SELECT lang,
                      CAST(floor(sqrt(CAST(cnt AS DOUBLE)) * 1048576) AS BIGINT) wt
               FROM c),
         t AS (SELECT sum(wt) tw FROM w),
         q AS (SELECT lang, (100 * wt) // tw AS base, (100 * wt) % tw AS rem
               FROM w, t),
         l AS (SELECT 100 - sum(base) AS leftover FROM q),
         r AS (SELECT lang, base,
                      row_number() OVER (ORDER BY rem DESC, lang) rk
               FROM q),
         b AS (SELECT lang,
                      base + CASE WHEN rk <= (SELECT leftover FROM l)
                                  THEN 1 ELSE 0 END AS budget
               FROM r),
         h AS (SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) m FROM documents
               WHERE lang IS NOT NULL AND doc_id IS NOT NULL),
         v AS (SELECT doc_id, lang,
                 ((strpos('0123456789abcdef', substr(m,1,1))-1) * 281474976710656
                + (strpos('0123456789abcdef', substr(m,2,1))-1) * 17592186044416
                + (strpos('0123456789abcdef', substr(m,3,1))-1) * 1099511627776
                + (strpos('0123456789abcdef', substr(m,4,1))-1) * 68719476736
                + (strpos('0123456789abcdef', substr(m,5,1))-1) * 4294967296
                + (strpos('0123456789abcdef', substr(m,6,1))-1) * 268435456
                + (strpos('0123456789abcdef', substr(m,7,1))-1) * 16777216
                + (strpos('0123456789abcdef', substr(m,8,1))-1) * 1048576
                + (strpos('0123456789abcdef', substr(m,9,1))-1) * 65536
                + (strpos('0123456789abcdef', substr(m,10,1))-1) * 4096
                + (strpos('0123456789abcdef', substr(m,11,1))-1) * 256
                + (strpos('0123456789abcdef', substr(m,12,1))-1) * 16
                + (strpos('0123456789abcdef', substr(m,13,1))-1)) u
               FROM h),
         p AS (SELECT doc_id, lang,
                      row_number() OVER (PARTITION BY lang ORDER BY u, doc_id) rn
               FROM v)
         SELECT p.doc_id, p.lang FROM p JOIN b USING (lang)
         WHERE rn <= budget ORDER BY doc_id""",
    // Sequential Poisson order sampling: u = integer of the first 13 md5
    // hex digits (52 bits — exact in binary64), priority = u / weight
    // (one IEEE-exact division), n smallest kept with key tiebreak.
    "q_weighted_sample" ->
      """WITH h AS (SELECT doc_id, lang, n_chars,
                           md5(CAST(doc_id AS VARCHAR)) m
                    FROM documents
                    WHERE n_chars > 0 AND doc_id IS NOT NULL),
         v AS (SELECT doc_id, lang, n_chars,
                 ((strpos('0123456789abcdef', substr(m,1,1))-1) * 281474976710656
                + (strpos('0123456789abcdef', substr(m,2,1))-1) * 17592186044416
                + (strpos('0123456789abcdef', substr(m,3,1))-1) * 1099511627776
                + (strpos('0123456789abcdef', substr(m,4,1))-1) * 68719476736
                + (strpos('0123456789abcdef', substr(m,5,1))-1) * 4294967296
                + (strpos('0123456789abcdef', substr(m,6,1))-1) * 268435456
                + (strpos('0123456789abcdef', substr(m,7,1))-1) * 16777216
                + (strpos('0123456789abcdef', substr(m,8,1))-1) * 1048576
                + (strpos('0123456789abcdef', substr(m,9,1))-1) * 65536
                + (strpos('0123456789abcdef', substr(m,10,1))-1) * 4096
                + (strpos('0123456789abcdef', substr(m,11,1))-1) * 256
                + (strpos('0123456789abcdef', substr(m,12,1))-1) * 16
                + (strpos('0123456789abcdef', substr(m,13,1))-1)) u
               FROM h),
         s AS (SELECT doc_id, lang, n_chars FROM v
               ORDER BY CAST(u AS DOUBLE) / CAST(n_chars AS DOUBLE), doc_id
               LIMIT 100)
         SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
         FROM s ORDER BY doc_id""",
    // 32-bit value of the first 8 md5 hex digits, mod 100 — the engine's
    // conv(substr(md5,1,8),16,10) spelled as positional digit arithmetic.
    "q_hash_sample" ->
      """WITH h AS (SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) m FROM documents),
         v AS (SELECT doc_id, lang,
                 ((strpos('0123456789abcdef', substr(m,1,1))-1) * 268435456
                + (strpos('0123456789abcdef', substr(m,2,1))-1) * 16777216
                + (strpos('0123456789abcdef', substr(m,3,1))-1) * 1048576
                + (strpos('0123456789abcdef', substr(m,4,1))-1) * 65536
                + (strpos('0123456789abcdef', substr(m,5,1))-1) * 4096
                + (strpos('0123456789abcdef', substr(m,6,1))-1) * 256
                + (strpos('0123456789abcdef', substr(m,7,1))-1) * 16
                + (strpos('0123456789abcdef', substr(m,8,1))-1)) % 100 AS bucket
               FROM h)
         SELECT doc_id, lang FROM v WHERE bucket < 10 ORDER BY doc_id""",
    // Corpus snapshot diff: md5 content comparison over a full outer
    // id join; unchanged rows excluded (churn-sized output).
    "q_corpus_diff" ->
      s"""WITH d AS (SELECT doc_id, text,
                       ${bucketSql("CAST(doc_id AS VARCHAR)")} AS b
                     FROM documents),
         o AS (SELECT doc_id, md5(text) AS old_hash FROM d WHERE b < 90),
         n AS (SELECT doc_id,
                      md5(CASE WHEN b >= 40 AND b < 50 THEN text || ' v2'
                               ELSE text END) AS new_hash
               FROM d WHERE b >= 10),
         j AS (SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
                      old_hash, new_hash,
                      CASE WHEN old_hash IS NULL THEN 'added'
                           WHEN new_hash IS NULL THEN 'removed'
                           WHEN old_hash <> new_hash THEN 'changed'
                           ELSE 'unchanged' END AS status
               FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
         SELECT doc_id, status, old_hash, new_hash FROM j
         WHERE status <> 'unchanged' ORDER BY doc_id""",
    // Source-distribution L1: exact HUGEINT cross-multiplied numerator
    // (≡ Spark's DECIMAL(38,0)); the only double is the final pinned
    // num/(2·na·nb) division, rounded 6 identically in both engines.
    "q_source_drift" ->
      """WITH tk AS (SELECT source AS g,
                unnest(regexp_split_to_array(trim(lower(text)), ' +')) AS tok
             FROM documents),
         tk2 AS (SELECT g, tok FROM tk WHERE tok <> ''),
         c AS MATERIALIZED (SELECT g, tok, count(*) AS c
              FROM tk2 GROUP BY 1, 2),
         t AS MATERIALIZED (SELECT g, sum(c) AS n FROM c GROUP BY 1),
         sh AS (SELECT a.g AS src_a, b.g AS src_b,
                 sum(abs(CAST(a.c AS HUGEINT) * CAST(tb.n AS HUGEINT)
                       - CAST(b.c AS HUGEINT) * CAST(ta.n AS HUGEINT))
                   - CAST(a.c AS HUGEINT) * CAST(tb.n AS HUGEINT)
                   - CAST(b.c AS HUGEINT) * CAST(ta.n AS HUGEINT)) AS s_both
                FROM c a JOIN c b ON a.tok = b.tok AND a.g < b.g
                JOIN t ta ON ta.g = a.g
                JOIN t tb ON tb.g = b.g
                GROUP BY 1, 2),
         p AS (SELECT ta.g AS src_a, tb.g AS src_b,
                      CAST(ta.n AS HUGEINT) AS na, CAST(tb.n AS HUGEINT) AS nb
               FROM t ta JOIN t tb ON ta.g < tb.g)
         SELECT p.src_a, p.src_b,
                CAST(coalesce(sh.s_both, 0) + 2 * p.na * p.nb AS VARCHAR)
                  AS l1_num,
                round(CAST(coalesce(sh.s_both, 0) + 2 * p.na * p.nb AS DOUBLE)
                      / CAST(2 * p.na * p.nb AS DOUBLE), 6) AS drift
         FROM p LEFT JOIN sh USING (src_a, src_b)
         ORDER BY src_a, src_b""",
    // Temporal embargo split: pure timestamp comparisons against literal
    // bounds + one per-entity boolean aggregation — deterministic in any
    // engine.
    "q_temporal_split" ->
      """WITH r AS (SELECT event_id AS id, user_id AS entity,
                CASE WHEN ts < TIMESTAMP '2024-01-22 00:00:00' THEN 'train'
                     WHEN ts >= TIMESTAMP '2024-01-24 00:00:00' THEN 'test'
                     ELSE 'embargo' END AS split
             FROM events),
         a AS (SELECT entity,
                      (max(CASE WHEN split = 'train' THEN 1 ELSE 0 END) = 1
                   AND max(CASE WHEN split = 'test' THEN 1 ELSE 0 END) = 1
                   AND max(CASE WHEN split = 'embargo' THEN 1 ELSE 0 END) = 1)
                        AS gap_straddler
               FROM r GROUP BY entity)
         SELECT r.id, r.entity, r.split, a.gap_straddler
         FROM r JOIN a USING (entity) ORDER BY id""",
    "q_split_assign" ->
      """WITH v AS (SELECT doc_id, source,
                 ((strpos('0123456789abcdef', substr(md5(source),1,1))-1) * 268435456
                + (strpos('0123456789abcdef', substr(md5(source),2,1))-1) * 16777216
                + (strpos('0123456789abcdef', substr(md5(source),3,1))-1) * 1048576
                + (strpos('0123456789abcdef', substr(md5(source),4,1))-1) * 65536
                + (strpos('0123456789abcdef', substr(md5(source),5,1))-1) * 4096
                + (strpos('0123456789abcdef', substr(md5(source),6,1))-1) * 256
                + (strpos('0123456789abcdef', substr(md5(source),7,1))-1) * 16
                + (strpos('0123456789abcdef', substr(md5(source),8,1))-1)) % 100 AS bucket
               FROM documents)
         SELECT doc_id, source,
                CASE WHEN bucket < 80 THEN 'train'
                     WHEN bucket < 90 THEN 'valid'
                     WHEN bucket < 100 THEN 'test' END AS split
         FROM v ORDER BY doc_id""",
    // Domain capping: rank within source by the 52-bit md5 integer (key
    // tiebreak), keep rank <= cap — the engine's WindowGroupLimit plan
    // replayed as a plain ranking window.
    "q_cap_per_group" ->
      s"""WITH v AS (SELECT doc_id, source,
                       ${u52Sql("CAST(doc_id AS VARCHAR)")} u
                     FROM documents WHERE doc_id IS NOT NULL),
         r AS (SELECT doc_id, source,
                      row_number() OVER (PARTITION BY source ORDER BY u, doc_id) rn
               FROM v)
         SELECT doc_id, source FROM r WHERE rn <= 10 ORDER BY doc_id""",
    // Epoch expansion: repeats = floor(factor) + 1 extra when the md5
    // bucket (of 10 000) falls under the fractional basis points.
    "q_epoch_repeat" ->
      s"""WITH f AS (SELECT doc_id, source,
                       CASE WHEN source IN ('src0','src1') THEN 2.5
                            WHEN source IN ('src2','src3') THEN 0.4
                            ELSE 1.0 END AS factor
                     FROM documents WHERE doc_id IS NOT NULL),
         r AS (SELECT doc_id, source,
                      CAST(round(factor * 10000) AS BIGINT) AS bp
               FROM f WHERE factor > 0),
         e AS (SELECT doc_id, source,
                      bp // 10000
                      + CASE WHEN ${bucketSql("CAST(doc_id AS VARCHAR)", 10000)}
                               < bp % 10000 THEN 1 ELSE 0 END AS rep
               FROM r)
         SELECT doc_id, source, CAST(i AS BIGINT) AS epoch
         FROM e, unnest(range(1, rep + 1)) t(i)
         WHERE rep > 0 ORDER BY doc_id, epoch""",
    "q_dedup_simhash" ->
      """WITH tc AS (SELECT doc_id, tok, count(*) cnt FROM (
                       SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), ' +')) tok
                       FROM documents) GROUP BY 1,2),
         bits AS (SELECT doc_id, cnt, md5(tok) h, j FROM tc, unnest(range(0,64)) jj(j)),
         b2 AS (SELECT doc_id, j,
                  sum(cnt * (2 * (CAST(floor((strpos('0123456789abcdef',
                      substr(h, CAST(j//4 AS INT)+1, 1)) - 1) / pow(2, j%4)) AS BIGINT) % 2) - 1)) s
                FROM bits GROUP BY 1,2)
         SELECT doc_id, string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY j) simhash
         FROM b2 GROUP BY doc_id ORDER BY doc_id""",
    // The oracle verifies ALL pairs (the banded Spark plan is exact for
    // Hamming <= maxHamming by pigeonhole, so full-pairs replay matches).
    "q_simhash_pairs" ->
      """WITH tc AS (SELECT doc_id, tok, count(*) cnt FROM (
                       SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), ' +')) tok
                       FROM documents) GROUP BY 1,2),
         bits AS (SELECT doc_id, cnt, md5(tok) h, j FROM tc, unnest(range(0,64)) jj(j)),
         b2 AS (SELECT doc_id, j,
                  sum(cnt * (2 * (CAST(floor((strpos('0123456789abcdef',
                      substr(h, CAST(j//4 AS INT)+1, 1)) - 1) / pow(2, j%4)) AS BIGINT) % 2) - 1)) s
                FROM bits GROUP BY 1,2),
         ch AS MATERIALIZED (SELECT doc_id, j // 8 AS b,
                  CAST(sum(CASE WHEN s > 0 THEN CAST(pow(2, j % 8) AS BIGINT) ELSE 0 END) AS BIGINT) c
                FROM b2 GROUP BY 1, 2),
         -- banded candidates, not all pairs: hamming <= 7 over 8 byte
         -- bands pigeonholes at least one IDENTICAL band, so joining on
         -- (band, value) loses nothing and stays bucket-confined — the
         -- all-pairs spelling is corpus^2 and unrunnable at sf1 (50k docs
         -- -> 10^10 join rows spilled >76 GB before this rewrite).
         -- The full signature travels WITH each band row, packed into two
         -- 32-bit halves (one BIGINT would overflow SIGNED int64 at band
         -- 7), so hamming is one inline bit_count(xor) per matched row
         -- and the filter runs BEFORE the distinct: no join-back to ch
         -- (x8 band fanout) and no 10^8-row DISTINCT of an 8.6k-doc hot
         -- band bucket — the r10 sf1 probe caught the old spelling
         -- grinding >35 min at >100 GB; this one streams in ~47 s
         packed AS MATERIALIZED (
           SELECT doc_id,
                  CAST(sum(CASE WHEN b < 4
                       THEN c * CAST(pow(2, 8*b) AS BIGINT) ELSE 0 END)
                    AS BIGINT) lo,
                  CAST(sum(CASE WHEN b >= 4
                       THEN c * CAST(pow(2, 8*(b-4)) AS BIGINT) ELSE 0 END)
                    AS BIGINT) hi
           FROM ch GROUP BY 1),
         sig AS MATERIALIZED (
           SELECT ch.doc_id, ch.b, ch.c, packed.lo, packed.hi
           FROM ch JOIN packed USING (doc_id)),
         ham AS (SELECT DISTINCT a.doc_id da, c.doc_id db,
                        bit_count(xor(a.lo, c.lo)) + bit_count(xor(a.hi, c.hi)) hh
                 FROM sig a JOIN sig c ON a.b = c.b AND a.c = c.c
                   AND c.doc_id > a.doc_id
                 WHERE bit_count(xor(a.lo, c.lo)) + bit_count(xor(a.hi, c.hi)) <= 7)
         SELECT da, db, CAST(hh AS BIGINT) hamming FROM ham
         ORDER BY da, db""",
    "q_ngram_jaccard" ->
      """WITH toks AS MATERIALIZED (SELECT doc_id, regexp_split_to_array(trim(lower(text)), ' +') t
                       FROM documents),
         tri0 AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
                  FROM toks, unnest(range(1, len(t)-1)) r(i)),
         tri AS MATERIALIZED (SELECT * FROM tri0 WHERE sh IN (
                   SELECT sh FROM tri0 GROUP BY sh HAVING count(*) <= 100)),
         sz AS MATERIALIZED (SELECT doc_id, count(*) n FROM tri GROUP BY 1),
         inter AS MATERIALIZED (SELECT a.doc_id da, c.doc_id db, count(*) i
                   FROM tri a JOIN tri c ON a.sh = c.sh AND c.doc_id > a.doc_id
                   GROUP BY 1,2)
         SELECT da, db, jaccard FROM (
           SELECT da, db, round(i / (sa.n + sb.n - i), 6) jaccard
           FROM inter JOIN sz sa ON sa.doc_id = da JOIN sz sb ON sb.doc_id = db)
         WHERE jaccard >= 0.3 ORDER BY da, db""",
    // X130 prefix-filter join: EXACT by construction (the prefix prunes
    // candidates, never results), so the oracle is the full-self-join
    // exact Jaccard chain at the query's threshold — identical to
    // q_ngram_jaccard's with 0.4.
    "q_prefix_join" ->
      """WITH toks AS MATERIALIZED (SELECT doc_id, regexp_split_to_array(trim(lower(text)), ' +') t
                       FROM documents),
         tri0 AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
                  FROM toks, unnest(range(1, len(t)-1)) r(i)),
         tri AS MATERIALIZED (SELECT * FROM tri0 WHERE sh IN (
                   SELECT sh FROM tri0 GROUP BY sh HAVING count(*) <= 100)),
         sz AS MATERIALIZED (SELECT doc_id, count(*) n FROM tri GROUP BY 1),
         inter AS MATERIALIZED (SELECT a.doc_id da, c.doc_id db, count(*) i
                   FROM tri a JOIN tri c ON a.sh = c.sh AND c.doc_id > a.doc_id
                   GROUP BY 1,2)
         SELECT da, db, jaccard FROM (
           SELECT da, db, round(i / (sa.n + sb.n - i), 6) jaccard
           FROM inter JOIN sz sa ON sa.doc_id = da JOIN sz sb ON sb.doc_id = db)
         WHERE jaccard >= 0.4 ORDER BY da, db""",
    "q_dedup_verified" ->
      s"""WITH $verifiedPairsSql
         SELECT da, db, jaccard FROM vp ORDER BY da, db""",
    // X127 label propagation: 3 unrolled clamped-majority rounds over
    // the vp edge set — counts are integers, ties (count DESC, label),
    // seeds (doc_id % 3 = 0 → source) always win the coalesce; NULL
    // (unreached) labels filtered on both sides.
    "q_label_prop" ->
      s"""WITH $verifiedPairsSql,
         edges AS MATERIALIZED (SELECT da s, db d FROM vp
                  UNION ALL SELECT db s, da d FROM vp),
         nodes AS (SELECT DISTINCT s AS id FROM edges),
         lpseeds AS MATERIALIZED (SELECT doc_id AS id, source AS lab
                    FROM documents WHERE doc_id % 3 = 0),
         l0 AS MATERIALIZED (SELECT n.id, sd.lab
               FROM nodes n LEFT JOIN lpseeds sd USING (id)),
         ${labelPropRoundSql(1)},
         ${labelPropRoundSql(2)},
         ${labelPropRoundSql(3)}
         SELECT id AS doc_id, lab AS label FROM l3
         WHERE lab IS NOT NULL ORDER BY doc_id""",
    // Split-leakage audit: the verified near-dup pairs joined twice to
    // the source-bucket split assignment; pairs crossing splits leak.
    "q_split_leakage" ->
      s"""WITH $verifiedPairsSql,
         sp AS (SELECT doc_id,
                  CASE WHEN ${bucketSql("source")} < 80 THEN 'train'
                       WHEN ${bucketSql("source")} < 90 THEN 'valid'
                       WHEN ${bucketSql("source")} < 100 THEN 'test'
                  END AS split
                FROM documents)
         SELECT vp.da AS a, vp.db AS b,
                sa.split AS split_a, sb.split AS split_b
         FROM vp JOIN sp sa ON sa.doc_id = vp.da
                 JOIN sp sb ON sb.doc_id = vp.db
         WHERE sa.split <> sb.split ORDER BY a, b""",
    // Split bucket drawn from the CC component label (min reachable id,
    // the engine's converged CC labeling) instead of the per-doc group —
    // every near-dup pair shares a component, hence a split. Components
    // run at TEXT level (textCompSql) so the recursion stays linear in
    // distinct texts inside the skewed-sf1 clique.
    "q_leak_safe_split" ->
      s"""WITH RECURSIVE $lshCandSql,
         $textCompSql
         SELECT doc_id, CAST(c AS BIGINT) AS component,
                CASE WHEN ${bucketSql("CAST(c AS VARCHAR)")} < 80
                       THEN 'train'
                     WHEN ${bucketSql("CAST(c AS VARCHAR)")} < 90
                       THEN 'valid'
                     ELSE 'test' END AS split
         FROM comp ORDER BY doc_id""",
    // Verified near-dup pairs rolled up per unordered source pair
    "q_source_overlap" ->
      s"""WITH $verifiedPairsSql,
         j AS (SELECT least(a.source, b.source) AS source_a,
                      greatest(a.source, b.source) AS source_b
               FROM vp JOIN documents a ON a.doc_id = vp.da
                       JOIN documents b ON b.doc_id = vp.db)
         SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_pairs
         FROM j GROUP BY 1, 2 ORDER BY source_a, source_b""",
    "q_cosine_topk" ->
      """WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v,
                           sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                                 CAST(embedding AS DOUBLE[]))) nrm
                    FROM embeddings),
         s AS (SELECT p.vec_id pid, c.vec_id nid,
                      round(list_dot_product(p.v, c.v) / (p.nrm * c.nrm), 6) sim
               FROM n p, n c WHERE p.vec_id < 10 AND c.vec_id <> p.vec_id),
         r AS (SELECT pid, nid, sim,
                      row_number() OVER (PARTITION BY pid ORDER BY sim DESC, nid) rank
               FROM s)
         SELECT pid, rank, nid, sim FROM r WHERE rank <= 5 ORDER BY pid, rank""",
    "q_embed_neardup" ->
      """WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v,
                           sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                                 CAST(embedding AS DOUBLE[]))) nrm
                    FROM embeddings)
         SELECT p.vec_id da, c.vec_id db,
                round(list_dot_product(p.v, c.v) / (p.nrm * c.nrm), 6) sim
         FROM n p, n c WHERE p.vec_id < 100 AND c.vec_id > p.vec_id
           AND round(list_dot_product(p.v, c.v) / (p.nrm * c.nrm), 6) >= 0.35
         ORDER BY da, db""",
    // RRF hybrid: both legs are rank-exact (integer token overlap /
    // round-6 cosine with deterministic tiebreaks), and the fusion is
    // two double divisions + one add — identical IEEE in both engines
    "q_hybrid_search" ->
      """WITH tk AS (SELECT doc_id AS id,
                            unnest(list_distinct(regexp_split_to_array(
                              trim(lower(text)), ' +'))) AS tok
                     FROM documents),
         tk2 AS (SELECT id, tok FROM tk WHERE tok <> ''),
         p AS (SELECT id AS pid, tok FROM tk2 WHERE id < 10),
         ov AS (SELECT p.pid, t.id, count(*) AS n_shared
                FROM p JOIN tk2 t USING (tok) WHERE t.id <> p.pid
                GROUP BY 1, 2),
         lex AS (SELECT pid, id, lex_rank FROM (
                   SELECT pid, id, row_number() OVER (PARTITION BY pid
                     ORDER BY n_shared DESC, id) AS lex_rank FROM ov)
                 WHERE lex_rank <= 20),
         n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v,
                      sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                            CAST(embedding AS DOUBLE[]))) nrm
               FROM embeddings),
         s AS (SELECT p.vec_id pid, c.vec_id id,
                      round(list_dot_product(p.v, c.v) / (p.nrm * c.nrm), 6) sim
               FROM n p, n c WHERE p.vec_id < 10 AND c.vec_id <> p.vec_id),
         vec AS (SELECT pid, id, vec_rank FROM (
                   SELECT pid, id, row_number() OVER (PARTITION BY pid
                     ORDER BY sim DESC, id) AS vec_rank FROM s)
                 WHERE vec_rank <= 20),
         f AS (SELECT coalesce(lex.pid, vec.pid) AS pid,
                      coalesce(lex.id, vec.id) AS id,
                      round(coalesce(1.0 / (60 + lex.lex_rank), 0) +
                            coalesce(1.0 / (60 + vec.vec_rank), 0), 6) AS score
               FROM lex FULL JOIN vec
                 ON lex.pid = vec.pid AND lex.id = vec.id)
         SELECT pid, rank, id, score FROM (
           SELECT pid, id, score, row_number() OVER (PARTITION BY pid
             ORDER BY score DESC, id) AS rank FROM f)
         WHERE rank <= 10 ORDER BY pid, rank""",
    // kNN classification: probes (vec_id < 50) vs the labeled rest;
    // neighbor ties (sim DESC, nid), vote ties (votes DESC, best_rank,
    // label) — all integer-or-round-6, so both engines agree.
    "q_knn_classify" ->
      """WITH n AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
                           CAST(embedding AS DOUBLE[]) v,
                           sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                                 CAST(embedding AS DOUBLE[]))) nrm
                    FROM embeddings),
         s AS (SELECT p.vec_id pid, p.label true_label,
                      c.vec_id nid, c.label nlabel,
                      round(list_dot_product(p.v, c.v) / (p.nrm * c.nrm), 6) sim
               FROM n p, n c WHERE p.vec_id < 50 AND c.vec_id >= 50),
         r AS (SELECT pid, true_label, nid, nlabel, sim,
                      row_number() OVER (PARTITION BY pid
                        ORDER BY sim DESC, nid) rank
               FROM s),
         k AS (SELECT pid, true_label, nlabel, count(*) votes,
                      min(rank) best_rank
               FROM r WHERE rank <= 7 GROUP BY 1, 2, 3),
         v AS (SELECT pid, true_label, nlabel, votes,
                      row_number() OVER (PARTITION BY pid
                        ORDER BY votes DESC, best_rank, nlabel) vr
               FROM k)
         SELECT pid, nlabel AS pred_label, votes, true_label,
                (nlabel = true_label) AS correct
         FROM v WHERE vr = 1 ORDER BY pid""",
    // X134 kNN outlier: top-10 cosine neighbors per probe (self
    // excluded), kth = min kept sim, mean over exact 1e-6-unit sums.
    "q_knn_outlier" ->
      """WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v,
                           sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                                 CAST(embedding AS DOUBLE[]))) nrm
                    FROM embeddings),
         s AS (SELECT p.vec_id pid, c.vec_id nid,
                      round(list_dot_product(p.v, c.v) / (p.nrm * c.nrm), 6) sim
               FROM n p, n c
               WHERE p.vec_id < 60 AND c.vec_id <> p.vec_id),
         r AS (SELECT pid, nid, sim,
                      row_number() OVER (PARTITION BY pid
                        ORDER BY sim DESC, nid) rank
               FROM s)
         SELECT pid, count(*) AS n_neighbors, min(sim) AS kth_sim,
                round(CAST(sum(CAST(round(sim * 1000000) AS BIGINT))
                    AS DOUBLE) / (count(*) * 1000000), 6) AS mean_sim
         FROM r WHERE rank <= 10 GROUP BY pid ORDER BY pid""",
    // X136 triplet mining: top-20 candidates per anchor, best same-label
    // = positive, best different-label = hard negative, both required.
    "q_triplet_mine" ->
      """WITH n AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
                           CAST(embedding AS DOUBLE[]) v,
                           sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                                 CAST(embedding AS DOUBLE[]))) nrm
                    FROM embeddings),
         s AS (SELECT p.vec_id pid, p.label anchor_label,
                      c.vec_id nid, c.label nlabel,
                      round(list_dot_product(p.v, c.v) / (p.nrm * c.nrm), 6) sim
               FROM n p, n c
               WHERE p.vec_id < 50 AND c.vec_id <> p.vec_id),
         r AS (SELECT pid, anchor_label, nid, nlabel, sim,
                      row_number() OVER (PARTITION BY pid
                        ORDER BY sim DESC, nid) rank
               FROM s),
         k AS (SELECT * FROM r WHERE rank <= 20),
         pos AS (SELECT pid, anchor_label, nid AS pos_id, sim AS sim_pos,
                        row_number() OVER (PARTITION BY pid
                          ORDER BY sim DESC, nid) pr
                 FROM k WHERE nlabel = anchor_label),
         neg AS (SELECT pid, nid AS neg_id, sim AS sim_neg,
                        row_number() OVER (PARTITION BY pid
                          ORDER BY sim DESC, nid) nr
                 FROM k WHERE nlabel <> anchor_label)
         SELECT p.pid, p.anchor_label, p.pos_id, g.neg_id,
                p.sim_pos, g.sim_neg,
                round(p.sim_pos - g.sim_neg, 6) AS margin
         FROM pos p JOIN neg g USING (pid)
         WHERE p.pr = 1 AND g.nr = 1 ORDER BY p.pid""",
    // X137 water-filling: capped-prefix test avail·(n−i+1) ≤ B − P_{i−1}
    // under (avail ASC, group ASC), remainder largest-remainder split.
    "q_water_fill" ->
      """WITH c AS (SELECT source AS "group", count(*) AS avail
                    FROM documents WHERE source IS NOT NULL GROUP BY 1),
         f AS (SELECT "group", avail,
                      CAST(row_number() OVER w AS BIGINT) AS i,
                      coalesce(sum(avail) OVER (w ROWS BETWEEN UNBOUNDED
                        PRECEDING AND 1 PRECEDING), 0) AS p,
                      count(*) OVER () AS n
               FROM c WINDOW w AS (ORDER BY avail, "group")),
         g AS (SELECT *, (avail * (n - i + 1) <= 310 - p) AS capped
               FROM f),
         t AS (SELECT sum(CASE WHEN capped THEN 1 ELSE 0 END) AS k,
                      coalesce(sum(CASE WHEN capped THEN avail END), 0)
                        AS pk,
                      count(*) AS n2
               FROM g)
         SELECT "group", avail,
                CAST(CASE WHEN capped THEN avail
                     ELSE (310 - pk) // (n2 - k) +
                          (CASE WHEN i - k <= (310 - pk) % (n2 - k)
                            THEN 1 ELSE 0 END) END AS BIGINT) AS allocated
         FROM g, t ORDER BY "group"""",
    // Mutual kNN: top-5 within the vec_id<120 subset, pairs reciprocal
    // in both directions, a < b.
    "q_mutual_knn" ->
      """WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v,
                           sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                                 CAST(embedding AS DOUBLE[]))) nrm
                    FROM embeddings WHERE vec_id < 120),
         s AS (SELECT p.vec_id pid, c.vec_id nid,
                      round(list_dot_product(p.v, c.v) / (p.nrm * c.nrm), 6) sim
               FROM n p, n c WHERE c.vec_id <> p.vec_id),
         r AS (SELECT pid, nid, sim,
                      row_number() OVER (PARTITION BY pid
                        ORDER BY sim DESC, nid) rank
               FROM s),
         k AS (SELECT pid, nid, sim, rank FROM r WHERE rank <= 5)
         SELECT a.pid da, a.nid db, a.sim sim,
                a.rank rank_ab, b.rank rank_ba
         FROM k a JOIN k b ON a.pid = b.nid AND a.nid = b.pid
         WHERE a.pid < a.nid ORDER BY da, db""",
    // X125 bitext margin: sims are round-6; each id's kNN-sum is an
    // EXACT integer in 1e-6 units (round-then-cast — order-independent
    // in any engine), and the margin is one double division of those
    // two agreed operands, round-6. Sides = label parity; per source
    // row keep the best-margin target when margin > 1.
    "q_bitext_mine" ->
      """WITH n AS (SELECT vec_id, CAST(label AS BIGINT) % 2 AS side,
                           CAST(embedding AS DOUBLE[]) v,
                           sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                                 CAST(embedding AS DOUBLE[]))) nrm
                    FROM embeddings WHERE vec_id < 240),
         s AS (SELECT p.vec_id pid, c.vec_id nid, p.side pside,
                      round(list_dot_product(p.v, c.v) / (p.nrm * c.nrm), 6) sim
               FROM n p JOIN n c ON p.side <> c.side),
         r AS (SELECT pid, nid, sim, pside,
                      row_number() OVER (PARTITION BY pid
                        ORDER BY sim DESC, nid) rank
               FROM s),
         k AS (SELECT * FROM r WHERE rank <= 4),
         d AS (SELECT pid,
                      CAST(sum(CAST(round(sim * 1000000) AS BIGINT)) AS BIGINT) ds
               FROM k GROUP BY 1),
         f AS (SELECT k.pid, k.nid, k.sim,
                      round(k.sim / ((da.ds + db.ds) / 8000000.0), 6) margin
               FROM k JOIN d da ON da.pid = k.pid
                      JOIN d db ON db.pid = k.nid
               WHERE k.pside = 0),
         b AS (SELECT pid, nid, sim, margin,
                      row_number() OVER (PARTITION BY pid
                        ORDER BY margin DESC, nid) rr
               FROM f)
         SELECT pid AS src_id, nid AS tgt_id, sim, margin
         FROM b WHERE rr = 1 AND margin > 1.0 ORDER BY src_id""",
    // X128/X128b rank metrics: the system ranking is the int8 tier —
    // quantized dots are EXACT integers (so the double accumulation
    // agrees in any order), norms are IEEE sqrt of exact ints, sims
    // round-6; the metric arithmetic is integer sums joined to the
    // same literal discount table the engine embeds, then two round-6
    // divisions. Gold = the q_cosine_topk chain.
    "q_rank_metrics" ->
      """WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v,
                           sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                                 CAST(embedding AS DOUBLE[]))) nrm
                    FROM embeddings),
         gs AS (SELECT p.vec_id pid, c.vec_id nid,
                       round(list_dot_product(p.v, c.v) / (p.nrm * c.nrm), 6) sim
                FROM n p, n c WHERE p.vec_id < 10 AND c.vec_id <> p.vec_id),
         gold AS (SELECT pid, nid AS gnid, grank FROM (
                    SELECT pid, nid, row_number() OVER (PARTITION BY pid
                      ORDER BY sim DESC, nid) grank FROM gs) q
                  WHERE grank <= 5),
         qn AS (SELECT vec_id,
                       CASE WHEN mx = 0
                            THEN list_transform(embedding,
                              x -> CAST(0 AS BIGINT))
                            ELSE list_transform(embedding,
                              x -> CAST(round(CAST(x AS DOUBLE) * 127 / mx)
                                AS BIGINT)) END qv
                FROM (SELECT vec_id, embedding,
                             list_max(list_transform(embedding,
                               x -> abs(CAST(x AS DOUBLE)))) mx
                      FROM embeddings) m),
         qd AS (SELECT vec_id, CAST(qv AS DOUBLE[]) dv,
                       sqrt(list_dot_product(CAST(qv AS DOUBLE[]),
                                             CAST(qv AS DOUBLE[]))) qn
                FROM qn),
         ss AS (SELECT p.vec_id pid, c.vec_id nid,
                       round(list_dot_product(p.dv, c.dv)
                         / (p.qn * c.qn), 6) sim
                FROM qd p, qd c WHERE p.vec_id < 10
                  AND c.vec_id <> p.vec_id),
         sysk AS (SELECT pid, nid, rank FROM (
                    SELECT pid, nid, row_number() OVER (PARTITION BY pid
                      ORDER BY sim DESC, nid) rank FROM ss) q
                  WHERE rank <= 5),
         w(r, wt) AS (VALUES (1, 1000000), (2, 630930), (3, 500000),
                             (4, 430677), (5, 386853)),
         h AS (SELECT s.pid, s.rank, g.grank FROM sysk s
               LEFT JOIN gold g ON g.pid = s.pid AND g.gnid = s.nid),
         agg AS (SELECT h.pid,
                        CAST(sum(CASE WHEN h.grank IS NOT NULL
                          THEN w.wt ELSE 0 END) AS BIGINT) dcg,
                        CAST(count(h.grank) AS BIGINT) n_hits,
                        min(CASE WHEN h.grank = 1 THEN h.rank END) r1
                 FROM h JOIN w ON w.r = h.rank GROUP BY 1),
         ig AS (SELECT pid, CAST(sum(w.wt) AS BIGINT) idcg FROM gold
                JOIN w ON w.r = gold.grank GROUP BY 1)
         SELECT a.pid, a.n_hits,
                round(coalesce(1.0 / a.r1, 0), 6) AS mrr,
                round(CAST(a.dcg AS DOUBLE) / CAST(i.idcg AS DOUBLE), 6)
                  AS ndcg
         FROM agg a JOIN ig i ON i.pid = a.pid ORDER BY a.pid""",
    // X126 MMR: rel and pairwise sims are exact 1e-6 integers (round-
    // then-cast), the greedy is k unrolled argmax rounds with the
    // (score DESC, nid) tiebreak — pure integer comparisons, so the
    // chained CTEs replay the engine's selection order exactly.
    "q_mmr_diversify" ->
      """WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v,
                           sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                                 CAST(embedding AS DOUBLE[]))) nrm
                    FROM embeddings),
         s AS (SELECT p.vec_id pid, c.vec_id nid,
                      round(list_dot_product(p.v, c.v) / (p.nrm * c.nrm), 6) sim
               FROM n p, n c WHERE p.vec_id < 10 AND c.vec_id <> p.vec_id),
         r AS (SELECT pid, nid, sim,
                      row_number() OVER (PARTITION BY pid
                        ORDER BY sim DESC, nid) rank FROM s),
         cand AS (SELECT pid, nid, CAST(round(sim * 1000000) AS BIGINT) rel
                  FROM r WHERE rank <= 8),
         cv AS (SELECT c.pid, c.nid, n.v, n.nrm
                FROM cand c JOIN n ON n.vec_id = c.nid),
         ps AS (SELECT a.pid, a.nid AS ca, b.nid AS cb,
                       CAST(round(round(list_dot_product(a.v, b.v)
                         / (a.nrm * b.nrm), 6) * 1000000) AS BIGINT) s
                FROM cv a JOIN cv b ON a.pid = b.pid AND a.nid <> b.nid),
         p1 AS (SELECT pid, nid, rel, rel AS mmr FROM (
                  SELECT pid, nid, rel, row_number() OVER (PARTITION BY pid
                    ORDER BY rel DESC, nid) rr
                  FROM cand) q WHERE rr = 1),
         p2 AS (SELECT pid, nid, rel, mmr FROM (
                  SELECT c.pid, c.nid, c.rel, c.rel - ms.m AS mmr,
                         row_number() OVER (PARTITION BY c.pid
                           ORDER BY c.rel - ms.m DESC, c.nid) rr
                  FROM cand c
                  JOIN (SELECT ps.pid, ps.ca, max(ps.s) m FROM ps
                        JOIN p1 ON p1.pid = ps.pid AND p1.nid = ps.cb
                        GROUP BY 1, 2) ms
                    ON ms.pid = c.pid AND ms.ca = c.nid
                  WHERE NOT EXISTS (SELECT 1 FROM p1
                    WHERE p1.pid = c.pid AND p1.nid = c.nid)) q
                WHERE rr = 1),
         s2 AS (SELECT pid, nid FROM p1 UNION ALL SELECT pid, nid FROM p2),
         p3 AS (SELECT pid, nid, rel, mmr FROM (
                  SELECT c.pid, c.nid, c.rel, c.rel - ms.m AS mmr,
                         row_number() OVER (PARTITION BY c.pid
                           ORDER BY c.rel - ms.m DESC, c.nid) rr
                  FROM cand c
                  JOIN (SELECT ps.pid, ps.ca, max(ps.s) m FROM ps
                        JOIN s2 ON s2.pid = ps.pid AND s2.nid = ps.cb
                        GROUP BY 1, 2) ms
                    ON ms.pid = c.pid AND ms.ca = c.nid
                  WHERE NOT EXISTS (SELECT 1 FROM s2
                    WHERE s2.pid = c.pid AND s2.nid = c.nid)) q
                WHERE rr = 1),
         s3 AS (SELECT pid, nid FROM s2 UNION ALL SELECT pid, nid FROM p3),
         p4 AS (SELECT pid, nid, rel, mmr FROM (
                  SELECT c.pid, c.nid, c.rel, c.rel - ms.m AS mmr,
                         row_number() OVER (PARTITION BY c.pid
                           ORDER BY c.rel - ms.m DESC, c.nid) rr
                  FROM cand c
                  JOIN (SELECT ps.pid, ps.ca, max(ps.s) m FROM ps
                        JOIN s3 ON s3.pid = ps.pid AND s3.nid = ps.cb
                        GROUP BY 1, 2) ms
                    ON ms.pid = c.pid AND ms.ca = c.nid
                  WHERE NOT EXISTS (SELECT 1 FROM s3
                    WHERE s3.pid = c.pid AND s3.nid = c.nid)) q
                WHERE rr = 1)
         SELECT pid, pick, nid, rel, mmr FROM (
           SELECT pid, CAST(1 AS BIGINT) pick, nid, rel, mmr FROM p1
           UNION ALL SELECT pid, CAST(2 AS BIGINT), nid, rel, mmr FROM p2
           UNION ALL SELECT pid, CAST(3 AS BIGINT), nid, rel, mmr FROM p3
           UNION ALL SELECT pid, CAST(4 AS BIGINT), nid, rel, mmr FROM p4) u
         ORDER BY pid, pick""",
    // Filtered search: corpus confined to label < 4 BEFORE ranking, so
    // k results are guaranteed whenever >= k rows pass the filter.
    "q_filtered_search" ->
      """WITH n AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
                           CAST(embedding AS DOUBLE[]) v,
                           sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                                 CAST(embedding AS DOUBLE[]))) nrm
                    FROM embeddings),
         s AS (SELECT p.vec_id pid, c.vec_id nid, c.label nlabel,
                      round(list_dot_product(p.v, c.v) / (p.nrm * c.nrm), 6) sim
               FROM n p, n c
               WHERE p.vec_id < 10 AND c.label < 4 AND c.vec_id <> p.vec_id),
         r AS (SELECT pid, nid, nlabel, sim,
                      row_number() OVER (PARTITION BY pid
                        ORDER BY sim DESC, nid) rank
               FROM s)
         SELECT pid, rank, nid, sim, nlabel AS label
         FROM r WHERE rank <= 5 ORDER BY pid, rank""",
    "q_semdedup" ->
      s"""WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v,
                           sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                                 CAST(embedding AS DOUBLE[]))) nrm
                    FROM embeddings),
            p AS (SELECT vec_id FROM embeddings
                  WHERE ${bucketSql("CAST(vec_id AS VARCHAR)")} < 5),
            f AS (SELECT a.vec_id AS id
                  FROM n a JOIN p ON p.vec_id = a.vec_id
                           JOIN n b ON b.vec_id < a.vec_id
                  WHERE round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6)
                          >= 0.35
                  GROUP BY a.vec_id)
         SELECT n.vec_id, (f.id IS NOT NULL) AS removed_flat,
                TRUE AS subset_ok
         FROM n JOIN p ON p.vec_id = n.vec_id
                LEFT JOIN f ON f.id = n.vec_id ORDER BY n.vec_id""",
    "q_text_stats" ->
      """SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                round(avg(n_chars), 6) AS avg_chars,
                min(n_chars) AS min_chars, max(n_chars) AS max_chars
         FROM documents GROUP BY lang ORDER BY lang""",
    "q_langid" ->
      """WITH s AS (SELECT doc_id, ' ' || lower(text) || ' ' AS p FROM documents),
         sc AS (SELECT doc_id,
           (length(p)-length(replace(p,' der ','')))/5 + (length(p)-length(replace(p,' und ','')))/5 + (length(p)-length(replace(p,' die ','')))/5 AS s_de,
           (length(p)-length(replace(p,' the ','')))/5 + (length(p)-length(replace(p,' and ','')))/5 + (length(p)-length(replace(p,' of ','')))/4 AS s_en,
           (length(p)-length(replace(p,' el ','')))/4 + (length(p)-length(replace(p,' los ','')))/5 + (length(p)-length(replace(p,' que ','')))/5 AS s_es,
           (length(p)-length(replace(p,' le ','')))/4 + (length(p)-length(replace(p,' les ','')))/5 + (length(p)-length(replace(p,' est ','')))/5 AS s_fr,
           (length(p)-length(replace(p,' de ','')))/4 + (length(p)-length(replace(p,' shi ','')))/5 + (length(p)-length(replace(p,' zai ','')))/5 AS s_zh
           FROM s)
         SELECT doc_id,
                CASE WHEN s_de = best THEN 'de' WHEN s_en = best THEN 'en'
                     WHEN s_es = best THEN 'es' WHEN s_fr = best THEN 'fr'
                     WHEN s_zh = best THEN 'zh' END AS pred_lang
         FROM (SELECT *, greatest(s_de, s_en, s_es, s_fr, s_zh) best FROM sc)
         ORDER BY doc_id""",
    "q_quality_score" ->
      """WITH q AS (SELECT doc_id, lower(text) t,
                           CAST(length(text) AS DOUBLE) len,
                           ' ' || lower(text) || ' ' p,
                           CAST(len(regexp_split_to_array(trim(lower(text)), ' +')) AS DOUBLE) ntok
                    FROM documents),
         c AS (SELECT doc_id,
                 length(regexp_replace(t, '[^a-z]', '', 'g')) / len AS alpha,
                 (len - length(replace(t, ' ', ''))) / len AS space,
                 ((length(p)-length(replace(p,' the ','')))/5 + (length(p)-length(replace(p,' a ','')))/3
                  + (length(p)-length(replace(p,' of ','')))/4 + (length(p)-length(replace(p,' and ','')))/5) / ntok AS stop
               FROM q)
         SELECT doc_id, round(alpha, 6) AS alpha_ratio, round(space, 6) AS space_ratio,
                round(stop, 6) AS stop_ratio,
                round(alpha*0.5 + (1-space)*0.3 + least(stop*10, 1.0)*0.2, 6) AS quality
         FROM c ORDER BY doc_id""",
    // Same score pipeline as q_quality_score; quantile_cont == Spark's
    // exact `percentile` (both rounded-6dp inputs, so the threshold and
    // the >= comparison are bit-identical across engines).
    "q_quality_filter" ->
      """WITH q AS (SELECT doc_id, lower(text) t,
                           CAST(length(text) AS DOUBLE) len,
                           ' ' || lower(text) || ' ' p,
                           CAST(len(regexp_split_to_array(trim(lower(text)), ' +')) AS DOUBLE) ntok
                    FROM documents),
         c AS (SELECT doc_id,
                 length(regexp_replace(t, '[^a-z]', '', 'g')) / len AS alpha,
                 (len - length(replace(t, ' ', ''))) / len AS space,
                 ((length(p)-length(replace(p,' the ','')))/5 + (length(p)-length(replace(p,' a ','')))/3
                  + (length(p)-length(replace(p,' of ','')))/4 + (length(p)-length(replace(p,' and ','')))/5) / ntok AS stop
               FROM q),
         s AS (SELECT doc_id,
                      round(alpha*0.5 + (1-space)*0.3 + least(stop*10, 1.0)*0.2, 6) AS quality
               FROM c)
         SELECT doc_id, quality FROM s
         WHERE quality >= (SELECT quantile_cont(quality, 0.5) FROM s)
         ORDER BY doc_id""",
    "q_embed_components" ->
      """WITH RECURSIVE n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v,
                           sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                                 CAST(embedding AS DOUBLE[]))) nrm
                    FROM embeddings),
         pairs AS (SELECT p.vec_id da, c.vec_id db
                   FROM n p, n c WHERE p.vec_id < 100 AND c.vec_id > p.vec_id
                     AND round(list_dot_product(p.v, c.v) / (p.nrm * c.nrm), 6) >= 0.35),
         e AS (SELECT da s, db d FROM pairs UNION ALL SELECT db, da FROM pairs),
         reach(nd, l) AS (
           SELECT vec_id, vec_id FROM embeddings
           UNION
           SELECT e.d, r.l FROM reach r JOIN e ON e.s = r.nd)
         SELECT nd AS vec_id, min(l) AS component FROM reach
         GROUP BY nd ORDER BY vec_id""",
    "q_token_count" ->
      """SELECT doc_id,
                CAST(len(regexp_split_to_array(trim(lower(text)), ' +')) AS BIGINT) AS n_tokens,
                CAST(ceil(strlen(text) / 4.0) AS BIGINT) AS n_tokens_bpe
         FROM documents ORDER BY doc_id""",
    "q_fingerprint" ->
      """WITH n AS (SELECT doc_id, lower(regexp_replace(text, '\s+', ' ', 'g')) nt
                    FROM documents),
         r AS (SELECT doc_id,
                      CAST(sum(ascii(substr(nt, CAST(i AS INT), 1))
                               * ((i * 2654435761) % 1000003)) % 1000003 AS BIGINT) AS fp_roll
               FROM n, unnest(range(1, length(nt)+1)) t(i) GROUP BY 1)
         SELECT n.doc_id, md5(nt) AS fp_md5, r.fp_roll
         FROM n JOIN r ON n.doc_id = r.doc_id ORDER BY n.doc_id""",
    "q_event_tumbling" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_ts, event_type,
                count(*) AS n,
                CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY hour_ts, event_type""",
    "q_sessionize" ->
      """WITH e AS (SELECT user_id, event_id,
                           CAST(epoch(date_trunc('second', ts)) AS BIGINT) ep FROM events),
         l AS (SELECT user_id, event_id, ep,
                      lag(ep) OVER (PARTITION BY user_id ORDER BY ep, event_id) prev FROM e),
         f AS (SELECT user_id, event_id, ep,
                      CASE WHEN prev IS NULL OR ep - prev > 1800 THEN 1 ELSE 0 END is_new FROM l),
         s AS (SELECT user_id, ep,
                      CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ep, event_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) session_seq FROM f)
         SELECT user_id, session_seq, count(*) AS n_events,
                min(ep) AS start_ep, max(ep) AS end_ep
         FROM s GROUP BY 1, 2 ORDER BY user_id, session_seq""",
    "q_topk_per_group" ->
      """SELECT o_orderpriority, rank, o_orderkey, o_totalprice FROM (
           SELECT o_orderpriority, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_orderpriority
                    ORDER BY o_totalprice DESC, o_orderkey) rank
           FROM orders)
         WHERE rank <= 3 ORDER BY o_orderpriority, rank""",
    "q_approx_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
                TRUE AS within_5pct
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q_ann_ivf" ->
      """SELECT vec_id AS pid, CAST(5 AS BIGINT) AS k,
                TRUE AS found_true_neighbor
         FROM embeddings WHERE vec_id < 10 ORDER BY pid""",
    "q_ann_lsh" ->
      """SELECT vec_id AS pid, CAST(5 AS BIGINT) AS k,
                TRUE AS found_true_neighbor
         FROM embeddings WHERE vec_id < 10 ORDER BY pid""",
    // the persisted index probes with ivfTopK's math at the same
    // (nCentroids=64, nprobe=16) configuration — the parquet round-trip
    // of the model is bit-exact, so q_ann_ivf's full-recall frame holds
    "q_ann_persist" ->
      """SELECT vec_id AS pid, CAST(5 AS BIGINT) AS k,
                TRUE AS found_true_neighbor
         FROM embeddings WHERE vec_id < 10 ORDER BY pid""",
    // append-path probe keeps full recall: the model is fit on the even
    // half only, but nprobe=16 of 64 buckets holds the contract at every
    // tested scale (same calibration margin as q_ann_ivf)
    "q_ann_append" ->
      """SELECT vec_id AS pid, CAST(5 AS BIGINT) AS k,
                TRUE AS found_true_neighbor
         FROM embeddings WHERE vec_id < 10 ORDER BY pid""",
    // compaction rewrites bytes, never membership or ranking math: the
    // oracle expects full recall AND probe-identity across the swap
    "q_ann_compact" ->
      """SELECT vec_id AS pid, CAST(5 AS BIGINT) AS k,
                TRUE AS found_true_neighbor, TRUE AS same_after_compact
         FROM embeddings WHERE vec_id < 10 ORDER BY pid""",
    // deletion retracts exactly the named ids: every surviving probe
    // keeps a true neighbor of the SURVIVING corpus and never sees a
    // retracted id as a neighbor (the engine additionally require()s the
    // retracted rows are physically gone from the inverted lists)
    "q_ann_delete" ->
      """SELECT vec_id AS pid, CAST(5 AS BIGINT) AS k,
                TRUE AS found_true_neighbor, TRUE AS no_deleted_neighbor
         FROM embeddings WHERE vec_id < 10 AND vec_id % 10 >= 2
         ORDER BY pid""",
    // the rebuild's probe runs at nprobe = nCentroids (total coverage →
    // exact cosine top-k), so full recall is deterministic; the staged
    // atomic-publish facts are engine-side require()s the SQL can't see
    "q_ann_rebuild" ->
      """SELECT vec_id AS pid, CAST(5 AS BIGINT) AS k,
                TRUE AS found_true_neighbor
         FROM embeddings WHERE vec_id < 10 ORDER BY pid""",
    // streamed ingest lands the same rows in the same buckets as the
    // batch append (assignment is stateless per row against the frozen
    // model), so the probe contract is q_ann_append's unchanged
    "q_stream_index" ->
      """SELECT vec_id AS pid, CAST(5 AS BIGINT) AS k,
                TRUE AS found_true_neighbor
         FROM embeddings WHERE vec_id < 10 ORDER BY pid""",
    // compressed tiers hash the probe-completeness frame only; recall
    // is spec-asserted (quantization recall is data-dependent — the
    // cms_ok discipline; see Similarity.probeCoverage)
    "q_ann_pq" ->
      """SELECT vec_id AS pid, CAST(5 AS BIGINT) AS k
         FROM embeddings WHERE vec_id < 10 ORDER BY pid""",
    "q_ann_pq_persist" ->
      """SELECT vec_id AS pid, CAST(5 AS BIGINT) AS k
         FROM embeddings WHERE vec_id < 10 ORDER BY pid""",
    "q_ann_ivfpq" ->
      """SELECT vec_id AS pid, CAST(5 AS BIGINT) AS k
         FROM embeddings WHERE vec_id < 10 ORDER BY pid""",
    // Real-decode features: the engine routes each doc through its
    // dispatch format's REAL codec and computes (unit count, first unit,
    // mod-997 checksum) over the DECODED stream; the oracle recomputes the
    // same integer facts from the text (ASCII fixture: byte i ==
    // ascii(char i); decoded WAV sample i = (byte-128)*256; BMP/PNG/GIF
    // zero padding decodes back as 0 units in bucket counts/sums; JPEG is
    // lossy → geometry + the bounded-error verdict instead of a checksum).
    "q_media_features" ->
      """WITH agg AS (SELECT doc_id, strlen(text) n,
                             ascii(substr(text, 1, 1)) h,
                             sum(ascii(substr(text, CAST(j AS INT), 1))) s
                      FROM documents, unnest(range(1, strlen(text)+1)) r(j)
                      GROUP BY 1, 2, 3)
         SELECT doc_id,
                CASE doc_id % 5 WHEN 0 THEN 'wav' WHEN 1 THEN 'bmp'
                                WHEN 2 THEN 'png' WHEN 3 THEN 'jpeg'
                                ELSE 'gif' END AS format,
                CAST(CASE doc_id % 5
                       WHEN 0 THEN n
                       WHEN 1 THEN 48 * greatest(1, CAST(ceil(n / 48.0) AS BIGINT))
                       WHEN 2 THEN 48 * greatest(1, CAST(ceil(n / 48.0) AS BIGINT))
                       ELSE 16 * greatest(1, CAST(ceil(n / 16.0) AS BIGINT))
                     END AS BIGINT) AS n_units,
                CAST(CASE doc_id % 5
                       WHEN 0 THEN (h - 128) * 256
                       WHEN 3 THEN -1
                       ELSE h
                     END AS BIGINT) AS head_unit,
                CAST(CASE doc_id % 5
                       WHEN 0 THEN ((256 * (s - 128 * n)) % 997 + 997) % 997
                       WHEN 3 THEN 1
                       ELSE s % 997
                     END AS BIGINT) AS checksum
         FROM agg ORDER BY doc_id""",
    // Real ISO-BMFF demux: keyframe payloads read back out of mdat via the
    // sample tables equal the 64-byte text frames at even indices (the
    // stss stride); empty payloads produce no container and no rows.
    "q_media_frames" ->
      """SELECT doc_id, CAST(i AS BIGINT) AS frame_no,
                lower(hex(encode(substr(text, CAST(i*64+1 AS INT), 64)))) AS frame
         FROM documents,
              unnest(range(0, CAST(greatest(ceil(strlen(text)/64.0), 1) AS BIGINT))) t(i)
         WHERE i % 2 = 0 AND strlen(text) > 0
         ORDER BY doc_id, frame_no""",
    // MJPEG-in-MP4 pixel decode: keyframes at the stss stride (even frame
    // indices), geometry fixed by construction (16×4 = 64 zero-padded gray
    // pixels per frame), and the lossy tier's verification value is the
    // engine-side bounded-reconstruction-error verdict (q_media_jpeg's
    // contract) — a broken demux, wrong payload, or broken pixel decode
    // flips lossy_ok to 0 and hash-diverges.
    "q_media_video" ->
      """SELECT doc_id, CAST(i AS BIGINT) AS frame_no,
                CAST(16 AS BIGINT) AS width, CAST(4 AS BIGINT) AS height,
                CAST(64 AS BIGINT) AS n_pixels, CAST(1 AS BIGINT) AS lossy_ok
         FROM documents,
              unnest(range(0, CAST(greatest(ceil(strlen(text)/64.0), 1) AS BIGINT))) t(i)
         WHERE i % 2 = 0 AND strlen(text) > 0
         ORDER BY doc_id, frame_no""",
    // Real-decode round trips: the engine emits what the WAV/BMP parsers
    // read OUT of the synthesized containers; the oracle recomputes the
    // same integer facts directly from the text (ASCII fixture: byte i ==
    // ascii(char i)). sample i = (byte-128)*256; WAV is PCM16 @ 8 kHz.
    "q_media_wav" ->
      """WITH agg AS (SELECT doc_id,
                             count(*) nf,
                             sum(CAST((ascii(substr(text, CAST(j AS INT), 1)) - 128) * 256 AS BIGINT)
                               * CAST((ascii(substr(text, CAST(j AS INT), 1)) - 128) * 256 AS BIGINT)) en
                      FROM documents, unnest(range(1, strlen(text)+1)) r(j)
                      GROUP BY 1)
         SELECT doc_id, CAST(8000 AS BIGINT) sample_rate, CAST(nf AS BIGINT) n_frames,
                CAST(nf * 1000 // 8000 AS BIGINT) duration_ms, CAST(en AS BIGINT) energy
         FROM agg ORDER BY doc_id""",
    // BMP: width 16 → 48 channel bytes per row, text zero-padded to full
    // rows (padding adds 0 to the sum); height = ceil(bytes/48), min 1.
    // decoded channel bytes == text bytes zero-padded to 48-byte rows
    // (ASCII-safe text, q_media_bmp's contract); intensity bucket is
    // byte//16, padding contributes rowBytes*height - strlen to bucket 0
    "q_media_histogram" ->
      """WITH base AS (SELECT doc_id, strlen(text) n FROM documents),
         pix AS (SELECT doc_id,
                        ascii(substr(text, CAST(j AS INT), 1)) // 16 AS bucket
                 FROM documents, unnest(range(1, strlen(text)+1)) r(j)),
         cnt AS MATERIALIZED (SELECT doc_id, bucket, count(*) c FROM pix GROUP BY 1, 2),
         pad AS (SELECT doc_id, 0 AS bucket,
                        48 * greatest(1, CAST(ceil(n / 48.0) AS BIGINT)) - n
                          AS c
                 FROM base
                 WHERE 48 * greatest(1, CAST(ceil(n / 48.0) AS BIGINT)) - n
                       > 0),
         allb AS (SELECT * FROM cnt UNION ALL SELECT * FROM pad)
         SELECT doc_id, CAST(bucket AS BIGINT) bucket,
                CAST(sum(c) AS BIGINT) n
         FROM allb GROUP BY 1, 2 ORDER BY doc_id, bucket""",
    "q_media_bmp" ->
      """WITH agg AS (SELECT doc_id, strlen(text) n,
                             sum(ascii(substr(text, CAST(j AS INT), 1))) s
                      FROM documents, unnest(range(1, strlen(text)+1)) r(j)
                      GROUP BY 1, 2)
         SELECT doc_id, CAST(16 AS BIGINT) width,
                CAST(greatest(1, CAST(ceil(n / 48.0) AS BIGINT)) AS BIGINT) height,
                CAST(24 AS BIGINT) bpp, CAST(s AS BIGINT) sum_channels
         FROM agg ORDER BY doc_id""",
    // documents.text is ASCII-safe (TESTDATA.md): byte i == ascii(char i),
    // so the decoded-pixel sum equals the character-code sum (zero padding
    // contributes nothing) — same contract as q_media_bmp.
    "q_media_png" ->
      """WITH agg AS (SELECT doc_id, strlen(text) n,
                             sum(ascii(substr(text, CAST(j AS INT), 1))) s
                      FROM documents, unnest(range(1, strlen(text)+1)) r(j)
                      GROUP BY 1, 2)
         SELECT doc_id, CAST(16 AS BIGINT) width,
                CAST(greatest(1, CAST(ceil(n / 48.0) AS BIGINT)) AS BIGINT) height,
                CAST(3 AS BIGINT) channels, CAST(s AS BIGINT) sum_channels
         FROM agg ORDER BY doc_id""",
    "q_media_gif" ->
      """WITH agg AS (SELECT doc_id, strlen(text) n,
                             sum(ascii(substr(text, CAST(j AS INT), 1))) s
                      FROM documents, unnest(range(1, strlen(text)+1)) r(j)
                      GROUP BY 1, 2)
         SELECT doc_id, CAST(16 AS BIGINT) width,
                CAST(greatest(1, CAST(ceil(n / 16.0) AS BIGINT)) AS BIGINT) height,
                CAST(s AS BIGINT) sum_pixels
         FROM agg ORDER BY doc_id""",
    // JPEG is LOSSY: the oracle checks exact decoded geometry (grayscale,
    // width 16 → height = ceil(bytes/16), min 1) plus the always-true
    // bounded-error verdict the Spark side computes from the DECODED
    // pixels — a broken decoder flips lossy_ok and fails the hash.
    "q_media_jpeg" ->
      """SELECT doc_id, CAST(16 AS BIGINT) width,
                CAST(greatest(1, CAST(ceil(strlen(text) / 16.0) AS BIGINT)) AS BIGINT) height,
                TRUE AS lossy_ok
         FROM documents ORDER BY doc_id""",
    // Dispatch: doc_id mod 4 picks the format; each branch's values are
    // the same integer facts the single-format oracles recompute (WAV
    // energy / BMP+PNG channel sums / JPEG geometry + bounded-error
    // verdict). ASCII fixture: byte i == ascii(char i).
    "q_media_dispatch" ->
      """WITH agg AS (SELECT doc_id, strlen(text) n,
                             sum(ascii(substr(text, CAST(j AS INT), 1))) s,
                             sum(CAST((ascii(substr(text, CAST(j AS INT), 1)) - 128) * 256 AS BIGINT)
                               * CAST((ascii(substr(text, CAST(j AS INT), 1)) - 128) * 256 AS BIGINT)) en
                      FROM documents, unnest(range(1, strlen(text)+1)) r(j)
                      GROUP BY 1, 2)
         SELECT doc_id,
                CASE doc_id % 5 WHEN 0 THEN 'wav' WHEN 1 THEN 'bmp'
                                WHEN 2 THEN 'png' WHEN 3 THEN 'jpeg'
                                ELSE 'gif' END AS format,
                CAST(CASE WHEN doc_id % 5 = 0 THEN 8000 ELSE 16 END AS BIGINT) AS geom1,
                CAST(CASE doc_id % 5
                       WHEN 0 THEN n
                       WHEN 3 THEN greatest(1, CAST(ceil(n / 16.0) AS BIGINT))
                       WHEN 4 THEN greatest(1, CAST(ceil(n / 16.0) AS BIGINT))
                       ELSE greatest(1, CAST(ceil(n / 48.0) AS BIGINT))
                     END AS BIGINT) AS geom2,
                CAST(CASE doc_id % 5 WHEN 0 THEN en WHEN 3 THEN 1 ELSE s
                     END AS BIGINT) AS feature
         FROM agg ORDER BY doc_id""",
    // MP4 keyframe demux: frames of 48 text bytes (last one short), every
    // 2nd frame marked sync in stss; the engine reads keyframe payloads
    // back OUT of mdat via the sample tables, so frame_len/frame_sum are
    // recomputable from the text by frame-range byte arithmetic.
    "q_media_mp4" ->
      """WITH pos AS (SELECT doc_id, CAST(k AS BIGINT) k,
                             ascii(substr(text, CAST(k AS INT), 1)) b
                      FROM documents, unnest(range(1, strlen(text)+1)) r(k)
                      WHERE strlen(text) > 0),
         fr AS (SELECT doc_id, (k-1)//48 AS frame_no,
                       count(*) flen, sum(b) fsum
                FROM pos GROUP BY 1, 2)
         SELECT doc_id, CAST(frame_no AS BIGINT) frame_no,
                CAST(flen AS BIGINT) frame_len, CAST(fsum AS BIGINT) frame_sum
         FROM fr WHERE frame_no % 2 = 0 ORDER BY doc_id, frame_no""",
    // the SPS round trip must land exactly on the doc-derived geometry
    // (encode = mb-align + crop, decode = independent field walk)
    "q_media_avc" ->
      """SELECT doc_id, CAST(66 AS BIGINT) AS profile_idc,
                CAST(30 AS BIGINT) AS level_idc,
                CAST(2 * (80 + doc_id % 131) AS BIGINT) AS width,
                CAST(2 * (45 + doc_id % 97) AS BIGINT) AS height
         FROM documents ORDER BY doc_id""",
    "q_asof_join" ->
      """WITH p AS (SELECT user_id, epoch_us(ts) AS ep, event_id
                    FROM events WHERE event_type = 'purchase'),
         v AS (SELECT user_id, epoch_us(ts) AS view_ep, max(event_id) AS view_event_id
               FROM events WHERE event_type = 'view' GROUP BY 1, 2)
         SELECT p.user_id, p.ep, p.event_id, v.view_ep, v.view_event_id
         FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ep >= v.view_ep
         ORDER BY p.event_id""",
    "q_range_join" ->
      """SELECT band, count(*) AS n_rows,
                CAST(sum(CAST(p_retailprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
         FROM part JOIN (VALUES ('XS', 1, 10), ('S', 11, 20), ('M', 21, 30),
                         ('L', 31, 40), ('XL', 41, 50)) AS b(band, lo, hi)
           ON p_size BETWEEN lo AND hi
         GROUP BY band ORDER BY band""",
    "q_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
                coalesce(l_linestatus, 'ALL') AS l_linestatus,
                count(*) AS n_rows,
                CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         ORDER BY l_returnflag, l_linestatus""",
    "q_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
                coalesce(l_linestatus, 'ALL') AS l_linestatus,
                count(*) AS n_rows,
                CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
         FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
         ORDER BY l_returnflag, l_linestatus""",
    "q_lag_gaps" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ep,
                epoch_us(ts) - lag(epoch_us(ts)) OVER (
                  PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap_us
         FROM events ORDER BY event_id""",
    "q_running_total" ->
      """SELECT user_id, epoch_us(ts) AS ep, event_id,
                round(CAST(sum(CAST(value AS DECIMAL(38,6))) OVER (
                  PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                  ROWS UNBOUNDED PRECEDING) AS DOUBLE), 6) AS running_value
         FROM events ORDER BY user_id, event_id""",
    "q_pivot" ->
      """SELECT user_id,
                count(*) FILTER (WHERE event_type = 'click') AS n_click,
                count(*) FILTER (WHERE event_type = 'error') AS n_error,
                count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
                count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
                count(*) FILTER (WHERE event_type = 'view') AS n_view
         FROM events GROUP BY user_id ORDER BY user_id""",
    "q_quantiles" ->
      """SELECT event_type,
                round(quantile_cont(value, 0.25), 6) AS p25,
                round(quantile_cont(value, 0.5), 6) AS p50,
                round(quantile_cont(value, 0.75), 6) AS p75,
                round(quantile_cont(value, 0.9), 6) AS p90
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q_intersect" ->
      """SELECT l_orderkey AS key FROM lineitem
         INTERSECT SELECT o_orderkey FROM orders WHERE o_orderstatus = 'O'
         ORDER BY key""",
    "q_sync_apply" ->
      """SELECT DISTINCT l_orderkey AS shard_id,
                CAST(l_linenumber AS BIGINT) AS shard_length,
                'host' || CAST(l_suppkey % 7 AS VARCHAR) AS hostname
         FROM lineitem ORDER BY shard_id, shard_length, hostname""",
    "q_sync_stats" ->
      """WITH src AS (SELECT DISTINCT l_orderkey AS shard_id FROM lineitem),
         cat AS (SELECT o_orderkey AS shard_id FROM orders
                 WHERE o_orderstatus = 'F'),
         stats AS (SELECT l_orderkey AS shard_id,
                          CAST(min(l_partkey) AS VARCHAR) AS mn,
                          CAST(max(l_partkey) AS VARCHAR) AS mx
                   FROM lineitem GROUP BY 1)
         SELECT CAST(1 AS BIGINT) AS table_id, c.shard_id, 'f' AS storage,
                CAST(NULL AS VARCHAR) AS min_value,
                CAST(NULL AS VARCHAR) AS max_value
         FROM cat c WHERE c.shard_id IN (SELECT shard_id FROM src)
         UNION ALL
         SELECT CAST(1 AS BIGINT), s.shard_id, 'f', st.mn, st.mx
         FROM src s JOIN stats st USING (shard_id)
         WHERE s.shard_id NOT IN (SELECT shard_id FROM cat)
         ORDER BY shard_id""",
    "q_local_volume" ->
      """SELECT n_name, count(*) AS n_items,
                CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                              AS DECIMAL(38,6))) AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         JOIN nation   ON s_nationkey = n_nationkey
         JOIN region   ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
         GROUP BY n_name ORDER BY n_name""",
    "q_upsert" ->
      """WITH ord AS (SELECT o_orderkey AS key, o_totalprice AS price FROM orders),
         src AS (SELECT key, round(price * 2, 2) AS price FROM ord
                 WHERE key % 100 = 0
                 UNION ALL SELECT CAST(1 AS BIGINT), CAST(0.0 AS DOUBLE))
         SELECT key, price FROM (
           SELECT key, price FROM ord
           WHERE NOT EXISTS (SELECT 1 FROM src WHERE src.key = ord.key)
           UNION ALL SELECT key, price FROM src)
         ORDER BY key""",
    "q_partition_prune" ->
      """SELECT source, count(*) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS sum_chars
         FROM documents WHERE lang = 'en'
         GROUP BY source ORDER BY source""",
    // rows + id sum must survive the rewrite; the fixture is far below the
    // byte target, so exactly one output file is the deterministic contract
    "q_compact" ->
      """SELECT count(*) AS n_rows, CAST(sum(doc_id) AS BIGINT) AS sum_ids,
                CAST(1 AS BIGINT) AS n_files
         FROM documents""",
    // the audit diff over two immutable catalog versions reduces to the
    // excepts of the two seeding predicates
    "q_catalog_changes" ->
      """WITH a AS (SELECT o_orderkey AS shard_id FROM orders
                    WHERE o_orderstatus = 'F'),
         b AS (SELECT o_orderkey AS shard_id FROM orders
               WHERE o_orderpriority = '1-URGENT')
         SELECT CAST(1 AS BIGINT) AS table_id, shard_id, 'added' AS change
         FROM b WHERE shard_id NOT IN (SELECT shard_id FROM a)
         UNION ALL
         SELECT CAST(1 AS BIGINT) AS table_id, shard_id, 'removed' AS change
         FROM a WHERE shard_id NOT IN (SELECT shard_id FROM b)
         ORDER BY change, shard_id""",
    // retention + time travel: v0 vacuumed → reads as EMPTY (0 rows);
    // v1 = the URGENT snapshot and current after the rollback; v2 = the
    // full snapshot, preserved above the rolled-back pointer
    "q_time_travel" ->
      """SELECT CAST(0 AS BIGINT) AS version, CAST(0 AS BIGINT) AS n_shards,
                FALSE AS is_current
         UNION ALL
         SELECT CAST(1 AS BIGINT),
                (SELECT count(*) FROM orders
                 WHERE o_orderpriority = '1-URGENT'), TRUE
         UNION ALL
         SELECT CAST(2 AS BIGINT), (SELECT count(*) FROM orders), FALSE
         ORDER BY version""",
    // the oracle is the PLAIN join — salting must be invisible in results
    "q_salted_join" ->
      """SELECT o_orderpriority, count(*) AS n_rows,
                CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    // the oracle is the PLAIN join — the bucketed layout round-trip must be
    // invisible in results (only the plan changes: zero data-path Exchange)
    "q_bucket_join" ->
      """SELECT o_orderkey, count(*) AS n_items,
                CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderkey ORDER BY o_orderkey""",
    "q_event_correlate" ->
      """WITH e AS (SELECT user_id, event_type, event_id, epoch_us(ts) AS ep
                    FROM events)
         SELECT v.user_id, v.event_id AS a_id, c.event_id AS b_id,
                c.ep - v.ep AS gap_us
         FROM e v JOIN e c ON v.user_id = c.user_id
           AND v.event_type = 'view' AND c.event_type = 'click'
           AND c.ep > v.ep AND c.ep <= v.ep + 3600000000
         ORDER BY a_id, b_id""",
    "q_funnel" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
         s1 AS (SELECT user_id, min(epoch_us(ts)) AS t_1 FROM events
                WHERE event_type = 'view' GROUP BY 1),
         s2 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t_2 FROM events e
                JOIN s1 ON e.user_id = s1.user_id
                WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.t_1
                GROUP BY 1),
         s3 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t_3 FROM events e
                JOIN s2 ON e.user_id = s2.user_id
                WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t_2
                GROUP BY 1)
         SELECT u.user_id, t_1, t_2, t_3,
                CAST(CASE WHEN t_1 IS NULL THEN 0 ELSE 1 END
                   + CASE WHEN t_2 IS NULL THEN 0 ELSE 1 END
                   + CASE WHEN t_3 IS NULL THEN 0 ELSE 1 END AS BIGINT) AS n_steps
         FROM u LEFT JOIN s1 USING(user_id) LEFT JOIN s2 USING(user_id)
                LEFT JOIN s3 USING(user_id)
         ORDER BY u.user_id""",
    "q_cohort" ->
      """WITH w AS (SELECT user_id, epoch_us(ts) // 604800000000 AS wk FROM events),
         du AS (SELECT DISTINCT user_id, wk FROM w),
         f AS (SELECT user_id, min(wk) AS cohort_week FROM w GROUP BY 1)
         SELECT cohort_week, wk - cohort_week AS week_offset,
                count(*) AS n_users
         FROM du JOIN f USING(user_id)
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_histogram" ->
      """WITH h AS (SELECT least(greatest(CAST(floor(value / 50.0) AS BIGINT), 0), 9)
                      AS bin, value
                    FROM events)
         SELECT bin, round(CAST(bin * 50.0 AS DOUBLE), 6) AS lo_edge, count(*) AS n,
                round(min(value), 6) AS min_value,
                round(max(value), 6) AS max_value
         FROM h GROUP BY bin ORDER BY bin""",
    "q_media_resize" ->
      """WITH geo AS (SELECT doc_id, text, strlen(text) AS n,
                        greatest(1, CAST(ceil(strlen(text) / 48.0) AS BIGINT)) AS h
                      FROM documents),
         px AS (SELECT doc_id, n, text,
                  ((y*2)*16 + (x*2))*3 + c AS idx
                FROM geo,
                  unnest(range(0, greatest(1, h // 2))) ry(y),
                  unnest(range(0, 8)) rx(x),
                  unnest(range(0, 3)) rc(c)),
         s AS (SELECT doc_id,
                 sum(CASE WHEN idx < n
                          THEN ascii(substr(text, CAST(idx+1 AS INT), 1))
                          ELSE 0 END) AS sc
               FROM px GROUP BY 1)
         SELECT g.doc_id, CAST(8 AS BIGINT) AS width,
                CAST(greatest(1, h // 2) AS BIGINT) AS height,
                CAST(24 AS BIGINT) AS bpp,
                CAST(coalesce(sc, 0) AS BIGINT) AS sum_channels
         FROM geo g LEFT JOIN s ON g.doc_id = s.doc_id
         ORDER BY g.doc_id""",
    "q_json_extract" ->
      """WITH v AS (SELECT event_type,
                      CAST(regexp_extract(props, '[0-9]+') AS BIGINT) AS k
                    FROM events)
         SELECT event_type, count(k) AS n_parsed,
                CAST(sum(k) AS BIGINT) AS sum_k,
                min(k) AS min_k, max(k) AS max_k
         FROM v GROUP BY event_type ORDER BY event_type""",
    // DSIR replay: same md5 token buckets, same add-one-smoothed integer
    // weight w_b = (p_b·10⁶) // q_b (all operands positive — truncation ≡
    // floor in both engines; normalizers dropped as rank-invariant, see
    // Sampling.dsirScore), same Σ n·w score. md5 materialized ONCE per
    // token row (bucketOfHexSql) — the digit arithmetic would otherwise
    // recompute it 8× over millions of rows at sf1.
    "q_dsir_sample" ->
      s"""WITH tok AS MATERIALIZED (
            SELECT doc_id, tgt, md5(tok) AS h
            FROM (SELECT doc_id, lang = 'de' AS tgt,
                         unnest(regexp_split_to_array(trim(lower(text)), ' +')) AS tok
                  FROM documents)
            WHERE length(tok) > 0),
          db AS MATERIALIZED (
            SELECT doc_id, tgt, ${bucketOfHexSql("h", 64)} AS bucket,
                   count(*) AS n
            FROM tok GROUP BY 1, 2, 3),
          bw AS (SELECT bucket,
                        CAST((sum(CASE WHEN tgt THEN n ELSE 0 END) + 1)
                               * 1000000 // (sum(n) + 1) AS BIGINT) AS w
                 FROM db GROUP BY 1),
          sc AS (SELECT doc_id, CAST(sum(db.n) AS BIGINT) AS n_tokens,
                        CAST(sum(db.n * bw.w) AS BIGINT) AS dsir_score
                 FROM db JOIN bw USING (bucket) GROUP BY 1),
          r AS (SELECT d.source, sc.doc_id, sc.n_tokens, sc.dsir_score,
                       row_number() OVER (PARTITION BY d.source
                         ORDER BY sc.dsir_score DESC, sc.doc_id) AS rnk
                FROM sc JOIN documents d USING (doc_id))
          SELECT source, CAST(rnk AS BIGINT) AS rnk, doc_id, n_tokens,
                 dsir_score
          FROM r WHERE rnk <= 5 ORDER BY source, rnk""",
    // preference pairs: i-th best ⋈ i-th worst per source under the
    // integer lexical-diversity key; the bottom rank uses the MIRRORED
    // tie-break (s ASC, doc_id DESC) so it is exactly the reversed top
    // order, and 2i ≤ n keeps the ends from crossing (margin ≥ 0,
    // chosen ≠ rejected by construction)
    "q_dpo_pairs" ->
      """WITH sc AS (
           SELECT source, doc_id,
                  CAST(count(DISTINCT tok) * 1000000 // count(*) AS BIGINT) AS s
           FROM (SELECT source, doc_id,
                        unnest(regexp_split_to_array(trim(lower(text)), ' +')) AS tok
                 FROM documents)
           WHERE length(tok) > 0 GROUP BY 1, 2),
         r AS (SELECT source, doc_id, s,
                      row_number() OVER (PARTITION BY source
                        ORDER BY s DESC, doc_id ASC) AS rt,
                      row_number() OVER (PARTITION BY source
                        ORDER BY s ASC, doc_id DESC) AS rb,
                      count(*) OVER (PARTITION BY source) AS n
               FROM sc)
         SELECT c.source, CAST(c.rt AS BIGINT) AS pair_id,
                c.doc_id AS chosen_id, w.doc_id AS rejected_id,
                c.s - w.s AS margin
         FROM r c JOIN r w ON c.source = w.source AND c.rt = w.rb
         WHERE c.rt <= 5 AND c.rt * 2 <= c.n
         ORDER BY c.source, pair_id""",
    // DSIR resample replay: the q_dsir_sample score chain, then the
    // weighted-sample priority u52(doc_id)/score — one IEEE division both
    // engines round identically (u52 is exactly representable in binary64)
    "q_dsir_resample" ->
      s"""WITH tok AS MATERIALIZED (
            SELECT doc_id, tgt, md5(tok) AS h
            FROM (SELECT doc_id, lang = 'de' AS tgt,
                         unnest(regexp_split_to_array(trim(lower(text)), ' +')) AS tok
                  FROM documents)
            WHERE length(tok) > 0),
          db AS MATERIALIZED (
            SELECT doc_id, tgt, ${bucketOfHexSql("h", 64)} AS bucket,
                   count(*) AS n
            FROM tok GROUP BY 1, 2, 3),
          bw AS (SELECT bucket,
                        CAST((sum(CASE WHEN tgt THEN n ELSE 0 END) + 1)
                               * 1000000 // (sum(n) + 1) AS BIGINT) AS w
                 FROM db GROUP BY 1),
          sc AS (SELECT doc_id, CAST(sum(db.n) AS BIGINT) AS n_tokens,
                        CAST(sum(db.n * bw.w) AS BIGINT) AS dsir_score
                 FROM db JOIN bw USING (bucket) GROUP BY 1),
          r AS (SELECT doc_id, n_tokens, dsir_score,
                       CAST(${u52Sql("CAST(doc_id AS VARCHAR)")} AS DOUBLE)
                         / CAST(dsir_score AS DOUBLE) AS pri
                FROM sc WHERE dsir_score > 0 AND doc_id IS NOT NULL)
          SELECT doc_id, n_tokens, dsir_score FROM
            (SELECT * FROM r ORDER BY pri ASC, doc_id ASC LIMIT 100)
          ORDER BY doc_id""",
    "q_stratified_sample" ->
      s"""SELECT doc_id, lang, source FROM documents
          WHERE ${bucketSql("CAST(doc_id AS VARCHAR)")} <
                CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 20
                          WHEN 'fr' THEN 10 ELSE 5 END
          ORDER BY doc_id""",
    "q_pack_chunks" ->
      """WITH tk AS (SELECT source, doc_id,
                       len(regexp_split_to_array(trim(lower(text)), ' +')) AS n_tokens
                     FROM documents),
         c AS (SELECT source, doc_id, n_tokens,
                 CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS s
               FROM tk)
         SELECT source, doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                CAST(floor(s / 2048.0) AS BIGINT) AS chunk,
                s % 2048 AS chunk_offset,
                (s % 2048 + n_tokens > 2048) AS straddles
         FROM c ORDER BY source, doc_id""",
    "q_corpus_pipeline" ->
      s"""WITH q AS (SELECT doc_id, lower(text) t,
                           CAST(length(text) AS DOUBLE) len,
                           ' ' || lower(text) || ' ' p,
                           CAST(len(regexp_split_to_array(trim(lower(text)), ' +')) AS DOUBLE) ntok
                    FROM documents),
         c AS (SELECT doc_id,
                 length(regexp_replace(t, '[^a-z]', '', 'g')) / len AS alpha,
                 (len - length(replace(t, ' ', ''))) / len AS space,
                 ((length(p)-length(replace(p,' the ','')))/5 + (length(p)-length(replace(p,' a ','')))/3
                  + (length(p)-length(replace(p,' of ','')))/4 + (length(p)-length(replace(p,' and ','')))/5) / ntok AS stop
               FROM q),
         sc AS (SELECT doc_id,
                      round(alpha*0.5 + (1-space)*0.3 + least(stop*10, 1.0)*0.2, 6) AS quality
               FROM c),
         kept AS (SELECT d.* FROM documents d
                  JOIN sc ON d.doc_id = sc.doc_id
                  WHERE sc.quality >= (SELECT quantile_cont(quality, 0.5) FROM sc)),
         k AS (SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5(text)),
         surv AS (SELECT kept.* FROM kept JOIN k ON kept.doc_id = k.doc_id),
         sp AS (SELECT text,
                  CASE WHEN ${bucketSql("source")} < 80 THEN 'train'
                       WHEN ${bucketSql("source")} < 90 THEN 'valid'
                       WHEN ${bucketSql("source")} < 100 THEN 'test'
                  END AS split
                FROM surv)
         SELECT split, count(*) AS n_docs,
                CAST(sum(len(regexp_split_to_array(trim(lower(text)), ' +'))) AS BIGINT)
                  AS sum_tokens
         FROM sp GROUP BY split ORDER BY split""",
    "q_chunk_text" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS L FROM documents),
         c AS (SELECT doc_id, i AS chunk_no, i * 400 AS chunk_start,
                 substr(text, CAST(i * 400 + 1 AS INT), 500) AS chunk
               FROM d, unnest(range(0,
                 greatest(1, CAST(ceil(L / 400.0) AS BIGINT)))) r(i))
         SELECT doc_id, chunk_no, chunk_start, md5(chunk) AS chunk_md5,
                length(chunk) AS n_chars
         FROM c ORDER BY doc_id, chunk_no""",
    "q_repetition" ->
      """WITH toks AS MATERIALIZED (SELECT doc_id, regexp_split_to_array(trim(lower(text)), ' +') t
                       FROM documents),
         tri AS MATERIALIZED (SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
                 FROM toks, unnest(range(1, len(t)-1)) r(i)),
         agg AS (SELECT doc_id, count(*) AS n_tri, count(DISTINCT sh) AS n_uniq
                 FROM tri GROUP BY 1)
         SELECT d.doc_id,
                coalesce(n_tri, 0) AS n_trigrams,
                coalesce(n_uniq, 0) AS n_distinct,
                coalesce(round(1 - n_uniq / n_tri, 6), 0.0) AS rep_ratio
         FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
         ORDER BY d.doc_id""",
    "q_pii_redact" ->
      """WITH d AS (SELECT doc_id,
                      CASE WHEN doc_id % 10 = 0
                           THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                                || '@example.com now'
                           ELSE text END AS text
                    FROM documents)
         SELECT doc_id,
                CAST(len(regexp_extract_all(text,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
                  AS n_emails,
                md5(regexp_replace(text,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'))
                  AS redacted_md5
         FROM d ORDER BY doc_id""",
    "q_contamination" ->
      s"""WITH b AS (SELECT doc_id, text,
                       ${bucketSql("CAST(doc_id AS VARCHAR)")} AS bucket
                     FROM documents),
         ttoks AS MATERIALIZED (SELECT doc_id, regexp_split_to_array(trim(lower(text)), ' +') t
                   FROM b WHERE bucket >= 10),
         ttri AS MATERIALIZED (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
                  FROM ttoks, unnest(range(1, len(t)-1)) r(i)),
         btoks AS MATERIALIZED (SELECT doc_id, regexp_split_to_array(trim(lower(text)), ' +') t
                   FROM b WHERE bucket < 10),
         btri AS MATERIALIZED (SELECT DISTINCT t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
                  FROM btoks, unnest(range(1, len(t)-1)) r(i)),
         ov AS (SELECT doc_id, count(*) AS n_overlap FROM ttri
                WHERE sh IN (SELECT sh FROM btri) GROUP BY 1),
         sz AS MATERIALIZED (SELECT doc_id, count(*) AS n_shingles FROM ttri GROUP BY 1)
         SELECT sz.doc_id, n_shingles,
                coalesce(n_overlap, 0) AS n_overlap,
                coalesce(n_overlap, 0) >= 20 AS contaminated
         FROM sz LEFT JOIN ov ON sz.doc_id = ov.doc_id
         ORDER BY sz.doc_id""",
    // Bloom-prefiltered contamination: the bloom stage only prunes the
    // shuffle — the exact semi-join removes false positives, so the
    // oracle is the plain exact-overlap query on the 15% split.
    "q_bloom_contamination" ->
      s"""WITH b AS (SELECT doc_id, text,
                       ${bucketSql("CAST(doc_id AS VARCHAR)")} AS bucket
                     FROM documents),
         ttoks AS MATERIALIZED (SELECT doc_id, regexp_split_to_array(trim(lower(text)), ' +') t
                   FROM b WHERE bucket >= 15),
         ttri AS MATERIALIZED (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
                  FROM ttoks, unnest(range(1, len(t)-1)) r(i)),
         btoks AS MATERIALIZED (SELECT doc_id, regexp_split_to_array(trim(lower(text)), ' +') t
                   FROM b WHERE bucket < 15),
         btri AS MATERIALIZED (SELECT DISTINCT t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
                  FROM btoks, unnest(range(1, len(t)-1)) r(i)),
         ov AS (SELECT doc_id, count(*) AS n_overlap FROM ttri
                WHERE sh IN (SELECT sh FROM btri) GROUP BY 1),
         sz AS MATERIALIZED (SELECT doc_id, count(*) AS n_shingles FROM ttri GROUP BY 1)
         SELECT sz.doc_id, n_shingles,
                coalesce(n_overlap, 0) AS n_overlap,
                coalesce(n_overlap, 0) >= 20 AS contaminated
         FROM sz LEFT JOIN ov ON sz.doc_id = ov.doc_id
         ORDER BY sz.doc_id""",
    // Exact-substring repeated spans: distinct 64-char windows at stride
    // 16; a window is "repeated" when >= 2 distinct docs contain it.
    "q_repeated_spans" ->
      """WITH w0 AS (SELECT doc_id, substr(text, CAST(i AS INT), 64) w
                     FROM documents, unnest(range(1, length(text) - 62, 16)) r(i)
                     WHERE length(text) >= 64),
         w1 AS (SELECT DISTINCT doc_id, w FROM w0),
         sh AS (SELECT w FROM w1 GROUP BY w HAVING count(DISTINCT doc_id) >= 2),
         rep AS (SELECT doc_id, count(*) n_repeated FROM w1
                 WHERE w IN (SELECT w FROM sh) GROUP BY 1),
         tot AS (SELECT doc_id, count(*) n_windows FROM w1 GROUP BY 1)
         SELECT d.doc_id,
                coalesce(n_windows, 0) AS n_windows,
                coalesce(n_repeated, 0) AS n_repeated,
                round(CASE WHEN coalesce(n_windows, 0) = 0 THEN 0.0
                           ELSE coalesce(n_repeated, 0) / n_windows END, 6)
                  AS repeated_frac
         FROM documents d LEFT JOIN tot USING (doc_id) LEFT JOIN rep USING (doc_id)
         ORDER BY d.doc_id""",
    // Mixed-language: 200-char non-overlapping chunks, the q_langid
    // marker arithmetic per chunk, per-doc rollup (majority by chunk
    // count then language code).
    "q_mixed_language" ->
      """WITH d AS (SELECT doc_id, text,
                      greatest(1, CAST(ceil(coalesce(length(text), 0)/200.0)
                        AS BIGINT)) nc
                    FROM documents),
         ch AS (SELECT doc_id,
                  ' ' || lower(substr(text, CAST(i*200+1 AS INT), 200)) || ' ' AS p
                FROM d, unnest(range(0, nc)) r(i)),
         sc AS (SELECT doc_id,
           (length(p)-length(replace(p,' der ','')))/5 + (length(p)-length(replace(p,' und ','')))/5 + (length(p)-length(replace(p,' die ','')))/5 AS s_de,
           (length(p)-length(replace(p,' the ','')))/5 + (length(p)-length(replace(p,' and ','')))/5 + (length(p)-length(replace(p,' of ','')))/4 AS s_en,
           (length(p)-length(replace(p,' el ','')))/4 + (length(p)-length(replace(p,' los ','')))/5 + (length(p)-length(replace(p,' que ','')))/5 AS s_es,
           (length(p)-length(replace(p,' le ','')))/4 + (length(p)-length(replace(p,' les ','')))/5 + (length(p)-length(replace(p,' est ','')))/5 AS s_fr,
           (length(p)-length(replace(p,' de ','')))/4 + (length(p)-length(replace(p,' shi ','')))/5 + (length(p)-length(replace(p,' zai ','')))/5 AS s_zh
           FROM ch),
         pl AS (SELECT doc_id,
                  CASE WHEN s_de = best THEN 'de' WHEN s_en = best THEN 'en'
                       WHEN s_es = best THEN 'es' WHEN s_fr = best THEN 'fr'
                       WHEN s_zh = best THEN 'zh' END AS pl
                FROM (SELECT *, greatest(s_de, s_en, s_es, s_fr, s_zh) best
                      FROM sc)),
         g AS (SELECT doc_id, pl, count(*) cnt FROM pl GROUP BY 1, 2),
         r AS (SELECT doc_id, pl, cnt,
                      row_number() OVER (PARTITION BY doc_id
                        ORDER BY cnt DESC, pl) rn
               FROM g),
         a AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) n_chunks,
                      CAST(count(*) AS BIGINT) n_langs,
                      max(CASE WHEN rn = 1 THEN pl END) major_lang,
                      sum(CASE WHEN rn = 1 THEN cnt END) maj
               FROM r GROUP BY 1)
         SELECT doc_id, n_chunks, n_langs, major_lang,
                round(1 - maj / n_chunks, 6) AS minority_frac
         FROM a ORDER BY doc_id""",
    // Repeated-span removal: flag position-level shared windows, merge
    // overlaps via a running-max window, rebuild each doc from the gaps
    // (string_agg ordered by piece start) plus the tail after the last
    // span. Spans are [s, e) in 1-based character positions.
    "q_remove_spans" ->
      """WITH w0 AS (SELECT doc_id, CAST(i AS BIGINT) i,
                            substr(text, CAST(i AS INT), 64) w
                     FROM documents, unnest(range(1, length(text) - 62, 16)) r(i)
                     WHERE length(text) >= 64),
         sh AS (SELECT w FROM (SELECT DISTINCT doc_id, w FROM w0)
                GROUP BY w HAVING count(*) >= 2),
         fl AS (SELECT doc_id, i FROM w0 WHERE w IN (SELECT w FROM sh)),
         m0 AS (SELECT doc_id, i,
                       max(i + 64) OVER (PARTITION BY doc_id ORDER BY i
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) pm
                FROM fl),
         m AS (SELECT doc_id, i,
                      CASE WHEN pm IS NULL OR i > pm THEN 1 ELSE 0 END nw
               FROM m0),
         sg AS (SELECT doc_id, i,
                       sum(nw) OVER (PARTITION BY doc_id ORDER BY i) seg
                FROM m),
         seg AS (SELECT doc_id, seg, min(i) s, max(i) + 64 e
                 FROM sg GROUP BY 1, 2),
         mid AS (SELECT doc_id, s AS ord,
                        lag(e, 1, 1) OVER (PARTITION BY doc_id ORDER BY s) pe,
                        s
                 FROM seg),
         pieces AS (SELECT m.doc_id, m.ord,
                           substr(d.text, CAST(m.pe AS INT),
                                  CAST(m.s - m.pe AS INT)) piece
                    FROM mid m JOIN documents d USING (doc_id)
                    UNION ALL
                    SELECT t.doc_id, 2147483647,
                           substr(d.text, CAST(t.me AS INT), length(d.text))
                    FROM (SELECT doc_id, max(e) me FROM seg GROUP BY 1) t
                         JOIN documents d USING (doc_id)),
         reb AS (SELECT doc_id, string_agg(piece, '' ORDER BY ord) clean
                 FROM pieces GROUP BY 1),
         rem AS (SELECT doc_id, CAST(sum(e - s) AS BIGINT) n_removed
                 FROM seg GROUP BY 1)
         SELECT d.doc_id, coalesce(reb.clean, d.text) AS clean_text,
                coalesce(rem.n_removed, 0) AS n_removed
         FROM documents d LEFT JOIN reb USING (doc_id)
              LEFT JOIN rem USING (doc_id)
         ORDER BY d.doc_id""",
    // Fuzzy decontamination: both corpora banded with the same MinHash
    // family (16 hashes, 4 bands), cross bucket join, df-capped exact
    // Jaccard on candidates — the q_dedup_verified pipeline across a
    // 50/50 md5-bucket split.
    "q_cross_contamination" ->
      s"""WITH d AS (SELECT doc_id, text,
                       ${bucketSql("CAST(doc_id AS VARCHAR)")} AS bucket
                     FROM documents),
         ltoks AS MATERIALIZED (SELECT doc_id, regexp_split_to_array(trim(lower(text)), ' +') t
                   FROM d WHERE bucket >= 50),
         ltri AS MATERIALIZED (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
                  FROM ltoks, unnest(range(1, len(t)-1)) r(i)),
         rtoks AS MATERIALIZED (SELECT doc_id, regexp_split_to_array(trim(lower(text)), ' +') t
                   FROM d WHERE bucket < 50),
         rtri AS MATERIALIZED (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
                  FROM rtoks, unnest(range(1, len(t)-1)) r(i)),
         lmh AS MATERIALIZED (SELECT doc_id, k, min(md5(CAST(k AS VARCHAR) || '|' || sh)) m
                 FROM ltri, unnest(range(0,16)) kk(k) GROUP BY 1,2),
         lsig AS MATERIALIZED (SELECT doc_id, list(m ORDER BY k) sig FROM lmh GROUP BY 1),
         lbands AS MATERIALIZED (SELECT doc_id, b,
                           md5(sig[4*b+1] || sig[4*b+2] || sig[4*b+3] || sig[4*b+4]) bh
                    FROM lsig, unnest(range(0,4)) bb(b)),
         rmh AS MATERIALIZED (SELECT doc_id, k, min(md5(CAST(k AS VARCHAR) || '|' || sh)) m
                 FROM rtri, unnest(range(0,16)) kk(k) GROUP BY 1,2),
         rsig AS MATERIALIZED (SELECT doc_id, list(m ORDER BY k) sig FROM rmh GROUP BY 1),
         rbands AS MATERIALIZED (SELECT doc_id, b,
                           md5(sig[4*b+1] || sig[4*b+2] || sig[4*b+3] || sig[4*b+4]) bh
                    FROM rsig, unnest(range(0,4)) bb(b)),
         cand AS MATERIALIZED (SELECT DISTINCT a.doc_id da, c.doc_id db FROM lbands a
                  JOIN rbands c ON a.b = c.b AND a.bh = c.bh),
         ltrif AS MATERIALIZED (SELECT * FROM ltri WHERE sh IN (
                     SELECT sh FROM ltri GROUP BY sh HAVING count(*) <= 100)),
         rtrif AS MATERIALIZED (SELECT * FROM rtri WHERE sh IN (
                     SELECT sh FROM rtri GROUP BY sh HAVING count(*) <= 100)),
         lsz AS MATERIALIZED (SELECT doc_id, count(*) n FROM ltrif GROUP BY 1),
         rsz AS MATERIALIZED (SELECT doc_id, count(*) n FROM rtrif GROUP BY 1),
         inter AS MATERIALIZED (SELECT da, db, count(*) i FROM cand
                   JOIN ltrif a ON a.doc_id = da
                   JOIN rtrif c ON c.doc_id = db AND c.sh = a.sh
                   GROUP BY 1, 2)
         SELECT da, db, jaccard FROM (
           SELECT da, db, round(i / (la.n + rb.n - i), 6) jaccard
           FROM inter JOIN lsz la ON la.doc_id = da JOIN rsz rb ON rb.doc_id = db)
         WHERE jaccard >= 0.3 ORDER BY da, db""",
    // Deterministic global shuffle: the oracle spells the SAME order as a
    // plain global row_number over (md5(seed:key), key); the engine's
    // two-phase bucket rank must reproduce it exactly.
    "q_shuffle_order" ->
      """SELECT doc_id,
                row_number() OVER (
                  ORDER BY md5('epoch0:' || CAST(doc_id AS VARCHAR)), doc_id)
                  AS pos
         FROM documents ORDER BY pos""",
    // Proportional interleave: per-source md5 rank i of n_s rows maps to
    // the integer-exact key floor((2i-1)*2^40 / (2*n_s)); HUGEINT keeps
    // the product exact as the engine's DECIMAL(38,0) does.
    "q_interleave" ->
      """WITH r AS (SELECT doc_id, source,
                      row_number() OVER (PARTITION BY source
                        ORDER BY md5('interleave:' || CAST(doc_id AS VARCHAR)),
                                 doc_id) AS i,
                      count(*) OVER (PARTITION BY source) AS ns
                    FROM documents WHERE source IS NOT NULL)
         SELECT doc_id, source,
                CAST((CAST(2*i-1 AS HUGEINT) * 1099511627776) // (2*ns)
                     AS BIGINT) AS ikey
         FROM r ORDER BY ikey, source, doc_id""",
    // Corpus bigram LM: adjacent-token pair counts, per-head continuation
    // mass, top-3 continuations per head (count desc, token asc).
    "q_bigram_lm" ->
      """WITH toks AS MATERIALIZED (SELECT regexp_split_to_array(trim(lower(text)), ' +') t
                       FROM documents),
         bg AS (SELECT t[i] AS w1, t[i+1] AS w2
                FROM toks, unnest(range(1, len(t))) r(i)),
         c AS (SELECT w1, w2, count(*) AS n FROM bg GROUP BY 1, 2),
         r AS (SELECT w1, w2, n,
                      CAST(sum(n) OVER (PARTITION BY w1) AS BIGINT) AS n_w1,
                      CAST(row_number() OVER (PARTITION BY w1
                        ORDER BY n DESC, w2) AS BIGINT) AS rank
               FROM c)
         SELECT w1, w2, n, n_w1, rank FROM r WHERE rank <= 3
         ORDER BY w1, rank""",
    // Per-doc rare-bigram share: exact integer occurrence masses, one
    // pinned 6-dp division; pd is referenced twice -> MATERIALIZED
    "q_bigram_novelty" ->
      """WITH t AS (SELECT doc_id,
                           regexp_split_to_array(trim(lower(text)), ' +') tk
                    FROM documents),
         bg AS (SELECT doc_id, tk[i] AS w1, tk[i+1] AS w2
                FROM t, unnest(range(1, len(tk))) r(i)
                WHERE len(tk) >= 2),
         pd AS MATERIALIZED (SELECT doc_id, w1, w2, count(*) m
                             FROM bg GROUP BY 1, 2, 3),
         g AS (SELECT w1, w2, sum(m) n FROM pd GROUP BY 1, 2)
         SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_bigrams,
                CAST(sum(CASE WHEN n <= 2 THEN m ELSE 0 END) AS BIGINT)
                  AS n_rare,
                round(CAST(sum(CASE WHEN n <= 2 THEN m ELSE 0 END) AS DOUBLE)
                      / CAST(sum(m) AS DOUBLE), 6) AS novelty
         FROM pd JOIN g USING (w1, w2) GROUP BY doc_id
         ORDER BY doc_id""",
    // Near-dup graph degree over the MinHash-verified pairs (vp CTE shared
    // with q_dedup_verified); docs without a partner report 0.
    "q_dup_degree" ->
      s"""WITH $verifiedPairsSql,
         deg AS MATERIALIZED (SELECT doc_id, CAST(count(*) AS BIGINT) AS degree FROM
                   (SELECT da AS doc_id FROM vp
                    UNION ALL SELECT db FROM vp)
                 GROUP BY 1)
         SELECT d.doc_id, coalesce(deg.degree, 0) AS degree
         FROM documents d LEFT JOIN deg ON d.doc_id = deg.doc_id
         ORDER BY d.doc_id""",
    // Sliding windows: every event covers the 4 hour-long windows whose
    // 15-min-aligned start is within the past hour — derived by k=0..3
    // offsets from the event's 15-min bucket (second precision, matching
    // Spark's µs-truncated window membership).
    "q_event_sliding" ->
      """WITH e AS (SELECT CAST(epoch(date_trunc('second', ts)) AS BIGINT) es,
                           event_type
                    FROM events),
         w AS (SELECT (es // 900) * 900 - k * 900 AS win_ts, event_type
               FROM e, unnest(range(0, 4)) r(k))
         SELECT win_ts, event_type, count(*) AS n
         FROM w GROUP BY 1, 2 ORDER BY win_ts, event_type""",
    // Winsorization: clamp into the global [p05, p95] percentile band
    // (quantile_cont = Spark's percentile interpolation), then aggregate
    // per market segment with a DECIMAL-exact sum.
    "q_winsorize" ->
      """WITH b AS (SELECT quantile_cont(c_acctbal, 0.05) plo,
                           quantile_cont(c_acctbal, 0.95) phi
                    FROM customer)
         SELECT c_mktsegment, count(*) AS n,
                round(CAST(sum(CAST(least(greatest(c_acctbal, plo), phi)
                                    AS DECIMAL(38,6))) AS DOUBLE), 6) AS sum_w,
                round(min(least(greatest(c_acctbal, plo), phi)), 6) AS min_w,
                round(max(least(greatest(c_acctbal, plo), phi)), 6) AS max_w
         FROM customer, b GROUP BY 1 ORDER BY c_mktsegment""",
    // NULL group/value/id rows dropped on both sides before the rank
    // (NULL sort-order parity note in the verify gotchas).
    // Tiebreak within equal values is the md5 order — the contract that
    // lets the Spark side rank without any group-partitioned window
    // (Sampling.rankByValueGrouped; the md5 bucket must prefix the sort).
    "q_percentile_rank" ->
      """WITH f AS (SELECT doc_id, lang, n_chars FROM documents
                    WHERE doc_id IS NOT NULL AND lang IS NOT NULL
                      AND n_chars IS NOT NULL)
         SELECT doc_id AS id, lang AS grp, n_chars AS v,
                CAST(row_number() OVER (PARTITION BY lang
                       ORDER BY n_chars, md5(CAST(doc_id AS VARCHAR)),
                                doc_id) AS BIGINT) AS rnk,
                CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS n
         FROM f ORDER BY grp, rnk""",
    // Trigrams replay the q_contamination construction (t[i]||' '||...);
    // docs with <3 tokens contribute no trigram rows on either engine.
    "q_diversity" ->
      """WITH base AS (SELECT source AS grp, doc_id,
                         regexp_split_to_array(trim(lower(text)), ' +') t
                       FROM documents WHERE source IS NOT NULL),
         nd AS (SELECT grp, count(doc_id) n_docs FROM base GROUP BY 1),
         tok AS (SELECT grp, unnest(t) tok FROM base),
         ta AS (SELECT grp, count(*) n_tokens,
                       count(DISTINCT tok) n_distinct_tokens
                FROM tok WHERE length(tok) > 0 GROUP BY 1),
         tri AS MATERIALIZED (SELECT grp, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
                 FROM base, unnest(range(1, len(t)-1)) r(i)),
         ra AS (SELECT grp, count(*) n_trigrams,
                       count(DISTINCT sh) n_distinct_trigrams
                FROM tri GROUP BY 1)
         SELECT grp, CAST(n_docs AS BIGINT) AS n_docs,
                CAST(coalesce(n_tokens, 0) AS BIGINT) AS n_tokens,
                CAST(coalesce(n_distinct_tokens, 0) AS BIGINT)
                  AS n_distinct_tokens,
                CAST(coalesce(n_trigrams, 0) AS BIGINT) AS n_trigrams,
                CAST(coalesce(n_distinct_trigrams, 0) AS BIGINT)
                  AS n_distinct_trigrams
         FROM nd LEFT JOIN ta USING (grp) LEFT JOIN ra USING (grp)
         ORDER BY grp""",
    // Incremental delta dedup: the crossJaccardVerified CTE chain over an
    // 80/20 md5-bucket split (corpus >= 20, delta < 20) + an exact-md5
    // match CTE; exact wins, else best fuzzy by (jaccard desc, id asc).
    "q_dedup_delta" -> deltaDedupOracleSql,
    // identical contract for the STREAMED classification (X117): the
    // declared query runs as one AvailableNow trigger, so the streamed
    // verdicts are bit-identical to the one-shot batch operator
    "q_stream_neardup" -> deltaDedupOracleSql,
    // Token-budget selection: inclusive running char total per source in
    // (n_chars desc, doc_id) order; keep rows within the 3000 budget.
    "q_token_budget" ->
      """WITH r AS (SELECT doc_id, source, n_chars,
                      CAST(sum(n_chars) OVER (PARTITION BY source
                        ORDER BY n_chars DESC, doc_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
                    FROM documents)
         SELECT doc_id, source, n_chars, cum_tokens
         FROM r WHERE cum_tokens <= 3000 ORDER BY doc_id""",
    // Curriculum rank: the engine's bucketed two-phase rank must equal the
    // one-window global rank under (value, md5(key), key); decile is
    // integer floor division.
    "q_curriculum" ->
      """WITH r AS (SELECT doc_id, n_chars,
                      row_number() OVER (ORDER BY n_chars,
                        md5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk,
                      count(*) OVER () AS tot
                    FROM documents
                    WHERE n_chars IS NOT NULL AND doc_id IS NOT NULL)
         SELECT doc_id, n_chars, rnk,
                CAST(((rnk - 1) * 10) // tot AS BIGINT) AS decile
         FROM r ORDER BY doc_id""",
    // Trailing z-score anomaly: integer-exact k/sum/sum-of-squares over a
    // 24-row trailing frame; dev and z are single correctly-rounded IEEE
    // ops over exact integers.
    "q_event_anomaly" ->
      """WITH c AS (SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) win_ts,
                           event_type, count(*) AS n
                    FROM events GROUP BY 1, 2),
         t AS (SELECT win_ts, event_type, n,
                      count(n) OVER w AS k,
                      sum(n) OVER w AS s,
                      sum(n*n) OVER w AS ss
               FROM c WINDOW w AS (PARTITION BY event_type ORDER BY win_ts
                 ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
         SELECT win_ts, event_type, n,
                round((n*k - s) / k, 6) AS dev,
                CASE WHEN k*ss - s*s > 0
                     THEN round((n*k - s) / sqrt(k*ss - s*s), 6) END AS z
         FROM t WHERE k = 24 ORDER BY win_ts, event_type""",
    // Length buckets: first ladder step that fits, -1 overflow; integer
    // padding-waste accounting. Everything integral is CAST to BIGINT —
    // the CASE ladder would otherwise type as INTEGER and the sums as
    // HUGEINT, neither of which matches Spark's LongType.
    "q_length_buckets" ->
      """WITH b AS (SELECT CAST(CASE WHEN n_chars <= 64 THEN 64
                                WHEN n_chars <= 128 THEN 128
                                WHEN n_chars <= 256 THEN 256
                                WHEN n_chars <= 512 THEN 512
                                ELSE -1 END AS BIGINT) AS bucket, n_chars
                    FROM documents)
         SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS sum_tokens,
                CAST(sum(CASE WHEN bucket = -1 THEN 0
                         ELSE bucket - n_chars END) AS BIGINT) AS sum_padding
         FROM b GROUP BY 1 ORDER BY bucket""",
    // Vocabulary build: corpus token counts + df, ids in (n desc,
    // md5(token), token) order — the engine's two-phase rank must equal
    // the plain window rank.
    "q_build_vocab" ->
      """WITH tok0 AS (SELECT doc_id,
                        unnest(regexp_split_to_array(trim(lower(text)), ' +'))
                          AS token
                      FROM documents),
         tok AS (SELECT * FROM tok0 WHERE length(token) > 0),
         c AS (SELECT token, count(*) AS n, count(DISTINCT doc_id) AS df
               FROM tok GROUP BY 1),
         f AS (SELECT * FROM c WHERE df >= 2),
         r AS (SELECT token, n, df,
                      row_number() OVER (ORDER BY n DESC, md5(token), token)
                        AS token_id
               FROM f)
         SELECT token, n, df, token_id FROM r WHERE token_id <= 200
         ORDER BY token_id""",
    // OOV rate: per-doc token totals vs the top-50 vocabulary cut.
    "q_oov_rate" ->
      """WITH tok0 AS (SELECT doc_id,
                        unnest(regexp_split_to_array(trim(lower(text)), ' +'))
                          AS token
                      FROM documents),
         tok AS (SELECT * FROM tok0 WHERE length(token) > 0),
         c AS (SELECT token, count(*) AS n, count(DISTINCT doc_id) AS df
               FROM tok GROUP BY 1),
         f AS (SELECT * FROM c WHERE df >= 2),
         r AS (SELECT token,
                      row_number() OVER (ORDER BY n DESC, md5(token), token)
                        AS token_id
               FROM f),
         voc AS (SELECT token FROM r WHERE token_id <= 50)
         SELECT doc_id, count(*) AS n_tokens,
                CAST(sum(CASE WHEN token IN (SELECT token FROM voc)
                              THEN 0 ELSE 1 END) AS BIGINT) AS n_oov
         FROM tok GROUP BY 1 ORDER BY doc_id""",
    // Skip-gram pairs: lateral position ranges give each token its ±2
    // context window; integer counts + marginals (PMI pieces).
    "q_skipgram" ->
      """WITH toks AS MATERIALIZED (SELECT regexp_split_to_array(trim(lower(text)), ' +') t
                       FROM documents),
         p AS (SELECT t[i] AS a, t[j] AS b
               FROM toks,
                    unnest(range(1, len(t)+1)) r(i),
                    unnest(range(greatest(1, i-2),
                                 least(len(t), i+2)+1)) s(j)
               WHERE j != i AND length(t[i]) > 0 AND length(t[j]) > 0),
         c AS (SELECT a, b, count(*) AS n_ab FROM p GROUP BY 1, 2),
         m AS (SELECT a, b, n_ab,
                      CAST(sum(n_ab) OVER (PARTITION BY a) AS BIGINT) AS n_a,
                      CAST(sum(n_ab) OVER (PARTITION BY b) AS BIGINT) AS n_b
               FROM c),
         tot AS (SELECT CAST(sum(n_ab) AS BIGINT) AS n_pairs FROM c)
         SELECT a, b, n_ab, n_a, n_b, n_pairs FROM m, tot
         ORDER BY n_ab DESC, a, b LIMIT 50""",
    // Keyword search: literal term filter, distinct-term + tf scoring,
    // top-10 under the total order (n_terms desc, total_tf desc, doc_id).
    // X129 percolation: the stored-query registry as a VALUES literal,
    // the same conjunctive count = need arithmetic — all integers.
    "q_percolate" -> percolateOracleSql,
    // X129b streaming percolation: the conjunction is keyed by doc_id,
    // so micro-batch boundaries cannot move a match — the final
    // complete-mode table equals the batch operator by construction.
    "q_stream_percolate" -> percolateOracleSql,
    "q_keyword_search" ->
      """WITH tk AS (SELECT doc_id,
                unnest(regexp_split_to_array(trim(lower(text)), ' +')) tok
                     FROM documents),
         h AS (SELECT doc_id, tok, count(*) tf FROM tk
               WHERE tok IN ('spark', 'join', 'window') GROUP BY 1, 2),
         s AS (SELECT doc_id, CAST(count(*) AS BIGINT) n_terms,
                      CAST(sum(tf) AS BIGINT) total_tf
               FROM h GROUP BY 1)
         SELECT doc_id, n_terms, total_tf FROM s
         ORDER BY n_terms DESC, total_tf DESC, doc_id LIMIT 10""",
    // X138 more-like-this: doc 42's top-8 salient terms (tf desc, df
    // asc, tok asc; df ≤ 0.8·N), then the exact bm25 integer chain over
    // the matched docs, self excluded.
    "q_more_like_this" ->
      """WITH tkarr AS (SELECT doc_id,
                regexp_split_to_array(trim(lower(text)), ' +') AS t
                        FROM documents),
         tk AS (SELECT doc_id, unnest(t) AS tok FROM tkarr),
         tf0 AS (SELECT doc_id, tok, count(*) AS tf FROM tk GROUP BY 1, 2),
         dfreq AS (SELECT tok, count(*) AS df FROM tf0 GROUP BY 1),
         n AS (SELECT count(DISTINCT doc_id) AS nn FROM tf0),
         q AS (SELECT tf0.tok FROM tf0 JOIN dfreq USING (tok), n
               WHERE tf0.doc_id = 42 AND dfreq.df <= 0.8 * n.nn
               ORDER BY tf0.tf DESC, dfreq.df ASC, tf0.tok ASC LIMIT 8),
         lens AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM tkarr),
         corp AS (SELECT count(*) AS nd, sum(dl) // count(*) AS avgdl
                  FROM lens),
         h AS (SELECT doc_id, tok, count(*) AS tf FROM tk
               WHERE tok IN (SELECT tok FROM q) GROUP BY 1, 2),
         dfq AS (SELECT tok, count(*) AS df FROM h GROUP BY 1),
         sc AS (SELECT h.doc_id,
                       ((corp.nd - dfq.df) * 1000000) // (dfq.df + 1) AS idf,
                       25 + (75 * ((lens.dl * 100) // corp.avgdl)) // 100
                         AS inner_w,
                       h.tf
                FROM h JOIN dfq USING (tok)
                     JOIN lens ON lens.doc_id = h.doc_id, corp),
         s AS (SELECT doc_id,
                      CAST(sum((idf * tf * 2200) //
                               (tf * 1000 + 12 * inner_w)) AS BIGINT)
                        AS score,
                      CAST(count(*) AS BIGINT) AS n_terms
               FROM sc GROUP BY doc_id)
         SELECT doc_id, score, n_terms FROM s WHERE doc_id <> 42
         ORDER BY score DESC, doc_id LIMIT 10""",
    // X135 blocklist phrase matching: replace-counting identity over
    // the lower-cased text, hits only, 1-based first position.
    "q_blocklist" ->
      """WITH p(pattern) AS (VALUES ('hash join'), ('table scan'),
                                    ('slow query'), ('vector'),
                                    ('zzqx never')),
         d AS (SELECT doc_id, lower(coalesce(text, '')) x FROM documents)
         SELECT doc_id, pattern,
                CAST((length(x) - length(replace(x, pattern, '')))
                  // length(pattern) AS BIGINT) AS n_occ,
                CAST(strpos(x, pattern) AS BIGINT) AS first_pos
         FROM d, p
         WHERE length(x) - length(replace(x, pattern, '')) > 0
         ORDER BY doc_id, pattern""",
    // BPE merge pass: (word, count) vocab frame first, then adjacent
    // char pairs weighted by word count; top-20 by (n desc, pair).
    "q_bpe_merge" ->
      """WITH tk AS (SELECT unnest(regexp_split_to_array(trim(lower(text)), ' +')) w
                     FROM documents),
         wc AS (SELECT w, count(*) n FROM tk WHERE len(w) > 0 GROUP BY 1),
         pr AS (SELECT substring(w, i, 2) AS pair, n
                FROM wc, unnest(range(1, len(w))) r(i) WHERE len(w) >= 2),
         agg AS (SELECT pair, CAST(sum(n) AS BIGINT) n FROM pr GROUP BY 1)
         SELECT pair, n FROM agg ORDER BY n DESC, pair LIMIT 20""",
    // Bigram-LM novelty: corpus bigram counts joined back per occurrence;
    // docs with < 2 tokens report all-zero.
    "q_lm_novelty" ->
      """WITH toks AS MATERIALIZED (SELECT doc_id, regexp_split_to_array(trim(lower(text)), ' +') t
                       FROM documents),
         bg AS (SELECT doc_id, t[i] || ' ' || t[i+1] AS bg
                FROM toks, unnest(range(1, len(t))) r(i)),
         c AS (SELECT bg, CAST(count(*) AS BIGINT) c FROM bg GROUP BY 1),
         j AS (SELECT b.doc_id, CAST(count(*) AS BIGINT) n_bigrams,
                      CAST(count(DISTINCT b.bg) AS BIGINT) n_types,
                      CAST(sum(c.c) AS BIGINT) mass,
                      CAST(min(c.c) AS BIGINT) min_c
               FROM bg b JOIN c ON b.bg = c.bg GROUP BY 1)
         SELECT d.doc_id, coalesce(j.n_bigrams, 0) AS n_bigrams,
                coalesce(j.n_types, 0) AS n_types,
                coalesce(j.mass, 0) AS mass, coalesce(j.min_c, 0) AS min_c
         FROM documents d LEFT JOIN j ON d.doc_id = j.doc_id
         ORDER BY d.doc_id""",
    // Dup-graph triangles over the SAME verified pair frame as
    // q_dedup_verified / q_dup_degree (shared vp CTE): a<b<c, each
    // triangle once.
    "q_triangles" ->
      s"""WITH $verifiedPairsSql
         SELECT e1.da AS a, e1.db AS b, e2.db AS c
         FROM vp e1 JOIN vp e2 ON e1.db = e2.da
              JOIN vp e3 ON e3.da = e1.da AND e3.db = e2.db
         ORDER BY a, b, c""",
    // Fixed-point PageRank: 5 unrolled iterations of the integer
    // recurrence over the LSH candidate graph — every step `//` on
    // positive operands ≡ Spark's truncating div; DuckDB's HUGEINT sum
    // promotion ≡ the Spark side's DECIMAL(38,0) partials.
    "q_pagerank" ->
      s"""WITH $lshCandSql,
         edges AS MATERIALIZED (SELECT da s, db d FROM cand UNION ALL SELECT db, da FROM cand),
         deg AS MATERIALIZED (SELECT s, count(*) dg FROM edges GROUP BY s),
         cnt AS MATERIALIZED (SELECT count(*) nn FROM deg),
         it0 AS MATERIALIZED (SELECT s AS n, 1000000000000 // (SELECT nn FROM cnt) AS r
                 FROM deg),
         ${(1 to 5).map(pageRankIterSql).mkString(",\n         ")}
         SELECT n AS node, CAST(r AS BIGINT) AS pr FROM it5
         ORDER BY pr DESC, node""",
    // MinHash Jaccard estimation: agreeing signature components per LSH
    // candidate pair, integer numerator out of k=16. Signature agreement
    // is a pure function of the two TEXTS, so it is computed once per
    // candidate text pair and expanded to doc pairs (identical-text
    // pairs agree on all 16 components, exactly the per-doc value).
    "q_jaccard_est" ->
      s"""WITH $lshCandSql,
         test AS (SELECT ta, tb,
                         sum(CASE WHEN a.m = b.m THEN 1 ELSE 0 END) n_eq
                  FROM tcand JOIN tmh a ON a.tid = ta
                       JOIN tmh b ON b.tid = tb AND b.k = a.k
                  GROUP BY ta, tb)
         SELECT DISTINCT least(x.doc_id, y.doc_id) AS da,
                greatest(x.doc_id, y.doc_id) AS db,
                CAST(n_eq AS BIGINT) AS n_eq, CAST(16 AS BIGINT) AS k
         FROM test JOIN dd x ON x.tid = ta JOIN dd y ON y.tid = tb
         WHERE x.doc_id <> y.doc_id
         ORDER BY da, db""",
    // Cluster sizes: the q_dedup_components reachability labels rolled up
    // to (size -> n_clusters, n_docs); text-level recursion (textCompSql).
    "q_cluster_sizes" ->
      s"""WITH RECURSIVE $lshCandSql,
         $textCompSql,
         szs AS (SELECT c, count(*) sz FROM comp GROUP BY c)
         SELECT sz AS size, CAST(count(*) AS BIGINT) AS n_clusters,
                CAST(sum(sz) AS BIGINT) AS n_docs
         FROM szs GROUP BY sz ORDER BY size""",
    // k-core: 8 unrolled peel rounds (each drops nodes of degree < k and
    // their edges) over the LSH candidate graph — peeling is monotone, so
    // the fixed unroll equals the engine's early-exit loop at any state
    // past convergence (KCoreSpec asserts convergence on the fixture).
    "q_kcore" ->
      s"""WITH $lshCandSql,
         e0 AS (SELECT da, db FROM cand),
         ${(1 to 8).map(kCoreRoundSql(_, k = 2)).mkString(",\n         ")}
         SELECT x AS node, CAST(count(*) AS BIGINT) AS degree
         FROM (SELECT da x FROM e8 UNION ALL SELECT db x FROM e8)
         GROUP BY x ORDER BY node""",
    // Duplicated-byte accounting over the event log: identical payloads
    // share their length, so min(length) on the oracle side equals the
    // engine's per-group pick (character length on both engines).
    "q_dup_mass" ->
      """WITH g AS (SELECT event_type AS grp, md5(props) AS h, count(*) AS n,
                           min(length(props)) AS c
                    FROM events GROUP BY 1, 2)
         SELECT grp, CAST(count(*) AS BIGINT) AS n_dup_groups,
                CAST(sum(n - 1) AS BIGINT) AS n_removable,
                CAST(sum((n - 1) * c) AS BIGINT) AS wasted_chars
         FROM g WHERE n >= 2 GROUP BY grp ORDER BY grp""",
    // Median/MAD by order statistics: the middle VALUES are
    // tiebreak-independent, so the oracle may rank with any within-value
    // order; (lo+hi)/2 and abs(v-med) are single IEEE ops both engines
    // share bit-exactly.
    "q_mad" ->
      """WITH f AS (SELECT lang AS g, CAST(n_chars AS DOUBLE) AS v, doc_id
                    FROM documents
                    WHERE lang IS NOT NULL AND n_chars IS NOT NULL
                      AND doc_id IS NOT NULL),
         r1 AS (SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) rnk,
                       count(*) OVER (PARTITION BY g) n
                FROM f),
         m AS (SELECT g, max(n) AS n,
                      max(CASE WHEN rnk = (n + 1) // 2 THEN v END) AS med_lo,
                      max(CASE WHEN rnk = n // 2 + 1 THEN v END) AS med_hi
               FROM r1 GROUP BY g),
         d AS (SELECT f.g, abs(f.v - (m.med_lo + m.med_hi) / 2) AS dv, f.doc_id
               FROM f JOIN m ON f.g = m.g),
         r2 AS (SELECT g, dv, row_number() OVER (PARTITION BY g ORDER BY dv) rnk,
                       count(*) OVER (PARTITION BY g) n
                FROM d),
         m2 AS (SELECT g, max(CASE WHEN rnk = (n + 1) // 2 THEN dv END) AS mad_lo,
                       max(CASE WHEN rnk = n // 2 + 1 THEN dv END) AS mad_hi
                FROM r2 GROUP BY g)
         SELECT m.g AS grp, CAST(m.n AS BIGINT) AS n,
                m.med_lo, m.med_hi, (m.med_lo + m.med_hi) / 2 AS med,
                m2.mad_lo, m2.mad_hi, (m2.mad_lo + m2.mad_hi) / 2 AS mad
         FROM m JOIN m2 ON m.g = m2.g ORDER BY grp""",
    // Gini over per-key counts: Σ(2·rnk−n−1)·x is invariant under
    // reordering equal counts, so the oracle's plain row_number order
    // matches the engine's md5-tiebroken two-phase rank.
    "q_skew_gini" ->
      """WITH c AS (SELECT user_id AS k, count(*) AS cnt FROM events
                    WHERE user_id IS NOT NULL GROUP BY 1),
         r AS (SELECT cnt, row_number() OVER (ORDER BY cnt, k) AS rnk FROM c),
         a AS (SELECT count(*) AS n, sum(cnt) AS t, sum(2 * rnk * cnt) AS s2
               FROM r),
         p AS (SELECT cnt AS p99 FROM r, a WHERE rnk = (99 * a.n + 99) // 100),
         m AS (SELECT max(cnt) AS mx FROM c)
         SELECT CAST(a.n AS BIGINT) AS n_keys, CAST(a.t AS BIGINT) AS total_rows,
                CAST(a.s2 - (a.n + 1) * a.t AS BIGINT) AS gini_num,
                CAST(a.n * a.t AS BIGINT) AS gini_den,
                CAST(m.mx AS BIGINT) AS max_cnt, CAST(p.p99 AS BIGINT) AS p99_cnt
         FROM a, m, p ORDER BY n_keys""",
    // BM25 in rational fixed point: every weight an integer `//` chain on
    // positive operands — mirrors the engine's div order exactly.
    "q_bm25" ->
      """WITH tkarr AS (SELECT doc_id,
                regexp_split_to_array(trim(lower(text)), ' +') AS t
                        FROM documents),
         lens AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM tkarr),
         corp AS (SELECT count(*) AS nd, sum(dl) // count(*) AS avgdl
                  FROM lens),
         tk AS (SELECT doc_id, unnest(t) AS tok FROM tkarr),
         h AS (SELECT doc_id, tok, count(*) AS tf FROM tk
               WHERE tok IN ('spark', 'join', 'window') GROUP BY 1, 2),
         dfq AS (SELECT tok, count(*) AS df FROM h GROUP BY 1),
         sc AS (SELECT h.doc_id,
                       ((corp.nd - dfq.df) * 1000000) // (dfq.df + 1) AS idf,
                       25 + (75 * ((lens.dl * 100) // corp.avgdl)) // 100
                         AS inner_w,
                       h.tf
                FROM h JOIN dfq USING (tok)
                     JOIN lens ON lens.doc_id = h.doc_id, corp),
         s AS (SELECT doc_id,
                      CAST(sum((idf * tf * 2200) //
                               (tf * 1000 + 12 * inner_w)) AS BIGINT) AS score,
                      CAST(count(*) AS BIGINT) AS n_terms
               FROM sc GROUP BY doc_id)
         SELECT doc_id, score, n_terms FROM s
         ORDER BY score DESC, doc_id LIMIT 20""",
    // X120 persisted text index: the probe's scoring is the identical
    // integer-exact BM25 chain, so the oracle is the same replay — the
    // index layout (bucketed posting lists, denormalized dl/df, pointer
    // publish) changes WHERE the numbers come from, not the numbers.
    "q_text_index" ->
      """WITH tkarr AS (SELECT doc_id,
                regexp_split_to_array(trim(lower(text)), ' +') AS t
                        FROM documents),
         lens AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM tkarr),
         corp AS (SELECT count(*) AS nd, sum(dl) // count(*) AS avgdl
                  FROM lens),
         tk AS (SELECT doc_id, unnest(t) AS tok FROM tkarr),
         h AS (SELECT doc_id, tok, count(*) AS tf FROM tk
               WHERE tok IN ('spark', 'join', 'window') GROUP BY 1, 2),
         dfq AS (SELECT tok, count(*) AS df FROM h GROUP BY 1),
         sc AS (SELECT h.doc_id,
                       ((corp.nd - dfq.df) * 1000000) // (dfq.df + 1) AS idf,
                       25 + (75 * ((lens.dl * 100) // corp.avgdl)) // 100
                         AS inner_w,
                       h.tf
                FROM h JOIN dfq USING (tok)
                     JOIN lens ON lens.doc_id = h.doc_id, corp),
         s AS (SELECT doc_id,
                      CAST(sum((idf * tf * 2200) //
                               (tf * 1000 + 12 * inner_w)) AS BIGINT) AS score,
                      CAST(count(*) AS BIGINT) AS n_terms
               FROM sc GROUP BY doc_id)
         SELECT doc_id, score, n_terms FROM s
         ORDER BY score DESC, doc_id LIMIT 20""",
    // X120f Boolean-AND probe: the q_text_index scoring restricted to
    // docs matching ALL THREE terms — the conjunction is a HAVING on the
    // per-doc term count; everything else is the identical integer chain.
    "q_bool_search" ->
      """WITH tkarr AS (SELECT doc_id,
                regexp_split_to_array(trim(lower(text)), ' +') AS t
                        FROM documents),
         lens AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM tkarr),
         corp AS (SELECT count(*) AS nd, sum(dl) // count(*) AS avgdl
                  FROM lens),
         tk AS (SELECT doc_id, unnest(t) AS tok FROM tkarr),
         h AS (SELECT doc_id, tok, count(*) AS tf FROM tk
               WHERE tok IN ('hash', 'join', 'table') GROUP BY 1, 2),
         dfq AS (SELECT tok, count(*) AS df FROM h GROUP BY 1),
         sc AS (SELECT h.doc_id,
                       ((corp.nd - dfq.df) * 1000000) // (dfq.df + 1) AS idf,
                       25 + (75 * ((lens.dl * 100) // corp.avgdl)) // 100
                         AS inner_w,
                       h.tf
                FROM h JOIN dfq USING (tok)
                     JOIN lens ON lens.doc_id = h.doc_id, corp),
         s AS (SELECT doc_id,
                      CAST(sum((idf * tf * 2200) //
                               (tf * 1000 + 12 * inner_w)) AS BIGINT) AS score,
                      CAST(count(*) AS BIGINT) AS n_terms
               FROM sc GROUP BY doc_id
               HAVING count(*) = 3)
         SELECT doc_id, score, n_terms FROM s
         ORDER BY score DESC, doc_id LIMIT 20""",
    // X120b append lifecycle: nd/avgdl FROZEN over the base (even) half;
    // df per posting row is the base's df where the token exists there,
    // else the append batch's own df (base rows always have a base df by
    // construction — the doc itself carries the token). idf clamps at 0,
    // matching the probe's greatest(nd - df, 0). X124 (streaming ingest)
    // replays the SAME oracle: the query terms all exist in the base
    // index, and corpus-known terms score batch-split-invariantly (each
    // micro-batch's pruned lookup finds the base df) — spec-pinned
    // across three forced micro-batches in StreamingSpec.
    "q_text_append" -> oracleSqlTextAppend,
    // X124 streaming ingest — same result as the one-shot append (see
    // the q_text_append comment); the oracle is shared by construction.
    "q_stream_text_index" -> oracleSqlTextAppend,
    // X120d compaction never changes content — the oracle is the
    // append's (the query itself pins probe-identity and file shrink).
    "q_text_compact" -> oracleSqlTextAppend,
    // X120e phrase search: a phrase occurrence at 1-based start i is
    // t[i]='table' ∧ t[i+1]='hash'; the count per doc replays the
    // index's position-intersection exactly.
    "q_phrase_search" ->
      """WITH t AS (SELECT doc_id,
                regexp_split_to_array(trim(lower(text)), ' +') AS t
                    FROM documents),
         m AS (SELECT doc_id,
                      CAST(len([i FOR i IN range(1, len(t))
                        IF t[i] = 'table' AND t[i+1] = 'hash'])
                        AS BIGINT) AS n_occurrences
               FROM t)
         SELECT doc_id, n_occurrences FROM m WHERE n_occurrences > 0
         ORDER BY n_occurrences DESC, doc_id LIMIT 20""",
    // X120c delete: survivors keep their BUILD-TIME df and the frozen
    // nd/avgdl (staleness = the rebuild contract), so the oracle scores
    // with full-corpus statistics and restricts OUTPUT to survivors.
    "q_text_delete" ->
      """WITH tkarr AS (SELECT doc_id,
                regexp_split_to_array(trim(lower(text)), ' +') AS t
                        FROM documents),
         lens AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM tkarr),
         corp AS (SELECT count(*) AS nd, sum(dl) // count(*) AS avgdl
                  FROM lens),
         tk AS (SELECT doc_id, unnest(t) AS tok FROM tkarr),
         h AS (SELECT doc_id, tok, count(*) AS tf FROM tk
               WHERE tok IN ('spark', 'join', 'window') GROUP BY 1, 2),
         dfq AS (SELECT tok, count(*) AS df FROM h GROUP BY 1),
         sc AS (SELECT h.doc_id,
                       (greatest(corp.nd - dfq.df, 0) * 1000000)
                         // (dfq.df + 1) AS idf,
                       25 + (75 * ((lens.dl * 100) // corp.avgdl)) // 100
                         AS inner_w,
                       h.tf
                FROM h JOIN dfq USING (tok)
                     JOIN lens ON lens.doc_id = h.doc_id, corp),
         s AS (SELECT doc_id,
                      CAST(sum((idf * tf * 2200) //
                               (tf * 1000 + 12 * inner_w)) AS BIGINT) AS score,
                      CAST(count(*) AS BIGINT) AS n_terms
               FROM sc GROUP BY doc_id)
         SELECT doc_id, score, n_terms FROM s
         WHERE doc_id % 7 <> 3
         ORDER BY score DESC, doc_id LIMIT 20""",
    // X123 chunk retrieval: the q_chunk_text window construction feeds
    // the q_bm25 integer chain at CHUNK granularity; chunk_id packs
    // (doc_id, chunk_no) losslessly on both sides.
    "q_chunk_retrieve" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS L FROM documents),
         c AS (SELECT doc_id, i AS chunk_no,
                 substr(text, CAST(i * 400 + 1 AS INT), 500) AS chunk
               FROM d, unnest(range(0,
                 greatest(1, CAST(ceil(L / 400.0) AS BIGINT)))) r(i)),
         ch AS (SELECT doc_id * 100000 + chunk_no AS cid, chunk FROM c),
         tkarr AS (SELECT cid,
                regexp_split_to_array(trim(lower(chunk)), ' +') AS t
                   FROM ch),
         lens AS (SELECT cid, CAST(len(t) AS BIGINT) AS dl FROM tkarr),
         corp AS (SELECT count(*) AS nd, sum(dl) // count(*) AS avgdl
                  FROM lens),
         tk AS (SELECT cid, unnest(t) AS tok FROM tkarr),
         h AS (SELECT cid, tok, count(*) AS tf FROM tk
               WHERE tok IN ('spark', 'join', 'window') GROUP BY 1, 2),
         dfq AS (SELECT tok, count(*) AS df FROM h GROUP BY 1),
         sc AS (SELECT h.cid,
                       ((corp.nd - dfq.df) * 1000000) // (dfq.df + 1) AS idf,
                       25 + (75 * ((lens.dl * 100) // corp.avgdl)) // 100
                         AS inner_w,
                       h.tf
                FROM h JOIN dfq USING (tok)
                     JOIN lens ON lens.cid = h.cid, corp),
         s AS (SELECT cid,
                      CAST(sum((idf * tf * 2200) //
                               (tf * 1000 + 12 * inner_w)) AS BIGINT) AS score,
                      CAST(count(*) AS BIGINT) AS n_terms
               FROM sc GROUP BY cid),
         top AS (SELECT cid, score, n_terms FROM s
                 ORDER BY score DESC, cid LIMIT 20)
         SELECT cid // 100000 AS doc_id, cid % 100000 AS chunk_no,
                score, n_terms
         FROM top ORDER BY score DESC, doc_id, chunk_no""",
    // X122b prefix trim over the synthesized per-source banner: the LCP
    // CTE chain on the bannered text, then a map-side strip per doc.
    "q_prefix_trim" ->
      """WITH d AS (SELECT doc_id, source,
                           '[' || source || '] ' || text AS text
                    FROM documents),
         m AS (SELECT source, min(text) AS a, max(text) AS b
               FROM d GROUP BY 1),
         l AS (SELECT source, a, b,
                      least(length(a), length(b)) AS lim
               FROM m),
         p AS (SELECT source,
                      coalesce(list_min([i FOR i IN range(1, lim + 1)
                          IF substr(a, CAST(i AS INT), 1)
                             <> substr(b, CAST(i AS INT), 1)]) - 1,
                        lim) AS lcp
               FROM l)
         SELECT d.doc_id, d.source,
                CAST(p.lcp AS BIGINT) AS removed_chars,
                CAST(length(d.text) - p.lcp AS BIGINT) AS clean_chars,
                md5(substr(d.text, CAST(p.lcp AS INT) + 1)) AS clean_hash
         FROM d JOIN p USING (source) ORDER BY d.doc_id""",
    // X121 duplicate-window fraction: stride-1 8-token windows (short doc
    // = one whole-doc window), global first occurrence by (doc_id, pos),
    // everything after rn=1 is a duplicate window.
    "q_dup_windows" ->
      """WITH tok AS (SELECT doc_id,
                             regexp_split_to_array(trim(lower(text)), ' +') t
                      FROM documents),
         ix AS (SELECT doc_id, t,
                       unnest(range(CAST(greatest(len(t) - 8, 0) + 1
                         AS BIGINT))) AS i
                FROM tok),
         win AS (SELECT doc_id, i AS pos,
                        array_to_string(t[i+1 : i+8], ' ') AS w
                 FROM ix),
         f AS (SELECT doc_id, pos,
                      row_number() OVER (PARTITION BY w
                        ORDER BY doc_id, pos) rn
               FROM win)
         SELECT doc_id, count(*) AS n_windows,
                CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS dup_windows,
                round(CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END)
                    AS DOUBLE) / count(*), 6) AS dup_frac
         FROM f GROUP BY doc_id ORDER BY doc_id""",
    // X131b exact-substring cut list: duplicated 4-token windows (first
    // occurrence by (doc_id, pos) kept — text-keyed in the oracle, the
    // engine's xxhash64 key equal modulo the documented 64-bit
    // collision policy), merged per doc by gaps-and-islands.
    "q_substr_cut" ->
      """WITH tok AS (SELECT doc_id,
                             regexp_split_to_array(trim(lower(text)), ' +') t
                      FROM documents),
         ix AS (SELECT doc_id, t, len(t) AS ntok,
                       unnest(range(CAST(greatest(len(t) - 4, 0) + 1
                         AS BIGINT))) AS i
                FROM tok),
         win AS (SELECT doc_id, i AS pos, ntok,
                        array_to_string(t[i+1 : i+4], ' ') AS w
                 FROM ix),
         f AS (SELECT doc_id, pos, ntok,
                      row_number() OVER (PARTITION BY w
                        ORDER BY doc_id, pos) rn
               FROM win),
         dup AS (SELECT doc_id, pos + 1 AS s,
                        least(pos + 4, ntok) AS e
                 FROM f WHERE rn > 1),
         g AS (SELECT doc_id, s, e,
                      CASE WHEN s > coalesce(max(e) OVER
                          (PARTITION BY doc_id ORDER BY s, e
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING), -1) + 1
                        THEN 1 ELSE 0 END AS brk
               FROM dup),
         isl AS (SELECT doc_id, s, e,
                        sum(brk) OVER (PARTITION BY doc_id ORDER BY s, e
                          ROWS UNBOUNDED PRECEDING) AS island
                 FROM g)
         SELECT doc_id, CAST(min(s) AS BIGINT) AS span_start,
                CAST(max(e) AS BIGINT) AS span_end,
                CAST(max(e) - min(s) + 1 AS BIGINT) AS span_tokens,
                count(*) AS n_windows
         FROM isl GROUP BY doc_id, island
         ORDER BY doc_id, span_start""",
    // X131c apply: positions covered by any merged span are dropped,
    // survivors reassembled in order; fully-cut docs hash "".
    "q_substr_apply" ->
      """WITH tok AS (SELECT doc_id,
                             regexp_split_to_array(trim(lower(text)), ' +') t
                      FROM documents),
         ix AS (SELECT doc_id, t, len(t) AS ntok,
                       unnest(range(CAST(greatest(len(t) - 4, 0) + 1
                         AS BIGINT))) AS i
                FROM tok),
         win AS (SELECT doc_id, i AS pos, ntok,
                        array_to_string(t[i+1 : i+4], ' ') AS w
                 FROM ix),
         f AS (SELECT doc_id, pos, ntok,
                      row_number() OVER (PARTITION BY w
                        ORDER BY doc_id, pos) rn
               FROM win),
         dup AS (SELECT doc_id, pos + 1 AS s,
                        least(pos + 4, ntok) AS e
                 FROM f WHERE rn > 1),
         pos AS (SELECT doc_id, CAST(p AS BIGINT) AS p, t[p] AS tk
                 FROM tok, unnest(range(1, CAST(len(t) AS BIGINT) + 1))
                   AS u(p)),
         cov AS (SELECT DISTINCT pos.doc_id, pos.p
                 FROM pos JOIN dup ON pos.doc_id = dup.doc_id
                   AND pos.p BETWEEN dup.s AND dup.e),
         kept AS (SELECT pos.doc_id,
                         count(*) AS nk,
                         string_agg(tk, ' ' ORDER BY p) AS txt
                  FROM pos ANTI JOIN cov
                    ON pos.doc_id = cov.doc_id AND pos.p = cov.p
                  GROUP BY pos.doc_id)
         SELECT d.doc_id, CAST(len(d.t) AS BIGINT) AS n_tokens,
                CAST(len(d.t) - coalesce(k.nk, 0) AS BIGINT)
                  AS removed_tokens,
                md5(coalesce(k.txt, '')) AS clean_hash
         FROM tok d LEFT JOIN kept k USING (doc_id)
         ORDER BY d.doc_id""",
    // X131 suffix array + longest repeated spans: the oracle sorts the
    // materialized suffix strings directly (space-joined tokens — valid
    // because ' ' < every token char, so string order ≡ token-sequence
    // order incl. the shorter-is-prefix rule) and takes adjacent-pair
    // LCPs with a first-mismatch list probe; the engine derives the
    // same order from prefix-doubling ranks.
    "q_suffix_lcp" ->
      """WITH tok AS (SELECT doc_id,
                             regexp_split_to_array(trim(lower(text)), ' +') t
                      FROM documents),
         suf AS (SELECT doc_id, CAST(i AS BIGINT) AS pos, t[i:] AS st,
                        array_to_string(t[i:], ' ') AS s
                 FROM tok,
                      unnest(range(1, CAST(len(t) AS BIGINT) + 1)) AS u(i)),
         ord AS (SELECT doc_id, pos, st,
                        lag(doc_id) OVER w AS doc_a,
                        lag(pos) OVER w AS pos_a,
                        lag(st) OVER w AS sta
                 FROM suf WINDOW w AS (ORDER BY s, doc_id, pos)),
         p AS (SELECT doc_a, pos_a, doc_id AS doc_b, pos AS pos_b,
                      least(len(sta), len(st)) AS m, sta, st
               FROM ord WHERE doc_a IS NOT NULL),
         l AS (SELECT doc_a, pos_a, doc_b, pos_b,
                      -- list_position returns 0 (not NULL) on no-match
                      -- in DuckDB 1.0: nullif folds both into "no
                      -- mismatch anywhere" = lcp is the full min length
                      CAST(coalesce(nullif(
                        list_position(list_transform(range(1, m + 1),
                          i -> sta[i] = st[i]), false), 0) - 1, m)
                        AS BIGINT) AS lcp
               FROM p)
         SELECT doc_a, pos_a, doc_b, pos_b, lcp FROM l
         WHERE lcp >= 1
         ORDER BY lcp DESC, doc_a, pos_a, doc_b, pos_b LIMIT 20""",
    // X122 per-source common prefix: LCP(set) = LCP(min, max) — the
    // oracle replays the two-string form directly; first mismatch via a
    // list comprehension over the shorter bound's length.
    "q_source_prefix" ->
      """WITH m AS (SELECT source, count(*) AS n_docs,
                           min(text) AS a, max(text) AS b
                    FROM documents GROUP BY 1),
         l AS (SELECT source, n_docs, a, b,
                      least(length(a), length(b)) AS lim
               FROM m),
         p AS (SELECT source, n_docs, a,
                      coalesce(list_min([i FOR i IN range(1, lim + 1)
                          IF substr(a, CAST(i AS INT), 1)
                             <> substr(b, CAST(i AS INT), 1)]) - 1,
                        lim) AS lcp
               FROM l)
         SELECT source, n_docs, CAST(lcp AS BIGINT) AS lcp_len,
                substr(a, 1, CAST(lcp AS INT)) AS prefix
         FROM p ORDER BY source""",
    // 24-char windows at every position, kept when md5's last nibble is
    // ≡ 0 (mod 4) — content-defined selection, so the oracle replays the
    // identical window set; both engines' substring/length are
    // CHARACTER-based and md5 hashes UTF-8 bytes.
    "q_substring_dup" ->
      """WITH w AS (SELECT DISTINCT doc_id,
                substring(md5(substring(text, CAST(j AS INT), 24)), 1, 13) AS fp
           FROM documents, unnest(range(1, length(text) - 22)) r(j)
           WHERE length(text) >= 24
             AND substring(md5(substring(text, CAST(j AS INT), 24)), 32, 1)
                 IN ('0','4','8','c')),
         sh AS (SELECT fp FROM w GROUP BY fp
                HAVING count(DISTINCT doc_id) >= 2),
         tot AS (SELECT doc_id, count(*) n_win FROM w GROUP BY 1),
         dup AS (SELECT w.doc_id, count(*) n_dup_win
                 FROM w JOIN sh USING (fp) GROUP BY 1)
         SELECT d.doc_id,
                CAST(coalesce(tot.n_win, 0) AS BIGINT) AS n_win,
                CAST(coalesce(dup.n_dup_win, 0) AS BIGINT) AS n_dup_win,
                CAST(CASE WHEN coalesce(dup.n_dup_win, 0) > 0
                          THEN 1 ELSE 0 END AS BIGINT) AS has_dup
         FROM documents d
         LEFT JOIN tot ON tot.doc_id = d.doc_id
         LEFT JOIN dup ON dup.doc_id = d.doc_id
         ORDER BY d.doc_id""",
    // χ² from exact integer 2×2 counts; every factor cast to DOUBLE and
    // the formula evaluated in the SAME association order as the engine
    // (products left-to-right, one division), ranks on the ROUNDED value.
    "q_chi2_tokens" ->
      """WITH u AS (SELECT doc_id, lang FROM documents
               WHERE lang IS NOT NULL AND doc_id IS NOT NULL),
         nn AS (SELECT count(*) nd FROM u),
         nl AS (SELECT lang, count(*) nlab FROM u GROUP BY 1),
         dt AS (SELECT DISTINCT doc_id, lang, tok FROM (
                  SELECT doc_id, lang,
                         unnest(regexp_split_to_array(trim(lower(text)), ' +')) tok
                  FROM documents
                  WHERE lang IS NOT NULL AND doc_id IS NOT NULL)
                WHERE length(tok) > 0),
         a AS (SELECT tok, lang, count(*) ca FROM dt GROUP BY 1, 2),
         dfr AS (SELECT tok, sum(ca) df_tok FROM a GROUP BY 1),
         x AS (SELECT a.lang AS label, a.tok, a.ca, dfr.df_tok, nn.nd,
                      dfr.df_tok - a.ca AS cb,
                      nl.nlab - a.ca AS cc,
                      nn.nd - dfr.df_tok - nl.nlab + a.ca AS cd
               FROM a JOIN dfr USING (tok) JOIN nl USING (lang) CROSS JOIN nn
               WHERE dfr.df_tok >= 5),
         sc AS (SELECT label, tok, ca, df_tok,
                 CASE WHEN (CAST(ca AS DOUBLE) + CAST(cb AS DOUBLE))
                        * (CAST(cc AS DOUBLE) + CAST(cd AS DOUBLE))
                        * (CAST(ca AS DOUBLE) + CAST(cc AS DOUBLE))
                        * (CAST(cb AS DOUBLE) + CAST(cd AS DOUBLE)) = 0
                      THEN 0.0
                      ELSE round(CAST(nd AS DOUBLE)
                        * (CAST(ca AS DOUBLE) * CAST(cd AS DOUBLE)
                           - CAST(cb AS DOUBLE) * CAST(cc AS DOUBLE))
                        * (CAST(ca AS DOUBLE) * CAST(cd AS DOUBLE)
                           - CAST(cb AS DOUBLE) * CAST(cc AS DOUBLE))
                        / ((CAST(ca AS DOUBLE) + CAST(cb AS DOUBLE))
                           * (CAST(cc AS DOUBLE) + CAST(cd AS DOUBLE))
                           * (CAST(ca AS DOUBLE) + CAST(cc AS DOUBLE))
                           * (CAST(cb AS DOUBLE) + CAST(cd AS DOUBLE))), 6)
                 END AS chi2
                FROM x),
         r AS (SELECT *, row_number() OVER
                 (PARTITION BY label ORDER BY chi2 DESC, tok) rk FROM sc)
         SELECT label, tok, CAST(rk AS BIGINT) rk, CAST(ca AS BIGINT) n_both,
                CAST(df_tok AS BIGINT) df_tok, chi2
         FROM r WHERE rk <= 10 ORDER BY label, rk""",
    // post-stream catalog == the snapshot: the q_sync_apply convergence
    // contract, reached through the checkpointed streaming driver
    "q_stream_sync" ->
      """SELECT DISTINCT l_orderkey AS shard_id,
                CAST(l_linenumber AS BIGINT) AS shard_length,
                'host' || CAST(l_suppkey % 7 AS VARCHAR) AS hostname
         FROM lineitem ORDER BY shard_id, shard_length, hostname""",
    // same contract as q_dedup_exact, reached through the stream
    "q_stream_dedup" ->
      """SELECT md5(text) AS h, min(doc_id) AS keeper, count(*) AS n_dups
         FROM documents GROUP BY md5(text) ORDER BY h""",
    // the STREAM's final complete-mode table == the batch aggregation
    "q_stream_tumbling" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_ts,
                event_type, CAST(count(*) AS BIGINT) AS n
         FROM events GROUP BY 1, 2 ORDER BY hour_ts, event_type""",
    // same hop expansion as the batch q_event_sliding oracle
    "q_stream_sliding" ->
      """WITH e AS (SELECT CAST(epoch(date_trunc('second', ts)) AS BIGINT) es,
                           event_type
                    FROM events),
         w AS (SELECT (es // 900) * 900 - k * 900 AS win_ts, event_type
               FROM e, unnest(range(0, 4)) r(k))
         SELECT win_ts, event_type, CAST(count(*) AS BIGINT) AS n
         FROM w GROUP BY 1, 2 ORDER BY win_ts, event_type""",
    // session_window semantics in SQL: a new session starts only when the
    // gap EXCEEDS 1800 s — Spark's merge test is inclusive (start <=
    // currentEnd), so an exactly-1800s follower still merges (same
    // strictly-greater rule as q_sessionize; sf1 sweep: 24 exact ties
    // split under >= and diverged). Session end is the LAST event + gap;
    // complete mode emits open tails too
    "q_stream_sessions" ->
      """WITH e AS (SELECT user_id, event_id,
                           CAST(epoch(date_trunc('second', ts)) AS BIGINT) ep
                    FROM events),
         l AS (SELECT user_id, event_id, ep, lag(ep) OVER
                 (PARTITION BY user_id ORDER BY ep, event_id) prev FROM e),
         f AS (SELECT user_id, event_id, ep,
                      CASE WHEN prev IS NULL OR ep - prev > 1800
                           THEN 1 ELSE 0 END is_new FROM l),
         s AS (SELECT user_id, ep,
                      CAST(sum(is_new) OVER (PARTITION BY user_id
                        ORDER BY ep, event_id ROWS UNBOUNDED PRECEDING)
                        AS BIGINT) session_seq FROM f),
         g AS (SELECT user_id, session_seq, count(*) n_events,
                      min(ep) start_ep, max(ep) + 1800 end_ep
               FROM s GROUP BY 1, 2)
         SELECT user_id, CAST(start_ep AS BIGINT) start_ep,
                CAST(end_ep AS BIGINT) end_ep,
                CAST(n_events AS BIGINT) n_events
         FROM g ORDER BY user_id, start_ep""",
    // stream-stream inner interval join == the batch interval join
    // (q_event_correlate's oracle shape, view→click within 1 h)
    "q_stream_join" ->
      """WITH e AS (SELECT user_id, event_type, event_id, epoch_us(ts) AS ep
                    FROM events)
         SELECT v.user_id, v.event_id AS a_id, c.event_id AS b_id,
                c.ep - v.ep AS gap_us
         FROM e v JOIN e c ON v.user_id = c.user_id
           AND v.event_type = 'view' AND c.event_type = 'click'
           AND c.ep > v.ep AND c.ep <= v.ep + 3600000000
         ORDER BY a_id, b_id""",
    // stream-static broadcast enrich == the batch join + rollup
    "q_stream_enrich" ->
      """SELECT n_name, e.event_type, CAST(count(*) AS BIGINT) AS n
         FROM events e
         JOIN customer c ON e.user_id = c.c_custkey
         JOIN nation n ON c.c_nationkey = n.n_nationkey
         GROUP BY 1, 2 ORDER BY n_name, event_type""",
    // the q_sessionize gaps-and-islands chain, minus each user's last
    // (still-open) session — exactly what the state machine withholds
    "q_stateful_sessions" ->
      """WITH e AS (SELECT user_id, event_id,
                           CAST(epoch(date_trunc('second', ts)) AS BIGINT) ep
                    FROM events),
         l AS (SELECT user_id, event_id, ep, lag(ep) OVER
                 (PARTITION BY user_id ORDER BY ep, event_id) prev FROM e),
         f AS (SELECT user_id, event_id, ep,
                      CASE WHEN prev IS NULL OR ep - prev > 1800
                           THEN 1 ELSE 0 END is_new FROM l),
         s AS (SELECT user_id, ep,
                      CAST(sum(is_new) OVER (PARTITION BY user_id
                        ORDER BY ep, event_id ROWS UNBOUNDED PRECEDING)
                        AS BIGINT) session_seq FROM f),
         g AS (SELECT user_id, session_seq, count(*) n_events,
                      min(ep) start_ep, max(ep) end_ep
               FROM s GROUP BY 1, 2),
         m AS (SELECT user_id, max(session_seq) last_seq FROM g GROUP BY 1)
         SELECT g.user_id, CAST(g.start_ep AS BIGINT) start_ep,
                CAST(g.end_ep AS BIGINT) end_ep,
                CAST(g.n_events AS BIGINT) n_events
         FROM g JOIN m ON m.user_id = g.user_id
              AND g.session_seq < m.last_seq
         ORDER BY g.user_id, g.start_ep""",
    // one oracle for all three formats: the round trip must be IDENTITY,
    // so each format's aggregate equals the parquet original's
    "q_csv_roundtrip" -> interchangeOracleSql,
    "q_jsonl_roundtrip" -> interchangeOracleSql,
    "q_orc_roundtrip" -> interchangeOracleSql,
    // micro-unit fixed-point throughout: one round per element, long
    // sums, width-stable 19x19 decimal dim-reductions, pinned
    // dot/(sqrt*sqrt) finish
    "q_centroid_drift" ->
      """WITH q AS (SELECT label, vec_id % 2 AS half, i AS dim,
                           CAST(round(CAST(embedding[i+1] AS DOUBLE)
                             * 1000000) AS BIGINT) AS q
                    FROM embeddings, unnest(range(0, len(embedding))) r(i)
                    WHERE label IS NOT NULL),
         s AS (SELECT label, half, dim, sum(q) s FROM q GROUP BY 1, 2, 3),
         j AS (SELECT e.label, e.dim, e.s se, o.s so
               FROM s e JOIN s o ON e.label = o.label AND e.dim = o.dim
                    AND e.half = 0 AND o.half = 1),
         p AS (SELECT label,
                sum(CAST(se AS DECIMAL(19,0)) * CAST(so AS DECIMAL(19,0))) dot,
                sum(CAST(se AS DECIMAL(19,0)) * CAST(se AS DECIMAL(19,0))) ee,
                sum(CAST(so AS DECIMAL(19,0)) * CAST(so AS DECIMAL(19,0))) oo
               FROM j GROUP BY 1),
         c AS (SELECT label,
                CAST(sum(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) n_even,
                CAST(sum(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) n_odd
               FROM embeddings WHERE label IS NOT NULL GROUP BY 1)
         SELECT p.label, c.n_even, c.n_odd,
                CASE WHEN ee = 0 OR oo = 0 THEN 0.0
                     ELSE round(CAST(dot AS DOUBLE) /
                          (sqrt(CAST(ee AS DOUBLE)) * sqrt(CAST(oo AS DOUBLE))),
                          6)
                END AS cos_halves
         FROM p JOIN c ON c.label = p.label ORDER BY p.label""",
    // exact counts; conf and lift are single pinned divisions; the cut
    // ranks on the ROUNDED lift with the pair as tiebreak
    "q_assoc_rules" ->
      """WITH it AS (SELECT DISTINCT l_orderkey b, l_partkey i FROM lineitem
                     WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
         p AS (SELECT a.i item_a, c.i item_b, count(*) n_ab
               FROM it a JOIN it c ON a.b = c.b AND a.i < c.i
               GROUP BY 1, 2 HAVING count(*) >= 2),
         ni AS (SELECT i, count(*) ni FROM it GROUP BY 1),
         nb AS (SELECT count(DISTINCT b) nb FROM it)
         SELECT item_a, item_b, CAST(n_ab AS BIGINT) n_ab,
                CAST(na.ni AS BIGINT) n_a, CAST(ncb.ni AS BIGINT) n_b,
                round(CAST(n_ab AS DOUBLE) / CAST(na.ni AS DOUBLE), 6) conf,
                round(CAST(nb.nb AS DOUBLE) * CAST(n_ab AS DOUBLE)
                  / (CAST(na.ni AS DOUBLE) * CAST(ncb.ni AS DOUBLE)), 6) lift
         FROM p JOIN ni na ON na.i = p.item_a
              JOIN ni ncb ON ncb.i = p.item_b, nb
         ORDER BY lift DESC, item_a, item_b LIMIT 50""",
    "q_event_transitions" ->
      """WITH e AS (SELECT user_id u, epoch_us(ts) ep, event_type, event_id
                    FROM events),
         l AS (SELECT event_type AS next_type, lag(event_type) OVER
                 (PARTITION BY u ORDER BY ep, event_id) AS prev_type FROM e),
         p AS (SELECT prev_type, next_type, count(*) n FROM l
               WHERE prev_type IS NOT NULL GROUP BY 1, 2),
         t AS (SELECT prev_type, sum(n) n_prev FROM p GROUP BY 1)
         SELECT p.prev_type, p.next_type, CAST(p.n AS BIGINT) n,
                CAST(t.n_prev AS BIGINT) n_prev,
                round(CAST(p.n AS DOUBLE) / CAST(t.n_prev AS DOUBLE), 6) p
         FROM p JOIN t ON t.prev_type = p.prev_type
         ORDER BY p.prev_type, p.next_type""",
    "q_basket_pairs" ->
      """WITH it AS (SELECT DISTINCT l_orderkey b, l_partkey i FROM lineitem
                     WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
         p AS (SELECT a.i item_a, c.i item_b, count(*) n_baskets
               FROM it a JOIN it c ON a.b = c.b AND a.i < c.i
               GROUP BY 1, 2)
         SELECT item_a, item_b, CAST(n_baskets AS BIGINT) n_baskets
         FROM p WHERE n_baskets >= 2
         ORDER BY n_baskets DESC, item_a, item_b LIMIT 50""",
    // exact DECIMAL moments (width-stable 19x19 products), then the same
    // pinned IEEE finish as the engine: covn/varx, unrounded-slope
    // intercept, sqrt-product correlation
    "q_linreg" ->
      """WITH b AS (SELECT event_type AS grp,
                           epoch_us(ts) // 1000000 AS xs,
                           CAST(round(value * 100) AS BIGINT) AS yc
                    FROM events WHERE event_type IS NOT NULL),
         m AS (SELECT grp, count(*) n,
                sum(CAST(xs AS DECIMAL(19,0))) sx,
                sum(CAST(yc AS DECIMAL(19,0))) sy,
                sum(CAST(xs AS DECIMAL(19,0)) * CAST(yc AS DECIMAL(19,0))) sxy,
                sum(CAST(xs AS DECIMAL(19,0)) * CAST(xs AS DECIMAL(19,0))) sxx,
                sum(CAST(yc AS DECIMAL(19,0)) * CAST(yc AS DECIMAL(19,0))) syy
               FROM b GROUP BY 1),
         f AS (SELECT grp, n,
                CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE) AS covn,
                CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE) AS varx,
                CAST(n AS DOUBLE)*CAST(syy AS DOUBLE)
                  - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE) AS vary,
                CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
               FROM m)
         SELECT grp, CAST(n AS BIGINT) n,
                CASE WHEN varx = 0 THEN 0.0
                     ELSE round(covn / varx, 6) END AS slope,
                CASE WHEN varx = 0 THEN 0.0
                     ELSE round((syd - (covn / varx) * sxd)
                                / CAST(n AS DOUBLE), 6) END AS intercept,
                CASE WHEN varx = 0 OR vary = 0 THEN 0.0
                     ELSE round(covn / (sqrt(varx) * sqrt(vary)), 6) END AS r
         FROM f ORDER BY grp""",
    "q_twap" ->
      """WITH e AS (SELECT user_id AS key, epoch_us(ts) AS ep,
                           CAST(round(value * 100) AS BIGINT) AS vc, event_id
                    FROM events),
         d AS (SELECT key, vc, lead(ep) OVER
                 (PARTITION BY key ORDER BY ep, event_id) - ep AS dur
               FROM e),
         g AS (SELECT key, count(*) n_intervals, sum(dur) span_us,
                sum(CAST(vc AS DECIMAL(19,0)) * CAST(dur AS DECIMAL(19,0)))
                  integ
               FROM d WHERE dur IS NOT NULL GROUP BY 1)
         SELECT key, CAST(n_intervals AS BIGINT) n_intervals,
                CAST(span_us AS BIGINT) span_us,
                CASE WHEN span_us = 0 THEN 0.0
                     ELSE round(CAST(integ AS DOUBLE)
                                / CAST(span_us AS DOUBLE), 6) END AS twap
         FROM g ORDER BY key""",
    // t-closeness: the same integer TVD construction — products kept
    // DECIMAL(19,0)×DECIMAL(19,0), absent-value mass in closed form,
    // one rounded double division at the very end
    "q_t_closeness" ->
      """WITH c AS (SELECT event_type g, user_id v, count(*) ngv
                    FROM events GROUP BY 1, 2),
         gt AS (SELECT g, sum(ngv) ng FROM c GROUP BY 1),
         vt AS (SELECT v, sum(ngv) nv FROM c GROUP BY 1),
         tt AS (SELECT sum(ngv) nn FROM c),
         j AS (SELECT c.g,
                 sum(abs(CAST(c.ngv AS DECIMAL(19,0)) * CAST(tt.nn AS DECIMAL(19,0))
                   - CAST(vt.nv AS DECIMAL(19,0)) * CAST(gt.ng AS DECIMAL(19,0))))
                   AS present,
                 sum(CAST(vt.nv AS DECIMAL(19,0)) * CAST(gt.ng AS DECIMAL(19,0)))
                   AS covered,
                 min(gt.ng) AS ng, min(tt.nn) AS nn
               FROM c JOIN vt ON vt.v = c.v JOIN gt ON gt.g = c.g
                 CROSS JOIN tt
               GROUP BY c.g),
         f AS (SELECT g, ng,
                 round(CAST(present + (CAST(ng AS DECIMAL(19,0))
                       * CAST(nn AS DECIMAL(19,0)) - covered) AS DOUBLE)
                   / (CAST(CAST(ng AS DECIMAL(19,0)) * CAST(nn AS DECIMAL(19,0))
                       AS DOUBLE) * 2), 6) AS tvd
               FROM j)
         SELECT g AS event_type, CAST(ng AS BIGINT) AS n, tvd,
                CAST(CASE WHEN tvd > 0.02 THEN 1 ELSE 0 END AS BIGINT)
                  AS t_risk
         FROM f ORDER BY event_type""",
    // exact integer counts; share and uniform-target weight are each one
    // pinned IEEE division + 6-dp round (the X91 finish discipline)
    "q_domain_mix" ->
      """WITH per AS (SELECT source AS domain,
                             CAST(count(*) AS BIGINT) n_docs,
                             CAST(sum(n_chars) AS BIGINT) n_units
                      FROM documents WHERE source IS NOT NULL GROUP BY 1),
         tot AS (SELECT CAST(sum(n_units) AS BIGINT) total_units,
                        CAST(count(*) AS BIGINT) n_domains FROM per)
         SELECT domain, n_docs, n_units,
                round(CAST(n_units AS DOUBLE) / CAST(total_units AS DOUBLE),
                      6) AS share,
                round(CAST(total_units AS DOUBLE) /
                      CAST(n_domains * n_units AS DOUBLE), 6) AS weight
         FROM per, tot ORDER BY domain""",
    "q_k_anonymity" ->
      """SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                CAST(count(*) AS BIGINT) n,
                CAST(count(DISTINCT user_id) AS BIGINT) n_sensitive,
                CAST(CASE WHEN count(*) < 5 THEN 1 ELSE 0 END AS BIGINT)
                  k_risk,
                CAST(CASE WHEN count(DISTINCT user_id) < 2 THEN 1 ELSE 0 END
                  AS BIGINT) l_risk
         FROM events GROUP BY 1, 2 ORDER BY event_type, day""",
    // the oracle is the FULL recompute over all facts: hash equality
    // certifies that base-state ⊎ delta-state == recompute exactly
    // (order-independent DECIMAL state sums)
    "q_incremental_agg" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n,
                round(CAST(sum(CAST(CAST(value AS VARCHAR) AS DECIMAL(38,6)))
                  AS DOUBLE), 6) AS total
         FROM events GROUP BY 1 ORDER BY user_id""",
    "q_scd2" ->
      """WITH base AS (SELECT c_custkey AS key, c_mktsegment AS attr,
                              '0000-00-00' AS valid_from
                       FROM customer),
         chg AS (SELECT o_custkey AS key,
                        strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
                        min(o_orderpriority) AS attr
                 FROM orders GROUP BY 1, 2),
         a AS (SELECT key, attr, valid_from FROM base
               UNION ALL SELECT key, attr, valid_from FROM chg),
         d AS (SELECT *, lag(attr) OVER
                 (PARTITION BY key ORDER BY valid_from) AS prev FROM a),
         f AS (SELECT key, attr, valid_from FROM d
               WHERE prev IS NULL OR prev <> attr),
         v AS (SELECT key, attr, valid_from, lead(valid_from) OVER
                 (PARTITION BY key ORDER BY valid_from) AS valid_to FROM f)
         SELECT key, attr, valid_from, valid_to,
                CAST(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS BIGINT)
                  AS is_current
         FROM v ORDER BY key, valid_from""",
    // the xy2d bit-plane walk replayed as 12 unrolled MATERIALIZED CTE
    // levels (kCore's discipline — each level references its predecessor
    // several times, so inlining would blow up exponentially), original
    // coordinates carried alongside the rotating state for the stats
    "q_hilbert_stats" ->
      s"""WITH h0 AS MATERIALIZED (
           SELECT event_id % 4096 AS x, user_id % 4096 AS y,
                  event_id % 4096 AS ox, user_id % 4096 AS oy,
                  CAST(0 AS BIGINT) AS d
           FROM events),
         ${(0 until 12).map(hilbertLevelSql(_, 12)).mkString(",\n         ")}
         SELECT CAST(d // 16384 AS BIGINT) AS bucket,
                CAST(count(*) AS BIGINT) AS n,
                CAST(min(ox) AS BIGINT) min_x, CAST(max(ox) AS BIGINT) max_x,
                CAST(min(oy) AS BIGINT) min_y, CAST(max(oy) AS BIGINT) max_y,
                CAST(min(d) AS BIGINT) min_h, CAST(max(d) AS BIGINT) max_h
         FROM h12 GROUP BY 1 ORDER BY bucket""",
    // bit-interleave replayed as integer divide/mod arithmetic (x on odd
    // bits, y on even — Layout.zValue's convention)
    "q_zorder_stats" ->
      s"""WITH c AS (SELECT event_id % 4096 AS x, user_id % 4096 AS y
                     FROM events),
         z AS (SELECT x, y, ${zSql("x", "y", 12)} AS z FROM c)
         SELECT CAST(z // 16384 AS BIGINT) AS bucket,
                CAST(count(*) AS BIGINT) AS n,
                CAST(min(x) AS BIGINT) min_x, CAST(max(x) AS BIGINT) max_x,
                CAST(min(y) AS BIGINT) min_y, CAST(max(y) AS BIGINT) max_y,
                CAST(min(z) AS BIGINT) min_z, CAST(max(z) AS BIGINT) max_z
         FROM z GROUP BY 1 ORDER BY bucket"""
  )

  /** Shared DuckDB CTE chain replicating
    * `Dedup.minHashVerified(docs, "doc_id", "text", 0.3, maxDf = 100)`;
    * ends in `vp(da, db, jaccard)`. Used by q_dedup_verified and
    * q_split_leakage so the two oracles cannot drift apart. */
  /** X129/X129b's shared oracle: the percolateRegistry as a VALUES
    * literal, the same conjunctive count = need arithmetic. */
  private val percolateOracleSql =
    """WITH q(qid, terms) AS (VALUES
           (1, ['hash', 'join']),
           (2, ['table', 'scan', 'filter']),
           (3, ['stream', 'batch']),
           (4, ['no_such_token_zzqx']),
           (5, ['agg'])),
         qt AS (SELECT qid, unnest(list_distinct(terms)) tok FROM q),
         qn AS (SELECT qid, count(*) need FROM qt GROUP BY 1),
         dt AS (SELECT doc_id, unnest(list_distinct(
                  regexp_split_to_array(trim(lower(text)), ' +'))) tok
                FROM documents),
         m AS (SELECT d.doc_id, t.qid FROM dt d JOIN qt t USING (tok)),
         g AS (SELECT doc_id, qid, count(*) got FROM m GROUP BY 1, 2)
         SELECT g.doc_id, CAST(g.qid AS BIGINT) qid
         FROM g JOIN qn USING (qid) WHERE got = need
         ORDER BY doc_id, qid"""

  private val verifiedPairsSql =
    """toks AS MATERIALIZED (SELECT doc_id, regexp_split_to_array(trim(lower(text)), ' +') t
               FROM documents),
         tri AS MATERIALIZED (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
                 FROM toks, unnest(range(1, len(t)-1)) r(i)),
         mh AS MATERIALIZED (SELECT doc_id, k, min(md5(CAST(k AS VARCHAR) || '|' || sh)) m
                FROM tri, unnest(range(0,16)) kk(k) GROUP BY 1,2),
         sig AS MATERIALIZED (SELECT doc_id, list(m ORDER BY k) sig FROM mh GROUP BY 1),
         bands AS MATERIALIZED (SELECT doc_id, b,
                          md5(sig[4*b+1] || sig[4*b+2] || sig[4*b+3] || sig[4*b+4]) bh
                   FROM sig, unnest(range(0,4)) bb(b)),
         cand AS MATERIALIZED (SELECT DISTINCT a.doc_id da, c.doc_id db FROM bands a JOIN bands c
                  ON a.bh = c.bh AND a.b = c.b AND c.doc_id > a.doc_id),
         trif AS MATERIALIZED (SELECT * FROM tri WHERE sh IN (
                    SELECT sh FROM tri GROUP BY sh HAVING count(*) <= 100)),
         sz AS MATERIALIZED (SELECT doc_id, count(*) n FROM trif GROUP BY 1),
         inter AS MATERIALIZED (SELECT da, db, count(*) i FROM cand
                   JOIN trif a ON a.doc_id = da
                   JOIN trif c ON c.doc_id = db AND c.sh = a.sh
                   GROUP BY 1, 2),
         vp AS MATERIALIZED (SELECT da, db, jaccard FROM (
                  SELECT da, db, round(i / (sa.n + sb.n - i), 6) jaccard
                  FROM inter JOIN sz sa ON sa.doc_id = da
                       JOIN sz sb ON sb.doc_id = db)
                WHERE jaccard >= 0.3)"""

  /** Shared DuckDB CTE chain replicating
    * `Dedup.minHashLsh(docs, "doc_id", "text")` (k=16, bands=4), banded
    * per DISTINCT text: the MinHash signature is a pure function of the
    * text, so shingling, the 16 minhashes, and the banding run once per
    * distinct text (`tid` = the text's min doc_id — the engine's own
    * trick, spelled in SQL) and the doc-level candidate frame expands
    * from the per-text doc lists afterwards. On a duplicate-heavy corpus
    * (the skewed-sf1 boilerplate clique: 93 distinct texts x ~54 copies)
    * this keeps the oracle linear in the corpus plus the true pair mass,
    * instead of re-banding every clique member. A text trivially agrees
    * with itself on every band, hence `tb >= ta`: identical-text doc
    * pairs are always candidates, exactly the per-doc semantics. Ends in
    * `cand(da, db)` (da < db, DISTINCT) and exposes the text-level frames
    * `dt(text, tid, docs)`, `dd(tid, doc_id)`, `tmh(tid, k, m)`,
    * `tbands(tid, b, bh)`, `tcand(ta, tb)` for consumers that can stay
    * text-level (components, signature agreement). Used by
    * q_dedup_minhash and the X81 graph-operator oracles so they cannot
    * drift apart. */
  private val deltaDedupOracleSql =
    s"""WITH d AS (SELECT doc_id, text,
                       ${bucketSql("CAST(doc_id AS VARCHAR)")} AS bucket
                     FROM documents),
         ltoks AS MATERIALIZED (SELECT doc_id, regexp_split_to_array(trim(lower(text)), ' +') t
                   FROM d WHERE bucket < 20),
         ltri AS MATERIALIZED (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
                  FROM ltoks, unnest(range(1, len(t)-1)) r(i)),
         rtoks AS MATERIALIZED (SELECT doc_id, regexp_split_to_array(trim(lower(text)), ' +') t
                   FROM d WHERE bucket >= 20),
         rtri AS MATERIALIZED (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
                  FROM rtoks, unnest(range(1, len(t)-1)) r(i)),
         lmh AS MATERIALIZED (SELECT doc_id, k, min(md5(CAST(k AS VARCHAR) || '|' || sh)) m
                 FROM ltri, unnest(range(0,16)) kk(k) GROUP BY 1,2),
         lsig AS MATERIALIZED (SELECT doc_id, list(m ORDER BY k) sig FROM lmh GROUP BY 1),
         lbands AS MATERIALIZED (SELECT doc_id, b,
                           md5(sig[4*b+1] || sig[4*b+2] || sig[4*b+3] || sig[4*b+4]) bh
                    FROM lsig, unnest(range(0,4)) bb(b)),
         rmh AS MATERIALIZED (SELECT doc_id, k, min(md5(CAST(k AS VARCHAR) || '|' || sh)) m
                 FROM rtri, unnest(range(0,16)) kk(k) GROUP BY 1,2),
         rsig AS MATERIALIZED (SELECT doc_id, list(m ORDER BY k) sig FROM rmh GROUP BY 1),
         rbands AS MATERIALIZED (SELECT doc_id, b,
                           md5(sig[4*b+1] || sig[4*b+2] || sig[4*b+3] || sig[4*b+4]) bh
                    FROM rsig, unnest(range(0,4)) bb(b)),
         cand AS MATERIALIZED (SELECT DISTINCT a.doc_id da, c.doc_id db FROM lbands a
                  JOIN rbands c ON a.b = c.b AND a.bh = c.bh),
         hot AS MATERIALIZED (SELECT sh FROM rtri GROUP BY sh
                     HAVING count(*) > 100),
         ltrif AS MATERIALIZED (SELECT * FROM ltri
                     WHERE sh NOT IN (SELECT sh FROM hot)),
         rtrif AS MATERIALIZED (SELECT * FROM rtri
                     WHERE sh NOT IN (SELECT sh FROM hot)),
         lsz AS MATERIALIZED (SELECT doc_id, count(*) n FROM ltrif GROUP BY 1),
         rsz AS MATERIALIZED (SELECT doc_id, count(*) n FROM rtrif GROUP BY 1),
         inter AS MATERIALIZED (SELECT da, db, count(*) i FROM cand
                   JOIN ltrif a ON a.doc_id = da
                   JOIN rtrif c ON c.doc_id = db AND c.sh = a.sh
                   GROUP BY 1, 2),
         vp AS MATERIALIZED (SELECT da, db, jaccard FROM (
                  SELECT da, db, round(i / (la.n + rb.n - i), 6) jaccard
                  FROM inter JOIN lsz la ON la.doc_id = da
                       JOIN rsz rb ON rb.doc_id = db)
                WHERE jaccard >= 0.3),
         ch AS (SELECT md5(text) h, min(doc_id) exact_match
                FROM d WHERE bucket >= 20 GROUP BY 1),
         dh AS (SELECT doc_id, md5(text) h FROM d WHERE bucket < 20),
         ex AS (SELECT dh.doc_id, ch.exact_match
                FROM dh LEFT JOIN ch USING (h)),
         best AS (SELECT da AS doc_id, db AS near_match, jaccard FROM (
                    SELECT da, db, jaccard, row_number() OVER (
                      PARTITION BY da ORDER BY jaccard DESC, db) r
                    FROM vp) WHERE r = 1)
         SELECT ex.doc_id,
                CASE WHEN exact_match IS NOT NULL THEN 'exact_dup'
                     WHEN near_match IS NOT NULL THEN 'near_dup'
                     ELSE 'new' END AS status,
                coalesce(exact_match, near_match) AS match_id,
                CASE WHEN exact_match IS NULL THEN jaccard END AS jaccard
         FROM ex LEFT JOIN best USING (doc_id)
         ORDER BY ex.doc_id"""

  private val lshCandSql =
    """dt AS MATERIALIZED (SELECT text, min(doc_id) tid, list(doc_id) docs
                FROM documents GROUP BY text),
         dd AS MATERIALIZED (SELECT tid, unnest(docs) doc_id FROM dt),
         toks AS MATERIALIZED (SELECT tid, regexp_split_to_array(trim(lower(text)), ' +') t
                 FROM dt),
         tri AS MATERIALIZED (SELECT DISTINCT tid, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
                 FROM toks, unnest(range(1, len(t)-1)) r(i)),
         tmh AS MATERIALIZED (SELECT tid, k, min(md5(CAST(k AS VARCHAR) || '|' || sh)) m
                FROM tri, unnest(range(0,16)) kk(k) GROUP BY 1,2),
         tsig AS MATERIALIZED (SELECT tid, list(m ORDER BY k) sig FROM tmh GROUP BY 1),
         tbands AS MATERIALIZED (SELECT tid, b,
                          md5(sig[4*b+1] || sig[4*b+2] || sig[4*b+3] || sig[4*b+4]) bh
                   FROM tsig, unnest(range(0,4)) bb(b)),
         tcand AS MATERIALIZED (SELECT DISTINCT a.tid ta, c.tid tb FROM tbands a JOIN tbands c
                  ON a.bh = c.bh AND a.b = c.b AND c.tid >= a.tid),
         cand AS MATERIALIZED (SELECT DISTINCT least(x.doc_id, y.doc_id) da,
                          greatest(x.doc_id, y.doc_id) db
                  FROM tcand JOIN dd x ON x.tid = ta JOIN dd y ON y.tid = tb
                  WHERE x.doc_id <> y.doc_id)"""

  /** Text-level connected components over the LSH candidate graph,
    * expanded to per-doc labels; requires [[lshCandSql]]'s CTEs in scope
    * and ends in `comp(doc_id, c)`. The recursion runs over TEXT nodes
    * (`tcand` minus self-loops), which keeps the label-propagation
    * frontier linear in distinct texts — the per-doc spelling is
    * O(edges x component size) and never finishes inside the skewed-sf1
    * clique. Docs of a banded text inherit the text component's min tid
    * (= the component's min doc_id, since tid is each text's min doc and
    * identical-text docs are always connected); docs whose text produced
    * no bands (under 3 tokens) were never candidates, so they stay
    * singletons labeled by their own doc_id. */
  private val textCompSql =
    """te AS (SELECT ta s, tb d FROM tcand WHERE ta <> tb
               UNION ALL SELECT tb, ta FROM tcand WHERE ta <> tb),
         treach(n, l) AS (
           SELECT tid, tid FROM dt
           UNION
           SELECT te.d, r.l FROM treach r JOIN te ON te.s = r.n),
         tcomp AS (SELECT n, min(l) c FROM treach GROUP BY n),
         banded AS (SELECT DISTINCT tid FROM tbands),
         comp AS (SELECT d.doc_id,
                    CASE WHEN b.tid IS NOT NULL THEN tc.c
                         ELSE d.doc_id END AS c
                  FROM dd d LEFT JOIN banded b ON b.tid = d.tid
                            LEFT JOIN tcomp tc ON tc.n = d.tid)"""

  /** One unrolled Hilbert xy2d bit-plane level (HilbertIndex.xy2d's loop
    * body at s = 2^(bits-1-i)) as a DuckDB CTE: h{i+1} from h{i}. The
    * quadrant factor (3·rx)⊕ry and the ry=0 reflect-and-swap rotation are
    * spelled as CASEs over the bit tests. The rotation drives x/y
    * NEGATIVE mid-walk and the JVM side reads their bits in two's
    * complement (`v & s`), so the SQL bit test must be the floor-mod form
    * `((v % 2s) + 2s) % 2s ≥ s` — a plain `(v // s) % 2` inherits the
    * dividend's sign and diverges on exactly those rows. */
  private def hilbertLevelSql(i: Int, bits: Int): String = {
    val s = 1L << (bits - 1 - i)
    val m = 2 * s
    def bit(v: String) =
      s"CASE WHEN (($v % $m) + $m) % $m >= $s THEN 1 ELSE 0 END"
    s"""h${i + 1} AS MATERIALIZED (
           SELECT ox, oy,
             d + ${s * s} * (CASE WHEN rx = 1 AND ry = 1 THEN 2
                                  WHEN rx = 1 THEN 3
                                  WHEN ry = 1 THEN 1 ELSE 0 END) AS d,
             CASE WHEN ry = 0 THEN
               (CASE WHEN rx = 1 THEN ${s - 1} - y ELSE y END)
             ELSE x END AS x,
             CASE WHEN ry = 0 THEN
               (CASE WHEN rx = 1 THEN ${s - 1} - x ELSE x END)
             ELSE y END AS y
           FROM (SELECT ox, oy, d, x, y,
                   ${bit("x")} AS rx, ${bit("y")} AS ry FROM h$i))"""
  }

  /** One unrolled k-core peel round (Dedup.kCore's recurrence) as a
    * DuckDB CTE pair: survivors n{i} (degree ≥ k in e{i-1}), then the
    * induced edge set e{i}. MATERIALIZED is load-bearing: each round
    * references its predecessor 3×, so DuckDB's default CTE inlining
    * would expand e8 into 3⁸ copies of the whole LSH chain (observed as
    * thousands of parquet re-opens); materializing makes the unroll
    * linear, the same shape as the engine's per-round persist. */
  private def kCoreRoundSql(i: Int, k: Int): String =
    s"""n$i AS MATERIALIZED (SELECT x FROM (SELECT da x FROM e${i - 1}
                  UNION ALL SELECT db x FROM e${i - 1})
                GROUP BY x HAVING count(*) >= $k),
         e$i AS MATERIALIZED (SELECT da, db FROM e${i - 1}
                 WHERE da IN (SELECT x FROM n$i)
                   AND db IN (SELECT x FROM n$i))"""

  /** One unrolled clamped-majority label-propagation round
    * (Dedup.labelPropagate's recurrence) as DuckDB CTEs: neighbor-label
    * counts m{i}, per-node argmax a{i} (count DESC, label ASC), then
    * l{i} = coalesce(seed, majority, previous). MATERIALIZED is the X97
    * rule: each round references its predecessor twice. */
  private def labelPropRoundSql(i: Int): String =
    s"""m$i AS MATERIALIZED (SELECT e.s, l.lab, count(*) c
           FROM edges e JOIN l${i - 1} l ON l.id = e.d
           WHERE l.lab IS NOT NULL GROUP BY 1, 2),
         a$i AS (SELECT s AS id, lab FROM (
             SELECT s, lab, row_number() OVER (PARTITION BY s
               ORDER BY c DESC, lab) rr FROM m$i) q WHERE rr = 1),
         l$i AS MATERIALIZED (SELECT l.id, coalesce(sd.lab, a.lab, l.lab) lab
           FROM l${i - 1} l LEFT JOIN a$i a USING (id)
                LEFT JOIN lpseeds sd USING (id))"""

  /** One unrolled fixed-point PageRank iteration (Dedup.pageRank's
    * integer recurrence) as a DuckDB CTE: it{i} from it{i-1}. */
  private def pageRankIterSql(i: Int): String =
    s"""it$i AS MATERIALIZED (SELECT e.d AS n,
           (15 * (1000000000000 // (SELECT nn FROM cnt))
            + 85 * sum(p.r // dg.dg)) // 100 AS r
         FROM edges e JOIN it${i - 1} p ON p.n = e.s
              JOIN deg dg ON dg.s = e.s
         GROUP BY e.d)"""

  /** One unrolled integer power-iteration round (Similarity.
    * powerIteration's recurrence) as DuckDB CTEs: y/norm/x level i from
    * x(i-1). Integer `//` TRUNCATES toward zero — exactly BigInt `/` on
    * the engine side; materialization is load-bearing (X97 rule). */
  private def powerIterRoundSql(i: Int): String =
    s"""py$i AS MATERIALIZED (SELECT g.i AS d, sum(g.g * x${i - 1}.x) AS y
           FROM g JOIN x${i - 1} ON g.j = x${i - 1}.d GROUP BY g.i),
         pn$i AS (SELECT greatest(max(abs(y)) // 1000000, 1) AS dn
                  FROM py$i),
         x$i AS MATERIALIZED (SELECT d, y // dn AS x FROM py$i, pn$i)"""

  /** DuckDB-dialect SQL for Sampling.hashBucket(key, mod) — the 32-bit
    * value of the first 8 md5 hex digits mod `mod`, spelled as digit
    * arithmetic because DuckDB v1.0 has no conv(). */
  private def bucketSql(key: String, mod: Int = 100): String =
    bucketOfHexSql(s"md5($key)", mod)

  /** Same 8-hex-digit bucket arithmetic over an ALREADY-computed md5 hex
    * column — lets an oracle materialize `md5(tok) AS h` once instead of
    * re-hashing per digit when the keyed rows number in the millions. */
  private def bucketOfHexSql(hex: String, mod: Int): String =
    (0 until 8).map(i =>
      s"(strpos('0123456789abcdef', substr($hex,${i + 1},1))-1)" +
        (if (i < 7) s" * ${1L << (4 * (7 - i))}" else ""))
      .mkString("((", " + ", s") % $mod)")

  /** The q_*_roundtrip oracle: aggregates of the parquet ORIGINAL — any
    * value the interchange round trip perturbs hash-diverges. */
  private val interchangeOracleSql: String =
    """SELECT event_type, CAST(count(*) AS BIGINT) n,
              CAST(0 AS BIGINT) n_corrupt,
              CAST(sum(event_id) AS BIGINT) sum_id,
              CAST(min(epoch_us(ts)) AS BIGINT) min_ep,
              CAST(max(epoch_us(ts)) AS BIGINT) max_ep,
              CAST(sum(CAST(CAST(value AS VARCHAR) AS DECIMAL(38,6)))
                AS DOUBLE) sum_value
       FROM events GROUP BY 1 ORDER BY event_type"""

  /** Write the events slice to `fmt`, read it back schema-explicit, and
    * aggregate per type — the interchange-fidelity probe behind
    * q_{csv,jsonl,orc}_roundtrip. Timestamps travel as epoch-µs longs
    * (the schema-explicit pipeline convention — text-format timestamp
    * string round trips are a formatting contract this probe does not
    * depend on); doubles travel raw (shortest-repr serialization reads
    * back bit-identical). `n_corrupt` counts PERMISSIVE-mode quarantined
    * rows — the oracle pins it to zero.
    */
  private def interchangeRoundTrip(s: SparkSession, dir: String,
                                   fmt: String): DataFrame = {
    import graft.sources.{ColumnarFormats, TextFormats}
    val ev = t(s, dir, "events").select(col("event_id"), col("user_id"),
      col("event_type"), col("value"), unix_micros(col("ts")).as("ep"))
    val out = scratch(s"graft_${fmt}_rt_")
    val back = fmt match {
      case "csv" =>
        TextFormats.writeCsv(ev, out); TextFormats.readCsv(s, out, ev.schema)
      case "jsonl" =>
        TextFormats.writeJsonl(ev, out)
        TextFormats.readJsonl(s, out, ev.schema)
      case "orc" =>
        ColumnarFormats.writeOrc(ev, out, bloomCols = Seq("event_id"))
        ColumnarFormats.readOrc(s, out, ev.schema)
          .withColumn(TextFormats.CorruptCol, lit(null).cast(StringType))
    }
    back.groupBy("event_type").agg(
        count(lit(1)).as("n"),
        sum(when(col(TextFormats.CorruptCol).isNotNull, 1L).otherwise(0L))
          .cast(LongType).as("n_corrupt"),
        sum(col("event_id")).cast(LongType).as("sum_id"),
        min(col("ep")).cast(LongType).as("min_ep"),
        max(col("ep")).cast(LongType).as("max_ep"),
        sum(col("value").cast(DoubleType).cast(DecimalType(38, 6)))
          .cast(DoubleType).as("sum_value"))
      .orderBy("event_type")
  }

  /** DuckDB-dialect SQL for Layout.zValue(x, y, bits) — the bit
    * interleave (x on odd bits, y on even) spelled as divide/mod/multiply
    * integer arithmetic, which both engines evaluate exactly. */
  private def zSql(xe: String, ye: String, bits: Int): String =
    (0 until bits).map(i =>
      s"((($xe) // ${1L << i}) % 2) * ${1L << (2 * i + 1)} + " +
        s"((($ye) // ${1L << i}) % 2) * ${1L << (2 * i)}")
      .mkString("(", " + ", ")")

  /** DuckDB-dialect SQL for the 52-bit order-sampling integer — the value
    * of the first 13 md5 hex digits of `key` (exactly representable in
    * binary64), same digit arithmetic as [[bucketSql]]. */
  private def u52Sql(key: String): String =
    (0 until 13).map(i =>
      s"(strpos('0123456789abcdef', substr(md5($key),${i + 1},1))-1)" +
        (if (i < 12) s" * ${1L << (4 * (12 - i))}" else ""))
      .mkString("(", " + ", ")")
}
