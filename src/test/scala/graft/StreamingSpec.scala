package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.meta.MetaStore
import graft.streaming.{EventStreams, StreamingSync}
import graft.sync.SyncEngine

/** Streaming operators tested through the PUBLIC file-source API (no
  * internal MemoryStream): write fixture slices as parquet, readStream
  * over them with Trigger.AvailableNow, and compare against the batch
  * forms — Spark's batch/streaming unification makes the transforms
  * directly comparable.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** Fixture events with second-truncated µs timestamps (what the batch
    * sessionizer keys on). */
  private def events: DataFrame =
    Tables.load(spark, TestSpark.sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        date_trunc("second", col("ts")).as("ts"))

  test("streaming tumbling counts (complete mode) == batch groupBy") {
    val dir = tmp("graft_stream_events_")
    events.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(events.schema).parquet(dir)

    val q = EventStreams.tumblingCounts(stream).writeStream
      .format("memory").queryName("tumb_stream")
      .outputMode("complete").trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmp("graft_ckpt_tumb_"))
      .start()
    q.awaitTermination()

    val got = spark.table("tumb_stream")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val want = events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("hour_ts"),
        col("event_type"), col("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("streaming sliding counts (complete mode) == batch slidingCounts") {
    val dir = tmp("graft_stream_slide_")
    events.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(events.schema).parquet(dir)

    val q = EventStreams.slidingCounts(stream).writeStream
      .format("memory").queryName("slide_stream")
      .outputMode("complete").trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmp("graft_ckpt_slide_"))
      .start()
    q.awaitTermination()

    val got = spark.table("slide_stream")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val want = graft.ext.Events.slidingCounts(events)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("streaming session_window sessions match batch gap-sessionization") {
    val dir = tmp("graft_stream_sess_")
    events.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(events.schema).parquet(dir)

    val q = EventStreams.sessions(stream).writeStream
      .format("memory").queryName("sess_stream")
      .outputMode("complete").trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmp("graft_ckpt_sess_"))
      .start()
    q.awaitTermination()

    // Compare (user_id, start_ep, n_events); end differs by design
    // (session_window end = last event + gap, batch end = last event).
    val got = spark.table("sess_stream")
      .select("user_id", "start_ep", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = graft.ext.Events.sessionize(events)
      .select(col("user_id"), col("start_ep"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("stream-stream interval join matches the batch correlate") {
    val dir = tmp("graft_stream_corr_")
    events.write.mode("overwrite").parquet(dir)
    def side(t: String) = spark.readStream.schema(events.schema).parquet(dir)
      .where(col("event_type") === t)

    val q = EventStreams.correlate(side("view"), side("click"), withinSec = 3600L)
      .writeStream
      .format("memory").queryName("corr_stream")
      .outputMode("append").trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmp("graft_ckpt_corr_"))
      .start()
    q.awaitTermination()

    val got = spark.table("corr_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val want = graft.ext.Events.correlate(events, "user_id", "event_type",
        "event_id", "ts", "view", "click", withinSec = 3600L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want && got.nonEmpty,
      s"stream pairs (${got.size}) must equal batch pairs (${want.size})")
  }

  test("stream-static broadcast enrich counts == batch join + rollup") {
    val dir = tmp("graft_stream_enrich2_")
    events.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(events.schema).parquet(dir)
    val dim = Tables.load(spark, TestSpark.sfDir, "customer")
      .join(Tables.load(spark, TestSpark.sfDir, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name"))

    val q = EventStreams.enrichedCounts(stream, dim,
        "user_id", "c_custkey", "n_name").writeStream
      .format("memory").queryName("enrich_counts_stream")
      .outputMode("complete").trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmp("graft_ckpt_enrich2_"))
      .start()
    q.awaitTermination()

    val got = spark.table("enrich_counts_stream")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val want = events.join(dim, col("user_id") === col("c_custkey"))
      .groupBy(col("n_name"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("streaming dedup keeps one row per content hash") {
    import spark.implicits._
    val dir = tmp("graft_stream_dedup_")
    // two distinct texts, one duplicated across the batch
    Seq((1L, "alpha beta", "2024-01-01 00:00:00"),
        (2L, "alpha beta", "2024-01-01 00:10:00"),
        (3L, "gamma delta", "2024-01-01 00:20:00"))
      .toDF("doc_id", "text", "t")
      .select(col("doc_id"), col("text"), col("t").cast("timestamp").as("ts"))
      .coalesce(1).write.parquet(dir + "/b1")
    val schema = spark.read.option("recursiveFileLookup", "true").parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("recursiveFileLookup", "true").parquet(dir)
    val q = graft.streaming.EventStreams.dedupStream(stream, "doc_id", "text", "ts")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmp("graft_ckpt_dedup_"))
      .start()
    q.awaitTermination()
    val kept = spark.table("dedup_stream").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.size == 2 && kept.contains(3L) && (kept - 3L).subsetOf(Set(1L, 2L)),
      s"one survivor per hash, got $kept")
  }

  test("flatMapGroupsWithState sessions: batch == gaps-and-islands sessionizer") {
    implicit val s = spark
    import graft.streaming.StatefulSessions
    val ev = events
    // closedSessions emits every session CLOSED by a later event; drain is
    // each user's final open session — together they equal the batch form.
    val got = StatefulSessions.closedSessions(ev).toDF()
      .union(StatefulSessions.drain(ev))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val want = graft.ext.Events.sessionize(ev)
      .select(col("user_id"), col("start_ep"), col("end_ep"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want)
  }

  test("flatMapGroupsWithState sessions: incremental stream closes prior-batch sessions") {
    implicit val s = spark
    import spark.implicits._
    import graft.streaming.StatefulSessions
    val dir = tmp("graft_stream_state_")
    // batch 1: two events 10s apart; batch 2: one event 1h later — it must
    // close the first session exactly once, with state carried across batches.
    Seq((7L, 1L, "2024-01-01 00:00:00"), (7L, 2L, "2024-01-01 00:00:10"))
      .toDF("user_id", "event_id", "t")
      .select(col("user_id"), col("event_id"), col("t").cast("timestamp").as("ts"))
      .coalesce(1).write.parquet(dir + "/b1")
    Thread.sleep(1100)
    Seq((7L, 3L, "2024-01-01 01:00:10"))
      .toDF("user_id", "event_id", "t")
      .select(col("user_id"), col("event_id"), col("t").cast("timestamp").as("ts"))
      .coalesce(1).write.parquet(dir + "/b2")

    val schema = spark.read.option("recursiveFileLookup", "true").parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true").parquet(dir)
    val q = StatefulSessions.closedSessions(stream).toDF().writeStream
      .format("memory").queryName("state_sessions")
      .outputMode("append").trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmp("graft_ckpt_state_"))
      .start()
    q.awaitTermination()

    val out = spark.table("state_sessions").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z").getEpochSecond
    assert(out == Set((7L, base, base + 10, 2L)),
      "the hour-later event must close the first session (start, end=+10s, n=2)")
  }

  test("stateless enrichment (hash sample + PII scrub + quality score) composes into a stream unchanged") {
    // The sampling/scrubbing/scoring operators are pure column transforms —
    // the SAME functions run batch or streaming; this pins that no hidden
    // action or non-streamable shape (rand(), window-over-all, collect)
    // sneaks in.
    import graft.ext.{Sampling, TextOps}
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val dir = tmp("graft_stream_docs_")
    docs.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(docs.schema).parquet(dir)

    def pipeline(df: DataFrame): DataFrame =
      TextOps.qualityScore(
        TextOps.redactPii(Sampling.hashSample(df, "doc_id", 10),
          "doc_id", "text").withColumnRenamed("redacted", "text"),
        "doc_id", "text")

    val q = pipeline(stream).writeStream
      .format("memory").queryName("enrich_stream")
      .outputMode("append").trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmp("graft_ckpt_enrich_"))
      .start()
    q.awaitTermination()

    val got = spark.table("enrich_stream")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val want = pipeline(docs)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("StreamingSync: snapshot files applied in order, catalog converges") {
    import spark.implicits._
    val snapDir = tmp("graft_stream_snap_")
    val store = new MetaStore(spark, tmp("graft_stream_meta_"))
    val engine = new SyncEngine(spark, store)

    val snap1 = Seq((1L, 100L, "a"), (1L, 100L, "b"), (2L, 50L, "a"))
      .toDF("shard_id", "shard_length", "hostname")
    val snap2 = Seq((1L, 100L, "a"), (3L, 70L, "c"))
      .toDF("shard_id", "shard_length", "hostname")
    snap1.coalesce(1).write.parquet(snapDir + "/s1")
    Thread.sleep(1100)  // file-source orders batches by modification time
    snap2.coalesce(1).write.parquet(snapDir + "/s2")

    val stream = spark.readStream.schema(snap1.schema)
      .option("maxFilesPerTrigger", "1")  // one snapshot per micro-batch
      .option("recursiveFileLookup", "true")
      .parquet(snapDir)
    val ckpt = tmp("graft_ckpt_sync_")
    val q = new StreamingSync(engine, 1L).start(stream, ckpt)
    q.awaitTermination()

    val placements = store.placements.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(placements == Set((1L, 100L, "a"), (3L, 70L, "c")),
      "catalog must converge to the LAST snapshot")
    val vAfter = store.currentVersion

    // Redelivery/restart with no new files: checkpoint means no batches,
    // catalog untouched — the streaming form of idempotent re-run.
    val q2 = new StreamingSync(engine, 1L).start(
      spark.readStream.schema(snap1.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true").parquet(snapDir), ckpt)
    q2.awaitTermination()
    assert(store.currentVersion == vAfter)
  }

  test("StreamingSync tolerant mode: failed drop survives, next snapshot retries it") {
    import spark.implicits._
    val snapDir = tmp("graft_stream_tsnap_")
    val store = new MetaStore(spark, tmp("graft_stream_tmeta_"))
    val engine = new SyncEngine(spark, store)
    val schema = Seq((1L, 100L, "a")).toDF("shard_id", "shard_length", "hostname").schema

    // snapshot 1 seeds {1@a, 1@b}; snapshot 2 drops replica 1@b
    Seq((1L, 100L, "a"), (1L, 100L, "b"))
      .toDF("shard_id", "shard_length", "hostname")
      .coalesce(1).write.parquet(snapDir + "/s1")
    Thread.sleep(1100)
    Seq((1L, 100L, "a")).toDF("shard_id", "shard_length", "hostname")
      .coalesce(1).write.parquet(snapDir + "/s2")

    // every drop on host b FAILS — the replica must survive both batches
    val failDropsOnB = SyncEngine.failWhere(
      col("op") === "drop" && col("hostname") === "b")
    val q = new StreamingSync(engine, 1L).start(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true").parquet(snapDir),
      tmp("graft_ckpt_tsync_"),
      workerApply = Some(failDropsOnB))
    q.awaitTermination()
    val afterFail = store.placements.collect()
      .map(r => (r.getLong(0), r.getString(2))).toSet
    assert(afterFail == Set((1L, "a"), (1L, "b")),
      s"failed drop must be skipped, not fatal: $afterFail")

    // worker recovers: a later identical snapshot retries and completes
    Thread.sleep(1100)
    Seq((1L, 100L, "a")).toDF("shard_id", "shard_length", "hostname")
      .coalesce(1).write.parquet(snapDir + "/s3")
    val q2 = new StreamingSync(engine, 1L).start(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true").parquet(snapDir),
      tmp("graft_ckpt_tsync2_"),
      workerApply = Some(SyncEngine.allOk))
    q2.awaitTermination()
    val recovered = store.placements.collect()
      .map(r => (r.getLong(0), r.getString(2))).toSet
    assert(recovered == Set((1L, "a")),
      s"retry after recovery must converge: $recovered")
  }

  // ── measured STATE BOUNDS (the SURVEY §2.8 scale contract) ────────────
  /** Long-tailed fixture: 24 hours of events, one parquet FILE per 2-hour
    * slice with strictly increasing mod-times, so the file source admits
    * slices in event-time order (`maxFilesPerTrigger=1` → one slice per
    * micro-batch) and the watermark genuinely ADVANCES and EVICTS between
    * batches — the thing a single-batch AvailableNow run can never show.
    * Per hour: 5 users × 3 events (minutes 0/10/20 — the 40-minute idle
    * tail closes each hour's session against the 30-minute gap) × 2 event
    * types = 30 rows/hour, 720 total. */
  private lazy val longTail: (String, Long) = {
    import spark.implicits._
    val dirF = Files.createTempDirectory("graft_state_src_").toFile
    val baseMs = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rows = for {
      h <- 0 until 24; m <- Seq(0, 10, 20); u <- 0 until 5
      t <- Seq("view", "click")
    } yield ((h * 10000 + m * 100 + u * 2 + (if (t == "view") 0 else 1)).toLong,
      u.toLong, t, 1.0,
      new java.sql.Timestamp(baseMs + h * 3600000L + m * 60000L))
    val df = rows.toDF("event_id", "user_id", "event_type", "value", "ts")
    for (sl <- 0 until 12) {
      val stage = Files.createTempDirectory("graft_state_slice_").toString
      df.where(col("ts") >= new java.sql.Timestamp(baseMs + sl * 7200000L) &&
          col("ts") < new java.sql.Timestamp(baseMs + (sl + 1) * 7200000L))
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(dirF, f"slice$sl%02d.parquet")
      java.nio.file.Files.copy(part.toPath, dst.toPath)
      assert(dst.setLastModified(baseMs + sl * 60000L))
    }
    (dirF.toString, rows.size.toLong)
  }

  /** (max, final, maxMemBytes) of per-batch total state rows across the
    * run's StateOperatorProgress records. */
  private def stateStats(
      q: org.apache.spark.sql.streaming.StreamingQuery): (Long, Long, Long) = {
    val progs = q.recentProgress.toSeq
    val rows = progs.map(_.stateOperators.map(_.numRowsTotal).sum)
    val mem = progs.map(_.stateOperators.map(_.memoryUsedBytes).sum)
    val nonEmpty = rows.filter(_ > 0)
    (if (nonEmpty.isEmpty) 0L else nonEmpty.max,
      if (nonEmpty.isEmpty) 0L else nonEmpty.last,
      if (mem.isEmpty) 0L else mem.max)
  }

  test("stream-stream join / sessions / dedup state is bounded by the " +
      "watermark horizon, not by stream length") {
    val (dir, total) = longTail
    val sch = org.apache.spark.sql.types.StructType.fromDDL(
      "event_id BIGINT, user_id BIGINT, event_type STRING, " +
        "value DOUBLE, ts TIMESTAMP")
    def src() = spark.readStream.schema(sch)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    def run(name: String, out: DataFrame): (Long, Long, Long) = {
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(Trigger.AvailableNow())
        .option("checkpointLocation", tmp("graft_ckpt_state_"))
        .start()
      q.awaitTermination()
      stateStats(q)
    }

    // interval join: each side retains ≤ within(1h)+watermark(2h) plus one
    // 2h admission slice of rows — ≤ 5h/side = 75 rows/side vs 360
    // arriving per side. Bound asserted with 2× headroom; the "not stream
    // length" clause is max ≪ total.
    val ev = src()
    val (jMax, jLast, jMem) = run("state_join",
      EventStreams.correlate(ev.where(col("event_type") === "view"),
        ev.where(col("event_type") === "click"), withinSec = 3600L))
    assert(jMax > 0, "join progress must record state")
    assert(jMax <= 300, s"join state rows $jMax exceed the horizon bound")
    assert(jMax < total / 2, s"join state $jMax grew with stream length $total")

    // session window: open sessions only — ≤ users × (horizon / hourly
    // session) ≈ 5×3, far under the 720 inputs
    val (sMax, sLast, sMem) = run("state_sess", EventStreams.sessions(src()))
    assert(sMax > 0 && sMax <= 100,
      s"session state rows $sMax exceed the open-session bound")

    // dedup: one row per distinct hash inside the 2h watermark + slice —
    // ≤ ~4h×30 rows vs 720 distinct hashes total
    val (dMax, dLast, dMem) = run("state_dedup",
      EventStreams.dedupStream(
        src().withColumn("text", concat(lit("t"), col("event_id"))),
        "event_id", "text", "ts", watermark = "2 hours"))
    assert(dMax > 0 && dMax <= 300,
      s"dedup state rows $dMax exceed the horizon bound")
    assert(dMax < total / 2, s"dedup state $dMax grew with stream length $total")

    info(s"state rows (max/final): join $jMax/$jLast, sessions $sMax/$sLast, " +
      s"dedup $dMax/$dLast; mem bytes max: join $jMem, sessions $sMem, dedup $dMem")
  }

  test("streaming percolation over three forced micro-batches equals " +
    "the batch operator (X129b)") {
    import graft.ext.TextOps
    import spark.implicits._
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val stored = Seq(
      (1L, Seq("hash", "join")),
      (2L, Seq("table", "scan", "filter")),
      (5L, Seq("agg"))).toDF("qid", "terms")
    // three files → maxFilesPerTrigger=1 → three genuine micro-batches
    val srcDir = tmp("graft_perc_stream_src_")
    (0 to 2).foreach(r => docs.where(col("doc_id") % 3 === r)
      .write.parquet(s"$srcDir/f$r"))
    val q = TextOps.percolate(
        spark.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$srcDir/*"),
        "doc_id", "text", stored, "qid", "terms")
      .writeStream.format("memory").queryName("perc_spec")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", tmp("graft_ckpt_percspec_"))
      .start()
    q.awaitTermination()
    assert(q.recentProgress.count(_.numInputRows > 0) >= 3,
      s"expected ≥3 non-empty micro-batches, got " +
        q.recentProgress.map(_.numInputRows).mkString(","))
    val streamed = spark.table("perc_spec").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = TextOps.percolate(docs, "doc_id", "text", stored,
      "qid", "terms").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch, "micro-batching must not move a match")
    assert(batch.nonEmpty, "vacuous pin")
  }

  test("streaming index ingest: multi-batch appends converge to the batch append") {
    import graft.ext.Similarity
    val emb = Tables.load(spark, TestSpark.sfDir, "embeddings")
    val evens = emb.where(col("vec_id") % 2 === 0)
    val odds = emb.where(col("vec_id") % 2 === 1)

    // the delta stream arrives as THREE files → maxFilesPerTrigger=1
    // forces three genuine micro-batches, each appended separately
    val deltaDir = tmp("graft_idx_stream_src_")
    odds.where(col("vec_id") % 3 === 1).write.parquet(s"$deltaDir/f1")
    odds.where(col("vec_id") % 3 === 0).write.parquet(s"$deltaDir/f2")
    odds.where(col("vec_id") % 3 === 2).write.parquet(s"$deltaDir/f3")

    val streamed = tmp("graft_idx_streamed_")
    Similarity.ivfIndexBuild(evens, "vec_id", "embedding", streamed,
      nCentroids = 64, lloydIters = 1)
    def idx(p: String) = Similarity.ivfIndexDataDir(spark, p)
    val filesBefore = spark.read.parquet(idx(streamed)).inputFiles.toSet
    val q = graft.streaming.StreamingIndexIngest.start(
      spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$deltaDir/*"),
      "vec_id", "embedding", streamed, tmp("graft_ckpt_idxspec_"))
    q.awaitTermination()
    assert(q.recentProgress.count(_.numInputRows > 0) >= 3,
      s"expected ≥3 non-empty micro-batches, got " +
        q.recentProgress.map(_.numInputRows).mkString(","))

    // reference: the one-shot batch append
    val batched = tmp("graft_idx_batched_")
    Similarity.ivfIndexBuild(evens, "vec_id", "embedding", batched,
      nCentroids = 64, lloydIters = 1)
    Similarity.ivfIndexAppend(odds, "vec_id", "embedding", batched)

    // identical CONTENT: same (vector, bucket) assignment set — batch
    // boundaries must not move any vector to a different inverted list
    def assignments(p: String) =
      spark.read.parquet(idx(p)).select("nid", "bucket")
        .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(assignments(streamed) == assignments(batched),
      "streamed assignment set must equal the batch append's")
    // built files untouched; probes over both indexes agree exactly
    assert(filesBefore.subsetOf(
      spark.read.parquet(idx(streamed)).inputFiles.toSet),
      "streaming append must not rewrite built files")
    def probe(p: String) =
      Similarity.ivfIndexProbe(emb.where(col("vec_id") < 10),
        "vec_id", "embedding", p, k = 5, nprobe = 16)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        .sortBy(x => (x._1, x._2)).toSeq
    assert(probe(streamed) == probe(batched),
      "probe results must not depend on ingest batching")
  }

  test("streaming text ingest (X124): multi-batch appends converge to " +
    "the one-shot append for corpus-known terms") {
    import graft.ext.TextIndex
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val evens = docs.where(col("doc_id") % 2 === 0)
    val odds = docs.where(col("doc_id") % 2 === 1)

    // three files → maxFilesPerTrigger=1 → three genuine micro-batches
    val deltaDir = tmp("graft_txt_stream_src_")
    odds.where(col("doc_id") % 3 === 1).write.parquet(s"$deltaDir/f1")
    odds.where(col("doc_id") % 3 === 0).write.parquet(s"$deltaDir/f2")
    odds.where(col("doc_id") % 3 === 2).write.parquet(s"$deltaDir/f3")

    val streamed = tmp("graft_txt_streamed_")
    TextIndex.buildTextIndex(evens, "doc_id", "text", streamed, nBuckets = 8)
    def idx(p: String) = graft.ext.Similarity.ivfIndexDataDir(spark, p)
    val filesBefore = spark.read.parquet(idx(streamed)).inputFiles.toSet
    val q = graft.streaming.StreamingTextIngest.start(
      spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$deltaDir/*"),
      "doc_id", "text", streamed, tmp("graft_ckpt_txtspec_"))
    q.awaitTermination()
    assert(q.recentProgress.count(_.numInputRows > 0) >= 3,
      s"expected ≥3 non-empty micro-batches, got " +
        q.recentProgress.map(_.numInputRows).mkString(","))

    // reference: the one-shot batch append on an identical base
    val batched = tmp("graft_txt_batched_")
    TextIndex.buildTextIndex(evens, "doc_id", "text", batched, nBuckets = 8)
    TextIndex.textIndexAppend(odds, "doc_id", "text", batched, "t1")

    // corpus-known query terms score with the base's frozen df on every
    // appended row, whatever the batching — full-corpus probes equal
    val terms = Seq("spark", "join", "window")
    def probe(p: String) =
      TextIndex.textIndexTopK(spark, terms, p, k = 100000)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    assert(probe(streamed) == probe(batched),
      "probe results must not depend on ingest batching")
    // built files untouched by the stream
    assert(filesBefore.subsetOf(
      spark.read.parquet(idx(streamed)).inputFiles.toSet),
      "streaming text append must not rewrite built files")
  }

  test("streaming index ingest: crash AFTER a batch publishes but BEFORE " +
      "its checkpoint commit, then restart — the replay is exactly-once") {
    import graft.ext.Similarity
    val emb = Tables.load(spark, TestSpark.sfDir, "embeddings")
    val evens = emb.where(col("vec_id") % 2 === 0)
    val odds = emb.where(col("vec_id") % 2 === 1)

    // three files → maxFilesPerTrigger=1 → three micro-batches
    val deltaDir = tmp("graft_idx_crash_src_")
    odds.where(col("vec_id") % 3 === 1).write.parquet(s"$deltaDir/f1")
    odds.where(col("vec_id") % 3 === 0).write.parquet(s"$deltaDir/f2")
    odds.where(col("vec_id") % 3 === 2).write.parquet(s"$deltaDir/f3")
    def deltas = spark.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$deltaDir/*")

    val path = tmp("graft_idx_crash_")
    val ckpt = tmp("graft_ckpt_crash_")
    Similarity.ivfIndexBuild(evens, "vec_id", "embedding", path,
      nCentroids = 64, lloydIters = 1)

    // run the REAL ingest shape but kill the query in the worst window:
    // batch 1's idempotent append has fully published (marker written)
    // when the injected failure aborts the epoch, so the checkpoint never
    // records batch 1 and the restart MUST replay it against an index
    // that already contains it
    val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
    val q1 = deltas.writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          Similarity.ivfIndexAppendIdempotent(batch, "vec_id", "embedding",
            path, s"b$batchId")
        if (batchId == 1 && crashed.compareAndSet(false, true))
          throw new RuntimeException(
            "injected crash: publish done, checkpoint commit lost")
        ()
      }
      .start()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      q1.awaitTermination())
    assert(crashed.get(), "the injected crash must have fired")

    // restart from the SAME checkpoint through the production entry point
    val q2 = graft.streaming.StreamingIndexIngest.start(
      deltas, "vec_id", "embedding", path, ckpt)
    q2.awaitTermination()

    // reference: an uninterrupted run over the same deltas
    val clean = tmp("graft_idx_clean_")
    Similarity.ivfIndexBuild(evens, "vec_id", "embedding", clean,
      nCentroids = 64, lloydIters = 1)
    val qc = graft.streaming.StreamingIndexIngest.start(
      deltas, "vec_id", "embedding", clean, tmp("graft_ckpt_clean_"))
    qc.awaitTermination()

    // exactly-once: same assignment multiset (so same row count — no
    // duplicate vectors from the replayed batch), identical probes
    def assignments(p: String) =
      spark.read.parquet(Similarity.ivfIndexDataDir(spark, p))
        .select("nid", "bucket")
        .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(assignments(path) == assignments(clean),
      "crash-replay must converge to the uninterrupted run's index")
    def probe(p: String) =
      Similarity.ivfIndexProbe(emb.where(col("vec_id") < 10),
        "vec_id", "embedding", p, k = 5, nprobe = 16)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        .sortBy(x => (x._1, x._2)).toSeq
    assert(probe(path) == probe(clean),
      "probes must be identical after a crash-replay")
  }

  test("streaming index retraction: multi-batch takedown converges to the " +
      "batch delete, and a crash-replay after a published batch is " +
      "exactly-once") {
    import graft.ext.Similarity
    val emb = Tables.load(spark, TestSpark.sfDir, "embeddings")
    val victims = emb.where(col("vec_id") % 7 === 0).select("vec_id")

    // three id files -> maxFilesPerTrigger=1 -> three retraction batches
    val idsDir = tmp("graft_idx_retract_src_")
    victims.where(col("vec_id") % 3 === 0).write.parquet(s"$idsDir/f1")
    victims.where(col("vec_id") % 3 === 1).write.parquet(s"$idsDir/f2")
    victims.where(col("vec_id") % 3 === 2).write.parquet(s"$idsDir/f3")
    def ids = spark.readStream.schema(victims.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$idsDir/*")

    def freshIndex(prefix: String): String = {
      val p = tmp(prefix)
      Similarity.ivfIndexBuild(emb, "vec_id", "embedding", p,
        nCentroids = 16, lloydIters = 1)
      p
    }
    def members(p: String): Seq[(Long, String)] =
      spark.read.parquet(Similarity.ivfIndexDataDir(spark, p))
        .select("nid", "bucket")
        .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq

    // reference: the one-shot batch delete
    val batched = freshIndex("graft_idx_retract_batch_")
    Similarity.ivfIndexDeleteIdempotent(victims, "vec_id", batched, "all")

    // streamed retraction with an injected crash AFTER batch 1 published
    // its delete (marker written) but BEFORE the checkpoint committed —
    // the restart must replay the batch as a no-op
    val streamed = freshIndex("graft_idx_retract_stream_")
    val ckpt = tmp("graft_ckpt_retract_")
    val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
    val q1 = ids.writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          Similarity.ivfIndexDeleteIdempotent(batch, "vec_id", streamed,
            s"d$batchId")
        if (batchId == 1 && crashed.compareAndSet(false, true))
          throw new RuntimeException(
            "injected crash: retraction published, checkpoint commit lost")
        ()
      }
      .start()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      q1.awaitTermination())
    assert(crashed.get(), "the injected crash must have fired")
    val q2 = graft.streaming.StreamingIndexIngest.startRetract(
      ids, "vec_id", streamed, ckpt)
    q2.awaitTermination()

    assert(members(streamed) == members(batched),
      "streamed retraction must converge to the batch delete exactly")
    val delIds = victims.collect().map(_.getLong(0)).toSet
    assert(members(streamed).forall(m => !delIds.contains(m._1)),
      "no retracted id may remain after the stream drains")
  }

  test("streaming near-dup classification (X117): each micro-batch's " +
    "verdicts equal the batch operator on that batch; replay is a no-op") {
    import graft.ext.{Dedup, Sampling}
    val d = Tables.load(spark, TestSpark.sfDir, "documents")
    val base = d.where(Sampling.hashBucket(col("doc_id"), 100) >= 20)
    val delta = d.where(Sampling.hashBucket(col("doc_id"), 100) < 20)
    val index = Dedup.buildDeltaIndex(base, "doc_id", "text", maxDf = 100)
    try {
      // three files → maxFilesPerTrigger=1 forces three real triggers
      val srcDir = tmp("graft_snd_src_")
      // coalesce(1): exactly ONE parquet file per split so
      // maxFilesPerTrigger=1 yields exactly these three batches (the
      // load-time split guard parallelizes `delta`, which would
      // otherwise write one file per partition)
      delta.where(col("doc_id") % 3 === 0).coalesce(1)
        .write.parquet(s"$srcDir/f1")
      delta.where(col("doc_id") % 3 === 1).coalesce(1)
        .write.parquet(s"$srcDir/f2")
      delta.where(col("doc_id") % 3 === 2).coalesce(1)
        .write.parquet(s"$srcDir/f3")
      val out = tmp("graft_snd_out_")
      val q = graft.streaming.StreamingNearDup.start(
        spark.readStream.schema(d.schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$srcDir/*"),
        "doc_id", "text", index, threshold = 0.3, out,
        tmp("graft_snd_ckpt_"))
      q.awaitTermination()
      assert(q.recentProgress.count(_.numInputRows > 0) >= 3)
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select("doc_id", "status", "match_id", "jaccard")
          .collect()
          .map(r => (r.getLong(0), r.getString(1),
            if (r.isNullAt(2)) -1L else r.getLong(2),
            if (r.isNullAt(3)) -1.0 else r.getDouble(3)))
          .sortBy(_._1).toSeq
      // per-batch contract: the streamed union equals classifying each
      // file independently with the batch operator
      val perBatch = Seq("f1", "f2", "f3").flatMap { f =>
        rows(Dedup.dedupDeltaIndexed(index,
          spark.read.parquet(s"$srcDir/$f"), "doc_id", "text", 0.3))
      }.sortBy(_._1)
      val streamed = rows(spark.read.parquet(s"$out/b*"))
      assert(streamed == perBatch,
        "streamed verdicts must equal per-batch classification")
      // batch-partition invariance: the df cap is corpus-df based (the
      // index carries the hot-shingle set), so a document's verdict
      // never depends on its batch-mates — the three-trigger union must
      // ALSO equal the one-shot batch operator over the whole delta
      val oneShot = rows(
        Dedup.dedupDeltaIndexed(index, delta, "doc_id", "text", 0.3))
      assert(streamed == oneShot,
        "split-source stream must equal the one-shot classification")
      // every delta doc got exactly one verdict
      assert(streamed.map(_._1).toSet ==
        delta.select("doc_id").collect().map(_.getLong(0)).toSet)
      // replay idempotence: re-applying one batch's classification into
      // its batchId-keyed directory leaves the union unchanged (find
      // which source file batch b1 processed rather than assuming order)
      val b1Ids = spark.read.parquet(s"$out/b1")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val b1File = Seq("f1", "f2", "f3").find { f =>
        spark.read.parquet(s"$srcDir/$f")
          .select("doc_id").collect().map(_.getLong(0)).toSet == b1Ids
      }.getOrElse(fail(s"no source file matches batch b1's ids"))
      Dedup.dedupDeltaIndexed(index, spark.read.parquet(s"$srcDir/$b1File"),
          "doc_id", "text", 0.3)
        .write.mode("overwrite").parquet(s"$out/b1")
      assert(rows(spark.read.parquet(s"$out/b*")) == streamed,
        "a replayed batch must rewrite identical rows, not duplicate")
    } finally index.unpersist()
  }
}
