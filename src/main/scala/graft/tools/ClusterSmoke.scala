package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Multi-process execution smoke (builder-side tooling, not engine code):
  * runs a representative query slice under `local-cluster[2,4,...]` — two
  * REAL Executor JVMs forked from SPARK_HOME, separate from the driver —
  * so closure-serialization and executor-classpath defects that
  * `local[n]`'s in-process executor can never surface (unserializable
  * captures, driver-only statics, classes missing from the executor
  * classpath) fail loudly here. The slice covers each execution shape
  * once: a shuffle agg (q1_pricing), the full sync lifecycle with its
  * versioned commits (q_sync_apply), an LSH band-join dedup
  * (q_dedup_minhash), codegen-Expression ANN with a centroid literal
  * (q_ann_ivf), a mapPartitions codec (q_media_avc), and a streaming
  * query (q_stream_dedup). Usage:
  *
  *   SPARK_SCALA_VERSION=2.13 \
  *     sbt "runMain graft.tools.ClusterSmoke /root/testdata/sf0.01"
  *   # full surface: ... ClusterSmoke <sfDir> --all
  *   # data-volume tier at sf0.1/sf1: ... ClusterSmoke <sfDir> --heavy --mem=4096
  *
  * (SPARK_SCALA_VERSION must be exported: local-cluster inherits
  * SPARK_TESTING semantics, under which the executor launcher probes
  * SPARK_HOME source-build directories instead of jars/ and dies with
  * "Cannot find any build directories" unless the version is pinned.)
  *
  * Prints one JSON line per query plus a final summary; exits nonzero on
  * any failure so automation can gate on it. Results are recorded in
  * SCALING.md ("local-cluster smoke").
  */
object ClusterSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    // executor memory (MiB): 2048 suffices at sf0.01; the sf0.1/sf1
    // heavy-tier runs need real shuffle/broadcast headroom per JVM
    val memMb = args.collectFirst {
      case a if a.startsWith("--mem=") => a.stripPrefix("--mem=").toInt
    }.getOrElse(2048)
    val master = s"local-cluster[2,4,$memMb]"
    val classesDir = new java.io.File("target/scala-2.13/classes")
      .getAbsolutePath
    val spark = SparkSession.builder()
      .master(master)
      // the forked Executor JVMs know SPARK_HOME's jars but not this
      // project's classes — without this every closure referencing graft
      // code dies with ClassNotFoundException
      .config("spark.executor.extraClassPath", classesDir)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // default: one query per execution shape; `--all` runs the ENTIRE
    // declared surface under the forked executors (the full
    // multi-process certification — every closure, codegen Expression,
    // and streaming state path crosses a real JVM boundary);
    // `--heavy` is the data-volume tier for sf0.1/sf1 runs — the
    // queries whose executor-memory pressure, shuffle spill, and
    // broadcast traffic actually exercise a real JVM boundary: the full
    // ANN index lifecycle (build/append/compact/probe + composed
    // IVFPQ), the dedup pipeline and its LSH/verify tiers, both sync
    // lifecycles, the semantic-dedup audit, and the stateful streams
    val slice =
      if (args.contains("--all")) SparkEntry.queries.keys.toSeq.sorted
      else if (args.contains("--heavy"))
        Seq("q_ann_persist", "q_ann_append", "q_ann_compact",
          "q_ann_delete", "q_ann_ivfpq", "q_ann_pq_persist", "q_stream_index",
          "q_dedup_pipeline", "q_dedup_minhash", "q_dedup_verified",
          "q_semdedup", "q_ngram_jaccard",
          "q_sync_apply", "q_stream_sync",
          "q_stream_dedup", "q_stateful_sessions")
      else Seq("q1_pricing", "q_sync_apply", "q_dedup_minhash",
        "q_ann_ivf", "q_media_avc", "q_stream_dedup")
    var failed = 0
    val results = slice.map { name =>
      val t0 = System.nanoTime()
      val outcome =
        try {
          val n = SparkEntry.queries(name)(spark, sfDir).count()
          s""""rows":$n,"ok":true"""
        } catch {
          case e: Throwable =>
            failed += 1
            val msg = (e.getClass.getSimpleName + ": " +
              String.valueOf(e.getMessage).replaceAll("[\"\\\\\n\r\t]", " "))
              .take(160)
            s""""ok":false,"err":"$msg""""
        }
      val sec = math.rint((System.nanoTime() - t0) / 1e6) / 1e3
      val line = s"""{"query":"$name","sec":$sec,$outcome}"""
      println(line)
      line
    }
    val summary = s"""{"metric":"cluster_smoke","master":"$master","sf":"$sfDir","n":${slice.size},"failed":$failed}"""
    println(summary)
    try {
      val tag =
        if (args.contains("--heavy"))
          "_heavy_" + sfDir.replaceAll(".*/", "")
        else ""
      val p = java.nio.file.Paths.get(s"bench_local/cluster_smoke$tag.json")
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.writeString(p,
        (results :+ summary).mkString("[", ",\n", "]\n"))
    } catch { case _: Throwable => () }
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
