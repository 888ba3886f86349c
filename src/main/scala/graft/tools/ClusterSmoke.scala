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
    val classesDir = new java.io.File("target/scala-2.13/classes")
      .getAbsolutePath
    val spark = SparkSession.builder()
      .master("local-cluster[2,4,2048]")
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
    // and streaming state path crosses a real JVM boundary)
    val slice =
      if (args.contains("--all")) SparkEntry.queries.keys.toSeq.sorted
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
    println(s"""{"metric":"cluster_smoke","master":"local-cluster[2,4,2048]","sf":"$sfDir","n":${slice.size},"failed":$failed}""")
    try {
      val p = java.nio.file.Paths.get("bench_local/cluster_smoke.json")
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.writeString(p, results.mkString("[", ",\n", "]\n"))
    } catch { case _: Throwable => () }
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
