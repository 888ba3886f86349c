package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional trailing args: only dump these queries (dev loop)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.ts is ns-precision parquet (TESTDATA.md): read as Long,
      // Tables.load converts to µs TimestampType.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // per-query wall seconds + dump status, written as timings.json —
    // the record the at-scale gate (bench_local/sf1_r*.json) is built
    // from: single-pass times, so indicative not benchmark-grade
    val timings = Seq.newBuilder[(String, Double, Boolean)]
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name"); true }
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
          false
        }
      timings += ((name, (System.nanoTime() - t0) / 1e9, ok))
    }
    // a FILTERED (dev-loop) run merges into an existing record instead of
    // clobbering a prior full run's timings — replace only the re-run
    // entries, keep the rest verbatim (values are flat objects, so the
    // line-level splice below is safe without a JSON library)
    val timingsPath = Paths.get(s"$outDir/timings.json")
    val fresh = timings.result().map { case (n, t, ok) =>
      n -> s"""{"sec":${math.rint(t * 1000) / 1000},"dumped":$ok}"""
    }.toMap
    val prior: Map[String, String] =
      if (only.nonEmpty && Files.exists(timingsPath))
        """"([^"]+)":(\{[^}]*\})""".r
          .findAllMatchIn(Files.readString(timingsPath))
          .map(m => m.group(1) -> m.group(2)).toMap
      else Map.empty
    val merged = prior ++ fresh
    Files.writeString(timingsPath,
      merged.toSeq.sortBy(_._1).map { case (n, v) => s""""$n":$v""" }
        .mkString("{", ",", "}"))
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
