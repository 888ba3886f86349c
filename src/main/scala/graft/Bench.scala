package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Optional trailing args select a query subset — the single-query dev
    // loop (the driver passes none and measures the full suite).
    val suite =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => args.contains(n) }
    // Evaluate through the noop sink: every output column is materialized,
    // so map-only queries pay their full projection cost. A bare .count()
    // would let Catalyst prune unevaluated projections and benchmark a
    // parquet row count instead.
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
    // Warm-up pass: run the whole suite once so JVM/codegen/scheduler
    // absorption and parquet footer caching don't land on whichever query
    // happens to run first; the measured passes then reflect plan cost.
    suite.foreach { case (_, fn) =>
      try run(fn) catch { case _: Throwable => } }
    // THREE measured whole-suite passes, per-query MEDIAN: single-pass
    // numbers in a contended environment swing ±30% with occasional 10×
    // one-off stalls (GC/scheduling) — a median kills any single outlier
    // while full-suite interleaving keeps one machine-wide stall from
    // hitting all of a query's samples. A query that throws in any
    // measured pass records a NEGATIVE time — the failure sentinel;
    // without it a broken query (which often fails fast) would masquerade
    // as a speedup in the BENCH json.
    val passes = (1 to 3).map { _ =>
      suite.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok = try { run(fn); true } catch { case _: Throwable => false }
        name -> (ok, (System.nanoTime() - t0) / 1e9)
      }
    }
    val results = suite.map { case (name, _) =>
      val samples = passes.map(_(name))
      val median = samples.map(_._2).sorted.apply(samples.size / 2)
      name -> (if (samples.forall(_._1)) median else -median)
    }
    // 3-decimal per-query values: the driver snapshots only the LAST 2000
    // chars of stdout, so a compact line keeps more per-query entries
    // inside its window (and milliseconds are beyond bench noise anyway)
    // failed queries stay strictly negative: ms3 alone would round a
    // fast-failing median to -0.0, which `v < 0` checks read as a pass
    def ms3(v: Double) = math.rint(v * 1000) / 1000
    def enc(v: Double) = if (v < 0) math.min(-0.001, ms3(v)) else ms3(v)
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + enc(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty)
      ms3(results.values.map(math.abs).sum) else 0.0
    // per-pass whole-suite totals: identical-code driver runs have swung
    // 215→257 s across rounds, and a single median total can't show
    // whether that is plan cost or environment contention — the spread
    // between the three passes can (tight spread = plan, wide = machine)
    val passTotals = passes.map(p => ms3(p.map { case (_, (_, t)) => t }.sum))
      .mkString("[", ",", "]")
    // ANN recall gate (full-suite runs only): the PQ tiers' hashed oracle
    // certifies probe completeness, not quality — their recall floors live
    // in specs at fixture scale. Recall is DATA- and SCALE-dependent
    // (kCodes=16 defaults sank 0.76→0.28 from sf0.001 to sf0.1), so the
    // bench loop re-measures both declared tiers at ITS scale every round.
    // A breach is recorded in the bench JSON itself ("ann_recall_ok":
    // false) AND fails the process with a nonzero exit — a regression
    // must be visible to automation that never greps free-text output.
    // A gate that cannot RUN (rGate = None) is reported but does not
    // fail the bench: absence of a measurement is not a measured breach.
    val rGate: Option[(Double, Double)] = if (args.isEmpty) {
      try {
        import graft.ext.Similarity
        import org.apache.spark.sql.functions.{avg, col}
        val emb = Tables.load(spark, sfDir, "embeddings")
        val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
          _ < 10, k = 5).cache()
        def recall(ann: org.apache.spark.sql.DataFrame): Double =
          math.rint(Similarity.annHits(ann, brute)
            .agg(avg(col("hits") / 5.0)).head.getDouble(0) * 1000) / 1000
        // same corpus-adaptive refine as the declared queries — the gate
        // must measure the configuration users actually get at ITS scale
        val refine = Similarity.scaledRefine(emb.count())
        val rPq = recall(Similarity.pqTopK(emb, "vec_id", "embedding",
          _ < 10, k = 5, m = 8, kCodes = 64, refine = refine, dim = 64))
        val rIvfpq = recall(Similarity.ivfpqTopK(emb, "vec_id", "embedding",
          _ < 10, k = 5, nprobe = 32, m = 8, kCodes = 64, refine = refine,
          dim = 64))
        brute.unpersist()
        Some((rPq, rIvfpq))
      } catch { case e: Throwable =>
        System.err.println(s"[bench] recall gate failed: ${e.getMessage}")
        None
      }
    } else None
    // floor override (SPARK_GRAFT_RECALL_FLOOR) exists so the nonzero-exit
    // path itself is testable: setting the floor above 1.0 forces a breach
    // without touching the index math — `Bench q1_pricing` stays exempt
    // (gate runs on full-suite passes only)
    val floor = sys.env.get("SPARK_GRAFT_RECALL_FLOOR")
      .map(_.toDouble).getOrElse(0.6)
    val recallOk = rGate.forall { case (p, i) => p >= floor && i >= floor }
    val gateJson = rGate.map { case (p, i) =>
      s""","ann_recall":{"pq":$p,"ivfpq":$i,"floor":$floor,"ok":$recallOk}"""
    }.getOrElse("")
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","passes":$passTotals$gateJson,"queries":$qs,"sf":"$sfDir"}"""
    println(full)
    rGate.foreach { case (rPq, rIvfpq) =>
      println(s"""{"metric":"ann_recall","pq":$rPq,"ivfpq":$rIvfpq,"floor":$floor,"ok":$recallOk,"sf":"$sfDir"}""")
      if (!recallOk)
        println(s"ANN RECALL BELOW FLOOR: pq=$rPq ivfpq=$rIvfpq < $floor")
    }
    // Short machine-parseable summary LAST: the full line above overflows
    // the driver's 2000-char tail once the suite passed ~60 queries (its
    // head — including the total — is truncated away, hence parsed:null
    // in every BENCH_r*.json). A last line under 150 chars always
    // survives the tail cut whole.
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"passes":$passTotals,"sf":"$sfDir"}""")
    // full-suite record only — a single-query dev loop must not clobber
    // the suite dump this file exists to preserve
    if (args.isEmpty) {
      try {
        val p = java.nio.file.Paths.get("bench_local/driver_full.json")
        if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.writeString(p, full + "\n")
      } catch { case e: Throwable => // bench never fails on bookkeeping
        System.err.println(s"[bench] full-record write failed: ${e.getMessage}")
      }
    }
    spark.stop()
    // after all records are written/printed: a measured recall breach
    // fails the process so CI-style automation cannot miss it
    if (!recallOk) sys.exit(1)
  }
}
