package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Similarity

/** X110c — persisted IVF+PQ index: the compressed on-disk index. Pins
  * the exactness limit (full nprobe + corpus-covering refine ≡ brute
  * force), the packed-code compression, the partition-pruned probe
  * scan, and the versioned-pointer rebuild (staged flip + predecessor
  * retention + vacuum — the raw index's discipline). */
class PqIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmpdir() =
    java.nio.file.Files.createTempDirectory("graft_pqidx_spec_").toString

  private def rm(dir: String): Unit =
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))

  test("probe at nprobe = nCentroids with corpus-covering refine equals " +
    "brute force exactly") {
    val emb = Tables.load(spark, TestSpark.sfDir, "embeddings").cache()
    val dir = tmpdir()
    try {
      Similarity.ivfpqIndexBuild(emb, "vec_id", "embedding", dir,
        nCentroids = 8, m = 8, kCodes = 16)
      val n = emb.count().toInt
      val viaIndex = Similarity.ivfpqIndexProbe(
        emb.where(col("vec_id") < 10), "vec_id", "embedding", emb, dir,
        k = 5, nprobe = 8, refine = n) // k*refine >= corpus: ADC can't cut
      val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        _ < 10, k = 5)
      assert(viaIndex.exceptAll(exact).isEmpty &&
        exact.exceptAll(viaIndex).isEmpty,
        "exhaustive PQ probe must equal brute force (re-rank is exact)")
    } finally { rm(dir); emb.unpersist() }
  }

  test("clamped codebook (corpus < kCodes) packs at the FITTED width: " +
    "lists and probes identical to an explicit kCodes = |corpus| build") {
    // fitPqCodebook clamps to kEff = |corpus| when the corpus is smaller
    // than kCodes; the probe infers the packed bit width from the stored
    // codebook's size, so the build must pack at the same width — packing
    // at pqBits(kCodes) while probing at pqBits(kEff) shift-and-masks
    // wrong codes. Both builds below fit the SAME 10-word codebook, so
    // their code lists (and any probe) must be bit-identical.
    val emb = Tables.load(spark, TestSpark.sfDir, "embeddings")
      .where(col("vec_id") < 10).cache()
    val dirClamped = tmpdir(); val dirExact = tmpdir()
    try {
      Similarity.ivfpqIndexBuild(emb, "vec_id", "embedding", dirClamped,
        nCentroids = 2, m = 8, kCodes = 64) // kEff = 10, clamped
      Similarity.ivfpqIndexBuild(emb, "vec_id", "embedding", dirExact,
        nCentroids = 2, m = 8, kCodes = 10) // same codebook, by request
      def lists(d: String) = spark.read
        .parquet(Similarity.ivfIndexDataDir(spark, d))
        .select("bucket", "nid", "nn", "codes")
      assert(lists(dirClamped).exceptAll(lists(dirExact)).isEmpty &&
        lists(dirExact).exceptAll(lists(dirClamped)).isEmpty,
        "clamped build must pack codes at the fitted width")
      // and the ADC-only probe (refine=1: candidate ranking decides
      // everything, no exact re-rank safety net) agrees across builds
      def probe(d: String) = Similarity.ivfpqIndexProbe(
        emb.where(col("vec_id") < 3), "vec_id", "embedding", emb, d,
        k = 4, nprobe = 2, refine = 1)
      assert(probe(dirClamped).exceptAll(probe(dirExact)).isEmpty &&
        probe(dirExact).exceptAll(probe(dirClamped)).isEmpty,
        "ADC ranking must decode the clamped build's codes correctly")
    } finally { rm(dirClamped); rm(dirExact); emb.unpersist() }
  }

  test("codes are packed into one long and the lists carry no raw vectors") {
    val emb = Tables.load(spark, TestSpark.sfDir, "embeddings")
    val dir = tmpdir()
    try {
      Similarity.ivfpqIndexBuild(emb, "vec_id", "embedding", dir,
        nCentroids = 8, m = 8, kCodes = 64) // 8×6 = 48 bits: packable
      val lists = spark.read.parquet(
        Similarity.ivfIndexDataDir(spark, dir))
      assert(lists.schema("codes").dataType ==
        org.apache.spark.sql.types.LongType, "codes must pack into a long")
      assert(!lists.columns.contains("nv"),
        "compressed lists must not store raw vectors")
      assert(lists.count() == emb.count())
    } finally rm(dir)
  }

  test("probe scan is partition-pruned to the probed buckets") {
    val emb = Tables.load(spark, TestSpark.sfDir, "embeddings")
    val dir = tmpdir()
    try {
      Similarity.ivfpqIndexBuild(emb, "vec_id", "embedding", dir,
        nCentroids = 8, m = 8, kCodes = 16)
      val probe = Similarity.ivfpqIndexProbe(
        emb.where(col("vec_id") < 3), "vec_id", "embedding", emb, dir,
        k = 5, nprobe = 2, refine = 4)
      val plan = probe.queryExecution.executedPlan.toString()
      assert(plan.contains("PartitionFilters: [bucket"),
        s"code-list scan must carry a static bucket partition filter:\n" +
          plan.linesIterator.filter(_.contains("PartitionFilters"))
            .mkString("\n"))
    } finally rm(dir)
  }

  test("rebuild stages a new version, flips the pointer, retains the " +
    "predecessor, vacuums older") {
    val emb = Tables.load(spark, TestSpark.sfDir, "embeddings")
    val dir = tmpdir()
    try {
      def names = new java.io.File(dir).list().toSet
      Similarity.ivfpqIndexBuild(emb, "vec_id", "embedding", dir,
        nCentroids = 8, m = 8, kCodes = 16)
      assert(names.contains("index.v0") && names.contains("models.v0"))
      Similarity.ivfpqIndexBuild(emb, "vec_id", "embedding", dir,
        nCentroids = 4, m = 8, kCodes = 16)
      // v1 current, v0 retained one cycle
      assert(names.intersect(
        Set("index.v0", "models.v0", "index.v1", "models.v1")).size == 4)
      Similarity.ivfpqIndexBuild(emb, "vec_id", "embedding", dir,
        nCentroids = 8, m = 8, kCodes = 16)
      // v2 current, v1 retained, v0 vacuumed
      assert(!names.contains("index.v0") && !names.contains("models.v0"))
      assert(names.intersect(
        Set("index.v1", "models.v1", "index.v2", "models.v2")).size == 4)
      // the probe resolves the current version through the pointer
      val probe = Similarity.ivfpqIndexProbe(
        emb.where(col("vec_id") < 3), "vec_id", "embedding", emb, dir,
        k = 3, nprobe = 8, refine = emb.count().toInt)
      val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        _ < 3, k = 3)
      assert(probe.exceptAll(exact).isEmpty && exact.exceptAll(probe).isEmpty)
    } finally rm(dir)
  }

  test("a reader racing rebuild publishes always resolves a CONSISTENT " +
    "version pair (same-version lists+models, both directories present)") {
    // ivfIndexDirs resolves both halves from ONE pointer read — two
    // separate resolutions could pair one version's lists with another
    // version's model across a concurrent flip (a rebuild CHANGES the
    // model, so the mixed pair would rank buckets with the wrong
    // centroids: silently wrong, not a crash). This races a resolve+stat
    // loop against repeated rebuilds and pins the snapshot property.
    val emb = Tables.load(spark, TestSpark.sfDir, "embeddings")
      .where(col("vec_id") < 120).cache()
    val dir = tmpdir()
    try {
      Similarity.ivfpqIndexBuild(emb, "vec_id", "embedding", dir,
        nCentroids = 4, m = 8, kCodes = 16)
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val bad = new java.util.concurrent.atomic.AtomicReference[String](null)
      val reader = new Thread(() => {
        while (!stop.get() && bad.get() == null) {
          val (lists, models) = Similarity.ivfIndexDirs(spark, dir)
          val lv = lists.substring(lists.lastIndexOf(".v") + 2)
          val mv = models.substring(models.lastIndexOf(".v") + 2)
          if (lv != mv)
            bad.set(s"mixed version pair: $lists vs $models")
          else if (!new java.io.File(new java.net.URI("file:" + lists))
              .exists() ||
            !new java.io.File(new java.net.URI("file:" + models)).exists())
            bad.set(s"resolved pair not on disk: $lists / $models")
        }
      })
      reader.start()
      try {
        for (i <- 1 to 5) // alternate widths so every flip changes the model
          Similarity.ivfpqIndexBuild(emb, "vec_id", "embedding", dir,
            nCentroids = if (i % 2 == 0) 4 else 8, m = 8, kCodes = 16)
      } finally { stop.set(true); reader.join(10000) }
      assert(bad.get() == null, String.valueOf(bad.get()))
      // and the settled index still probes exactly
      val probe = Similarity.ivfpqIndexProbe(
        emb.where(col("vec_id") < 3), "vec_id", "embedding", emb, dir,
        k = 3, nprobe = 8, refine = emb.count().toInt)
      val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        _ < 3, k = 3)
      assert(probe.exceptAll(exact).isEmpty && exact.exceptAll(probe).isEmpty)
    } finally { rm(dir); emb.unpersist() }
  }
}
