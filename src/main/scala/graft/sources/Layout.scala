package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout rewriting for skipping — the write-side half of the
  * reference's min/max pruning story (README.md:42-46). Stats-based
  * pruning (StatsSkipping / CoreOps.pruneByStats) only pays off when the
  * physical layout puts similar key values in the same files; a table
  * written from a hash-shuffled upstream has every file spanning the whole
  * key range, so no range predicate ever prunes anything.
  *
  * `clusterBy` is the remedy: a range repartition on the clustering key
  * (one shuffle, sampled range boundaries → balanced output files even
  * under skew) plus an in-partition sort, so
  *   - each output file covers a narrow, mostly disjoint key interval —
  *     file-level stats pruning drops all non-overlapping files;
  *   - parquet row groups inside each file are sorted, so footer min/max
  *     prunes at page granularity for free;
  *   - downstream range scans touch O(selectivity) files instead of all.
  *
  * At 100 TB this is the difference between a range query opening every
  * footer of a million files and opening the few hundred that overlap.
  * The shuffle is one-time write amplification, amortized over every
  * subsequent query — the standard warehouse "cluster/zorder" tradeoff
  * (single-column linear clustering here; interleaved-order layouts slot
  * into the same writer).
  */
object Layout {

  /** Rewrite `df` into `outDir` clustered on `cols`: `numFiles` range
    * partitions (sampled boundaries), sorted within each. Returns the
    * per-file stats of the clustering column, ready to feed
    * StatsSkipping.readRange / SyncEngine.sync(stats = …).
    */
  def clusterBy(spark: SparkSession, df: DataFrame, outDir: String,
                numFiles: Int, columns: Seq[String],
                fmt: Column => Column = _.cast("string")): DataFrame = {
    val cols = columns.map(col)
    df.repartitionByRange(numFiles, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode("overwrite").parquet(outDir)
    StatsSkipping.fileStats(spark, outDir, columns.head, fmt)
  }

  /** Hive-style partitioned layout: one directory per value of
    * `partitionCols` (`lang=en/…`), the layout that turns equality or IN
    * predicates on the partition columns into PARTITION PRUNING — Catalyst
    * drops whole directories at planning time, before any file or footer
    * is touched (`PartitionFilters` in the scan node). The complement of
    * `clusterBy`: partitioning prunes on low-cardinality categorical
    * columns, clustering/z-order prunes on high-cardinality range
    * predicates; real tables use both (partition by day, cluster by key).
    * Returns the reader DataFrame rooted at `outDir`.
    */
  def writePartitioned(spark: SparkSession, df: DataFrame, outDir: String,
                       partitionCols: Seq[String]): DataFrame = {
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(outDir)
    spark.read.parquet(outDir)
  }

  /** Z-order (interleaved) clustering over TWO columns: linear clustering
    * serves only its leading column — a range predicate on the second
    * column still reads every file. The Z-curve interleaves the bits of
    * both columns' bucket numbers, so consecutive z-values stay close in
    * BOTH dimensions and each output file covers a small rectangle of the
    * (a, b) space — range predicates on EITHER column prune most files.
    *
    * Buckets are equi-depth (approxQuantile boundaries, one pass each),
    * not min/max-linear: under real-data skew a linear scale collapses
    * most rows into a few buckets and the curve degenerates. Bucket
    * assignment is a 2^bits-element boundary scan per row — write-path
    * one-time cost, amortized over every later read (the same tradeoff
    * Delta/Iceberg OPTIMIZE ZORDER makes).
    *
    * Returns per-file stats of BOTH columns for StatsSkipping.
    */
  def clusterByZ(spark: SparkSession, df: DataFrame, outDir: String,
                 numFiles: Int, colA: String, colB: String,
                 bits: Int = 12): (DataFrame, DataFrame) = {
    val z = zValue(bucketColumn(spark, df, colA, bits),
      bucketColumn(spark, df, colB, bits), bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)
    (StatsSkipping.fileStats(spark, outDir, colA, numericFmt),
      StatsSkipping.fileStats(spark, outDir, colB, numericFmt))
  }

  /** Compact a directory of many small files into ≈`targetBytes` outputs —
    * the small-files remedy (a million 1 MB files costs a listing, a
    * footer read, and a task per file on every query; at 100 TB that
    * overhead dwarfs the data). Output file count comes from the ACTUAL
    * on-disk byte size (listing metadata only — no data read to plan).
    *
    * With `sortCol` the rewrite range-partitions + sorts, re-establishing
    * a skipping-friendly clustered layout (a hash repartition would
    * destroy it); without, it `coalesce`s — merging input splits with NO
    * shuffle at all. Returns the number of output files written.
    */
  def compact(spark: SparkSession, dir: String, outDir: String,
              targetBytes: Long, sortCol: Option[String] = None): Int = {
    require(targetBytes > 0)
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(path, true)
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) total += f.getLen
    }
    val nFiles = math.max(1L, (total + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(dir)
    val out = sortCol match {
      case Some(c) => df.repartitionByRange(nFiles, col(c)).sortWithinPartitions(col(c))
      // coalesce never exceeds the scan's split count — when input files
      // are tiny, split packing may already produce fewer partitions than
      // the byte target asks for; fewer, larger files is still compaction.
      case None => df.coalesce(nFiles)
    }
    out.write.mode("overwrite").parquet(outDir)
    val outIt = fs.listFiles(new org.apache.hadoop.fs.Path(outDir), true)
    var written = 0
    while (outIt.hasNext) {
      if (outIt.next().getPath.getName.endsWith(".parquet")) written += 1
    }
    written
  }

  /** Order-preserving string encoding for non-negative numerics (zero-
    * padded fixed width — plain `cast(string)` is not lexically ordered:
    * "9.0" > "10.0"). Same contract as CoreOps.minMaxPerGroup's fmt. */
  val numericFmt: Column => Column =
    c => format_string("%018.4f", c.cast("double"))

  /** Hilbert-curve index of two bucket numbers — the locality-preserving
    * alternative to [[zValue]] (consecutive indices are always
    * grid-adjacent; the Z curve jumps at power-of-two seams). Backed by
    * the native codegen `graft_hilbert` expression; the session must have
    * the engine functions registered (`GraftExtensions.ensure`). */
  def hilbertValue(a: Column, b: Column, bits: Int): Column =
    call_function("graft_hilbert", a, b, lit(bits))

  /** Interleave the low `bits` bits of two bucket numbers (a gets the odd
    * positions). Pure integer shifts — stays in codegen. */
  def zValue(a: Column, b: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_.bitwiseOR(_))

  /** Equi-depth bucket number of `column` in [0, 2^bits): count of
    * approxQuantile boundaries ≤ value, via a literal boundary array. */
  private def bucketColumn(spark: SparkSession, df: DataFrame,
                           column: String, bits: Int): Column = {
    val n = 1 << bits
    val probs = (1 until n).map(_.toDouble / n).toArray
    val bounds = df.select(col(column).cast("double").as("v"))
      .stat.approxQuantile("v", probs, 1.0 / (4 * n))
    val arr = typedLit(bounds)
    size(filter(arr, bd => col(column).cast("double") >= bd)).cast("long")
  }

  /** Fraction of a table's files a [lo, hi] range scan must read under the
    * current layout (1.0 = no skipping). Metadata-only — never reads data.
    */
  def scanFraction(stats: DataFrame, lo: String, hi: String): Double = {
    val total = stats.count()
    if (total == 0) 0.0
    else StatsSkipping.survivingFiles(stats, lo, hi).size.toDouble / total
  }
}
