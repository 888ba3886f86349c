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

  /** Fraction of a table's files a [lo, hi] range scan must read under the
    * current layout (1.0 = no skipping). Metadata-only — never reads data.
    */
  def scanFraction(stats: DataFrame, lo: String, hi: String): Double = {
    val total = stats.count()
    if (total == 0) 0.0
    else StatsSkipping.survivingFiles(stats, lo, hi).size.toDouble / total
  }
}
