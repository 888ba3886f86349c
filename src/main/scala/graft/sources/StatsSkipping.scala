package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.CoreOps

/** Engine-level data skipping from the stored statistics — the scaled-up
  * form of what the reference's min/max stats exist for (README.md:42-46:
  * CitusDB uses them "to prune away unrelated shards" and "dramatically
  * reduce query execution times").
  *
  * A "shard" here is one file of a table directory (SURVEY §1.1). The
  * stats table is built as ONE distributed aggregation over the hidden
  * `_metadata.file_path` column — the Spark replacement for the
  * reference's per-shard stats round trips — then a range query:
  *
  *   1. prunes the file list with CoreOps.pruneByStats (interval overlap,
  *      nulls kept conservatively) — driver-side metadata work, no data IO
  *   2. reads ONLY the surviving files
  *
  * This composes with (does not replace) parquet footer pushdown: skipping
  * avoids even opening pruned files — at 100 TB, the difference between
  * touching every footer and touching the 2% of files that overlap.
  * The same stats rows can be fed to SyncEngine.sync(stats = …) so the
  * catalog serves them without rescanning.
  */
object StatsSkipping {

  /** Per-file min/max of `column`, one row per file:
    * (file: String, min_value: String, max_value: String).
    * `fmt` must be an order-preserving string encoding (same contract as
    * CoreOps.minMaxPerGroup / the reference's MinMaxValue strings).
    */
  def fileStats(spark: SparkSession, dir: String, column: String,
                fmt: Column => Column = _.cast("string")): DataFrame =
    CoreOps.minMaxPerGroup(
      spark.read.parquet(dir).select(col(column), col("_metadata.file_path").as("file")),
      "file", col(column), fmt)

  /** Files of `dir` whose [min,max] interval overlaps [lo, hi]. */
  def survivingFiles(stats: DataFrame, lo: String, hi: String): Seq[String] =
    CoreOps.pruneByStats(stats, lit(lo), lit(hi))
      .select("file").collect().map(_.getString(0)).toSeq

  /** Read only the overlapping files. Returns an empty DataFrame with the
    * directory's schema when everything is pruned.
    */
  def readRange(spark: SparkSession, dir: String, stats: DataFrame,
                lo: String, hi: String): DataFrame = {
    val files = survivingFiles(stats, lo, hi)
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        spark.read.parquet(dir).schema)
    else spark.read.parquet(files: _*)
  }
}
