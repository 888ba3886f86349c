package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.StatsSkipping

class StatsSkippingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("file-level stats skip non-overlapping files; result equals full scan") {
    // Range-partition lineitem by ship date into 8 files with near-disjoint
    // date ranges — the layout a date-partitioned 100 TB table has.
    val dir = java.nio.file.Files.createTempDirectory("graft_skip_").toString + "/li"
    val li = Tables.load(spark, TestSpark.sfDir, "lineitem")
    li.repartitionByRange(8, col("l_shipdate")).write.parquet(dir)

    val fmt = (c: org.apache.spark.sql.Column) =>
      date_format(c, "yyyy-MM-dd HH:mm:ss")
    val stats = StatsSkipping.fileStats(spark, dir, "l_shipdate", fmt).cache()
    assert(stats.count() == 8, "one stats row per file")

    val lo = "1995-06-01 00:00:00"
    val hi = "1995-08-01 00:00:00"
    val surviving = StatsSkipping.survivingFiles(stats, lo, hi)
    assert(surviving.nonEmpty && surviving.size < 8,
      s"a 2-month range must prune most of 8 range-partitioned files, " +
        s"kept ${surviving.size}")

    val pruned = StatsSkipping.readRange(spark, dir, stats, lo, hi)
      .where(col("l_shipdate") >= lit(lo) && col("l_shipdate") <= lit(hi))
    val full = spark.read.parquet(dir)
      .where(col("l_shipdate") >= lit(lo) && col("l_shipdate") <= lit(hi))
    assert(pruned.count() == full.count())
    assert(pruned.agg(sum(col("l_quantity"))).collect().head.get(0)
      == full.agg(sum(col("l_quantity"))).collect().head.get(0))

    // fully disjoint range → zero files, empty result, correct schema
    val none = StatsSkipping.readRange(spark, dir, stats,
      "2090-01-01 00:00:00", "2091-01-01 00:00:00")
    assert(none.isEmpty && none.schema == full.schema)
  }
}
