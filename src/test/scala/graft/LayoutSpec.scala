package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Layout, StatsSkipping, TextFormats}

class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("JSONL round-trips documents; malformed lines quarantine, not crash") {
    import spark.implicits._
    val docs = Seq(
      (1L, "plain text", "en"),
      (2L, "embedded \"quotes\" and a\nnewline plus , comma", "de"),
      (3L, "unicode café ✓", "fr")).toDF("doc_id", "text", "lang")
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_").toString
    TextFormats.writeJsonl(docs, s"$dir/docs")
    val schema = org.apache.spark.sql.types.StructType(
      docs.schema.fields.toSeq)
    // keep a data column referenced: pruning to ONLY the corrupt column
    // is rejected by Spark on raw reads (see TextFormats.quarantined)
    val back = TextFormats.readJsonl(spark, s"$dir/docs", schema)
      .select("doc_id", "text", "lang", TextFormats.CorruptCol).collect()
    assert(back.forall(_.isNullAt(3)), "no corrupt rows expected")
    val got = back.map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val want = docs.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == want, "JSONL round trip must be lossless")
    // corrupt line lands in _corrupt with data columns null
    val f = new java.io.PrintWriter(s"$dir/bad.jsonl")
    f.println("""{"doc_id": 7, "text": "fine", "lang": "en"}""")
    f.println("""{not json at all""")
    f.close()
    val mixed = TextFormats.readJsonl(spark, s"$dir/bad.jsonl", schema)
      .select("doc_id", TextFormats.CorruptCol).collect()
    assert(mixed.length == 2)
    assert(mixed.count(!_.isNullAt(1)) == 1, "one quarantined line")
    assert(mixed.count(r => !r.isNullAt(0) && r.getLong(0) == 7L) == 1)
  }

  test("CSV round-trips with quoting; stays newline-splittable") {
    import spark.implicits._
    val rows = Seq((1L, "a,b and \"q\"", 2.5), (2L, "plain", -1.0))
      .toDF("id", "s", "v")
    val dir = java.nio.file.Files.createTempDirectory("graft_csv_").toString
    TextFormats.writeCsv(rows, s"$dir/t")
    val schema = org.apache.spark.sql.types.StructType(rows.schema.fields.toSeq)
    val back = TextFormats.readCsv(spark, s"$dir/t", schema)
      .select("id", "s", "v", TextFormats.CorruptCol).collect()
    assert(back.forall(_.isNullAt(3)), "no corrupt rows expected")
    val got = back.map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set((1L, "a,b and \"q\"", 2.5), (2L, "plain", -1.0)))
  }

  test("ORC round-trips, pushes predicates to the scan, evolves schema") {
    import spark.implicits._
    import graft.sources.ColumnarFormats
    val rows = Seq((1L, "alpha", 2.5), (2L, "beta", -1.0), (3L, "gamma", 0.0))
      .toDF("id", "s", "v")
    val dir = java.nio.file.Files.createTempDirectory("graft_orc_").toString
    ColumnarFormats.writeOrc(rows, s"$dir/t", bloomCols = Seq("id"))
    val schema = org.apache.spark.sql.types.StructType(rows.schema.fields.toSeq)
    val back = ColumnarFormats.readOrc(spark, s"$dir/t", schema)
    assert(back.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2))).toSet ==
      Set((1L, "alpha", 2.5), (2L, "beta", -1.0), (3L, "gamma", 0.0)))
    // point-lookup filter reaches the ORC scan (stripe skipping at scale)
    val q = back.where(col("id") === 2L).select("id", "s")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), EqualTo(id,2)]"),
      s"filter must push to the ORC scan:\n$plan")
    assert(q.collect().map(_.getString(1)).toSeq == Seq("beta"))
    // schema evolution: a column the files don't have reads as null,
    // a dropped column is ignored (reads are by name)
    val evolved = org.apache.spark.sql.types.StructType(
      schema.fields.filter(_.name != "v") :+
        org.apache.spark.sql.types.StructField("added",
          org.apache.spark.sql.types.LongType, nullable = true))
    val ev = ColumnarFormats.readOrc(spark, s"$dir/t", evolved)
      .orderBy("id").collect()
    assert(ev.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(ev.forall(_.isNullAt(2)), "missing column resolves as null")
  }

  private val fmt = (c: org.apache.spark.sql.Column) =>
    date_format(c, "yyyy-MM-dd HH:mm:ss")
  private val lo = "1995-06-01 00:00:00"
  private val hi = "1995-08-01 00:00:00"

  test("clusterBy turns a hash-shuffled layout into a skipping-friendly one") {
    val base = java.nio.file.Files.createTempDirectory("graft_layout_").toString
    val li = Tables.load(spark, TestSpark.sfDir, "lineitem")

    // Worst case: hash-shuffled write — every file spans the full date
    // range, so a 2-month range predicate prunes nothing.
    li.repartition(8).write.parquet(s"$base/hashed")
    val hashedStats = StatsSkipping.fileStats(spark, s"$base/hashed", "l_shipdate", fmt)
    assert(Layout.scanFraction(hashedStats, lo, hi) == 1.0,
      "hash layout must read every file for a range predicate")

    // clusterBy: range repartition + in-partition sort on the same key.
    val stats = Layout.clusterBy(spark, li, s"$base/clustered", 8,
      Seq("l_shipdate"), fmt).cache()
    assert(stats.count() == 8, "one stats row per output file")
    val frac = Layout.scanFraction(stats, lo, hi)
    assert(frac < 0.5, s"clustered layout must prune most files, read $frac")

    // Same answers as a full scan, reading only surviving files.
    val pruned = StatsSkipping.readRange(spark, s"$base/clustered", stats, lo, hi)
      .where(col("l_shipdate") >= lit(lo) && col("l_shipdate") <= lit(hi))
    val full = li
      .where(col("l_shipdate") >= lit(lo) && col("l_shipdate") <= lit(hi))
    assert(pruned.count() == full.count())
    assert(pruned.agg(sum(col("l_quantity"))).collect().head.get(0)
      == full.agg(sum(col("l_quantity"))).collect().head.get(0))
  }

  test("clusterByZ prunes on BOTH columns where linear clustering serves one") {
    val base = java.nio.file.Files.createTempDirectory("graft_zorder_").toString
    val li = Tables.load(spark, TestSpark.sfDir, "lineitem")
    val fmtNum = Layout.numericFmt
    def f(v: Double): String = "%018.4f".format(v)

    // Linear clustering on l_orderkey: perfect for orderkey ranges,
    // useless for partkey ranges.
    Layout.clusterBy(spark, li, s"$base/linear", 16, Seq("l_orderkey"))
    val linPart = StatsSkipping.fileStats(spark, s"$base/linear", "l_partkey", fmtNum)
    assert(Layout.scanFraction(linPart, f(100), f(500)) > 0.9,
      "linear layout must NOT help the non-leading column")

    // Z-order on (l_orderkey, l_partkey): both dimensions prune.
    val (zaStats, zbStats) = Layout.clusterByZ(spark, li, s"$base/z", 16,
      "l_orderkey", "l_partkey", bits = 8)
    val keys = li.agg(max("l_orderkey"), max("l_partkey")).collect().head
    val (maxOk, maxPk) = (keys.getLong(0).toDouble, keys.getLong(1).toDouble)
    val fracA = Layout.scanFraction(zaStats, f(0), f(maxOk / 20))
    val fracB = Layout.scanFraction(zbStats, f(0), f(maxPk / 20))
    assert(fracA < 0.7, s"z-layout must prune on column A, read $fracA")
    assert(fracB < 0.7, s"z-layout must prune on column B, read $fracB")

    // No rows lost by the rewrite.
    assert(spark.read.parquet(s"$base/z").count() == li.count())
  }

  test("compact merges many small files to the byte-sized target count") {
    val base = java.nio.file.Files.createTempDirectory("graft_compact_").toString
    val li = Tables.load(spark, TestSpark.sfDir, "lineitem").limit(20000)
    li.repartition(100).write.parquet(s"$base/small")

    def files(d: String) = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    val totalBytes = files(s"$base/small").map(_.length).sum
    assert(files(s"$base/small").length == 100)

    val n = Layout.compact(spark, s"$base/small", s"$base/compacted",
      targetBytes = totalBytes / 5)
    assert(n >= 1 && n <= 6, s"expected at most ~5-6 outputs, wrote $n")
    assert(files(s"$base/compacted").length == n)
    val a = spark.read.parquet(s"$base/small")
    val b = spark.read.parquet(s"$base/compacted")
    assert(a.count() == b.count())
    assert(a.agg(sum(col("l_quantity"))).collect().head.get(0)
      == b.agg(sum(col("l_quantity"))).collect().head.get(0))

    // clustered compaction: stats become selective again
    Layout.compact(spark, s"$base/small", s"$base/clustered",
      targetBytes = totalBytes / 5, sortCol = Some("l_shipdate"))
    val stats = StatsSkipping.fileStats(spark, s"$base/clustered", "l_shipdate", fmt)
    assert(Layout.scanFraction(stats, lo, hi) < 1.0)
  }
}
