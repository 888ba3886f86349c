package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{TextIndex, TextOps}

/** X120 — persisted inverted text index: probe ≡ in-query BM25, the
  * partition-pruned bucket scan, and the versioned-pointer rebuild
  * (staged flip + predecessor retention + vacuum — the ANN index's
  * discipline on the lexical side). */
class TextIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmpdir() =
    java.nio.file.Files.createTempDirectory("graft_txtidx_spec_").toString

  private def rm(dir: String): Unit =
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))

  private val terms = Seq("spark", "join", "window")

  test("index probe equals in-query BM25 bit-for-bit") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val dir = tmpdir()
    try {
      TextIndex.buildTextIndex(docs, "doc_id", "text", dir, nBuckets = 8)
      val viaIndex = TextIndex.textIndexTopK(spark, terms, dir, k = 20)
      val inQuery = TextOps.bm25(docs, "doc_id", "text", terms, k = 20)
      assert(viaIndex.exceptAll(inQuery).isEmpty &&
        inQuery.exceptAll(viaIndex).isEmpty,
        "persisted-index probe must equal the in-query operator")
      assert(viaIndex.count() > 0, "vacuous pin")
    } finally rm(dir)
  }

  test("probe scan is partition-pruned to the query terms' buckets and " +
    "pushes the term filter") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val dir = tmpdir()
    try {
      TextIndex.buildTextIndex(docs, "doc_id", "text", dir, nBuckets = 8)
      val plan = TextIndex.textIndexTopK(spark, Seq("spark"), dir, k = 5)
        .queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert("PartitionFilters: \\[[^\\]]*bucket#".r.findFirstIn(plan)
          .isDefined,
        s"bucket pruning must reach the scan:\n$plan")
      assert("PushedFilters: \\[[^\\]]*\\(tok,".r.findFirstIn(plan)
          .isDefined,
        s"the term filter must be pushed to the parquet scan:\n$plan")
    } finally rm(dir)
  }

  test("rebuild stages a new version, flips the pointer, retains the " +
    "predecessor pair, vacuums older") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val dir = tmpdir()
    try {
      val half = docs.where(col("doc_id") % 2 === 0)
      TextIndex.buildTextIndex(half, "doc_id", "text", dir, nBuckets = 8)
      val firstProbe = TextIndex.textIndexTopK(spark, terms, dir, k = 20).collect().toSeq
      // rebuild over the full corpus — just another build call
      TextIndex.buildTextIndex(docs, "doc_id", "text", dir, nBuckets = 8)
      val viaIndex = TextIndex.textIndexTopK(spark, terms, dir, k = 20)
      val inQuery = TextOps.bm25(docs, "doc_id", "text", terms, k = 20)
      assert(viaIndex.exceptAll(inQuery).isEmpty &&
        inQuery.exceptAll(viaIndex).isEmpty,
        "post-rebuild probe must reflect the full corpus")
      assert(firstProbe != viaIndex.collect().toSeq,
        "fixture must actually change across the rebuild")
      val names = new java.io.File(dir).listFiles().map(_.getName).toSet
      assert(names.contains("index.v1") && names.contains("models.v1"),
        s"current pair published: $names")
      assert(names.contains("index.v0") && names.contains("models.v0"),
        s"predecessor pair retained one cycle: $names")
      // a third build vacuums v0
      TextIndex.buildTextIndex(docs, "doc_id", "text", dir, nBuckets = 8)
      val after = new java.io.File(dir).listFiles().map(_.getName).toSet
      assert(!after.contains("index.v0") && !after.contains("models.v0"),
        s"older versions vacuumed: $after")
      assert(after.contains("index.v2") && after.contains("index.v1"),
        s"current + predecessor kept: $after")
    } finally rm(dir)
  }

  test("posting rows are self-sufficient: scoring needs no corpus join") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val dir = tmpdir()
    try {
      TextIndex.buildTextIndex(docs, "doc_id", "text", dir, nBuckets = 8)
      val lists = spark.read.parquet(
        graft.ext.Similarity.ivfIndexDataDir(spark, dir))
      assert(lists.columns.toSet ==
        Set("tok", "doc_id", "tf", "dl", "df", "bucket"))
      // denormalized df is consistent: one value per token, equal to the
      // number of docs carrying it
      val bad = lists.groupBy("tok")
        .agg(countDistinct("df").as("nv"), count(lit(1)).as("n"),
          max("df").as("d"))
        .where(col("nv") =!= 1 || col("n") =!= col("d"))
      assert(bad.isEmpty, "df must be the token's true document frequency")
    } finally rm(dir)
  }
}
