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

  test("Boolean-AND probe (X120f) equals the disjunctive scoring " +
    "restricted to all-terms docs, and an unmatched term empties it") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val dir = tmpdir()
    try {
      TextIndex.buildTextIndex(docs, "doc_id", "text", dir, nBuckets = 8)
      val and = TextIndex.textIndexTopKAll(spark, terms, dir, k = 1000000)
      val ref = TextOps.bm25(docs, "doc_id", "text", terms, k = 1000000)
        .where(col("n_terms") === terms.size)
      assert(and.exceptAll(ref).isEmpty && ref.exceptAll(and).isEmpty,
        "conjunctive probe must equal the all-terms-filtered scoring")
      assert(and.count() > 0, "vacuous conjunction")
      // and it is a strict subset: some doc matches >=1 term but not all
      val any = TextIndex.textIndexTopK(spark, terms, dir, k = 1000000)
      assert(any.count() > and.count(),
        "fixture should contain partially-matching docs")
      // conjunctive strictness: one impossible term empties the result
      assert(TextIndex.textIndexTopKAll(spark,
        terms :+ "zzqx_no_such_token", dir, k = 10).count() == 0)
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

  test("append (X120b): delta docs become retrievable, base postings are " +
    "never rewritten (file inventory), committed-token replay is a no-op, " +
    "crash retry converges") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val dir = tmpdir()
    try {
      val base = docs.where(col("doc_id") % 2 === 0)
      TextIndex.buildTextIndex(base, "doc_id", "text", dir, nBuckets = 8)
      val before = TextIndex.textIndexTopK(spark, terms, dir, k = 100000)
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
        .toMap
      def inventory(): Map[String, Set[(String, Long)]] = {
        val idx = new java.io.File(
          graft.ext.Similarity.ivfIndexDataDir(spark, dir))
        idx.listFiles().filter(_.isDirectory).map { d =>
          d.getName -> d.listFiles()
            // hidden sidecars (.crc etc.) are not data files — same
            // visibility rule every parquet reader applies
            .filterNot(f => f.getName.startsWith(".") ||
              f.getName.startsWith("_"))
            .map(f => (f.getName, f.length())).toSet
        }.toMap
      }
      val inv0 = inventory()
      // a single-TOKEN delta touches exactly one bucket — the inventory
      // pin needs untouched buckets to exist (a fixture doc's ~200
      // distinct tokens would cover all 8); the term makes the appended
      // doc retrievable by the probe below
      import spark.implicits._
      val delta = Seq((9999999L, "spark spark spark"))
        .toDF("doc_id", "text")
      TextIndex.textIndexAppend(delta, "doc_id", "text", dir, token = "t1")
      val inv1 = inventory()
      val changed = inv1.filter { case (b, fs) => inv0.get(b) != Some(fs) }
      assert(changed.nonEmpty, "delta must land somewhere")
      assert(inv0.keySet.subsetOf(inv1.keySet))
      assert((inv0.keySet -- changed.keySet).nonEmpty,
        s"a one-doc delta must leave buckets untouched: ${inv1.keySet}")
      changed.foreach { case (b, fs) =>
        val gained = fs -- inv0.getOrElse(b, Set.empty)
        assert(gained.nonEmpty && (inv0.getOrElse(b, Set.empty) -- fs).isEmpty,
          s"bucket $b must only GAIN files: $fs vs ${inv0.get(b)}")
        assert(gained.forall(_._1.startsWith("A.t1-")),
          s"appended files carry the token prefix: $gained")
      }
      // base docs' scores are unchanged: their posting rows were never
      // touched and their df is the frozen base df the append reuses
      val after = TextIndex.textIndexTopK(spark, terms, dir, k = 100000)
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
        .toMap
      before.foreach { case (id, s) =>
        assert(after(id) == s, s"base doc $id score drifted across append")
      }
      val deltaId = 9999999L
      assert(after.contains(deltaId),
        s"appended doc $deltaId must be retrievable")
      // replay of the committed token: byte-identical inventory
      TextIndex.textIndexAppend(delta, "doc_id", "text", dir, token = "t1")
      assert(inventory() == inv1, "committed-token replay must be a no-op")
      // crash-retry: marker lost after publish (crash between renames
      // and marker write) — the retry retracts this token's files and
      // republishes; final state equals one clean append
      val marker = new java.io.File(s"$dir/tokens/append/t1")
      assert(marker.exists); marker.delete()
      TextIndex.textIndexAppend(delta, "doc_id", "text", dir, token = "t1")
      val inv2 = inventory()
      assert(inv2.keySet == inv1.keySet &&
        inv2.forall { case (b, fs) =>
          fs.map(_._1).count(_.startsWith("A.t1-")) ==
            inv1(b).map(_._1).count(_.startsWith("A.t1-")) },
        "crash retry must converge to one clean append's file census")
      val afterRetry = TextIndex
        .textIndexTopK(spark, terms, dir, k = 100000)
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
        .toMap
      assert(afterRetry == after, "retry must not duplicate postings")
    } finally rm(dir)
  }

  test("delete (X120c): taken-down docs vanish, survivors keep their " +
    "build-time scores, committed-token replay is a no-op") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val dir = tmpdir()
    try {
      TextIndex.buildTextIndex(docs, "doc_id", "text", dir, nBuckets = 8)
      val full = TextIndex.textIndexTopK(spark, terms, dir, k = 100000)
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
        .toMap
      val delIds = docs.where(col("doc_id") % 7 === 3).select("doc_id")
      val delSet = delIds.collect().map(_.getLong(0)).toSet
      TextIndex.textIndexDelete(delIds, "doc_id", dir, token = "d1")
      val after = TextIndex.textIndexTopK(spark, terms, dir, k = 100000)
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
        .toMap
      assert(after.keySet.intersect(delSet).isEmpty,
        "deleted docs must not be retrievable")
      assert(after == full.filterNot { case (id, _) => delSet(id) },
        "survivors must keep their frozen-df scores exactly")
      // no posting row of a deleted doc survives anywhere in the lists
      val lists = spark.read.parquet(
        graft.ext.Similarity.ivfIndexDataDir(spark, dir))
      assert(lists.where(col("doc_id") % 7 === 3).isEmpty)
      // replay of the committed token is a no-op
      val inv = lists.inputFiles.toSet
      TextIndex.textIndexDelete(delIds, "doc_id", dir, token = "d1")
      assert(spark.read.parquet(graft.ext.Similarity
        .ivfIndexDataDir(spark, dir)).inputFiles.toSet == inv)
    } finally rm(dir)
  }

  test("compact (X120d): file count shrinks after appends, probe is " +
    "bit-identical, and an unmarked in-flight append blocks it") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val dir = tmpdir()
    try {
      TextIndex.buildTextIndex(docs.where(col("doc_id") % 2 === 0),
        "doc_id", "text", dir, nBuckets = 8)
      Seq(1L, 3L).foreach { r =>
        TextIndex.textIndexAppend(docs.where(col("doc_id") % 4 === r),
          "doc_id", "text", dir, token = s"t$r")
      }
      val before = TextIndex.textIndexTopK(spark, terms, dir, k = 100000)
        .collect().toSeq
      // an unmarked staging dir = an append in flight or crashed
      // mid-publish — folding its token-prefixed files into plain part
      // files would break the replay's retract pass, so compact refuses
      val stray = new java.io.File(s"$dir/stage/zz")
      stray.mkdirs()
      intercept[IllegalStateException] {
        TextIndex.textIndexCompact(spark, dir)
      }
      stray.delete()
      val (f0, f1) = TextIndex.textIndexCompact(spark, dir)
      assert(f1 < f0, s"compact must reduce files ($f0 -> $f1)")
      val after = TextIndex.textIndexTopK(spark, terms, dir, k = 100000)
        .collect().toSeq
      assert(after == before, "probe must be bit-identical across compact")
    } finally rm(dir)
  }

  test("rebuild at a DIFFERENT nBuckets probes correctly — the bucket " +
    "count travels in the stats artifact, never re-supplied") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val dir = tmpdir()
    try {
      TextIndex.buildTextIndex(docs, "doc_id", "text", dir, nBuckets = 16)
      TextIndex.buildTextIndex(docs, "doc_id", "text", dir, nBuckets = 32)
      val viaIndex = TextIndex.textIndexTopK(spark, terms, dir, k = 20)
      val inQuery = TextOps.bm25(docs, "doc_id", "text", terms, k = 20)
      assert(viaIndex.exceptAll(inQuery).isEmpty &&
        inQuery.exceptAll(viaIndex).isEmpty,
        "post-rebuild probe must equal the in-query operator at the new " +
          "bucket count")
    } finally rm(dir)
  }

  test("write parallelism is not capped at nBuckets: the sizing rule " +
    "splits buckets into multiple files while pruning still holds") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val dir = tmpdir()
    // AQE would coalesce the tiny test shuffle back to 1 partition and
    // hide the split; at scale the 64MB advisory target keeps it real
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      TextIndex.buildTextIndex(docs, "doc_id", "text", dir, nBuckets = 4,
        targetPostingsPerFile = 100L)
      val idx = new java.io.File(
        graft.ext.Similarity.ivfIndexDataDir(spark, dir))
      val perBucket = idx.listFiles().filter(_.isDirectory).map(
        _.listFiles().count(_.getName.startsWith("part-")))
      assert(perBucket.sum > 4,
        s"write tasks must exceed nBuckets: ${perBucket.toSeq}")
      assert(perBucket.max > 1,
        s"at least one bucket must hold several files: ${perBucket.toSeq}")
      val viaIndex = TextIndex.textIndexTopK(spark, terms, dir, k = 20)
      val inQuery = TextOps.bm25(docs, "doc_id", "text", terms, k = 20)
      assert(viaIndex.exceptAll(inQuery).isEmpty &&
        inQuery.exceptAll(viaIndex).isEmpty)
    } finally {
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
      rm(dir)
    }
  }

  test("blank documents count toward corpus stats but index no postings") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta"), (2L, ""), (3L, "alpha gamma"))
      .toDF("doc_id", "text")
    val dir = tmpdir()
    try {
      TextIndex.buildTextIndex(docs, "doc_id", "text", dir, nBuckets = 2)
      val lists = spark.read.parquet(
        graft.ext.Similarity.ivfIndexDataDir(spark, dir))
      assert(lists.where(col("tok") === "").isEmpty,
        "empty-string tokens must not become postings")
      val stats = spark.read.parquet(
        graft.ext.Similarity.ivfCentroidsDir(spark, dir) + "/stats")
        .collect()(0)
      assert(stats.getLong(0) == 3L, "blank doc still counts toward nd")
      val hit = TextIndex.textIndexTopK(spark, Seq("alpha"), dir, k = 10)
        .collect().map(_.getLong(0)).toSet
      assert(hit == Set(1L, 3L))
    } finally rm(dir)
  }

  test("phrase search (X120e): exact adjacency counts, repeated-term " +
    "phrases, appends stay phrase-visible, non-positional fails loud") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b a"), (2L, "b a"), (3L, "a a b"))
      .toDF("doc_id", "text")
    val dir = tmpdir()
    try {
      TextIndex.buildTextIndex(docs, "doc_id", "text", dir, nBuckets = 4,
        positional = true)
      // "a b": doc1 starts {1,3} = 2, doc2 none (b precedes a), doc3 at 2
      val ab = TextIndex.textIndexPhraseTopK(spark, Seq("a", "b"), dir, 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(ab == Seq((1L, 2L), (3L, 1L)), s"got $ab")
      // repeated-term phrase "a b a": doc1 starts {1,3}, doc3 none
      val aba = TextIndex
        .textIndexPhraseTopK(spark, Seq("a", "b", "a"), dir, 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(aba == Seq((1L, 2L)), s"got $aba")
      // single-term phrase degenerates to tf
      val a1 = TextIndex.textIndexPhraseTopK(spark, Seq("a"), dir, 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(a1 == Seq((1L, 3L), (3L, 2L), (2L, 1L)), s"got $a1")
      // an appended doc must be phrase-visible: the append follows the
      // base index's positional schema
      TextIndex.textIndexAppend(Seq((9L, "x a b y"))
        .toDF("doc_id", "text"), "doc_id", "text", dir, token = "p1")
      val ab2 = TextIndex.textIndexPhraseTopK(spark, Seq("a", "b"), dir, 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(ab2 == Seq((1L, 2L), (3L, 1L), (9L, 1L)), s"got $ab2")
      // BM25 probe on a positional index ignores the positions column
      val bm = TextIndex.textIndexTopK(spark, Seq("a"), dir, k = 10)
      assert(bm.count() == 4)
    } finally rm(dir)
    // a non-positional index must refuse the phrase probe, not return
    // silently empty results
    val dir2 = tmpdir()
    try {
      TextIndex.buildTextIndex(docs, "doc_id", "text", dir2, nBuckets = 4)
      intercept[IllegalArgumentException] {
        TextIndex.textIndexPhraseTopK(spark, Seq("a", "b"), dir2, 10)
      }
    } finally rm(dir2)
  }

  test("phrase probe prunes to the phrase terms' buckets") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val dir = tmpdir()
    try {
      TextIndex.buildTextIndex(docs, "doc_id", "text", dir, nBuckets = 8,
        positional = true)
      val df = TextIndex.textIndexPhraseTopK(spark, Seq("table", "hash"),
        dir, 20)
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert("PartitionFilters: \\[[^\\]]*bucket#".r.findFirstIn(plan)
          .isDefined,
        s"bucket pruning must reach the phrase scan:\n$plan")
      assert(df.count() > 0, "fixture phrase must occur (vacuous pin)")
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
