package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Dedup, Similarity}

/** Round-13 retrieval/classification operators: segment-level dedup with
  * reassembly (X1i), kNN classification (X114), mutual kNN pairs (X115),
  * and filtered vector search (X2g — exact leg + the allowlist-filtered
  * persisted-index probe). */
class RetrievalOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ── X1i segment dedup ──────────────────────────────────────────────

  test("segmentDedup keeps each segment's global first occurrence and " +
    "reassembles in order") {
    // segTokens=2: doc 1 = [a b][c d], doc 2 = [c d][e f] (c d repeats),
    // doc 3 = [a b][c d] (everything repeats)
    val docs = Seq(
      (1L, "a b c d"), (2L, "c d e f"), (3L, "a b c d")
    ).toDF("doc_id", "text")
    val out = Dedup.segmentDedup(docs, "doc_id", "text", segTokens = 2)
      .orderBy("doc_id")
      .collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(2L, 2L, 2L)) // n_segments
    assert(out.map(_.getLong(2)).toSeq == Seq(2L, 1L, 0L)) // kept
    // doc 2 survives as just "e f" (its "c d" is doc 1's segment)
    val d2hash = out(1).getString(3)
    val ef = spark.sql("SELECT md5('e f')").collect()(0).getString(0)
    assert(d2hash == ef)
    assert(out(1).getLong(4) == 3L) // out_chars("e f")
    // doc 3 is entirely duplicate: NULL hash (string_agg-over-no-rows
    // semantics), zero chars
    assert(out(2).isNullAt(3))
    assert(out(2).getLong(4) == 0L)
  }

  test("segmentDedup first-occurrence tiebreak is (doc_id, seg_idx), " +
    "not partition order") {
    // the same segment twice WITHIN one doc: the earlier seg_idx wins
    val docs = Seq((7L, "x y x y"), (5L, "x y z z")).toDF("doc_id", "text")
    val out = Dedup.segmentDedup(docs.repartition(4), "doc_id", "text",
      segTokens = 2).orderBy("doc_id").collect()
    // doc 5 keeps both segments ("x y" first occurrence is doc 5)
    assert(out(0).getLong(2) == 2L)
    // doc 7 keeps nothing: "x y" belongs to doc 5 at both positions
    assert(out(1).getLong(2) == 0L)
  }

  test("segmentDedup ragged tail forms its own segment") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val out = Dedup.segmentDedup(docs, "doc_id", "text", segTokens = 2)
      .collect()(0)
    assert(out.getLong(1) == 2L) // [a b] + ragged [c]
    assert(out.getLong(2) == 2L)
    assert(out.getLong(4) == "a b c".length.toLong)
  }

  test("segmentDedup / dupWindows treat NULL text as empty — totals and " +
    "explode derive from the same token array, kept never exceeds total") {
    // unguarded, size(null) = -1 makes n_segments 0 while the explode
    // still emits rows, so kept_segments could exceed n_segments
    val docs = Seq((1L, "a b c d"), (2L, null.asInstanceOf[String]),
      (3L, "a b c d")).toDF("doc_id", "text")
    val seg = Dedup.segmentDedup(docs, "doc_id", "text", segTokens = 2)
      .orderBy("doc_id").collect()
    assert(seg.length == 3)
    assert(seg.forall(r => r.getLong(2) >= 0 && r.getLong(2) <= r.getLong(1)),
      s"kept_segments must stay within n_segments: ${seg.toSeq}")
    assert(seg(1).getLong(1) == 1L, "NULL text ≡ \"\" = one empty segment")
    val dw = Dedup.dupWindows(docs, "doc_id", "text", w = 2)
      .orderBy("doc_id").collect()
    assert(dw.forall(r => r.getLong(2) >= 0 && r.getLong(2) <= r.getLong(1)),
      s"dup_windows must stay within n_windows: ${dw.toSeq}")
    assert(dw(1).getLong(1) == 1L, "NULL text ≡ \"\" = one whole-doc window")
  }

  // ── X121 duplicate-window fraction ─────────────────────────────────

  test("dupWindows: stride-1 windows, global first occurrence, short " +
    "doc is one whole-doc window") {
    // w=2: doc 1 "a b c d" → [a b][b c][c d] all new (frac 0)
    //      doc 2 "a b c"   → [a b][b c] both seen   (frac 1.0)
    //      doc 3 "x a b"   → [x a] new, [a b] seen  (frac 0.5)
    //      doc 4 "z"       → one whole-doc window, new
    val docs = Seq((1L, "a b c d"), (2L, "a b c"), (3L, "x a b"),
      (4L, "z")).toDF("doc_id", "text")
    val out = Dedup.dupWindows(docs.repartition(3), "doc_id", "text",
        w = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1L, 3L, 0L, 0.0), (2L, 2L, 2L, 1.0), (3L, 2L, 1L, 0.5),
      (4L, 1L, 0L, 0.0)), s"got ${out.toSeq}")
  }

  test("dupWindows counts a repeat WITHIN one document as duplicate") {
    // "a b a b" w=2 → [a b][b a][a b]: third window repeats the first
    val docs = Seq((7L, "a b a b")).toDF("doc_id", "text")
    val r = Dedup.dupWindows(docs, "doc_id", "text", w = 2).collect()(0)
    assert(r.getLong(1) == 3L && r.getLong(2) == 1L)
  }

  // ── X122 per-source common prefix ──────────────────────────────────

  test("sourcePrefix: LCP(min,max) over mixed sources, prefix-of case, " +
    "singleton source") {
    val docs = Seq(
      (1L, "HEADER: foo bar", "s1"), (2L, "HEADER: foo baz", "s1"),
      (3L, "HEADER: foo", "s1"),          // a PREFIX of the others
      (4L, "alpha", "s2"), (5L, "beta", "s2"),   // nothing shared
      (6L, "only doc", "s3")                     // singleton: full text
    ).toDF("doc_id", "text", "source")
    val out = graft.ext.TextOps.sourcePrefix(docs.repartition(4),
        "doc_id", "text", "source")
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      ("s1", 3L, 11L, "HEADER: foo"),
      ("s2", 2L, 0L, ""),
      ("s3", 1L, 8L, "only doc")), s"got ${out.toSeq}")
  }

  test("prefixTrim strips exactly the per-source LCP, exact-prefix doc " +
    "trims to empty") {
    def md5hex(t: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Seq(
      (1L, "HDR foo", "s1"), (2L, "HDR bar", "s1"), (3L, "HDR", "s1"),
      (4L, "solo text", "s2")
    ).toDF("doc_id", "text", "source")
    val out = graft.ext.TextOps.prefixTrim(docs.repartition(3),
        "doc_id", "text", "source")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getString(4)))
    // s1's LCP is "HDR" (doc 3 is an exact prefix of the others)
    assert(out.toSeq == Seq(
      (1L, 3L, 4L, md5hex(" foo")), (2L, 3L, 4L, md5hex(" bar")),
      (3L, 3L, 0L, md5hex("")),
      (4L, 9L, 0L, md5hex(""))), s"got ${out.toSeq}")
  }

  // ── X119 corpus snapshot diff ──────────────────────────────────────

  test("corpusDiff classifies added/removed/changed and drops unchanged") {
    val oldSnap = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val newSnap = Seq((2L, "b"), (3L, "C2"), (4L, "d")).toDF("doc_id", "text")
    val out = Dedup.corpusDiff(oldSnap.repartition(3), newSnap, "doc_id",
        "text")
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "removed", 3L -> "changed", 4L -> "added"),
      s"got $out") // doc 2 unchanged → absent; output is churn-sized
    // hash columns carry the evidence: changed rows have both sides
    val changed = Dedup.corpusDiff(oldSnap, newSnap, "doc_id", "text")
      .where(col("status") === "changed").collect()(0)
    assert(!changed.isNullAt(2) && !changed.isNullAt(3) &&
      changed.getString(2) != changed.getString(3))
  }

  test("corpusDiff property: applying the diff to the old snapshot " +
    "reconstructs the new, over random snapshot pairs") {
    // the SyncPropertySpec convergence discipline applied to the
    // content-aware diff: for arbitrary (old, new) pairs — overlapping
    // ids, changed/equal texts, NULL texts — replaying the diff against
    // the old hash state must land exactly on the new hash state
    // (remove 'removed', upsert 'added'/'changed' to new_hash).
    def md5hex(t: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rnd = new scala.util.Random(1234)
    val texts = Vector(null, "a", "b", "c", "dd", "ee")
    for (round <- 0 until 20) {
      def gen(): Map[Long, String] =
        (0L to 14L).filter(_ => rnd.nextDouble() < 0.5)
          .map(id => id -> texts(rnd.nextInt(texts.size))).toMap
      val o = gen(); val n = gen()
      val diff = Dedup.corpusDiff(
        o.toSeq.toDF("doc_id", "text"), n.toSeq.toDF("doc_id", "text"),
        "doc_id", "text").collect()
      var state: Map[Long, Option[String]] =
        o.map { case (k, v) => k -> Option(v).map(md5hex) }
      diff.foreach { r =>
        val id = r.getLong(0)
        if (r.getString(1) == "removed") state -= id
        else state += id ->
          (if (r.isNullAt(3)) None else Some(r.getString(3)))
      }
      val want = n.map { case (k, v) => k -> Option(v).map(md5hex) }
      assert(state == want, s"round $round: diff replay diverged")
    }
  }

  test("corpusDiff treats a NULL-text row as PRESENT, not absent") {
    // presence must be an explicit flag: md5(NULL) = NULL would
    // otherwise classify these rows as added/absent
    val oldSnap = Seq((1L, null: String), (2L, null: String), (3L, "c"))
      .toDF("doc_id", "text")
    val newSnap = Seq((1L, null: String), (3L, null: String), (4L, null: String))
      .toDF("doc_id", "text")
    val out = Dedup.corpusDiff(oldSnap, newSnap, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(
      2L -> "removed",  // NULL-text doc only in old: removed, not added
      3L -> "changed",  // text → NULL is a change
      4L -> "added"     // genuinely new, even with NULL text
    ), s"got $out")     // doc 1: NULL → NULL, present in both → dropped
  }

  // ── X114 kNN classify ──────────────────────────────────────────────

  test("knnClassify majority vote with deterministic tiebreaks") {
    // probe 0 at origin-ish; train: three label-1 close, two label-2
    // closer but fewer — k=5 majority is label 1
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 9),          // probe (true label 9 → wrong)
      (10L, Array(0.9f, 0.1f), 2), (11L, Array(0.9f, -0.1f), 2),
      (12L, Array(0.8f, 0.3f), 1), (13L, Array(0.8f, -0.3f), 1),
      (14L, Array(0.7f, 0.4f), 1),
      (15L, Array(-1.0f, 0.0f), 3)         // far away, outside top-5
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.knnClassify(emb, "vec_id", "embedding", "label",
      _ < 10, k = 5).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[Long]("pred_label") == 1L)
    assert(r.getAs[Long]("votes") == 3L)
    assert(r.getAs[Long]("true_label") == 9L)
    assert(!r.getAs[Boolean]("correct"))
  }

  test("knnClassify vote tie breaks by best (nearest) rank") {
    // two labels with 1 vote each in k=2: the nearer neighbor's label wins
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 5),
      (10L, Array(0.99f, 0.1f), 8),   // rank 1 → label 8 wins the tie
      (11L, Array(0.9f, 0.3f), 2)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.knnClassify(emb, "vec_id", "embedding", "label",
      _ < 10, k = 2).collect()(0)
    assert(out.getAs[Long]("pred_label") == 8L)
  }

  test("knnClassify probes never vote (held-out split)") {
    val emb = Tables.load(spark, TestSpark.sfDir, "embeddings")
    val out = Similarity.knnClassify(emb, "vec_id", "embedding", "label",
      _ < 50, k = 7)
    assert(out.count() == 50)
    // every probe id < 50 appears exactly once; no probe id can be its
    // own neighbor (train side excludes ids < 50 entirely, checked by
    // re-deriving the vote from a train-side-only top-k)
    assert(out.select("pid").distinct().count() == 50)
  }

  // ── X115 mutual kNN ────────────────────────────────────────────────

  test("mutualKnnPairs keeps only reciprocal edges") {
    // a-b mutual; c's nearest is a, but a prefers b (and k=1) → c has
    // no reciprocal edge
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.99f, 0.14f)),
      (3L, Array(0.9f, -0.44f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.mutualKnnPairs(emb, "vec_id", "embedding",
      _ <= 3, k = 1).collect()
    assert(out.length == 1)
    assert(out(0).getLong(0) == 1L && out(0).getLong(1) == 2L)
    assert(out(0).getAs[Long]("rank_ab") == 1L)
    assert(out(0).getAs[Long]("rank_ba") == 1L)
  }

  test("mutualKnnPairs is symmetric and bounded by k·|subset|/2") {
    val emb = Tables.load(spark, TestSpark.sfDir, "embeddings")
    val k = 5
    val out = Similarity.mutualKnnPairs(emb, "vec_id", "embedding",
      _ < 120, k).cache()
    assert(out.where(col("da") >= col("db")).isEmpty)
    assert(out.count() <= 120L * k / 2)
    // every pair really is in both top-k lists
    val topk = Similarity.bruteForceTopK(
      emb.where(col("vec_id") < 120), "vec_id", "embedding",
      _ => lit(true), k)
      .select(col("pid"), col("nid"))
    val bad = out.join(topk,
        out("da") === topk("pid") && out("db") === topk("nid"), "left_anti")
    assert(bad.isEmpty)
    out.unpersist()
  }

  // ── X113/X114/X115 persisted-index legs ────────────────────────────
  // The docstring contract "the brute-force leg swaps 1:1 for the
  // persisted-index probe" pinned the X2g way: at nprobe = nCentroids
  // the probe scans every bucket, so the indexed form must equal the
  // brute-force form bit-for-bit (fusion/vote/reciprocal stages consume
  // only rank tuples).

  private def withIndex(corpus: org.apache.spark.sql.DataFrame)
                       (body: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graft_legidx_")
      .toString
    try {
      Similarity.ivfIndexBuild(corpus, "vec_id", "embedding", dir,
        nCentroids = 8)
      body(dir)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(dir))
  }

  private def pinEqual(a: org.apache.spark.sql.DataFrame,
                       b: org.apache.spark.sql.DataFrame,
                       what: String): Unit = {
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      s"$what: indexed leg at nprobe=nCentroids must equal brute force")
    assert(a.count() > 0, s"$what: empty pin is vacuous")
  }

  test("hybridTopKIndexed equals hybridTopK at nprobe = nCentroids (X113)") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val emb = Tables.load(spark, TestSpark.sfDir, "embeddings")
    withIndex(emb) { dir =>
      pinEqual(
        Similarity.hybridTopKIndexed(docs, "doc_id", "text", emb,
          "vec_id", "embedding", dir, _ < 10, k = 10, nprobe = 8),
        Similarity.hybridTopK(docs, "doc_id", "text", emb,
          "vec_id", "embedding", _ < 10, k = 10),
        "hybrid")
    }
  }

  test("knnClassifyIndexed over a train-side index equals knnClassify " +
    "at nprobe = nCentroids (X114)") {
    val emb = Tables.load(spark, TestSpark.sfDir, "embeddings")
    // the index holds the TRAIN side only — the held-out contract
    withIndex(emb.where(col("vec_id") >= 50)) { dir =>
      pinEqual(
        Similarity.knnClassifyIndexed(emb, "vec_id", "embedding", "label",
          _ < 50, k = 7, dir, nprobe = 8),
        Similarity.knnClassify(emb, "vec_id", "embedding", "label",
          _ < 50, k = 7),
        "knn-classify")
    }
  }

  test("knnOutlierIndexed over a corpus index equals knnOutlier at " +
    "nprobe = nCentroids (X134)") {
    val emb = Tables.load(spark, TestSpark.sfDir, "embeddings")
    withIndex(emb) { dir =>
      pinEqual(
        Similarity.knnOutlierIndexed(emb, "vec_id", "embedding",
          _ < 40, k = 10, dir, nprobe = 8),
        Similarity.knnOutlier(emb, "vec_id", "embedding", _ < 40, k = 10),
        "knn-outlier")
    }
  }

  test("tripletMineIndexed over a corpus index equals tripletMine at " +
    "nprobe = nCentroids (X136)") {
    val emb = Tables.load(spark, TestSpark.sfDir, "embeddings")
    withIndex(emb) { dir =>
      pinEqual(
        Similarity.tripletMineIndexed(emb, "vec_id", "embedding", "label",
          _ < 50, k = 20, dir, nprobe = 8),
        Similarity.tripletMine(emb, "vec_id", "embedding", "label",
          _ < 50, k = 20),
        "triplet-mine")
    }
  }

  test("tripletMine hard and semi-hard modes equal an in-memory " +
    "derivation; semi-hard negatives sit strictly below the positive " +
    "(X136)") {
    val emb = Tables.load(spark, TestSpark.sfDir, "embeddings")
    val vecs = vecsOf(emb).toMap
    val labs = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val k = 10
    def mine(semiHard: Boolean): Seq[(Long, Long, Long, Long)] =
      (0L until 30L).flatMap { pid =>
        val cands = vecs.keys.filter(_ != pid).toSeq
          .map(nid => (nid, cos(vecs(pid), vecs(nid))))
          .sortBy { case (nid, s) => (-s, nid) }.take(k)
        val pos = cands.find { case (nid, _) => labs(nid) == labs(pid) }
        pos.flatMap { case (pi, ps) =>
          val negs = cands.filter { case (nid, s) =>
            labs(nid) != labs(pid) && (!semiHard || s < ps) }
          negs.headOption.map { case (ni, _) => (pid, labs(pid), pi, ni) }
        }
      }
    for (semiHard <- Seq(false, true)) {
      val got = Similarity.tripletMine(emb, "vec_id", "embedding",
          "label", _ < 30, k, semiHard)
        .orderBy("pid").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
      assert(got == mine(semiHard), s"semiHard=$semiHard")
      assert(got.nonEmpty, s"semiHard=$semiHard: vacuous")
    }
    // semi-hard contract directly on the output
    Similarity.tripletMine(emb, "vec_id", "embedding", "label", _ < 30,
        k, semiHard = true)
      .collect().foreach(r =>
        assert(r.getAs[Double]("sim_neg") < r.getAs[Double]("sim_pos")))
  }

  test("mutualKnnPairsIndexed over a subset index equals mutualKnnPairs " +
    "at nprobe = nCentroids (X115)") {
    val emb = Tables.load(spark, TestSpark.sfDir, "embeddings")
    withIndex(emb.where(col("vec_id") < 120)) { dir =>
      pinEqual(
        Similarity.mutualKnnPairsIndexed(emb, "vec_id", "embedding",
          _ < 120, k = 5, dir, nprobe = 8),
        Similarity.mutualKnnPairs(emb, "vec_id", "embedding",
          _ < 120, k = 5),
        "mutual-knn")
    }
  }

  // ── shared IEEE re-derivation helpers (X125/X126 differentials) ────

  /** Spark round(x, 6) for DoubleType: BigDecimal.valueOf + HALF_UP. */
  private def round6(x: Double): Double = java.math.BigDecimal.valueOf(x)
    .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue

  /** Round-6 cosine in the engine's op order (float→double element
    * casts, left-to-right accumulation, sqrt'd norms, one division). */
  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    round6(d / (math.sqrt(na) * math.sqrt(nb)))
  }

  /** sim → exact 1e-6 integer units: round(sim·1e6) then truncate. */
  private def micro(s: Double): Long = java.math.BigDecimal
    .valueOf(s * 1e6).setScale(0, java.math.RoundingMode.HALF_UP)
    .doubleValue.toLong

  private def vecsOf(df: org.apache.spark.sql.DataFrame) = df
    .select("vec_id", "embedding").collect()
    .map(r => r.getLong(0) ->
      r.getSeq[Float](1).map(_.toDouble).toArray).toMap

  // ── X125 margin-based bitext mining ────────────────────────────────

  private def bitextSides() = {
    val emb = Tables.load(spark, TestSpark.sfDir, "embeddings")
      .where(col("vec_id") < 240)
    (emb.where(pmod(col("label"), lit(2)) === 0),
      emb.where(pmod(col("label"), lit(2)) === 1))
  }

  test("marginMine: margins replay exactly from a driver-side " +
    "re-derivation of the top-k legs (X125)") {
    val (src, tgt) = bitextSides()
    val out = Similarity.marginMine(src, tgt, "vec_id", "embedding",
      k = 4, threshold = 1.0).collect()
    assert(out.nonEmpty, "vacuous differential")
    assert(out.map(_.getLong(0)).distinct.length == out.length,
      "one best target per source")
    assert(out.forall(_.getDouble(3) > 1.0), "threshold bar")

    // independent reimplementation: same IEEE ops in the same order
    val sv = vecsOf(src); val tv = vecsOf(tgt)
    def topk(from: Map[Long, Array[Double]], to: Map[Long, Array[Double]])
    : Map[Long, Seq[(Long, Double)]] =
      from.map { case (pid, pv) =>
        pid -> to.toSeq.map { case (nid, nv) => (nid, cos(pv, nv)) }
          .sortBy { case (nid, sim) => (-sim, nid) }.take(4)
      }
    val fwd = topk(sv, tv); val bwd = topk(tv, sv)
    def dsum(l: Seq[(Long, Double)]): Long =
      l.map { case (_, s) => micro(s) }.sum
    val expected = fwd.flatMap { case (pid, cands) =>
      cands.map { case (nid, sim) =>
        val m = round6(sim / ((dsum(fwd(pid)) + dsum(bwd(nid))) / 8e6))
        (pid, nid, sim, m)
      }.sortBy { case (_, nid, _, m) => (-m, nid) }
        .headOption.filter(_._4 > 1.0)
    }.toSeq.sortBy(_._1)
    val got = out.map(r => (r.getLong(0), r.getLong(1),
      r.getDouble(2), r.getDouble(3))).toSeq.sortBy(_._1)
    assert(got == expected, "margin differential mismatch")
  }

  test("marginMineIndexed equals marginMine at nprobe = nCentroids " +
    "with one index per side (X125)") {
    val (src, tgt) = bitextSides()
    withIndex(src) { srcDir =>
      withIndex(tgt) { tgtDir =>
        pinEqual(
          Similarity.marginMineIndexed(src, tgt, "vec_id", "embedding",
            k = 4, srcDir, tgtDir, threshold = 1.0, nprobe = 8),
          Similarity.marginMine(src, tgt, "vec_id", "embedding",
            k = 4, threshold = 1.0),
          "bitext-margin")
      }
    }
  }

  // ── X126 MMR-diversified retrieval ─────────────────────────────────

  test("mmrDiversify: selection replays from a driver-side integer " +
    "greedy; pick 1 is the relevance argmax (X126)") {
    val emb = Tables.load(spark, TestSpark.sfDir, "embeddings")
    val out = Similarity.mmrDiversify(emb, "vec_id", "embedding",
      _ < 10, n = 8, k = 4).orderBy("pid", "pick").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(out.nonEmpty, "vacuous differential")
    // no probe repeats a pick
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).distinct.length == rows.length)
    }

    // independent integer greedy in the driver
    val all = vecsOf(emb)
    val probes = all.filter(_._1 < 10)
    val expected = probes.keys.toSeq.sorted.flatMap { pid =>
      val pv = all(pid)
      val cands = all.toSeq.filter(_._1 != pid)
        .map { case (nid, nv) => (nid, cos(pv, nv)) }
        .sortBy { case (nid, s) => (-s, nid) }.take(8)
        .map { case (nid, s) => (nid, micro(s)) }
      val pair = (for ((a, _) <- cands; (b, _) <- cands if a != b)
        yield (a, b) -> micro(cos(all(a), all(b)))).toMap
      var selected = Vector.empty[(Long, Long, Long)] // (nid, rel, mmr)
      for (_ <- 1 to 4) {
        val remaining = cands.filterNot(c =>
          selected.exists(_._1 == c._1))
        if (remaining.nonEmpty) {
          val scored = remaining.map { case (nid, rel) =>
            val mmr = if (selected.isEmpty) rel
              else rel - selected.map(s => pair((nid, s._1))).max
            (nid, rel, mmr)
          }
          selected :+= scored.minBy { case (nid, _, mmr) => (-mmr, nid) }
        }
      }
      selected.zipWithIndex.map { case ((nid, rel, mmr), i) =>
        (pid, (i + 1).toLong, nid, rel, mmr)
      }
    }
    assert(out == expected, "MMR greedy differential mismatch")
  }

  test("mmrDiversifyIndexed equals mmrDiversify at nprobe = nCentroids " +
    "(X126)") {
    val emb = Tables.load(spark, TestSpark.sfDir, "embeddings")
    withIndex(emb) { dir =>
      pinEqual(
        Similarity.mmrDiversifyIndexed(emb, "vec_id", "embedding",
          _ < 10, n = 8, k = 4, dir, nprobe = 8),
        Similarity.mmrDiversify(emb, "vec_id", "embedding",
          _ < 10, n = 8, k = 4),
        "mmr-diversify")
    }
  }

  // ── X128 rank metrics / X128b int8 search tier ─────────────────────

  test("rankMetrics: a ranking scored against itself is perfect (X128)") {
    val emb = Tables.load(spark, TestSpark.sfDir, "embeddings")
    val gold = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      _ < 10, k = 5)
    val m = Similarity.rankMetrics(gold, gold, k = 5).collect()
    assert(m.length == 10)
    assert(m.forall(r => r.getLong(1) == 5L &&
      r.getDouble(2) == 1.0 && r.getDouble(3) == 1.0))
  }

  test("rankMetrics hand fixture: gold top-1 at system rank 2, one " +
    "miss — MRR 0.5, nDCG from the literal table (X128)") {
    import spark.implicits._
    val gold = Seq((1L, 1, 10L), (1L, 2, 20L), (1L, 3, 30L))
      .toDF("pid", "rank", "nid")
    val sys = Seq((1L, 1, 20L), (1L, 2, 10L), (1L, 3, 40L))
      .toDF("pid", "rank", "nid")
    val r = Similarity.rankMetrics(sys, gold, k = 3).collect()(0)
    assert(r.getLong(1) == 2L) // hits: 20 and 10; 40 is a miss
    assert(r.getDouble(2) == 0.5) // gold top-1 (10) sits at sys rank 2
    val dcg = 1000000L + 630930L // hits at system ranks 1 and 2
    val idcg = 1000000L + 630930L + 500000L
    assert(r.getDouble(3) == round6(dcg.toDouble / idcg))
    // absent gold top-1 zeroes MRR
    val sys2 = Seq((1L, 1, 20L), (1L, 2, 30L), (1L, 3, 40L))
      .toDF("pid", "rank", "nid")
    assert(Similarity.rankMetrics(sys2, gold, k = 3)
      .collect()(0).getDouble(2) == 0.0)
  }

  test("int8TopK replays from a driver-side quantize-and-rank (X128b)") {
    val emb = Tables.load(spark, TestSpark.sfDir, "embeddings")
    val got = Similarity.int8TopK(emb, "vec_id", "embedding", _ < 10,
      k = 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSeq.sortBy(t => (t._1, t._2))
    val all = vecsOf(emb)
    def quant(a: Array[Double]): Array[Long] = {
      val mx = a.map(math.abs).max
      if (mx == 0.0) a.map(_ => 0L)
      else a.map(x => java.math.BigDecimal.valueOf(x * 127.0 / mx)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue.toLong)
    }
    val qm = all.map { case (id, v) => id -> quant(v) }
    def idot(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val expected = qm.keys.filter(_ < 10).toSeq.sorted.flatMap { pid =>
      val pq = qm(pid); val pn = math.sqrt(idot(pq, pq).toDouble)
      qm.toSeq.filter(_._1 != pid).map { case (nid, nq) =>
        (nid, round6(idot(pq, nq).toDouble /
          (pn * math.sqrt(idot(nq, nq).toDouble))))
      }.sortBy { case (nid, s) => (-s, nid) }.take(5).zipWithIndex
        .map { case ((nid, s), i) => (pid, i + 1, nid, s) }
    }
    assert(got == expected, "int8 ranking differential mismatch")
  }

  // ── X2g filtered search ────────────────────────────────────────────

  test("filteredTopK returns only allowed labels and guarantees k") {
    val emb = Tables.load(spark, TestSpark.sfDir, "embeddings")
    val out = Similarity.filteredTopK(emb, "vec_id", "embedding", "label",
      _ < 4, _ < 10, k = 5).cache()
    assert(out.where(col("label") >= 4).isEmpty)
    // labels 0..3 hold far more than k rows → every probe gets exactly k
    val counts = out.groupBy("pid").count()
    assert(counts.where(col("count") =!= 5).isEmpty)
    assert(counts.count() == 10)
    out.unpersist()
  }

  test("post-filtering an unfiltered top-k under-returns; the filtered " +
    "form does not") {
    val emb = Tables.load(spark, TestSpark.sfDir, "embeddings")
    val k = 5
    val post = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        _ < 10, k)
      .join(emb.select(col("vec_id").as("nid"), col("label")), Seq("nid"))
      .where(col("label") < 1)   // selective filter applied AFTER ranking
      .groupBy("pid").count()
    val filtered = Similarity.filteredTopK(emb, "vec_id", "embedding",
        "label", _ < 1, _ < 10, k)
      .groupBy("pid").count()
    val postTotal = post.agg(sum("count")).collect()(0).getLong(0)
    val filtTotal = filtered.agg(sum("count")).collect()(0).getLong(0)
    assert(filtTotal == 10L * k, "filtered form returns k per probe")
    assert(postTotal < filtTotal,
      s"post-filter should under-return ($postTotal vs $filtTotal)")
  }

  test("ivfIndexProbeFiltered equals exact filteredTopK at " +
    "nprobe = nCentroids, and honors the allowlist at any nprobe") {
    val emb = Tables.load(spark, TestSpark.sfDir, "embeddings").cache()
    val dir = java.nio.file.Files.createTempDirectory("graft_fidx_")
      .toString
    try {
      Similarity.ivfIndexBuild(emb, "vec_id", "embedding", dir,
        nCentroids = 8)
      val allowed = emb.where(col("label") < 4).select(col("vec_id"))
      val probes = emb.where(col("vec_id") < 10)
      // full-scan probe ≡ the exact filtered leg (modulo the label col)
      val viaIndex = Similarity.ivfIndexProbeFiltered(probes, "vec_id",
          "embedding", allowed, "vec_id", dir, k = 5, nprobe = 8)
        .select("pid", "rank", "nid", "sim")
      val exact = Similarity.filteredTopK(emb, "vec_id", "embedding",
          "label", _ < 4, _ < 10, k = 5)
        .select("pid", "rank", "nid", "sim")
      assert(viaIndex.exceptAll(exact).isEmpty &&
        exact.exceptAll(viaIndex).isEmpty,
        "filtered index probe at nprobe=nCentroids must equal exact")
      // at selective nprobe the allowlist still confines every result
      val narrow = Similarity.ivfIndexProbeFiltered(probes, "vec_id",
        "embedding", allowed, "vec_id", dir, k = 5, nprobe = 2)
      val outside = narrow.join(allowed.withColumnRenamed("vec_id", "nid"),
        Seq("nid"), "left_anti")
      assert(outside.isEmpty, "result outside the allowlist")
      // unbounded-allowlist path: the shuffled semi-join must produce
      // the identical result, and its plan must NOT broadcast the
      // allowlist (no executor-memory bound on the filter at 100 TB)
      val shuffled = Similarity.ivfIndexProbeFiltered(probes, "vec_id",
          "embedding", allowed, "vec_id", dir, k = 5, nprobe = 8,
          broadcastAllowlist = false)
        .select("pid", "rank", "nid", "sim")
      assert(shuffled.exceptAll(exact).isEmpty &&
        exact.exceptAll(shuffled).isEmpty,
        "shuffled-allowlist path must equal the broadcast path")
      val semiLines = shuffled.queryExecution.sparkPlan.toString
        .linesIterator.filter(_.contains("LeftSemi")).toSeq
      assert(semiLines.nonEmpty, "expected a semi join in the probe plan")
      assert(semiLines.forall(!_.contains("Broadcast")),
        s"allowlist semi-join must not broadcast:\n${semiLines.mkString("\n")}")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(dir))
      emb.unpersist()
    }
  }
}
