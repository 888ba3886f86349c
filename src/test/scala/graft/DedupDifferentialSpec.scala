package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Dedup, Similarity}

/** Differential tests against an independent in-memory implementation on
  * randomized corpora — guards against a bug shared by the Spark code and
  * its hand-written DuckDB oracle (both were authored together; this
  * reference is derived only from the operator definitions).
  */
class DedupDifferentialSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val words = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu")

  private def randomDocs(seed: Int, n: Int): Seq[(Long, String)] = {
    val rnd = new Random(seed)
    (0L until n.toLong).map { id =>
      val len = 4 + rnd.nextInt(20)
      id -> Seq.fill(len)(words(rnd.nextInt(words.size))).mkString(" ")
    }
  }

  private def trigrams(text: String): Set[String] =
    text.trim.toLowerCase.split(" +").toSeq.sliding(3)
      .filter(_.size == 3).map(_.mkString(" ")).toSet

  private def jaccard(a: Set[String], b: Set[String]): Double =
    if (a.isEmpty && b.isEmpty) 0.0
    else a.intersect(b).size.toDouble / a.union(b).size

  test("ngramJaccard matches the in-memory trigram Jaccard on random corpora") {
    import spark.implicits._
    for (seed <- Seq(1, 2)) {
      val docs = randomDocs(seed, 60)
      val want = (for {
        (da, ta) <- docs; (db, tb) <- docs if db > da
        j = jaccard(trigrams(ta), trigrams(tb)) if j >= 0.3
      } yield (da, db, BigDecimal(j).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)).toSet

      val got = Dedup.ngramJaccard(docs.toDF("doc_id", "text"), "doc_id", "text", 0.3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == want, s"seed=$seed")
    }
  }

  test("prefixFilterJoin equals ngramJaccard at every threshold — the " +
    "prefix prunes candidates, never results (X130)") {
    import spark.implicits._
    // random corpora at several thresholds: the lossless-prefix claim
    for (seed <- Seq(3, 4); t <- Seq(0.25, 0.4, 0.6)) {
      val docs = randomDocs(seed, 60).toDF("doc_id", "text")
      val exact = Dedup.ngramJaccard(docs, "doc_id", "text", t)
      val pruned = Dedup.prefixFilterJoin(docs, "doc_id", "text", t)
      assert(pruned.exceptAll(exact).isEmpty &&
        exact.exceptAll(pruned).isEmpty, s"seed=$seed t=$t")
    }
    // and on the fixture with the declared df cap — non-vacuously
    val fixture = Tables.load(spark, TestSpark.sfDir, "documents")
    val a = Dedup.prefixFilterJoin(fixture, "doc_id", "text", 0.4,
      maxDf = 100)
    val b = Dedup.ngramJaccard(fixture, "doc_id", "text", 0.4,
      maxDf = 100)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    assert(a.count() > 0, "vacuous pin")
  }

  test("prefixFilterJoin boundary: a pair at exactly the threshold " +
    "survives; just below rounds out (X130)") {
    import spark.implicits._
    // trigrams: {abc,bcd,cde,def} vs {abc,bcd,cde,deg} → J = 3/5 = 0.6
    val docs = Seq((1L, "a b c d e f"), (2L, "a b c d e g"))
      .toDF("doc_id", "text")
    val at = Dedup.prefixFilterJoin(docs, "doc_id", "text", 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(at.toSeq == Seq((1L, 2L, 0.6)))
    assert(Dedup.prefixFilterJoin(docs, "doc_id", "text", 0.600001)
      .count() == 0)
  }

  test("minhash LSH: exact duplicates always collide, disjoint-vocab docs never") {
    import spark.implicits._
    val rnd = new Random(7)
    val base = Seq.fill(30)(words(rnd.nextInt(6))).mkString(" ")      // vocab A
    val other = Seq.fill(30)(words(6 + rnd.nextInt(6))).mkString(" ") // vocab B
    val docs = Seq(
      (1L, base), (2L, base),             // identical → must be candidates
      (3L, other), (4L, other + " mu"),   // near-identical, vocab B
      (5L, base + " " + base)             // doubled text, same shingle SET
    ).toDF("doc_id", "text")
    val pairs = Dedup.minHashLsh(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "identical docs must share every band")
    assert(pairs.contains((1L, 5L)) && pairs.contains((2L, 5L)),
      "shingle-set-identical docs must share every band (min over multiset)")
    assert(pairs.contains((3L, 4L)), "one-token diff on 28 shared shingles")
    val groupA = Set(1L, 2L, 5L)
    val groupB = Set(3L, 4L)
    assert(!pairs.exists(p =>
        (groupA.contains(p._1) && groupB.contains(p._2)) ||
        (groupB.contains(p._1) && groupA.contains(p._2))),
      s"disjoint vocabularies must never bucket together: $pairs")
  }

  test("simHash: identical docs identical; fingerprint = sign of hash-bit sums") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma alpha"), (2L, "alpha beta gamma alpha"),
      (3L, "mu lambda kappa iota theta eta")).toDF("doc_id", "text")
    val fp = Dedup.simHash(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L).length == 64 && fp(1L).forall(c => c == '0' || c == '1'))

    // independent recomputation for doc 1
    val counts = "alpha beta gamma alpha".split(" ").groupBy(identity)
      .view.mapValues(_.length.toLong).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val want = (0 until 64).map { j =>
      val s = counts.map { case (tok, cnt) =>
        val digit = Integer.parseInt(hex(tok).charAt(j / 4).toString, 16)
        val bit = (digit >> (j % 4)) & 1
        cnt * (2L * bit - 1L)
      }.sum
      if (s > 0) '1' else '0'
    }.mkString
    assert(fp(1L) == want, "simhash must equal the definition recomputed independently")
  }

  test("simHashPairs equals in-memory all-pairs Hamming filter") {
    import spark.implicits._
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def fingerprint(text: String): Long = {
      val counts = text.trim.toLowerCase.split(" +").toSeq.groupBy(identity)
        .view.mapValues(_.length.toLong).toMap
      (0 until 64).foldLeft(0L) { (acc, j) =>
        val s = counts.map { case (tok, cnt) =>
          val digit = Integer.parseInt(hex(tok).charAt(j / 4).toString, 16)
          cnt * (2L * ((digit >> (j % 4)) & 1) - 1L)
        }.sum
        if (s > 0) acc | (1L << j) else acc
      }
    }
    for ((seed, maxHam) <- Seq((3, 7), (4, 15))) {
      // near-dup-rich corpus: random docs plus mutated copies
      val rnd = new Random(seed)
      val base = randomDocs(seed, 40)
      val docs = base ++ base.take(10).map { case (id, t) =>
        (id + 100L, t + " " + words(rnd.nextInt(words.size))) }
      val fps = docs.map { case (id, t) => id -> fingerprint(t) }
      val want = (for {
        (da, fa) <- fps; (db, fb) <- fps if db > da
        h = java.lang.Long.bitCount(fa ^ fb) if h <= maxHam
      } yield (da, db, h.toLong)).toSet
      val got = Dedup.simHashPairs(docs.toDF("doc_id", "text"),
          "doc_id", "text", maxHamming = maxHam)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.get(2).asInstanceOf[Number].longValue)).toSet
      assert(got == want, s"seed=$seed maxHam=$maxHam")
      assert(want.nonEmpty, s"fixture must exercise pairs (seed=$seed)")
    }
  }

  test("simHashPairs width=128 equals in-memory 128-bit Hamming filter; dup pairs match 64-bit") {
    import spark.implicits._
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // full md5 digest: 128 bits as two 64-bit lanes
    def fingerprint128(text: String): (Long, Long) = {
      val counts = text.trim.toLowerCase.split(" +").toSeq.groupBy(identity)
        .view.mapValues(_.length.toLong).toMap
      (0 until 128).foldLeft((0L, 0L)) { case ((lo, hi), j) =>
        val s = counts.map { case (tok, cnt) =>
          val digit = Integer.parseInt(hex(tok).charAt(j / 4).toString, 16)
          cnt * (2L * ((digit >> (j % 4)) & 1) - 1L)
        }.sum
        if (s <= 0) (lo, hi)
        else if (j < 64) (lo | (1L << j), hi)
        else (lo, hi | (1L << (j - 64)))
      }
    }
    val rnd = new Random(13)
    val base = randomDocs(13, 40)
    val docs = base ++ base.take(10).map { case (id, t) =>
      (id + 100L, t + " " + words(rnd.nextInt(words.size))) } ++
      base.take(5).map { case (id, t) => (id + 200L, t) } // exact dups
    val fps = docs.map { case (id, t) => id -> fingerprint128(t) }
    for (maxHam <- Seq(7, 31)) {
      val want = (for {
        (da, (la, ha)) <- fps; (db, (lb, hb)) <- fps if db > da
        h = java.lang.Long.bitCount(la ^ lb) + java.lang.Long.bitCount(ha ^ hb)
        if h <= maxHam
      } yield (da, db, h.toLong)).toSet
      val got = Dedup.simHashPairs(docs.toDF("doc_id", "text"),
          "doc_id", "text", maxHamming = maxHam, width = 128)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.get(2).asInstanceOf[Number].longValue)).toSet
      assert(got == want, s"width=128 maxHam=$maxHam")
      assert(want.exists(_._3 == 0L), "fixture must exercise identical fingerprints")
      if (maxHam == 31)
        assert(want.exists(_._3 > 0L), "fixture must exercise near fingerprints")
    }
    // a 128-bit fingerprint refines, never coarsens, exact-dup detection:
    // hamming-0 pairs agree with the 64-bit run on the same corpus
    val zero64 = Dedup.simHashPairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", maxHamming = 3)
      .where(col("hamming") === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val zero128 = Dedup.simHashPairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", maxHamming = 3, width = 128)
      .where(col("hamming") === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(zero128.subsetOf(zero64),
      "128-bit hamming-0 must be a refinement of 64-bit hamming-0")
    assert(zero128.nonEmpty)
  }

  test("simHashPairs: identical-fingerprint cluster cannot explode the band join") {
    import spark.implicits._
    // n identical docs + three distinct ones. The fingerprint pre-group
    // means the band join sees ONE representative per DISTINCT fingerprint,
    // so its candidate volume must be IDENTICAL whether the duplicate
    // cluster has 30 or 300 members — while the emitted pairs still cover
    // the whole cluster (C(n,2) rows at hamming 0).
    def corpus(n: Int): Seq[(Long, String)] =
      (0L until n.toLong).map(id =>
        id -> "alpha beta gamma delta epsilon zeta") ++
        Seq((1000L, "theta iota kappa theta iota"),
            (1001L, "mu lambda eta mu lambda"),
            (1002L, "kappa eta mu beta kappa"))
    val bands = 8 // maxHamming = 7
    def shapes(n: Int): (Long, Long) = {
      val (groups, members) = Dedup.simHashGroups(
        corpus(n).toDF("doc_id", "text"), "doc_id", "text", bands)
      assert(members.count() == n + 3)
      (groups.count(), Dedup.simHashRepPairs(groups, bands, 7).count())
    }
    val (g30, cand30) = shapes(30)
    val (g300, cand300) = shapes(300)
    assert(g30 == g300, "distinct-fingerprint count must not depend on cluster size")
    assert(cand30 == cand300,
      s"band-join candidates must be per-distinct-fingerprint: $cand30 vs $cand300")
    val out = Dedup.simHashPairs(corpus(30).toDF("doc_id", "text"),
        "doc_id", "text", maxHamming = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.get(2).asInstanceOf[Number].longValue))
    val withinCluster = out.filter { case (da, db, _) => da < 30 && db < 30 }
    assert(withinCluster.length == 30 * 29 / 2,
      "every within-cluster pair must still be emitted exactly once")
    assert(withinCluster.forall(_._3 == 0L))
  }

  test("bloomContamination is identical to exact contamination, even at brutal FP rates") {
    import spark.implicits._
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val train = docs.where(graft.ext.Sampling.hashBucket(col("doc_id"), 100) >= 15)
    val bench = docs.where(graft.ext.Sampling.hashBucket(col("doc_id"), 100) < 15)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
        .toSeq
    val exact = rows(Dedup.contamination(train, bench, "doc_id", "text",
      minOverlap = 20, broadcastBench = false))
    // default sizing
    assert(rows(Dedup.bloomContamination(train, bench, "doc_id", "text",
      minOverlap = 20)) == exact)
    // a 256-bit filter over thousands of shingles ≈ everything collides —
    // the exact verification join must still remove every false positive
    assert(rows(Dedup.bloomContamination(train, bench, "doc_id", "text",
      minOverlap = 20, expectedItems = 10L, numBits = 256L)) == exact)
    // empty benchmark → zero overlap everywhere, nothing contaminated
    val none = Dedup.bloomContamination(train, bench.limit(0), "doc_id", "text")
      .collect()
    assert(none.nonEmpty && none.forall(r => r.getLong(2) == 0L && !r.getBoolean(3)))
  }

  test("crossJaccardVerified: finds cross-corpus near-dups, never disjoint-vocab pairs") {
    import spark.implicits._
    val rnd = new Random(17)
    val base = Seq.fill(40)(words(rnd.nextInt(6))).mkString(" ")      // vocab A
    val other = Seq.fill(40)(words(6 + rnd.nextInt(6))).mkString(" ") // vocab B
    val train = Seq(
      (1L, base),                 // exact copy of benchmark doc 100
      (2L, base + " mu"),         // near-dup of benchmark doc 100
      (3L, other)                 // unrelated vocab
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, base),
      (101L, Seq.fill(40)(words(6 + rnd.nextInt(6))).mkString(" "))
    ).toDF("doc_id", "text")
    val got = Dedup.crossJaccardVerified(train, bench, "doc_id", "text",
        threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.contains((1L, 100L)) && got((1L, 100L)) == 1.0,
      "exact benchmark copy must surface at jaccard 1")
    assert(got.contains((2L, 100L)) && got((2L, 100L)) > 0.5,
      "paraphrase-style near-dup must surface")
    assert(!got.keySet.exists(_._1 == 3L), "disjoint vocab must not pair")
    // exact jaccard values match the independent in-memory computation
    for (((da, db), j) <- got) {
      val ta = train.where(col("doc_id") === da).head().getString(1)
      val tb = bench.where(col("doc_id") === db).head().getString(1)
      val expect = BigDecimal(jaccard(trigrams(ta), trigrams(tb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(j == expect, s"pair ($da,$db)")
    }
  }

  test("connectedComponents equals in-memory union-find on random graphs") {
    import spark.implicits._
    for (seed <- Seq(5, 6)) {
      val rnd = new Random(seed)
      val n = 80
      val edges = Seq.fill(60) {
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        if (a < b) (a, b) else (b, a)
      }.filter(e => e._1 != e._2).distinct

      // independent union-find
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      for ((a, b) <- edges) {
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = (0 until n).map(v => v.toLong -> find(v).toLong).toMap

      val got = Dedup.connectedComponents(
          (0L until n.toLong).toDF("doc_id"),
          edges.toDF("da", "db"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"seed=$seed")
      assert(want.values.toSet.size < n, s"fixture must have real merges (seed=$seed)")
    }
  }

  test("connectedComponents: pointer doubling converges on a chain in O(log diameter) rounds") {
    import spark.implicits._
    // worst case for plain min propagation: a 33-vertex path (diameter 32)
    // would need ~32 plain rounds — far over maxIter=10. The adaptive
    // schedule runs 2 plain rounds (deficit 2), then pointer doubling
    // roughly doubles the closed distance per round (6, 14, 30, done) —
    // ≤ 7 rounds total including the convergence-detection round.
    val n = 32L
    val edges = (0L until n).map(i => (i, i + 1)).toDF("da", "db")
    val (labels, rounds) = Dedup.connectedComponentsWithRounds(
      (0L to n).toDF("doc_id"), edges, maxIter = 10)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L to n).map(_ -> 0L).toMap, "one component labeled by its minimum")
    assert(rounds <= 7, s"chain of diameter $n took $rounds rounds — doubling not effective")
  }

  test("dedupPipeline: exact dups, near dups, and uniques get the right canonical") {
    import spark.implicits._
    val rnd = new Random(9)
    val base = Seq.fill(40)(words(rnd.nextInt(6))).mkString(" ")      // vocab A
    val other = Seq.fill(40)(words(6 + rnd.nextInt(6))).mkString(" ") // vocab B
    val docs = Seq(
      (1L, base), (2L, base),            // exact dups → canonical 1
      (3L, base + " mu"),                // near dup of 1 → canonical 1
      (4L, other),                       // unrelated → canonical 4
      (5L, other)                        // exact dup of 4 → canonical 4
    ).toDF("doc_id", "text")
    val got = Dedup.dedupPipeline(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L), s"$got")
  }

  test("brute-force cosine equals in-memory cosine on random vectors") {
    import spark.implicits._
    val rnd = new Random(11)
    val vecs = (0L until 20L).map(i => (i, Array.fill(16)(rnd.nextFloat())))
    val df = vecs.toDF("vec_id", "embedding")
    val got = Similarity.bruteForceTopK(df, "vec_id", "embedding", _ < 3, k = 2)
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2))).toMap

    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    for (p <- 0L until 3L) {
      val expect = vecs.filter(_._1 != p)
        .map { case (id, v) => (id, cos(vecs(p.toInt)._2, v)) }
        .sortBy { case (id, s) => (-s, id) }.take(2).map(_._1)
      assert(got((p, 1)) == expect(0) && got((p, 2)) == expect(1), s"probe $p")
    }
  }

  test("triangles: degree-ordered equals id-ordered AND in-memory on random graphs") {
    import spark.implicits._
    for (seed <- Seq(3, 17)) {
      val rnd = new Random(seed)
      val edges = (0 until 120).map { _ =>
        val a = rnd.nextInt(25).toLong; val b = rnd.nextInt(25).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct
      val adj = edges.toSet
      val want = (for {
        (a, b) <- edges; c <- (b + 1) to 24L
        if adj((a, c)) && adj((b, c))
      } yield (a, b, c)).toSet

      val df = edges.toDF("da", "db")
      val fast = Dedup.triangles(df)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val naive = Dedup.trianglesIdOrdered(df)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(fast == want, s"seed=$seed fast")
      assert(naive == want, s"seed=$seed naive")
    }
  }

  test("degree orientation collapses hub wedges where id order blows up") {
    import spark.implicits._
    // Star with the hub MID id-order: 20 edges (i,20) below + 20 (20,j)
    // above, all canonical. The id-ordered wedge join pairs every
    // below-edge with every above-edge THROUGH the hub: 20×20 = 400
    // intermediate rows for 40 edges. Degree orientation points every
    // edge leaf→hub (leaf degree 1 ≺ hub degree 40), so no vertex has
    // two out-edges — zero wedges. Triangles: none either way.
    val star = ((0L until 20L).map(i => (i, 20L)) ++
      (21L until 41L).map(j => (20L, j))).toDF("da", "db")

    val e = star.select(col("da").as("u"), col("db").as("v"))
    val idWedges = e.as("e1")
      .join(e.as("e2"), col("e1.v") === col("e2.u")).count()
    val o = Dedup.orientByDegree(star)
    val degWedges = o.as("o1")
      .join(o.as("o2"),
        col("o1.s") === col("o2.s") &&
          (col("o1.dt") < col("o2.dt") ||
            (col("o1.dt") === col("o2.dt") && col("o1.t") < col("o2.t"))))
      .count()
    assert(idWedges == 400L, s"id-ordered wedges: $idWedges")
    assert(degWedges == 0L, s"degree-ordered wedges: $degWedges")
    assert(Dedup.triangles(star).count() == 0L)
  }
}
