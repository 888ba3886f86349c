package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.SuffixOps

/** X131 suffix array + longest-repeated-span differentials: the
  * distributed prefix-doubling engine against a naive in-memory
  * generalized suffix sort, across random corpora with injected
  * repeated passages, plus the edge shapes (empty docs, identical
  * docs, single tokens, whole-doc duplicates). */
class SuffixOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Naive generalized SA: every (doc, pos 1-based) suffix as a token
    * Vector, sorted token-wise with shorter-prefix-first, ties by
    * (doc, pos). Returns the sorted (doc, pos, suffix) sequence. */
  private def naiveSa(docs: Seq[(Long, String)])
      : Vector[(Long, Long, Vector[String])] = {
    implicit val ord: Ordering[Vector[String]] = (a, b) => {
      val n = math.min(a.size, b.size)
      var i = 0
      while (i < n && a(i) == b(i)) i += 1
      if (i < n) a(i).compareTo(b(i)) else a.size.compareTo(b.size)
    }
    docs.flatMap { case (id, text) =>
      val t = text.trim.toLowerCase.split(" +", -1).toVector
      t.indices.map(p => (id, (p + 1).toLong, t.drop(p)))
    }.sortBy(x => (x._3, x._1, x._2)).toVector
  }

  private def naiveLcp(a: Vector[String], b: Vector[String]): Long = {
    val n = math.min(a.size, b.size)
    var i = 0
    while (i < n && a(i) == b(i)) i += 1
    i.toLong
  }

  /** Naive top-k adjacent-pair LCPs under the engine's output order. */
  private def naiveSpans(docs: Seq[(Long, String)], k: Int)
      : Vector[(Long, Long, Long, Long, Long)] = {
    val sa = naiveSa(docs)
    sa.sliding(2).collect { case Vector(x, y) =>
      (x._1, x._2, y._1, y._2, naiveLcp(x._3, y._3))
    }.filter(_._5 >= 1).toVector
      .sortBy { case (da, pa, db, pb, l) => (-l, da, pa, db, pb) }
      .take(k)
  }

  private def randomCorpus(rnd: Random, nDocs: Int): Seq[(Long, String)] = {
    val alpha = Vector("ab", "cd", "ef", "gh", "ij", "kl")
    val docs = (0 until nDocs).map { i =>
      val n = 1 + rnd.nextInt(14)
      (i.toLong,
        (0 until n).map(_ => alpha(rnd.nextInt(alpha.size))).mkString(" "))
    }.toArray
    // inject a shared passage into two random docs (the repeated span
    // the operator exists to find)
    if (nDocs >= 2) {
      val passage = (0 until 4 + rnd.nextInt(4))
        .map(_ => alpha(rnd.nextInt(alpha.size))).mkString(" ")
      val a = rnd.nextInt(nDocs); val b = (a + 1) % nDocs
      docs(a) = (docs(a)._1, docs(a)._2 + " " + passage)
      docs(b) = (docs(b)._1, passage + " " + docs(b)._2)
    }
    docs.toSeq
  }

  test("suffixArray equals the naive generalized suffix sort on random " +
    "corpora with injected repeated passages") {
    for (seed <- 1 to 6) {
      val rnd = new Random(seed)
      val docs = randomCorpus(rnd, 3 + rnd.nextInt(10))
      val got = SuffixOps.suffixArray(
          docs.toDF("doc_id", "text"), "doc_id", "text")
        .orderBy("sa_rank")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toVector
      val want = naiveSa(docs).map(x => (x._1, x._2))
      assert(got == want, s"seed=$seed docs=$docs")
    }
  }

  test("longestRepeatedSpans equals the naive adjacent-LCP top-k on " +
    "random corpora") {
    for (seed <- 1 to 6) {
      val rnd = new Random(seed)
      val docs = randomCorpus(rnd, 3 + rnd.nextInt(10))
      val got = SuffixOps.longestRepeatedSpans(
          docs.toDF("doc_id", "text"), "doc_id", "text", k = 15)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toVector
      val want = naiveSpans(docs, 15)
      assert(got == want, s"seed=$seed docs=$docs")
    }
  }

  test("edge shapes: identical docs, whole-doc duplicate tails, empty " +
    "and single-token docs") {
    // two identical docs: every suffix pair of the twin docs is an
    // exact repeat; an empty doc tokenizes to [""] (one suffix); a
    // single-token doc is its own suffix
    val docs = Seq(
      (1L, "x y z x y z"), (2L, "x y z x y z"), (3L, ""), (4L, "x"))
    val got = SuffixOps.longestRepeatedSpans(
        docs.toDF("doc_id", "text"), "doc_id", "text", k = 30)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toVector
    assert(got == naiveSpans(docs, 30))
    // the top pair is the full 6-token twin-doc repeat
    assert(got.head._5 == 6L)
    // suffix order over the same corpus matches naive
    val sa = SuffixOps.suffixArray(
        docs.toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("sa_rank")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toVector
    assert(sa == naiveSa(docs).map(x => (x._1, x._2)))
  }

  test("lcp cap repairs the padded-equal overshoot: identical short " +
    "tails shorter than the top doubling block") {
    // doc tails "kl" (1 token) at the end of two longer docs whose
    // doubling depth is ≥ 2: the level-1 padded segments (kl, ∅) match
    // and advance 2 past the end; the min-remaining cap must yield 1
    val docs = Seq((1L, "ab cd kl"), (2L, "ef gh kl"), (3L, "ij ij ij ij"))
    val got = SuffixOps.longestRepeatedSpans(
        docs.toDF("doc_id", "text"), "doc_id", "text", k = 20)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toVector
    assert(got == naiveSpans(docs, 20))
    assert(got.exists { case (_, _, _, _, l) => l == 1L })
  }
}
