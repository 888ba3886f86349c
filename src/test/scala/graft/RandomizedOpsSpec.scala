package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Analytics, Sampling}
import graft.ops.CoreOps

/** Randomized differential tests: each new operator against an
  * independent in-memory reimplementation of its contract, across many
  * seeds — the same style as DedupDifferentialSpec. */
class RandomizedOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("upsert equals in-memory map semantics on random target/source pairs") {
    for (seed <- 1 to 8) {
      val rnd = new Random(seed)
      val target = (0 until 40).map(_ =>
        (rnd.nextInt(30).toLong, rnd.nextInt(1000))).distinctBy(_._1)
      val source = (0 until 15).map(_ =>
        (rnd.nextInt(40).toLong, rnd.nextInt(1000))).distinctBy(_._1)
      val got = CoreOps.upsert(
        target.toDF("key", "v"), source.toDF("key", "v"), Seq("key"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      val want = (target.toMap ++ source.toMap).toSet
      assert(got == want, s"seed=$seed")
    }
  }

  private def md5hex(t: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("textIndexPhraseTopK equals an in-memory sliding-window count " +
    "on random corpora and random phrases (X120e)") {
    val alpha = Vector("a", "b", "c")
    for (seed <- 1 to 6) {
      val rnd = new Random(seed)
      val docs = (0 until 20).map { i =>
        val n = 1 + rnd.nextInt(12)
        (i.toLong, (0 until n).map(_ => alpha(rnd.nextInt(alpha.size)))
          .mkString(" "))
      }
      val plen = 1 + rnd.nextInt(3)
      val phrase = (0 until plen).map(_ => alpha(rnd.nextInt(alpha.size)))
      val dir =
        java.nio.file.Files.createTempDirectory("graft_phr_").toString
      try {
        graft.ext.TextIndex.buildTextIndex(
          docs.toDF("doc_id", "text").repartition(4), "doc_id", "text",
          dir, nBuckets = 4, positional = true)
        val got = graft.ext.TextIndex
          .textIndexPhraseTopK(spark, phrase, dir, k = 1000)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        val want = docs.map { case (id, text) =>
          val toks = text.trim.toLowerCase.split(" +").toSeq
          id -> toks.sliding(plen)
            .count(w => w.size == plen && w == phrase).toLong
        }.filter(_._2 > 0).toMap
        assert(got == want, s"seed=$seed phrase=$phrase")
      } finally org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(dir))
    }
  }

  test("textIndexAppend is batch-split invariant for corpus-known terms " +
    "on random delta partitions (X120b)") {
    val alpha = Vector("a", "b", "c", "d")
    for (seed <- 1 to 4) {
      val rnd = new Random(seed)
      val docs = (0 until 24).map { i =>
        val n = 1 + rnd.nextInt(10)
        (i.toLong, (0 until n).map(_ => alpha(rnd.nextInt(alpha.size)))
          .mkString(" "))
      }
      val base = docs.filter(_._1 % 2 == 0)
      val delta = docs.filter(_._1 % 2 == 1)
      // terms the BASE corpus knows — exactly the batch-split-invariant
      // contract; delta-only tokens are first-batch-anchored by design
      val baseToks = base.flatMap(_._2.split(" +")).toSet
      val terms = alpha.filter(baseToks)
      val nBatches = 1 + rnd.nextInt(3)
      val assign = delta.groupBy(d => rnd.nextInt(nBatches))
      def mk(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
      val dirA =
        java.nio.file.Files.createTempDirectory("graft_apA_").toString
      val dirB =
        java.nio.file.Files.createTempDirectory("graft_apB_").toString
      try {
        graft.ext.TextIndex.buildTextIndex(mk(base), "doc_id", "text",
          dirA, nBuckets = 4)
        assign.toSeq.sortBy(_._1).foreach { case (j, rows) =>
          graft.ext.TextIndex.textIndexAppend(mk(rows), "doc_id", "text",
            dirA, token = s"t$j")
        }
        graft.ext.TextIndex.buildTextIndex(mk(base), "doc_id", "text",
          dirB, nBuckets = 4)
        graft.ext.TextIndex.textIndexAppend(mk(delta), "doc_id", "text",
          dirB, token = "all")
        def probe(p: String) = graft.ext.TextIndex
          .textIndexTopK(spark, terms, p, k = 1000)
          .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
          .toMap
        assert(probe(dirA) == probe(dirB),
          s"seed=$seed batches=$nBatches terms=$terms")
      } finally {
        org.apache.commons.io.FileUtils
          .deleteDirectory(new java.io.File(dirA))
        org.apache.commons.io.FileUtils
          .deleteDirectory(new java.io.File(dirB))
      }
    }
  }

  test("segmentDedup equals an in-memory first-occurrence scan on " +
    "random corpora (incl. the two-phase winners-regroup reassembly)") {
    val alpha = Vector("a", "b", "c", "d")
    for (seed <- 1 to 8) {
      val rnd = new Random(seed)
      val docs = (0 until 25).map { i =>
        val n = rnd.nextInt(11) // 0..10 tokens (0 → empty text)
        (i.toLong, (0 until n).map(_ => alpha(rnd.nextInt(alpha.size)))
          .mkString(" "))
      }
      val k = 1 + rnd.nextInt(3)
      val got = graft.ext.Dedup.segmentDedup(
          docs.toDF("doc_id", "text").repartition(5), "doc_id", "text", k)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) null else r.getString(3), r.getLong(4))))
        .toMap
      // independent scan: walk docs in id order, one global seen-set
      val seen = scala.collection.mutable.Set[String]()
      val want = docs.map { case (id, text) =>
        val toks = text.trim.toLowerCase.split(" +").toSeq
        val segs = toks.grouped(k).map(_.mkString(" ")).toSeq
        val keptSegs = segs.filter { s =>
          if (seen(s)) false else { seen += s; true }
        }
        val out = keptSegs.mkString(" ")
        id -> ((segs.size.toLong, keptSegs.size.toLong,
          if (keptSegs.isEmpty) null else md5hex(out),
          if (keptSegs.isEmpty) 0L else out.length.toLong))
      }.toMap
      assert(got == want, s"seed=$seed k=$k")
    }
  }

  test("dupWindows equals an in-memory stride-1 seen-set scan on " +
    "random corpora") {
    val alpha = Vector("x", "y", "z")
    for (seed <- 1 to 8) {
      val rnd = new Random(seed)
      val docs = (0 until 20).map { i =>
        val n = 1 + rnd.nextInt(9)
        (i.toLong, (0 until n).map(_ => alpha(rnd.nextInt(alpha.size)))
          .mkString(" "))
      }
      val w = 1 + rnd.nextInt(3)
      val got = graft.ext.Dedup.dupWindows(
          docs.toDF("doc_id", "text").repartition(4), "doc_id", "text", w)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      val seen = scala.collection.mutable.Set[String]()
      val want = docs.map { case (id, text) =>
        val toks = text.trim.toLowerCase.split(" +").toSeq
        val wins = (0 to math.max(toks.size - w, 0))
          .map(i => toks.slice(i, i + w).mkString(" "))
        val dup = wins.count { s =>
          if (seen(s)) true else { seen += s; false }
        }
        id -> ((wins.size.toLong, dup.toLong))
      }.toMap
      assert(got == want, s"seed=$seed w=$w")
    }
  }

  test("sourcePrefix's LCP(min,max) trick equals the direct all-docs " +
    "fold on random groups") {
    val pieces = Vector("", "ab", "abc", "abd", "ax", "b")
    for (seed <- 1 to 10) {
      val rnd = new Random(seed)
      val docs = (0 until 30).map { i =>
        val src = s"s${rnd.nextInt(5)}"
        // shared-ish prefixes with random tails so LCPs land anywhere
        val text = pieces(rnd.nextInt(pieces.size)) +
          pieces(rnd.nextInt(pieces.size)) +
          (if (rnd.nextBoolean()) rnd.nextInt(10).toString else "")
        (i.toLong, text, src)
      }
      val got = graft.ext.TextOps.sourcePrefix(
          docs.toDF("doc_id", "text", "source").repartition(4),
          "doc_id", "text", "source")
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
          r.getString(3))))
        .toMap
      def lcp2(a: String, b: String): String =
        a.zip(b).takeWhile { case (x, y) => x == y }.map(_._1).mkString
      val want = docs.groupBy(_._3).map { case (src, rows) =>
        val p = rows.map(_._2).reduce(lcp2)
        src -> ((rows.size.toLong, p.length.toLong, p))
      }
      assert(got == want, s"seed=$seed")
    }
  }

  test("funnel equals an in-memory event-sequence scan on random streams") {
    val steps = Seq("a", "b", "c")
    for (seed <- 1 to 6) {
      val rnd = new Random(seed)
      val types = Vector("a", "b", "c", "x")
      val events = (0 until 120).map { i =>
        (rnd.nextInt(8).toLong, types(rnd.nextInt(types.size)),
          new java.sql.Timestamp(rnd.nextInt(100000) * 1000L + i))
      }
      val got = Analytics.funnel(
        events.toDF("user_id", "event_type", "ts"),
        "user_id", "event_type", "ts", steps)
        .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
      // independent reimplementation: for each user, walk steps taking the
      // earliest event of the step strictly after the previous step's time
      val want = events.groupBy(_._1).map { case (u, evs) =>
        var t = Long.MinValue
        var n = 0L
        var stop = false
        for (st <- steps if !stop) {
          val cand = evs.filter(e => e._2 == st && e._3.getTime * 1000L > t)
          if (cand.isEmpty) stop = true
          else { t = cand.map(_._3.getTime * 1000L).min; n += 1 }
        }
        u -> n
      }
      assert(got == want, s"seed=$seed")
    }
  }

  test("packChunks equals an in-memory running layout on random groups") {
    for (seed <- 1 to 6) {
      val rnd = new Random(seed)
      val rows = (0 until 50).map { i =>
        (s"g${rnd.nextInt(4)}", i.toLong, 1 + rnd.nextInt(900))
      }
      val budget = 1000
      val got = Sampling.packChunks(rows.toDF("g", "id", "n"), "g", "id", "n", budget)
        .collect().map(r => ((r.getString(0), r.getLong(1)),
          (r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
      val want = rows.groupBy(_._1).flatMap { case (g, rs) =>
        var cum = 0L
        rs.sortBy(_._2).map { case (_, id, n) =>
          val start = cum
          cum += n
          (g, id) -> ((start / budget, start % budget,
            start % budget + n > budget))
        }
      }
      assert(got == want.toMap, s"seed=$seed")
    }
  }

  test("rankByValue equals in-memory sort rank on random skewed frames") {
    for (seed <- 1 to 6) {
      val rnd = new Random(seed)
      // heavy ties: values drawn from a tiny domain
      val rows = (0 until 200).map(i => (i.toLong, rnd.nextInt(5)))
      val got = Sampling.rankByValue(rows.toDF("k", "v"), "v", "k")
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val want = rows.sortBy { case (k, v) => (v, md5hex(k.toString), k) }
        .zipWithIndex.map { case ((k, _), i) => k -> (i + 1).toLong }.toMap
      assert(got == want, s"seed=$seed")
    }
  }

  test("buildVocab + oovRate equal an in-memory reimplementation") {
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    for (seed <- 1 to 5) {
      val rnd = new Random(seed)
      val docs = (1L to 60L).map(i =>
        (i, Seq.fill(1 + rnd.nextInt(8))(words(rnd.nextInt(words.size)))
          .mkString(" ")))
      val df = docs.toDF("doc_id", "text")
      // in-memory vocab: counts, df, rank by (n desc, md5, token)
      val toks = docs.flatMap { case (id, t) => t.split(" +").map(id -> _) }
      val byTok = toks.groupBy(_._2)
      val stats = byTok.map { case (t, occ) =>
        t -> ((occ.size.toLong, occ.map(_._1).distinct.size.toLong)) }
      val kept = stats.filter(_._2._2 >= 2)
      val wantVocab = kept.toSeq
        .sortBy { case (t, (n, _)) => (-n, md5hex(t), t) }
        .zipWithIndex.map { case ((t, (n, d)), i) =>
          t -> ((n, d, (i + 1).toLong)) }.toMap
      val gotVocab = graft.ext.TextOps.buildVocab(df, "doc_id", "text",
        minDf = 2).collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      assert(gotVocab == wantVocab, s"seed=$seed")
      // oov against the top-3 cut
      val top3 = wantVocab.filter(_._2._3 <= 3).keySet
      val wantOov = toks.groupBy(_._1).map { case (id, ts) =>
        id -> ((ts.size.toLong, ts.count(t => !top3(t._2)).toLong)) }
      val gotOov = graft.ext.TextOps.oovRate(df, "doc_id", "text",
        graft.ext.TextOps.buildVocab(df, "doc_id", "text", minDf = 2,
          maxVocab = 3))
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2)))).toMap
      assert(gotOov == wantOov, s"seed=$seed")
    }
  }

  test("tokenBudgetSelect equals an in-memory greedy cut; budgets nest") {
    for (seed <- 1 to 6) {
      val rnd = new Random(seed)
      val rows = (0 until 80).map(i =>
        (s"s${rnd.nextInt(4)}", i.toLong, 1L + rnd.nextInt(500)))
      val df = rows.toDF("g", "id", "n")
      def inMem(budget: Long) = rows.groupBy(_._1).flatMap { case (_, rs) =>
        var cum = 0L
        rs.sortBy { case (_, id, n) => (-n, id) }.flatMap { case (_, id, n) =>
          cum += n
          if (cum <= budget) Some(id -> cum) else None
        }
      }.toMap
      for (budget <- Seq(0L, 700L, 2000L)) {
        val got = Sampling.tokenBudgetSelect(df, "g", "id", col("n"), "n",
          budget).collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
        assert(got == inMem(budget), s"seed=$seed budget=$budget")
      }
      // nesting across budgets
      val small = Sampling.tokenBudgetSelect(df, "g", "id", col("n"), "n", 700L)
        .collect().map(_.getLong(1)).toSet
      val large = Sampling.tokenBudgetSelect(df, "g", "id", col("n"), "n", 2000L)
        .collect().map(_.getLong(1)).toSet
      assert(small.subsetOf(large), s"seed=$seed budgets must nest")
    }
  }

  test("sparseCosinePairs equals an in-memory weighted-cosine scan") {
    val words = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    for (seed <- 1 to 6) {
      val rnd = new Random(seed)
      val docs = (1L to 20L).map(i =>
        (i, (0 until 3 + rnd.nextInt(8))
          .map(_ => words(rnd.nextInt(words.size))).mkString(" ")))
      val got = graft.ext.TextOps.sparseCosinePairs(
          docs.toDF("doc_id", "text"), "doc_id", "text",
          maxDfFrac = 0.6, idfCap = 16L)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      // independent reimplementation of the exact integer contract
      val tf = docs.flatMap { case (id, t) =>
        t.split(" +").filter(_.nonEmpty).groupBy(identity)
          .map { case (w, o) => (id, w, o.length.toLong) } }
      val nDocs = tf.map(_._1).distinct.size
      val dfs = tf.groupBy(_._2).map { case (w, rs) => w -> rs.size.toLong }
      val w8 = tf.collect { case (id, w, f) if dfs(w) <= 0.6 * nDocs =>
        (id, w, f * math.min(nDocs / dfs(w), 16L)) }
      val byDoc = w8.groupBy(_._1)
        .map { case (id, rs) => id -> rs.map(r => r._2 -> r._3).toMap }
      val n2 = byDoc.map { case (id, m) =>
        id -> m.values.map(v => v * v).sum }
      val want = (for {
        a <- byDoc.keys; b <- byDoc.keys if b > a
        dot = byDoc(a).keySet.intersect(byDoc(b).keySet).toSeq
          .map(k => byDoc(a)(k) * byDoc(b)(k)).sum
        if dot > 0 && BigInt(dot) * dot * 4 >= BigInt(n2(a)) * n2(b)
      } yield (a, b) -> ((dot, n2(a), n2(b)))).toMap
      assert(got == want, s"seed=$seed")
    }
  }

  test("heavyHitters equals in-memory counts; CMS bound always holds") {
    val words = Vector("x", "y", "z", "w", "v", "u")
    for (seed <- 1 to 6) {
      val rnd = new Random(seed)
      val docs = (1L to 15L).map(i =>
        (i, (0 until 1 + rnd.nextInt(20))
          .map(_ => words(rnd.nextInt(words.size))).mkString(" ")))
      val k = 1 + rnd.nextInt(6)
      val got = graft.ext.TextOps.heavyHitters(
          docs.toDF("doc_id", "text"), "doc_id", "text", k)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
      val counts = docs.flatMap(_._2.split(" +").filter(_.nonEmpty))
        .groupBy(identity).map { case (w, o) => (w, o.length.toLong) }
      val want = counts.toSeq.sortBy { case (w, n) => (-n, w) }.take(k)
      assert(got.map(t => (t._1, t._2)).sortBy(t => (-t._2, t._1)).toSeq
        == want, s"seed=$seed k=$k")
      assert(got.forall(_._3), s"seed=$seed CMS bound violated")
    }
  }

  test("gramMatrix equals an in-memory BigDecimal outer-product sum") {
    for (seed <- 1 to 6) {
      val rnd = new Random(seed)
      val d = 2 + rnd.nextInt(6)
      val vecs = (1L to (5 + rnd.nextInt(40))).map(i =>
        i -> Seq.fill(d)((rnd.nextFloat() - 0.5f) * rnd.nextInt(20)))
      val got = graft.ext.Similarity.gramMatrix(
          vecs.toDF("vec_id", "embedding"), "embedding")
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getDecimal(2), r.getLong(3))).toMap
      // independent contract: per product, widen to double, round to
      // scale 12 half-up, sum exactly. NOTE valueOf, not new BigDecimal:
      // Spark's double→decimal cast goes through the double's SHORTEST
      // decimal representation (Double.toString semantics), not the
      // exact binary expansion — rounding the exact dyadic instead
      // disagrees by 1 ulp of scale 12 on some products.
      val want = (for {
        i <- 0 until d; j <- i until d
      } yield {
        val s = vecs.map { case (_, v) =>
          java.math.BigDecimal.valueOf(v(i).toDouble * v(j).toDouble)
            .setScale(12, java.math.RoundingMode.HALF_UP)
        }.reduce(_ add _)
        (i.toLong, j.toLong) -> (s, vecs.size.toLong)
      }).toMap
      assert(got.keySet == want.keySet, s"seed=$seed d=$d")
      for (k <- want.keySet)
        assert(got(k)._2 == want(k)._2 &&
          got(k)._1.compareTo(want(k)._1) == 0,
          s"seed=$seed d=$d cell=$k got=${got(k)} want=${want(k)}")
    }
  }

  test("percentileRank equals an in-memory per-group sort across seeds") {
    for (seed <- 1 to 8) {
      val rnd = new Random(seed)
      val rows = (1L to (10 + rnd.nextInt(60))).map(i =>
        (i, s"g${rnd.nextInt(4)}", rnd.nextInt(10).toLong))
      val got = Analytics.percentileRank(
          rows.toDF("id", "grp", "v"), "grp", "v", "id")
        .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4)))
        .toMap
      val want = rows.groupBy(_._2).flatMap { case (_, g) =>
        // contract order: (value, md5(id), id) — the md5 tiebreak is what
        // lets the engine rank with no group-partitioned window
        val sorted = g.sortBy(r => (r._3, md5Hex(r._1.toString), r._1))
        sorted.zipWithIndex.map { case (r, ix) =>
          r._1 -> ((ix + 1).toLong, g.size.toLong) }
      }
      assert(got == want, s"seed=$seed")
    }
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("madByGroup equals in-memory order-statistics median/MAD across seeds") {
    for (seed <- 1 to 6) {
      val rnd = new Random(seed)
      val rows = (1L to (20 + rnd.nextInt(60))).map(i =>
        (i, s"g${rnd.nextInt(3)}", rnd.nextInt(50).toLong))
      def mid(vs: Seq[Double]): (Double, Double) = {
        val s = vs.sorted; val n = s.size
        (s((n + 1) / 2 - 1), s(n / 2))
      }
      val want = rows.groupBy(_._2).map { case (g, rs) =>
        val vs = rs.map(_._3.toDouble)
        val (lo, hi) = mid(vs)
        val med = (lo + hi) / 2
        val (ml, mh) = mid(vs.map(v => math.abs(v - med)))
        g -> (rs.size.toLong, lo, hi, med, ml, mh, (ml + mh) / 2)
      }
      val got = Analytics.madByGroup(
          rows.toDF("id", "grp", "v"), "grp", "v", "id")
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6),
          r.getDouble(7))).toMap
      assert(got == want, s"seed=$seed")
    }
  }

  test("skewGini equals the in-memory Gini/p99/max on random key skews") {
    for (seed <- 1 to 6) {
      val rnd = new Random(seed)
      // zipfish: a few hot keys, many cold ones
      val rows = (0 until (200 + rnd.nextInt(400))).map { _ =>
        val k = if (rnd.nextInt(10) < 4) rnd.nextInt(3)
                else rnd.nextInt(60)
        Tuple1(k.toLong)
      }
      val counts = rows.groupBy(_._1).values.map(_.size.toLong).toSeq.sorted
      val n = counts.size.toLong; val t = counts.sum
      val giniNum = counts.zipWithIndex.map { case (x, i) =>
        (2L * (i + 1) - n - 1) * x }.sum
      val p99 = counts(((99 * n + 99) / 100 - 1).toInt)
      val got = Analytics.skewGini(rows.toDF("k"), "k").collect().head
      assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3),
        got.getLong(4), got.getLong(5)) ==
        (n, t, giniNum, n * t, counts.max, p99), s"seed=$seed")
    }
  }

  test("bm25 equals the in-memory rational fixed-point scorer across seeds") {
    val queryTerms = Seq("alpha", "beta", "gamma")
    for (seed <- 1 to 6) {
      val rnd = new Random(seed)
      val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
      val docs = (1L to (15 + rnd.nextInt(30))).map(i =>
        i -> Seq.fill(3 + rnd.nextInt(25))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" "))
      val toks = docs.map { case (id, tx) =>
        id -> tx.trim.toLowerCase.split(" +").toSeq }
      val nd = toks.size.toLong
      val avgdl = toks.map(_._2.size.toLong).sum / nd
      val tf = toks.flatMap { case (id, ts) =>
        ts.filter(queryTerms.contains).groupBy(identity)
          .map { case (tk, g) => (id, tk, g.size.toLong) } }
      val dfm = tf.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val want = tf.groupBy(_._1).map { case (id, rs) =>
        val dl = toks.find(_._1 == id).get._2.size.toLong
        val inner = 25L + (75L * ((dl * 100L) / avgdl)) / 100L
        val score = rs.map { case (_, tk, f) =>
          val idf = ((nd - dfm(tk)) * 1000000L) / (dfm(tk) + 1L)
          (idf * f * 2200L) / (f * 1000L + 12L * inner)
        }.sum
        id -> (score, rs.size.toLong)
      }.toSeq.sortBy { case (id, (s, _)) => (-s, id) }.take(10)
      val got = graft.ext.TextOps.bm25(docs.toDF("doc_id", "text"),
          "doc_id", "text", queryTerms, 10)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toSeq
      assert(got == want, s"seed=$seed")
    }
  }

  test("rankByValueGrouped equals in-memory rank on skewed random groups") {
    for (seed <- 1 to 8) {
      val rnd = new Random(seed)
      // skew: one group holds ~70% of rows — the case the two-phase rank
      // exists for
      val rows = (1L to (40 + rnd.nextInt(80))).map { i =>
        val g = if (rnd.nextInt(10) < 7) "big" else s"g${rnd.nextInt(3)}"
        (i, g, rnd.nextInt(5).toLong)
      }
      val got = Sampling.rankByValueGrouped(
          rows.toDF("id", "grp", "v"), "grp", "v", "id")
        .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4)))
        .toMap
      val want = rows.groupBy(_._2).flatMap { case (_, g) =>
        val sorted = g.sortBy(r => (r._3, md5Hex(r._1.toString), r._1))
        sorted.zipWithIndex.map { case (r, ix) =>
          r._1 -> ((ix + 1).toLong, g.size.toLong) }
      }
      assert(got == want, s"seed=$seed")
    }
  }

  test("substringDup equals an in-memory all-windows scan with the same " +
    "content-defined selection") {
    import java.security.MessageDigest
    def md5hex(s: String): String =
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val k = 24
    for (seed <- 1 to 6) {
      val rnd = new Random(seed)
      // random docs over a tiny alphabet (shared windows arise naturally),
      // plus planted copies at shifted offsets
      val base = (1 to 10).map { i =>
        (i.toLong, (0 until 20 + rnd.nextInt(120))
          .map(_ => "ab ".charAt(rnd.nextInt(3))).mkString)
      }
      val planted = base.take(2).map { case (id, t) =>
        (id + 100, ("x" * rnd.nextInt(5)) + t) }
      val docs = base ++ planted
      // in-memory reference: every k-window, same selection rule
      val selected: Map[Long, Set[String]] = docs.map { case (id, t) =>
        id -> (if (t.length < k) Set.empty[String]
               else (0 to t.length - k).map(p => md5hex(t.substring(p, p + k)))
                 .filter(h => "048c".contains(h.charAt(31)))
                 .map(_.substring(0, 13)).toSet)
      }.toMap
      val want = docs.map { case (id, _) =>
        val mine = selected(id)
        val dup = mine.count(fp =>
          selected.exists { case (o, s) => o != id && s.contains(fp) })
        (id, mine.size.toLong, dup.toLong, if (dup > 0) 1L else 0L)
      }.toSet
      val got = graft.ext.Dedup.substringDup(
          docs.toDF("doc_id", "text"), "doc_id", "text", k)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got == want, s"seed=$seed")
    }
  }

  test("basketPairs equals an in-memory pair count on random baskets") {
    for (seed <- 1 to 6) {
      val rnd = new Random(seed)
      val rows = (0 until 200).map(_ =>
        (rnd.nextInt(25).toLong, rnd.nextInt(15).toLong))
      val byBasket = rows.distinct.groupBy(_._1).values
      val counts = byBasket.flatMap { items =>
        val is = items.map(_._2).distinct.sorted
        for (a <- is; b <- is if a < b) yield (a, b)
      }.groupBy(identity).map { case (p, g) => p -> g.size.toLong }
      val want = counts.filter(_._2 >= 2).toSeq
        .sortBy { case ((a, b), n) => (-n, a, b) }.take(10)
        .map { case ((a, b), n) => (a, b, n) }
      val got = Analytics.basketPairs(rows.toDF("b", "i"), "b", "i",
          minSupport = 2, topK = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == want, s"seed=$seed")
    }
  }

  test("exactSubstrCut equals an in-memory window-dedup + interval merge " +
    "on random corpora with injected repeated passages (X131b)") {
    val alpha = Vector("ab", "cd", "ef", "gh")
    val w = 3
    for (seed <- 1 to 8) {
      val rnd = new Random(seed)
      val nDocs = 4 + rnd.nextInt(8)
      val docs = (0 until nDocs).map { i =>
        val n = 1 + rnd.nextInt(12)
        (i.toLong,
          (0 until n).map(_ => alpha(rnd.nextInt(alpha.size))).mkString(" "))
      }.toArray
      val passage = (0 until 4 + rnd.nextInt(3))
        .map(_ => alpha(rnd.nextInt(alpha.size))).mkString(" ")
      val a = rnd.nextInt(nDocs); val b = (a + 1) % nDocs
      docs(a) = (docs(a)._1, docs(a)._2 + " " + passage)
      docs(b) = (docs(b)._1, passage + " " + docs(b)._2)

      val toks = docs.map { case (id, t) =>
        (id, t.trim.toLowerCase.split(" +", -1).toVector)
      }
      val wins = toks.flatMap { case (id, tv) =>
        val nw = math.max(tv.size - w, 0) + 1
        (0 until nw).map(i => (id, i.toLong,
          tv.slice(i, math.min(i + w, tv.size)).mkString(" "),
          tv.size.toLong))
      }
      val first = wins.groupBy(_._3)
        .map { case (k, v) => k -> v.map(x => (x._1, x._2)).min }
      val dups = wins
        .filter(x => first(x._3) != ((x._1, x._2)))
        .map(x => (x._1, x._2 + 1, math.min(x._2 + w, x._4)))
      val want = dups.groupBy(_._1).toSeq.flatMap { case (id, sp) =>
        val sorted = sp.map(x => (x._2, x._3)).sorted
        val islands = sorted.foldLeft(
            Vector.empty[(Long, Long, Long)]) { case (acc, (s, e)) =>
          acc.lastOption match {
            case Some((cs, ce, cn)) if s <= ce + 1 =>
              acc.init :+ ((cs, math.max(ce, e), cn + 1))
            case _ => acc :+ ((s, e, 1L))
          }
        }
        islands.map { case (s, e, n) => (id, s, e, e - s + 1, n) }
      }.sortBy(x => (x._1, x._2))
      val got = graft.ext.Dedup.exactSubstrCut(
          docs.toSeq.toDF("doc_id", "text"), "doc_id", "text", w)
        .orderBy("doc_id", "span_start")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSeq
      assert(got == want, s"seed=$seed docs=${docs.toSeq}")
      assert(want.nonEmpty, s"seed=$seed: vacuous fixture")
    }
  }

  test("moreLikeThis equals the literal-terms bm25 operator run with its " +
    "own fitted term list (X138)") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val qid = 42L
    // in-memory replication of the term fit: tf of doc 42, global df,
    // stopword cap, (tf desc, df asc, tok asc) top-5
    val rows = docs.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val tokLists = rows.map { case (id, t) =>
      id -> t.trim.toLowerCase.split(" +", -1).toSeq }
    val tf0 = tokLists.flatMap { case (id, ts) =>
      ts.groupBy(identity).map { case (tok, g) => (id, tok, g.size) } }
    val dfm = tf0.groupBy(_._2).map { case (tok, g) => tok -> g.size }
    val nDocs = tokLists.size
    val fitted = tf0.filter(_._1 == qid)
      .filter { case (_, tok, _) => dfm(tok) <= 0.8 * nDocs }
      .sortBy { case (_, tok, tfv) => (-tfv, dfm(tok), tok) }
      .take(5).map(_._2)
    val mlt = graft.ext.TextOps.moreLikeThis(docs, "doc_id", "text",
        qid, m = 5, k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val viaLiteral = graft.ext.TextOps.bm25(docs, "doc_id", "text",
        fitted, k = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(_._1 != qid).take(8).toSeq
    assert(mlt == viaLiteral)
    assert(mlt.nonEmpty, "vacuous")
  }

  test("exactSubstrApply removes exactly the covered positions and " +
    "reassembles survivors in order (X131c)") {
    val alpha = Vector("ab", "cd", "ef", "gh")
    val w = 3
    for (seed <- 1 to 6) {
      val rnd = new Random(seed)
      val nDocs = 4 + rnd.nextInt(6)
      val docs = (0 until nDocs).map { i =>
        val n = 1 + rnd.nextInt(12)
        (i.toLong,
          (0 until n).map(_ => alpha(rnd.nextInt(alpha.size))).mkString(" "))
      }.toArray
      val passage = (0 until 5).map(_ => alpha(rnd.nextInt(alpha.size)))
        .mkString(" ")
      docs(0) = (docs(0)._1, docs(0)._2 + " " + passage)
      docs(1) = (docs(1)._1, passage + " " + docs(1)._2)
      // a twin pair: the later twin must be fully cuttable when short
      docs(2) = (docs(2)._1, passage)
      docs(3) = (docs(3)._1, passage)

      val toks = docs.map { case (id, t) =>
        (id, t.trim.toLowerCase.split(" +", -1).toVector)
      }
      val wins = toks.flatMap { case (id, tv) =>
        val nw = math.max(tv.size - w, 0) + 1
        (0 until nw).map(i => (id, i.toLong,
          tv.slice(i, math.min(i + w, tv.size)).mkString(" "),
          tv.size.toLong))
      }
      val first = wins.groupBy(_._3)
        .map { case (k, v) => k -> v.map(x => (x._1, x._2)).min }
      val covByDoc = wins
        .filter(x => first(x._3) != ((x._1, x._2)))
        .groupBy(_._1)
        .map { case (id, xs) =>
          id -> xs.flatMap(x =>
            (x._2 + 1) to math.min(x._2 + w, x._4)).toSet }
      val want = toks.map { case (id, tv) =>
        val cov = covByDoc.getOrElse(id, Set.empty[Long])
        val kept = tv.zipWithIndex.collect {
          case (tk, i) if !cov((i + 1).toLong) => tk }
        (id, tv.size.toLong, (tv.size - kept.size).toLong,
          md5hex(kept.mkString(" ")))
      }.sortBy(_._1).toSeq
      val got = graft.ext.Dedup.exactSubstrApply(
          docs.toSeq.toDF("doc_id", "text"), "doc_id", "text", w)
        .orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3))).toSeq
      assert(got == want, s"seed=$seed docs=${docs.toSeq}")
      // the later twin of the identical pair is fully cut
      assert(want.exists { case (_, n, rm, _) => n == rm && n > 0 },
        s"seed=$seed: no fully-cut doc in fixture")
    }
  }

  test("waterFill equals an in-memory water-filling allocation on random " +
    "group sizes and budgets; totals always clear min(B, sum) (X137)") {
    for (seed <- 1 to 10) {
      val rnd = new Random(seed)
      val nGroups = 2 + rnd.nextInt(8)
      val avails = (0 until nGroups).map(g =>
        (s"g$g", 1L + rnd.nextInt(30).toLong))
      val rows = avails.flatMap { case (g, a) =>
        (0L until a).map(i => (g, i)) }
      val budget = rnd.nextInt(1 + 2 * rows.size).toLong
      // in-memory re-derivation of the capped-prefix + remainder rule
      val sorted = avails.sortBy { case (g, a) => (a, g) }
      val n = sorted.size
      var p = 0L
      val capped = sorted.zipWithIndex.map { case ((g, a), idx) =>
        val c = a * (n - idx) <= budget - p
        p += a
        ((g, a), c)
      }
      val k = capped.count(_._2)
      val pk = capped.filter(_._2).map(_._1._2).sum
      val m = n - k; val r = budget - pk
      val want = capped.zipWithIndex.map { case (((g, a), c), idx) =>
        val alloc =
          if (c) a else r / m + (if (idx + 1 - k <= r % m) 1L else 0L)
        (g, a, alloc)
      }.sortBy(_._1)
      val got = Sampling.waterFill(rows.toDF("source", "i"), "source",
          budget)
        .orderBy("group").collect()
        .map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSeq
      assert(got == want, s"seed=$seed budget=$budget avails=$avails")
      assert(got.map(_._3).sum == math.min(budget, rows.size.toLong),
        s"seed=$seed: budget not cleared")
      assert(got.forall { case (_, a, al) => al >= 0 && al <= a },
        s"seed=$seed: allocation out of range")
    }
  }

  test("blocklistHits equals in-memory replace-counting on random " +
    "corpora and patterns crossing token boundaries (X135)") {
    val alpha = Vector("ab", "cd", "ef", "gh")
    for (seed <- 1 to 8) {
      val rnd = new Random(seed)
      val docs = (0 until 12).map { i =>
        val n = 1 + rnd.nextInt(10)
        (i.toLong,
          (0 until n).map(_ => alpha(rnd.nextInt(alpha.size))).mkString(" "))
      }
      // substring patterns incl. ones crossing token boundaries ("b c")
      val pats = Seq("ab", "b c", "cd ef", "zz", "ef g")
      val want = (for {
        (id, t) <- docs
        x = t.trim.toLowerCase
        p <- pats.sorted
        nOcc = (x.length - x.replace(p, "").length) / p.length
        if nOcc > 0
      } yield (id, p, nOcc.toLong, (x.indexOf(p) + 1).toLong))
        .sortBy(x => (x._1, x._2))
      val got = graft.ext.TextOps.blocklistHits(
          docs.toDF("doc_id", "text"), "doc_id", "text", pats)
        .orderBy("doc_id", "pattern")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3))).toSeq
      assert(got == want, s"seed=$seed")
      assert(want.nonEmpty, s"seed=$seed: vacuous fixture")
    }
  }
}
