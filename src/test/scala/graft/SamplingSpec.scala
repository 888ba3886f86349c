package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Sampling

class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("hashSample is deterministic and layout-independent") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val a = Sampling.hashSample(docs, "doc_id", 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(docs.repartition(13), "doc_id", 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b, "sample must not depend on physical layout")
    val n = docs.count().toDouble
    assert(a.size > n * 0.04 && a.size < n * 0.2,
      s"10% bucket sample wildly off: ${a.size}/$n")
    // 0% and 100% degenerate correctly
    assert(Sampling.hashSample(docs, "doc_id", 0).isEmpty)
    assert(Sampling.hashSample(docs, "doc_id", 100).count() == docs.count())
  }

  test("weightedSample: exact budget, nesting, layout independence, weight bias") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val s100 = Sampling.weightedSample(docs, "doc_id", col("n_chars"), 100)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s100.size == 100, "budget is exact")
    // layout independence (no rand(), priority is pure f(key, weight))
    val s100b = Sampling.weightedSample(docs.repartition(13), "doc_id",
      col("n_chars"), 100).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s100 == s100b)
    // budgets nest: the priority order is fixed
    val s50 = Sampling.weightedSample(docs, "doc_id", col("n_chars"), 50)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s50.subsetOf(s100), "top-50 must be inside top-100")
    // inclusion tracks weight: the sampled mean weight must exceed the
    // corpus mean (π_i ∝ w_i); a uniform sampler would match it
    val corpusMean = docs.agg(avg(col("n_chars"))).collect().head.getDouble(0)
    val sampleMean = docs.where(col("doc_id").isInCollection(s100))
      .agg(avg(col("n_chars"))).collect().head.getDouble(0)
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean not above corpus mean $corpusMean")
    // zero/negative weights are excluded, not sampled or crashed on
    val withZero = docs.withColumn("w",
      when(col("doc_id") < 5, lit(0)).otherwise(col("n_chars")))
    val sz = Sampling.weightedSample(withZero, "doc_id", col("w"), 100)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sz.intersect((0L until 5L).toSet).isEmpty)
    assert(sz.size == 100)
  }

  test("sqrtMixtureSample: exact total budget, sqrt-flattened mixture, determinism") {
    import spark.implicits._
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val out = Sampling.sqrtMixtureSample(docs, "lang", "doc_id", 100)
      .select("doc_id", "lang").collect()
    assert(out.length == 100, "all strata are larger than their allocation here")
    // flattening: a skewed corpus must come out LESS skewed than raw
    // proportional sampling — per-stratum shares track sqrt(count)
    val skewed = docs.withColumn("lang",
      when(col("doc_id") % 10 < 8, lit("big")).otherwise(col("lang")))
    val shares = Sampling.sqrtMixtureSample(skewed, "lang", "doc_id", 100)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val bigN = skewed.where(col("lang") === "big").count().toDouble
    val rawShare = bigN / skewed.count().toDouble        // ~0.8
    val bigShare = shares("big").toDouble / 100.0
    assert(bigShare < rawShare,
      s"sqrt mixing must flatten: big got $bigShare vs raw $rawShare")
    assert(bigShare > 1.0 / shares.size,
      "but the big stratum must still be over-represented vs uniform")
    // deterministic under repartitioning
    val again = Sampling.sqrtMixtureSample(docs.repartition(13), "lang", "doc_id", 100)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == out.map(_.getLong(0)).toSet)
    // a stratum smaller than its allocation yields what it has
    val tiny = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("doc_id", "lang")
    val t = Sampling.sqrtMixtureSample(tiny, "lang", "doc_id", 100)
    assert(t.count() == 3)
  }

  test("weightedSample and sqrtMixtureSample exclude NULL keys/strata") {
    import spark.implicits._
    // NULL key: Spark sorts NULLs first, SQL engines last — a null key
    // reaching the ranking would desync the engines; it must be filtered
    val withNullKey = Seq(
      (Some(1L), "en", 10), (Some(2L), "en", 20), (None, "en", 99999),
      (Some(3L), "de", 30))
      .toDF("doc_id", "lang", "n_chars")
    val ws = Sampling.weightedSample(withNullKey, "doc_id", col("n_chars"), 2)
      .collect()
    assert(ws.length == 2 && ws.forall(!_.isNullAt(0)),
      "null key must never occupy a budget slot")
    // NULL stratum: must neither NPE the driver-side budget sort (>= 2
    // strata) nor silently produce an empty sample (1 stratum)
    val withNullStrata = Seq(
      (1L, Some("en")), (2L, Some("en")), (3L, None), (4L, Some("de")))
      .toDF("doc_id", "lang")
    val ms = Sampling.sqrtMixtureSample(withNullStrata, "lang", "doc_id", 10)
      .collect()
    assert(ms.length == 3 && ms.forall(!_.isNullAt(1)),
      "null-stratum rows are excluded, non-null strata sampled in full")
    val onlyNull = Seq((1L, Option.empty[String]), (2L, None))
      .toDF("doc_id", "lang")
    assert(Sampling.sqrtMixtureSample(onlyNull, "lang", "doc_id", 10).count() == 0)
  }

  test("stratifiedSample: per-stratum rates, nesting, default rate") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val s10 = Sampling.stratifiedSample(docs, "lang", "doc_id",
      Seq("en" -> 10), defaultPct = 0)
    val s30 = Sampling.stratifiedSample(docs, "lang", "doc_id",
      Seq("en" -> 30), defaultPct = 0)
    val ids10 = s10.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids30 = s30.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids10.subsetOf(ids30),
      "raising a stratum's rate must keep the smaller sample nested inside")
    assert(s10.where(col("lang") =!= "en").count() == 0,
      "defaultPct=0 must drop unlisted strata entirely")
    // a listed stratum at 100 keeps every row of that stratum
    val all = Sampling.stratifiedSample(docs, "lang", "doc_id",
      Seq("en" -> 100), defaultPct = 0)
    assert(all.count() == docs.where(col("lang") === "en").count())
  }

  test("packChunks: chunks fill in order, offsets advance, straddles flagged") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 600), ("a", 2L, 300), ("a", 3L, 200), ("a", 4L, 500),
      ("b", 1L, 1100))
      .toDF("src", "id", "n")
    val out = Sampling.packChunks(df, "src", "id", "n", budget = 1000)
      .orderBy("src", "id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    assert(out.toSeq == Seq(
      // a: starts 0, 600, 900, 1100 → chunks 0,0,0,1; 900+200>1000 straddles
      ("a", 1L, 0L, 0L, false),
      ("a", 2L, 0L, 600L, false),
      ("a", 3L, 0L, 900L, true),
      ("a", 4L, 1L, 100L, false),
      // b: independent stream; 1100 > budget straddles its own chunk
      ("b", 1L, 0L, 0L, true)))
  }

  test("capPerGroup: cap honored, keepers nest, small groups untouched") {
    import spark.implicits._
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val c10 = Sampling.capPerGroup(docs, "source", "doc_id", 10)
    val byGroup = c10.groupBy("source").count().collect()
    assert(byGroup.forall(_.getLong(1) <= 10), "a group exceeded its cap")
    // nesting: tightening the cap never resurrects a dropped row
    val ids5 = Sampling.capPerGroup(docs, "source", "doc_id", 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val ids10 = c10.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids5.subsetOf(ids10))
    // deterministic under repartitioning
    val again = Sampling.capPerGroup(docs.repartition(13), "source", "doc_id", 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == ids10)
    // a group under the cap keeps all rows; NULL group is its own group
    val tiny = Seq((1L, Some("a")), (2L, Some("a")), (3L, None), (4L, None),
      (5L, None)).toDF("doc_id", "src")
    val t2 = Sampling.capPerGroup(tiny, "src", "doc_id", 2)
    assert(t2.where(col("src") === "a").count() == 2)
    assert(t2.where(col("src").isNull).count() == 2,
      "null group must be capped as its own group, not dropped")
  }

  test("epochRepeat: deterministic epochs, fractional rate, zero drops") {
    import spark.implicits._
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    // integer factor: exactly N epochs per row
    val x2 = Sampling.epochRepeat(docs, "doc_id", lit(2.0))
    assert(x2.count() == docs.count() * 2)
    assert(x2.groupBy("doc_id").count().collect().forall(_.getLong(1) == 2))
    // fractional factor: mean repeats ~ factor, each row floor or floor+1
    val x15 = Sampling.epochRepeat(docs, "doc_id", lit(1.5))
      .groupBy("doc_id").count().collect().map(_.getLong(1))
    assert(x15.forall(n => n == 1 || n == 2))
    val mean = x15.sum.toDouble / x15.length
    assert(mean > 1.3 && mean < 1.7, s"mean repeats $mean far from 1.5")
    // zero / null factors drop the row
    assert(Sampling.epochRepeat(docs, "doc_id", lit(0.0)).count() == 0)
    assert(Sampling.epochRepeat(docs, "doc_id",
      lit(null).cast("double")).count() == 0)
    // deterministic under repartitioning
    val a = Sampling.epochRepeat(docs, "doc_id", lit(0.3))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.epochRepeat(docs.repartition(13), "doc_id", lit(0.3))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("splitLeakage: reports exactly the cross-split pairs") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (1L, 3L), (4L, 5L)).toDF("da", "db")
    val assign = Seq((1L, "train"), (2L, "train"), (3L, "test"),
      (4L, "valid"), (5L, "test")).toDF("doc_id", "split")
    val out = Sampling.splitLeakage(pairs, "da", "db", assign, "doc_id", "split")
      .orderBy("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    assert(out.toSeq == Seq((1L, 3L, "train", "test"),
      (4L, 5L, "valid", "test")))
    // grouped assignment (splitAssign on the pair-connected group key)
    // produces zero leakage by construction when pairs stay within groups
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val asg = Sampling.splitAssign(docs, "source",
      Seq(("train", 80), ("valid", 10), ("test", 10)))
    val sameSource = docs.as("x").join(docs.as("y"),
        col("x.source") === col("y.source") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("da"), col("y.doc_id").as("db")).limit(500)
    assert(Sampling.splitLeakage(sameSource, "da", "db", asg,
      "doc_id", "split").count() == 0)
  }

  test("splitAssign never splits a group across splits; weights are honored") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val assigned = Sampling.splitAssign(docs, "source",
      Seq(("train", 80), ("valid", 10), ("test", 10)))
    val groupSplits = assigned.groupBy("source")
      .agg(countDistinct(col("split")).as("k"))
      .where(col("k") > 1).count()
    assert(groupSplits == 0, "a group leaked across splits")
    val bySplit = assigned.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet.subsetOf(Set("train", "valid", "test")))
    assert(bySplit.getOrElse("train", 0L) > bySplit.getOrElse("test", 0L),
      s"80/10/10 weights not reflected: $bySplit")
    // NULL group → NULL split (unassigned), never a spurious bucket — the
    // oracles spell the last CASE arm explicitly instead of ELSE so both
    // engines agree on this
    import spark.implicits._
    val withNull = Seq((1L, Some("s")), (2L, None)).toDF("doc_id", "source")
    val rows = Sampling.splitAssign(withNull, "source",
      Seq(("train", 80), ("valid", 10), ("test", 10)))
      .orderBy("doc_id").collect()
    assert(!rows(0).isNullAt(2) && rows(1).isNullAt(2),
      "null source must yield a null split")
  }

  test("shuffleOrder: bijective permutation equal to the one-window rank") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val n = docs.count()
    val got = Sampling.shuffleOrder(docs, "doc_id", "epoch0")
      .select("doc_id", "pos").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // positions are exactly 1..n (bijection — no gaps, no dups)
    assert(got.values.toSeq.sorted == (1L to n).toSeq)
    // two-phase bucket rank must equal the naive single-window rank
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(md5(concat_ws(":", lit("epoch0"),
        col("doc_id").cast("string"))).asc, col("doc_id").asc)
    val naive = docs.select(col("doc_id"),
      row_number().over(w).cast("long").as("pos"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == naive, "bucket rank diverged from the global-window rank")
    // a different seed is a different permutation
    val other = Sampling.shuffleOrder(docs, "doc_id", "epoch1")
      .select("doc_id", "pos").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(other != got)
    // layout independence
    val re = Sampling.shuffleOrder(docs.repartition(13), "doc_id", "epoch0")
      .select("doc_id", "pos").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(re == got)
  }

  test("rankByValue equals the one-window rank; skewed values split buckets") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val got = Sampling.rankByValue(docs, "n_chars", "doc_id")
      .select("doc_id", "rnk").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_chars").asc,
        md5(col("doc_id").cast("string")).asc, col("doc_id").asc)
    val naive = docs.select(col("doc_id"),
      row_number().over(w).cast("long").as("rnk"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == naive)
    // a single shared value (total skew) still yields an exact 1..n rank
    import spark.implicits._
    val skew = (1L to 1000L).map(i => (i, 7)).toDF("k", "v")
    val ranks = Sampling.rankByValue(skew, "v", "k")
      .select("rnk").collect().map(_.getLong(0)).sorted
    assert(ranks.toSeq == (1L to 1000L))
  }

  test("lengthBuckets: ladder fit, overflow, integer padding accounting") {
    import spark.implicits._
    val df = Seq(10L, 64L, 65L, 100L, 600L).toDF("n_tok")
    val got = Sampling.lengthBuckets(df, "n_tok", Seq(64, 128, 256, 512))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(
      64L -> ((2L, 74L, 54L)),   // 10 and 64: padding 54 + 0
      128L -> ((2L, 165L, 91L)), // 65 and 100: padding 63 + 28
      -1L -> ((1L, 600L, 0L))))  // overflow counts no padding
  }

  test("interleave: every prefix holds each source proportionally") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val rows = Sampling.interleave(docs, "source", "doc_id")
      .select("source", "ikey", "doc_id")
      .orderBy("ikey", "source", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val total = rows.length
    val perSource = rows.groupBy(_._1).view.mapValues(_.length).toMap
    // Bresenham guarantee: after any prefix of length p, each source has
    // emitted floor/ceil of its fair share p * n_s / total (±1 slack for
    // equal-ikey tiebreak runs among same-size sources)
    val seen = collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    rows.zipWithIndex.foreach { case ((src, _), idx) =>
      seen(src) += 1
      val p = idx + 1
      perSource.foreach { case (s, ns) =>
        val fair = p.toDouble * ns / total
        assert(math.abs(seen(s) - fair) <= 2,
          s"source $s drifted to ${seen(s)} after $p (fair $fair)")
      }
    }
    // ikey is the integer-exact rational: spot-check first/last per source
    perSource.foreach { case (s, ns) =>
      val keys = rows.filter(_._1 == s).map(_._2)
      assert(keys.head == (BigInt(1) * (1L << 40) / (2 * ns)).toLong)
      assert(keys.last ==
        (BigInt(2 * ns - 1) * (1L << 40) / (2 * ns)).toLong)
    }
  }

  test("negativeSamples: no self-pairs, k per anchor, partition-stable") {
    import spark.implicits._
    val docs = (1L to 60L).toDF("doc_id")
    val got = graft.ext.Sampling.negativeSamples(docs, "doc_id", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 180, "every anchor gets exactly k slots")
    assert(got.forall { case (a, _, n) => a != n }, "self-pair impossible")
    assert(got.map(t => (t._1, t._2)).distinct.length == 180)
    // negatives spread over the corpus, not collapsed on a few ranks
    assert(got.map(_._3).distinct.length > 30)
    val again = graft.ext.Sampling
      .negativeSamples(docs.repartition(7), "doc_id", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.sorted.toSeq == got.sorted.toSeq, "determinism")
    // a 1-doc corpus has no valid negative — empty, not a crash
    assert(graft.ext.Sampling.negativeSamples(Seq(7L).toDF("doc_id"),
      "doc_id", k = 2).count() == 0L)
  }

  test("topPMassCut: minimal covering prefix, crossing row kept, p-nesting") {
    import spark.implicits._
    // group g: weights 50, 30, 20 (total 100)
    val df = Seq(("g", 1L, 50L), ("g", 2L, 30L), ("g", 3L, 20L),
      ("h", 9L, 10L))
      .toDF("src", "id", "w")
    def ids(num: Long, den: Long) =
      graft.ext.Sampling.topPMassCut(df, "src", "id", "w", num, den)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // p=0.5: row 1 (mass 50 ≥ 50) alone covers — crossing row included
    assert(ids(1, 2) == Set(("g", 1L), ("h", 9L)))
    // p=0.51: needs rows 1+2
    assert(ids(51, 100) == Set(("g", 1L), ("g", 2L), ("h", 9L)))
    // p=0.81: needs all three
    assert(ids(81, 100) == Set(("g", 1L), ("g", 2L), ("g", 3L), ("h", 9L)))
    // p=0 keeps nothing; p=1 keeps everything; selection nests in p
    assert(ids(0, 1).isEmpty && ids(1, 1).size == 4)
    assert(ids(1, 2).subsetOf(ids(51, 100)) &&
      ids(51, 100).subsetOf(ids(81, 100)))
  }

  test("preferencePairs: invariants, crossing guard, degenerate groups") {
    import spark.implicits._
    // group a: 5 docs, distinct scores → 2 pairs (2·3 > 5 stops pair 3)
    // group b: 2 docs               → exactly 1 pair
    // group c: 1 doc                → no pair (2·1 > 1)
    // group d: 4 docs, ALL scores equal → pairs exist, margin 0, ends
    //          distinct via the mirrored tie-break
    val df = Seq(
      ("a", 1L, 50L), ("a", 2L, 40L), ("a", 3L, 30L), ("a", 4L, 20L),
      ("a", 5L, 10L),
      ("b", 10L, 7L), ("b", 11L, 3L),
      ("c", 20L, 5L),
      ("d", 30L, 9L), ("d", 31L, 9L), ("d", 32L, 9L), ("d", 33L, 9L)
    ).toDF("g", "id", "s")
    val out = Sampling.preferencePairs(df, "g", "id", "s", k = 5)
      .orderBy("g", "pair_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.count(_._1 == "a") == 2 && out.count(_._1 == "b") == 1 &&
      out.count(_._1 == "c") == 0 && out.count(_._1 == "d") == 2,
      s"pair counts off: ${out.mkString(", ")}")
    assert(out.forall(p => p._3 != p._4), "chosen must differ from rejected")
    assert(out.forall(_._5 >= 0L), "margin must be non-negative")
    // group a pair 1 = (best, worst); pair 2 = (2nd best, 2nd worst)
    assert(out.filter(_._1 == "a").toSeq ==
      Seq(("a", 1L, 1L, 5L, 40L), ("a", 2L, 2L, 4L, 20L)))
    // all-tied group d: top order id ASC, bottom order id DESC
    assert(out.filter(_._1 == "d").toSeq ==
      Seq(("d", 1L, 30L, 33L, 0L), ("d", 2L, 31L, 32L, 0L)))
    // layout independence
    val again = Sampling.preferencePairs(df.repartition(7), "g", "id", "s", 5)
      .orderBy("g", "pair_id").collect().map(r => (r.getString(0),
        r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(again.toSeq == out.toSeq, "pairs must not depend on layout")
  }

  test("dsirScore: target-token affinity orders docs; layout-independent") {
    import spark.implicits._
    // target docs use token x; background uses y; doc 5 mixes.
    // With 2 buckets the x/y tokens land in distinct md5 buckets for
    // this fixture (verified below) — x's bucket gets a high weight.
    val df = Seq(
      (1L, "x x x", true), (2L, "x x", true),
      (3L, "y y y", false), (4L, "y y y y", false),
      (5L, "x y", false), (6L, "", false)
    ).toDF("id", "text", "tgt")
    val out = Sampling.dsirScore(df, "id", "text", col("tgt"), buckets = 64)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // the empty doc has no feature mass → absent
    assert(!out.contains(6L), "token-free docs carry no score")
    assert(out(1L)._1 == 3 && out(5L)._1 == 2, "n_tokens must be exact")
    // per-token affinity: pure-x docs score strictly higher per token
    // than pure-y docs; the mixed doc lands strictly between
    def perTok(id: Long) = out(id)._2.toDouble / out(id)._1
    assert(perTok(1L) == perTok(2L), "same mix ⇒ same per-token score")
    assert(perTok(1L) > perTok(5L) && perTok(5L) > perTok(3L),
      s"target affinity must order x > mixed > y: ${out.mkString(", ")}")
    assert(perTok(3L) == perTok(4L))
    val again = Sampling.dsirScore(df.repartition(5), "id", "text",
      col("tgt"), buckets = 64)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(again == out, "scores must not depend on layout")
  }

  test("temporalSplit: gap rows belong to neither side; every entity's " +
    "sides are separated by more than the embargo; straddlers flagged") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val spark2 = spark
    import spark2.implicits._
    // boundary 10:00, embargo 2h -> test zone starts 12:00
    val df = Seq(
      (1L, 10L, ts("2024-01-10 09:00:00")), // train
      (2L, 10L, ts("2024-01-10 10:30:00")), // gap (dropped from both)
      (3L, 10L, ts("2024-01-10 12:30:00")), // test -> entity 10 straddles
      (4L, 20L, ts("2024-01-10 09:30:00")), // train only
      (5L, 30L, ts("2024-01-10 11:00:00")), // gap only
      (6L, 40L, ts("2024-01-10 09:59:59")), // train
      (7L, 40L, ts("2024-01-10 12:00:00"))  // test, no gap row -> clean
    ).toDF("event_id", "user_id", "ts")
    val out = Sampling.temporalSplit(df.repartition(3), "event_id",
      "user_id", "ts", "2024-01-10 10:00:00", embargoSeconds = 7200L)
      .collect().map(r => r.getLong(0) ->
        (r.getString(2), r.getBoolean(3))).toMap
    assert(out(1L)._1 == "train" && out(2L)._1 == "embargo" &&
      out(3L)._1 == "test")
    assert(out(5L)._1 == "embargo")
    assert(out(6L)._1 == "train" && out(7L)._1 == "test")
    // the flag: train AND test AND in-gap activity
    assert(out(1L)._2 && out(2L)._2 && out(3L)._2,
      "entity 10 must be flagged as a gap straddler on all its rows")
    assert(!out(4L)._2 && !out(5L)._2 && !out(6L)._2 && !out(7L)._2)
    // THE invariant the gap buys: last train row and first test row of
    // any entity are separated by MORE than the embargo
    val byEnt = Sampling.temporalSplit(df, "event_id", "user_id", "ts",
      "2024-01-10 10:00:00", embargoSeconds = 7200L)
      .join(df.select(col("event_id").as("id"), col("ts")), Seq("id"))
    val seps = byEnt.groupBy("entity")
      .agg(max(when(col("split") === "train", col("ts"))).as("lt"),
        min(when(col("split") === "test", col("ts"))).as("ft"))
      .where(col("lt").isNotNull && col("ft").isNotNull)
      .collect()
    assert(seps.nonEmpty)
    seps.foreach { r =>
      val gapMs = r.getTimestamp(2).getTime - r.getTimestamp(1).getTime
      assert(gapMs > 7200L * 1000,
        s"entity ${r.getLong(0)}: sides separated by only ${gapMs}ms")
    }
  }
}
