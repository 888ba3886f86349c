package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Dedup, Sampling, TextOps}

/** The round-3 training-data hygiene operators: PII redaction, repetition
  * scoring, and benchmark-contamination checking. */
class TrainingOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("redactPii counts and replaces every email, leaves clean text alone") {
    val docs = Seq(
      (1L, "mail me at alice.smith+x@corp-mail.example.com or bob@ex.org"),
      (2L, "no pii here, just an @ sign and a.dot"),
      (3L, "x@y.io x@y.io")) // duplicates both redacted
      .toDF("doc_id", "text")
    val red = TextOps.redactPii(docs, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(red(0) == ((1L, 2L, "mail me at <EMAIL> or <EMAIL>")))
    assert(red(1) == ((2L, 0L, "no pii here, just an @ sign and a.dot")))
    assert(red(2) == ((3L, 2L, "<EMAIL> <EMAIL>")))
  }

  test("repetitionRatio: repeated boilerplate scores high, prose scores 0") {
    val docs = Seq(
      (1L, "home about contact home about contact home about contact"),
      (2L, "one two three four five six seven"),
      (3L, "hi")) // < 3 tokens → no trigrams → 0
      .toDF("doc_id", "text")
    val out = TextOps.repetitionRatio(docs, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // doc 1: 7 trigrams, 3 distinct ("home about contact", "about contact
    // home", "contact home about") → 1 - 3/7
    assert(out(0) == ((1L, 7L, 3L, math.rint((1.0 - 3.0 / 7.0) * 1e6) / 1e6)))
    assert(out(1) == ((2L, 5L, 5L, 0.0)))
    assert(out(2) == ((3L, 0L, 0L, 0.0)))
  }

  test("repeatedSpans: verbatim cross-doc windows flagged, short/unique docs zero") {
    import spark.implicits._
    val boiler = "x" * 30 + "THIS LICENSE HEADER REPEATS VERBATIM ACROSS FILES " + "y" * 30
    val docs = Seq(
      (1L, boiler + " unique tail one " + "a" * 40),
      (2L, boiler + " other tail entirely " + "b" * 40), // shares the header
      (3L, "completely different prose with no overlap at all " + "c" * 60),
      (4L, "short")                                       // < windowLen
    ).toDF("doc_id", "text")
    val got = TextOps.repeatedSpans(docs, "doc_id", "text",
        windowLen = 64, stride = 16)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(1L)._2 > 0 && got(2L)._2 > 0,
      "the shared verbatim header must be flagged in both docs")
    assert(got(3L)._2 == 0, "unique prose must have no repeated windows")
    assert(got(4L) == ((0L, 0L, 0.0)), "sub-window docs yield zero windows")
    // repeated windows can never exceed total windows
    assert(got.values.forall { case (nw, nr, _) => nr <= nw })
    // within-doc repetition alone must NOT count as sharing
    val selfRep = Seq((7L, ("z" * 64) * 4), (8L, "no overlap here " + "q" * 60))
      .toDF("doc_id", "text")
    val sr = TextOps.repeatedSpans(selfRep, "doc_id", "text", 64, 16)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(sr(7L) == 0, "identical windows inside ONE doc are not cross-doc repeats")
  }

  test("mixedLanguage: chunk-level language mix, majority and tiebreak") {
    def chunk(markers: String) = markers.padTo(200, 'x') // exactly one chunk
    val en = chunk(" the cat and the dog of it ")
    val de = chunk(" der hund und die katze ")
    val docs = Seq(
      (1L, en + en + de),   // 2 en chunks + 1 de chunk
      (2L, en + en),        // uniform
      (3L, en + de),        // tie on count -> alphabetical major
      (4L, "short"))        // < one chunk, still 1 chunk
      .toDF("doc_id", "text")
    val out = TextOps.mixedLanguage(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getDouble(4)))
    assert(out(0) == ((1L, 3L, 2L, "en", 0.333333)))
    assert(out(1) == ((2L, 2L, 1L, "en", 0.0)))
    assert(out(2) == ((3L, 2L, 2L, "de", 0.5)), "count tie must break to 'de'")
    assert(out(3)._2 == 1L && out(3)._3 == 1L)
  }

  test("removeRepeatedSpans cuts shared spans; matches an in-memory reference") {
    // in-memory reference of the exact rule: windows (L=64, s=16) shared
    // by >= 2 docs are flagged at position level, overlaps merge, the doc
    // is rebuilt from the gaps
    def reference(docs: Seq[(Long, String)]): Map[Long, (String, Long)] = {
      val wins = docs.flatMap { case (id, t) =>
        (1 to t.length - 63 by 16).map(i => (id, i, t.substring(i - 1, i + 63)))
      }
      val shared = wins.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= 2).keySet
      docs.map { case (id, t) =>
        val flagged = wins.filter(w => w._1 == id && shared(w._3)).map(_._2).sorted
        val spans = flagged.foldLeft(List.empty[(Int, Int)]) {
          case (acc, i) => acc match {
            case (s0, e0) :: rest if i <= e0 => (s0, math.max(e0, i + 64)) :: rest
            case _ => (i, i + 64) :: acc
          }
        }.reverse
        val clean = {
          val (sb, pos) = spans.foldLeft((new StringBuilder, 1)) {
            case ((b, p), (s0, e0)) => (b.append(t.substring(p - 1, s0 - 1)), e0)
          }
          sb.append(t.substring(pos - 1)).toString
        }
        id -> (clean, spans.map(x => (x._2 - x._1).toLong).sum)
      }.toMap
    }
    val sharedCore = ("X" * 20) + "the exact same boilerplate navigation footer text here" +
      ("Y" * 30) // 104 chars, embedded verbatim in two docs
    val rnd = new scala.util.Random(7)
    def noise(n: Int) = rnd.alphanumeric.take(n).mkString
    val docs = Seq(
      (1L, noise(32) + sharedCore + noise(40)),  // offset 32 ≡ 0 mod 16
      (2L, noise(48) + sharedCore + noise(25)),  // offset 48 ≡ 0 mod 16
      (3L, noise(200)),                          // unique long doc
      (4L, noise(30)))                           // shorter than one window
    val df = docs.toDF("doc_id", "text")
    val out = TextOps.removeRepeatedSpans(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val ref = reference(docs)
    assert(out == ref, s"operator disagrees with reference:\n$out\nvs\n$ref")
    // sanity on the reference itself: shared docs were cut, others intact
    assert(ref(1L)._2 > 0 && ref(2L)._2 > 0)
    assert(ref(3L) == (docs(2)._2, 0L) && ref(4L) == (docs(3)._2, 0L))
    assert(!ref(1L)._1.contains("boilerplate navigation"))
    // deterministic under repartitioning
    val again = TextOps.removeRepeatedSpans(df.repartition(7), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(again == out)
    // keepOne: the smallest doc_id containing each window keeps its
    // occurrence — doc 1 survives intact, doc 2 is cut as before
    val k1 = TextOps.removeRepeatedSpans(df, "doc_id", "text", keepOne = true)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(k1(1L) == ((docs(0)._2, 0L)), "keeper doc must be untouched")
    assert(k1(2L) == ref(2L), "non-keeper still loses the shared span")
    assert(k1(3L) == ((docs(2)._2, 0L)) && k1(4L) == ((docs(3)._2, 0L)))
  }

  test("chunkText: windows cover the text, overlap exactly, tail shortens") {
    val docs = Seq((1L, "abcdefghij"), (2L, "xy"), (3L, "")).toDF("doc_id", "text")
    val out = TextOps.chunkText(docs, "doc_id", "text", size = 5, overlap = 1)
      .orderBy("doc_id", "chunk_no")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      // step 4: [0,5) [4,9) [8,10) — neighbors share exactly 1 char
      (1L, 0L, 0L, "abcde"), (1L, 1L, 4L, "efghi"), (1L, 2L, 8L, "ij"),
      (2L, 0L, 0L, "xy"),
      (3L, 0L, 0L, "")))
    // reassembling chunk steps reproduces the document (coverage, no gaps)
    val re = out.filter(_._1 == 1L).map { case (_, no, st, ch) =>
      if (no == 0) ch else ch.drop(1) }.mkString
    assert(re == "abcdefghij")
    intercept[IllegalArgumentException] {
      TextOps.chunkText(docs, "doc_id", "text", size = 5, overlap = 5)
    }
  }

  test("packChunkId round-trips in range and FAILS LOUD on overflow " +
    "(X123 guard)") {
    // largest representable pair round-trips losslessly
    val maxDoc = Long.MaxValue / 100000L - 1
    val ok = Seq((3L, 7L), (maxDoc, 99999L), (0L, 0L)).toDF("d", "c")
      .select(col("d"), col("c"),
        TextOps.packChunkId(col("d"), col("c")).as("id"))
      .select(col("d"), col("c"), expr("id div 100000").as("d2"),
        pmod(col("id"), lit(100000L)).as("c2"))
      .where(col("d2") =!= col("d") || col("c2") =!= col("c"))
    assert(ok.isEmpty, "in-range pairs must round-trip")
    // a ≥100k-chunk document must raise, not silently alias
    intercept[Exception] {
      Seq((1L, 100000L)).toDF("d", "c")
        .select(TextOps.packChunkId(col("d"), col("c"))).collect()
    }
    // a doc_id past Long.MaxValue/radix must raise, not overflow
    intercept[Exception] {
      Seq((Long.MaxValue / 100000L, 0L)).toDF("d", "c")
        .select(TextOps.packChunkId(col("d"), col("c"))).collect()
    }
    intercept[Exception] {
      Seq((-1L, 0L)).toDF("d", "c")
        .select(TextOps.packChunkId(col("d"), col("c"))).collect()
    }
  }

  test("contamination flags docs sharing trigrams with the benchmark set") {
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely unrelated text with no overlap at all"),
      (3L, "quick brown fox appears here too")) // shares "quick brown fox"
      .toDF("doc_id", "text")
    val bench = Seq((100L, "the quick brown fox jumps"))
      .toDF("doc_id", "text")
    val out = Dedup.contamination(train, bench, "doc_id", "text", minOverlap = 1)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3)))
    // doc 1 shares 3 trigrams with the benchmark, doc 3 shares 1
    assert(out.toSeq == Seq((1L, 3L, true), (2L, 0L, false), (3L, 1L, true)))
    // the benchmark probe must be a broadcast (no corpus shuffle for it)
    val plan = Dedup.contamination(train, bench, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"benchmark side must broadcast:\n$plan")
  }

  test("tokenRarity: distinct-vocabulary df facts, hand-checked") {
    import spark.implicits._
    // corpus dfs: "the"->3, "cat"->2, "sat"->1, "dog"->1, "ran"->1
    val docs = Seq(
      (1L, "the cat sat"),
      (2L, "the cat the cat"), // repeats collapse: distinct vocab {the, cat}
      (3L, "the dog ran"))
      .toDF("doc_id", "text")
    val out = TextOps.tokenRarity(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == ((3L, 1L, 3L + 2L + 1L))) // rarest: sat (df 1)
    assert(out(2L) == ((2L, 2L, 3L + 2L)))      // rarest: cat (df 2)
    assert(out(3L) == ((3L, 1L, 3L + 1L + 1L)))
  }

  test("tokenRarity agrees with an independent in-memory reimplementation") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "c", "dd", "ee", "fff", "g", "hh", "iii", "j")
    val docs = (1L to 60L).map { id =>
      id -> (0 until (1 + rnd.nextInt(12)))
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val expected = {
      val vocabOf = docs.map { case (id, t) =>
        id -> t.split(" +").map(_.toLowerCase).toSet }.toMap
      val df = vocabOf.values.flatten.groupBy(identity).map {
        case (t, occ) => t -> occ.size.toLong }
      vocabOf.map { case (id, vs) =>
        id -> ((vs.size.toLong, vs.map(df).min, vs.toSeq.map(df).sum)) }
    }
    val got = TextOps.tokenRarity(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expected)
  }

  test("bigramLm: counts, continuation mass, rank cut, deterministic ties") {
    val docs = Seq(
      (1L, "the cat sat"),
      (2L, "the cat ran"),
      (3L, "the cat sat"),
      (4L, "a dog"),
      (5L, "one")). // single token — contributes no bigram
      toDF("doc_id", "text")
    val got = TextOps.bigramLm(docs, "doc_id", "text", 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == Set(
      // head "the": only continuation "cat" (3×), mass 3
      ("the", "cat", 3L, 3L, 1L),
      // head "cat": sat 2×, ran 1× — rank by count desc then token asc
      ("cat", "sat", 2L, 3L, 1L),
      ("cat", "ran", 1L, 3L, 2L),
      ("a", "dog", 1L, 1L, 1L)))
    // topK cut: k=1 keeps only the argmax continuation per head
    val top1 = TextOps.bigramLm(docs, "doc_id", "text", 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(top1 == Set(("the", "cat"), ("cat", "sat"), ("a", "dog")))
    // tie on count breaks by token asc: "x b" and "x a" both 1× → a first
    val ties = Seq((1L, "x a"), (2L, "x b")).toDF("doc_id", "text")
    val t1 = TextOps.bigramLm(ties, "doc_id", "text", 1).collect()
    assert(t1.length == 1 && t1.head.getString(1) == "a")
  }

  test("bigramNovelty: rare-occurrence share, multiplicity, short-doc cut") {
    val docs = Seq(
      (1L, "the cat sat"),       // "the cat" 3×, "cat sat" 3× — both common
      (2L, "the cat sat"),
      (3L, "the cat sat"),
      (4L, "the cat zig zag"),   // "the cat" common; "cat zig","zig zag" rare
      (5L, "zz qq zz qq"),       // "zz qq" 2× in ONE doc (corpus n=2 -> rare),
                                 // "qq zz" 1× rare — all 3 occurrences rare
      (6L, "one")).              // single token — no bigram, no output row
      toDF("doc_id", "text")
    val got = TextOps.bigramNovelty(docs, "doc_id", "text", rareMax = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got == Set(
      (1L, 2L, 0L, 0.0), (2L, 2L, 0L, 0.0), (3L, 2L, 0L, 0.0),
      (4L, 3L, 2L, 0.666667),
      (5L, 3L, 3L, 1.0)))
  }

  test("domainMix: shares sum to 1, uniform-target weights rebalance") {
    val docs = Seq(
      (1L, "a", 600L), (2L, "a", 200L),   // domain a: 800 units
      (3L, "b", 150L), (4L, "b", 50L))    // domain b: 200 units
      .toDF("doc_id", "source", "n_chars")
    val got = graft.ext.Analytics.domainMix(docs, "source", "n_chars")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSet
    // share = units/total; weight = total/(n_domains*units): a down, b up
    assert(got == Set(
      ("a", 2L, 800L, 0.8, 0.625),
      ("b", 2L, 200L, 0.2, 2.5)))
    // rebalanced mass is uniform: weight*units equal across domains
    val w = got.map(r => r._5 * r._3)
    assert(w.size == 1 && math.abs(w.head - 500.0) < 1e-9)
  }

  test("dedupDelta: exact wins, near-dup picks best match, rest are new") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val corpus = Seq(
      (10L, base),
      (11L, base), // second identical corpus doc — keeper must be min id
      (12L, base.replace("alpha", "ALPHA2")), // near variant in corpus
      (13L, "completely different text about other things entirely " +
        "with many distinct words appearing nowhere else at all"))
      .toDF("doc_id", "text")
    val delta = Seq(
      (20L, base), // exact dup of 10/11
      (21L, base.replace("tau", "changed")), // near dup, no exact match
      (22L, "nothing shared with any corpus document whatsoever here " +
        "because every single token is novel and unrepeated today"))
      .toDF("doc_id", "text")
    val got = Dedup.dedupDelta(corpus, delta, "doc_id", "text", 0.3)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2),
          !r.isNullAt(3))).toMap
    assert(got(20L) == (("exact_dup", 10L, false)),
      s"exact dup must match min corpus id with NULL jaccard: ${got(20L)}")
    assert(got(21L)._1 == "near_dup" && got(21L)._3,
      s"edited copy must be a near_dup with a jaccard: ${got(21L)}")
    assert(Set(10L, 11L, 12L).contains(got(21L)._2))
    assert(got(22L) == (("new", -1L, false)))
    assert(got.size == 3, "one row per delta doc")
  }

  test("dedupDeltaIndexed equals dedupDelta on the fixture corpus") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val corpus = docs.where(Sampling.hashBucket(col("doc_id"), 100) >= 20)
    val delta = docs.where(Sampling.hashBucket(col("doc_id"), 100) < 20)
    def collectMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1.0 else r.getDouble(3))).toMap
    val direct = collectMap(
      Dedup.dedupDelta(corpus, delta, "doc_id", "text", 0.3, maxDf = 100))
    val index = Dedup.buildDeltaIndex(corpus, "doc_id", "text", maxDf = 100)
    try {
      val indexed = collectMap(
        Dedup.dedupDeltaIndexed(index, delta, "doc_id", "text", 0.3))
      assert(indexed == direct)
      // the index is reusable: a second (different) delta works against
      // the same cached frames
      val delta2 = docs.where(Sampling.hashBucket(col("doc_id"), 100) < 10)
      val again = collectMap(
        Dedup.dedupDeltaIndexed(index, delta2, "doc_id", "text", 0.3))
      val direct2 = collectMap(
        Dedup.dedupDelta(corpus, delta2, "doc_id", "text", 0.3, maxDf = 100))
      assert(again == direct2)
    } finally index.unpersist()
  }

  test("tokenBudgetSelect: quality order, inclusive budget, nesting") {
    val df = Seq(
      ("s1", 1L, 500L), ("s1", 2L, 400L), ("s1", 3L, 300L), ("s1", 4L, 200L),
      ("s2", 5L, 900L), ("s2", 6L, 900L), ("s2", 7L, 100L))
      .toDF("source", "doc_id", "n_chars")
    def sel(b: Long) = Sampling.tokenBudgetSelect(df, "source", "doc_id",
      col("n_chars"), "n_chars", b)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    val k1000 = sel(1000L)
    // s1 in order 500, 400, 300…: 500, 900 kept; 1200 > 1000 stops doc 3
    // s2: 900 (doc 5, tie broken by id), 1800 > 1000 stops doc 6
    assert(k1000 == Map(1L -> 500L, 2L -> 900L, 5L -> 900L))
    // budgets nest
    val k1300 = sel(1300L)
    assert(k1000.keySet.subsetOf(k1300.keySet))
    assert(k1300.keySet == Set(1L, 2L, 3L, 5L))
    // zero budget keeps nothing
    assert(sel(0L).isEmpty)
  }

  test("buildVocab: counts, df floor, deterministic ids, vocab cut") {
    val docs = Seq(
      (1L, "a a b c"),
      (2L, "a b d"),
      (3L, "a e")).toDF("doc_id", "text")
    val got = TextOps.buildVocab(docs, "doc_id", "text", minDf = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // df>=2 keeps a (n=4, df=3) and b (n=2, df=2); c/d/e are hapax
    assert(got == Map("a" -> ((4L, 3L, 1L)), "b" -> ((2L, 2L, 2L))))
    // maxVocab cuts by id
    assert(TextOps.buildVocab(docs, "doc_id", "text", minDf = 2, maxVocab = 1)
      .collect().map(_.getString(0)).toSeq == Seq("a"))
    // equal counts tie-break on md5(token) then token — pin against an
    // in-memory replay
    val ties = Seq((1L, "x y"), (2L, "y x")).toDF("doc_id", "text")
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val ids = TextOps.buildVocab(ties, "doc_id", "text", minDf = 2)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val want = Seq("x", "y").sortBy(t => (md5hex(t), t))
      .zipWithIndex.map { case (t, i) => t -> (i + 1).toLong }.toMap
    assert(ids == want)
    // empty/whitespace docs contribute no token — '' never claims an id,
    // and oovRate reports no phantom token for them
    val withEmpty = Seq((1L, "a b"), (2L, ""), (3L, "   "), (4L, "a"))
      .toDF("doc_id", "text")
    val v = TextOps.buildVocab(withEmpty, "doc_id", "text", minDf = 1)
      .collect().map(_.getString(0)).toSet
    assert(v == Set("a", "b"))
    val oov = TextOps.oovRate(withEmpty, "doc_id", "text",
      v.toSeq.toDF("token")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(oov == Map(1L -> ((2L, 0L)), 4L -> ((1L, 0L))),
      s"empty docs must not appear with phantom tokens: $oov")
  }

  test("skipgramPmi: windowed pairs, integer marginals, edge truncation") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    // window=1: pairs (a,b),(b,a),(b,c),(c,b) — each once
    val got = TextOps.skipgramPmi(docs, "doc_id", "text", window = 1,
      topK = 10).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(got == Set(
      ("a", "b", 1L, 1L, 2L, 4L), // n_a: a appears as center once
      ("b", "a", 1L, 2L, 1L, 4L),
      ("b", "c", 1L, 2L, 1L, 4L),
      ("c", "b", 1L, 1L, 2L, 4L)))
    // window=2 adds (a,c) and (c,a): 6 ordered pairs total
    val w2 = TextOps.skipgramPmi(docs, "doc_id", "text", window = 2,
      topK = 10).collect()
    assert(w2.length == 6 && w2.map(_.getLong(5)).toSet == Set(6L))
  }

  test("oovRate: per-doc totals and out-of-vocab counts") {
    val docs = Seq(
      (1L, "a a b z"),
      (2L, "q r"),
      (3L, "a")).toDF("doc_id", "text")
    val vocab = Seq("a", "b").toDF("token")
    val got = TextOps.oovRate(docs, "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(1L -> ((4L, 1L)), 2L -> ((2L, 2L)), 3L -> ((1L, 0L))))
  }

  test("dupDegree: partner counts over the pair graph, zero for clean docs") {
    val docs = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("da", "db")
    val got = Dedup.dupDegree(docs, pairs, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 0L, 5L -> 0L))
  }

  test("keywordSearch: coordination-level ranking, tf tiebreak, k boundary") {
    val docs = Seq(
      (1L, "spark join window extra words"),   // 3 distinct terms, tf 3
      (2L, "spark spark spark spark"),         // 1 distinct term, tf 4
      (3L, "join window join"),                // 2 distinct, tf 3
      (4L, "window join other"),               // 2 distinct, tf 2
      (5L, "nothing relevant here"),           // 0 — must not appear
      (6L, "SPARK Join")                       // case-folded: 2 distinct, tf 2
    ).toDF("doc_id", "text")
    val got = TextOps.keywordSearch(docs, "doc_id", "text",
        Seq("spark", "join", "window"), k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // order: (n_terms desc, total_tf desc, doc_id asc); doc 4 vs 6 tie on
    // (2, 2) → doc_id breaks it; doc 2 (1 term) falls off at k=4
    assert(got.toSeq == Seq((1L, 3L, 3L), (3L, 2L, 3L), (4L, 2L, 2L),
      (6L, 2L, 2L)))
  }

  test("percolate: every-term conjunction per stored query, duplicate " +
    "tokens collapse, empty term set never fires (X129)") {
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha alpha beta"), // duplicate tokens count once
      (3L, "beta gamma"),
      (4L, "ALPHA Beta"),       // case-folded match
      (5L, "delta")
    ).toDF("doc_id", "text")
    val stored = Seq(
      (10L, Seq("alpha", "beta")),
      (20L, Seq("gamma")),
      (30L, Seq("alpha", "beta", "gamma")),
      (40L, Seq("ALPHA", "alpha")), // query-side dedup: needs 1 term
      (50L, Seq.empty[String])      // never fires
    ).toDF("qid", "terms")
    val got = TextOps.percolate(docs, "doc_id", "text", stored,
      "qid", "terms").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set(
      (1L, 10L), (2L, 10L), (4L, 10L),            // alpha ∧ beta
      (1L, 20L), (3L, 20L),                       // gamma
      (1L, 30L),                                  // all three
      (1L, 40L), (2L, 40L), (4L, 40L)))           // deduped single term
  }

  test("bpeMergePairs: word-count-weighted adjacent char pairs") {
    val docs = Seq(
      (1L, "abc abc ab"),
      (2L, "abc x")) // 1-char word contributes no pair
      .toDF("doc_id", "text")
    // word counts: abc→3, ab→1, x→1
    // pairs: ab = 3 (from abc) + 1 (from ab) = 4; bc = 3
    val got = TextOps.bpeMergePairs(docs, "doc_id", "text", topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("ab", 4L), ("bc", 3L)))
    // topK boundary is deterministic under (n desc, pair asc)
    val top1 = TextOps.bpeMergePairs(docs, "doc_id", "text", topK = 1)
      .collect().map(_.getString(0))
    assert(top1.toSeq == Seq("ab"))
  }

  test("bigramNovelty: corpus-count mass per doc, zeros for sub-2-token docs") {
    val docs = Seq(
      (1L, "a b c"),   // bigrams: "a b", "b c"
      (2L, "a b a b"), // bigrams: "a b", "b a", "a b"
      (3L, "solo"),    // no bigram → all-zero row
      (4L, "x y"))     // unique bigram → min_c = 1
      .toDF("doc_id", "text")
    // corpus counts: "a b"→3, "b c"→1, "b a"→1, "x y"→1
    val got = TextOps.bigramNovelty(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got(1L) == ((2L, 2L, 3L + 1L, 1L)))
    assert(got(2L) == ((3L, 2L, 3L + 1L + 3L, 1L)))
    assert(got(3L) == ((0L, 0L, 0L, 0L)))
    assert(got(4L) == ((1L, 1L, 1L, 1L)))
  }

  test("triangles: cliques yield all triangles, chains yield none") {
    // K4 on {1,2,3,4} (4 triangles) + chain 10-11-12-13 (0 triangles)
    val pairs = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (10L, 11L), (11L, 12L), (12L, 13L)).toDF("da", "db")
    val got = Dedup.triangles(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L),
      (2L, 3L, 4L)))
    // adding the chord 11-13 closes exactly one triangle in the chain
    val withChord = pairs.union(Seq((11L, 13L)).toDF("da", "db"))
    val got2 = Dedup.triangles(withChord)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got2 == got + ((11L, 12L, 13L)))
  }

  test("sparseCosinePairs: integer weights, exact cosine-½ cut, hand-checked") {
    // N=6, df cap 3. dfs: a,b,c,d,e,x → 2 (idf 6÷2=3); rest → 1 (idf 6).
    // (1,2) identical: w=3 per token, dot=27, n2=27 — cos 1, kept.
    // (3,4) partial: dot=18, n2 18 vs 54 — cos .577, kept.
    // (5,6) share only x (w 3): dot=9 vs n2 117·117 — cos .077, cut.
    val docs = Seq(
      (1L, "a b c"), (2L, "a b c"),
      (3L, "d e"), (4L, "d e f"),
      (5L, "x y z w"), (6L, "x p q r")).toDF("doc_id", "text")
    val got = TextOps.sparseCosinePairs(docs, "doc_id", "text")
      .orderBy("da", "db")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, 2L, 27L, 27L, 27L),
      (3L, 4L, 18L, 18L, 54L)))
  }

  test("fimSplit: concat reconstructs, cuts deterministic, empty text safe") {
    val docs = (1L to 50L).map(i => (i, s"document body ${"abc" * (i % 7).toInt} tail$i"))
      .toDF("doc_id", "text")
    val orig = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = TextOps.fimSplit(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getString(3))).toMap
    got.foreach { case (id, (p, m, s)) =>
      assert(p + m + s == orig(id), s"doc $id reconstruction failed")
    }
    // at least one doc gets a non-empty middle at this corpus size
    assert(got.values.exists(_._2.nonEmpty))
    val again = TextOps.fimSplit(docs.repartition(5), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getString(3))).toMap
    assert(again == got)
    val empty = TextOps.fimSplit(Seq((9L, "")).toDF("doc_id", "text"),
      "doc_id", "text").head
    assert(empty.getString(1) == "" && empty.getString(2) == "" &&
      empty.getString(3) == "")
  }

  test("spanCorrupt: sentinel substitution reconstructs the document") {
    val docs = (1L to 30L).map(i =>
      (i, (0 until 40).map(j => s"w${(i * 7 + j) % 13}").mkString(" ")))
      .toDF("doc_id", "text")
    val out = TextOps.spanCorrupt(docs, "doc_id", "text", maskPct = 30)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    assert(out.exists(_._4 > 0), "30% masking must mask something")
    out.foreach { case (id, input, target, nMasked, nSpans) =>
      assert(nSpans <= nMasked)
      // parse target into sentinel -> tokens
      val spans = ("<X\\d+>".r.findAllIn(target).toSeq zip
        target.split("<X\\d+> ?").toSeq.drop(1).map(_.trim)).toMap
      val rebuilt = input.split(" ").toSeq.flatMap { s =>
        if (s.startsWith("<X")) spans(s).split(" ").filter(_.nonEmpty).toSeq
        else Seq(s)
      }
      val orig = (0 until 40).map(j => s"w${(id * 7 + j) % 13}")
      assert(rebuilt.toSeq == orig, s"doc $id failed reconstruction")
    }
    // maskPct 0: identity input, empty target
    val zero = TextOps.spanCorrupt(docs, "doc_id", "text", maskPct = 0)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(zero.forall(z => z._2 == "" && z._3 == 0L))
    // maskPct 100: one run swallowing the whole doc
    val full = TextOps.spanCorrupt(docs, "doc_id", "text", maskPct = 100)
      .collect().map(r => (r.getString(1), r.getLong(4)))
    assert(full.forall(f => f._1 == "<X1>" && f._2 == 1L))
  }

  test("quantizeInt8: max element hits ±127, zero vector guarded") {
    import graft.ext.Similarity
    val emb = Seq(
      (1L, Seq(0.5f, -1.0f, 0.25f)),  // mx=1.0 → q = 64,-127,32
      (2L, Seq(0.0f, 0.0f, 0.0f)))    // zero vector → all 0
      .toDF("vec_id", "embedding")
    val got = Similarity.quantizeInt8(emb, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got((1L, 0L)) == 64L)   // round(0.5*127) = round(63.5) = 64
    assert(got((1L, 1L)) == -127L)
    assert(got((1L, 2L)) == 32L)   // round(31.75) = 32
    assert(Seq(0L, 1L, 2L).forall(d => got((2L, d)) == 0L))
  }

  test("classCentroids: exact decimal sums per (label, dim), partition-stable") {
    import graft.ext.Similarity
    val emb = Seq(
      (1L, Seq(1.0f, 2.0f), 0),
      (2L, Seq(3.0f, -1.5f), 0),
      (3L, Seq(0.25f, 0.75f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.classCentroids(emb, "embedding", "label")
      .collect().map(r => (r.getInt(0), r.getLong(1)) ->
        (r.getDecimal(2).doubleValue, r.getLong(3))).toMap
    assert(got((0, 0L)) == ((4.0, 2L)))
    assert(got((0, 1L)) == ((0.5, 2L)))
    assert(got((1, 0L)) == ((0.25, 1L)))
    assert(got((1, 1L)) == ((0.75, 1L)))
    val again = Similarity.classCentroids(emb.repartition(7), "embedding",
        "label")
      .collect().map(r => (r.getInt(0), r.getLong(1)) ->
        (r.getDecimal(2).doubleValue, r.getLong(3))).toMap
    assert(again == got, "decimal sums must be order-independent")
  }

  test("gramMatrix: upper-triangle second moments, partition-stable") {
    import graft.ext.Similarity
    val emb = Seq(
      (1L, Seq(1.0f, 2.0f)),
      (2L, Seq(3.0f, -1.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.gramMatrix(emb, "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDecimal(2).doubleValue, r.getLong(3))).toMap
    // S00 = 1+9, S01 = 2-3, S11 = 4+1; strictly-lower (1,0) absent
    assert(got.keySet == Set((0L, 0L), (0L, 1L), (1L, 1L)))
    assert(got((0L, 0L)) == ((10.0, 2L)))
    assert(got((0L, 1L)) == ((-1.0, 2L)))
    assert(got((1L, 1L)) == ((5.0, 2L)))
    val again = Similarity.gramMatrix(emb.repartition(5), "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDecimal(2).doubleValue, r.getLong(3))).toMap
    assert(again == got, "decimal sums must be order-independent")
  }

  test("diversityStats: doc/token/trigram counts, short docs, empty group") {
    val docs = Seq(
      (1L, "a", "x y z x y z"),   // 6 tokens, 3 distinct; 4 trigrams, 3 distinct
      (2L, "a", "x y"),           // <3 tokens → no trigrams
      (3L, "b", ""))              // empty text → zero tokens/trigrams
      .toDF("doc_id", "source", "text")
    val got = TextOps.diversityStats(docs, "source", "doc_id", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got("a") == ((2L, 8L, 3L, 4L, 3L)))
    assert(got("b") == ((1L, 0L, 0L, 0L, 0L)),
      "group with only empty docs survives with zeroed counts")
  }

  test("sourceVocabOverlap: intersection/vocab counts, zero-overlap absent") {
    val docs = Seq(
      (1L, "a", "alpha beta gamma"),
      (2L, "a", "beta delta"),         // V(a) = {alpha,beta,gamma,delta}
      (3L, "b", "beta gamma zeta"),    // V(b) = {beta,gamma,zeta}
      (4L, "c", "omega"))              // V(c) disjoint from both
      .toDF("doc_id", "source", "text")
    val got = TextOps.sourceVocabOverlap(docs, "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == Map(("a", "b") -> ((2L, 4L, 3L))),
      "only the overlapping pair appears; counts are exact")
  }

  test("concordance: hit positions, clamped contexts, doc edges") {
    val docs = Seq(
      (1L, "x spark y"),         // middle hit, 1-token contexts each side
      (2L, "spark starts here"), // hit at position 0 — empty left
      (3L, "ends with spark"),   // hit at the end — empty right
      (4L, "spark a spark"),     // two hits, one doc
      (5L, "no hits here"))
      .toDF("doc_id", "text")
    val got = TextOps.concordance(docs, "doc_id", "text", "spark",
        window = 2, k = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3)))
    assert(got.toSeq == Seq(
      (1L, 1L, "x", "y"),
      (2L, 0L, "", "starts here"),
      (3L, 2L, "ends with", ""),
      (4L, 0L, "", "a spark"),
      (4L, 2L, "spark a", "")))
  }

  test("encodeTokens: sequence order, OOV zeros, vocab join") {
    val vocab = Seq(("a", 1L), ("b", 2L), ("cc", 3L)).toDF("token", "token_id")
    val docs = Seq(
      (1L, "b a b cc"),
      (2L, "zz a yy"),
      (3L, "all oov words only"))
      .toDF("doc_id", "text")
    val got = TextOps.encodeTokens(docs, vocab, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got(1L) == ((4L, 0L, "2,1,2,3")))
    assert(got(2L) == ((3L, 2L, "0,1,0")))
    assert(got(3L) == ((4L, 4L, "0,0,0,0")))
    // order survives repartitioning (in-row struct sort, not task order)
    val again = TextOps.encodeTokens(docs.repartition(5), vocab,
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(again(1L) == "2,1,2,3")
  }

  test("filterWithReasons: each gate flips its own bit, clean doc passes") {
    val docs = Seq(
      (1L, "the cat sat of a mat and then some more words here now ok"),
      (2L, "tiny"),                                  // 1: too short
      (3L, "the " + ("filler words vary all round the house so " * 3) +
        "x " * 300),                                 // 2+8: long & dup-heavy
      (4L, "the of and a 123 456 789 0123 4567 !!!"),// 4: low alpha
      (5L, "aa bb cc aa bb cc aa bb cc the of"),     // 8: dup tokens
      (6L, "words without any stop tokens at all friends"))  // 16
      .toDF("doc_id", "text")
    val got = TextOps.filterWithReasons(docs, "doc_id", "text",
        minTokens = 5L, maxChars = 500L)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(got(1L) == ((0L, true)))
    assert(got(2L)._1 % 2 == 1L && !got(2L)._2)
    assert((got(3L)._1 & 2L) == 2L && (got(3L)._1 & 8L) == 8L)
    assert((got(4L)._1 & 4L) == 4L)
    assert(got(5L) == ((8L, false)))
    assert(got(6L) == ((16L, false)))
  }

  test("exactWithProvenance: keeper, capped removed list, source span") {
    val docs = Seq(
      (5L, "same text", "s1"), (2L, "same text", "s2"),
      (9L, "same text", "s1"), (7L, "same text", "s3"),
      (3L, "unique here", "s1"),
      (11L, "pair", "s2"), (10L, "pair", "s2"))
      .toDF("doc_id", "text", "source")
    val got = Dedup.exactWithProvenance(docs, "doc_id", "text", "source",
        maxIds = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getString(2), r.getLong(3))).toMap
    // keeper is min id; cap 2 keeps the two smallest REMOVED ids (5,7 of
    // 5,7,9); three distinct sources in the group
    assert(got(2L) == ((3L, "5,7", 3L)))
    assert(got(3L) == ((0L, "", 1L)))
    assert(got(10L) == ((1L, "11", 1L)))
    assert(got.size == 3)
  }

  test("piiAudit: staged detectors, no double counting, all shapes") {
    val docs = Seq(
      (1L, "mail a@b.io, ssn 123-45-6789, call (555) 123-4567 from 10.0.0.1"),
      // digits inside the email are redacted by stage 1 and must NOT
      // re-count as a phone in stage 3
      (2L, "reach 123-456-7890x@y.com today"),
      (3L, "+1 555.123.4567 and bare 555 123 4567"),
      (4L, "over-approx 999.999.999.999 flags as ip"),
      (5L, "nothing sensitive here"))
      .toDF("doc_id", "text")
    val got = TextOps.piiAudit(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getString(5))).toMap
    assert(got(1L) == ((1L, 1L, 1L, 1L,
      "mail <EMAIL>, ssn <SSN>, call <PHONE> from <IP>")))
    assert(got(2L) == ((1L, 0L, 0L, 0L, "reach <EMAIL> today")))
    assert(got(3L) == ((0L, 0L, 2L, 0L, "<PHONE> and bare <PHONE>")))
    assert(got(4L) == ((0L, 0L, 0L, 1L, "over-approx <IP> flags as ip")))
    assert(got(5L) == ((0L, 0L, 0L, 0L, "nothing sensitive here")))
  }

  test("recordLinkage: blocked candidates, best match, ties, maxDf, self-exclusion") {
    val catalog = Seq(
      (1L, "red widget"), (2L, "blue bolt"), (3L, "red widget"),
      (4L, "red gadget"), (5L, "green bolt"), (6L, "red widget"))
      .toDF("id", "name")
    val probe = catalog.where(col("id") <= 2)
    val got = Dedup.recordLinkage(probe, catalog, "id", "name")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // probe 1 "red widget": exact dups at 3 and 6 (ed 0, shared 2) — the
    // db-asc tiebreak must pick 3, never its own id 1
    assert(got(1L) == ((3L, 2L, 0L)))
    // probe 2 "blue bolt": only "green bolt" shares a token
    assert(got(2L)._1 == 5L && got(2L)._2 == 1L)
    // stop-token removal: with maxDf=1 every shared token blocks away
    assert(Dedup.recordLinkage(probe, catalog, "id", "name", maxDf = 1L)
      .count() == 0L)
    // maxEdit gate: exact dup survives an edit cap of 0, fuzzy match dies
    val strict = Dedup.recordLinkage(probe, catalog, "id", "name", maxEdit = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(strict == Map(1L -> 3L))
  }

  test("cleanText: NFC composition, control strip, whitespace collapse") {
    val docs = Seq(
      (1L, "café time"),       // e + combining acute → é (5+5 → 9)
      (2L, "abc"),       // 0x01, 0x0B strip to nothing
      (3L, "  a \t\n b\r\f c  "),    // runs collapse, ends trim
      (4L, "plain ascii"))           // identity
      .toDF("doc_id", "text")
    val got = TextOps.cleanText(docs, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getString(1), r.getLong(2)))
    assert(got(0) == (("café time", 1L)))
    assert(got(1) == (("abc", 2L)))
    assert(got(2) == (("a b c", 9L)))
    assert(got(3) == (("plain ascii", 0L)))
    // the expression is SQL-callable through the registered extension
    val viaSql = spark.sql("SELECT graft_nfc('café')").head.getString(0)
    assert(viaSql == "café")
  }

  test("heavyHitters: exact top-k counts, tie order, CMS bound holds") {
    // counts: a->5, b->3, c->3, d->1  (b/c tie broken by token asc)
    val docs = Seq(
      (1L, "a a a b b"),
      (2L, "a a b c c"),
      (3L, "c d")).toDF("doc_id", "text")
    val top = TextOps.heavyHitters(docs, "doc_id", "text", k = 3)
      .orderBy(col("n").desc, col("token"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(top.map(t => (t._1, t._2)).toSeq ==
      Seq(("a", 5L), ("b", 3L), ("c", 3L)))
    assert(top.forall(_._3), "CMS estimate outside [true, true+eps·N]")
    // k past the vocabulary returns every token, still all within bound
    val all = TextOps.heavyHitters(docs, "doc_id", "text", k = 10)
      .collect()
    assert(all.length == 4)
    assert(all.forall(_.getBoolean(2)))
  }

  test("distributionL1 (X118): hand-checked distance, identical groups " +
    "at 0, disjoint groups at 1") {
    import spark.implicits._
    import graft.ext.TextOps
    // a: {x:2, y:1} N=3; b: {x:1, y:2} N=3 → L1 = |2/3-1/3|+|1/3-2/3|
    // = 2/3 → drift = 1/3; num = sum|c_a*Nb - c_b*Na| = |6-3|+|3-6| = 6,
    // 2*Na*Nb = 18 → 6/18 = 0.333333
    // c: identical to a → drift(a,c) = 0
    // d: {z:1} disjoint from a → drift(a,d) = 1
    val docs = Seq(
      ("a", "x x y"), ("b", "x y y"), ("c", "x x y"), ("d", "z")
    ).toDF("source", "text")
    val out = TextOps.distributionL1(docs, "source", "text")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getString(2), r.getDouble(3))).toMap
    assert(out.size == 6, "all C(4,2) pairs present")
    assert(out(("a", "b"))._2 == 0.333333)
    assert(out(("a", "b"))._1 == "6") // Σ|c_at·N_b − c_bt·N_a| = 3+3
    assert(out(("a", "c"))._2 == 0.0)
    assert(out(("a", "d"))._2 == 1.0, "no shared token → disjoint mass")
    assert(out(("c", "d"))._2 == 1.0)
    // layout independence (decimal sums are order-free)
    val again = TextOps.distributionL1(docs.repartition(5), "source", "text")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getString(2), r.getDouble(3))).toMap
    assert(again == out)
  }
}
