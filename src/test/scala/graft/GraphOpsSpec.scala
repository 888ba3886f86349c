package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Dedup

/** X81 family — fixed-point PageRank, MinHash Jaccard estimation, cluster
  * sizes, dup-mass accounting — each against an independent in-memory
  * model (DedupDifferentialSpec style: the reference derives only from the
  * operator definitions, never from the Spark code or the oracle SQL).
  */
class GraphOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // ── fixed-point PageRank ──────────────────────────────────────────────

  /** The integer recurrence verbatim: r⁰ = S div N;
    * rᵏ⁺¹(v) = (15·(S div N) + 85·Σ rᵏ(u) div deg(u)) div 100. BigInt sum
    * mirrors the engine's DECIMAL(38,0) partials. */
  private def modelPageRank(edges: Seq[(Long, Long)], iters: Int,
                            scale: Long): Map[Long, Long] = {
    val sym = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = sym.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = deg.keySet
    val r0 = scale / nodes.size
    var r: Map[Long, Long] = nodes.map(_ -> r0).toMap
    for (_ <- 1 to iters) {
      val in = sym.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => BigInt(r(s) / deg(s)) }.sum).toMap
      r = nodes.map(v =>
        v -> ((BigInt(15L * r0) + 85 * in(v)) / 100).toLong).toMap
    }
    r
  }

  private def randomEdges(seed: Int, nNodes: Int, nEdges: Int): Seq[(Long, Long)] = {
    val rnd = new Random(seed)
    (0 until nEdges).map { _ =>
      val a = rnd.nextInt(nNodes).toLong
      val b = rnd.nextInt(nNodes).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(e => e._1 != e._2).distinct
  }

  test("pageRank matches the in-memory integer recurrence on random graphs") {
    import spark.implicits._
    for (seed <- Seq(1, 2, 3)) {
      val edges = randomEdges(seed, 30, 60)
      val got = Dedup.pageRank(edges.toDF("da", "db"), iterations = 5)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == modelPageRank(edges, 5, 1000000000000L), s"seed=$seed")
    }
  }

  test("pageRank: star center outranks leaves; empty graph yields empty") {
    import spark.implicits._
    val star = (1L to 8L).map(i => (0L, i))
    val pr = Dedup.pageRank(star.toDF("da", "db")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 8L).forall(i => pr(0L) > pr(i)))
    assert(Dedup.pageRank(
      Seq.empty[(Long, Long)].toDF("da", "db")).count() === 0L)
  }

  // ── MinHash Jaccard estimation ────────────────────────────────────────

  private val words = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa")

  private def randomDocs(seed: Int, n: Int): Seq[(Long, String)] = {
    val rnd = new Random(seed)
    // overlapping docs: draw from a few templates with small mutations so
    // LSH candidates actually exist
    val templates = Vector.fill(5)(
      Seq.fill(12 + rnd.nextInt(8))(words(rnd.nextInt(words.size))))
    (0L until n.toLong).map { id =>
      val t = templates(rnd.nextInt(templates.size)).toArray
      if (rnd.nextBoolean()) t(rnd.nextInt(t.length)) = words(rnd.nextInt(words.size))
      id -> t.mkString(" ")
    }
  }

  private def trigrams(text: String): Set[String] =
    text.trim.toLowerCase.split(" +").toSeq.sliding(3)
      .filter(_.size == 3).map(_.mkString(" ")).toSet

  private def sigOf(sh: Set[String], k: Int): IndexedSeq[String] =
    (0 until k).map(i => sh.map(s => md5hex(s"$i|$s")).min)

  test("jaccardEstimate matches in-memory signature agreement on random corpora") {
    import spark.implicits._
    val k = 16; val bands = 4; val r = k / bands
    for (seed <- Seq(1, 2)) {
      val docs = randomDocs(seed, 40)
      val sigs = docs.map { case (id, tx) => id -> sigOf(trigrams(tx), k) }.toMap
      // model LSH candidates: shared (band, md5(4 concatenated sig vals))
      val buckets = for {
        (id, sig) <- sigs.toSeq; b <- 0 until bands
      } yield (b, md5hex2(sig.slice(b * r, b * r + r).mkString)) -> id
      val cands = buckets.groupBy(_._1).values.flatMap { g =>
        val ids = g.map(_._2).distinct.sorted
        for (i <- ids.indices; j <- i + 1 until ids.size)
          yield (ids(i), ids(j))
      }.toSet
      val want = cands.map { case (a, b) =>
        (a, b) -> sigs(a).zip(sigs(b)).count { case (x, y) => x == y }.toLong
      }.toMap
      val got = Dedup.jaccardEstimate(docs.toDF("doc_id", "text"),
          "doc_id", "text", k, bands)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got == want, s"seed=$seed")
    }
  }

  // md5 of the UTF-8 concat — same as md5hex but named for the band hash
  private def md5hex2(s: String): String = md5hex(s)

  // ── cluster sizes / dup mass ──────────────────────────────────────────

  test("clusterSizes: histogram equals the CC rollup; doc mass conserved") {
    import spark.implicits._
    val docs = randomDocs(7, 50).toDF("doc_id", "text")
    val comp = Dedup.connectedComponents(
        docs.select(col("doc_id")),
        Dedup.minHashLsh(docs, "doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val want = comp.groupBy(_._2).values.map(_.size).toSeq
      .groupBy(identity).map { case (sz, g) =>
        sz.toLong -> (g.size.toLong, (sz * g.size).toLong) }
    val got = Dedup.clusterSizes(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want)
    assert(got.values.map(_._2).sum === 50L)
  }

  test("dupMass: known duplicate groups are accounted; unique rows drop out") {
    import spark.implicits._
    val rows = Seq(
      ("s1", "aaa", 3L), ("s1", "aaa", 3L), ("s1", "aaa", 3L), // 2 removable
      ("s1", "bb", 2L),                                        // unique
      ("s2", "cccc", 4L), ("s2", "cccc", 4L),                  // 1 removable
      ("s3", "dd", 2L)                                         // unique group
    ).toDF("source", "text", "n_chars")
    val got = Dedup.dupMass(rows, "source", "text", "n_chars")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == Map("s1" -> (1L, 2L, 6L), "s2" -> (1L, 1L, 4L)))
  }

  // ── X127 label propagation ────────────────────────────────────────

  /** The clamped-majority recurrence verbatim: per round, non-seed
    * nodes take the majority neighbor label (abstaining NULLs, ties →
    * smallest label, no labeled neighbor → keep), seeds never move. */
  private def modelLabelProp(edges: Seq[(Long, Long)],
                             seeds: Map[Long, String], rounds: Int)
  : Map[Long, Option[String]] = {
    val sym = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val nodes = sym.map(_._1).toSet
    var cur: Map[Long, Option[String]] =
      nodes.map(n => n -> seeds.get(n)).toMap
    for (_ <- 1 to rounds) {
      val maj = sym.groupBy(_._1).map { case (n, es) =>
        val labs = es.flatMap { case (_, d) => cur(d) }
        n -> (if (labs.isEmpty) None
              else Some(labs.groupBy(identity).toSeq
                .map { case (l, o) => (o.size, l) }
                .sortBy { case (c, l) => (-c, l) }.head._2))
      }
      cur = nodes.map(n =>
        n -> seeds.get(n).orElse(maj.getOrElse(n, None)).orElse(cur(n)))
        .toMap
    }
    cur
  }

  test("labelPropagate: majority vote resists a single bridge edge " +
    "where connected components merge (X127)") {
    import spark.implicits._
    // two triangles joined by one bridge 3-4; one seed per side
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("da", "db")
    val seeds = Seq((1L, "a"), (4L, "b")).toDF("id", "lab")
    val out = Dedup.labelPropagate(edges, "da", "db", seeds, "id", "lab",
      rounds = 3).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a", 2L -> "a", 3L -> "a",
      4L -> "b", 5L -> "b", 6L -> "b"))
    // the contrast X127's scaladoc claims: CC merges the two communities
    val vertices = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id")
    val comps = Dedup.connectedComponents(vertices, edges)
      .select("component").distinct().count()
    assert(comps == 1L, "CC must see ONE component across the bridge")
  }

  test("labelPropagate: a label travels one hop per round; unreached " +
    "nodes stay NULL; seeds clamp (X127)") {
    import spark.implicits._
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("da", "db")
    val seeds = Seq((1L, "x")).toDF("id", "lab")
    val out = Dedup.labelPropagate(chain, "da", "db", seeds, "id", "lab",
      rounds = 3).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out == Map(1L -> Some("x"), 2L -> Some("x"), 3L -> Some("x"),
      4L -> Some("x"), 5L -> None))
    // a contradicting seed never moves even when outvoted
    val seeds2 = Seq((1L, "x"), (2L, "y")).toDF("id", "lab")
    val out2 = Dedup.labelPropagate(chain, "da", "db", seeds2, "id",
      "lab", rounds = 3).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out2(2L) == Some("y"), "seed must clamp")
  }

  test("labelPropagate matches the in-memory recurrence on random " +
    "graphs (X127)") {
    import spark.implicits._
    val rnd = new Random(4127)
    for (trial <- 1 to 5) {
      val n = 12 + rnd.nextInt(20)
      val edges = (1 to n * 2).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }.distinct
      val seeds = (0 until n by 3)
        .map(i => i.toLong -> s"s${rnd.nextInt(3)}").toMap
      val got = Dedup.labelPropagate(
        edges.toDF("da", "db"),
        "da", "db", seeds.toSeq.toDF("id", "lab"), "id", "lab",
        rounds = 3).collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      val want = modelLabelProp(edges, seeds, rounds = 3)
      assert(got == want, s"trial $trial: n=$n edges=$edges")
    }
  }

  test("kCore: peels a tail chain off a triangle, keeps the dense region") {
    import spark.implicits._
    // triangle {1,2,3} + a pendant chain 3-4-5 + an isolated edge 6-7:
    // the 2-core is exactly the triangle (chain and edge peel away)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L),
      (6L, 7L)).toDF("da", "db")
    val core = Dedup.kCore(edges, k = 2, rounds = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // k=3 on the same graph: nothing survives (triangle degrees are 2)
    assert(Dedup.kCore(edges, k = 3, rounds = 8).isEmpty)
  }

  test("q_kcore fixture converges inside the declared 8-round unroll") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val pairs = Dedup.minHashLsh(docs, "doc_id", "text")
      .persist()
    def run(rounds: Int) = Dedup.kCore(pairs, k = 2, rounds = rounds)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val at7 = run(7)
    val at8 = run(8)
    pairs.unpersist()
    // fixpoint before the unroll ends ⇒ the fixed 8-round oracle is the
    // exact k-core, not a truncation
    assert(at7 == at8, "fixture did not converge within 7 rounds")
    // every survivor has within-core degree ≥ k — the defining property
    assert(at8.forall(_._2 >= 2L))
  }

  test("iteration constants carry measured headroom: peel/CC depth <= constant - 2") {
    // tools.GraphDepth measured the REAL dup-graph fixpoint depths at
    // sf0.01 / sf0.1 / GenData sf1: peel depth 1, CC rounds 2 at every
    // scale (SCALING.md). This pins the same headroom rule on the fixture
    // so a graph-shape change that eats the margin fails HERE, two rounds
    // before it would truncate the 8-round kCore unroll or the CC cap.
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val pairs = Dedup.minHashLsh(docs, "doc_id", "text").persist()
    val (_, peel) = Dedup.kCoreWithRounds(pairs, k = 2, rounds = 64)
    val (_, ccRounds) = Dedup.connectedComponentsWithRounds(
      docs.select("doc_id"), pairs, maxIter = 40)
    pairs.unpersist()
    assert(peel <= 8 - 2,
      s"measured peel depth $peel leaves <2 rounds of headroom under the 8-round contract")
    assert(ccRounds <= 7 - 2,
      s"measured CC rounds $ccRounds leave <2 rounds of headroom under the 7-round pin")
    info(s"measured peel depth $peel (contract 8), CC rounds $ccRounds (pin 7)")
  }
}
