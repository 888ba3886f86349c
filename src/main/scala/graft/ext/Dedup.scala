package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators for LLM-data pipelines (SURVEY §2.9).
  *
  * Scale design: every variant is a shuffle-on-key plan — content hash,
  * minhash band bucket, or simhash fingerprint — so at 100 TB the work
  * partitions by hash with no all-pairs stage. The only quadratic piece
  * (candidate verification) is confined inside LSH buckets / to explicit
  * probe sets.
  *
  * Hashes are md5-based so the DuckDB oracle can replay them exactly
  * (xxhash64/murmur differ across engines).
  */
object Dedup {

  /** X1 — exact dedup by content hash: one hash-shuffle, keep min(doc_id)
    * per hash (deterministic survivor, unlike dropDuplicates which keeps
    * an arbitrary row). */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(md5(col(textCol)).as("h"), col(idCol))
      .groupBy("h")
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("n_dups"))

  /** Word-trigram shingles, exploded to (doc_id, sh) rows (with
    * duplicates; callers needing set semantics add `.distinct()`). The
    * token array is bound to its own projection first — see
    * TextOps.trigramsOfTokens. */
  def shingles(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        TextOps.tokens(col(textCol)).as("__t"))
      .select(col("doc_id"),
        explode(TextOps.trigramsOfTokens(col("__t"))).as("sh"))

  /** MinHash + LSH near-dup candidates.
    *
    * shingle → k min-hashes (min of md5("k|shingle") per doc) → signature →
    * b bands of r rows → band-hash bucket join. Docs sharing any band
    * bucket are candidates. k = b*r. With the fixture corpus (word-trigram
    * shingles, k=16, b=4, r=4) this recovers exactly the Jaccard≥0.5 truth
    * set (measured: precision = recall = 1.0 at sf0.01).
    *
    * Scale: the candidate join keys on (band index, band hash) — the LSH
    * bucketing IS the shuffle partitioning; no all-pairs comparison ever
    * materializes. Skewed buckets (giant near-dup clusters) are bounded by
    * the band hash fan-out; AQE skew-join handles the residue.
    */
  def minHashLsh(docs: DataFrame, idCol: String, textCol: String,
                 k: Int = 16, bands: Int = 4): DataFrame =
    minHashLshFromShingles(shingles(docs, idCol, textCol), k, bands)

  /** MinHash band signatures of precomputed (doc_id, sh) shingle rows:
    * one row per (doc_id, band index b, band hash bh) — the LSH bucket
    * keys. No shingle distinct needed: min over a multiset equals min
    * over the set. All k min-hashes are computed as k aggregate columns
    * in ONE groupBy — the partial (map-side) aggregation reduces each
    * partition to ≤ |docs| rows before the only shuffle, vs. exploding
    * k× rows. */
  /** The k-column MinHash signature of (doc_id, sh) shingle rows as one
    * (doc_id, sig ARRAY<STRING>) frame — k aggregate columns in ONE
    * groupBy (map-side partials; see [[bandedSignatures]]). */
  private[graft] def signaturesOfShingles(sh: DataFrame, k: Int): DataFrame = {
    val minCols = (0 until k).map(i =>
      min(md5(concat(lit(s"$i|"), col("sh")))).as(s"m$i"))
    sh.groupBy("doc_id").agg(minCols.head, minCols.tail: _*)
      .select(col("doc_id"),
        array((0 until k).map(i => col(s"m$i")): _*).as("sig"))
  }

  private def bandedSignatures(sh: DataFrame, k: Int, bands: Int): DataFrame =
    bandsOfSignatures(signaturesOfShingles(sh, k), k, bands)

  /** Band keys from an ALREADY-BUILT signature frame — split out so a
    * caller that also consumes the signatures directly
    * ([[jaccardEstimate]]) can build both from ONE materialization
    * instead of re-running the k-column min aggregation per consumer. */
  private def bandsOfSignatures(sig: DataFrame, k: Int,
                                bands: Int): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    val r = k / bands
    val bandHash = (0 until r).map(i => element_at(col("sig"), col("b") * r + i + 1))
    sig
      .select(col("doc_id"), explode(sequence(lit(0), lit(bands - 1))).as("b"), col("sig"))
      .select(col("doc_id"), col("b"), md5(concat(bandHash: _*)).as("bh"))
  }

  /** LSH banding over precomputed (doc_id, sh) shingle rows — callers that
    * also need the shingles (e.g. minHashVerified) persist them and share.
    */
  def minHashLshFromShingles(sh: DataFrame,
                             k: Int = 16, bands: Int = 4): DataFrame = {
    val banded = bandedSignatures(sh, k, bands)
    // Shuffle (merge) join, never broadcast: at corpus scale the banded
    // table is the whole dataset, and a shuffle self-join lets ReuseExchange
    // compute the signature pipeline ONCE for both sides (a BroadcastExchange
    // on one side would force a second full computation).
    banded.as("a")
      .join(banded.as("c").hint("merge"),
        col("a.b") === col("c.b") && col("a.bh") === col("c.bh")
          && col("c.doc_id") > col("a.doc_id"))
      .select(col("a.doc_id").as("da"), col("c.doc_id").as("db"))
      .distinct()
  }

  /** Per-document SimHash bit sums (doc_id, s0..s{width-1}): s_j is the
    * count-weighted sum over tokens of (2*bit_j(md5(token)) - 1); the
    * fingerprint's bit j is sign(s_j). All `width` sums are computed as
    * `width` aggregate columns over the token rows — one shuffle with
    * map-side partials, vs. exploding width× rows. The md5 is evaluated
    * once per token row; bit j of a token = bit (j mod 4) of hex digit
    * (j div 4). `width` ≤ 128 (md5 is a 128-bit digest / 32 hex digits).
    */
  private def simHashBitSums(docs: DataFrame, idCol: String,
                             textCol: String, width: Int): DataFrame = {
    require(width > 0 && width <= 128 && width % 4 == 0,
      s"simhash width=$width must be a positive multiple of 4, at most 128")
    val toks = docs
      .select(col(idCol).as("doc_id"), explode(TextOps.tokens(col(textCol))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("cnt"))
    // Bind the width/4 hex digits of md5(tok) to their own projection (one
    // conv per digit per token row, each consumed by 4 bit sums —
    // CollapseProject keeps multi-use non-trivial aliases materialized),
    // then slice bits with integer shifts instead of double-precision
    // pow/floor/pmod.
    val digits = (0 until width / 4).map(i =>
      conv(substring(col("h"), i + 1, 1), 16, 10).cast(LongType).as(s"d$i"))
    val bitSums = (0 until width).map { j =>
      val bit = shiftright(col(s"d${j / 4}"), j % 4).bitwiseAND(lit(1L))
      sum(col("cnt") * (bit * 2 - 1)).as(s"s$j")
    }
    toks.withColumn("h", md5(col("tok")))
      .select(col("doc_id") +: col("cnt") +: digits: _*)
      .groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
  }

  /** SimHash fingerprint per document: 64 bits, bit j = sign of the
    * count-weighted sum over tokens of (2*bit_j(md5(token)) - 1).
    * Near-dup docs (high token overlap) get identical/close fingerprints;
    * grouping by fingerprint is the dedup shuffle key.
    */
  def simHash(docs: DataFrame, idCol: String, textCol: String,
              width: Int = 64): DataFrame = {
    val fingerprint = concat((0 until width).map(j =>
      when(col(s"s$j") > 0, lit("1")).otherwise(lit("0"))): _*)
    simHashBitSums(docs, idCol, textCol, width)
      .select(col("doc_id"), fingerprint.as("simhash"))
  }

  /** SimHash near-dup PAIRS at corpus scale (Manku/Jain/Sarma, WWW'07
    * pigeonhole): split the 64-bit fingerprint into (maxHamming+1) bands —
    * any pair within Hamming distance maxHamming agrees exactly on ≥1 band
    * — bucket-join on (band index, band value), then verify candidates
    * with popcount(xor) over the full fingerprint.
    *
    * Scale: identical fingerprints are PRE-GROUPED before banding. Exact
    * duplicates are near-universal at corpus scale, and every member of an
    * identical-fingerprint cluster lands in the same (band, value) bucket
    * of EVERY band — without the pre-group an n-member cluster is
    * bands·n²/2 joined rows before dedup (10¹² for one 1M cluster). With
    * it, the band join sees ONE representative per DISTINCT fingerprint,
    * so candidate volume is driven by near-dup structure, not duplicate
    * multiplicity; member pairs are expanded from the group table
    * afterwards — emitting exactly the output rows, once, with hamming
    * known (0 within a group, the verified rep distance across groups)
    * without re-banding. Per-band bucket fan-out over the distinct
    * fingerprints is |distinct| / 2^w for w-bit bands — lower maxHamming ⇒
    * wider bands ⇒ smaller buckets; at 100 TB pass `width = 128` (md5's
    * full digest) for more headroom: bands double in width, so bucket
    * fan-out shrinks quadratically while the same maxHamming contract
    * holds over the wider fingerprint.
    *
    * Returns (da, db, hamming) with da < db, hamming ≤ maxHamming.
    */
  def simHashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3, width: Int = 64): DataFrame = {
    val bands = maxHamming + 1
    require(width % bands == 0, s"bands=$bands must divide width=$width")
    val (groups, members) = simHashGroups(docs, idCol, textCol, bands, width)
    // Across groups: band-join the representatives, then expand each
    // verified rep pair to its member pairs (doc→group is unique, so no
    // member pair can arise twice). Docs in different groups may order
    // either way relative to their reps — least/greatest restores da < db.
    val cross = simHashRepPairs(groups, bands, maxHamming)
      .join(members.select(col("rep").as("ra"), col("doc_id").as("ida")), Seq("ra"))
      .join(members.select(col("rep").as("rb"), col("doc_id").as("idb")), Seq("rb"))
      .select(least(col("ida"), col("idb")).as("da"),
        greatest(col("ida"), col("idb")).as("db"), col("hamming"))
    // Within a group every pair is a result row at hamming 0 — a straight
    // group-key self-join emitting the answer itself (output-sized, not
    // bands×-duplicated, no distinct needed).
    val within = members.as("a")
      .join(members.as("b").hint("merge"),
        col("a.rep") === col("b.rep") && col("b.doc_id") > col("a.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        lit(0).as("hamming"))
    within.unionByName(cross)
  }

  /** Fingerprint pre-group for simHashPairs: (groups, members) where
    * `groups` has one row per DISTINCT fingerprint — (cs: chunked
    * fingerprint, rep: min member doc_id) — and `members` maps every
    * doc_id to its group's rep. Package-private so tests can pin that
    * candidate volume is per-distinct-fingerprint, not per-document. */
  private[graft] def simHashGroups(docs: DataFrame, idCol: String,
                                   textCol: String, bands: Int,
                                   width: Int = 64): (DataFrame, DataFrame) = {
    val w = width / bands
    require(w <= 64, s"band width $w (width $width / $bands bands) exceeds " +
      "64 bits — use more bands; from simHashPairs, bands = maxHamming + 1, " +
      s"so width $width needs maxHamming >= ${width / 64 - 1}")
    // Band b = bits [b*w, (b+1)*w) of the fingerprint, packed into a long
    // (bitwise OR of distinct powers — same value as the sum, but immune
    // to ANSI overflow checks when bit 63 is set).
    val chunkCols = (0 until bands).map { b =>
      (0 until w).map(i =>
        when(col(s"s${b * w + i}") > 0, lit(1L << i)).otherwise(lit(0L)))
        .reduce(_ bitwiseOR _).as(s"c$b")
    }
    val sig = simHashBitSums(docs, idCol, textCol, width)
      .select(col("doc_id") +: chunkCols: _*)
      .select(col("doc_id"),
        array((0 until bands).map(b => col(s"c$b")): _*).as("cs"))
    // ONE shuffle (window over the fingerprint) yields both views: the
    // group representative as min(doc_id) over identical fingerprints,
    // and the group table as the rows that ARE their own representative.
    // A groupBy+join formulation costs two extra corpus-sized exchanges —
    // pure overhead on corpora where exact dups are rare.
    // LAZY-checkpointed: simHashPairs consumes members twice (the
    // within-group self-join) plus twice more in the cross expansion,
    // and groups twice (both band-join sides) — without the checkpoint
    // each consumer re-runs the 64-column bit-sum aggregation.
    val members0 = sig.withColumn("rep", min(col("doc_id"))
      .over(org.apache.spark.sql.expressions.Window.partitionBy("cs")))
      .localCheckpoint(eager = false)
    val members = members0.select(col("doc_id"), col("rep"))
    val groups = members0.where(col("doc_id") === col("rep"))
      .select(col("cs"), col("rep"))
    (groups, members)
  }

  /** Band join over ONE representative per distinct fingerprint: verified
    * (ra, rb, hamming) rep pairs with ra < rb, 1 ≤ hamming ≤ maxHamming
    * (hamming 0 is impossible across distinct fingerprints). */
  private[graft] def simHashRepPairs(groups: DataFrame, bands: Int,
                                     maxHamming: Int): DataFrame = {
    val banded = groups.select(col("rep"), col("cs"),
      posexplode(col("cs")).as(Seq("b", "bv")))
    val hamming = (0 until bands).map(b =>
      bit_count(element_at(col("a.cs"), b + 1)
        .bitwiseXOR(element_at(col("c.cs"), b + 1)))).reduce(_ + _)
    // Shuffle join for the same reason as minHashLshFromShingles: identical
    // exchanges on both sides → ReuseExchange runs the 64-column signature
    // aggregation once; a broadcast side would recompute it.
    banded.as("a")
      .join(banded.as("c").hint("merge"),
        col("a.b") === col("c.b") && col("a.bv") === col("c.bv")
          && col("c.rep") > col("a.rep"))
      .select(col("a.rep").as("ra"), col("c.rep").as("rb"),
        hamming.as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Document-frequency cap over distinct (doc_id, sh) rows: shingles that
    * appear in more than `maxDf` documents are dropped from the shingle
    * space BEFORE any shingle-key join. On a real corpus the top stopword
    * n-grams ("one of the", "as well as") occur in a large fraction of all
    * documents; a shingle-key self-join produces df² pairs for each, so a
    * single hot shingle is a scale-killing shuffle partition at 100 TB.
    * Capping df bounds the per-key fan-out at maxDf² — the standard
    * practice (such near-universal shingles carry no similarity signal
    * anyway). Jaccard is then computed over the capped shingle space on
    * BOTH the intersection and the sizes, so it remains a true Jaccard of
    * the filtered sets.
    */
  private def capDf(distinctSh: DataFrame, maxDf: Int): DataFrame = {
    if (maxDf == Int.MaxValue) distinctSh
    else {
      val df = distinctSh.groupBy("sh").agg(count(lit(1)).as("__df"))
        .where(col("__df") <= maxDf)
      distinctSh.join(df.select("sh"), Seq("sh"), "left_semi")
    }
  }

  /** The composed scale pipeline: MinHash+LSH candidate generation, then
    * exact Jaccard verification restricted to the candidate pairs — the
    * shape that holds at 100 TB (LSH bounds the candidate set; the exact
    * O(|pair| × shingles) verification never sees non-candidates, and the
    * df cap bounds every shingle-key join partition).
    */
  def minHashVerified(docs: DataFrame, idCol: String, textCol: String,
                      threshold: Double, k: Int = 16, bands: Int = 4,
                      maxDf: Int = Int.MaxValue): DataFrame = {
    // ONE distinct shingle frame feeds both the LSH candidate generation
    // and the Jaccard verification: min over the distinct set equals min
    // over the multiset, so the signatures are unchanged. LAZY-
    // checkpointed: ReuseExchange shares the distinct exchange within one
    // plan, but the frame has FOUR downstream consumers (signatures, df
    // cap, sizes, intersection) whose post-exchange work re-runs per
    // consumer — the checkpoint materializes the distinct rows once.
    // (Standalone minHashLsh keeps the multiset path — a lone groupBy
    // needs no distinct shuffle in front of it.)
    val sh0 = shingles(docs, idCol, textCol).distinct()
      .localCheckpoint(eager = false)
    val cand = minHashLshFromShingles(sh0, k, bands)
    val sh = capDf(sh0
      .select(col("doc_id"), xxhash64(col("sh")).as("sh")), maxDf)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = cand
      .join(sh.as("a"), col("da") === col("a.doc_id"))
      .join(sh.as("c"), col("db") === col("c.doc_id") && col("a.sh") === col("c.sh"))
      .groupBy(col("da"), col("db"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("da"), col("n").as("na")), "da")
      .join(sizes.select(col("doc_id").as("db"), col("n").as("nb")), "db")
      .withColumn("jaccard",
        round(col("inter") / (col("na") + col("nb") - col("inter")), 6))
      .where(col("jaccard") >= threshold)
      .select(col("da"), col("db"), col("jaccard"))
  }

  /** X81b — MinHash Jaccard ESTIMATION for LSH candidate pairs: the number
    * of agreeing signature components `n_eq` out of `k` (E[n_eq/k] =
    * Jaccard — the classic MinHash estimator). The integer numerator is
    * the output (the `topTerms` no-ulp policy: consumers divide by k
    * themselves), so two engines can never disagree.
    *
    * Versus [[minHashVerified]]'s EXACT Jaccard: estimation touches only
    * the k-wide signature frame — no shingle re-join, no per-pair
    * intersection aggregation — so at 100 TB it is the cheap first cut
    * (candidates × k work, all from the already-built signatures) and
    * exact verification is reserved for pairs that survive it. The
    * signature frame is built once and feeds both the banding and the
    * per-pair comparison (shared scan; the pair join shuffles on doc id).
    */
  def jaccardEstimate(docs: DataFrame, idCol: String, textCol: String,
                      k: Int = 16, bands: Int = 4): DataFrame = {
    val sh = shingles(docs, idCol, textCol)
    // ONE materialization of the k-column signature aggregation feeds
    // the banding AND both sides of the per-pair comparison (three
    // consumers in separate exchange shapes — lazy checkpoint, the
    // minHashVerified discipline); previously the banding path re-ran
    // the whole shingle scan + signature aggregation.
    val sigs = signaturesOfShingles(sh, k).localCheckpoint(eager = false)
    val banded = bandsOfSignatures(sigs, k, bands)
    val cand = banded.as("a")
      .join(banded.as("c").hint("merge"),
        col("a.b") === col("c.b") && col("a.bh") === col("c.bh")
          && col("c.doc_id") > col("a.doc_id"))
      .select(col("a.doc_id").as("da"), col("c.doc_id").as("db"))
      .distinct()
    cand
      .join(sigs.select(col("doc_id").as("da"), col("sig").as("__sa")), "da")
      .join(sigs.select(col("doc_id").as("db"), col("sig").as("__sb")), "db")
      .select(col("da"), col("db"),
        aggregate(zip_with(col("__sa"), col("__sb"),
            (x, y) => when(x === y, 1L).otherwise(0L)),
          lit(0L), (acc, x) => acc + x).as("n_eq"),
        lit(k.toLong).as("k"))
  }

  /** X81c — dedup cluster SIZE DISTRIBUTION: connected components over
    * the LSH near-dup graph, rolled up to (cluster size → number of
    * clusters, number of docs). THE corpus-health dashboard number for a
    * dedup pass: the size-1 row is the unique mass, the tail rows are the
    * mega-clusters that dominate removal (and that a curation run samples
    * representatives from). Everything after the component labels is two
    * integer aggregations — component→size (map-side partials on the
    * label), size→histogram — so the output is bounded by the largest
    * cluster size, corpus-independent.
    */
  def clusterSizes(docs: DataFrame, idCol: String, textCol: String,
                   k: Int = 16, bands: Int = 4): DataFrame =
    connectedComponents(
        docs.select(col(idCol).as("doc_id")),
        minHashLsh(docs, idCol, textCol, k, bands))
      .groupBy("component").agg(count(lit(1)).as("__sz"))
      .groupBy(col("__sz").as("size"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(col("__sz")).cast("long").as("n_docs"))

  /** X81d — duplicated-byte accounting per group (source/domain/shard):
    * for every within-group exact-duplicate text group of n copies,
    * (n−1) copies are waste; report per group the number of duplicated
    * text groups, the count of removable copies, and the character mass
    * they hold. The number a curation pass reads to decide WHERE dedup
    * pays for itself before running the full pipeline. All-integer
    * (counts and Σ(n−1)·chars) — no ulp hazard; two nested aggregations,
    * both with map-side partials, keyed (group, md5) then (group).
    */
  def dupMass(docs: DataFrame, groupCol: String, textCol: String,
              charsCol: String): DataFrame =
    docs.groupBy(col(groupCol).as("grp"), md5(col(textCol)).as("__h"))
      .agg(count(lit(1)).as("__n"), min(col(charsCol)).as("__c"))
      .where(col("__n") >= 2)
      .groupBy("grp")
      .agg(count(lit(1)).as("n_dup_groups"),
        sum(col("__n") - 1).cast("long").as("n_removable"),
        sum((col("__n") - 1) * col("__c")).cast("long").as("wasted_chars"))

  /** X105 — leakage-safe train/valid/test split: assign every document
    * the split of its near-dup CLUSTER, not its own id — the fix for
    * what X25b's `splitLeakage` measures. A naive per-doc (or per-group)
    * hash split puts near-duplicates of a training document into the
    * eval set, silently inflating benchmark scores; drawing the md5
    * bucket from the connected-component label instead makes cross-split
    * dup pairs ZERO BY CONSTRUCTION (every pair is an edge; both ends
    * share a component, hence a split — `SplitSpec` pins the
    * splitLeakage-of-leakSafeSplit == 0 differential).
    *
    * Scale shape: X1c LSH candidates → X1g adaptive pointer-doubling CC
    * (never corpus²), then one deterministic md5 bucket of the component
    * label per doc — the split adds NO shuffle beyond the CC it reuses.
    * Singleton docs are their own component: they split like a plain
    * hash split.
    */
  def leakSafeSplit(docs: DataFrame, idCol: String, textCol: String,
                    splits: Seq[(String, Int)] =
                      Seq(("train", 80), ("valid", 10), ("test", 10)),
                    k: Int = 16, bands: Int = 4): DataFrame =
    Sampling.splitAssign(
        connectedComponents(
          docs.select(col(idCol).as("doc_id")),
          minHashLsh(docs, idCol, textCol, k, bands)),
        "component", splits)
      .select(col("doc_id"), col("component").cast("long").as("component"),
        col("split"))

  /** X106 — cross-source duplication matrix: how much each pair of
    * sources (crawls, dumps, vendors) overlaps at the near-dup level —
    * the number a curation team reads to decide which acquisition is
    * redundant and where contamination flows between corpus slices
    * (X81d's dupMass is within-group exact copies; this is BETWEEN
    * groups, verified near-dups). Symmetric: pairs roll up under the
    * (least, greatest) source ordering, so the matrix is upper-
    * triangular with the diagonal holding within-source dup pressure.
    *
    * Scale shape: the X1b verified-pair frame is output-bounded (banded
    * LSH + df cap — never corpus²); two id-keyed joins attach sources
    * (the planner broadcasts whichever side is small — at web scale the
    * pair frame, orders below the corpus), one |sources|²-bounded count
    * aggregation with map-side partials.
    */
  def crossSourceDup(docs: DataFrame, idCol: String, textCol: String,
                     srcCol: String, threshold: Double = 0.3,
                     maxDf: Int = 100): DataFrame = {
    val src = docs.select(col(idCol).as("__sid"), col(srcCol).as("__src"))
    minHashVerified(docs, idCol, textCol, threshold, maxDf = maxDf)
      .join(src.select(col("__sid").as("da"), col("__src").as("__sa")),
        Seq("da"))
      .join(src.select(col("__sid").as("db"), col("__src").as("__sb")),
        Seq("db"))
      .groupBy(least(col("__sa"), col("__sb")).as("source_a"),
        greatest(col("__sa"), col("__sb")).as("source_b"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** X81 — PageRank over an undirected pair graph (near-dup candidates,
    * record-linkage matches, co-occurrence edges) in DETERMINISTIC FIXED
    * POINT: ranks are integers scaled by 10¹², every step is integer
    * div / multiply / exact DECIMAL(38,0) sums, so the result is
    * bit-identical on any engine and any partitioning — classic
    * float PageRank sums contributions in nondeterministic order and
    * drifts at the ulp, which a hash-compared contract cannot tolerate.
    *
    *   r⁰(v)    = S div N                       (S = 10¹², N = |nodes|)
    *   rᵏ⁺¹(v)  = (15·(S div N) + 85·Σ_{u→v} rᵏ(u) div outdeg(u)) div 100
    *
    * i.e. damping 0.85 with truncating integer division at each step
    * (identical to the oracle's `//` on positive operands). Node set =
    * edge endpoints; an undirected graph gives every node outdeg ≥ 1 and
    * indeg ≥ 1, so there is no dangling mass. Rank mass leaks slightly
    * to truncation — acceptable: ORDER and ratios are what PageRank is
    * consumed for, and those are exact.
    *
    * Scale shape: the adjacency (edge + out-degree) frame is partitioned
    * by src ONCE and persisted; each iteration is then one co-located
    * rank join on that partitioning plus one shuffle-on-dst aggregation
    * with map-side partials (DECIMAL(38,0) partials — overflow-proof and
    * order-independent) — K iterations = K shuffles of |nodes| rows, the
    * canonical iterative-join shape. Lineage grows linearly in K; for
    * K ≫ 10 callers should checkpoint every ~10 rounds (same note as
    * [[connectedComponents]]). The only driver action is the bounded
    * node count.
    *
    * Returns (node, pr) — pr the scaled integer rank.
    */
  /** X97 — k-core peel: nodes of the `rounds`-round k-core of an
    * undirected pair graph, with their within-core degrees. Each round
    * drops every node whose degree is below k and every edge touching
    * one, the classic peeling that isolates the DENSE region of a dup
    * graph — a template/boilerplate family survives a k=2..3 core while
    * incidental near-dup pairs fall away, so the core is the "worth a
    * human look" set dup triage actually wants (complementing
    * [[clusterSizes]]' CC view, which merges dense and stringy clusters
    * alike).
    *
    * Peeling is monotone: once the edge set reaches a fixpoint every
    * further round is a no-op, so a FIXED round count is exact whenever
    * it suffices to converge (the declared query's spec asserts
    * convergence on the fixture) and a well-defined bounded relaxation
    * when it does not — the property that lets the DuckDB oracle replay
    * the same computation as `rounds` unrolled CTE pairs.
    *
    * Scale shape: each round is one degree aggregation (map-side
    * partials over the edge frame) and two left-semi joins — O(E)
    * shuffle per round, no driver state beyond the per-round edge count
    * (which also powers the early exit). Per-round persist with
    * predecessor unpersist cuts lineage exactly like
    * [[connectedComponents]]; k-core converges in ≤ peel-depth rounds,
    * which for real dup graphs is single digits.
    *
    * Returns (node, degree) — every node of the surviving edge set and
    * its degree there, both engine-exact integers.
    */
  def kCore(pairs: DataFrame, k: Int, rounds: Int = 8,
            aCol: String = "da", bCol: String = "db"): DataFrame =
    kCoreWithRounds(pairs, k, rounds, aCol, bCol)._1

  /** [[kCore]] plus the number of peel rounds actually run before the
    * fixpoint (== measured peel depth when it converges under `rounds`) —
    * the observable that calibrates the `rounds = 8` contract constant:
    * specs assert measured ≤ rounds − 2 headroom, and tools.GraphDepth
    * records it at scale (SCALING.md). Package-private like
    * [[connectedComponentsWithRounds]]. */
  private[graft] def kCoreWithRounds(
      pairs: DataFrame, k: Int, rounds: Int = 8,
      aCol: String = "da", bCol: String = "db"): (DataFrame, Int) = {
    require(k >= 1 && rounds >= 1, s"k=$k, rounds=$rounds must be positive")
    val spark = pairs.sparkSession
    var edges = pairs.select(col(aCol).as("u"), col(bCol).as("v"))
      .where(col("u") =!= col("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var nEdges = edges.count()
    var r = 0
    var converged = false
    while (r < rounds && !converged) {
      val deg = edges.select(explode(array(col("u"), col("v"))).as("x"))
        .groupBy("x").agg(count(lit(1)).as("d"))
      val keep = deg.where(col("d") >= k).select("x")
      val next = edges
        .join(keep.withColumnRenamed("x", "u").hint("shuffle_hash"), Seq("u"),
          "left_semi")
        .join(keep.withColumnRenamed("x", "v").hint("shuffle_hash"), Seq("v"),
          "left_semi")
        .select("u", "v")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nNext = next.count() // materialize BEFORE dropping the parent
      edges.unpersist()
      edges = next
      converged = nNext == nEdges // fixpoint: every later round is a no-op
      nEdges = nNext
      r += 1
    }
    // Materialize the (node, degree) output eagerly (bounded: ≤ 2·|V|
    // rows of the surviving core) so the edge frame can be RELEASED here
    // — without this, a long-lived driver session accumulates one cached
    // edge frame per kCore invocation. localCheckpoint cuts the k-round
    // join lineage; its blocks are ContextCleaner-managed.
    val out = edges.select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy("node").agg(count(lit(1)).cast(LongType).as("degree"))
      .localCheckpoint(true)
    edges.unpersist()
    // converged in round r means round r was the first NO-OP round: the
    // peel DEPTH (rounds that removed something) is r − 1; an unconverged
    // run reports the cap itself (caller must treat that as "≥ rounds")
    (out, if (converged) r - 1 else r)
  }

  def pageRank(edges: DataFrame, iterations: Int = 5,
               scale: Long = 1000000000000L): DataFrame = {
    val sym = edges.select(col("da").as("src"), col("db").as("dst"))
      .unionByName(edges.select(col("db").as("src"), col("da").as("dst")))
    val deg = sym.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val adj = sym.join(deg, "src").repartition(col("src")).persist()
    val nNodes = adj.select(col("src")).distinct().count()
    if (nNodes == 0) {
      adj.unpersist()
      return edges.sparkSession.emptyDataFrame
        .select(lit(0L).as("node"), lit(0L).as("pr")).where(lit(false))
    }
    val r0 = scale / nNodes
    val teleport = 15L * r0
    var ranks = adj.select(col("src").as("node")).distinct()
      .withColumn("pr", lit(r0))
    for (_ <- 1 to iterations) {
      val prev = ranks
      ranks = adj.join(prev, col("src") === col("node"))
        .select(col("dst"), expr("pr div outdeg").as("__c"))
        .groupBy("dst")
        .agg(sum(col("__c").cast(DecimalType(38, 0))).as("__s"))
        .select(col("dst").as("node"),
          expr(s"CAST((CAST($teleport AS DECIMAL(38,0)) + 85 * __s) div 100 " +
            "AS BIGINT)").as("pr"))
    }
    ranks
  }

  /** X127 — semi-supervised LABEL PROPAGATION over an undirected pair
    * graph (the clamped-seed majority form: Zhu & Ghahramani 2002 /
    * Raghavan et al. 2007): seed nodes carry fixed labels; each round,
    * every non-seed node adopts the MAJORITY label among its neighbors'
    * current labels (unlabeled neighbors abstain, ties break to the
    * smallest label, a node with no labeled neighbor keeps its current
    * label), and seeds never move. This is the community LABELER for
    * near-dup graphs — propagate the curated sources' provenance across
    * LSH-verified duplicate edges and every unlabeled member of a
    * duplicate community inherits its dominant label — the decision
    * CC (X1f) cannot express: min-label components merge across one
    * spurious bridge edge, while a majority vote resists it.
    *
    * Shape: `rounds` is a small query constant, so the loop UNROLLS
    * into one declarative plan — per round, one edge-keyed hash join of
    * the symmetric edge frame against the current (node, label) frame,
    * one (node, label)-keyed count with map-side partials, and one
    * per-node argmax window — every frame is |E| or |V| rows, the
    * Pregel superstep re-expressed declaratively, nothing driver-side.
    * The edge frame is materialized once (`localCheckpoint`, the kCore
    * discipline) because every round reuses it — without it each round
    * would recompute the upstream pair generation (typically the full
    * LSH-verify pipeline) twice. Deterministic end to end: counts are
    * integers and ties break (count DESC, label ASC). Returns
    * (id, label) for every graph vertex; label stays NULL where no
    * seed's influence reached. */
  def labelPropagate(pairs: DataFrame, aCol: String, bCol: String,
                     seeds: DataFrame, seedIdCol: String, labelCol: String,
                     rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds=$rounds must be >= 1")
    val sym = pairs.select(col(aCol).as("s"), col(bCol).as("d"))
      .unionByName(pairs.select(col(bCol).as("s"), col(aCol).as("d")))
      .localCheckpoint(true)
    val seedsN = seeds.select(col(seedIdCol).as("id"),
      col(labelCol).as("__seed"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("s"))
      .orderBy(col("__c").desc, col("__nl").asc)
    var cur = sym.select(col("s").as("id")).distinct()
      .join(seedsN, Seq("id"), "left")
      .select(col("id"), col("__seed").as("label"))
    for (_ <- 1 to rounds) {
      val maj = sym
        .join(cur.select(col("id").as("d"), col("label").as("__nl")), "d")
        .where(col("__nl").isNotNull)
        .groupBy(col("s"), col("__nl")).agg(count(lit(1)).as("__c"))
        .withColumn("__r", row_number().over(w))
        .where(col("__r") === 1)
        .select(col("s").as("id"), col("__nl").as("__maj"))
      cur = cur.join(maj, Seq("id"), "left")
        .join(seedsN, Seq("id"), "left")
        .select(col("id"),
          coalesce(col("__seed"), col("__maj"), col("label")).as("label"))
    }
    cur
  }

  /** Connected components over a near-dup pair graph — the step that turns
    * pairwise candidates into DEDUP CLUSTERS (component id = min doc_id of
    * the cluster; keep one representative per component, drop the rest).
    *
    * ADAPTIVE SHORTCUTTING: near-dup graphs are overwhelmingly SHALLOW —
    * dup clusters of diameter 2-3 — and plain min-label propagation
    * closes them in a couple of one-join, one-action rounds; measured on
    * the corpus fixtures, any unconditional extra work per round is pure
    * overhead. So the first `plainRounds` rounds run the plain step
    * (every vertex takes the minimum of its own and its neighbors'
    * labels, one join + one aggregation, ONE action). Only if the graph
    * is still unconverged then — i.e. it has revealed real depth — do
    * subsequent rounds add POINTER DOUBLING (label ← label-of-label,
    * valid because every label value is itself an endpoint id; see the
    * induction note inline), under which the distance a minimum travels
    * roughly doubles per round: worst-case convergence stays
    * O(log diameter) rounds while the common shallow case pays exactly
    * the plain cost. Rounds drive Spark actions — the driver-side cost
    * that survives any cluster size — and the driver only ever sees
    * scalar convergence counts.
    *
    * `vertices`: one column `doc_id`; `edges`: (da, db). Returns
    * (doc_id, component) for every vertex (singletons keep their own id).
    *
    * `maxIter` bounds COMBINED rounds: the 2 plain warm-up rounds count,
    * so a diameter-d graph needs ≈ 2 + ceil(log2 d) + 1 rounds — callers
    * tuning maxIter near that bound should budget the warm-up; the
    * default 20 covers diameters into the hundreds of thousands.
    */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
                          maxIter: Int = 20): DataFrame =
    connectedComponentsWithRounds(vertices, edges, maxIter)._1

  /** connectedComponents plus the number of rounds actually run —
    * package-private so a spec can pin the O(log diameter) round count on
    * a chain fixture. */
  private[graft] def connectedComponentsWithRounds(
      vertices: DataFrame, edges: DataFrame,
      maxIter: Int = 20): (DataFrame, Int) = {
    val spark = vertices.sparkSession
    val sym = edges.select(col("da").as("src"), col("db").as("dst"))
      .unionByName(edges.select(col("db").as("src"), col("da").as("dst")))
      .persist()
    // Propagation runs ONLY over edge endpoints: a singleton's label never
    // changes, so joining the full vertex set through every round is pure
    // waste — at corpus scale the near-dup graph touches a few percent of
    // documents, so this shrinks every per-round shuffle by 10-100×.
    // Singletons are backfilled with their own id at the end (one lazy
    // left join, no extra action).
    //
    // Lineage MUST be truncated every round: chaining each iteration's
    // plan onto the last grows the logical plan exponentially — by
    // iteration ~10 the planner itself OOMs before any data moves. The
    // cut is a persisted row RDD wrapped back into a DataFrame (rather
    // than localCheckpoint, whose cached blocks can't be freed and pile
    // up across rounds/queries until GC stalls the executor); holding the
    // RDD handle lets each round explicitly unpersist its predecessor.
    // Each round runs as ONE action: materializing the next labels and
    // counting the changed rows share a single job (the count's filter
    // computes — and caches — every partition of the persisted RDD, so no
    // partition can later recompute through the dropped predecessor).
    def cut(df: DataFrame) = {
      val rdd = df.rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      (spark.createDataFrame(rdd, df.schema), rdd)
    }
    var (labels, labelsRdd) = cut(sym.select(col("src").as("doc_id")).distinct()
      .select(col("doc_id"), col("doc_id").as("component"),
        lit(false).as("__changed")))
    labelsRdd.count() // round 0 must be fully cached before round 1 drops it
    var converged = false
    var iter = 0
    val changedIdx = 2
    // rounds 0..plainRounds-1 run the cheap plain step; depth beyond that
    // switches the shortcut on (see the docstring)
    val plainRounds = 2
    while (!converged && iter < maxIter) {
      // every endpoint occurs as src (sym is symmetric) ⇒ inner join
      val nbrMin = sym
        .join(labels.select(col("doc_id").as("dst"),
          col("component").as("nbr_component")), "dst")
        .groupBy(col("src").as("doc_id"))
        .agg(min(col("nbr_component")).as("min_nbr"))
      // (next frame, its RDD, the shortcut round's intermediate RDD to
      // unpersist AFTER next materializes — None in plain rounds)
      val (next, nextRdd, roundStepped) =
        if (iter < plainRounds) {
          // plain round: one join + one aggregation, one action
          val (df, rdd) = cut(labels.drop("__changed")
            .join(nbrMin, Seq("doc_id"))
            .select(col("doc_id"),
              least(col("component"), col("min_nbr")).as("component"),
              (col("min_nbr") < col("component")).as("__changed")))
          (df, rdd, None)
        } else {
          // shortcut round — half-round: plain min propagation, persisted
          // AND materialized (count) before the doubling join consumes it
          // twice: without the barrier the join's two parent stages race,
          // and on a multi-executor cluster each can recompute the edge
          // join before any partition is cached
          val (stepped, steppedRdd) = cut(labels.drop("__changed")
            .join(nbrMin, Seq("doc_id"))
            .select(col("doc_id"),
              least(col("component"), col("min_nbr")).as("component"),
              col("component").as("__old")))
          steppedRdd.count()
          // pointer doubling: label ← stepped-label of the stepped label.
          // Sound because every label VALUE is an endpoint id of the same
          // component (induction: labels start as own ids; min over
          // neighbor labels and label-of-label both pick existing
          // labels), so the lookup is a self-join on the label; a label
          // already at its component minimum has no stepped row iff it
          // equals its own label — the coalesce keeps it. Monotone:
          // cc2 ≤ stepped ≤ old, so the changed flag stays exact.
          val (df, rdd) = cut(stepped.as("x")
            .join(stepped.select(col("doc_id").as("component"),
              col("component").as("__cc2")).as("y"), Seq("component"), "left")
            .select(col("doc_id"),
              coalesce(col("__cc2"), col("component")).as("component"),
              (coalesce(col("__cc2"), col("component")) < col("__old")).as("__changed")))
          (df, rdd, Some(steppedRdd))
        }
      // the round's convergence count — also the action that caches every
      // partition of `next`
      converged = nextRdd.filter(_.getBoolean(changedIdx)).count() == 0L
      roundStepped.foreach(_.unpersist(false))
      labelsRdd.unpersist(false)
      labels = next
      labelsRdd = nextRdd
      iter += 1
    }
    sym.unpersist()
    // Partial labels are WRONG labels (a >maxIter-diameter chain would
    // split one true cluster into several "canonical" docs — silent
    // under-deduplication); refuse to return them.
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter rounds — " +
          "component diameter exceeds maxIter; raise it")
    (vertices.select(col("doc_id"))
      .join(labels.select(col("doc_id"), col("component")), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("component"), col("doc_id")).as("component")),
      iter)
  }

  /** Edit-distance-verified near-dup pairs: MinHash+LSH candidate
    * generation, then Levenshtein verification over a bounded prefix of
    * each document. The prefix cap is the scale contract — Levenshtein is
    * O(prefixLen²) per pair, so verification cost is candidates ×
    * constant, never a function of document length; candidates are
    * LSH-bucket-confined, so no all-pairs stage exists. (Codegen'd
    * `levenshtein` expression — no UDF.)
    */
  def editDistancePairs(docs: DataFrame, idCol: String, textCol: String,
                        maxDist: Int, prefixLen: Int = 80,
                        k: Int = 16, bands: Int = 4): DataFrame = {
    val cand = minHashLsh(docs, idCol, textCol, k, bands)
    val txt = docs.select(col(idCol).as("doc_id"),
      substring(col(textCol), 1, prefixLen).as("prefix"))
    cand
      .join(txt.as("ta"), col("da") === col("ta.doc_id"))
      .join(txt.as("tb"), col("db") === col("tb.doc_id"))
      .select(col("da"), col("db"),
        levenshtein(col("ta.prefix"), col("tb.prefix")).cast("long").as("edit_dist"))
      .where(col("edit_dist") <= maxDist)
  }

  /** The COMPLETE corpus-dedup pipeline — the composition an LLM
    * training-data pipeline actually runs end to end:
    *
    *   1. exact dedup (content hash, deterministic keeper),
    *   2. MinHash+LSH candidates + exact Jaccard verification among the
    *      exact SURVIVORS only (near-dup work never sees exact dups —
    *      at 100 TB the exact stage typically removes the bulk, and it
    *      also guarantees no giant identical-text cluster can explode an
    *      LSH bucket),
    *   3. connected components over the verified pair graph,
    *   4. every input document mapped to its canonical surviving doc:
    *      doc → exact keeper → keeper's component minimum.
    *
    * Returns (doc_id, canonical); keep rows where doc_id == canonical.
    */
  def dedupPipeline(docs: DataFrame, idCol: String, textCol: String,
                    threshold: Double, k: Int = 16, bands: Int = 4,
                    maxDf: Int = Int.MaxValue): DataFrame = {
    // keepers feeds the doc→keeper map AND the survivor semi-join (and
    // through survivors, the LSH stage and the CC vertex set) — one lazy
    // materialization instead of re-hashing the corpus per consumer
    val hashed = docs.select(md5(col(textCol)).as("h"), col(idCol).as("doc_id"))
    val keepers = hashed.groupBy("h").agg(min(col("doc_id")).as("keeper"))
      .localCheckpoint(eager = false)
    val docKeeper = hashed.join(keepers, "h").select(col("doc_id"), col("keeper"))
    // survivors is NOT checkpointed: it carries the full text column, so
    // caching it stores the corpus; its two consumers re-run only a
    // cheap semi-join against the cached keepers
    val survivors = docs.join(keepers.select(col("keeper").as(idCol)),
      Seq(idCol), "left_semi")
    val pairs = minHashVerified(survivors, idCol, textCol, threshold, k, bands, maxDf)
      .select("da", "db")
    val comp = connectedComponents(survivors.select(col(idCol).as("doc_id")), pairs)
    docKeeper
      .join(comp.select(col("doc_id").as("keeper"),
        col("component").as("canonical")), "keeper")
      .select(col("doc_id"), col("canonical"))
  }

  /** Benchmark-contamination check — the eval-hygiene operator every LLM
    * training pipeline runs before shipping a corpus: for each training
    * document, how many of its distinct word-trigrams also occur in the
    * benchmark set, and is the overlap high enough to flag the document
    * as contaminated (n-gram–overlap decontamination, as described for
    * GPT-3/PaLM-style training-set filtering).
    *
    * Scale shape: the benchmark shingle set is tiny next to the corpus —
    * it is DEDUPLICATED and (by default) BROADCAST, so the corpus-side
    * scan is one map-side semi-join probe per shingle with NO shuffle of
    * the training corpus; the only shuffle is the per-doc overlap count
    * on doc_id. The broadcast is an explicit knob, not a hard-coded
    * assumption: a benchmark too big for the driver/broadcast limit sets
    * `broadcastBench = false` and the same plan degrades to a shuffle
    * semi-join on the shingle key. Returns
    * (doc_id, n_shingles, n_overlap, contaminated).
    */
  def contamination(train: DataFrame, bench: DataFrame, idCol: String,
                    textCol: String, minOverlap: Int = 1,
                    broadcastBench: Boolean = true): DataFrame = {
    val trainSh = shingles(train, idCol, textCol).distinct()
    val benchSh0 = shingles(bench, idCol, textCol).select("sh").distinct()
    val benchSh = if (broadcastBench) broadcast(benchSh0) else benchSh0
    val overlap = trainSh
      .join(benchSh, Seq("sh"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
    trainSh.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
      .join(overlap, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        (coalesce(col("n_overlap"), lit(0L)) >= minOverlap).as("contaminated"))
  }

  /** Bloom-prefiltered contamination — [[contamination]]'s scale path for
    * benchmarks TOO BIG to broadcast as a shingle set: fit a Bloom filter
    * over the benchmark shingle hashes (one aggregate; the blob is
    * numBits/8 bytes regardless of benchmark row count — at the ~8
    * bits/item of the defaults that is ~2-3% FP, so 10⁸ shingles need
    * ~100 MB of bits, 10⁷ need ~10 MB), ship it as a literal, and probe
    * it MAP-SIDE over the corpus shingles so only probable hits reach
    * the exact verification join. The exact semi-join then removes the
    * false positives, so the result is IDENTICAL to [[contamination]] —
    * the bloom stage changes the shuffle volume (corpus-sized →
    * hit-sized), never the answer. This is the standard two-sided
    * decontamination shape at 100 TB: sketch small enough to broadcast,
    * exact join only on survivors.
    *
    * Uses Spark's own BloomFilterAggregate/BloomFilterMightContain
    * (registered as graft_bloom_agg / graft_might_contain by
    * [[graft.GraftExtensions]]) — the sketch behind Spark's runtime join
    * filters, here driven explicitly as a library operator. Spark
    * SILENTLY CLAMPS the fit to
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems` /
    * `.maxNumBits` (defaults 4M / 67,108,864 = 8 MB) — an oversized
    * request would degrade the FP rate toward 1 and defeat the prefilter
    * without any error, so sizes beyond the session's caps are rejected
    * here with a pointer to the confs to raise.
    *
    * The benchmark shingle frame is needed twice (the fit action, then
    * the FP-removing semi-join) in two separate jobs where ReuseExchange
    * cannot apply, so it is persisted (memory-and-disk) across both; the
    * cache is dropped when the returned frame no longer needs it — i.e.
    * by Spark's LRU, or explicitly via `spark.catalog.clearCache()`
    * after consuming the result.
    */
  def bloomContamination(train: DataFrame, bench: DataFrame, idCol: String,
                         textCol: String, minOverlap: Int = 1,
                         expectedItems: Long = 4000000L,
                         numBits: Long = 33554432L): DataFrame = {
    val spark = train.sparkSession
    graft.GraftExtensions.ensure(spark)
    def cap(key: String, default: Long): Long =
      spark.conf.getOption(s"spark.sql.optimizer.runtime.bloomFilter.$key")
        .map(_.toLong).getOrElse(default)
    val maxItems = cap("maxNumItems", 4000000L)
    val maxBits = cap("maxNumBits", 67108864L)
    require(expectedItems <= maxItems && numBits <= maxBits,
      s"requested bloom size ($expectedItems items / $numBits bits) exceeds " +
        s"the session caps ($maxItems / $maxBits); Spark would silently " +
        "clamp the fit and ruin the FP rate — raise " +
        "spark.sql.optimizer.runtime.bloomFilter.maxNumItems/.maxNumBits " +
        "to match the benchmark size")
    // The corpus-sized train shingle scan feeds two consumers in separate
    // jobs (the bloom-survivor filter and the n_shingles totals) where
    // ReuseExchange cannot apply — persist it like benchSh; at scale the
    // train scan is the dominant cost and must not run twice. Lifetime
    // contract is benchSh's (docstring above): LRU-evicted, or freed
    // explicitly via spark.catalog.clearCache() once the result is
    // consumed — long-lived sessions calling this repeatedly should do
    // the latter, as each call persists a fresh corpus-sized frame.
    val trainSh = shingles(train, idCol, textCol).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val benchSh = shingles(bench, idCol, textCol).select("sh").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // fit: one aggregate over the benchmark shingle hashes → bounded blob
    // (driver-collected like the IVF/PQ model fits; size is numBits/8,
    // independent of the benchmark's row count). This action also
    // materializes the benchSh cache for the semi-join below.
    val blob = benchSh
      .agg(call_function("graft_bloom_agg", xxhash64(col("sh")),
        lit(expectedItems), lit(numBits)).as("f"))
      .head.getAs[Array[Byte]](0)
    val survivors =
      if (blob == null) trainSh.limit(0) // empty benchmark → empty filter
      else trainSh.where(call_function("graft_might_contain", lit(blob),
        xxhash64(col("sh"))))
    // exact verification on bloom survivors only — NOT broadcast: the
    // benchmark is assumed broadcast-too-big here (else use contamination);
    // the shuffle's corpus side is survivor-sized thanks to the prefilter
    val overlap = survivors.join(benchSh, Seq("sh"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
    trainSh.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
      .join(overlap, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        (coalesce(col("n_overlap"), lit(0L)) >= minOverlap).as("contaminated"))
  }

  /** Near-duplicate graph degree — the dup-graph DIAGNOSTIC: how many
    * near-copies each document has, over any pair frame a dedup stage
    * produced (MinHash-verified, SimHash, embedding cosine). Degree
    * distribution is the first thing to inspect before cutting: a heavy
    * tail means template/boilerplate families (candidates for removal
    * wholesale), degree-1 islands mean ordinary crawl dupes. Docs with no
    * partner report degree 0 so the output is corpus-complete.
    *
    * Scale: the union+count is pair-sized; the join back to the corpus is
    * one equi-join on the doc key. Nothing quadratic — the pairs were
    * already bounded by the producing stage's banding.
    */
  def dupDegree(docs: DataFrame, pairs: DataFrame, idCol: String,
                aCol: String = "da", bCol: String = "db"): DataFrame = {
    // explode, not union-of-projections: the pair frame is typically an
    // expensive dedup pipeline — one map-side explode consumes it once,
    // where a union would evaluate the producing subtree twice
    val deg = pairs
      .select(explode(array(col(aCol), col(bCol))).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("degree"))
    docs.select(col(idCol).as("doc_id"))
      .join(deg, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("degree"), lit(0L)).as("degree"))
  }

  /** Triangles in the near-duplicate pair graph — the cluster-DENSITY
    * diagnostic that degree ([[dupDegree]]) cannot give: a dup family of
    * n docs with zero triangles is a CHAIN (each doc similar only to its
    * neighbors — cutting to one keeper loses content), while a triangle-
    * rich family is a CLIQUE of true mutual copies (safe to collapse).
    * Input is any canonical pair frame (aCol < bCol per row, as every
    * dedup stage here emits); output is one row per triangle (a < b < c).
    *
    * Scale shape: the classic two-join enumeration — wedges on a shared
    * endpoint, closed by probing the third edge — over the PAIR frame,
    * which dedup keeps sparse; each join keys on a doc id, so the work
    * is edge-frame-shuffle-sized plus wedge-count intermediate rows.
    * Edges are RE-ORIENTED low→high by (degree, id) before the joins
    * ([[orientByDegree]]): every wedge then fans out from its ≺-minimum
    * vertex, whose out-degree is provably O(√E), so the wedge
    * intermediate is O(E^1.5) TOTAL regardless of skew — an id-ordered
    * orientation blows up quadratically on a power-law hub whose id
    * sits mid-order ((in)×(out) wedges through the hub), exactly the
    * shape template/boilerplate dup families produce at web scale. The
    * degree pass is one explode + count ([[dupDegree]]'s shape) and two
    * broadcast-free equi-joins to tag endpoints — edge-frame-sized.
    * Output (a < b < c by id) is identical to the naive orientation's
    * (differential-pinned in DedupDifferentialSpec).
    */
  def triangles(pairs: DataFrame, aCol: String = "da",
                bCol: String = "db"): DataFrame = {
    val o = orientByDegree(pairs, aCol, bCol)
    // wedge: two ≺-out-edges of s, ordered between themselves by the
    // same (degree, id) key so each unordered neighbor pair appears once
    val wedge = o.as("o1")
      .join(o.as("o2"),
        col("o1.s") === col("o2.s") &&
          (col("o1.dt") < col("o2.dt") ||
            (col("o1.dt") === col("o2.dt") && col("o1.t") < col("o2.t"))))
      .select(col("o1.s").as("x"), col("o1.t").as("y"), col("o2.t").as("z"))
    // close the wedge: y≺z, so the closing edge is oriented y→z
    val tri = wedge.join(o.as("e3"),
        col("e3.s") === col("y") && col("e3.t") === col("z"))
      .select(sort_array(array(col("x"), col("y"), col("z"))).as("__t"))
    tri.select(col("__t").getItem(0).as("a"), col("__t").getItem(1).as("b"),
      col("__t").getItem(2).as("c"))
  }

  /** Edges of a canonical pair frame re-oriented low→high by the total
    * order ≺ = (degree, id): output (s, t, dt) with s ≺ t and dt = t's
    * degree (carried so the wedge join can ≺-order neighbors without a
    * third degree join). The ≺-orientation bounds every vertex's
    * OUT-degree at O(√E) — the classic triangle-counting trick. */
  def orientByDegree(pairs: DataFrame, aCol: String = "da",
                     bCol: String = "db"): DataFrame = {
    val e0 = pairs.select(col(aCol).as("u"), col(bCol).as("v"))
    val deg = e0.select(explode(array(col("u"), col("v"))).as("x"))
      .groupBy("x").agg(count(lit(1)).as("d"))
    val uLtV = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    e0
      .join(deg.select(col("x").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("x").as("v"), col("d").as("dv")), "v")
      .select(when(uLtV, col("u")).otherwise(col("v")).as("s"),
        when(uLtV, col("v")).otherwise(col("u")).as("t"),
        when(uLtV, col("dv")).otherwise(col("du")).as("dt"))
  }

  /** The naive id-ordered enumeration ((a,b)⋈(b,c) probe (a,c)) — kept
    * as the differential baseline for [[triangles]]; correct, but its
    * wedge intermediate is unbounded under degree skew (see the
    * orientation note there). */
  def trianglesIdOrdered(pairs: DataFrame, aCol: String = "da",
                         bCol: String = "db"): DataFrame = {
    val e = pairs.select(col(aCol).as("u"), col(bCol).as("v"))
    e.as("e1")
      .join(e.as("e2"), col("e1.v") === col("e2.u"))
      .join(e.as("e3"),
        col("e3.u") === col("e1.u") && col("e3.v") === col("e2.v"))
      .select(col("e1.u").as("a"), col("e1.v").as("b"), col("e2.v").as("c"))
  }

  /** CROSS-CORPUS near-duplicate pairs — FUZZY decontamination, the
    * production complement of `contamination`'s exact-shingle overlap: a
    * paraphrased or lightly-edited benchmark item leaks into training
    * data without sharing enough exact n-grams to trip the overlap
    * count, but its shingle JACCARD against the source stays high.
    *
    * MinHash+LSH candidates ACROSS the two corpora (both sides banded
    * with the same hash family, so the (band, value) bucket join pairs
    * left docs only with right docs sharing a bucket), then exact
    * Jaccard verification on the candidates only, df-capped per corpus.
    * Returns (da: left id, db: right id, jaccard ≥ threshold).
    *
    * Scale shape: identical to minHashVerified — the bucket join IS the
    * shuffle partitioning and verification never sees non-candidates.
    * The benchmark side is typically tiny, but nothing here assumes it.
    */
  def crossJaccardVerified(left: DataFrame, right: DataFrame,
                           idCol: String, textCol: String,
                           threshold: Double, k: Int = 16, bands: Int = 4,
                           maxDf: Int = Int.MaxValue): DataFrame = {
    val shL = shingles(left, idCol, textCol).distinct()
    val shR = shingles(right, idCol, textCol).distinct()
    val cand = bandedSignatures(shL, k, bands).as("a")
      .join(bandedSignatures(shR, k, bands).as("c").hint("merge"),
        col("a.b") === col("c.b") && col("a.bh") === col("c.bh"))
      .select(col("a.doc_id").as("da"), col("c.doc_id").as("db"))
      .distinct()
    val hL = capDf(shL.select(col("doc_id"), xxhash64(col("sh")).as("sh")), maxDf)
    val hR = capDf(shR.select(col("doc_id"), xxhash64(col("sh")).as("sh")), maxDf)
    val sizesL = hL.groupBy("doc_id").agg(count(lit(1)).as("na"))
    val sizesR = hR.groupBy("doc_id").agg(count(lit(1)).as("nb"))
    val inter = cand
      .join(hL.as("x"), col("da") === col("x.doc_id"))
      .join(hR.as("y"), col("db") === col("y.doc_id") && col("x.sh") === col("y.sh"))
      .groupBy(col("da"), col("db"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizesL.withColumnRenamed("doc_id", "da"), "da")
      .join(sizesR.withColumnRenamed("doc_id", "db"), "db")
      .withColumn("jaccard",
        round(col("inter") / (col("na") + col("nb") - col("inter")), 6))
      .where(col("jaccard") >= threshold)
      .select(col("da"), col("db"), col("jaccard"))
  }

  /** Exact n-gram (word-trigram) Jaccard near-dup pairs: shingle-key join,
    * |A∩B| / (|A|+|B|−|A∩B|) ≥ threshold. Exact verification — at scale
    * this runs AFTER minHashLsh restricts to candidates; standalone it is
    * bounded by shingle-frequency fan-out (the join shuffles on the
    * shingle, not doc×doc).
    */
  def ngramJaccard(docs: DataFrame, idCol: String, textCol: String,
                   threshold: Double, maxDf: Int = Int.MaxValue): DataFrame = {
    // Join on the 64-bit hash of the shingle, not the string: an 8-byte
    // shuffle/join key instead of a ~30-char one. A cross-shingle xxhash64
    // collision (P ≈ n²/2⁶⁵) would add a spurious intersection element;
    // negligible even at 10⁹ distinct shingles.
    // lazy checkpoint: three consumers (sizes + both self-join sides)
    // of the explode + distinct + df-cap pipeline
    val sh = capDf(shingles(docs, idCol, textCol)
      .select(col("doc_id"), xxhash64(col("sh")).as("sh"))
      .distinct(), maxDf)
      .localCheckpoint(eager = false)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = sh.as("a")
      .join(sh.as("c"), col("a.sh") === col("c.sh") && col("c.doc_id") > col("a.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("c.doc_id").as("db"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "da").withColumnRenamed("n", "na"), "da")
      .join(sizes.withColumnRenamed("doc_id", "db").withColumnRenamed("n", "nb"), "db")
      .withColumn("jaccard",
        round(col("inter") / (col("na") + col("nb") - col("inter")), 6))
      .where(col("jaccard") >= threshold)
      .select(col("da"), col("db"), col("jaccard"))
  }

  /** X130 — EXACT similarity self-join via PREFIX FILTERING (SSJoin,
    * Chaudhuri/Ganjam/Kaushik ICDE 2006; the ppjoin family): all pairs
    * with trigram-shingle Jaccard ≥ `threshold`, with candidate
    * generation pruned losslessly by the prefix principle — order each
    * document's distinct shingles by one GLOBAL total order (ascending
    * global df, ties by shingle hash: rarest first), keep only the
    * first |S| − ⌈t·|S|⌉ + 1 as its PREFIX, and join prefixes. Why
    * lossless: Jaccard ≥ t ⇒ |A∩B| ≥ t·|A∪B| ≥ ⌈t·|A|⌉ and ⌈t·|B|⌉;
    * the smallest common shingle under the global order then sits
    * within BOTH prefixes (≥ |A∩B|−1 common elements order after it,
    * so its position in A is ≤ |A|−⌈t·|A|⌉+1 — the pigeonhole), so
    * every qualifying pair is a prefix-join candidate.
    *
    * This is the EXACT complement to MinHash-LSH (X1b): LSH can MISS a
    * qualifying pair (banding is probabilistic); the prefix filter
    * cannot — spec-pinned EQUAL to [[ngramJaccard]] at the same
    * threshold. The scale win over ngramJaccard's full shingle
    * self-join: candidate volume drops from Σ df² over ALL shingles to
    * Σ df² over prefix occurrences — and prefixes are drawn from the
    * RARE end of the df distribution by construction, so the
    * boilerplate heavy tail that dominates the full join at 100 TB
    * almost never generates a candidate. Verification then computes
    * true Jaccard over candidates' FULL shingle sets only.
    *
    * The prefix length uses tEff = threshold − 1e-6 in exact integer
    * arithmetic (⌈n·tEffMicro/1e6⌉ via div): the output filter accepts
    * ROUND-6 jaccard ≥ threshold, so a pair whose true Jaccard sits up
    * to 5e-7 below the threshold can round up into the result — the
    * 1e-6 slack extends the prefix to cover exactly that band, keeping
    * the ngramJaccard-equality contract airtight at its 6-dp
    * resolution. */
  def prefixFilterJoin(docs: DataFrame, idCol: String, textCol: String,
                       threshold: Double, maxDf: Int = Int.MaxValue)
  : DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold=$threshold outside (0, 1]")
    val tMicroEff = math.max(1L, math.round(threshold * 1e6) - 1L)
    // LAZY-checkpoint the df-capped shingle frame: four consumers (sizes,
    // dfreq, the prefix construction, the verification sets) would each
    // recompute the shingle explode + distinct + df-cap semi-join
    // otherwise — their downstream exchanges differ, so ReuseExchange
    // cannot share them.
    val sh = capDf(shingles(docs, idCol, textCol)
      .select(col("doc_id"), xxhash64(col("sh")).as("sh"))
      .distinct(), maxDf)
      .localCheckpoint(eager = false)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val dfreq = sh.groupBy("sh").agg(count(lit(1)).as("__df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("__df").asc, col("sh").asc)
    val prefix = sh.join(dfreq, "sh").join(sizes, "doc_id")
      .withColumn("__r", row_number().over(w))
      .where(col("__r") <=
        col("n") - expr(s"(n * $tMicroEff + 999999) div 1000000") + 1)
      .select(col("doc_id"), col("sh"), col("n"), col("__r"))
    // LENGTH filter (ssjoin's second lossless prune): J ≥ t ⇒ |A∩B| ≤
    // min(|A|,|B|) and J = inter/union ≤ min/max, so min·10⁶ ≥
    // max·tMicroEff for every pair the final round-6 filter can accept
    // (tMicroEff/10⁶ ≤ t − 5e-7 ≤ round-6-accepted J ≤ min/max) — pairs
    // of very different sizes never reach the array-intersect verify.
    val raw = prefix.as("a").join(prefix.as("c"),
        col("a.sh") === col("c.sh") && col("c.doc_id") > col("a.doc_id")
          && col("c.n") * 1000000L >= col("a.n") * tMicroEff
          && col("a.n") * 1000000L >= col("c.n") * tMicroEff)
      .select(col("a.doc_id").as("da"), col("c.doc_id").as("db"),
        col("a.n").as("__na"), col("c.n").as("__nb"),
        col("a.__r").as("__ra"), col("c.__r").as("__rb"))
    // POSITIONAL filter (ppjoin, Xiao/Wang/Lin WWW'08), also lossless:
    // the pair's globally-FIRST common shingle has per-doc prefix
    // positions (min __ra, min __rb) — the two minima belong to that one
    // shingle because both docs rank by the same global order — and every
    // other common shingle sorts after it in BOTH docs, so inter ≤ 1 +
    // min(na−ra, nb−rb). A qualifying pair needs inter ≥ t'(na+nb)/(1+t')
    // (J = i/(na+nb−i) ≥ t' solved for i, t' = tMicroEff/10⁶ keeping the
    // round-6 band), so candidates whose bound can't reach it are dropped
    // BEFORE the array-intersect verification — the same groupBy exchange
    // the old distinct() already paid, zero extra shuffles.
    val cand = raw.groupBy(col("da"), col("db"))
      .agg(max(col("__na")).as("__na"), max(col("__nb")).as("__nb"),
        min(col("__ra")).as("__ra"), min(col("__rb")).as("__rb"))
      .where((lit(1L) + least(col("__na") - col("__ra"),
          col("__nb") - col("__rb"))) * (lit(1000000L) + lit(tMicroEff))
        >= lit(tMicroEff) * (col("__na") + col("__nb")))
      .select(col("da"), col("db"))
    // verification, ppjoin's actual shape: each candidate PAIR fetches
    // both docs' full shingle sets as sorted arrays (two doc-keyed hash
    // joins, |cand| rows) and intersects ROW-LOCALLY — never the
    // per-shingle row join (cand ⋈ exploded shingles would blow up to
    // |cand|·|shingles-per-doc| rows before matching the other side;
    // measured 26× slower at sf1)
    val sets = sh.groupBy("doc_id")
      .agg(sort_array(collect_list(col("sh"))).as("__set"),
        count(lit(1)).as("n"))
    cand
      .join(sets.select(col("doc_id").as("da"), col("__set").as("__sa"),
        col("n").as("na")), "da")
      .join(sets.select(col("doc_id").as("db"), col("__set").as("__sb"),
        col("n").as("nb")), "db")
      .withColumn("inter",
        size(array_intersect(col("__sa"), col("__sb"))).cast(LongType))
      .withColumn("jaccard",
        round(col("inter") / (col("na") + col("nb") - col("inter")), 6))
      .where(col("jaccard") >= threshold)
      .select(col("da"), col("db"), col("jaccard"))
  }

  /** INCREMENTAL dedup — the reference's "process exactly the delta"
    * model (README.md:10-13) applied to deduplication: classify each NEW
    * document against the EXISTING corpus without ever re-pairing the
    * corpus with itself. Exact match first (md5 content hash, min-id
    * keeper — corpus-sized but just a hash join), then MinHash+LSH
    * candidates ACROSS the two frames with exact Jaccard verification
    * ([[crossJaccardVerified]] — delta docs only ever pair with corpus
    * docs sharing an LSH bucket), best match per delta doc by (jaccard
    * desc, id asc).
    *
    * Output, one row per delta doc: (doc_id, status ∈ exact_dup |
    * near_dup | new, match_id: the matched corpus doc or NULL, jaccard:
    * NULL unless near_dup). Exact wins over near: a byte-identical copy
    * reports exact_dup with no jaccard.
    *
    * Scale: this is the shape that keeps continuous ingestion linear — a
    * daily delta pays delta-sized banding + bucket joins against the
    * corpus index, not a corpus×corpus recluster; the corpus side's
    * signatures are delta-independent and cacheable across runs.
    */
  /** Precomputed corpus side of [[dedupDelta]] — the frames whose content
    * does NOT depend on the delta, built once and reused across ingestion
    * runs: LSH band buckets, df-capped hashed shingles with per-doc sizes,
    * and the exact-hash keeper table. `persist=true` (default) caches all
    * four at MEMORY_AND_DISK; call [[DeltaIndex.unpersist]] when retiring
    * the index. At 100 TB this is the difference between a daily delta
    * paying delta-sized work and re-shingling the whole corpus each run.
    */
  final case class DeltaIndex private[graft] (
      bands: DataFrame, shingles: DataFrame, sizes: DataFrame,
      exact: DataFrame, hotShingles: Option[DataFrame], k: Int,
      nBands: Int, maxDf: Int) {
    def unpersist(): Unit =
      (Seq(bands, shingles, sizes, exact) ++ hotShingles)
        .foreach(_.unpersist(false))
  }

  /** Build the corpus-side [[DeltaIndex]] for [[dedupDeltaIndexed]]. Same
    * parameters as [[dedupDelta]]. The df cap is CORPUS-df based on both
    * sides: the index drops corpus shingles with df > maxDf from its own
    * frames AND records that hot-shingle set (tiny — hot shingles are by
    * definition few) so the delta side can drop the same shingles. One
    * consistent filtered shingle space, and — the load-bearing property —
    * a delta document's verdict depends only on its own shingles and the
    * frozen index, NEVER on which other documents share its batch: any
    * partition of the delta (streaming micro-batches, chunked ingests)
    * classifies identically to the one-shot run (spec-pinned,
    * StreamingSpec). */
  def buildDeltaIndex(corpus: DataFrame, idCol: String, textCol: String,
                      k: Int = 16, bands: Int = 4,
                      maxDf: Int = Int.MaxValue,
                      persist: Boolean = true): DeltaIndex = {
    val shR0 = shingles(corpus, idCol, textCol).distinct()
    // persist=true materializes eagerly, so the corpus-sized distinct
    // shingle frame must be shared PHYSICALLY across the four frames —
    // exchange reuse does not cross InMemoryRelation boundaries, and
    // without the temporary cache the most expensive shuffle (distinct
    // over all shingle rows) would run once per frame. persist=false
    // (the one-shot dedupDelta path) stays lazy: there the consumers sit
    // in one plan and ReuseExchange shares the subtree as usual.
    val shR = if (persist)
      shR0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else shR0
    val banded = bandedSignatures(shR, k, bands)
    val hAll = shR.select(col("doc_id"), xxhash64(col("sh")).as("sh"))
    // the corpus-df hot set, shared by both sides of every future delta
    // run (see the DeltaIndex scaladoc): None when the cap is off
    val hot =
      if (maxDf == Int.MaxValue) None
      else Some(hAll.groupBy("sh").agg(count(lit(1)).as("__df"))
        .where(col("__df") > maxDf).select("sh"))
    val hR = hot.map(h => hAll.join(h, Seq("sh"), "left_anti"))
      .getOrElse(hAll)
    val sizes = hR.groupBy("doc_id").agg(count(lit(1)).as("nb"))
    val exact = corpus.select(col(idCol).as("cid"), md5(col(textCol)).as("h"))
      .groupBy("h").agg(min(col("cid")).as("exact_match"))
    def p(df: DataFrame) =
      if (persist)
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else df
    val index = DeltaIndex(p(banded), p(hR), p(sizes), p(exact),
      hot.map(p), k, bands, maxDf)
    if (persist) {
      // materialize the index frames off the shared shingle cache,
      // then drop the build-only cache
      (Seq(index.bands, index.shingles, index.sizes, index.exact)
        ++ index.hotShingles).foreach(_.count())
      shR.unpersist(false)
    }
    index
  }

  /** [[dedupDelta]] against a prebuilt [[DeltaIndex]] — identical output,
    * delta-sized work only: the delta is shingled/banded/hashed, bucket-
    * joined against the index's bands, verified against the index's
    * capped shingles, and exact-matched against the index's hash table.
    */
  def dedupDeltaIndexed(index: DeltaIndex, delta: DataFrame, idCol: String,
                        textCol: String, threshold: Double): DataFrame = {
    val shL = shingles(delta, idCol, textCol).distinct()
    // NO merge hint here (contrast minHashLshFromShingles): that hint's
    // rationale is ReuseExchange across a SELF-join's identical sides;
    // this join is asymmetric — forcing sort-merge would re-shuffle the
    // corpus-sized cached bands on every delta run, while letting AQE
    // broadcast the delta side keeps each incremental run corpus-shuffle-
    // free (a scan of the cache, no exchange of it)
    val cand = bandedSignatures(shL, index.k, index.nBands).as("a")
      .join(index.bands.as("c"),
        col("a.b") === col("c.b") && col("a.bh") === col("c.bh"))
      .select(col("a.doc_id").as("da"), col("c.doc_id").as("db"))
      .distinct()
    // the delta side drops the SAME corpus-df hot shingles the index
    // dropped (anti-join against the tiny hot set) — never a df computed
    // over the delta itself, so a document's verdict is independent of
    // which other documents share its delta/batch (see DeltaIndex doc)
    val hL0 = shL.select(col("doc_id"), xxhash64(col("sh")).as("sh"))
    val hL = index.hotShingles
      .map(h => hL0.join(h, Seq("sh"), "left_anti")).getOrElse(hL0)
    val sizesL = hL.groupBy("doc_id").agg(count(lit(1)).as("na"))
    val shr = index.shingles
      .select(col("doc_id").as("__db2"), col("sh").as("__shr"))
    val inter = cand
      .join(hL.withColumnRenamed("doc_id", "da"), "da")
      .join(shr, col("db") === col("__db2") && col("sh") === col("__shr"))
      .groupBy("da", "db").agg(count(lit(1)).as("inter"))
    val fuzzy = inter
      .join(sizesL.withColumnRenamed("doc_id", "da"), "da")
      .join(index.sizes.withColumnRenamed("doc_id", "db"), "db")
      .withColumn("jaccard",
        round(col("inter") / (col("na") + col("nb") - col("inter")), 6))
      .where(col("jaccard") >= threshold)
      .select(col("da"), col("db"), col("jaccard"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("da")).orderBy(col("jaccard").desc, col("db").asc)
    val best = fuzzy
      .withColumn("__r", row_number().over(w)).where(col("__r") === 1)
      .select(col("da").as("doc_id"), col("db").as("near_match"),
        col("jaccard"))
    val dh = delta.select(col(idCol).as("doc_id"), md5(col(textCol)).as("h"))
    dh.join(index.exact, Seq("h"), "left")
      .select(col("doc_id"), col("exact_match"))
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("exact_match").isNotNull, lit("exact_dup"))
          .when(col("near_match").isNotNull, lit("near_dup"))
          .otherwise(lit("new")).as("status"),
        coalesce(col("exact_match"), col("near_match")).as("match_id"),
        when(col("exact_match").isNull, col("jaccard")).as("jaccard"))
  }

  def dedupDelta(corpus: DataFrame, delta: DataFrame, idCol: String,
                 textCol: String, threshold: Double, k: Int = 16,
                 bands: Int = 4, maxDf: Int = Int.MaxValue): DataFrame =
    // one lazy plan over an unpersisted index: equivalence with the
    // indexed form holds by construction, not by parallel implementation
    dedupDeltaIndexed(
      buildDeltaIndex(corpus, idCol, textCol, k, bands, maxDf,
        persist = false),
      delta, idCol, textCol, threshold)

  /** X66 — exact dedup WITH PROVENANCE: the audit-trail form of [[exact]].
    * Shipping a deduplicated corpus without recording what was removed
    * makes takedown requests, contamination tracebacks and mixture
    * accounting impossible — so per surviving document this emits the
    * removal evidence: how many copies were dropped, WHICH ids (sorted,
    * capped at `maxIds` — the cap is applied by RANK before any
    * collection, so a viral million-copy document costs maxIds list
    * slots, not an unbounded `collect_list`), and how many distinct
    * sources the group spanned (cross-source duplication is the
    * interesting curation signal — boilerplate, not crawl overlap).
    *
    * One hash-shuffle total: the rank window and the group aggregation
    * share the md5 partitioning. The id list is serialized as a
    * comma-joined string — deterministic, engine-comparable, and
    * bounded. Output: (doc_id, n_dups, removed_ids, n_sources).
    */
  def exactWithProvenance(docs: DataFrame, idCol: String, textCol: String,
                          srcCol: String, maxIds: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("h").orderBy(col("doc_id").asc)
    docs.select(md5(col(textCol)).as("h"), col(idCol).as("doc_id"),
        col(srcCol).as("src"))
      .withColumn("__rnk", row_number().over(w))
      .groupBy("h")
      .agg(min(col("doc_id")).as("doc_id"),
        (count(lit(1)) - 1).cast(LongType).as("n_dups"),
        array_join(sort_array(collect_list(
          when(col("__rnk").between(2, maxIds + 1), col("doc_id")))), ",")
          .as("removed_ids"),
        countDistinct(col("src")).cast(LongType).as("n_sources"))
      .drop("h")
  }

  /** X85b — exact substring-duplication detection (the ExactSubstr
    * complement of doc-level X1: two documents that are NOT near-dups can
    * still share a long verbatim passage — boilerplate, licenses, quoted
    * spam — and substring dedup is what catches it).
    *
    * Every k-char window of every document is fingerprinted (md5, 52-bit
    * prefix); a window occurring in ≥2 distinct documents marks both as
    * substring-duplicated. Selection is CONTENT-DEFINED: only windows
    * whose md5's last nibble ∈ {0,4,8,c} survive (1/4 of positions),
    * and because the choice depends on the window BYTES alone, both
    * copies of a shared passage select the SAME windows regardless of
    * their alignment inside each document — the winnowing property that
    * a fixed-stride grid lacks. A shared passage of length L ≥ k
    * contains L−k+1 windows and is missed only if every one is
    * deselected: P(miss) = (3/4)^(L−k+1), under 1% once L ≥ k+15.
    *
    * Scale shape: window generation and selection are MAP-SIDE (explode
    * + filter inside codegen, no pre-selection shuffle), so the TEXT is
    * scanned and exploded exactly ONCE and the only shuffled payload is
    * |chars|/4 rows of (doc_id, 13-hex fp). The plan is a single linear
    * pipeline on that reduced frame — per-doc distinct, an
    * fp-partitioned window count (how many docs hold each fingerprint;
    * no join-back, so the optimizer cannot split the pipeline into
    * per-consumer re-scans), and one doc-keyed aggregation. Nothing is
    * ever joined all-pairs; the fingerprint group IS the partitioning.
    *
    * Output: (doc_id, n_win, n_dup_win, has_dup) for EVERY input doc —
    * docs shorter than k (or with no selected window) report zeros.
    */
  def substringDup(docs: DataFrame, idCol: String, textCol: String,
                   k: Int = 24): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ids = docs.select(col(idCol).as("doc_id"))
    val wins = docs.select(col(idCol).as("doc_id"),
        explode(when(length(col(textCol)) >= k,
            transform(sequence(lit(1), length(col(textCol)) - (k - 1)),
              i => col(textCol).substr(i, lit(k))))
          .otherwise(array())).as("__w"))
      .select(col("doc_id"), md5(col("__w")).as("__h"))
      .where(substring(col("__h"), 32, 1).isin("0", "4", "8", "c"))
      .select(col("doc_id"), substring(col("__h"), 1, 13).as("fp"))
      .distinct()
    // rows are distinct on (doc_id, fp), so count-per-fp IS the distinct
    // doc count of the fingerprint
    val withNd = wins.withColumn("__nd",
      count(lit(1)).over(Window.partitionBy("fp")))
    val perDoc = withNd.groupBy("doc_id").agg(
      count(lit(1)).as("n_win"),
      sum(when(col("__nd") >= 2, 1L).otherwise(0L)).as("n_dup_win"))
    ids.join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_win"), lit(0L)).as("n_win"),
        coalesce(col("n_dup_win"), lit(0L)).as("n_dup_win"))
      .withColumn("has_dup",
        (col("n_dup_win") > 0).cast("int").cast(LongType))
  }

  /** X96 — canonical document selection: for every near-dup cluster
    * (connected components over the LSH candidate graph), keep the BEST
    * copy by quality score instead of the arbitrary min-id — the
    * curation form of dedup (a scraped mirror with cleaner text beats
    * the truncated original). Composition of three declared operators:
    * X1b candidates → X1g components → X3 quality, then one
    * component-partitioned argmax with the ROUNDED quality (rank-safe
    * across engines) and doc id as tiebreak.
    *
    * Output: one row per cluster — (component, keeper, n_members,
    * best_quality). Scale: the window partitions by component (cluster
    * width bounds it); everything upstream inherits the cited
    * operators' shapes.
    */
  def canonicalDocs(docs: DataFrame, idCol: String,
                    textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cc = connectedComponents(docs.select(col(idCol)),
      minHashLsh(docs, idCol, textCol))
    val quality = TextOps.qualityScore(docs, idCol, textCol)
      .select(col(idCol), col("quality"))
    val w = Window.partitionBy("component")
      .orderBy(col("quality").desc, col(idCol).asc)
    cc.join(quality, idCol)
      .withColumn("__rk", row_number().over(w))
      .withColumn("n_members",
        count(lit(1)).over(Window.partitionBy("component")).cast(LongType))
      .where(col("__rk") === 1)
      .select(col("component"), col(idCol).as("keeper"),
        col("n_members"), col("quality").as("best_quality"))
  }

  /** X61 — record linkage (entity resolution): link each PROBE record to
    * its best fuzzy catalog match by name. The classic three-stage ER
    * shape: (1) BLOCKING — candidates are (probe, catalog) pairs sharing
    * ≥1 lower-cased name token, via a token-keyed equi-join (never
    * probe×catalog); (2) row-local SCORING on the candidate pairs only —
    * shared distinct-token count (`array_intersect`) and codegen
    * `levenshtein` edit distance; (3) RESOLUTION — best match per probe
    * under the total order (edit asc, shared desc, catalog id asc), so
    * the winner is deterministic under any tie.
    *
    * Self-matches (same id on both sides — the probe batch usually IS a
    * slice of the catalog) are always excluded.
    *
    * 100 TB shape: the delta-vs-corpus model (`dedupDelta`'s contract) —
    * the probe side is a small batch, so AQE broadcasts its token frame
    * and the catalog never shuffles for the block join; candidates and
    * everything after are probe-sized × blocking fan-out. `maxDf` drops
    * block tokens occurring in more than that many catalog rows (ER
    * "stop-token removal") when a heavy token would explode the
    * candidate set.
    *
    * Output: one row per matched probe — (da, db, shared, edit_dist).
    */
  def recordLinkage(probe: DataFrame, catalog: DataFrame, idCol: String,
                    nameCol: String, maxEdit: Int = Int.MaxValue,
                    maxDf: Long = Long.MaxValue): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def norm(df: DataFrame) =
      df.select(col(idCol).as("id"), trim(lower(col(nameCol))).as("nm"))
    def toks(df: DataFrame) = df
      .select(col("id"), explode(split(col("nm"), " +")).as("tok"))
      .where(length(col("tok")) > 0).distinct()
    val lt = norm(probe)
    val rt = norm(catalog)
    val rtok =
      if (maxDf == Long.MaxValue) toks(rt)
      else {
        val w = Window.partitionBy("tok")
        toks(rt).withColumn("__df", count(lit(1)).over(w))
          .where(col("__df") <= maxDf).drop("__df")
      }
    val cand = toks(lt).as("a")
      .join(rtok.as("b"), col("a.tok") === col("b.tok") &&
        col("a.id") =!= col("b.id"))
      .select(col("a.id").as("da"), col("b.id").as("db")).distinct()
    val scored = cand
      .join(lt.select(col("id").as("da"), col("nm").as("na")), "da")
      .join(rt.select(col("id").as("db"), col("nm").as("nb")), "db")
      .select(col("da"), col("db"),
        size(array_intersect(split(col("na"), " +"), split(col("nb"), " +")))
          .cast(LongType).as("shared"),
        levenshtein(col("na"), col("nb")).cast(LongType).as("edit_dist"))
      .where(col("edit_dist") <= maxEdit)
    val w = Window.partitionBy("da")
      .orderBy(col("edit_dist").asc, col("shared").desc, col("db").asc)
    scored.withColumn("__rk", row_number().over(w))
      .where(col("__rk") === 1).drop("__rk")
  }

  /** X119 — corpus SNAPSHOT DIFF: classify every document id across two
    * corpus snapshots as `added` (in new only), `removed` (in old only),
    * or `changed` (in both, content hash differs) — the content-aware
    * twin of the catalog id-diff algebra (O2/O3 diff the MEMBERSHIP;
    * this also diffs the BYTES), and the discovery step in front of
    * every incremental pipeline here: the `added ∪ changed` set is
    * exactly what X45/X117 classify against the index, what the X111
    * append ingests, and what the X111c delete retracts (`removed`).
    * Unchanged documents are NOT emitted — at 100 TB the diff output is
    * churn-sized, never corpus-sized.
    *
    * Shape: each side reduces to (id, md5) — map-only projections — and
    * ONE full-outer hash join on the id classifies everything; the
    * content comparison is an 32-char string equality on the join row.
    * Deterministic: md5 is the corpus hash discipline (oracle-exact).
    * Output (doc_id, status, old_hash, new_hash), absent sides NULL. */
  def corpusDiff(oldSnap: DataFrame, newSnap: DataFrame, idCol: String,
                 textCol: String): DataFrame = {
    // presence is an EXPLICIT flag per side, not hash nullness: a row
    // whose text is NULL is still PRESENT (md5(NULL) = NULL would
    // otherwise make it indistinguishable from an absent row — a
    // NULL-text doc in both snapshots must not report 'added', and one
    // only in the old snapshot must report 'removed')
    def h(df: DataFrame, hAs: String, pAs: String) =
      df.select(col(idCol).cast(LongType).as("doc_id"),
        md5(col(textCol)).as(hAs), lit(true).as(pAs))
    h(oldSnap, "old_hash", "__old").join(
        h(newSnap, "new_hash", "__new"), Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("__old").isNull, "added")
          .when(col("__new").isNull, "removed")
          // null-safe compare: NULL-text → non-NULL-text is a change
          .when(!(col("old_hash") <=> col("new_hash")), "changed")
          .otherwise("unchanged"))
      .where(col("status") =!= "unchanged")
      .select(col("doc_id"), col("status"), col("old_hash"), col("new_hash"))
  }

  /** X1i — SEGMENT-level dedup with document reassembly: dedup at a
    * granularity FINER than the document (the public web-corpus recipe —
    * Dolma/RefinedWeb drop repeated *paragraphs*, not whole pages, so
    * boilerplate headers/footers vanish while the unique body survives).
    * The corpus here has no newline structure, so the segment is a
    * fixed-width token window (`segTokens` tokens, last one ragged) —
    * the operator is the same for any segmenter: explode to segments,
    * keep each distinct segment's GLOBAL first occurrence (min
    * (doc_id, seg_idx) — deterministic, corpus-order-independent), and
    * reassemble every document from its surviving segments in original
    * order.
    *
    * Scale shape: one explode (rows × ~tokens/segTokens), then the
    * first occurrence is a TWO-PHASE `min(struct(doc_id, seg_idx))`
    * aggregation keyed on the segment text — deliberately NOT a
    * `row_number` window: a window partition cannot be split (AQE skew
    * handling covers joins/rebalance, not WindowExec), so a mega-hot
    * boilerplate segment — empty headers repeated across 10⁹ pages,
    * exactly this operator's workload — would pin one task's sort.
    * With the aggregation, map-side partial mins absorb the hot key:
    * each input partition emits at most ONE row per distinct segment it
    * saw, so the reducer for the hottest segment receives ≤ #partitions
    * rows regardless of duplicate mass (SkewFixtureSpec pins this with a
    * single segment at ≥30 % of corpus mass; PlanSpec pins the plan
    * contains no Window). Reassembly then never touches the hot key:
    * a surviving segment belongs to exactly one (winner) document, so
    * grouping the winners frame by its winner doc_id rebuilds every
    * document — keyed on doc_id (unique-ish, no skew), winners-sized.
    * Per-doc segment totals are a map-only arithmetic projection of the
    * input (ceil(nTokens/segTokens)); the final join is doc_id-keyed and
    * corpus-row-bounded. No seg-keyed join-back anywhere — the hot
    * segment's duplicate mass crosses the wire once, pre-aggregated.
    *
    * Output one row per document: segment counts, md5 of the reassembled
    * text (NULL when every segment was a duplicate — matches SQL
    * string_agg-over-no-rows semantics), and surviving char length.
    */
  /** X121 — duplicate-window fraction (the Gopher/Rae et al. 2021
    * repetition family applied CROSS-corpus): per document, the fraction
    * of its `w`-token windows (stride 1) whose exact text already
    * occurred earlier in the corpus — in a lower doc_id, or at an
    * earlier position of the same document. The per-doc fraction is the
    * standard "how much of this page is recycled text" curation signal
    * that segment dedup (X1i) acts on and substring dedup (X85b)
    * approximates with sampled char windows; this is the exact
    * token-aligned measurement.
    *
    * Scale shape: stride-1 explode (corpus token mass — linear, the
    * price of the exact metric), then the identical skew-proof
    * first-occurrence machinery as [[segmentDedup]]: a two-phase
    * `min(struct(doc_id, pos))` keyed on `xxhash64` of the window text —
    * the window itself is discarded right after the min, so shuffling
    * its text (~`w`× corpus token bytes) would buy nothing; the 8-byte
    * hashed key is the [[TextOps.repeatedSpans]] discipline, with the
    * same stated collision policy: a 64-bit collision merges two
    * distinct windows' first-occurrence chains (P ≈ n²/2⁶⁵ windows —
    * vanishing at any corpus the operator targets, and the failure mode
    * is one window miscounted as duplicate, never a crash). Map-side
    * partials bound a mega-hot boilerplate window's reducer input at
    * one row per input partition (never a window function), winners
    * re-grouped by their winning doc_id, totals map-only arithmetic.
    * Output: (doc_id, n_windows, dup_windows, dup_frac round-6). A doc
    * shorter than `w` tokens is one whole-doc window; NULL text is
    * treated as the empty string (one empty window) so totals and the
    * explode can never disagree. */
  def dupWindows(docs: DataFrame, idCol: String, textCol: String,
                 w: Int = 8): DataFrame = {
    require(w > 0, s"w must be positive: $w")
    // max(nTok - w, 0) + 1 windows; split("") = [""] so nTok ≥ 1 always.
    // NULL text would desync the two legs (size(null) = -1 in the
    // arithmetic totals vs a null token array in the explode): guard
    // once at entry so both see the same token array.
    val text = coalesce(col(textCol), lit(""))
    def nWins(toks: Column) =
      (greatest(size(toks) - w, lit(0)) + 1).cast(LongType)
    val wins = docs
      .select(col(idCol).cast(LongType).as("doc_id"),
        TextOps.tokens(text).as("__t"))
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0L), nWins(col("__t")) - 1),
          i => xxhash64(array_join(slice(col("__t"), i + 1, lit(w)), " "))))
          .as(Seq("pos", "win")))
    val winners = wins
      .groupBy(col("win"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("__win"))
      .select(col("__win.doc_id").as("doc_id"))
    val kept = winners.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("__kept"))
    docs.select(col(idCol).cast(LongType).as("doc_id"),
        nWins(TextOps.tokens(text)).as("n_windows"))
      .join(kept, Seq("doc_id"), "left")
      .withColumn("dup_windows",
        col("n_windows") - coalesce(col("__kept"), lit(0L)))
      .select(col("doc_id"), col("n_windows"), col("dup_windows"),
        round(col("dup_windows").cast(DoubleType) / col("n_windows"), 6)
          .as("dup_frac"))
  }

  /** X131b — EXACT-SUBSTRING CUT LIST: the actionable artifact of
    * Lee et al. 2021's ExactSubstr dedup — for every document, the
    * merged token intervals covered by duplicated `w`-token windows
    * (windows whose exact text occurred earlier in the corpus: lower
    * doc_id, or earlier position in the same doc — the first occurrence
    * is KEPT, its copies are cut). The union of duplicated fixed-w
    * windows equals the union of all maximal repeated spans of length
    * ≥ w (every length-w subwindow of a long repeat is itself
    * duplicated, and every duplicated window is a repeat), so the fixed
    * window is not an approximation of the suffix-array form ([[
    * graft.ext.SuffixOps]]) — it is the same covered-position set,
    * computable without the SA's log-rounds.
    *
    * Shape: X121's stride-1 explode with the SAME hashed shuffle key
    * (xxhash64 of the window text — 8 bytes through the corpus-sized
    * exchange; 64-bit collision policy as documented there) and
    * skew-proof two-phase min(struct) first-occurrence; duplicates
    * keep their positions via a LEFT-ANTI join of the occurrence frame
    * against the winners on the UNIFORM (doc_id, pos) key — see the
    * inline note for why the window key would be a hot partition — and
    * a per-DOC gaps-and-islands merge (two doc-partitioned windows —
    * bounded by the document length, never corpus-wide). Output one
    * row per merged cut span: (doc_id, span_start, span_end,
    * span_tokens, n_windows), token positions 1-based inclusive. */
  def exactSubstrCut(docs: DataFrame, idCol: String, textCol: String,
                     w: Int = 4): DataFrame = {
    require(w > 0, s"w must be positive: $w")
    val text = coalesce(col(textCol), lit(""))
    def nWins(toks: Column) =
      (greatest(size(toks) - w, lit(0)) + 1).cast(LongType)
    val wins = docs
      .select(col(idCol).cast(LongType).as("doc_id"),
        TextOps.tokens(text).as("__t"))
      .select(col("doc_id"), size(col("__t")).cast(LongType).as("__ntok"),
        posexplode(transform(
          sequence(lit(0L), nWins(col("__t")) - 1),
          i => xxhash64(array_join(slice(col("__t"), i + 1, lit(w)), " "))))
          .as(Seq("pos", "win")))
    // first occurrences, then subtract them from the occurrence frame by
    // the UNIFORM (doc_id, pos) key — never by the window key: a
    // boilerplate window present in every document would make the
    // win-keyed join-back a single hot partition that AQE cannot split
    // (the win exchange is shared with the aggregation), while (doc_id,
    // pos) spreads the hot window's occurrences across every partition
    // by construction (measured: SkewFixtureSpec's every-doc-hot-window
    // fixture bounds the worst task at an even share)
    val winners = wins
      .groupBy(col("win"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("__first"))
      .select(col("__first.doc_id").as("doc_id"),
        col("__first.pos").as("pos"))
    val dups = wins.join(winners, Seq("doc_id", "pos"), "left_anti")
      .select(col("doc_id"), (col("pos") + 1).cast(LongType).as("s"),
        least(col("pos") + w, col("__ntok")).cast(LongType).as("e"))
    val wPrev = Window.partitionBy(col("doc_id"))
      .orderBy(col("s").asc, col("e").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(col("doc_id"))
      .orderBy(col("s").asc, col("e").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    dups
      .withColumn("__brk",
        when(col("s") > coalesce(max(col("e")).over(wPrev), lit(-1L)) + 1,
          lit(1L)).otherwise(lit(0L)))
      .withColumn("__isl", sum(col("__brk")).over(wRun))
      .groupBy(col("doc_id"), col("__isl"))
      .agg(min(col("s")).as("span_start"), max(col("e")).as("span_end"),
        count(lit(1)).as("n_windows"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_tokens"),
        col("n_windows"))
  }

  /** X131c — APPLY the exact-substring cut list: the end of the
    * Lee et al. pipeline — remove every duplicated span
    * ([[exactSubstrCut]], first occurrence kept) from each document and
    * reassemble the surviving tokens in order. The content twin of
    * X122b's boilerplate trim (that removes a per-source constant
    * prefix; this removes corpus-wide repeated passages anywhere in the
    * document).
    *
    * Shape: the cut list collapses to ONE bounded interval array per
    * affected doc (intervals per doc ≤ doc length), joined back to the
    * corpus doc-keyed; the removal itself is ROW-LOCAL — an indexed
    * `filter` over the token array with an `exists` probe into the
    * interval array (no explode, no per-position rows), so the only
    * exchanges are the cut list's own and one doc-keyed join. Docs
    * fully consumed by cuts emit an empty clean text; untouched docs
    * pass through with removed_tokens = 0. Output (doc_id, n_tokens,
    * removed_tokens, clean_hash) — md5 of the reassembled text, the
    * corpus hash discipline. */
  def exactSubstrApply(docs: DataFrame, idCol: String, textCol: String,
                       w: Int = 4): DataFrame = {
    val cuts = exactSubstrCut(docs, idCol, textCol, w)
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("span_start").as("s"),
        col("span_end").as("e"))).as("__spans"))
    val text = coalesce(col(textCol), lit(""))
    docs.select(col(idCol).cast(LongType).as("doc_id"),
        TextOps.tokens(text).as("__t"))
      .join(cuts, Seq("doc_id"), "left")
      .withColumn("__kept",
        when(col("__spans").isNull, col("__t"))
          .otherwise(filter(col("__t"), (_, i) =>
            !exists(col("__spans"), sp =>
              (i + 1) >= sp.getField("s") && (i + 1) <= sp.getField("e")))))
      .select(col("doc_id"), size(col("__t")).cast(LongType).as("n_tokens"),
        (size(col("__t")) - size(col("__kept"))).cast(LongType)
          .as("removed_tokens"),
        md5(array_join(col("__kept"), " ")).as("clean_hash"))
  }

  def segmentDedup(docs: DataFrame, idCol: String, textCol: String,
                   segTokens: Int = 8): DataFrame = {
    require(segTokens > 0, s"segTokens must be positive: $segTokens")
    // ceil(nTokens / segTokens); split("") = [""] so nTokens ≥ 1 always.
    // NULL text ≡ "" — guarded ONCE here so the arithmetic totals and
    // the exploded segments derive from the same token array (unguarded,
    // size(null) = -1 gives n_segments = 0 while sequence(0, -1) still
    // explodes rows, letting kept_segments exceed n_segments).
    val text = coalesce(col(textCol), lit(""))
    def nSegs(toks: Column) =
      ((size(toks) + lit(segTokens - 1)) / lit(segTokens)).cast(LongType)
    val segs = docs
      .select(col(idCol).cast(LongType).as("doc_id"),
        TextOps.tokens(text).as("__t"))
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0L), nSegs(col("__t")) - 1),
          i => array_join(
            slice(col("__t"), i * segTokens + 1, lit(segTokens)), " ")))
          .as(Seq("seg_idx", "seg")))
    // Phase 1: global first occurrence per distinct segment. Partial
    // (map-side) min(struct) bounds the hot key's reducer input at one
    // row per upstream partition — the skew-proof replacement for
    // row_number() over Window.partitionBy(seg).
    val winners = segs
      .groupBy(col("seg"))
      .agg(min(struct(col("doc_id"), col("seg_idx"))).as("__win"))
      .select(col("__win.doc_id").as("doc_id"),
        col("__win.seg_idx").as("seg_idx"), col("seg"))
    // Phase 2: a surviving segment lives in exactly one document — its
    // winner — so grouping winners by that doc_id IS the reassembly.
    val reassembled = winners.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("kept_segments"),
        array_join(transform(
          sort_array(collect_list(struct(col("seg_idx"), col("seg")))),
          s => s.getField("seg")), " ").as("__out"))
    // Per-doc totals: map-only arithmetic, no second explode or shuffle.
    val totals = docs.select(col(idCol).cast(LongType).as("doc_id"),
      nSegs(TextOps.tokens(text)).as("n_segments"))
    totals.join(reassembled, Seq("doc_id"), "left")
      .withColumn("kept_segments",
        coalesce(col("kept_segments"), lit(0L)))
      .select(col("doc_id"), col("n_segments"), col("kept_segments"),
        when(col("kept_segments") > 0, md5(col("__out"))).as("text_hash"),
        when(col("kept_segments") > 0, length(col("__out")))
          .otherwise(0L).cast(LongType).as("out_chars"))
  }
}
