package graft.ext

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** X131 — distributed GENERALIZED SUFFIX ARRAY via prefix doubling, and
  * the exact longest-repeated-span extraction built on it: the machinery
  * behind exact SUBSTRING-level training-data dedup (Lee et al. 2021,
  * "Deduplicating Training Data Makes Language Models Better" — their
  * ExactSubstr dedup builds a suffix array and cuts every ≥50-token
  * repeated span). X85b samples content-defined char windows and X121
  * counts fixed-width windows; the suffix array answers the question
  * those approximations bound: the EXACT length and location of every
  * maximal repeated token span, at any length, with no sampling miss.
  *
  * Algorithm (Manber–Myers prefix doubling, the standard distributed
  * formulation — each round is a constant number of data-parallel
  * primitives, O(log maxdoclen) rounds total):
  *   - suffixes are (doc_id, pos) over the per-document token arrays
  *     (a generalized suffix array: comparison stops at the document
  *     end — shorter-is-prefix sorts first), so the doubling depth is
  *     log2(LONGEST DOCUMENT), not log2(corpus);
  *   - round 0 ranks single tokens (one distributed dense rank of the
  *     VOCAB-sized distinct frame — the only rank that sorts strings);
  *     round j re-ranks the pair (rank_{j-1}(pos),
  *     rank_{j-1}(pos + 2^{j-1})) with 0 padding past the document end
  *     — one hash join keyed on (doc_id, pos) plus one re-rank;
  *   - the re-rank never single-reduces AND never re-sorts globally:
  *     previous ranks are integers in [1, n], so the order-preserving
  *     bucket is integer arithmetic on the leading rank (no
  *     range-sampling pass, no distinct, no join-back), per-bucket
  *     counts (≤ numPartitions rows) prefix-sum into broadcast offsets,
  *     and the label is offset + within-bucket `rank()` — equal pairs
  *     share a label, distinct pairs order strictly: ONE corpus
  *     exchange per round;
  *   - every round frame is localCheckpoint'd (the X127 iterative-plan
  *     discipline): lineage stays one round deep instead of doubling.
  *
  * At 100 TB this is the published shape — O(log L) global sorts of
  * n = corpus-token rows, each a range-exchange with no hot key (ranks
  * are near-uniform by construction) — where a single-machine suffix
  * sort (the reference implementations of Lee et al.) caps at RAM.
  *
  * LCP (the repeated-span length) is computed from the SAME round
  * frames by the sparse-table descent: for adjacent suffix pairs in SA
  * order, walk j = J..0 and advance 2^j tokens whenever both sides'
  * round-j ranks exist and agree (equal rank_j ⟺ equal padded 2^j-token
  * segment), then cap at min(remaining) — the cap restores exactness in
  * the one padded-equal case (identical tails shorter than 2^j) where
  * the advance overshoots the document end. The maximum LCP over
  * ADJACENT pairs is the corpus' longest repeated span (the classical
  * SA property: any two suffixes' LCP is ≤ some adjacent pair's).
  */
object SuffixOps {

  /** Distributed dense rank: adds `outCol` = 1-based rank of each row's
    * `keys` tuple in the total order of DISTINCT tuples (equal tuples
    * share a rank). No single-reducer window: distinct tuples are
    * range-partitioned + sorted, per-partition counts (≤ numPartitions
    * rows — bounded plan metadata) prefix-sum into offsets broadcast
    * back, rank = offset + within-partition row_number. Key columns
    * must be non-null (callers pad with sentinels, never NULL). */
  private[ext] def denseRankByKeys(df: DataFrame, keys: Seq[String],
                                   outCol: String): DataFrame = {
    val spark = df.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val kc = keys.map(col)
    val d = df.select(kc: _*).distinct()
      .repartitionByRange(parts, kc: _*)
      .sortWithinPartitions(kc: _*)
      .withColumn("__pid", spark_partition_id())
    val cw = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // ≤ numPartitions rows: the single-partition window is bounded
    val offsets = d.groupBy("__pid").agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(sum(col("__n")).over(cw), lit(0L)))
      .drop("__n")
    val rw = Window.partitionBy("__pid").orderBy(kc: _*)
    val ranked = d.join(broadcast(offsets), "__pid")
      .withColumn(outCol, col("__off") + row_number().over(rw).cast(LongType))
      .drop("__pid", "__off")
    df.join(ranked, keys)
  }

  /** Round-0 labeling: MIN-POSITION rank of every token plus its class
    * size — labels are positions in the global suffix order, so every
    * class owns the contiguous label slot [r, r + cs) and later rounds
    * can relabel a class WITHIN its slot without any global machinery.
    * Computed on the VOCAB-sized (tok, count) frame: range-sort, then
    * label = 1 + prefix sum of earlier tokens' counts (two bounded
    * windows), one corpus join-back on tok. The join-back's hot key (a
    * stopword in half the corpus) is AQE-splittable — both exchanges
    * are fresh (nothing shared, unlike the X131b win-join case), and
    * the vocab side broadcasts outright when it fits. */
  private def vocabRank(toks: DataFrame, parts: Int): DataFrame = {
    val v = toks.groupBy(col("tok")).agg(count(lit(1)).as("__cs"))
      .repartitionByRange(parts, col("tok"))
      .sortWithinPartitions(col("tok"))
      .withColumn("__pid", spark_partition_id())
    val cw = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // ≤ numPartitions rows: bounded plan metadata
    val offs = v.groupBy("__pid").agg(sum(col("__cs")).as("__t"))
      .withColumn("__off", coalesce(sum(col("__t")).over(cw), lit(0L)))
      .drop("__t")
    val rw = Window.partitionBy(col("__pid")).orderBy(col("tok").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = v.join(broadcast(offs), "__pid")
      .withColumn("r", lit(1L) + col("__off") +
        coalesce(sum(col("__cs")).over(rw), lit(0L)))
      .select(col("tok"), col("r"), col("__cs"))
    toks.select(col("doc_id"), col("pos"), col("tok")).join(ranked, "tok")
      .select(col("doc_id"), col("pos"), col("r"), col("__cs"))
  }

  /** One refinement round over a (doc_id, pos, r, __cs) frame — the
    * ACTIVE-SET form of the doubling step: rows whose class is already a
    * singleton are RETIRED (their label is final — no other suffix
    * shares their 2^j-prefix, so none can ever share a longer one) and
    * pass through untouched; only ambiguous classes re-rank, and a
    * class relabels WITHIN its own label slot [r, r + cs): new label =
    * r + (rows of the class in lower extension-buckets) + (rows with
    * strictly smaller extension in this bucket). After the first couple
    * of rounds the active set is the duplicated-suffix tail of the
    * corpus — typically a few percent — so late rounds are near-free.
    *
    * Extension ranks come from a per-DOCUMENT `lead(r, step)` window
    * (bounded by document length — never a corpus-wide partition); the
    * slot arithmetic runs on (class, bucket, extension)-grouped count
    * frames whose window partitions are bounded by construction
    * (≤ parts buckets per class; ≤ (n+2)/parts distinct extensions per
    * bucket) — the X79 no-bare-group-window discipline throughout. */
  private def refineRound(prev: DataFrame, step: Long, n: Long,
                          parts: Int): (DataFrame, DataFrame) = {
    val wd = Window.partitionBy(col("doc_id")).orderBy(col("pos").asc)
    // LAZY-checkpoint the windowed frame: it feeds the retired branch,
    // the active re-rank AND (via `lab`) the stability probe — two
    // separate actions. Without the checkpoint the per-doc lead window
    // (a corpus-sized exchange + sort) re-runs once per consumer action;
    // with it, whichever action fires first pays once and the rest read
    // the cached rows.
    val full = prev.withColumn("__r2",
      coalesce(lead(col("r"), step.toInt).over(wd), lit(0L)))
      .localCheckpoint(eager = false)
    val retired = full.where(col("__cs") === 1L)
      .select(col("doc_id"), col("pos"), col("r"), col("__cs"))
    val act = full.where(col("__cs") > 1L)
      .withColumn("__b", expr(s"(__r2 * $parts) div ${n + 2}"))
    val c2 = act.groupBy(col("r"), col("__b"), col("__r2"))
      .agg(count(lit(1)).as("__c2"))
    val bTot = c2.groupBy(col("r"), col("__b"))
      .agg(sum(col("__c2")).as("__bt"))
      .withColumn("__boff", coalesce(sum(col("__bt")).over(
        Window.partitionBy(col("r")).orderBy(col("__b").asc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__bt")
    // active-set-sized; lazily checkpointed because it too has two
    // consumer actions (the relabel join and the stability probe)
    val lab = c2.join(bTot, Seq("r", "__b"))
      .withColumn("__sless", coalesce(sum(col("__c2")).over(
        Window.partitionBy(col("r"), col("__b")).orderBy(col("__r2").asc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("r"), col("__b"), col("__r2"),
        (col("r") + col("__boff") + col("__sless")).as("__nr"),
        col("__c2"))
      .localCheckpoint(eager = false)
    val relab = act.join(lab, Seq("r", "__b", "__r2"))
      .select(col("doc_id"), col("pos"), col("__nr").as("r"),
        col("__c2").as("__cs"))
    (retired.union(relab), lab)
  }

  /** 1-based global position of every row under (r, doc_id, pos) — all
    * tuples unique, so row_number over the same integer-bucketed
    * two-phase shape gives the total order in one corpus exchange.
    * `__pid` (the order-preserving bucket) is kept on the output so
    * callers can walk SA-adjacent rows with a window over the SAME
    * partitioning instead of a corpus-sized self-join (q values are
    * contiguous within a bucket and buckets stack in q order). */
  private def orderPositions(last: DataFrame, n: Long, out: String,
                             extra: Seq[String] = Nil): DataFrame = {
    val parts = last.sparkSession.sessionState.conf.numShufflePartitions
    val b = last.withColumn("__pid", expr(s"(r * $parts) div ${n + 1}"))
    val cw = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = b.groupBy("__pid").agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(sum(col("__n")).over(cw), lit(0L)))
      .drop("__n")
    val rw = Window.partitionBy(col("__pid"))
      .orderBy(col("r").asc, col("doc_id").asc, col("pos").asc)
    b.join(broadcast(offsets), "__pid")
      .withColumn(out, col("__off") + row_number().over(rw).cast(LongType))
      .select(Seq(col("doc_id"), col("pos"), col("r"), col(out),
        col("__pid")) ++ extra.map(col): _*)
  }

  /** The doubling rounds: returns (roundFrames R_0..R_J, J, tokens
    * frame with per-suffix remaining length, n suffixes). R_j columns:
    * (doc_id, pos, r) — r compares the padded 2^j-token segment at pos.
    * pos is 1-based. Every frame is localCheckpoint'd. */
  private def doublingRounds(docs: DataFrame, idCol: String,
                             textCol: String):
      (Seq[DataFrame], Int, DataFrame, Long) = {
    val base = docs.select(col(idCol).cast(LongType).as("doc_id"),
      TextOps.tokens(coalesce(col(textCol), lit(""))).as("__t"))
    val toks = base.select(col("doc_id"), size(col("__t")).as("__dl"),
        posexplode(col("__t")).as(Seq("__p", "tok")))
      .select(col("doc_id"), (col("__p") + 1).cast(LongType).as("pos"),
        col("tok"), (col("__dl") - col("__p")).cast(LongType).as("rem"))
      .localCheckpoint()
    // one bounded collect off the already-materialized tokens frame:
    // the doubling depth (log2 of the longest document); rem at pos=1
    // IS the document length
    val statsRow = toks.agg(max(col("rem")), count(lit(1))).collect()(0)
    require(!statsRow.isNullAt(0), "suffix array: empty corpus")
    val maxDl = statsRow.getLong(0)
    require(maxDl <= Int.MaxValue, "document longer than 2^31 tokens")
    val n = statsRow.getLong(1)
    val parts = docs.sparkSession.sessionState.conf.numShufflePartitions
    val rounds = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    // round 0 ranks TOKEN STRINGS — the one rank that needs a real sort
    // (range partition over the vocab-sized count frame)
    rounds += vocabRank(toks, parts).localCheckpoint(eager = false)
    var j = 0
    var stable = false
    while (!stable && (1L << j) < maxDl) {
      val step = 1L << j
      val (next0, lab) = refineRound(rounds.last, step, n, parts)
      // LAZY checkpoint: the frame materializes (and truncates lineage)
      // inside whichever action first consumes it — the next stability
      // probe or the final descent job — instead of costing a dedicated
      // job per round; at bench scale the job count, not shuffle bytes,
      // dominates this operator
      val next = next0.localCheckpoint(eager = false)
      // stability: a round that splits NO class has reached the final
      // partition (equal-by-2^j ⟺ equal suffixes outright — see the
      // descent note), so deeper rounds are identities: stop, and the
      // descent reads rounds(min(level, last)). The probe runs on the
      // ACTIVE-sized label frame (a split class shows a sub-label above
      // its slot base) — never a corpus-sized comparison. Rounds 0-2
      // split in any non-degenerate corpus, so the probe starts at
      // round 3: early rounds cost no probe job at all.
      stable = j >= 2 &&
        lab.where(col("__nr") =!= col("r")).limit(1).count() == 0L
      rounds += next
      j += 1
    }
    // the descent still walks the FULL depth (sum of advances must be
    // able to reach maxDl); levels past the stable round read the last
    // frame — exact, because stability makes "R_last equal" ⟺
    // "suffixes identical", for which any block-advance is valid and
    // the min-remaining cap lands the final value
    var jFull = 0
    while ((1L << jFull) < maxDl) jFull += 1
    (rounds.toSeq, jFull, toks, n)
  }

  /** The generalized suffix array: one row per suffix (doc_id, pos)
    * with its 1-based position `sa_rank` in the total suffix order
    * (token-wise lexicographic; a shorter suffix that is a prefix of a
    * longer one sorts first; IDENTICAL suffixes — same token tail in
    * two documents — tie-break by (doc_id, pos)). pos is 1-based. */
  def suffixArray(docs: DataFrame, idCol: String,
                  textCol: String): DataFrame = {
    val (rounds, _, _, n) = doublingRounds(docs, idCol, textCol)
    orderPositions(rounds.last, n, "sa_rank")
      .select(col("doc_id"), col("pos"), col("sa_rank"))
  }

  /** SA-adjacent pairs (predecessor x, successor y at q = x.q + 1) with
    * both sides' remaining lengths — built from ONE `lead` window over
    * [[orderPositions]]'s own `__pid` partitioning plus a bounded
    * (≤ 2·numPartitions rows) boundary stitch, instead of the q-keyed
    * corpus self-join: q is contiguous within a bucket and buckets stack
    * in q order, so the only cross-partition successors are each
    * bucket's max-q row → next non-empty bucket's min-q row, recovered
    * from two map-side-partial min_by/max_by aggregations broadcast-
    * joined on the q value. Saves two corpus-sized exchanges (the self-
    * join's two sides) per call. */
  private def adjacentPairs(sa: DataFrame): DataFrame = {
    val wq = Window.partitionBy(col("__pid")).orderBy(
      col("r").asc, col("doc_id").asc, col("pos").asc)
    val nxt = struct(col("doc_id"), col("pos"), col("rem"))
    val within = sa
      .withColumn("__nxt", lead(nxt, 1).over(wq))
      .where(col("__nxt").isNotNull)
      .select(col("doc_id").as("doc_a"), col("pos").as("pos_a"),
        col("rem").as("__rema"),
        col("__nxt.doc_id").as("doc_b"), col("__nxt.pos").as("pos_b"),
        col("__nxt.rem").as("__remb"))
    val lasts = sa.groupBy(col("__pid"))
      .agg(max_by(struct(col("doc_id"), col("pos"), col("rem")), col("q"))
        .as("__x"), max(col("q")).as("__q"))
      .select(col("__x.doc_id").as("doc_a"), col("__x.pos").as("pos_a"),
        col("__x.rem").as("__rema"), col("__q"))
    val firsts = sa.groupBy(col("__pid"))
      .agg(min_by(struct(col("doc_id"), col("pos"), col("rem")), col("q"))
        .as("__y"), min(col("q")).as("__q"))
      .select(col("__y.doc_id").as("doc_b"), col("__y.pos").as("pos_b"),
        col("__y.rem").as("__remb"), col("__q"))
    val across = lasts.join(broadcast(firsts),
        firsts("__q") === lasts("__q") + 1)
      .select(col("doc_a"), col("pos_a"), col("__rema"),
        col("doc_b"), col("pos_b"), col("__remb"))
    within.unionByName(across)
  }

  /** Top-k longest repeated token spans: adjacent suffix pairs in SA
    * order with their exact LCP — the Lee et al. dedup artifact (every
    * pair with lcp ≥ threshold is a byte-identical repeated passage; the
    * caller cuts or collapses them). Output (doc_a, pos_a, doc_b, pos_b,
    * lcp) ranked (lcp DESC, doc_a, pos_a, doc_b, pos_b), lcp ≥ 1 only;
    * (doc_a,pos_a) is the SA-order predecessor. Every frame after the
    * doubling rounds is n-row bounded; the descent is 2 hash joins per
    * level against the checkpointed round frames. */
  def longestRepeatedSpans(docs: DataFrame, idCol: String, textCol: String,
                           k: Int): DataFrame = {
    require(k > 0, s"k=$k must be positive")
    val (rounds, maxJ, toks, n) = doublingRounds(docs, idCol, textCol)
    // rem rides the ONE (doc_id, pos) join into the pre-window frame, so
    // both sides of every adjacent pair carry their remaining length out
    // of adjacentPairs for free — v1 joined rem back onto the pair frame
    // twice (two more corpus-sized exchanges).
    val sa = orderPositions(
        rounds.last.join(toks.select(col("doc_id"), col("pos"), col("rem")),
          Seq("doc_id", "pos")),
        n, "q", extra = Seq("rem"))
      .localCheckpoint(eager = false)
    var pairs = adjacentPairs(sa).withColumn("lcp", lit(0L))
    // sparse-table descent, highest level first; the advance probe is
    // (pos + lcp), an expression equi-join key against the round frame.
    // Equal round-j ranks ⟺ equal padded 2^j-token segments, so the
    // advance is sound; the final least(lcp, rem) cap repairs the one
    // overshoot case (identical tails shorter than 2^j pad-match and
    // advance past the document end — true LCP there is min(remaining),
    // which the cap yields exactly; in every other path lcp ≤ min(rem)
    // already and the cap is a no-op).
    //
    // Levels j ≥ rounds.size−1 all read the LAST round frame, where equal
    // ranks ⟺ identical suffix tails outright (stability exit: the final
    // round split no class, the loop's own stop condition; depth exit:
    // 2^last ≥ maxdoclen, so the padded segment covers any tail). Those
    // levels therefore collapse into ONE join — equal advances past the
    // document end in a single step (maxDl ≥ any true lcp; the least(rem)
    // cap lands the exact value, and every deeper probe at pos+lcp >
    // doclen left-join-misses, exactly as the unrolled levels behaved) —
    // where v1 spent 2 corpus-sized shuffle joins per collapsed level
    // re-deriving the same verdict.
    val topLevel = rounds.size - 1
    for (j <- topLevel to 0 by -1) {
      // 2^maxJ ≥ maxdoclen by jFull's definition — the collapsed top
      // level's advance lands past every document end when equal
      val step = if (j == topLevel) 1L << maxJ else 1L << j
      val rj = rounds(j)
      pairs = pairs
        .join(rj.select(col("doc_id").as("__da"), col("pos").as("__pa"),
            col("r").as("__ra")),
          col("doc_a") === col("__da") &&
            (col("pos_a") + col("lcp")) === col("__pa"), "left")
        .join(rj.select(col("doc_id").as("__db"), col("pos").as("__pb"),
            col("r").as("__rb")),
          col("doc_b") === col("__db") &&
            (col("pos_b") + col("lcp")) === col("__pb"), "left")
        .withColumn("lcp", col("lcp") +
          when(col("__ra").isNotNull && col("__ra") === col("__rb"),
            lit(step)).otherwise(lit(0L)))
        .drop("__da", "__pa", "__ra", "__db", "__pb", "__rb")
    }
    pairs
      .select(col("doc_a"), col("pos_a"), col("doc_b"), col("pos_b"),
        least(col("lcp"), col("__rema"), col("__remb")).as("lcp"))
      .where(col("lcp") >= 1)
      .orderBy(col("lcp").desc, col("doc_a").asc, col("pos_a").asc,
        col("doc_b").asc, col("pos_b").asc)
      .limit(k)
  }
}
