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
  *     vocabulary); round j re-ranks the pair (rank_{j-1}(pos),
  *     rank_{j-1}(pos + 2^{j-1})) with 0 padding past the document end
  *     — two hash joins keyed on (doc_id, pos) plus one dense rank;
  *   - the dense rank itself never single-reduces: distinct key tuples
  *     are range-partitioned and sorted, per-partition counts (a
  *     numPartitions-row frame) prefix-sum into offsets, and the rank
  *     is offset + per-partition row_number — the classic two-phase
  *     distributed ranking, correct for ANY boundary placement, so
  *     sampling nondeterminism in the range partitioner cannot reach
  *     the output;
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

  /** The doubling rounds: returns (roundFrames R_0..R_J, J, tokens
    * frame with per-suffix remaining length). R_j columns:
    * (doc_id, pos, r) — r compares the padded 2^j-token segment at pos.
    * pos is 1-based. Every frame is localCheckpoint'd. */
  private def doublingRounds(docs: DataFrame, idCol: String,
                             textCol: String):
      (Seq[DataFrame], Int, DataFrame) = {
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
    val maxRow = toks.agg(max(col("rem"))).collect()(0)
    require(!maxRow.isNullAt(0), "suffix array: empty corpus")
    val maxDl = maxRow.getLong(0)
    val rounds = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val r0 = denseRankByKeys(
      toks.select(col("doc_id"), col("pos"), col("tok")), Seq("tok"), "r")
      .select(col("doc_id"), col("pos"), col("r")).localCheckpoint()
    rounds += r0
    var j = 0
    while ((1L << j) < maxDl) {
      val step = 1L << j
      val prev = rounds.last
      val shifted = prev.select(col("doc_id"),
        (col("pos") - step).as("pos"), col("r").as("__r2"))
      val keyed = prev.join(shifted, Seq("doc_id", "pos"), "left")
        .withColumn("__r2", coalesce(col("__r2"), lit(0L)))
      rounds += denseRankByKeys(keyed, Seq("r", "__r2"), "__rn")
        .select(col("doc_id"), col("pos"), col("__rn").as("r"))
        .localCheckpoint()
      j += 1
    }
    (rounds.toSeq, j, toks)
  }

  /** The generalized suffix array: one row per suffix (doc_id, pos)
    * with its 1-based position `sa_rank` in the total suffix order
    * (token-wise lexicographic; a shorter suffix that is a prefix of a
    * longer one sorts first; IDENTICAL suffixes — same token tail in
    * two documents — tie-break by (doc_id, pos)). pos is 1-based. */
  def suffixArray(docs: DataFrame, idCol: String,
                  textCol: String): DataFrame = {
    val (rounds, _, _) = doublingRounds(docs, idCol, textCol)
    denseRankByKeys(rounds.last, Seq("r", "doc_id", "pos"), "sa_rank")
      .select(col("doc_id"), col("pos"), col("sa_rank"))
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
    val (rounds, maxJ, toks) = doublingRounds(docs, idCol, textCol)
    val sa = denseRankByKeys(rounds.last, Seq("r", "doc_id", "pos"), "q")
      .select(col("doc_id"), col("pos"), col("q")).localCheckpoint()
    val rem = toks.select(col("doc_id"), col("pos"), col("rem"))
    var pairs = sa.as("x").join(sa.as("y"), col("y.q") === col("x.q") + 1)
      .select(col("x.doc_id").as("doc_a"), col("x.pos").as("pos_a"),
        col("y.doc_id").as("doc_b"), col("y.pos").as("pos_b"))
      .join(rem.select(col("doc_id").as("doc_a"), col("pos").as("pos_a"),
        col("rem").as("__rema")), Seq("doc_a", "pos_a"))
      .join(rem.select(col("doc_id").as("doc_b"), col("pos").as("pos_b"),
        col("rem").as("__remb")), Seq("doc_b", "pos_b"))
      .withColumn("lcp", lit(0L))
    // sparse-table descent, highest level first; the advance probe is
    // (pos + lcp), an expression equi-join key against the round frame.
    // Equal round-j ranks ⟺ equal padded 2^j-token segments, so the
    // advance is sound; the final least(lcp, rem) cap repairs the one
    // overshoot case (identical tails shorter than 2^j pad-match and
    // advance past the document end — true LCP there is min(remaining),
    // which the cap yields exactly; in every other path lcp ≤ min(rem)
    // already and the cap is a no-op).
    for (j <- maxJ to 0 by -1) {
      val step = 1L << j
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
