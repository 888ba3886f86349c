package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Deterministic sampling and dataset splitting for training-data
  * pipelines (SURVEY §2.9 extension surface).
  *
  * Everything keys off a content hash, never a random number generator:
  * at 100 TB a sample must be (a) reproducible across reruns and engines,
  * (b) computable embarrassingly parallel with no coordination, and (c)
  * stable under repartitioning — `rand()` is none of these (it reseeds per
  * partition), while `md5(key) mod N` is all three and replayable by any
  * engine with md5. This is the standard trick production corpus pipelines
  * use for held-out splits.
  *
  * The hash bucket is the first 8 hex digits of md5 (32 bits) taken mod N
  * — integer arithmetic every engine gets bit-identical.
  */
object Sampling {

  /** 32-bit integer bucket of a key's md5, in [0, buckets). */
  def hashBucket(key: Column, buckets: Int): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("long") % buckets

  /** The 52-bit order-sampling priority: integer of the first 13 md5 hex
    * digits of the key — exactly representable in binary64, so every
    * engine ranks it bit-identically (mirrored by the oracle's u52Sql).
    * One definition shared by every ranking sampler so the cross-engine
    * contract cannot drift between them. */
  private def u52(keyCol: String): Column =
    conv(substring(md5(col(keyCol).cast("string")), 1, 13), 16, 10)
      .cast("long")

  /** Fixed-BUDGET weighted sample — keep exactly `n` rows with inclusion
    * probability approximately proportional to `weight` (sequential
    * Poisson / order sampling, Ohlsson 1998: rank by u/w for a
    * per-row uniform u and take the n smallest — the πps-approximating
    * order-sampling design production pipelines use for "sample 10M docs
    * proportional to quality").
    *
    * Budget-based where stratifiedSample is rate-based: callers fix the
    * output SIZE, not a keep-fraction. Samples NEST in the budget —
    * the priority order is fixed, so the top-50 sample is a subset of the
    * top-100 sample.
    *
    * Determinism across engines is arranged digit by digit: u is the
    * integer of the first 13 md5 hex digits of the key — 52 bits, so it
    * is EXACTLY representable in binary64 — and the only floating-point
    * operation is the single division u/w, which IEEE 754 rounds exactly
    * the same way in the JVM and in the DuckDB oracle. No ln/exp (their
    * last-ulp behavior is libm-dependent and would flip adjacent ranks),
    * no rand(). Ties break on the key.
    *
    * Rows with non-positive weight or a NULL key are excluded (a zero
    * weight has zero inclusion probability; a negative one is a caller
    * bug surfaced by absence, matching SQL filter semantics; a NULL key
    * has no md5 and the engines disagree on NULL sort order — Spark
    * NULLS FIRST, most SQL engines NULLS LAST — so it must never reach
    * the ranking).
    *
    * Scale: sort+limit plans as a per-partition partial top-n followed by
    * an n-bounded merge — the corpus is scanned once, map-side, and only
    * n candidates per partition move. `n` must fit the driver/single
    * partition (the usual reservoir contract; fine for n into the
    * millions).
    */
  def weightedSample(df: DataFrame, keyCol: String, weight: Column,
                     n: Int): DataFrame = {
    require(n >= 0, s"sample budget n=$n must be non-negative")
    df.where(weight > 0 && col(keyCol).isNotNull)
      .withColumn("__pri", u52(keyCol).cast("double") / weight.cast("double"))
      .orderBy(col("__pri").asc, col(keyCol).asc)
      .limit(n)
      .drop("__pri")
  }

  /** √-temperature mixture sample — the multilingual/source REBALANCING
    * operator: draw a fixed total budget `n` with per-stratum allocations
    * proportional to sqrt(stratum count) (temperature T=2 mixing, the
    * classic upweight-the-tail schedule for multilingual corpora), then
    * order-sample each stratum's allocation deterministically.
    *
    * Budget arithmetic is INTEGER-EXACT so the oracle replays it:
    * weight_s = floor(sqrt(count_s) · 2^20) — sqrt is correctly rounded
    * by IEEE 754 in every engine, the scale is a power of two, floor is
    * unambiguous — then largest-remainder apportionment of `n` over the
    * integer weights (ties by remainder DESC, stratum ASC). The fit is
    * stratum-count-sized, computed on the driver with BigInt (no
    * overflow at any corpus size) and broadcast back as a literal budget
    * table. Within a stratum, rows are ranked by the same
    * exactly-representable 52-bit md5 integer as weightedSample — a
    * ranking window under a rank filter, which Spark executes as a
    * partial per-partition top-k (WindowGroupLimit) before the stratum
    * shuffle.
    *
    * A stratum smaller than its allocation yields all its rows (the
    * output is then smaller than `n`) — allocations are targets, not
    * resampling-with-replacement. Strata are read as strings (the
    * mixture key is a language/source tag). Rows with a NULL stratum or
    * NULL key are excluded up front: a NULL stratum has no mixture tag
    * to rebalance (and would NPE the driver-side budget sort), and a
    * NULL key has no md5 rank — same contract as weightedSample.
    */
  def sqrtMixtureSample(df: DataFrame, strataCol: String, keyCol: String,
                        n: Int): DataFrame = {
    require(n >= 0, s"sample budget n=$n must be non-negative")
    val in = df.where(col(strataCol).isNotNull && col(keyCol).isNotNull)
    val counts = in.groupBy(col(strataCol).cast("string").as("__s"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
    if (counts.isEmpty) return in.limit(0)
    val wts = counts.map { case (s, c) =>
      (s, math.floor(math.sqrt(c.toDouble) * 1048576.0).toLong)
    }
    val tw = wts.map(w => BigInt(w._2)).sum
    val quotas = wts.map { case (s, w) =>
      (s, (BigInt(n) * w / tw).toLong, (BigInt(n) * w % tw))
    }
    val leftover = n - quotas.map(_._2).sum
    val bonus = quotas.sortBy { case (s, _, rem) => (-rem, s) }
      .take(leftover.toInt).map(_._1).toSet
    val budgets = quotas.map { case (s, base, _) =>
      (s, base + (if (bonus(s)) 1L else 0L))
    }
    val spark = df.sparkSession
    import spark.implicits._
    val budgetDf = broadcast(budgets.toSeq.toDF("__s", "__budget"))
    val u = u52(keyCol)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__s")).orderBy(col("__u").asc, col(keyCol).asc)
    // the literal rank cut (max budget) sits directly under the window so
    // Spark plans a WindowGroupLimit — per-partition partial top-k before
    // the stratum shuffle; the per-stratum exact budget then trims via
    // the broadcast join
    val maxBudget = budgets.map(_._2).max
    in.withColumn("__s", col(strataCol).cast("string"))
      .withColumn("__u", u)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= lit(maxBudget))
      .join(budgetDf, Seq("__s"))
      .where(col("__rn") <= col("__budget"))
      .drop("__s", "__u", "__rn", "__budget")
  }

  /** Per-group cap — the DOMAIN-CAPPING operator (Gopher / RefinedWeb
    * style): keep at most `cap` rows per group (source domain, site,
    * license bucket), so no single over-crawled domain dominates the
    * corpus. The keeper set is deterministic — rows rank within their
    * group by the same exactly-representable 52-bit md5 integer as
    * weightedSample, keys break ties — and NESTS: the cap-10 survivors
    * are a subset of the cap-100 survivors, so tightening a cap never
    * resurrects a dropped row.
    *
    * NULL groups form their own group (an unknown domain is still a
    * domain, and both engines bucket NULL partition keys together); NULL
    * keys are excluded for the same cross-engine sort-order reason as
    * weightedSample.
    *
    * Scale: the literal rank cut under the window plans as a
    * WindowGroupLimit — each partition keeps its per-group top-`cap`
    * BEFORE the group shuffle, so the exchange carries at most
    * cap × groups × partitions rows, not the corpus. No driver state at
    * any group count (contrast sqrtMixtureSample, whose budget fit is
    * stratum-count-sized by design).
    */
  /** X137 — WATER-FILLING budget allocation: split a total row budget
    * B across groups (sources, languages) as EQUALLY as availability
    * allows — every group gets min(avail, L) for the common level L
    * with Σ min(avail_i, L) = B, the uniform-target mixture allocation
    * (the "cap the big, fill toward the small" step between X101's
    * uniform weights and X24b's √-temperature: temperature rebalances
    * PROPORTIONS, water-filling clears an absolute BUDGET). Small
    * groups are taken whole; the rest share the remainder equally,
    * largest-remainder style: base = R div m with the `R mod m` spare
    * units granted to the FIRST uncapped groups under the (avail ASC,
    * group ASC) order — fully integer-exact, so the allocation is
    * bit-identical in any engine and Σ allocated = min(B, Σ avail)
    * always.
    *
    * The capped set is a PREFIX of the (avail ASC, group ASC) order:
    * group i is capped iff avail_i · (n−i+1) ≤ B − P_{i−1} (prefix sums
    * P) — a monotone integer test, evaluated per row with two running
    * windows over the |groups|-sized count frame. Everything after the
    * one corpus→|groups| count aggregation is bounded plan metadata
    * (the X118 "mixture taxonomies are small" contract), so at 100 TB
    * the operator is one map-side-partial count plus arithmetic on a
    * broadcast-sized frame. Output (group, avail, allocated), one row
    * per group; compose with X22c/X24-style per-group rank cuts to
    * materialize the selected rows. */
  def waterFill(df: DataFrame, groupCol: String, budget: Long): DataFrame = {
    require(budget >= 0, s"budget=$budget must be non-negative")
    val counts = df.where(col(groupCol).isNotNull)
      .groupBy(col(groupCol).as("group"))
      .agg(count(lit(1)).as("avail"))
    val W = org.apache.spark.sql.expressions.Window
    val ord = W.orderBy(col("avail").asc, col("group").asc)
    val wPrev = ord.rowsBetween(W.unboundedPreceding, -1)
    val wAll = W.partitionBy()
    val flagged = counts
      .withColumn("__i", row_number().over(ord).cast(LongType))
      .withColumn("__p", coalesce(sum(col("avail")).over(wPrev), lit(0L)))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__capped",
        col("avail") * (col("__n") - col("__i") + 1) <=
          lit(budget) - col("__p"))
    val k = flagged
      .agg(sum(when(col("__capped"), lit(1L)).otherwise(lit(0L))).as("k"),
        sum(when(col("__capped"), col("avail")).otherwise(lit(0L)))
          .as("pk"),
        count(lit(1)).as("n"))
    flagged.join(broadcast(k), lit(true))
      .withColumn("__m", col("n") - col("k"))
      .withColumn("__r", lit(budget) - col("pk"))
      .withColumn("allocated",
        when(col("__capped"), col("avail"))
          .otherwise(expr("__r div __m") +
            when(col("__i") - col("k") <= col("__r") % col("__m"), lit(1L))
              .otherwise(lit(0L))))
      .select(col("group"), col("avail"),
        col("allocated").cast(LongType).as("allocated"))
  }

  def capPerGroup(df: DataFrame, groupCol: String, keyCol: String,
                  cap: Int): DataFrame = {
    require(cap >= 0, s"cap=$cap must be non-negative")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("__u").asc, col(keyCol).asc)
    df.where(col(keyCol).isNotNull)
      .withColumn("__u", u52(keyCol))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= cap)
      .drop("__u", "__rn")
  }

  /** Deterministic epoch expansion — the MIXTURE-REWEIGHTING-BY-REPEAT
    * operator: materialize each row `factor` times on average, where
    * `factor` is a per-row repeat target (e.g. joined from a per-source
    * weight table: books ×2.5, boilerplate web ×0.3). LLM data mixtures
    * are specified this way (DoReMi / Llama-style source weights become
    * epoch counts over the tokenized corpus), and the explode must be
    * deterministic so reruns produce the same corpus.
    *
    * repeats = floor(factor) + one extra epoch for the rows whose md5
    * bucket (out of 10 000) falls under the fractional part — i.e. a
    * factor of 2.3 gives every row 2 epochs and a deterministic,
    * key-hash-chosen 30% of rows a 3rd. The fractional threshold is
    * rounded to integer basis points so the only float op (factor×10⁴)
    * is replayable. factor ≤ 0 or NULL drops the row (weight-zero
    * sources leave the mixture); NULL keys are excluded as everywhere
    * in this module.
    *
    * Output: the input columns plus `epoch` (1-based). Map-side only —
    * a generator over each row, no shuffle, no driver state; at 100 TB
    * the expansion streams through the scan like any projection.
    */
  def epochRepeat(df: DataFrame, keyCol: String, factor: Column): DataFrame = {
    val bp = round(factor * 10000).cast("long") // basis points, integer-exact
    val whole = (bp / 10000L).cast("int")
    val fracBp = bp % 10000L
    val extra = (hashBucket(col(keyCol), 10000) < fracBp).cast("int")
    df.where(col(keyCol).isNotNull && factor > 0)
      .withColumn("__rep", whole + extra)
      .where(col("__rep") > 0)
      .withColumn("epoch", explode(sequence(lit(1), col("__rep"))))
      .drop("__rep")
  }

  /** Split-leakage audit — the EVAL-HYGIENE operator: given near-duplicate
    * pairs (from any dedup stage: MinHash-verified, SimHash, embedding
    * near-dup) and a split assignment, report every pair whose members
    * landed in DIFFERENT splits. Each such pair is a test document whose
    * near-copy is trained on — the leakage that grouped split assignment
    * (splitAssign on a group key) is supposed to prevent and that this
    * audit proves absent or localizes.
    *
    * Output: (a, b, split_a, split_b) for leaking pairs only. Scale: two
    * shuffles on the pair-member ids, both sides pair-count-sized on the
    * left — the corpus-sized assignment table streams through as the
    * build/probe side and never multiplies (pair ids are unique per
    * row). At 100 TB this is dwarfed by producing the pairs themselves.
    */
  def splitLeakage(pairs: DataFrame, aCol: String, bCol: String,
                   assign: DataFrame, idCol: String,
                   splitCol: String): DataFrame = {
    val asg = assign.select(col(idCol), col(splitCol))
    pairs.select(col(aCol).as("a"), col(bCol).as("b"))
      .join(asg.select(col(idCol).as("a"), col(splitCol).as("split_a")), Seq("a"))
      .join(asg.select(col(idCol).as("b"), col(splitCol).as("split_b")), Seq("b"))
      .where(col("split_a") =!= col("split_b"))
      .select(col("a"), col("b"), col("split_a"), col("split_b"))
  }

  /** Deterministic `pct`-percent sample: rows whose key hashes into the
    * first `pct` of 100 buckets. Same input → same sample, on any cluster
    * layout, in any engine. */
  def hashSample(df: DataFrame, keyCol: String, pct: Int): DataFrame = {
    require(pct >= 0 && pct <= 100)
    df.where(hashBucket(col(keyCol), 100) < pct)
  }

  /** Per-stratum deterministic sampling — the TRAINING-MIXTURE operator:
    * each stratum (language, source domain, quality tier) keeps its own
    * percentage of rows, so the sampled corpus matches a target mixture
    * (e.g. upweight books, downweight boilerplate web). `rates` maps
    * stratum value → integer percentage; strata not listed get
    * `defaultPct`. Selection reuses the md5 bucket of `keyCol`, so the
    * per-stratum samples inherit hashSample's reproducibility AND nest:
    * raising a rate from 10 to 20 keeps the original 10% inside the 20%.
    *
    * The rates ship as a broadcast-joined literal table rather than a
    * CASE chain — the form that still works when the rates are themselves
    * computed (e.g. proportional-allocation output), and the optimizer
    * folds the tiny side into a broadcast hash join with zero shuffle on
    * the corpus.
    */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: String,
                       rates: Seq[(String, Int)],
                       defaultPct: Int = 0): DataFrame = {
    require((defaultPct +: rates.map(_._2)).forall(p => p >= 0 && p <= 100),
      "rates must be percentages in [0, 100]")
    require(rates.map(_._1).distinct.size == rates.size,
      "duplicate stratum in rates — the join would duplicate its rows")
    val spark = df.sparkSession
    import spark.implicits._
    val rateTbl = rates.toDF("__stratum", "__pct")
    df.join(broadcast(rateTbl), col(strataCol) === col("__stratum"), "left")
      .where(hashBucket(col(keyCol), 100) <
        coalesce(col("__pct"), lit(defaultPct)))
      .drop("__stratum", "__pct")
  }

  /** Concat-and-chunk sequence packing — how LLM pretraining actually
    * consumes documents: within each group (shard, source, …) documents
    * are laid out in `orderCol` order as one virtual token stream and cut
    * into fixed `budget`-token context windows. Each document is assigned
    * the chunk where its first token lands, plus its offset in that chunk
    * and whether it straddles a chunk boundary (the rows a loader must
    * split). One running-sum window per group — no shuffle beyond the
    * group partitioning, no driver loop; at 100 TB the group key is the
    * shard, so every window fits an executor.
    *
    * Returns (group, order key, n_tokens, chunk, chunk_offset, straddles).
    */
  def packChunks(df: DataFrame, groupCol: String, orderCol: String,
                 tokensCol: String, budget: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(orderCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val start = sum(col(tokensCol)).over(w) - col(tokensCol)
    df.select(col(groupCol), col(orderCol), col(tokensCol))
      .withColumn("__start", start)
      .select(col(groupCol), col(orderCol),
        col(tokensCol).cast("long").as("n_tokens"),
        floor(col("__start") / budget).as("chunk"),
        (col("__start") % budget).as("chunk_offset"),
        (col("__start") % budget + col(tokensCol) > budget).as("straddles"))
  }

  /** Physical fan-out of the two-phase ranks: how many leading md5 hex
    * chars form the sub-bucket (1 → 16-way, 2 → 256-way). The bucket is
    * a PREFIX of the rank order, so the choice changes only the physical
    * plan — the output rank is bit-identical at any width (pinned by
    * RankFanoutSpec). Width is picked from Catalyst's free size estimate
    * (`optimizedPlan.stats.sizeInBytes` — no extra pass over the data):
    * small inputs skip the 256-way constant (the count frame, its
    * prefix-sum window, and the broadcast build all scale with the
    * fan-out, which r8 measured as a 2.8× overhead on a 5k-row group),
    * large inputs take the full width that 100 TB skew-proofing needs. */
  private def bucketHexChars(df: DataFrame, forced: Option[Int]): Int =
    forced.getOrElse(
      if (df.queryExecution.optimizedPlan.stats.sizeInBytes < (32L << 20)) 1
      else 2)

  /** Scalable md5 rank: 1-based position of every row under the
    * (md5(seed:key), key) order within each `parts` group (no `parts` =
    * one global order), WITHOUT a single-reducer window. The rank key's
    * first hex chars ([[bucketHexChars]]) are used as a 16/256-way bucket;
    * because the bucket is a
    * PREFIX of the rank key, bucket-major order IS the md5 order. Bucket
    * counts (|parts| × 256 rows) get a prefix-sum window and broadcast-join
    * back as offsets; position = bucket offset + row_number within
    * (parts, bucket). Every stage is 256-way parallel per group — this is
    * how a global training-order permutation stays distributed at 100 TB,
    * where `row_number() OVER (ORDER BY …)` would serialize the corpus
    * through one task.
    *
    * Adds `outCol` (1-based LongType) plus nothing else; NULL keys are
    * excluded (no md5, engines disagree on NULL order). */
  private def md5Rank(df: DataFrame, keyCol: String, seed: String,
                      parts: Seq[String], outCol: String): DataFrame =
    md5RankWithCounts(df, keyCol, seed, parts, outCol)._1

  /** md5Rank plus its tiny (parts × 256)-row bucket-counts frame, so
    * callers needing per-group totals (interleave) can fold them from the
    * counts instead of re-aggregating the corpus. */
  private def md5RankWithCounts(df: DataFrame, keyCol: String, seed: String,
                                parts: Seq[String], outCol: String,
                                hexChars: Option[Int] = None)
      : (DataFrame, DataFrame) = {
    val W = org.apache.spark.sql.expressions.Window
    val rk = md5(concat_ws(":", lit(seed), col(keyCol).cast("string")))
    val in = df.where(col(keyCol).isNotNull)
      .withColumn("__rk", rk)
      .withColumn("__b", substring(col("__rk"), 1, bucketHexChars(df, hexChars)))
    val partCols = parts.map(col)
    val counts = in.groupBy(partCols :+ col("__b"): _*)
      .agg(count(lit(1)).as("__n"))
    val cw = (if (parts.isEmpty) W.partitionBy()
              else W.partitionBy(partCols: _*))
      .orderBy(col("__b"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("__off", coalesce(sum(col("__n")).over(cw), lit(0L)))
      .drop("__n")
    val rw = W.partitionBy(partCols :+ col("__b"): _*)
      .orderBy(col("__rk").asc, col(keyCol).asc)
    (in.join(broadcast(offsets), parts :+ "__b")
      .withColumn(outCol, col("__off") + row_number().over(rw).cast("long"))
      .drop("__rk", "__b", "__off"),
      counts)
  }

  /** Deterministic global shuffle — the TRAINING-ORDER operator: a full
    * pseudo-random permutation of the corpus, reproducible across reruns,
    * engines, and cluster layouts. Training runs consume data in a fixed
    * shuffled order (and must replay it exactly on restart); `rand()`
    * cannot provide that, `md5(seed:key)` can — changing `seed` gives an
    * independent permutation for the next epoch.
    *
    * Output: the input columns plus `pos` (1-based global position under
    * the md5 order). Computed with the two-phase bucket rank ([[md5Rank]])
    * — no global window, no driver state; writing the corpus range-
    * partitioned by `pos` materializes the shuffle. */
  def shuffleOrder(df: DataFrame, keyCol: String,
                   seed: String = "shuffle"): DataFrame =
    md5Rank(df, keyCol, seed, Seq.empty, "pos")

  /** X73 — deterministic contrastive NEGATIVE sampling: k pseudo-random
    * negatives per anchor, uniform over the corpus EXCLUDING the anchor,
    * reproducible under any partitioning (the `rand()`-free discipline).
    * Construction: rank the corpus 1..N in md5 order ([[shuffleOrder]]'s
    * two-phase rank — no global window); for anchor a (rank rₐ) and slot
    * j, draw t = H(a,j) mod (N−1) + 1 from the 52-bit md5 prefix and
    * step t past rₐ (t ≥ rₐ → t+1) — an exact bijection onto
    * [1..N]∖{rₐ}, so self-pairs are impossible BY ARITHMETIC, not by a
    * filter that would bias slot counts. One equi-join of probes on the
    * rank — shuffle on an integer key, uniform by construction (ranks
    * are a permutation), never a corpus×corpus stage.
    *
    * Output: (anchor_id, slot [1..k], neg_id).
    */
  def negativeSamples(df: DataFrame, idCol: String, k: Int,
                      seed: String = "neg"): DataFrame = {
    require(k > 0, s"k=$k must be positive")
    val ranked = shuffleOrder(df.select(col(idCol).as("id")), "id", seed)
      .select(col("id"), col("pos"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = ranked.agg(count(lit(1)).as("__N"))
    val slots = array((1 to k).map(lit): _*)
    val draw = conv(substring(md5(concat_ws("|", lit(seed),
      col("anchor_id").cast("string"), col("slot").cast("string"))), 1, 13),
      16, 10).cast("long")
    val probes = ranked.crossJoin(broadcast(n))
      .where(col("__N") > 1) // a 1-doc corpus has no valid negative
      .select(col("id").as("anchor_id"), col("pos").as("__ra"), col("__N"),
        explode(slots).as("slot"))
      .withColumn("__t", pmod(draw, col("__N") - 1) + 1)
      .withColumn("__t",
        when(col("__t") >= col("__ra"), col("__t") + 1).otherwise(col("__t")))
    probes.join(ranked.select(col("pos").as("__t"), col("id").as("neg_id")),
        "__t")
      .select(col("anchor_id"), col("slot").cast("long").as("slot"),
        col("neg_id"))
  }

  /** Deterministic proportional source interleave — the MIXTURE-ORDER
    * operator: lay out a multi-source corpus so every prefix of the
    * training stream holds each source in proportion to its size (no
    * "all of source A, then all of B" — order matters to the loss curve).
    * The i-th document (1-based, md5-ranked within its source) of a
    * source with n rows gets the rational position (2i−1)/(2n) ∈ (0,1);
    * sorting by it interleaves sources Bresenham-style. The key is
    * materialized integer-exact as ikey = floor((2i−1)·2⁴⁰ / (2n)) —
    * DECIMAL(38,0) intermediate so no overflow at any corpus size — and
    * the (ikey, source, key) order is total and engine-replayable.
    *
    * Per-source ranks come from [[md5Rank]] partitioned by source (256-way
    * parallel per source); per-source totals fold out of the same counts.
    * One broadcast of a |sources|×256 frame — no corpus-sized shuffle
    * beyond the final interleave sort itself. */
  def interleave(df: DataFrame, sourceCol: String, keyCol: String,
                 seed: String = "interleave"): DataFrame = {
    val (ranked, counts) = md5RankWithCounts(df.where(col(sourceCol).isNotNull),
      keyCol, seed, Seq(sourceCol), "__i")
    // per-source totals fold out of the 256-rows-per-source counts frame —
    // never a second corpus-sized aggregation
    val totals = counts.groupBy(col(sourceCol))
      .agg(sum(col("__n")).as("__ns"))
    // `div` (IntegralDivide) is BigDecimal divideToIntegralValue — the
    // EXACT integer quotient; a `/`+floor spelling would round the decimal
    // quotient HALF_UP at scale 6 first and overshoot the floor for
    // fractional parts above 1 − 5e-7 (reachable once a source exceeds
    // ~2M rows)
    ranked.join(broadcast(totals), Seq(sourceCol))
      .withColumn("ikey",
        expr("(CAST(__i * 2 - 1 AS DECIMAL(38,0)) * 1099511627776L) " +
          "div (__ns * 2)"))
      .drop("__i", "__ns")
  }

  /** Scalable global rank BY VALUE — the curriculum/percentile operator:
    * the exact 1-based position of every row under the total order
    * (value asc, md5(key) asc, key asc), again with NO single-reducer
    * window. Same two-phase idea as [[md5Rank]], but the bucket here is
    * (value, first md5 hex byte): a PREFIX of the sort order because the
    * within-value tiebreak is DEFINED as the md5 order — deterministic,
    * engine-replayable, and skew-proof (a value shared by billions of
    * rows still splits over 256 buckets; a plain value-partitioned window
    * would serialize it). Offsets come from a prefix-sum over the
    * (distinct values × 256)-row count frame, broadcast back.
    *
    * Ranks are EXACT regardless of value distribution; from them,
    * integer math gives percentile/decile curriculum buckets with no
    * float division. Adds `rnk` (LongType); NULL values/keys excluded.
    *
    * CONTRACT: the input frame is consumed TWICE (bucket counts, then
    * the rank join) — persist upstream when it is expensive to
    * recompute (buildVocab does). The offsets frame is (distinct values
    * × 256) rows — the prefix-sum window over it is the one serial
    * step, and it is broadcast. Both are fine for the operator's domain (discrete
    * scores: lengths, integer quality tiers, bucketed losses) and wrong
    * for a mostly-unique continuous column, where the frame approaches
    * corpus size — quantize such a column first (e.g. round to a fixed
    * grid); ranking a continuous value at full precision has no
    * training-curriculum meaning anyway.
    */
  def rankByValue(df: DataFrame, valueCol: String, keyCol: String,
                  hexChars: Option[Int] = None): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val in = df.where(col(keyCol).isNotNull && col(valueCol).isNotNull)
      .withColumn("__rk", md5(col(keyCol).cast("string")))
      .withColumn("__b", substring(col("__rk"), 1, bucketHexChars(df, hexChars)))
    val counts = in.groupBy(col(valueCol).as("__v"), col("__b"))
      .agg(count(lit(1)).as("__n"))
    val cw = W.orderBy(col("__v").asc, col("__b").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("__off", coalesce(sum(col("__n")).over(cw), lit(0L)))
      .drop("__n")
      .withColumnRenamed("__b", "__ob")
    val rw = W.partitionBy(col(valueCol), col("__b"))
      .orderBy(col("__rk").asc, col(keyCol).asc)
    in.join(broadcast(offsets),
        col(valueCol) === col("__v") && col("__b") === col("__ob"))
      .withColumn("rnk", col("__off") + row_number().over(rw).cast("long"))
      .drop("__v", "__rk", "__b", "__ob", "__off")
  }

  /** Per-group [[rankByValue]] — the exact 1-based rank of every row
    * WITHIN its group under (value asc, md5(key) asc, key asc), with no
    * window ever partitioned by the bare group column. A plain
    * `row_number() OVER (PARTITION BY grp ORDER BY v)` serializes each
    * group through one reducer — fatal when a group is corpus-sized (one
    * dominant language, one mega-source). Here the window partition is
    * (group, value, md5-prefix bucket): a group sharing one value still
    * fans out over 256 buckets, so the largest window partition is
    * ~|group|/(|distinct values|×256) rows regardless of group skew.
    *
    * Offsets come from a per-group prefix sum over the
    * (groups × distinct values × 256)-row count frame — the only serial
    * step runs per group over that small frame, and the frame is
    * broadcast. Adds `rnk` (LongType) and `n` (LongType, the group size —
    * free from the same count frame, no second window). NULL groups /
    * values / keys excluded. Same contract as [[rankByValue]]: input
    * consumed twice (persist upstream when expensive) and the value
    * column must be discrete/quantized, or the count frame approaches
    * corpus size.
    */
  def rankByValueGrouped(df: DataFrame, groupCol: String, valueCol: String,
                         keyCol: String,
                         hexChars: Option[Int] = None): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val in = df.where(col(groupCol).isNotNull && col(keyCol).isNotNull &&
        col(valueCol).isNotNull)
      .withColumn("__rk", md5(col(keyCol).cast("string")))
      .withColumn("__b", substring(col("__rk"), 1, bucketHexChars(df, hexChars)))
    val counts = in
      .groupBy(col(groupCol).as("__g"), col(valueCol).as("__v"), col("__b"))
      .agg(count(lit(1)).as("__n"))
    val cw = W.partitionBy(col("__g")).orderBy(col("__v").asc, col("__b").asc)
      .rowsBetween(W.unboundedPreceding, -1)
    val nw = W.partitionBy(col("__g"))
    val offsets = counts
      .withColumn("__off", coalesce(sum(col("__n")).over(cw), lit(0L)))
      .withColumn("__gn", sum(col("__n")).over(nw))
      .drop("__n")
      .withColumnRenamed("__b", "__ob")
    val rw = W.partitionBy(col(groupCol), col(valueCol), col("__b"))
      .orderBy(col("__rk").asc, col(keyCol).asc)
    in.join(broadcast(offsets),
        col(groupCol) === col("__g") && col(valueCol) === col("__v") &&
          col("__b") === col("__ob"))
      .withColumn("rnk", col("__off") + row_number().over(rw).cast("long"))
      .withColumn("n", col("__gn").cast("long"))
      .drop("__g", "__v", "__rk", "__b", "__ob", "__off", "__gn")
  }

  /** Token-budget selection — the CURATION operator: within each group
    * (source, language, shard), keep the best rows by a quality order
    * until a token budget is exhausted — "take the highest-quality docs
    * from every source up to N tokens each", the step that turns scored
    * corpora into a sized training mixture. A row is kept iff its
    * INCLUSIVE running token total (in quality-desc order, key-asc
    * tiebreak) stays within `budget` — so selection is deterministic,
    * prefix-closed (raising the budget only adds rows), and exact when
    * `tokensCol` is integral (the running sum is integer arithmetic, no
    * float drift).
    *
    * Output: kept rows with `cum_tokens` (the inclusive running total).
    * Scale: one running-sum window per group — the packChunks shape; the
    * group key is the mixture unit, so every window fits an executor, and
    * there is no global coordination at any group count.
    */
  def tokenBudgetSelect(df: DataFrame, groupCol: String, keyCol: String,
                        qualityCol: Column, tokensCol: String,
                        budget: Long): DataFrame = {
    require(budget >= 0, s"budget=$budget must be non-negative")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(qualityCol.desc, col(keyCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.where(col(keyCol).isNotNull)
      .withColumn("cum_tokens", sum(col(tokensCol).cast("long")).over(w))
      .where(col("cum_tokens") <= budget)
  }

  /** X72 — top-p (nucleus) mass cut per group: keep, in (weight desc,
    * key asc) order, the SHORTEST prefix whose weight mass reaches
    * p = pNum/pDen of the group total — the proportional complement of
    * [[tokenBudgetSelect]]'s absolute budget (nucleus sampling supports,
    * vocabulary-coverage cuts, "smallest set of sources covering 90% of
    * tokens"). A row survives iff the mass BEFORE it is still short of
    * p·total: (cum − w)·pDen < pNum·total, all integer cross-products —
    * no float fraction can flip a boundary row, and the crossing row is
    * always included (so the kept mass is ≥ p, minimal by construction).
    * Selection is prefix-closed in p: raising p only adds rows.
    *
    * One window per group (running sum + total over the same partition —
    * a single shuffle and sort, same shape as tokenBudgetSelect). Output:
    * input columns + cum_w + total_w.
    */
  def topPMassCut(df: DataFrame, groupCol: String, keyCol: String,
                  weightCol: String, pNum: Long, pDen: Long): DataFrame = {
    require(pDen > 0 && pNum >= 0 && pNum <= pDen,
      s"p = $pNum/$pDen must lie in [0, 1]")
    // The integer-exactness argument (no float fraction can flip a
    // boundary row) only holds if the weight IS integral: a double
    // weight would truncate inside the running sum but participate raw
    // in the boundary predicate — silently mixing long and double
    // arithmetic. Require an integral column up front.
    val wType = df.schema(weightCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(wType),
      s"topPMassCut needs an integral weight column; $weightCol is $wType" +
        " (pre-scale fractional weights to integers, e.g. micro-units)")
    val w = col(weightCol).cast("long")
    val W = org.apache.spark.sql.expressions.Window
    val run = W.partitionBy(col(groupCol))
      .orderBy(col(weightCol).desc, col(keyCol).asc)
      .rowsBetween(W.unboundedPreceding, 0)
    val tot = W.partitionBy(col(groupCol))
    df.where(col(keyCol).isNotNull && col(weightCol).isNotNull)
      .withColumn("cum_w", sum(w).over(run))
      .withColumn("total_w", sum(w).over(tot))
      .where((col("cum_w") - w) * pDen < col("total_w") * pNum)
  }

  /** Sequence-length bucketing — the BATCHING-EFFICIENCY diagnostic:
    * assign every row to the first step of a fixed length `ladder` that
    * fits its token count (the bucketed-batching scheme loaders use so a
    * batch pads to its bucket size, not the corpus max), and report per
    * bucket the document count, true token mass, and padding waste
    * (bucket − tokens, summed). Rows longer than the top step land in
    * bucket −1 (overflow — the rows a loader must truncate or split).
    * All-integer arithmetic; one map-side CASE + one ≤|ladder|+1-group
    * aggregation — nothing corpus-sized shuffles.
    */
  def lengthBuckets(df: DataFrame, tokensCol: String,
                    ladder: Seq[Int]): DataFrame = {
    require(ladder.nonEmpty && ladder == ladder.sorted && ladder.head > 0,
      s"ladder must be ascending positive steps: $ladder")
    val t = col(tokensCol).cast("long")
    val bucket = ladder.tail.foldLeft(when(t <= ladder.head, ladder.head.toLong)) {
      (acc, step) => acc.when(t <= step, step.toLong)
    }.otherwise(lit(-1L))
    df.select(t.as("__t"), bucket.as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__t")).as("sum_tokens"),
        sum(when(col("bucket") === -1L, lit(0L))
          .otherwise(col("bucket") - col("__t"))).as("sum_padding"))
  }

  /** Leakage-free train/validation/test assignment: the split is decided
    * by the hash of `groupCol` (e.g. source domain, near-dup cluster id),
    * so all documents of a group land in the SAME split — the property
    * that keeps near-duplicates of a training document out of the test
    * set. `weights` are integer percentages summing to 100, assigned in
    * order to the given split names.
    */
  def splitAssign(df: DataFrame, groupCol: String,
                  splits: Seq[(String, Int)]): DataFrame = {
    require(splits.map(_._2).sum == 100, "split weights must sum to 100")
    val bucket = hashBucket(col(groupCol), 100)
    val assignment = splits.tail.foldLeft(
      (when(bucket < splits.head._2, splits.head._1), splits.head._2)) {
      case ((expr, cum), (name, w)) =>
        (expr.when(bucket < cum + w, name), cum + w)
    }._1
    df.withColumn("split", assignment)
  }

  /** Preference-pair construction for alignment training (the DPO /
    * RLHF-style data shape: per prompt-group, a CHOSEN and a REJECTED
    * response with chosen strictly-not-worse): within each group, rank
    * documents by `scoreCol` and pair the i-th best with the i-th worst,
    * i = 1..k. Pair i exists only while 2i ≤ |group| — the two ends have
    * not crossed — which also guarantees chosen ≠ rejected and
    * margin = chosen − rejected ≥ 0 by construction.
    *
    * Determinism: the descending rank breaks ties (score DESC, id ASC)
    * and the ascending rank with the MIRRORED key (score ASC, id DESC),
    * so the bottom order is exactly the reversed top order and the pair
    * set is a pure function of the data. `scoreCol` should be an integer
    * key (the corpus discipline — ratio scores enter as a·SCALE div b).
    *
    * Scale shape: both rank filters are rank ≤ k, so each plans a
    * WindowGroupLimit — every map task keeps at most k rows per group
    * BEFORE the shuffle; the group-size frame is one count aggregation;
    * the final equi-join keys on (group, i) with ≤ k rows per group per
    * side. No stage carries more than k·|groups| rows past its shuffle. */
  def preferencePairs(df: DataFrame, groupCol: String, idCol: String,
                      scoreCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    import org.apache.spark.sql.expressions.Window
    val slim = df.select(col(groupCol), col(idCol), col(scoreCol))
      .where(col(scoreCol).isNotNull && col(idCol).isNotNull)
    val top = Window.partitionBy(groupCol)
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    val bot = Window.partitionBy(groupCol)
      .orderBy(col(scoreCol).asc, col(idCol).desc)
    val chosen = slim
      .withColumn("pair_id", row_number().over(top).cast(LongType))
      .where(col("pair_id") <= k)
      .select(col(groupCol), col("pair_id"),
        col(idCol).as("chosen_id"), col(scoreCol).as("__cs"))
    val rejected = slim
      .withColumn("pair_id", row_number().over(bot).cast(LongType))
      .where(col("pair_id") <= k)
      .select(col(groupCol), col("pair_id"),
        col(idCol).as("rejected_id"), col(scoreCol).as("__rs"))
    val sizes = slim.groupBy(groupCol).agg(count(lit(1)).as("__n"))
    chosen.join(rejected, Seq(groupCol, "pair_id"))
      .join(sizes, groupCol)
      .where(col("pair_id") * 2 <= col("__n"))
      .select(col(groupCol), col("pair_id"), col("chosen_id"),
        col("rejected_id"), (col("__cs") - col("__rs")).as("margin"))
  }

  /** DSIR-style importance score for data selection (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling"):
    * score each document by how much its hashed-token distribution looks
    * like a TARGET slice of the corpus relative to the corpus at large,
    * so a top-score resample shifts the training mixture toward the
    * target domain without a trained classifier.
    *
    * The published method buckets n-gram features into a small hashed
    * space, estimates target (p) and raw (q) bucket probabilities, and
    * weights each document by its importance under p vs q. This engine
    * keeps the estimator EXACT and engine-replayable:
    *
    *   - feature = md5 bucket of each whitespace token ([[hashBucket]] —
    *     the corpus-pipeline hash discipline, never `hash()`'s
    *     murmur3 whose seed is engine-private);
    *   - bucket weight w_b = (p_b · SCALE) intdiv q_b with add-one
    *     smoothed counts — all-integer, so both engines truncate
    *     identically (operands are positive: truncation = floor). The
    *     p/q normalizers (total target / corpus tokens) are DROPPED:
    *     they are bucket-independent constants, so per-document ranking
    *     is unchanged and the arithmetic stays in BIGINT range
    *     (p_b·SCALE ≤ 10⁶·|target tokens|; at the ~10¹³-token scale
    *     where that would overflow, lift the product to DECIMAL(38,0) —
    *     the weight table is |buckets| rows either way);
    *   - document score = Σ_b n_db · w_b, a map-side partial aggregation
    *     after a BROADCAST join of the |buckets|-row weight table.
    *
    * Log-free on purpose: the published estimator sums log-ratios, but
    * ln's last-ulp behavior is libm-dependent and would flip adjacent
    * ranks between engines; the linear-ratio sum preserves the "more
    * target-like tokens → higher score" ordering the resample consumes
    * while staying bit-exact. No stage is corpus×corpus: one explode,
    * one (doc,bucket) aggregation, one |buckets|-row aggregation, one
    * broadcast join — the 100 TB shape.
    *
    * Documents with no tokens have no feature mass and are absent from
    * the output (they carry no evidence either way; a selection that
    * wants them applies its length filter first, as X67 does).
    *
    * Output: one row per document with token count and score. */
  def dsirScore(docs: DataFrame, idCol: String, textCol: String,
                isTarget: Column, buckets: Int = 64,
                scale: Long = 1000000L): DataFrame = {
    require(buckets > 0 && scale > 0, s"positive buckets/scale: $buckets/$scale")
    val tok = docs
      .select(col(idCol), isTarget.cast("boolean").as("__target"),
        explode(TextOps.tokens(col(textCol))).as("__tok"))
      .where(length(col("__tok")) > 0)
      .select(col(idCol), col("__target"),
        hashBucket(col("__tok"), buckets).as("bucket"))
    // one shuffle keyed (doc, bucket); the target flag is functionally
    // dependent on the doc id, so carrying it in the key adds no groups
    val perDocBucket = tok
      .groupBy(col(idCol), col("__target"), col("bucket"))
      .agg(count(lit(1)).as("n"))
    // |buckets|-row weight table: add-one smoothed target/corpus counts.
    // The weight numerator is computed in DECIMAL(38,0) unconditionally:
    // plain Long `p * scale` silently wraps (non-ANSI) once the target
    // slice passes ~9.2e12 tokens, and the table is |buckets| rows so the
    // decimal costs nothing. `div` on decimals is still the exact
    // integral divide, returned as the same BIGINT the score sum expects.
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val weights = perDocBucket.groupBy("bucket")
      .agg((sum(when(col("__target"), col("n")).otherwise(0L)) + 1L)
          .cast(dec).as("p"),
        (sum(col("n")) + 1L).cast(dec).as("q"))
      .select(col("bucket"),
        expr(s"(p * ${scale}L) div q").cast("long").as("w"))
    perDocBucket.join(broadcast(weights), "bucket")
      .groupBy(col(idCol))
      .agg(sum(col("n")).as("n_tokens"),
        sum(col("n") * col("w")).as("dsir_score"))
  }

  /** X116 — temporal split with an EMBARGO gap (the purged time-based
    * split of financial ML, Lopez de Prado 2018 ch.7): train = rows
    * before the boundary, test = rows at/after boundary + embargo, and
    * the rows INSIDE the gap are assigned to neither — they are exactly
    * the rows whose label/feature windows straddle the boundary, the
    * channel through which a naive `ts < b` split leaks future
    * information into training. The third classic split family next to
    * the hash split (X23, `splitAssign`) and the dup-component split
    * (X105): time is the grouping key the other two cannot express. By
    * construction every entity's last train row and first test row are
    * separated by MORE than the embargo (the gap rows between them were
    * dropped) — that separation is the guarantee the gap buys.
    *
    * The artifact carries a per-row audit: `gap_straddler` marks rows
    * whose ENTITY has train rows AND test rows AND activity inside the
    * discarded gap — the entities whose trajectories cross the boundary
    * mid-flight. Their gap rows are out of both sides, but any
    * TRAILING-WINDOW feature computed at their first test rows still
    * reaches back across the gap into train time; the auditor widens the
    * embargo, drops those entities from test, or shortens the feature
    * window — the decision needs exactly this flag.
    *
    * Determinism: pure timestamp comparisons against literal bounds plus
    * one per-entity boolean aggregation — no randomness, no floats.
    * Scale shape: the split itself is MAP-ONLY (a per-row comparison,
    * pushdown-friendly); the audit is one entity-keyed aggregation
    * joined back by entity — the only exchange. */
  def temporalSplit(df: DataFrame, idCol: String, entityCol: String,
                    tsCol: String, boundary: String,
                    embargoSeconds: Long): DataFrame = {
    val b = to_timestamp(lit(boundary))
    val e = b + expr(s"INTERVAL $embargoSeconds SECOND")
    val split = when(col(tsCol) < b, "train")
      .when(col(tsCol) >= e, "test")
      .otherwise("embargo")
    val rows = df.select(col(idCol).as("id"),
      col(entityCol).as("entity"), split.as("split"))
    val audit = rows.groupBy("entity")
      .agg((max(when(col("split") === "train", 1).otherwise(0)) === 1 &&
        max(when(col("split") === "test", 1).otherwise(0)) === 1 &&
        max(when(col("split") === "embargo", 1).otherwise(0)) === 1)
        .as("gap_straddler"))
    rows.join(audit, Seq("entity"))
      .select(col("id"), col("entity"), col("split"), col("gap_straddler"))
  }
}
