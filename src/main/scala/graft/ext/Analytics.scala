package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** General analytics operators beyond the reference's surface (SURVEY §2.9):
  * as-of join, banded range join, rollup, running totals, pivot, exact
  * quantiles, intersect. The reference delegates all query-time analytics to
  * CitusDB (README.md:42-46 — it only ships the stats that make them fast);
  * these are the operators a warehouse user of that stack would run, each
  * expressed as a single declarative Catalyst plan.
  */
object Analytics {

  /** Backward as-of join: for each left row, the latest right row of the
    * same `key` with right.`ep` <= left.`ep` (LEFT semantics — unmatched
    * left rows keep null right values).
    *
    * Implementation is the scalable union-scan formulation: tag both
    * inputs, sort within each key by (ep, side), and carry the most recent
    * right payload forward with `last(ignoreNulls)` over a running-rows
    * window. ONE shuffle on `key`, no per-row range probe and no
    * candidate-pair explosion — at 100 TB this is a plain repartition +
    * sorted scan, in contrast to an interval-join expansion whose output
    * is quadratic in ts collisions.
    *
    * Preconditions: `right` is unique per (key, ep) (pre-aggregate when
    * needed); `tie` is a left column making (key, ep, tie) unique so the
    * window order is total. The right payload travels as one struct so a
    * legitimately-null right value cannot be mixed with a different row's
    * ep by per-column `last`.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String, ep: String,
               tie: String, rightVals: Seq[String]): DataFrame = {
    val lPay = left.columns.toSeq.filterNot(c => c == key || c == ep)
    val l2 = left.select(
      Seq(col(key), col(ep), lit(1).as("is_left")) ++ lPay.map(col) ++
        rightVals.map(v => lit(null).cast(right.schema(v).dataType).as(v)): _*)
    val r2 = right.select(
      Seq(col(key), col(ep), lit(0).as("is_left")) ++
        lPay.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightVals.map(col): _*)
    // Rights sort before lefts at equal ep => "<=" match semantics.
    val w = Window.partitionBy(col(key))
      .orderBy(col(ep), col("is_left"), col(tie))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val asof = last(
      when(col("is_left") === 0,
        struct(col(ep).as("r_ep") +: rightVals.map(col): _*)),
      ignoreNulls = true).over(w)
    l2.unionByName(r2)
      .withColumn("asof", asof)
      .where(col("is_left") === 1)
      .select(Seq(col(key), col(ep)) ++ lPay.map(col) ++
        Seq(col("asof.r_ep").as("r_ep")) ++
        rightVals.map(v => col(s"asof.$v").as(v)): _*)
  }

  /** Banded range join: classify rows into [lo, hi] bands and aggregate
    * per band. The band table is tiny by construction, so it broadcasts —
    * a BroadcastNestedLoopJoin over a handful of rows, never a shuffle of
    * the fact side. (For a large-×-large interval join the play is binning
    * both sides to equi-join keys first; bands ARE the bins here.)
    */
  def bandJoin(df: DataFrame, valueCol: String, sumCol: String,
               bands: Seq[(String, Int, Int)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val b = spark.createDataset(bands).toDF("band", "lo", "hi")
    df.join(broadcast(b), col(valueCol) >= col("lo") && col(valueCol) <= col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col(sumCol).cast(DecimalType(38, 6))).cast(DoubleType).as("sum_value"))
  }

  /** Rollup over two keys (grouping-sets family). Subtotal rows surface
    * with the sentinel instead of null so the output order is total and
    * engine-portable. Catalyst expands the rollup before aggregation, so
    * partial aggregation (map-side combine) still applies per grouping set.
    */
  def rollup2(df: DataFrame, k1: String, k2: String, sumCol: String,
              sentinel: String = "ALL"): DataFrame =
    df.rollup(col(k1), col(k2))
      .agg(count(lit(1)).as("n_rows"),
        sum(col(sumCol).cast(DecimalType(38, 6))).cast(DoubleType).as("sum_value"))
      .select(coalesce(col(k1), lit(sentinel)).as(k1),
        coalesce(col(k2), lit(sentinel)).as(k2),
        col("n_rows"), col("sum_value"))

  /** CUBE over two keys — all four grouping sets in one pass (Spark plans
    * a single Expand + one aggregation; no union of four scans). Same
    * sentinel convention as rollup2.
    */
  def cube2(df: DataFrame, k1: String, k2: String, sumCol: String,
            sentinel: String = "ALL"): DataFrame =
    df.cube(col(k1), col(k2))
      .agg(count(lit(1)).as("n_rows"),
        sum(col(sumCol).cast(DecimalType(38, 6))).cast(DoubleType).as("sum_value"))
      .select(coalesce(col(k1), lit(sentinel)).as(k1),
        coalesce(col(k2), lit(sentinel)).as(k2),
        col("n_rows"), col("sum_value"))

  /** Running total per key in (ep, tie) order. The sum runs over
    * DECIMAL(38,6): a double prefix-sum would accumulate representation
    * error order-dependently; decimal is exact, so every prefix is
    * deterministic. One shuffle (partition by key), one sorted pass.
    */
  def runningTotal(df: DataFrame, key: String, ep: String, tie: String,
                   valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ep), col(tie))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(key), col(ep), col(tie), col(valueCol))
      .withColumn("running_value",
        round(sum(col(valueCol).cast(DecimalType(38, 6))).over(w)
          .cast(DoubleType), 6))
      .drop(valueCol)
  }

  /** Pivot a categorical column into per-value count columns. The pivot
    * values are EXPLICIT: without them Spark runs an extra distinct job to
    * discover them and the output schema becomes data-dependent — both
    * wrong at scale. Missing cells are 0, not null.
    */
  def pivotCounts(df: DataFrame, key: String, pivotCol: String,
                  values: Seq[String]): DataFrame = {
    val p = df.groupBy(col(key)).pivot(pivotCol, values).agg(count(lit(1)))
    values.foldLeft(p)((acc, v) =>
      acc.withColumn(s"n_$v", coalesce(col(v), lit(0L))).drop(v))
  }

  /** Exact interpolated quantiles per group (same linear-interpolation
    * definition as SQL percentile_cont). Exact sorts per group — right at
    * fixture scale and for medium-cardinality groups; at 100 TB switch the
    * same call site to approx_percentile (t-digest, mergeable partials).
    */
  def quantiles(df: DataFrame, key: String, valueCol: String,
                ps: Seq[Double], names: Seq[String]): DataFrame = {
    val arr = ps.map(p => lit(p))
    val q = df.groupBy(col(key))
      .agg(percentile(col(valueCol), array(arr: _*)).as("qs"))
    names.zipWithIndex.foldLeft(q)((acc, ni) =>
      acc.withColumn(ni._1, round(col("qs").getItem(ni._2), 6)))
      .drop("qs")
  }

  /** Percentile winsorization — outlier clamping, the feature-cleaning
    * sibling of [[quantiles]]: every value is clamped into the corpus's
    * [lo, hi] percentile band before aggregation, so a handful of extreme
    * rows can't dominate a mean/sum (the standard robustifier for
    * quality scores, account balances, token counts ahead of training-
    * mixture math). Emits per-group count + DECIMAL-exact sum + min/max
    * of the clamped value, rounded to 6dp for engine parity.
    *
    * Scale: ONE percentile aggregation over the corpus (exact
    * `percentile` here; swap to approx_percentile at 100 TB — the
    * operator shape is identical), broadcast back as a 1-row frame, then
    * a map-side clamp feeding the group aggregation — two passes, no
    * corpus-sized shuffle beyond the final group-by.
    */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
                lo: Double, hi: Double): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, s"need 0 <= lo < hi <= 1")
    val bounds = df.agg(
      percentile(col(valueCol), lit(lo)).as("__plo"),
      percentile(col(valueCol), lit(hi)).as("__phi"))
    df.crossJoin(broadcast(bounds))
      .withColumn("__w",
        least(greatest(col(valueCol), col("__plo")), col("__phi")))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        round(sum(col("__w").cast(DecimalType(38, 6))).cast(DoubleType), 6)
          .as("sum_w"),
        round(min(col("__w")), 6).as("min_w"),
        round(max(col("__w")), 6).as("max_w"))
  }

  /** X79 — per-group percentile rank: each row's integer rank under the
    * total (value asc, md5(id) asc, id asc) order within its group plus
    * the group size — the cross-group score normalizer (quality scores
    * are not comparable across languages; rank them within language,
    * then cut globally on rnk/n). The ratio is left to the consumer:
    * (rnk, n) are exact integers, so two engines can never disagree at a
    * float ulp, and either convention ((rnk−1)/(n−1) or rnk/n) replays.
    *
    * NULL group/value/id rows are dropped on BOTH engines before the
    * rank (Spark sorts NULLS FIRST ascending, DuckDB NULLS LAST — a
    * null key would desync every rank after it).
    *
    * Scale: rides the grouped two-phase md5 rank
    * ([[graft.ext.Sampling.rankByValueGrouped]]) — NO window is ever
    * partitioned by the bare group column, so a corpus-sized single
    * group (one dominant language) fans out over (value × 256 md5
    * buckets) partitions instead of serializing through one reducer.
    * The within-value tiebreak is therefore the md5 order — defined,
    * engine-replayable, and what makes the bucket a prefix of the sort.
    */
  def percentileRank(df: DataFrame, groupCol: String, valueCol: String,
                     idCol: String): DataFrame =
    graft.ext.Sampling.rankByValueGrouped(
      df.where(col(groupCol).isNotNull && col(valueCol).isNotNull &&
          col(idCol).isNotNull)
        .select(col(idCol).as("id"), col(groupCol).as("grp"),
          col(valueCol).as("v")),
      "grp", "v", "id")
      .select(col("id"), col("grp"), col("v"), col("rnk"), col("n"))

  /** INTERSECT (distinct) of two key sets — the complement of the diff
    * engine's EXCEPT algebra (SURVEY §2.5 O2). Spark plans it as an
    * aggregate + semi join; both sides dedup map-side first.
    */
  def intersectKeys(a: DataFrame, b: DataFrame): DataFrame = a.intersect(b)

  /** Equi-DEPTH histogram — nBuckets buckets of (near-)equal ROW COUNT
    * with exact value boundaries, the complement of [[histogram]]'s
    * equi-width bins (equi-width starves under skew; equi-depth is what
    * an optimizer or a curriculum scheduler actually wants). Built on
    * the X47 two-phase distributed rank ([[graft.ext.Sampling.rankByValue]]
    * — no single-reducer window, skew-proof within duplicate values), so
    * the bucket of a row is pure integer math `(rnk−1)·nBuckets div N` —
    * the bucket populations differ by at most 1 BY CONSTRUCTION, and two
    * engines can never disagree at a boundary.
    *
    * Output: (bucket, n_rows, lo, hi) per non-empty bucket. NULL
    * values/keys are excluded (the rank operator's contract — also what
    * a NULLS-FIRST vs NULLS-LAST engine pair needs to agree).
    */
  def equiDepth(df: DataFrame, valueCol: String, keyCol: String,
                nBuckets: Int): DataFrame = {
    require(nBuckets > 0, s"nBuckets=$nBuckets must be positive")
    val ranked = graft.ext.Sampling.rankByValue(df, valueCol, keyCol)
    val total = ranked.agg(count(lit(1)).as("__t"))
    ranked.crossJoin(broadcast(total))
      .select(col(valueCol),
        expr(s"((rnk - 1) * $nBuckets) div __t").as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        min(col(valueCol)).as("lo"), max(col(valueCol)).as("hi"))
  }

  /** Join cardinality / skew diagnostic — the pre-flight check a 100 TB
    * join deserves BEFORE running it: per-side distinct key counts and
    * max key multiplicity, common-key count, the EXACT inner-join output
    * size Σₖ nₐ(k)·n_b(k) (computable from the two per-key count frames
    * without materializing the join), and the single heaviest key with
    * its contribution. `join_rows >> max(rows_a, rows_b)` says "this
    * join explodes"; `top_rows` close to `join_rows` says "one key is
    * the explosion — salt it" (feeding [[graft.ext]]'s salted join).
    *
    * Scale shape: two per-key count aggregations (map-side partials),
    * one count-frame join on the key, then single-row rollups crossed
    * together — the full input is never joined, only its key histogram.
    * Products run in DECIMAL(38,0) so a pathological key pair cannot
    * overflow.
    */
  def joinCardinality(a: DataFrame, b: DataFrame, keyA: String,
                      keyB: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val ca = a.where(col(keyA).isNotNull)
      .groupBy(col(keyA).as("k")).agg(count(lit(1)).as("na"))
    val cb = b.where(col(keyB).isNotNull)
      .groupBy(col(keyB).as("k")).agg(count(lit(1)).as("nb"))
    val j = ca.join(cb, "k")
      .select(col("k"), (col("na").cast(dec) * col("nb")).as("prod"))
    val sa = ca.agg(count(lit(1)).as("n_keys_a"), max(col("na")).as("max_mult_a"))
    val sb = cb.agg(count(lit(1)).as("n_keys_b"), max(col("nb")).as("max_mult_b"))
    val sj = j.agg(count(lit(1)).as("n_common"),
      coalesce(sum(col("prod")), lit(0).cast(dec)).cast(dec).as("join_rows"))
    val top = j.orderBy(col("prod").desc, col("k").asc).limit(1)
      .select(col("k").cast(StringType).as("top_key"),
        col("prod").as("top_rows"))
    // left join (not crossJoin) against `top`: disjoint key sets must
    // still report a row — (n_common=0, join_rows=0, top_key=null)
    sa.crossJoin(sb).crossJoin(sj).join(top, lit(true), "left")
  }

  /** Column profiler — the one-pass data-quality summary every ingestion
    * pipeline runs before training: per named column, row count, non-null
    * count, EXACT distinct count, and min/max rendered to strings with a
    * per-type rule chosen so two engines format identically (integrals
    * verbatim; fractionals via DECIMAL(38,6) — canonical fixed-point, no
    * exponent notation; timestamps as epoch-microsecond integers; strings
    * pass through).
    *
    * Scale shape: TWO aggregate jobs, deliberately split by BUFFER TYPE.
    * The count/exact-distinct aggregates (all fixed-size long buffers)
    * plan as the single-Expand + two-phase HashAggregate multi-distinct
    * plan — map-side partials collapse each expanded stream before the
    * one shuffle. The min/max aggregates go in a SEPARATE ungrouped pass:
    * string/timestamp buffers are var-length, and putting them in the
    * same Aggregate as the distincts demotes the whole Expand to
    * Sort+SortAggregate — measured 5.8 s of a 6.8 s query at sf0.1; the
    * split removes the sort entirely (~1.9 s total). At 100 TB the k×
    * map-side expansion is the cost of exactness; swap `countDistinct`
    * for `approx_count_distinct` when ±2% HLL estimates suffice (the X7
    * pattern). The struct-explode at the end runs on a SINGLE driver-side
    * row — presentation only, no distributed work.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    def render(c: Column, dt: DataType): Column = dt match {
      case ByteType | ShortType | IntegerType | LongType => c.cast(StringType)
      case FloatType | DoubleType | _: DecimalType =>
        c.cast(DecimalType(38, 6)).cast(StringType)
      case TimestampType => unix_micros(c).cast(StringType)
      case TimestampNTZType =>
        // session tz is pinned UTC in every entry point → value-identical
        unix_micros(c.cast(TimestampType)).cast(StringType)
      case _ => c.cast(StringType)
    }
    cols.foreach(name => if (!types.contains(name))
      throw new IllegalArgumentException(s"no column '$name'"))
    val countAggs: Seq[Column] = count(lit(1)).as("__n") +: cols.flatMap { name =>
      Seq(count(col(name)).as(s"__nn_$name"),
        countDistinct(col(name)).as(s"__nd_$name"))
    }
    val mmAggs: Seq[Column] = cols.flatMap { name =>
      Seq(render(min(col(name)), types(name)).as(s"__mn_$name"),
        render(max(col(name)), types(name)).as(s"__mx_$name"))
    }
    val one = df.agg(countAggs.head, countAggs.tail: _*)
      .crossJoin(df.agg(mmAggs.head, mmAggs.tail: _*))
    val rows = cols.map { name =>
      struct(lit(name).as("col_name"), col("__n").as("n_rows"),
        col(s"__nn_$name").as("n_nonnull"),
        col(s"__nd_$name").as("n_distinct"),
        col(s"__mn_$name").as("min_v"), col(s"__mx_$name").as("max_v"))
    }
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
  }

  /** Ordered conversion funnel: for each user, the earliest time each step
    * was reached, where step i counts only STRICTLY AFTER step i−1's first
    * completion (the product-analytics funnel, not mere set membership).
    * One per-step (filter → per-user min → join) stage — k−1 small
    * aggregations joined on the user key, never a per-user event sort on
    * the driver; every stage shuffles on user_id only. Timestamps emit as
    * epoch µs (integer — portable across engines).
    * Returns (user_id, t_1…t_k nullable, n_steps).
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty)
    val ep = (c: Column) => unix_micros(c)
    val ofType = (t: String) => events.where(col(typeCol) === t)
      .select(col(userCol).as("user_id"), ep(col(tsCol)).as("__ep"))
    var acc = events.select(col(userCol).as("user_id")).distinct()
      .join(ofType(steps.head).groupBy("user_id").agg(min(col("__ep")).as("t_1")),
        Seq("user_id"), "left")
    for ((st, i) <- steps.tail.zipWithIndex) {
      val prev = s"t_${i + 1}"
      val cur = s"t_${i + 2}"
      acc = acc.join(
        acc.select(col("user_id"), col(prev))
          .join(ofType(st), Seq("user_id"))
          .where(col("__ep") > col(prev))
          .groupBy("user_id").agg(min(col("__ep")).as(cur)),
        Seq("user_id"), "left")
    }
    acc.withColumn("n_steps",
      steps.indices.map(i => when(col(s"t_${i + 1}").isNotNull, 1L).otherwise(0L))
        .reduce(_ + _))
  }

  /** Cohort retention: users grouped by the integer epoch-week of their
    * FIRST event (calendar-free — floor(epoch_µs / week_µs), so no
    * engine-specific week-start semantics can diverge), counted as active
    * in each later week they appear. Two shuffles: per-user first-event,
    * then the (cohort, offset) count-distinct. Returns
    * (cohort_week, week_offset, n_users).
    */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val weekUs = 7L * 86400L * 1000000L
    val wk = (c: Column) => floor(unix_micros(c) / weekUs)
    val first = events.groupBy(col(userCol).as("user_id"))
      .agg(min(wk(col(tsCol))).as("cohort_week"))
    events.select(col(userCol).as("user_id"), wk(col(tsCol)).as("__w"))
      .distinct()
      .join(first, Seq("user_id"))
      .groupBy(col("cohort_week"), (col("__w") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Fixed-bin histogram of a numeric column: bin i covers
    * [lo + i·width, lo + (i+1)·width), values clamped into [0, nBins).
    * Pure integer bin arithmetic (floor of a literal division) — the
    * map-side collapses to ≤ nBins rows per partition before the one
    * tiny shuffle. Returns (bin, lo_edge, n, min_value, max_value).
    */
  def histogram(df: DataFrame, valueCol: String, lo: Double, width: Double,
                nBins: Int): DataFrame = {
    require(width > 0 && nBins > 0)
    val bin = least(greatest(floor((col(valueCol) - lo) / width), lit(0L)),
      lit(nBins - 1L))
    df.groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"),
        round(min(col(valueCol)), 6).as("min_value"),
        round(max(col(valueCol)), 6).as("max_value"))
      .select(col("bin"), round(lit(lo) + col("bin") * width, 6).as("lo_edge"),
        col("n"), col("min_value"), col("max_value"))
  }

  /** X82 — per-group robust center/spread: exact MEDIAN and MEDIAN
    * ABSOLUTE DEVIATION by order statistics only. Outlier-immune where
    * mean/stddev are not — the robust basis for per-language length or
    * loss gating (cut at med ± c·mad instead of μ ± c·σ, which one 2 GB
    * pathological doc drags arbitrarily).
    *
    * Determinism: the engine picks the two middle ORDER STATISTICS
    * (rnk = (n+1) div 2 and n div 2 + 1) — selected values, never sums
    * of many floats — and the only arithmetic is a single IEEE add/halve
    * (`(lo+hi)/2`) and one `abs(v − med)` per row, each a deterministic
    * individual operation any engine reproduces bit-exactly. Median
    * values are tiebreak-independent by definition, so the oracle can
    * rank with any within-value order.
    *
    * Scale: both ranking passes ride [[graft.ext.Sampling.rankByValueGrouped]]
    * — no window partitioned by the bare group, so a corpus-sized group
    * fans out over (value × 256 md5-bucket) partitions. The deviation
    * pass inherits the value column's discreteness (deviations live on
    * the half-grid of v), keeping the two-phase rank's count frame
    * bounded — same quantization contract as the rank itself.
    */
  def madByGroup(df: DataFrame, groupCol: String, valueCol: String,
                 idCol: String): DataFrame = {
    def middles(ranked: DataFrame, vCol: String) = ranked
      .groupBy(col("grp"))
      .agg(max(col("n")).as("n"),
        max(when(col("rnk") === expr("(n + 1) div 2"), col(vCol))).as("lo"),
        max(when(col("rnk") === expr("n div 2 + 1"), col(vCol))).as("hi"))
    val in = df.where(col(groupCol).isNotNull && col(valueCol).isNotNull &&
        col(idCol).isNotNull)
      .select(col(groupCol).as("grp"), col(valueCol).cast("double").as("v"),
        col(idCol).as("id"))
    val med = middles(
        graft.ext.Sampling.rankByValueGrouped(in, "grp", "v", "id"), "v")
      .select(col("grp"), col("n"), col("lo").as("med_lo"),
        col("hi").as("med_hi"),
        ((col("lo") + col("hi")) / 2).as("med"))
    val dev = in.join(med.select(col("grp"), col("med")), "grp")
      .select(col("grp"), abs(col("v") - col("med")).as("dv"), col("id"))
    val mad = middles(
        graft.ext.Sampling.rankByValueGrouped(dev, "grp", "dv", "id"), "dv")
      .select(col("grp"), col("lo").as("mad_lo"), col("hi").as("mad_hi"),
        ((col("lo") + col("hi")) / 2).as("mad"))
    med.join(mad, "grp")
      .select(col("grp"), col("n").cast(LongType).as("n"),
        col("med_lo"), col("med_hi"), col("med"),
        col("mad_lo"), col("mad_hi"), col("mad"))
  }

  /** X83 — key-skew diagnostic with an exact GINI COEFFICIENT over
    * per-key row counts: gini = gini_num / gini_den with
    * gini_num = Σᵢ (2·rankᵢ − n − 1)·xᵢ (counts ranked ascending) and
    * gini_den = n·Σxᵢ — both INTEGER outputs (the no-ulp policy; the
    * division is the consumer's). 0 = uniform keys, →1 = one key holds
    * everything. Plus max and p99 count — together the pre-shuffle skew
    * report for a 100 TB groupBy/join: gini says "how salted does this
    * key need to be", p99/max say "how big is the hot partition".
    *
    * Tie-safety: swapping the ranks of equal counts leaves the Gini sum
    * unchanged, and the p99/max picks are values, so no tiebreak leaks
    * into the output. Scale: one map-side count aggregation collapses
    * the input to |keys| rows; ranking those rides the X47 two-phase
    * rank (no single-reducer window); the output is ONE row.
    * Integer bound: gini_num < n_keys·total_rows — overflow-safe while
    * that product stays under 2⁶³ (pre-aggregate coarser keys beyond).
    */
  def skewGini(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.where(col(keyCol).isNotNull)
      .groupBy(col(keyCol).as("__k")).agg(count(lit(1)).as("cnt"))
    val ranked = graft.ext.Sampling.rankByValue(counts, "cnt", "__k")
    ranked.agg(
        count(lit(1)).as("__n"), sum(col("cnt")).as("__t"),
        sum((lit(2) * col("rnk")) * col("cnt")).as("__s2"))
      .crossJoin(broadcast(ranked.agg(max(col("cnt")).as("max_cnt"))))
      .join(ranked.select(col("cnt").as("p99_cnt"), col("rnk").as("__r")),
        col("__r") === expr("(99 * __n + 99) div 100"), "left")
      .select(col("__n").cast(LongType).as("n_keys"),
        col("__t").cast(LongType).as("total_rows"),
        (col("__s2") - (col("__n") + 1) * col("__t"))
          .cast(LongType).as("gini_num"),
        (col("__n") * col("__t")).cast(LongType).as("gini_den"),
        col("max_cnt").cast(LongType).as("max_cnt"),
        col("p99_cnt").cast(LongType).as("p99_cnt"))
  }

  /** X93 — market-basket pair mining: co-occurrence counts of item pairs
    * within a basket (order, session, document), support-filtered and
    * top-k'd — the A-priori 2-itemset pass behind recommendations and
    * "frequently bought together".
    *
    * Shape: distinct (basket, item), then a SELF-JOIN ON THE BASKET KEY
    * with `item_a < item_b` — pairs materialize co-partitioned by basket,
    * so the expansion is Σ k_b·(k_b−1)/2 bounded by basket width, never
    * corpus². Wide baskets are the documented hazard: cap or salt
    * baskets above ~10³ items before calling (the same guard as LSH
    * band fan-out). The pair aggregation shuffles pair-keyed; top-k
    * plans TakeOrderedAndProject with a full (count desc, pair asc)
    * tiebreak, so the cut is deterministic.
    */
  def basketPairs(df: DataFrame, basketCol: String, itemCol: String,
                  minSupport: Long = 2, topK: Int = 50): DataFrame = {
    val items = df.where(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("b"), col(itemCol).as("i")).distinct()
    items.as("l").join(items.as("r"),
        col("l.b") === col("r.b") && col("l.i") < col("r.i"))
      .groupBy(col("l.i").as("item_a"), col("r.i").as("item_b"))
      .agg(count(lit(1)).as("n_baskets"))
      .where(col("n_baskets") >= minSupport)
      .orderBy(col("n_baskets").desc, col("item_a").asc, col("item_b").asc)
      .limit(topK)
  }

  /** X93b — association rules over the X93 pairs: confidence
    * P(b|a) = n_ab/n_a and lift = N·n_ab/(n_a·n_b) for each
    * support-filtered pair — the "bought X, recommend Y" scoring pass.
    * Counts are exact integers; confidence and lift are single pinned
    * IEEE divisions (X91 discipline) and the top-k ranks on the ROUNDED
    * lift with the pair as tiebreak, so a 1-ulp drift can never reorder
    * the cut. Basket total N and per-item basket counts broadcast.
    */
  def assocRules(df: DataFrame, basketCol: String, itemCol: String,
                 minSupport: Long = 2, topK: Int = 50): DataFrame = {
    val items = df.where(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("b"), col(itemCol).as("i")).distinct()
    val pairs = items.as("l").join(items.as("r"),
        col("l.b") === col("r.b") && col("l.i") < col("r.i"))
      .groupBy(col("l.i").as("item_a"), col("r.i").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minSupport)
    val itemN = items.groupBy(col("i")).agg(count(lit(1)).as("ni"))
    val total = items.select(col("b")).distinct().agg(count(lit(1)).as("nb"))
    val d = (c: String) => col(c).cast(DoubleType)
    pairs
      .join(broadcast(itemN.select(col("i").as("item_a"), col("ni").as("n_a"))),
        "item_a")
      .join(broadcast(itemN.select(col("i").as("item_b"), col("ni").as("n_b"))),
        "item_b")
      .crossJoin(broadcast(total))
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"), col("n_b"),
        round(d("n_ab") / d("n_a"), 6).as("conf"),
        round(d("nb") * d("n_ab") / (d("n_a") * d("n_b")), 6).as("lift"))
      .orderBy(col("lift").desc, col("item_a").asc, col("item_b").asc)
      .limit(topK)
  }

  /** X95 — event-type transition matrix: per user-ordered consecutive
    * event pairs, the count n(prev→next) and the row-normalized
    * transition probability — the first-order Markov chain of user
    * behavior (journey maps, anomaly priors, next-event prediction
    * baselines). One key-partitioned lag window (ties broken by an
    * explicit column), one pair-keyed count, row totals joined back from
    * a |types|-sized broadcast; probability is a single pinned IEEE
    * division rounded to 6 dp.
    */
  def eventTransitions(events: DataFrame, userCol: String, tsCol: String,
                       typeCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy("u").orderBy(col("ep"), col("tie"))
    val pairs = events.select(col(userCol).as("u"),
        unix_micros(col(tsCol)).as("ep"), col(typeCol).as("next_type"),
        col(tieCol).as("tie"))
      .withColumn("prev_type", lag(col("next_type"), 1).over(w))
      .where(col("prev_type").isNotNull)
      .groupBy("prev_type", "next_type").agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy("prev_type").agg(sum(col("n")).as("n_prev"))
    pairs.join(broadcast(totals), "prev_type")
      .select(col("prev_type"), col("next_type"), col("n"),
        col("n_prev").cast(LongType).as("n_prev"),
        round(col("n").cast(DoubleType) / col("n_prev").cast(DoubleType), 6)
          .as("p"))
  }

  /** X91 — per-group simple linear regression + Pearson correlation from
    * EXACT integer moments: y = slope·x + intercept fitted by least
    * squares, r the correlation — trend lines, drift monitors, metric
    * correlation matrices. Inputs must be INTEGRAL columns (pre-scale
    * fractional data to fixed-point units, like topPMassCut's weight
    * contract): the six moments (n, Σx, Σy, Σxy, Σx², Σy²) then
    * accumulate EXACTLY as DECIMAL(38,0) sums of DECIMAL(19,0)×
    * DECIMAL(19,0) products (width-stable — no 38-digit-rule overflow),
    * so they are order-independent under any partitioning. The finish is
    * a fixed sequence of correctly-rounded IEEE double ops on those
    * exact moments — both engines hold bit-identical doubles before the
    * 6-dp round (the X48 z-score discipline). Degenerate groups (all x
    * equal, or zero y variance for r) yield 0.0 by explicit guard.
    *
    * One map-side-partial aggregation; output is |groups| rows.
    */
  def linReg(df: DataFrame, groupCol: String, xCol: String,
             yCol: String): DataFrame = {
    val d19 = DecimalType(19, 0)
    val x = col(xCol).cast(d19)
    val y = col(yCol).cast(d19)
    val m = df.where(col(groupCol).isNotNull)
      .groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum(x * y).as("sxy"), sum(x * x).as("sxx"), sum(y * y).as("syy"))
    val d = (c: String) => col(c).cast(DoubleType)
    val covN = d("n") * d("sxy") - d("sx") * d("sy")
    val varX = d("n") * d("sxx") - d("sx") * d("sx")
    val varY = d("n") * d("syy") - d("sy") * d("sy")
    m.select(col("grp"), col("n"),
        when(varX === 0.0, 0.0).otherwise(round(covN / varX, 6)).as("slope"),
        when(varX === 0.0, 0.0).otherwise(
          round((d("sy") - (covN / varX) * d("sx")) / d("n"), 6)).as("intercept"),
        when(varX === 0.0 || varY === 0.0, 0.0).otherwise(
          round(covN / (sqrt(varX) * sqrt(varY)), 6)).as("r"))
  }

  /** X88 — k-anonymity / l-diversity audit: per quasi-identifier
    * combination, the group size (k-anonymity: every group must reach k
    * members or its members are re-identifiable) and the count of
    * distinct sensitive values (l-diversity: a group whose members all
    * share one sensitive value leaks it even at size ≥ k). The standard
    * pre-release privacy gate over a training/analytics export.
    *
    * One hash aggregation keyed by the quasi columns; the distinct
    * count is the usual two-phase (quasi, sensitive)-keyed expansion —
    * both map-side-partial shapes, output |QI combinations| rows
    * regardless of input size.
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String, k: Int = 5, l: Int = 2): DataFrame =
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("k_risk", (col("n") < k).cast("int").cast(LongType))
      .withColumn("l_risk", (col("n_sensitive") < l).cast("int").cast(LongType))

  /** X99 — t-closeness audit: per quasi-identifier group, the total
    * variation distance between the group's sensitive-value distribution
    * and the global one — the third rung of the release-privacy ladder
    * (k-anonymity bounds group SIZE, l-diversity bounds value COUNT,
    * t-closeness bounds what the group's value MIX itself reveals; TVD is
    * the standard instantiation for categorical sensitive attributes).
    *
    * All mass terms are exact integers over the common denominator
    * n_g·N: TVD = Σ_v |n_gv·N − n_v·n_g| / (2·n_g·N), with the absent
    * values' share folded in CLOSED FORM (Σ_{v∉g} n_v·n_g = N·n_g −
    * Σ_{v∈g} n_v·n_g) so nothing ever expands the groups × values cross
    * product. Products are width-stable DECIMAL(19,0)×DECIMAL(19,0),
    * sums DECIMAL(38,0) (order-independent), and the single float op is
    * one pinned rounded division — the X91 discipline.
    *
    * Scale shape: one (quasi, value)-keyed count aggregation (map-side
    * partials) collapses the input; everything after runs on that count
    * frame — two small rollups broadcast back, one more |counts|-sized
    * aggregation. Output |QI groups| rows.
    */
  def tCloseness(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String, t: Double = 0.2): DataFrame = {
    val d19 = DecimalType(19, 0)
    val prod = (a: Column, b: Column) => a.cast(d19) * b.cast(d19)
    val qs = quasiCols.map(col)
    val cnt = df
      .where(col(sensitiveCol).isNotNull &&
        quasiCols.map(col(_).isNotNull).reduce(_ && _))
      .groupBy(qs :+ col(sensitiveCol).as("__v"): _*)
      .agg(count(lit(1)).as("__ngv"))
    val grpTot = cnt.groupBy(qs: _*)
      .agg(sum(col("__ngv")).cast(LongType).as("__ng"))
    val valTot = cnt.groupBy(col("__v"))
      .agg(sum(col("__ngv")).cast(LongType).as("__nv"))
    val tot = cnt.agg(sum(col("__ngv")).cast(LongType).as("__N"))
    cnt
      .join(broadcast(valTot), Seq("__v"))
      .join(broadcast(grpTot), quasiCols)
      .crossJoin(broadcast(tot))
      .groupBy(qs: _*)
      .agg(
        sum(abs(prod(col("__ngv"), col("__N")) -
          prod(col("__nv"), col("__ng")))).as("__present"),
        sum(prod(col("__nv"), col("__ng"))).as("__covered"),
        first(col("__ng")).as("__g"), first(col("__N")).as("__t"))
      .select(qs ++ Seq(
        col("__g").as("n"),
        round((col("__present") + (prod(col("__g"), col("__t")) -
            col("__covered"))).cast(DoubleType) /
          (prod(col("__g"), col("__t")).cast(DoubleType) * 2), 6).as("tvd")): _*)
      .withColumn("t_risk", (col("tvd") > t).cast("int").cast(LongType))
  }

  /** X89a — per-key aggregate state: (n, DECIMAL(38,6) sum) per key, the
    * mergeable partial an incremental pipeline persists between batches.
    * The value goes through double → DECIMAL (shortest-repr rounding,
    * the [[graft.ext.Similarity.classCentroids]] policy) so state sums
    * are order-independent and exact under any partitioning or merge
    * order.
    */
  def aggState(df: DataFrame, keyCols: Seq[String],
               valueCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast(DoubleType).cast(DecimalType(38, 6))).as("v"))

  /** X89 — incremental aggregate maintenance: merge a persisted
    * [[aggState]] with a delta batch's state WITHOUT rescanning the base
    * facts — new_state = base ⊎ delta, one |keys|-sized aggregation over
    * the two state frames (the base fact table never appears in the
    * plan). Deletions arrive as negative-n / negated-sum delta rows
    * (standard retraction encoding); keys whose count nets to zero drop
    * out of the state entirely. DECIMAL sums make the merge EXACT: state
    * merged in any batch order equals the full recompute bit-for-bit —
    * which is precisely what the declared query's oracle (a full
    * recompute over all facts) certifies.
    */
  def mergeAggState(base: DataFrame, delta: DataFrame,
                    keyCols: Seq[String]): DataFrame =
    base.unionByName(delta)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("n")).as("n"),
        sum(col("v")).cast(DecimalType(38, 6)).as("v"))
      .where(col("n") =!= 0)

  /** X90 — SCD type-2 apply: fold a changeset into a slowly-changing
    * dimension, producing the full version history — per key, rows
    * ordered by effective time with `valid_to` = next version's
    * `valid_from` (NULL on the current row) and consecutive NO-OP
    * changes (attribute equal to the prior version) dropped, so
    * re-stating an unchanged attribute never opens a spurious version.
    * The warehouse upsert-with-history primitive (dimension tables,
    * catalog snapshots, entity timelines).
    *
    * Contract: (key, valid_from) unique across base ∪ changes — callers
    * pre-aggregate colliding same-instant changes to one deterministic
    * winner (the declared query takes min(attr)).
    *
    * Scale shape: one union, then two key-partitioned windows on the
    * SAME (key, valid_from) ordering — one shuffle, the second window
    * reuses the first's sort. No joins; history length bounds the
    * window, not corpus size.
    */
  def scd2Apply(base: DataFrame, changes: DataFrame, keyCol: String,
                attrCol: String, fromCol: String): DataFrame = {
    def shape(df: DataFrame) = df.select(col(keyCol).as("key"),
      col(attrCol).as("attr"), col(fromCol).as("valid_from"))
    val w = Window.partitionBy("key").orderBy("valid_from")
    shape(base).unionByName(shape(changes))
      .withColumn("__prev", lag(col("attr"), 1).over(w))
      .where(col("__prev").isNull || col("__prev") =!= col("attr"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .withColumn("is_current",
        col("valid_to").isNull.cast("int").cast(LongType))
      .drop("__prev")
  }

  /** X101 — target-mixture rebalance weights (domain balancing): per
    * domain (source, language, crawl, …) the corpus share by a SIZE
    * column and the sampling weight that would rebalance the corpus to a
    * UNIFORM target mixture — the training-data curation step that stops
    * one over-crawled domain from dominating the token budget (the
    * DoReMi/Pile-style domain-reweighting front end; weight > 1 means
    * up-sample, < 1 means down-sample).
    *
    * share = units_d / total and weight = target/actual =
    * total / (|domains| · units_d) are each ONE correctly-rounded IEEE
    * division of exact integer counts (the X91 finish discipline), so
    * both engines hold identical doubles before the pinned 6-dp round.
    *
    * Scale shape: one map-side-partial count/sum aggregation collapses
    * the corpus to |domains| rows; the grand total is a broadcast ≤1-row
    * frame (literal-attach crossJoin). Output |domains| rows — corpus-
    * size-independent.
    */
  def domainMix(df: DataFrame, domainCol: String, sizeCol: String): DataFrame = {
    val per = df.where(col(domainCol).isNotNull)
      .groupBy(col(domainCol).as("domain"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(sizeCol).cast(LongType)).as("units"))
    val tot = per.agg(sum(col("units")).as("total_units"),
      count(lit(1)).as("n_domains"))
    per.crossJoin(broadcast(tot))
      .select(col("domain"), col("n_docs"),
        col("units").cast(LongType).as("n_units"),
        round(col("units").cast(DoubleType) /
          col("total_units").cast(DoubleType), 6).as("share"),
        round(col("total_units").cast(DoubleType) /
          (col("n_domains") * col("units")).cast(DoubleType), 6).as("weight"))
  }
}
