package graft.ext

import org.apache.spark.sql.DataFrame
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

  /** INTERSECT (distinct) of two key sets — the complement of the diff
    * engine's EXCEPT algebra (SURVEY §2.5 O2). Spark plans it as an
    * aggregate + semi join; both sides dedup map-side first.
    */
  def intersectKeys(a: DataFrame, b: DataFrame): DataFrame = a.intersect(b)
}
