package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-stream operators, batch form (SURVEY §2.9 X4–X7). The streaming
  * forms (Structured Streaming with watermarks / session_window /
  * flatMapGroupsWithState) live in graft.streaming; these batch plans are
  * the semantics contract the streaming variants must match.
  */
object Events {

  /** X4 — tumbling-window aggregation via Spark's `window()`. Output keys
    * on the window start as epoch seconds (BIGINT — portable across
    * engines; hour-aligned windows coincide with date_trunc('hour')).
    * Value sum goes through DECIMAL(38,6): double summation order is
    * nondeterministic across partitions, decimal is exact.
    */
  def tumbling(events: DataFrame, width: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(38, 6))).cast(DoubleType).as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("hour_ts"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding-window aggregation — the hopping-window twin of [[tumbling]]:
    * every event lands in width/slide overlapping windows (here 1h windows
    * advancing every 15min ⇒ 4 per event), the moving-aggregate view every
    * monitoring/trend surface needs. Spark's `window(ts, width, slide)` is
    * a map-side generator (one row per covering window — bounded fan-out
    * of width/slide, no self-join, no range explosion), then one count
    * aggregation keyed on (window, type); at 100 TB the shuffle carries
    * windows × types rows, time-bounded, not the event volume. Output keys
    * on the window START as epoch seconds, portable across engines.
    */
  def slidingCounts(events: DataFrame, width: String = "1 hour",
                    slide: String = "15 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("w.start")).as("win_ts"), col("event_type"),
        col("n"))

  /** Event correlation (interval self-join): every (A, B) event pair of
    * the same user where B follows A within `withinSec` — the
    * view→click / impression→conversion attribution join. Equi-join on
    * the user key with the time window as a residual range predicate:
    * ONE shuffle on user_id, never a time-expansion or cross product; at
    * 100 TB this is the shape whose streaming twin
    * (EventStreams.correlate) bounds state by the same window via
    * watermarks. Returns (user_id, a_id, b_id, gap_us), deterministic
    * under the (a_id, b_id) order.
    */
  def correlate(events: DataFrame, userCol: String, typeCol: String,
                idCol: String, tsCol: String, typeA: String, typeB: String,
                withinSec: Long): DataFrame = {
    val a = events.where(col(typeCol) === typeA)
      .select(col(userCol).as("user_id"),
        unix_micros(col(tsCol)).as("a_ep"), col(idCol).as("a_id"))
    val b = events.where(col(typeCol) === typeB)
      .select(col(userCol).as("__bu"),
        unix_micros(col(tsCol)).as("b_ep"), col(idCol).as("b_id"))
    a.join(b, col("user_id") === col("__bu")
        && col("b_ep") > col("a_ep")
        && col("b_ep") <= col("a_ep") + withinSec * 1000000L)
      .select(col("user_id"), col("a_id"), col("b_id"),
        (col("b_ep") - col("a_ep")).as("gap_us"))
  }

  /** Semi-structured payload extraction — the event-property surface every
    * product-analytics pipeline needs: parse a JSON string column with an
    * explicit schema through `from_json` (schema-typed, codegen — never a
    * per-row UDF parser) and aggregate a typed field per group. Malformed
    * JSON yields NULL (from_json's PERMISSIVE default), which the
    * aggregates skip — the tolerant-ingest behavior. At scale the parse is
    * one map-side pass; the only shuffle is the final aggregation.
    */
  def jsonFieldStats(events: DataFrame, jsonCol: String, fieldSchema: String,
                     field: String, groupCol: String): DataFrame =
    events
      .withColumn("__v",
        from_json(col(jsonCol), fieldSchema, Map.empty[String, String])
          .getField(field))
      .groupBy(col(groupCol))
      .agg(count(col("__v")).as("n_parsed"),
        sum(col("__v")).as(s"sum_$field"),
        min(col("__v")).as(s"min_$field"),
        max(col("__v")).as(s"max_$field"))

  /** X5 — gap-based sessionization (gaps-and-islands): a new session
    * starts after `gapSec` of inactivity. Timestamps are truncated to
    * seconds first so ns/µs precision differences between engines cannot
    * flip a gap decision. One shuffle (partition by user), two window
    * passes, one aggregation — the classic scalable formulation.
    */
  def sessionize(events: DataFrame, gapSec: Long = 1800): DataFrame = {
    val ts = unix_timestamp(date_trunc("second", col("ts")))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ep"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"), ts.as("ep"))
      .withColumn("prev", lag(col("ep"), 1).over(w))
      .withColumn("is_new",
        when(col("prev").isNull || col("ep") - col("prev") > gapSec, 1).otherwise(0))
      .withColumn("session_seq", sum(col("is_new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ep")).as("start_ep"), max(col("ep")).as("end_ep"))
  }

  /** Trailing z-score anomaly detection — the monitoring operator over
    * windowed counts: each (window, type) count is scored against the
    * previous `trail` OBSERVED windows of its type (rows-based trailing
    * frame — engine-replayable; a range frame would need gap fill).
    * Emitted: `dev` = n − trailing mean, `z` = dev / trailing stddev
    * (population), NULL when the trailing variance is 0; windows with
    * fewer than `trail` predecessors are not scored.
    *
    * Cross-engine determinism is arranged like the samplers: the window
    * sums (k, Σn, Σn²) are INTEGER-exact, so dev = (n·k − Σn)/k and
    * z = (n·k − Σn)/√(k·Σn² − (Σn)²) each involve only correctly-rounded
    * IEEE ops on exactly-representable integers — no accumulation-order
    * drift. Scale: one count aggregation + one per-type ordered window
    * over the (windows × types)-row count frame — time-bounded, tiny
    * next to the event volume.
    */
  def anomaly(events: DataFrame, width: String = "1 hour",
              trail: Int = 24): DataFrame = {
    require(trail > 0, s"trail=$trail must be positive")
    val counts = events
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("w.start")).as("win_ts"), col("event_type"),
        col("n"))
    val wt = Window.partitionBy(col("event_type")).orderBy(col("win_ts"))
      .rowsBetween(-trail, -1)
    counts
      .withColumn("__k", count(col("n")).over(wt))
      .withColumn("__s", sum(col("n")).over(wt))
      .withColumn("__ss", sum(col("n") * col("n")).over(wt))
      .where(col("__k") === trail)
      .withColumn("__num", col("n") * col("__k") - col("__s"))
      .withColumn("__v2", col("__k") * col("__ss") - col("__s") * col("__s"))
      .select(col("win_ts"), col("event_type"), col("n"),
        round(col("__num") / col("__k"), 6).as("dev"),
        when(col("__v2") > 0,
          round(col("__num") / sqrt(col("__v2").cast("double")), 6)).as("z"))
  }

  /** X62 — trailing RANGE-frame rollup: per (user, active day), the
    * trailing-`days`-day event count and value sum. Unlike the ROWS
    * frames elsewhere ([[anomaly]], [[sessionize]]), the frame is defined
    * by KEY DISTANCE on the integer epoch-day — days with no events
    * still age out exactly (a ROWS frame would silently stretch across
    * gaps). Value sums run in DECIMAL(38,6) so the accumulation is exact
    * in any order — no double ulp drift between engines.
    *
    * Scale shape: the daily pre-aggregation collapses events map-side to
    * ≤ one row per (user, day) BEFORE the window; the window then sorts
    * user-partitioned day series — bounded by the calendar, not the
    * event volume.
    */
  def trailingDaily(events: DataFrame, userCol: String, tsCol: String,
                    valueCol: String, days: Int = 7): DataFrame = {
    require(days > 0, s"days=$days must be positive")
    // Floor-division day bucketing (the Tables.scala pmod pattern):
    // Spark's `div` truncates toward zero, so a bare `div` would put
    // pre-epoch timestamps one day late vs the floor semantics every
    // other engine's `//` uses. pmod is non-negative, so subtracting it
    // lands exactly on the day boundary and the div is then exact.
    val daily = events
      .groupBy(col(userCol).as("user_id"),
        expr(s"(unix_micros($tsCol) - pmod(unix_micros($tsCol), " +
          s"${86400000000L}L)) div ${86400000000L}L").as("day"))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast(DecimalType(38, 6))).as("v"))
    val w = Window.partitionBy("user_id").orderBy("day")
      .rangeBetween(-(days - 1).toLong, 0L)
    daily.select(col("user_id"), col("day"),
      sum(col("n")).over(w).cast(LongType).as("trail_n"),
      sum(col("v")).over(w).cast(DecimalType(38, 6)).as("trail_v"))
  }

  /** X6 — top-k per group via ranking window, deterministic tiebreak. */
  def topKPerGroup(df: DataFrame, groupCol: String, orderCol: String,
                   tieCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(orderCol).desc, col(tieCol).asc)
    df.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Inter-arrival gaps per user (lead/lag window surface): microseconds
    * since the user's previous event, NULL for the first. One shuffle
    * (partition by user), sorted within — the same partitioning
    * sessionize uses, so a pipeline computing both reuses the exchange.
    */
  def interArrival(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ep"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ep"))
      .withColumn("gap_us", col("ep") - lag(col("ep"), 1).over(w))
  }

  /** X92 — time-weighted average (TWAP): per key, the step-function
    * integral of the value over its observation span divided by the span
    * — the finance/IoT aggregate where a plain mean over-weights bursts
    * of samples. Each sample holds until the next one (step-and-hold);
    * the last sample closes the integral at its own timestamp, so keys
    * with one event report span 0 and are dropped (no integral exists).
    *
    * The value column must be INTEGRAL (fixed-point pre-scaling, the
    * linReg/topPMassCut contract). Each term value×duration_µs is a
    * width-stable DECIMAL(19,0)×DECIMAL(19,0) product summed as
    * DECIMAL(38,0) — exact, order-independent; the single closing
    * division is one correctly-rounded IEEE op (X48 discipline).
    *
    * One key-partitioned window (lead) on the same shuffle the
    * aggregation then consumes — single exchange.
    */
  def timeWeightedAvg(events: DataFrame, keyCol: String, tsCol: String,
                      valueCol: String, tieCol: String): DataFrame = {
    val d19 = DecimalType(19, 0)
    // tieCol makes equal-timestamp ordering deterministic: ties give the
    // earlier row a zero-length interval, so only the LAST of a tie
    // holds value — which row that is must not depend on the engine
    val w = Window.partitionBy(col("key")).orderBy(col("__ep"), col("__tie"))
    events
      .select(col(keyCol).as("key"), unix_micros(col(tsCol)).as("__ep"),
        col(valueCol).cast(d19).as("__v"), col(tieCol).as("__tie"))
      .withColumn("__dur", lead(col("__ep"), 1).over(w) - col("__ep"))
      .where(col("__dur").isNotNull)
      .groupBy("key")
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("__dur")).cast(LongType).as("span_us"),
        sum(col("__v") * col("__dur").cast(d19)).as("__integral"))
      .select(col("key"), col("n_intervals"), col("span_us"),
        // zero-span guard (X91 degenerate-group discipline): a key whose
        // retained intervals all have zero duration (every event at one
        // timestamp) would otherwise emit 0/0 = NaN here vs NULL/inf in
        // other engines — pin the degenerate value to 0.0 on both sides
        when(col("span_us") === 0, lit(0.0))
          .otherwise(round(col("__integral").cast(DoubleType) /
            col("span_us").cast(DoubleType), 6)).as("twap"))
  }

  /** X7 — approximate distinct (HLL++) next to the exact count. The
    * approximate column has no cross-engine oracle (sketch internals
    * differ); the exact column is the oracle-checked variant and the spec
    * asserts the approximation error bound.
    */
  def approxDistinct(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"),
        approx_count_distinct(col("user_id"), 0.02).as("approx_users"))
}
