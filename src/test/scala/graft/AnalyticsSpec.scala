package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Analytics

/** Edge semantics of the as-of join's union-scan formulation, which the
  * DuckDB ASOF oracle exercises only statistically: equal-timestamp match
  * (<= semantics), no-match nulls, and per-key isolation.
  */
class AnalyticsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("asOfJoin: <= match, strictly-later right excluded, left semantics") {
    val left = Seq(
      (1L, 5L, 100L),   // before any view -> null match
      (1L, 15L, 101L),  // between views at 10 and 20 -> 10
      (1L, 20L, 102L),  // equal ts -> matches (<= semantics)
      (2L, 50L, 103L)   // other key: only key-1 views exist -> null
    ).toDF("user_id", "ep", "event_id")
    val right = Seq((1L, 10L, 900L), (1L, 20L, 901L))
      .toDF("user_id", "ep", "view_id")

    val got = Analytics.asOfJoin(left, right, "user_id", "ep", "event_id",
        Seq("view_id"))
      .orderBy("event_id")
      .select("event_id", "r_ep", "view_id")
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))

    assert(got.toSeq === Seq(
      (100L, None, None),
      (101L, Some(10L), Some(900L)),
      (102L, Some(20L), Some(901L)),
      (103L, None, None)))
  }

  test("asOfJoin: null right value does not un-match the row (struct carry)") {
    val left = Seq((1L, 30L, 1L)).toDF("user_id", "ep", "event_id")
    val right = Seq((1L, 10L, Some(7L)), (1L, 20L, None: Option[Long]))
      .toDF("user_id", "ep", "v")
    val r = Analytics.asOfJoin(left, right, "user_id", "ep", "event_id", Seq("v"))
      .select("r_ep", "v").collect().head
    // Latest right row is (20, null): r_ep must be 20 and v null — not
    // the older row's 7 leaking through per-column last(ignoreNulls).
    assert(r.getLong(0) === 20L)
    assert(r.isNullAt(1))
  }

  test("pivotCounts fills absent cells with 0 and rollup2 emits subtotals") {
    val df = Seq((1L, "a"), (1L, "a"), (2L, "b")).toDF("k", "t")
    val piv = Analytics.pivotCounts(df, "k", "t", Seq("a", "b"))
      .orderBy("k").collect()
    assert(piv.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq((1L, 2L, 0L), (2L, 0L, 1L)))

    val ro = Analytics.rollup2(
      Seq(("x", "p", 1.0), ("x", "q", 2.0)).toDF("a", "b", "v"), "a", "b", "v")
      .orderBy("a", "b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(ro.toSeq === Seq(
      ("ALL", "ALL", 2L, 3.0), ("x", "ALL", 2L, 3.0),
      ("x", "p", 1L, 1.0), ("x", "q", 1L, 2.0)))
  }

  test("funnel: steps count only strictly after the previous step") {
    val ts = (s: Long) => new java.sql.Timestamp(s * 1000L)
    val ev = Seq(
      // user 1: proper view(10) → click(20) → purchase(30)
      (1L, "view", ts(10)), (1L, "click", ts(20)), (1L, "purchase", ts(30)),
      // user 2: click BEFORE the first view — click must not count; the
      // later click(40) does
      (2L, "click", ts(5)), (2L, "view", ts(10)), (2L, "click", ts(40)),
      // user 3: purchase before click → stops at click
      (3L, "view", ts(10)), (3L, "purchase", ts(15)), (3L, "click", ts(20)),
      // user 4: never views → 0 steps despite later events
      (4L, "click", ts(10)), (4L, "purchase", ts(20)))
      .toDF("user_id", "event_type", "ts")
    val out = Analytics.funnel(ev, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(4)))
    assert(out.toSeq === Seq((1L, 3L), (2L, 2L), (3L, 2L), (4L, 0L)))
  }

  test("histogram clamps outliers into the edge bins") {
    val df = Seq(-5.0, 0.0, 49.9, 50.0, 120.0, 9999.0).toDF("v")
    val out = Analytics.histogram(df, "v", 0.0, 50.0, 3)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    // bin 0 gets the negative outlier, bin 2 gets everything >= 100
    assert(out.toSeq === Seq(
      (0L, 3L, -5.0, 49.9), (1L, 1L, 50.0, 50.0), (2L, 2L, 120.0, 9999.0)))
  }

  test("winsorize clamps into the percentile band before aggregating") {
    // 11 values 0..10 in one group plus a wild outlier group:
    // p10 = 1.0 + outlier shift, p90 interpolated — pin with exact values
    val df = (Seq.tabulate(11)(i => ("a", i.toDouble)) :+ ("b", 1000000.0))
      .toDF("g", "v")
    val out = Analytics.winsorize(df, "g", "v", 0.25, 0.75)
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    // quantile_cont over all 12 values sorted [0..10, 1e6]:
    // p25 = 2.75, p75 = 8.25 (linear interpolation at rank 1+p*(n-1))
    val (plo, phi) = (2.75, 8.25)
    val clampedA = (0 to 10).map(i => math.min(math.max(i.toDouble, plo), phi))
    assert(out(0) == ("a", 11L,
      BigDecimal(clampedA.map(BigDecimal(_)).sum.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      plo, phi))
    // the outlier row is clamped down to the hi percentile
    assert(out(1) == ("b", 1L, phi, phi, phi))
  }

  test("anomaly: constant series scores z NULL, a spike scores exactly") {
    import graft.ext.Events
    // one event per hour for 26 hours, then an hour with 25 events
    val rows = (0 until 26).flatMap { h =>
      val base = java.sql.Timestamp.valueOf(s"2026-01-01 00:30:00")
      val t = new java.sql.Timestamp(base.getTime + h * 3600L * 1000)
      val n = if (h == 25) 25 else 1
      (0 until n).map(i => (h * 100L + i, t, "click"))
    }
    val df = rows.toDF("event_id", "ts", "event_type")
    val got = Events.anomaly(df, trail = 24).orderBy("win_ts").collect()
    // hours 24 and 25 have full trailing frames
    assert(got.length == 2)
    val flat = got(0) // hour 24: n=1 over a constant-1 trail → dev 0, z NULL
    assert(flat.getLong(2) == 1L && flat.getDouble(3) == 0.0 && flat.isNullAt(4))
    val spike = got(1) // hour 25: n=25, trail mean 1, variance 0 → z NULL
    assert(spike.getLong(2) == 25L && spike.getDouble(3) == 24.0 &&
      spike.isNullAt(4))
    // non-degenerate variance: alternating 1/3 trail, then a 10 —
    // mean 2, population variance 1 → z = (10-2)/1 = 8
    val alt = (0 until 25).flatMap { h =>
      val base = java.sql.Timestamp.valueOf(s"2026-01-01 00:30:00")
      val t = new java.sql.Timestamp(base.getTime + h * 3600L * 1000)
      val n = if (h == 24) 10 else if (h % 2 == 0) 1 else 3
      (0 until n).map(i => (h * 100L + i, t, "click"))
    }.toDF("event_id", "ts", "event_type")
    val g2 = Events.anomaly(alt, trail = 24).collect()
    assert(g2.length == 1 && g2.head.getDouble(3) == 8.0 &&
      g2.head.getDouble(4) == 8.0)
  }

  test("slidingCounts: every event covers exactly width/slide windows") {
    import graft.ext.Events
    val ts = java.sql.Timestamp.valueOf("2026-01-01 10:37:00")
    val df = Seq((1L, ts, "click")).toDF("event_id", "ts", "event_type")
    val got = Events.slidingCounts(df).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    // 10:37 is covered by the 1h windows starting 09:45, 10:00, 10:15, 10:30
    val base = ts.getTime / 1000
    val b15 = base / 900 * 900
    assert(got.toSeq == Seq(3, 2, 1, 0).map(k => (b15 - k * 900, "click", 1L)))
  }

  test("trailingDaily: RANGE frame ages gap days out, DECIMAL sums exact") {
    import graft.ext.Events
    def ts(day: Int) = new java.sql.Timestamp(day * 86400000L + 3600000L)
    val ev = Seq(
      (1L, ts(0), 7L, "click", 1.5),
      (2L, ts(3), 7L, "click", 2.0),
      (3L, ts(3), 7L, "view", 0.25),
      (4L, ts(10), 7L, "click", 4.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Events.trailingDaily(ev, "user_id", "ts", "value")
      .orderBy("day")
      .collect().map(r => (r.getLong(1), r.getLong(2),
        r.getDecimal(3).doubleValue))
    // day 3 sees day 0 (3 back); day 10 must NOT see day 3 (7 back — a
    // ROWS frame would wrongly include it across the gap)
    assert(got.toSeq == Seq((0L, 1L, 1.5), (3L, 3L, 3.75), (10L, 1L, 4.0)))
  }

  test("equiDepth: populations equal within 1, boundaries ordered, skew survives") {
    // 100 rows, heavily skewed: 60 copies of value 5, the rest 1..40
    val rows = (1L to 60L).map(i => (i, 5L)) ++
      (61L to 100L).map(i => (i, i - 60L))
    val df = rows.toDF("id", "v")
    val got = Analytics.equiDepth(df, "v", "id", nBuckets = 4)
      .orderBy("bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._2).sum == 100L)
    assert(got.map(_._2).forall(n => n == 25L), "4 buckets of exactly 25")
    // bucket value ranges are non-decreasing across buckets
    val flat = got.sortBy(_._1)
    assert(flat.sliding(2).forall { case Array(a, b) => a._4 <= b._3 || a._4 <= b._4 }
      , s"boundaries out of order: ${flat.toSeq}")
    // the 60-copy value straddles buckets rather than serializing one
    assert(flat.count(b => b._3 <= 5L && 5L <= b._4) >= 2)
  }

  test("joinCardinality: exact size from histograms, heaviest key, disjoint total") {
    val a = Seq(1L, 1L, 1L, 2L).toDF("ka")
    val b = Seq(1L, 1L, 1L, 1L, 3L, 3L).toDF("kb")
    val r = Analytics.joinCardinality(a, b, "ka", "kb").head
    assert(r.getLong(0) == 2L && r.getLong(1) == 3L)   // a: keys, max mult
    assert(r.getLong(2) == 2L && r.getLong(3) == 4L)   // b: keys, max mult
    assert(r.getLong(4) == 1L)                          // common keys
    assert(r.getDecimal(5).longValue == 12L)            // 3*4 exact join rows
    assert(r.getString(6) == "1" && r.getDecimal(7).longValue == 12L)
    // cross-check against the materialized join
    assert(a.join(b, col("ka") === col("kb")).count() == 12L)
    // disjoint key sets still report one (zeroed) row
    val d = Analytics.joinCardinality(a,
      Seq(9L).toDF("kb"), "ka", "kb").head
    assert(d.getLong(4) == 0L && d.getDecimal(5).longValue == 0L &&
      d.isNullAt(6))
  }

  test("profile: counts, nulls, distincts, per-type min/max rendering") {
    val df = Seq(
      (1L, Some(2.5), Some("b")),
      (2L, None, Some("a")),
      (3L, Some(2.5), None),
      (4L, Some(-1.25), Some("a")))
      .toDF("id", "score", "tag")
    val got = Analytics.profile(df, Seq("id", "score", "tag"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4),
          r.getString(5))).toMap
    assert(got("id") == ((4L, 4L, 4L, "1", "4")))
    assert(got("score") == ((4L, 3L, 2L, "-1.250000", "2.500000")))
    assert(got("tag") == ((4L, 3L, 2L, "a", "b")))
  }

  test("percentileRank: per-group ranks, id tiebreak, nulls dropped") {
    val df = Seq(
      (1L, Option("a"), Option(10L)),
      (2L, Option("a"), Option(5L)),
      (3L, Option("a"), Option(10L)),   // ties with id 1 → id order
      (4L, Option("b"), Option(7L)),
      (5L, None, Option(9L)),           // null group dropped
      (6L, Option("b"), None))          // null value dropped
      .toDF("doc_id", "lang", "n_chars")
    val got = Analytics.percentileRank(df, "lang", "n_chars", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(3), r.getLong(4))).toMap
    assert(got == Map(
      1L -> (("a", 2L, 3L)), 2L -> (("a", 1L, 3L)), 3L -> (("a", 3L, 3L)),
      4L -> (("b", 1L, 1L))))
  }

  test("tCloseness: TVD exact on a hand-computed fixture; absent values counted") {
    import spark.implicits._
    // group A: {x:2, y:2} (p = .5/.5); group B: {x:4} (p = 1/0)
    // global: x 6/8, y 2/8. TVD(A) = (|.5-.75| + |.5-.25|)/... = .25
    // TVD(B) = (|1-.75| + |0-.25|)/2 · 2 = .25 — y ABSENT from B, the
    // closed-form fold must still charge its mass
    val rows = Seq(("A", "x"), ("A", "x"), ("A", "y"), ("A", "y"),
      ("B", "x"), ("B", "x"), ("B", "x"), ("B", "x"))
      .toDF("grp", "v")
    val got = Analytics.tCloseness(rows, Seq("grp"), "v", t = 0.24)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    assert(got == Map("A" -> (4L, 0.25, 1L), "B" -> (4L, 0.25, 1L)))
    // identical-distribution group has TVD 0 and no risk
    val uni = Seq(("A", "x"), ("A", "y"), ("B", "x"), ("B", "y"))
      .toDF("grp", "v")
    val g2 = Analytics.tCloseness(uni, Seq("grp"), "v", t = 0.24)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getLong(3))).toMap
    assert(g2 == Map("A" -> ((0.0, 0L)), "B" -> ((0.0, 0L))))
  }
}
