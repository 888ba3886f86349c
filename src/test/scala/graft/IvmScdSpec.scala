package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Analytics

/** Semantics of the incremental-maintenance and dimension-history
  * operators: state merge == full recompute, retraction netting, SCD2
  * no-op suppression and interval chaining, k-anonymity flag edges.
  */
class IvmScdSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("mergeAggState: merge of split states equals full recompute " +
    "in any split") {
    val facts = (1L to 100L).map(i => (i % 7, i * 0.125)).toDF("k", "v")
    val full = Analytics.aggState(facts, Seq("k"), "v")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2)))
    for (cut <- Seq(10L, 50L, 99L)) {
      val base = Analytics.aggState(
        facts.where(col("v") <= cut * 0.125), Seq("k"), "v")
      val delta = Analytics.aggState(
        facts.where(col("v") > cut * 0.125), Seq("k"), "v")
      val merged = Analytics.mergeAggState(base, delta, Seq("k"))
        .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2)))
      assert(merged.toSeq === full.toSeq, s"cut=$cut")
    }
  }

  test("mergeAggState: retraction rows net out; fully-retracted keys drop") {
    val base = Seq((1L, 3L, BigDecimal("6.000000")),
      (2L, 1L, BigDecimal("5.000000"))).toDF("k", "n", "v")
    val retract = Seq((1L, -1L, BigDecimal("-2.000000")),
      (2L, -1L, BigDecimal("-5.000000"))).toDF("k", "n", "v")
    val got = Analytics.mergeAggState(base, retract, Seq("k"))
      .orderBy("k").collect()
    assert(got.length === 1) // key 2 netted to zero and dropped
    assert(got(0).getLong(0) === 1L)
    assert(got(0).getLong(1) === 2L)
    assert(got(0).getDecimal(2) === new java.math.BigDecimal("4.000000"))
  }

  test("scd2Apply: no-op changes dropped, intervals chain, current open") {
    val base = Seq((1L, "A", "0000"), (2L, "B", "0000")).toDF("k", "a", "f")
    val chg = Seq(
      (1L, "A", "2020"), // no-op: equal to prior version -> dropped
      (1L, "C", "2021"),
      (1L, "C", "2022"), // no-op after the C change -> dropped
      (1L, "A", "2023")  // back to A: a REAL new version
    ).toDF("k", "a", "f")
    val got = Analytics.scd2Apply(base, chg, "k", "a", "f")
      .orderBy("key", "valid_from").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        Option(r.getString(3)), r.getLong(4)))
    assert(got.toSeq === Seq(
      (1L, "A", "0000", Some("2021"), 0L),
      (1L, "C", "2021", Some("2023"), 0L),
      (1L, "A", "2023", None, 1L),
      (2L, "B", "0000", None, 1L)))
  }

  test("kAnonymity: flags flip exactly at the k and l thresholds") {
    // group g1: 5 rows, 2 sensitive values -> safe at k=5,l=2
    // group g2: 4 rows, 1 sensitive value  -> both flags
    val rows = (1 to 5).map(i => ("g1", if (i <= 2) 10L else 20L)) ++
      (1 to 4).map(_ => ("g2", 30L))
    val got = Analytics.kAnonymity(rows.toDF("qi", "sens"), Seq("qi"),
        "sens", k = 5, l = 2)
      .orderBy("qi").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq(("g1", 5L, 2L, 0L, 0L), ("g2", 4L, 1L, 1L, 1L)))
  }
}
