package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Analytics, Events}

/** Numeric semantics of the exact-moment regression and the
  * time-weighted average: hand-computable fixtures, degenerate-group
  * guards, tie determinism.
  */
class LinRegTwapSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("linReg recovers an exact line and flags degenerate groups") {
    // g1: y = 3x + 2 exactly -> slope 3, intercept 2, r = 1
    // g2: all x equal -> varx = 0 -> all-zero guard
    // g3: constant y -> r guard (slope 0 via covn = 0)
    val rows = (1L to 10L).map(x => ("g1", x, 3 * x + 2)) ++
      Seq(("g2", 5L, 1L), ("g2", 5L, 9L)) ++
      (1L to 5L).map(x => ("g3", x, 7L))
    val got = Analytics.linReg(rows.toDF("g", "x", "y"), "g", "x", "y")
      .orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got(0) === (("g1", 10L, 3.0, 2.0, 1.0)))
    assert(got(1) === (("g2", 2L, 0.0, 0.0, 0.0)))
    assert(got(2) === (("g3", 5L, 0.0, 7.0, 0.0)))
  }

  test("timeWeightedAvg: step-and-hold integral, not the sample mean") {
    // key 1: value 100 held for 9 us, then 0 for 1 us -> twap 90.0
    //        (the sample mean of (100, 0, 0) would be 33.3)
    // key 2: single event -> no interval, dropped
    val rows = Seq(
      (1L, 0L, 100L, 1L), (1L, 9L, 0L, 2L), (1L, 10L, 0L, 3L),
      (2L, 5L, 42L, 4L))
      .toDF("k", "ep", "v", "id")
      .select(col("k"), timestamp_micros(col("ep")).as("ts"),
        col("v"), col("id"))
    val got = Events.timeWeightedAvg(rows, "k", "ts", "v", "id")
      .orderBy("key").collect()
    assert(got.length === 1)
    assert(got(0).getLong(0) === 1L)
    assert(got(0).getLong(1) === 2L)    // two closed intervals
    assert(got(0).getLong(2) === 10L)   // span
    assert(got(0).getDouble(3) === 90.0)
  }

  test("timeWeightedAvg: equal timestamps resolve by the tie column") {
    // two samples at ep=0 (ids 1,2): id 1 gets a zero interval, id 2
    // holds until ep=10 -> integral = v(id=2) * 10
    val rows = Seq((1L, 0L, 100L, 1L), (1L, 0L, 40L, 2L), (1L, 10L, 0L, 3L))
      .toDF("k", "ep", "v", "id")
      .select(col("k"), timestamp_micros(col("ep")).as("ts"),
        col("v"), col("id"))
    val got = Events.timeWeightedAvg(rows, "k", "ts", "v", "id").collect()
    assert(got(0).getDouble(3) === 40.0)
  }
}
