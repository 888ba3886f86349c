package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HilbertIndex

class HilbertSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("xy2d: the bits=2 curve is the textbook 16-cell walk") {
    // the canonical order-2 Hilbert curve (U-shaped recursion)
    val want = Map(
      (0L, 0L) -> 0L, (1L, 0L) -> 1L, (1L, 1L) -> 2L, (0L, 1L) -> 3L,
      (0L, 2L) -> 4L, (0L, 3L) -> 5L, (1L, 3L) -> 6L, (1L, 2L) -> 7L,
      (2L, 2L) -> 8L, (2L, 3L) -> 9L, (3L, 3L) -> 10L, (3L, 2L) -> 11L,
      (3L, 1L) -> 12L, (2L, 1L) -> 13L, (2L, 0L) -> 14L, (3L, 0L) -> 15L)
    want.foreach { case ((x, y), d) =>
      assert(HilbertIndex.xy2d(x, y, 2) == d, s"xy2d($x,$y,2)")
    }
  }

  test("every consecutive index pair is grid-adjacent (bits=5, full grid)") {
    // THE Hilbert property (and what Z-order lacks): the walk never jumps
    val n = 32
    val byD = (for (x <- 0 until n; y <- 0 until n)
      yield HilbertIndex.xy2d(x.toLong, y.toLong, 5) -> (x, y)).toMap
    assert(byD.size == n * n, "index must be a bijection on the grid")
    assert(byD.keys.min == 0L && byD.keys.max == (n * n - 1).toLong)
    (0L until (n * n - 1).toLong).foreach { d =>
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump between d=$d ($x1,$y1) and d+1 ($x2,$y2)")
    }
  }

  test("codegen expression == static helper over the events fixture") {
    GraftExtensions.ensure(spark)
    val got = Tables.load(spark, TestSpark.sfDir, "events")
      .select(pmod(col("event_id"), lit(64)).cast("long").as("x"),
        pmod(col("user_id"), lit(64)).cast("long").as("y"))
      .withColumn("h", call_function("graft_hilbert", col("x"), col("y"), lit(6)))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == HilbertIndex.xy2d(r.getLong(0), r.getLong(1), 6))
    }
    // SQL front door sees it too
    assert(spark.sql("SELECT graft_hilbert(3L, 0L, 2)").head.getLong(0) == 15L)
  }
}
