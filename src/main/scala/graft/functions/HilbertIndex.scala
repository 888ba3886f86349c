package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Hilbert-curve index of a 2-D cell — the locality-preserving layout key
  * next to [[graft.sources.Layout.zValue]]'s Morton interleave: sorting by
  * the Hilbert index keeps EVERY consecutive pair of cells grid-adjacent
  * (the curve never jumps, where the Z curve teleports across the plane at
  * power-of-two seams), so range scans over either dimension touch fewer
  * clustered files — the reason Hilbert beats Z in practice for 2-column
  * skipping layouts (and why e.g. Databricks liquid clustering moved to
  * it).
  *
  * The per-bit state rotation makes the index inherently ITERATIVE —
  * composing it from shift/when Column primitives doubles the expression
  * tree per level (2^bits nodes; codegen falls over), which is exactly the
  * SURVEY §7.3 case for a native `Expression` with `doGenCode`: the
  * generated code is one static call on two longs, inside whole-stage
  * codegen like the engine's `graft_dot`/`graft_nfc`.
  *
  * `graft_hilbert(x, y, bits)` — x, y in [0, 2^bits); bits a foldable
  * constant ≤ 31 (the index then fits 2·bits ≤ 62 bits of a long).
  */
case class HilbertIndex(first: Expression, second: Expression,
                        third: Expression) extends TernaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (LongType, LongType, IntegerType) if third.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "graft_hilbert requires (bigint x, bigint y, constant int bits), " +
          s"got (${first.dataType.catalogString}, " +
          s"${second.dataType.catalogString}, ${third.dataType.catalogString})")
    }

  override def nullSafeEval(x: Any, y: Any, b: Any): Any =
    HilbertIndex.xy2d(x.asInstanceOf[Long], y.asInstanceOf[Long],
      b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y, b) =>
      s"graft.functions.HilbertIndex.xy2d($x, $y, $b)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): HilbertIndex =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "graft_hilbert"
}

object HilbertIndex {
  /** The classic xy2d walk (bit-plane descent with quadrant rotation).
    * Static so the generated code binds one call. Must stay public. */
  def xy2d(xIn: Long, yIn: Long, bits: Int): Long = {
    require(bits >= 1 && bits <= 31, s"bits=$bits out of [1,31]")
    var x = xIn
    var y = yIn
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) { // rotate the quadrant so the walk stays continuous
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}
