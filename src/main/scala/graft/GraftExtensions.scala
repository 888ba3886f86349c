package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

import graft.functions.{DotProduct, HilbertIndex, L2Distance, NfcNormalize}

/** Engine extension point, installed with
  * `spark.sql.extensions=graft.GraftExtensions` (works under spark-submit
  * on a real cluster and in embedded sessions alike). Registers the
  * engine's native expressions so they are callable from SQL and via
  * `call_function` from the DataFrame API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.entries.foreach(ext.injectFunction)
  }
}

object GraftExtensions {
  private val dotEntry = (
    new FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, null, "graft_dot"),
    (children: Seq[Expression]) => DotProduct(children.head, children(1)): Expression)

  // Spark ships BloomFilterAggregate/BloomFilterMightContain for its
  // runtime join filters but does not expose might_contain in the SQL
  // registry; registering them here gives the engine a first-class
  // build-once/probe-map-side Bloom pair without reimplementing the
  // sketch. The aggregate takes (xxhash64-long, estimatedItems, numBits);
  // the probe requires a CONSTANT filter (we pass the fitted blob as a
  // literal, the same fit→literal pattern as the IVF/PQ models).
  private val bloomAggEntry = (
    new FunctionIdentifier("graft_bloom_agg"),
    new ExpressionInfo(classOf[BloomFilterAggregate].getName, null, "graft_bloom_agg"),
    (children: Seq[Expression]) => new BloomFilterAggregate(
      children.head, children(1), children(2)): Expression)

  private val bloomProbeEntry = (
    new FunctionIdentifier("graft_might_contain"),
    new ExpressionInfo(classOf[BloomFilterMightContain].getName, null,
      "graft_might_contain"),
    (children: Seq[Expression]) => BloomFilterMightContain(
      children.head, children(1)): Expression)

  private val l2Entry = (
    new FunctionIdentifier("graft_l2"),
    new ExpressionInfo(classOf[L2Distance].getName, null, "graft_l2"),
    (children: Seq[Expression]) => L2Distance(children.head, children(1)): Expression)

  private val nfcEntry = (
    new FunctionIdentifier("graft_nfc"),
    new ExpressionInfo(classOf[NfcNormalize].getName, null, "graft_nfc"),
    (children: Seq[Expression]) => NfcNormalize(children.head): Expression)

  private val hilbertEntry = (
    new FunctionIdentifier("graft_hilbert"),
    new ExpressionInfo(classOf[HilbertIndex].getName, null, "graft_hilbert"),
    (children: Seq[Expression]) => HilbertIndex(children.head, children(1),
      children(2)): Expression)

  private val entries = Seq(dotEntry, l2Entry, bloomAggEntry, bloomProbeEntry,
    nfcEntry, hilbertEntry)

  /** Idempotently register the engine functions on an existing session —
    * for sessions built without `spark.sql.extensions` (e.g. a host
    * application's). Called by the operators themselves, so the library is
    * self-contained either way.
    */
  def ensure(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    entries.foreach { e =>
      if (!reg.functionExists(e._1)) reg.registerFunction(e._1, e._2, e._3)
    }
  }
}
