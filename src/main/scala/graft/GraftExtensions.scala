package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.DotProduct

/** Engine extension point, installed with
  * `spark.sql.extensions=graft.GraftExtensions` (works under spark-submit
  * on a real cluster and in embedded sessions alike). Registers the
  * engine's native expressions so they are callable from SQL and via
  * `call_function` from the DataFrame API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.dotEntry)
  }
}

object GraftExtensions {
  private val dotEntry = (
    new FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, null, "graft_dot"),
    (children: Seq[Expression]) => DotProduct(children.head, children(1)): Expression)

  /** Idempotently register the engine functions on an existing session —
    * for sessions built without `spark.sql.extensions` (e.g. a host
    * application's). Called by the operators themselves, so the library is
    * self-contained either way.
    */
  def ensure(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(dotEntry._1))
      reg.registerFunction(dotEntry._1, dotEntry._2, dotEntry._3)
  }
}
