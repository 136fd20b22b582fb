package graft.core

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.expr.FixedPointDot

/** Session extension wiring (the engine's pluggable surface, SURVEY §2.7):
  * registers the native expressions for SQL use. Activate with
  * `.config("spark.sql.extensions", "graft.core.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  *
  * No custom SparkStrategy/Rule is injected — every reference operator
  * plans onto Catalyst built-ins (SURVEY §4); scalar expressions are the
  * only extension point this engine needs.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("fixed_point_dot"),
      new ExpressionInfo(classOf[FixedPointDot].getName, "fixed_point_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        FixedPointDot(exprs(0), exprs(1))))
  }
}
