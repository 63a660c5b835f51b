package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.expressions.FloatDotProduct

/** Library entry point for Catalyst registration:
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  *   ...
  * }}}
  *
  * registers the engine's custom expressions in every session derived
  * from that builder — the supported injection point for a Spark-native
  * library (no session-side mutation needed).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("float_dot"),
      new ExpressionInfo(
        classOf[FloatDotProduct].getName, null, "float_dot",
        "float_dot(a, b) - dot product of two array<float> vectors (codegen)",
        ""),
      (children: Seq[Expression]) => FloatDotProduct(children.head, children(1))))
  }
}
