package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Reinterprets a micros-backed TIMESTAMP / TIMESTAMP_NTZ column as its
  * internal epoch-micros LONG — a zero-cost identity at both eval and
  * codegen level (the internal representation IS a long of micros).
  *
  * Exists for [[IntervalJoinAutoRewrite]]'s strict-bound normalization:
  * `t > lo` on timestamps is exactly `t_micros >= lo_micros + 1`
  * because micros are the type's full precision — integer succession
  * on the internal view, NOT interval arithmetic on the surface type
  * (which `Add(timestamp, 1)` would be, and which Catalyst rightly
  * refuses). NOT `CAST(ts AS BIGINT)`, which is epoch SECONDS.
  *
  * Optimizer-internal: never registered as a SQL function, only
  * constructed by rewrite rules over already-analyzed plans.
  */
case class MicrosView(child: Expression) extends UnaryExpression {
  require(child.dataType == TimestampNTZType ||
    child.dataType.isInstanceOf[TimestampType] || child.dataType == LongType,
    s"MicrosView child must be micros-backed, got ${child.dataType.sql}")

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = input

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => c)

  override protected def withNewChildInternal(newChild: Expression): MicrosView =
    copy(child = newChild)
}
