package graft.functions.expressions

import java.security.MessageDigest
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Runtime kernel for [[SimHashSig]] — one MD5 per token, 63 sign
  * counters accumulated in a local array, packed into one long. Exactly
  * the bit family of the explode+aggregate formulation (and the DuckDB
  * oracle): for token hex digest `h`,
  *
  *   - bit j-1 (j = 1..32)  votes +1 iff `substr(h,j,1) >= '8'`
  *     (hex digits are '0'-'9','a'-'f', so the string compare is a
  *     plain char-code compare: '8','9','a'..'f' all pass),
  *   - bit j-1 (j = 33..63) votes +1 iff `ascii(substr(h,j-32,1))` is
  *     odd,
  *
  * and signature bit j-1 is set iff the vote sum is > 0. Public object
  * so generated code can call it.
  */
object SimHashKernel {

  private val hexChars = "0123456789abcdef".toCharArray

  /** Null (boxed) when the token array is empty — the explode+aggregate
    * form drops zero-token docs at the explode, so the fused form must
    * not invent a signature for them. Null tokens vote -1 on every bit
    * (CASE WHEN null THEN 1 ELSE -1 falls to ELSE). */
  def sig(tokens: ArrayData): java.lang.Long = {
    val n = tokens.numElements()
    if (n == 0) return null
    val counts = new Array[Int](63)
    val md = MessageDigest.getInstance("MD5")
    val hex = new Array[Char](32)
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      if (t == null) {
        var j = 0
        while (j < 63) { counts(j) -= 1; j += 1 }
      } else {
        md.reset()
        val digest = md.digest(t.getBytes)
        var b = 0
        while (b < 16) {
          hex(b * 2) = hexChars((digest(b) >> 4) & 0xf)
          hex(b * 2 + 1) = hexChars(digest(b) & 0xf)
          b += 1
        }
        var j = 0
        while (j < 32) {
          if (hex(j) >= '8') counts(j) += 1 else counts(j) -= 1
          j += 1
        }
        j = 0
        while (j < 31) {
          if ((hex(j) & 1) == 1) counts(32 + j) += 1 else counts(32 + j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 63) {
      if (counts(j) > 0) sig |= 1L << j
      j += 1
    }
    java.lang.Long.valueOf(sig)
  }
}

/** Per-row 63-bit SimHash signature from a token column
  * (`array<string>`), packed into one non-negative long — the fused
  * scalar form of the explode + 63-sign-sum aggregation, byte-identical
  * output, computed map-side in one kernel pass with no shuffle and no
  * higher-order functions in the plan.
  *
  * Like [[MinHashSig]], signature-per-row as a scalar expression is
  * what lets the same dedup run inside an append stream (stateful ops
  * can't follow an aggregation) and keeps batch signature scoring
  * map-only.
  */
case class SimHashSig(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_sig"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val r = SimHashKernel.sig(input.asInstanceOf[ArrayData])
    if (r == null) null else r.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val kernel = "graft.functions.expressions.SimHashKernel$.MODULE$"
      val boxed = ctx.freshName("simhashBoxed")
      s"""
         |java.lang.Long $boxed = $kernel.sig($c);
         |${ev.isNull} = $boxed == null;
         |${ev.value} = ${ev.isNull} ? -1L : $boxed.longValue();
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}
