package graft.functions.expressions

import java.security.MessageDigest
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime kernel for [[CdcBoundaries]] — content-defined chunking
  * boundary detection (d12's primitive): position `i` (1-based,
  * CHARACTER positions, `w <= i <= length`) is a boundary iff the md5
  * of the `w`-character window ending at `i` has a final hex digit in
  * {'0','1'} (a 1/8 condition). Exactly the declarative form
  *
  * {{{ filter(transform(sequence(w, length(text)), i ->
  *       CASE WHEN substring(md5(substring(text, i-w+1, w)), 32, 1)
  *            IN ('0','1') THEN i END), x -> x IS NOT NULL) }}}
  *
  * in one fused pass: the HOF interpreter allocates a per-window
  * UTF8String substring, a full 32-char hex string, and three
  * intermediate arrays per document; here the window is a BYTE SLICE
  * of the original UTF-8 buffer (the UTF-8 encoding of a character
  * substring IS the corresponding byte range — character starts are
  * the non-continuation bytes), one reused MessageDigest digests it,
  * and only the final nibble is inspected. Character (code point)
  * indexing matches Spark's `substring`/`length` semantics, CJK text
  * included.
  */
object CdcBoundariesKernel {

  /** Empty array (NOT null) when the text is shorter than one window —
    * the declarative form's `length < w` guard returns `array()`, which
    * downstream concat(array(0), bnd, array(n)) turns into one
    * whole-text chunk. */
  def boundaries(text: UTF8String, w: Int): ArrayData = {
    val bytes = text.getBytes
    val nBytes = bytes.length
    // character-start byte offsets (code points = non-continuation bytes)
    var nChars = 0
    var b = 0
    while (b < nBytes) {
      if ((bytes(b) & 0xC0) != 0x80) nChars += 1
      b += 1
    }
    if (nChars < w) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](nChars + 1)
    var c = 0
    b = 0
    while (b < nBytes) {
      if ((bytes(b) & 0xC0) != 0x80) { starts(c) = b; c += 1 }
      b += 1
    }
    starts(nChars) = nBytes
    val md = MessageDigest.getInstance("MD5")
    val out = new java.util.ArrayList[Any](nChars / 4)
    var i = w // 1-based end position of the window
    while (i <= nChars) {
      val from = starts(i - w)
      val until = starts(i)
      md.reset()
      md.update(bytes, from, until - from)
      // final hex digit = low nibble of the last digest byte
      if ((md.digest()(15) & 0x0f) <= 1) out.add(Integer.valueOf(i))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Per-row CDC boundary positions (`array<int>`, 1-based character
  * positions) from a string column. See [[CdcBoundariesKernel]].
  */
case class CdcBoundaries(child: Expression, window: Int)
    extends UnaryExpression {

  require(window >= 1, "window must be >= 1")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cdc_boundaries"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    CdcBoundariesKernel.boundaries(input.asInstanceOf[UTF8String], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.CdcBoundariesKernel$$.MODULE$$" +
        s".boundaries($c, $window)")

  override protected def withNewChildInternal(newChild: Expression): CdcBoundaries =
    copy(child = newChild)
}
