package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern automaton (Aho & Corasick 1975) over raw
  * UTF-8 bytes — the banned-phrase / PII-term scanning primitive a
  * curation pipeline runs over every document. One pass per text
  * regardless of pattern count: O(bytes + matches) versus the
  * O(bytes × patterns) of a per-pattern `contains` chain, which is the
  * difference between one linear scan and P linear scans at 100 TB.
  *
  * Construction (driver-side, once per query): a byte-trie of the
  * patterns, BFS failure links (longest proper suffix that is also a
  * trie prefix), and per-state emit counts folded through the failure
  * chain (`emit(s) = ends(s) + emit(fail(s))`) so the scan never walks
  * fail chains — state transition + one add per input byte. The goto
  * table is dense (states × 256 ints): pattern sets are vocabulary-
  * sized (KBs), the table broadcasts with the closure, and dense rows
  * make the inner loop two array reads.
  *
  * Matching is byte-exact and overlapping-inclusive: every occurrence
  * of every pattern is counted, including occurrences overlapping each
  * other and patterns nested inside other patterns. (The t58 oracle
  * restates this per pattern with the length/replace trick, which
  * counts NON-overlapping occurrences — identical totals as long as no
  * pattern has a proper border, i.e. can't overlap itself; the gate's
  * pattern list is chosen border-free and the spec asserts it.)
  * ASCII patterns can never false-match inside multi-byte UTF-8: every
  * continuation byte is ≥ 0x80.
  */
final class AhoCorasick(val patterns: Seq[String]) extends Serializable {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "patterns must be non-empty")

  // dense goto table, failure links, emit counts — built eagerly so the
  // serialized form ships finished arrays, not rebuild logic
  private val (gotoTab: Array[Int], emit: Array[Long]) = {
    val bytes = patterns.map(_.getBytes("UTF-8"))
    val maxStates = bytes.map(_.length).sum + 1
    val g = Array.fill(maxStates * 256)(-1)
    val ends = new Array[Long](maxStates)
    var nStates = 1
    bytes.foreach { p =>
      var s = 0
      p.foreach { b =>
        val c = b & 0xff
        if (g(s * 256 + c) == -1) { g(s * 256 + c) = nStates; nStates += 1 }
        s = g(s * 256 + c)
      }
      ends(s) += 1L
    }
    // root: missing transitions loop to root
    var c = 0
    while (c < 256) { if (g(c) == -1) g(c) = 0; c += 1 }
    val fail = new Array[Int](nStates)
    val queue = new java.util.ArrayDeque[Integer]()
    c = 0
    while (c < 256) {
      val s = g(c)
      if (s != 0) { fail(s) = 0; queue.add(s) }
      c += 1
    }
    while (!queue.isEmpty) {
      val s = queue.poll()
      ends(s) += ends(fail(s)) // fold the failure chain's emits in
      c = 0
      while (c < 256) {
        val t = g(s * 256 + c)
        if (t == -1) g(s * 256 + c) = g(fail(s) * 256 + c)
        else { fail(t) = g(fail(s) * 256 + c); queue.add(t) }
        c += 1
      }
    }
    (g.take(nStates * 256), ends.take(nStates))
  }

  /** Total occurrences of all patterns in `text` (overlapping
    * included), one pass over the bytes. */
  def count(text: UTF8String): Long = {
    val n = text.numBytes
    var s = 0
    var total = 0L
    var i = 0
    while (i < n) {
      s = gotoTab(s * 256 + (text.getByte(i) & 0xff))
      total += emit(s)
      i += 1
    }
    total
  }
}

/** Total multi-pattern occurrence count of a text column via a shared
  * [[AhoCorasick]] automaton. The automaton is built once on the
  * driver and referenced from the generated code (the codegen span is
  * preserved; no per-row serialization, no UDF). */
case class MultiPatternCount(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  @transient private lazy val ac = new AhoCorasick(patterns)

  override def dataType: DataType = LongType
  override def prettyName: String = "multi_pattern_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    ac.count(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("graftAhoCorasick", ac,
      classOf[AhoCorasick].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $acRef.count($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiPatternCount =
    copy(child = newChild)
}
