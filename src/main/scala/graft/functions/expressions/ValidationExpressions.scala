package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-walk kernels for the three hot validation predicates (rules F1,
  * F6, F7). Each replaces a per-row java.util.regex or DateTimeFormatter
  * evaluation with a branchy scan over the UTF8String's bytes — same
  * booleans, ~10× less work per row — and each documents the exact
  * quirks of the construct it replaces (Java regex `$`-before-final-
  * newline, the unescaped `.` wildcard, strict four-field parsing).
  * `ValidationKernelSpec` pins kernel == original-expression equivalence
  * on adversarial and random inputs; the DuckDB oracle gate re-checks it
  * on the data.
  */
object ValidationKernels {

  /** `s RLIKE '[^0-9]'` — true iff any char is not an ASCII digit.
    * Byte-exact: every byte of a multi-byte UTF-8 char is >= 0x80 and
    * therefore "not a digit" in the regex's eyes too. */
  def hasNonDigit(s: UTF8String): Boolean = {
    val n = s.numBytes
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if (b < '0' || b > '9') return true
      i += 1
    }
    false
  }

  private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'
  private def d(b: Byte): Int = b - '0'

  /** Bytes one UTF-8 char occupies, from its lead byte (used only where
    * the regex has a true any-char wildcard). */
  private def charLen(b: Byte): Int =
    if ((b & 0x80) == 0) 1
    else if ((b & 0xe0) == 0xc0) 2
    else if ((b & 0xf0) == 0xe0) 3
    else 4

  /** `s RLIKE DateFormatRegex` (rule F6), byte-for-byte with Java regex
    * semantics:
    *
    *   - body: `YYYY-MM-DD HH:MM:SS` with the regex's range classes
    *     (month 01–12, day 01–31, hour 00–23, min/sec 00–59);
    *   - optional fraction `(.([0-9])+)?` where `.` is the UNESCAPED
    *     any-char wildcard (any char except a line terminator — Java's
    *     default `.` excludes \n, \r, U+0085, U+2028, U+2029), then one
    *     or more digits;
    *   - `$` without MULTILINE matches at end OR before one FINAL line
    *     terminator, so a single trailing `\n`, `\r\n`, `\r`, U+0085,
    *     U+2028 or U+2029 is accepted.
    */
  def dateFormatMatches(s: UTF8String): Boolean = {
    val n = s.numBytes
    if (n < 19) return false
    // YYYY-
    var i = 0
    while (i < 4) { if (!isDigit(s.getByte(i))) return false; i += 1 }
    if (s.getByte(4) != '-') return false
    // month 01-12
    val m1 = s.getByte(5); val m2 = s.getByte(6)
    if (!isDigit(m1) || !isDigit(m2)) return false
    val mm = d(m1) * 10 + d(m2)
    if (mm < 1 || mm > 12) return false
    if (s.getByte(7) != '-') return false
    // day 01-31
    val d1 = s.getByte(8); val d2 = s.getByte(9)
    if (!isDigit(d1) || !isDigit(d2)) return false
    val dd = d(d1) * 10 + d(d2)
    if (dd < 1 || dd > 31) return false
    if (s.getByte(10) != ' ') return false
    // hour 00-23
    val h1 = s.getByte(11); val h2 = s.getByte(12)
    if (!isDigit(h1) || !isDigit(h2)) return false
    if (d(h1) * 10 + d(h2) > 23) return false
    if (s.getByte(13) != ':') return false
    // minute 00-59
    if (!isDigit(s.getByte(14)) || s.getByte(14) > '5' || !isDigit(s.getByte(15))) return false
    if (s.getByte(16) != ':') return false
    // second 00-59
    if (!isDigit(s.getByte(17)) || s.getByte(17) > '5' || !isDigit(s.getByte(18))) return false
    // `(.([0-9])+)?$`: either $ matches right here, or the greedy
    // fraction consumes one wildcard char (never a line terminator —
    // Java `.`) plus 1+ digits and $ matches after them. No real
    // backtracking exists: digits can't satisfy $, so the greedy digit
    // run is the only candidate split.
    val p = 19
    if (finalTerminator(s, p)) return true
    if (p >= n || isLineTerminatorAt(s, p)) return false
    var q = p + charLen(s.getByte(p))
    if (q >= n || !isDigit(s.getByte(q))) return false
    while (q < n && isDigit(s.getByte(q))) q += 1
    finalTerminator(s, q)
  }

  /** True at end of input, or with exactly one final line terminator
    * remaining (Java `$`, no MULTILINE). */
  private def finalTerminator(s: UTF8String, p: Int): Boolean = {
    val n = s.numBytes
    if (p == n) return true
    val b = s.getByte(p)
    if (b == '\n') p + 1 == n
    else if (b == '\r') p + 1 == n || (p + 2 == n && s.getByte(p + 1) == '\n')
    else if (b == 0xc2.toByte) p + 2 == n && s.getByte(p + 1) == 0x85.toByte // U+0085
    else if (b == 0xe2.toByte) // U+2028 / U+2029
      p + 3 == n && s.getByte(p + 1) == 0x80.toByte &&
        (s.getByte(p + 2) == 0xa8.toByte || s.getByte(p + 2) == 0xa9.toByte)
    else false
  }

  private def isLineTerminatorAt(s: UTF8String, p: Int): Boolean = {
    val b = s.getByte(p)
    b == '\n' || b == '\r' ||
      (b == 0xc2.toByte && p + 1 < s.numBytes && s.getByte(p + 1) == 0x85.toByte) ||
      (b == 0xe2.toByte && p + 2 < s.numBytes && s.getByte(p + 1) == 0x80.toByte &&
        (s.getByte(p + 2) == 0xa8.toByte || s.getByte(p + 2) == 0xa9.toByte))
  }

  private def isLeap(y: Int): Boolean = (y % 4 == 0 && y % 100 != 0) || y % 400 == 0
  private val monthDays = Array(31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31)

  private def isLeapL(y: Long): Boolean = (y % 4 == 0 && y % 100 != 0) || y % 400 == 0

  /** `LocalDate.toEpochDay` for arbitrary proleptic-Gregorian years
    * (the standard java.time day-count algorithm). */
  private def toEpochDay(y: Long, m: Int, d: Int): Long = {
    var total = 365L * y
    if (y >= 0) total += (y + 3) / 4 - (y + 99) / 100 + (y + 399) / 400
    else total -= y / -4 - y / -100 + y / -400
    total += (367L * m - 362) / 12
    total += d - 1
    if (m > 2) { total -= 1; if (!isLeapL(y)) total -= 1 }
    total - 719528L
  }

  /** Rule F7's `try_to_timestamp(substring_index(c, '.', 1),
    * 'yyyy-MM-dd HH:mm:ss') IS NOT NULL`: strip everything from the
    * first `.`, then strict parse. Pinned empirically against Spark's
    * CORRECTED-mode parser (`ValidationKernelSpec` drives both):
    *
    *   - unsigned year: EXACTLY 4 digits (strict width; `12020` and
    *     `02020` both fail);
    *   - `+` year: only with MORE than 4 digits (SignStyle.EXCEEDS_PAD:
    *     `+2020` fails, `+12020` parses); `-` year: 4+ digits, any
    *     magnitude (negative years are valid timestamps);
    *   - at most 9 year digits (ChronoField.YEAR range ±999,999,999 —
    *     10+ digits fail the field check → null);
    *   - calendar validity: month 1–12, day ≤ days-in-month with the
    *     proleptic Gregorian leap rule, hour ≤ 23, min/sec ≤ 59;
    *   - micros-range overflow (|year| ≳ 292,271): here the ORIGINAL
    *     expression does not return null — it THROWS (uncaught
    *     ArithmeticException from the instant→micros conversion kills
    *     the query). The kernel deliberately diverges and flags the row
    *     invalid instead: a validation library must surface absurd
    *     data, not crash on it. The exact overflow boundary is
    *     replicated with multiplyExact, so on every input the original
    *     survives, the accept sets are identical.
    */
  def parseableTimestamp(s: UTF8String): Boolean = {
    var n = s.numBytes
    var i = 0
    while (i < n) { if (s.getByte(i) == '.') { n = i }; i += 1 } // strip at first '.'
    if (n < 19) return false
    // optional sign + year digits; the tail "-MM-DD HH:mm:ss" is fixed
    // 15 bytes, so the year field spans [signLen, n-15)
    val b0 = s.getByte(0)
    val signed = b0 == '+' || b0 == '-'
    val yStart = if (signed) 1 else 0
    val yDigits = n - 15 - yStart
    if (yDigits < 4 || yDigits > 9) return false
    if (!signed && yDigits != 4) return false
    if (b0 == '+' && yDigits == 4) return false
    var y = 0L
    i = yStart
    while (i < yStart + yDigits) {
      val b = s.getByte(i)
      if (!isDigit(b)) return false
      y = y * 10 + d(b)
      i += 1
    }
    if (b0 == '-') y = -y
    val p = yStart + yDigits // position of '-' before MM
    if (s.getByte(p) != '-' || s.getByte(p + 3) != '-' || s.getByte(p + 6) != ' ' ||
      s.getByte(p + 9) != ':' || s.getByte(p + 12) != ':') return false
    if (!isDigit(s.getByte(p + 1)) || !isDigit(s.getByte(p + 2)) ||
      !isDigit(s.getByte(p + 4)) || !isDigit(s.getByte(p + 5)) ||
      !isDigit(s.getByte(p + 7)) || !isDigit(s.getByte(p + 8)) ||
      !isDigit(s.getByte(p + 10)) || !isDigit(s.getByte(p + 11)) ||
      !isDigit(s.getByte(p + 13)) || !isDigit(s.getByte(p + 14))) return false
    val mo = d(s.getByte(p + 1)) * 10 + d(s.getByte(p + 2))
    val dy = d(s.getByte(p + 4)) * 10 + d(s.getByte(p + 5))
    val h = d(s.getByte(p + 7)) * 10 + d(s.getByte(p + 8))
    val mi = d(s.getByte(p + 10)) * 10 + d(s.getByte(p + 11))
    val se = d(s.getByte(p + 13)) * 10 + d(s.getByte(p + 14))
    if (mo < 1 || mo > 12 || dy < 1) return false
    val maxDay = if (mo == 2 && isLeapL(y)) 29 else monthDays(mo - 1)
    if (dy > maxDay || h > 23 || mi > 59 || se > 59) return false
    // exact micros-overflow boundary (where the original throws)
    try {
      val secs = Math.addExact(Math.multiplyExact(toEpochDay(y, mo, dy), 86400L),
        (h * 3600 + mi * 60 + se).toLong)
      Math.multiplyExact(secs, 1000000L)
      true
    } catch { case _: ArithmeticException => false }
  }
}

/** Shared shape: string → non-null boolean via a static kernel call. */
sealed abstract class BooleanStringKernelExpr extends UnaryExpression {
  /** Fully-qualified static call target, e.g.
    * `...ValidationKernels$.MODULE$.hasNonDigit`. */
  protected def kernelCall: String
  protected def kernelEval(s: UTF8String): Boolean

  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }
  override def nullSafeEval(input: Any): Any = kernelEval(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$kernelCall($c)")
}

/** F1 hot path: `c RLIKE '[^0-9]'` as a byte scan. */
case class HasNonDigit(child: Expression) extends BooleanStringKernelExpr {
  override def prettyName: String = "has_non_digit"
  protected def kernelCall: String =
    "graft.functions.expressions.ValidationKernels$.MODULE$.hasNonDigit"
  protected def kernelEval(s: UTF8String): Boolean = ValidationKernels.hasNonDigit(s)
  override protected def withNewChildInternal(newChild: Expression): HasNonDigit =
    copy(child = newChild)
}

/** F6 hot path: the reference date-format regex as a byte walk. */
case class DateFormatMatches(child: Expression) extends BooleanStringKernelExpr {
  override def prettyName: String = "date_format_matches"
  protected def kernelCall: String =
    "graft.functions.expressions.ValidationKernels$.MODULE$.dateFormatMatches"
  protected def kernelEval(s: UTF8String): Boolean = ValidationKernels.dateFormatMatches(s)
  override protected def withNewChildInternal(newChild: Expression): DateFormatMatches =
    copy(child = newChild)
}

/** F7 hot path: strict `yyyy-MM-dd HH:mm:ss` calendar parse check. */
case class ParseableTimestamp(child: Expression) extends BooleanStringKernelExpr {
  override def prettyName: String = "parseable_timestamp"
  protected def kernelCall: String =
    "graft.functions.expressions.ValidationKernels$.MODULE$.parseableTimestamp"
  protected def kernelEval(s: UTF8String): Boolean = ValidationKernels.parseableTimestamp(s)
  override protected def withNewChildInternal(newChild: Expression): ParseableTimestamp =
    copy(child = newChild)
}
