package graft.validate

import org.scalatest.funsuite.AnyFunSuite

/** Property check (SURVEY.md §5): the reference's date-format regex vs
  * the timestamp parser, over deterministic random samples (seed 42).
  * The regex deliberately over-accepts calendar-invalid dates (Feb 30) —
  * that gap is exactly what rule F7 exists for
  * (`/root/reference/src/price_zone/validator.py:82-90`); the invariant
  * is one-directional: parser acceptance ⇒ regex acceptance.
  */
class DateRegexPropertySpec extends AnyFunSuite {

  private val regex = Rules.DateFormatRegex.r
  private val rnd = new scala.util.Random(42)
  private val N = 2000

  private def shape(): (Int, Int, Int, Int, Int, Int) = (
    1000 + rnd.nextInt(9000), 1 + rnd.nextInt(12), 1 + rnd.nextInt(31),
    rnd.nextInt(24), rnd.nextInt(60), rnd.nextInt(60))

  test("in-range shapes match the regex; parser acceptance implies regex acceptance") {
    var parserAccepted = 0
    (1 to N).foreach { _ =>
      val (y, m, d, h, mi, s) = shape()
      val str = f"$y%04d-$m%02d-$d%02d $h%02d:$mi%02d:$s%02d"
      assert(regex.matches(str), str)
      val parseable =
        try { java.time.LocalDateTime.parse(str.replace(' ', 'T')); true }
        catch { case _: Exception => false }
      if (parseable) { parserAccepted += 1; assert(regex.matches(str)) }
    }
    // sanity: the sample includes both calendar-valid and Feb-30-style rows
    assert(parserAccepted > N / 2 && parserAccepted < N)
  }

  test("out-of-range fields never match the regex") {
    (1 to N).foreach { _ =>
      val (y, m, d, h, mi, s) = shape()
      val bad = rnd.nextInt(4) match {
        case 0 => f"$y%04d-${13 + rnd.nextInt(87)}%02d-$d%02d $h%02d:$mi%02d:$s%02d"
        case 1 => f"$y%04d-$m%02d-${32 + rnd.nextInt(68)}%02d $h%02d:$mi%02d:$s%02d"
        case 2 => f"$y%04d-$m%02d-$d%02d ${24 + rnd.nextInt(76)}%02d:$mi%02d:$s%02d"
        case _ => f"$y%04d-$m%02d-$d%02d $h%02d:${60 + rnd.nextInt(40)}%02d:$s%02d"
      }
      assert(!regex.matches(bad), bad)
    }
  }

  test("fractional seconds: digits accepted, bare dot rejected") {
    (1 to 200).foreach { _ =>
      val (y, m, d, h, mi, s) = shape()
      val base = f"$y%04d-$m%02d-$d%02d $h%02d:$mi%02d:$s%02d"
      assert(regex.matches(base + "." + "1" * (1 + rnd.nextInt(9))))
      assert(!regex.matches(base + "."))
    }
  }
}
