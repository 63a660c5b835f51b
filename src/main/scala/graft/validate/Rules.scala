package graft.validate

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** A named validation rule: `invalid` is TRUE for rows that violate it.
  *
  * Rules are pure `Column` predicates — data, not code — so any number of
  * them fuse into a single projection under whole-stage codegen. This is
  * the redesign of the reference's one-Spark-job-per-rule pattern
  * (`/root/reference/src/price_zone/validator.py:8-90`, invoked at
  * `/root/reference/src/price_zone/transform_spark_job.py:66-82`, ≥14 full
  * input scans) into one scan (SURVEY.md §4.2).
  */
final case class ValidationRule(name: String, invalid: Column) {
  /** Flag column emitted into the flagged projection. */
  def flagName: String = s"_viol_$name"
  /** Null predicate results count as "not invalid" (SQL filter semantics
    * in the reference would drop null-predicate rows from the invalid
    * set; coalesce reproduces that). */
  def flag: Column = coalesce(invalid, lit(false)).as(flagName)
}

/** The reference's validator library (F1–F7 in SURVEY.md §2.3) as rule
  * constructors. Constants from
  * `/root/reference/src/price_zone/constants.py:1-9`.
  */
object Rules {

  import org.apache.spark.sql.GraftColumnBridge.{column => bridged, expression => exprOf}
  import graft.functions.expressions.{DateFormatMatches, HasNonDigit, ParseableTimestamp}

  /** Anchored datetime regex, verbatim semantics of
    * `/root/reference/src/price_zone/constants.py:7`. */
  val DateFormatRegex: String =
    "^([0-9]{4})-(1[0-2]|0[1-9])-(3[01]|0[1-9]|[12][0-9]) (2[0-3]|[01][0-9]):([0-5][0-9]):([0-5][0-9])(.([0-9])+)?$"

  val CustNbrLength = 14
  val CoNbrLength = 3
  val SupcLength = 9
  val PriceZoneMin = 1
  val PriceZoneMax = 5
  val InputTimestampFormat = "yyyy-MM-dd HH:mm:ss"

  /** F1 `validate_column` — non-null, non-empty, digits-only
    * (`validator.py:16-21`). The reference also ORs `isnan`, a no-op on
    * digit-checked strings ('NaN' already fails the regex). The digit
    * check runs as the [[graft.functions.expressions.HasNonDigit]] byte
    * kernel — `rlike("[^0-9]")` semantics at ~a tenth of the regex cost
    * (`ValidationKernelSpec` pins the equivalence). */
  def nonNullNumeric(c: String): ValidationRule = ValidationRule(
    s"${c}_nonnull_numeric",
    col(c).isNull || col(c) === lit("") || bridged(HasNonDigit(exprOf(col(c)))))

  /** F2 `validate_opcos` — membership in the active set
    * (`validator.py:8-13`). The literal set is tiny (SSM param) so an
    * `isin` broadcast literal beats a join at any scale. */
  def memberOf(c: String, allowed: Seq[String]): ValidationRule = ValidationRule(
    s"${c}_membership",
    col(c).isNull || !col(c).isin(allowed: _*))

  /** F3 `validate_column_length_less_than` (`validator.py:35-43`). */
  def maxLength(c: String, n: Int): ValidationRule = ValidationRule(
    s"${c}_maxlen_$n",
    length(col(c)) > lit(n))

  /** F4 `validate_column_length_equals` — strict variant that the
    * reference raises on (`validator.py:46-53`); we model it as a rule
    * and let the caller decide strictness. */
  def lengthEquals(c: String, n: Int): ValidationRule = ValidationRule(
    s"${c}_len_eq_$n",
    length(col(c)) =!= lit(n))

  /** F5 `validate_data_range` (`validator.py:56-66`). Applied post-cast
    * in the reference; try_cast keeps Spark 4 ANSI mode from throwing on
    * junk (junk is caught by nonNullNumeric, matching the reference's
    * rule ordering at `transform_spark_job.py:66-82`). */
  def intRange(c: String, min: Int, max: Int): ValidationRule = ValidationRule(
    s"${c}_range_${min}_$max",
    expr(s"try_cast($c AS INT)") < lit(min) || expr(s"try_cast($c AS INT)") > lit(max))

  /** F6 `validate_date_format` (`validator.py:69-79`). The default
    * regex runs as the [[graft.functions.expressions.DateFormatMatches]]
    * byte walk (same booleans, including Java regex's `$`-before-final-
    * newline and unescaped-`.` quirks — see the kernel's scaladoc and
    * `ValidationKernelSpec`); a caller-supplied regex uses `rlike`. */
  def dateFormat(c: String, regex: String = DateFormatRegex): ValidationRule = ValidationRule(
    s"${c}_date_format",
    col(c).isNull ||
      (if (regex == DateFormatRegex) !bridged(DateFormatMatches(exprOf(col(c))))
       else !col(c).rlike(regex)))

  /** F7 `validate_date_time_field` — semantic (calendar) validity: the
    * regex passes 2020-02-30, the parser does not (`validator.py:82-90`).
    * The reference parses on Spark 2.4 which ignores a trailing
    * fractional part; we strip it explicitly before try_to_timestamp. */
  def parseableTimestamp(c: String, fmt: String = InputTimestampFormat): ValidationRule =
    ValidationRule(
      s"${c}_parseable_ts",
      // default format: the ParseableTimestamp byte kernel (strict
      // four-field parse + proleptic-Gregorian calendar check, exactly
      // try_to_timestamp's accept set — ValidationKernelSpec). Null
      // input must flag invalid, hence the explicit isNull arm (the
      // original IsNull(try_to_timestamp(..)) was never null itself).
      if (fmt == InputTimestampFormat)
        col(c).isNull || !bridged(ParseableTimestamp(exprOf(col(c))))
      else
        try_to_timestamp(substring_index(col(c), ".", 1), lit(fmt)).isNull)

  /** Column expression matching F7's parse: seconds-precision timestamp
    * from `yyyy-MM-dd HH:mm:ss[.fraction]`
    * (`transform_spark_job.py:81`). */
  def parsedTimestamp(c: String, fmt: String = InputTimestampFormat): Column =
    try_to_timestamp(substring_index(col(c), ".", 1), lit(fmt))
}
