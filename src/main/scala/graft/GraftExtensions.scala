package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.expressions.{DateFormatMatches, FloatDotProduct, HasNonDigit,
  LangId, LongDotProduct, MinHashSig, ParseableTimestamp, ShingleHashes, SimHashSig,
  TopShingleStats, WinnowFps}

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

    e.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(
        classOf[MinHashSig].getName, null, "minhash_sig",
        "minhash_sig(tokens, shingleN, k) - per-row MinHash signature over word shingles",
        ""),
      (children: Seq[Expression]) => {
        def intArg(e: Expression, name: String): Int = e match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"minhash_sig: $name must be an integer literal, got $other")
        }
        MinHashSig(children.head,
          intArg(children(1), "shingleN"), intArg(children(2), "k"))
      }))

    e.injectFunction((
      FunctionIdentifier("simhash_sig"),
      new ExpressionInfo(
        classOf[SimHashSig].getName, null, "simhash_sig",
        "simhash_sig(tokens) - per-row 63-bit packed SimHash signature (codegen)",
        ""),
      (children: Seq[Expression]) => SimHashSig(children.head)))

    e.injectFunction((
      FunctionIdentifier("long_dot"),
      new ExpressionInfo(
        classOf[LongDotProduct].getName, null, "long_dot",
        "long_dot(a, b) - exact dot product of two array<bigint> vectors (codegen)",
        ""),
      (children: Seq[Expression]) => LongDotProduct(children.head, children(1))))

    e.injectFunction((
      FunctionIdentifier("top_shingle_stats"),
      new ExpressionInfo(
        classOf[TopShingleStats].getName, null, "top_shingle_stats",
        "top_shingle_stats(tokens, n) - struct(maxc, total) n-gram frequency stats (codegen)",
        ""),
      (children: Seq[Expression]) => {
        val n = children(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"top_shingle_stats: n must be an integer literal, got $other")
        }
        TopShingleStats(children.head, n)
      }))

    e.injectFunction((
      FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(
        classOf[ShingleHashes].getName, null, "shingle_hashes",
        "shingle_hashes(tokens, n) - distinct word n-gram 64-bit hashes (codegen)",
        ""),
      (children: Seq[Expression]) => {
        val n = children(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"shingle_hashes: n must be an integer literal, got $other")
        }
        ShingleHashes(children.head, n)
      }))

    e.injectFunction((
      FunctionIdentifier("winnow_fps"),
      new ExpressionInfo(
        classOf[WinnowFps].getName, null, "winnow_fps",
        "winnow_fps(tokens, k, w) - distinct winnowing fingerprints (md5 window minima, codegen)",
        ""),
      (children: Seq[Expression]) => {
        def intArg(e: Expression, name: String): Int = e match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"winnow_fps: $name must be an integer literal, got $other")
        }
        WinnowFps(children.head, intArg(children(1), "k"), intArg(children(2), "w"))
      }))

    e.injectFunction((
      FunctionIdentifier("cdc_boundaries"),
      new ExpressionInfo(
        classOf[graft.functions.expressions.CdcBoundaries].getName, null,
        "cdc_boundaries",
        "cdc_boundaries(text, w) - content-defined chunk boundary positions (md5 window, 1/8 condition, codegen)",
        ""),
      (children: Seq[Expression]) => {
        val w = children(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"cdc_boundaries: w must be an integer literal, got $other")
        }
        graft.functions.expressions.CdcBoundaries(children.head, w)
      }))

    Seq[(String, String, String, Expression => Expression)](
      ("has_non_digit", classOf[HasNonDigit].getName,
        "true iff any char is not an ASCII digit (rlike '[^0-9]')", HasNonDigit.apply),
      ("date_format_matches", classOf[DateFormatMatches].getName,
        "reference date-format regex as a byte walk", DateFormatMatches.apply),
      ("parseable_timestamp", classOf[ParseableTimestamp].getName,
        "strict yyyy-MM-dd HH:mm:ss calendar-validity check", ParseableTimestamp.apply),
      ("lang_id", classOf[LangId].getName,
        "stopword/CJK language-ID heuristic (zh/en/de/es/fr/und)", LangId.apply)
    ).foreach { case (name, cls, usage, build) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(cls, null, name, s"$name(s) - $usage", ""),
        (children: Seq[Expression]) => build(children.head)))
    }

    // optimizer rule: length-difference guard in front of thresholded
    // levenshtein filters (see the rule's doc for soundness/idempotence)
    e.injectOptimizerRule(_ => graft.plans.LevenshteinGuardRule)

    // optimizer rule: redundant self-join elimination — an inner join
    // of the same relation on a provably-unique key collapses to one
    // copy (conf-gated: spark.graft.selfJoin.eliminate)
    e.injectOptimizerRule(_ => graft.plans.SelfJoinElimination)

    // optimizer rule: eager aggregation — a GROUP BY over an inner
    // equi-join with a provably-unique far side pushes the whole
    // aggregate below the join (conf-gated: spark.graft.eagerAggregation)
    e.injectOptimizerRule(_ => graft.plans.AggregatePushThroughJoin)

    // optimizer rule: redundant-DISTINCT elimination — a grouping-only
    // aggregate over a relation whose output provably contains a
    // per-row-unique key collapses to a Project (conf-gated:
    // spark.graft.distinct.eliminate)
    e.injectOptimizerRule(_ => graft.plans.DistinctElimination)

    // planner strategy: the native backward as-of join (custom logical
    // node → sort-merge AsOfJoinExec; graft.operators.AsOf also
    // self-registers it per-session for extension-less sessions)
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // ...and its filter pushdown (Catalyst's own pushdown only knows
    // Join nodes; left-side predicates commute with the as-of join)
    e.injectOptimizerRule(_ => graft.plans.AsOfJoinFilterPushdown)
    // ...and column pruning through the node (narrow projections must
    // reach both child scans' ReadSchema)
    e.injectOptimizerRule(_ => graft.plans.AsOfJoinColumnPruning)
    // ...and the SQL auto-rewrite: the standard as-of idiom (equi +
    // time-bound join topped by row_number() = 1 per left row)
    // re-plans onto the native operator with no API change
    // (conf-gated: spark.graft.asOfJoin.autoRewrite)
    e.injectOptimizerRule(_ => graft.plans.AsOfJoinAutoRewrite)
    // ...and the AGGREGATE spelling of the same idiom: max_by/min_by
    // over the equi + time-bound join, grouped by a provably-unique
    // left key, re-plans onto the same native node
    e.injectOptimizerRule(_ => graft.plans.AsOfAggregateRewrite)

    // planner strategy: the native keyed point-in-interval join
    // (sort-merge active-set sweep; graft.operators.Interval also
    // self-registers it per-session for extension-less sessions)
    e.injectPlannerStrategy(_ => graft.plans.IntervalJoinStrategy)
    // ...and its optimizer rules: BOTH-side filter pushdown (the join
    // is inner — each output row references exactly one row per side)
    // and column pruning down to the scans' ReadSchema
    e.injectOptimizerRule(_ => graft.plans.IntervalJoinFilterPushdown)
    e.injectOptimizerRule(_ => graft.plans.IntervalJoinColumnPruning)
    // ...and the SQL auto-rewrite: plain `l.k = r.k AND t BETWEEN lo
    // AND hi` inner joins re-plan onto the native sweep with no API
    // change (conf-gated: spark.graft.intervalJoin.autoRewrite)
    e.injectOptimizerRule(_ => graft.plans.IntervalJoinAutoRewrite)
    // ...and runtime Bloom-filter injection for BOTH native joins:
    // Spark's InjectRuntimeFilter pattern-matches Join and never sees
    // the custom nodes, so the selective-small-side pruning it gives
    // equi-joins is re-planted here (size-gated, conf-killable:
    // spark.graft.runtimeFilter.enabled)
    e.injectOptimizerRule(_ => graft.plans.NativeJoinRuntimeFilter)
  }
}
