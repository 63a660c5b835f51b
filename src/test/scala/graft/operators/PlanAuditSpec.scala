package graft.operators

import graft.SparkSpec

/** Physical-plan regression audit: the properties that make these plans
  * survive a 100 TB scale-up, asserted so a refactor can't silently
  * lose them.
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def executed(name: String): String =
    graft.SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  private def optimized(name: String): String =
    graft.SparkEntry.queries(name)(spark, dir).queryExecution.optimizedPlan.toString

  test("q2: filters and projection reach the parquet scan") {
    val plan = executed("q2_filter_project")
    // (the toString elides long pushed-filter lists — prefix + the
    // scan-level DataFilters entry are the stable evidence)
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"), plan)
    assert(plan.contains("DataFilters: [isnotnull(l_shipdate"), plan)
    // pruned read schema — no columns beyond the 6 needed
    val read = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(!read.contains("l_returnflag") && !read.contains("l_tax"), read)
  }

  test("q3: all three dimension joins broadcast; fact side never shuffles for the join") {
    val plan = executed("q3_join_broadcast")
    assert("BroadcastHashJoin".r.findAllIn(plan).size === 3, plan)
    // the only Exchanges are broadcasts + the final aggregation/sort
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q7: global top-k compiles to TakeOrderedAndProject, not a full sort") {
    val plan = executed("q7_topk")
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("q4/q5: semi and anti joins stay semi/anti (no materialized subquery)") {
    assert(executed("q4_semi_join").contains("LeftSemi"), executed("q4_semi_join"))
    assert(executed("q5_anti_join").contains("LeftAnti"), executed("q5_anti_join"))
  }

  test("v3: group removal is a broadcast anti-join over the failed-group aggregate") {
    val plan = executed("v3_valid_by_opco")
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"), plan)
  }

  test("s1: query set is broadcast; candidates stream map-side") {
    val plan = executed("s1_topk_brute")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"), plan)
  }

  test("similarity codegen expression stays fused (no CodegenFallback in hot path)") {
    val plan = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(graft.similarity.Similarity.dotF(
        org.apache.spark.sql.functions.col("embedding"),
        org.apache.spark.sql.functions.col("embedding")).as("d"))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("float_dot") && l.trim.startsWith("*(")), plan)
  }

  test("d2: minhash aggregates map-side (partial_min) before the shuffle") {
    val plan = executed("d2_minhash_pairs")
    assert(plan.contains("partial_min") || plan.contains("HashAggregate"), plan)
    // band-key join is an equi-join, never a cartesian
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("d4: pfp self-join is a shuffled hash join, never a driver-side broadcast of shingle arrays") {
    val plan = executed("d4_jaccard_pairs")
    assert(plan.contains("ShuffledHashJoin"), plan)
    assert(!plan.contains("BroadcastHashJoin"), plan)
  }

  test("d7: tiny eval gram set broadcasts into a left-semi join; corpus grams never shuffle") {
    val plan = executed("d7_contamination")
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("d6: simhash banding joins on a long key (no string band keys in the plan)") {
    val plan = executed("d6_simhash_pairs")
    assert(plan.contains("simhash_sig"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("t10: packing window partitions by source (per-shard, not a single global sort)") {
    val plan = executed("t10_packing")
    // a global window would show an empty partition spec / SinglePartition
    assert(plan.contains("windowspecdefinition(source"), plan)
    assert(!plan.contains("SinglePartition"), plan)
  }

  test("t7/t11: per-row kernels keep the repetition and quality passes shuffle-light") {
    val t7 = executed("t7_repetition")
    assert(t7.contains("top_shingle_stats"), t7)
    // one aggregate for the histogram; no join remains
    assert(!t7.contains("Join"), t7)
  }

  /** Unwrap the AQE root so node-level traversal sees the real plan. */
  private def physical(name: String): org.apache.spark.sql.execution.SparkPlan =
    graft.SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }

  test("s7: IVF corpus side streams into the rerank join with zero Exchange") {
    import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
    import org.apache.spark.sql.execution.exchange.Exchange
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val plan = physical("s7_topk_ivf")
    val bhjs = plan.collect { case j: BroadcastHashJoinExec => j }
    assert(bhjs.nonEmpty, plan.toString)
    // the rerank join: assigned corpus vectors ⋈ broadcast(probed queries).
    // The corpus (streamed) side must be map-only — centroid assignment
    // against literals, no shuffle, no join — or the IVF loses its
    // zero-vector-shuffle scale property.
    val rerank = bhjs.head
    val streamed = rerank.buildSide match {
      case BuildRight => rerank.left
      case BuildLeft  => rerank.right
    }
    val exchanges = streamed.collect { case e: Exchange => e }
    assert(exchanges.isEmpty, streamed.toString)
  }

  test("d7b: bloom prefilter is map-side — corpus reaches the confirm join with zero Exchange") {
    import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
    import org.apache.spark.sql.execution.exchange.Exchange
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val plan = physical("d7b_bloom_contamination")
    assert(plan.toString.contains("might_contain"), plan.toString)
    val semis = plan.collect {
      case j: BroadcastHashJoinExec if j.joinType.sql == "LEFT SEMI" => j
    }
    assert(semis.nonEmpty, plan.toString)
    val streamed = semis.head.buildSide match {
      case BuildRight => semis.head.left
      case BuildLeft  => semis.head.right
    }
    // the filtered gram stream flows map-side into the confirm join —
    // any Exchange here would mean the corpus shuffled before confirm
    assert(streamed.collect { case e: Exchange => e }.isEmpty, streamed.toString)
    // and the bloom prefilter sits below the join, not above it
    assert(streamed.toString.contains("might_contain"), streamed.toString)
  }

  test("sk1: certification scan prunes the fingerprint (md5 computed on profile side only)") {
    val plan = executed("sk1_sketches")
    // two scans of documents, but the regex+md5 fingerprint must be
    // projected exactly once — the join-back pass needs only toks
    assert("regexp_replace".r.findAllIn(plan).size === 1, plan)
  }

  test("s10: TopK aggregates map-side (partial_topk) — exchange carries answers, not candidates") {
    val plan = executed("s10_knn_graph")
    // the typed aggregator must run in partial mode below the exchange,
    // or the shuffle reverts to carrying every candidate pair
    assert(plan.contains("partial_topk"), plan.take(3000))
  }

  test("t17: pair counts combine map-side before the exchange") {
    val plan = executed("t17_bpe_pairs")
    assert(plan.contains("partial_count"), plan.take(3000))
  }

  test("x9: island groupBys reuse the o_custkey window partitioning (no composite-key exchange)") {
    val plan = executed("x9_scd2_merge")
    // HashPartitioning(o_custkey) satisfies the (o_custkey, island,
    // status) clustering, so the aggregates after each window must NOT
    // introduce an exchange hashed on the composite key
    assert(!"hashpartitioning\\(o_custkey#\\d+L?, island".r.findFirstIn(plan).isDefined,
      plan.take(3000))
    assert(plan.contains("Window"), plan.take(500))
  }

  test("x10: interval overlap runs as a hash join on the bin key, not a nested loop") {
    val plan = executed("x10_overlap_join")
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(plan.contains("HashJoin"), plan.take(3000))
  }

  test("q22: correlated subqueries decorrelate (no per-row subquery execution)") {
    val plan = executed("q22_corr_subquery")
    // scalar subquery → aggregate + outer join; NOT EXISTS → (null-aware)
    // anti join. A surviving correlated-subquery node would mean per-row
    // re-execution.
    assert(plan.contains("LeftAnti"), plan.take(3000))
    assert(plan.contains("LeftOuter"), plan.take(3000))
    assert(!plan.toLowerCase.contains("scalar-subquery"), plan.take(3000))
  }

  test("v6: partition-column re-padding survives a schema-inference change") {
    val key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    val orig = spark.conf.get(key)
    try {
      spark.conf.set(key, "false") // partition values come back as strings
      val off = graft.SparkEntry.queries("v6_roundtrip")(spark, dir).collect()
      assert(off.nonEmpty && off.forall(_.getString(0).length == 3),
        off.map(_.getString(0)).mkString(","))
      spark.conf.set(key, "true") // …or inferred as ints; output identical
      val on = graft.SparkEntry.queries("v6_roundtrip")(spark, dir).collect()
      assert(off.map(_.toString).sorted === on.map(_.toString).sorted)
    } finally spark.conf.set(key, orig)
  }
}
