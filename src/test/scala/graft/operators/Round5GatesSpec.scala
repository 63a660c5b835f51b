package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariants for the round-5 additions that the hash-match oracles
  * can't express directly: cross-gate consistency (weighted vs unweighted
  * reachability), state boundedness (last-N ring), and bucket-range
  * totals (feature hashing).
  */
class Round5GatesSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("s17 weighted distances dominate s16 hop counts on the same graph") {
    val hops = SimilarityQueries.queries("s16_bfs_hops")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wdist = SimilarityQueries.queries("s17_weighted_paths")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hops.keySet === wdist.keySet)
    hops.foreach { case (v, h) =>
      val d = wdist(v)
      // same seed set, same 6-round horizon, weights in [1,9]:
      // reachability agrees, and h <= d <= 9h for every reachable node
      if (h == -1L) assert(d === -1L, s"vec $v: BFS unreachable but weighted reached")
      else assert(d >= h && d <= 9 * math.max(h, 0) || (h == 0 && d == 0),
        s"vec $v: hops $h, weighted $d out of [h, 9h]")
    }
  }

  test("st14 recent ring is truncated to 5 and consistent with the count") {
    val out = StreamingQueries.queries("st14_tws_lastn")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = r.getLong(1)
      val ids = r.getString(2).split(",").filter(_.nonEmpty)
      assert(ids.length <= 5, s"user ${r.getLong(0)}: ring ${ids.length} > 5")
      assert(ids.length === math.min(n, 5L).toInt,
        s"user ${r.getLong(0)}: $n events but ring ${ids.length}")
      assert(ids.distinct.length === ids.length, "duplicate ids in ring")
    }
  }

  test("t29 buckets cover [0,64) and signed mass is bounded by L1 mass") {
    val rows = TextQueries.queries("t29_feature_hash")(spark, dir).collect()
    assert(rows.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 64))
    rows.foreach { r =>
      assert(math.abs(r.getLong(2)) <= r.getLong(3),
        s"bucket ${r.getLong(0)}: |sum_w| > l1")
    }
  }

  test("v14 checksums are invariant under partitioning (order independence)") {
    val a = ValidationQueries.queries("v14_partition_checksums")(spark, dir).collect()
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    val b = try ValidationQueries.queries("v14_partition_checksums")(spark, dir).collect()
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq,
      "signatures must not depend on partition count or row order")
  }

  test("q35 cumulative curve ends at the total distinct-user count") {
    val rows = RelationalQueries.queries("q35_running_distinct")(spark, dir).collect()
    val total = graft.Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .select(col("user_id")).distinct().count()
    assert(rows.last.getLong(2) === total)
    assert(rows.map(_.getLong(1)).sum === total)
    // cumulative sum is nondecreasing and consistent with n_new
    rows.foldLeft(0L) { (acc, r) =>
      val next = acc + r.getLong(1)
      assert(r.getLong(2) === next); next
    }
  }

  test("t28 postings are ascending, bounded at 20, and df-consistent") {
    TextQueries.queries("t28_inverted_index")(spark, dir).collect().foreach { r =>
      val df = r.getLong(1)
      val posting = r.getString(3).split(",").filter(_.nonEmpty).map(_.toLong)
      assert(posting.length <= 20)
      assert(posting.length === math.min(df, 20L).toInt)
      assert(posting.sameElements(posting.sorted), "postings not ascending")
      assert(r.getLong(2) >= df, "tf < df impossible")
    }
  }
}
