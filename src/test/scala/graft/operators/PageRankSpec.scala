package graft.operators

import graft.SparkSpec

/** Pins s13's fixed-point PageRank on graphs whose rank structure is
  * known by hand: mass conservation within the floor-division loss
  * bound, hub dominance on a star, symmetry on a cycle, isolated-node
  * handling via the self-edge, and bit-exact determinism across runs
  * (the property the integer arithmetic exists to provide).
  */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private val S = 1000000000000L

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)], iters: Int = 5) =
    SimilarityQueries.pageRank(
      nodes.toDF("vec_id"),
      edges.toDF("vec_id", "nbr_id"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("star graph: the hub out-ranks every leaf") {
    // 4 leaves each point only at the hub; the hub points back at one
    // leaf. All leaf mass funnels into the hub every round.
    val ranks = run(
      nodes = Seq(0L, 1L, 2L, 3L, 4L),
      edges = Seq(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L, 0L -> 1L))
    val hub = ranks(0L)
    assert(Seq(2L, 3L, 4L).forall(l => hub > ranks(l)),
      s"hub must dominate non-favored leaves: $ranks")
    assert(ranks(1L) > ranks(2L), "the leaf the hub points at inherits hub mass")
    assert(ranks(2L) == ranks(3L) && ranks(3L) == ranks(4L),
      "symmetric leaves must tie exactly (integer arithmetic, no drift)")
  }

  test("directed cycle: perfect symmetry, every node holds exactly the uniform share") {
    val ranks = run(
      nodes = Seq(1L, 2L, 3L, 4L),
      edges = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L))
    assert(ranks.values.toSet.size == 1, s"cycle ranks must all tie: $ranks")
    // deg=1 everywhere means no division loss inside the loop;
    // the only floor loss is the S/N init and the damping split
    val share = ranks.values.head
    assert(math.abs(share - S / 4) <= 2, s"share $share should stay ~S/4")
  }

  test("mass is conserved within the floor-division loss bound") {
    // every floor division loses < 1 unit per (node, round) on the
    // damping terms plus < 1 per edge on the contribution split
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L)
    val edges = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 4L -> 5L, 5L -> 4L,
      1L -> 4L, 2L -> 5L)
    val ranks = run(nodes, edges)
    val total = ranks.values.sum
    val lossBound = 5L * (2L * nodes.size + edges.size + nodes.size)
    assert(total <= S && total >= S - lossBound,
      s"total mass $total outside [$S - $lossBound, $S]")
  }

  test("isolated node self-edges: it keeps recycling its own mass, no crash, no zero") {
    val ranks = run(nodes = Seq(1L, 2L, 9L), edges = Seq(1L -> 2L, 2L -> 1L))
    assert(ranks(9L) > 0L)
    // a self-recycling node converges to ~its initial share
    assert(math.abs(ranks(9L) - S / 3) <= 10, s"isolated rank drifted: ${ranks(9L)}")
  }

  test("bit-exact determinism: two runs produce identical maps") {
    val nodes = (1L to 40L).toSeq
    val edges = nodes.flatMap(i => Seq(i -> (i % 40 + 1), i -> ((i * 7) % 40 + 1)))
    assert(run(nodes, edges) === run(nodes, edges))
  }
}
