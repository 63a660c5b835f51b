package graft.dedup

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents
      .connectedComponents(edges.toDF("s", "d"), "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain collapses to min label") {
    assert(cc(Seq((1L, 2L), (2L, 3L), (3L, 4L))) ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("separate components keep separate labels") {
    assert(cc(Seq((5L, 6L), (1L, 2L), (2L, 3L))) ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("cycles, reversed duplicates and self-loops") {
    assert(cc(Seq((3L, 1L), (1L, 3L), (2L, 2L), (1L, 2L), (3L, 2L))) ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("string ids: component label is the lexicographic min") {
    val out = ConnectedComponents
      .connectedComponents(
        Seq(("b", "c"), ("c", "a"), ("x", "y")).toDF("s", "d"), "s", "d")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out === Map("a" -> "a", "b" -> "a", "c" -> "a", "x" -> "x", "y" -> "x"))
  }

  test("matches driver-side union-find on a pseudo-random graph") {
    // deterministic edge list: 120 nodes, ~150 edges from a fixed LCG
    var seed = 42L
    def next(mod: Int): Int = { seed = seed * 6364136223846793005L + 1442695040888963407L; ((seed >>> 33) % mod).toInt }
    val edges = Seq.fill(150)((next(120).toLong, next(120).toLong)).filter(e => e._1 != e._2)
    // union-find truth
    val parent = Array.tabulate(120)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val truth = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(n => n -> {
        // component label = min node id in component among nodes seen in edges
        val root = find(n.toInt)
        edges.flatMap(e => Seq(e._1, e._2)).distinct.filter(m => find(m.toInt) == root).min
      }).toMap
    assert(cc(edges) === truth)
  }

  test("hub skew: one node connected to many does not need collect_set") {
    val edges = (1L to 500L).map(i => (0L, i))
    val out = cc(edges)
    assert(out.size === 501 && out.values.forall(_ == 0L))
  }
}
