package graft.functions

import graft.SparkSpec
import graft.functions.expressions.AhoCorasick
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Equivalence spec for the [[graft.functions.expressions.MultiPatternCount]]
  * Aho–Corasick kernel: the automaton's one-pass count must agree with
  * a naive all-positions reference on hand cases (overlaps, nesting,
  * multi-byte UTF-8) and randomized corpora, on both the interpreted
  * and codegen paths; and the t58 gate's pattern list must stay
  * BORDER-FREE, the property that makes the oracle's non-overlapping
  * length/replace restatement exact.
  */
class MultiPatternCountSpec extends SparkSpec {

  /** naive reference: all start positions, all patterns, overlapping */
  private def refCount(text: String, pats: Seq[String]): Long = {
    val bytes = text.getBytes("UTF-8")
    pats.map { p =>
      val pb = p.getBytes("UTF-8")
      (0 to bytes.length - pb.length).count { i =>
        var j = 0
        while (j < pb.length && bytes(i + j) == pb(j)) j += 1
        j == pb.length
      }.toLong
    }.sum
  }

  private def acCount(text: String, pats: Seq[String]): Long =
    new AhoCorasick(pats).count(UTF8String.fromString(text))

  test("hand cases: overlaps, nesting, shared prefixes, utf-8 safety") {
    val cases = Seq(
      // self-overlap: "aa" in "aaaa" = 3 occurrences
      ("aaaa", Seq("aa"), 3L),
      // nesting: "ab" inside "aab"; both end at the same position
      ("aab", Seq("ab", "aab"), 2L),
      // failure-link emission: "she" contains "he"
      ("ushers", Seq("he", "she", "hers"), 3L),
      // shared prefixes in the trie
      ("abcabc", Seq("abc", "abcd"), 2L),
      // phrase across spaces
      ("fast table fast table", Seq("fast table"), 2L),
      // no match
      ("xyz", Seq("abc"), 0L),
      // multi-byte text, ASCII pattern: continuation bytes never match
      ("caté data café data", Seq("data", "té"), 3L),
      ("", Seq("a"), 0L))
    cases.foreach { case (text, pats, want) =>
      assert(acCount(text, pats) == want, s"'$text' vs $pats")
      assert(refCount(text, pats) == want, s"reference disagrees: '$text'")
    }
  }

  test("randomized corpus: automaton == naive reference, both eval paths") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260817L)
    val alphabet = "abcd "
    val pats = Seq("ab", "abc", "ca b", "dd", "b", "a a")
    val rows = (1 to 300).map { id =>
      (id.toLong,
        Seq.fill(1 + rnd.nextInt(60))(alphabet(rnd.nextInt(alphabet.length)))
          .mkString)
    }
    // codegen path through a multi-partition DataFrame
    val got = rows.toDF("id", "text").repartition(5)
      .withColumn("hits", TextFunctions.multiPatternCount(col("text"), pats))
      .select(col("id"), col("hits")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, text) =>
      val want = refCount(text, pats)
      assert(got(id) == want, s"codegen row $id: '$text'")
      assert(acCount(text, pats) == want, s"interpreted row $id: '$text'")
    }
  }

  test("t58's pattern list is border-free (oracle-exactness precondition)") {
    graft.operators.TextQueries.t58Patterns.foreach { p =>
      (1 until p.length).foreach { k =>
        assert(p.take(k) != p.takeRight(k),
          s"pattern '$p' has border of length $k — its overlapping AC " +
            "count would exceed the oracle's non-overlapping count")
      }
    }
  }

  test("null text stays null; empty pattern set rejected") {
    import spark.implicits._
    val r = Seq((1L, Option("data")), (2L, Option.empty[String]))
      .toDF("id", "text")
      .withColumn("hits",
        TextFunctions.multiPatternCount(col("text"), Seq("data")))
      .orderBy(col("id")).collect()
    assert(r(0).getLong(2) == 1L)
    assert(r(1).isNullAt(2))
    intercept[IllegalArgumentException](new AhoCorasick(Seq.empty))
    intercept[IllegalArgumentException](new AhoCorasick(Seq("")))
  }
}
