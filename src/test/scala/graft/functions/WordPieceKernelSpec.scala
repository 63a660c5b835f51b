package graft.functions

import graft.SparkSpec
import graft.functions.expressions.WordPieceKernel
import org.apache.spark.unsafe.types.UTF8String

/** Pins [[WordPieceKernel.tokenCount]] to an INDEPENDENT string-based
  * reference implementation of the greedy longest-match rule, on hand
  * fixtures covering each branch and on a deterministic pseudo-random
  * corpus (mixed case, digits, punctuation, multi-byte UTF-8).
  */
class WordPieceKernelSpec extends SparkSpec {

  private val vocab = WordPieceKernel.allPieces.toSet

  /** Reference: regex word split + string-slice greedy match. */
  private def reference(text: String): Long = {
    var toks = 0L
    for (word <- "[A-Za-z]+".r.findAllIn(text).map(_.toLowerCase)) {
      var p = 0
      while (p < word.length) {
        val adv = (math.min(4, word.length - p) to 1 by -1)
          .find(l => vocab.contains(word.substring(p, p + l)))
          .getOrElse(1)
        toks += 1
        p += adv
      }
    }
    toks
  }

  private def kernel(text: String): Long =
    WordPieceKernel.tokenCount(UTF8String.fromString(text))

  test("hand fixtures: greedy priority, case folding, separators") {
    // "the" is one piece (longest wins over th+e and t+he)
    assert(kernel("the") === 1L)
    assert(kernel("The THE tHe") === 3L)
    // "that" (len-4 piece) beats "tha"+"t" and "th"+"at"
    assert(kernel("that") === 1L)
    // unknown word falls back through pairs/singles: "zq" has no pair
    assert(kernel("zq") === 2L)
    // digits/punctuation/whitespace separate words, never tokenize
    assert(kernel("the1the,the the") === 4L)
    // multi-byte UTF-8 is a separator, not a letter
    assert(kernel("theéthe") === 2L)
    assert(kernel("") === 0L)
    assert(kernel("42 !!") === 0L)
    // every fixture agrees with the reference
    Seq("the", "The THE tHe", "that", "zq", "the1the,the the",
      "theéthe", "", "42 !!").foreach { s =>
      assert(kernel(s) === reference(s), s"fixture: '$s'")
    }
  }

  test("deterministic pseudo-random corpus agrees with the reference") {
    val alphabet =
      "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ 0189.,;é中"
    // pre-mod before the Knuth multiply (the repo's overflow lesson)
    def mix(i: Long): Long = ((i % 67108864L) * 2654435761L + 17) % 4294967296L
    (0 until 200).foreach { doc =>
      val len = (mix(doc) % 80 + 1).toInt
      val s = new StringBuilder
      var h = mix(doc * 31 + 7)
      (0 until len).foreach { _ =>
        h = mix(h)
        s += alphabet((h % alphabet.length).toInt)
      }
      val str = s.toString
      assert(kernel(str) === reference(str), s"doc $doc: '$str'")
    }
  }

  test("the Column wrapper matches the kernel on the documents table") {
    import org.apache.spark.sql.functions._
    val rows = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("text").isNotNull)
      .select(col("text"),
        TextFunctions.wordpieceTokens(col("text")).as("toks"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(1) === reference(r.getString(0))))
  }
}
