package graft.operators

import graft.SparkSpec

/** Pins [[TextQueries.kneserNeyDocScores]] against a local BigInt
  * reference of the interpolated-KN formula on a constructed corpus —
  * the distributed joins must reproduce the textbook statistic exactly.
  */
class KneserNeySpec extends SparkSpec {

  private val corpus = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cat ate the fish"),
    (3L, "a dog sat on a log"),
    (4L, "the dog ate"),
    (5L, "solo"), // 1 token — no transitions, must drop
    (6L, "the cat sat"))

  /** Local reference: same rational with D = 3/4, same truncating
    * integer divisions. */
  private def reference: Map[Long, (Long, Long)] = {
    val docBgs = corpus.map { case (id, text) =>
      id -> text.split(" ").toSeq.sliding(2).filter(_.size == 2)
        .map(p => (p(0), p(1))).toSeq
    }.filter(_._2.nonEmpty)
    val all = docBgs.flatMap(_._2)
    val cXY = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cX = all.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n1x = cXY.keys.toSeq.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nend = cXY.keys.toSeq.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nTypes = cXY.size.toLong
    docBgs.map { case (id, bgs) =>
      val ppms = bgs.map { case (w1, w2) =>
        val num = BigInt((4L * cXY((w1, w2)) - 3L).max(0L)) * nTypes +
          BigInt(3L) * n1x(w1) * nend(w2)
        (num * 1000000 / (BigInt(4) * cX(w1) * nTypes)).toLong
      }
      id -> (ppms.size.toLong, ppms.sum / ppms.size)
    }.toMap
  }

  test("distributed KN scores equal the local BigInt reference") {
    val ss = spark
    import ss.implicits._
    val got = TextQueries.kneserNeyDocScores(
      corpus.toDF("doc_id", "text").repartition(5))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == reference)
    assert(!got.contains(5L)) // no-transition doc dropped
  }

  test("seen-heavy transitions outscore novel ones") {
    val ss = spark
    import ss.implicits._
    val got = TextQueries.kneserNeyDocScores(corpus.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // doc 6 repeats the corpus's most common transitions ("the cat",
    // "cat sat"); doc 3 is mostly singletons.
    assert(got(6L) > got(3L))
  }
}
