package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Equivalence spec for the [[graft.functions.expressions.LcsLength]]
  * codegen kernel: the generated rolling-row DP must agree with a
  * straightforward full-table Scala reference on hand cases and on
  * randomized corpora (both the codegen path, exercised through a
  * DataFrame, and the interpreted `nullSafeEval` path, exercised via
  * direct expression evaluation). Null elements fail fast — the dot-
  * kernel contract. */
class LcsLengthKernelSpec extends SparkSpec {

  private def refLcs(a: Seq[String], b: Seq[String]): Long = {
    val dp = Array.ofDim[Long](a.length + 1, b.length + 1)
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) =
        if (a(i - 1) == b(j - 1)) dp(i - 1)(j - 1) + 1
        else math.max(dp(i - 1)(j), dp(i)(j - 1))
    dp(a.length)(b.length)
  }

  private def evalInterpreted(a: Seq[String], b: Seq[String]): Long = {
    import org.apache.spark.sql.catalyst.CatalystTypeConverters.convertToCatalyst
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, StringType}
    graft.functions.expressions.LcsLength(
      Literal(convertToCatalyst(a.toArray), ArrayType(StringType)),
      Literal(convertToCatalyst(b.toArray), ArrayType(StringType)))
      .eval(null).asInstanceOf[Long]
  }

  test("hand cases: empty, identity, disjoint, interleave, repeats") {
    val cases = Seq(
      (Seq.empty[String], Seq.empty[String], 0L),
      (Seq("a", "b", "c"), Seq.empty[String], 0L),
      (Seq("a", "b", "c"), Seq("a", "b", "c"), 3L),
      (Seq("a", "b", "c"), Seq("x", "y", "z"), 0L),
      (Seq("a", "x", "b", "y", "c"), Seq("a", "b", "c"), 3L),
      // order-awareness: the t54 n-gram tie this kernel breaks
      (Seq("fast", "stream"), Seq("stream", "fast"), 1L),
      (Seq("a", "a", "b", "a"), Seq("a", "b", "a", "a"), 3L))
    cases.foreach { case (a, b, want) =>
      assert(evalInterpreted(a, b) == want, s"$a vs $b")
      assert(evalInterpreted(b, a) == want, s"symmetric $b vs $a")
      assert(refLcs(a, b) == want, s"reference disagrees on $a vs $b")
    }
  }

  test("randomized corpus: codegen DataFrame path == Scala reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260816L)
    val vocab = Vector("a", "b", "c", "d", "e")
    val rows = (1 to 200).map { id =>
      val n = rnd.nextInt(13)
      val m = rnd.nextInt(13)
      (id.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))),
        Seq.fill(m)(vocab(rnd.nextInt(vocab.size))))
    }
    val got = rows.toDF("id", "ta", "tb")
      .repartition(5) // multi-partition: through real codegen tasks
      .withColumn("l", TextFunctions.lcsLength(col("ta"), col("tb")))
      .select(col("id"), col("l")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, a, b) =>
      assert(got(id) == refLcs(a, b), s"row $id: $a vs $b")
      assert(evalInterpreted(a, b) == refLcs(a, b), s"interpreted row $id")
    }
  }

  test("null elements fail fast (no silent zero-alignment)") {
    import spark.implicits._
    val df = Seq((Seq("a", null.asInstanceOf[String], "b"), Seq("a", "b")))
      .toDF("ta", "tb")
      .withColumn("l", TextFunctions.lcsLength(col("ta"), col("tb")))
    val e = intercept[Exception](df.collect())
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.toString +: chain(x.getCause))
    assert(chain(e).exists(_.contains("null element at index")),
      s"expected a null-element failure, got: $e")
  }

  test("null elements fail fast even when the OPPOSITE array is empty") {
    // Degenerate cases the in-loop checks could never reach (ADVICE
    // r8): with n==0 the outer loop never runs (neither side checked);
    // with m==0 the inner loop never runs (right side unchecked). The
    // up-front scan must still raise on BOTH paths — interpreted and
    // codegen.
    import spark.implicits._
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.toString +: chain(x.getCause))
    val cases = Seq(
      (Seq(null.asInstanceOf[String]), Seq.empty[String]),   // m==0, left null
      (Seq.empty[String], Seq(null.asInstanceOf[String])),   // n==0, right null
      (Seq("a"), Seq(null.asInstanceOf[String])))            // m>0, right null
    cases.foreach { case (a, b) =>
      val e = intercept[Exception] {
        Seq((a, b)).toDF("ta", "tb")
          .withColumn("l", TextFunctions.lcsLength(col("ta"), col("tb")))
          .collect()
      }
      assert(chain(e).exists(_.contains("null element at index")),
        s"codegen: expected null-element failure for $a vs $b, got: $e")
      val ei = intercept[Exception] {
        import org.apache.spark.sql.catalyst.CatalystTypeConverters.convertToCatalyst
        import org.apache.spark.sql.catalyst.expressions.Literal
        import org.apache.spark.sql.types.{ArrayType, StringType}
        graft.functions.expressions.LcsLength(
          Literal(convertToCatalyst(a.toArray), ArrayType(StringType)),
          Literal(convertToCatalyst(b.toArray), ArrayType(StringType)))
          .eval(null)
      }
      assert(chain(ei).exists(_.contains("null element at index")),
        s"interpreted: expected null-element failure for $a vs $b, got: $ei")
    }
  }
}
