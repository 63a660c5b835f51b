package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions registers float_dot for plain SQL") {
    // extensions only apply at session creation — isolate from any
    // shared suite session (later suites lazily recreate their own)
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val d = spark.sql(
        "SELECT float_dot(array(cast(1.0 as float), cast(2.0 as float)), " +
          "array(cast(3.0 as float), cast(4.0 as float))) AS d")
        .head().getDouble(0)
      assert(d === 11.0)
      // registered with documentation
      val desc = spark.sql("DESCRIBE FUNCTION float_dot").collect().map(_.getString(0)).mkString("\n")
      assert(desc.contains("float_dot"))
      val sig = spark.sql(
        "SELECT minhash_sig(split('a b c d', ' '), 3, 8) AS s")
        .head().getSeq[String](0)
      assert(sig.length === 8 && sig.forall(_.length == 4))
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
