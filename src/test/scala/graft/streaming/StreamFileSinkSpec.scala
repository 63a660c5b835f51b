package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** File-sink parity for the streaming gates (VERDICT r5 item 8): the
  * gate harness drains through a driver-side memory sink — bounded and
  * convenient for oracle comparison, but not the path a 100 TB run
  * takes. This spec runs the st6 pipeline (flatMapGroupsWithState
  * sessionization, event-time timeout, append mode) through the
  * parquet FILE sink and asserts the result is row-for-row identical
  * to the memory-sink gate, proving the gate's semantics are a
  * property of the query, not of the sink that happened to collect it.
  *
  * It also asserts the sink directory carries a `_spark_metadata`
  * commit log and that `spark.read` resolves the result through it —
  * the atomic-visibility contract that makes the file sink safe under
  * the mid-batch crashes `StreamCrashRecoverySpec` injects.
  */
class StreamFileSinkSpec extends SparkSpec {

  test("st6 through the parquet file sink equals the memory-sink gate") {
    val dir = "/root/testdata/sf0.001"
    val out = Files.createTempDirectory("flows_file_sink").toString
    val ckpt = Files.createTempDirectory("flows_file_ckpt").toString

    val fromFile = Streaming
      .sessionFlowCountsFile(spark, dir, gapMinutes = 30, out, ckpt)
      .orderBy(col("user_id"), col("start_tsu"))
      .collect()
    val fromMemory = graft.operators.StreamingQueries.st6(spark, dir)
      .collect()

    assert(fromFile.length == fromMemory.length,
      s"file sink ${fromFile.length} rows vs memory sink ${fromMemory.length}")
    fromFile.zip(fromMemory).zipWithIndex.foreach { case ((f, m), i) =>
      assert(f == m, s"row $i differs: file=$f memory=$m")
    }

    // The commit log must exist and govern visibility: rows read back
    // equal rows committed, through the metadata-resolved listing.
    val meta = new java.io.File(out, "_spark_metadata")
    assert(meta.exists && meta.listFiles().nonEmpty,
      "file sink wrote no _spark_metadata commit log")
  }

  test("st25 (drift monitor) through the parquet file sink equals the gate") {
    val dir = "/root/testdata/sf0.001"
    val out = Files.createTempDirectory("drift_file_sink").toString
    val ckpt = Files.createTempDirectory("drift_file_ckpt").toString
    val fromFile = Streaming
      .hourlyDriftTvdFile(spark, dir, thresholdPpm = 200000L, out, ckpt)
      .orderBy(col("hour")).collect()
    val fromMemory = graft.operators.StreamingQueries.st25(spark, dir)
      .collect()
    assert(fromFile.length == fromMemory.length,
      s"file sink ${fromFile.length} rows vs memory sink ${fromMemory.length}")
    fromFile.zip(fromMemory).zipWithIndex.foreach { case ((f, m), i) =>
      assert(f == m, s"row $i differs: file=$f memory=$m")
    }
    assert(new java.io.File(out, "_spark_metadata").exists)
  }

  test("st28 (stream-static range enrichment) through the parquet file sink equals the gate") {
    val dir = "/root/testdata/sf0.001"
    val out = Files.createTempDirectory("enrich_file_sink").toString
    val ckpt = Files.createTempDirectory("enrich_file_ckpt").toString
    val fromFile = Streaming
      .sessionEnrichedPurchasesFile(spark, dir, out, ckpt)
      .orderBy(col("user_id"), col("event_id")).collect()
    val fromMemory = graft.operators.StreamingQueries.st28(spark, dir)
      .collect()
    assert(fromFile.length == fromMemory.length,
      s"file sink ${fromFile.length} rows vs memory sink ${fromMemory.length}")
    fromFile.zip(fromMemory).zipWithIndex.foreach { case ((f, m), i) =>
      assert(f == m, s"row $i differs: file=$f memory=$m")
    }
    assert(new java.io.File(out, "_spark_metadata").exists)
  }

  test("st26 (GCRA rate limit, TWS+RocksDB) through the parquet file sink equals the gate") {
    val dir = "/root/testdata/sf0.001"
    val out = Files.createTempDirectory("rl_file_sink").toString
    val ckpt = Files.createTempDirectory("rl_file_ckpt").toString
    val fromFile = Streaming
      .rateLimitTwsFile(spark, dir, periodUs = 30000000L, out, ckpt)
      .orderBy(col("event_id")).collect()
    val fromMemory = graft.operators.StreamingQueries.st26(spark, dir)
      .collect()
    assert(fromFile.length == fromMemory.length,
      s"file sink ${fromFile.length} rows vs memory sink ${fromMemory.length}")
    fromFile.zip(fromMemory).zipWithIndex.foreach { case ((f, m), i) =>
      assert(f == m, s"row $i differs: file=$f memory=$m")
    }
    assert(new java.io.File(out, "_spark_metadata").exists)
  }
}
