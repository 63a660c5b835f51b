package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.SparkSpec

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("streaming dedup keeps first occurrence per fingerprint within watermark") {
    val in = Files.createTempDirectory("sdedup_in").toString
    // two batches worth of files; duplicate text across and within files
    Seq(
      ("f1.json",
        """{"doc_id":1,"ts":"2024-01-01T00:00:00","text":"alpha beta"}
          |{"doc_id":2,"ts":"2024-01-01T00:01:00","text":"alpha beta"}
          |{"doc_id":3,"ts":"2024-01-01T00:02:00","text":"gamma delta"}""".stripMargin),
      ("f2.json",
        """{"doc_id":4,"ts":"2024-01-01T00:03:00","text":"ALPHA   beta"}
          |{"doc_id":5,"ts":"2024-01-01T00:04:00","text":"epsilon"}""".stripMargin))
      .foreach { case (n, body) =>
        Files.writeString(java.nio.file.Paths.get(in, n), body)
      }

    val schema = "doc_id LONG, ts TIMESTAMP, text STRING"
    val stream = spark.readStream.schema(schema).json(in)
    val deduped = Streaming.streamingDedup(stream, "ts", "text", horizon = "10 minutes")

    val q = deduped.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sdedup_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val kept = spark.table("sdedup_out").select($"doc_id")
      .collect().map(_.getLong(0)).toSet
    // doc 2 (exact dup) and doc 4 (dup after case/whitespace
    // normalization) are dropped; 1, 3, 5 survive
    assert(kept === Set(1L, 3L, 5L))
  }
}
