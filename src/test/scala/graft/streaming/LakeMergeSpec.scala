package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins [[LakeMerge]]'s commit-protocol properties on a fixture table:
  * merge correctness against a batch reference, idempotent replay,
  * partition pruning (untouched buckets keep their generation pointer
  * AND their files), and manifest crash recovery.
  */
class LakeMergeSpec extends SparkSpec {

  import LakeMerge._

  private def row(u: Long, ts: Long, id: Long, typ: String, v: Double) =
    (u, ts, id, typ, v)

  private def df(rows: Seq[(Long, Long, Long, String, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("user_id", "tsu", "event_id", "event_type", "value")
  }

  private def freshTable(n: Int = 4) =
    Table(graft.control.Scratch.dir("graft_lake_spec"), n)

  private def contents(t: Table): Set[(Long, Long, Long, String, Double)] =
    readTable(spark, t).map(_.select("user_id", "tsu", "event_id", "event_type", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getDouble(4))).toSet).getOrElse(Set.empty)

  test("merge keeps the latest row per key across batches") {
    val t = freshTable()
    mergeBatch(spark, t, 0L,
      df(Seq(row(1, 100, 1, "view", 1.0), row(2, 100, 2, "view", 2.0))),
      "user_id", Seq("tsu", "event_id"))
    mergeBatch(spark, t, 1L,
      df(Seq(row(1, 200, 3, "purchase", 5.0), row(3, 50, 4, "error", 0.5))),
      "user_id", Seq("tsu", "event_id"))
    assert(contents(t) === Set(
      (1L, 200L, 3L, "purchase", 5.0),
      (2L, 100L, 2L, "view", 2.0),
      (3L, 50L, 4L, "error", 0.5)))
  }

  test("replayed batch converges (idempotent merge, same generation id)") {
    val t = freshTable()
    val b0 = df(Seq(row(1, 100, 1, "view", 1.0), row(2, 100, 2, "view", 2.0)))
    val b1 = df(Seq(row(1, 200, 3, "purchase", 5.0)))
    mergeBatch(spark, t, 0L, b0, "user_id", Seq("tsu", "event_id"))
    mergeBatch(spark, t, 1L, b1, "user_id", Seq("tsu", "event_id"))
    val before = contents(t)
    mergeBatch(spark, t, 1L, b1, "user_id", Seq("tsu", "event_id")) // replay
    assert(contents(t) === before)
  }

  test("untouched buckets are not rewritten (generation pointer pinned)") {
    val t = freshTable(4)
    // users 0..3 land in distinct buckets (u % 4)
    mergeBatch(spark, t, 0L,
      df(Seq(row(0, 10, 1, "view", 1.0), row(1, 10, 2, "view", 1.0),
        row(2, 10, 3, "view", 1.0), row(3, 10, 4, "view", 1.0))),
      "user_id", Seq("tsu", "event_id"))
    val m0 = readManifest(spark, t)
    assert(m0.values.toSet === Set(0L))
    // batch 1 touches only bucket 1
    mergeBatch(spark, t, 1L, df(Seq(row(5, 20, 5, "click", 2.0))),
      "user_id", Seq("tsu", "event_id"))
    val m1 = readManifest(spark, t)
    assert(m1(1) === 1L)
    assert(Seq(0, 2, 3).forall(b => m1(b) === 0L), "untouched pointers moved")
    // the untouched generation DIRECTORIES still exist unmodified
    Seq(0, 2, 3).foreach { b =>
      assert(new java.io.File(s"${t.dir}/bucket=$b/gen=0").exists())
      assert(!new java.io.File(s"${t.dir}/bucket=$b/gen=1").exists())
    }
  }

  test("manifest crash window recovers from the tmp file") {
    val t = freshTable()
    mergeBatch(spark, t, 0L, df(Seq(row(1, 100, 1, "view", 1.0))),
      "user_id", Seq("tsu", "event_id"))
    val before = contents(t)
    // simulate: tmp written, dst deleted, rename never happened
    val json = new java.io.File(s"${t.dir}/_manifest.json")
    val tmp = new java.io.File(s"${t.dir}/_manifest.tmp")
    java.nio.file.Files.copy(json.toPath, tmp.toPath)
    assert(json.delete())
    assert(contents(t) === before, "reader did not honor the tmp manifest")
  }

  test("streaming entry point equals the batch latest-per-key reference") {
    val dir = "/root/testdata/sf0.001"
    val got = LakeMerge.eventsLatestMerge(spark, dir, nBuckets = 8, chunks = 3)
      .select("user_id", "tsu", "event_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("tsu").desc, col("event_id").desc)
    val ref = graft.Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), Streaming.tsMicros(col("ts")).as("tsu"), col("event_id"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty)
  }
}
