package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("synthesizeMedia produces binary content + typed metadata") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val media = Multimodal.synthesizeMedia(docs)
    val schema = media.schema.map(f => f.name -> f.dataType.simpleString).toMap
    assert(schema("content") === "binary")
    assert(schema("kind") === "string" && schema("width") === "int")
    assert(media.count() === docs.count())
    // blob round-trips: decode(content) == text bytes
    val row = media.join(docs, col("media_id") === col("doc_id"))
      .select(col("content"), col("text")).head()
    assert(new String(row.getAs[Array[Byte]](0), "UTF-8") === row.getString(1))
  }

  test("extractFeatures: histogram sums to byte count, frames sampled every 2nd") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20)
    val feats = Multimodal.featuresFromDocuments(spark, docs).collect()
    assert(feats.length === 20)
    feats.foreach { f =>
      assert(f.byte_histogram.length === Multimodal.FakeCodec.HistogramBins)
      assert(f.byte_histogram.sum === f.n_bytes)
      val nFrames = (f.n_bytes + Multimodal.FakeCodec.FrameSize - 1) / Multimodal.FakeCodec.FrameSize
      assert(f.frames_sampled === (nFrames + 1) / 2) // every 2nd frame
      assert(f.mean_level > 0.0 && f.mean_level < 256.0)
    }
  }

  test("resize downsamples by stride; frame sampling respects frame size") {
    val bytes = (0 until 1000).map(_.toByte).toArray
    val resized = Multimodal.FakeCodec.resize(bytes, 4)
    assert(resized.length === 250 && resized(1) === bytes(4))
    val frames = Multimodal.FakeCodec.sampleFrames(bytes, 2)
    assert(frames.length === 2) // frames 0 and 2 of ceil(1000/256)=4
    assert(frames.head.length === 256)
  }

  test("resizeFeatures: per-kind stride + checksum match a local recomputation") {
    import spark.implicits._
    // orderBy before limit: a bare LIMIT is not deterministic across the
    // two executions this test runs
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .orderBy("doc_id").limit(30)
    val media = Multimodal.synthesizeMedia(docs).as[Multimodal.MediaRecord].collect()
    val expected = media.map { r =>
      val resized = Multimodal.FakeCodec.resize(r.content, Multimodal.strideFor(r.kind))
      // independent foldLeft restatement ON PURPOSE (oracle-style), not
      // a call to checksum31
      val ck = resized.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % Multimodal.ChecksumMod)
      r.media_id -> ((r.kind, resized.length.toLong, ck))
    }.toMap
    val got = Multimodal.resizeFeatures(
      Multimodal.synthesizeMedia(docs).as[Multimodal.MediaRecord])
      .collect().map(f => f.media_id -> ((f.kind, f.n_resized, f.checksum))).toMap
    assert(got === expected)
    // strides really differ per kind (the oracle's CASE is exercised)
    assert(got.values.map(_._1).toSet.size === 3)
  }
}
