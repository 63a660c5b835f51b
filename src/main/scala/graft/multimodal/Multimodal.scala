package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / resize /
  * frame-sample stages.
  *
  * The container has no media codecs, so [[FakeCodec]] is a
  * clearly-marked deterministic STUB — but everything Spark-side is
  * real and tested: the schema (binary + metadata struct), the typed
  * Dataset plumbing, the `mapPartitions` batch shape (iterator-in /
  * iterator-out with per-partition setup, exactly how a JNI codec or
  * Arrow batch UDF would be mounted), and the partitioning strategy.
  *
  * Scale notes: blobs are the widest column by far — every stage
  * projects metadata-only columns where possible so parquet column
  * pruning keeps blob IO off non-decode paths; decode is map-side only
  * (no shuffle touches bytes); feature rows (small) are what flow into
  * downstream joins/aggregations.
  */
object Multimodal {

  /** One media object: opaque bytes + typed metadata. */
  final case class MediaRecord(
      media_id: Long, kind: String, content: Array[Byte],
      width: Int, height: Int, sample_rate: Int)

  /** Extracted features (small, shuffle-friendly). */
  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long, checksum: Long,
      byte_histogram: Array[Long], frames_sampled: Int, mean_level: Double)

  /** Checksum modulus: keeps the polynomial hash inside 2^30 so every
    * step fits 64-bit arithmetic in ANY engine (an unbounded `*31`
    * polynomial wraps in Java but overflows engines with checked
    * BIGINT math, making the value inexpressible in a SQL oracle). */
  val ChecksumMod = 1000000007L

  /** The ONE definition of the base-31 modular byte fold, shared by the
    * feature and resize stages (and restated by their SQL oracles). */
  def checksum31(bytes: Array[Byte]): Long = {
    var checksum = 0L
    var i = 0
    while (i < bytes.length) {
      checksum = (checksum * 31 + (bytes(i) & 0xff)) % ChecksumMod
      i += 1
    }
    checksum
  }

  /** STUB CODEC — deterministic fake standing in for libjpeg/ffmpeg/etc.
    * A real deployment replaces the body of `decode` (and only it) with
    * the native codec call; the pipeline shape does not change. */
  object FakeCodec {
    val HistogramBins = 16
    val FrameSize = 256

    /** "Decode" = interpret raw bytes as one channel of samples. */
    def decode(content: Array[Byte]): Array[Byte] = content // STUB: identity

    /** Resize/downsample by stride — byte-level stand-in for image
      * resize / audio resample. */
    def resize(samples: Array[Byte], stride: Int): Array[Byte] = {
      val out = new Array[Byte]((samples.length + stride - 1) / stride)
      var i = 0
      while (i < out.length) { out(i) = samples(i * stride); i += 1 }
      out
    }

    /** Frame sampling: one FrameSize-byte frame every `everyN` frames. */
    def sampleFrames(samples: Array[Byte], everyN: Int): Seq[Array[Byte]] =
      samples.grouped(FrameSize).zipWithIndex
        .collect { case (frame, idx) if idx % everyN == 0 => frame }
        .toSeq
  }

  /** Deterministic media synthesis from the documents table: text bytes
    * become the blob (a stand-in for real image/audio payloads), with
    * kind + metadata derived from stable columns. */
  def synthesizeMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("n_chars") % 3 === 0, lit("image"))
        .when(col("n_chars") % 3 === 1, lit("audio"))
        .otherwise(lit("video")).as("kind"),
      encode(col("text"), "UTF-8").as("content"),
      (col("n_chars") % 640 + 16).cast(IntegerType).as("width"),
      (col("n_chars") % 480 + 16).cast(IntegerType).as("height"),
      when(col("n_chars") % 2 === 0, lit(16000)).otherwise(lit(44100)).as("sample_rate"))

  /** Feature extraction over partitions of media records — the batch
    * shape of a codec UDF: per-partition setup (scratch buffers, codec
    * init) once, then iterator-in/iterator-out streaming. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { records =>
      // per-partition setup: allocate scratch once (codec context here)
      val hist = new Array[Long](FakeCodec.HistogramBins)
      records.map { r =>
        java.util.Arrays.fill(hist, 0L)
        val samples = FakeCodec.decode(r.content)
        // one fused pass: histogram + running sum + the SAME fold as
        // [[checksum31]] (kept inline to avoid a second byte scan — a
        // change to either copy must land in both)
        var checksum = 0L
        var sum = 0L
        var i = 0
        while (i < samples.length) {
          val b = samples(i) & 0xff
          hist(b / (256 / FakeCodec.HistogramBins)) += 1
          checksum = (checksum * 31 + b) % ChecksumMod
          sum += b
          i += 1
        }
        val frames = FakeCodec.sampleFrames(samples, everyN = 2)
        MediaFeatures(
          r.media_id, r.kind, samples.length.toLong, checksum,
          hist.clone(), frames.length,
          if (samples.isEmpty) 0.0 else sum.toDouble / samples.length)
      }
    }
  }

  /** End-to-end: documents → media blobs → typed decode → features. */
  def featuresFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    extractFeatures(synthesizeMedia(docs).as[MediaRecord])
  }

  /** Resized media (small row per blob — the shape a thumbnail/resample
    * stage emits downstream). */
  final case class MediaResized(
      media_id: Long, kind: String, n_resized: Long, checksum: Long)

  /** Per-kind stride: image thumbnails drop more than audio resample;
    * video keeps the least. A real pipeline derives this from target
    * resolution/rate — here it only needs to be deterministic. */
  def strideFor(kind: String): Int = kind match {
    case "image" => 4
    case "audio" => 2
    case _ => 8
  }

  /** The resize stage as its own typed mapPartitions pass: decode →
    * stride-resize → checksum over the RESIZED samples. Same batch
    * shape as [[extractFeatures]] (per-partition setup, iterator
    * streaming, blobs never shuffled — only the small resized summary
    * rows leave the stage). */
  def resizeFeatures(media: Dataset[MediaRecord]): Dataset[MediaResized] = {
    import media.sparkSession.implicits._
    media.mapPartitions { records =>
      records.map { r =>
        val resized = FakeCodec.resize(FakeCodec.decode(r.content), strideFor(r.kind))
        MediaResized(r.media_id, r.kind, resized.length.toLong, checksum31(resized))
      }
    }
  }

  /** Per-blob activity segmentation summary (small, shuffle-friendly). */
  final case class AudioSegments(
      media_id: Long, n_frames: Int, n_active: Int, n_segments: Int,
      max_seg_len: Int, active_bytes: Long)

  /** Energy-threshold activity segmentation — the VAD-shaped audio
    * preprocessing stage (speech pipelines cut recordings into voiced
    * segments before transcription/embedding). Decode → fixed frames of
    * `frameLen` samples → a frame is ACTIVE when its mean level clears
    * `threshold` (compared as `sum >= threshold * n` in exact integer
    * math, so the ragged final frame and an SQL oracle agree bit-wise)
    * → consecutive active frames coalesce into segments (the same
    * gaps-and-islands idea as x15, but run per-blob inside the typed
    * pass: segmentation is per-record imperative logic over millions of
    * independent blobs, so a window function would pay a per-frame row
    * explosion plus a shuffle for what one sequential scan computes
    * map-side). One small summary row per blob leaves the stage. */
  def segmentAudio(
      media: Dataset[MediaRecord], frameLen: Int, threshold: Int): Dataset[AudioSegments] = {
    import media.sparkSession.implicits._
    media.mapPartitions { records =>
      records.map { r =>
        val samples = FakeCodec.decode(r.content)
        val nFrames = (samples.length + frameLen - 1) / frameLen
        var i = 0
        var nActive = 0
        var nSegments = 0
        var run = 0
        var maxRun = 0
        var activeBytes = 0L
        while (i < nFrames) {
          val start = i * frameLen
          val end = math.min(start + frameLen, samples.length)
          var sum = 0L
          var j = start
          while (j < end) { sum += (samples(j) & 0xff); j += 1 }
          val n = end - start
          if (sum >= threshold.toLong * n) {
            nActive += 1
            activeBytes += n
            if (run == 0) nSegments += 1
            run += 1
            if (run > maxRun) maxRun = run
          } else run = 0
          i += 1
        }
        AudioSegments(r.media_id, nFrames, nActive, nSegments, maxRun, activeBytes)
      }
    }
  }

  final case class SceneCuts(
      media_id: Long, n_frames: Int, n_cuts: Int, n_scenes: Int)

  /** Scene-cut detection over video blobs: frame into `frameLen`-byte
    * units, checksum each frame (the m4 modular fold), and declare a cut
    * where the (current, previous) checksum pair falls in a fixed
    * residue band — the STUBBED stand-in for a real frame-difference
    * metric (the decode is [[FakeCodec]]'s identity; the framing,
    * sequential temporal-diff pass, and per-blob summary are the real
    * Spark-side plumbing). Like [[segmentAudio]], the per-frame loop
    * runs INSIDE the typed map — frames of one blob never become rows,
    * so nothing per-frame is shuffled and blob bytes stay map-side. */
  def sceneCuts(media: Dataset[MediaRecord], frameLen: Int): Dataset[SceneCuts] = {
    import media.sparkSession.implicits._
    media.mapPartitions { records =>
      records.map { r =>
        val bytes = FakeCodec.decode(r.content)
        val nFrames = (bytes.length + frameLen - 1) / frameLen
        var i = 0
        var prev = -1L
        var cuts = 0
        while (i < nFrames) {
          val start = i * frameLen
          val end = math.min(start + frameLen, bytes.length)
          var cs = 0L
          var j = start
          while (j < end) { cs = (cs * 31 + (bytes(j) & 0xff)) % 1000000007L; j += 1 }
          if (i > 0 && (cs * 31 + prev) % 997 < 100) cuts += 1
          prev = cs
          i += 1
        }
        SceneCuts(r.media_id, nFrames, cuts, if (nFrames == 0) 0 else cuts + 1)
      }
    }
  }

  /** 64-bit perceptual signature, split 32/32 so every value stays
    * non-negative in engines without unsigned 64-bit (the d3/d6 packed-
    * long convention). */
  final case class PHash(media_id: Long, hi: Long, lo: Long)

  /** Average-hash perceptual fingerprint — the image near-dup signature
    * (aHash: downsample to a fixed grid, threshold each cell at the
    * mean, pack the bits). The stub decode stands in for the real
    * grayscale resample; the 64 sample points stride the blob at
    * floor(j·n/64) so any two byte-identical-after-reencode blobs land
    * on the same bits. Map-side only: one small (id, hi, lo) row per
    * blob leaves the stage, never the bytes — the LSH pairing in m6
    * then works entirely on the 16-byte signatures. */
  def perceptualHash(media: Dataset[MediaRecord]): Dataset[PHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { records =>
      val samples = new Array[Int](64) // per-partition scratch
      records.map { r =>
        val s = FakeCodec.decode(r.content)
        val n = s.length
        var hi = 0L
        var lo = 0L
        if (n > 0) {
          var j = 0
          var sum = 0L
          while (j < 64) {
            val b = s((j.toLong * n / 64).toInt) & 0xff
            samples(j) = b
            sum += b
            j += 1
          }
          val mean = sum / 64
          j = 0
          while (j < 64) {
            if (samples(j) >= mean) {
              if (j < 32) hi |= 1L << j else lo |= 1L << (j - 32)
            }
            j += 1
          }
        }
        PHash(r.media_id, hi, lo)
      }
    }
  }

  /** One sampled frame (small — what flows to an embedding model). */
  final case class FrameRow(
      media_id: Long, frame_idx: Int, n_bytes: Int, checksum: Long)

  /** The frame-sampling stage as a one-to-many typed pass: decode →
    * fixed-size framing → keep every `everyN`-th frame, emitting one
    * small row per KEPT frame (index, size, checksum). The blob fans
    * out map-side only; what leaves the stage is the per-frame feature
    * row an embedding batch consumes — never the bytes. */
  def sampleFrameRows(media: Dataset[MediaRecord], everyN: Int): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { records =>
      records.flatMap { r =>
        val samples = FakeCodec.decode(r.content)
        samples.grouped(FakeCodec.FrameSize).zipWithIndex.collect {
          case (frame, idx) if idx % everyN == 0 =>
            FrameRow(r.media_id, idx, frame.length, checksum31(frame))
        }
      }
    }
  }
}
