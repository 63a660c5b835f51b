package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.Multimodal

/** Multimodal binary-column operators, both oracle-checked. m1 is pure
  * plumbing (blob synth, octet length, content digest, metadata); m2
  * runs the typed mapPartitions decode/feature stage — its stub codec
  * is deterministic, so even the fold-style checksum is restated in
  * SQL (see m2Sql). A real native codec would make m2 rows-only.
  */
object MultimodalQueries {

  // ---------------------------------------------------------------------
  // m1_media_meta — binary column + typed metadata plumbing, per kind.
  def m1(spark: SparkSession, dir: String): DataFrame =
    Multimodal.synthesizeMedia(Tables.documents(spark, dir))
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n"),
        sum(length(col("content")).cast("long")).as("sum_bytes"),
        countDistinct(md5(col("content"))).as("n_distinct"),
        min(col("width")).as("min_w"),
        max(col("height")).as("max_h"),
        sum(col("sample_rate").cast("long")).as("sum_rate"))
      .orderBy(col("kind"))

  private val m1Sql =
    """WITH media AS (
      |  SELECT doc_id AS media_id, text,
      |    CASE WHEN n_chars % 3 = 0 THEN 'image'
      |         WHEN n_chars % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
      |    encode(text) AS content,
      |    CAST(n_chars % 640 + 16 AS INTEGER) AS width,
      |    CAST(n_chars % 480 + 16 AS INTEGER) AS height,
      |    CASE WHEN n_chars % 2 = 0 THEN 16000 ELSE 44100 END AS sample_rate
      |  FROM documents)
      |SELECT kind, COUNT(*) AS n,
      |  CAST(SUM(octet_length(content)) AS BIGINT) AS sum_bytes,
      |  COUNT(DISTINCT md5(text)) AS n_distinct,
      |  MIN(width) AS min_w, MAX(height) AS max_h,
      |  CAST(SUM(sample_rate) AS BIGINT) AS sum_rate
      |FROM media GROUP BY kind ORDER BY kind""".stripMargin

  // ---------------------------------------------------------------------
  // m2_media_features — typed Dataset + mapPartitions batch decode
  // (stub codec): per-kind feature stats.
  def m2(spark: SparkSession, dir: String): DataFrame =
    Multimodal.featuresFromDocuments(spark, Tables.documents(spark, dir))
      .toDF()
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("n_bytes")).as("sum_bytes"),
        sum(col("frames_sampled").cast("long")).as("sum_frames"),
        sum(element_at(col("byte_histogram"), 7)).as("hist_bin6"),
        min(col("checksum")).as("min_checksum"),
        max(col("checksum")).as("max_checksum"))
      .orderBy(col("kind"))

  // ---------------------------------------------------------------------

  /** The stub codec restated in SQL: identity decode means the blob is
    * the text's bytes (all-ASCII in this corpus, so ascii(char) ==
    * byte), the checksum is a modular base-31 fold (`list_reduce`),
    * histogram bin 7 counts bytes in [96,112), and frame sampling keeps
    * every 2nd 256-byte frame. A REAL codec would make m2 rows-only
    * again — this oracle pins the Spark-side plumbing (typed Dataset,
    * mapPartitions batching, aggregation) end to end. */
  private val m2Sql =
    """WITH media AS (
      |  SELECT doc_id AS media_id,
      |    CASE WHEN n_chars % 3 = 0 THEN 'image'
      |         WHEN n_chars % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
      |    text
      |  FROM documents),
      |f AS (
      |  SELECT kind,
      |    octet_length(encode(text)) AS n_bytes,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(range(1, length(text) + 1),
      |        i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))),
      |      (acc, x) -> (acc * 31 + x) % 1000000007) AS checksum,
      |    len(list_filter(list_transform(range(1, length(text) + 1),
      |      i -> ascii(substr(text, i, 1))), x -> x // 16 = 6)) AS bin6,
      |    (CAST(ceil(octet_length(encode(text)) / 256.0) AS BIGINT) + 1) // 2 AS frames
      |  FROM media)
      |SELECT kind, COUNT(*) AS n,
      |  CAST(SUM(n_bytes) AS BIGINT) AS sum_bytes,
      |  CAST(SUM(frames) AS BIGINT) AS sum_frames,
      |  CAST(SUM(bin6) AS BIGINT) AS hist_bin6,
      |  MIN(checksum) AS min_checksum, MAX(checksum) AS max_checksum
      |FROM f GROUP BY kind ORDER BY kind""".stripMargin

  // ---------------------------------------------------------------------
  // m3_media_resize — the resize/resample stage as its own typed
  // mapPartitions pass: per-kind stride (image 4 / audio 2 / video 8),
  // checksum over the RESIZED samples, per-kind stats. Blobs never
  // shuffle — only the small resized-summary rows leave the stage.
  def m3(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Multimodal.resizeFeatures(
      Multimodal.synthesizeMedia(Tables.documents(spark, dir))
        .as[Multimodal.MediaRecord])
      .toDF()
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_resized")).as("sum_resized"),
        min(col("checksum")).as("min_checksum"),
        max(col("checksum")).as("max_checksum"))
      .orderBy(col("kind"))
  }

  /** Resize restated in SQL: every stride-th byte starting at offset 0
    * (ASCII corpus, so ascii(char) == byte), then the same modular
    * base-31 fold as m2 over the resized sequence. */
  private val m3Sql =
    """WITH media AS (
      |  SELECT doc_id AS media_id, text,
      |    CASE WHEN n_chars % 3 = 0 THEN 'image'
      |         WHEN n_chars % 3 = 1 THEN 'audio' ELSE 'video' END AS kind
      |  FROM documents),
      |s AS (
      |  SELECT kind,
      |    CASE kind WHEN 'image' THEN 4 WHEN 'audio' THEN 2 ELSE 8 END AS stride,
      |    text, length(text) AS len
      |  FROM media),
      |r AS (
      |  SELECT kind,
      |    (len + stride - 1) // stride AS n_resized,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(range(0, (len + stride - 1) // stride),
      |        j -> CAST(ascii(substr(text, j * stride + 1, 1)) AS BIGINT))),
      |      (acc, x) -> (acc * 31 + x) % 1000000007) AS checksum
      |  FROM s)
      |SELECT kind, COUNT(*) AS n,
      |  CAST(SUM(n_resized) AS BIGINT) AS sum_resized,
      |  MIN(checksum) AS min_checksum, MAX(checksum) AS max_checksum
      |FROM r GROUP BY kind ORDER BY kind""".stripMargin

  // ---------------------------------------------------------------------
  // m4_frame_table — the frame-sampling stage per-frame: video blobs
  // frame into 256-byte units, every 2nd frame is kept, and each KEPT
  // frame emits one small row (index, size, checksum31) — the exact
  // table an embedding batch job consumes. Per-frame hash match is the
  // strongest check of the framing arithmetic (boundaries, the ragged
  // final frame, the stride). Blob fan-out is map-side only; the
  // oracle recomputes every frame from substr + the same modular fold
  // (all-ASCII synthetic text keeps chars == bytes, the m2 convention).
  def m4(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Multimodal.sampleFrameRows(
      Multimodal.synthesizeMedia(Tables.documents(spark, dir))
        .as[Multimodal.MediaRecord]
        .filter(col("kind") === lit("video")),
      everyN = 2)
      .toDF()
      .orderBy(col("media_id"), col("frame_idx"))
  }

  private val m4Sql =
    """WITH media AS (
      |  SELECT doc_id AS media_id, text FROM documents WHERE n_chars % 3 = 2),
      |fr AS (
      |  SELECT media_id, text,
      |    unnest(range(0, CAST(ceil(length(text) / 256.0) AS BIGINT))) AS i
      |  FROM media),
      |cut AS (
      |  SELECT media_id, CAST(i AS INTEGER) AS frame_idx,
      |    substr(text, CAST(i * 256 + 1 AS INTEGER), 256) AS sub
      |  FROM fr WHERE i % 2 = 0)
      |SELECT media_id, frame_idx,
      |  CAST(length(sub) AS INTEGER) AS n_bytes,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT),
      |    list_transform(range(1, length(sub) + 1),
      |      j -> CAST(ascii(substr(sub, CAST(j AS INTEGER), 1)) AS BIGINT))),
      |    (acc, x) -> (acc * 31 + x) % 1000000007) AS checksum
      |FROM cut ORDER BY media_id, frame_idx""".stripMargin

  // ---------------------------------------------------------------------
  // m5_audio_segments — energy-threshold activity segmentation (the
  // VAD-shaped stage that cuts recordings into voiced spans before
  // transcription/embedding): audio blobs frame into 64-sample units, a
  // frame is active when mean level ≥ 94 (exact integer compare), and
  // consecutive active frames coalesce into segments INSIDE the typed
  // pass — per-blob sequential logic, so no per-frame row explosion and
  // no shuffle touches bytes. One summary row per blob; the oracle
  // recomputes frames + islands relationally (unnest + lag window) —
  // two very different plans that must agree bit-for-bit.
  def m5(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Multimodal.segmentAudio(
      Multimodal.synthesizeMedia(Tables.documents(spark, dir))
        .as[Multimodal.MediaRecord]
        .filter(col("kind") === lit("audio")),
      frameLen = 64, threshold = 94)
      .toDF()
      .orderBy(col("media_id"))
  }

  private val m5Sql =
    """WITH media AS (
      |  SELECT doc_id AS media_id, text FROM documents WHERE n_chars % 3 = 1),
      |fr AS (
      |  SELECT media_id, text,
      |    unnest(range(0, CAST(ceil(length(text) / 64.0) AS BIGINT))) AS i
      |  FROM media),
      |e AS (
      |  SELECT media_id, CAST(i AS INTEGER) AS idx,
      |    length(substr(text, CAST(i * 64 + 1 AS INTEGER), 64)) AS nb,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(range(1, length(substr(text, CAST(i * 64 + 1 AS INTEGER), 64)) + 1),
      |        j -> CAST(ascii(substr(substr(text, CAST(i * 64 + 1 AS INTEGER), 64),
      |                               CAST(j AS INTEGER), 1)) AS BIGINT))),
      |      (acc, x) -> acc + x) AS ssum
      |  FROM fr),
      |a AS (
      |  SELECT media_id, idx, nb, (ssum >= 94 * nb) AS active FROM e),
      |w AS (
      |  SELECT media_id, idx, nb, active,
      |    CASE WHEN active AND NOT coalesce(
      |        lag(active) OVER (PARTITION BY media_id ORDER BY idx), FALSE)
      |      THEN 1 ELSE 0 END AS seg_start
      |  FROM a),
      |s AS (
      |  SELECT media_id, idx, nb, active,
      |    SUM(seg_start) OVER (PARTITION BY media_id ORDER BY idx) AS seg_id
      |  FROM w),
      |g AS (
      |  SELECT media_id, seg_id, COUNT(*) AS seg_len, SUM(nb) AS seg_bytes
      |  FROM s WHERE active GROUP BY media_id, seg_id),
      |per_seg AS (
      |  SELECT media_id, COUNT(*) AS n_segments,
      |    MAX(seg_len) AS max_seg_len, SUM(seg_bytes) AS active_bytes
      |  FROM g GROUP BY media_id),
      |per_media AS (
      |  SELECT media_id, COUNT(*) AS n_frames,
      |    SUM(CASE WHEN active THEN 1 ELSE 0 END) AS n_active
      |  FROM a GROUP BY media_id)
      |SELECT m.media_id,
      |  CAST(m.n_frames AS INTEGER) AS n_frames,
      |  CAST(m.n_active AS INTEGER) AS n_active,
      |  CAST(coalesce(p.n_segments, 0) AS INTEGER) AS n_segments,
      |  CAST(coalesce(p.max_seg_len, 0) AS INTEGER) AS max_seg_len,
      |  CAST(coalesce(p.active_bytes, 0) AS BIGINT) AS active_bytes
      |FROM per_media m LEFT JOIN per_seg p USING (media_id)
      |ORDER BY m.media_id""".stripMargin

  // ---------------------------------------------------------------------
  // m6_phash_neardup — image near-duplicate pairs via the 64-bit
  // average-hash signature (Multimodal.perceptualHash) + hamming-ball
  // LSH: the image-dedup pass a multimodal corpus runs where text gets
  // d3/d6's SimHash. Same scale discipline as d6: the signature is
  // computed map-side from the blob (bytes never shuffle — only 16-byte
  // (id, hi, lo) rows), candidate pairs come from a 16-bit-chunk
  // equi-join (by pigeonhole, hamming ≤ 3 ⇒ one of the 4 chunks is
  // intact, so recall is exact at the threshold without an all-pairs
  // join), and hamming itself is bit_count(xor) on the two packed
  // longs. Empty blobs are excluded up front (a real decoder rejects
  // them; their all-zero hash would otherwise pair with everything).
  def m6(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ph = Multimodal.perceptualHash(
      Multimodal.synthesizeMedia(Tables.documents(spark, dir))
        .filter(col("kind") === lit("image") && length(col("content")) > 0)
        .as[Multimodal.MediaRecord])
      .toDF()
    // hi/lo < 2^32 (bit 63 unused), so arithmetic shift == logical shift
    val keyed = ph.select(col("media_id"), col("hi"), col("lo"),
      explode(array((0 until 4).map { c =>
        val src = if (c < 2) col("hi") else col("lo")
        shiftright(src, (c % 2) * 16).bitwiseAND(lit(65535L)) + lit(c * 65536L)
      }: _*)).as("k"))
    val a = keyed.select(col("media_id").as("media_a"),
      col("hi").as("hi_a"), col("lo").as("lo_a"), col("k"))
    val b = keyed.select(col("media_id").as("media_b"),
      col("hi").as("hi_b"), col("lo").as("lo_b"), col("k"))
    a.join(b, Seq("k"))
      .filter(col("media_a") < col("media_b"))
      .select(col("media_a"), col("media_b"),
        col("hi_a"), col("lo_a"), col("hi_b"), col("lo_b"))
      .distinct()
      .select(col("media_a"), col("media_b"),
        (bit_count(col("hi_a").bitwiseXOR(col("hi_b"))) +
          bit_count(col("lo_a").bitwiseXOR(col("lo_b")))).as("hamming"))
      .filter(col("hamming") <= 3)
      .orderBy(col("media_a"), col("media_b"))
  }

  private val m6Sql =
    """WITH img AS (
      |  SELECT doc_id AS media_id, text FROM documents
      |  WHERE n_chars % 3 = 0 AND length(text) > 0),
      |h AS (
      |  SELECT media_id,
      |    list_transform(range(0, 64), j ->
      |      ascii(substr(text, CAST((j * length(text)) // 64 AS INTEGER) + 1, 1))) AS s
      |  FROM img),
      |hm AS (
      |  SELECT media_id, s, list_aggregate(s, 'sum') // 64 AS mean FROM h),
      |sig AS (
      |  SELECT media_id,
      |    CAST(list_aggregate(list_transform(range(0, 32), j ->
      |      CASE WHEN s[CAST(j AS INTEGER) + 1] >= mean
      |           THEN 1::BIGINT << j ELSE 0::BIGINT END), 'sum') AS BIGINT) AS hi,
      |    CAST(list_aggregate(list_transform(range(32, 64), j ->
      |      CASE WHEN s[CAST(j AS INTEGER) + 1] >= mean
      |           THEN 1::BIGINT << (j - 32) ELSE 0::BIGINT END), 'sum') AS BIGINT) AS lo
      |  FROM hm),
      |keys AS (
      |  SELECT media_id, hi, lo, unnest(list_transform(range(0, 4), c ->
      |    ((CASE WHEN c < 2 THEN hi >> (c * 16)
      |           ELSE lo >> ((c - 2) * 16) END) & 65535) + c * 65536)) AS k
      |  FROM sig),
      |p AS (
      |  SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b,
      |    a.hi AS hi_a, a.lo AS lo_a, b.hi AS hi_b, b.lo AS lo_b
      |  FROM keys a JOIN keys b ON a.k = b.k AND a.media_id < b.media_id)
      |SELECT media_a, media_b,
      |  CAST(bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b)) AS INTEGER)
      |    AS hamming
      |FROM p
      |WHERE bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b)) <= 3
      |ORDER BY media_a, media_b""".stripMargin

  // ---------------------------------------------------------------------
  // m7_scene_cuts — video scene-cut detection: 256-byte frames,
  // consecutive-frame checksum pairs in a fixed residue band mark cuts
  // (the deterministic stand-in for a real frame-diff metric — the
  // decode is the stubbed identity, the framing + sequential
  // temporal-diff pass + per-blob summary are the real plumbing). The
  // per-frame loop runs inside the typed map like m5 — frames never
  // become rows, bytes never shuffle, one summary row per blob leaves
  // the stage. Oracle recomputes frames + lag relationally: two very
  // different plans that must agree bit-for-bit.
  def m7(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Multimodal.sceneCuts(
      Multimodal.synthesizeMedia(Tables.documents(spark, dir))
        .as[Multimodal.MediaRecord]
        .filter(col("kind") === lit("video")),
      frameLen = 256)
      .toDF()
      .orderBy(col("media_id"))
  }

  private val m7Sql =
    """WITH media AS (
      |  SELECT doc_id AS media_id, text FROM documents WHERE n_chars % 3 = 2),
      |fr AS (
      |  SELECT media_id, text,
      |    unnest(range(0, CAST(ceil(length(text) / 256.0) AS BIGINT))) AS i
      |  FROM media),
      |cs AS (
      |  SELECT media_id, i,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(range(1, length(substr(text, CAST(i * 256 + 1 AS INTEGER), 256)) + 1),
      |        j -> CAST(ascii(substr(substr(text, CAST(i * 256 + 1 AS INTEGER), 256),
      |               CAST(j AS INTEGER), 1)) AS BIGINT))),
      |      (acc, x) -> (acc * 31 + x) % 1000000007) AS cksum
      |  FROM fr),
      |d AS (
      |  SELECT media_id, i, cksum,
      |    lag(cksum) OVER (PARTITION BY media_id ORDER BY i) AS prev
      |  FROM cs),
      |agg AS (
      |  SELECT media_id, COUNT(*) AS n_frames,
      |    SUM(CASE WHEN prev IS NOT NULL AND (cksum * 31 + prev) % 997 < 100
      |      THEN 1 ELSE 0 END) AS n_cuts
      |  FROM d GROUP BY 1)
      |SELECT media_id, CAST(n_frames AS INTEGER) AS n_frames,
      |  CAST(n_cuts AS INTEGER) AS n_cuts,
      |  CAST(CASE WHEN n_frames = 0 THEN 0 ELSE n_cuts + 1 END AS INTEGER)
      |    AS n_scenes
      |FROM agg ORDER BY media_id""".stripMargin

  // ---------------------------------------------------------------------
  // m8_pack_interleave — MULTIMODAL SEQUENCE PACKING: the step that
  // turns a curated corpus into fixed-budget interleaved training rows.
  // Each document contributes its text tokens plus a media-token cost
  // derived from its (stubbed) media metadata — image patches
  // (w·h div 4096), audio frames (rate div 1600), video patches at 2×
  // image density — and documents pack in doc_id order into 2048-token
  // bins by prefix-sum binning (x31's distributive rule: bin =
  // tokens-before div capacity — no sequential packer, computes over
  // millions of docs). Output is bin-cardinality: per-bin doc/modality
  // mix and token budgets, the numbers a dataloader shards by.
  def m8(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"),
        when(col("n_chars") % 3 === 0, "image")
          .when(col("n_chars") % 3 === 1, "audio")
          .otherwise("video").as("kind"),
        (col("n_chars") % 640 + 16).cast("long").as("w"),
        (col("n_chars") % 480 + 16).cast("long").as("h"),
        when(col("n_chars") % 2 === 0, 16000L).otherwise(44100L).as("rate"),
        when(col("text").isNull, 0L)
          .otherwise(size(TextFunctions.tokens(col("text"))).cast("long"))
          .as("text_toks"))
      .withColumn("media_toks", expr(
        """CASE kind WHEN 'image' THEN (w * h) div 4096
          |WHEN 'audio' THEN rate div 1600
          |ELSE (w * h) div 2048 END""".stripMargin))
      .withColumn("tot", col("text_toks") + col("media_toks"))
    RelationalQueries.globalPrefixSum(d, Seq(col("doc_id")), col("tot"), "cum")
      .withColumn("bin", expr("(cum - tot) div 2048"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("text_toks")).as("text_tokens"),
        sum(col("media_toks")).as("media_tokens"),
        sum(when(col("kind") === "image", 1L).otherwise(0L)).as("n_image"),
        sum(when(col("kind") === "audio", 1L).otherwise(0L)).as("n_audio"),
        sum(when(col("kind") === "video", 1L).otherwise(0L)).as("n_video"))
      .orderBy(col("bin"))
  }

  private val m8Sql =
    """WITH d AS (
      |  SELECT doc_id,
      |    CASE WHEN n_chars % 3 = 0 THEN 'image'
      |         WHEN n_chars % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
      |    CAST(n_chars % 640 + 16 AS BIGINT) AS w,
      |    CAST(n_chars % 480 + 16 AS BIGINT) AS h,
      |    CASE WHEN n_chars % 2 = 0 THEN 16000 ELSE 44100 END AS rate,
      |    CASE WHEN text IS NULL THEN 0
      |         ELSE len(string_split(text, ' ')) END AS text_toks
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, kind, text_toks,
      |    CASE kind WHEN 'image' THEN (w * h) // 4096
      |              WHEN 'audio' THEN rate // 1600
      |              ELSE (w * h) // 2048 END AS media_toks
      |  FROM d),
      |p AS (
      |  SELECT kind, text_toks, media_toks,
      |    SUM(text_toks + media_toks) OVER (ORDER BY doc_id
      |      ROWS UNBOUNDED PRECEDING) - (text_toks + media_toks) AS before
      |  FROM c)
      |SELECT CAST(before // 2048 AS BIGINT) AS bin, COUNT(*) AS n_docs,
      |  CAST(SUM(text_toks) AS BIGINT) AS text_tokens,
      |  CAST(SUM(media_toks) AS BIGINT) AS media_tokens,
      |  CAST(SUM(CASE WHEN kind = 'image' THEN 1 ELSE 0 END) AS BIGINT) AS n_image,
      |  CAST(SUM(CASE WHEN kind = 'audio' THEN 1 ELSE 0 END) AS BIGINT) AS n_audio,
      |  CAST(SUM(CASE WHEN kind = 'video' THEN 1 ELSE 0 END) AS BIGINT) AS n_video
      |FROM p GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m8_pack_interleave" -> (m8 _),
    "m7_scene_cuts" -> (m7 _),
    "m6_phash_neardup" -> (m6 _),
    "m5_audio_segments" -> (m5 _),
    "m4_frame_table" -> (m4 _),
    "m1_media_meta" -> (m1 _),
    "m2_media_features" -> (m2 _),
    "m3_media_resize" -> (m3 _))

  val oracleSql: Map[String, String] = Map(
    "m8_pack_interleave" -> m8Sql,
    "m7_scene_cuts" -> m7Sql,
    "m6_phash_neardup" -> m6Sql,
    "m5_audio_segments" -> m5Sql,
    "m4_frame_table" -> m4Sql,
    "m1_media_meta" -> m1Sql,
    "m2_media_features" -> m2Sql,
    "m3_media_resize" -> m3Sql)
}
