package graft.streaming

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Incremental parquet-table upsert maintained by a streaming query —
  * the lakehouse MERGE pattern (Delta/Iceberg's core loop) built from
  * parquet + a pointer manifest, with the commit protocol the table
  * formats use: DATA FILES ARE IMMUTABLE, COMMITS ARE POINTER SWAPS.
  *
  * Layout: `table/bucket=<k>/gen=<batchId>/part-*.parquet` plus
  * `table/_manifest.json` mapping bucket → current generation. A batch
  * merges ONLY the buckets its keys hash into (partition-pruned read of
  * the current generations), writes each merged bucket as a NEW
  * generation directory, then swaps the manifest via write-temp +
  * atomic rename. Readers resolve the manifest (≤ nBuckets entries, a
  * metadata read) and scan exactly one generation per bucket — never a
  * torn mix.
  *
  * Exactly-once without a ledger: the merge itself is an idempotent
  * argmax reduce (latest row per key under a total (tsu, event_id)
  * order — re-merging rows the table already absorbed changes nothing),
  * generation dirs are keyed by batchId (a replayed batch OVERWRITES
  * its own generation rather than appending), and a crash between data
  * write and manifest swap leaves an orphan generation the old manifest
  * never references. This is the file-level idempotency contract the
  * reference implements with DynamoDB bookkeeping
  * (/root/reference/src/AnalyzeEtlWaitStatusLambda/index.py:76-96),
  * re-expressed as a commit protocol instead of a side table.
  *
  * 100 TB shape: per batch, work is O(touched buckets' current size +
  * batch), not O(table) — untouched buckets are never read or written
  * (the gate's spec pins that). The merge is a map-side-combinable
  * `max(struct(...))` per key, co-partitioned by the bucket column;
  * driver-side state is the manifest map, bounded by nBuckets.
  */
object LakeMerge {

  final case class Table(dir: String, nBuckets: Int)

  /** Staged chunk-file inputs, cached per (sfDir, chunks) — input
    * staging only, never merge output (see [[eventsLatestMerge]]). */
  private val stagedInputs =
    scala.collection.mutable.Map.empty[(String, Int), String]

  private def fs(p: Path, conf: Configuration): FileSystem = p.getFileSystem(conf)

  /** bucket → generation pointers; absent manifest = empty table. */
  def readManifest(spark: SparkSession, t: Table): Map[Int, Long] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val mp0 = new Path(t.dir, "_manifest.json")
    val f = fs(mp0, conf)
    // recovery: a crash between delete and rename leaves only the tmp,
    // which is always COMPLETE before the delete happens — honor it
    val mp = if (f.exists(mp0)) mp0 else new Path(t.dir, "_manifest.tmp")
    if (!f.exists(mp)) Map.empty
    else {
      val in = f.open(mp)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      txt.split('\n').filter(_.nonEmpty).map { line =>
        val Array(b, g) = line.split(','); b.toInt -> g.toLong
      }.toMap
    }
  }

  private def writeManifest(spark: SparkSession, t: Table, m: Map[Int, Long]): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val tmp = new Path(t.dir, s"_manifest.tmp")
    val dst = new Path(t.dir, "_manifest.json")
    val f = fs(dst, conf)
    val out = f.create(tmp, true)
    try out.write(m.toSeq.sorted.map { case (b, g) => s"$b,$g" }.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    f.delete(dst, false)
    f.rename(tmp, dst) // same-volume rename: the atomic commit point
    ()
  }

  /** Current table contents (manifest-resolved generation per bucket).
    * `buckets = Some(set)` prunes the read to those buckets' paths. */
  def readTable(spark: SparkSession, t: Table,
      buckets: Option[Set[Int]] = None): Option[DataFrame] = {
    val m0 = readManifest(spark, t)
    val m = buckets.fold(m0)(bs => m0.filter { case (b, _) => bs(b) })
    if (m.isEmpty) None
    else Some(spark.read
      .option("basePath", t.dir)
      .parquet(m.toSeq.sorted.map { case (b, g) => s"${t.dir}/bucket=$b/gen=$g" }: _*)
      .drop("gen"))
  }

  /** Merge one CDC batch (columns: key, tsu, event_id + payload) into
    * the table: latest row per key wins, (tsu, event_id) is the total
    * order. Only the batch's own buckets are read or rewritten. */
  def mergeBatch(spark: SparkSession, t: Table, batchId: Long,
      batch: DataFrame, keyCol: String, orderCols: Seq[String]): Unit = {
    val b = batch.withColumn("bucket",
      pmod(col(keyCol), lit(t.nBuckets)).cast("int"))
    // bounded driver fetch: ≤ nBuckets values
    val touched = b.select(col("bucket")).distinct().collect().map(_.getInt(0)).toSet
    if (touched.isEmpty) return
    val payload = b.columns.filterNot(c => c == keyCol || c == "bucket")
    val reduced = (df: DataFrame) => df
      .groupBy(col(keyCol), col("bucket"))
      .agg(max(struct(orderCols.map(col) ++
        payload.filterNot(orderCols.contains).map(col): _*)).as("_r"))
      .select(col(keyCol), col("bucket"), col("_r.*"))
    val cur = readTable(spark, t, Some(touched))
    val merged = reduced(cur.fold(b)(c => c.unionByName(b)))
    merged.write.mode("overwrite").partitionBy("bucket")
      .parquet(s"${t.dir}/_stage/gen=$batchId")
    // promote each bucket dir into the immutable layout, then swap the
    // manifest: bucket=<k>/gen=<batchId> is overwritten if it already
    // exists (a replayed batch converges instead of duplicating)
    val conf = spark.sparkContext.hadoopConfiguration
    val f = fs(new Path(t.dir), conf)
    touched.toSeq.sorted.foreach { k =>
      val src = new Path(s"${t.dir}/_stage/gen=$batchId/bucket=$k")
      val dstDir = new Path(s"${t.dir}/bucket=$k")
      val dst = new Path(dstDir, s"gen=$batchId")
      f.mkdirs(dstDir)
      if (f.exists(dst)) f.delete(dst, true)
      if (f.exists(src)) { f.rename(src, dst); () }
      else f.mkdirs(dst) // a touched bucket whose merge emptied it (not
                         // possible under argmax, but keep the pointer sound)
      ()
    }
    f.delete(new Path(s"${t.dir}/_stage"), true)
    writeManifest(spark, t, readManifest(spark, t) ++ touched.map(_ -> batchId))
  }

  /** The streaming query: events CDC → incremental latest-per-user
    * table. Input is pre-split into `chunks` files read one per
    * micro-batch (arrival order doesn't matter — the merge reduce is
    * commutative, so any batch interleaving converges to the same
    * table). Returns the final table contents. */
  def eventsLatestMerge(spark: SparkSession, sfDir: String,
      nBuckets: Int = 16, chunks: Int = 4): DataFrame = {
    // normalize BEFORE staging so the staged chunk files always carry the
    // internal BIGINT-nanos ts shape (Tables.normalizeTs) whatever the
    // source dir's physical type, and the stream schema matches them.
    // The staged INPUT is immutable per (sfDir, chunks) and cached like
    // [[Streaming.chunkedEventsDir]] (r9: bench reruns re-ran the
    // range-repartition write every invocation); the TABLE and
    // CHECKPOINT dirs stay fresh per call — every invocation replays
    // all merge batches from an empty table.
    val in = stagedInputs.synchronized {
      stagedInputs.getOrElseUpdate((sfDir, chunks), {
        val d = graft.control.Scratch.dir("graft_lake_in")
        graft.Tables.normalizeTs(spark.read.parquet(s"$sfDir/events.parquet"))
          .repartitionByRange(chunks, col("ts"))
          .write.mode("overwrite").parquet(d)
        d
      })
    }
    val schema = spark.read.parquet(in).schema
    val tableDir = graft.control.Scratch.dir("graft_lake_table")
    val cp = graft.control.Scratch.dir("graft_lake_cp")
    val t = Table(tableDir, nBuckets)
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), Streaming.tsMicros(col("ts")).as("tsu"),
        col("event_id"), col("event_type"), col("value"))
    val q = stream.writeStream
      .queryName(s"graft_lake_merge_${System.nanoTime()}")
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBatch(spark, t, batchId, batch, "user_id", Seq("tsu", "event_id"))
      }
      .start()
    q.awaitTermination()
    StreamAudit.record(q)
    readTable(spark, t).getOrElse(spark.emptyDataFrame)
  }
}
