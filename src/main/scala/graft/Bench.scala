package graft
import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal

/** Benchmark main: runs every gate query in `SparkEntry.queries` against
  * `SPARK_GRAFT_SF_DIR` and prints machine-readable timings.
  *
  * Determinism contract (so round-over-round per-query comparisons are
  * falsifiable rather than order-noise):
  *   - queries run in SORTED-NAME order — adding a query never reshuffles
  *     when the others execute, so GC/JIT interleaving stays comparable;
  *   - each query runs N=3 times and reports the MEDIAN (cold Janino
  *     compile lands on run 1 only; the median isolates steady-state
  *     execution from one-time codegen), with the cold first-run time
  *     reported separately in `cold`;
  *   - a failing query is reported as an ERROR (queries value -1.0 plus an
  *     `errors` entry with the exception), never as a fast-looking count;
  *   - output is TWO JSON lines: the full per-query line first, then a
  *     short total-only line, so a bounded tail window always captures the
  *     headline number even if the per-query line is truncated.
  * Full detail (every individual run time) is also written to
  * `bench_detail.json` in the working directory.
  */
object Bench {
  private val Runs = 3

  private def fmt(d: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, d)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Shuffle/spill scratch on guarded tmpfs (r7's bench I/O finding):
    // suite shuffle files are MB-scale at bench sf, but routing them
    // through the host disk let its latency variance move disk-bound
    // gates ~2× between otherwise identical runs. 4 GB headroom guard;
    // dir is deleted at JVM exit.
    val localDir: Option[String] = {
      val shm = new java.io.File("/dev/shm")
      if (shm.isDirectory && shm.canWrite &&
          shm.getUsableSpace > 4L * 1024 * 1024 * 1024) {
        val d = new java.io.File(shm,
          s"graft_local_${ProcessHandle.current().pid()}")
        if (d.isDirectory || d.mkdirs()) {
          Runtime.getRuntime.addShutdownHook(new Thread(() => {
            def rm(f: java.io.File): Unit = {
              Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
            }
            rm(d)
          }))
          Some(d.getAbsolutePath)
        } else None
      } else None
    }
    val builder0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS) which Spark 4 rejects by
      // default; read as epoch-nanos long (queries convert as needed).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    val spark = localDir.fold(builder0)(d =>
      builder0.config("spark.local.dir", d)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup: touch every table once (file-index + footer reads) so the
    // first timed query doesn't absorb session start-up costs.
    graft.Tables.names.foreach { t =>
      try graft.Tables(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }
    // …and run one synthetic scan→project→agg→join→sort pipeline to JIT
    // the codegen/compile/shuffle infrastructure (Janino, unsafe row
    // writers, exchange setup): measured ~3s landing on whichever query
    // happened to run first otherwise.
    locally {
      import org.apache.spark.sql.functions._
      val w = spark.range(200000).select(col("id"), (col("id") % 97).as("k"),
        col("id").cast("string").as("s"))
      val agg = w.filter(col("id") % 3 === 0)
        .groupBy(col("k")).agg(count(lit(1)).as("n"), sum(length(col("s"))).as("len"))
      agg.join(w.filter(col("id") < 100), Seq("k")).orderBy(col("k")).count()
    }
    // …and one 2-row file-source streaming aggregate: the FIRST streaming
    // query in a session pays ~4-5s of MicroBatchExecution init (executor
    // threads, offset/commit logs, state-store machinery, stateful-agg
    // codegen) that otherwise lands on whichever st-query runs first.
    try {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.streaming.Trigger
      val dir = java.nio.file.Files.createTempDirectory("graft_warm_stream").toString
      spark.range(2).select(col("id"), (col("id") % 2).as("k"))
        .write.mode("overwrite").parquet(dir)
      val schema = spark.read.parquet(dir).schema
      val q = spark.readStream.schema(schema).parquet(dir)
        .groupBy(col("k")).count()
        .writeStream.outputMode("complete").format("memory")
        .queryName("graft_warmup_stream").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    } catch { case _: Throwable => () }

    // Sorted-name order: deterministic across rounds regardless of Map
    // hashing or how many queries exist.
    val names = SparkEntry.queries.keys.toSeq.sorted
    val runsPerQuery = scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = scala.collection.mutable.ArrayBuffer[Double]()
      var failed = false
      var i = 0
      while (i < Runs && !failed) {
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          times += (System.nanoTime() - t0) / 1e9
        } catch {
          case NonFatal(e) =>
            failed = true
            errors(name) = s"${e.getClass.getName}: ${String.valueOf(e.getMessage).take(300)}"
        }
        i += 1
      }
      runsPerQuery(name) = times.toSeq
      // Cross-query hygiene: each query's timing must not absorb the
      // previous query's debris (r4 finding: t17/t18 showed 10×/2.6×
      // run spreads sitting downstream of the streaming block). Between
      // queries, drop any lingering temp views, unload cached
      // state-store providers (heap maps / RocksDB handles from the
      // streaming gates), clear the block-manager cache, and take a GC
      // checkpoint so allocation debt lands HERE — in untimed
      // housekeeping — instead of inside the next query's first run.
      try {
        spark.catalog.listTables().collect()
          .filter(t => t.isTemporary && t.name.startsWith("graft_"))
          .foreach(t => spark.catalog.dropTempView(t.name))
        org.apache.spark.sql.GraftStreamingBridge.unloadAllStateStores()
        spark.catalog.clearCache()
      } catch { case NonFatal(_) => () }
      System.gc()
    }
    def median(ts: Seq[Double]): Double = {
      val s = ts.sorted
      s(s.length / 2) // odd N
    }
    val medians = names.map { n =>
      val ts = runsPerQuery(n)
      n -> (if (errors.contains(n) || ts.isEmpty) -1.0 else median(ts))
    }
    val colds = names.collect { case n if runsPerQuery(n).nonEmpty => n -> runsPerQuery(n).head }
    val total = medians.collect { case (_, v) if v >= 0 => v }.sum
    def jmap(kv: Seq[(String, Double)]): String =
      kv.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    // full JSON string escaping — exception messages carry newlines and
    // tabs (AnalysisException embeds plans); a raw control char would
    // break the one-line machine-readable contract
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val errJson = errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }
      .mkString("{", ",", "}")
    // Full detail (all individual run times) to a file, immune to stdout
    // truncation.
    val detail = names.map { n =>
      "\"" + n + "\":" + runsPerQuery(n).map(fmt).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get("bench_detail.json"),
        s"""{"sf":"$sfDir","runs":$Runs,"errors":$errJson,"times":$detail}""".getBytes("UTF-8"))
    } catch { case NonFatal(_) => () }
    // Line 1: full per-query medians (+ colds + errors).
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":${jmap(medians)},"cold":${jmap(colds)},"errors":$errJson,"sf":"$sfDir"}""")
    // Line 2: short headline, guaranteed to survive any tail window.
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries_n":${names.size},"errors_n":${errors.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
