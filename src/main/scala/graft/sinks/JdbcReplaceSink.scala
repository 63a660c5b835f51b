package graft.sinks

import java.sql.{Connection, PreparedStatement}
import org.apache.spark.sql.{DataFrame, Row}

/** S6 — REPLACE-INTO bulk load (SURVEY.md §2.1). The reference bulk-loads
  * per-opco CSVs with `LOAD DATA FROM S3 ... REPLACE INTO TABLE`, adding
  * audit columns from job args
  * (`/root/reference/src/price_zone/load_job.py:74-90`,
  * `/root/reference/src/pa/pa_etl_script.py:139-160`). Spark's JDBC
  * writer has no upsert mode, so this sink issues batched
  * `REPLACE INTO` statements from `foreachPartition`.
  *
  * Semantics & retry safety: REPLACE = delete-then-insert on PK conflict
  * (MySQL dialect), which is row-idempotent — a Spark task retry replays
  * the same rows to the same end state, so no dedup bookkeeping is
  * needed (the property the reference relies on for its file-level
  * retries).
  *
  * Scale design: one connection per partition (not per row), batches of
  * `batchSize`, one commit per partition — REPLACE idempotency makes a
  * retried partition safe, so there is no need for mid-partition
  * commits. `repartition(groupCols…)` upstream gives per-target
  * parallel streams — the distributed replacement for the reference's
  * one-thread file queue (`load_job.py:114`).
  */
object JdbcReplaceSink {

  final case class Config(
      table: String,
      columns: Seq[String],
      /** Audit values appended to every row, e.g. ARRIVED_TIME. */
      auditColumns: Seq[(String, String)] = Seq.empty,
      batchSize: Int = 1000)

  /** Valid unquoted SQL identifier or dotted pair (`db.table`). Config
    * identifiers come from pipeline code, not user data, but validating
    * here keeps a misconfigured table/column name from turning into
    * arbitrary SQL. */
  private val identRe = "[A-Za-z_][A-Za-z0-9_$]*".r
  private def quoteIdent(name: String): String = {
    val parts = name.split('.')
    require(
      parts.nonEmpty && parts.forall(identRe.matches),
      s"invalid SQL identifier: '$name'")
    parts.map(p => s"`$p`").mkString(".")
  }

  /** The parameterized statement: data columns bound per row, audit
    * columns bound once. Identifiers are validated and backtick-quoted
    * (MySQL dialect). */
  def replaceSql(cfg: Config): String = {
    val cols = (cfg.columns ++ cfg.auditColumns.map(_._1)).map(quoteIdent)
    val marks = Seq.fill(cols.size)("?")
    s"REPLACE INTO ${quoteIdent(cfg.table)} (${cols.mkString(", ")}) VALUES (${marks.mkString(", ")})"
  }

  /** Load one partition's rows through one connection. Returns rows
    * written. Exposed for direct testing. */
  def writePartition(rows: Iterator[Row], conn: Connection, cfg: Config): Long = {
    val stmt: PreparedStatement = conn.prepareStatement(replaceSql(cfg))
    val nData = cfg.columns.size
    var inBatch = 0
    var total = 0L
    try {
      conn.setAutoCommit(false)
      rows.foreach { row =>
        var i = 0
        while (i < nData) {
          stmt.setObject(i + 1, row.get(row.fieldIndex(cfg.columns(i))))
          i += 1
        }
        cfg.auditColumns.zipWithIndex.foreach { case ((_, v), j) =>
          stmt.setObject(nData + j + 1, v)
        }
        stmt.addBatch()
        inBatch += 1
        total += 1
        if (inBatch >= cfg.batchSize) {
          stmt.executeBatch()
          inBatch = 0
        }
      }
      if (inBatch > 0) stmt.executeBatch()
      conn.commit()
      total
    } finally {
      stmt.close()
    }
  }

  /** Distributed load: one connection per partition. `connectionFactory`
    * must be serializable (typically a case class holding url/props). */
  def write(df: DataFrame, cfg: Config, connectionFactory: () => Connection): Unit =
    df.foreachPartition { rows: Iterator[Row] =>
      if (rows.nonEmpty) {
        val conn = connectionFactory()
        try writePartition(rows, conn, cfg)
        finally conn.close()
      }
      ()
    }
}
