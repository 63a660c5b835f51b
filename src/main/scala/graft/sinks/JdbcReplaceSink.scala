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

  /** How "replace on PK conflict" is expressed against the target.
    *
    *  - [[MySqlReplace]]: the reference's dialect — one
    *    `REPLACE INTO` statement, the server deletes-then-inserts on
    *    conflict.
    *  - [[DeleteThenInsert]]: portable ANSI form for engines without
    *    REPLACE (Derby, Postgres, ...): an explicit DELETE-by-key batch
    *    followed by an INSERT batch inside the same per-partition
    *    transaction. Requires `keyColumns`. Rows in a statement batch
    *    are deduplicated keeping the LAST occurrence per key, which is
    *    exactly REPLACE's sequential final state (all deletes of a
    *    chunk run before its inserts, so an in-chunk duplicate would
    *    otherwise violate the PK on the second insert).
    *
    * Both are row-idempotent, so Spark task retries are safe. */
  sealed trait ReplaceDialect
  case object MySqlReplace extends ReplaceDialect
  case object DeleteThenInsert extends ReplaceDialect

  final case class Config(
      table: String,
      columns: Seq[String],
      /** Audit values appended to every row, e.g. ARRIVED_TIME. */
      auditColumns: Seq[(String, String)] = Seq.empty,
      batchSize: Int = 1000,
      dialect: ReplaceDialect = MySqlReplace,
      /** PK columns — required by [[DeleteThenInsert]] (must be a
        * subset of `columns`). */
      keyColumns: Seq[String] = Seq.empty) {
    require(
      dialect != DeleteThenInsert ||
        (keyColumns.nonEmpty && keyColumns.forall(columns.contains)),
      "DeleteThenInsert requires keyColumns ⊆ columns")
  }

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

  /** The parameterized REPLACE statement (MySQL dialect): data columns
    * bound per row, audit columns bound once. Identifiers are validated
    * and backtick-quoted. */
  def replaceSql(cfg: Config): String = {
    val cols = (cfg.columns ++ cfg.auditColumns.map(_._1)).map(quoteIdent)
    val marks = Seq.fill(cols.size)("?")
    s"REPLACE INTO ${quoteIdent(cfg.table)} (${cols.mkString(", ")}) VALUES (${marks.mkString(", ")})"
  }

  /** Validated identifier, emitted UNQUOTED for the ANSI path: quoted
    * identifiers are case-sensitive in ANSI engines (Derby folds
    * unquoted names to upper case), so quoting here would break against
    * tables created with ordinary unquoted DDL. The regex validation is
    * what prevents injection; quoting was only ever belt-and-braces. */
  private def ansiIdent(name: String): String = {
    val parts = name.split('.')
    require(
      parts.nonEmpty && parts.forall(identRe.matches),
      s"invalid SQL identifier: '$name'")
    name
  }

  /** DELETE-by-key statement for [[DeleteThenInsert]]. */
  def deleteSql(cfg: Config): String =
    s"DELETE FROM ${ansiIdent(cfg.table)} WHERE " +
      cfg.keyColumns.map(k => s"${ansiIdent(k)} = ?").mkString(" AND ")

  /** INSERT statement for [[DeleteThenInsert]]. */
  def insertSql(cfg: Config): String = {
    val cols = (cfg.columns ++ cfg.auditColumns.map(_._1)).map(ansiIdent)
    val marks = Seq.fill(cols.size)("?")
    s"INSERT INTO ${ansiIdent(cfg.table)} (${cols.mkString(", ")}) VALUES (${marks.mkString(", ")})"
  }

  /** Load one partition's rows through one connection. Returns rows
    * written. Exposed for direct testing. */
  def writePartition(rows: Iterator[Row], conn: Connection, cfg: Config): Long =
    cfg.dialect match {
      case MySqlReplace => writeReplace(rows, conn, cfg)
      case DeleteThenInsert => writeDeleteInsert(rows, conn, cfg)
    }

  private def writeReplace(rows: Iterator[Row], conn: Connection, cfg: Config): Long = {
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

  /** Portable replace: per chunk of `batchSize` input rows, dedupe
    * keeping the last occurrence per key (REPLACE's sequential final
    * state), run the DELETE batch, then the INSERT batch; one commit
    * per partition. Row-idempotent like REPLACE, so task retries are
    * safe. Returns the INPUT row count (like the REPLACE dialect), not
    * the post-dedup insert count — the two dialects must report the
    * same number for the same partition. */
  private def writeDeleteInsert(rows: Iterator[Row], conn: Connection, cfg: Config): Long = {
    val del = conn.prepareStatement(deleteSql(cfg))
    val ins = conn.prepareStatement(insertSql(cfg))
    val nData = cfg.columns.size
    var total = 0L
    try {
      conn.setAutoCommit(false)
      rows.grouped(cfg.batchSize).foreach { chunk =>
        total += chunk.size
        // keep-last per key within the chunk. Byte-array key columns
        // compare by reference, so wrap them value-comparable — without
        // this, two byte-equal BINARY keys in one chunk both INSERT and
        // trip the PK (a conflict REPLACE INTO would have absorbed).
        def comparable(v: Any): Any = v match {
          case b: Array[Byte] => b.toSeq
          case x => x
        }
        val byKey = new scala.collection.mutable.LinkedHashMap[Seq[Any], Row]
        chunk.foreach { row =>
          val key = cfg.keyColumns.map(k => comparable(row.get(row.fieldIndex(k))))
          byKey.remove(key)
          byKey.put(key, row)
        }
        byKey.foreach { case (_, row) =>
          // bind DELETE params from the ORIGINAL row values — the
          // comparable-wrapped Seq is only a map key (setObject cannot
          // bind a Scala Seq for a BINARY key column)
          cfg.keyColumns.zipWithIndex.foreach { case (k, i) =>
            del.setObject(i + 1, row.get(row.fieldIndex(k)))
          }
          del.addBatch()
          var i = 0
          while (i < nData) {
            ins.setObject(i + 1, row.get(row.fieldIndex(cfg.columns(i))))
            i += 1
          }
          cfg.auditColumns.zipWithIndex.foreach { case ((_, v), j) =>
            ins.setObject(nData + j + 1, v)
          }
          ins.addBatch()
        }
        del.executeBatch()
        ins.executeBatch()
      }
      conn.commit()
      total
    } finally {
      del.close()
      ins.close()
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
