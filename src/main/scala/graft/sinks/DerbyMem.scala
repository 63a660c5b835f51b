package graft.sinks

import java.sql.{Connection, DriverManager}

/** Embedded in-memory Derby — the sandbox-runnable SQL engine the S6
  * bulk-load dialects execute against (MySQL/MariaDB are absent from
  * the environment; the MySQL-dialect SQL strings stay string-asserted
  * while the portable dialects run for real here). Shared by the
  * Derby integration specs and the v28 JDBC round-trip gate.
  */
object DerbyMem {
  // route derby.log (and any on-disk state Derby insists on) to a temp
  // dir instead of the process working directory
  if (System.getProperty("derby.system.home") == null)
    System.setProperty("derby.system.home",
      java.nio.file.Files.createTempDirectory("graft_derby_home").toString)

  def url(db: String): String = s"jdbc:derby:memory:$db;create=true"

  def conn(db: String): Connection = DriverManager.getConnection(url(db))

  /** Driver class for Spark's JDBC source (10.15+: lives in
    * derbytools, auto-registered — named explicitly so executor-side
    * loads never depend on DriverManager scan order). */
  val driverClass = "org.apache.derby.jdbc.EmbeddedDriver"
}

/** Serializable per-partition connection factory for
  * [[JdbcReplaceSink.write]] — in-memory Derby is JVM-wide, so every
  * local executor thread reaches the same database. */
class DerbyMemConnFactory(db: String)
    extends (() => Connection) with Serializable {
  override def apply(): Connection = DerbyMem.conn(db)
}
