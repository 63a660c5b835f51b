package graft.sinks

import java.sql.{Connection, DriverManager}
import graft.SparkSpec

/** S6 against a REAL SQL engine (VERDICT r2 item 4): embedded Derby —
  * shipped with the Spark distribution — executes the sink's
  * DeleteThenInsert dialect end-to-end: DDL with a primary key,
  * replace-on-PK-conflict, batch flush at batchSize boundaries,
  * in-chunk duplicate keys, partition retry idempotency, and the
  * distributed foreachPartition path. Mirrors the reference's
  * `LOAD DATA ... REPLACE INTO TABLE` contract
  * (`/root/reference/src/price_zone/load_job.py:74-128`) on an engine
  * the sandbox can actually run.
  */
object DerbyDb {
  System.setProperty("derby.system.home",
    java.nio.file.Files.createTempDirectory("derby_home").toString)
  val url = "jdbc:derby:memory:graftdb;create=true"
  def conn(): Connection = DriverManager.getConnection(url)
}

/** Serializable connection factory for the distributed write test. */
class DerbyConnFactory extends (() => Connection) with Serializable {
  override def apply(): Connection = DerbyDb.conn()
}

class JdbcDerbyIntegrationSpec extends SparkSpec {
  import spark.implicits._

  private def cfg(table: String, batchSize: Int = 1000) = JdbcReplaceSink.Config(
    table = table,
    columns = Seq("supc", "customer_id", "price_zone"),
    auditColumns = Seq("arrived_time" -> "2024-06-01 00:00:00"),
    batchSize = batchSize,
    dialect = JdbcReplaceSink.DeleteThenInsert,
    keyColumns = Seq("supc", "customer_id"))

  private def createTable(c: Connection, table: String): Unit = {
    val st = c.createStatement()
    st.execute(
      s"""CREATE TABLE $table (
         |  supc INT NOT NULL, customer_id INT NOT NULL, price_zone INT,
         |  arrived_time VARCHAR(32),
         |  PRIMARY KEY (supc, customer_id))""".stripMargin)
    st.close()
  }

  private def dump(c: Connection, table: String): Map[(Int, Int), (Int, String)] = {
    val st = c.createStatement()
    val rs = st.executeQuery(s"SELECT supc, customer_id, price_zone, arrived_time FROM $table")
    val b = Map.newBuilder[(Int, Int), (Int, String)]
    while (rs.next()) b += ((rs.getInt(1), rs.getInt(2)) -> ((rs.getInt(3), rs.getString(4))))
    rs.close(); st.close()
    // writePartition leaves the caller-owned connection in manual-commit
    // mode; end the read txn so close() succeeds
    if (!c.getAutoCommit) c.commit()
    b.result()
  }

  private def rows(data: Seq[(Int, Int, Int)]) =
    data.toDF("supc", "customer_id", "price_zone").collect().iterator

  test("replace-on-PK-conflict: existing keys are overwritten, new keys inserted") {
    val c = DerbyDb.conn()
    createTable(c, "pz_conflict")
    val st = c.createStatement()
    st.execute("INSERT INTO pz_conflict VALUES (1, 10, 111, 'old'), (2, 20, 222, 'old')")
    st.close()

    val n = JdbcReplaceSink.writePartition(
      rows(Seq((1, 10, 999), (3, 30, 333))), c, cfg("pz_conflict"))
    assert(n === 2)
    assert(dump(c, "pz_conflict") === Map(
      (1, 10) -> ((999, "2024-06-01 00:00:00")),   // replaced
      (2, 20) -> ((222, "old")),                   // untouched
      (3, 30) -> ((333, "2024-06-01 00:00:00")))) // inserted
    c.close()
  }

  test("batch flush at batchSize boundaries writes every row") {
    val c = DerbyDb.conn()
    createTable(c, "pz_batch")
    val data = (1 to 7).map(i => (i, i * 10, i * 100))
    val n = JdbcReplaceSink.writePartition(rows(data), c, cfg("pz_batch", batchSize = 3))
    assert(n === 7)
    val state = dump(c, "pz_batch")
    assert(state.size === 7)
    assert(state((4, 40))._1 === 400)
    c.close()
  }

  test("partition retry replays to the same end state (idempotent)") {
    val c = DerbyDb.conn()
    createTable(c, "pz_retry")
    val data = Seq((1, 10, 100), (2, 20, 200), (3, 30, 300))
    JdbcReplaceSink.writePartition(rows(data), c, cfg("pz_retry", batchSize = 2))
    val first = dump(c, "pz_retry")
    // simulated task retry: same partition content again
    JdbcReplaceSink.writePartition(rows(data), c, cfg("pz_retry", batchSize = 2))
    assert(dump(c, "pz_retry") === first)
    assert(first.size === 3)
    c.close()
  }

  test("duplicate key within one chunk keeps the LAST occurrence (REPLACE order)") {
    val c = DerbyDb.conn()
    createTable(c, "pz_dup")
    val data = Seq((1, 10, 100), (2, 20, 200), (1, 10, 999))
    JdbcReplaceSink.writePartition(rows(data), c, cfg("pz_dup", batchSize = 10))
    assert(dump(c, "pz_dup")((1, 10))._1 === 999)
    // and across chunks: a later chunk's row replaces an earlier chunk's
    val data2 = Seq((2, 20, 201), (3, 30, 300), (2, 20, 555))
    JdbcReplaceSink.writePartition(rows(data2), c, cfg("pz_dup", batchSize = 2))
    assert(dump(c, "pz_dup")((2, 20))._1 === 555)
    c.close()
  }

  test("distributed write: foreachPartition loads through real connections") {
    val c = DerbyDb.conn()
    createTable(c, "pz_dist")
    c.close()
    val df = (1 to 50).map(i => (i, i, i * 2)).toDF("supc", "customer_id", "price_zone")
      .repartition(4)
    JdbcReplaceSink.write(df, cfg("pz_dist", batchSize = 8), new DerbyConnFactory)
    val c2 = DerbyDb.conn()
    val state = dump(c2, "pz_dist")
    assert(state.size === 50)
    assert(state((17, 17))._1 === 34)
    c2.close()
  }

  test("binary key column: replace + in-chunk dedup bind real byte arrays") {
    // The DELETE must bind the ORIGINAL Array[Byte] (setObject cannot
    // bind the comparable-wrapped Seq the dedup map keys on).
    val c = DerbyDb.conn()
    val st = c.createStatement()
    st.execute(
      """CREATE TABLE pz_bin (
        |  doc_hash VARCHAR(16) FOR BIT DATA NOT NULL, price_zone INT,
        |  arrived_time VARCHAR(32), PRIMARY KEY (doc_hash))""".stripMargin)
    st.close()
    val binCfg = JdbcReplaceSink.Config(
      table = "pz_bin",
      columns = Seq("doc_hash", "price_zone"),
      auditColumns = Seq("arrived_time" -> "2024-06-01 00:00:00"),
      batchSize = 10,
      dialect = JdbcReplaceSink.DeleteThenInsert,
      keyColumns = Seq("doc_hash"))
    def key(s: String): Array[Byte] = s.getBytes("UTF-8")
    // two byte-EQUAL keys (distinct array instances) in one chunk: the
    // dedup must keep the last, and the pre-existing row must be replaced
    val pre = c.prepareStatement("INSERT INTO pz_bin VALUES (?, ?, ?)")
    pre.setObject(1, key("k1")); pre.setInt(2, 111); pre.setString(3, "old")
    pre.executeUpdate(); pre.close()
    val data = Seq((key("k1"), 100), (key("k2"), 200), (key("k1"), 999))
      .toDF("doc_hash", "price_zone").collect().iterator
    val n = JdbcReplaceSink.writePartition(data, c, binCfg)
    assert(n === 3)
    val rs = c.createStatement().executeQuery(
      "SELECT doc_hash, price_zone, arrived_time FROM pz_bin")
    val out = scala.collection.mutable.Map[String, (Int, String)]()
    while (rs.next()) {
      out(new String(rs.getBytes(1), "UTF-8")) = (rs.getInt(2), rs.getString(3))
    }
    rs.close()
    if (!c.getAutoCommit) c.commit()
    assert(out === Map(
      "k1" -> ((999, "2024-06-01 00:00:00")),
      "k2" -> ((200, "2024-06-01 00:00:00"))))
    c.close()
  }

  test("statement builders emit valid ANSI for the delete/insert dialect") {
    val k = cfg("pz_sql")
    assert(JdbcReplaceSink.deleteSql(k) ===
      "DELETE FROM pz_sql WHERE supc = ? AND customer_id = ?")
    assert(JdbcReplaceSink.insertSql(k) ===
      "INSERT INTO pz_sql (supc, customer_id, price_zone, arrived_time) VALUES (?, ?, ?, ?)")
    // config validation: DeleteThenInsert without keys is rejected
    intercept[IllegalArgumentException] {
      JdbcReplaceSink.Config("t", Seq("a"), dialect = JdbcReplaceSink.DeleteThenInsert)
    }
  }
}
