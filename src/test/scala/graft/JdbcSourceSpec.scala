package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.io.Sources

/** S5 — the JDBC source binding (the reference's primary ingest,
  * main.py:65-94) exercised against a live embedded Derby database (Derby
  * ships with Spark's jars, so this needs no extra dependency): the
  * `info.*` tables are created and populated over JDBC, then read back
  * through the production `JdbcSourceDb`, asserting the reference rename
  * projections (`patronymic`→`patrinymic` main.py:70, `account`→
  * `account_num` main.py:81, 91). */
class JdbcSourceSpec extends AnyFunSuite with SparkTestSession {

  test("JdbcSourceDb reads info.* over JDBC and applies the rename projections") {
    val url = "jdbc:derby:memory:graftjdbc;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE SCHEMA info")
      st.execute("""CREATE TABLE info.clients (
        client_id VARCHAR(10), last_name VARCHAR(20), first_name VARCHAR(20),
        patronymic VARCHAR(20), date_of_birth DATE, passport_num VARCHAR(20),
        passport_valid_to DATE, phone VARCHAR(20))""")
      st.execute("""INSERT INTO info.clients VALUES
        ('c1', 'L', 'F', 'M', DATE('1990-05-01'), 'P100', DATE('2030-01-01'), '+7900')""")
      st.execute("""CREATE TABLE info.accounts (
        account VARCHAR(10), valid_to DATE, client VARCHAR(10))""")
      st.execute("INSERT INTO info.accounts VALUES ('a1', DATE('2030-01-01'), 'c1')")
      st.execute("CREATE TABLE info.cards (card_num VARCHAR(10), account VARCHAR(10))")
      st.execute("INSERT INTO info.cards VALUES ('cd1', 'a1')")
      st.close()

      val db = new Sources.JdbcSourceDb(url, new java.util.Properties())

      val clients = db.clients(spark)
      val ccols = clients.columns.map(_.toLowerCase).toSet
      assert(ccols.contains("patrinymic") && !ccols.contains("patronymic"))
      val crow = clients.collect()
      assert(crow.length === 1)
      assert(crow.head.getString(crow.head.fieldIndex("patrinymic")) === "M")

      val accounts = db.accounts(spark)
      val acols = accounts.columns.map(_.toLowerCase).toSet
      assert(acols.contains("account_num") && !acols.contains("account"))
      assert(accounts.count() === 1)

      val cards = db.cards(spark)
      val kcols = cards.columns.map(_.toLowerCase).toSet
      assert(kcols.contains("account_num") && !kcols.contains("account"))
      val krow = cards.collect().head
      assert(krow.getString(krow.fieldIndex("account_num")) === "a1")
    } finally {
      conn.close()
      // drop the in-memory db so reruns in the same JVM start clean
      try java.sql.DriverManager.getConnection("jdbc:derby:memory:graftjdbc;drop=true")
      catch { case _: java.sql.SQLException => () } // drop always "fails" with 08006
    }
  }
}
