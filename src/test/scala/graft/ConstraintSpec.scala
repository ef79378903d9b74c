package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.catalog.TableCatalog
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Write-path CHECK constraints (the Delta invariant model): registered
  * once as table metadata, enforced inline in every later write's own
  * scan — a violating batch fails BEFORE the commit point, so the
  * version pointer never moves and no cleanup is needed. */
class ConstraintSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def freshCat(): TableCatalog =
    new TableCatalog(spark, Files.createTempDirectory("cons-cat").toString)

  test("ALTER-time validation: existing violations refuse the constraint") {
    val cat = freshCat()
    cat.replaceAtomic("t", Seq((1L, 5L), (2L, -3L)).toDF("k", "v"))
    val e = intercept[IllegalArgumentException](
      cat.addConstraint("t", "v_pos", "v >= 0"))
    assert(e.getMessage.contains("1 existing row"))
    assert(cat.constraintsOf("t").isEmpty)
    cat.addConstraint("t", "k_pos", "k > 0") // clean one registers
    assert(cat.constraintsOf("t") === Seq("k_pos" -> "k > 0"))
    // duplicate name and unresolvable predicate are loud
    assertThrows[IllegalArgumentException](
      cat.addConstraint("t", "k_pos", "k > 1"))
    assertThrows[Exception](cat.addConstraint("t", "ghost", "no_such_col > 0"))
  }

  test("a violating append fails before the commit point") {
    val cat = freshCat()
    val v1 = cat.replaceAtomic("t", Seq((1L, 5L)).toDF("k", "v"))
    cat.addConstraint("t", "v_pos", "v >= 0")
    val e = intercept[Exception](
      cat.appendAtomic("t", Seq((2L, -1L)).toDF("k", "v")))
    assert(e.getMessage.contains("v_pos") ||
      e.getCause != null && e.getCause.getMessage.contains("v_pos"),
      s"error must name the constraint: ${e.getMessage}")
    // the pointer never moved; the table still reads clean
    assert(cat.currentVersion("t").contains(v1))
    assert(cat.read("t").count() === 1L)
    // a conforming append lands normally
    cat.appendAtomic("t", Seq((2L, 7L)).toDF("k", "v"))
    assert(cat.read("t").count() === 2L)
  }

  test("NULL predicate results are violations; drop re-allows") {
    val cat = freshCat()
    cat.overwrite("p", Seq((1L, Some(5L))).toDF("k", "v"))
    cat.addConstraint("p", "v_pos", "v >= 0")
    // v IS NULL -> predicate NULL -> violation (3VL assertion rule)
    assertThrows[Exception](
      cat.append("p", Seq((2L, None: Option[Long])).toDF("k", "v")))
    cat.dropConstraint("p", "v_pos")
    cat.append("p", Seq((2L, None: Option[Long])).toDF("k", "v"))
    assert(cat.read("p").count() === 2L)
    assertThrows[IllegalArgumentException](cat.dropConstraint("p", "v_pos"))
  }

  test("SQL INSERT inherits enforcement through the commit verbs") {
    val cat = freshCat()
    cat.replaceAtomic("t", Seq((1L, 5L)).toDF("k", "v"))
    cat.addConstraint("t", "v_pos", "v >= 0")
    val name = "gcons" + System.nanoTime()
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.sql.GraftSqlCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", cat.root)
    assertThrows[Exception](
      spark.sql(s"INSERT INTO $name.t VALUES (9, -9)"))
    assert(cat.read("t").count() === 1L)
    spark.sql(s"INSERT INTO $name.t VALUES (9, 9)")
    assert(cat.read("t").count() === 2L)
  }

  test("plain->versioned conversion preserves registered constraints") {
    val cat = freshCat()
    cat.overwrite("t", Seq((1L, 5L)).toDF("k", "v")) // plain layout
    cat.addConstraint("t", "v_pos", "v >= 0")
    // first versioned commit sweeps the shadowed plain files — the
    // constraint sidecar is table metadata, not file metadata, and
    // must survive the sweep
    cat.replaceAtomic("t", Seq((1L, 5L), (2L, 6L)).toDF("k", "v"))
    assert(cat.constraintsOf("t") === Seq("v_pos" -> "v >= 0"))
    assertThrows[Exception](
      cat.appendAtomic("t", Seq((3L, -1L)).toDF("k", "v")))
    assert(cat.read("t").count() === 2L)
  }

  test("a corrupt constraints sidecar is an incident, not an empty list") {
    val cat = freshCat()
    cat.replaceAtomic("t", Seq((1L, 5L)).toDF("k", "v"))
    cat.addConstraint("t", "v_pos", "v >= 0")
    Files.write(Paths.get(cat.path("t"), "_constraints.json"),
      "{broken".getBytes, StandardOpenOption.TRUNCATE_EXISTING)
    val e = intercept[IllegalStateException](
      cat.appendAtomic("t", Seq((2L, 1L)).toDF("k", "v")))
    assert(e.getMessage.contains("_constraints.json"))
  }
}
