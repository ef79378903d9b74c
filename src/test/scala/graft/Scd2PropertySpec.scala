package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.Scd2
import java.sql.Date

/** SURVEY §5.3 — property-based SCD2 invariants over random snapshot
  * sequences (ScalaCheck generators driven with deterministic seeds): per
  * key exactly one open row; `deleted_flg` ⟺ closed; intervals contiguous
  * from first appearance; identical re-delivery is a no-op. */
class Scd2PropertySpec extends AnyFunSuite with SparkTestSession {

  private val spec = Scd2.DimSpec("id", Seq("v"))
  private val schema = StructType(Seq(
    StructField("id", StringType), StructField("v", StringType),
    StructField("effective_from", DateType), StructField("effective_to", DateType),
    StructField("deleted_flg", BooleanType)))
  private val stgSchema = StructType(schema.fields.take(2))

  private def df(rows: Seq[Row], s: StructType): DataFrame =
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), s)

  // a snapshot: subset of 5 keys with values from a small alphabet (nulls
  // included to exercise the null-rejecting change detection)
  private val genSnapshot: Gen[Seq[(String, String)]] = for {
    keys <- Gen.someOf(Seq("a", "b", "c", "d", "e"))
    vals <- Gen.listOfN(keys.size, Gen.oneOf("1", "2", "3", null))
  } yield keys.toSeq.zip(vals)

  private val genRun: Gen[List[Seq[(String, String)]]] =
    Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, genSnapshot))

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("invariants hold over 30 random snapshot sequences") {
    (1L to 30L).foreach { seed =>
      val snapshots = sample(genRun, seed)
      val dates = (1 to snapshots.size).map(i => Date.valueOf(f"2021-01-$i%02d"))
      var dim = df(Seq.empty, schema)
      snapshots.zip(dates).foreach { case (snap, d) =>
        val stg = df(snap.map { case (k, v) => Row(k, v) }, stgSchema)
        dim = df(Scd2.merge(dim, stg, spec, d).collect().toSeq, schema)
      }
      val rows = dim.collect().toSeq
      val byKey = rows.groupBy(_.getString(0))
      byKey.foreach { case (k, krows) =>
        assert(krows.count(r => r.getDate(3).toString == "3000-01-01" &&
          !r.getBoolean(4)) === 1, s"seed=$seed key=$k: exactly one open row")
        val sorted = krows.sortBy(_.getDate(2).toString)
        sorted.sliding(2).foreach {
          case Seq(a, b) =>
            assert(a.getDate(3).toString === b.getDate(2).toString,
              s"seed=$seed key=$k: intervals contiguous")
          case _ =>
        }
      }
      rows.foreach { r =>
        assert((r.getDate(3).toString == "3000-01-01") === !r.getBoolean(4),
          s"seed=$seed: deleted_flg marks exactly the closed rows")
      }
    }
  }

  test("identical re-delivery is a no-op over 20 random snapshots") {
    (100L to 119L).foreach { seed =>
      val snap = sample(genSnapshot, seed)
      val stg = df(snap.map { case (k, v) => Row(k, v) }, stgSchema)
      val once = Scd2.merge(df(Seq.empty, schema), stg, spec, Date.valueOf("2021-01-01"))
        .collect().toSet
      val twice = Scd2.merge(df(once.toSeq, schema), stg, spec, Date.valueOf("2021-01-02"))
        .collect().toSet
      assert(twice === once, s"seed=$seed")
    }
  }
}
