package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{IncrementalAgg, Sketches, Triangles}
import graft.etl.SnapshotDiff

/** Randomized invariants for the round-5-continuation operators — the
  * guarantees that must hold on ANY input, not just the oracle corpus:
  * partial-state merges equal direct aggregation under arbitrary
  * batching, Count-Min never underestimates, oriented triangle counting
  * matches a naive reference, and CDC round trips reconstruct exactly. */
class OpsPropertySpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g(Gen.Parameters.default, Seed(seed)).getOrElse(fail(s"gen failed @$seed"))

  test("IncrementalAgg: merge over ANY batching equals the direct aggregate") {
    val rowsGen = Gen.listOfN(120, for {
      k <- Gen.choose(1L, 8L)
      v <- Gen.choose(-1000L, 1000L)
      b <- Gen.choose(0, 4) // arbitrary batch assignment
    } yield (k, v, s"b$b"))
    (1 to 5).foreach { i =>
      val rows = sample(rowsGen, i.toLong)
      val df = rows.toDF("k", "v", "b")
      val states = rows.map(_._3).distinct.map(b =>
        IncrementalAgg.partials(df.filter(col("b") === b), Seq("k"), col("v"))
          .withColumn("b", lit(b)))
        .reduce(_ unionByName _)
      val merged = IncrementalAgg.merge(states, Seq("k")).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      val direct = IncrementalAgg.partials(df, Seq("k"), col("v")).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      assert(merged === direct, s"iteration $i")
      // compaction at any cutoff preserves the merge
      val compacted = IncrementalAgg.compact(states, Seq("k"), "b", "b2")
      val mergedC = IncrementalAgg.merge(compacted, Seq("k")).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      assert(mergedC === direct, s"compacted iteration $i")
    }
  }

  test("Count-Min: estimates never fall below true counts on random skewed data") {
    val dataGen = Gen.listOfN(300, Gen.frequency(
      (5, Gen.choose(1L, 5L)),      // heavy keys
      (1, Gen.choose(6L, 5000L))))  // long tail
    (1 to 3).foreach { i =>
      val data = sample(dataGen, 100L + i)
      val exact = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val df = data.toDF("k")
      val sketch = Sketches.countMinBuild(df, col("k"), depth = 3, width = 32)
      val est = Sketches.countMinEstimate(sketch,
        exact.keys.toSeq.toDF("k"), col("k"), depth = 3, width = 32)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      exact.foreach { case (k, n) =>
        assert(est(k) >= n, s"iteration $i: key $k est ${est(k)} < exact $n")
      }
    }
  }

  test("Triangles: oriented counting equals the naive reference on random graphs") {
    val edgeGen = Gen.listOfN(60, for {
      a <- Gen.choose(1L, 14L); b <- Gen.choose(1L, 14L) if a != b
    } yield (math.min(a, b), math.max(a, b)))
    (1 to 5).foreach { i =>
      val edges = sample(edgeGen, 200L + i).distinct
      val got = Triangles.perVertexCounts(edges.toDF("a", "b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // naive reference: enumerate vertex triples over the edge set
      val es = edges.toSet
      def adj(x: Long, y: Long) = es((math.min(x, y), math.max(x, y)))
      val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val naive = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for {
        ia <- verts.indices; ib <- ia + 1 until verts.size; ic <- ib + 1 until verts.size
        (a, b, c) = (verts(ia), verts(ib), verts(ic))
        if adj(a, b) && adj(b, c) && adj(a, c)
      } { naive(a) += 1; naive(b) += 1; naive(c) += 1 }
      assert(got === naive.toMap, s"iteration $i over ${edges.size} edges")
    }
  }

  test("SnapshotDiff: changes/applyChanges round trip on random snapshots with nulls") {
    val snapGen = Gen.listOfN(30, for {
      k <- Gen.choose(1L, 20L)
      v <- Gen.option(Gen.oneOf("a", "b", "c"))
    } yield (k, v)).map(_.distinctBy(_._1))
    (1 to 5).foreach { i =>
      val o = sample(snapGen, 300L + i)
      val n = sample(snapGen, 400L + i)
      val odf = o.toDF("k", "v"); val ndf = n.toDF("k", "v")
      val cs = SnapshotDiff.changes(odf, ndf, Seq("k"), Seq("v"))
      val rebuilt = SnapshotDiff.applyChanges(odf, cs, Seq("k"), Seq("v"))
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getString(1)))).toSet
      assert(rebuilt === n.toSet, s"iteration $i")
    }
  }

  test("groupedNtile: closed form equals the window ntile on random groups") {
    import org.apache.spark.sql.expressions.Window
    // adversarial sizes: groups smaller than k, equal to k, any remainder,
    // heavy duplicate order-values (tie-break carried entirely by id)
    val rowsGen = Gen.listOfN(160, for {
      g <- Gen.choose(0, 9)
      v <- Gen.choose(0L, 3L)
    } yield (s"g$g", v)).map(_.zipWithIndex.map { case ((g, v), i) =>
      (g, v, i.toLong)
    })
    (1 to 4).foreach { i =>
      val df = sample(rowsGen, 500L + i).toDF("grp", "v", "id")
      for (k <- Seq(1, 3, 7)) {
        val w = Window.partitionBy("grp").orderBy(col("v"), col("id"))
        val want = df.withColumn("b", ntile(k).over(w)).collect()
          .map(r => (r.getString(0), r.getLong(2)) -> r.getInt(3)).toMap
        val got = graft.ops.Selection.groupedNtile(df, Seq("grp"),
            Seq("v", "id"), k, numPartitions = 7)
          .collect().map(r => (r.getString(0), r.getLong(2)) ->
            r.getInt(r.fieldIndex("bucket_no"))).toMap
        assert(got === want, s"iteration $i k=$k")
      }
    }
  }

  test("luhnValid: computed check digits pass, any single-digit mutation fails") {
    val baseGen = Gen.listOfN(15, Gen.choose(0, 9))
    def checkDigit(base: List[Int]): Int = {
      // standard Luhn check-digit construction over the reversed base
      val s = base.reverse.zipWithIndex.map { case (d, i) =>
        if (i % 2 == 0) { val x = d * 2; if (x > 9) x - 9 else x } else d
      }.sum
      (10 - s % 10) % 10
    }
    val cases = (1 to 20).map { i =>
      val base = sample(baseGen, 900L + i)
      val pan = (base :+ checkDigit(base)).mkString
      val mutPos = sample(Gen.choose(0, 15), 950L + i)
      val mutated = pan.updated(mutPos,
        ('0' + (pan(mutPos) - '0' + 1 + i % 9) % 10).toChar)
      (pan, mutated)
    }
    val out = cases.toDF("pan", "mut")
      .select(graft.ops.Pii.luhnValid(col("pan")).as("ok"),
        graft.ops.Pii.luhnValid(col("mut")).as("mok"),
        col("pan"), col("mut"))
      .collect()
    out.foreach { r =>
      assert(r.getBoolean(0), s"valid PAN rejected: ${r.getString(2)}")
      if (r.getString(2) != r.getString(3))
        assert(!r.getBoolean(1),
          s"single-digit mutation accepted: ${r.getString(3)}")
    }
  }
}
