package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.catalog.TableCatalog
import graft.streaming.ChangeFeed
import java.nio.file.{Files, Paths}

/** The partitioned change-feed mirror: the apply writes O(changed
  * partitions), untouched partition files are left byte-identical, a
  * fully-deleted partition's directory disappears, and replays
  * reconverge per partition. */
class MirrorPartitionedSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def fresh(): (TableCatalog, java.nio.file.Path) = {
    val root = Files.createTempDirectory("cdcpart")
    (new TableCatalog(spark, root.resolve("wh").toString),
      root.resolve("src.offset"))
  }

  private def rows(cat: TableCatalog, t: String): Set[(String, Long, Long)] =
    cat.read(t).select(col("dt"), col("id"), col("v"))
      .as[(String, Long, Long)].collect().toSet

  private def partFiles(cat: TableCatalog, t: String, p: String): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    val dir = Paths.get(cat.path(t), s"dt=$p")
    if (!Files.exists(dir)) Map.empty
    else {
      val s = Files.walk(dir)
      try s.iterator().asScala.filter(Files.isRegularFile(_))
        .map(f => f.toString -> Files.getLastModifiedTime(f).toMillis).toMap
      finally s.close()
    }
  }

  test("delta applies touch only the partitions the feed names") {
    val (cat, ckpt) = fresh()
    val base = (0 until 400).map(i =>
      (s"d${i % 4}", i.toLong, i.toLong)).toDF("dt", "id", "v")
    cat.replaceAtomic("src", base)
    assert(ChangeFeed.mirrorPartitioned(cat, "src", "dst",
      Seq("dt", "id"), "dt", ckpt) === ChangeFeed.Resync(1L))
    assert(rows(cat, "dst") === rows(cat, "src"))
    // the replica is partition-structured
    assert(Files.exists(Paths.get(cat.path("dst"), "dt=d2")))
    val d0Before = partFiles(cat, "dst", "d0")
    assert(d0Before.nonEmpty)
    // an append touching ONLY d1: d0's files must not move a byte
    cat.appendAtomic("src", Seq(("d1", 1000L, 1000L)).toDF("dt", "id", "v"))
    assert(ChangeFeed.mirrorPartitioned(cat, "src", "dst",
      Seq("dt", "id"), "dt", ckpt) === ChangeFeed.Delta(1L, 2L))
    assert(rows(cat, "dst") === rows(cat, "src"))
    assert(partFiles(cat, "dst", "d0") === d0Before,
      "an untouched partition was rewritten — the apply is not O(delta)")
  }

  test("a fully-deleted partition's directory disappears; replay converges") {
    val (cat, ckpt) = fresh()
    val base = (0 until 100).map(i =>
      (s"d${i % 4}", i.toLong, i.toLong)).toDF("dt", "id", "v")
    cat.replaceAtomic("src", base)
    ChangeFeed.mirrorPartitioned(cat, "src", "dst", Seq("dt", "id"), "dt", ckpt)
    // v2 drops every d3 row and bumps one d1 row
    cat.replaceAtomic("src", cat.read("src")
      .filter(col("dt") =!= "d3")
      .withColumn("v", when(col("dt") === "d1" && col("id") === 1L,
        col("v") + 100).otherwise(col("v"))))
    assert(ChangeFeed.mirrorPartitioned(cat, "src", "dst",
      Seq("dt", "id"), "dt", ckpt) === ChangeFeed.Delta(1L, 2L))
    assert(rows(cat, "dst") === rows(cat, "src"))
    assert(!Files.exists(Paths.get(cat.path("dst"), "dt=d3")),
      "an emptied partition must disappear, like deleteWhere's purge")
    // crash window: offset regresses, the same range replays
    Files.write(ckpt, "1".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(ChangeFeed.mirrorPartitioned(cat, "src", "dst",
      Seq("dt", "id"), "dt", ckpt) === ChangeFeed.Delta(1L, 2L))
    assert(rows(cat, "dst") === rows(cat, "src"))
    assert(!Files.exists(Paths.get(cat.path("dst"), "dt=d3")))
  }

  test("NULL partition-key rows route to the NULL partition, not the void") {
    val (cat, ckpt) = fresh()
    def df(rs: Seq[(Option[String], Long, Long)]) =
      rs.toDF("dt", "id", "v")
    val base = df(Seq((Some("d0"), 0L, 0L), (Some("d1"), 1L, 1L),
      (None, 2L, 2L), (None, 3L, 3L)))
    cat.replaceAtomic("src", base)
    ChangeFeed.mirrorPartitioned(cat, "src", "dst", Seq("dt", "id"), "dt", ckpt)
    def all(t: String): Set[(Option[String], Long, Long)] =
      cat.read(t).select(col("dt"), col("id"), col("v"))
        .as[(Option[String], Long, Long)].collect().toSet
    assert(all("dst") === all("src"))
    val d0Before = partFiles(cat, "dst", "d0")
    // v2 touches ONLY null-keyed rows: update id=2, delete id=3
    cat.replaceAtomic("src", df(Seq((Some("d0"), 0L, 0L),
      (Some("d1"), 1L, 1L), (None, 2L, 22L))))
    assert(ChangeFeed.mirrorPartitioned(cat, "src", "dst",
      Seq("dt", "id"), "dt", ckpt) === ChangeFeed.Delta(1L, 2L))
    assert(all("dst") === all("src"),
      "null-keyed changes were silently dropped from the replica")
    assert(partFiles(cat, "dst", "d0") === d0Before,
      "a non-null partition was rewritten by a null-only delta")
    // v3 deletes the LAST null-keyed row: the NULL directory disappears
    cat.replaceAtomic("src", df(Seq((Some("d0"), 0L, 0L), (Some("d1"), 1L, 1L))))
    ChangeFeed.mirrorPartitioned(cat, "src", "dst", Seq("dt", "id"), "dt", ckpt)
    assert(all("dst") === all("src"))
    assert(!Files.exists(Paths.get(cat.path("dst"),
      "dt=__HIVE_DEFAULT_PARTITION__")),
      "an emptied NULL partition must disappear like any other")
  }

  test("empty-string partition values are refused, not silently NULLed") {
    val (cat, _) = fresh()
    cat.append("flat", Seq(("", 1L, 1L), ("d0", 2L, 2L)).toDF("dt", "id", "v"))
    // the Hive layout stores "" in the NULL directory — a silent key
    // rewrite on round-trip; the partition-granular apply refuses it
    val e = intercept[IllegalArgumentException](
      cat.overwritePartitions("flat2",
        Seq(("", 1L, 1L)).toDF("dt", "id", "v"), "dt", Seq("")))
    assert(e.getMessage.contains("empty-string"))
  }

  test("partCol outside the keys is refused up front") {
    val (cat, ckpt) = fresh()
    cat.replaceAtomic("src", Seq(("d0", 1L, 1L)).toDF("dt", "id", "v"))
    val e = intercept[IllegalArgumentException](
      ChangeFeed.mirrorPartitioned(cat, "src", "dst", Seq("id"), "dt", ckpt))
    assert(e.getMessage.contains("key column"))
  }
}
