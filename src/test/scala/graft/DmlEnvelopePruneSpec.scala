package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.catalog.TableCatalog
import java.nio.file.{Files, Paths}

/** Envelope leaf pruning for DATA-COLUMN row-level SQL (r18): a
  * predicate over non-partition columns kept the whole-table posture —
  * with a FRESH skipping index, leaves whose every file provably holds
  * no match now carry byte-identical. A wrong skip here is a silently
  * missed UPDATE, so this spec is adversarial: boundary values, stale
  * indexes, per-file (not per-leaf) envelopes, all-NULL files. */
class DmlEnvelopePruneSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private var seq = 0
  private def freshSqlCat(): (TableCatalog, String) = {
    val root = Files.createTempDirectory("envdml").toString
    seq += 1
    val name = s"genv$seq"
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.sql.GraftSqlCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    (new TableCatalog(spark, root), name)
  }

  private def leafFiles(cat: TableCatalog, table: String,
      rel: String): Set[String] = {
    import scala.jdk.CollectionConverters._
    val p = Paths.get(cat.path(table), rel)
    if (!Files.exists(p)) Set.empty
    else {
      val st = Files.walk(p)
      try st.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map(f => p.relativize(f).toString).toSet
      finally st.close()
    }
  }

  test("a fresh skipping index prunes data-column UPDATEs to the " +
      "leaves that can match: disjoint-envelope leaves carry " +
      "byte-identical (file-name pins), boundary values keep their " +
      "leaf, and every matching row updates") {
    val (cat, g) = freshSqlCat()
    // leaves y=a (k in 0..99), y=b (k in 1000..1099), y=c (k in 2000..2099)
    spark.sql(s"CREATE TABLE $g.t (k BIGINT, v BIGINT, y STRING) " +
      "PARTITIONED BY (y)")
    val rows = (0L to 99L).map(k => (k, k, "a")) ++
      (1000L to 1099L).map(k => (k, k, "b")) ++
      (2000L to 2099L).map(k => (k, k, "c"))
    cat.insertPartitioned("t", rows.toDF("k", "v", "y"))
    cat.analyze("t", skipCols = Seq("k"))
    val aPin = leafFiles(cat, "t", "y=a")
    val cPin = leafFiles(cat, "t", "y=c")
    assert(aPin.nonEmpty && cPin.nonEmpty)
    // k=1050 lives only in y=b — the envelope must exclude a and c
    spark.sql(s"UPDATE $g.t SET v = v + 1000000 WHERE k = 1050")
    assert(leafFiles(cat, "t", "y=a") === aPin,
      "disjoint leaf y=a must carry byte-identical")
    assert(leafFiles(cat, "t", "y=c") === cPin,
      "disjoint leaf y=c must carry byte-identical")
    assert(cat.read("t").filter(col("k") === 1050L).head().getLong(1)
      === 1001050L)
    // boundary values: k = 99 (y=a max) and k = 2000 (y=c min) must
    // KEEP their leaves and update
    spark.sql(s"UPDATE $g.t SET v = -1 WHERE k = 99")
    spark.sql(s"UPDATE $g.t SET v = -2 WHERE k = 2000")
    assert(cat.read("t").filter(col("k") === 99L).head().getLong(1) === -1L)
    assert(cat.read("t").filter(col("k") === 2000L).head().getLong(1) === -2L)
    // each row-level rewrite mints NEW files, so the index is stale
    // for the NEXT statement (the prunedRead freshness rule) —
    // re-analyze re-engages pruning; range conjunct: k > 2050 touches
    // only y=c
    cat.analyze("t", skipCols = Seq("k"))
    val aPin2 = leafFiles(cat, "t", "y=a")
    spark.sql(s"UPDATE $g.t SET v = 0 WHERE k > 2050")
    assert(leafFiles(cat, "t", "y=a") === aPin2,
      "a range conjunct disjoint with y=a must leave it untouched")
    assert(cat.read("t").filter(col("k") > 2050L && col("v") =!= 0L)
      .count() === 0L)
    // totals stay exact — nothing double-updated or missed
    assert(cat.read("t").count() === 300L)
  }

  test("SAFETY: a stale index (append since analyze) disengages " +
      "pruning — a matching row in the un-indexed file still updates; " +
      "re-analyze re-engages") {
    val (cat, g) = freshSqlCat()
    spark.sql(s"CREATE TABLE $g.t (k BIGINT, v BIGINT, y STRING) " +
      "PARTITIONED BY (y)")
    cat.insertPartitioned("t",
      (0L to 49L).map(k => (k, k, "a")).toDF("k", "v", "y"))
    cat.analyze("t", skipCols = Seq("k"))
    // an append AFTER analyze: leaf y=b holds k=5000, unknown to the
    // index — pruning must NOT engage (the envelope listing is stale)
    cat.insertPartitioned("t", Seq((5000L, 5000L, "b")).toDF("k", "v", "y"))
    spark.sql(s"UPDATE $g.t SET v = -7 WHERE k = 5000")
    assert(cat.read("t").filter(col("k") === 5000L).head().getLong(1)
      === -7L, "a stale index must never hide a matching row")
    // re-analyze at the new state: pruning engages again, y=b's leaf
    // carries under a disjoint predicate
    cat.analyze("t", skipCols = Seq("k"))
    val bPin = leafFiles(cat, "t", "y=b")
    spark.sql(s"UPDATE $g.t SET v = -8 WHERE k = 25")
    assert(leafFiles(cat, "t", "y=b") === bPin)
    assert(cat.read("t").filter(col("k") === 25L).head().getLong(1) === -8L)
  }

  test("STRING envelopes prune in unsigned UTF-8 order; an un-indexed " +
      "column's predicate never prunes; IN-lists judge per value") {
    val (cat, g) = freshSqlCat()
    spark.sql(s"CREATE TABLE $g.t (url STRING, score BIGINT, y STRING) " +
      "PARTITIONED BY (y)")
    val rows = Seq(
      ("http://a.example/1", 1L, "a"), ("http://a.example/2", 2L, "a"),
      ("http://m.example/1", 3L, "b"), ("http://m.example/2", 4L, "b"),
      ("http://z.example/1", 5L, "c"), ("http://z.example/2", 6L, "c"))
    cat.insertPartitioned("t", rows.toDF("url", "score", "y"))
    cat.analyze("t", skipCols = Seq("url"))
    val aPin = leafFiles(cat, "t", "y=a")
    val cPin = leafFiles(cat, "t", "y=c")
    spark.sql(s"UPDATE $g.t SET score = 30 WHERE url = 'http://m.example/1'")
    assert(leafFiles(cat, "t", "y=a") === aPin)
    assert(leafFiles(cat, "t", "y=c") === cPin)
    assert(cat.read("t").filter(col("url") === "http://m.example/1")
      .head().getLong(1) === 30L)
    // IN over two leaves keeps exactly those two (fresh index again —
    // the previous statement's rewrite invalidated it)
    cat.analyze("t", skipCols = Seq("url"))
    val aPin2 = leafFiles(cat, "t", "y=a")
    spark.sql(s"UPDATE $g.t SET score = 0 WHERE url IN " +
      "('http://m.example/2', 'http://z.example/2')")
    assert(leafFiles(cat, "t", "y=a") === aPin2,
      "an IN-list disjoint with y=a must leave it untouched")
    assert(cat.read("t")
      .filter(col("url").isin("http://m.example/2", "http://z.example/2"))
      .filter(col("score") =!= 0L).count() === 0L)
    // predicate over a column that was never skip-indexed: whole-table
    // posture, every matching row updates
    spark.sql(s"UPDATE $g.t SET score = 100 WHERE score = 1")
    assert(cat.read("t").filter(col("score") === 100L).count() === 1L)
  }

  test("all-NULL files prune under comparisons (null-rejecting) but " +
      "a DELETE touching them by another conjunct still lands; " +
      "versioned tables prune the same way") {
    val (cat, g) = freshSqlCat()
    spark.sql(s"CREATE TABLE $g.t (k BIGINT, v BIGINT, y STRING) " +
      "PARTITIONED BY (y)")
    val rows = (0L to 49L).map(k => (k, k, "a")) ++
      (100L to 149L).map(k => (k, k, "b"))
    cat.insertPartitioned("t", rows.toDF("k", "v", "y"))
    // y=n: k is all-NULL
    cat.insertPartitioned("t",
      Seq((null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(9L),
        "n")).toDF("k", "v", "y").select(col("k").cast("long").as("k"),
        col("v").cast("long").as("v"), col("y")))
    cat.analyze("t", skipCols = Seq("k"))
    val nPin = leafFiles(cat, "t", "y=n")
    assert(nPin.nonEmpty)
    spark.sql(s"UPDATE $g.t SET v = -1 WHERE k = 120")
    assert(leafFiles(cat, "t", "y=n") === nPin,
      "an all-NULL-k leaf cannot match k=120 — it must carry")
    assert(cat.read("t").filter(col("k") === 120L).head().getLong(1) === -1L)
    // the NULL rows are still reachable by other predicates (v = 9
    // also matches the (k=9, v=9) row in y=a — TWO rows delete)
    spark.sql(s"DELETE FROM $g.t WHERE v = 9")
    assert(cat.read("t").filter(col("y") === "n").count() === 0L)
    assert(cat.read("t").count() === 99L)
  }

  test("VERSIONED pv tables prune against the pinned snapshot: the " +
      "envelope index built at the scanned version engages, disjoint " +
      "leaves hard-link through with their file NAMES intact, and the " +
      "post-commit (stale-by-version) index disengages") {
    val (cat, g) = freshSqlCat()
    cat.createPartitionedVersioned("pv",
      Seq((0L, 0L, "x")).toDF("k", "v", "y").schema, Seq("y"))
    cat.appendPartitionedVersioned("pv",
      ((0L to 49L).map(k => (k, k, "a")) ++
        (100L to 149L).map(k => (k, k, "b"))).toDF("k", "v", "y"))
    cat.analyze("pv", skipCols = Seq("k"))
    val v0 = cat.currentVersion("pv").get
    def snapLeafNames(v: Long, rel: String): Set[String] = {
      import scala.jdk.CollectionConverters._
      val p = Paths.get(cat.path("pv"), s"_v$v", rel)
      if (!Files.exists(p)) Set.empty
      else {
        val st = Files.walk(p)
        try st.iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .map(_.getFileName.toString).toSet
        finally st.close()
      }
    }
    val aPin = snapLeafNames(v0, "y=a")
    assert(aPin.nonEmpty)
    // k=120 lives only in y=b — y=a must hard-link through unchanged
    spark.sql(s"UPDATE $g.pv SET v = -1 WHERE k = 120")
    val v1 = cat.currentVersion("pv").get
    assert(v1 > v0)
    assert(snapLeafNames(v1, "y=a") === aPin,
      "a pruned pv UPDATE must carry the disjoint leaf's files " +
        "by name into the new snapshot")
    assert(cat.read("pv").filter(col("k") === 120L).head().getLong(1)
      === -1L)
    // the index named _v0 paths — stale for the new snapshot, so the
    // next data-column statement keeps the whole-table posture and
    // still lands
    spark.sql(s"UPDATE $g.pv SET v = -2 WHERE k = 25")
    assert(cat.read("pv").filter(col("k") === 25L).head().getLong(1)
      === -2L)
    assert(cat.read("pv").count() === 100L)
    // time travel serves every pre-statement snapshot
    assert(cat.readVersion("pv", v0).filter(col("k") === 120L)
      .head().getLong(1) === 120L)
  }

  test("MULTI-GENERATION tables prune data-column DML by envelope too " +
      "(r18 second sitting): a fresh composite index drops disjoint " +
      "leaves in EVERY generation — plain (pinned-listing commit) and " +
      "pv (snapshot commit) both carry them byte-identical") {
    // ---- PLAIN lazily-evolved
    val (cat, g) = freshSqlCat()
    spark.sql(s"CREATE TABLE $g.t (k BIGINT, v BIGINT, y STRING) " +
      "PARTITIONED BY (y)")
    def rows(lo: Long) = ((lo to lo + 24L).map(k => (k, k, "a")) ++
      (lo + 1000L to lo + 1024L).map(k => (k, k, "b")))
    cat.insertPartitioned("t", rows(0L).toDF("k", "v", "y"))
    cat.repartitionTableLazy("t",
      Seq(("identity", "y", 0), ("bucket", "k", 2)))
    cat.insertPartitioned("t", rows(100L).toDF("k", "v", "y"))
    assert(cat.specGenerations("t").size === 2)
    cat.analyze("t", skipCols = Seq("v"))
    def walk(rel: String): Set[String] = leafFiles(cat, "t", rel)
    val pins = Seq("y=a", "_g1/y=a").map(r => r -> walk(r)).toMap
    assert(pins.values.forall(_.nonEmpty), pins.toString)
    // v=1105 lives only in generation-1 y=b leaves — BOTH generations'
    // y=a subtrees must carry byte-identical
    spark.sql(s"UPDATE $g.t SET v = -5 WHERE v = 1105")
    pins.foreach { case (r, fs) => assert(walk(r) === fs,
      s"disjoint leaf $r must carry byte-identical (multi-gen envelope)") }
    // readPartitioned is the multi-generation PLAIN reader (cat.read
    // sees only the root layout — `_g1` is underscore-hidden to it)
    assert(cat.readPartitioned("t").filter(col("k") === 1105L)
      .head().getLong(1) === -5L)
    assert(cat.readPartitioned("t").count() === 100L)

    // ---- VERSIONED pv lazily-evolved: same engine, snapshot commit
    cat.createPartitionedVersioned("pv",
      Seq((0L, 0L, "x")).toDF("k", "v", "y").schema, Seq("y"))
    cat.appendPartitionedVersioned("pv", rows(0L).toDF("k", "v", "y"))
    cat.repartitionTableLazy("pv",
      Seq(("identity", "y", 0), ("bucket", "k", 2)))
    cat.appendPartitionedVersioned("pv", rows(100L).toDF("k", "v", "y"))
    assert(cat.specGenerations("pv").size === 2)
    cat.analyze("pv", skipCols = Seq("v"))
    val v0 = cat.currentVersion("pv").get
    def snapNames(v: Long, rel: String): Set[String] = {
      import scala.jdk.CollectionConverters._
      val p = Paths.get(cat.path("pv"), s"_v$v", rel)
      if (!Files.exists(p)) Set.empty
      else {
        val st = Files.walk(p)
        try st.iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .map(_.getFileName.toString).toSet
        finally st.close()
      }
    }
    val aPin0 = snapNames(v0, "y=a")
    val aPin1 = snapNames(v0, "_g1/y=a")
    assert(aPin0.nonEmpty && aPin1.nonEmpty)
    spark.sql(s"UPDATE $g.pv SET v = -7 WHERE v = 1105")
    val v1 = cat.currentVersion("pv").get
    assert(snapNames(v1, "y=a") === aPin0,
      "gen-0 disjoint leaf must hard-link through by name")
    assert(snapNames(v1, "_g1/y=a") === aPin1,
      "gen-1 disjoint leaf must hard-link through by name")
    assert(cat.read("pv").filter(col("k") === 1105L).head().getLong(1)
      === -7L)
    assert(cat.read("pv").count() === 100L)
    // time travel serves the pre-statement multi-gen snapshot
    assert(cat.readVersion("pv", v0).filter(col("k") === 1105L)
      .head().getLong(1) === 1105L)
  }

  test("ADVERSARIAL: an UPDATE that moves rows INTO an envelope-" +
      "pruned-out leaf refuses loudly (the clobber guard) — a " +
      "partition-scoped rewrite must never wipe an unscanned leaf — " +
      "and nothing is lost") {
    val (cat, g) = freshSqlCat()
    spark.sql(s"CREATE TABLE $g.t (k BIGINT, v BIGINT, y STRING) " +
      "PARTITIONED BY (y)")
    cat.insertPartitioned("t",
      ((0L to 49L).map(k => (k, k, "a")) ++
        (100L to 149L).map(k => (k, k, "b"))).toDF("k", "v", "y"))
    cat.analyze("t", skipCols = Seq("k"))
    val aPin = leafFiles(cat, "t", "y=a")
    // k=120 lives only in y=b, so the envelope prunes y=a out of the
    // pinned set — but SET y='a' routes the fixed row INTO y=a, whose
    // whole-leaf replace would wipe the 50 existing rows. Refuse.
    val e = intercept[Exception](
      spark.sql(s"UPDATE $g.t SET y = 'a' WHERE k = 120"))
    def rootMsg(ex: Throwable): String = {
      var c: Throwable = ex; val sb = new StringBuilder
      while (c != null) { sb.append(c.getMessage).append(' '); c = c.getCause }
      sb.toString
    }
    assert(rootMsg(e).contains("unscanned partition"), rootMsg(e))
    // nothing lost, nothing moved: both leaves intact, row unchanged
    assert(leafFiles(cat, "t", "y=a") === aPin)
    assert(cat.read("t").count() === 100L)
    assert(cat.read("t").filter(col("k") === 120L)
      .head().getAs[String]("y") === "b")
    // once the index is stale (an append since analyze), the same
    // statement takes the whole-table posture — every leaf is pinned,
    // so the cross-leaf move lands fine
    cat.insertPartitioned("t", Seq((999L, 999L, "b")).toDF("k", "v", "y"))
    spark.sql(s"UPDATE $g.t SET y = 'a' WHERE k = 120")
    assert(cat.read("t").filter(col("k") === 120L)
      .head().getAs[String]("y") === "a")
    assert(cat.read("t").count() === 101L)
  }
}
