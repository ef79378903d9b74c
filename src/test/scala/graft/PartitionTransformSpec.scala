package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.catalog.TableCatalog
import java.nio.file.{Files, Paths}

/** HIDDEN (transform) partitioning — the Iceberg `days(ts)` /
  * `bucket(n, col)` specs over the Hive plain layout: generated
  * partition columns exist only in the directory tree, INSERT supplies
  * the declared shape, SELECT never sees them, and reads prune leaf
  * directories from predicates on the SOURCE column. */
class PartitionTransformSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  /** The files the physical scan would read. `Dataset.inputFiles` only
    * recognizes stock FileTable relations, so it reports empty for the
    * catalog's wrapped tables — collect the BatchScanExec's file index
    * instead (the thing leaf pruning actually narrows). */
  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan match {
          case f: org.apache.spark.sql.execution.datasources.v2.FileScan =>
            f.fileIndex.inputFiles.toSeq
          case _ => Seq.empty[String]
        }
    }.flatten

  private var seq = 0
  private def freshSqlCat(): (TableCatalog, String) = {
    val root = Files.createTempDirectory("ptf").toString
    seq += 1
    val name = s"gptf$seq"
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.sql.GraftSqlCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    (new TableCatalog(spark, root), name)
  }

  test("days(ts): hidden generated column, Iceberg naming, schema never " +
      "shows it, INSERT supplies the declared shape") {
    val (cat, g) = freshSqlCat()
    spark.sql(s"CREATE TABLE $g.ev (k BIGINT, v BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (days(ts))")
    spark.sql(s"INSERT INTO $g.ev SELECT id AS k, id AS v, " +
      "timestamp'2024-03-01 00:30:00' + make_interval(0,0,0,0,CAST(id AS INT)) AS ts " +
      "FROM range(96)") // 96 hourly rows → 4 days
    // the layout nests ts_day; the declared schema hides it
    assert(Files.exists(Paths.get(cat.path("ev"), "ts_day=2024-03-01")))
    assert(Files.exists(Paths.get(cat.path("ev"), "ts_day=2024-03-04")))
    assert(spark.sql(s"SELECT * FROM $g.ev").columns.toSeq ===
      Seq("k", "v", "ts"))
    assert(spark.sql(s"SELECT count(*) FROM $g.ev").as[Long].head() === 96L)
    assert(spark.sql(s"SELECT sum(v) FROM $g.ev").as[Long].head() ===
      (0 until 96).sum.toLong)
    // CTAS under a transform spec lands the same layout in one statement
    spark.sql(s"CREATE TABLE $g.evc PARTITIONED BY (days(ts)) AS " +
      s"SELECT k, ts FROM $g.ev WHERE v < 48")
    assert(Files.exists(Paths.get(cat.path("evc"), "ts_day=2024-03-01")))
    assert(spark.sql(s"SELECT count(*) FROM $g.evc").as[Long].head() === 48L)
  }

  test("reads prune leaf directories from source-column predicates; " +
      "row filters keep correctness whatever the pruning") {
    val (cat, g) = freshSqlCat()
    spark.sql(s"CREATE TABLE $g.ev2 (k BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (days(ts))")
    spark.sql(s"INSERT INTO $g.ev2 SELECT id AS k, " +
      "timestamp'2024-03-01 00:30:00' + make_interval(0,0,0,0,CAST(id AS INT)) AS ts " +
      "FROM range(96)")
    val pruned = spark.sql(
      s"SELECT k FROM $g.ev2 WHERE ts >= timestamp'2024-03-03 00:00:00'")
    // the scan touches only the matching day leaves
    val dirs = scannedFiles(pruned).map(f =>
      f.split("/").find(_.startsWith("ts_day=")).getOrElse("?")).toSet
    assert(dirs === Set("ts_day=2024-03-03", "ts_day=2024-03-04"),
      s"pruning served $dirs")
    assert(pruned.count() === 48L)
    // equality day pin
    val one = spark.sql(
      s"SELECT k FROM $g.ev2 WHERE ts = timestamp'2024-03-02 10:30:00'")
    assert(scannedFiles(one).forall(_.contains("ts_day=2024-03-02")))
    assert(one.count() === 1L)
    // an upper bound prunes from the other side
    val lo = spark.sql(
      s"SELECT k FROM $g.ev2 WHERE ts < timestamp'2024-03-02 00:00:00'")
    assert(scannedFiles(lo).forall(_.contains("ts_day=2024-03-01")) ||
      scannedFiles(lo).exists(_.contains("ts_day=2024-03-02"))) // <= weakening
    assert(lo.count() === 24L)
    // a predicate matching NO leaf still answers correctly
    assert(spark.sql(s"SELECT count(*) FROM $g.ev2 " +
      "WHERE ts >= timestamp'2030-01-01 00:00:00'").as[Long].head() === 0L)
    // an IN list pins the derived day set
    val inq = spark.sql(s"SELECT k FROM $g.ev2 WHERE ts IN (" +
      "timestamp'2024-03-01 10:30:00', timestamp'2024-03-04 05:30:00')")
    val inDirs = scannedFiles(inq).map(f =>
      f.split("/").find(_.startsWith("ts_day=")).getOrElse("?")).toSet
    assert(inDirs === Set("ts_day=2024-03-01", "ts_day=2024-03-04"),
      s"IN-list pruning served $inDirs")
    assert(inq.count() === 2L)
  }

  test("bucket(n, k): equality prunes to one bucket dir; values route " +
      "by Spark's own murmur3") {
    val (cat, g) = freshSqlCat()
    spark.sql(s"CREATE TABLE $g.bt (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql(s"INSERT INTO $g.bt SELECT id AS k, id * 10 AS v FROM range(100)")
    val buckets = {
      import scala.jdk.CollectionConverters._
      val st = Files.list(Paths.get(cat.path("bt")))
      try st.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("k_bucket=")).toSet
      finally st.close()
    }
    assert(buckets.size === 4, s"expected 4 buckets, got $buckets")
    val q = spark.sql(s"SELECT v FROM $g.bt WHERE k = 42")
    assert(scannedFiles(q).map(f => f.split("/")
      .find(_.startsWith("k_bucket=")).getOrElse("?")).toSet.size === 1,
      "bucket equality must prune to one bucket dir")
    assert(q.as[Long].head() === 420L)
    assert(spark.sql(s"SELECT count(*) FROM $g.bt").as[Long].head() === 100L)
    // k IN (...) prunes to the union of the members' buckets
    val inq = spark.sql(s"SELECT v FROM $g.bt WHERE k IN (7, 42, 99)")
    assert(scannedFiles(inq).map(f => f.split("/")
      .find(_.startsWith("k_bucket=")).getOrElse("?")).toSet.size <= 3,
      "IN-list pruning must serve at most one bucket per member")
    assert(inq.as[Long].collect().sorted.toSeq === Seq(70L, 420L, 990L))
    // STRING bucket keys route and prune through the same murmur3
    spark.sql(s"CREATE TABLE $g.bs (u STRING, v BIGINT) " +
      "PARTITIONED BY (bucket(4, u))")
    spark.sql(s"INSERT INTO $g.bs SELECT concat('user-', id) AS u, " +
      "id AS v FROM range(100)")
    val sq = spark.sql(s"SELECT v FROM $g.bs WHERE u = 'user-42'")
    assert(scannedFiles(sq).map(f => f.split("/")
      .find(_.startsWith("u_bucket=")).getOrElse("?")).toSet.size === 1,
      "string-key bucket equality must prune to one bucket dir")
    assert(sq.as[Long].head() === 42L)
  }

  test("DML on a transform table: DELETE purges by derived leaves, " +
      "UPDATE rewrites through the pinned-scan commit, OVERWRITE keeps " +
      "the spec") {
    val (cat, g) = freshSqlCat()
    spark.sql(s"CREATE TABLE $g.dml (k BIGINT, v BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (days(ts))")
    spark.sql(s"INSERT INTO $g.dml SELECT id AS k, id AS v, " +
      "timestamp'2024-03-01 12:00:00' + make_interval(0,0,0,CAST(id % 3 AS INT)) AS ts " +
      "FROM range(30)")
    def leafFiles(day: String): Set[String] = {
      import scala.jdk.CollectionConverters._
      val p = Paths.get(cat.path("dml"), s"ts_day=$day")
      if (!Files.exists(p)) Set.empty
      else {
        val st = Files.list(p)
        try st.iterator().asScala.map(_.getFileName.toString)
          .filter(_.endsWith(".parquet")).toSet
        finally st.close()
      }
    }
    val pinned03 = leafFiles("2024-03-03")
    assert(pinned03.nonEmpty)
    // DELETE with a source-column predicate: the gen-derived bounds
    // narrow the rewrite to the affected day leaves only
    spark.sql(s"DELETE FROM $g.dml WHERE ts < timestamp'2024-03-02 00:00:00'")
    assert(spark.sql(s"SELECT count(*) FROM $g.dml").as[Long].head() === 20L)
    assert(!Files.exists(Paths.get(cat.path("dml"), "ts_day=2024-03-01")),
      "the fully purged day leaf must disappear")
    assert(leafFiles("2024-03-03") === pinned03,
      "a day leaf outside the derived bound must keep its files " +
        "byte-for-byte — the rewrite is O(affected leaves)")
    // UPDATE (row-level rewrite) re-derives the hidden columns
    spark.sql(s"UPDATE $g.dml SET v = v + 1000 WHERE k % 2 = 0")
    assert(spark.sql(s"SELECT count(*) FROM $g.dml WHERE v >= 1000")
      .as[Long].head() === 10L)
    assert(spark.sql(s"SELECT count(*) FROM $g.dml").as[Long].head() === 20L)
    assert(Files.exists(Paths.get(cat.path("dml"), "ts_day=2024-03-02")),
      "the rewrite must land rows back in their derived leaves")
    // INSERT OVERWRITE keeps the transform spec alive
    spark.sql(s"INSERT OVERWRITE $g.dml SELECT 1L AS k, 1L AS v, " +
      "timestamp'2024-06-01 00:00:00' AS ts")
    assert(spark.sql(s"SELECT count(*) FROM $g.dml").as[Long].head() === 1L)
    assert(Files.exists(Paths.get(cat.path("dml"), "ts_day=2024-06-01")))
    assert(cat.partitionGen("dml").map(_.kind) === Seq("days"))
  }

  test("mixed identity + transform spec nests in declaration order; " +
      "refusals: bad kinds, name collision, transform repartition") {
    val (cat, g) = freshSqlCat()
    import org.apache.spark.sql.types._
    spark.sql(s"CREATE TABLE $g.mx (k BIGINT, region STRING, ts TIMESTAMP) " +
      "PARTITIONED BY (region, years(ts))")
    spark.sql(s"INSERT INTO $g.mx VALUES " +
      "(1, 'eu', timestamp'2023-05-01 00:00:00'), " +
      "(2, 'us', timestamp'2024-05-01 00:00:00')")
    assert(Files.exists(Paths.get(cat.path("mx"), "region=eu", "ts_year=2023")))
    assert(spark.sql(s"SELECT count(*) FROM $g.mx WHERE region = 'eu'")
      .as[Long].head() === 1L)
    // months() transform and its yyyyMM encoding
    cat.createPartitionedTransformed("mm",
      StructType.fromDDL("k BIGINT, ts TIMESTAMP"),
      Seq(("months", "ts", 0)))
    cat.insertPartitioned("mm", Seq(
      (1L, java.sql.Timestamp.valueOf("2024-02-10 00:00:00")),
      (2L, java.sql.Timestamp.valueOf("2024-11-10 00:00:00")))
      .toDF("k", "ts"))
    assert(Files.exists(Paths.get(cat.path("mm"), "ts_month=202402")))
    assert(Files.exists(Paths.get(cat.path("mm"), "ts_month=202411")))
    // refusals
    assertThrows[IllegalArgumentException](
      cat.createPartitionedTransformed("bad1",
        StructType.fromDDL("k BIGINT, ts TIMESTAMP"),
        Seq(("weeks", "ts", 0))))
    assertThrows[IllegalArgumentException](
      cat.createPartitionedTransformed("bad2",
        StructType.fromDDL("k BIGINT, v BIGINT"),
        Seq(("days", "v", 0)))) // non-temporal source
    assertThrows[IllegalArgumentException](
      cat.createPartitionedTransformed("bad3",
        StructType.fromDDL("k BIGINT, ts TIMESTAMP, ts_day DATE"),
        Seq(("days", "ts", 0)))) // generated-name collision
    assertThrows[IllegalArgumentException](
      cat.createPartitionedTransformed("bad4",
        StructType.fromDDL("k BIGINT, ts TIMESTAMP"),
        Seq(("bucket", "k", 0)))) // bucket needs n > 0
  }

  test("spec evolution crosses transform boundaries: identity→days, " +
      "transform→identity, via Scala and CALL system.repartition") {
    val (cat, g) = freshSqlCat()
    import org.apache.spark.sql.types._
    // born identity-partitioned on a string day; evolve ONTO days(ts)
    spark.sql(s"CREATE TABLE $g.ev (k BIGINT, d STRING, ts TIMESTAMP) " +
      "PARTITIONED BY (d)")
    spark.sql(s"INSERT INTO $g.ev SELECT id AS k, " +
      "CAST(CAST(timestamp'2024-03-01 06:00:00' + make_interval(0,0,0,0,CAST(id AS INT)) AS DATE) AS STRING) AS d, " +
      "timestamp'2024-03-01 06:00:00' + make_interval(0,0,0,0,CAST(id AS INT)) AS ts " +
      "FROM range(72)")
    assert(Files.exists(Paths.get(cat.path("ev"), "d=2024-03-01")))
    spark.sql(s"CALL $g.system.repartition('ev', 'days(ts)')").collect()
    assert(Files.exists(Paths.get(cat.path("ev"), "ts_day=2024-03-02")),
      "the evolved layout must nest the generated day column")
    assert(!Files.exists(Paths.get(cat.path("ev"), "d=2024-03-01")),
      "the old identity leaves must be gone")
    assert(cat.partitionGen("ev").map(_.kind) === Seq("days"))
    assert(spark.sql(s"SELECT * FROM $g.ev").columns.toSeq ===
      Seq("k", "d", "ts"))
    assert(spark.sql(s"SELECT count(*) FROM $g.ev").as[Long].head() === 72L)
    // reads prune by the NEW spec; DML narrows by it
    spark.sql(s"DELETE FROM $g.ev WHERE ts < timestamp'2024-03-02 00:00:00'")
    assert(!Files.exists(Paths.get(cat.path("ev"), "ts_day=2024-03-01")))
    assert(spark.sql(s"SELECT count(*) FROM $g.ev").as[Long].head() === 54L)
    // and back OFF the transform to identity
    cat.repartitionTable("ev", Seq("d"))
    assert(cat.partitionGen("ev").isEmpty)
    assert(Files.exists(Paths.get(cat.path("ev"), "d=2024-03-03")))
    assert(spark.sql(s"SELECT count(*) FROM $g.ev").as[Long].head() === 54L)
    // transform→transform (days → bucket) through the Scala verb
    cat.repartitionTableTransformed("ev", Seq(("bucket", "k", 4)))
    assert(cat.partitionGen("ev").map(_.kind) === Seq("bucket"))
    assert(spark.sql(s"SELECT sum(k) FROM $g.ev").as[Long].head() ===
      (18 until 72).map(_.toLong).sum)
  }

  test("truncate(w, col): int ranges and string prefixes; equality and " +
      "bounds prune; non-ASCII bounds stay conservative") {
    val (cat, g) = freshSqlCat()
    // numeric flavor: truncate(100, k) ranges ids into blocks of 100
    spark.sql(s"CREATE TABLE $g.tn (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (truncate(100, k))")
    spark.sql(s"INSERT INTO $g.tn SELECT id AS k, id AS v FROM range(350)")
    assert(Files.exists(Paths.get(cat.path("tn"), "k_trunc=0")))
    assert(Files.exists(Paths.get(cat.path("tn"), "k_trunc=300")))
    val q = spark.sql(s"SELECT v FROM $g.tn WHERE k >= 250")
    val dirs = scannedFiles(q).map(f =>
      f.split("/").find(_.startsWith("k_trunc=")).getOrElse("?")).toSet
    assert(dirs === Set("k_trunc=200", "k_trunc=300"),
      s"range pruning served $dirs")
    assert(q.count() === 100L)
    assert(spark.sql(s"SELECT count(*) FROM $g.tn WHERE k = 42")
      .as[Long].head() === 1L)
    // string flavor: truncate(1, s) shards by first letter
    spark.sql(s"CREATE TABLE $g.ts (s STRING, v BIGINT) " +
      "PARTITIONED BY (truncate(1, s))")
    spark.sql(s"INSERT INTO $g.ts VALUES ('apple', 1), ('avocado', 2), " +
      "('banana', 3), ('cherry', 4)")
    assert(Files.exists(Paths.get(cat.path("ts"), "s_trunc=a")))
    val sq = spark.sql(s"SELECT v FROM $g.ts WHERE s = 'avocado'")
    assert(scannedFiles(sq).forall(_.contains("s_trunc=a")),
      "string-prefix equality must prune to the literal's prefix dir")
    assert(sq.as[Long].head() === 2L)
    val bq = spark.sql(s"SELECT sum(v) FROM $g.ts WHERE s >= 'b'")
    assert(scannedFiles(bq).forall(f => !f.contains("s_trunc=a")),
      "an ASCII lower bound must drop earlier prefix dirs")
    assert(bq.as[Long].head() === 7L)
    // DML narrows by the derived prefix
    spark.sql(s"DELETE FROM $g.ts WHERE s < 'b'")
    assert(!Files.exists(Paths.get(cat.path("ts"), "s_trunc=a")))
    assert(spark.sql(s"SELECT count(*) FROM $g.ts").as[Long].head() === 2L)
    // refusals: zero width, non-integral-non-string source
    assertThrows[Exception](spark.sql(
      s"CREATE TABLE $g.bad (k DOUBLE) PARTITIONED BY (truncate(4, k))"))
  }

  test("hours(ts): layout, equality pruning, and the pre-epoch " +
      "fractional-second row keeps write/prune floor-div agreement") {
    val (cat, g) = freshSqlCat()
    spark.sql(s"CREATE TABLE $g.hr (k BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (hours(ts))")
    spark.sql(s"INSERT INTO $g.hr SELECT id AS k, " +
      "timestamp'2024-03-01 00:10:00' + make_interval(0,0,0,0,0,CAST(id*20 AS INT)) AS ts " +
      "FROM range(9)") // 3 hours x 3 rows
    // pre-epoch fractional second: trunc-toward-zero would misfile it
    spark.sql(s"INSERT INTO $g.hr VALUES (100, timestamp'1969-12-31 23:59:59.5')")
    val hourDirs = {
      import scala.jdk.CollectionConverters._
      val st = Files.list(Paths.get(cat.path("hr")))
      try st.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("ts_hour=")).toSet
      finally st.close()
    }
    assert(hourDirs.contains("ts_hour=-1"),
      s"the pre-epoch row must land in the floor hour, dirs: $hourDirs")
    val q = spark.sql(s"SELECT k FROM $g.hr " +
      "WHERE ts = timestamp'1969-12-31 23:59:59.5'")
    assert(q.as[Long].collect().toSeq === Seq(100L),
      "equality pruning must keep the pre-epoch row's leaf")
    val range = spark.sql(s"SELECT count(*) FROM $g.hr " +
      "WHERE ts >= timestamp'2024-03-01 01:00:00'")
    assert(range.as[Long].head() === 6L)
  }

  test("over-pruning battery: a transform table answers every predicate " +
      "exactly like the same rows unpartitioned") {
    val (_, g) = freshSqlCat()
    spark.sql(s"CREATE TABLE $g.pb (k BIGINT, s STRING, ts TIMESTAMP) " +
      "PARTITIONED BY (days(ts), bucket(4, k), truncate(2, s))")
    // deterministic mixed rows: 3 days x assorted keys/strings + nulls
    spark.sql(s"INSERT INTO $g.pb SELECT id AS k, " +
      "CASE WHEN id % 7 = 0 THEN NULL ELSE concat(substr('abcde', CAST(id % 5 AS INT) + 1, 1), 'x', id) END AS s, " +
      "CASE WHEN id % 11 = 0 THEN NULL ELSE timestamp'2024-03-01 06:00:00' + make_interval(0,0,0,0,CAST(id % 72 AS INT)) END AS ts " +
      "FROM range(300)")
    // materialize the comparison copy — a view over the same table
    // would re-plan through the same pruning and prove nothing
    val full = spark.sql(s"SELECT * FROM $g.pb")
    spark.createDataFrame(
      java.util.Arrays.asList(full.collect(): _*), full.schema)
      .createOrReplaceTempView("pb_plain")
    val preds = Seq(
      "ts >= timestamp'2024-03-02 00:00:00'",
      "ts < timestamp'2024-03-02 12:00:00'",
      "ts = timestamp'2024-03-01 07:00:00'",
      "ts BETWEEN timestamp'2024-03-01 20:00:00' AND timestamp'2024-03-03 04:00:00'",
      "ts IN (timestamp'2024-03-01 06:00:00', timestamp'2024-03-03 05:00:00')",
      "k = 42", "k IN (1, 99, 250)", "k >= 280", "k < 3",
      "s = 'ax5'", "s >= 'c'", "s < 'b'", "s IN ('bx1', 'ex4', 'nope')",
      "ts IS NULL", "s IS NULL",
      "k = 42 AND ts >= timestamp'2024-03-01 00:00:00'",
      "s >= 'b' AND k IN (6, 16, 26)",
      "ts >= timestamp'2024-03-02 00:00:00' OR k = 1")
    preds.foreach { p =>
      val viaTransform = spark.sql(
        s"SELECT count(*) AS n, sum(k) AS sk FROM $g.pb WHERE $p").head()
      val viaPlain = spark.sql(
        s"SELECT count(*) AS n, sum(k) AS sk FROM pb_plain WHERE $p").head()
      assert(viaTransform === viaPlain,
        s"pruning changed results for [$p]: $viaTransform != $viaPlain")
    }
  }

  test("nested temporal battery: years/months/hours all derived from " +
      "ONE source column prune together and never change results") {
    val (cat, g) = freshSqlCat()
    spark.sql(s"CREATE TABLE $g.nt (k BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (years(ts), months(ts), hours(ts))")
    // 2 years x assorted months/hours
    spark.sql(s"INSERT INTO $g.nt SELECT id AS k, " +
      "timestamp'2023-11-30 22:00:00' + make_interval(0,0,0,0,CAST(id * 37 % 2000 AS INT)) AS ts " +
      "FROM range(400)")
    assert(Files.exists(Paths.get(cat.path("nt"), "ts_year=2023")))
    assert(Files.exists(Paths.get(cat.path("nt"), "ts_year=2024")))
    val full = spark.sql(s"SELECT * FROM $g.nt")
    spark.createDataFrame(
      java.util.Arrays.asList(full.collect(): _*), full.schema)
      .createOrReplaceTempView("nt_plain")
    val preds = Seq(
      "ts >= timestamp'2024-01-01 00:00:00'",
      "ts < timestamp'2023-12-15 00:00:00'",
      "ts = timestamp'2023-11-30 22:00:00'",
      "ts BETWEEN timestamp'2023-12-20 00:00:00' AND timestamp'2024-02-01 00:00:00'",
      "ts IN (timestamp'2023-11-30 22:00:00', timestamp'2024-02-21 10:00:00')")
    preds.foreach { p =>
      val a = spark.sql(
        s"SELECT count(*) AS n, sum(k) AS sk FROM $g.nt WHERE $p").head()
      val b = spark.sql(
        s"SELECT count(*) AS n, sum(k) AS sk FROM nt_plain WHERE $p").head()
      assert(a === b, s"nested temporal pruning changed results for [$p]")
    }
    // the bound constrains all three levels at once: a 2024 range must
    // not touch any 2023 leaf
    val q = spark.sql(s"SELECT k FROM $g.nt " +
      "WHERE ts >= timestamp'2024-02-01 00:00:00'")
    assert(scannedFiles(q).forall(_.contains("ts_year=2024")),
      "the year level must prune out 2023 entirely")
  }

  test("compaction racing a writer: a leaf whose listing moved after " +
      "staging is SKIPPED — the raced insert survives, nothing is lost") {
    val (cat, g) = freshSqlCat()
    spark.sql(s"CREATE TABLE $g.rc (k BIGINT, d STRING) PARTITIONED BY (d)")
    (0 until 3).foreach(i =>
      spark.sql(s"INSERT INTO $g.rc VALUES (${i}L, 'a'), (${i + 10}L, 'b')"))
    // the hook lands a NEW insert into leaf d=a between its staged
    // rewrite and the locked re-check — exactly the optimistic window
    val out = cat.compactPartitionsHooked("rc", targetBytes = 128L << 20,
      minFiles = 2, onlyLeaves = _ => true,
      afterStage = leaf =>
        if (leaf.endsWith("d=a"))
          spark.sql(s"INSERT INTO $g.rc VALUES (99L, 'a')"))
    // d=a raced → skipped; d=b compacted to one file
    assert(out.map(_._1).exists(_.endsWith("d=b")))
    assert(!out.map(_._1).exists(_.endsWith("d=a")),
      s"the raced leaf must be skipped, got $out")
    assert(spark.sql(s"SELECT count(*) FROM $g.rc").as[Long].head() === 7L)
    assert(spark.sql(s"SELECT count(*) FROM $g.rc WHERE k = 99")
      .as[Long].head() === 1L)
    // the next maintenance run gets the raced leaf
    val out2 = cat.compactPartitions("rc")
    assert(out2.map(_._1).exists(_.endsWith("d=a")))
    assert(spark.sql(s"SELECT count(*) FROM $g.rc").as[Long].head() === 7L)
  }

  test("ALTER TABLE ADD COLUMN on a partitioned plain table is a " +
      "sidecar update: old rows null-fill, the Hive layout survives") {
    val (cat, g) = freshSqlCat()
    spark.sql(s"CREATE TABLE $g.ac (k BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (days(ts))")
    spark.sql(s"INSERT INTO $g.ac SELECT id AS k, " +
      "timestamp'2024-03-01 06:00:00' AS ts FROM range(5)")
    spark.sql(s"ALTER TABLE $g.ac ADD COLUMN tag STRING")
    // no snapshot pointer planted — the partitioned layout still serves
    assert(cat.currentVersion("ac").isEmpty,
      "ADD COLUMN must not version a partitioned plain table")
    assert(spark.sql(s"SELECT count(*) FROM $g.ac").as[Long].head() === 5L)
    assert(spark.sql(s"SELECT count(*) FROM $g.ac WHERE tag IS NULL")
      .as[Long].head() === 5L)
    spark.sql(s"INSERT INTO $g.ac SELECT 99L AS k, " +
      "timestamp'2024-03-02 06:00:00' AS ts, 'x' AS tag")
    assert(spark.sql(s"SELECT count(*) FROM $g.ac WHERE tag = 'x'")
      .as[Long].head() === 1L)
    // collision with the hidden generated column refuses
    assertThrows[Exception](
      spark.sql(s"ALTER TABLE $g.ac ADD COLUMN ts_day DATE"))
    // identity-partitioned tables take the same path
    spark.sql(s"CREATE TABLE $g.ac2 (k BIGINT, d STRING) PARTITIONED BY (d)")
    spark.sql(s"INSERT INTO $g.ac2 VALUES (1, 'a')")
    spark.sql(s"ALTER TABLE $g.ac2 ADD COLUMN v BIGINT")
    assert(spark.sql(s"SELECT v FROM $g.ac2").head().isNullAt(0))
  }

  test("CALL system.optimize on a partitioned plain table compacts " +
      "per-leaf; content survives, including a post-ALTER mixed leaf") {
    val (cat, g) = freshSqlCat()
    spark.sql(s"CREATE TABLE $g.op (k BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (days(ts))")
    // five small inserts → five files per day leaf
    (0 until 5).foreach { i =>
      spark.sql(s"INSERT INTO $g.op SELECT id * 5 + $i AS k, " +
        "timestamp'2024-03-01 06:00:00' + make_interval(0,0,0,CAST(id AS INT)) AS ts " +
        "FROM range(2)")
    }
    spark.sql(s"ALTER TABLE $g.op ADD COLUMN tag STRING")
    spark.sql(s"INSERT INTO $g.op SELECT 100L AS k, " +
      "timestamp'2024-03-01 06:00:00' AS ts, 'x' AS tag")
    def filesIn(day: String): Int = {
      import scala.jdk.CollectionConverters._
      val st = Files.list(Paths.get(cat.path("op"), s"ts_day=$day"))
      try st.iterator().asScala.count(
        _.getFileName.toString.endsWith(".parquet"))
      finally st.close()
    }
    assert(filesIn("2024-03-01") >= 6)
    val before = spark.sql(s"SELECT k, ts, tag FROM $g.op ORDER BY k")
      .collect().toSeq
    val out = spark.sql(s"CALL $g.system.optimize('op', 128)").collect()
    assert(out.nonEmpty, "optimize must report compacted leaves")
    assert(filesIn("2024-03-01") === 1)
    assert(filesIn("2024-03-02") === 1)
    assert(spark.sql(s"SELECT k, ts, tag FROM $g.op ORDER BY k")
      .collect().toSeq === before,
      "compaction must preserve content byte-for-row")
    assert(spark.sql(s"SELECT count(*) FROM $g.op WHERE tag = 'x'")
      .as[Long].head() === 1L)
  }

  test("spec evolution racing a staged insert: the swap voids the " +
      "stale staging and the insert re-stages under the NEW spec") {
    val (cat, g) = freshSqlCat()
    spark.sql(s"CREATE TABLE $g.rc (k BIGINT, y INT, prio INT) " +
      "PARTITIONED BY (y)")
    spark.sql(s"INSERT INTO $g.rc VALUES (1, 2020, 1), (2, 2021, 2)")
    // the insert stages under spec (y); the hook evolves to (y, prio)
    // before the adopt — the spec-byte pin must void the staging and
    // re-derive, landing the rows in the NESTED layout
    var fired = false
    cat.insertPartitionedHooked("rc",
      Seq((3L, 2021, 3)).toDF("k", "y", "prio"),
      afterStage = () => if (!fired) {
        fired = true
        cat.repartitionTable("rc", Seq("y", "prio"))
      })
    assert(Files.exists(Paths.get(cat.path("rc"), "y=2021", "prio=3")),
      "the re-staged insert must land under the evolved spec")
    assert(spark.sql(s"SELECT k FROM $g.rc ORDER BY k").as[Long]
      .collect().toSeq === Seq(1L, 2L, 3L),
      "no row may be lost to the evolution race")
  }

  test("a write adopted inside the spec-evolution stage window voids " +
      "the staging — the swap can never wipe an adopted insert") {
    val (cat, g) = freshSqlCat()
    spark.sql(s"CREATE TABLE $g.rw (k BIGINT, y INT, prio INT) " +
      "PARTITIONED BY (y)")
    spark.sql(s"INSERT INTO $g.rw VALUES (1, 2020, 1), (2, 2021, 2)")
    var fired = false
    cat.repartitionTableTransformedHooked("rw",
      Seq(("identity", "y", 0), ("identity", "prio", 0)),
      afterStage = () => if (!fired) {
        fired = true
        cat.insertPartitioned("rw", Seq((3L, 2020, 9)).toDF("k", "y", "prio"))
      })
    // the raced insert survives, in the NEW layout with everything else
    assert(spark.sql(s"SELECT k FROM $g.rw ORDER BY k").as[Long]
      .collect().toSeq === Seq(1L, 2L, 3L),
      "the swap wiped a write adopted during its stage window")
    assert(Files.exists(Paths.get(cat.path("rw"), "y=2020", "prio=9")))
  }

  test("lazy spec evolution is metadata-only: old files keep their " +
      "names, inserts land in the new generation's layout, the union " +
      "read prunes each generation under its own spec") {
    val (cat, g) = freshSqlCat()
    spark.sql(s"CREATE TABLE $g.lz (k BIGINT, y INT, m INT) " +
      "PARTITIONED BY (y)")
    spark.sql(s"INSERT INTO $g.lz VALUES (1, 2020, 1), (2, 2020, 2), " +
      "(3, 2021, 1)")
    def allFiles(): Set[String] = {
      import scala.jdk.CollectionConverters._
      val st = Files.walk(Paths.get(cat.path("lz")))
      try st.iterator().asScala
        .filter(p => Files.isRegularFile(p) &&
          p.getFileName.toString.endsWith(".parquet"))
        .map(_.toString).toSet
      finally st.close()
    }
    val before = allFiles()
    cat.repartitionTableLazy("lz",
      Seq(("identity", "y", 0), ("identity", "m", 0)))
    assert(allFiles() === before,
      "lazy evolution must move ZERO data files — metadata only")
    assert(cat.specGenerations("lz").map(_.dir) === Seq("", "_g1"))
    // inserts route into the NEW generation's nested layout
    cat.insertPartitioned("lz", Seq((4L, 2021, 2), (5L, 2020, 1))
      .toDF("k", "y", "m"))
    assert(Files.exists(Paths.get(cat.path("lz"), "_g1", "y=2021", "m=2")))
    assert(allFiles().intersect(before) === before,
      "the old generation's files survive byte-identical")
    // the union read serves both generations, pruned per-gen
    val un = cat.readPartitioned("lz")
    assert(un.columns.toSeq === Seq("k", "y", "m"))
    assert(un.count() === 5L)
    val pruned = un.filter($"y" === 2020)
    assert(pruned.select("k").as[Long].collect().sorted.toSeq ===
      Seq(1L, 2L, 5L))
    val scans = pruned.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.size === 2, "one scan per generation")
    assert(scans.forall(_.partitionFilters.nonEmpty),
      "each generation must prune by its own partition columns")
    // SQL serves the multi-generation union through the composite
    // per-generation scan — declared order, correct values, both gens
    assert(spark.sql(s"SELECT * FROM $g.lz").columns.toSeq ===
      Seq("k", "y", "m"))
    assert(spark.sql(s"SELECT k FROM $g.lz ORDER BY k").as[Long]
      .collect().toSeq === Seq(1L, 2L, 3L, 4L, 5L))
    assert(spark.sql(
      s"SELECT k, m FROM $g.lz WHERE y = 2020 ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq ===
      Seq((1L, 1), (2L, 2), (5L, 1)),
      "per-generation values must survive the union projection")
    assert(spark.sql(s"SELECT sum(m) FROM $g.lz WHERE y = 2021")
      .head().getLong(0) === 3L)
    // SQL row-level statements route leaf-granular across generations
    // since r18 (PvMultiGenSpec pins the full pinned-listing contract;
    // here just the former refusal staying green)
    spark.sql(s"UPDATE $g.lz SET m = 9 WHERE k = 1")
    assert(spark.sql(s"SELECT m FROM $g.lz WHERE k = 1")
      .head().getInt(0) === 9)
    spark.sql(s"UPDATE $g.lz SET m = 1 WHERE k = 1") // restore
    // the eager rewrite is the COMPACTION that collapses generations
    cat.repartitionTableTransformed("lz",
      Seq(("identity", "y", 0), ("identity", "m", 0)))
    assert(cat.specGenerations("lz").map(_.dir) === Seq(""))
    assert(!Files.exists(Paths.get(cat.path("lz"), "_g1")))
    assert(Files.exists(Paths.get(cat.path("lz"), "y=2020", "m=1")))
    assert(spark.sql(s"SELECT k FROM $g.lz ORDER BY k").as[Long]
      .collect().toSeq === Seq(1L, 2L, 3L, 4L, 5L),
      "compaction must preserve every generation's rows")
    // a second lazy evolution onto a TRANSFORM spec derives hidden
    // columns in the new generation only
    cat.repartitionTableLazy("lz",
      Seq(("identity", "y", 0), ("bucket", "k", 4)))
    cat.insertPartitioned("lz", Seq((6L, 2022, 3)).toDF("k", "y", "m"))
    assert({
      import scala.jdk.CollectionConverters._
      val st = Files.list(Paths.get(cat.path("lz"), "_g1", "y=2022"))
      try st.iterator().asScala.exists(
        _.getFileName.toString.startsWith("k_bucket="))
      finally st.close()
    }, "the new generation must nest the bucket transform")
    assert(cat.readPartitioned("lz").count() === 6L)
  }

  test("row-level DML crosses spec generations without compacting: " +
      "delete and update route each generation under its own layout, " +
      "rewriting only affected leaves") {
    val (cat, g) = freshSqlCat()
    spark.sql(s"CREATE TABLE $g.mg (k BIGINT, v BIGINT, y INT, m INT) " +
      "PARTITIONED BY (y)")
    spark.sql(s"INSERT INTO $g.mg VALUES (1, 10, 2020, 1), " +
      "(2, 20, 2020, 2), (3, 30, 2021, 1)")
    cat.repartitionTableLazy("mg",
      Seq(("identity", "y", 0), ("identity", "m", 0)))
    cat.insertPartitioned("mg",
      Seq((4L, 40L, 2021, 2), (5L, 50L, 2020, 1)).toDF("k", "v", "y", "m"))
    // untouched-leaf evidence: gen0's y=2021 leaf must survive the DML
    // byte-identical (only affected leaves rewrite)
    def leafFiles(rel: String): Set[String] = {
      import scala.jdk.CollectionConverters._
      val d = Paths.get(cat.path("mg"), rel)
      if (!Files.exists(d)) Set.empty
      else {
        val st = Files.list(d)
        try st.iterator().asScala.map(_.getFileName.toString)
          .filter(_.endsWith(".parquet")).toSet
        finally st.close()
      }
    }
    val untouched = leafFiles("y=2021")
    assert(untouched.nonEmpty)
    // DELETE spans both generations: k=2 sits in gen0's y=2020, k=5 in
    // gen1's y=2020/m=1
    val (aff, _) = cat.deleteWhereParts("mg", Seq("y"),
      $"k" === 2L || $"k" === 5L)
    assert(aff.size === 2, s"one affected tuple per generation: $aff")
    assert(spark.sql(s"SELECT k FROM $g.mg ORDER BY k").as[Long]
      .collect().toSeq === Seq(1L, 3L, 4L))
    assert(leafFiles("y=2021") === untouched,
      "an unaffected leaf must not rewrite")
    // UPDATE spans both generations: k=1 (gen0), k=4 (gen1)
    val n = cat.updateWhereParts("mg", $"k" === 1L || $"k" === 4L,
      Seq("v" -> ($"v" + 1000L)))
    assert(n === 2L)
    assert(spark.sql(s"SELECT k, v FROM $g.mg ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 1010L), (3L, 30L), (4L, 1040L)))
    assert(leafFiles("y=2021") === untouched,
      "an unaffected leaf must not rewrite on UPDATE either")
    // a partition (or transform-source) column cannot be updated in-leaf
    val e = intercept[IllegalArgumentException](
      cat.updateWhereParts("mg", $"k" === 1L, Seq("y" -> lit(1999))))
    assert(e.getMessage.contains("partition column"), e.getMessage)
    // single-generation behavior unchanged: same verb, classic table
    spark.sql(s"CREATE TABLE $g.sg1 (k BIGINT, v BIGINT, y INT) " +
      "PARTITIONED BY (y)")
    spark.sql(s"INSERT INTO $g.sg1 VALUES (1, 10, 2020), (2, 20, 2021)")
    assert(cat.updateWhereParts("sg1", $"k" === 2L,
      Seq("v" -> lit(99L))) === 1L)
    assert(spark.sql(s"SELECT v FROM $g.sg1 WHERE k = 2").as[Long]
      .head() === 99L)
    // 3VL: a NULL-evaluating predicate row is NOT updated
    spark.sql(s"CREATE TABLE $g.sg2 (k BIGINT, v BIGINT, y INT) " +
      "PARTITIONED BY (y)")
    spark.sql(s"INSERT INTO $g.sg2 VALUES (1, NULL, 2020), (2, 20, 2020)")
    assert(cat.updateWhereParts("sg2", $"v" > 5L,
      Seq("v" -> lit(0L))) === 1L)
    assert(spark.sql(s"SELECT v FROM $g.sg2 WHERE k = 1").head()
      .isNullAt(0), "NULL predicate must not update")
  }

  test("multi-generation SQL reads go columnar when the generations' " +
      "pruned outputs align — and stay columnar on a mixed-layout " +
      "projection via the zero-copy vector reorder (r16)") {
    val (cat, g) = freshSqlCat()
    spark.sql(s"CREATE TABLE $g.cb (k BIGINT, v BIGINT, y INT, m INT) " +
      "PARTITIONED BY (y)")
    spark.sql(s"INSERT INTO $g.cb VALUES (1, 10, 2020, 1), " +
      "(2, 20, 2021, 2)")
    cat.repartitionTableLazy("cb",
      Seq(("identity", "y", 0), ("identity", "m", 0)))
    cat.insertPartitioned("cb",
      Seq((3L, 30L, 2021, 3)).toDF("k", "v", "y", "m"))
    def scanOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }.head
    // required columns exclude the partition fields the generations
    // disagree on → every generation's output aligns → columnar
    val aligned = spark.sql(s"SELECT k, v FROM $g.cb")
    assert(scanOf(aligned).supportsColumnar,
      "aligned generations must serve vectorized batches")
    assert(aligned.as[(Long, Long)].collect().sortBy(_._1).toSeq ===
      Seq((1L, 10L), (2L, 20L), (3L, 30L)))
    // projecting a generation-disagreeing partition column used to
    // fall back to rows; the r16 ordinal vector reorder keeps it
    // columnar with the same values
    val mixed = spark.sql(s"SELECT k, y, m FROM $g.cb")
    assert(scanOf(mixed).supportsColumnar,
      "a mixed-layout projection must stay columnar (vector reorder)")
    assert(mixed.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getInt(2))).sortBy(_._1).toSeq ===
      Seq((1L, 2020, 1), (2L, 2021, 2), (3L, 2021, 3)))
  }

  test("the DECLARED column order is authoritative: positional INSERT " +
      "and SELECT * after ADD COLUMN never swap a mid-schema identity " +
      "partition column") {
    val (_, g) = freshSqlCat()
    // partition col NOT last — the FileTable delegate reorders its own
    // schema to partition-cols-last, which used to leak into schema()
    // and bind positional VALUES to the wrong columns
    spark.sql(s"CREATE TABLE $g.ord (k BIGINT, y INT, prio INT) " +
      "PARTITIONED BY (y)")
    spark.sql(s"INSERT INTO $g.ord VALUES (1, 2020, 7)")
    val st = spark.sql(s"SELECT * FROM $g.ord")
    assert(st.schema.fieldNames.toSeq === Seq("k", "y", "prio"))
    assert(st.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      .toSeq === Seq((1L, 2020, 7)))
    // ADD COLUMN puts EVERY partitioned spec in the mid-schema shape
    spark.sql(s"CREATE TABLE $g.ord2 (k BIGINT, dt STRING) " +
      "PARTITIONED BY (dt)")
    spark.sql(s"INSERT INTO $g.ord2 VALUES (1, 'a')")
    spark.sql(s"ALTER TABLE $g.ord2 ADD COLUMN tag STRING")
    spark.sql(s"INSERT INTO $g.ord2 VALUES (2, 'a', 'x')")
    val rows = spark.sql(s"SELECT k, dt, tag FROM $g.ord2 ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)))).toSeq
    assert(rows === Seq((1L, "a", None), (2L, "a", Some("x"))),
      "a positional INSERT after ADD COLUMN must bind by DECLARED order")
  }

  test("temporal transforms derive in UTC: a session-TZ change between " +
      "write and read never moves directory values or drops leaves") {
    val (cat, g) = freshSqlCat()
    val tz0 = spark.conf.get("spark.sql.session.timeZone")
    try {
      // WRITE under Los Angeles: rows pinned to INSTANTS via epoch
      // micros, two of them straddling a UTC midnight (which is 4/5pm
      // in LA — a session-TZ to_date would fold them into the prior
      // UTC day's leaf)
      spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
      spark.sql(s"CREATE TABLE $g.tzv (k BIGINT, ts TIMESTAMP) " +
        "PARTITIONED BY (days(ts))")
      // 2024-03-02T00:30:00Z and 2024-03-02T23:30:00Z and 2024-03-03T01:00:00Z
      spark.sql(s"INSERT INTO $g.tzv VALUES " +
        "(1, timestamp_micros(1709339400000000))," +
        "(2, timestamp_micros(1709422200000000))," +
        "(3, timestamp_micros(1709427600000000))")
      assert(Files.exists(Paths.get(cat.path("tzv"), "ts_day=2024-03-02")),
        "directory values must be UTC epoch-days, not writer-session days")
      assert(Files.exists(Paths.get(cat.path("tzv"), "ts_day=2024-03-03")))
      // READ under Tokyo: equality and range probes on the instants
      // must agree with the same rows unpartitioned, whatever leaves
      // pruning serves
      spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
      val eq = spark.sql(s"SELECT k FROM $g.tzv " +
        "WHERE ts = timestamp_micros(1709422200000000)")
      assert(eq.as[Long].collect().toSeq === Seq(2L))
      assert(scannedFiles(eq).forall(_.contains("ts_day=2024-03-02")),
        "the UTC ordinal must pin the UTC leaf under ANY session TZ")
      val rng = spark.sql(s"SELECT k FROM $g.tzv " +
        "WHERE ts >= timestamp_micros(1709424000000000) ORDER BY k")
      assert(rng.as[Long].collect().toSeq === Seq(3L))
    } finally spark.conf.set("spark.sql.session.timeZone", tz0)
  }

  test("truncate(w, DECIMAL) floors the unscaled value (Iceberg rule): " +
      "negatives floor down, equality and bounds prune, precision > 18 refused") {
    val (cat, g) = freshSqlCat()
    spark.sql(s"CREATE TABLE $g.dtr (k BIGINT, amt DECIMAL(12,2)) " +
      "PARTITIONED BY (truncate(1000, amt))") // 1000 unscaled = 10.00
    spark.sql(s"INSERT INTO $g.dtr VALUES (1, 12.34), (2, 19.99), " +
      "(3, 20.00), (4, -12.34), (5, 0.05), (6, 123.45)")
    // unscaled floors: 1234→1000, 1999→1000, 2000→2000, -1234→-2000,
    // 5→0, 12345→12000 — rendered at the source scale
    Seq("10.00", "20.00", "-20.00", "0.00", "120.00").foreach { d =>
      assert(Files.exists(Paths.get(cat.path("dtr"), s"amt_trunc=$d")),
        s"expected leaf amt_trunc=$d")
    }
    val eq = spark.sql(s"SELECT k FROM $g.dtr WHERE amt = 19.99")
    assert(eq.as[Long].collect().toSeq === Seq(2L))
    assert(scannedFiles(eq).forall(_.contains("amt_trunc=10.00")),
      s"equality must pin the floored leaf, scanned ${scannedFiles(eq)}")
    val neg = spark.sql(s"SELECT k FROM $g.dtr WHERE amt = -12.34")
    assert(neg.as[Long].collect().toSeq === Seq(4L))
    assert(scannedFiles(neg).forall(_.contains("amt_trunc=-20.00")),
      "negative values floor DOWN (Iceberg), never toward zero")
    val rng = spark.sql(s"SELECT k FROM $g.dtr WHERE amt >= 20.00 ORDER BY k")
    assert(rng.as[Long].collect().toSeq === Seq(3L, 6L))
    assert(!scannedFiles(rng).exists(_.contains("amt_trunc=-20.00")),
      "a lower bound must drop leaves below the floored bound")
    // the whole-table answer matches the same rows unpartitioned
    assert(spark.sql(s"SELECT sum(amt) FROM $g.dtr").collect()(0).get(0)
      .toString === "163.49")
    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE $g.dtw (k BIGINT, amt DECIMAL(20,2)) " +
        "PARTITIONED BY (truncate(1000, amt))")
    }
    assert(e.getMessage.contains("precision"), e.getMessage)
  }

  test("ALTER TABLE ADD/DROP PARTITION FIELD (Iceberg DDL) evolves " +
      "the spec through SQL alone; refusals stay loud") {
    val (cat, g) = freshSqlCat()
    spark.sql(s"CREATE TABLE $g.af (k BIGINT, ts TIMESTAMP, y INT) " +
      "PARTITIONED BY (y)")
    spark.sql(s"INSERT INTO $g.af VALUES " +
      "(1, timestamp'2024-03-01 10:00:00', 2024)")
    val out = spark.sql(
      s"ALTER TABLE $g.af ADD PARTITION FIELD days(ts)").collect()
    assert(out.map(_.getString(0)).toSeq === Seq("y, days(ts)"))
    assert(Files.exists(
      Paths.get(cat.path("af"), "y=2024", "ts_day=2024-03-01")),
      "the evolved spec must nest the new transform level")
    spark.sql(s"INSERT INTO $g.af VALUES " +
      "(2, timestamp'2024-03-02 10:00:00', 2024)")
    assert(spark.sql(s"SELECT k FROM $g.af " +
      "WHERE ts >= timestamp'2024-03-02 00:00:00'").as[Long]
      .collect().toSeq === Seq(2L))
    spark.sql(s"ALTER TABLE $g.af DROP PARTITION FIELD y")
    assert(Files.exists(Paths.get(cat.path("af"), "ts_day=2024-03-01")))
    assert(!Files.exists(Paths.get(cat.path("af"), "y=2024")))
    assert(spark.sql(s"SELECT count(*) FROM $g.af").as[Long].head() === 2L)
    val e1 = intercept[Exception](
      spark.sql(s"ALTER TABLE $g.af DROP PARTITION FIELD days(ts)"))
    assert(e1.getMessage.contains("last partition field"), e1.getMessage)
    val e2 = intercept[Exception](
      spark.sql(s"ALTER TABLE $g.af ADD PARTITION FIELD days(ts)"))
    assert(e2.getMessage.contains("already"), e2.getMessage)
    val e3 = intercept[Exception](
      spark.sql(s"ALTER TABLE $g.af DROP PARTITION FIELD nope"))
    assert(e3.getMessage.contains("no partition field"), e3.getMessage)
    // ordinary SQL still parses through the delegate untouched
    assert(spark.sql("SELECT 1 + 1").head().getInt(0) === 2)
  }

  test("partition-granular DELETE routes by the WRITER's rendering: " +
      "decimal leaves and leading-zero string keys purge correctly " +
      "(directory inference must never re-render a leaf name)") {
    val (cat, g) = freshSqlCat()
    spark.sql(s"CREATE TABLE $g.dd (okey BIGINT, amt DECIMAL(12,2)) " +
      "PARTITIONED BY (truncate(10000000, amt))")
    spark.sql(s"INSERT INTO $g.dd VALUES (1, 50.00), (2, 150000.00), " +
      "(3, 250000.00), (4, 350000.25)")
    spark.sql(s"DELETE FROM $g.dd WHERE amt >= 200000.00")
    assert(spark.sql(s"SELECT okey FROM $g.dd ORDER BY okey").as[Long]
      .collect().toSeq === Seq(1L, 2L),
      "an inference read would target amt_trunc=200000.0 (double " +
        "rendering) and silently delete nothing")
    assert(!Files.exists(Paths.get(cat.path("dd"), "amt_trunc=300000.00")))
    // identity STRING key whose values LOOK numeric: "007" infers as
    // int 7 and would purge the nonexistent leaf code=7
    spark.sql(s"CREATE TABLE $g.zs (k BIGINT, code STRING) " +
      "PARTITIONED BY (code)")
    spark.sql(s"INSERT INTO $g.zs VALUES (1, '007'), (2, '042')")
    spark.sql(s"DELETE FROM $g.zs WHERE code = '007'")
    assert(spark.sql(s"SELECT k FROM $g.zs").as[Long].collect().toSeq ===
      Seq(2L))
    assert(!Files.exists(Paths.get(cat.path("zs"), "code=007")),
      "the purged leaf directory must be the writer-escaped name")
  }

  test("insertPartitionedIndexed extends the live manifest instead of " +
      "invalidating it: prunedRead stays serveable across inserts, new " +
      "files' envelopes skip, partition-column indexing refuses") {
    val (cat, g) = freshSqlCat()
    spark.sql(s"CREATE TABLE $g.ix (k BIGINT, v BIGINT, y STRING) " +
      "PARTITIONED BY (y)")
    def batch(ks: Range) =
      ks.map(k => (k.toLong, k.toLong * 10, s"y${k % 2}"))
        .toDF("k", "v", "y").repartitionByRange(2, $"k")
    cat.insertPartitioned("ix", batch(0 until 100))
    cat.analyze("ix", cols = Seq("k"), skipCols = Seq("k"))
    // an indexed insert EXTENDS the manifest — no re-analyze needed
    cat.insertPartitionedIndexed("ix", batch(100 until 200))
    val pr = cat.prunedRead("ix", Seq(("k", 150L, 160L)))
    assert(pr.select("k").as[Long].collect().sorted.toSeq ===
      (150L to 160L), "post-insert rows must be indexed and readable")
    val total = {
      import scala.jdk.CollectionConverters._
      val st = Files.walk(Paths.get(cat.path("ix")))
      try st.iterator().asScala.count(p => Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet") &&
        !p.toString.contains("/_"))
      finally st.close()
    }
    assert(pr.inputFiles.length < total,
      s"envelopes must skip files (${pr.inputFiles.length} of $total)")
    // rows/fileCount in the head stay honest across the extension
    assert(cat.stats("ix").map(_.rows) === Some(200L))
    // a partition-column index is refused (leaves already prune it)
    spark.sql(s"CREATE TABLE $g.ix2 (k BIGINT, y STRING) " +
      "PARTITIONED BY (y)")
    cat.insertPartitioned("ix2", Seq((1L, "a")).toDF("k", "y"))
    cat.analyze("ix2", cols = Seq("k"), skipCols = Seq("y"))
    val e = intercept[Exception](cat.insertPartitionedIndexed("ix2",
      Seq((2L, "a")).toDF("k", "y")))
    assert(e.getMessage.contains("partition columns"), e.getMessage)
  }

  test("a legacy (tv=1) spec wrote session-TZ temporal directories: " +
      "reads keep every leaf rather than prune against them") {
    val (cat, g) = freshSqlCat()
    spark.sql(s"CREATE TABLE $g.lg (k BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (days(ts))")
    spark.sql(s"INSERT INTO $g.lg SELECT id AS k, " +
      "timestamp'2024-03-01 00:30:00' + make_interval(0,0,0,CAST(id AS INT)) AS ts " +
      "FROM range(4)")
    // simulate a pre-r14 sidecar: strip the transform-version marker
    val spec = Paths.get(cat.path("lg"), "_partspec.json")
    val legacy = new String(Files.readAllBytes(spec),
      java.nio.charset.StandardCharsets.UTF_8).replace(",\"tv\":2", "")
    assert(legacy.contains("\"gen\""))
    Files.write(spec, legacy.getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    val q = spark.sql(s"SELECT k FROM $g.lg " +
      "WHERE ts = timestamp'2024-03-02 00:30:00'")
    assert(q.as[Long].collect().toSeq === Seq(1L))
    val dirs = scannedFiles(q).map(f =>
      f.split("/").find(_.startsWith("ts_day=")).getOrElse("?")).toSet
    assert(dirs.size === 4,
      s"legacy temporal dirs are session-TZ-derived — pruning against " +
        s"them could drop matching rows; all leaves must serve ($dirs)")
  }

  test("tuple-routing DML refuses a legacy (tv=1) temporal transform — " +
      "UTC re-derivation could route the purge at the wrong leaves") {
    val (cat, g) = freshSqlCat()
    spark.sql(s"CREATE TABLE $g.lgd (k BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (days(ts))")
    spark.sql(s"INSERT INTO $g.lgd SELECT id AS k, " +
      "timestamp'2024-03-01 00:30:00' + make_interval(0,0,0,CAST(id AS INT)) AS ts " +
      "FROM range(4)")
    // simulate a pre-r14 sidecar: strip the transform-version marker
    val spec = Paths.get(cat.path("lgd"), "_partspec.json")
    val legacy = new String(Files.readAllBytes(spec),
      java.nio.charset.StandardCharsets.UTF_8).replace(",\"tv\":2", "")
    assert(legacy.contains("\"gen\""))
    Files.write(spec, legacy.getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    val e = intercept[IllegalArgumentException](
      cat.deleteWhereParts("lgd", Seq("ts_day"), col("k") === 1L))
    assert(e.getMessage.contains("legacy (tv=1)"), e.getMessage)
    assert(e.getMessage.contains("repartitionTableTransformed"),
      e.getMessage)
    val e2 = intercept[IllegalArgumentException](
      cat.overwritePartitionTuples("lgd",
        Seq((9L, java.sql.Timestamp.valueOf("2024-03-01 00:30:00")))
          .toDF("k", "ts"),
        Seq("ts_day"), Seq(Seq(Some("2024-03-01")))))
    assert(e2.getMessage.contains("legacy (tv=1)"), e2.getMessage)
    // rows untouched by the refused verbs
    assert(spark.sql(s"SELECT count(*) FROM $g.lgd")
      .as[Long].head() === 4L)
    // a DATE-sourced transform derives TZ-free — tv=1 stays routable
    spark.sql(s"CREATE TABLE $g.lgok (k BIGINT, d DATE) " +
      "PARTITIONED BY (months(d))")
    spark.sql(s"INSERT INTO $g.lgok VALUES " +
      "(1, date'2024-03-05'), (2, date'2024-04-05')")
    val spec2 = Paths.get(cat.path("lgok"), "_partspec.json")
    Files.write(spec2, new String(Files.readAllBytes(spec2),
      java.nio.charset.StandardCharsets.UTF_8).replace(",\"tv\":2", "")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    cat.deleteWhereParts("lgok", Seq("d_month"), col("k") === 2L)
    assert(spark.sql(s"SELECT k FROM $g.lgok").as[Long].collect()
      .toSeq === Seq(1L))
  }
}
