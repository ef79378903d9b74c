package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.catalog.TableCatalog
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets.UTF_8

/** r16 — MULTI-GENERATION pv verbs (VERDICT r15 next #1) and the
  * crash-ordered generation compaction (ADVICE r15 medium): explicit
  * tuple overwrite/drop, per-leaf OPTIMIZE and branch staging all
  * route per spec generation, and the collapse intent (`collapseAt` +
  * provenance UUID in the sidecar) keeps every crash state between
  * the compaction's pointer flip and its finalize sidecar readable
  * under the spec each snapshot was written with. */
class PvMultiGenSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private var seq = 0
  private def freshSqlCat(): (TableCatalog, String) = {
    val root = Files.createTempDirectory("pvmg").toString
    seq += 1
    val name = s"gmg$seq"
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.sql.GraftSqlCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    (new TableCatalog(spark, root), name)
  }

  /** A 2-generation pv table: gen0 partitioned by y holding
    * (1,2020,1) and (2,2021,2); `_g1` partitioned by (y,m) holding
    * (3,2021,3) and (4,2020,4). */
  private def twoGen(cat: TableCatalog, t: String): Unit = {
    cat.createPartitionedVersioned(t,
      Seq((0L, 0L, 0, 0)).toDF("k", "v", "y", "m").schema, Seq("y"))
    cat.appendPartitionedVersioned(t,
      Seq((1L, 10L, 2020, 1), (2L, 20L, 2021, 2)).toDF("k", "v", "y", "m"))
    cat.repartitionTableLazy(t,
      Seq(("identity", "y", 0), ("identity", "m", 0)))
    cat.appendPartitionedVersioned(t,
      Seq((3L, 30L, 2021, 3), (4L, 40L, 2020, 4)).toDF("k", "v", "y", "m"))
  }

  test("explicit-tuple OVERWRITE routes per generation: replacement " +
      "rows land in the current generation, old-generation leaves " +
      "purge matches and keep survivors, ONE commit") {
    val (cat, _) = freshSqlCat()
    twoGen(cat, "ow")
    val v0 = cat.currentVersion("ow").get
    // tuple (y=2021, m=2) holds k=2 — which lives in gen0's y=2021
    // leaf; replace it with k=20
    val v1 = cat.overwritePartitionTuplesVersioned("ow",
      Seq((20L, 200L, 2021, 2)).toDF("k", "v", "y", "m"),
      Seq(Seq(Some("2021"), Some("2"))), v0)
    assert(v1 === v0 + 1L, "one snapshot commit")
    assert(cat.read("ow").select("k").as[Long].collect().sorted.toSeq ===
      Seq(1L, 3L, 4L, 20L))
    // the replacement landed in the CURRENT generation's subtree
    assert(Files.exists(Paths.get(cat.path("ow"), s"_v$v1", "_g1",
      "y=2021", "m=2")), "replacement rows route into _g1")
    // gen0's y=2021 leaf was rewritten WITHOUT k=2 — but nothing else
    // in gen0 moved (y=2020 leaf carried by link)
    assert(cat.readVersion("ow", v0).select("k").as[Long].collect()
      .sorted.toSeq === Seq(1L, 2L, 3L, 4L),
      "time travel keeps the pre-overwrite state")
    // a second overwrite claiming a tuple with matches in BOTH
    // generations: (y=2020, m=1) → k=1 in gen0, (y=2020, m=4) → k=4
    // in _g1, replaced by one new row each
    val v2 = cat.overwritePartitionTuplesVersioned("ow",
      Seq((100L, 1L, 2020, 1), (400L, 4L, 2020, 4))
        .toDF("k", "v", "y", "m"),
      Seq(Seq(Some("2020"), Some("1")), Seq(Some("2020"), Some("4"))), v1)
    assert(cat.read("ow").select("k").as[Long].collect().sorted.toSeq ===
      Seq(3L, 20L, 100L, 400L))
    assert(cat.currentVersion("ow") === Some(v2))
  }

  test("multi-gen tuple DML prunes OLD-generation discovery by the " +
      "shared claim columns (r17): a gen0 leaf outside every claimed " +
      "y is NEVER read — proven by corrupting its bytes — while the " +
      "matching leaf rewrites exactly") {
    val (cat, _) = freshSqlCat()
    twoGen(cat, "pr")
    val v0 = cat.currentVersion("pr").get
    // corrupt gen0's y=2020 leaf IN PLACE (the same inode rides every
    // snapshot's hard link): any code path that still scans the whole
    // generation for claim matches would throw on this file's footer
    val leaf2020 = Paths.get(cat.path("pr"), s"_v$v0", "y=2020")
    import scala.jdk.CollectionConverters._
    val st = Files.list(leaf2020)
    val files = try st.iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
    finally st.close()
    assert(files.nonEmpty)
    files.foreach(f => Files.write(f, Array.fill[Byte](64)(0x7f)))
    // claim (y=2021, m=2): y is a partition column of BOTH specs, so
    // gen0's discovery must prune to its y=2021 leaf at plan time
    val v1 = cat.overwritePartitionTuplesVersioned("pr",
      Seq((20L, 200L, 2021, 2)).toDF("k", "v", "y", "m"),
      Seq(Seq(Some("2021"), Some("2"))), v0)
    assert(v1 === v0 + 1L)
    // y=2021 rows are correct (k=2 replaced by k=20, _g1's k=3 kept);
    // the corrupted y=2020 leaf carried by link, untouched and unread
    assert(cat.read("pr").filter(col("y") === 2021).select("k").as[Long]
      .collect().sorted.toSeq === Seq(3L, 20L))
    assert(Files.exists(Paths.get(cat.path("pr"), s"_v$v1", "y=2020")),
      "the unclaimed gen0 leaf must carry")
    // the replace-mode branch publish shares the same pruned helper
    cat.replacePartitionsOnBranch("pr", "rw",
      Seq((21L, 210L, 2021, 2)).toDF("k", "v", "y", "m"))
    cat.publishBranch("pr", "rw")
    assert(cat.read("pr").filter(col("y") === 2021).select("k").as[Long]
      .collect().sorted.toSeq === Seq(3L, 21L),
      "the pruned publish must land the replacement")
  }

  test("INSERT OVERWRITE (replacePartitionedVersioned) on a " +
      "multi-generation table lands everything under the current spec") {
    val (cat, g) = freshSqlCat()
    twoGen(cat, "rp")
    val v = cat.replacePartitionedVersioned("rp",
      Seq((7L, 70L, 2022, 7)).toDF("k", "v", "y", "m"))
    assert(cat.read("rp").select("k").as[Long].collect().toSeq === Seq(7L))
    assert(Files.exists(Paths.get(cat.path("rp"), s"_v$v", "_g1",
      "y=2022", "m=7")), "REPLACE routes into the current generation")
    assert(spark.sql(s"SELECT k FROM $g.rp").as[Long].collect().toSeq ===
      Seq(7L))
  }

  test("OPTIMIZE (compactPartitionsVersioned) is generation-local: " +
      "each leaf compacts under its own generation's data schema, " +
      "rows unchanged") {
    val (cat, _) = freshSqlCat()
    twoGen(cat, "op")
    // force several files per leaf: extra appends into both layouts
    cat.appendPartitionedVersioned("op",
      Seq((5L, 50L, 2020, 1), (6L, 60L, 2021, 3)).toDF("k", "v", "y", "m"))
    cat.appendPartitionedVersioned("op",
      Seq((7L, 70L, 2020, 1), (8L, 80L, 2021, 3)).toDF("k", "v", "y", "m"))
    val before = cat.read("op").orderBy("k").collect().toSeq
    val report = cat.compactPartitionsVersioned("op", minFiles = 2)
    assert(report.nonEmpty, "some leaf must have compacted")
    assert(report.exists(_._1.startsWith("_g1/")),
      s"a _g1 leaf must be in the report: $report")
    assert(report.forall { case (_, b, a) => a < b },
      s"every compacted leaf must shrink its file count: $report")
    assert(cat.read("op").orderBy("k").collect().toSeq === before,
      "OPTIMIZE must not change rows")
  }

  test("generation compaction is crash-ordered: a committed-but-" +
      "unfinalized collapse intent serves the collapsed view, heals " +
      "on the next maintenance verb; a STALE (pre-commit) intent " +
      "stays inert even when the version line reaches it") {
    val (cat, g) = freshSqlCat()
    twoGen(cat, "cc")
    val specFile = Paths.get(cat.path("cc"), "_partspec.json")
    val multiGenSpec = new String(Files.readAllBytes(specFile), UTF_8)
    val v = cat.compactGenerationsVersioned("cc")
    assert(cat.specGenerations("cc").size === 1)
    // recover the compaction commit's provenance UUID from history
    val histDir = Paths.get(cat.path("cc"), "_history")
    import scala.jdk.CollectionConverters._
    val pubs = {
      val s = Files.list(histDir)
      try s.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".json"))
        .flatMap(p => new String(Files.readAllBytes(p), UTF_8)
          .linesIterator)
        .flatMap { l =>
          val m = """"version":(\d+).*?"pub":"([^"]+)"""".r
            .findFirstMatchIn(l)
          m.map(x => x.group(1).toLong -> x.group(2))
        }.toMap
      finally s.close()
    }
    val pub = pubs(v)
    assert(pub.startsWith("gc-"), s"compaction commit must stamp: $pubs")
    // SIMULATE the crash window: the finalize sidecar never landed —
    // the sidecar still holds the full generation list + the intent
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.readTree(multiGenSpec)
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    node.put("collapseAt", v)
    node.put("collapsePub", pub)
    val tmp = Files.createTempFile(Paths.get(cat.path("cc")), "_tmp_", "")
    Files.write(tmp, om.writeValueAsString(node).getBytes(UTF_8))
    Files.move(tmp, specFile, StandardCopyOption.REPLACE_EXISTING)
    val cat2 = new TableCatalog(spark, Paths.get(cat.path("cc"))
      .getParent.toString) // fresh catalog: no warm spec cache
    assert(cat2.specGenerations("cc").size === 1,
      "committed intent ⇒ the HEAD view is the collapsed generation")
    assert(cat2.specGenerationsAt("cc", v - 1L).size === 2,
      "pre-collapse snapshots keep their multi-generation description")
    assert(cat2.read("cc").select("k").as[Long].collect().sorted.toSeq ===
      Seq(1L, 2L, 3L, 4L), "reads are correct in the crash window")
    assert(spark.sql(s"SELECT count(*) FROM $g.cc").head().getLong(0) ===
      4L)
    // the next maintenance verb heals: plain single-gen sidecar
    cat2.compactGenerationsVersioned("cc")
    val healed = new String(Files.readAllBytes(specFile), UTF_8)
    assert(!healed.contains("collapseAt"),
      s"heal must land the finalize sidecar: $healed")
    assert(cat2.read("cc").count() === 4L)

    // STALE intent: a pre-commit crash left collapseAt pointing at a
    // version a later unrelated commit will take — the provenance
    // gate must keep the multi-generation view
    val (cat3, _) = freshSqlCat()
    twoGen(cat3, "st")
    val cur = cat3.currentVersion("st").get
    val spec3 = Paths.get(cat3.path("st"), "_partspec.json")
    val raw3 = new String(Files.readAllBytes(spec3), UTF_8)
    val n3 = om.readTree(raw3)
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    n3.put("collapseAt", cur + 1L)
    n3.put("collapsePub", "gc-dead-attempt")
    val tmp3 = Files.createTempFile(Paths.get(cat3.path("st")), "_t", "")
    Files.write(tmp3, om.writeValueAsString(n3).getBytes(UTF_8))
    Files.move(tmp3, spec3, StandardCopyOption.REPLACE_EXISTING)
    val root3 = Paths.get(cat3.path("st")).getParent.toString
    val cat3b = new TableCatalog(spark, root3)
    // an unrelated append takes version cur+1
    cat3b.appendPartitionedVersioned("st",
      Seq((9L, 90L, 2022, 9)).toDF("k", "v", "y", "m"))
    assert(cat3b.currentVersion("st") === Some(cur + 1L))
    assert(cat3b.specGenerations("st").size === 2,
      "a foreign commit at the intent version must NOT flip the view")
    assert(cat3b.read("st").select("k").as[Long].collect().sorted.toSeq
      === Seq(1L, 2L, 3L, 4L, 9L))
    // re-running the compaction converges and clears the stale intent
    cat3b.compactGenerationsVersioned("st")
    assert(cat3b.specGenerations("st").size === 1)
    assert(!new String(Files.readAllBytes(spec3), UTF_8)
      .contains("collapseAt"))
    assert(cat3b.read("st").count() === 5L)
  }

  test("crash-window PIN vs the collapse heal (r17 adversarial probe): " +
      "a tag on a pre-collapse snapshot keeps the intent pending — the " +
      "heal sweeps AROUND it, the pinned version reads under its own " +
      "multi-gen spec, the head reads collapsed — and dropping the pin " +
      "lets the next heal finalize") {
    val (cat, _) = freshSqlCat()
    twoGen(cat, "hp")
    val specFile = Paths.get(cat.path("hp"), "_partspec.json")
    // the REAL crash window: the compaction dies between the pointer
    // flip and the sweep — pre-collapse snapshots still on disk under
    // a committed intent
    intercept[RuntimeException](
      cat.compactGenerationsVersionedHooked("hp",
        afterCommit = () => throw new RuntimeException("crash-pre-sweep")))
    val v = cat.currentVersion("hp").get
    assert(Files.exists(Paths.get(cat.path("hp"), s"_v${v - 1L}")),
      "fixture: the pre-collapse snapshot must still exist")
    // a pin minted in the window (defensive: the protocol never mints
    // one below the collapse point itself — this simulates an old-code
    // writer or a restore interplay)
    Files.write(Paths.get(cat.path("hp"), "_tag_old"),
      (v - 1L).toString.getBytes(UTF_8))
    val cat2 = new TableCatalog(spark,
      Paths.get(cat.path("hp")).getParent.toString)
    // the heal (via fsck repair — same healCollapseIntent) must sweep
    // AROUND the pin and keep the intent pending
    cat2.fsck("hp", repair = true, graceMs = 0L)
    assert(new String(Files.readAllBytes(specFile), UTF_8)
      .contains("collapseAt"),
      "a pinned pre-collapse snapshot must keep the intent pending")
    assert(Files.exists(Paths.get(cat2.path("hp"), s"_v${v - 1L}")),
      "the heal must never sweep a pinned snapshot")
    // both worlds stay correct: head collapsed, pin multi-gen
    assert(cat2.read("hp").select("k").as[Long].collect().sorted.toSeq ===
      Seq(1L, 2L, 3L, 4L))
    assert(cat2.specGenerationsAt("hp", v - 1L).size === 2,
      "the pinned snapshot keeps its multi-generation description")
    assert(cat2.readTag("hp", "old").count() === 4L)
    // unpin → the next heal finalizes: sidecar clean, residue swept
    cat2.dropTag("hp", "old")
    cat2.fsck("hp", repair = true, graceMs = 0L)
    assert(!new String(Files.readAllBytes(specFile), UTF_8)
      .contains("collapseAt"), "unpinned ⇒ the heal must finalize")
    assert(cat2.fsck("hp") === Seq.empty)
    assert(cat2.read("hp").select("k").as[Long].collect().sorted.toSeq ===
      Seq(1L, 2L, 3L, 4L))
  }

  test("SQL UPDATE / MERGE / rewrite-DELETE on a 2-generation pv table " +
      "(r17 — the last row-level refusal lifted): the statement " +
      "degrades to a whole-table copy-on-write under the current " +
      "spec, ONE snapshot, time travel intact, nothing lost outside " +
      "the predicate") {
    val (cat, g) = freshSqlCat()
    twoGen(cat, "rl")
    val v0 = cat.currentVersion("rl").get
    // UPDATE touches k=2 (gen0's y=2021 leaf); every OTHER row must
    // survive verbatim even though the rewrite is whole-table
    spark.sql(s"UPDATE $g.rl SET v = v * 10 WHERE k = 2")
    val v1 = cat.currentVersion("rl").get
    assert(v1 === v0 + 1L, "one snapshot commit")
    assert(cat.read("rl").orderBy("k").select("k", "v")
      .as[(Long, Long)].collect().toSeq ===
      Seq((1L, 10L), (2L, 200L), (3L, 30L), (4L, 40L)))
    // the rewrite landed under the CURRENT spec: _g1 leaves only
    assert(Files.exists(Paths.get(cat.path("rl"), s"_v$v1", "_g1",
      "y=2021", "m=2")), "rows rewrite under the current generation")
    assert(!Files.exists(Paths.get(cat.path("rl"), s"_v$v1", "y=2021")),
      "older generations are empty in the new snapshot")
    assert(cat.readVersion("rl", v0).select("v").as[Long].collect()
      .sorted.toSeq === Seq(10L, 20L, 30L, 40L),
      "time travel keeps the pre-statement multi-gen state")
    // MERGE: update one row, insert another, via the same machinery
    Seq((3L, 999L, 2021, 3), (9L, 90L, 2022, 9))
      .toDF("k", "v", "y", "m").createOrReplaceTempView("rl_src")
    spark.sql(s"""MERGE INTO $g.rl t USING rl_src s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT (k, v, y, m) VALUES (s.k, s.v, s.y, s.m)""")
    assert(cat.read("rl").orderBy("k").select("k", "v")
      .as[(Long, Long)].collect().toSeq ===
      Seq((1L, 10L), (2L, 200L), (3L, 999L), (4L, 40L), (9L, 90L)))
    // rewrite-DELETE (a predicate canDeleteWhere cannot translate
    // routes through the same row-level rewrite)
    spark.sql(s"DELETE FROM $g.rl WHERE k % 2 = 1")
    assert(cat.read("rl").select("k").as[Long].collect().sorted.toSeq ===
      Seq(2L, 4L))
    // SQL reads agree end to end
    assert(spark.sql(s"SELECT sum(v) FROM $g.rl").head().getLong(0) ===
      240L)
    // a PLAIN lazily-evolved table works too since r18 (the pinned-
    // listing protocol) — the dedicated leaf-granular test below pins
    // the full contract; here just the former refusal staying green
    spark.sql(s"CREATE TABLE $g.pl (k BIGINT, y INT, m INT) " +
      "PARTITIONED BY (y)")
    spark.sql(s"INSERT INTO $g.pl VALUES (1, 2020, 1)")
    cat.repartitionTableLazy("pl",
      Seq(("identity", "y", 0), ("identity", "m", 0)))
    spark.sql(s"UPDATE $g.pl SET k = 2 WHERE k = 1")
    assert(spark.sql(s"SELECT k FROM $g.pl").as[Long].collect().toSeq ===
      Seq(2L), "the r17 plain-lazy refusal is lifted (r18)")
  }

  test("LEAF-GRANULAR row-level SQL on a PLAIN lazily-evolved table " +
      "(r18 — the last row-level refusal lifted): the pinned-listing " +
      "protocol replaces exactly the scanned leaves in place, " +
      "untouched leaves keep their files, a concurrent write into a " +
      "scanned leaf refuses the stale rewrite loudly") {
    val (cat, g) = freshSqlCat()
    // 2-generation PLAIN table: gen0 by y, _g1 (current) by (y, m)
    spark.sql(s"CREATE TABLE $g.pg (k BIGINT, v BIGINT, y INT, m INT) " +
      "PARTITIONED BY (y)")
    Seq((1L, 10L, 2020, 1), (2L, 20L, 2021, 2)).toDF("k", "v", "y", "m")
      .createOrReplaceTempView("pg_seed")
    spark.sql(s"INSERT INTO $g.pg SELECT * FROM pg_seed")
    cat.repartitionTableLazy("pg",
      Seq(("identity", "y", 0), ("identity", "m", 0)))
    Seq((3L, 30L, 2021, 3), (4L, 40L, 2020, 4)).toDF("k", "v", "y", "m")
      .createOrReplaceTempView("pg_seed2")
    spark.sql(s"INSERT INTO $g.pg SELECT * FROM pg_seed2")
    assert(cat.specGenerations("pg").size === 2)
    def leafNames(rel: String): Set[String] = {
      import scala.jdk.CollectionConverters._
      val p = Paths.get(cat.path("pg"), rel)
      if (!Files.exists(p)) Set.empty
      else {
        val st = Files.list(p)
        try st.iterator().asScala.map(_.getFileName.toString)
          .filter(_.endsWith(".parquet")).toSet
        finally st.close()
      }
    }
    val g0Pin = leafNames("y=2020")
    val g1Pin = leafNames("_g1/y=2020/m=4")
    assert(g0Pin.nonEmpty && g1Pin.nonEmpty)
    // pruned UPDATE: y is identity in both generations (reads go
    // through SQL — the composite multi-generation scan; a bare
    // root-parquet read cannot see the _g<k> subtrees by design)
    spark.sql(s"UPDATE $g.pg SET v = v + 1 WHERE y = 2021")
    assert(spark.sql(s"SELECT k, v FROM $g.pg ORDER BY k")
      .as[(Long, Long)].collect().toSeq ===
      Seq((1L, 10L), (2L, 21L), (3L, 31L), (4L, 40L)))
    assert(leafNames("y=2020") === g0Pin,
      "gen0's unmatched leaf must keep its files in place")
    assert(leafNames("_g1/y=2020/m=4") === g1Pin,
      "gen1's unmatched leaf must keep its files in place")
    // the scanned gen0 leaf migrated into the current layout in place
    assert(leafNames("y=2021").isEmpty,
      "the scanned old-generation leaf is deleted")
    assert(leafNames("_g1/y=2021/m=2").nonEmpty,
      "its rows land under the current generation's layout")
    // whole-table posture for a data-column predicate still works
    spark.sql(s"UPDATE $g.pg SET v = 0 WHERE k = 1")
    assert(spark.sql(s"SELECT v FROM $g.pg ORDER BY k")
      .as[Long].collect().toSeq === Seq(0L, 21L, 31L, 40L))
    // the pinned-listing expect-check: a write that lands inside a
    // scanned leaf between scan and commit must refuse the staged
    // rewrite (never silently drop the concurrent rows). The race
    // window is deterministic at the VERB level: pin a leaf's print,
    // let a concurrent INSERT land inside it, then drive the commit
    // half directly with the stale pin — exactly the state a
    // statement paused between scan and commit would hand it.
    val leaf = Paths.get(cat.path("pg"), "_g1", "y=2021", "m=2")
    val pinned = cat.leafPrintAt(leaf.toString)
    Seq((9L, 90L, 2021, 2)).toDF("k", "v", "y", "m")
      .createOrReplaceTempView("pg_rush")
    spark.sql(s"INSERT INTO $g.pg SELECT * FROM pg_rush")
    val staged = Files.createTempDirectory("pg_staged")
    Seq((2L, 999L, 2021, 2)).toDF("k", "v", "y", "m")
      .write.mode("overwrite").parquet(staged.toString)
    val e = intercept[IllegalArgumentException](
      cat.replaceLeavesAcrossGensFromStagedPlain("pg", staged,
        Map(leaf.toString -> pinned),
        cat.readPartitioned("pg").schema))
    assert(e.getMessage.contains("changed since"), e.getMessage)
    // nothing was lost: the concurrent row and the pre-statement rows
    // all survive the refused commit
    assert(spark.sql(s"SELECT k FROM $g.pg").as[Long].collect()
      .sorted.toSeq === Seq(1L, 2L, 3L, 4L, 9L))
  }

  test("LEAF-GRANULAR row-level SQL on a 2-generation pv table (r18): " +
      "a partition-source predicate pins only the matching leaves per " +
      "generation — untouched leaves in EVERY generation carry with " +
      "their file names intact, scanned rows migrate into the current " +
      "layout, one commit, time travel intact") {
    val (cat, g) = freshSqlCat()
    twoGen(cat, "lg")
    val v0 = cat.currentVersion("lg").get
    def leafNames(v: Long, rel: String): Set[String] = {
      import scala.jdk.CollectionConverters._
      val p = Paths.get(cat.path("lg"), s"_v$v", rel)
      if (!Files.exists(p)) Set.empty
      else {
        val st = Files.list(p)
        try st.iterator().asScala.map(_.getFileName.toString)
          .filter(_.endsWith(".parquet")).toSet
        finally st.close()
      }
    }
    val g0Untouched = leafNames(v0, "y=2020")
    val g1Untouched = leafNames(v0, "_g1/y=2020/m=4")
    assert(g0Untouched.nonEmpty && g1Untouched.nonEmpty)
    // y is identity partition-source in BOTH generations: the
    // statement must pin gen0's y=2021 leaf and gen1's y=2021/m=3
    // leaf only — k=2 (gen0) and k=3 (gen1) rewrite, k=1/k=4 carry
    spark.sql(s"UPDATE $g.lg SET v = v + 1 WHERE y = 2021")
    val v1 = cat.currentVersion("lg").get
    assert(v1 === v0 + 1L, "one snapshot commit")
    assert(cat.read("lg").orderBy("k").select("k", "v")
      .as[(Long, Long)].collect().toSeq ===
      Seq((1L, 10L), (2L, 21L), (3L, 31L), (4L, 40L)))
    // untouched leaves in BOTH generations hard-link through with
    // their file names byte-identical — the proof the rewrite was
    // leaf-granular, not the r17 whole-table copy-on-write
    assert(leafNames(v1, "y=2020") === g0Untouched,
      "gen0's unmatched leaf must carry, not rewrite")
    assert(leafNames(v1, "_g1/y=2020/m=4") === g1Untouched,
      "gen1's unmatched leaf must carry, not rewrite")
    // the scanned gen0 leaf migrated into the current layout
    assert(leafNames(v1, "y=2021").isEmpty,
      "the scanned old-generation leaf is replaced, not carried")
    assert(leafNames(v1, "_g1/y=2021/m=2").nonEmpty,
      "its rows land under the current generation's layout")
    assert(cat.readVersion("lg", v0).select("v").as[Long].collect()
      .sorted.toSeq === Seq(10L, 20L, 30L, 40L), "time travel intact")
    // an UPDATE that MOVES a row into an existing UNSCANNED leaf
    // merges additively: the carried files stay, the moved row's file
    // lands beside them (the clobber hazard the single-generation
    // tuple replace refuses cannot arise under skip+adopt)
    spark.sql(s"UPDATE $g.lg SET y = 2020, m = 4 " +
      "WHERE y = 2021 AND m = 3")
    val v2 = cat.currentVersion("lg").get
    assert(v2 === v1 + 1L)
    assert(cat.read("lg").orderBy("k").select("k", "y", "m")
      .as[(Long, Int, Int)].collect().toSeq ===
      Seq((1L, 2020, 1), (2L, 2021, 2), (3L, 2020, 4), (4L, 2020, 4)))
    val merged = leafNames(v2, "_g1/y=2020/m=4")
    assert(g1Untouched.subsetOf(merged) && merged.size > g1Untouched.size,
      s"the moved row must ADD to the unscanned leaf ($merged vs " +
        s"$g1Untouched)")
    assert(leafNames(v2, "_g1/y=2021/m=3").isEmpty,
      "the emptied source leaf is not carried")
    assert(leafNames(v2, "_g1/y=2021/m=2") === leafNames(v1,
      "_g1/y=2021/m=2"), "a leaf outside the pinned set must carry " +
      "even inside a scanned generation")
  }

  test("multi-gen DML commit racing a concurrent append (r18 " +
      "adversarial probe): the expect-check must refuse the staged " +
      "rewrite — the appended rows survive, nothing is silently " +
      "dropped, and the re-run converges") {
    val (cat, g) = freshSqlCat()
    twoGen(cat, "rc2")
    val v0 = cat.currentVersion("rc2").get
    // the DML's scan pinned leaves against _v{v0}; before its commit
    // lands, a concurrent append commits v0+1 — exactly the interleave
    // a paused statement hands the commit verb
    val staged = Files.createTempDirectory("rc2_staged")
    Seq((2L, 999L, 2021, 2)).toDF("k", "v", "y", "m")
      .write.mode("overwrite").parquet(staged.toString)
    cat.appendPartitionedVersioned("rc2",
      Seq((9L, 90L, 2021, 9)).toDF("k", "v", "y", "m"))
    val e = intercept[IllegalArgumentException](
      cat.replaceLeavesAcrossGensFromStaged("rc2", staged,
        Seq("y=2021"), cat.read("rc2").schema, expect = v0))
    assert(e.getMessage.contains("moved"), e.getMessage)
    // nothing dropped: the append's row AND the pre-statement rows
    assert(cat.read("rc2").select("k").as[Long].collect().sorted.toSeq ===
      Seq(1L, 2L, 3L, 4L, 9L))
    // the re-run (fresh scan against the NEW head) converges
    spark.sql(s"UPDATE $g.rc2 SET v = 999 WHERE k = 2")
    assert(cat.read("rc2").filter($"k" === 2L).select("v")
      .as[Long].head() === 999L)
    assert(cat.read("rc2").count() === 5L)
  }

  test("eager spec evolution on a pv table (repartitionTableTransformed)" +
      " = lazy evolve + generation compaction, history preserved") {
    val (cat, g) = freshSqlCat()
    cat.createPartitionedVersioned("ev",
      Seq((0L, 0L, 0, 0)).toDF("k", "v", "y", "m").schema, Seq("y"))
    cat.appendPartitionedVersioned("ev",
      Seq((1L, 10L, 2020, 1), (2L, 20L, 2021, 2)).toDF("k", "v", "y", "m"))
    cat.repartitionTable("ev", Seq("y", "m"))
    assert(cat.specGenerations("ev").size === 1)
    assert(cat.specGenerations("ev").head.partCols === Seq("y", "m"))
    val v = cat.currentVersion("ev").get
    assert(Files.exists(Paths.get(cat.path("ev"), s"_v$v",
      "y=2021", "m=2")), "rows rewrite under the new spec at root")
    assert(cat.read("ev").select("k").as[Long].collect().sorted.toSeq ===
      Seq(1L, 2L))
    assert(spark.sql(s"SELECT k FROM $g.ev WHERE y=2020 AND m=1")
      .as[Long].collect().toSeq === Seq(1L))
    // history survived: the REPARTITION commit is one more version
    assert(cat.history("ev").count() >= 3L)
    // DML works immediately after
    cat.dropPartitionsVersioned("ev", Seq(Seq(Some("2020"), Some("1"))))
    assert(cat.read("ev").select("k").as[Long].collect().toSeq === Seq(2L))
    // same-spec call is a no-op
    val vSame = cat.currentVersion("ev").get
    cat.repartitionTable("ev", Seq("y", "m"))
    assert(cat.currentVersion("ev") === Some(vSame))
  }

  test("ADD COLUMN on a lazily-evolved table is one sidecar write: " +
      "every generation keeps its layout, old files null-fill, new " +
      "writes carry the column (plain and pv)") {
    val (cat, g) = freshSqlCat()
    twoGen(cat, "ac")
    spark.sql(s"ALTER TABLE $g.ac ADD COLUMN note STRING")
    assert(cat.specGenerations("ac").size === 2,
      "ADD COLUMN must not disturb the generation list")
    assert(cat.read("ac").columns.toSeq === Seq("k", "v", "y", "m", "note"))
    assert(cat.read("ac").filter(col("note").isNotNull).count() === 0L)
    cat.appendPartitionedVersioned("ac",
      Seq((9L, 90L, 2022, 9, "late")).toDF("k", "v", "y", "m", "note"))
    assert(spark.sql(s"SELECT k FROM $g.ac WHERE note = 'late'")
      .as[Long].collect().toSeq === Seq(9L))
    assert(cat.read("ac").count() === 5L)
    // describe_detail surfaces the evolution state
    assert(spark.sql(s"CALL $g.system.describe_detail('ac')").head()
      .getString(8) === "root:(y);_g1:(y,m)",
      "spec_generations must show each generation's dir and columns")
    // compaction collapses with the evolved shape intact
    cat.compactGenerationsVersioned("ac")
    assert(cat.read("ac").filter(col("note") === "late").count() === 1L)
    assert(cat.read("ac").columns.toSeq === Seq("k", "v", "y", "m", "note"))
    assert(spark.sql(s"CALL $g.system.describe_detail('ac')").head()
      .getString(8) === "root:(y,m)")
  }

  test("exactly-once pv batch replay ignores an ORPHAN history stamp " +
      "whose commit never landed (ADVICE r15 high)") {
    val (cat, _) = freshSqlCat()
    cat.createPartitionedVersioned("rb",
      Seq((0L, 0L, "x")).toDF("k", "v", "dt").schema, Seq("dt"))
    cat.appendPartitionedVersionedBatch("rb",
      Seq((1L, 10L, "2024-01-01")).toDF("k", "v", "dt"), 0L, "tok")
    val cur = cat.currentVersion("rb").get
    // SIMULATE the crash: a history entry for batch 1 stamped at
    // version cur+1 exists, but the pointer rename never happened —
    // the batch's rows are NOT in any committed snapshot
    val orphan = s"""{"version":${cur + 1L},"tsMillis":${0L},""" +
      s""""op":"APPEND","files":1,"bytes":1,"pub":"sb-tok-1"}"""
    Files.write(Paths.get(cat.path("rb"), "_history",
      f"h${cur + 1L}%012d-orphan.json"), orphan.getBytes(UTF_8))
    // the replayed batch must COMMIT (an orphan stamp is not proof)
    val v = cat.appendPartitionedVersionedBatch("rb",
      Seq((2L, 20L, "2024-01-02")).toDF("k", "v", "dt"), 1L, "tok")
    assert(v === cur + 1L, "the replay must land the batch")
    assert(cat.read("rb").select("k").as[Long].collect().sorted.toSeq ===
      Seq(1L, 2L), "the batch's rows must exist — an orphan stamp " +
        "must never swallow a batch")
    // and now that it IS committed, a true replay no-ops
    cat.appendPartitionedVersionedBatch("rb",
      Seq((2L, 20L, "2024-01-02")).toDF("k", "v", "dt"), 1L, "tok")
    assert(cat.read("rb").count() === 2L)
  }
}
