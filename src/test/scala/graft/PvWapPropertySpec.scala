package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.catalog.TableCatalog
import java.nio.file.Files

/** Randomized interleavings of the pv WAP protocol — the property the
  * whole crash machinery exists for: across ANY sequence of stages,
  * replays, crashed publishes (pre-commit and post-commit), foreign
  * appends and recovering publishes, every staged batch lands EXACTLY
  * once and every foreign append exactly once. Unit scenarios pin each
  * window individually (PvBranchSpec); this walk explores their
  * compositions. */
class PvWapPropertySpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  /** Batch `batch`'s rows — DETERMINISTIC in the id (cardinality
    * 1 + batch % 3), so a replay re-delivers identical data, exactly
    * like a checkpointed source would. */
  private def rows(batch: Int) =
    (0 until (1 + batch % 3)).map(i =>
      (batch * 1000L + i, f"2024-01-${(batch % 27) + 1}%02d"))
      .toDF("k", "dt")

  test("random stage/replay/crash/foreign-append walks: every batch " +
      "lands exactly once, never twice, never lost") {
    Seq(11L, 42L, 1337L, 2024L, 7L).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val cat = new TableCatalog(spark,
        Files.createTempDirectory(s"pvprop$seed").toString)
      cat.createPartitionedVersioned("f",
        rows(0).schema, Seq("dt"))
      var nextBatch = 0
      var staged = Vector.empty[Int] // ids staged in some life
      var foreign = 0
      val ops = 14
      (0 until ops).foreach { _ =>
        rnd.nextInt(6) match {
          case 0 | 1 => // stage a NEW batch
            cat.appendToBranchBatch("f", "wap", nextBatch.toLong,
              rows(nextBatch), token = "tok")
            staged :+= nextBatch
            nextBatch += 1
          case 2 =>
            // replay a prior batch id with IDENTICAL rows, through the
            // caller's documented skip gate (the startBranchIngest
            // rule): a batch at or below the published high-water mark
            // already COMMITTED and must not restage into a new life
            val published = cat.publishedBranchBatch("f", "wap", "tok")
              .getOrElse(-1L)
            val candidates = staged.filter(_ > published)
            if (candidates.nonEmpty) {
              val b = candidates(rnd.nextInt(candidates.size))
              cat.appendToBranchBatch("f", "wap", b.toLong,
                rows(b), token = "tok")
            }
          case 3 => // publish, crash BEFORE the commit (a publish that
            // resolves as pure RECOVERY of a prior crash never reaches
            // the hook and completes normally — both are legal)
            if (cat.branches("f").contains("wap"))
              try cat.publishBranchHooked("f", "wap",
                afterPend = () => throw new RuntimeException("pre"),
                afterCommit = () => ())
              catch { case e: RuntimeException
                if e.getMessage == "pre" => () }
          case 4 => // publish, crash AFTER the commit
            if (cat.branches("f").contains("wap"))
              try cat.publishBranchHooked("f", "wap",
                afterPend = () => (),
                afterCommit = () => throw new RuntimeException("post"))
              catch { case e: RuntimeException
                if e.getMessage == "post" => () }
          case 5 => // a foreign pv append takes the next version
            cat.appendPartitionedVersioned("f",
              Seq((90000L + foreign, "2024-02-01")).toDF("k", "dt"))
            foreign += 1
        }
      }
      // replays after the final crash may still be pending as staged
      // rows; settle with a clean publish (possibly recovering first)
      if (cat.branches("f").contains("wap")) cat.publishBranch("f", "wap")
      val head = cat.read("f")
      val n = head.count()
      assert(head.distinct().count() === n,
        s"seed $seed: duplicated rows on the head")
      // exactly-once per batch: each staged batch's key range appears
      // with its full cardinality, exactly once
      val got = head.filter($"k" < 90000L).select("k").as[Long]
        .collect().sorted.toSeq
      val want = staged.flatMap(b =>
        (0 until (1 + (b % 3))).map(i => b * 1000L + i)).sorted
      assert(got === want,
        s"seed $seed: staged batches lost or doubled")
      assert(head.filter($"k" >= 90000L).count() === foreign.toLong,
        s"seed $seed: foreign appends lost or doubled")
      assert(cat.branches("f").isEmpty, s"seed $seed: branch not consumed")
    }
  }
}
