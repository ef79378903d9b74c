package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.catalog.TableCatalog
import java.nio.file.Files

/** RESTORE must replicate the old snapshot as a NEW monotonic commit —
  * nothing rewound, bad versions still inspectable, tags usable as
  * restore points, and out-of-horizon targets refused loudly. */
class RestoreSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("restore replicates an old snapshot as a new commit") {
    val cat = new TableCatalog(spark,
      Files.createTempDirectory("restore").toString)
    cat.replaceAtomic("t", Seq((1L, 10L), (2L, 20L)).toDF("k", "v"))
    val good = cat.tag("t", "good")
    cat.replaceAtomic("t", Seq((1L, -999L)).toDF("k", "v")) // the bad deploy
    assert(cat.read("t").count() === 1L)

    val restored = cat.restoreTag("t", "good")
    assert(restored === good + 2) // v1 good, v2 bad, v3 = restored copy
    assert(cat.currentVersion("t") === Some(restored))
    assert(cat.read("t").as[(Long, Long)].collect().toSet
      === Set((1L, 10L), (2L, 20L)))
    // the bad version is history, not erased
    assert(cat.readVersion("t", good + 1).as[(Long, Long)].collect().toSet
      === Set((1L, -999L)))
  }

  test("unknown tags and pruned versions are refused loudly") {
    val cat = new TableCatalog(spark,
      Files.createTempDirectory("restore2").toString)
    cat.replaceAtomic("t", Seq((1L, 1L)).toDF("k", "v"))
    assertThrows[IllegalArgumentException] { cat.restoreTag("t", "nope") }
    assertThrows[IllegalArgumentException] { cat.restore("t", 99L) }
  }
}
