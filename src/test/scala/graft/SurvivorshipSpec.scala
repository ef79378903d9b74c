package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Survivorship
import graft.ops.Survivorship._

/** Golden-record survivorship: every rule's pick, its deterministic
  * tie-break, and the null edge cases (null candidates never survive
  * unless the entity has no non-null candidate at all). */
class SurvivorshipSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  // (entity, name, phone, email, bal, src, ts)
  private val rows = Seq(
    // e1: "Ann" appears twice (mode), phone from src 1 wins priority,
    // email from the latest ts wins, bal takes the max
    (1L, "Ann", "111", "a@old", 10L, 2L, 100L),
    (1L, "Ann", null: String, "a@new", 30L, 3L, 300L),
    (1L, "Anne", "222", null: String, 20L, 1L, 200L),
    // e2: mode tie ("Bob" x1 vs "Bo" x1) -> smallest value "Bo";
    // priority tie on src=1 -> smallest phone; latest tie on ts -> smallest email
    (2L, "Bob", "900", "z@x", 5L, 1L, 50L),
    (2L, "Bo", "800", "y@x", 7L, 1L, 50L),
    // e3: all-null name and email -> nulls survive (nothing to pick)
    (3L, null: String, "777", null: String, 1L, 1L, 10L),
    // entity null -> dropped entirely
    (0L, "Ghost", "000", "g@x", 99L, 1L, 999L)
  ).toDF("e", "name", "phone", "email", "bal", "src", "ts")
    .withColumn("e", when(col("e") === 0L, lit(null)).otherwise(col("e")))

  private val rules = Seq(
    MostFrequent("name"), BySourcePriority("phone", "src"),
    Latest("email", "ts"), MaxValue("bal"))

  test("each rule picks per its contract; null entities dropped") {
    val out = Survivorship.golden(rows, "e", rules)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet === Set(1L, 2L, 3L))
    val e1 = out(1L)
    assert(e1.getLong(1) === 3L) // n_records
    assert(e1.getString(2) === "Ann")   // mode 2-vs-1
    assert(e1.getString(3) === "222")   // src=1 beats src=2; null skipped
    assert(e1.getString(4) === "a@new") // ts=300 latest
    assert(e1.getLong(5) === 30L)       // max bal
  }

  test("ties break toward the smallest value, deterministically") {
    val out = Survivorship.golden(rows, "e", rules)
      .filter(col("e") === 2L).collect().head
    assert(out.getString(2) === "Bo")  // mode tie -> lexicographic min
    assert(out.getString(3) === "800") // priority tie -> min phone
    assert(out.getString(4) === "y@x") // recency tie -> min email
  }

  test("a field with no non-null candidate survives as null") {
    val out = Survivorship.golden(rows, "e", rules)
      .filter(col("e") === 3L).collect().head
    assert(out.isNullAt(2) && out.isNullAt(4))
    assert(out.getString(3) === "777" && out.getLong(5) === 1L)
  }

  test("column order is entity, n_records, then rule order") {
    val cols = Survivorship.golden(rows, "e", rules).columns.toSeq
    assert(cols === Seq("e", "n_records", "name", "phone", "email", "bal"))
  }
}
