package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Pii, TextAnalysis}

/** PII scanning (Luhn-validated), the Zipf rank-frequency slope, and the
  * cross-source overlap matrix. */
class CorpusOpsSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  // ----------------------------------------------------------- luhnValid

  private def luhn(s: String): Boolean =
    Seq(s).toDF("s").select(Pii.luhnValid(col("s"))).head().getBoolean(0)

  test("luhnValid accepts real test PANs in any common formatting") {
    assert(luhn("4111111111111111"))       // Visa test number
    assert(luhn("4111-1111-1111-1111"))
    assert(luhn("4111 1111 1111 1111"))
    assert(luhn("5500005555555559"))       // Mastercard test number
    assert(luhn("378282246310005"))        // Amex (15 digits)
  }

  test("luhnValid rejects checksum failures, short runs, and non-digits") {
    assert(!luhn("4111111111111112"))      // off-by-one check digit
    assert(!luhn("1234567890123456"))
    assert(!luhn("411111111111"))          // 12 digits: too short
    assert(!luhn(""))
    assert(!luhn("no digits at all"))
  }

  // ----------------------------------------------------------- Pii.scan

  test("scan counts each class and validates cards") {
    val docs = Seq(
      (1L, "mail a@b.io and c.d+x@e.org, host 10.0.0.1, call 415-555-0199"),
      (2L, "valid 4111-1111-1111-1111 invalid 4111-1111-1111-1112"),
      (3L, "nothing to see here")
    ).toDF("doc_id", "text")
    val out = Pii.scan(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6))).toMap
    assert(out(1L) === ((2L, 1L, 1L, 0L, 0L, true)))
    assert(out(2L) === ((0L, 0L, 0L, 2L, 1L, true)),
      "two card-shaped runs, exactly one Luhn-valid")
    assert(out(3L) === ((0L, 0L, 0L, 0L, 0L, false)))
  }

  // ---------------------------------------------------------- zipfSlope

  test("zipfSlope recovers s ~ 1 on an exact Zipf frequency profile") {
    // freq(r) = 3840 / r at ranks 1..256 -> ln f = ln 3840 - ln 2 * log2 r
    val docs = (1 to 256).map { r =>
      ("en", (s"tok${"%03d".format(r)} ") * (3840 / r))
    }.toDF("lang", "text")
    val row = TextAnalysis.zipfSlope(docs, "text", "lang").head()
    assert(row.getString(0) === "en")
    assert(row.getLong(row.fieldIndex("n_points")) === 9L)
    assert(row.getLong(row.fieldIndex("f1")) === 3840L)
    val slope = row.getLong(row.fieldIndex("slope_e6"))
    // -ln 2 * 1e6 = -693147; integer freqs round the profile slightly
    assert(slope > -700000L && slope < -687000L, s"slope_e6 = $slope")
  }

  test("zipfSlope: flat (non-Zipf) profile slopes to ~0, groups independent") {
    val flat = (1 to 64).map(i => ("xx", s"t$i " * 10)).toDF("lang", "text")
    val zipfy = (1 to 64).map(r => ("en", (s"z$r ") * (640 / r)))
      .toDF("lang", "text")
    val out = TextAnalysis.zipfSlope(flat.union(zipfy), "text", "lang")
      .collect().map(r => r.getString(0) ->
        r.getLong(r.fieldIndex("slope_e6"))).toMap
    assert(out("xx") === 0L, "equal frequencies: exactly flat")
    assert(out("en") < -600000L)
  }

  // ------------------------------------------------------- sourceOverlap

  test("sourceOverlap aggregates near-dup pairs to unordered source cells") {
    val shared = "one two three four five six seven eight nine ten"
    val docs = Seq(
      (1L, shared, "srcA"),
      (2L, shared + " eleven", "srcB"),          // near-dup of 1, cross-source
      (3L, shared, "srcA"),                      // exact dup of 1, same source
      (4L, "totally different words here now", "srcB")
    ).toDF("doc_id", "text", "source")
    val out = Dedup.sourceOverlap(docs, "doc_id", "text", "source",
        n = 3, minJaccard = 0.5, maxDocFreq = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // pairs: (1,3) within srcA at jaccard 1.0; (1,2) and (2,3) across
    assert(out(("srcA", "srcA"))._1 === 1L)
    assert(out(("srcA", "srcA"))._2 === 1000000L)
    assert(out(("srcA", "srcB"))._1 === 2L)
    assert(!out.contains(("srcB", "srcB")), "doc 4 shares nothing")
  }
}
