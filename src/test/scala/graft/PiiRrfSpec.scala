package graft

import org.apache.spark.sql.functions._
import graft.text.TextOps
import graft.sim.SimSearch

/** Luhn card validation + extended PII redaction, and reciprocal-rank
  * fusion.
  */
class PiiRrfSpec extends SparkSpec {
  import spark.implicits._

  private def luhn(s: String): Boolean =
    Seq(Tuple1(s)).toDF("d")
      .select(TextOps.luhnValid(col("d"))).first().getBoolean(0)

  test("luhnValid: known-good cards pass, checksum breaks fail, " +
    "junk input is false (no ANSI throw)") {
    assert(luhn("4539578763621486"))
    assert(luhn("378282246310005")) // 15-digit amex
    assert(!luhn("4539578763621487"))
    assert(!luhn("123"))            // too short
    assert(!luhn(""))
    assert(!luhn("not a number"))
    assert(!luhn("45395787636214861234567")) // too long (>19)
  }

  test("redactPiiExtended: cards (any checksum) and phones redact, " +
    "prose survives") {
    val in = "pay 4539-5787-6362-1487 or call (555) 123-4567, " +
      "mail a@b.com"
    val got = Seq(Tuple1(in)).toDF("t")
      .select(TextOps.redactPiiExtended(col("t"))).first().getString(0)
    assert(got == "pay <CARD> or call <PHONE>, mail <EMAIL>", got)
  }

  test("rrfFuse: hand-computed fusion order; absent-from-one-list " +
    "candidates still score") {
    val a = Seq((1L, 100L, 1), (1L, 200L, 2)).toDF("qid", "id", "rank")
    val b = Seq((1L, 200L, 1), (1L, 300L, 2)).toDF("qid", "id", "rank")
    val got = SimSearch.rrfFuse(Seq(a, b), k = 10).collect()
      .sortBy(_.getInt(3)).map(r => (r.getLong(1), r.getDouble(2)))
    // y=200: 1/62+1/61, x=100: 1/61, z=300: 1/62
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.map(_._1).toSeq == Seq(200L, 100L, 300L), got.toSeq)
    assert(got(0)._2 == r6(1.0 / 62 + 1.0 / 61))
    assert(got(1)._2 == r6(1.0 / 61))
    assert(got(2)._2 == r6(1.0 / 62))
  }

  test("rrfFuse: k truncates per query and ties break by id") {
    val a = Seq((1L, 10L, 1), (1L, 20L, 1), (2L, 30L, 1))
      .toDF("qid", "id", "rank") // same rank -> same rrf: id decides
    val b = Seq((1L, 10L, 9), (1L, 20L, 9), (2L, 30L, 9))
      .toDF("qid", "id", "rank")
    val got = SimSearch.rrfFuse(Seq(a, b), k = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 10L, 2L -> 30L), got)
  }
}
