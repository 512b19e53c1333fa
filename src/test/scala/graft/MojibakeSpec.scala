package graft

import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Mojibake detection + repair: fixtures are built by PERFORMING the
  * double-encoding (UTF-8 bytes read as cp1252), so the tests pin the
  * real corruption, not a hand-typed imitation.
  */
class MojibakeSpec extends SparkSpec {
  import spark.implicits._

  private def fix1(s: String): String =
    Seq(Tuple1(s)).toDF("t")
      .select(TextOps.fixMojibake(col("t"))).first().getString(0)

  private def score1(s: String): Int =
    Seq(Tuple1(s)).toDF("t")
      .select(TextOps.mojibakeScore(col("t"))).first().getInt(0)

  private def garble(s: String): String =
    new String(s.getBytes("UTF-8"), "windows-1252")

  private val clean = "café menu — it’s fine, señor"

  test("double-encoded text repairs back to the original") {
    val moji = garble(clean)
    assert(moji != clean)
    assert(fix1(moji) == clean)
  }

  test("clean text in several scripts passes through untouched") {
    // cp1252-mappable accents: encode succeeds but the byte stream is
    // not valid UTF-8, so the strict decode rejects the repair
    assert(fix1(clean) == clean)
    // CJK: cp1252 encode is impossible, repair never starts
    val cjk = "你好 world"
    assert(fix1(cjk) == cjk)
    assert(fix1("plain ascii") == "plain ascii")
  }

  test("null propagates") {
    val r = Seq((1L, null: String)).toDF("id", "t")
      .select(TextOps.fixMojibake(col("t"))).first()
    assert(r.isNullAt(0))
  }

  test("triple-encoded text peels one layer per pass") {
    // no em-dash here: its mojibake contains U+201D whose 0x9D byte
    // is unmappable in cp1252, so a second garble would be lossy
    val base = "caf\u00e9 it\u2019s se\u00f1or"
    val double = garble(base)
    val triple = garble(double)
    assert(fix1(triple) == double)
    assert(fix1(fix1(triple)) == base)
  }

  test("mojibakeScore flags garbled text and stays zero on clean") {
    assert(score1(garble(clean)) >= 3) // e-acute, em-dash, apostrophe...
    assert(score1(clean) == 0)
    assert(score1("plain ascii, 123") == 0)
    assert(score1("你好 world") == 0)
  }

  test("SQL registration: graft_fix_mojibake callable from spark.sql") {
    Seq(Tuple1(garble(clean))).toDF("t")
      .createOrReplaceTempView("moji_in")
    val got = spark.sql("SELECT graft_fix_mojibake(t) AS n FROM moji_in")
      .first().getString(0)
    assert(got == clean)
  }
}
