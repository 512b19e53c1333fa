package graft

import org.apache.spark.sql.functions._
import graft.text.TextOps

/** `graft_nfc` Unicode NFC kernel: canonical-equivalent spellings
  * collapse to identical bytes, ASCII and already-normalized input
  * pass through, nulls propagate, the SQL registration works.
  * (All fixtures are written as escape sequences so the source stays
  * ASCII and decomposed-vs-precomposed forms are unambiguous.)
  */
class NfcSpec extends SparkSpec {
  import spark.implicits._

  private def nfc1(s: String): String =
    Seq(Tuple1(s)).toDF("t")
      .select(TextOps.nfcNormalize(col("t"))).first().getString(0)

  test("decomposed and precomposed spellings collapse to one key") {
    val decomposed = "Cafe\u0301 menu"
    val precomposed = "Caf\u00E9 menu"
    assert(decomposed != precomposed)             // raw bytes differ...
    assert(nfc1(decomposed) == nfc1(precomposed)) // ...NFC keys match
    assert(nfc1(decomposed) == precomposed)
  }

  test("singleton and multi-mark compositions") {
    assert(nfc1("\u212B") == "\u00C5")            // Angstrom-sign singleton
    assert(nfc1("A\u030A") == "\u00C5")          // A + combining ring
    assert(nfc1("A\u030Angstro\u0308m") == "\u00C5ngstr\u00F6m")
    assert(nfc1("man\u0303ana") == "ma\u00F1ana")
  }

  test("ASCII and already-NFC text pass through byte-identical; " +
    "the kernel is idempotent") {
    val fixtures = Seq("plain ascii text", "", "tabs\tand\nnewlines",
      "Cafe\u0301", "Caf\u00E9", "A\u030Angstro\u0308m",
      "mixed ascii then Caf\u00E9 tail")
    fixtures.foreach { s =>
      val once = nfc1(s)
      assert(nfc1(once) == once, s"not idempotent on ${s.length} chars")
    }
    assert(nfc1("plain ascii text") == "plain ascii text")
  }

  test("null propagates; compatibility characters are NOT rewritten " +
    "(NFC, not NFKC)") {
    val r = Seq((1L, null: String), (2L, "\uFB01 ligature \uFF21"))
      .toDF("id", "t")
      .select(col("id"), TextOps.nfcNormalize(col("t")).as("n"))
      .orderBy("id").collect()
    assert(r(0).isNullAt(1))
    // fi-ligature U+FB01 and full-width A survive NFC untouched
    assert(r(1).getString(1) == "\uFB01 ligature \uFF21")
  }

  test("SQL registration: graft_nfc callable from spark.sql") {
    Seq(Tuple1("Cafe\u0301")).toDF("t").createOrReplaceTempView("nfc_in")
    val got = spark.sql("SELECT graft_nfc(t) AS n FROM nfc_in")
      .first().getString(0)
    assert(got == "Caf\u00E9")
  }
}
