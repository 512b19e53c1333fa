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

  test("fusedRecallSummary: against a ground truth spanning lexical " +
    "AND semantic relevance, fused recall strictly beats every " +
    "single leg (each leg only reaches its own aspect)") {
    // doc 0 is the query. Docs 1-3 are LEXICALLY relevant (share its
    // rare tokens, embeddings point the opposite way); docs 4-6 are
    // SEMANTICALLY relevant (disjoint vocabulary, embeddings nearly
    // parallel); 7-16 are fillers (disjoint vocab, orthogonal).
    def vec(x: Double, y: Double) = Seq(x.toFloat, y.toFloat, 0f, 0f)
    val rows =
      Seq((0L, "alpha bravo charlie", vec(1, 0))) ++
      (1L to 3L).map(i =>
        (i, s"alpha bravo charlie report$i", vec(-1, 0.01 * i))) ++
      (4L to 6L).map(i =>
        (i, s"unrelated prose item$i entirely", vec(1, 0.01 * i))) ++
      (7L to 16L).map(i => (i, s"filler text piece$i", vec(0, 1)))
    val corpus = rows.toDF("doc_id", "text", "vec").localCheckpoint()
    val queries = Seq((0L, "alpha"), (0L, "bravo"), (0L, "charlie"))
      .toDF("query_id", "term")
    val sparse = graft.text.Bm25.search(corpus, "text", "doc_id",
      queries, "query_id", k = 6)
      .filter(col("doc_id") =!= 0L) // more-like-this: drop self-match
      .select(col("query_id").as("qid"), col("doc_id").as("id"),
        col("rank"))
    val dense = SimSearch.bruteForceTopK(
      corpus.select(col("doc_id"), col("vec")), "doc_id", "vec",
      col("doc_id") === 0L, k = 6)
      .select(col("qid"), col("neighbor").as("id"),
        (col("rank") + 1).as("rank"))
    // ground truth: all six relevant docs, both aspects
    val gt = (1L to 6L).map(n => (0L, (n - 1).toInt, n))
      .toDF("qid", "rank", "neighbor")
    val got = SimSearch.fusedRecallSummary(
      Seq("sparse" -> sparse, "dense" -> dense), gt, k = 6)
      .collect().map(r => r.getString(0) ->
        r.getAs[Double]("mean_recall")).toMap
    assert(got("sparse") == 0.5, got)  // lexical aspect only
    assert(got("dense") == 0.5, got)   // semantic aspect only
    assert(got("fused") == 1.0, got)   // the fusion reaches both
  }
}
