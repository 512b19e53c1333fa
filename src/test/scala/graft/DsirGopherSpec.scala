package graft

import org.apache.spark.sql.functions._
import graft.text.{Dsir, NgramLm, TextOps}

/** Gopher-rule quality filtering, DSIR importance selection, and
  * bigram-LM perplexity scoring.
  */
class DsirGopherSpec extends SparkSpec {
  import spark.implicits._

  private def gopher(rows: Seq[(Long, String)], minWords: Int = 3) =
    rows.toDF("doc_id", "text")
      .select(col("doc_id"),
        TextOps.gopherRules(col("text"), minWords = minWords).as("g"))
      .select("doc_id", "g.*").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap

  test("gopherRules: each rule rejects its own pathology; clean prose " +
    "passes") {
    val m = gopher(Seq(
      1L -> "the quick brown fox jumps over a lazy dog and it is quite fine",
      2L -> "too few",                               // word count
      3L -> "the ### cat # sat # on # the # mat #",  // symbol ratio
      4L -> "- the cat\n- a dog\n- it is",           // bullet lines
      5L -> "the cat sat...\nand a dog ran...\nit is done...", // ellipsis
      6L -> "1 2 3 4 5 6 7 8 9 10 11 12",            // non-alpha words
      7L -> "cats dogs birds fish mice bats owls foxes")) // no stopwords
    assert(m(1L).getAs[Boolean]("pass"))
    assert(!m(2L).getAs[Boolean]("pass") && m(2L).getAs[Int]("n_words") == 2)
    assert(!m(3L).getAs[Boolean]("pass") &&
      m(3L).getAs[Double]("symbol_ratio") > 0.1)
    assert(!m(4L).getAs[Boolean]("pass") &&
      m(4L).getAs[Double]("bullet_line_ratio") == 1.0)
    assert(!m(5L).getAs[Boolean]("pass") &&
      m(5L).getAs[Double]("ellipsis_line_ratio") == 1.0)
    assert(!m(6L).getAs[Boolean]("pass") &&
      m(6L).getAs[Double]("alpha_word_ratio") == 0.0)
    assert(!m(7L).getAs[Boolean]("pass") &&
      m(7L).getAs[Int]("n_stopwords") == 0)
  }

  test("gopherRules: mean word length band and the '...'-run symbol " +
    "count") {
    val m = gopher(Seq(
      1L -> "ab cd ef gh ij kl",                    // mean len 2 < 3
      2L -> ("extraordinarily incomprehensible anthropological " +
        "internationalization characteristically phenomenological")))
    assert(!m(1L).getAs[Boolean]("pass") &&
      m(1L).getAs[Double]("mean_word_len") == 2.0)
    assert(!m(2L).getAs[Boolean]("pass") &&
      m(2L).getAs[Double]("mean_word_len") > 10.0)
    val e = gopher(Seq(3L -> "the cat...... sat on a mat ok yes"))
    // "......" = two non-overlapping "..." runs over 8 words
    assert(e(3L).getAs[Double]("symbol_ratio") == 0.25)
  }

  test("dsir: docs from the target vocabulary score positive, " +
    "off-target docs negative, and selection follows the sign") {
    // two disjoint vocabularies; target = the "alpha" side. Repeated
    // 100× so real counts dominate the +1 bucket smoothing — at toy
    // counts the smoothing term drags even pure-target docs negative
    // (the operator is built for corpora where counts >> buckets)
    val alpha = Seq.fill(100)("alpha beta gamma delta epsilon").mkString(" ")
    val beta = Seq.fill(100)("zork quux fnord blarg wibble").mkString(" ")
    val raw = Seq(
      (1L, alpha), (2L, alpha), (3L, alpha),
      (4L, beta), (5L, beta), (6L, beta),
      (7L, s"$alpha $beta")).toDF("doc_id", "text")
    val target = raw.filter(col("doc_id") <= 2)
    val w = Dsir.importanceWeights(raw, target, "text", "doc_id")
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("weight_micro"), r.getAs[Boolean]("selected")))
      .toMap
    assert(w.size == 7)
    for (id <- 1L to 3L) assert(w(id)._1 > 0 && w(id)._2, s"doc $id: $w")
    for (id <- 4L to 6L) assert(w(id)._1 < 0 && !w(id)._2, s"doc $id: $w")
    // the mixed doc sits between the pure docs of either side
    assert(w(7L)._1 < w(1L)._1 && w(7L)._1 > w(4L)._1)
    // pure-alpha docs share one weight; determinism across runs
    assert(w(1L)._1 == w(2L)._1 && w(2L)._1 == w(3L)._1)
    val again = Dsir.importanceWeights(raw, target, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == w.map { case (k, v) => k -> v._1 })
  }

  test("ngram lm: target-like docs score lower avg_nll than off-vocab " +
    "docs; short docs get null scores") {
    val inDist = Seq.fill(50)("the cat sat on the mat").mkString(" ")
    val outDist = Seq.fill(50)("zork quux fnord blarg wibble").mkString(" ")
    val raw = Seq(
      (1L, inDist), (2L, outDist), (3L, "single"), (4L, inDist))
      .toDF("doc_id", "text")
    val target = Seq((10L, inDist)).toDF("doc_id", "text")
    val s = NgramLm.bigramNll(raw, target, "text", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(s.size == 4)
    val nll = (id: Long) => s(id).getAs[Double]("avg_nll")
    assert(nll(1L) < nll(2L), s"in-dist ${nll(1L)} !< off ${nll(2L)}")
    assert(nll(1L) == nll(4L)) // identical docs, identical exact score
    assert(s(3L).getAs[Long]("n_bigrams") == 0L && s(3L).isNullAt(
      s(3L).fieldIndex("avg_nll")))
    assert(s(1L).getAs[Long]("nll_micro") > 0L)
  }

  test("gopherRules filters a STREAM: scan-stage quality rules apply " +
    "per micro-batch with no state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val query = docs
      .withColumn("g", TextOps.gopherRules(col("text"), minWords = 3))
      .filter(col("g.pass")).drop("g")
      .writeStream.format("memory").queryName("gopher_stream")
      .outputMode("append").start()
    try {
      mem.addData(
        1L -> "the quick brown fox jumps over a lazy dog and it is fine",
        2L -> "too few")
      query.processAllAvailable()
      mem.addData(3L -> "1 2 3 4 5 6 7 8 9 10")
      query.processAllAvailable()
      val kept = spark.table("gopher_stream").collect()
        .map(_.getAs[Long]("doc_id")).toSet
      assert(kept == Set(1L))
    } finally query.stop()
  }

  test("dsir: bucket count changes resolution but pure-target docs " +
    "stay selected") {
    val a = Seq.fill(100)("alpha beta gamma").mkString(" ")
    val z = Seq.fill(100)("zork quux fnord").mkString(" ")
    val raw = Seq((1L, a), (2L, a), (3L, z)).toDF("doc_id", "text")
    val target = raw.filter(col("doc_id") === 1)
    for (b <- Seq(16, 256)) {
      val w = Dsir.importanceWeights(raw, target, "text", "doc_id",
        buckets = b).collect()
        .map(r => r.getLong(0) -> r.getAs[Boolean]("selected")).toMap
      assert(w(1L) && w(2L) && !w(3L), s"buckets=$b: $w")
    }
  }

  test("groupDivergence: the drifted source scores highest, a " +
    "blend-like source lowest, kl >= 0 up to micro-rounding") {
    val common = Seq.fill(50)("the cat sat on the mat").mkString(" ")
    val drift = Seq.fill(50)("zork quux fnord blarg xyzzy grue").mkString(" ")
    val df = Seq(
      (1L, common, "srcA"), (2L, common, "srcA"),
      (3L, common, "srcB"), (4L, drift, "srcB"),
      (5L, drift, "srcC"), (6L, drift, "srcC")).toDF(
      "doc_id", "text", "source")
    val kl = Dsir.groupDivergence(df, "text", "source", buckets = 64)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("kl"))).toMap
    assert(kl.keySet == Set("srcA", "srcB", "srcC"))
    assert(kl("srcA")._1 == 2 * 6 * 50)
    // srcB IS half-common-half-drift = closest to the corpus blend
    assert(kl("srcB")._2 < kl("srcA")._2 && kl("srcB")._2 < kl("srcC")._2)
    kl.values.foreach { case (_, k) => assert(k >= -1e-6, s"kl < 0: $kl") }
  }
}
