package graft

import org.apache.spark.sql.functions._
import graft.text.Classifier

/** Loadable linear (fasttext-style) classifier: model parsing, both
  * apply flavors row-identical, sign-exact keep decision.
  */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val model = Classifier.parse(Seq(
    "# comment",
    "__bias__ -0.1",
    "good 0.5",
    "bad -0.5",
    "",
    "good 0.4")) // last wins

  test("parse: comments/blanks skipped, bias split out, last dup wins") {
    assert(model.biasMicro === -100000L)
    assert(model.weightsMicro === Map("good" -> 400000L, "bad" -> -500000L))
    intercept[IllegalArgumentException] { Classifier.parse(Seq("a b c")) }
  }

  test("score: mean-pooled logit, OOV weight 0, integer-exact keep") {
    val df = Seq(
      (1L, "good good good"),        // mean 0.4 + bias -0.1 > 0
      (2L, "bad bad"),               // negative
      (3L, "oov words only"),        // bias alone: -0.1 → drop
      (4L, "good bad"),              // mean -0.05 + bias → drop
      (5L, "good oov")               // mean 0.2 - 0.1 → keep
    ).toDF("doc_id", "text")
    val got = Classifier.score(df, "text", "doc_id", model)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("w_sum_micro"),
          r.getAs[Boolean]("keep")))).toMap
    assert(got(1L) === ((3L, 1200000L, true)))
    assert(got(2L) === ((2L, -1000000L, false)))
    assert(got(3L) === ((3L, 0L, false)))
    assert(got(4L) === ((2L, -100000L, false)))
    assert(got(5L) === ((2L, 400000L, true)))
  }

  test("scoreMapLiteral is row-identical to score, including the " +
    "empty-model edge") {
    val df = Seq((1L, "good bad oov"), (2L, "x"), (3L, "good good"))
      .toDF("doc_id", "text")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("doc_id").collect().toSeq
    assert(rows(Classifier.scoreMapLiteral(df, "text", "doc_id", model))
      === rows(Classifier.score(df, "text", "doc_id", model)))
    val empty = Classifier.LinearModel(50000L, Map.empty)
    val a = rows(Classifier.score(df, "text", "doc_id", empty))
    assert(rows(Classifier.scoreMapLiteral(df, "text", "doc_id", empty))
      === a)
    // positive bias + empty weights keeps everything
    assert(a.forall(_.getAs[Boolean]("keep")))
  }

  test("scoreMapLiteral plans with no shuffle (scan-stage apply)") {
    val df = Seq((1L, "good bad")).toDF("doc_id", "text")
    val plan = Classifier.scoreMapLiteral(df, "text", "doc_id", model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("trainNaiveBayes: log-odds signs follow class association, " +
    "bias is the class-prior log odds, and the trained model " +
    "separates the training classes through the standard serve path") {
    val docs = Seq(
      (1L, "the cat sat", true), (2L, "the dog ran", true),
      (3L, "the bird flew", true),
      (4L, "le chat noir", false), (5L, "le chien brun", false))
      .toDF("doc_id", "text", "is_en")
    val w = Classifier.trainNaiveBayes(docs, "text", col("is_en"))
    val wm = w.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // class-exclusive tokens get the right sign; shared-nothing here
    assert(wm("the") > 0 && wm("cat") > 0, wm.toString)
    assert(wm("le") < 0 && wm("chat") < 0, wm.toString)
    // bias = ln(3/2) in micro-nats
    assert(wm(Classifier.BiasToken) ==
      math.round(math.log(3.0 / 2.0) * 1e6))
    // verify one weight end-to-end: cp(the)=3, cn=0, T+=9, T-=6, V=12
    // => w(the) = ln((3+1)/(9+12)) - ln((0+1)/(6+12))
    assert(wm("the") == math.round(
      (math.log(4.0 / 21.0) - math.log(1.0 / 18.0)) * 1e6))
    // the trained table serves through BOTH paths identically and
    // separates the classes
    val scored = Classifier.scoreWithWeights(docs, "text", "doc_id", w)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Boolean]("keep")).toMap
    assert(scored == Map(1L -> true, 2L -> true, 3L -> true,
      4L -> false, 5L -> false), scored.toString)
    val viaModel = Classifier.score(docs, "text", "doc_id",
      Classifier.weightsToModel(w))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("w_sum_micro"), r.getAs[Boolean]("keep"))).toMap
    val viaWeights = Classifier.scoreWithWeights(docs, "text", "doc_id",
      w).collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("w_sum_micro"), r.getAs[Boolean]("keep"))).toMap
    assert(viaModel == viaWeights)
    // modelLines round-trips bit-identically through parse
    val rt = Classifier.parse(Classifier.modelLines(
      Classifier.weightsToModel(w)))
    assert(rt == Classifier.weightsToModel(w))
    // the collect guard fails loudly instead of pulling an oversized
    // vocabulary onto the driver
    intercept[IllegalArgumentException] {
      Classifier.weightsToModel(w, maxVocab = 2)
    }
  }

  test("scoreMapLiteral filters a STREAM: stateless per-micro-batch " +
    "apply, same decisions as batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val scored = Classifier.scoreMapLiteral(
      in.toDF().toDF("doc_id", "text"), "text", "doc_id", model)
      .filter(col("keep"))
    val query = scored.writeStream.format("memory")
      .queryName("classifier_stream").outputMode("append").start()
    try {
      in.addData((1L, "good good good"), (2L, "bad bad"), (3L, "oov"))
      query.processAllAvailable()
      in.addData((4L, "good oov"))
      query.processAllAvailable()
      val kept = spark.table("classifier_stream").collect()
        .map(_.getAs[Long]("doc_id")).toSet
      assert(kept === Set(1L, 4L))
    } finally query.stop()
  }

  test("prCurve: hand-computed counts and ratios; zero-denominator " +
    "cells are NULL, never NaN") {
    val scored = Seq(
      (1L, 0.9, true), (2L, 0.8, false), (3L, 0.6, true),
      (4L, 0.4, true), (5L, 0.2, false))
      .toDF("doc_id", "score", "label")
    val rows = Classifier.prCurve(scored, "score", "label",
      Seq(0.5, 0.95)).collect()
      .map(r => r.getDouble(0) -> r).toMap
    val at05 = rows(0.5)
    assert((at05.getLong(1), at05.getLong(2), at05.getLong(3))
      == ((2L, 1L, 1L)))
    assert(at05.getDouble(4) == 0.666667) // precision, rounded
    assert(at05.getDouble(5) == 0.666667) // recall
    assert(at05.getDouble(6) == 0.666667) // f1 (p == r)
    val at95 = rows(0.95)
    assert((at95.getLong(1), at95.getLong(2), at95.getLong(3))
      == ((0L, 0L, 3L)))
    assert(at95.isNullAt(4)) // no predicted positives: precision NULL
    assert(at95.getDouble(5) == 0.0)
    assert(at95.isNullAt(6)) // f1 NULL via precision
  }

  test("calibrationReport: buckets partition the corpus, a separable " +
    "label splits into a perfect top and bottom bucket") {
    val docs = ((0 until 20).map(i => (i.toLong, "good stuff here")) ++
      (20 until 50).map(i => (i.toLong, "bad junk there")))
      .toDF("doc_id", "text")
    val y = col("text").contains("good")
    val w = Classifier.trainNaiveBayes(docs, "text", y)
    val rep = Classifier.calibrationReport(docs, "text", "doc_id", y, w)
      .collect().sortBy(_.getLong(0))
    assert(rep.map(_.getLong(1)).sum == 50L)
    assert(rep.forall(r => r.getLong(0) >= 0 && r.getLong(0) <= 9))
    // the separable label lands positives in the top occupied bucket
    // at acc 1.0 and negatives in the bottom at acc 0.0
    assert(rep.last.getDouble(4) == 1.0 &&
      rep.last.getLong(2) == 20L, rep.mkString(";"))
    assert(rep.head.getDouble(4) == 0.0 &&
      rep.head.getLong(2) == 0L, rep.mkString(";"))
    // claimed confidence tracks the bucket boundaries
    rep.foreach { r =>
      val mc = r.getDouble(5)
      assert(mc >= r.getLong(0) / 10.0 - 1e-9 &&
        mc <= (r.getLong(0) + 1) / 10.0 + 1e-9, r)
    }
  }

  test("calibrationSummary: ECE/MCE integrate the report's bucket " +
    "gaps exactly; Brier bounded; separable corpus scores near 0") {
    val docs = ((0 until 20).map(i => (i.toLong, "good stuff here")) ++
      (20 until 50).map(i => (i.toLong, "bad junk there")))
      .toDF("doc_id", "text")
    val y = col("text").contains("good")
    val w = Classifier.trainNaiveBayes(docs, "text", y)
    val s = Classifier.calibrationSummary(docs, "text", "doc_id", y, w)
      .head()
    assert(s.getAs[Long]("n") == 50L)
    // recompute ECE/MCE from the report's exact integers — the
    // summary must integrate the same bucket table
    val rep = Classifier.calibrationReport(docs, "text", "doc_id", y, w)
      .collect()
    val gaps = rep.map(r => (math.abs(r.getLong(2) * 1000000L -
      r.getLong(3)), r.getLong(1)))
    val ece = math.round(gaps.map(_._1).sum.toDouble / 50.0)
    val mce = gaps.map(g => math.round(g._1.toDouble / g._2)).max
    assert(s.getAs[Long]("ece_micro") == ece, s)
    assert(s.getAs[Long]("mce_micro") == mce, s)
    val brier = s.getAs[Long]("brier_micro")
    assert(brier >= 0L && brier <= 1000000L, s)
    // a perfectly separable corpus should be nearly calibrated
    assert(s.getAs[Long]("ece_micro") < 300000L, s)
  }

  test("logisticFit: learned weights separate a separable corpus, " +
    "sharpen with iterations, and are partitioning-invariant") {
    val docs = ((0 until 25).map(i => (i.toLong, "good stuff here")) ++
      (25 until 50).map(i => (i.toLong, "bad junk there")))
      .toDF("doc_id", "text")
    val y = col("text").contains("good")
    def margin(w: Map[Long, Long], text: String): Long = {
      val toks = text.split(" ")
      val feats = toks.groupBy(t => {
        val h = java.lang.Long.parseLong(org.apache.commons.codec
          .digest.DigestUtils.md5Hex("hf:" + t).take(8), 16)
        (h % 8, if ((h >> 16) % 2 == 0) 1L else -1L)
      }).map { case ((idx, sgn), ts) => idx -> sgn * ts.length }
      feats.map { case (i, x) => x * w.getOrElse(i, 0L) }.sum + w(-1L)
    }
    def fit(iters: Int, parts: Int = 4) = Classifier.logisticFit(
      docs.repartition(parts), "text", "doc_id", y, dim = 8,
      iters = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w2 = fit(2)
    assert(w2.size == 9 && w2.contains(-1L))
    // the positive doc must out-margin the negative one
    val mPos = margin(w2, "good stuff here")
    val mNeg = margin(w2, "bad junk there")
    assert(mPos > mNeg, s"$mPos !> $mNeg")
    // more iterations push the margins further apart
    val w5 = fit(5)
    assert(margin(w5, "good stuff here") -
      margin(w5, "bad junk there") > mPos - mNeg)
    // physical layout cannot move the fit
    assert(fit(2, parts = 1) == w2 && fit(2, parts = 16) == w2)
    // serving: scores match the hand margin through the same sigmoid,
    // and the separable corpus splits around 0.5
    val wDf = Classifier.logisticFit(docs, "text", "doc_id", y,
      dim = 8, iters = 2)
    val scores = Classifier.logisticScore(docs, "text", "doc_id", wDf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expPos = math.round(1e6 /
      (1.0 + math.exp(-margin(w2, "good stuff here") / 1e6)))
    assert(scores(0L) == expPos, s"${scores(0L)} != $expPos")
    assert(scores(0L) > 500000L && scores(49L) < 500000L, scores)
  }

  test("isotonicFit: PAV pools the violator run to the exact merged " +
    "rate, leaves monotone input alone; applyCalibration forward-" +
    "fills and preserves row multiplicity") {
    // bins=4; rates per bin: .1, .6, .4, .9 → PAV pools bins 1+2 to .5
    def rows(bin: Long, pos: Int, neg: Int) = {
      val score = bin * 250000L + 100000L // inside the bin
      List.fill(pos)((score, true)) ++ List.fill(neg)((score, false))
    }
    val df = (rows(0, 1, 9) ++ rows(1, 6, 4) ++ rows(2, 4, 6) ++
      rows(3, 9, 1)).toDF("s", "y")
    val fit = Classifier.isotonicFit(df, col("s"), col("y"), bins = 4)
    val byBin = fit.collect().map(r => r.getLong(0) -> r.getLong(3))
      .toMap
    assert(byBin == Map(0L -> 100000L, 1L -> 500000L, 2L -> 500000L,
      3L -> 900000L), byBin)
    // already-monotone input: rates unchanged
    val mono = (rows(0, 1, 9) ++ rows(2, 5, 5) ++ rows(3, 9, 1))
      .toDF("s", "y")
    val mFit = Classifier.isotonicFit(mono, col("s"), col("y"), bins = 4)
    assert(mFit.collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      == Map(0L -> 100000L, 2L -> 500000L, 3L -> 900000L))
    // serving: bin-1 scores (unoccupied in mono's fit) fall back to
    // bin 0's rate; duplicates stay duplicated
    val serve = Seq(300000L, 300000L, 600000L, 10000L)
      .toDF("s")
    val out = Classifier.applyCalibration(serve, col("s"), mFit,
      bins = 4).collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(out.count(_ == (300000L, 100000L)) == 2, out.toSeq)
    assert(out.contains((600000L, 500000L)) &&
      out.contains((10000L, 100000L)), out.toSeq)
  }

  test("prCurve: no actual positives makes recall NULL") {
    val scored = Seq((1L, 0.9, false), (2L, 0.1, false))
      .toDF("doc_id", "score", "label")
    val r = Classifier.prCurve(scored, "score", "label", Seq(0.5))
      .first()
    assert(r.getDouble(4) == 0.0) // precision: 0 tp / 1 predicted
    assert(r.isNullAt(5))
    assert(r.isNullAt(6))
  }

  test("ipwEffect: uninformative text leaves e = 1/2 exactly (perfect " +
    "effect reads ATE = 1, balanced null reads 0); a text confounder " +
    "shrinks the naive bias toward the true zero") {
    // constant text + balanced arms: the GD gradient is 0 at w = 0,
    // so e = 0.5 EXACTLY and the IPW arithmetic is exact
    val flat = (0L until 40L).map(i =>
      (i, "alpha beta gamma", i % 2 == 0, i % 2 == 0))
      .toDF("doc_id", "text", "t", "y")
    val r1 = Classifier.ipwEffect(flat, "text", "doc_id", col("t"),
      col("y"), dim = 8, iters = 2).head()
    assert(r1.getAs[Long]("n") == 40L &&
      r1.getAs[Long]("n_treated") == 20L)
    assert(r1.getAs[Long]("mu1_micro") == 1000000L &&
      r1.getAs[Long]("mu0_micro") == 0L &&
      r1.getAs[Long]("ate_micro") == 1000000L, r1)
    // balanced null outcome: exact 0
    val nullEff = (0L until 40L).map(i =>
      (i, "alpha beta gamma", i % 2 == 0, i % 4 <= 1))
      .toDF("doc_id", "text", "t", "y")
    val r0 = Classifier.ipwEffect(nullEff, "text", "doc_id", col("t"),
      col("y"), dim = 8, iters = 2).head()
    assert(r0.getAs[Long]("ate_micro") == 0L, r0)
    // confounding: Z (visible in text) drives BOTH treatment and
    // outcome; the true effect is 0 but the naive diff reads +1/3.
    // The propensity model sees Z through the token and the IPW
    // estimate collapses most of the bias.
    val conf = (0L until 60L).map { i =>
      val z = i < 30L
      val t = if (z) i % 3 != 2 else i % 3 == 0
      (i, if (z) "zmark common filler" else "plain common filler",
        t, z)
    }.toDF("doc_id", "text", "t", "y")
    val naiveMicro = 333333L // (20/30 - 10/30) in micro
    val rc = Classifier.ipwEffect(conf, "text", "doc_id", col("t"),
      col("y"), dim = 8, iters = 8).head()
    val ate = rc.getAs[Long]("ate_micro")
    assert(math.abs(ate) < naiveMicro / 2,
      s"IPW left most of the confounding bias: $ate vs $naiveMicro")
  }

  test("aipwEffect: double robustness — a deliberately crippled " +
    "propensity flips IPW to the confounded estimate while AIPW's " +
    "outcome models hold the estimate near the true zero") {
    // outcome is a pure function of a text token ("pos" => y = 1),
    // independent of treatment given text => TRUE ATE = 0; treatment
    // is confounded with the token, so the naive diff reads +0.5
    val df = (0L until 40L).map { i =>
      val (pos, t) =
        if (i < 15L) (true, true)        // data pos
        else if (i < 20L) (false, true)  // data neg
        else if (i < 25L) (true, false)  // other pos
        else (false, false)              // other neg
      (i,
        (if (t) "data " else "other ") +
          (if (pos) "pos mark" else "neg mark"),
        t, pos)
    }.toDF("doc_id", "text", "t", "y")
    // CRIPPLED propensity: clip forces e(x) to ~1/2 everywhere — the
    // estimator behaves as if the propensity model were uninformative
    // (maximal misspecification), whatever the fit learned
    val ipw = Classifier.ipwEffect(df, "text", "doc_id", col("t"),
      col("y"), dim = 8, iters = 2, clipMicro = 499999L)
      .head().getAs[Long]("ate_micro")
    // same crippled propensity, but outcome models with real capacity
    val aipw = Classifier.aipwEffect(df, "text", "doc_id", col("t"),
      col("y"), propDim = 8, propIters = 2, outDim = 8, outIters = 8,
      clipMicro = 499999L).head().getAs[Long]("ate_micro")
    // IPW inherits most of the 0.5 confounded diff; AIPW's outcome
    // models (trained per arm on the predictive token) absorb it
    assert(math.abs(ipw) > 300000L,
      s"crippled-propensity IPW should stay confounded: $ipw")
    assert(math.abs(aipw) < math.abs(ipw) / 3,
      s"AIPW should beat IPW under a wrong propensity: " +
        s"aipw=$aipw ipw=$ipw")
    // and with an UNCONFOUNDED balanced design both agree at 0
    val flat = (0L until 40L).map(i =>
      (i, "alpha beta gamma", i % 2 == 0, i % 4 <= 1))
      .toDF("doc_id", "text", "t", "y")
    val a0 = Classifier.aipwEffect(flat, "text", "doc_id", col("t"),
      col("y"), propDim = 8, propIters = 2, outDim = 8, outIters = 2)
      .head()
    assert(a0.getAs[Long]("ate_micro") == 0L, a0)
  }
}
