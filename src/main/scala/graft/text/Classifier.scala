package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Loadable linear bag-of-words classifier — the fasttext-shaped
  * quality gate (Joulin et al. 2016, "Bag of Tricks for Efficient Text
  * Classification") that CCNet/RefinedWeb-style pipelines run over
  * every crawled document: `logit = bias + mean(weight(token))`, keep
  * iff logit > 0. The model here is the linear core (token weights +
  * bias); training happens offline — this operator is the 100 TB
  * APPLY step.
  *
  * Cross-engine exactness: weights load as integer MICRO-units
  * (round(w·10⁶) at parse time), the per-doc sum is pure BIGINT, the
  * keep decision is the exact integer sign test
  * `bias_micro·n + w_sum_micro > 0` (≡ `bias + mean > 0` for n > 0 —
  * no float boundary can flip against an oracle replay), and the
  * reported logit divides through one fixed IEEE chain. Same micro
  * design as [[Dsir]] / [[NgramLm]].
  */
object Classifier {

  /** Token weights + bias in micro-units (round(value·10⁶)). */
  final case class LinearModel(biasMicro: Long,
      weightsMicro: Map[String, Long]) {
    require(!weightsMicro.contains(BiasToken),
      s"$BiasToken belongs in biasMicro, not the weight table")
  }

  /** The reserved token naming the bias line in a model file. */
  val BiasToken = "__bias__"

  /** Parse "token weight" lines (whitespace-separated, one pair per
    * line; blank lines and `#` comments skipped; a `__bias__` line sets
    * the bias). Duplicate tokens keep the LAST line — the convention
    * that lets a fine-tuned tail overlay a base model by concatenation.
    */
  def parse(lines: IterableOnce[String]): LinearModel = {
    var bias = 0L
    val w = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    lines.iterator.foreach { raw =>
      val line = raw.trim
      if (line.nonEmpty && !line.startsWith("#")) {
        val parts = line.split("\\s+")
        require(parts.length == 2, s"expected 'token weight', got: $line")
        val micro = math.round(parts(1).toDouble * 1e6)
        if (parts(0) == BiasToken) bias = micro else w(parts(0)) = micro
      }
    }
    LinearModel(bias, w.toMap)
  }

  /** Load a model file from the driver-visible filesystem. */
  def load(path: String): LinearModel = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try parse(src.getLines()) finally src.close()
  }

  private def withScore(perDoc: DataFrame, model: LinearModel): DataFrame = {
    val n = col("n_tokens").cast("double")
    val mean = when(col("n_tokens") === 0L, lit(0.0))
      .otherwise(col("w_sum_micro").cast("double") / n)
    perDoc.select(col("*"),
      round((lit(model.biasMicro.toDouble) + mean) / 1000000.0, 6)
        .as("logit"),
      (when(col("n_tokens") === 0L, lit(model.biasMicro) > 0L)
        .otherwise(lit(model.biasMicro) * col("n_tokens")
          + col("w_sum_micro") > 0L)).as("keep"))
  }

  /** Score every doc: (idCol, n_tokens, w_sum_micro, logit, keep).
    *
    * The BROADCAST-JOIN flavor — the shape for real vocabularies
    * (a fasttext vocab runs to millions of tokens: far too big to bake
    * into the plan as a literal, cheap to broadcast as a table): one
    * corpus explode, a broadcast left join against the weight table
    * (OOV → 0), one per-doc hash aggregation with map-side partials,
    * then a left join back so tokenless docs score on bias alone.
    */
  def score(df: DataFrame, textCol: String, idCol: String,
      model: LinearModel,
      tokenizer: Column => Column = TextOps.tokensSimple): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val weights = model.weightsMicro.toSeq.toDF("_tok", "_wm")
    val perDoc = df
      .select(col(idCol), explode(tokenizer(col(textCol))).as("_tok"))
      .join(broadcast(weights), Seq("_tok"), "left")
      .na.fill(0L, Seq("_wm"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("_wm")).as("w_sum_micro"))
    val scored = df.select(col(idCol)).distinct()
      .join(perDoc, Seq(idCol), "left")
      .na.fill(0L, Seq("n_tokens", "w_sum_micro"))
    withScore(scored, model)
  }

  /** TRAIN the linear model — the missing half of the classifier
    * family (load/score existed; this closes the loop): multinomial
    * Naive Bayes with add-one smoothing, whose per-token LOG-ODDS
    *
    *   w(t) = ln((c⁺(t)+1)/(T⁺+V)) − ln((c⁻(t)+1)/(T⁻+V))
    *
    * are exactly a linear bag-of-words model in the served format
    * (token weights + a class-prior bias `ln(N⁺/N⁻)`) — the standard
    * seed classifier a CCNet-style pipeline trains from weak labels
    * (a language column, a known-good reference corpus) before any
    * gradient method. `c±` are token occurrences per class over the
    * `minCount`-kept vocabulary, `T±` its class token totals, `V` its
    * size.
    *
    * Cross-engine exactness: counts are BIGINT; each weight is ONE
    * fixed IEEE chain (two single-division `ln`s, a subtraction)
    * snapped to integer micro-nats — the [[Dsir]]/[[NgramLm]]
    * discipline, so training itself hash-gates against a SQL replay.
    *
    * Scale shape: one corpus explode → one (token) hash aggregation
    * with map-side partials; totals are a 1-row broadcast fold; the
    * weight table stays DISTRIBUTED (fasttext vocabularies run to
    * millions of rows — serve via [[scoreWithWeights]], or collect
    * through [[weightsToModel]] only when the vocab is known small).
    *
    * Output: `(token, weight_micro)` rows plus one `__bias__` row.
    * Rows with a NULL label are excluded from training; both classes
    * must be non-empty (the bias is their log odds).
    */
  def trainNaiveBayes(df: DataFrame, textCol: String, label: Column,
      tokenizer: Column => Column = TextOps.tokensSimple,
      minCount: Int = 1): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val lab = df.select(label.cast("boolean").as("_y"),
        col(textCol).as("_text"))
      .filter(col("_y").isNotNull)
    val counts = lab
      .select(col("_y"), explode(tokenizer(col("_text"))).as("token"))
      .groupBy(col("token"))
      .agg(sum(when(col("_y"), 1L).otherwise(0L)).as("_cp"),
        sum(when(!col("_y"), 1L).otherwise(0L)).as("_cn"))
      .filter(col("_cp") + col("_cn") >= minCount)
    val totals = counts.agg(sum(col("_cp")).as("_tp"),
      sum(col("_cn")).as("_tn"), count(lit(1)).as("_v"))
    val docTotals = lab.agg(
      sum(when(col("_y"), 1L).otherwise(0L)).as("_np"),
      sum(when(!col("_y"), 1L).otherwise(0L)).as("_nn"))
    val weights = counts.crossJoin(broadcast(totals))
      .select(col("token"),
        round((log((col("_cp") + 1L).cast("double") /
            (col("_tp") + col("_v")).cast("double")) -
          log((col("_cn") + 1L).cast("double") /
            (col("_tn") + col("_v")).cast("double"))) * 1000000.0)
          .cast("long").as("weight_micro"))
    val bias = docTotals.select(lit(BiasToken).as("token"),
      round(log(col("_np").cast("double") / col("_nn").cast("double"))
        * 1000000.0).cast("long").as("weight_micro"))
    weights.unionByName(bias)
  }

  /** Serve from a DISTRIBUTED `(token, weight_micro)` table (the
    * [[trainNaiveBayes]] output, or a parquet-persisted model too big
    * to hold on the driver): same output and decision rule as
    * [[score]] — the one driver materialization is the 1-row bias.
    */
  def scoreWithWeights(df: DataFrame, textCol: String, idCol: String,
      weights: DataFrame,
      tokenizer: Column => Column = TextOps.tokensSimple): DataFrame = {
    val biasMicro = weights
      .filter(col("token") === BiasToken)
      .select(col("weight_micro")).collect()
      .headOption.map(_.getLong(0)).getOrElse(0L)
    val w = weights.filter(col("token") =!= BiasToken)
      .select(col("token").as("_tok"), col("weight_micro").as("_wm"))
    val perDoc = df
      .select(col(idCol), explode(tokenizer(col(textCol))).as("_tok"))
      .join(broadcast(w), Seq("_tok"), "left")
      .na.fill(0L, Seq("_wm"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("_wm")).as("w_sum_micro"))
    val scored = df.select(col(idCol)).distinct()
      .join(perDoc, Seq(idCol), "left")
      .na.fill(0L, Seq("n_tokens", "w_sum_micro"))
    withScore(scored, LinearModel(biasMicro, Map.empty))
  }

  /** Collect a `(token, weight_micro)` table into a driver-side
    * [[LinearModel]] — for CURATED-SIZED vocabularies only
    * (`maxVocab`-guarded, loud failure like the BPE fast path; the
    * distributed serve path is [[scoreWithWeights]]).
    */
  def weightsToModel(weights: DataFrame,
      maxVocab: Int = 2000000): LinearModel = {
    val n = weights.count()
    require(n <= maxVocab + 1,
      s"weight table has $n rows > maxVocab=$maxVocab — serve it " +
        "distributed via scoreWithWeights instead of collecting")
    var bias = 0L
    val w = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    weights.select(col("token"), col("weight_micro")).collect()
      .foreach { r =>
        if (r.getString(0) == BiasToken) bias = r.getLong(1)
        else w(r.getString(0)) = r.getLong(1)
      }
    LinearModel(bias, w.toMap)
  }

  /** Render a [[LinearModel]] as "token weight" lines — the exact
    * format [[parse]]/[[load]] read, with weights printed at micro
    * precision so save→load round-trips bit-identically.
    */
  def modelLines(model: LinearModel): Seq[String] =
    (s"$BiasToken ${microToText(model.biasMicro)}" +:
      model.weightsMicro.toSeq.sortBy(_._1)
        .map { case (t, m) => s"$t ${microToText(m)}" })

  private def microToText(micro: Long): String = {
    val sign = if (micro < 0) "-" else ""
    val abs = math.abs(micro)
    f"$sign${abs / 1000000L}%d.${abs % 1000000L}%06d"
  }

  /** The SCAN-STAGE flavor: the weight table rides the plan as a map
    * literal and the sum folds inside a higher-order function — zero
    * shuffles beyond none at all (a pure projection), the right shape
    * when the model is small (a curated stopword/marker list) and the
    * corpus is the 100 TB side. Row-identical to [[score]].
    */
  def scoreMapLiteral(df: DataFrame, textCol: String, idCol: String,
      model: LinearModel,
      tokenizer: Column => Column = TextOps.tokensSimple): DataFrame = {
    val wm: Column =
      if (model.weightsMicro.isEmpty) map().cast("map<string,bigint>")
      else typedlit(model.weightsMicro)
    val toks = tokenizer(col(textCol))
    val perDoc = df.select(col(idCol),
      coalesce(size(toks), lit(0)).cast("long").as("n_tokens"),
      coalesce(aggregate(toks, lit(0L),
        (acc, t) => acc + coalesce(element_at(wm, t), lit(0L))), lit(0L))
        .as("w_sum_micro"))
    withScore(perDoc, model)
  }

  /** Threshold calibration: precision / recall / F1 at each candidate
    * cut — the report that turns a quality-classifier score column
    * into an actionable filter threshold (every corpus-cleaning paper
    * publishes exactly this sweep before picking its keep-rate).
    *
    * One pass over the scored frame: each row explodes into the T
    * candidate thresholds (T is tiny — no broadcast join, no
    * per-threshold rescan), counts fold as integers (order-free), and
    * the ratios are single fixed divisions — so the whole sweep
    * hash-gates against SQL (q140). Zero-denominator cells are NULL
    * (no NaN; engines disagree on NaN hashing).
    *
    * `labelCol` must be BOOLEAN (true = positive), `scoreCol` numeric;
    * a row is predicted positive at threshold t when `score >= t`.
    */
  def prCurve(scored: DataFrame, scoreCol: String, labelCol: String,
      thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty, "thresholds must be non-empty")
    val t = col("threshold")
    val pos = col(labelCol)
    val pred = col(scoreCol) >= t
    val counts = scored
      .select(col(scoreCol), pos,
        explode(array(thresholds.map(lit): _*)).as("threshold"))
      .groupBy(t)
      .agg(
        sum(when(pred && pos, 1L).otherwise(0L)).as("tp"),
        sum(when(pred && !pos, 1L).otherwise(0L)).as("fp"),
        sum(when(!pred && pos, 1L).otherwise(0L)).as("fn"))
    val p = col("tp").cast("double") /
      (col("tp") + col("fp")).cast("double")
    val r = col("tp").cast("double") /
      (col("tp") + col("fn")).cast("double")
    counts
      .withColumn("p_raw", when(col("tp") + col("fp") === 0L, lit(null)
        .cast("double")).otherwise(p))
      .withColumn("r_raw", when(col("tp") + col("fn") === 0L, lit(null)
        .cast("double")).otherwise(r))
      .select(t, col("tp"), col("fp"), col("fn"),
        round(col("p_raw"), 6).as("precision"),
        round(col("r_raw"), 6).as("recall"),
        round(when(col("p_raw") + col("r_raw") === 0.0,
            lit(null).cast("double"))
          .otherwise(lit(2.0) * col("p_raw") * col("r_raw") /
            (col("p_raw") + col("r_raw"))), 6).as("f1"))
  }

  /** Reliability diagram for a served classifier — the calibration
    * check every quality-filter threshold decision needs: documents
    * bucketed by predicted confidence `σ(logit)`, each bucket
    * reporting observed accuracy vs mean claimed confidence. A
    * well-calibrated bucket has `acc ≈ mean_conf`; the gap profile is
    * the Expected-Calibration-Error integrand, and a filter cutoff
    * read off an UNcalibrated score keeps the wrong documents.
    *
    * Gateable end-to-end: logits are the micro-nat serving chain
    * ([[scoreWithWeights]]), the sigmoid is one fixed IEEE chain per
    * row, per-row confidences snap to exact micro-units before the
    * bucket sums (order-free BIGINTs), and accuracy/mean-confidence
    * are one division each (q179).
    *
    * Scale shape: scoring is the broadcast-weight join; everything
    * after is a 10-row bucket aggregation. Returns
    * `(bucket, n, n_pos, conf_micro, acc, mean_conf)`.
    */
  def calibrationReport(df: DataFrame, textCol: String, idCol: String,
      label: Column, weights: DataFrame,
      tokenizer: Column => Column = TextOps.tokensSimple): DataFrame = {
    val scored = scoreWithWeights(df, textCol, idCol, weights, tokenizer)
    val lab = df.select(col(idCol),
      when(label, 1L).otherwise(0L).as("_y"))
    scored.join(lab, Seq(idCol))
      .select(col("_y"),
        (lit(1.0) / (lit(1.0) + exp(-col("logit")))).as("_conf"))
      .select(col("_y"),
        least(floor(col("_conf") * lit(10.0)), lit(9.0)).cast("long")
          .as("bucket"),
        round(col("_conf") * lit(1000000.0)).cast("long").as("_cm"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("_y")).as("n_pos"),
        sum(col("_cm")).as("conf_micro"))
      .select(col("bucket"), col("n"), col("n_pos"), col("conf_micro"),
        round(col("n_pos").cast("double") / col("n").cast("double"), 6)
          .as("acc"),
        round(col("conf_micro").cast("double") /
          col("n").cast("double") / lit(1000000.0), 6).as("mean_conf"))
  }

  /** One-row calibration summary — the numbers the
    * [[calibrationReport]] diagram integrates to:
    *
    *  - ECE (expected calibration error; Naeini et al. 2015):
    *    `Σ_b (n_b/N)·|acc_b − conf_b|` — because the per-bucket gap
    *    is weighted by n_b/N, the whole sum collapses to
    *    `Σ_b |n_pos_b·1e6 − Σconf_micro_b| / (N·1e6)` over EXACT
    *    integers, one division at the end.
    *  - MCE (max calibration error): the worst bucket's gap, each
    *    bucket's gap ONE double division micro-snapped before the max.
    *  - Brier score (Brier 1950): mean squared `(conf − y)²` — exact
    *    decimal sum of squared micro differences, one division.
    *
    * Same scoring chain as the report (broadcast-weight join, sigmoid
    * per row, micro-snapped confidences); the scored rows persist once
    * and feed both the 10-row bucket fold and the Brier moment.
    * Output (one row): `(n, ece_micro, mce_micro, brier_micro)`.
    */
  def calibrationSummary(df: DataFrame, textCol: String, idCol: String,
      label: Column, weights: DataFrame,
      tokenizer: Column => Column = TextOps.tokensSimple): DataFrame = {
    val dec = "decimal(38,0)"
    val scored = scoreWithWeights(df, textCol, idCol, weights, tokenizer)
    val lab = df.select(col(idCol),
      when(label, 1L).otherwise(0L).as("_y"))
    val rows = scored.join(lab, Seq(idCol))
      .select(col("_y"),
        (lit(1.0) / (lit(1.0) + exp(-col("logit")))).as("_conf"))
      .select(col("_y"),
        least(floor(col("_conf") * lit(10.0)), lit(9.0)).cast("long")
          .as("_b"),
        round(col("_conf") * lit(1000000.0)).cast("long").as("_cm"))
      .persist() // bucket fold + Brier moment
    val sqDiff = (col("_cm") - col("_y") * 1000000L).cast(dec) *
      (col("_cm") - col("_y") * 1000000L).cast(dec)
    val brier = rows.agg(count(lit(1)).as("n"),
      sum(sqDiff).as("_bsum"))
    val buckets = rows.groupBy(col("_b"))
      .agg(count(lit(1)).as("_n"), sum(col("_y")).as("_np"),
        sum(col("_cm")).as("_cs"))
    val gapNum = abs(col("_np") * 1000000L - col("_cs"))
    val ece = buckets.agg(sum(gapNum).as("_gapsum"),
      max(round(gapNum.cast("double") / col("_n").cast("double"))
        .cast("long")).as("mce_micro"))
    brier.crossJoin(broadcast(ece)).select(col("n"),
      round(col("_gapsum").cast("double") / col("n").cast("double"))
        .cast("long").as("ece_micro"),
      col("mce_micro"),
      round(col("_bsum").cast("double") / col("n").cast("double") /
        lit(1000000.0)).cast("long").as("brier_micro"))
  }

  /** Logistic-regression quality filter, trained DISTRIBUTED with
    * fixed-iteration full-batch gradient descent over hashing-trick
    * features (Weinberger et al. 2009 features + the classic GD — the
    * trainable counterpart of [[trainNaiveBayes]], for labels NB's
    * conditional-independence assumption fits badly).
    *
    * Exactness + scale (the q126/q266 in-plan-iteration discipline):
    * the SPARSE feature table `(doc, idx, x)` is built once (signed
    * md5 hash counts — the q263 chain) and persisted; each iteration
    * is ONE corpus pass — margins via a broadcast join against the
    * (dim+1)-row weight table (exact integer `Σ x·w_micro`), the
    * sigmoid ONE fixed IEEE chain per doc, residuals micro-snapped
    * BEFORE the exact per-dim gradient sums, and the weight update
    * `Δw_micro = round(η · Σ(x·r_micro) / N)` one double chain per
    * dim. Weights localCheckpoint per iteration (bounded model
    * metadata), so `iters` never re-derives iteration 0 — the whole
    * fit replays bit-identically in a SQL oracle that unrolls the
    * iterations as CTEs. Returns `(idx, w_micro)` with the intercept
    * at idx = −1.
    */
  def logisticFit(df: DataFrame, textCol: String, idCol: String,
      label: Column, dim: Int = 16, iters: Int = 3, lr: Double = 1.0,
      tokenizer: Column => Column = TextOps.tokensSimple): DataFrame = {
    require(dim >= 1 && iters >= 1, s"bad dim=$dim iters=$iters")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(idCol).as("_id"),
      when(label, 1L).otherwise(0L).as("_y"),
      tokenizer(col(textCol)).as("_toks"))
    val docsY = base.select(col("_id"), col("_y")).persist()
    val h = TextOps.hash32(concat(lit("hf:"), col("_tok")))
    val feats = base.select(col("_id"),
      explode(col("_toks")).as("_tok"))
      .select(col("_id"), pmod(h, lit(dim.toLong)).as("_idx"),
        when(pmod(shiftrightunsigned(h, 16), lit(2L)) === 0L, lit(1L))
          .otherwise(lit(-1L)).as("_sgn"))
      .groupBy(col("_id"), col("_idx"))
      .agg(sum(col("_sgn")).as("_x"))
      .filter(col("_x") =!= 0L)
      .persist() // one corpus pass per iteration probes it
    val n = docsY.count()
    var w = ((-1L until dim.toLong).map(i => (i, 0L)))
      .toDF("idx", "w_micro").localCheckpoint()
    for (_ <- 1 to iters) {
      val dot = feats
        .join(broadcast(w.filter(col("idx") >= 0L)
          .select(col("idx").as("_idx"), col("w_micro"))), Seq("_idx"))
        .groupBy(col("_id"))
        .agg(sum(col("_x") * col("w_micro")).as("_dot"))
      val bias = w.filter(col("idx") === -1L)
        .select(col("w_micro").as("_b"))
      val resid = docsY
        .join(dot, Seq("_id"), "left")
        .crossJoin(broadcast(bias))
        .select(col("_id"),
          round((col("_y").cast("double") -
            lit(1.0) / (lit(1.0) + exp(
              -(coalesce(col("_dot"), lit(0L)) + col("_b"))
                .cast("double") / lit(1000000.0)))) *
            lit(1000000.0)).cast("long").as("_r"))
        .persist() // dim gradients + the bias gradient
      val gDims = feats.join(resid, Seq("_id"))
        .groupBy(col("_idx").as("idx"))
        .agg(sum(col("_x") * col("_r")).as("_g"))
      val gBias = resid.agg(sum(col("_r")).as("_g"))
        .select(lit(-1L).as("idx"), col("_g"))
      val next = w.join(gBias.unionByName(gDims), Seq("idx"), "left")
        .select(col("idx"),
          (col("w_micro") + coalesce(
            round(lit(lr) * col("_g").cast("double") /
              lit(n.toDouble)).cast("long"), lit(0L))).as("w_micro"))
        .localCheckpoint()
      resid.unpersist()
      w = next
    }
    docsY.unpersist()
    feats.unpersist()
    w
  }

  /** Serve a [[logisticFit]] model: per-document
    * `score = σ(Σ x·w_micro + b_micro)` — the margin an exact integer
    * dot product against the broadcast weight table (dim inferred
    * from the weights), the sigmoid ONE fixed IEEE chain
    * micro-snapped, so scored output hash-gates with the training
    * oracle's scoring CTE. Returns `(idCol, score_micro)`.
    */
  def logisticScore(df: DataFrame, textCol: String, idCol: String,
      weights: DataFrame,
      tokenizer: Column => Column = TextOps.tokensSimple): DataFrame = {
    val dims = weights.filter(col("idx") >= 0L)
    val dim = dims.agg(max(col("idx"))).head().getLong(0) + 1L
    val h = TextOps.hash32(concat(lit("hf:"), col("_tok")))
    val feats = df.select(col(idCol), explode(tokenizer(col(textCol)))
        .as("_tok"))
      .select(col(idCol), pmod(h, lit(dim)).as("_idx"),
        when(pmod(shiftrightunsigned(h, 16), lit(2L)) === 0L, lit(1L))
          .otherwise(lit(-1L)).as("_sgn"))
      .groupBy(col(idCol), col("_idx"))
      .agg(sum(col("_sgn")).as("_x"))
      .filter(col("_x") =!= 0L)
    val dot = feats
      .join(broadcast(dims.select(col("idx").as("_idx"),
        col("w_micro"))), Seq("_idx"))
      .groupBy(col(idCol))
      .agg(sum(col("_x") * col("w_micro")).as("_dot"))
    val bias = weights.filter(col("idx") === -1L)
      .select(col("w_micro").as("_b"))
    df.select(col(idCol)).join(dot, Seq(idCol), "left")
      .crossJoin(broadcast(bias))
      .select(col(idCol),
        round(lit(1000000.0) / (lit(1.0) + exp(
          -(coalesce(col("_dot"), lit(0L)) + col("_b"))
            .cast("double") / lit(1000000.0)))).cast("long")
          .as("score_micro"))
  }

  /** Inverse-propensity-weighted treatment-effect estimate (Horvitz &
    * Thompson 1952 weighting; Rosenbaum & Rubin 1983 propensity
    * scores) — the causal readout for observational corpus questions
    * ("did docs WITH property T end up with outcome Y because of T,
    * or because of what else they contain?"): fit the propensity
    * e(x) = P(T | text) with [[logisticFit]] on the hashed bag of
    * words, clip it away from {0, 1} (the standard overlap guard),
    * and weight each arm by its inverse propensity:
    * `ATE = (1/n)·Σ[T·y/e − (1−T)·y/(1−e)]`.
    *
    * Exactness: the propensity is [[logisticScore]]'s micro-snapped
    * sigmoid; each row's IPW term is ONE exact ratio of integers
    * (`±round(1e12·y / e_micro)` / the 1−e twin) so the arm sums fold
    * exactly; the three closing /n divisions are fixed chains — the
    * whole estimate replays in the training oracle's SQL. Output (one
    * row): `(n, n_treated, mu1_micro, mu0_micro, ate_micro)`.
    *
    * Scale shape: one training pass ([[logisticFit]]'s bounded GD),
    * one scoring pass, one aggregation — the corpus never joins
    * itself. IPW inherits the usual caveats: positivity (hence the
    * clip, default 1%) and no unmeasured confounding beyond the text.
    */
  def ipwEffect(df: DataFrame, textCol: String, idCol: String,
      treatment: Column, outcome: Column, dim: Int = 16,
      iters: Int = 3, clipMicro: Long = 10000L,
      tokenizer: Column => Column = TextOps.tokensSimple): DataFrame = {
    require(clipMicro >= 1L && clipMicro < 500000L,
      s"clipMicro must be in [1, 5e5), got $clipMicro")
    val w = logisticFit(df, textCol, idCol, treatment, dim, iters,
      tokenizer = tokenizer)
    val scored = logisticScore(df, textCol, idCol, w, tokenizer)
    val joined = df.select(col(idCol),
      when(treatment, 1L).otherwise(0L).as("_t"),
      when(outcome, 1L).otherwise(0L).as("_y"))
      .join(scored, Seq(idCol))
    val e = least(greatest(col("score_micro"), lit(clipMicro)),
      lit(1000000L - clipMicro))
    val t1 = when(col("_t") === 1L,
      round(col("_y").cast("double") * lit(1.0e12) / e.cast("double"))
        .cast("long")).otherwise(0L)
    val t0 = when(col("_t") === 0L,
      round(col("_y").cast("double") * lit(1.0e12) /
        (lit(1000000L) - e).cast("double")).cast("long")).otherwise(0L)
    val m = joined.agg(count(lit(1)).as("n"),
      sum(col("_t")).as("n_treated"),
      sum(t1).as("_s1"), sum(t0).as("_s0"))
    val n = col("n").cast("double")
    def snap(c: Column) = round(c).cast("long")
    m.select(col("n"), col("n_treated"),
      snap(col("_s1").cast("double") / n).as("mu1_micro"),
      snap(col("_s0").cast("double") / n).as("mu0_micro"),
      snap((col("_s1") - col("_s0")).cast("double") / n)
        .as("ate_micro"))
  }

  /** Doubly-robust (AIPW / augmented-IPW) treatment effect — the
    * estimator a real analysis reaches for over [[ipwEffect]] alone
    * (Robins, Rotnitzky & Zhao 1994; Bang & Robins 2005): combine
    * the clipped propensity e(x) with OUTCOME models m₁(x), m₀(x)
    * (hashed-feature logistic fit separately on the treated and
    * control arms, scored on everyone), per row
    *
    *   m₁ − m₀ + T·(Y − m₁)/e − (1−T)·(Y − m₀)/(1−e)
    *
    * — consistent if EITHER the propensity model OR the outcome
    * models are right, where IPW needs the propensity to be right
    * (the spec pins exactly that: a deliberately crippled propensity
    * flips IPW to the confounded estimate while AIPW stays near the
    * truth). Propensity and outcome models get separate capacity
    * knobs so misspecification is expressible.
    *
    * Exactness: scores arrive micro-snapped from the shared scoring
    * chain; each residual correction is ONE fixed IEEE division
    * snapped to micro; arm sums and the closing divisions replay in
    * the oracle. Scale shape: three [[logisticFit]] trainings (one
    * corpus pass per iteration each) + three scoring passes + one
    * aggregation — the corpus never joins itself.
    */
  def aipwEffect(df: DataFrame, textCol: String, idCol: String,
      treatment: Column, outcome: Column, propDim: Int = 16,
      propIters: Int = 3, outDim: Int = 16, outIters: Int = 3,
      clipMicro: Long = 10000L,
      tokenizer: Column => Column = TextOps.tokensSimple): DataFrame = {
    require(clipMicro >= 1L && clipMicro < 500000L,
      s"clipMicro must be in [1, 5e5), got $clipMicro")
    // the three trainings read disjoint model state and only share
    // the immutable input: run them concurrently (guide §2.6 —
    // Par.run joins before use, so the assignments are safely
    // published); integer-exact GD makes the weights independent of
    // scheduling, so results are bit-identical to the sequential run
    val fits = new Array[DataFrame](3)
    graft.operators.Par.run(Seq(
      () => fits(0) = logisticFit(df, textCol, idCol, treatment,
        propDim, propIters, tokenizer = tokenizer),
      () => fits(1) = logisticFit(df.filter(treatment), textCol,
        idCol, outcome, outDim, outIters, tokenizer = tokenizer),
      () => fits(2) = logisticFit(df.filter(!treatment), textCol,
        idCol, outcome, outDim, outIters, tokenizer = tokenizer)))
    val (eW, w1, w0) = (fits(0), fits(1), fits(2))
    def scored(w: DataFrame, as: String): DataFrame =
      logisticScore(df, textCol, idCol, w, tokenizer)
        .select(col(idCol), col("score_micro").as(as))
    val joined = df.select(col(idCol),
      when(treatment, 1L).otherwise(0L).as("_t"),
      when(outcome, 1L).otherwise(0L).as("_y"))
      .join(scored(eW, "_e"), Seq(idCol))
      .join(scored(w1, "_m1"), Seq(idCol))
      .join(scored(w0, "_m0"), Seq(idCol))
    val e = least(greatest(col("_e"), lit(clipMicro)),
      lit(1000000L - clipMicro))
    // per-row micro terms: the 10⁶ factors of (y − m) and e cancel,
    // so each correction is one double division snapped once
    val c1 = when(col("_t") === 1L,
      round((col("_y") * 1000000L - col("_m1")).cast("double") /
        e.cast("double") * lit(1000000.0)).cast("long")).otherwise(0L)
    val c0 = when(col("_t") === 0L,
      round((col("_y") * 1000000L - col("_m0")).cast("double") /
        (lit(1000000L) - e).cast("double") * lit(1000000.0))
        .cast("long")).otherwise(0L)
    val m = joined.agg(count(lit(1)).as("n"),
      sum(col("_t")).as("n_treated"),
      sum(col("_m1") + c1).as("_s1"),
      sum(col("_m0") + c0).as("_s0"))
    val n = col("n").cast("double")
    def snap(c: Column) = round(c).cast("long")
    m.select(col("n"), col("n_treated"),
      snap(col("_s1").cast("double") / n).as("mu1_micro"),
      snap(col("_s0").cast("double") / n).as("mu0_micro"),
      snap((col("_s1") - col("_s0")).cast("double") / n)
        .as("ate_micro"))
  }

  /** Isotonic calibration via pool-adjacent-violators (PAV; Ayer et
    * al. 1955, the Zadrozny & Elkan 2002 classifier recipe) — the FIX
    * for what [[calibrationSummary]] measures: learn the monotone map
    * score → P(y=1) and serve through it, so a 0.9 means 0.9.
    *
    * Scale shape: scores bin to ≤ `bins` equal-width micro buckets in
    * ONE aggregation pass; PAV then runs driver-side over that
    * BOUNDED bin table (model metadata, the k-means-centroid
    * discipline — never row data), pooling with EXACT Long fractions
    * (violator compare is cross-multiplied, the pooled rate divides
    * once at the end). Returns the calibration map, one row per
    * occupied bin: `(bin, n, pos, cal_micro)` with `cal_micro`
    * monotone non-decreasing in bin. Serve by broadcast-joining the
    * map on `least(floor(score·bins/1e6), bins−1)`
    * ([[applyCalibration]]).
    */
  def isotonicFit(df: DataFrame, scoreMicro: Column, label: Column,
      bins: Int = 100): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    val spark = df.sparkSession
    import spark.implicits._
    val binned = df.select(
      least(floor(scoreMicro.cast("long") * bins / 1000000L),
        lit(bins - 1L)).cast("long").as("bin"),
      when(label, 1L).otherwise(0L).as("_y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("_y")).as("pos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    // PAV over the bounded bin table: pool while rate decreases;
    // rates compare exactly via cross-multiplication
    final case class Pool(bins: List[(Long, Long, Long)], n: Long,
      pos: Long)
    val pools = binned.foldLeft(List.empty[Pool]) { (acc, b) =>
      var stack = Pool(List(b), b._2, b._3) :: acc
      while (stack.lengthCompare(2) >= 0 && {
        val top :: prev :: _ = stack: @unchecked
        // violation: rate(prev) > rate(top) ⇔ pos_p·n_t > pos_t·n_p
        prev.pos * top.n > top.pos * prev.n
      }) {
        val top :: prev :: rest = stack: @unchecked
        stack = Pool(prev.bins ++ top.bins, prev.n + top.n,
          prev.pos + top.pos) :: rest
      }
      stack
    }.reverse
    pools.flatMap { p =>
      val cal = math.round(p.pos.toDouble / p.n.toDouble * 1000000.0)
      p.bins.map { case (bin, n, pos) => (bin, n, pos, cal) }
    }.toDF("bin", "n", "pos", "cal_micro")
  }

  /** Serve scores through a fitted isotonic map: the bounded map
    * forward-fills to a COMPLETE per-bin step function driver-side
    * (model metadata, ≤ `bins` rows), then ONE broadcast equi-join on
    * the bin — row multiplicity untouched, no window, no non-equi
    * join. Scores below the lowest occupied bin report NULL (the map
    * has no evidence there).
    */
  def applyCalibration(df: DataFrame, scoreMicro: Column,
      calMap: DataFrame, bins: Int = 100): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    val spark = df.sparkSession
    import spark.implicits._
    val m = calMap.select(col("bin"), col("cal_micro")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    var cur: Option[Long] = None
    val filled = (0L until bins.toLong).map { b =>
      cur = m.get(b).orElse(cur)
      (b, cur)
    }
    val step = filled.map { case (b, c) =>
      (b, c.map(Long.box).orNull) }.toDF("_bin", "cal_micro")
    val bin = least(floor(scoreMicro.cast("long") * bins / 1000000L),
      lit(bins - 1L)).cast("long")
    df.withColumn("_bin", bin)
      .join(broadcast(step), Seq("_bin"), "left")
      .drop("_bin")
  }
}
