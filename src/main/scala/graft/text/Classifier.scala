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
}
