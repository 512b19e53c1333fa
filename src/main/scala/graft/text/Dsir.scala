package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection — importance resampling of a raw corpus
  * toward a target distribution using hashed bag-of-token likelihood
  * ratios (Xie et al. 2023, "Data Selection for Language Models via
  * Importance Resampling"). The classic recipe: hash every token into
  * `B` buckets, fit add-one-smoothed bucket distributions p (target)
  * and q (raw), and weight each raw document by
  * `Σ_b c_b · (ln p_b − ln q_b)` — documents whose token mix looks
  * more like the target than like the average raw doc score positive.
  *
  * Cross-engine exactness: the per-BUCKET log-ratio is snapped to
  * integer micro-units once (`round(ln(ratio)·10⁶)` — ln only has to
  * be accurate to half a micro-unit for both engines to agree, far
  * coarser than libm ulp drift), and every per-DOCUMENT aggregate is
  * then pure BIGINT arithmetic, so a SQL oracle replays selection
  * bit-exactly. Same design move as [[TextOps.tfidf]]'s log-free
  * ranking: keep the non-IEEE-pinned transcendental off the per-row
  * hot path — here it runs B times total, not once per token.
  *
  * Scale shape (100 TB raw corpus): one explode over raw text feeding
  * a (doc, bucket) hash aggregation with map-side partials; the bucket
  * statistics are `B`-row frames (the target corpus is the SMALL side
  * by construction — an eval set or a curated seed); the log-ratio
  * table broadcasts; the final weight is one more hash aggregation on
  * doc id. No window, no global sort, no all-pairs — selection is by
  * threshold (`weight_micro > 0`), not a global top-k; layer
  * [[graft.operators.Relational.weightedSample]] on the weights when a
  * fixed-size Gumbel-style resample is wanted.
  */
object Dsir {

  /** Per-document DSIR importance weight of `raw` against `target`,
    * in integer micro-nats: (idCol, weight_micro, selected).
    *
    * @param buckets hashed-feature dimensionality `B`; bucket counts
    *   smooth with +1, so B trades feature resolution against
    *   smoothing strength (64-65536 are typical hashed-DSIR sizes)
    */
  def importanceWeights(raw: DataFrame, target: DataFrame,
      textCol: String, idCol: String, buckets: Int = 64,
      tokenizer: Column => Column = TextOps.tokensSimple): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val b = lit(buckets.toLong)

    def bucketed(df: DataFrame, withId: Boolean): DataFrame = {
      val tok = explode(tokenizer(col(textCol))).as("_tok")
      val bkt = pmod(TextOps.hash32(col("_tok")), b).as("_bkt")
      if (withId) df.select(col(idCol), tok).select(col(idCol), bkt)
      else df.select(tok).select(bkt)
    }

    // (doc, bucket) occurrence counts — the only corpus-sized shuffle;
    // the raw bucket marginals fold from it rather than re-exploding.
    // The B-row marginal tables cut lineage (localCheckpoint): without
    // the cut, the totals fold and the ratio table would each REBUILD
    // the corpus explode+aggregate — plan audit showed 4 full corpus
    // passes where the algorithm needs 2 (one to fit, one to score)
    val docCounts = bucketed(raw, withId = true)
      .groupBy(col(idCol), col("_bkt")).agg(count(lit(1)).as("_c"))
    val rawBucket = docCounts.groupBy(col("_bkt"))
      .agg(sum(col("_c")).as("_rcnt")).localCheckpoint()
    val tgtBucket = bucketed(target, withId = false)
      .groupBy(col("_bkt")).agg(count(lit(1)).as("_tcnt"))
      .localCheckpoint()

    val totals = rawBucket.agg(sum(col("_rcnt")).as("_rtot"))
      .crossJoin(tgtBucket.agg(sum(col("_tcnt")).as("_ttot")))

    // B rows: smoothed ratio p_b/q_b as one integer-product division,
    // ln snapped to micro-nats — identical BIGINTs in any engine
    val num = ((col("_tcnt") + 1L) * (col("_rtot") + b)).cast("double")
    val den = ((col("_rcnt") + 1L) * (col("_ttot") + b)).cast("double")
    val lr = rawBucket
      .join(tgtBucket, Seq("_bkt"), "left")
      .na.fill(0L, Seq("_tcnt"))
      .crossJoin(broadcast(totals))
      .select(col("_bkt"),
        round((log(num) - log(den)) * 1000000.0)
          .cast("long").as("_lr_micro"))

    docCounts.join(broadcast(lr), Seq("_bkt"))
      .groupBy(col(idCol))
      .agg(sum(col("_c") * col("_lr_micro")).as("weight_micro"))
      .select(col(idCol), col("weight_micro"),
        (col("weight_micro") > 0L).as("selected"))
  }

  /** Per-group corpus-drift report: KL(group ‖ corpus) over hashed
    * token buckets, add-one smoothed — "which source's token mix has
    * wandered furthest from the blend" (the distribution-shift number
    * a mixture owner watches per crawl snapshot; same hashed-feature
    * family as [[importanceWeights]], aimed at groups instead of
    * documents).
    *
    * Cross-engine exactness, same micro-nat design as DSIR: each
    * (group, bucket) log-ratio is an integer-product division snapped
    * to micro-nats once, the KL numerator `Σ_b (c_gb+1)·lr_micro` is
    * then pure BIGINT, and the final `kl` divides through one fixed
    * IEEE chain. Smoothed p and q are true distributions, so kl ≥ 0
    * up to micro-rounding.
    *
    * Scale shape (100 TB corpus, G groups, B buckets): ONE corpus
    * explode into a (group, bucket) hash aggregation with map-side
    * partials — the only data-sized stage; the G×B count frame
    * localCheckpoints (plan-audit lesson from [[importanceWeights]]:
    * without the cut every downstream fold re-runs the explode) and
    * everything after operates on G×B ≤ thousands of rows with
    * broadcast joins. No window, no all-pairs, no skew exposure — a
    * hot group only concentrates its PARTIAL aggregation, which
    * map-side combine absorbs.
    */
  def groupDivergence(df: DataFrame, textCol: String, groupCol: String,
      buckets: Int = 64,
      tokenizer: Column => Column = TextOps.tokensSimple): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val b = lit(buckets.toLong)
    val gc = df
      .select(col(groupCol).as("_g"),
        explode(tokenizer(col(textCol))).as("_tok"))
      .select(col("_g"), pmod(TextOps.hash32(col("_tok")), b).as("_bkt"))
      .groupBy(col("_g"), col("_bkt")).agg(count(lit(1)).as("_c"))
      .localCheckpoint()
    val gn = gc.groupBy(col("_g")).agg(sum(col("_c")).as("_ng"))
    val cb = gc.groupBy(col("_bkt")).agg(sum(col("_c")).as("_cb"))
    val tot = cb.agg(sum(col("_cb")).as("_n"))

    // dense G×B grid: smoothing gives every bucket weight (c+1) > 0,
    // so absent buckets still contribute to the sum
    val grid = gn.crossJoin(broadcast(
      df.sparkSession.range(buckets).select(col("id").as("_bkt"))))
    val full = grid
      .join(gc, Seq("_g", "_bkt"), "left").na.fill(0L, Seq("_c"))
      .join(broadcast(cb), Seq("_bkt"), "left").na.fill(0L, Seq("_cb"))
      .crossJoin(broadcast(tot))
    val num = ((col("_c") + 1L) * (col("_n") + b)).cast("double")
    val den = ((col("_cb") + 1L) * (col("_ng") + b)).cast("double")
    full
      .select(col("_g"), col("_ng"),
        ((col("_c") + 1L) *
          round((log(num) - log(den)) * 1000000.0).cast("long")).as("_t"))
      .groupBy(col("_g"), col("_ng"))
      .agg(sum(col("_t")).as("kl_num_micro"))
      .select(col("_g").as(groupCol), col("_ng").as("n_tokens"),
        col("kl_num_micro"),
        round(col("kl_num_micro").cast("double") /
          (col("_ng") + b).cast("double") / 1000000.0, 6).as("kl"))
  }
}
