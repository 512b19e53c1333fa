package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed bigram language-model scoring — the CCNet-style perplexity
  * quality signal (Wenzek et al. 2020): fit a small LM on a trusted
  * target corpus (Wikipedia in the paper), score every raw document by
  * its average negative log-likelihood, and keep the low-perplexity
  * (head/middle) mass. Here the LM is an add-one-smoothed bigram model
  * over `B` hash buckets: `p(w₂|w₁) = (c(b₁,b₂)+1) / (c(b₁)+B)`, with
  * the context marginal `c(b₁)` derived from the bigram table itself.
  *
  * Cross-engine exactness, same move as [[Dsir]]: each distinct
  * (b₁,b₂) pair's log-probability snaps to integer micro-nats once —
  * `ln` runs per DISTINCT PAIR (≤ B², and only pairs the scored corpus
  * actually contains), never per token — and per-document totals are
  * exact BIGINT sums a SQL engine replays bit-identically. The rounded
  * `avg_nll` divides those exact integers in one fixed IEEE chain.
  *
  * Scale shape (fit small, score 100 TB): the target corpus is the
  * small side by construction, so the bigram/context tables are tiny
  * (≤ B² rows); scoring is one explode into a (doc, b₁, b₂) hash
  * aggregation with map-side partials, an equi-join of the ≤ B²
  * distinct-pair table against the LM (AQE broadcasts it while it
  * fits; at B = 64K² it degrades to a shuffled equi-join, never a
  * nested loop), and one final hash aggregation per doc. No window,
  * no global sort.
  */
object NgramLm {

  /** Per-document bigram NLL of `raw` under a hashed bigram LM fit on
    * `target`: (idCol, n_bigrams, nll_micro, avg_nll). Docs with fewer
    * than two tokens score n_bigrams = 0, nll_micro = 0, avg_nll NULL.
    * Lower avg_nll = more target-like (CCNet keeps low perplexity).
    */
  def bigramNll(raw: DataFrame, target: DataFrame,
      textCol: String, idCol: String, buckets: Int = 64,
      tokenizer: Column => Column = TextOps.tokensSimple): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val b = lit(buckets.toLong)

    def bigrams(df: DataFrame, withId: Boolean): DataFrame = {
      val toks = tokenizer(col(textCol))
      val pairs = zip_with(
        slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
        slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
        (a, c) => struct(
          pmod(TextOps.hash32(a), b).as("_b1"),
          pmod(TextOps.hash32(c), b).as("_b2")))
      val base = if (withId) df.select(col(idCol), explode(pairs).as("_p"))
        else df.select(explode(pairs).as("_p"))
      val cols = (if (withId) Seq(col(idCol)) else Nil) ++
        Seq(col("_p._b1").as("_b1"), col("_p._b2").as("_b2"))
      base.select(cols: _*)
    }

    // the LM: bigram counts + the context marginal folded from them.
    // ≤ B² rows — checkpointed so the marginal and the join don't each
    // re-explode the target corpus
    val c12 = bigrams(target, withId = false)
      .groupBy(col("_b1"), col("_b2")).agg(count(lit(1)).as("_c12"))
      .localCheckpoint()
    val c1 = c12.groupBy(col("_b1")).agg(sum(col("_c12")).as("_c1"))

    // (doc, pair) counts — the only corpus-sized shuffle
    val docPairs = bigrams(raw, withId = true)
      .groupBy(col(idCol), col("_b1"), col("_b2"))
      .agg(count(lit(1)).as("_c"))

    // micro-nat log-prob per DISTINCT pair the raw corpus contains
    // (≤ B² rows — checkpointed so the scoring join's lp side doesn't
    // re-run the corpus explode); unseen bigrams/contexts smooth
    // through coalesce(0)
    val lp = docPairs.select(col("_b1"), col("_b2")).distinct()
      .localCheckpoint()
      .join(c12, Seq("_b1", "_b2"), "left")
      .join(c1, Seq("_b1"), "left")
      .na.fill(0L, Seq("_c12", "_c1"))
      .select(col("_b1"), col("_b2"),
        round(log((col("_c12") + 1L).cast("double") / (col("_c1") + b))
          * 1000000.0).cast("long").as("_lp_micro"))

    val scored = docPairs.join(lp, Seq("_b1", "_b2"))
      .groupBy(col(idCol))
      .agg(sum(col("_c")).as("n_bigrams"),
        (-sum(col("_c") * col("_lp_micro"))).as("nll_micro"))

    raw.select(col(idCol)).distinct()
      .join(scored, Seq(idCol), "left")
      .na.fill(0L, Seq("n_bigrams", "nll_micro"))
      .select(col(idCol), col("n_bigrams"), col("nll_micro"),
        when(col("n_bigrams") === 0L, lit(null).cast("double"))
          .otherwise(round(col("nll_micro").cast("double")
            / col("n_bigrams") / 1000000.0, 6)).as("avg_nll"))
  }
}
