package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end corpus-cleaning cascade — the composition a training-data
  * user actually runs, as one operator: quality + repetition filters →
  * exact dedup → near dedup → benchmark decontamination. Each stage is
  * the already-audited primitive; the composition adds no new shuffle
  * shapes (reference pipeline stages: `src/query.py` filter/distinct
  * chains — the LLM-data flavor of the same cascade idea).
  *
  * Stage order is the cheap-first production order: per-row filters
  * drop the garbage BEFORE any shuffle (scan-stage predicates), exact
  * dedup (one narrow hash agg) halves typical crawl dups before the
  * LSH machinery runs, near-dedup sees only surviving text, and
  * decontamination — the eval-join — runs last on the smallest set.
  */
object Pipeline {

  /** Clean `corpus` against `evalSet`. Returns surviving corpus rows
    * unchanged. Thresholds compare against the ROUNDED (scale-6) scores
    * [[TextOps.qualityScore]] / [[TextOps.repetition]] emit, so the
    * kept set is engine-replayable.
    *
    * @param minQuality   keep docs with composite quality ≥ this
    * @param maxDupRatio  keep docs with duplicate-shingle ratio ≤ this
    * @param nearThreshold MinHash est-Jaccard for the near-dup stage
    * @param decontamK    word k-gram width for eval-overlap removal
    */
  def cleanCorpus(
      corpus: DataFrame, evalSet: DataFrame, textCol: String, idCol: String,
      minQuality: Double = 0.0, maxDupRatio: Double = 1.0,
      shingleK: Int = 3, bands: Int = 8, rowsPerBand: Int = 4,
      nearThreshold: Double = 0.5, decontamK: Int = 13,
      tokenizer: Column => Column = TextOps.tokens,
      maxIter: Int = 20): DataFrame = {
    // one staged token pass feeds both scores; the filter stays in the
    // scan stage (pure per-row algebra, no shuffle before it)
    val filtered = corpus
      .withColumn("_toks", tokenizer(col(textCol)))
      .withColumn("_q", TextOps.qualityScore(col("_toks")))
      .withColumn("_dup",
        TextOps.repetition(TextOps.shingles(col("_toks"), shingleK))
          .getField("dup_ratio"))
      .filter(col("_q") >= minQuality && col("_dup") <= maxDupRatio)
      .drop("_toks", "_q", "_dup")
    val exact = Dedup.dedupExact(filtered, textCol, idCol)
    val near = Dedup.dedupNear(exact, textCol, idCol, shingleK, bands,
      rowsPerBand, nearThreshold, tokenizer, maxIter)
    Dedup.decontaminate(near, evalSet, textCol, idCol, decontamK, tokenizer)
  }
}
