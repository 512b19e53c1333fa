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
    * @param useBloom     decontaminate through the Bloom prefilter
    *                     ([[Dedup.decontaminateBloom]]) — the default and
    *                     the 100 TB shape: only grams that MIGHT overlap
    *                     the eval set reach the exact verification join,
    *                     instead of shuffling every distinct training
    *                     gram. Row-identical to the exact flavor at any
    *                     `fpp` (no false negatives + exact verify), so
    *                     flipping the flag never changes the output —
    *                     `false` only skips the filter build, which can
    *                     win at toy scale.
    * @param fpp          Bloom false-positive rate (size/volume trade)
    */
  /** Stage boundaries are materialized as NARROW kept-id sets
    * (`localCheckpoint`) and each stage's input is rebuilt as a
    * semi-join of the original `corpus` against the current ids:
    * without the cut, every downstream stage's lazy lineage re-executes
    * the whole upstream cascade (the near-dup stage alone consumes its
    * input from several subtrees), which measured ~6× the end-to-end
    * runtime. Ids are the right thing to persist — text re-reads come
    * from the (columnar, pruned) source scan, not from a spilled copy
    * of the corpus; a lake deployment would write each stage's
    * survivors as parquet and get the same cut for free.
    */
  def cleanCorpus(
      corpus: DataFrame, evalSet: DataFrame, textCol: String, idCol: String,
      minQuality: Double = 0.0, maxDupRatio: Double = 1.0,
      shingleK: Int = 3, bands: Int = 8, rowsPerBand: Int = 4,
      nearThreshold: Double = 0.5, decontamK: Int = 13,
      tokenizer: Column => Column = TextOps.tokens,
      maxIter: Int = 20, useBloom: Boolean = true,
      fpp: Double = 0.01): DataFrame = {
    def stage(ids: DataFrame): DataFrame =
      corpus.join(ids.localCheckpoint(), Seq(idCol), "left_semi")
    // filter + exact dedup FUSE into one scan + one hash aggregation:
    // the quality/repetition predicate is per-row (scan-stage), so the
    // content-hash groupBy can consume it directly — one stage barrier
    // and one corpus pass instead of two. One staged token pass feeds
    // both scores.
    val ids1 = corpus
      .select(col(idCol), col(textCol), tokenizer(col(textCol)).as("_toks"))
      .select(col(idCol), col(textCol),
        TextOps.qualityScore(col("_toks")).as("_q"),
        TextOps.repetition(TextOps.shingles(col("_toks"), shingleK))
          .getField("dup_ratio").as("_dup"))
      .filter(col("_q") >= minQuality && col("_dup") <= maxDupRatio)
      .groupBy(sha2(col(textCol), 256))
      .agg(min(col(idCol)).as(idCol))
      .select(idCol)
    val deduped = stage(ids1)
    // sign ONCE into the (id, sig, buckets) index shape — the inline
    // near-dedup signs each self-join side separately; the index is
    // also the artifact a lake deployment would persist here
    val idx = Dedup.signIndex(deduped, textCol, idCol, shingleK, bands,
      rowsPerBand, tokenizer).localCheckpoint()
    val near = Dedup.dedupNearFromIndex(deduped, idx, idCol,
      nearThreshold, maxIter)
    val survivors = stage(near.select(col(idCol)))
    if (useBloom)
      Dedup.decontaminateBloom(survivors, evalSet, textCol, idCol,
        decontamK, fpp, tokenizer)
    else
      Dedup.decontaminate(survivors, evalSet, textCol, idCol, decontamK,
        tokenizer)
  }

  /** Per-document removal audit — "why was my doc dropped": replays the
    * [[cleanCorpus]] cascade stage-for-stage (same primitives, same
    * thresholds) and returns one row per corpus doc with the FIRST tier
    * that removed it — `quality` (quality/repetition gate), `exact`
    * (content-hash dup, a smaller id kept), `near_dup` (lost its MinHash
    * cluster to a smaller-id representative), `contaminated` (eval-set
    * k-gram overlap) — or `kept`. The `kept` rows are exactly
    * [[cleanCorpus]]'s survivor ids, by construction.
    *
    * Scale shape: every per-tier kept set is a narrow ids-only frame
    * (checkpointed, like cleanCorpus's stage cuts); the verdict is four
    * left joins of the id spine against subset-chained id sets — all on
    * the same key so the shuffle exchanges line up — and the wide text
    * column never reaches a join. This is the lineage report a curation
    * run ships next to its output corpus.
    */
  def removalAudit(
      corpus: DataFrame, evalSet: DataFrame, textCol: String, idCol: String,
      minQuality: Double = 0.0, maxDupRatio: Double = 1.0,
      shingleK: Int = 3, bands: Int = 8, rowsPerBand: Int = 4,
      nearThreshold: Double = 0.5, decontamK: Int = 13,
      tokenizer: Column => Column = TextOps.tokens,
      maxIter: Int = 20, useBloom: Boolean = true,
      fpp: Double = 0.01): DataFrame = {
    def stage(ids: DataFrame): DataFrame =
      corpus.join(ids, Seq(idCol), "left_semi")
    // ONE scored pass: the expensive stage is the tokenize+score scan,
    // so materialize (id, content-hash) once and derive BOTH the
    // quality-pass set and the exact-dedup keepers from it — narrow
    // rows (id + 64-char hash), never the text
    val scoredIds = corpus
      .select(col(idCol), col(textCol), tokenizer(col(textCol)).as("_toks"))
      .select(col(idCol), col(textCol),
        TextOps.qualityScore(col("_toks")).as("_q"),
        TextOps.repetition(TextOps.shingles(col("_toks"), shingleK))
          .getField("dup_ratio").as("_dup"))
      .filter(col("_q") >= minQuality && col("_dup") <= maxDupRatio)
      .select(col(idCol), sha2(col(textCol), 256).as("_h"))
      .localCheckpoint()
    val qualityIds = scoredIds.select(col(idCol))
    val exactIds = scoredIds
      .groupBy(col("_h"))
      .agg(min(col(idCol)).as(idCol))
      .select(idCol)
    val deduped = stage(exactIds)
    val idx = Dedup.signIndex(deduped, textCol, idCol, shingleK, bands,
      rowsPerBand, tokenizer).localCheckpoint()
    val nearIds = Dedup.dedupNearFromIndex(deduped, idx, idCol,
      nearThreshold, maxIter).select(col(idCol)).localCheckpoint()
    val survivors = stage(nearIds)
    val finIds = (if (useBloom)
        Dedup.decontaminateBloom(survivors, evalSet, textCol, idCol,
          decontamK, fpp, tokenizer)
      else
        Dedup.decontaminate(survivors, evalSet, textCol, idCol,
          decontamK, tokenizer))
      .select(col(idCol)).localCheckpoint()
    def marked(ids: DataFrame, m: String) = ids.withColumn(m, lit(true))
    corpus.select(col(idCol))
      .join(marked(qualityIds, "_t1"), Seq(idCol), "left")
      .join(marked(exactIds, "_t2"), Seq(idCol), "left")
      .join(marked(nearIds, "_t3"), Seq(idCol), "left")
      .join(marked(finIds, "_t4"), Seq(idCol), "left")
      .select(col(idCol),
        when(col("_t1").isNull, lit("quality"))
          .when(col("_t2").isNull, lit("exact"))
          .when(col("_t3").isNull, lit("near_dup"))
          .when(col("_t4").isNull, lit("contaminated"))
          .otherwise(lit("kept")).as("verdict"))
  }

  /** Persist a [[removalAudit]] as the curation run's lineage
    * artifact — a narrow (id, verdict) parquet table written ONCE next
    * to the output corpus, so every downstream consumer (the
    * preflight, compliance reports, per-tier sampling) reads the
    * artifact instead of re-scoring the corpus. Re-running the scan
    * per consumer is the q200 anti-pattern: the audit is the two most
    * expensive stages of the whole pipeline (tokenize+score +
    * LSH dedup), and its output is ids-only.
    */
  def writeRemovalAudit(audit: DataFrame, path: String): Unit =
    audit.write.mode("overwrite").parquet(path)

  /** Load a persisted removal-audit artifact ([[writeRemovalAudit]]). */
  def readRemovalAudit(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    spark.read.parquet(path)

  /** The production preflight: per-verdict document counts off a
    * PERSISTED audit artifact — one |corpus|-row ids-only aggregation,
    * zero corpus scans.
    */
  def preflightFromAudit(audit: DataFrame): DataFrame =
    audit.groupBy(col("verdict")).agg(count(lit(1)).as("n_docs"))
}
