package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.DocPool

/** Streaming corpus ingest into a [[DocPool]] — the CORPUS member of
  * the serve-while-ingesting family ([[StreamingBm25]]/[[StreamingAnn]]
  * /[[StreamingDedup]] maintain the indexes; this maintains the
  * documents those indexes serve, so takedown certificates
  * (`gone_pool`) and drift audits have a marker-committed corpus of
  * record to run against). The first micro-batch bootstraps the pool
  * ([[DocPool.write]] — the bucket fan-out freezes there); every later
  * batch lands as a per-bucket UPSERT ([[DocPool.upsert]]: replace
  * re-ingested ids, add new ones, rewrite ONLY the batch's hash
  * buckets).
  *
  * EXACTLY-ONCE per batch: the upsert's staged generation and the
  * "this stream batch was applied" fact (`#sid`) commit in ONE marker
  * PUT. On an at-least-once foreachBatch replay: a recorded batch id
  * skips; a crash between the stage write and the PUT leaves the
  * generation unreferenced (invisible to every reader — the replayed
  * writer's heal clears it and the batch lands once); a crashed
  * BOOTSTRAP left no marker, so the replay's heal clears the staged
  * generation and re-runs the write idempotently. Same preconditions
  * as [[StreamingDedup]]: the source must replay a batch id with
  * identical contents, and each batch's ids must be unique
  * ([[DocPool.upsert]] rejects in-batch duplicates loudly — dedupe
  * upstream, the q13 family).
  *
  * One stream per pool lifetime: the applied id is keyed by the
  * CHECKPOINT's batch ids (the [[StreamingBm25]] contract) — rebuild
  * the pool when retiring a checkpoint.
  *
  * Scale shape: each batch pays one batch-sized bucket assignment plus
  * a rewrite of ONLY the buckets it touches (≤ |batch| of them) — the
  * corpus is never rescanned, and untouched buckets' bytes never move.
  */
object StreamingDocPool {

  /** Ingest a document stream into the pool at `poolRoot`. */
  def start(
      stream: DataFrame, poolRoot: String, checkpoint: String,
      idCol: String, buckets: Int = 64, retain: Int = 1,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, poolRoot, idCol, buckets, retain)
      }
      .start()

  /** One micro-batch of [[start]] — public so batch jobs (and tests)
    * can drive the same incremental pipeline without a stream.
    */
  def processBatch(
      batch: DataFrame, batchId: Long, poolRoot: String,
      idCol: String, buckets: Int = 64, retain: Int = 1): Unit = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return
    if (!DocPool.hasPool(spark, poolRoot))
      // no committed marker = nothing ever landed (DocPool trees are
      // marker-committed from birth — a crashed bootstrap's staged
      // generation is unreferenced and healed by the re-run)
      DocPool.write(batch, poolRoot, idCol, buckets, retain,
        appliedId = batchId)
    else if (DocPool.lastAppliedStreamBatch(spark, poolRoot) < batchId)
      DocPool.upsert(batch, poolRoot, idCol, retain,
        appliedId = batchId)
    // else: replay of a committed batch — exactly-once skip
  }
}
