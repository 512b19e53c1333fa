package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.text.{Bm25, TextOps}

/** Streaming maintenance of a persisted BM25 inverted index — the
  * serve-while-ingesting half of the retrieval stack ([[StreamingDedup]]
  * is the same wiring for the signed MinHash index): new document drops
  * arrive as a stream, each micro-batch lands in the index via
  * [[Bm25.writeBm25Index]] (first batch bootstraps) or
  * [[Bm25.appendToBm25Index]] (every later batch), and
  * [[Bm25.topKFromIndex]] serves queries between batches — idf and
  * avgdl track the growing corpus automatically because serving derives
  * them from the live postings and summed stats deltas.
  *
  * PER-BATCH COMMIT: an append is a plain postings/stats append, so a
  * replayed micro-batch (foreachBatch is at-least-once) would DOUBLE
  * its documents' postings and overcount df. Each applied batch
  * therefore leaves a write-once `_applied.<batchId>` marker file at
  * the index root, checked before processing — a restart replaying the
  * last un-checkpointed batch skips it instead of double-appending.
  * The remaining window (a crash BETWEEN the append and its marker PUT
  * replays the append) is the standard non-transactional-sink caveat,
  * same as [[StreamingDedup]]'s; the upstream dedup stage makes the
  * corpus-side contract ("ids never re-arrive") hold, this marker
  * makes the RESTART path hold too. Marker files are `_`-prefixed so
  * parquet readers ignore them, and [[Bm25.writeBm25Index]]'s
  * full-tree overwrite clears them with the rest of a stale index.
  *
  * Stream DELETES need no marker: [[Bm25.deleteFromBm25Index]] is
  * already committed by one `_live` marker PUT and a replayed delete
  * is a no-op by construction (tombstones are a distinct union; the
  * negative stats delta is computed off live postings that already
  * exclude the ids).
  *
  * One stream per index lifetime: `_applied` markers are keyed by the
  * CHECKPOINT's batch ids, so re-pointing a brand-new stream (fresh
  * checkpoint, batch ids restarting at 0) at an existing index would
  * skip its first batches against the old stream's markers — rebuild
  * the index (the bootstrap clears the tree) or clear `_applied.*`
  * when retiring a checkpoint.
  *
  * Scale shape: each batch pays one batch-sized tokenize + one
  * (doc, term) aggregation — never a corpus rescan; the index grows
  * append-only inside the marker-resolved live generation, and
  * [[Bm25.compactBm25Index]] collapses accumulated small files
  * offline on the removal pipeline's cadence.
  */
object StreamingBm25 {

  /** Ingest a document stream into the index at `indexPath`. */
  def start(
      stream: DataFrame, indexPath: String, checkpoint: String,
      textCol: String, idCol: String, buckets: Int = 64,
      tokenizer: Column => Column = TextOps.tokensSimple,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, indexPath, textCol, idCol,
          buckets, tokenizer)
      }
      .start()

  /** Tombstone-delete a stream of ids from the index (takedowns /
    * dedup losers arriving as a stream). Replays are no-ops, see
    * the class doc.
    */
  def startDeletes(
      ids: DataFrame, indexPath: String, checkpoint: String,
      idCol: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    ids.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          Bm25.deleteFromBm25Index(batch, indexPath, idCol)
      }
      .start()

  private def appliedMarker(indexPath: String, batchId: Long) =
    new org.apache.hadoop.fs.Path(indexPath, f"_applied.$batchId%019d")

  /** One micro-batch of [[start]] — public so batch jobs (and tests)
    * can drive the same incremental pipeline without a stream.
    */
  def processBatch(
      batch: DataFrame, batchId: Long, indexPath: String,
      textCol: String, idCol: String, buckets: Int = 64,
      tokenizer: Column => Column = TextOps.tokensSimple): Unit = {
    val spark = batch.sparkSession
    val fs = new org.apache.hadoop.fs.Path(indexPath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(appliedMarker(indexPath, batchId))) return // replay
    if (batch.isEmpty) return
    val metaPath = new org.apache.hadoop.fs.Path(s"$indexPath/meta")
    if (!fs.exists(metaPath))
      Bm25.writeBm25Index(batch, textCol, idCol, indexPath, buckets,
        tokenizer)
    else
      Bm25.appendToBm25Index(batch, textCol, idCol, indexPath,
        tokenizer)
    fs.create(appliedMarker(indexPath, batchId), false).close()
  }
}
