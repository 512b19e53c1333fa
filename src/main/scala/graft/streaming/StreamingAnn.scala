package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.sim.SimSearch

/** Streaming maintenance of a persisted hyperplane-ANN index — the
  * dense-retrieval twin of [[StreamingBm25]] (and the third member of
  * the serve-while-ingesting family beside [[StreamingDedup]]): new
  * embedding drops arrive as a stream, the first micro-batch creates
  * the index ([[SimSearch.writeAnnIndex]] — LSH parameters freeze
  * there), every later batch appends under the persisted meta
  * ([[SimSearch.appendToAnnIndex]] validates the column contract), and
  * `annTopKFromIndex(readAnnIndex(...))` serves partition-pruned
  * probes between batches.
  *
  * PER-BATCH COMMIT: appends are plain parquet appends into the live
  * vectors generation, so each applied batch leaves a write-once
  * `_applied.<batchId>` marker at the index root, checked before
  * processing — an at-least-once foreachBatch replay after restart
  * skips instead of double-inserting vectors (a duplicated id would
  * surface twice in every probe of its bucket). Same one-stream-per-
  * index-lifetime contract as [[StreamingBm25]]: markers are keyed by
  * the checkpoint's batch ids.
  *
  * Stream DELETES need no marker: [[SimSearch.deleteFromAnnIndex]] is
  * committed by one `_live` marker PUT and a replayed delete batch is
  * a no-op (tombstones are a distinct anti-join set).
  *
  * Scale shape: each batch pays one batch-sized bucketing pass —
  * never a corpus re-index; [[SimSearch.compactAnnIndex]] collapses
  * accumulated small files offline on the removal pipeline's cadence.
  */
object StreamingAnn {

  /** Ingest an embedding stream into the index at `indexPath`. */
  def start(
      stream: DataFrame, indexPath: String, checkpoint: String,
      idCol: String, vecCol: String, planes: Int = 12, dim: Int = 64,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, indexPath, idCol, vecCol, planes,
          dim)
      }
      .start()

  /** Tombstone-delete a stream of ids (single column named as the
    * index's id column). Replays are no-ops, see the class doc.
    */
  def startDeletes(
      ids: DataFrame, indexPath: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    ids.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          SimSearch.deleteFromAnnIndex(batch, indexPath)
      }
      .start()

  private def appliedMarker(indexPath: String, batchId: Long) =
    new org.apache.hadoop.fs.Path(indexPath, f"_applied.$batchId%019d")

  /** One micro-batch of [[start]] — public so batch jobs (and tests)
    * can drive the same incremental pipeline without a stream.
    */
  def processBatch(
      batch: DataFrame, batchId: Long, indexPath: String,
      idCol: String, vecCol: String, planes: Int = 12,
      dim: Int = 64): Unit = {
    val spark = batch.sparkSession
    val fs = new org.apache.hadoop.fs.Path(indexPath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(appliedMarker(indexPath, batchId))) return // replay
    if (batch.isEmpty) return
    val metaPath = new org.apache.hadoop.fs.Path(s"$indexPath/meta")
    if (!fs.exists(metaPath))
      SimSearch.writeAnnIndex(batch, indexPath, idCol, vecCol, planes,
        dim)
    else
      SimSearch.appendToAnnIndex(batch, indexPath, idCol, vecCol)
    fs.create(appliedMarker(indexPath, batchId), false).close()
  }
}
