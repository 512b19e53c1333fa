package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming twin of [[EventOps.retention]] — EXACTLY incremental,
  * unlike the funnel: retention is a pure function of the distinct
  * `(user, epoch-day)` activity set, which is order-free and
  * idempotent under union. Event drops arrive as a stream; each
  * micro-batch collapses to its distinct user-days and APPENDS only
  * the genuinely new ones (anti-join against the persisted activity
  * table), so the state grows by activity — users × active days —
  * while the raw event history (arbitrarily larger) is never kept or
  * rescanned. The report at any time is the batch retention tail over
  * the state table and equals the batch [[EventOps.retention]] over
  * the full history REGARDLESS of arrival order (late/out-of-order
  * events just add their (user, day) rows; a late EARLIER day
  * correctly re-cohorts the user at report time because cohorts are
  * derived from state, not frozen).
  *
  * Delivery: `foreachBatch` is at-least-once; a replayed batch's
  * user-days all anti-join away — append is idempotent.
  *
  * Small files: each append lands one file group, so a long-running
  * stream accumulates one per batch and the anti-join/report listing
  * cost grows with batch COUNT, not state size. [[start]] therefore
  * compacts every `compactEvery` batches (default 64): a single
  * crash-safe temp-then-swap rewrite ([[StateSwap.swapAll]]) collapses
  * the accumulated groups. Compaction is amortized-O(|state|/N) per
  * batch and purely physical — the activity set is append-only
  * distinct rows, so a rewrite changes layout, never content.
  */
object StreamingRetention {

  def start(
      stream: DataFrame, statePath: String, checkpoint: String,
      userCol: String = "user_id", tsCol: String = "ts",
      compactEvery: Int = 64,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, statePath, userCol, tsCol)
        if (compactEvery > 0 && batchId > 0 &&
          batchId % compactEvery == 0)
          compact(batch.sparkSession, statePath)
      }
      .start()

  /** One micro-batch of [[start]] — public so batch jobs (and tests)
    * can drive the same incremental state without a stream.
    */
  def processBatch(batch: DataFrame, statePath: String,
      userCol: String = "user_id", tsCol: String = "ts"): Unit = {
    val spark = batch.sparkSession
    val act = EventOps.dailyActivity(batch, userCol, tsCol)
    val hPath = new Path(statePath)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    StateSwap.healWhole(fs, statePath)
    val fresh =
      if (fs.exists(hPath))
        act.join(spark.read.parquet(statePath), Seq("_u", "_day"),
          "left_anti")
      else act
    fresh.write.mode("append").parquet(statePath)
  }

  /** Collapse the per-batch append file groups into one compact
    * rewrite of the activity state (content-identical — the state is
    * a distinct set). Crash-safe: write-to-temp then swap with checked
    * renames; an interrupted swap heals on the next batch/report.
    */
  def compact(spark: org.apache.spark.sql.SparkSession,
      statePath: String, targetFiles: Int = 32): Unit = {
    val hPath = new Path(statePath)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    StateSwap.healWhole(fs, statePath)
    if (!fs.exists(hPath)) return
    // localCheckpoint pins the CURRENT rows: swapAll deletes the live
    // directory mid-swap, and a lazy plan would otherwise re-list the
    // very files the swap is deleting
    val state = spark.read.parquet(statePath)
      .repartition(targetFiles).localCheckpoint()
    StateSwap.swapAll(fs, statePath, state)
  }

  /** Retention report off the current activity state — same schema as
    * [[EventOps.retention]]:
    * `(cohort_day, day_offset, n_active, retention)`.
    */
  def report(spark: org.apache.spark.sql.SparkSession,
      statePath: String): DataFrame = {
    val hPath = new Path(statePath)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    StateSwap.healWhole(fs, statePath)
    import spark.implicits._
    val act =
      if (fs.exists(hPath)) spark.read.parquet(statePath)
      else Seq.empty[(Long, Long)].toDF("_u", "_day")
    EventOps.retentionFromActivity(act)
  }
}
