package graft.streaming

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
  */
object StreamingRetention {

  def start(
      stream: DataFrame, statePath: String, checkpoint: String,
      userCol: String = "user_id", tsCol: String = "ts",
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, statePath, userCol, tsCol)
      }
      .start()

  /** One micro-batch of [[start]] — public so batch jobs (and tests)
    * can drive the same incremental state without a stream.
    */
  def processBatch(batch: DataFrame, statePath: String,
      userCol: String = "user_id", tsCol: String = "ts"): Unit = {
    val spark = batch.sparkSession
    val act = EventOps.dailyActivity(batch, userCol, tsCol)
    val hPath = new org.apache.hadoop.fs.Path(statePath)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    val fresh =
      if (fs.exists(hPath))
        act.join(spark.read.parquet(statePath), Seq("_u", "_day"),
          "left_anti")
      else act
    fresh.write.mode("append").parquet(statePath)
  }

  /** Retention report off the current activity state — same schema as
    * [[EventOps.retention]]:
    * `(cohort_day, day_offset, n_active, retention)`.
    */
  def report(spark: org.apache.spark.sql.SparkSession,
      statePath: String): DataFrame = {
    val hPath = new org.apache.hadoop.fs.Path(statePath)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    import spark.implicits._
    val act =
      if (fs.exists(hPath)) spark.read.parquet(statePath)
      else Seq.empty[(Long, Long)].toDF("_u", "_day")
    EventOps.retentionFromActivity(act)
  }
}
