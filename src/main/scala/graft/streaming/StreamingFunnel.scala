package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming twin of [[EventOps.funnel]] — the incremental ordered
  * funnel: event drops arrive as a stream, and a persisted per-user
  * state table carries each user's earliest stage-completion chain
  * (`(stage_idx, _u, _t)`), updated per micro-batch. Reading the
  * funnel report at any time is one small aggregation over the state
  * table ([[report]]), not a rescan of event history — the property
  * that matters when the history is 100 TB and the state is
  * users × stages rows.
  *
  * Per micro-batch ([[processBatch]]), stages update IN ORDER against
  * the batch-updated previous stage, so a view→click arriving in one
  * batch converts immediately. Each stage keeps the MIN qualifying
  * timestamp (the greedy-earliest chain — exact for unbounded
  * funnels), merged `least`-wise with prior state.
  *
  * Semantics caveat (documented, inherent to forward-only state): the
  * incremental chain is exact when a user's events arrive in
  * event-time order ACROSS batches (within a batch, order is
  * irrelevant). A stage-(i) event that arrived in an EARLIER batch
  * than the stage-(i−1) event that would have qualified it is not
  * revisited — run the batch [[EventOps.funnel]] over the full history
  * for the exact answer (same report schema, direct comparison). With
  * `maxGapMinutes` set the same greedy-earliest undercount as any
  * min-state funnel applies; the batch flavor's any-chain semantics
  * need full history by nature.
  *
  * Delivery: `foreachBatch` is at-least-once; the state merge is
  * idempotent (`least` of mins), so replaying a batch cannot corrupt
  * the chain. The state update is a write-to-temp-then-swap — the
  * previous state stays intact until the replacement is fully
  * committed, and an interrupted swap self-heals on the next
  * batch/report (a plain destructive overwrite would lose ALL
  * accumulated chains to one crash mid-write).
  */
object StreamingFunnel {

  def start(
      stream: DataFrame, statePath: String, checkpoint: String,
      stages: Seq[String], userCol: String = "user_id",
      typeCol: String = "event_type", tsCol: String = "ts",
      maxGapMinutes: Option[Long] = None,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, statePath, stages, userCol, typeCol, tsCol,
          maxGapMinutes)
      }
      .start()

  /** One micro-batch of [[start]] — public so batch jobs (and tests)
    * can drive the same incremental state without a stream.
    */
  def processBatch(
      batch: DataFrame, statePath: String, stages: Seq[String],
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts", maxGapMinutes: Option[Long] = None): Unit = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(maxGapMinutes.forall(_ > 0), "maxGapMinutes must be positive")
    val spark = batch.sparkSession
    val ev = EventOps.normalizeTs(batch, tsCol)
      // null users/timestamps: the batch funnel's countDistinct has
      // always excluded them; without this filter every batch would
      // append fresh unmatched (stage, null, t) rows to the state
      // (full_outer on a null key never joins) and inflate report
      // counts forever
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("_u"), col(typeCol).as("_ty"),
        col(tsCol).cast("long").as("_ts"))
    val hPath = new org.apache.hadoop.fs.Path(statePath)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    healState(fs, statePath)
    val old: DataFrame =
      if (fs.exists(hPath)) spark.read.parquet(statePath)
      else ev.select(lit(0).as("stage_idx"), col("_u"),
        col("_ts").as("_t")).limit(0)
    var state = old
    var prev: DataFrame = null
    stages.zipWithIndex.foreach { case (stage, i) =>
      val evs = ev.filter(col("_ty") === stage)
      val cand =
        if (i == 0) evs.groupBy(col("_u")).agg(min(col("_ts")).as("_ct"))
        else {
          val within = maxGapMinutes match {
            case Some(m) => col("_ts") > col("_tp") &&
              col("_ts") <= col("_tp") + lit(m * 60L)
            case None => col("_ts") > col("_tp")
          }
          evs.join(prev.select(col("_u"), col("_t").as("_tp")), Seq("_u"))
            .filter(within)
            .groupBy(col("_u")).agg(min(col("_ts")).as("_ct"))
        }
      val merged = state.filter(col("stage_idx") === i)
        .select(col("_u"), col("_t"))
        .join(cand, Seq("_u"), "full_outer")
        .select(col("_u"), least(
          coalesce(col("_t"), col("_ct")),
          coalesce(col("_ct"), col("_t"))).as("_t"))
      prev = merged
      state = state.filter(col("stage_idx") =!= i)
        .unionByName(merged.select(lit(i).as("stage_idx"), col("_u"),
          col("_t")))
    }
    // write-to-temp then swap: a plain mode("overwrite") deletes the
    // ONLY copy of months of accumulated state before the new write
    // commits — a crash in that window loses everything, which
    // at-least-once replay (one batch deep) cannot recover. The temp
    // write keeps the old state intact until the new one is fully
    // committed; the delete→rename window is self-healing
    // ([[healState]]: tmp present + state missing ⇒ finish the swap).
    val tmpPath = statePath + TmpSuffix
    state.write.mode("overwrite").parquet(tmpPath)
    fs.delete(hPath, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmpPath), hPath)
  }

  private val TmpSuffix = "__swap"

  /** Finish an interrupted state swap: if a committed temp exists and
    * the live state is gone (crash between delete and rename), the
    * temp IS the newest state — rename it into place. A temp alongside
    * a live state is a leftover from a crash BEFORE the delete; the
    * live state is current, drop the temp.
    */
  private def healState(fs: org.apache.hadoop.fs.FileSystem,
      statePath: String): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(statePath + TmpSuffix)
    val live = new org.apache.hadoop.fs.Path(statePath)
    if (fs.exists(tmp)) {
      if (fs.exists(live)) fs.delete(tmp, true)
      else fs.rename(tmp, live)
    }
  }

  /** The funnel report off the current state — same schema as
    * [[EventOps.funnel]]: `(stage_idx, stage, n_users, conversion)`,
    * zero-user stages included. One users×stages-row aggregation; the
    * event history is never rescanned.
    */
  def report(spark: org.apache.spark.sql.SparkSession, statePath: String,
      stages: Seq[String]): DataFrame = {
    val hPath = new org.apache.hadoop.fs.Path(statePath)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    healState(fs, statePath)
    import spark.implicits._
    val counts =
      if (fs.exists(hPath))
        spark.read.parquet(statePath)
          .groupBy(col("stage_idx")).agg(count(lit(1)).as("_n"))
      else Seq.empty[(Int, Long)].toDF("stage_idx", "_n")
    EventOps.funnelReport(spark, counts, stages)
  }
}
