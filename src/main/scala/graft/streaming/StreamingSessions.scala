package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming twin of [[EventOps.sessionize]] — incremental gap-based
  * sessionization: events arrive as a stream and a persisted per-user
  * session table carries every CLOSED session plus the one still-open
  * session per user; each micro-batch sessionizes only its own events
  * and merges against the single mutable row per user (the open
  * session), so per-batch work is O(batch + touched-bucket state),
  * never a rescan of event history.
  *
  * State layout: the funnel twin's hash-bucketed discipline —
  * `_b = pmod(hash(_u), buckets)` partitions, per-batch I/O touches
  * only the buckets containing the batch's users, `buckets` constant
  * for the lifetime of a state path. Rows:
  * `(_u, session_seq, s_start, s_end, n_events, sum_value, _applied)`
  * with sum_value UNROUNDED in state (rounding happens once in
  * [[report]] — merging already-rounded partials would diverge from
  * the batch flavor).
  *
  * Merge rule per user and batch: the batch's own sessions (computed
  * with the exact batch semantics: new session when
  * `gap > gapMinutes`, ordered by `(ts, event_id)`) renumber onto the
  * state's tail — if the batch's first event follows the user's open
  * session within the gap, they are ONE session (counts/sums add, end
  * extends); otherwise the open session closes and the batch's
  * sessions append with fresh ordinals. Only the open-session row is
  * ever rewritten; closed sessions are immutable.
  *
  * Exactness precondition (the twins' shared contract): batches
  * arrive in event-time order across batches (within a batch, order
  * is irrelevant — the batch sorts itself). Under it the state equals
  * [[EventOps.sessionize]] over the full history row for row, which
  * is what lets q272 replay the state under q24's DuckDB oracle. A
  * late event belonging before an already-closed session boundary is
  * not revisited — run the batch flavor over full history for the
  * exact answer.
  *
  * Delivery: `foreachBatch` is at-least-once, and unlike the funnel's
  * idempotent `least`-merge, session merging ADDS counts — so a
  * replayed batch must not double-apply. The per-bucket applied-batch
  * watermark (`_applied` on every state row — [[StreamingAggState]]'s
  * exactly-once discipline) is the guard: a replay skips buckets
  * whose watermark already covers its batch id; it rides on either
  * store because both replace buckets atomically at their commit
  * point (rename, or the marker PUT).
  */
object StreamingSessions {

  def start(
      stream: DataFrame, statePath: String, checkpoint: String,
      gapMinutes: Int = 30, userCol: String = "user_id",
      tsCol: String = "ts", idCol: String = "event_id",
      valueCol: String = "value", buckets: Int = 64,
      trigger: Trigger = Trigger.AvailableNow(),
      store: StateStore = RenameStateStore): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, statePath, gapMinutes, userCol,
          tsCol, idCol, valueCol, buckets, store)
      }
      .start()

  /** One micro-batch of [[start]] — public so batch replays (q272)
    * and tests drive the same state without a stream.
    */
  def processBatch(
      batch: DataFrame, batchId: Long, statePath: String,
      gapMinutes: Int = 30, userCol: String = "user_id",
      tsCol: String = "ts", idCol: String = "event_id",
      valueCol: String = "value", buckets: Int = 64,
      store: StateStore = RenameStateStore): Unit = {
    require(gapMinutes > 0, "gapMinutes must be positive")
    require(buckets > 0, s"buckets must be positive, got $buckets")
    import org.apache.spark.sql.expressions.Window
    val spark = batch.sparkSession
    val gapSec = gapMinutes * 60L
    val ev = EventOps.normalizeTs(batch, tsCol)
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("_u"), col(tsCol).cast("long").as("_ts"),
        col(idCol).as("_eid"), col(valueCol).cast("double").as("_v"))
    val fs = new Path(statePath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    store.heal(fs, statePath)
    // bounded driver materialization: ≤ `buckets` ints
    val touched = ev
      .select(pmod(hash(col("_u")), lit(buckets)).as("_b"))
      .distinct().collect().map(_.getInt(0)).sorted
    if (touched.isEmpty) return
    val old: Option[DataFrame] =
      if (store.hasState(fs, statePath))
        Some(store.read(spark, statePath, Some(touched.toSeq)))
      else None
    // replay guard: per-bucket applied-batch watermark (≤ |touched|
    // rows collected)
    val applied: Map[Int, Long] = old match {
      case Some(o) => o.groupBy(col("_b"))
        .agg(max(col("_applied")).as("_a"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      case None => Map.empty
    }
    val mergeBuckets = touched.filter(b =>
      applied.get(b).forall(_ < batchId))
    if (mergeBuckets.isEmpty) return // full replay: state already has it
    val bucketIds = mergeBuckets.map(Integer.valueOf).toSeq
    val evT = ev.filter(
      pmod(hash(col("_u")), lit(buckets)).isin(bucketIds: _*))
    // the batch's own sessions, exact batch semantics (local seq
    // 0-based per user); sums stay UNROUNDED. The per-user window is
    // batch-local — a whale user at production scale caps at one
    // batch's events here, not full history (the scalable-batch
    // flavor's two-level trick applies if even that is too much).
    val w = Window.partitionBy(col("_u"))
      .orderBy(col("_ts"), col("_eid"))
    val flagged = evT.withColumn("_flag",
      when(col("_ts") - lag(col("_ts"), 1).over(w) > gapSec, 1L)
        .otherwise(0L))
      .withColumn("_ls", sum(col("_flag"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val bsess = flagged.groupBy(col("_u"), col("_ls"))
      .agg(min(col("_ts")).as("_bs"), max(col("_ts")).as("_be"),
        count(lit(1)).as("_bn"), sum(col("_v")).as("_bv"))
    val oldRows: DataFrame = old match {
      case Some(o) => o.filter(col("_b").isin(bucketIds: _*))
        .select(col("_u"), col("session_seq"), col("s_start"),
          col("s_end"), col("n_events"), col("sum_value"))
      case None => bsess.select(col("_u"), lit(0L).as("session_seq"),
        col("_bs").as("s_start"), col("_be").as("s_end"),
        col("_bn").as("n_events"), col("_bv").as("sum_value")).limit(0)
    }
    // ONE mutable row per user: the open (= highest-seq) session
    val last = oldRows.groupBy(col("_u"))
      .agg(max(struct(col("session_seq"), col("s_end"), col("s_start"),
        col("n_events"), col("sum_value"))).as("_l"))
      .select(col("_u"), col("_l.session_seq").as("_lseq"),
        col("_l.s_end").as("_lend"), col("_l.s_start").as("_lstart"),
        col("_l.n_events").as("_ln"), col("_l.sum_value").as("_lv"))
    // the user's batch-first start decides whether the open session
    // continues; broadcast-joined back onto every batch session row
    val firstStarts = bsess.filter(col("_ls") === 0)
      .select(col("_u"), col("_bs").as("_bs0"))
    val joined = bsess.join(last, Seq("_u"), "left")
      .join(firstStarts, Seq("_u"))
    val continues = col("_lseq").isNotNull &&
      col("_bs0") - col("_lend") <= gapSec
    val isOpenRow = continues && col("_ls") === 0
    val merged = joined.select(col("_u"),
      when(col("_lseq").isNull, col("_ls"))
        .when(continues, col("_lseq") + col("_ls"))
        .otherwise(col("_lseq") + 1 + col("_ls")).as("session_seq"),
      when(isOpenRow, least(col("_lstart"), col("_bs")))
        .otherwise(col("_bs")).as("s_start"),
      when(isOpenRow, greatest(col("_lend"), col("_be")))
        .otherwise(col("_be")).as("s_end"),
      when(isOpenRow, col("_ln") + col("_bn"))
        .otherwise(col("_bn")).as("n_events"),
      when(isOpenRow,
        // null-correct add: SQL sum() over an all-null session is
        // NULL in the batch flavor, and must stay NULL across merges
        when(col("_lv").isNull && col("_bv").isNull,
          lit(null).cast("double"))
          .otherwise(coalesce(col("_lv"), lit(0.0)) +
            coalesce(col("_bv"), lit(0.0))))
        .otherwise(col("_bv")).as("sum_value"))
    // old rows survive unless their (user, seq) was rewritten above
    val kept = oldRows.join(
      merged.select(col("_u"), col("session_seq")),
      Seq("_u", "session_seq"), "left_anti")
    val state = kept.unionByName(merged)
      .withColumn("_applied", lit(batchId))
      .withColumn("_b", pmod(hash(col("_u")), lit(buckets)))
    store.swapBuckets(fs, statePath, state, mergeBuckets.toSeq)
  }

  /** All sessions in the state — the streaming answer to q24's batch
    * report, same schema `(user_id, session_seq, session_start,
    * session_end, n_events, sum_value)` with the 2-decimal rounding
    * applied HERE (state sums are unrounded so merges stay exact).
    */
  def report(spark: org.apache.spark.sql.SparkSession,
      statePath: String, store: StateStore = RenameStateStore)
      : DataFrame = {
    val fs = new Path(statePath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    store.healForRead(fs, statePath)
    import spark.implicits._
    if (!store.hasState(fs, statePath))
      return Seq.empty[(Long, Long, Long, Long, Long, Double)]
        .toDF("user_id", "session_seq", "session_start", "session_end",
          "n_events", "sum_value")
    store.read(spark, statePath)
      .select(col("_u").as("user_id"), col("session_seq"),
        col("s_start").as("session_start"),
        col("s_end").as("session_end"), col("n_events"),
        round(col("sum_value"), 2).as("sum_value"))
  }
}
