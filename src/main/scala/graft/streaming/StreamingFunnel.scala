package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
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
  * State layout: hash-bucketed — partitioned by
  * `_b = pmod(hash(_u), buckets)` — so a micro-batch reads and
  * rewrites ONLY the buckets containing its users: per-batch I/O is
  * O(|touched buckets| × bucket size), not O(|accumulated users|).
  * A users×stages state at 10⁹ users on a minutes-cadence trigger
  * must not be a rewrite-the-world loop; with `buckets` sized so one
  * bucket holds ~10⁷ rows, a batch touching a subset of buckets pays
  * only for those. `buckets` must stay CONSTANT for the lifetime of a
  * state path (the bucket id is derived from the user hash at write
  * time — changing it orphans rows in stale buckets).
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
  * the chain. Touched buckets are replaced by write-to-temp-then-swap
  * ([[StateSwap]]): each bucket's previous files stay intact until its
  * replacement is fully committed, the delete→rename window is
  * self-healing, and UNTOUCHED bucket files are never opened, let
  * alone rewritten. Every swap `delete`/`rename` return value is
  * CHECKED — Hadoop `FileSystem.rename` reports failure by returning
  * false, and swallowing it would let the checkpoint commit a batch
  * whose state write silently failed (the heal would then drop the
  * newer temp). A false return throws, the batch fails, and
  * at-least-once replay recovers.
  */
object StreamingFunnel {

  def start(
      stream: DataFrame, statePath: String, checkpoint: String,
      stages: Seq[String], userCol: String = "user_id",
      typeCol: String = "event_type", tsCol: String = "ts",
      maxGapMinutes: Option[Long] = None, buckets: Int = 64,
      trigger: Trigger = Trigger.AvailableNow(),
      store: StateStore = RenameStateStore): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, statePath, stages, userCol, typeCol, tsCol,
          maxGapMinutes, buckets, store)
      }
      .start()

  /** One micro-batch of [[start]] — public so batch jobs (and tests)
    * can drive the same incremental state without a stream. `store`
    * selects the swap protocol: [[RenameStateStore]] (default —
    * atomic-rename filesystems) or [[MarkerStateStore]] (S3-style
    * object stores).
    */
  def processBatch(
      batch: DataFrame, statePath: String, stages: Seq[String],
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts", maxGapMinutes: Option[Long] = None,
      buckets: Int = 64, store: StateStore = RenameStateStore): Unit = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(maxGapMinutes.forall(_ > 0), "maxGapMinutes must be positive")
    require(buckets > 0, s"buckets must be positive, got $buckets")
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
    val hPath = new Path(statePath)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    store.heal(fs, statePath)
    // the touched-bucket set: ≤ `buckets` small ints — the one bounded
    // driver materialization this path makes (it prunes both the state
    // READ below and the swap loop at the end)
    val touched = ev
      .select(pmod(hash(col("_u")), lit(buckets)).as("_b"))
      .distinct().collect().map(_.getInt(0)).sorted
    if (touched.isEmpty) return // empty/all-null batch: state untouched
    val old: DataFrame =
      if (store.hasState(fs, statePath))
        // pruned to the touched bucket directories; a user's whole
        // chain lives in its hash bucket, so the merge below is
        // lossless
        store.read(spark, statePath, Some(touched.toSeq))
          .select(col("stage_idx"), col("_u"), col("_t"))
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
    store.swapBuckets(fs, statePath,
      state.withColumn("_b", pmod(hash(col("_u")), lit(buckets))),
      touched.toSeq)
  }

  /** Time-to-convert percentiles off the current state — the streaming
    * twin of [[EventOps.funnelLatency]], same schema
    * `(stage_idx, stage, n_converted, m, p50_gap_sec, p90_gap_sec)`:
    * adjacent stage rows self-join on the user (both live in the same
    * hash bucket, so the join is bucket-local on a cell-partitioned
    * lake), gaps feed the same md5-keyed bottom-k sketch tail, so
    * under the twins' event-time-ordered exactness precondition the
    * report equals the batch flavor bit-for-bit (test-pinned). One
    * users×stages-row pass; event history is never rescanned.
    */
  def latencyReport(spark: org.apache.spark.sql.SparkSession,
      statePath: String, stages: Seq[String], k: Int = 256,
      store: StateStore = RenameStateStore): DataFrame = {
    val hPath = new Path(statePath)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    store.healForRead(fs, statePath)
    import spark.implicits._
    val st =
      if (store.hasState(fs, statePath))
        store.read(spark, statePath)
          .select(col("stage_idx"), col("_u"), col("_t"))
      else Seq.empty[(Int, Long, Long)].toDF("stage_idx", "_u", "_t")
    val prev = st.select((col("stage_idx") + 1).as("stage_idx"),
      col("_u"), col("_t").as("_pt"))
    val gaps = st.join(prev, Seq("stage_idx", "_u"))
      .select(col("stage_idx"), col("_u"),
        (col("_t") - col("_pt")).cast("double").as("_gap"))
    EventOps.latencyFromGaps(spark, gaps, stages, k)
  }

  /** The funnel report off the current state — same schema as
    * [[EventOps.funnel]]: `(stage_idx, stage, n_users, conversion)`,
    * zero-user stages included. One users×stages-row aggregation; the
    * event history is never rescanned.
    */
  def report(spark: org.apache.spark.sql.SparkSession, statePath: String,
      stages: Seq[String],
      store: StateStore = RenameStateStore): DataFrame = {
    val hPath = new Path(statePath)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    store.healForRead(fs, statePath)
    import spark.implicits._
    val counts =
      if (store.hasState(fs, statePath))
        store.read(spark, statePath)
          .groupBy(col("stage_idx")).agg(count(lit(1)).as("_n"))
      else Seq.empty[(Int, Long)].toDF("stage_idx", "_n")
    EventOps.funnelReport(spark, counts, stages)
  }
}

/** Crash-safe replacement of hash-bucket partitions in a persisted
  * parquet state table — the write-to-temp-then-swap discipline,
  * scoped to the buckets a batch touched so per-batch I/O is bounded
  * by the touched set, never the accumulated state.
  *
  * Protocol: the new rows for the touched buckets land in one
  * committed parquet write under `<state>__swap` (partitioned by
  * `_b`; files appear only at job commit), then each touched bucket
  * directory is swapped live: delete `<state>/_b=N`, rename
  * `<state>__swap/_b=N` into place. The previous state is intact
  * until the temp write commits, so a crash never leaves ZERO copies.
  *
  * [[heal]] finishes an interrupted swap: a temp bucket whose live
  * twin is MISSING was mid-swap (crash between delete and rename) —
  * the temp is the newest committed copy, rename it in; a temp bucket
  * ALONGSIDE its live twin is from a crash before that bucket's
  * delete — the batch never committed to the streaming checkpoint, so
  * the live copy stays and replay re-applies the (idempotent) merge.
  *
  * Every `delete`/`rename` return value is checked: Hadoop
  * `FileSystem` reports most failures by returning FALSE, not
  * throwing, and a swallowed false would let `foreachBatch` commit a
  * batch whose state never landed — the next heal would then delete
  * the newer temp with no replay to recover it (the round-8 ADVICE
  * bug). A false here throws `IOException`, failing the batch so
  * at-least-once replay recovers.
  */
private[streaming] object StateSwap {

  private val TmpSuffix = "__swap"

  private def checked(ok: Boolean, what: String): Unit =
    if (!ok) throw new java.io.IOException(
      s"state swap failed (returned false): $what")

  def swapBuckets(fs: FileSystem, statePath: String, state: DataFrame,
      touched: Seq[Int]): Unit = {
    val tmpRoot = statePath + TmpSuffix
    // leftover temp from an interrupted PREVIOUS swap was already
    // healed by the caller; a stray one here is a concurrent writer —
    // fail loudly rather than interleave swaps
    state.write.partitionBy("_b").mode("errorifexists").parquet(tmpRoot)
    val live = new Path(statePath)
    if (!fs.exists(live)) checked(fs.mkdirs(live), s"mkdirs $live")
    touched.foreach { b =>
      val tmpB = new Path(s"$tmpRoot/_b=$b")
      val liveB = new Path(s"$statePath/_b=$b")
      // a touched bucket with no surviving rows writes no directory —
      // nothing to swap (old rows are never dropped by the merge, so
      // an existing live bucket implies a temp twin)
      if (fs.exists(tmpB)) {
        if (fs.exists(liveB))
          checked(fs.delete(liveB, true), s"delete $liveB")
        checked(fs.rename(tmpB, liveB), s"rename $tmpB -> $liveB")
      }
    }
    checked(fs.delete(new Path(tmpRoot), true), s"delete $tmpRoot")
  }

  def heal(fs: FileSystem, statePath: String): Unit = {
    val tmpRoot = new Path(statePath + TmpSuffix)
    if (!fs.exists(tmpRoot)) return
    val live = new Path(statePath)
    fs.listStatus(tmpRoot)
      .filter(_.getPath.getName.startsWith("_b="))
      .foreach { st =>
        val liveB = new Path(live, st.getPath.getName)
        if (fs.exists(liveB))
          checked(fs.delete(st.getPath, true), s"delete ${st.getPath}")
        else {
          if (!fs.exists(live)) checked(fs.mkdirs(live), s"mkdirs $live")
          checked(fs.rename(st.getPath, liveB),
            s"rename ${st.getPath} -> $liveB")
        }
      }
    checked(fs.delete(tmpRoot, true), s"delete $tmpRoot")
  }

}
