package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-stream operators over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props-json).
  *
  * Each transform is written against a plain DataFrame so the SAME code
  * runs in batch (`spark.read`) and in Structured Streaming
  * (`spark.readStream` + watermark): tumbling aggregation is
  * streaming-native (append mode with a watermark on `ts`); batch
  * sessionization uses a lag window, and its streaming twin is
  * `flatMapGroupsWithState` (see [[graft.streaming.StreamingIngest]]).
  */
object EventOps {

  /** Parquet TIMESTAMP(NANOS) has no Spark timestamp type; sessions read it
    * as a nanosecond long (`spark.sql.legacy.parquet.nanosAsLong=true`).
    * Normalize back to TimestampType (microsecond truncation — all
    * downstream ops use ≥ second granularity).
    */
  def normalizeTs(events: DataFrame, tsCol: String = "ts"): DataFrame =
    events.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.LongType =>
        events.withColumn(tsCol,
          timestamp_micros(expr(s"`$tsCol` div 1000")))
      case _ => events
    }

  /** Tumbling-window aggregation: events per (user, window) with count and
    * value sum. Window start exposed as epoch seconds (portable across
    * engines and timezones). One shuffle on (user, window) with map-side
    * partial aggregation.
    */
  def tumblingAgg(events: DataFrame, width: String = "1 hour"): DataFrame =
    normalizeTs(events)
      .groupBy(col("user_id"), window(col("ts"), width).as("w"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"),
        unix_timestamp(col("w.start")).as("window_start"),
        col("n_events"), col("sum_value"))

  /** Streaming flavor: same aggregation with a watermark so state is
    * bounded and windows close (append mode).
    */
  def tumblingAggStream(events: DataFrame, width: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(col("user_id"), window(col("ts"), width).as("w"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"),
        unix_timestamp(col("w.start")).as("window_start"),
        col("n_events"), col("sum_value"))

  /** Stream-stream interval join: every left event joins right events of
    * the same user whose timestamp falls in
    * `[left.ts - lookback, left.ts]` — the streaming twin of
    * [[graft.operators.Relational.rangeJoin]]. Both sides carry
    * watermarks and the join condition bounds event-time distance, so
    * Spark derives a state-eviction horizon on BOTH sides: state is
    * bounded by (watermark + lookback) of traffic per user, regardless
    * of stream length. Right-side columns arrive prefixed `r_`.
    */
  def intervalJoinStream(
      left: DataFrame, right: DataFrame,
      lookback: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
    val r = right.select(
      right.columns.toIndexedSeq.map(c => col(c).as(s"r_$c")): _*)
      .withWatermark("r_ts", watermark)
    l.join(r,
      col("user_id") === col("r_user_id") &&
        col("r_ts") >= col("ts") - expr(s"INTERVAL $lookback") &&
        col("r_ts") <= col("ts"))
      .drop("r_user_id")
  }

  /** Streaming exact dedup: drop events whose key was already seen
    * within the watermark horizon (`dropDuplicatesWithinWatermark` —
    * state evicts once the watermark passes an entry, so memory is
    * bounded by one horizon of distinct keys, not the whole stream).
    * The streaming twin of [[graft.text.Dedup.exactRows]]: exactly-once
    * delivery for at-least-once upstream sources.
    */
  def dedupStream(
      events: DataFrame, keyCols: Seq[String],
      watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Batch sessionization: a session breaks after `gapMinutes` of
    * inactivity per user. Window functions shuffle once on user_id and
    * sort within; per-user event counts are bounded in practice — when
    * they are not (bot/whale accounts at 100 TB), [[sessionizeScalable]]
    * computes the identical sessions without any single reducer holding
    * a whole user.
    */
  def sessionize(eventsRaw: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val events = normalizeTs(eventsRaw)
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
    val gapSec = gapMinutes * 60L
    val newSession = when(
      col("ts").cast("long") - lag(col("ts").cast("long"), 1)
        .over(byUser) > gapSec, 1).otherwise(0)
    events
      .withColumn("session_seq",
        sum(newSession).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        min(col("ts").cast("long")).as("session_start"),
        max(col("ts").cast("long")).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
  }

  /** Whale-user-safe sessionization, value-identical to [[sessionize]].
    *
    * The session index is an inclusive prefix sum of new-session flags
    * (gap > threshold) in per-user time order — so the tokenShards
    * two-level trick applies, bucketing by TIME: level 1 windows over
    * `(user, ts div bucketSec)` compute in-bucket lags, flags and local
    * prefix sums (a window partition holds one bucket's events, not a
    * whole user); level 2 runs per user over ONE ROW PER BUCKET —
    * (first_ts, last_ts, flag_sum) — deriving each bucket's boundary
    * flag (first event vs. previous bucket's last ts) and session-index
    * offset. `offset + boundary + local` reassembles the exact global
    * index; a year of a whale user at the default 1-day buckets is 365
    * level-2 rows. Bucket boundaries respect ts order, so every
    * non-first event's lag predecessor is in-bucket and the flags match
    * the single-window formulation exactly (pinned by test).
    */
  def sessionizeScalable(
      eventsRaw: DataFrame, gapMinutes: Int = 30,
      bucketMinutes: Int = 60 * 24): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(bucketMinutes > 0, "bucketMinutes must be positive")
    val events = normalizeTs(eventsRaw)
    val gapSec = gapMinutes * 60L
    val bucketSec = bucketMinutes * 60L
    val tsl = col("ts").cast("long")
    val base = events.withColumn("_tb",
      expr(s"CAST(ts AS BIGINT) div ${bucketSec}L"))
    // `value` trails the sort key as a semantically-inert tiebreak
    // (event_id is already a total order). Load-bearing for SCALE, not
    // semantics: the level-1 shuffle feeds two consumers — the session
    // assembly (which reads `value`) and the per-bucket offsets branch
    // (which does not). Without this, column pruning drops `value` from
    // the offsets branch's copy of the shuffle, the two exchanges stop
    // canonicalizing equal, AQE cannot reuse the stage, and the events
    // source is scanned AND shuffled twice (PlanGateSpec pins the reuse).
    val wLocal = Window.partitionBy(col("user_id"), col("_tb"))
      .orderBy(col("ts"), col("event_id"), col("value"))
    val local = base
      .withColumn("_lflag",
        when(tsl - lag(tsl, 1).over(wLocal) > gapSec, 1L).otherwise(0L))
      .withColumn("_lcum", sum(col("_lflag"))
        .over(wLocal.rowsBetween(Window.unboundedPreceding, 0)))
    // one row per (user, bucket); aggregates over `local` so the groupBy
    // reuses the level-1 window exchange
    val wUser = Window.partitionBy("user_id").orderBy(col("_tb"))
    val offsets = local.groupBy(col("user_id"), col("_tb"))
      .agg(min(tsl).as("_first"), max(tsl).as("_last"),
        sum(col("_lflag")).as("_fsum"))
      .withColumn("_bflag",
        when(col("_first") - lag(col("_last"), 1).over(wUser) > gapSec, 1L)
          .otherwise(0L))
      .withColumn("_off",
        coalesce(sum(col("_fsum") + col("_bflag"))
          .over(wUser.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("user_id").as("_ou"), col("_tb").as("_ob"),
        (col("_off") + col("_bflag")).as("_sbase"))
    // null-safe keys: a null user (or null ts → null bucket) is a valid
    // window partition and must not be dropped by the join
    local.join(offsets,
        col("user_id") <=> col("_ou") && col("_tb") <=> col("_ob"))
      .withColumn("session_seq", col("_sbase") + col("_lcum"))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        min(tsl).as("session_start"),
        max(tsl).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
  }

  /** Typed rows for the stateful streaming sessionizer. */
  final case class SessionEvent(
      user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class OpenSession(
      start: Long, end: Long, n: Long, sum: Double)
  final case class SessionOut(
      user_id: Long, session_start: Long, session_end: Long,
      n_events: Long, sum_value: Double)

  /** Streaming sessionization with custom state
    * (`flatMapGroupsWithState`, event-time timeout): per user, events
    * extend the open session while gaps stay under `gapMinutes`; a larger
    * gap (or the watermark passing the session's timeout) closes it and
    * emits one [[SessionOut]] row. The stateful twin of [[sessionize]] —
    * state per key is ONE OpenSession record, so memory is bounded by
    * the live-user count, and the event-time timeout guarantees every
    * session eventually closes even if its user goes silent.
    */
  def sessionizeStream(
      events: org.apache.spark.sql.Dataset[SessionEvent],
      gapMinutes: Int = 30,
      watermark: String = "1 hour"):
      org.apache.spark.sql.Dataset[SessionOut] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val gapSec = gapMinutes * 60L
    implicit val stateEnc = org.apache.spark.sql.Encoders.product[OpenSession]
    implicit val outEnc = org.apache.spark.sql.Encoders.product[SessionOut]
    implicit val longEnc = org.apache.spark.sql.Encoders.scalaLong

    def fn(userId: Long, rows: Iterator[SessionEvent],
        state: GroupState[OpenSession]): Iterator[SessionOut] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
      def close(s: OpenSession): Unit =
        out += SessionOut(userId, s.start, s.end, s.n, s.sum)

      if (state.hasTimedOut) {
        state.getOption.foreach(close)
        state.remove()
      } else {
        var cur = state.getOption
        rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
          val t = e.ts.getTime / 1000
          cur match {
            case Some(s) if t - s.end <= gapSec =>
              cur = Some(OpenSession(s.start, math.max(s.end, t),
                s.n + 1, s.sum + e.value))
            case Some(s) =>
              close(s)
              cur = Some(OpenSession(t, t, 1, e.value))
            case None =>
              cur = Some(OpenSession(t, t, 1, e.value))
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp((s.end + gapSec) * 1000)
        }
      }
      out.iterator
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout())(fn)
  }

  /** JSON props access (`get_json_object` — no parsing UDF). */
  def propInt(events: DataFrame, key: String, as: String): DataFrame =
    events.withColumn(as,
      get_json_object(col("props"), s"$$.$key").cast("int"))

  /** Per-type daily counts — the monitoring rollup. */
  def dailyTypeCounts(events: DataFrame): DataFrame =
    normalizeTs(events)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))

  /** First-order Markov transition matrix over each user's event
    * sequence: counts of consecutive `(kind → next kind)` steps and
    * the row-normalized transition probability — the session-path
    * fingerprint behind "what do users do after X" product questions
    * and the base model for next-event anomaly scoring (a session
    * whose steps are all low-probability transitions is bot-shaped).
    *
    * Scale shape: ONE user-partitioned window (lead over `(ts, id)` —
    * never partition-less), then two kind-pair-sized aggregations and
    * an equi-join; event volume leaves the plan at the first groupBy.
    * Counts are BIGINTs and the probability ONE division, so the
    * matrix replays exactly (q170). Ordering ties break on the id
    * column for cross-engine determinism.
    *
    * Returns `(kind, next_kind, n_pairs, n_from, p_next)`.
    */
  def transitionMatrix(events: DataFrame,
      userCol: String = "user_id", kindCol: String = "event_type",
      tsCol: String = "ts", idCol: String = "event_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    val pairs = events
      .select(col(userCol), col(kindCol).as("kind"),
        col(tsCol), col(idCol))
      .withColumn("next_kind", lead(col("kind"), 1).over(w))
      .filter(col("next_kind").isNotNull)
      .groupBy(col("kind"), col("next_kind"))
      .agg(count(lit(1)).as("n_pairs"))
    val totals = pairs.groupBy(col("kind"))
      .agg(sum(col("n_pairs")).as("n_from"))
    pairs.join(totals, Seq("kind"))
      .select(col("kind"), col("next_kind"), col("n_pairs"),
        col("n_from"),
        round(col("n_pairs").cast("double") /
          col("n_from").cast("double"), 6).as("p_next"))
  }

  /** Cohort LTV curve: users grouped by first-seen epoch day, revenue
    * (micro-snapped value) accumulated by cohort AGE — the
    * "cumulative value per user-cohort over time" view behind
    * payback-period decisions, the monetary sibling of [[retention]].
    * Integer day/micro arithmetic; the cumulative sum is a window
    * PARTITIONED by cohort over its bounded age axis.
    *
    * Returns `(cohort_day, age_days, n_cohort_users, rev_micro,
    * cum_rev_micro)`.
    */
  def cohortLtv(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts", valueCol: String = "value"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sec = col(tsCol).cast("long")
    val base = events.select(col(userCol).as("_u"),
      floor(sec / lit(86400)).as("_d"),
      round(col(valueCol) * lit(1000000.0)).cast("long").as("_vm"))
    val first = base.groupBy(col("_u")).agg(min(col("_d")).as("_c"))
    val sized = first.groupBy(col("_c").as("cohort_day"))
      .agg(count(lit(1)).as("n_cohort_users"))
    val rev = base.join(first, Seq("_u"))
      .groupBy(col("_c").as("cohort_day"),
        (col("_d") - col("_c")).as("age_days"))
      .agg(sum(col("_vm")).as("rev_micro"))
    val w = Window.partitionBy(col("cohort_day")).orderBy(col("age_days"))
      .rowsBetween(Window.unboundedPreceding, 0)
    rev.join(sized, Seq("cohort_day"))
      .select(col("cohort_day"), col("age_days"),
        col("n_cohort_users"), col("rev_micro"),
        sum(col("rev_micro")).over(w).as("cum_rev_micro"))
  }

  /** Lead-lag cross-correlation between two event types' gap-filled
    * daily count series: `corr(A_t, B_{t+lag})` for every lag in
    * `[-maxLag, maxLag]` — the "does A move before B" diagnostic
    * behind leading-indicator and cannibalization questions. Series
    * share one corpus-span integer-day grid (zero-filled, the
    * [[resampleDaily]] discipline on epoch-day arithmetic), each lag
    * is a shifted equi-join over the grid, and the correlation is
    * [[graft.operators.Relational.linearFit]]'s exact-integer-moment
    * chain — so the whole sweep replays in SQL (q190). The two tiny
    * series localCheckpoint once and feed all 2·maxLag+1 branches.
    *
    * Returns `(lag, n, corr, slope, intercept)`.
    */
  def leadLagCorrelation(events: DataFrame,
      kindA: String, kindB: String, maxLag: Int = 3,
      kindCol: String = "event_type", tsCol: String = "ts"): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val sec = col(tsCol).cast("long")
    val days = events.select(floor(sec / lit(86400)).as("_d"),
      col(kindCol).as("_k"))
    val grid = days.agg(min(col("_d")).as("_d0"),
        max(col("_d")).as("_d1"))
      .select(explode(sequence(col("_d0"), col("_d1"))).as("_d"))
    def series(kind: String, as: String): DataFrame = grid
      .join(days.filter(col("_k") === kind).groupBy(col("_d"))
        .agg(count(lit(1)).as(as)), Seq("_d"), "left")
      .na.fill(0L, Seq(as)).localCheckpoint()
    val a = series(kindA, "_x")
    val b = series(kindB, "_y")
    val pairs = (-maxLag to maxLag).map { l =>
      a.join(b.select((col("_d") - l).as("_d"), col("_y")), Seq("_d"))
        .select(lit(l).as("lag"), col("_x"), col("_y"))
    }.reduce(_.unionByName(_))
    graft.operators.Relational.linearFit(pairs, Seq("lag"),
      col("_x"), col("_y"))
  }

  /** RFM (recency / frequency / monetary) feature table — the
    * classic engagement segmentation base: per user, days since last
    * activity (anchored to the CORPUS max timestamp, so the table is
    * deterministic and replayable — no wall clock), event count,
    * micro-snapped value total, and tenure span. One event-volume
    * aggregation + a 1-row broadcast anchor.
    *
    * Returns `(user, recency_days, frequency, monetary_micro,
    * tenure_days)` — all integers.
    */
  def rfm(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts", valueCol: String = "value"): DataFrame = {
    val sec = col(tsCol).cast("long")
    val per = events.groupBy(col(userCol).as("user"))
      .agg(max(sec).as("_last"), min(sec).as("_first"),
        count(lit(1)).as("frequency"),
        sum(round(col(valueCol) * lit(1000000.0)).cast("long"))
          .as("monetary_micro"))
    val anchor = events.agg(max(sec).as("_amax"))
    per.crossJoin(broadcast(anchor))
      .select(col("user"),
        (floor(col("_amax") / lit(86400)) -
          floor(col("_last") / lit(86400))).as("recency_days"),
        col("frequency"), col("monetary_micro"),
        (floor(col("_last") / lit(86400)) -
          floor(col("_first") / lit(86400))).as("tenure_days"))
  }

  /** Two-variant conversion A/B report with the pooled two-proportion
    * z statistic: per variant the exposed-user and converting-user
    * counts and rate, plus one row-pair-derived z — integer counts,
    * the z as one fixed sqrt/division chain (micro-snapped), NULL
    * when a variant has no users or the pooled rate is degenerate.
    *
    * Returns one row `(n_a, conv_a, n_b, conv_b, rate_a, rate_b,
    * z_micro)`.
    */
  def abTest(events: DataFrame, variant: Column, converted: Column,
      userCol: String = "user_id"): DataFrame = {
    val users = events
      .select(col(userCol).as("_u"), variant.cast("int").as("_v"),
        converted.cast("int").as("_c"))
      .groupBy(col("_u"), col("_v"))
      .agg(max(col("_c")).as("_conv"))
    val agg = users.agg(
      sum(when(col("_v") === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("_v") === 0, col("_conv").cast("long"))
        .otherwise(0L)).as("conv_a"),
      sum(when(col("_v") === 1, 1L).otherwise(0L)).as("n_b"),
      sum(when(col("_v") === 1, col("_conv").cast("long"))
        .otherwise(0L)).as("conv_b"))
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val pa = col("conv_a").cast("double") / na
    val pb = col("conv_b").cast("double") / nb
    val pool = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    val se = sqrt(pool * (lit(1.0) - pool) *
      (lit(1.0) / na + lit(1.0) / nb))
    agg.select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
      round(pa, 6).as("rate_a"), round(pb, 6).as("rate_b"),
      when(col("n_a") === 0 || col("n_b") === 0 ||
          pool === 0.0 || pool === 1.0, lit(null).cast("long"))
        .otherwise(round((pb - pa) / se * lit(1000000.0))
          .cast("long")).as("z_micro"))
  }

  /** Session entry/exit analysis: [[sessionize]]'s gap rule rebuilt
    * with the event types kept, reporting per (first event, last
    * event) pair how many sessions travelled that arc and how many
    * bounced (single-event sessions) — the landing/abandonment view
    * product funnels start from.
    *
    * All windows are user- or session-partitioned (never global);
    * the report is kind²-sized. Returns
    * `(entry_kind, exit_kind, n_sessions, n_bounce)`.
    */
  def entryExitReport(eventsRaw: DataFrame,
      gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val events = normalizeTs(eventsRaw)
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
    val gapSec = gapMinutes * 60L
    val newSession = when(
      col("ts").cast("long") - lag(col("ts").cast("long"), 1)
        .over(byUser) > gapSec, 1).otherwise(0)
    val s = events.withColumn("session_seq",
      sum(newSession).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
    val w2 = Window.partitionBy(col("user_id"), col("session_seq"))
      .orderBy(col("ts"), col("event_id"))
    val m = s.select(col("user_id"), col("session_seq"),
      col("event_type"),
      row_number().over(w2).as("_rn"),
      count(lit(1)).over(
        Window.partitionBy(col("user_id"), col("session_seq")))
        .as("_sz"))
    val e = m.groupBy(col("user_id"), col("session_seq"))
      .agg(max(when(col("_rn") === 1, col("event_type")))
          .as("entry_kind"),
        max(when(col("_rn") === col("_sz"), col("event_type")))
          .as("exit_kind"),
        max(col("_sz")).as("n_events"))
    e.groupBy(col("entry_kind"), col("exit_kind"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1L, 1L).otherwise(0L))
          .as("n_bounce"))
  }

  /** Most-travelled k-step journeys: sliding windows of `steps`
    * consecutive event types per user (the order-(k−1) extension of
    * [[transitionMatrix]]'s bigrams) ranked by frequency — "what do
    * the common paths through the product look like". One
    * user-partitioned lead window builds the step tuple, a
    * path-sized aggregation counts it, top-k is per-partition heaps.
    * Returns `(step_1 … step_k, n)` for the `topK` commonest paths
    * (ties: path order).
    */
  def topJourneys(events: DataFrame, steps: Int = 3, topK: Int = 20,
      userCol: String = "user_id", kindCol: String = "event_type",
      tsCol: String = "ts", idCol: String = "event_id"): DataFrame = {
    require(steps >= 2 && steps <= 6, s"steps in [2,6], got $steps")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("_u"))
      .orderBy(col(tsCol), col(idCol))
    val stepCols = (1 until steps).map(i =>
      lead(col("step_1"), i).over(w).as(s"step_${i + 1}"))
    val paths = events
      .select(col(userCol).as("_u"), col(kindCol).as("step_1"),
        col(tsCol), col(idCol))
      .select(col("_u") +: col("step_1") +: stepCols: _*)
      .filter(col(s"step_$steps").isNotNull)
    val names = (1 to steps).map(i => col(s"step_$i"))
    paths.groupBy(names: _*).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc +: names: _*)
      .limit(topK)
  }

  /** Pairwise association rules over per-user event-type baskets —
    * the market-basket support/confidence/lift report ("users who do
    * A also do B") driving feature cross-sell and funnel-design
    * questions. Baskets are DISTINCT (user, kind) rows, pairs form by
    * a per-user self-join (fan-out bounded by the kind cardinality
    * squared — event vocabularies are small by construction; cap or
    * bucket baskets first for high-cardinality item domains), and
    * every metric is integer counts + ONE division
    * (`lift = n_ab·N / (n_a·n_b)`), so the full rule table replays
    * exactly (q181).
    *
    * Returns one row per unordered kind pair:
    * `(kind_a, kind_b, n_a, n_b, n_ab, n_users, support, conf_a_b,
    * conf_b_a, lift)`.
    */
  def associationRules(events: DataFrame,
      userCol: String = "user_id",
      kindCol: String = "event_type"): DataFrame = {
    val basket = events
      .select(col(userCol).as("_u"), col(kindCol).as("_k"))
      .distinct().persist()
    val nUsers = basket.select(col("_u")).distinct()
      .agg(count(lit(1)).as("n_users"))
    val single = basket.groupBy(col("_k"))
      .agg(count(lit(1)).as("_c"))
    val pairs = basket
      .join(basket.select(col("_u"), col("_k").as("_k2")), Seq("_u"))
      .filter(col("_k") < col("_k2"))
      .groupBy(col("_k").as("kind_a"), col("_k2").as("kind_b"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(single.select(col("_k").as("kind_a"), col("_c").as("n_a")),
        Seq("kind_a"))
      .join(single.select(col("_k").as("kind_b"), col("_c").as("n_b")),
        Seq("kind_b"))
      .crossJoin(broadcast(nUsers))
      .select(col("kind_a"), col("kind_b"), col("n_a"), col("n_b"),
        col("n_ab"), col("n_users"),
        round(col("n_ab").cast("double") /
          col("n_users").cast("double"), 6).as("support"),
        round(col("n_ab").cast("double") / col("n_a").cast("double"),
          6).as("conf_a_b"),
        round(col("n_ab").cast("double") / col("n_b").cast("double"),
          6).as("conf_b_a"),
        round((col("n_ab") * col("n_users")).cast("double") /
          (col("n_a") * col("n_b")).cast("double"), 6).as("lift"))
  }

  /** Seasonality-adjusted value anomalies: build the (day-of-week ×
    * hour) mean-value profile, then surface the events farthest from
    * their slot's mean — the screen that catches "normal for 3am
    * Sunday, wild for 2pm Tuesday" where a global outlier cut
    * ([[graft.operators.Relational.robustOutliers]]) sees nothing.
    *
    * Calendar slots derive from floor-cast epoch seconds with pure
    * integer arithmetic (`dow = (day + 4) mod 7`, Sunday = 0; no
    * engine/timezone `dayofweek` semantics anywhere), values snap to
    * exact micro-units, and each residual is
    * `(v·n − Σv) / n` — one BIGINT numerator and one division — so
    * the report replays exactly (q175). Top-k is per-partition heaps
    * on `(|resid| desc, id)`.
    *
    * Returns `(id, dow, hour, n_slot, resid, abs_resid)`.
    */
  def seasonalAnomalies(events: DataFrame,
      valueCol: String = "value", tsCol: String = "ts",
      idCol: String = "event_id", topK: Int = 20): DataFrame = {
    val sec = col(tsCol).cast("long")
    val base = events.select(col(idCol).as("id"),
      round(col(valueCol) * lit(1000000.0)).cast("long").as("_vm"),
      pmod(floor(sec / lit(86400)) + 4, lit(7)).as("dow"),
      floor(pmod(sec, lit(86400)) / lit(3600)).as("hour"))
    val prof = base.groupBy(col("dow"), col("hour"))
      .agg(count(lit(1)).as("n_slot"), sum(col("_vm")).as("_sum"))
    base.join(prof, Seq("dow", "hour"))
      .select(col("id"), col("dow"), col("hour"), col("n_slot"),
        (col("_vm") * col("n_slot") - col("_sum")).as("_rn"))
      .select(col("id"), col("dow"), col("hour"), col("n_slot"),
        round(col("_rn").cast("double") / col("n_slot") /
          lit(1000000.0), 6).as("resid"),
        round(abs(col("_rn")).cast("double") / col("n_slot") /
          lit(1000000.0), 6).as("abs_resid"))
      .orderBy(col("abs_resid").desc, col("id"))
      .limit(topK)
  }

  /** Per-user inter-arrival burstiness (Goh & Barabási 2008):
    * `B = (σ − μ) / (σ + μ)` over the gaps between a user's
    * consecutive events — periodic schedules → −1, Poisson arrivals
    * → 0, bursty humans → +1, making the tails a scripted-traffic /
    * bot screen from timestamps alone.
    *
    * Gateable by construction: gaps are integer SECONDS (timestamp
    * floor-cast), their sum and sum-of-squares are exact BIGINTs, and
    * with `n·σ = sqrt(n·Σg² − (Σg)²)` and `n·μ = Σg` the score
    * collapses to ONE sqrt of an exact integer and ONE division:
    * `B = (sqrt(n·Σg² − (Σg)²) − Σg) / (sqrt(n·Σg² − (Σg)²) + Σg)`
    * — the linearFit discipline. NULL below 2 gaps or for all-zero
    * gaps (σ + μ = 0).
    *
    * Scale shape: one user-partitioned lag window, then a per-user
    * aggregation — event volume leaves at the groupBy; no
    * partition-less anything. Returns
    * `(user, n_gaps, sum_gap_s, sum_gap2, burstiness)`.
    */
  def burstiness(events: DataFrame,
      userCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user"))
      .orderBy(col(tsCol), col(idCol))
    val gaps = events
      .select(col(userCol).as("user"), col(tsCol),
        col(tsCol).cast("long").as("_s"), col(idCol))
      .withColumn("_gap", col("_s") - lag(col("_s"), 1).over(w))
      .filter(col("_gap").isNotNull)
    val ag = gaps.groupBy(col("user"))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("_gap")).as("sum_gap_s"),
        sum(col("_gap") * col("_gap")).as("sum_gap2"))
    val nSig = sqrt((col("n_gaps") * col("sum_gap2") -
      col("sum_gap_s") * col("sum_gap_s")).cast("double"))
    ag.select(col("user"), col("n_gaps"), col("sum_gap_s"),
      col("sum_gap2"),
      round(when(col("n_gaps") < 2 ||
          (col("sum_gap_s") === 0 && col("sum_gap2") === 0),
          lit(null).cast("double"))
        .otherwise((nSig - col("sum_gap_s").cast("double")) /
          (nSig + col("sum_gap_s").cast("double"))), 6)
        .as("burstiness"))
  }

  /** Cohort retention: users grouped by first-seen UTC day (their
    * cohort), then for every later day the fraction of the cohort
    * still active — the engagement decay curve behind every "day-N
    * retention" dashboard. Returns
    * `(cohort_day, day_offset, n_active, retention)` with days as
    * epoch-day numbers and retention rounded to 6 decimals.
    *
    * Scale shape: distinct (user, day) activity collapses first
    * (map-side combine takes the event volume out), the user-count-
    * sized first-seen table joins back by user (hash equi-join), and
    * the final (cohort, offset) aggregation is report-sized. No
    * windows; integer day arithmetic and one rounded division replay
    * exactly.
    */
  def retention(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame =
    retentionFromActivity(dailyActivity(events, userCol, tsCol))

  /** The collapsed activity grain retention is computed from: distinct
    * `(_u, _day)` rows (epoch days). This is also [[StreamingFunnel]]'s
    * sibling state table — order-free and idempotent under union, so
    * an incremental pipeline ([[StreamingRetention]]) maintains it
    * exactly.
    */
  def dailyActivity(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame =
    normalizeTs(events, tsCol)
      // null users/timestamps carry no activity; dropping them here
      // (rather than at the cohort join) keeps incremental state
      // (StreamingRetention) from accumulating unmatched null rows
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("_u"),
        floor(col(tsCol).cast("long") / 86400L).cast("long").as("_day"))
      .distinct()

  /** Retention report over a `(_u, _day)` activity table — the shared
    * tail of the batch [[retention]] and [[StreamingRetention.report]].
    */
  def retentionFromActivity(ev: DataFrame): DataFrame = {
    val cohort = ev.groupBy(col("_u"))
      .agg(min(col("_day")).as("cohort_day"))
    val sizes = cohort.groupBy(col("cohort_day"))
      .agg(count(lit(1)).as("_size"))
    ev.join(cohort, Seq("_u"))
      .groupBy(col("cohort_day"),
        (col("_day") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), Seq("cohort_day"))
      .select(col("cohort_day"), col("day_offset"), col("n_active"),
        round(col("n_active").cast("double") /
          col("_size").cast("double"), 6).as("retention"))
  }

  /** Sliding-window aggregation: events per (user, window) where
    * windows of `width` advance every `slide` — each event lands in
    * `width/slide` overlapping epoch-aligned windows (the
    * moving-average / rate-limit view q23's tumbling windows cannot
    * express). Same shape as [[tumblingAgg]]: one shuffle on
    * (user, window) with map-side partials; the `width/slide`-way
    * row replication happens in the scan stage (Spark's `window()`
    * Expand), bounded by the overlap factor.
    */
  def slidingAgg(events: DataFrame, width: String = "2 hours",
      slide: String = "30 minutes"): DataFrame =
    normalizeTs(events)
      .groupBy(col("user_id"), window(col("ts"), width, slide).as("w"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"),
        unix_timestamp(col("w.start")).as("window_start"),
        col("n_events"), col("sum_value"))

  /** Ordered funnel analysis: how many users complete each prefix of
    * `stages` IN ORDER. With no conversion window (`maxGapMinutes =
    * None`) the chain is greedy-earliest — stage i's timestamp is the
    * user's earliest `stages(i)` event STRICTLY AFTER their stage i−1
    * timestamp — which is EXACT for unbounded funnels (an exchange
    * argument: the earliest chain dominates any other). With a window
    * set, greedy-earliest undercounts (a user whose earliest stage-i−1
    * hit falls outside the gap may still convert off a later one), so
    * the gap flavor keeps ALL qualifying stage timestamps per user —
    * any-chain semantics, matching standard funnel tools. Returns one
    * row per stage (zero-user stages included):
    * `(stage_idx, stage, n_users, conversion)` with conversion the
    * fraction of stage-0 completers still present.
    *
    * Scale shape: one filtered aggregation per stage over the events
    * scan — stage i filters to its event type, joins the stage-i−1
    * user table (user-count-sized, hash equi-join; the gap flavor
    * joins through the bin-bucketed [[graft.operators.Relational.rangeJoin]]
    * so a whale user pairs stage events only with gap-window
    * neighbors, never with their whole history), and collapses per
    * user with map-side partials. No windows, no per-user event
    * sorting; a whale user costs its event count in a hash aggregate,
    * not a sort buffer. Stage count bounds plan depth (funnels are 3-6
    * stages). The whole funnel is ONE LAZY PLAN — per-stage counts
    * come from a tagged union through a single `groupBy(stage)`
    * aggregation, not a driver `count()` per stage, so executing the
    * result is one action (AQE reuses the shared stage subtrees).
    */
  def funnel(events: DataFrame, stages: Seq[String],
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts", maxGapMinutes: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(maxGapMinutes.forall(_ > 0), "maxGapMinutes must be positive")
    val ev = normalizeTs(events, tsCol)
      // countDistinct has always excluded null users; filtering them
      // up front keeps the stage tables (and StreamingFunnel's state,
      // which counts rows) aligned with that
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("_u"), col(typeCol).as("_ty"),
        col(tsCol).cast("long").as("_ts"))
    // min-only per user is exact without a gap and keeps stage tables
    // one-row-per-user; the gap flavor needs every qualifying timestamp
    val keepAll = maxGapMinutes.isDefined
    def collapse(df: DataFrame): DataFrame =
      if (keepAll) df.select(col("_u"), col("_ts").as("_t")).distinct()
      else df.groupBy(col("_u")).agg(min(col("_ts")).as("_t"))
    val stage0 = collapse(ev.filter(col("_ty") === stages.head))
    val reached = stages.drop(1).scanLeft(stage0) { (prev, stage) =>
      val evs = ev.filter(col("_ty") === stage)
      val matched = maxGapMinutes match {
        case Some(m) =>
          // conversion window (stage i within maxGap of SOME stage-i−1
          // timestamp): a plain user equi-join would pair every stage
          // event with every kept prior timestamp — quadratic for a
          // whale user. The bin-bucketed range join bounds candidates
          // to gap-window neighbors: prev becomes the interval
          // [t+1, t+gap] (integer seconds, so inclusive bounds are the
          // strict-after/within-gap test exactly)
          graft.operators.Relational.rangeJoin(evs,
            prev.select(col("_u"), (col("_t") + 1L).as("_lo"),
              (col("_t") + m * 60L).as("_hi")),
            Seq("_u"), "_ts", "_lo", "_hi", binWidth = m * 60L)
        case None =>
          evs.join(prev.select(col("_u"), col("_t").as("_tp")), Seq("_u"))
            .filter(col("_ts") > col("_tp"))
      }
      collapse(matched)
    }
    val tagged = reached.zip(stages.zipWithIndex).map {
      case (frame, (_, i)) =>
        frame.select(lit(i).as("stage_idx"), col("_u"))
    }
    val counts = tagged.reduce(_.unionByName(_))
      .groupBy(col("stage_idx"))
      .agg(countDistinct(col("_u")).as("_n"))
    funnelReport(events.sparkSession, counts, stages)
  }

  /** Per-stage time-to-convert PERCENTILES over the funnel's
    * greedy-earliest chain — the question every funnel user asks right
    * after the counts: for users who reached stage i, how long did
    * stage (i−1) → i take? Reports p50/p90 of the gap in seconds per
    * converting stage, estimated from a [[graft.operators.Relational
    * .bottomKSample]] sketch (k smallest-hash users per stage, gap
    * carried VERBATIM — the q104/q120 discipline, so estimates replay
    * bit-exact in an external engine; error is the usual O(1/√k)
    * sample-quantile band).
    *
    * Chain semantics: stage times are the no-gap greedy-earliest chain
    * (min qualifying timestamp per user per stage — identical to
    * [[funnel]] without `maxGapMinutes`, so `n_converted` equals its
    * `n_users`); the stage-(i−1) time is carried through the stage-i
    * aggregation, so gaps need no re-join against earlier stages.
    *
    * Scale shape: one filtered scan + user equi-join + min-aggregation
    * per stage (stage count is small and fixed), then ONE bounded-state
    * sketch aggregation per stage — no windows, no per-user sorts, no
    * driver materialization. Output (stage 0 has no gap; zero-converter
    * stages report 0/NULL):
    * `(stage_idx, stage, n_converted, m, p50_gap_sec, p90_gap_sec)`.
    */
  def funnelLatency(events: DataFrame, stages: Seq[String],
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts", k: Int = 256): DataFrame = {
    require(stages.size >= 2, "funnelLatency needs at least two stages")
    require(k > 0, s"sample size k must be positive, got $k")
    val spark = events.sparkSession
    val ev = normalizeTs(events, tsCol)
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("_u"), col(typeCol).as("_ty"),
        col(tsCol).cast("long").as("_ts"))
    val stage0 = ev.filter(col("_ty") === stages.head)
      .groupBy(col("_u")).agg(min(col("_ts")).as("_t"))
      .withColumn("_tp", lit(null).cast("long"))
    val reached = stages.drop(1).scanLeft(stage0) { (prev, stage) =>
      ev.filter(col("_ty") === stage)
        .join(prev.select(col("_u"), col("_t").as("_pv")), Seq("_u"))
        .filter(col("_ts") > col("_pv"))
        .groupBy(col("_u"))
        // _pv is one row per user (prev stage is user-grained), so min
        // is just "the" value — but keeps the agg oracle-replayable
        .agg(min(col("_ts")).as("_t"), min(col("_pv")).as("_tp"))
    }
    val gaps = reached.zipWithIndex.drop(1).map { case (frame, i) =>
      frame.select(lit(i).as("stage_idx"), col("_u"),
        (col("_t") - col("_tp")).cast("double").as("_gap"))
    }.reduce(_.unionByName(_))
    latencyFromGaps(spark, gaps, stages, k)
  }

  /** Shared report tail of [[funnelLatency]] and
    * [[StreamingFunnel.latencyReport]]: per-stage (user, gap) rows →
    * the sketch-quantile report. `gaps` carries
    * `(stage_idx, _u, _gap: double)`; the sample hash is
    * md5-deterministic over (stage_idx, user) — the q104 row-key
    * discipline — so batch and streaming flavors (and the SQL oracle)
    * sample IDENTICAL users and the estimates agree bit-for-bit.
    */
  private[streaming] def latencyFromGaps(
      spark: org.apache.spark.sql.SparkSession, gaps: DataFrame,
      stages: Seq[String], k: Int): DataFrame = {
    import spark.implicits._
    val dim = stages.zipWithIndex.drop(1).map { case (s, i) => (i, s) }
      .toDF("stage_idx", "stage")
    val agg = gaps
      .select(col("stage_idx"),
        graft.text.TextOps.hash32(
          concat_ws(":", col("stage_idx"), col("_u"))).as("_h"),
        col("_gap"))
      .groupBy(col("stage_idx"))
      .agg(count(lit(1)).as("n_converted"),
        graft.operators.Relational.bottomKSample(col("_h"), col("_gap"),
          k).as("_sk"))
      .select(col("stage_idx"), col("n_converted"),
        size(col("_sk")).as("m"),
        graft.operators.Relational.sampleQuantile(col("_sk"), 0.5)
          .as("p50_gap_sec"),
        graft.operators.Relational.sampleQuantile(col("_sk"), 0.9)
          .as("p90_gap_sec"))
    dim.join(agg, Seq("stage_idx"), "left")
      .select(col("stage_idx"), col("stage"),
        coalesce(col("n_converted"), lit(0L)).as("n_converted"),
        coalesce(col("m"), lit(0)).as("m"),
        col("p50_gap_sec"), col("p90_gap_sec"))
  }

  /** Shared report tail of the batch funnel and [[StreamingFunnel]]:
    * per-stage user counts (`(stage_idx, _n)`) → the
    * `(stage_idx, stage, n_users, conversion)` frame, zero-user stages
    * included via the stage dimension, conversion off an always-1-row
    * stage-0 base (a filter would yield ZERO rows on an empty funnel
    * and erase the output through the cross join).
    */
  private[streaming] def funnelReport(
      spark: org.apache.spark.sql.SparkSession, counts: DataFrame,
      stages: Seq[String]): DataFrame = {
    import spark.implicits._
    val base = counts.agg(coalesce(
      sum(when(col("stage_idx") === 0, col("_n"))), lit(0L)).as("_base"))
    val dim = stages.zipWithIndex.map { case (s, i) => (i, s) }
      .toDF("stage_idx", "stage")
    val n = coalesce(col("_n"), lit(0L))
    dim.join(counts, Seq("stage_idx"), "left")
      .crossJoin(broadcast(base))
      .select(col("stage_idx"), col("stage"), n.as("n_users"),
        when(col("_base") === 0L, lit(0.0)).otherwise(
          round(n.cast("double") / col("_base").cast("double"), 6))
          .as("conversion"))
  }

  /** First-/last-touch attribution: for every conversion event, which
    * touch (ad view, click, …) within the lookback window gets the
    * credit — first-touch credits the touch that STARTED the journey,
    * last-touch the one that closed it. The question every
    * funnel/retention consumer asks next, and the two models that
    * bracket all the fractional schemes (linear, time-decay) built
    * from the same pair table.
    *
    * Returns one row per conversion: `(conv_id, user_id, first_touch,
    * last_touch)` — touch types, NULL when no touch preceded the
    * conversion inside the window (the "organic" bucket every
    * attribution report needs).
    *
    * Scale shape: candidate pairs come from the bin-bucketed
    * [[graft.operators.Relational.rangeJoin]] (bins of `binWidthSec`),
    * NOT a per-user cross join — a whale user's fanout is bounded by
    * touches-per-lookback-window, never their lifetime history. Picks
    * are `min_by`/`max_by` over a zero-padded `(micros, event_id)`
    * string key: total, unique (event ids), engine-portable — no
    * window function, no tie ambiguity (q139 replays it in SQL with
    * `arg_min`/`arg_max` on the identical key).
    */
  def touchAttribution(
      events: DataFrame,
      touchTypes: Seq[String],
      convType: String,
      lookbackSec: Long,
      binWidthSec: Long = 86400L): DataFrame = {
    require(touchTypes.nonEmpty, "touchTypes must be non-empty")
    require(lookbackSec > 0, "lookbackSec must be positive")
    val touches = events
      .filter(col("event_type").isin(touchTypes: _*))
      .select(col("user_id"),
        unix_micros(col("ts")).as("touch_us"),
        col("event_id").as("touch_id"),
        col("event_type").as("touch_type"))
    val convs = events
      .filter(col("event_type") === convType)
      .select(col("user_id"), col("event_id").as("conv_id"),
        unix_micros(col("ts")).as("conv_us"))
      .withColumn("lo_us", col("conv_us") - lit(lookbackSec * 1000000L))
    val pairs = graft.operators.Relational
      .rangeJoin(
        touches.withColumn("_ts_sec", col("touch_us")),
        convs.withColumn("_lo_sec", col("lo_us"))
          .withColumn("_hi_sec", col("conv_us")),
        Seq("user_id"), "_ts_sec", "_lo_sec", "_hi_sec",
        binWidthSec * 1000000L)
      .drop("_ts_sec", "_lo_sec", "_hi_sec")
    val key = concat(
      lpad(col("touch_us").cast("string"), 20, "0"), lit(":"),
      lpad(col("touch_id").cast("string"), 20, "0"))
    val picks = pairs.groupBy("conv_id")
      .agg(min_by(col("touch_type"), key).as("first_touch"),
        max_by(col("touch_type"), key).as("last_touch"))
    convs.select(col("conv_id"), col("user_id"))
      .join(picks, Seq("conv_id"), "left")
  }

  /** Gap-filled daily resampling: one row per (user, day) across each
    * user's own active span, zero-filled where no events — the
    * regularized grid every time-series computation (EWMA, anomaly
    * windows, retention curves) needs first; without it, silent
    * missing days bias every moving statistic. `sequence(d0, d1)`
    * explodes per user (fan-out = span days), so cost is
    * user-partitioned and bounded by calendar span, not event count.
    */
  def resampleDaily(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val grid = daily.groupBy("user_id")
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
    grid.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
  }

  /** Per-user EWMA of daily event counts over the gap-filled series:
    * `s_1 = x_1; s_t = s_{t-1}·(1−α) + x_t·α` folded in day order —
    * a fixed IEEE chain (the q67 discipline), so the smoothed level
    * hash-gates (q157). Returns one row per user with the final
    * smoothed level, the span, and the last day — the screening
    * signal for "activity trending away from its average". The
    * per-user `collect_list` is bounded by calendar span (days, not
    * events); per-day running output would use the same fold over
    * prefixes when needed.
    */
  def ewmaDaily(events: DataFrame, alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0,
      s"alpha must be in (0, 1), got $alpha")
    val rs = resampleDaily(events)
    val xs = array_sort(collect_list(struct(col("day"),
      col("n_events").cast("double").as("x"))))
    rs.groupBy("user_id")
      .agg(xs.as("xs"))
      .select(col("user_id"),
        size(col("xs")).as("n_days"),
        element_at(col("xs"), -1).getField("day").as("last_day"),
        round(aggregate(
          slice(col("xs"), lit(2),
            greatest(size(col("xs")) - 1, lit(0))),
          element_at(col("xs"), 1).getField("x"),
          (acc, e) => acc * lit(1.0 - alpha) +
            e.getField("x") * lit(alpha)), 6).as("ewma"))
  }

  /** CUPED variance-reduced A/B readout (Deng et al., WSDM 2013): the
    * experiment metric per variant, adjusted by each user's PRE-period
    * covariate — mean_adj = mean_y − θ·(mean_x − mean_x_all), θ =
    * cov(x,y)/var(x). Per-user sums are milli-int (exact, order-free);
    * the moment aggregates run in decimal(38,0) (DuckDB's HUGEINT
    * twin), so θ and the adjusted means derive from identical integer
    * values through single mirrored IEEE chains. Cost: one events
    * pass, one per-user groupBy, a G-row variant table, a broadcast
    * 1-row moment join — nothing else scales with user count.
    *
    * `y` = milli-value of `convKind` events at/after `splitSec`
    * (epoch); `x` = milli-value of ALL events before it; variant =
    * `user_id` parity.
    */
  def cuped(
      events: DataFrame, splitSec: Long,
      convKind: String = "purchase"): DataFrame = {
    val ev = events
      .select(col("user_id"),
        unix_timestamp(col("ts")).as("_tse"),
        col("event_type"),
        round(col("value") * lit(1000.0)).cast("long").as("_vm"))
    val users = ev.groupBy(col("user_id")).agg(
      coalesce(sum(when(col("_tse") < splitSec, col("_vm"))
        .otherwise(lit(0L))), lit(0L)).as("_x"),
      coalesce(sum(when(col("_tse") >= splitSec &&
        col("event_type") === convKind, col("_vm"))
        .otherwise(lit(0L))), lit(0L)).as("_y"))
    val dec = "decimal(38,0)"
    val g = users.agg(
      count(lit(1)).cast(dec).as("_n"),
      sum(col("_x").cast(dec)).as("_sx"),
      sum(col("_y").cast(dec)).as("_sy"),
      sum(col("_x").cast(dec) * col("_y").cast(dec)).as("_sxy"),
      sum(col("_x").cast(dec) * col("_x").cast(dec)).as("_sxx"))
    val byVar = users
      .groupBy((col("user_id") % 2).as("variant"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("_x")).as("sum_x_milli"),
        sum(col("_y")).as("sum_y_milli"))
    val num = (col("_n") * col("_sxy") - col("_sx") * col("_sy"))
      .cast("double")
    val den = (col("_n") * col("_sxx") - col("_sx") * col("_sx"))
      .cast("double")
    val theta = when(den === 0.0, lit(0.0)).otherwise(num / den)
    val meanXAll = col("_sx").cast("double") / col("_n").cast("double")
    val meanY = col("sum_y_milli").cast("double") /
      col("n_users").cast("double")
    val meanX = col("sum_x_milli").cast("double") /
      col("n_users").cast("double")
    byVar.crossJoin(broadcast(g))
      .select(col("variant"), col("n_users"),
        col("sum_x_milli"), col("sum_y_milli"),
        round(theta, 6).as("theta"),
        round(meanY, 6).as("mean_y_milli"),
        round(meanY - theta * (meanX - meanXAll), 6)
          .as("mean_adj_milli"))
  }
}
