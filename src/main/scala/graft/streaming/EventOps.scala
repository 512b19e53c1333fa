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
  def normalizeTs(events: DataFrame): DataFrame =
    events.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        events.withColumn("ts", timestamp_micros(expr("ts div 1000")))
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

  /** Batch sessionization: a session breaks after `gapMinutes` of
    * inactivity per user. Window functions shuffle once on user_id and
    * sort within; per-user event counts are bounded in practice (and a
    * salted two-level variant exists for whale users — not needed here).
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

  /** JSON props access (`get_json_object` — no parsing UDF). */
  def propInt(events: DataFrame, key: String, as: String): DataFrame =
    events.withColumn(as,
      get_json_object(col("props"), s"$$.$key").cast("int"))

  /** Per-type daily counts — the monitoring rollup. */
  def dailyTypeCounts(events: DataFrame): DataFrame =
    normalizeTs(events)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
}
