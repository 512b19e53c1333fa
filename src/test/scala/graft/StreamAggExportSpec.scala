package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Export
import graft.streaming.EventOps

/** Structured-Streaming twin of the tumbling aggregation (watermark +
  * append mode over a MemoryStream) and the CSV export sink round-trip.
  */
class StreamAggExportSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming tumbling agg emits closed windows under the watermark") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val events = mem.toDF().toDF("user_id", "ts", "value")

    val query = EventOps.tumblingAggStream(events, "1 hour", "2 hours")
      .writeStream.format("memory").queryName("tumbling")
      .outputMode("append").start()
    try {
      mem.addData(
        (7L, ts("2024-01-01 10:00:00"), 1.0),
        (7L, ts("2024-01-01 10:30:00"), 2.0),
        (8L, ts("2024-01-01 10:45:00"), 4.0))
      query.processAllAvailable()
      // advance event time far past the watermark so hour 10 closes
      mem.addData((7L, ts("2024-01-01 15:00:00"), 8.0))
      query.processAllAvailable()

      val rows = spark.table("tumbling").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("window_start")) ->
          (r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toMap
      val h10 = ts("2024-01-01 10:00:00").getTime / 1000
      assert(rows((7L, h10)) == (2L, 3.0))
      assert(rows((8L, h10)) == (1L, 4.0))
    } finally query.stop()
  }

  test("CSV export round-trip: canonical sort, single header file") {
    val out = tmpDir("export")
    val df = SyntheticTracking.df(spark, games = 1, plays = 1, frames = 5)
    Export.csvSingle(df, out)
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".csv"))
    assert(files.length == 1) // coalesced single shard
    val back = spark.read.option("header", "true").csv(out)
    assert(back.count() == 5L * 23)
    assert(back.columns.contains("gameId"))
  }
}
