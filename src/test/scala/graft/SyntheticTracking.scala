package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Fully-known synthetic tracking fixture, same shape as the reference's
  * dummy generator (SURVEY.md §5.3 / FIXTURES.md §3): `games` games ×
  * `plays` plays × `frames` frames × 23 entities (11 home + 11 away + ball
  * with null nflId), event "pass_forward" exactly at frame 25, constant
  * physics values, gameIds 2023090000+g, playIds (p+1)*50.
  */
object SyntheticTracking {

  val schema: StructType = StructType(Seq(
    StructField("gameId", LongType), StructField("playId", IntegerType),
    StructField("nflId", IntegerType), StructField("frameId", IntegerType),
    StructField("time", StringType),
    StructField("playDirection", StringType),
    StructField("event", StringType), StructField("team", StringType),
    StructField("x", FloatType), StructField("y", FloatType),
    StructField("s", FloatType), StructField("a", FloatType),
    StructField("dis", FloatType), StructField("o", FloatType),
    StructField("dir", FloatType), StructField("position", StringType),
    StructField("route", StringType)))

  def rows(games: Int = 2, plays: Int = 5, frames: Int = 50): Seq[Row] =
    for {
      g <- 0 until games
      p <- 0 until plays
      f <- 1 to frames
      e <- 0 until 23
    } yield {
      val gameId = 2023090000L + g
      val playId = (p + 1) * 50
      val isBall = e == 22
      val nflId: Integer = if (isBall) null else Int.box(40000 + e)
      val team = if (isBall) "football" else if (e < 11) "home" else "away"
      val event = if (f == 25) "pass_forward" else null
      val x = 10.0f + f * 0.5f + e * 0.1f
      val y = 20.0f + e * 1.0f
      Row(gameId, Int.box(playId), nflId, Int.box(f),
        f"2023-09-07T20:00:${f % 60}%02d.000Z",
        "left", event, team, x, y, 5.5f, 2.1f, 0.1f,
        if (isBall) null else 90.0f, if (isBall) null else 90.0f,
        if (isBall) null else "WR", if (isBall || e >= 11) null else "GO")
    }

  def df(spark: SparkSession, games: Int = 2, plays: Int = 5,
      frames: Int = 50): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows(games, plays, frames), 4), schema)

  /** CSV with 2018-vintage camelCase headers + two undeclared columns
    * (displayName, jerseyNumber) to exercise ingest's drop path.
    */
  def writeCsv2018(spark: SparkSession, dir: String, games: Int = 1,
      plays: Int = 2, frames: Int = 10): Unit =
    df(spark, games, plays, frames)
      .withColumn("displayName",
        org.apache.spark.sql.functions.lit("Player X"))
      .withColumn("jerseyNumber", org.apache.spark.sql.functions.lit(10))
      .coalesce(1)
      .write.option("header", "true").mode("overwrite").csv(dir)

  /** CSV with 2026-vintage snake_case headers. */
  def writeCsv2026(spark: SparkSession, dir: String, games: Int = 1,
      plays: Int = 2, frames: Int = 10): Unit = {
    val base = df(spark, games, plays, frames)
    val renames = Map(
      "gameId" -> "game_id", "playId" -> "play_id", "nflId" -> "nfl_id",
      "frameId" -> "frame_id", "playDirection" -> "play_direction",
      "team" -> "player_side", "position" -> "player_position")
    val renamed = renames.foldLeft(base) { case (d, (from, to)) =>
      d.withColumnRenamed(from, to)
    }
    renamed.coalesce(1)
      .write.option("header", "true").mode("overwrite").csv(dir)
  }
}
