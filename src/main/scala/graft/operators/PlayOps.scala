package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Play-level semantics the reference app layer implements over collected
  * frames (SURVEY.md §2.5 A7, §2.8 T2/T3, §3.3; reference
  * `/root/reference/app/main.py`). Here they are engine operators: pure
  * DataFrame transforms that aggregate distributively, so the same code
  * serves one play interactively and every play in a 100 TB pool as one job.
  */
object PlayOps {

  /** Ball row rule (`app/main.py:104-106`, `docs/DATA_LAKE_GUIDE.md:144-152`):
    * null nflId, nflId == 0, or team literally "football".
    */
  def isBall: Column =
    col("nflId").isNull || col("nflId") === 0 ||
      lower(col("team").cast("string")) === "football"

  /** Side normalization (`app/main.py:97-107`): string-normalized compare on
    * the team/side column; anything not home/away/offense/defense and not
    * the ball is kept as its own label.
    */
  def side: Column = {
    val t = lower(col("team").cast("string"))
    when(isBall, "ball")
      .when(t.isin("home", "offense"), "home")
      .when(t.isin("away", "defense"), "away")
      .otherwise(coalesce(t, lit("unknown")))
  }

  /** All frames of one play in animation order (`app/main.py:74-81`).
    * gameId is a partition column → partition pruning reads one directory.
    */
  def fetchPlay(pool: DataFrame, gameId: Long, playId: Int): DataFrame =
    pool.filter(col("gameId") === gameId && col("playId") === playId)
      .orderBy("frameId")

  /** Game dropdown (`app/main.py:49-52`). */
  def listGames(pool: DataFrame): DataFrame =
    pool.select("gameId").distinct().orderBy("gameId")

  /** Play dropdown for one game (`app/main.py:54-60`). */
  def listPlays(pool: DataFrame, gameId: Long): DataFrame =
    pool.filter(col("gameId") === gameId)
      .select("playId").distinct().orderBy("playId")

  /** Per-play telemetry block (`app/main.py:89-95,244`): frame count, max
    * speed, distinct players, distinct non-null events, duration at 10 fps.
    * One distributive pass — works grouped over the whole pool.
    */
  def telemetry(pool: DataFrame): DataFrame =
    pool.groupBy("gameId", "playId").agg(
      max("frameId").as("total_frames"),
      max("s").as("max_speed"),
      countDistinct("nflId").as("n_players"),
      array_sort(collect_set("event")).as("events"),
      (max("frameId") / 10.0).as("duration_sec"))

  /** Entity split with the normalized side label (home / away / ball). */
  def withSide(play: DataFrame): DataFrame =
    play.withColumn("entitySide", side)

  /** Per-entity frame-ordered (x, y) path (`app/main.py:136-149`).
    * `sort_array(collect_list(struct(...)))` orders by the leading
    * `frameId` field without a window shuffle-and-sort per row.
    */
  def trajectories(pool: DataFrame): DataFrame =
    pool.groupBy("gameId", "playId", "nflId")
      .agg(sort_array(
        collect_list(struct(col("frameId"), col("x"), col("y"))))
        .as("path"))

  /** One animation frame (`app/main.py:163-167`). */
  def frameSlice(play: DataFrame, frameId: Int): DataFrame =
    play.filter(col("frameId") === frameId)

  /** Distinct frame ids of a play (`app/main.py:109`). */
  def frames(play: DataFrame): DataFrame =
    play.select("frameId").distinct().orderBy("frameId")
}
