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

  /** Side normalization (`app/main.py:97-107`): the ball gets the "ball"
    * label; every other row keeps its raw lower-cased team/side value
    * (home, away, offense, defense, or a club code). The reference only
    * *tests* these labels — it never maps offense→home — and in 2026-vintage
    * data side-of-ball and home/away are independent axes, so conflating
    * them would mislabel; callers that want home/away map it themselves.
    */
  def side: Column = {
    val t = lower(col("team").cast("string"))
    when(isBall, "ball").otherwise(coalesce(t, lit("unknown")))
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
    * One distributive pass — works grouped over the whole pool. Column
    * names are parameterized so the identical aggregation shape runs over
    * the driver gate tables (SparkEntry q05).
    */
  def telemetry(
      pool: DataFrame,
      keyCols: Seq[String] = Seq("gameId", "playId"),
      frameCol: String = "frameId",
      speedCol: String = "s",
      entityCol: String = "nflId",
      eventCol: String = "event"): DataFrame =
    pool.groupBy(keyCols.map(col): _*).agg(
      max(frameCol).as("total_frames"),
      max(speedCol).as("max_speed"),
      // distinct entities per play are bounded (≤ 23) → a collect_set is
      // cheaper than countDistinct's extra aggregation phase; cast keeps
      // the countDistinct-compatible long schema
      size(collect_set(entityCol)).cast("long").as("n_players"),
      array_sort(collect_set(eventCol)).as("events"),
      (max(frameCol) / 10.0).as("duration_sec"))

  /** Entity split with the normalized side label (home / away / ball). */
  def withSide(play: DataFrame): DataFrame =
    play.withColumn("entitySide", side)

  /** Per-entity frame-ordered (x, y) path (`app/main.py:136-149`).
    * `sort_array(collect_list(struct(...)))` orders by the leading
    * order field without a window shuffle-and-sort per row. One hash
    * aggregation with map-side partials; per-group size is bounded
    * (≤ a few hundred frames), so no skew cliff at scale.
    */
  def trajectories(
      pool: DataFrame,
      keyCols: Seq[String] = Seq("gameId", "playId", "nflId"),
      orderCol: String = "frameId",
      featCols: Seq[String] = Seq("x", "y")): DataFrame =
    pool.groupBy(keyCols.map(col): _*)
      .agg(sort_array(
        collect_list(struct((orderCol +: featCols).map(col): _*)))
        .as("path"))

  /** Trajectories flattened back to one row per step with its 0-based
    * position — the oracle-checkable rendering of [[trajectories]].
    */
  def trajectoriesFlat(
      pool: DataFrame,
      keyCols: Seq[String] = Seq("gameId", "playId", "nflId"),
      orderCol: String = "frameId",
      featCols: Seq[String] = Seq("x", "y")): DataFrame = {
    val t = trajectories(pool, keyCols, orderCol, featCols)
    val stepCols = (orderCol +: featCols).map(f => col(s"step.$f").as(f))
    t.select(keyCols.map(col) :+ posexplode(col("path")): _*)
      .withColumnRenamed("col", "step")
      .select(keyCols.map(col) ++ (col("pos") +: stepCols): _*)
  }

  /** One animation frame (`app/main.py:163-167`). */
  def frameSlice(play: DataFrame, frameId: Int): DataFrame =
    play.filter(col("frameId") === frameId)

  /** Distinct frame ids of a play (`app/main.py:109`). */
  def frames(play: DataFrame): DataFrame =
    play.select("frameId").distinct().orderBy("frameId")
}
