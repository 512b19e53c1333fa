package graft.schema

import org.apache.spark.sql.types._

/** Embedded wire-schema configs for the Big Data Bowl source vintages the
  * reference normalizes (SURVEY.md §1.2/§1.4; reference configs under
  * `/root/reference/configs/` and
  * `/root/reference/data/nfl-bdb/2026/schema.yaml`).
  *
  * Alias lists cover the three observed naming conventions: camelCase
  * (2018/2021 drops), snake_case (2023/2026 drops), and Capitalized
  * variants. These are Scala values, not YAML, so they compile to
  * `Seq[Column]` with zero runtime parsing; `SchemaConfig.parseYaml` exists
  * for user-supplied configs.
  */
object Vintages {
  private def c(
      name: String,
      dt: DataType,
      aliases: Seq[String] = Nil,
      default: Option[String] = None,
      allowNull: Boolean = false) =
    ColumnSpec(name, dt, aliases, default, allowNull)

  /** Canonical pool schema: the superset every vintage normalizes into.
    * Identifier and physics columns are required-or-defaulted; sparse
    * context columns are nullable.
    */
  val canonical: SchemaConfig = SchemaConfig(Seq(
    c("gameId", LongType, Seq("game_id", "GameId", "gameKey", "game_key")),
    c("playId", IntegerType, Seq("play_id", "PlayId")),
    c("nflId", IntegerType, Seq("nfl_id", "NflId"), allowNull = true),
    c("frameId", IntegerType, Seq("frame_id", "FrameId", "frame")),
    c("time", StringType, Seq("Time", "time_stamp"), allowNull = true),
    c("playDirection", StringType, Seq("play_direction", "PlayDirection"),
      allowNull = true),
    c("event", StringType, Seq("Event", "event_type"), allowNull = true),
    c("team", StringType, Seq("Team", "club", "player_side", "playerSide"),
      allowNull = true),
    c("x", FloatType, Seq("X")),
    c("y", FloatType, Seq("Y")),
    c("s", FloatType, Seq("S", "speed"), default = Some("0.0")),
    c("a", FloatType, Seq("A", "acceleration"), default = Some("0.0")),
    c("dis", FloatType, Seq("Dis", "distance"), default = Some("0.0")),
    c("o", FloatType, Seq("O", "orientation"), allowNull = true),
    c("dir", FloatType, Seq("Dir", "direction"), allowNull = true),
    c("position", StringType, Seq("player_position", "Position"),
      allowNull = true),
    c("route", StringType, Seq("Route", "route_ran"), allowNull = true)))

  /** BDB-2018 vintage (camelCase; `configs/bdb-2018-schema.yaml`).
    * `displayName`/`jerseyNumber` are deliberately absent → exercise the
    * warn-and-drop path for undeclared source columns.
    */
  val bdb2018: SchemaConfig = canonical

  /** BDB-2026 vintage (snake_case; `data/nfl-bdb/2026/schema.yaml:5-28`):
    * canonical plus the prediction-task extras. Unsigned reference dtypes
    * widen one step (UInt8→Short, UInt16→Int).
    */
  val bdb2026: SchemaConfig = SchemaConfig(canonical.columns ++ Seq(
    c("playerToPredict", BooleanType,
      Seq("player_to_predict", "playerToPredict"), allowNull = true),
    c("absoluteYardlineNumber", ShortType,
      Seq("absolute_yardline_number", "absoluteYardlineNumber"),
      allowNull = true),
    c("playerName", StringType, Seq("player_name", "displayName"),
      allowNull = true),
    c("playerHeight", StringType, Seq("player_height"), allowNull = true),
    c("playerWeight", IntegerType, Seq("player_weight"), allowNull = true),
    c("playerBirthDate", StringType,
      Seq("player_birth_date", "birthDate"), allowNull = true),
    c("playerRole", StringType, Seq("player_role"), allowNull = true),
    c("numFramesOutput", ShortType, Seq("num_frames_output"),
      allowNull = true),
    c("ballLandX", FloatType, Seq("ball_land_x"), allowNull = true),
    c("ballLandY", FloatType, Seq("ball_land_y"), allowNull = true)))

  val byName: Map[String, SchemaConfig] = Map(
    "canonical" -> canonical,
    "bdb2018" -> bdb2018,
    "bdb2026" -> bdb2026)
}
