package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.schema.SchemaConfig

/** The YAML parser against the real reference configs (read-only fixtures;
  * skipped gracefully if the reference tree is absent).
  */
class SchemaConfigSpec extends AnyFunSuite {

  private def read(p: String): Option[String] = {
    val f = java.nio.file.Paths.get(p)
    if (java.nio.file.Files.exists(f))
      Some(new String(java.nio.file.Files.readAllBytes(f), "UTF-8"))
    else None
  }

  test("parses the reference canonical schema.yaml") {
    read("/root/reference/configs/schema.yaml").foreach { text =>
      val cfg = SchemaConfig.parseYaml(text)
      assert(cfg.columns.nonEmpty)
      val byName = cfg.columns.map(c => c.name -> c).toMap
      assert(byName.contains("gameId"))
      assert(byName("gameId").dtype == LongType)
      assert(byName("playId").dtype == IntegerType)
      // aliases survive as ordered candidates
      assert(byName("gameId").candidates.length >= 2)
    }
  }

  test("parses the bdb-2018 vintage config") {
    read("/root/reference/configs/bdb-2018-schema.yaml").foreach { text =>
      val cfg = SchemaConfig.parseYaml(text)
      assert(cfg.columns.nonEmpty)
      assert(cfg.columns.exists(_.name == "x"))
      assert(cfg.columns.filter(_.dtype == FloatType).nonEmpty)
    }
  }

  test("parses the 2026 flat-mapping config incl. unsigned widening") {
    read("/root/reference/data/nfl-bdb/2026/schema.yaml").foreach { text =>
      val in = SchemaConfig.parseFlatSchema(text, "input_schema")
      assert(in.columns.size == 23)
      val byName = in.columns.map(c => c.name -> c).toMap
      assert(byName("game_id").dtype == LongType)
      assert(byName("frame_id").dtype == ShortType)
      // UInt8 → ShortType, UInt16 → IntegerType (SURVEY §1.3)
      assert(byName("absolute_yardline_number").dtype == ShortType)
      assert(byName("player_weight").dtype == IntegerType)
      val out = SchemaConfig.parseFlatSchema(text, "output_schema")
      assert(out.columns.map(_.name) ==
        Seq("game_id", "play_id", "nfl_id", "frame_id", "x", "y"))
      val sub = SchemaConfig.parseFlatSchema(text, "submission_schema")
      assert(sub.columns.head.name == "id")
    }
  }

  test("inline lists, quotes and comments parse") {
    val cfg = SchemaConfig.parseYaml(
      """# header comment
        |defaults:
        |  strict_columns: false
        |columns:
        |  - name: gameId
        |    dtype: Int64
        |    aliases: [game_id, "GameKey"]
        |  - name: team   # trailing comment
        |    dtype: Categorical
        |    aliases:
        |      - club
        |      - 'player_side'
        |    allow_null: true
        |""".stripMargin)
    assert(cfg.columns.map(_.name) == Seq("gameId", "team"))
    assert(cfg.columns(0).candidates == Seq("gameId", "game_id", "GameKey"))
    assert(cfg.columns(1).candidates == Seq("team", "club", "player_side"))
    assert(cfg.columns(1).allowNull)
    assert(cfg.columns(1).dtype == StringType)
  }
}
