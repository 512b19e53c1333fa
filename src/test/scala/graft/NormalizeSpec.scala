package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.operators.Normalize
import graft.schema.{ColumnSpec, SchemaConfig}

/** P1-P3 semantics (reference src/ingest.py:26-44): alias resolution order,
  * case-insensitive fallback, defaults, typed nulls, warn-and-drop.
  * `Normalize.compile` is a pure function — no Spark session needed.
  */
class NormalizeSpec extends AnyFunSuite {

  private val cfg = SchemaConfig(Seq(
    ColumnSpec("gameId", LongType, Seq("game_id", "GameKey")),
    ColumnSpec("x", FloatType, Seq("X")),
    ColumnSpec("s", FloatType, Seq("speed"), default = Some("0.0")),
    ColumnSpec("o", FloatType, Nil, allowNull = true),
    ColumnSpec("route", StringType, Nil)))

  test("first-present alias wins, in declared order") {
    // canonical name itself is the first candidate
    val p1 = Normalize.compile(Seq("gameId", "game_id"), cfg)
    assert(p1.columns.head.toString.contains("gameId"))
    // alias order: game_id before GameKey
    val p2 = Normalize.compile(Seq("GameKey", "game_id"), cfg)
    assert(p2.columns.head.toString.contains("game_id"))
  }

  test("case-insensitive match is a fallback after exact") {
    val p = Normalize.compile(Seq("GAMEID", "x"), cfg)
    assert(p.columns.head.toString.contains("GAMEID"))
  }

  test("absent + default → literal; absent + allowNull → null; " +
    "absent required → dropped") {
    val p = Normalize.compile(Seq("gameId", "x"), cfg)
    // s gets its default, o gets a typed null → 4 output columns
    assert(p.columns.size == 4)
    assert(p.dropped == Seq("route"))
  }

  test("undeclared source columns are never carried through") {
    val p = Normalize.compile(
      Seq("gameId", "x", "jerseyNumber", "displayName"), cfg)
    val rendered = p.columns.map(_.toString).mkString
    assert(!rendered.contains("jerseyNumber"))
  }
}
