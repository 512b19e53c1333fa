package graft

import org.apache.spark.sql.functions._
import graft.operators.{Ingest, PlayOps, Pool}
import graft.schema.Vintages

/** E2E golden tests over the reference's own committed fixtures
  * (`test_data/2018|2023/<year>-20plays.csv`, produced by its seeded
  * sampler — SURVEY §5.1). Golden numbers independently computed from the
  * CSVs: rows / distinct games / distinct (game, play) / max frame.
  * Skipped gracefully when the reference tree is absent.
  */
class GoldenFixtureSpec extends SparkSpec {

  private def haveRef(p: String): Boolean =
    new java.io.File(p).isFile

  test("2018 camelCase fixture: ingest summary matches golden stats") {
    val csv = "/root/reference/test_data/2018/2018-20plays.csv"
    if (haveRef(csv)) {
      val poolRoot = tmpDir("golden2018")
      val res = Ingest.run(spark, "/root/reference/test_data/2018",
        poolRoot, Vintages.bdb2018)
      assert(res.badFiles.isEmpty)
      assert(res.summary == Ingest.Summary(21403L, 10L, 21L, Some(147)))
      // undeclared columns (displayName, jerseyNumber) were dropped
      val pool = Pool(spark, poolRoot).df
      assert(!pool.columns.contains("displayName"))
      // ball rows present: nflId null in the 2018 vintage
      assert(pool.filter(PlayOps.isBall).count() > 0)
    }
  }

  test("2023/2026 snake_case fixture: alias-normalized ingest matches") {
    val csv = "/root/reference/test_data/2023/2023-20plays.csv"
    if (haveRef(csv)) {
      val poolRoot = tmpDir("golden2023")
      val res = Ingest.run(spark, "/root/reference/test_data/2023",
        poolRoot, Vintages.bdb2026)
      assert(res.badFiles.isEmpty)
      assert(res.summary == Ingest.Summary(8699L, 10L, 23L, Some(52)))
      val pool = Pool(spark, poolRoot).df
      // snake_case arrived, canonical camelCase comes out
      assert(Seq("playId", "nflId", "frameId", "playDirection",
        "playerRole", "ballLandX").forall(pool.columns.contains))
      // 2026 vintage: side-of-ball labels survive unconflated
      val sides = PlayOps.withSide(pool).select("entitySide").distinct()
        .collect().map(_.getString(0)).toSet
      assert(sides.contains("offense") && sides.contains("defense"))
    }
  }

  test("sample-plays over the golden pool is deterministic and complete") {
    val csv = "/root/reference/test_data/2018/2018-20plays.csv"
    if (haveRef(csv)) {
      val poolRoot = tmpDir("goldensample")
      Ingest.run(spark, "/root/reference/test_data/2018", poolRoot,
        Vintages.bdb2018)
      val pool = Pool(spark, poolRoot)
      val s1 = pool.samplePlays(5, Nil, 42L)
      // exactly 5 plays, with every frame of each play joined back
      val keys = s1.select("gameId", "playId").distinct().count()
      assert(keys == 5)
      val again = pool.samplePlays(5, Nil, 42L)
        .select("gameId", "playId").distinct().count()
      assert(again == 5)
      // telemetry runs over the sampled block
      assert(PlayOps.telemetry(s1).count() == 5)
    }
  }
}
