package graft

import org.apache.spark.sql.functions._
import graft.operators.{Ingest, Relational}
import graft.sim.SimSearch

/** Skew-join salting, sketch-based summaries, multi-probe ANN. */
class SkewApproxSpec extends SparkSpec {
  import spark.implicits._

  test("salted join is row-identical to the plain join under heavy skew") {
    // 90% of fact rows share one whale key
    val big = spark.range(0, 20000).select(
      when(col("id") % 10 === 0, col("id") % 50).otherwise(7L).as("k"),
      col("id").as("payload"))
    val small = spark.range(0, 50).select(
      col("id").as("k"), (col("id") * 100).as("dim"))
    val plain = big.join(small, Seq("k"))
      .select("k", "payload", "dim").collect().toSet
    val salted = Relational.saltedJoin(big, small, Seq("k"), saltFactor = 8)
      .select("k", "payload", "dim").collect().toSet
    assert(salted == plain)
  }

  test("approx summary tracks exact within sketch error") {
    val df = SyntheticTracking.df(spark) // 2 games × 5 plays
    val approx = Ingest.summaryApproxDf(df).head()
    assert(approx.getAs[Long]("n_rows") == 2L * 5 * 50 * 23)
    val games = approx.getAs[Long]("n_games")
    assert(games >= 1 && games <= 3) // exact 2, 5% sketch error
    val plays = approx.getAs[Long]("n_plays")
    assert(plays >= 8 && plays <= 12) // exact 10
    assert(approx.getAs[Int]("max_frame") == 50)
  }

  test("multi-probe widens ANN candidates without losing single-probe hits") {
    val vecs = (0L until 40L).map { i =>
      val a = Array.fill(8)(0.01f)
      a((i % 4).toInt) = 1.0f + (i % 7) * 0.1f
      (i, a)
    }.toDF("vec_id", "embedding")
    def neighbors(probeBits: Int) =
      SimSearch.annTopK(vecs, "vec_id", "embedding",
        col("vec_id") < 4, k = 5, planes = 5, dim = 8,
        probeBits = probeBits)
        .collect().map(r => (r.getAs[Long]("qid"),
          r.getAs[Long]("neighbor"))).toSet
    val single = neighbors(0)
    val multi = neighbors(3)
    assert(multi.size >= single.size)
  }
}
