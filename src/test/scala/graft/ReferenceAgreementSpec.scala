package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Agreement tests: each optimized operator vs a naive reference
  * formulation on seeded random data — the shapes the hand-written
  * cases don't reach (dense ties, bin-edge landings, empty classes).
  */
class ReferenceAgreementSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260812L)

  test("rangeJoin agrees with the naive theta join across bin widths") {
    val pts = (1 to 300).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i.toLong))
    val ivs = (1 to 80).map { i =>
      val lo = rnd.nextInt(1000).toLong
      (rnd.nextInt(5).toLong, lo, lo + rnd.nextInt(120).toLong, i.toLong)
    }
    val ptsDf = pts.toDF("k", "ts", "pid")
    val ivsDf = ivs.toDF("k", "lo", "hi", "iid")
    val naive = ptsDf.as("p").join(ivsDf.as("v"),
      col("p.k") === col("v.k") &&
        col("p.ts") >= col("v.lo") && col("p.ts") <= col("v.hi"))
      .select(col("pid"), col("iid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (bin <- Seq(1L, 7L, 64L, 500L, 5000L)) {
      val bucketed = Relational.rangeJoin(ptsDf, ivsDf, Seq("k"),
        "ts", "lo", "hi", binWidth = bin)
        .select(col("pid"), col("iid"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(bucketed == naive, s"binWidth=$bin")
    }
  }

  test("asofJoin agrees with a brute-force latest-at-or-before scan") {
    // dense ts collisions on purpose: ts drawn from a small range
    val lefts = (1 to 200).map(i =>
      (rnd.nextInt(4).toLong, rnd.nextInt(40).toLong, i.toLong))
    val rights = (1 to 120).map(i =>
      (rnd.nextInt(4).toLong, rnd.nextInt(40).toLong, i.toLong,
        rnd.nextInt(1000).toDouble))
    val expected = lefts.flatMap { case (k, ts, lid) =>
      val cands = rights.filter(r => r._1 == k && r._2 <= ts)
      if (cands.isEmpty) None
      else {
        // latest ts, ties by max tieBreak id — asofJoin's documented rule
        val best = cands.maxBy(r => (r._2, r._3))
        Some(lid -> (best._3, best._4))
      }
    }.toMap
    val got = Relational.asofJoin(
      lefts.toDF("k", "ts", "lid"),
      rights.toDF("k", "ts", "rid", "amount"),
      Seq("k"), "ts",
      Map("rid" -> "r_rid", "amount" -> "r_amount"),
      tieBreak = Seq("rid"))
      .collect()
      .map(r => r.getAs[Long]("lid") ->
        (r.getAs[Long]("r_rid"), r.getAs[Double]("r_amount"))).toMap
    assert(got == expected)
  }

  test("stratifiedSample agrees with the window formulation") {
    val rows = (1 to 500).map(i => (s"c${rnd.nextInt(7)}", i.toLong))
    val df = rows.toDF("cls", "id")
    val twoPhase = Relational.stratifiedSample(df, "cls", "id", 10, 99L)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("cls")
      .orderBy(Relational.md5Rank(Seq(col("id")), 99L), col("id"))
    val windowed = df
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .select(col("cls"), (col("rn") - 1).cast("int").as("pos"), col("id"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(twoPhase == windowed)
  }
}
