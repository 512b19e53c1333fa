package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Property-style checks for the exact-n seeded sample — the invariants
  * the reference's `sample(n, seed)` contract implies (SURVEY §5):
  * subset-of-universe, exact size min(n, |U|), seed determinism, and —
  * the Spark-specific one — independence from physical partitioning.
  */
class SamplingPropertySpec extends SparkSpec {

  private def universe(n: Int, parts: Int) =
    spark.range(0, n).repartition(parts)
      .select((col("id") * 13 % 1000).as("g"), (col("id") % 37).as("p"))
      .distinct()

  private def sample(nKeys: Int, parts: Int, n: Int, seed: Long) = {
    val keys = universe(nKeys, parts)
    Relational.sampleExact(keys, n,
      Relational.hashRank(Seq(col("g"), col("p")), seed),
      Seq(col("g"), col("p")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("sample is a subset of the universe with exact size min(n, |U|)") {
    for (seed <- Seq(1L, 42L, 999L); n <- Seq(0, 3, 17)) {
      val u = universe(500, 4).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val s = sample(500, 4, n, seed)
      assert(s.subsetOf(u))
      assert(s.size == math.min(n, u.size))
    }
    // degenerate: n beyond the universe returns everything
    val all = sample(50, 4, 10000, 42L)
    assert(all == universe(50, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("sampleQuantile rank error obeys the sqrt(q(1-q)/k) bound at " +
    "two k values (the documented latency-twin contract)") {
    // value = rank: n ranks 0..n-1, so |est/(n-1) - q| IS the rank
    // error of the estimate; the md5-derived hash makes the draw
    // deterministic, so the 4-sigma bounds are fixed facts here
    val n = 20000
    val base = spark.range(0, n).select(
      graft.text.TextOps.hash32(concat(lit("qk:"),
        col("id").cast("string"))).as("_h"),
      col("id").cast("double").as("_v"))
    def rankErr(k: Int, q: Double): Double = {
      val est = base.agg(Relational.sampleQuantile(
        Relational.bottomKSample(col("_h"), col("_v"), k), q))
        .head().getDouble(0)
      math.abs(est / (n - 1).toDouble - q)
    }
    for (q <- Seq(0.5, 0.9)) {
      val sigma64 = math.sqrt(q * (1 - q) / 64)
      val sigma1024 = math.sqrt(q * (1 - q) / 1024)
      assert(rankErr(64, q) < 4 * sigma64,
        s"k=64 q=$q err=${rankErr(64, q)} bound=${4 * sigma64}")
      assert(rankErr(1024, q) < 4 * sigma1024,
        s"k=1024 q=$q err=${rankErr(1024, q)} bound=${4 * sigma1024}")
    }
  }

  test("sample is invariant under physical partitioning") {
    for (seed <- Seq(7L, 42L)) {
      val p1 = sample(500, 1, 11, seed)
      val p7 = sample(500, 7, 11, seed)
      val p32 = sample(500, 32, 11, seed)
      assert(p1 == p7 && p7 == p32)
    }
  }

  test("different seeds give different samples (overwhelmingly)") {
    val a = sample(500, 4, 10, 1L)
    val b = sample(500, 4, 10, 2L)
    assert(a != b)
  }

  test("priority sample: partitioning-invariant, weight-monotone") {
    def docs(parts: Int) = spark.range(0, 400).repartition(parts)
      .select(col("id"), ((col("id") % 20) + 1).cast("double").as("w"))
    def run(parts: Int, seed: Long) = Relational
      .prioritySample(docs(parts), "id", col("w"), n = 40, seed = seed)
      .collect().map(_.getLong(0)).toSet
    // same sample regardless of physical layout (rank is a pure
    // function of id+weight — retries/replans on a cluster agree)
    assert(run(1, 42L) == run(7, 42L) && run(7, 42L) == run(32, 42L))
    // weight-monotone in aggregate: heavy ids (w > 10) should dominate
    // the sample far beyond their 50% population share
    val heavy = run(4, 42L).count(id => id % 20 >= 10)
    assert(heavy >= 25, s"expected heavy-weight majority, got $heavy/40")
  }

  test("weightedSample (A-ES): partitioning-invariant, weight-biased, " +
    "excludes non-positive weights, degenerates to all rows") {
    def docs(parts: Int) = spark.range(0, 400).repartition(parts)
      .select(col("id"),
        when(col("id") % 2 === 0, 1000L).otherwise(1L).as("w"))
    def run(parts: Int, seed: Long) = Relational
      .weightedSample(docs(parts), "id", col("w"), n = 40, seed = seed)
      .collect().map(_.getLong(0)).toSet
    assert(run(1, 7L) == run(8, 7L) && run(8, 7L) == run(32, 7L))
    // 1000:1 weights → the even class should own nearly every slot
    val even = run(4, 7L).count(_ % 2 == 0)
    assert(even >= 36, s"expected heavy-weight dominance, got $even/40")
    // zero/negative weights carry no mass and never surface
    val withZero = spark.range(0, 20)
      .select(col("id"), when(col("id") < 10, -1L)
        .otherwise(lit(0L)).as("w"))
      .union(spark.range(20, 30).select(col("id"), lit(5L).as("w")))
    val got = Relational.weightedSample(withZero, "id", col("w"), 50, 1L)
      .collect().map(_.getLong(0)).toSet
    assert(got == (20L until 30L).toSet, got)
  }

  test("hashSplit: total cover, ~proportional, deterministic, and " +
    "stable under row addition") {
    def split(n: Int, seed: Long): Map[Long, String] =
      Relational.hashSplit(
        spark.range(0, n).select(col("id")), "id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val s1 = split(2000, 13L)
    assert(s1.size == 2000 &&
      s1.values.forall(Set("train", "val", "test")))
    val byLabel = s1.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(byLabel("train") > 1500 && byLabel("train") < 1700,
      s"train share off: $byLabel")
    assert(byLabel("val") > 130 && byLabel("val") < 270, s"val: $byLabel")
    // same seed → identical; different seed → (almost surely) different
    assert(split(2000, 13L) == s1)
    assert(split(2000, 14L) != s1)
    // adding rows never reassigns existing ones (the reproducibility
    // property a growing corpus needs)
    val s2 = split(3000, 13L)
    assert(s1.forall { case (id, l) => s2(id) == l })
  }

  test("globalShuffle: positions are a permutation, shards balanced, " +
    "layout prefix-length- and partitioning-invariant") {
    import spark.implicits._
    val n = 1000
    val df = (0 until n).map(_.toLong).toDF("doc_id")
    def layout(d: org.apache.spark.sql.DataFrame, plen: Int) =
      Relational.globalShuffle(d, "doc_id", seed = 9L, shards = 7,
        hashPrefixLen = plen)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
    val l1 = layout(df, 4)
    assert(l1.map(_._2) === (0 until n).map(_.toLong).toSet) // permutation
    val shardSizes = l1.groupBy(_._3).view.mapValues(_.size).values.toSet
    assert(shardSizes.forall(s => s == n / 7 || s == n / 7 + 1))
    // shard_pos is a permutation of 0..size-1 within each shard
    l1.groupBy(_._3).foreach { case (_, rows) =>
      assert(rows.map(_._4) === (0 until rows.size).map(_.toLong).toSet)
    }
    assert(layout(df, 1) === l1)                 // prefix-length-invariant
    assert(layout(df.repartition(13), 4) === l1) // partitioning-invariant
    assert(layout(df, 4) === l1)                 // deterministic re-run
  }

  test("keyCapSample: per-class cap honored on skewed classes, small " +
    "classes pass whole, prefix-length- and partitioning-invariant") {
    import spark.implicits._
    // skewed: class A 500 rows, B 40, C 7 (under the cap)
    val rows = (0 until 500).map(i => ("A", i.toLong)) ++
      (0 until 40).map(i => ("B", 1000L + i)) ++
      (0 until 7).map(i => ("C", 2000L + i))
    val df = rows.toDF("cls", "id")
    def kept(d: org.apache.spark.sql.DataFrame, plen: Int) =
      Relational.keyCapSample(d, "cls", "id", cap = 20L, seed = 5L,
        hashPrefixLen = plen)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet
    val k1 = kept(df, 4)
    val bySize = k1.groupBy(_._1).view.mapValues(_.size).toMap
    assert(bySize == Map("A" -> 20, "B" -> 20, "C" -> 7))
    // ranks are exactly 0..size-1 within each class
    k1.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._3) === (0 until rs.size).map(_.toLong).toSet)
    }
    assert(kept(df, 1) === k1)                 // prefix-length-invariant
    assert(kept(df.repartition(13), 4) === k1) // partitioning-invariant
    // a different seed keeps a different subset of the capped classes
    val k2 = Relational.keyCapSample(df, "cls", "id", 20L, seed = 6L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(k2 != k1.map(t => (t._1, t._2)))
  }

  test("percentileBuckets: exact thirds per class, nulls excluded, " +
    "bucketScale-invariant") {
    import spark.implicits._
    // class A: 10 scored rows -> head 0..2, middle 3..5, tail 6..9
    // class B: 2 rows -> rank0*1000 < 2*300 false -> middle? 0<1.2k? no:
    //   0*1000=0 < 600 -> head; 1*1000=1000 >= 1200? 1000<1200 middle
    val rows = (0 until 10).map(i => ("A", i.toLong, Some(i / 2.0))) ++
      Seq(("A", 99L, Option.empty[Double]),
        ("B", 0L, Some(1.0)), ("B", 1L, Some(2.0)))
    val df = rows.toDF("cls", "id", "score")
    def run(scale: Double) =
      Relational.percentileBuckets(df, "cls", "id", "score",
        bucketScale = scale)
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(3), r.getString(5))).toMap
    val got = run(16.0)
    assert(!got.contains(("A", 99L))) // null score excluded
    assert((0 until 10).forall { i =>
      got(("A", i.toLong))._1 == i.toLong })
    assert((0 to 2).forall(i => got(("A", i.toLong))._2 == "head"))
    assert((3 to 5).forall(i => got(("A", i.toLong))._2 == "middle"))
    assert((6 to 9).forall(i => got(("A", i.toLong))._2 == "tail"))
    assert(got(("B", 0L))._2 == "head" && got(("B", 1L))._2 == "middle")
    // one bucket per score vs one bucket for everything: same output
    assert(run(1000.0) === got && run(0.001) === got)
  }

  test("unimaxQuotas: capped prefix + equal share, all-capped and " +
    "none-capped edges, leftover bounded by class count") {
    import spark.implicits._
    def quotas(counts: Seq[(String, Long)], budget: Long, epochs: Int) =
      Relational.unimaxQuotas(counts.toDF("cls", "_n"), "cls",
        budget, epochs)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // capacities (1 epoch): a=100, b=200, c=1000; budget 600:
    // a capped (100*3+0=300<=600), b capped (200*2+100=500<=600),
    // c uncapped -> share (600-300)/1 = 300
    val q1 = quotas(Seq("a" -> 100L, "b" -> 200L, "c" -> 1000L), 600L, 1)
    assert(q1 === Map("a" -> 100L, "b" -> 200L, "c" -> 300L))
    // budget >= total capacity: everyone capped at epochs*n
    val q2 = quotas(Seq("a" -> 100L, "b" -> 200L), 10000L, 2)
    assert(q2 === Map("a" -> 200L, "b" -> 400L))
    // budget below every even share: nobody capped, equal floor split
    val q3 = quotas(Seq("a" -> 500L, "b" -> 600L, "c" -> 700L), 100L, 1)
    assert(q3 === Map("a" -> 33L, "b" -> 33L, "c" -> 33L))
    // allocation never exceeds budget; when an uncapped class exists,
    // the floor leaves fewer leftover tokens than there are classes
    assert(q1.values.sum <= 600L && 600L - q1.values.sum < q1.size)
    assert(q2.values.sum <= 10000L) // all capped: leftover is fine
    assert(q3.values.sum <= 100L && 100L - q3.values.sum < q3.size)
  }
}
