package graft

import org.apache.spark.sql.functions._
import graft.operators.{Ingest, Relational}
import graft.sim.SimSearch

/** Skew-join salting, sketch-based summaries, multi-probe ANN. */
class SkewApproxSpec extends SparkSpec {

  test("distributionDrift: identical snapshots score KS 0, a planted " +
    "shift scores 1, exact under k, one-sided keys report NULL") {
    import spark.implicits._
    import graft.operators.Relational
    import graft.text.TextOps
    val old = (1L to 100L).map(i => ("s", i, (i % 17).toDouble))
      .toDF("src", "id", "v")
      .unionByName(Seq(("only_old", 1L, 5.0)).toDF("src", "id", "v"))
    val same = old.filter(col("src") === "s")
    val shifted = same.withColumn("v", col("v") + 1000.0)
    val h = TextOps.hash32(concat_ws(":", col("id")))
    def row(df: org.apache.spark.sql.DataFrame, key: String) =
      df.filter(col("src") === key).collect().head
    val stable = row(Relational.distributionDrift(old, same,
      Seq("src"), "v", h), "s")
    assert(stable.getDouble(5) == 0.0, stable.toString)
    assert(stable.getLong(1) == 101 - 1 && stable.getLong(2) == 100)
    assert(stable.getInt(3) == 100 && stable.getInt(4) == 100)
    val moved = row(Relational.distributionDrift(same, shifted,
      Seq("src"), "v", h), "s")
    assert(moved.getDouble(5) == 1.0, moved.toString) // disjoint supports
    val oneSided = row(Relational.distributionDrift(old, same,
      Seq("src"), "v", h), "only_old")
    assert(oneSided.getLong(1) == 1 && oneSided.getLong(2) == 0)
    assert(oneSided.getInt(4) == 0 && oneSided.isNullAt(5))
  }

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

  test("kmvSketch: exact under k, accurate over k, duplicate- and " +
    "partitioning-invariant") {
    import graft.text.TextOps
    // small group: 30 distinct grams < k=128 → sketch IS the set,
    // estimate exact; big group: 5000 distinct grams → KMV estimate
    val rows =
      (0 until 30).map(i => ("small", s"gram a $i")) ++
      (0 until 5000).map(i => ("big", s"gram b $i"))
    val df = rows.toDF("src", "g")
      .select(col("src"), array(col("g")).as("gs"))
    def sketch(d: org.apache.spark.sql.DataFrame) = d
      .groupBy("src").agg(TextOps.kmvSketch(col("gs"), 128).as("sk"))
      .select(col("src"), col("sk"),
        TextOps.kmvEstimate(col("sk"), 128).as("est"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getAs[scala.collection.Seq[Long]](1).toVector, r.getDouble(2))))
      .toMap
    val s1 = sketch(df)
    assert(s1("small")._1.size == 30 && s1("small")._2 == 30.0)
    assert(s1("big")._1.size == 128)
    // KMV std-err ≈ n/sqrt(k-2) ≈ 9% — 30% is > 3 sigma
    assert(math.abs(s1("big")._2 - 5000.0) / 5000.0 < 0.3,
      s"estimate ${s1("big")._2} implausibly far from 5000")
    // sketch arrays are sorted ascending
    s1.values.foreach { case (v, _) => assert(v == v.sorted) }
    // duplicates collapse: tripling every row changes nothing
    val dup = df.union(df).union(df)
    assert(sketch(dup) == s1)
    // merge path: many partitions → identical sketch
    assert(sketch(df.repartition(13)) == s1)
  }

  test("kmvOverlap estimates pair jaccard and union without a join") {
    import graft.text.TextOps
    // A = g0..g999, B = g500..g1499 → true J = 500/1500, union 1500
    val rows = (0 until 1000).map(i => ("A", s"gram x $i")) ++
      (500 until 1500).map(i => ("B", s"gram x $i"))
    val sk = rows.toDF("src", "g")
      .select(col("src"), array(col("g")).as("gs"))
      .groupBy("src").agg(TextOps.kmvSketch(col("gs"), 128).as("sk"))
    val a = sk.filter(col("src") === "A").select(col("sk").as("ska"))
    val b = sk.filter(col("src") === "B").select(col("sk").as("skb"))
    val o = a.crossJoin(b)
      .select(TextOps.kmvOverlap(col("ska"), col("skb"), 128).as("o"))
      .select("o.m_size", "o.n_both", "o.est_jaccard", "o.est_union")
      .head()
    assert(o.getLong(0) == 128)
    val j = o.getDouble(2)
    assert(math.abs(j - 1.0 / 3.0) < 0.15, s"jaccard est $j far from 1/3")
    val u = o.getDouble(3)
    assert(math.abs(u - 1500.0) / 1500.0 < 0.3, s"union est $u far from 1500")
    // self-overlap is exactly 1 with the union sketch equal to the input
    val self = a.select(TextOps.kmvOverlap(col("ska"), col("ska"), 128)
      .as("o")).select("o.est_jaccard").head().getDouble(0)
    assert(self == 1.0)
    // mergeability is EXACT: merge of part sketches == whole sketch
    val whole = rows.toDF("src", "g")
      .select(array(col("g")).as("gs"))
      .agg(TextOps.kmvSketch(col("gs"), 128).as("sk"))
      .head().getAs[scala.collection.Seq[Long]]("sk").toVector
    val merged = a.crossJoin(b)
      .select(TextOps.kmvMerge(col("ska"), col("skb"), 128).as("m"))
      .head().getAs[scala.collection.Seq[Long]]("m").toVector
    assert(merged == whole, "kmvMerge diverged from the direct sketch")
  }

  test("bottomKSample: deterministic under repartitioning, exact when " +
    "the group fits in k, and quantile ranks hit the sorted sample") {
    import graft.text.TextOps
    val df = (1L to 2000L).map(i => (i, (i % 7).toString, i * 1.5))
      .toDF("id", "grp", "v")
    def sketch(d: org.apache.spark.sql.DataFrame) = d
      .groupBy(col("grp"))
      .agg(Relational.bottomKSample(
        TextOps.hash32(col("id").cast("string")), col("v"), 64).as("sk"))
    val base = sketch(df).collect()
      .map(r => r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(x => (x.getLong(0), x.getDouble(1))).toVector).toMap
    // partition-layout independence: the sample is a pure function of
    // group contents (the property that makes it mergeable + gateable)
    val shuffled = sketch(df.repartition(13, col("v"))).collect()
      .map(r => r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(x => (x.getLong(0), x.getDouble(1))).toVector).toMap
    assert(base == shuffled, "sample depends on partitioning")
    // every sample is sorted by (hash, value) and capped at k
    base.values.foreach { s =>
      assert(s.size == 64)
      assert(s == s.sorted)
    }
    // a group smaller than k IS its own sample → quantiles are exact
    val tiny = Seq((1L, 10.0), (2L, 30.0), (3L, 20.0), (4L, 40.0),
      (5L, 50.0)).toDF("id", "v")
    val q = tiny.agg(Relational.bottomKSample(
        TextOps.hash32(col("id").cast("string")), col("v"), 64).as("sk"))
      .select(
        Relational.sampleQuantile(col("sk"), 0.0).as("q0"),
        Relational.sampleQuantile(col("sk"), 0.5).as("q50"),
        Relational.sampleQuantile(col("sk"), 1.0).as("q100"))
      .head()
    assert(q.getDouble(0) == 10.0 && q.getDouble(1) == 30.0 &&
      q.getDouble(2) == 50.0)
    // SQL registration serves the same kernel
    tiny.createOrReplaceTempView("bk_tiny")
    val viaSql = spark.sql(
      """SELECT graft_bottomk(
        |  CAST(conv(substr(md5(CAST(id AS STRING)), 1, 8), 16, 10)
        |    AS BIGINT), CAST(v AS DOUBLE), 64) AS sk
        |FROM bk_tiny""".stripMargin)
      .select(size(col("sk"))).head().getInt(0)
    assert(viaSql == 5)
  }

  test("robustOutliersApprox agrees with the exact flavor within sample " +
    "error on a skewed group; an empty-sample group yields NULL " +
    "estimates instead of crashing") {
    import graft.text.TextOps
    // heavy-tailed group: 5000 lognormal-ish values + 25 far outliers
    // (deterministic: value is a pure function of i)
    val rows = (1L to 5000L).map { i =>
      val base = math.exp((i % 97).toDouble / 20.0) // ~1..122
      val v = if (i % 200 == 0) base + 10000.0 else base
      (i, "g", v)
    }
    val df = rows.toDF("id", "grp", "v")
    val exact = Relational.robustOutliers(df, Seq("grp"), "v", c = 3.0)
      .head()
    val approx = Relational.robustOutliersApprox(df, Seq("grp"), "v",
      TextOps.hash32(col("id").cast("string")), k = 512, c = 3.0)
      .head()
    val medEx = exact.getAs[Double]("median")
    val medAp = approx.getAs[Double]("median_est")
    // k=512 → rank error ~ O(n/√k): the sampled median must land well
    // inside the bulk of the distribution (±30% of the exact median)
    assert(math.abs(medAp - medEx) <= 0.3 * medEx,
      s"median: exact $medEx vs approx $medAp")
    val outEx = exact.getAs[Long]("n_outliers")
    val outAp = approx.getAs[Long]("n_outliers_est")
    // binomial share error at k=512 is ~√(p(1−p)/512)·n ≈ 2% of n;
    // give 3σ headroom relative to the exact count
    assert(math.abs(outAp - outEx) <= math.max(0.25 * outEx, 50.0),
      s"outlier estimate $outAp vs exact $outEx")
    // all-null value column → empty sketch → NULL estimates, 0 est
    val nulls = Seq((1L, "g"), (2L, "g"))
      .toDF("id", "grp").withColumn("v", lit(null).cast("double"))
    val r = Relational.robustOutliersApprox(nulls, Seq("grp"), "v",
      TextOps.hash32(col("id").cast("string")), k = 8, c = 3.0).head()
    assert(r.getAs[Long]("n_rows") == 2L && r.getAs[Int]("m") == 0)
    assert(r.isNullAt(r.fieldIndex("median_est")) &&
      r.isNullAt(r.fieldIndex("mad_est")) &&
      r.isNullAt(r.fieldIndex("n_outliers_est")))
    // sampleQuantile on an empty sketch is NULL (not element_at(,0))
    val sq = nulls.agg(Relational.bottomKSample(
        TextOps.hash32(col("id").cast("string")), col("v"), 8).as("sk"))
      .select(Relational.sampleQuantile(col("sk"), 0.5).as("q")).head()
    assert(sq.isNullAt(0))
  }
}
