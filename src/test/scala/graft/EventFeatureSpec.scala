package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.FeatureStore
import graft.streaming.EventOps

/** Event-stream transforms and feature-store distance ops on constructed
  * inputs with hand-computed answers.
  */
class EventFeatureSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val events = Seq(
    (1L, ts("2024-01-01 10:00:00"), 7L, "click", 1.0, """{"k": 1}"""),
    (2L, ts("2024-01-01 10:10:00"), 7L, "click", 2.0, """{"k": 2}"""),
    (3L, ts("2024-01-01 11:10:00"), 7L, "view", 4.0, """{"k": 3}"""),
    (4L, ts("2024-01-01 10:05:00"), 8L, "view", 8.0, """{"k": 4}"""))
    .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    .cache()

  test("tumbling window groups per (user, hour)") {
    val w = EventOps.tumblingAgg(events, "1 hour").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("window_start")) ->
        (r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toMap
    val h10 = ts("2024-01-01 10:00:00").getTime / 1000
    val h11 = ts("2024-01-01 11:00:00").getTime / 1000
    assert(w((7L, h10)) == (2L, 3.0))
    assert(w((7L, h11)) == (1L, 4.0))
    assert(w((8L, h10)) == (1L, 8.0))
  }

  test("sessionize splits on the inactivity gap") {
    // user 7: 10:00, 10:10 (same session), 11:10 (gap 60min > 30 → new)
    val s = EventOps.sessionize(events, gapMinutes = 30).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_seq")) ->
        r.getAs[Long]("n_events")).toMap
    assert(s((7L, 0L)) == 2L)
    assert(s((7L, 1L)) == 1L)
    assert(s((8L, 0L)) == 1L)
  }

  test("sessionizeScalable matches sessionize on a whale user with " +
    "sessions crossing bucket boundaries") {
    // whale user 7: 300 events at irregular spacing — some gaps beyond
    // the 30-min threshold, sessions straddling the 2-hour buckets —
    // plus a small user 8. The two-level variant must reproduce the
    // single-window sessions exactly.
    val rnd = new scala.util.Random(31)
    var t = ts("2024-01-01 00:00:00").getTime
    val rows = (1 to 300).map { i =>
      // 0-70 min steps: ~1/4 of steps break a session; bucket = 120 min
      t += rnd.nextInt(70) * 60000L
      (i.toLong, new Timestamp(t), 7L, "click", 1.0, "{}")
    } ++ Seq((1000L, ts("2024-01-01 05:00:00"), 8L, "view", 2.0, "{}"))
    val df = rows.toDF("event_id", "ts", "user_id", "event_type",
      "value", "props").repartition(5)
    def sessions(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_seq"),
        r.getAs[Long]("session_start"), r.getAs[Long]("session_end"),
        r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toSet
    val ref = sessions(EventOps.sessionize(df, gapMinutes = 30))
    val scalable = sessions(EventOps.sessionizeScalable(df,
      gapMinutes = 30, bucketMinutes = 120))
    assert(scalable == ref)
    // every event lands in a session (Seq, not Set — sums, not dedup)
    assert(ref.toSeq.map(_._5).sum == 301L)
    assert(ref.count(_._1 == 7L) > 30) // the gaps really split sessions
  }

  test("asofJoin picks the latest right row at or before each left ts") {
    val clicks = Seq(
      (1L, 7L, ts("2024-01-01 10:00:00")),
      (2L, 7L, ts("2024-01-01 12:00:00")),
      (3L, 7L, ts("2024-01-01 09:00:00")), // before any purchase → dropped
      (4L, 8L, ts("2024-01-01 10:30:00")))
      .toDF("event_id", "user_id", "ts")
    val purchases = Seq(
      (7L, ts("2024-01-01 09:30:00"), 100.0),
      (7L, ts("2024-01-01 11:00:00"), 200.0),
      (8L, ts("2024-01-01 10:30:00"), 300.0)) // exact-ts match counts
      .toDF("user_id", "ts", "amount")
    val joined = graft.operators.Relational.asofJoin(
      clicks, purchases, Seq("user_id"), "ts",
      Map("amount" -> "purchase_amount"))
      .collect().map(r => r.getAs[Long]("event_id") ->
        r.getAs[Double]("purchase_amount")).toMap
    assert(joined == Map(1L -> 100.0, 2L -> 200.0, 4L -> 300.0))
  }

  test("asofJoin: whole payload comes from ONE right row even with nulls") {
    val clicks = Seq((1L, 7L, ts("2024-01-01 10:00:00")))
      .toDF("event_id", "user_id", "ts")
    // latest purchase has a NULL amount: the output must carry (null, "Y")
    // as a unit — not stitch the older row's amount under the newer code —
    // and the left row must NOT be dropped for the null in one field
    val purchases = Seq(
      (7L, ts("2024-01-01 09:00:00"), Some(50.0), "X"),
      (7L, ts("2024-01-01 09:30:00"), None, "Y"))
      .toDF("user_id", "ts", "amount", "code")
    val out = graft.operators.Relational.asofJoin(
      clicks, purchases, Seq("user_id"), "ts",
      Map("amount" -> "purchase_amount", "code" -> "purchase_code"))
      .collect()
    assert(out.length == 1)
    assert(out(0).isNullAt(out(0).fieldIndex("purchase_amount")))
    assert(out(0).getAs[String]("purchase_code") == "Y")
  }

  test("asofJoin: tieBreak resolves equal-ts right rows deterministically") {
    val clicks = Seq((1L, 7L, ts("2024-01-01 10:00:00")))
      .toDF("event_id", "user_id", "ts")
    val purchases = Seq(
      (7L, ts("2024-01-01 09:30:00"), 11L, 100.0),
      (7L, ts("2024-01-01 09:30:00"), 12L, 200.0))
      .toDF("user_id", "ts", "p_event_id", "amount")
    val out = graft.operators.Relational.asofJoin(
      clicks, purchases, Seq("user_id"), "ts",
      Map("p_event_id" -> "purchase_id", "amount" -> "purchase_amount"),
      tieBreak = Seq("p_event_id")).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("purchase_id") == 12L) // max tieBreak wins
  }

  test("pivotCounts: fixed-category wide counts with zero fill") {
    val wide = graft.operators.Relational.pivotCounts(
      events, "user_id", "event_type", Seq("click", "view", "purchase"))
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("click"), r.getAs[Long]("view"),
          r.getAs[Long]("purchase"))).toMap
    assert(wide(7L) == (2L, 1L, 0L)) // no purchases → 0, not null
    assert(wide(8L) == (0L, 1L, 0L))
  }

  test("rangeJoin: bin-bucketed interval join matches boundary-inclusive") {
    val pts = Seq((7L, 5L, "a"), (7L, 10L, "b"), (7L, 25L, "c"),
      (8L, 5L, "d"))
      .toDF("user_id", "ts", "tag")
    // [4,11] spans two bins at binWidth=10; boundaries are inclusive
    val ivs = Seq((7L, 4L, 11L, "w1"), (7L, 20L, 30L, "w2"),
      (8L, 6L, 7L, "w3"))
      .toDF("user_id", "lo", "hi", "win")
    val out = graft.operators.Relational.rangeJoin(
      pts, ivs, Seq("user_id"), "ts", "lo", "hi", binWidth = 10)
      .select("tag", "win").collect().map(r => (r.getString(0),
        r.getString(1))).toSet
    assert(out == Set(("a", "w1"), ("b", "w1"), ("c", "w2")))
  }

  test("groupPercentiles: continuous interpolation on a known set") {
    val df = Seq(("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", 4.0))
      .toDF("k", "v")
    val r = graft.operators.Relational.groupPercentiles(
      df, Seq("k"), "v", Seq("p50" -> 0.5, "p95" -> 0.95)).head()
    assert(r.getAs[Double]("p50") == 2.5)
    assert(math.abs(r.getAs[Double]("p95") - 3.85) < 1e-9)
  }

  test("json prop extraction without UDFs") {
    val p = EventOps.propInt(events, "k", "k").select("event_id", "k")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(p == Map(1L -> 1, 2L -> 2, 3L -> 3, 4L -> 4))
  }

  test("nearest distance: per-frame self-join with struct-min tie-break") {
    // one frame, three entities on a line at x = 0, 3, 10
    val frame = Seq(
      (1L, 1, 0.0, 0.0), (1L, 2, 3.0, 0.0), (1L, 3, 10.0, 0.0))
      .toDF("frameKey", "entity", "px", "py")
    val nd = FeatureStore.nearestDistance(frame, Seq("frameKey"), "entity",
      "px", "py").collect()
      .map(r => r.getAs[Int]("entity") ->
        (r.getAs[Int]("nearest_id"), r.getAs[Double]("nearest_dist"))).toMap
    assert(nd(1) == (2, 3.0))
    assert(nd(2) == (1, 3.0)) // tie-free here; id 1 is genuinely nearest
    assert(nd(3) == (2, 7.0))
  }

  test("nearest distance: string-id fallback path agrees with the kernel") {
    // same geometry twice: int ids take the native kernel, string ids the
    // expression fallback — results must agree (incl. equidistant
    // tie-break to the smaller neighbor id)
    val geo = Seq((1L, 1, 0.0, 0.0), (1L, 2, 4.0, 0.0), (1L, 3, 8.0, 0.0))
    val intIds = geo.toDF("frameKey", "entity", "px", "py")
    val strIds = geo.map { case (f, e, x, y) => (f, s"e$e", x, y) }
      .toDF("frameKey", "entity", "px", "py")
    val fromKernel = FeatureStore.nearestDistance(
      intIds, Seq("frameKey"), "entity", "px", "py").collect()
      .map(r => s"e${r.getAs[Int]("entity")}" ->
        (s"e${r.getAs[Int]("nearest_id")}",
          r.getAs[Double]("nearest_dist"))).toMap
    val fromExpr = FeatureStore.nearestDistance(
      strIds, Seq("frameKey"), "entity", "px", "py").collect()
      .map(r => r.getAs[String]("entity") ->
        (r.getAs[String]("nearest_id"),
          r.getAs[Double]("nearest_dist"))).toMap
    assert(fromKernel == fromExpr)
    assert(fromKernel("e2") == (("e1", 4.0))) // equidistant → smaller id
  }

  test("nearest distance: NaN distances lose to real ones in the kernel") {
    // entity 1 sits at NaN → d(2,1) is NaN; entity 2's nearest must be
    // the REAL distance to 3, not a sticky NaN first candidate
    val frame = Seq((1L, 1, Double.NaN, 0.0), (1L, 2, 0.0, 0.0),
      (1L, 3, 3.0, 4.0)).toDF("frameKey", "entity", "px", "py")
    val nd = FeatureStore.nearestDistance(frame, Seq("frameKey"), "entity",
      "px", "py").collect()
      .map(r => r.getAs[Int]("entity") ->
        (r.getAs[Int]("nearest_id"), r.getAs[Double]("nearest_dist"))).toMap
    assert(nd(2) == ((3, 5.0)))
    assert(nd(3) == ((2, 5.0)))
    // the expression fallback (string ids) must agree: struct-min also
    // orders NaN after real distances
    val ndE = FeatureStore.nearestDistance(
      frame.withColumn("entity", concat(lit("e"), col("entity"))),
      Seq("frameKey"), "entity", "px", "py").collect()
      .map(r => r.getAs[String]("entity") ->
        (r.getAs[String]("nearest_id"), r.getAs[Double]("nearest_dist")))
      .toMap
    assert(ndE("e2") == (("e3", 5.0)))
    assert(ndE("e3") == (("e2", 5.0)))
  }

  test("nearest distance: null coordinates skipped identically by both paths") {
    // entity 3 has a null x: both paths must drop it as source AND
    // neighbor (not let a null distance win the min)
    val geoInt = Seq((1L, Some(1), Some(0.0), Some(0.0)),
      (1L, Some(2), Some(5.0), Some(0.0)), (1L, Some(3), None, Some(1.0)))
      .toDF("frameKey", "entity", "px", "py")
    val geoStr = Seq((1L, "e1", Some(0.0), Some(0.0)),
      (1L, "e2", Some(5.0), Some(0.0)), (1L, "e3", None, Some(1.0)))
      .toDF("frameKey", "entity", "px", "py")
    val k = FeatureStore.nearestDistance(geoInt, Seq("frameKey"), "entity",
      "px", "py").collect().map(r => s"e${r.getAs[Int]("entity")}" ->
        (s"e${r.getAs[Int]("nearest_id")}", r.getAs[Double]("nearest_dist")))
      .toMap
    val e = FeatureStore.nearestDistance(geoStr, Seq("frameKey"), "entity",
      "px", "py").collect().map(r => r.getAs[String]("entity") ->
        (r.getAs[String]("nearest_id"), r.getAs[Double]("nearest_dist")))
      .toMap
    assert(k == e)
    assert(k == Map("e1" -> (("e2", 5.0)), "e2" -> (("e1", 5.0))))
  }

  test("distanceTo reference entity (ball-distance shape)") {
    val frame = Seq(
      (1L, 1, 0.0, 0.0, false), (1L, 2, 3.0, 4.0, false),
      (1L, 99, 0.0, 0.0, true))
      .toDF("frameKey", "entity", "px", "py", "isRef")
    val d = FeatureStore.distanceTo(frame, Seq("frameKey"),
      col("isRef") === true, "px", "py")
      .filter(!col("isRef"))
      .collect().map(r => r.getAs[Int]("entity") ->
        r.getAs[Double]("dist_to_ref")).toMap
    assert(d == Map(1 -> 0.0, 2 -> 5.0))
  }

  test("writeZordered: disjoint z-ranges per file, rows round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("zw").toString
    val df = (for { x <- 0 until 32; y <- 0 until 32 }
      yield (x, y)).toDF("x", "y")
    graft.operators.Relational.writeZordered(df, dir, "x", "y",
      files = 4, bits = 5)
    assert(spark.read.parquet(dir).count() == 1024)
    val filesZ = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map { f =>
        val z = spark.read.parquet(f.getPath)
          .select(graft.operators.Relational
            .zorderValue(col("x"), col("y"), bits = 5).as("z"))
          .agg(min("z"), max("z")).head()
        (z.getLong(0), z.getLong(1))
      }.sortBy(_._1)
    assert(filesZ.length == 4)
    // range partitioning on z → per-file z intervals do not overlap,
    // which is exactly what makes row-group min/max stats prune 2-D
    // range predicates
    filesZ.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi < lo2)
      case _ =>
    }
  }

  test("robustOutliers: median/MAD flag the planted spike, not the " +
    "tail-free group") {
    val df = (Seq(1.0, 2.0, 3.0, 4.0, 100.0).map(("a", _)) ++
      Seq(10.0, 11.0, 12.0).map(("b", _))).toDF("g", "v")
    val got = graft.operators.Relational
      .robustOutliers(df, Seq("g"), "v", c = 3.0)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
      .toMap
    // a: median 3, residuals (2,1,0,1,97) → MAD 1 → only 100 exceeds 3·1
    assert(got("a") == ((5L, 3.0, 1.0, 1L)))
    // b: median 11, MAD 1, no residual exceeds 3
    assert(got("b") == ((3L, 11.0, 1.0, 0L)))
  }

  test("funnel: greedy-earliest ordered stages; out-of-order events " +
    "do not convert") {
    def t(s: Long) = new Timestamp(s * 1000L)
    val ev = Seq(
      (1L, t(1), 1L, "view", 0.0, "{}"),     // u1 full funnel
      (2L, t(2), 1L, "click", 0.0, "{}"),
      (3L, t(3), 1L, "purchase", 0.0, "{}"),
      (4L, t(1), 2L, "click", 0.0, "{}"),    // u2: click BEFORE view —
      (5L, t(2), 2L, "view", 0.0, "{}"),     //   only the later click counts
      (6L, t(5), 2L, "click", 0.0, "{}"),
      (7L, t(2), 3L, "purchase", 0.0, "{}"), // u3: purchase before view
      (8L, t(4), 3L, "view", 0.0, "{}"),
      (9L, t(1), 4L, "click", 0.0, "{}"))    // u4 never views
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = graft.streaming.EventOps
      .funnel(ev, Seq("view", "click", "purchase"))
      .collect().map(r => r.getInt(0) ->
        (r.getString(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(0) == (("view", 3L, 1.0)))       // u1, u2, u3
    assert(got(1) == (("click", 2L, 0.666667))) // u1, u2 (click after view)
    assert(got(2) == (("purchase", 1L, 0.333333))) // u1 only
    // conversion window: u2's click is 3s after the view — a 1-minute
    // window keeps it, but a window shorter than the gap drops it while
    // u1's 1s gaps survive
    val bounded = graft.streaming.EventOps
      .funnel(ev, Seq("view", "click", "purchase"),
        maxGapMinutes = Some(1L))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(bounded == Map(0 -> 3L, 1 -> 2L, 2 -> 1L))
    // (u2: view@2 → click@5 is 3s; shrink the unit by moving the
    // events apart instead — view@2, click@5 both fit 60s, so craft a
    // tighter case: gap > window via a 61s-later click)
    val ev2 = Seq(
      (1L, t(1), 1L, "view", 0.0, "{}"),
      (2L, t(70), 1L, "click", 0.0, "{}")) // 69s after the view
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val tight = graft.streaming.EventOps
      .funnel(ev2, Seq("view", "click"), maxGapMinutes = Some(1L))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(tight == Map(0 -> 1L, 1 -> 0L)) // conversion outside window
  }

  test("funnel with a gap is any-chain, not greedy-earliest: a later " +
    "prior-stage hit can carry the conversion the earliest one misses") {
    def t(s: Long) = new Timestamp(s * 1000L)
    // u1: earliest view@1 → click@70 is 69s (outside a 60s window), but
    // view@65 → click@70 is 5s — the user DOES convert via the later
    // view; min-only stage tables would drop them
    val ev = Seq(
      (1L, t(1), 1L, "view", 0.0, "{}"),
      (2L, t(65), 1L, "view", 0.0, "{}"),
      (3L, t(70), 1L, "click", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = graft.streaming.EventOps
      .funnel(ev, Seq("view", "click"), maxGapMinutes = Some(1L))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(got == Map(0 -> 1L, 1 -> 1L))
  }

  test("funnel matches a brute-force driver reference on randomized " +
    "event sets, for both the unbounded and the gap-windowed flavor") {
    val rnd = new scala.util.Random(11)
    val stages = Seq("view", "click", "purchase")
    val events = (1L to 400L).map { i =>
      val u = rnd.nextInt(30).toLong
      val ty = stages(rnd.nextInt(3))
      val ts = 1L + rnd.nextInt(300)
      (i, new Timestamp(ts * 1000L), u, ty, 0.0, "{}")
    }
    val df = events
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val byUser = events.groupBy(_._3).view.mapValues(_.map(e =>
      (e._4, e._2.getTime / 1000L)))
    // reference: per user, the reachable-timestamp sets S_i (any-chain;
    // for gap = None this equals the greedy-earliest chain's reach)
    def refCounts(gap: Option[Long]): Map[Int, Long] =
      stages.indices.map { i =>
        val n = byUser.count { case (_, evs) =>
          var s: Set[Long] =
            evs.filter(_._1 == stages.head).map(_._2).toSet
          for (j <- 1 to i if s.nonEmpty) {
            val prev = s
            s = evs.filter(_._1 == stages(j)).map(_._2).toSet
              .filter(t => prev.exists(p => t > p &&
                gap.forall(g => t <= p + g * 60L)))
          }
          s.nonEmpty
        }
        i -> n.toLong
      }.toMap
    for (gap <- Seq(None, Some(1L), Some(3L))) {
      val got = graft.streaming.EventOps
        .funnel(df, stages, maxGapMinutes = gap)
        .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
      assert(got == refCounts(gap), s"gap=$gap: $got vs ${refCounts(gap)}")
    }
  }

  test("funnel is one lazy plan: construction launches no jobs, and a " +
    "zero-user stage still reports a row") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    def t(s: Long) = new Timestamp(s * 1000L)
    val ev = Seq((1L, t(1), 1L, "view", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    spark.sparkContext.addSparkListener(listener)
    try {
      val df = graft.streaming.EventOps
        .funnel(ev, Seq("view", "click", "purchase"))
      Thread.sleep(500) // let any stray job-start events reach the bus
      assert(jobs.get() == 0,
        s"funnel construction ran ${jobs.get()} jobs — must be lazy")
      val rows = df.collect().map(r =>
        (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      assert(rows.toSet == Set(
        (0, "view", 1L, 1.0),
        (1, "click", 0L, 0.0),
        (2, "purchase", 0L, 0.0)))
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("retention: first-seen day defines the cohort; repeat activity " +
    "within a day collapses") {
    def t(day: Long, h: Int) =
      new Timestamp((day * 86400L + h * 3600L) * 1000L)
    val ev = Seq(
      (1L, t(0, 1), 1L, "view", 0.0, "{}"),  // u1: days 0, 1
      (2L, t(0, 5), 1L, "view", 0.0, "{}"),  //   (same-day repeat)
      (3L, t(1, 2), 1L, "view", 0.0, "{}"),
      (4L, t(0, 3), 2L, "view", 0.0, "{}"),  // u2: day 0 only
      (5L, t(1, 4), 3L, "view", 0.0, "{}"))  // u3: cohort day 1
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = graft.streaming.EventOps.retention(ev)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // day-0 cohort = {u1, u2}: both on offset 0, only u1 on offset 1
    assert(got((0L, 0L)) == ((2L, 1.0)))
    assert(got((0L, 1L)) == ((1L, 0.5)))
    // day-1 cohort = {u3}
    assert(got((1L, 0L)) == ((1L, 1.0)))
    assert(got.size == 3)
  }

  test("corpusDiff: all four statuses from one digest-only outer join") {
    val old = Seq((1L, "same"), (2L, "before"), (3L, "gone"))
      .toDF("doc_id", "text")
    val nw = Seq((1L, "same"), (2L, "after"), (4L, "fresh"))
      .toDF("doc_id", "text")
    val got = graft.operators.Relational
      .corpusDiff(old, nw, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  test("zorderValue interleaves bits (x even, y odd) and orders locality") {
    val z = Seq((3, 5), (0, 0), (1023, 1023))
      .toDF("x", "y")
      .select(graft.operators.Relational
        .zorderValue(col("x"), col("y"), bits = 10).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // x=3 (bits 1,1), y=5 (bits 1,0,1):
    // z = 1·1 + 1·2 + 1·4 + 0·8 + 0·16 + 1·32 = 39
    assert(z == Seq(39L, 0L, (1L << 20) - 1))
  }

  test("touchAttribution: first/last picks, lookback cutoff, organic " +
    "NULLs, post-conversion touches ignored") {
    val evs = Seq(
      // user 1: view -> click -> purchase (both inside the 1h window)
      (10L, ts("2024-01-02 10:15:00"), 1L, "view", 0.0, "{}"),
      (11L, ts("2024-01-02 10:30:00"), 1L, "click", 0.0, "{}"),
      (12L, ts("2024-01-02 11:00:00"), 1L, "purchase", 9.0, "{}"),
      // user 2: ancient view outside 1h lookback, recent click inside
      (20L, ts("2024-01-02 06:00:00"), 2L, "view", 0.0, "{}"),
      (21L, ts("2024-01-02 10:50:00"), 2L, "click", 0.0, "{}"),
      (22L, ts("2024-01-02 11:00:00"), 2L, "purchase", 9.0, "{}"),
      // user 3: organic purchase (touch only AFTER the conversion)
      (30L, ts("2024-01-02 11:00:00"), 3L, "purchase", 9.0, "{}"),
      (31L, ts("2024-01-02 12:00:00"), 3L, "view", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.touchAttribution(evs, Seq("view", "click"),
      "purchase", lookbackSec = 3600L, binWidthSec = 3600L)
      .collect().map(r => r.getLong(0) ->
        (Option(r.getString(2)), Option(r.getString(3)))).toMap
    assert(got(12L) == (Some("view"), Some("click")), got)
    assert(got(21L + 1L) == (Some("click"), Some("click")), got)
    assert(got(30L) == (None, None), got)
  }

  test("touchAttribution: same-timestamp touches break ties by " +
    "event_id; touch AT the conversion instant counts") {
    val evs = Seq(
      (1L, ts("2024-01-03 10:00:00"), 5L, "click", 0.0, "{}"),
      (2L, ts("2024-01-03 10:00:00"), 5L, "view", 0.0, "{}"),
      (3L, ts("2024-01-03 10:30:00"), 5L, "purchase", 9.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventOps.touchAttribution(evs, Seq("view", "click"),
      "purchase", lookbackSec = 7200L).first()
    assert(r.getString(2) == "click") // event_id 1 wins first-touch
    assert(r.getString(3) == "view")  // event_id 2 wins last-touch
  }
  test("winsorizedStats: hand-computed clip thresholds, counts and " +
    "micro-exact mean") {
    import graft.operators.Relational
    // group g: 1..10 -> p10 = 1.9, p90 = 9.1 (quantile_cont), so 1
    // clips up and 10 clips down
    val df = (1 to 10).map(i => ("g", i.toDouble)).toDF("k", "value")
    val r = Relational.winsorizedStats(df, Seq("k"), "value",
      0.1, 0.9).first()
    assert(r.getLong(1) == 10L)              // n
    assert(r.getLong(2) == 1L && r.getLong(3) == 1L) // clipped lo/hi
    // sum = 1.9 + 2..9 + 9.1 = 55.0 -> 55_000_000 micro
    assert(r.getLong(4) == 55000000L, r)
    assert(r.getDouble(5) == 5.5, r)
  }

  test("intervalOverlapJoin: bin-spanning pairs appear exactly once; " +
    "boundary touch counts; disjoint never joins") {
    import graft.operators.Relational
    val left = Seq(("k", 1L, 0L, 1000L), ("k", 2L, 50L, 60L))
      .toDF("grp", "l_id", "l_lo", "l_hi")
    val right = Seq(("k", 10L, 990L, 2000L), ("k", 11L, 60L, 70L),
      ("k", 12L, 3000L, 4000L))
      .toDF("grp", "r_id", "r_lo", "r_hi")
    val got = Relational.intervalOverlapJoin(left, right, Seq("grp"),
      "l_lo", "l_hi", "r_lo", "r_hi", binWidth = 16L)
      .select("l_id", "r_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // interval 1 spans ~63 bins and overlaps right 10 across many
    // bins -> must appear exactly once
    assert(got.count(_ == ((1L, 10L))) == 1, got.toSeq)
    assert(got.contains((1L, 11L)))        // nested overlap
    assert(got.contains((2L, 11L)))        // touch at 60 counts
    assert(!got.exists(_._2 == 12L))       // disjoint
    assert(got.length == 3, got.toSeq)
  }
  test("resampleDaily: per-user spans gap-fill with zeros and stay " +
    "independent") {
    val evs = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 1.0, "{}"),
      (2L, ts("2024-01-01 11:00:00"), 1L, "view", 1.0, "{}"),
      (3L, ts("2024-01-04 10:00:00"), 1L, "view", 1.0, "{}"),
      (4L, ts("2024-02-10 10:00:00"), 2L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.resampleDaily(evs).collect()
      .map(r => (r.getLong(0), r.getDate(1).toString) -> r.getLong(2))
      .toMap
    assert(got((1L, "2024-01-01")) == 2L)
    assert(got((1L, "2024-01-02")) == 0L) // gap filled
    assert(got((1L, "2024-01-03")) == 0L)
    assert(got((1L, "2024-01-04")) == 1L)
    assert(got((2L, "2024-02-10")) == 1L)
    assert(got.size == 5) // user 2's span is its own single day
  }

  test("ewmaDaily: hand-computed fold over a gappy series") {
    // user 1 daily counts after gap fill: [2, 0, 0, 1]
    val evs = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 1.0, "{}"),
      (2L, ts("2024-01-01 11:00:00"), 1L, "view", 1.0, "{}"),
      (3L, ts("2024-01-04 10:00:00"), 1L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventOps.ewmaDaily(evs, alpha = 0.3).first()
    assert(r.getInt(1) == 4)
    assert(r.getDate(2).toString == "2024-01-04")
    val expect = {
      var s = 2.0
      for (x <- Seq(0.0, 0.0, 1.0)) s = s * 0.7 + x * 0.3
      BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }
    assert(r.getDouble(3) == expect, (r.getDouble(3), expect))
  }
  test("linearFit: perfect line recovers slope/intercept/corr " +
    "exactly; zero variance yields NULLs; built-in corr agrees") {
    import graft.operators.Relational
    val line = (1L to 20L).map(x => ("g", x, 2 * x + 3))
      .toDF("k", "x", "y")
    val r = Relational.linearFit(line, Seq("k"), col("x"), col("y"))
      .first()
    assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 2.0 &&
      r.getDouble(4) == 3.0, r)
    val flat = Seq(("g", 1L, 5L), ("g", 1L, 7L)).toDF("k", "x", "y")
    val f = Relational.linearFit(flat, Seq("k"), col("x"), col("y"))
      .first()
    assert(f.isNullAt(2) && f.isNullAt(3) && f.isNullAt(4), f)
    // noisy data: match Spark's float-accumulated corr to 1e-6
    val rnd = new scala.util.Random(7)
    val noisy = (1L to 500L).map(x =>
      ("g", x, 3 * x + rnd.nextInt(100).toLong)).toDF("k", "x", "y")
    val mine = Relational.linearFit(noisy, Seq("k"), col("x"),
      col("y")).first().getDouble(2)
    val builtin = noisy.agg(corr(col("x").cast("double"),
      col("y").cast("double"))).first().getDouble(0)
    assert(math.abs(mine - builtin) < 1e-6, (mine, builtin))
  }

  test("cohortLtv: cumulative revenue accrues within a cohort and " +
    "never leaks across cohorts") {
    import graft.streaming.EventOps
    val day = 86400L
    def ev(id: Long, u: Long, sec: Long, v: Double) =
      (id, new java.sql.Timestamp(sec * 1000L), u, "buy", v, "{}")
    // cohort day 0: u1 spends 1.0 on day 0 and 2.0 on day 1
    // cohort day 1: u2 spends 10.0 on day 1
    val df = Seq(ev(1, 1, 0, 1.0), ev(2, 1, day, 2.0),
      ev(3, 2, day, 10.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.cohortLtv(df).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got((0L, 0L)) == ((1L, 1000000L, 1000000L)), got)
    assert(got((0L, 1L)) == ((1L, 2000000L, 3000000L)), got)
    assert(got((1L, 0L)) == ((1L, 10000000L, 10000000L)), got)
    assert(got.size == 3)
  }

  test("leadLagCorrelation: a planted 1-day shift pins corr 1.0 at " +
    "lag +1 and below 1 elsewhere") {
    import graft.streaming.EventOps
    val day = 86400L
    // clicks on days 0..5 with counts 1,2,3,1,2,3; purchases shifted
    // +1 day with the same profile → perfect corr at lag +1
    val counts = Seq(1, 2, 3, 1, 2, 3)
    var id = 0L
    val rows = scala.collection.mutable.Buffer[
      (Long, java.sql.Timestamp, Long, String, Double, String)]()
    counts.zipWithIndex.foreach { case (c, d2) =>
      (0 until c).foreach { _ =>
        id += 1
        rows += ((id, new java.sql.Timestamp(d2 * day * 1000), 1L,
          "click", 1.0, "{}"))
        id += 1
        rows += ((id, new java.sql.Timestamp((d2 + 1) * day * 1000),
          1L, "purchase", 1.0, "{}"))
      }
    }
    val df = rows.toSeq
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.leadLagCorrelation(df, "click", "purchase",
      maxLag = 2).collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(2)) Double.NaN
        else r.getDouble(2))).toMap
    assert(got(1) == 1.0, got)
    assert(got.filter(_._1 != 1).values.forall(v =>
      v.isNaN || v < 1.0), got)
  }

  test("rfm + abTest: hand-computed integers; z sign follows the " +
    "winning variant; degenerate pools are NULL") {
    import graft.streaming.EventOps
    val day = 86400L
    def ev(id: Long, u: Long, sec: Long, k: String, v: Double) =
      (id, new java.sql.Timestamp(sec * 1000L), u, k, v, "{}")
    // u0 (variant a): active days 0..2, no purchase
    // u1 (variant b): day 2 only, purchases
    // u2 (variant a): day 1, purchases; u3 (variant b): no purchase
    val df = Seq(
      ev(1, 0, 0, "view", 1.5), ev(2, 0, 2 * day, "view", 1.0),
      ev(3, 1, 2 * day, "purchase", 2.0),
      ev(4, 2, 1 * day, "purchase", 0.5),
      ev(5, 3, 2 * day, "view", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rfm = EventOps.rfm(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(rfm(0L) == ((0L, 2L, 2500000L, 2L)), rfm(0L))
    assert(rfm(1L) == ((0L, 1L, 2000000L, 0L)), rfm(1L))
    assert(rfm(2L) == ((1L, 1L, 500000L, 0L)), rfm(2L))
    val ab = EventOps.abTest(df, col("user_id") % 2 === 1,
      col("event_type") === "purchase").first()
    // variant a (even users 0,2): 1/2 convert; b (1,3): 1/2 convert
    assert(ab.getLong(0) == 2L && ab.getLong(1) == 1L &&
      ab.getLong(2) == 2L && ab.getLong(3) == 1L, ab)
    assert(ab.getDouble(4) == 0.5 && ab.getDouble(5) == 0.5)
    assert(ab.getLong(6) == 0L, ab) // equal rates → z exactly 0
    // all-convert pool → NULL z
    val allConv = EventOps.abTest(df, col("user_id") % 2 === 1,
      lit(true)).first()
    assert(allConv.isNullAt(6), allConv)
  }

  test("groupZScores: symmetric two-point group pins z = ±1·√…, " +
    "constant group drops, ranking is |z| then id") {
    import graft.operators.Relational
    // group g: {0, 10} → mean 5, n·σ-chain: num = ±10, den = sqrt(2·100−100)=10 → z = ±1
    // group h constant → zero variance → filtered
    val df = Seq((1L, "g", 0L), (2L, "g", 10L),
      (3L, "h", 5L), (4L, "h", 5L)).toDF("id", "k", "v")
    val got = Relational.groupZScores(df, Seq("k"), col("v"), "id",
      topK = 10).collect()
    assert(got.length == 2, got.mkString(";"))
    val byId = got.map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(byId(1L) == -1.0 && byId(2L) == 1.0, byId)
    // ties on |z| break on id: id 1 first
    assert(got.head.getLong(0) == 1L)
  }

  test("entryExitReport: gap splits sessions, bounce counts " +
    "single-event sessions, entry/exit pick the ordered endpoints") {
    import graft.streaming.EventOps
    val base = 1700000000000L
    def ev(id: Long, u: Long, sec: Long, k: String) =
      (id, new java.sql.Timestamp(base + sec * 1000), u, k, 1.0, "{}")
    val df = Seq(
      // u1 session 1: a…b (10 min apart); session 2 (2h later): c only
      ev(1, 1, 0, "a"), ev(2, 1, 600, "b"), ev(3, 1, 8000, "c"),
      // u2: one session a→a
      ev(4, 2, 0, "a"), ev(5, 2, 60, "a"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.entryExitReport(df, gapMinutes = 30).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(
      ("a", "b") -> ((1L, 0L)),
      ("c", "c") -> ((1L, 1L)),
      ("a", "a") -> ((1L, 0L))), got)
  }

  test("topJourneys: sliding 3-windows stay within a user, ties " +
    "break on path order") {
    import graft.streaming.EventOps
    val base = 1700000000000L
    def ev(id: Long, u: Long, k: String) =
      (id, new java.sql.Timestamp(base + id * 1000), u, k, 1.0, "{}")
    // u1: a b c d → (a,b,c), (b,c,d); u2: a b c → (a,b,c)
    val df = Seq(ev(1, 1, "a"), ev(2, 1, "b"), ev(3, 1, "c"),
      ev(4, 1, "d"), ev(5, 2, "a"), ev(6, 2, "b"), ev(7, 2, "c"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.topJourneys(df, steps = 3, topK = 10).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    assert(got.toSeq == Seq(("a", "b", "c", 2L), ("b", "c", "d", 1L)),
      got.toSeq)
  }

  test("associationRules: hand-computed support/confidence/lift; " +
    "repeat events collapse into the basket") {
    import graft.streaming.EventOps
    val ts = new java.sql.Timestamp(1700000000000L)
    val ev = Seq(
      (1L, "a"), (1L, "a"), (1L, "b"), // repeats collapse
      (2L, "a"), (2L, "b"),
      (3L, "a"),
      (4L, "b"), (4L, "c"))
      .zipWithIndex.map { case ((u, k), i) =>
        (i.toLong, ts, u, k, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.associationRules(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(got.size == 2, got.keys)
    val ab = got(("a", "b"))
    assert(ab.getLong(2) == 3L && ab.getLong(3) == 3L &&
      ab.getLong(4) == 2L && ab.getLong(5) == 4L, ab)
    assert(ab.getDouble(6) == 0.5 && ab.getDouble(7) == 0.666667 &&
      ab.getDouble(8) == 0.666667 && ab.getDouble(9) == 0.888889, ab)
    val bc = got(("b", "c"))
    assert(bc.getDouble(7) == 0.333333 && bc.getDouble(8) == 1.0 &&
      bc.getDouble(9) == 1.333333, bc)
  }

  test("seasonalAnomalies: planted slot outlier ranks first with the " +
    "exact residual; on-profile slots read zero") {
    import graft.streaming.EventOps
    val base = 1700000000L // fixed slot anchor
    def ev(id: Long, sec: Long, v: Double) =
      (id, new java.sql.Timestamp(sec * 1000L), 1L, "e", v, "{}")
    val df = (
      // slot A (same hour): 1, 1, 10 → mean 4, outlier resid 6
      Seq(ev(1, base, 1.0), ev(2, base + 60, 1.0),
        ev(3, base + 120, 10.0)) ++
      // slot B (next hour): 2, 2 → resid 0
      Seq(ev(4, base + 3600, 2.0), ev(5, base + 3660, 2.0))
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.seasonalAnomalies(df, topK = 5).collect()
    assert(got.length == 5)
    assert(got.head.getLong(0) == 3L && got.head.getLong(3) == 3L &&
      got.head.getDouble(4) == 6.0, got.head)
    // the two on-profile slot-B rows read exactly zero
    val zero = got.filter(r => r.getLong(0) >= 4L)
    assert(zero.forall(_.getDouble(4) == 0.0), zero.mkString(";"))
    // slot-A non-outliers: (1·3 − 12)/3 = −3
    assert(got.filter(_.getLong(0) == 1L).head.getDouble(4) == -3.0)
  }

  test("psiDrift: identical snapshots score exactly 0; a mass shift " +
    "scores positive and symmetrically; n_bins spans the union") {
    import graft.operators.Relational
    val a = (0 until 40).map(i => ("g", (i % 4) * 100L))
      .toDF("k", "v")
    val same = Relational.psiDrift(a, a, Seq("k"), col("v"), 100L)
      .first()
    assert(same.getLong(4) == 0L && same.getDouble(5) == 0.0, same)
    // shift: all mass moves to two new bins
    val b = (0 until 40).map(i => ("g", 400L + (i % 2) * 100L))
      .toDF("k", "v")
    val ab = Relational.psiDrift(a, b, Seq("k"), col("v"), 100L)
      .first()
    val ba = Relational.psiDrift(b, a, Seq("k"), col("v"), 100L)
      .first()
    assert(ab.getDouble(5) > 0.25, ab) // disjoint supports: way past 0.25
    assert(ab.getDouble(5) == ba.getDouble(5), (ab, ba))
    assert(ab.getLong(3) == 6L, ab) // 4 old bins + 2 new bins
  }

  test("burstiness: periodic user pins -1, bursty user positive, " +
    "degenerate users NULL") {
    import graft.streaming.EventOps
    val base = 1700000000L
    def ev(id: Long, u: Long, sec: Long) =
      (id, new java.sql.Timestamp(sec * 1000L), u, "e", 1.0, "{}")
    val df = (
      // u1 periodic: gaps 60,60,60 → sigma 0 → exactly -1
      Seq(ev(1, 1, base), ev(2, 1, base + 60), ev(3, 1, base + 120),
        ev(4, 1, base + 180)) ++
      // u2 bursty: gaps 0,0,0,100
      Seq(ev(5, 2, base), ev(6, 2, base), ev(7, 2, base),
        ev(8, 2, base), ev(9, 2, base + 100)) ++
      // u3 one gap → NULL; u4 all-same-ts pair → NULL (0/0)
      Seq(ev(10, 3, base), ev(11, 3, base + 5)) ++
      Seq(ev(12, 4, base), ev(13, 4, base))
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.burstiness(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getDouble(4) == -1.0, got(1L))
    val nSig = math.sqrt(4.0 * 10000 - 100.0 * 100)
    val expB = BigDecimal((nSig - 100.0) / (nSig + 100.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(2L).getLong(1) == 4L && got(2L).getLong(2) == 100L &&
      got(2L).getLong(3) == 10000L, got(2L))
    assert(got(2L).getDouble(4) == expB, (got(2L).getDouble(4), expB))
    assert(got(3L).isNullAt(4) && got(4L).isNullAt(4))
  }

  test("transitionMatrix: per-user consecutive pairs only, ties " +
    "broken on event_id, probabilities row-normalize") {
    import graft.streaming.EventOps
    val base = 1700000000000L
    val ev = Seq(
      // u1: a b a — same ts for the first two, id breaks the tie
      (1L, base, 1L, "a"), (2L, base, 1L, "b"),
      (3L, base + 1000, 1L, "a"),
      // u2: a b ; u3: a c
      (4L, base, 2L, "a"), (5L, base + 500, 2L, "b"),
      (6L, base, 3L, "a"), (7L, base + 500, 3L, "c"))
      .map { case (id, ts, u, k) =>
        (id, new java.sql.Timestamp(ts), u, k, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.transitionMatrix(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got.size == 3, got)
    assert(got(("a", "b")) == ((2L, 3L, 0.666667)), got)
    assert(got(("a", "c")) == ((1L, 3L, 0.333333)), got)
    assert(got(("b", "a")) == ((1L, 1L, 1.0)), got)
  }

  test("hillTailIndex: hand-computed micro-nat fold on {100,10,1}; " +
    "degenerate flat tail yields NULL; exact Pareto recovers alpha") {
    import graft.operators.Relational
    val df = Seq(("a", 100L), ("b", 10L), ("c", 1L)).toDF("t", "v")
    val r = Relational.hillTailIndex(df, col("v"), col("t"), k = 2)
      .first()
    // unat(100)+unat(10)+unat(1) = 4605170 + 2302585 + 0
    assert(r.getLong(0) == 2L && r.getLong(1) == 1L, r)
    assert(r.getLong(2) == 6907755L, r)
    assert(r.getDouble(3) ==
      BigDecimal(2000000.0 / 6907755L)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, r)
    val flat = Seq(("a", 7L), ("b", 7L), ("c", 7L)).toDF("t", "v")
    val f = Relational.hillTailIndex(flat, col("v"), col("t"), k = 2)
      .first()
    assert(f.getLong(2) == 0L && f.isNullAt(3), f)
    // exact Pareto tail x_i = 2^(20 - i): ln-ratio steps are ln 2, so
    // alpha = k / (k(k+1)/2 · ln2 / k)… just check the known closed
    // form: sum = Σ_{i=1..k} (k+1-i)·ln2 terms — recovered within the
    // micro-nat snap
    val par = (0 until 12).map(i => (s"p$i", 1L << (20 - i)))
      .toDF("t", "v")
    val p = Relational.hillTailIndex(par, col("v"), col("t"), k = 8)
      .first()
    val ln2u = math.round(math.log(2.0) * 1e6 * 1) // per-step snap…
    // sum over i=1..8 of unat(2^(20-i)) - 9·unat(2^11): each term i
    // contributes round(ln(2^(20-i))·1e6) exactly
    val s = (0 to 8).map(i => math.round(math.log(
      math.pow(2.0, 20 - i)) * 1e6)).sum -
      9L * math.round(math.log(math.pow(2.0, 12)) * 1e6)
    assert(p.getLong(2) == s, (p.getLong(2), s, ln2u))
  }
}
