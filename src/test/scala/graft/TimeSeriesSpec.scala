package graft

import org.apache.spark.sql.functions._

import graft.operators.{Relational, TimeSeries}

/** Unit coverage for the time-series screen family (q237-q241):
  * Mann-Kendall trend, CUSUM changepoint, lag-k autocorrelation,
  * Kaplan-Meier survival, and the order-free dataset fingerprint —
  * hand-computed fixtures for the algebra, plus the invariances
  * (ordering, partitioning) the operators promise.
  */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def series(rows: (String, Long, Long)*) =
    rows.toDF("g", "day", "v")

  test("mannKendallTrend: monotone series hit S = ±n(n-1)/2, a " +
    "constant series has zero variance and NULL z") {
    val s = series(
      (1L to 5L).map(d => ("up", d, d)) ++
        (1L to 5L).map(d => ("down", d, 10L - d)) ++
        (1L to 5L).map(d => ("flat", d, 7L)): _*)
    val m = TimeSeries.mannKendallTrend(s, "g")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(m("up").getAs[Long]("s_stat") == 10L)
    assert(m("up").getAs[Long]("var18") == 300L) // 5·4·15, no ties
    // z = (10-1)/sqrt(300/18) = 9/4.0825 = 2.204541
    assert(m("up").getAs[Long]("z_micro") == 2204541L)
    assert(m("down").getAs[Long]("s_stat") == -10L)
    assert(m("down").getAs[Long]("z_micro") == -2204541L)
    assert(m("flat").getAs[Long]("s_stat") == 0L)
    assert(m("flat").getAs[Long]("var18") == 0L) // one 5-wide tie
    assert(m("flat").isNullAt(m("flat").fieldIndex("z_micro")))
  }

  test("cusumChangepoint finds the step day with the exact integer " +
    "deviation; ties resolve to the earliest day") {
    val s = series(
      ((0L to 3L).map(d => ("step", d, 0L)) ++
        (4L to 7L).map(d => ("step", d, 10L))): _*)
    val r = TimeSeries.cusumChangepoint(s, "g").head()
    assert(r.getAs[Long]("n_days") == 8L)
    assert(r.getAs[Long]("mean_micro") == 5000000L)
    assert(r.getAs[Long]("cp_day") == 3L)
    assert(r.getAs[Long]("max_dev_micro") == 20000000L)
  }

  test("autocorrByGroup: an alternating series reads acf(1) = -(n-1)/n " +
    "and acf(2) = +(n-2)/n; a constant series yields NULL") {
    val s = series(
      ((1L to 6L).map(d => ("alt", d, if (d % 2 == 0) 3L else 1L)) ++
        (1L to 6L).map(d => ("flat", d, 5L))): _*)
    val m = TimeSeries.autocorrByGroup(s, "g", maxLag = 2)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r).toMap
    assert(m(("alt", 1)).getAs[Long]("n_pairs") == 5L)
    assert(m(("alt", 1)).getAs[Double]("acf") == -0.833333)
    assert(m(("alt", 2)).getAs[Double]("acf") == 0.666667)
    assert(m(("flat", 1)).isNullAt(m(("flat", 1)).fieldIndex("acf")))
  }

  test("logRankTest: hand hypergeometric moments on a 4-user two-arm " +
    "cohort; equal arms give z ~ 0; empty variance gives NULL") {
    // A (even users): u2 lifetime 1, u4 lifetime 2; B: u1 lifetime 2,
    // u3 lifetime 3 (ends on the horizon -> censored)
    val ev = Seq((2L, 0L), (4L, 0L), (4L, 1L), (1L, 0L), (1L, 1L),
      (3L, 0L), (3L, 1L), (3L, 2L)).toDF("u", "d")
      .select(col("u"), timestamp_seconds(col("d") * 86400L).as("ts"))
    val r = TimeSeries.logRankTest(ev, "u", col("ts"),
      col("u") % 2 === 0).head()
    assert(r.getAs[Long]("n_users") == 4L && r.getAs[Long]("n_a") == 2L)
    // t=1: d=1 (A), at-risk 4/2 -> e = 0.5, v = 0.25
    // t=2: d=2 (1 A, 1 B), at-risk 3/1 -> e = 2/3, v = 2/9
    assert(r.getAs[Long]("o_a") == 2L)
    assert(r.getAs[Long]("e_a_micro") == 500000L + 666667L, r)
    assert(r.getAs[Long]("v_micro") == 250000L + 222222L, r)
    val oMinusE = (2L * 1000000L - r.getAs[Long]("e_a_micro"))
      .toDouble / 1e6
    val want = math.round(oMinusE /
      math.sqrt(r.getAs[Long]("v_micro").toDouble / 1e6) * 1e6)
    assert(r.getAs[Long]("z_micro") == want, r)
    // one-arm cohort: no variance -> NULL z, exact counts intact
    val one = Seq((2L, 0L), (4L, 0L), (4L, 1L)).toDF("u", "d")
      .select(col("u"), timestamp_seconds(col("d") * 86400L).as("ts"))
    val r1 = TimeSeries.logRankTest(one, "u", col("ts"), lit(true))
      .head()
    assert(r1.getAs[Long]("n_a") == 2L)
    assert(r1.isNullAt(5) && r1.isNullAt(6), r1)
  }

  test("stratifiedLogRank: a confounded cohort reads a strong effect " +
    "unstratified and none once platform-stratified; pooled HR " +
    "tracks the same flip") {
    // Platform 0 churns fast (lifetimes 3/4 days), platform 1 slowly
    // (11/12 days). Group A is 8/10 on platform 0, group B 8/10 on
    // platform 1 — but WITHIN each platform the two arms draw the
    // same lifetime distribution, so the only "effect" is the mix.
    // uids: A-p0 0..7, A-p1 8..9, B-p0 10..11, B-p1 12..19.
    val rows = ((0L to 7L) ++ Seq(10L, 11L)).map(u =>
        (u, 0L, if (u % 2 == 0) 2L else 3L)) ++ // platform 0
      (Seq(8L, 9L) ++ (12L to 19L)).map(u =>
        (u, 0L, if (u % 2 == 0) 10L else 11L))  // platform 1
    val ev = rows.toDF("u", "f", "l")
      .select(col("u"), explode(array(col("f"), col("l"))).as("d"))
      .select(col("u"), timestamp_seconds(col("d") * 86400L).as("ts"))
      .localCheckpoint()
    val isA = col("u") < 10L
    val platform = when(col("u") < 8L || col("u") === 10L ||
      col("u") === 11L, 0L).otherwise(1L)
    val flat = TimeSeries.logRankTest(ev, "u", col("ts"), isA).head()
    val strat = TimeSeries.stratifiedLogRank(ev, "u", col("ts"), isA,
      platform).head()
    assert(strat.getAs[Long]("n_users") == 20L &&
      strat.getAs[Long]("n_a") == 10L &&
      strat.getAs[Long]("n_strata") == 2L)
    // unstratified: A "churns faster" far past the 1.96 line
    assert(math.abs(flat.getAs[Long]("z_micro")) > 1960000L, flat)
    // stratified: the mix explains it away — verdict flips
    assert(math.abs(strat.getAs[Long]("z_micro")) < 1960000L, strat)
    // pooled HR agrees: strongly > 1 unstratified, near 1 stratified
    val hrFlat = TimeSeries.hazardRatio(ev, "u", col("ts"), isA)
      .head().getAs[Long]("hr_micro")
    val hrStrat = strat.getAs[Long]("hr_micro")
    assert(hrFlat > 2000000L, s"unstratified HR $hrFlat")
    assert(hrStrat < 2000000L && hrStrat > 500000L,
      s"stratified HR $hrStrat")
    // the stratified CI brackets its point estimate
    assert(strat.getAs[Long]("lo_micro") <= hrStrat &&
      hrStrat <= strat.getAs[Long]("hi_micro"))
  }

  test("kaplanMeier: censored users leave the at-risk set without " +
    "counting as churn; survival follows the product limit") {
    // u1 lifetime 1 (churn), u2 lifetime 2 (churn), u3 lifetime 3
    // ending on the horizon day -> censored
    val ev = Seq((1L, 0L), (2L, 0L), (2L, 1L), (3L, 0L), (3L, 2L))
      .toDF("u", "d")
      .select(col("u"), timestamp_seconds(col("d") * 86400L).as("ts"))
    val rows = TimeSeries.kaplanMeier(ev, "u", col("ts"))
      .orderBy("t_day").collect()
    assert(rows.map(_.getAs[Long]("t_day")).toSeq == Seq(1L, 2L, 3L))
    assert(rows.map(_.getAs[Long]("n_at_risk")).toSeq == Seq(3L, 2L, 1L))
    assert(rows.map(_.getAs[Long]("n_churned")).toSeq == Seq(1L, 1L, 0L))
    assert(rows.map(_.getAs[Long]("n_censored")).toSeq == Seq(0L, 0L, 1L))
    val s = rows.map(_.getAs[Double]("survival")).toSeq
    assert(s(0) == 0.666667) // 1 - 1/3
    assert(s(1) == 0.333333) // 2/3 · 1/2
    assert(s(2) == 0.333333) // censoring does not move the curve
  }

  test("rmst: area under the KM curve with the pre-event segment, " +
    "step clamping at tau, and the tail extension") {
    // u1 lifetime 5 (censored at horizon day 4), u2 lifetime 1 (churn)
    // KM: S = 1 on [0,1), S = 0.5 from t = 1 on
    val ev = Seq((1L, 0L), (1L, 4L), (2L, 0L)).toDF("u", "d")
      .select(col("u"), timestamp_seconds(col("d") * 86400L).as("ts"))
    // τ = 3: 1·1 + 0.5·2 = 2.0 days
    val r3 = TimeSeries.rmst(ev, "u", col("ts"), 3L).head()
    assert(r3.getAs[Long]("tau_day") == 3L)
    assert(r3.getAs[Long]("n_users") == 2L)
    assert(r3.getAs[Long]("rmst_micro") == 2000000L, r3)
    // τ = 10: 1·1 + 0.5·9 = 5.5 days (the last step extends to τ)
    val r10 = TimeSeries.rmst(ev, "u", col("ts"), 10L).head()
    assert(r10.getAs[Long]("rmst_micro") == 5500000L, r10)
    // τ below the first event time: the whole area is the S=1 head
    val r1 = TimeSeries.rmst(ev, "u", col("ts"), 1L).head()
    assert(r1.getAs[Long]("rmst_micro") == 1000000L, r1)
  }

  test("theilSenSlope: a clean linear series reads the exact slope; " +
    "one planted outlier in a flat series does not move the median") {
    val s = series(
      ((1L to 4L).map(d => ("lin", d, 2L * d)) ++
        Seq(("flat", 1L, 5L), ("flat", 2L, 5L), ("flat", 3L, 5L),
          ("flat", 4L, 5L), ("flat", 5L, 100L))): _*)
    val m = TimeSeries.theilSenSlope(s, "g")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(m(("lin")).getAs[Long]("n_pairs") == 6L)
    assert(m(("lin")).getAs[Long]("slope_micro") == 2000000L)
    // 10 pairs, 6 of them flat: both middle slopes are 0
    assert(m(("flat")).getAs[Long]("slope_micro") == 0L)
  }

  test("decomposeDaily: a pure weekly sawtooth decomposes into a flat " +
    "trend, the exact dow pattern, and zero residuals; incomplete " +
    "windows report NULL components") {
    // 28 days of v = 10 + (day % 7): every 7-day window sums to the
    // same total, so the centered MA is flat at 13 and the seasonal
    // means recover (day%7 − 3) exactly
    val s = series((0L until 28L).map(d => ("saw", d, 10L + d % 7)): _*)
    val got = TimeSeries.decomposeDaily(s, "g", halfWindow = 3)
      .collect().map(r => r.getLong(1) -> r).toMap
    // edges (< 3 days of context) are NULL
    (0L to 2L) ++ (25L to 27L) foreach { d =>
      assert(got(d).isNullAt(3) && got(d).isNullAt(4) && got(d).isNullAt(5),
        s"day $d should have NULL components")
    }
    (3L to 24L).foreach { d =>
      assert(got(d).getAs[Long]("trend_micro") == 13000000L, s"day $d")
      assert(got(d).getAs[Long]("seasonal_micro") ==
        (d % 7 - 3L) * 1000000L, s"day $d")
      assert(got(d).getAs[Long]("resid_micro") == 0L, s"day $d")
    }
    // a gap wider than the window kills the trend around it
    val gappy = series((0L to 6L).map(d => ("g1", d, 5L)) ++
      Seq(("g1", 20L, 5L)): _*)
    val g = TimeSeries.decomposeDaily(gappy, "g", halfWindow = 3)
      .collect().map(r => r.getLong(1) -> r).toMap
    assert(g(3L).getAs[Long]("trend_micro") == 5000000L)
    assert(g(20L).isNullAt(3)) // isolated day: window of 1
  }

  test("nelsonAalen: hand cumulative hazard on a 3-user cohort; the " +
    "censored user adds risk mass but no hazard") {
    def t(day: Long) = new java.sql.Timestamp(day * 86400L * 1000L)
    // u1 lifetime 1, u2 lifetime 2, u3 lifetime 3 ending at the
    // horizon (censored)
    val ev = Seq((1L, t(0)), (2L, t(0)), (2L, t(1)), (3L, t(0)),
      (3L, t(2))).toDF("user_id", "ts")
    val got = graft.operators.TimeSeries.nelsonAalen(ev, "user_id",
      col("ts")).collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // t=1: 3 at risk, 1 churn -> H = 333333; t=2: 2 at risk, 1 churn
    // -> +500000; t=3: 1 at risk, 0 churn (censored) -> unchanged
    assert(got(1L) == ((3L, 1L, 0L, 333333L)), got)
    assert(got(2L) == ((2L, 1L, 0L, 833333L)), got)
    assert(got(3L) == ((1L, 0L, 1L, 833333L)), got)
  }

  test("seasonalNaiveBacktest: an exactly-periodic series scores " +
    "zero error; a spike contributes its exact micro terms; " +
    "both-zero days score sMAPE 0") {
    val s = series(
      ((0L to 5L).map(d => ("per", d, 10L + 10L * (d % 2))) ++
        Seq(("sp", 0L, 4L), ("sp", 1L, 0L), ("sp", 2L, 4L),
          ("sp", 3L, 0L), ("sp", 4L, 12L), ("sp", 5L, 0L))): _*)
    val got = graft.operators.TimeSeries
      .seasonalNaiveBacktest(s, "g", period = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got("per") == ((4L, 0L, 0L)), got)
    // sp pairs: d2 (4 vs 4: ae 0, sm 0), d3 (0 vs 0: BOTH zero -> 0),
    // d4 (12 vs 4: ae 8, sm 2*8/16 = 1e6), d5 (0 vs 0 -> 0)
    // mae = round(8e6/4) = 2000000; smape = round(1e6/4) = 250000
    assert(got("sp") == ((4L, 2000000L, 250000L)), got)
  }

  test("welchTTest: hand moments give the exact t and " +
    "Welch-Satterthwaite df; a variant with n < 2 yields NULL") {
    import graft.operators.Relational
    // A = {0, 2} (mean 1, var 2), B = {10, 14} (mean 12, var 8):
    // se2 = 1 + 4 = 5, t = -11/sqrt(5) = -4.919350, df = 25/17
    val df = Seq((true, 0L), (true, 2L), (false, 10L), (false, 14L))
      .toDF("a", "v")
    val r = Relational.welchTTest(df, col("a"), col("v")).head()
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Long]("mean_a_micro") == 1000000L)
    assert(r.getAs[Long]("mean_b_micro") == 12000000L)
    assert(r.getAs[Long]("t_micro") == -4919350L)
    assert(r.getAs[Long]("df_micro") == 1470588L)
    val degen = Seq((true, 1L), (false, 2L), (false, 3L)).toDF("a", "v")
    val d = Relational.welchTTest(degen, col("a"), col("v")).head()
    assert(d.isNullAt(d.fieldIndex("t_micro")))
  }

  test("datasetFingerprint is order- and partitioning-invariant, and " +
    "any changed row moves it") {
    val base = Seq((1L, "a", "g"), (2L, "b", "g"), (3L, "c", "g"))
      .toDF("id", "txt", "g")
    val fp = Relational.datasetFingerprint(base, "g", Seq("id", "txt"))
      .head()
    val shuffled = Relational.datasetFingerprint(
      base.orderBy(col("txt").desc).repartition(5), "g",
      Seq("id", "txt")).head()
    assert(fp.getAs[Long]("fingerprint") ==
      shuffled.getAs[Long]("fingerprint"))
    assert(fp.getAs[Long]("n_rows") == 3L)
    val changed = Relational.datasetFingerprint(
      Seq((1L, "a", "g"), (2L, "X", "g"), (3L, "c", "g"))
        .toDF("id", "txt", "g"), "g", Seq("id", "txt")).head()
    assert(fp.getAs[Long]("fingerprint") !=
      changed.getAs[Long]("fingerprint"))
  }

  test("datasetFingerprint: duplicate PAIRS cancel under XOR — the " +
    "documented caveat n_rows exists to catch") {
    val dup = Seq((1L, "a", "g"), (1L, "a", "g"), (2L, "b", "g"))
      .toDF("id", "txt", "g")
    val single = Seq((2L, "b", "g")).toDF("id", "txt", "g")
    val a = Relational.datasetFingerprint(dup, "g", Seq("id", "txt"))
      .head()
    val b = Relational.datasetFingerprint(single, "g", Seq("id", "txt"))
      .head()
    assert(a.getAs[Long]("fingerprint") == b.getAs[Long]("fingerprint"))
    assert(a.getAs[Long]("n_rows") != b.getAs[Long]("n_rows"))
  }
}
