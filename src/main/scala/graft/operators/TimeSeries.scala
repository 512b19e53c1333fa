package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-series screens over per-group daily metric series — the
  * monitoring family a data pipeline runs on its own telemetry
  * (ingest volumes, error rates, conversion counts): monotone-trend
  * detection (Mann-Kendall), changepoint location (CUSUM), and
  * autocorrelation, plus Kaplan-Meier survival over user lifetimes.
  *
  * Scale shape shared by the whole family: the corpus contributes ONE
  * groupBy to the `(group, period)` grain; every statistic then
  * operates on that bounded series table (|groups| × |periods| rows —
  * thousands, regardless of corpus size). Pairwise constructions
  * (Mann-Kendall's sign pairs, ACF's lagged products) are self-joins
  * of the SERIES table, never of the corpus; windows partition by
  * group over ≤|periods| rows. Everything folds to exact integers
  * (micro-snapped once) so results hash-gate across engines.
  */
object TimeSeries {

  /** Collapse an event frame to the per-(group, day) count series the
    * screens consume: `(group, day, v)` with `day` the UTC epoch day.
    */
  def dailyCounts(df: DataFrame, groupCol: String, tsCol: Column)
      : DataFrame =
    df.select(col(groupCol),
      floor(unix_timestamp(tsCol) / lit(86400L)).cast("long").as("day"))
      .groupBy(col(groupCol), col("day"))
      .agg(count(lit(1)).as("v"))

  /** Mann-Kendall trend test per group (Mann 1945, Kendall 1975; the
    * standard nonparametric monotone-trend screen — no linearity or
    * normality assumption): S = Σ_{i<j} sign(v_j − v_i) over the
    * day-ordered series, with the tie-corrected variance
    * 18·Var = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5). The pair grid is a
    * SERIES self-join on the group key (day_i < day_j rides the equi
    * key) — |periods|²/2 rows per group, bounded by construction, the
    * corpus itself never joins. Z uses the standard continuity
    * correction ((S−1)/σ for S>0, (S+1)/σ for S<0, 0 at S=0),
    * micro-snapped. Groups with n < 2 or zero variance yield NULL z.
    *
    * Input: `(group, day, v)` (e.g. [[dailyCounts]]).
    * Output: group, `n_days`, `s_stat`, `var18` (18·Var, exact
    * integer), `z_micro`.
    */
  def mannKendallTrend(series: DataFrame, groupCol: String): DataFrame = {
    val s = series.select(col(groupCol), col("day"),
      col("v").cast("long").as("v")).persist() // pairs + ties + n
    val a = s.select(col(groupCol), col("day").as("_d1"),
      col("v").as("_v1"))
    val b = s.select(col(groupCol), col("day").as("_d2"),
      col("v").as("_v2"))
    val pairs = a.join(b, Seq(groupCol))
      .filter(col("_d1") < col("_d2"))
      .groupBy(col(groupCol))
      .agg(sum(signum(col("_v2") - col("_v1")).cast("long"))
        .as("s_stat"))
    val ties = s.groupBy(col(groupCol), col("v"))
      .agg(count(lit(1)).as("_t"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("_nvals"), sum(col("_t")).as("_n"),
        sum(col("_t") * (col("_t") - 1L) * (lit(2L) * col("_t") + 5L))
          .as("_tieterm"))
    val joined = ties.join(pairs, Seq(groupCol), "left")
    val n = col("_n")
    val var18 = n * (n - 1L) * (lit(2L) * n + 5L) - col("_tieterm")
    val sStat = coalesce(col("s_stat"), lit(0L))
    val sigma = sqrt(var18.cast("double") / lit(18.0))
    joined.select(col(groupCol), n.as("n_days"), sStat.as("s_stat"),
      var18.as("var18"),
      when(n < 2L || var18 <= 0L, lit(null).cast("long"))
        .otherwise(round(
          when(sStat > 0L, (sStat - 1L).cast("double") / sigma)
            .when(sStat < 0L, (sStat + 1L).cast("double") / sigma)
            .otherwise(lit(0.0)) * lit(1000000.0)).cast("long"))
        .as("z_micro"))
  }

  /** CUSUM changepoint screen per group (Page 1954's cumulative-sum
    * chart, the offline max-deviation form): with the group mean
    * micro-snapped ONCE (exact integer), the cumulative deviation
    * C_d = Σ_{day≤d} (v·10⁶ − mean_micro) is an EXACT integer prefix
    * sum — the changepoint is the day with the largest |C_d|, ties to
    * the earliest day. The only window partitions by group over the
    * bounded series; the argmax is a struct max, no sort.
    *
    * Output: group, `n_days`, `mean_micro`, `cp_day` (epoch day of
    * max |C|), `max_dev_micro`.
    */
  def cusumChangepoint(series: DataFrame, groupCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = series.select(col(groupCol), col("day"),
      col("v").cast("long").as("v")).persist() // totals + prefix pass
    val tot = s.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_days"), sum(col("v")).as("_sum"))
      .select(col(groupCol), col("n_days"),
        round(col("_sum").cast("double") * lit(1000000.0) /
          col("n_days").cast("double")).cast("long").as("mean_micro"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dev = s.join(tot, Seq(groupCol))
      .withColumn("_c",
        sum(col("v") * lit(1000000L) - col("mean_micro")).over(w))
    dev.groupBy(col(groupCol))
      .agg(min(col("n_days")).as("n_days"),
        min(col("mean_micro")).as("mean_micro"),
        max(struct(abs(col("_c")).as("a"), (-col("day")).as("nd")))
          .as("_best"))
      .select(col(groupCol), col("n_days"), col("mean_micro"),
        (-col("_best").getField("nd")).as("cp_day"),
        col("_best").getField("a").as("max_dev_micro"))
  }

  /** Lag-k autocorrelation per group over the day series, lags
    * 1..maxLag: r_k = Σ (x_d − m)(x_{d+k} − m) / Σ (x_d − m)² with the
    * mean micro-snapped once, so numerator and denominator are exact
    * integer sums (micro² units) and r_k is ONE division. The moment
    * sums run in DECIMAL(38,0): x is micro-scaled, so x·x tops 2⁶³ as
    * soon as a day deviates ~3×10⁹ micro-units from the group mean —
    * a Long would wrap silently there (while a SQL oracle's 128-bit
    * sum keeps going) and the acf would be silently wrong; decimal
    * keeps the product exact to 10³⁸ and overflows to NULL, never to
    * garbage. Lagged
    * pairs come from a series self-join on `(group, day + k)` — an
    * EQUI join on the bounded table, gaps in the series simply drop
    * pairs (the standard irregular-series convention). Zero-variance
    * groups yield NULL.
    *
    * Output: group, `lag`, `n_pairs`, `acf`.
    */
  def autocorrByGroup(series: DataFrame, groupCol: String,
      maxLag: Int = 3): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val s = series.select(col(groupCol), col("day"),
      col("v").cast("long").as("v")).persist() // mean + 1+maxLag joins
    val mean = s.groupBy(col(groupCol))
      .agg(round(sum(col("v")).cast("double") * lit(1000000.0) /
        count(lit(1)).cast("double")).cast("long").as("_m"))
    val centered = s.join(mean, Seq(groupCol))
      .select(col(groupCol), col("day"),
        (col("v") * lit(1000000L) - col("_m")).as("_x"))
      .persist() // denominator + one join per lag
    // decimal(19,0) holds any long exactly; the product promotes to
    // decimal(38,0), so a 3e9-micro deviation squared (9.2e18 > 2⁶³)
    // stays exact instead of wrapping
    val xd = col("_x").cast("decimal(19,0)")
    val denom = centered.groupBy(col(groupCol))
      .agg(sum(xd * xd).as("_den"))
    (1 to maxLag).map { k =>
      val lagged = centered.select(col(groupCol),
        (col("day") - k.toLong).as("day"), col("_x").as("_y"))
      centered.join(lagged, Seq(groupCol, "day"))
        .groupBy(col(groupCol))
        .agg(count(lit(1)).as("n_pairs"),
          sum(xd * col("_y").cast("decimal(19,0)")).as("_num"))
        .join(denom, Seq(groupCol))
        .select(col(groupCol), lit(k).as("lag"), col("n_pairs"),
          when(col("_den") === 0L, lit(null).cast("double"))
            .otherwise(round(col("_num").cast("double") /
              col("_den").cast("double"), 6)).as("acf"))
    }.reduce(_ unionByName _)
  }

  /** STL-lite additive seasonal-trend decomposition of the per-group
    * day series (the moving-average skeleton of Cleveland et al.'s
    * STL, 1990 — without the loess robustness loop, which would cost
    * float iteration for little at daily grain): `trend` is the
    * centered (2·halfWindow+1)-day moving average over a RANGE window
    * on the day number (gaps shrink the window; edges and gappy spans
    * without the full span report NULL — the honest convention),
    * `seasonal` is the per-(group, day-of-week) mean of the detrended
    * series, `resid` is what remains. Everything is exact-integer
    * micro units with one fixed division per component, so the
    * decomposition hash-gates.
    *
    * Input: (group, day, v) as produced by the daily resample; output
    * adds `trend_micro`, `seasonal_micro`, `resid_micro` (NULL where
    * the trend window is incomplete). Windows are group-partitioned —
    * never global.
    */
  def decomposeDaily(series: DataFrame, groupCol: String,
      halfWindow: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(halfWindow >= 1, s"halfWindow must be >= 1, got $halfWindow")
    val span = 2 * halfWindow + 1
    val s = series.select(col(groupCol),
      col("day").cast("long").as("day"), col("v").cast("long").as("v"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("day"))
      .rangeBetween(-halfWindow.toLong, halfWindow.toLong)
    val trended = s
      .withColumn("_wn", count(lit(1)).over(w))
      .withColumn("_ws", sum(col("v")).over(w))
      .withColumn("trend_micro",
        when(col("_wn") === span,
          round(col("_ws").cast("double") * lit(1000000.0) /
            lit(span.toDouble)).cast("long")))
      .withColumn("_det", col("v") * lit(1000000L) - col("trend_micro"))
      .withColumn("_dow", pmod(col("day"), lit(7L)))
    val seasonal = trended.filter(col("_det").isNotNull)
      .groupBy(col(groupCol), col("_dow"))
      .agg(round(sum(col("_det")).cast("double") /
        count(lit(1)).cast("double")).cast("long").as("seasonal_micro"))
    trended.join(seasonal, Seq(groupCol, "_dow"), "left")
      .select(col(groupCol), col("day"), col("v"), col("trend_micro"),
        when(col("trend_micro").isNotNull, col("seasonal_micro"))
          .as("seasonal_micro"),
        (col("_det") - col("seasonal_micro")).as("resid_micro"))
  }

  /** Theil-Sen robust slope per group (Theil 1950, Sen 1968 — the
    * median of all pairwise slopes; up to ~29% contamination does not
    * move it, so one bad day never fakes a trend the way it drags an
    * OLS fit): pairwise slopes come from the SAME bounded series
    * self-join Mann-Kendall uses, each slope micro-snapped ONCE to an
    * integer, and the median reads off the sorted slope array
    * (|periods|²/2 elements per group, bounded by construction —
    * collect_list here never sees the corpus). Even pair counts take
    * the rounded midpoint of the two middle slopes.
    *
    * Output: group, `n_pairs`, `slope_micro` (units of v per day,
    * micro-snapped; NULL when the series has < 2 points).
    */
  def theilSenSlope(series: DataFrame, groupCol: String): DataFrame = {
    val s = series.select(col(groupCol), col("day"),
      col("v").cast("long").as("v"))
    val a = s.select(col(groupCol), col("day").as("_d1"),
      col("v").as("_v1"))
    val b = s.select(col(groupCol), col("day").as("_d2"),
      col("v").as("_v2"))
    val slopes = a.join(b, Seq(groupCol))
      .filter(col("_d1") < col("_d2"))
      .select(col(groupCol),
        round((col("_v2") - col("_v1")).cast("double") * lit(1000000.0) /
          (col("_d2") - col("_d1")).cast("double")).cast("long")
          .as("_sl"))
    val packed = slopes.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_pairs"),
        sort_array(collect_list(col("_sl"))).as("_arr"))
    val n = col("n_pairs")
    val lo = element_at(col("_arr"), ((n + 1L) / 2L).cast("int"))
    val hi = element_at(col("_arr"), (n / 2L + 1L).cast("int"))
    packed.select(col(groupCol), col("n_pairs"),
      when(n === 0L, lit(null).cast("long"))
        .otherwise(round((lo + hi).cast("double") / lit(2.0))
          .cast("long")).as("slope_micro"))
  }

  /** Kaplan-Meier survival over user lifetimes (Kaplan & Meier 1958),
    * the retention curve a product pipeline reports: lifetime =
    * last-activity day − first-activity day + 1 per user, with users
    * still active on the LAST observed day right-censored (their
    * lifetime is a lower bound, so they leave the at-risk set without
    * counting as churn — dropping them instead biases survival down).
    * S(t) = Π_{i≤t} (1 − d_i/n_i) folds as an exact-integer chain:
    * each factor's ln is micro-snapped, the prefix sum is integer
    * addition, and ONE exp at the end produces the estimate — no
    * engine-varying float accumulation anywhere.
    *
    * The corpus contributes one per-user groupBy; everything after
    * runs on the ≤|distinct lifetimes| event table. Output (one row
    * per distinct event time t): `t_day`, `n_at_risk`, `n_churned`,
    * `n_censored`, `survival`.
    */
  def kaplanMeier(df: DataFrame, userCol: String, tsCol: Column)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val atRisk = lifetimeAtRisk(df, userCol, tsCol)
    // ln(1 − d/n) micro-snapped per step, exact integer prefix sum,
    // one exp at the end (survival hits exactly 0 when d = n)
    val step = when(col("n_churned") === col("n_at_risk"),
      lit(null).cast("long"))
      .otherwise(round(log(lit(1.0) -
        col("n_churned").cast("double") /
          col("n_at_risk").cast("double")) * lit(1000000.0))
        .cast("long"))
    val wc = Window.orderBy(col("t_day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    atRisk.withColumn("_lnstep", step)
      .withColumn("_lnsum", sum(col("_lnstep")).over(wc))
      .withColumn("_dead",
        max(when(col("_lnstep").isNull, 1L).otherwise(0L)).over(wc))
      .select(col("t_day"), col("n_at_risk"), col("n_churned"),
        col("n_censored"),
        when(col("_dead") === 1L, lit(0.0))
          .otherwise(round(
            exp(col("_lnsum").cast("double") / lit(1000000.0)), 6))
          .as("survival"))
  }

  /** Hazard ratio + 95% CI from the log-rank moments (the Pike /
    * one-step estimator `ln HR = (O−E)/V`, `SE = 1/√V` — the effect
    * size [[logRankTest]]'s verdict needs beside its p-value: "group
    * A churns 1.3× faster", not just "differently"). One fixed double
    * chain on the already-exact O/E/V micro moments. Output (one
    * row): `(n_users, n_a, hr_micro, lo_micro, hi_micro)` — NULL when
    * the log-rank variance is 0.
    */
  def hazardRatio(df: DataFrame, userCol: String, tsCol: Column,
      isA: Column): DataFrame = {
    val lr = logRankTest(df, userCol, tsCol, isA)
    val lnhr = (col("o_a") * 1000000L - col("e_a_micro"))
      .cast("double") / col("v_micro").cast("double")
    val se = sqrt(lit(1000000.0) / col("v_micro").cast("double"))
    def snap(c: Column) = round(c * lit(1000000.0)).cast("long")
    lr.select(col("n_users"), col("n_a"),
      when(col("v_micro") <= 0L, lit(null).cast("long"))
        .otherwise(snap(exp(lnhr))).as("hr_micro"),
      when(col("v_micro") <= 0L, lit(null).cast("long"))
        .otherwise(snap(exp(lnhr - lit(1.959964) * se)))
        .as("lo_micro"),
      when(col("v_micro") <= 0L, lit(null).cast("long"))
        .otherwise(snap(exp(lnhr + lit(1.959964) * se)))
        .as("hi_micro"))
  }

  /** Restricted mean survival time (RMST; Royston & Parmar 2013 made
    * it the standard reporting companion of [[kaplanMeier]]): the area
    * under the KM curve up to a horizon τ — "average days retained in
    * the first τ days", the single number an A/B retention readout
    * quotes when median survival is undefined (fewer than half churn).
    *
    * Computed off the KM table itself (bounded distinct-lifetime
    * rows): the pre-first-event segment `[0, t₁)` contributes at
    * S = 1, each step interval `[tᵢ, tᵢ₊₁)` (clamped to τ, the last
    * extending to τ) contributes `S(tᵢ)·Δt` with the already-snapped
    * micro survival times the EXACT integer day width — no new float
    * folds, so the area hash-gates. Output (one row):
    * `(tau_day, n_users, rmst_micro)` — RMST in micro-days.
    */
  def rmst(df: DataFrame, userCol: String, tsCol: Column,
      tauDays: Long): DataFrame = {
    require(tauDays > 0, s"tauDays must be positive, got $tauDays")
    import org.apache.spark.sql.expressions.Window
    val km = kaplanMeier(df, userCol, tsCol)
    val w = Window.orderBy(col("t_day"))
    val stepped = km.select(col("t_day"), col("n_at_risk"),
      round(col("survival") * lit(1000000.0)).cast("long").as("_sm"))
      .withColumn("_next", lead(col("t_day"), 1).over(w))
    val from = least(col("t_day"), lit(tauDays))
    val to = least(coalesce(col("_next"), lit(tauDays)), lit(tauDays))
    val iv = greatest(to - from, lit(0L))
    stepped.agg(
      max(col("n_at_risk")).as("n_users"), // at-risk at t₁ = everyone
      min(col("t_day")).as("_t1"),
      sum(col("_sm") * iv).as("_area"))
      .select(lit(tauDays).as("tau_day"), col("n_users"),
        (least(col("_t1"), lit(tauDays)) * 1000000L + col("_area"))
          .as("rmst_micro"))
  }

  /** The censored-lifetime → at-risk machinery [[kaplanMeier]] and
    * [[nelsonAalen]] share: per-user lifetimes (right-censored at the
    * last observed day), per-t ends / censored / churned counts, and
    * the suffix at-risk counts — the windows run over the bounded
    * distinct-lifetime table, never the corpus.
    */
  private def lifetimeAtRisk(df: DataFrame, userCol: String,
      tsCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val days = df.select(col(userCol).as("_u"),
      floor(unix_timestamp(tsCol) / lit(86400L)).cast("long").as("_d"))
    val users = days.groupBy(col("_u"))
      .agg(min(col("_d")).as("_first"), max(col("_d")).as("_last"))
      .persist() // lifetime table + the 1-row horizon
    val horizon = users.agg(max(col("_last")).as("_h"))
    val lifetimes = users.crossJoin(broadcast(horizon))
      .select((col("_last") - col("_first") + 1L).as("t_day"),
        (col("_last") === col("_h")).cast("long").as("_cens"))
    val perT = lifetimes.groupBy(col("t_day"))
      .agg(count(lit(1)).as("_ends"),
        sum(col("_cens")).as("n_censored"),
        (count(lit(1)) - sum(col("_cens"))).as("n_churned"))
      .persist() // at-risk suffix + the output
    val total = perT.agg(sum(col("_ends")).as("_n"))
    val w = Window.orderBy(col("t_day"))
      .rowsBetween(Window.unboundedPreceding, -1L)
    // at-risk = everyone whose lifetime has not ended strictly before
    // t; the window runs over the bounded distinct-lifetime table
    perT.crossJoin(broadcast(total))
      .withColumn("n_at_risk",
        col("_n") - coalesce(sum(col("_ends")).over(w), lit(0L)))
  }

  /** Nelson-Aalen cumulative hazard (Nelson 1972, Aalen 1978):
    * `H(t) = Σ_{tᵢ≤t} dᵢ/nᵢ` over the same censored lifetime table as
    * [[kaplanMeier]] — the estimator of choice when hazard RATES
    * drive the decision (churn intensity, failure-rate monitoring)
    * rather than survival fractions, and the numerically gentler one
    * near small at-risk sets (no log of a near-zero survivor
    * fraction). Each step `dᵢ/nᵢ` micro-snaps once; the cumulative
    * sum is exact integer addition, so the curve hash-gates.
    *
    * Output per distinct event time: `t_day`, `n_at_risk`,
    * `n_churned`, `n_censored`, `cumhaz_micro`.
    */
  def nelsonAalen(df: DataFrame, userCol: String, tsCol: Column)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wc = Window.orderBy(col("t_day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lifetimeAtRisk(df, userCol, tsCol)
      .withColumn("_hstep",
        round(col("n_churned").cast("double") * lit(1000000.0) /
          col("n_at_risk").cast("double")).cast("long"))
      .select(col("t_day"), col("n_at_risk"), col("n_churned"),
        col("n_censored"),
        sum(col("_hstep")).over(wc).as("cumhaz_micro"))
  }

  /** Log-rank test (Mantel 1966 / Peto & Peto 1972) — the standard
    * two-group survival comparison on top of the [[kaplanMeier]] /
    * [[nelsonAalen]] censored-lifetime machinery: at every distinct
    * event time the A-group's observed churn is compared to its
    * at-risk-proportional expectation under H₀ (equal hazards), and
    * `z = (O_A − E_A)/√V` aggregates the per-time hypergeometric
    * moments — the test an A/B retention experiment reports instead
    * of eyeballing two KM curves.
    *
    * Exactness + scale discipline: per-user lifetimes (right-censored
    * at the global horizon) reduce to the bounded distinct-lifetime
    * table per GROUP; at-risk suffix counts are windows over that
    * bounded table (the q241 whitelist shape — days, not users);
    * `e`/`v` terms micro-snap per time and sum exactly; observed
    * counts stay exact integers; z and χ² are one fixed double chain.
    * `isA` must be user-constant (it folds with `max` per user).
    *
    * Output (one row): `(n_users, n_a, o_a, e_a_micro, v_micro,
    * z_micro, chi2_micro)` — NULL z/χ² when no variance (one group
    * empty or no churn).
    */
  def logRankTest(df: DataFrame, userCol: String, tsCol: Column,
      isA: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val days = df.select(col(userCol).as("_u"),
      floor(unix_timestamp(tsCol) / lit(86400L)).cast("long").as("_d"),
      isA.as("_ga"))
    val users = days.groupBy(col("_u"))
      .agg(min(col("_d")).as("_first"), max(col("_d")).as("_last"),
        max(col("_ga")).as("_a"))
      .persist() // lifetime table + the 1-row horizon + user counts
    val horizon = users.agg(max(col("_last")).as("_h"))
    val lt = users.crossJoin(broadcast(horizon))
      .select((col("_last") - col("_first") + 1L).as("t_day"),
        (col("_last") === col("_h")).cast("long").as("_cens"),
        col("_a"))
    val perT = lt.groupBy(col("t_day"))
      .agg(count(lit(1)).as("_ends"),
        sum(when(col("_a"), 1L).otherwise(0L)).as("_ends_a"),
        (count(lit(1)) - sum(col("_cens"))).as("_dt"),
        sum(when(col("_a") && col("_cens") === 0L, 1L).otherwise(0L))
          .as("_da"))
      .persist() // at-risk suffixes + the moment fold
    val tot = perT.agg(sum(col("_ends")).as("_n"),
      sum(col("_ends_a")).as("_na")).localCheckpoint()
    val w = Window.orderBy(col("t_day"))
      .rowsBetween(Window.unboundedPreceding, -1L)
    val risk = perT.crossJoin(broadcast(tot))
      .withColumn("_rn",
        col("_n") - coalesce(sum(col("_ends")).over(w), lit(0L)))
      .withColumn("_rna",
        col("_na") - coalesce(sum(col("_ends_a")).over(w), lit(0L)))
    val frac = col("_rna").cast("double") / col("_rn").cast("double")
    val eTerm = round(col("_dt").cast("double") * frac *
      lit(1000000.0)).cast("long")
    val vTerm = when(col("_rn") <= 1L, 0L).otherwise(
      round(col("_dt").cast("double") * frac * (lit(1.0) - frac) *
        (col("_rn") - col("_dt")).cast("double") /
        (col("_rn") - 1L).cast("double") * lit(1000000.0))
        .cast("long"))
    val m = risk.filter(col("_dt") > 0)
      .agg(coalesce(sum(col("_da")), lit(0L)).as("o_a"),
        coalesce(sum(eTerm), lit(0L)).as("e_a_micro"),
        coalesce(sum(vTerm), lit(0L)).as("v_micro"))
    val counts = users.agg(count(lit(1)).as("n_users"),
      sum(when(col("_a"), 1L).otherwise(0L)).as("n_a"))
    val z = ((col("o_a") * 1000000L - col("e_a_micro")).cast("double") /
      lit(1000000.0)) /
      sqrt(col("v_micro").cast("double") / lit(1000000.0))
    counts.crossJoin(broadcast(m))
      .select(col("n_users"), col("n_a"), col("o_a"),
        col("e_a_micro"), col("v_micro"),
        when(col("v_micro") <= 0L, lit(null).cast("long"))
          .otherwise(round(z * lit(1000000.0)).cast("long"))
          .as("z_micro"),
        when(col("v_micro") <= 0L, lit(null).cast("long"))
          .otherwise(round(z * z * lit(1000000.0)).cast("long"))
          .as("chi2_micro"))
  }

  /** Stratified log-rank test + hazard ratio (Mantel 1966 extended
    * the obvious way; Collett, "Modelling Survival Data" §2.8): the
    * covariate-adjusted two-group survival comparison for cohorts
    * that differ in composition — per-time hypergeometric O/E/V
    * moments are computed WITHIN each stratum (each stratum gets its
    * own at-risk suffixes and its own censoring against the global
    * horizon) and then SUMMED across strata before the z / χ² / HR
    * fold, so a stratum that merely has a different baseline hazard
    * contributes nothing to the verdict ([[TimeSeriesSpec]] pins a
    * confounded example where the unstratified [[logRankTest]] reads
    * a strong effect and stratification reads none). The HR is the
    * same one-step Pike estimator as [[hazardRatio]], now on the
    * pooled moments — the standard covariate-adjusted effect size.
    *
    * Exactness + scale discipline: identical to [[logRankTest]] —
    * bounded distinct-(stratum, lifetime) tables, micro-snapped e/v
    * terms, exact integer observed counts, one fixed double chain
    * each for z and HR — with every window now PARTITIONED by
    * stratum (strictly more parallel than the unstratified global
    * window). `isA` and `stratum` must be user-constant (both fold
    * with `max` per user).
    *
    * Output (one row): `(n_users, n_a, n_strata, o_a, e_a_micro,
    * v_micro, z_micro, chi2_micro, hr_micro, lo_micro, hi_micro)` —
    * NULL z/χ²/HR/CI when no variance.
    */
  def stratifiedLogRank(df: DataFrame, userCol: String, tsCol: Column,
      isA: Column, stratum: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val days = df.select(col(userCol).as("_u"),
      floor(unix_timestamp(tsCol) / lit(86400L)).cast("long").as("_d"),
      isA.as("_ga"), stratum.as("_s"))
    val users = days.groupBy(col("_u"))
      .agg(min(col("_d")).as("_first"), max(col("_d")).as("_last"),
        max(col("_ga")).as("_a"), max(col("_s")).as("_st"))
      .persist() // lifetime table + the 1-row horizon + user counts
    val horizon = users.agg(max(col("_last")).as("_h"))
    val lt = users.crossJoin(broadcast(horizon))
      .select(col("_st"),
        (col("_last") - col("_first") + 1L).as("t_day"),
        (col("_last") === col("_h")).cast("long").as("_cens"),
        col("_a"))
    val perT = lt.groupBy(col("_st"), col("t_day"))
      .agg(count(lit(1)).as("_ends"),
        sum(when(col("_a"), 1L).otherwise(0L)).as("_ends_a"),
        (count(lit(1)) - sum(col("_cens"))).as("_dt"),
        sum(when(col("_a") && col("_cens") === 0L, 1L).otherwise(0L))
          .as("_da"))
      .persist() // at-risk suffixes + the moment fold
    val tot = perT.groupBy(col("_st"))
      .agg(sum(col("_ends")).as("_n"), sum(col("_ends_a")).as("_na"))
      .localCheckpoint()
    val w = Window.partitionBy(col("_st")).orderBy(col("t_day"))
      .rowsBetween(Window.unboundedPreceding, -1L)
    val risk = perT.join(broadcast(tot), Seq("_st"))
      .withColumn("_rn",
        col("_n") - coalesce(sum(col("_ends")).over(w), lit(0L)))
      .withColumn("_rna",
        col("_na") - coalesce(sum(col("_ends_a")).over(w), lit(0L)))
    val frac = col("_rna").cast("double") / col("_rn").cast("double")
    val eTerm = round(col("_dt").cast("double") * frac *
      lit(1000000.0)).cast("long")
    val vTerm = when(col("_rn") <= 1L, 0L).otherwise(
      round(col("_dt").cast("double") * frac * (lit(1.0) - frac) *
        (col("_rn") - col("_dt")).cast("double") /
        (col("_rn") - 1L).cast("double") * lit(1000000.0))
        .cast("long"))
    // the stratified moments: summed across (stratum, time) — the one
    // line that differs statistically from logRankTest
    val m = risk.filter(col("_dt") > 0)
      .agg(coalesce(sum(col("_da")), lit(0L)).as("o_a"),
        coalesce(sum(eTerm), lit(0L)).as("e_a_micro"),
        coalesce(sum(vTerm), lit(0L)).as("v_micro"))
    val counts = users.agg(count(lit(1)).as("n_users"),
      sum(when(col("_a"), 1L).otherwise(0L)).as("n_a"),
      countDistinct(col("_st")).as("n_strata"))
    val z = ((col("o_a") * 1000000L - col("e_a_micro")).cast("double") /
      lit(1000000.0)) /
      sqrt(col("v_micro").cast("double") / lit(1000000.0))
    val lnhr = (col("o_a") * 1000000L - col("e_a_micro"))
      .cast("double") / col("v_micro").cast("double")
    val se = sqrt(lit(1000000.0) / col("v_micro").cast("double"))
    def snap(c: Column) = round(c * lit(1000000.0)).cast("long")
    def guarded(c: Column) =
      when(col("v_micro") <= 0L, lit(null).cast("long")).otherwise(c)
    counts.crossJoin(broadcast(m))
      .select(col("n_users"), col("n_a"), col("n_strata"), col("o_a"),
        col("e_a_micro"), col("v_micro"),
        guarded(snap(z)).as("z_micro"),
        guarded(snap(z * z)).as("chi2_micro"),
        guarded(snap(exp(lnhr))).as("hr_micro"),
        guarded(snap(exp(lnhr - lit(1.959964) * se))).as("lo_micro"),
        guarded(snap(exp(lnhr + lit(1.959964) * se))).as("hi_micro"))
  }

  /** Seasonal-naive forecast backtest (the no-skill baseline every
    * real forecaster must beat — Hyndman & Athanasopoulos,
    * "Forecasting: Principles and Practice" §5.2): `v̂(d) = v(d −
    * period)`, scored per group over every day with a lagged twin
    * (an EQUI self-join on (group, day+period); series gaps just
    * drop pairs). MAE and sMAPE with per-day micro-snapped terms so
    * both means are exact-integer folds; the sMAPE convention is
    * `2|v−v̂| / (|v|+|v̂|)` with 0 when both sides are 0.
    *
    * Output: group, `n_pairs`, `mae_micro`, `smape_micro`.
    */
  def seasonalNaiveBacktest(series: DataFrame, groupCol: String,
      period: Int = 7): DataFrame = {
    require(period >= 1, s"period must be >= 1, got $period")
    val s = series.select(col(groupCol), col("day").cast("long").as("day"),
      col("v").cast("long").as("v"))
    val lag = s.select(col(groupCol), (col("day") + period).as("day"),
      col("v").as("_f"))
    val ae = abs(col("v") - col("_f"))
    val denom = abs(col("v")) + abs(col("_f"))
    s.join(lag, Seq(groupCol, "day"))
      .select(col(groupCol), ae.as("_ae"),
        when(denom === 0L, lit(0L))
          .otherwise(round(ae.cast("double") * lit(2000000.0) /
            denom.cast("double")).cast("long")).as("_sm"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_pairs"),
        round(sum(col("_ae")).cast("double") * lit(1000000.0) /
          count(lit(1)).cast("double")).cast("long").as("mae_micro"),
        round(sum(col("_sm")).cast("double") /
          count(lit(1)).cast("double")).cast("long").as("smape_micro"))
  }
}
