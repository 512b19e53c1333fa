package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational
import graft.sim.SimSearch
import graft.streaming.EventOps
import graft.text.{Dedup, TextOps}

/** Unit coverage for the round-9 analytics family: CMS join-size
  * estimation, Bloom join pruning, nDCG, entity resolution, CUPED,
  * token-F1 overlap, and power-iteration PCA — invariants the oracle
  * gate can't express (inequalities, algebraic identities, recall).
  */
class AnalyticsOpsSpec extends SparkSpec {
  import spark.implicits._

  test("cmsJoinCardinality over-counts, never under-counts, and is " +
    "exact when buckets don't collide") {
    val l = Seq.tabulate(60)(i => i.toLong % 10).toDF("k")
    val r = Seq.tabulate(30)(i => i.toLong % 10).toDF("k")
    val row = Relational.cmsJoinCardinality(l, r, col("k"), col("k"),
      depth = 4, width = 1024, withExact = true).head()
    val exact = row.getAs[Long]("exact_pairs")
    val est = row.getAs[Long]("est_pairs")
    assert(row.getAs[Long]("n_left") == 60)
    assert(row.getAs[Long]("n_right") == 30)
    // 6 views × 3 purchases per key × 10 keys
    assert(exact == 180, s"exact_pairs=$exact")
    assert(est >= exact, s"CMS under-counted: est=$est < exact=$exact")
    // 10 distinct keys in 1024 buckets: P(any collision) is tiny and
    // the md5 hash family is fixed, so this is deterministic
    assert(est == exact, s"unexpected collision inflation: $est")
  }

  test("bloomPrefilteredJoin is row-identical to the plain join") {
    val fact = Seq.tabulate(500)(i => (i.toLong, s"f$i")).toDF("k", "a")
    val dim = Seq.tabulate(20)(i => (i.toLong * 7, s"d$i")).toDF("dk", "b")
    val got = Relational.bloomPrefilteredJoin(fact, dim,
      col("k"), col("dk")).select("k", "a", "dk", "b")
      .collect().toSet
    val want = fact.join(dim, col("k") === col("dk"))
      .select("k", "a", "dk", "b").collect().toSet
    assert(got == want)
  }

  test("ndcgAtK: a perfectly graded ranking scores 1e6 micros; " +
    "an inverted one scores less") {
    // score aligned with relevance → DCG == IDCG
    val perfect = Seq((1L, 40L, 3L), (2L, 30L, 2L), (3L, 20L, 1L),
      (4L, 10L, 0L)).toDF("id", "score", "rel")
    val p = Relational.ndcgAtK(perfect, col("id"), col("score"),
      col("rel"), k = 4).head()
    assert(p.getAs[Long]("ndcg_micro") == 1000000L)
    val inverted = Seq((1L, 40L, 0L), (2L, 30L, 1L), (3L, 20L, 2L),
      (4L, 10L, 3L)).toDF("id", "score", "rel")
    val i = Relational.ndcgAtK(inverted, col("id"), col("score"),
      col("rel"), k = 4).head()
    assert(i.getAs[Long]("ndcg_micro") < 1000000L)
    assert(i.getAs[Long]("idcg_micro") == p.getAs[Long]("idcg_micro"))
  }

  test("resolveEntities merges every planted corruption with its " +
    "original and nothing else") {
    val base = Seq.tabulate(40)(i =>
      (i.toLong * 2, f"aaaa$i%02dbbbb$i%02d")).toDF("rid", "nm")
    // corrupt ONE char in the first half: second pass must recover it
    val dirty = base.filter(col("rid") % 8 === 0)
      .select((col("rid") + 1).as("rid"),
        concat(lit("z"), col("nm").substr(2, 11)).as("nm"))
    val clusters = Dedup.resolveEntities(base.union(dirty), "rid", "nm",
      maxEdit = 2, halfLen = 6)
    val m = clusters.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    base.union(dirty).collect().map(_.getLong(0)).foreach { id =>
      val expected = if (id % 2 == 1) id - 1 else id
      assert(m(id) == expected, s"rec $id -> ${m(id)}, want $expected")
    }
  }

  test("resolveEntities: a Zipfian-prefix registry stays O(n·window) " +
    "in candidate pairs — one hot blocking key cannot go quadratic") {
    val n = 500
    val (cap, win) = (64, 8)
    // every record shares the hot first-half prefix "mohamm" (the
    // Zipfian real-registry shape the md5 gate fixture can't produce);
    // tails are distinct, so the second-half pass contributes nothing
    val recs = Seq.tabulate(n)(i => (i.toLong, f"mohamm$i%06d"))
      .toDF("rid", "nm")
    val cand = Dedup.entityCandidates(recs, "rid", "nm",
      halfLen = 6, blockCap = cap, hotWindow = win)
    val got = cand.count()
    assert(got <= n.toLong * win,
      s"hot block leaked $got candidate pairs (> n*window = ${n * win})")
    assert(got >= (n - win).toLong, s"window produced too few: $got")
    // adjacent-tail corruptions still resolve through the SNM window
    // (numeric tails chain under maxEdit=2, so assert MEMBERSHIP in
    // the original records' component, not a specific label)
    val dirty = Seq((9000L, "mohamm000007"), // exact dup of rid 7
      (9001L, "mohamm00000z")) // 1 edit from the 00000x tails
      .toDF("rid", "nm")
    val clusters = Dedup.resolveEntities(recs.union(dirty), "rid", "nm",
      maxEdit = 2, halfLen = 6, blockCap = cap, hotWindow = win)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters(9000L) == clusters(7L), // exact-name collapse
      s"exact dup: ${clusters(9000L)} vs ${clusters(7L)}")
    assert(clusters(9001L) == clusters(2L), // SNM: sorts next to 00000*
      s"snm near-dup: ${clusters(9001L)} vs ${clusters(2L)}")
    // a registry that is ONE name repeated collapses linearly with
    // zero candidate pairs (the exact-duplicate clique never reaches
    // the pairwise path)
    val dup = Seq.tabulate(300)(i => (i.toLong, "john smith"))
      .toDF("rid", "nm")
    assert(Dedup.entityCandidates(dup, "rid", "nm", 6, cap, win)
      .count() == 0L)
    val dupClusters = Dedup.resolveEntities(dup, "rid", "nm",
      maxEdit = 2, halfLen = 6, blockCap = cap, hotWindow = win)
    assert(dupClusters.select("cluster").distinct().count() == 1L)
    assert(dupClusters.count() == 300L)
  }

  test("SNM recall MEASURED: pairs completeness inside hot blocks vs " +
    "cold, per window — the documented hotWindow trade as a number") {
    // Zipfian registry: 300 hot entities share the first-half prefix
    // (one 600-member block → SNM), 100 cold entities have unique
    // prefixes (block of 2 → exact pairs). Every 3rd entity gets a
    // twin with its LAST tail char mutated digit→letter, so a hot
    // twin sorts 4–10 ranks from its base depending on its decade
    // residue — completeness rises stepwise with the window.
    def twinTail(i: Int): String = {
      val t = f"$i%06d"
      t.take(5) + ('a' + (t.last - '0')).toChar
    }
    val hot = (0 until 300).flatMap { i =>
      val base = Seq((i.toLong * 2, f"mohamm$i%06d", true))
      if (i % 3 == 0)
        base :+ ((i.toLong * 2 + 1, "mohamm" + twinTail(i), true))
      else base
    }
    val cold = (0 until 100).flatMap { i =>
      val base = Seq((10000L + i * 2, f"c$i%05dt$i%05d", false))
      if (i % 3 == 0)
        base :+ ((10001L + i * 2,
          f"c$i%05d" + "t" + twinTail(i).drop(1), false))
      else base
    }
    val recs = (hot ++ cold).map { case (id, nm, _) => (id, nm) }
      .toDF("rid", "nm")
    // truth: (base, twin) per twinned entity, tagged hot/cold
    val truth = (hot ++ cold).groupBy(_._1 / 2).values
      .collect { case Seq((a, _, h), (b, _, _)) => (a.min(b), a.max(b), h) }
      .toSeq
    def completeness(window: Int): (Double, Double) = {
      val cand = Dedup.entityCandidates(recs, "rid", "nm",
        halfLen = 6, blockCap = 64, hotWindow = window)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      def pc(isHot: Boolean): Double = {
        val t = truth.filter(_._3 == isHot)
        t.count(p => cand.contains((p._1, p._2))).toDouble / t.size
      }
      (pc(true), pc(false))
    }
    // cold blocks are exact all-pairs at every window: completeness 1
    // hot blocks pay the SNM price — MEASURED, not just documented:
    //   window 4 → 0.20, window 8 → 0.80, window 12 → 1.00
    val (h4, c4) = completeness(4)
    val (h8, c8) = completeness(8)
    val (h12, c12) = completeness(12)
    assert(c4 == 1.0 && c8 == 1.0 && c12 == 1.0,
      s"cold completeness must be exact: $c4 $c8 $c12")
    assert(h4 == 0.2, s"hot completeness at window 4: $h4")
    assert(h8 == 0.8, s"hot completeness at window 8: $h8")
    assert(h12 == 1.0, s"hot completeness at window 12: $h12")
  }

  test("resolveEntities defaults to EXACT all-pairs blocks: an " +
    "early-tail edit in a hot block matches by default and bounded " +
    "(SNM) mode is opt-in") {
    val recs = Seq.tabulate(100)(i => (i.toLong * 2, f"mohamm$i%06d"))
      .toDF("rid", "nm")
    // corrupt the FIRST tail char of record 50: 'z' sorts ~50 ranks
    // away, far outside any SNM window, but levenshtein = 1
    val dirty = Seq((101L, "mohammz00050")).toDF("rid", "nm")
    val all = recs.union(dirty)
    val exact = Dedup.resolveEntities(all, "rid", "nm", maxEdit = 2,
      halfLen = 6).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exact(101L) == exact(100L),
      s"default (exact) mode missed the early-tail edit: $exact")
    val bounded = Dedup.resolveEntities(all, "rid", "nm", maxEdit = 2,
      halfLen = 6, blockCap = 64, hotWindow = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bounded(101L) != bounded(100L),
      "opt-in bounded mode unexpectedly found the far-sorting edit " +
        "(the SNM recall price this test documents)")
  }

  test("containment: a short doc fully quoted inside a long one " +
    "scores 1.0 from the short side while Jaccard stays low") {
    val short = Seq.tabulate(5)(i => s"s$i")
    val long = Seq.tabulate(50)(i => s"t$i") ++ short
    val df = Seq((short, long)).toDF("a", "b")
    val r = df.select(
      round(Dedup.containment(col("a"), col("b")), 6).as("ab"),
      round(Dedup.containment(col("b"), col("a")), 6).as("ba"),
      round(Dedup.jaccardHof(col("a"), col("b")), 6).as("j")).head()
    assert(r.getDouble(0) == 1.0, r)            // A ⊂ B
    assert(r.getDouble(1) == 0.090909, r)       // 5 / 55
    assert(r.getDouble(2) == 0.090909, r)       // Jaccard misses it
    // empty-set guard mirrors jaccardHof: 0, never NaN
    val e = Seq((Seq.empty[String], Seq("x")))
      .toDF("a", "b")
      .select(Dedup.containment(col("a"), col("b"))).head()
    assert(e.getDouble(0) == 0.0)
  }

  test("krippendorffAlpha: perfect agreement reads 1.0; the classic " +
    "two-item hand example reads exactly 0; single-rating items " +
    "drop; degenerate one-value data yields NULL") {
    def alpha(rows: Seq[(Long, String)]) =
      Relational.krippendorffAlpha(rows.toDF("i", "v"),
        col("i"), col("v")).head()
    // 10 items, 2 identical ratings each → Do = 0, alpha = 1
    val perfect = alpha((0L until 10L).flatMap(i =>
      Seq(i -> s"c${i % 3}", i -> s"c${i % 3}")))
    assert(perfect.getAs[Long]("do_micro") == 0L)
    assert(perfect.getAs[Long]("alpha_micro") == 1000000L)
    // item1 (a,a), item2 (a,b): Do = 0.5, De = (16-10)/12 = 0.5 → 0
    val zero = alpha(Seq(1L -> "a", 1L -> "a", 2L -> "a", 2L -> "b"))
    assert(zero.getAs[Long]("n_items") == 2L &&
      zero.getAs[Long]("n_ratings") == 4L)
    assert(zero.getAs[Long]("do_micro") == 500000L)
    assert(zero.getAs[Long]("de_micro") == 500000L)
    assert(zero.getAs[Long]("alpha_micro") == 0L)
    // a single-rating item contributes nothing
    val withSingleton = alpha(Seq(1L -> "a", 1L -> "a", 2L -> "a",
      2L -> "b", 3L -> "zz"))
    assert(withSingleton.getAs[Long]("n_items") == 2L)
    assert(withSingleton.getAs[Long]("alpha_micro") == 0L)
    // every rating identical: De = 0 → NULL (no chance-corrected info)
    val degen = alpha(Seq(1L -> "a", 1L -> "a", 2L -> "a", 2L -> "a"))
    assert(degen.isNullAt(4))
  }

  test("bhFdr: the textbook step-up — a later rank can rescue earlier " +
    "ones; nothing qualifies at tiny alpha; null p-values drop") {
    def run(ps: Seq[Long], alpha: Long) =
      Relational.bhFdr(
        ps.zipWithIndex.map { case (p, i) => (i.toLong, p) }
          .toDF("id", "p_micro"),
        "id", col("p_micro"), alpha)
        .collect().map(r => r.getAs[Long]("p_micro") ->
          r.getAs[Boolean]("discovered")).toMap
    // thresholds k*0.02: ranks 1-3 pass, 4-5 fail -> k*=3
    val basic = run(Seq(10000L, 30000L, 40000L, 300000L, 900000L),
      100000L)
    assert(basic == Map(10000L -> true, 30000L -> true, 40000L -> true,
      300000L -> false, 900000L -> false), basic)
    // step-up: p=(0.01,0.04,0.041,0.042,0.9) at alpha=0.1 — rank 4
    // still qualifies (0.042 <= 0.08), so ranks 1-4 ALL discover even
    // though rank 3 alone sits above k*alpha/m pre-step
    val stepUp = run(Seq(10000L, 40000L, 41000L, 42000L, 900000L),
      100000L)
    assert(stepUp.count(_._2) == 4 && !stepUp(900000L), stepUp)
    // nothing qualifies
    assert(run(Seq(500000L, 600000L), 10000L).values.forall(!_))
    // null p rows drop from the ranking entirely
    val withNull = Relational.bhFdr(
      Seq((1L, Some(10000L)), (2L, None)).toDF("id", "p_micro"),
      "id", col("p_micro"), 100000L).collect()
    assert(withNull.length == 1 && withNull.head.getLong(0) == 1L)
  }

  test("proportionEffect: hand Cohen's h and Wilson intervals, " +
    "symmetric arms read h = 0, empty arm is NULL") {
    // A: 6/10, B: 2/10 — python-mirrored constants
    val df = ((1 to 10).map(i => (true, i <= 6)) ++
      (1 to 10).map(i => (false, i <= 2))).toDF("a", "s")
    val r = Relational.proportionEffect(df, col("a"), col("s")).head()
    assert(r.getAs[Long]("n_a") == 10L && r.getAs[Long]("x_a") == 6L &&
      r.getAs[Long]("x_b") == 2L)
    assert(r.getAs[Long]("h_micro") == 844859L, r)
    assert(r.getAs[Long]("lo_a_micro") == 312674L &&
      r.getAs[Long]("hi_a_micro") == 831820L, r)
    assert(r.getAs[Long]("lo_b_micro") == 56682L &&
      r.getAs[Long]("hi_b_micro") == 509838L, r)
    // equal rates: h exactly 0; Wilson intervals identical per arm
    val eq = ((1 to 8).map(i => (true, i <= 4)) ++
      (1 to 8).map(i => (false, i <= 4))).toDF("a", "s")
    val re = Relational.proportionEffect(eq, col("a"), col("s")).head()
    assert(re.getAs[Long]("h_micro") == 0L, re)
    assert(re.getAs[Long]("lo_a_micro") ==
      re.getAs[Long]("lo_b_micro"), re)
    // empty B arm: NULL h and B interval, A interval intact
    val one = (1 to 5).map(i => (true, i <= 3)).toDF("a", "s")
    val ro = Relational.proportionEffect(one, col("a"), col("s"))
      .head()
    assert(ro.isNullAt(ro.fieldIndex("h_micro")) &&
      ro.isNullAt(ro.fieldIndex("lo_b_micro")) &&
      !ro.isNullAt(ro.fieldIndex("lo_a_micro")), ro)
  }

  test("holmAdjust: the textbook step-down — the first failure blocks " +
    "every later rank even when its own bar would pass; Holm " +
    "discoveries are a subset of BH's") {
    def run(ps: Seq[Long], alpha: Long) =
      Relational.holmAdjust(
        ps.zipWithIndex.map { case (p, i) => (i.toLong, p) }
          .toDF("id", "p_micro"),
        "id", col("p_micro"), alpha)
        .collect().map(r => r.getAs[Long]("p_micro") ->
          r.getAs[Boolean]("discovered")).toMap
    // bars alpha/(m-i+1) = .0125/.0167/.025/.05: ranks 1-2 pass,
    // rank 3 (.04 > .025) fails and stops the walk
    val basic = run(Seq(10000L, 15000L, 40000L, 500000L), 50000L)
    assert(basic == Map(10000L -> true, 15000L -> true,
      40000L -> false, 500000L -> false), basic)
    // STEP-DOWN: rank 2 (.02 > .0167) fails, so rank 4 (.04 <= .05)
    // is blocked despite clearing its own bar — the FWER discipline
    val blocked = run(Seq(10000L, 20000L, 30000L, 40000L), 50000L)
    assert(blocked == Map(10000L -> true, 20000L -> false,
      30000L -> false, 40000L -> false), blocked)
    // all pass when every bar clears
    assert(run(Seq(1000L, 2000L, 3000L), 50000L).values.forall(x => x))
    // Holm ⊆ BH at the same alpha, on both tables
    for (ps <- Seq(Seq(10000L, 15000L, 40000L, 500000L),
      Seq(10000L, 20000L, 30000L, 40000L))) {
      val holm = run(ps, 50000L)
      val bh = Relational.bhFdr(
        ps.zipWithIndex.map { case (p, i) => (i.toLong, p) }
          .toDF("id", "p_micro"), "id", col("p_micro"), 50000L)
        .collect().map(r => r.getAs[Long]("p_micro") ->
          r.getAs[Boolean]("discovered")).toMap
      ps.foreach(p => assert(!holm(p) || bh(p), s"$p: holm>${bh(p)}"))
    }
  }

  test("chiSquareGofByGroup: a group matching the pooled mix scores " +
    "~0 with p ~ 1; even df gets the closed-form p, odd df NULL") {
    // 3 categories (df = 2, even): group 'same' mirrors the pool,
    // group 'skew' concentrates everything in one category
    val rows = Seq.fill(30)(("same", "a")) ++ Seq.fill(30)(("same", "b")) ++
      Seq.fill(30)(("same", "c")) ++ Seq.fill(30)(("skew", "a"))
    val got = Relational.chiSquareGofByGroup(rows.toDF("g", "cat"), "g",
      col("cat")).collect().map(r => r.getString(0) -> r).toMap
    assert(got("same").getAs[Int]("df") == 2)
    // pooled: a=60,b=30,c=30 of 120; 'same' (n=90) expects 45/22.5/22.5
    // chi2 = 15^2/45 + 7.5^2/22.5 * 2 = 5 + 5 = 10
    assert(got("same").getAs[Long]("chi2_micro") == 10000000L)
    // p = exp(-5) for df=2
    assert(got("same").getAs[Long]("p_micro") ==
      math.round(math.exp(-5.0) * 1e6))
    assert(got("skew").getAs[Long]("chi2_micro") > 0L)
    // 2 categories -> df = 1 (odd): statistic reports, p is NULL
    val odd = Relational.chiSquareGofByGroup(
      (Seq.fill(10)(("g1", "x")) ++ Seq.fill(10)(("g1", "y")))
        .toDF("g", "cat"), "g", col("cat")).head()
    assert(odd.getAs[Int]("df") == 1 && odd.isNullAt(4))
  }

  test("jaroWinkler: textbook values (MARTHA/MARHTA, DIXON/DICKSONX), " +
    "edge conventions, and the SQL registration") {
    def jw(a: String, b: String): Double =
      Seq((a, b)).toDF("a", "b")
        .select(Dedup.jaroWinkler(col("a"), col("b"))).head().getDouble(0)
    // jaro 17/18, prefix 3 -> 0.961111...
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-12)
    // jaro 0.7666..., prefix 2 -> 0.81333...
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-9)
    assert(jw("same", "same") == 1.0)
    assert(jw("", "") == 0.0)     // DuckDB/both-empty convention
    assert(jw("a", "") == 0.0)
    assert(jw("abc", "xyz") == 0.0)
    // below the 0.7 boost threshold the prefix earns nothing: these
    // share prefix 'ab' but jaro <= 0.7, so jw == jaro exactly
    val lo = jw("abqqqqqq", "abzzz")
    assert(lo <= 0.7 && lo > 0.0, lo)
    val sql = spark.sql(
      "SELECT graft_jaro_winkler('martha', 'marhta')").head().getDouble(0)
    assert(math.abs(sql - 0.9611111111111111) < 1e-12)
  }

  test("linkageDecisions: exact micro-nat evidence sums and the " +
    "three-way threshold cut") {
    val weights = Seq(
      ("fa", 2000000L, -1000000L),
      ("fb", 1000000L, -3000000L))
      .toDF("field", "w_agree_micro", "w_disagree_micro")
    val pairs = Seq(
      (1L, 2L, true, true),   // 3e6  -> match (>= 2.5e6)
      (3L, 4L, true, false),  // -1e6 -> possible
      (5L, 6L, false, false)) // -4e6 -> non_match (<= -2.5e6)
      .toDF("id_a", "id_b", "fa", "fb")
    val got = Dedup.linkageDecisions(pairs, weights,
      Seq("fa" -> col("fa"), "fb" -> col("fb")),
      upperMicro = 2500000L, lowerMicro = -2500000L)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("score_micro"), r.getAs[String]("decision")))
      .toMap
    assert(got(1L) == ((3000000L, "match")), got)
    assert(got(3L) == ((-1000000L, "possible")), got)
    assert(got(5L) == ((-4000000L, "non_match")), got)
  }

  test("blockingQuality: hand counts — prefix key covers both truth " +
    "pairs, suffix key covers one with more candidates") {
    val recs = Seq(
      (1L, "aaa-x", 100L), (2L, "aaa-y", 100L),
      (3L, "bbb-x", 200L), (4L, "bbb-x", 200L),
      (5L, "ccc-z", 300L)).toDF("rid", "nm", "truth")
    val got = Dedup.blockingQuality(recs, "rid", "truth", Seq(
      "prefix" -> substring(col("nm"), 1, 3),
      "suffix" -> substring(col("nm"), 5, 1)))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5))).toMap
    // truth pairs: (1,2) and (3,4) = 2; all-pairs = 10
    assert(got("prefix") == ((2L, 2L, 2L, 0.8, 1.0)), got)
    // suffix 'x' blocks {1,3,4} -> 3 candidates, 1 covered
    assert(got("suffix") == ((3L, 2L, 1L, 0.7, 0.5)), got)
  }

  test("fellegiSunterWeights: a perfectly discriminating field earns " +
    "ln(51) micro-nats of agreement evidence; a label-independent " +
    "field weighs exactly 0") {
    // 50 matched pairs (field A agrees on all; B agrees on half) and
    // 50 unmatched (A never agrees; B agrees on half)
    val pairs = ((0 until 50).map(i => (true, true, i % 2 == 0)) ++
      (0 until 50).map(i => (false, false, i % 2 == 0)))
      .toDF("mt", "fa", "fb")
    val w = Dedup.fellegiSunterWeights(pairs, col("mt"),
      Seq("a" -> col("fa"), "b" -> col("fb")))
      .collect().map(r => r.getString(0) -> r).toMap
    // add-one smoothing: m_A = 51/52, u_A = 1/52 → w_agree = ln(51)
    assert(w("a").getAs[Long]("n_match") == 50L)
    assert(w("a").getAs[Long]("m_micro") ==
      math.round(51.0 / 52.0 * 1e6))
    assert(w("a").getAs[Long]("u_micro") ==
      math.round(1.0 / 52.0 * 1e6))
    assert(w("a").getAs[Long]("w_agree_micro") ==
      math.round(math.log(51.0) * 1e6))
    assert(w("a").getAs[Long]("w_disagree_micro") ==
      math.round(math.log((1.0 / 52.0) / (51.0 / 52.0)) * 1e6))
    // independent field: m = u = 26/52 → both weights exactly 0
    assert(w("b").getAs[Long]("w_agree_micro") == 0L)
    assert(w("b").getAs[Long]("w_disagree_micro") == 0L)
  }

  test("fellegiSunterEM recovers the supervised weights' decisions " +
    "without seeing a single label") {
    // well-separated mixture: 200 matches agree on each field ~90%,
    // 800 non-matches ~5% — the structure EM is supposed to find
    val rows =
      (0 until 200).map(i => (true,
        i % 10 != 0, i % 10 != 1, i % 10 != 2)) ++
      (0 until 800).map(i => (false,
        i % 20 == 0, i % 20 == 1, i % 20 == 2))
    val pairs = rows.zipWithIndex.map { case ((mt, a, b, c), i) =>
      (i.toLong, mt, a, b, c) }.toDF("pid", "mt", "fa", "fb", "fc")
    val fields = Seq("a" -> col("fa"), "b" -> col("fb"),
      "c" -> col("fc"))
    val em = Dedup.fellegiSunterEM(pairs, fields)
      .collect().map(r => r.getString(0) -> r).toMap
    // parameter recovery: m near 0.9, u near 0.05, prevalence near 0.2
    fields.foreach { case (nm, _) =>
      val m = em(nm).getAs[Long]("m_micro")
      val u = em(nm).getAs[Long]("u_micro")
      assert(m > 800000L && m < 990000L, s"$nm m=$m")
      assert(u < 200000L, s"$nm u=$u")
      assert(em(nm).getAs[Long]("w_agree_micro") > 0L, s"$nm")
      assert(em(nm).getAs[Long]("w_disagree_micro") < 0L, s"$nm")
    }
    val p = em("a").getAs[Long]("p_micro")
    assert(p > 100000L && p < 300000L, s"p=$p")
    // decision agreement: EM-scored decisions equal the supervised
    // ones pair for pair (upper = lower = 0 → no clerical band)
    val sup = Dedup.fellegiSunterWeights(pairs, col("mt"), fields)
    def decide(w: org.apache.spark.sql.DataFrame) =
      Dedup.linkageDecisions(pairs.select("pid", "fa", "fb", "fc"),
        w, fields, upperMicro = 0L, lowerMicro = 0L)
        .collect().map(r => r.getAs[Long]("pid") ->
          r.getAs[String]("decision")).toMap
    val supD = decide(sup.select("field", "w_agree_micro",
      "w_disagree_micro"))
    val emD = decide(em.map { case (nm, r) =>
      (nm, r.getAs[Long]("w_agree_micro"),
        r.getAs[Long]("w_disagree_micro")) }.toSeq
      .toDF("field", "w_agree_micro", "w_disagree_micro"))
    assert(supD == emD,
      s"EM decisions diverged on ${supD.count(kv => emD(kv._1) != kv._2)} pairs")
  }

  test("mannWhitneyU: hand-computed U, ties averaged, perfect " +
    "separation gives |r_rb| = 1") {
    // A = {1,2,3}, B = {2,4}: ranks 1,(2.5,2.5),4,5 → R_A = 1+2.5+4
    //  = 7.5 → U_A = 7.5 − 6 = 1.5 (doubled: 3); U_B = 6 − 1.5 = 4.5
    val df = Seq((true, 1L), (true, 2L), (true, 3L), (false, 2L),
      (false, 4L)).toDF("ga", "v")
    val r = Relational.mannWhitneyU(df, col("ga"), col("v")).head()
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Long]("u_a_x2") == 3L, r)
    assert(r.getAs[Long]("u_b_x2") == 9L, r)
    // r_rb = 1 − 2·U_b/(n_a·n_b) = 1 − 4.5/3 = −0.5
    assert(r.getAs[Long]("r_rb_micro") == -500000L, r)
    // perfect separation: every A below every B → U_a = 0 (no (a,b)
    // pair has a above b), r_rb = −1, z strongly negative
    val sep = (Seq.tabulate(10)(i => (true, i.toLong)) ++
      Seq.tabulate(10)(i => (false, 100L + i))).toDF("ga", "v")
    val s = Relational.mannWhitneyU(sep, col("ga"), col("v")).head()
    assert(s.getAs[Long]("u_a_x2") == 0L)
    assert(s.getAs[Long]("u_b_x2") == 200L)
    assert(s.getAs[Long]("r_rb_micro") == -1000000L)
    assert(s.getAs[Long]("z_micro") < -3000000L) // strongly significant
  }

  test("giniIndex: uniform = 0, single-owner approaches 1, known " +
    "hand value") {
    val uniform = Seq.fill(50)(7L).toDF("v")
    assert(Relational.giniIndex(uniform, col("v")).head()
      .getAs[Long]("gini_micro") == 0L)
    // one owner holds everything: G = (n−1)/n = 0.9 at n = 10
    val single = (Seq.fill(9)(0L) :+ 100L).toDF("v")
    assert(Relational.giniIndex(single, col("v")).head()
      .getAs[Long]("gini_micro") == 900000L)
    // hand: values 1,2,3,4 → G = 2·(1+4+9+16)/(4·10) − 5/4 = 0.25
    val hand = Seq(1L, 2L, 3L, 4L).toDF("v")
    assert(Relational.giniIndex(hand, col("v")).head()
      .getAs[Long]("gini_micro") == 250000L)
  }

  test("jsDivergence: identical sides = 0, disjoint sides = ln 2, " +
    "symmetric in the side flag") {
    val same = (1 to 100).flatMap(i =>
      Seq((i % 2 == 0, s"c${i % 5}"), (i % 2 != 0, s"c${i % 5}")))
      .toDF("ga", "cat")
    assert(Relational.jsDivergenceTotal(same, col("cat"), col("ga"))
      .head().getAs[Long]("js_micro") == 0L)
    // fully disjoint supports: JS = ln 2
    val disj = ((1 to 50).map(i => (true, s"a${i % 3}")) ++
      (1 to 50).map(i => (false, s"b${i % 3}"))).toDF("ga", "cat")
    val js = Relational.jsDivergenceTotal(disj, col("cat"), col("ga"))
      .head().getAs[Long]("js_micro")
    assert(math.abs(js - math.round(math.log(2.0) * 1e6)) <= 3, js)
    // symmetry: flipping the side flag leaves the total unchanged
    val skew = ((1 to 60).map(i => (true, s"c${i % 4}")) ++
      (1 to 30).map(i => (false, s"c${i % 2}"))).toDF("ga", "cat")
    val a = Relational.jsDivergenceTotal(skew, col("cat"), col("ga"))
      .head().getAs[Long]("js_micro")
    val b = Relational.jsDivergenceTotal(skew, col("cat"), !col("ga"))
      .head().getAs[Long]("js_micro")
    assert(a == b, s"$a != $b")
  }

  test("cramersV: perfect association = 1, independence ~ 0") {
    val perfect = (1 to 100).map(i =>
      (s"r${i % 4}", s"c${i % 4}")).toDF("r", "c")
    assert(Relational.cramersV(perfect, "r", "c").head()
      .getAs[Long]("v_micro") == 1000000L)
    val indep = (for (i <- 0 until 10; j <- 0 until 10; _ <- 0 until 3)
      yield (s"r$i", s"c$j")).toDF("r", "c")
    assert(Relational.cramersV(indep, "r", "c").head()
      .getAs[Long]("v_micro") == 0L)
  }

  test("adamicAdar: hand graph — the pair sharing the rarer neighbor " +
    "outranks the pair sharing the hub; adjacent pairs never appear") {
    // star hub h(1) linked to 2,3,4,5; plus a private bridge 6 linked
    // to 2 and 3: AA(2,3) = 1/ln(4) + 1/ln(2) beats AA(4,5) = 1/ln(4)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L),
      (6L, 2L), (6L, 3L)).toDF("src", "dst")
    val got = graft.operators.LinkGraph.adamicAdar(edges, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Long]("n_common"), r.getAs[Long]("aa_micro"))).toMap
    val lnInv = (d: Int) => math.round(1e6 / math.log(d.toDouble))
    assert(got((2L, 3L)) == ((2L, lnInv(4) + lnInv(2))), got)
    assert(got((4L, 5L)) == ((1L, lnInv(4))), got)
    assert(got((2L, 3L))._2 > got((4L, 5L))._2)
    // adjacent pairs excluded (1-2 is an edge); the non-adjacent
    // hub-bridge pair (1,6) appears through its two common neighbors
    assert(!got.contains((1L, 2L)), got)
    assert(got((1L, 6L)) == ((2L, 2 * lnInv(2))), got)
  }

  test("kendallTauB: perfect concordance = 1, hand value with a " +
    "discordant pair, symmetric ties cancel to 0") {
    val perfect = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("a", "b")
    val p = Relational.kendallTauB(perfect, col("a"), col("b")).head()
    assert(p.getAs[Long]("c_pairs") == 3L &&
      p.getAs[Long]("d_pairs") == 0L)
    assert(p.getAs[Long]("tau_b_micro") == 1000000L)
    // one discordant among three pairs: tau = (2-1)/3
    val mixed = Seq((1L, 2L), (2L, 1L), (3L, 3L)).toDF("a", "b")
    assert(Relational.kendallTauB(mixed, col("a"), col("b")).head()
      .getAs[Long]("tau_b_micro") == 333333L)
    // 2x2 balanced ties: C = D = 1, n1 = n2 = 2 -> tau = 0
    val tied = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L)).toDF("a", "b")
    val t = Relational.kendallTauB(tied, col("a"), col("b")).head()
    assert(t.getAs[Long]("c_pairs") == 1L &&
      t.getAs[Long]("d_pairs") == 1L)
    assert(t.getAs[Long]("tau_b_micro") == 0L)
    // constant margin: denominator 0 -> NULL, not a crash
    val const = Seq((1L, 1L), (1L, 2L), (1L, 3L)).toDF("a", "b")
    assert(Relational.kendallTauB(const, col("a"), col("b")).head()
      .isNullAt(4))
  }

  test("cohensD: hand pooled-SD effect size and the Hedges " +
    "small-sample shrink; degenerate sides NULL") {
    // A = {2,4}, B = {6,8}: s_p = sqrt(2), d = -4/sqrt(2) = -2.828427
    val df = Seq((true, 2L), (true, 4L), (false, 6L), (false, 8L))
      .toDF("ga", "v")
    val r = Relational.cohensD(df, col("ga"), col("v")).head()
    assert(r.getAs[Long]("mean_a_micro") == 3000000L)
    assert(r.getAs[Long]("mean_b_micro") == 7000000L)
    assert(r.getAs[Long]("d_micro") == -2828427L, r)
    // g = d * (1 - 3/(4*4-9)) = d * 4/7
    assert(r.getAs[Long]("g_micro") == -1616244L, r)
    // one-element side: NULL effect, means still reported
    val deg = Seq((true, 5L), (false, 1L), (false, 3L)).toDF("ga", "v")
    val rd = Relational.cohensD(deg, col("ga"), col("v")).head()
    assert(rd.isNullAt(4) && rd.isNullAt(5))
  }

  test("anovaF: hand three-group decomposition; degenerate NULL") {
    // {1,2,3} {5,6,7} {9,10,11}: SSB=96, SSW=6, SST=102, F=48
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 5L), ("b", 6L),
      ("b", 7L), ("c", 9L), ("c", 10L), ("c", 11L)).toDF("g", "v")
    val r = Relational.anovaF(df, col("g"), col("v")).head()
    assert(r.getAs[Long]("k") == 3L && r.getAs[Long]("n") == 9L)
    assert(r.getAs[Long]("ssb_milli") == 96000L, r)
    assert(r.getAs[Long]("ssw_milli") == 6000L, r)
    assert(r.getAs[Long]("sst_milli") == 102000L, r)
    assert(r.getAs[Long]("f_micro") == 48000000L, r)
    assert(r.getAs[Long]("eta2_micro") == 941176L, r)
    // one group: between-variance undefined, F NULL
    val deg = Seq(("a", 1L), ("a", 2L)).toDF("g", "v")
    assert(Relational.anovaF(deg, col("g"), col("v")).head().isNullAt(5))
  }

  test("leveneW: hand mean-deviation ANOVA on two uneven groups") {
    // a={0,4} → z={2,2}; b={0,0,6} → z={2,2,4}: W = 533/889 scaled
    val df = Seq(("a", 0L), ("a", 4L), ("b", 0L), ("b", 0L), ("b", 6L))
      .toDF("g", "v")
    val r = Relational.leveneW(df, col("g"), col("v")).head()
    assert(r.getAs[Long]("k") == 2L && r.getAs[Long]("n") == 5L)
    assert(r.getAs[Long]("ssb_milli") == 533L, r)
    assert(r.getAs[Long]("ssw_milli") == 2667L, r)
    assert(r.getAs[Long]("w_micro") == 599550L, r)
    // equal spreads: z identical in both groups → W = 0
    val eq = Seq(("a", 0L), ("a", 2L), ("b", 10L), ("b", 12L))
      .toDF("g", "v")
    assert(Relational.leveneW(eq, col("g"), col("v")).head()
      .getAs[Long]("w_micro") == 0L)
  }

  test("mutualInformation: identity hits NMI = 1, independence hits " +
    "0") {
    // y = x over a uniform binary column: MI = H = ln 2
    val dep = Seq(("a", "a"), ("b", "b"), ("a", "a"), ("b", "b"))
      .toDF("x", "y")
    val r = Relational.mutualInformation(dep, col("x"), col("y")).head()
    assert(r.getAs[Long]("n") == 4L && r.getAs[Long]("n_x") == 2L)
    assert(r.getAs[Long]("mi_micro") == 693147L, r) // ln 2
    assert(r.getAs[Long]("hx_micro") == 693147L, r)
    assert(r.getAs[Long]("nmi_micro") == 1000000L, r)
    // all four combos equally likely: zero information
    val ind = Seq(("a", 0L), ("a", 1L), ("b", 0L), ("b", 1L))
      .toDF("x", "y")
    val ri = Relational.mutualInformation(ind, col("x"), col("y"))
      .head()
    assert(ri.getAs[Long]("mi_micro") == 0L, ri)
    assert(ri.getAs[Long]("nmi_micro") == 0L, ri)
    // constant y: H_y = 0 → NMI NULL
    val const = Seq(("a", 1L), ("b", 1L)).toDF("x", "y")
    assert(Relational.mutualInformation(const, col("x"), col("y"))
      .head().isNullAt(6))
  }

  test("quantileNormalize: equal ranks land on the same pooled value " +
    "across groups; fractions are exact midranks") {
    // A {1,2} and B {10,20}: both lows → pooled 2, both highs → 20
    val df = Seq(("A", 1L), ("A", 2L), ("B", 10L), ("B", 20L))
      .toDF("g", "v")
    val got = Relational.quantileNormalize(df, col("g"), col("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(3), r.getLong(4))).toMap
    assert(got(("A", 1L)) == ((250000L, 2L)), got)
    assert(got(("A", 2L)) == ((750000L, 20L)), got)
    assert(got(("B", 10L)) == ((250000L, 2L)), got)
    assert(got(("B", 20L)) == ((750000L, 20L)), got)
    // a single group maps onto itself rank for rank... with ties the
    // midrank still lands inside the tied value's pooled interval
    val tied = Seq(("A", 5L), ("A", 5L), ("A", 9L)).toDF("g", "v")
    val gt = Relational.quantileNormalize(tied, col("g"), col("v"))
      .collect().map(r => r.getLong(1) -> r.getLong(4)).toMap
    assert(gt == Map(5L -> 5L, 9L -> 9L), gt)
  }

  test("medianAbsDeviation: hand odd/even medians, whale immunity") {
    val odd = Seq(1L, 2L, 3L, 4L, 100L).toDF("v")
    val r = Relational.medianAbsDeviation(odd, col("v")).head()
    assert(r.getAs[Long]("n") == 5L)
    assert(r.getAs[Long]("median_micro") == 3000000L, r)
    assert(r.getAs[Long]("mad_micro") == 1000000L, r)
    assert(r.getAs[Long]("sigma_micro") == 1482600L, r)
    // the whale can grow 1000×: nothing moves
    val whale = Seq(1L, 2L, 3L, 4L, 100000L).toDF("v")
    val rw = Relational.medianAbsDeviation(whale, col("v")).head()
    assert(rw.getAs[Long]("median_micro") == 3000000L &&
      rw.getAs[Long]("mad_micro") == 1000000L, rw)
    // even n: median and MAD average the two middles exactly
    val even = Seq(1L, 2L, 3L, 4L).toDF("v")
    val re = Relational.medianAbsDeviation(even, col("v")).head()
    assert(re.getAs[Long]("median_micro") == 2500000L, re)
    assert(re.getAs[Long]("mad_micro") == 1000000L, re)
  }

  test("twoProportionZ: hand pooled z and unpooled Wald CI; " +
    "degenerate pooled rate NULL") {
    val df = ((1 to 6).map(_ => (true, 1L)) ++
      (1 to 4).map(_ => (true, 0L)) ++
      (1 to 4).map(_ => (false, 1L)) ++
      (1 to 6).map(_ => (false, 0L))).toDF("ga", "x")
    val r = Relational.twoProportionZ(df, col("ga"), col("x")).head()
    assert(r.getAs[Long]("n_a") == 10L && r.getAs[Long]("x_a") == 6L)
    assert(r.getAs[Long]("diff_micro") == 200000L, r)
    val z = 0.2 / math.sqrt(0.5 * 0.5 * 0.2)
    assert(r.getAs[Long]("z_micro") == math.round(z * 1e6), r)
    val se = math.sqrt(0.6 * 0.4 / 10.0 + 0.4 * 0.6 / 10.0)
    assert(r.getAs[Long]("lo_micro") ==
      math.round((0.2 - 1.959964 * se) * 1e6), r)
    assert(r.getAs[Long]("hi_micro") ==
      math.round((0.2 + 1.959964 * se) * 1e6), r)
    // everyone converts: pooled rate 1 → no variance, NULL
    val allWin = Seq((true, 1L), (false, 1L)).toDF("ga", "x")
    assert(Relational.twoProportionZ(allWin, col("ga"), col("x"))
      .head().isNullAt(5))
  }

  test("friedmanChi2: perfect agreement hits the closed form, " +
    "ties average exactly, fully-tied blocks NULL") {
    // every block orders t0 < t1 < t2: chi2 = 6 at n = 3, k = 3
    val agree = Seq((1L, 2L, 3L), (10L, 20L, 30L), (5L, 6L, 7L))
      .toDF("a", "b", "c")
    val r = Relational.friedmanChi2(agree,
      Seq(col("a"), col("b"), col("c"))).head()
    assert(r.getAs[Long]("n") == 3L && r.getAs[Long]("k") == 3L)
    assert(r.getAs[Long]("chi2_micro") == 6000000L, r)
    // one block with a tie: (1,1,2) → doubled ranks (3,3,6), chi2 = 2
    val tied = Seq((1L, 1L, 2L)).toDF("a", "b", "c")
    assert(Relational.friedmanChi2(tied,
      Seq(col("a"), col("b"), col("c"))).head()
      .getAs[Long]("chi2_micro") == 2000000L)
    // every block fully tied: zero rank variance → NULL
    val flat = Seq((5L, 5L, 5L), (7L, 7L, 7L)).toDF("a", "b", "c")
    assert(Relational.friedmanChi2(flat,
      Seq(col("a"), col("b"), col("c"))).head().isNullAt(2))
  }

  test("kAnonymityAudit: small groups flagged by k, homogeneous " +
    "groups flagged by l, clean release all zeros") {
    val df = (Seq(("A", 1L), ("A", 2L), ("A", 3L)) ++
      (1 to 6).map(_ => ("B", 9L))).toDF("q", "s")
    val r = Relational.kAnonymityAudit(df, Seq(col("q")), col("s"),
      k = 5L, l = 3L).head()
    assert(r.getAs[Long]("n_rows") == 9L &&
      r.getAs[Long]("n_groups") == 2L)
    assert(r.getAs[Long]("n_groups_under_k") == 1L, r) // A: n=3 < 5
    assert(r.getAs[Long]("n_rows_under_k") == 3L, r)
    assert(r.getAs[Long]("min_group") == 3L, r)
    assert(r.getAs[Long]("n_groups_under_l") == 1L, r) // B: 1 distinct
    // a clean release: every group ≥ k with ≥ l distinct sensitives
    val clean = (1 to 5).flatMap(i => Seq(("A", i.toLong),
      ("B", i.toLong))).toDF("q", "s")
    val rc = Relational.kAnonymityAudit(clean, Seq(col("q")),
      col("s"), k = 5L, l = 3L).head()
    assert(rc.getAs[Long]("n_groups_under_k") == 0L &&
      rc.getAs[Long]("n_groups_under_l") == 0L, rc)
  }

  test("kishNeff: equal weights read n_eff = n, one whale weight " +
    "collapses it toward 1, deff is the inverse") {
    val eq = Seq(3L, 3L, 3L, 3L).toDF("w")
    val re = Relational.kishNeff(eq, col("w")).head()
    assert(re.getAs[Long]("n") == 4L && re.getAs[Long]("sum_w") == 12L)
    assert(re.getAs[Long]("n_eff_micro") == 4000000L &&
      re.getAs[Long]("deff_micro") == 1000000L, re)
    // (Σw)²/Σw² = 103²/10009 ≈ 1.06: the whale owns the sample
    val whale = Seq(100L, 1L, 1L, 1L).toDF("w")
    val rw = Relational.kishNeff(whale, col("w")).head()
    assert(rw.getAs[Long]("n_eff_micro") == 1060582L, rw)
    assert(rw.getAs[Long]("deff_micro") == 3771515L, rw)
    // zero total weight -> NULL verdicts
    val z = Seq(0L, 0L).toDF("w")
    val rz = Relational.kishNeff(z, col("w")).head()
    assert(rz.isNullAt(rz.fieldIndex("n_eff_micro")), rz)
  }

  test("poissonDispersion: exact chi2 ratio, Wilson-Hilferty z, " +
    "uniform counts read 0, a whale reads heavily overdispersed") {
    // perfectly uniform counts: s2 = 0 -> D = 0
    val flat = Seq(2L, 2L, 2L, 2L).toDF("x")
    val rf = Relational.poissonDispersion(flat, col("x")).head()
    assert(rf.getAs[Long]("n") == 4L && rf.getAs[Long]("sum_x") == 8L)
    assert(rf.getAs[Long]("chi2_micro") == 0L &&
      rf.getAs[Long]("dispersion_micro") == 0L, rf)
    // one whale holds all events: chi2 = (4*144 - 144)/12 = 36
    val burst = Seq(0L, 0L, 0L, 12L).toDF("x")
    val rb = Relational.poissonDispersion(burst, col("x")).head()
    assert(rb.getAs[Long]("chi2_micro") == 36000000L &&
      rb.getAs[Long]("dispersion_micro") == 12000000L, rb)
    assert(rb.getAs[Long]("z_micro") == 5009828L, rb)
    // degenerate: a single unit -> NULL verdicts, counts intact
    val one = Seq(5L).toDF("x")
    val ro = Relational.poissonDispersion(one, col("x")).head()
    assert(ro.getAs[Long]("n") == 1L &&
      ro.isNullAt(ro.fieldIndex("z_micro")), ro)
  }

  test("dpNoisyCounts: keyed-PRF noise is reproducible under the " +
    "seed, moves with it, scales with 1/epsilon, and stays bounded") {
    val df = (1L to 400L).map(i => (s"g${i % 40}", i)).toDF("g", "i")
    def release(eps: Double, seed: String) =
      Relational.dpNoisyCounts(df, Seq(col("g")), eps, seed)
        .collect().map(r => r.getString(0) ->
          (r.getAs[Long]("n"), r.getAs[Long]("noisy_n"))).toMap
    val a = release(1.0, "s1")
    assert(a.size == 40 && a.values.forall(_._1 == 10L))
    // reproducible: the same seed replays bit-identically
    assert(release(1.0, "s1") == a)
    // a different seed redraws the noise somewhere
    assert(release(1.0, "s2") != a)
    // Laplace(1/eps) at eps=1: |noise| <= -ln(2^-52) ~ 36, and the
    // mean absolute noise over 40 draws sits near the scale 1
    val noise = a.values.map(v => v._2 - v._1)
    assert(noise.forall(n => math.abs(n) <= 37L), noise)
    val meanAbs = noise.map(math.abs).sum.toDouble / noise.size
    assert(meanAbs > 0.2 && meanAbs < 3.0, s"meanAbs=$meanAbs")
    // smaller epsilon -> proportionally larger noise (same draws)
    val wide = release(0.1, "s1")
    val pairs = a.keys.map(k => (a(k)._2 - 10L, wide(k)._2 - 10L))
    assert(pairs.forall { case (n1, n10) =>
      math.abs(n10 - 10L * n1) <= 5L }, pairs) // rounding slack
  }

  test("msprtMonitor: hand lnLambda/p chain per day, the always-valid " +
    "p is the running min and never rises, empty-arm days read p=1") {
    def t(day: Long) = new java.sql.Timestamp(day * 86400000L)
    // day 0: A 10 trials/9 hits, B 10/1; day 1 repeats the pattern;
    // day 2 adds a NULL-effect increment (5/10 each) — p must hold
    def arm(day: Long, a: Boolean, n: Int, x: Int) =
      (0 until n).map(i => (t(day), a, i < x))
    val ev = (arm(0, a = true, 10, 9) ++ arm(0, a = false, 10, 1) ++
      arm(1, a = true, 10, 9) ++ arm(1, a = false, 10, 1) ++
      arm(2, a = true, 10, 5) ++ arm(2, a = false, 10, 5))
      .toDF("ts", "a", "s")
    val got = Relational.msprtMonitor(ev, col("a"), col("s"),
      col("ts")).orderBy(col("day")).collect()
    assert(got.length == 3)
    assert(got.map(_.getAs[Long]("n_a")).toSeq == Seq(10L, 20L, 30L))
    assert(got.map(_.getAs[Long]("x_a")).toSeq == Seq(9L, 18L, 23L))
    // per-day chains (python-mirrored constants)
    assert(got(0).getAs[Long]("ln_lambda_micro") == 11775L, got(0))
    assert(got(1).getAs[Long]("ln_lambda_micro") == 49000L, got(1))
    // the always-valid p path: running min, holds on the null day
    assert(got.map(_.getAs[Long]("p_always_micro")).toSeq ==
      Seq(988294L, 952181L, 952181L), got.toSeq)
    // a first day with only one arm is degenerate: p = 1, ln NULL
    val oneArm = (arm(0, a = true, 5, 3) ++ arm(1, a = false, 5, 2))
      .toDF("ts", "a", "s")
    val g1 = Relational.msprtMonitor(oneArm, col("a"), col("s"),
      col("ts")).orderBy(col("day")).collect()
    assert(g1(0).isNullAt(g1(0).fieldIndex("ln_lambda_micro")) &&
      g1(0).getAs[Long]("p_always_micro") == 1000000L, g1(0))
    assert(!g1(1).isNullAt(g1(1).fieldIndex("ln_lambda_micro")), g1(1))
  }

  test("ksTest: hand supremum off the pooled CDFs, asymptotic p " +
    "chain, identical samples read p = 1, empty side is NULL") {
    // A = {1,2,3,4}, B = {3,4,5,6}: sup|F_A - F_B| = 0.5 at v = 2..4
    val df = Seq((true, 1L), (true, 2L), (true, 3L), (true, 4L),
      (false, 3L), (false, 4L), (false, 5L), (false, 6L))
      .toDF("ga", "v")
    val r = Relational.ksTest(df, col("ga"), col("v")).head()
    assert(r.getAs[Long]("n_a") == 4L && r.getAs[Long]("n_b") == 4L, r)
    assert(r.getAs[Long]("d_micro") == 500000L, r)
    assert(r.getAs[Long]("p_micro") == 534416L, r) // the 8-term chain
    // disjoint supports: D = 1, tiny p
    val disj = Seq((true, 1L), (true, 2L), (false, 9L), (false, 10L))
      .toDF("ga", "v")
    val rd = Relational.ksTest(disj, col("ga"), col("v")).head()
    assert(rd.getAs[Long]("d_micro") == 1000000L &&
      rd.getAs[Long]("p_micro") == 97027L, rd)
    // identical samples: D = 0 -> the small-lambda guard returns 1
    val same = Seq((true, 5L), (true, 7L), (false, 5L), (false, 7L))
      .toDF("ga", "v")
    val rs = Relational.ksTest(same, col("ga"), col("v")).head()
    assert(rs.getAs[Long]("d_micro") == 0L &&
      rs.getAs[Long]("p_micro") == 1000000L, rs)
    // one side empty -> NULLs, counts intact
    val one = Seq((true, 1L), (true, 2L)).toDF("ga", "v")
    val ro = Relational.ksTest(one, col("ga"), col("v")).head()
    assert(ro.getAs[Long]("n_b") == 0L &&
      ro.isNullAt(ro.fieldIndex("d_micro")) &&
      ro.isNullAt(ro.fieldIndex("p_micro")), ro)
  }

  test("adjustedRandIndex: textbook pair counts, identical " +
    "partitions read 1, singletons-vs-anything reads 0, " +
    "double-trivial is NULL") {
    // A = {1,1,1,2,2,2}, B = {1,1,2,2,3,3}: S=2, Sa=6, Sb=3,
    // C(6,2)=15 -> ARI = (2 - 1.2)/(4.5 - 1.2) = 0.242424
    val df = Seq((1L, 1L), (1L, 1L), (1L, 2L), (2L, 2L), (2L, 3L),
      (2L, 3L)).toDF("a", "b")
    val r = Relational.adjustedRandIndex(df, col("a"), col("b")).head()
    assert(r.getAs[Long]("n") == 6L && r.getAs[Long]("n_a") == 2L &&
      r.getAs[Long]("n_b") == 3L, r)
    assert(r.getAs[Long]("s_cells") == 2L &&
      r.getAs[Long]("s_a") == 6L && r.getAs[Long]("s_b") == 3L, r)
    assert(r.getAs[Long]("ari_micro") == 242424L, r)
    // identical partitions -> exactly 1
    val same = Seq((1L, 9L), (1L, 9L), (2L, 8L), (2L, 8L), (3L, 7L))
      .toDF("a", "b")
    assert(Relational.adjustedRandIndex(same, col("a"), col("b"))
      .head().getAs[Long]("ari_micro") == 1000000L)
    // all-singleton candidate vs one-cluster truth -> 0 (chance)
    val zero = (1L to 5L).map(i => (0L, i)).toDF("a", "b")
    assert(Relational.adjustedRandIndex(zero, col("a"), col("b"))
      .head().getAs[Long]("ari_micro") == 0L)
    // both partitions all-singletons -> denominator 0 -> NULL
    val triv = (1L to 4L).map(i => (i, i)).toDF("a", "b")
    val rt = Relational.adjustedRandIndex(triv, col("a"), col("b"))
      .head()
    assert(rt.isNullAt(rt.fieldIndex("ari_micro")), rt)
  }

  test("cmhTest: hand 2x2x2 moments, MH common OR exactly 4, RBG CI " +
    "brackets it; a single-cell stratum is skipped") {
    // stratum 1: (a,b,c,d) = (10,5,5,10); stratum 2: (20,10,10,20) —
    // both have OR 4, so OR_MH = (100/30 + 400/60)/(25/30 + 100/60)
    // = 10/2.5 = 4 exactly in micro units
    def rows(s: Long, a: Int, b: Int, c: Int, d: Int) =
      Seq.fill(a)((s, true, true)) ++ Seq.fill(b)((s, true, false)) ++
        Seq.fill(c)((s, false, true)) ++ Seq.fill(d)((s, false, false))
    val df = (rows(1L, 10, 5, 5, 10) ++ rows(2L, 20, 10, 10, 20) ++
      Seq((3L, true, true))) // n=1 stratum: V undefined -> skipped
      .toDF("s", "e", "o")
    val r = Relational.cmhTest(df, col("s"), col("e"), col("o")).head()
    assert(r.getAs[Long]("n_strata") == 2L &&
      r.getAs[Long]("n_rows") == 90L, r)
    assert(r.getAs[Long]("sum_a") == 30L, r)
    assert(r.getAs[Long]("e_micro") == 22500000L, r)
    assert(r.getAs[Long]("v_micro") == 5753214L, r)
    assert(r.getAs[Long]("chi2_micro") == 9777144L, r)
    assert(r.getAs[Long]("or_micro") == 4000000L, r)
    assert(r.getAs[Long]("lo_micro") == 1664911L &&
      r.getAs[Long]("hi_micro") == 9610123L, r)
    // degenerate: one arm empty in every stratum -> NULL OR, cells kept
    val deg = (Seq.fill(4)((1L, true, true)) ++
      Seq.fill(4)((1L, false, true))).toDF("s", "e", "o")
    val rd = Relational.cmhTest(deg, col("s"), col("e"), col("o"))
      .head()
    assert(rd.isNullAt(rd.fieldIndex("or_micro")), rd)
  }

  test("mondrianAnonymize: median cuts recurse while both halves " +
    "hold k, every final class >= k, intervals tile the space; an " +
    "uncuttable cohort stays one region") {
    val pts = (for (x <- 0L to 3L; y <- 0L to 3L) yield (x, y))
      .toDF("x", "y")
    val got = Relational.mondrianAnonymize(pts,
      Seq(col("x"), col("y")), k = 4L, maxDepth = 8)
      .collect().map(r => r.getAs[String]("region") -> r).toMap
    // 4x4 grid at k=4: cut x at its lower median (1), then y in each
    // half; the third cut would leave 2 < k per side -> final
    assert(got.size == 4, got.keys)
    assert(got.keys.toSet == Set("r00", "r01", "r10", "r11"))
    got.values.foreach { r =>
      assert(r.getAs[Long]("n") == 4L && r.getAs[Long]("depth") == 2L, r)
    }
    assert(got("r00").getAs[Long]("q0_lo") == 0L &&
      got("r00").getAs[Long]("q0_hi") == 1L &&
      got("r00").getAs[Long]("q1_lo") == 0L &&
      got("r00").getAs[Long]("q1_hi") == 1L, got("r00"))
    assert(got("r11").getAs[Long]("q0_lo") == 2L &&
      got("r11").getAs[Long]("q0_hi") == 3L &&
      got("r11").getAs[Long]("q1_lo") == 2L &&
      got("r11").getAs[Long]("q1_hi") == 3L, got("r11"))
    // the generalized release re-audits clean at k
    assert(got.values.map(_.getAs[Long]("n")).min >= 4L)
    // k > n/2: the very first median cut is disallowed -> one region
    val one = Relational.mondrianAnonymize(pts,
      Seq(col("x"), col("y")), k = 9L, maxDepth = 8).collect()
    assert(one.length == 1 && one.head.getAs[Long]("n") == 16L &&
      one.head.getAs[Long]("depth") == 0L, one.toSeq)
  }

  test("fileSkippingReport: a Hilbert layout prunes more files than " +
    "a leading-column sort for a probe on the OTHER dimension") {
    import graft.operators.{Diagnose, Relational}
    val pts = (for (x <- 0L to 31L; y <- 0L to 31L) yield (x, y))
      .toDF("x", "y")
    val hilbertDir = tmpDir("skip-hilbert")
    Relational.hilbertLayout(pts, col("x"), col("y"), bits = 5,
      partitions = 8).write.mode("overwrite").parquet(hilbertDir)
    val xSortDir = tmpDir("skip-xsort")
    pts.repartitionByRange(8, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(xSortDir)
    // probe the NON-leading dimension: y in [0, 7]
    val h = Diagnose.fileSkippingReport(spark, hilbertDir, col("y"),
      0L, 7L).head()
    val xs = Diagnose.fileSkippingReport(spark, xSortDir, col("y"),
      0L, 7L).head()
    assert(h.getAs[Long]("n_files") == 8L &&
      xs.getAs[Long]("n_files") == 8L)
    assert(h.getAs[Long]("n_rows_matched") == 256L &&
      xs.getAs[Long]("n_rows_matched") == 256L)
    // the x-sorted layout cannot skip anything on y; Hilbert can
    assert(xs.getAs[Long]("n_files_hit") == 8L, xs)
    assert(h.getAs[Long]("n_files_hit") < 8L, h)
    assert(h.getAs[Long]("read_amp_micro") <
      xs.getAs[Long]("read_amp_micro"), s"$h vs $xs")
  }

  test("hilbertValue: hand positions, every consecutive curve step " +
    "is grid-adjacent, staged flavor matches inline, layout sorts") {
    val pts = (for (x <- 0L to 7L; y <- 0L to 7L) yield (x, y))
      .toDF("x", "y")
    val h = pts.select(col("x"), col("y"),
      Relational.hilbertValue(col("x"), col("y"), 3).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    // xy2d hand walk (bits = 3, n = 8)
    assert(h((0L, 0L)) == 0L && h((0L, 1L)) == 1L &&
      h((1L, 1L)) == 2L && h((1L, 0L)) == 3L, h)
    assert(h((7L, 0L)) == 63L && h((0L, 7L)) == 21L &&
      h((7L, 7L)) == 42L && h((3L, 4L)) == 31L, h)
    // THE Hilbert property Z-order lacks: consecutive positions are
    // always grid neighbors (|dx| + |dy| = 1), all 63 steps
    val pos = h.map(_.swap)
    (0L until 63L).foreach { d =>
      val (x1, y1) = pos(d); val (x2, y2) = pos(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump at d=$d: ($x1,$y1) -> ($x2,$y2)")
    }
    // the staged (linear-plan) flavor is value-identical
    val staged = Relational.withHilbertValue(pts, col("x"), col("y"),
      "h", 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(staged == h)
    // wide-space staged flavor builds + runs (bits=16 plan stays sane)
    assert(Relational.withHilbertValue(pts, col("x"), col("y"),
      "h", 16).filter(col("h") >= 0).count() == 64L)
    // layout: partition-local sort on the curve key, ranges disjoint
    val laid = Relational.hilbertLayout(pts, col("x"), col("y"),
      bits = 3, partitions = 4)
    val perPart = laid
      .select(Relational.hilbertValue(col("x"), col("y"), 3).as("h"),
        spark_partition_id().as("p"))
      .groupBy(col("p"))
      .agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
      .orderBy(col("lo")).collect()
    perPart.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("hi") <= b.getAs[Long]("lo"),
          perPart.mkString(";"))
      case _ => ()
    }
  }

  test("withHilbertValueN: 3-D/4-D bijection over the full grid and " +
    "every consecutive curve step is grid-adjacent (Skilling); " +
    "zOrderValueN hand bits; N-layouts sort disjoint ranges") {
    // 3-D, bits=3: all 512 cells — the curve must VISIT each exactly
    // once (bijection) and every step must move one unit along one
    // axis (the Hilbert property; a transpose/interleave slip breaks
    // one of the two immediately)
    val pts3 = (for (x <- 0L to 7L; y <- 0L to 7L; z <- 0L to 7L)
      yield (x, y, z)).toDF("x", "y", "z")
    val cols3 = Seq(col("x"), col("y"), col("z"))
    val h3 = Relational.withHilbertValueN(pts3, cols3, "h", 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    assert(h3.values.toSeq.sorted == (0L until 512L), "not a bijection")
    val pos3 = h3.map(_.swap)
    (0L until 511L).foreach { d =>
      val (x1, y1, z1) = pos3(d); val (x2, y2, z2) = pos3(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) +
        math.abs(z1 - z2) == 1,
        s"jump at d=$d: ($x1,$y1,$z1) -> ($x2,$y2,$z2)")
    }
    // 4-D, bits=2: 256 cells, same two pins
    val pts4 = (for (a <- 0L to 3L; b <- 0L to 3L; c <- 0L to 3L;
      d <- 0L to 3L) yield (a, b, c, d)).toDF("a", "b", "c", "d")
    val h4 = Relational.withHilbertValueN(pts4,
      Seq(col("a"), col("b"), col("c"), col("d")), "h", 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)) -> r.getLong(4)).toMap
    assert(h4.values.toSeq.sorted == (0L until 256L))
    val pos4 = h4.map(_.swap)
    (0L until 255L).foreach { d =>
      val (a1, b1, c1, d1) = pos4(d); val (a2, b2, c2, d2) = pos4(d + 1)
      assert(math.abs(a1 - a2) + math.abs(b1 - b2) +
        math.abs(c1 - c2) + math.abs(d1 - d2) == 1, s"4-D jump at $d")
    }
    // zOrderValueN hand bits: column j owns output bit positions
    // i*n + j
    val z3 = pts3.select(col("x"), col("y"), col("z"),
      Relational.zOrderValueN(cols3, 3).as("zv"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    assert(z3((1L, 0L, 0L)) == 1L && z3((0L, 1L, 0L)) == 2L &&
      z3((0L, 0L, 1L)) == 4L && z3((1L, 1L, 1L)) == 7L &&
      z3((2L, 0L, 0L)) == 8L && z3((7L, 7L, 7L)) == 511L, z3)
    // every 4x4x4 octant occupies one contiguous 64-value z block
    for (tx <- 0 to 1; ty <- 0 to 1; tz <- 0 to 1) {
      val tile = z3.filter { case ((x, y, z), _) =>
        x / 4 == tx && y / 4 == ty && z / 4 == tz }.values
      assert(tile.max - tile.min == 63L, s"octant $tx,$ty,$tz")
    }
    // N-layouts: partition-local sort on the curve key, disjoint
    // ranges (re-derive the key each layout used and compare)
    def disjointRanges(keyed: org.apache.spark.sql.DataFrame): Unit = {
      val perPart = keyed
        .groupBy(col("p"))
        .agg(min(col("k")).as("lo"), max(col("k")).as("hi"))
        .orderBy(col("lo")).collect()
      assert(perPart.length > 1)
      perPart.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("hi") <= b.getAs[Long]("lo"),
            perPart.mkString(";"))
        case _ => ()
      }
    }
    disjointRanges(Relational.withHilbertValueN(
      Relational.hilbertLayoutN(pts3, cols3, bits = 3, partitions = 4),
      cols3, "k", 3).select(spark_partition_id().as("p"), col("k")))
    disjointRanges(
      Relational.zOrderLayoutN(pts3, cols3, bits = 3, partitions = 4)
        .select(spark_partition_id().as("p"),
          Relational.zOrderValueN(cols3, 3).as("k")))
  }

  test("zOrderValue: hand interleaves, tile containment; " +
    "zOrderLayout sorts within range partitions") {
    val pts = for (x <- 0L to 7L; y <- 0L to 7L) yield (x, y)
    val df = pts.toDF("x", "y")
    val z = df.select(col("x"), col("y"),
      Relational.zOrderValue(col("x"), col("y"), 3).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(z((0L, 0L)) == 0L && z((1L, 0L)) == 1L &&
      z((0L, 1L)) == 2L && z((1L, 1L)) == 3L && z((2L, 0L)) == 4L &&
      z((3L, 3L)) == 15L && z((7L, 7L)) == 63L, z)
    // every 4×4 tile occupies one contiguous 16-value z block
    for (tx <- 0 to 1; ty <- 0 to 1) {
      val tile = z.filter { case ((x, y), _) =>
        x / 4 == tx && y / 4 == ty }.values
      assert(tile.max - tile.min == 15L, s"tile $tx,$ty: $tile")
    }
    // layout: z non-decreasing within each partition, ranges disjoint
    val big = (0L until 4096L).map(i => (i % 64, i / 64)).toDF("x", "y")
    val laid = Relational.zOrderLayout(big, col("x"), col("y"),
      bits = 6, partitions = 8)
    val perPart = laid.select(
      org.apache.spark.sql.functions.spark_partition_id().as("p"),
      Relational.zOrderValue(col("x"), col("y"), 6).as("z"))
      .collect().groupBy(_.getInt(0))
      .map { case (p, rows) => p -> rows.map(_.getLong(1)).toSeq }
    perPart.values.foreach(zs => assert(zs == zs.sorted, "unsorted"))
    val ranges = perPart.toSeq.sortBy(_._1)
      .map { case (_, zs) => (zs.min, zs.max) }
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo, _)) => assert(hi <= lo, ranges)
      case _ =>
    }
  }

  test("byFdr: hand harmonic cutoff is stricter than BH on the same " +
    "table; discoveries are a subset") {
    // p = (0.001, 0.02, 0.04, 0.9), α = 0.1: BH keeps 3, BY keeps 2
    val df = Seq(("h1", 1000L), ("h2", 20000L), ("h3", 40000L),
      ("h4", 900000L)).toDF("hid", "p_micro")
    def disc(out: org.apache.spark.sql.DataFrame) = out.collect()
      .filter(_.getAs[Boolean]("discovered"))
      .map(_.getString(0)).toSet
    val bh = disc(Relational.bhFdr(df, "hid", col("p_micro"), 100000L))
    val by = disc(Relational.byFdr(df, "hid", col("p_micro"), 100000L))
    assert(bh == Set("h1", "h2", "h3"), bh)
    assert(by == Set("h1", "h2"), by)
    assert(by.subsetOf(bh))
  }

  test("hazardRatio: faster-churning arm reads HR > 1 with a " +
    "bracketing CI; the inverse arm reads the reciprocal direction") {
    // odd users churn on day 1; even users survive to the horizon
    val ev = ((1L to 10L).map(u => (u, 0L)) ++
      (1L to 10L).filter(_ % 2 == 0).map(u => (u, 5L)))
      .toDF("u", "d")
      .select(col("u"), timestamp_seconds(col("d") * 86400L).as("ts"))
    val rOdd = graft.operators.TimeSeries.hazardRatio(ev, "u", col("ts"),
      pmod(col("u"), lit(2L)) === 1).head()
    assert(rOdd.getAs[Long]("hr_micro") > 1000000L, rOdd)
    assert(rOdd.getAs[Long]("lo_micro") < rOdd.getAs[Long]("hr_micro"))
    assert(rOdd.getAs[Long]("hi_micro") > rOdd.getAs[Long]("hr_micro"))
    val rEven = graft.operators.TimeSeries.hazardRatio(ev, "u", col("ts"),
      pmod(col("u"), lit(2L)) === 0).head()
    assert(rEven.getAs[Long]("hr_micro") < 1000000L, rEven)
  }

  test("oddsRatio: hand 2×2 with the Woolf CI; zero cell NULL") {
    val df = (Seq.fill(20)((true, true)) ++ Seq.fill(10)((true, false))
      ++ Seq.fill(5)((false, true)) ++ Seq.fill(40)((false, false)))
      .toDF("x", "y")
    val r = Relational.oddsRatio(df, col("x"), col("y")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      == ((20L, 10L, 5L, 40L)))
    assert(r.getAs[Long]("or_micro") == 16000000L, r)
    val se = math.sqrt(1.0 / 20 + 1.0 / 10 + 1.0 / 5 + 1.0 / 40)
    assert(r.getAs[Long]("lo_micro") ==
      math.round(math.exp(math.log(16.0) - 1.959964 * se) * 1e6), r)
    assert(r.getAs[Long]("hi_micro") ==
      math.round(math.exp(math.log(16.0) + 1.959964 * se) * 1e6), r)
    val zero = Seq((true, true), (false, false)).toDF("x", "y")
    assert(Relational.oddsRatio(zero, col("x"), col("y")).head()
      .isNullAt(4))
  }

  test("poissonRateTest: hand rate ratio and log-linear z; zero " +
    "exposure NULL") {
    val df = Seq((true, 20L, 10L), (false, 10L, 10L))
      .toDF("ga", "c", "e")
    val r = Relational.poissonRateTest(df, col("ga"), col("c"),
      col("e")).head()
    assert(r.getAs[Long]("rr_micro") == 2000000L, r)
    assert(r.getAs[Long]("z_micro") ==
      math.round(math.log(2.0) / math.sqrt(1.0 / 20 + 1.0 / 10) * 1e6),
      r)
    val degenerate = Seq((true, 5L, 0L), (false, 3L, 4L))
      .toDF("ga", "c", "e")
    assert(Relational.poissonRateTest(degenerate, col("ga"), col("c"),
      col("e")).head().isNullAt(4))
  }

  test("cochranQ: hand three-treatment value, exact McNemar " +
    "reduction at k = 2, uninformative rows NULL") {
    // C = (4,2,1), N = 7, ΣR² = 15 → Q = 28/6
    val df = Seq((1L, 1L, 0L), (1L, 0L, 0L), (1L, 1L, 1L),
      (1L, 0L, 0L)).toDF("a", "b", "c")
    val r = Relational.cochranQ(df,
      Seq(col("a") === 1L, col("b") === 1L, col("c") === 1L)).head()
    assert(r.getAs[Long]("n") == 4L && r.getAs[Long]("k") == 3L)
    assert(r.getAs[Long]("q_micro") == 4666667L, r)
    // k = 2 on the McNemar fixture (b=5, c=1): Q = χ² = 16/6
    val two = (Seq((1L, 1L)) ++ Seq.fill(5)((1L, 0L)) ++
      Seq((0L, 1L)) ++ Seq((0L, 0L))).toDF("a", "b")
    val r2 = Relational.cochranQ(two,
      Seq(col("a") === 1L, col("b") === 1L)).head()
    assert(r2.getAs[Long]("q_micro") == 2666667L, r2)
    // every row all-success or all-failure: zero denominator → NULL
    val flat = Seq((1L, 1L), (0L, 0L)).toDF("a", "b")
    assert(Relational.cochranQ(flat,
      Seq(col("a") === 1L, col("b") === 1L)).head().isNullAt(2))
  }

  test("mcNemar: hand discordant counts; no-discordance NULL") {
    // label always true; A right on 1-6, B right on 2-7 of 1-8:
    // b = A&!B = {1}, c = !A&B = {7} → wait, craft explicitly below
    val df = Seq(
      (true, true, true),   // concordant right
      (true, false, true),  // b
      (true, false, true),  // b
      (true, false, true),  // b
      (true, false, true),  // b
      (true, false, true),  // b
      (false, true, true),  // c
      (false, false, true)) // concordant wrong
      .toDF("pa", "pb", "y")
    val r = Relational.mcNemar(df, col("pa"), col("pb"), col("y"))
      .head()
    assert(r.getAs[Long]("n") == 8L)
    assert(r.getAs[Long]("b_only") == 5L && r.getAs[Long]("c_only") == 1L)
    assert(r.getAs[Long]("chi2_micro") == 2666667L, r) // 16/6
    assert(r.getAs[Long]("chi2_cc_micro") == 1500000L, r) // 9/6
    val agree = Seq((true, true, true), (false, false, true))
      .toDF("pa", "pb", "y")
    assert(Relational.mcNemar(agree, col("pa"), col("pb"), col("y"))
      .head().isNullAt(3))
  }

  test("kruskalWallisH: hand three-group ranks; tie correction; " +
    "degenerate NULL") {
    // {1,2,3} {4,5,6} {7,8,9}: R = 6,15,24 → H = 7.2, no ties
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 4L), ("b", 5L),
      ("b", 6L), ("c", 7L), ("c", 8L), ("c", 9L)).toDF("g", "v")
    val r = Relational.kruskalWallisH(df, col("g"), col("v")).head()
    assert(r.getAs[Long]("k") == 3L && r.getAs[Long]("n") == 9L)
    assert(r.getAs[Long]("h_micro") == 7200000L, r)
    assert(r.getAs[Long]("h_tie_micro") == 7200000L, r)
    // full ties within groups: snapped terms give H = 3, H' = 3.75
    val tied = Seq(("a", 1L), ("a", 1L), ("b", 2L), ("b", 2L))
      .toDF("g", "v")
    val rt = Relational.kruskalWallisH(tied, col("g"), col("v")).head()
    assert(rt.getAs[Long]("h_micro") == 3000000L, rt)
    assert(rt.getAs[Long]("h_tie_micro") == 3750000L, rt)
    // all values identical: no rank information, NULL
    val deg = Seq(("a", 5L), ("b", 5L)).toDF("g", "v")
    assert(Relational.kruskalWallisH(deg, col("g"), col("v")).head()
      .isNullAt(2))
  }

  test("poissonBootstrapCI: the interval brackets the sample mean, " +
    "narrows ~1/sqrt(n), and replicate weights are key-deterministic") {
    def ci(n: Int): (Long, Long, Long) = {
      val df = spark.range(n).select(col("id"),
        (col("id") % 1000).as("v"))
      val r = Relational.poissonBootstrapCI(df, col("id"), col("v"),
        b = 32, alphaMicro = 100000L).head()
      (r.getAs[Long]("mean_micro"), r.getAs[Long]("lo_micro"),
        r.getAs[Long]("hi_micro"))
    }
    val (m1, lo1, hi1) = ci(2000)
    assert(lo1 < m1 && m1 < hi1, s"CI [$lo1,$hi1] misses mean $m1")
    // se = 288.7/sqrt(2000) ~ 6.5 units: the 90% width should be a
    // few se, far under 60 units either side
    assert(hi1 - lo1 < 60000000L && hi1 - lo1 > 1000000L,
      s"width ${hi1 - lo1}")
    val (m2, lo2, hi2) = ci(8000)
    assert(lo2 < m2 && m2 < hi2)
    // 4x the rows: width shrinks (noisy factor, but strictly smaller)
    assert(hi2 - lo2 < hi1 - lo1,
      s"CI failed to narrow: ${hi2 - lo2} vs ${hi1 - lo1}")
    // determinism: same inputs, same interval
    assert(ci(2000) == ((m1, lo1, hi1)))
  }

  test("trimmedMeans: one whale cannot move the trimmed/winsorized " +
    "means; ties clip exactly; full-trim degenerates to NULL") {
    // 0..9 plus a 1000 whale, 10% trim -> k=1 drops {0, 1000}
    val whale = ((0L to 9L) :+ 1000L).toDF("v")
    val r = Relational.trimmedMeans(whale, col("v"), 100000L).head()
    assert(r.getAs[Long]("n") == 11L && r.getAs[Long]("k_trimmed") == 1L)
    assert(r.getAs[Long]("mean_micro") == 95000000L)       // 1045/11
    assert(r.getAs[Long]("trimmed_mean_micro") == 5000000L) // mean 1..9
    // winsorized: 0 -> 1, 1000 -> 9: (45 + 1 + 9)/11 = 5
    assert(r.getAs[Long]("winsorized_mean_micro") == 5000000L)
    // ties: {5,5,5,7,7,7} at 20% trim -> k=1 clips one of each
    val tied = Seq(5L, 5L, 5L, 7L, 7L, 7L).toDF("v")
    val t = Relational.trimmedMeans(tied, col("v"), 200000L).head()
    assert(t.getAs[Long]("trimmed_mean_micro") == 6000000L)
    assert(t.getAs[Long]("winsorized_mean_micro") == 6000000L)
    // n - 2k <= 0: NULL means, not a crash
    val tiny = Seq(1L, 2L).toDF("v")
    val d = Relational.trimmedMeans(tiny, col("v"), 499999L).head()
    assert(!d.isNullAt(2)) // plain mean survives
    // k = floor(2*0.499999) = 0 -> no trim; use 3 rows at 49.9999%:
    // k = 1, core = 1 -> still fine; force degenerate with n=2, k=1
    // via trim just under half of n=2 -> k=0; so build n=4, k=2:
    val deg = Relational.trimmedMeans(
      Seq(1L, 2L, 3L, 4L).toDF("v"), col("v"), 499999L).head()
    // k = floor(4*0.499999) = 1 -> core 2, fine; assert it computes
    assert(deg.getAs[Long]("trimmed_mean_micro") == 2500000L)
  }

  test("neymanSample: the noisy stratum takes (almost) the whole " +
    "budget, allocations cap at stratum size, constant-only strata " +
    "fall back to proportional") {
    // two strata, equal size 100: 'flat' constant, 'noisy' high-spread
    val flat = Seq.tabulate(100)(i => ("flat", i.toLong, 50L))
    val noisy = Seq.tabulate(100)(i =>
      ("noisy", 1000L + i, if (i % 2 == 0) 0L else 1000L))
    val df = (flat ++ noisy).toDF("g", "id", "v")
    val got = Relational.neymanSample(df, "g", "id", col("v"),
      n = 40, seed = 7)
    val byStratum = got.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // σ_flat = 0 → weight 0 → the noisy stratum owns the budget
    assert(byStratum.getOrElse("noisy", 0L) == 40L, byStratum)
    assert(byStratum.getOrElse("flat", 0L) == 0L, byStratum)
    // n_h caps at N_h when the budget exceeds a stratum
    val tiny = (Seq.tabulate(5)(i => ("small", i.toLong,
      if (i % 2 == 0) 0L else 1000L)) ++
      Seq.tabulate(100)(i => ("flat2", 100L + i, 7L)))
      .toDF("g", "id", "v")
    val capped = Relational.neymanSample(tiny, "g", "id", col("v"),
      n = 40, seed = 7)
      .groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(capped.getOrElse("small", 0L) == 5L, capped) // capped at N_h
    // all-constant population → proportional fallback
    val const = (Seq.tabulate(30)(i => ("a", i.toLong, 5L)) ++
      Seq.tabulate(10)(i => ("b", 100L + i, 9L))).toDF("g", "id", "v")
    val prop = Relational.neymanSample(const, "g", "id", col("v"),
      n = 20, seed = 7)
      .groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(prop == Map("a" -> 15L, "b" -> 5L), prop)
    // determinism: same seed, same ids
    val again = Relational.neymanSample(df, "g", "id", col("v"),
      n = 40, seed = 7)
    assert(got.collect().map(_.toSeq).toSet ==
      again.collect().map(_.toSeq).toSet)
  }

  test("round-10 determinism properties: neymanSample and bhFdr are " +
    "partitioning-invariant; shrinking every p-value never shrinks " +
    "the BH discovery set") {
    val df = (Seq.tabulate(120)(i =>
      (s"s${i % 4}", i.toLong, (i * 37 % 90).toLong))).toDF("g", "id", "v")
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toSeq).toSet
    val base = canon(Relational.neymanSample(df, "g", "id", col("v"),
      n = 30, seed = 3))
    val shuffled = canon(Relational.neymanSample(
      df.repartition(17, col("v")), "g", "id", col("v"),
      n = 30, seed = 3))
    assert(base == shuffled, "neymanSample depends on partitioning")
    val ps = Seq.tabulate(12)(i => (i.toLong, (i * 83000 + 7000).toLong))
      .toDF("id", "p_micro")
    def discovered(d: org.apache.spark.sql.DataFrame) =
      d.filter(col("discovered")).select("id").collect()
        .map(_.getLong(0)).toSet
    val d1 = discovered(Relational.bhFdr(ps, "id", col("p_micro"),
      100000L))
    val d1b = discovered(Relational.bhFdr(ps.repartition(7), "id",
      col("p_micro"), 100000L))
    assert(d1 == d1b, "bhFdr depends on partitioning")
    // monotonicity: halving every p-value can only ADD discoveries
    val d2 = discovered(Relational.bhFdr(
      ps.select(col("id"), (col("p_micro") / 2L).cast("long")
        .as("p_micro")), "id", col("p_micro"), 100000L))
    assert(d1.subsetOf(d2), s"$d1 not within $d2")
  }

  test("conformalInterval: hand k-th order statistic, observed " +
    "coverage, and the infinite small-sample interval") {
    // 10 calibration residuals 1..10 at alpha=0.1: k = ceil(11*0.9)
    // = 10 -> q-hat = 10; test {5, 10, 11}: 2 of 3 covered
    val d = ((1L to 10L).map(r => (r, true)) ++
      Seq((5L, false), (10L, false), (11L, false)))
      .toDF("r", "c")
    val got = Relational.conformalInterval(d, col("r"), col("c"),
      alphaMicro = 100000L).head()
    assert(got.getLong(0) == 10L && got.getLong(1) == 3L)
    assert(got.getLong(2) == 10L)   // k
    assert(got.getLong(3) == 10L)   // q-hat
    assert(got.getDouble(4) == 0.666667)
    // n_cal = 2: k = ceil(3*0.9) = 3 > 2 -> infinite interval,
    // everything covered
    val tiny = Seq((1L, true), (2L, true), (999L, false))
      .toDF("r", "c")
    val inf = Relational.conformalInterval(tiny, col("r"), col("c"),
      alphaMicro = 100000L).head()
    assert(inf.isNullAt(3) && inf.getDouble(4) == 1.0)
  }

  test("cuped: when the metric IS the covariate the adjusted means " +
    "collapse to the global mean for both variants") {
    val ts0 = 1700000000L
    val split = ts0 + 1000L
    // one pre event (covariate) and one identical post purchase per
    // user: y == x, θ = 1, mean_adj = mean_x_all for every variant
    val rows = (0 until 40).flatMap { u =>
      val v = (u % 7 + 1) * 10.0
      Seq((u.toLong, new java.sql.Timestamp(ts0 * 1000L), "view", v),
        (u.toLong, new java.sql.Timestamp((split + 10) * 1000L),
          "purchase", v))
    }
    val ev = rows.toDF("user_id", "ts", "event_type", "value")
    val out = EventOps.cuped(ev, split, "purchase").collect()
    assert(out.length == 2)
    val adj = out.map(_.getAs[Double]("mean_adj_milli")).distinct
    assert(adj.length == 1,
      s"CUPED should equalize pure-covariate variants: ${adj.toSeq}")
    out.foreach(r => assert(math.abs(r.getAs[Double]("theta") - 1.0)
      < 1e-6))
  }

  test("multisetOverlap counts bag intersection, not set intersection") {
    val df = Seq((Seq("a", "a", "b"), Seq("a", "a", "a", "c")))
      .toDF("p", "r")
    val got = df.select(TextOps.multisetOverlap(col("p"), col("r"))
      .as("o")).head().getLong(0)
    // 'a' appears twice in p, three times in r → min 2; b/c disjoint
    assert(got == 2L)
  }

  test("pcaPowerTop recovers a planted dominant axis") {
    // axis e1 carries 20× the variance of the rest
    val rows = (0 until 200).map { i =>
      val s = if (i % 2 == 0) 1.0f else -1.0f
      Tuple1(Array(0.01f * (i % 5), s * 20.0f, 0.02f * (i % 3),
        0.01f * (i % 7)))
    }
    val df = rows.toDF("embedding")
    val out = SimSearch.pcaPowerTop(df, "embedding", dim = 4, iters = 6)
      .collect().sortBy(_.getAs[Int]("pos"))
    val v = out.map(_.getAs[Long]("v_micro"))
    assert(math.abs(v(1)) == 1000000L,
      s"dominant axis should carry the max-abs component: ${v.toSeq}")
    assert(v.zipWithIndex.filter(_._2 != 1).forall(c =>
      math.abs(c._1) < 100000L),
      s"off-axis components should be small: ${v.toSeq}")
  }

  test("spearmanByGroup: monotone +1, anti-monotone -1, constant NULL") {
    val rows =
      (1 to 20).map(i => ("up", i.toLong, (i * i).toLong)) ++     // ↑↑
      (1 to 20).map(i => ("down", i.toLong, (100 - i).toLong)) ++ // ↑↓
      (1 to 20).map(i => ("flat", i.toLong, 7L))                  // b const
    val out = Relational.spearmanByGroup(rows.toDF("g", "a", "b"),
      "g", col("a"), col("b"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(out("up").contains(1.0), s"monotone: ${out("up")}")
    assert(out("down").contains(-1.0), s"anti-monotone: ${out("down")}")
    assert(out("flat").isEmpty, s"constant b must be NULL: ${out("flat")}")
  }

  test("spearmanByGroup average-tie ranks: ties don't break ±1 " +
    "when the tie is consistent in both variables") {
    // a has a tie at 5; b preserves the same ordering incl. the tie
    val rows = Seq(("t", 1L, 10L), ("t", 5L, 20L), ("t", 5L, 20L),
      ("t", 9L, 30L))
    val out = Relational.spearmanByGroup(rows.toDF("g", "a", "b"),
      "g", col("a"), col("b")).head()
    assert(out.getDouble(2) == 1.0)
  }

  test("benfordScreen: digits from exact integers, shares + " +
    "expectations in micros") {
    // 6 values: leading digits 1,1,1,2,2,9
    val df = Seq(1000L, 1500L, 19L, 2L, 250L, 9999L).toDF("v")
    val out = Relational.benfordScreen(df, col("v"))
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1)._1 == 3L && out(2)._1 == 2L && out(9)._1 == 1L)
    assert(out(1)._2 == 500000L) // 3/6
    assert(out(9)._2 == 166667L) // 1/6
    assert(out(1)._3 == 301030L) // log10(2) micros
    assert(out(9)._3 == 45757L)  // log10(10/9) micros
  }

  test("benfordScreen drops non-positive values") {
    val df = Seq(-5L, 0L, 30L).toDF("v")
    val out = Relational.benfordScreen(df, col("v")).collect()
    assert(out.length == 1 && out.head.getInt(0) == 3 &&
      out.head.getLong(1) == 1L)
  }

  test("chiSquareIndependence: independent table has zero terms, " +
    "dependent table doesn't") {
    // perfectly independent 2×2: every cell = rowShare × colShare × N
    val ind = (Seq.fill(40)(("a", "x")) ++ Seq.fill(40)(("a", "y")) ++
      Seq.fill(10)(("b", "x")) ++ Seq.fill(10)(("b", "y")))
      .toDF("r", "c")
    val indCells = Relational.chiSquareIndependence(ind, "r", "c")
      .collect()
    assert(indCells.length == 4)
    assert(indCells.forall(_.getLong(4) == 0L),
      s"independent table must have zero (O-E)^2/E terms")
    // fully dependent: r determines c
    val dep = (Seq.fill(50)(("a", "x")) ++ Seq.fill(50)(("b", "y")))
      .toDF("r", "c")
    val depChi = Relational.chiSquareIndependence(dep, "r", "c")
      .collect().map(_.getLong(4)).sum
    // chi2 for a perfect 2×2 association = N → 100 (in micros: 100e6)
    assert(depChi == 100000000L, s"chi2_micro=$depChi")
  }

  test("mrrAtRank: hits at ranks 1 and 2 with one unanswered query " +
    "average over ALL queries") {
    val df = Seq(
      (1L, 0L, 1), (1L, 1L, 0),  // q1: hit at rank 1 → rr 1.0
      (2L, 0L, 0), (2L, 1L, 1),  // q2: hit at rank 2 → rr 0.5
      (3L, 0L, 0), (3L, 1L, 0)   // q3: no hit
    ).toDF("qid", "rank0", "rel")
    val r = Relational.mrrAtRank(df, col("qid"), col("rank0"),
      col("rel")).head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 0.5) // (1.0 + 0.5 + 0) / 3
  }

  test("generationScores: identical pair scores 1e6 across the " +
    "board; disjoint pair scores 0; longer candidate has bp = 1") {
    val df = Seq(
      (1L, Seq("a", "b", "c", "d"), Seq("a", "b", "c", "d")),
      (2L, Seq("x", "y", "z", "w"), Seq("a", "b", "c", "d")),
      (3L, Seq("a", "b", "c", "d", "e"), Seq("a", "b", "c", "d"))
    ).toDF("id", "cand", "ref")
    val out = TextOps.generationScores(df, "id", col("cand"), col("ref"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("rouge1_r_micro") == 1000000L)
    assert(out(1L).getAs[Long]("rouge2_r_micro") == 1000000L)
    assert(out(1L).getAs[Long]("bleu2_micro") == 1000000L)
    assert(out(2L).getAs[Long]("rouge1_r_micro") == 0L)
    assert(out(2L).getAs[Long]("bleu2_micro") == 0L)
    // candidate ⊃ reference: perfect recall, precision 4/5 and 3/4,
    // no brevity penalty (c > r)
    assert(out(3L).getAs[Long]("rouge1_r_micro") == 1000000L)
    val b3 = out(3L).getAs[Long]("bleu2_micro")
    val want = math.round(math.sqrt((4.0 / 5.0) * (3.0 / 4.0)) * 1e6)
    assert(b3 == want, s"bleu2=$b3 want=$want")
  }
}
