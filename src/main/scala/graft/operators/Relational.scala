package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic keyed relational primitives (SURVEY.md §2.3-§2.6). The tracking
  * veneer (`Pool`, `PlayOps`) delegates here; `SparkEntry`'s gate queries
  * exercise the same code over the driver's TPC-H-ish tables.
  *
  * Scale notes: every op is pure declarative DataFrame algebra, so Catalyst
  * pushes filters/prunes columns into the scan; sampling never shuffles the
  * big side; join-back broadcasts the (≤ n-row) key set.
  */
object Relational {

  /** A1/A2/P4: distinct key universe — only `cols` are read from the scan. */
  def distinctKeys(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(col): _*).distinct()

  /** F1: AND-fold caller predicates (reference `src/query.py:34-36`). */
  def filtered(df: DataFrame, filters: Seq[Column]): DataFrame =
    filters.foldLeft(df)(_ filter _)

  /** A5 rank expression, production flavor: xxhash64 is cheap, codegen'd,
    * and deterministic under any partitioning.
    */
  def hashRank(keyCols: Seq[Column], seed: Long): Column =
    xxhash64(keyCols :+ lit(seed): _*)

  /** A5 rank expression, cross-engine flavor: md5 over a ':'-joined string
    * rendering, computable identically by any engine with md5 (the DuckDB
    * oracle included). Slower than xxhash64 — use for verification.
    */
  def md5Rank(keyCols: Seq[Column], seed: Long): Column =
    md5(concat_ws(":", keyCols.map(_.cast("string")) :+ lit(seed.toString): _*))

  /** A5/O4: exact-n deterministic sample of a (small) key universe.
    * `orderBy(rank).limit(n)` compiles to TakeOrdered — no global sort
    * materialization; ties broken by the key columns so the chosen set is
    * total-order stable. Degenerate cases (empty, fewer than n) fall out of
    * `limit` with no driver round-trip.
    */
  def sampleExact(keys: DataFrame, n: Int, rank: Column,
      tieBreak: Seq[Column]): DataFrame =
    keys.orderBy(rank +: tieBreak: _*).limit(n)

  /** J1: fetch every row of the selected keys. The key side is sample-sized
    * → broadcast hash join; the big side never moves.
    */
  def joinBack(big: DataFrame, keys: DataFrame, on: Seq[String]): DataFrame =
    big.join(broadcast(keys), on, "inner")

  /** J2: input/output split-table merge on a composite key (the 2026
    * dataset's documented recipe, `data/nfl-bdb/2026/README.md:91-94`).
    * Both sides are big → let AQE pick sort-merge; co-partitioned writes
    * (bucketBy on the key) make it shuffle-free where the lake allows.
    */
  def mergeSplit(in: DataFrame, out: DataFrame, on: Seq[String],
      how: String = "inner"): DataFrame =
    in.join(out, on, how)

  /** J3: feature-store side-car left join (`docs/DATA_LAKE_GUIDE.md:124-133`). */
  def sidecarJoin(raw: DataFrame, features: DataFrame,
      on: Seq[String]): DataFrame =
    raw.join(features, on, "left")

  /** Union of weekly/vintage drops (`2026/README.md:84-88`): by name, with
    * null-fill for columns a drop lacks — heterogeneous vintages union
    * cleanly instead of failing the batch.
    */
  def unionWeeks(frames: Seq[DataFrame]): DataFrame = {
    require(frames.nonEmpty, "unionWeeks of zero frames")
    frames.reduceLeft(_.unionByName(_, allowMissingColumns = true))
  }

  /** O2/O4: multi-key canonical sort + limit (TakeOrdered — no full sort). */
  def sortLimit(df: DataFrame, cols: Seq[String], n: Int): DataFrame =
    df.orderBy(cols.map(col): _*).limit(n)

  /** As-of join: for every left row, the single latest right row with
    * `right.ts <= left.ts` within the same key (the time-series join
    * Spark lacks as a primitive). Implemented union-then-window: both
    * sides interleave into one partition-by-key, order-by-(ts, side,
    * tieBreak) stream and `last(payload, ignoreNulls)` carries the most
    * recent right payload forward onto each left row. ONE shuffle + sort
    * regardless of side sizes — no join explosion, no per-row probing;
    * right rows sort before left rows at equal timestamps so an exact-ts
    * match is visible. Inner semantics: left rows with no prior right row
    * are dropped.
    *
    * The whole payload travels as ONE struct carried by a single
    * `last(ignoreNulls)`, so every output row's payload fields come from
    * the same right row even when individual fields are null, and the
    * struct's own non-nullness (never null for a right row, even one with
    * all-null fields) is the match marker for the inner filter.
    *
    * @param payloadCols right-side columns to carry (renamed as given)
    * @param tieBreak    deterministic order among equal-ts right rows
    */
  def asofJoin(
      left: DataFrame, right: DataFrame, keys: Seq[String], tsCol: String,
      payloadCols: Map[String, String], tieBreak: Seq[String] = Nil)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val payload = payloadCols.toSeq.sortBy(_._1)
    val l = left
      .withColumn("_src", lit(1))
    val r = right.select(
      keys.map(col) ++ Seq(col(tsCol), lit(0).as("_src"),
        struct(payload.map { case (from, to) => col(from).as(to) }: _*)
          .as("_pay")) ++
        tieBreak.map(c => col(c).as(s"_tb_$c")): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc +: col("_src").asc +:
        tieBreak.map(c => col(s"_tb_$c").asc): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = unioned
      .withColumn("_pc", last(col("_pay"), ignoreNulls = true).over(w))
    carried
      .filter(col("_src") === 1 && col("_pc").isNotNull)
      .select(left.columns.toIndexedSeq.map(col) ++
        payload.map { case (_, to) => col("_pc").getField(to).as(to) }: _*)
  }

  /** Long→wide pivot: one row per key, one column per (known) pivot
    * value, cells aggregated by count. Fixed value list keeps the plan
    * single-pass (no values-discovery job) — the right call at scale
    * where the category set is known.
    */
  def pivotCounts(
      df: DataFrame, keyCol: String, pivotCol: String,
      values: Seq[String]): DataFrame =
    df.groupBy(col(keyCol))
      .pivot(pivotCol, values)
      .agg(count(lit(1)))
      .na.fill(0, values)

  /** Stratified exact-n sample: `n` deterministic rows per class, chosen
    * by the cross-engine md5 rank (seeded). Selection runs on the
    * windowless two-phase top-k ([[graft.sim.SimSearch.topKPerKey]]) —
    * per-partition top-n then global top-n per class — so no reducer
    * ever sorts a whole class (the window formulation would). The
    * balancing step of a training-data pipeline: same n per language /
    * source / label regardless of class skew.
    *
    * Output: (classCol, pos, idCol) with pos 0-based inside the class.
    */
  def stratifiedSample(
      df: DataFrame, classCol: String, idCol: String,
      n: Int, seed: Long): DataFrame =
    graft.sim.SimSearch.topKPerKey(
      df.select(col(classCol), col(idCol),
        md5Rank(Seq(col(idCol)), seed).as("_r")),
      classCol, col("_r"), col(idCol), n)
      .select(col(classCol), col("rank").as("pos"), col("neighbor").as(idCol))

  /** Neyman-allocation stratified sample (Neyman 1934): under a total
    * budget `n`, draw `n_h ∝ N_h·σ_h` rows from each stratum — the
    * allocation that minimizes the variance of the stratified MEAN
    * estimator: big and internally-noisy strata get more budget than
    * proportional allocation gives them, near-constant strata almost
    * none. The survey-sampling step of corpus curation when the
    * estimand is a mean (quality score, toxicity rate, label cost per
    * annotated doc) rather than balanced class counts
    * ([[stratifiedSample]]'s job).
    *
    * Determinism: per-stratum moments are exact integers (count, Σv,
    * Σv² in decimal — the welch discipline); the stratum weight
    * `N_h·σ_h` micro-snaps to ONE integer per stratum so the total is
    * an exact integer sum (a float total would be partition-order
    * noise); allocation is `floor(n·share)` plus largest-remainder
    * distribution of the leftover, ranked by (fraction desc, stratum)
    * over the |strata|-row table (bounded — model metadata, never the
    * corpus); an all-constant population (Σ weight = 0) falls back to
    * proportional shares; `n_h` caps at `N_h` (the freed budget is NOT
    * redistributed — one-pass arithmetic, documented). The in-stratum
    * draw is the seeded md5-rank take on the windowless two-phase
    * top-k, so no reducer sorts a stratum.
    *
    * Output: (stratumCol, idCol, n_h) — chosen ids with their
    * stratum's allocation.
    */
  def neymanSample(
      df: DataFrame, stratumCol: String, idCol: String,
      valueInt: Column, n: Int, seed: Long): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    import org.apache.spark.sql.expressions.Window
    val m = df.select(col(stratumCol), col(idCol),
      valueInt.cast("long").as("_v"))
    val vd = col("_v").cast("decimal(19,0)")
    val mom = m.groupBy(col(stratumCol)).agg(
      count(lit(1)).as("_nh"), sum(col("_v")).as("_s"),
      sum(vd * vd).as("_q"))
    val variance = when(col("_nh") < 2L, lit(0.0)).otherwise(
      (col("_nh").cast("double") * col("_q").cast("double") -
        col("_s").cast("double") * col("_s").cast("double")) /
        (col("_nh").cast("double") * (col("_nh") - 1L).cast("double")))
    val wts = mom.select(col(stratumCol), col("_nh"),
      round(col("_nh").cast("double") * sqrt(variance) * lit(1000000.0))
        .cast("long").as("_wm"))
    val tot = wts.agg(sum(col("_wm")).as("_tw"), sum(col("_nh")).as("_tn"))
    val share = when(col("_tw") > 0L,
      col("_wm").cast("double") / col("_tw").cast("double"))
      .otherwise(col("_nh").cast("double") / col("_tn").cast("double"))
    val raw = lit(n.toDouble) * share
    val alloc0 = wts.crossJoin(broadcast(tot))
      .select(col(stratumCol), col("_nh"),
        floor(raw).as("_base"),
        round(raw - floor(raw), 6).as("_frac"))
    val wRank = Window.orderBy(col("_frac").desc, col(stratumCol))
    val alloc = alloc0
      .crossJoin(broadcast(alloc0.agg(sum(col("_base")).as("_ba"))))
      .withColumn("_rk", row_number().over(wRank))
      .select(col(stratumCol),
        least(col("_base") +
          when(col("_rk") <= lit(n.toLong) - col("_ba"), 1L)
            .otherwise(0L),
          col("_nh")).as("n_h"))
    graft.sim.SimSearch.topKPerKey(
      m.select(col(stratumCol), col(idCol),
        md5Rank(Seq(col(idCol)), seed).as("_r")),
      stratumCol, col("_r"), col(idCol), n)
      .join(alloc, Seq(stratumCol))
      .filter(col("rank") < col("n_h"))
      .select(col(stratumCol), col("neighbor").as(idCol), col("n_h"))
  }

  /** Weighted exact-n sample without replacement — priority sampling
    * (Duffield, Lund & Thorup): each row gets priority `w / u` with `u`
    * uniform in (0, 1], the sample is the top-n priorities. Inclusion
    * probability is ~proportional to weight; the quality-weighted
    * corpus-mixing step of a training-data pipeline (weight = quality
    * score / token count / source boost).
    *
    * Deterministic and oracle-replayable: `u = (h + 1) / 2^32` from the
    * seeded md5 rank — an exact dyadic rational — so the priority is one
    * IEEE division both engines compute bit-identically. Top-n via
    * `orderBy(...).limit(n)` compiles to TakeOrdered (per-partition
    * heaps + driver merge, no global sort); ties on the rounded
    * priority break by id.
    */
  def prioritySample(
      df: DataFrame, idCol: String, weightCol: Column,
      n: Int, seed: Long): DataFrame = {
    val h = conv(substring(md5Rank(Seq(col(idCol)), seed), 1, 8), 16, 10)
      .cast("long")
    val u = (h + lit(1L)).cast("double") / lit(4294967296.0)
    df.withColumn("priority", round(weightCol.cast("double") / u, 6))
      .orderBy(col("priority").desc, col(idCol))
      .limit(n)
  }

  /** Per-class weighted quotas: exact-n priority sample WITHIN each
    * class — the corpus-mixing step that takes the same number of docs
    * per source/language but picks them ~proportional to a quality
    * weight inside the class. Same determinism story as
    * [[prioritySample]]; selection runs on the windowless two-phase
    * top-k, so no reducer sorts a whole class.
    *
    * Output: (classCol, pos, idCol, priority), pos 0-based by
    * (priority desc, id) inside the class.
    */
  def stratifiedPrioritySample(
      df: DataFrame, classCol: String, idCol: String, weightCol: Column,
      n: Int, seed: Long): DataFrame = {
    val h = conv(substring(md5Rank(Seq(col(idCol)), seed), 1, 8), 16, 10)
      .cast("long")
    val u = (h + lit(1L)).cast("double") / lit(4294967296.0)
    graft.sim.SimSearch.topKPerKey(
      df.select(col(classCol), col(idCol),
          round(weightCol.cast("double") / u, 6).as("_p"))
        // null weight → null priority → null rank, which sort_array
        // orders FIRST (displacing a real selection) while the oracle's
        // row_number ranks it last — drop them, mirroring rankScored
        .filter(col("_p").isNotNull),
      classCol, -col("_p"), col(idCol), n)
      .select(col(classCol), col("rank").as("pos"),
        col("neighbor").as(idCol), (-col("rankval")).as("priority"))
  }

  /** Token-budget sharding (sequence-packing approximation): within each
    * class, docs in id order fill shards of ~`budget` tokens —
    * `shard = exclusive-prefix-tokens div budget`, so a shard holds the
    * docs that start inside one budget window. Deterministic and exactly
    * SQL-replayable (a true greedy packer is a stateful sequential scan;
    * the div rule is the distributable fixed-offset variant).
    *
    * Scale shape: the prefix sum is two-level, so NO reducer ever holds
    * a whole class (a single `partitionBy(class)` window would funnel a
    * 100 TB dominant language through one task). Level 1 computes
    * exclusive prefix sums inside `(class, id >>> log2(bucketWidth))`
    * sub-windows — at most `bucketWidth` rows per window partition.
    * Level 2 prefix-sums the per-bucket TOTALS (one tiny row per bucket
    * — corpus/bucketWidth rows through the per-class window) into
    * bucket offsets, and `offset + local` reassembles the exact global
    * prefix sum. The result is value-identical for any `bucketWidth`,
    * which therefore needs no oracle coordination. Token counts must be
    * non-negative (they are counts): the bucket total is read off the
    * window output as max(inclusive prefix), which needs monotonicity.
    */
  def tokenShards(
      df: DataFrame, classCol: String, idCol: String,
      tokensCol: String, budget: Long,
      bucketWidth: Long = 4096L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget > 0, "budget must be positive")
    require(bucketWidth > 0 && (bucketWidth & (bucketWidth - 1)) == 0,
      s"bucketWidth must be a positive power of two, got $bucketWidth")
    val shift = java.lang.Long.numberOfTrailingZeros(bucketWidth)
    val base = df.select(col(classCol), col(idCol), col(tokensCol))
      .withColumn("_sg",
        shiftrightunsigned(col(idCol).cast("long"), shift))
    val wLocal = Window.partitionBy(col(classCol), col("_sg"))
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = base.withColumn("_lcum",
      coalesce(sum(col(tokensCol)).over(wLocal), lit(0L)))
    val wOff = Window.partitionBy(col(classCol)).orderBy(col("_sg"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // bucket totals come from the WINDOW OUTPUT, not from re-aggregating
    // the input: the inclusive prefix `_lcum + tokens` is non-decreasing
    // inside a bucket (tokens ≥ 0), so its max IS the bucket sum — and
    // because the expression references `_lcum`, Catalyst cannot prune
    // the window out of this subtree and re-derive it from the scan
    // (`sum(tokens)` planned exactly that: a SECOND full corpus scan +
    // tokenize + shuffle for the totals branch — the 100 TB killer this
    // formulation exists to avoid). The agg keys equal the window
    // partition keys, so no new shuffle: one scan, one exchange, both
    // consumers. Null tokens behave identically to sum(tokens) — rows
    // with null contribute null to the max, which ignores them.
    val offsets = local.groupBy(col(classCol), col("_sg"))
      .agg(max(col("_lcum") + col(tokensCol)).as("_stot"))
      .withColumn("_off", coalesce(sum(col("_stot")).over(wOff), lit(0L)))
      .select(col(classCol).as("_ocls"), col("_sg").as("_osg"), col("_off"))
    // NULL-SAFE join keys: a null class (or null id → null _sg) is a
    // valid window partition in the single-window formulation — an
    // equi-join would silently DROP those rows from the output
    local.join(offsets,
        col(classCol) <=> col("_ocls") && col("_sg") <=> col("_osg"))
      .withColumn("_cum", col("_off") + col("_lcum"))
      .withColumn("shard", expr(s"_cum div ${budget}L").cast("int"))
      .drop("_ocls", "_osg", "_sg", "_lcum", "_off", "_cum")
  }

  /** Token-quota mixture sampling (the corpus-mixing executor): fill
    * each class's TOKEN budget in seeded-random order — keep a doc iff
    * the tokens of the docs ranked before it (by seeded md5 hash, then
    * id) total less than `budget`, so every class contributes ~budget
    * tokens and the boundary doc is included (the same first-crossing
    * rule as [[tokenShards]]). Deterministic and SQL-replayable; the
    * selection is a uniform random sample of the class weighted only by
    * order, so it composes with upstream quality filters for
    * DoReMi-style mixture weights (budget per class = the weight).
    *
    * Scale shape: the same two-level prefix sum as [[tokenShards]], but
    * bucketed by the HASH PREFIX (first `hashPrefixLen` hex chars of the
    * rank hash), which is monotonically aligned with the (hash, id)
    * order — so no reducer holds a whole class and the result is
    * value-identical to the single-window formulation at any bucket
    * count. `hashPrefixLen` sizes the level-1 fan-out: 16^len buckets,
    * so a level-1 window partition holds ~class_size/16^len rows — the
    * default 4 (65,536 buckets) keeps a 100 TB dominant-language class
    * in sub-window pieces a single task can hold, where 2 (256 buckets)
    * would funnel class_size/256 rows through each window task. The
    * hash is uniform, so bucket sizes do not skew; selection is
    * prefix-length-invariant, so the knob needs no oracle coordination.
    */
  def tokenQuotaSample(
      df: DataFrame, classCol: String, idCol: String,
      tokensCol: String, budget: Long, seed: Long,
      hashPrefixLen: Int = 4): DataFrame = {
    require(budget > 0, "budget must be positive")
    hashRankedCum(df.select(col(classCol), col(idCol), col(tokensCol)),
      classCol, idCol, col(tokensCol), seed, hashPrefixLen)
      .filter(col("cum_before") < budget)
      .drop("_h", "_hb")
  }

  /** Per-key frequency cap — the domain-cap move of web-corpus curation
    * (C4/RefinedWeb keep at most N pages per registered domain so one
    * crawl-heavy site cannot dominate the mixture): keep a row iff its
    * seeded-random rank within its class is below `cap`. The kept set
    * is a uniform random size-≤cap subset of each class, deterministic
    * in (ids, seed) — re-running on any cluster layout keeps the same
    * rows — and classes already at or under the cap pass through
    * whole. All input columns survive; `rank` (0-based within-class
    * hash rank) is appended for observability.
    *
    * This is [[tokenQuotaSample]] with unit weights: a doc-count
    * budget rather than a token budget. Scale shape: the same
    * two-level hash-prefix prefix sum ([[hashRankedCum]]) — no window
    * partition ever holds a whole class, so a 100 TB mega-domain caps
    * without a single-reducer funnel; selection is
    * prefix-length-invariant.
    */
  def keyCapSample(
      df: DataFrame, classCol: String, idCol: String, cap: Long,
      seed: Long, hashPrefixLen: Int = 4): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    hashRankedCum(df, classCol, idCol, lit(1L), seed, hashPrefixLen)
      .filter(col("cum_before") < cap)
      .withColumn("rank", col("cum_before"))
      .drop("_h", "_hb", "cum_before")
  }

  /** Deterministic global shuffle — the reproducible-training-order
    * primitive: every row gets its position in seeded-md5-hash order
    * (`global_pos`), its round-robin shard (`shard = pos % shards`),
    * and its position within that shard (`shard_pos = pos div
    * shards`). Re-running with the same seed on the same ids yields
    * the identical layout on any cluster size — the property a
    * training job needs to resume mid-epoch or re-materialize a shard;
    * round-robin makes every shard an independent uniform sample of
    * the corpus in shuffled order (no curriculum accidents from
    * ingestion order).
    *
    * Scale shape: positions come from [[hashRankedCum]] with unit
    * weights — the two-level hash-prefix prefix sum, NOT a global
    * `row_number()` window (whose single ORDER BY partition funnels
    * the full 100 TB through one reducer). `hashPrefixLen` 4 = 65,536
    * level-1 buckets, each holding ~N/65536 rows; value-identical to
    * the single-window formulation at any prefix length.
    */
  def globalShuffle(df: DataFrame, idCol: String, seed: Long,
      shards: Int, hashPrefixLen: Int = 4): DataFrame = {
    require(shards > 0, s"shards must be positive, got $shards")
    hashRankedCum(
      df.select(col(idCol)).withColumn("_cls", lit(0)),
      "_cls", idCol, lit(1L), seed, hashPrefixLen)
      .withColumn("global_pos", col("cum_before"))
      .withColumn("shard", pmod(col("global_pos"), lit(shards.toLong)))
      .withColumn("shard_pos", expr(s"global_pos div ${shards}L"))
      .select(col(idCol), col("global_pos"), col("shard"),
        col("shard_pos"))
  }

  /** Per-class percentile bucketing — the CCNet move (Wenzek et al.
    * 2019): rank each class's rows by `scoreCol` ascending and cut at
    * per-mille boundaries, e.g. head/middle/tail thirds of each
    * language by LM perplexity. Rows with a NULL score are EXCLUDED
    * (an unscored doc has no rank; the two engines also disagree on
    * null sort order, so including them could never be oracle-exact).
    *
    * The boundary test is pure BIGINT — row r (0-based) lands in the
    * first bucket i with `r·1000 < n_class·boundsPermille(i)` — so no
    * float multiply can flip a cut against an oracle replay.
    *
    * Scale shape: the same two-level prefix sum as [[tokenShards]],
    * level-1-bucketed by `floor(score·bucketScale)` — monotone in the
    * (score, id) rank order, so per-bucket window ranks + prefix-summed
    * bucket offsets compose to the exact per-class rank with no
    * class-sized window partition. `bucketScale` trades bucket count
    * against bucket width: size it so score-mass spikes (many docs
    * sharing one rounded score) stay within a window task. Class sizes
    * fold from the same aggregation's output and broadcast back.
    */
  def percentileBuckets(df: DataFrame, classCol: String, idCol: String,
      scoreCol: String, boundsPermille: Seq[Int] = Seq(300, 600),
      labels: Seq[String] = Seq("head", "middle", "tail"),
      bucketScale: Double = 16.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(labels.size == boundsPermille.size + 1,
      s"need ${boundsPermille.size + 1} labels, got ${labels.size}")
    require(boundsPermille == boundsPermille.sorted &&
      boundsPermille.forall(p => p > 0 && p < 1000),
      s"boundsPermille must ascend within (0, 1000): $boundsPermille")
    require(bucketScale > 0, "bucketScale must be positive")
    val base = df
      .select(col(classCol), col(idCol), col(scoreCol))
      .filter(col(scoreCol).isNotNull)
      .withColumn("_sb", floor(col(scoreCol) * lit(bucketScale)))
    val wLocal = Window.partitionBy(col(classCol), col("_sb"))
      .orderBy(col(scoreCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = base.withColumn("_lcum",
      coalesce(sum(lit(1L)).over(wLocal), lit(0L)))
    val wOff = Window.partitionBy(col(classCol)).orderBy(col("_sb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // bucket totals off the window OUTPUT (max inclusive prefix), the
    // tokenShards trick that keeps one scan + one exchange for both
    // consumers; class sizes fold from the same small frame
    val bucketTotals = local.groupBy(col(classCol), col("_sb"))
      .agg(max(col("_lcum") + 1L).as("_stot"))
    val offsets = bucketTotals
      .withColumn("_off", coalesce(sum(col("_stot")).over(wOff), lit(0L)))
      .select(col(classCol).as("_ocls"), col("_sb").as("_osb"),
        col("_off"))
    val sizes = bucketTotals.groupBy(col(classCol))
      .agg(sum(col("_stot")).as("_n"))
      .select(col(classCol).as("_scls"), col("_n"))
    val ranked = local
      .join(offsets,
        col(classCol) <=> col("_ocls") && col("_sb") <=> col("_osb"))
      .join(broadcast(sizes), col(classCol) <=> col("_scls"))
      .withColumn("rank", col("_off") + col("_lcum"))
    val bucket = boundsPermille.zip(labels).foldRight(
      lit(labels.last): Column) { case ((p, lab), rest) =>
      when(col("rank") * 1000L < col("_n") * p.toLong, lit(lab))
        .otherwise(rest)
    }
    ranked.select(col(classCol), col(idCol), col(scoreCol),
      col("rank"), col("_n").as("n_class"), bucket.as("bucket"))
  }

  /** Shared two-level seeded-hash prefix-sum core of the quota
    * samplers: append `cum_before` — the exact exclusive prefix sum of
    * `tokens` in per-class (seeded md5 hash, id) order — to `df`
    * (which must carry `classCol` + `idCol`; `tokens` may reference its
    * columns). Level 1 windows over the `hashPrefixLen`-hex-char hash
    * prefix (16^len sub-windows, lexicographically aligned with the
    * sort key); level 2 prefix-sums per-bucket totals read off the
    * window OUTPUT (max of the inclusive prefix — forcing the window
    * into the totals subtree so the shuffle stage is shared, see
    * [[tokenShards]]); offsets rejoin null-safely. Value-identical to
    * the single-window formulation at any prefix length; no reducer
    * ever holds a whole class. Helper columns `_h`/`_hb` remain for
    * the caller to drop.
    */
  private def hashRankedCum(
      df: DataFrame, classCol: String, idCol: String, tokens: Column,
      seed: Long, hashPrefixLen: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(hashPrefixLen > 0 && hashPrefixLen <= 32,
      s"hashPrefixLen must be in [1, 32], got $hashPrefixLen")
    val base = df
      .withColumn("_h", md5Rank(Seq(col(idCol)), seed))
      .withColumn("_hb", substring(col("_h"), 1, hashPrefixLen))
      .withColumn("_tok", tokens)
    val wLocal = Window.partitionBy(col(classCol), col("_hb"))
      .orderBy(col("_h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = base.withColumn("_lcum",
      coalesce(sum(col("_tok")).over(wLocal), lit(0L)))
    val wOff = Window.partitionBy(col(classCol)).orderBy(col("_hb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col(classCol), col("_hb"))
      .agg(max(col("_lcum") + col("_tok")).as("_stot"))
      .withColumn("_off", coalesce(sum(col("_stot")).over(wOff), lit(0L)))
      .select(col(classCol).as("_ocls"), col("_hb").as("_ohb"), col("_off"))
    local.join(offsets,
        col(classCol) <=> col("_ocls") && col("_hb") <=> col("_ohb"))
      .withColumn("cum_before", col("_off") + col("_lcum"))
      .drop("_ocls", "_ohb", "_lcum", "_off", "_tok")
  }

  /** The per-class `quota_c = floor(budget · w_c / Σw)` table of the
    * temperature samplers, `w_c = weight^alpha` over a (class, _n)
    * input. Σw is an ORDER-FIXED fold over the class-sorted weights —
    * a plain float sum's accumulation order is partitioning-dependent,
    * and a last-ulp difference could flip a floor() boundary against
    * an oracle replay. alpha = 0.5 uses `sqrt` (the one power IEEE
    * pins to correct rounding — the hash-gateable choice); other
    * alphas use `pow` (deterministic within one engine only).
    */
  private def temperatureQuotas(
      perClass: DataFrame, classCol: String, alpha: Double,
      budget: Long): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    require(budget > 0, "budget must be positive")
    val wExpr =
      if (alpha == 0.5) sqrt(col("_n").cast("double"))
      else if (alpha == 1.0) col("_n").cast("double")
      else pow(col("_n").cast("double"), lit(alpha))
    // checkpoint: the (class, weight) table is one row per class but
    // its lineage is a corpus aggregation, and it feeds TWO consumers
    // (the Σ fold and the quota projection) — without the cut the
    // corpus is scanned twice more just to rebuild this tiny table
    val weighted = perClass.select(col(classCol), wExpr.as("_w"))
      .localCheckpoint()
    val z = weighted.agg(
      aggregate(
        array_sort(collect_list(struct(col(classCol).as("c"),
          col("_w").as("w")))),
        lit(0.0), (acc, s) => acc + s.getField("w")).as("_z"))
    weighted.crossJoin(broadcast(z))
      .select(col(classCol).as("_qcls"),
        floor(lit(budget.toDouble) * col("_w") / col("_z"))
          .cast("long").as("_quota"))
  }

  /** Temperature-weighted mixture sampling — the mC4/XLM corpus-mixing
    * rule: class c keeps `quota_c = floor(budgetDocs · w_c / Σw)` docs
    * with `w_c = n_c^alpha`; alpha < 1 flattens the class distribution
    * (upsamples tail languages, downsamples the head), alpha = 1 is
    * proportional. Docs are chosen in seeded-hash order — a uniform
    * random sample of each class. Output: (classCol, idCol, pos).
    *
    * Determinism: `alpha = 0.5` uses `sqrt` (IEEE correctly rounded —
    * exactly replayable in any engine) and Σw is an ORDER-FIXED fold
    * over the class-sorted weights — a plain float sum's accumulation
    * order is partitioning-dependent, and a last-ulp difference could
    * flip a `floor()` quota boundary. Other alphas use `pow`, which
    * IEEE does not pin to correct rounding — fine in one engine,
    * documented as not hash-gateable across engines.
    *
    * Scale shape: class sizes are one narrow aggregation; quotas are a
    * class-count-sized broadcast; the per-class rank is the same
    * two-level hash-prefix prefix sum as [[tokenQuotaSample]] (tokens
    * ≡ 1), so no reducer ever holds a whole class.
    */
  def temperatureSample(
      df: DataFrame, classCol: String, idCol: String,
      alpha: Double, budgetDocs: Long, seed: Long,
      hashPrefixLen: Int = 4): DataFrame = {
    val quotas = temperatureQuotas(
      df.groupBy(col(classCol)).agg(count(lit(1)).as("_n")),
      classCol, alpha, budgetDocs)
    // tokens ≡ 1 ⇒ the exclusive prefix count IS the 0-based rank
    hashRankedCum(df.select(col(classCol), col(idCol)), classCol, idCol,
      lit(1L), seed, hashPrefixLen)
      .withColumnRenamed("cum_before", "pos")
      .join(quotas, col(classCol) <=> col("_qcls"))
      .filter(col("pos") < col("_quota"))
      .select(col(classCol), col(idCol), col("pos"))
  }

  /** [[temperatureSample]] with the budget in TOKENS — the realistic
    * mixing unit: class c contributes `floor(budgetTokens · T_c^alpha /
    * Σ)` tokens (T_c = the class's token total), filled in seeded-hash
    * order with the boundary doc included (the [[tokenQuotaSample]]
    * first-crossing rule). alpha < 1 flattens token mass toward tail
    * classes. Output: (classCol, idCol, tokensCol, cum_before).
    *
    * Determinism and scale shape follow the doc-count flavor: exact
    * integer class totals → IEEE-pinned sqrt at alpha = 0.5 →
    * order-fixed Σ fold → broadcast quota join onto the two-level
    * hash-prefix prefix sum.
    */
  def temperatureTokenSample(
      df: DataFrame, classCol: String, idCol: String, tokensCol: String,
      alpha: Double, budgetTokens: Long, seed: Long,
      hashPrefixLen: Int = 4): DataFrame = {
    val quotas = temperatureQuotas(
      df.groupBy(col(classCol)).agg(sum(col(tokensCol)).as("_n")),
      classCol, alpha, budgetTokens)
    hashRankedCum(df.select(col(classCol), col(idCol), col(tokensCol)),
      classCol, idCol, col(tokensCol), seed, hashPrefixLen)
      .join(quotas, col(classCol) <=> col("_qcls"))
      .filter(col("cum_before") < col("_quota"))
      .select(col(classCol), col(idCol), col(tokensCol), col("cum_before"))
  }

  /** Packing-efficiency report over [[tokenShards]] output: per class,
    * shard count, doc/token totals, min/max shard fill, and
    * utilization = total_tokens / (n_shards · budget) — the padding-
    * waste number that tells a training job how much context window
    * the greedy first-crossing packer is throwing away (the boundary
    * doc overflows its shard, so max_fill can exceed budget; every
    * other position is padded). Two nested hash aggregations, G×shards
    * then G rows — nothing corpus-sized after the input.
    */
  def packingStats(shards: DataFrame, classCol: String, shardCol: String,
      tokensCol: String, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    shards.groupBy(col(classCol), col(shardCol))
      .agg(sum(col(tokensCol)).as("_fill"), count(lit(1)).as("_docs"))
      .groupBy(col(classCol))
      .agg(count(lit(1)).as("n_shards"), sum(col("_fill")).as("total_tokens"),
        sum(col("_docs")).as("n_docs"), min(col("_fill")).as("min_fill"),
        max(col("_fill")).as("max_fill"))
      .select(col(classCol), col("n_shards"), col("total_tokens"),
        col("n_docs"), col("min_fill"), col("max_fill"),
        round(col("total_tokens").cast("double") /
          (col("n_shards") * budget).cast("double"), 6).as("utilization"))
  }

  /** UniMax per-class quota table (Chung et al. 2023, "UniMax: Fairer
    * and More Effective Language Sampling for Large-Scale Multilingual
    * Pretraining"): waterfill `budget` tokens across classes, capping
    * each class at `epochsCap` epochs of its own corpus
    * (`c = epochsCap·n_tokens`) and splitting what remains EQUALLY
    * among the uncapped — the fairness rule that stops temperature
    * sampling from either starving tail languages or looping them for
    * dozens of epochs.
    *
    * Closed form, all BIGINT (oracle-exact): sort classes by capacity
    * ascending; class i (1-based, of K) is capped iff
    * `c_i·(K−i+1) + cum_{i−1} ≤ budget` (the condition is monotone in
    * i — `Δ = (c_i−c_{i−1})(K−i+1) ≥ 0` — so the capped set is a
    * prefix); uncapped classes get
    * `floor((budget − cum_{i*}) / (K − i*))`. Up to `K − i*` leftover
    * tokens stay unallocated (integer floor), deterministically.
    *
    * Scale shape: the input is the per-class token-count table (G
    * rows); the single-partition window over it is deliberate — G is
    * thousands at most, and the corpus-sized work (counting, then
    * applying quotas) stays in hash aggregations.
    */
  private[graft] def unimaxQuotas(perClass: DataFrame, classCol: String,
      budget: Long, epochsCap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget > 0, "budget must be positive")
    require(epochsCap > 0, s"epochsCap must be positive, got $epochsCap")
    // tiny table, but its lineage is a corpus aggregation feeding two
    // window branches + the capped fold — cut it once
    val base = perClass
      .select(col(classCol), (col("_n") * epochsCap.toLong).as("_c"))
      .localCheckpoint()
    val ord = Window.orderBy(col("_c"), col(classCol))
    val ranked = base
      .withColumn("_i", row_number().over(ord).cast("long"))
      .withColumn("_cum", sum(col("_c")).over(
        ord.rowsBetween(Window.unboundedPreceding, 0)))
      .crossJoin(broadcast(base.agg(count(lit(1)).as("_k"))))
      .withColumn("_capped",
        col("_c") * (col("_k") - col("_i") + 1L) +
          (col("_cum") - col("_c")) <= budget)
    val star = ranked.filter(col("_capped"))
      .agg(coalesce(max(col("_i")), lit(0L)).as("_istar"),
        coalesce(max(col("_cum")), lit(0L)).as("_cumstar"))
    ranked.crossJoin(broadcast(star))
      // integer `div`, not `/` (double division would round, not floor,
      // and drift from the BIGINT oracle); guarded for the all-capped
      // case where no uncapped share exists
      .withColumn("_share", expr(
        s"CASE WHEN _k > _istar THEN (${budget}L - _cumstar) div (_k - _istar) ELSE 0L END"))
      .select(col(classCol).as("_qcls"),
        when(col("_capped"), col("_c")).otherwise(col("_share"))
          .as("_quota"))
  }

  /** UniMax-allocated token sampling: [[unimaxQuotas]] decides each
    * class's token budget, the shared seeded-hash prefix sum
    * ([[hashRankedCum]]) fills it — same apply machinery as
    * [[temperatureTokenSample]], different (epoch-capped, waterfilled)
    * quota rule. Output: (classCol, idCol, tokensCol, cum_before).
    */
  def unimaxTokenSample(
      df: DataFrame, classCol: String, idCol: String, tokensCol: String,
      budgetTokens: Long, epochsCap: Int, seed: Long,
      hashPrefixLen: Int = 4): DataFrame = {
    val quotas = unimaxQuotas(
      df.groupBy(col(classCol)).agg(sum(col(tokensCol)).as("_n")),
      classCol, budgetTokens, epochsCap)
    hashRankedCum(df.select(col(classCol), col(idCol), col(tokensCol)),
      classCol, idCol, col(tokensCol), seed, hashPrefixLen)
      .join(quotas, col(classCol) <=> col("_qcls"))
      .filter(col("cum_before") < col("_quota"))
      .select(col(classCol), col(idCol), col(tokensCol), col("cum_before"))
  }

  /** Materialize [[tokenShards]] output into packed training SEQUENCES:
    * each (class, shard) becomes one row with its documents' texts
    * joined in id order plus doc/token counts — the final assembly step
    * of sequence packing (shard → one pretraining example).
    *
    * Scale shape: one equi-join (shards are (id, shard) pairs — narrow)
    * + one hash aggregation. Aggregation state per group is bounded by
    * the shard BUDGET — a shard holds ~budget tokens by construction —
    * so unlike packing by class, no group ever buffers a whole
    * language. The in-group id order comes from sorting the collected
    * (id, text) structs, not from a window.
    */
  def packShards(
      shards: DataFrame, docs: DataFrame, classCol: String, idCol: String,
      textCol: String, sep: String = " ",
      tokensCol: String = "n_tokens"): DataFrame =
    shards.join(docs.select(col(idCol), col(textCol)), Seq(idCol))
      .groupBy(col(classCol), col("shard"))
      .agg(
        count(lit(1)).cast("int").as("n_docs"),
        sum(col(tokensCol)).as("shard_tokens"),
        array_join(
          transform(
            array_sort(collect_list(struct(col(idCol).as("id"),
              col(textCol).as("t")))),
            s => s.getField("t")),
          sep).as("packed_text"))

  /** [[packShards]] plus the TRAINING-LOADER metadata: per packed
    * example, the member doc ids in pack order and each doc's
    * EXCLUSIVE token offset within the example — what attention/loss
    * masking needs to reconstruct document boundaries inside a packed
    * sequence. Offsets are in `tokensCol` units (separators count
    * zero); `element_at(offsets, i) .. offsets(i+1)` is doc i's token
    * span. Same single-aggregation scale shape as [[packShards]] —
    * the offset fold runs over the already-collected, shard-budget-
    * bounded member array.
    */
  def packShardsWithOffsets(
      shards: DataFrame, docs: DataFrame, classCol: String, idCol: String,
      textCol: String, sep: String = " ",
      tokensCol: String = "n_tokens"): DataFrame =
    shards.join(docs.select(col(idCol), col(textCol)), Seq(idCol))
      .groupBy(col(classCol), col("shard"))
      .agg(
        count(lit(1)).cast("int").as("n_docs"),
        sum(col(tokensCol)).as("shard_tokens"),
        array_sort(collect_list(struct(col(idCol).as("id"),
          col(textCol).as("t"), col(tokensCol).cast("long").as("n"))))
          .as("_m"))
      .select(col(classCol), col("shard"), col("n_docs"),
        col("shard_tokens"),
        transform(col("_m"), s => s.getField("id")).as("doc_ids"),
        // exclusive prefix sums: fold [0] ++ running totals, drop last
        slice(
          aggregate(col("_m"), array(lit(0L)), (acc, s) =>
            concat(acc, array(element_at(acc, -1) + s.getField("n")))),
          lit(1), size(col("_m"))).as("doc_offsets"),
        array_join(transform(col("_m"), s => s.getField("t")), sep)
          .as("packed_text"))
      .drop("_m")

  /** Inverse of [[packShardsWithOffsets]]: explode packed examples back
    * to one row per member doc — (classCol, shard, idCol, tok_offset).
    * Pure scan-stage zip + explode (no shuffle); the round-trip
    * property `unpack(pack(x)) = x`'s id/offset projection is pinned by
    * test. The debugging/auditing door back out of packed training
    * data.
    */
  def unpackShards(
      packed: DataFrame, classCol: String, idCol: String): DataFrame =
    packed
      .select(col(classCol), col("shard"),
        explode(arrays_zip(col("doc_ids"), col("doc_offsets"))).as("_z"))
      .select(col(classCol), col("shard"),
        col("_z.doc_ids").as(idCol),
        col("_z.doc_offsets").as("tok_offset"))

  /** Cumulative upper bounds for [[hashSplit]] labels — public so an
    * oracle generator can embed the IDENTICAL IEEE partial sums
    * (0.8 + 0.1 is 0.9000000000000001, not 0.9).
    */
  def splitBounds(splits: Seq[(String, Double)]): Seq[(String, Double)] = {
    val total = splits.map(_._2).sum
    splits.zip(
      splits.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }.tail)
      .map { case ((name, _), b) => name -> b }
  }

  /** Deterministic train/val/test split: each row's seeded md5-uniform
    * `u = (h32 + 1) / 2^32` (an exact dyadic rational) picks the first
    * label whose cumulative weight bound is ≥ u. Pure scan-stage
    * arithmetic — no shuffle, no RNG state; stable across runs,
    * partitionings, and engines, and adding rows never moves an
    * existing row between splits (the property a reproducible
    * train/eval protocol needs).
    */
  def hashSplit(
      df: DataFrame, idCol: String, splits: Seq[(String, Double)],
      seed: Long): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      "splits must be non-empty with positive weights")
    val h = conv(substring(md5Rank(Seq(col(idCol)), seed), 1, 8), 16, 10)
      .cast("long")
    val u = (h + lit(1L)).cast("double") / lit(4294967296.0)
    val bounds = splitBounds(splits)
    // first-bound-wins when chain; the last label is the default so
    // coverage is total regardless of float edge cases at u = 1.0
    val label = bounds.init.foldRight(lit(bounds.last._1): Column) {
      case ((name, b), rest) => when(u <= b, name).otherwise(rest)
    }
    df.withColumn("split", label)
  }

  /** Z-order (Morton) value of two non-negative integer dimensions:
    * bit-interleave the low `bits` of each (x gets the even output
    * bits, y the odd). Sorting or range-partitioning a table by this
    * value co-locates rows close in BOTH dimensions, so parquet
    * row-group min/max stats prune 2-D range predicates — the
    * data-clustering step table formats run as OPTIMIZE ZORDER BY. At
    * 100 TB: write with `repartitionByRange(zorderValue(...))` +
    * `sortWithinPartitions`; scans with predicates on either dimension
    * then skip most row groups. Pure integer bit arithmetic — exact in
    * any engine.
    */
  def zorderValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits > 0 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { b =>
      shiftright(x, b).bitwiseAND(lit(1)).cast("long") * lit(1L << (2 * b)) +
        shiftright(y, b).bitwiseAND(lit(1)).cast("long") * lit(1L << (2 * b + 1))
    }.reduce(_ + _)
  }

  /** Z-order-clustered parquet write: range-partition on the Morton
    * value of (xCol, yCol), sort within each file, write. Row groups
    * then hold 2-D-local rows, so min/max stats prune range predicates
    * on EITHER dimension — the full OPTIMIZE ZORDER BY. `files` sizes
    * the output (one range slice per file).
    */
  def writeZordered(
      df: DataFrame, path: String, xCol: String, yCol: String,
      files: Int, bits: Int = 16): Unit = {
    // collision-proof temp name: never clobber a user column — compare
    // case-insensitively because withColumn resolves that way
    val tmp = Iterator.iterate("_z")(_ + "_")
      .find(n => !df.columns.exists(_.equalsIgnoreCase(n))).get
    df.withColumn(tmp, zorderValue(col(xCol), col(yCol), bits))
      .repartitionByRange(files, col(tmp))
      .sortWithinPartitions(tmp)
      .drop(tmp)
      .write.mode("overwrite").parquet(path)
  }

  /** Global top-k most frequent values of an exploded column (corpus
    * vocabulary / stopword derivation). One hash aggregation with
    * map-side partials, then TakeOrdered for the global top-k (no full
    * sort materializes); ties break on the value so the cut is
    * deterministic.
    */
  def topFrequent(df: DataFrame, valueCol: String, k: Int): DataFrame =
    df.groupBy(col(valueCol))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(valueCol))
      .limit(k)

  /** Exact per-group percentiles (continuous/interpolated — the
    * `quantile_cont` definition both Spark and DuckDB implement): one
    * aggregation pass, state bounded by distinct values per group. For
    * 100 TB-tier cardinalities where exact buffers are too big, use
    * [[groupPercentilesApprox]] (t-digest-style sketch, constant state).
    *
    * @param ps (output column name, percentage in [0,1]) pairs
    */
  def groupPercentiles(
      df: DataFrame, keys: Seq[String], valueCol: String,
      ps: Seq[(String, Double)]): DataFrame = {
    val aggs = ps.map { case (n, p) =>
      round(percentile(col(valueCol), lit(p)), 6).as(n)
    }
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Sketch flavor: `approx_percentile`, constant memory per group. */
  def groupPercentilesApprox(
      df: DataFrame, keys: Seq[String], valueCol: String,
      ps: Seq[(String, Double)], accuracy: Int = 10000): DataFrame = {
    val aggs = ps.map { case (n, p) =>
      approx_percentile(col(valueCol), lit(p), lit(accuracy)).as(n)
    }
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Snapshot diff: per-id status between two corpus versions —
    * `added` (only in the new), `removed` (only in the old),
    * `changed` (content hash differs), `unchanged`. The audit a lake
    * runs between crawl drops before committing a new training
    * snapshot (paired with [[graft.text.TextOps.noveltyScore]] for
    * "is the change worth training on").
    *
    * One full outer hash-join on the id; content compares via sha2 so
    * only 32-byte digests ride the join, not text. Both sides scan
    * once.
    */
  def corpusDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    def keyed(df: DataFrame, h: String) = df.select(col(idCol),
      sha2(col(textCol).cast("binary"), 256).as(h))
    keyed(oldDf, "_ho")
      .join(keyed(newDf, "_hn"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("_ho").isNull, "added")
          .when(col("_hn").isNull, "removed")
          .when(col("_ho") === col("_hn"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Robust per-group outlier report — median/MAD instead of mean/σ,
    * so a heavy tail cannot mask itself (the estimator breaks down at
    * 50% contamination, not one point): rows farther than
    * `c · MAD` from the group median are outliers. The telemetry/
    * data-quality screen before training on a numeric column.
    *
    * Two aggregation passes over the data (median, then MAD of the
    * residuals) plus a counting pass — each a hash aggregation with
    * the G-row intermediate BROADCAST back, so the data itself never
    * shuffles. Exact interpolated percentiles replay in an external
    * engine (`quantile_cont` — the q36 pairing), and both the median
    * and the MAD are SNAPPED to 6 decimals before the outlier test, so
    * the decision is one comparison over values both engines agree on
    * exactly (interpolation last-ulp drift cannot flip a row).
    */
  def robustOutliers(
      df: DataFrame, keys: Seq[String], valueCol: String,
      c: Double = 3.0): DataFrame = {
    require(c > 0, s"c must be positive, got $c")
    val kcols = keys.map(col)
    val med = df.groupBy(kcols: _*)
      .agg(round(percentile(col(valueCol), lit(0.5)), 6).as("_med"))
    val withMed = df.join(broadcast(med), keys)
    val mad = withMed.groupBy(kcols: _*)
      .agg(round(percentile(abs(col(valueCol) - col("_med")), lit(0.5)),
        6).as("_mad"))
    withMed.join(broadcast(mad), keys)
      .groupBy(kcols: _*)
      .agg(count(lit(1)).as("n_rows"),
        first(col("_med")).as("median"),
        first(col("_mad")).as("mad"),
        sum(when(abs(col(valueCol) - col("_med")) >
          lit(c) * col("_mad"), 1L).otherwise(0L)).as("n_outliers"))
  }

  /** Bottom-k-by-hash uniform row sample aggregate (the
    * [[graft.functions.BottomKXX]] kernel): keep the k `(hash, value)`
    * pairs with the smallest hash per group — a deterministic,
    * MERGEABLE, bounded-state sample from which any distributional
    * summary derives. Unlike [[groupPercentilesApprox]]'s t-digest,
    * the sample is a pure function of group contents (partition- and
    * merge-order-independent), so it persists as a reusable artifact
    * (the KMV discipline) and replays exactly in an external engine —
    * sketch-tier quantiles that still hash-gate.
    *
    * `hash` must be deterministic per ROW (e.g.
    * [[graft.text.TextOps.hash32]] of the row key), not per value —
    * equal values with different keys are distinct sample candidates.
    */
  def bottomKSample(hash: Column, value: Column, k: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.BottomKXX(
      ColumnBridge.expression(hash),
      ColumnBridge.expression(value.cast("double")), k))
  }

  /** Order-statistic estimate from a [[bottomKSample]] sketch: the
    * sample value at 1-based rank `floor(q·(m−1)) + 1` of the
    * value-sorted sample (nearest-lower-rank, no interpolation — the
    * sampled value is carried VERBATIM, which is what lets an external
    * engine replay the estimate bit-for-bit). An EMPTY sample (a group
    * whose hash or value inputs were all null) yields NULL, not an
    * element_at(, 0) error.
    *
    * ERROR BOUND (the sample-quantile CLT): with group size n ≫ k the
    * estimate is the true (q ± ε)-quantile where ε has standard error
    * `sqrt(q(1−q)/k)` in RANK units — k = 256 gives ±0.031 rank error
    * (one σ) at the median, so the reported p50 is really somewhere in
    * p47–p53, tighter at the tails (±0.019 at q = 0.9). Pick
    * `k ≥ q(1−q)/ε²` for a target one-σ rank error ε: 1 rank point at
    * the median needs k = 2500, 0.5 points k = 10000. The error is in
    * rank space, not value space — a heavy-tailed gap distribution can
    * translate a small rank error into a large value error at extreme
    * quantiles. Pinned by the two-k property in SamplingPropertySpec.
    */
  def sampleQuantile(sketch: Column, q: Double): Column = {
    require(q >= 0 && q <= 1, s"quantile must be in [0,1], got $q")
    sortedSampleQuantile(
      array_sort(transform(sketch, x => x.getField("v"))), q)
  }

  /** [[sampleQuantile]] over an already-sorted sample array (so one
    * sort serves several quantiles/derived statistics).
    */
  private def sortedSampleQuantile(vs: Column, q: Double): Column =
    when(size(vs) === 0, lit(null).cast("double"))
      .otherwise(element_at(vs,
        (floor(lit(q) * (size(vs) - 1).cast("double")) + 1).cast("int")))

  /** Sketch-tier flavor of [[robustOutliers]]: ONE aggregation pass
    * with bounded per-group state, where the exact flavor scans the
    * data three times with distinct-value-bounded percentile buffers.
    * A [[bottomKSample]] sketch (k smallest-hash (hash, value) pairs)
    * stands in for the group's distribution: median and MAD are rank
    * statistics OF THE SAMPLE (sampled values carried verbatim, both
    * snapped to 6 decimals exactly like the exact flavor), and the
    * outlier count estimate scales the sample's outlier share to the
    * group size with pure integer arithmetic —
    * `(n_rows · n_sample_outliers) div m` — so every output cell
    * replays bit-exact in an external engine. Error is the usual
    * O(1/√k) sample-quantile band; k = 256 gives ~±6 percentile
    * points, plenty for a traffic screen (the exact flavor stays the
    * oracle-tier report).
    *
    * `hash` must be a deterministic per-ROW hash (the q104 discipline:
    * [[graft.text.TextOps.hash32]] of the row key, NOT of the value),
    * so the kept sample is a partition-order-free pure function of
    * group contents.
    */
  def robustOutliersApprox(
      df: DataFrame, keys: Seq[String], valueCol: String, hash: Column,
      k: Int = 256, c: Double = 3.0): DataFrame = {
    require(c > 0, s"c must be positive, got $c")
    val kcols = keys.map(col)
    df.groupBy(kcols: _*)
      .agg(count(lit(1)).as("n_rows"),
        bottomKSample(hash, col(valueCol), k).as("_sk"))
      .withColumn("_vs", array_sort(transform(col("_sk"),
        p => p.getField("v"))))
      .withColumn("m", size(col("_vs")))
      .withColumn("_med", round(sortedSampleQuantile(col("_vs"), 0.5), 6))
      .withColumn("_mad", round(sortedSampleQuantile(
        array_sort(transform(col("_vs"),
          x => abs(x - col("_med")))), 0.5), 6))
      .withColumn("_so", size(filter(col("_vs"),
        x => abs(x - col("_med")) > lit(c) * col("_mad"))))
      .withColumn("n_outliers_est",
        when(col("m") === 0, lit(null).cast("bigint")) // ANSI div-by-0
          .otherwise(
            expr("(n_rows * cast(_so AS BIGINT)) div cast(m AS BIGINT)")))
      .select(kcols ++ Seq(col("n_rows"), col("m"),
        col("_med").as("median_est"), col("_mad").as("mad_est"),
        col("n_outliers_est")): _*)
  }

  /** Per-key DISTRIBUTION drift between two corpus snapshots: the
    * Kolmogorov–Smirnov statistic `max_x |F_old(x) − F_new(x)|`
    * estimated from two [[bottomKSample]] sketches — the numeric-stat
    * tier of the drift family ([[corpusDiff]] = row tier,
    * [[graft.text.Dsir.groupDivergence]] = token tier,
    * [[graft.sim.SimSearch.groupEmbeddingDrift]] = embedding tier).
    * "Did this source's document-length / score / price distribution
    * MOVE between crawls" — the screen that catches a scraper change
    * or an upstream filter drift before training sees it. KS ≈ 0 =
    * stable; the usual acceptance bar is `c·sqrt((m₁+m₂)/(m₁·m₂))`.
    *
    * Cross-engine exactness: both sketches sample by the md5 row-key
    * `hash` (q104 discipline — values carried VERBATIM), the empirical
    * CDFs are integer counts over the sampled values divided ONCE, and
    * the max over the ≤2k merged sample points is order-free — so the
    * whole report hash-gates. Estimation error is the usual O(1/√k)
    * band on each CDF.
    *
    * Scale shape: one bounded-state sketch aggregation per side, a
    * keys equi-join (full outer — a key present on one side only
    * reports the other side 0/NULL), and a per-row O(k²) array fold —
    * never a windowed rescan of either corpus. Output:
    * `(keys*, n_old, n_new, m_old, m_new, ks_est)`.
    */
  def distributionDrift(
      oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
      valueCol: String, hash: Column, k: Int = 256): DataFrame = {
    require(k > 0, s"sample size k must be positive, got $k")
    val kcols = keys.map(col)
    def side(df: DataFrame, nName: String, vsName: String): DataFrame =
      df.groupBy(kcols: _*)
        .agg(count(lit(1)).as(nName),
          bottomKSample(hash, col(valueCol), k).as("_sk"))
        .withColumn(vsName,
          array_sort(transform(col("_sk"), _.getField("v"))))
        .drop("_sk")
    val o = side(oldDf, "n_old", "_va")
    val n = side(newDf, "n_new", "_vb")
    val mA = size(col("_va"))
    val mB = size(col("_vb"))
    def cdfGap(x: Column): Column = abs(
      size(filter(col("_va"), v => v <= x)).cast("double") /
        col("m_old").cast("double") -
      size(filter(col("_vb"), v => v <= x)).cast("double") /
        col("m_new").cast("double"))
    o.join(n, keys, "full_outer")
      .withColumn("m_old", coalesce(mA, lit(0)))
      .withColumn("m_new", coalesce(mB, lit(0)))
      .withColumn("ks_est",
        when(col("m_old") > 0 && col("m_new") > 0,
          round(array_max(transform(
            concat(col("_va"), col("_vb")), cdfGap(_))), 6)))
      .select(kcols ++ Seq(
        coalesce(col("n_old"), lit(0L)).as("n_old"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        col("m_old"), col("m_new"), col("ks_est")): _*)
  }

  /** Range join: left point rows to right interval rows sharing `keys` —
    * the time-window join Spark lacks as a primitive. A naive theta-join
    * (`ts BETWEEN lo AND hi`) plans as a per-key nested loop; instead
    * both sides bucket into coarse bins of `binWidth` (the right side
    * explodes to every bin its interval overlaps), candidates form via
    * EQUI-join on (keys, bin), and the exact interval test filters. Each
    * left row lives in exactly one bin so no dedup is needed. Cost:
    * right-side fan-out = interval span / binWidth (pick binWidth near
    * the typical span); the only shuffle is the bucketed equi-join.
    *
    * `tsCol`/`loCol`/`hiCol` may be timestamps (bucketed on epoch
    * seconds) or any numeric.
    */
  def rangeJoin(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, loCol: String, hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val lb = left.withColumn("_bin",
      floor(col(tsCol).cast("long") / binWidth))
    val rb = right.withColumn("_bin", explode(sequence(
      floor(col(loCol).cast("long") / binWidth),
      floor(col(hiCol).cast("long") / binWidth))))
    lb.join(rb, keys :+ "_bin")
      .filter(col(tsCol) >= col(loCol) && col(tsCol) <= col(hiCol))
      .drop("_bin")
  }

  /** Interval-overlap join (two interval sets, e.g. sessions ×
    * campaign windows): both sides explode to fixed-width bins, pairs
    * meet on an EQUI (keys, bin) join, the overlap predicate filters,
    * and the "overlap starts in this bin" condition keeps each
    * overlapping pair EXACTLY once — no distinct pass, no theta nested
    * loop. Fan-out per row = interval span / binWidth; size binWidth
    * near the typical interval length.
    */
  def intervalOverlapJoin(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      loL: String, hiL: String, loR: String, hiR: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val lb = left.withColumn("_bin", explode(sequence(
      floor(col(loL).cast("long") / binWidth),
      floor(col(hiL).cast("long") / binWidth))))
    val rb = right.withColumn("_bin", explode(sequence(
      floor(col(loR).cast("long") / binWidth),
      floor(col(hiR).cast("long") / binWidth))))
    lb.join(rb, keys :+ "_bin")
      .filter(col(loL) <= col(hiR) && col(loR) <= col(hiL))
      .filter(col("_bin") === floor(
        greatest(col(loL), col(loR)).cast("long") / binWidth))
      .drop("_bin")
  }

  /** Winsorized group statistics: values clipped at the exact
    * [pLo, pHi] group percentiles (rounded to 6 like q36, so the clip
    * thresholds replay), then micro-snapped to integers BEFORE
    * summing — the sum is order-free exact arithmetic and the
    * winsorized mean is two fixed divisions, so the whole robust-stats
    * report hash-gates (q148). The percentile pass and the clip pass
    * are two scans; the group-threshold table joining back is
    * group-cardinality-sized (broadcastable).
    */
  def winsorizedStats(
      df: DataFrame, keys: Seq[String], valueCol: String,
      pLo: Double, pHi: Double): DataFrame = {
    require(pLo < pHi, "pLo must be < pHi")
    val qs = groupPercentiles(df, keys, valueCol,
      Seq("lo" -> pLo, "hi" -> pHi))
    val v = col(valueCol)
    val clip = when(v < col("lo"), col("lo"))
      .when(v > col("hi"), col("hi")).otherwise(v)
    df.join(broadcast(qs), keys)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(when(v < col("lo"), 1L).otherwise(0L)).as("n_clipped_lo"),
        sum(when(v > col("hi"), 1L).otherwise(0L)).as("n_clipped_hi"),
        sum(round(clip * lit(1e6)).cast("long")).as("win_sum_micro"))
      .select(keys.map(col) ++ Seq(col("n"), col("n_clipped_lo"),
        col("n_clipped_hi"), col("win_sum_micro"),
        round(col("win_sum_micro").cast("double") /
          col("n").cast("double") / lit(1e6), 6).as("win_mean")): _*)
  }

  /** Per-group Pearson correlation + least-squares line (the
    * `corr`/`regr_slope`/`regr_intercept` family) computed the
    * REPLAYABLE way: callers pass INTEGER-valued x/y columns (snap
    * floats with `round(v*1000).cast("long")` — the milli/micro
    * discipline), the five moment sums fold as exact order-free
    * integer aggregates, and the statistics are one fixed IEEE chain
    * over those sums — so unlike the built-in `corr` (whose internal
    * float accumulation order is partition-dependent), the report
    * hash-gates bit-exactly (q158). Precondition: every moment sum
    * must stay below 2^53 (exact in a double) — n·max(y)² is the
    * binding term; pick the snap scale accordingly. Zero-variance
    * groups yield NULLs.
    */
  def linearFit(
      df: DataFrame, keys: Seq[String], x: Column, y: Column)
      : DataFrame = {
    val sums = df
      .select(keys.map(col) :+ x.as("_x") :+ y.as("_y"): _*)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col("_x")).as("sx"), sum(col("_y")).as("sy"),
        sum(col("_x") * col("_y")).as("sxy"),
        sum(col("_x") * col("_x")).as("sxx"),
        sum(col("_y") * col("_y")).as("syy"))
    val nd = col("n").cast("double")
    val sxd = col("sx").cast("double")
    val syd = col("sy").cast("double")
    val num = nd * col("sxy").cast("double") - sxd * syd
    val denx = nd * col("sxx").cast("double") - sxd * sxd
    val deny = nd * col("syy").cast("double") - syd * syd
    val nul = lit(null).cast("double")
    sums.select(keys.map(col) ++ Seq(col("n"),
      round(when(denx <= 0.0 || deny <= 0.0, nul)
        .otherwise(num / (sqrt(denx) * sqrt(deny))), 6).as("corr"),
      round(when(denx === 0.0, nul).otherwise(num / denx), 6)
        .as("slope"),
      round(when(denx === 0.0, nul)
        .otherwise((syd - (num / denx) * sxd) / nd), 6)
        .as("intercept")): _*)
  }

  /** Hill power-law tail-index estimate (Hill 1975) over a value
    * column — the standard "is this distribution Zipf, and how heavy"
    * diagnostic for token frequencies, document lengths, or link
    * degrees: `α̂ = k / Σ_{i=1..k} ln(x_(i) / x_(k+1))` over the k
    * largest values. A corpus whose token α̂ drifts far from ~1 is
    * mis-tokenized or spam-heavy; a degree α̂ near 1 means whale hubs
    * that need salting.
    *
    * Shape: the top-(k+1) set is per-partition heaps (TakeOrdered
    * with a total tie-break ordering — never a global sort), then one
    * fold over those k+1 rows. Each ln snaps to integer micro-nats
    * independently, so the sum is order-free BIGINT arithmetic and
    * the only float is the final `k·10⁶ / Σ` division — the whole
    * estimate replays in SQL (q169).
    *
    * Returns one row `(k, x_kp1, sum_ln_unat, alpha_hill)`; NULL α̂
    * when the tail is degenerate (all k+1 values equal).
    */
  def hillTailIndex(
      df: DataFrame, value: Column, tieBreak: Column,
      k: Int = 100): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val top = df.select(value.as("_v"), tieBreak.as("_t"))
      .orderBy(col("_v").desc, col("_t")).limit(k + 1)
    top.agg(count(lit(1)).as("_m"), min(col("_v")).as("x_kp1"),
        sum(round(log(col("_v")) * lit(1e6)).cast("long")).as("_s"))
      .select((col("_m") - 1).as("k"), col("x_kp1"),
        (col("_s") - col("_m") *
          round(log(col("x_kp1")) * lit(1e6)).cast("long"))
          .as("sum_ln_unat"))
      .select(col("k"), col("x_kp1"), col("sum_ln_unat"),
        round(when(col("sum_ln_unat") <= 0, lit(null).cast("double"))
          .otherwise(col("k") * lit(1000000.0) / col("sum_ln_unat")),
          6).as("alpha_hill"))
  }

  /** Population stability index between two snapshots of a value
    * column, per key group — the credit-risk-world drift score
    * (`PSI = Σ_i (p_i − q_i)·ln(p_i/q_i)` over value bins; < 0.1
    * stable, > 0.25 investigate) that complements
    * [[distributionDrift]]'s KS statistic with a BINNED, contribution-
    * per-bin view. Bins are `floor(value / binWidth)`; both sides get
    * +1 Laplace smoothing over the UNION of observed bins so empty
    * bins still contribute.
    *
    * Integer-exact by the KL discipline ([[graft.text.Dsir]]): with
    * `p = (a+1)/(A+B)`, `q = (b+1)/(N+B)`, each bin's term scales to
    * `[(a+1)(N+B) − (b+1)(A+B)] · round(ln(num/den)·10⁶)` — BIGINTs
    * whose sum is order-free — and the final PSI is one fixed
    * division chain. (Products sit near `count² · bins`; past ~10⁹
    * rows per group pre-aggregate or scale counts first.)
    *
    * Scale shape: two snapshot scans collapse to (key, bin) count
    * tables; everything after is bin-grid-sized equi-joins. Returns
    * `(keys…, n_old, n_new, n_bins, psi_num_micro, psi)`.
    */
  def psiDrift(
      old: DataFrame, nu: DataFrame, keys: Seq[String], value: Column,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val kc = keys.map(col)
    def binned(df: DataFrame, as: String): DataFrame = df
      .select(kc :+ floor(value / lit(binWidth)).as("_bin"): _*)
      .groupBy(kc :+ col("_bin"): _*)
      .agg(count(lit(1)).as(as))
    val ob = binned(old, "_a").localCheckpoint()
    val nb = binned(nu, "_b").localCheckpoint()
    val bins = ob.select(kc :+ col("_bin"): _*)
      .union(nb.select(kc :+ col("_bin"): _*)).distinct()
    val tot = bins.groupBy(kc: _*).agg(count(lit(1)).as("n_bins"))
      .join(ob.groupBy(kc: _*).agg(sum(col("_a")).as("n_old")), keys)
      .join(nb.groupBy(kc: _*).agg(sum(col("_b")).as("n_new")), keys)
    val grid = bins
      .join(ob, keys :+ "_bin", "left").na.fill(0L, Seq("_a"))
      .join(nb, keys :+ "_bin", "left").na.fill(0L, Seq("_b"))
      .join(tot, keys)
    val num = (col("_a") + 1L) * (col("n_new") + col("n_bins"))
    val den = (col("_b") + 1L) * (col("n_old") + col("n_bins"))
    grid
      .select(kc ++ Seq(col("n_old"), col("n_new"), col("n_bins"),
        ((num - den) *
          round((log(num.cast("double")) - log(den.cast("double"))) *
            lit(1000000.0)).cast("long")).as("_t")): _*)
      .groupBy(kc ++ Seq(col("n_old"), col("n_new"), col("n_bins")): _*)
      .agg(sum(col("_t")).as("psi_num_micro"))
      .select(kc ++ Seq(col("n_old"), col("n_new"), col("n_bins"),
        col("psi_num_micro"),
        round(col("psi_num_micro").cast("double") /
          ((col("n_old") + col("n_bins")) *
            (col("n_new") + col("n_bins"))).cast("double") /
          lit(1000000.0), 6).as("psi")): _*)
  }

  /** Per-group z-score standardization of an integer value column —
    * the feature-engineering primitive behind every "how unusual is
    * this row for its group" screen. The [[linearFit]]/burstiness
    * discipline makes it hash-gateable: with exact BIGINT `Σv`/`Σv²`,
    * `z = (v·n − Σv) / sqrt(n·Σv² − (Σv)²)` (the 1/√n factors
    * cancel), so each row is one integer numerator, one
    * sqrt-of-integer and one division. Degenerate groups (zero
    * variance) yield NULL. Top-k by |z| via per-partition heaps.
    *
    * Operand bound: `n·Σv²` must stay under 2⁶³ — pre-scale the value
    * for groups past ~10⁹ rows of large magnitudes.
    *
    * Returns the `topK` most anomalous rows
    * `(id, keys…, v, n, z)` (ties: id).
    */
  def groupZScores(
      df: DataFrame, keys: Seq[String], value: Column, idCol: String,
      topK: Int = 50): DataFrame = {
    val kc = keys.map(col)
    val base = df.select(
      (col(idCol) +: kc :+ value.cast("long").as("_v")): _*)
    val sums = base.groupBy(kc: _*)
      .agg(count(lit(1)).as("n"), sum(col("_v")).as("_s1"),
        sum(col("_v") * col("_v")).as("_s2"))
    val den = sqrt((col("n") * col("_s2") - col("_s1") * col("_s1"))
      .cast("double"))
    base.join(sums, keys)
      .select((col(idCol) +: kc) ++ Seq(col("_v").as("v"), col("n"),
        round(when(col("n") * col("_s2") === col("_s1") * col("_s1"),
            lit(null).cast("double"))
          .otherwise((col("_v") * col("n") - col("_s1")).cast("double")
            / den), 6).as("z")): _*)
      .filter(col("z").isNotNull)
      .orderBy(abs(col("z")).desc, col(idCol))
      .limit(topK)
  }

  /** Skew-safe equi-join for a big, key-skewed fact side against a small
    * dimension side: the big side gets a uniform salt (partition-id mod
    * `saltFactor` — any spread works, determinism not required for a
    * join), the small side is exploded `saltFactor`× so every salted key
    * still matches. Whale keys now spread over `saltFactor` reducers
    * instead of melting one. Result is row-identical to the plain join.
    *
    * (Spark's AQE skew-join handles sort-merge skew automatically; this
    * is for deliberate pre-salting when AQE's post-hoc splitting is not
    * enough — e.g. a single pathological key at 100 TB.)
    */
  def saltedJoin(
      big: DataFrame, small: DataFrame, on: Seq[String],
      saltFactor: Int = 16): DataFrame = {
    val salted = big.withColumn("_salt",
      pmod(spark_partition_id(), lit(saltFactor)))
    val exploded = small.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(exploded, on :+ "_salt").drop("_salt")
  }

  /** Write a table bucketed + sorted on its join key. Two tables bucketed
    * the same way merge with NO exchange and no sort (the physical plan
    * reads bucket n of both sides into the same task) — this is how the
    * J2 input/output merge and the feature-store side-car join become
    * shuffle-free at 100 TB: pay one bucketed write at ingest, join free
    * forever after.
    */
  def writeBucketed(
      df: DataFrame, table: String, keys: Seq[String], buckets: Int): Unit =
    df.write
      .format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .mode("overwrite")
      .saveAsTable(table)

  /** Join-size estimation from Count-Min sketches — the
    * optimizer-statistics primitive: |L ⋈ R on k| = Σ_v f_L(v)·f_R(v),
    * estimated as min over hash rows of the bucket-wise sketch inner
    * product (Cormode & Muthukrishnan 2005 §4.2). Each side folds to
    * ONE depth×width additive counter grid (map-side partials), the
    * estimate is a scalar from two broadcast 1-row sketches — the
    * answer costs two corpus scans and NO shuffle of keys, vs the
    * per-key shuffle the exact count needs. Overcount-only.
    *
    * Output (1 row): `n_left`, `n_right`, `est_pairs`, plus
    * `exact_pairs`/`n_keys_both` when `withExact` (gate/debug tier).
    */
  def cmsJoinCardinality(
      left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      depth: Int = 4, width: Int = 1024,
      withExact: Boolean = false): DataFrame = {
    def sk(df: DataFrame, key: Column, suffix: String) =
      df.agg(
        graft.text.TextOps.cmsSketch(array(key.cast("string")),
          depth, width).as("_sk" + suffix),
        count(lit(1)).as("n_" + suffix))
    val rowEst = (0 until depth).map { r =>
      aggregate(
        zip_with(
          slice(col("_skl"), r * width + 1, width),
          slice(col("_skr"), r * width + 1, width),
          (x, y) => x * y),
        lit(0L), (acc, x) => acc + x)
    }
    val base = sk(left, leftKey, "l")
      .crossJoin(broadcast(sk(right, rightKey, "r")))
      .select(col("n_l").as("n_left"), col("n_r").as("n_right"),
        least(rowEst: _*).as("est_pairs"))
    if (!withExact) base
    else {
      val lc = left.groupBy(leftKey.as("_k"))
        .agg(count(lit(1)).as("_nl"))
      val rc = right.groupBy(rightKey.as("_k"))
        .agg(count(lit(1)).as("_nr"))
      val ex = lc.join(rc, "_k")
        .agg(
          coalesce(sum(col("_nl") * col("_nr")), lit(0L))
            .as("exact_pairs"),
          count(lit(1)).as("n_keys_both"))
      base.crossJoin(broadcast(ex))
    }
  }

  /** Bloom-prefiltered fact-dim equi-join — the runtime-filter pattern:
    * the (small, already-filtered) dim side builds a broadcast Bloom
    * filter, the fact side probes it IN THE SCAN STAGE so non-matching
    * rows never reach the join, and the exact equi-join afterwards
    * removes the fpp-bounded false positives. Row-identical to the
    * plain join (Bloom filters have no false negatives); at 100 TB the
    * filter is the difference between shuffling the whole fact table
    * and shuffling the matchable slice.
    */
  def bloomPrefilteredJoin(
      fact: DataFrame, dim: DataFrame,
      factKey: Column, dimKey: Column,
      fpp: Double = 0.01): DataFrame = {
    val bloom = graft.functions.BloomXX.build(
      dim.select(dimKey.cast("string").as("_k")), "_k", fpp)
    fact
      .filter(graft.functions.BloomXX.mightContain(
        factKey.cast("string"), bloom))
      .join(broadcast(dim), factKey === dimKey)
  }

  /** nDCG@k ranking-quality eval over a scored, graded table. The
    * top-k comes from a HEAP (orderBy+limit = TakeOrdered, never a
    * global sort); positions come from one bounded k-struct sorted
    * fold + posexplode, not a global window. Gains are exact ints
    * (2^rel − 1), the position discount is the micro-nat ln idiom,
    * each DCG term one mirrored IEEE division then micro-int sums —
    * fully oracle-replayable.
    *
    * Output (k rows): `pos`, `id`, `score`, `rel`, `gain_term_micro`,
    * `dcg_micro`, `idcg_micro`, `ndcg_micro`.
    */
  def ndcgAtK(
      df: DataFrame, idCol: Column, scoreCol: Column, relCol: Column,
      k: Int, maxRel: Int = 3): DataFrame = {
    val gains = array((0 to maxRel).map(g => lit((1L << g) - 1)): _*)
    def gain(r: Column) = element_at(gains, r.cast("int") + 1)
    def lnMicro(x: Column) =
      round(log(x.cast("double")) * lit(1000000.0)).cast("long")
    def term(r: Column, pos: Column) =
      round(gain(r) * lit(1.0e12) / lnMicro(pos + 2)).cast("long")
    val top = df
      .select(idCol.as("_id"), scoreCol.as("_sc"), relCol.as("_rel"))
      .orderBy(col("_sc").desc, col("_id"))
      .limit(k)
    val idxN = sequence(lit(0), size(col("_arr")) - 1)
    val packed = top
      .agg(sort_array(collect_list(struct((-col("_sc")).as("a"),
        col("_id").as("d"), col("_rel").as("r")))).as("_arr"))
      .select(col("_arr"),
        aggregate(
          transform(idxN, i =>
            term(element_at(col("_arr"), i + 1).getField("r"), i)),
          lit(0L), (acc, x) => acc + x).as("dcg_micro"),
        sort_array(transform(col("_arr"), _.getField("r")),
          asc = false).as("_ideal"))
      .select(col("_arr"), col("dcg_micro"),
        aggregate(
          transform(idxN, i =>
            term(element_at(col("_ideal"), i + 1), i)),
          lit(0L), (acc, x) => acc + x).as("idcg_micro"))
    packed
      .select(posexplode(col("_arr")).as(Seq("_pos", "_st")),
        col("dcg_micro"), col("idcg_micro"))
      .select(col("_pos").cast("int").as("pos"),
        col("_st").getField("d").as("id"),
        (-col("_st").getField("a")).as("score"),
        col("_st").getField("r").as("rel"),
        term(col("_st").getField("r"), col("_pos"))
          .as("gain_term_micro"),
        col("dcg_micro"), col("idcg_micro"),
        when(col("idcg_micro") === 0, lit(0L)).otherwise(
          round(col("dcg_micro").cast("double") * lit(1000000.0) /
            col("idcg_micro").cast("double")).cast("long"))
          .as("ndcg_micro"))
  }

  /** Per-group Spearman rank correlation WITHOUT a global window.
    * Average-tie ranks are DOUBLED to stay integer (r2 = 2·cumLess +
    * cnt + 1) and come from per-group prefix sums over the
    * DISTINCT-VALUE table, so the corpus itself never enters a window
    * and the window that does run partitions by group over
    * ≤|distinct values| rows. Spearman is affine-invariant, so
    * Pearson on the doubled ranks equals Pearson on the ranks:
    * decimal(38,0) moment sums (overflow-safe to ~10⁹ rows/group),
    * one numerator, two sqrts, one division. Degenerate (constant)
    * variables yield NULL.
    */
  def spearmanByGroup(
      df: DataFrame, groupCol: String, a: Column, b: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(groupCol),
      a.cast("long").as("_sa"), b.cast("long").as("_sb"))
      .persist() // 3 consumers: two rank tables + the rank join
    def ranks(v: String): DataFrame = {
      val w = Window.partitionBy(groupCol).orderBy(v)
      base.groupBy(col(groupCol), col(v))
        .agg(count(lit(1)).as("_cnt"))
        .select(col(groupCol), col(v),
          (lit(2L) * (sum(col("_cnt")).over(w) - col("_cnt")) +
            col("_cnt") + lit(1L)).as(s"_r$v"))
    }
    val dec = "decimal(38,0)"
    val ranked = base
      .join(ranks("_sa"), Seq(groupCol, "_sa"))
      .join(ranks("_sb"), Seq(groupCol, "_sb"))
    val g = ranked.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n_rows"),
      count(lit(1)).cast(dec).as("_n"),
      sum(col("_r_sa").cast(dec)).as("_sx"),
      sum(col("_r_sb").cast(dec)).as("_sy"),
      sum(col("_r_sa").cast(dec) * col("_r_sb").cast(dec)).as("_sxy"),
      sum(col("_r_sa").cast(dec) * col("_r_sa").cast(dec)).as("_sxx"),
      sum(col("_r_sb").cast(dec) * col("_r_sb").cast(dec)).as("_syy"))
    val num = (col("_n") * col("_sxy") - col("_sx") * col("_sy"))
      .cast("double")
    val dx = (col("_n") * col("_sxx") - col("_sx") * col("_sx"))
      .cast("double")
    val dy = (col("_n") * col("_syy") - col("_sy") * col("_sy"))
      .cast("double")
    g.select(col(groupCol), col("n_rows"),
      when(dx === 0.0 || dy === 0.0, lit(null).cast("double"))
        .otherwise(round(num / (sqrt(dx) * sqrt(dy)), 6)).as("rho"))
  }

  /** Benford first-digit screen over an exact integer value column
    * (milli/centi units — the caller snaps floats ONCE): the leading
    * digit comes from the BIGINT rendered as a string, so there is no
    * float formatting and no log-floor edge case at powers of ten.
    * Expected shares are micro-snapped log10(1+1/d); non-positive
    * values are dropped (Benford is defined on magnitudes).
    */
  def benfordScreen(df: DataFrame, valueInt: Column): DataFrame = {
    val obs = df
      .select(valueInt.cast("long").as("_vm"))
      .filter(col("_vm") > 0)
      .select(substring(col("_vm").cast("string"), 1, 1).cast("int")
        .as("digit"))
      .groupBy(col("digit"))
      .agg(count(lit(1)).as("n_obs"))
      .persist() // 9-row histogram feeds the total AND the output
    val tot = obs.agg(sum(col("n_obs")).as("_n"))
    obs.crossJoin(broadcast(tot))
      .select(col("digit"), col("n_obs"),
        round(col("n_obs").cast("double") * lit(1000000.0) /
          col("_n").cast("double")).cast("long").as("obs_share_micro"),
        round(log10(lit(1.0) + lit(1.0) / col("digit").cast("double")) *
          lit(1000000.0)).cast("long").as("exp_share_micro"))
      .select(col("digit"), col("n_obs"), col("obs_share_micro"),
        col("exp_share_micro"),
        (col("obs_share_micro") - col("exp_share_micro"))
          .as("dev_micro"))
  }

  /** Chi-square independence test over two categorical columns: one
    * observed-count pass to the contingency cells, margins and N read
    * off the (tiny, persisted) cell table, expected counts from exact
    * BIGINT margin products with ONE division, and each (O−E)²/E term
    * micro-snapped so the statistic is an order-free integer sum the
    * caller can take over the returned cells.
    */
  def chiSquareIndependence(
      df: DataFrame, rowCol: String, colCol: String): DataFrame = {
    val obsCells = df.groupBy(col(rowCol), col(colCol))
      .agg(count(lit(1)).as("observed"))
      .persist() // r×c rows feed both margins, N and the output
    val rowTot = obsCells.groupBy(col(rowCol).as("_rv"))
      .agg(sum(col("observed")).as("_rt"))
    val colTot = obsCells.groupBy(col(colCol).as("_cv"))
      .agg(sum(col("observed")).as("_ct"))
    val n = obsCells.agg(sum(col("observed")).as("_n"))
    // zero-fill the full margin grid: groupBy only emits OBSERVED
    // combinations, but chi-square's structural zeros contribute
    // E, not 0, to the statistic (a perfect 2×2 association would
    // otherwise score half its real chi2)
    val cells = rowTot.crossJoin(broadcast(colTot))
      .join(obsCells,
        col("_rv") === col(rowCol) && col("_cv") === col(colCol), "left")
      .select(col("_rv"), col("_cv"), col("_rt"), col("_ct"),
        coalesce(col("observed"), lit(0L)).as("observed"))
    val e = (col("_rt") * col("_ct")).cast("double") /
      col("_n").cast("double")
    val d = col("observed").cast("double") - e
    cells
      .crossJoin(broadcast(n))
      .select(col("_rv").as(rowCol), col("_cv").as(colCol),
        col("observed"),
        round(e * lit(1000000.0)).cast("long").as("expected_micro"),
        round(d * d / e * lit(1000000.0)).cast("long").as("term_micro"))
  }

  /** Mean reciprocal rank over a (query, rank, relevance) frame: the
    * first relevant rank per query via min — no window — reciprocals
    * snapped to exact micros, and the corpus MRR as ONE division by
    * the total query count (unanswered queries count in the
    * denominator, the standard convention).
    */
  def mrrAtRank(
      df: DataFrame, qid: Column, rank0: Column, rel: Column): DataFrame = {
    val d = df.select(qid.as("_qid"), rank0.cast("long").as("_rank0"),
      rel.cast("int").as("_rel"))
      .persist() // feeds the first-hit table AND the query count
    val firstHit = d.filter(col("_rel") === 1)
      .groupBy(col("_qid"))
      .agg(min(col("_rank0") + 1).as("first_rank"))
    val n = d.select(col("_qid")).distinct()
      .agg(count(lit(1)).as("_n_queries"))
    firstHit
      .select(round(lit(1000000.0) / col("first_rank").cast("double"))
        .cast("long").as("_rr_micro"))
      .agg(sum(col("_rr_micro")).as("_sum_rr"),
        count(lit(1)).as("n_answered"))
      .crossJoin(broadcast(n))
      .select(col("n_answered"), col("_n_queries").as("n_queries"),
        round(col("_sum_rr").cast("double") /
          col("_n_queries").cast("double") / lit(1000000.0), 6)
          .as("mrr"))
  }

  /** SCD-type-2 history from an append-only changelog (Kimball's
    * slowly-changing-dimension build, the lakehouse MERGE-history
    * shape): consecutive rows per key collapse into versions wherever
    * the tracked attribute CHANGES, each version carrying its validity
    * interval. Order within a key is `(tsCol, tieCol)` — the tie
    * column makes equal-timestamp logs deterministic. Every window
    * here partitions by the key, so state per task is one key's
    * changelog, never the corpus; version rows then aggregate
    * one-per-(key, version) and the valid-to lookup joins version N to
    * N+1 — ids-only, bounded by the version count.
    *
    * Output: key, `attr` (the version's value), `valid_from` /
    * `valid_to` (epoch seconds; `valid_to` NULL for the current
    * version), `is_current`, `version` (0-based per key), `n_events`
    * (changelog rows in the version).
    */
  def scd2History(
      df: DataFrame, keyCol: String, tsCol: Column, tieCol: Column,
      attrCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("_tse"), col("_tie"))
    val flagged = df
      .select(col(keyCol), unix_timestamp(tsCol).as("_tse"),
        tieCol.as("_tie"), attrCol.as("attr"))
      .withColumn("_chg",
        when(lag(col("attr"), 1).over(w) <=> col("attr"), 0L)
          .otherwise(1L))
    // version id = prefix sum of change flags (first row flags 1 —
    // lag is NULL, never null-safe-equal to a real value)
    val versioned = flagged
      .withColumn("version",
        sum(col("_chg")).over(w.rowsBetween(
          Window.unboundedPreceding, Window.currentRow)) - 1L)
      .groupBy(col(keyCol), col("version"))
      .agg(min(col("_tse")).as("valid_from"),
        // attr is constant within a version by construction; min is
        // the deterministic way to read it off the group
        min(col("attr")).as("attr"),
        count(lit(1)).as("n_events"))
    val nxt = versioned.select(col(keyCol),
      (col("version") - 1L).as("version"),
      col("valid_from").as("valid_to"))
    versioned.join(nxt, Seq(keyCol, "version"), "left")
      .select(col(keyCol), col("attr"), col("valid_from"),
        col("valid_to"), col("valid_to").isNull.as("is_current"),
        col("version"), col("n_events"))
  }

  /** Snapshot diff between two keyed table versions — the audit a
    * lake emits per commit: row-level added/removed/changed/unchanged
    * counts plus per-column change counts among surviving rows. ONE
    * full outer join on the key is the only corpus-scale operation;
    * everything else folds that join to a single row of counters and
    * unpivots the (tiny) counter row into `(metric, n)` rows. Change
    * tests are null-safe (`<=>`), so NULL→value and value→NULL both
    * count as changes.
    */
  def snapshotDiff(
      oldDf: DataFrame, newDf: DataFrame, keyCols: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && compareCols.nonEmpty,
      "need key and compare columns")
    val o = oldDf.select(
      (keyCols.map(col) :+
        struct(compareCols.map(col): _*).as("_ov")): _*)
    val n = newDf.select(
      (keyCols.map(col) :+
        struct(compareCols.map(col): _*).as("_nv")): _*)
    val j = o.join(n, keyCols, "full_outer")
    val added = sum(when(col("_ov").isNull, 1L).otherwise(0L))
    val removed = sum(when(col("_nv").isNull, 1L).otherwise(0L))
    val both = col("_ov").isNotNull && col("_nv").isNotNull
    val changed = sum(when(both && !(col("_ov") <=> col("_nv")), 1L)
      .otherwise(0L))
    val unchanged = sum(when(both && (col("_ov") <=> col("_nv")), 1L)
      .otherwise(0L))
    val perCol = compareCols.map { c =>
      sum(when(both &&
        !(col("_ov").getField(c) <=> col("_nv").getField(c)), 1L)
        .otherwise(0L)).as(s"_c_$c")
    }
    val row = j.agg(added.as("_added"),
      (Seq(removed.as("_removed"), changed.as("_changed"),
        unchanged.as("_unchanged")) ++ perCol): _*)
    val metrics =
      Seq("added" -> "_added", "removed" -> "_removed",
        "changed" -> "_changed", "unchanged" -> "_unchanged") ++
        compareCols.map(c => s"changed:$c" -> s"_c_$c")
    row.select(explode(array(metrics.map { case (name, c) =>
      struct(lit(name).as("metric"), col(c).as("n"))
    }: _*)).as("_m")).select(col("_m.metric").as("metric"),
      col("_m.n").as("n"))
  }

  /** Per-group ROC-AUC WITHOUT a global window, via the Mann-Whitney
    * rank-sum identity AUC = (Σ rank⁺ − n⁺(n⁺+1)/2) / (n⁺·n⁻) with
    * average-tie ranks. Ranks are DOUBLED to stay integer (the
    * [[spearmanByGroup]] trick) and come from per-group prefix sums
    * over the DISTINCT-SCORE table — the corpus contributes one
    * `(group, score)` groupBy carrying the positive count per score,
    * so Σ rank⁺ needs NO join back to rows:
    * 2·Σ rank⁺ = Σ_s n⁺(s)·r2(s). The only window partitions by group
    * over ≤|distinct scores| rows; moments are BIGINT (overflow-safe
    * to ~3·10⁹ rows/group) and the statistic is one division, so it
    * hash-gates. Degenerate groups (no positives or no negatives)
    * yield NULL.
    */
  def rocAucByGroup(
      df: DataFrame, groupCol: String, scoreCol: Column,
      labelCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perScore = df
      .select(col(groupCol), scoreCol.cast("long").as("_s"),
        labelCol.cast("long").as("_y"))
      .groupBy(col(groupCol), col("_s"))
      .agg(count(lit(1)).as("_cnt"), sum(col("_y")).as("_np"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("_s"))
    val ranked = perScore.withColumn("_r2",
      lit(2L) * (sum(col("_cnt")).over(w) - col("_cnt")) +
        col("_cnt") + lit(1L))
    val g = ranked.groupBy(col(groupCol)).agg(
      sum(col("_cnt")).as("n_rows"),
      sum(col("_np")).as("n_pos"),
      sum(col("_np") * col("_r2")).as("_sum_r2_pos"))
    val nPos = col("n_pos")
    val nNeg = col("n_rows") - col("n_pos")
    g.select(col(groupCol), col("n_rows"), nPos.as("n_pos"),
      nNeg.as("n_neg"),
      when(nPos === 0L || nNeg === 0L, lit(null).cast("double"))
        .otherwise(round(
          (col("_sum_r2_pos") - nPos * (nPos + 1L)).cast("double") /
            (lit(2L) * nPos * nNeg).cast("double"), 6)).as("auc"))
  }

  /** Cohen's kappa between two categorical raters — the
    * inter-annotator-agreement number a labeling pipeline reports
    * beside its confusion matrix: κ = (p_o − p_e)/(1 − p_e) with
    * p_o the diagonal share and p_e the chance agreement from the
    * marginal products. ONE contingency pass over the frame; the
    * persisted cell table (≤ |A|·|B| rows) feeds diagonal, margins
    * and N, and the joint-marginal product folds over the broadcast
    * margin tables. Shares are micro-snapped so κ is one division of
    * two exact integers, rounded once (NULL when p_e = 1 — a
    * single-category degenerate table has no chance-corrected
    * agreement).
    *
    * Output (1 row): `n_items`, `n_agree`, `po_micro`, `pe_micro`,
    * `kappa`.
    */
  def cohenKappa(df: DataFrame, raterA: Column, raterB: Column)
      : DataFrame = {
    val cells = df.select(raterA.as("_a"), raterB.as("_b"))
      .groupBy(col("_a"), col("_b"))
      .agg(count(lit(1)).as("_n"))
      .persist() // feeds diagonal, both margins and N
    val n = cells.agg(sum(col("_n")).as("n_items"),
      sum(when(col("_a") <=> col("_b"), col("_n")).otherwise(0L))
        .as("n_agree"))
    val ma = cells.groupBy(col("_a").as("_ca"))
      .agg(sum(col("_n")).as("_na"))
    val mb = cells.groupBy(col("_b").as("_cb"))
      .agg(sum(col("_n")).as("_nb"))
    val pe = ma.join(mb, col("_ca") <=> col("_cb"))
      .agg(sum(col("_na") * col("_nb")).as("_pe_num"))
    n.crossJoin(broadcast(pe))
      .select(col("n_items"), col("n_agree"),
        round(col("n_agree").cast("double") * lit(1000000.0) /
          col("n_items").cast("double")).cast("long").as("po_micro"),
        round(col("_pe_num").cast("double") * lit(1000000.0) /
          (col("n_items") * col("n_items")).cast("double")).cast("long")
          .as("pe_micro"))
      .select(col("n_items"), col("n_agree"), col("po_micro"),
        col("pe_micro"),
        when(col("pe_micro") === 1000000L, lit(null).cast("double"))
          .otherwise(round(
            (col("po_micro") - col("pe_micro")).cast("double") /
              (lit(1000000L) - col("pe_micro")).cast("double"), 6))
          .as("kappa"))
  }

  /** Krippendorff's alpha, nominal data (Krippendorff 1970; the 2004
    * "Content Analysis" formulation) — chance-corrected agreement over
    * ANY number of raters with missing ratings: the generalization
    * [[cohenKappa]]'s fixed two-rater contingency table cannot cover,
    * and the reliability statistic annotation pipelines with rotating
    * labeler pools actually need. Rater identity is irrelevant for
    * alpha — only each ITEM's rating multiset matters — so the input
    * is the long (item, value) table; items with fewer than 2 ratings
    * drop (they carry no agreement evidence).
    *
    * Exactness: per item the expected-disagreement contribution
    * `(m_u² − Σ_c m_uc²)/(m_u − 1)` micro-snaps ONCE (integer counts,
    * one division), so the corpus-wide sum is exact integer addition;
    * the coincidence marginals `n_c` and `n` are plain counts, and
    * `De = (n² − Σ n_c²)/(n(n−1))` is one fixed double chain. α
    * derives from the two snapped disagreements — hash-gateable end
    * to end. Single-value degenerate data (De = 0) yields NULL.
    *
    * Output (1 row): `n_items`, `n_ratings`, `do_micro`, `de_micro`,
    * `alpha_micro`.
    */
  def krippendorffAlpha(df: DataFrame, itemCol: Column,
      valueCol: Column): DataFrame = {
    val iv = df.select(itemCol.as("_i"), valueCol.as("_v"))
      .filter(col("_i").isNotNull && col("_v").isNotNull)
      .groupBy(col("_i"), col("_v")).agg(count(lit(1)).as("_c"))
      .persist() // feeds per-item stats AND the value marginals
    val perItem = iv.groupBy(col("_i"))
      .agg(sum(col("_c")).as("_m"),
        sum(col("_c") * col("_c")).as("_s2"))
      .filter(col("_m") >= 2L)
      .persist() // Do sum + the marginal semi-join
    val doSum = perItem.agg(
      count(lit(1)).as("n_items"),
      sum(col("_m")).as("n_ratings"),
      sum(round((col("_m") * col("_m") - col("_s2")).cast("double") *
        lit(1000000.0) / (col("_m") - 1L).cast("double")).cast("long"))
        .as("_dsum"))
    val marg = iv.join(perItem.select(col("_i")), Seq("_i"), "left_semi")
      .groupBy(col("_v")).agg(sum(col("_c")).as("_nc"))
      .agg(sum(col("_nc") * col("_nc")).as("_sc2"))
    doSum.crossJoin(broadcast(marg))
      .select(col("n_items"), col("n_ratings"),
        round(col("_dsum").cast("double") /
          col("n_ratings").cast("double")).cast("long").as("do_micro"),
        round((col("n_ratings").cast("double") *
          col("n_ratings").cast("double") - col("_sc2").cast("double")) /
          (col("n_ratings").cast("double") *
            (col("n_ratings") - 1L).cast("double")) * lit(1000000.0))
          .cast("long").as("de_micro"))
      .select(col("n_items"), col("n_ratings"), col("do_micro"),
        col("de_micro"),
        when(col("de_micro") === 0L, lit(null).cast("long"))
          .otherwise(round((lit(1.0) -
            col("do_micro").cast("double") /
              col("de_micro").cast("double")) * lit(1000000.0))
            .cast("long")).as("alpha_micro"))
  }

  /** Per-group chi-square goodness-of-fit against the pooled category
    * distribution, WITH exact p-values: observed category counts per
    * group vs `n_g · (global_c / N)` expected, χ² = Σ (o−e)²/e as one
    * fixed double chain over exact integer counts, and — for EVEN
    * degrees of freedom (#categories odd) — the closed-form survival
    * function `p = exp(−h)·Σ_{i<df/2} hⁱ/i!` with `h = χ²/2`, an
    * elementary chain both engines compute bit-identically (odd df
    * needs the error function, which is not engine-portable: p is
    * NULL there, the statistic still reports). The multiple-testing
    * feeder for [[bhFdr]].
    *
    * Output per group: `n`, `chi2_micro`, `df`, `p_micro`.
    */
  def chiSquareGofByGroup(df: DataFrame, groupCol: String,
      catCol: Column): DataFrame = {
    val cells = df.select(col(groupCol), catCol.as("_c"))
      .filter(col("_c").isNotNull)
      .groupBy(col(groupCol), col("_c"))
      .agg(count(lit(1)).as("_o"))
      .persist() // per-group totals + category marginals + the join
    val groups = cells.groupBy(col(groupCol)).agg(sum(col("_o")).as("_ng"))
    val cats = cells.groupBy(col("_c")).agg(sum(col("_o")).as("_nc"))
    val k = cats.agg(count(lit(1)).as("_k"), sum(col("_nc")).as("_n"))
    // every group scores against EVERY category (a zero observed cell
    // still contributes e to χ²)
    val grid = groups.crossJoin(broadcast(cats))
      .join(cells, Seq(groupCol, "_c"), "left")
      .crossJoin(broadcast(k))
      .select(col(groupCol), col("_ng"),
        coalesce(col("_o"), lit(0L)).as("_o"),
        (col("_ng").cast("double") * col("_nc").cast("double") /
          col("_n").cast("double")).as("_e"),
        col("_k"))
    // each cell's contribution micro-snaps BEFORE the sum — the
    // per-group total is exact integer addition, order-free (a raw
    // double sum would be partition-order noise in the last ulp)
    val chi = grid.groupBy(col(groupCol))
      .agg(min(col("_ng")).as("n"), min(col("_k")).as("_k"),
        sum(round((col("_o").cast("double") - col("_e")) *
          (col("_o").cast("double") - col("_e")) / col("_e") *
          lit(1000000.0)).cast("long")).as("chi2_micro"))
    // p from the snapped χ² (so the survival chain starts from the
    // gate-stable value); df/2 − 1 extra series terms, unrolled —
    // bounded by the category count, model metadata
    chi.select(col(groupCol), col("n"), col("chi2_micro"),
      (col("_k") - 1L).cast("int").as("df"),
      when(pmod(col("_k") - 1L, lit(2L)) =!= 0L,
        lit(null).cast("long"))
        .otherwise {
          val h = col("chi2_micro").cast("double") / lit(2000000.0)
          // Σ_{i<df/2} hⁱ/i!, 16 unrolled INDEPENDENT terms (covers
          // 33 categories): each term is pow(h, i)/i! with a literal
          // factorial — a recurrence (term·h/i) would embed the
          // accumulator twice per step and grow a 3ⁿ-node expression
          // tree that stalls Catalyst (observed: the analyzer spun
          // for minutes). Suppressed terms add an exact +0.0.
          val series = (lit(1.0) +: (1 until 16).map { i =>
            when(lit(i) < (col("_k") - 1L) / 2L,
              pow(h, i) / lit((1 to i).map(_.toDouble).product))
              .otherwise(lit(0.0))
          }).reduceLeft(_ + _)
          round(exp(-h) * series * lit(1000000.0)).cast("long")
        }.as("p_micro"))
  }

  /** Benjamini-Hochberg FDR control (Benjamini & Hochberg 1995): rank
    * the m hypotheses by p, find the LARGEST k with
    * `p_(k) ≤ k·α/m`, and declare ranks 1..k discoveries — the
    * multiple-testing correction an A/B or drift-screening pipeline
    * must run before acting on "significant" groups. The comparison
    * is exact integer cross-multiplication (`p_micro·m ≤ k·α_micro`),
    * so the discovery set hash-gates; the rank runs over the m-row
    * hypothesis table — bounded model metadata, never the corpus.
    *
    * Output: every input row + `rank` (1-based by (p, id)),
    * `discovered`.
    */
  def bhFdr(df: DataFrame, idCol: String, pMicro: Column,
      alphaMicro: Long): DataFrame = {
    require(alphaMicro > 0L && alphaMicro <= 1000000L,
      s"alphaMicro must be in (0, 1e6], got $alphaMicro")
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("_p"), col(idCol))
    val ranked = df.withColumn("_p", pMicro)
      .filter(col("_p").isNotNull)
      .withColumn("rank", row_number().over(w))
      .crossJoin(broadcast(
        df.filter(pMicro.isNotNull).agg(count(lit(1)).as("_m"))))
      .persist() // the k* scalar + the output both consume it
    val kStar = ranked
      .filter(col("_p") * col("_m") <= col("rank") * lit(alphaMicro))
      .agg(coalesce(max(col("rank")), lit(0)).as("_kstar"))
    ranked.crossJoin(broadcast(kStar))
      .select(df.columns.map(col) ++ Seq(col("rank"),
        (col("rank") <= col("_kstar")).as("discovered")): _*)
  }

  /** Benjamini-Yekutieli FDR control (2001) — [[bhFdr]] under
    * ARBITRARY dependence: the step-up threshold divides by the
    * harmonic factor `c(m) = Σ 1/i`, the price of not assuming the
    * p-values are independent/PRDS. Discoveries are always a subset
    * of BH's at the same α.
    *
    * Exactness: the harmonic factor folds from the ranked table
    * itself (each rank appears once, so `hm = Σ round(1e6/rank)` is
    * an order-free exact integer — no driver loop); the step-up
    * compare is fully cross-multiplied in decimals:
    * `p·m·hm ≤ rank·α·1e6`. Output: bhFdr's shape (`rank`,
    * `discovered`).
    */
  def byFdr(df: DataFrame, idCol: String, pMicro: Column,
      alphaMicro: Long): DataFrame = {
    require(alphaMicro > 0L && alphaMicro <= 1000000L,
      s"alphaMicro must be in (0, 1e6], got $alphaMicro")
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val w = Window.orderBy(col("_p"), col(idCol))
    val ranked = df.withColumn("_p", pMicro)
      .filter(col("_p").isNotNull)
      .withColumn("rank", row_number().over(w))
      .crossJoin(broadcast(
        df.filter(pMicro.isNotNull).agg(count(lit(1)).as("_m"))))
      .persist() // harmonic fold + k* + the output
    val hm = ranked.agg(sum(round(lit(1000000.0) /
      col("rank").cast("double")).cast("long")).as("_hm"))
    val kStar = ranked.crossJoin(broadcast(hm))
      .filter(col("_p").cast(dec) * col("_m") * col("_hm") <=
        col("rank").cast(dec) * lit(alphaMicro) * lit(1000000L))
      .agg(coalesce(max(col("rank")), lit(0)).as("_kstar"))
    ranked.crossJoin(broadcast(kStar))
      .select(df.columns.map(col) ++ Seq(col("rank"),
        (col("rank") <= col("_kstar")).as("discovered")): _*)
  }

  /** Holm–Bonferroni step-down adjustment (Holm 1979) — the
    * FAMILY-WISE error control beside [[byFdr]]/BH's
    * false-discovery-rate control: uniformly more powerful than plain
    * Bonferroni, valid under ARBITRARY dependence, and the right
    * gate when even one false discovery is unacceptable (release
    * blockers, safety screens) rather than a tolerable rate. Ranked
    * ascending, reject while `p_(i) ≤ α/(m−i+1)`; the first failure
    * stops everything after it (step-down).
    *
    * Exactness + scale (the [[byFdr]] discipline): the rank window
    * runs over the BOUNDED hypothesis table, never row data; the
    * compare is cross-multiplied exact integers
    * (`p_micro·(m−rank+1) ≤ α_micro·1e?` — both sides decimal, no
    * division). Output: the input columns + `rank` + `discovered`.
    */
  def holmAdjust(df: DataFrame, idCol: String, pMicro: Column,
      alphaMicro: Long): DataFrame = {
    require(alphaMicro > 0L && alphaMicro <= 1000000L,
      s"alphaMicro must be in (0, 1e6], got $alphaMicro")
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val w = Window.orderBy(col("_p"), col(idCol))
    val ranked = df.withColumn("_p", pMicro)
      .filter(col("_p").isNotNull)
      .withColumn("rank", row_number().over(w))
      .crossJoin(broadcast(
        df.filter(pMicro.isNotNull).agg(count(lit(1)).as("_m"))))
      .persist() // the failure probe + the output
    // the step-down cut: the SMALLEST rank whose Holm compare fails;
    // everything from there on is undiscovered regardless of p
    val kFail = ranked.agg(min(when(
      col("_p").cast(dec) * (col("_m") - col("rank") + 1L) >
        lit(alphaMicro).cast(dec), col("rank"))).as("_kfail"))
    ranked.crossJoin(broadcast(kFail))
      .select(df.columns.map(col) ++ Seq(col("rank"),
        (col("_kfail").isNull || col("rank") < col("_kfail"))
          .as("discovered")): _*)
  }

  /** 2×2 odds ratio + Woolf logit 95% CI (the case-control effect
    * size chi-square/Cramér's V don't give you: HOW MUCH more likely
    * is the outcome under exposure): `OR = (a·d)/(b·c)`,
    * `CI = exp(ln OR ± 1.96·√(1/a+1/b+1/c+1/d))`. One aggregation
    * pass, exact integer cells, two fixed chains; NULL OR/CI when any
    * cell is zero (report the cells, let the caller pick a
    * correction). Output (one row): `(a, b, c, d, or_micro, lo_micro,
    * hi_micro)` — a = exposed∧outcome, b = exposed∧¬outcome,
    * c = ¬exposed∧outcome, d = neither.
    */
  def oddsRatio(df: DataFrame, exposed: Column, outcome: Column)
      : DataFrame = {
    val m = df.agg(
      sum(when(exposed && outcome, 1L).otherwise(0L)).as("a"),
      sum(when(exposed && !outcome, 1L).otherwise(0L)).as("b"),
      sum(when(!exposed && outcome, 1L).otherwise(0L)).as("c"),
      sum(when(!exposed && !outcome, 1L).otherwise(0L)).as("d"))
    val anyZero = col("a") === 0L || col("b") === 0L ||
      col("c") === 0L || col("d") === 0L
    val orD = (col("a").cast("double") * col("d").cast("double")) /
      (col("b").cast("double") * col("c").cast("double"))
    val se = sqrt(lit(1.0) / col("a").cast("double") +
      lit(1.0) / col("b").cast("double") +
      lit(1.0) / col("c").cast("double") +
      lit(1.0) / col("d").cast("double"))
    def snap(c: Column) = round(c * lit(1000000.0)).cast("long")
    m.select(col("a"), col("b"), col("c"), col("d"),
      when(anyZero, lit(null).cast("long")).otherwise(snap(orD))
        .as("or_micro"),
      when(anyZero, lit(null).cast("long"))
        .otherwise(snap(exp(log(orD) - lit(1.959964) * se)))
        .as("lo_micro"),
      when(anyZero, lit(null).cast("long"))
        .otherwise(snap(exp(log(orD) + lit(1.959964) * se)))
        .as("hi_micro"))
  }

  /** Two-sample Poisson rate-ratio test (the event-RATE A/B readout —
    * [[twoProportionZ]] is per-user conversion, this is events per
    * unit exposure): with counts c₁/c₂ over exposures e₁/e₂,
    * `RR = (c₁/e₁)/(c₂/e₂)` and the standard log-linear z
    * `z = ln RR / √(1/c₁ + 1/c₂)`. Exact integer counts/exposures,
    * two fixed chains; NULL when a count or exposure is zero. Output
    * (one row): `(c_a, e_a, c_b, e_b, rr_micro, z_micro)`.
    */
  /** Kish effective sample size (Kish 1965 §8.2) — the health metric
    * of any WEIGHTED corpus (importance weights, temperature mixes,
    * DSIR, IPW): `n_eff = (Σw)²/Σw²`, the unweighted-sample size the
    * weighted one is statistically worth, with the design effect
    * `deff = n/n_eff` reading how much the weighting inflated
    * variance. A re-weighting that leaves n_eff ≪ n means a few
    * whale weights dominate every downstream estimate — the number
    * to check BEFORE trusting a weighted eval.
    *
    * Exactness: integer weights fold as exact decimal Σw/Σw² moments;
    * the two closing divisions are one fixed double chain. Output
    * (one row): `(n, sum_w, n_eff_micro, deff_micro)` — NULL when
    * Σw = 0.
    */
  def kishNeff(df: DataFrame, weightInt: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val m = df.agg(count(lit(1)).as("n"),
      sum(weightInt.cast("long")).as("sum_w"),
      sum(weightInt.cast(dec) * weightInt.cast(dec)).cast(dec)
        .as("_sw2"))
    val neff = (col("sum_w").cast(dec) * col("sum_w").cast(dec))
      .cast("double") / col("_sw2").cast("double")
    val deff = col("n").cast("double") / neff
    def snap(c: Column) = round(c * lit(1000000.0)).cast("long")
    m.select(col("n"), col("sum_w"),
      when(col("sum_w") <= 0L, lit(null).cast("long"))
        .otherwise(snap(neff)).as("n_eff_micro"),
      when(col("sum_w") <= 0L, lit(null).cast("long"))
        .otherwise(snap(deff)).as("deff_micro"))
  }

  /** Poisson dispersion (index-of-dispersion) test (Fisher 1950 §57;
    * Cameron & Trivedi's overdispersion screen) — the count-data QC
    * beside [[poissonRateTest]]'s rate comparison: under a Poisson
    * process, per-unit counts have variance ≈ mean, so
    * `D = s²/x̄ ≫ 1` says the counts are bursty/clumped (bot traffic,
    * scraping runs, duplicated feeds) and a Poisson model of them
    * will understate every error bar. `χ² = (n−1)·s²/x̄ =
    * (n·Σx² − (Σx)²)/Σx` is an exact integer ratio (decimal products,
    * one closing division); the normal verdict comes through the
    * Wilson–Hilferty cube-root transform
    * `z = ((χ²/ν)^⅓ − (1 − 2/9ν)) / √(2/9ν)`, one fixed chain.
    *
    * Scale shape: one aggregation pass over the per-unit counts
    * (exact Σx/Σx² integer moments). Output (one row):
    * `(n, sum_x, dispersion_micro, chi2_micro, z_micro)` — NULL
    * verdicts when n < 2 or Σx = 0.
    */
  def poissonDispersion(df: DataFrame, countCol: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val m = df.agg(count(lit(1)).as("n"),
      sum(countCol.cast("long")).as("sum_x"),
      sum(countCol.cast(dec) * countCol.cast(dec)).cast(dec)
        .as("_sx2"))
    val n = col("n").cast("double")
    val chi2 = (col("n").cast(dec) * col("_sx2") -
      col("sum_x").cast(dec) * col("sum_x").cast(dec)).cast("double") /
      col("sum_x").cast("double")
    val nu = n - lit(1.0)
    val disp = chi2 / nu
    val z = (pow(chi2 / nu, lit(1.0 / 3.0)) -
      (lit(1.0) - lit(2.0) / (lit(9.0) * nu))) /
      sqrt(lit(2.0) / (lit(9.0) * nu))
    val degenerate = col("n") < 2L || col("sum_x") <= 0L
    def snap(c: Column) = round(c * lit(1000000.0)).cast("long")
    m.select(col("n"), col("sum_x"),
      when(degenerate, lit(null).cast("long")).otherwise(snap(disp))
        .as("dispersion_micro"),
      when(degenerate, lit(null).cast("long")).otherwise(snap(chi2))
        .as("chi2_micro"),
      when(degenerate, lit(null).cast("long")).otherwise(snap(z))
        .as("z_micro"))
  }

  def poissonRateTest(df: DataFrame, isA: Column, countCol: Column,
      exposureCol: Column): DataFrame = {
    val m = df.agg(
      sum(when(isA, countCol).otherwise(0L)).as("c_a"),
      sum(when(isA, exposureCol).otherwise(0L)).as("e_a"),
      sum(when(!isA, countCol).otherwise(0L)).as("c_b"),
      sum(when(!isA, exposureCol).otherwise(0L)).as("e_b"))
    val degenerate = col("c_a") === 0L || col("c_b") === 0L ||
      col("e_a") === 0L || col("e_b") === 0L
    val rr = (col("c_a").cast("double") / col("e_a").cast("double")) /
      (col("c_b").cast("double") / col("e_b").cast("double"))
    val z = log(rr) / sqrt(lit(1.0) / col("c_a").cast("double") +
      lit(1.0) / col("c_b").cast("double"))
    m.select(col("c_a"), col("e_a"), col("c_b"), col("e_b"),
      when(degenerate, lit(null).cast("long"))
        .otherwise(round(rr * lit(1000000.0)).cast("long"))
        .as("rr_micro"),
      when(degenerate, lit(null).cast("long"))
        .otherwise(round(z * lit(1000000.0)).cast("long"))
        .as("z_micro"))
  }

  /** k-anonymity / l-diversity audit (Sweeney 2002; Machanavajjhala
    * et al. 2007) — the re-identification screen a dataset release
    * runs: group rows by their QUASI-IDENTIFIER combination; any
    * group smaller than k is linkable, and any group with fewer than
    * l distinct SENSITIVE values leaks the sensitive attribute even
    * at size ≥ k (the homogeneity attack).
    *
    * Scale shape: one groupBy to the equivalence-class table
    * (bounded by the quasi-identifier value space — snap/bucket
    * continuous columns first), one summary fold. Output (one row):
    * `(n_rows, n_groups, k, l, n_groups_under_k, n_rows_under_k,
    * min_group, n_groups_under_l)` — zeros everywhere mean the
    * release passes both screens at (k, l).
    */
  def kAnonymityAudit(df: DataFrame, quasiIds: Seq[Column],
      sensitive: Column, k: Long, l: Long): DataFrame = {
    require(k >= 1 && l >= 1, s"bad k=$k l=$l")
    val groups = df
      .select(quasiIds.zipWithIndex.map { case (q, i) =>
        q.as(s"_q$i") } :+ sensitive.as("_s"): _*)
      .groupBy((0 until quasiIds.size).map(i => col(s"_q$i")): _*)
      .agg(count(lit(1)).as("_n"),
        countDistinct(col("_s")).as("_ls"))
    groups.agg(
      sum(col("_n")).as("n_rows"),
      count(lit(1)).as("n_groups"),
      lit(k).as("k"), lit(l).as("l"),
      sum(when(col("_n") < k, 1L).otherwise(0L))
        .as("n_groups_under_k"),
      sum(when(col("_n") < k, col("_n")).otherwise(0L))
        .as("n_rows_under_k"),
      min(col("_n")).as("min_group"),
      sum(when(col("_ls") < l, 1L).otherwise(0L))
        .as("n_groups_under_l"))
  }

  /** Differentially-private count release with keyed-PRF noise
    * (Dwork, McSherry, Nissim & Smith 2006's Laplace mechanism; the
    * draws come from a keyed PRF over the group key — the standard
    * reproducible-DP deployment shape: the same release replays
    * bit-identically given the secret seed, and the ε-DP guarantee
    * holds against anyone who does not hold the seed). Per group:
    * `noisy_n = n + round(Lap(Δ/ε))` with sensitivity Δ = 1 (one row
    * changes one count by one — callers bounding per-user
    * contribution k should pass `epsilon/k`), the Laplace draw via
    * inverse-CDF of the md5-derived uniform
    * `u = int(md5(seed:group)[0:13]) / 2^52` (clamped one ulp off
    * {0,1} so ln never sees 0):
    * `x = −(1/ε)·sign(u−½)·ln(1−2|u−½|)`.
    *
    * A REAL release publishes ONLY the noisy column — the exact `n`
    * is carried here so audits/tests can read the injected noise;
    * drop it before sharing.
    *
    * Scale shape: one groupBy to the bounded group table, then pure
    * scan-stage md5/ln chains — no second shuffle. Output: group
    * columns + `(n, noisy_n)`.
    */
  def dpNoisyCounts(df: DataFrame, groupCols: Seq[Column],
      epsilon: Double, seed: String): DataFrame = {
    require(epsilon > 0.0, s"epsilon must be positive, got $epsilon")
    require(groupCols.nonEmpty, "need at least one group column")
    val named = groupCols.zipWithIndex.map { case (c, i) =>
      c.as(s"g$i") }
    val grouped = df.select(named: _*)
      .groupBy((0 until groupCols.size).map(i => col(s"g$i")): _*)
      .agg(count(lit(1)).as("n"))
    val keyStr = concat_ws(":", lit(seed) +:
      (0 until groupCols.size).map(i => col(s"g$i").cast("string")): _*)
    val hv = conv(substring(md5(keyStr), 1, 13), 16, 10).cast("long")
    val u0 = hv.cast("double") / lit(4503599627370496.0) // 2^52
    val ulp = 1.0 / 4503599627370496.0
    val u = least(greatest(u0, lit(ulp)), lit(1.0 - ulp))
    val t = u - lit(0.5)
    val noise = round(lit(-1.0 / epsilon) * signum(t) *
      log(lit(1.0) - lit(2.0) * abs(t))).cast("long")
    grouped.select(
      (0 until groupCols.size).map(i => col(s"g$i")) ++
        Seq(col("n"), (col("n") + noise).as("noisy_n")): _*)
  }

  /** Cochran–Mantel–Haenszel stratified 2×2 association (Mantel &
    * Haenszel 1959; Cochran 1954) — the categorical sibling of the
    * stratified log-rank: exposure-vs-outcome association adjusted
    * for a confounding stratum, with the MH common odds ratio and
    * its Robins–Breslow–Greenland 95% CI. Per stratum `(a, b, c, d)`
    * cells fold to exact integers; the hypergeometric moments
    * `E = (a+b)(a+c)/n`, `V = (a+b)(c+d)(a+c)(b+d)/(n²(n−1))` and
    * the RBG summands (`R = ad/n`, `S = bc/n`, `PR`, `PS+QR`, `QS`)
    * each micro-snap per stratum and SUM exactly, so
    * `χ² = (Σa − ΣE)²/ΣV`, `OR_MH = ΣR/ΣS`, and the CI are fixed
    * double chains on exact integers — oracle-replayable. Strata
    * with n < 2 carry no information (V undefined) and are skipped,
    * the standard convention.
    *
    * Scale shape: one groupBy to the bounded per-stratum cell table,
    * one summary fold — rows never reshuffle twice. Output (one
    * row): `(n_strata, n_rows, sum_a, e_micro, v_micro, chi2_micro,
    * or_micro, lo_micro, hi_micro)` — NULL χ² when ΣV = 0, NULL
    * OR/CI when ΣR or ΣS is 0.
    */
  def cmhTest(df: DataFrame, stratum: Column, exposed: Column,
      outcome: Column): DataFrame = {
    val cells = df.select(stratum.as("_s"), exposed.as("_e"),
      outcome.as("_o"))
      .groupBy(col("_s"))
      .agg(
        sum(when(col("_e") && col("_o"), 1L).otherwise(0L)).as("_a"),
        sum(when(col("_e") && !col("_o"), 1L).otherwise(0L)).as("_b"),
        sum(when(!col("_e") && col("_o"), 1L).otherwise(0L)).as("_c"),
        sum(when(!col("_e") && !col("_o"), 1L).otherwise(0L)).as("_d"))
      .withColumn("_n", col("_a") + col("_b") + col("_c") + col("_d"))
      .filter(col("_n") >= 2L)
    val (a, b, c, d) = (col("_a").cast("double"),
      col("_b").cast("double"), col("_c").cast("double"),
      col("_d").cast("double"))
    val n = col("_n").cast("double")
    def snap(x: Column) = round(x * lit(1000000.0)).cast("long")
    val m = cells.agg(
      count(lit(1)).as("n_strata"),
      sum(col("_n")).as("n_rows"),
      sum(col("_a")).as("sum_a"),
      sum(snap((a + b) * (a + c) / n)).as("e_micro"),
      sum(snap((a + b) * (c + d) * (a + c) * (b + d) /
        (n * n * (n - lit(1.0))))).as("v_micro"),
      sum(snap(a * d / n)).as("r_micro"),
      sum(snap(b * c / n)).as("s_micro"),
      sum(snap((a + d) * a * d / (n * n))).as("pr_micro"),
      sum(snap(((a + d) * b * c + (b + c) * a * d) / (n * n)))
        .as("psqr_micro"),
      sum(snap((b + c) * b * c / (n * n))).as("qs_micro"))
    val sumR = col("r_micro").cast("double") / lit(1000000.0)
    val sumS = col("s_micro").cast("double") / lit(1000000.0)
    val orMh = sumR / sumS
    // RBG variance of ln OR_MH off the exactly-summed micro terms
    val varLn =
      (col("pr_micro").cast("double") / lit(1000000.0)) /
        (lit(2.0) * sumR * sumR) +
      (col("psqr_micro").cast("double") / lit(1000000.0)) /
        (lit(2.0) * sumR * sumS) +
      (col("qs_micro").cast("double") / lit(1000000.0)) /
        (lit(2.0) * sumS * sumS)
    val chi2 = {
      val diff = (col("sum_a") * 1000000L - col("e_micro"))
        .cast("double") / lit(1000000.0)
      diff * diff / (col("v_micro").cast("double") / lit(1000000.0))
    }
    val orNull = col("r_micro") <= 0L || col("s_micro") <= 0L
    m.select(col("n_strata"), col("n_rows"), col("sum_a"),
      col("e_micro"), col("v_micro"),
      when(col("v_micro") <= 0L, lit(null).cast("long"))
        .otherwise(snap(chi2)).as("chi2_micro"),
      when(orNull, lit(null).cast("long"))
        .otherwise(snap(orMh)).as("or_micro"),
      when(orNull, lit(null).cast("long"))
        .otherwise(snap(exp(log(orMh) - lit(1.959964) * sqrt(varLn))))
        .as("lo_micro"),
      when(orNull, lit(null).cast("long"))
        .otherwise(snap(exp(log(orMh) + lit(1.959964) * sqrt(varLn))))
        .as("hi_micro"))
  }

  /** Mondrian k-anonymity generalizer (LeFevre, DeWitt & Ramakrishnan
    * 2006, "Mondrian Multidimensional K-Anonymity") — the FIXER for
    * [[kAnonymityAudit]]'s verdict: greedy top-down median-cut global
    * recoding over an integer quasi-identifier space until every
    * equivalence class would fall under k if cut again. Each round,
    * every open region attempts ONE cut — its widest-range dimension
    * (ties to the lowest dimension index), split at the LOWER MEDIAN
    * of that dimension's multiset within the region — and the cut is
    * kept only if both halves hold ≥ k rows; a region whose attempt
    * fails is final. Rounds are bounded by `maxDepth` (tree depth =
    * generalization depth), so the region count is ≤ 2^maxDepth and
    * ≤ n/k by the invariant.
    *
    * Determinism/exactness: dimensions are integer-snapped by the
    * caller (the q36 bounded-value-space discipline); medians come
    * off per-(region, dim) DISTINCT-VALUE cumulative tables (the
    * q294 construction, windows partitioned by bounded keys); region
    * ids are the cut-path strings ("r01..."), so the whole recoding
    * replays in a SQL oracle round for round.
    *
    * Scale shape per round: one slim (region, dim, value) aggregation
    * (bounded by regions × dims × value space), one broadcast of the
    * ≤ 2^round cut table back onto the rows — the corpus never
    * reshuffles; `maxDepth` rounds total, each localCheckpointed so
    * plans stay bounded (the logistic-GD loop discipline).
    *
    * Output: one row per final region — `region` (cut path), `n`
    * (class size, ≥ k whenever the INPUT has ≥ k rows), `depth`
    * (cuts applied), and per dimension the generalized interval
    * `q<i>_lo`, `q<i>_hi` — the release table a consumer publishes in
    * place of raw quasi-ids, re-auditable by construction.
    */
  def mondrianAnonymize(df: DataFrame, quasiIds: Seq[Column], k: Long,
      maxDepth: Int = 8): DataFrame = {
    require(quasiIds.nonEmpty, "need at least one quasi-id dimension")
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxDepth >= 0 && maxDepth <= 24,
      s"maxDepth must be in [0,24], got $maxDepth")
    import org.apache.spark.sql.expressions.Window
    val nd = quasiIds.size
    val qCols = (0 until nd).map(i => col(s"_q$i"))
    var cur = df.select(lit("r").as("_region") +:
      quasiIds.zipWithIndex.map { case (q, i) =>
        q.cast("long").as(s"_q$i") }: _*)
      .localCheckpoint()
    var round = 0
    while (round < maxDepth) {
      // (region, dim, value) distinct-value cumulative tables
      val long = cur.select(col("_region"),
        posexplode(array(qCols: _*)).as(Seq("_dim", "_v")))
      val cells = long.groupBy(col("_region"), col("_dim"), col("_v"))
        .agg(count(lit(1)).as("_c"))
      val wCum = Window.partitionBy(col("_region"), col("_dim"))
        .orderBy(col("_v"))
      val wAll = Window.partitionBy(col("_region"), col("_dim"))
      val cum = cells
        .withColumn("_cend", sum(col("_c")).over(wCum))
        .withColumn("_n", sum(col("_c")).over(wAll))
      // per (region, dim): bounds + lower-median cut + its left count
      val stats = cum.groupBy(col("_region"), col("_dim"))
        .agg(min(col("_v")).as("_lo"), max(col("_v")).as("_hi"),
          max(col("_n")).as("_n"),
          min(when(col("_cend") * 2L >= col("_n"), col("_v")))
            .as("_cut"))
      val withLeft = stats.as("s").join(
        cum.select(col("_region"), col("_dim"), col("_v"),
          col("_cend")).as("m"),
        col("s._region") === col("m._region") &&
          col("s._dim") === col("m._dim") &&
          col("s._cut") === col("m._v"))
        .select(col("s._region").as("_region"),
          col("s._dim").as("_dim"), col("s._lo").as("_lo"),
          col("s._hi").as("_hi"), col("s._n").as("_n"),
          col("s._cut").as("_cut"), col("m._cend").as("_nleft"))
      // the round's attempted cut per region: widest range, lowest dim
      val wPick = Window.partitionBy(col("_region"))
        .orderBy((col("_hi") - col("_lo")).desc, col("_dim"))
      val cuts = withLeft
        .withColumn("_rk", row_number().over(wPick))
        .filter(col("_rk") === 1)
        .filter(col("_hi") > col("_lo") &&
          col("_nleft") >= k && (col("_n") - col("_nleft")) >= k)
        .select(col("_region"), col("_dim").as("_cutdim"),
          col("_cut"))
      if (cuts.isEmpty) round = maxDepth // every region is final
      else {
        val side = (0 until nd).map(i =>
          when(col("_cutdim") === i,
            when(col(s"_q$i") <= col("_cut"), lit("0"))
              .otherwise(lit("1"))))
          .reduce((a, b) => coalesce(a, b))
        cur = cur.join(broadcast(cuts), Seq("_region"), "left")
          .select((when(col("_cutdim").isNull, col("_region"))
            .otherwise(concat(col("_region"), side)).as("_region")) +:
            qCols: _*)
          .localCheckpoint()
        round += 1
      }
    }
    cur.groupBy(col("_region").as("region"))
      .agg(count(lit(1)).as("n"),
        (0 until nd).flatMap(i => Seq(
          min(col(s"_q$i")).as(s"q${i}_lo"),
          max(col(s"_q$i")).as(s"q${i}_hi"))): _*)
      .withColumn("depth", (length(col("region")) - 1).cast("long"))
  }

  /** Morton / Z-order curve value (Morton 1966; the interleave behind
    * Delta's OPTIMIZE ZORDER and HBase/Accumulo shard keys): bit i of
    * x lands at position 2i, bit i of y at 2i+1, so points close in
    * (x, y) stay close in z — ONE clustering key that serves range
    * predicates on EITHER dimension with bounded read amplification,
    * where a lexicographic (x, y) sort serves only x.
    *
    * Pure integer bit arithmetic (shift/mask/or, unrolled per bit) —
    * codegen-friendly, deterministic, and replayable by any engine
    * with shifts. Inputs must be non-negative and fit in `bits` bits
    * (callers snap/bucket first — the q36 discipline).
    */
  def zOrderValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(x.cast("long"), i)
        .bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftrightunsigned(y.cast("long"), i)
          .bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Hilbert curve value (Hilbert 1891; the bit algorithm is the
    * classic xy2d walk popularized by Warren's "Hacker's Delight" —
    * the clustering key Delta/Iceberg offer beside Z-order): like
    * [[zOrderValue]] it serves range predicates on BOTH dimensions
    * from ONE sort key, but with strictly better locality — every
    * consecutive pair of curve positions is grid-adjacent (no Z-shape
    * jumps), so a contiguous file of curve values covers a more
    * compact (x, y) tile and min/max skipping prunes tighter.
    *
    * Per bit level (high to low): quadrant digit `(3·rx) XOR ry`
    * scales by s², then the frame rotates/reflects (`ry = 0` swaps
    * axes, `rx = 1` also reflects within the level) — unrolled as
    * `bits` chained column stages, each a fixed integer CASE chain,
    * so the whole transform replays in a SQL oracle level for level.
    * Inputs must be non-negative and fit in `bits` bits (callers
    * snap/bucket first — the q36 discipline).
    */
  def hilbertValue(x: Column, y: Column, bits: Int = 8): Column = {
    // each level's rotated (x, y) references the previous level's
    // pair ~5×, so the inline expression tree grows 5^bits — capped
    // at 8 (≈ 400k nodes is already generous); wider spaces use the
    // staged [[withHilbertValue]], whose per-level projections keep
    // growth linear
    require(bits >= 1 && bits <= 8,
      s"inline hilbertValue caps bits at 8 (tree grows 5^bits), " +
        s"got $bits — use withHilbertValue for wider spaces")
    var xc = x.cast("long")
    var yc = y.cast("long")
    var d: Column = lit(0L)
    var i = bits - 1
    while (i >= 0) {
      val s = 1L << i
      val rx = when(xc.bitwiseAND(lit(s)) > 0L, 1L).otherwise(0L)
      val ry = when(yc.bitwiseAND(lit(s)) > 0L, 1L).otherwise(0L)
      d = d + lit(s) * lit(s) * (rx * 3L).bitwiseXOR(ry)
      val nx = when(ry === 0L,
        when(rx === 1L, lit(s - 1L) - yc).otherwise(yc)).otherwise(xc)
      val ny = when(ry === 0L,
        when(rx === 1L, lit(s - 1L) - xc).otherwise(xc)).otherwise(yc)
      xc = nx
      yc = ny
      i -= 1
    }
    d
  }

  /** [[hilbertValue]] as staged per-level projections — `outCol` is
    * appended to `df`. The rotation state (x, y, rx, ry) materializes
    * as named columns each level, so plan size grows LINEARLY in
    * `bits` (CollapseProject keeps multi-referenced non-cheap
    * aliases staged); use this flavor for production bit widths.
    */
  def withHilbertValue(df: DataFrame, x: Column, y: Column,
      outCol: String, bits: Int = 16): DataFrame = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    var cur = df.withColumn("_hx", x.cast("long"))
      .withColumn("_hy", y.cast("long"))
      .withColumn("_hd", lit(0L))
    var i = bits - 1
    while (i >= 0) {
      val s = 1L << i
      cur = cur
        .withColumn("_hrx",
          when(col("_hx").bitwiseAND(lit(s)) > 0L, 1L).otherwise(0L))
        .withColumn("_hry",
          when(col("_hy").bitwiseAND(lit(s)) > 0L, 1L).otherwise(0L))
      cur = cur
        .withColumn("_hd", col("_hd") +
          lit(s) * lit(s) * (col("_hrx") * 3L).bitwiseXOR(col("_hry")))
        .withColumn("_hx2", when(col("_hry") === 0L,
          when(col("_hrx") === 1L, lit(s - 1L) - col("_hy"))
            .otherwise(col("_hy"))).otherwise(col("_hx")))
        .withColumn("_hy2", when(col("_hry") === 0L,
          when(col("_hrx") === 1L, lit(s - 1L) - col("_hx"))
            .otherwise(col("_hx"))).otherwise(col("_hy")))
        .withColumn("_hx", col("_hx2"))
        .withColumn("_hy", col("_hy2"))
      i -= 1
    }
    cur.withColumn(outCol, col("_hd"))
      .drop("_hx", "_hy", "_hd", "_hrx", "_hry", "_hx2", "_hy2")
  }

  /** N-dimensional Morton / Z-order value — [[zOrderValue]]
    * generalized to 3-4 quasi-key columns (a real lakehouse clusters
    * more than two): bit i of column j lands at output position
    * `i·n + j`, so points close in EVERY dimension stay close in z
    * and one clustering key serves range predicates on ANY of the
    * columns with bounded read amplification. Pure unrolled integer
    * shift/mask/or — codegen-friendly, oracle-replayable. Inputs
    * must be non-negative and fit in `bits` bits; `n·bits ≤ 63`.
    */
  def zOrderValueN(cols: Seq[Column], bits: Int = 16): Column = {
    val n = cols.size
    require(n >= 2, s"need at least 2 columns, got $n")
    require(bits >= 1 && n * bits <= 63,
      s"n*bits must fit a signed long: $n*$bits")
    (0 until bits).flatMap { i =>
      cols.zipWithIndex.map { case (c, j) =>
        shiftleft(shiftrightunsigned(c.cast("long"), i)
          .bitwiseAND(lit(1L)), i * n + j)
      }
    }.reduce(_ bitwiseOR _)
  }

  /** N-dimensional Hilbert curve value as staged per-step projections
    * — Skilling's transpose algorithm ("Programming the Hilbert
    * curve", AIP Conf. Proc. 707, 2004: `AxestoTranspose` followed by
    * bit interleave), the n-D generalization of [[withHilbertValue]]
    * and the tighter-locality sibling of [[zOrderValueN]] (every
    * consecutive pair of curve positions is grid-adjacent in n-space,
    * so a contiguous file of curve values covers a more compact
    * n-D tile and min/max skipping prunes tighter).
    *
    * Per level `Q = 2^(b-1) .. 2` the n coordinates pass through a
    * SEQUENTIAL invert-or-exchange against column 0, then a prefix
    * Gray pass and one fold — every step a fixed integer CASE/XOR
    * chain materialized as named columns, so plan size grows linearly
    * in `n·bits` and the whole transform replays in a SQL oracle step
    * for step. Inputs must be non-negative and fit in `bits` bits
    * (callers snap/bucket first — the q36 discipline); `n·bits ≤ 63`.
    */
  def withHilbertValueN(df: DataFrame, cols: Seq[Column],
      outCol: String, bits: Int = 16): DataFrame = {
    val n = cols.size
    require(n >= 2, s"need at least 2 columns, got $n")
    require(bits >= 1 && n * bits <= 63,
      s"n*bits must fit a signed long: $n*$bits")
    def t(i: Int) = s"_ht$i"
    var cur = cols.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
      d.withColumn(t(i), c.cast("long"))
    }
    // inverse undo: Q = 2^(b-1) .. 2, coordinates in order, each an
    // invert (X0 ^= Q-1 when Xi has bit Q) or exchange of the low
    // bits of (X0, Xi)
    var q = bits - 1
    while (q >= 1) {
      val Q = 1L << q
      val P = Q - 1L
      for (i <- 0 until n) {
        val hasQ = col(t(i)).bitwiseAND(lit(Q)) > 0L
        if (i == 0)
          cur = cur.withColumn(t(0),
            when(hasQ, col(t(0)).bitwiseXOR(lit(P)))
              .otherwise(col(t(0))))
        else {
          cur = cur.withColumn("_hx",
            when(hasQ, lit(0L)).otherwise(
              col(t(0)).bitwiseXOR(col(t(i))).bitwiseAND(lit(P))))
          cur = cur
            .withColumn(t(0),
              when(hasQ, col(t(0)).bitwiseXOR(lit(P)))
                .otherwise(col(t(0)).bitwiseXOR(col("_hx"))))
            .withColumn(t(i), col(t(i)).bitwiseXOR(col("_hx")))
        }
      }
      q -= 1
    }
    // Gray encode: prefix XOR (updated predecessor), then the
    // X[n-1]-driven correction folded over the levels
    for (i <- 1 until n)
      cur = cur.withColumn(t(i), col(t(i)).bitwiseXOR(col(t(i - 1))))
    val tFold = (bits - 1 to 1 by -1).map { qq =>
      val Q = 1L << qq
      when(col(t(n - 1)).bitwiseAND(lit(Q)) > 0L, lit(Q - 1L))
        .otherwise(lit(0L))
    }.reduceOption((a, b) => a.bitwiseXOR(b)).getOrElse(lit(0L))
    cur = cur.withColumn("_hx", tFold)
    for (i <- 0 until n)
      cur = cur.withColumn(t(i), col(t(i)).bitwiseXOR(col("_hx")))
    // interleave the transpose: bit q of X[i] → position q·n+(n-1-i)
    val h = (0 until bits).flatMap { qq =>
      (0 until n).map { i =>
        shiftleft(shiftrightunsigned(col(t(i)), qq)
          .bitwiseAND(lit(1L)), qq * n + (n - 1 - i))
      }
    }.reduce(_ bitwiseOR _)
    cur.withColumn(outCol, h)
      .drop("_hx" +: (0 until n).map(t): _*)
  }

  /** N-column Z-order layout: [[zOrderLayout]] over 3-4 quasi-key
    * columns — range partition + sort within partitions on
    * [[zOrderValueN]], paid once at write so every later selective
    * scan on ANY of the clustered columns prunes files.
    */
  def zOrderLayoutN(df: DataFrame, cols: Seq[Column],
      bits: Int = 16, partitions: Int = 0): DataFrame = {
    val withZ = df.withColumn("_z", zOrderValueN(cols, bits))
    val parts = if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    withZ.repartitionByRange(parts, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
  }

  /** N-column Hilbert layout: [[hilbertLayout]] with the Skilling
    * n-D key — each output file covers one compact curve segment
    * (= one compact n-D tile, tighter than the Z flavor's).
    */
  def hilbertLayoutN(df: DataFrame, cols: Seq[Column],
      bits: Int = 16, partitions: Int = 0): DataFrame = {
    val withH = withHilbertValueN(df, cols, "_h", bits)
    val parts = if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    withH.repartitionByRange(parts, col("_h"))
      .sortWithinPartitions(col("_h"))
      .drop("_h")
  }

  /** Hilbert layout: [[zOrderLayout]] with the Hilbert key — range
    * partition + sort within partitions on the curve value, so every
    * output file covers one compact curve segment (= one compact
    * (x, y) tile, tighter than the Z flavor's).
    */
  def hilbertLayout(df: DataFrame, x: Column, y: Column,
      bits: Int = 16, partitions: Int = 0): DataFrame = {
    val withH = withHilbertValue(df, x, y, "_h", bits)
    val parts = if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    withH.repartitionByRange(parts, col("_h"))
      .sortWithinPartitions(col("_h"))
      .drop("_h")
  }

  /** Z-order layout: repartition by RANGE of the Morton value and
    * sort within partitions — the write-side clustering pass that
    * makes min/max file skipping work on BOTH dimensions at once
    * (each output file covers a compact z-range ⇒ a compact (x, y)
    * tile). The shuffle is the price paid ONCE at write; every
    * later selective scan on either column prunes files instead of
    * reading the lake.
    */
  def zOrderLayout(df: DataFrame, x: Column, y: Column,
      bits: Int = 16, partitions: Int = 0): DataFrame = {
    val z = zOrderValue(x, y, bits).as("_z")
    val withZ = df.withColumn("_z", z)
    // resolved session conf, not the raw string — "auto" (AQE
    // coalesce setups) would make a raw .toInt throw
    val parts = if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    withZ.repartitionByRange(parts, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
  }

  /** Split-conformal interval calibration (Vovk's conformal
    * prediction; the split/inductive recipe of Papadopoulos et al.
    * 2002 as popularized by Lei et al. 2018): from a CALIBRATION
    * sample's nonconformity residuals, the conformal quantile
    * `q̂ = k-th smallest residual, k = ⌈(n+1)(1−α)⌉` guarantees
    * `P(residual ≤ q̂) ≥ 1−α` on exchangeable test points — the
    * distribution-free error bar a score/prediction pipeline ships
    * without trusting any model's own uncertainty. Reported with the
    * observed coverage on the held-out test rows.
    *
    * Exactness/scale: residuals arrive micro-snapped; `k` is exact
    * integer arithmetic (`⌈a·b/10⁶⌉` via integer division); `q̂` is
    * found by cumulative counts over the DISTINCT residual values
    * (the q36 discipline — state bounds by value-space, not rows;
    * the order window runs over that bounded table). When
    * `k > n_cal` the conformal interval is infinite (q̂ NULL,
    * coverage 1 by convention — the honest small-sample answer).
    *
    * Output (1 row): `n_cal`, `n_test`, `k`, `qhat_micro`,
    * `coverage`.
    */
  def conformalInterval(df: DataFrame, residMicro: Column,
      isCalib: Column, alphaMicro: Long): DataFrame = {
    require(alphaMicro > 0L && alphaMicro < 1000000L,
      s"alphaMicro must be in (0, 1e6), got $alphaMicro")
    import org.apache.spark.sql.expressions.Window
    val d = df.select(residMicro.as("_r"), isCalib.as("_c"))
      .filter(col("_r").isNotNull)
      .persist() // totals + calibration counts + test coverage
    val nn = d.agg(
      sum(when(col("_c"), 1L).otherwise(0L)).as("n_cal"),
      sum(when(!col("_c"), 1L).otherwise(0L)).as("n_test"))
      .select(col("n_cal"), col("n_test"),
        expr(s"((n_cal + 1) * ${1000000L - alphaMicro} + 999999) " +
          "div 1000000").as("k"))
      .localCheckpoint() // 1 row, three consumers
    val w = Window.orderBy(col("_r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val qhat = d.filter(col("_c"))
      .groupBy(col("_r")).agg(count(lit(1)).as("_n"))
      .withColumn("_cum", sum(col("_n")).over(w))
      .crossJoin(broadcast(nn.select(col("k"))))
      .filter(col("_cum") >= col("k"))
      .agg(min(col("_r")).as("qhat_micro"))
      .localCheckpoint() // 1 row: the model
    val covered = d.filter(!col("_c"))
      .crossJoin(broadcast(qhat))
      .agg(sum(when(col("qhat_micro").isNull ||
        col("_r") <= col("qhat_micro"), 1L).otherwise(0L))
        .as("_cov"))
    nn.crossJoin(broadcast(qhat)).crossJoin(broadcast(covered))
      .select(col("n_cal"), col("n_test"), col("k"),
        col("qhat_micro"),
        when(col("n_test") === 0L, lit(null).cast("double"))
          .otherwise(round(coalesce(col("_cov"), lit(0L)).cast("double") /
            col("n_test").cast("double"), 6)).as("coverage"))
  }

  /** Order-free dataset content fingerprint per group — the integrity
    * check two 100 TB snapshots can exchange WITHOUT sorting or
    * shipping rows: each row renders to a canonical string
    * (\u0001-separated columns, \u0000 null sentinel — `concat_ws`
    * alone SKIPS nulls and would collide null-vs-absent rows), hashes
    * to a 60-bit integer (md5 prefix, portable across engines), and
    * the group fingerprint is the XOR fold of the row hashes. XOR is
    * commutative/associative, so the fold is partition- and
    * order-independent — map-side partials merge exactly, and equal
    * fingerprints mean equal multisets-up-to-hash (duplicate PAIRS
    * cancel under XOR; pair with `n_rows` which any dup shifts).
    */
  def datasetFingerprint(df: DataFrame, groupCol: String,
      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to fingerprint")
    val rowStr = concat_ws("\u0001", cols.map(c =>
      coalesce(col(c).cast("string"), lit("\u0000"))): _*)
    df.select(col(groupCol),
      conv(substring(md5(rowStr), 1, 15), 16, 10).cast("long").as("_h"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(_h)").as("fingerprint"))
  }

  /** Welch's unequal-variance t-test between two variants of an
    * exact-integer measure (Welch 1947 — the default two-sample test
    * when group variances differ, which at A/B scale they always do):
    * ONE aggregation pass collects each variant's exact integer
    * moments (n, Σv, Σv²); means, sample variances, the t statistic
    * and the Welch-Satterthwaite degrees of freedom all derive from
    * those six integers in a fixed IEEE chain, micro-snapped — so the
    * report hash-gates. Degenerate inputs (a variant with n < 2, or
    * both variances zero) yield NULL t/df.
    *
    * Output (1 row): `n_a`, `n_b`, `mean_a_micro`, `mean_b_micro`,
    * `t_micro`, `df_micro`.
    */
  def welchTTest(df: DataFrame, variantA: Column, valueInt: Column)
      : DataFrame = {
    val d = df.select(variantA.as("_a"), valueInt.cast("long").as("_v"))
    // the v² moment runs in decimal(38,0): a cent-scaled value past
    // ~3e9 squares beyond 2⁶³ and a Long sum would wrap silently
    // (decimal overflows to NULL instead — wrong loudly, never wrong
    // quietly); the same guard as autocorrByGroup's x·x sums
    val vd = col("_v").cast("decimal(19,0)")
    def side(p: Column, name: String) = Seq(
      sum(when(p, 1L).otherwise(0L)).as(s"n_$name"),
      sum(when(p, col("_v")).otherwise(0L)).as(s"_s_$name"),
      sum(when(p, vd * vd).otherwise(lit(0).cast("decimal(38,0)")))
        .as(s"_q_$name"))
    val aggs = side(col("_a"), "a") ++ side(!col("_a"), "b")
    val m = d.agg(aggs.head, aggs.tail: _*)
    def mean(n: Column, s: Column) = s.cast("double") / n.cast("double")
    def variance(n: Column, s: Column, q: Column) =
      (n.cast("double") * q.cast("double") -
        s.cast("double") * s.cast("double")) /
        (n.cast("double") * (n - 1L).cast("double"))
    val (na, nb) = (col("n_a"), col("n_b"))
    val va = variance(na, col("_s_a"), col("_q_a"))
    val vb = variance(nb, col("_s_b"), col("_q_b"))
    val sa = va / na.cast("double")
    val sb = vb / nb.cast("double")
    val se2 = sa + sb
    val t = (mean(na, col("_s_a")) - mean(nb, col("_s_b"))) / sqrt(se2)
    val dfW = se2 * se2 /
      (sa * sa / (na - 1L).cast("double") +
        sb * sb / (nb - 1L).cast("double"))
    val degenerate = na < 2L || nb < 2L || se2 <= 0.0
    m.select(na.as("n_a"), nb.as("n_b"),
      round(mean(na, col("_s_a")) * lit(1000000.0)).cast("long")
        .as("mean_a_micro"),
      round(mean(nb, col("_s_b")) * lit(1000000.0)).cast("long")
        .as("mean_b_micro"),
      when(degenerate, lit(null).cast("long"))
        .otherwise(round(t * lit(1000000.0)).cast("long")).as("t_micro"),
      when(degenerate, lit(null).cast("long"))
        .otherwise(round(dfW * lit(1000000.0)).cast("long"))
        .as("df_micro"))
  }

  /** OHLC bars (candlesticks) over an exact-integer value column:
    * per time bucket, open/close are the values at the FIRST/LAST
    * `(epoch, tie)` position via struct min/max — no window, no
    * sort, one aggregation pass over the frame — plus high, low,
    * volume, turnover and the volume-weighted average (one exact
    * integer division, micro-snapped). The tie column makes
    * equal-timestamp rows deterministic, so the bars hash-gate.
    */
  def ohlcBars(
      df: DataFrame, tsCol: Column, tieCol: Column, valueInt: Column,
      bucketSec: Long = 86400L): DataFrame = {
    val tse = unix_timestamp(tsCol)
    df.select(
      floor(tse / lit(bucketSec)).cast("long").as("bucket"),
      tse.as("_tse"), tieCol.as("_tie"),
      valueInt.cast("long").as("_v"))
      .groupBy(col("bucket"))
      .agg(
        min(struct(col("_tse"), col("_tie"), col("_v")))
          .getField("_v").as("open"),
        max(col("_v")).as("high"),
        min(col("_v")).as("low"),
        max(struct(col("_tse"), col("_tie"), col("_v")))
          .getField("_v").as("close"),
        count(lit(1)).as("volume"),
        sum(col("_v")).as("turnover"))
      .select(col("bucket"), col("open"), col("high"), col("low"),
        col("close"), col("volume"), col("turnover"),
        round(col("turnover").cast("double") * lit(1000000.0) /
          col("volume").cast("double")).cast("long").as("vwap_micro"))
  }

  /** Poisson-bootstrap confidence interval for a mean (Chamandy,
    * Muralidharan, Najmi & Naidu, "Estimating Uncertainty for Massive
    * Data Streams", Google 2012) — THE bootstrap that works
    * distributed: classic resampling needs n draws with replacement
    * (a global operation), but each row's multiplicity in replicate b
    * is ≈ independent Poisson(1), so every row computes its own B
    * weights locally and the replicate means fold in ONE aggregation
    * pass with map-side partials. No resampled dataset ever
    * materializes; state per partition is B accumulators.
    *
    * Determinism discipline: the Poisson draw inverts the exact
    * cumulative ladder at a DISCRETE md5-uniform (`hash32(key:b)
    * mod 1e6`) — no RNG state, partition-order-free, so the whole CI
    * hash-gates and replays in DuckDB. Replicate means micro-snap;
    * the interval picks order statistics of the B means by the
    * [[sampleQuantile]] rank convention (floor(q·(B−1)) + 1). `keyCol`
    * must be a row identity (the robustOutliersApprox contract: hash
    * the key, not the value).
    *
    * Output (one row): `(n, b_replicates, mean_micro, lo_micro,
    * hi_micro)` — lo/hi at per-tail mass α/2 (a 1−α two-sided CI).
    */
  def poissonBootstrapCI(df: DataFrame, keyCol: Column,
      valueInt: Column, b: Int = 32,
      alphaMicro: Long = 100000L): DataFrame = {
    require(b >= 4, s"need at least 4 replicates, got $b")
    require(alphaMicro > 0 && alphaMicro < 500000L,
      s"alphaMicro must be in (0, 500000), got $alphaMicro")
    val base = df.select(keyCol.cast("string").as("_k"),
      valueInt.cast("long").as("_v"))
    // exact Poisson(1) CDF ladder in micro units: P(X <= k)·1e6
    val ladder = Seq(367879L, 735759L, 919699L, 981012L, 996340L,
      999406L, 999917L, 999990L, 999999L)
    val u = pmod(graft.text.TextOps.hash32(
      concat_ws(":", col("_k"), col("_b"))), lit(1000000L))
    val w = ladder.zipWithIndex.foldRight(lit(ladder.size): Column) {
      case ((thr, k), rest) => when(u < thr, lit(k)).otherwise(rest)
    }
    val reps = base
      .select(col("_k"), col("_v"),
        explode(sequence(lit(0), lit(b - 1))).as("_b"))
      .select(col("_v"), col("_b"), w.cast("long").as("_w"))
      .groupBy(col("_b"))
      .agg(sum(col("_w") * col("_v")).as("_swx"),
        sum(col("_w")).as("_sw"))
      // an all-zero-weight replicate (vanishing probability past a few
      // dozen rows) reports NULL and drops from the order statistics
      .select(col("_b"),
        round(col("_swx").cast("double") /
          when(col("_sw") > 0L, col("_sw").cast("double")) *
          lit(1000000.0)).cast("long").as("_m"))
      .filter(col("_m").isNotNull)
    // B bounded replicate means -> order statistics (sorted array);
    // per-tail mass alpha/2 at the sampleQuantile rank convention
    val ci = reps.agg(sort_array(collect_list(col("_m"))).as("_ms"))
      .select(
        element_at(col("_ms"), (floor(
          lit(alphaMicro.toDouble / 2e6) * (size(col("_ms")) - 1)
            .cast("double")) + 1).cast("int")).as("lo_micro"),
        element_at(col("_ms"), (floor(
          lit(1.0 - alphaMicro.toDouble / 2e6) * (size(col("_ms")) - 1)
            .cast("double")) + 1).cast("int")).as("hi_micro"),
        size(col("_ms")).cast("long").as("b_replicates"))
    val m = base.agg(count(lit(1)).as("n"),
      round(sum(col("_v")).cast("double") /
        when(count(lit(1)) > 0L, count(lit(1)).cast("double")) *
        lit(1000000.0)).cast("long").as("mean_micro"))
    m.crossJoin(broadcast(ci))
      .select(col("n"), col("b_replicates"), col("mean_micro"),
        col("lo_micro"), col("hi_micro"))
  }

  /** Trimmed and winsorized means — the robust-location companions of
    * [[robustOutliers]]' median/MAD: drop (trim) or clamp (winsorize)
    * the lowest/highest `k = ⌊n·trim⌋` observations before averaging,
    * the standard way a metrics pipeline reports a mean that one
    * whale or one corrupt row cannot move.
    *
    * Exactness + scale: one reduction to the DISTINCT-VALUE cumulative
    * table (the Gini/Mann-Whitney discipline — the window never sees
    * corpus rows); each value's surviving multiplicity is an exact
    * integer interval clip `max(0, min(cum_end, n−k) − max(cum_before,
    * k))`, the winsorized tails add `k·(v_(k+1) + v_(n−k))` exactly,
    * and k itself is an exact decimal integer division. One
    * micro-snapped division per mean. Output (one row):
    * `(n, k_trimmed, mean_micro, trimmed_mean_micro,
    * winsorized_mean_micro)`; NULL means when trimming eats
    * everything (n − 2k ≤ 0).
    */
  def trimmedMeans(df: DataFrame, valueInt: Column,
      trimMicro: Long = 100000L): DataFrame = {
    require(trimMicro >= 0 && trimMicro < 500000L,
      s"trimMicro must be in [0, 500000), got $trimMicro")
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val cells = df.select(valueInt.cast("long").as("_v"))
      .groupBy(col("_v")).agg(count(lit(1)).as("_cnt"))
    val w = Window.orderBy(col("_v"))
    val cum = cells.select(col("_v"), col("_cnt"),
      (sum(col("_cnt")).over(w) - col("_cnt")).as("_before"))
      .persist() // totals + the clipped fold both consume it
    val tot = cum.agg(sum(col("_cnt")).cast(dec).as("_n"))
      .select(col("_n"),
        // k = floor(n·trim/1e6) as an EXACT decimal division
        ((col("_n") * trimMicro -
          pmod(col("_n") * trimMicro, lit(1000000L))) /
          lit(1000000L)).cast(dec).as("_k"))
      .localCheckpoint()
    val joined = cum.crossJoin(broadcast(tot))
    val cumEnd = (col("_before") + col("_cnt")).cast(dec)
    val contrib = greatest(lit(0).cast(dec),
      least(cumEnd, col("_n") - col("_k")) -
        greatest(col("_before").cast(dec), col("_k")))
    val m = joined.agg(
      max(col("_n")).as("_n"), max(col("_k")).as("_k"),
      sum(col("_v").cast(dec) * col("_cnt")).as("_sum"),
      sum(col("_v").cast(dec) * contrib).as("_tsum"),
      // winsorized bounds: the values holding ranks k+1 and n−k
      min(when(cumEnd >= col("_k") + 1, col("_v"))).as("_vlo"),
      min(when(cumEnd >= col("_n") - col("_k"), col("_v"))).as("_vhi"))
    val core = col("_n") - lit(2).cast(dec) * col("_k")
    m.select(col("_n").cast("long").as("n"),
      col("_k").cast("long").as("k_trimmed"),
      round(col("_sum").cast("double") /
        when(col("_n") > 0, col("_n").cast("double")) *
        lit(1000000.0)).cast("long").as("mean_micro"),
      when(core <= 0, lit(null).cast("long"))
        .otherwise(round(col("_tsum").cast("double") /
          core.cast("double") * lit(1000000.0)).cast("long"))
        .as("trimmed_mean_micro"),
      when(core <= 0, lit(null).cast("long"))
        .otherwise(round((col("_tsum") + col("_k") *
          (col("_vlo").cast(dec) + col("_vhi"))).cast("double") /
          col("_n").cast("double") * lit(1000000.0)).cast("long"))
        .as("winsorized_mean_micro"))
  }

  /** Kendall's τ-b rank correlation — the concordance-based
    * alternative to [[spearmanByGroup]] with a proper tie treatment
    * (the b variant's denominator discounts ties on either margin):
    *
    *   τ-b = (C − D) / sqrt((n₀ − n₁)(n₀ − n₂))
    *
    * with C/D the concordant/discordant pair counts, n₀ = n(n−1)/2,
    * n₁/n₂ the within-tie pair counts of the two margins.
    *
    * Scale + exactness discipline: rows reduce ONCE to the
    * DISTINCT-VALUE-PAIR cell grid `(va, vb, n)` — C and D are
    * cross-cell products over that grid's self-join (O(|cells|²) on
    * the bounded grid, never corpus rows — the chi-square
    * contingency assumption: both value spaces are bounded, e.g.
    * snapped measures or counts; for unbounded doubles, bucket
    * first). Every count is an exact decimal; τ is one double chain,
    * micro-snapped. Output (one row): `(n, n_cells, c_pairs, d_pairs,
    * tau_b_micro)`.
    */
  def kendallTauB(df: DataFrame, a: Column, b: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val cells = df.select(a.cast("long").as("_va"),
      b.cast("long").as("_vb"))
      .groupBy(col("_va"), col("_vb")).agg(count(lit(1)).as("_n"))
      .persist() // self-join legs + three marginal/total passes
    val l = cells.select(col("_va").as("_xa"), col("_vb").as("_xb"),
      col("_n").cast(dec).as("_nx"))
    val r = cells.select(col("_va").as("_ya"), col("_vb").as("_yb"),
      col("_n").cast(dec).as("_ny"))
    // each unordered cell pair once: strict order on the a margin
    // covers every non-a-tied pair exactly once
    val cd = l.join(broadcast(r), col("_xa") < col("_ya"))
      .agg(
        coalesce(sum(when(col("_xb") < col("_yb"),
          col("_nx") * col("_ny"))), lit(0).cast(dec)).as("_c"),
        coalesce(sum(when(col("_xb") > col("_yb"),
          col("_nx") * col("_ny"))), lit(0).cast(dec)).as("_d"))
    // Σ t(t−1)/2 over each margin's tie groups — derived from the
    // cell grid, exact decimals (t(t−1) is even, so /2 is exact)
    val aTies = cells.groupBy(col("_va"))
      .agg(sum(col("_n")).as("_t"))
      .agg(coalesce(sum(col("_t").cast(dec) * (col("_t") - 1) / 2),
        lit(0).cast(dec)).cast(dec).as("_n1"))
    val bTies = cells.groupBy(col("_vb"))
      .agg(sum(col("_n")).as("_t"))
      .agg(coalesce(sum(col("_t").cast(dec) * (col("_t") - 1) / 2),
        lit(0).cast(dec)).cast(dec).as("_n2"))
    val tot = cells.agg(sum(col("_n")).as("n"),
      count(lit(1)).as("n_cells"))
    val m = tot.crossJoin(broadcast(cd))
      .crossJoin(broadcast(aTies)).crossJoin(broadcast(bTies))
    val nD = col("n").cast(dec)
    val n0 = nD * (nD - 1) / 2
    val denom = sqrt((n0 - col("_n1")).cast("double") *
      (n0 - col("_n2")).cast("double"))
    m.select(col("n"), col("n_cells"),
      col("_c").cast("long").as("c_pairs"),
      col("_d").cast("long").as("d_pairs"),
      when(denom === 0.0, lit(null).cast("long"))
        .otherwise(round((col("_c") - col("_d")).cast("double") /
          denom * lit(1000000.0)).cast("long")).as("tau_b_micro"))
  }

  /** Cohen's d standardized mean difference (+ Hedges' g small-sample
    * correction) — the effect size [[welchTTest]]'s t statistic does
    * not give you (t grows with n; d does not): pooled-SD
    * `d = (x̄_a − x̄_b)/s_p`,
    * `s_p² = ((n_a−1)s_a² + (n_b−1)s_b²)/(n_a+n_b−2)`,
    * `g = d·(1 − 3/(4(n_a+n_b) − 9))`. ONE moment pass to six exact
    * integers (the Welch discipline: decimal(38,0) v² sums), then a
    * fixed double chain, micro-snapped; degenerate inputs
    * (either side n < 2, zero pooled variance) yield NULL.
    */
  def cohensD(df: DataFrame, isA: Column, valueInt: Column)
      : DataFrame = {
    val d = df.select(isA.as("_a"), valueInt.cast("long").as("_v"))
    val vd = col("_v").cast("decimal(19,0)")
    def side(p: Column, name: String) = Seq(
      sum(when(p, 1L).otherwise(0L)).as(s"n_$name"),
      sum(when(p, col("_v")).otherwise(0L)).as(s"_s_$name"),
      sum(when(p, vd * vd).otherwise(lit(0).cast("decimal(38,0)")))
        .as(s"_q_$name"))
    val aggs = side(col("_a"), "a") ++ side(!col("_a"), "b")
    val m = d.agg(aggs.head, aggs.tail: _*)
    def mean(n: Column, s: Column) = s.cast("double") / n.cast("double")
    // unbiased sample variance from exact moments; a NULL (not zero)
    // denominator below n = 2 keeps ANSI division happy and flows the
    // degeneracy to the outputs
    def variance(n: Column, s: Column, q: Column) =
      (n.cast("double") * q.cast("double") -
        s.cast("double") * s.cast("double")) /
        when(n > 1L, n.cast("double") * (n.cast("double") - 1.0))
    val na = col("n_a"); val nb = col("n_b")
    val va = variance(na, col("_s_a"), col("_q_a"))
    val vb = variance(nb, col("_s_b"), col("_q_b"))
    val sp = sqrt(((na.cast("double") - 1.0) * va +
      (nb.cast("double") - 1.0) * vb) /
      when(na + nb > 2L,
        na.cast("double") + nb.cast("double") - 2.0))
    val dEff = (mean(na, col("_s_a")) - mean(nb, col("_s_b"))) /
      when(sp > 0.0, sp)
    val g = dEff * (lit(1.0) - lit(3.0) /
      (lit(4.0) * (na.cast("double") + nb.cast("double")) - lit(9.0)))
    val degenerate = na < 2 || nb < 2 || sp.isNull || sp === 0.0 ||
      sp.isNaN
    m.select(na, nb,
      round(mean(na, col("_s_a")) * lit(1000000.0)).cast("long")
        .as("mean_a_micro"),
      round(mean(nb, col("_s_b")) * lit(1000000.0)).cast("long")
        .as("mean_b_micro"),
      when(degenerate, lit(null).cast("long"))
        .otherwise(round(dEff * lit(1000000.0)).cast("long"))
        .as("d_micro"),
      when(degenerate, lit(null).cast("long"))
        .otherwise(round(g * lit(1000000.0)).cast("long"))
        .as("g_micro"))
  }

  /** Mann-Whitney U (Wilcoxon rank-sum) — the nonparametric two-sample
    * test [[welchTTest]] pairs with when normality is off the table:
    * group A vs group B on an exact-integer value column, tie-averaged
    * ranks, tie-corrected normal approximation.
    *
    * Exactness discipline: ranks come from the DISTINCT-VALUE
    * cumulative table (the [[spearmanByGroup]] shape — the window runs
    * over distinct values, not rows), kept integer by DOUBLING
    * (2·rank = 2·cntLess + cnt + 1); rank sums, U, and the tie term
    * Σ(t³−t) are exact integers/decimals, so `u_a`/`u_b` hash-gate
    * outright; the z statistic and rank-biserial effect size are each
    * one fixed double chain, micro-snapped. Output (one row):
    * `(n_a, n_b, u_a_x2, u_b_x2, r_rb_micro, z_micro)` — U values in
    * DOUBLED units (exact even with tie-averaged half ranks).
    */
  def mannWhitneyU(df: DataFrame, isA: Column, valueInt: Column)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = df.select(isA.as("_ga"), valueInt.cast("long").as("_v"))
    val dec = "decimal(38,0)"
    // distinct-value table with per-group counts + doubled avg rank
    val byVal = d.groupBy(col("_v"))
      .agg(sum(when(col("_ga"), 1L).otherwise(0L)).as("_na"),
        sum(when(!col("_ga"), 1L).otherwise(0L)).as("_nb"),
        count(lit(1)).as("_cnt"))
    val w = Window.orderBy(col("_v")) // distinct values, not rows
    val ranked = byVal.select(col("_na"), col("_nb"), col("_cnt"),
      (lit(2L) * (sum(col("_cnt")).over(w) - col("_cnt")) +
        col("_cnt") + lit(1L)).as("_r2"))
    val m = ranked.agg(
      sum(col("_na")).as("n_a"), sum(col("_nb")).as("n_b"),
      sum(col("_na").cast(dec) * col("_r2").cast(dec)).as("_ra2"),
      sum((col("_cnt").cast(dec) * col("_cnt") * col("_cnt") -
        col("_cnt")).cast(dec)).as("_ties"))
    val na = col("n_a").cast(dec)
    val nb = col("n_b").cast(dec)
    val n = na + nb
    // doubled U: U_a·2 = 2·R_a − n_a(n_a+1) — exact decimal
    val ua2 = col("_ra2") - na * (na + lit(1))
    val ub2 = lit(2) * na * nb - ua2
    // tie-corrected variance of U: n_a·n_b/12 · ((n+1) − Σ(t³−t)/(n(n−1)))
    val varU = (na * nb).cast("double") / lit(12.0) *
      ((n + lit(1)).cast("double") -
        col("_ties").cast("double") / (n * (n - lit(1))).cast("double"))
    val z = (ua2.cast("double") / lit(2.0) -
      (na * nb).cast("double") / lit(2.0)) / sqrt(varU)
    val rrb = lit(1.0) - ub2.cast("double") / (na * nb).cast("double")
    m.select(col("n_a"), col("n_b"),
      ua2.cast("long").as("u_a_x2"), ub2.cast("long").as("u_b_x2"),
      round(rrb * lit(1000000.0)).cast("long").as("r_rb_micro"),
      when(varU === 0.0, lit(null).cast("long"))
        .otherwise(round(z * lit(1000000.0)).cast("long")).as("z_micro"))
  }

  /** Two-sample Kolmogorov–Smirnov test (Kolmogorov 1933; Smirnov
    * 1939) — the distribution-equality screen beside
    * [[mannWhitneyU]]'s location shift: `D = sup|F_A − F_B|` over the
    * pooled empirical CDFs, with the asymptotic p-value
    * `2·Σ (−1)^{k−1} e^{−2k²λ²}` (8 terms — the tail beyond is below
    * micro resolution) at the effective-size-corrected
    * `λ = (√n_e + 0.12 + 0.11/√n_e)·D` (Stephens 1970, the
    * Numerical-Recipes form). The drift detector for "did this
    * source's quality-score distribution move between snapshots".
    *
    * Scale + exactness (the q36/[[mannWhitneyU]] discipline): rows
    * reduce ONCE to the distinct-value cumulative table; the supremum
    * compares CROSS-MULTIPLIED exact integers (`|cumA·n_b −
    * cumB·n_a|` — no per-value division), so D is an exact rational
    * snapped once; λ and the 8-term p fold are one fixed double
    * chain. The only window runs over distinct VALUES (bounded value
    * space), not rows. Output (one row): `(n_a, n_b, d_micro,
    * p_micro)` — NULL p when either side is empty.
    */
  def ksTest(df: DataFrame, isA: Column, valueInt: Column)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val d = df.select(isA.as("_ga"), valueInt.cast("long").as("_v"))
    val byVal = d.groupBy(col("_v"))
      .agg(sum(when(col("_ga"), 1L).otherwise(0L)).as("_na"),
        sum(when(!col("_ga"), 1L).otherwise(0L)).as("_nb"))
    val w = Window.orderBy(col("_v")) // distinct values, not rows
    val cum = byVal.select(
      sum(col("_na")).over(w).as("_ca"),
      sum(col("_nb")).over(w).as("_cb"))
    val m = cum
      .crossJoin(broadcast(byVal.agg(sum(col("_na")).as("n_a"),
        sum(col("_nb")).as("n_b"))))
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        max(abs(col("_ca").cast(dec) * col("n_b") -
          col("_cb").cast(dec) * col("n_a"))).as("_dnum"))
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val dStat = col("_dnum").cast("double") / (na * nb)
    val ne = na * nb / (na + nb)
    val lam = (sqrt(ne) + lit(0.12) + lit(0.11) / sqrt(ne)) * dStat
    // 8 terms suffice for λ > 0.2 (the k=9 term is < 4e-5 there and
    // shrinks super-exponentially); BELOW that the truncated
    // alternating series collapses toward 0 while the true tail
    // probability is ~1, so the conventional guard returns 1 outright
    // (Q_KS(0.2) = 1 to within 3e-3) — the oracle replays the same
    // truncation + guard, so the gate is exact either way
    val p = lit(2.0) * (1 to 8).map(k =>
      lit(if (k % 2 == 1) 1.0 else -1.0) *
        exp(lit(-2.0 * k * k) * lam * lam)).reduce(_ + _)
    val pClamped = when(lam <= 0.2, lit(1.0))
      .otherwise(least(greatest(p, lit(0.0)), lit(1.0)))
    val empty = col("n_a") === 0L || col("n_b") === 0L
    m.select(col("n_a"), col("n_b"),
      when(empty, lit(null).cast("long"))
        .otherwise(round(dStat * lit(1000000.0)).cast("long"))
        .as("d_micro"),
      when(empty, lit(null).cast("long"))
        .otherwise(round(pClamped * lit(1000000.0)).cast("long"))
        .as("p_micro"))
  }

  /** Exact Gini index of a nonnegative integer value distribution —
    * the concentration number a corpus report quotes for "how skewed
    * are tokens/documents/events across sources or users":
    * `G = 2·Σᵢ i·x₍ᵢ₎ / (n·Σx) − (n+1)/n` over the ascending sort.
    *
    * Scale + exactness: the rank-weighted sum folds over the
    * DISTINCT-VALUE cumulative table, not per-row ranks — members of
    * a tied value share consecutive ranks whose SUM is
    * cnt·(2·cntLess + cnt + 1)/2, so Σᵢ i·x₍ᵢ₎ = Σ_v v·cnt·(2·cumLess
    * + cnt + 1)/2 exactly (doubled to stay integer, decimal(38,0)
    * against overflow). The only window runs over distinct values;
    * one division at the end, micro-snapped. Output:
    * `(n, total, gini_micro)`.
    */
  def giniIndex(df: DataFrame, valueInt: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val byVal = df.select(valueInt.cast("long").as("_v"))
      .groupBy(col("_v")).agg(count(lit(1)).as("_cnt"))
    val w = Window.orderBy(col("_v"))
    val m = byVal
      .select(col("_v"), col("_cnt"),
        (sum(col("_cnt")).over(w) - col("_cnt")).as("_less"))
      .agg(sum(col("_cnt")).as("n"),
        sum(col("_v").cast(dec) * col("_cnt")).as("_tot"),
        // doubled rank-weighted sum: Σ v·cnt·(2·cumLess + cnt + 1)
        sum(col("_v").cast(dec) * col("_cnt") *
          (lit(2) * col("_less").cast(dec) + col("_cnt") + lit(1)))
          .as("_rw2"))
    val nD = col("n").cast(dec)
    val g = col("_rw2").cast("double") /
      (nD.cast("double") * col("_tot").cast("double")) -
      (nD + lit(1)).cast("double") / nD.cast("double")
    m.select(col("n"), col("_tot").cast("long").as("total"),
      when(col("_tot") === 0, lit(null).cast("long"))
        .otherwise(round(g * lit(1000000.0)).cast("long"))
        .as("gini_micro"))
  }

  /** Jensen-Shannon divergence between two categorical distributions
    * (side A vs side B over `cat`): `JS = (KL(P‖M) + KL(Q‖M))/2`,
    * `M = (P+Q)/2` — the symmetric, bounded (≤ ln 2) drift number to
    * publish when KL's asymmetry and infinities are unacceptable
    * (categories private to one side contribute finitely here).
    *
    * Exactness: category counts are exact integers; each category's
    * two KL terms are fixed double chains over exact ratios,
    * micro-snapped PER CATEGORY then summed exactly, one final halving
    * — the q84/chi-square micro-term discipline. Output: one row per
    * category (`cat, n_a, n_b, term_micro`); use
    * [[jsDivergenceTotal]] for the single number.
    */
  def jsDivergenceTerms(df: DataFrame, cat: Column, isA: Column)
      : DataFrame = {
    val counts = df.select(cat.as("cat"), isA.as("_ga"))
      .groupBy(col("cat"))
      .agg(sum(when(col("_ga"), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col("_ga"), 1L).otherwise(0L)).as("n_b"))
      .persist() // feeds the totals AND the per-category terms
    val tot = counts.agg(sum(col("n_a")).as("_ta"),
      sum(col("n_b")).as("_tb")).localCheckpoint()
    val p = col("n_a").cast("double") / col("_ta").cast("double")
    val q = col("n_b").cast("double") / col("_tb").cast("double")
    val mm = (p + q) / lit(2.0)
    val term = when(col("n_a") > 0, p * log(p / mm)).otherwise(lit(0.0)) +
      when(col("n_b") > 0, q * log(q / mm)).otherwise(lit(0.0))
    counts.crossJoin(broadcast(tot))
      .select(col("cat"), col("n_a"), col("n_b"),
        round(term / lit(2.0) * lit(1000000.0)).cast("long")
          .as("term_micro"))
  }

  /** Σ of [[jsDivergenceTerms]] — `(n_categories, js_micro)`. */
  def jsDivergenceTotal(df: DataFrame, cat: Column, isA: Column)
      : DataFrame =
    jsDivergenceTerms(df, cat, isA)
      .agg(count(lit(1)).as("n_categories"),
        sum(col("term_micro")).as("js_micro"))

  /** Cramér's V — the [0,1] effect size on top of
    * [[chiSquareIndependence]]'s contingency terms:
    * `V = sqrt(χ² / (N·(min(r,c) − 1)))`, the number that makes
    * chi-squares comparable across table sizes. Exact integer N and
    * dimension counts off the same cell frame; χ² is the sum of the
    * already-snapped micro terms (the q231 discipline), one sqrt at
    * the end. Output: `(n, n_rows_dim, n_cols_dim, chi2_micro,
    * v_micro)`.
    */
  def cramersV(df: DataFrame, rowCol: String, colCol: String)
      : DataFrame = {
    val cells = chiSquareIndependence(df, rowCol, colCol)
    cells.agg(
      sum(col("observed")).as("n"),
      countDistinct(col(rowCol)).as("n_rows_dim"),
      countDistinct(col(colCol)).as("n_cols_dim"),
      sum(col("term_micro")).as("chi2_micro"))
      .select(col("n"), col("n_rows_dim"), col("n_cols_dim"),
        col("chi2_micro"),
        round(sqrt(col("chi2_micro").cast("double") / lit(1000000.0) /
          (col("n").cast("double") *
            (least(col("n_rows_dim"), col("n_cols_dim")) - lit(1))
              .cast("double"))) * lit(1000000.0)).cast("long")
          .as("v_micro"))
  }

  /** One-way ANOVA F test + η² effect size (Fisher 1925) — the k-group
    * generalization of [[welchTTest]]'s two-sample comparison (equal
    * variances assumed; for the robust two-group path use Welch).
    *
    * Decomposition off ONE aggregation pass: rows reduce to the
    * bounded per-group moment table `(n_g, s_g, q_g)` (q in
    * decimal(38,0) — the welchTTest overflow guard); then
    *
    *   SSB = Σ_g s_g²/n_g − S²/N,   SSW = Q − Σ_g s_g²/n_g
    *
    * with each `s²/n` term ONE double division milli-snapped to a
    * BIGINT before the exact integer sums (order-free, so the group
    * sum hash-gates under any partitioning); Q·1000 stays an exact
    * decimal. F and η² = SSB/SST are one fixed double chain at the
    * end. Output (one row): `(k, n, ssb_milli, ssw_milli, sst_milli,
    * f_micro, eta2_micro)` — NULL F when degenerate (k < 2, N ≤ k,
    * or SSW ≤ 0).
    */
  def anovaF(df: DataFrame, groupCol: Column, valueInt: Column)
      : DataFrame = {
    val dec = "decimal(38,0)"
    val vd = col("_v").cast("decimal(19,0)")
    val g = df.select(groupCol.as("_g"), valueInt.cast("long").as("_v"))
      .groupBy(col("_g"))
      .agg(count(lit(1)).as("_n"), sum(col("_v")).as("_s"),
        sum(vd * vd).as("_q"))
    // per-group s²/n: one double division, milli-snapped BEFORE the sum
    val termMilli = round(col("_s").cast("double") *
      col("_s").cast("double") / col("_n").cast("double") *
      lit(1000.0)).cast("long")
    val m = g.agg(count(lit(1)).as("k"), sum(col("_n")).as("n"),
      sum(col("_s")).as("_ss"), sum(col("_q").cast(dec)).as("_qq"),
      sum(termMilli).as("_between_milli"))
    val grandMilli = round(col("_ss").cast("double") *
      col("_ss").cast("double") / col("n").cast("double") *
      lit(1000.0)).cast("long")
    val base = m.select(col("k"), col("n"),
      (col("_between_milli") - grandMilli).as("ssb_milli"),
      ((col("_qq") * 1000L).cast("long") -
        col("_between_milli")).as("ssw_milli"),
      ((col("_qq") * 1000L).cast("long") - grandMilli)
        .as("sst_milli"))
    val f = (col("ssb_milli").cast("double") /
      (col("k") - 1L).cast("double")) /
      (col("ssw_milli").cast("double") / (col("n") - col("k"))
        .cast("double"))
    val degenerate = col("k") < 2L || col("n") <= col("k") ||
      col("ssw_milli") <= 0L
    base.select(col("k"), col("n"), col("ssb_milli"), col("ssw_milli"),
      col("sst_milli"),
      when(degenerate, lit(null).cast("long"))
        .otherwise(round(f * lit(1000000.0)).cast("long"))
        .as("f_micro"),
      when(col("sst_milli") <= 0L, lit(null).cast("long"))
        .otherwise(round(col("ssb_milli").cast("double") /
          col("sst_milli").cast("double") * lit(1000000.0))
          .cast("long")).as("eta2_micro"))
  }

  /** Weighted exact-n sample without replacement (Efraimidis &
    * Spirakis 2006, algorithm A-ES) — the SUCCESSIVE-sampling sibling
    * of [[prioritySample]] (Duffield-Lund-Thorup): A-ES's key
    * `u_i^(1/w_i)` (equivalently `ln(u_i)/w_i`, larger is better)
    * reproduces drawing rows one at a time with probability
    * proportional to remaining weight — the distribution bootstrap /
    * reservoir literature standardizes on, vs DLT's
    * Horvitz-Thompson-estimable priorities `w/u`; keep both because
    * their inclusion semantics differ. `u_i` is a DETERMINISTIC
    * md5-derived uniform — no RNG state, identical under any
    * partitioning, replayable by any engine with md5.
    *
    * Scale + exactness: the key is one fixed double chain per row
    * micro-snapped to a BIGINT (snapped BEFORE the top-n compare, so
    * the selected set hash-gates; id breaks snapped-key ties
    * totally); selection is `orderBy(desc).limit(n)` = TakeOrdered —
    * per-partition heaps, no global sort. Rows with non-positive
    * weight are excluded (they have zero mass). Output:
    * `(id, w, key_micro)`, the n winners.
    */
  def weightedSample(df: DataFrame, idCol: String, weightInt: Column,
      n: Int, seed: Long): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    val d = df.select(col(idCol).as("id"),
      weightInt.cast("long").as("w"))
      .filter(col("w") > 0L)
    val h = conv(substring(md5Rank(Seq(col("id")), seed), 1, 8),
      16, 10).cast("long")
    val u = (h + 1L).cast("double") / lit(4294967296.0)
    val key = round(log(u) / col("w").cast("double") *
      lit(1000000.0)).cast("long")
    d.select(col("id"), col("w"), key.as("key_micro"))
      .orderBy(col("key_micro").desc, col("id")).limit(n)
  }

  /** Mutual information + normalized MI between two categorical
    * columns (Shannon; NMI per Strehl & Ghosh 2002's √(H_x·H_y)
    * normalization) — the feature-selection / leakage-screen number
    * beside [[cramersV]]'s effect size: how many nats does knowing X
    * tell you about Y?
    *
    * Scale + exactness (the chi-square contingency discipline): rows
    * reduce ONCE to the bounded cell grid; margins are grid folds,
    * broadcast back; each cell's `ln(c_xy·N/(c_x·c_y))` is ONE double
    * chain micro-nat-snapped BEFORE the exact `c_xy`-weighted integer
    * sum (order-free); the entropies fold the same way off the
    * margins. MI/H divisions and the NMI chain happen once at the
    * end. Output (one row): `(n, n_x, n_y, mi_micro, hx_micro,
    * hy_micro, nmi_micro)` — NULL NMI when either entropy is 0.
    */
  def mutualInformation(df: DataFrame, xCol: Column, yCol: Column)
      : DataFrame = {
    val dec = "decimal(38,0)"
    val cells = df.select(xCol.as("_x"), yCol.as("_y"))
      .groupBy(col("_x"), col("_y")).agg(count(lit(1)).as("_cxy"))
      .persist() // margins + the MI fold
    val rx = cells.groupBy(col("_x")).agg(sum(col("_cxy")).as("_cx"))
    val cy = cells.groupBy(col("_y")).agg(sum(col("_cxy")).as("_cy"))
    val tot = cells.agg(sum(col("_cxy")).as("_n")).localCheckpoint()
    val joined = cells.join(broadcast(rx), "_x")
      .join(broadcast(cy), "_y").crossJoin(broadcast(tot))
    val lnTerm = round(log(
      (col("_cxy").cast(dec) * col("_n")).cast("double") /
        (col("_cx").cast(dec) * col("_cy")).cast("double")) *
      lit(1000000.0)).cast("long")
    val mi = joined.agg(
      sum(col("_cxy").cast(dec) * lnTerm).as("_misum"),
      countDistinct(col("_x")).as("n_x"),
      countDistinct(col("_y")).as("n_y"))
    def entropy(margin: DataFrame, c: Column): DataFrame = {
      val t = round(log(c.cast("double") /
        col("_n").cast("double")) * lit(1000000.0)).cast("long")
      margin.crossJoin(broadcast(tot))
        .agg((-sum(c.cast(dec) * t)).as("_hsum"))
    }
    val m = mi.crossJoin(broadcast(entropy(rx, col("_cx"))
        .select(col("_hsum").as("_hx"))))
      .crossJoin(broadcast(entropy(cy, col("_cy"))
        .select(col("_hsum").as("_hy"))))
      .crossJoin(broadcast(tot))
    val nD = col("_n").cast("double")
    val miM = round(col("_misum").cast("double") / nD).cast("long")
    val hxM = round(col("_hx").cast("double") / nD).cast("long")
    val hyM = round(col("_hy").cast("double") / nD).cast("long")
    m.select(col("_n").as("n"), col("n_x"), col("n_y"),
      miM.as("mi_micro"), hxM.as("hx_micro"), hyM.as("hy_micro"),
      when(hxM <= 0L || hyM <= 0L, lit(null).cast("long"))
        .otherwise(round(miM.cast("double") /
          sqrt(hxM.cast("double") * hyM.cast("double")) *
          lit(1000000.0)).cast("long")).as("nmi_micro"))
  }

  /** Adjusted Rand Index (Hubert & Arabie 1985) — the PAIR-counting
    * clustering-vs-truth score beside [[mutualInformation]]'s
    * information-theoretic one: of all row pairs, how many does the
    * candidate clustering group/separate the same way as the truth,
    * corrected for chance (0 ≈ random labels, 1 = identical
    * partitions, negative = worse than chance). The number a dedup
    * clustering (q16's CC labels) or a semantic bucketing is accepted
    * on against labeled truth.
    *
    * Exactness: rows reduce ONCE to the bounded contingency grid;
    * every pair count `C(x,2) = x(x−1)/2` is an exact integer
    * (decimal(38,0) — Σindex·Σa·Σb products would overflow BIGINT at
    * corpus scale); expected/max indexes stay decimal through the
    * cross-multiplied fold, and only the final ARI ratio is one
    * double chain, micro-snapped. Output (one row): `(n, n_a, n_b,
    * s_cells, s_a, s_b, ari_micro)` — the raw pair sums are exposed
    * (reported as BIGINT; they stay decimal inside the fold) so the
    * chance-correction replays; NULL ARI when the denominator is 0
    * (both partitions trivial).
    */
  def adjustedRandIndex(df: DataFrame, aCol: Column, bCol: Column)
      : DataFrame = {
    val dec = "decimal(38,0)"
    def comb2(c: Column) = ((c.cast(dec) * (c.cast(dec) - 1)) / 2)
      .cast(dec)
    val cells = df.select(aCol.as("_a"), bCol.as("_b"))
      .groupBy(col("_a"), col("_b")).agg(count(lit(1)).as("_c"))
      .persist() // margins + the cell fold
    val ra = cells.groupBy(col("_a")).agg(sum(col("_c")).as("_ca"))
    val rb = cells.groupBy(col("_b")).agg(sum(col("_c")).as("_cb"))
    val m = cells.agg(sum(col("_c")).as("n"),
      countDistinct(col("_a")).as("n_a"),
      countDistinct(col("_b")).as("n_b"),
      sum(comb2(col("_c"))).cast(dec).as("s_cells"))
      .crossJoin(broadcast(
        ra.agg(sum(comb2(col("_ca"))).cast(dec).as("s_a"))))
      .crossJoin(broadcast(
        rb.agg(sum(comb2(col("_cb"))).cast(dec).as("s_b"))))
    // ARI = (S − SaSb/C(n,2)) / ((Sa+Sb)/2 − SaSb/C(n,2)); the
    // expected term divides ONCE as a double — the only float
    val cn2 = (col("n").cast(dec) * (col("n").cast(dec) - 1) / 2)
      .cast(dec).cast("double")
    val expd = col("s_a").cast("double") * col("s_b").cast("double") /
      cn2
    val num = col("s_cells").cast("double") - expd
    val den = (col("s_a").cast("double") + col("s_b").cast("double")) /
      lit(2.0) - expd
    m.select(col("n"), col("n_a"), col("n_b"),
      col("s_cells").cast("long").as("s_cells"),
      col("s_a").cast("long").as("s_a"),
      col("s_b").cast("long").as("s_b"),
      when(den === 0.0, lit(null).cast("long"))
        .otherwise(round(num / den * lit(1000000.0)).cast("long"))
        .as("ari_micro"))
  }

  /** Median absolute deviation (Hampel 1974's robust scale — the
    * [[trimmedMeans]] family's spread sibling): MAD = median(|x −
    * median(x)|), with the consistency-scaled σ̂ = 1.4826·MAD that
    * replaces a whale-sensitive standard deviation in outlier fences.
    *
    * Exactness: both medians come off DISTINCT-VALUE cumulative
    * tables (the q36 bounded-value-space discipline — the only
    * windows); even-n medians average the two middle values EXACTLY
    * in micro units ((va+vb)·5e5); deviations are exact integer
    * |x·1e6 − med_micro|; σ̂ is the single double chain. Output (one
    * row): `(n, median_micro, mad_micro, sigma_micro)`.
    */
  def medianAbsDeviation(df: DataFrame, valueInt: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def medianMicro(d: DataFrame, v: Column): DataFrame = {
      val cells = d.groupBy(v.as("_mv")).agg(count(lit(1)).as("_cnt"))
      val w = Window.orderBy(col("_mv"))
      val cum = cells.select(col("_mv"),
        sum(col("_cnt")).over(w).as("_cend"))
        .crossJoin(broadcast(cells.agg(sum(col("_cnt")).as("_n"))))
      // 1-based middle ranks k1 = ⌈n/2⌉ (2·cend ≥ n) and
      // k2 = ⌊n/2⌋+1 (2·cend ≥ n+1) — equal when n is odd
      cum.agg(max(col("_n")).as("_n"),
        min(when(col("_cend") * 2L >= col("_n"), col("_mv")))
          .as("_va"),
        min(when(col("_cend") * 2L >= col("_n") + 1L, col("_mv")))
          .as("_vb"))
        .select(col("_n"),
          // decimal(38,0) midpoint: the second median runs over
          // deviations already in micro units (≈|v|·1e6), where a
          // Long (va+vb)·5e5 product would silently wrap past
          // |v|≈9.2e6 input units (non-ANSI Spark) while the DuckDB
          // oracle's BIGINT errors loudly — keep the product exact
          ((col("_va").cast("decimal(38,0)") + col("_vb")) * 500000L)
            .as("_med_micro"))
    }
    val d = df.select(valueInt.cast("long").as("_v"))
    val m1 = medianMicro(d, col("_v")).localCheckpoint()
    val dev = d.crossJoin(broadcast(m1))
      .select(abs(col("_v").cast("decimal(38,0)") * 1000000L -
        col("_med_micro")).as("_dev"))
    val m2 = medianMicro(dev, col("_dev"))
    m1.crossJoin(broadcast(m2.select(col("_med_micro").as("_mad"))))
      .select(col("_n").as("n"),
        col("_med_micro").cast("long").as("median_micro"),
        // the deviation median is already in micro of micro-units:
        // _dev values are micro, so its median_micro carries an extra
        // 1e6 — divide back down EXACTLY (subtract the remainder
        // first so the double division is an exact integer quotient,
        // the trimmedMeans pmod discipline)
        ((col("_mad") - pmod(col("_mad"), lit(1000000L))) / 1000000L)
          .cast("long").as("mad_micro"),
        round(((col("_mad") - pmod(col("_mad"), lit(1000000L))) /
          1000000L).cast("double") * lit(1.4826))
          .cast("long").as("sigma_micro"))
  }

  /** Two-proportion z-test + Wald interval — the conversion-rate A/B
    * readout ([[welchTTest]] is the means flavor): pooled-variance z
    * for the hypothesis test, UNpooled standard error for the 95%
    * CI on the difference (the standard pairing). One aggregation
    * pass, exact integer counts, two fixed double chains. Output
    * (one row): `(n_a, n_b, x_a, x_b, diff_micro, z_micro, lo_micro,
    * hi_micro)` — NULL z/CI when degenerate (an empty side or a
    * pooled rate of 0 or 1).
    */
  /** Anytime-valid two-proportion A/B monitor — the mixture
    * sequential probability ratio test (mSPRT) of Johari, Koomen,
    * Pekelis & Walsh 2017 ("Peeking at A/B Tests"), normal
    * approximation with a normal mixing density of variance `tau`:
    * per day t, on the CUMULATIVE counts,
    * `ln Λ_t = ½·ln(V_t/(V_t+τ)) + θ̂_t²·τ/(2·V_t·(V_t+τ))` with
    * `θ̂ = x_a/n_a − x_b/n_b` and the pooled-variance
    * `V = p̂(1−p̂)(1/n_a+1/n_b)`, and the ALWAYS-VALID p-value is the
    * running minimum of `min(1, 1/Λ_s), s ≤ t` — the number a
    * dashboard may poll every day without inflating false positives
    * (a fixed-n z-test peeked at daily does).
    *
    * Scale + exactness: rows fold ONCE to per-day increment counts
    * (bounded by distinct days); cumulative counts are exact integer
    * windows over that bounded table; each day's ln Λ and p are one
    * fixed double chain micro-snapped BEFORE the running min, so the
    * monotone p-path replays exactly in SQL. Days where either arm is
    * still empty (or V = 0) report NULL ln Λ and p = 1. Output per
    * day: `(day, n_a, x_a, n_b, x_b, ln_lambda_micro,
    * p_always_micro)`.
    */
  def msprtMonitor(df: DataFrame, isA: Column, success: Column,
      tsCol: Column, tau: Double = 0.0001): DataFrame = {
    require(tau > 0.0, s"tau must be positive, got $tau")
    import org.apache.spark.sql.expressions.Window
    val daily = df.select(
      floor(unix_timestamp(tsCol) / lit(86400L)).cast("long")
        .as("day"),
      isA.as("_a"), success.cast("long").as("_x"))
      .groupBy(col("day"))
      .agg(sum(when(col("_a"), 1L).otherwise(0L)).as("_dna"),
        sum(when(col("_a"), col("_x")).otherwise(0L)).as("_dxa"),
        sum(when(!col("_a"), 1L).otherwise(0L)).as("_dnb"),
        sum(when(!col("_a"), col("_x")).otherwise(0L)).as("_dxb"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = daily.select(col("day"),
      sum(col("_dna")).over(w).as("n_a"),
      sum(col("_dxa")).over(w).as("x_a"),
      sum(col("_dnb")).over(w).as("n_b"),
      sum(col("_dxb")).over(w).as("x_b"))
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val pool = (col("x_a") + col("x_b")).cast("double") / (na + nb)
    val v = pool * (lit(1.0) - pool) * (lit(1.0) / na + lit(1.0) / nb)
    val theta = col("x_a").cast("double") / na -
      col("x_b").cast("double") / nb
    val lnLam = lit(0.5) * log(v / (v + lit(tau))) +
      theta * theta * lit(tau) / (lit(2.0) * v * (v + lit(tau)))
    val degenerate = col("n_a") === 0L || col("n_b") === 0L ||
      col("x_a") + col("x_b") === 0L ||
      col("x_a") + col("x_b") === col("n_a") + col("n_b")
    val perDay = cum.select(col("day"), col("n_a"), col("x_a"),
      col("n_b"), col("x_b"),
      when(degenerate, lit(null).cast("long"))
        .otherwise(round(lnLam * lit(1000000.0)).cast("long"))
        .as("ln_lambda_micro"),
      when(degenerate, lit(1000000L))
        .otherwise(round(least(lit(1.0), exp(-lnLam)) *
          lit(1000000.0)).cast("long")).as("_pt"))
    perDay.select(col("day"), col("n_a"), col("x_a"), col("n_b"),
      col("x_b"), col("ln_lambda_micro"),
      min(col("_pt")).over(w).as("p_always_micro"))
  }

  /** Proportion effect size + per-arm Wilson intervals — the
    * magnitude readout beside [[twoProportionZ]]'s significance:
    * Cohen's h = 2·asin√p₁ − 2·asin√p₂ (Cohen 1988's
    * variance-stabilized difference; ±0.2/0.5/0.8 are the
    * conventional small/medium/large bands) and each arm's Wilson
    * score interval (Wilson 1927 — honest near 0/1 and at small n
    * where the Wald interval collapses). One aggregation pass, exact
    * integer cells, fixed asin/sqrt chains. Output (one row):
    * `(n_a, x_a, n_b, x_b, h_micro, lo_a_micro, hi_a_micro,
    * lo_b_micro, hi_b_micro)` — NULLs when an arm is empty.
    */
  def proportionEffect(df: DataFrame, isA: Column, success: Column)
      : DataFrame = {
    val m = df.select(isA.as("_a"), success.cast("long").as("_x"))
      .agg(sum(when(col("_a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(col("_a"), col("_x")).otherwise(0L)).as("x_a"),
        sum(when(!col("_a"), 1L).otherwise(0L)).as("n_b"),
        sum(when(!col("_a"), col("_x")).otherwise(0L)).as("x_b"))
    val z = 1.959964
    def p(x: Column, n: Column) = x.cast("double") / n.cast("double")
    def wilson(x: Column, n: Column, upper: Boolean): Column = {
      val nd = n.cast("double")
      val ph = p(x, n)
      val z2 = lit(z * z)
      val centre = ph + z2 / (lit(2.0) * nd)
      val spread = lit(z) * sqrt(ph * (lit(1.0) - ph) / nd +
        z2 / (lit(4.0) * nd * nd))
      val den = lit(1.0) + z2 / nd
      if (upper) (centre + spread) / den else (centre - spread) / den
    }
    val h = lit(2.0) * asin(sqrt(p(col("x_a"), col("n_a")))) -
      lit(2.0) * asin(sqrt(p(col("x_b"), col("n_b"))))
    def snap(c: Column) = round(c * lit(1000000.0)).cast("long")
    def ga(c: Column) = when(col("n_a") === 0L,
      lit(null).cast("long")).otherwise(snap(c))
    def gb(c: Column) = when(col("n_b") === 0L,
      lit(null).cast("long")).otherwise(snap(c))
    m.select(col("n_a"), col("x_a"), col("n_b"), col("x_b"),
      when(col("n_a") === 0L || col("n_b") === 0L,
        lit(null).cast("long")).otherwise(snap(h)).as("h_micro"),
      ga(wilson(col("x_a"), col("n_a"), upper = false))
        .as("lo_a_micro"),
      ga(wilson(col("x_a"), col("n_a"), upper = true)).as("hi_a_micro"),
      gb(wilson(col("x_b"), col("n_b"), upper = false))
        .as("lo_b_micro"),
      gb(wilson(col("x_b"), col("n_b"), upper = true)).as("hi_b_micro"))
  }

  def twoProportionZ(df: DataFrame, isA: Column, success: Column)
      : DataFrame = {
    val d = df.select(isA.as("_a"), success.cast("long").as("_x"))
    val m = d.agg(
      sum(when(col("_a"), 1L).otherwise(0L)).as("n_a"),
      sum(when(!col("_a"), 1L).otherwise(0L)).as("n_b"),
      sum(when(col("_a"), col("_x")).otherwise(0L)).as("x_a"),
      sum(when(!col("_a"), col("_x")).otherwise(0L)).as("x_b"))
    val (na, nb) = (col("n_a").cast("double"), col("n_b").cast("double"))
    val pa = col("x_a").cast("double") / na
    val pb = col("x_b").cast("double") / nb
    val pool = (col("x_a") + col("x_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    val z = (pa - pb) /
      sqrt(pool * (lit(1.0) - pool) * (lit(1.0) / na + lit(1.0) / nb))
    val se = sqrt(pa * (lit(1.0) - pa) / na +
      pb * (lit(1.0) - pb) / nb)
    val zCrit = lit(1.959964) // two-sided 95%
    val degenerate = col("n_a") === 0L || col("n_b") === 0L ||
      pool <= 0.0 || pool >= 1.0
    m.select(col("n_a"), col("n_b"), col("x_a"), col("x_b"),
      when(col("n_a") === 0L || col("n_b") === 0L,
          lit(null).cast("long"))
        .otherwise(round((pa - pb) * lit(1000000.0)).cast("long"))
        .as("diff_micro"),
      when(degenerate, lit(null).cast("long"))
        .otherwise(round(z * lit(1000000.0)).cast("long"))
        .as("z_micro"),
      when(degenerate, lit(null).cast("long"))
        .otherwise(round((pa - pb - zCrit * se) * lit(1000000.0))
          .cast("long")).as("lo_micro"),
      when(degenerate, lit(null).cast("long"))
        .otherwise(round((pa - pb + zCrit * se) * lit(1000000.0))
          .cast("long")).as("hi_micro"))
  }

  /** Cochran's Q test (1950) — [[mcNemar]]'s k-treatment
    * generalization: do k paired binary classifiers (or k filter
    * variants scored on the SAME items) differ at all?
    *
    *   Q = (k−1)·(k·ΣC_j² − N²) / (k·N − ΣR_i²)
    *
    * with C_j the per-treatment success counts, R_i the per-item
    * success counts, N the grand total — ALL exact integers off ONE
    * aggregation pass (R_i and R_i² fold per row in the scan stage),
    * so only the final ratio is a double. Output (one row):
    * `(n, k, q_micro)` — NULL when the denominator is 0 (every item
    * all-success or all-failure). Reduces to McNemar's χ² at k = 2.
    */
  def cochranQ(df: DataFrame, preds: Seq[Column]): DataFrame = {
    require(preds.size >= 2, s"need >= 2 treatments, got ${preds.size}")
    val k = preds.size
    val bits = preds.map(p => when(p, 1L).otherwise(0L))
    val r = bits.reduce(_ + _)
    val dec = "decimal(38,0)"
    val aggs = bits.zipWithIndex.map { case (b, j) =>
      sum(b).as(s"_c$j") } ++ Seq(
      count(lit(1)).as("n"), sum(r).as("_nn"),
      sum((r * r).cast(dec)).as("_r2"))
    val m = df.agg(aggs.head, aggs.tail: _*)
    val sumC2 = (0 until k).map(j =>
      col(s"_c$j").cast(dec) * col(s"_c$j")).reduce(_ + _)
    val num = lit(k - 1).cast(dec) *
      (lit(k) * sumC2 - col("_nn").cast(dec) * col("_nn"))
    val den = lit(k).cast(dec) * col("_nn") - col("_r2")
    m.select(col("n"), lit(k.toLong).as("k"),
      when(den <= 0, lit(null).cast("long"))
        .otherwise(round(num.cast("double") / den.cast("double") *
          lit(1000000.0)).cast("long")).as("q_micro"))
  }

  /** Friedman test (1937, tie-corrected general form) — the
    * rank-based k-treatment test on BLOCKED data ([[cochranQ]] for
    * graded scores instead of booleans, [[kruskalWallisH]] when the
    * samples aren't paired): each block ranks its k treatment values,
    * and
    *
    *   χ²_F = (k−1) · Σ_j (R2_j − n(k+1))² / (Σ r2² − n·k·(k+1)²)
    *
    * in DOUBLED ranks (tie-averaged ranks ×2 stay integers:
    * `r2 = 2·(1 + #less) + #equal-others`), so every moment is an
    * exact integer computed IN THE SCAN STAGE via k² pairwise column
    * compares — no window, no shuffle beyond the one fold; the
    * closing ratio is the only double. Output (one row):
    * `(n, k, chi2_micro)` — NULL when every block is fully tied.
    */
  def friedmanChi2(df: DataFrame, treatments: Seq[Column]): DataFrame = {
    val k = treatments.size
    require(k >= 2, s"need >= 2 treatments, got $k")
    val dec = "decimal(38,0)"
    val vs = treatments.zipWithIndex.map { case (t, j) =>
      t.cast("long").as(s"_v$j") }
    val d = df.select(vs: _*)
    val r2s = (0 until k).map { j =>
      val less = (0 until k).filter(_ != j).map(l =>
        when(col(s"_v$l") < col(s"_v$j"), 1L).otherwise(0L))
        .reduce(_ + _)
      val eq = (0 until k).filter(_ != j).map(l =>
        when(col(s"_v$l") === col(s"_v$j"), 1L).otherwise(0L))
        .reduce(_ + _)
      (lit(2L) * (lit(1L) + less) + eq).as(s"_r2$j")
    }
    val ranked = d.select(r2s: _*)
    val aggs = (0 until k).map(j =>
      sum(col(s"_r2$j")).as(s"_rs$j")) ++ Seq(
      count(lit(1)).as("n"),
      sum((0 until k).map(j =>
        (col(s"_r2$j") * col(s"_r2$j")).cast(dec)).reduce(_ + _))
        .as("_a4"))
    val m = ranked.agg(aggs.head, aggs.tail: _*)
    val sNum = (0 until k).map { j =>
      val dev = col(s"_rs$j").cast(dec) -
        col("n").cast(dec) * lit(k + 1)
      dev * dev
    }.reduce(_ + _)
    val den = col("_a4") -
      col("n").cast(dec) * lit(k) * lit((k + 1) * (k + 1))
    m.select(col("n"), lit(k.toLong).as("k"),
      when(den <= 0, lit(null).cast("long"))
        .otherwise(round(lit((k - 1).toDouble) *
          sNum.cast("double") / den.cast("double") *
          lit(1000000.0)).cast("long")).as("chi2_micro"))
  }

  /** Quantile normalization across groups (the expression-array
    * classic, Bolstad et al. 2003, in its reference-distribution
    * form): every group's value distribution maps onto the POOLED
    * distribution by rank — the preprocessing step that makes one
    * global quality threshold meaningful when each source's scorer
    * drifts (source A's 0.8 and source B's 0.3 may both be "top
    * decile"; after normalization they land on the same pooled
    * value).
    *
    * Method: each distinct `(group, value)` cell gets its group
    * MIDRANK fraction `f = (2·cumBefore + cnt) / (2·n_g)` (always in
    * (0,1)); the normalized value is the pooled distinct value whose
    * cumulative interval `[cb/N, (cb+cnt)/N)` contains f. Containment
    * is checked CROSS-MULTIPLIED, so the whole mapping is exact
    * integer arithmetic — no float ranks, hash-gates.
    *
    * Scale shape: rows reduce ONCE to the two distinct-value tables
    * (the chi-square bounded-value-space contract — snap/bucket
    * unbounded doubles first); the interval match is a range join
    * between those bounded tables (pooled side broadcast), never a
    * row-level window. Output: one row per (group, value) cell —
    * `(group, v, cnt, frac_micro, norm_v)`.
    */
  def quantileNormalize(df: DataFrame, groupCol: Column,
      valueInt: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = df.select(groupCol.as("_g"), valueInt.cast("long").as("_v"))
    val cells = d.groupBy(col("_g"), col("_v"))
      .agg(count(lit(1)).as("_cnt"))
      .persist() // group ranks + the pooled fold
    val wg = Window.partitionBy(col("_g")).orderBy(col("_v"))
    val ranked = cells.select(col("_g"), col("_v"), col("_cnt"),
      (sum(col("_cnt")).over(wg) - col("_cnt")).as("_cb"))
      .withColumn("_ng",
        sum(col("_cnt")).over(Window.partitionBy(col("_g"))))
    val pooledW = Window.orderBy(col("_v"))
    val pooled = cells.groupBy(col("_v"))
      .agg(sum(col("_cnt")).as("_pcnt"))
      .select(col("_v").as("_pv"), col("_pcnt"),
        (sum(col("_pcnt")).over(pooledW) - col("_pcnt")).as("_pcb"))
      .crossJoin(broadcast(cells.agg(sum(col("_cnt")).as("_n"))))
    // f ∈ [pcb/N, (pcb+pcnt)/N) ⇔ cross-multiplied BIGINT bounds.
    // The match is BANDED before it is exact: both sides carry a
    // coarse rank bucket (⌊f·B⌋ resp. the buckets an interval spans),
    // so the join is an EQUI join on the band and the containment
    // predicate only refines within it — without the band this is an
    // all-pairs nested loop over the two distinct-value tables, which
    // at cent-granular value spaces (100k² candidate pairs at sf0.1,
    // worse at scale) is the quadratic trap the banding removes.
    // Pooled intervals explode into ⌈width·B⌉+1 bands; Σ spans =
    // B + |pooled| — linear, never quadratic.
    val bands = 1024L
    val fNum = lit(2L) * col("_cb") + col("_cnt") // f = fNum/(2·n_g)
    val rankedB = ranked.withColumn("_band",
      expr(s"((2 * _cb + _cnt) * $bands) div (2 * _ng)"))
    val pooledB = pooled.withColumn("_band",
      explode(sequence(
        expr(s"(_pcb * $bands) div _n"),
        expr(s"((_pcb + _pcnt) * $bands) div _n"))))
    val joined = rankedB.join(broadcast(pooledB), Seq("_band"))
      .filter(
        col("_pcb") * 2L * col("_ng") <= fNum * col("_n") &&
          fNum * col("_n") < (col("_pcb") + col("_pcnt")) * 2L *
            col("_ng"))
    joined.select(col("_g").as("grp"), col("_v").as("v"),
      col("_cnt").as("cnt"),
      round(fNum.cast("double") / (lit(2.0) *
        col("_ng").cast("double")) * lit(1000000.0)).cast("long")
        .as("frac_micro"),
      col("_pv").as("norm_v"))
  }

  /** McNemar's test (1947) — the paired-classifier comparison: when
    * two models score the SAME items, accuracy deltas must be judged
    * on the DISCORDANT pairs only (`b` = A right & B wrong, `c` = the
    * reverse); χ² = (b−c)²/(b+c), plus Edwards' continuity-corrected
    * flavor (max(0,|b−c|−1))²/(b+c). The A/B gate for "is the new
    * quality filter actually better on the same eval set".
    *
    * One aggregation pass, exact integer counts, two fixed double
    * chains micro-snapped. Output (one row): `(n, b_only, c_only,
    * chi2_micro, chi2_cc_micro)` — NULL when b + c = 0 (no
    * discordant pairs).
    */
  def mcNemar(df: DataFrame, predA: Column, predB: Column,
      label: Column): DataFrame = {
    val okA = predA === label
    val okB = predB === label
    val m = df.agg(count(lit(1)).as("n"),
      sum(when(okA && !okB, 1L).otherwise(0L)).as("b_only"),
      sum(when(!okA && okB, 1L).otherwise(0L)).as("c_only"))
    val b = col("b_only")
    val c = col("c_only")
    val diff = (b - c).cast("double")
    val diffCc = greatest(abs(b - c) - 1L, lit(0L)).cast("double")
    val denom = (b + c).cast("double")
    m.select(col("n"), b, c,
      when(b + c === 0L, lit(null).cast("long"))
        .otherwise(round(diff * diff / denom * lit(1000000.0))
          .cast("long")).as("chi2_micro"),
      when(b + c === 0L, lit(null).cast("long"))
        .otherwise(round(diffCc * diffCc / denom * lit(1000000.0))
          .cast("long")).as("chi2_cc_micro"))
  }

  /** Kruskal-Wallis H test (1952) — the k-group rank analogue of
    * [[mannWhitneyU]] and the nonparametric fallback for [[anovaF]]
    * when normality is off the table:
    *
    *   H = 12/(N(N+1)) · Σ_g R_g²/n_g − 3(N+1)
    *
    * with the standard tie correction `H' = H / (1 − Σ(t³−t)/(N³−N))`.
    *
    * Scale + exactness discipline (the MWU shape): rows reduce ONCE to
    * the `(group, value)` cell grid; doubled average ranks come from
    * the DISTINCT-VALUE cumulative table (the only window — value
    * space, not rows); doubled rank sums R·2 stay exact decimals, the
    * per-group R²/(4n) term is ONE double division unit-snapped to a
    * BIGINT before the exact group sum; H and H' are one double chain.
    * Output (one row): `(k, n, h_micro, h_tie_micro)` — NULL when
    * degenerate (k < 2 or all values tied).
    */
  def kruskalWallisH(df: DataFrame, groupCol: Column, valueInt: Column)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val d = df.select(groupCol.as("_g"), valueInt.cast("long").as("_v"))
    val cells = d.groupBy(col("_g"), col("_v"))
      .agg(count(lit(1)).as("_cgv"))
      .persist() // value ranks + group folds both consume it
    val byVal = cells.groupBy(col("_v"))
      .agg(sum(col("_cgv")).as("_cnt"))
    val w = Window.orderBy(col("_v")) // distinct values, not rows
    val ranked = byVal.select(col("_v"),
      (lit(2L) * (sum(col("_cnt")).over(w) - col("_cnt")) +
        col("_cnt") + lit(1L)).as("_r2"),
      (col("_cnt").cast(dec) * col("_cnt") * col("_cnt") -
        col("_cnt")).as("_t3t"))
    val byGroup = cells.join(ranked, "_v")
      .groupBy(col("_g"))
      .agg(sum(col("_cgv")).as("_ng"),
        sum(col("_cgv").cast(dec) * col("_r2").cast(dec)).as("_rg2"))
    // R_g²/n_g = R2_g²/(4·n_g): one double division, unit-snapped
    val termUnit = round(col("_rg2").cast("double") *
      col("_rg2").cast("double") /
      (lit(4.0) * col("_ng").cast("double"))).cast("long")
    val gm = byGroup.agg(count(lit(1)).as("k"), sum(col("_ng")).as("n"),
      sum(termUnit).as("_rsum"))
    val ties = ranked.agg(coalesce(sum(col("_t3t")),
      lit(0).cast(dec)).as("_ties"), count(lit(1)).as("_nvals"))
    val m = gm.crossJoin(broadcast(ties))
    val nD = col("n").cast("double")
    val h = lit(12.0) / (nD * (nD + 1.0)) *
      col("_rsum").cast("double") - lit(3.0) * (nD + 1.0)
    val corr = lit(1.0) - col("_ties").cast("double") /
      (nD * nD * nD - nD)
    val degenerate = col("k") < 2L || col("_nvals") <= 1L ||
      col("n") < 2L
    m.select(col("k"), col("n"),
      when(degenerate, lit(null).cast("long"))
        .otherwise(round(h * lit(1000000.0)).cast("long"))
        .as("h_micro"),
      when(degenerate, lit(null).cast("long"))
        .otherwise(round(h / corr * lit(1000000.0)).cast("long"))
        .as("h_tie_micro"))
  }

  /** Levene homogeneity-of-variance test (Levene 1960, mean-centered
    * flavor) — the pre-check ANOVA's equal-variance assumption needs:
    * W is [[anovaF]]'s F statistic computed on the absolute
    * deviations `z = |x − x̄_g|` from each group's own mean.
    *
    * Exactness discipline: group means micro-snap off the bounded
    * per-group moment table (ONE division each), broadcast back to
    * rows, and z re-snaps to whole value units via exact integer ops
    * (`|x·1e6 − m_micro| // 1e6` — floor = trunc since z ≥ 0), so the
    * second ANOVA pass sees exact integers and the W chain replays
    * bit-identically in the oracle. Output (one row): `(k, n,
    * w_micro)` plus the z-scale SS decomposition.
    */
  def leveneW(df: DataFrame, groupCol: Column, valueInt: Column)
      : DataFrame = {
    val d = df.select(groupCol.as("_lg"), valueInt.cast("long").as("_lv"))
    val means = d.groupBy(col("_lg"))
      .agg(round(sum(col("_lv")).cast("double") /
        count(lit(1)).cast("double") * lit(1000000.0)).cast("long")
        .as("_m_micro"))
    val z = d.join(broadcast(means), "_lg")
      .select(col("_lg"),
        ((abs(col("_lv") * 1000000L - col("_m_micro"))) / 1000000L)
          .cast("long").as("_z"))
    anovaF(z, col("_lg"), col("_z"))
      .select(col("k"), col("n"), col("ssb_milli"), col("ssw_milli"),
        col("f_micro").as("w_micro"))
  }
}
