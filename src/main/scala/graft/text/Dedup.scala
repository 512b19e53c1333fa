package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines over a `documents`
  * table: exact (content-hash groupBy), MinHash + banded LSH near-dup
  * (bucketed — NEVER all-pairs), SimHash, and exact n-gram Jaccard for
  * candidate verification.
  *
  * Scale shape: exact dedup is one hash aggregation (map-side partial) on a
  * 64-hex key — no wide rows move, only (hash, id, count). LSH banding
  * turns the O(n²) near-dup problem into `bands` hash-joins on bucket ids:
  * each doc appears in `bands` buckets, candidate pairs only form inside a
  * bucket, and the per-bucket fan-out is bounded by real collision rates,
  * not corpus size. At 100 TB the bucket join is the only shuffle and it
  * carries (id, band, bucket) triples, not text.
  */
object Dedup {

  /** Exact dedup via content hash: one surviving (minimal) id per distinct
    * normalized text, with the duplicate count. sha2-256 collision-safe at
    * any corpus size; grouping by the hash, not the text, keeps shuffle
    * rows narrow.
    */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(sha2(col(textCol), 256).as("text_hash"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_dups"))

  /** Row-level exact dedup (keeps an arbitrary row per key) — the cheap
    * `dropDuplicates` path when survivor choice does not matter.
    */
  def exactRows(df: DataFrame, cols: Seq[String]): DataFrame =
    df.dropDuplicates(cols)

  /** Per-band bucket ids from a MinHash signature: the signature is cut
    * into `bands` rows of `rowsPerBand`, each hashed (md5 of the
    * comma-joined row — portable) into a bucket id.
    */
  def bucketArray(sigCol: Column, bands: Int, rowsPerBand: Int): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      b => md5(concat_ws(",",
        transform(slice(sigCol, b * rowsPerBand + 1, lit(rowsPerBand)),
          _.cast("string")))))

  /** (id, band, bucket) bucket assignments from a MinHash signature. */
  def lshBuckets(
      df: DataFrame, idCol: String, sigCol: String,
      bands: Int, rowsPerBand: Int): DataFrame =
    df.select(col(idCol),
      posexplode(bucketArray(col(sigCol), bands, rowsPerBand))
        .as(Seq("band", "bucket")))

  /** Candidate near-dup pairs: ids sharing any (band, bucket). Equi-join
    * on the bucket key — the LSH trick that avoids all-pairs.
    */
  def candidatePairs(buckets: DataFrame, idCol: String): DataFrame = {
    val a = buckets.select(col("band"), col("bucket"), col(idCol).as("id_a"))
    val b = buckets.select(col("band"), col("bucket"), col(idCol).as("id_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Estimated Jaccard from two equal-length MinHash signatures: the
    * fraction of agreeing positions.
    */
  def estJaccard(sigA: Column, sigB: Column): Column =
    size(filter(zip_with(sigA, sigB, (x, y) => x === y), b => b))
      .cast("double") / size(sigA)

  /** Exact Jaccard over two token/shingle arrays (for verifying LSH
    * candidates — run only on the candidate pairs, never all-pairs).
    * Two empty sets score 0.0 (total function — no divide-by-zero under
    * ANSI mode; empty docs collide in every LSH band, so the pair DOES
    * occur in practice).
    */
  def jaccard(a: Column, b: Column): Column = {
    val da = array_distinct(a)
    val db = array_distinct(b)
    size(array_intersect(da, db)).cast("double") /
      greatest(size(array_union(da, db)), lit(1))
  }

  /** One-call exact dedup: keep the minimal-id row per distinct text.
    * The survivor set (hash → min id) is an aggregation on narrow rows;
    * the keep-join is a broadcast semi-join when the survivor set fits,
    * a shuffled semi-join otherwise (left to AQE).
    */
  def dedupExact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.join(
      exact(df, textCol, idCol).select(idCol),
      Seq(idCol), "left_semi")

  /** One-call near-dedup: MinHash-LSH pairs → connected components →
    * keep one (minimal-id) survivor per cluster. Returns the surviving
    * rows of `df` unchanged. Composes [[nearDupPairs]] +
    * [[clusterLabels]]; see those for the scale shapes.
    */
  def dedupNear(
      df: DataFrame, textCol: String, idCol: String,
      shingleK: Int = 3, bands: Int = 8, rowsPerBand: Int = 4,
      threshold: Double = 0.5,
      tokenizer: Column => Column = TextOps.tokens,
      maxIter: Int = 20): DataFrame = {
    val pairs = nearDupPairs(df, textCol, idCol, shingleK, bands,
      rowsPerBand, threshold, tokenizer)
    val clusters = clusterLabels(df.select(col(idCol)), pairs, maxIter)
    df.join(
      clusters.filter(col("id") === col("cluster"))
        .select(col("id").as(idCol)),
      Seq(idCol), "left_semi")
  }

  /** Streaming near-dedup of incoming documents AGAINST A STATIC
    * reference corpus (the incremental-corpus-extension shape: new
    * crawl drops arrive as a stream, the existing lake is the index).
    * The reference compacts to one row per doc — signature + its
    * `bands` bucket ids, prefixed band-wise so cross-band collisions
    * cannot match — and broadcasts; each micro-batch signs its docs
    * and LEFT-ANTI joins on "any shared bucket AND est-Jaccard ≥
    * threshold". Stream-left anti joins against a static right are
    * fully supported and STATELESS — no state store, no watermark.
    * Returns the kept stream rows unchanged.
    *
    * Scale shape: the match is a broadcast nested-loop per micro-batch
    * (the bucket-overlap condition is non-equi), so the reference index
    * must fit in a broadcast — signatures + buckets are ~300 bytes/doc,
    * millions of reference docs per executor-GB. Stream-static joins
    * re-execute the static side EVERY micro-batch: persist the
    * reference (cache it, or better, write the signed index to parquet
    * once and pass that) so each batch pays a read, not a full
    * re-shingle+re-sign of the reference corpus. For lake-scale
    * references run the batch [[dedupNear]]-style equi-join inside
    * `foreachBatch` instead (a micro-batch is a batch); stream-vs-
    * stream duplicates are likewise a `foreachBatch` problem.
    */
  def dedupNearAgainstStream(
      stream: DataFrame, reference: DataFrame,
      textCol: String, idCol: String,
      shingleK: Int = 3, bands: Int = 8, rowsPerBand: Int = 4,
      threshold: Double = 0.5,
      tokenizer: Column => Column = TextOps.tokens): DataFrame = {
    val numHashes = bands * rowsPerBand
    def bandedBuckets(sigCol: Column): Column =
      zip_with(
        sequence(lit(0), lit(bands - 1)),
        bucketArray(sigCol, bands, rowsPerBand),
        (b, h) => concat_ws(":", b, h))
    def sign(df: DataFrame): DataFrame = df
      .withColumn("_toks", tokenizer(col(textCol)))
      .withColumn("_sh", TextOps.shingles(col("_toks"), shingleK))
      .withColumn("_sig", TextOps.minhashSig(col("_sh"), numHashes))
      .withColumn("_buckets", bandedBuckets(col("_sig")))
      .drop("_toks", "_sh")
    val refDocs = sign(reference).select(
      col("_sig").as("_ref_sig"), col("_buckets").as("_ref_buckets"))
    val cond =
      arrays_overlap(col("_buckets"), col("_ref_buckets")) &&
        estJaccard(col("_sig"), col("_ref_sig")) >= threshold
    sign(stream)
      .join(broadcast(refDocs), cond, "left_anti")
      .drop("_sig", "_buckets")
  }

  /** Benchmark decontamination (the GPT-3-style filter): drop every
    * training doc that shares ANY word k-gram with the evaluation
    * corpus. Returns the kept training rows unchanged.
    *
    * Scale shape: benchmarks are tiny next to training corpora, so the
    * distinct eval k-gram set usually broadcasts and contamination
    * detection is a map-side hash probe of exploded training grams. The
    * joins carry no hints: AQE picks broadcast when the eval-gram /
    * contaminated-id sets fit and degrades to a shuffled join when a
    * large eval corpus would otherwise blow the broadcast limit —
    * a hard-coded hint would turn that case into a job failure.
    */
  def decontaminate(
      train: DataFrame, evalSet: DataFrame, textCol: String, idCol: String,
      k: Int = 13,
      tokenizer: Column => Column = TextOps.tokens): DataFrame = {
    def grams(df: DataFrame, keep: Seq[Column]): DataFrame = df
      .select(keep :+ tokenizer(col(textCol)).as("_t"): _*)
      .select(keep :+ explode(TextOps.shingles(col("_t"), k)).as("gram"): _*)
    val evalGrams = grams(evalSet, Nil).distinct()
    val contaminated = grams(train, Seq(col(idCol)))
      .join(evalGrams, "gram")
      .select(idCol).distinct()
    train.join(contaminated, Seq(idCol), "left_anti")
  }

  /** Near-dup CLUSTERS from pairwise matches: connected components via
    * min-label propagation WITH pointer jumping. Each round every node
    * adopts the minimum of (its label, its neighbors' labels), then
    * additionally the label OF that label — path lengths halve per
    * round, so convergence is O(log diameter) and `maxIter` rounds
    * (including the final confirming quiet round) cover diameters to
    * ~2^(maxIter-1). Non-convergence within `maxIter` fails loudly —
    * silently returning split clusters would make dedup keep extra
    * "survivors".
    *
    * Scale shape: each round is one edge equi-join + one
    * min-aggregation + one (id-keyed, label-sized) jump join — all
    * shuffling ids only; `localCheckpoint` truncates lineage so round
    * N's plan does not replay rounds 1..N-1. Near-dup graphs are
    * near-cliques (diameter 2-4), where the jump join buys little — it
    * is insurance against pathological long chains, which would
    * otherwise need diameter rounds and then fail the convergence check.
    *
    * Output: (id, cluster) for every id in `ids` — singletons keep their
    * own id as the cluster label; the label is the minimal member id.
    */
  def clusterLabels(
      ids: DataFrame, pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    require(maxIter > 0, "maxIter must be positive")
    // materialize the edge list once — every propagation round joins it,
    // and without the checkpoint each round would replay the (expensive)
    // pair-generation pipeline feeding `pairs`
    val edges = pairs
      .select(col("id_a").as("s"), col("id_b").as("t"))
      .union(pairs.select(col("id_b").as("s"), col("id_a").as("t")))
      .distinct()
      .localCheckpoint()
    // identity labels need no checkpoint: their lineage is one scan, and
    // round 1's own checkpoint truncates it — one fewer job up front
    var labels = ids
      .select(col(ids.columns.head).as("id"),
        col(ids.columns.head).as("cluster"))
    var i = 0
    var converged = false
    while (!converged && i < maxIter) {
      val nbrMin = edges
        .join(labels.select(col("id").as("t"), col("cluster").as("nc")), "t")
        .groupBy(col("s").as("id"))
        .agg(min("nc").as("nmin"))
      val stepped = labels
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("cluster").as("_prev"),
          least(col("cluster"), coalesce(col("nmin"), col("cluster")))
            .as("_c1"))
      // pointer jump: also adopt the label OF our label. Every _c1 is a
      // node id present in labels and cluster(x) <= x is invariant, so
      // _jc resolves and is <= _c1; the coalesce is belt-and-braces for
      // the (impossible) miss. The changed flag rides along in the SAME
      // pass, so convergence detection is a limit-1 probe of the
      // checkpointed round.
      val next = stepped
        .join(labels.select(col("id").as("_c1"), col("cluster").as("_jc")),
          Seq("_c1"), "left")
        .withColumn("_next", coalesce(col("_jc"), col("_c1")))
        .select(col("id"), col("_next").as("cluster"),
          (col("_next") < col("_prev")).as("_chg"))
        .localCheckpoint()
      converged = next.filter(col("_chg")).isEmpty
      labels = next.drop("_chg")
      i += 1
    }
    // silent non-convergence would return multiple labels per component
    // (dedup would keep extra "survivors") — fail loudly instead
    require(converged,
      s"clusterLabels did not converge within $maxIter rounds")
    labels
  }

  /** End-to-end MinHash-LSH near-dup pairs over a text column: shingle →
    * sign → band → bucket-join → signature-verify at `threshold`.
    * `numHashes = bands * rowsPerBand`. `tokenizer` defaults to the
    * production whitespace split; gate queries pass
    * [[TextOps.tokensSimple]] so a SQL oracle can replay the split.
    */
  def nearDupPairs(
      df: DataFrame, textCol: String, idCol: String,
      shingleK: Int = 3, bands: Int = 8, rowsPerBand: Int = 4,
      threshold: Double = 0.5,
      tokenizer: Column => Column = TextOps.tokens): DataFrame = {
    val numHashes = bands * rowsPerBand
    // staged projections so tokens/shingles materialize once per row —
    // nesting them into one expression would re-split the text inside the
    // shingle lambda for every element
    val signed = df
      .select(col(idCol), tokenizer(col(textCol)).as("_toks"))
      .select(col(idCol), TextOps.shingles(col("_toks"), shingleK).as("_sh"))
      .select(col(idCol), TextOps.minhashSig(col("_sh"), numHashes).as("sig"))
    // carry the signature through the bucket self-join: the signature
    // pipeline computes ONCE (joining signatures back onto the candidate
    // pairs would re-run shingle+minhash twice more); the sig rides the
    // bucket shuffle at `bands` copies per doc — a few hundred bytes
    // against two whole extra corpus-scan subtrees
    val bucketed = signed.select(col(idCol), col("sig"),
      posexplode(bucketArray(col("sig"), bands, rowsPerBand))
        .as(Seq("band", "bucket")))
    val a = bucketed.select(col("band"), col("bucket"),
      col(idCol).as("id_a"), col("sig").as("sig_a"))
    val b = bucketed.select(col("band"), col("bucket"),
      col(idCol).as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b"))
      .distinct() // collapse multi-band collisions (sigs are id-determined)
      .withColumn("est_jaccard", round(estJaccard(col("sig_a"), col("sig_b")), 6))
      .filter(col("est_jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("est_jaccard"))
  }
}
