package graft

import org.apache.spark.sql.functions._
import graft.operators.Diagnose
import graft.text.{Bm25, Dedup, TextOps}

/** BM25 retrieval, FIM splitting, group-similarity, key-skew and
  * per-group boilerplate — the round-7 retrieval/observability family.
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the rust memory safety borrow checker"),
    (2L, "the spark shuffle join optimizer spark spark"),
    (3L, "the spark streaming watermark"),
    (4L, "the the the the the the the the the the spark"),
    (5L, "the cooking pasta with garlic and oil")).toDF("doc_id", "text")

  test("bm25: tf raises, rarity raises, and length normalizes scores") {
    val queries = Seq((1L, "spark")).toDF("query_id", "term")
    val hits = Bm25.search(corpus, "text", "doc_id", queries, "query_id")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("rank"), r.getAs[Long]("score_pico"))).toMap
    // docs 2,3,4 match; 2 has tf=3 in 6 tokens -> top; 4 has tf=1 in
    // 11 tokens -> the length penalty puts it below 3 (tf=1, 3 tokens)
    assert(hits.keySet == Set(2L, 3L, 4L))
    assert(hits(2L)._1 == 1 && hits(3L)._1 == 2 && hits(4L)._1 == 3)
    assert(hits(2L)._2 > hits(3L)._2 && hits(3L)._2 > hits(4L)._2)
  }

  test("bm25: rare terms outscore stopword-common terms; absent query " +
    "terms are ignored; k caps the result") {
    val queries = Seq(
      (1L, "borrow"), (1L, "the"),   // rare + common
      (2L, "zzz_absent")).toDF("query_id", "term")
    val out = Bm25.search(corpus, "text", "doc_id", queries, "query_id")
    val byQ = out.collect().groupBy(_.getAs[Long]("query_id"))
    // q2's only term misses the vocabulary entirely -> no rows
    assert(!byQ.contains(2L))
    // rare 'borrow' (doc 1) must outrank the 'the'-matching docs
    val q1 = byQ(1L).sortBy(_.getAs[Int]("rank"))
    assert(q1.head.getAs[Long]("doc_id") == 1L)
    val capped = Bm25.search(corpus, "text", "doc_id",
      Seq((9L, "spark")).toDF("query_id", "term"), "query_id", k = 2)
    assert(capped.count() == 2)
  }

  test("bm25: a persisted index serves identically to one-shot search") {
    val dir = tmpDir("bm25-ix")
    Bm25.buildIndex(corpus, "text", "doc_id").write
      .mode("overwrite").parquet(dir)
    val queries = Seq((1L, "spark"), (1L, "pasta"))
      .toDF("query_id", "term")
    val fromIndex = Bm25.topK(spark.read.parquet(dir), queries,
      "query_id", "doc_id").collect().toSet
    val oneShot = Bm25.search(corpus, "text", "doc_id", queries,
      "query_id").collect().toSet
    assert(fromIndex == oneShot && fromIndex.nonEmpty)
  }

  test("bm25 index lifecycle: write+append serves identically to " +
    "one-shot over the union; reads prune to the query buckets") {
    val dir = s"${tmpDir("bm25-life")}/idx"
    Bm25.writeBm25Index(corpus.filter(col("doc_id") <= 2), "text",
      "doc_id", dir, buckets = 8)
    Bm25.appendToBm25Index(corpus.filter(col("doc_id") > 2), "text",
      "doc_id", dir)
    val queries = Seq((1L, "spark"), (1L, "pasta"), (2L, "borrow"))
      .toDF("query_id", "term")
    val served = Bm25.topKFromIndex(spark, dir, queries, "query_id",
      "doc_id")
    val oneShot = Bm25.search(corpus, "text", "doc_id", queries,
      "query_id").collect().toSet
    assert(served.collect().toSet == oneShot && oneShot.nonEmpty)
    // the postings scan carries the bucket partition filter — a
    // 3-term query reads its buckets, not the index
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      plan.take(2000))
    // appends froze the fan-out: meta still says 8
    assert(spark.read.parquet(s"$dir/meta").head().getInt(0) == 8)
    // the append landed as a marker-committed segment: the live stats
    // dir keeps the creation row, the append's delta is its own
    // write-once batch, and they sum to the corpus
    assert(spark.read.parquet(s"$dir/stats").count() == 1L)
    assert(spark.read.parquet(s"$dir/stats_deltas/batch=2")
      .head().getLong(0) == 3L)
    assert(new java.io.File(s"$dir/postings_batches/batch=2")
      .isDirectory)
    assert(Bm25.indexStats(spark, dir).head().getLong(0) == 5L)
    // creation committed snapshot gen 1, the append gen 2; with the
    // default retain=1 only the ruling snapshot stays readable
    assert(Bm25.bm25Generations(spark, dir) == Seq(2L))
    // time travel: append with retain=2 keeps the pre-append snapshot
    // addressable — serving atGen replays the OLD corpus exactly
    val dir2 = s"${tmpDir("bm25-tt")}/idx"
    Bm25.writeBm25Index(corpus.filter(col("doc_id") <= 2), "text",
      "doc_id", dir2, buckets = 8)
    Bm25.appendToBm25Index(corpus.filter(col("doc_id") > 2), "text",
      "doc_id", dir2, retain = 2)
    assert(Bm25.bm25Generations(spark, dir2) == Seq(1L, 2L))
    val atOld = Bm25.topKFromIndex(spark, dir2, queries, "query_id",
      "doc_id", atGen = Some(1L)).collect().toSet
    val overOld = Bm25.search(corpus.filter(col("doc_id") <= 2),
      "text", "doc_id", queries, "query_id").collect().toSet
    assert(atOld == overOld && atOld != oneShot)
  }

  test("retention policy persists in the marker: create with " +
    "retain=3, later DEFAULT-retain lifecycle calls keep the window") {
    val dir = s"${tmpDir("bm25-ret")}/idx"
    Bm25.writeBm25Index(corpus.filter(col("doc_id") <= 2), "text",
      "doc_id", dir, buckets = 8, retain = 3)
    // two appends and a delete, all with the DEFAULT retain — the old
    // per-call minimum semantics would have collapsed the window to 1
    // at the first call
    Bm25.appendToBm25Index(corpus.filter(col("doc_id") === 3), "text",
      "doc_id", dir)
    Bm25.appendToBm25Index(corpus.filter(col("doc_id") > 3), "text",
      "doc_id", dir)
    assert(Bm25.bm25Generations(spark, dir) == Seq(1L, 2L, 3L))
    // the create-time snapshot still serves
    val queries = Seq((1L, "spark"), (2L, "the"))
      .toDF("query_id", "term")
    val atCreate = Bm25.topKFromIndex(spark, dir, queries, "query_id",
      "doc_id", atGen = Some(1L)).collect().toSet
    val overFirstTwo = Bm25.search(
      corpus.filter(col("doc_id") <= 2), "text", "doc_id", queries,
      "query_id").collect().toSet
    assert(atCreate == overFirstTwo && atCreate.nonEmpty)
    Bm25.deleteFromBm25Index(Seq(3L).toDF("doc_id"), dir, "doc_id")
    assert(Bm25.bm25Generations(spark, dir) == Seq(2L, 3L, 4L))
    // compaction carries the persisted window forward too
    Bm25.compactBm25Index(spark, dir, "doc_id")
    assert(Bm25.bm25Generations(spark, dir).size == 3)
    // and a lifecycle call may RAISE the window for later callers
    Bm25.deleteFromBm25Index(Seq(4L).toDF("doc_id"), dir, "doc_id",
      retain = 4)
    Bm25.appendToBm25Index(corpus.filter(col("doc_id") === 3), "text",
      "doc_id", dir)
    assert(Bm25.bm25Generations(spark, dir).size == 4)
  }

  test("bm25 append of a token-empty batch writes NO segment, still " +
    "records the applied stream batch id, and never bricks the index") {
    val dir = s"${tmpDir("bm25-empty")}/idx"
    Bm25.writeBm25Index(corpus, "text", "doc_id", dir, buckets = 8)
    // non-empty doc frame whose texts tokenize to zero terms (null
    // text: explode drops the row) — the StreamingBm25 batch.isEmpty
    // guard does NOT catch this shape
    val blank = Seq((99L, Option.empty[String]),
      (100L, Option.empty[String])).toDF("doc_id", "text")
    Bm25.appendToBm25Index(blank, "text", "doc_id", dir,
      appliedId = 7L)
    // no part-less postings_batches/batch dir was committed
    val bdir = new java.io.File(s"$dir/postings_batches")
    assert(!bdir.exists || bdir.listFiles().isEmpty)
    // the applied fact committed atomically (exactly-once holds)
    assert(Bm25.lastAppliedStreamBatch(spark, dir) == 7L)
    // every read path still works — the old zero-row segment write
    // made all of these throw "unable to infer schema"
    assert(Bm25.bm25IndexIds(spark, dir, "doc_id").count() == 5L)
    val queries = Seq((1L, "spark")).toDF("query_id", "term")
    assert(Bm25.topKFromIndex(spark, dir, queries, "query_id",
      "doc_id").count() > 0)
    assert(Bm25.indexStats(spark, dir).head().getLong(0) == 5L)
    // a NON-stream empty append (appliedId = -1) is a pure no-op:
    // no new marker generation at all
    val gensBefore = Bm25.bm25Generations(spark, dir)
    Bm25.appendToBm25Index(blank, "text", "doc_id", dir)
    assert(Bm25.bm25Generations(spark, dir) == gensBefore)
  }

  test("bm25 index deletes: tombstoned docs never surface, idf/avgdl " +
    "track survivors, double-delete is a stats no-op, compaction " +
    "serves identically and reclaims the tree") {
    val dir = s"${tmpDir("bm25-del")}/idx"
    Bm25.writeBm25Index(corpus, "text", "doc_id", dir, buckets = 8)
    val queries = Seq((1L, "spark"), (2L, "the")).toDF("query_id", "term")
    val dead = Seq(2L, 4L).toDF("doc_id")
    Bm25.deleteFromBm25Index(dead, dir, "doc_id")
    val served = Bm25.topKFromIndex(spark, dir, queries, "query_id",
      "doc_id").collect()
    assert(!served.exists(r => Set(2L, 4L)(r.getAs[Long]("doc_id"))))
    // scores equal in-memory BM25 over the SURVIVING corpus (idf and
    // avgdl must shift with the deletes, not just the candidate set)
    val survivors = corpus.filter(!col("doc_id").isin(2L, 4L))
    val oneShot = Bm25.search(survivors, "text", "doc_id", queries,
      "query_id").collect().toSet
    assert(served.toSet == oneShot && oneShot.nonEmpty)
    // deleting the same ids again adds a ZERO delta (live postings
    // already exclude them) — stats stay correct
    Bm25.deleteFromBm25Index(dead, dir, "doc_id")
    val st = Bm25.indexStats(spark, dir)
    assert(st.head().getLong(0) == 3L, // 5 − 2
      st.collect().mkString(";"))
    // compaction: identical serving, single re-based stats row in a
    // fresh marker-committed generation, no batch state left behind
    Bm25.compactBm25Index(spark, dir, "doc_id")
    val after = Bm25.topKFromIndex(spark, dir, queries, "query_id",
      "doc_id").collect().toSet
    assert(after == oneShot)
    assert(Bm25.indexStats(spark, dir).head().getLong(0) == 3L)
    // gens: create=1, delete=2, no-op delete=3, compact=4
    assert(spark.read.parquet(s"$dir/postings_gen=4").count() > 0L)
    assert(spark.read.parquet(s"$dir/stats_gen=4").count() == 1L)
    assert(!new java.io.File(s"$dir/postings").exists())
    assert(!new java.io.File(s"$dir/tombstones").exists())
    assert(!new java.io.File(s"$dir/stats_deltas").exists())
  }

  test("bm25 index rebuild at a tombstoned path starts clean: no " +
    "stale lifecycle state survives writeBm25Index") {
    val dir = s"${tmpDir("bm25-rebuild")}/idx"
    Bm25.writeBm25Index(corpus, "text", "doc_id", dir, buckets = 8)
    Bm25.deleteFromBm25Index(Seq(1L).toDF("doc_id"), dir, "doc_id")
    // the rebuild overwrites the WHOLE tree — a surviving tombstone
    // batch or _live marker would silently anti-join doc 1 out of
    // the fresh index (the round-12 ADVICE regression)
    Bm25.writeBm25Index(corpus, "text", "doc_id", dir, buckets = 8)
    val queries = Seq((1L, "spark")).toDF("query_id", "term")
    val served = Bm25.topKFromIndex(spark, dir, queries, "query_id",
      "doc_id")
    val oneShot = Bm25.search(corpus, "text", "doc_id", queries,
      "query_id").collect().toSet
    assert(served.collect().toSet == oneShot && oneShot.nonEmpty)
    assert(Bm25.indexStats(spark, dir).head().getLong(0) == 5L)
  }

  test("persisted hybrid: RRF over the BM25 + ANN index artifacts is " +
    "row-identical to the same legs computed in memory") {
    import graft.sim.SimSearch
    val bmDir = s"${tmpDir("hyb-bm")}/idx"
    val annDir = s"${tmpDir("hyb-ann")}/idx"
    Bm25.writeBm25Index(corpus, "text", "doc_id", bmDir, buckets = 8)
    val emb = (0L until 12L).map(i => (i, Array.tabulate(8)(d =>
      (((i * 7 + d * 3) % 11).toFloat - 5.0f) / 3.0f)))
      .toDF("vec_id", "embedding")
    SimSearch.writeAnnIndex(emb, annDir, "vec_id", "embedding",
      planes = 4, dim = 8)
    val queries = Seq((1L, "spark"), (2L, "pasta"))
      .toDF("query_id", "term")
    def legs(bm: org.apache.spark.sql.DataFrame,
        cos: org.apache.spark.sql.DataFrame) =
      SimSearch.rrfFuse(Seq(
        bm.select(col("query_id").as("qid"), col("doc_id").as("id"),
          col("rank")),
        cos.select(col("qid"), col("neighbor").as("id"),
          (col("rank") + 1).as("rank"))), k = 10)
        .collect().toSet
    val qEmb = emb.filter(col("vec_id").isin(1L, 2L))
    val persisted = legs(
      Bm25.topKFromIndex(spark, bmDir, queries, "query_id", "doc_id"),
      SimSearch.annTopKFromIndex(SimSearch.readAnnIndex(spark, annDir),
        qEmb, "vec_id", "embedding", k = 10, planes = 4, dim = 8))
    val inMemory = legs(
      Bm25.search(corpus, "text", "doc_id", queries, "query_id"),
      SimSearch.annTopK(emb, "vec_id", "embedding",
        col("vec_id").isin(1L, 2L), k = 10, planes = 4, dim = 8))
    assert(persisted == inMemory && persisted.nonEmpty)
  }

  test("fimSplit: prefix+middle+suffix reassemble every doc; cuts are " +
    "deterministic per seed and move with it") {
    val out = TextOps.fimSplit(corpus, "text", "doc_id", seed = 17L)
    // empty prefix/middle/suffix parts add stray separators, so
    // compare empty-filtered token arrays rather than raw strings
    val bad = out.join(corpus, Seq("doc_id"))
      .filter(filter(split(concat_ws(" ", col("prefix"), col("middle"),
          col("suffix")), " "), t => t =!= "") =!=
        split(col("text"), " "))
      .count()
    assert(bad == 0)
    val again = TextOps.fimSplit(corpus, "text", "doc_id", seed = 17L)
    assert(out.collect().toSet == again.collect().toSet)
    val other = TextOps.fimSplit(corpus, "text", "doc_id", seed = 18L)
    assert(out.select("doc_id", "n_prefix", "n_middle").collect().toSet !=
      other.select("doc_id", "n_prefix", "n_middle").collect().toSet)
    // bounds: 0 <= n_prefix, n_prefix + n_middle <= n_tokens
    assert(out.filter(col("n_prefix") < 0 ||
      col("n_prefix") + col("n_middle") > col("n_tokens")).count() == 0)
  }

  test("groupSimilarity: identical groups read 1.0, disjoint ~0") {
    val g = Seq(
      ("a", "one two three four five six seven"),
      ("a", "alpha beta gamma delta epsilon zeta"),
      ("b", "one two three four five six seven"),
      ("b", "alpha beta gamma delta epsilon zeta"),
      ("c", "red orange yellow green blue indigo violet"))
      .toDF("src", "text")
    val sim = Dedup.groupSimilarity(g, "text", "src")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Double]("est_jaccard")).toMap
    assert(sim(("a", "b")) == 1.0)
    assert(sim(("a", "c")) < 0.2 && sim(("b", "c")) < 0.2)
  }

  test("keySkew: ordered heavy hitters with exact shares, ties by key") {
    val df = (Seq.fill(6)("w") ++ Seq.fill(2)("x") ++ Seq.fill(2)("m") ++
      Seq("z")).toDF("k")
    val rows = Diagnose.keySkew(df, "k", topK = 3).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("w", "m", "x"))
    assert(rows.map(_.getAs[Long]("n_rows")).toSeq == Seq(6L, 2L, 2L))
    assert(math.abs(rows.head.getAs[Double]("share") - 0.545455) < 1e-9)
    assert(rows.forall(_.getAs[Long]("total_rows") == 11L))
  }

  test("dedupLinesPerGroup: a line hot in one source survives in " +
    "another where it is rare") {
    val df = Seq(
      (1L, "s1", "promo | body one"),
      (2L, "s1", "promo | body two"),
      (3L, "s2", "promo | body three"))
      .toDF("doc_id", "source", "text")
    val out = Dedup.dedupLinesPerGroup(df, "text", "doc_id", "source",
      delimiter = " | ", maxDocs = 1)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("clean_text")).toMap
    // 'promo' repeats across docs 1,2 (same source) -> dropped there;
    // source s2 saw it once -> doc 3 keeps it
    assert(out(1L) == "body one" && out(2L) == "body two")
    assert(out(3L) == "promo | body three")
    // corpus-global dedup would have dropped it everywhere
    val global = Dedup.dedupLines(df, "text", "doc_id",
      delimiter = " | ", maxDocs = 2)
    assert(global.filter(col("doc_id") === 3L)
      .head().getAs[String]("clean_text") == "body three")
  }

  test("topTerms: rare terms outrank stopwords, ties break by term, " +
    "k caps per doc") {
    val df = Seq(
      (1L, "the the the rust borrow"),
      (2L, "the spark"),
      (3L, "the spark")).toDF("doc_id", "text")
    val got = TextOps.topTerms(df, "text", "doc_id", k = 2,
      TextOps.tokensSimple)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2))
      .toMap
    // doc 1: 'rust'/'borrow' are df=1 → tfidf 2.0 each; 'the' is df=3
    // at tf=3 → 3·4/4 = 3.0 — the raw-tf flavor keeps 'the' first,
    // then the df=1 pair ties and breaks alphabetically
    assert(got((1L, 0)) == "the")
    assert(got((1L, 1)) == "borrow")
    // docs 2/3: spark (df=2 → 4/3) outranks the (df=3 → 1.0)
    assert(got((2L, 0)) == "spark" && got((2L, 1)) == "the")
    // k caps: exactly 2 rows per doc
    assert(got.size == 6)
  }

  test("phraseSearch: consecutive-only matches, overlap counting, and " +
    "n-term chains") {
    val df = Seq(
      (1L, "a b c a b c"),       // "a b c" twice, "b c" twice
      (2L, "a c b"),             // has a,b,c but never the phrase
      (3L, "x a b y"),           // "a b" once at pos 2
      (4L, "a a a a")).toDF("doc_id", "text") // "a a" overlaps 3x
    val idx = Bm25.positionalIndex(df, "text", "doc_id")
    def got(phrase: Seq[String]) =
      Bm25.phraseSearch(idx, phrase, "doc_id").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("n_matches"), r.getAs[Int]("first_pos"))).toMap
    assert(got(Seq("a", "b")) ==
      Map(1L -> (2L, 1), 3L -> (1L, 2)))
    assert(got(Seq("a", "b", "c")) == Map(1L -> (2L, 1)))
    // postings semantics: every starting position counts, overlaps too
    assert(got(Seq("a", "a")) == Map(4L -> (3L, 1)))
    // single-term phrase degenerates to the postings themselves
    assert(got(Seq("c")) == Map(1L -> (2L, 3), 2L -> (1L, 2)))
    // absent phrase: empty result, not an error
    assert(got(Seq("b", "x")).isEmpty)
  }
}
