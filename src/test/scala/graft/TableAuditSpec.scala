package graft

import org.apache.spark.sql.functions._

import graft.operators.{Diagnose, Relational}

/** Unit coverage for the table-audit / eval family added with
  * q231-q236: FK orphan counting, SCD2 interval building, snapshot
  * diff counters, rank-sum ROC-AUC, Cohen's kappa, and OHLC bars —
  * hand-computed fixtures pinning the algebra the oracle gate then
  * replays at corpus scale.
  */
class TableAuditSpec extends SparkSpec {
  import spark.implicits._

  test("fkOrphanAudit counts nulls and orphans separately; a " +
    "no-valid-keys child yields a NULL rate") {
    val child = Seq(Some(1L), Some(2L), Some(3L), None, Some(99L))
      .toDF("k")
    val parent = Seq(1L, 2L, 3L).toDF("p")
    val r = Diagnose.fkOrphanAudit(Seq(
      Diagnose.FkEdge("c->p", child, col("k"), parent, col("p"))))
      .head()
    assert(r.getAs[Long]("n_child") == 5L)
    assert(r.getAs[Long]("n_null_key") == 1L)
    assert(r.getAs[Long]("n_orphan") == 1L)
    assert(r.getAs[Double]("orphan_rate") == 0.25)
    val allNull = Seq[Option[Long]](None, None).toDF("k")
    val r2 = Diagnose.fkOrphanAudit(Seq(
      Diagnose.FkEdge("n->p", allNull, col("k"), parent, col("p"))))
      .head()
    assert(r2.getAs[Long]("n_orphan") == 0L)
    assert(r2.isNullAt(r2.fieldIndex("orphan_rate")))
  }

  test("scd2History collapses equal-attr runs into versions with " +
    "correct intervals; re-entering a value opens a NEW version") {
    val log = Seq(
      (7L, 1L, 1L, "A"), (7L, 2L, 2L, "A"),
      (7L, 3L, 3L, "B"), (7L, 4L, 4L, "A"))
      .toDF("u", "tse", "eid", "attr")
      .select(col("u"), timestamp_seconds(col("tse")).as("ts"),
        col("eid"), col("attr"))
    val got = Relational.scd2History(log, "u", col("ts"), col("eid"),
      col("attr"))
      .orderBy("version")
      .select("attr", "valid_from", "valid_to", "is_current",
        "version", "n_events")
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(3),
        r.getLong(4), r.getLong(5)))
      .toSeq
    assert(got == Seq(
      ("A", 1L, 3L, false, 0L, 2L),
      ("B", 3L, 4L, false, 1L, 1L),
      ("A", 4L, -1L, true, 2L, 1L)))
  }

  test("scd2History breaks equal-timestamp ties on the tie column") {
    val log = Seq((1L, 10L, 2L, "B"), (1L, 10L, 1L, "A"))
      .toDF("u", "tse", "eid", "attr")
      .select(col("u"), timestamp_seconds(col("tse")).as("ts"),
        col("eid"), col("attr"))
    val versions = Relational.scd2History(log, "u", col("ts"),
      col("eid"), col("attr"))
      .orderBy("version").select("attr").as[String].collect().toSeq
    assert(versions == Seq("A", "B"))
  }

  test("snapshotDiff counts added/removed/changed/unchanged and " +
    "per-column changes; null-to-value counts as a change") {
    val oldDf = Seq((1L, Some("a")), (2L, Some("b")), (3L, None))
      .toDF("k", "v")
    val newDf = Seq((2L, Some("b")), (3L, Some("x")), (4L, Some("d")))
      .toDF("k", "v")
    val m = Relational.snapshotDiff(oldDf, newDf, Seq("k"), Seq("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == Map("added" -> 1L, "removed" -> 1L, "changed" -> 1L,
      "unchanged" -> 1L, "changed:v" -> 1L))
  }

  test("rocAucByGroup: perfect separation scores 1, inverted 0, " +
    "all-tied 0.5, single-class NULL") {
    val df = Seq(
      // g1: positives strictly above negatives
      ("g1", 4L, 1L), ("g1", 3L, 1L), ("g1", 2L, 0L), ("g1", 1L, 0L),
      // g2: inverted
      ("g2", 1L, 1L), ("g2", 2L, 0L),
      // g3: one tied score for both classes
      ("g3", 5L, 1L), ("g3", 5L, 0L),
      // g4: positives only
      ("g4", 1L, 1L), ("g4", 2L, 1L))
      .toDF("g", "s", "y")
    val m = Relational.rocAucByGroup(df, "g", col("s"), col("y"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(r.fieldIndex("auc"))) Double.NaN
         else r.getAs[Double]("auc"))).toMap
    assert(m("g1") == 1.0)
    assert(m("g2") == 0.0)
    assert(m("g3") == 0.5)
    assert(m("g4").isNaN)
  }

  test("cohenKappa: perfect agreement is 1, perfect disagreement on " +
    "a symmetric 2x2 is -1") {
    val agree = Seq(("x", "x"), ("y", "y")).toDF("a", "b")
    val k1 = Relational.cohenKappa(agree, col("a"), col("b")).head()
    assert(k1.getAs[Long]("n_agree") == 2L)
    assert(k1.getAs[Double]("kappa") == 1.0)
    val disagree = Seq(("x", "y"), ("y", "x")).toDF("a", "b")
    val k2 = Relational.cohenKappa(disagree, col("a"), col("b")).head()
    assert(k2.getAs[Long]("n_agree") == 0L)
    assert(k2.getAs[Double]("kappa") == -1.0)
  }

  test("cohenKappa: a single-category degenerate table yields NULL") {
    val same = Seq(("x", "x"), ("x", "x")).toDF("a", "b")
    val r = Relational.cohenKappa(same, col("a"), col("b")).head()
    assert(r.getAs[Long]("po_micro") == 1000000L)
    assert(r.isNullAt(r.fieldIndex("kappa")))
  }

  test("ohlcBars: open/close follow (epoch, tie) order, equal-ts " +
    "rows break on the tie column") {
    val rows = Seq(
      (100L, 1L, 10L), (200L, 2L, 30L), (300L, 3L, 20L), // day 0
      (86400L + 10L, 5L, 7L), (86400L + 10L, 4L, 9L)) // day 1: ts tie
      .toDF("tse", "eid", "v")
      .select(timestamp_seconds(col("tse")).as("ts"), col("eid"),
        col("v"))
    val got = Relational.ohlcBars(rows, col("ts"), col("eid"),
      col("v"), 86400L)
      .orderBy("bucket").collect()
    val d0 = got(0)
    assert(d0.getAs[Long]("open") == 10L)
    assert(d0.getAs[Long]("high") == 30L)
    assert(d0.getAs[Long]("low") == 10L)
    assert(d0.getAs[Long]("close") == 20L)
    assert(d0.getAs[Long]("volume") == 3L)
    assert(d0.getAs[Long]("turnover") == 60L)
    assert(d0.getAs[Long]("vwap_micro") == 20000000L)
    val d1 = got(1)
    // equal timestamps: eid=4 is the earlier (open), eid=5 the close
    assert(d1.getAs[Long]("open") == 9L)
    assert(d1.getAs[Long]("close") == 7L)
  }

  test("Takedown: partial families, never-present targets, and the " +
    "gone certificate across bm25 + signed + the CORPUS POOL in one " +
    "call — 'deleted' includes the bytes") {
    import graft.text.{Bm25, Dedup, TextOps}
    val base = tmpDir("takedown") + "/t"
    val docs = (1L to 20L).map(i =>
      (i, s"document body number $i with shared words and tok$i"))
      .toDF("doc_id", "text")
    val bm = s"$base/bm"
    val sg = s"$base/sg"
    val pool = s"$base/pool"
    Bm25.writeBm25Index(docs.filter(col("doc_id") <= 10), "text",
      "doc_id", bm, buckets = 8)
    Dedup.writeSignedIndex(docs.filter(col("doc_id") % 2 === 0), sg,
      "text", "doc_id", tokenizer = TextOps.tokensSimple)
    // the corpus itself holds docs 1..15 (so 999 is nowhere and the
    // indexes hold some ids the pool does not — families stay
    // independent in the certificate)
    graft.operators.DocPool.write(docs.filter(col("doc_id") <= 15),
      pool, "doc_id", buckets = 4)
    // targets: 4 (all three), 15 (pool only), 8 (all three),
    // 999 (nowhere at all)
    val targets = Seq(4L, 15L, 8L, 999L).toDF("doc_id")
    val audit = graft.operators.Takedown(spark, targets, "doc_id",
      bm25Path = Some(bm), signedPath = Some(sg),
      poolPath = Some(pool))
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Boolean]("in_bm25"), r.getAs[Boolean]("gone_bm25"),
          r.getAs[Boolean]("in_signed"),
          r.getAs[Boolean]("gone_signed")),
          (r.getAs[Boolean]("in_pool"),
            r.getAs[Boolean]("gone_pool")))).toMap
    assert(audit(4L) == (((true, true, true, true), (true, true))))
    assert(audit(8L) == (((true, true, true, true), (true, true))))
    assert(audit(15L) == (((false, true, false, true), (true, true))))
    assert(audit(999L) ==
      (((false, true, false, true), (false, true))))
    // survivors intact, targets gone from every serving read AND the
    // pool bytes
    assert(Bm25.bm25IndexIds(spark, bm, "doc_id").count() == 8L)
    assert(Dedup.readSignedIndex(spark, sg)
      .select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(2L, 6L, 10L, 12L, 14L, 16L, 18L, 20L))
    assert(graft.operators.DocPool.read(spark, pool)
      .select("doc_id").collect().map(_.getLong(0)).toSet ==
      (1L to 15L).toSet -- Set(4L, 8L, 15L))
    // no family given is a loud error, not a silent no-op audit
    intercept[IllegalArgumentException] {
      graft.operators.Takedown(spark, targets, "doc_id")
    }
  }

  test("DriftRepair: audits both directions, tombstones extras, " +
    "re-appends missing, and the re-audit reads zero drift") {
    import graft.text.{Bm25, Dedup, TextOps}
    val base = tmpDir("driftrepair") + "/t"
    val all = (1L to 16L).map(i =>
      (i, s"drift corpus document $i with common words tok$i"))
      .toDF("doc_id", "text")
    val corpus = all.filter(col("doc_id") <= 12)
    val bm = s"$base/bm"
    val sg = s"$base/sg"
    // bm25 holds evens to 16: extras {14,16}, missing = odds 1..11
    Bm25.writeBm25Index(all.filter(col("doc_id") % 2 === 0), "text",
      "doc_id", bm, buckets = 8)
    // signed holds multiples of 3 to 15: extra {15}, missing = the
    // corpus ids not divisible by 3
    Dedup.writeSignedIndex(all.filter(col("doc_id") % 3 === 0), sg,
      "text", "doc_id", tokenizer = TextOps.tokensSimple)
    val rep = graft.operators.DriftRepair(spark,
      docCorpus = Some(corpus), bm25Path = Some(bm),
      signedPath = Some(sg), tokenizer = TextOps.tokensSimple)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    // bm25: corpus 12, index 8 (evens 2..16), missing 6 odds,
    // extras {14,16}
    assert(rep("bm25") == ((12L, 8L, 6L, 2L, 0L, 0L)))
    // signed: corpus 12, index 5 (3,6,9,12,15), missing 8, extra {15}
    assert(rep("signed") == ((12L, 5L, 8L, 1L, 0L, 0L)))
    // the serving reads now hold EXACTLY the corpus ids
    assert(Bm25.bm25IndexIds(spark, bm, "doc_id")
      .collect().map(_.getLong(0)).toSet == (1L to 12L).toSet)
    assert(Dedup.readSignedIndex(spark, sg)
      .select("doc_id").collect().map(_.getLong(0)).toSet ==
      (1L to 12L).toSet)
    // idempotent: a second repair measures zero drift everywhere
    val again = graft.operators.DriftRepair(spark,
      docCorpus = Some(corpus), bm25Path = Some(bm),
      signedPath = Some(sg), tokenizer = TextOps.tokensSimple)
      .collect()
    assert(again.forall(r => r.getLong(3) == 0L && r.getLong(4) == 0L))
    // TOMBSTONE SHADOW: ids deleted from the index but still in the
    // corpus — a plain re-append stays invisible behind the
    // tombstone, so repair must detect the residual, compact, and
    // re-append (the resurrect pass)
    Bm25.deleteFromBm25Index(Seq(2L, 5L).toDF("doc_id"), bm, "doc_id")
    val rep2 = graft.operators.DriftRepair(spark,
      docCorpus = Some(corpus), bm25Path = Some(bm),
      tokenizer = TextOps.tokensSimple)
      .collect().map(r => r.getString(0) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    assert(rep2("bm25") == ((2L, 0L, 0L, 0L)))
    assert(Bm25.bm25IndexIds(spark, bm, "doc_id")
      .collect().map(_.getLong(0)).toSet == (1L to 12L).toSet)
  }

  test("indexDriftReport: both drift directions, clean index reads " +
    "zero, duplicate ids count once") {
    val corpus = Seq(1L, 2L, 3L, 4L, 4L).toDF("doc_id") // dup id 4
    val index = Seq(2L, 3L, 9L).toDF("doc_id")
    val r = graft.operators.Diagnose
      .indexDriftReport(corpus, index, "doc_id").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((4L, 3L, 2L, 1L))) // corpus {1,2,3,4}; missing {1,4}; extra {9}
    val clean = graft.operators.Diagnose
      .indexDriftReport(corpus, corpus, "doc_id").head()
    assert(clean.getLong(2) == 0L && clean.getLong(3) == 0L)
  }

  test("bloom side-car: no false negatives ever, point lookups prune " +
    "files min/max cannot, absent probes read nothing, FP rate tiny") {
    val root = tmpDir("bloom-sidecar") + "/t"
    // ids assigned to files round-robin: every file's [min, max]
    // spans nearly the whole id range, so min/max pruning is blind
    // to ANY point probe — exactly the shape blooms exist for
    val n = 2000L
    (0L until n).map(i => (i, i % 8))
      .toDF("id", "shard")
      .repartitionByRange(8, col("shard"))
      .write.parquet(root)
    graft.operators.Diagnose.writeBloomSidecar(spark, root, "id")
    // NO FALSE NEGATIVES: a 25-probe sample through the bloom read
    // returns exactly the exact-filter rows
    val probes = (0L until n by 83L).toSeq
    val viaBloom = graft.operators.Diagnose
      .readWithBloom(spark, root, "id", probes)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(viaBloom == probes.toSet)
    // PRUNING: one present probe lives in one file; min/max scans all
    val rep = graft.operators.Diagnose
      .bloomSkippingReport(spark, root, "id", Seq(997L)).head()
    assert(rep.getAs[Long]("n_files") == 8L)
    assert(rep.getAs[Long]("n_files_hit_minmax") == 8L,
      "round-robin ids must blind min/max pruning")
    assert(rep.getAs[Long]("n_files_hit_bloom") <= 2L,
      s"bloom should prune to ~1 file: $rep")
    assert(rep.getAs[Long]("n_rows_matched") == 1L)
    assert(rep.getAs[Long]("read_amp_bloom_micro") <
      rep.getAs[Long]("read_amp_minmax_micro"))
    // ABSENT probe: nothing read, nothing returned
    assert(graft.operators.Diagnose
      .readWithBloom(spark, root, "id", Seq(999983L)).count() == 0L)
    // FALSE-POSITIVE RATE pinned: 500 absent ids against 8 files;
    // theory (1 - e^(-k*n_file/m))^k ~ 6e-5 at m=65536, k=2,
    // n_file=250 -- allow two decades of slack
    val absent = (1000000L until 1000500L).toSeq
    val passes = graft.operators.Diagnose
      .bloomPassingFiles(spark, root, "id", absent).size
    assert(passes <= (8 * 500 * 0.01).toInt,
      s"bloom FP rate blew its bound: $passes file passes")
  }

  test("bloom side-car unknown-file guard: a file appended AFTER the " +
    "build is always scanned — no silent false negatives on append") {
    val root = tmpDir("bloom-append") + "/t"
    (0L until 1000L).map(i => (i, i % 4)).toDF("id", "shard")
      .repartitionByRange(4, col("shard"))
      .write.parquet(root)
    graft.operators.Diagnose.writeBloomSidecar(spark, root, "id")
    // append a new file the side-car has never seen, holding an id
    // far outside the original domain
    Seq((777777L, 9L)).toDF("id", "shard")
      .coalesce(1).write.mode("append").parquet(root)
    // the probe lives ONLY in the appended file; the old read would
    // silently return nothing
    val got = graft.operators.Diagnose
      .readWithBloom(spark, root, "id", Seq(777777L))
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(got == Set(777777L),
      "appended file's rows must survive the bloom-pruned read")
    // the report surfaces the coverage gap
    val rep = graft.operators.Diagnose
      .bloomSkippingReport(spark, root, "id", Seq(777777L)).head()
    assert(rep.getAs[Long]("n_files_unknown") >= 1L)
    assert(!rep.getAs[Boolean]("bloom_fallback"))
    assert(rep.getAs[Long]("n_rows_matched") == 1L)
    // mixed probe: one covered id + one appended id, both found
    val both = graft.operators.Diagnose
      .readWithBloom(spark, root, "id", Seq(42L, 777777L))
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(both == Set(42L, 777777L))
    // a rebuilt side-car regains full coverage
    graft.operators.Diagnose.writeBloomSidecar(spark, root, "id")
    val rep2 = graft.operators.Diagnose
      .bloomSkippingReport(spark, root, "id", Seq(777777L)).head()
    assert(rep2.getAs[Long]("n_files_unknown") == 0L)
  }

  test("writeWithBloomSidecars: layout + side-car in one call — the " +
    "side-car covers exactly the files written") {
    val root = tmpDir("bloom-onecall") + "/t"
    val laid = graft.operators.Relational.zOrderLayout(
      (0L until 512L).map(i => (i, (i * 37L) % 512L)).toDF("x", "y"),
      col("x"), col("y"), bits = 8, partitions = 4)
    graft.operators.Diagnose.writeWithBloomSidecars(laid, root,
      Seq("x", "y"))
    // both side-cars exist, fully covering the write
    Seq("x", "y").foreach { c =>
      val rep = graft.operators.Diagnose
        .bloomSkippingReport(spark, root, c, Seq(101L)).head()
      assert(rep.getAs[Long]("n_files_unknown") == 0L, c)
      assert(rep.getAs[Long]("n_rows_matched") == 1L, c)
    }
    assert(graft.operators.Diagnose
      .readWithBloom(spark, root, "y", Seq((101L * 37L) % 512L))
      .count() == 1L)
  }

  test("bloom side-car hot-probe cap: past maxFiles the read falls " +
    "back to one full scan, stays correct, and the report says so") {
    val root = tmpDir("bloom-cap") + "/t"
    // value 5 present in EVERY file (plus the natural i=5 row):
    // the passing list is all 6 files
    (0L until 600L).map(i => (if (i % 100L == 0L) 5L else i, i % 6L))
      .toDF("id", "shard")
      .repartitionByRange(6, col("shard"))
      .write.parquet(root)
    graft.operators.Diagnose.writeBloomSidecar(spark, root, "id")
    val plan = graft.operators.Diagnose
      .bloomFilePlan(spark, root, "id", Seq(5L), maxFiles = 2)
    assert(plan.fallbackFullScan,
      s"6 passing files past a cap of 2 must trip the fallback: $plan")
    val got = graft.operators.Diagnose
      .readWithBloom(spark, root, "id", Seq(5L), maxFiles = 2)
    assert(got.count() == 7L, "fallback read must stay exact")
    val rep = graft.operators.Diagnose
      .bloomSkippingReport(spark, root, "id", Seq(5L), maxFiles = 2)
      .head()
    assert(rep.getAs[Boolean]("bloom_fallback"))
    assert(rep.getAs[Long]("n_files_hit_bloom") ==
      rep.getAs[Long]("n_files"))
    // an uncapped plan on the same probe scans all files WITHOUT the
    // fallback bit — the cap is about list size, not correctness
    val rep2 = graft.operators.Diagnose
      .bloomSkippingReport(spark, root, "id", Seq(5L)).head()
    assert(!rep2.getAs[Boolean]("bloom_fallback"))
    assert(rep2.getAs[Long]("n_rows_matched") == 7L)
  }
}
