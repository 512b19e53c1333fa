package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The removal pipeline's ONE CALL: tombstone a batch of document/
  * vector ids out of every persisted index family it appears in —
  * BM25 postings, hyperplane-ANN vectors, IVF-PQ codes, signed
  * MinHash rows — each through its own marker-committed delete
  * (write-once tombstone batch + ONE `_live` PUT, the
  * [[LiveMarker]] discipline), PLUS the corpus itself when a
  * [[DocPool]] path is given — the bytes, not just the serving paths:
  * [[DocPool.removeIds]] rewrites only the hash buckets the ids live
  * in (partition-pruned, marker-committed; survivors byte-identical —
  * untouched buckets are not even rewritten) and the certificate
  * gains `in_pool`/`gone_pool`, so "deleted" finally means deleted
  * from every index AND from the lake. Returns the PER-ID AUDIT ROW
  * a takedown workflow files: was the id present in each family
  * before, and is it provably gone after?
  *
  * The audit is what makes the pipeline defensible: "deleted" is a
  * claim about every serving path, so the after-membership is read
  * back through the SAME resolved reads serving uses
  * ([[graft.text.Bm25.bm25IndexIds]], `readAnnIndex`, `readPqIndex`,
  * `readSignedIndex`) — if a tombstone failed to commit anywhere,
  * `gone_*` reads false and the workflow fails loudly instead of
  * filing a false certificate.
  *
  * Scale shape: per family, membership is ONE index scan semi-joined
  * against the BROADCAST id batch (takedown batches are query-sized
  * by contract — ids never shuffle the index), the delete is the
  * family's O(batch) tombstone commit, and the audit frame is
  * batch-sized. The pool reads are partition-pruned to the ids'
  * buckets ([[DocPool.readForIds]]) and the pool delete rewrites only
  * those buckets. `retain` forwards to every lifecycle call (keep >1
  * to leave the pre-takedown snapshots readable for the audit's
  * "what did it serve before" reads — the q321 pattern).
  *
  * Families are opt-in: pass the paths you maintain. ANN resolves
  * its id column from the persisted meta; PQ uses `pqIdCol`
  * (defaults to `idCol`).
  */
object Takedown {

  def apply(spark: SparkSession, ids: DataFrame, idCol: String,
      bm25Path: Option[String] = None,
      annPath: Option[String] = None,
      pqPath: Option[String] = None,
      pqIdCol: Option[String] = None,
      signedPath: Option[String] = None,
      poolPath: Option[String] = None,
      retain: Int = 1): DataFrame = {
    require(bm25Path.orElse(annPath).orElse(pqPath).orElse(signedPath)
      .orElse(poolPath)
      .nonEmpty, "takedown needs at least one index/pool path")
    val base = ids.select(col(idCol)).distinct().localCheckpoint()

    // one boolean column: is the id in `members` (index scan semi-
    // joined against the broadcast batch, then a broadcast flag join
    // back — the index never shuffles)
    def flagged(acc: DataFrame, members: DataFrame, memberCol: String,
        as: String): DataFrame = {
      val present = members
        .select(col(memberCol).as(idCol)).distinct()
        .join(broadcast(base), Seq(idCol), "left_semi")
        .withColumn(as, lit(true))
      acc.join(broadcast(present), Seq(idCol), "left")
        .withColumn(as, coalesce(col(as), lit(false)))
    }

    // phase 1 — ONE consistent pre-takedown snapshot: every family's
    // before-membership joins into one plan, materialized ONCE before
    // any delete mutates what a lazy read would scan
    var pre = base
    bm25Path.foreach { p =>
      pre = flagged(pre, graft.text.Bm25.bm25IndexIds(spark, p, idCol),
        idCol, "in_bm25")
    }
    annPath.foreach { p =>
      val (_, _, metaId, _) = graft.sim.SimSearch.annMeta(spark, p)
      pre = flagged(pre,
        graft.sim.SimSearch.readAnnIndex(spark, p), metaId, "in_ann")
    }
    pqPath.foreach { p =>
      pre = flagged(pre, graft.sim.SimSearch.readPqIndex(spark, p)._2,
        pqIdCol.getOrElse(idCol), "in_pq")
    }
    signedPath.foreach { p =>
      pre = flagged(pre,
        graft.text.Dedup.readSignedIndex(spark, p), idCol, "in_signed")
    }
    poolPath.foreach { p =>
      pre = flagged(pre, DocPool.readForIds(spark, p, base, idCol),
        idCol, "in_pool")
    }
    val before = pre.localCheckpoint()
    // phase 2 — the four marker-committed deletes
    bm25Path.foreach(p =>
      graft.text.Bm25.deleteFromBm25Index(base, p, idCol, retain))
    annPath.foreach { p =>
      val (_, _, metaId, _) = graft.sim.SimSearch.annMeta(spark, p)
      graft.sim.SimSearch.deleteFromAnnIndex(
        base.select(col(idCol).as(metaId)), p, retain)
    }
    pqPath.foreach(p => graft.sim.SimSearch.deleteFromPqIndex(
      base.select(col(idCol).as(pqIdCol.getOrElse(idCol))), p, retain))
    signedPath.foreach(p =>
      graft.text.Dedup.deleteFromSignedIndex(base, p, idCol, retain))
    poolPath.foreach(p =>
      DocPool.removeIds(spark, base, p, idCol, retain))
    // phase 3 — certify `gone` from the SAME serving reads, again as
    // one plan materialized once (the audit artifact must be a stable
    // snapshot, not a lazy view over files a later GC may age out)
    var post = before
    def certify(members: DataFrame, memberCol: String,
        fam: String): Unit = {
      post = flagged(post, members, memberCol, s"_still_$fam")
        .withColumn(s"gone_$fam", !col(s"_still_$fam"))
        .drop(s"_still_$fam")
    }
    bm25Path.foreach(p => certify(
      graft.text.Bm25.bm25IndexIds(spark, p, idCol), idCol, "bm25"))
    annPath.foreach { p =>
      val (_, _, metaId, _) = graft.sim.SimSearch.annMeta(spark, p)
      certify(graft.sim.SimSearch.readAnnIndex(spark, p), metaId, "ann")
    }
    pqPath.foreach(p => certify(
      graft.sim.SimSearch.readPqIndex(spark, p)._2,
      pqIdCol.getOrElse(idCol), "pq"))
    signedPath.foreach(p => certify(
      graft.text.Dedup.readSignedIndex(spark, p), idCol, "signed"))
    poolPath.foreach(p => certify(
      DocPool.readForIds(spark, p, base, idCol), idCol, "pool"))
    post.localCheckpoint()
  }
}
