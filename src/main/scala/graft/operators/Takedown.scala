package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The removal pipeline's ONE CALL: tombstone a batch of document/
  * vector ids out of every persisted index family it appears in —
  * BM25 postings, hyperplane-ANN vectors, IVF-PQ codes, signed
  * MinHash rows — each through its own marker-committed delete
  * (write-once tombstone batch + ONE `_live` PUT, the
  * [[LiveMarker]] discipline), and return the PER-ID AUDIT ROW a
  * takedown workflow files: was the id serving in each family
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
  * batch-sized. `retain` forwards to every lifecycle call (keep >1
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
      retain: Int = 1): DataFrame = {
    require(bm25Path.orElse(annPath).orElse(pqPath).orElse(signedPath)
      .nonEmpty, "takedown needs at least one index family path")
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

    var out = base
    // per family: read membership BEFORE (materialized — the delete
    // below mutates what a lazy read would scan), commit the delete,
    // read back the serving membership and certify `gone`
    bm25Path.foreach { p =>
      out = flagged(out, graft.text.Bm25.bm25IndexIds(spark, p, idCol),
        idCol, "in_bm25").localCheckpoint()
      graft.text.Bm25.deleteFromBm25Index(base, p, idCol, retain)
      out = flagged(out, graft.text.Bm25.bm25IndexIds(spark, p, idCol),
        idCol, "_still_bm25")
        .withColumn("gone_bm25", !col("_still_bm25"))
        .drop("_still_bm25").localCheckpoint()
    }
    annPath.foreach { p =>
      val (_, _, metaId, _) = graft.sim.SimSearch.annMeta(spark, p)
      out = flagged(out,
        graft.sim.SimSearch.readAnnIndex(spark, p), metaId, "in_ann")
        .localCheckpoint()
      graft.sim.SimSearch.deleteFromAnnIndex(
        base.select(col(idCol).as(metaId)), p, retain)
      out = flagged(out,
        graft.sim.SimSearch.readAnnIndex(spark, p), metaId,
        "_still_ann")
        .withColumn("gone_ann", !col("_still_ann"))
        .drop("_still_ann").localCheckpoint()
    }
    pqPath.foreach { p =>
      val pid = pqIdCol.getOrElse(idCol)
      out = flagged(out,
        graft.sim.SimSearch.readPqIndex(spark, p)._2, pid, "in_pq")
        .localCheckpoint()
      graft.sim.SimSearch.deleteFromPqIndex(
        base.select(col(idCol).as(pid)), p, retain)
      out = flagged(out,
        graft.sim.SimSearch.readPqIndex(spark, p)._2, pid, "_still_pq")
        .withColumn("gone_pq", !col("_still_pq"))
        .drop("_still_pq").localCheckpoint()
    }
    signedPath.foreach { p =>
      out = flagged(out,
        graft.text.Dedup.readSignedIndex(spark, p), idCol, "in_signed")
        .localCheckpoint()
      graft.text.Dedup.deleteFromSignedIndex(base, p, idCol, retain)
      out = flagged(out,
        graft.text.Dedup.readSignedIndex(spark, p), idCol,
        "_still_signed")
        .withColumn("gone_signed", !col("_still_signed"))
        .drop("_still_signed").localCheckpoint()
    }
    out
  }
}
