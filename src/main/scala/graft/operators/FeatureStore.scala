package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Feature-store operators (SURVEY.md §1.1/§2.4 J3, §2.7): side-car
  * feature joins plus the documented derived features — pairwise distances
  * within a frame ("distance to nearest defender",
  * `/root/reference/README.md:11`, `docs/DATA_LAKE_GUIDE.md:124-133`).
  *
  * Scale shape: the per-frame self-join keys on the full frame identity
  * (gameId, playId, frameId), so each join group is one frame — ≤ 23
  * entities — and the join is a hash join with tiny, perfectly even
  * groups; the follow-up min is a map-side-partial aggregation. No
  * windows, no skew cliff, linear in pool size.
  */
object FeatureStore {

  /** Euclidean distance via explicit multiplies (bit-identical to the
    * oracle's `(dx)*(dx)` chain; `pow(x, 2)` would go through Math.pow).
    */
  def dist(x1: Column, y1: Column, x2: Column, y2: Column): Column =
    sqrt((x1 - x2) * (x1 - x2) + (y1 - y2) * (y1 - y2))

  /** Per-entity distance to its nearest *other* entity in the same frame.
    * Output: frameKeys..., entity, nearest_id, nearest_dist (rounded for
    * cross-engine rank stability; ties broken by neighbor id via the
    * struct-min, so the result is deterministic).
    *
    * A frame is small and bounded (≤ 23 entities in tracking data), so
    * instead of a frame-key self-join (two shuffles + a sort-merge over
    * k² rows) the frame is collected into ONE array per group — a single
    * shuffle with map-side partials — and the k² pairwise distances are
    * computed inside the row. Entities with no neighbor (singleton
    * frames) are excluded, matching join semantics.
    *
    * Integral entity ids take the native kernel
    * ([[graft.functions.NearestXX]] — compiled double loop, bit-identical
    * rounding/tie-break, stays in codegen); other id types fall back to
    * the pure-expression formulation (interpreted HOF lambdas, same
    * result).
    */
  def nearestDistance(
      df: DataFrame,
      frameKeys: Seq[String],
      entityCol: String,
      xCol: String, yCol: String): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
    df.schema(entityCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        nearestDistanceNative(df, frameKeys, entityCol, xCol, yCol)
      case _ =>
        nearestDistanceExpr(df, frameKeys, entityCol, xCol, yCol)
    }
  }

  private def nearestDistanceNative(
      df: DataFrame,
      frameKeys: Seq[String],
      entityCol: String,
      xCol: String, yCol: String): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    val eType = df.schema(entityCol).dataType
    val grouped = df.groupBy(frameKeys.map(col): _*)
      .agg(collect_list(struct(
        col(entityCol).cast("long").as("e"),
        col(xCol).cast("double").as("x"),
        col(yCol).cast("double").as("y"))).as("ents"))
    val pairs = ColumnBridge.column(graft.functions.NearestPairsXX(
      ColumnBridge.expression(col("ents"))))
    grouped
      .select(frameKeys.map(col) :+ explode(pairs).as("r"): _*)
      // duplicate entity ids within a frame collapse to their minimal
      // (dist, neighbor) — same semantics as the join+groupBy formulation
      .groupBy(frameKeys.map(col) :+
        col("r.entity").cast(eType).as(entityCol): _*)
      .agg(min(struct(col("r.d").as("d"), col("r.i").as("i"))).as("nearest"))
      .select(frameKeys.map(col) ++ Seq(
        col(entityCol),
        col("nearest.i").cast(eType).as("nearest_id"),
        col("nearest.d").as("nearest_dist")): _*)
  }

  /** Expression fallback for non-integral entity ids (club-code strings
    * etc.) — identical semantics, interpreted HOF evaluation. Rows with
    * a null id or null coordinates are excluded up front, matching the
    * kernel (a null-distance struct would otherwise sort FIRST in
    * array_min and beat every real neighbor).
    */
  private def nearestDistanceExpr(
      df: DataFrame,
      frameKeys: Seq[String],
      entityCol: String,
      xCol: String, yCol: String): DataFrame = {
    val grouped = df
      .filter(col(entityCol).isNotNull &&
        col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(frameKeys.map(col): _*)
      .agg(collect_list(struct(col(entityCol).as("e"),
        col(xCol).as("x"), col(yCol).as("y"))).as("ents"))
    val perEntity = transform(col("ents"), a =>
      struct(
        a.getField("e").as("entity"),
        array_min(transform(
          filter(col("ents"), b => b.getField("e") =!= a.getField("e")),
          b => struct(
            round(dist(a.getField("x"), a.getField("y"),
              b.getField("x"), b.getField("y")), 6).as("d"),
            b.getField("e").as("i")))).as("nearest")))
    grouped
      .select(frameKeys.map(col) :+ explode(perEntity).as("r"): _*)
      .filter(col("r.nearest").isNotNull)
      .groupBy(frameKeys.map(col) :+ col("r.entity").as(entityCol): _*)
      .agg(min(col("r.nearest")).as("nearest"))
      .select(frameKeys.map(col) ++ Seq(
        col(entityCol),
        col("nearest.i").as("nearest_id"),
        col("nearest.d").as("nearest_dist")): _*)
  }

  /** Distance from every entity to a single reference entity per frame
    * (e.g. the ball, or the QB): filter the reference rows, broadcast-join
    * them back on the frame key, compute the distance in the scan stage.
    */
  def distanceTo(
      df: DataFrame,
      frameKeys: Seq[String],
      refPred: Column,
      xCol: String, yCol: String): DataFrame = {
    val ref = df.filter(refPred).select(
      frameKeys.map(col) :+ col(xCol).as("_rx") :+ col(yCol).as("_ry"): _*)
    df.join(broadcast(ref), frameKeys)
      .withColumn("dist_to_ref",
        round(dist(col(xCol), col(yCol), col("_rx"), col("_ry")), 6))
      .drop("_rx", "_ry")
  }

  /** J3 side-car join: attach derived-feature tables stored in parallel
    * directories (left join on the frame key; features may be sparse).
    */
  def withFeatures(
      raw: DataFrame, features: DataFrame, on: Seq[String]): DataFrame =
    Relational.sidecarJoin(raw, features, on)

  /** The reference's documented feature-store layout
    * (`docs/DATA_LAKE_GUIDE.md:124-133`, `README.md:21-23`): derived
    * features live in `root/feature=<name>/` directories parallel to the
    * raw pool and join back on the frame key at query time. Computing a
    * feature is a one-time batch job; every later query pays only the
    * (broadcast- or bucket-friendly) key join.
    */
  def writeFeature(
      df: DataFrame, featureRoot: String, name: String): Unit =
    df.write.mode("overwrite").parquet(s"$featureRoot/feature=$name")

  def readFeature(
      spark: org.apache.spark.sql.SparkSession,
      featureRoot: String, name: String): DataFrame =
    spark.read.parquet(s"$featureRoot/feature=$name")
}
