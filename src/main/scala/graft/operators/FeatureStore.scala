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

  def dist(x1: Column, y1: Column, x2: Column, y2: Column): Column =
    sqrt(pow(x1 - x2, 2) + pow(y1 - y2, 2))

  /** Per-entity distance to its nearest *other* entity in the same frame.
    * Output: frameKeys..., entity, nearest_id, nearest_dist (rounded for
    * cross-engine rank stability; ties broken by neighbor id via the
    * struct-min, so the result is deterministic).
    */
  def nearestDistance(
      df: DataFrame,
      frameKeys: Seq[String],
      entityCol: String,
      xCol: String, yCol: String): DataFrame = {
    val a = df.select(
      frameKeys.map(col) ++ Seq(col(entityCol).as("_ea"),
        col(xCol).as("_xa"), col(yCol).as("_ya")): _*)
    val b = df.select(
      frameKeys.map(col) ++ Seq(col(entityCol).as("_eb"),
        col(xCol).as("_xb"), col(yCol).as("_yb")): _*)
    a.join(b, frameKeys)
      .filter(col("_ea") =!= col("_eb"))
      .groupBy(frameKeys.map(col) :+ col("_ea").as(entityCol): _*)
      .agg(min(struct(
        round(dist(col("_xa"), col("_ya"), col("_xb"), col("_yb")), 6)
          .as("d"),
        col("_eb").as("i"))).as("nearest"))
      .select(frameKeys.map(col) ++ Seq(col(entityCol),
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
}
