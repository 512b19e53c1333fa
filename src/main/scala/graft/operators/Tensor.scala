package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Long→wide tensor pivot for ML batches (SURVEY.md §2.8 T1; reference
  * recipe `docs/DATA_LAKE_GUIDE.md:73-109`): one row per play with a dense
  * `(frames × entities × features)` float tensor, frames padded to
  * `maxFrames`, entities padded to `maxEntities`, features defaulting to
  * `[x, y, s, a, o, dir]`.
  *
  * Entity ordering: home 1-11, away 1-11, ball last — realized as a sort by
  * `(sideRank, nflId)` inside each frame. The reference leaves the ordering
  * rule as "..." (`docs/DATA_LAKE_GUIDE.md:103-107`); we define it as
  * side-then-nflId so it is total and stable. Missing physics values
  * become 0.0 (the reference pads with zeros).
  *
  * Implementation: ONE hash aggregation (map-side partial) collecting
  * raw entity structs per play, with the whole group→sort→pad pivot
  * fused into the native [[graft.functions.TensorPackXX]] kernel. The
  * staged two-aggregation formulation ([[toTensorStaged]]) shuffles the
  * full tracking volume twice (once frame-keyed, once play-keyed); the
  * fused path shuffles it once — at 100 TB the removed exchange is the
  * dominant cost of tensor creation. Output is bit-identical (pinned by
  * test): the kernel's global struct sort equals "frames by id,
  * entities by (side, id, feats) within a frame".
  */
object Tensor {

  import org.apache.spark.sql.graft.ColumnBridge

  /** sort_array + strip-payload + pad/truncate in one native call. */
  private def padPack(ents: Column, pad: Column, maxN: Int): Column =
    ColumnBridge.column(graft.functions.PadPackXX(
      ColumnBridge.expression(ents), ColumnBridge.expression(pad), maxN))

  /** Whole-tensor pivot in one native call (see [[graft.functions.TensorPackXX]]). */
  private def tensorPack(
      ents: Column, pad: Column, maxEntities: Int, maxFrames: Int): Column =
    ColumnBridge.column(graft.functions.TensorPackXX(
      ColumnBridge.expression(ents), ColumnBridge.expression(pad),
      maxEntities, maxFrames))

  val defaultFeatures: Seq[String] = Seq("x", "y", "s", "a", "o", "dir")

  private def zeroEntity(nFeatures: Int): Column =
    array_repeat(lit(0.0f), nFeatures)

  /** Max frame count over the input — the padding target when the caller
    * does not fix one (runs as its own tiny job).
    */
  def maxFrameCount(pool: DataFrame): Int = {
    // null on an empty pool; frameId may be int/long/short by vintage
    val v = pool.agg(max("frameId")).head().get(0)
    Option(v).map(_.asInstanceOf[Number].intValue).getOrElse(0)
  }

  private def entityStruct(features: Seq[String]): Column = {
    val featArr = array(features.map(f => coalesce(col(f).cast("float"),
      lit(0.0f))): _*)
    val sideRank = when(PlayOps.isBall, 2)
      .when(PlayOps.side.isin("home", "offense"), 0).otherwise(1)
    struct(col("frameId").as("frameId"), sideRank.as("sideRank"),
      coalesce(col("nflId"), lit(Int.MaxValue)).as("nflId"),
      featArr.as("feats"))
  }

  def toTensor(
      pool: DataFrame,
      features: Seq[String] = defaultFeatures,
      maxFrames: Int = 0,
      maxEntities: Int = 23): DataFrame = {
    require(maxFrames > 0, "maxFrames must be fixed (see maxFrameCount)")
    pool.groupBy("gameId", "playId")
      .agg(collect_list(entityStruct(features)).as("entsRaw"))
      .select(col("gameId"), col("playId"),
        tensorPack(col("entsRaw"), zeroEntity(features.size),
          maxEntities, maxFrames).as("_p"))
      .select(col("gameId"), col("playId"),
        col("_p.n_frames").as("n_frames"), col("_p.tensor").as("tensor"))
  }

  /** The two-aggregation formulation [[toTensor]] replaced: per-frame
    * entity pack, then per-play frame pack — two shuffles of the full
    * tracking volume. Kept as the semantics reference the fused kernel
    * is pinned against (bit-identity test), and as the fallback shape
    * if a caller needs the intermediate per-frame table.
    */
  def toTensorStaged(
      pool: DataFrame,
      features: Seq[String] = defaultFeatures,
      maxFrames: Int = 0,
      maxEntities: Int = 23): DataFrame = {
    require(maxFrames > 0, "maxFrames must be fixed (see maxFrameCount)")
    val nF = features.size
    val ent = entityStruct(features)
    val entNoFrame = struct(ent.getField("sideRank").as("sideRank"),
      ent.getField("nflId").as("nflId"), ent.getField("feats").as("feats"))

    // 1. per (play, frame): entity-ordered feature rows, padded/truncated
    //    to maxEntities
    val perFrame = pool
      .groupBy("gameId", "playId", "frameId")
      .agg(collect_list(entNoFrame).as("ents"))
      .select(col("gameId"), col("playId"), col("frameId"),
        padPack(col("ents"), zeroEntity(nF), maxEntities).as("frame"))

    // 2. per play: frame-ordered, padded/truncated to maxFrames
    val zeroFrame = array_repeat(zeroEntity(nF), maxEntities)
    perFrame
      .groupBy("gameId", "playId")
      .agg(collect_list(struct(col("frameId"), col("frame")))
        .as("framesRaw"))
      .select(col("gameId"), col("playId"),
        size(col("framesRaw")).as("n_frames"),
        padPack(col("framesRaw"), zeroFrame, maxFrames).as("tensor"))
  }

  /** Typed tensor row (the ML-batch handoff record). */
  final case class PlayTensor(
      gameId: Long, playId: Int, n_frames: Int,
      tensor: Seq[Seq[Seq[Float]]])

  /** Typed surface over [[toTensor]]: `Dataset[PlayTensor]` for callers
    * that want compile-time row shape (e.g. an ML batch writer); the
    * DataFrame plan is identical — the Encoder only types the boundary.
    */
  def toTensorDS(
      pool: DataFrame,
      features: Seq[String] = defaultFeatures,
      maxFrames: Int = 0,
      maxEntities: Int = 23): org.apache.spark.sql.Dataset[PlayTensor] = {
    val sp = pool.sparkSession
    import sp.implicits._
    toTensor(pool, features, maxFrames, maxEntities)
      .select(col("gameId").cast("long"), col("playId").cast("int"),
        col("n_frames"), col("tensor"))
      .as[PlayTensor]
  }

  /** Per-entity trajectory tensor (T2 in wide form): one row per
    * (play, entity) with a frame-ordered `(frames × features)` matrix.
    */
  def entityTensor(
      pool: DataFrame,
      features: Seq[String] = defaultFeatures): DataFrame = {
    val featArr = array(features.map(f => coalesce(col(f).cast("float"),
      lit(0.0f))): _*)
    pool.groupBy("gameId", "playId", "nflId")
      .agg(collect_list(struct(col("frameId"),
        featArr.as("feats"))).as("tRaw"))
      .select(col("gameId"), col("playId"), col("nflId"),
        size(col("tRaw")).as("n_frames"),
        // maxN=0: sort+strip only, no padding (pad arg is a dummy)
        padPack(col("tRaw"), zeroEntity(features.size), 0).as("tensor"))
  }
}
