package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus batch-shaped decode / feature-extract
  * stages.
  *
  * The Spark-side plumbing is real — schema, partition-parallel batch
  * shape, metadata extraction as codegen'd expressions; the *decode*
  * kernel is a clearly-marked deterministic STUB because no image/audio
  * codec library is available in this environment. Swapping the stub for a
  * real decoder (JNI/FFI per partition) changes zero lines outside
  * `decodeStub`.
  *
  * Scale shape: metadata ops run inside the scan stage (no shuffle);
  * decode runs as `mapPartitions` so the per-partition codec context is
  * initialized once, not per row — the standard pattern for native
  * decoders over 100 TB of media.
  */
object Multimodal {

  /** Attach a binary media column (here: utf-8 bytes of a source column;
    * in production this is the raw image/audio bytes from ingestion).
    */
  def withMedia(df: DataFrame, srcCol: String, as: String = "media"): DataFrame =
    df.withColumn(as, col(srcCol).cast("binary"))

  /** Pure-expression metadata over the binary column: byte length, sha-256
    * content hash, magic-prefix hex. All codegen'd, all in the scan stage.
    */
  def mediaMeta(df: DataFrame, mediaCol: String = "media"): DataFrame =
    df
      .withColumn("n_bytes", length(col(mediaCol)))
      .withColumn("content_sha", sha2(col(mediaCol), 256))
      .withColumn("magic_hex", lower(hex(substring(col(mediaCol), 1, 4))))

  /** One decoded media item (what a real decoder would emit). */
  final case class Decoded(
      id: Long, width: Int, height: Int, nFrames: Int, feature: Array[Float])

  /** Batch decode over (id, media) rows.
    *
    * STUB: the real implementation binds an image/audio codec per
    * partition and decodes `media`; this environment has no codec
    * libraries, so dimensions and features are derived deterministically
    * from the bytes (stable fake). The partitioning, batch shape
    * (`mapPartitions`, one codec init per partition) and output schema are
    * the real contract.
    */
  def decodeStub(df: DataFrame, idCol: String = "doc_id",
      mediaCol: String = "media", featDim: Int = 8): Dataset[Decoded] = {
    val rows = df.select(col(idCol).cast("long"), col(mediaCol))
    rows.mapPartitions { it =>
      // real decoder: init codec context HERE, once per partition
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val n = if (bytes == null) 0 else bytes.length
        val feat = Array.tabulate(featDim)(i =>
          if (n == 0) 0f else (bytes(i % n) & 0xff) / 255f)
        Decoded(id, width = 16 + n % 64, height = 16 + (n * 7) % 64,
          nFrames = 1 + n % 8, feature = feat)
      }
    }(Encoders.product[Decoded])
  }

  /** Resized decode output (the post-resize record an image pipeline
    * hands to feature extraction / embedding).
    */
  final case class Resized(
      id: Long, width: Int, height: Int, pixels: Array[Float])

  /** Batch resize over decoded rows.
    *
    * STUB: a real implementation samples the decoded pixel grid down to
    * `(targetW, targetH)` inside the same per-partition codec context as
    * [[decodeStub]]; without codec libraries the pixel grid is derived
    * deterministically from the feature vector (stable fake). Schema,
    * `mapPartitions` batching, and the fixed output shape
    * (targetW × targetH floats) are the real contract.
    */
  def resizeStub(decoded: Dataset[Decoded], targetW: Int = 4,
      targetH: Int = 4): Dataset[Resized] = {
    decoded.mapPartitions { it =>
      // real resizer: reuse the partition-local codec/scaler context HERE
      it.map { d =>
        val n = targetW * targetH
        val src = if (d.feature.isEmpty) Array(0f) else d.feature
        Resized(d.id, targetW, targetH,
          Array.tabulate(n)(i => src(i % src.length)))
      }
    }(Encoders.product[Resized])
  }

  /** Frame sampling plumbing: cut the byte stream into fixed-size chunks
    * ("frames") and keep every `stride`-th — the shape of video
    * frame-sampling, expressed as pure array expressions.
    */
  def frameSample(df: DataFrame, mediaCol: String = "media",
      chunkBytes: Int = 16, stride: Int = 4): DataFrame = {
    val nChunks = ceil(length(col(mediaCol)) / lit(chunkBytes.toDouble))
      .cast("int")
    df.withColumn("frames",
      transform(
        sequence(lit(0), greatest(nChunks - 1, lit(0)), lit(stride)),
        i => col(mediaCol).substr(
          (i * chunkBytes + 1).cast("int"), lit(chunkBytes))))
  }
}
