package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus batch-shaped decode / feature-extract
  * stages.
  *
  * The Spark-side plumbing is real — schema, partition-parallel batch
  * shape, metadata extraction as codegen'd expressions; the generic
  * *decode* kernel is a clearly-marked deterministic STUB because no
  * image/audio codec library is available in this environment. Swapping
  * the stub for a real decoder (JNI/FFI per partition) changes zero lines
  * outside `decodeStub` — and [[decodePpm]] PROVES that contract with a
  * real, codec-free decoder (binary P6 PPM is ASCII header + raw RGB
  * bytes, pure byte arithmetic).
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

  /** One decoded PPM image's metadata + channel statistics. `ok=false`
    * rows carry zeroed fields for malformed inputs (per-item isolation —
    * one corrupt file must not fail a 100 TB decode job).
    */
  final case class PpmMeta(
      id: Long, ok: Boolean, width: Int, height: Int, maxVal: Int,
      meanR: Double, meanG: Double, meanB: Double)

  /** REAL decoder for binary P6 PPM images — the codec-free proof that
    * the [[decodeStub]] contract carries actual decoders: P6 is an
    * ASCII header (`P6 <w> <h> <maxval>`, `#` comments allowed) followed
    * by raw RGB bytes, so pure byte arithmetic decodes it with no
    * library. Emits dimensions + per-channel means in one pass over the
    * pixel bytes. Same `mapPartitions` batch shape as the stub; a JPEG/
    * PNG codec binds at the same marked line.
    */
  def decodePpm(df: DataFrame, idCol: String = "doc_id",
      mediaCol: String = "media"): Dataset[PpmMeta] = {
    val rows = df.select(col(idCol).cast("long"), col(mediaCol))
    rows.mapPartitions { it =>
      // real codecs: init decoder context HERE, once per partition
      it.map { r =>
        // null id isolates like null media — a corrupt row must not
        // fail the job (id -1 marks the unidentifiable row)
        val id = if (r.isNullAt(0)) -1L else r.getLong(0)
        val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        if (r.isNullAt(0)) PpmMeta(id, ok = false, 0, 0, 0, 0.0, 0.0, 0.0)
        else decodeOnePpm(id, bytes)
      }
    }(Encoders.product[PpmMeta])
  }

  /** Parse one P6 buffer; total function (malformed → ok=false). */
  private[graft] def decodeOnePpm(id: Long, bytes: Array[Byte]): PpmMeta = {
    val bad = PpmMeta(id, ok = false, 0, 0, 0, 0.0, 0.0, 0.0)
    if (bytes == null || bytes.length < 2 ||
      bytes(0) != 'P' || bytes(1) != '6') return bad
    var i = 2
    def isWs(b: Byte) = b == ' ' || b == '\t' || b == '\n' || b == '\r'
    // one whitespace/comment-skipping integer token; -1 on malformed
    def nextInt(): Int = {
      while (i < bytes.length && (isWs(bytes(i)) || bytes(i) == '#')) {
        if (bytes(i) == '#') { // comment runs to end of line
          while (i < bytes.length && bytes(i) != '\n') i += 1
        } else i += 1
      }
      var v = -1L
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        v = (if (v < 0) 0L else v) * 10 + (bytes(i) - '0')
        if (v > Int.MaxValue) return -1
        i += 1
      }
      v.toInt // -1 when no digits were consumed
    }
    val w = nextInt(); val h = nextInt(); val maxVal = nextInt()
    if (w <= 0 || h <= 0 || maxVal <= 0 || maxVal > 255) return bad
    // exactly ONE whitespace byte separates maxval from the raster; a
    // non-whitespace byte here is malformed (blindly skipping it would
    // return ok=true with channel-shifted statistics). CRLF-writing
    // tools emit "\r\n" — treat that pair as the single separator.
    if (i >= bytes.length || !isWs(bytes(i))) return bad
    if (bytes(i) == '\r' && i + 1 < bytes.length && bytes(i + 1) == '\n')
      i += 1
    i += 1
    val need = w.toLong * h * 3
    if (i + need > bytes.length) return bad
    var (sr, sg, sb) = (0L, 0L, 0L)
    var p = i
    val end = i + need.toInt
    while (p < end) {
      sr += bytes(p) & 0xff
      sg += bytes(p + 1) & 0xff
      sb += bytes(p + 2) & 0xff
      p += 3
    }
    val n = (w.toLong * h).toDouble
    PpmMeta(id, ok = true, w, h, maxVal, sr / n, sg / n, sb / n)
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
