package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
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
  * outside `decodeStub` — and two REAL, dependency-free decoders prove
  * that contract: [[decodePpm]] (binary P6 PPM — ASCII header + raw RGB
  * bytes, pure byte arithmetic) and [[decodePng]] (8-bit non-interlaced
  * PNG — `java.util.zip.Inflater` + the five scanline filters, pure
  * JDK). [[decodeImage]] goes further: the JDK's own `javax.imageio`
  * codecs (part of `java.desktop`, headless-safe) decode JPEG, PNG,
  * GIF, BMP and WBMP with zero external dependencies, and
  * [[decodeAudio]] does the same for WAV/AIFF/AU/SND via
  * `javax.sound.sampled`, and [[mp3Meta]] reads MP3 stream metadata
  * straight off the frame headers — only compressed-audio SAMPLE
  * decode (MP3/AAC) and real video codecs still need an external
  * library.
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
    * (targetW × targetH floats) are the real contract — and
    * [[decodePngThumb]] IS that operation for real, for PNG inputs
    * (streaming box-average during the unfilter pass).
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

  /** One decoded PNG image's metadata + channel statistics (`ok=false`
    * rows carry zeroed fields — per-item isolation, as [[PpmMeta]]).
    * Gray images report their mean in all three channels; alpha is
    * ignored for the means.
    */
  final case class PngMeta(
      id: Long, ok: Boolean, width: Int, height: Int, bitDepth: Int,
      colorType: Int, meanR: Double, meanG: Double, meanB: Double)

  /** REAL decoder for (non-interlaced, 8-bit) PNG images — pure JDK:
    * `java.util.zip.Inflater` decompresses the IDAT stream and the five
    * per-scanline filters (None/Sub/Up/Average/Paeth) un-apply with
    * byte arithmetic, so no codec library is needed. Supports color
    * types 0 (gray), 2 (RGB), 4 (gray+alpha) and 6 (RGBA) at bit depth
    * 8 — the overwhelming majority of real-world PNGs; everything else
    * (16-bit, palette, Adam7 interlace) returns `ok=false` rather than
    * approximate statistics. Chunk CRCs are NOT verified (corruption
    * surfaces as inflate failure or length mismatch → `ok=false`);
    * malformed headers claiming huge rasters are rejected by a
    * deflate-ratio bound before any allocation, so one hostile file
    * cannot OOM an executor. Same `mapPartitions` batch shape as
    * [[decodePpm]].
    */
  def decodePng(df: DataFrame, idCol: String = "doc_id",
      mediaCol: String = "media",
      maxRasterBytes: Long = 256L * 1024 * 1024): Dataset[PngMeta] = {
    val rows = df.select(col(idCol).cast("long"), col(mediaCol))
    rows.mapPartitions { it =>
      // real codecs: init decoder context HERE, once per partition
      it.map { r =>
        val id = if (r.isNullAt(0)) -1L else r.getLong(0)
        val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        if (r.isNullAt(0)) PngMeta(id, ok = false, 0, 0, 0, 0, 0.0, 0.0, 0.0)
        else decodeOnePng(id, bytes, maxRasterBytes)
      }
    }(Encoders.product[PngMeta])
  }

  private val PngSignature: Array[Int] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  /** Header facts handed to [[walkPng]] scanline visitors. */
  private final case class PngHeader(
      w: Int, h: Int, bitDepth: Int, colorType: Int, channels: Int)

  /** Parse one PNG buffer; total function (malformed → ok=false). */
  private[graft] def decodeOnePng(id: Long, bytes: Array[Byte],
      maxRasterBytes: Long = 256L * 1024 * 1024): PngMeta = {
    val bad = PngMeta(id, ok = false, 0, 0, 0, 0, 0.0, 0.0, 0.0)
    var sr = 0L; var sg = 0L; var sb = 0L
    val hdr = walkPng(bytes, maxRasterBytes) { (_, recon, hd) =>
      var px = 0
      val st = hd.w * hd.channels
      while (px < st) {
        hd.colorType match {
          case 0 => sr += recon(px); px += 1
          case 2 =>
            sr += recon(px); sg += recon(px + 1); sb += recon(px + 2)
            px += 3
          case 4 => sr += recon(px); px += 2 // alpha ignored
          case 6 =>
            sr += recon(px); sg += recon(px + 1); sb += recon(px + 2)
            px += 4
        }
      }
    }
    if (hdr == null) return bad
    val n = hdr.w.toDouble * hdr.h
    val (mr, mg, mb) =
      if (hdr.colorType == 0 || hdr.colorType == 4) (sr / n, sr / n, sr / n)
      else (sr / n, sg / n, sb / n)
    PngMeta(id, ok = true, hdr.w, hdr.h, hdr.bitDepth, hdr.colorType,
      mr, mg, mb)
  }

  /** Parse + inflate + unfilter a PNG, calling `visit(y, recon, header)`
    * once per scanline with the RECONSTRUCTED row (`recon` is a reused
    * buffer of `w·channels` ints — consume it inside the call). Returns
    * the header on success, null on any malformation; never throws.
    */
  private def walkPng(bytes: Array[Byte], maxRasterBytes: Long)(
      visit: (Int, Array[Int], PngHeader) => Unit): PngHeader = {
    if (bytes == null || bytes.length < 8 + 25 + 12) return null
    var i = 0
    while (i < 8) {
      if ((bytes(i) & 0xff) != PngSignature(i)) return null
      i += 1
    }
    def be32(p: Int): Long =
      ((bytes(p) & 0xffL) << 24) | ((bytes(p + 1) & 0xffL) << 16) |
        ((bytes(p + 2) & 0xffL) << 8) | (bytes(p + 3) & 0xffL)
    // walk chunks: IHDR must come first; IDAT segments concatenate
    var pos = 8
    var w = 0L; var h = 0L; var bitDepth = -1; var colorType = -1
    var interlace = -1
    var sawIhdr = false
    var idatLen = 0L
    val idatParts = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var done = false
    while (!done) {
      if (pos + 8 > bytes.length) return null
      val len = be32(pos)
      if (len > Int.MaxValue - 12 || pos + 12 + len > bytes.length)
        return null
      val ctype = new String(bytes, pos + 4, 4, "US-ASCII")
      val dataAt = pos + 8
      ctype match {
        case "IHDR" =>
          if (sawIhdr || len != 13) return null
          sawIhdr = true
          w = be32(dataAt); h = be32(dataAt + 4)
          bitDepth = bytes(dataAt + 8) & 0xff
          colorType = bytes(dataAt + 9) & 0xff
          interlace = bytes(dataAt + 12) & 0xff
        case "IDAT" =>
          if (!sawIhdr) return null
          idatParts += ((dataAt, len.toInt))
          idatLen += len
        case "IEND" => done = true
        case _ => // ancillary chunk — skip
      }
      pos += (12 + len).toInt // bounded: pos + 12 + len <= bytes.length
    }
    if (!sawIhdr || idatParts.isEmpty) return null
    if (bitDepth != 8 || interlace != 0) return null
    val channels = colorType match {
      case 0 => 1 // gray
      case 2 => 3 // rgb
      case 4 => 2 // gray + alpha
      case 6 => 4 // rgba
      case _ => return null // palette (3) and invalid types unsupported
    }
    if (w <= 0 || h <= 0) return null
    val stride = w * channels
    val expected = h * (1 + stride) // one filter byte per scanline
    // deflate expands at most ~1032:1 — a header claiming a raster the
    // IDAT stream cannot possibly hold is malformed; reject BEFORE
    // allocating, so a 100-byte hostile file cannot claim a 4 GB raster
    if (expected > maxRasterBytes || expected > idatLen * 1100L + 4096L)
      return null
    val raw = new Array[Byte](expected.toInt)
    val inflater = new java.util.zip.Inflater()
    try {
      var out = 0
      var part = 0
      while (out < raw.length && part <= idatParts.length) {
        if (inflater.needsInput()) {
          if (part >= idatParts.length) return null // stream truncated
          val (off, len) = idatParts(part)
          inflater.setInput(bytes, off, len)
          part += 1
        }
        val n = inflater.inflate(raw, out, raw.length - out)
        out += n
        if (n == 0 && inflater.finished()) {
          if (out < raw.length) return null
        } else if (n == 0 && !inflater.needsInput() &&
          !inflater.needsDictionary()) return null
        if (inflater.needsDictionary()) return null // not legal in PNG
      }
      if (out < raw.length) return null
    } catch {
      case _: java.util.zip.DataFormatException => return null
    } finally inflater.end()
    // un-filter scanlines, handing each reconstructed row to the visitor
    val hdr = PngHeader(w.toInt, h.toInt, bitDepth, colorType, channels)
    val st = stride.toInt
    val bpp = channels
    var prior = new Array[Int](st)
    var recon = new Array[Int](st)
    var p = 0
    var row = 0
    while (row < hdr.h) {
      val ft = raw(p) & 0xff
      if (ft > 4) return null
      p += 1
      var x = 0
      while (x < st) {
        val rv = raw(p + x) & 0xff
        val a = if (x >= bpp) recon(x - bpp) else 0
        val b = prior(x)
        val c = if (x >= bpp) prior(x - bpp) else 0
        val v = ft match {
          case 0 => rv
          case 1 => rv + a
          case 2 => rv + b
          case 3 => rv + ((a + b) >> 1)
          case 4 =>
            val pp = a + b - c
            val pa = math.abs(pp - a)
            val pb = math.abs(pp - b)
            val pc = math.abs(pp - c)
            rv + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
        }
        recon(x) = v & 0xff
        x += 1
      }
      visit(row, recon, hdr)
      val tmp = prior; prior = recon; recon = tmp
      p += st
      row += 1
    }
    hdr
  }

  /** One decoded-and-downscaled PNG: `pixels` is the thumbW×thumbH
    * box-average grid in row-major interleaved RGB (gray replicates;
    * alpha ignored), values in [0, 255]. `ok=false` (empty pixels) for
    * malformed input (reported as 0×0) OR an image smaller than the
    * target grid (reported with its REAL dims — thumbnails are a
    * DOWNSCALE; a 2×2 icon has no 8×8 thumbnail, but it decoded fine).
    */
  final case class PngThumb(
      id: Long, ok: Boolean, width: Int, height: Int,
      thumbW: Int, thumbH: Int, pixels: Array[Float])

  /** REAL decode→resize in one streaming pass — the operation
    * [[resizeStub]] stubs, actual for PNG inputs: every reconstructed
    * scanline folds into its box-average thumbnail cells as it is
    * unfiltered, so peak extra memory is one thumbW×thumbH×3 grid (the
    * full raster is never retained beyond the inflate buffer). The
    * thumbnail doubles as a raw image embedding for the similarity
    * stack (`pixels` feeds [[graft.sim.SimSearch]] directly). Same
    * `mapPartitions` batch shape and per-item isolation as
    * [[decodePng]].
    */
  def decodePngThumb(df: DataFrame, idCol: String = "doc_id",
      mediaCol: String = "media", thumbW: Int = 4, thumbH: Int = 4,
      maxRasterBytes: Long = 256L * 1024 * 1024): Dataset[PngThumb] = {
    require(thumbW > 0 && thumbH > 0, "thumb dims must be positive")
    val rows = df.select(col(idCol).cast("long"), col(mediaCol))
    rows.mapPartitions { it =>
      // real codecs: init decoder context HERE, once per partition
      it.map { r =>
        val id = if (r.isNullAt(0)) -1L else r.getLong(0)
        val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        if (r.isNullAt(0))
          PngThumb(id, ok = false, 0, 0, thumbW, thumbH, Array.empty)
        else decodeOnePngThumb(id, bytes, thumbW, thumbH, maxRasterBytes)
      }
    }(Encoders.product[PngThumb])
  }

  /** Decode + box-average one PNG; total function. */
  private[graft] def decodeOnePngThumb(id: Long, bytes: Array[Byte],
      thumbW: Int, thumbH: Int,
      maxRasterBytes: Long = 256L * 1024 * 1024): PngThumb = {
    val bad = PngThumb(id, ok = false, 0, 0, thumbW, thumbH, Array.empty)
    val sums = new Array[Double](thumbW * thumbH * 3)
    val counts = new Array[Long](thumbW * thumbH)
    var tooSmall = false
    val hdr = walkPng(bytes, maxRasterBytes) { (y, recon, hd) =>
      if (hd.w < thumbW || hd.h < thumbH) tooSmall = true
      else {
        val ty = math.min((y.toLong * thumbH / hd.h).toInt, thumbH - 1)
        var x = 0
        var px = 0
        while (x < hd.w) {
          val (r, g, b) = hd.colorType match {
            case 0 => (recon(px), recon(px), recon(px))
            case 2 => (recon(px), recon(px + 1), recon(px + 2))
            case 4 => (recon(px), recon(px), recon(px)) // alpha ignored
            case 6 => (recon(px), recon(px + 1), recon(px + 2))
          }
          val tx = math.min((x.toLong * thumbW / hd.w).toInt, thumbW - 1)
          val cell = ty * thumbW + tx
          sums(cell * 3) += r
          sums(cell * 3 + 1) += g
          sums(cell * 3 + 2) += b
          counts(cell) += 1
          px += hd.channels
          x += 1
        }
      }
    }
    if (hdr == null) return bad
    // a refused DOWNSCALE keeps its real dims (distinguishable from a
    // malformed file, which reports 0×0)
    if (tooSmall)
      return PngThumb(id, ok = false, hdr.w, hdr.h, thumbW, thumbH,
        Array.empty)
    // downscale guarantees every cell received at least one pixel
    val pixels = Array.tabulate(thumbW * thumbH * 3)(i =>
      (sums(i) / counts(i / 3)).toFloat)
    PngThumb(id, ok = true, hdr.w, hdr.h, thumbW, thumbH, pixels)
  }

  /** One ImageIO-decoded image's metadata + channel statistics.
    * `ok=false` rows carry the recognized dims when the header parsed
    * but the raster was refused (bound) or failed to decode; 0×0 means
    * no installed reader recognized the bytes at all.
    */
  final case class ImgMeta(
      id: Long, ok: Boolean, format: String, width: Int, height: Int,
      meanR: Double, meanG: Double, meanB: Double)

  /** REAL multi-format decoder via the JDK's own `javax.imageio`
    * codecs — JPEG, PNG, GIF, BMP and WBMP readers all ship in
    * `java.desktop`, so no external library is needed even for JPEG
    * (the format earlier rounds assumed environment-blocked). Header
    * dims are probed from the reader BEFORE any raster allocation and
    * images past `maxRasterBytes` are refused, so a hostile file
    * claiming a huge canvas cannot OOM an executor. Channel means are
    * folded row-by-row from `getRGB` strips (one `width`-int buffer,
    * never a second full-raster copy). Same `mapPartitions` batch
    * shape and per-item isolation as [[decodePpm]]/[[decodePng]]; only
    * audio/video now remain stubbed.
    */
  def decodeImage(df: DataFrame, idCol: String = "doc_id",
      mediaCol: String = "media",
      maxRasterBytes: Long = 256L * 1024 * 1024): Dataset[ImgMeta] = {
    val rows = df.select(col(idCol).cast("long"), col(mediaCol))
    rows.mapPartitions { it =>
      // ImageIO scans for codec plugins on first use — once per
      // partition here, the decoder-context line the stubs mark
      java.util.Locale.setDefault(java.util.Locale.ROOT)
      it.map { r =>
        val id = if (r.isNullAt(0)) -1L else r.getLong(0)
        val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        if (r.isNullAt(0)) ImgMeta(id, ok = false, "", 0, 0, 0.0, 0.0, 0.0)
        else decodeOneImage(id, bytes, maxRasterBytes)
      }
    }(Encoders.product[ImgMeta])
  }

  /** Decode one image buffer with ImageIO; total function (malformed /
    * unrecognized / oversized → ok=false, never a throw).
    */
  private[graft] def decodeOneImage(id: Long, bytes: Array[Byte],
      maxRasterBytes: Long = 256L * 1024 * 1024): ImgMeta = {
    val bad = ImgMeta(id, ok = false, "", 0, 0, 0.0, 0.0, 0.0)
    if (bytes == null || bytes.length == 0) return bad
    var sr = 0.0; var sg = 0.0; var sb = 0.0
    withImageReader(bytes) { (reader, fmt, w, h) =>
      // 4 bytes/px is the int-ARGB raster ImageIO hands back
      if (w.toLong * h * 4 > maxRasterBytes || w <= 0 || h <= 0)
        ImgMeta(id, ok = false, fmt, w, h, 0.0, 0.0, 0.0)
      else {
        val img = reader.read(0)
        val row = new Array[Int](w)
        var y = 0
        while (y < h) {
          img.getRGB(0, y, w, 1, row, 0, w)
          var x = 0
          while (x < w) {
            val p = row(x)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            x += 1
          }
          y += 1
        }
        val n = w.toDouble * h
        ImgMeta(id, ok = true, fmt, w, h, sr / n, sg / n, sb / n)
      }
    }.getOrElse(bad)
  }

  /** ImageIO-decoded box-average thumbnail (the [[PngThumb]] shape for
    * every JDK-readable format, JPEG included). A refused downscale
    * (source smaller than the thumb grid) keeps its real dims with
    * `ok=false`, matching [[decodePngThumb]]'s convention.
    */
  def decodeImageThumb(df: DataFrame, idCol: String = "doc_id",
      mediaCol: String = "media", thumbW: Int = 4, thumbH: Int = 4,
      maxRasterBytes: Long = 256L * 1024 * 1024): Dataset[PngThumb] = {
    require(thumbW > 0 && thumbH > 0, "thumb dims must be positive")
    val rows = df.select(col(idCol).cast("long"), col(mediaCol))
    rows.mapPartitions { it =>
      // per-partition decoder context (ImageIO plugin scan)
      java.util.Locale.setDefault(java.util.Locale.ROOT)
      it.map { r =>
        val id = if (r.isNullAt(0)) -1L else r.getLong(0)
        val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        if (r.isNullAt(0))
          PngThumb(id, ok = false, 0, 0, thumbW, thumbH, Array.empty)
        else decodeOneImageThumb(id, bytes, thumbW, thumbH, maxRasterBytes)
      }
    }(Encoders.product[PngThumb])
  }

  /** dHash perceptual fingerprint: 9×8 box-averaged grayscale, bit
    * `y·8+x` set iff gray(x,y) < gray(x+1,y) — the difference hash
    * every image-dedup pipeline starts with (robust to re-encoding,
    * resizing, and mild color shifts; brittle to crops/rotations,
    * which the thumbnail-cosine path handles). Output: (id, ok,
    * dhash); undecodable inputs get ok=false, dhash NULL.
    *
    * Pairs via [[graft.text.Dedup.hammingNearDupPairs]] — the banded
    * 64-bit hamming join — making image near-dedup a LONG-sized
    * shuffle instead of a 48-float embedding ride. Decode is the
    * [[decodeImageThumb]] mapPartitions contract; the bit build is 64
    * static codegen-friendly comparison terms, no UDF.
    */
  def dHash(df: DataFrame, idCol: String = "doc_id",
      mediaCol: String = "media",
      maxRasterBytes: Long = 256L * 1024 * 1024): DataFrame = {
    val t = decodeImageThumb(df, idCol, mediaCol, thumbW = 9, thumbH = 8,
      maxRasterBytes).toDF()
    def gray(cell: Int): Column =
      (element_at(col("pixels"), cell * 3 + 1) +
        element_at(col("pixels"), cell * 3 + 2) +
        element_at(col("pixels"), cell * 3 + 3)) / lit(3.0f)
    val bits = (0 until 64).map { i =>
      val left = (i / 8) * 9 + (i % 8)
      when(gray(left) < gray(left + 1), lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    t.select(col("id"), col("ok"),
      when(col("ok"), bits).otherwise(lit(null).cast("long")).as("dhash"))
  }

  /** Decode + box-average one image via ImageIO; total function. */
  private[graft] def decodeOneImageThumb(id: Long, bytes: Array[Byte],
      thumbW: Int, thumbH: Int,
      maxRasterBytes: Long = 256L * 1024 * 1024): PngThumb = {
    val bad = PngThumb(id, ok = false, 0, 0, thumbW, thumbH, Array.empty)
    if (bytes == null || bytes.length == 0) return bad
    withImageReader(bytes) { (reader, _, w, h) =>
      if (w.toLong * h * 4 > maxRasterBytes || w <= 0 || h <= 0) bad
      else if (w < thumbW || h < thumbH)
        PngThumb(id, ok = false, w, h, thumbW, thumbH, Array.empty)
      else {
        val img = reader.read(0)
        val sums = new Array[Double](thumbW * thumbH * 3)
        val counts = new Array[Long](thumbW * thumbH)
        val row = new Array[Int](w)
        var y = 0
        while (y < h) {
          img.getRGB(0, y, w, 1, row, 0, w)
          val ty = math.min((y.toLong * thumbH / h).toInt, thumbH - 1)
          var x = 0
          while (x < w) {
            val p = row(x)
            val tx = math.min((x.toLong * thumbW / w).toInt, thumbW - 1)
            val cell = ty * thumbW + tx
            sums(cell * 3) += (p >> 16) & 0xff
            sums(cell * 3 + 1) += (p >> 8) & 0xff
            sums(cell * 3 + 2) += p & 0xff
            counts(cell) += 1
            x += 1
          }
          y += 1
        }
        val pixels = Array.tabulate(thumbW * thumbH * 3)(i =>
          (sums(i) / counts(i / 3)).toFloat)
        PngThumb(id, ok = true, w, h, thumbW, thumbH, pixels)
      }
    }.getOrElse(bad)
  }

  /** Open an ImageIO reader on `bytes`, probe format + header dims
    * (no raster allocated yet), run `f`, and dispose/close regardless.
    * None when no installed reader recognizes the bytes or anything in
    * the decode path throws (per-item isolation).
    */
  private def withImageReader[A](bytes: Array[Byte])(
      f: (javax.imageio.ImageReader, String, Int, Int) => A): Option[A] = {
    import javax.imageio.ImageIO
    try {
      val iis = ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis, true, true)
            Some(f(reader, reader.getFormatName.toLowerCase,
              reader.getWidth(0), reader.getHeight(0)))
          } finally reader.dispose()
        }
      } finally if (iis != null) iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** One decoded audio item's metadata + signal statistics. `ok=false`
    * carries zeroed fields for unrecognized/malformed/oversized input.
    */
  final case class AudioMeta(
      id: Long, ok: Boolean, format: String, sampleRate: Double,
      channels: Int, bits: Int, nFrames: Long, durationSec: Double,
      rms: Double)

  /** REAL audio decoder via the JDK's own `javax.sound.sampled` —
    * WAV, AIFF, AU and SND parse headless with zero external
    * dependencies (the same `java.desktop` module that gives
    * [[decodeImage]] its JPEG codec). Emits container format, PCM
    * parameters, frame count, duration, and the RMS amplitude
    * normalized to [-1, 1] (the standard loudness/silence screen for
    * audio corpus curation). Frame counts are bounded BEFORE reading
    * samples (`maxPcmBytes`), decoding streams in fixed chunks (never
    * a whole-file sample buffer), and malformed input isolates as
    * ok=false — the [[decodePpm]] contract. Compressed-audio METADATA
    * is covered by [[mp3Meta]]'s frame-header scan; only compressed
    * sample decode (MP3/AAC) and video need an external codec.
    */
  def decodeAudio(df: DataFrame, idCol: String = "doc_id",
      mediaCol: String = "media",
      maxPcmBytes: Long = 1L * 1024 * 1024 * 1024): Dataset[AudioMeta] = {
    val rows = df.select(col(idCol).cast("long"), col(mediaCol))
    rows.mapPartitions { it =>
      // per-partition decoder context (SPI provider scan)
      it.map { r =>
        val id = if (r.isNullAt(0)) -1L else r.getLong(0)
        val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        if (r.isNullAt(0))
          AudioMeta(id, ok = false, "", 0.0, 0, 0, 0L, 0.0, 0.0)
        else decodeOneAudio(id, bytes, maxPcmBytes)
      }
    }(Encoders.product[AudioMeta])
  }

  /** Decode one audio buffer; total function (malformed → ok=false). */
  private[graft] def decodeOneAudio(id: Long, bytes: Array[Byte],
      maxPcmBytes: Long = 1L * 1024 * 1024 * 1024): AudioMeta = {
    import javax.sound.sampled.AudioSystem
    val bad = AudioMeta(id, ok = false, "", 0.0, 0, 0, 0L, 0.0, 0.0)
    if (bytes == null || bytes.length == 0) return bad
    try {
      val fileFmt = AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(bytes))
      val container = fileFmt.getType.toString
      val ais = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val f = ais.getFormat
        val bits = f.getSampleSizeInBits
        val frames = ais.getFrameLength
        val frameSize = math.max(f.getFrameSize, 1)
        // only integer PCM is folded for RMS (the JDK parses more —
        // float/ulaw containers report metadata with rms refused)
        val pcm = f.getEncoding.toString.startsWith("PCM_") &&
          (bits == 8 || bits == 16)
        if (frames < 0 || frames * frameSize > maxPcmBytes || !pcm)
          return AudioMeta(id, ok = false, container,
            f.getSampleRate.toDouble, f.getChannels, bits,
            math.max(frames, 0L),
            if (frames > 0) frames / f.getSampleRate.toDouble else 0.0,
            0.0)
        val big = f.isBigEndian
        val signed = f.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        var sumSq = 0.0; var n = 0L
        val buf = new Array[Byte](frameSize * 4096)
        var read = ais.read(buf)
        while (read > 0) {
          var i = 0
          val step = bits / 8
          while (i + step <= read) {
            val raw =
              if (bits == 8) {
                val v = if (signed) buf(i).toInt else (buf(i) & 0xff) - 128
                v / 128.0
              } else {
                val (lo, hi) = if (big) (buf(i + 1), buf(i)) else (buf(i), buf(i + 1))
                val v0 = ((hi.toInt << 8) | (lo & 0xff)).toShort.toInt
                val v = if (signed) v0 else ((((hi & 0xff) << 8) | (lo & 0xff)) - 32768)
                v / 32768.0
              }
            sumSq += raw * raw; n += 1
            i += step
          }
          read = ais.read(buf)
        }
        val rms = if (n == 0) 0.0 else math.sqrt(sumSq / n)
        AudioMeta(id, ok = true, container, f.getSampleRate.toDouble,
          f.getChannels, bits, frames, frames / f.getSampleRate.toDouble,
          rms)
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => bad }
  }

  /** One MP3 stream's frame-header metadata. `ok=false` carries zeroed
    * fields for input that is not a parseable MP3 stream.
    */
  final case class Mp3Meta(
      id: Long, ok: Boolean, version: String, layer: Int,
      sampleRate: Int, channels: Int, bitrateKbps: Double,
      nFrames: Long, durationSec: Double, vbr: Boolean)

  /** COMPRESSED-audio metadata via a pure-JDK MP3 frame-header scan —
    * no codec dependency, because everything an audio-curation pass
    * needs up front (duration, sample rate, channel count, average
    * bitrate, CBR/VBR) lives in the 4-byte frame headers: sync word
    * (11 set bits), MPEG version / layer bits, and the published
    * bitrate/sample-rate tables give each frame's byte length, so the
    * scan hops header-to-header without touching entropy-coded audio
    * data. A leading ID3v2 tag is skipped via its syncsafe size (and
    * footer flag); trailing garbage/ID3v1 ends the walk. A stream must
    * chain at least `minFrames` CONSISTENT frames (same version/layer/
    * sample rate) to count — a lone false sync in random bytes cannot
    * satisfy the chained length arithmetic, which is the standard
    * resync heuristic. Malformed input isolates as ok=false (the
    * [[decodePpm]] contract); decoding SAMPLES (RMS etc.) still needs
    * a real codec — this retires the metadata leaf only, which is what
    * corpus screens actually read. Same `mapPartitions` batch shape as
    * the rest of the decode family.
    */
  def mp3Meta(df: DataFrame, idCol: String = "doc_id",
      mediaCol: String = "media", minFrames: Int = 2): Dataset[Mp3Meta] = {
    require(minFrames > 0, s"minFrames must be positive, got $minFrames")
    val rows = df.select(col(idCol).cast("long"), col(mediaCol))
    rows.mapPartitions { it =>
      it.map { r =>
        val id = if (r.isNullAt(0)) -1L else r.getLong(0)
        val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        if (r.isNullAt(0))
          Mp3Meta(id, ok = false, "", 0, 0, 0, 0.0, 0L, 0.0, vbr = false)
        else parseMp3(id, bytes, minFrames)
      }
    }(Encoders.product[Mp3Meta])
  }

  // MPEG audio bitrate tables in kbps, indexed 1..14 (0 = "free",
  // 15 = invalid — both rejected); ISO/IEC 11172-3 table B.2 and the
  // 13818-3 low-sample-rate extension
  private val BrV1 = Array(
    Array(32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448), // L1
    Array(32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384), // L2
    Array(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)) // L3
  private val BrV2 = Array(
    Array(32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256), // L1
    Array(8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160), // L2
    Array(8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)) // L3
  private val SrV1 = Array(44100, 48000, 32000)

  /** One parsed MP3 frame header: (version id, layer, bitrate bps,
    * sample rate, channels, samples/frame, frame length in bytes).
    */
  private final case class Mp3Frame(
    ver: Int, layer: Int, bitrate: Int, rate: Int, channels: Int,
    spf: Int, len: Int)

  private def mp3Header(bytes: Array[Byte], pos: Int): Option[Mp3Frame] = {
    if (pos < 0 || pos + 4 > bytes.length) return None
    val b1 = bytes(pos + 1) & 0xff
    if ((bytes(pos) & 0xff) != 0xff || (b1 & 0xe0) != 0xe0) return None
    val ver = (b1 >> 3) & 3 // 0 = MPEG2.5, 1 = reserved, 2 = MPEG2, 3 = MPEG1
    val layerBits = (b1 >> 1) & 3 // 0 reserved; layer = 4 - bits
    if (ver == 1 || layerBits == 0) return None
    val layer = 4 - layerBits
    val b2 = bytes(pos + 2) & 0xff
    val brIdx = (b2 >> 4) & 0xf
    val srIdx = (b2 >> 2) & 3
    if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None
    val pad = (b2 >> 1) & 1
    val channels = if (((bytes(pos + 3) & 0xff) >> 6) == 3) 1 else 2
    val table = if (ver == 3) BrV1 else BrV2
    val bitrate = table(layer - 1)(brIdx - 1) * 1000
    val rate = ver match {
      case 3 => SrV1(srIdx)
      case 2 => SrV1(srIdx) / 2
      case _ => SrV1(srIdx) / 4
    }
    val spf =
      if (layer == 1) 384
      else if (layer == 2) 1152
      else if (ver == 3) 1152 else 576
    val len =
      if (layer == 1) (12 * bitrate / rate + pad) * 4
      else spf / 8 * bitrate / rate + pad
    if (len < 4) None
    else Some(Mp3Frame(ver, layer, bitrate, rate, channels, spf, len))
  }

  /** Scan one buffer; total function (malformed → ok=false). */
  private[graft] def parseMp3(id: Long, bytes: Array[Byte],
      minFrames: Int = 2): Mp3Meta = {
    val bad = Mp3Meta(id, ok = false, "", 0, 0, 0, 0.0, 0L, 0.0,
      vbr = false)
    if (bytes == null || bytes.length < 4) return bad
    var start = 0
    // ID3v2: "ID3" <maj> <min> <flags> <4-byte syncsafe size>
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' &&
      bytes(2) == '3') {
      val size = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
        ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
      start = 10 + size + (if ((bytes(5) & 0x10) != 0) 10 else 0)
      if (start < 0 || start >= bytes.length) return bad
    }
    // resync: the first header whose implied chain holds for minFrames
    // consistent frames (a false sync in random bytes fails the hop
    // arithmetic almost surely)
    var p = start
    while (p + 4 <= bytes.length) {
      mp3Header(bytes, p) match {
        case Some(first) =>
          var pos = p
          var frames = 0L
          var brSum = 0.0
          var vbr = false
          var dur = 0.0
          var chain = true
          while (chain) {
            mp3Header(bytes, pos) match {
              case Some(f) if f.ver == first.ver &&
                  f.layer == first.layer && f.rate == first.rate =>
                frames += 1
                brSum += f.bitrate / 1000.0
                if (f.bitrate != first.bitrate) vbr = true
                dur += f.spf.toDouble / f.rate
                pos += f.len
              case _ => chain = false
            }
          }
          if (frames >= minFrames)
            return Mp3Meta(id, ok = true,
              version = first.ver match {
                case 3 => "MPEG1"
                case 2 => "MPEG2"
                case _ => "MPEG2.5"
              },
              layer = first.layer, sampleRate = first.rate,
              channels = first.channels,
              bitrateKbps = brSum / frames, nFrames = frames,
              durationSec = dur, vbr = vbr)
          p += 1
        case None => p += 1
      }
    }
    bad
  }

  /** One sampled + decoded video frame (MJPEG). */
  final case class VideoFrame(
      id: Long, frameIdx: Int, ok: Boolean, width: Int, height: Int,
      meanR: Double, meanG: Double, meanB: Double)

  /** REAL video frame-sampling for Motion-JPEG streams — the format is
    * a plain concatenation of JPEG images, so frame boundaries fall out
    * of the JPEG marker structure (`FF D8` SOI … `FF D9` EOI; inside
    * entropy-coded data every `FF` is `00`-stuffed, so the EOI scan
    * cannot false-positive there) and each kept frame decodes through
    * the same pure-JDK [[decodeImage]] codec. Keeps every `stride`-th
    * frame up to `maxFrames` — the sample-don't-decode-everything
    * shape of video curation; skipped frames are never decoded, only
    * marker-scanned. Caveat (documented, not hit by MJPEG writers):
    * a frame carrying an embedded EXIF thumbnail contains a nested
    * EOI and would split early — such frames isolate as ok=false
    * rather than failing the job. Same `mapPartitions` batch shape and
    * per-item isolation as the rest of the decode family. For MP3
    * streams, [[mp3Meta]] plays the analogous sample-don't-decode
    * role on the audio side.
    */
  def sampleMjpegFrames(df: DataFrame, idCol: String = "doc_id",
      mediaCol: String = "media", stride: Int = 4, maxFrames: Int = 64,
      maxRasterBytes: Long = 256L * 1024 * 1024): Dataset[VideoFrame] = {
    require(stride > 0 && maxFrames > 0, "stride/maxFrames must be positive")
    val rows = df.select(col(idCol).cast("long"), col(mediaCol))
    rows.mapPartitions { it =>
      // per-partition decoder context (ImageIO plugin scan)
      it.flatMap { r =>
        val id = if (r.isNullAt(0)) -1L else r.getLong(0)
        val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        if (r.isNullAt(0) || bytes == null || bytes.length < 4)
          Seq(VideoFrame(id, -1, ok = false, 0, 0, 0.0, 0.0, 0.0))
        else {
          val frames = splitMjpeg(bytes)
          if (frames.isEmpty)
            Seq(VideoFrame(id, -1, ok = false, 0, 0, 0.0, 0.0, 0.0))
          else frames.zipWithIndex
            .filter { case (_, i) => i % stride == 0 }
            .take(maxFrames)
            .map { case ((from, until), i) =>
              val m = decodeOneImage(id,
                java.util.Arrays.copyOfRange(bytes, from, until),
                maxRasterBytes)
              VideoFrame(id, i, m.ok, m.width, m.height,
                m.meanR, m.meanG, m.meanB)
            }
        }
      }
    }(Encoders.product[VideoFrame])
  }

  /** [from, until) byte ranges of the JPEG frames in an MJPEG stream:
    * SOI (`FF D8`) to the byte after the matching EOI (`FF D9`).
    * Truncated trailing frames are dropped; inter-frame padding is
    * skipped. Total function — garbage yields an empty list.
    */
  private[graft] def splitMjpeg(bytes: Array[Byte]): List[(Int, Int)] = {
    val out = scala.collection.mutable.ListBuffer.empty[(Int, Int)]
    var i = 0
    val n = bytes.length
    while (i + 1 < n) {
      if ((bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == 0xd8) {
        val start = i
        var j = i + 2
        var end = -1
        while (j + 1 < n && end < 0) {
          if ((bytes(j) & 0xff) == 0xff && (bytes(j + 1) & 0xff) == 0xd9)
            end = j + 2
          j += 1
        }
        if (end < 0) i = n // truncated final frame: drop, stop
        else { out += ((start, end)); i = end }
      } else i += 1
    }
    out.toList
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

  final case class ExifMeta(
      id: Long, ok: Boolean, orientation: Int, make: String,
      model: String)

  /** EXIF metadata via a pure-JDK JPEG segment + TIFF IFD walk — the
    * orientation tag decides whether a training image needs rotating
    * BEFORE any pixel work, and Make/Model power device-distribution
    * audits. The walk: JPEG marker segments to APP1 `Exif\0\0`, TIFF
    * byte-order header (II/MM both supported), IFD0 entries for tags
    * 0x0112 (orientation SHORT), 0x010F/0x0110 (Make/Model ASCII,
    * inline or offset value). Everything is bounds-checked; any
    * malformation isolates as ok=false ([[decodePpm]] contract). A
    * JPEG without APP1 is ok=false (no EXIF), orientation 0 means
    * "EXIF present but tag absent".
    */
  def exifMeta(df: DataFrame, idCol: String = "doc_id",
      mediaCol: String = "media"): Dataset[ExifMeta] = {
    val rows = df.select(col(idCol).cast("long"), col(mediaCol))
    rows.mapPartitions { it =>
      it.map { r =>
        if (r.isNullAt(0)) ExifMeta(-1L, ok = false, 0, "", "")
        else if (r.isNullAt(1))
          ExifMeta(r.getLong(0), ok = false, 0, "", "")
        else parseExif(r.getLong(0), r.getAs[Array[Byte]](1))
      }
    }(Encoders.product[ExifMeta])
  }

  private[graft] def parseExif(id: Long, bytes: Array[Byte]): ExifMeta = {
    val fail = ExifMeta(id, ok = false, 0, "", "")
    try {
      val n = bytes.length
      def u8(p: Int) = bytes(p) & 0xff
      if (n < 4 || u8(0) != 0xff || u8(1) != 0xd8) return fail
      var p = 2
      while (p + 4 <= n) {
        if (u8(p) != 0xff) return fail
        val marker = u8(p + 1)
        if (marker == 0xd9 || marker == 0xda) return fail
        val segLen = (u8(p + 2) << 8) | u8(p + 3)
        if (segLen < 2 || p + 2 + segLen > n) return fail
        if (marker == 0xe1 && segLen >= 8 &&
          bytes.slice(p + 4, p + 10).sameElements(
            Array[Byte]('E', 'x', 'i', 'f', 0, 0)))
          return parseTiffIfd0(id, bytes, p + 10, p + 2 + segLen)
        p += 2 + segLen
      }
      fail
    } catch { case _: Exception => fail }
  }

  private def parseTiffIfd0(
      id: Long, bytes: Array[Byte], base: Int, end: Int): ExifMeta = {
    val fail = ExifMeta(id, ok = false, 0, "", "")
    def u8(p: Int) = bytes(p) & 0xff
    if (base + 8 > end) return fail
    val little =
      if (u8(base) == 'I' && u8(base + 1) == 'I') true
      else if (u8(base) == 'M' && u8(base + 1) == 'M') false
      else return fail
    def r16(p: Int): Int =
      if (little) u8(p) | (u8(p + 1) << 8)
      else (u8(p) << 8) | u8(p + 1)
    def r32(p: Int): Long =
      if (little) u8(p).toLong | (u8(p + 1).toLong << 8) |
        (u8(p + 2).toLong << 16) | (u8(p + 3).toLong << 24)
      else (u8(p).toLong << 24) | (u8(p + 1).toLong << 16) |
        (u8(p + 2).toLong << 8) | u8(p + 3).toLong
    if (r16(base + 2) != 42) return fail
    val ifd = base + r32(base + 4).toInt
    if (ifd + 2 > end) return fail
    val count = r16(ifd)
    var orientation = 0
    var make = ""
    var model = ""
    def ascii(countN: Long, valueP: Int): String = {
      val vp =
        if (countN <= 4) valueP else base + r32(valueP).toInt
      if (vp < base || vp + countN.toInt > end) ""
      else new String(bytes, vp, countN.toInt, "ISO-8859-1")
        .takeWhile(_ != 0.toChar).trim
    }
    var i = 0
    while (i < count) {
      val e = ifd + 2 + i * 12
      if (e + 12 > end) return fail
      val tag = r16(e)
      val typ = r16(e + 2)
      val cnt = r32(e + 4)
      tag match {
        case 0x0112 if typ == 3 && cnt == 1 => orientation = r16(e + 8)
        case 0x010f if typ == 2 => make = ascii(cnt, e + 8)
        case 0x0110 if typ == 2 => model = ascii(cnt, e + 8)
        case _ => ()
      }
      i += 1
    }
    ExifMeta(id, ok = true, orientation, make, model)
  }

  final case class Mp4Meta(
      id: Long, ok: Boolean, majorBrand: String, timescale: Long,
      durationSec: Double, nTracks: Int, width: Int, height: Int,
      codecs: String)

  /** MP4/ISO-BMFF container metadata via a pure-JDK box walk — the
    * codec-free slice of "video support" a corpus screen needs:
    * brand, duration (mvhd, version 0 and 1), track count, the
    * first visual track's pixel dimensions (tkhd 16.16 fixed-point),
    * and each track's sample-description fourcc (stsd — `avc1`,
    * `hvc1`, `mp4a`, ..., comma-joined in track order), so an audit
    * pass can inventory codecs without decoding a frame.
    * Boxes are length-prefixed so the walk never touches sample data;
    * 64-bit `size==1` largesize boxes are handled, `size==0`
    * (to-end-of-file) terminates the level. Malformed input isolates
    * as ok=false. Decoding actual FRAMES still needs a real codec —
    * [[sampleMjpegFrames]] remains the decodable-video path.
    */
  def mp4Meta(df: DataFrame, idCol: String = "doc_id",
      mediaCol: String = "media"): Dataset[Mp4Meta] = {
    val rows = df.select(col(idCol).cast("long"), col(mediaCol))
    rows.mapPartitions { it =>
      it.map { r =>
        if (r.isNullAt(0))
          Mp4Meta(-1L, ok = false, "", 0L, 0.0, 0, 0, 0, "")
        else if (r.isNullAt(1))
          Mp4Meta(r.getLong(0), ok = false, "", 0L, 0.0, 0, 0, 0, "")
        else parseMp4(r.getLong(0), r.getAs[Array[Byte]](1))
      }
    }(Encoders.product[Mp4Meta])
  }

  private[graft] def parseMp4(id: Long, bytes: Array[Byte]): Mp4Meta = {
    val fail = Mp4Meta(id, ok = false, "", 0L, 0.0, 0, 0, 0, "")
    try {
      val n = bytes.length
      def u8(p: Int) = bytes(p) & 0xff
      def b32(p: Int): Long =
        (u8(p).toLong << 24) | (u8(p + 1).toLong << 16) |
          (u8(p + 2).toLong << 8) | u8(p + 3).toLong
      def b64(p: Int): Long = (b32(p) << 32) | b32(p + 4)
      def typ(p: Int): String = new String(bytes, p, 4, "ISO-8859-1")
      // walk one box level [from, to); f(bodyStart, bodyEnd, type)
      def walk(from: Int, to: Int)(f: (Int, Int, String) => Unit): Unit = {
        var p = from
        while (p + 8 <= to) {
          val size0 = b32(p)
          val t = typ(p + 4)
          val (body, boxEnd) =
            if (size0 == 1L && p + 16 <= to) (p + 16, p + b64(p + 8))
            else if (size0 == 0L) (p + 8, to.toLong)
            else (p + 8, p + size0)
          if (boxEnd < body || boxEnd > to) return
          f(body, boxEnd.toInt, t)
          p = boxEnd.toInt
        }
      }
      var brand = ""
      var timescale = 0L
      var duration = 0L
      var nTracks = 0
      var w = 0
      var h = 0
      var sawMoov = false
      val codecs = scala.collection.mutable.ListBuffer.empty[String]
      walk(0, n) { (body, bend, t) =>
        t match {
          case "ftyp" if bend - body >= 4 => brand = typ(body)
          case "moov" =>
            sawMoov = true
            walk(body, bend) { (b2, e2, t2) =>
              t2 match {
                case "mvhd" if e2 - b2 >= 4 =>
                  val v = u8(b2)
                  if (v == 0 && e2 - b2 >= 20) {
                    timescale = b32(b2 + 12); duration = b32(b2 + 16)
                  } else if (v == 1 && e2 - b2 >= 32) {
                    timescale = b32(b2 + 20); duration = b64(b2 + 24)
                  }
                case "trak" =>
                  nTracks += 1
                  walk(b2, e2) { (b3, e3, t3) =>
                    if (t3 == "tkhd" && e3 - b3 >= 4) {
                      val v = u8(b3)
                      // tkhd layout: ver/flags 4 + times/id/reserved/
                      // duration (20 v0 / 32 v1) + reserved 8 + layer/
                      // alt/volume/reserved 8 + matrix 36 -> 76 / 88
                      val dimOff = if (v == 1) 88 else 76
                      if (e3 - b3 >= dimOff + 8 && w == 0) {
                        val tw = (b32(b3 + dimOff) >> 16).toInt
                        val th = (b32(b3 + dimOff + 4) >> 16).toInt
                        if (tw > 0 && th > 0) { w = tw; h = th }
                      }
                    } else if (t3 == "mdia") {
                      // the sample-description fourcc: trak > mdia >
                      // minf > stbl > stsd, first sample entry
                      walk(b3, e3) { (b4, e4, t4) =>
                        if (t4 == "minf") walk(b4, e4) { (b5, e5, t5) =>
                          if (t5 == "stbl") walk(b5, e5) {
                            (b6, e6, t6) =>
                              // stsd body: ver/flags 4 + count 4, then
                              // entries (size 4 + fourcc 4 + ...)
                              if (t6 == "stsd" && e6 - b6 >= 16 &&
                                  b32(b6 + 4) > 0L)
                                codecs += typ(b6 + 12)
                          }
                        }
                      }
                    }
                  }
                case _ => ()
              }
            }
          case _ => ()
        }
      }
      if (!sawMoov && brand.isEmpty) fail
      else Mp4Meta(id, ok = sawMoov, brand, timescale,
        if (timescale > 0) duration.toDouble / timescale else 0.0,
        nTracks, w, h, codecs.mkString(","))
    } catch { case _: Exception => fail }
  }

  final case class MkvMeta(
      id: Long, ok: Boolean, docType: String, durationSec: Double,
      nTracks: Int, width: Int, height: Int, codecs: String)

  /** Matroska/WebM container metadata via a pure-JDK EBML walk — the
    * [[mp4Meta]] discipline for the other half of a video lake:
    * DocType (`matroska` / `webm`), duration (Segment > Info >
    * Duration scaled by TimestampScale, ns by default), track count,
    * the first video track's pixel dimensions, and each track's
    * CodecID (`V_VP9`, `A_OPUS`, ..., comma-joined in track order).
    * EBML elements are length-prefixed varints so the walk skips
    * cluster/sample data wholesale; an unknown-size element (all-ones
    * varint — streamed Segments use it) extends to its parent's end.
    * Malformed input isolates as ok=false; no codec is ever invoked.
    */
  def mkvMeta(df: DataFrame, idCol: String = "doc_id",
      mediaCol: String = "media"): Dataset[MkvMeta] = {
    val rows = df.select(col(idCol).cast("long"), col(mediaCol))
    rows.mapPartitions { it =>
      it.map { r =>
        if (r.isNullAt(0)) MkvMeta(-1L, ok = false, "", 0.0, 0, 0, 0, "")
        else if (r.isNullAt(1))
          MkvMeta(r.getLong(0), ok = false, "", 0.0, 0, 0, 0, "")
        else parseMkv(r.getLong(0), r.getAs[Array[Byte]](1))
      }
    }(Encoders.product[MkvMeta])
  }

  private[graft] def parseMkv(id: Long, bytes: Array[Byte]): MkvMeta = {
    val fail = MkvMeta(id, ok = false, "", 0.0, 0, 0, 0, "")
    try {
      val n = bytes.length
      def u8(p: Int) = bytes(p) & 0xff
      // EBML varint: leading-zero count of the first byte gives the
      // width; `keepMarker` keeps the marker bit (element IDs compare
      // with it), sizes strip it. Returns (value, nextPos); the
      // all-ones size value means "unknown size".
      def varint(p: Int, keepMarker: Boolean): (Long, Int) = {
        if (p >= n) throw new IndexOutOfBoundsException
        val first = u8(p)
        if (first == 0) throw new NumberFormatException("bad varint")
        val len = Integer.numberOfLeadingZeros(first) - 23
        if (p + len > n) throw new IndexOutOfBoundsException
        var v = if (keepMarker) first.toLong
          else (first & (0xff >> len)).toLong
        var i = 1
        while (i < len) { v = (v << 8) | u8(p + i); i += 1 }
        (v, p + len)
      }
      def unknownSize(size: Long, widthBits: Int): Boolean =
        size == (1L << widthBits) - 1L
      def uintAt(p: Int, len: Int): Long = {
        var v = 0L; var i = 0
        while (i < len) { v = (v << 8) | u8(p + i); i += 1 }
        v
      }
      def floatAt(p: Int, len: Int): Double =
        if (len == 4) java.lang.Float.intBitsToFloat(uintAt(p, 4).toInt)
          .toDouble
        else if (len == 8) java.lang.Double.longBitsToDouble(uintAt(p, 8))
        else 0.0
      // walk one element level [from, to); f(elementId, bodyStart,
      // bodyEnd) — unknown-size bodies extend to `to`
      def walk(from: Int, to: Int)(f: (Long, Int, Int) => Unit): Unit = {
        var p = from
        while (p < to) {
          val (eid, afterId) = varint(p, keepMarker = true)
          val sizeWidth0 = Integer.numberOfLeadingZeros(u8(afterId)) - 23
          val (sz, body) = varint(afterId, keepMarker = false)
          val bend =
            if (unknownSize(sz, 7 * sizeWidth0)) to.toLong
            else body.toLong + sz
          if (bend < body || bend > to) return
          f(eid, body, bend.toInt)
          p = bend.toInt
        }
      }
      var docType = ""
      var tsScale = 1000000L // EBML default: 1e6 ns per tick
      var durTicks = 0.0
      var nTracks = 0
      var w = 0
      var h = 0
      var sawSegment = false
      val codecs = scala.collection.mutable.ListBuffer.empty[String]
      walk(0, n) { (eid, body, bend) =>
        eid match {
          case 0x1A45DFA3L => // EBML header
            walk(body, bend) { (id2, b2, e2) =>
              if (id2 == 0x4282L) // DocType
                docType = new String(bytes, b2, e2 - b2, "ISO-8859-1")
                  .takeWhile(c => c != ' ' && c != '\u0000')
            }
          case 0x18538067L => // Segment
            sawSegment = true
            walk(body, bend) { (id2, b2, e2) =>
              id2 match {
                case 0x1549A966L => // Info
                  walk(b2, e2) { (id3, b3, e3) =>
                    if (id3 == 0x2AD7B1L) tsScale = uintAt(b3, e3 - b3)
                    else if (id3 == 0x4489L)
                      durTicks = floatAt(b3, e3 - b3)
                  }
                case 0x1654AE6BL => // Tracks
                  walk(b2, e2) { (id3, b3, e3) =>
                    if (id3 == 0xAEL) { // TrackEntry
                      nTracks += 1
                      walk(b3, e3) { (id4, b4, e4) =>
                        if (id4 == 0x86L) // CodecID
                          codecs += new String(bytes, b4, e4 - b4,
                            "ISO-8859-1").takeWhile(c => c != ' ' && c != '\u0000')
                        else if (id4 == 0xE0L) // Video
                          walk(b4, e4) { (id5, b5, e5) =>
                            if (id5 == 0xB0L && w == 0)
                              w = uintAt(b5, e5 - b5).toInt
                            else if (id5 == 0xBAL && h == 0)
                              h = uintAt(b5, e5 - b5).toInt
                          }
                      }
                    }
                  }
                case _ => ()
              }
            }
          case _ => ()
        }
      }
      if (!sawSegment && docType.isEmpty) fail
      else MkvMeta(id, ok = sawSegment, docType,
        durTicks * tsScale.toDouble / 1e9, nTracks, w, h,
        codecs.mkString(","))
    } catch { case _: Exception => fail }
  }

  /** One FLAC stream's STREAMINFO metadata. `ok=false` carries zeroed
    * fields for input that is not a FLAC stream.
    */
  final case class FlacMeta(
      id: Long, ok: Boolean, sampleRate: Int, channels: Int,
      bits: Int, totalSamples: Long, durationSec: Double,
      nBlocks: Int, hasTags: Boolean, md5: String)

  /** Lossless-audio container metadata via a pure-JDK FLAC
    * STREAMINFO parse (the RFC 9639 bitfield layout) — the
    * [[mp3Meta]] discipline for the archival half of an audio lake:
    * `fLaC` magic, then length-prefixed metadata blocks walked
    * without ever touching an audio frame. Reports sample rate
    * (20 bits), channels, bits per sample, the 36-bit total sample
    * count (0 = unknown by spec) and its duration, the metadata
    * block count, whether a VORBIS_COMMENT tag block is present, and
    * the decoded-audio MD5 (hex) — the integrity handle a corpus
    * dedup can key on without decoding. Malformed input isolates as
    * ok=false.
    */
  def flacMeta(df: DataFrame, idCol: String = "doc_id",
      mediaCol: String = "media"): Dataset[FlacMeta] = {
    val rows = df.select(col(idCol).cast("long"), col(mediaCol))
    rows.mapPartitions { it =>
      it.map { r =>
        if (r.isNullAt(0))
          FlacMeta(-1L, ok = false, 0, 0, 0, 0L, 0.0, 0, false, "")
        else if (r.isNullAt(1))
          FlacMeta(r.getLong(0), ok = false, 0, 0, 0, 0L, 0.0, 0,
            false, "")
        else parseFlac(r.getLong(0), r.getAs[Array[Byte]](1))
      }
    }(Encoders.product[FlacMeta])
  }

  private[graft] def parseFlac(id: Long,
      bytes: Array[Byte]): FlacMeta = {
    val fail = FlacMeta(id, ok = false, 0, 0, 0, 0L, 0.0, 0, false, "")
    try {
      val n = bytes.length
      if (n < 4 + 4 + 34) return fail
      def u8(p: Int) = bytes(p) & 0xff
      if (!(u8(0) == 'f' && u8(1) == 'L' && u8(2) == 'a' &&
        u8(3) == 'C')) return fail
      var p = 4
      var last = false
      var nBlocks = 0
      var hasTags = false
      var rate = 0; var ch = 0; var bits = 0
      var total = 0L; var md5 = ""
      var sawStreamInfo = false
      while (!last && p + 4 <= n) {
        val h = u8(p)
        last = (h & 0x80) != 0
        val tpe = h & 0x7f
        val len = (u8(p + 1) << 16) | (u8(p + 2) << 8) | u8(p + 3)
        val body = p + 4
        if (body + len > n) return fail
        nBlocks += 1
        if (tpe == 4) hasTags = true
        if (tpe == 0) { // STREAMINFO, fixed 34 bytes
          if (len != 34) return fail
          sawStreamInfo = true
          val b = body
          rate = (u8(b + 10) << 12) | (u8(b + 11) << 4) |
            (u8(b + 12) >> 4)
          ch = ((u8(b + 12) >> 1) & 0x7) + 1
          bits = (((u8(b + 12) & 1) << 4) | (u8(b + 13) >> 4)) + 1
          total = ((u8(b + 13) & 0xf).toLong << 32) |
            (u8(b + 14).toLong << 24) | (u8(b + 15).toLong << 16) |
            (u8(b + 16).toLong << 8) | u8(b + 17).toLong
          md5 = (b + 18 until b + 34)
            .map(i => f"${u8(i)}%02x").mkString
        }
        p = body + len
      }
      // STREAMINFO is mandatory and first per spec; a stream without
      // it (or with rate 0, which the spec forbids) is malformed
      if (!sawStreamInfo || rate <= 0) fail
      else FlacMeta(id, ok = true, rate, ch, bits, total,
        if (total > 0) total.toDouble / rate else 0.0,
        nBlocks, hasTags, md5)
    } catch { case _: Exception => fail }
  }

  /** One Ogg stream's identification metadata. `ok=false` carries
    * zeroed fields for input that is not an Ogg stream.
    */
  final case class OggMeta(
      id: Long, ok: Boolean, codec: String, channels: Int,
      sampleRate: Int, nPages: Int, lastGranule: Long,
      durationSec: Double)

  /** Streaming-audio container metadata via a pure-JDK Ogg page walk
    * (RFC 3533) + the Vorbis/Opus identification headers — the
    * compressed half of the audio-lake probe beside [[flacMeta]]:
    * pages are length-prefixed (27-byte header + lacing table), so
    * the walk hops page to page without touching codec data. The
    * FIRST beginning-of-stream page names the codec (`\\x01vorbis`
    * ident: channels + rate; `OpusHead`: channels + pre-skip, output
    * clock fixed at 48 kHz by RFC 7845) and the LAST page's granule
    * position gives the duration (PCM samples for Vorbis; 48 kHz
    * samples minus pre-skip for Opus). Multiplexed secondary streams
    * are ignored (first BOS wins). Malformed input isolates as
    * ok=false.
    */
  def oggMeta(df: DataFrame, idCol: String = "doc_id",
      mediaCol: String = "media"): Dataset[OggMeta] = {
    val rows = df.select(col(idCol).cast("long"), col(mediaCol))
    rows.mapPartitions { it =>
      it.map { r =>
        if (r.isNullAt(0))
          OggMeta(-1L, ok = false, "", 0, 0, 0, 0L, 0.0)
        else if (r.isNullAt(1))
          OggMeta(r.getLong(0), ok = false, "", 0, 0, 0, 0L, 0.0)
        else parseOgg(r.getLong(0), r.getAs[Array[Byte]](1))
      }
    }(Encoders.product[OggMeta])
  }

  private[graft] def parseOgg(id: Long, bytes: Array[Byte]): OggMeta = {
    val fail = OggMeta(id, ok = false, "", 0, 0, 0, 0L, 0.0)
    try {
      val n = bytes.length
      def u8(p: Int) = bytes(p) & 0xff
      def u16le(p: Int) = u8(p) | (u8(p + 1) << 8)
      def u32le(p: Int) = u8(p).toLong | (u8(p + 1).toLong << 8) |
        (u8(p + 2).toLong << 16) | (u8(p + 3).toLong << 24)
      def u64le(p: Int) = u32le(p) | (u32le(p + 4) << 32)
      var p = 0
      var nPages = 0
      var codec = ""
      var ch = 0; var rate = 0; var preSkip = 0
      var serial = -1L // the first BOS stream's serial
      var lastGranule = 0L
      while (p + 27 <= n) {
        if (!(u8(p) == 'O' && u8(p + 1) == 'g' && u8(p + 2) == 'g' &&
          u8(p + 3) == 'S' && u8(p + 4) == 0)) {
          // sync lost: trailing garbage ends the walk (the mp3Meta
          // discipline); nothing parsed at all is malformed
          return if (nPages == 0) fail
            else finishOgg(id, codec, ch, rate, preSkip, nPages,
              lastGranule)
        }
        val flags = u8(p + 5)
        val granule = u64le(p + 6)
        val pageSerial = u32le(p + 14)
        val nSegs = u8(p + 26)
        if (p + 27 + nSegs > n) return fail
        var bodyLen = 0
        var i = 0
        while (i < nSegs) { bodyLen += u8(p + 27 + i); i += 1 }
        val body = p + 27 + nSegs
        if (body + bodyLen > n) return fail
        nPages += 1
        if ((flags & 0x02) != 0 && serial == -1L) { // first BOS page
          serial = pageSerial
          // codec identification packet starts the page body
          if (bodyLen >= 19 && u8(body) == 0x01 &&
            new String(bytes, body + 1, 6, "ISO-8859-1") == "vorbis") {
            codec = "vorbis"
            ch = u8(body + 11)
            rate = u32le(body + 12).toInt
          } else if (bodyLen >= 19 &&
            new String(bytes, body, 8, "ISO-8859-1") == "OpusHead") {
            codec = "opus"
            ch = u8(body + 9)
            preSkip = u16le(body + 10)
            rate = 48000 // RFC 7845: granule clock is always 48 kHz
          } else codec = "unknown"
        }
        if (pageSerial == serial && granule >= 0L)
          lastGranule = math.max(lastGranule, granule)
        p = body + bodyLen
      }
      if (nPages == 0) fail
      else finishOgg(id, codec, ch, rate, preSkip, nPages, lastGranule)
    } catch { case _: Exception => fail }
  }

  private def finishOgg(id: Long, codec: String, ch: Int, rate: Int,
      preSkip: Int, nPages: Int, lastGranule: Long): OggMeta = {
    val dur =
      if (rate <= 0) 0.0
      else if (codec == "opus")
        math.max(lastGranule - preSkip, 0L).toDouble / 48000.0
      else lastGranule.toDouble / rate
    OggMeta(id, ok = true, codec, ch, rate, nPages, lastGranule, dur)
  }
}
