package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** The `javax.imageio` decode family: JPEG/PNG/GIF/BMP with zero
  * external dependencies. The PNG cases cross-validate the JDK codec
  * against the repo's hand-rolled Inflater decoder — two independent
  * implementations agreeing exactly on the same bytes.
  */
class ImageIOSpec extends SparkSpec {
  import spark.implicits._

  /** Encode a BufferedImage to `fmt` bytes via the JDK writer. */
  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, bos), s"no JDK writer for $fmt")
    bos.toByteArray
  }

  /** Deterministic RGB test image (no Random — seeded LCG). */
  private def patterned(w: Int, h: Int, seed: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var s = seed
    for (y <- 0 until h; x <- 0 until w) {
      s = s * 1103515245 + 12345
      img.setRGB(x, y, s & 0xffffff)
    }
    img
  }

  private def uniform(w: Int, h: Int, rgb: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    img
  }

  test("decodeOneImage: JPEG — the format earlier rounds assumed " +
    "blocked decodes with the pure-JDK codec") {
    val bytes = encode(uniform(16, 12, 0x60A0C0), "jpeg")
    val m = Multimodal.decodeOneImage(7L, bytes)
    assert(m.ok && m.format == "jpeg")
    assert(m.width == 16 && m.height == 12)
    // JPEG is lossy: uniform images survive within a small tolerance
    assert(math.abs(m.meanR - 0x60) <= 3.0, s"meanR=${m.meanR}")
    assert(math.abs(m.meanG - 0xA0) <= 3.0, s"meanG=${m.meanG}")
    assert(math.abs(m.meanB - 0xC0) <= 3.0, s"meanB=${m.meanB}")
  }

  test("decodeOneImage agrees EXACTLY with the hand-rolled PNG decoder " +
    "on the same bytes") {
    val bytes = encode(patterned(23, 17, seed = 42), "png")
    val io = Multimodal.decodeOneImage(1L, bytes)
    val hand = Multimodal.decodeOnePng(1L, bytes)
    assert(io.ok && hand.ok && io.format == "png")
    assert(io.width == hand.width && io.height == hand.height)
    // both decoders sum exact 8-bit ints; doubles hold those sums
    // exactly, so the means must be bit-identical
    assert(io.meanR == hand.meanR && io.meanG == hand.meanG &&
      io.meanB == hand.meanB)
  }

  test("decodeOneImage: GIF and BMP recognized with correct dims") {
    val gif = Multimodal.decodeOneImage(2L, encode(uniform(9, 5, 0xFF0000), "gif"))
    assert(gif.ok && gif.format == "gif" && gif.width == 9 && gif.height == 5)
    assert(gif.meanR == 255.0 && gif.meanG == 0.0 && gif.meanB == 0.0)
    val bmp = Multimodal.decodeOneImage(3L, encode(uniform(6, 7, 0x00FF00), "bmp"))
    assert(bmp.ok && bmp.format == "bmp" && bmp.width == 6 && bmp.height == 7)
    assert(bmp.meanG == 255.0)
  }

  test("decodeOneImage: oversize raster refused BEFORE allocation, " +
    "dims preserved") {
    val bytes = encode(uniform(32, 32, 0x123456), "png")
    val m = Multimodal.decodeOneImage(4L, bytes, maxRasterBytes = 64L)
    assert(!m.ok && m.width == 32 && m.height == 32 && m.format == "png")
  }

  test("decodeOneImage is total on garbage and truncated inputs") {
    assert(!Multimodal.decodeOneImage(5L, null).ok)
    assert(!Multimodal.decodeOneImage(5L, Array.empty[Byte]).ok)
    var s = 99
    for (trial <- 0 until 50) {
      val n = (trial * 37) % 257
      val bytes = Array.tabulate(n) { i =>
        s = s * 1103515245 + 12345; (s >> 16).toByte
      }
      Multimodal.decodeOneImage(trial.toLong, bytes) // must not throw
    }
    // a real JPEG cut mid-stream must isolate, not throw
    val jpeg = encode(patterned(20, 20, 7), "jpeg")
    val cut = Multimodal.decodeOneImage(6L, jpeg.take(jpeg.length / 2))
    assert(!cut.ok || cut.width == 20) // either refused or header-only dims
  }

  test("decodeOneImageThumb matches decodeOnePngThumb cell-for-cell " +
    "on the same PNG bytes") {
    val bytes = encode(patterned(31, 22, seed = 11), "png")
    val io = Multimodal.decodeOneImageThumb(1L, bytes, 4, 3)
    val hand = Multimodal.decodeOnePngThumb(1L, bytes, 4, 3)
    assert(io.ok && hand.ok)
    assert(io.width == hand.width && io.height == hand.height)
    assert(io.pixels.toSeq == hand.pixels.toSeq)
  }

  test("decodeOneImageThumb: JPEG thumbnail near the source colors; " +
    "refused downscale keeps real dims") {
    val t = Multimodal.decodeOneImageThumb(2L,
      encode(uniform(16, 16, 0x405060), "jpeg"), 2, 2)
    assert(t.ok && t.pixels.length == 12)
    t.pixels.grouped(3).foreach { cell =>
      assert(math.abs(cell(0) - 0x40) <= 3f)
      assert(math.abs(cell(1) - 0x50) <= 3f)
      assert(math.abs(cell(2) - 0x60) <= 3f)
    }
    val small = Multimodal.decodeOneImageThumb(3L,
      encode(uniform(2, 2, 0), "png"), 4, 4)
    assert(!small.ok && small.width == 2 && small.height == 2)
  }

  test("image near-dedup E2E: JPEG re-encodes of the same picture pair " +
    "up via thumbnail embeddings; a different picture stays out") {
    // the multimodal dedup pipeline: bytes → ImageIO decode → box
    // thumbnail (= raw embedding) → bucketed cosine pairing. A JPEG
    // saved twice (second generation re-encode) is a near-dup; an
    // unrelated image is not.
    // structured images (noise would box-average to flat gray and make
    // EVERYTHING a near-dup): red|blue split vs the swapped layout —
    // their thumbnails are orthogonal, so cosine separates them hard
    def split(leftRgb: Int, rightRgb: Int): BufferedImage = {
      val im = new BufferedImage(32, 24, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 24; x <- 0 until 32)
        im.setRGB(x, y, if (x < 16) leftRgb else rightRgb)
      im
    }
    val gen1 = encode(split(0xFF0000, 0x0000FF), "jpeg")
    val gen2 = encode(ImageIO.read(
      new java.io.ByteArrayInputStream(gen1)), "jpeg")
    val other = encode(split(0x0000FF, 0xFF0000), "jpeg")
    val media = Seq((1L, gen1), (2L, gen2), (3L, other))
      .toDF("doc_id", "media")
    val emb = Multimodal.decodeImageThumb(media, thumbW = 4, thumbH = 4)
      .toDF().filter(col("ok"))
      .select(col("id"), transform(col("pixels"),
        p => (p / lit(255.0f)).cast("float")).as("vec"))
    val pairs = graft.sim.SimSearch.cosineNearDupPairs(
      emb, "id", "vec", threshold = 0.99, planes = 4, dim = 48)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((1L, 2L)), s"pairs=${pairs.toSeq}")
  }

  test("dHash: re-encode is hamming-near, swapped layout is far, " +
    "garbage is null; hammingNearDupPairs finds exactly the re-encode") {
    def grad(swap: Boolean): BufferedImage = {
      val im = new BufferedImage(36, 24, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 24; x <- 0 until 36) {
        val v = if (swap) (35 - x) * 7 else x * 7
        im.setRGB(x, y, v << 16 | v << 8 | v)
      }
      im
    }
    val gen1 = encode(grad(swap = false), "jpeg")
    val gen2 = encode(ImageIO.read(
      new java.io.ByteArrayInputStream(gen1)), "jpeg")
    val other = encode(grad(swap = true), "jpeg")
    val media = Seq((1L, gen1), (2L, gen2), (3L, other),
      (4L, Array[Byte](1, 2, 3))).toDF("doc_id", "media")
    val hashes = Multimodal.dHash(media)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toMap
    assert(hashes(4L) === ((false, None)))
    val Seq(h1, h2, h3) = Seq(1L, 2L, 3L).map(hashes(_)._2.get)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h1, h2) <= 3, s"re-encode drifted ${ham(h1, h2)} bits")
    // monotone gradient vs reversed gradient: all comparisons flip
    assert(ham(h1, h3) > 16, s"swap only ${ham(h1, h3)} bits away")
    val pairs = graft.text.Dedup.hammingNearDupPairs(
      Multimodal.dHash(media).filter(col("ok")), "id", "dhash",
      fpBits = 64, bands = 4, maxBits = 3)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("sampleMjpegFrames: strided frame sampling over a concatenated " +
    "JPEG stream decodes only the kept frames") {
    // 5-frame MJPEG "video": frame i is uniform gray level 40*i
    val stream = (0 until 5).flatMap(i =>
      encode(uniform(8, 6, (40 * i) * 0x010101), "jpeg")).toArray
    val df = Seq((1L, stream)).toDF("doc_id", "media")
    val frames = Multimodal.sampleMjpegFrames(df, stride = 2)
      .collect().sortBy(_.frameIdx)
    assert(frames.map(_.frameIdx).toSeq == Seq(0, 2, 4))
    assert(frames.forall(f => f.ok && f.width == 8 && f.height == 6))
    // frame brightness tracks the source pattern (JPEG-lossy tolerance)
    for ((f, i) <- frames.zip(Seq(0, 2, 4)))
      assert(math.abs(f.meanR - 40 * i) <= 3.0, s"frame $i: ${f.meanR}")
    // maxFrames caps the decode work
    val capped = Multimodal.sampleMjpegFrames(df, stride = 1, maxFrames = 2)
      .collect()
    assert(capped.length == 2)
  }

  test("splitMjpeg: truncated final frame dropped; garbage and null " +
    "isolate as a single ok=false row") {
    val one = encode(uniform(8, 6, 0x808080), "jpeg")
    val cut = one ++ one.take(one.length / 2)
    assert(Multimodal.splitMjpeg(cut).size == 1)
    assert(Multimodal.splitMjpeg("not a video".getBytes).isEmpty)
    val df = Seq(
      (1L, "garbage".getBytes), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "media")
    val out = Multimodal.sampleMjpegFrames(df).collect()
    assert(out.length == 2 && out.forall(f => !f.ok && f.frameIdx == -1))
  }

  test("decodeImage: Dataset-level mixed-format batch with per-item " +
    "isolation for null media") {
    val rows = Seq(
      (1L, encode(uniform(8, 8, 0x808080), "jpeg")),
      (2L, encode(uniform(8, 8, 0x808080), "png")),
      (3L, null.asInstanceOf[Array[Byte]]),
      (4L, "not an image".getBytes("UTF-8")))
    val df = rows.toDF("doc_id", "media")
    val out = Multimodal.decodeImage(df).collect().map(m => m.id -> m).toMap
    assert(out.size == 4)
    assert(out(1L).ok && out(1L).format == "jpeg")
    assert(out(2L).ok && out(2L).format == "png" && out(2L).meanR == 128.0)
    assert(!out(3L).ok && !out(4L).ok)
  }
}
