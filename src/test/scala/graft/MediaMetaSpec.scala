package graft

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** EXIF (JPEG/TIFF IFD) and MP4 (ISO-BMFF box) metadata parsers over
  * byte-synthesized fixtures, plus mutation fuzz for the ok=false
  * isolation contract.
  */
class MediaMetaSpec extends SparkSpec {
  import spark.implicits._

  // -- EXIF fixture: SOI + APP1(Exif/TIFF little-endian IFD0) + EOI --

  private def u16be(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
  private def u16le(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
  private def u32le(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
    (v >> 16).toByte, (v >> 24).toByte)

  private def exifJpeg(orientation: Int, make: String): Array[Byte] = {
    val tiff = new ByteArrayOutputStream()
    tiff.write(Array[Byte]('I', 'I')); tiff.write(u16le(42))
    tiff.write(u32le(8)) // IFD0 at offset 8
    val makeBytes = (make + "\u0000").getBytes("ISO-8859-1")
    // 3 entries, then next-IFD pointer, then the out-of-line make text
    val makeOff = 8 + 2 + 3 * 12 + 4
    tiff.write(u16le(3))
    // 0x010F Make, ASCII, out-of-line
    tiff.write(u16le(0x010f)); tiff.write(u16le(2))
    tiff.write(u32le(makeBytes.length)); tiff.write(u32le(makeOff))
    // 0x0110 Model, ASCII, inline (<= 4 bytes incl. NUL)
    tiff.write(u16le(0x0110)); tiff.write(u16le(2))
    tiff.write(u32le(4))
    tiff.write(Array[Byte]('C', 'a', 'm', 0))
    // 0x0112 Orientation, SHORT, 1
    tiff.write(u16le(0x0112)); tiff.write(u16le(3))
    tiff.write(u32le(1)); tiff.write(u16le(orientation))
    tiff.write(u16le(0)) // value padding
    tiff.write(u32le(0)) // next IFD
    tiff.write(makeBytes)
    val t = tiff.toByteArray
    val out = new ByteArrayOutputStream()
    out.write(Array[Byte](0xff.toByte, 0xd8.toByte)) // SOI
    out.write(0xff); out.write(0xe1)                 // APP1
    out.write(u16be(2 + 6 + t.length))
    out.write(Array[Byte]('E', 'x', 'i', 'f', 0, 0))
    out.write(t)
    out.write(Array[Byte](0xff.toByte, 0xd9.toByte)) // EOI
    out.toByteArray
  }

  // -- MP4 fixture: ftyp + moov(mvhd v0 + trak(tkhd v0)) --

  private def box(tpe: String, body: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val size = 8 + body.length
    out.write(Array[Byte]((size >> 24).toByte, (size >> 16).toByte,
      (size >> 8).toByte, size.toByte))
    out.write(tpe.getBytes("ISO-8859-1"))
    out.write(body)
    out.toByteArray
  }

  private def u32be(v: Int) = Array[Byte]((v >> 24).toByte,
    (v >> 16).toByte, (v >> 8).toByte, v.toByte)

  private def stsdChain(fourcc: String): Array[Byte] =
    box("mdia", box("minf", box("stbl", box("stsd",
      Array[Byte](0, 0, 0, 0) ++ u32be(1) ++ // ver/flags + count
        u32be(16) ++ fourcc.getBytes("ISO-8859-1") ++ // sample entry
        Array.fill[Byte](8)(0)))))

  private def mp4(timescale: Int, duration: Int, w: Int,
      h: Int): Array[Byte] = {
    val ftyp = box("ftyp",
      "isom".getBytes ++ u32be(0) ++ "mp41".getBytes)
    val mvhd = box("mvhd", Array[Byte](0, 0, 0, 0) ++ // v0 + flags
      u32be(0) ++ u32be(0) ++ u32be(timescale) ++ u32be(duration) ++
      Array.fill[Byte](80)(0))
    val tkhd = box("tkhd", Array[Byte](0, 0, 0, 0) ++
      Array.fill[Byte](72)(0) ++ u32be(w << 16) ++ u32be(h << 16))
    val trak = box("trak", tkhd ++ stsdChain("avc1"))
    val audioTrak = box("trak", box("tkhd",
      Array[Byte](0, 0, 0, 0) ++ Array.fill[Byte](72)(0) ++
        u32be(0) ++ u32be(0)) ++ stsdChain("mp4a"))
    val moov = box("moov", mvhd ++ trak ++ audioTrak)
    ftyp ++ moov
  }

  // ── EBML/Matroska fixture helpers ─────────────────────────────────
  private def ebml(idBytes: Array[Int], body: Array[Byte]): Array[Byte] = {
    require(body.length < 0x4000)
    val size = // 2-byte size varint covers every fixture here
      Array[Byte]((0x40 | (body.length >> 8)).toByte, body.length.toByte)
    idBytes.map(_.toByte) ++ size ++ body
  }

  private def uintBody(v: Long, len: Int): Array[Byte] =
    (len - 1 to 0 by -1).map(i => ((v >> (8 * i)) & 0xff).toByte).toArray

  private def mkv(durTicks: Float, w: Int, h: Int): Array[Byte] = {
    val header = ebml(Array(0x1A, 0x45, 0xDF, 0xA3),
      ebml(Array(0x42, 0x82), "matroska".getBytes("ISO-8859-1")))
    val info = ebml(Array(0x15, 0x49, 0xA9, 0x66),
      ebml(Array(0x2A, 0xD7, 0xB1), uintBody(1000000L, 3)) ++
        ebml(Array(0x44, 0x89),
          u32be(java.lang.Float.floatToIntBits(durTicks))))
    val video = ebml(Array(0xAE),
      ebml(Array(0x83), uintBody(1L, 1)) ++
        ebml(Array(0x86), "V_VP9".getBytes("ISO-8859-1")) ++
        ebml(Array(0xE0),
          ebml(Array(0xB0), uintBody(w.toLong, 2)) ++
            ebml(Array(0xBA), uintBody(h.toLong, 2))))
    val audio = ebml(Array(0xAE),
      ebml(Array(0x83), uintBody(2L, 1)) ++
        ebml(Array(0x86), "A_OPUS".getBytes("ISO-8859-1")))
    val tracks = ebml(Array(0x16, 0x54, 0xAE, 0x6B), video ++ audio)
    val segment = ebml(Array(0x18, 0x53, 0x80, 0x67), info ++ tracks)
    header ++ segment
  }

  // ── FLAC / Ogg fixture helpers ────────────────────────────────────
  private def flac(rate: Int, ch: Int, bits: Int,
      total: Long, withTags: Boolean): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write("fLaC".getBytes("ISO-8859-1"))
    val si = new ByteArrayOutputStream()
    si.write(Array[Byte](0x10, 0x00, 0x10, 0x00)) // min/max block 4096
    si.write(Array.fill[Byte](6)(0))              // min/max frame size
    // rate(20) | ch-1(3) | bits-1(5) | total(36) packed big-endian
    si.write((rate >> 12) & 0xff)
    si.write((rate >> 4) & 0xff)
    si.write(((rate & 0xf) << 4) | ((ch - 1) << 1) |
      ((bits - 1) >> 4))
    si.write((((bits - 1) & 0xf) << 4) | ((total >> 32) & 0xf).toInt)
    si.write(((total >> 24) & 0xff).toInt)
    si.write(((total >> 16) & 0xff).toInt)
    si.write(((total >> 8) & 0xff).toInt)
    si.write((total & 0xff).toInt)
    si.write(Array.tabulate[Byte](16)(i => (i * 17).toByte)) // md5
    val body = si.toByteArray
    assert(body.length == 34)
    val lastFlag = if (withTags) 0x00 else 0x80
    out.write(lastFlag | 0x00) // STREAMINFO
    out.write(0); out.write(0); out.write(34)
    out.write(body)
    if (withTags) {
      val tag = "graft".getBytes("ISO-8859-1")
      out.write(0x80 | 0x04) // last VORBIS_COMMENT
      out.write(0); out.write(0); out.write(tag.length)
      out.write(tag)
    }
    out.toByteArray
  }

  private def oggPage(flags: Int, granule: Long, serial: Long,
      seq: Int, payload: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write("OggS".getBytes("ISO-8859-1"))
    out.write(0)            // version
    out.write(flags)
    (0 until 8).foreach(i => out.write(((granule >> (8 * i)) & 0xff).toInt))
    (0 until 4).foreach(i => out.write(((serial >> (8 * i)) & 0xff).toInt))
    (0 until 4).foreach(i => out.write((seq >> (8 * i)) & 0xff))
    out.write(Array.fill[Byte](4)(0)) // checksum (unchecked)
    // lacing: 255-chunks + terminator
    val full = payload.length / 255
    out.write(full + 1)
    (0 until full).foreach(_ => out.write(255))
    out.write(payload.length % 255)
    out.write(payload)
    out.toByteArray
  }

  private def opusHead(ch: Int, preSkip: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write("OpusHead".getBytes("ISO-8859-1"))
    out.write(1)                 // version
    out.write(ch)
    out.write(preSkip & 0xff); out.write((preSkip >> 8) & 0xff)
    (0 until 4).foreach(i => out.write((48000 >> (8 * i)) & 0xff))
    out.write(0); out.write(0)   // output gain
    out.write(0)                 // mapping family
    out.toByteArray
  }

  private def vorbisIdent(ch: Int, rate: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(1)
    out.write("vorbis".getBytes("ISO-8859-1"))
    (0 until 4).foreach(_ => out.write(0)) // version
    out.write(ch)
    (0 until 4).foreach(i => out.write((rate >> (8 * i)) & 0xff))
    out.write(Array.fill[Byte](4 * 3 + 1 + 1)(0))
    out.toByteArray
  }

  test("flacMeta: STREAMINFO bitfields, duration, tag detection, " +
    "audio md5; junk and truncation isolate") {
    val rows = Seq(
      (1L, flac(44100, 2, 16, 441000L, withTags = true)),
      (2L, flac(48000, 1, 24, 0L, withTags = false)),
      (3L, "fLaX not flac".getBytes),
      (4L, flac(44100, 2, 16, 441000L, withTags = true).take(20)))
      .toDF("doc_id", "media")
    val got = Multimodal.flacMeta(rows).collect().map(m => m.id -> m)
      .toMap
    val m = got(1L)
    assert(m.ok && m.sampleRate == 44100 && m.channels == 2 &&
      m.bits == 16, m)
    assert(m.totalSamples == 441000L && m.durationSec == 10.0, m)
    assert(m.nBlocks == 2 && m.hasTags, m)
    assert(m.md5 == (0 until 16).map(i => f"${(i * 17) & 0xff}%02x")
      .mkString, m)
    val m2 = got(2L)
    assert(m2.ok && m2.sampleRate == 48000 && m2.channels == 1 &&
      m2.bits == 24, m2)
    assert(m2.totalSamples == 0L && m2.durationSec == 0.0, m2)
    assert(m2.nBlocks == 1 && !m2.hasTags, m2)
    assert(!got(3L).ok && !got(4L).ok)
  }

  test("flacMeta fuzz: byte mutation and truncation never throw") {
    val base = flac(44100, 2, 16, 441000L, withTags = true)
    val rnd = new scala.util.Random(31)
    val rows = ((1 to 80).map { i =>
      val b = base.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      (i.toLong, b)
    } ++ (81 to 110).map { i =>
      (i.toLong, base.take(rnd.nextInt(base.length)))
    }).toDF("doc_id", "media")
    assert(Multimodal.flacMeta(rows).collect().length == 110)
  }

  test("oggMeta: Opus ident + 48kHz granule clock minus pre-skip, " +
    "Vorbis ident + own-rate granule, junk isolates, trailing " +
    "garbage ends the walk") {
    // opus: BOS ident page, then a final page at granule 96312 with
    // pre-skip 312 -> exactly 2.0 s of output audio
    val opus = oggPage(0x02, 0L, 7L, 0, opusHead(2, 312)) ++
      oggPage(0x04, 96312L, 7L, 1, Array[Byte](1, 2, 3))
    val vorb = oggPage(0x02, 0L, 9L, 0, vorbisIdent(1, 22050)) ++
      oggPage(0x04, 44100L, 9L, 1, Array[Byte](9))
    val rows = Seq(
      (1L, opus), (2L, vorb), (3L, "not ogg at all".getBytes),
      (4L, opus ++ "trailing garbage".getBytes))
      .toDF("doc_id", "media")
    val got = Multimodal.oggMeta(rows).collect().map(m => m.id -> m)
      .toMap
    val m = got(1L)
    assert(m.ok && m.codec == "opus" && m.channels == 2 &&
      m.sampleRate == 48000, m)
    assert(m.nPages == 2 && m.lastGranule == 96312L &&
      m.durationSec == 2.0, m)
    val v = got(2L)
    assert(v.ok && v.codec == "vorbis" && v.channels == 1 &&
      v.sampleRate == 22050, v)
    assert(v.durationSec == 2.0, v)
    assert(!got(3L).ok)
    val t = got(4L)
    assert(t.ok && t.nPages == 2 && t.durationSec == 2.0, t)
  }

  test("oggMeta fuzz: byte mutation and truncation never throw") {
    val base = oggPage(0x02, 0L, 7L, 0, opusHead(2, 312)) ++
      oggPage(0x04, 96312L, 7L, 1, Array.fill[Byte](300)(5))
    val rnd = new scala.util.Random(37)
    val rows = ((1 to 80).map { i =>
      val b = base.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      (i.toLong, b)
    } ++ (81 to 110).map { i =>
      (i.toLong, base.take(rnd.nextInt(base.length)))
    }).toDF("doc_id", "media")
    assert(Multimodal.oggMeta(rows).collect().length == 110)
  }

  test("exifMeta: orientation, inline model, out-of-line make") {
    val rows = Seq((1L, exifJpeg(6, "Acme Corp")),
      (2L, exifJpeg(1, "Zeta")),
      (3L, Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte,
        0xd9.toByte)), // JPEG without APP1
      (4L, "not a jpeg".getBytes))
      .toDF("doc_id", "media")
    val got = Multimodal.exifMeta(rows).collect()
      .map(m => m.id -> m).toMap
    assert(got(1L).ok && got(1L).orientation == 6 &&
      got(1L).make == "Acme Corp" && got(1L).model == "Cam", got(1L))
    assert(got(2L).ok && got(2L).orientation == 1 && got(2L).make == "Zeta")
    assert(!got(3L).ok && !got(4L).ok)
  }

  test("exifMeta: byte-mutation fuzz never throws") {
    val base = exifJpeg(3, "FuzzCam")
    val rnd = new scala.util.Random(17)
    val rows = (1 to 150).map { i =>
      val b = base.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      (i.toLong, b)
    }.toDF("doc_id", "media")
    assert(Multimodal.exifMeta(rows).collect().length == 150)
  }

  test("mp4Meta: brand, duration, track count, first visual dims") {
    val rows = Seq((1L, mp4(1000, 5500, 640, 360)),
      (2L, "RIFFnotmp4".getBytes))
      .toDF("doc_id", "media")
    val got = Multimodal.mp4Meta(rows).collect().map(m => m.id -> m)
      .toMap
    val m = got(1L)
    assert(m.ok && m.majorBrand == "isom", m)
    assert(m.timescale == 1000L && m.durationSec == 5.5, m)
    assert(m.nTracks == 2 && m.width == 640 && m.height == 360, m)
    // per-track sample-description fourccs, track order
    assert(m.codecs == "avc1,mp4a", m)
    assert(!got(2L).ok)
  }

  test("mkvMeta: doctype, scaled duration, track count, video dims, " +
    "per-track codec ids; junk input isolates") {
    val rows = Seq((1L, mkv(5500f, 640, 360)),
      (2L, "RIFFnotmkv".getBytes))
      .toDF("doc_id", "media")
    val got = Multimodal.mkvMeta(rows).collect().map(m => m.id -> m)
      .toMap
    val m = got(1L)
    assert(m.ok && m.docType == "matroska", m)
    // 5500 ticks x 1e6 ns/tick = 5.5 s (float32 duration is exact)
    assert(m.durationSec == 5.5, m)
    assert(m.nTracks == 2 && m.width == 640 && m.height == 360, m)
    assert(m.codecs == "V_VP9,A_OPUS", m)
    assert(!got(2L).ok)
  }

  test("mkvMeta: zero-padded EBML strings (Matroska spec) trim their " +
    "NULs — docType and codec equality survives padding") {
    // same fixture but DocType and the video CodecID zero-padded
    val header = ebml(Array(0x1A, 0x45, 0xDF, 0xA3),
      ebml(Array(0x42, 0x82),
        "webm\u0000\u0000".getBytes("ISO-8859-1")))
    val video = ebml(Array(0xAE),
      ebml(Array(0x83), uintBody(1L, 1)) ++
        ebml(Array(0x86), "V_VP9\u0000".getBytes("ISO-8859-1")))
    val tracks = ebml(Array(0x16, 0x54, 0xAE, 0x6B), video)
    val segment = ebml(Array(0x18, 0x53, 0x80, 0x67), tracks)
    val rows = Seq((1L, header ++ segment)).toDF("doc_id", "media")
    val m = Multimodal.mkvMeta(rows).collect().head
    assert(m.ok && m.docType == "webm", m)
    assert(m.codecs == "V_VP9", m)
  }

  test("mkvMeta: truncation and byte-mutation fuzz never throw") {
    val base = mkv(1200f, 320, 240)
    val rnd = new scala.util.Random(29)
    val rows = ((1 to 100).map { i =>
      val b = base.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      (i.toLong, b)
    } ++ (101 to 130).map { i =>
      (i.toLong, base.take(rnd.nextInt(base.length)))
    }).toDF("doc_id", "media")
    assert(Multimodal.mkvMeta(rows).collect().length == 130)
  }

  test("mp4Meta: truncation and byte-mutation fuzz never throw") {
    val base = mp4(600, 1200, 320, 240)
    val rnd = new scala.util.Random(23)
    val rows = ((1 to 100).map { i =>
      val b = base.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      (i.toLong, b)
    } ++ (101 to 130).map { i =>
      (i.toLong, base.take(rnd.nextInt(base.length)))
    }).toDF("doc_id", "media")
    assert(Multimodal.mp4Meta(rows).collect().length == 130)
  }
}
