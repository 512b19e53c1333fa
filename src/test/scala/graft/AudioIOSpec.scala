package graft

import java.io.ByteArrayOutputStream
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import graft.multimodal.Multimodal

/** The `javax.sound.sampled` audio decode path: WAV/AIFF/AU metadata +
  * RMS with zero external dependencies.
  */
class AudioIOSpec extends SparkSpec {
  import spark.implicits._

  /** 16-bit PCM sine at `amp` (0..1), mono, encoded into `container`. */
  private def sineBytes(container: AudioFileFormat.Type, hz: Double,
      amp: Double, rate: Float, frames: Int,
      bigEndian: Boolean): Array[Byte] = {
    val pcm = new Array[Byte](frames * 2)
    for (i <- 0 until frames) {
      val v = (amp * 32767.0 *
        math.sin(2 * math.Pi * hz * i / rate)).toInt.toShort
      val (b0, b1) = ((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
      if (bigEndian) { pcm(2 * i) = b1; pcm(2 * i + 1) = b0 }
      else { pcm(2 * i) = b0; pcm(2 * i + 1) = b1 }
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, rate, 16,
      1, 2, rate, bigEndian)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, container, bos)
    bos.toByteArray
  }

  test("decodeOneAudio: WAV sine — exact metadata, RMS = amp/sqrt(2)") {
    val bytes = sineBytes(AudioFileFormat.Type.WAVE, hz = 440.0,
      amp = 0.5, rate = 8000f, frames = 8000, bigEndian = false)
    val m = Multimodal.decodeOneAudio(1L, bytes)
    assert(m.ok && m.format == "WAVE")
    assert(m.sampleRate == 8000.0 && m.channels == 1 && m.bits == 16)
    assert(m.nFrames == 8000L && m.durationSec == 1.0)
    assert(math.abs(m.rms - 0.5 / math.sqrt(2)) < 0.005, s"rms=${m.rms}")
  }

  test("decodeOneAudio: the same signal through WAV and AIFF containers " +
    "yields the same RMS") {
    val wav = Multimodal.decodeOneAudio(1L,
      sineBytes(AudioFileFormat.Type.WAVE, 220.0, 0.8, 8000f, 4000,
        bigEndian = false))
    val aiff = Multimodal.decodeOneAudio(2L,
      sineBytes(AudioFileFormat.Type.AIFF, 220.0, 0.8, 8000f, 4000,
        bigEndian = true))
    assert(wav.ok && aiff.ok && aiff.format == "AIFF")
    assert(math.abs(wav.rms - aiff.rms) < 1e-9,
      s"wav=${wav.rms} aiff=${aiff.rms}")
    assert(wav.nFrames == aiff.nFrames)
  }

  test("decodeOneAudio: silence scores rms 0; oversize refused with " +
    "metadata kept") {
    val silent = sineBytes(AudioFileFormat.Type.WAVE, 440.0, 0.0, 8000f,
      1000, bigEndian = false)
    val m = Multimodal.decodeOneAudio(1L, silent)
    assert(m.ok && m.rms == 0.0)
    val refused = Multimodal.decodeOneAudio(2L, silent, maxPcmBytes = 64L)
    assert(!refused.ok && refused.nFrames == 1000L &&
      refused.sampleRate == 8000.0)
  }

  test("decodeOneAudio is total on garbage and truncated input") {
    assert(!Multimodal.decodeOneAudio(1L, null).ok)
    assert(!Multimodal.decodeOneAudio(1L, Array.empty[Byte]).ok)
    var s = 7
    for (trial <- 0 until 50) {
      val n = (trial * 41) % 300
      val bytes = Array.tabulate(n) { i =>
        s = s * 1103515245 + 12345; (s >> 16).toByte
      }
      Multimodal.decodeOneAudio(trial.toLong, bytes) // must not throw
    }
    val wav = sineBytes(AudioFileFormat.Type.WAVE, 440.0, 0.5, 8000f,
      1000, bigEndian = false)
    // header-only truncation and mid-data truncation both isolate
    Multimodal.decodeOneAudio(1L, wav.take(10))
    Multimodal.decodeOneAudio(2L, wav.take(wav.length / 2))
  }

  /** Synthesize one MP3 frame: a valid 4-byte header + zero payload of
    * exactly the header-implied length. verRaw: 3=MPEG1, 2=MPEG2,
    * 0=MPEG2.5; layer: 1..3; brIdx/srIdx per the ISO tables.
    */
  private def mp3Frame(verRaw: Int, layer: Int, brIdx: Int, srIdx: Int,
      mono: Boolean, pad: Int = 0): Array[Byte] = {
    val brV1 = Array(
      Array(32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
      Array(32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
      Array(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320))
    val brV2 = Array(
      Array(32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
      Array(8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
      Array(8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160))
    val sr1 = Array(44100, 48000, 32000)
    val bitrate =
      (if (verRaw == 3) brV1 else brV2)(layer - 1)(brIdx - 1) * 1000
    val rate = verRaw match {
      case 3 => sr1(srIdx); case 2 => sr1(srIdx) / 2
      case _ => sr1(srIdx) / 4
    }
    val spf = if (layer == 1) 384
      else if (layer == 2) 1152
      else if (verRaw == 3) 1152 else 576
    val len = if (layer == 1) (12 * bitrate / rate + pad) * 4
      else spf / 8 * bitrate / rate + pad
    val f = new Array[Byte](len)
    f(0) = 0xff.toByte
    f(1) = (0xe0 | (verRaw << 3) | ((4 - layer) << 1) | 1).toByte
    f(2) = ((brIdx << 4) | (srIdx << 2) | (pad << 1)).toByte
    f(3) = (if (mono) 0xc0 else 0x00).toByte
    f
  }

  test("parseMp3: golden CBR MPEG1 Layer III stream — tables, frame " +
    "hop, duration; ID3v2 prefix and trailing garbage tolerated") {
    // 10 frames of 128 kbps 44.1 kHz stereo: frameLen = 417, each
    // frame 1152 samples
    val frames = Array.fill(10)(mp3Frame(3, 3, 9, 0, mono = false))
    val id3 = {
      val payload = 100
      val tag = new Array[Byte](10 + payload)
      tag(0) = 'I'; tag(1) = 'D'; tag(2) = '3'; tag(3) = 4
      tag(9) = payload.toByte // syncsafe size, fits in low 7 bits
      tag
    }
    val bytes = id3 ++ frames.flatten ++ "TAG padding".getBytes("UTF-8")
    val m = Multimodal.parseMp3(1L, bytes)
    assert(m.ok, s"golden stream did not parse: $m")
    assert(m.version == "MPEG1" && m.layer == 3)
    assert(m.sampleRate == 44100 && m.channels == 2)
    assert(m.bitrateKbps == 128.0 && !m.vbr)
    assert(m.nFrames == 10L)
    assert(math.abs(m.durationSec - 10 * 1152.0 / 44100) < 1e-9)
    // each golden frame's implied length: 144 * 128000 / 44100 = 417
    assert(frames.head.length == 417)
  }

  test("parseMp3: MPEG2.5 mono low-rate stream and VBR averaging") {
    // 8 kHz Layer III: spf 576, 16 kbps -> len 144; VBR mixes 16/24
    val frames = (0 until 6).map(i =>
      mp3Frame(0, 3, if (i % 2 == 0) 2 else 3, 2, mono = true))
    val m = Multimodal.parseMp3(2L, frames.flatten.toArray)
    assert(m.ok && m.version == "MPEG2.5" && m.sampleRate == 8000)
    assert(m.channels == 1 && m.vbr)
    assert(math.abs(m.bitrateKbps - 20.0) < 1e-9) // mean of 16 and 24
    assert(m.nFrames == 6L)
    // padded frames hop one extra byte without desyncing
    val padded = (0 until 4).map(i =>
      mp3Frame(3, 3, 9, 0, mono = false, pad = i % 2))
    assert(Multimodal.parseMp3(3L, padded.flatten.toArray).nFrames == 4L)
  }

  test("parseMp3 is total and rejects non-MP3: garbage, lone false " +
    "sync, WAV bytes, nulls (scalacheck-style byte mutation)") {
    assert(!Multimodal.parseMp3(1L, null).ok)
    assert(!Multimodal.parseMp3(1L, Array.empty[Byte]).ok)
    // a single valid header with random tail fails the 2-frame chain
    val lone = mp3Frame(3, 3, 9, 0, mono = false).take(4) ++
      Array.fill[Byte](50)(0x55)
    assert(!Multimodal.parseMp3(1L, lone).ok)
    val wav = sineBytes(AudioFileFormat.Type.WAVE, 440.0, 0.5, 8000f,
      500, bigEndian = false)
    assert(!Multimodal.parseMp3(1L, wav).ok)
    val golden = Array.fill(4)(mp3Frame(3, 3, 9, 0, mono = false))
      .flatten
    var s = 11
    for (trial <- 0 until 200) {
      // mutate one byte of a valid stream — must never throw, and a
      // mutation in frame 0's header either drops or resyncs
      s = s * 1103515245 + 12345
      val at = math.abs(s) % golden.length
      val mut = golden.clone()
      s = s * 1103515245 + 12345
      mut(at) = (s >> 16).toByte
      Multimodal.parseMp3(trial.toLong, mut) // total
      // pure random buffers too
      val rnd = Array.tabulate(257) { i =>
        s = s * 1103515245 + 12345; (s >> 16).toByte
      }
      Multimodal.parseMp3(trial.toLong, rnd)
    }
  }

  test("mp3Meta: Dataset-level batch isolates non-MP3 rows") {
    val golden = Array.fill(3)(mp3Frame(3, 3, 9, 0, mono = false))
      .flatten
    val rows = Seq(
      (1L, golden), (2L, "not audio".getBytes("UTF-8")),
      (3L, null.asInstanceOf[Array[Byte]]))
    val out = Multimodal.mp3Meta(rows.toDF("doc_id", "media"))
      .collect().map(m => m.id -> m).toMap
    assert(out(1L).ok && out(1L).nFrames == 3L)
    assert(!out(2L).ok && !out(3L).ok)
  }

  test("decodeAudio: Dataset-level batch with null-media isolation") {
    val wav = sineBytes(AudioFileFormat.Type.WAVE, 440.0, 0.5, 8000f,
      2000, bigEndian = false)
    val rows = Seq(
      (1L, wav), (2L, "not audio".getBytes("UTF-8")),
      (3L, null.asInstanceOf[Array[Byte]]))
    val out = Multimodal.decodeAudio(rows.toDF("doc_id", "media"))
      .collect().map(m => m.id -> m).toMap
    assert(out(1L).ok && out(1L).durationSec == 0.25)
    assert(!out(2L).ok && !out(3L).ok)
  }
}
