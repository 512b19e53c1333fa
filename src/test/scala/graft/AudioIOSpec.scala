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
