package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.operators.Pool
import graft.schema.Vintages
import graft.streaming.StreamingIngest

/** Streaming ingest wiring (AvailableNow over a CSV drop directory) and
  * multimodal binary-column plumbing.
  */
class StreamingMultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("streaming ingest lands CSV drops in the partitioned pool") {
    val in = tmpDir("sin")
    val poolRoot = tmpDir("spool")
    val ckpt = tmpDir("sckpt")
    SyntheticTracking.writeCsv2018(spark, in, games = 1, plays = 2,
      frames = 10)
    val q = StreamingIngest.start(spark, in, poolRoot, Vintages.bdb2018, ckpt)
    q.awaitTermination(60000)
    val pool = Pool(spark, poolRoot).df
    assert(pool.count() == 460L)
    assert(pool.columns.contains("gameId")) // partition col recovered
  }

  test("media metadata: byte length, sha, magic — all expression-level") {
    val df = Seq((1L, "hello world"), (2L, "")).toDF("doc_id", "text")
    val m = Multimodal.mediaMeta(Multimodal.withMedia(df, "text"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_bytes"), r.getAs[String]("content_sha"),
          r.getAs[String]("magic_hex"))).toMap
    assert(m(1L)._1 == 11)
    // sha256("hello world")
    assert(m(1L)._2 ==
      "b94d27b9934d3e08a52e52d7da7dabfac484efe37a5380ee9088f7ace2efcde9")
    assert(m(1L)._3 == "68656c6c") // "hell"
    assert(m(2L)._1 == 0)
  }

  test("decode stub: deterministic fake features with real batch plumbing") {
    val df = Seq((1L, "some media bytes"), (2L, "other bytes"))
      .toDF("doc_id", "text")
    val dec = Multimodal.decodeStub(Multimodal.withMedia(df, "text"))
      .collect().map(d => d.id -> d).toMap
    assert(dec(1L).feature.length == 8)
    assert(dec(1L).width >= 16 && dec(1L).nFrames >= 1)
    // determinism: same input → same fake decode
    val again = Multimodal.decodeStub(Multimodal.withMedia(df, "text"))
      .collect().map(d => d.id -> d.feature.toSeq).toMap
    assert(again(1L) == dec(1L).feature.toSeq)
  }

  test("decodePpm: real P6 decode — dims, maxval, channel means; " +
    "malformed inputs isolate as ok=false") {
    import graft.multimodal.Multimodal
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // 2×2 P6 with a comment header: pixels R=(10,20,30,40) G=(0,100,200,100)
    // B=(255,255,255,255) → means (25.0, 100.0, 255.0)
    val header = "P6\n# synthetic fixture\n2 2\n255\n".getBytes("US-ASCII")
    val px = Array(
      10, 0, 255, 20, 100, 255,
      30, 200, 255, 40, 100, 255).map(_.toByte)
    val good = header ++ px
    val truncated = good.dropRight(3)      // raster 1 pixel short
    val badMagic = "P5\n2 2\n255\n".getBytes("US-ASCII") ++ px
    // CRLF-writing tool: "\r\n" is ONE separator — same stats as good
    val crlf = "P6\n2 2\n255\r\n".getBytes("US-ASCII") ++ px
    // garbage byte between maxval and raster must NOT silently shift
    // the channels — malformed, not ok=true-with-wrong-stats
    val junkSep = "P6\n2 2\n255X".getBytes("US-ASCII") ++ px
    val df = Seq(
      (1L, good), (2L, truncated), (3L, badMagic), (4L, null),
      (5L, crlf), (6L, junkSep))
      .toDF("doc_id", "media")
    val got = Multimodal.decodePpm(df).collect()
      .map(m => m.id -> m).toMap
    assert(got(1L).ok && got(1L).width == 2 && got(1L).height == 2 &&
      got(1L).maxVal == 255)
    assert(got(1L).meanR == 25.0 && got(1L).meanG == 100.0 &&
      got(1L).meanB == 255.0)
    assert(!got(2L).ok && !got(3L).ok && !got(4L).ok)
    assert(got(5L).ok && got(5L).meanR == 25.0 && got(5L).meanB == 255.0)
    assert(!got(6L).ok)
    // null id isolates as an id=-1 bad row instead of failing the job
    val nullId = spark.sql(
      "SELECT CAST(NULL AS BIGINT) AS doc_id, CAST('P6' AS BINARY) AS media")
    assert(Multimodal.decodePpm(nullId).collect()
      .forall(m => m.id == -1L && !m.ok))
  }

  test("decodeOnePpm is total on arbitrary bytes (fuzz, seeded)") {
    import graft.multimodal.Multimodal
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 500) {
      val n = rnd.nextInt(64)
      val bytes = Array.fill(n)(rnd.nextInt(256).toByte)
      // bias half the trials toward header-ish prefixes to reach the
      // parser's deeper branches
      if (trial % 2 == 0 && n >= 2) { bytes(0) = 'P'; bytes(1) = '6' }
      val m = Multimodal.decodeOnePpm(trial.toLong, bytes) // must not throw
      assert(m.ok || (m.width == 0 && m.height == 0))
    }
  }

  // ------------------------------------------------------------- PNG

  /** Deflate helper for synthesizing PNG fixtures. */
  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](1024)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** One PNG chunk with a REAL CRC (fixtures stay valid for any tool). */
  private def pngChunk(ctype: String, data: Array[Byte]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(12 + data.length)
    out.putInt(data.length)
    out.put(ctype.getBytes("US-ASCII"))
    out.put(data)
    val crc = new java.util.zip.CRC32()
    crc.update(ctype.getBytes("US-ASCII"))
    crc.update(data)
    out.putInt(crc.getValue.toInt)
    out.array()
  }

  private val pngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a,
    0x0a).map(_.toByte)

  private def ihdr(w: Int, h: Int, bitDepth: Int, colorType: Int,
      interlace: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(13)
    b.putInt(w); b.putInt(h)
    b.put(bitDepth.toByte); b.put(colorType.toByte)
    b.put(0.toByte); b.put(0.toByte); b.put(interlace.toByte)
    b.array()
  }

  /** Encode an 8-bit PNG, applying the given filter type per row (cycled)
    * — the encoder-side inverse of the decoder's unfilter, so every
    * filter path gets exercised by round-trip.
    */
  private def encodePng(w: Int, h: Int, colorType: Int,
      pixels: Array[Int], filters: Seq[Int],
      idatSplit: Boolean = false): Array[Byte] = {
    val channels = Map(0 -> 1, 2 -> 3, 4 -> 2, 6 -> 4)(colorType)
    val stride = w * channels
    val raw = new java.io.ByteArrayOutputStream()
    var prior = new Array[Int](stride)
    for (row <- 0 until h) {
      val ft = filters(row % filters.length)
      raw.write(ft)
      val cur = Array.tabulate(stride)(i => pixels(row * stride + i) & 0xff)
      for (i <- 0 until stride) {
        val a = if (i >= channels) cur(i - channels) else 0
        val b = prior(i)
        val c = if (i >= channels) prior(i - channels) else 0
        val v = ft match {
          case 0 => cur(i)
          case 1 => cur(i) - a
          case 2 => cur(i) - b
          case 3 => cur(i) - ((a + b) >> 1)
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b)
            val pc = math.abs(p - c)
            cur(i) - (if (pa <= pb && pa <= pc) a
              else if (pb <= pc) b else c)
        }
        raw.write(v & 0xff)
      }
      prior = cur
    }
    val z = deflate(raw.toByteArray)
    val idat =
      if (idatSplit && z.length > 2) // stream legally spans two chunks
        pngChunk("IDAT", z.take(z.length / 2)) ++
          pngChunk("IDAT", z.drop(z.length / 2))
      else pngChunk("IDAT", z)
    pngSig ++ pngChunk("IHDR", ihdr(w, h, 8, colorType, 0)) ++
      idat ++ pngChunk("IEND", Array.empty)
  }

  private def channelMeans(w: Int, h: Int, colorType: Int,
      pixels: Array[Int]): (Double, Double, Double) = {
    val channels = Map(0 -> 1, 2 -> 3, 4 -> 2, 6 -> 4)(colorType)
    val n = (w * h).toDouble
    def mean(c: Int): Double =
      (0 until w * h).map(p => pixels(p * channels + c)).sum / n
    colorType match {
      case 0 | 4 => (mean(0), mean(0), mean(0))
      case _ => (mean(0), mean(1), mean(2))
    }
  }

  test("decodePng: inflate + all five scanline filters round-trip exact " +
    "channel means across color types; malformed isolates as ok=false") {
    val rnd = new scala.util.Random(19)
    // 4×5 so every filter type 0..4 gets one row; random pixels exercise
    // the byte arithmetic, means are computed independently here
    val cases = Seq(2 -> 3, 0 -> 1, 6 -> 4, 4 -> 2).zipWithIndex.map {
      case ((colorType, channels), idx) =>
        val px = Array.fill(4 * 5 * channels)(rnd.nextInt(256))
        (100L + idx, colorType, px,
          encodePng(4, 5, colorType, px, Seq(0, 1, 2, 3, 4)))
    }
    // multi-IDAT flavor of the RGB case
    val (mid, mct, mpx, _) = cases.head
    val multiIdat = (900L, mct, mpx,
      encodePng(4, 5, mct, mpx, Seq(4, 3, 2, 1, 0), idatSplit = true))
    val all = cases :+ multiIdat
    val df = all.map { case (id, _, _, bytes) => (id, bytes) }
      .toDF("doc_id", "media")
    val got = Multimodal.decodePng(df).collect().map(m => m.id -> m).toMap
    all.foreach { case (id, colorType, px, _) =>
      val m = got(id)
      assert(m.ok, s"id=$id colorType=$colorType failed to decode")
      assert(m.width == 4 && m.height == 5 && m.bitDepth == 8 &&
        m.colorType == colorType)
      val (er, eg, eb) = channelMeans(4, 5, colorType, px)
      assert(m.meanR == er && m.meanG == eg && m.meanB == eb,
        s"id=$id means (${m.meanR},${m.meanG},${m.meanB}) != ($er,$eg,$eb)")
    }
    // malformed family — every one isolates, none throws
    val goodRgb = cases.head._4
    val bad = Seq(
      1L -> goodRgb.dropRight(20),                       // truncated IDAT
      2L -> ("NOPE".getBytes("US-ASCII") ++ goodRgb.drop(4)), // bad magic
      3L -> (pngSig ++ pngChunk("IHDR", ihdr(4, 5, 16, 2, 0)) ++
        goodRgb.drop(8 + 25)),                           // 16-bit depth
      4L -> (pngSig ++ pngChunk("IHDR", ihdr(4, 5, 8, 2, 1)) ++
        goodRgb.drop(8 + 25)),                           // Adam7 interlace
      5L -> (pngSig ++ pngChunk("IHDR", ihdr(4, 5, 8, 3, 0)) ++
        goodRgb.drop(8 + 25)),                           // palette type
      // hostile: header claims a 100000² raster over a 30-byte IDAT —
      // must reject via the deflate-ratio bound BEFORE allocating
      6L -> (pngSig ++ pngChunk("IHDR", ihdr(100000, 100000, 8, 2, 0)) ++
        pngChunk("IDAT", Array.fill(30)(0.toByte)) ++
        pngChunk("IEND", Array.empty)),
      7L -> null)
    val badGot = Multimodal.decodePng(bad.toDF("doc_id", "media"))
      .collect().map(m => m.id -> m).toMap
    bad.foreach { case (id, _) =>
      assert(!badGot(id).ok, s"malformed id=$id decoded as ok")
    }
    // null id isolates as id=-1, same as decodePpm
    val nullId = spark.sql("SELECT CAST(NULL AS BIGINT) AS doc_id, " +
      "CAST('x' AS BINARY) AS media")
    assert(Multimodal.decodePng(nullId).collect()
      .forall(m => m.id == -1L && !m.ok))
  }

  test("decodePngThumb: real decode→resize — box averages exact on a " +
    "half-red/half-blue image; feeds similarity search end-to-end") {
    // 4×4 RGB: left 2 columns pure red, right 2 pure blue → 2×2 thumb
    // cells are exactly (255,0,0) / (0,0,255)
    val px = Array.tabulate(4 * 4 * 3) { i =>
      val x = (i / 3) % 4
      val c = i % 3
      if (x < 2) { if (c == 0) 255 else 0 } else { if (c == 2) 255 else 0 }
    }
    val png = encodePng(4, 4, 2, px, Seq(0, 1, 2, 3))
    val df = Seq((1L, png)).toDF("doc_id", "media")
    val t = Multimodal.decodePngThumb(df, thumbW = 2, thumbH = 2)
      .collect().head
    assert(t.ok && t.width == 4 && t.height == 4)
    assert(t.pixels.toSeq == Seq(
      255f, 0f, 0f, 0f, 0f, 255f,
      255f, 0f, 0f, 0f, 0f, 255f))
    // image smaller than the grid is a refused downscale, not garbage —
    // it keeps its REAL dims (0×0 is reserved for malformed)
    val tiny = Multimodal.decodeOnePngThumb(2L,
      encodePng(2, 2, 2, Array.fill(2 * 2 * 3)(7), Seq(0)), 4, 4)
    assert(!tiny.ok && tiny.pixels.isEmpty)
    assert(tiny.width == 2 && tiny.height == 2)
    assert(!Multimodal.decodeOnePngThumb(3L, "junk".getBytes, 2, 2).ok)
    // E2E: thumbnails are raw embeddings — two red-ish images rank
    // each other above the blue one
    val redA = encodePng(4, 4, 2,
      Array.tabulate(48)(i => if (i % 3 == 0) 250 else 10), Seq(0))
    val redB = encodePng(4, 4, 2,
      Array.tabulate(48)(i => if (i % 3 == 0) 240 else 20), Seq(1))
    val blue = encodePng(4, 4, 2,
      Array.tabulate(48)(i => if (i % 3 == 2) 250 else 10), Seq(2))
    val emb = Multimodal.decodePngThumb(
      Seq((0L, redA), (1L, redB), (2L, blue)).toDF("doc_id", "media"),
      thumbW = 2, thumbH = 2)
      .toDF().select(col("id").as("vec_id"), col("pixels").as("embedding"))
    val top = graft.sim.SimSearch.bruteForceTopK(emb, "vec_id",
      "embedding", col("vec_id") === 0L, k = 2).collect()
    assert(top.head.getAs[Long]("neighbor") == 1L,
      s"red image's nearest neighbor should be the other red one")
  }

  test("decodeOnePng is total on arbitrary bytes (fuzz, seeded)") {
    val rnd = new scala.util.Random(77)
    for (trial <- 0 until 500) {
      val n = rnd.nextInt(200)
      val bytes = Array.fill(n)(rnd.nextInt(256).toByte)
      // bias half the trials toward a real signature (and a third of
      // those toward a plausible IHDR) to reach deeper parser branches
      if (trial % 2 == 0 && n >= 8) pngSig.copyToArray(bytes)
      if (trial % 6 == 0 && n >= 33)
        (java.nio.ByteBuffer.allocate(8).putInt(13)
          .put("IHDR".getBytes("US-ASCII")).array())
          .copyToArray(bytes, 8)
      val m = Multimodal.decodeOnePng(trial.toLong, bytes) // must not throw
      assert(m.ok || (m.width == 0 && m.height == 0))
      // the thumbnail path shares walkPng but has its own accumulation
      // — fuzz it on the same bytes
      val t = Multimodal.decodeOnePngThumb(trial.toLong, bytes, 2, 2)
      assert(t.ok == m.ok || !t.ok) // thumb can refuse small images
      if (t.ok) assert(t.pixels.length == 2 * 2 * 3 &&
        t.pixels.forall(p => p >= 0f && p <= 255f))
    }
  }

  test("resize stub: fixed output shape chained after decode") {
    val df = Seq((1L, "some media bytes"), (2L, "x"))
      .toDF("doc_id", "text")
    val resized = Multimodal.resizeStub(
      Multimodal.decodeStub(Multimodal.withMedia(df, "text")),
      targetW = 4, targetH = 2)
      .collect().map(r => r.id -> r).toMap
    assert(resized.size == 2)
    assert(resized(1L).pixels.length == 8) // always targetW × targetH
    assert(resized(2L).pixels.length == 8)
    assert(resized(1L).width == 4 && resized(1L).height == 2)
  }

  test("frame sampling cuts byte stream into strided chunks") {
    val df = Seq((1L, "a" * 100)).toDF("doc_id", "text")
    val frames = Multimodal.frameSample(
      Multimodal.withMedia(df, "text"), chunkBytes = 16, stride = 4)
      .head().getAs[scala.collection.Seq[Array[Byte]]]("frames")
    assert(frames.length == 2) // chunks 0 and 4 of ceil(100/16)=7
    assert(frames.head.length == 16)
  }

  test("multimodal retrieval E2E: decoded features feed similarity search") {
    // media → decode (stub codec, real plumbing) → feature vectors →
    // ANN: the full multimodal retrieval pipeline across modules.
    // Identical media bytes must land as each other's top neighbor.
    val docs = Seq(
      (0L, "alpha bravo charlie"), (1L, "alpha bravo charlie"),
      (2L, "zulu yankee xray whiskey victor uniform"))
      .toDF("doc_id", "text")
    val feats = Multimodal.decodeStub(Multimodal.withMedia(docs, "text"))
      .toDF().select(col("id").as("vec_id"), col("feature").as("embedding"))
    val top = graft.sim.SimSearch.bruteForceTopK(
      feats, "vec_id", "embedding", col("vec_id") === 0L, k = 1)
      .head()
    assert(top.getAs[Long]("neighbor") == 1L)
    assert(top.getAs[Double]("cos_sim") == 1.0) // identical bytes
  }
}
