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
