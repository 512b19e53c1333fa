package graft

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions._
import graft.sources.Warc
import graft.text.TextOps

/** WARC crawl source: record framing, per-member gzip, HTTP response
  * splitting, payload caps, torn-tail isolation — and the composed
  * crawl→text path through htmlToText.
  */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def rec(tpe: String, uri: String,
      payload: Array[Byte]): Array[Byte] = {
    val head = (s"WARC/1.0\r\n" +
      s"WARC-Type: $tpe\r\n" +
      s"WARC-Target-URI: $uri\r\n" +
      s"WARC-Date: 2024-01-01T00:00:00Z\r\n" +
      (if (tpe == "response")
        "Content-Type: application/http; msgtype=response\r\n" else "") +
      s"Content-Length: ${payload.length}\r\n\r\n")
      .getBytes("ISO-8859-1")
    head ++ payload ++ "\r\n\r\n".getBytes("ISO-8859-1")
  }

  private val html =
    "<html><body><p>Hello &amp; <b>world</b></p>" +
      "<script>if (1 < 2) alert('x');</script></body></html>"

  private def httpPayload(status: Int, body: String): Array[Byte] =
    (s"HTTP/1.1 $status OK\r\nContent-Type: text/html\r\n\r\n" + body)
      .getBytes("ISO-8859-1")

  private def warcBytes: Array[Byte] =
    rec("warcinfo", "", "software: graft-test\r\n".getBytes) ++
      rec("request", "http://example.com/",
        "GET / HTTP/1.1\r\nHost: example.com\r\n\r\n".getBytes) ++
      rec("response", "http://example.com/", httpPayload(200, html)) ++
      rec("response", "http://example.com/missing",
        httpPayload(404, "<html>not found</html>"))

  private def write(dir: String, name: String, bytes: Array[Byte]): String = {
    val f = new java.io.File(dir, name)
    val os = new FileOutputStream(f)
    try os.write(bytes) finally os.close()
    f.getAbsolutePath
  }

  test("plain .warc: framing, headers, HTTP status/body split") {
    val dir = tmpDir("warc1")
    write(dir, "a.warc", warcBytes)
    val rows = Warc.read(spark, s"$dir/*.warc").collect()
      .sortBy(_.idx)
    assert(rows.length == 4)
    assert(rows.map(_.warcType).toSeq ==
      Seq("warcinfo", "request", "response", "response"))
    val resp = rows(2)
    assert(resp.targetUri == "http://example.com/")
    assert(resp.httpStatus == 200 && !resp.truncated)
    assert(new String(resp.httpBody, "ISO-8859-1") == html)
    assert(rows(3).httpStatus == 404)
    // non-HTTP records carry no split
    assert(rows(0).httpStatus == 0 && rows(0).httpBody == null)
    // the request record IS an HTTP message but not a response — its
    // status line has no numeric code slot that parses
    assert(rows(1).httpStatus == 0)
  }

  test(".warc.gz: one gzip member per record (the Common Crawl " +
    "layout) streams through as a concatenated-member read") {
    val dir = tmpDir("warc2")
    val bos = new ByteArrayOutputStream()
    for (r <- Seq(
      rec("warcinfo", "", "software: graft-test\r\n".getBytes),
      rec("response", "http://example.com/", httpPayload(200, html)))) {
      val gz = new GZIPOutputStream(bos)
      gz.write(r)
      gz.finish()
    }
    write(dir, "a.warc.gz", bos.toByteArray)
    val rows = Warc.read(spark, s"$dir/a.warc.gz").collect().sortBy(_.idx)
    assert(rows.length == 2)
    assert(rows(1).httpStatus == 200 &&
      new String(rows(1).httpBody, "ISO-8859-1") == html)
  }

  test("payload cap truncates AND keeps the stream aligned; a torn " +
    "tail isolates to records already parsed; garbage parses to zero") {
    val dir = tmpDir("warc3")
    write(dir, "a.warc", warcBytes)
    val capped = Warc.read(spark, s"$dir/a.warc", maxPayloadBytes = 10)
      .collect().sortBy(_.idx)
    assert(capped.length == 4, "cap must not desync record framing")
    assert(capped.forall(r => r.payload.length <= 10))
    assert(capped(2).truncated && capped(2).contentLength > 10)
    // torn tail: cut the file inside the LAST record's payload
    val torn = warcBytes.dropRight(30)
    write(dir, "b.warc", torn)
    val tornRows = Warc.read(spark, s"$dir/b.warc").collect()
    assert(tornRows.length == 3, s"got ${tornRows.length}")
    // garbage
    write(dir, "c.warc", Array.fill[Byte](100)(0x42))
    assert(Warc.read(spark, s"$dir/c.warc").collect().isEmpty)
  }

  test("readResponses ∘ htmlToText: the crawl→clean-text path") {
    val dir = tmpDir("warc4")
    write(dir, "a.warc", warcBytes)
    val text = Warc.readResponses(spark, s"$dir/a.warc")
      .select(col("target_uri"),
        TextOps.htmlToText(col("html")).as("text"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // 404s are filtered; scripts and tags are gone, entities decoded
    assert(text == Map("http://example.com/" -> "Hello & world"))
  }

  test("parseFile is total under byte mutation (scalacheck-style " +
    "fuzz): never throws, never over-reads") {
    val dir = tmpDir("warcfuzz")
    val base = warcBytes
    var s = 13
    val conf = new org.apache.hadoop.conf.Configuration()
    for (trial <- 0 until 120) {
      s = s * 1103515245 + 12345
      val at = math.abs(s) % base.length
      val mut = base.clone()
      s = s * 1103515245 + 12345
      mut(at) = (s >> 16).toByte
      val f = write(dir, s"m$trial.warc", mut)
      // must not throw; any prefix of records is acceptable
      val n = Warc.parseFile(f, conf, 1 << 20).size
      assert(n >= 0 && n <= 5)
    }
    // truncation at every boundary region is also total
    for (cut <- Seq(0, 1, 8, 40, base.length / 2, base.length - 1)) {
      val f = write(dir, s"t$cut.warc", base.take(cut))
      Warc.parseFile(f, conf, 1 << 20).size
    }
  }

  test("readConversions: WET conversion records come out as plain " +
    "text rows") {
    val dir = tmpDir("warc5")
    val wet =
      rec("warcinfo", "", "software: graft-test\r\n".getBytes) ++
        rec("conversion", "http://example.com/a",
          "Hello plain text.".getBytes("UTF-8")) ++
        rec("conversion", "http://example.com/b",
          "Second page.".getBytes("UTF-8"))
    write(dir, "a.warc.wet", wet)
    val rows = Warc.readConversions(spark, s"$dir/a.warc.wet")
      .collect().map(r => r.getString(2) -> r.getString(4)).toMap
    assert(rows == Map("http://example.com/a" -> "Hello plain text.",
      "http://example.com/b" -> "Second page."))
  }

  test("urlHost: scheme/userinfo/port/path/query/fragment all " +
    "stripped; non-URLs extract empty") {
    val cases = Seq(
      "https://www.Example.COM/path?q=1" -> "www.example.com",
      "http://user:pw@host.org:8080/x#f" -> "host.org",
      "ftp://files.example.net" -> "files.example.net",
      "https://example.com:443" -> "example.com",
      "notaurl" -> "",
      "/relative/path" -> "",
      "" -> "")
    val got = cases.map(_._1).toDF("u")
      .select(TextOps.urlHost(col("u"))).collect().map(_.getString(0))
    assert(got.toSeq == cases.map(_._2), got.mkString("|"))
  }

  test("canonicalUrl: tracking params, fragments, host case and " +
    "trailing slashes collapse; path case and real params survive") {
    val cases = Seq(
      "HTTPS://WWW.Ex.COM/A/B?utm_source=x&id=3#frag" ->
        "https://www.ex.com/A/B?id=3",
      "https://ex.com/p?id=3&utm_campaign=y" -> "https://ex.com/p?id=3",
      "https://ex.com/p?utm_a=1&utm_b=2" -> "https://ex.com/p",
      "https://ex.com/p?a=1&gclid=zz&b=2" -> "https://ex.com/p?a=1&b=2",
      "https://ex.com/dir/" -> "https://ex.com/dir",
      "https://User@Ex.com/x" -> "https://user@ex.com/x",
      "https://ex.com/CaseSensitive" -> "https://ex.com/CaseSensitive",
      "notaurl?utm_x=1" -> "notaurl")
    val got = cases.map(_._1).toDF("u")
      .select(TextOps.canonicalUrl(col("u"))).collect()
      .map(_.getString(0))
    assert(got.toSeq == cases.map(_._2), got.mkString("|"))
  }

  test("html head metadata: multiline title, attribute-order " +
    "fallback, charset precedence, missing fields empty") {
    val html = "<html><head><title>\n  Two\n  Lines\n</title>" +
      "<meta content=\"desc here\" name=\"description\">" +
      "<meta charset=utf-8>" +
      "<meta http-equiv=\"Content-Type\" content=\"text/html; " +
      "charset=iso-8859-1\"></head><body></body></html>"
    val r = Seq(Tuple1(html)).toDF("h")
      .select(TextOps.htmlTitle(col("h")),
        TextOps.htmlMetaDescription(col("h")),
        TextOps.htmlCharset(col("h"))).first()
    assert(r.getString(0) == "Two\n  Lines") // outer whitespace trimmed
    assert(r.getString(1) == "desc here")
    assert(r.getString(2) == "utf-8") // HTML5 wins over http-equiv
    val none = Seq(Tuple1("<html><body>no head</body></html>"))
      .toDF("h")
      .select(TextOps.htmlTitle(col("h")),
        TextOps.htmlMetaDescription(col("h")),
        TextOps.htmlCharset(col("h"))).first()
    assert(none.getString(0) == "" && none.getString(1) == "" &&
      none.getString(2) == "")
  }

  test("htmlToText edges: comments, style blocks, bare < in script, " +
    "entity forms, whitespace collapse") {
    val rows = Seq(
      "<p>a</p><p>b</p>" -> "a b",
      "<style>p { x<y }</style>text" -> "text",
      "<script>for(i=0;i<9;i++){}</script>ok" -> "ok",
      "<!-- <p>hidden</p> -->shown" -> "shown",
      "x &lt;tag&gt; &quot;q&quot; &#39;s&#39; &apos;a&apos;" ->
        "x <tag> \"q\" 's' 'a'",
      "a\n\n\t b" -> "a b",
      "" -> "")
    val got = rows.map(_._1).toDF("h")
      .select(TextOps.htmlToText(col("h"))).collect().map(_.getString(0))
    assert(got.toSeq == rows.map(_._2), got.mkString("|"))
  }
}
