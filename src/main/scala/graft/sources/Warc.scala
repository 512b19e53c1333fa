package graft.sources

import java.io.{BufferedInputStream, EOFException, InputStream}
import java.util.zip.GZIPInputStream

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500) source — the format web crawls
  * actually ship in (Common Crawl's WARC/WET dumps are the single
  * largest public LLM pretraining source). A WARC file is a
  * concatenation of records, each a `WARC/1.x` header block
  * (`Key: Value` lines, CRLF, blank-line terminated) followed by
  * exactly `Content-Length` payload bytes and a blank-line separator;
  * `.warc.gz` files gzip each record as its OWN member, so a plain
  * multi-member `GZIPInputStream` (the JDK one handles concatenated
  * members) streams the whole file.
  *
  * Scale shape (Common Crawl = ~100 TB per monthly dump):
  *  - gzip is not splittable, so parallelism is PER FILE — exactly how
  *    the dumps are shipped (~1 GB × ~72k files per crawl). The reader
  *    lists files on the driver and each task STREAMS its file through
  *    a fixed-size buffer: no whole-file materialization, memory is
  *    O(largest payload) per task (and payloads cap at
  *    `maxPayloadBytes` — an oversized record is truncated and FLAGGED
  *    rather than buffered or dropped silently).
  *  - parsing is scan-stage `mapPartitions` (no shuffle); convert to
  *    parquet at the pool boundary for anything queried twice (the
  *    [[Jsonl]] doctrine).
  *  - a torn/corrupt tail isolates: records parsed before the damage
  *    are emitted, the rest of THAT FILE is skipped, other files are
  *    untouched (per-file isolation — the `Ingest.run` contract).
  *
  * HTTP `response` records carry the raw HTTP exchange as payload; the
  * reader splits status line and body out (`http_status`, `http_body`)
  * so the text pipeline can go straight to
  * [[graft.text.TextOps.htmlToText]] without re-parsing.
  */
object Warc {

  /** One parsed WARC record.
    *
    * `truncated` = payload exceeded `maxPayloadBytes` (prefix kept);
    * `httpStatus` = 0 and `httpBody` = null unless the payload is an
    * HTTP response message.
    */
  final case class WarcRecord(
      file: String, idx: Int, warcType: String, targetUri: String,
      warcDate: String, contentType: String, contentLength: Long,
      truncated: Boolean, payload: Array[Byte], httpStatus: Int,
      httpBody: Array[Byte])

  /** Read every WARC file under `path` (glob ok; `.gz` per extension).
    * One task per file — size/ship files accordingly (the Common Crawl
    * layout already does).
    */
  def read(spark: SparkSession, path: String,
      maxPayloadBytes: Int = 8 * 1024 * 1024): Dataset[WarcRecord] = {
    require(maxPayloadBytes > 0, "maxPayloadBytes must be positive")
    import spark.implicits._
    // driver-side listing via the session's Hadoop conf (credentials,
    // object-store settings); executors rebuild a Configuration from
    // the broadcast key-value snapshot — Configuration itself is not
    // serializable
    val hadoopConf = spark.sessionState.newHadoopConf()
    val confEntries = {
      val it = hadoopConf.iterator()
      val b = Seq.newBuilder[(String, String)]
      while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
      b.result()
    }
    val confBc = spark.sparkContext.broadcast(confEntries)
    val files = listFiles(spark, path)
    files.toDS().repartition(math.max(files.size, 1))
      .mapPartitions { it =>
        val conf = new Configuration(false)
        confBc.value.foreach { case (k, v) => conf.set(k, v) }
        it.flatMap(f => parseFile(f, conf, maxPayloadBytes))
      }(Encoders.product[WarcRecord])
  }

  /** The text-pipeline projection of [[read]]: one row per HTTP 200
    * response with a UTF-8-decoded body —
    * `(file, idx, target_uri, warc_date, content_type, html)`. Feed
    * `html` to [[graft.text.TextOps.htmlToText]].
    */
  def readResponses(spark: SparkSession, path: String,
      maxPayloadBytes: Int = 8 * 1024 * 1024) = {
    read(spark, path, maxPayloadBytes)
      .filter(col("warcType") === "response" && col("httpStatus") === 200
        && col("httpBody").isNotNull)
      .select(col("file"), col("idx"), col("targetUri").as("target_uri"),
        col("warcDate").as("warc_date"),
        col("contentType").as("content_type"),
        // decode() substitutes U+FFFD for undecodable bytes rather
        // than throwing — charset sniffing is the caller's refinement
        decode(col("httpBody"), "UTF-8").as("html"))
  }

  /** The WET flavor (Common Crawl's pre-extracted text dumps): WET
    * files are WARC files whose `conversion` records carry plain
    * UTF-8 text payloads — one row per page,
    * `(file, idx, target_uri, warc_date, text)`. Same per-file
    * streaming parse; no HTML step needed.
    */
  def readConversions(spark: SparkSession, path: String,
      maxPayloadBytes: Int = 8 * 1024 * 1024) = {
    read(spark, path, maxPayloadBytes)
      .filter(col("warcType") === "conversion")
      .select(col("file"), col("idx"), col("targetUri").as("target_uri"),
        col("warcDate").as("warc_date"),
        decode(col("payload"), "UTF-8").as("text"))
  }

  private def listFiles(spark: SparkSession, path: String): Seq[String] = {
    val hPath = new Path(path)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    val stats = fs.globStatus(hPath) match {
      case null => Array.empty[org.apache.hadoop.fs.FileStatus]
      case arr => arr
    }
    stats.toSeq.flatMap { st =>
      if (st.isDirectory)
        fs.listStatus(st.getPath).filter(_.isFile)
          .map(_.getPath.toString).toSeq
      else Seq(st.getPath.toString)
    }.sorted
  }

  private[graft] def parseFile(file: String, conf: Configuration,
      maxPayloadBytes: Int): Iterator[WarcRecord] = {
    val p = new Path(file)
    val raw =
      try p.getFileSystem(conf).open(p)
      catch { case scala.util.control.NonFatal(_) => return Iterator.empty }
    val in: InputStream =
      try {
        if (file.endsWith(".gz"))
          new BufferedInputStream(new GZIPInputStream(raw, 1 << 16), 1 << 16)
        else new BufferedInputStream(raw, 1 << 16)
      } catch {
        case scala.util.control.NonFatal(_) => raw.close(); return Iterator.empty
      }
    val out = Seq.newBuilder[WarcRecord]
    var idx = 0
    try {
      var more = true
      while (more) {
        parseRecord(file, idx, in, maxPayloadBytes) match {
          case Some(r) => out += r; idx += 1
          case None => more = false
        }
      }
    } catch {
      // torn tail / corrupt member: keep what parsed, drop the rest of
      // THIS file only
      case scala.util.control.NonFatal(_) =>
    } finally in.close()
    out.result().iterator
  }

  /** Read one CRLF (or LF)-terminated ISO-8859-1 line; None at EOF. */
  private def readLine(in: InputStream): Option[String] = {
    val sb = new StringBuilder
    var c = in.read()
    if (c < 0) return None
    while (c >= 0 && c != '\n') {
      if (c != '\r') sb.append(c.toChar)
      c = in.read()
    }
    Some(sb.toString)
  }

  private def readFully(in: InputStream, n: Int): Array[Byte] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val read = in.read(buf, off, n - off)
      if (read < 0) throw new EOFException(s"payload truncated at $off/$n")
      off += read
    }
    buf
  }

  private def skipFully(in: InputStream, n: Long): Unit = {
    var left = n
    val buf = new Array[Byte](1 << 16)
    while (left > 0) {
      val read = in.read(buf, 0, math.min(left, buf.length.toLong).toInt)
      if (read < 0) throw new EOFException(s"skip truncated, $left left")
      left -= read
    }
  }

  private def parseRecord(file: String, idx: Int, in: InputStream,
      maxPayloadBytes: Int): Option[WarcRecord] = {
    // seek the version line, tolerating inter-record blank lines
    var version: String = null
    while (version == null) {
      readLine(in) match {
        case None => return None
        case Some(l) if l.isEmpty => // inter-record CRLF padding
        case Some(l) if l.startsWith("WARC/") => version = l
        case Some(_) => return None // not a record boundary: stop file
      }
    }
    val headers = scala.collection.mutable.Map.empty[String, String]
    var line = readLine(in).getOrElse(return None)
    while (line.nonEmpty) {
      val i = line.indexOf(':')
      if (i > 0)
        headers(line.substring(0, i).trim.toLowerCase) =
          line.substring(i + 1).trim
      line = readLine(in).getOrElse(return None)
    }
    val len = headers.get("content-length").map(_.toLong).getOrElse(return None)
    val keep = math.min(len, maxPayloadBytes.toLong).toInt
    val payload = readFully(in, keep)
    if (len > keep) skipFully(in, len - keep)
    val (status, body) = httpParts(payload,
      headers.getOrElse("content-type", ""))
    Some(WarcRecord(
      file = file, idx = idx,
      warcType = headers.getOrElse("warc-type", ""),
      targetUri = headers.getOrElse("warc-target-uri", ""),
      warcDate = headers.getOrElse("warc-date", ""),
      contentType = headers.getOrElse("content-type", ""),
      contentLength = len, truncated = len > keep, payload = payload,
      httpStatus = status, httpBody = body))
  }

  /** Split an `application/http` payload into (status, body); (0, null)
    * for anything else.
    */
  private[sources] def httpParts(payload: Array[Byte],
      contentType: String): (Int, Array[Byte]) = {
    val isHttp = contentType.startsWith("application/http") ||
      (payload.length >= 5 &&
        new String(payload, 0, 5, "ISO-8859-1") == "HTTP/")
    if (!isHttp) return (0, null)
    // status line: HTTP/1.x NNN ...
    var eol = payload.indexOf('\n'.toByte)
    if (eol < 0) return (0, null)
    val statusLine = new String(payload, 0, eol, "ISO-8859-1").trim
    val status = statusLine.split("\\s+") match {
      case Array(_, code, _*) if code.forall(_.isDigit) => code.toInt
      case _ => 0
    }
    // body starts after the first blank line
    var i = eol + 1
    var bodyAt = -1
    while (bodyAt < 0 && i < payload.length) {
      eol = payload.indexOf('\n'.toByte, i)
      if (eol < 0) return (status, null)
      val lineLen = eol - i - (if (eol > i && payload(eol - 1) == '\r') 1 else 0)
      if (lineLen == 0) bodyAt = eol + 1
      i = eol + 1
    }
    if (bodyAt < 0) (status, null)
    else (status, java.util.Arrays.copyOfRange(payload, bodyAt, payload.length))
  }
}
