package graft

import org.apache.spark.sql.functions._
import graft.text.TextOps
import graft.sources.{Robots, Sitemaps}

/** Seeded fuzz over the crawl-hygiene surface: arbitrary junk must
  * never throw (ANSI mode is ON — an uncaught cast or bad regex
  * WOULD), outputs must be deterministic, and the algebraic
  * properties (Luhn check-digit uniqueness, garble round-trips) must
  * hold. One DataFrame pass per property keeps hundreds of cases
  * cheap.
  */
class CrawlFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(0xC0FFEE)

  private def junkString(maxLen: Int): String = {
    val len = rnd.nextInt(maxLen)
    val sb = new StringBuilder
    (0 until len).foreach { _ =>
      rnd.nextInt(6) match {
        case 0 => sb.append(rnd.nextPrintableChar())
        case 1 => sb.append("://?&#=%/.".charAt(rnd.nextInt(10)))
        case 2 => sb.append((0xC0 + rnd.nextInt(0x700)).toChar)
        case 3 => sb.append("\n")
        case 4 => sb.append(rnd.nextInt(10))
        case 5 => sb.append(Seq("User-agent:", "Disallow:", "Allow:",
          "<url>", "</url>", "<loc>", "utm_x=1", "https://")(
          rnd.nextInt(8)))
      }
    }
    sb.toString
  }

  private lazy val junk = (1 to 300).map(i => (i.toLong, junkString(80)))
    .toDF("id", "s").cache()

  test("canonicalUrl / urlHost / mojibake / NFC / script profile " +
    "never throw on junk and are deterministic") {
    val once = junk.select(col("id"),
      TextOps.canonicalUrl(col("s")).as("c"),
      TextOps.urlHost(col("s")).as("h"),
      TextOps.mojibakeScore(col("s")).as("m"),
      TextOps.fixMojibake(col("s")).as("f"),
      TextOps.nfcNormalize(col("s")).as("n"),
      TextOps.dominantScript(col("s")).as("d"))
    val a = once.collect().map(_.toSeq).toSeq
    val b = once.collect().map(_.toSeq).toSeq
    assert(a == b)
    assert(a.length == 300)
  }

  test("robots + sitemap parsers accept junk bodies; emitted rules " +
    "are well-formed") {
    val rules = Robots.parseRules(
      junk.select(concat(lit("h"), col("id")).as("host"),
        col("s").as("body")), "host", "body").collect()
    rules.foreach { r =>
      assert(r.getString(3).nonEmpty) // path never empty
    }
    val locs = Sitemaps.parse(junk.select(col("s").as("xml")), "xml")
      .collect()
    locs.foreach(r => assert(r.getString(0).nonEmpty))
  }

  test("Luhn: for any digit base, exactly one of the ten check " +
    "digits validates") {
    val bases = (1 to 60).map { _ =>
      (12 + rnd.nextInt(6), math.abs(rnd.nextLong()))
    }.map { case (len, seed) =>
      val r2 = new scala.util.Random(seed)
      (1 to len).map(_ => r2.nextInt(10)).mkString
    }
    val counts = bases.toDF("base")
      .select(col("base"),
        explode(sequence(lit(0), lit(9))).as("d"))
      .select(col("base"),
        TextOps.luhnValid(concat(col("base"), col("d"))).as("ok"))
      .groupBy("base").agg(sum(when(col("ok"), 1).otherwise(0)).as("n"))
      .collect()
    counts.foreach(r => assert(r.getLong(1) == 1L, r))
  }

  test("fixMojibake round-trips every cp1252-safe garbled string") {
    val safe = (1 to 100).map { i =>
      // letters + latin-1 accents that survive the cp1252 round trip
      val chars = "abc deéèüñÅ!?"
      (i.toLong, (1 to (1 + rnd.nextInt(30)))
        .map(_ => chars.charAt(rnd.nextInt(chars.length))).mkString)
    }.toDF("id", "clean")
      .withColumn("moji", lit(null).cast("string"))
    val garbled = safe.drop("moji").collect().map { r =>
      val c = r.getString(1)
      (r.getLong(0), c, new String(c.getBytes("UTF-8"), "windows-1252"))
    }.toSeq.toDF("id", "clean", "moji")
    val bad = garbled
      .select(col("id"), col("clean"),
        TextOps.fixMojibake(col("moji")).as("fixed"))
      .filter(col("clean") =!= col("fixed"))
    assert(bad.count() == 0, bad.collect().mkString("|"))
  }
}
