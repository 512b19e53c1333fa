package graft

import org.apache.spark.sql.functions._
import graft.sources.Robots

/** robots.txt parsing + evaluation: REP group semantics, precedence,
  * agent override, defaults.
  */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private def rules(body: String, host: String = "h") =
    Robots.parseRules(Seq((host, body)).toDF("host", "body"),
      "host", "body")

  private def verdicts(body: String, agent: String,
      urls: Seq[String]): Map[String, (Boolean, Option[String])] =
    Robots.evaluate(urls.toDF("url"), rules(body), agent)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getBoolean(2), Option(r.getString(3))))).toMap

  test("parse: shared groups, comments, case-insensitivity, empty " +
    "Disallow dropped") {
    val body = Seq(
      "# top comment",
      "User-Agent: botA",
      "user-agent: botB",
      "DISALLOW: /x/   # trailing comment",
      "Allow: /x/pub",
      "Disallow:",          // empty = no rule
      "",
      "User-agent: *",
      "Disallow: /y/").mkString("\n")
    val got = rules(body).collect()
      .map(r => (r.getString(1), r.getBoolean(2), r.getString(3)))
      .toSet
    assert(got == Set(
      ("botA", false, "/x/"), ("botA", true, "/x/pub"),
      ("botB", false, "/x/"), ("botB", true, "/x/pub"),
      ("*", false, "/y/")), got)
  }

  test("evaluate: longest prefix wins, Allow beats Disallow on tie, " +
    "no-match defaults to allowed") {
    val body = Seq(
      "User-agent: *",
      "Disallow: /a/",
      "Allow: /a/b/",
      "Disallow: /same/",
      "Allow: /same/").mkString("\n") // tie: allow wins
    val got = verdicts(body, "anybot", Seq(
      "https://h/a/file", "https://h/a/b/file", "https://h/same/x",
      "https://h/other"))
    assert(got("https://h/a/file") == ((false, Some("/a/"))))
    assert(got("https://h/a/b/file") == ((true, Some("/a/b/"))))
    assert(got("https://h/same/x")._1 == true) // tie resolves to allow
    assert(got("https://h/other") == ((true, None)))
  }

  test("evaluate: exact-agent group overrides * entirely") {
    val body = Seq(
      "User-agent: graftbot",
      "Disallow: /only-graft/",
      "User-agent: *",
      "Disallow: /").mkString("\n")
    // graftbot: only its own group applies -> /pub allowed
    val g = verdicts(body, "GraftBot", // case-insensitive agent match
      Seq("https://h/pub", "https://h/only-graft/x"))
    assert(g("https://h/pub")._1 == true)
    assert(g("https://h/only-graft/x")._1 == false)
    // an unrelated bot falls to '*': everything blocked
    val o = verdicts(body, "otherbot", Seq("https://h/pub"))
    assert(o("https://h/pub")._1 == false)
  }

  test("urlPath: query kept, fragment stripped, bare host is /") {
    val cases = Seq(
      "https://h/a/b?q=1#frag" -> "/a/b?q=1",
      "https://h" -> "/",
      "https://h/" -> "/",
      "https://h#frag" -> "/")
    val got = cases.map(_._1).toDF("u")
      .select(Robots.urlPath(col("u"))).collect().map(_.getString(0))
    assert(got.toSeq == cases.map(_._2), got.mkString("|"))
  }

  test("evaluate with no rules at all allows everything") {
    val got = Robots.evaluate(Seq("https://h/x").toDF("url"),
      rules("# nothing here"), "bot").first()
    assert(got.getBoolean(2) && got.isNullAt(3))
  }

  test("crawlDelays: per-group attachment, max of duplicates, zero " +
    "and junk values dropped, agent runs closed by directives") {
    val body = Seq(
      "User-agent: a",
      "User-agent: b",          // shared group
      "Crawl-delay: 3",
      "Crawl-delay: 1.5",       // dup: max (3.0) wins
      "User-agent: c",
      "Crawl-delay: 0",         // unconstrained -> dropped
      "User-agent: d",
      "Crawl-delay: nope").mkString("\n")
    val got = graft.sources.Robots.crawlDelays(
      Seq(("h", body)).toDF("host", "body"), "host", "body")
      .collect()
      .map(r => r.getString(1) -> ((r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(got.keySet == Set("a", "b"), got)
    assert(got("a") == ((3.0, 0.333333)) && got("b") == ((3.0, 0.333333)))
  }

  test("sitemap parse: loc + optional lastmod, whitespace tolerated, " +
    "locless blocks dropped") {
    val xml = """<?xml version="1.0"?><urlset>
      |<url><loc> https://a/1 </loc><lastmod>2024-01-02</lastmod></url>
      |<url>
      |  <loc>https://a/2</loc>
      |</url>
      |<url><lastmod>2024-01-03</lastmod></url>
      |</urlset>""".stripMargin
    val got = graft.sources.Sitemaps
      .parse(Seq(Tuple1(xml)).toDF("xml"), "xml")
      .collect().map(r => (r.getString(0), Option(r.getString(1))))
      .toSet
    assert(got == Set(("https://a/1", Some("2024-01-02")),
      ("https://a/2", None)), got)
  }

  test("sitemapindex: child locations enumerate") {
    val xml = "<sitemapindex>" +
      "<sitemap><loc>https://a/s1.xml</loc></sitemap>" +
      "<sitemap><loc>https://a/s2.xml</loc></sitemap></sitemapindex>"
    val got = graft.sources.Sitemaps
      .indexLocs(Seq(Tuple1(xml)).toDF("xml"), "xml")
      .collect().map(_.getString(0)).toSet
    assert(got == Set("https://a/s1.xml", "https://a/s2.xml"))
  }

  test("readability: hand-computed FK on a known sentence pair") {
    import graft.text.TextOps
    // "The cat sat. It ran away." -> words 6, sentences 2,
    // vowel groups: e,a,a,i,a,a,ay = 7
    val r = Seq(Tuple1("The cat sat. It ran away.")).toDF("t")
      .select(TextOps.readability(col("t")): _*).first()
    assert(r.getInt(0) == 6 && r.getInt(1) == 2 && r.getInt(2) == 7, r)
    val wps = 6.0 / 2.0; val spw = 7.0 / 6.0
    val fk = BigDecimal(0.39 * wps + 11.8 * spw - 15.59)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(3) == fk, r)
    // empty text: zero words -> NULL scores, sentence floor 1
    val e = Seq(Tuple1("")).toDF("t")
      .select(TextOps.readability(col("t")): _*).first()
    assert(e.getInt(0) == 0 && e.getInt(1) == 1)
    assert(e.isNullAt(3) && e.isNullAt(4))
  }
}
