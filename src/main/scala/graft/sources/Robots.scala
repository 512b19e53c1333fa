package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** robots.txt parsing and URL evaluation — the crawl-politeness layer
  * every fetch pipeline runs before a URL reaches the frontier (REP,
  * RFC 9309). Column-only: line classification is one regexp, group
  * membership is a lag+running-sum window PARTITIONED BY HOST (robots
  * bodies are a few KB — the partition is one file's lines, never the
  * corpus), and evaluation is an equi-join on host plus a longest-
  * prefix pick. Everything replays in SQL (q141).
  *
  * Supported surface: `User-agent` groups (multiple agents per group),
  * `Allow`/`Disallow` prefix rules, `#` comments, case-insensitive
  * directive names, most-specific-rule-wins with Allow beating
  * Disallow on ties (the Google/RFC 9309 precedence), empty
  * `Disallow:` = no restriction, exact-agent groups overriding `*`
  * groups entirely. NOT supported (documented, conservatively): `*`
  * and `$` wildcards inside rule paths are treated as literal
  * characters; `Crawl-delay`/`Sitemap` lines parse as no-ops.
  */
/** sitemap.xml parsing — the other half of crawl discovery (robots
  * points at sitemaps; sitemaps enumerate the URLs worth fetching,
  * with freshness hints). Pure regexp block extraction: `<url>` blocks
  * via a dotall non-greedy scan, `<loc>`/`<lastmod>` fields per block
  * — both Java regex and RE2 execute the identical pattern, so parsing
  * hash-gates (q142). Nested `<sitemapindex>` files parse with
  * [[Sitemaps.indexLocs]].
  */
object Sitemaps {

  /** One row per `<url>` entry: `(loc, lastmod)`, `lastmod` NULL when
    * absent. Extra per-URL tags (`changefreq`, `priority`) are ignored
    * by the block regex and can be pulled the same way when needed.
    */
  def parse(sitemaps: DataFrame, xmlCol: String): DataFrame =
    sitemaps
      .withColumn("_block",
        explode(regexp_extract_all(col(xmlCol),
          lit("(?s)<url>(.*?)</url>"), lit(1))))
      .withColumn("loc",
        regexp_extract(col("_block"), "<loc>\\s*([^<]*?)\\s*</loc>", 1))
      .withColumn("lastmod",
        when(regexp_extract(col("_block"),
          "<lastmod>\\s*([^<]*?)\\s*</lastmod>", 1) === "", lit(null))
          .otherwise(regexp_extract(col("_block"),
            "<lastmod>\\s*([^<]*?)\\s*</lastmod>", 1)))
      .filter(col("loc") =!= "")
      .drop("_block", xmlCol)

  /** Child sitemap locations from a `<sitemapindex>` file. */
  def indexLocs(index: DataFrame, xmlCol: String): DataFrame =
    index
      .withColumn("_block",
        explode(regexp_extract_all(col(xmlCol),
          lit("(?s)<sitemap>(.*?)</sitemap>"), lit(1))))
      .withColumn("child_loc",
        regexp_extract(col("_block"), "<loc>\\s*([^<]*?)\\s*</loc>", 1))
      .filter(col("child_loc") =!= "")
      .drop("_block", xmlCol)
}

object Robots {

  private val lineRe =
    "(?i)^[ \\t]*(user-agent|disallow|allow|crawl-delay)" +
      "[ \\t]*:[ \\t]*(.*)$"

  /** Parse robots.txt bodies into prefix rules.
    *
    * Input: one row per host with the raw body. Output:
    * `(host, agent, allow, path)` — one row per (agent × rule) in the
    * body, `allow` boolean, `path` the prefix. Empty-path rules are
    * dropped (an empty `Disallow:` means "everything allowed" in REP —
    * i.e. no rule).
    */
  def parseRules(
      robots: DataFrame, hostCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(hostCol).orderBy("pos")
    val lines = robots
      .select(col(hostCol).as("host"),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .withColumn("line", regexp_replace(col("line"), "#.*$", ""))
      .withColumn("kind",
        lower(regexp_extract(col("line"), lineRe, 1)))
      .withColumn("value", trim(regexp_extract(col("line"), lineRe, 2)))
      .filter(col("kind") =!= "")
    // a new agent group starts at an agent line whose predecessor is
    // not an agent line (agent runs share one group)
    val grouped = lines
      .withColumn("is_agent", col("kind") === "user-agent")
      .withColumn("starts_group",
        col("is_agent") &&
          !coalesce(lag(col("is_agent"), 1).over(w), lit(false)))
      .withColumn("grp",
        sum(col("starts_group").cast("long")).over(w))
    val agents = grouped.filter(col("is_agent"))
      .select(col("host"), col("grp"), col("value").as("agent"))
    val rules = grouped
      .filter(col("kind").isin("allow", "disallow") &&
        col("value") =!= "")
      .select(col("host"), col("grp"),
        (col("kind") === "allow").as("allow"),
        col("value").as("path"))
    agents.join(rules, Seq("host", "grp"))
      .select(col("host"), col("agent"), col("allow"), col("path"))
  }

  /** Crawl-delay directives per (host, agent) — the REP extension
    * every polite fetcher honors: seconds between requests to the
    * host, hence the host's max fetch rate. Same group mechanics as
    * [[parseRules]] (a delay belongs to the agent run above it);
    * non-numeric values drop; duplicate declarations keep the MOST
    * conservative (max) delay. Output: `(host, agent, delay_sec,
    * max_rps)` with `max_rps = round(1/delay, 6)`.
    */
  def crawlDelays(
      robots: DataFrame, hostCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(hostCol).orderBy("pos")
    val lines = robots
      .select(col(hostCol).as("host"),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .withColumn("line", regexp_replace(col("line"), "#.*$", ""))
      .withColumn("kind",
        lower(regexp_extract(col("line"), lineRe, 1)))
      .withColumn("value", trim(regexp_extract(col("line"), lineRe, 2)))
      .filter(col("kind") =!= "")
    val grouped = lines
      .withColumn("is_agent", col("kind") === "user-agent")
      .withColumn("starts_group",
        col("is_agent") &&
          !coalesce(lag(col("is_agent"), 1).over(w), lit(false)))
      .withColumn("grp",
        sum(col("starts_group").cast("long")).over(w))
    val agents = grouped.filter(col("is_agent"))
      .select(col("host"), col("grp"), col("value").as("agent"))
    val delays = grouped
      .filter(col("kind") === "crawl-delay" &&
        col("value").rlike("^[0-9]+(\\.[0-9]+)?$"))
      .select(col("host"), col("grp"),
        col("value").cast("double").as("delay_sec"))
      .filter(col("delay_sec") > 0) // "0" = unconstrained = absent
    agents.join(delays, Seq("host", "grp"))
      .groupBy("host", "agent")
      .agg(max(col("delay_sec")).as("delay_sec"))
      .select(col("host"), col("agent"), col("delay_sec"),
        round(lit(1.0) / col("delay_sec"), 6).as("max_rps"))
  }

  /** Path component of a URL (query string included — REP rules match
    * against path+query), `/` when absent.
    */
  def urlPath(url: Column): Column = {
    val p = regexp_replace(url,
      "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", "")
    when(p === "" || p.startsWith("#"), lit("/"))
      .otherwise(regexp_replace(p, "#.*$", ""))
  }

  /** Evaluate URLs against parsed rules for one crawler agent.
    *
    * Group selection is per RFC 9309: if any group names `agent`
    * exactly (case-insensitive), ONLY those rules apply; otherwise the
    * `*` groups do. Verdict per URL: the matching rule with the
    * longest path wins, Allow beats Disallow at equal length, no match
    * = allowed. Output: `(url, host, allowed, matched_path)` with
    * `matched_path` NULL on no-match.
    *
    * Scale shape: one equi-join URL-host × rule-host (rules per host
    * are tiny; hot hosts are bounded by their robots size, not the
    * corpus), then an integer/string `max_by` pick — no window over
    * URLs, no cross join.
    */
  def evaluate(
      urls: DataFrame, rules: DataFrame, agent: String): DataFrame = {
    val agentLc = agent.toLowerCase
    val hostHasSpecific = rules
      .groupBy("host")
      .agg(max(lower(col("agent")) === agentLc).as("has_specific"))
    val applicable = rules.join(hostHasSpecific, Seq("host"))
      .filter(
        (lower(col("agent")) === agentLc) ||
          (!col("has_specific") && col("agent") === "*"))
      .select(col("host"), col("allow"), col("path"))
      .distinct() // repeated agent lines / duplicate rules fold away
    val u = urls.select(col("url"),
      graft.text.TextOps.urlHost(col("url")).as("host"),
      urlPath(col("url")).as("_path"))
    val matched = u.join(applicable, Seq("host"))
      .filter(col("_path").startsWith(col("path")))
      // longest path wins; ties: allow ('1') beats disallow ('0');
      // the path tail makes the key total so both max_by picks agree
      .withColumn("_k", concat(
        lpad(length(col("path")).cast("string"), 10, "0"),
        when(col("allow"), lit("1")).otherwise(lit("0")),
        col("path")))
      .groupBy("url")
      .agg(max_by(col("allow"), col("_k")).as("_verdict"),
        max_by(col("path"), col("_k")).as("matched_path"))
    u.select(col("url"), col("host"))
      .join(matched, Seq("url"), "left")
      .select(col("url"), col("host"),
        coalesce(col("_verdict"), lit(true)).as("allowed"),
        col("matched_path"))
  }
}
