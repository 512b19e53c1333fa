package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, token statistics, word-shingling, content hashing,
  * MinHash signatures, SimHash fingerprints, rolling-hash fingerprints,
  * marker-based language ID and quality scoring.
  *
  * Everything is pure `Column` algebra (codegen'd, no UDFs) and — where a
  * gate query needs a DuckDB oracle — built only from operations both
  * engines compute bit-identically (md5, integer arithmetic, left-fold
  * sums). At 100 TB each op is embarrassingly parallel per document: no
  * shuffles, no state, runs inside the scan stage.
  */
object TextOps {

  /** Modulus for 32-bit-ish hashing: 2^31 - 1 (Mersenne prime). */
  val P: Long = 2147483647L
  /** Modulus for rolling fingerprints: 1e9+7 (fits acc*31+h in a long). */
  val FP: Long = 1000000007L

  /** Whitespace tokenization, production flavor (any whitespace runs). */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => length(t) > 0)

  /** Single-space tokenization — the cross-engine-exact flavor used by the
    * gate queries (`string_split(text, ' ')` in DuckDB).
    */
  def tokensSimple(text: Column): Column = split(text, " ")

  /** Compression-ratio quality signal (the Gopher-family
    * compressibility filter): deflated-bytes / raw-bytes of the UTF-8
    * text via the fused [[graft.functions.DeflateRatioXX]] kernel
    * (thread-local zlib state, scan-stage, codegen'd). Repetitive spam
    * lands far below the natural-prose band, near-random noise above
    * it. Single-engine heuristic — see the kernel doc for why it is
    * deliberately not oracle-gated.
    */
  def compressionRatio(text: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.DeflateRatioExprXX(
      ColumnBridge.expression(text)))
  }

  /** WITHIN-document span dedup — the RefinedWeb-style intra-doc
    * repetition cleanup: split on the LITERAL delimiter, keep only the
    * FIRST occurrence of each span, rejoin. A crawl page repeating its
    * nav block or a generated doc stuck in a loop loses the repeats
    * while cross-document frequency is untouched (that is
    * [[graft.text.Dedup.dedupLines]]'s job). Pure scan-stage array
    * expression — no shuffle, no state; O(spans²) per doc via
    * `array_position`, fine for document-sized span counts. Null text
    * stays null.
    */
  def dedupSpansInDoc(text: Column, delimiter: String): Column = {
    val pat = java.util.regex.Pattern.quote(delimiter)
    val arr = split(text, pat)
    array_join(
      filter(arr, (ln, i) =>
        array_position(arr, ln) === (i + 1).cast("long")),
      delimiter)
  }

  /** Canonical dedup key — the CCNet-style normalization applied before
    * exact-hash dedup so trivially-mutated copies (case, punctuation,
    * whitespace runs) collapse: lowercase, non-alphanumerics → space,
    * whitespace runs → one space, trimmed. Character classes are the
    * Unicode `\p{L}\p{N}` so the rule is language-agnostic; every step
    * is a scan-stage regex expression replayable in any RE2/Java-regex
    * engine (identical semantics for these classes).
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^\\p{L}\\p{N}\\s]", " "),
      "\\s+", " "))

  /** HTML → text extraction as a pure scan-stage regex chain — the
    * step between a crawl ([[graft.sources.Warc.readResponses]]) and
    * every text operator here: drop `<script>`/`<style>` blocks and
    * comments (their content is never prose), strip remaining tags,
    * decode the half-dozen entities that dominate real pages, collapse
    * whitespace. Deliberately NOT a DOM parser — at 100 TB the
    * extraction must be codegen-able and shuffle-free, and trafilatura
    * -grade boilerplate removal composes AFTER this ([[gopherRules]],
    * line dedup and the quality classifier are that stage here).
    *
    * Every pattern is in the Java∩RE2 regex subset — no backreferences
    * or lookaround, explicit whitespace class — so an external engine
    * replays the extraction byte-for-byte (the q35 discipline).
    * Case-insensitivity is spelled `(?i)`, supported by both.
    */
  def htmlToText(html: Column): Column = {
    val ws = "[ \\t\\n\\f\\r]"
    val noScript = regexp_replace(html,
      "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript,
      "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]*>", " ")
    val entities = Seq("&nbsp;" -> " ", "&amp;" -> "&", "&lt;" -> "<",
      "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'", "&apos;" -> "'")
    val decoded = entities.foldLeft(noTags) { case (c, (from, to)) =>
      regexp_replace(c, from, to)
    }
    trim(regexp_replace(decoded, ws + "+", " "))
  }

  /** URL host extraction — the glue between a crawl source
    * ([[graft.sources.Warc]] target URIs) and per-domain policies
    * (frequency caps via [[graft.operators.Relational.keyCapSample]],
    * per-domain dedup/quality rollups): scheme and userinfo dropped,
    * port and path/query/fragment stripped, lowercased. One
    * `regexp_extract` in the Java∩RE2 subset (non-capturing groups
    * only — no lookaround), scan-stage and oracle-replayable. Rows
    * that are not absolute URLs extract as the empty string.
    */
  def urlHost(url: Column): Column =
    lower(regexp_extract(url,
      "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)", 1))

  /** URL canonicalization — the URL-LEVEL dedup key every crawl
    * pipeline computes before content dedup (C4 dedups by URL first;
    * re-crawls and tracking links otherwise multiply the same page):
    * fragment dropped, tracking parameters removed (`utm_*`, `gclid`,
    * `fbclid`, `msclkid`, `ref`), separator debris cleaned (`?&`→`?`,
    * `&&`→`&`, trailing `?`/`&` dropped), scheme+host lowercased
    * (the PATH keeps its case — it is case-significant), and a single
    * trailing slash stripped. A pure RE2-safe scan-stage regex chain
    * (the q130 discipline) so the key replays across engines; dedup by
    * it with the existing exact-dedup machinery, or group by
    * [[urlHost]] of it for domain policies.
    */
  def canonicalUrl(url: Column): Column = {
    val hostPat = "^([a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?[^/?#]*)"
    val noFrag = regexp_replace(url, "#.*$", "")
    val noTrack = regexp_replace(noFrag,
      "([?&])(utm_[a-zA-Z]+|gclid|fbclid|msclkid|ref)=[^&#]*", "$1")
    val clean = regexp_replace(
      regexp_replace(
        regexp_replace(noTrack, "\\?&+", "?"),
        "&&+", "&"),
      "[?&]+$", "")
    val noSlash = regexp_replace(clean, "/$", "")
    // lowercase scheme://[userinfo@]host, keep the rest byte-exact
    concat(
      lower(regexp_extract(noSlash, hostPat, 1)),
      regexp_replace(noSlash, hostPat, ""))
  }

  /** Unicode NFC canonical composition (SQL: `graft_nfc`) — run before
    * exact-dedup keys, vocabulary builds, and BPE so precomposed and
    * decomposed spellings of the same word collide. Pure-ASCII rows
    * short-circuit with zero allocation; see
    * [[graft.functions.NfcNormalizeXX]].
    */
  def nfcNormalize(text: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.NfcNormalizeExprXX(
      ColumnBridge.expression(text)))
  }

  /** Aho-Corasick multi-pattern blocklist match: ONE text pass for
    * the whole term list vs |terms| `contains` scans — the only
    * workable shape when blocklists run to tens of thousands of
    * phrases. Returns struct `{n_matched, first_term}`; see
    * [[graft.functions.MultiMatchXX]] for the replay contract.
    */
  def multiMatch(text: Column, terms: Seq[String]): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.MultiMatchExprXX(
      ColumnBridge.expression(text), terms))
  }


  /** Mojibake marker count — the detection side of the double-
    * encoding pair (see [[graft.functions.FixMojibakeXX]] for the
    * repair kernel). Counts the three canonical UTF-8-seen-as-cp1252
    * signatures: `A-tilde + continuation-range char` (Latin-1 letters:
    * e-acute arrives as 0xC3 0xA9), `a-circumflex + euro + anything`
    * (General Punctuation: curly quotes/dashes), and `A-circumflex +
    * high-punctuation` (NBSP and friends). Pure scan-stage regexp
    * arithmetic, replayed by RE2 in the q138 oracle. A handful of
    * marks in natural text is conclusive: the sequences are
    * vanishingly rare in clean prose.
    */
  def mojibakeScore(text: Column): Column =
    regexp_count(text,
      lit("(\u00C3[\u0080-\u00BF])|(\u00E2\u20AC.)|(\u00C2[\u00A0-\u00BF])")).cast("int")

  /** Repair double-encoded text via the `graft_fix_mojibake` kernel
    * (strict cp1252 encode, strict UTF-8 decode, untouched on any
    * failure). Clean text — including genuine Latin-1 prose — passes
    * through byte-identical.
    */
  def fixMojibake(text: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.FixMojibakeExprXX(
      ColumnBridge.expression(text)))
  }

  /** Readability statistics — Flesch-Kincaid grade level and Flesch
    * reading ease, the classic prose-difficulty filters (a corpus
    * skewed to grade-18 legalese or grade-1 listicles is a data-mix
    * smell). Words are letter runs, sentences are terminal-punctuation
    * runs (floored at 1), syllables the standard vowel-group
    * approximation — all scan-stage regexp counts, and the two scores
    * are fixed IEEE chains over single divisions, so the whole report
    * hash-gates (q143). Zero-word rows yield NULL scores.
    */
  def readability(text: Column): Seq[Column] = {
    val w = regexp_count(text, lit("[A-Za-z]+"))
    val sen = greatest(lit(1), regexp_count(text, lit("[.!?]+")))
    val syl = regexp_count(text, lit("(?i)[aeiouy]+"))
    val wps = w.cast("double") / sen.cast("double")
    val spw = syl.cast("double") / w.cast("double")
    Seq(w.as("n_words"), sen.as("n_sentences"), syl.as("n_syllables"),
      round(when(w === 0, lit(null).cast("double"))
        .otherwise(lit(0.39) * wps + lit(11.8) * spw - lit(15.59)), 6)
        .as("fk_grade"),
      round(when(w === 0, lit(null).cast("double"))
        .otherwise(lit(206.835) - lit(1.015) * wps - lit(84.6) * spw), 6)
        .as("flesch_ease"))
  }

  /** HTML head metadata — the per-page fields a crawl indexes besides
    * the body text: `<title>`, `<meta name="description">`, the
    * declared charset (HTML5 `<meta charset>` or the legacy
    * `http-equiv` content-type), and the canonical `<link rel>`.
    * All dotall non-greedy regexes in the Java∩RE2 subset (the q130
    * htmlToText discipline), so extraction hash-gates (q159). Missing
    * fields come back as empty strings — callers `nullif` as needed.
    * Declared charset pairs with [[mojibakeScore]]: a page declaring
    * `iso-8859-1` but scoring mojibake marks was double-decoded
    * upstream.
    */
  def htmlTitle(html: Column): Column =
    regexp_extract(html, "(?is)<title[^>]*>\\s*(.*?)\\s*</title>", 1)

  /** `<meta name="description" content="...">` (either attribute
    * order), see [[htmlTitle]].
    */
  def htmlMetaDescription(html: Column): Column =
    when(regexp_extract(html,
        "(?is)<meta\\s+name=\"description\"\\s+content=\"([^\"]*)\"",
        1) =!= "",
      regexp_extract(html,
        "(?is)<meta\\s+name=\"description\"\\s+content=\"([^\"]*)\"", 1))
      .otherwise(regexp_extract(html,
        "(?is)<meta\\s+content=\"([^\"]*)\"\\s+name=\"description\"", 1))

  /** Declared charset, lowercased: HTML5 `<meta charset="...">` wins,
    * legacy `http-equiv` content-type charset= is the fallback. See
    * [[htmlTitle]].
    */
  def htmlCharset(html: Column): Column = {
    val h5 = regexp_extract(html,
      "(?is)<meta\\s+charset=\"?([a-zA-Z0-9_-]+)\"?", 1)
    val legacy = regexp_extract(html,
      "(?is)<meta\\s+http-equiv=\"content-type\"[^>]*" +
        "charset=([a-zA-Z0-9_-]+)", 1)
    lower(when(h5 =!= "", h5).otherwise(legacy))
  }

  /** BPE-ish sub-token split: letter runs, digit runs, and individual
    * punctuation marks each count as one token — the cheap stand-in for a
    * real BPE vocabulary when estimating LLM token budgets. "don't stop,
    * v2!" → [don, ', t, stop, ',', v, 2, !] (8 tokens). Pure regex
    * expression, runs in the scan stage.
    *
    * Whitespace is the explicit class `[ \t\n\f\r]` rather than `\s`:
    * Java's `\s` includes U+000B (vertical tab) while RE2 engines'
    * (DuckDB's, replaying the q35 oracle) does not — with the explicit
    * class, a vertical tab is punctuation (one token) on both engines.
    */
  def tokensBpeish(text: Column): Column =
    filter(
      split(regexp_replace(text,
        "([A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\f\\r])",
        "$1\u0000"), "\u0000|[ \\t\\n\\f\\r]+"),
      t => length(t) > 0)

  /** Estimated LLM token count via the BPE-ish split. */
  def tokenEstimate(text: Column): Column = size(tokensBpeish(text))

  /** Load a ranked BPE merge table from a (rank, left, right) DataFrame —
    * the loadable-vocabulary upgrade over the [[tokensBpeish]] regex
    * stand-in. Merge tables are MODEL METADATA (tens of thousands of
    * rows, public formats), not data: collecting them to the driver and
    * baking them into the plan is the correct scale shape — the corpus
    * side then tokenizes in the scan stage with no lookup join.
    */
  /** Vocabulary coverage: token count, out-of-vocabulary count, and the
    * OOV rate against a LOADED vocabulary — the corpus-filter signal a
    * tokenizer's vocab induces (high-OOV docs are noise/wrong-language).
    * The vocab is model metadata: it bakes into the plan as a hash-set
    * membership probe (`isInCollection`), so the corpus side stays a
    * scan-stage map with no lookup join. Returns a struct
    * {n_tokens, n_oov, oov_rate}.
    */
  def oovStats(toks: Column, vocab: Seq[String]): Column = {
    val n = size(toks)
    val nOov = size(filter(toks, t => !t.isInCollection(vocab)))
    struct(n.as("n_tokens"), nOov.as("n_oov"),
      round(nOov.cast("double") / greatest(n, lit(1)), 6).as("oov_rate"))
  }

  /** Load a one-token-per-row vocabulary column into the driver-side
    * list [[oovStats]] consumes (vocabularies are model metadata —
    * tens of thousands of rows).
    */
  def loadVocab(df: DataFrame, tokenCol: String = "token"): Seq[String] =
    df.select(col(tokenCol)).na.drop().collect().map(_.getString(0)).toSeq

  /** Per-document novelty: of a doc's DISTINCT word n-grams, what
    * fraction appear for the first time in id order (min doc_id over
    * the corpus) — the "how much new content does this doc introduce"
    * signal behind dedup lineage, curriculum ordering, and
    * diminishing-returns curves for crawl snapshots (a snapshot whose
    * docs average near-zero novelty adds nothing to training). Returns
    * `(idCol, n_grams, n_novel, novelty)`; docs shorter than one
    * n-gram carry no row.
    *
    * Scale shape: one gram-keyed aggregation for the first-occurrence
    * table (map-side combine — duplicates collapse before the
    * shuffle), one equi-join back on gram, one per-doc aggregation.
    * The gram join is the corpus-sized shuffle; the integer counts and
    * the single-division ratio replay exactly in an external engine.
    */
  def noveltyScore(df: DataFrame, textCol: String, idCol: String,
      k: Int = 3,
      tokenizer: Column => Column = tokensSimple): DataFrame = {
    val grams = df
      .select(col(idCol), explode(shingles(tokenizer(col(textCol)), k))
        .as("_g"))
      .distinct()
    val first = grams.groupBy(col("_g"))
      .agg(min(col(idCol)).as("_first"))
    grams.join(first, Seq("_g"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("_first") === col(idCol), 1L).otherwise(0L))
          .as("n_novel"))
      .select(col(idCol), col("n_grams"), col("n_novel"),
        round(col("n_novel").cast("double") /
          col("n_grams").cast("double"), 6).as("novelty"))
  }

  /** Persist the (gram, first_doc) first-occurrence table
    * [[noveltyScore]] derives — the write-once artifact for repeated
    * novelty runs (each re-run otherwise re-explodes the corpus to
    * rebuild it). Update incrementally on append by unioning the new
    * batch's table and re-minimizing.
    */
  def writeNoveltyIndex(df: DataFrame, path: String, textCol: String,
      idCol: String, k: Int = 3,
      tokenizer: Column => Column = tokensSimple): Unit =
    df.select(col(idCol),
        explode(shingles(tokenizer(col(textCol)), k)).as("gram"))
      .groupBy(col("gram")).agg(min(col(idCol)).as("first_doc"))
      .write.mode("overwrite").parquet(path)

  /** Novelty against a persisted first-occurrence index: same output
    * as [[noveltyScore]] when the index was built from the same
    * corpus; against an OLDER index, new docs score novelty relative
    * to the indexed snapshot (the incremental-crawl question: "what
    * does this batch add?"). Grams absent from the index are novel.
    */
  def noveltyFromIndex(df: DataFrame, firstDocs: DataFrame,
      textCol: String, idCol: String, k: Int = 3,
      tokenizer: Column => Column = tokensSimple): DataFrame = {
    val grams = df.select(col(idCol),
        explode(shingles(tokenizer(col(textCol)), k)).as("gram"))
      .distinct()
    grams.join(firstDocs, Seq("gram"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc").isNull ||
          col("first_doc") === col(idCol), 1L).otherwise(0L))
          .as("n_novel"))
      .select(col(idCol), col("n_grams"), col("n_novel"),
        round(col("n_novel").cast("double") /
          col("n_grams").cast("double"), 6).as("novelty"))
  }

  /** Term-level drift attribution between two corpus slices — the
    * informative-Dirichlet-prior log-odds of Monroe, Colaresi &
    * Quinn 2008 ("Fightin' Words"): for each term,
    * `δ = ln((c₂+a)/(n₂+A−c₂−a)) − ln((c₁+a)/(n₁+A−c₁−a))` with the
    * corpus-wide counts as the prior (a = prior·c, A = prior·n), and
    * its approximate variance `1/(c₂+a) + 1/(c₁+a)`. Positive δ =
    * over-represented in slice 2. This is the TERM-LEVEL answer to
    * [[Dsir.groupDivergence]]'s bucket-level "which source drifted":
    * WHICH WORDS moved. Values snap to integer micro-nats (the
    * engine-replay discipline). Returns
    * `(term, c1, c2, delta_micro, var_micro)`.
    *
    * Scale shape: two (slice, term) hash aggregations collapse the
    * corpus to vocabulary size (map-side combine), a full outer join
    * aligns the two vocab tables, and the 1-row totals broadcast.
    */
  def fightinWords(df: DataFrame, textCol: String, sliceTwo: Column,
      priorScale: Double = 0.01,
      tokenizer: Column => Column = tokensSimple): DataFrame = {
    val terms = df.select(sliceTwo.cast("int").as("_s2"),
      explode(tokenizer(col(textCol))).as("term"))
    val counts = terms.groupBy(col("term"))
      .agg(sum(when(col("_s2") === 0, 1L).otherwise(0L)).as("c1"),
        sum(when(col("_s2") === 1, 1L).otherwise(0L)).as("c2"))
    val totals = counts.agg(sum(col("c1")).as("_n1"),
      sum(col("c2")).as("_n2"),
      sum(col("c1") + col("c2")).as("_n"))
    val joined = counts.crossJoin(broadcast(totals))
    val a = lit(priorScale) * (col("c1") + col("c2")).cast("double")
    val bigA = lit(priorScale) * col("_n").cast("double")
    def logOdds(c: Column, n: Column): Column =
      log((c.cast("double") + a) /
        (n.cast("double") + bigA - c.cast("double") - a))
    val delta = logOdds(col("c2"), col("_n2")) -
      logOdds(col("c1"), col("_n1"))
    val variance =
      lit(1.0) / (col("c2").cast("double") + a) +
        lit(1.0) / (col("c1").cast("double") + a)
    joined.select(col("term"), col("c1"), col("c2"),
      round(delta * lit(1000000.0)).cast("long").as("delta_micro"),
      round(variance * lit(1000000.0)).cast("long").as("var_micro"))
  }

  /** Collocation extraction by pointwise mutual information (Church &
    * Hanks 1990): for each adjacent token bigram,
    * `pmi = ln(c_ab · N) − ln(c_a · c_b)` with N the corpus token
    * count — how much more often the pair co-occurs than its parts
    * predict. High-PMI pairs are the multi-word units a tokenizer
    * vocabulary should keep whole ("new york", "machine learning");
    * low counts are noise, so `minCount` floors the support. Each ln
    * snaps to integer micro-nats INDEPENDENTLY (one ln of one exact
    * integer product per term), so the difference is pure BIGINT
    * arithmetic an external engine replays exactly.
    *
    * Scale shape: two corpus passes collapse to vocab-sized count
    * tables (map-side combine), the bigram table equi-joins the
    * unigram table twice on its word keys, the 1-row total
    * broadcasts, and the top-k is per-partition heaps
    * (TakeOrdered) — never a global sort.
    *
    * Returns `(w1, w2, c_ab, c_a, c_b, pmi_unat)`, the `topK`
    * strongest collocations (ties: lexicographic).
    */
  def pmiCollocations(df: DataFrame, textCol: String,
      minCount: Long = 5L, topK: Int = 100,
      tokenizer: Column => Column = tokensSimple): DataFrame = {
    val toks = df.select(tokenizer(col(textCol)).as("_w"))
    val uni = toks.select(explode(col("_w")).as("_t"))
      .groupBy(col("_t")).agg(count(lit(1)).as("_c"))
    val total = uni.agg(sum(col("_c")).as("_n_tokens"))
    val bi = toks.select(explode(shingles(col("_w"), 2)).as("_bg"))
      .groupBy(col("_bg")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
      .select(element_at(split(col("_bg"), " "), 1).as("w1"),
        element_at(split(col("_bg"), " "), 2).as("w2"), col("c_ab"))
    bi.join(uni.select(col("_t").as("w1"), col("_c").as("c_a")),
        Seq("w1"))
      .join(uni.select(col("_t").as("w2"), col("_c").as("c_b")),
        Seq("w2"))
      .crossJoin(broadcast(total))
      .select(col("w1"), col("w2"), col("c_ab"), col("c_a"), col("c_b"),
        (round(log(col("c_ab") * col("_n_tokens")) * lit(1e6))
          .cast("long") -
          round(log(col("c_a") * col("c_b")) * lit(1e6)).cast("long"))
          .as("pmi_unat"))
      .orderBy(col("pmi_unat").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /** Vocabulary coverage curve: tokens ranked by corpus frequency
    * (ties: lexicographic), each row carrying the CUMULATIVE fraction
    * of all token occurrences a vocabulary truncated at that rank
    * would cover — the "how big must the vocab be for 99%" input to
    * tokenizer design (the long tail this curve exposes is exactly
    * what BPE exists to compress). Returns
    * `(rank, token, n_occurrences, cum_occurrences, coverage)`.
    *
    * Scale shape — NO global window anywhere (a 100 TB web corpus's
    * whitespace vocabulary runs to hundreds of millions of rows; one
    * `Window.orderBy` would sort all of them on a single reducer). The
    * global rank/prefix-sum decomposes exactly:
    *
    *   rank(t)  = |{t': n(t') > n(t)}| + |{t'': n(t'') = n(t), t'' < t}| + 1
    *   cum(t)   = Σ_{n' > n(t)} n'·|vocab(n')| + intra_rank(t) · n(t)
    *
    * The first summand needs only the DISTINCT-COUNT table (one row
    * per distinct frequency, ≤ 2√N rows for N total occurrences),
    * prefix-summed per log2-octave bucket (`length(bin(n)) - 1` —
    * integer-exact, monotone) with ≤ 64 octave offsets folded from a
    * broadcast array. The second is a per-(n, token-prefix) window —
    * a frequency tie group (the n = 1 singleton spike IS most of the
    * vocabulary) splits across `16^prefixLen`-ish lexicographic
    * sub-buckets, offsets rejoining per n, so no window task ever
    * holds a whole tie group. Both levels read their totals off the
    * window OUTPUT (the [[graft.operators.Relational.tokenShards]]
    * max-of-inclusive-prefix trick) so each level's shuffle is shared,
    * and the token aggregation feeding both levels is one reusable
    * exchange. `prefixLen` is the tie-spike knob (2 chars default).
    */
  def vocabCoverage(df: DataFrame, textCol: String,
      tokenizer: Column => Column = tokensSimple,
      prefixLen: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(prefixLen > 0, s"prefixLen must be positive, got $prefixLen")
    val counts = df
      .select(explode(tokenizer(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n_occurrences"))
    // ---- level A: exclusive prefix (token count, occurrence mass) over
    // the distinct-frequency table in n-DESC order, octave-bucketed
    val perN = counts
      .groupBy(col("n_occurrences").as("_n"))
      .agg(count(lit(1)).as("_tc"))
      .withColumn("_mass", col("_n") * col("_tc"))
      .withColumn("_oct", (length(bin(col("_n"))) - 1).cast("long"))
    val wA = Window.partitionBy(col("_oct")).orderBy(col("_n").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val localA = perN
      .withColumn("_ltc", coalesce(sum(col("_tc")).over(wA), lit(0L)))
      .withColumn("_lms", coalesce(sum(col("_mass")).over(wA), lit(0L)))
    // octave totals off the window OUTPUT (shares wA's shuffle); ≤ 64
    // rows, so the cross-octave offsets are a broadcast array fold —
    // higher octave = larger n = earlier in rank order
    val octTotals = localA.groupBy(col("_oct"))
      .agg(max(col("_ltc") + col("_tc")).as("_otc"),
        max(col("_lms") + col("_mass")).as("_oms"))
    val octArr = octTotals.agg(
      collect_list(struct(col("_oct"), col("_otc"), col("_oms"))).as("_oa"),
      sum(col("_oms")).as("_total"))
    def higherOctSum(field: String): Column = aggregate(
      filter(col("_oa"), e => e.getField("_oct") > col("_oct")),
      lit(0L), (a, e) => a + e.getField(field))
    val baseByN = localA.crossJoin(broadcast(octArr))
      .select(col("_n").as("_jn"),
        (higherOctSum("_otc") + col("_ltc")).as("_rankbase"),
        (higherOctSum("_oms") + col("_lms")).as("_massbase"),
        col("_total"))
    // ---- level B: intra-tie lexicographic rank, prefix-sub-bucketed
    val base = counts
      .withColumn("_pfx", substring(col("token"), 1, prefixLen))
    val wB = Window.partitionBy(col("n_occurrences"), col("_pfx"))
      .orderBy(col("token"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val localB = base.withColumn("_lrank",
      coalesce(sum(lit(1L)).over(wB), lit(0L)))
    val wP = Window.partitionBy(col("n_occurrences")).orderBy(col("_pfx"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val pfxOff = localB.groupBy(col("n_occurrences"), col("_pfx"))
      .agg(max(col("_lrank") + 1L).as("_ptot"))
      .withColumn("_poff", coalesce(sum(col("_ptot")).over(wP), lit(0L)))
      .select(col("n_occurrences").as("_pn"), col("_pfx").as("_ppfx"),
        col("_poff"))
    val tieRank = col("_poff") + col("_lrank") // 0-based within tie group
    localB
      .join(pfxOff,
        col("n_occurrences") <=> col("_pn") && col("_pfx") <=> col("_ppfx"))
      .join(baseByN, col("n_occurrences") <=> col("_jn"))
      .select(
        // rank stays BIGINT: the docstring's hundreds-of-millions-row
        // vocabularies clear 2^31 tokens, where an int cast would wrap
        // negative silently instead of failing
        (col("_rankbase") + tieRank + 1L).as("rank"),
        col("token"), col("n_occurrences"),
        (col("_massbase") + (tieRank + 1L) * col("n_occurrences"))
          .as("cum_occurrences"),
        round(
          (col("_massbase") + (tieRank + 1L) * col("n_occurrences"))
            .cast("double") / col("_total").cast("double"), 6)
          .as("coverage"))
  }

  /** Per-group token-distribution entropy in integer micro-nats — the
    * diversity/templatedness observability signal (a crawl source
    * whose entropy collapses is boilerplate or spam; CCNet and C4 both
    * gate on distributional signals of this family). Each vocabulary
    * term contributes `round(−p·ln(p)·10⁶)` with `p = count/total`
    * computed through one fixed IEEE chain, then the per-group sum is
    * pure BIGINT — order-free, engine-replayable (the [[Dsir]]
    * micro-nat discipline). Returns
    * `(groupCol, n_tokens, vocab, h_micro)`.
    *
    * Scale shape: one (group, token) hash aggregation with map-side
    * combine, one vocabulary-sized fold to group totals, one
    * broadcast-back join — the corpus never shuffles twice.
    */
  def unigramEntropy(df: DataFrame, textCol: String, groupCol: String,
      tokenizer: Column => Column = tokensSimple): DataFrame = {
    val counts = df
      .select(col(groupCol), explode(tokenizer(col(textCol))).as("_t"))
      .groupBy(col(groupCol), col("_t"))
      .agg(count(lit(1)).as("_c"))
    val totals = counts.groupBy(col(groupCol))
      .agg(sum(col("_c")).as("_n"), count(lit(1)).as("vocab"))
    val p = col("_c").cast("double") / col("_n").cast("double")
    counts.join(broadcast(totals), Seq(groupCol))
      .select(col(groupCol), col("_n"), col("vocab"),
        round((-p) * log(p) * lit(1000000.0)).cast("long").as("_hm"))
      .groupBy(col(groupCol))
      .agg(first(col("_n")).as("n_tokens"),
        first(col("vocab")).as("vocab"),
        sum(col("_hm")).as("h_micro"))
  }

  /** Vocabulary-richness estimators off the frequency-of-frequencies
    * table — the "how much vocabulary have we NOT crawled yet" report
    * a corpus pipeline runs before deciding whether more data buys
    * more diversity:
    *
    *  - Chao1 species-richness lower bound (Chao 1984, bias-corrected
    *    flavor so f₂ = 0 stays defined):
    *    `Ŝ = D + f₁(f₁−1)/(2(f₂+1))`
    *  - Good-Turing sample coverage (Good 1953): `Ĉ = 1 − f₁/N` —
    *    the probability the NEXT token is an already-seen type; the
    *    complement `f₁/N` is the unseen-type mass.
    *
    * Scale shape: one token-count aggregation (the [[unigramEntropy]]
    * scan), then the frequency-of-frequencies reduction is over the
    * VOCAB-sized table and the estimators fold to ONE row of exact
    * integers (`f₁(f₁−1)` and the divisions are the only double
    * steps, each micro-snapped once). Output (one row):
    * `(n_tokens, n_types, f1, f2, chao1_micro, coverage_micro)`.
    */
  def vocabRichness(df: DataFrame, textCol: String,
      tokenizer: Column => Column = tokensSimple): DataFrame = {
    val counts = df
      .select(explode(tokenizer(col(textCol))).as("_t"))
      .groupBy(col("_t")).agg(count(lit(1)).as("_c"))
    val m = counts.agg(
      sum(col("_c")).as("n_tokens"),
      count(lit(1)).as("n_types"),
      sum(when(col("_c") === 1L, 1L).otherwise(0L)).as("f1"),
      sum(when(col("_c") === 2L, 1L).otherwise(0L)).as("f2"))
    m.select(col("n_tokens"), col("n_types"), col("f1"), col("f2"),
      round((col("n_types").cast("double") +
        col("f1").cast("double") * (col("f1") - 1L).cast("double") /
          (lit(2.0) * (col("f2") + 1L).cast("double"))) *
        lit(1000000.0)).cast("long").as("chao1_micro"),
      round((lit(1.0) - col("f1").cast("double") /
        col("n_tokens").cast("double")) * lit(1000000.0)).cast("long")
        .as("coverage_micro"))
  }

  /** LEARN a BPE merge table from the corpus (Sennrich et al. 2016 —
    * the training side of the merge tables the loadable tokenizer
    * applies): `rounds` iterations of count-adjacent-symbol-pairs →
    * merge the most frequent pair (ties: lexicographically smallest
    * `(left, right)`) greedily left-to-right in every word. Returns the
    * learned table `(round, lsym, rsym, pair_count)`.
    *
    * Scale shape — the property that makes BPE trainable at 100 TB:
    * the corpus is scanned ONCE, into a distinct-word frequency table;
    * every iteration then runs on that VOCAB-sized table (pair counts =
    * one small hash aggregation weighted by word count; the argmax is
    * one collected row of model metadata; the merge applies as a pure
    * per-row fold). Lineage is cut per round (`localCheckpoint`) so
    * `rounds` iterations never re-derive round 0.
    *
    * The greedy merge is an `aggregate` fold appending symbols and
    * fusing when the running last symbol equals `left` and the incoming
    * equals `right` — leftmost-first over overlaps by construction
    * (after "aa" fuses in "aaa", the fused symbol no longer equals
    * "a", so the trailing "a" survives — the Sennrich semantics).
    */
  def learnBpeMerges(df: DataFrame, textCol: String, rounds: Int,
      tokenizer: Column => Column = tokensSimple): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val spark = df.sparkSession
    import spark.implicits._
    var words = df
      .select(explode(tokenizer(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("wc"))
      .select(col("wc"), transform(
        sequence(lit(1), length(col("word"))),
        i => col("word").substr(i, lit(1))).as("syms"))
      .localCheckpoint()
    val learned =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var round = 1
    var exhausted = false
    while (round <= rounds && !exhausted) {
      val pairArr = when(size(col("syms")) < 2,
          array().cast("array<struct<l:string,r:string>>"))
        .otherwise(transform(sequence(lit(1), size(col("syms")) - 1),
          i => struct(element_at(col("syms"), i).as("l"),
            element_at(col("syms"), i + 1).as("r"))))
      val best = words
        .select(col("wc"), explode(pairArr).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("wc")).as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, cnt) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        learned += ((round, l, r, cnt))
        words = words.withColumn("syms",
          aggregate(col("syms"), array().cast("array<string>"),
            (acc, c) => when(
              get(acc, size(acc) - 1) === lit(l) && c === lit(r),
              concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
              .otherwise(concat(acc, array(c)))))
          .localCheckpoint()
        round += 1
      }
    }
    learned.toSeq.toDF("round", "lsym", "rsym", "pair_count")
  }

  // ── unigram-LM (SentencePiece) tokenizer ──────────────────────────
  // The OTHER tokenizer family every LLM pipeline compares against
  // (Kudo 2018, "Subword Regularization"; the SentencePiece unigram
  // model): pieces carry unigram costs, a word segments into the
  // minimum-cost piece sequence (Viterbi), and training alternates
  // segment-under-current-model with re-estimate-from-counts — the
  // hard-count (Viterbi-EM) flavor, which keeps every statistic an
  // exact integer so learn AND apply replay bit-identically in a SQL
  // oracle. Costs are integer micro-nats (round(−ln(p)·10⁶), the
  // [[graft.text.Dsir]] discipline), so Viterbi argmins and the
  // backtrace's exact-identity checks never touch float comparison.

  private val UnigramInf = 1000000000000000L // 10^15 µnats ≫ any path

  /** Forward Viterbi costs of `word` under `model` (piece →
    * cost_micro): array of length |word|+1, entry j = cheapest cost
    * of segmenting the first j characters. Unknown single chars cost
    * `unkMicro`; unknown longer substrings are impossible.
    */
  private def unigramForward(word: Column, model: Column,
      maxPieceLen: Int, unkMicro: Long): Column =
    aggregate(
      sequence(lit(1), length(word)),
      array(lit(0L)),
      (acc, j) => concat(acc, array(
        (1 to maxPieceLen).map { k =>
          val pc = coalesce(
            element_at(model, word.substr(j - (k - 1), lit(k))),
            lit(if (k == 1) unkMicro else UnigramInf))
          when(j >= k,
            element_at(acc, greatest(j - k + 1, lit(1))) + pc)
            .otherwise(lit(UnigramInf))
        }.reduce(least(_, _)))))

  /** Backtrace the minimum-cost segmentation from the forward costs:
    * walk from the end, at each position taking the LONGEST piece
    * whose exact integer identity `cost[pos−k] + cost(piece) =
    * cost[pos]` holds (ties between equal-cost splits therefore
    * break toward longer pieces — deterministic, SQL-replayable).
    */
  private def unigramBacktrace(word: Column, costs: Column,
      model: Column, maxPieceLen: Int, unkMicro: Long): Column = {
    val n = length(word)
    val walked = aggregate(
      sequence(lit(1), greatest(n, lit(1))),
      struct(n.cast("int").as("pos"),
        array().cast("array<string>").as("ps")),
      (acc, _) => {
        val pos = acc.getField("pos")
        def pieceCost(k: Int): Column = coalesce(
          element_at(model,
            word.substr(pos - (k - 1), lit(k))),
          lit(if (k == 1) unkMicro else UnigramInf))
        def hits(k: Int): Column = pos >= k &&
          (element_at(costs, greatest(pos - k + 1, lit(1))) +
            pieceCost(k)) === element_at(costs, pos + 1)
        val kStar = (maxPieceLen to 2 by -1)
          .foldLeft(null.asInstanceOf[Column]) { (acc2, k) =>
            if (acc2 == null) when(hits(k), lit(k))
            else acc2.when(hits(k), lit(k))
          } match {
            case null => lit(1)
            case w => w.otherwise(lit(1))
          }
        when(pos <= 0, acc).otherwise(struct(
          (pos - kStar).cast("int").as("pos"),
          concat(acc.getField("ps"),
            array(word.substr(pos - kStar + 1, kStar))).as("ps")))
      })
    reverse(walked.getField("ps"))
  }

  /** APPLY a unigram-LM model: append `outCol` — the minimum-cost
    * piece sequence of every word, in document order — to `df`.
    * `model` maps piece → cost in micro-nats (what [[learnUnigramLm]]
    * emits); unseen single characters segment as themselves at
    * `unkMicro`. Pure staged column transforms (forward costs
    * materialize once per word, then the backtrace reads them), so
    * the whole tokenizer runs in the scan stage — no shuffle, no UDF.
    *
    * SIZE BOUND: the model bakes into the plan as a `typedLit` map —
    * right for gate-scale vocabs (≤ a few thousand pieces). A
    * production 32k-piece vocab belongs in [[tokensUnigramJoin]],
    * the join-the-vocab twin that segments bit-identically at any
    * model size.
    */
  def tokensUnigram(df: DataFrame, textCol: String, outCol: String,
      model: Map[String, Long], maxPieceLen: Int = 3,
      unkMicro: Long = 25000000L,
      tokenizer: Column => Column = tokensSimple): DataFrame = {
    require(model.nonEmpty, "empty unigram model")
    require(maxPieceLen >= 1, s"bad maxPieceLen $maxPieceLen")
    val m = typedLit(model)
    df
      .withColumn("_uw",
        filter(tokenizer(col(textCol)), w => length(w) > 0))
      .withColumn("_uc", transform(col("_uw"), w =>
        struct(w.as("w"),
          unigramForward(w, m, maxPieceLen, unkMicro).as("c"))))
      .withColumn(outCol, flatten(transform(col("_uc"), s =>
        unigramBacktrace(s.getField("w"), s.getField("c"), m,
          maxPieceLen, unkMicro))))
      .drop("_uw", "_uc")
  }

  /** Scale-safe APPLY twin of [[tokensUnigram]] for ARBITRARY-SIZE
    * vocabularies. The literal flavor bakes the model into the plan
    * as a `typedLit` map — right for gate-scale vocabs (hundreds of
    * pieces; zero joins, pure scan-stage), but a production 32k-piece
    * SentencePiece vocab becomes a multi-megabyte plan constant
    * replicated into codegen. Here the model arrives as a DataFrame
    * (`pieceCol`, `costCol` in micro-nats — [[learnUnigramLm]]'s
    * output shape) and never touches the plan:
    *
    *   1. the corpus's DISTINCT words explode their candidate
    *      substrings (≤ |word|·maxPieceLen each);
    *   2. the vocab equi-joins ON THE PIECE — broadcast when small,
    *      shuffled when not: the planner's call at any vocab size;
    *   3. the surviving (word, piece, cost) rows fold into a per-word
    *      MINI-model map (bounded by the word's own substring count)
    *      that drives the IDENTICAL Viterbi forward/backtrace columns
    *      as the literal flavor — so the two flavors segment
    *      bit-identically by construction (spec-pinned on a 50k
    *      vocab);
    *   4. segmentations join back to documents by (id, word
    *      position) and re-flatten in document order.
    *
    * Needs `idCol` (unique per row) to reassemble documents — the
    * one thing the scan-stage literal flavor does not; every corpus
    * in this suite carries ids. Two corpus scans (distinct-word pass
    * + final join-back) instead of one — the price of unbounded
    * vocab.
    */
  def tokensUnigramJoin(df: DataFrame, idCol: String, textCol: String,
      outCol: String, model: DataFrame, pieceCol: String = "piece",
      costCol: String = "cost_micro", maxPieceLen: Int = 3,
      unkMicro: Long = 25000000L,
      tokenizer: Column => Column = tokensSimple): DataFrame = {
    require(maxPieceLen >= 1, s"bad maxPieceLen $maxPieceLen")
    val withWords = df.withColumn("_uw",
      filter(tokenizer(col(textCol)), w => length(w) > 0))
    val words = withWords
      .select(explode(col("_uw")).as("_word")).distinct()
    // candidate substrings, deduped per word (the mini-model is a
    // map: one cost per distinct piece)
    val cands = words.select(col("_word"),
      explode(array_distinct(flatten(transform(
        sequence(lit(1), length(col("_word"))),
        i => transform(
          sequence(lit(1),
            least(lit(maxPieceLen), length(col("_word")) - i + 1)),
          l => col("_word").substr(i, l)))))).as("_piece"))
    val wordModels = cands
      .join(model.select(col(pieceCol).as("_piece"),
        col(costCol).cast("long").as("_cost")), Seq("_piece"))
      .groupBy(col("_word"))
      .agg(map_from_entries(collect_list(
        struct(col("_piece"), col("_cost")))).as("_m"))
    // per-word segmentation under the mini-model — the same fold as
    // the literal flavor, with a map COLUMN instead of a literal
    // (a word with no known piece gets a NULL map: element_at(null)
    // is null, so every lookup falls to unk/impossible exactly as a
    // missing key would)
    val segmented = words
      .join(wordModels, Seq("_word"), "left")
      .withColumn("_c", unigramForward(col("_word"), col("_m"),
        maxPieceLen, unkMicro))
      .withColumn("_ps", unigramBacktrace(col("_word"), col("_c"),
        col("_m"), maxPieceLen, unkMicro))
      .select(col("_word"), col("_ps"))
    // join back by word, regroup by id in word order, re-flatten
    val perDoc = withWords
      .select(col(idCol), posexplode(col("_uw")).as(Seq("_p", "_word")))
      .join(segmented, Seq("_word"))
      .groupBy(col(idCol))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("_p"), col("_ps")))),
        s => s.getField("_ps"))).as("_pieces"))
    df.join(perDoc, Seq(idCol), "left")
      .withColumn(outCol,
        coalesce(col("_pieces"), array().cast("array<string>")))
      .drop("_pieces")
  }

  /** LEARN a unigram-LM vocabulary (Kudo 2018, hard-EM flavor):
    * seed = every substring of length ≤ `maxPieceLen` of the
    * distinct-word table (all single characters, plus the
    * `vocabSize` most frequent longer candidates — count desc, piece
    * asc); then `iters` rounds of Viterbi-segment-under-current-
    * costs → re-count pieces from the best segmentations. Returns
    * the final `(piece, cnt, cost_micro)` model — `cnt` the
    * Viterbi-EM count, `cost_micro = round(−ln(cnt/total)·10⁶)`.
    * Pieces unused by any best segmentation drop (apply covers
    * unseen characters via `unkMicro`).
    *
    * Scale shape (the [[learnBpeMerges]] discipline): ONE corpus
    * scan into the distinct-word frequency table; seeding and every
    * EM round run on that vocab-sized table, and the model itself
    * (vocab-sized by construction) is collected per round to drive
    * the next segmentation. Words longer than `maxWordLen` are
    * excluded from TRAINING by contract (they are tail noise for a
    * subword model and would unboundedly widen the oracle's unrolled
    * replay); apply handles any length.
    */
  def learnUnigramLm(df: DataFrame, textCol: String,
      vocabSize: Int = 60, maxPieceLen: Int = 3, iters: Int = 1,
      maxWordLen: Int = 20, unkMicro: Long = 25000000L,
      tokenizer: Column => Column = tokensSimple): DataFrame = {
    require(vocabSize >= 1 && maxPieceLen >= 1 && iters >= 0 &&
      maxWordLen >= maxPieceLen,
      s"bad params vocab=$vocabSize L=$maxPieceLen iters=$iters " +
        s"maxWordLen=$maxWordLen")
    val spark = df.sparkSession
    val words = df
      .select(explode(tokenizer(col(textCol))).as("word"))
      .filter(length(col("word")).between(1, maxWordLen))
      .groupBy(col("word")).agg(count(lit(1)).as("wc"))
      .localCheckpoint()
    // seed candidates: all substrings up to maxPieceLen, weighted by
    // word frequency
    val allSubs = flatten(transform(
      sequence(lit(1), length(col("word"))),
      i => transform(
        sequence(lit(1),
          least(lit(maxPieceLen), length(col("word")) - i + 1)),
        l => col("word").substr(i, l))))
    val subCounts = words
      .select(col("wc"), explode(allSubs).as("piece"))
      .groupBy(col("piece")).agg(sum(col("wc")).as("cnt"))
      .localCheckpoint()
    val seed = subCounts.filter(length(col("piece")) === 1)
      .unionByName(subCounts.filter(length(col("piece")) > 1)
        .orderBy(col("cnt").desc, col("piece").asc)
        .limit(vocabSize))
    var modelDf = seed.localCheckpoint()
    for (_ <- 1 to iters) {
      val model = collectCosts(modelDf)
      val m = typedLit(model)
      modelDf = words
        .withColumn("_c",
          unigramForward(col("word"), m, maxPieceLen, unkMicro))
        .select(col("wc"), explode(unigramBacktrace(col("word"),
          col("_c"), m, maxPieceLen, unkMicro)).as("piece"))
        .groupBy(col("piece")).agg(sum(col("wc")).as("cnt"))
        .localCheckpoint()
    }
    val total = modelDf.agg(sum(col("cnt")).as("_t"))
    modelDf.crossJoin(broadcast(total))
      .select(col("piece"), col("cnt"),
        costMicro(col("cnt"), col("_t")).as("cost_micro"))
  }

  /** The one shared cost chain (Spark = collect-side = oracle):
    * `round(−ln(cnt/total)·10⁶)`.
    */
  private def costMicro(cnt: Column, total: Column): Column =
    round(-log(cnt.cast("double") / total.cast("double")) *
      lit(1000000.0)).cast("long")

  /** Collect a (piece, cnt) frame into the piece → cost_micro map
    * that drives the next EM round — costs computed IN Spark with
    * [[costMicro]] so every engine sees one IEEE chain.
    */
  private def collectCosts(counts: DataFrame): Map[String, Long] = {
    val total = counts.agg(sum(col("cnt")).as("_t"))
    counts.crossJoin(broadcast(total))
      .select(col("piece"), costMicro(col("cnt"), col("_t")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  /** Driver fast path for [[learnBpeMerges]] — the flavor a production
    * 32k-merge vocabulary needs: the distributed trainer is correct
    * but pays one Spark job (pair count + argmax collect) PER ROUND,
    * i.e. 32k jobs for a real tokenizer. The distinct-word count table
    * it iterates on is already model-metadata-sized (a few million
    * rows for any real corpus), so collect it ONCE — guarded by
    * `maxWords` with a loud error, never silently truncated — and
    * learn every round in memory. One corpus scan total; merge
    * selection (max count, ties smallest `(left, right)` in UTF-8 byte
    * order — Spark's string comparison) and the greedy leftmost-first
    * application replicate the distributed fold exactly, pinned by a
    * parity property test. Returns the same
    * `(round, lsym, rsym, pair_count)` frame.
    */
  def learnBpeMergesLocal(df: DataFrame, textCol: String, rounds: Int,
      tokenizer: Column => Column = tokensSimple,
      maxWords: Int = 10000000): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(maxWords >= 1, s"maxWords must be >= 1, got $maxWords")
    val spark = df.sparkSession
    import spark.implicits._
    val collected = df
      .select(explode(tokenizer(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("wc"))
      .limit(maxWords + 1)
      .collect()
    require(collected.length <= maxWords,
      s"learnBpeMergesLocal: distinct-word table exceeds maxWords=" +
        s"$maxWords — this corpus's vocabulary does not fit the driver " +
        "fast path; use learnBpeMerges (distributed) or raise maxWords")
    // UTF-8 byte order — the tie-break Spark's UTF8String comparison
    // applies in the distributed argmax (Java String compareTo differs
    // for supplementary characters)
    def utf8Lt(a: String, b: String): Boolean = {
      val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
      var i = 0
      while (i < x.length && i < y.length) {
        val c = (x(i) & 0xff) - (y(i) & 0xff)
        if (c != 0) return c < 0
        i += 1
      }
      x.length < y.length
    }
    // split by CODE POINT, not UTF-16 unit — Spark's substr(i, 1) in
    // the distributed flavor yields whole code points
    def codePoints(s: String): Array[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        out += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      out.toArray
    }
    var words: Array[(Array[String], Long)] = collected.map { r =>
      (codePoints(r.getString(0)), r.getLong(1))
    }
    val learned =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var round = 1
    var exhausted = false
    while (round <= rounds && !exhausted) {
      val pairCounts =
        scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, wc) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pairCounts.update(k, pairCounts.getOrElse(k, 0L) + wc)
          i += 1
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        val ((l, r), cnt) = pairCounts.reduceLeft { (a, b) =>
          val ((al, ar), ac) = a; val ((bl, br), bc) = b
          if (bc > ac) b
          else if (bc < ac) a
          else if (utf8Lt(bl, al)) b
          else if (utf8Lt(al, bl)) a
          else if (utf8Lt(br, ar)) b
          else a
        }
        learned += ((round, l, r, cnt))
        // greedy leftmost-first: after a fuse the running last symbol
        // is the MERGED symbol, so an overlapping match cannot re-fire
        // (the Sennrich semantics — identical to the distributed fold)
        words = words.map { case (syms, wc) =>
          val acc = scala.collection.mutable.ArrayBuffer.empty[String]
          syms.foreach { c =>
            if (acc.nonEmpty && acc.last == l && c == r)
              acc(acc.length - 1) = l + r
            else acc += c
          }
          (acc.toArray, wc)
        }
        round += 1
      }
    }
    learned.toSeq.toDF("round", "lsym", "rsym", "pair_count")
  }

  /** Per-class corpus composition report — the sanity check before
    * fixing a mixture: doc count, token and char totals, distinct
    * sources per class. One hash aggregation with map-side partials;
    * INTEGER-exact aggregates only (a float mean would depend on
    * accumulation order and could not be engine-replayed).
    */
  def corpusStats(
      df: DataFrame, classCol: String, textCol: String, sourceCol: String,
      tokenizer: Column => Column = tokens): DataFrame =
    df.groupBy(col(classCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(tokenizer(col(textCol))).cast("long")).as("n_tokens"),
        sum(length(col(textCol)).cast("long")).as("n_chars"),
        countDistinct(col(sourceCol)).as("n_sources"))

  def loadBpeMerges(
      df: DataFrame, rankCol: String = "rank", leftCol: String = "left",
      rightCol: String = "right"): Seq[(String, String)] =
    df.select(col(rankCol).cast("long"), col(leftCol), col(rightCol))
      .collect().sortBy(_.getLong(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq

  /** Parse the public `merges.txt` shape — one "left right" pair per
    * line, rank = line order; '#'-prefixed header/comment lines skipped.
    */
  def parseBpeMerges(lines: Seq[String]): Seq[(String, String)] =
    lines.iterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val sp = l.indexOf(' ')
        require(sp > 0 && l.indexOf(' ', sp + 1) < 0,
          s"merge line must be exactly 'left right': '$l'")
        (l.substring(0, sp), l.substring(sp + 1))
      }
      .toSeq

  /** Real merge-table BPE tokenization over a loaded vocabulary
    * ([[graft.functions.BpeTokensXX]] — per whitespace word: code-point
    * split, then greedy ranked merges, GPT-2 style). Scan-stage,
    * codegen'd, no shuffle; the merge table travels with the plan.
    */
  def tokensVocab(text: Column, merges: Seq[(String, String)]): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.BpeTokensXX(
        org.apache.spark.sql.graft.ColumnBridge.expression(text), merges))

  /** Token count under a loaded BPE merge table. */
  def tokenEstimateVocab(
      text: Column, merges: Seq[(String, String)]): Column =
    size(tokensVocab(text, merges))

  /** Per-class tokenizer fertility report — the "how expensive is this
    * language under this tokenizer" table that drives mixture and
    * budget decisions (a language whose BPE fertility is 3 pieces per
    * word costs 3× the context window of one at 1.1): doc count,
    * whitespace-token and BPE-piece totals, character total,
    * characters per token, and fertility = pieces / tokens.
    *
    * Scale shape: one scan-stage projection (both tokenizers are pure
    * expressions) into one hash aggregation keyed by class — map-side
    * partials absorb everything; G output rows. Ratios divide through
    * one fixed IEEE chain over BIGINT sums, so the report is
    * oracle-exact.
    */
  def tokenizerFertility(df: DataFrame, textCol: String, classCol: String,
      charsCol: String, merges: Seq[(String, String)]): DataFrame =
    df.select(col(classCol), col(charsCol).cast("long").as("_nc"),
      size(tokensSimple(col(textCol))).cast("long").as("_nt"),
      tokenEstimateVocab(col(textCol), merges).cast("long").as("_np"))
      .groupBy(col(classCol))
      .agg(count(lit(1)).as("n_docs"), sum(col("_nt")).as("n_tokens"),
        sum(col("_np")).as("n_pieces"), sum(col("_nc")).as("sum_chars"))
      .select(col(classCol), col("n_docs"), col("n_tokens"),
        col("n_pieces"), col("sum_chars"),
        round(col("sum_chars").cast("double") /
          col("n_tokens").cast("double"), 6).as("chars_per_token"),
        round(col("n_pieces").cast("double") /
          col("n_tokens").cast("double"), 6).as("fertility"))

  /** First 8 hex digits of md5 as a long in [0, 2^32) — a portable 32-bit
    * content hash every engine computes identically (`md5` is universal;
    * xxhash64 is Spark-only). Use xxhash64 where cross-engine equality is
    * not needed — it is ~5× cheaper.
    */
  def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Hashing-trick featurizer (Weinberger et al., "Feature Hashing
    * for Large Scale Multitask Learning", ICML 2009): each token maps
    * to dimension `hash32(t) mod dim` with sign `±1` from a second
    * hash bit, and the document's feature vector is the signed count
    * fold — the fixed-width, vocabulary-free text representation a
    * linear classifier or MinHash-free similarity pass consumes at
    * 100 TB (no vocabulary table to build, broadcast, or keep in sync
    * across snapshots; collisions are the accepted noise the signed
    * variant partially cancels). Pure scan-stage expression: one
    * md5-derived hash per token, an O(dim) in-row fold, integer
    * counts — no shuffle, exact and oracle-replayable.
    *
    * Output: `array<long>` of length `dim` (signed token counts).
    */
  def hashFeatures(toks: Column, dim: Int,
      signed: Boolean = true): Column = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    val zeros = array_repeat(lit(0L), dim)
    aggregate(toks, zeros, (acc, t) => {
      val h = hash32(concat(lit("hf:"), t))
      val idx = pmod(h, lit(dim.toLong))
      val sgn = if (signed)
        when(pmod(shiftrightunsigned(h, 16), lit(2L)) === 0L, lit(1L))
          .otherwise(lit(-1L))
      else lit(1L)
      transform(acc, (v, i) =>
        when(i.cast("long") === idx, v + sgn).otherwise(v))
    })
  }

  /** Word k-shingles: overlapping k-grams joined by a single space.
    * Shorter-than-k docs yield an empty array.
    */
  def shingles(toks: Column, k: Int): Column =
    when(size(toks) < k, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(toks) - (k - 1)),
        i => array_join(slice(toks, i, lit(k)), " ")))

  /** Deterministic universal-hash parameters for MinHash permutation j
    * (odd multiplier, fixed LCG-style mixing — reproducible anywhere).
    */
  def minhashParams(j: Int): (Long, Long) = {
    val a = (2L * j + 1L) * 2654435761L % P // odd, Knuth multiplicative
    val b = (j * 40503L + 2531011L) % P
    (if (a == 0) 1L else a, b)
  }

  /** MinHash signature: array of `numHashes` minima of
    * `(a_j * (hash32(s) % P) + b_j) % P` over the shingle set. Empty
    * shingle sets map to the all-P signature (never collides with real
    * content). This is the oracle-replayable flavor (md5 arithmetic a
    * SQL engine can reproduce); it runs on the native
    * [[graft.functions.MinHashSigMd5XX]] kernel — bit-identical to the
    * fold formulation below, one compiled pass per array.
    */
  def minhashSig(shingleCol: Column, numHashes: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.MinHashSigMd5XX(
        org.apache.spark.sql.graft.ColumnBridge.expression(shingleCol),
        numHashes))

  /** Pure-expression formulation of [[minhashSig]] (ONE `aggregate` fold
    * over the shingle hashes with an array accumulator — each shingle
    * hashed once, all lanes updated per pass). Kept as the executable
    * specification the kernel is tested against.
    */
  def minhashSigExpr(shingleCol: Column, numHashes: Int): Column = {
    val params = (0 until numHashes).map(minhashParams)
    val aArr = array(params.map(p => lit(p._1)): _*)
    val bArr = array(params.map(p => lit(p._2)): _*)
    val hs = transform(shingleCol, s => hash32(s) % P)
    aggregate(hs, array_repeat(lit(P), numHashes),
      (acc, h) => zip_with(
        acc,
        zip_with(aArr, bArr, (a, b) => (a * h + b) % P),
        (cur, cand) => least(cur, cand)))
  }

  /** Production-path MinHash: the native Catalyst kernel
    * ([[graft.functions.MinHashSigXX]] — xxhash64, single fused pass,
    * stays in whole-stage codegen). Use when cross-engine (DuckDB)
    * replayability is not needed; signatures differ from [[minhashSig]]
    * (different hash family) but have the same LSH properties.
    */
  def minhashSigFast(
      shingleCol: Column, numHashes: Int, seed: Long = 42L): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.MinHashSigXX(
        org.apache.spark.sql.graft.ColumnBridge.expression(shingleCol),
        numHashes, seed))

  /** SimHash fingerprint over the token multiset: bit b of the result is
    * set iff the sum over tokens of ±1 (sign of bit b of the token hash)
    * is positive. Native compiled kernel ([[graft.functions.SimHashFpXX]]);
    * bit-identical to the HOF formulation [[simhashExpr]] (pinned by
    * test) and to the q21 oracle.
    */
  def simhash(toks: Column, bits: Int = 16): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.SimHashFpXX(
        org.apache.spark.sql.graft.ColumnBridge.expression(toks), bits))

  /** Pure-expression formulation of [[simhash]] — the semantics
    * reference the kernel is pinned against. Single fold with an
    * array-of-votes accumulator; the interpreted `aggregate`/`zip_with`
    * lambdas cost ~3·bits frames + one array allocation per token,
    * which is what the kernel removes.
    */
  def simhashExpr(toks: Column, bits: Int = 16): Column = {
    val masks = array((0 until bits).map(b => lit(1L << b)): _*)
    val hs = transform(toks, t => hash32(t))
    val votes = aggregate(hs, array_repeat(lit(0), bits),
      (acc, h) => zip_with(acc, masks,
        (v, m) => v + when(h.bitwiseAND(m) > 0, 1).otherwise(-1)))
    aggregate(
      zip_with(votes, masks, (v, m) => when(v > 0, m).otherwise(lit(0L))),
      lit(0L), (acc, t) => acc + t)
  }

  /** Rolling polynomial fingerprint of the token sequence:
    * fold (acc*31 + hash32(t) % FP) % FP. Order-sensitive — reordered
    * documents fingerprint differently (unlike MinHash/SimHash).
    */
  def fingerprint(toks: Column): Column =
    aggregate(
      transform(toks, t => hash32(t) % FP),
      lit(0L), (acc, h) => (acc * 31L + h) % FP)

  /** Token-window chunking for LLM context windows: overlapping chunks of
    * `size` tokens advancing by `size - overlap`. A doc of ≤ `size`
    * tokens yields one chunk; the final chunk may be short. Returns an
    * array of (chunk_id, chunk_text) structs — `posexplode`-ready. Pure
    * per-row expression algebra: chunking is embarrassingly parallel and
    * runs in the scan stage at any corpus size.
    */
  def chunkTokens(toks: Column, size: Int, overlap: Int): Column = {
    require(size > 0 && overlap >= 0 && overlap < size,
      "need size > 0 and 0 <= overlap < size")
    val stride = size - overlap
    val n = org.apache.spark.sql.functions.size(toks)
    // extra chunks beyond the first: ceil((n - size) / stride) when
    // n > size, else 0 (integer arithmetic — replayed exactly in SQL)
    val extra = when(n <= size, 0)
      .otherwise(floor((n - size + (stride - 1)) / lit(stride)))
    transform(sequence(lit(0), extra.cast("int")),
      i => struct(
        i.cast("int").as("chunk_id"),
        array_join(slice(toks, i * stride + 1, lit(size)), " ")
          .as("chunk_text")))
  }

  /** Fill-in-the-middle training transform (the FIM objective of
    * Bavarian et al. 2022, "Efficient Training of Language Models to
    * Fill in the Middle"): split each document's token sequence at two
    * DETERMINISTIC pseudo-random cut points into (prefix, middle,
    * suffix) so the same corpus always yields the same examples
    * (resumable builds, reproducible ablations). Cuts derive from the
    * portable md5 [[hash32]] of `(id, seed, salt)` mod (n+1) — any
    * engine replays them — giving 0 ≤ lo ≤ hi ≤ n with every split
    * point equally likely, including empty prefix/middle/suffix (the
    * paper keeps degenerate splits; downstream formatting decides
    * PSM/SPM token order). Returns
    * `(idCol, n_tokens, n_prefix, n_middle, prefix, middle, suffix)`.
    *
    * Scale shape: pure per-row expression algebra in the scan stage —
    * no shuffle, no state; compose with
    * [[graft.operators.Relational.hashSplit]] to FIM only a fraction
    * of the corpus (the paper's 50/90% FIM-rate recipe).
    */
  def fimSplit(df: DataFrame, textCol: String, idCol: String,
      seed: Long,
      tokenizer: Column => Column = tokensSimple): DataFrame = {
    def cut(salt: String): Column =
      pmod(hash32(concat_ws(":", col(idCol), lit(seed), lit(salt))),
        (col("_n") + 1).cast("long"))
    df.select(col(idCol), tokenizer(col(textCol)).as("_w"))
      .withColumn("_n", size(col("_w")))
      .withColumn("_lo", least(cut("a"), cut("b")))
      .withColumn("_hi", greatest(cut("a"), cut("b")))
      .select(col(idCol), col("_n").as("n_tokens"),
        col("_lo").cast("int").as("n_prefix"),
        (col("_hi") - col("_lo")).cast("int").as("n_middle"),
        array_join(slice(col("_w"), lit(1), col("_lo").cast("int")), " ")
          .as("prefix"),
        array_join(slice(col("_w"), (col("_lo") + 1).cast("int"),
          (col("_hi") - col("_lo")).cast("int")), " ").as("middle"),
        array_join(slice(col("_w"), (col("_hi") + 1).cast("int"),
          (col("_n") - col("_hi")).cast("int")), " ").as("suffix"))
  }

  /** Repetition metrics per document (the Gopher/C4-style quality
    * filter): of a doc's word n-grams, what fraction are duplicates of
    * an earlier occurrence, and how often does the most frequent n-gram
    * appear. Pure per-row array algebra — the n-gram counting happens
    * inside the row (docs are bounded), so the op stays in the scan
    * stage with no shuffle, unlike a naive explode→groupBy formulation
    * that would shuffle every n-gram of the corpus.
    *
    * Returns a struct column {n_grams, n_distinct, dup_ratio, max_count}.
    */
  def repetition(shingleCol: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.RepStatsXX(
        org.apache.spark.sql.graft.ColumnBridge.expression(shingleCol)))

  /** KMV distinct-count sketch AGGREGATE over a gram-array column: the
    * per-group distinct-cardinality estimate without a distinct
    * shuffle ([[graft.functions.KmvSketchXX]] — bounded k-longs state,
    * map-side partials, set-union merge). Returns the sorted k-min
    * hash array; feed it to [[kmvEstimate]] for the number.
    */
  def kmvSketch(gramCol: Column, k: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.KmvSketchXX(
        org.apache.spark.sql.graft.ColumnBridge.expression(gramCol), k)
        .toAggregateExpression())

  /** The KMV estimate off a [[kmvSketch]] array: exact size when the
    * group had fewer than k distinct grams (the sketch IS the distinct
    * set), else the classic (k-1)/(kth/2^32) — spelled as ONE
    * double-division IEEE chain so an external engine replays it
    * bit-for-bit, rounded to 6 places like every gate float.
    */
  def kmvEstimate(sketch: Column, k: Int): Column =
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(round(
        lit((k - 1).toDouble * graft.functions.KmvXX.Domain) /
          element_at(sketch, -1), 6))

  /** HyperLogLog register sketch AGGREGATE over a gram-array column:
    * fixed 2^p-byte state per group regardless of cardinality,
    * registers merge by elementwise max
    * ([[graft.functions.HllSketchXX]]). Returns the array<int> of
    * register values; the estimate derives declaratively (see q166)
    * so the whole mechanism — not just the number — hash-gates.
    */
  def hllSketch(gramCol: Column, p: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.HllSketchXX(
        org.apache.spark.sql.graft.ColumnBridge.expression(gramCol), p)
        .toAggregateExpression())

  /** Count-Min Sketch AGGREGATE over an item-array column: per-item
    * frequency estimation with a fixed `depth × width` counter grid —
    * no groupBy-count of every distinct item, counters merge by
    * elementwise ADDITION ([[graft.functions.CmsSketchXX]]). Probe
    * with [[cmsEstimate]]; estimates overcount, never undercount.
    */
  def cmsSketch(itemCol: Column, depth: Int, width: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.CmsSketchXX(
        org.apache.spark.sql.graft.ColumnBridge.expression(itemCol),
        depth, width).toAggregateExpression())

  /** Bucket of `term` in CMS hash-row `r` — md5-hash32 % P through the
    * [[minhashParams]] universal-hash family, % width. Declarative so
    * an external engine replays probes identically.
    */
  private[graft] def cmsBucket(term: Column, r: Int, width: Int): Column = {
    val (a, b) = minhashParams(r)
    ((lit(a) * (hash32(term) % P) + lit(b)) % P) % width
  }

  /** Point-frequency estimate off a [[cmsSketch]] array: MIN of the
    * term's bucket counters across the depth hash rows.
    */
  def cmsEstimate(
      sketch: Column, term: Column, depth: Int, width: Int): Column =
    (0 until depth)
      .map(r => element_at(sketch,
        (cmsBucket(term, r, width) + lit(r * width) + 1).cast("int")))
      .reduce(least(_, _))

  /** Merge two [[kmvSketch]] arrays into the sketch of the UNION of
    * their underlying data — the mergeability that makes sketches
    * persistable artifacts: store per-partition/per-day sketches,
    * merge on read, never rescan. Exact identity (not approximate):
    * `kmvMerge(sketch(X), sketch(Y), k) == sketch(X ∪ Y)` value for
    * value, because both sides keep the k smallest distinct hashes.
    */
  def kmvMerge(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_union(a, b)), 1, k)

  /** Set-operation algebra on two [[kmvSketch]] arrays — the overlap
    * estimate that needs NO join of actual values: merge the two k-min
    * sets ([[kmvMerge]] — a valid KMV sketch of the UNION), and
    * count merged values present in both inputs (Beyer et al. 2007's
    * KMV Jaccard). Per-pair work is O(k log k) on two tiny arrays, so
    * pairwise source overlap across a 100 TB corpus costs one sketch
    * pass plus driver-scale arithmetic — vs the gram equi-join q81
    * pays for the exact answer.
    *
    * Returns struct {m_size, n_both, est_jaccard, est_union}.
    */
  def kmvOverlap(a: Column, b: Column, k: Int): Column = {
    val m = kmvMerge(a, b, k)
    val nBoth = size(array_intersect(array_intersect(m, a), b))
    struct(
      size(m).cast("long").as("m_size"),
      nBoth.cast("long").as("n_both"),
      round(nBoth.cast("double") / size(m), 6).as("est_jaccard"),
      kmvEstimate(m, k).as("est_union"))
  }

  /** HOF formulation of [[repetition]] — the reference semantics the
    * fused kernel is pinned against. The max-count step is
    * O(distinct × n) per document (a nested filter per distinct
    * shingle), which is why the kernel exists: long repetitive docs —
    * the ones this signal flags — are exactly where that blows up.
    */
  private[graft] def repetitionHof(shingleCol: Column): Column = {
    val n = size(shingleCol)
    val distinctN = size(array_distinct(shingleCol))
    val maxCount = when(n === 0, 0).otherwise(
      array_max(transform(array_distinct(shingleCol),
        g => size(filter(shingleCol, x => x === g)))))
    struct(
      n.as("n_grams"),
      distinctN.as("n_distinct"),
      round((n - distinctN).cast("double") / greatest(n, lit(1)), 6)
        .as("dup_ratio"),
      maxCount.as("max_count"))
  }

  /** Marker-word profiles for the n-gram-heuristic language ID. Flat,
    * deterministic, tiny — the point is the *operator shape* (per-doc
    * marker counting + argmax), which at scale would load real n-gram
    * profiles the same way.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "los", "y", "es"),
    "fr" -> Seq("le", "les", "et", "est", "un"),
    "zh" -> Seq("de", "shi", "bu", "wo", "zhe"))

  def markerScore(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(markers)))

  /** Predicted language: the first profile (in [[langMarkers]] order) with
    * the maximal marker count; "und" (undetermined) when all are zero.
    */

  /** Unicode-script character classes for [[scriptProfile]] — the
    * coarse routing signal a multilingual crawl needs BEFORE n-gram
    * language ID ([[langId]]) can work: marker-token langid assumes a
    * Latin-script tokenization and is blind to CJK (no spaces),
    * Cyrillic, Greek and Arabic pages. Script mix also flags mojibake
    * and template debris (a "German" page that is 30% CJK is broken).
    * Each entry is (name, Java regex class); [[OracleSql]] q135
    * mirrors them as RE2 `\x{...}` classes for DuckDB.
    */
  val scriptClasses: Seq[(String, String)] = Seq(
    "latin" -> "[A-Za-z\u00C0-\u024F]",
    "cyrillic" -> "[\u0400-\u04FF]",
    "greek" -> "[\u0370-\u03FF]",
    "cjk" -> "[\u4E00-\u9FFF\u3040-\u30FF\uAC00-\uD7AF]",
    "arabic" -> "[\u0600-\u06FF]",
    "digit" -> "[0-9]")

  /** Per-script codepoint counts, one `n_<script>` column per
    * [[scriptClasses]] entry: `length(s) - length(strip(class, s))`
    * counts members without materializing matches. Pure scan-stage
    * regexp arithmetic — codegen'd, no shuffle, pushes through any
    * downstream filter.
    */
  def scriptProfile(text: Column): Seq[Column] =
    scriptClasses.map { case (name, pat) =>
      (length(text) -
        length(regexp_replace(text, pat, ""))).as(s"n_$name")
    }

  /** Dominant script with a fixed priority-order tie-break (the
    * [[scriptClasses]] order), `'none'` when no class matches — so the
    * verdict replays deterministically in SQL (q135).
    */
  def dominantScript(text: Column): Column = {
    val counts = scriptClasses.map { case (name, pat) =>
      name -> (length(text) - length(regexp_replace(text, pat, "")))
    }
    val best = counts.map(_._2).reduce((a, b) => greatest(a, b))
    counts.foldRight(lit("none"): Column) { case ((name, c), els) =>
      when(c > 0 && c === best, name).otherwise(els)
    }
  }

  def langId(toks: Column): Column = {
    val scores = langMarkers.map { case (l, m) => l -> markerScore(toks, m) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((l, s), els) =>
      when(s > 0 && s === best, l).otherwise(els)
    }
  }

  /** Overlapping character n-grams of a text column (lowercase upstream
    * if case-folding is wanted — Cavnar-Trenkle profiles do). Shorter
    * texts yield an empty array. Pure per-row expression algebra.
    */
  def charGrams(text: Column, n: Int): Column = {
    require(n > 0, "n must be positive")
    when(length(text) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), length(text) - (n - 1)),
        i => text.substr(i, lit(n))))
  }

  /** Load per-language character-n-gram profiles from a
    * (lang, gram, weight) DataFrame — the loadable upgrade over the
    * [[langMarkers]] toy (same operator shape: per-doc scoring +
    * argmax). Profiles are MODEL METADATA (a few hundred grams per
    * language, the Cavnar-Trenkle shape built from public corpora) —
    * collected to the driver and baked into the plan as map literals,
    * so scoring runs in the scan stage with no lookup join.
    */
  def loadLangProfiles(
      df: DataFrame, langCol: String = "lang", gramCol: String = "gram",
      weightCol: String = "weight"): Map[String, Map[String, Double]] =
    df.select(col(langCol), col(gramCol), col(weightCol).cast("double"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (l, rows) =>
        l -> rows.map(r => r.getString(1) -> r.getDouble(2)).toMap
      }

  /** Profile-based language ID: per language, sum the profile weights of
    * the doc's character n-grams (`gramsCol` — stage it once with
    * [[charGrams]]); predict the first language (alphabetical) with the
    * maximal positive score, "und" when every score is zero. Each
    * profile is a `typedLit` map literal — per-gram scoring is one map
    * probe, the whole operator is per-row scan-stage algebra.
    */
  def langIdProfile(
      gramsCol: Column,
      profiles: Map[String, Map[String, Double]]): Column = {
    require(profiles.nonEmpty, "need at least one language profile")
    val scores = profiles.toSeq.sortBy(_._1).map { case (l, p) =>
      val m = typedLit(p)
      l -> aggregate(gramsCol, lit(0.0),
        (acc, g) => acc + coalesce(element_at(m, g), lit(0.0)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((l, s), els) =>
      when(s > 0.0 && s === best, l).otherwise(els)
    }
  }

  /** Scale-safe twin of [[langIdProfile]] for ARBITRARY-SIZE
    * profiles: the literal flavor bakes every language's gram map
    * into the plan (right at the Cavnar-Trenkle few-hundred-grams
    * scale); here the profiles stay a DataFrame
    * (`langCol`, `gramCol`, `weightCol`) and never touch the plan —
    * per-doc grams explode, the profile equi-joins ON THE GRAM
    * (broadcast when small, shuffled when not), scores aggregate per
    * (doc, lang), and the argmax replays the literal flavor's rule
    * exactly: the alphabetically-first language with the maximal
    * POSITIVE score, else "und". Returns `(idCol, predCol)` — one
    * row per input id (docs whose grams match nothing still surface,
    * as "und"). Needs `idCol` to regroup; two scans of `df`'s gram
    * column (score + the all-ids union), both id+gram-narrow.
    */
  def langIdProfileJoin(df: DataFrame, idCol: String,
      gramsCol: Column, profiles: DataFrame, predCol: String = "lang_pred",
      langCol: String = "lang", gramCol: String = "gram",
      weightCol: String = "weight"): DataFrame = {
    val grams = df.select(col(idCol), explode(gramsCol).as("_g"))
    // window-free argmax: collect the per-lang scores and fold the
    // literal flavor's rule over the (bounded: |languages|) array
    val folded = grams
      .join(profiles.select(col(langCol).as("_l"),
        col(gramCol).as("_g"),
        col(weightCol).cast("double").as("_w")), Seq("_g"))
      .groupBy(col(idCol), col("_l"))
      .agg(sum(col("_w")).as("_s"))
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("_l"), col("_s"))))
        .as("_ls"))
      .select(col(idCol),
        aggregate(col("_ls"),
          struct(lit("und").as("l"), lit(0.0).as("s")),
          (acc, e) => when(e.getField("_s") > 0.0 &&
              e.getField("_s") > acc.getField("s"),
            struct(e.getField("_l").as("l"), e.getField("_s").as("s")))
            .otherwise(acc))
          .getField("l").as(predCol))
    df.select(col(idCol)).distinct()
      .join(folded, Seq(idCol), "left")
      .withColumn(predCol, coalesce(col(predCol), lit("und")))
  }

  /** Quality heuristics: token count, mean token length, stopword ratio,
    * and a composite score in [0,1]. Single-division rational arithmetic —
    * deterministic across engines.
    */
  val stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "is", "to", "in", "it", "that", "for")

  def qualityScore(toks: Column): Column = {
    val n = size(toks)
    val lenScore = least(n.cast("double") / 100.0, lit(1.0))
    val stopRatio =
      markerScore(toks, stopwords).cast("double") / greatest(n, lit(1))
    round(lenScore * (lit(0.5) + lit(0.5) * least(stopRatio * 5.0, lit(1.0))), 6)
  }

  /** The Gopher corpus-curation rules (Rae et al. 2021, app. A1.1) as
    * one scan-stage struct: word count bounds, mean word length band,
    * symbol-to-word ratio (`#` chars + `...` runs), bullet-start and
    * ellipsis-end line fractions, fraction of words with an alphabetic
    * character, and stopword presence — plus the composite `pass` the
    * filter keys on. Every field is integer counting or a single
    * rounded division, so a SQL engine replays it cell-exact; no
    * shuffle, no UDF — pure array/string algebra over the row.
    */
  def gopherRules(text: Column,
      tokenizer: Column => Column = tokensSimple,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, maxBulletRatio: Double = 0.9,
      maxEllipsisRatio: Double = 0.3, minAlphaRatio: Double = 0.8,
      minStopwords: Int = 2): Column = {
    val toks = tokenizer(text)
    val n = size(toks)
    val nD = greatest(n, lit(1)).cast("double")
    val lines = split(text, "\n")
    val nLines = greatest(size(lines), lit(1)).cast("double")
    val meanLen = round(
      aggregate(toks, lit(0), (acc, t) => acc + length(t)).cast("double")
        / nD, 6)
    // '#' chars + non-overlapping '...' runs, counted by replace-shrink
    val hashes = length(text) - length(regexp_replace(text, "#", ""))
    val ellipses =
      (length(text) - length(regexp_replace(text, "\\.\\.\\.", ""))) / 3
    val symbolRatio = round((hashes + ellipses).cast("double") / nD, 6)
    val bulletRatio = round(
      size(filter(lines, l => ltrim(l).startsWith("-") ||
        ltrim(l).startsWith("*") || ltrim(l).startsWith("•")))
        .cast("double") / nLines, 6)
    val ellipsisRatio = round(
      size(filter(lines, l => l.endsWith("...")))
        .cast("double") / nLines, 6)
    val alphaRatio = round(
      size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("double") / nD, 6)
    val nStop = markerScore(transform(toks, t => lower(t)), stopwords)
    struct(
      n.as("n_words"),
      meanLen.as("mean_word_len"),
      symbolRatio.as("symbol_ratio"),
      bulletRatio.as("bullet_line_ratio"),
      ellipsisRatio.as("ellipsis_line_ratio"),
      alphaRatio.as("alpha_word_ratio"),
      nStop.as("n_stopwords"),
      (n >= minWords && n <= maxWords &&
        meanLen >= minMeanLen && meanLen <= maxMeanLen &&
        symbolRatio <= maxSymbolRatio &&
        bulletRatio <= maxBulletRatio &&
        ellipsisRatio <= maxEllipsisRatio &&
        alphaRatio >= minAlphaRatio &&
        nStop >= minStopwords).as("pass"))
  }

  /** TF-IDF term scoring, ratio flavor: `tf · (N+1)/(df+1)` — the
    * log-free formulation, so the score is a single IEEE
    * multiply-divide chain both engines compute bit-identically (`ln`
    * is not IEEE-pinned and may differ in the last ulp across libm
    * implementations; monotonicity — all a ranking consumer needs — is
    * unchanged). Returns (id, term, tf, df, tfidf) per distinct
    * (doc, term).
    *
    * Scale shape: one explode + two hash aggregations; the doc-frequency
    * join is an equi-join on term (vocabulary-sized — AQE broadcasts it
    * when small); the corpus-size scalar is a 1-row broadcast. No
    * window, no all-pairs.
    */
  def tfidf(
      df: DataFrame, textCol: String, idCol: String,
      tokenizer: Column => Column = tokens): DataFrame = {
    val terms = df.select(col(idCol),
      explode(tokenizer(col(textCol))).as("term"))
    val tf = terms.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val docFreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = df.agg(countDistinct(col(idCol)).as("n_docs"))
    tf.join(docFreq, "term")
      .crossJoin(broadcast(n))
      .select(col(idCol), col("term"), col("tf"), col("df"),
        round(col("tf") * (col("n_docs") + lit(1.0)) / (col("df") + lit(1.0)),
          6).as("tfidf"))
  }

  /** Per-document keywords: the top-k terms by [[tfidf]] score — the
    * doc-level topical summary (faceting, index previews, weak topic
    * labels). Ranking runs on the windowless two-phase top-k
    * ([[graft.sim.SimSearch.topKPerKey]]) over the already-rounded
    * tf-idf scores, ties broken by term, so no reducer sorts a whole
    * document's vocabulary and the cut replays exactly. Returns
    * `(idCol, rank, term, tfidf)`, rank 0-based.
    */
  def topTerms(df: DataFrame, textCol: String, idCol: String, k: Int,
      tokenizer: Column => Column = tokens): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val scored = tfidf(df, textCol, idCol, tokenizer)
    graft.sim.SimSearch.topKPerKey(
      scored, idCol, -col("tfidf"), col("term"), k)
      .select(col(idCol), col("rank"), col("neighbor").as("term"),
        (-col("rankval")).as("tfidf"))
  }

  /** PII scrubbing patterns, written RE2-compatible (no `\s`, no
    * lookaround, explicit classes) so the DuckDB oracle replays them
    * byte-for-byte.
    */
  val emailPattern: String =
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"

  /** URL match that does NOT swallow trailing sentence punctuation: the
    * last character must be outside `[.,;:)\]]`, so "see https://x.org/p."
    * redacts the URL but keeps the full stop. (A greedy `[^ ]+` would
    * take it — and `<URL>.` vs `<URL>` changes every downstream diff.)
    */
  val urlPattern: String = "https?://[^ ]*[^ .,;:)\\]]"

  /** Redact URLs then emails (in that order — a URL can contain an
    * email-shaped userinfo part; the replacement tokens contain neither
    * pattern, so the composition is confluent). Pure per-row regex —
    * runs in the scan stage at any corpus size.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, urlPattern, "<URL>"),
      emailPattern, "<EMAIL>")

  /** Payment-card-shaped digit runs: 13-19 digits, single space/dash
    * separators allowed (the common formatted spellings). Candidates
    * only — [[luhnValid]] separates real card numbers from arbitrary
    * digit runs.
    */
  val cardCandidatePattern = "[0-9](?:[ -]?[0-9]){12,18}"

  /** North-American phone spellings: `(555) 123-4567` / `555-123-4567`. */
  val phonePattern = "\\(\\d{3}\\) ?\\d{3}-\\d{4}|\\d{3}-\\d{3}-\\d{4}"

  /** Luhn checksum over a pure-digit string — the checksum every real
    * payment card satisfies, which cuts the card-candidate false-
    * positive rate (timestamps, ids) by 10×. 0-based from the RIGHT:
    * even positions add the digit, odd positions add `2d` (minus 9
    * past 9). Pure higher-order-function arithmetic (split → indexed
    * transform → integer fold), replayed in SQL as a DuckDB list
    * comprehension over `reverse(s)[i]` (q144). Non-digit or empty
    * input yields false.
    */
  def luhnValid(digits: Column): Column = {
    val ds = reverse(split(digits, ""))
    val terms = transform(ds, (d, i) => {
      val v = d.cast("int")
      when(i % 2 === 0, v)
        .otherwise(when(v * 2 > 9, v * 2 - 9).otherwise(v * 2))
    })
    (digits.rlike("^[0-9]{13,19}$")) &&
      aggregate(terms, lit(0), (acc, x) => acc + x) % 10 === 0
  }

  /** [[redactPii]] plus card and phone tiers: `<CARD>` for every
    * card-shaped run (conservative — redaction must not depend on the
    * checksum; a mistyped card is still PII), `<PHONE>` for NA phone
    * spellings. Detection-side reporting pairs this with [[luhnValid]]
    * counts (q144).
    */
  def redactPiiExtended(text: Column): Column =
    regexp_replace(
      regexp_replace(redactPii(text), cardCandidatePattern, "<CARD>"),
      phonePattern, "<PHONE>")

  /** Multiset (bag) token overlap — the numerator of SQuAD-style token
    * F1: Σ over distinct tokens of min(count-in-a, count-in-b). Pure
    * per-row higher-order array functions: no explode, no shuffle, one
    * codegen'd scan at any corpus size. The caller derives
    * P/R/F1 micros from it with single exact-integer divisions.
    */
  def multisetOverlap(a: Column, b: Column): Column =
    aggregate(array_distinct(b), lit(0L),
      (acc, tk) => acc +
        least(
          size(filter(a, x => x === tk)),
          size(filter(b, x => x === tk))).cast("long"))

  /** ROUGE-1/ROUGE-2 recall + BLEU-2 per candidate/reference token
    * pair — the generation-eval siblings of the token-F1 scorer. All
    * n-gram work is [[shingles]] + [[multisetOverlap]] array lambdas
    * in the scan stage (zero shuffles); ratios snap to micros, and
    * BLEU-2 = brevity penalty × √(p1·p2) as ONE fixed IEEE chain so
    * an oracle can replay it. Empty candidates yield NULL BLEU.
    */
  def generationScores(
      df: org.apache.spark.sql.DataFrame, idCol: String,
      cand: Column, ref: Column): org.apache.spark.sql.DataFrame = {
    val grams = df.select(col(idCol),
      size(cand).cast("long").as("n_c1"),
      size(ref).cast("long").as("n_r1"),
      size(shingles(ref, 2)).cast("long").as("n_r2"),
      size(shingles(cand, 2)).cast("long").as("n_c2"),
      multisetOverlap(cand, ref).as("ov1"),
      multisetOverlap(shingles(cand, 2), shingles(ref, 2)).as("ov2"))
    val e = col("ov1").cast("double") / col("n_c1").cast("double") *
      (col("ov2").cast("double") / col("n_c2").cast("double"))
    val bp = when(col("n_c1") >= col("n_r1"), lit(1.0))
      .otherwise(exp(lit(1.0) -
        col("n_r1").cast("double") / col("n_c1").cast("double")))
    grams.select(col(idCol), col("n_c1"), col("n_r1"), col("ov1"),
      col("ov2"),
      when(col("n_r1") === 0, lit(0L)).otherwise(
        round(col("ov1") * lit(1000000.0) / col("n_r1")).cast("long"))
        .as("rouge1_r_micro"),
      when(col("n_r2") === 0, lit(0L)).otherwise(
        round(col("ov2") * lit(1000000.0) / col("n_r2")).cast("long"))
        .as("rouge2_r_micro"),
      when(col("n_c1") === 0 || col("n_c2") === 0,
        lit(null).cast("long")).otherwise(
        round(bp * sqrt(e) * lit(1000000.0)).cast("long"))
        .as("bleu2_micro"))
  }
}
