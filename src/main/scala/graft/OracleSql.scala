package graft

import graft.text.TextOps

/** DuckDB oracle SQL for every SQL-expressible entry in
  * `SparkEntry.queries` (driver contract). Hash-dependent oracles
  * (minhash / LSH / simhash) are generated from the SAME parameters as the
  * Scala operators ([[TextOps.minhashParams]]) so both engines replay the
  * identical arithmetic; md5 is the shared primitive hash.
  *
  * Cross-engine float discipline: every floating result is produced by an
  * identical IEEE operation chain (element-wise double casts, left-fold
  * sums) and rounded at a fixed scale on BOTH sides.
  */
object OracleSql {

  private val P = TextOps.P
  private val FP = TextOps.FP

  /** Portable 32-bit hash: first 8 md5 hex digits as a bigint. */
  private def h32(e: String): String =
    s"(('0x' || substr(md5($e), 1, 8))::UBIGINT)::BIGINT"

  /** MinHash position j over a list column `hs` of pre-mod-P hashes. */
  private def sigExpr(j: Int): String = {
    val (a, b) = TextOps.minhashParams(j)
    s"coalesce(list_min(list_transform(hs, h -> ($a * h + $b) % $P)), $P)"
  }

  /** The tokenize→shingle→hash CTE chain over base relation `rel`
    * (no leading WITH, so callers can prepend their own CTEs).
    */
  private def minhashBody(rel: String): String =
    s"""t AS (SELECT doc_id, string_split(text, ' ') AS w FROM $rel),
       |s AS (SELECT doc_id, list_transform(range(1, len(w) - 1),
       |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS sh FROM t),
       |h AS (SELECT doc_id, sh,
       |        list_transform(sh, x -> ${h32("x")} % $P) AS hs FROM s)""".stripMargin

  private val minhashCtes = "WITH " + minhashBody("documents")

  private val q14 = {
    val sigSum = (0 until 32).map(sigExpr).mkString("(", " + ", ")")
    s"""$minhashCtes
       |SELECT doc_id,
       |  len(list_distinct(sh))::INTEGER AS n_shingles,
       |  ${sigExpr(0)} AS sig_0,
       |  ${sigExpr(16)} AS sig_16,
       |  $sigSum AS sig_sum
       |FROM h""".stripMargin
  }

  private val q15 = {
    val sigCols = (0 until 32).map(j => s"${sigExpr(j)} AS s$j").mkString(", ")
    val bands = (0 until 8).map(identity).mkString(", ")
    val buckets = (0 until 8).map { b =>
      val parts = (0 until 4).map(r => s"s${b * 4 + r}::VARCHAR")
        .mkString(" || ',' || ")
      s"md5($parts)"
    }.mkString(", ")
    s"""$minhashCtes,
       |g AS (SELECT doc_id, $sigCols FROM h)
       |SELECT doc_id,
       |  unnest([$bands]) AS band,
       |  unnest([$buckets]) AS bucket
       |FROM g""".stripMargin
  }

  /** Source-overlap matrix: per-doc sigs (the q14 chain with `source`
    * carried instead of doc_id), folded per source with element-wise
    * min — the minhash of each source's shingle-set UNION — then
    * pairwise lane agreement.
    */
  private val q81 = {
    val sigCols = (0 until 32).map(j => s"${sigExpr(j)} AS s$j")
      .mkString(", ")
    val minCols = (0 until 32).map(j => s"min(s$j) AS s$j")
      .mkString(", ")
    val agree = (0 until 32)
      .map(j => s"CASE WHEN a.s$j = b.s$j THEN 1 ELSE 0 END")
      .mkString("(", " + ", ")")
    s"""WITH t AS (SELECT source, string_split(text, ' ') AS w
       |           FROM documents),
       |s AS (SELECT source, list_transform(range(1, len(w) - 1),
       |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS sh
       |      FROM t),
       |h AS (SELECT source,
       |        list_transform(sh, x -> ${h32("x")} % $P) AS hs FROM s),
       |g AS (SELECT source, $sigCols FROM h),
       |m AS (SELECT source, $minCols FROM g GROUP BY source),
       |p AS (SELECT a.source AS src_a, b.source AS src_b,
       |        $agree::BIGINT AS n_agree
       |      FROM m a JOIN m b ON a.source < b.source)
       |SELECT src_a, src_b, n_agree,
       |  round(n_agree::DOUBLE / 32.0, 6) AS est_jaccard FROM p""".stripMargin
  }

  private val q21 = {
    val terms = (0 until 16).map { b =>
      val mask = 1L << b
      s"""CASE WHEN list_sum(list_transform(hs,
         |  h -> CASE WHEN (h & $mask) > 0 THEN 1 ELSE -1 END)) > 0
         |  THEN $mask ELSE 0 END""".stripMargin
    }.mkString("(", " + ", ")")
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |h AS (SELECT doc_id, list_transform(w, x -> ${h32("x")}) AS hs FROM t)
       |SELECT doc_id, ($terms)::BIGINT AS simhash16 FROM h""".stripMargin
  }

  /** Shared LSH candidate CTEs (32 sigs, 8 bands x 4 rows): signatures
    * -> per-band md5 buckets -> bucket self-join candidate pairs. Used
    * verbatim by q16/q29/q33 so banding changes happen in ONE place.
    */
  private def lshCandBody(
      rel: String,
      pairCond: String = "a.doc_id < b.doc_id"): String = {
    val sigCols = (0 until 32).map(j => s"${sigExpr(j)} AS s$j").mkString(", ")
    val bands = (0 until 8).mkString(", ")
    val buckets = (0 until 8).map { b =>
      val parts = (0 until 4).map(r => s"s${b * 4 + r}::VARCHAR")
        .mkString(" || ',' || ")
      s"md5($parts)"
    }.mkString(", ")
    s"""${minhashBody(rel)},
       |g AS (SELECT doc_id, $sigCols FROM h),
       |bk AS (SELECT doc_id,
       |         unnest([$bands]) AS band,
       |         unnest([$buckets]) AS bucket FROM g),
       |cand AS (SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
       |         FROM bk a JOIN bk b
       |           ON a.band = b.band AND a.bucket = b.bucket
       |          AND $pairCond)""".stripMargin
  }

  private val lshCandCtes: String = "WITH " + lshCandBody("documents")

  /** Signature-agreement count between candidate sides ga/gb. */
  private val agreeExpr: String = (0 until 32)
    .map(j => s"CASE WHEN ga.s$j = gb.s$j THEN 1 ELSE 0 END")
    .mkString("(", " + ", ")")

  /** Near-dup candidate pairs oracle: signatures → bucket self-join →
    * signature-agreement est-Jaccard at threshold 0.2 (the q29 pipeline
    * stopped at the pair stage).
    */
  private val q16 =
    s"""$lshCandCtes
       |SELECT ia AS id_a, ib AS id_b,
       |  round($agreeExpr / 32.0, 6) AS est_jaccard
       |FROM cand
       |JOIN g ga ON ga.doc_id = ia
       |JOIN g gb ON gb.doc_id = ib
       |WHERE $agreeExpr / 32.0 >= 0.2""".stripMargin

  /** q293: q16's LSH pair machinery over the SURVIVING corpus only —
    * the signed-index write/append/delete lifecycle must converge to
    * exactly these pairs.
    */
  private val q293 =
    s"""WITH ${lshCandBody("(SELECT * FROM documents WHERE doc_id % 11 <> 0)")}
       |SELECT ia AS id_a, ib AS id_b,
       |  round($agreeExpr / 32.0, 6) AS est_jaccard
       |FROM cand
       |JOIN g ga ON ga.doc_id = ia
       |JOIN g gb ON gb.doc_id = ib
       |WHERE $agreeExpr / 32.0 >= 0.2""".stripMargin

  /** Dedup-recall harness oracle (q194): the corpus augmented with
    * drop-every-k mutated twins (DuckDB's 1-based indexed list_filter
    * = Spark's 0-based `(i+1) % k` filter), the q16 LSH machinery
    * signed over the augmented relation, per-level planted-pair
    * detection counts.
    */
  private lazy val q194 = {
    def mut(k: Int, off: Long) =
      s"""SELECT doc_id + $off AS doc_id,
         |  array_to_string(list_filter(string_split(text, ' '),
         |    (x, i) -> i % $k != 0), ' ') AS text
         |FROM documents""".stripMargin
    s"""WITH aug AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL ${mut(4, 100000L)}
       |  UNION ALL ${mut(6, 200000L)}
       |  UNION ALL ${mut(10, 300000L)}),
       |${lshCandBody("aug")},
       |p AS (SELECT ia, ib FROM cand
       |      JOIN g ga ON ga.doc_id = ia
       |      JOIN g gb ON gb.doc_id = ib
       |      WHERE $agreeExpr / 32.0 >= 0.2),
       |det AS (SELECT ib // 100000 AS level,
       |          count(DISTINCT ia)::BIGINT AS n_detected
       |        FROM p WHERE ia < 100000 AND ib >= 100000
       |          AND ib % 100000 = ia
       |        GROUP BY 1),
       |meta AS (SELECT unnest([1, 2, 3]) AS level,
       |           unnest([4, 6, 10]) AS drop_every),
       |n AS (SELECT count(*)::BIGINT AS n_docs FROM documents)
       |SELECT meta.level::BIGINT AS level,
       |  drop_every::INTEGER AS drop_every, n_docs,
       |  coalesce(n_detected, 0)::BIGINT AS n_detected,
       |  round(coalesce(n_detected, 0)::DOUBLE / n_docs::DOUBLE, 6)
       |    AS recall
       |FROM meta LEFT JOIN det USING (level) CROSS JOIN n""".stripMargin
  }

  /** Cross-corpus fuzzy-join oracle: the q16 machinery with the
    * candidate condition flipped from within-corpus ordering to the
    * parity split (left = even ids, right = odd) — signatures are
    * corpus-independent, so signing once over `documents` and pairing
    * across the split replays the two-input operator exactly.
    */
  private val q71 = {
    val ctes = "WITH " + lshCandBody("documents",
      "a.doc_id % 2 = 0 AND b.doc_id % 2 = 1")
    s"""$ctes
       |SELECT ia AS id_a, ib AS id_b,
       |  round($agreeExpr / 32.0, 6) AS est_jaccard
       |FROM cand
       |JOIN g ga ON ga.doc_id = ia
       |JOIN g gb ON gb.doc_id = ib
       |WHERE $agreeExpr / 32.0 >= 0.2""".stripMargin
  }

  /** Near-dup clustering oracle: the whole LSH pipeline in SQL —
    * shared candidate CTEs → signature-agreement est-Jaccard (k/32 is a
    * dyadic rational, so the ≥ threshold comparison is exact on both
    * engines) → symmetric edges → recursive-CTE transitive closure →
    * min reachable id per doc.
    */
  private val clusterCtes =
    s"""${lshCandCtes.replaceFirst("WITH ", "WITH RECURSIVE ")},
       |p AS (SELECT ia, ib FROM cand
       |      JOIN g ga ON ga.doc_id = ia
       |      JOIN g gb ON gb.doc_id = ib
       |      WHERE $agreeExpr / 32.0 >= 0.5),
       |e AS (SELECT ia AS s, ib AS t FROM p
       |      UNION SELECT ib, ia FROM p),
       |r AS (SELECT doc_id AS s, doc_id AS t FROM documents
       |      UNION SELECT r.s, e.t FROM r JOIN e ON r.t = e.s),
       |cl AS (SELECT s AS doc_id, min(t) AS cluster FROM r GROUP BY s)""".stripMargin

  private val q29 =
    s"""$clusterCtes
       |SELECT doc_id, cluster FROM cl""".stripMargin

  /** Dedup report oracle: q29's recursive closure rolled up into the
    * cluster-size histogram.
    */
  private val q74 =
    s"""$clusterCtes,
       |cs AS (SELECT cluster, count(*) AS cluster_size FROM cl
       |       GROUP BY cluster)
       |SELECT cluster_size, count(*) AS n_clusters
       |FROM cs GROUP BY cluster_size""".stripMargin

  /** Bigram-LM NLL scoring (q77's oracle; also the score source for
    * q88's percentile buckets): per-pair log-prob snapped to
    * micro-nats once, per-doc totals exact BIGINT, avg one IEEE chain.
    */
  private val q77 =
    s"""WITH tok AS (SELECT doc_id, lang, string_split(text, ' ') AS w
       |             FROM documents),
       |bg AS (SELECT doc_id, lang,
       |        unnest(list_transform(range(1, len(w)), i ->
       |          {'b1': ${h32("w[i]")} % 64,
       |           'b2': ${h32("w[i+1]")} % 64})) AS p FROM tok),
       |e AS (SELECT doc_id, lang, (p.b1) AS b1, (p.b2) AS b2 FROM bg),
       |c12 AS (SELECT b1, b2, count(*) AS c12 FROM e WHERE lang = 'en'
       |        GROUP BY b1, b2),
       |c1 AS (SELECT b1, sum(c12)::BIGINT AS c1 FROM c12 GROUP BY b1),
       |dp AS (SELECT doc_id, b1, b2, count(*) AS c FROM e
       |       GROUP BY doc_id, b1, b2),
       |lp AS (SELECT b1, b2,
       |        round(ln((coalesce(c12, 0) + 1)::DOUBLE /
       |          (coalesce(c1, 0) + 64)) * 1000000.0)::BIGINT AS lpm
       |       FROM (SELECT DISTINCT b1, b2 FROM dp) d
       |       LEFT JOIN c12 USING (b1, b2) LEFT JOIN c1 USING (b1)),
       |sc AS (SELECT doc_id, sum(c)::BIGINT AS n_bigrams,
       |        (-sum(c * lpm))::BIGINT AS nll_micro
       |       FROM dp JOIN lp USING (b1, b2) GROUP BY doc_id)
       |SELECT d.doc_id, coalesce(sc.n_bigrams, 0) AS n_bigrams,
       |  coalesce(sc.nll_micro, 0) AS nll_micro,
       |  CASE WHEN coalesce(sc.n_bigrams, 0) = 0 THEN NULL
       |       ELSE round((sc.nll_micro::DOUBLE / sc.n_bigrams)
       |         / 1000000.0, 6) END AS avg_nll
       |FROM (SELECT DISTINCT doc_id FROM documents) d
       |LEFT JOIN sc USING (doc_id)""".stripMargin

  /** Replay of SparkEntry.gateBpeMerges (q54 + q95): mark every char
    * with chr(1), apply merges in rank order as global replaces
    * ("a␁b␁" → "ab␁" — equal to the priority loop for valid bottom-up
    * tables), drop whitespace pieces (the explicit [ \t\n\f\r] class
    * both engines tokenize on); markers become piece separators.
    */
  private val bpeMarkedSelect: String = {
    val marked = """regexp_replace(text, '(.)', '\1' || chr(1), 'g')"""
    val merged = graft.SparkEntry.gateBpeMerges.foldLeft(marked) {
      case (e, (a, b)) =>
        s"replace($e,\n    '$a' || chr(1) || '$b' || chr(1), '$a$b' || chr(1))"
    }
    val ws = Seq("' '", "chr(9)", "chr(10)", "chr(12)", "chr(13)")
      .foldLeft(merged)((e, c) => s"replace($e, $c || chr(1), '')")
    s"SELECT doc_id, lang, n_chars, $ws AS s FROM documents"
  }

  /** Shared-span detection (q92's oracle; q93 excises from it):
    * hot-capped 5-gram anchors, gaps-and-islands per diagonal.
    */
  private val q92 =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w
      |           FROM documents),
      |g AS (SELECT doc_id, i AS pos,
      |        array_to_string(list_slice(w, i, i + 4), ' ') AS gram
      |      FROM t, unnest(range(1, len(w) - 3)) AS u(i)),
      |keep AS (SELECT gram FROM g GROUP BY gram
      |         HAVING count(DISTINCT doc_id) <= 20),
      |gg AS (SELECT g.* FROM g JOIN keep USING (gram)),
      |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |        a.pos AS pa, b.pos AS pb, a.pos - b.pos AS diag
      |      FROM gg a JOIN gg b
      |        ON a.gram = b.gram AND a.doc_id < b.doc_id),
      |r AS (SELECT id_a, id_b, diag, pa, pb,
      |        pa - row_number() OVER (PARTITION BY id_a, id_b, diag
      |          ORDER BY pa) AS run FROM p)
      |SELECT id_a, id_b, min(pa)::INTEGER AS start_a,
      |  min(pb)::INTEGER AS start_b,
      |  (count(*) + 4)::BIGINT AS span_len
      |FROM r GROUP BY id_a, id_b, diag, run
      |HAVING count(*) + 4 >= 7""".stripMargin

  /** Left-fold dot product over 1-based list indices — the identical
    * operation chain to SimSearch.dot (element-wise double casts, then a
    * sequential sum), so the doubles agree bit-for-bit.
    */
  private def duckDot(a: String, b: String, dim: Int): String =
    s"""list_reduce(list_transform(range(1, ${dim + 1}),
       |  i -> $a[i]::DOUBLE * $b[i]::DOUBLE), (x, y) -> x + y)""".stripMargin

  /** Squared distance between a raw float vector column and a double
    * centroid list — the same (dx)·(dx) left-fold chain as Spark's
    * dist2 kernel (shared by the kmeans replays and the q121 ADC LUT).
    */
  private def duckD2(v: String, c: String, dim: Int): String =
    s"""list_reduce(list_transform(range(1, ${dim + 1}),
       |  i -> ($v[i]::DOUBLE - $c[i]) * ($v[i]::DOUBLE - $c[i])),
       |  (x, y) -> x + y)""".stripMargin

  private val q17 = {
    val dim = 64
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
       |           WHERE vec_id < 10),
       |c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings),
       |p AS (SELECT qid, cid,
       |        round(${duckDot("qv", "cv", dim)} /
       |          (sqrt(${duckDot("qv", "qv", dim)}) *
       |           sqrt(${duckDot("cv", "cv", dim)})), 6) AS cos_sim
       |      FROM q, c WHERE qid != cid),
       |r AS (SELECT qid, cid, cos_sim,
       |        row_number() OVER (PARTITION BY qid
       |          ORDER BY cos_sim DESC, cid) AS rn FROM p)
       |SELECT qid, (rn - 1)::INTEGER AS rank, cid AS neighbor, cos_sim
       |FROM r WHERE rn <= 5""".stripMargin
  }

  /** Literal weight list for hyperplane `p` — the identical md5-derived
    * doubles [[graft.sim.SimSearch.planeWeight]] uses, embedded as SQL
    * literals (k/1000 values round-trip exactly through toString).
    */
  private def planeList(p: Int, dim: Int): String =
    (0 until dim).map(d => graft.sim.SimSearch.planeWeight(p, d))
      .mkString("[", ", ", "]")

  /** Sign-bit bucket of vector column `v` under the fixed hyperplanes —
    * replays [[graft.sim.SimSearch.simhashBucket]]: per plane, the same
    * left-fold dot product, sign test, bit weight.
    */
  private def bucketExpr(v: String, planes: Int, dim: Int): String =
    (0 until planes).map { p =>
      s"""CASE WHEN list_reduce(list_transform(range(1, ${dim + 1}),
         |    i -> $v[i]::DOUBLE * (${planeList(p, dim)})[i]),
         |    (x, y) -> x + y) >= 0
         |  THEN ${1L << p} ELSE 0 END""".stripMargin
    }.mkString("(", " + ", ")")

  /** ANN oracle: bucket both sides with the replayed hyperplanes, join on
    * bucket, exact cosine rank within — deterministic because every float
    * op (plane dots, cosine folds) is the same IEEE chain on both engines.
    */
  private val q18 = {
    val dim = 64
    s"""WITH e AS (SELECT vec_id, embedding,
       |             ${bucketExpr("embedding", 6, dim)} AS bucket
       |           FROM embeddings),
       |q AS (SELECT vec_id AS qid, embedding AS qv, bucket FROM e
       |      WHERE vec_id < 50),
       |c AS (SELECT vec_id AS cid, embedding AS cv, bucket FROM e),
       |p AS (SELECT qid, cid,
       |        round(${duckDot("qv", "cv", dim)} /
       |          (sqrt(${duckDot("qv", "qv", dim)}) *
       |           sqrt(${duckDot("cv", "cv", dim)})), 6) AS cos_sim
       |      FROM q JOIN c USING (bucket) WHERE qid != cid),
       |r AS (SELECT qid, cid, cos_sim,
       |        row_number() OVER (PARTITION BY qid
       |          ORDER BY cos_sim DESC, cid) AS rn FROM p)
       |SELECT qid, (rn - 1)::INTEGER AS rank, cid AS neighbor, cos_sim
       |FROM r WHERE rn <= 5""".stripMargin
  }

  /** q307: the q18 bucket/cosine chains with the CANDIDATE set
    * restricted to the persisted ANN index's survivors (vec_id % 9
    * <> 0) — deleted ids may still query (q keeps every vec_id < 20)
    * but must never surface from any probe, before or after
    * compaction.
    */
  private val q307 = {
    val dim = 64
    s"""WITH e AS (SELECT vec_id, embedding,
       |             ${bucketExpr("embedding", 6, dim)} AS bucket
       |           FROM embeddings),
       |q AS (SELECT vec_id AS qid, embedding AS qv, bucket FROM e
       |      WHERE vec_id < 20),
       |c AS (SELECT vec_id AS cid, embedding AS cv, bucket FROM e
       |      WHERE vec_id % 9 <> 0),
       |p AS (SELECT qid, cid,
       |        round(${duckDot("qv", "cv", dim)} /
       |          (sqrt(${duckDot("qv", "qv", dim)}) *
       |           sqrt(${duckDot("cv", "cv", dim)})), 6) AS cos_sim
       |      FROM q JOIN c USING (bucket) WHERE qid != cid),
       |r AS (SELECT qid, cid, cos_sim,
       |        row_number() OVER (PARTITION BY qid
       |          ORDER BY cos_sim DESC, cid) AS rn FROM p)
       |SELECT qid, (rn - 1)::INTEGER AS rank, cid AS neighbor, cos_sim
       |FROM r WHERE rn <= 5""".stripMargin
  }

  /** Recall@k oracle: replay the q18 ANN ranking AND the brute-force
    * baseline on the same query set (vec_id < 50, k = 5), then score
    * each query by the intersection of its two top-5 neighbor sets.
    * Both rankings reuse the proven-identical IEEE cosine chains, so
    * the intersection — and hence the recall — is integer-exact.
    */
  private val q65 = {
    val dim = 64
    s"""WITH e AS (SELECT vec_id, embedding,
       |             ${bucketExpr("embedding", 6, dim)} AS bucket
       |           FROM embeddings),
       |q AS (SELECT vec_id AS qid, embedding AS qv, bucket FROM e
       |      WHERE vec_id < 50),
       |c AS (SELECT vec_id AS cid, embedding AS cv, bucket FROM e),
       |pa AS (SELECT qid, cid,
       |         round(${duckDot("qv", "cv", dim)} /
       |           (sqrt(${duckDot("qv", "qv", dim)}) *
       |            sqrt(${duckDot("cv", "cv", dim)})), 6) AS cos_sim
       |       FROM q JOIN c USING (bucket) WHERE qid != cid),
       |ra AS (SELECT qid, cid,
       |         row_number() OVER (PARTITION BY qid
       |           ORDER BY cos_sim DESC, cid) AS rn FROM pa),
       |ann AS (SELECT qid, cid FROM ra WHERE rn <= 5),
       |pb AS (SELECT qid, cid,
       |         round(${duckDot("qv", "cv", dim)} /
       |           (sqrt(${duckDot("qv", "qv", dim)}) *
       |            sqrt(${duckDot("cv", "cv", dim)})), 6) AS cos_sim
       |       FROM q, c WHERE qid != cid),
       |rb AS (SELECT qid, cid,
       |         row_number() OVER (PARTITION BY qid
       |           ORDER BY cos_sim DESC, cid) AS rn FROM pb),
       |ex AS (SELECT qid, cid FROM rb WHERE rn <= 5),
       |hits AS (SELECT qid, count(*) AS n_hit
       |         FROM ex JOIN ann USING (qid, cid) GROUP BY qid),
       |nx AS (SELECT qid, count(*) AS n_exact FROM ex GROUP BY qid)
       |SELECT nx.qid, nx.n_exact, coalesce(h.n_hit, 0)::BIGINT AS n_hit,
       |  round(coalesce(h.n_hit, 0)::DOUBLE / nx.n_exact, 6) AS recall
       |FROM nx LEFT JOIN hits h USING (qid)""".stripMargin
  }

  /** Matryoshka oracle: one full-dim exact ranking (the q17 cosine
    * chain), then per truncation tier the SAME chain folded only over
    * the first d elements — `duckDot` with dim = d never reads past
    * the prefix, which is exactly what the Spark side's array slice
    * does — and the per-query top-5 intersection.
    */
  private val q171 = {
    val dim = 64
    val dimsList = Seq(8, 16, 32, 64)
    val tiers = dimsList.map { d =>
      s"""p$d AS (SELECT qid, cid,
         |  round(${duckDot("qv", "cv", d)} /
         |    (sqrt(${duckDot("qv", "qv", d)}) *
         |     sqrt(${duckDot("cv", "cv", d)})), 6) AS cos_sim
         |  FROM q, c WHERE qid != cid),
         |r$d AS (SELECT qid, cid, row_number() OVER (PARTITION BY qid
         |    ORDER BY cos_sim DESC, cid) AS rn FROM p$d),
         |t$d AS (SELECT qid, cid FROM r$d WHERE rn <= 5),
         |h$d AS (SELECT qid, count(*) AS n_hit
         |        FROM ex JOIN t$d USING (qid, cid) GROUP BY qid)"""
        .stripMargin
    }.mkString(",\n")
    val sel = dimsList.map { d =>
      s"""SELECT $d AS dims, nx.qid, nx.n_exact,
         |  coalesce(h$d.n_hit, 0)::BIGINT AS n_hit,
         |  round(coalesce(h$d.n_hit, 0)::DOUBLE / nx.n_exact, 6)
         |    AS recall
         |FROM nx LEFT JOIN h$d USING (qid)""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv
       |           FROM embeddings WHERE vec_id < 20),
       |c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings),
       |pb AS (SELECT qid, cid,
       |         round(${duckDot("qv", "cv", dim)} /
       |           (sqrt(${duckDot("qv", "qv", dim)}) *
       |            sqrt(${duckDot("cv", "cv", dim)})), 6) AS cos_sim
       |       FROM q, c WHERE qid != cid),
       |rb AS (SELECT qid, cid,
       |         row_number() OVER (PARTITION BY qid
       |           ORDER BY cos_sim DESC, cid) AS rn FROM pb),
       |ex AS (SELECT qid, cid FROM rb WHERE rn <= 5),
       |nx AS (SELECT qid, count(*) AS n_exact FROM ex GROUP BY qid),
       |$tiers
       |$sel""".stripMargin
  }

  /** IVF oracle: bounded two-level id-ordered centroid fold (bit-identical
    * to the Spark side's [[graft.sim.SimSearch.meanVectors]] — level 1
    * folds each `vec_id // W` bucket in id order, level 2 folds bucket
    * partials in bucket order), nprobe=2 nearest cells by unrounded
    * cosine, then exact cosine top-5 within the probed cells.
    */
  private val q27 = {
    val dim = 64
    val w = 128 // = the gate query's bucketWidth
    val centroidCos =
      s"""(${duckDot("qv", "centroid", dim)} /
         |  (sqrt(${duckDot("qv", "qv", dim)}) *
         |   sqrt(${duckDot("centroid", "centroid", dim)})))""".stripMargin
    s"""WITH b AS (SELECT vec_id, embedding, label AS cell FROM embeddings),
       |p1 AS (SELECT cell, vec_id // $w AS bk, count(*) AS n,
       |         list_reduce(
       |           list_transform(list(embedding ORDER BY vec_id),
       |             v -> list_transform(v, x -> x::DOUBLE)),
       |           (a, c) -> list_transform(range(1, ${dim + 1}),
       |                       i -> a[i] + c[i])) AS psum
       |       FROM b GROUP BY cell, vec_id // $w),
       |cs AS (SELECT cell, sum(n) AS n,
       |         list_reduce(list(psum ORDER BY bk),
       |           (a, c) -> list_transform(range(1, ${dim + 1}),
       |                       i -> a[i] + c[i])) AS vsum
       |       FROM p1 GROUP BY cell),
       |cen AS (SELECT cell, n,
       |          list_transform(vsum, s -> s / n) AS centroid
       |        FROM cs),
       |q AS (SELECT vec_id AS qid, embedding AS qv FROM b
       |      WHERE vec_id < 20),
       |pc AS (SELECT qid, cell,
       |         row_number() OVER (PARTITION BY qid
       |           ORDER BY $centroidCos DESC, cell) AS rn
       |       FROM q CROSS JOIN cen),
       |pr AS (SELECT qid, cell FROM pc WHERE rn <= 2),
       |cd AS (SELECT p.qid, c.vec_id AS cid,
       |         round(${duckDot("q.qv", "c.embedding", dim)} /
       |           (sqrt(${duckDot("q.qv", "q.qv", dim)}) *
       |            sqrt(${duckDot("c.embedding", "c.embedding", dim)})), 6)
       |           AS cos_sim
       |       FROM pr p JOIN q ON q.qid = p.qid
       |       JOIN b c ON c.cell = p.cell AND c.vec_id != p.qid),
       |r AS (SELECT qid, cid, cos_sim,
       |        row_number() OVER (PARTITION BY qid
       |          ORDER BY cos_sim DESC, cid) AS rn FROM cd)
       |SELECT qid, (rn - 1)::INTEGER AS rank, cid AS neighbor, cos_sim
       |FROM r WHERE rn <= 5""".stripMargin
  }

  /** Centroid-similarity oracle (q187): q27's two-level id-ordered
    * mean fold per label, then pairwise centroid cosine (a < b) with
    * the same duckDot chain.
    */
  private lazy val q187 = {
    val dim = 64
    val w = 128
    s"""WITH b AS (SELECT vec_id, embedding, label AS cell
       |           FROM embeddings),
       |p1 AS (SELECT cell, vec_id // $w AS bk, count(*) AS n,
       |         list_reduce(
       |           list_transform(list(embedding ORDER BY vec_id),
       |             v -> list_transform(v, x -> x::DOUBLE)),
       |           (a, c) -> list_transform(range(1, ${dim + 1}),
       |                       i -> a[i] + c[i])) AS psum
       |       FROM b GROUP BY cell, vec_id // $w),
       |cs AS (SELECT cell, sum(n) AS n,
       |         list_reduce(list(psum ORDER BY bk),
       |           (a, c) -> list_transform(range(1, ${dim + 1}),
       |                       i -> a[i] + c[i])) AS vsum
       |       FROM p1 GROUP BY cell),
       |cen AS (SELECT cell, n,
       |          list_transform(vsum, s -> s / n) AS centroid
       |        FROM cs),
       |aa AS (SELECT cell AS label_a, n::BIGINT AS n_a,
       |         centroid AS ca FROM cen),
       |bb AS (SELECT cell AS label_b, n::BIGINT AS n_b,
       |         centroid AS cb FROM cen)
       |SELECT label_a, label_b, n_a, n_b,
       |  round(${duckDot("ca", "cb", dim)} /
       |    (sqrt(${duckDot("ca", "ca", dim)}) *
       |     sqrt(${duckDot("cb", "cb", dim)})), 6) AS cos_sim
       |FROM aa JOIN bb ON label_a < label_b""".stripMargin
  }

  /** IVFADC-R oracle (q121): kmeansBody per 32-dim subspace gives the
    * codebooks (`p0cen2`/`p1cen2`) and code assignments
    * (`p0afinal`/`p1afinal`); the q27 CTE shapes give cell centroids
    * and the 2-probe; ADC = per-query lookup distances to the final
    * codebooks summed across the two subspaces (two IEEE additions —
    * commutative, so partition-order-free on the Spark side too);
    * top-40 by (adc, vid) then exact cosine top-5 over the candidates.
    */
  private lazy val q121 = q121Sql("")

  /** The q121 chain with an optional filter on the CODE table (the
    * `cds` CTE) — `codesFilter` is a `WHERE …` clause over `a0.vid`.
    * q265 replays the persisted-index deletion lifecycle with it:
    * codebooks/centroids fit on the FULL corpus (deletes never refit
    * models), but tombstoned ids vanish from the served codes.
    */
  private def q121Sql(codesFilter: String) = {
    val dim = 64
    val sw = 32
    val w = 128L
    def d2(v: String, c: String, d: Int) = duckD2(v, c, d)
    val centroidCos =
      s"""(${duckDot("qv", "centroid", dim)} /
         |  (sqrt(${duckDot("qv", "qv", dim)}) *
         |   sqrt(${duckDot("centroid", "centroid", dim)})))""".stripMargin
    s"""WITH base AS (SELECT vec_id, embedding, label AS cell
       |              FROM embeddings),
       |sub0 AS (SELECT vec_id, embedding[1:$sw] AS embedding
       |         FROM embeddings),
       |sub1 AS (SELECT vec_id, embedding[${sw + 1}:$dim] AS embedding
       |         FROM embeddings),
       |${kmeansBody(4, 2, w, sw, table = "sub0", prefix = "p0")},
       |${kmeansBody(4, 2, w, sw, table = "sub1", prefix = "p1")},
       |ivp AS (SELECT cell, vec_id // $w AS bk, count(*) AS n,
       |         list_reduce(
       |           list_transform(list(embedding ORDER BY vec_id),
       |             v -> list_transform(v, x -> x::DOUBLE)),
       |           (a, c) -> list_transform(range(1, ${dim + 1}),
       |                       i -> a[i] + c[i])) AS psum
       |       FROM base GROUP BY cell, vec_id // $w),
       |ivc AS (SELECT cell, sum(n) AS n,
       |         list_reduce(list(psum ORDER BY bk),
       |           (a, c) -> list_transform(range(1, ${dim + 1}),
       |                       i -> a[i] + c[i])) AS vsum
       |       FROM ivp GROUP BY cell),
       |cen AS (SELECT cell,
       |          list_transform(vsum, s -> s / n) AS centroid
       |        FROM ivc),
       |q AS (SELECT vec_id AS qid, embedding AS qv FROM base
       |      WHERE vec_id < 20),
       |pc AS (SELECT qid, cell,
       |         row_number() OVER (PARTITION BY qid
       |           ORDER BY $centroidCos DESC, cell) AS rn
       |       FROM q CROSS JOIN cen),
       |pr AS (SELECT qid, cell FROM pc WHERE rn <= 2),
       |q0 AS (SELECT s.vec_id AS qid, s.embedding AS qs FROM sub0 s
       |       WHERE s.vec_id < 20),
       |q1 AS (SELECT s.vec_id AS qid, s.embedding AS qs FROM sub1 s
       |       WHERE s.vec_id < 20),
       |l0 AS (SELECT q0.qid, cb.cid AS code,
       |         ${d2("q0.qs", "cb.cv", sw)} AS d2
       |       FROM q0 CROSS JOIN p0cen2 cb),
       |l1 AS (SELECT q1.qid, cb.cid AS code,
       |         ${d2("q1.qs", "cb.cv", sw)} AS d2
       |       FROM q1 CROSS JOIN p1cen2 cb),
       |cds AS (SELECT a0.vid, a0.cid AS c0, a1.cid AS c1, b.cell
       |        FROM p0afinal a0 JOIN p1afinal a1 ON a1.vid = a0.vid
       |        JOIN base b ON b.vec_id = a0.vid $codesFilter),
       |adc AS (SELECT pr.qid, c.vid, l0.d2 + l1.d2 AS adc_d2
       |        FROM pr JOIN cds c ON c.cell = pr.cell
       |        JOIN l0 ON l0.qid = pr.qid AND l0.code = c.c0
       |        JOIN l1 ON l1.qid = pr.qid AND l1.code = c.c1),
       |ct AS (SELECT qid, vid FROM (
       |         SELECT qid, vid, row_number() OVER (PARTITION BY qid
       |           ORDER BY adc_d2, vid) AS rn FROM adc)
       |       WHERE rn <= 40),
       |rr AS (SELECT t.qid, t.vid AS cid,
       |         round(${duckDot("q.qv", "b.embedding", dim)} /
       |           (sqrt(${duckDot("q.qv", "q.qv", dim)}) *
       |            sqrt(${duckDot("b.embedding", "b.embedding", dim)})),
       |           6) AS cos_sim
       |       FROM ct t JOIN q ON q.qid = t.qid
       |       JOIN base b ON b.vec_id = t.vid),
       |rk AS (SELECT qid, cid, cos_sim,
       |        row_number() OVER (PARTITION BY qid
       |          ORDER BY cos_sim DESC, cid) AS rn FROM rr)
       |SELECT qid, (rn - 1)::INTEGER AS rank, cid AS neighbor, cos_sim
       |FROM rk WHERE rn <= 5""".stripMargin
  }

  /** Cohort-retention report (q112) — ALSO the oracle of q129's
    * streaming replay: the activity-set state is order-free and
    * idempotent under union, so the incremental twin is exact under
    * ANY batch order and must reproduce the batch report.
    */
  private lazy val q112Retention =
    """WITH a AS (SELECT DISTINCT user_id AS u,
      |        (CAST(floor(epoch(ts)) AS BIGINT) // 86400) AS day
      |      FROM events),
      |c AS (SELECT u, min(day) AS cohort_day FROM a GROUP BY 1),
      |s AS (SELECT cohort_day, count(*)::BIGINT AS sz FROM c
      |      GROUP BY 1),
      |g AS (SELECT c.cohort_day, a.day - c.cohort_day AS day_offset,
      |        count(*)::BIGINT AS n_active
      |      FROM a JOIN c USING (u) GROUP BY 1, 2)
      |SELECT g.cohort_day, g.day_offset, g.n_active,
      |  round(g.n_active::DOUBLE / s.sz::DOUBLE, 6) AS retention
      |FROM g JOIN s USING (cohort_day)""".stripMargin

  /** Greedy-earliest ordered-funnel report (q110) — ALSO the oracle of
    * q125's streaming replay: the incremental twin driven over
    * event-time-ordered batches is exact, so its report must equal the
    * batch funnel over the full history.
    */
  private lazy val q110Funnel =
    """WITH e AS (SELECT user_id AS u, event_type AS ty,
      |        CAST(floor(epoch(ts)) AS BIGINT) AS t FROM events),
      |s0 AS (SELECT u, min(t) AS t0 FROM e WHERE ty = 'view'
      |       GROUP BY 1),
      |s1 AS (SELECT e.u, min(e.t) AS t1 FROM e JOIN s0 USING (u)
      |       WHERE e.ty = 'click' AND e.t > s0.t0 GROUP BY 1),
      |s2 AS (SELECT e.u, min(e.t) AS t2 FROM e JOIN s1 USING (u)
      |       WHERE e.ty = 'purchase' AND e.t > s1.t1 GROUP BY 1),
      |c AS (SELECT 0 AS stage_idx, 'view' AS stage,
      |        (SELECT count(*) FROM s0)::BIGINT AS n_users
      |      UNION ALL SELECT 1, 'click',
      |        (SELECT count(*) FROM s1)::BIGINT
      |      UNION ALL SELECT 2, 'purchase',
      |        (SELECT count(*) FROM s2)::BIGINT)
      |SELECT stage_idx, stage, n_users,
      |  round(n_users::DOUBLE /
      |    (SELECT count(*) FROM s0)::DOUBLE, 6) AS conversion
      |FROM c""".stripMargin

  /** Gap-based sessionization (q24) — ALSO the oracle of q272's
    * streaming replay: under event-time-ordered batches the
    * incremental per-user session state equals the batch flavor row
    * for row, so one SQL gates both.
    */
  private lazy val q24Sessionize =
    """WITH e AS (SELECT user_id, event_id, value, ts,
      |             CAST(floor(epoch(ts)) AS BIGINT) AS tse FROM events),
      |l AS (SELECT *, CASE WHEN tse - lag(tse) OVER
      |        (PARTITION BY user_id ORDER BY ts, event_id) > 1800
      |        THEN 1 ELSE 0 END AS ns FROM e),
      |s AS (SELECT *, sum(ns) OVER (PARTITION BY user_id
      |        ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
      |        AS session_seq FROM l)
      |SELECT user_id, session_seq::BIGINT AS session_seq,
      |  min(tse) AS session_start, max(tse) AS session_end,
      |  count(*) AS n_events, round(sum(value), 2) AS sum_value
      |FROM s GROUP BY 1, 2""".stripMargin

  /** Funnel conversion-latency percentiles (q124) — ALSO the oracle of
    * q249's streaming replay: the state-derived latency report under
    * event-time-ordered batches is exact, so it must equal the batch
    * flavor's md5-keyed bottom-k gap sketch verbatim.
    */
  private lazy val q124Latency =
    """WITH e AS (SELECT user_id AS u, event_type AS ty,
      |        CAST(floor(epoch(ts)) AS BIGINT) AS t FROM events),
      |s0 AS (SELECT u, min(t) AS t FROM e WHERE ty = 'view'
      |       GROUP BY 1),
      |s1 AS (SELECT e.u, min(e.t) AS t, min(p.t) AS tp
      |       FROM e JOIN s0 p ON p.u = e.u AND e.t > p.t
      |       WHERE e.ty = 'click' GROUP BY e.u),
      |s2 AS (SELECT e.u, min(e.t) AS t, min(p.t) AS tp
      |       FROM e JOIN s1 p ON p.u = e.u AND e.t > p.t
      |       WHERE e.ty = 'purchase' GROUP BY e.u),
      |g AS (SELECT 1 AS stage_idx,
      |        (('0x' || substr(md5('1:' || u::VARCHAR), 1, 8))
      |          ::UBIGINT)::BIGINT AS hv,
      |        (t - tp)::DOUBLE AS gap FROM s1
      |      UNION ALL
      |      SELECT 2,
      |        (('0x' || substr(md5('2:' || u::VARCHAR), 1, 8))
      |          ::UBIGINT)::BIGINT,
      |        (t - tp)::DOUBLE FROM s2),
      |r AS (SELECT stage_idx, gap, row_number() OVER
      |        (PARTITION BY stage_idx ORDER BY hv, gap) AS rn
      |      FROM g),
      |sk AS (SELECT stage_idx, count(*)::INTEGER AS m,
      |         list_sort(list(gap)) AS vs
      |       FROM r WHERE rn <= 256 GROUP BY 1),
      |n AS (SELECT stage_idx, count(*)::BIGINT AS n_converted
      |      FROM g GROUP BY 1),
      |d AS (SELECT 1 AS stage_idx, 'click' AS stage
      |      UNION ALL SELECT 2, 'purchase')
      |SELECT d.stage_idx, d.stage,
      |  coalesce(n.n_converted, 0)::BIGINT AS n_converted,
      |  coalesce(sk.m, 0)::INTEGER AS m,
      |  vs[(floor(0.5 * (sk.m - 1)) + 1)::INTEGER] AS p50_gap_sec,
      |  vs[(floor(0.9 * (sk.m - 1)) + 1)::INTEGER] AS p90_gap_sec
      |FROM d LEFT JOIN sk USING (stage_idx)
      |LEFT JOIN n USING (stage_idx)""".stripMargin

  /** Residual IVFADC-R oracle (q123): q121's chain with the PQ stages
    * fed RESIDUALS — `res` subtracts the (bucketed-fold) cell centroid
    * from every vector (one IEEE subtraction per component, so the
    * doubles agree bit-for-bit with Spark's `zip_with` cast chain),
    * kmeansBody fits per-subspace codebooks on the residual slices
    * (`x -> x::DOUBLE` is a noop on the already-double lists, matching
    * Spark's noop cast), and the ADC lookup `l0`/`l1` keys on
    * (qid, CELL, code) because each probed cell re-frames the query
    * into its residual space (`qr`). ADC sum stays two IEEE additions;
    * top-40 by (adc, vid); exact cosine top-5 over the candidates
    * against the RAW embeddings exactly as in q121.
    */
  private lazy val q123 = {
    val dim = 64
    val sw = 32
    val w = 128L
    def d2(v: String, c: String, d: Int) = duckD2(v, c, d)
    val centroidCos =
      s"""(${duckDot("qv", "centroid", dim)} /
         |  (sqrt(${duckDot("qv", "qv", dim)}) *
         |   sqrt(${duckDot("centroid", "centroid", dim)})))""".stripMargin
    s"""WITH base AS (SELECT vec_id, embedding, label AS cell
       |              FROM embeddings),
       |ivp AS (SELECT cell, vec_id // $w AS bk, count(*) AS n,
       |         list_reduce(
       |           list_transform(list(embedding ORDER BY vec_id),
       |             v -> list_transform(v, x -> x::DOUBLE)),
       |           (a, c) -> list_transform(range(1, ${dim + 1}),
       |                       i -> a[i] + c[i])) AS psum
       |       FROM base GROUP BY cell, vec_id // $w),
       |ivc AS (SELECT cell, sum(n) AS n,
       |         list_reduce(list(psum ORDER BY bk),
       |           (a, c) -> list_transform(range(1, ${dim + 1}),
       |                       i -> a[i] + c[i])) AS vsum
       |       FROM ivp GROUP BY cell),
       |cen AS (SELECT cell,
       |          list_transform(vsum, s -> s / n) AS centroid
       |        FROM ivc),
       |res AS (SELECT b.vec_id, b.cell,
       |          list_transform(range(1, ${dim + 1}),
       |            i -> b.embedding[i]::DOUBLE - c.centroid[i]) AS rv
       |        FROM base b JOIN cen c ON c.cell = b.cell),
       |sub0 AS (SELECT vec_id, rv[1:$sw] AS embedding FROM res),
       |sub1 AS (SELECT vec_id, rv[${sw + 1}:$dim] AS embedding
       |         FROM res),
       |${kmeansBody(4, 2, w, sw, table = "sub0", prefix = "p0")},
       |${kmeansBody(4, 2, w, sw, table = "sub1", prefix = "p1")},
       |q AS (SELECT vec_id AS qid, embedding AS qv FROM base
       |      WHERE vec_id < 20),
       |pc AS (SELECT qid, cell,
       |         row_number() OVER (PARTITION BY qid
       |           ORDER BY $centroidCos DESC, cell) AS rn
       |       FROM q CROSS JOIN cen),
       |pr AS (SELECT qid, cell FROM pc WHERE rn <= 2),
       |qr AS (SELECT pr.qid, pr.cell,
       |         list_transform(range(1, ${dim + 1}),
       |           i -> q.qv[i]::DOUBLE - c.centroid[i]) AS rv
       |       FROM pr JOIN q USING (qid)
       |       JOIN cen c ON c.cell = pr.cell),
       |q0 AS (SELECT qid, cell, rv[1:$sw] AS qs FROM qr),
       |q1 AS (SELECT qid, cell, rv[${sw + 1}:$dim] AS qs FROM qr),
       |l0 AS (SELECT q0.qid, q0.cell, cb.cid AS code,
       |         ${d2("q0.qs", "cb.cv", sw)} AS d2
       |       FROM q0 CROSS JOIN p0cen2 cb),
       |l1 AS (SELECT q1.qid, q1.cell, cb.cid AS code,
       |         ${d2("q1.qs", "cb.cv", sw)} AS d2
       |       FROM q1 CROSS JOIN p1cen2 cb),
       |cds AS (SELECT a0.vid, a0.cid AS c0, a1.cid AS c1, b.cell
       |        FROM p0afinal a0 JOIN p1afinal a1 ON a1.vid = a0.vid
       |        JOIN base b ON b.vec_id = a0.vid),
       |adc AS (SELECT pr.qid, c.vid, l0.d2 + l1.d2 AS adc_d2
       |        FROM pr JOIN cds c ON c.cell = pr.cell
       |        JOIN l0 ON l0.qid = pr.qid AND l0.cell = pr.cell
       |          AND l0.code = c.c0
       |        JOIN l1 ON l1.qid = pr.qid AND l1.cell = pr.cell
       |          AND l1.code = c.c1),
       |ct AS (SELECT qid, vid FROM (
       |         SELECT qid, vid, row_number() OVER (PARTITION BY qid
       |           ORDER BY adc_d2, vid) AS rn FROM adc)
       |       WHERE rn <= 40),
       |rr AS (SELECT t.qid, t.vid AS cid,
       |         round(${duckDot("q.qv", "b.embedding", dim)} /
       |           (sqrt(${duckDot("q.qv", "q.qv", dim)}) *
       |            sqrt(${duckDot("b.embedding", "b.embedding", dim)})),
       |           6) AS cos_sim
       |       FROM ct t JOIN q ON q.qid = t.qid
       |       JOIN base b ON b.vec_id = t.vid),
       |rk AS (SELECT qid, cid, cos_sim,
       |        row_number() OVER (PARTITION BY qid
       |          ORDER BY cos_sim DESC, cid) AS rn FROM rr)
       |SELECT qid, (rn - 1)::INTEGER AS rank, cid AS neighbor, cos_sim
       |FROM rk WHERE rn <= 5""".stripMargin
  }

  /** OPQ-rotated residual IVFADC-R oracle (q250): q123's chain with
    * the energy-balancing permutation derived IN-SQL — per-dimension
    * milli-snapped integer residual energies (`pe`), a rank over the
    * 64 dimension rows (`rk`), the serpentine deal into m=2 subspaces
    * (`pm`), the permutation applied to corpus residuals (`rres`) and
    * to the per-cell query residuals (`qrr`) before slicing. All
    * integer or replayed-IEEE steps, so the whole rotated chain —
    * permutation derivation included — hash-matches.
    */
  private lazy val q250 = {
    val dim = 64
    val sw = 32
    val w = 128L
    def d2(v: String, c: String, d: Int) = duckD2(v, c, d)
    val centroidCos =
      s"""(${duckDot("qv", "centroid", dim)} /
         |  (sqrt(${duckDot("qv", "qv", dim)}) *
         |   sqrt(${duckDot("centroid", "centroid", dim)})))""".stripMargin
    s"""WITH base AS (SELECT vec_id, embedding, label AS cell
       |              FROM embeddings),
       |ivp AS (SELECT cell, vec_id // $w AS bk, count(*) AS n,
       |         list_reduce(
       |           list_transform(list(embedding ORDER BY vec_id),
       |             v -> list_transform(v, x -> x::DOUBLE)),
       |           (a, c) -> list_transform(range(1, ${dim + 1}),
       |                       i -> a[i] + c[i])) AS psum
       |       FROM base GROUP BY cell, vec_id // $w),
       |ivc AS (SELECT cell, sum(n) AS n,
       |         list_reduce(list(psum ORDER BY bk),
       |           (a, c) -> list_transform(range(1, ${dim + 1}),
       |                       i -> a[i] + c[i])) AS vsum
       |       FROM ivp GROUP BY cell),
       |cen AS (SELECT cell,
       |          list_transform(vsum, s -> s / n) AS centroid
       |        FROM ivc),
       |res AS (SELECT b.vec_id, b.cell,
       |          list_transform(range(1, ${dim + 1}),
       |            i -> b.embedding[i]::DOUBLE - c.centroid[i]) AS rv
       |        FROM base b JOIN cen c ON c.cell = b.cell),
       |pe AS (SELECT p.i::INT AS pos,
       |         sum((round(r.rv[p.i] * 1000.0))::BIGINT
       |           * (round(r.rv[p.i] * 1000.0))::BIGINT) AS e
       |       FROM res r, (SELECT unnest(range(1, ${dim + 1})) AS i) p
       |       GROUP BY 1),
       |rk0 AS (SELECT pos,
       |          row_number() OVER (ORDER BY e DESC, pos) - 1 AS rn
       |        FROM pe),
       |pm AS (SELECT list(pos ORDER BY np) AS perm FROM (
       |         SELECT pos,
       |           (CASE WHEN (rn // 2) % 2 = 0 THEN rn % 2
       |                 ELSE 1 - rn % 2 END) * $sw + rn // 2 AS np
       |         FROM rk0)),
       |rres AS (SELECT r.vec_id, r.cell,
       |           list_transform(range(1, ${dim + 1}),
       |             i -> r.rv[pm.perm[i]]) AS rv
       |         FROM res r, pm),
       |sub0 AS (SELECT vec_id, rv[1:$sw] AS embedding FROM rres),
       |sub1 AS (SELECT vec_id, rv[${sw + 1}:$dim] AS embedding
       |         FROM rres),
       |${kmeansBody(4, 2, w, sw, table = "sub0", prefix = "p0")},
       |${kmeansBody(4, 2, w, sw, table = "sub1", prefix = "p1")},
       |q AS (SELECT vec_id AS qid, embedding AS qv FROM base
       |      WHERE vec_id < 20),
       |pc AS (SELECT qid, cell,
       |         row_number() OVER (PARTITION BY qid
       |           ORDER BY $centroidCos DESC, cell) AS rn
       |       FROM q CROSS JOIN cen),
       |pr AS (SELECT qid, cell FROM pc WHERE rn <= 2),
       |qr0 AS (SELECT pr.qid, pr.cell,
       |          list_transform(range(1, ${dim + 1}),
       |            i -> q.qv[i]::DOUBLE - c.centroid[i]) AS rv
       |        FROM pr JOIN q USING (qid)
       |        JOIN cen c ON c.cell = pr.cell),
       |qrr AS (SELECT qid, cell,
       |          list_transform(range(1, ${dim + 1}),
       |            i -> r.rv[pm.perm[i]]) AS rv
       |        FROM qr0 r, pm),
       |q0 AS (SELECT qid, cell, rv[1:$sw] AS qs FROM qrr),
       |q1 AS (SELECT qid, cell, rv[${sw + 1}:$dim] AS qs FROM qrr),
       |l0 AS (SELECT q0.qid, q0.cell, cb.cid AS code,
       |         ${d2("q0.qs", "cb.cv", sw)} AS d2
       |       FROM q0 CROSS JOIN p0cen2 cb),
       |l1 AS (SELECT q1.qid, q1.cell, cb.cid AS code,
       |         ${d2("q1.qs", "cb.cv", sw)} AS d2
       |       FROM q1 CROSS JOIN p1cen2 cb),
       |cds AS (SELECT a0.vid, a0.cid AS c0, a1.cid AS c1, b.cell
       |        FROM p0afinal a0 JOIN p1afinal a1 ON a1.vid = a0.vid
       |        JOIN base b ON b.vec_id = a0.vid),
       |adc AS (SELECT pr.qid, c.vid, l0.d2 + l1.d2 AS adc_d2
       |        FROM pr JOIN cds c ON c.cell = pr.cell
       |        JOIN l0 ON l0.qid = pr.qid AND l0.cell = pr.cell
       |          AND l0.code = c.c0
       |        JOIN l1 ON l1.qid = pr.qid AND l1.cell = pr.cell
       |          AND l1.code = c.c1),
       |ct AS (SELECT qid, vid FROM (
       |         SELECT qid, vid, row_number() OVER (PARTITION BY qid
       |           ORDER BY adc_d2, vid) AS rn FROM adc)
       |       WHERE rn <= 40),
       |rr AS (SELECT t.qid, t.vid AS cid,
       |         round(${duckDot("q.qv", "b.embedding", dim)} /
       |           (sqrt(${duckDot("q.qv", "q.qv", dim)}) *
       |            sqrt(${duckDot("b.embedding", "b.embedding", dim)})),
       |           6) AS cos_sim
       |       FROM ct t JOIN q ON q.qid = t.qid
       |       JOIN base b ON b.vec_id = t.vid),
       |rk AS (SELECT qid, cid, cos_sim,
       |        row_number() OVER (PARTITION BY qid
       |          ORDER BY cos_sim DESC, cid) AS rn FROM rr)
       |SELECT qid, (rn - 1)::INTEGER AS rank, cid AS neighbor, cos_sim
       |FROM rk WHERE rn <= 5""".stripMargin
  }

  /** Bitext-mining oracle (q127): the q17 rounded-cosine chain over
    * the even×odd pair grid, forward/backward kNN via row_number with
    * the (cos desc, id asc) tie rule, each side's neighborhood sum as
    * a rank-ordered list_reduce of the ROUNDED cosines (bit-equal to
    * Spark's rank-ordered fold — the first 0.0±c step is exact), one
    * margin division rounded once, zero denominators CASE'd to NULL,
    * best margin per source by (margin desc, tgt asc).
    */
  private lazy val q127 = {
    val dim = 64
    val cosExpr =
      s"""round(${duckDot("s.qv", "t.cv", dim)} /
         |  (sqrt(${duckDot("s.qv", "s.qv", dim)}) *
         |   sqrt(${duckDot("t.cv", "t.cv", dim)})), 6)""".stripMargin
    s"""WITH s AS (SELECT vec_id AS qid, embedding AS qv
       |           FROM embeddings WHERE vec_id % 2 = 0),
       |t AS (SELECT vec_id AS cid, embedding AS cv
       |      FROM embeddings WHERE vec_id % 2 = 1),
       |p AS (SELECT s.qid, t.cid, $cosExpr AS cos
       |      FROM s CROSS JOIN t),
       |fw AS (SELECT qid, cid, cos, row_number() OVER
       |         (PARTITION BY qid ORDER BY cos DESC, cid) AS rn
       |       FROM p),
       |fk AS (SELECT * FROM fw WHERE rn <= 4),
       |ax AS (SELECT qid,
       |         list_reduce(list(cos ORDER BY rn), (a, b) -> a + b)
       |           / ((2 * count(*))::DOUBLE) AS dx
       |       FROM fk GROUP BY qid),
       |bw AS (SELECT qid, cid, cos, row_number() OVER
       |         (PARTITION BY cid ORDER BY cos DESC, qid) AS rn
       |       FROM p),
       |bk AS (SELECT * FROM bw WHERE rn <= 4),
       |ay AS (SELECT cid,
       |         list_reduce(list(cos ORDER BY rn), (a, b) -> a + b)
       |           / ((2 * count(*))::DOUBLE) AS dy
       |       FROM bk GROUP BY cid),
       |m AS (SELECT fk.qid, fk.cid, fk.cos,
       |        CASE WHEN (ax.dx + ay.dy) != 0
       |          THEN round(fk.cos / (ax.dx + ay.dy), 6) END AS margin
       |      FROM fk JOIN ax USING (qid) JOIN ay USING (cid)),
       |f AS (SELECT qid, cid, cos, margin, row_number() OVER
       |        (PARTITION BY qid ORDER BY margin DESC, cid) AS rn
       |      FROM m WHERE margin IS NOT NULL AND margin >= 0)
       |SELECT qid AS src_id, cid AS tgt_id, cos AS cos_sim, margin
       |FROM f WHERE rn = 1""".stripMargin
  }

  /** Embedding-drift oracle (q122): per-label bucketed-mean folds (the
    * q27 centroid CTEs) over the base embeddings and the deterministic
    * v2 snapshot, mean-vs-mean cosine via the q17 chain.
    */
  private lazy val q122 = {
    val dim = 64
    val w = 128L
    def meanCtes(table: String, p: String, nCol: String) =
      s"""${p}p AS (SELECT label, vec_id // $w AS bk, count(*) AS n,
         |         list_reduce(
         |           list_transform(list(embedding ORDER BY vec_id),
         |             v -> list_transform(v, x -> x::DOUBLE)),
         |           (a, c) -> list_transform(range(1, ${dim + 1}),
         |                       i -> a[i] + c[i])) AS psum
         |       FROM $table GROUP BY label, vec_id // $w),
         |${p}c AS (SELECT label, sum(n) AS $nCol,
         |         list_reduce(list(psum ORDER BY bk),
         |           (a, c) -> list_transform(range(1, ${dim + 1}),
         |                       i -> a[i] + c[i])) AS vsum
         |       FROM ${p}p GROUP BY label),
         |${p}m AS (SELECT label, $nCol,
         |          list_transform(vsum, s -> s / $nCol) AS m
         |        FROM ${p}c)""".stripMargin
    s"""WITH v2 AS (SELECT vec_id, label,
       |         CASE WHEN vec_id % 7 = 0 THEN list_reverse(embedding)
       |              ELSE embedding END AS embedding
       |       FROM embeddings WHERE vec_id % 5 != 0),
       |${meanCtes("embeddings", "o", "n_old")},
       |${meanCtes("v2", "nw", "n_new")}
       |SELECT coalesce(om.label, nwm.label) AS label,
       |  coalesce(om.n_old, 0)::BIGINT AS n_old,
       |  coalesce(nwm.n_new, 0)::BIGINT AS n_new,
       |  round(${duckDot("om.m", "nwm.m", dim)} /
       |    (sqrt(${duckDot("om.m", "om.m", dim)}) *
       |     sqrt(${duckDot("nwm.m", "nwm.m", dim)})), 6) AS mean_cos
       |FROM om FULL OUTER JOIN nwm ON om.label = nwm.label""".stripMargin
  }

  /** Containment oracle (q251): the q33 candidate CTEs with BOTH
    * asymmetric containments (`|A∩B|/|A|`, `|A∩B|/|B|`) beside the
    * symmetric Jaccard — same distinct-set arithmetic, same
    * greatest(…,1) empty guard.
    */
  private lazy val q251 =
    s"""$lshCandCtes
       |SELECT ia AS id_a, ib AS id_b,
       |  round(
       |    len(list_filter(list_distinct(sa.sh),
       |      x -> list_contains(sb.sh, x)))::DOUBLE /
       |    greatest(len(list_distinct(sa.sh)), 1), 6) AS cont_a_in_b,
       |  round(
       |    len(list_filter(list_distinct(sb.sh),
       |      x -> list_contains(sa.sh, x)))::DOUBLE /
       |    greatest(len(list_distinct(sb.sh)), 1), 6) AS cont_b_in_a,
       |  round(
       |    len(list_filter(list_distinct(sa.sh),
       |      x -> list_contains(sb.sh, x)))::DOUBLE /
       |    greatest(len(list_distinct(sa.sh || sb.sh)), 1), 6) AS jaccard
       |FROM cand
       |JOIN s sa ON sa.doc_id = ia
       |JOIN s sb ON sb.doc_id = ib""".stripMargin

  /** Exact-Jaccard oracle: the shared candidate CTEs, then distinct-set
    * intersection / union sizes over the shingle arrays (the same
    * distinct semantics as Spark's array_intersect/array_union, with the
    * same greatest(…,1) guard for the empty∪empty pair).
    */
  private val q33 =
    s"""$lshCandCtes
       |SELECT ia AS id_a, ib AS id_b,
       |  round(
       |    len(list_filter(list_distinct(sa.sh),
       |      x -> list_contains(sb.sh, x)))::DOUBLE /
       |    greatest(len(list_distinct(sa.sh || sb.sh)), 1), 6) AS jaccard
       |FROM cand
       |JOIN s sa ON sa.doc_id = ia
       |JOIN s sb ON sb.doc_id = ib""".stripMargin

  /** Embedding-cosine near-dup oracle: single-bucket hyperplane join
    * (bucketExpr replays the planes), rounded cosine, threshold 0.4.
    */
  private val q34 = {
    val dim = 64
    s"""WITH e AS (SELECT vec_id, embedding,
       |             ${bucketExpr("embedding", 6, dim)} AS bucket
       |           FROM embeddings)
       |, p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |    round(${duckDot("a.embedding", "b.embedding", dim)} /
       |      (sqrt(${duckDot("a.embedding", "a.embedding", dim)}) *
       |       sqrt(${duckDot("b.embedding", "b.embedding", dim)})), 6)
       |      AS cos_sim
       |  FROM e a JOIN e b
       |    ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
       |SELECT DISTINCT id_a, id_b, cos_sim FROM p
       |WHERE cos_sim >= 0.4""".stripMargin
  }

  /** BPE-ish token-estimate oracle: the same regex mark-then-split, with
    * chr(1) as the marker (Spark uses U+0000; either works — the corpus
    * contains neither control char, so the token sets are identical).
    * Whitespace is the explicit `[ \t\n\f\r]` class on BOTH engines
    * (Java `\s` and RE2 `\s` disagree on U+000B vertical tab).
    */
  private val q35 =
    s"""SELECT doc_id,
       |  len(string_split(text, ' '))::INTEGER AS n_tokens_ws,
       |  len(list_filter(string_split_regex(
       |    regexp_replace(text,
       |      '([A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\f\\r])',
       |      '\\1' || chr(1), 'g'),
       |    chr(1) || '|[ \\t\\n\\f\\r]+'), t -> len(t) > 0))::INTEGER
       |    AS n_tokens_bpe
       |FROM documents""".stripMargin

  private val langCase = {
    def score(markers: Seq[String]): String = {
      val set = markers.map(m => s"'$m'").mkString(", ")
      s"len(list_filter(w, t -> t IN ($set)))"
    }
    val scores = TextOps.langMarkers.map { case (l, m) => l -> score(m) }
    val best = scores.map(_._2).reduceLeft((a, b) => s"greatest($a, $b)")
    val chain = scores.map { case (l, s) =>
      s"WHEN $s > 0 AND $s = $best THEN '$l'"
    }.mkString(" ")
    s"CASE $chain ELSE 'und' END"
  }

  /** Stopword count over a token-list column `w` — shared by q20/q56. */
  private val nStopExpr = {
    val set = TextOps.stopwords.map(m => s"'$m'").mkString(", ")
    s"len(list_filter(w, t -> t IN ($set)))"
  }

  /** The composite quality score over a token-list column `w` (replays
    * [[TextOps.qualityScore]]'s exact arithmetic) — shared by q20/q56.
    */
  private val qualityExpr =
    s"""round(least(len(w) / 100.0, 1.0) *
       |    (0.5 + 0.5 * least(($nStopExpr::DOUBLE / greatest(len(w), 1)) * 5.0,
       |      1.0)), 6)""".stripMargin

  private val q20 =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
       |SELECT doc_id,
       |  $langCase AS lang_pred,
       |  ($nStopExpr)::INTEGER AS n_stopwords,
       |  $qualityExpr AS quality
       |FROM t""".stripMargin

  /** Canonical-doc selection oracle: q29's cluster CTEs + q20's quality
    * arithmetic + the (quality desc, id asc) per-cluster argmax. The
    * minhash chain's `t` CTE already carries the token list `w`.
    */
  private val q56 =
    s"""$clusterCtes,
       |q AS (SELECT doc_id, $qualityExpr AS quality FROM t),
       |j AS (SELECT cl.doc_id, cl.cluster, q.quality,
       |        row_number() OVER (PARTITION BY cl.cluster
       |          ORDER BY q.quality DESC, cl.doc_id) AS rn
       |      FROM cl JOIN q USING (doc_id))
       |SELECT doc_id, cluster, quality FROM j WHERE rn = 1""".stripMargin

  /** Clean-corpus cascade CTE chain, shared by q57 (survivors) and q99
    * (per-doc removal audit): quality + dup-ratio filters → exact
    * dedup (min id per text) → the near-dup pipeline REBASED onto the
    * surviving rows (`lshCandBody("kept1")`) → recursive-CTE clusters →
    * min-id reps → 5-gram decontamination of the reps. Mirrors
    * [[graft.text.Pipeline.cleanCorpus]] stage for stage.
    */
  private val cleanCascadeCtes = {
    val gram5 =
      """unnest(list_transform(range(1, len(w) - 3),
        |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
        |             w[i+3] || ' ' || w[i+4])) AS gram""".stripMargin
    s"""WITH RECURSIVE bw AS (
       |  SELECT d.*, string_split(text, ' ') AS w FROM documents d
       |  WHERE doc_id % 50 != 0),
       |bs AS (
       |  SELECT bw.*, list_transform(range(1, len(w) - 1),
       |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS sh0 FROM bw),
       |kept0 AS (
       |  SELECT * FROM bs
       |  WHERE $qualityExpr >= 0.3
       |    AND round((len(sh0) - len(list_distinct(sh0)))::DOUBLE /
       |          greatest(len(sh0), 1), 6) <= 0.01),
       |ex AS (SELECT min(doc_id) AS doc_id FROM kept0 GROUP BY text),
       |kept1 AS (SELECT k.* FROM kept0 k JOIN ex USING (doc_id)),
       |${lshCandBody("kept1")},
       |p AS (SELECT ia, ib FROM cand
       |      JOIN g ga ON ga.doc_id = ia
       |      JOIN g gb ON gb.doc_id = ib
       |      WHERE $agreeExpr / 32.0 >= 0.5),
       |e AS (SELECT ia AS s, ib AS t FROM p
       |      UNION SELECT ib, ia FROM p),
       |r AS (SELECT doc_id AS s, doc_id AS t FROM kept1
       |      UNION SELECT r.s, e.t FROM r JOIN e ON r.t = e.s),
       |cl AS (SELECT s AS doc_id, min(t) AS cluster FROM r GROUP BY s),
       |reps AS (SELECT doc_id FROM cl WHERE doc_id = cluster),
       |tg AS (SELECT t.doc_id, $gram5
       |       FROM t JOIN reps USING (doc_id)),
       |ew AS (SELECT string_split(text, ' ') AS w FROM documents
       |       WHERE doc_id % 50 = 0),
       |eg AS (SELECT DISTINCT $gram5 FROM ew),
       |cont AS (SELECT DISTINCT tg.doc_id FROM tg JOIN eg USING (gram))
       |""".stripMargin
  }

  private val q57 =
    s"""$cleanCascadeCtes
       |SELECT doc_id, lang, source, n_chars FROM kept1
       |WHERE doc_id IN (SELECT doc_id FROM reps)
       |  AND doc_id NOT IN (SELECT doc_id FROM cont)""".stripMargin

  /** Per-doc removal audit (q99): first cascade tier that removed each
    * training doc, replayed off the q57 CTE chain's stage sets.
    */
  private val q99 =
    s"""$cleanCascadeCtes
       |SELECT d.doc_id,
       |  CASE
       |    WHEN d.doc_id NOT IN (SELECT doc_id FROM kept0) THEN 'quality'
       |    WHEN d.doc_id NOT IN (SELECT doc_id FROM kept1) THEN 'exact'
       |    WHEN d.doc_id NOT IN (SELECT doc_id FROM reps) THEN 'near_dup'
       |    WHEN d.doc_id IN (SELECT doc_id FROM cont) THEN 'contaminated'
       |    ELSE 'kept' END AS verdict
       |FROM (SELECT doc_id FROM documents WHERE doc_id % 50 != 0) d""".stripMargin

  /** Deterministic-Lloyd k-means CTE chain (no leading WITH): id-seeded
    * cen0 → `iters` assign/update rounds with the bounded two-level
    * id-ordered fold mean (replays [[graft.sim.SimSearch.meanVectors]]:
    * `vec_id // w` bucket partials in id order, then partials in bucket
    * order; empty clusters keep the old centroid) → a final `afinal`
    * (vid, cid, d2) assignment. Shared by q48 (assignments) and q58
    * (SemDedup blocking cells).
    */
  private def kmeansBody(k: Int, iters: Int, w: Long, dim: Int,
      table: String = "embeddings", prefix: String = ""): String = {
    def d2(v: String, c: String) = duckD2(v, c, dim)
    def assignCte(name: String, cen: String) =
      s"""$name AS (SELECT vid, cid, d2 FROM (
         |  SELECT vid, cid, d2, row_number() OVER
         |    (PARTITION BY vid ORDER BY d2, cid) AS rn
         |  FROM (SELECT e.vec_id AS vid, c.cid AS cid,
         |          ${d2("e.embedding", "c.cv")} AS d2
         |        FROM $table e CROSS JOIN $cen c))
         |  WHERE rn = 1)""".stripMargin
    def updateCte(s: String, u: String, cenNew: String,
        a: String, cenOld: String) =
      s"""$s AS (SELECT a.cid, e.vec_id // $w AS bk, count(*) AS n,
         |        list_reduce(
         |          list_transform(list(e.embedding ORDER BY e.vec_id),
         |            v -> list_transform(v, x -> x::DOUBLE)),
         |          (acc, c) -> list_transform(range(1, ${dim + 1}),
         |                        i -> acc[i] + c[i])) AS psum
         |      FROM $a a JOIN $table e ON e.vec_id = a.vid
         |      GROUP BY a.cid, e.vec_id // $w),
         |${s}t AS (SELECT cid, sum(n) AS n,
         |        list_reduce(list(psum ORDER BY bk),
         |          (acc, c) -> list_transform(range(1, ${dim + 1}),
         |                        i -> acc[i] + c[i])) AS vsum
         |      FROM $s GROUP BY cid),
         |$u AS (SELECT cid, list_transform(vsum, sm -> sm / n) AS cv
         |       FROM ${s}t),
         |$cenNew AS (SELECT c.cid, coalesce(u.cv, c.cv) AS cv
         |        FROM $cenOld c LEFT JOIN $u u USING (cid))""".stripMargin
    val p = prefix
    val rounds = (0 until iters).map { r =>
      assignCte(s"${p}a$r", s"${p}cen$r") + ",\n" +
        updateCte(s"${p}s$r", s"${p}u$r", s"${p}cen${r + 1}",
          s"${p}a$r", s"${p}cen$r")
    }.mkString(",\n")
    s"""${p}cen0 AS (SELECT vec_id AS cid,
       |        list_transform(embedding, x -> x::DOUBLE) AS cv
       |      FROM $table ORDER BY vec_id LIMIT $k),
       |$rounds,
       |${assignCte(s"${p}afinal", s"${p}cen$iters")}""".stripMargin
  }

  /** q78's BM25 SQL over a parameterizable corpus relation — also the
    * oracle of q290 (persisted-index serving must equal in-memory BM25
    * over the same corpus) and q291 (tombstoned serving must equal
    * in-memory BM25 over the SURVIVING corpus). */
  private def bm25Sql(rel: String): String =
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w
         |           FROM $rel),
         |ix AS (SELECT doc_id, greatest(len(w), 0) AS dl,
         |        unnest(w) AS term FROM d),
         |tf AS (SELECT doc_id, term, count(*) AS tf, min(dl) AS dl
         |       FROM ix GROUP BY doc_id, term),
         |st AS (SELECT count(*)::BIGINT AS n,
         |        (sum(dl)::DOUBLE / count(*)::DOUBLE) AS avgdl
         |       FROM (SELECT doc_id, min(dl) AS dl FROM tf
         |             GROUP BY doc_id)),
         |dfq AS (SELECT term, count(*) AS dfc FROM tf GROUP BY term),
         |idf AS (SELECT term,
         |        round(ln(((n - dfc)::DOUBLE + 0.5) /
         |          (dfc::DOUBLE + 0.5) + 1.0) * 1000000.0)::BIGINT
         |          AS idf_micro
         |       FROM dfq, st),
         |q AS (SELECT * FROM (VALUES
         |        (1::BIGINT, 'spark'), (1, 'join'), (1, 'window'),
         |        (2, 'slow'), (2, 'query'), (2, 'filter'),
         |        (3, 'customer'), (3, 'order'), (3, 'the'))
         |        AS v(query_id, term)),
         |qi AS (SELECT q.query_id, q.term, idf.idf_micro
         |       FROM q JOIN idf USING (term)),
         |sc AS (SELECT qi.query_id, tf.doc_id,
         |        (qi.idf_micro *
         |         round(((tf.tf::DOUBLE * ${1.2 + 1.0}) /
         |           (tf.tf::DOUBLE + ${1.2} * (${1.0 - 0.75} +
         |            ${0.75} * (tf.dl::DOUBLE / st.avgdl))))
         |           * 1000000.0)::BIGINT) AS s
         |       FROM tf JOIN qi USING (term), st),
         |ag AS (SELECT query_id, doc_id, sum(s)::BIGINT AS score_pico
         |       FROM sc GROUP BY query_id, doc_id),
         |r AS (SELECT query_id, doc_id, score_pico,
         |        row_number() OVER (PARTITION BY query_id
         |          ORDER BY score_pico DESC, doc_id ASC) AS rn FROM ag)
         |SELECT query_id, doc_id, rn::INTEGER AS rank, score_pico
         |FROM r WHERE rn <= 10""".stripMargin

  /** q296's logistic-fit SQL — nested as a CTE by q297's serving
    * oracle. */
  private val q296LogisticSql: String =
    """WITH t AS (SELECT doc_id,
        |    CASE WHEN text LIKE '%data%' THEN 1 ELSE 0 END AS y,
        |    string_split(text, ' ') AS w
        |  FROM documents),
        |n AS (SELECT count(*)::BIGINT AS n FROM t),
        |e AS (SELECT doc_id, u.tok FROM t, unnest(w) AS u(tok)),
        |hh AS (SELECT doc_id,
        |    (('0x' || substr(md5('hf:' || tok), 1, 8))
        |      ::UBIGINT)::BIGINT AS hv
        |  FROM e),
        |f AS (SELECT * FROM (
        |    SELECT doc_id, hv % 8 AS idx,
        |      sum(CASE WHEN (hv // 65536) % 2 = 0 THEN 1 ELSE -1 END)
        |        ::BIGINT AS x
        |    FROM hh GROUP BY 1, 2) WHERE x <> 0),
        |dims AS (SELECT unnest(range(0, 8)) AS idx),
        |r1 AS (SELECT doc_id,
        |    (round((y::DOUBLE - 1.0 / (1.0 + exp(-(0)::DOUBLE
        |      / 1000000.0))) * 1000000.0))::BIGINT AS r
        |  FROM t),
        |g1 AS (SELECT idx, sum(x * r)::BIGINT AS g
        |  FROM f JOIN r1 USING (doc_id) GROUP BY 1),
        |b1 AS (SELECT sum(r)::BIGINT AS g FROM r1),
        |w1d AS (SELECT d.idx,
        |    coalesce((round(1.0 * g1.g::DOUBLE / n.n::DOUBLE))
        |      ::BIGINT, 0) AS wm
        |  FROM dims d CROSS JOIN n LEFT JOIN g1 ON g1.idx = d.idx),
        |w1b AS (SELECT (round(1.0 * b1.g::DOUBLE / n.n::DOUBLE))
        |    ::BIGINT AS wm FROM b1, n),
        |dot2 AS (SELECT f.doc_id, sum(f.x * w1d.wm)::BIGINT AS dot
        |  FROM f JOIN w1d ON w1d.idx = f.idx GROUP BY 1),
        |r2 AS (SELECT t.doc_id,
        |    (round((t.y::DOUBLE - 1.0 / (1.0 +
        |      exp(-(coalesce(dot2.dot, 0) + w1b.wm)::DOUBLE
        |        / 1000000.0))) * 1000000.0))::BIGINT AS r
        |  FROM t LEFT JOIN dot2 USING (doc_id) CROSS JOIN w1b),
        |g2 AS (SELECT idx, sum(x * r)::BIGINT AS g
        |  FROM f JOIN r2 USING (doc_id) GROUP BY 1),
        |b2 AS (SELECT sum(r)::BIGINT AS g FROM r2)
        |SELECT w1d.idx::BIGINT AS idx,
        |  (w1d.wm + coalesce((round(1.0 * g2.g::DOUBLE
        |    / n.n::DOUBLE))::BIGINT, 0))::BIGINT AS w_micro
        |FROM w1d CROSS JOIN n LEFT JOIN g2 ON g2.idx = w1d.idx
        |UNION ALL
        |SELECT (-1)::BIGINT AS idx,
        |  (w1b.wm + (round(1.0 * b2.g::DOUBLE / n.n::DOUBLE))
        |    ::BIGINT)::BIGINT AS w_micro
        |FROM w1b, b2, n""".stripMargin

  /** The q296 hashed-feature logistic chain parameterized by CTE
    * prefix, source relation, and label expression — q327's AIPW
    * oracle fits THREE of these (propensity on the corpus, outcome
    * on each arm). Identical arithmetic to [[q296LogisticSql]]
    * (dim 8, two GD rounds, micro-snapped residuals); emits CTEs
    * ending in `<p>wts(idx, w_micro)`.
    */
  private def hashedLogisticCtes(p: String, rel: String,
      label: String): String =
    s"""${p}t AS (SELECT doc_id, $label AS y,
       |    string_split(text, ' ') AS w
       |  FROM $rel),
       |${p}n AS (SELECT count(*)::BIGINT AS n FROM ${p}t),
       |${p}e AS (SELECT doc_id, u.tok FROM ${p}t, unnest(w)
       |  AS u(tok)),
       |${p}hh AS (SELECT doc_id,
       |    (('0x' || substr(md5('hf:' || tok), 1, 8))
       |      ::UBIGINT)::BIGINT AS hv
       |  FROM ${p}e),
       |${p}f AS (SELECT * FROM (
       |    SELECT doc_id, hv % 8 AS idx,
       |      sum(CASE WHEN (hv // 65536) % 2 = 0 THEN 1 ELSE -1 END)
       |        ::BIGINT AS x
       |    FROM ${p}hh GROUP BY 1, 2) WHERE x <> 0),
       |${p}dims AS (SELECT unnest(range(0, 8)) AS idx),
       |${p}r1 AS (SELECT doc_id,
       |    (round((y::DOUBLE - 1.0 / (1.0 + exp(-(0)::DOUBLE
       |      / 1000000.0))) * 1000000.0))::BIGINT AS r
       |  FROM ${p}t),
       |${p}g1 AS (SELECT idx, sum(x * r)::BIGINT AS g
       |  FROM ${p}f JOIN ${p}r1 USING (doc_id) GROUP BY 1),
       |${p}b1 AS (SELECT sum(r)::BIGINT AS g FROM ${p}r1),
       |${p}w1d AS (SELECT d.idx,
       |    coalesce((round(1.0 * g1.g::DOUBLE / n.n::DOUBLE))
       |      ::BIGINT, 0) AS wm
       |  FROM ${p}dims d CROSS JOIN ${p}n n
       |  LEFT JOIN ${p}g1 g1 ON g1.idx = d.idx),
       |${p}w1b AS (SELECT (round(1.0 * b1.g::DOUBLE / n.n::DOUBLE))
       |    ::BIGINT AS wm FROM ${p}b1 b1, ${p}n n),
       |${p}dot2 AS (SELECT f.doc_id, sum(f.x * w1d.wm)::BIGINT
       |      AS dot
       |  FROM ${p}f f JOIN ${p}w1d w1d ON w1d.idx = f.idx
       |  GROUP BY 1),
       |${p}r2 AS (SELECT t.doc_id,
       |    (round((t.y::DOUBLE - 1.0 / (1.0 +
       |      exp(-(coalesce(dot2.dot, 0) + w1b.wm)::DOUBLE
       |        / 1000000.0))) * 1000000.0))::BIGINT AS r
       |  FROM ${p}t t LEFT JOIN ${p}dot2 dot2 USING (doc_id)
       |  CROSS JOIN ${p}w1b w1b),
       |${p}g2 AS (SELECT idx, sum(x * r)::BIGINT AS g
       |  FROM ${p}f f JOIN ${p}r2 USING (doc_id) GROUP BY 1),
       |${p}b2 AS (SELECT sum(r)::BIGINT AS g FROM ${p}r2),
       |${p}wts AS (SELECT w1d.idx::BIGINT AS idx,
       |    (w1d.wm + coalesce((round(1.0 * g2.g::DOUBLE
       |      / n.n::DOUBLE))::BIGINT, 0))::BIGINT AS w_micro
       |  FROM ${p}w1d w1d CROSS JOIN ${p}n n
       |  LEFT JOIN ${p}g2 g2 ON g2.idx = w1d.idx
       |  UNION ALL
       |  SELECT (-1)::BIGINT AS idx,
       |    (w1b.wm + (round(1.0 * b2.g::DOUBLE / n.n::DOUBLE))
       |      ::BIGINT)::BIGINT AS w_micro
       |  FROM ${p}w1b w1b, ${p}b2 b2, ${p}n n)""".stripMargin

  /** Score the full corpus's shared features (`af`) against a
    * `<p>wts` weight table — the q297 scoring CTE parameterized.
    * Emits CTEs ending in `<p>sc(doc_id, s)`.
    */
  private def hashedScoreCtes(p: String): String =
    s"""${p}dot AS (SELECT af.doc_id, sum(af.x * w.w_micro)::BIGINT
       |      AS dot
       |  FROM af JOIN ${p}wts w ON w.idx = af.idx AND w.idx >= 0
       |  GROUP BY 1),
       |${p}b AS (SELECT w_micro AS b FROM ${p}wts WHERE idx = -1),
       |${p}sc AS (SELECT at.doc_id,
       |    (round(1000000.0 / (1.0 +
       |      exp(-(coalesce(d.dot, 0) + b.b)::DOUBLE
       |        / 1000000.0))))::BIGINT AS s
       |  FROM at LEFT JOIN ${p}dot d USING (doc_id)
       |  CROSS JOIN ${p}b b)""".stripMargin

  /** q327: AIPW — three logistic fits, three scorings, the
    * augmented-IPW fold with the clipped propensity.
    */
  private val q327AipwSql: String = {
    val tExpr = "CASE WHEN text LIKE '%data%' THEN 1 ELSE 0 END"
    val yExpr = "CASE WHEN n_chars > 300 THEN 1 ELSE 0 END"
    s"""WITH ${hashedLogisticCtes("pe", "documents", tExpr)},
       |${hashedLogisticCtes("p1",
         "documents WHERE text LIKE '%data%'", yExpr)},
       |${hashedLogisticCtes("p0",
         "documents WHERE NOT (text LIKE '%data%')", yExpr)},
       |at AS (SELECT doc_id, $tExpr AS tt, $yExpr AS y,
       |    string_split(text, ' ') AS w
       |  FROM documents),
       |ae AS (SELECT doc_id, u.tok FROM at, unnest(w) AS u(tok)),
       |ahh AS (SELECT doc_id,
       |    (('0x' || substr(md5('hf:' || tok), 1, 8))
       |      ::UBIGINT)::BIGINT AS hv
       |  FROM ae),
       |af AS (SELECT * FROM (
       |    SELECT doc_id, hv % 8 AS idx,
       |      sum(CASE WHEN (hv // 65536) % 2 = 0 THEN 1 ELSE -1 END)
       |        ::BIGINT AS x
       |    FROM ahh GROUP BY 1, 2) WHERE x <> 0),
       |${hashedScoreCtes("pe")},
       |${hashedScoreCtes("p1")},
       |${hashedScoreCtes("p0")},
       |aall AS (SELECT at.doc_id, at.tt, at.y,
       |    least(greatest(se.s, 10000), 990000)::BIGINT AS ee,
       |    s1.s AS m1, s0.s AS m0
       |  FROM at JOIN pesc se USING (doc_id)
       |  JOIN p1sc s1 USING (doc_id) JOIN p0sc s0 USING (doc_id)),
       |aterms AS (SELECT tt, m1, m0,
       |    CASE WHEN tt = 1 THEN (round((y * 1000000 - m1)::DOUBLE
       |      / ee::DOUBLE * 1000000.0))::BIGINT ELSE 0 END AS c1,
       |    CASE WHEN tt = 0 THEN (round((y * 1000000 - m0)::DOUBLE
       |      / (1000000 - ee)::DOUBLE * 1000000.0))::BIGINT
       |      ELSE 0 END AS c0
       |  FROM aall),
       |am AS (SELECT count(*)::BIGINT AS n, sum(tt)::BIGINT
       |      AS n_treated,
       |    sum(m1 + c1)::BIGINT AS s1, sum(m0 + c0)::BIGINT AS s0
       |  FROM aterms)
       |SELECT n, n_treated,
       |  (round(s1::DOUBLE / n::DOUBLE))::BIGINT AS mu1_micro,
       |  (round(s0::DOUBLE / n::DOUBLE))::BIGINT AS mu0_micro,
       |  (round((s1 - s0)::DOUBLE / n::DOUBLE))::BIGINT AS ate_micro
       |FROM am""".stripMargin
  }

  /** q278's log-rank SQL — wrapped by q302's hazard-ratio oracle. */
  private val q278LogRankSql: String =
    """WITH d AS (SELECT user_id AS u,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS dd,
        |    (user_id % 2 = 0) AS ga
        |  FROM events),
        |us AS (SELECT u, min(dd) AS f, max(dd) AS l,
        |    bool_or(ga) AS a
        |  FROM d GROUP BY 1),
        |h AS (SELECT max(l) AS h FROM us),
        |lt AS (SELECT (us.l - us.f + 1)::BIGINT AS t_day,
        |    (CASE WHEN us.l = h.h THEN 1 ELSE 0 END)::BIGINT AS cens,
        |    us.a
        |  FROM us, h),
        |pt AS (SELECT t_day, count(*)::BIGINT AS ends,
        |    sum(CASE WHEN a THEN 1 ELSE 0 END)::BIGINT AS ends_a,
        |    (count(*) - sum(cens))::BIGINT AS dt,
        |    sum(CASE WHEN a AND cens = 0 THEN 1 ELSE 0 END)::BIGINT
        |      AS da
        |  FROM lt GROUP BY 1),
        |tot AS (SELECT sum(ends)::BIGINT AS n,
        |    sum(ends_a)::BIGINT AS na FROM pt),
        |ar AS (SELECT pt.*,
        |    (tot.n - coalesce(sum(ends) OVER (ORDER BY t_day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))
        |      ::BIGINT AS rn,
        |    (tot.na - coalesce(sum(ends_a) OVER (ORDER BY t_day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))
        |      ::BIGINT AS rna
        |  FROM pt, tot),
        |terms AS (SELECT da,
        |    (round(dt::DOUBLE * (rna::DOUBLE / rn::DOUBLE)
        |      * 1000000.0))::BIGINT AS e,
        |    CASE WHEN rn <= 1 THEN 0 ELSE
        |      (round(dt::DOUBLE * (rna::DOUBLE / rn::DOUBLE) *
        |        (1.0 - rna::DOUBLE / rn::DOUBLE) *
        |        (rn - dt)::DOUBLE / (rn - 1)::DOUBLE * 1000000.0))
        |        ::BIGINT END AS v
        |  FROM ar WHERE dt > 0),
        |m AS (SELECT coalesce(sum(da), 0)::BIGINT AS o_a,
        |    coalesce(sum(e), 0)::BIGINT AS e_a_micro,
        |    coalesce(sum(v), 0)::BIGINT AS v_micro
        |  FROM terms),
        |c AS (SELECT count(*)::BIGINT AS n_users,
        |    sum(CASE WHEN a THEN 1 ELSE 0 END)::BIGINT AS n_a
        |  FROM us)
        |SELECT n_users, n_a, o_a, e_a_micro, v_micro,
        |  CASE WHEN v_micro <= 0 THEN NULL ELSE
        |    (round(((o_a * 1000000 - e_a_micro)::DOUBLE / 1000000.0)
        |      / sqrt(v_micro::DOUBLE / 1000000.0) * 1000000.0))
        |      ::BIGINT END AS z_micro,
        |  CASE WHEN v_micro <= 0 THEN NULL ELSE
        |    (round((((o_a * 1000000 - e_a_micro)::DOUBLE / 1000000.0)
        |      / sqrt(v_micro::DOUBLE / 1000000.0)) *
        |      (((o_a * 1000000 - e_a_micro)::DOUBLE / 1000000.0)
        |      / sqrt(v_micro::DOUBLE / 1000000.0)) * 1000000.0))
        |      ::BIGINT END AS chi2_micro
        |FROM c, m""".stripMargin

  /** q308: the q278 log-rank SQL with one more GROUP BY / PARTITION
    * BY key (the stratum) — moments summed across strata, then the
    * pooled z/χ² and one-step Pike HR chains.
    */
  private val q308StratifiedSql: String =
    """WITH d AS (SELECT user_id AS u,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS dd,
        |    (user_id % 2 = 0) AS ga,
        |    (user_id % 5)::BIGINT AS st
        |  FROM events),
        |us AS (SELECT u, min(dd) AS f, max(dd) AS l,
        |    bool_or(ga) AS a, max(st) AS st
        |  FROM d GROUP BY 1),
        |h AS (SELECT max(l) AS h FROM us),
        |lt AS (SELECT us.st, (us.l - us.f + 1)::BIGINT AS t_day,
        |    (CASE WHEN us.l = h.h THEN 1 ELSE 0 END)::BIGINT AS cens,
        |    us.a
        |  FROM us, h),
        |pt AS (SELECT st, t_day, count(*)::BIGINT AS ends,
        |    sum(CASE WHEN a THEN 1 ELSE 0 END)::BIGINT AS ends_a,
        |    (count(*) - sum(cens))::BIGINT AS dt,
        |    sum(CASE WHEN a AND cens = 0 THEN 1 ELSE 0 END)::BIGINT
        |      AS da
        |  FROM lt GROUP BY 1, 2),
        |tot AS (SELECT st, sum(ends)::BIGINT AS n,
        |    sum(ends_a)::BIGINT AS na FROM pt GROUP BY 1),
        |ar AS (SELECT pt.*,
        |    (tot.n - coalesce(sum(ends) OVER (PARTITION BY pt.st
        |      ORDER BY t_day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))
        |      ::BIGINT AS rn,
        |    (tot.na - coalesce(sum(ends_a) OVER (PARTITION BY pt.st
        |      ORDER BY t_day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))
        |      ::BIGINT AS rna
        |  FROM pt JOIN tot USING (st)),
        |terms AS (SELECT da,
        |    (round(dt::DOUBLE * (rna::DOUBLE / rn::DOUBLE)
        |      * 1000000.0))::BIGINT AS e,
        |    CASE WHEN rn <= 1 THEN 0 ELSE
        |      (round(dt::DOUBLE * (rna::DOUBLE / rn::DOUBLE) *
        |        (1.0 - rna::DOUBLE / rn::DOUBLE) *
        |        (rn - dt)::DOUBLE / (rn - 1)::DOUBLE * 1000000.0))
        |        ::BIGINT END AS v
        |  FROM ar WHERE dt > 0),
        |m AS (SELECT coalesce(sum(da), 0)::BIGINT AS o_a,
        |    coalesce(sum(e), 0)::BIGINT AS e_a_micro,
        |    coalesce(sum(v), 0)::BIGINT AS v_micro
        |  FROM terms),
        |c AS (SELECT count(*)::BIGINT AS n_users,
        |    sum(CASE WHEN a THEN 1 ELSE 0 END)::BIGINT AS n_a,
        |    count(DISTINCT st)::BIGINT AS n_strata
        |  FROM us)
        |SELECT n_users, n_a, n_strata, o_a, e_a_micro, v_micro,
        |  CASE WHEN v_micro <= 0 THEN NULL ELSE
        |    (round(((o_a * 1000000 - e_a_micro)::DOUBLE / 1000000.0)
        |      / sqrt(v_micro::DOUBLE / 1000000.0) * 1000000.0))
        |      ::BIGINT END AS z_micro,
        |  CASE WHEN v_micro <= 0 THEN NULL ELSE
        |    (round((((o_a * 1000000 - e_a_micro)::DOUBLE / 1000000.0)
        |      / sqrt(v_micro::DOUBLE / 1000000.0)) *
        |      (((o_a * 1000000 - e_a_micro)::DOUBLE / 1000000.0)
        |      / sqrt(v_micro::DOUBLE / 1000000.0)) * 1000000.0))
        |      ::BIGINT END AS chi2_micro,
        |  CASE WHEN v_micro <= 0 THEN NULL ELSE
        |    (round(exp((o_a * 1000000 - e_a_micro)::DOUBLE
        |      / v_micro::DOUBLE) * 1000000.0))::BIGINT
        |    END AS hr_micro,
        |  CASE WHEN v_micro <= 0 THEN NULL ELSE
        |    (round(exp((o_a * 1000000 - e_a_micro)::DOUBLE
        |      / v_micro::DOUBLE - 1.959964 *
        |      sqrt(1000000.0 / v_micro::DOUBLE)) * 1000000.0))::BIGINT
        |    END AS lo_micro,
        |  CASE WHEN v_micro <= 0 THEN NULL ELSE
        |    (round(exp((o_a * 1000000 - e_a_micro)::DOUBLE
        |      / v_micro::DOUBLE + 1.959964 *
        |      sqrt(1000000.0 / v_micro::DOUBLE)) * 1000000.0))::BIGINT
        |    END AS hi_micro
        |FROM c, m""".stripMargin

  /** q309: the Mondrian rounds unrolled as CTEs — each round builds
    * the per-(region, dim) distinct-value cumulative table, picks the
    * widest-range dim (ties low), cuts at the lower median when both
    * halves hold >= k, and recodes the rows; three rounds = the
    * gate's maxDepth.
    */
  private val q309MondrianSql: String = {
    val k = 50L
    def round(r: Int): String =
      s"""long$r AS (SELECT region, 0 AS dim, q0 AS v FROM t$r
         |  UNION ALL SELECT region, 1, q1 FROM t$r),
         |cells$r AS (SELECT region, dim, v, count(*)::BIGINT AS c
         |  FROM long$r GROUP BY 1, 2, 3),
         |cum$r AS (SELECT region, dim, v, c,
         |    sum(c) OVER (PARTITION BY region, dim ORDER BY v)
         |      ::BIGINT AS cend,
         |    sum(c) OVER (PARTITION BY region, dim)::BIGINT AS n
         |  FROM cells$r),
         |stats$r AS (SELECT region, dim, min(v) AS lo, max(v) AS hi,
         |    max(n) AS n,
         |    min(CASE WHEN cend * 2 >= n THEN v END) AS cut
         |  FROM cum$r GROUP BY 1, 2),
         |wl$r AS (SELECT s.region, s.dim, s.lo, s.hi, s.n, s.cut,
         |    m.cend AS nleft
         |  FROM stats$r s JOIN cum$r m ON m.region = s.region
         |    AND m.dim = s.dim AND m.v = s.cut),
         |cuts$r AS (SELECT region, dim AS cutdim, cut FROM (
         |    SELECT *, row_number() OVER (PARTITION BY region
         |      ORDER BY (hi - lo) DESC, dim) AS rk FROM wl$r)
         |  WHERE rk = 1 AND hi > lo AND nleft >= $k
         |    AND n - nleft >= $k),
         |t${r + 1} AS (SELECT
         |    CASE WHEN c.cutdim IS NULL THEN t.region
         |      ELSE t.region ||
         |        (CASE WHEN (CASE WHEN c.cutdim = 0 THEN t.q0
         |                    ELSE t.q1 END) <= c.cut
         |         THEN '0' ELSE '1' END) END AS region,
         |    t.q0, t.q1
         |  FROM t$r t LEFT JOIN cuts$r c USING (region))""".stripMargin
    s"""WITH t1 AS (SELECT 'r' AS region,
       |    ((round(value * 100)::BIGINT % 100 + 100) % 100)
       |      ::BIGINT AS q0,
       |    (user_id % 50)::BIGINT AS q1
       |  FROM events WHERE value IS NOT NULL),
       |${round(1)},
       |${round(2)},
       |${round(3)}
       |SELECT region, count(*)::BIGINT AS n,
       |  min(q0)::BIGINT AS q0_lo, max(q0)::BIGINT AS q0_hi,
       |  min(q1)::BIGINT AS q1_lo, max(q1)::BIGINT AS q1_hi,
       |  (length(region) - 1)::BIGINT AS depth
       |FROM t4 GROUP BY 1""".stripMargin
  }

  /** q310: CMH stratified 2×2 — exact per-stratum cells, the same
    * micro-snapped E/V/R/S/RBG summands, identical closing chains.
    */
  private val q310CmhSql: String =
    """WITH d AS (SELECT (user_id % 5)::BIGINT AS s,
        |    (event_id % 2 = 0) AS e,
        |    (((round(value * 100)::BIGINT % 3 + 3) % 3) = 0) AS o
        |  FROM events WHERE value IS NOT NULL),
        |cells AS (SELECT s,
        |    sum(CASE WHEN e AND o THEN 1 ELSE 0 END)::BIGINT AS a,
        |    sum(CASE WHEN e AND NOT o THEN 1 ELSE 0 END)::BIGINT AS b,
        |    sum(CASE WHEN NOT e AND o THEN 1 ELSE 0 END)::BIGINT AS c,
        |    sum(CASE WHEN NOT e AND NOT o THEN 1 ELSE 0 END)::BIGINT
        |      AS d
        |  FROM d GROUP BY 1),
        |k AS (SELECT a, b, c, d, (a + b + c + d)::BIGINT AS n
        |  FROM cells WHERE a + b + c + d >= 2),
        |m AS (SELECT count(*)::BIGINT AS n_strata,
        |    sum(n)::BIGINT AS n_rows, sum(a)::BIGINT AS sum_a,
        |    sum((round((a::DOUBLE + b::DOUBLE) * (a::DOUBLE +
        |      c::DOUBLE) / n::DOUBLE * 1000000.0))::BIGINT)::BIGINT
        |      AS e_micro,
        |    sum((round((a::DOUBLE + b::DOUBLE) * (c::DOUBLE +
        |      d::DOUBLE) * (a::DOUBLE + c::DOUBLE) * (b::DOUBLE +
        |      d::DOUBLE) / (n::DOUBLE * n::DOUBLE * (n::DOUBLE - 1.0))
        |      * 1000000.0))::BIGINT)::BIGINT AS v_micro,
        |    sum((round(a::DOUBLE * d::DOUBLE / n::DOUBLE *
        |      1000000.0))::BIGINT)::BIGINT AS r_micro,
        |    sum((round(b::DOUBLE * c::DOUBLE / n::DOUBLE *
        |      1000000.0))::BIGINT)::BIGINT AS s_micro,
        |    sum((round((a::DOUBLE + d::DOUBLE) * a::DOUBLE *
        |      d::DOUBLE / (n::DOUBLE * n::DOUBLE) * 1000000.0))
        |      ::BIGINT)::BIGINT AS pr_micro,
        |    sum((round(((a::DOUBLE + d::DOUBLE) * b::DOUBLE *
        |      c::DOUBLE + (b::DOUBLE + c::DOUBLE) * a::DOUBLE *
        |      d::DOUBLE) / (n::DOUBLE * n::DOUBLE) * 1000000.0))
        |      ::BIGINT)::BIGINT AS psqr_micro,
        |    sum((round((b::DOUBLE + c::DOUBLE) * b::DOUBLE *
        |      c::DOUBLE / (n::DOUBLE * n::DOUBLE) * 1000000.0))
        |      ::BIGINT)::BIGINT AS qs_micro
        |  FROM k)
        |SELECT n_strata, n_rows, sum_a, e_micro, v_micro,
        |  CASE WHEN v_micro <= 0 THEN NULL ELSE
        |    (round((((sum_a * 1000000 - e_micro)::DOUBLE / 1000000.0)
        |      * ((sum_a * 1000000 - e_micro)::DOUBLE / 1000000.0)
        |      / (v_micro::DOUBLE / 1000000.0)) * 1000000.0))::BIGINT
        |    END AS chi2_micro,
        |  CASE WHEN r_micro <= 0 OR s_micro <= 0 THEN NULL ELSE
        |    (round(((r_micro::DOUBLE / 1000000.0) /
        |      (s_micro::DOUBLE / 1000000.0)) * 1000000.0))::BIGINT
        |    END AS or_micro,
        |  CASE WHEN r_micro <= 0 OR s_micro <= 0 THEN NULL ELSE
        |    (round(exp(ln((r_micro::DOUBLE / 1000000.0) /
        |        (s_micro::DOUBLE / 1000000.0)) - 1.959964 * sqrt(
        |      (pr_micro::DOUBLE / 1000000.0) /
        |        (2.0 * (r_micro::DOUBLE / 1000000.0) *
        |          (r_micro::DOUBLE / 1000000.0)) +
        |      (psqr_micro::DOUBLE / 1000000.0) /
        |        (2.0 * (r_micro::DOUBLE / 1000000.0) *
        |          (s_micro::DOUBLE / 1000000.0)) +
        |      (qs_micro::DOUBLE / 1000000.0) /
        |        (2.0 * (s_micro::DOUBLE / 1000000.0) *
        |          (s_micro::DOUBLE / 1000000.0)))) * 1000000.0))
        |      ::BIGINT END AS lo_micro,
        |  CASE WHEN r_micro <= 0 OR s_micro <= 0 THEN NULL ELSE
        |    (round(exp(ln((r_micro::DOUBLE / 1000000.0) /
        |        (s_micro::DOUBLE / 1000000.0)) + 1.959964 * sqrt(
        |      (pr_micro::DOUBLE / 1000000.0) /
        |        (2.0 * (r_micro::DOUBLE / 1000000.0) *
        |          (r_micro::DOUBLE / 1000000.0)) +
        |      (psqr_micro::DOUBLE / 1000000.0) /
        |        (2.0 * (r_micro::DOUBLE / 1000000.0) *
        |          (s_micro::DOUBLE / 1000000.0)) +
        |      (qs_micro::DOUBLE / 1000000.0) /
        |        (2.0 * (s_micro::DOUBLE / 1000000.0) *
        |          (s_micro::DOUBLE / 1000000.0)))) * 1000000.0))
        |      ::BIGINT END AS hi_micro
        |FROM m""".stripMargin

  /** q311: Adjusted Rand Index — exact integer pair counts (HUGEINT
    * mirrors Spark's decimal(38,0)), one closing double chain.
    */
  private val q311AriSql: String =
    """WITH d AS (SELECT lang AS a, source AS b FROM documents),
        |cells AS (SELECT a, b, count(*)::BIGINT AS c
        |  FROM d GROUP BY 1, 2),
        |ra AS (SELECT a, sum(c)::BIGINT AS ca FROM cells GROUP BY 1),
        |rb AS (SELECT b, sum(c)::BIGINT AS cb FROM cells GROUP BY 1),
        |m AS (SELECT sum(c)::BIGINT AS n,
        |    count(DISTINCT a)::BIGINT AS n_a,
        |    count(DISTINCT b)::BIGINT AS n_b,
        |    sum((c::HUGEINT * (c - 1)) // 2)::HUGEINT AS s_cells
        |  FROM cells),
        |sa AS (SELECT sum((ca::HUGEINT * (ca - 1)) // 2)::HUGEINT
        |    AS s_a FROM ra),
        |sb AS (SELECT sum((cb::HUGEINT * (cb - 1)) // 2)::HUGEINT
        |    AS s_b FROM rb)
        |SELECT n, n_a, n_b, s_cells::BIGINT AS s_cells,
        |  s_a::BIGINT AS s_a, s_b::BIGINT AS s_b,
        |  CASE WHEN (s_a::DOUBLE + s_b::DOUBLE) / 2.0 -
        |      s_a::DOUBLE * s_b::DOUBLE /
        |        ((n::HUGEINT * (n - 1)) // 2)::DOUBLE = 0.0 THEN NULL
        |  ELSE (round((s_cells::DOUBLE -
        |      s_a::DOUBLE * s_b::DOUBLE /
        |        ((n::HUGEINT * (n - 1)) // 2)::DOUBLE) /
        |    ((s_a::DOUBLE + s_b::DOUBLE) / 2.0 -
        |      s_a::DOUBLE * s_b::DOUBLE /
        |        ((n::HUGEINT * (n - 1)) // 2)::DOUBLE) * 1000000.0))
        |    ::BIGINT END AS ari_micro
        |FROM m, sa, sb""".stripMargin

  /** q312: the Hilbert xy2d walk unrolled level for level — quadrant
    * digit `(3·rx) XOR ry` scaled by s², then the swap/reflect
    * rotation, exactly the Spark column stages.
    */
  private val q312HilbertSql: String = {
    def level(i: Int, prev: String, name: String): String = {
      val s = 1L << i
      s"""$name AS (SELECT event_id, x, y,
         |    CASE WHEN hry = 0 THEN
         |      CASE WHEN hrx = 1 THEN ${s - 1} - hy ELSE hy END
         |    ELSE hx END AS hx,
         |    CASE WHEN hry = 0 THEN
         |      CASE WHEN hrx = 1 THEN ${s - 1} - hx ELSE hx END
         |    ELSE hy END AS hy,
         |    (hd + $s * $s * xor(hrx * 3, hry))::BIGINT AS hd
         |  FROM (SELECT *,
         |      CASE WHEN (hx & $s) > 0 THEN 1 ELSE 0 END AS hrx,
         |      CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END AS hry
         |    FROM $prev))""".stripMargin
    }
    s"""WITH l0 AS (SELECT event_id,
       |    (user_id % 32)::BIGINT AS x, (event_id % 32)::BIGINT AS y,
       |    (user_id % 32)::BIGINT AS hx, (event_id % 32)::BIGINT AS hy,
       |    0::BIGINT AS hd
       |  FROM events),
       |${level(4, "l0", "l1")},
       |${level(3, "l1", "l2")},
       |${level(2, "l2", "l3")},
       |${level(1, "l3", "l4")},
       |${level(0, "l4", "l5")}
       |SELECT event_id, x, y, hd AS h FROM l5
       |ORDER BY h, event_id LIMIT 50""".stripMargin
  }

  /** q322: Skilling's n-D AxesToTranspose unrolled step for step —
    * per level an invert-or-exchange of each coordinate against
    * column 0, then the prefix Gray pass, the X[n−1]-driven
    * correction fold, and the transpose bit interleave — exactly the
    * Spark column stages of `Relational.withHilbertValueN`.
    */
  private val q322Hilbert3dSql: String = {
    val n = 3
    val b = 3
    val buf = scala.collection.mutable.ArrayBuffer[String]()
    buf += s"""l0 AS (SELECT event_id,
      |    (user_id % 8)::BIGINT AS x, (event_id % 8)::BIGINT AS y,
      |    (((round(value * 100)::BIGINT % 8) + 8) % 8) AS z,
      |    (user_id % 8)::BIGINT AS t0, (event_id % 8)::BIGINT AS t1,
      |    (((round(value * 100)::BIGINT % 8) + 8) % 8) AS t2
      |  FROM events WHERE value IS NOT NULL)""".stripMargin
    var prev = "l0"
    var k = 0
    def emit(exprs: Map[Int, String], from: String): Unit = {
      k += 1
      val nm = s"s$k"
      val ts = (0 until n)
        .map(i => s"${exprs.getOrElse(i, s"t$i")} AS t$i")
        .mkString(", ")
      buf += s"$nm AS (SELECT event_id, x, y, z, $ts FROM $from)"
      prev = nm
    }
    for (q <- b - 1 to 1 by -1) {
      val bigQ = 1L << q
      val p = bigQ - 1L
      emit(Map(0 ->
        s"CASE WHEN (t0 & $bigQ) > 0 THEN xor(t0, $p) ELSE t0 END"),
        prev)
      for (i <- 1 until n) {
        k += 1
        val nm = s"s$k"
        val others = (1 until n).filter(_ != i)
          .map(j => s"t$j AS t$j")
        buf +=
          s"""$nm AS (SELECT event_id, x, y, z,
             |    CASE WHEN (t$i & $bigQ) > 0 THEN xor(t0, $p)
             |      ELSE xor(t0, hx) END AS t0,
             |    ${(others :+ s"xor(t$i, hx) AS t$i").mkString(", ")}
             |  FROM (SELECT *,
             |      CASE WHEN (t$i & $bigQ) > 0 THEN 0
             |        ELSE xor(t0, t$i) & $p END AS hx
             |    FROM $prev))""".stripMargin
        prev = nm
      }
    }
    for (i <- 1 until n)
      emit(Map(i -> s"xor(t$i, t${i - 1})"), prev)
    val tf = (b - 1 to 1 by -1).map { q =>
      val bigQ = 1L << q
      s"CASE WHEN (t${n - 1} & $bigQ) > 0 THEN ${bigQ - 1} ELSE 0 END"
    }.reduce((a, c) => s"xor($a, $c)")
    k += 1
    val foldNm = s"s$k"
    buf +=
      s"""$foldNm AS (SELECT event_id, x, y, z,
         |    ${(0 until n).map(i => s"xor(t$i, hx) AS t$i")
           .mkString(", ")}
         |  FROM (SELECT *, $tf AS hx FROM $prev))""".stripMargin
    prev = foldNm
    val h = (for { q <- 0 until b; i <- 0 until n }
      yield s"(((t$i >> $q) & 1) << ${q * n + (n - 1 - i)})")
      .mkString(" | ")
    s"""WITH ${buf.mkString(",\n")}
       |SELECT event_id, x, y, z, ($h)::BIGINT AS h FROM $prev
       |ORDER BY h, event_id LIMIT 50""".stripMargin
  }

  /** Unigram-LM Viterbi segmentation unrolled position for position —
    * shared by q325 (learn: the E-step segments every distinct word)
    * and q326 (apply under the gate fixture). Emits CTE text: forward
    * costs `c1..c<maxLen>` (min over piece lengths 1..L of
    * `c[j−k] + cost(substr)`, unknown singles at `unk`, unknown
    * longer substrings impossible), the packed cost list, then
    * `maxLen` backtrace steps that each take the LONGEST k whose
    * exact integer identity `cl[pos−k+1] + cost = cl[pos+1]` holds —
    * exactly the Spark fold in `TextOps.tokensUnigram`. Ends with
    * `<p>vit(word, ..., ps)`; `carry` columns pass through.
    */
  private def unigramViterbiCtes(p: String, wordsRel: String,
      modelRel: String, maxLen: Int, l: Int, unk: Long,
      carry: Seq[String]): String = {
    val inf = 1000000000000000L
    val cy = carry.map(c => s"$c, ").mkString
    def pc(startExpr: String, k: Int): String =
      s"coalesce((SELECT cost_micro FROM $modelRel mm WHERE " +
        s"mm.piece = substr(word, $startExpr, $k)), " +
        s"${if (k == 1) unk else inf})"
    val buf = scala.collection.mutable.ArrayBuffer[String]()
    buf += s"${p}f0 AS (SELECT ${cy}word, 0::BIGINT AS c0 " +
      s"FROM $wordsRel)"
    for (j <- 1 to maxLen) {
      val terms = (1 to math.min(l, j)).map { k =>
        s"c${j - k} + ${pc((j - k + 1).toString, k)}"
      }.mkString(", ")
      buf += s"${p}f$j AS (SELECT *, CASE WHEN len(word) >= $j " +
        s"THEN least($terms) ELSE NULL END AS c$j FROM ${p}f${j - 1})"
    }
    buf += s"${p}fl AS (SELECT ${cy}word, " +
      s"[${(0 to maxLen).map(j => s"c$j").mkString(", ")}] AS cl " +
      s"FROM ${p}f$maxLen)"
    buf += s"${p}b0 AS (SELECT ${cy}word, cl, len(word)::INT AS pos, " +
      s"''::VARCHAR AS ps FROM ${p}fl)"
    for (s <- 1 to maxLen) {
      val kstar = ((l to 2 by -1).map { k =>
        s"WHEN pos >= $k AND cl[pos - ${k - 1}] + " +
          s"${pc(s"pos - ${k - 1}", k)} = cl[pos + 1] THEN $k"
      } :+ "ELSE 1").mkString(" ")
      buf += s"""${p}b$s AS (SELECT ${cy}word, cl,
         |    CASE WHEN pos <= 0 THEN pos ELSE pos - kstar END AS pos,
         |    CASE WHEN pos <= 0 THEN ps ELSE
         |      substr(word, pos - kstar + 1, kstar) ||
         |      CASE WHEN ps = '' THEN '' ELSE ' ' END || ps END AS ps
         |  FROM (SELECT *, CASE $kstar END AS kstar
         |    FROM ${p}b${s - 1}))""".stripMargin
    }
    buf += s"${p}vit AS (SELECT ${cy}word, ps FROM ${p}b$maxLen)"
    buf.mkString(",\n")
  }

  /** q325: the unigram-LM learn replay — substring seeding with the
    * vocab cap, seed costs, one unrolled-Viterbi hard-EM round,
    * re-estimated costs.
    */
  private val q325UnigramLearnSql: String = {
    val vit = unigramViterbiCtes("u", "uw", "umodel0",
      maxLen = 20, l = 3, unk = 25000000L, carry = Seq("wc"))
    s"""WITH uw AS MATERIALIZED (SELECT word, count(*)::BIGINT AS wc FROM (
       |    SELECT unnest(string_split(text, ' ')) AS word
       |    FROM documents)
       |  WHERE word <> '' AND len(word) <= 20 GROUP BY 1),
       |usi AS (SELECT word, wc,
       |    unnest(range(1, len(word) + 1)) AS i FROM uw),
       |usil AS (SELECT word, wc, i,
       |    unnest(range(1, least(3, len(word) - i + 1) + 1)) AS l
       |  FROM usi),
       |usub AS (SELECT substr(word, i::INT, l::INT) AS piece,
       |    sum(wc)::BIGINT AS cnt FROM usil GROUP BY 1),
       |useed AS (SELECT piece, cnt FROM usub WHERE len(piece) = 1
       |  UNION ALL
       |  SELECT piece, cnt FROM (SELECT *, row_number() OVER
       |      (ORDER BY cnt DESC, piece ASC) AS rn
       |    FROM usub WHERE len(piece) > 1) WHERE rn <= 40),
       |utot0 AS (SELECT sum(cnt)::BIGINT AS t FROM useed),
       |umodel0 AS MATERIALIZED (SELECT piece,
       |    round(-ln(cnt::DOUBLE / t::DOUBLE) * 1000000.0)::BIGINT
       |      AS cost_micro
       |  FROM useed, utot0),
       |$vit,
       |ucnt AS (SELECT piece, sum(wc)::BIGINT AS cnt FROM (
       |    SELECT wc, unnest(string_split(ps, ' ')) AS piece
       |    FROM uvit) GROUP BY 1),
       |utot1 AS (SELECT sum(cnt)::BIGINT AS t FROM ucnt)
       |SELECT piece, cnt,
       |  round(-ln(cnt::DOUBLE / t::DOUBLE) * 1000000.0)::BIGINT
       |    AS cost_micro
       |FROM ucnt, utot1""".stripMargin
  }

  /** q326: unigram apply under the gate fixture — fixture VALUES,
    * unrolled Viterbi per distinct word, joined back to word
    * occurrences in document order.
    */
  private val q326UnigramApplySql: String = {
    val fixture = graft.SparkEntry.gateUnigramVocab.toSeq.sorted
      .map { case (piece, cost) => s"('$piece', ${cost}::BIGINT)" }
      .mkString(", ")
    val vit = unigramViterbiCtes("a", "aw", "amodel",
      maxLen = 12, l = 3, unk = 25000000L, carry = Seq.empty)
    s"""WITH amodel AS (SELECT * FROM (VALUES $fixture)
       |  AS v(piece, cost_micro)),
       |adw0 AS (SELECT doc_id, string_split(text, ' ') AS ws
       |  FROM documents),
       |adwi AS (SELECT doc_id, ws,
       |    unnest(range(1, len(ws) + 1)) AS i FROM adw0),
       |adw AS (SELECT doc_id, i, ws[i::INT] AS word FROM adwi
       |  WHERE ws[i::INT] <> ''),
       |aw AS MATERIALIZED (SELECT DISTINCT word FROM adw),
       |$vit,
       |aagg AS (SELECT doc_id,
       |    sum(len(string_split(v.ps, ' ')))::BIGINT AS n_pieces,
       |    string_agg(v.ps, ' ' ORDER BY i) AS pieces
       |  FROM adw JOIN avit v USING (word) GROUP BY doc_id)
       |SELECT d.doc_id, coalesce(a.n_pieces, 0)::BIGINT AS n_pieces,
       |  coalesce(a.pieces, '') AS pieces
       |FROM documents d LEFT JOIN aagg a USING (doc_id)""".stripMargin
  }

  /** q330: the q325 learn replay with a SECOND hard-EM round — the
    * round-1 counts become costs (umodel1), the lattice unrolls again
    * under them, and the final model re-estimates from the second
    * segmentation.
    */
  private val q330UnigramEm2Sql: String = {
    val vit1 = unigramViterbiCtes("u", "uw", "umodel0",
      maxLen = 20, l = 3, unk = 25000000L, carry = Seq("wc"))
    val vit2 = unigramViterbiCtes("w", "uw", "umodel1",
      maxLen = 20, l = 3, unk = 25000000L, carry = Seq("wc"))
    s"""WITH uw AS MATERIALIZED (SELECT word, count(*)::BIGINT AS wc FROM (
       |    SELECT unnest(string_split(text, ' ')) AS word
       |    FROM documents)
       |  WHERE word <> '' AND len(word) <= 20 GROUP BY 1),
       |usi AS (SELECT word, wc,
       |    unnest(range(1, len(word) + 1)) AS i FROM uw),
       |usil AS (SELECT word, wc, i,
       |    unnest(range(1, least(3, len(word) - i + 1) + 1)) AS l
       |  FROM usi),
       |usub AS (SELECT substr(word, i::INT, l::INT) AS piece,
       |    sum(wc)::BIGINT AS cnt FROM usil GROUP BY 1),
       |useed AS (SELECT piece, cnt FROM usub WHERE len(piece) = 1
       |  UNION ALL
       |  SELECT piece, cnt FROM (SELECT *, row_number() OVER
       |      (ORDER BY cnt DESC, piece ASC) AS rn
       |    FROM usub WHERE len(piece) > 1) WHERE rn <= 40),
       |utot0 AS (SELECT sum(cnt)::BIGINT AS t FROM useed),
       |umodel0 AS MATERIALIZED (SELECT piece,
       |    round(-ln(cnt::DOUBLE / t::DOUBLE) * 1000000.0)::BIGINT
       |      AS cost_micro
       |  FROM useed, utot0),
       |$vit1,
       |ucnt AS (SELECT piece, sum(wc)::BIGINT AS cnt FROM (
       |    SELECT wc, unnest(string_split(ps, ' ')) AS piece
       |    FROM uvit) GROUP BY 1),
       |utot1 AS (SELECT sum(cnt)::BIGINT AS t FROM ucnt),
       |umodel1 AS MATERIALIZED (SELECT piece,
       |    round(-ln(cnt::DOUBLE / t::DOUBLE) * 1000000.0)::BIGINT
       |      AS cost_micro
       |  FROM ucnt, utot1),
       |$vit2,
       |wcnt AS (SELECT piece, sum(wc)::BIGINT AS cnt FROM (
       |    SELECT wc, unnest(string_split(ps, ' ')) AS piece
       |    FROM wvit) GROUP BY 1),
       |wtot AS (SELECT sum(cnt)::BIGINT AS t FROM wcnt)
       |SELECT piece, cnt,
       |  round(-ln(cnt::DOUBLE / t::DOUBLE) * 1000000.0)::BIGINT
       |    AS cost_micro
       |FROM wcnt, wtot""".stripMargin
  }

  /** q313: two-sample KS — exact cross-multiplied supremum off the
    * distinct-value cumulative table, identical λ / 8-term p chain.
    */
  private val q313KsSql: String =
    """WITH d AS (SELECT (user_id % 2 = 0) AS ga,
        |    round(value * 100)::BIGINT AS v
        |  FROM events WHERE value IS NOT NULL),
        |bv AS (SELECT v,
        |    sum(CASE WHEN ga THEN 1 ELSE 0 END)::BIGINT AS na,
        |    sum(CASE WHEN NOT ga THEN 1 ELSE 0 END)::BIGINT AS nb
        |  FROM d GROUP BY 1),
        |t AS (SELECT sum(na)::BIGINT AS n_a, sum(nb)::BIGINT AS n_b
        |  FROM bv),
        |c AS (SELECT sum(na) OVER (ORDER BY v)::HUGEINT AS ca,
        |    sum(nb) OVER (ORDER BY v)::HUGEINT AS cb FROM bv),
        |m AS (SELECT t.n_a, t.n_b,
        |    max(abs(ca * t.n_b - cb * t.n_a))::HUGEINT AS dnum
        |  FROM c, t GROUP BY 1, 2),
        |f AS (SELECT n_a, n_b,
        |    dnum::DOUBLE / (n_a::DOUBLE * n_b::DOUBLE) AS dstat,
        |    n_a::DOUBLE * n_b::DOUBLE /
        |      (n_a::DOUBLE + n_b::DOUBLE) AS ne
        |  FROM m),
        |g AS (SELECT n_a, n_b, dstat,
        |    (sqrt(ne) + 0.12 + 0.11 / sqrt(ne)) * dstat AS lam
        |  FROM f),
        |h AS (SELECT n_a, n_b, dstat, lam,
        |    2.0 * (1.0 * exp(-2.0 * lam * lam) +
        |      -1.0 * exp(-8.0 * lam * lam) +
        |      1.0 * exp(-18.0 * lam * lam) +
        |      -1.0 * exp(-32.0 * lam * lam) +
        |      1.0 * exp(-50.0 * lam * lam) +
        |      -1.0 * exp(-72.0 * lam * lam) +
        |      1.0 * exp(-98.0 * lam * lam) +
        |      -1.0 * exp(-128.0 * lam * lam)) AS p
        |  FROM g)
        |SELECT n_a, n_b,
        |  CASE WHEN n_a = 0 OR n_b = 0 THEN NULL ELSE
        |    (round(dstat * 1000000.0))::BIGINT END AS d_micro,
        |  CASE WHEN n_a = 0 OR n_b = 0 THEN NULL ELSE
        |    (round((CASE WHEN lam <= 0.2 THEN 1.0 ELSE
        |      least(greatest(p, 0.0), 1.0) END) * 1000000.0))::BIGINT
        |    END AS p_micro
        |FROM h""".stripMargin

  /** q314: mSPRT anytime-valid p path — identical cumulative counts,
    * per-day ln Λ / p chains, and running min.
    */
  private val q314MsprtSql: String =
    """WITH d AS (SELECT
        |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
        |    (user_id % 2 = 0) AS a,
        |    (CASE WHEN ((round(value * 100)::BIGINT % 2 + 2) % 2) = 0
        |      THEN 1 ELSE 0 END)::BIGINT AS x
        |  FROM events WHERE value IS NOT NULL),
        |daily AS (SELECT day,
        |    sum(CASE WHEN a THEN 1 ELSE 0 END)::BIGINT AS dna,
        |    sum(CASE WHEN a THEN x ELSE 0 END)::BIGINT AS dxa,
        |    sum(CASE WHEN NOT a THEN 1 ELSE 0 END)::BIGINT AS dnb,
        |    sum(CASE WHEN NOT a THEN x ELSE 0 END)::BIGINT AS dxb
        |  FROM d GROUP BY 1),
        |cum AS (SELECT day,
        |    (sum(dna) OVER w)::BIGINT AS n_a,
        |    (sum(dxa) OVER w)::BIGINT AS x_a,
        |    (sum(dnb) OVER w)::BIGINT AS n_b,
        |    (sum(dxb) OVER w)::BIGINT AS x_b
        |  FROM daily WINDOW w AS (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |ch AS (SELECT day, n_a, x_a, n_b, x_b,
        |    (x_a + x_b)::DOUBLE / (n_a::DOUBLE + n_b::DOUBLE) AS pool,
        |    x_a::DOUBLE / n_a::DOUBLE - x_b::DOUBLE / n_b::DOUBLE
        |      AS theta
        |  FROM cum),
        |vv AS (SELECT *, pool * (1.0 - pool) *
        |    (1.0 / n_a::DOUBLE + 1.0 / n_b::DOUBLE) AS v FROM ch),
        |ll AS (SELECT day, n_a, x_a, n_b, x_b,
        |    0.5 * ln(v / (v + 0.0001)) +
        |      theta * theta * 0.0001 /
        |        (2.0 * v * (v + 0.0001)) AS lnlam,
        |    (n_a = 0 OR n_b = 0 OR x_a + x_b = 0 OR
        |      x_a + x_b = n_a + n_b) AS degen
        |  FROM vv),
        |pt AS (SELECT day, n_a, x_a, n_b, x_b,
        |    CASE WHEN degen THEN NULL
        |      ELSE (round(lnlam * 1000000.0))::BIGINT
        |      END AS ln_lambda_micro,
        |    CASE WHEN degen THEN 1000000
        |      ELSE (round(least(1.0, exp(-lnlam)) * 1000000.0))::BIGINT
        |      END AS pt
        |  FROM ll)
        |SELECT day, n_a, x_a, n_b, x_b, ln_lambda_micro,
        |  (min(pt) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT
        |    AS p_always_micro
        |FROM pt""".stripMargin

  val all: Map[String, String] = Map(
    "q57_clean_corpus" -> q57,
    "q99_removal_audit" -> q99,
    "q200_pipeline_preflight" ->
      s"""SELECT verdict, count(*)::BIGINT AS n_docs
         |FROM ($q99) GROUP BY 1""".stripMargin,
    "q01_groupby_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q02_distinct_keys" ->
      "SELECT DISTINCT o_custkey, o_orderstatus FROM orders",

    "q03_sample_joinback" ->
      """WITH keys AS (
        |  SELECT o_orderkey FROM (SELECT DISTINCT o_orderkey FROM orders)
        |  ORDER BY md5(o_orderkey::VARCHAR || ':' || '42'), o_orderkey
        |  LIMIT 10)
        |SELECT l.l_orderkey, l.l_linenumber, l.l_quantity,
        |  CAST(floor(epoch(l.l_shipdate)) AS BIGINT) AS ship_epoch
        |FROM lineitem l JOIN keys k ON l.l_orderkey = k.o_orderkey""".stripMargin,

    "q04_filter_algebra" ->
      """SELECT * FROM customer
        |WHERE (c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
        |       OR c_mktsegment = 'MACHINERY')
        |  AND c_acctbal IS NOT NULL AND c_acctbal > 100.0
        |  AND c_nationkey IN (0,1,2,3,4,5,6,7,8,9,10)
        |  AND lower(c_name) LIKE 'c%'""".stripMargin,

    "q05_telemetry" ->
      """SELECT l_orderkey,
        |  max(l_linenumber) AS total_frames,
        |  max(l_quantity) AS max_speed,
        |  count(DISTINCT l_partkey) AS n_players,
        |  array_to_string(list_sort(list(DISTINCT l_returnflag)), ',') AS events,
        |  max(l_linenumber) / 10.0 AS duration_sec
        |FROM lineitem GROUP BY l_orderkey""".stripMargin,

    "q06_sort_limit" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |ORDER BY l_orderkey, l_linenumber LIMIT 100""".stripMargin,

    // phrased as the SAME self-join as the Spark side (not a plain scan):
    // a duplicated 4-part key must multiply identically on both engines
    // (sf0.001 has one such dup pair — 4 joined rows, not 2)
    "q07_merge_split" ->
      """WITH i AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |             l_quantity FROM lineitem),
        |o AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |        l_extendedprice, l_returnflag FROM lineitem)
        |SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |  i.l_quantity, o.l_extendedprice, o.l_returnflag
        |FROM i JOIN o
        |  USING (l_orderkey, l_linenumber, l_partkey, l_suppkey)""".stripMargin,

    "q08_union_weeks" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        |FROM orders WHERE o_orderkey % 2 = 0
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_totalprice, NULL
        |FROM orders WHERE o_orderkey % 2 = 1""".stripMargin,

    "q09_trajectory" ->
      """SELECT l_orderkey,
        |  (row_number() OVER (PARTITION BY l_orderkey
        |    ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity) - 1)::INTEGER
        |    AS pos,
        |  l_linenumber, l_partkey, l_suppkey, l_quantity
        |FROM lineitem""".stripMargin,

    "q10_tensor" ->
      """SELECT l_orderkey AS gameId,
        |  count(DISTINCT l_linenumber)::INTEGER AS n_frames,
        |  round(sum(CAST(CAST(l_quantity AS REAL) AS DOUBLE)
        |          + CAST(CAST(l_discount AS REAL) AS DOUBLE)), 2) AS checksum
        |FROM lineitem GROUP BY l_orderkey""".stripMargin,

    "q11_normalize" ->
      """SELECT c_custkey AS cust_key,
        |  CAST(c_acctbal AS DOUBLE) AS balance,
        |  c_mktsegment AS segment,
        |  'none' AS vip_flag,
        |  CAST(NULL AS VARCHAR) AS note
        |FROM customer""".stripMargin,

    "q12_ingest_summary" ->
      """SELECT count(*) AS n_rows,
        |  count(DISTINCT l_orderkey) AS n_games,
        |  count(DISTINCT (l_orderkey, l_partkey)) AS n_plays,
        |  max(l_linenumber) AS max_frame
        |FROM lineitem""".stripMargin,

    "q13_exact_dedup" ->
      """SELECT sha256(text) AS text_hash, min(doc_id) AS doc_id,
        |  count(*) AS n_dups
        |FROM documents GROUP BY text""".stripMargin,

    "q14_minhash" -> q14,
    "q15_lsh_buckets" -> q15,
    "q16_near_dup_pairs" -> q16,
    "q194_dedup_recall" -> q194,
    "q71_fuzzy_join" -> q71,
    "q17_cosine_topk" -> q17,
    "q18_ann_topk" -> q18,
    "q65_ann_recall" -> q65,
    "q171_matryoshka_recall" -> q171,
    "q27_ivf_topk" -> q27,
    "q187_centroid_similarity" -> q187,

    // temperature mixing at alpha = 0.5: quota_c = floor(200·√n_c/Σ√n),
    // Σ as the class-ordered fold (0.0 + w1 + w2 + ... — adding 0.0 to
    // a positive double is exact, so the chain matches Spark's
    // aggregate-from-zero), docs in seeded-md5 order
    "q67_temperature_mix" ->
      """WITH s AS (SELECT lang, count(*) AS n FROM documents
        |           GROUP BY lang),
        |w AS (SELECT lang, sqrt(n::DOUBLE) AS wt FROM s),
        |z AS (SELECT list_reduce(list(wt ORDER BY lang), (a, b) -> a + b)
        |        AS z FROM w),
        |q AS (SELECT lang, floor(200.0 * wt / z)::BIGINT AS quota
        |      FROM w, z),
        |r AS (SELECT lang, doc_id,
        |        md5(doc_id::VARCHAR || ':' || '23') AS h FROM documents),
        |p AS (SELECT lang, doc_id,
        |        (row_number() OVER (PARTITION BY lang ORDER BY h, doc_id)
        |          - 1)::BIGINT AS pos FROM r)
        |SELECT p.lang, p.doc_id, p.pos
        |FROM p JOIN q USING (lang) WHERE pos < quota""".stripMargin,

    // within-doc span dedup: keep index i iff the FIRST occurrence of
    // ls[i] is at i (both sides 1-based first-position semantics)
    "q70_span_dedup" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' a ') AS ls
        |           FROM documents)
        |SELECT doc_id,
        |  array_to_string(
        |    list_transform(
        |      list_filter(range(1, len(ls) + 1),
        |        i -> list_position(ls, ls[i]) = i),
        |      i -> ls[i]), ' a ') AS clean_text
        |FROM t""".stripMargin,

    // normalized exact dedup over the case-mangled union: the dedup key
    // is the CCNet-style canonical form (lower, punct→space, whitespace
    // collapse) — identical RE2/Java semantics for these classes
    "q69_normalized_dedup" ->
      """WITH u AS (SELECT doc_id, text FROM documents
        |           UNION ALL
        |           SELECT doc_id + 100000, upper(text) FROM documents),
        |n AS (SELECT doc_id,
        |        trim(regexp_replace(regexp_replace(lower(text),
        |          '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g')) AS k
        |      FROM u)
        |SELECT sha256(k) AS text_hash, min(doc_id) AS doc_id,
        |  count(*) AS n_dups
        |FROM n GROUP BY k""".stripMargin,

    // temperature mixing in TOKENS: quota_c = floor(10000·√T_c/Σ√T)
    // (T_c integer-exact), first-crossing fill in seeded-md5 order —
    // the q63 window with a per-class quota from the q67 fold
    "q68_temperature_tokens" ->
      """WITH tt AS (SELECT lang, doc_id,
        |              len(string_split(text, ' ')) AS n_tokens
        |            FROM documents),
        |s AS (SELECT lang, sum(n_tokens)::DOUBLE AS tn FROM tt
        |      GROUP BY lang),
        |w AS (SELECT lang, sqrt(tn) AS wt FROM s),
        |z AS (SELECT list_reduce(list(wt ORDER BY lang), (a, b) -> a + b)
        |        AS z FROM w),
        |q AS (SELECT lang, floor(10000.0 * wt / z)::BIGINT AS quota
        |      FROM w, z),
        |r AS (SELECT lang, doc_id, n_tokens,
        |        md5(doc_id::VARCHAR || ':' || '29') AS h FROM tt),
        |c AS (SELECT lang, doc_id, n_tokens,
        |        coalesce(sum(n_tokens) OVER (PARTITION BY lang
        |          ORDER BY h, doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          AS cum_before FROM r)
        |SELECT c.lang, c.doc_id, c.n_tokens::INTEGER AS n_tokens,
        |  c.cum_before::BIGINT AS cum_before
        |FROM c JOIN q USING (lang) WHERE cum_before < quota""".stripMargin,

    // line dedup: spans between literal " a " delimiters, hot = in > 2
    // distinct docs (length >= 3 only), every occurrence dropped,
    // survivors rejoined in order; all-dropped docs keep '' (vs NULL
    // for a null text)
    "q66_line_dedup" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' a ') AS ls
        |           FROM documents),
        |l AS (SELECT doc_id,
        |        unnest(list_transform(range(1, len(ls) + 1),
        |          i -> {'pos': i, 'ln': ls[i]})) AS e FROM t),
        |x AS (SELECT doc_id, (e.pos) AS pos, (e.ln) AS ln FROM l),
        |hot AS (SELECT ln
        |        FROM (SELECT DISTINCT doc_id, ln FROM x
        |              WHERE length(ln) >= 3)
        |        GROUP BY ln HAVING count(*) > 2),
        |m AS (SELECT doc_id, pos, ln,
        |        ln IN (SELECT ln FROM hot) AS h FROM x),
        |g AS (SELECT doc_id, count(*) AS n_lines,
        |        count(*) FILTER (WHERE NOT h) AS n_kept,
        |        coalesce(array_to_string(
        |          list(ln ORDER BY pos) FILTER (WHERE NOT h), ' a '), '')
        |          AS clean_text
        |      FROM m GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(g.n_lines, 0) AS n_lines,
        |  coalesce(g.n_kept, 0) AS n_kept, g.clean_text
        |FROM documents d LEFT JOIN g USING (doc_id)""".stripMargin,
    // Gopher rules: integer counting + single rounded divisions — the
    // exact chains gopherRules builds (the '...'-run count uses float
    // '/' on both sides; multiples of 3 divide exactly)
    "q75_gopher_rules" ->
      """WITH t AS (SELECT doc_id, text,
        |        string_split(text, ' ') AS w,
        |        string_split(text, chr(10)) AS l FROM documents),
        |s AS (SELECT doc_id,
        |  len(w) AS n_words,
        |  round(list_sum(list_transform(w, x -> len(x)))::DOUBLE /
        |    greatest(len(w), 1), 6) AS mean_word_len,
        |  round(((len(text) - len(replace(text, '#', ''))) +
        |    (len(text) - len(replace(text, '...', ''))) / 3)::DOUBLE /
        |    greatest(len(w), 1), 6) AS symbol_ratio,
        |  round(len(list_filter(l, x -> ltrim(x) LIKE '-%' OR
        |    ltrim(x) LIKE '*%' OR ltrim(x) LIKE '•%'))::DOUBLE /
        |    greatest(len(l), 1), 6) AS bullet_line_ratio,
        |  round(len(list_filter(l, x -> x LIKE '%...'))::DOUBLE /
        |    greatest(len(l), 1), 6) AS ellipsis_line_ratio,
        |  round(len(list_filter(w, x ->
        |    regexp_matches(x, '[A-Za-z]')))::DOUBLE /
        |    greatest(len(w), 1), 6) AS alpha_word_ratio,
        |  len(list_filter(w, x -> lower(x) IN ('the', 'a', 'of', 'and',
        |    'is', 'to', 'in', 'it', 'that', 'for'))) AS n_stopwords
        |FROM t)
        |SELECT doc_id, n_words::INTEGER AS n_words, mean_word_len,
        |  symbol_ratio, bullet_line_ratio, ellipsis_line_ratio,
        |  alpha_word_ratio, n_stopwords::INTEGER AS n_stopwords,
        |  (n_words >= 10 AND n_words <= 100000 AND
        |   mean_word_len >= 3.0 AND mean_word_len <= 10.0 AND
        |   symbol_ratio <= 0.1 AND bullet_line_ratio <= 0.9 AND
        |   ellipsis_line_ratio <= 0.3 AND alpha_word_ratio >= 0.8 AND
        |   n_stopwords >= 2) AS pass
        |FROM s""".stripMargin,

    // DSIR: the per-bucket log-ratio snaps to integer micro-nats ONCE
    // (ln only needs half-micro accuracy to agree with the JVM), then
    // every per-doc aggregate is exact BIGINT arithmetic
    "q76_dsir" ->
      s"""WITH tok AS (SELECT doc_id, lang,
         |        unnest(string_split(text, ' ')) AS tok FROM documents),
         |bk AS (SELECT doc_id, lang, (${h32("tok")} % 64) AS bkt
         |       FROM tok),
         |dc AS (SELECT doc_id, bkt, count(*) AS c FROM bk
         |       GROUP BY doc_id, bkt),
         |rc AS (SELECT bkt, sum(c)::BIGINT AS rcnt FROM dc GROUP BY bkt),
         |tc AS (SELECT bkt, count(*) AS tcnt FROM bk WHERE lang = 'en'
         |       GROUP BY bkt),
         |tot AS (SELECT (SELECT sum(rcnt) FROM rc)::BIGINT AS rtot,
         |        (SELECT coalesce(sum(tcnt), 0) FROM tc)::BIGINT AS ttot),
         |lr AS (SELECT bkt,
         |        round((ln(((coalesce(tcnt, 0) + 1) * (rtot + 64))::DOUBLE)
         |          - ln(((rcnt + 1) * (ttot + 64))::DOUBLE))
         |          * 1000000.0)::BIGINT AS lr_micro
         |       FROM rc LEFT JOIN tc USING (bkt), tot)
         |SELECT doc_id, sum(c * lr_micro)::BIGINT AS weight_micro,
         |  sum(c * lr_micro) > 0 AS selected
         |FROM dc JOIN lr USING (bkt) GROUP BY doc_id""".stripMargin,

    // bigram-LM NLL: per-pair log-prob snapped to micro-nats once,
    // per-doc totals exact BIGINT, avg as one fixed IEEE chain
    "q77_lm_score" -> q77,

    // BM25: idf snapped to micro-nats per TERM, length-normalized tf
    // snapped per POSTING (one interpolated IEEE chain — the constants
    // are Scala-computed doubles round-tripped through toString), then
    // pure-BIGINT scoring; rank window replays exactly on BIGINT ties
    "q78_bm25" -> bm25Sql("documents"),
        // per-source boilerplate: q66's chain with the hot set keyed
    // (source, line) and membership resolved by LEFT JOIN on the pair
    "q79_line_dedup_by_source" ->
      """WITH t AS (SELECT doc_id, source,
        |             string_split(text, ' a ') AS ls FROM documents),
        |l AS (SELECT doc_id, source,
        |        unnest(list_transform(range(1, len(ls) + 1),
        |          i -> {'pos': i, 'ln': ls[i]})) AS e FROM t),
        |x AS (SELECT doc_id, source, (e.pos) AS pos, (e.ln) AS ln
        |      FROM l),
        |hot AS (SELECT source, ln
        |        FROM (SELECT DISTINCT source, doc_id, ln FROM x
        |              WHERE length(ln) >= 3)
        |        GROUP BY source, ln HAVING count(*) > 1),
        |m AS (SELECT x.doc_id, x.pos, x.ln,
        |        hot.ln IS NOT NULL AS h
        |      FROM x LEFT JOIN hot
        |        ON x.source = hot.source AND x.ln = hot.ln),
        |g AS (SELECT doc_id, count(*) AS n_lines,
        |        count(*) FILTER (WHERE NOT h) AS n_kept,
        |        coalesce(array_to_string(
        |          list(ln ORDER BY pos) FILTER (WHERE NOT h), ' a '), '')
        |          AS clean_text
        |      FROM m GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(g.n_lines, 0) AS n_lines,
        |  coalesce(g.n_kept, 0) AS n_kept, g.clean_text
        |FROM documents d LEFT JOIN g USING (doc_id)""".stripMargin,

    // key-skew profile: counts + 1-row total, one rounded division,
    // deterministic top-20 (count desc, key asc)
    "q80_key_skew" ->
      """WITH c AS (SELECT l_suppkey, count(*) AS n_rows FROM lineitem
        |           GROUP BY l_suppkey),
        |t AS (SELECT sum(n_rows)::BIGINT AS total_rows FROM c)
        |SELECT c.l_suppkey, c.n_rows,
        |  round(c.n_rows::DOUBLE / t.total_rows::DOUBLE, 6) AS share,
        |  t.total_rows
        |FROM c, t ORDER BY n_rows DESC, l_suppkey ASC LIMIT 20""".stripMargin,

    "q81_source_similarity" -> q81,

    // FIM split: md5-seeded cut points mod (n+1), pure list slicing;
    // empty slices coalesce to '' (DuckDB array_to_string([]) is NULL,
    // Spark array_join([]) is '')
    "q82_fim_split" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w
         |           FROM documents),
         |n AS (SELECT doc_id, w, len(w) AS n,
         |        ${h32("doc_id::VARCHAR || ':17:a'")} % (len(w) + 1)
         |          AS c1,
         |        ${h32("doc_id::VARCHAR || ':17:b'")} % (len(w) + 1)
         |          AS c2 FROM t),
         |c AS (SELECT doc_id, w, n, least(c1, c2) AS lo,
         |        greatest(c1, c2) AS hi FROM n)
         |SELECT doc_id, n::INTEGER AS n_tokens, lo::INTEGER AS n_prefix,
         |  (hi - lo)::INTEGER AS n_middle,
         |  coalesce(array_to_string(list_slice(w, 1, lo), ' '), '')
         |    AS prefix,
         |  coalesce(array_to_string(list_slice(w, lo + 1, hi), ' '), '')
         |    AS middle,
         |  coalesce(array_to_string(list_slice(w, hi + 1, n), ' '), '')
         |    AS suffix
         |FROM c""".stripMargin,

    // JSONL roundtrip: the oracle aggregates the parquet DIRECTLY —
    // equality holds iff the export+readback changed nothing, making
    // the sink/source pair itself the thing under test
    "q83_jsonl_roundtrip" ->
      s"""SELECT lang, count(*) AS n_docs,
         |  sum(n_chars)::BIGINT AS sum_chars,
         |  sum(${h32("text")})::BIGINT AS text_hash_sum,
         |  min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
         |FROM documents GROUP BY lang""".stripMargin,

    // per-source KL vs the corpus blend: per-(source,bucket) log-ratio
    // snapped to micro-nats once over a DENSE source×bucket grid
    // (smoothing gives absent buckets weight 1), numerator exact
    // BIGINT, final kl one fixed IEEE chain
    "q84_source_divergence" ->
      s"""WITH tok AS (SELECT source,
         |        unnest(string_split(text, ' ')) AS tok FROM documents),
         |gc AS (SELECT source, (${h32("tok")} % 64) AS bkt,
         |        count(*) AS c FROM tok GROUP BY source, bkt),
         |gn AS (SELECT source, sum(c)::BIGINT AS ng FROM gc
         |       GROUP BY source),
         |cb AS (SELECT bkt, sum(c)::BIGINT AS cb FROM gc GROUP BY bkt),
         |tot AS (SELECT sum(cb)::BIGINT AS n FROM cb),
         |grid AS (SELECT source, ng, r.range AS bkt
         |         FROM gn, range(64) r),
         |f AS (SELECT g.source, g.ng, g.bkt,
         |        coalesce(gc.c, 0) AS c, coalesce(cb.cb, 0) AS cb, tot.n
         |      FROM grid g
         |      LEFT JOIN gc ON g.source = gc.source AND g.bkt = gc.bkt
         |      LEFT JOIN cb ON g.bkt = cb.bkt, tot),
         |term AS (SELECT source, ng, (c + 1) *
         |        round((ln(((c + 1) * (n + 64))::DOUBLE)
         |          - ln(((cb + 1) * (ng + 64))::DOUBLE))
         |          * 1000000.0)::BIGINT AS t FROM f)
         |SELECT source, ng AS n_tokens, sum(t)::BIGINT AS kl_num_micro,
         |  round((sum(t)::DOUBLE / (ng + 64)::DOUBLE) / 1000000.0, 6)
         |    AS kl
         |FROM term GROUP BY source, ng""".stripMargin,

    // upsert: oracle states the OUTCOME (corrections replace originals
    // because their version is strictly newer) — an independent
    // formulation of the union+argmax the engine runs
    "q85_upsert_merge" ->
      """SELECT event_id,
        |  CASE WHEN event_id % 5 = 0 THEN ts + INTERVAL 1 HOUR
        |       ELSE ts END AS ts,
        |  user_id,
        |  CASE WHEN event_id % 5 = 0 THEN 'corrected'
        |       ELSE event_type END AS event_type,
        |  CASE WHEN event_id % 5 = 0 THEN value + 1.0
        |       ELSE value END AS value,
        |  props
        |FROM events""".stripMargin,

    // global shuffle: the oracle's single global row_number() replays
    // the engine's two-level prefix sum exactly (same order key)
    "q86_global_shuffle" ->
      """WITH r AS (SELECT doc_id,
        |  (row_number() OVER (
        |     ORDER BY md5(doc_id::VARCHAR || ':' || '41'), doc_id)
        |   - 1)::BIGINT AS global_pos FROM documents)
        |SELECT doc_id, global_pos, (global_pos % 8)::BIGINT AS shard,
        |  (global_pos // 8)::BIGINT AS shard_pos
        |FROM r""".stripMargin,

    // linear classifier: micro-int weight table as VALUES, BIGINT sum,
    // integer sign test for keep, one fixed IEEE chain for logit
    "q87_quality_classifier" ->
      """WITH w(tok, wm) AS (VALUES
        |  ('the', 250000), ('a', 180000), ('data', 120000),
        |  ('query', 100000), ('table', 80000), ('join', 60000),
        |  ('slow', -220000), ('dup', -350000), ('batch', -80000)),
        |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |        FROM documents),
        |pd AS (SELECT doc_id, count(*)::BIGINT AS n_tokens,
        |        sum(coalesce(w.wm, 0))::BIGINT AS w_sum_micro
        |       FROM tok LEFT JOIN w USING (tok) GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(pd.n_tokens, 0) AS n_tokens,
        |  coalesce(pd.w_sum_micro, 0) AS w_sum_micro,
        |  round((-150000.0 + CASE WHEN coalesce(pd.n_tokens, 0) = 0
        |      THEN 0.0
        |      ELSE pd.w_sum_micro::DOUBLE / pd.n_tokens::DOUBLE END)
        |    / 1000000.0, 6) AS logit,
        |  CASE WHEN coalesce(pd.n_tokens, 0) = 0 THEN -150000 > 0
        |       ELSE -150000 * pd.n_tokens + pd.w_sum_micro > 0 END
        |    AS keep
        |FROM (SELECT DISTINCT doc_id FROM documents) d
        |LEFT JOIN pd USING (doc_id)""".stripMargin,

    // CCNet buckets: q77's scores re-ranked per language; the oracle's
    // single window replays the engine's two-level prefix sum, and the
    // cut test is the same pure-BIGINT comparison
    "q88_ccnet_buckets" ->
      s"""WITH s AS (SELECT q.doc_id, d.lang, q.avg_nll
         |           FROM ($q77) q
         |           JOIN documents d USING (doc_id)
         |           WHERE q.avg_nll IS NOT NULL),
         |r AS (SELECT doc_id, lang, avg_nll,
         |        (row_number() OVER (PARTITION BY lang
         |           ORDER BY avg_nll, doc_id) - 1)::BIGINT AS rank,
         |        (count(*) OVER (PARTITION BY lang))::BIGINT AS n_class
         |      FROM s)
         |SELECT lang, doc_id, avg_nll, rank, n_class,
         |  CASE WHEN rank * 1000 < n_class * 300 THEN 'head'
         |       WHEN rank * 1000 < n_class * 600 THEN 'middle'
         |       ELSE 'tail' END AS bucket
         |FROM r""".stripMargin,

    // hamming pairs: brute-force all-pairs popcount as an INDEPENDENT
    // oracle — equality with the engine's banded join is the
    // pigeonhole completeness proof executed as a test
    "q89_simhash_pairs" ->
      s"""SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  bit_count(xor(a.simhash16, b.simhash16))::INTEGER AS hamming
         |FROM ($q21) a JOIN ($q21) b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash16, b.simhash16)) <= 1""".stripMargin,

    // embedding diversity: q27's bounded id-ordered centroid fold per
    // label, member cosines micro-snapped (zero-norm guarded to 0),
    // BIGINT sum, one IEEE chain for the mean
    "q90_embedding_diversity" -> {
      val dim = 64
      val w = 128
      val memCos =
        s"""(${duckDot("b.embedding", "cen.centroid", dim)} /
           |  (sqrt(${duckDot("b.embedding", "b.embedding", dim)}) *
           |   sqrt(${duckDot("cen.centroid", "cen.centroid", dim)})))"""
          .stripMargin
      val memDen =
        s"""(sqrt(${duckDot("b.embedding", "b.embedding", dim)}) *
           |  sqrt(${duckDot("cen.centroid", "cen.centroid", dim)}))"""
          .stripMargin
      s"""WITH b AS (SELECT vec_id, embedding, label FROM embeddings),
         |p1 AS (SELECT label, vec_id // $w AS bk, count(*) AS n,
         |         list_reduce(
         |           list_transform(list(embedding ORDER BY vec_id),
         |             v -> list_transform(v, x -> x::DOUBLE)),
         |           (a, c) -> list_transform(range(1, ${dim + 1}),
         |                       i -> a[i] + c[i])) AS psum
         |       FROM b GROUP BY label, vec_id // $w),
         |cs AS (SELECT label, sum(n) AS n,
         |         list_reduce(list(psum ORDER BY bk),
         |           (a, c) -> list_transform(range(1, ${dim + 1}),
         |                       i -> a[i] + c[i])) AS vsum
         |       FROM p1 GROUP BY label),
         |cen AS (SELECT label, n,
         |          list_transform(vsum, s -> s / n) AS centroid
         |        FROM cs),
         |m AS (SELECT b.label,
         |        CASE WHEN $memDen > 0.0
         |          THEN round($memCos * 1000000.0)::BIGINT
         |          ELSE 0 END AS cm
         |      FROM b JOIN cen ON b.label = cen.label)
         |SELECT m.label, count(*)::BIGINT AS n_vecs,
         |  round(sqrt(${duckDot("cen2.centroid", "cen2.centroid", dim)}),
         |    6) AS centroid_norm,
         |  round((sum(m.cm)::DOUBLE / count(*)::DOUBLE) / 1000000.0, 6)
         |    AS mean_cos
         |FROM m JOIN cen cen2 ON m.label = cen2.label
         |GROUP BY m.label, cen2.centroid""".stripMargin
    },

    // UniMax: ascending-capacity waterfill replayed in pure BIGINT —
    // capped prefix by the monotone condition, floored equal share for
    // the rest, then the shared seeded-hash token fill
    "q91_unimax_sample" ->
      """WITH tt AS (SELECT lang, doc_id,
        |              len(string_split(text, ' ')) AS n_tokens
        |            FROM documents),
        |s AS (SELECT lang, (sum(n_tokens) * 2)::BIGINT AS c FROM tt
        |      GROUP BY lang),
        |r AS (SELECT lang, c,
        |        row_number() OVER (ORDER BY c, lang)::BIGINT AS i,
        |        (sum(c) OVER (ORDER BY c, lang
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         )::BIGINT AS cum,
        |        (count(*) OVER ())::BIGINT AS k
        |      FROM s),
        |cap AS (SELECT *, (c * (k - i + 1) + (cum - c)) <= 40000
        |          AS capped FROM r),
        |st AS (SELECT coalesce(max(i), 0) AS istar,
        |         coalesce(max(cum), 0) AS cumstar
        |       FROM cap WHERE capped),
        |q AS (SELECT lang, CASE WHEN capped THEN c
        |        ELSE CASE WHEN k > istar
        |          THEN (40000 - cumstar) // (k - istar) ELSE 0 END END
        |          AS quota
        |      FROM cap, st),
        |h AS (SELECT lang, doc_id, n_tokens,
        |        md5(doc_id::VARCHAR || ':' || '31') AS h FROM tt),
        |cu AS (SELECT lang, doc_id, n_tokens,
        |        coalesce(sum(n_tokens) OVER (PARTITION BY lang
        |          ORDER BY h, doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          AS cum_before FROM h)
        |SELECT cu.lang, cu.doc_id, cu.n_tokens::INTEGER AS n_tokens,
        |  cu.cum_before::BIGINT AS cum_before
        |FROM cu JOIN q USING (lang) WHERE cum_before < quota""".stripMargin,

    // shared spans: gram anchors (hot-capped), gaps-and-islands on the
    // alignment diagonal — pure integer logic, no hashing to replay
    "q92_shared_spans" -> q92,

    // span removal: q92's spans aggregated into per-doc intervals,
    // positions excised by a containment test (1-based lambda index
    // matches Spark's i+1), untouched docs pass through
    "q93_remove_spans" ->
      s"""WITH iv AS (SELECT id_b AS doc_id,
         |        list({'s': start_b, 'e': start_b + span_len}) AS ivs
         |      FROM ($q92) GROUP BY id_b),
         |t AS (SELECT doc_id, string_split(text, ' ') AS w
         |      FROM documents),
         |j AS (SELECT t.doc_id, t.w, iv.ivs
         |      FROM t LEFT JOIN iv USING (doc_id)),
         |r AS (SELECT doc_id, w,
         |        CASE WHEN ivs IS NULL THEN w
         |          ELSE list_filter(w, (x, i) ->
         |            len(list_filter(ivs, v -> i >= v.s AND i < v.e))
         |              = 0)
         |        END AS kept
         |      FROM j)
         |SELECT doc_id,
         |  coalesce(array_to_string(kept, ' '), '') AS text_clean,
         |  (len(w) - len(kept))::INTEGER AS n_removed
         |FROM r""".stripMargin,

    // leakage-safe split: q29's recursive cluster closure, split label
    // hashed on the CLUSTER id with q62's bound chain
    "q94_cluster_safe_split" -> {
      val bounds = graft.operators.Relational
        .splitBounds(graft.SparkEntry.gateSplits)
      val chain = bounds.init
        .map { case (name, b) => s"WHEN u <= $b THEN '$name'" }
        .mkString(" ")
      s"""$clusterCtes,
         |sp AS (SELECT d.doc_id, d.lang, cl.cluster,
         |        (${h32("cluster::VARCHAR || ':13'")} + 1) / 4294967296.0
         |          AS u
         |      FROM documents d JOIN cl USING (doc_id))
         |SELECT doc_id, lang, cluster,
         |  CASE $chain ELSE '${bounds.last._1}' END AS split
         |FROM sp""".stripMargin
    },

    // fertility: q54's BPE replay + whitespace tokens, BIGINT sums,
    // ratios through one IEEE chain
    "q95_tokenizer_fertility" ->
      s"""WITH m AS ($bpeMarkedSelect),
         |b AS (SELECT doc_id, lang, n_chars,
         |        CASE WHEN len(s) = 0 THEN 0
         |          ELSE len(string_split(rtrim(s, chr(1)), chr(1))) END
         |          AS np,
         |        len(string_split(text, ' ')) AS nt
         |      FROM m JOIN (SELECT doc_id, text FROM documents) d
         |        USING (doc_id))
         |SELECT lang, count(*)::BIGINT AS n_docs,
         |  sum(nt)::BIGINT AS n_tokens, sum(np)::BIGINT AS n_pieces,
         |  sum(n_chars)::BIGINT AS sum_chars,
         |  round(sum(n_chars)::DOUBLE / sum(nt)::DOUBLE, 6)
         |    AS chars_per_token,
         |  round(sum(np)::DOUBLE / sum(nt)::DOUBLE, 6) AS fertility
         |FROM b GROUP BY lang""".stripMargin,

    // packing stats: q40's shard rule aggregated twice — fills per
    // (lang, shard), then the per-lang report; utilization over BIGINTs
    "q96_packing_stats" ->
      """WITH t AS (SELECT lang, doc_id,
        |        len(string_split(text, ' ')) AS n_tokens FROM documents),
        |c AS (SELECT lang, doc_id, n_tokens,
        |        coalesce(sum(n_tokens) OVER (PARTITION BY lang
        |          ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          AS cum FROM t),
        |f AS (SELECT lang, (cum // 1000) AS shard,
        |        sum(n_tokens)::BIGINT AS fill, count(*) AS docs
        |      FROM c GROUP BY lang, (cum // 1000))
        |SELECT lang, count(*)::BIGINT AS n_shards,
        |  sum(fill)::BIGINT AS total_tokens, sum(docs)::BIGINT AS n_docs,
        |  min(fill)::BIGINT AS min_fill, max(fill)::BIGINT AS max_fill,
        |  round(sum(fill)::DOUBLE / (count(*) * 1000)::DOUBLE, 6)
        |    AS utilization
        |FROM f GROUP BY lang""".stripMargin,

    // semantic decontamination: NOT EXISTS over the same unrounded
    // cosine fold the kernel computes — decision-identical chains
    "q97_semantic_decontaminate" -> {
      val dim = 64
      val cos =
        s"""(${duckDot("a.embedding", "b.embedding", dim)} /
           |  (sqrt(${duckDot("a.embedding", "a.embedding", dim)}) *
           |   sqrt(${duckDot("b.embedding", "b.embedding", dim)})))"""
          .stripMargin
      s"""WITH c AS (SELECT DISTINCT a.vec_id
         |  FROM embeddings a, embeddings b
         |  WHERE a.vec_id % 25 != 0 AND b.vec_id % 25 = 0
         |    AND $cos >= 0.4)
         |SELECT a.vec_id, a.label FROM embeddings a
         |WHERE a.vec_id % 25 != 0
         |  AND a.vec_id NOT IN (SELECT vec_id FROM c)""".stripMargin
    },

    // Count-Min frequency sketch: per-row bucket counts rebuilt with
    // the same md5 % P universal-hash family, probe = min over rows;
    // exact counts alongside prove the overcount-only guarantee
    "q102_cms_freq" -> {
      val W = 1024
      val probes =
        graft.SparkEntry.cmsProbeTerms.map(t => s"'$t'").mkString(", ")
      def hv(e: String) =
        s"(('0x' || substr(md5($e), 1, 8))::UBIGINT)::BIGINT % $P"
      val rows = (0 until 4).map(TextOps.minhashParams)
      val cCtes = rows.zipWithIndex.map { case ((a, b), r) =>
        s"""c$r AS (SELECT (($a * hv + $b) % $P) % $W AS bk,
           |  count(*)::BIGINT AS c FROM h GROUP BY 1)""".stripMargin
      }.mkString(",\n")
      val joins = rows.zipWithIndex.map { case ((a, b), r) =>
        s"LEFT JOIN c$r ON c$r.bk = (($a * ph.hv + $b) % $P) % $W"
      }.mkString("\n")
      val leasts = (0 until 4).map(r => s"coalesce(c$r.c, 0)").mkString(", ")
      s"""WITH tok AS (SELECT string_split(text, ' ') AS w FROM documents),
         |t AS (SELECT unnest(w) AS term FROM tok),
         |h AS (SELECT ${hv("term")} AS hv FROM t),
         |$cCtes,
         |probes AS (SELECT unnest([$probes]) AS term),
         |ph AS (SELECT term, ${hv("term")} AS hv FROM probes),
         |ex AS (SELECT term, count(*)::BIGINT AS c FROM t GROUP BY term)
         |SELECT ph.term, least($leasts) AS est_count,
         |  coalesce(ex.c, 0) AS exact_count
         |FROM ph
         |$joins
         |LEFT JOIN ex ON ex.term = ph.term""".stripMargin
    },

    // KMV distinct-count sketch: replay of the k-min-hash set over the
    // hash32 domain (distinct hv == the sketch's value dedup), kth +
    // estimate derived through the same single IEEE chain
    "q100_kmv_distinct" ->
      """WITH tok AS (SELECT source, string_split(text, ' ') AS w
        |             FROM documents),
        |g AS (SELECT source, unnest(list_transform(range(1, len(w) - 1),
        |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gram
        |      FROM tok),
        |h AS (SELECT DISTINCT source,
        |        (('0x' || substr(md5(gram), 1, 8))::UBIGINT)::BIGINT AS hv
        |      FROM g),
        |r AS (SELECT source, hv,
        |        row_number() OVER (PARTITION BY source ORDER BY hv) AS rn
        |      FROM h)
        |SELECT source, count(*)::BIGINT AS k_actual, max(hv) AS kth,
        |  CASE WHEN count(*) < 128 THEN count(*)::DOUBLE
        |       ELSE round((127.0 * 4294967296.0) / max(hv), 6) END
        |    AS est_distinct
        |FROM r WHERE rn <= 128 GROUP BY source""".stripMargin,

    // KMV sketch set-algebra: per-pair merged k-min set (a valid union
    // sketch), Jaccard = fraction of merged values present in both
    "q101_sketch_overlap" ->
      """WITH tok AS (SELECT source, string_split(text, ' ') AS w
        |             FROM documents),
        |g AS (SELECT source, unnest(list_transform(range(1, len(w) - 1),
        |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gram
        |      FROM tok),
        |h AS (SELECT DISTINCT source,
        |        (('0x' || substr(md5(gram), 1, 8))::UBIGINT)::BIGINT AS hv
        |      FROM g),
        |r AS (SELECT source, hv,
        |        row_number() OVER (PARTITION BY source ORDER BY hv) AS rn
        |      FROM h),
        |sk AS (SELECT source, hv FROM r WHERE rn <= 128),
        |p AS (SELECT a.source AS sa, b.source AS sb
        |      FROM (SELECT DISTINCT source FROM documents) a
        |      JOIN (SELECT DISTINCT source FROM documents) b
        |        ON a.source < b.source),
        |ud AS (SELECT p.sa, p.sb, s.hv,
        |        max(CASE WHEN s.source = p.sa THEN 1 ELSE 0 END) AS ina,
        |        max(CASE WHEN s.source = p.sb THEN 1 ELSE 0 END) AS inb
        |       FROM p JOIN sk s ON s.source IN (p.sa, p.sb)
        |       GROUP BY p.sa, p.sb, s.hv),
        |m AS (SELECT * FROM (SELECT ud.*, row_number() OVER
        |        (PARTITION BY sa, sb ORDER BY hv) AS rn FROM ud)
        |      WHERE rn <= 128)
        |SELECT sa AS source_a, sb AS source_b,
        |  count(*)::BIGINT AS m_size,
        |  sum(ina * inb)::BIGINT AS n_both,
        |  round(sum(ina * inb)::DOUBLE / count(*), 6) AS est_jaccard,
        |  CASE WHEN count(*) < 128 THEN count(*)::DOUBLE
        |       ELSE round((127.0 * 4294967296.0) / max(hv), 6) END
        |    AS est_union
        |FROM m GROUP BY sa, sb""".stripMargin,

    // per-source frequency cap: single-window SQL twin of the
    // two-level Spark formulation (value-identical by construction)
    "q98_source_cap" ->
      """WITH r AS (SELECT source, doc_id,
        |  (row_number() OVER (PARTITION BY source
        |     ORDER BY md5(doc_id::VARCHAR || ':' || '29'), doc_id)
        |   - 1)::BIGINT AS rank FROM documents)
        |SELECT source, doc_id, rank FROM r WHERE rank < 15""".stripMargin,

    "q29_dedup_clusters" -> q29,
    "q74_dedup_report" -> q74,
    "q33_exact_jaccard" -> q33,
    "q34_cosine_near_dup" -> q34,
    "q35_token_estimate" -> q35,

    "q32_frame_slice" ->
      """SELECT l_orderkey, l_linenumber AS frameId, l_partkey, l_quantity
        |FROM lineitem WHERE l_linenumber = 3""".stripMargin,

    "q38_chunking" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w
        |           FROM documents),
        |n AS (SELECT doc_id, w, len(w) AS nt,
        |        CASE WHEN len(w) <= 40 THEN 0
        |             ELSE (len(w) - 40 + 29) // 30 END AS extra FROM t),
        |u AS (SELECT doc_id,
        |        unnest(list_transform(range(0, extra + 1),
        |          i -> {'chunk_id': i,
        |                'chunk_text': array_to_string(
        |                  list_slice(w, i * 30 + 1, i * 30 + 40), ' ')}))
        |          AS c
        |      FROM n)
        |SELECT doc_id, (c.chunk_id)::INTEGER AS chunk_id,
        |  c.chunk_text AS chunk_text
        |FROM u""".stripMargin,

    "q39_stratified_sample" ->
      """WITH r AS (SELECT lang, doc_id,
        |        md5(doc_id::VARCHAR || ':' || '42') AS h FROM documents),
        |w AS (SELECT lang, doc_id,
        |        row_number() OVER (PARTITION BY lang ORDER BY h, doc_id)
        |          AS rn FROM r)
        |SELECT lang, (rn - 1)::INTEGER AS pos, doc_id
        |FROM w WHERE rn <= 20""".stripMargin,

    "q40_token_shards" ->
      """WITH t AS (SELECT lang, doc_id,
        |        len(string_split(text, ' ')) AS n_tokens FROM documents),
        |c AS (SELECT lang, doc_id, n_tokens,
        |        coalesce(sum(n_tokens) OVER (PARTITION BY lang
        |          ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          AS cum FROM t)
        |SELECT lang, doc_id, n_tokens::INTEGER AS n_tokens,
        |  (cum // 1000)::INTEGER AS shard
        |FROM c""".stripMargin,

    // q40's shard rule + group-concat in doc-id order — the packed
    // sequence assembly (state bounded by the shard budget)
    "q59_pack_sequences" ->
      """WITH t AS (SELECT lang, doc_id, text,
        |        len(string_split(text, ' ')) AS n_tokens FROM documents),
        |c AS (SELECT lang, doc_id, text, n_tokens,
        |        coalesce(sum(n_tokens) OVER (PARTITION BY lang
        |          ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          AS cum FROM t),
        |s AS (SELECT lang, doc_id, text, n_tokens,
        |        (cum // 1000)::INTEGER AS shard FROM c)
        |SELECT lang, shard, count(*)::INTEGER AS n_docs,
        |  sum(n_tokens)::BIGINT AS shard_tokens,
        |  array_to_string(list(text ORDER BY doc_id), ' ') AS packed_text
        |FROM s GROUP BY lang, shard""".stripMargin,

    // q59 + loader metadata: member ids and exclusive per-doc token
    // offsets (integer-exact prefix sums, O(n²) slice-sum formulation —
    // values identical to Spark's array fold), arrays as CSV strings
    "q73_pack_offsets" ->
      """WITH t AS (SELECT lang, doc_id, text,
        |        len(string_split(text, ' ')) AS n_tokens FROM documents),
        |c AS (SELECT lang, doc_id, text, n_tokens,
        |        coalesce(sum(n_tokens) OVER (PARTITION BY lang
        |          ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          AS cum FROM t),
        |s AS (SELECT lang, doc_id, text, n_tokens,
        |        (cum // 1000)::INTEGER AS shard FROM c)
        |SELECT lang, shard, count(*)::INTEGER AS n_docs,
        |  sum(n_tokens)::BIGINT AS shard_tokens,
        |  array_to_string(list(doc_id ORDER BY doc_id), ',') AS doc_ids_csv,
        |  array_to_string(
        |    list_transform(range(1, count(*) + 1),
        |      i -> coalesce(list_sum(list_slice(
        |             list(n_tokens ORDER BY doc_id), 1, i - 1)), 0)),
        |    ',') AS doc_offsets_csv,
        |  array_to_string(list(text ORDER BY doc_id), ' ') AS packed_text
        |FROM s GROUP BY lang, shard""".stripMargin,

    // q42's observability twin: per-eval-doc shared-doc/shared-gram
    // counts over the same 5-gram split, zeros kept via the left join
    "q60_contamination_report" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w
        |           FROM documents),
        |g AS (SELECT doc_id, unnest(list_transform(range(1, len(w) - 3),
        |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
        |             w[i+3] || ' ' || w[i+4])) AS gram FROM t),
        |eg AS (SELECT DISTINCT doc_id AS eid, gram FROM g
        |       WHERE doc_id % 50 = 0),
        |tg AS (SELECT DISTINCT doc_id AS tid, gram FROM g
        |       WHERE doc_id % 50 != 0),
        |a AS (SELECT eid, count(DISTINCT tid) AS n_train_docs,
        |        count(DISTINCT gram) AS n_shared_grams
        |      FROM eg JOIN tg USING (gram) GROUP BY eid)
        |SELECT d.doc_id,
        |  coalesce(a.n_train_docs, 0) AS n_train_docs,
        |  coalesce(a.n_shared_grams, 0) AS n_shared_grams
        |FROM documents d LEFT JOIN a ON a.eid = d.doc_id
        |WHERE d.doc_id % 50 = 0""".stripMargin,

    // loadable-vocab OOV coverage: NOT IN over the same fixture list
    "q61_oov_rate" -> {
      val set = graft.SparkEntry.gateVocab.map(t => s"'$t'").mkString(", ")
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w
         |           FROM documents)
         |SELECT doc_id,
         |  len(w)::INTEGER AS n_tokens,
         |  len(list_filter(w, x -> x NOT IN ($set)))::INTEGER AS n_oov,
         |  round(len(list_filter(w, x -> x NOT IN ($set)))::DOUBLE /
         |    greatest(len(w), 1), 6) AS oov_rate
         |FROM t""".stripMargin
    },

    // deterministic hash split: the same md5 uniform as q45, CASE over
    // the IDENTICAL IEEE cumulative bounds (generated from splitBounds —
    // 0.8 + 0.1 is 0.9000000000000001, embedding "0.9" would diverge)
    "q62_hash_split" -> {
      val bounds = graft.operators.Relational
        .splitBounds(graft.SparkEntry.gateSplits)
      val chain = bounds.init
        .map { case (name, b) => s"WHEN u <= $b THEN '$name'" }
        .mkString(" ")
      s"""WITH h AS (SELECT doc_id, lang, n_chars,
         |        (${h32("doc_id::VARCHAR || ':13'")} + 1) / 4294967296.0
         |          AS u FROM documents)
         |SELECT doc_id, lang, n_chars,
         |  CASE $chain ELSE '${bounds.last._1}' END AS split
         |FROM h""".stripMargin
    },

    // token-quota mixture sampler: single-window SQL twin of the
    // two-level Spark formulation (value-identical by construction)
    "q63_token_quota" ->
      """WITH t AS (SELECT lang, doc_id,
        |        len(string_split(text, ' ')) AS n_tokens,
        |        md5(doc_id::VARCHAR || ':' || '17') AS h FROM documents),
        |c AS (SELECT lang, doc_id, n_tokens,
        |        coalesce(sum(n_tokens) OVER (PARTITION BY lang
        |          ORDER BY h, doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          AS cum_before FROM t)
        |SELECT lang, doc_id, n_tokens::INTEGER AS n_tokens,
        |  cum_before::BIGINT AS cum_before
        |FROM c WHERE cum_before < 800""".stripMargin,

    // per-class composition report — integer-exact aggregates only
    "q64_corpus_stats" ->
      """SELECT lang,
        |  count(*) AS n_docs,
        |  sum(len(string_split(text, ' ')))::BIGINT AS n_tokens,
        |  sum(len(text))::BIGINT AS n_chars,
        |  count(DISTINCT source) AS n_sources
        |FROM documents GROUP BY lang""".stripMargin,

    "q41_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w
        |           FROM documents),
        |s AS (SELECT doc_id, list_transform(range(1, len(w) - 1),
        |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS sh FROM t)
        |SELECT doc_id,
        |  len(sh)::INTEGER AS n_grams,
        |  len(list_distinct(sh))::INTEGER AS n_distinct,
        |  round((len(sh) - len(list_distinct(sh)))::DOUBLE /
        |    greatest(len(sh), 1), 6) AS dup_ratio,
        |  CASE WHEN len(sh) = 0 THEN 0
        |       ELSE list_max(list_transform(list_distinct(sh),
        |              g -> len(list_filter(sh, x -> x = g)))) END::INTEGER
        |    AS max_count
        |FROM s""".stripMargin,

    "q42_decontaminate" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w
        |           FROM documents),
        |g AS (SELECT doc_id, unnest(list_transform(range(1, len(w) - 3),
        |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
        |             w[i+3] || ' ' || w[i+4])) AS gram FROM t),
        |e AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0),
        |c AS (SELECT DISTINCT g.doc_id FROM g JOIN e USING (gram)
        |      WHERE g.doc_id % 50 != 0)
        |SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE doc_id % 50 != 0 AND doc_id NOT IN (SELECT doc_id FROM c)""".stripMargin,

    "q43_vocab" ->
      """SELECT token, count(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS token
        |      FROM documents)
        |GROUP BY token ORDER BY n DESC, token LIMIT 100""".stripMargin,

    "q36_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS p50,
        |  round(quantile_cont(l_quantity, 0.95), 6) AS p95
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q37_range_join" ->
      """WITH c AS (SELECT event_id, user_id, ts FROM events
        |           WHERE event_type = 'click'),
        |p AS (SELECT user_id, event_id AS purchase_id, ts AS lo,
        |        ts + INTERVAL 1 HOUR AS hi FROM events
        |      WHERE event_type = 'purchase')
        |SELECT c.event_id, c.user_id,
        |  CAST(floor(epoch(c.ts)) AS BIGINT) AS click_epoch,
        |  p.purchase_id
        |FROM c JOIN p
        |  ON c.user_id = p.user_id AND c.ts >= p.lo AND c.ts <= p.hi""".stripMargin,

    "q19_text_stats" ->
      s"""SELECT doc_id,
         |  len(text)::INTEGER AS n_chars_calc,
         |  len(string_split(text, ' '))::INTEGER AS n_tokens,
         |  len(list_distinct(string_split(text, ' ')))::INTEGER AS n_distinct_tokens,
         |  list_reduce(
         |    list_transform(string_split(text, ' '), t -> ${h32("t")} % $FP),
         |    (a, b) -> (a * 31 + b) % $FP) AS fingerprint
         |FROM documents""".stripMargin,

    "q20_text_quality" -> q20,
    "q21_simhash" -> q21,
    "q56_keep_best" -> q56,

    // the Bloom prefilter has no false negatives and the exact join
    // kills false positives, so the EXACT decontamination SQL is the
    // oracle for the bloom-prefiltered Spark path (k=4 grams, %25 split)
    "q55_decontaminate_bloom" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w
        |           FROM documents),
        |g AS (SELECT doc_id, unnest(list_transform(range(1, len(w) - 2),
        |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
        |             w[i+3])) AS gram FROM t),
        |e AS (SELECT DISTINCT gram FROM g WHERE doc_id % 25 = 0),
        |c AS (SELECT DISTINCT g.doc_id FROM g JOIN e USING (gram)
        |      WHERE g.doc_id % 25 != 0)
        |SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE doc_id % 25 != 0 AND doc_id NOT IN (SELECT doc_id FROM c)""".stripMargin,

    "q22_nearest_distance" ->
      """WITH p AS (
        |  SELECT a.l_orderkey, a.l_linenumber AS ln, b.l_linenumber AS nb,
        |    round(sqrt((a.l_quantity - b.l_quantity)
        |               * (a.l_quantity - b.l_quantity)
        |             + (a.l_discount - b.l_discount)
        |               * (a.l_discount - b.l_discount)), 6) AS d
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey
        |   AND a.l_linenumber != b.l_linenumber),
        |r AS (SELECT l_orderkey, ln, nb, d,
        |        row_number() OVER (PARTITION BY l_orderkey, ln
        |          ORDER BY d, nb) AS rn FROM p)
        |SELECT l_orderkey, ln AS l_linenumber, nb AS nearest_id,
        |  d AS nearest_dist
        |FROM r WHERE rn = 1""".stripMargin,

    "q23_events_window" ->
      """SELECT user_id,
        |  CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS window_start,
        |  count(*) AS n_events,
        |  round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q24_sessionize" -> q24Sessionize,

    "q30_asof_join" ->
      """WITH c AS (SELECT event_id, user_id, ts, value FROM events
        |           WHERE event_type = 'click'),
        |p AS (SELECT user_id, ts, event_id AS purchase_id,
        |        value AS purchase_value FROM events
        |      WHERE event_type = 'purchase')
        |SELECT c.event_id, c.user_id,
        |  CAST(floor(epoch(c.ts)) AS BIGINT) AS click_epoch,
        |  p.purchase_id, p.purchase_value
        |FROM c JOIN p ON c.user_id = p.user_id AND p.ts <= c.ts
        |QUALIFY row_number() OVER (PARTITION BY c.event_id
        |  ORDER BY p.ts DESC, p.purchase_id DESC) = 1""".stripMargin,

    "q31_pivot" ->
      """SELECT user_id,
        |  count(*) FILTER (event_type = 'click') AS click,
        |  count(*) FILTER (event_type = 'error') AS error,
        |  count(*) FILTER (event_type = 'purchase') AS purchase,
        |  count(*) FILTER (event_type = 'signup') AS signup,
        |  count(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY user_id""".stripMargin,

    "q28_salted_join" ->
      """SELECT l.l_orderkey, l.l_linenumber, l.l_partkey, l.l_suppkey,
        |  l.l_quantity, o.o_orderstatus, o.o_totalprice
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey""".stripMargin,

    "q25_multimodal_meta" ->
      """SELECT doc_id, len(text)::INTEGER AS n_bytes, sha256(text) AS content_sha,
        |  lower(hex(substr(text, 1, 4))) AS magic_hex
        |FROM documents""".stripMargin,

    "q44_tfidf" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |           FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents)
        |SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
        |  round((tf.tf * (n.n_docs + 1.0)) / (dfreq.df + 1.0), 6) AS tfidf
        |FROM tf JOIN dfreq USING (term) CROSS JOIN n""".stripMargin,

    "q45_weighted_sample" ->
      s"""WITH h AS (SELECT doc_id, n_chars,
         |        ${h32("doc_id::VARCHAR || ':7'")} AS hv FROM documents)
         |SELECT doc_id, n_chars,
         |  round(n_chars / ((hv + 1) / 4294967296.0), 6) AS priority
         |FROM h ORDER BY priority DESC, doc_id LIMIT 50""".stripMargin,

    "q46_redact" -> {
      // the shared RE2-safe patterns — single definition on both engines
      val url = TextOps.urlPattern
      val email = TextOps.emailPattern
      s"""WITH r AS (SELECT doc_id,
         |        CASE WHEN doc_id % 7 = 0 THEN text ||
         |          ' contact admin@example.com or https://data.example.com/dl?id='
         |          || doc_id::VARCHAR
         |        ELSE text END AS raw FROM documents)
         |SELECT doc_id,
         |  len(regexp_extract_all(raw, '$url'))::INTEGER AS n_urls,
         |  len(regexp_extract_all(raw, '$email'))::INTEGER AS n_emails,
         |  regexp_replace(regexp_replace(raw, '$url', '<URL>', 'g'),
         |    '$email', '<EMAIL>', 'g') AS clean_text
         |FROM r""".stripMargin
    },

    "q52_stratified_priority" ->
      s"""WITH h AS (SELECT lang, doc_id, n_chars,
         |        ${h32("doc_id::VARCHAR || ':11'")} AS hv FROM documents),
         |p AS (SELECT lang, doc_id,
         |        round(n_chars / ((hv + 1) / 4294967296.0), 6) AS priority
         |      FROM h),
         |r AS (SELECT lang, doc_id, priority,
         |        row_number() OVER (PARTITION BY lang
         |          ORDER BY priority DESC, doc_id) AS rn FROM p)
         |SELECT lang, (rn - 1)::INTEGER AS pos, doc_id, priority
         |FROM r WHERE rn <= 15""".stripMargin,

    "q51_hard_negatives" -> {
      val dim = 64
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv, label AS qlabel
         |           FROM embeddings WHERE vec_id < 10),
         |c AS (SELECT vec_id AS cid, embedding AS cv, label AS clabel
         |      FROM embeddings),
         |p AS (SELECT qid, cid,
         |        round(${duckDot("qv", "cv", dim)} /
         |          (sqrt(${duckDot("qv", "qv", dim)}) *
         |           sqrt(${duckDot("cv", "cv", dim)})), 6) AS cos_sim
         |      FROM q, c WHERE qid != cid AND qlabel != clabel),
         |r AS (SELECT qid, cid, cos_sim,
         |        row_number() OVER (PARTITION BY qid
         |          ORDER BY cos_sim DESC, cid) AS rn FROM p)
         |SELECT qid, (rn - 1)::INTEGER AS rank, cid AS neighbor, cos_sim
         |FROM r WHERE rn <= 5""".stripMargin
    },

    "q50_zorder" -> {
      val terms = (0 until 10).map { b =>
        s"((x >> $b) & 1) * ${1L << (2 * b)} + " +
          s"((y >> $b) & 1) * ${1L << (2 * b + 1)}"
      }.mkString("(", " + ", ")")
      s"""WITH d AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
         |        (l_partkey % 1024)::INTEGER AS x,
         |        (l_suppkey % 1024)::INTEGER AS y
         |      FROM lineitem)
         |SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
         |  ($terms)::BIGINT AS zval
         |FROM d
         |ORDER BY zval, l_orderkey, l_linenumber, l_partkey, l_suppkey
         |LIMIT 100""".stripMargin
    },

    "q48_kmeans" ->
      s"""WITH ${kmeansBody(4, 2, 128, 64)}
         |SELECT vid AS vec_id, cid AS cluster, round(d2, 6) AS d2
         |FROM afinal""".stripMargin,

    // SemDedup: kmeans cells (replayed via the shared CTEs) block the
    // pairwise cosine; threshold 0.2; recursive closure; min-id survivor
    "q58_semdedup" -> {
      val dim = 64
      def cos(a: String, b: String) =
        s"""round(${duckDot(a, b, dim)} /
           |  (sqrt(${duckDot(a, a, dim)}) *
           |   sqrt(${duckDot(b, b, dim)})), 6)""".stripMargin
      s"""WITH RECURSIVE ${kmeansBody(4, 2, 128, 64)},
         |vv AS (SELECT vec_id, embedding FROM embeddings),
         |pp AS (SELECT a.vid AS ia, b.vid AS ib,
         |         ${cos("va.embedding", "vb.embedding")} AS cos_sim
         |       FROM afinal a JOIN afinal b
         |         ON a.cid = b.cid AND a.vid < b.vid
         |       JOIN vv va ON va.vec_id = a.vid
         |       JOIN vv vb ON vb.vec_id = b.vid),
         |pr AS (SELECT ia, ib FROM pp WHERE cos_sim >= 0.2),
         |ee AS (SELECT ia AS s, ib AS t FROM pr
         |       UNION SELECT ib, ia FROM pr),
         |rr AS (SELECT vec_id AS s, vec_id AS t FROM embeddings
         |       UNION SELECT rr.s, ee.t FROM rr JOIN ee ON rr.t = ee.s),
         |cc AS (SELECT s AS vec_id, min(t) AS cluster FROM rr GROUP BY s)
         |SELECT e.vec_id, e.label FROM embeddings e
         |JOIN cc USING (vec_id) WHERE cc.cluster = e.vec_id""".stripMargin
    },

    "q54_bpe_vocab" ->
      s"""WITH m AS ($bpeMarkedSelect)
         |SELECT doc_id,
         |  CAST(CASE WHEN len(s) = 0 THEN 0
         |       ELSE len(string_split(rtrim(s, chr(1)), chr(1))) END
         |    AS INTEGER) AS n_tokens_vocab,
         |  replace(rtrim(s, chr(1)), chr(1), ' ') AS pieces
         |FROM m""".stripMargin,

    "q53_langid_profile" -> {
      // replay SparkEntry.gateLangProfiles: per-language CASE-mapped gram
      // weights (integer-valued doubles — sums exact in any order), argmax
      // with the alphabetical-first positive-max rule, score_en exposed
      val profs = graft.SparkEntry.gateLangProfiles.toSeq.sortBy(_._1)
      def scoreExpr(p: Map[String, Double]): String = {
        val cases = p.toSeq.sorted
          .map { case (g, w) => s"WHEN '$g' THEN $w" }.mkString(" ")
        s"""coalesce(list_sum(list_transform(grams,
           |  g -> CAST(CASE g $cases ELSE 0.0 END AS DOUBLE))), 0.0)"""
          .stripMargin
      }
      val scoreCols = profs
        .map { case (l, p) => s"${scoreExpr(p)} AS s_$l" }.mkString(",\n  ")
      val best = profs.map { case (l, _) => s"s_$l" }.mkString("greatest(", ", ", ")")
      val chain = profs
        .map { case (l, _) => s"WHEN s_$l > 0 AND s_$l = $best THEN '$l'" }
        .mkString(" ")
      s"""WITH g AS (SELECT doc_id,
         |        list_transform(range(1, len(lower(text)) - 1),
         |          i -> substr(lower(text), i, 3)) AS grams
         |      FROM documents),
         |s AS (SELECT doc_id,
         |  $scoreCols
         |FROM g)
         |SELECT doc_id,
         |  CASE $chain ELSE 'und' END AS lang_pred,
         |  round(s_en, 6) AS score_en
         |FROM s""".stripMargin
    },

    // TPC-H Q10 shape: returns revenue per customer, ordered limit
    "q198_returned_items" ->
      """SELECT c.c_custkey, c.c_name, n.n_name,
        |  sum((round(l.l_extendedprice * (1.0 - l.l_discount)
        |    * 100.0))::BIGINT)::BIGINT AS revenue_cents
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE l.l_returnflag = 'R'
        |  AND o.o_orderdate >= '1995-07-01'
        |  AND o.o_orderdate < '1995-10-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue_cents DESC, c_custkey LIMIT 20""".stripMargin,

    // Nation revenue share: per-nation micro-cent sums + one division
    // against the 1-row total
    "q199_revenue_share" ->
      """WITH per AS (SELECT n.n_name,
        |    sum((round(l.l_extendedprice * (1.0 - l.l_discount)
        |      * 100.0))::BIGINT)::BIGINT AS revenue_cents
        |  FROM lineitem l
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  GROUP BY 1),
        |t AS (SELECT sum(revenue_cents)::BIGINT AS tot FROM per)
        |SELECT n_name, revenue_cents,
        |  round(revenue_cents::DOUBLE / tot::DOUBLE, 6) AS share
        |FROM per CROSS JOIN t""".stripMargin,

    // CMS join-cardinality estimate: both sides' depth×width counter
    // grids rebuilt with the md5 % P universal-hash family, estimate =
    // min over rows of the bucket-wise inner product; exact Σ nv·np
    // alongside proves the overcount-only guarantee
    "q201_join_cardinality" -> {
      val W = 1024
      def hvOf(e: String) =
        s"(('0x' || substr(md5($e), 1, 8))::UBIGINT)::BIGINT % $P"
      val rows = (0 until 4).map(TextOps.minhashParams)
      val sideCtes = rows.zipWithIndex.flatMap { case ((a, b), r) =>
        Seq(
          s"""v$r AS (SELECT (($a * hv + $b) % $P) % $W AS bk,
             |  count(*)::BIGINT AS c FROM hv WHERE et = 'view'
             |  GROUP BY 1)""".stripMargin,
          s"""p$r AS (SELECT (($a * hv + $b) % $P) % $W AS bk,
             |  count(*)::BIGINT AS c FROM hv WHERE et = 'purchase'
             |  GROUP BY 1)""".stripMargin,
          s"""e$r AS (SELECT coalesce(sum(v$r.c * p$r.c), 0)::BIGINT
             |  AS est FROM v$r JOIN p$r USING (bk))""".stripMargin)
      }.mkString(",\n")
      s"""WITH hv AS (SELECT event_type AS et,
         |    ${hvOf("user_id::VARCHAR")} AS hv
         |  FROM events WHERE event_type IN ('view', 'purchase')),
         |$sideCtes,
         |uv AS (SELECT user_id, count(*)::BIGINT AS nv FROM events
         |       WHERE event_type = 'view' GROUP BY 1),
         |up AS (SELECT user_id, count(*)::BIGINT AS np FROM events
         |       WHERE event_type = 'purchase' GROUP BY 1),
         |ex AS (SELECT coalesce(sum(nv * np), 0)::BIGINT AS exact_pairs,
         |         count(*)::BIGINT AS n_users_both
         |       FROM uv JOIN up USING (user_id)),
         |ns AS (SELECT
         |    (SELECT count(*) FROM events
         |     WHERE event_type = 'view')::BIGINT AS n_view,
         |    (SELECT count(*) FROM events
         |     WHERE event_type = 'purchase')::BIGINT AS n_purchase)
         |SELECT ns.n_view, ns.n_purchase, ex.n_users_both,
         |  ex.exact_pairs,
         |  least(e0.est, e1.est, e2.est, e3.est) AS est_pairs
         |FROM ns, ex, e0, e1, e2, e3""".stripMargin
    },

    // preference pairs: type-token-ratio micros (one exact-integer
    // division), per-lang best/worst via doc_id-tie-broken windows
    "q202_preference_pairs" ->
      """WITH s AS (SELECT doc_id, lang,
        |    len(string_split(text, ' '))::BIGINT AS nt,
        |    len(list_distinct(string_split(text, ' ')))::BIGINT AS nd
        |  FROM documents),
        |sc AS (SELECT doc_id, lang,
        |    (round(nd * 1000000.0 / nt))::BIGINT AS score FROM s),
        |r AS (SELECT lang, doc_id, score,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY score DESC, doc_id) AS rb,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY score ASC, doc_id) AS rw
        |  FROM sc),
        |c AS (SELECT lang, doc_id AS chosen_doc,
        |        score AS chosen_score_micro FROM r WHERE rb = 1),
        |j AS (SELECT lang, doc_id AS rejected_doc,
        |        score AS rejected_score_micro FROM r WHERE rw = 1),
        |n AS (SELECT lang, count(*)::BIGINT AS n_candidates
        |      FROM sc GROUP BY 1)
        |SELECT c.lang, chosen_doc, rejected_doc, chosen_score_micro,
        |  rejected_score_micro,
        |  (chosen_score_micro - rejected_score_micro)::BIGINT
        |    AS margin_micro,
        |  n_candidates
        |FROM c JOIN j USING (lang) JOIN n USING (lang)""".stripMargin,

    // token-F1 eval: multiset overlap via nested list lambdas — the
    // same least(count-in-pred, count-in-ref) fold per distinct ref
    // token; micros from single exact-integer divisions
    "q203_eval_f1" ->
      """WITH b AS (SELECT doc_id,
        |    (string_split(text, ' '))[1:8] AS ref FROM documents),
        |d AS (SELECT doc_id, ref,
        |    CASE WHEN doc_id % 3 = 0
        |      THEN array_slice(ref, 1, len(ref) - 1) ELSE ref END AS dp
        |  FROM b),
        |pr AS (SELECT doc_id, ref,
        |    CASE WHEN doc_id % 5 = 0 AND len(dp) >= 1
        |      THEN list_concat(['the'], array_slice(dp, 2, len(dp)))
        |      ELSE dp END AS pred
        |  FROM d),
        |ov AS (SELECT doc_id,
        |    len(pred)::BIGINT AS n_pred, len(ref)::BIGINT AS n_ref,
        |    coalesce(list_sum(list_transform(list_distinct(ref), t ->
        |      least(len(list_filter(pred, x -> x = t)),
        |            len(list_filter(ref, x -> x = t))))), 0)::BIGINT
        |      AS overlap
        |  FROM pr)
        |SELECT doc_id, n_pred, n_ref, overlap,
        |  CASE WHEN n_pred = 0 THEN 0
        |    ELSE (round(overlap * 1000000.0 / n_pred))::BIGINT END
        |    AS p_micro,
        |  CASE WHEN n_ref = 0 THEN 0
        |    ELSE (round(overlap * 1000000.0 / n_ref))::BIGINT END
        |    AS r_micro,
        |  CASE WHEN n_pred + n_ref = 0 THEN 0
        |    ELSE (round(overlap * 2000000.0 /
        |      (n_pred + n_ref)))::BIGINT END AS f1_micro
        |FROM ov""".stripMargin,

    // nDCG@10: window-ranked replay of the heap top-10, micro-snapped
    // DCG terms (exact-int gains, micro-nat ln discount, one mirrored
    // division per term), integer sums
    "q208_ndcg" ->
      """WITH s AS (SELECT doc_id,
        |    len(list_filter(string_split(text, ' '),
        |      x -> x = 'data'))::BIGINT AS tf
        |  FROM documents),
        |t AS (SELECT doc_id, tf, doc_id % 4 AS rel FROM s
        |      ORDER BY tf DESC, doc_id LIMIT 10),
        |r AS (SELECT doc_id, tf, rel,
        |      row_number() OVER (ORDER BY tf DESC, doc_id) - 1 AS pos
        |      FROM t),
        |lt AS (SELECT pos, doc_id, tf, rel,
        |      ([0, 1, 3, 7])[rel + 1]::BIGINT AS g,
        |      (round(ln((pos + 2)::DOUBLE) * 1000000.0))::BIGINT AS lnm
        |      FROM r),
        |tm AS (SELECT pos, doc_id, tf, rel,
        |      (round(g::DOUBLE * 1000000000000.0 /
        |        lnm::DOUBLE))::BIGINT AS gain_term_micro FROM lt),
        |agg AS (SELECT sum(gain_term_micro)::BIGINT AS dcg_micro
        |        FROM tm),
        |ideal AS (SELECT row_number() OVER (ORDER BY rel DESC) - 1
        |            AS ipos, rel FROM t),
        |it AS (SELECT ([0, 1, 3, 7])[rel + 1]::BIGINT AS g,
        |      (round(ln((ipos + 2)::DOUBLE) * 1000000.0))::BIGINT AS lnm
        |      FROM ideal),
        |iagg AS (SELECT sum((round(g::DOUBLE * 1000000000000.0 /
        |        lnm::DOUBLE))::BIGINT)::BIGINT AS idcg_micro FROM it)
        |SELECT pos::INTEGER AS pos, doc_id, tf, rel::BIGINT AS rel,
        |  gain_term_micro, dcg_micro, idcg_micro,
        |  CASE WHEN idcg_micro = 0 THEN 0
        |    ELSE (round(dcg_micro::DOUBLE * 1000000.0 /
        |      idcg_micro::DOUBLE))::BIGINT END AS ndcg_micro
        |FROM tm, agg, iagg""".stripMargin,

    // Bloom prefilter is row-invisible (no false negatives + exact
    // join): the oracle is the plain join
    "q206_bloom_join_prune" ->
      """SELECT o.o_orderdate,
        |  sum((round(l.l_extendedprice * (1.0 - l.l_discount)
        |    * 100.0))::BIGINT)::BIGINT AS revenue_cents,
        |  count(*)::BIGINT AS n_items
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderpriority = '1-URGENT'
        |  AND o.o_orderdate >= '1995-03-01'
        |  AND o.o_orderdate < '1995-04-01'
        |GROUP BY 1""".stripMargin,

    // CUPED: milli-int per-user sums, HUGEINT moments (== Spark's
    // decimal(38,0)), θ and adjusted means via mirrored single
    // divisions
    "q207_cuped" -> {
      val theta =
        """CASE WHEN (n * sxx - sx * sx)::DOUBLE = 0 THEN 0
          |    ELSE (n * sxy - sx * sy)::DOUBLE /
          |         (n * sxx - sx * sx)::DOUBLE END""".stripMargin
      s"""WITH ev AS (SELECT user_id, floor(epoch(ts))::BIGINT AS tse,
         |    event_type, (round(value * 1000.0))::BIGINT AS vm
         |  FROM events),
         |u AS (SELECT user_id,
         |    coalesce(sum(CASE WHEN tse < 1705363200 THEN vm
         |      ELSE 0 END), 0)::BIGINT AS x,
         |    coalesce(sum(CASE WHEN tse >= 1705363200
         |      AND event_type = 'purchase' THEN vm ELSE 0 END),
         |      0)::BIGINT AS y
         |  FROM ev GROUP BY 1),
         |g AS (SELECT count(*)::HUGEINT AS n,
         |    sum(x::HUGEINT) AS sx, sum(y::HUGEINT) AS sy,
         |    sum(x::HUGEINT * y::HUGEINT) AS sxy,
         |    sum(x::HUGEINT * x::HUGEINT) AS sxx FROM u),
         |v AS (SELECT user_id % 2 AS variant, count(*)::BIGINT AS n_users,
         |    sum(x)::BIGINT AS sum_x_milli,
         |    sum(y)::BIGINT AS sum_y_milli FROM u GROUP BY 1)
         |SELECT variant, n_users, sum_x_milli, sum_y_milli,
         |  round($theta, 6) AS theta,
         |  round(sum_y_milli::DOUBLE / n_users::DOUBLE, 6)
         |    AS mean_y_milli,
         |  round(sum_y_milli::DOUBLE / n_users::DOUBLE -
         |    ($theta) *
         |    (sum_x_milli::DOUBLE / n_users::DOUBLE -
         |     sx::DOUBLE / n::DOUBLE), 6) AS mean_adj_milli
         |FROM v, g""".stripMargin
    },

    // sampled-Gram power-iteration PCA: milli-int quantized outer
    // products summed exactly (order-free), then six unrolled
    // integer mat-vec + micro-renormalize steps — each a pure-integer
    // fold plus one mirrored IEEE divide
    "q205_pca_power" -> {
      val iterCtes = (1 to 6).map { k =>
        val prev = if (k == 1) "s0" else s"v${k - 1}"
        s"""w$k AS (SELECT g, list_transform(range(0, 64), i ->
           |    list_sum(list_transform(range(0, 64), j ->
           |      g[i * 64 + j + 1] * v[j + 1]))::BIGINT) AS w
           |  FROM $prev),
           |n$k AS (SELECT g, w,
           |    list_max(list_transform(w, x -> abs(x))) AS wm FROM w$k),
           |v$k AS (SELECT g, wm,
           |    list_transform(w, x -> CASE WHEN wm = 0 THEN 0
           |      ELSE (round((x::DOUBLE / wm::DOUBLE) *
           |        1000000.0))::BIGINT END) AS v
           |  FROM n$k)""".stripMargin
      }.mkString(",\n")
      s"""WITH q AS (SELECT list_transform(embedding,
         |    x -> (round(x::DOUBLE * 1000.0))::BIGINT) AS xq
         |  FROM embeddings
         |  WHERE (('0x' || substr(md5(vec_id::VARCHAR),
         |    1, 8))::UBIGINT)::BIGINT % 4 = 0),
         |g AS (SELECT (ia.i * 64 + ib.i) AS pos,
         |    sum(q.xq[ia.i + 1] * q.xq[ib.i + 1])::BIGINT AS v
         |  FROM q, range(0, 64) ia(i), range(0, 64) ib(i)
         |  GROUP BY 1),
         |ga AS (SELECT list(v ORDER BY pos) AS g FROM g),
         |s0 AS (SELECT g,
         |    list_transform(range(0, 64), x -> 1000000::BIGINT) AS v
         |  FROM ga),
         |$iterCtes
         |SELECT t.i::INTEGER AS pos, v6.v[t.i + 1] AS v_micro,
         |  v6.wm AS lambda_raw
         |FROM v6, range(0, 64) t(i)""".stripMargin
    },

    // entity resolution: md5-derived registry + one-char-corrupted
    // dups, two half-name blocking passes, levenshtein verify,
    // recursive-CTE transitive closure → min reachable id
    "q204_entity_resolution" ->
      """WITH RECURSIVE recs AS (
        |  SELECT c_custkey * 2 AS rec_id,
        |    substr(md5(c_custkey::VARCHAR), 1, 12) AS name FROM customer
        |  UNION ALL
        |  SELECT c_custkey * 2 + 1,
        |    substr(nm, 1, p - 1) || 'z' || substr(nm, p + 1, 12)
        |  FROM (SELECT c_custkey,
        |          substr(md5(c_custkey::VARCHAR), 1, 12) AS nm,
        |          (c_custkey % 12 + 1)::INTEGER AS p
        |        FROM customer WHERE c_custkey % 7 = 0)),
        |cand AS (
        |  SELECT a.rec_id AS ia, b.rec_id AS ib,
        |    a.name AS na, b.name AS nb
        |  FROM recs a JOIN recs b
        |    ON substr(a.name, 1, 6) = substr(b.name, 1, 6)
        |   AND a.rec_id < b.rec_id
        |  UNION
        |  SELECT a.rec_id, b.rec_id, a.name, b.name
        |  FROM recs a JOIN recs b
        |    ON substr(a.name, 7, 6) = substr(b.name, 7, 6)
        |   AND a.rec_id < b.rec_id),
        |pp AS (SELECT ia, ib FROM cand WHERE levenshtein(na, nb) <= 2),
        |e AS (SELECT ia AS s, ib AS t FROM pp
        |      UNION SELECT ib, ia FROM pp),
        |r AS (SELECT rec_id AS s, rec_id AS t FROM recs
        |      UNION SELECT r.s, e.t FROM r JOIN e ON r.t = e.s),
        |cl AS (SELECT s AS rec_id, min(t) AS cluster FROM r GROUP BY s)
        |SELECT rec_id, cluster FROM cl""".stripMargin,

    // TPC-H Q3 shape: micro-cent revenue snap per row, BIGINT sums,
    // ordered limit
    "q196_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate,
        |  sum(rev)::BIGINT AS revenue_cents
        |FROM (
        |  SELECT l.l_orderkey, o.o_orderdate,
        |    (round(l.l_extendedprice * (1.0 - l.l_discount) * 100.0))
        |      ::BIGINT AS rev
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  WHERE c.c_mktsegment = 'BUILDING'
        |    AND o.o_orderdate < '1995-03-15'
        |    AND l.l_shipdate > '1995-03-15')
        |GROUP BY 1, 2
        |ORDER BY revenue_cents DESC, o_orderdate, l_orderkey
        |LIMIT 10""".stripMargin,

    // TPC-H Q5 shape: the six-way join with the nation colocation
    // predicate, micro-cent BIGINT revenue
    "q197_local_supplier_volume" ->
      """SELECT n.n_name,
        |  sum((round(l.l_extendedprice * (1.0 - l.l_discount)
        |    * 100.0))::BIGINT)::BIGINT AS revenue_cents,
        |  count(*)::BIGINT AS n_items
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  AND c.c_nationkey = s.s_nationkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'ASIA'
        |  AND o.o_orderdate >= '1996-01-01'
        |  AND o.o_orderdate < '1997-01-01'
        |GROUP BY 1""".stripMargin,

    // Correlated subqueries: same four flavors, counts only
    "q195_subquery_parity" ->
      """SELECT
        |  (SELECT COUNT(*) FROM orders o WHERE EXISTS (
        |     SELECT 1 FROM lineitem l
        |     WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45))
        |    ::BIGINT AS n_heavy_orders,
        |  (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS (
        |     SELECT 1 FROM lineitem l
        |     WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45))
        |    ::BIGINT AS n_light_orders,
        |  (SELECT COUNT(*) FROM orders
        |   WHERE o_orderkey IN (
        |     SELECT l_orderkey FROM lineitem WHERE l_discount > 0.09))
        |    ::BIGINT AS n_discounted,
        |  (SELECT COUNT(*) FROM lineitem
        |   WHERE l_quantity = (SELECT MAX(l_quantity) FROM lineitem))
        |    ::BIGINT AS n_at_max_qty""".stripMargin,

    // Cohort LTV: integer cohorts/ages/micro revenue, partitioned
    // cumulative sum
    "q191_cohort_ltv" ->
      """WITH b AS (SELECT user_id AS u,
        |    (epoch_us(ts) // 1000000) // 86400 AS d,
        |    (round(value * 1000000.0))::BIGINT AS vm
        |  FROM events),
        |f AS (SELECT u, min(d) AS c FROM b GROUP BY 1),
        |sz AS (SELECT c AS cohort_day, count(*)::BIGINT
        |         AS n_cohort_users FROM f GROUP BY 1),
        |rev AS (SELECT f.c AS cohort_day, b.d - f.c AS age_days,
        |          sum(vm)::BIGINT AS rev_micro
        |        FROM b JOIN f USING (u) GROUP BY 1, 2)
        |SELECT cohort_day, age_days, n_cohort_users, rev_micro,
        |  sum(rev_micro) OVER (PARTITION BY cohort_day
        |    ORDER BY age_days ROWS UNBOUNDED PRECEDING)::BIGINT
        |    AS cum_rev_micro
        |FROM rev JOIN sz USING (cohort_day)""".stripMargin,

    // Soft dedup: md5 cluster sizes, one rounded reciprocal
    "q192_soft_dedup_weights" ->
      """WITH h AS (SELECT doc_id, md5(text) AS dh FROM documents),
        |s AS (SELECT dh, count(*)::BIGINT AS cluster_size
        |      FROM h GROUP BY 1)
        |SELECT doc_id, cluster_size,
        |  (round(1000000.0 / cluster_size))::BIGINT AS weight_micro
        |FROM h JOIN s USING (dh)""".stripMargin,

    // Peaks: zero-filled day series, shifted self-joins, integer
    // prominence
    "q193_peaks" ->
      """WITH d AS (SELECT (epoch_us(ts) // 1000000) // 86400 AS d
        |           FROM events),
        |sp AS (SELECT min(d) AS d0, max(d) AS d1 FROM d),
        |grid AS (SELECT unnest(range(d0, d1 + 1)) AS d FROM sp),
        |c AS (SELECT d, count(*)::BIGINT AS n FROM d GROUP BY 1),
        |s AS (SELECT grid.d, coalesce(c.n, 0)::BIGINT AS n
        |      FROM grid LEFT JOIN c USING (d))
        |SELECT s.d AS day, s.n,
        |  (s.n - greatest(coalesce(p.n, 0), coalesce(x.n, 0)))::BIGINT
        |    AS prominence
        |FROM s LEFT JOIN s p ON p.d = s.d - 1
        |LEFT JOIN s x ON x.d = s.d + 1
        |WHERE s.n > coalesce(p.n, 0) AND s.n > coalesce(x.n, 0)""".stripMargin,

    // Lead-lag: shared zero-filled day grid, shifted joins per lag,
    // q158's exact-moment correlation chain
    "q190_lead_lag" ->
      """WITH d AS (SELECT (epoch_us(ts) // 1000000) // 86400 AS d,
        |    event_type FROM events),
        |sp AS (SELECT min(d) AS d0, max(d) AS d1 FROM d),
        |grid AS (SELECT unnest(range(d0, d1 + 1)) AS d FROM sp),
        |ca AS (SELECT d, count(*)::BIGINT AS c FROM d
        |       WHERE event_type = 'click' GROUP BY 1),
        |cb AS (SELECT d, count(*)::BIGINT AS c FROM d
        |       WHERE event_type = 'purchase' GROUP BY 1),
        |sa AS (SELECT grid.d, coalesce(ca.c, 0)::BIGINT AS x
        |       FROM grid LEFT JOIN ca USING (d)),
        |sb AS (SELECT grid.d, coalesce(cb.c, 0)::BIGINT AS y
        |       FROM grid LEFT JOIN cb USING (d)),
        |p AS (SELECT l.lag, sa.x, sb.y
        |      FROM (SELECT unnest(range(-3, 4)) AS lag) l
        |      CROSS JOIN sa JOIN sb ON sb.d = sa.d + l.lag),
        |s AS (SELECT lag, count(*)::BIGINT AS n,
        |        sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
        |        sum(x * y)::BIGINT AS sxy, sum(x * x)::BIGINT AS sxx,
        |        sum(y * y)::BIGINT AS syy
        |      FROM p GROUP BY lag),
        |dd AS (SELECT lag, n,
        |  n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE AS num,
        |  n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE AS denx,
        |  n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE AS deny,
        |  sx::DOUBLE AS sxd, sy::DOUBLE AS syd, n::DOUBLE AS nd
        |  FROM s)
        |SELECT lag::INTEGER AS lag, n,
        |  round(CASE WHEN denx <= 0 OR deny <= 0 THEN NULL
        |    ELSE num / (sqrt(denx) * sqrt(deny)) END, 6) AS corr,
        |  round(CASE WHEN denx = 0 THEN NULL
        |    ELSE num / denx END, 6) AS slope,
        |  round(CASE WHEN denx = 0 THEN NULL
        |    ELSE (syd - (num / denx) * sxd) / nd END, 6) AS intercept
        |FROM dd""".stripMargin,

    // RFM: per-user aggregates + 1-row corpus anchor, integer days
    "q188_rfm" ->
      """WITH per AS (SELECT user_id AS user,
        |    max(epoch_us(ts) // 1000000) AS lastv,
        |    min(epoch_us(ts) // 1000000) AS firstv,
        |    count(*)::BIGINT AS frequency,
        |    sum((round(value * 1000000.0))::BIGINT)::BIGINT
        |      AS monetary_micro
        |  FROM events GROUP BY 1),
        |a AS (SELECT max(epoch_us(ts) // 1000000) AS amax FROM events)
        |SELECT user,
        |  (amax // 86400 - lastv // 86400)::BIGINT AS recency_days,
        |  frequency, monetary_micro,
        |  (lastv // 86400 - firstv // 86400)::BIGINT AS tenure_days
        |FROM per CROSS JOIN a""".stripMargin,

    // A/B z-test: per-user conversion flags, integer counts, one
    // fixed sqrt/division chain micro-snapped
    "q189_ab_test" ->
      """WITH u AS (SELECT user_id,
        |    max(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS v,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS conv
        |  FROM events GROUP BY 1),
        |a AS (SELECT
        |    sum(CASE WHEN v = 0 THEN 1 ELSE 0 END)::BIGINT AS n_a,
        |    sum(CASE WHEN v = 0 THEN conv ELSE 0 END)::BIGINT
        |      AS conv_a,
        |    sum(CASE WHEN v = 1 THEN 1 ELSE 0 END)::BIGINT AS n_b,
        |    sum(CASE WHEN v = 1 THEN conv ELSE 0 END)::BIGINT
        |      AS conv_b
        |  FROM u)
        |SELECT n_a, conv_a, n_b, conv_b,
        |  round(conv_a::DOUBLE / n_a::DOUBLE, 6) AS rate_a,
        |  round(conv_b::DOUBLE / n_b::DOUBLE, 6) AS rate_b,
        |  CASE WHEN n_a = 0 OR n_b = 0 OR conv_a + conv_b = 0
        |      OR conv_a + conv_b = n_a + n_b THEN NULL
        |    ELSE (round((conv_b::DOUBLE / n_b::DOUBLE -
        |        conv_a::DOUBLE / n_a::DOUBLE) /
        |      sqrt(((conv_a + conv_b)::DOUBLE /
        |          (n_a + n_b)::DOUBLE) *
        |        (1.0 - (conv_a + conv_b)::DOUBLE /
        |          (n_a + n_b)::DOUBLE) *
        |        (1.0 / n_a::DOUBLE + 1.0 / n_b::DOUBLE)) *
        |      1000000.0))::BIGINT
        |  END AS z_micro
        |FROM a""".stripMargin,

    // Group z-scores: exact moment sums, one sqrt-of-integer + one
    // division per row, ordered limit on the rounded |z|
    "q186_zscores" ->
      """WITH b AS (SELECT doc_id, source, n_chars::BIGINT AS v
        |           FROM documents),
        |s AS (SELECT source, count(*)::BIGINT AS n,
        |        sum(v)::BIGINT AS s1, sum(v * v)::BIGINT AS s2
        |      FROM b GROUP BY 1),
        |z AS (SELECT doc_id, b.source, v, n,
        |        round((v * n - s1)::DOUBLE /
        |          sqrt((n * s2 - s1 * s1)::DOUBLE), 6) AS z
        |      FROM b JOIN s USING (source)
        |      WHERE n * s2 <> s1 * s1)
        |SELECT doc_id, source, v, n, z
        |FROM z ORDER BY abs(z) DESC, doc_id LIMIT 50""".stripMargin,

    // Entry/exit arcs: q24's session gap rule with event types kept;
    // first/last via rn against the session size, kind²-sized report
    "q185_entry_exit" ->
      """WITH f AS (SELECT user_id, event_id, ts, event_type,
        |    CASE WHEN epoch_us(ts) // 1000000 -
        |        lag(epoch_us(ts) // 1000000) OVER
        |          (PARTITION BY user_id ORDER BY ts, event_id) > 1800
        |      THEN 1 ELSE 0 END AS flag
        |  FROM events),
        |s AS (SELECT *, sum(flag) OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
        |        AS session_seq FROM f),
        |m AS (SELECT user_id, session_seq, event_type,
        |        row_number() OVER (PARTITION BY user_id, session_seq
        |          ORDER BY ts, event_id) AS rn,
        |        count(*) OVER (PARTITION BY user_id, session_seq)
        |          AS sz
        |      FROM s),
        |e AS (SELECT user_id, session_seq,
        |        max(CASE WHEN rn = 1 THEN event_type END)
        |          AS entry_kind,
        |        max(CASE WHEN rn = sz THEN event_type END)
        |          AS exit_kind,
        |        max(sz)::BIGINT AS n_events
        |      FROM m GROUP BY 1, 2)
        |SELECT entry_kind, exit_kind, count(*)::BIGINT AS n_sessions,
        |  sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)::BIGINT
        |    AS n_bounce
        |FROM e GROUP BY 1, 2""".stripMargin,

    // Memorization audit: 8-gram shingles, gram counts + doc spread,
    // ordered limit
    "q184_memorization_audit" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w
        |             FROM documents),
        |g AS (SELECT doc_id, unnest(CASE WHEN len(w) < 8 THEN []
        |        ELSE list_transform(range(1, len(w) - 6),
        |          i -> array_to_string(w[i:i+7], ' ')) END) AS gram
        |      FROM tok)
        |SELECT gram, count(*)::BIGINT AS n_occ,
        |  count(DISTINCT doc_id)::BIGINT AS n_docs
        |FROM g GROUP BY 1 HAVING count(DISTINCT doc_id) > 1
        |ORDER BY n_occ DESC, gram LIMIT 50""".stripMargin,

    "q183_lang_confusion" -> {
      // q53's generated scoring chain wrapped in the confusion
      // aggregation — same profiles, argmax rule and tie order
      val profs = graft.SparkEntry.gateLangProfiles.toSeq.sortBy(_._1)
      def scoreExpr(p: Map[String, Double]): String = {
        val cases = p.toSeq.sorted
          .map { case (g, w) => s"WHEN '$g' THEN $w" }.mkString(" ")
        s"""coalesce(list_sum(list_transform(grams,
           |  g -> CAST(CASE g $cases ELSE 0.0 END AS DOUBLE))), 0.0)"""
          .stripMargin
      }
      val scoreCols = profs
        .map { case (l, p) => s"${scoreExpr(p)} AS s_$l" }
        .mkString(",\n  ")
      val best = profs.map { case (l, _) => s"s_$l" }
        .mkString("greatest(", ", ", ")")
      val chain = profs
        .map { case (l, _) => s"WHEN s_$l > 0 AND s_$l = $best THEN '$l'" }
        .mkString(" ")
      s"""WITH g AS (SELECT doc_id, lang,
         |        list_transform(range(1, len(lower(text)) - 1),
         |          i -> substr(lower(text), i, 3)) AS grams
         |      FROM documents),
         |s AS (SELECT doc_id, lang,
         |  $scoreCols
         |FROM g),
         |p AS (SELECT lang,
         |        CASE $chain ELSE 'und' END AS lang_pred
         |      FROM s),
         |cm AS (SELECT lang, lang_pred, count(*)::BIGINT AS n
         |       FROM p GROUP BY 1, 2),
         |tot AS (SELECT lang, sum(n)::BIGINT AS n_lang
         |        FROM cm GROUP BY 1)
         |SELECT cm.lang, lang_pred, n, n_lang,
         |  round(n::DOUBLE / n_lang::DOUBLE, 6) AS rate
         |FROM cm JOIN tot USING (lang)""".stripMargin
    },

    "q49_random_projection" -> {
      val dim = 64
      val cols = (0 until 8).map { p =>
        s"round(${duckDot("embedding", s"(${planeList(p, dim)})", dim)}, 6) AS p$p"
      }.mkString(",\n  ")
      s"""SELECT vec_id,
         |  $cols
         |FROM embeddings""".stripMargin
    },

    "q47_quantize" ->
      """WITH m AS (SELECT vec_id, embedding,
        |        list_max(list_transform(embedding,
        |          x -> abs(CAST(x AS DOUBLE)))) AS mx FROM embeddings),
        |q AS (SELECT vec_id, mx,
        |        list_transform(embedding, x -> CASE WHEN mx = 0
        |          THEN CAST(0 AS BIGINT)
        |          ELSE CAST(floor(CAST(x AS DOUBLE) * 127.0 / mx + 0.5)
        |            AS BIGINT) END) AS qv FROM m)
        |SELECT vec_id, round(mx, 6) AS scale,
        |  CAST(list_sum(qv) AS BIGINT) AS q_sum,
        |  CAST(list_min(qv) AS BIGINT) AS q_min,
        |  CAST(list_max(qv) AS BIGINT) AS q_max
        |FROM q""".stripMargin,

    // phrase search: the positional-postings self-join replayed over
    // zipped (term, pos) unnests; overlap semantics are postings-exact
    // (every starting position counts)
    "q103_phrase_search" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w
        |             FROM documents),
        |p AS (SELECT doc_id, unnest(w) AS term,
        |        (unnest(range(1, len(w) + 1)))::INTEGER AS pos
        |      FROM tok)
        |SELECT a.doc_id, count(*)::BIGINT AS n_matches,
        |  min(a.pos)::INTEGER AS first_pos
        |FROM p a JOIN p b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        |  AND b.term = 'scan'
        |WHERE a.term = 'table'
        |GROUP BY a.doc_id""".stripMargin,

    // bottom-k-by-hash sample quantiles: the deterministic sample is
    // replayed with one row_number over (hash, value); estimates are
    // sampled values verbatim (rank = floor(q·(m−1))+1, no
    // interpolation), so the compare is bit-exact
    "q104_sample_quantiles" ->
      """WITH h AS (SELECT l_returnflag,
        |    (('0x' || substr(md5(l_orderkey::VARCHAR || ':' ||
        |        l_linenumber::VARCHAR), 1, 8))::UBIGINT)::BIGINT AS hv,
        |    l_extendedprice AS v FROM lineitem),
        |r AS (SELECT l_returnflag, hv, v, row_number() OVER
        |        (PARTITION BY l_returnflag ORDER BY hv, v) AS rn
        |      FROM h),
        |s AS (SELECT l_returnflag, v FROM r WHERE rn <= 256),
        |g AS (SELECT l_returnflag, count(*)::BIGINT AS m0,
        |        list_sort(list(v)) AS vs FROM s GROUP BY 1),
        |n AS (SELECT l_returnflag, count(*)::BIGINT AS n_rows
        |      FROM lineitem GROUP BY 1)
        |SELECT g.l_returnflag, n.n_rows, m0::INTEGER AS m,
        |  vs[(floor(0.5 * (m0 - 1)) + 1)::INTEGER] AS p50_est,
        |  vs[(floor(0.9 * (m0 - 1)) + 1)::INTEGER] AS p90_est,
        |  vs[(floor(0.99 * (m0 - 1)) + 1)::INTEGER] AS p99_est
        |FROM g JOIN n USING (l_returnflag)""".stripMargin,

    // BPE merge learning: two unrolled count→argmax→greedy-merge
    // rounds. The greedy leftmost-first overlap rule is replayed by
    // grouping consecutive matched positions into runs (pos − rn) and
    // keeping odd ranks — for distinct-symbol pairs runs have length 1
    // and the rule is the identity
    "q105_bpe_learn" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS word
        |             FROM documents),
        |wt AS (SELECT word, count(*)::BIGINT AS wc FROM tok GROUP BY 1),
        |c1 AS (SELECT word, wc,
        |         unnest(list_transform(range(1, len(word) + 1),
        |           i -> word[i])) AS sym,
        |         (unnest(range(1, len(word) + 1)))::BIGINT AS pos
        |       FROM wt),
        |pc1 AS (SELECT a.sym AS l, b.sym AS r, sum(a.wc)::BIGINT AS cnt
        |        FROM c1 a JOIN c1 b
        |          ON b.word = a.word AND b.pos = a.pos + 1
        |        GROUP BY 1, 2),
        |m1 AS (SELECT l, r, cnt FROM pc1
        |       ORDER BY cnt DESC, l ASC, r ASC LIMIT 1),
        |mk1 AS (SELECT c1.word, c1.wc, c1.pos, c1.sym,
        |          CASE WHEN c1.sym = m1.l AND lead(c1.sym) OVER
        |            (PARTITION BY c1.word ORDER BY c1.pos) = m1.r
        |          THEN 1 ELSE 0 END AS mt
        |        FROM c1, m1),
        |r1 AS (SELECT word, pos,
        |         row_number() OVER (PARTITION BY word ORDER BY pos) AS rn
        |       FROM mk1 WHERE mt = 1),
        |sel1 AS (SELECT word, pos FROM (
        |           SELECT word, pos,
        |             row_number() OVER (PARTITION BY word, pos - rn
        |               ORDER BY pos) AS k
        |           FROM r1) WHERE k % 2 = 1),
        |c2 AS (SELECT m.word, m.wc,
        |         row_number() OVER (PARTITION BY m.word
        |           ORDER BY m.pos) AS pos,
        |         CASE WHEN s.pos IS NOT NULL
        |              THEN (SELECT l || r FROM m1)
        |              ELSE m.sym END AS sym
        |       FROM mk1 m
        |       LEFT JOIN sel1 s ON s.word = m.word AND s.pos = m.pos
        |       LEFT JOIN sel1 t ON t.word = m.word AND t.pos = m.pos - 1
        |       WHERE t.pos IS NULL),
        |pc2 AS (SELECT a.sym AS l, b.sym AS r, sum(a.wc)::BIGINT AS cnt
        |        FROM c2 a JOIN c2 b
        |          ON b.word = a.word AND b.pos = a.pos + 1
        |        GROUP BY 1, 2),
        |m2 AS (SELECT l, r, cnt FROM pc2
        |       ORDER BY cnt DESC, l ASC, r ASC LIMIT 1)
        |SELECT 1 AS round, l AS lsym, r AS rsym, cnt AS pair_count
        |FROM m1
        |UNION ALL
        |SELECT 2, l, r, cnt FROM m2""".stripMargin,

    // product quantization: the q48 Lloyd replay instantiated once per
    // 32-dim subspace over sliced vectors; encode = the final
    // assignment of each instance
    "q106_pq_encode" ->
      s"""WITH sub0 AS (SELECT vec_id, embedding[1:32] AS embedding
         |             FROM embeddings),
         |sub1 AS (SELECT vec_id, embedding[33:64] AS embedding
         |         FROM embeddings),
         |${kmeansBody(4, 2, 128, 32, table = "sub0", prefix = "p0")},
         |${kmeansBody(4, 2, 128, 32, table = "sub1", prefix = "p1")}
         |SELECT vid AS vec_id, 0 AS sub, cid AS code,
         |  round(d2, 6) AS d2 FROM p0afinal
         |UNION ALL
         |SELECT vid, 1, cid, round(d2, 6) FROM p1afinal""".stripMargin,

    // novelty: first-occurrence (min doc_id) per distinct 3-gram, then
    // per-doc counts; one integer division for the ratio
    "q107_novelty" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w
        |             FROM documents),
        |g AS (SELECT DISTINCT doc_id, gram FROM (
        |        SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
        |          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gram
        |        FROM tok)),
        |f AS (SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY 1)
        |SELECT g.doc_id, count(*)::BIGINT AS n_grams,
        |  sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)::BIGINT
        |    AS n_novel,
        |  round(sum(CASE WHEN f.first_doc = g.doc_id
        |          THEN 1 ELSE 0 END)::DOUBLE / count(*), 6) AS novelty
        |FROM g JOIN f USING (gram) GROUP BY g.doc_id""".stripMargin,

    // unigram entropy: per-term -p*ln(p) snapped to micro-nats (one
    // IEEE chain) then BIGINT-summed per source — order-free
    "q108_source_entropy" ->
      """WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS tok
        |           FROM documents),
        |c AS (SELECT source, tok, count(*)::BIGINT AS c
        |      FROM t GROUP BY 1, 2),
        |n AS (SELECT source, sum(c)::BIGINT AS n,
        |        count(*)::BIGINT AS vocab FROM c GROUP BY 1)
        |SELECT c.source, any_value(n.n) AS n_tokens,
        |  any_value(n.vocab) AS vocab,
        |  (sum((round(-(c.c::DOUBLE / n.n) * ln(c.c::DOUBLE / n.n)
        |    * 1000000))::BIGINT))::BIGINT AS h_micro
        |FROM c JOIN n USING (source) GROUP BY c.source""".stripMargin,

    // robust outliers: median and MAD via quantile_cont (the q36
    // pairing), both snapped to 6 decimals BEFORE the threshold test
    // so the per-row decision replays exactly
    "q109_robust_outliers" ->
      """WITH m AS (SELECT l_returnflag,
        |        round(quantile_cont(l_extendedprice, 0.5), 6) AS med
        |      FROM lineitem GROUP BY 1),
        |j AS (SELECT l.l_returnflag, l.l_extendedprice AS v, m.med
        |      FROM lineitem l JOIN m USING (l_returnflag)),
        |d AS (SELECT l_returnflag,
        |        round(quantile_cont(abs(v - med), 0.5), 6) AS mad
        |      FROM j GROUP BY 1)
        |SELECT j.l_returnflag, count(*)::BIGINT AS n_rows,
        |  any_value(j.med) AS median, any_value(d.mad) AS mad,
        |  sum(CASE WHEN abs(j.v - j.med) > 3.0 * d.mad
        |      THEN 1 ELSE 0 END)::BIGINT AS n_outliers
        |FROM j JOIN d USING (l_returnflag)
        |GROUP BY j.l_returnflag""".stripMargin,

    // funnel: greedy-earliest stage chain per user (strictly-after
    // epoch seconds), stage counts + conversion from stage 0
    "q110_funnel" -> q110Funnel,

    // per-doc keywords: the q44 tf-idf chain + QUALIFY top-3 by
    // (rounded score desc, term asc) — the same deterministic cut the
    // two-phase top-k makes
    "q111_keywords" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |           FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
        |scored AS (SELECT tf.doc_id, tf.term,
        |        round((tf.tf * (n.n_docs + 1.0)) / (dfreq.df + 1.0), 6)
        |          AS tfidf
        |      FROM tf JOIN dfreq USING (term) CROSS JOIN n)
        |SELECT doc_id,
        |  (row_number() OVER (PARTITION BY doc_id
        |     ORDER BY tfidf DESC, term ASC) - 1)::INTEGER AS rank,
        |  term, tfidf
        |FROM scored
        |QUALIFY rank < 3""".stripMargin,

    // retention: distinct (user, epoch-day) activity, first-seen
    // cohorts, per-offset active fractions — integer day arithmetic
    "q112_retention" -> q112Retention,

    // rate anomalies: daily type counts through the q109 median/MAD
    // chain (both statistics snapped to 6 decimals pre-threshold)
    "q113_rate_anomalies" ->
      """WITH dc AS (SELECT CAST(ts AS DATE) AS day, event_type,
        |        count(*)::BIGINT AS n FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, round(quantile_cont(n, 0.5), 6) AS med
        |      FROM dc GROUP BY 1),
        |j AS (SELECT dc.event_type, dc.n::DOUBLE AS v, m.med
        |      FROM dc JOIN m USING (event_type)),
        |d AS (SELECT event_type,
        |        round(quantile_cont(abs(v - med), 0.5), 6) AS mad
        |      FROM j GROUP BY 1)
        |SELECT j.event_type, count(*)::BIGINT AS n_rows,
        |  any_value(j.med) AS median, any_value(d.mad) AS mad,
        |  sum(CASE WHEN abs(j.v - j.med) > 3.0 * d.mad
        |      THEN 1 ELSE 0 END)::BIGINT AS n_outliers
        |FROM j JOIN d USING (event_type)
        |GROUP BY j.event_type""".stripMargin,

    // corpus diff: digest-only full outer join between the table and
    // the same deterministic v2 derivation
    "q114_corpus_diff" ->
      """WITH old AS (SELECT doc_id, sha256(text) AS h FROM documents),
        |v2 AS (SELECT doc_id,
        |         sha256(CASE WHEN doc_id % 7 = 0 THEN text || ' v2'
        |                ELSE text END) AS h
        |       FROM documents WHERE doc_id % 10 != 0
        |       UNION ALL
        |       SELECT doc_id + 100000, sha256(text) FROM documents
        |       WHERE doc_id % 13 = 0)
        |SELECT coalesce(old.doc_id, v2.doc_id) AS doc_id,
        |  CASE WHEN old.doc_id IS NULL THEN 'added'
        |       WHEN v2.doc_id IS NULL THEN 'removed'
        |       WHEN old.h = v2.h THEN 'unchanged'
        |       ELSE 'changed' END AS status
        |FROM old FULL OUTER JOIN v2 ON old.doc_id = v2.doc_id""".stripMargin,

    // rollup: GROUP BY ROLLUP emits the same subtotal/grand-total rows
    // with NULL group keys
    "q115_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty, count(*)::BIGINT AS n_rows
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    // vocab coverage: frequency-ranked tokens with an integer prefix
    // sum and one division per row
    "q116_vocab_coverage" ->
      """WITH c AS (SELECT term AS token, count(*)::BIGINT AS n
        |      FROM (SELECT unnest(string_split(text, ' ')) AS term
        |            FROM documents) GROUP BY 1),
        |r AS (SELECT token, n,
        |        row_number() OVER (ORDER BY n DESC, token ASC)::BIGINT
        |          AS rank,
        |        sum(n) OVER (ORDER BY n DESC, token ASC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          ::BIGINT AS cum
        |      FROM c),
        |t AS (SELECT sum(n)::BIGINT AS total FROM c)
        |SELECT r.rank, r.token, r.n AS n_occurrences,
        |  r.cum AS cum_occurrences,
        |  round(r.cum::DOUBLE / t.total::DOUBLE, 6) AS coverage
        |FROM r, t""".stripMargin,

    // modality coverage: docs left-joined to their embedding ids,
    // per-source counts and fraction
    "q117_modality_coverage" ->
      """SELECT d.source, count(*)::BIGINT AS n_docs,
        |  sum(CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
        |    AS n_with_embedding,
        |  round(sum(CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0
        |    END)::DOUBLE / count(*)::DOUBLE, 6) AS coverage
        |FROM documents d LEFT JOIN embeddings e ON d.doc_id = e.vec_id
        |GROUP BY d.source""".stripMargin,

    // sliding windows: every event replicated to its width/slide
    // epoch-aligned windows (w_start = floor(t/slide)*slide − k·slide,
    // k < width/slide — each start always covers t, so no filter)
    "q118_sliding_window" ->
      """WITH e AS (SELECT user_id,
        |        CAST(floor(epoch(ts)) AS BIGINT) AS t, value
        |      FROM events),
        |w AS (SELECT user_id, value,
        |        ((t // 1800) * 1800 - 1800 * k) AS window_start
        |      FROM e, unnest(range(0, 4)) AS u(k))
        |SELECT user_id, window_start, count(*) AS n_events,
        |  round(sum(value), 2) AS sum_value
        |FROM w GROUP BY 1, 2""".stripMargin,

    // Fightin' Words: the same prior/log-odds IEEE chains, snapped to
    // micro-nats (a = 0.01·(c1+c2) term prior, A = 0.01·total)
    "q119_fightin_words" ->
      """WITH t AS (SELECT (doc_id % 2)::INTEGER AS s2,
        |        unnest(string_split(text, ' ')) AS term
        |      FROM documents),
        |c AS (SELECT term,
        |        sum(CASE WHEN s2 = 0 THEN 1 ELSE 0 END)::BIGINT AS c1,
        |        sum(CASE WHEN s2 = 1 THEN 1 ELSE 0 END)::BIGINT AS c2
        |      FROM t GROUP BY 1),
        |n AS (SELECT sum(c1)::BIGINT AS n1, sum(c2)::BIGINT AS n2,
        |        sum(c1 + c2)::BIGINT AS nt FROM c)
        |SELECT c.term, c.c1, c.c2,
        |  (round((ln((c.c2::DOUBLE + 0.01 * (c.c1 + c.c2)) /
        |      (n.n2::DOUBLE + 0.01 * n.nt - c.c2
        |        - 0.01 * (c.c1 + c.c2)))
        |    - ln((c.c1::DOUBLE + 0.01 * (c.c1 + c.c2)) /
        |      (n.n1::DOUBLE + 0.01 * n.nt - c.c1
        |        - 0.01 * (c.c1 + c.c2))))
        |   * 1000000))::BIGINT AS delta_micro,
        |  (round((1.0 / (c.c2::DOUBLE + 0.01 * (c.c1 + c.c2))
        |    + 1.0 / (c.c1::DOUBLE + 0.01 * (c.c1 + c.c2)))
        |   * 1000000))::BIGINT AS var_micro
        |FROM c, n""".stripMargin,

    // sketch-tier robust outliers: the q104 bottom-k sample replayed
    // (row_number over (hash, value)), median and MAD as rank
    // statistics of the sorted sample (both snapped to 6 decimals —
    // the q109 discipline), outlier count scaled by integer division
    "q120_outliers_approx" ->
      """WITH h AS (SELECT l_returnflag,
        |    (('0x' || substr(md5(l_orderkey::VARCHAR || ':' ||
        |        l_linenumber::VARCHAR), 1, 8))::UBIGINT)::BIGINT AS hv,
        |    l_extendedprice AS v FROM lineitem),
        |r AS (SELECT l_returnflag, hv, v, row_number() OVER
        |        (PARTITION BY l_returnflag ORDER BY hv, v) AS rn
        |      FROM h),
        |s AS (SELECT l_returnflag, v FROM r WHERE rn <= 256),
        |g AS (SELECT l_returnflag, count(*)::INTEGER AS m,
        |        list_sort(list(v)) AS vs FROM s GROUP BY 1),
        |n AS (SELECT l_returnflag, count(*)::BIGINT AS n_rows
        |      FROM lineitem GROUP BY 1),
        |q AS (SELECT l_returnflag, m, vs,
        |        round(vs[(floor(0.5 * (m - 1)) + 1)::INTEGER], 6) AS med
        |      FROM g),
        |d AS (SELECT l_returnflag, m, vs, med,
        |        list_sort(list_transform(vs, x -> abs(x - med))) AS rs
        |      FROM q),
        |e AS (SELECT l_returnflag, m, vs, med,
        |        round(rs[(floor(0.5 * (m - 1)) + 1)::INTEGER], 6) AS mad
        |      FROM d)
        |SELECT e.l_returnflag, n.n_rows, e.m,
        |  e.med AS median_est, e.mad AS mad_est,
        |  ((n.n_rows * len(list_filter(e.vs,
        |      x -> abs(x - e.med) > 3.0 * e.mad))::BIGINT)
        |    // e.m::BIGINT)::BIGINT AS n_outliers_est
        |FROM e JOIN n USING (l_returnflag)""".stripMargin,

    // embedding drift: the q27 bucketed-mean fold instantiated per
    // label over the base table and the deterministic v2 derivation
    // (drop %5, reverse %7), then mean-vs-mean cosine via the q17
    // dot/(|a||b|) chain
    "q122_embedding_drift" -> q122,

    // full IVFADC-R replay: the q106 per-subspace Lloyd (codebooks +
    // final code assignments), the q27 bucketed-mean cell centroids and
    // cosine cell probe, per-query ADC lookup tables against the final
    // codebooks (the assignment d2 chain), sum of the two subspace
    // distances (two terms — IEEE-commutative, so order-free), top-40
    // candidate cut by (adc, vid), then exact cosine re-rank of the
    // candidates with the q17 dot/(|a||b|) chain
    "q121_ivfpq_refined" -> q121,

    // true IVFADC: the q121 chain with residual-encoded PQ — codebooks
    // and codes in each cell's residual frame, per-(query,cell) ADC LUT
    "q123_ivfpq_residual" -> q123,
    "q250_opq_residual" -> q250,

    // funnel conversion-latency percentiles: the q110 greedy-earliest
    // chain carrying the previous stage time, per-stage bottom-k
    // sample (md5 row-key hash, gap carried verbatim) and the
    // floor(q*(m-1))+1 rank statistic of q120
    "q124_funnel_latency" -> q124Latency,

    // streaming funnel-latency replay: event-time-ordered batches are
    // EXACT, so the state-derived latency report must equal the batch
    // flavor (q124's SQL verbatim)
    "q249_streaming_latency_replay" -> q124Latency,

    // production preflight off the persisted audit artifact: the
    // artifact write/read round-trip must not change a single verdict,
    // so the oracle is q200's rollup verbatim
    "q248_preflight_artifact" ->
      s"""SELECT verdict, count(*)::BIGINT AS n_docs
         |FROM ($q99) GROUP BY 1""".stripMargin,

    // streaming-funnel replay: event-time-ordered batches through the
    // incremental state machine are EXACT, so the oracle is the batch
    // funnel report itself (q110's SQL verbatim)
    "q125_streaming_funnel_replay" -> q110Funnel,

    // streaming-retention replay: the activity state is ORDER-FREE, so
    // even hash-split (non-chronological) batches must reproduce the
    // batch retention report exactly (q112's SQL verbatim)
    "q129_streaming_retention_replay" -> q112Retention,

    // HTML extraction: the identical Java-and-RE2 regex chain —
    // DuckDB regexp_replace needs the explicit 'g' flag (Spark is
    // global by default); inline (?is)/(?s) flags are shared syntax
    "q130_html_extract" ->
      """SELECT doc_id, trim(regexp_replace(
        |regexp_replace(
        |regexp_replace(
        |regexp_replace(
        |regexp_replace(
        |regexp_replace(
        |regexp_replace(
        |regexp_replace(
        |regexp_replace(
        |regexp_replace(
        |regexp_replace(
        |regexp_replace(
        |'<html><head><style>p{color:red}</style>' ||
        |'<script type="text/javascript">var x = 1 < 2;</script>' ||
        |'</head><body><!-- crawl boilerplate --><p>' || text ||
        |'</p>&nbsp;<div>footer &amp; nav</div></body></html>',
        |'(?is)<script[^>]*>.*?</script>', ' ', 'g'),
        |'(?is)<style[^>]*>.*?</style>', ' ', 'g'),
        |'(?s)<!--.*?-->', ' ', 'g'),
        |'<[^>]*>', ' ', 'g'),
        |'&nbsp;', ' ', 'g'),
        |'&amp;', '&', 'g'),
        |'&lt;', '<', 'g'),
        |'&gt;', '>', 'g'),
        |'&quot;', '"', 'g'),
        |'&#39;', '''', 'g'),
        |'&apos;', '''', 'g'),
        |'[ \t\n\f\r]+', ' ', 'g')) AS extracted
        |FROM documents""".stripMargin,

    // per-domain cap: urlHost's RE2-safe extraction feeding the q98
    // seeded md5-rank cap, keyed by host
    "q131_domain_cap" ->
      """WITH u AS (SELECT doc_id,
        |  'https://www.' || source || '.example.com:8443/p/' || doc_id
        |    AS url FROM documents),
        |h AS (SELECT doc_id, url, lower(regexp_extract(url,
        |  '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)', 1))
        |    AS host FROM u),
        |r AS (SELECT doc_id, url, host,
        |  (row_number() OVER (PARTITION BY host
        |     ORDER BY md5(doc_id::VARCHAR || ':' || '29'), doc_id)
        |   - 1)::BIGINT AS rank FROM h)
        |SELECT doc_id, url, host, rank FROM r WHERE rank < 15""".stripMargin,

    // URL canonicalization + URL-level dedup: the identical
    // fragment/tracking/debris/lower-host chain (DuckDB backrefs
    // are \1 and need the explicit 'g' flag)
    "q132_url_canonical_dedup" ->
      """WITH u AS (SELECT doc_id,
        |'HTTPS://WWW.' || source || '.Example.com/Page/' || (doc_id % 7) ||
        |CASE WHEN doc_id % 3 = 0 THEN '?utm_source=x&id=' || (doc_id % 5)
        |     WHEN doc_id % 3 = 1
        |       THEN '?id=' || (doc_id % 5) || '&utm_campaign=y#frag'
        |     ELSE '/' END AS url
        |FROM documents),
        |n AS (SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(url,
        |'#.*$', '', 'g'),
        |'([?&])(utm_[a-zA-Z]+|gclid|fbclid|msclkid|ref)=[^&#]*', '\1', 'g'),
        |'\?&+', '?', 'g'),
        |'&&+', '&', 'g'),
        |'[?&]+$', '', 'g'),
        |'/$', '', 'g') AS ns FROM u),
        |c AS (SELECT doc_id, lower(regexp_extract(ns, '^([a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?[^/?#]*)', 1)) ||
        |regexp_replace(ns, '^([a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?[^/?#]*)', '', 'g') AS canonical_url FROM n)
        |SELECT canonical_url, count(*)::BIGINT AS n_docs,
        |min(doc_id) AS keeper_doc_id
        |FROM c GROUP BY 1""".stripMargin,

    // PageRank over the synthetic 3-regular link graph: 5 damped power
    // iterations unrolled as CTEs; per-dst incoming mass folds in src
    // order (list_reduce == Spark's 0.0-seeded aggregate fold since
    // contributions are positive), every float op one fixed IEEE chain
    "q133_pagerank" -> {
      val iterCtes = (1 to 5).map { i =>
        s"""c$i AS (SELECT dst,
           |  list_reduce(list(r.rank / outdeg ORDER BY e.src),
           |    (a, b) -> a + b) AS s
           |  FROM e JOIN r${i - 1} r ON e.src = r.id GROUP BY dst),
           |r$i AS (SELECT id,
           |  (1.0::DOUBLE - 0.85::DOUBLE) / n::DOUBLE +
           |  0.85::DOUBLE * coalesce(s, 0.0::DOUBLE) AS rank, n
           |  FROM nodes CROSS JOIN cnt
           |  LEFT JOIN c$i ON nodes.id = c$i.dst)""".stripMargin
      }.mkString(",\n")
      s"""WITH cnt AS (SELECT count(*)::BIGINT AS n FROM documents),
         |nodes AS (SELECT doc_id AS id FROM documents),
         |ed AS (SELECT doc_id AS src, (doc_id * 7 + k) % n AS dst
         |       FROM documents CROSS JOIN cnt
         |       CROSS JOIN (SELECT unnest([1, 2, 3]) AS k)),
         |deg AS (SELECT src, count(*)::DOUBLE AS outdeg
         |        FROM ed GROUP BY src),
         |e AS (SELECT ed.src, ed.dst, deg.outdeg
         |      FROM ed JOIN deg USING (src)),
         |r0 AS (SELECT id, 1.0::DOUBLE / n::DOUBLE AS rank, n
         |       FROM nodes CROSS JOIN cnt),
         |$iterCtes
         |SELECT id AS doc_id, round(rank * 1e9)::BIGINT AS rank_nano
         |FROM r5""".stripMargin
    },

    // Unicode NFC canonicalization: utf8proc's nfc_normalize replays
    // java.text.Normalizer byte-for-byte (both implement UAX #15);
    // chr() codes keep the SQL ASCII — 769 = U+0301 combining acute,
    // 233 = U+00E9 precomposed, 778/776 = combining ring/diaeresis,
    // 8491 = U+212B Angstrom-sign singleton, 771 = combining tilde
    "q134_nfc_normalize" ->
      """WITH r AS (SELECT doc_id,
        |  CASE doc_id % 6
        |    WHEN 0 THEN 'Cafe' || chr(769) || ' menu #' || (doc_id % 10)
        |    WHEN 1 THEN 'Caf' || chr(233) || ' menu #' || (doc_id % 10)
        |    WHEN 2 THEN 'A' || chr(778) || 'ngstro' || chr(776) || 'm'
        |    WHEN 3 THEN chr(8491) || ' unit'
        |    WHEN 4 THEN 'man' || chr(771) || 'ana'
        |    ELSE source END AS raw
        |  FROM documents)
        |SELECT doc_id, nfc_normalize(raw) AS norm,
        |  length(raw)::INTEGER AS n_raw,
        |  length(nfc_normalize(raw))::INTEGER AS n_nfc
        |FROM r""".stripMargin,

    // Unicode-script profile: the RE2 spellings of
    // TextOps.scriptClasses; counts = length minus length-of-stripped
    // (global flag!), dominant = greatest with the class-order
    // tie-break replayed as ordered CASE arms
    "q135_script_profile" ->
      """WITH r AS (SELECT doc_id,
        |  CASE doc_id % 5
        |    WHEN 1 THEN 'hello ' || chr(1055) || chr(1088) || chr(1080) || chr(1074) || chr(1077) || chr(1090) || ' 123'
        |    WHEN 2 THEN chr(20320) || chr(22909) || chr(19990) || chr(30028) || ' ' || chr(12371) || chr(12435) || ' ok'
        |    WHEN 3 THEN 'mix ' || chr(945) || chr(946) || chr(947) || ' 42'
        |    WHEN 4 THEN chr(1605) || chr(1585) || chr(1581) || chr(1576) || chr(1575)
        |    ELSE source END AS t
        |  FROM documents),
        |c AS (SELECT doc_id,
        |  (length(t) - length(regexp_replace(t, '[A-Za-z\x{00C0}-\x{024F}]', '', 'g')))::INTEGER AS n_latin,
        |  (length(t) - length(regexp_replace(t, '[\x{0400}-\x{04FF}]', '', 'g')))::INTEGER AS n_cyrillic,
        |  (length(t) - length(regexp_replace(t, '[\x{0370}-\x{03FF}]', '', 'g')))::INTEGER AS n_greek,
        |  (length(t) - length(regexp_replace(t, '[\x{4E00}-\x{9FFF}\x{3040}-\x{30FF}\x{AC00}-\x{D7AF}]', '', 'g')))::INTEGER AS n_cjk,
        |  (length(t) - length(regexp_replace(t, '[\x{0600}-\x{06FF}]', '', 'g')))::INTEGER AS n_arabic,
        |  (length(t) - length(regexp_replace(t, '[0-9]', '', 'g')))::INTEGER AS n_digit
        |  FROM r)
        |SELECT doc_id, n_latin, n_cyrillic, n_greek, n_cjk, n_arabic,
        |  n_digit,
        |  CASE WHEN n_latin > 0 AND n_latin = greatest(n_latin, n_cyrillic, n_greek, n_cjk, n_arabic, n_digit) THEN 'latin'
        |    WHEN n_cyrillic > 0 AND n_cyrillic = greatest(n_latin, n_cyrillic, n_greek, n_cjk, n_arabic, n_digit) THEN 'cyrillic'
        |    WHEN n_greek > 0 AND n_greek = greatest(n_latin, n_cyrillic, n_greek, n_cjk, n_arabic, n_digit) THEN 'greek'
        |    WHEN n_cjk > 0 AND n_cjk = greatest(n_latin, n_cyrillic, n_greek, n_cjk, n_arabic, n_digit) THEN 'cjk'
        |    WHEN n_arabic > 0 AND n_arabic = greatest(n_latin, n_cyrillic, n_greek, n_cjk, n_arabic, n_digit) THEN 'arabic'
        |    WHEN n_digit > 0 AND n_digit = greatest(n_latin, n_cyrillic, n_greek, n_cjk, n_arabic, n_digit) THEN 'digit'
        |    ELSE 'none' END AS script
        |FROM c""".stripMargin,

    // HyperBall-style harmonic centrality: per-round CTEs move the
    // (id, h) k-min-hash sketch rows along edges, re-truncate with an
    // id-partitioned row_number, and estimate ball sizes with the KMV
    // (k-1)/h_(k) single-division chain; the harmonic sum is the fixed
    // left-assoc chain Spark builds
    "q137_harmonic_centrality" -> {
      val k = 64
      val roundCtes = (1 to 4).map { r =>
        s"""u$r AS (SELECT id, h FROM b${r - 1}
           |  UNION
           |  SELECT e.dst AS id, b.h FROM e JOIN b${r - 1} b
           |    ON e.src = b.id),
           |b$r AS (SELECT id, h FROM (
           |    SELECT id, h, row_number() OVER (PARTITION BY id
           |      ORDER BY h) AS rn FROM u$r) WHERE rn <= $k),
           |est$r AS (SELECT id,
           |  CASE WHEN cnt < $k THEN cnt::DOUBLE
           |    ELSE ${k - 1}.0::DOUBLE / (mx::DOUBLE / 4294967296.0)
           |  END AS est_$r
           |  FROM (SELECT id, count(*)::BIGINT AS cnt, max(h) AS mx
           |        FROM b$r GROUP BY id))""".stripMargin
      }.mkString(",\n")
      val harm = (1 to 4).map { r =>
        val prev = if (r == 1) "1.0" else s"est_${r - 1}"
        s"(est_$r - $prev) / $r.0"
      }.mkString(" + ")
      s"""WITH cnt AS (SELECT count(*)::BIGINT AS n FROM documents),
         |nodes AS (SELECT doc_id AS id FROM documents),
         |e AS (SELECT doc_id AS src, (doc_id * 7 + k) % n AS dst
         |      FROM documents CROSS JOIN cnt
         |      CROSS JOIN (SELECT unnest([1, 2, 3]) AS k)),
         |b0 AS (SELECT doc_id AS id,
         |  ('0x' || substr(md5('hb:' || doc_id), 1, 8))::UBIGINT::BIGINT
         |    AS h FROM documents),
         |$roundCtes
         |SELECT nodes.id AS doc_id,
         |  round(($harm) * 1e6)::BIGINT AS harmonic_micro
         |FROM nodes
         |JOIN est1 ON nodes.id = est1.id
         |JOIN est2 ON nodes.id = est2.id
         |JOIN est3 ON nodes.id = est3.id
         |JOIN est4 ON nodes.id = est4.id""".stripMargin
    },

    // Reciprocity: dedup'd edges self-joined on the reverse pair
    // (unique match = semi), integer counts, one division
    // Journeys: two leads over the same user order, path counts,
    // ordered limit
    "q182_journeys" ->
      """WITH s AS (SELECT user_id,
        |    event_type AS step_1,
        |    lead(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS step_2,
        |    lead(event_type, 2) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS step_3
        |  FROM events)
        |SELECT step_1, step_2, step_3, count(*)::BIGINT AS n
        |FROM s WHERE step_3 IS NOT NULL
        |GROUP BY 1, 2, 3
        |ORDER BY n DESC, step_1, step_2, step_3
        |LIMIT 20""".stripMargin,

    // Association rules: distinct baskets, per-user pair self-join,
    // integer counts, single divisions
    "q181_association_rules" ->
      """WITH b AS (SELECT DISTINCT user_id AS u, event_type AS k
        |           FROM events),
        |nu AS (SELECT count(DISTINCT u)::BIGINT AS n_users FROM b),
        |s AS (SELECT k, count(*)::BIGINT AS c FROM b GROUP BY 1),
        |p AS (SELECT a.k AS kind_a, b2.k AS kind_b,
        |        count(*)::BIGINT AS n_ab
        |      FROM b a JOIN b b2 ON a.u = b2.u AND a.k < b2.k
        |      GROUP BY 1, 2)
        |SELECT kind_a, kind_b, sa.c AS n_a, sb.c AS n_b, n_ab, n_users,
        |  round(n_ab::DOUBLE / n_users::DOUBLE, 6) AS support,
        |  round(n_ab::DOUBLE / sa.c::DOUBLE, 6) AS conf_a_b,
        |  round(n_ab::DOUBLE / sb.c::DOUBLE, 6) AS conf_b_a,
        |  round((n_ab * n_users)::DOUBLE / (sa.c * sb.c)::DOUBLE, 6)
        |    AS lift
        |FROM p JOIN s sa ON p.kind_a = sa.k
        |JOIN s sb ON p.kind_b = sb.k CROSS JOIN nu""".stripMargin,

    // Corpus card: q166's HLL register chain + exact-dup semi-join +
    // per-source lang-entropy micro terms, joined on source
    "q180_corpus_card" ->
      """WITH tok AS (SELECT source, string_split(text, ' ') AS w
        |             FROM documents),
        |base AS (SELECT source, count(*)::BIGINT AS n_docs,
        |           sum(len(w))::BIGINT AS n_tokens
        |         FROM tok GROUP BY 1),
        |g AS (SELECT source, unnest(list_transform(range(1, len(w) - 1),
        |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gram
        |      FROM tok),
        |h AS (SELECT source,
        |        (('0x' || substr(md5(gram), 1, 8))::UBIGINT)::BIGINT AS hv
        |      FROM g),
        |rr AS (SELECT source, hv % 64 AS bucket,
        |        27 - length(ltrim(bin(hv // 64), '0')) AS rho FROM h),
        |regs AS (SELECT source, bucket, max(rho) AS reg
        |         FROM rr GROUP BY source, bucket),
        |srcs AS (SELECT DISTINCT source FROM documents),
        |grid AS (SELECT srcs.source, b.bucket,
        |           coalesce(regs.reg, 0) AS reg
        |         FROM srcs
        |         CROSS JOIN (SELECT range AS bucket FROM range(0, 64)) b
        |         LEFT JOIN regs ON regs.source = srcs.source
        |           AND regs.bucket = b.bucket),
        |hl AS (SELECT source,
        |         round((0.709 * 4096.0 * 134217728.0) /
        |           sum(pow(2, 27 - reg)::BIGINT), 6)
        |           AS est_distinct_3grams
        |       FROM grid GROUP BY source),
        |hh AS (SELECT source, md5(text) AS dh FROM documents),
        |dhs AS (SELECT dh FROM hh GROUP BY dh HAVING count(*) > 1),
        |dup AS (SELECT source, count(*)::BIGINT AS n_dup_docs
        |        FROM hh WHERE dh IN (SELECT dh FROM dhs) GROUP BY 1),
        |lc AS (SELECT source, lang, count(*)::BIGINT AS c
        |       FROM documents GROUP BY 1, 2),
        |ent AS (SELECT lc.source,
        |          sum((round((c::DOUBLE / n_docs::DOUBLE) *
        |            (ln(n_docs::DOUBLE) - ln(c::DOUBLE)) * 1000000.0))
        |            ::BIGINT)::BIGINT AS lang_entropy_micro
        |        FROM lc JOIN base USING (source) GROUP BY 1)
        |SELECT base.source, n_docs, n_tokens, est_distinct_3grams,
        |  coalesce(n_dup_docs, 0)::BIGINT AS n_dup_docs,
        |  round(coalesce(n_dup_docs, 0)::DOUBLE / n_docs::DOUBLE, 6)
        |    AS dup_ratio,
        |  lang_entropy_micro
        |FROM base JOIN hl USING (source)
        |LEFT JOIN dup USING (source)
        |JOIN ent USING (source)""".stripMargin,

    // Calibration: q126's training CTEs → the broadcast-weight serve
    // chain → per-row sigmoid micro-snap → 10-bucket reliability rows
    "q179_calibration" ->
      """WITH lab AS (SELECT CASE WHEN text LIKE '%data%' THEN 1 ELSE 0 END
        |               AS y, doc_id, text
        |             FROM documents WHERE lang IS NOT NULL),
        |t AS (SELECT y, unnest(string_split(text, ' ')) AS token
        |      FROM lab),
        |c AS (SELECT token,
        |        sum(CASE WHEN y = 1 THEN 1 ELSE 0 END)::BIGINT AS cp,
        |        sum(CASE WHEN y = 0 THEN 1 ELSE 0 END)::BIGINT AS cn
        |      FROM t GROUP BY 1),
        |tot AS (SELECT sum(cp)::BIGINT AS tp, sum(cn)::BIGINT AS tn,
        |          count(*)::BIGINT AS v FROM c),
        |d AS (SELECT sum(y)::BIGINT AS np,
        |        sum(1 - y)::BIGINT AS nn FROM lab),
        |w AS (SELECT token,
        |        (round((ln((cp + 1)::DOUBLE / (tp + v)::DOUBLE)
        |              - ln((cn + 1)::DOUBLE / (tn + v)::DOUBLE))
        |            * 1000000))::BIGINT AS wm
        |      FROM c CROSS JOIN tot),
        |bias AS (SELECT (round(ln(np::DOUBLE / nn::DOUBLE) * 1000000))
        |           ::BIGINT AS b FROM d),
        |dt AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |       FROM documents),
        |pd AS (SELECT doc_id, count(*)::BIGINT AS n_tokens,
        |         sum(coalesce(wm, 0))::BIGINT AS ws
        |       FROM dt LEFT JOIN w USING (token) GROUP BY 1),
        |sc AS (SELECT pd.doc_id,
        |         round((b::DOUBLE + (CASE WHEN n_tokens = 0 THEN 0.0
        |           ELSE ws::DOUBLE / n_tokens::DOUBLE END))
        |           / 1000000.0, 6) AS logit
        |       FROM pd CROSS JOIN bias),
        |cf AS (SELECT doc_id, 1.0 / (1.0 + exp(-logit)) AS conf
        |       FROM sc),
        |bk AS (SELECT least(floor(conf * 10.0), 9.0)::BIGINT AS bucket,
        |         (round(conf * 1000000.0))::BIGINT AS cm,
        |         CASE WHEN documents.text LIKE '%data%' THEN 1 ELSE 0 END AS y
        |       FROM cf JOIN documents USING (doc_id))
        |SELECT bucket, count(*)::BIGINT AS n, sum(y)::BIGINT AS n_pos,
        |  sum(cm)::BIGINT AS conf_micro,
        |  round(sum(y)::DOUBLE / count(*)::DOUBLE, 6) AS acc,
        |  round(sum(cm)::DOUBLE / count(*)::DOUBLE / 1000000.0, 6)
        |    AS mean_conf
        |FROM bk GROUP BY 1""".stripMargin,

    // Freshness decay: one exp per row micro-snapped, BIGINT sums,
    // one division against the 1-row total
    "q177_decay_mix" ->
      """WITH w AS (SELECT source,
        |    (round(exp((doc_id % 365)::DOUBLE / -90.0) * 1000000.0))
        |      ::BIGINT AS w
        |  FROM documents),
        |per AS (SELECT source, count(*)::BIGINT AS n_docs,
        |          sum(w)::BIGINT AS w_micro FROM w GROUP BY 1),
        |tot AS (SELECT sum(w_micro)::BIGINT AS t FROM per)
        |SELECT source, n_docs, w_micro,
        |  round(w_micro::DOUBLE / t::DOUBLE, 6) AS eff_frac
        |FROM per CROSS JOIN tot""".stripMargin,

    // Gini via the pairwise closed form — integer numerator, one
    // division, no sort anywhere
    "q178_gini_concentration" ->
      """WITH x AS (SELECT source, count(*)::BIGINT AS x
        |           FROM documents GROUP BY 1),
        |p AS (SELECT sum(abs(a.x - b.x))::BIGINT AS num
        |      FROM x a CROSS JOIN x b),
        |t AS (SELECT count(*)::BIGINT AS n_classes,
        |        sum(x)::BIGINT AS n_total FROM x)
        |SELECT n_classes, n_total, num AS gini_num,
        |  round(num::DOUBLE / (2 * n_classes * n_total)::DOUBLE, 6)
        |    AS gini
        |FROM p CROSS JOIN t""".stripMargin,

    // GROUPING SETS lattice with the grouping_id bitmask (source is
    // the high bit in both engines)
    "q176_grouping_sets" ->
      """SELECT source, lang, count(*)::BIGINT AS n_docs,
        |  sum(n_chars)::BIGINT AS sum_chars,
        |  GROUPING(source, lang)::BIGINT AS gid
        |FROM documents
        |GROUP BY GROUPING SETS ((source, lang), (source), (lang), ())
        |""".stripMargin,

    // Seasonal anomalies: integer calendar slots from floor-cast
    // seconds, micro-unit values, BIGINT residual numerators, one
    // division chain, ordered limit
    "q175_seasonal_anomalies" ->
      """WITH b AS (SELECT event_id AS id,
        |    (round(value * 1000000.0))::BIGINT AS vm,
        |    ((epoch_us(ts) // 1000000) // 86400 + 4) % 7 AS dow,
        |    ((epoch_us(ts) // 1000000) % 86400) // 3600 AS hour
        |  FROM events),
        |p AS (SELECT dow, hour, count(*)::BIGINT AS n_slot,
        |        sum(vm)::BIGINT AS s FROM b GROUP BY 1, 2),
        |r AS (SELECT id, b.dow, b.hour, n_slot,
        |        (vm * n_slot - s)::BIGINT AS rn
        |      FROM b JOIN p USING (dow, hour))
        |SELECT id, dow, hour, n_slot,
        |  round(rn::DOUBLE / n_slot / 1000000.0, 6) AS resid,
        |  round(abs(rn)::DOUBLE / n_slot / 1000000.0, 6) AS abs_resid
        |FROM r ORDER BY abs_resid DESC, id LIMIT 20""".stripMargin,

    // PSI: smoothed (a+1)/(A+B) vs (b+1)/(N+B) over the union bin
    // grid; per-bin term = integer weight × micro-nat ln, BIGINT sum,
    // one closing division chain
    "q174_psi_drift" ->
      """WITH old AS (SELECT source, floor(n_chars / 100) AS bin
        |             FROM documents),
        |nu AS (SELECT source, floor(
        |         (CASE WHEN doc_id % 7 = 0 THEN n_chars * 2
        |           ELSE n_chars END) / 100) AS bin
        |       FROM documents WHERE doc_id % 10 <> 0),
        |oa AS (SELECT source, bin, count(*)::BIGINT AS a
        |       FROM old GROUP BY 1, 2),
        |nb AS (SELECT source, bin, count(*)::BIGINT AS b
        |       FROM nu GROUP BY 1, 2),
        |bins AS (SELECT DISTINCT source, bin FROM (
        |    SELECT source, bin FROM oa
        |    UNION ALL SELECT source, bin FROM nb)),
        |tot AS (SELECT source, count(*)::BIGINT AS n_bins
        |        FROM bins GROUP BY 1),
        |no AS (SELECT source, sum(a)::BIGINT AS n_old
        |       FROM oa GROUP BY 1),
        |nn AS (SELECT source, sum(b)::BIGINT AS n_new
        |       FROM nb GROUP BY 1),
        |g AS (SELECT bins.source, bins.bin,
        |        coalesce(oa.a, 0) AS a, coalesce(nb.b, 0) AS b,
        |        n_bins, n_old, n_new
        |      FROM bins LEFT JOIN oa USING (source, bin)
        |      LEFT JOIN nb USING (source, bin)
        |      JOIN tot USING (source) JOIN no USING (source)
        |      JOIN nn USING (source)),
        |te AS (SELECT source, n_old, n_new, n_bins,
        |        ((a + 1) * (n_new + n_bins) -
        |         (b + 1) * (n_old + n_bins)) *
        |        (round((ln(((a + 1) * (n_new + n_bins))::DOUBLE) -
        |                ln(((b + 1) * (n_old + n_bins))::DOUBLE)) *
        |          1000000))::BIGINT AS t
        |       FROM g)
        |SELECT source, n_old, n_new, n_bins,
        |  sum(t)::BIGINT AS psi_num_micro,
        |  round(sum(t)::DOUBLE /
        |    ((n_old + n_bins) * (n_new + n_bins))::DOUBLE /
        |    1000000.0, 6) AS psi
        |FROM te GROUP BY 1, 2, 3, 4""".stripMargin,

    // Burstiness: integer-second gaps (floor-cast timestamps), exact
    // BIGINT folds, one sqrt-of-integer + one division
    "q173_burstiness" ->
      """WITH s AS (SELECT user_id AS user,
        |    epoch_us(ts) // 1000000 AS sec,
        |    lag(epoch_us(ts) // 1000000) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev
        |  FROM events),
        |g AS (SELECT user, sec - prev AS gap FROM s
        |      WHERE prev IS NOT NULL),
        |a AS (SELECT user, count(*)::BIGINT AS n_gaps,
        |        sum(gap)::BIGINT AS sum_gap_s,
        |        sum(gap * gap)::BIGINT AS sum_gap2
        |      FROM g GROUP BY user)
        |SELECT user, n_gaps, sum_gap_s, sum_gap2,
        |  CASE WHEN n_gaps < 2 OR (sum_gap_s = 0 AND sum_gap2 = 0)
        |    THEN NULL
        |    ELSE round(
        |      (sqrt((n_gaps * sum_gap2 - sum_gap_s * sum_gap_s)
        |          ::DOUBLE) - sum_gap_s::DOUBLE) /
        |      (sqrt((n_gaps * sum_gap2 - sum_gap_s * sum_gap_s)
        |          ::DOUBLE) + sum_gap_s::DOUBLE), 6)
        |  END AS burstiness
        |FROM a""".stripMargin,

    // CDC chunks: boundary ends = 1-based window-end positions whose
    // 8-char md5 window hits 0 mod 16 (i < n), plus the doc end; the
    // chunk at index j spans (prev end + 1 .. ends[j]); empty filter
    // lists degrade to the single whole-doc chunk via list_append
    "q172_cdc_chunks" ->
      """WITH base AS (SELECT doc_id, text, length(text) AS n
        |              FROM documents),
        |b AS (SELECT doc_id, text,
        |        list_append(list_filter(range(8, n + 1), i ->
        |          i < n AND
        |          ((('0x' || substr(md5(substr(text, (i - 7)::INTEGER,
        |              8)), 1, 8))::UBIGINT)::BIGINT % 16 = 0)), n)
        |          AS ends
        |      FROM base),
        |c AS (SELECT doc_id, unnest(list_transform(
        |        range(1, len(ends) + 1), j ->
        |          substr(text,
        |            (CASE WHEN j = 1 THEN 1
        |              ELSE ends[j::INTEGER - 1] + 1 END)::INTEGER,
        |            (ends[j::INTEGER] -
        |              CASE WHEN j = 1 THEN 1
        |                ELSE ends[j::INTEGER - 1] + 1 END
        |              + 1)::INTEGER))) AS chunk
        |      FROM b)
        |SELECT md5(chunk) AS chunk_hash, count(*)::BIGINT AS n_occ,
        |  count(DISTINCT doc_id)::BIGINT AS n_docs,
        |  max(length(chunk))::INTEGER AS chunk_len
        |FROM c GROUP BY 1
        |ORDER BY n_occ DESC, chunk_hash LIMIT 50""".stripMargin,

    // Markov transitions: one user-partitioned lead window, integer
    // pair counts, one division
    "q170_transitions" ->
      """WITH seq AS (SELECT user_id, event_type AS kind,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS next_kind
        |  FROM events),
        |p AS (SELECT kind, next_kind, count(*)::BIGINT AS n_pairs
        |      FROM seq WHERE next_kind IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT kind, sum(n_pairs)::BIGINT AS n_from
        |      FROM p GROUP BY 1)
        |SELECT p.kind, p.next_kind, p.n_pairs, t.n_from,
        |  round(p.n_pairs::DOUBLE / t.n_from::DOUBLE, 6) AS p_next
        |FROM p JOIN t USING (kind)""".stripMargin,

    // Hill estimator: micro-nat ln per top value, BIGINT fold, one
    // closing division — the top-(k+1) set is pinned by the (c desc,
    // t) total order on both sides
    "q169_hill_tail" ->
      """WITH uni AS (SELECT t, count(*)::BIGINT AS c FROM (
        |        SELECT unnest(string_split(text, ' ')) AS t
        |        FROM documents) GROUP BY t),
        |top AS (SELECT c FROM uni ORDER BY c DESC, t LIMIT 101),
        |ag AS (SELECT count(*)::BIGINT AS m, min(c)::BIGINT AS x_kp1,
        |         sum((round(ln(c) * 1000000))::BIGINT)::BIGINT AS s
        |       FROM top)
        |SELECT (m - 1)::BIGINT AS k, x_kp1,
        |  (s - m * (round(ln(x_kp1) * 1000000))::BIGINT)::BIGINT
        |    AS sum_ln_unat,
        |  CASE WHEN s - m * (round(ln(x_kp1) * 1000000))::BIGINT <= 0
        |    THEN NULL
        |    ELSE round((m - 1) * 1000000.0 /
        |      (s - m * (round(ln(x_kp1) * 1000000))::BIGINT), 6)
        |  END AS alpha_hill
        |FROM ag""".stripMargin,

    // HITS as exact path counts: the two rounds unroll to four
    // join+aggregate CTEs, every score a BIGINT
    "q168_hits" ->
      """WITH cnt AS (SELECT count(*)::BIGINT AS n FROM documents),
        |nodes AS (SELECT doc_id AS id FROM documents),
        |ring AS (SELECT doc_id AS src, (doc_id + 1) % n AS dst
        |  FROM documents CROSS JOIN cnt),
        |dense AS (SELECT doc_id AS src, (doc_id + k * 10) % n AS dst
        |  FROM documents CROSS JOIN cnt
        |  CROSS JOIN (SELECT unnest([1, 2, 3]) AS k)
        |  WHERE doc_id % 10 = 0),
        |e AS (SELECT DISTINCT src, dst FROM (
        |    SELECT * FROM ring UNION ALL SELECT * FROM dense)
        |  WHERE src <> dst),
        |h1 AS (SELECT src AS id, count(*)::BIGINT AS s
        |       FROM e GROUP BY src),
        |a1 AS (SELECT e.dst AS id, sum(h1.s)::BIGINT AS s
        |       FROM e JOIN h1 ON e.src = h1.id GROUP BY e.dst),
        |h2 AS (SELECT e.src AS id, sum(a1.s)::BIGINT AS s
        |       FROM e JOIN a1 ON e.dst = a1.id GROUP BY e.src),
        |a2 AS (SELECT e.dst AS id, sum(h2.s)::BIGINT AS s
        |       FROM e JOIN h2 ON e.src = h2.id GROUP BY e.dst)
        |SELECT nodes.id AS doc_id,
        |  coalesce(h2.s, 0)::BIGINT AS hub,
        |  coalesce(a2.s, 0)::BIGINT AS auth
        |FROM nodes LEFT JOIN h2 ON nodes.id = h2.id
        |LEFT JOIN a2 ON nodes.id = a2.id""".stripMargin,

    // PMI per-ln micro-nat snap: each ln takes ONE exact integer
    // product, so the difference is BIGINT subtraction on both sides
    "q167_pmi_collocations" ->
      """WITH tok AS (SELECT string_split(text, ' ') AS w
        |             FROM documents),
        |uni AS (SELECT t, count(*)::BIGINT AS c FROM (
        |          SELECT unnest(w) AS t FROM tok) GROUP BY t),
        |tot AS (SELECT sum(c)::BIGINT AS n_tokens FROM uni),
        |bi AS (SELECT bg, count(*)::BIGINT AS c_ab FROM (
        |         SELECT unnest(list_transform(range(1, len(w)),
        |           i -> w[i] || ' ' || w[i+1])) AS bg FROM tok)
        |       GROUP BY bg HAVING count(*) >= 5),
        |sp AS (SELECT string_split(bg, ' ')[1] AS w1,
        |         string_split(bg, ' ')[2] AS w2, c_ab FROM bi)
        |SELECT w1, w2, c_ab, ua.c AS c_a, ub.c AS c_b,
        |  (round(ln(c_ab * n_tokens) * 1000000))::BIGINT -
        |    (round(ln(ua.c * ub.c) * 1000000))::BIGINT AS pmi_unat
        |FROM sp JOIN uni ua ON sp.w1 = ua.t
        |JOIN uni ub ON sp.w2 = ub.t CROSS JOIN tot
        |ORDER BY pmi_unat DESC, w1, w2 LIMIT 100""".stripMargin,

    // HLL registers replay as integer arithmetic: bucket = hv mod 64,
    // w = hv div 64, rho = 27 - bitlen(w) (ltrim-of-bin gives bitlen 0
    // for w = 0), reg = max rho per bucket with missing buckets as 0;
    // the harmonic-sum numerator Σ 2^(27-reg) is an exact BIGINT
    "q166_hll_distinct" ->
      """WITH tok AS (SELECT source, string_split(text, ' ') AS w
        |             FROM documents),
        |g AS (SELECT source, unnest(list_transform(range(1, len(w) - 1),
        |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gram
        |      FROM tok),
        |h AS (SELECT source,
        |        (('0x' || substr(md5(gram), 1, 8))::UBIGINT)::BIGINT AS hv
        |      FROM g),
        |rr AS (SELECT source, hv % 64 AS bucket,
        |        27 - length(ltrim(bin(hv // 64), '0')) AS rho FROM h),
        |regs AS (SELECT source, bucket, max(rho) AS reg
        |         FROM rr GROUP BY source, bucket),
        |srcs AS (SELECT DISTINCT source FROM documents),
        |grid AS (SELECT srcs.source, b.bucket,
        |           coalesce(regs.reg, 0) AS reg
        |         FROM srcs
        |         CROSS JOIN (SELECT range AS bucket FROM range(0, 64)) b
        |         LEFT JOIN regs ON regs.source = srcs.source
        |           AND regs.bucket = b.bucket)
        |SELECT source,
        |  (count(*) FILTER (WHERE reg = 0))::BIGINT AS n_zero_regs,
        |  sum(reg)::BIGINT AS reg_sum,
        |  sum(reg * (bucket + 1))::BIGINT AS reg_checksum,
        |  sum(pow(2, 27 - reg)::BIGINT)::BIGINT AS z_num,
        |  round((0.709 * 4096.0 * 134217728.0) /
        |    sum(pow(2, 27 - reg)::BIGINT), 6) AS est_raw,
        |  CASE WHEN count(*) FILTER (WHERE reg = 0) > 0
        |    THEN (round(ln(64.0 /
        |      (count(*) FILTER (WHERE reg = 0))) * 1000000))::BIGINT
        |  END AS est_lc_unat
        |FROM grid GROUP BY source""".stripMargin,

    "q165_reciprocity" ->
      """WITH cnt AS (SELECT count(*)::BIGINT AS n FROM documents),
        |nodes AS (SELECT doc_id AS id FROM documents),
        |ring AS (SELECT doc_id AS src, (doc_id + 1) % n AS dst
        |  FROM documents CROSS JOIN cnt),
        |fwd AS (SELECT doc_id AS src, (doc_id + 5) % n AS dst
        |  FROM documents CROSS JOIN cnt WHERE doc_id % 2 = 0),
        |back AS (SELECT (doc_id + 5) % n AS src, doc_id AS dst
        |  FROM documents CROSS JOIN cnt WHERE doc_id % 2 = 0),
        |e AS (SELECT DISTINCT src, dst FROM (
        |    SELECT * FROM ring UNION ALL SELECT * FROM fwd
        |    UNION ALL SELECT * FROM back) WHERE src <> dst),
        |m AS (SELECT e.src, e.dst FROM e
        |  JOIN e r ON e.src = r.dst AND e.dst = r.src),
        |od AS (SELECT src, count(*)::BIGINT AS outdeg
        |  FROM e GROUP BY src),
        |nm AS (SELECT src, count(*)::BIGINT AS n_mutual
        |  FROM m GROUP BY src)
        |SELECT nodes.id AS doc_id,
        |  coalesce(od.outdeg, 0)::BIGINT AS outdeg,
        |  coalesce(nm.n_mutual, 0)::BIGINT AS n_mutual,
        |  round(CASE WHEN od.outdeg IS NULL THEN NULL
        |    ELSE coalesce(nm.n_mutual, 0)::DOUBLE /
        |      od.outdeg::DOUBLE END, 6) AS reciprocity
        |FROM nodes LEFT JOIN od ON nodes.id = od.src
        |LEFT JOIN nm ON nodes.id = nm.src""".stripMargin,

    // Clustering coefficient: q162's triangle chain + degree +
    // one fixed division, NULL below degree 2
    "q164_clustering" ->
      """WITH cnt AS (SELECT count(*)::BIGINT AS n FROM documents),
        |nodes AS (SELECT doc_id AS id FROM documents),
        |ed AS (SELECT doc_id AS src, (doc_id + k) % n AS dst
        |       FROM documents CROSS JOIN cnt
        |       CROSS JOIN (SELECT unnest([1, 2]) AS k)),
        |und AS (SELECT DISTINCT least(src, dst) AS a,
        |    greatest(src, dst) AS b FROM ed WHERE src <> dst),
        |deg AS (SELECT id, count(*)::BIGINT AS deg FROM (
        |    SELECT a AS id FROM und UNION ALL SELECT b AS id FROM und)
        |  GROUP BY id),
        |wd AS (SELECT a, b, da.deg AS da, db.deg AS db
        |  FROM und JOIN deg da ON und.a = da.id
        |  JOIN deg db ON und.b = db.id),
        |outed AS (SELECT
        |  CASE WHEN da < db OR (da = db AND a < b) THEN a ELSE b END
        |    AS u,
        |  CASE WHEN da < db OR (da = db AND a < b) THEN b ELSE a END
        |    AS v,
        |  CASE WHEN da < db OR (da = db AND a < b) THEN db ELSE da END
        |    AS dv
        |  FROM wd),
        |wedges AS (SELECT e1.u, e1.v AS v1, e2.v AS v2
        |  FROM outed e1 JOIN outed e2 ON e1.u = e2.u
        |  WHERE e1.dv < e2.dv OR (e1.dv = e2.dv AND e1.v < e2.v)),
        |tris AS (SELECT w.u AS x, w.v1 AS y, w.v2 AS z
        |  FROM wedges w JOIN outed o ON w.v1 = o.u AND w.v2 = o.v),
        |pern AS (SELECT id, count(*)::BIGINT AS n_triangles FROM (
        |    SELECT x AS id FROM tris UNION ALL SELECT y FROM tris
        |    UNION ALL SELECT z FROM tris) GROUP BY id),
        |t AS (SELECT nodes.id,
        |    coalesce(pern.n_triangles, 0)::BIGINT AS n_triangles,
        |    coalesce(deg.deg, 0)::BIGINT AS deg
        |  FROM nodes LEFT JOIN pern ON nodes.id = pern.id
        |  LEFT JOIN deg ON nodes.id = deg.id)
        |SELECT id AS doc_id, n_triangles, deg,
        |  round(CASE WHEN deg < 2 THEN NULL
        |    ELSE (2 * n_triangles)::DOUBLE /
        |      (deg * (deg - 1))::DOUBLE END, 6) AS clustering
        |FROM t""".stripMargin,

    // k-core peeling: 3 unrolled rounds of degree/filter/trim over
    // canonical undirected edges; integer-only
    "q163_kcore" -> {
      val rounds = (1 to 3).map { r =>
        s"""d$r AS (SELECT id, count(*)::BIGINT AS deg FROM (
           |    SELECT a AS id FROM e${r - 1}
           |    UNION ALL SELECT b AS id FROM e${r - 1}) GROUP BY id),
           |k$r AS (SELECT id FROM d$r WHERE deg >= 4),
           |e$r AS (SELECT a, b FROM e${r - 1}
           |  WHERE a IN (SELECT id FROM k$r)
           |    AND b IN (SELECT id FROM k$r))""".stripMargin
      }.mkString(",\n")
      s"""WITH cnt AS (SELECT count(*)::BIGINT AS n FROM documents),
         |nodes AS (SELECT doc_id AS id FROM documents),
         |ring AS (SELECT doc_id AS src, (doc_id + 1) % n AS dst
         |  FROM documents CROSS JOIN cnt),
         |dense AS (SELECT doc_id AS src, (doc_id + k * 10) % n AS dst
         |  FROM documents CROSS JOIN cnt
         |  CROSS JOIN (SELECT unnest([1, 2, 3]) AS k)
         |  WHERE doc_id % 10 = 0),
         |e0 AS (SELECT DISTINCT least(src, dst) AS a,
         |    greatest(src, dst) AS b
         |  FROM (SELECT * FROM ring UNION ALL SELECT * FROM dense)
         |  WHERE src <> dst),
         |$rounds
         |SELECT nodes.id AS doc_id,
         |  coalesce(k3.id IS NOT NULL, false) AS in_core
         |FROM nodes LEFT JOIN k3 ON nodes.id = k3.id""".stripMargin
    },

    // Triangle counts: canonical undirected edges, (deg, id)-ordered
    // orientation, wedge join + closure probe, per-node explode —
    // integer-only
    "q162_triangles" ->
      """WITH cnt AS (SELECT count(*)::BIGINT AS n FROM documents),
        |nodes AS (SELECT doc_id AS id FROM documents),
        |ed AS (SELECT doc_id AS src, (doc_id + k) % n AS dst
        |       FROM documents CROSS JOIN cnt
        |       CROSS JOIN (SELECT unnest([1, 2]) AS k)),
        |und AS (SELECT DISTINCT least(src, dst) AS a,
        |    greatest(src, dst) AS b FROM ed WHERE src <> dst),
        |deg AS (SELECT id, count(*)::BIGINT AS deg FROM (
        |    SELECT a AS id FROM und UNION ALL SELECT b AS id FROM und)
        |  GROUP BY id),
        |wd AS (SELECT a, b, da.deg AS da, db.deg AS db
        |  FROM und JOIN deg da ON und.a = da.id
        |  JOIN deg db ON und.b = db.id),
        |outed AS (SELECT
        |  CASE WHEN da < db OR (da = db AND a < b) THEN a ELSE b END
        |    AS u,
        |  CASE WHEN da < db OR (da = db AND a < b) THEN b ELSE a END
        |    AS v,
        |  CASE WHEN da < db OR (da = db AND a < b) THEN db ELSE da END
        |    AS dv
        |  FROM wd),
        |wedges AS (SELECT e1.u, e1.v AS v1, e2.v AS v2
        |  FROM outed e1 JOIN outed e2 ON e1.u = e2.u
        |  WHERE e1.dv < e2.dv OR (e1.dv = e2.dv AND e1.v < e2.v)),
        |tris AS (SELECT w.u AS x, w.v1 AS y, w.v2 AS z
        |  FROM wedges w JOIN outed o ON w.v1 = o.u AND w.v2 = o.v),
        |pern AS (SELECT id, count(*)::BIGINT AS n_triangles FROM (
        |    SELECT x AS id FROM tris UNION ALL SELECT y FROM tris
        |    UNION ALL SELECT z FROM tris) GROUP BY id)
        |SELECT nodes.id AS doc_id,
        |  coalesce(pern.n_triangles, 0)::BIGINT AS n_triangles
        |FROM nodes LEFT JOIN pern ON nodes.id = pern.id""".stripMargin,

    // Crawl-delay schedule: the q141 parse mechanics with the 4-alt
    // line regex; numeric filter, zero drop, max-of-duplicates,
    // single-division max_rps
    "q161_crawl_delay" ->
      """WITH robots AS (SELECT * FROM (VALUES
        |  ('a.example.com', 'User-agent: *' || chr(10) ||
        |    'Crawl-delay: 10' || chr(10) || 'Disallow: /x' || chr(10)
        |    || 'User-agent: fastbot' || chr(10) || 'Crawl-delay: 0.5'),
        |  ('b.example.com', 'User-agent: graftbot' || chr(10) ||
        |    'Crawl-delay: 2' || chr(10) || 'Crawl-delay: 7' || chr(10)
        |    || '# dup keeps max'),
        |  ('c.example.com', 'User-agent: *' || chr(10) ||
        |    'Crawl-delay: 0' || chr(10) || 'User-agent: junkbot' ||
        |    chr(10) || 'Crawl-delay: soon')) AS v(host, body)),
        |lines0 AS (SELECT host,
        |  unnest(string_split(body, chr(10))) AS line,
        |  unnest(generate_series(1,
        |    len(string_split(body, chr(10))))) AS pos FROM robots),
        |cls AS (SELECT host, pos,
        |  lower(regexp_extract(regexp_replace(line, '#.*$', '', 'g'),
        |    '(?i)^[ \t]*(user-agent|disallow|allow|crawl-delay)[ \t]*:[ \t]*(.*)$',
        |    1)) AS kind,
        |  trim(regexp_extract(regexp_replace(line, '#.*$', '', 'g'),
        |    '(?i)^[ \t]*(user-agent|disallow|allow|crawl-delay)[ \t]*:[ \t]*(.*)$',
        |    2)) AS value
        |  FROM lines0),
        |k AS (SELECT * FROM cls WHERE kind <> ''),
        |g AS (SELECT host, pos, kind, value,
        |  kind = 'user-agent' AS is_agent,
        |  (kind = 'user-agent') AND NOT coalesce(
        |    lag(kind = 'user-agent') OVER
        |      (PARTITION BY host ORDER BY pos), false) AS starts_group
        |  FROM k),
        |g2 AS (SELECT *, sum(CASE WHEN starts_group THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY host ORDER BY pos) AS grp FROM g),
        |agents AS (SELECT host, grp, value AS agent FROM g2
        |  WHERE is_agent),
        |delays AS (SELECT host, grp, value::DOUBLE AS delay_sec
        |  FROM g2 WHERE kind = 'crawl-delay'
        |    AND regexp_matches(value, '^[0-9]+(\.[0-9]+)?$')
        |    AND value::DOUBLE > 0)
        |SELECT host, agent, max(delay_sec) AS delay_sec,
        |  round(1.0 / max(delay_sec), 6) AS max_rps
        |FROM agents JOIN delays USING (host, grp)
        |GROUP BY host, agent""".stripMargin,

    // Declared-vs-actual encoding audit: q159's charset chain +
    // q138's marker count + the verdict CASE; mojibake body via
    // chr(195)||chr(169)
    "q160_encoding_audit" -> {
      val csPat = "(?is)<meta\\s+charset=\"?([a-zA-Z0-9_-]+)\"?"
      val legPat =
        "(?is)<meta\\s+http-equiv=\"content-type\"[^>]*charset=([a-zA-Z0-9_-]+)"
      val mojiPat = "(\\x{00C3}[\\x{0080}-\\x{00BF}])|" +
        "(\\x{00E2}\\x{20AC}.)|(\\x{00C2}[\\x{00A0}-\\x{00BF}])"
      s"""WITH r AS (SELECT doc_id, '<html>' ||
         |  CASE doc_id % 3
         |    WHEN 0 THEN '<head><meta charset="utf-8"></head>'
         |    WHEN 1 THEN '<head><meta http-equiv="Content-Type" ' ||
         |      'content="text/html; charset=iso-8859-1"></head>'
         |    ELSE '<head></head>' END ||
         |  CASE WHEN doc_id % 2 = 0
         |    THEN '<body>caf' || chr(195) || chr(169) || ' menu #' ||
         |      (doc_id % 7) || '</body>'
         |    ELSE '<body>plain #' || (doc_id % 7) || '</body>' END ||
         |  '</html>' AS html FROM documents),
         |c AS (SELECT doc_id,
         |  lower(CASE WHEN regexp_extract(html, '$csPat', 1) <> ''
         |    THEN regexp_extract(html, '$csPat', 1)
         |    ELSE regexp_extract(html, '$legPat', 1) END) AS declared,
         |  len(regexp_extract_all(html, '$mojiPat'))::INTEGER
         |    AS n_marks
         |  FROM r)
         |SELECT doc_id, declared, n_marks,
         |  CASE WHEN n_marks = 0 THEN 'clean'
         |    WHEN declared = 'utf-8' THEN 'double-encoded'
         |    WHEN declared <> '' THEN 'mis-served'
         |    ELSE 'undeclared-suspect' END AS verdict
         |FROM c""".stripMargin
    },

    // HTML head metadata: same dotall regexes; attribute-order
    // fallbacks as CASE chains; charset lowercased
    "q159_html_meta" ->
      """WITH r AS (SELECT doc_id, '<html>' ||
        |  CASE doc_id % 4
        |    WHEN 0 THEN '<head><TITLE> Doc ' || doc_id ||
        |      ' </TITLE><meta charset="UTF-8"><meta ' ||
        |      'name="description" content="first flavor"></head>'
        |    WHEN 1 THEN '<head><meta content="second flavor" ' ||
        |      'name="description"><meta http-equiv="Content-Type" ' ||
        |      'content="text/html; charset=iso-8859-1"><title>t' ||
        |      (doc_id % 9) || '</title></head>'
        |    WHEN 2 THEN
        |      '<head><meta charset=utf-8><title>bare</title></head>'
        |    ELSE '<head></head>' END || '<body>x</body></html>'
        |    AS html FROM documents)
        |SELECT doc_id,
        |  regexp_extract(html,
        |    '(?is)<title[^>]*>\s*(.*?)\s*</title>', 1) AS title,
        |  CASE WHEN regexp_extract(html,
        |      '(?is)<meta\s+name="description"\s+content="([^"]*)"',
        |      1) <> ''
        |    THEN regexp_extract(html,
        |      '(?is)<meta\s+name="description"\s+content="([^"]*)"', 1)
        |    ELSE regexp_extract(html,
        |      '(?is)<meta\s+content="([^"]*)"\s+name="description"', 1)
        |  END AS description,
        |  lower(CASE WHEN regexp_extract(html,
        |      '(?is)<meta\s+charset="?([a-zA-Z0-9_-]+)"?', 1) <> ''
        |    THEN regexp_extract(html,
        |      '(?is)<meta\s+charset="?([a-zA-Z0-9_-]+)"?', 1)
        |    ELSE regexp_extract(html,
        |      '(?is)<meta\s+http-equiv="content-type"[^>]*charset=([a-zA-Z0-9_-]+)',
        |      1) END) AS charset
        |FROM r""".stripMargin,

    // Exact-replay corr/regression: integer moment sums, fixed chain,
    // unrounded slope feeding the intercept
    "q158_regression" ->
      """WITH m AS (SELECT event_type,
        |  hour(ts)::BIGINT AS x, round(value * 1000)::BIGINT AS y
        |  FROM events),
        |s AS (SELECT event_type, count(*)::BIGINT AS n,
        |  sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
        |  sum(x * y)::BIGINT AS sxy, sum(x * x)::BIGINT AS sxx,
        |  sum(y * y)::BIGINT AS syy
        |  FROM m GROUP BY event_type),
        |d AS (SELECT event_type, n,
        |  n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE AS num,
        |  n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE AS denx,
        |  n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE AS deny,
        |  sx::DOUBLE AS sxd, sy::DOUBLE AS syd, n::DOUBLE AS nd
        |  FROM s)
        |SELECT event_type, n,
        |  round(CASE WHEN denx <= 0 OR deny <= 0 THEN NULL
        |    ELSE num / (sqrt(denx) * sqrt(deny)) END, 6) AS corr,
        |  round(CASE WHEN denx = 0 THEN NULL
        |    ELSE num / denx END, 6) AS slope,
        |  round(CASE WHEN denx = 0 THEN NULL
        |    ELSE (syd - (num / denx) * sxd) / nd END, 6) AS intercept
        |FROM d""".stripMargin,

    // Daily resample: per-user generate_series grid, zero fill
    "q156_resample_daily" ->
      """WITH daily AS (SELECT user_id, ts::DATE AS day,
        |  count(*)::BIGINT AS n_events
        |  FROM events GROUP BY user_id, ts::DATE),
        |span AS (SELECT user_id, min(day) AS d0, max(day) AS d1
        |  FROM daily GROUP BY user_id),
        |grid AS (SELECT user_id,
        |  unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
        |  FROM span)
        |SELECT g.user_id, g.day, coalesce(d.n_events, 0)::BIGINT
        |  AS n_events
        |FROM grid g LEFT JOIN daily d
        |  ON g.user_id = d.user_id AND g.day = d.day""".stripMargin,

    // EWMA: list_reduce (first-element seed) over the day-ordered
    // series; the (1-alpha)/alpha constants interpolate from the same
    // Scala doubles the Spark fold uses
    "q157_ewma" -> {
      val alpha = 0.3
      s"""WITH daily AS (SELECT user_id, ts::DATE AS day,
         |  count(*)::BIGINT AS n_events
         |  FROM events GROUP BY user_id, ts::DATE),
         |span AS (SELECT user_id, min(day) AS d0, max(day) AS d1
         |  FROM daily GROUP BY user_id),
         |grid AS (SELECT user_id,
         |  unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
         |  FROM span),
         |rs AS (SELECT g.user_id, g.day,
         |  coalesce(d.n_events, 0)::DOUBLE AS x
         |  FROM grid g LEFT JOIN daily d
         |    ON g.user_id = d.user_id AND g.day = d.day),
         |arr AS (SELECT user_id, list(x ORDER BY day) AS xs,
         |  max(day) AS last_day
         |  FROM rs GROUP BY user_id)
         |SELECT user_id, len(xs)::INTEGER AS n_days, last_day,
         |  round(list_reduce(xs,
         |    (a, b) -> a * ${1.0 - alpha} + b * $alpha), 6) AS ewma
         |FROM arr""".stripMargin
    },

    // Set algebra: INTERSECT/EXCEPT distinct semantics
    "q151_set_algebra" ->
      """WITH a AS (SELECT doc_id FROM documents WHERE doc_id % 2 = 0),
        |b AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 0),
        |u AS (SELECT doc_id, 'intersect' AS op FROM
        |        (SELECT doc_id FROM a INTERSECT SELECT doc_id FROM b)
        |      UNION ALL
        |      SELECT doc_id, 'except' AS op FROM
        |        (SELECT doc_id FROM a EXCEPT SELECT doc_id FROM b))
        |SELECT op, count(*)::BIGINT AS n, min(doc_id) AS min_id,
        |  max(doc_id) AS max_id
        |FROM u GROUP BY op""".stripMargin,

    // Window analytics: total (micros, event_id) order per user
    "q152_window_analytics" ->
      """SELECT event_id, user_id,
        |  epoch_us(ts)::BIGINT - lag(epoch_us(ts)::BIGINT) OVER w
        |    AS gap_us,
        |  (ntile(4) OVER w)::INTEGER AS quartile,
        |  round(percent_rank() OVER w, 6) AS pr,
        |  round(cume_dist() OVER w, 6) AS cd
        |FROM events
        |WINDOW w AS (PARTITION BY user_id
        |  ORDER BY epoch_us(ts)::BIGINT, event_id)""".stripMargin,

    // Unpivot: wide metric row-set back to (metric, value) long form
    "q153_unpivot" ->
      """WITH wtab AS (SELECT l_returnflag,
        |  sum(l_quantity) AS sum_qty, sum(l_tax) AS sum_tax,
        |  count(*)::DOUBLE AS n_rows
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, metric, round(value, 6) AS value
        |FROM (UNPIVOT wtab ON sum_qty, sum_tax, n_rows
        |      INTO NAME metric VALUE value)""".stripMargin,

    // Calendar rollup: Monday-start weeks on both engines
    "q154_calendar" ->
      """SELECT date_trunc('week', ts)::DATE AS week_start,
        |  count(*)::BIGINT AS n_events,
        |  count(DISTINCT user_id)::BIGINT AS n_users,
        |  count(DISTINCT ts::DATE)::BIGINT AS n_active_days,
        |  date_diff('day', min(ts::DATE), max(ts::DATE))::INTEGER
        |    AS span_days
        |FROM events GROUP BY 1""".stripMargin,

    // Scalar string functions over the distinct source labels
    "q155_string_funcs" ->
      """SELECT DISTINCT source,
        |  translate(source, 'aeiou', 'AEIOU') AS tr,
        |  levenshtein(source, 'web')::INTEGER AS lev,
        |  repeat(substr(source, 1, 2), 3) AS rep,
        |  reverse(source) AS rev,
        |  ascii(source)::INTEGER AS asc,
        |  lpad(source, 10, '.') AS pad
        |FROM documents""".stripMargin,

    // Crawl frontier: q132's canonical chain (page grid %37) -> min-
    // keeper dedup -> seen anti-join -> q131's seeded md5 host cap
    "q150_crawl_frontier" ->
      """WITH u AS (SELECT doc_id,
        |'HTTPS://WWW.' || source || '.Example.com/Page/' ||
        |  (doc_id % 37) ||
        |CASE WHEN doc_id % 3 = 0 THEN '?utm_source=x&id=' || (doc_id % 5)
        |     WHEN doc_id % 3 = 1
        |       THEN '?id=' || (doc_id % 5) || '&utm_campaign=y#frag'
        |     ELSE '/' END AS url
        |FROM documents),
        |n AS (SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(url,
        |'#.*$', '', 'g'),
        |'([?&])(utm_[a-zA-Z]+|gclid|fbclid|msclkid|ref)=[^&#]*', '\1', 'g'),
        |'\?&+', '?', 'g'),
        |'&&+', '&', 'g'),
        |'[?&]+$', '', 'g'),
        |'/$', '', 'g') AS ns FROM u),
        |c AS (SELECT doc_id, lower(regexp_extract(ns, '^([a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?[^/?#]*)', 1)) ||
        |regexp_replace(ns, '^([a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?[^/?#]*)', '', 'g') AS url FROM n),
        |d AS (SELECT url, min(doc_id) AS keeper_doc_id
        |      FROM c GROUP BY url),
        |seen AS (SELECT DISTINCT url FROM c WHERE doc_id % 3 = 0),
        |fresh AS (SELECT d.url, d.keeper_doc_id FROM d
        |  LEFT JOIN seen ON d.url = seen.url WHERE seen.url IS NULL),
        |h AS (SELECT url, keeper_doc_id, lower(regexp_extract(url,
        |  '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)', 1))
        |    AS host FROM fresh),
        |r AS (SELECT url, keeper_doc_id, host,
        |  (row_number() OVER (PARTITION BY host
        |     ORDER BY md5(keeper_doc_id::VARCHAR || ':' || '31'),
        |       keeper_doc_id) - 1)::BIGINT AS rank FROM h)
        |SELECT url, keeper_doc_id, host, rank FROM r
        |WHERE rank < 10""".stripMargin,

    // Winsorized stats: q36's quantile_cont thresholds (rounded 6),
    // clip, micro-snap, integer sums, two fixed divisions
    "q148_winsorized" ->
      """WITH q AS (SELECT event_type,
        |  round(quantile_cont(value, 0.1), 6) AS lo,
        |  round(quantile_cont(value, 0.9), 6) AS hi
        |  FROM events GROUP BY event_type),
        |c AS (SELECT e.event_type, value, lo, hi,
        |  CASE WHEN value < lo THEN lo WHEN value > hi THEN hi
        |    ELSE value END AS cl
        |  FROM events e JOIN q USING (event_type))
        |SELECT event_type, count(*)::BIGINT AS n,
        |  sum(CASE WHEN value < lo THEN 1 ELSE 0 END)::BIGINT
        |    AS n_clipped_lo,
        |  sum(CASE WHEN value > hi THEN 1 ELSE 0 END)::BIGINT
        |    AS n_clipped_hi,
        |  sum(round(cl * 1e6)::BIGINT)::BIGINT AS win_sum_micro,
        |  round(sum(round(cl * 1e6)::BIGINT)::DOUBLE /
        |    count(*)::DOUBLE / 1e6, 6) AS win_mean
        |FROM c GROUP BY event_type""".stripMargin,

    // Interval overlap: the bins keep each pair exactly once, so the
    // oracle is the plain keyed conditional join
    "q149_interval_overlap" ->
      """WITH l AS (SELECT doc_id % 7 AS grp, doc_id AS l_id,
        |  doc_id * 10 AS l_lo, doc_id * 10 + 25 AS l_hi
        |  FROM documents),
        |r AS (SELECT doc_id % 7 AS grp, doc_id AS r_id,
        |  doc_id * 9 AS r_lo, doc_id * 9 + 30 AS r_hi
        |  FROM documents)
        |SELECT l.grp, l_id, r_id,
        |  least(l_hi, r_hi) - greatest(l_lo, r_lo) AS overlap
        |FROM l JOIN r ON l.grp = r.grp
        |WHERE l_lo <= r_hi AND r_lo <= l_hi""".stripMargin,

    // Expectations: one-scan CASE sums, NULL rule result = violation
    "q147_expectations" -> {
      val rules = Seq(
        "qty_in_range" -> "l_quantity BETWEEN 1 AND 50",
        "discount_low" -> "l_discount <= 0.05",
        "tax_nonneg" -> "l_tax >= 0",
        "returnflag_enum" -> "l_returnflag IN ('A', 'N', 'R')",
        "shipdate_not_null" -> "l_shipdate IS NOT NULL",
        "price_positive" -> "l_extendedprice > 0")
      val sums = rules.zipWithIndex.map { case ((_, p), i) =>
        s"sum(CASE WHEN coalesce($p, false) THEN 0 ELSE 1 END)" +
          s"::BIGINT AS v$i"
      }.mkString(",\n        |  ")
      val arms = rules.zipWithIndex.map { case ((n, _), i) =>
        s"SELECT '$n' AS rule, v$i AS n_violations, n AS n_rows,\n" +
          s"        |  round(v$i::DOUBLE / n::DOUBLE, 6)" +
          s" AS violation_rate FROM t"
      }.mkString("\n        |UNION ALL\n        |")
      s"""WITH t AS (SELECT count(*)::BIGINT AS n,
        |  $sums
        |  FROM lineitem)
        |$arms""".stripMargin
    },

    // Label propagation: 3 unrolled synchronous rounds — per-(node,
    // label) neighbor counts, (cnt desc, label) row_number winner,
    // no-neighbor carry-through; integer-only
    "q146_communities" -> {
      val rounds = (1 to 3).map { r =>
        s"""c$r AS (SELECT e2.dst AS id, l.label, count(*) AS cnt
           |  FROM e2 JOIN l${r - 1} l ON e2.src = l.id
           |  GROUP BY e2.dst, l.label),
           |p$r AS (SELECT id, label FROM (
           |    SELECT id, label, row_number() OVER (PARTITION BY id
           |      ORDER BY cnt DESC, label) AS rn FROM c$r)
           |  WHERE rn = 1),
           |l$r AS (SELECT l.id, coalesce(p.label, l.label) AS label
           |  FROM l${r - 1} l LEFT JOIN p$r p ON l.id = p.id)"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH cnt AS (SELECT count(*)::BIGINT AS n FROM documents),
         |ed AS (SELECT doc_id AS src, (doc_id + k * 10) % n AS dst
         |       FROM documents CROSS JOIN cnt
         |       CROSS JOIN (SELECT unnest([1, 2]) AS k)),
         |e2 AS (SELECT src, dst FROM ed
         |       UNION ALL SELECT dst AS src, src AS dst FROM ed),
         |l0 AS (SELECT doc_id AS id, doc_id AS label FROM documents),
         |$rounds
         |SELECT id AS doc_id, label AS community FROM l3""".stripMargin
    },

    // Hybrid RRF: q78's BM25 pico-score chain + q17's cosine chain for
    // query vectors 1-3, fused with 1/(60+rank) terms in a fixed
    // 2-term sum; final re-rank (rrf desc, id)
    "q145_hybrid_rrf" -> {
      val dim = 64
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w
         |           FROM documents),
         |ix AS (SELECT doc_id, greatest(len(w), 0) AS dl,
         |        unnest(w) AS term FROM d),
         |tf AS (SELECT doc_id, term, count(*) AS tf, min(dl) AS dl
         |       FROM ix GROUP BY doc_id, term),
         |st AS (SELECT count(*)::BIGINT AS n,
         |        (sum(dl)::DOUBLE / count(*)::DOUBLE) AS avgdl
         |       FROM (SELECT doc_id, min(dl) AS dl FROM tf
         |             GROUP BY doc_id)),
         |dfq AS (SELECT term, count(*) AS dfc FROM tf GROUP BY term),
         |idf AS (SELECT term,
         |        round(ln(((n - dfc)::DOUBLE + 0.5) /
         |          (dfc::DOUBLE + 0.5) + 1.0) * 1000000.0)::BIGINT
         |          AS idf_micro
         |       FROM dfq, st),
         |q AS (SELECT * FROM (VALUES
         |        (1::BIGINT, 'spark'), (1, 'join'), (1, 'window'),
         |        (2, 'slow'), (2, 'query'), (2, 'filter'),
         |        (3, 'customer'), (3, 'order'), (3, 'the'))
         |        AS v(query_id, term)),
         |qi AS (SELECT q.query_id, q.term, idf.idf_micro
         |       FROM q JOIN idf USING (term)),
         |sc AS (SELECT qi.query_id, tf.doc_id,
         |        (qi.idf_micro *
         |         round(((tf.tf::DOUBLE * ${1.2 + 1.0}) /
         |           (tf.tf::DOUBLE + ${1.2} * (${1.0 - 0.75} +
         |            ${0.75} * (tf.dl::DOUBLE / st.avgdl))))
         |           * 1000000.0)::BIGINT) AS s
         |       FROM tf JOIN qi USING (term), st),
         |ag AS (SELECT query_id, doc_id, sum(s)::BIGINT AS score_pico
         |       FROM sc GROUP BY query_id, doc_id),
         |br AS (SELECT query_id, doc_id, score_pico,
         |        row_number() OVER (PARTITION BY query_id
         |          ORDER BY score_pico DESC, doc_id ASC) AS rn FROM ag),
         |bm AS (SELECT query_id AS qid, doc_id AS id, rn AS rank
         |       FROM br WHERE rn <= 10),
         |qv AS (SELECT vec_id AS qid2, embedding AS qv FROM embeddings
         |       WHERE vec_id IN (1, 2, 3)),
         |cvs AS (SELECT vec_id AS cid, embedding AS cv
         |        FROM embeddings),
         |cp AS (SELECT qid2, cid,
         |        round(${duckDot("qv", "cv", dim)} /
         |          (sqrt(${duckDot("qv", "qv", dim)}) *
         |           sqrt(${duckDot("cv", "cv", dim)})), 6) AS cos_sim
         |       FROM qv, cvs WHERE qid2 != cid),
         |cr AS (SELECT qid2, cid, row_number() OVER (PARTITION BY qid2
         |        ORDER BY cos_sim DESC, cid) AS rn FROM cp),
         |cosl AS (SELECT qid2 AS qid, cid AS id, rn AS rank
         |         FROM cr WHERE rn <= 10),
         |f AS (SELECT coalesce(bm.qid, cosl.qid) AS qid,
         |        coalesce(bm.id, cosl.id) AS id,
         |        round(coalesce(1.0 / (60.0 + bm.rank::DOUBLE), 0.0) +
         |          coalesce(1.0 / (60.0 + cosl.rank::DOUBLE), 0.0), 6)
         |          AS rrf
         |      FROM bm FULL OUTER JOIN cosl
         |        ON bm.qid = cosl.qid AND bm.id = cosl.id),
         |fr AS (SELECT qid, id, rrf, row_number() OVER
         |        (PARTITION BY qid ORDER BY rrf DESC, id) AS rk FROM f)
         |SELECT qid AS query_id, id AS doc_id, rrf,
         |  rk::INTEGER AS rank
         |FROM fr WHERE rk <= 10""".stripMargin
    },

    // Card/phone PII with Luhn: shared pattern constants; the checksum
    // replays as a list comprehension over reverse(s)[i] (1-based i
    // odd = Spark's 0-based even); redaction layers in the q46 order
    "q144_pii_cards" -> {
      val url = TextOps.urlPattern
      val email = TextOps.emailPattern
      val card = TextOps.cardCandidatePattern
      val phone = TextOps.phonePattern
      val strip = "regexp_replace(c, '[ -]', '', 'g')"
      s"""WITH r AS (SELECT doc_id,
         |  CASE doc_id % 5
         |    WHEN 0 THEN 'pay 4539578763621486 now'
         |    WHEN 1 THEN 'pay 4539-5787-6362-1487 now'
         |    WHEN 2 THEN 'amex 3782 822463 10005 ok'
         |    WHEN 3 THEN 'call (555) 123-4567 or 555-987-6543'
         |    ELSE source END AS t
         |  FROM documents)
         |SELECT doc_id,
         |  len(regexp_extract_all(t, '$card'))::INTEGER AS n_cards,
         |  len(list_filter(regexp_extract_all(t, '$card'),
         |    c -> regexp_matches($strip, '^[0-9]{13,19}$$')
         |      AND list_sum([
         |        CASE WHEN i % 2 = 1 THEN reverse($strip)[i]::INT
         |          ELSE CASE WHEN reverse($strip)[i]::INT * 2 > 9
         |            THEN reverse($strip)[i]::INT * 2 - 9
         |            ELSE reverse($strip)[i]::INT * 2 END
         |        END
         |        for i in generate_series(1, length($strip))]) % 10 = 0
         |    ))::INTEGER AS n_luhn_valid,
         |  len(regexp_extract_all(t, '$phone'))::INTEGER AS n_phones,
         |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
         |    t, '$url', '<URL>', 'g'), '$email', '<EMAIL>', 'g'),
         |    '$card', '<CARD>', 'g'), '$phone', '<PHONE>', 'g')
         |    AS redacted
         |FROM r""".stripMargin
    },

    // Sitemap round-trip: string_agg ORDER BY = Spark's byte-ordered
    // array_sort fold; identical dotall block regex on both engines
    "q142_sitemap" ->
      """WITH e AS (SELECT source,
        |  '<url><loc>https://ex.com/' || source || '/' || doc_id ||
        |  '</loc>' ||
        |  CASE WHEN doc_id % 4 = 0 THEN ''
        |    ELSE '<lastmod>2024-01-' ||
        |      lpad((doc_id % 28 + 1)::VARCHAR, 2, '0') || '</lastmod>'
        |  END || '</url>' AS e
        |  FROM documents),
        |x AS (SELECT source,
        |  '<urlset>' || string_agg(e, '' ORDER BY e) || '</urlset>'
        |    AS xml FROM e GROUP BY source),
        |b AS (SELECT source, unnest(regexp_extract_all(xml,
        |  '(?s)<url>(.*?)</url>', 1)) AS blk FROM x)
        |SELECT source,
        |  regexp_extract(blk, '<loc>\s*([^<]*?)\s*</loc>', 1) AS loc,
        |  CASE WHEN regexp_extract(blk,
        |      '<lastmod>\s*([^<]*?)\s*</lastmod>', 1) = '' THEN NULL
        |    ELSE regexp_extract(blk,
        |      '<lastmod>\s*([^<]*?)\s*</lastmod>', 1) END AS lastmod
        |FROM b
        |WHERE regexp_extract(blk, '<loc>\s*([^<]*?)\s*</loc>', 1)
        |  <> ''""".stripMargin,

    // Readability: regexp counts + the standard FK / Flesch fixed
    // float chains; sentence count floored at 1; zero-word NULLs
    "q143_readability" ->
      """WITH c AS (SELECT doc_id,
        |  len(regexp_extract_all(text, '[A-Za-z]+'))::INTEGER AS w,
        |  greatest(1, len(regexp_extract_all(text, '[.!?]+')))
        |    ::INTEGER AS sen,
        |  len(regexp_extract_all(text, '(?i)[aeiouy]+'))::INTEGER
        |    AS syl
        |  FROM documents)
        |SELECT doc_id, w AS n_words, sen AS n_sentences,
        |  syl AS n_syllables,
        |  round(CASE WHEN w = 0 THEN NULL
        |    ELSE 0.39 * (w::DOUBLE / sen::DOUBLE) +
        |      11.8 * (syl::DOUBLE / w::DOUBLE) - 15.59 END, 6)
        |    AS fk_grade,
        |  round(CASE WHEN w = 0 THEN NULL
        |    ELSE 206.835 - 1.015 * (w::DOUBLE / sen::DOUBLE) -
        |      84.6 * (syl::DOUBLE / w::DOUBLE) END, 6) AS flesch_ease
        |FROM c""".stripMargin,

    // robots.txt evaluation: the full Robots.parseRules + evaluate
    // chain — zipped unnest for line positions, the same (?i) line
    // regex, lag+running-sum group ids, exact-agent override,
    // longest-prefix arg_max on the identical padded key
    "q141_robots" ->
      """WITH robots AS (SELECT * FROM (VALUES
        |  ('a.example.com', 'User-agent: *' || chr(10) ||
        |    'Disallow: /private/' || chr(10) || 'Allow: /private/ok'
        |    || chr(10) || '# comment' || chr(10) || 'Disallow: /tmp/'),
        |  ('b.example.com', 'User-agent: graftbot' || chr(10) ||
        |    'Disallow: /' || chr(10) || 'User-agent: *' || chr(10) ||
        |    'Disallow: /blocked/'),
        |  ('c.example.com', 'User-agent: otherbot' || chr(10) ||
        |    'Disallow: /')) AS v(host, body)),
        |lines0 AS (SELECT host,
        |  unnest(string_split(body, chr(10))) AS line,
        |  unnest(generate_series(1,
        |    len(string_split(body, chr(10))))) AS pos FROM robots),
        |cls AS (SELECT host, pos,
        |  lower(regexp_extract(regexp_replace(line, '#.*$', '', 'g'),
        |    '(?i)^[ \t]*(user-agent|disallow|allow|crawl-delay)[ \t]*:[ \t]*(.*)$',
        |    1)) AS kind,
        |  trim(regexp_extract(regexp_replace(line, '#.*$', '', 'g'),
        |    '(?i)^[ \t]*(user-agent|disallow|allow|crawl-delay)[ \t]*:[ \t]*(.*)$',
        |    2)) AS value
        |  FROM lines0),
        |k AS (SELECT * FROM cls WHERE kind <> ''),
        |g AS (SELECT host, pos, kind, value,
        |  kind = 'user-agent' AS is_agent,
        |  (kind = 'user-agent') AND NOT coalesce(
        |    lag(kind = 'user-agent') OVER
        |      (PARTITION BY host ORDER BY pos), false) AS starts_group
        |  FROM k),
        |g2 AS (SELECT *, sum(CASE WHEN starts_group THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY host ORDER BY pos) AS grp FROM g),
        |agents AS (SELECT host, grp, value AS agent FROM g2
        |  WHERE is_agent),
        |rules AS (SELECT host, grp, kind = 'allow' AS allow,
        |    value AS path FROM g2
        |  WHERE kind IN ('allow', 'disallow') AND value <> ''),
        |prules AS (SELECT host, agent, allow, path
        |  FROM agents JOIN rules USING (host, grp)),
        |hs AS (SELECT host, max(lower(agent) = 'graftbot')
        |    AS has_specific FROM prules GROUP BY host),
        |app AS (SELECT DISTINCT p.host, allow, path
        |  FROM prules p JOIN hs USING (host)
        |  WHERE lower(agent) = 'graftbot'
        |    OR (NOT has_specific AND agent = '*')),
        |urls AS (SELECT DISTINCT 'https://' ||
        |  ['a.example.com', 'b.example.com', 'c.example.com']
        |    [(doc_id % 3 + 1)] || '/' ||
        |  ['private/x', 'private/ok/y', 'tmp/z', 'blocked/w', 'pub/p']
        |    [(doc_id % 5 + 1)] AS url FROM documents),
        |u AS (SELECT url,
        |  lower(regexp_extract(url,
        |    '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)', 1))
        |    AS host,
        |  CASE WHEN p0 = '' OR starts_with(p0, '#') THEN '/'
        |    ELSE regexp_replace(p0, '#.*$', '', 'g') END AS _path
        |  FROM (SELECT url, regexp_replace(url,
        |    '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', '', 'g') AS p0
        |    FROM urls)),
        |m AS (SELECT url, arg_max(allow, _k) AS _verdict,
        |    arg_max(path, _k) AS matched_path
        |  FROM (SELECT u.url, a.allow, a.path,
        |      lpad(length(a.path)::VARCHAR, 10, '0') ||
        |      (CASE WHEN a.allow THEN '1' ELSE '0' END) || a.path AS _k
        |    FROM u JOIN app a ON u.host = a.host
        |    WHERE starts_with(u._path, a.path))
        |  GROUP BY url)
        |SELECT u.url, u.host, coalesce(m._verdict, true) AS allowed,
        |  m.matched_path
        |FROM u LEFT JOIN m USING (url)""".stripMargin,

    // PR/F1 threshold sweep: explode-per-threshold integer counts,
    // single-division ratios, NULL on zero denominators (NaN hashing
    // differs across engines); "precision" quoted (DuckDB type keyword)
    "q140_pr_curve" ->
      """WITH s AS (SELECT doc_id,
        |  ('0x' || substr(md5('pr:' || doc_id), 1, 8))
        |    ::UBIGINT::BIGINT::DOUBLE / 4294967296.0 AS h,
        |  (doc_id % 10) < 3 AS label FROM documents),
        |sc AS (SELECT doc_id, label,
        |  CASE WHEN label THEN 0.5 + h * 0.5 ELSE h END AS score
        |  FROM s),
        |x AS (SELECT score, label, t.threshold FROM sc CROSS JOIN
        |  (SELECT unnest([0.1::DOUBLE, 0.2::DOUBLE, 0.3::DOUBLE,
        |     0.4::DOUBLE, 0.5::DOUBLE, 0.6::DOUBLE, 0.7::DOUBLE,
        |     0.8::DOUBLE, 0.9::DOUBLE]) AS threshold) t),
        |c AS (SELECT threshold,
        |  sum(CASE WHEN score >= threshold AND label
        |    THEN 1 ELSE 0 END)::BIGINT AS tp,
        |  sum(CASE WHEN score >= threshold AND NOT label
        |    THEN 1 ELSE 0 END)::BIGINT AS fp,
        |  sum(CASE WHEN score < threshold AND label
        |    THEN 1 ELSE 0 END)::BIGINT AS fn
        |  FROM x GROUP BY threshold),
        |pr AS (SELECT threshold, tp, fp, fn,
        |  CASE WHEN tp + fp = 0 THEN NULL
        |    ELSE tp::DOUBLE / (tp + fp)::DOUBLE END AS p_raw,
        |  CASE WHEN tp + fn = 0 THEN NULL
        |    ELSE tp::DOUBLE / (tp + fn)::DOUBLE END AS r_raw
        |  FROM c)
        |SELECT threshold, tp, fp, fn,
        |  round(p_raw, 6) AS "precision",
        |  round(r_raw, 6) AS recall,
        |  round(CASE WHEN p_raw + r_raw = 0 THEN NULL
        |    ELSE 2.0 * p_raw * r_raw / (p_raw + r_raw) END, 6) AS f1
        |FROM pr""".stripMargin,

    // First-/last-touch attribution: the rangeJoin's bins change
    // nothing about the matched set, so the oracle is the plain
    // user-equi-join + BETWEEN; picks replay as arg_min/arg_max on
    // the identical zero-padded (micros, event_id) key
    "q139_attribution" ->
      """WITH t AS (SELECT user_id, epoch_us(ts)::BIGINT AS touch_us,
        |    event_id AS touch_id, event_type AS touch_type
        |  FROM events WHERE event_type IN ('view', 'click')),
        |c AS (SELECT user_id, event_id AS conv_id,
        |    epoch_us(ts)::BIGINT AS conv_us
        |  FROM events WHERE event_type = 'purchase'),
        |p AS (SELECT c.conv_id, t.touch_type,
        |    lpad(t.touch_us::VARCHAR, 20, '0') || ':' ||
        |      lpad(t.touch_id::VARCHAR, 20, '0') AS k
        |  FROM c JOIN t ON c.user_id = t.user_id
        |  WHERE t.touch_us BETWEEN c.conv_us - 86400000000
        |    AND c.conv_us),
        |g AS (SELECT conv_id, arg_min(touch_type, k) AS first_touch,
        |    arg_max(touch_type, k) AS last_touch
        |  FROM p GROUP BY conv_id)
        |SELECT c.conv_id, c.user_id, g.first_touch, g.last_touch
        |FROM c LEFT JOIN g USING (conv_id)""".stripMargin,

    // Mojibake markers: RE2 spelling of TextOps.mojibakeScore's three
    // double-encoding signatures; counts via regexp_extract_all
    "q138_mojibake" ->
      """WITH r AS (SELECT doc_id,
        |  CASE doc_id % 4
        |    WHEN 0 THEN 'caf' || chr(195) || chr(169) || ' menu #' ||
        |      (doc_id % 7)
        |    WHEN 1 THEN 'caf' || chr(233) || ' menu #' || (doc_id % 7)
        |    WHEN 2 THEN 'it' || chr(226) || chr(8364) || chr(8482) ||
        |      's ok'
        |    ELSE source END AS t
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(t,
        |    '(\x{00C3}[\x{0080}-\x{00BF}])|(\x{00E2}\x{20AC}.)|(\x{00C2}[\x{00A0}-\x{00BF}])'))::INTEGER AS n_marks,
        |  len(regexp_extract_all(t,
        |    '(\x{00C3}[\x{0080}-\x{00BF}])|(\x{00E2}\x{20AC}.)|(\x{00C2}[\x{00A0}-\x{00BF}])')) > 0 AS suspect
        |FROM r""".stripMargin,

    // CUBE lattice over events: order-free aggregates only (counts,
    // exact distinct, min/max) — no float-fold discipline needed
    "q136_cube" ->
      """WITH e AS (SELECT event_type, hour(ts)::INTEGER AS hr,
        |  user_id, value FROM events)
        |SELECT event_type, hr, count(*)::BIGINT AS n_events,
        |  count(DISTINCT user_id)::BIGINT AS n_users,
        |  max(value) AS max_value, min(value) AS min_value
        |FROM e GROUP BY CUBE (event_type, hr)""".stripMargin,

    // NB classifier training: per-token class counts, add-one log-odds
    // in micro-nats (two single-division lns + one subtraction — the
    // q76/q77 discipline), class-prior bias as a __bias__ row
    "q126_classifier_train" ->
      """WITH lab AS (SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END
        |               AS y, text
        |             FROM documents WHERE lang IS NOT NULL),
        |t AS (SELECT y, unnest(string_split(text, ' ')) AS token
        |      FROM lab),
        |c AS (SELECT token,
        |        sum(CASE WHEN y = 1 THEN 1 ELSE 0 END)::BIGINT AS cp,
        |        sum(CASE WHEN y = 0 THEN 1 ELSE 0 END)::BIGINT AS cn
        |      FROM t GROUP BY 1),
        |tot AS (SELECT sum(cp)::BIGINT AS tp, sum(cn)::BIGINT AS tn,
        |          count(*)::BIGINT AS v FROM c),
        |d AS (SELECT sum(y)::BIGINT AS np,
        |        sum(1 - y)::BIGINT AS nn FROM lab)
        |SELECT token,
        |  (round((ln((cp + 1)::DOUBLE / (tp + v)::DOUBLE)
        |        - ln((cn + 1)::DOUBLE / (tn + v)::DOUBLE))
        |      * 1000000))::BIGINT AS weight_micro
        |FROM c CROSS JOIN tot
        |UNION ALL
        |SELECT '__bias__',
        |  (round(ln(np::DOUBLE / nn::DOUBLE) * 1000000))::BIGINT
        |FROM d""".stripMargin,

    // margin-based bitext mining: rounded-cosine pair grid, two-sided
    // kNN neighborhood averages via rank-ordered folds, margin division
    "q127_bitext_mine" -> q127,

    // KS distribution drift: q120's bottom-k sampling per snapshot,
    // empirical-CDF gaps as integer counts over sampled values divided
    // once, max over the merged sample points
    "q128_distribution_drift" ->
      """WITH v2 AS (SELECT source, doc_id,
        |         CASE WHEN doc_id % 7 = 0 THEN n_chars * 2
        |              ELSE n_chars END AS n_chars
        |       FROM documents WHERE doc_id % 10 != 0),
        |ho AS (SELECT source,
        |         (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))
        |           ::UBIGINT)::BIGINT AS hv,
        |         n_chars::DOUBLE AS v
        |       FROM documents),
        |ro AS (SELECT source, v, row_number() OVER
        |         (PARTITION BY source ORDER BY hv, v) AS rn FROM ho),
        |so AS (SELECT source, count(*)::INTEGER AS m_old,
        |         list_sort(list(v)) AS va
        |       FROM ro WHERE rn <= 256 GROUP BY 1),
        |co AS (SELECT source, count(*)::BIGINT AS n_old
        |       FROM documents GROUP BY 1),
        |hn AS (SELECT source,
        |         (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))
        |           ::UBIGINT)::BIGINT AS hv,
        |         n_chars::DOUBLE AS v
        |       FROM v2),
        |rn2 AS (SELECT source, v, row_number() OVER
        |         (PARTITION BY source ORDER BY hv, v) AS rn FROM hn),
        |sn AS (SELECT source, count(*)::INTEGER AS m_new,
        |         list_sort(list(v)) AS vb
        |       FROM rn2 WHERE rn <= 256 GROUP BY 1),
        |cn AS (SELECT source, count(*)::BIGINT AS n_new
        |       FROM v2 GROUP BY 1),
        |o2 AS (SELECT so.source, co.n_old, so.m_old, so.va
        |       FROM so JOIN co USING (source)),
        |n2 AS (SELECT sn.source, cn.n_new, sn.m_new, sn.vb
        |       FROM sn JOIN cn USING (source))
        |SELECT source,
        |  coalesce(n_old, 0)::BIGINT AS n_old,
        |  coalesce(n_new, 0)::BIGINT AS n_new,
        |  coalesce(m_old, 0)::INTEGER AS m_old,
        |  coalesce(m_new, 0)::INTEGER AS m_new,
        |  CASE WHEN coalesce(m_old, 0) > 0 AND coalesce(m_new, 0) > 0
        |    THEN round(list_aggregate(list_transform(
        |      list_concat(va, vb), x ->
        |        abs(len(list_filter(va, v -> v <= x))::DOUBLE
        |              / m_old::DOUBLE
        |          - len(list_filter(vb, v -> v <= x))::DOUBLE
        |              / m_new::DOUBLE)), 'max'), 6) END AS ks_est
        |FROM o2 FULL OUTER JOIN n2 USING (source)""".stripMargin,

    // TPC-H Q14 shape: promo revenue share, micro-cent BIGINTs, one
    // division for the percentage
    "q209_promo_revenue" ->
      """WITH j AS (
        |  SELECT p.p_type,
        |    (round(l.l_extendedprice * (1.0 - l.l_discount) * 100.0))
        |      ::BIGINT AS rev
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE l.l_shipdate >= '1996-03-01'
        |    AND l.l_shipdate <  '1996-04-01')
        |SELECT
        |  sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END)::BIGINT
        |    AS promo_cents,
        |  sum(rev)::BIGINT AS total_cents,
        |  CASE WHEN sum(rev) = 0 THEN NULL
        |    ELSE round(sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0
        |      END)::DOUBLE * 100.0 / sum(rev)::DOUBLE, 6)
        |  END AS promo_share_pct
        |FROM j""".stripMargin,

    // TPC-H Q17 shape: the 20%-of-avg filter as the exact integer
    // predicate 5*q*cnt < sum — no division anywhere
    "q210_small_qty_revenue" ->
      """WITH li AS (
        |  SELECT l.l_partkey, l.l_quantity::BIGINT AS q,
        |    (round(l.l_extendedprice * 100.0))::BIGINT AS price_c
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE p.p_brand = 'Brand#23'),
        |st AS (SELECT l_partkey, sum(q)::BIGINT AS sum_q,
        |    count(*)::BIGINT AS cnt_q
        |  FROM li GROUP BY 1)
        |SELECT count(*)::BIGINT AS n_items,
        |  coalesce(sum(li.price_c), 0)::BIGINT AS small_qty_cents
        |FROM li JOIN st ON li.l_partkey = st.l_partkey
        |WHERE li.q * 5 * st.cnt_q < st.sum_q""".stripMargin,

    // TPC-H Q18 shape: large-volume orders joined back to customer
    "q211_big_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, sum(l_quantity)::BIGINT AS sum_qty
        |  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 300)
        |SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
        |  (round(o.o_totalprice * 100.0))::BIGINT AS total_cents,
        |  big.sum_qty
        |FROM big
        |JOIN orders o ON big.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |ORDER BY total_cents DESC, o.o_orderkey
        |LIMIT 20""".stripMargin,

    // TPC-H Q13 shape: order-count histogram incl. the 0 bucket
    "q212_order_count_distribution" ->
      """WITH per AS (
        |  SELECT c.c_custkey, count(o.o_custkey)::BIGINT AS c_count
        |  FROM customer c
        |  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |  GROUP BY 1)
        |SELECT c_count, count(*)::BIGINT AS custdist
        |FROM per GROUP BY 1""".stripMargin,

    // TPC-H Q15 shape: quarterly max-revenue supplier(s), the max
    // re-joined as an equi condition
    "q213_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    sum((round(l_extendedprice * (1.0 - l_discount) * 100.0))
        |      ::BIGINT)::BIGINT AS total_cents
        |  FROM lineitem
        |  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
        |  GROUP BY 1)
        |SELECT s.s_suppkey, s.s_name, rev.total_cents
        |FROM rev
        |JOIN (SELECT max(total_cents) AS m FROM rev) mx
        |  ON rev.total_cents = mx.m
        |JOIN supplier s ON rev.l_suppkey = s.s_suppkey""".stripMargin,

    // TPC-H Q19 shape: three OR'd brand/size/quantity conjuncts
    "q214_disjunctive_filter" ->
      """SELECT count(*)::BIGINT AS n_items,
        |  coalesce(sum((round(l.l_extendedprice * (1.0 - l.l_discount)
        |    * 100.0))::BIGINT), 0)::BIGINT AS revenue_cents
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE
        |  (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
        |    AND l.l_quantity BETWEEN 1 AND 11)
        |  OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
        |    AND l.l_quantity BETWEEN 10 AND 20)
        |  OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
        |    AND l.l_quantity BETWEEN 20 AND 30)""".stripMargin,

    // TPC-H Q22 shape: above-average positive balance (exact integer
    // predicate bal_c*n > sum_c), anti-joined against recent orders
    "q215_dormant_customers" ->
      """WITH cust AS (
        |  SELECT c_custkey, c_nationkey,
        |    (round(c_acctbal * 100.0))::BIGINT AS bal_c
        |  FROM customer),
        |tot AS (SELECT sum(bal_c)::BIGINT AS sum_c,
        |    count(*)::BIGINT AS n_pos
        |  FROM cust WHERE bal_c > 0)
        |SELECT c.c_nationkey, count(*)::BIGINT AS n_custs,
        |  sum(c.bal_c)::BIGINT AS total_bal_cents
        |FROM cust c, tot
        |WHERE c.bal_c * tot.n_pos > tot.sum_c
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey
        |      AND o.o_orderdate >= '1999-01-01')
        |GROUP BY 1""".stripMargin,

    // TPC-H Q4 shape: EXISTS a lineitem shipped 90+ days after order
    "q216_late_order_priority" ->
      """SELECT o_orderpriority, count(*)::BIGINT AS n_orders
        |FROM orders o
        |WHERE o.o_orderdate >= '1997-01-01'
        |  AND o.o_orderdate <  '1997-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey
        |      AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
        |GROUP BY 1""".stripMargin,

    // TPC-H Q7 shape: bilateral nation trade volume per ship year
    "q217_trade_volume" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |  year(l.l_shipdate)::INTEGER AS l_year,
        |  sum((round(l.l_extendedprice * (1.0 - l.l_discount) * 100.0))
        |    ::BIGINT)::BIGINT AS revenue_cents
        |FROM lineitem l
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        |WHERE l.l_shipdate >= '1996-01-01' AND l.l_shipdate < '1998-01-01'
        |  AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        |    OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
        |GROUP BY 1, 2, 3""".stripMargin,

    // TPC-H Q8 shape: one nation's share of a region's revenue per
    // order year — numerator and denominator from the same pass, one
    // division at the end
    "q218_market_share" ->
      """WITH eu AS (
        |  SELECT c.c_custkey
        |  FROM customer c
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |  WHERE r.r_name = 'EUROPE'),
        |j AS (
        |  SELECT year(o.o_orderdate)::INTEGER AS o_year,
        |    sn.n_name AS supp_nation,
        |    (round(l.l_extendedprice * (1.0 - l.l_discount) * 100.0))
        |      ::BIGINT AS rev_c
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN eu ON o.o_custkey = eu.c_custkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        |  WHERE o.o_orderdate >= '1996-01-01'
        |    AND o.o_orderdate < '1998-01-01')
        |SELECT o_year,
        |  sum(CASE WHEN supp_nation = 'NATION_7' THEN rev_c ELSE 0 END)
        |    ::BIGINT AS nation_cents,
        |  sum(rev_c)::BIGINT AS total_cents,
        |  CASE WHEN sum(rev_c) = 0 THEN NULL
        |    ELSE round(
        |      sum(CASE WHEN supp_nation = 'NATION_7' THEN rev_c ELSE 0
        |        END)::DOUBLE / sum(rev_c)::DOUBLE, 6)
        |  END AS mkt_share
        |FROM j GROUP BY 1""".stripMargin,

    // TPC-H Q9 shape: keyword-part revenue by supplier nation and year
    "q219_product_profit" ->
      """SELECT n.n_name AS nation,
        |  year(l.l_shipdate)::INTEGER AS l_year,
        |  sum((round(l.l_extendedprice * (1.0 - l.l_discount) * 100.0))
        |    ::BIGINT)::BIGINT AS profit_cents
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |WHERE p.p_name LIKE '%gear%'
        |GROUP BY 1, 2""".stripMargin,

    // TPC-H Q12 shape: urgent/high vs lower priority lines per flag
    "q220_priority_lines" ->
      """SELECT l.l_returnflag,
        |  sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
        |  sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END)::BIGINT AS low_line_count
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE l.l_shipdate >= '1997-01-01'
        |  AND l.l_shipdate < '1998-01-01'
        |GROUP BY 1""".stripMargin,

    // TPC-H Q16 shape: distinct shipping suppliers per (brand, size),
    // suppressed suppliers removed NOT-IN-style
    "q221_supplier_diversity" ->
      """SELECT p.p_brand, p.p_size,
        |  count(DISTINCT l.l_suppkey)::BIGINT AS supplier_cnt
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE p.p_brand <> 'Brand#23' AND p.p_size <= 25
        |  AND l.l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2""".stripMargin,

    // TPC-H Q21 shape: sole late supplier on multi-supplier finished
    // orders
    "q222_lone_late_supplier" ->
      """WITH late AS (
        |  SELECT l.l_orderkey, l.l_suppkey
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE o.o_orderstatus = 'F'
        |    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |SELECT s.s_name, count(*)::BIGINT AS numwait
        |FROM late l1
        |JOIN supplier s ON l1.l_suppkey = s.s_suppkey
        |WHERE EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM late l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey)
        |GROUP BY 1
        |ORDER BY numwait DESC, s.s_name
        |LIMIT 20""".stripMargin,

    // TPC-H Q2 shape: min observed unit price per part slice, the
    // minimum re-joined as an equi condition, ties kept
    "q223_min_cost_supplier" ->
      """WITH unit AS (
        |  SELECT l.l_partkey, p.p_brand, l.l_suppkey,
        |    (round(l.l_extendedprice / l.l_quantity * 100.0))::BIGINT
        |      AS unit_c
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE p.p_type = 'STANDARD' AND p.p_size <= 10
        |    AND l.l_quantity > 0),
        |per_supp AS (
        |  SELECT l_partkey, p_brand, l_suppkey,
        |    min(unit_c)::BIGINT AS min_cents
        |  FROM unit GROUP BY 1, 2, 3),
        |per_part AS (
        |  SELECT l_partkey, min(min_cents) AS best FROM per_supp
        |  GROUP BY 1)
        |SELECT ps.l_partkey AS p_partkey, ps.p_brand, s.s_suppkey,
        |  s.s_name, ps.min_cents
        |FROM per_supp ps
        |JOIN per_part pp
        |  ON ps.l_partkey = pp.l_partkey AND ps.min_cents = pp.best
        |JOIN supplier s ON ps.l_suppkey = s.s_suppkey""".stripMargin,

    // TPC-H Q11 shape: parts above 1/1500 of total shipped value —
    // the share test as the exact integer predicate v*1500 > total
    "q224_important_parts" ->
      """WITH v AS (
        |  SELECT l_partkey,
        |    sum((round(l_extendedprice * 100.0))::BIGINT)::BIGINT
        |      AS value_cents
        |  FROM lineitem GROUP BY 1),
        |tot AS (SELECT sum(value_cents)::BIGINT AS total_c FROM v)
        |SELECT v.l_partkey, v.value_cents
        |FROM v, tot
        |WHERE v.value_cents * 1500 > tot.total_c""".stripMargin,

    // TPC-H Q20 shape: suppliers moving >100 units of keyword parts
    // in one year, nation attached
    "q225_keyword_shippers" ->
      """WITH vol AS (
        |  SELECT l.l_suppkey, sum(l.l_quantity)::BIGINT AS total_qty
        |  FROM lineitem l
        |  JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE p.p_name LIKE 'red%'
        |    AND l.l_shipdate >= '1997-01-01'
        |    AND l.l_shipdate < '1998-01-01'
        |  GROUP BY 1 HAVING sum(l.l_quantity) > 100)
        |SELECT s.s_suppkey, s.s_name, n.n_name AS nation, vol.total_qty
        |FROM vol
        |JOIN supplier s ON vol.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey""".stripMargin,

    // Mean reciprocal rank over the md5-derived ranking fixture:
    // first relevant rank per query via min, reciprocal in micros,
    // corpus MRR as one division of exact integer sums
    "q226_mrr" ->
      """WITH d AS (
        |  SELECT doc_id % 50 AS qid, doc_id // 50 AS rank0,
        |    CASE WHEN ('0x' || substr(md5('mrr|' || doc_id::VARCHAR),
        |        1, 8))::UBIGINT::BIGINT % 8 = 0
        |      THEN 1 ELSE 0 END AS rel
        |  FROM documents WHERE doc_id < 1000),
        |fh AS (
        |  SELECT qid, min(rank0 + 1) AS first_rank FROM d
        |  WHERE rel = 1 GROUP BY 1),
        |n AS (SELECT count(DISTINCT qid)::BIGINT AS n_queries FROM d)
        |SELECT count(*)::BIGINT AS n_answered, n.n_queries,
        |  round(sum((round(1000000.0 / first_rank::DOUBLE))::BIGINT)
        |      ::DOUBLE / n.n_queries::DOUBLE / 1000000.0, 6) AS mrr
        |FROM fh, n
        |GROUP BY n.n_queries""".stripMargin,

    // ROUGE-2 recall + BLEU-2 over deterministically perturbed pairs:
    // bigram multiset overlap, micro ratios, bp × sqrt(p1·p2)
    "q227_rouge_bleu" ->
      """WITH b AS (SELECT doc_id,
        |    (string_split(text, ' '))[1:12] AS ref FROM documents),
        |d AS (SELECT doc_id, ref,
        |    CASE WHEN doc_id % 2 = 0
        |      THEN array_slice(ref, 2, len(ref)) ELSE ref END AS dp
        |  FROM b),
        |pr AS (SELECT doc_id, ref,
        |    CASE WHEN doc_id % 5 = 0 AND len(dp) >= 3
        |      THEN list_concat(list_concat(array_slice(dp, 1, 2),
        |        ['the']), array_slice(dp, 4, len(dp)))
        |      ELSE dp END AS cand
        |  FROM d),
        |g AS (SELECT doc_id, ref, cand,
        |    list_transform(range(1, len(ref)),
        |      i -> ref[i] || ' ' || ref[i+1]) AS ref2,
        |    list_transform(range(1, len(cand)),
        |      i -> cand[i] || ' ' || cand[i+1]) AS cand2
        |  FROM pr),
        |ov AS (SELECT doc_id,
        |    len(cand)::BIGINT AS n_c1, len(ref)::BIGINT AS n_r1,
        |    len(ref2)::BIGINT AS n_r2, len(cand2)::BIGINT AS n_c2,
        |    coalesce(list_sum(list_transform(list_distinct(ref), t ->
        |      least(len(list_filter(cand, x -> x = t)),
        |            len(list_filter(ref, x -> x = t))))), 0)::BIGINT
        |      AS ov1,
        |    coalesce(list_sum(list_transform(list_distinct(ref2), t ->
        |      least(len(list_filter(cand2, x -> x = t)),
        |            len(list_filter(ref2, x -> x = t))))), 0)::BIGINT
        |      AS ov2
        |  FROM g)
        |SELECT doc_id, n_c1, n_r1, ov1, ov2,
        |  CASE WHEN n_r1 = 0 THEN 0
        |    ELSE (round(ov1 * 1000000.0 / n_r1))::BIGINT END
        |    AS rouge1_r_micro,
        |  CASE WHEN n_r2 = 0 THEN 0
        |    ELSE (round(ov2 * 1000000.0 / n_r2))::BIGINT END
        |    AS rouge2_r_micro,
        |  CASE WHEN n_c1 = 0 OR n_c2 = 0 THEN NULL
        |    ELSE (round(
        |      (CASE WHEN n_c1 >= n_r1 THEN 1.0
        |        ELSE exp(1.0 - n_r1::DOUBLE / n_c1::DOUBLE) END)
        |      * sqrt((ov1::DOUBLE / n_c1::DOUBLE)
        |           * (ov2::DOUBLE / n_c2::DOUBLE))
        |      * 1000000.0))::BIGINT END AS bleu2_micro
        |FROM ov""".stripMargin,

    // Chi-square independence (variant × converted): exact BIGINT
    // margin products, one division per expected count, micro-snapped
    // (O−E)²/E terms
    "q228_chi_square" ->
      """WITH per AS (
        |  SELECT (user_id % 2)::INTEGER AS variant,
        |    CASE WHEN sum(CASE WHEN event_type = 'purchase'
        |        THEN 1 ELSE 0 END) >= 14 THEN 1 ELSE 0 END
        |      AS converted
        |  FROM events GROUP BY user_id),
        |cells AS (SELECT variant, converted,
        |    count(*)::BIGINT AS observed
        |  FROM per GROUP BY 1, 2),
        |r AS (SELECT variant, sum(observed)::BIGINT AS rt
        |  FROM cells GROUP BY 1),
        |c AS (SELECT converted, sum(observed)::BIGINT AS ct
        |  FROM cells GROUP BY 1),
        |n AS (SELECT sum(observed)::BIGINT AS n FROM cells),
        |grid AS (SELECT r.variant, c.converted, r.rt, c.ct,
        |    coalesce(cells.observed, 0)::BIGINT AS observed
        |  FROM r CROSS JOIN c
        |  LEFT JOIN cells ON cells.variant = r.variant
        |    AND cells.converted = c.converted)
        |SELECT grid.variant, grid.converted, grid.observed,
        |  (round((grid.rt * grid.ct)::DOUBLE / n.n::DOUBLE * 1000000.0))
        |    ::BIGINT AS expected_micro,
        |  (round((grid.observed::DOUBLE
        |      - (grid.rt * grid.ct)::DOUBLE / n.n::DOUBLE)
        |    * (grid.observed::DOUBLE
        |      - (grid.rt * grid.ct)::DOUBLE / n.n::DOUBLE)
        |    / ((grid.rt * grid.ct)::DOUBLE / n.n::DOUBLE)
        |    * 1000000.0))::BIGINT AS term_micro
        |FROM grid, n""".stripMargin,

    // Per-source Spearman: doubled average-tie ranks from prefix sums
    // over the distinct-value table, Pearson on the integer ranks via
    // HUGEINT moments
    "q229_spearman" ->
      """WITH b AS (SELECT source, n_chars AS a,
        |    len(string_split(text, ' '))::BIGINT AS bb
        |  FROM documents),
        |da AS (SELECT source, a, count(*)::BIGINT AS cnt FROM b
        |  GROUP BY 1, 2),
        |ra AS (SELECT source, a,
        |    2 * (sum(cnt) OVER (PARTITION BY source ORDER BY a) - cnt)
        |      + cnt + 1 AS r2a
        |  FROM da),
        |db AS (SELECT source, bb, count(*)::BIGINT AS cnt FROM b
        |  GROUP BY 1, 2),
        |rb AS (SELECT source, bb,
        |    2 * (sum(cnt) OVER (PARTITION BY source ORDER BY bb) - cnt)
        |      + cnt + 1 AS r2b
        |  FROM db),
        |j AS (SELECT b.source, ra.r2a, rb.r2b FROM b
        |  JOIN ra ON b.source = ra.source AND b.a = ra.a
        |  JOIN rb ON b.source = rb.source AND b.bb = rb.bb),
        |g AS (SELECT source, count(*)::BIGINT AS n_docs,
        |    count(*)::HUGEINT AS n,
        |    sum(r2a::HUGEINT) AS sx, sum(r2b::HUGEINT) AS sy,
        |    sum(r2a::HUGEINT * r2b::HUGEINT) AS sxy,
        |    sum(r2a::HUGEINT * r2a::HUGEINT) AS sxx,
        |    sum(r2b::HUGEINT * r2b::HUGEINT) AS syy
        |  FROM j GROUP BY 1)
        |SELECT source, n_docs,
        |  CASE WHEN (n * sxx - sx * sx)::DOUBLE = 0
        |      OR (n * syy - sy * sy)::DOUBLE = 0 THEN NULL
        |    ELSE round((n * sxy - sx * sy)::DOUBLE /
        |      (sqrt((n * sxx - sx * sx)::DOUBLE)
        |       * sqrt((n * syy - sy * sy)::DOUBLE)), 6)
        |  END AS rho
        |FROM g""".stripMargin,

    // Benford first-digit screen: leading digit of the exact
    // milli-unit BIGINT rendered as a string, micro-snapped
    // log10(1+1/d) expectations
    "q230_benford" ->
      """WITH v AS (SELECT (round(value * 1000.0))::BIGINT AS vm
        |  FROM events WHERE event_type = 'purchase'),
        |o AS (SELECT (substr(vm::VARCHAR, 1, 1))::INTEGER AS digit,
        |    count(*)::BIGINT AS n_obs
        |  FROM v WHERE vm > 0 GROUP BY 1),
        |n AS (SELECT sum(n_obs)::BIGINT AS n FROM o)
        |SELECT digit, n_obs,
        |  (round(n_obs::DOUBLE * 1000000.0 / n.n::DOUBLE))::BIGINT
        |    AS obs_share_micro,
        |  (round(log10(1.0 + 1.0 / digit::DOUBLE) * 1000000.0))
        |    ::BIGINT AS exp_share_micro,
        |  (round(n_obs::DOUBLE * 1000000.0 / n.n::DOUBLE))::BIGINT
        |    - (round(log10(1.0 + 1.0 / digit::DOUBLE) * 1000000.0))
        |      ::BIGINT AS dev_micro
        |FROM o, n""".stripMargin,

    // FK orphan audit: per edge, a key-only left join against the
    // distinct parent keys, folded to one counter row
    "q231_fk_audit" -> {
      def edge(name: String, childTable: String, childKey: String,
          parentSel: String): String =
        s"""SELECT '$name' AS edge, n_child, n_null_key, n_orphan,
           |  CASE WHEN n_child - n_null_key = 0 THEN NULL
           |    ELSE round(n_orphan::DOUBLE /
           |      (n_child - n_null_key)::DOUBLE, 6) END AS orphan_rate
           |FROM (SELECT count(*)::BIGINT AS n_child,
           |    sum(CASE WHEN c.k IS NULL THEN 1 ELSE 0 END)::BIGINT
           |      AS n_null_key,
           |    sum(CASE WHEN c.k IS NOT NULL AND p.p IS NULL
           |      THEN 1 ELSE 0 END)::BIGINT AS n_orphan
           |  FROM (SELECT $childKey AS k FROM $childTable) c
           |  LEFT JOIN (SELECT DISTINCT p FROM ($parentSel)
           |             WHERE p IS NOT NULL) p
           |    ON c.k = p.p)""".stripMargin
      Seq(
        edge("lineitem->orders", "lineitem", "l_orderkey",
          "SELECT o_orderkey AS p FROM orders"),
        edge("lineitem->part", "lineitem", "l_partkey",
          "SELECT p_partkey AS p FROM part"),
        edge("orders->customer", "orders", "o_custkey",
          "SELECT c_custkey AS p FROM customer"),
        edge("orders->customer_active", "orders", "o_custkey",
          "SELECT c_custkey AS p FROM customer WHERE c_acctbal > 0"))
        .mkString("\nUNION ALL\n")
    },

    // SCD2 history: change flags via lag over (ts, event_id) within
    // the user, prefix-sum version ids, valid_to from version N+1
    "q232_scd2_history" ->
      """WITH e AS (SELECT user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS tse,
        |    event_id AS tie, event_type AS attr FROM events),
        |f AS (SELECT *, CASE WHEN lag(attr) OVER
        |      (PARTITION BY user_id ORDER BY tse, tie)
        |      IS NOT DISTINCT FROM attr THEN 0 ELSE 1 END AS chg
        |  FROM e),
        |v AS (SELECT *, (sum(chg) OVER (PARTITION BY user_id
        |      ORDER BY tse, tie ROWS UNBOUNDED PRECEDING))::BIGINT - 1
        |      AS version
        |  FROM f),
        |g AS (SELECT user_id, version,
        |    min(tse)::BIGINT AS valid_from, min(attr) AS attr,
        |    count(*)::BIGINT AS n_events
        |  FROM v GROUP BY 1, 2)
        |SELECT g.user_id, g.attr, g.valid_from,
        |  nx.valid_from AS valid_to,
        |  nx.valid_from IS NULL AS is_current,
        |  g.version, g.n_events
        |FROM g LEFT JOIN g nx
        |  ON g.user_id = nx.user_id AND nx.version = g.version + 1"""
        .stripMargin,

    // Snapshot diff vs the deterministic synthetic v2: one full outer
    // join, counters unpivoted from a single aggregated row
    "q233_snapshot_diff" ->
      """WITH o AS (SELECT o_orderkey, o_custkey, o_orderstatus,
        |    o_orderpriority FROM orders),
        |v2 AS (SELECT o_orderkey, o_custkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 13 = 0 THEN 'X-RUSH'
        |      ELSE o_orderpriority END AS o_orderpriority
        |  FROM o WHERE o_orderkey % 97 <> 0
        |  UNION ALL
        |  SELECT -o_orderkey, o_custkey, o_orderstatus,
        |    o_orderpriority FROM o WHERE o_orderkey % 101 = 0),
        |j AS (SELECT o.o_orderkey AS ok, v2.o_orderkey AS nk,
        |    o.o_custkey AS oc, v2.o_custkey AS nc,
        |    o.o_orderstatus AS os, v2.o_orderstatus AS ns,
        |    o.o_orderpriority AS op, v2.o_orderpriority AS np
        |  FROM o FULL OUTER JOIN v2 ON o.o_orderkey = v2.o_orderkey),
        |c AS (SELECT
        |    sum(CASE WHEN ok IS NULL THEN 1 ELSE 0 END)::BIGINT
        |      AS added,
        |    sum(CASE WHEN nk IS NULL THEN 1 ELSE 0 END)::BIGINT
        |      AS removed,
        |    sum(CASE WHEN ok IS NOT NULL AND nk IS NOT NULL
        |      AND (oc IS DISTINCT FROM nc OR os IS DISTINCT FROM ns
        |        OR op IS DISTINCT FROM np) THEN 1 ELSE 0 END)::BIGINT
        |      AS changed,
        |    sum(CASE WHEN ok IS NOT NULL AND nk IS NOT NULL
        |      AND oc IS NOT DISTINCT FROM nc
        |      AND os IS NOT DISTINCT FROM ns
        |      AND op IS NOT DISTINCT FROM np THEN 1 ELSE 0 END)::BIGINT
        |      AS unchanged,
        |    sum(CASE WHEN ok IS NOT NULL AND nk IS NOT NULL
        |      AND oc IS DISTINCT FROM nc THEN 1 ELSE 0 END)::BIGINT
        |      AS c_custkey,
        |    sum(CASE WHEN ok IS NOT NULL AND nk IS NOT NULL
        |      AND os IS DISTINCT FROM ns THEN 1 ELSE 0 END)::BIGINT
        |      AS c_status,
        |    sum(CASE WHEN ok IS NOT NULL AND nk IS NOT NULL
        |      AND op IS DISTINCT FROM np THEN 1 ELSE 0 END)::BIGINT
        |      AS c_priority
        |  FROM j)
        |SELECT 'added' AS metric, added AS n FROM c
        |UNION ALL SELECT 'removed', removed FROM c
        |UNION ALL SELECT 'changed', changed FROM c
        |UNION ALL SELECT 'unchanged', unchanged FROM c
        |UNION ALL SELECT 'changed:o_custkey', c_custkey FROM c
        |UNION ALL SELECT 'changed:o_orderstatus', c_status FROM c
        |UNION ALL SELECT 'changed:o_orderpriority', c_priority FROM c"""
        .stripMargin,

    // Per-source ROC-AUC via Mann-Whitney rank sums: doubled
    // average-tie ranks from prefix sums over the distinct-score
    // table (no join back to rows)
    "q234_roc_auc" ->
      """WITH b AS (SELECT source, n_chars::BIGINT AS s,
        |    (CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS y
        |  FROM documents),
        |ps AS (SELECT source, s, count(*)::BIGINT AS cnt,
        |    sum(y)::BIGINT AS np
        |  FROM b GROUP BY 1, 2),
        |r AS (SELECT source, s, cnt, np,
        |    (2 * (sum(cnt) OVER (PARTITION BY source ORDER BY s) - cnt)
        |      + cnt + 1)::BIGINT AS r2
        |  FROM ps),
        |g AS (SELECT source, sum(cnt)::BIGINT AS n_rows,
        |    sum(np)::BIGINT AS n_pos, sum(np * r2)::BIGINT AS sr
        |  FROM r GROUP BY 1)
        |SELECT source, n_rows, n_pos, (n_rows - n_pos)::BIGINT AS n_neg,
        |  CASE WHEN n_pos = 0 OR n_rows - n_pos = 0 THEN NULL
        |    ELSE round((sr - n_pos * (n_pos + 1))::DOUBLE /
        |      (2 * n_pos * (n_rows - n_pos))::DOUBLE, 6) END AS auc
        |FROM g""".stripMargin,

    // Cohen's kappa between the q53 language-ID prediction and the
    // labeled language: contingency cells feed diagonal, margins, N
    "q235_cohen_kappa" -> {
      val profs = graft.SparkEntry.gateLangProfiles.toSeq.sortBy(_._1)
      def scoreExpr(p: Map[String, Double]): String = {
        val cases = p.toSeq.sorted
          .map { case (g, w) => s"WHEN '$g' THEN $w" }.mkString(" ")
        s"""coalesce(list_sum(list_transform(grams,
           |  g -> CAST(CASE g $cases ELSE 0.0 END AS DOUBLE))), 0.0)"""
          .stripMargin
      }
      val scoreCols = profs
        .map { case (l, p) => s"${scoreExpr(p)} AS s_$l" }.mkString(",\n  ")
      val best = profs.map { case (l, _) => s"s_$l" }
        .mkString("greatest(", ", ", ")")
      val chain = profs
        .map { case (l, _) => s"WHEN s_$l > 0 AND s_$l = $best THEN '$l'" }
        .mkString(" ")
      s"""WITH g AS (SELECT lang,
         |        list_transform(range(1, len(lower(text)) - 1),
         |          i -> substr(lower(text), i, 3)) AS grams
         |      FROM documents),
         |s AS (SELECT lang,
         |  $scoreCols
         |FROM g),
         |p AS (SELECT CASE $chain ELSE 'und' END AS a, lang AS b FROM s),
         |cells AS (SELECT a, b, count(*)::BIGINT AS n FROM p
         |  GROUP BY 1, 2),
         |nn AS (SELECT sum(n)::BIGINT AS n_items,
         |    sum(CASE WHEN a IS NOT DISTINCT FROM b THEN n ELSE 0 END)
         |      ::BIGINT AS n_agree
         |  FROM cells),
         |ma AS (SELECT a, sum(n)::BIGINT AS na FROM cells GROUP BY 1),
         |mb AS (SELECT b, sum(n)::BIGINT AS nb FROM cells GROUP BY 1),
         |pe AS (SELECT sum(na * nb)::BIGINT AS pen
         |  FROM ma JOIN mb ON ma.a IS NOT DISTINCT FROM mb.b),
         |m AS (SELECT n_items, n_agree,
         |    (round(n_agree::DOUBLE * 1000000.0 / n_items::DOUBLE))
         |      ::BIGINT AS po_micro,
         |    (round(pen::DOUBLE * 1000000.0 /
         |      (n_items * n_items)::DOUBLE))::BIGINT AS pe_micro
         |  FROM nn, pe)
         |SELECT n_items, n_agree, po_micro, pe_micro,
         |  CASE WHEN pe_micro = 1000000 THEN NULL
         |    ELSE round((po_micro - pe_micro)::DOUBLE /
         |      (1000000 - pe_micro)::DOUBLE, 6) END AS kappa
         |FROM m""".stripMargin
    },

    // Daily OHLC purchase bars: open/close via struct min/max on
    // (epoch, event_id), values in exact cents, VWAP micro-snapped
    "q236_ohlc_bars" ->
      """WITH v AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) AS tse,
        |    event_id AS tie, (round(value * 100.0))::BIGINT AS vm
        |  FROM events WHERE event_type = 'purchase'),
        |b AS (SELECT tse // 86400 AS bucket, tse, tie, vm FROM v)
        |SELECT bucket,
        |  (min(struct_pack(t := tse, e := tie, v := vm))).v AS open,
        |  max(vm) AS high, min(vm) AS low,
        |  (max(struct_pack(t := tse, e := tie, v := vm))).v AS close,
        |  count(*)::BIGINT AS volume, sum(vm)::BIGINT AS turnover,
        |  (round(sum(vm)::DOUBLE * 1000000.0 / count(*)::DOUBLE))
        |    ::BIGINT AS vwap_micro
        |FROM b GROUP BY 1""".stripMargin,

    // Order-free content fingerprint: XOR fold of 60-bit md5 row
    // hashes over the canonical \x01-joined row string
    "q237_dataset_fingerprint" ->
      """SELECT source, count(*)::BIGINT AS n_rows,
        |  bit_xor(('0x' || substr(md5(
        |    doc_id::VARCHAR || chr(1) || text || chr(1) || lang
        |      || chr(1) || n_chars::VARCHAR), 1, 15))::BIGINT)
        |    ::BIGINT AS fingerprint
        |FROM documents GROUP BY 1""".stripMargin,

    // Mann-Kendall trend: sign pairs from the bounded series
    // self-join, tie-corrected variance, continuity-corrected z
    "q238_trend_screen" ->
      """WITH s AS (SELECT event_type AS g,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
        |    count(*)::BIGINT AS v
        |  FROM events GROUP BY 1, 2),
        |pairs AS (SELECT a.g,
        |    sum(CASE WHEN b.v > a.v THEN 1 WHEN b.v < a.v THEN -1
        |      ELSE 0 END)::BIGINT AS s_stat
        |  FROM s a JOIN s b ON a.g = b.g AND a.day < b.day
        |  GROUP BY 1),
        |ties AS (SELECT g, sum(t)::BIGINT AS n,
        |    sum(t * (t - 1) * (2 * t + 5))::BIGINT AS tieterm
        |  FROM (SELECT g, v, count(*)::BIGINT AS t FROM s
        |        GROUP BY 1, 2) GROUP BY 1)
        |SELECT t.g AS event_type, t.n AS n_days,
        |  coalesce(p.s_stat, 0)::BIGINT AS s_stat,
        |  (t.n * (t.n - 1) * (2 * t.n + 5) - t.tieterm)::BIGINT
        |    AS var18,
        |  CASE WHEN t.n < 2
        |      OR t.n * (t.n - 1) * (2 * t.n + 5) - t.tieterm <= 0
        |    THEN NULL
        |    ELSE (round((CASE
        |        WHEN coalesce(p.s_stat, 0) > 0
        |          THEN (coalesce(p.s_stat, 0) - 1)::DOUBLE
        |        WHEN coalesce(p.s_stat, 0) < 0
        |          THEN (coalesce(p.s_stat, 0) + 1)::DOUBLE
        |        ELSE 0.0 END /
        |      sqrt((t.n * (t.n - 1) * (2 * t.n + 5) - t.tieterm)
        |        ::DOUBLE / 18.0)) * 1000000.0))::BIGINT END AS z_micro
        |FROM ties t LEFT JOIN pairs p ON t.g = p.g""".stripMargin,

    // CUSUM changepoint: exact integer cumulative deviations against
    // the micro-snapped mean; argmax |C| with earliest-day ties via
    // struct max
    "q239_changepoint" ->
      """WITH s AS (SELECT event_type AS g,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
        |    count(*)::BIGINT AS v
        |  FROM events GROUP BY 1, 2),
        |tot AS (SELECT g, count(*)::BIGINT AS n_days,
        |    (round(sum(v)::DOUBLE * 1000000.0 / count(*)::DOUBLE))
        |      ::BIGINT AS mean_micro
        |  FROM s GROUP BY 1),
        |dev AS (SELECT s.g, s.day, tot.n_days, tot.mean_micro,
        |    (sum(s.v * 1000000 - tot.mean_micro) OVER
        |      (PARTITION BY s.g ORDER BY s.day
        |       ROWS UNBOUNDED PRECEDING))::BIGINT AS c
        |  FROM s JOIN tot ON s.g = tot.g)
        |SELECT g AS event_type, min(n_days)::BIGINT AS n_days,
        |  min(mean_micro)::BIGINT AS mean_micro,
        |  (-(max(struct_pack(a := abs(c), nd := -day)).nd))::BIGINT
        |    AS cp_day,
        |  (max(struct_pack(a := abs(c), nd := -day)).a)::BIGINT
        |    AS max_dev_micro
        |FROM dev GROUP BY 1""".stripMargin,

    // Lag-1..3 autocorrelation: centered exact-micro series, lagged
    // equi self-joins, one division per lag
    // moment products in HUGEINT — mirrors the Spark side's
    // decimal(38,0) x·x sums (a BIGINT product overflows once a day
    // deviates ~3e9 micro-units from the group mean)
    "q240_autocorr" -> {
      def lagSel(k: Int): String =
        s"""SELECT c1.g, $k AS lag, count(*)::BIGINT AS n_pairs,
           |    sum(c1.x::HUGEINT * c2.x) AS num
           |  FROM c c1 JOIN c c2
           |    ON c1.g = c2.g AND c2.day = c1.day + $k
           |  GROUP BY 1""".stripMargin
      s"""WITH s AS (SELECT event_type AS g,
         |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         |    count(*)::BIGINT AS v
         |  FROM events GROUP BY 1, 2),
         |m AS (SELECT g, (round(sum(v)::DOUBLE * 1000000.0 /
         |    count(*)::DOUBLE))::BIGINT AS mm
         |  FROM s GROUP BY 1),
         |c AS (SELECT s.g, s.day, (s.v * 1000000 - m.mm)::BIGINT AS x
         |  FROM s JOIN m ON s.g = m.g),
         |d AS (SELECT g, sum(x::HUGEINT * x) AS den FROM c GROUP BY 1),
         |l AS (${(1 to 3).map(lagSel).mkString("\nUNION ALL\n")})
         |SELECT l.g AS event_type, l.lag, l.n_pairs,
         |  CASE WHEN d.den = 0 THEN NULL
         |    ELSE round(l.num::DOUBLE / d.den::DOUBLE, 6) END AS acf
         |FROM l JOIN d ON l.g = d.g""".stripMargin
    },

    // Kaplan-Meier: per-user lifetimes censored at the horizon,
    // at-risk suffix counts, micro-snapped log-survival prefix sums,
    // one exp at the end
    "q241_kaplan_meier" ->
      """WITH d AS (SELECT user_id AS u,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS dd
        |  FROM events),
        |us AS (SELECT u, min(dd) AS f, max(dd) AS l FROM d GROUP BY 1),
        |h AS (SELECT max(l) AS h FROM us),
        |lt AS (SELECT (us.l - us.f + 1)::BIGINT AS t_day,
        |    (CASE WHEN us.l = h.h THEN 1 ELSE 0 END)::BIGINT AS cens
        |  FROM us, h),
        |pt AS (SELECT t_day, count(*)::BIGINT AS ends,
        |    sum(cens)::BIGINT AS n_censored,
        |    (count(*) - sum(cens))::BIGINT AS n_churned
        |  FROM lt GROUP BY 1),
        |tot AS (SELECT sum(ends)::BIGINT AS n FROM pt),
        |ar AS (SELECT pt.*, (tot.n - coalesce(sum(ends) OVER
        |      (ORDER BY t_day ROWS BETWEEN UNBOUNDED PRECEDING
        |       AND 1 PRECEDING), 0))::BIGINT AS n_at_risk
        |  FROM pt, tot),
        |st AS (SELECT *, CASE WHEN n_churned = n_at_risk THEN NULL
        |    ELSE (round(ln(1.0 - n_churned::DOUBLE /
        |      n_at_risk::DOUBLE) * 1000000.0))::BIGINT END AS lnstep
        |  FROM ar),
        |fin AS (SELECT *,
        |    (sum(lnstep) OVER (ORDER BY t_day
        |      ROWS UNBOUNDED PRECEDING))::BIGINT AS lnsum,
        |    max(CASE WHEN lnstep IS NULL THEN 1 ELSE 0 END) OVER
        |      (ORDER BY t_day ROWS UNBOUNDED PRECEDING) AS dead
        |  FROM st)
        |SELECT t_day, n_at_risk, n_churned, n_censored,
        |  CASE WHEN dead = 1 THEN 0.0
        |    ELSE round(exp(lnsum::DOUBLE / 1000000.0), 6)
        |  END AS survival
        |FROM fin""".stripMargin,

    // Incremental agg maintenance: the oracle is the FULL recompute —
    // identical output proves the history+delta state merge loses
    // nothing (counts/sums add, min/max fold, union KMV = distinct
    // k-smallest of all hashes)
    "q242_incremental_agg" ->
      """WITH e AS (SELECT event_type AS g,
        |    (round(value * 100.0))::BIGINT AS v, user_id
        |  FROM events),
        |agg AS (SELECT g, count(*)::BIGINT AS n_rows,
        |    sum(v)::BIGINT AS sum_v, min(v)::BIGINT AS min_v,
        |    max(v)::BIGINT AS max_v
        |  FROM e GROUP BY 1),
        |h AS (SELECT DISTINCT g,
        |    (('0x' || substr(md5(user_id::VARCHAR), 1, 8))
        |      ::UBIGINT)::BIGINT AS hv
        |  FROM e),
        |r AS (SELECT g, hv,
        |    row_number() OVER (PARTITION BY g ORDER BY hv) AS rn
        |  FROM h),
        |kk AS (SELECT g, count(*)::BIGINT AS k_actual, max(hv) AS kth,
        |    CASE WHEN count(*) < 128 THEN count(*)::DOUBLE
        |      ELSE round((127.0 * 4294967296.0) / max(hv), 6) END
        |      AS est_distinct
        |  FROM r WHERE rn <= 128 GROUP BY 1)
        |SELECT agg.g AS event_type, n_rows, sum_v, min_v, max_v,
        |  (round(sum_v::DOUBLE * 1000000.0 / n_rows::DOUBLE))::BIGINT
        |    AS mean_micro,
        |  kk.k_actual, kk.kth, kk.est_distinct
        |FROM agg JOIN kk ON agg.g = kk.g""".stripMargin,

    // Blocklist screen: per-term strpos presence sums + the
    // first-by-(position, term index) rule — position ORDER is
    // engine-independent even where absolute offsets differ
    "q243_blocklist" -> {
      val terms = graft.SparkEntry.gateBlocklist
      def q(t: String) = t.replace("'", "''")
      val presence = terms
        .map(t => s"CASE WHEN strpos(text, '${q(t)}') > 0 " +
          "THEN 1 ELSE 0 END")
        .mkString("(", " +\n    ", ")::INTEGER")
      val structs = terms.zipWithIndex
        .map { case (t, i) =>
          s"struct_pack(p := strpos(text, '${q(t)}'), i := $i)" }
        .mkString("[", ",\n      ", "]")
      val caseArms = terms.zipWithIndex
        .map { case (t, i) => s"WHEN $i THEN '${q(t)}'" }
        .mkString(" ")
      s"""SELECT doc_id,
         |  $presence AS n_matched,
         |  CASE (list_sort(list_filter(
         |      $structs,
         |      x -> x.p > 0)))[1].i
         |    $caseArms ELSE NULL END AS first_term
         |FROM documents""".stripMargin
    },

    // Streaming agg-state replay: the oracle is q242's full
    // recompute — identical output proves the bucketed incremental
    // state (including the replayed batch's no-op) loses nothing
    "q244_streaming_agg_replay" ->
      """WITH e AS (SELECT event_type AS g,
        |    (round(value * 100.0))::BIGINT AS v, user_id
        |  FROM events),
        |agg AS (SELECT g, count(*)::BIGINT AS n_rows,
        |    sum(v)::BIGINT AS sum_v, min(v)::BIGINT AS min_v,
        |    max(v)::BIGINT AS max_v
        |  FROM e GROUP BY 1),
        |h AS (SELECT DISTINCT g,
        |    (('0x' || substr(md5(user_id::VARCHAR), 1, 8))
        |      ::UBIGINT)::BIGINT AS hv
        |  FROM e),
        |r AS (SELECT g, hv,
        |    row_number() OVER (PARTITION BY g ORDER BY hv) AS rn
        |  FROM h),
        |kk AS (SELECT g, count(*)::BIGINT AS k_actual, max(hv) AS kth,
        |    CASE WHEN count(*) < 128 THEN count(*)::DOUBLE
        |      ELSE round((127.0 * 4294967296.0) / max(hv), 6) END
        |      AS est_distinct
        |  FROM r WHERE rn <= 128 GROUP BY 1)
        |SELECT agg.g AS event_type, n_rows, sum_v, min_v, max_v,
        |  (round(sum_v::DOUBLE * 1000000.0 / n_rows::DOUBLE))::BIGINT
        |    AS mean_micro,
        |  kk.k_actual, kk.kth, kk.est_distinct
        |FROM agg JOIN kk ON agg.g = kk.g""".stripMargin,

    // Welch t-test: six exact integer moments, then the identical
    // IEEE chain for means, variances, t and the Satterthwaite df
    "q245_welch_ttest" ->
      """WITH d AS (SELECT (user_id % 2 = 1) AS a,
        |    (round(value * 100.0))::BIGINT AS v
        |  FROM events WHERE event_type = 'purchase'),
        |m AS (SELECT
        |    sum(CASE WHEN a THEN 1 ELSE 0 END)::BIGINT AS n_a,
        |    sum(CASE WHEN a THEN v ELSE 0 END)::BIGINT AS s_a,
        |    sum(CASE WHEN a THEN v::HUGEINT * v ELSE 0 END) AS q_a,
        |    sum(CASE WHEN NOT a THEN 1 ELSE 0 END)::BIGINT AS n_b,
        |    sum(CASE WHEN NOT a THEN v ELSE 0 END)::BIGINT AS s_b,
        |    sum(CASE WHEN NOT a THEN v::HUGEINT * v ELSE 0 END) AS q_b
        |  FROM d),
        |x AS (SELECT *,
        |    (n_a::DOUBLE * q_a::DOUBLE - s_a::DOUBLE * s_a::DOUBLE)
        |      / (n_a::DOUBLE * (n_a - 1)::DOUBLE) / n_a::DOUBLE AS sa,
        |    (n_b::DOUBLE * q_b::DOUBLE - s_b::DOUBLE * s_b::DOUBLE)
        |      / (n_b::DOUBLE * (n_b - 1)::DOUBLE) / n_b::DOUBLE AS sb
        |  FROM m)
        |SELECT n_a, n_b,
        |  (round(s_a::DOUBLE / n_a::DOUBLE * 1000000.0))::BIGINT
        |    AS mean_a_micro,
        |  (round(s_b::DOUBLE / n_b::DOUBLE * 1000000.0))::BIGINT
        |    AS mean_b_micro,
        |  CASE WHEN n_a < 2 OR n_b < 2 OR sa + sb <= 0 THEN NULL
        |    ELSE (round((s_a::DOUBLE / n_a::DOUBLE
        |        - s_b::DOUBLE / n_b::DOUBLE)
        |      / sqrt(sa + sb) * 1000000.0))::BIGINT END AS t_micro,
        |  CASE WHEN n_a < 2 OR n_b < 2 OR sa + sb <= 0 THEN NULL
        |    ELSE (round((sa + sb) * (sa + sb)
        |      / (sa * sa / (n_a - 1)::DOUBLE
        |        + sb * sb / (n_b - 1)::DOUBLE) * 1000000.0))::BIGINT
        |  END AS df_micro
        |FROM x""".stripMargin,

    // Theil-Sen: median of micro-snapped pairwise slopes off the
    // bounded series self-join (q238's pair grid)
    "q246_theil_sen" ->
      """WITH s AS (SELECT event_type AS g,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
        |    count(*)::BIGINT AS v
        |  FROM events GROUP BY 1, 2),
        |p AS (SELECT a.g,
        |    (round((b.v - a.v)::DOUBLE * 1000000.0 /
        |      (b.day - a.day)::DOUBLE))::BIGINT AS sl
        |  FROM s a JOIN s b ON a.g = b.g AND a.day < b.day),
        |g AS (SELECT g, count(*)::BIGINT AS n_pairs,
        |    list_sort(list(sl)) AS arr
        |  FROM p GROUP BY 1)
        |SELECT g AS event_type, n_pairs,
        |  CASE WHEN n_pairs = 0 THEN NULL
        |    ELSE (round((arr[((n_pairs + 1) // 2)::INTEGER]
        |      + arr[(n_pairs // 2 + 1)::INTEGER])::DOUBLE / 2.0))
        |      ::BIGINT END AS slope_micro
        |FROM g""".stripMargin,

    // CDC apply: the oracle builds the TARGET snapshot directly —
    // apply(base, changes) must reproduce it row for row. An insert
    // whose key is ALSO tombstoned at an equal-or-newer version is
    // dropped (tombstone-wins MERGE convention — key 0 hits this: its
    // delete (0%97=0) and insert (-0=0, 0%101=0) carry the same
    // version, and the delete must win)
    "q247_cdc_apply" ->
      """WITH o AS (SELECT o_orderkey, o_custkey, o_orderstatus,
        |    o_orderpriority, o_orderdate FROM orders)
        |SELECT o_orderkey, o_custkey, o_orderstatus,
        |  CASE WHEN o_orderkey % 13 = 0 THEN 'X-RUSH'
        |    ELSE o_orderpriority END AS o_orderpriority,
        |  o_orderdate
        |FROM o WHERE o_orderkey % 97 <> 0
        |UNION ALL
        |SELECT -o_orderkey, o_custkey, o_orderstatus,
        |  o_orderpriority, o_orderdate
        |FROM o WHERE o_orderkey % 101 = 0
        |  AND NOT EXISTS (SELECT 1 FROM o d
        |    WHERE d.o_orderkey % 97 = 0 AND d.o_orderkey = -o.o_orderkey
        |      AND d.o_orderdate >= o.o_orderdate)""".stripMargin,

    "q251_containment" -> q251,

    // STL-lite decomposition: 7-day centered RANGE-window trend
    // (incomplete windows NULL), day-of-week means of the detrended
    // series, integer residuals — all micro-exact
    "q252_stl_decompose" ->
      """WITH s AS (SELECT event_type AS g,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
        |    count(*)::BIGINT AS v
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT g, day, v,
        |    count(*) OVER w AS wn, sum(v) OVER w AS ws
        |  FROM s WINDOW w AS (PARTITION BY g ORDER BY day
        |    RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |d AS (SELECT g, day, v,
        |    CASE WHEN wn = 7
        |      THEN (round(ws::DOUBLE * 1000000.0 / 7.0))::BIGINT
        |    END AS trend_micro,
        |    day % 7 AS dow
        |  FROM t),
        |dd AS (SELECT *, v * 1000000 - trend_micro AS det FROM d),
        |se AS (SELECT g, dow,
        |    (round(sum(det)::DOUBLE / count(*)::DOUBLE))::BIGINT
        |      AS seasonal_micro
        |  FROM dd WHERE det IS NOT NULL GROUP BY 1, 2)
        |SELECT dd.g AS event_type, dd.day, dd.v, dd.trend_micro,
        |  CASE WHEN dd.trend_micro IS NOT NULL
        |    THEN se.seasonal_micro END AS seasonal_micro,
        |  (dd.det - se.seasonal_micro)::BIGINT AS resid_micro
        |FROM dd LEFT JOIN se ON se.g = dd.g AND se.dow = dd.dow""".stripMargin,

    // Neyman allocation: exact-integer moments (HUGEINT v²), one
    // micro-snapped integer weight per stratum (exact total), floor +
    // largest-remainder over the |strata| rows, capped at N_h, then
    // the q39 seeded md5-rank take inside each stratum
    "q253_neyman_sample" ->
      """WITH m AS (SELECT lang, doc_id, n_chars::BIGINT AS v
        |  FROM documents),
        |mom AS (SELECT lang, count(*)::BIGINT AS nh, sum(v)::BIGINT AS s,
        |    sum(v::HUGEINT * v) AS q
        |  FROM m GROUP BY 1),
        |wts AS (SELECT lang, nh,
        |    (round(nh::DOUBLE * sqrt(CASE WHEN nh < 2 THEN 0.0 ELSE
        |      (nh::DOUBLE * q::DOUBLE - s::DOUBLE * s::DOUBLE) /
        |      (nh::DOUBLE * (nh - 1)::DOUBLE) END) * 1000000.0))::BIGINT
        |      AS wm
        |  FROM mom),
        |tot AS (SELECT sum(wm)::BIGINT AS tw, sum(nh)::BIGINT AS tn
        |  FROM wts),
        |a0 AS (SELECT lang, nh,
        |    60.0 * (CASE WHEN tot.tw > 0
        |      THEN wm::DOUBLE / tot.tw::DOUBLE
        |      ELSE nh::DOUBLE / tot.tn::DOUBLE END) AS raw
        |  FROM wts, tot),
        |a1 AS (SELECT lang, nh, floor(raw)::BIGINT AS base,
        |    round(raw - floor(raw), 6) AS frac FROM a0),
        |ba AS (SELECT sum(base)::BIGINT AS ba FROM a1),
        |al AS (SELECT lang, least(base + (CASE WHEN
        |      row_number() OVER (ORDER BY frac DESC, lang) <= 60 - ba.ba
        |      THEN 1 ELSE 0 END), nh)::BIGINT AS n_h
        |  FROM a1, ba),
        |r AS (SELECT lang, doc_id,
        |    md5(doc_id::VARCHAR || ':' || '42') AS h FROM m),
        |w AS (SELECT lang, doc_id, row_number() OVER
        |    (PARTITION BY lang ORDER BY h, doc_id) AS rn FROM r)
        |SELECT w.lang, w.doc_id, al.n_h
        |FROM w JOIN al USING (lang) WHERE w.rn <= al.n_h""".stripMargin,

    // Fellegi-Sunter linkage weights: the q204 registry + blocking
    // join with truth labels; per-field add-one-smoothed m/u and the
    // micro-nat ln evidence weights (identical rational + ln chains)
    "q255_fellegi_sunter" -> {
      val fields = Seq(
        ("name_exact", "a.name = b.name"),
        ("name_tail", "substr(a.name, 7, 6) = substr(b.name, 7, 6)"),
        ("nation", "a.nation = b.nation"))
      val agrees = fields.zipWithIndex.map { case (_, i) =>
        s"""sum(CASE WHEN mt AND f$i THEN 1 ELSE 0 END)::BIGINT AS am$i,
           |    sum(CASE WHEN NOT mt AND f$i THEN 1 ELSE 0 END)::BIGINT
           |      AS au$i""".stripMargin
      }.mkString(",\n    ")
      val flags = fields.zipWithIndex.map { case ((_, fieldExpr), i) =>
        s"($fieldExpr) AS f$i" }.mkString(",\n         ")
      val sels = fields.zipWithIndex.map { case ((nm, _), i) =>
        s"""SELECT '$nm' AS field, n_m AS n_match, n_u AS n_unmatch,
           |  (round((am$i + 1)::DOUBLE / (n_m + 2)::DOUBLE * 1000000.0))
           |    ::BIGINT AS m_micro,
           |  (round((au$i + 1)::DOUBLE / (n_u + 2)::DOUBLE * 1000000.0))
           |    ::BIGINT AS u_micro,
           |  (round((ln((am$i + 1)::DOUBLE / (n_m + 2)::DOUBLE) -
           |    ln((au$i + 1)::DOUBLE / (n_u + 2)::DOUBLE)) * 1000000.0))
           |    ::BIGINT AS w_agree_micro,
           |  (round((ln(1.0 - (am$i + 1)::DOUBLE / (n_m + 2)::DOUBLE) -
           |    ln(1.0 - (au$i + 1)::DOUBLE / (n_u + 2)::DOUBLE))
           |    * 1000000.0))::BIGINT AS w_disagree_micro
           |FROM mom""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH recs AS (
         |  SELECT c_custkey * 2 AS rec_id,
         |    substr(md5(c_custkey::VARCHAR), 1, 12) AS name,
         |    c_nationkey::BIGINT AS nation, c_custkey AS ck
         |  FROM customer
         |  UNION ALL
         |  SELECT c_custkey * 2 + 1,
         |    substr(nm, 1, p - 1) || 'z' || substr(nm, p + 1, 12),
         |    (CASE WHEN c_custkey % 3 = 0 THEN (c_nationkey + 1) % 25
         |          ELSE c_nationkey END)::BIGINT,
         |    c_custkey
         |  FROM (SELECT c_custkey, c_nationkey,
         |          substr(md5(c_custkey::VARCHAR), 1, 12) AS nm,
         |          (c_custkey % 12 + 1)::INTEGER AS p
         |        FROM customer WHERE c_custkey % 7 = 0)),
         |pr AS (SELECT (a.ck = b.ck) AS mt,
         |         $flags
         |       FROM recs a JOIN recs b
         |         ON substr(a.name, 1, 6) = substr(b.name, 1, 6)
         |        AND a.rec_id < b.rec_id),
         |mom AS (SELECT
         |    sum(CASE WHEN mt THEN 1 ELSE 0 END)::BIGINT AS n_m,
         |    sum(CASE WHEN NOT mt THEN 1 ELSE 0 END)::BIGINT AS n_u,
         |    $agrees
         |  FROM pr)
         |$sels""".stripMargin
    },

    // Krippendorff's alpha: per-item micro-snapped disagreement
    // contributions, integer coincidence marginals, one fixed double
    // chain for De and the final alpha division
    "q256_krippendorff_alpha" ->
      """WITH iv AS (SELECT user_id AS i, event_type AS v,
        |    count(*)::BIGINT AS c
        |  FROM events WHERE user_id IS NOT NULL
        |    AND event_type IS NOT NULL GROUP BY 1, 2),
        |pi AS (SELECT i, sum(c)::BIGINT AS m,
        |    sum(c * c)::BIGINT AS s2
        |  FROM iv GROUP BY 1 HAVING sum(c) >= 2),
        |ds AS (SELECT count(*)::BIGINT AS n_items,
        |    sum(m)::BIGINT AS n_ratings,
        |    sum((round((m * m - s2)::DOUBLE * 1000000.0 /
        |      (m - 1)::DOUBLE))::BIGINT)::BIGINT AS dsum
        |  FROM pi),
        |mg AS (SELECT sum(nc * nc)::BIGINT AS sc2 FROM (
        |    SELECT iv.v, sum(iv.c)::BIGINT AS nc
        |    FROM iv JOIN pi USING (i) GROUP BY 1)),
        |fin AS (SELECT n_items, n_ratings,
        |    (round(dsum::DOUBLE / n_ratings::DOUBLE))::BIGINT
        |      AS do_micro,
        |    (round((n_ratings::DOUBLE * n_ratings::DOUBLE
        |        - sc2::DOUBLE) /
        |      (n_ratings::DOUBLE * (n_ratings - 1)::DOUBLE)
        |      * 1000000.0))::BIGINT AS de_micro
        |  FROM ds, mg)
        |SELECT n_items, n_ratings, do_micro, de_micro,
        |  CASE WHEN de_micro = 0 THEN NULL
        |    ELSE (round((1.0 - do_micro::DOUBLE / de_micro::DOUBLE)
        |      * 1000000.0))::BIGINT END AS alpha_micro
        |FROM fin""".stripMargin,

    // Nelson-Aalen: q241's lifetime/at-risk CTEs with the hazard fold
    // (per-step d/n micro-snap, integer cumulative sum)
    "q257_nelson_aalen" ->
      """WITH d AS (SELECT user_id AS u,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS dd
        |  FROM events),
        |us AS (SELECT u, min(dd) AS f, max(dd) AS l FROM d GROUP BY 1),
        |h AS (SELECT max(l) AS h FROM us),
        |lt AS (SELECT (us.l - us.f + 1)::BIGINT AS t_day,
        |    (CASE WHEN us.l = h.h THEN 1 ELSE 0 END)::BIGINT AS cens
        |  FROM us, h),
        |pt AS (SELECT t_day, count(*)::BIGINT AS ends,
        |    sum(cens)::BIGINT AS n_censored,
        |    (count(*) - sum(cens))::BIGINT AS n_churned
        |  FROM lt GROUP BY 1),
        |tot AS (SELECT sum(ends)::BIGINT AS n FROM pt),
        |ar AS (SELECT pt.*, (tot.n - coalesce(sum(ends) OVER
        |      (ORDER BY t_day ROWS BETWEEN UNBOUNDED PRECEDING
        |       AND 1 PRECEDING), 0))::BIGINT AS n_at_risk
        |  FROM pt, tot)
        |SELECT t_day, n_at_risk, n_churned, n_censored,
        |  (sum((round(n_churned::DOUBLE * 1000000.0 /
        |    n_at_risk::DOUBLE))::BIGINT) OVER
        |    (ORDER BY t_day ROWS UNBOUNDED PRECEDING))::BIGINT
        |    AS cumhaz_micro
        |FROM ar""".stripMargin,

    // seasonal-naive backtest: equi self-join on (group, day+7),
    // per-day micro-snapped AE/sMAPE terms, exact-integer means
    "q258_seasonal_naive" ->
      """WITH s AS (SELECT event_type AS g,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
        |    count(*)::BIGINT AS v
        |  FROM events GROUP BY 1, 2),
        |p AS (SELECT a.g, abs(a.v - b.v)::BIGINT AS ae,
        |    CASE WHEN abs(a.v) + abs(b.v) = 0 THEN 0
        |      ELSE (round(abs(a.v - b.v)::DOUBLE * 2000000.0 /
        |        (abs(a.v) + abs(b.v))::DOUBLE))::BIGINT
        |    END AS sm
        |  FROM s a JOIN s b ON a.g = b.g AND a.day = b.day + 7)
        |SELECT g AS event_type, count(*)::BIGINT AS n_pairs,
        |  (round(sum(ae)::DOUBLE * 1000000.0 / count(*)::DOUBLE))
        |    ::BIGINT AS mae_micro,
        |  (round(sum(sm)::DOUBLE / count(*)::DOUBLE))::BIGINT
        |    AS smape_micro
        |FROM p GROUP BY 1""".stripMargin,

    // BH-FDR over per-cohort chi-square drift: per-cell micro-snapped
    // χ² terms (order-free integer sums), the df=4 closed-form
    // survival p = exp(−h)(1+h) — the gate's 5 event types; a
    // different category count would fail loudly here — and exact
    // integer cross-multiplied BH comparisons
    "q259_bh_fdr" ->
      """WITH e AS (SELECT user_id % 20 AS cohort, event_type AS c
        |  FROM events WHERE event_type IS NOT NULL),
        |cells AS (SELECT cohort, c, count(*)::BIGINT AS o
        |  FROM e GROUP BY 1, 2),
        |g AS (SELECT cohort, sum(o)::BIGINT AS ng FROM cells
        |  GROUP BY 1),
        |cat AS (SELECT c, sum(o)::BIGINT AS nc FROM cells GROUP BY 1),
        |kk AS (SELECT count(*)::BIGINT AS k, sum(nc)::BIGINT AS n
        |  FROM cat),
        |grid AS (SELECT g.cohort, g.ng,
        |    coalesce(cells.o, 0)::BIGINT AS o,
        |    g.ng::DOUBLE * cat.nc::DOUBLE / kk.n::DOUBLE AS ex, kk.k
        |  FROM g CROSS JOIN cat CROSS JOIN kk
        |  LEFT JOIN cells ON cells.cohort = g.cohort
        |    AND cells.c = cat.c),
        |chi AS (SELECT cohort, min(ng)::BIGINT AS n,
        |    min(k)::BIGINT AS k,
        |    sum((round((o::DOUBLE - ex) * (o::DOUBLE - ex) / ex
        |      * 1000000.0))::BIGINT)::BIGINT AS chi2_micro
        |  FROM grid GROUP BY 1),
        |p AS (SELECT cohort, n, chi2_micro, (k - 1)::INTEGER AS df,
        |    (round(exp(-(chi2_micro::DOUBLE / 2000000.0)) *
        |      (1.0 + chi2_micro::DOUBLE / 2000000.0) * 1000000.0))
        |      ::BIGINT AS p_micro
        |  FROM chi),
        |r AS (SELECT *, row_number() OVER (ORDER BY p_micro, cohort)
        |    AS rk, count(*) OVER () AS m FROM p),
        |ks AS (SELECT coalesce(max(rk), 0) AS kstar FROM r
        |  WHERE p_micro * m <= rk * 100000)
        |SELECT cohort, n, chi2_micro, df, p_micro,
        |  rk::INTEGER AS rank, (rk <= ks.kstar) AS discovered
        |FROM r, ks""".stripMargin,

    // blocking-quality: the q204 registry + truth labels; per-key
    // candidate counts, Σ c(c−1)/2 truth pairs, fixed-ratio divisions
    "q260_blocking_quality" -> {
      def pass(label: String, keyExpr: String) =
        s"""SELECT '$label' AS strategy,
           |  (SELECT count(*) FROM recs a JOIN recs b
           |    ON $keyExpr AND a.rec_id < b.rec_id)::BIGINT
           |    AS n_candidates,
           |  tot.truth AS n_true_pairs,
           |  (SELECT count(*) FROM recs a JOIN recs b
           |    ON $keyExpr AND a.rec_id < b.rec_id
           |    WHERE a.ck = b.ck)::BIGINT AS n_covered,
           |  round(1.0 - (SELECT count(*) FROM recs a JOIN recs b
           |      ON $keyExpr AND a.rec_id < b.rec_id)::DOUBLE /
           |    (tot.n::DOUBLE * (tot.n - 1)::DOUBLE / 2.0), 6)
           |    AS reduction_ratio,
           |  round((SELECT count(*) FROM recs a JOIN recs b
           |      ON $keyExpr AND a.rec_id < b.rec_id
           |      WHERE a.ck = b.ck)::DOUBLE / tot.truth::DOUBLE, 6)
           |    AS completeness
           |FROM tot""".stripMargin
      s"""WITH recs AS (
         |  SELECT c_custkey * 2 AS rec_id,
         |    substr(md5(c_custkey::VARCHAR), 1, 12) AS name,
         |    c_custkey AS ck FROM customer
         |  UNION ALL
         |  SELECT c_custkey * 2 + 1,
         |    substr(nm, 1, p - 1) || 'z' || substr(nm, p + 1, 12),
         |    c_custkey
         |  FROM (SELECT c_custkey,
         |          substr(md5(c_custkey::VARCHAR), 1, 12) AS nm,
         |          (c_custkey % 12 + 1)::INTEGER AS p
         |        FROM customer WHERE c_custkey % 7 = 0)),
         |tot AS (SELECT sum(cnt)::BIGINT AS n,
         |    sum(cnt * (cnt - 1) // 2)::BIGINT AS truth
         |  FROM (SELECT ck, count(*)::BIGINT AS cnt FROM recs
         |        GROUP BY 1))
         |${pass("first_half",
          "substr(a.name, 1, 6) = substr(b.name, 1, 6)")}
         |UNION ALL
         |${pass("second_half",
          "substr(a.name, 7, 6) = substr(b.name, 7, 6)")}""".stripMargin
    },

    // Jaro-Winkler over the q204 first-half blocking candidates:
    // DuckDB's jaro_winkler_similarity implements the same published
    // algorithm and conventions as the native kernel (verified
    // < 1e-12 apart on 3,500 random pairs) — rounded scores match
    "q261_jaro_winkler" ->
      """WITH recs AS (
        |  SELECT c_custkey * 2 AS rec_id,
        |    substr(md5(c_custkey::VARCHAR), 1, 12) AS name
        |  FROM customer
        |  UNION ALL
        |  SELECT c_custkey * 2 + 1,
        |    substr(nm, 1, p - 1) || 'z' || substr(nm, p + 1, 12)
        |  FROM (SELECT c_custkey,
        |          substr(md5(c_custkey::VARCHAR), 1, 12) AS nm,
        |          (c_custkey % 12 + 1)::INTEGER AS p
        |        FROM customer WHERE c_custkey % 7 = 0))
        |SELECT a.rec_id AS id_a, b.rec_id AS id_b,
        |  round(jaro_winkler_similarity(a.name, b.name), 6) AS jw
        |FROM recs a JOIN recs b
        |  ON substr(a.name, 1, 6) = substr(b.name, 1, 6)
        | AND a.rec_id < b.rec_id""".stripMargin,

    // Fellegi-Sunter decisions: q255's weight chains folded into
    // per-pair exact micro-nat evidence sums and threshold cuts
    "q262_linkage_decisions" -> {
      val fields = Seq(
        ("name_exact", "a.name = b.name"),
        ("name_tail", "substr(a.name, 7, 6) = substr(b.name, 7, 6)"),
        ("nation", "a.nation = b.nation"))
      val agrees = fields.zipWithIndex.map { case (_, i) =>
        s"""sum(CASE WHEN mt AND f$i THEN 1 ELSE 0 END)::BIGINT AS am$i,
           |    sum(CASE WHEN NOT mt AND f$i THEN 1 ELSE 0 END)::BIGINT
           |      AS au$i""".stripMargin
      }.mkString(",\n    ")
      val flags = fields.zipWithIndex.map { case ((_, fieldExpr), i) =>
        s"($fieldExpr) AS f$i" }.mkString(",\n         ")
      val ws = fields.indices.map { i =>
        s"""(round((ln((am$i + 1)::DOUBLE / (n_m + 2)::DOUBLE) -
           |    ln((au$i + 1)::DOUBLE / (n_u + 2)::DOUBLE))
           |    * 1000000.0))::BIGINT AS wa$i,
           |  (round((ln(1.0 - (am$i + 1)::DOUBLE / (n_m + 2)::DOUBLE) -
           |    ln(1.0 - (au$i + 1)::DOUBLE / (n_u + 2)::DOUBLE))
           |    * 1000000.0))::BIGINT AS wd$i""".stripMargin
      }.mkString(",\n  ")
      val scoreSum = fields.indices
        .map(i => s"(CASE WHEN f$i THEN wa$i ELSE wd$i END)")
        .mkString(" +\n    ")
      s"""WITH recs AS (
         |  SELECT c_custkey * 2 AS rec_id,
         |    substr(md5(c_custkey::VARCHAR), 1, 12) AS name,
         |    c_nationkey::BIGINT AS nation, c_custkey AS ck
         |  FROM customer
         |  UNION ALL
         |  SELECT c_custkey * 2 + 1,
         |    substr(nm, 1, p - 1) || 'z' || substr(nm, p + 1, 12),
         |    (CASE WHEN c_custkey % 3 = 0 THEN (c_nationkey + 1) % 25
         |          ELSE c_nationkey END)::BIGINT,
         |    c_custkey
         |  FROM (SELECT c_custkey, c_nationkey,
         |          substr(md5(c_custkey::VARCHAR), 1, 12) AS nm,
         |          (c_custkey % 12 + 1)::INTEGER AS p
         |        FROM customer WHERE c_custkey % 7 = 0)),
         |pr AS (SELECT a.rec_id AS id_a, b.rec_id AS id_b,
         |         (a.ck = b.ck) AS mt,
         |         $flags
         |       FROM recs a JOIN recs b
         |         ON substr(a.name, 1, 6) = substr(b.name, 1, 6)
         |        AND a.rec_id < b.rec_id),
         |mom AS (SELECT
         |    sum(CASE WHEN mt THEN 1 ELSE 0 END)::BIGINT AS n_m,
         |    sum(CASE WHEN NOT mt THEN 1 ELSE 0 END)::BIGINT AS n_u,
         |    $agrees
         |  FROM pr),
         |w AS (SELECT
         |  $ws
         |  FROM mom),
         |sc AS (SELECT id_a, id_b,
         |    ($scoreSum)::BIGINT AS score_micro
         |  FROM pr, w)
         |SELECT id_a, id_b, score_micro,
         |  CASE WHEN score_micro >= 5000000 THEN 'match'
         |       WHEN score_micro <= -5000000 THEN 'non_match'
         |       ELSE 'possible' END AS decision
         |FROM sc""".stripMargin
    },

    // hashing-trick features: per-token md5 hash32 → dim index + sign
    // bit, signed integer counts assembled per dimension
    "q263_hash_features" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w
        |  FROM documents),
        |e AS (SELECT doc_id, u.tok FROM t, unnest(w) AS u(tok)),
        |h AS (SELECT doc_id,
        |    (('0x' || substr(md5('hf:' || tok), 1, 8))
        |      ::UBIGINT)::BIGINT AS hv
        |  FROM e),
        |g AS (SELECT doc_id, hv % 16 AS idx,
        |    sum(CASE WHEN (hv // 65536) % 2 = 0 THEN 1 ELSE -1 END)
        |      ::BIGINT AS c
        |  FROM h GROUP BY 1, 2),
        |dims AS (SELECT unnest(range(0, 16)) AS idx),
        |grid AS (SELECT t.doc_id, d.idx, coalesce(g.c, 0)::BIGINT AS c
        |  FROM t CROSS JOIN dims d
        |  LEFT JOIN g ON g.doc_id = t.doc_id AND g.idx = d.idx)
        |SELECT doc_id,
        |  array_to_string(list(c ORDER BY idx), ',') AS features
        |FROM grid GROUP BY 1""".stripMargin,

    // split conformal: per-source mean predictor from the calibration
    // half, micro residuals, exact-integer k, cumulative-count
    // quantile over distinct residuals, test coverage
    "q264_conformal" ->
      """WITH d AS (SELECT doc_id, source, n_chars::BIGINT AS v,
        |    doc_id % 2 = 0 AS c
        |  FROM documents),
        |pm AS (SELECT source,
        |    (round(sum(v)::DOUBLE * 1000000.0 / count(*)::DOUBLE))
        |      ::BIGINT AS p
        |  FROM d WHERE c GROUP BY 1),
        |r AS (SELECT d.c, abs(d.v * 1000000 - pm.p)::BIGINT AS r
        |  FROM d JOIN pm USING (source)),
        |nn AS (SELECT
        |    sum(CASE WHEN c THEN 1 ELSE 0 END)::BIGINT AS n_cal,
        |    sum(CASE WHEN NOT c THEN 1 ELSE 0 END)::BIGINT AS n_test
        |  FROM r),
        |kk AS (SELECT n_cal, n_test,
        |    (((n_cal + 1) * 900000 + 999999) // 1000000)::BIGINT AS k
        |  FROM nn),
        |counts AS (SELECT r AS rv, count(*)::BIGINT AS n FROM r
        |  WHERE c GROUP BY 1),
        |cc AS (SELECT rv, sum(n) OVER (ORDER BY rv
        |    ROWS UNBOUNDED PRECEDING) AS cum FROM counts),
        |q AS (SELECT min(rv)::BIGINT AS qhat_micro FROM cc, kk
        |  WHERE cum >= kk.k),
        |cov AS (SELECT sum(CASE WHEN q.qhat_micro IS NULL
        |      OR r.r <= q.qhat_micro THEN 1 ELSE 0 END)::BIGINT
        |      AS covered
        |  FROM r, q WHERE NOT c)
        |SELECT kk.n_cal, kk.n_test, kk.k, q.qhat_micro,
        |  CASE WHEN kk.n_test = 0 THEN NULL
        |    ELSE round(coalesce(cov.covered, 0)::DOUBLE /
        |      kk.n_test::DOUBLE, 6) END AS coverage
        |FROM kk, q, cov""".stripMargin,

    // Personalized PageRank: q133's unrolled src-ordered folds with
    // the teleport mass restarted uniformly over the doc_id % 17 = 0
    // seed set (r0 = s)
    "q254_personalized_pagerank" -> {
      val iterCtes = (1 to 5).map { i =>
        s"""c$i AS (SELECT dst,
           |  list_reduce(list(r.rank / outdeg ORDER BY e.src),
           |    (a, b) -> a + b) AS s2
           |  FROM e JOIN r${i - 1} r ON e.src = r.id GROUP BY dst),
           |r$i AS (SELECT sv.id,
           |  (1.0::DOUBLE - 0.85::DOUBLE) * sv.s +
           |  0.85::DOUBLE * coalesce(s2, 0.0::DOUBLE) AS rank
           |  FROM sv LEFT JOIN c$i ON sv.id = c$i.dst)""".stripMargin
      }.mkString(",\n")
      s"""WITH cnt AS (SELECT count(*)::BIGINT AS n FROM documents),
         |nodes AS (SELECT doc_id AS id FROM documents),
         |ed AS (SELECT doc_id AS src, (doc_id * 7 + k) % n AS dst
         |       FROM documents CROSS JOIN cnt
         |       CROSS JOIN (SELECT unnest([1, 2, 3]) AS k)),
         |deg AS (SELECT src, count(*)::DOUBLE AS outdeg
         |        FROM ed GROUP BY src),
         |e AS (SELECT ed.src, ed.dst, deg.outdeg
         |      FROM ed JOIN deg USING (src)),
         |sd AS (SELECT id FROM nodes WHERE id % 17 = 0),
         |ns AS (SELECT count(*)::DOUBLE AS ns FROM sd),
         |sv AS (SELECT nodes.id,
         |         CASE WHEN sd.id IS NOT NULL
         |           THEN 1.0::DOUBLE / ns.ns
         |           ELSE 0.0::DOUBLE END AS s
         |       FROM nodes CROSS JOIN ns
         |       LEFT JOIN sd ON sd.id = nodes.id),
         |r0 AS (SELECT id, s AS rank FROM sv),
         |$iterCtes
         |SELECT id AS doc_id, round(rank * 1e9)::BIGINT AS rank_nano
         |FROM r5""".stripMargin
    },

    // Persisted-index deletion lifecycle: q121's IVFADC-R chain with
    // the tombstoned ids (vec_id % 9 = 0) removed from the CODE table
    // only — codebooks and centroids stay fit on the full corpus
    // (deletes never refit models), and the gate query serves the
    // same rows through BOTH the tombstone anti-join and the
    // compacted generation.
    "q265_pq_index_delete" -> q121Sql("WHERE a0.vid % 9 <> 0"),

    // Unsupervised Fellegi-Sunter (Winkler EM): the 5 fixed EM
    // iterations unroll as CTE pairs (e<i> responsibilities over the
    // ≤ 2^3-row pattern table, s<i> re-estimated micro params) with
    // the EXACT arithmetic shape of Dedup.fellegiSunterEM — micro-
    // snapped responsibilities make every M-step sum exact integer,
    // each estimate is one double division of two exact longs, the
    // E-step product chain is left-associated in both engines.
    "q266_fs_em" -> {
      val fields = Seq(
        ("name_mid", "substr(a.name, 4, 3) = substr(b.name, 4, 3)"),
        ("name_tail", "substr(a.name, 7, 3) = substr(b.name, 7, 3)"),
        ("nation", "a.nation = b.nation"))
      val idx = fields.indices
      val flags = fields.zipWithIndex.map { case ((_, e), i) =>
        s"($e) AS f$i" }.mkString(",\n         ")
      val patCols = idx.map(i => s"coalesce(f$i, false) AS f$i")
        .mkString(", ")
      def emIter(i: Int, prev: String): String = {
        val pm = idx.foldLeft(s"(p::DOUBLE / 1000000.0)") { (acc, j) =>
          s"$acc * (CASE WHEN f$j THEN m$j::DOUBLE / 1000000.0 " +
            s"ELSE (1000000 - m$j)::DOUBLE / 1000000.0 END)"
        }
        val pu = idx.foldLeft(
          s"((1000000 - p)::DOUBLE / 1000000.0)") { (acc, j) =>
          s"$acc * (CASE WHEN f$j THEN u$j::DOUBLE / 1000000.0 " +
            s"ELSE (1000000 - u$j)::DOUBLE / 1000000.0 END)"
        }
        val moments = idx.flatMap(j => Seq(
          s"""least(999999, greatest(1,
             |    round(sum(CASE WHEN f$j THEN w * n ELSE 0 END)::DOUBLE
             |      / sum(w * n)::DOUBLE * 1000000.0)::BIGINT)) AS m$j""",
          s"""least(999999, greatest(1,
             |    round(sum(CASE WHEN f$j THEN (1000000 - w) * n
             |        ELSE 0 END)::DOUBLE
             |      / (1000000 * sum(n) - sum(w * n))::DOUBLE
             |      * 1000000.0)::BIGINT)) AS u$j"""))
          .map(_.stripMargin).mkString(",\n  ")
        s"""e$i AS (SELECT pat.*,
           |  round(($pm) / (($pm) + ($pu)) * 1000000.0)::BIGINT AS w
           |  FROM pat CROSS JOIN $prev),
           |s$i AS (SELECT
           |  least(999999, greatest(1,
           |    round(sum(w * n)::DOUBLE / sum(n)::DOUBLE)::BIGINT))
           |    AS p,
           |  $moments
           |  FROM e$i)""".stripMargin
      }
      val iters = (1 to 5).map(i =>
        emIter(i, if (i == 1) "p0" else s"s${i - 1}")).mkString(",\n")
      val init = ("100000::BIGINT AS p" +: idx.flatMap(j => Seq(
        s"900000::BIGINT AS m$j", s"100000::BIGINT AS u$j")))
        .mkString(", ")
      val sels = fields.zipWithIndex.map { case ((nm, _), i) =>
        s"""SELECT '$nm' AS field, p AS p_micro,
           |  m$i AS m_micro, u$i AS u_micro,
           |  round((ln(m$i::DOUBLE / 1000000.0) -
           |    ln(u$i::DOUBLE / 1000000.0)) * 1000000.0)::BIGINT
           |    AS w_agree_micro,
           |  round((ln((1000000 - m$i)::DOUBLE / 1000000.0) -
           |    ln((1000000 - u$i)::DOUBLE / 1000000.0)) * 1000000.0)
           |    ::BIGINT AS w_disagree_micro
           |FROM s5""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH recs AS (
         |  SELECT c_custkey * 2 AS rec_id,
         |    substr(md5(c_custkey::VARCHAR), 1, 12) AS name,
         |    c_nationkey::BIGINT AS nation
         |  FROM customer
         |  UNION ALL
         |  SELECT c_custkey * 2 + 1,
         |    substr(nm, 1, p - 1) || 'z' || substr(nm, p + 1, 12),
         |    (CASE WHEN c_custkey % 3 = 0 THEN (c_nationkey + 1) % 25
         |          ELSE c_nationkey END)::BIGINT
         |  FROM (SELECT c_custkey, c_nationkey,
         |          substr(md5(c_custkey::VARCHAR), 1, 12) AS nm,
         |          (c_custkey % 12 + 1)::INTEGER AS p
         |        FROM customer WHERE c_custkey % 7 = 0)),
         |pr AS (SELECT $flags
         |       FROM recs a JOIN recs b
         |         ON substr(a.name, 1, 3) = substr(b.name, 1, 3)
         |        AND a.rec_id < b.rec_id),
         |pat AS (SELECT $patCols, count(*)::BIGINT AS n
         |        FROM pr GROUP BY ALL),
         |p0 AS (SELECT $init),
         |$iters
         |$sels""".stripMargin
    },

    // Mann-Whitney U: doubled tie-averaged ranks from the distinct-
    // cent-value cumulative table; exact HUGEINT U and tie sums; the
    // z / rank-biserial double chains mirror mannWhitneyU exactly
    "q267_mann_whitney" ->
      """WITH d AS (SELECT (event_type = 'view') AS ga,
        |    round(value * 100)::BIGINT AS v
        |  FROM events WHERE value IS NOT NULL),
        |bv AS (SELECT v,
        |    sum(CASE WHEN ga THEN 1 ELSE 0 END)::BIGINT AS na,
        |    sum(CASE WHEN NOT ga THEN 1 ELSE 0 END)::BIGINT AS nb,
        |    count(*)::BIGINT AS cnt
        |  FROM d GROUP BY v),
        |rk AS (SELECT na, nb, cnt,
        |    2 * (sum(cnt) OVER (ORDER BY v) - cnt) + cnt + 1 AS r2
        |  FROM bv),
        |m AS (SELECT sum(na)::BIGINT AS n_a, sum(nb)::BIGINT AS n_b,
        |    sum(na::HUGEINT * r2) AS ra2,
        |    sum(cnt::HUGEINT * cnt * cnt - cnt) AS ties
        |  FROM rk),
        |u AS (SELECT n_a, n_b, ties,
        |    (n_a + n_b)::HUGEINT AS n,
        |    ra2 - n_a::HUGEINT * (n_a + 1) AS ua2,
        |    2 * n_a::HUGEINT * n_b - (ra2 - n_a::HUGEINT * (n_a + 1))
        |      AS ub2
        |  FROM m),
        |vr AS (SELECT u.*,
        |    (n_a::HUGEINT * n_b)::DOUBLE / 12.0 *
        |      ((n + 1)::DOUBLE - ties::DOUBLE / (n * (n - 1))::DOUBLE)
        |      AS varu
        |  FROM u)
        |SELECT n_a, n_b, ua2::BIGINT AS u_a_x2, ub2::BIGINT AS u_b_x2,
        |  (round((1.0 - ub2::DOUBLE / (n_a::HUGEINT * n_b)::DOUBLE)
        |    * 1000000.0))::BIGINT AS r_rb_micro,
        |  CASE WHEN varu = 0 THEN NULL ELSE
        |    (round((ua2::DOUBLE / 2.0
        |      - (n_a::HUGEINT * n_b)::DOUBLE / 2.0) / sqrt(varu)
        |      * 1000000.0))::BIGINT END AS z_micro
        |FROM vr""".stripMargin,

    // Adamic-Adar over the k in 1..3 citation ring: wedge join through
    // the common neighbor, per-neighbor 1/ln(deg) micro terms snapped
    // before the sum, existing edges anti-joined, deterministic top-20
    "q268_adamic_adar" ->
      """WITH nn AS (SELECT count(*)::BIGINT AS n FROM documents),
        |e0 AS (SELECT doc_id AS src, (doc_id + k.k) % nn.n AS dst
        |  FROM documents CROSS JOIN nn
        |  CROSS JOIN (SELECT unnest([1, 2, 3]) AS k) k),
        |und AS (SELECT DISTINCT least(src, dst) AS a,
        |    greatest(src, dst) AS b
        |  FROM e0 WHERE src <> dst),
        |nbrs AS (SELECT a AS w, b AS x FROM und
        |  UNION ALL SELECT b, a FROM und),
        |deg AS (SELECT w, count(*)::BIGINT AS dg FROM nbrs GROUP BY w),
        |wt AS (SELECT nbrs.w, nbrs.x,
        |    (round(1000000.0 / ln(dg::DOUBLE)))::BIGINT AS t
        |  FROM nbrs JOIN deg ON deg.w = nbrs.w
        |  WHERE dg > 1 AND dg <= 10000),
        |pairs AS (SELECT l.x AS id_a, r.x AS id_b,
        |    count(*)::BIGINT AS n_common, sum(l.t)::BIGINT AS aa_micro
        |  FROM wt l JOIN wt r ON l.w = r.w AND l.x < r.x
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, n_common, aa_micro
        |FROM pairs
        |WHERE NOT EXISTS (SELECT 1 FROM und
        |  WHERE und.a = pairs.id_a AND und.b = pairs.id_b)
        |ORDER BY aa_micro DESC, id_a, id_b
        |LIMIT 20""".stripMargin,

    // Exact Gini from the distinct-count cumulative table: doubled
    // rank-weighted sum (ties share consecutive ranks), HUGEINT
    // moments, one micro-snapped double chain
    "q269_gini" ->
      """WITH uc AS (SELECT user_id, count(*)::BIGINT AS c
        |  FROM events GROUP BY user_id),
        |bv AS (SELECT c, count(*)::BIGINT AS cnt FROM uc GROUP BY c),
        |cl AS (SELECT c, cnt,
        |    sum(cnt) OVER (ORDER BY c) - cnt AS less
        |  FROM bv),
        |m AS (SELECT sum(cnt)::BIGINT AS n,
        |    sum(c::HUGEINT * cnt) AS tot,
        |    sum(c::HUGEINT * cnt * (2 * less + cnt + 1)) AS rw2
        |  FROM cl)
        |SELECT n, tot::BIGINT AS total,
        |  CASE WHEN tot = 0 THEN NULL ELSE
        |    (round((rw2::DOUBLE / (n::DOUBLE * tot::DOUBLE)
        |      - (n + 1)::DOUBLE / n::DOUBLE) * 1000000.0))::BIGINT
        |  END AS gini_micro
        |FROM m""".stripMargin,

    // Jensen-Shannon terms: per-category micro-snapped (p ln(p/m) +
    // q ln(q/m))/2 against exact count ratios; one-sided categories
    // contribute finitely
    "q270_js_divergence" ->
      """WITH counts AS (SELECT event_type AS cat,
        |    sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT
        |      AS n_a,
        |    sum(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END)::BIGINT
        |      AS n_b
        |  FROM events GROUP BY event_type),
        |tot AS (SELECT sum(n_a)::BIGINT AS ta, sum(n_b)::BIGINT AS tb
        |  FROM counts)
        |SELECT cat, n_a, n_b,
        |  (round(
        |    (CASE WHEN n_a > 0 THEN (n_a::DOUBLE / ta::DOUBLE) *
        |      ln((n_a::DOUBLE / ta::DOUBLE) /
        |        ((n_a::DOUBLE / ta::DOUBLE + n_b::DOUBLE / tb::DOUBLE)
        |          / 2.0)) ELSE 0.0 END +
        |     CASE WHEN n_b > 0 THEN (n_b::DOUBLE / tb::DOUBLE) *
        |      ln((n_b::DOUBLE / tb::DOUBLE) /
        |        ((n_a::DOUBLE / ta::DOUBLE + n_b::DOUBLE / tb::DOUBLE)
        |          / 2.0)) ELSE 0.0 END)
        |    / 2.0 * 1000000.0))::BIGINT AS term_micro
        |FROM counts, tot""".stripMargin,

    // Cramér's V: q228's zero-filled contingency grid with snapped
    // micro terms, then V = sqrt(chi2 / (N·(min(r,c)−1)))
    "q271_cramers_v" ->
      """WITH base AS (SELECT event_type, (user_id % 5)::BIGINT
        |    AS cohort FROM events),
        |cells AS (SELECT event_type, cohort, count(*)::BIGINT
        |    AS observed
        |  FROM base GROUP BY 1, 2),
        |r AS (SELECT event_type, sum(observed)::BIGINT AS rt
        |  FROM cells GROUP BY 1),
        |c AS (SELECT cohort, sum(observed)::BIGINT AS ct
        |  FROM cells GROUP BY 1),
        |n AS (SELECT sum(observed)::BIGINT AS n FROM cells),
        |grid AS (SELECT r.event_type, c.cohort, r.rt, c.ct,
        |    coalesce(cells.observed, 0)::BIGINT AS observed
        |  FROM r CROSS JOIN c
        |  LEFT JOIN cells ON cells.event_type = r.event_type
        |    AND cells.cohort = c.cohort),
        |terms AS (SELECT grid.observed,
        |    (round((grid.observed::DOUBLE
        |        - (grid.rt * grid.ct)::DOUBLE / n.n::DOUBLE)
        |      * (grid.observed::DOUBLE
        |        - (grid.rt * grid.ct)::DOUBLE / n.n::DOUBLE)
        |      / ((grid.rt * grid.ct)::DOUBLE / n.n::DOUBLE)
        |      * 1000000.0))::BIGINT AS term_micro,
        |    grid.event_type, grid.cohort
        |  FROM grid, n),
        |agg AS (SELECT sum(observed)::BIGINT AS n,
        |    count(DISTINCT event_type)::BIGINT AS n_rows_dim,
        |    count(DISTINCT cohort)::BIGINT AS n_cols_dim,
        |    sum(term_micro)::BIGINT AS chi2_micro
        |  FROM terms)
        |SELECT n, n_rows_dim, n_cols_dim, chi2_micro,
        |  (round(sqrt(chi2_micro::DOUBLE / 1000000.0 /
        |    (n::DOUBLE * (least(n_rows_dim, n_cols_dim) - 1)::DOUBLE))
        |    * 1000000.0))::BIGINT AS v_micro
        |FROM agg""".stripMargin,

    // Streaming sessionization replay: the state-derived report under
    // event-time-ordered batches equals the batch flavor exactly —
    // q24's SQL verbatim
    "q272_streaming_sessions_replay" -> q24Sessionize,

    // Incremental join maintenance: the oracle is the FULL re-join —
    // identical output proves the delta rule (ΔA⋈B_new ∪ A_old⋈ΔB)
    // loses nothing and duplicates nothing
    "q273_incremental_join" ->
      """SELECT o_orderkey AS okey, o_custkey, o_totalprice,
        |  l_linenumber, l_quantity
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey"""
        .stripMargin,

    // Kendall tau-b: distinct-cell grid self-join for C/D (HUGEINT
    // cross products), tie pairs per margin, one micro-snapped chain
    "q274_kendall_tau" ->
      """WITH per AS (SELECT user_id,
        |    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |      ::BIGINT AS nv,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      ::BIGINT AS nc
        |  FROM events GROUP BY user_id),
        |cells AS (SELECT nv AS va, nc AS vb, count(*)::BIGINT AS n
        |  FROM per GROUP BY 1, 2),
        |cd AS (SELECT
        |    coalesce(sum(CASE WHEN l.vb < r.vb
        |      THEN l.n::HUGEINT * r.n END), 0) AS c,
        |    coalesce(sum(CASE WHEN l.vb > r.vb
        |      THEN l.n::HUGEINT * r.n END), 0) AS d
        |  FROM cells l JOIN cells r ON l.va < r.va),
        |t1 AS (SELECT coalesce(sum(t::HUGEINT * (t - 1) / 2), 0)
        |    AS n1
        |  FROM (SELECT sum(n)::BIGINT AS t FROM cells GROUP BY va)),
        |t2 AS (SELECT coalesce(sum(t::HUGEINT * (t - 1) / 2), 0)
        |    AS n2
        |  FROM (SELECT sum(n)::BIGINT AS t FROM cells GROUP BY vb)),
        |tot AS (SELECT sum(n)::BIGINT AS n,
        |    count(*)::BIGINT AS n_cells FROM cells)
        |SELECT tot.n, tot.n_cells, c::BIGINT AS c_pairs,
        |  d::BIGINT AS d_pairs,
        |  CASE WHEN sqrt((tot.n::HUGEINT * (tot.n - 1) / 2 - n1)
        |      ::DOUBLE * (tot.n::HUGEINT * (tot.n - 1) / 2 - n2)
        |      ::DOUBLE) = 0 THEN NULL ELSE
        |    (round((c - d)::DOUBLE /
        |      sqrt((tot.n::HUGEINT * (tot.n - 1) / 2 - n1)::DOUBLE *
        |        (tot.n::HUGEINT * (tot.n - 1) / 2 - n2)::DOUBLE)
        |      * 1000000.0))::BIGINT END AS tau_b_micro
        |FROM tot, cd, t1, t2""".stripMargin,

    // Cohen's d / Hedges' g: one moment pass to exact integers, the
    // identical pooled-SD double chain, micro-snapped
    "q275_cohens_d" ->
      """WITH d AS (SELECT (event_type = 'view') AS ga,
        |    round(value * 100)::BIGINT AS v
        |  FROM events WHERE value IS NOT NULL),
        |m AS (SELECT
        |    sum(CASE WHEN ga THEN 1 ELSE 0 END)::BIGINT AS n_a,
        |    sum(CASE WHEN ga THEN v ELSE 0 END)::BIGINT AS s_a,
        |    sum(CASE WHEN ga THEN v::HUGEINT * v ELSE 0 END) AS q_a,
        |    sum(CASE WHEN NOT ga THEN 1 ELSE 0 END)::BIGINT AS n_b,
        |    sum(CASE WHEN NOT ga THEN v ELSE 0 END)::BIGINT AS s_b,
        |    sum(CASE WHEN NOT ga THEN v::HUGEINT * v ELSE 0 END) AS q_b
        |  FROM d),
        |x AS (SELECT n_a, n_b,
        |    s_a::DOUBLE / n_a::DOUBLE AS ma,
        |    s_b::DOUBLE / n_b::DOUBLE AS mb,
        |    (n_a::DOUBLE * q_a::DOUBLE - s_a::DOUBLE * s_a::DOUBLE)
        |      / (n_a::DOUBLE * (n_a::DOUBLE - 1.0)) AS va,
        |    (n_b::DOUBLE * q_b::DOUBLE - s_b::DOUBLE * s_b::DOUBLE)
        |      / (n_b::DOUBLE * (n_b::DOUBLE - 1.0)) AS vb
        |  FROM m),
        |y AS (SELECT x.*,
        |    sqrt(((n_a::DOUBLE - 1.0) * va + (n_b::DOUBLE - 1.0) * vb)
        |      / (n_a::DOUBLE + n_b::DOUBLE - 2.0)) AS sp
        |  FROM x)
        |SELECT n_a, n_b,
        |  (round(ma * 1000000.0))::BIGINT AS mean_a_micro,
        |  (round(mb * 1000000.0))::BIGINT AS mean_b_micro,
        |  CASE WHEN n_a < 2 OR n_b < 2 OR sp = 0 OR isnan(sp)
        |    THEN NULL ELSE
        |    (round((ma - mb) / sp * 1000000.0))::BIGINT END
        |    AS d_micro,
        |  CASE WHEN n_a < 2 OR n_b < 2 OR sp = 0 OR isnan(sp)
        |    THEN NULL ELSE
        |    (round((ma - mb) / sp *
        |      (1.0 - 3.0 / (4.0 * (n_a::DOUBLE + n_b::DOUBLE) - 9.0))
        |      * 1000000.0))::BIGINT END AS g_micro
        |FROM y""".stripMargin,

    // Poisson bootstrap: B=32 md5-deterministic Poisson(1) weights per
    // row (exact CDF ladder at a discrete micro uniform), replicate
    // means micro-snapped, CI = order statistics at the
    // floor(q*(B-1))+1 rank convention with per-tail mass alpha/2
    "q276_bootstrap_ci" -> {
      val ladder = Seq(367879L, 735759L, 919699L, 981012L, 996340L,
        999406L, 999917L, 999990L, 999999L)
      val cases = ladder.zipWithIndex.map { case (thr, k) =>
        s"WHEN u < $thr THEN $k" }.mkString(" ")
      s"""WITH d AS (SELECT event_id::VARCHAR AS k,
         |    round(value * 100)::BIGINT AS v
         |  FROM events WHERE value IS NOT NULL),
         |ex AS (SELECT v,
         |    (('0x' || substr(md5(k || ':' || b.b::VARCHAR), 1, 8))
         |      ::UBIGINT)::BIGINT % 1000000 AS u, b.b AS b
         |  FROM d CROSS JOIN
         |    (SELECT unnest(generate_series(0, 31)) AS b) b),
         |reps AS (SELECT b, v,
         |    (CASE $cases ELSE ${ladder.size} END)::BIGINT AS w
         |  FROM ex),
         |ms AS (SELECT b,
         |    (round(sum(w * v)::DOUBLE / sum(w)::DOUBLE * 1000000.0))
         |      ::BIGINT AS m
         |  FROM reps GROUP BY b),
         |arr AS (SELECT list_sort(list(m)) AS ms FROM ms),
         |ci AS (SELECT
         |    ms[(floor(0.05 * (len(ms) - 1))::INTEGER + 1)]
         |      AS lo_micro,
         |    ms[(floor(0.95 * (len(ms) - 1))::INTEGER + 1)]
         |      AS hi_micro,
         |    len(ms)::BIGINT AS b_replicates
         |  FROM arr),
         |tot AS (SELECT count(*)::BIGINT AS n,
         |    (round(sum(v)::DOUBLE / count(*)::DOUBLE * 1000000.0))
         |      ::BIGINT AS mean_micro
         |  FROM d)
         |SELECT n, b_replicates, mean_micro, lo_micro, hi_micro
         |FROM tot, ci""".stripMargin
    },

    // Trimmed/winsorized means: distinct-cent cumulative table, exact
    // interval clips, exact HUGEINT k and tail terms, one micro-
    // snapped division per mean
    "q277_trimmed_means" ->
      """WITH d AS (SELECT round(value * 100)::BIGINT AS v
        |  FROM events WHERE value IS NOT NULL),
        |cells AS (SELECT v, count(*)::BIGINT AS cnt FROM d GROUP BY v),
        |cum AS (SELECT v, cnt,
        |    sum(cnt) OVER (ORDER BY v) - cnt AS before
        |  FROM cells),
        |tot AS (SELECT sum(cnt)::HUGEINT AS n,
        |    (sum(cnt)::HUGEINT * 100000) // 1000000 AS k
        |  FROM cum),
        |m AS (SELECT max(n) AS n, max(k) AS k,
        |    sum(v::HUGEINT * cnt) AS s,
        |    sum(v::HUGEINT * greatest(0::HUGEINT,
        |      least((before + cnt)::HUGEINT, n - k) -
        |        greatest(before::HUGEINT, k))) AS ts,
        |    min(CASE WHEN (before + cnt)::HUGEINT >= k + 1 THEN v END)
        |      AS vlo,
        |    min(CASE WHEN (before + cnt)::HUGEINT >= n - k THEN v END)
        |      AS vhi
        |  FROM cum, tot)
        |SELECT n::BIGINT AS n, k::BIGINT AS k_trimmed,
        |  (round(s::DOUBLE / n::DOUBLE * 1000000.0))::BIGINT
        |    AS mean_micro,
        |  CASE WHEN n - 2 * k <= 0 THEN NULL ELSE
        |    (round(ts::DOUBLE / (n - 2 * k)::DOUBLE * 1000000.0))
        |      ::BIGINT END AS trimmed_mean_micro,
        |  CASE WHEN n - 2 * k <= 0 THEN NULL ELSE
        |    (round((ts + k * (vlo::HUGEINT + vhi))::DOUBLE
        |      / n::DOUBLE * 1000000.0))::BIGINT END
        |    AS winsorized_mean_micro
        |FROM m""".stripMargin,

    // Log-rank: q241's censored-lifetime CTEs split by group, per-time
    // hypergeometric e/v micro terms summed exactly, one z/chi2 chain
    "q278_log_rank" -> q278LogRankSql,
        // One-way ANOVA: per-group moments, milli-snapped s²/n terms
    // summed exactly, one F/η² double chain
    "q279_anova_f" ->
      """WITH d AS (SELECT event_type AS g,
        |    round(value * 100)::BIGINT AS v
        |  FROM events WHERE value IS NOT NULL),
        |gm AS (SELECT g, count(*)::BIGINT AS n, sum(v)::BIGINT AS s,
        |    sum(v::HUGEINT * v::HUGEINT) AS q
        |  FROM d GROUP BY 1),
        |t AS (SELECT n, s, q,
        |    (round(s::DOUBLE * s::DOUBLE / n::DOUBLE * 1000.0))
        |      ::BIGINT AS tm
        |  FROM gm),
        |m AS (SELECT count(*)::BIGINT AS k, sum(n)::BIGINT AS n,
        |    sum(s)::BIGINT AS ss, sum(q) AS qq,
        |    sum(tm)::BIGINT AS bm
        |  FROM t),
        |b AS (SELECT k, n,
        |    (bm - (round(ss::DOUBLE * ss::DOUBLE / n::DOUBLE
        |      * 1000.0))::BIGINT) AS ssb_milli,
        |    ((qq * 1000)::BIGINT - bm) AS ssw_milli,
        |    ((qq * 1000)::BIGINT - (round(ss::DOUBLE * ss::DOUBLE
        |      / n::DOUBLE * 1000.0))::BIGINT) AS sst_milli
        |  FROM m)
        |SELECT k, n, ssb_milli, ssw_milli, sst_milli,
        |  CASE WHEN k < 2 OR n <= k OR ssw_milli <= 0 THEN NULL ELSE
        |    (round((ssb_milli::DOUBLE / (k - 1)::DOUBLE)
        |      / (ssw_milli::DOUBLE / (n - k)::DOUBLE) * 1000000.0))
        |      ::BIGINT END AS f_micro,
        |  CASE WHEN sst_milli <= 0 THEN NULL ELSE
        |    (round(ssb_milli::DOUBLE / sst_milli::DOUBLE
        |      * 1000000.0))::BIGINT END AS eta2_micro
        |FROM b""".stripMargin,

    // Levene W (mean-centered): micro-snapped group means, exact
    // integer |x−m| re-snap to whole cents, then the ANOVA chain
    "q280_levene" ->
      """WITH d AS (SELECT event_type AS g,
        |    round(value * 100)::BIGINT AS v
        |  FROM events WHERE value IS NOT NULL),
        |gmean AS (SELECT g,
        |    (round(sum(v)::DOUBLE / count(*)::DOUBLE * 1000000.0))
        |      ::BIGINT AS mm
        |  FROM d GROUP BY 1),
        |z AS (SELECT d.g, (abs(d.v * 1000000 - gmean.mm) // 1000000)
        |      ::BIGINT AS v
        |  FROM d JOIN gmean USING (g)),
        |gm AS (SELECT g, count(*)::BIGINT AS n, sum(v)::BIGINT AS s,
        |    sum(v::HUGEINT * v::HUGEINT) AS q
        |  FROM z GROUP BY 1),
        |t AS (SELECT n, s, q,
        |    (round(s::DOUBLE * s::DOUBLE / n::DOUBLE * 1000.0))
        |      ::BIGINT AS tm
        |  FROM gm),
        |m AS (SELECT count(*)::BIGINT AS k, sum(n)::BIGINT AS n,
        |    sum(s)::BIGINT AS ss, sum(q) AS qq,
        |    sum(tm)::BIGINT AS bm
        |  FROM t),
        |b AS (SELECT k, n,
        |    (bm - (round(ss::DOUBLE * ss::DOUBLE / n::DOUBLE
        |      * 1000.0))::BIGINT) AS ssb_milli,
        |    ((qq * 1000)::BIGINT - bm) AS ssw_milli
        |  FROM m)
        |SELECT k, n, ssb_milli, ssw_milli,
        |  CASE WHEN k < 2 OR n <= k OR ssw_milli <= 0 THEN NULL ELSE
        |    (round((ssb_milli::DOUBLE / (k - 1)::DOUBLE)
        |      / (ssw_milli::DOUBLE / (n - k)::DOUBLE) * 1000000.0))
        |      ::BIGINT END AS w_micro
        |FROM b""".stripMargin,

    // Kruskal-Wallis: distinct-value doubled ranks, exact decimal
    // rank sums, unit-snapped R²/(4n) terms, tie-corrected H'
    "q281_kruskal_wallis" ->
      """WITH d AS (SELECT event_type AS g,
        |    round(value * 100)::BIGINT AS v
        |  FROM events WHERE value IS NOT NULL),
        |cells AS (SELECT g, v, count(*)::BIGINT AS cgv
        |  FROM d GROUP BY 1, 2),
        |bv AS (SELECT v, sum(cgv)::BIGINT AS cnt FROM cells
        |  GROUP BY 1),
        |rk AS (SELECT v,
        |    (2 * (sum(cnt) OVER (ORDER BY v) - cnt) + cnt + 1)
        |      ::BIGINT AS r2,
        |    (cnt::HUGEINT * cnt * cnt - cnt) AS t3t
        |  FROM bv),
        |bg AS (SELECT g, sum(cgv)::BIGINT AS ng,
        |    sum(cgv::HUGEINT * r2::HUGEINT) AS rg2
        |  FROM cells JOIN rk USING (v) GROUP BY 1),
        |gm AS (SELECT count(*)::BIGINT AS k, sum(ng)::BIGINT AS n,
        |    sum((round(rg2::DOUBLE * rg2::DOUBLE
        |      / (4.0 * ng::DOUBLE)))::BIGINT)::BIGINT AS rsum
        |  FROM bg),
        |tt AS (SELECT coalesce(sum(t3t), 0) AS ties,
        |    count(*)::BIGINT AS nvals
        |  FROM rk)
        |SELECT k, n,
        |  CASE WHEN k < 2 OR nvals <= 1 OR n < 2 THEN NULL ELSE
        |    (round((12.0 / (n::DOUBLE * (n::DOUBLE + 1.0))
        |      * rsum::DOUBLE - 3.0 * (n::DOUBLE + 1.0))
        |      * 1000000.0))::BIGINT END AS h_micro,
        |  CASE WHEN k < 2 OR nvals <= 1 OR n < 2 THEN NULL ELSE
        |    (round((12.0 / (n::DOUBLE * (n::DOUBLE + 1.0))
        |      * rsum::DOUBLE - 3.0 * (n::DOUBLE + 1.0))
        |      / (1.0 - ties::DOUBLE
        |        / (n::DOUBLE * n::DOUBLE * n::DOUBLE - n::DOUBLE))
        |      * 1000000.0))::BIGINT END AS h_tie_micro
        |FROM gm, tt""".stripMargin,

    // Chao1 + Good-Turing coverage off the freq-of-freqs reduction
    "q282_vocab_richness" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |c AS (SELECT tok, count(*)::BIGINT AS c FROM t GROUP BY 1),
        |m AS (SELECT sum(c)::BIGINT AS n_tokens,
        |    count(*)::BIGINT AS n_types,
        |    sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT AS f1,
        |    sum(CASE WHEN c = 2 THEN 1 ELSE 0 END)::BIGINT AS f2
        |  FROM c)
        |SELECT n_tokens, n_types, f1, f2,
        |  (round((n_types::DOUBLE + f1::DOUBLE * (f1 - 1)::DOUBLE
        |    / (2.0 * (f2 + 1)::DOUBLE)) * 1000000.0))::BIGINT
        |    AS chao1_micro,
        |  (round((1.0 - f1::DOUBLE / n_tokens::DOUBLE) * 1000000.0))
        |    ::BIGINT AS coverage_micro
        |FROM m""".stripMargin,

    // Degree assortativity: ring + hub fan-out, canonical undirected
    // dedup, exact decimal moments over both orientations, one r chain
    "q283_assortativity" ->
      """WITH cnt AS (SELECT count(*)::BIGINT AS n FROM documents),
        |ring AS (SELECT doc_id AS src, (doc_id + 1) % n AS dst
        |  FROM documents CROSS JOIN cnt),
        |hubs AS (SELECT doc_id AS src, (doc_id + k) % n AS dst
        |  FROM documents CROSS JOIN cnt
        |    CROSS JOIN (SELECT unnest([2, 3, 4]) AS k)
        |  WHERE doc_id % 5 = 0),
        |und AS (SELECT DISTINCT least(src, dst) AS a,
        |    greatest(src, dst) AS b
        |  FROM (SELECT * FROM ring UNION ALL SELECT * FROM hubs)
        |  WHERE src <> dst),
        |deg AS (SELECT id, count(*)::BIGINT AS deg FROM (
        |    SELECT a AS id FROM und UNION ALL SELECT b AS id FROM und)
        |  GROUP BY 1),
        |p AS (SELECT da.deg AS dda, db.deg AS ddb FROM und
        |  JOIN deg da ON und.a = da.id
        |  JOIN deg db ON und.b = db.id),
        |m AS (SELECT count(*)::BIGINT AS n_edges,
        |    sum((dda + ddb)::HUGEINT) AS sx,
        |    sum(dda::HUGEINT * dda + ddb::HUGEINT * ddb) AS sxx,
        |    sum(2::HUGEINT * dda * ddb) AS sxy
        |  FROM p),
        |nn AS (SELECT count(*)::BIGINT AS n_nodes FROM deg)
        |SELECT n_nodes, n_edges,
        |  CASE WHEN n_edges = 0 OR
        |    (sxx::DOUBLE / (n_edges * 2)::DOUBLE -
        |      (sx::DOUBLE / (n_edges * 2)::DOUBLE) *
        |      (sx::DOUBLE / (n_edges * 2)::DOUBLE)) <= 0.0 THEN NULL
        |  ELSE (round((sxy::DOUBLE / (n_edges * 2)::DOUBLE -
        |      (sx::DOUBLE / (n_edges * 2)::DOUBLE) *
        |      (sx::DOUBLE / (n_edges * 2)::DOUBLE)) /
        |    (sxx::DOUBLE / (n_edges * 2)::DOUBLE -
        |      (sx::DOUBLE / (n_edges * 2)::DOUBLE) *
        |      (sx::DOUBLE / (n_edges * 2)::DOUBLE)) * 1000000.0))
        |    ::BIGINT END AS r_micro
        |FROM m, nn""".stripMargin,

    // Modularity: block assignment, within-edge share minus the
    // degree-null square, micro-snapped per community
    "q284_modularity" ->
      """WITH cnt AS (SELECT count(*)::BIGINT AS n FROM documents),
        |edges AS (SELECT doc_id AS src, (doc_id + k) % n AS dst
        |  FROM documents CROSS JOIN cnt
        |    CROSS JOIN (SELECT unnest([1, 2]) AS k)),
        |assign AS (SELECT doc_id AS id,
        |    ((doc_id // 16) % 4)::BIGINT AS community
        |  FROM documents),
        |und AS (SELECT DISTINCT least(src, dst) AS a,
        |    greatest(src, dst) AS b
        |  FROM edges WHERE src <> dst),
        |deg AS (SELECT id, count(*)::BIGINT AS deg FROM (
        |    SELECT a AS id FROM und UNION ALL SELECT b AS id FROM und)
        |  GROUP BY 1),
        |dt AS (SELECT community, count(*)::BIGINT AS n_nodes,
        |    sum(deg)::BIGINT AS d_tot
        |  FROM deg JOIN assign USING (id) GROUP BY 1),
        |ei AS (SELECT ca.community, count(*)::BIGINT AS e_in
        |  FROM und
        |  JOIN assign ca ON und.a = ca.id
        |  JOIN assign cb ON und.b = cb.id
        |  WHERE ca.community = cb.community GROUP BY 1),
        |mt AS (SELECT count(*)::BIGINT AS m FROM und)
        |SELECT dt.community, dt.n_nodes,
        |  coalesce(ei.e_in, 0)::BIGINT AS e_in, dt.d_tot,
        |  (round((coalesce(ei.e_in, 0)::DOUBLE / mt.m::DOUBLE -
        |    (dt.d_tot::DOUBLE / (2.0 * mt.m::DOUBLE)) *
        |    (dt.d_tot::DOUBLE / (2.0 * mt.m::DOUBLE)))
        |    * 1000000.0))::BIGINT AS q_term_micro
        |FROM dt LEFT JOIN ei USING (community) CROSS JOIN mt""".stripMargin,

    // Mutual information + NMI: bounded cell grid, micro-nat ln terms
    // weighted by exact counts, margin entropies, one NMI chain
    "q285_mutual_information" ->
      """WITH d AS (SELECT event_type AS x,
        |    (user_id % 4)::BIGINT AS y
        |  FROM events),
        |cells AS (SELECT x, y, count(*)::BIGINT AS cxy
        |  FROM d GROUP BY 1, 2),
        |rx AS (SELECT x, sum(cxy)::BIGINT AS cx FROM cells
        |  GROUP BY 1),
        |cy AS (SELECT y, sum(cxy)::BIGINT AS cy FROM cells
        |  GROUP BY 1),
        |tot AS (SELECT sum(cxy)::BIGINT AS n FROM cells),
        |j AS (SELECT cxy,
        |    (round(ln((cxy::HUGEINT * n)::DOUBLE
        |      / (cx::HUGEINT * cy)::DOUBLE) * 1000000.0))::BIGINT
        |      AS lt
        |  FROM cells JOIN rx USING (x) JOIN cy USING (y)
        |    CROSS JOIN tot),
        |mi AS (SELECT sum(cxy::HUGEINT * lt) AS misum FROM j),
        |hx AS (SELECT -sum(cx::HUGEINT *
        |    (round(ln(cx::DOUBLE / n::DOUBLE) * 1000000.0))::BIGINT)
        |    AS hsum, count(*)::BIGINT AS n_x
        |  FROM rx CROSS JOIN tot),
        |hy AS (SELECT -sum(cy::HUGEINT *
        |    (round(ln(cy::DOUBLE / n::DOUBLE) * 1000000.0))::BIGINT)
        |    AS hsum, count(*)::BIGINT AS n_y
        |  FROM cy CROSS JOIN tot),
        |f AS (SELECT n, n_x, n_y,
        |    (round(misum::DOUBLE / n::DOUBLE))::BIGINT AS mi_micro,
        |    (round(hx.hsum::DOUBLE / n::DOUBLE))::BIGINT AS hx_micro,
        |    (round(hy.hsum::DOUBLE / n::DOUBLE))::BIGINT AS hy_micro
        |  FROM mi, hx, hy, tot)
        |SELECT n, n_x, n_y, mi_micro, hx_micro, hy_micro,
        |  CASE WHEN hx_micro <= 0 OR hy_micro <= 0 THEN NULL ELSE
        |    (round(mi_micro::DOUBLE /
        |      sqrt(hx_micro::DOUBLE * hy_micro::DOUBLE)
        |      * 1000000.0))::BIGINT END AS nmi_micro
        |FROM f""".stripMargin,

    // McNemar: discordant-pair counts, χ² + continuity-corrected
    "q286_mcnemar" ->
      """WITH d AS (SELECT (n_chars > 300) AS pa,
        |    (len(string_split(text, ' ')) > 50) AS pb,
        |    (lang = 'en') AS y
        |  FROM documents),
        |m AS (SELECT count(*)::BIGINT AS n,
        |    sum(CASE WHEN pa = y AND pb <> y THEN 1 ELSE 0 END)
        |      ::BIGINT AS b_only,
        |    sum(CASE WHEN pa <> y AND pb = y THEN 1 ELSE 0 END)
        |      ::BIGINT AS c_only
        |  FROM d)
        |SELECT n, b_only, c_only,
        |  CASE WHEN b_only + c_only = 0 THEN NULL ELSE
        |    (round((b_only - c_only)::DOUBLE * (b_only - c_only)
        |      ::DOUBLE / (b_only + c_only)::DOUBLE * 1000000.0))
        |      ::BIGINT END AS chi2_micro,
        |  CASE WHEN b_only + c_only = 0 THEN NULL ELSE
        |    (round(greatest(abs(b_only - c_only) - 1, 0)::DOUBLE *
        |      greatest(abs(b_only - c_only) - 1, 0)::DOUBLE /
        |      (b_only + c_only)::DOUBLE * 1000000.0))::BIGINT END
        |    AS chi2_cc_micro
        |FROM m""".stripMargin,

    // RMST at τ=20: q241's KM chain + exact integer step areas off
    // the snapped micro survival
    "q287_rmst" ->
      """WITH d AS (SELECT user_id AS u,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS dd
        |  FROM events),
        |us AS (SELECT u, min(dd) AS f, max(dd) AS l FROM d GROUP BY 1),
        |h AS (SELECT max(l) AS h FROM us),
        |lt AS (SELECT (us.l - us.f + 1)::BIGINT AS t_day,
        |    (CASE WHEN us.l = h.h THEN 1 ELSE 0 END)::BIGINT AS cens
        |  FROM us, h),
        |pt AS (SELECT t_day, count(*)::BIGINT AS ends,
        |    (count(*) - sum(cens))::BIGINT AS n_churned
        |  FROM lt GROUP BY 1),
        |tot AS (SELECT sum(ends)::BIGINT AS n FROM pt),
        |ar AS (SELECT pt.*, (tot.n - coalesce(sum(ends) OVER
        |      (ORDER BY t_day ROWS BETWEEN UNBOUNDED PRECEDING
        |       AND 1 PRECEDING), 0))::BIGINT AS n_at_risk
        |  FROM pt, tot),
        |st AS (SELECT *, CASE WHEN n_churned = n_at_risk THEN NULL
        |    ELSE (round(ln(1.0 - n_churned::DOUBLE /
        |      n_at_risk::DOUBLE) * 1000000.0))::BIGINT END AS lnstep
        |  FROM ar),
        |fin AS (SELECT *,
        |    (sum(lnstep) OVER (ORDER BY t_day
        |      ROWS UNBOUNDED PRECEDING))::BIGINT AS lnsum,
        |    max(CASE WHEN lnstep IS NULL THEN 1 ELSE 0 END) OVER
        |      (ORDER BY t_day ROWS UNBOUNDED PRECEDING) AS dead
        |  FROM st),
        |sv AS (SELECT t_day, n_at_risk,
        |    (round((CASE WHEN dead = 1 THEN 0.0
        |      ELSE round(exp(lnsum::DOUBLE / 1000000.0), 6) END)
        |      * 1000000.0))::BIGINT AS sm,
        |    lead(t_day) OVER (ORDER BY t_day) AS nxt
        |  FROM fin),
        |ag AS (SELECT max(n_at_risk)::BIGINT AS n_users,
        |    min(t_day)::BIGINT AS t1,
        |    sum(sm * greatest(least(coalesce(nxt, 20), 20)
        |      - least(t_day, 20), 0))::BIGINT AS area
        |  FROM sv)
        |SELECT 20::BIGINT AS tau_day, n_users,
        |  (least(t1, 20) * 1000000 + area)::BIGINT AS rmst_micro
        |FROM ag""".stripMargin,

    // A-ES weighted sample: md5-uniform key ln(u)/w micro-snapped,
    // top-50 by (key desc, id)
    "q288_weighted_sample" ->
      """WITH d AS (SELECT event_id AS id,
        |    round(value * 100)::BIGINT AS w
        |  FROM events WHERE value IS NOT NULL
        |    AND round(value * 100) > 0),
        |k AS (SELECT id, w,
        |    (round(ln(((('0x' || substr(md5(id::VARCHAR || ':7'),
        |      1, 8))::UBIGINT)::BIGINT + 1)::DOUBLE / 4294967296.0)
        |      / w::DOUBLE * 1000000.0))::BIGINT AS key_micro
        |  FROM d)
        |SELECT id, w, key_micro FROM k
        |ORDER BY key_micro DESC, id LIMIT 50""".stripMargin,

    // ECE/MCE/Brier summary off q179's scoring chain: exact integer
    // bucket gaps, HUGEINT Brier moment, three closing divisions
    "q289_calibration_summary" ->
      """WITH lab AS (SELECT CASE WHEN text LIKE '%data%' THEN 1 ELSE 0
        |               END AS y, doc_id, text
        |             FROM documents WHERE lang IS NOT NULL),
        |t AS (SELECT y, unnest(string_split(text, ' ')) AS token
        |      FROM lab),
        |c AS (SELECT token,
        |        sum(CASE WHEN y = 1 THEN 1 ELSE 0 END)::BIGINT AS cp,
        |        sum(CASE WHEN y = 0 THEN 1 ELSE 0 END)::BIGINT AS cn
        |      FROM t GROUP BY 1),
        |tot AS (SELECT sum(cp)::BIGINT AS tp, sum(cn)::BIGINT AS tn,
        |          count(*)::BIGINT AS v FROM c),
        |d AS (SELECT sum(y)::BIGINT AS np,
        |        sum(1 - y)::BIGINT AS nn FROM lab),
        |w AS (SELECT token,
        |        (round((ln((cp + 1)::DOUBLE / (tp + v)::DOUBLE)
        |              - ln((cn + 1)::DOUBLE / (tn + v)::DOUBLE))
        |            * 1000000))::BIGINT AS wm
        |      FROM c CROSS JOIN tot),
        |bias AS (SELECT (round(ln(np::DOUBLE / nn::DOUBLE) * 1000000))
        |           ::BIGINT AS b FROM d),
        |dt AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |       FROM documents),
        |pd AS (SELECT doc_id, count(*)::BIGINT AS n_tokens,
        |         sum(coalesce(wm, 0))::BIGINT AS ws
        |       FROM dt LEFT JOIN w USING (token) GROUP BY 1),
        |sc AS (SELECT pd.doc_id,
        |         round((b::DOUBLE + (CASE WHEN n_tokens = 0 THEN 0.0
        |           ELSE ws::DOUBLE / n_tokens::DOUBLE END))
        |           / 1000000.0, 6) AS logit
        |       FROM pd CROSS JOIN bias),
        |cf AS (SELECT doc_id, 1.0 / (1.0 + exp(-logit)) AS conf
        |       FROM sc),
        |bk AS (SELECT least(floor(conf * 10.0), 9.0)::BIGINT AS bucket,
        |         (round(conf * 1000000.0))::BIGINT AS cm,
        |         CASE WHEN documents.text LIKE '%data%' THEN 1 ELSE 0
        |           END AS y
        |       FROM cf JOIN documents USING (doc_id)),
        |br AS (SELECT count(*)::BIGINT AS n,
        |    sum((cm - y * 1000000)::HUGEINT *
        |        (cm - y * 1000000)::HUGEINT) AS bsum
        |  FROM bk),
        |bks AS (SELECT bucket, count(*)::BIGINT AS bn,
        |    sum(y)::BIGINT AS np, sum(cm)::BIGINT AS cs
        |  FROM bk GROUP BY 1),
        |e AS (SELECT sum(abs(np * 1000000 - cs))::BIGINT AS gapsum,
        |    max((round(abs(np * 1000000 - cs)::DOUBLE / bn::DOUBLE))
        |      ::BIGINT) AS mce_micro
        |  FROM bks)
        |SELECT n,
        |  (round(gapsum::DOUBLE / n::DOUBLE))::BIGINT AS ece_micro,
        |  mce_micro,
        |  (round(bsum::DOUBLE / n::DOUBLE / 1000000.0))::BIGINT
        |    AS brier_micro
        |FROM br, e""".stripMargin,

    // Persisted BM25 index (write half + append half + bucket-pruned
    // serve) must equal in-memory BM25 over the full corpus — q78's
    // oracle IS the oracle
    "q290_bm25_index" -> bm25Sql("documents"),

    // BM25 tombstone/compaction lifecycle: serving after deletes must
    // equal in-memory BM25 over the survivors only
    "q291_bm25_index_delete" -> bm25Sql(
      "(SELECT * FROM documents WHERE doc_id % 7 <> 0)"),

    // Quantile normalization: group midrank fractions contained in
    // pooled cumulative intervals, cross-multiplied exact integers
    "q293_signed_index_lifecycle" -> q293,

    // ANN index lifecycle: q18's bucket/cosine chains over the
    // survivors only
    "q307_ann_index_lifecycle" -> q307,

    // stratified log-rank + pooled HR: q278 with one more grouping key
    "q308_stratified_logrank" -> q308StratifiedSql,

    // Mondrian k-anonymity generalizer: three unrolled median-cut
    // rounds over the (value-cent, user-cohort) quasi-id space
    "q309_mondrian" -> q309MondrianSql,

    // CMH stratified 2x2 + MH common OR + RBG CI
    "q310_cmh" -> q310CmhSql,

    // Adjusted Rand Index: pair-counting cluster-vs-truth agreement
    "q311_ari" -> q311AriSql,

    // Hilbert curve: the xy2d walk unrolled level for level
    "q312_hilbert" -> q312HilbertSql,

    // 3-D Hilbert (Skilling transpose), step-unrolled
    "q322_hilbert3d" -> q322Hilbert3dSql,

    // unigram-LM learn: seeding + one unrolled-Viterbi hard-EM round
    "q325_unigram_learn" -> q325UnigramLearnSql,

    // AIPW doubly-robust effect: three logistic fits + the
    // augmented fold
    "q327_aipw" -> q327AipwSql,

    // takedown audit: membership flags replay from the subset
    // constructions; the gone certificate is require'd in-query and
    // pinned constant here
    "q328_takedown" ->
      """SELECT d.doc_id,
        |  (d.doc_id % 2 = 0) AS in_bm25, true AS gone_bm25,
        |  (d.doc_id IN (SELECT vec_id FROM embeddings
        |     WHERE vec_id % 2 = 0)) AS in_ann, true AS gone_ann,
        |  (d.doc_id IN (SELECT vec_id FROM embeddings
        |     WHERE vec_id % 5 <> 0)) AS in_pq, true AS gone_pq,
        |  (d.doc_id % 3 = 0) AS in_signed, true AS gone_signed
        |FROM documents d WHERE d.doc_id % 13 = 0""".stripMargin,

    // corpus-side takedown: membership flags replay from the subset
    // constructions (pool = ids not divisible by 3, bm25 = evens);
    // the gone certificate and the survivor rows are require'd
    // in-query and pinned constant here
    "q331_corpus_takedown" ->
      """SELECT d.doc_id,
        |  (d.doc_id % 2 = 0) AS in_bm25, true AS gone_bm25,
        |  (d.doc_id % 3 <> 0) AS in_pool, true AS gone_pool
        |FROM documents d WHERE d.doc_id % 11 = 0""".stripMargin,

    // drift repair across all four index families + the DocPool
    // corpus: before-numbers are set algebra over the constructions
    // (corpora drop every 7th id; families hold evens / thirds /
    // non-fifths / evens / non-fifths); the after-numbers are
    // require'd zero in-query and pinned here
    "q332_drift_repair" ->
      """WITH corp AS (SELECT doc_id AS id FROM documents
        |    WHERE doc_id % 7 <> 0),
        |vcorp AS (SELECT vec_id AS id FROM embeddings
        |    WHERE vec_id % 7 <> 0),
        |bm AS (SELECT doc_id AS id FROM documents WHERE doc_id % 2 = 0),
        |sg AS (SELECT doc_id AS id FROM documents WHERE doc_id % 3 = 0),
        |an AS (SELECT vec_id AS id FROM embeddings WHERE vec_id % 2 = 0),
        |pq AS (SELECT vec_id AS id FROM embeddings WHERE vec_id % 5 <> 0),
        |pl AS (SELECT doc_id AS id FROM documents WHERE doc_id % 5 <> 0),
        |fam(family) AS (VALUES ('bm25'), ('signed'), ('ann'), ('pq'),
        |  ('pool'))
        |SELECT f.family,
        |  (CASE f.family WHEN 'bm25' THEN (SELECT count(*) FROM corp)
        |     WHEN 'signed' THEN (SELECT count(*) FROM corp)
        |     WHEN 'pool' THEN (SELECT count(*) FROM corp)
        |     WHEN 'ann' THEN (SELECT count(*) FROM vcorp)
        |     ELSE (SELECT count(*) FROM vcorp) END)::BIGINT AS n_corpus,
        |  (CASE f.family WHEN 'bm25' THEN (SELECT count(*) FROM bm)
        |     WHEN 'signed' THEN (SELECT count(*) FROM sg)
        |     WHEN 'pool' THEN (SELECT count(*) FROM pl)
        |     WHEN 'ann' THEN (SELECT count(*) FROM an)
        |     ELSE (SELECT count(*) FROM pq) END)::BIGINT AS n_index,
        |  (CASE f.family
        |     WHEN 'bm25' THEN (SELECT count(*) FROM corp
        |       WHERE id NOT IN (SELECT id FROM bm))
        |     WHEN 'signed' THEN (SELECT count(*) FROM corp
        |       WHERE id NOT IN (SELECT id FROM sg))
        |     WHEN 'pool' THEN (SELECT count(*) FROM corp
        |       WHERE id NOT IN (SELECT id FROM pl))
        |     WHEN 'ann' THEN (SELECT count(*) FROM vcorp
        |       WHERE id NOT IN (SELECT id FROM an))
        |     ELSE (SELECT count(*) FROM vcorp
        |       WHERE id NOT IN (SELECT id FROM pq)) END)::BIGINT
        |    AS n_missing,
        |  (CASE f.family
        |     WHEN 'bm25' THEN (SELECT count(*) FROM bm
        |       WHERE id NOT IN (SELECT id FROM corp))
        |     WHEN 'signed' THEN (SELECT count(*) FROM sg
        |       WHERE id NOT IN (SELECT id FROM corp))
        |     WHEN 'pool' THEN (SELECT count(*) FROM pl
        |       WHERE id NOT IN (SELECT id FROM corp))
        |     WHEN 'ann' THEN (SELECT count(*) FROM an
        |       WHERE id NOT IN (SELECT id FROM vcorp))
        |     ELSE (SELECT count(*) FROM pq
        |       WHERE id NOT IN (SELECT id FROM vcorp)) END)::BIGINT
        |    AS n_extra,
        |  0::BIGINT AS n_missing_after, 0::BIGINT AS n_extra_after
        |FROM fam f""".stripMargin,

    // docpool upsert: final corpus = v1 evens not divisible by 3 +
    // v2 thirds (n_chars + 1e6); row set + snapshot require'd
    // in-query, the aggregate replayed here
    "q333_docpool_upsert" ->
      """WITH fin AS (
        |  SELECT doc_id, n_chars FROM documents
        |    WHERE doc_id % 2 = 0 AND doc_id % 3 <> 0
        |  UNION ALL
        |  SELECT doc_id, n_chars + 1000000 FROM documents
        |    WHERE doc_id % 3 = 0)
        |SELECT count(*)::BIGINT AS n_docs,
        |  sum(n_chars)::BIGINT AS sum_chars,
        |  sum(CASE WHEN n_chars >= 1000000 THEN 1 ELSE 0 END)::BIGINT
        |    AS n_v2
        |FROM fin""".stripMargin,

    // index drift: set algebra over the gate's constructions —
    // index ids = evens minus every 10th; corpus = all minus every 7th
    "q329_index_drift" ->
      """WITH idx AS (SELECT doc_id FROM documents
        |    WHERE doc_id % 2 = 0 AND doc_id % 10 <> 0),
        |corp AS (SELECT doc_id FROM documents WHERE doc_id % 7 <> 0)
        |SELECT (SELECT count(*) FROM corp)::BIGINT AS n_corpus,
        |  (SELECT count(*) FROM idx)::BIGINT AS n_index,
        |  (SELECT count(*) FROM corp WHERE doc_id NOT IN
        |    (SELECT doc_id FROM idx))::BIGINT AS n_missing,
        |  (SELECT count(*) FROM idx WHERE doc_id NOT IN
        |    (SELECT doc_id FROM corp))::BIGINT AS n_extra""".stripMargin,

    // unigram-LM apply under the gate fixture
    "q326_unigram_apply" -> q326UnigramApplySql,

    // unigram-LM: the EM loop iterating (two unrolled rounds)
    "q330_unigram_em2" -> q330UnigramEm2Sql,

    // bloom skipping gate: layout-invariant ground truth (pruning
    // numbers are require'd in-query — file boundaries are not
    // SQL-expressible)
    "q324_bloom_skipping" ->
      """SELECT count(*)::BIGINT AS n_rows,
        |  sum(CASE WHEN event_id IN (7, 1013, 4099)
        |    THEN 1 ELSE 0 END)::BIGINT AS n_rows_matched,
        |  count(DISTINCT CASE WHEN event_id IN (7, 1013, 4099)
        |    THEN event_id END)::BIGINT AS n_probes_found
        |FROM events""".stripMargin,

    // layout gate: the RESULT row is layout-invariant ground truth
    // (the read-amp improvement is require'd in-query — file
    // boundaries are not SQL-expressible)
    "q323_layout_skipping" ->
      """SELECT count(*)::BIGINT AS n_rows,
        |  sum(CASE WHEN (user_id % 64) BETWEEN 24 AND 31
        |    THEN 1 ELSE 0 END)::BIGINT AS matched_x,
        |  sum(CASE WHEN (event_id % 64) BETWEEN 24 AND 31
        |    THEN 1 ELSE 0 END)::BIGINT AS matched_y,
        |  sum(CASE WHEN (((round(value * 100)::BIGINT % 64) + 64) % 64)
        |    BETWEEN 24 AND 31 THEN 1 ELSE 0 END)::BIGINT AS matched_z
        |FROM events WHERE value IS NOT NULL""".stripMargin,

    // two-sample KS: exact supremum + asymptotic p
    "q313_ks" -> q313KsSql,

    // mSPRT anytime-valid A/B monitor: running-min p path
    "q314_msprt" -> q314MsprtSql,

    // Cohen's h + Wilson intervals on q295's conversion cells
    "q320_proportion_effect" ->
      """WITH u AS (SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      ::BIGINT AS converted
        |  FROM events GROUP BY 1),
        |m AS (SELECT
        |    sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT
        |      AS n_a,
        |    sum(CASE WHEN user_id % 2 = 0 THEN converted ELSE 0 END)
        |      ::BIGINT AS x_a,
        |    sum(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END)::BIGINT
        |      AS n_b,
        |    sum(CASE WHEN user_id % 2 <> 0 THEN converted ELSE 0 END)
        |      ::BIGINT AS x_b
        |  FROM u),
        |c AS (SELECT n_a, x_a, n_b, x_b,
        |    x_a::DOUBLE / n_a::DOUBLE AS pa,
        |    x_b::DOUBLE / n_b::DOUBLE AS pb,
        |    1.959964 * 1.959964 AS z2
        |  FROM m)
        |SELECT n_a, x_a, n_b, x_b,
        |  CASE WHEN n_a = 0 OR n_b = 0 THEN NULL ELSE
        |    (round((2.0 * asin(sqrt(pa)) - 2.0 * asin(sqrt(pb)))
        |      * 1000000.0))::BIGINT END AS h_micro,
        |  CASE WHEN n_a = 0 THEN NULL ELSE
        |    (round((pa + z2 / (2.0 * n_a::DOUBLE) - 1.959964 *
        |      sqrt(pa * (1.0 - pa) / n_a::DOUBLE +
        |        z2 / (4.0 * n_a::DOUBLE * n_a::DOUBLE))) /
        |      (1.0 + z2 / n_a::DOUBLE) * 1000000.0))::BIGINT
        |    END AS lo_a_micro,
        |  CASE WHEN n_a = 0 THEN NULL ELSE
        |    (round((pa + z2 / (2.0 * n_a::DOUBLE) + 1.959964 *
        |      sqrt(pa * (1.0 - pa) / n_a::DOUBLE +
        |        z2 / (4.0 * n_a::DOUBLE * n_a::DOUBLE))) /
        |      (1.0 + z2 / n_a::DOUBLE) * 1000000.0))::BIGINT
        |    END AS hi_a_micro,
        |  CASE WHEN n_b = 0 THEN NULL ELSE
        |    (round((pb + z2 / (2.0 * n_b::DOUBLE) - 1.959964 *
        |      sqrt(pb * (1.0 - pb) / n_b::DOUBLE +
        |        z2 / (4.0 * n_b::DOUBLE * n_b::DOUBLE))) /
        |      (1.0 + z2 / n_b::DOUBLE) * 1000000.0))::BIGINT
        |    END AS lo_b_micro,
        |  CASE WHEN n_b = 0 THEN NULL ELSE
        |    (round((pb + z2 / (2.0 * n_b::DOUBLE) + 1.959964 *
        |      sqrt(pb * (1.0 - pb) / n_b::DOUBLE +
        |        z2 / (4.0 * n_b::DOUBLE * n_b::DOUBLE))) /
        |      (1.0 + z2 / n_b::DOUBLE) * 1000000.0))::BIGINT
        |    END AS hi_b_micro
        |FROM c""".stripMargin,

    // BM25 index time travel: the retained pre-delete snapshot serves
    // full-corpus BM25, the ruling snapshot survivors-only — both
    // replayed by q78's parameterized SQL and tagged
    "q321_bm25_time_travel" ->
      s"""SELECT 'pre_delete' AS snapshot, query_id, doc_id, rank,
         |  score_pico
         |FROM (${bm25Sql("documents")})
         |UNION ALL
         |SELECT 'post_delete' AS snapshot, query_id, doc_id, rank,
         |  score_pico
         |FROM (${bm25Sql(
        "(SELECT * FROM documents WHERE doc_id % 5 <> 0)")})""".stripMargin,

    // Holm step-down: q301's hypothesis chain with the family-wise cut
    "q319_holm" ->
      """WITH e AS (SELECT user_id % 20 AS cohort, event_type AS c
        |  FROM events WHERE event_type IS NOT NULL),
        |cells AS (SELECT cohort, c, count(*)::BIGINT AS o
        |  FROM e GROUP BY 1, 2),
        |g AS (SELECT cohort, sum(o)::BIGINT AS ng FROM cells
        |  GROUP BY 1),
        |cat AS (SELECT c, sum(o)::BIGINT AS nc FROM cells GROUP BY 1),
        |kk AS (SELECT count(*)::BIGINT AS k, sum(nc)::BIGINT AS n
        |  FROM cat),
        |grid AS (SELECT g.cohort, g.ng,
        |    coalesce(cells.o, 0)::BIGINT AS o,
        |    g.ng::DOUBLE * cat.nc::DOUBLE / kk.n::DOUBLE AS ex, kk.k
        |  FROM g CROSS JOIN cat CROSS JOIN kk
        |  LEFT JOIN cells ON cells.cohort = g.cohort
        |    AND cells.c = cat.c),
        |chi AS (SELECT cohort, min(ng)::BIGINT AS n,
        |    min(k)::BIGINT AS k,
        |    sum((round((o::DOUBLE - ex) * (o::DOUBLE - ex) / ex
        |      * 1000000.0))::BIGINT)::BIGINT AS chi2_micro
        |  FROM grid GROUP BY 1),
        |p AS (SELECT cohort, n, chi2_micro, (k - 1)::INTEGER AS df,
        |    (round(exp(-(chi2_micro::DOUBLE / 2000000.0)) *
        |      (1.0 + chi2_micro::DOUBLE / 2000000.0) * 1000000.0))
        |      ::BIGINT AS p_micro
        |  FROM chi),
        |r AS (SELECT *, row_number() OVER (ORDER BY p_micro, cohort)
        |    AS rk, count(*) OVER () AS m FROM p),
        |kf AS (SELECT min(CASE WHEN
        |      p_micro::HUGEINT * (m - rk + 1) > 100000
        |    THEN rk END) AS kfail FROM r)
        |SELECT cohort, n, chi2_micro, df, p_micro,
        |  rk::INTEGER AS rank,
        |  (kf.kfail IS NULL OR rk < kf.kfail) AS discovered
        |FROM r, kf""".stripMargin,

    // IPW treatment effect: q296's propensity weights nested, q297's
    // scoring chain, clipped inverse-propensity arm sums
    "q318_ipw" ->
      s"""WITH wts AS ($q296LogisticSql),
        |t AS (SELECT doc_id,
        |    CASE WHEN text LIKE '%data%' THEN 1 ELSE 0 END AS tt,
        |    CASE WHEN n_chars > 300 THEN 1 ELSE 0 END AS y,
        |    string_split(text, ' ') AS w
        |  FROM documents),
        |e AS (SELECT doc_id, u.tok FROM t, unnest(w) AS u(tok)),
        |hh AS (SELECT doc_id,
        |    (('0x' || substr(md5('hf:' || tok), 1, 8))
        |      ::UBIGINT)::BIGINT AS hv
        |  FROM e),
        |f AS (SELECT * FROM (
        |    SELECT doc_id, hv % 8 AS idx,
        |      sum(CASE WHEN (hv // 65536) % 2 = 0 THEN 1 ELSE -1 END)
        |        ::BIGINT AS x
        |    FROM hh GROUP BY 1, 2) WHERE x <> 0),
        |dot AS (SELECT f.doc_id, sum(f.x * wts.w_micro)::BIGINT
        |      AS dot
        |  FROM f JOIN wts ON wts.idx = f.idx AND wts.idx >= 0
        |  GROUP BY 1),
        |b AS (SELECT w_micro AS b FROM wts WHERE idx = -1),
        |sc AS (SELECT t.doc_id, t.tt, t.y,
        |    (round(1000000.0 / (1.0 +
        |      exp(-(coalesce(dot.dot, 0) + b.b)::DOUBLE
        |        / 1000000.0))))::BIGINT AS s
        |  FROM t LEFT JOIN dot USING (doc_id) CROSS JOIN b),
        |cl AS (SELECT tt, y,
        |    least(greatest(s, 10000), 990000)::BIGINT AS ee
        |  FROM sc),
        |terms AS (SELECT tt,
        |    CASE WHEN tt = 1 THEN (round(y::DOUBLE *
        |      1000000000000.0 / ee::DOUBLE))::BIGINT ELSE 0 END AS t1,
        |    CASE WHEN tt = 0 THEN (round(y::DOUBLE *
        |      1000000000000.0 / (1000000 - ee)::DOUBLE))::BIGINT
        |      ELSE 0 END AS t0
        |  FROM cl),
        |m AS (SELECT count(*)::BIGINT AS n, sum(tt)::BIGINT
        |      AS n_treated,
        |    sum(t1)::BIGINT AS s1, sum(t0)::BIGINT AS s0 FROM terms)
        |SELECT n, n_treated,
        |  (round(s1::DOUBLE / n::DOUBLE))::BIGINT AS mu1_micro,
        |  (round(s0::DOUBLE / n::DOUBLE))::BIGINT AS mu0_micro,
        |  (round((s1 - s0)::DOUBLE / n::DOUBLE))::BIGINT AS ate_micro
        |FROM m""".stripMargin,

    // Kish effective sample size of the length-weighted corpus
    "q317_kish_neff" ->
      """WITH m AS (SELECT count(*)::BIGINT AS n,
        |    sum(n_chars)::BIGINT AS sum_w,
        |    sum(n_chars::HUGEINT * n_chars::HUGEINT)::HUGEINT AS sw2
        |  FROM documents WHERE n_chars IS NOT NULL)
        |SELECT n, sum_w,
        |  CASE WHEN sum_w <= 0 THEN NULL ELSE
        |    (round((sum_w::HUGEINT * sum_w::HUGEINT)::DOUBLE /
        |      sw2::DOUBLE * 1000000.0))::BIGINT END AS n_eff_micro,
        |  CASE WHEN sum_w <= 0 THEN NULL ELSE
        |    (round(n::DOUBLE / ((sum_w::HUGEINT * sum_w::HUGEINT)
        |      ::DOUBLE / sw2::DOUBLE) * 1000000.0))::BIGINT
        |    END AS deff_micro
        |FROM m""".stripMargin,

    // Poisson dispersion: exact integer chi2 + Wilson-Hilferty z
    "q316_poisson_dispersion" ->
      """WITH p AS (SELECT user_id, count(*)::BIGINT AS x
        |  FROM events GROUP BY 1),
        |m AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sum_x,
        |    sum(x::HUGEINT * x::HUGEINT)::HUGEINT AS sx2
        |  FROM p),
        |c AS (SELECT n, sum_x,
        |    (n::HUGEINT * sx2 - sum_x::HUGEINT * sum_x::HUGEINT)
        |      ::DOUBLE / sum_x::DOUBLE AS chi2,
        |    n::DOUBLE - 1.0 AS nu
        |  FROM m)
        |SELECT n, sum_x,
        |  CASE WHEN n < 2 OR sum_x <= 0 THEN NULL ELSE
        |    (round(chi2 / nu * 1000000.0))::BIGINT
        |    END AS dispersion_micro,
        |  CASE WHEN n < 2 OR sum_x <= 0 THEN NULL ELSE
        |    (round(chi2 * 1000000.0))::BIGINT END AS chi2_micro,
        |  CASE WHEN n < 2 OR sum_x <= 0 THEN NULL ELSE
        |    (round((pow(chi2 / nu, 1.0 / 3.0) -
        |      (1.0 - 2.0 / (9.0 * nu))) / sqrt(2.0 / (9.0 * nu))
        |      * 1000000.0))::BIGINT END AS z_micro
        |FROM c""".stripMargin,

    // DP count release: md5-keyed inverse-CDF Laplace noise
    "q315_dp_counts" ->
      """WITH g AS (SELECT event_type, count(*)::BIGINT AS n
        |  FROM events WHERE event_type IS NOT NULL GROUP BY 1),
        |h AS (SELECT event_type, n,
        |    (('0x' || substr(md5('graft-dp:' || event_type), 1, 13))
        |      ::UBIGINT)::BIGINT AS hv
        |  FROM g),
        |u AS (SELECT event_type, n,
        |    least(greatest(hv::DOUBLE / 4503599627370496.0,
        |      1.0 / 4503599627370496.0),
        |      1.0 - 1.0 / 4503599627370496.0) - 0.5 AS t
        |  FROM h)
        |SELECT event_type, n,
        |  (n + (round(-1.0 * sign(t) *
        |    ln(1.0 - 2.0 * abs(t))))::BIGINT)::BIGINT AS noisy_n
        |FROM u""".stripMargin,

    // k-anonymity/l-diversity: equivalence-class fold + summary row
    "q306_k_anonymity" ->
      """WITH d AS (SELECT event_type AS q0,
        |    ((round(value * 100)::BIGINT % 10 + 10) % 10)
        |      ::BIGINT AS q1,
        |    ((CAST(floor(epoch(ts)) AS BIGINT) // 86400) % 7)
        |      ::BIGINT AS q2,
        |    (user_id % 50)::BIGINT AS s
        |  FROM events WHERE value IS NOT NULL),
        |g AS (SELECT q0, q1, q2, count(*)::BIGINT AS n,
        |    count(DISTINCT s)::BIGINT AS ls
        |  FROM d GROUP BY 1, 2, 3)
        |SELECT sum(n)::BIGINT AS n_rows, count(*)::BIGINT AS n_groups,
        |  5::BIGINT AS k, 3::BIGINT AS l,
        |  sum(CASE WHEN n < 5 THEN 1 ELSE 0 END)::BIGINT
        |    AS n_groups_under_k,
        |  sum(CASE WHEN n < 5 THEN n ELSE 0 END)::BIGINT
        |    AS n_rows_under_k,
        |  min(n)::BIGINT AS min_group,
        |  sum(CASE WHEN ls < 3 THEN 1 ELSE 0 END)::BIGINT
        |    AS n_groups_under_l
        |FROM g""".stripMargin,

    // Morton z-order: the exact unrolled bit interleave
    "q305_zorder" ->
      """WITH d AS (SELECT event_id,
        |    (user_id % 1024)::BIGINT AS x,
        |    (event_id % 1024)::BIGINT AS y
        |  FROM events),
        |z AS (SELECT event_id, x, y,
        |    (
        |    (((x >> 0) & 1) << 0) | (((y >> 0) & 1) << 1) | (((x >>
        |      1) & 1) << 2) | (((y >> 1) & 1) << 3) | (((x >> 2) & 1)
        |      << 4) | (((y >> 2) & 1) << 5) | (((x >> 3) & 1) << 6) |
        |      (((y >> 3) & 1) << 7) | (((x >> 4) & 1) << 8) | (((y >>
        |      4) & 1) << 9) | (((x >> 5) & 1) << 10) | (((y >> 5) & 1)
        |      << 11) | (((x >> 6) & 1) << 12) | (((y >> 6) & 1) << 13)
        |      | (((x >> 7) & 1) << 14) | (((y >> 7) & 1) << 15) | (((x
        |      >> 8) & 1) << 16) | (((y >> 8) & 1) << 17) | (((x >> 9)
        |      & 1) << 18) | (((y >> 9) & 1) << 19)
        |    )::BIGINT AS z
        |  FROM d)
        |SELECT event_id, x, y, z FROM z
        |ORDER BY z, event_id LIMIT 50""".stripMargin,

    // BY-FDR: q259's chain with the harmonic factor, cross-multiplied
    "q301_by_fdr" ->
      """WITH e AS (SELECT user_id % 20 AS cohort, event_type AS c
        |  FROM events WHERE event_type IS NOT NULL),
        |cells AS (SELECT cohort, c, count(*)::BIGINT AS o
        |  FROM e GROUP BY 1, 2),
        |g AS (SELECT cohort, sum(o)::BIGINT AS ng FROM cells
        |  GROUP BY 1),
        |cat AS (SELECT c, sum(o)::BIGINT AS nc FROM cells GROUP BY 1),
        |kk AS (SELECT count(*)::BIGINT AS k, sum(nc)::BIGINT AS n
        |  FROM cat),
        |grid AS (SELECT g.cohort, g.ng,
        |    coalesce(cells.o, 0)::BIGINT AS o,
        |    g.ng::DOUBLE * cat.nc::DOUBLE / kk.n::DOUBLE AS ex, kk.k
        |  FROM g CROSS JOIN cat CROSS JOIN kk
        |  LEFT JOIN cells ON cells.cohort = g.cohort
        |    AND cells.c = cat.c),
        |chi AS (SELECT cohort, min(ng)::BIGINT AS n,
        |    min(k)::BIGINT AS k,
        |    sum((round((o::DOUBLE - ex) * (o::DOUBLE - ex) / ex
        |      * 1000000.0))::BIGINT)::BIGINT AS chi2_micro
        |  FROM grid GROUP BY 1),
        |p AS (SELECT cohort, n, chi2_micro, (k - 1)::INTEGER AS df,
        |    (round(exp(-(chi2_micro::DOUBLE / 2000000.0)) *
        |      (1.0 + chi2_micro::DOUBLE / 2000000.0) * 1000000.0))
        |      ::BIGINT AS p_micro
        |  FROM chi),
        |r AS (SELECT *, row_number() OVER (ORDER BY p_micro, cohort)
        |    AS rk, count(*) OVER () AS m FROM p),
        |hm AS (SELECT sum((round(1000000.0 / rk::DOUBLE))::BIGINT)
        |    ::BIGINT AS hm FROM r),
        |ks AS (SELECT coalesce(max(rk), 0) AS kstar FROM r, hm
        |  WHERE p_micro::HUGEINT * m * hm.hm
        |    <= rk::HUGEINT * 100000 * 1000000)
        |SELECT cohort, n, chi2_micro, df, p_micro,
        |  rk::INTEGER AS rank, (rk <= ks.kstar) AS discovered
        |FROM r, ks""".stripMargin,

    // hazard ratio: q278's moments through the one-step Pike chain
    "q302_hazard_ratio" ->
      s"""WITH lr AS ($q278LogRankSql)
        |SELECT n_users, n_a,
        |  CASE WHEN v_micro <= 0 THEN NULL ELSE
        |    (round(exp((o_a * 1000000 - e_a_micro)::DOUBLE
        |      / v_micro::DOUBLE) * 1000000.0))::BIGINT END
        |    AS hr_micro,
        |  CASE WHEN v_micro <= 0 THEN NULL ELSE
        |    (round(exp((o_a * 1000000 - e_a_micro)::DOUBLE
        |        / v_micro::DOUBLE
        |      - 1.959964 * sqrt(1000000.0 / v_micro::DOUBLE))
        |      * 1000000.0))::BIGINT END AS lo_micro,
        |  CASE WHEN v_micro <= 0 THEN NULL ELSE
        |    (round(exp((o_a * 1000000 - e_a_micro)::DOUBLE
        |        / v_micro::DOUBLE
        |      + 1.959964 * sqrt(1000000.0 / v_micro::DOUBLE))
        |      * 1000000.0))::BIGINT END AS hi_micro
        |FROM lr""".stripMargin,

    // odds ratio: exact 2×2 cells, Woolf logit CI
    "q303_odds_ratio" ->
      """WITH m AS (SELECT
        |    sum(CASE WHEN n_chars > 300 AND lang = 'en' THEN 1
        |      ELSE 0 END)::BIGINT AS a,
        |    sum(CASE WHEN n_chars > 300 AND NOT lang = 'en' THEN 1
        |      ELSE 0 END)::BIGINT AS b,
        |    sum(CASE WHEN NOT n_chars > 300 AND lang = 'en' THEN 1
        |      ELSE 0 END)::BIGINT AS c,
        |    sum(CASE WHEN NOT n_chars > 300 AND NOT lang = 'en'
        |      THEN 1 ELSE 0 END)::BIGINT AS d
        |  FROM documents)
        |SELECT a, b, c, d,
        |  CASE WHEN a = 0 OR b = 0 OR c = 0 OR d = 0 THEN NULL ELSE
        |    (round((a::DOUBLE * d::DOUBLE) / (b::DOUBLE * c::DOUBLE)
        |      * 1000000.0))::BIGINT END AS or_micro,
        |  CASE WHEN a = 0 OR b = 0 OR c = 0 OR d = 0 THEN NULL ELSE
        |    (round(exp(ln((a::DOUBLE * d::DOUBLE)
        |        / (b::DOUBLE * c::DOUBLE))
        |      - 1.959964 * sqrt(1.0 / a::DOUBLE + 1.0 / b::DOUBLE
        |        + 1.0 / c::DOUBLE + 1.0 / d::DOUBLE)) * 1000000.0))
        |      ::BIGINT END AS lo_micro,
        |  CASE WHEN a = 0 OR b = 0 OR c = 0 OR d = 0 THEN NULL ELSE
        |    (round(exp(ln((a::DOUBLE * d::DOUBLE)
        |        / (b::DOUBLE * c::DOUBLE))
        |      + 1.959964 * sqrt(1.0 / a::DOUBLE + 1.0 / b::DOUBLE
        |        + 1.0 / c::DOUBLE + 1.0 / d::DOUBLE)) * 1000000.0))
        |      ::BIGINT END AS hi_micro
        |FROM m""".stripMargin,

    // Poisson rate ratio: per-user counts/active-days, log-linear z
    "q304_poisson_rate" ->
      """WITH pu AS (SELECT user_id, count(*)::BIGINT AS c,
        |    count(DISTINCT CAST(floor(epoch(ts)) AS BIGINT) // 86400)
        |      ::BIGINT AS e
        |  FROM events GROUP BY 1),
        |m AS (SELECT
        |    sum(CASE WHEN user_id % 2 = 0 THEN c ELSE 0 END)::BIGINT
        |      AS c_a,
        |    sum(CASE WHEN user_id % 2 = 0 THEN e ELSE 0 END)::BIGINT
        |      AS e_a,
        |    sum(CASE WHEN user_id % 2 = 0 THEN 0 ELSE c END)::BIGINT
        |      AS c_b,
        |    sum(CASE WHEN user_id % 2 = 0 THEN 0 ELSE e END)::BIGINT
        |      AS e_b
        |  FROM pu)
        |SELECT c_a, e_a, c_b, e_b,
        |  CASE WHEN c_a = 0 OR c_b = 0 OR e_a = 0 OR e_b = 0
        |    THEN NULL ELSE
        |    (round((c_a::DOUBLE / e_a::DOUBLE)
        |      / (c_b::DOUBLE / e_b::DOUBLE) * 1000000.0))::BIGINT END
        |    AS rr_micro,
        |  CASE WHEN c_a = 0 OR c_b = 0 OR e_a = 0 OR e_b = 0
        |    THEN NULL ELSE
        |    (round(ln((c_a::DOUBLE / e_a::DOUBLE)
        |        / (c_b::DOUBLE / e_b::DOUBLE))
        |      / sqrt(1.0 / c_a::DOUBLE + 1.0 / c_b::DOUBLE)
        |      * 1000000.0))::BIGINT END AS z_micro
        |FROM m""".stripMargin,

    // q300 flagship: q145's RRF with the dense leg through q18's
    // BUCKETED ANN arithmetic — both legs replay the persisted-index
    // serving exactly
    "q300_persisted_hybrid" -> {
      val dim = 64
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w
         |           FROM documents),
         |ix AS (SELECT doc_id, greatest(len(w), 0) AS dl,
         |        unnest(w) AS term FROM d),
         |tf AS (SELECT doc_id, term, count(*) AS tf, min(dl) AS dl
         |       FROM ix GROUP BY doc_id, term),
         |st AS (SELECT count(*)::BIGINT AS n,
         |        (sum(dl)::DOUBLE / count(*)::DOUBLE) AS avgdl
         |       FROM (SELECT doc_id, min(dl) AS dl FROM tf
         |             GROUP BY doc_id)),
         |dfq AS (SELECT term, count(*) AS dfc FROM tf GROUP BY term),
         |idf AS (SELECT term,
         |        round(ln(((n - dfc)::DOUBLE + 0.5) /
         |          (dfc::DOUBLE + 0.5) + 1.0) * 1000000.0)::BIGINT
         |          AS idf_micro
         |       FROM dfq, st),
         |q AS (SELECT * FROM (VALUES
         |        (1::BIGINT, 'spark'), (1, 'join'), (1, 'window'),
         |        (2, 'slow'), (2, 'query'), (2, 'filter'),
         |        (3, 'customer'), (3, 'order'), (3, 'the'))
         |        AS v(query_id, term)),
         |qi AS (SELECT q.query_id, q.term, idf.idf_micro
         |       FROM q JOIN idf USING (term)),
         |sc AS (SELECT qi.query_id, tf.doc_id,
         |        (qi.idf_micro *
         |         round(((tf.tf::DOUBLE * ${1.2 + 1.0}) /
         |           (tf.tf::DOUBLE + ${1.2} * (${1.0 - 0.75} +
         |            ${0.75} * (tf.dl::DOUBLE / st.avgdl))))
         |           * 1000000.0)::BIGINT) AS s
         |       FROM tf JOIN qi USING (term), st),
         |ag AS (SELECT query_id, doc_id, sum(s)::BIGINT AS score_pico
         |       FROM sc GROUP BY query_id, doc_id),
         |br AS (SELECT query_id, doc_id, score_pico,
         |        row_number() OVER (PARTITION BY query_id
         |          ORDER BY score_pico DESC, doc_id ASC) AS rn FROM ag),
         |bm AS (SELECT query_id AS qid, doc_id AS id, rn AS rank
         |       FROM br WHERE rn <= 10),
         |e AS (SELECT vec_id, embedding,
         |        ${bucketExpr("embedding", 6, dim)} AS bucket
         |      FROM embeddings),
         |qv AS (SELECT vec_id AS qid2, embedding AS qv, bucket FROM e
         |       WHERE vec_id IN (1, 2, 3)),
         |cvs AS (SELECT vec_id AS cid, embedding AS cv, bucket FROM e),
         |cp AS (SELECT qid2, cid,
         |        round(${duckDot("qv", "cv", dim)} /
         |          (sqrt(${duckDot("qv", "qv", dim)}) *
         |           sqrt(${duckDot("cv", "cv", dim)})), 6) AS cos_sim
         |       FROM qv JOIN cvs USING (bucket) WHERE qid2 != cid),
         |cr AS (SELECT qid2, cid, row_number() OVER (PARTITION BY qid2
         |        ORDER BY cos_sim DESC, cid) AS rn FROM cp),
         |cosl AS (SELECT qid2 AS qid, cid AS id, rn AS rank
         |         FROM cr WHERE rn <= 10),
         |f AS (SELECT coalesce(bm.qid, cosl.qid) AS qid,
         |        coalesce(bm.id, cosl.id) AS id,
         |        round(coalesce(1.0 / (60.0 + bm.rank::DOUBLE), 0.0) +
         |          coalesce(1.0 / (60.0 + cosl.rank::DOUBLE), 0.0), 6)
         |          AS rrf
         |      FROM bm FULL OUTER JOIN cosl
         |        ON bm.qid = cosl.qid AND bm.id = cosl.id),
         |fr AS (SELECT qid, id, rrf, row_number() OVER
         |        (PARTITION BY qid ORDER BY rrf DESC, id) AS rk FROM f)
         |SELECT qid AS query_id, id AS doc_id, rrf,
         |  rk::INTEGER AS rank
         |FROM fr WHERE rk <= 10""".stripMargin
    },

    // Friedman: doubled tie-averaged ranks via pairwise compares,
    // exact integer moments, one closing ratio
    "q299_friedman" ->
      """WITH d AS (SELECT
        |    (n_chars % 100)::BIGINT AS v0,
        |    ((len(string_split(text, ' ')) * 3) % 100)::BIGINT AS v1,
        |    (doc_id % 100)::BIGINT AS v2
        |  FROM documents),
        |rk AS (SELECT
        |    (2 * (1 + (CASE WHEN v1 < v0 THEN 1 ELSE 0 END)
        |            + (CASE WHEN v2 < v0 THEN 1 ELSE 0 END))
        |      + (CASE WHEN v1 = v0 THEN 1 ELSE 0 END)
        |      + (CASE WHEN v2 = v0 THEN 1 ELSE 0 END))::BIGINT AS r0,
        |    (2 * (1 + (CASE WHEN v0 < v1 THEN 1 ELSE 0 END)
        |            + (CASE WHEN v2 < v1 THEN 1 ELSE 0 END))
        |      + (CASE WHEN v0 = v1 THEN 1 ELSE 0 END)
        |      + (CASE WHEN v2 = v1 THEN 1 ELSE 0 END))::BIGINT AS r1,
        |    (2 * (1 + (CASE WHEN v0 < v2 THEN 1 ELSE 0 END)
        |            + (CASE WHEN v1 < v2 THEN 1 ELSE 0 END))
        |      + (CASE WHEN v0 = v2 THEN 1 ELSE 0 END)
        |      + (CASE WHEN v1 = v2 THEN 1 ELSE 0 END))::BIGINT AS r2
        |  FROM d),
        |m AS (SELECT count(*)::BIGINT AS n,
        |    sum(r0)::HUGEINT AS s0, sum(r1)::HUGEINT AS s1,
        |    sum(r2)::HUGEINT AS s2,
        |    sum(r0::HUGEINT * r0 + r1::HUGEINT * r1
        |      + r2::HUGEINT * r2) AS a4
        |  FROM rk)
        |SELECT n, 3::BIGINT AS k,
        |  CASE WHEN a4 - n::HUGEINT * 3 * 16 <= 0 THEN NULL ELSE
        |    (round(2.0 * ((s0 - n::HUGEINT * 4) * (s0 - n::HUGEINT * 4)
        |        + (s1 - n::HUGEINT * 4) * (s1 - n::HUGEINT * 4)
        |        + (s2 - n::HUGEINT * 4) * (s2 - n::HUGEINT * 4))::DOUBLE
        |      / (a4 - n::HUGEINT * 3 * 16)::DOUBLE * 1000000.0))
        |      ::BIGINT END AS chi2_micro
        |FROM m""".stripMargin,

    // Cochran's Q: exact integer row/column success moments, one ratio
    "q298_cochran_q" ->
      """WITH d AS (SELECT
        |    CASE WHEN n_chars > 300 THEN 1 ELSE 0 END AS p0,
        |    CASE WHEN len(string_split(text, ' ')) > 50 THEN 1
        |      ELSE 0 END AS p1,
        |    CASE WHEN text LIKE '%the%' THEN 1 ELSE 0 END AS p2
        |  FROM documents),
        |m AS (SELECT count(*)::BIGINT AS n,
        |    sum(p0)::HUGEINT AS c0, sum(p1)::HUGEINT AS c1,
        |    sum(p2)::HUGEINT AS c2,
        |    sum(p0 + p1 + p2)::HUGEINT AS nn,
        |    sum((p0 + p1 + p2)::HUGEINT * (p0 + p1 + p2)) AS r2
        |  FROM d)
        |SELECT n, 3::BIGINT AS k,
        |  CASE WHEN 3 * nn - r2 <= 0 THEN NULL ELSE
        |    (round((2 * (3 * (c0 * c0 + c1 * c1 + c2 * c2)
        |        - nn * nn))::DOUBLE
        |      / (3 * nn - r2)::DOUBLE * 1000000.0))::BIGINT END
        |    AS q_micro
        |FROM m""".stripMargin,

    // Logistic fit: two GD iterations unrolled as CTEs — the q263
    // feature chain, micro residuals, exact gradients, 1/N updates
    "q296_logistic_fit" -> q296LogisticSql,

    // q296's model SERVED: the training SQL nested as a CTE, scoring
    // through the identical sigmoid chain, per-source keep report
    "q297_logistic_filter" ->
      s"""WITH wts AS ($q296LogisticSql),
        |t AS (SELECT doc_id, source, string_split(text, ' ') AS w
        |  FROM documents),
        |e AS (SELECT doc_id, u.tok FROM t, unnest(w) AS u(tok)),
        |hh AS (SELECT doc_id,
        |    (('0x' || substr(md5('hf:' || tok), 1, 8))
        |      ::UBIGINT)::BIGINT AS hv
        |  FROM e),
        |f AS (SELECT * FROM (
        |    SELECT doc_id, hv % 8 AS idx,
        |      sum(CASE WHEN (hv // 65536) % 2 = 0 THEN 1 ELSE -1 END)
        |        ::BIGINT AS x
        |    FROM hh GROUP BY 1, 2) WHERE x <> 0),
        |dot AS (SELECT f.doc_id, sum(f.x * wts.w_micro)::BIGINT
        |      AS dot
        |  FROM f JOIN wts ON wts.idx = f.idx AND wts.idx >= 0
        |  GROUP BY 1),
        |b AS (SELECT w_micro AS b FROM wts WHERE idx = -1),
        |sc AS (SELECT t.doc_id, t.source,
        |    (round(1000000.0 / (1.0 +
        |      exp(-(coalesce(dot.dot, 0) + b.b)::DOUBLE
        |        / 1000000.0))))::BIGINT AS s
        |  FROM t LEFT JOIN dot USING (doc_id) CROSS JOIN b)
        |SELECT source, count(*)::BIGINT AS n_docs,
        |  sum(CASE WHEN s >= 500000 THEN 1 ELSE 0 END)::BIGINT
        |    AS n_kept,
        |  sum(s)::BIGINT AS score_sum_micro
        |FROM sc GROUP BY 1""".stripMargin,

        // MAD: two distinct-value cumulative medians, exact even-n
    // middles, one 1.4826 chain
    "q294_mad" ->
      """WITH d AS (SELECT round(value * 100)::BIGINT AS v
        |  FROM events WHERE value IS NOT NULL),
        |c1 AS (SELECT v, count(*)::BIGINT AS cnt FROM d GROUP BY 1),
        |cu1 AS (SELECT v, sum(cnt) OVER (ORDER BY v)::BIGINT AS cend
        |  FROM c1),
        |n1 AS (SELECT sum(cnt)::BIGINT AS n FROM c1),
        |m1 AS (SELECT max(n)::BIGINT AS n,
        |    ((min(CASE WHEN cend * 2 >= n THEN v END) +
        |      min(CASE WHEN cend * 2 >= n + 1 THEN v END)) * 500000)
        |      ::BIGINT AS med
        |  FROM cu1, n1),
        |dev AS (SELECT abs(d.v * 1000000 - m1.med)::BIGINT AS v
        |  FROM d, m1),
        |c2 AS (SELECT v, count(*)::BIGINT AS cnt FROM dev GROUP BY 1),
        |cu2 AS (SELECT v, sum(cnt) OVER (ORDER BY v)::BIGINT AS cend
        |  FROM c2),
        |n2 AS (SELECT sum(cnt)::BIGINT AS n FROM c2),
        |m2 AS (SELECT
        |    ((min(CASE WHEN cend * 2 >= n THEN v END) +
        |      min(CASE WHEN cend * 2 >= n + 1 THEN v END)) * 500000)
        |      ::BIGINT AS mad
        |  FROM cu2, n2)
        |SELECT m1.n, m1.med AS median_micro,
        |  (m2.mad // 1000000)::BIGINT AS mad_micro,
        |  (round((m2.mad // 1000000)::DOUBLE * 1.4826))::BIGINT
        |    AS sigma_micro
        |FROM m1, m2""".stripMargin,

    // Two-proportion z: pooled-variance z, unpooled Wald 95% CI
    "q295_two_proportion" ->
      """WITH pu AS (SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      ::BIGINT AS converted
        |  FROM events GROUP BY 1),
        |m AS (SELECT
        |    sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT
        |      AS n_a,
        |    sum(CASE WHEN user_id % 2 = 0 THEN 0 ELSE 1 END)::BIGINT
        |      AS n_b,
        |    sum(CASE WHEN user_id % 2 = 0 THEN converted ELSE 0 END)
        |      ::BIGINT AS x_a,
        |    sum(CASE WHEN user_id % 2 = 0 THEN 0 ELSE converted END)
        |      ::BIGINT AS x_b
        |  FROM pu)
        |SELECT n_a, n_b, x_a, x_b,
        |  CASE WHEN n_a = 0 OR n_b = 0 THEN NULL ELSE
        |    (round((x_a::DOUBLE / n_a::DOUBLE -
        |      x_b::DOUBLE / n_b::DOUBLE) * 1000000.0))::BIGINT END
        |    AS diff_micro,
        |  CASE WHEN n_a = 0 OR n_b = 0
        |      OR (x_a + x_b)::DOUBLE / (n_a + n_b)::DOUBLE <= 0.0
        |      OR (x_a + x_b)::DOUBLE / (n_a + n_b)::DOUBLE >= 1.0
        |    THEN NULL ELSE
        |    (round((x_a::DOUBLE / n_a::DOUBLE -
        |        x_b::DOUBLE / n_b::DOUBLE) /
        |      sqrt(((x_a + x_b)::DOUBLE / (n_a + n_b)::DOUBLE) *
        |        (1.0 - (x_a + x_b)::DOUBLE / (n_a + n_b)::DOUBLE) *
        |        (1.0 / n_a::DOUBLE + 1.0 / n_b::DOUBLE))
        |      * 1000000.0))::BIGINT END AS z_micro,
        |  CASE WHEN n_a = 0 OR n_b = 0
        |      OR (x_a + x_b)::DOUBLE / (n_a + n_b)::DOUBLE <= 0.0
        |      OR (x_a + x_b)::DOUBLE / (n_a + n_b)::DOUBLE >= 1.0
        |    THEN NULL ELSE
        |    (round((x_a::DOUBLE / n_a::DOUBLE -
        |        x_b::DOUBLE / n_b::DOUBLE
        |      - 1.959964 * sqrt(
        |        (x_a::DOUBLE / n_a::DOUBLE) *
        |          (1.0 - x_a::DOUBLE / n_a::DOUBLE) / n_a::DOUBLE +
        |        (x_b::DOUBLE / n_b::DOUBLE) *
        |          (1.0 - x_b::DOUBLE / n_b::DOUBLE) / n_b::DOUBLE))
        |      * 1000000.0))::BIGINT END AS lo_micro,
        |  CASE WHEN n_a = 0 OR n_b = 0
        |      OR (x_a + x_b)::DOUBLE / (n_a + n_b)::DOUBLE <= 0.0
        |      OR (x_a + x_b)::DOUBLE / (n_a + n_b)::DOUBLE >= 1.0
        |    THEN NULL ELSE
        |    (round((x_a::DOUBLE / n_a::DOUBLE -
        |        x_b::DOUBLE / n_b::DOUBLE
        |      + 1.959964 * sqrt(
        |        (x_a::DOUBLE / n_a::DOUBLE) *
        |          (1.0 - x_a::DOUBLE / n_a::DOUBLE) / n_a::DOUBLE +
        |        (x_b::DOUBLE / n_b::DOUBLE) *
        |          (1.0 - x_b::DOUBLE / n_b::DOUBLE) / n_b::DOUBLE))
        |      * 1000000.0))::BIGINT END AS hi_micro
        |FROM m""".stripMargin,

    "q292_quantile_normalize" ->
      """WITH d AS (SELECT event_type AS g,
        |    round(value * 100)::BIGINT AS v
        |  FROM events WHERE value IS NOT NULL),
        |cells AS (SELECT g, v, count(*)::BIGINT AS cnt
        |  FROM d GROUP BY 1, 2),
        |rk AS (SELECT g, v, cnt,
        |    (sum(cnt) OVER (PARTITION BY g ORDER BY v) - cnt)
        |      ::BIGINT AS cb,
        |    (sum(cnt) OVER (PARTITION BY g))::BIGINT AS ng
        |  FROM cells),
        |tot AS (SELECT sum(cnt)::BIGINT AS n FROM cells),
        |pl AS (SELECT v AS pv, sum(cnt)::BIGINT AS pcnt
        |  FROM cells GROUP BY 1),
        |plc AS (SELECT pv, pcnt,
        |    (sum(pcnt) OVER (ORDER BY pv) - pcnt)::BIGINT AS pcb
        |  FROM pl)
        |SELECT rk.g AS grp, rk.v, rk.cnt,
        |  (round((2 * cb + cnt)::DOUBLE / (2.0 * ng::DOUBLE)
        |    * 1000000.0))::BIGINT AS frac_micro,
        |  plc.pv AS norm_v
        |FROM rk, plc, tot
        |WHERE plc.pcb * 2 * rk.ng <= (2 * rk.cb + rk.cnt) * tot.n
        |  AND (2 * rk.cb + rk.cnt) * tot.n
        |    < (plc.pcb + plc.pcnt) * 2 * rk.ng""".stripMargin)
}
