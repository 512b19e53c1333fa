package graft

import org.apache.spark.sql.functions._
import graft.text.{Dedup, TextOps}

/** The native MinHash kernel: correctness properties, codegen execution,
  * SQL registration, and a sanity race against the md5 HOF flavor.
  */
class MinHashXXSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the sleepy dog"),
    (3L, "completely different content about spark engines"))
    .toDF("doc_id", "text")

  private def sigs(fast: Boolean) = {
    val staged = docs
      .select(col("doc_id"), TextOps.tokensSimple(col("text")).as("toks"))
      .select(col("doc_id"), TextOps.shingles(col("toks"), 3).as("sh"))
    val sig =
      if (fast) TextOps.minhashSigFast(col("sh"), 32, 42L)
      else TextOps.minhashSig(col("sh"), 32)
    staged.select(col("doc_id"), sig.as("sig")).collect()
      .map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Long]]("sig").toSeq).toMap
  }

  test("native kernel: identical docs agree, near dups mostly agree") {
    val m = sigs(fast = true)
    assert(m(0L).length == 32)
    assert(m(0L) == m(1L))
    assert(m(0L) != m(3L))
    val agree02 = m(0L).zip(m(2L)).count { case (a, b) => a == b }
    val agree03 = m(0L).zip(m(3L)).count { case (a, b) => a == b }
    assert(agree02 > agree03) // near dup shares more lanes than unrelated
    // deterministic across runs
    assert(sigs(fast = true) == m)
  }

  test("empty shingle set yields the sentinel signature") {
    val s = Seq((9L, "one two")).toDF("doc_id", "text")
      .select(TextOps.shingles(TextOps.tokensSimple(col("text")), 3).as("sh"))
      .select(TextOps.minhashSigFast(col("sh"), 8).as("sig"))
      .head().getAs[scala.collection.Seq[Long]]("sig")
    assert(s.forall(_ == Long.MaxValue))
  }

  test("est-jaccard from native sigs works in the LSH pipeline") {
    val staged = docs
      .select(col("doc_id"), TextOps.tokensSimple(col("text")).as("toks"))
      .select(col("doc_id"), TextOps.shingles(col("toks"), 3).as("sh"))
      .select(col("doc_id"), TextOps.minhashSigFast(col("sh"), 32).as("sig"))
    val buckets = Dedup.lshBuckets(staged, "doc_id", "sig", 8, 4)
    val pairs = Dedup.candidatePairs(buckets, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
  }

  test("SQL registration via SparkSessionExtensions") {
    // the shared test session is built with
    // spark.sql.extensions=graft.GraftExtensions → the functions resolve
    // through the SQL parser
    val sig = spark.sql(
      "SELECT graft_minhash(array('a b', 'b c', 'c d'), 4, 7) AS sig")
      .head().getAs[scala.collection.Seq[Long]]("sig")
    assert(sig.length == 4 && sig.forall(_ != Long.MaxValue))
    val cos = spark.sql(
      """SELECT graft_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                    array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)))
        |       AS c""".stripMargin)
      .head().getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)
    // DataFrame-API path through the Column bridge
    val fromApi = docs
      .select(col("doc_id"), TextOps.tokensSimple(col("text")).as("toks"))
      .select(col("doc_id"), TextOps.shingles(col("toks"), 3).as("sh"))
      .select(TextOps.minhashSigFast(col("sh"), 4, 7L).as("sig"))
      .head().getAs[scala.collection.Seq[Long]]("sig")
    assert(fromApi.length == 4)
  }

  test("md5 kernel is bit-identical to the fold formulation") {
    val staged = docs
      .select(col("doc_id"), TextOps.tokensSimple(col("text")).as("toks"))
      .select(col("doc_id"), TextOps.shingles(col("toks"), 3).as("sh"))
    val both = staged.select(
      TextOps.minhashSig(col("sh"), 32).as("kernel"),
      TextOps.minhashSigExpr(col("sh"), 32).as("fold"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getAs[scala.collection.Seq[Long]]("kernel") ==
        r.getAs[scala.collection.Seq[Long]]("fold"))
    }
    // empty shingle set → all-P sentinel on both paths
    val empty = Seq(Tuple1(Seq.empty[String])).toDF("sh")
      .select(TextOps.minhashSig(col("sh"), 4).as("k"),
        TextOps.minhashSigExpr(col("sh"), 4).as("f")).head()
    assert(empty.getAs[scala.collection.Seq[Long]]("k")
      .forall(_ == TextOps.P))
    assert(empty.getAs[scala.collection.Seq[Long]]("k") ==
      empty.getAs[scala.collection.Seq[Long]]("f"))
  }

  test("simhash kernel is bit-identical to the fold formulation") {
    val both = docs
      .select(TextOps.tokensSimple(col("text")).as("toks"))
      .select(
        TextOps.simhash(col("toks"), 16).as("kernel"),
        TextOps.simhashExpr(col("toks"), 16).as("fold"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // edge semantics match the fold: empty array → 0; a null token
    // votes -1 on every bit (when(null).otherwise(-1))
    val edge = Seq(
      Tuple1(Seq.empty[String]),
      Tuple1(Seq[String](null, null, "a"))).toDF("toks")
      .select(TextOps.simhash(col("toks"), 8).as("k"),
        TextOps.simhashExpr(col("toks"), 8).as("f"))
      .collect()
    assert(edge(0).getLong(0) == 0L)
    edge.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // SQL registration
    val viaSql = spark.sql(
      "SELECT graft_simhash(array('a', 'b', 'a'), 16) AS s").head().getLong(0)
    val viaApi = Seq(Tuple1(Seq("a", "b", "a"))).toDF("toks")
      .select(TextOps.simhash(col("toks"), 16)).head().getLong(0)
    assert(viaSql == viaApi)
  }

  test("new kernels resolve through the SQL parser") {
    val sig = spark.sql(
      "SELECT graft_minhash_md5(array('a b c'), 4) AS sig")
      .head().getAs[scala.collection.Seq[Long]]("sig")
    assert(sig.length == 4 && sig.forall(_ != TextOps.P))
    val nearest = spark.sql(
      """SELECT graft_nearest(array(
        |  named_struct('e', 1L, 'x', 0.0D, 'y', 0.0D),
        |  named_struct('e', 2L, 'x', 3.0D, 'y', 4.0D))) AS r""".stripMargin)
      .head().getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("r")
    assert(nearest.map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2)))
      .toMap == Map(1L -> ((5.0, 2L)), 2L -> ((5.0, 1L))))
    val packed = spark.sql(
      """SELECT graft_padpack(array(
        |  named_struct('k', 2, 'v', 'b'),
        |  named_struct('k', 1, 'v', 'a')), 'z', 3) AS p""".stripMargin)
      .head().getAs[scala.collection.Seq[String]]("p")
    assert(packed == Seq("a", "b", "z"))
    // the KMV sketch aggregate resolves and matches the API flavor
    val viaSql = spark.sql(
      """SELECT graft_kmv_sketch(g, 4) AS sk FROM (
        |  SELECT array('a', 'b', 'c', 'd', 'e', 'a') AS g)""".stripMargin)
      .head().getAs[scala.collection.Seq[Long]]("sk")
    val viaApi = Seq(Tuple1(Seq("a", "b", "c", "d", "e", "a")))
      .toDF("g").agg(TextOps.kmvSketch(col("g"), 4).as("sk"))
      .head().getAs[scala.collection.Seq[Long]]("sk")
    assert(viaSql == viaApi && viaSql.length == 4)
    assert(viaSql == viaSql.sorted)
    // the CMS aggregate resolves too; row mass == item count
    val cms = spark.sql(
      """SELECT graft_cms_sketch(g, 2, 8) AS sk FROM (
        |  SELECT array('a', 'b', 'a') AS g)""".stripMargin)
      .head().getAs[scala.collection.Seq[Long]]("sk")
    assert(cms.length == 16 && cms.take(8).sum == 3 && cms.drop(8).sum == 3)
  }

  test("graft_minhash rejects non-literal numHashes with a usage error") {
    val err = intercept[Exception] {
      spark.sql(
        """SELECT graft_minhash(array('a'), CAST(col AS INT), 7)
          |FROM (SELECT 4 AS col)""".stripMargin).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(err).exists(_.contains("usage: graft_minhash")))
  }
}
