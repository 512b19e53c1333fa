package graft

import org.apache.spark.sql.functions._

import graft.operators.Incremental
import graft.text.TextOps

/** Unit coverage for incremental aggregate maintenance (q242) and the
  * Aho-Corasick multi-match kernel (q243): merge==recompute is the
  * load-bearing claim of the first, single-pass==naive-contains of
  * the second.
  */
class IncrementalMatchSpec extends SparkSpec {
  import spark.implicits._

  test("joinDelta: base view ∪ delta == the full re-join, multiset " +
    "duplicates included; both-sides-new pairs appear exactly once") {
    val a = Seq((1L, "a1"), (1L, "a2"), (2L, "a3"), (3L, "a4"))
      .toDF("k", "av")
    val dA = Seq((2L, "a5"), (4L, "a6")).toDF("k", "av")
    val b = Seq((1L, "b1"), (2L, "b2"), (2L, "b3")).toDF("k", "bv")
    val dB = Seq((1L, "b4"), (4L, "b5")).toDF("k", "bv")
    val full = a.unionByName(dA).join(b.unionByName(dB), Seq("k"))
    val inc = a.join(b, Seq("k"))
      .unionByName(Incremental.joinDelta(a, dA, b, dB, Seq("k")))
    assert(inc.count() == full.count())
    assert(inc.exceptAll(full).isEmpty && full.exceptAll(inc).isEmpty,
      "delta-maintained view diverged from the full re-join")
    // the ΔA⋈ΔB pair (4,a6,b5) must appear exactly once (it lives in
    // the ΔA ⋈ B_new term only — double-counting it is the classic
    // delta-rule bug)
    assert(inc.filter(col("k") === 4L).count() == 1L)
  }

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("g").collect().map { r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getSeq[Long](5).toList)
    }.toList

  test("mergeAggState(history, delta) equals aggState(whole) exactly, " +
    "including the KMV sketch — merge == recompute") {
    val rows = (1L to 400L).map(i =>
      (if (i % 3 == 0) "a" else "b", i % 37, i % 211)) // 211 > k would
    val df = rows.toDF("g", "v", "d")
    val whole = Incremental.aggState(df, "g", col("v"), col("d"), 64)
    val h = Incremental.aggState(df.filter(col("d") < 100), "g",
      col("v"), col("d"), 64)
    val d = Incremental.aggState(df.filter(col("d") >= 100), "g",
      col("v"), col("d"), 64)
    val merged = Incremental.mergeAggState(Seq(h, d), "g", 64)
    assert(canon(merged) == canon(whole))
    // three-way split merges identically too
    val parts = Seq(0, 1, 2).map(m =>
      Incremental.aggState(df.filter(col("d") % 3 === m), "g",
        col("v"), col("d"), 64))
    assert(canon(Incremental.mergeAggState(parts, "g", 64)) ==
      canon(whole))
  }

  test("stateReport: exact distinct below k, estimator above") {
    val small = (1L to 10L).map(i => ("g", i, i)).toDF("g", "v", "d")
    val r = Incremental.stateReport(
      Incremental.aggState(small, "g", col("v"), col("d"), 64), "g", 64)
      .head()
    assert(r.getAs[Long]("k_actual") == 10L)
    assert(r.getAs[Double]("est_distinct") == 10.0)
    assert(r.getAs[Long]("n_rows") == 10L)
    assert(r.getAs[Long]("sum_v") == 55L)
    assert(r.getAs[Long]("mean_micro") == 5500000L)
  }

  test("multiMatch finds overlapping and nested terms in one pass; " +
    "first_term follows (start, index); no match yields 0/NULL") {
    val df = Seq(
      (1L, "the cat and the hat"),
      (2L, "abcx"),
      (3L, "aaaa"),
      (4L, "nothing here")).toDF("id", "text")
    val got = df.select(col("id"),
      TextOps.multiMatch(col("text"),
        Seq("the", "cat", "at", "hat", "zz")).as("m"))
      .select(col("id"), col("m.n_matched"), col("m.first_term"))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), Option(r.getString(2)))).toMap
    assert(got(1L) == ((4, Some("the")))) // at nested in cat/hat
    assert(got(4L) == ((0, None)))
    // tie at start 0: "ab" (idx 0) beats "abc" (idx 1)
    val tie = Seq((1L, "abcx")).toDF("id", "text")
      .select(TextOps.multiMatch(col("text"), Seq("ab", "abc")).as("m"))
      .head()
    assert(tie.getStruct(0).getString(1) == "ab")
    // overlapping occurrences of one term still count it once
    val overlap = Seq((1L, "aaaa")).toDF("id", "text")
      .select(TextOps.multiMatch(col("text"), Seq("aa")).as("m"))
      .head().getStruct(0)
    assert(overlap.getInt(0) == 1)
  }

  test("multiMatch agrees with naive per-term contains on generated " +
    "text, and a later-starting lower-index term never wins") {
    val alphabet = "abcab cabc"
    val texts = (0 until 60).map { i =>
      val s = new StringBuilder
      var x = i.toLong
      (0 until 40).foreach { _ =>
        x = (x * 1103515245L + 12345L) % 2147483648L
        s.append(alphabet.charAt((x % alphabet.length).toInt))
      }
      (i.toLong, s.toString)
    }
    val terms = Seq("ab", "bc", "ca", "abc", "b c", "cab", "q")
    val df = texts.toDF("id", "text")
    val kernel = df.select(col("id"),
      TextOps.multiMatch(col("text"), terms).as("m"))
      .select(col("id"), col("m.n_matched").as("n"),
        col("m.first_term").as("f"))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), Option(r.getString(2)))).toMap
    texts.foreach { case (id, text) =>
      val present = terms.zipWithIndex
        .map { case (t, i) => (t, i, text.indexOf(t)) }
        .filter(_._3 >= 0)
      val naiveN = present.size
      val naiveFirst = if (present.isEmpty) None
        else Some(present.minBy { case (_, i, p) => (p, i) }._1)
      assert(kernel(id) == ((naiveN, naiveFirst)),
        s"id=$id text=$text got=${kernel(id)} want=($naiveN, $naiveFirst)")
    }
  }

  test("graft_multimatch SQL registration: foldable array enforced, " +
    "results match the Scala path") {
    val df = Seq((1L, "the cat")).toDF("id", "text")
    df.createOrReplaceTempView("mm_docs")
    val r = spark.sql(
      "SELECT graft_multimatch(text, array('the', 'dog')) AS m " +
        "FROM mm_docs").head().getStruct(0)
    assert(r.getInt(0) == 1 && r.getString(1) == "the")
    val err = intercept[Exception] {
      spark.sql("SELECT graft_multimatch(text, array(text)) " +
        "FROM mm_docs").collect()
    }
    assert(err.getMessage.contains("foldable") ||
      err.getMessage.toLowerCase.contains("usage"))
  }

  test("graft_multimatch builder validates the term list at ANALYSIS: " +
    "null array, null element, empty and duplicate lists all fail " +
    "with the usage string, not an executor NPE") {
    Seq((1L, "x")).toDF("id", "text").createOrReplaceTempView("mm_val")
    def failing(terms: String): String =
      intercept[Exception] {
        spark.sql(s"SELECT graft_multimatch(text, $terms) FROM mm_val")
          .collect()
      }.getMessage
    assert(failing("CAST(NULL AS array<string>)").contains("usage"))
    assert(failing("array('a', CAST(NULL AS string))").contains("usage"))
    assert(failing("array()").contains("usage") ||
      failing("array()").contains("array<string>"))
    assert(failing("array('a', '')").contains("usage"))
    assert(failing("array('a', 'a')").contains("usage"))
  }
}
