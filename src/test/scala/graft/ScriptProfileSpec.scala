package graft

import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Unicode-script profile + dominant-script verdict (fixtures as
  * escapes so the source stays ASCII).
  */
class ScriptProfileSpec extends SparkSpec {
  import spark.implicits._

  private def profile(s: String): (Map[String, Int], String) = {
    val row = Seq(Tuple1(s)).toDF("t")
      .select(TextOps.scriptProfile(col("t")) :+
        TextOps.dominantScript(col("t")).as("script"): _*)
      .first()
    val names = TextOps.scriptClasses.map(_._1)
    (names.zipWithIndex.map { case (n, i) => n -> row.getInt(i) }.toMap,
      row.getString(names.size))
  }

  test("pure-script runs count and classify correctly") {
    val (c1, s1) = profile("hello world")
    assert(c1("latin") == 10 && s1 == "latin", (c1, s1))
    val (c2, s2) = profile("\u041F\u0440\u0438\u0432\u0435\u0442")
    assert(c2("cyrillic") == 6 && c2("latin") == 0 && s2 == "cyrillic")
    val (c3, s3) = profile("\u4F60\u597D\uAC00\uB098")
    assert(c3("cjk") == 4 && s3 == "cjk", (c3, s3))
    val (c4, s4) = profile("\u0645\u0631 99")
    assert(c4("arabic") == 2 && c4("digit") == 2 && s4 == "arabic")
  }

  test("mixed text: counts are per-class, dominant is the plurality " +
    "with class-order tie-break") {
    val (c, s) = profile("ab \u041F\u0440\u0438\u0432\u0435\u0442 12")
    assert(c("latin") == 2 && c("cyrillic") == 6 && c("digit") == 2)
    assert(s == "cyrillic")
    // 2-vs-2 tie between latin and digit resolves to latin (class order)
    val (_, tied) = profile("ab 12")
    assert(tied == "latin")
  }

  test("no script members at all: 'none'") {
    val (c, s) = profile("... !!! ???")
    assert(c.values.sum == 0 && s == "none", (c, s))
  }
}
