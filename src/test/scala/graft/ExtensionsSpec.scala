package graft

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/** The SQL-surface contract: every native kernel in `graft.functions`
  * must be reachable from plain `spark.sql` via a `graft_*` function
  * (GraftExtensions) — a kernel only the Scala API can call is
  * invisible to SQL-only users. The audit walks the compiled
  * `graft/functions` classpath directory, so a NEW kernel file fails
  * this spec until it is registered.
  */
class ExtensionsSpec extends SparkSpec {

  test("every kernel Expression class is registered as a SQL function") {
    val url = getClass.getClassLoader.getResource("graft/functions")
    assert(url != null && url.getProtocol == "file",
      s"cannot enumerate kernel classes from $url")
    val kernelClasses = new java.io.File(url.toURI).listFiles()
      .map(_.getName)
      .filter(n => n.endsWith(".class") && !n.contains("$"))
      .map(n => Class.forName("graft.functions." + n.dropRight(6)))
      .filter(c => classOf[Expression].isAssignableFrom(c) &&
        !java.lang.reflect.Modifier.isAbstract(c.getModifiers))
      .map(_.getName)
      .toSet
    assert(kernelClasses.nonEmpty, "kernel enumeration found nothing")
    val registry = spark.sessionState.functionRegistry
    val registered = registry.listFunction()
      .filter(_.funcName.startsWith("graft_"))
      .flatMap(f => registry.lookupFunction(f).map(_.getClassName))
      .toSet
    val unregistered = kernelClasses -- registered
    assert(unregistered.isEmpty,
      s"kernels without a SQL registration: ${unregistered.mkString(", ")}")
  }

  test("graft_bpe_tokens and graft_bloom_might_contain serve from SQL") {
    import spark.implicits._
    // BPE: the merge table rides as a foldable array(array(l, r))
    val toks = spark.sql(
      """SELECT graft_bpe_tokens('low lower',
        |  array(array('l', 'o'), array('lo', 'w'))) AS t""".stripMargin)
      .head().getSeq[String](0)
    assert(toks == Seq("low", "low", "e", "r"))
    // Bloom: build a filter over a tiny reference set, ship it as a
    // base64 literal, probe from SQL — members true, non-member false
    // (no false negatives; fp-rate negligible at this size)
    val ref = Seq("alpha", "beta").toDF("g")
    val bytes = graft.functions.BloomXX.build(ref, "g", fpp = 0.01)
    val b64 = java.util.Base64.getEncoder.encodeToString(bytes)
    val probed = spark.sql(
      s"""SELECT graft_bloom_might_contain(s, unbase64('$b64')) AS hit
         |FROM VALUES ('alpha'), ('beta'), ('zeta') AS t(s)""".stripMargin)
      .collect().map(_.getBoolean(0)).toSeq
    assert(probed == Seq(true, true, false))
    // a non-foldable filter argument is rejected with the usage hint
    val err = intercept[Exception] {
      spark.sql(
        "SELECT graft_bloom_might_contain(s, cast(s AS BINARY)) " +
          "FROM VALUES ('x') AS t(s)").collect()
    }
    assert(err.getMessage.contains("graft_bloom_might_contain"))
  }
}
