package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The public plan lint: each rule fires on a crafted offender and
  * stays quiet on the clean twin.
  */
class PlanChecksSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = (1L to 100L).map(i => (i, i % 7, i * 1.5))
    .toDF("id", "k", "v")

  test("cartesian-product and broadcast-nested-loop fire on all-pairs " +
    "joins; an equi-join is clean") {
    val right = (1L to 50L).map(i => (i, i * 2.0)).toDF("rid", "w")
    // non-equi condition + both sides un-hinted → nested loop (Spark
    // broadcasts one side under the threshold; disable to force the
    // cartesian flavor too)
    val bnlj = df.join(right, col("v") < col("w"))
    assert(PlanChecks.audit(bnlj)
      .exists(f => f.rule == "broadcast-nested-loop" ||
        f.rule == "cartesian-product"))
    assert(PlanChecks.audit(bnlj, bnljAllowed = true)
      .forall(_.rule != "broadcast-nested-loop"))
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val cart = df.join(right, col("v") < col("w"))
      assert(PlanChecks.audit(cart, bnljAllowed = true)
        .exists(_.rule == "cartesian-product"))
    }
    val clean = df.join(right, col("id") === col("rid"))
    assert(PlanChecks.audit(clean, bnljAllowed = true).isEmpty)
  }

  test("global-window fires on a partition-less window; a partitioned " +
    "window is clean") {
    val offender = df.withColumn("rn",
      row_number().over(Window.orderBy(col("v"))))
    assert(PlanChecks.audit(offender)
      .exists(_.rule == "global-window"))
    val clean = df.withColumn("rn",
      row_number().over(Window.partitionBy(col("k")).orderBy(col("v"))))
    assert(PlanChecks.audit(clean)
      .forall(_.rule != "global-window"))
  }

  test("global-sort fires on a full orderBy but NOT on orderBy+limit " +
    "(TakeOrderedAndProject) or sortWithinPartitions") {
    assert(PlanChecks.audit(df.orderBy(col("v")))
      .exists(_.rule == "global-sort"))
    assert(PlanChecks.audit(df.orderBy(col("v")).limit(5)).isEmpty)
    assert(PlanChecks.audit(df.sortWithinPartitions(col("v"))).isEmpty)
  }

  test("offending shapes inside subquery plans are caught") {
    df.createOrReplaceTempView("pc_t")
    (1L to 10L).map(i => (i, i * 3.0)).toDF("rid", "w")
      .createOrReplaceTempView("pc_r")
    // the scalar subquery hides an all-pairs join; the outer plan is a
    // plain filter — only subquery traversal sees it
    val q = spark.sql(
      """SELECT * FROM pc_t WHERE v < (
        |  SELECT sum(a.v * b.w) FROM pc_t a, pc_r b WHERE a.v < b.w)
        |""".stripMargin)
    assert(PlanChecks.audit(q, bnljAllowed = true)
      .exists(f => f.rule == "cartesian-product" ||
        f.rule == "global-sort") ||
      PlanChecks.audit(q).exists(_.rule == "broadcast-nested-loop"))
  }

  test("vocabCoverage's only nested-loop join is against a 1-ROW " +
    "global aggregate (the octave-offset broadcast) — every " +
    "cross/nested-loop join side must bottom out in a grouping-free " +
    "Aggregate so a future edit can't grow it into a real cross join") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan}
    val docs = Seq("a b b c", "b c d", "a a e").toDF("text")
    val plan = graft.text.TextOps.vocabCoverage(docs, "text")
      .queryExecution.optimizedPlan
    def globalAgg(p: LogicalPlan): Boolean = p.collectFirst {
      case a: Aggregate if a.groupingExpressions.isEmpty => a
    }.nonEmpty
    val nonEqui = plan.collect {
      case j: Join if j.condition.isEmpty => j
    }
    assert(nonEqui.nonEmpty, "expected the octArr broadcast cross join")
    nonEqui.foreach { j =>
      assert(globalAgg(j.left) || globalAgg(j.right),
        s"condition-less join with no 1-row global-agg side:\n$j")
    }
  }

  test("assertClean throws with the findings and honors allowRules") {
    val offender = df.withColumn("rn",
      row_number().over(Window.orderBy(col("v"))))
    val e = intercept[IllegalStateException] {
      PlanChecks.assertClean(offender)
    }
    assert(e.getMessage.contains("global-window"))
    PlanChecks.assertClean(df.orderBy(col("v")),
      allowRules = Set("global-sort")) // no throw
    PlanChecks.assertClean(df.groupBy(col("k")).count()) // clean plan
  }

  private def withSQLConf[T](pairs: (String, String)*)(body: => T): T = {
    val conf = spark.conf
    val olds = pairs.map { case (k, _) => k -> conf.getOption(k) }
    pairs.foreach { case (k, v) => conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
