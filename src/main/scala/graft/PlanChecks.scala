package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.PlanExpression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.SparkPlan

/** Plan lint — the engine's own 100 TB plan discipline, packaged for
  * user pipelines: walk a DataFrame's physical plan and report the
  * shapes that melt at scale long before they melt (each is invisible
  * at test size and an outage at 1000 executors):
  *
  *  - `cartesian-product` — a non-broadcast all-pairs join: |L|·|R|
  *    work, never acceptable.
  *  - `broadcast-nested-loop` — all-pairs against a broadcast side.
  *    Correct ONLY when that side is genuinely tiny (1-row totals,
  *    k-row centroids, a query set); flag it and make the author say
  *    so (`bnljAllowed`).
  *  - `global-window` — a WindowExec with no partition spec: the
  *    window's whole input sorts through ONE reducer. The scalable
  *    alternative is the two-level bucketed prefix sum
  *    (`Relational.hashRankedCum` / `percentileBuckets` /
  *    `TextOps.vocabCoverage` are in-repo instances).
  *  - `global-sort` — a full `Sort(global = true)` that did not
  *    collapse into `TakeOrderedAndProject`: every row range-shuffles
  *    and sorts. Fine for a final bounded result; a smell mid-plan.
  *
  * [[audit]] returns findings (empty = clean); [[assertClean]] throws
  * with the findings — wire it into a pipeline's CI the way
  * PlanGateSpec wires it across every gate query of this repo.
  * Auditing uses `sparkPlan` (pre-AQE), so nothing executes.
  */
object PlanChecks {

  final case class Finding(rule: String, node: String) {
    override def toString = s"[$rule] $node"
  }

  def audit(df: DataFrame, bnljAllowed: Boolean = false): Seq[Finding] =
    auditPlan(df.queryExecution.sparkPlan, bnljAllowed,
      df.sparkSession)

  private[graft] def auditPlan(plan: SparkPlan, bnljAllowed: Boolean,
      spark: SparkSession): Seq[Finding] = {
    import org.apache.spark.sql.execution.SortExec
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    val here = plan.collect {
      case c: CartesianProductExec =>
        Finding("cartesian-product", c.nodeName)
      case j: BroadcastNestedLoopJoinExec if !bnljAllowed =>
        Finding("broadcast-nested-loop", j.nodeName)
      case w: WindowExec if w.partitionSpec.isEmpty =>
        Finding("global-window", w.nodeName)
      case w: WindowGroupLimitExec if w.partitionSpec.isEmpty =>
        Finding("global-window", w.nodeName)
      case s: SortExec if s.global =>
        Finding("global-sort", s.nodeName)
    }
    // subquery plans (scalar/IN) hang off EXPRESSIONS, not children —
    // a melting join inside a subquery must not escape the lint. At
    // the pre-AQE sparkPlan stage these are still LOGICAL plans inside
    // PlanExpression; plan each through the session and recurse.
    val subPlans = plan.collect { case p => p.expressions }.flatten
      .flatMap(_.collect { case pe: PlanExpression[_] => pe.plan })
    here ++ subPlans.flatMap {
      case sp: SparkPlan => auditPlan(sp, bnljAllowed, spark)
      case lp: LogicalPlan =>
        auditPlan(spark.sessionState.executePlan(lp).sparkPlan,
          bnljAllowed, spark)
      case _ => Nil
    }
  }

  /** Throw `IllegalStateException` listing every finding (empty =
    * no-op). `allowRules` skips named rules — e.g.
    * `Set("global-sort")` for a query whose final ordered output is
    * the point.
    */
  def assertClean(df: DataFrame, bnljAllowed: Boolean = false,
      allowRules: Set[String] = Set.empty): Unit = {
    val findings = audit(df, bnljAllowed)
      .filterNot(f => allowRules.contains(f.rule))
    if (findings.nonEmpty)
      throw new IllegalStateException(
        s"plan lint: ${findings.mkString("; ")}")
  }
}
