package graft

import org.apache.spark.sql.execution.ExplainMode

/** Plan-shape regression gate: a refactor must not silently lose
  * predicate pushdown, column pruning, or a broadcast decision, and must
  * never introduce an all-pairs join. PlanAudit dumps these plans for
  * humans; this spec pins the load-bearing properties in CI.
  *
  * Plans are built at sf0.001 — plan SHAPE (pushdown, join strategy
  * whitelists) is what is asserted, not size-dependent AQE choices.
  */
class PlanGateSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q01/q04: filters reach the parquet scan; q01 prunes columns") {
    val p1 = planOf("q01_groupby_agg")
    assert(p1.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"q01 lost shipdate pushdown:\n$p1")
    // 4 of 11 lineitem columns are needed; the scan must not read the
    // rest (l_tax rides along with nothing in q01)
    assert(!p1.contains("l_tax"), s"q01 scan stopped pruning columns:\n$p1")
    val p4 = planOf("q04_filter_algebra")
    assert(p4.contains("PushedFilters:") &&
      p4.contains("IsNotNull(c_acctbal)"),
      s"q04 lost predicate pushdown:\n$p4")
  }

  test("q03: sampled key set broadcasts back onto the fact side") {
    val p = planOf("q03_sample_joinback")
    assert(p.contains("BroadcastHashJoin"),
      s"q03 join-back no longer broadcasts:\n$p")
  }

  test("q55: the bloom probe survives in the plan (dropping it would be " +
    "row-invisible — only the oracle-blind scale behavior regresses)") {
    val p = planOf("q55_decontaminate_bloom")
    assert(p.contains("graft_bloom_might_contain"),
      s"q55 lost its scan-stage bloom prefilter:\n$p")
  }

  test("no gate query plans a CartesianProduct; BroadcastNestedLoopJoin " +
    "only where the operator is a deliberate tiny-side broadcast") {
    // queries whose SEMANTICS are a non-equi match against a broadcast
    // small side (query sets, k/1-row centroid or scalar tables, banded
    // signature indexes). Anything outside this list planning a nested
    // loop is a regression; CartesianProduct (non-broadcast all-pairs)
    // is never acceptable.
    val bnljWhitelist = Set(
      "q17_cosine_topk",     // corpus × broadcast query rows (non-equi !=)
      "q27_ivf_topk",        // query rows × broadcast k-row centroids
      "q44_tfidf",           // tf rows × broadcast 1-row corpus size
      "q48_kmeans",          // corpus × broadcast k-row centroids
      "q51_hard_negatives")  // corpus × broadcast query rows (label !=)
    // q26 performs its ingest roundtrip at DataFrame-construction time —
    // a real write job, not a plan build — so it is audited by its own
    // gate entry instead
    val names = SparkEntry.queries.keys.filterNot(_ == "q26_ingest_roundtrip")
    val offenders = names.flatMap { name =>
      val plan = planOf(name)
      val cart = plan.contains("CartesianProduct")
      val bnlj = plan.contains("BroadcastNestedLoopJoin") &&
        !bnljWhitelist.contains(name)
      if (cart) Some(s"$name: CartesianProduct")
      else if (bnlj) Some(s"$name: non-whitelisted BroadcastNestedLoopJoin")
      else None
    }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }
}
