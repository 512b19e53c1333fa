package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Incremental materialized-aggregate maintenance — the pattern that
  * turns a nightly full recompute into a per-batch merge at 100 TB:
  * keep a persisted per-group STATE table of mergeable aggregates
  * (count / sum / min / max plus a KMV distinct sketch), fold each new
  * batch to the same state shape ([[aggState]]), and combine with ONE
  * |groups|-sized merge ([[mergeAggState]]) — the corpus history is
  * never rescanned. Every component is associative and commutative:
  * counts and sums add, min/max fold, and the k-min-values sketch
  * merges as distinct-k-smallest of the union (Beyer et al. 2007),
  * which is EXACTLY the sketch a from-scratch build would produce —
  * so merge == recompute, bit for bit, and the gate hash-pins it.
  */
object Incremental {

  /** Fold a batch to per-group mergeable state:
    * `(group, n_rows, sum_v, min_v, max_v, kmv)` with `valueInt` an
    * exact integer measure and `kmv` the bounded k-min-values sketch
    * of `distinctCol` (hashed through the portable md5 domain, so
    * sketches of different batches share hash values and union
    * cleanly). One aggregation pass; state is k longs + 4 scalars per
    * group regardless of batch size.
    */
  def aggState(df: DataFrame, groupCol: String, valueInt: Column,
      distinctCol: Column, k: Int = 128): DataFrame =
    df.select(col(groupCol), valueInt.cast("long").as("_v"),
      array(distinctCol.cast("string")).as("_d"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"), sum(col("_v")).as("sum_v"),
        min(col("_v")).as("min_v"), max(col("_v")).as("max_v"),
        TextOps.kmvSketch(col("_d"), k).as("kmv"))

  /** Merge any number of state tables into one: counts and sums ADD,
    * min/max FOLD, and the union KMV is the distinct-k-smallest of
    * the concatenated sketches — a valid sketch of the union because
    * every value is an original domain hash. The merge's cost is
    * |groups| × |partials| sketch rows — batch history never rescans.
    * `collect_list` here is bounded by construction: one k-long array
    * per contributing state table per group.
    */
  def mergeAggState(states: Seq[DataFrame], groupCol: String,
      k: Int = 128): DataFrame = {
    require(states.nonEmpty, "need at least one state table")
    states.reduce(_ unionByName _)
      .groupBy(col(groupCol))
      .agg(sum(col("n_rows")).as("n_rows"),
        sum(col("sum_v")).as("sum_v"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"),
        slice(array_sort(array_distinct(flatten(
          collect_list(col("kmv"))))), 1, k).as("kmv"))
  }

  /** Human-facing report off a state table: the scalars plus the
    * derived mean (micro-snapped) and the KMV distinct estimate —
    * exact below k, the (k−1)·2³²/kth estimator above.
    */
  def stateReport(state: DataFrame, groupCol: String,
      k: Int = 128): DataFrame =
    state.select(col(groupCol), col("n_rows"), col("sum_v"),
      col("min_v"), col("max_v"),
      round(col("sum_v").cast("double") * lit(1000000.0) /
        col("n_rows").cast("double")).cast("long").as("mean_micro"),
      size(col("kmv")).cast("long").as("k_actual"),
      element_at(col("kmv"), -1).as("kth"),
      TextOps.kmvEstimate(col("kmv"), k).as("est_distinct"))

  /** Incremental INNER-JOIN view maintenance, insert-only deltas —
    * the delta rule that keeps a materialized join fresh without
    * re-joining history (the join sibling of [[aggState]]'s merge):
    * with `V_old = A_old ⋈ B_old` already persisted and append
    * batches ΔA / ΔB arriving,
    *
    *   `V_new = V_old ∪ ΔA ⋈ (B_old ∪ ΔB) ∪ A_old ⋈ ΔB`
    *
    * — multiset-exact (UNION ALL semantics throughout), because
    * `(A∪ΔA) ⋈ (B∪ΔB)` expands to exactly those four terms and
    * `ΔA ⋈ ΔB` folds into the first. This method returns THE DELTA
    * (the last two terms); the caller appends it to the stored view.
    *
    * Scale shape: the expensive side is `A_old ⋈ ΔB` — history joined
    * against a (normally tiny) batch, which Spark broadcasts when ΔB
    * fits, turning maintenance into a scan of A_old with no shuffle;
    * at 100 TB that is the entire point versus re-running
    * `A_new ⋈ B_new`. Insert-only is the contract (the LLM-pipeline
    * reality: event logs and document corpora append); deletions need
    * multiset counting — route those through [[graft.operators
    * .Ingest.cdcApply]]'s tombstone semantics and a view rebuild of
    * the affected partitions instead.
    *
    * `keys` are the equi-join columns; all other column names must be
    * disjoint between the two sides.
    */
  def joinDelta(aOld: DataFrame, dA: DataFrame, bOld: DataFrame,
      dB: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "need at least one join key")
    dA.join(bOld.unionByName(dB), keys)
      .unionByName(aOld.join(dB, keys))
  }
}
