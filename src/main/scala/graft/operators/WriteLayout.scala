package graft.operators

import org.apache.spark.sql.DataFrame

/** Output-file sizing for dynamic-partition writes (optimization
  * guide §6). A `write.partitionBy(c)` emits one file per (task,
  * partition value) pair, so a write fed by an N-task upstream stage
  * produces up to N×|values| files — hundreds of KB-sized parquet
  * files per index at bench scale, and task-count×buckets tiny files
  * at cluster scale. Every later read of the index then pays one scan
  * task and one footer per file, and the directory listing itself
  * outgrows the driver's inline-listing threshold.
  *
  * [[clusterBy]] inserts an AQE REBALANCE on the partition column(s)
  * immediately before the write: rows of one partition value land in
  * one task (one file) when small, and a hot value is split into
  * advisory-size-bounded tasks (size-bounded files) when large —
  * scale-adaptive by construction (`spark.sql.adaptive
  * .advisoryPartitionSizeInBytes` is the deployment's knob), no
  * constant tuned to either bench or cluster. The cost is one extra
  * shuffle of the written rows at build time; every index here is
  * write-once-read-many, which is exactly when paying a write-side
  * shuffle for read-side layout is the right trade (the Iceberg
  * `write.distribution-mode=hash` argument).
  */
private[graft] object WriteLayout {

  /** Cluster by the dynamic-partition column(s) before a
    * `partitionBy` write.
    */
  def clusterBy(df: DataFrame, cols: String*): DataFrame =
    df.hint("rebalance", cols: _*)

  /** Size-rebalance a non-partitioned write (collapse a tiny
    * many-task stage to few files; split oversized tasks).
    */
  def sized(df: DataFrame): DataFrame = df.hint("rebalance")
}
