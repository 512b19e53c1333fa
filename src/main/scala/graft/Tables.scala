package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's parquet tables (TESTDATA.md).
  * One parquet file per table under `$dir/<name>.parquet`.
  *
  * Note the tables are single-file, single-row-group parquet, so a bare
  * scan is ONE task. We deliberately do NOT blanket-repartition here: a
  * round-robin shuffle of every row costs more than the narrow scan saves
  * (measured: +60% on the gate total). Queries whose dominant cost is
  * per-row compute above the scan (the text/vector kernels) opt into a
  * spread via `SparkEntry.docs`; relational queries keep the shuffle-free
  * scan, which Catalyst parallelizes from the first exchange onward.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
