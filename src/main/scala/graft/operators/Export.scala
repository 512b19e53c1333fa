package graft.operators

import org.apache.spark.sql.DataFrame

/** CSV export sink (SURVEY.md §2.1 S6; reference `/root/reference/src/
  * export.py`, `scripts/random_plays_sampler.py:96-99`): canonical 4-key
  * sort, single header CSV for small sampled batches, sharded CSV for big
  * ones (a single-file dump of a 100 TB result would serialize through one
  * task — only coalesce when the result is sample-sized).
  */
object Export {

  def sortedCanonical(df: DataFrame): DataFrame = {
    val want = Seq("gameId", "playId", "frameId", "nflId")
      .filter(df.columns.contains)
    if (want.isEmpty) df else df.orderBy(want.map(df.col): _*)
  }

  /** Small sampled batch → one CSV file with header. */
  def csvSingle(df: DataFrame, path: String): Unit =
    sortedCanonical(df).coalesce(1)
      .write.option("header", "true").mode("overwrite").csv(path)

  /** Large result → parallel CSV shards. */
  def csvSharded(df: DataFrame, path: String): Unit =
    df.write.option("header", "true").mode("overwrite").csv(path)

  /** JSON-Lines export — the interchange format LLM training pipelines
    * consume (one JSON object per line). Sharded by default: each task
    * writes its partition, so a 100 TB result streams out in parallel;
    * pass `shards` to bound the file count for small batches (a
    * repartition, not a coalesce — coalesce(k) would also collapse the
    * UPSTREAM computation to k tasks).
    */
  def jsonl(df: DataFrame, path: String, shards: Int = 0): Unit = {
    val out = if (shards > 0) df.repartition(shards) else df
    out.write.mode("overwrite").json(path)
  }
}
