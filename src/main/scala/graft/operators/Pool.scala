package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Query handle over the partitioned tracking pool (SURVEY.md §2/§3.2;
  * reference `GridironQuery`, `/root/reference/src/query.py`).
  *
  * All methods return lazy DataFrames; nothing is collected to the driver.
  * Partition discovery makes `season`/`gameId` partition columns, so
  * game-keyed filters prune to single directories
  * (`PruneFileSourcePartitions`), and the key-universe query reads only the
  * two key columns thanks to column pruning. The generic algebra lives in
  * [[Relational]]; this is the tracking-schema veneer.
  */
final case class Pool(spark: SparkSession, root: String) {

  private val keyCols = Seq("gameId", "playId")

  def df: DataFrame = spark.read.parquet(root)

  /** AND-fold caller predicates (reference `src/query.py:34-36`). */
  def filtered(filters: Seq[Column]): DataFrame =
    Relational.filtered(df, filters)

  /** Distinct play universe under the filters (`src/query.py:39-43`). */
  def playKeys(filters: Seq[Column] = Nil): DataFrame =
    Relational.distinctKeys(filtered(filters), keyCols)

  /** Sampled keys only (driver-friendly small result).
    *
    * Exact-n seeded sampling has no direct Spark primitive: `sample()` is
    * fraction-based and partitioning-dependent. Ranking by
    * `xxhash64(gameId, playId, seed)` is deterministic for a given seed,
    * stable under any partitioning / cluster size, and `limit(n)` makes it
    * exact. The reference's degenerate branches (`src/query.py:45-52`:
    * empty → empty, fewer-than-n → all) fall out of `limit` semantics with
    * no driver-side count.
    */
  def sampleKeys(
      n: Int, filters: Seq[Column] = Nil, seed: Long = 42L): DataFrame =
    Relational.sampleExact(
      playKeys(filters), n,
      Relational.hashRank(keyCols.map(col), seed), keyCols.map(col))

  /** Seeded, exact-n, no-replacement play sample joined back to all frames
    * of the chosen plays (`src/query.py:31-55`). The sampled key set is
    * ≤ n rows → broadcast hash join back to the pool (no shuffle of the big
    * side; at 100 TB the pool is never moved).
    */
  def samplePlays(
      n: Int, filters: Seq[Column] = Nil, seed: Long = 42L): DataFrame =
    Relational.joinBack(filtered(filters), sampleKeys(n, filters, seed),
      keyCols)
}
