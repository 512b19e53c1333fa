package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.schema.SchemaConfig

/** CSV → normalized, Hive-partitioned parquet pool (SURVEY.md §2.1 S1/S2/S5,
  * §3.1; reference `/root/reference/src/ingest.py:89-115`).
  *
  * Layout: `poolRoot/season=YYYY/gameId=<id>/part-*.parquet` with
  * `season = substring(gameId, 1, 4)` derived exactly like the reference
  * (`src/ingest.py:74`). Re-ingesting a game replaces only that game's
  * partition: dynamic partition overwrite ≡ the reference's fixed-filename
  * upsert (`src/ingest.py:82-87`).
  *
  * Scale notes: `ingestAll` reads the whole input glob as ONE job — at
  * 100 TB that is the right shape (massively parallel scan, no driver loop;
  * the partitioned write is shuffle-free map-side work). `run` keeps the
  * reference's per-file error isolation (`src/ingest.py:98-115`) for messy
  * drops where one corrupt CSV must not fail the batch — file counts there
  * are small, so the loop is driver-cheap.
  */
object Ingest {

  /** The four summary stats the reference prints after ingest
    * (`src/ingest.py:46-57`), computed in a single aggregation pass.
    */
  final case class Summary(
      rows: Long, games: Long, plays: Long, maxFrame: Option[Int])

  final case class Result(summary: Summary, badFiles: Seq[String])

  def loadCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("inferSchema", "true") // reference: infer_schema_length=10000
      .option("mode", "PERMISSIVE")  // reference: ignore_errors=True
      .csv(path)

  def loadAndNormalize(
      spark: SparkSession, path: String, config: SchemaConfig): DataFrame =
    Normalize(loadCsv(spark, path), config)

  def summarize(df: DataFrame): Summary = {
    val row = df.agg(
      count(lit(1)).as("rows"),
      countDistinct(col("gameId")).as("games"),
      countDistinct(col("gameId"), col("playId")).as("plays"),
      max(col("frameId")).as("maxFrame")).head()
    Summary(row.getLong(0), row.getLong(1), row.getLong(2),
      if (row.isNullAt(3)) None else Some(row.getInt(3)))
  }

  /** Season partition key derived from the gameId prefix
    * (`src/ingest.py:74`: `season = str(game_id)[:4]`).
    */
  def withSeason(df: DataFrame): DataFrame =
    df.withColumn(
      "season", substring(col("gameId").cast("string"), 1, 4).cast("int"))

  def writePool(df: DataFrame, poolRoot: String): Unit =
    withSeason(df)
      .filter(col("gameId").isNotNull) // reference skips null group keys
      .write
      .partitionBy("season", "gameId")
      .option("partitionOverwriteMode", "dynamic") // per-game upsert
      .mode("overwrite")
      .parquet(poolRoot)

  /** Whole-directory ingest as one distributed job (the 100 TB path). */
  def ingestAll(
      spark: SparkSession,
      inputGlob: String,
      poolRoot: String,
      config: SchemaConfig,
      dryRun: Boolean = false): Summary = {
    val normalized = loadAndNormalize(spark, inputGlob, config)
    if (!dryRun) writePool(normalized, poolRoot)
    summarize(normalized)
  }

  /** Per-file ingest with error isolation (reference behaviour:
    * one bad CSV warns and is skipped, the rest land).
    */
  def run(
      spark: SparkSession,
      inputDir: String,
      poolRoot: String,
      config: SchemaConfig,
      dryRun: Boolean = false): Result = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val files = fs.globStatus(
      new org.apache.hadoop.fs.Path(s"$inputDir/*.csv"))
      .map(_.getPath.toString).sorted
    require(files.nonEmpty, s"no CSV files found in $inputDir")

    val bad = Vector.newBuilder[String]
    val frames = files.flatMap { f =>
      try Some(loadAndNormalize(spark, f, config))
      catch {
        case e: Exception =>
          System.err.println(s"[ingest] skipping $f: ${e.getMessage}")
          bad += f
          None
      }
    }
    val all = frames.reduceLeft(_ unionByName _)
    if (!dryRun) writePool(all, poolRoot)
    Result(summarize(all), bad.result())
  }
}
