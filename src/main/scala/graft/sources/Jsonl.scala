package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSON-Lines source — the read-side twin of
  * [[graft.operators.Export.jsonl]] and the ingest format LLM corpora
  * actually arrive in (one JSON object per line: Dolma, RedPajama, C4
  * dumps all ship this way). Mirrors the CSV pool's philosophy
  * (reference `/root/reference/src/ingest.py:23-38` — permissive
  * parse, bad input isolated rather than failing the job):
  * a malformed LINE is quarantined into a side channel instead of
  * killing the batch, and the declared schema is enforced on read.
  *
  * Scale shape (100 TB of .jsonl):
  *  - the schema is REQUIRED, never inferred — inference is a full
  *    extra pass over the data before the real one;
  *  - uncompressed (or zstd/bzip2) JSONL is newline-splittable, so one
  *    giant file still fans out across executors; gzip is NOT
  *    splittable (one task per .gz file) — callers with gzip corpora
  *    should size files to ~HDFS-block and rely on file-level
  *    parallelism;
  *  - parsing is scan-stage (no shuffle); column pruning works at the
  *    parser level (Jackson skips unprojected fields) though, unlike
  *    parquet, every byte is still read — JSONL is an INTERCHANGE
  *    format; convert to parquet at the pool boundary
  *    ([[graft.operators.Ingest]]) for anything queried twice.
  */
object Jsonl {

  /** The quarantine column carrying the raw text of unparseable lines. */
  val CorruptCol = "_corrupt_record"

  /** Read `path` as JSONL with `schema` enforced. Returns the declared
    * columns plus [[CorruptCol]]: NULL for clean rows; the raw line for
    * malformed ones (whose declared columns are all NULL). Split with
    * [[clean]] / [[corrupt]].
    *
    * Deliberately a text scan + [[from_json]] rather than
    * `spark.read.json`: the json datasource refuses any plan that
    * projects only the quarantine column
    * (`UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN` — the
    * exact query [[corrupt]] exists for, and the documented workaround
    * is caching the whole input), while `from_json` is an ordinary
    * expression with the same PERMISSIVE semantics: a field that fails
    * to cast nulls out, a line that fails to parse lands in
    * [[CorruptCol]] byte-for-byte, so the quarantine is
    * re-processable. Catalyst's `OptimizeCsvJsonExprs` still prunes
    * unprojected fields out of the parse. Blank lines are skipped
    * (matching the json datasource, which ignores them).
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not declare $CorruptCol — the reader adds it")
    val withCorrupt = StructType(
      schema.fields :+ StructField(CorruptCol, StringType, nullable = true))
    val parsed = from_json(
      col("value"), withCorrupt,
      Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptCol))
    spark.read.text(path)
      .filter(length(trim(col("value"))) > 0)
      .select(parsed.as("_r"))
      .select(col("_r.*"))
  }

  /** Clean rows only, quarantine column dropped — the frame downstream
    * operators consume.
    */
  def clean(df: DataFrame): DataFrame =
    df.filter(col(CorruptCol).isNull).drop(CorruptCol)

  /** The quarantined raw lines (observability / re-processing side).
    *
    * Spark refuses a query that projects ONLY the corrupt column of a
    * JSON scan (the parser would have nothing to fail on), so the
    * filter keeps a declared column in the plan before projecting.
    */
  def corrupt(df: DataFrame): DataFrame =
    df.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"))

  /** One-row health probe: (n_clean, n_corrupt) in a single pass —
    * the JSONL twin of [[graft.operators.Diagnose.poolHealth]].
    */
  def health(df: DataFrame): DataFrame =
    df.agg(
      sum(when(col(CorruptCol).isNull, 1L).otherwise(0L)).as("n_clean"),
      sum(when(col(CorruptCol).isNotNull, 1L).otherwise(0L)).as("n_corrupt"))
}
