package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Ingest
import graft.schema.SchemaConfig

/** Structured-Streaming incremental ingest: the streaming twin of the
  * reference's "re-run `make ingest` over new CSV drops" workflow
  * (SURVEY.md §2.9). New CSV files landing in `inputDir` are picked up by
  * the file source, normalized with the SAME `Normalize` plan as batch
  * ingest, and upserted into the partitioned pool via `foreachBatch` +
  * dynamic partition overwrite — exactly the per-game overwrite semantics
  * of `src/ingest.py:82-87`, but continuous.
  *
  * At scale: the file source tracks processed files in the checkpoint (no
  * re-reads), each micro-batch is one distributed normalize+write job, and
  * dynamic overwrite touches only the partitions present in the batch.
  */
object StreamingIngest {

  def start(
      spark: SparkSession,
      inputDir: String,
      poolRoot: String,
      config: SchemaConfig,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    // file streaming source needs an explicit schema: all-string, same as
    // the batch path — Normalize recasts in the same stage
    val probe = spark.read.option("header", "true").csv(inputDir)
    val stringSchema = org.apache.spark.sql.types.StructType(
      probe.schema.fields.map(f =>
        org.apache.spark.sql.types.StructField(
          f.name, org.apache.spark.sql.types.StringType, nullable = true)))

    spark.readStream
      .option("header", "true")
      .schema(stringSchema)
      .csv(inputDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Ingest.writePool(graft.operators.Normalize(batch, config), poolRoot)
      }
      .start()
  }
}
