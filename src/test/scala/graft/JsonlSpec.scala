package graft

import org.apache.spark.sql.functions._
import graft.sources.Jsonl

/** JSONL sink/source contract: lossless roundtrip (including newlines
  * and quotes inside text — the JSON escaper's job), corrupt-line
  * quarantine instead of job failure, and the health probe.
  */
class JsonlSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    (1L, "plain text", "en"),
    (2L, "line one\nline two\ttabbed", "en"),
    (3L, "quotes \" and \\ backslash and unicode é中", "fr"),
    (4L, "", "de"))

  test("roundtrip is lossless, including escapes") {
    val dir = tmpDir("jsonl_rt")
    val df = rows.toDF("doc_id", "text", "lang")
    graft.operators.Export.jsonl(df, dir, shards = 2)
    val back = Jsonl.clean(Jsonl.read(spark, dir, df.schema))
    assert(back.orderBy("doc_id").collect().toSeq ===
      df.orderBy("doc_id").collect().toSeq)
  }

  test("corrupt lines quarantine byte-for-byte; clean rows survive") {
    val dir = tmpDir("jsonl_bad")
    val df = rows.toDF("doc_id", "text", "lang")
    graft.operators.Export.jsonl(df, dir, shards = 1)
    // poison the directory with a part file holding garbage lines
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "part-junk.json"),
      "not json at all\n{\"doc_id\": 9, \"text\": \"ok tail\", \"lang\": \"en\"}\n{broken\n")
    val back = Jsonl.read(spark, dir, df.schema)
    val health = Jsonl.health(back).collect()(0)
    assert(health.getLong(0) === 5L) // 4 originals + the valid junk-file line
    assert(health.getLong(1) === 2L)
    assert(Jsonl.corrupt(back).as[String].collect().toSet ===
      Set("not json at all", "{broken"))
    assert(Jsonl.clean(back).filter(col("doc_id") === 9L).count() === 1L)
  }

  test("reader rejects a schema that declares the quarantine column") {
    val df = rows.toDF("doc_id", "text", "lang")
    val bad = org.apache.spark.sql.types.StructType(df.schema.fields :+
      org.apache.spark.sql.types.StructField(
        Jsonl.CorruptCol, org.apache.spark.sql.types.StringType))
    intercept[IllegalArgumentException] {
      Jsonl.read(spark, tmpDir("jsonl_schema"), bad)
    }
  }
}
