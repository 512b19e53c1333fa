package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Co-located joins: two tables bucketed + sorted on the same key must
  * merge with zero Exchange operators in the physical plan — the
  * shuffle-free J2 / side-car join shape for the 100 TB lake.
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed split tables merge without any exchange") {
    val in = spark.range(0, 10000).select(
      col("id").as("k"), (col("id") % 97).as("payload_in"))
    val out = spark.range(0, 10000).select(
      col("id").as("k"), (col("id") % 31).as("payload_out"))
    Relational.writeBucketed(in, "bk_in", Seq("k"), 8)
    Relational.writeBucketed(out, "bk_out", Seq("k"), 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the merge path (broadcast would hide the bucketing)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Relational.mergeSplit(
        spark.table("bk_in"), spark.table("bk_out"), Seq("k"))
      assert(joined.count() == 10000L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bk_in")
      spark.sql("DROP TABLE IF EXISTS bk_out")
    }
  }
}
