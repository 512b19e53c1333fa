package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{PlayOps, Relational, Tensor}

/** Scratch micro-timer for per-query investigation (not part of the
  * driver contract; removed when the investigation ends).
  */
object ScratchTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def spreadDf(df: DataFrame) =
      df.repartition(spark.sparkContext.defaultParallelism)

    def q05(df: DataFrame) =
      PlayOps.telemetry(df, Seq("l_orderkey"),
        frameCol = "l_linenumber", speedCol = "l_quantity",
        entityCol = "l_partkey", eventCol = "l_returnflag")
    def q09(df: DataFrame) =
      PlayOps.trajectoriesFlat(df, Seq("l_orderkey"), "l_linenumber",
        Seq("l_partkey", "l_suppkey", "l_quantity"))
    def q10(df: DataFrame) = {
      val frames = df.select(
        col("l_orderkey").as("gameId"), lit(1).as("playId"),
        col("l_linenumber").as("frameId"),
        col("l_suppkey").cast("int").as("nflId"),
        lit("offense").as("team"),
        col("l_quantity").as("x"), col("l_discount").as("y"))
      Tensor.toTensor(frames, Seq("x", "y"), maxFrames = 8, maxEntities = 8)
    }
    def q28(sf: Int) = {
      val dim = spark.read.parquet(s"$sfDir/orders.parquet").select(
        col("o_orderkey").as("l_orderkey"),
        col("o_orderstatus"), col("o_totalprice"))
      Relational.saltedJoin(
        li.select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "l_quantity"),
        dim, Seq("l_orderkey"), saltFactor = sf)
    }

    def q22(df: DataFrame) =
      graft.operators.FeatureStore.nearestDistance(df,
        frameKeys = Seq("l_orderkey"), entityCol = "l_linenumber",
        xCol = "l_quantity", yCol = "l_discount")

    val cases: Seq[(String, () => DataFrame)] = Seq(
      "q22_spread" -> (() => q22(spreadDf(li))),
      "q22_bare" -> (() => q22(li)),
      "q05_spread" -> (() => q05(spreadDf(li))),
      "q05_bare" -> (() => q05(li)),
      "q09_spread" -> (() => q09(spreadDf(li))),
      "q09_bare" -> (() => q09(li)),
      "q10_spread" -> (() => q10(spreadDf(li))),
      "q10_bare" -> (() => q10(li)),
      "q28_salt8" -> (() => q28(8)),
      "q28_salt4" -> (() => q28(4)),
      "q28_plain" -> (() => {
        val dim = spark.read.parquet(s"$sfDir/orders.parquet").select(
          col("o_orderkey").as("l_orderkey"),
          col("o_orderstatus"), col("o_totalprice"))
        li.select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "l_quantity").join(dim, Seq("l_orderkey"))
      }))

    def time(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    val named = args.drop(1).map(n =>
      n -> (() => SparkEntry.queries(n)(spark, sfDir)))
    val allCases = if (named.nonEmpty) named.toSeq else cases
    allCases.foreach { case (_, f) => time(f) } // warmup
    allCases.foreach { case (n, f) =>
      val ts = (1 to 3).map(_ => time(f))
      println(f"SCRATCH $n min=${ts.min}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
