package graft.cli

import org.apache.spark.sql.SparkSession
import graft.operators.{Diagnose, Export, Ingest, Pool}
import graft.schema.Vintages

/** CLI entry points mirroring the reference's Makefile workflow
  * (`/root/reference/Makefile:52-69`: ingest / dump / diagnose):
  *
  * {{{
  * graft.cli.Main ingest  <inputDir> <poolRoot> [vintage] [--dry-run]
  * graft.cli.Main dump    <poolRoot> <outDir> [n] [seed]
  * graft.cli.Main diagnose <poolRoot>
  * }}}
  *
  * vintage ∈ {canonical, bdb2018, bdb2026} (Vintages.byName).
  */
object Main {

  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = args.toList match {
    case "ingest" :: input :: poolRoot :: rest =>
      val vintage = rest.find(!_.startsWith("--")).getOrElse("canonical")
      val config = Vintages.byName.getOrElse(vintage,
        sys.error(s"unknown vintage $vintage; " +
          s"one of ${Vintages.byName.keys.mkString(", ")}"))
      val dryRun = rest.contains("--dry-run")
      val spark = session()
      val res = Ingest.run(spark, input, poolRoot, config, dryRun)
      println(s"[ingest] rows=${res.summary.rows} " +
        s"games=${res.summary.games} plays=${res.summary.plays} " +
        s"maxFrame=${res.summary.maxFrame.getOrElse(-1)} " +
        s"badFiles=${res.badFiles.size}")
      res.badFiles.foreach(f => println(s"[ingest]   skipped: $f"))
      spark.stop()

    case "dump" :: poolRoot :: outDir :: rest =>
      val n = rest.headOption.map(_.toInt).getOrElse(10)
      val seed = rest.drop(1).headOption.map(_.toLong).getOrElse(42L)
      val spark = session()
      Export.csvSingle(Pool(spark, poolRoot).samplePlays(n, Nil, seed),
        outDir)
      println(s"[dump] $n plays (seed $seed) → $outDir")
      spark.stop()

    case "diagnose" :: poolRoot :: Nil =>
      val spark = session()
      val rep = Diagnose(spark, poolRoot)
      println(s"[diagnose] rootExists=${rep.rootExists} " +
        s"parquetFiles=${rep.parquetFiles} " +
        s"fields=${rep.schemaFields.size} oneRow=${rep.oneRowFetchable} " +
        s"healthy=${rep.healthy}")
      spark.stop()
      if (!rep.healthy) sys.exit(1)

    case _ =>
      System.err.println(
        "usage: ingest <in> <pool> [vintage] [--dry-run] | " +
          "dump <pool> <out> [n] [seed] | diagnose <pool>")
      sys.exit(2)
  }
}
