package graft.operators

import org.apache.spark.sql.SparkSession
import scala.util.Try

/** Pool health probes (SURVEY.md §2.1 S7; reference
  * `/root/reference/scripts/diagnose_pool.py:8-60`): directory exists,
  * ≥1 parquet file found, schema readable, one row fetchable — each as a
  * cheap metadata-or-limit(1) operation, never a full scan.
  */
object Diagnose {

  final case class Report(
      rootExists: Boolean,
      parquetFiles: Long,
      schemaFields: Seq[String],
      oneRowFetchable: Boolean) {
    def healthy: Boolean = rootExists && parquetFiles > 0 &&
      schemaFields.nonEmpty && oneRowFetchable
  }

  def apply(spark: SparkSession, root: String): Report = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(root)
    val exists = Try(fs.exists(p)).getOrElse(false)
    if (!exists) return Report(false, 0, Nil, false)

    val it = fs.listFiles(p, true)
    var nParquet = 0L
    while (it.hasNext) {
      if (it.next().getPath.getName.endsWith(".parquet")) nParquet += 1
    }
    val df = Try(spark.read.parquet(root))
    val fields = df.map(_.schema.fieldNames.toSeq).getOrElse(Nil)
    val oneRow = df.map(_.limit(1).count() == 1).getOrElse(false)
    Report(exists, nParquet, fields, oneRow)
  }
}
