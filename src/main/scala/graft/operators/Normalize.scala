package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.schema.{ColumnSpec, SchemaConfig}

/** Alias-resolving, schema-enforcing projection (SURVEY.md §2.2 P1-P3;
  * reference semantics `/root/reference/src/ingest.py:26-44`):
  *
  *  - for each spec column the first source column present among its
  *    candidates wins → `col(src).cast(dtype).as(name)`
  *  - absent + default     → `lit(default).cast(dtype).as(name)`
  *  - absent + allow_null  → `lit(null).cast(dtype).as(name)`
  *  - absent + required    → column dropped, recorded in `dropped`
  *  - undeclared source columns are never carried through
  *
  * Pure `Column` algebra — compiles into the scan projection, so Catalyst
  * prunes unread source columns at the reader and the whole normalize is
  * codegen'd. No UDFs, no driver-side row work: at 100 TB the projection
  * runs entirely inside the scan stage.
  */
object Normalize {

  final case class Plan(columns: Seq[Column], dropped: Seq[String]) {
    def apply(df: DataFrame): DataFrame = df.select(columns: _*)
  }

  /** Compile a normalize plan against a concrete source schema. Matching is
    * exact-name first, then case-insensitive (the vintages mix camelCase,
    * snake_case and Capitalized headers).
    */
  def compile(sourceColumns: Seq[String], config: SchemaConfig): Plan = {
    val exact = sourceColumns.toSet
    val byLower = sourceColumns.groupBy(_.toLowerCase).view
      .mapValues(_.head).toMap

    val cols = Vector.newBuilder[Column]
    val dropped = Vector.newBuilder[String]

    config.columns.foreach { spec =>
      resolve(spec, exact, byLower) match {
        case Some(src) =>
          cols += tolerantCast(src, spec.dtype).as(spec.name)
        case None =>
          spec.default match {
            case Some(d) => cols += lit(d).cast(spec.dtype).as(spec.name)
            case None if spec.allowNull =>
              cols += lit(null).cast(spec.dtype).as(spec.name)
            case None => dropped += spec.name
          }
      }
    }
    Plan(cols.result(), dropped.result())
  }

  def apply(df: DataFrame, config: SchemaConfig): DataFrame = {
    val plan = compile(df.schema.fieldNames.toSeq, config)
    if (plan.dropped.nonEmpty) {
      // mirror the reference's warn-and-continue (src/ingest.py:40-42)
      System.err.println(
        s"[normalize] missing required columns dropped: " +
          plan.dropped.mkString(", "))
    }
    plan(df)
  }

  /** Reference-equivalent tolerant cast (`ignore_errors=True`,
    * src/ingest.py:23): malformed values become null instead of failing
    * the ANSI cast. Integral targets additionally accept float-formatted
    * text ("4365.0" — a pandas export artifact in real BDB drops) via a
    * double hop; the direct try_cast is preferred so 64-bit values larger
    * than a double's 53-bit mantissa never lose precision.
    */
  private def tolerantCast(src: String, dt: org.apache.spark.sql.types.DataType): Column = {
    import org.apache.spark.sql.types._
    val q = s"`$src`"
    dt match {
      case ByteType | ShortType | IntegerType | LongType =>
        expr(s"coalesce(try_cast($q AS ${dt.sql}), " +
          s"try_cast(try_cast($q AS DOUBLE) AS ${dt.sql}))")
      case _ =>
        expr(s"try_cast($q AS ${dt.sql})")
    }
  }

  private def resolve(
      spec: ColumnSpec,
      exact: Set[String],
      byLower: Map[String, String]): Option[String] = {
    spec.candidates.collectFirst { case c if exact(c) => c }
      .orElse(spec.candidates.collectFirst {
        case c if byLower.contains(c.toLowerCase) => byLower(c.toLowerCase)
      })
  }
}
