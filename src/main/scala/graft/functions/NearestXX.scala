package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused nearest-neighbor kernel over one collected frame: input is the
  * frame's entities as `array<struct<e:bigint, x:double, y:double>>`,
  * output is `array<struct<entity:bigint, d:double, i:bigint>>` — for
  * every entity, the minimal `(round(euclidean, 6), neighbor)` pair by
  * `(d, i)` lexicographic order (the same struct-min tie-break as the
  * expression formulation in `FeatureStore.nearestDistance`).
  *
  * The expression formulation evaluates an O(k²) nested
  * transform/filter/array_min lambda per row in the interpreter,
  * allocating a struct per candidate; this kernel runs the same double
  * loop as compiled JVM code with zero per-candidate allocation, and the
  * generated call stays inside whole-stage codegen. Rounding replicates
  * Spark's `round` (BigDecimal.valueOf, HALF_UP) so results are
  * bit-identical to the HOF path and the DuckDB oracle.
  *
  * Entities with a null id or null coordinates are skipped (no output
  * entry, not a neighbor candidate); a singleton frame yields an empty
  * array, matching the join formulation where singletons drop out.
  */
object NearestXX {

  private def round6(v: Double): Double =
    // non-finite passes through, matching Spark's round() on NaN/Infinity
    // (BigDecimal.valueOf would throw NumberFormatException)
    if (java.lang.Double.isFinite(v))
      java.math.BigDecimal.valueOf(v)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    else v

  def compute(ents: ArrayData): ArrayData = {
    val n = ents.numElements()
    // unpack valid entities once — null struct / null field rows skipped
    val es = new Array[Long](n)
    val xs = new Array[Double](n)
    val ys = new Array[Double](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!ents.isNullAt(i)) {
        val r = ents.getStruct(i, 3)
        if (!r.isNullAt(0) && !r.isNullAt(1) && !r.isNullAt(2)) {
          es(m) = r.getLong(0)
          xs(m) = r.getDouble(1)
          ys(m) = r.getDouble(2)
          m += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](m)
    var k = 0
    i = 0
    while (i < m) {
      var bestD = Double.NaN
      var bestI = 0L
      var found = false
      var j = 0
      while (j < m) {
        if (es(j) != es(i)) {
          val dx = xs(i) - xs(j)
          val dy = ys(i) - ys(j)
          val d = round6(math.sqrt(dx * dx + dy * dy))
          // Double.compare orders NaN after every real value, matching
          // the struct-min/ORDER BY semantics of the expression path —
          // a NaN first candidate must not stick against later real
          // distances (plain `<` is always false vs NaN)
          val cmp = if (found) java.lang.Double.compare(d, bestD) else -1
          if (cmp < 0 || (cmp == 0 && es(j) < bestI)) {
            bestD = d
            bestI = es(j)
            found = true
          }
        }
        j += 1
      }
      if (found) {
        out(k) = new GenericInternalRow(
          Array[Any](es(i), bestD, bestI))
        k += 1
      }
      i += 1
    }
    new GenericArrayData(
      if (k == m) out else java.util.Arrays.copyOf(
        out.asInstanceOf[Array[AnyRef]], k))
  }
}

/** Catalyst expression for [[NearestXX.compute]]; one static call in
  * generated code, no interpreted lambdas.
  */
case class NearestPairsXX(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(a, b, c)), _)
        if a.dataType == LongType && b.dataType == DoubleType &&
          c.dataType == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nearest expects array<struct<bigint,double,double>>, " +
        s"got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("entity", LongType, nullable = false),
    StructField("d", DoubleType, nullable = false),
    StructField("i", LongType, nullable = false))))

  override def prettyName: String = "graft_nearest"

  override def nullSafeEval(ents: Any): Any =
    NearestXX.compute(ents.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, e => s"graft.functions.NearestXX.compute($e)")

  override protected def withNewChildInternal(
      newChild: Expression): NearestPairsXX = copy(child = newChild)
}
