package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Fused squared-Euclidean-distance kernel: one compiled pass of
  * `acc += (x-y)·(x-y)` over two equal-length vectors, replacing the
  * interpreted `zip_with` + fold chain (which also allocates the
  * difference array per pair). Accumulation order and widening match
  * [[graft.sim.SimSearch.dist2]] exactly — element-wise double casts,
  * sequential left-to-right sum from 0.0 — so the result is
  * bit-identical to the HOF and to the oracle's `list_reduce`
  * rendering. Either side may be `array<float>` or `array<double>`
  * (k-means compares raw float vectors against double centroids).
  */
case class Dist2XX(left: Expression, right: Expression)
    extends BinaryExpression {

  @transient private lazy val leftDouble: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == DoubleType
  @transient private lazy val rightDouble: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  private def ok(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dist2 expects array<float|double> on both sides, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dist2"

  /** Public for generated code. Boxed so the HOF's null semantics are
    * preserved exactly: `zip_with` pads a length mismatch with nulls
    * and any null term nulls the whole fold — so unequal lengths or a
    * null element yield NULL, never a silently-truncated number.
    */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na != nb) return null
    var acc = 0.0
    var i = 0
    while (i < na) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (leftDouble) a.getDouble(i) else a.getFloat(i).toDouble
      val y = if (rightDouble) b.getDouble(i) else b.getFloat(i).toDouble
      val d = x - y
      acc += d * d
      i += 1
    }
    acc
  }

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dist2", this)
    val res = ctx.freshName("d2res")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""java.lang.Double $res = $ref.compute($a, $b);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $res.doubleValue(); }""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Dist2XX =
    copy(left = newLeft, right = newRight)
}
