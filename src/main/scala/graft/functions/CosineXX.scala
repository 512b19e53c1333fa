package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Fused cosine-similarity kernel over two `array<float>` vectors: dot
  * product and both norms accumulate in ONE pass over the arrays (the
  * expression formulation runs three separate folds + zip_with alloc per
  * pair). Accumulation order matches the HOF/oracle chain exactly —
  * element-wise double widening, sequential left-to-right sums — so the
  * result is bit-identical to `SimSearch.cosine` and to the DuckDB
  * oracle's `list_reduce` rendering; swapping kernels cannot flip a hash.
  *
  * Ragged or null-element inputs yield NULL, matching the HOF's
  * `zip_with` padding semantics — a malformed vector surfaces instead
  * of silently ranking on a truncated prefix. The one deliberate
  * divergence: a zero-norm vector scores 0.0 (the HOF's 0/0 is NaN) so
  * thresholds and ranks stay total.
  */
object CosineXX {
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val na0 = a.numElements()
    val nb0 = b.numElements()
    if (na0 != nb0) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < na0) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }
}

/** Catalyst expression for [[CosineXX.compute]]; codegen emits one static
  * call and stays inside whole-stage codegen.
  */
case class CosineSimXX(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_cosine expects two array<float>, got ${l.sql}, ${r.sql}")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_cosine"

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineXX.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val res = ctx.freshName("cosres")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""java.lang.Double $res = graft.functions.CosineXX.compute($a, $b);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $res.doubleValue(); }""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimXX =
    copy(left = newLeft, right = newRight)
}
