package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Fused signature-agreement kernel: the number of positions where two
  * MinHash signatures carry the same value — the per-candidate-pair
  * verify step of every LSH near-dup path (`Dedup.estJaccard`). The HOF
  * formulation allocates a zipped boolean array plus a filtered copy
  * PER PAIR; at 100 TB the verify filter runs on billions of candidate
  * pairs, so the branch-only loop matters. Exactly the HOF semantics:
  * positions where either lane is null (including `zip_with` padding of
  * a shorter array) do not count as agreement, so the swap is
  * bit-invisible to the q16/q29 oracle hash gates.
  */
object SigAgreeXX {
  def compute(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var agree = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) &&
        a.getLong(i) == b.getLong(i)) agree += 1
      i += 1
    }
    agree
  }
}

/** Catalyst expression for [[SigAgreeXX.compute]]; one static call in
  * generated code, stays inside whole-stage codegen.
  */
case class SigAgreeXX(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_sig_agree expects two array<bigint>, got ${l.sql}, ${r.sql}")
    }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_sig_agree"

  override def nullSafeEval(a: Any, b: Any): Any =
    SigAgreeXX.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SigAgreeXX.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SigAgreeXX =
    copy(left = newLeft, right = newRight)
}
