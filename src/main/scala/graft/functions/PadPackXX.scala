package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Fused sort→strip→pad kernel for tensor packing: input is an
  * `array<struct<...sortFields..., payload>>`, output is the payloads of
  * the structs in full-struct ascending order (identical semantics to
  * `sort_array`), padded with `pad` / truncated to `maxN` elements —
  * or, when `maxN <= 0`, just sorted and stripped (the trajectory
  * shape, no padding).
  *
  * Replaces the `sort_array` + `transform` + `concat(array_repeat)` +
  * `slice` expression chain that Tensor.toTensor evaluated per row: four
  * interpreted passes with an intermediate array each become ONE call
  * sorting struct references in place. Ordering comes from Catalyst's
  * own interpreted struct ordering (`TypeUtils.getInterpretedOrdering`),
  * so tie-breaks — including deep comparison of equal leading fields
  * down to the payload — are bit-identical to `sort_array`.
  */
case class PadPackXX(ents: Expression, pad: Expression, maxN: Int)
    extends BinaryExpression {

  override def left: Expression = ents
  override def right: Expression = pad

  @transient private lazy val structType: StructType =
    ents.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
  @transient private lazy val nFields: Int = structType.size
  @transient private lazy val payloadType: DataType =
    structType.fields.last.dataType
  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(structType)

  // null struct elements sort first, matching sort_array asc; hoisted so
  // the hot path allocates nothing per row
  @transient private lazy val nullFirstCmp: java.util.Comparator[AnyRef] =
    new java.util.Comparator[AnyRef] {
      private val ord = ordering.asInstanceOf[java.util.Comparator[AnyRef]]
      override def compare(a: AnyRef, b: AnyRef): Int =
        if (a == null && b == null) 0
        else if (a == null) -1
        else if (b == null) 1
        else ord.compare(a, b)
    }

  override def checkInputDataTypes(): TypeCheckResult = ents.dataType match {
    case ArrayType(st: StructType, _) if st.size >= 2 =>
      if (DataType.equalsStructurally(pad.dataType,
          st.fields.last.dataType, ignoreNullability = true))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"pad type ${pad.dataType.sql} must match payload type " +
          s"${st.fields.last.dataType.sql}")
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_padpack expects array<struct<..., payload>> with at least " +
        s"one sort field, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(payloadType)

  override def prettyName: String = "graft_padpack"

  /** Public so generated code can call through the expression reference. */
  def pack(arr: ArrayData, padVal: Any): ArrayData = {
    val n = arr.numElements()
    val rows = new Array[AnyRef](n)
    var i = 0
    while (i < n) {
      rows(i) = if (arr.isNullAt(i)) null else arr.getStruct(i, nFields)
      i += 1
    }
    java.util.Arrays.sort(rows, nullFirstCmp)
    val outN = if (maxN > 0) maxN else n
    val keep = math.min(n, outN)
    val out = new Array[Any](outN)
    i = 0
    while (i < keep) {
      val r = rows(i).asInstanceOf[InternalRow]
      out(i) = if (r == null) null else r.get(nFields - 1, payloadType)
      i += 1
    }
    while (i < outN) { out(i) = padVal; i += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(arr: Any, padVal: Any): Any =
    pack(arr.asInstanceOf[ArrayData], padVal)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("padpack", this)
    nullSafeCodeGen(ctx, ev, (e, p) => s"${ev.value} = $ref.pack($e, $p);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PadPackXX =
    copy(ents = newLeft, pad = newRight)
}
