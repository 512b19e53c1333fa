package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Whole-tensor packing kernel: the full `(frames × entities × features)`
  * pivot from ONE collected array of raw entity structs
  * `array<struct<frameKey, ...entitySortFields..., payload>>` — group by
  * the leading frame key, order entities inside each frame, order frames
  * by the key, pad/truncate both axes — in a single compiled call.
  *
  * This replaces the two-aggregation formulation (per-frame pack, then
  * per-play pack): one hash aggregation and ONE shuffle instead of two
  * over the full tracking volume — at 100 TB the removed exchange is the
  * dominant cost of tensor creation. Output order is bit-identical to
  * the staged version: the global struct sort orders by (frameKey, then
  * entity fields), which equals "frames by key, entities by
  * (fields, payload) within a frame" because the frame key leads the
  * struct; Catalyst's own interpreted ordering supplies every tie-break.
  *
  * Returns `struct<n_frames int, tensor array<array<payload>>>` where
  * `n_frames` counts distinct frame keys BEFORE padding/truncation
  * (the staged `size(collect_list(...))` semantics). Null array elements
  * cannot occur on the aggregation path (`collect_list` drops nulls) and
  * are skipped defensively here.
  */
case class TensorPackXX(
    ents: Expression, pad: Expression, maxEntities: Int, maxFrames: Int)
    extends BinaryExpression {

  require(maxEntities > 0, "maxEntities must be positive")
  require(maxFrames > 0, "maxFrames must be positive")

  override def left: Expression = ents
  override def right: Expression = pad

  @transient private lazy val structType: StructType =
    ents.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
  @transient private lazy val nFields: Int = structType.size
  @transient private lazy val frameKeyType: DataType =
    structType.fields.head.dataType
  @transient private lazy val payloadType: DataType =
    structType.fields.last.dataType
  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(structType)
  @transient private lazy val keyOrdering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(frameKeyType)
  @transient private lazy val cmp: java.util.Comparator[AnyRef] =
    ordering.asInstanceOf[java.util.Comparator[AnyRef]]

  override def checkInputDataTypes(): TypeCheckResult = ents.dataType match {
    case ArrayType(st: StructType, _) if st.size >= 2 =>
      if (DataType.equalsStructurally(pad.dataType,
          st.fields.last.dataType, ignoreNullability = true))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"pad type ${pad.dataType.sql} must match payload type " +
          s"${st.fields.last.dataType.sql}")
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_tensorpack expects array<struct<frameKey, ..., payload>>, " +
        s"got ${other.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_frames", IntegerType, nullable = false),
    StructField("tensor", ArrayType(ArrayType(payloadType)))))

  override def prettyName: String = "graft_tensorpack"

  /** Public so generated code can call through the expression reference. */
  def pack(arr: ArrayData, padVal: Any): InternalRow = {
    val n = arr.numElements()
    val rows = new Array[AnyRef](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) { rows(m) = arr.getStruct(i, nFields); m += 1 }
      i += 1
    }
    java.util.Arrays.sort(rows, 0, m, cmp)

    // one padded frame built once and shared for every padding slot —
    // ArrayData values are immutable here
    lazy val zeroFrame: GenericArrayData = {
      val e = new Array[Any](maxEntities)
      java.util.Arrays.fill(e.asInstanceOf[Array[AnyRef]],
        padVal.asInstanceOf[AnyRef])
      new GenericArrayData(e)
    }

    val frames = new Array[Any](maxFrames)
    var nFrames = 0
    i = 0
    while (i < m) {
      // run of equal frame keys [i, j)
      val key = rows(i).asInstanceOf[InternalRow].get(0, frameKeyType)
      var j = i + 1
      while (j < m && keyOrdering.compare(
          rows(j).asInstanceOf[InternalRow].get(0, frameKeyType), key) == 0) {
        j += 1
      }
      if (nFrames < maxFrames) {
        val ents = new Array[Any](maxEntities)
        val keep = math.min(j - i, maxEntities)
        var k = 0
        while (k < keep) {
          ents(k) = rows(i + k).asInstanceOf[InternalRow]
            .get(nFields - 1, payloadType)
          k += 1
        }
        while (k < maxEntities) { ents(k) = padVal; k += 1 }
        frames(nFrames) = new GenericArrayData(ents)
      }
      nFrames += 1
      i = j
    }
    var f = math.min(nFrames, maxFrames)
    while (f < maxFrames) { frames(f) = zeroFrame; f += 1 }
    new GenericInternalRow(Array[Any](nFrames, new GenericArrayData(frames)))
  }

  override def nullSafeEval(arr: Any, padVal: Any): Any =
    pack(arr.asInstanceOf[ArrayData], padVal)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tensorpack", this)
    nullSafeCodeGen(ctx, ev, (e, p) => s"${ev.value} = $ref.pack($e, $p);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TensorPackXX =
    copy(ents = newLeft, pad = newRight)
}
