package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native kernel for the SimHash document fingerprint: the exact
  * arithmetic of the HOF formulation in [[graft.text.TextOps.simhashExpr]]
  * — per token the portable md5-derived 32-bit hash
  * ([[MinHashMd5XX.hash32]]), a ±1 vote per bit, majority → bit set —
  * fused into one compiled loop per token array.
  *
  * The HOF chain allocates a fresh `bits`-element vote array per token
  * (`aggregate` + `zip_with`) and evaluates `3·bits` interpreted lambda
  * frames per token; the kernel keeps one local int array and is
  * branch-only, which is where the win comes from. All integer
  * arithmetic on the same md5 bytes ⇒ bit-identical to the HOF version
  * and to the DuckDB oracle's rendering (q21 hash gate).
  *
  * Null-token semantics match the fold exactly: a null element hashes
  * to null, `null & mask > 0` is null, and `when(null, 1).otherwise(-1)`
  * votes -1 on every bit. Empty arrays yield 0.
  */
object SimHashXX {

  def compute(arr: ArrayData, bits: Int): Long = {
    val votes = new Array[Int](bits)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      var h = 0L
      var isNull = true
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        if (s != null) {
          h = MinHashMd5XX.hash32(s.getBytes)
          isNull = false
        }
      }
      var b = 0
      while (b < bits) {
        votes(b) += (if (!isNull && (h & (1L << b)) != 0L) 1 else -1)
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }
}

/** Catalyst expression wrapping [[SimHashXX.compute]]; one static-shaped
  * call in generated code — no interpreter hop.
  */
case class SimHashFpXX(child: Expression, bits: Int)
    extends UnaryExpression {

  require(bits > 0 && bits <= 63, "bits must be in [1, 63]")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_simhash expects array<string>, got ${other.sql}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_simhash"

  /** Public for generated code. */
  def computeRow(arr: ArrayData): Long = SimHashXX.compute(arr, bits)

  override def nullSafeEval(input: Any): Any =
    computeRow(input.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhash", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.computeRow($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): SimHashFpXX = copy(child = newChild)
}
