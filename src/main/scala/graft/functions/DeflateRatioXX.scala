package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernel for the compression-ratio quality signal (the Gopher-
  * family "compressibility" filter): `deflate(utf8(text)).length /
  * utf8(text).length`. Highly repetitive spam compresses far below
  * natural prose (ratio ≪ natural-text band), near-random noise sits
  * above it — both tails are drop candidates for a training corpus.
  *
  * NOT an oracle-gateable number: the ratio depends on the zlib level
  * and implementation, so it is a single-engine heuristic — stable
  * within one JVM/zlib (fixed `BEST_SPEED` level), compared against
  * thresholds calibrated on the same setup, and deliberately kept out
  * of hash-compared gate outputs.
  *
  * Per-row cost discipline: a `Deflater` wraps native zlib state that
  * is expensive to allocate and MUST be `end()`ed — one per row would
  * thrash JNI allocations. Each executor thread reuses one instance
  * from a ThreadLocal (`reset()` between rows); zlib streams are
  * confined to their thread, and Spark task threads are long-lived, so
  * the leak-free reuse pattern is safe.
  *
  * Empty text returns 0.0 by convention (nothing to compress — callers
  * filter empties with the length stats first); null propagates.
  */
object DeflateRatioXX {

  private val deflaters = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED)
  }

  private val buffers = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](8192)
  }

  def compute(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.length == 0) return 0.0
    val d = deflaters.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = buffers.get()
    var out = 0L
    while (!d.finished()) out += d.deflate(buf)
    out.toDouble / bytes.length
  }
}

/** Catalyst expression wrapping [[DeflateRatioXX.compute]] — one static
  * call in generated code.
  */
case class DeflateRatioExprXX(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_deflate_ratio expects string, got ${other.sql}")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_deflate_ratio"

  override def nullSafeEval(input: Any): Any =
    DeflateRatioXX.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DeflateRatioXX.compute($c);")

  override protected def withNewChildInternal(
      newChild: Expression): DeflateRatioExprXX = copy(child = newChild)
}
