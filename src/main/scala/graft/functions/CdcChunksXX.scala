package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking as a native kernel — the storage-dedup
  * primitive (Muthitacharoen et al. 2001 LBFS; FastCDC is the modern
  * gear variant): split text at positions where a rolling window's
  * hash hits a mask, so chunk boundaries move WITH the content. An
  * insertion early in a document shifts every fixed-size block but
  * leaves almost all content-defined chunks byte-identical — which is
  * why chunk-hash dedup catches the "same boilerplate, one edit"
  * redundancy that document-level exact dedup misses and shingle
  * near-dup can only score, not excise.
  *
  * The boundary rule is deliberately the ORACLE-REPLAYABLE flavor:
  * a boundary closes after code-point position `i` (1-based,
  * `window ≤ i < n`) iff `hash32(md5(text[i-window+1 .. i]))` ≡ 0
  * (mod `mask`) — the same first-8-hex-digits md5 domain every gate
  * hash rides, computed over CHARACTER windows (`substr` semantics in
  * both engines; code points, not UTF-16 units). A production gear
  * hash would be cheaper per byte, but md5 windows make the whole
  * chunk table replay in SQL (q172); the kernel's job is doing it in
  * ONE compiled pass (thread-local digest, no per-position lambda
  * interpretation or substring Column plumbing).
  *
  * Invariant: `concat(chunks) == text` (empty text yields one empty
  * chunk). Expected chunk length ≈ `mask` characters.
  */
object CdcChunksXX {

  def compute(s: UTF8String, window: Int, mask: Int): GenericArrayData = {
    val str = s.toString
    val cps = str.codePoints().toArray
    val n = cps.length
    if (n == 0)
      return new GenericArrayData(Array[Any](UTF8String.EMPTY_UTF8))
    val out = new scala.collection.mutable.ArrayBuffer[Any](4)
    var start = 0 // 0-based inclusive chunk start (code points)
    var i = window // 1-based window END position
    while (i < n) {
      val win = new String(cps, i - window, window)
      if (MinHashMd5XX.hash32(
          win.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          % mask == 0) {
        out += UTF8String.fromString(new String(cps, start, i - start))
        start = i
      }
      i += 1
    }
    out += UTF8String.fromString(new String(cps, start, n - start))
    new GenericArrayData(out.toArray)
  }
}

/** Catalyst expression wrapping [[CdcChunksXX.compute]]; `window` and
  * `mask` are literal parameters (see [[graft.GraftExtensions]]).
  */
case class CdcChunksExprXX(child: Expression, window: Int, mask: Int)
  extends UnaryExpression {

  require(window >= 2 && window <= 64,
    s"window must be in [2, 64], got $window")
  require(mask >= 2, s"mask must be >= 2, got $mask")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_cdc_chunks expects string, got ${other.sql}")
    }

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_cdc_chunks"

  override def nullSafeEval(input: Any): Any =
    CdcChunksXX.compute(input.asInstanceOf[UTF8String], window, mask)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CdcChunksXX.compute($c, " +
        s"$window, $mask);")

  override protected def withNewChildInternal(
      newChild: Expression): CdcChunksExprXX = copy(child = newChild)
}
