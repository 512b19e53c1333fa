package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native kernel for the ORACLE-REPLAYABLE md5 MinHash flavor: the exact
  * arithmetic of [[graft.text.TextOps.minhashSig]] — portable 32-bit hash
  * = first 8 md5 hex digits as an unsigned int, `% P`, then per lane
  * `(a_j * h + b_j) % P` minima with the [[graft.text.TextOps.minhashParams]]
  * parameters — in one compiled pass per shingle array.
  *
  * Everything is integer arithmetic on the same md5 bytes, so the result
  * is bit-identical to the HOF formulation and to the DuckDB oracle's
  * rendering (proven by the q14/q15/q16/q29/q33 hash gates); the kernel
  * just removes the interpreted lambda + per-lane array allocation per
  * shingle. Empty shingle sets yield the all-P sentinel signature,
  * exactly like the fold's `array_repeat(P)` initial state; null
  * elements are skipped (the fold's `least(cur, null)` no-op).
  *
  * [[MinHashSigXX]] (xxhash64) stays the cheaper production flavor when
  * no external engine needs to replay signatures.
  */
object MinHashMd5XX {

  val P: Long = 2147483647L

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 4 md5 bytes as an unsigned 32-bit value — identical to
    * `conv(substring(md5(s), 1, 8), 16, 10)`.
    */
  def hash32(bytes: Array[Byte]): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(bytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  def compute(arr: ArrayData, as: Array[Long], bs: Array[Long]): ArrayData = {
    val numHashes = as.length
    val lanes = new Array[Long](numHashes)
    java.util.Arrays.fill(lanes, P)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        if (s != null) {
          val h = hash32(s.getBytes) % P
          var j = 0
          while (j < numHashes) {
            val v = (as(j) * h + bs(j)) % P
            if (v < lanes(j)) lanes(j) = v
            j += 1
          }
        }
      }
      i += 1
    }
    new GenericArrayData(lanes)
  }
}

/** Catalyst expression wrapping [[MinHashMd5XX.compute]]; the parameter
  * arrays ride along as a codegen reference object, and the generated
  * code is one static-shaped call — no interpreter hop.
  */
case class MinHashSigMd5XX(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes > 0, "numHashes must be positive")

  @transient private lazy val params: (Array[Long], Array[Long]) = {
    val ps = (0 until numHashes).map(graft.text.TextOps.minhashParams)
    (ps.map(_._1).toArray, ps.map(_._2).toArray)
  }

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_minhash_md5 expects array<string>, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_minhash_md5"

  /** Public for generated code. */
  def computeRow(arr: ArrayData): ArrayData =
    MinHashMd5XX.compute(arr, params._1, params._2)

  override def nullSafeEval(input: Any): Any =
    computeRow(input.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashMd5", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.computeRow($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): MinHashSigMd5XX = copy(child = newChild)
}
