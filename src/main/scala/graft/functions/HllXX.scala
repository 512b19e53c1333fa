package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** HyperLogLog register sketch as a native mergeable aggregate — the
  * industry-standard distinct counter (Flajolet et al. 2007) beside
  * the repo's KMV tier: state is a FIXED m = 2^p byte array regardless
  * of cardinality (KMV's k-longs set is exact below k but still
  * value-shaped), registers merge by elementwise MAX, so partials
  * build map-side from the raw duplicate-laden gram stream and the
  * shuffle carries m bytes per group per map partition.
  *
  * Hashing is [[MinHashMd5XX.hash32]] (first 4 md5 bytes, unsigned →
  * [0, 2^32)) — the oracle-replayable domain the minhash/KMV gates
  * proved. The register decomposition is pure integer arithmetic an
  * external engine reproduces register for register:
  *
  *   bucket = hv mod m          (low bits — md5 bits are exchangeable)
  *   w      = hv div m          (the remaining 32 − p bits)
  *   rho(w) = (32 − p) + 1 − bitlen(w)   (bitlen 0 when w = 0)
  *
  * so `reg[b] = max rho over the bucket's stream` and the classic
  * estimate alpha_m·m² / Σ 2^−reg derives DECLARATIVELY off the
  * register array (the Σ 2^(maxrho − reg) numerator is an exact
  * BIGINT — see q166), keeping every float in one shared IEEE chain.
  */
object HllXX {
  /** Valid precision range: m = 2^p registers, 16 … 4096. */
  val MinP = 4
  val MaxP = 12
}

/** The aggregate: array<string> gram column in, array<int> of the
  * m = 2^p register values out (0 for never-hit buckets). Each input
  * row folds its whole gram array into the buffer in one call — no
  * explode.
  */
case class HllSketchXX(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] {

  require(p >= HllXX.MinP && p <= HllXX.MaxP,
    s"p must be in [${HllXX.MinP}, ${HllXX.MaxP}], got $p")

  private val m = 1 << p
  private val wBits = 32 - p

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_hll_sketch expects array<string>, got ${other.sql}")
    }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  private def add(buf: Array[Byte], h: Long): Unit = {
    val bucket = (h % m).toInt
    val w = h / m
    // rho = (32-p) + 1 - bitlen(w); bitlen(0) = 0 so empty w maxes out
    val rho = (wBits + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w)))
      .toByte
    if (rho > buf(bucket)) buf(bucket) = rho
  }

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val s = arr.getUTF8String(i)
          if (s != null) add(buf, MinHashMd5XX.hash32(s.getBytes))
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) {
      if (other(i) > buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Byte]): Any = {
    val out = new Array[Int](m)
    var i = 0
    while (i < m) { out(i) = buf(i).toInt; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_hll_sketch"

  override def withNewMutableAggBufferOffset(
      newOffset: Int): HllSketchXX =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(
      newOffset: Int): HllSketchXX =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): HllSketchXX = copy(child = newChild)
}
