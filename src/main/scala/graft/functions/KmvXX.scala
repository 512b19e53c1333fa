package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** KMV (k-minimum-values) distinct-count sketch as a native mergeable
  * aggregate — the cardinality story at 100 TB: per-group distinct
  * counts WITHOUT a distinct shuffle. Exact `count(distinct gram)`
  * moves every distinct value to its group's reducer; the sketch's
  * state is a bounded sorted set of the k smallest hash values, built
  * map-side from the RAW (duplicate-laden) stream — duplicates collapse
  * to the same hash — and merged as a set union + trim, so the shuffle
  * carries ≤ k longs per group per map partition, independent of data
  * volume (Bar-Yossef et al. 2002, the classic KMV estimator).
  *
  * Hashing is [[MinHashMd5XX.hash32]] (first 4 md5 bytes, unsigned →
  * [0, 2^32)), the oracle-replayable domain already proven by the
  * minhash gates: an external engine reproduces the sketch — not just
  * the estimate — value for value, which is what makes a SKETCH
  * hash-gateable at all (estimate = (k-1) / (kth/2^32), derived
  * declaratively so both engines share one IEEE chain).
  *
  * The input column is the per-row gram ARRAY (no explode): each row
  * folds all its grams into the buffer in one call.
  */
object KmvXX {
  /** Hash domain size: hash32 values lie in [0, 2^32). */
  val Domain: Double = 4294967296.0
}

/** The aggregate: array<string> column in, sorted ascending array of
  * the k smallest distinct hash32 values out (shorter than k when the
  * group holds fewer distinct values — then the sketch IS the exact
  * distinct set and the estimate falls back to its size).
  */
case class KmvSketchXX(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k > 1, s"k must be > 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_kmv_sketch expects array<string>, got ${other.sql}")
    }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(
      buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last && buf.add(h)) { buf.pollLast(); () }
  }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
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

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(
      buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(
      bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv_sketch"

  override def withNewMutableAggBufferOffset(
      newOffset: Int): KmvSketchXX =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(
      newOffset: Int): KmvSketchXX =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): KmvSketchXX = copy(child = newChild)
}
