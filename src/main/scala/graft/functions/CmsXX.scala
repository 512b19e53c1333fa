package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Count-Min Sketch as a native mergeable aggregate — the per-item
  * FREQUENCY companion to the KMV cardinality sketch ([[KmvSketchXX]]):
  * estimate how often any item occurs in a 100 TB stream without the
  * groupBy-count that shuffles every distinct item. State is a fixed
  * `depth × width` counter grid (Cormode & Muthukrishnan 2005): each
  * item increments one bucket per row (independent universal hashes),
  * a probe reads the MIN across its row buckets — an overestimate,
  * never an underestimate, with error ≤ 2N/width at 1-2^-depth
  * confidence. Counters are ADDITIVE, so partial aggregation and merge
  * are elementwise sums — order-independent, hence deterministic and
  * oracle-replayable.
  *
  * Hashing reuses the engine's md5-hash32 % P domain and the
  * [[graft.text.TextOps.minhashParams]] universal-hash family, both
  * already replayed value-for-value by the DuckDB oracle gates.
  */
object CmsXX {
  val P: Long = 2147483647L
}

/** The aggregate: array<string> column in (items with multiplicity —
  * each row's array is folded in whole), flat `depth*width` long array
  * out (row-major: bucket b of hash-row r at index r*width + b).
  */
case class CmsSketchXX(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(depth > 0 && depth <= 16, s"depth must be in [1,16], got $depth")
  require(width > 1, s"width must be > 1, got $width")

  @transient private lazy val params: (Array[Long], Array[Long]) = {
    val ps = (0 until depth).map(graft.text.TextOps.minhashParams)
    (ps.map(_._1).toArray, ps.map(_._2).toArray)
  }

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_cms_sketch expects array<string>, got ${other.sql}")
    }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val (as, bs) = params
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val s = arr.getUTF8String(i)
          if (s != null) {
            val h = MinHashMd5XX.hash32(s.getBytes) % CmsXX.P
            var r = 0
            while (r < depth) {
              val bucket = (((as(r) * h + bs(r)) % CmsXX.P) % width).toInt
              buf(r * width + bucket) += 1L
              r += 1
            }
          }
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_cms_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketchXX =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketchXX =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): CmsSketchXX = copy(child = newChild)
}
