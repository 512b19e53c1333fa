package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

/** Bottom-k-by-hash row sample as a native mergeable aggregate — the
  * quantile/distribution story at 100 TB: a per-group UNIFORM row
  * sample of bounded size, built map-side and merged like any sketch,
  * from which order statistics (p50/p90/p99), histograms, or any other
  * distributional summary derive WITHOUT a per-group sort of the data.
  * The classic exact formulations both funnel: `percentile(...)`
  * collects every group value onto one reducer, a window sort shuffles
  * the whole corpus. The sketch's shuffle carries ≤ k (hash, value)
  * pairs per group per map partition, independent of data volume.
  *
  * The sample rule is bottom-k sampling (Cohen & Kaplan 2007): keep the
  * k rows whose DETERMINISTIC hash (supplied by the caller, e.g.
  * [[graft.text.TextOps.hash32]] of the row key) is smallest, ordered
  * by `(hash, value)` with duplicate pairs kept — a multiset, so the
  * result is a pure function of the group's row CONTENTS, independent
  * of partitioning, merge order, or retries. That is also what makes it
  * hash-gateable: an external engine replays the exact sample with one
  * `row_number() OVER (ORDER BY hash, value) <= k`, and estimates
  * derived from the sample match value for value (no randomness, no
  * float accumulation — sampled values are carried verbatim).
  *
  * State: a bounded max-heap of (hash, value) pairs; update is O(log k)
  * per row, merge is heap union + trim. Output: the sample as an
  * ascending `array<struct<h: long, v: double>>`.
  */
case class BottomKXX(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[(Long, Double)]]
  with BinaryLike[Expression] {

  require(k > 1, s"k must be > 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_bottomk expects (bigint hash, double value), " +
          s"got (${l.sql}, ${r.sql})")
    }

  // max-heap on (hash, value): the root is the pair to evict
  private def newHeap(): java.util.PriorityQueue[(Long, Double)] =
    new java.util.PriorityQueue[(Long, Double)](
      math.min(k + 1, 1024),
      new java.util.Comparator[(Long, Double)] {
        override def compare(a: (Long, Double), b: (Long, Double)): Int = {
          val c = java.lang.Long.compare(b._1, a._1)
          if (c != 0) c else java.lang.Double.compare(b._2, a._2)
        }
      })

  override def createAggregationBuffer()
      : java.util.PriorityQueue[(Long, Double)] = newHeap()

  private def add(buf: java.util.PriorityQueue[(Long, Double)],
      h: Long, v: Double): Unit = {
    if (buf.size < k) { buf.add((h, v)); () }
    else {
      val top = buf.peek()
      if (h < top._1 || (h == top._1 && v < top._2)) {
        buf.poll(); buf.add((h, v)); ()
      }
    }
  }

  override def update(
      buf: java.util.PriorityQueue[(Long, Double)],
      input: InternalRow): java.util.PriorityQueue[(Long, Double)] = {
    val h = left.eval(input)
    val v = right.eval(input)
    if (h != null && v != null)
      add(buf, h.asInstanceOf[Long], v.asInstanceOf[Double])
    buf
  }

  override def merge(
      buf: java.util.PriorityQueue[(Long, Double)],
      other: java.util.PriorityQueue[(Long, Double)])
      : java.util.PriorityQueue[(Long, Double)] = {
    val it = other.iterator()
    while (it.hasNext) { val p = it.next(); add(buf, p._1, p._2) }
    buf
  }

  override def eval(
      buf: java.util.PriorityQueue[(Long, Double)]): Any = {
    val arr = buf.toArray(new Array[(Long, Double)](buf.size))
    java.util.Arrays.sort(arr, new java.util.Comparator[(Long, Double)] {
      override def compare(a: (Long, Double), b: (Long, Double)): Int = {
        val c = java.lang.Long.compare(a._1, b._1)
        if (c != 0) c else java.lang.Double.compare(a._2, b._2)
      }
    })
    new GenericArrayData(arr.map { p =>
      new GenericInternalRow(Array[Any](p._1, p._2))
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(
      buf: java.util.PriorityQueue[(Long, Double)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val p = it.next(); bb.putLong(p._1); bb.putDouble(p._2)
    }
    bb.array()
  }

  override def deserialize(
      bytes: Array[Byte]): java.util.PriorityQueue[(Long, Double)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = newHeap()
    var i = 0
    while (i < n) { add(buf, bb.getLong, bb.getDouble); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("h", LongType, nullable = false),
      StructField("v", DoubleType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bottomk"

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKXX =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKXX =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BottomKXX =
    copy(left = newLeft, right = newRight)
}
