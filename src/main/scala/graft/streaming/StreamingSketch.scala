package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.GroupStateTimeout

import graft.functions.{KmvXX, MinHashMd5XX}

/** Streaming distinct-cardinality — the running per-key "how many
  * distinct grams have we EVER seen" counter, as a stateful streaming
  * twin of the batch KMV aggregate ([[graft.functions.KmvSketchXX]],
  * q100): state per key is the bounded k-min-hash sketch (k longs, no
  * growth with stream length), each micro-batch folds its grams in,
  * and every update emits the refreshed estimate.
  *
  * This is the property that makes sketches the streaming answer:
  * exact streaming distinct-count needs unbounded state (every value
  * ever seen); the KMV state is k longs forever, duplicates collapse
  * to the same hash across batches, and the estimate is the SAME
  * arithmetic as the batch flavor — a batch re-run over the
  * accumulated corpus reproduces the stream's answer exactly (same
  * md5-hash32 domain, same (k-1)/(kth/2^32) chain, scale-6 rounding).
  */
object StreamingSketch {

  /** One emitted update: running batch count, sketch fill, estimate. */
  case class SketchUpdate(
      key: String, batches: Long, k_actual: Int, est_distinct: Double)

  /** Internal running state (public only for the product encoder). */
  case class SketchState(mins: Array[Long], batches: Long)

  /** `grams`: (key, gram-array) rows. Returns one [[SketchUpdate]] per
    * key per micro-batch (use `outputMode("update")`).
    */
  def cardinalityStream(
      grams: Dataset[(String, Seq[String])],
      k: Int = 128): Dataset[SketchUpdate] = {
    require(k > 1, s"k must be > 1, got $k")
    val stateEnc = org.apache.spark.sql.Encoders.product[SketchState]
    val outEnc = org.apache.spark.sql.Encoders.product[SketchUpdate]
    implicit val keyEnc = org.apache.spark.sql.Encoders.STRING

    def fn(key: String, rows: Iterator[(String, Seq[String])],
        state: org.apache.spark.sql.streaming.GroupState[SketchState])
        : SketchUpdate = {
      val buf = new java.util.TreeSet[java.lang.Long]()
      def add(h: Long): Unit = {
        if (buf.size < k) { buf.add(h); () }
        else if (h < buf.last && buf.add(h)) { buf.pollLast(); () }
      }
      state.getOption.foreach(_.mins.foreach(add))
      rows.foreach(_._2.foreach { g =>
        if (g != null)
          add(MinHashMd5XX.hash32(
            g.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      })
      val mins = {
        val out = new Array[Long](buf.size)
        val it = buf.iterator(); var i = 0
        while (it.hasNext) { out(i) = it.next(); i += 1 }
        out
      }
      val batches = state.getOption.map(_.batches).getOrElse(0L) + 1
      state.update(SketchState(mins, batches))
      val est =
        if (mins.length < k) mins.length.toDouble
        else BigDecimal((k - 1).toDouble * KmvXX.Domain / mins.last)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      SketchUpdate(key, batches, mins.length, est)
    }

    grams.groupByKey(_._1)
      .mapGroupsWithState[SketchState, SketchUpdate](
        GroupStateTimeout.NoTimeout)(fn)(stateEnc, outEnc)
  }
}
