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

  /** One emitted HLL update: running batch count, zero-register count
    * and the raw harmonic-mean estimate.
    */
  case class HllUpdate(
      key: String, batches: Long, n_zero_regs: Int, est: Double)

  /** Internal HLL state: the m = 2^p register bytes. */
  case class HllState(regs: Array[Byte], batches: Long)

  /** Streaming twin of the batch HLL aggregate
    * ([[graft.functions.HllSketchXX]], q166): per-key state is the
    * FIXED 2^p register bytes — even tighter than the KMV twin's
    * k longs — merged across micro-batches by elementwise max, which
    * is idempotent and order-free, so replays and duplicated batches
    * can never inflate the count. Same register arithmetic as the
    * batch kernel: a batch re-run over the accumulated stream
    * reproduces every register, and the estimate is the q166 chain
    * (`α₆₄·m²·2^w / Σ 2^(w−reg)` at p-dependent scale).
    */
  def hllStream(
      grams: Dataset[(String, Seq[String])],
      p: Int = 6): Dataset[HllUpdate] = {
    require(p >= graft.functions.HllXX.MinP &&
      p <= graft.functions.HllXX.MaxP, s"p out of range: $p")
    val m = 1 << p
    val wBits = 32 - p
    val stateEnc = org.apache.spark.sql.Encoders.product[HllState]
    val outEnc = org.apache.spark.sql.Encoders.product[HllUpdate]
    implicit val keyEnc = org.apache.spark.sql.Encoders.STRING

    def fn(key: String, rows: Iterator[(String, Seq[String])],
        state: org.apache.spark.sql.streaming.GroupState[HllState])
        : HllUpdate = {
      val regs = state.getOption.map(_.regs.clone())
        .getOrElse(new Array[Byte](m))
      rows.foreach(_._2.foreach { g =>
        if (g != null) {
          val h = MinHashMd5XX.hash32(
            g.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          val b = (h % m).toInt
          val w = h / m
          val rho = (wBits + 1 -
            (64 - java.lang.Long.numberOfLeadingZeros(w))).toByte
          if (rho > regs(b)) regs(b) = rho
        }
      })
      val batches = state.getOption.map(_.batches).getOrElse(0L) + 1
      state.update(HllState(regs, batches))
      val zNum = regs.foldLeft(0L)((a, r) =>
        a + (1L << (wBits + 1 - r))) // Σ 2^(w+1−reg), exact
      // the standard Flajolet bias constants by register count
      val alphaM = m match {
        case 16 => 0.673
        case 32 => 0.697
        case 64 => 0.709
        case _ => 0.7213 / (1.0 + 1.079 / m)
      }
      val alpha = alphaM * m * m
      val est = BigDecimal(
        alpha * math.pow(2.0, wBits + 1) / zNum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      HllUpdate(key, batches, regs.count(_ == 0), est)
    }

    grams.groupByKey(_._1)
      .mapGroupsWithState[HllState, HllUpdate](
        GroupStateTimeout.NoTimeout)(fn)(stateEnc, outEnc)
  }

  /** One emitted quantile refresh: running batch count, sample fill,
    * and the p50/p90/p99 order-statistic estimates.
    */
  case class QuantileUpdate(
      key: String, batches: Long, m: Int,
      p50: Double, p90: Double, p99: Double)

  /** Internal running sample (parallel (hash, value) arrays sorted by
    * (hash, value) — the [[graft.functions.BottomKXX]] multiset).
    */
  case class SampleState(
      hs: Array[Long], vs: Array[Double], batches: Long)

  /** Streaming quantiles — the running per-key value distribution as a
    * stateful twin of the batch bottom-k sample aggregate
    * ([[graft.functions.BottomKXX]], q104): state per key is the
    * bounded k-smallest-hash row sample, each micro-batch folds its
    * `(key, rowId, value)` rows in (hash = the portable md5-hash32 of
    * the row id, so replays and batch re-runs agree), and every update
    * emits refreshed p50/p90/p99. Exact streaming quantiles need every
    * value ever seen; the sample state is k pairs forever, and a batch
    * [[graft.operators.Relational.bottomKSample]] over the accumulated
    * rows reproduces the stream's sample — and therefore its estimates
    * — exactly (same hash domain, same (hash, value) multiset rule,
    * same `floor(q·(m−1))+1` rank).
    */
  def quantileStream(
      rows: Dataset[(String, Long, Double)],
      k: Int = 256): Dataset[QuantileUpdate] = {
    require(k > 1, s"k must be > 1, got $k")
    val stateEnc = org.apache.spark.sql.Encoders.product[SampleState]
    val outEnc = org.apache.spark.sql.Encoders.product[QuantileUpdate]
    implicit val keyEnc = org.apache.spark.sql.Encoders.STRING

    def fn(key: String, batch: Iterator[(String, Long, Double)],
        state: org.apache.spark.sql.streaming.GroupState[SampleState])
        : QuantileUpdate = {
      val ord = new java.util.Comparator[(Long, Double)] {
        override def compare(a: (Long, Double), b: (Long, Double)): Int = {
          val c = java.lang.Long.compare(b._1, a._1)
          if (c != 0) c else java.lang.Double.compare(b._2, a._2)
        }
      }
      val heap = new java.util.PriorityQueue[(Long, Double)](
        math.min(k + 1, 1024), ord) // max-heap: root is the evictee
      def add(h: Long, v: Double): Unit = {
        if (heap.size < k) { heap.add((h, v)); () }
        else {
          val top = heap.peek()
          if (h < top._1 || (h == top._1 && v < top._2)) {
            heap.poll(); heap.add((h, v)); ()
          }
        }
      }
      state.getOption.foreach { s =>
        var i = 0
        while (i < s.hs.length) { add(s.hs(i), s.vs(i)); i += 1 }
      }
      batch.foreach { case (_, id, v) =>
        add(MinHashMd5XX.hash32(
          id.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)),
          v)
      }
      val pairs = heap.toArray(new Array[(Long, Double)](heap.size))
        .sortBy(p => (p._1, p._2))
      val batches = state.getOption.map(_.batches).getOrElse(0L) + 1
      state.update(SampleState(
        pairs.map(_._1), pairs.map(_._2), batches))
      val vs = pairs.map(_._2).sorted
      def q(p: Double): Double =
        if (vs.isEmpty) Double.NaN
        else vs(math.floor(p * (vs.length - 1)).toInt)
      QuantileUpdate(key, batches, vs.length, q(0.5), q(0.9), q(0.99))
    }

    rows.groupByKey(_._1)
      .mapGroupsWithState[SampleState, QuantileUpdate](
        GroupStateTimeout.NoTimeout)(fn)(stateEnc, outEnc)
  }
}
