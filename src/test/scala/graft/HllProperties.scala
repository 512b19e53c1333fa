package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{HllSketchXX, MinHashMd5XX}

/** Pure-JVM scalacheck properties for the HLL aggregate's algebra —
  * update/merge/serialize driven directly. The DataFrame-level and
  * oracle behavior is pinned by q166; THESE properties pin the state
  * machine: registers are exactly the per-bucket max rho however the
  * input is chunked, merged, or serialized, and the estimate tracks
  * true cardinality within the m = 64 error regime.
  */
object HllProperties extends Properties("HllSketchXX") {

  private val P = 6
  private val M = 1 << P
  private val agg =
    HllSketchXX(BoundReference(0, ArrayType(StringType), nullable = true), P)

  private def row(items: Seq[String]): InternalRow =
    InternalRow(new GenericArrayData(
      items.map(s => UTF8String.fromString(s)).toArray[Any]))

  private def sketchOf(chunks: Seq[Seq[String]]): Vector[Int] = {
    val bufs = chunks.map { c =>
      agg.update(agg.createAggregationBuffer(), row(c))
    }
    val merged = bufs.foldLeft(agg.createAggregationBuffer()) { (a, b) =>
      agg.merge(a, agg.deserialize(agg.serialize(b)))
    }
    val arr = agg.eval(merged).asInstanceOf[ArrayData]
    (0 until arr.numElements()).map(arr.getInt).toVector
  }

  /** Register vector computed the oracle's way: bucket = hv mod m,
    * w = hv div m, rho = 27 - bitlen(w), max per bucket.
    */
  private def reference(items: Seq[String]): Vector[Int] = {
    val regs = new Array[Int](M)
    items.foreach { s =>
      val h = MinHashMd5XX.hash32(
        s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val b = (h % M).toInt
      val w = h / M
      val rho = (32 - P) + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > regs(b)) regs(b) = rho
    }
    regs.toVector
  }

  private val genItems: Gen[List[String]] =
    Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr.map(_.take(12)),
      Gen.choose(0, 40).map(i => s"dup_$i"))) // force duplicates

  property("registers == per-bucket max rho of the md5 hash stream") =
    forAll(genItems) { items =>
      sketchOf(Seq(items)) == reference(items)
    }

  property("chunking + merge order never changes the registers") =
    forAll(genItems, Gen.choose(1, 7)) { (items, n) =>
      val chunks = items.grouped(math.max(1, n)).toSeq
      sketchOf(chunks) == reference(items) &&
        sketchOf(chunks.reverse) == reference(items)
    }

  property("nulls and empty chunks are ignored") =
    forAll(genItems) { items =>
      val withNull = InternalRow(new GenericArrayData(
        (items.map(s => UTF8String.fromString(s)) :+ null).toArray[Any]))
      val buf = agg.update(agg.createAggregationBuffer(), withNull)
      val arr = agg.eval(
        agg.merge(buf, agg.createAggregationBuffer()))
        .asInstanceOf[ArrayData]
      (0 until arr.numElements()).map(arr.getInt).toVector ==
        reference(items)
    }

  property("estimate lands within 3 standard errors (1.04/√64) for " +
    "cardinalities past the small range") =
    forAll(Gen.choose(500, 4000)) { n =>
      val items = (0 until n).map(i => s"card_item_$i")
      val regs = sketchOf(Seq(items))
      val z = regs.map(r => math.pow(2.0, -r)).sum
      val est = 0.709 * M * M / z
      // 3σ at m=64 is ~39%; generous but catches a broken rho/bucket
      math.abs(est - n) < 0.39 * n * 3
    }
}
