package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{KmvSketchXX, MinHashMd5XX}

/** Pure-JVM scalacheck properties for the KMV aggregate's algebra —
  * update/merge/serialize driven directly (no Spark jobs, so hundreds
  * of generated cases run in milliseconds). The DataFrame-level
  * behavior is pinned in SkewApproxSpec; THESE properties pin the
  * state machine itself: the sketch is exactly the k smallest distinct
  * hashes however the input is chunked, merged, or serialized.
  */
object KmvProperties extends Properties("KmvSketchXX") {

  private val K = 16
  private val agg =
    KmvSketchXX(BoundReference(0, ArrayType(StringType), nullable = true), K)

  private def row(items: Seq[String]): InternalRow =
    InternalRow(new GenericArrayData(
      items.map(s => UTF8String.fromString(s)).toArray[Any]))

  private def sketchOf(chunks: Seq[Seq[String]]): Vector[Long] = {
    val bufs = chunks.map { c =>
      agg.update(agg.createAggregationBuffer(), row(c))
    }
    val merged = bufs.foldLeft(agg.createAggregationBuffer())(agg.merge)
    val arr = agg.eval(merged).asInstanceOf[ArrayData]
    (0 until arr.numElements()).map(arr.getLong).toVector
  }

  private def reference(items: Seq[String]): Vector[Long] =
    items.map(s => MinHashMd5XX.hash32(
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      .distinct.sorted.take(K).toVector

  private val genItems: Gen[List[String]] =
    Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr.map(_.take(12)),
      Gen.choose(0, 40).map(i => s"dup_$i"))) // force duplicates

  property("sketch == k smallest distinct hashes, sorted") =
    forAll(genItems) { items =>
      sketchOf(Seq(items)) == reference(items)
    }

  property("chunking + merge order never changes the sketch") =
    forAll(genItems, Gen.choose(1, 7)) { (items, n) =>
      val chunks = items.grouped(math.max(1, n)).toSeq
      sketchOf(chunks) == reference(items) &&
        sketchOf(chunks.reverse) == reference(items)
    }

  property("duplicated input collapses to the same sketch") =
    forAll(genItems) { items =>
      sketchOf(Seq(items ++ items, items)) == reference(items)
    }

  property("serialize/deserialize round-trips the buffer exactly") =
    forAll(genItems) { items =>
      val buf = agg.update(agg.createAggregationBuffer(), row(items))
      val back = agg.deserialize(agg.serialize(buf))
      back.equals(buf)
    }
}

/** Same treatment for the Count-Min frequency sketch: additive-merge
  * counters mean ANY chunking sums to the whole-input grid, and the
  * min-over-rows probe never undercounts.
  */
object CmsProperties extends Properties("CmsSketchXX") {

  private val Depth = 4
  private val Width = 64
  private val agg = graft.functions.CmsSketchXX(
    BoundReference(0, ArrayType(StringType), nullable = true),
    Depth, Width)

  private def row(items: Seq[String]): InternalRow =
    InternalRow(new GenericArrayData(
      items.map(s => UTF8String.fromString(s)).toArray[Any]))

  private def grid(chunks: Seq[Seq[String]]): Vector[Long] = {
    val bufs = chunks.map { c =>
      agg.update(agg.createAggregationBuffer(), row(c))
    }
    val merged = bufs.foldLeft(agg.createAggregationBuffer())(agg.merge)
    merged.toVector
  }

  private def estimate(g: Vector[Long], term: String): Long = {
    val h = MinHashMd5XX.hash32(
      term.getBytes(java.nio.charset.StandardCharsets.UTF_8)) %
      graft.functions.CmsXX.P
    (0 until Depth).map { r =>
      val (a, b) = graft.text.TextOps.minhashParams(r)
      g(r * Width + (((a * h + b) % graft.functions.CmsXX.P) % Width).toInt)
    }.min
  }

  private val genItems: Gen[List[String]] =
    Gen.listOf(Gen.choose(0, 30).map(i => s"item_$i"))

  property("chunking + merge order sums to the whole-input grid") =
    forAll(genItems, Gen.choose(1, 7)) { (items, n) =>
      val chunks = items.grouped(math.max(1, n)).toSeq
      grid(chunks) == grid(Seq(items)) &&
        grid(chunks.reverse) == grid(Seq(items))
    }

  property("probe estimate never undercounts the true frequency") =
    forAll(genItems) { items =>
      val g = grid(Seq(items))
      items.distinct.forall { t =>
        estimate(g, t) >= items.count(_ == t)
      }
    }

  property("total mass per hash row equals the item count") =
    forAll(genItems) { items =>
      val g = grid(Seq(items))
      (0 until Depth).forall { r =>
        g.slice(r * Width, (r + 1) * Width).sum == items.size
      }
    }

  property("serialize/deserialize round-trips the grid exactly") =
    forAll(genItems) { items =>
      val buf = agg.update(agg.createAggregationBuffer(), row(items))
      agg.deserialize(agg.serialize(buf)).toVector == buf.toVector
    }
}
