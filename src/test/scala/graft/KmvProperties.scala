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

/** Same treatment for the bottom-k sample aggregate: the sample is the
  * k lexicographically-smallest (hash, value) pairs AS A MULTISET —
  * equal pairs kept — however the input is chunked, merged, or
  * serialized.
  */
object BottomKProperties extends Properties("BottomKXX") {

  private val K = 8
  private val agg = graft.functions.BottomKXX(
    BoundReference(0, org.apache.spark.sql.types.LongType,
      nullable = true),
    BoundReference(1, org.apache.spark.sql.types.DoubleType,
      nullable = true), K)

  private def sampleOf(
      chunks: Seq[Seq[(Long, Double)]]): Vector[(Long, Double)] = {
    val bufs = chunks.map { c =>
      c.foldLeft(agg.createAggregationBuffer()) { (b, p) =>
        agg.update(b, InternalRow(p._1, p._2))
      }
    }
    val merged = bufs.foldLeft(agg.createAggregationBuffer())(agg.merge)
    val arr = agg.eval(merged).asInstanceOf[ArrayData]
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 2)
      (r.getLong(0), r.getDouble(1))
    }.toVector
  }

  private def reference(
      pairs: Seq[(Long, Double)]): Vector[(Long, Double)] =
    pairs.sorted.take(K).toVector

  private val genPairs: Gen[List[(Long, Double)]] =
    Gen.listOf(for {
      h <- Gen.choose(0L, 20L) // small domain → hash ties are common
      v <- Gen.oneOf(Gen.choose(0, 5).map(_.toDouble),
        Gen.choose(-1000.0, 1000.0))
    } yield (h, v))

  property("sample == k smallest (hash, value) pairs as a multiset") =
    forAll(genPairs) { pairs =>
      sampleOf(Seq(pairs)) == reference(pairs)
    }

  property("chunking + merge order never changes the sample") =
    forAll(genPairs, Gen.choose(1, 7)) { (pairs, n) =>
      val chunks = pairs.grouped(math.max(1, n)).toSeq
      sampleOf(chunks) == reference(pairs) &&
        sampleOf(chunks.reverse) == reference(pairs)
    }

  property("duplicate (hash, value) pairs survive as duplicates") =
    forAll(genPairs) { pairs =>
      sampleOf(Seq(pairs ++ pairs)) == reference(pairs ++ pairs)
    }

  property("serialize/deserialize round-trips the heap exactly") =
    forAll(genPairs) { pairs =>
      val buf = pairs.foldLeft(agg.createAggregationBuffer()) {
        (b, p) => agg.update(b, InternalRow(p._1, p._2))
      }
      val back = agg.deserialize(agg.serialize(buf))
      back.toArray(new Array[(Long, Double)](back.size)).sorted
        .sameElements(
          buf.toArray(new Array[(Long, Double)](buf.size)).sorted)
    }
}

/** Fuzz the hand-written POSIX ustar writer/reader: arbitrary entry
  * lists round-trip losslessly, archives are always 512-aligned, and
  * single-byte corruption in a header is caught by the checksum.
  */
object TarProperties extends org.scalacheck.Properties("TarFormat") {
  import org.scalacheck.{Gen, Prop}
  import org.scalacheck.Prop.forAll
  import graft.operators.TarFormat

  private val genName: Gen[String] = for {
    n <- Gen.choose(1, 60)
    cs <- Gen.listOfN(n, Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('-', '_', '.')))
  } yield cs.mkString

  private val genEntry: Gen[(String, Array[Byte])] = for {
    name <- genName
    size <- Gen.oneOf(Gen.choose(0, 64), Gen.choose(500, 1500))
    bytes <- Gen.listOfN(size, Gen.choose(
      Byte.MinValue, Byte.MaxValue))
  } yield (name, bytes.toArray)

  private def archive(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    entries.foreach { case (n, p) =>
      bos.write(TarFormat.header(n, p.length))
      bos.write(p)
      val pad = (512 - p.length % 512) % 512
      if (pad > 0) bos.write(new Array[Byte](pad))
    }
    bos.write(new Array[Byte](1024))
    bos.toByteArray
  }

  property("write → read round-trips names and payloads exactly") =
    forAll(Gen.listOf(genEntry)) { entries =>
      val back = TarFormat.read(
        new java.io.ByteArrayInputStream(archive(entries)))
      back.map(_._1) == entries.map(_._1) &&
        back.zip(entries).forall { case ((_, a), (_, b)) =>
          java.util.Arrays.equals(a, b)
        }
    }

  property("archives are 512-aligned") =
    forAll(Gen.listOf(genEntry)) { entries =>
      archive(entries).length % 512 == 0
    }

  property("flipping a header byte breaks the checksum") =
    forAll(genEntry, Gen.choose(0, 99)) { case ((name, payload), off) =>
      val bytes = archive(Seq((name, payload)))
      val orig = bytes(off)
      // flip within the name field; skip positions that do not change
      // the byte (already equal) to keep the property meaningful
      bytes(off) = (orig ^ 0x55).toByte
      val caught =
        try { TarFormat.read(new java.io.ByteArrayInputStream(bytes)); false }
        catch { case _: Exception => true }
      bytes(off) = orig
      Prop.collect(caught)(caught || (orig == (orig ^ 0x55).toByte))
    }
}
