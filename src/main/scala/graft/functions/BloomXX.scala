package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Broadcast Bloom-filter membership probe — the sketch that lets a
  * 100 TB scan discard rows against a small reference set WITHOUT
  * shuffling the scan side (the same idea Spark's runtime row-level
  * filtering injects for joins, exposed here as a first-class operator
  * for pipeline use, e.g. benchmark decontamination's gram probe).
  *
  * Build side: one distributed `treeAggregate` over the reference rows
  * (per-partition filters merged pairwise — the canonical sketch-build
  * shape, and one of the rare justified RDD uses: a mutable accumulator
  * folded per partition). Probe side: the serialized filter rides into
  * a Catalyst expression at plan time and broadcasts with the plan;
  * each probe is a few Murmur3 hashes — scan-stage, codegen'd, no
  * shuffle, no join. Bloom filters have NO false negatives, so a probe
  * is a safe PREFILTER: follow it with an exact equi-join on the
  * survivors and the composition is exactly equal to the exact join
  * alone (false positives only cost a little extra join input).
  */
object BloomXX {

  /** Build a Bloom filter over a string column and return it serialized.
    * Runs two small jobs on `df` (count + build) — intended for the
    * SMALL side of an asymmetric match (eval benchmarks, blocklists),
    * so materialize `df` (e.g. `localCheckpoint`) if it is derived.
    */
  def build(df: DataFrame, column: String, fpp: Double): Array[Byte] = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    // size from the null-dropped projection — the rows actually
    // inserted (counting df itself would let null rows inflate n)
    val cleaned = df.select(col(column)).na.drop()
    // floor the sizing: a tiny reference set would otherwise get a
    // sub-100-bit filter whose REAL fp rate dwarfs the nominal fpp —
    // 4096 items is a few KB, effectively zero fp for small sets
    val n = math.max(cleaned.count(), 4096L)
    val zero = BloomFilter.create(n, fpp)
    val bf = cleaned.rdd
      .treeAggregate(zero)(
        (acc, row) => { acc.putBinary(row.getString(0).getBytes("UTF-8")); acc },
        (a, b) => { a.mergeInPlace(b); a })
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** Column API for [[BloomMightContainXX]]: true iff `c` MIGHT be in
    * the filter (never false for a true member; false positives at the
    * build fpp).
    */
  def mightContain(c: Column, bloomBytes: Array[Byte]): Column =
    ColumnBridge.column(
      BloomMightContainXX(ColumnBridge.expression(c),
        bloomBytes.toIndexedSeq))
}

/** Catalyst expression probing a serialized Bloom filter with a string
  * child (UTF-8 bytes — the byte-level twin of [[BloomXX.build]]'s
  * `putBinary`). The filter deserializes once per executor via the
  * transient lazy and is referenced directly from generated code.
  * The filter bytes are held as an IndexedSeq, NOT an Array: array
  * equality is reference-based, which would make two semantically
  * identical probes never compare equal and defeat Catalyst expression
  * dedup / subexpression elimination.
  */
case class BloomMightContainXX(child: Expression,
    bloomBytes: IndexedSeq[Byte])
    extends UnaryExpression {

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes.toArray))

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_might_contain expects string, got ${other.sql}")
    }

  override def dataType: DataType = BooleanType

  override def prettyName: String = "graft_bloom_might_contain"

  /** Public for generated code. */
  def computeRow(s: UTF8String): Boolean =
    bloom.mightContainBinary(s.getBytes)

  override def nullSafeEval(input: Any): Any =
    computeRow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.computeRow($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContainXX = copy(child = newChild)
}
