package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-document text statistics kernels. Both replace HOF chains
  * whose cost is super-linear per row: the repetition max-count ran a
  * nested `filter` per DISTINCT shingle (O(distinct × n) per doc — a
  * long repetitive document is exactly where the filter matters and
  * exactly where that blows up), and the exact-Jaccard verify allocated
  * four arrays per candidate pair. Arithmetic is replayed exactly
  * (HALF_UP scale-6 rounding via BigDecimal — the same chain Spark's
  * `round` runs), so the q41/q33 oracle hash gates pin the swaps.
  *
  * NULL-ARRAY edge (deliberate divergence): the kernels are null-safe
  * expressions, so a literal null ARRAY yields NULL — the HOF flavors
  * instead surface legacy `size(null)` artifacts (-1-derived values).
  * No pipeline path produces a null array (tokenizers coalesce), and
  * NULL is the saner contract for external callers.
  */
object TextStatXX {

  private def round6(v: Double): Double =
    if (java.lang.Double.isFinite(v))
      java.math.BigDecimal.valueOf(v)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    else v

  /** One-pass repetition stats over a shingle array: (n_grams,
    * n_distinct, dup_ratio, max_count). Null elements count into
    * n_grams and once into n_distinct (array_distinct semantics) but
    * never into max_count (the HOF's `x === null` filter matched
    * nothing).
    */
  def repStats(arr: ArrayData): GenericInternalRow = {
    val n = arr.numElements()
    val counts = new java.util.HashMap[UTF8String, Integer](n * 2)
    var nulls = 0
    var maxCount = 0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) nulls += 1
      else {
        val c = counts.merge(arr.getUTF8String(i), 1, (x, y) => Int.box(x + y))
        if (c > maxCount) maxCount = c
      }
      i += 1
    }
    val distinct = counts.size + (if (nulls > 0) 1 else 0)
    val ratio = round6((n - distinct).toDouble / math.max(n, 1))
    new GenericInternalRow(Array[Any](n, distinct, ratio, maxCount))
  }

  /** Exact Jaccard over two shingle arrays with distinct-set semantics
    * (array_intersect/array_union): |A∩B| / max(|A∪B|, 1). A null
    * element is one distinct value on each side.
    */
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val setA = new java.util.HashSet[UTF8String]()
    var nullA = false
    var i = 0
    val na = a.numElements()
    while (i < na) {
      if (a.isNullAt(i)) nullA = true
      else setA.add(a.getUTF8String(i))
      i += 1
    }
    val setB = new java.util.HashSet[UTF8String]()
    var nullB = false
    var j = 0
    val nb = b.numElements()
    while (j < nb) {
      if (b.isNullAt(j)) nullB = true
      else setB.add(b.getUTF8String(j))
      j += 1
    }
    var interNN = 0
    val it = setB.iterator()
    while (it.hasNext) if (setA.contains(it.next())) interNN += 1
    val inter = interNN + (if (nullA && nullB) 1 else 0)
    val union = setA.size + setB.size - interNN +
      (if (nullA || nullB) 1 else 0)
    inter.toDouble / math.max(union, 1)
  }
}

/** Catalyst expression for [[TextStatXX.repStats]]. */
case class RepStatsXX(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_rep_stats expects array<string>, got ${other.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("dup_ratio", DoubleType, nullable = false),
    StructField("max_count", IntegerType, nullable = false)))

  override def prettyName: String = "graft_rep_stats"

  override def nullSafeEval(arr: Any): Any =
    TextStatXX.repStats(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, e => s"graft.functions.TextStatXX.repStats($e)")

  override protected def withNewChildInternal(
      newChild: Expression): RepStatsXX = copy(child = newChild)
}

/** Catalyst expression for [[TextStatXX.jaccard]]. */
case class JaccardXX(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_jaccard expects two array<string>, got ${l.sql}, ${r.sql}")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_jaccard"

  override def nullSafeEval(a: Any, b: Any): Any =
    TextStatXX.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextStatXX.jaccard($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardXX =
    copy(left = newLeft, right = newRight)
}
