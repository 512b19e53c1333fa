package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern blocklist matching as a native kernel — the
  * Aho-Corasick automaton (Aho & Corasick 1975): ONE left-to-right
  * pass over the text finds every occurrence of every term, vs the
  * |terms| independent `contains` scans the naive plan pays. Real
  * blocklists (unsafe-content phrases, boilerplate markers, spam
  * templates) run to tens of thousands of terms, where per-term
  * scanning is O(|terms| · |text|) and simply infeasible at corpus
  * scale; the automaton is O(|text| + matches) per row regardless of
  * list size.
  *
  * The automaton builds ONCE per query (driver side, from the foldable
  * term list) and ships to executors inside the expression — in
  * generated code it is a single referenced object call, fully inside
  * whole-stage codegen.
  *
  * Output per row: `n_matched` (how many DISTINCT terms occur) and
  * `first_term` (the term whose earliest occurrence starts first,
  * ties to the lower term index; NULL when nothing matches). Absolute
  * positions are deliberately NOT exposed: they are UTF-16-unit
  * offsets, which an external engine counting codepoints would
  * disagree with on non-BMP text — but the ORDER of match positions
  * is invariant under any monotonic reindexing, so first-by-position
  * replays exactly (the q243 oracle leans on that).
  */
object MultiMatchXX {

  /** Immutable Aho-Corasick automaton over UTF-16 code units. */
  final class Automaton(val terms: Array[String]) extends Serializable {
    require(terms.nonEmpty, "need at least one term")
    require(terms.forall(_.nonEmpty), "terms must be non-empty")
    require(terms.distinct.length == terms.length,
      "terms must be distinct")

    // trie: per-node char→node map, failure links, and the aggregated
    // set of term indexes ending at-or-through each node
    private val children = mutable.ArrayBuffer(
      new mutable.HashMap[Char, Int]())
    private val ends = mutable.ArrayBuffer(List.empty[Int])
    terms.zipWithIndex.foreach { case (t, ti) =>
      var node = 0
      t.foreach { ch =>
        node = children(node).getOrElseUpdate(ch, {
          children += new mutable.HashMap[Char, Int]()
          ends += Nil
          children.length - 1
        })
      }
      ends(node) = ti :: ends(node)
    }
    private val fail = Array.fill(children.length)(0)
    private val out = Array.fill(children.length)(List.empty[Int])
    locally { // BFS failure links; out(n) = ends(n) ++ out(fail(n))
      val queue = mutable.Queue.empty[Int]
      children(0).valuesIterator.foreach { c => queue += c }
      (0 until children.length).foreach(n => out(n) = ends(n))
      while (queue.nonEmpty) {
        val n = queue.dequeue()
        out(n) = ends(n) ++ out(fail(n))
        children(n).foreach { case (ch, c) =>
          var f = fail(n)
          while (f != 0 && !children(f).contains(ch)) f = fail(f)
          fail(c) = children(f).get(ch) match {
            case Some(t) if t != c => t
            case _ => 0
          }
          queue += c
        }
      }
    }

    /** One pass: (#distinct terms present, first term by earliest
      * start position then term index, or null).
      */
    def search(text: UTF8String): InternalRow = {
      val s = text.toString
      val seen = new Array[Boolean](terms.length)
      var nMatched = 0
      var bestStart = Int.MaxValue
      var bestIdx = -1
      var node = 0
      var i = 0
      while (i < s.length) {
        val ch = s.charAt(i)
        while (node != 0 && !children(node).contains(ch))
          node = fail(node)
        node = children(node).getOrElse(ch, 0)
        var hits = out(node)
        while (hits.nonEmpty) {
          val ti = hits.head
          if (!seen(ti)) { seen(ti) = true; nMatched += 1 }
          val start = i - terms(ti).length + 1
          if (start < bestStart ||
            (start == bestStart && ti < bestIdx)) {
            bestStart = start; bestIdx = ti
          }
          hits = hits.tail
        }
        i += 1
      }
      new GenericInternalRow(Array[Any](nMatched,
        if (bestIdx < 0) null else UTF8String.fromString(terms(bestIdx))))
    }
  }
}

/** Catalyst expression running [[MultiMatchXX.Automaton]] over a
  * string column. `terms` come from a FOLDABLE literal (the
  * `graft_multimatch` SQL registration enforces it), so the automaton
  * builds once on the driver.
  */
case class MultiMatchExprXX(child: Expression, terms: Seq[String])
    extends UnaryExpression {

  @transient private lazy val auto =
    new MultiMatchXX.Automaton(terms.toArray)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_multimatch expects string, got ${other.sql}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("n_matched", IntegerType, nullable = false),
    StructField("first_term", StringType, nullable = true)))

  override def prettyName: String = "graft_multimatch"

  override def nullSafeEval(input: Any): Any =
    auto.search(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acAutomaton", auto,
      classOf[MultiMatchXX.Automaton].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.search($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): MultiMatchExprXX = copy(child = newChild)
}
