package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Real merge-table BPE tokenization (the GPT-2-style algorithm over a
  * LOADED vocabulary, replacing the regex stand-in
  * [[graft.text.TextOps.tokensBpeish]] when a merge table is available):
  * each whitespace word starts as code points, then the ranked merge
  * list is applied greedily — every round merges ALL adjacent
  * occurrences of the lowest-ranked pair present, until no listed pair
  * remains. Deterministic given the table; merge tables are public
  * model metadata (tens of thousands of rows), so they ride into the
  * expression at plan time and broadcast with the plan — the corpus
  * side stays a scan-stage map with no shuffle and no lookup join.
  */
object BpeTokensXX {

  /** One word → BPE pieces under `rank` ("left right" → merge priority). */
  def word2pieces(
      word: String,
      rank: java.util.HashMap[String, Integer]): Seq[String] = {
    val pieces = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < word.length) { // code-point split (surrogate-safe)
      val cc = Character.charCount(word.codePointAt(i))
      pieces += word.substring(i, i + cc)
      i += cc
    }
    var done = pieces.length < 2
    while (!done) {
      var best = -1
      var bestRank = Int.MaxValue
      var j = 0
      while (j < pieces.length - 1) {
        val r = rank.get(pieces(j) + " " + pieces(j + 1))
        if (r != null && r < bestRank) { bestRank = r; best = j }
        j += 1
      }
      if (best < 0) done = true
      else {
        val (pa, pb) = (pieces(best), pieces(best + 1))
        var k = 0
        while (k < pieces.length - 1) {
          if (pieces(k) == pa && pieces(k + 1) == pb) {
            pieces(k) = pa + pb
            pieces.remove(k + 1)
            k += 1 // merged piece does not re-pair with its own tail
          } else k += 1
        }
      }
    }
    pieces.toSeq
  }

  def compute(
      text: UTF8String,
      rank: java.util.HashMap[String, Integer]): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    // explicit whitespace class, not \s: Java \s includes U+000B
    // (vertical tab) while RE2 engines' does not — with the explicit
    // class a vertical tab is a content char (one piece) on both the
    // Spark side and the DuckDB oracle (same decision as tokensBpeish)
    text.toString.split("[ \t\n\f\r]+").foreach { w =>
      if (w.nonEmpty)
        word2pieces(w, rank).foreach(p => out += UTF8String.fromString(p))
    }
    new GenericArrayData(out.toArray[Any])
  }
}

/** Catalyst expression applying a fixed BPE merge table to a text column
  * → array&lt;string&gt; of subword tokens. The rank map is built once per
  * expression instance and referenced from generated code.
  */
case class BpeTokensXX(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  @transient private lazy val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      m.putIfAbsent(a + " " + b, Int.box(i)) // first occurrence wins
    }
    m
  }

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_bpe_tokens expects string, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_bpe_tokens"

  /** Public for generated code. */
  def computeRow(text: UTF8String): ArrayData =
    BpeTokensXX.compute(text, rank)

  override def nullSafeEval(input: Any): Any =
    computeRow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpe", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.computeRow($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BpeTokensXX = copy(child = newChild)
}
