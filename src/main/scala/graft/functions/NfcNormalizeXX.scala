package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (UAX #15 canonical composition) as a
  * native kernel — the canonical-form pass every multilingual crawl
  * pipeline runs before dedup and tokenization: the same word arrives
  * both precomposed (`é` U+00E9) and decomposed (`e` + U+0301), and
  * without normalization the two spellings defeat exact dedup keys,
  * split vocabulary entries, and double BPE merges. NFC (not NFKC) is
  * the conservative choice: it folds only canonical equivalents and
  * never rewrites compatibility characters (ligatures, full-width
  * forms), so text round-trips visually unchanged.
  *
  * Cross-engine replayable: NFC is a published Unicode algorithm, so
  * `java.text.Normalizer` here and utf8proc-based `nfc_normalize` in
  * DuckDB produce identical bytes — the q134 oracle leans on that.
  *
  * Scale shape: crawl corpora are overwhelmingly ASCII-dominated, and
  * ASCII is closed under NFC, so the kernel short-circuits on pure-
  * ASCII input with ZERO allocation (byte scan of the UTF8String,
  * no String round-trip). Non-ASCII rows take the
  * `Normalizer.isNormalized` fast path (already-NFC strings return the
  * input buffer) before paying for a rewrite. One static call in
  * generated code, fully inside whole-stage codegen.
  */
object NfcNormalizeXX {

  def compute(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length && bytes(i) >= 0) i += 1
    if (i == bytes.length) return s // pure ASCII: NFC-closed, zero-copy
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

/** Catalyst expression wrapping [[NfcNormalizeXX.compute]]. */
case class NfcNormalizeExprXX(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_nfc expects string, got ${other.sql}")
    }

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    NfcNormalizeXX.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalizeXX.compute($c);")

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalizeExprXX = copy(child = newChild)
}
