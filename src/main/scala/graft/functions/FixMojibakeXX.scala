package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.{CharacterCodingException, Charset, CodingErrorAction}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Mojibake repair: undo the classic double-encoding where UTF-8
  * bytes were mis-decoded as Windows-1252 and re-encoded — the single
  * most common corruption in web crawls (`é` arrives as `Ã©`, a curly
  * apostrophe as `â€™`). The inverse transform is: encode the string
  * back to Windows-1252 STRICTLY, then decode the bytes as UTF-8
  * STRICTLY. Three safety gates keep the kernel conservative (repair
  * must never corrupt clean text):
  *
  *  1. pure-ASCII input short-circuits (zero allocation, the
  *     overwhelmingly common crawl row);
  *  2. if the cp1252 encode hits an unmappable char (i.e. the text
  *     contains characters that could not have come from a cp1252
  *     mis-decode), the input is returned untouched;
  *  3. if the re-decoded bytes are not valid UTF-8, the input is
  *     returned untouched — genuine Latin-1 prose (`"café"`) fails
  *     here and survives.
  *
  * A repaired string is always strictly shorter in chars than its
  * mojibake form (each multi-byte sequence collapses), so repair
  * cannot loop; running the kernel twice is a no-op on its own output
  * unless the text was triple-encoded (each pass peels one layer).
  *
  * NOT oracle-gateable (SQL engines lack strict charset round-trips);
  * the detection side ([[graft.text.TextOps.mojibakeScore]]) is plain
  * regexp arithmetic and hash-gates as q138.
  */
object FixMojibakeXX {

  private val cp1252 = Charset.forName("windows-1252")
  private val utf8 = Charset.forName("UTF-8")

  def compute(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length && bytes(i) >= 0) i += 1
    if (i == bytes.length) return s // pure ASCII
    val str = s.toString
    try {
      val enc = cp1252.newEncoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      val raw: ByteBuffer = enc.encode(java.nio.CharBuffer.wrap(str))
      val dec = utf8.newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      val repaired = dec.decode(raw).toString
      if (repaired == str) s else UTF8String.fromString(repaired)
    } catch {
      case _: CharacterCodingException => s
    }
  }
}

/** Catalyst expression wrapping [[FixMojibakeXX.compute]]. */
case class FixMojibakeExprXX(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_fix_mojibake expects string, got ${other.sql}")
    }

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_fix_mojibake"

  override def nullSafeEval(input: Any): Any =
    FixMojibakeXX.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.FixMojibakeXX.compute($c);")

  override protected def withNewChildInternal(
      newChild: Expression): FixMojibakeExprXX = copy(child = newChild)
}
