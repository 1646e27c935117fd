package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whitespace tokens of a string with empties dropped — the engine's
  * shared tokenizer contract (`filter(split(c, "\\s+"), t => t ≠ "")`)
  * as ONE native pass over the UTF-8 bytes.
  *
  * Why native: the `split` + higher-order `filter` formulation (a) walks
  * the string through a regex engine per row, (b) allocates the dropped
  * empty token, and (c) — decisively — the lambda makes every enclosing
  * Project CodegenFallback, which knocks the whole stage out of
  * whole-stage codegen AND disables subexpression elimination, so a
  * query using the token array twice (n_tok + stop_n) tokenized twice.
  * This expression is codegen'd, so Projects containing it fuse into
  * WholeStageCodegen and duplicate references collapse via CSE.
  *
  * Token values are byte slices of the input (zero-copy `fromBytes`):
  * whitespace under Java-regex `\s` is the ASCII set `[ \t\n\x0B\f\r]`,
  * and no byte of a UTF-8 multi-byte sequence is < 0x80, so a signed-byte
  * scan splits exactly where the regex did and the slices are the exact
  * token bytes. Output matches the historical formulation value-for-value
  * (parity spec in FunctionsSpec).
  */
case class WsTokens(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  // a non-string child fails AT ANALYSIS, not as a runtime
  // ClassCastException inside eval/codegen
  override def inputTypes: Seq[DataType] = Seq(StringType)
  // containsNull = true matches the `filter(split(...))` schema exactly,
  // so downstream explode/size plans resolve identically
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "ws_tokens"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      WsTokens.split(input.asInstanceOf[UTF8String]).asInstanceOf[Array[Any]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  (Object[]) graft.functions.WsTokens$$.MODULE$$.split($c));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WsTokens {

  private val Empty = Array.empty[UTF8String]

  /** `b` is an ASCII whitespace byte (Java-regex `\s`). UTF-8
    * continuation/lead bytes are ≥ 0x80 = negative as signed bytes, so
    * they can never match. Shared with the count-only kernels
    * ([[WsTokenCount]], [[WsTokenSetCount]]) so the token boundary rule
    * has ONE definition. */
  @inline private[functions] def isWs(b: Byte): Boolean =
    b == ' '.toByte || (b >= '\t'.toByte && b <= '\r'.toByte)

  def split(text: UTF8String): Array[UTF8String] = {
    val bytes = text.getBytes
    val n = bytes.length
    if (n == 0) return Empty
    // count tokens first: exact-sized output array, no growth copies
    var ntok = 0
    var i = 0
    while (i < n) {
      if (isWs(bytes(i))) i += 1
      else {
        ntok += 1
        while (i < n && !isWs(bytes(i))) i += 1
      }
    }
    if (ntok == 0) return Empty
    val out = new Array[UTF8String](ntok)
    var k = 0
    i = 0
    while (i < n) {
      if (isWs(bytes(i))) i += 1
      else {
        val st = i
        while (i < n && !isWs(bytes(i))) i += 1
        out(k) = UTF8String.fromBytes(bytes, st, i - st)
        k += 1
      }
    }
    out
  }

  /** Column-API entry point. Input must be a string column. */
  def apply(c: Column): Column =
    Bridge.column(WsTokens(Bridge.expression(c)))
}
