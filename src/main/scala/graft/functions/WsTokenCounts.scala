package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Token COUNTS over the [[WsTokens]] whitespace tokenization, computed
  * without materializing the token array.
  *
  * `size(ws_tokens(text))` and `size(filter(ws_tokens(text), t IN set))`
  * both allocate the full token array per row, and the higher-order
  * `filter` lambda additionally forces the enclosing Project into
  * CodegenFallback — which knocks the whole stage out of whole-stage
  * codegen AND re-evaluates `ws_tokens` once per reference (no
  * subexpression elimination under fallback). These two expressions
  * compute the same Ints in one allocation-free byte scan each, with
  * `doGenCode` implemented, so a quality-score Project fuses into
  * WholeStageCodegen.
  *
  * Value parity with the array formulations is pinned by FunctionsSpec:
  * the scan splits on the identical ASCII-`\s` byte class as
  * [[WsTokens.split]], and set membership is UTF-8 byte equality —
  * exactly Catalyst `In` over string literals.
  */
case class WsTokenCount(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "ws_token_count"

  override def nullSafeEval(input: Any): Any =
    WsTokenCount.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WsTokenCount$$.MODULE$$.count($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WsTokenCount {

  /** Count of whitespace-separated tokens — `WsTokens.split(text).length`
    * without the array. */
  def count(text: UTF8String): Int = {
    val bytes = text.getBytes
    val n = bytes.length
    var ntok = 0
    var i = 0
    while (i < n) {
      if (WsTokens.isWs(bytes(i))) i += 1
      else {
        ntok += 1
        while (i < n && !WsTokens.isWs(bytes(i))) i += 1
      }
    }
    ntok
  }

  /** Column-API entry point. Input must be a string column. */
  def apply(c: Column): Column =
    Bridge.column(WsTokenCount(Bridge.expression(c)))
}

/** A small literal word set for [[WsTokenSetCount]] membership tests,
  * bucketed by UTF-8 byte length so each token pays one length-indexed
  * load plus byte compares against same-length words only. Serializable:
  * codegen embeds it as a plan reference object. */
final class WsWordSet(words: Seq[String]) extends Serializable {
  private val byLen: Array[Array[Array[Byte]]] = {
    val bs = words.distinct
      .map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val max = if (bs.isEmpty) -1 else bs.map(_.length).max
    val arr = Array.fill(max + 1)(Array.empty[Array[Byte]])
    bs.groupBy(_.length).foreach { case (l, g) => arr(l) = g.toArray }
    arr
  }

  /** Is bytes[st, st+len) one of the words? Byte equality — exactly
    * UTF8String/Catalyst `In` equality over string literals. */
  def contains(bytes: Array[Byte], st: Int, len: Int): Boolean = {
    if (len >= byLen.length) return false
    val cands = byLen(len)
    var i = 0
    while (i < cands.length) {
      val w = cands(i)
      var j = 0
      while (j < len && w(j) == bytes(st + j)) j += 1
      if (j == len) return true
      i += 1
    }
    false
  }
}

case class WsTokenSetCount(child: Expression, words: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "ws_token_set_count"

  @transient private lazy val set = new WsWordSet(words)

  override def nullSafeEval(input: Any): Any =
    WsTokenSetCount.count(input.asInstanceOf[UTF8String], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", set,
      classOf[WsWordSet].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WsTokenSetCount$$.MODULE$$.count($c, $setRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WsTokenSetCount {

  /** Count of whitespace tokens that are members of `set` —
    * `size(filter(WsTokens(text), t IN set))` without the array. */
  def count(text: UTF8String, set: WsWordSet): Int = {
    val bytes = text.getBytes
    val n = bytes.length
    var cnt = 0
    var i = 0
    while (i < n) {
      if (WsTokens.isWs(bytes(i))) i += 1
      else {
        val st = i
        while (i < n && !WsTokens.isWs(bytes(i))) i += 1
        if (set.contains(bytes, st, i - st)) cnt += 1
      }
    }
    cnt
  }

  /** Column-API entry point. Input must be a string column. */
  def apply(c: Column, words: Seq[String]): Column =
    Bridge.column(WsTokenSetCount(Bridge.expression(c), words))
}
