package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** xxhash64 values of a document's 3-token shingles, one native pass per
  * row: whitespace-tokenize (empties dropped) and hash each "t0 t1 t2"
  * with seed 42 — byte-identical to SQL
  * `xxhash64(concat_ws(' ', t0, t1, t2))`, so the DuckDB oracle's
  * string-shingle sets correspond 1:1. Replaces the posexplode +
  * window-lead shingling plan (which shuffled every token row through a
  * per-doc window sort) with a shuffle-free projection; shingle rows come
  * from a plain `explode` of the result. Empty array for docs with fewer
  * than 3 tokens (they have no shingles).
  */
case class ShingleHashes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(ShingleHashes.compute(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.ShingleHashes$$.MODULE$$.compute($c));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {

  private val Empty = Array.empty[Long]

  /** Whitespace tokens with empties dropped — the shared tokenizer
    * contract (TextFunctions.wsTokens in native form). */
  private[functions] def tokenize(text: UTF8String): Array[String] =
    text.toString.split("\\s+").filter(_.nonEmpty)

  def compute(text: UTF8String): Array[Long] = computeFromTokens(tokenize(text))

  private[functions] def computeFromTokens(toks: Array[String]): Array[Long] = {
    if (toks.length < 3) return Empty
    val out = new Array[Long](toks.length - 2)
    var i = 0
    while (i + 2 < toks.length) {
      val sh = UTF8String.fromString(
        toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
      out(i) = XxHash64Function.hash(sh, StringType, 42L)
      i += 1
    }
    out
  }

  /** Column-API entry point. Input must be a string column. */
  def apply(c: Column): Column =
    Bridge.column(ShingleHashes(Bridge.expression(c)))
}
