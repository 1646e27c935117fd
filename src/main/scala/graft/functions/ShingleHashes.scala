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
case class ShingleHashes(child: Expression, modular: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      if (modular) ShingleHashes.computeModular(input.asInstanceOf[UTF8String])
      else ShingleHashes.compute(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (modular) "computeModular" else "compute"
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.ShingleHashes$$.MODULE$$.$fn($c));
       """.stripMargin)
  }

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

  /** MODULAR shingle hash: the same "t0 t1 t2" shingles folded with the
    * [[RollingHash]] recurrence h = h·31 + cp (mod 2³¹−1) over codepoints
    * instead of xxhash64. Slightly weaker as a hash (31-bit range), which
    * is fine for MinHash permutations — a collision merely merges two
    * shingles before the minima — and, unlike xxhash64, a SQL oracle can
    * replay it character by character, which is what lets dd_minhash_lsh's
    * entire candidate pipeline be hash-checked. Values are already in
    * [0, P); order matches [[compute]]. */
  def computeModular(text: UTF8String): Array[Long] = {
    val toks = tokenize(text)
    if (toks.length < 3) return Empty
    val out = new Array[Long](toks.length - 2)
    var i = 0
    while (i + 2 < toks.length) {
      val s = toks(i) + " " + toks(i + 1) + " " + toks(i + 2)
      var h = 0L
      var j = 0
      while (j < s.length) {
        val cp = s.codePointAt(j)
        h = (h * 31L + cp) % 2147483647L
        j += Character.charCount(cp)
      }
      out(i) = h
      i += 1
    }
    out
  }

  /** Column-API entry point. Input must be a string column. */
  def apply(c: Column): Column =
    Bridge.column(ShingleHashes(Bridge.expression(c)))

  /** Column-API entry point for the modular variant. */
  def modular(c: Column): Column =
    Bridge.column(ShingleHashes(Bridge.expression(c), modular = true))
}
