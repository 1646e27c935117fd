package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XxHash64Function}
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
    extends UnaryExpression with ExpectsInputTypes {

  // a non-string child fails AT ANALYSIS, not as a runtime
  // ClassCastException inside eval/codegen
  override def inputTypes: Seq[DataType] = Seq(StringType)

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
  private val P = 2147483647L // 2^31 - 1, Mersenne

  /** `c` matches Java-regex `\s` (= `[ \t\n\x0B\f\r]`, ASCII-only by
    * default) — the exact character class the historical
    * `split("\\s+")` tokenizer matched. */
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || (c >= '\t' && c <= '\r')

  /** Token boundaries of `s` under the `\s+` split contract (maximal
    * non-whitespace runs; empties impossible by construction). Returns
    * a packed (start, end) pair array with `2*count` live slots and the
    * count. Replaces a per-row `String.split("\\s+")`, which recompiles
    * the regex and allocates a token String per call (guide §1.2 step 2:
    * per-task work). */
  private def tokenBounds(s: String): (Array[Int], Int) = {
    val n = s.length
    var bounds = new Array[Int](32)
    var ntok = 0
    var i = 0
    while (i < n) {
      if (isWs(s.charAt(i))) i += 1
      else {
        val st = i
        while (i < n && !isWs(s.charAt(i))) i += 1
        if (2 * ntok == bounds.length)
          bounds = java.util.Arrays.copyOf(bounds, bounds.length * 2)
        bounds(2 * ntok) = st; bounds(2 * ntok + 1) = i
        ntok += 1
      }
    }
    (bounds, ntok)
  }

  /** Whitespace tokens with empties dropped — the shared tokenizer
    * contract (TextFunctions.wsTokens in native form). */
  private[functions] def tokenize(text: UTF8String): Array[String] = {
    val s = text.toString
    val (b, ntok) = tokenBounds(s)
    Array.tabulate(ntok)(k => s.substring(b(2 * k), b(2 * k + 1)))
  }

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

  /** x mod P for 0 ≤ x < 2⁶². Mersenne fold (2³¹ ≡ 1 mod P): two
    * shift-mask-adds and one conditional subtract replace a 64-bit
    * division in every hot loop below. Bit-identical to `x % P`. */
  @inline private[graft] def modP(x: Long): Long = {
    var v = (x & P) + (x >>> 31) // < 2^32
    v = (v & P) + (v >>> 31)     // ≤ P + 1
    if (v >= P) v - P else v
  }

  /** MODULAR shingle hash: the same "t0 t1 t2" shingles folded with the
    * [[RollingHash]] recurrence h = h·31 + cp (mod 2³¹−1) over codepoints
    * instead of xxhash64. Slightly weaker as a hash (31-bit range), which
    * is fine for MinHash permutations — a collision merely merges two
    * shingles before the minima — and, unlike xxhash64, a SQL oracle can
    * replay it character by character, which is what lets dd_minhash_lsh's
    * entire candidate pipeline be hash-checked. Values are already in
    * [0, P); order matches [[compute]].
    *
    * Computed via per-token prefolds: fold(s₁ ++ s₂) = fold(s₁)·31^|s₂|
    * + fold(s₂) (mod P, lengths in codepoints), so each codepoint is
    * folded ONCE and each shingle combines three token prefolds in O(1)
    * — the naive per-shingle refold walked every character three times
    * and allocated a concatenated String per shingle. Values are
    * bit-identical (pure modular algebra; parity spec in DedupSpec). */
  def computeModular(text: UTF8String): Array[Long] = {
    val s = text.toString
    val (b, ntok) = tokenBounds(s)
    if (ntok < 3) return Empty
    // per-token prefold ht = fold(token), pt = 31^(codepoints) mod P
    val ht = new Array[Long](ntok)
    val pt = new Array[Long](ntok)
    var k = 0
    while (k < ntok) {
      var h = 0L
      var p = 1L
      var j = b(2 * k)
      val end = b(2 * k + 1)
      while (j < end) {
        val cp = s.codePointAt(j)
        h = modP(h * 31L + cp) // h < P, 31h + cp < 2^36
        p = modP(p * 31L)
        j += Character.charCount(cp)
      }
      ht(k) = h; pt(k) = p
      k += 1
    }
    val out = new Array[Long](ntok - 2)
    var i = 0
    while (i + 2 < ntok) {
      var h = modP(ht(i) * 31L + 32L)          // tok0 ++ ' '
      h = modP(h * pt(i + 1) + ht(i + 1))      // ++ tok1   (h·pt < 2^62)
      h = modP(h * 31L + 32L)                  // ++ ' '
      h = modP(h * pt(i + 2) + ht(i + 2))      // ++ tok2
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
