package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 128-permutation MinHash signature of a document's 3-token shingles,
  * computed in ONE native pass per row: tokenize, shingle, modular-hash,
  * and fold all 128 running minima in a tight primitive loop. This
  * replaces the explode-shingles → groupBy(doc) → 128×min() aggregation
  * plan for signatures — same values (identical modular shingle hash over
  * "t0 t1 t2"; identical permutation coefficients), but a map-only
  * projection with NO row explosion and NO signature shuffle, which is
  * what you want when every doc of a 100 TB corpus needs a signature.
  *
  * Returns array<long>[128]; NULL for docs with fewer than 3 tokens
  * (exactly the docs the exploded formulation dropped).
  */
case class MinHashSignature(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  // a non-string child fails AT ANALYSIS, not as a runtime
  // ClassCastException inside eval/codegen
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any = {
    val sig = MinHashSignature.compute(input.asInstanceOf[UTF8String])
    if (sig == null) null else new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val sig = ctx.freshName("sig")
      s"""
         |long[] $sig = graft.functions.MinHashSignature$$.MODULE$$.compute($c);
         |if ($sig == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {

  val NumPerms = 128
  private val P = 2147483647L // 2^31 - 1

  /** Deterministic permutation coefficients — the same splitmix scramble
    * (and salts) as the historical aggregate formulation, so signatures
    * are bit-identical to it (parity spec in DedupSpec). */
  private def permCoeff(i: Int, salt: Long): Long = {
    var z = i.toLong * 0x9E3779B97F4A7C15L + salt
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    ((z ^ (z >>> 31)) & 0x7FFFFFFFL) | 1L // odd, positive, < 2^31
  }
  private val A: Array[Long] =
    Array.tabulate(NumPerms)(permCoeff(_, 0x5DEECE66DL))
  private val B: Array[Long] =
    Array.tabulate(NumPerms)(permCoeff(_, 0x2545F4914F6CDD1DL))

  /** One pass: MODULAR shingle hashes via the shared
    * [[ShingleHashes.computeModular]] kernel (whitespace tokens, "a b c"
    * shingles, rolling h·31 + cp fold mod P — SQL-replayable character by
    * character, unlike xxhash64), then 128 running minima of
    * (a_i·h + b_i) mod P. Null for < 3 tokens. */
  def compute(text: UTF8String): Array[Long] = {
    val hashes = ShingleHashes.computeModular(text)
    if (hashes.isEmpty) return null
    val mins = Array.fill(NumPerms)(Long.MaxValue)
    val a = A; val b = B // locals: no per-iteration field loads
    var i = 0
    while (i < hashes.length) {
      val hp = hashes(i) // already in [0, P)
      var j = 0
      while (j < NumPerms) {
        // Mersenne fold instead of `% P` (2^31 ≡ 1 mod P): a·hp + b < 2^62,
        // so two shift-mask-adds + one conditional subtract reduce exactly.
        // Division-free, so the JIT can pipeline/vectorize the perm loop.
        val x = a(j) * hp + b(j)
        var v = (x & P) + (x >>> 31)
        v = (v & P) + (v >>> 31)
        if (v >= P) v -= P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    mins
  }

  /** Column-API entry point. Input must be a string column. */
  def apply(c: Column): Column =
    Bridge.column(MinHashSignature(Bridge.expression(c)))
}
