package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** All 8 random-hyperplane LSH bucket ids of a 64-dim vector in ONE
  * native pass — replaces 32 interpreted zip_with/aggregate dot folds per
  * row (higher-order functions evaluate outside codegen) with a primitive
  * loop over the deterministic ±1 plane signs.
  *
  * Bit-parity contract: each plane's dot product accumulates over
  * elements IN ORDER starting from 0.0 — the identical IEEE sequence as
  * the `0.0 ± v[1] ± v[2] …` fold the SQL oracles replay and the
  * Column-API formulation it supersedes (spec-proven in FunctionsSpec).
  * Bucket bit j of table t = sign(v · plane_{4t+j}).
  *
  * The plane signs are [[signAt]]'s splitmix scramble of (plane, dim) —
  * the single source of truth shared with the oracle generators in
  * graft.operators.Similarity.
  */
case class HyperplaneBuckets(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "hyperplane_buckets"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    new GenericArrayData(HyperplaneBuckets.compute(v.toDoubleArray()))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.HyperplaneBuckets$$.MODULE$$.compute($c.toDoubleArray()));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneBuckets {

  val NumTables = 8
  val PlanesPerTable = 4

  /** Deterministic ±1 plane component — the same splitmix scramble as the
    * oracle generators (see Similarity.planeSign, kept in sync by a
    * FunctionsSpec parity test). */
  def signAt(plane: Int, k: Int): Double = {
    var z = (plane.toLong << 32 | k.toLong) * 0x9E3779B97F4A7C15L + 0x1234567L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    if (((z ^ (z >>> 31)) & 1L) == 0L) 1.0 else -1.0
  }

  // plane -> dim -> ±1.0, materialized once per JVM
  private lazy val Signs: Array[Array[Double]] =
    Array.tabulate(NumTables * PlanesPerTable, 64)(signAt)

  def compute(v: Array[Double]): Array[Int] = {
    // A silent partial dot would bucket from a prefix of the dims while the
    // SQL oracle's v[k] past-the-end reads go NULL — engine and oracle
    // would diverge quietly. A dimension mismatch must be an ERROR.
    require(v.length == 64,
      s"hyperplane_buckets expects a 64-dim vector, got ${v.length}")
    val out = new Array[Int](NumTables)
    var t = 0
    while (t < NumTables) {
      var bucket = 0
      var j = 0
      while (j < PlanesPerTable) {
        val s = Signs(t * PlanesPerTable + j)
        val n = s.length
        var dot = 0.0
        var k = 0
        while (k < n) { dot += v(k) * s(k); k += 1 }
        if (dot > 0) bucket |= 1 << j
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    out
  }

  /** Column-API entry point. Input must be array<double>. */
  def apply(c: Column): Column =
    Bridge.column(HyperplaneBuckets(Bridge.expression(c)))
}
