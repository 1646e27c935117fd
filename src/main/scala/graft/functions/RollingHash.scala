package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash (Rabin–Karp style) over a string's UTF-8
  * bytes: h = Σ b_i · B^i  (mod P), computed as h = h·B + b_i per byte.
  * Native codegen'd expression — a tight primitive loop per row, the
  * document-identity hash a fingerprinting pipeline computes per doc at
  * corpus scale.
  *
  * B = 31, P = 2^31 − 1; result is a non-negative long < P.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  private val B = 31L
  private val P = 2147483647L

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * B + (bytes(i) & 0xFF)) % P
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val (bytes, h, i) =
        (ctx.freshName("bytes"), ctx.freshName("h"), ctx.freshName("i"))
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = ($h * ${B}L + ($bytes[$i] & 0xFF)) % ${P}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash {
  /** Column-API entry point. Input must be a string column. */
  def apply(c: Column): Column = Bridge.column(RollingHash(Bridge.expression(c)))
}
