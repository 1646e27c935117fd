package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash (Rabin–Karp style) over a string's Unicode
  * codepoints: h = h·B + cp_i (mod P) per codepoint. Native codegen'd
  * expression — a tight primitive loop per row, the document-identity
  * hash a fingerprinting pipeline computes per doc at corpus scale.
  *
  * Codepoints (not UTF-8 bytes) so the DuckDB oracle's per-character
  * ascii() fold matches for ALL of Unicode, not just ASCII corpora.
  * B = 31, P = 2^31 − 1; result is a non-negative long < P.
  */
case class RollingHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  // a non-string child fails AT ANALYSIS, not as a runtime
  // ClassCastException inside eval/codegen
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  private val B = 31L
  private val P = 2147483647L

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * B + cp) % P
      i += Character.charCount(cp)
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val (s, h, i, cp) = (ctx.freshName("s"), ctx.freshName("h"),
        ctx.freshName("i"), ctx.freshName("cp"))
      s"""
         |java.lang.String $s = $c.toString();
         |long $h = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $h = ($h * ${B}L + $cp) % ${P}L;
         |  $i += java.lang.Character.charCount($cp);
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
