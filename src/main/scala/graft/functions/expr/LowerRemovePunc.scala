package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused native kernel for the reference mapper's `lowerRemovePunc`
  * (`MapperImpl.so @0x1f558`): delete the 32 ASCII punctuation characters
  * and lowercase A-Z, in ONE byte-level pass.
  *
  * This is the custom-`Expression` upgrade path (SURVEY.md §7.4) over the
  * built-in composition `translate(regexp_replace(c, "[\\p{Punct}]", ""))`
  * — same semantics (pinned by a ScalaCheck equivalence property), but no
  * regex engine, no intermediate string, and real codegen: [[doGenCode]]
  * emits a static call that participates in WholeStageCodegen like any
  * built-in.
  *
  * Byte-level is exact here: every affected character (punct, A-Z) is a
  * single ASCII byte, and multi-byte UTF-8 sequences only contain bytes
  * ≥ 0x80 (negative as JVM signed bytes), which no range check below
  * matches — non-ASCII text passes through untouched, matching both the
  * built-in composition and the reference's C-locale behavior.
  */
case class LowerRemovePunc(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_normalize requires a string argument, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_normalize"

  protected override def nullSafeEval(input: Any): Any =
    LowerRemovePunc.kernel(input.asInstanceOf[UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expr.LowerRemovePunc.kernel($c)")

  protected override def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LowerRemovePunc {
  /** The byte-level kernel, shared by interpreted eval and generated
    * code. Ranges are exactly Java's `\p{Punct}`: `!`-`/` `:`-`@`
    * `[`-`` ` `` `{`-`~`. */
  def kernel(s: UTF8String): UTF8String = {
    val in = s.getBytes
    val out = new Array[Byte](in.length)
    var i = 0
    var j = 0
    while (i < in.length) {
      val b = in(i)
      val punct = (b >= 33 && b <= 47) || (b >= 58 && b <= 64) ||
        (b >= 91 && b <= 96) || (b >= 123 && b <= 126)
      if (!punct) {
        out(j) = if (b >= 65 && b <= 90) (b + 32).toByte else b
        j += 1
      }
      i += 1
    }
    UTF8String.fromBytes(out, 0, j)
  }
}
