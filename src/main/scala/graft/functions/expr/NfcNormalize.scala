package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen expression — the
  * text-pipeline prerequisite Spark has no built-in for: web text mixes
  * composed ("é") and decomposed ("e" + U+0301) forms of the same
  * grapheme, which breaks exact dedup hashing, tokenizer merges, and
  * n-gram overlap unless every document is canonicalized first (every
  * production tokenizer pipeline — SentencePiece, HF normalizers —
  * leads with exactly this step).
  *
  * Same custom-`Expression` posture as [[LowerRemovePunc]]: a static
  * kernel shared by interpreted eval and [[doGenCode]], participating
  * in WholeStageCodegen like a built-in. The kernel takes the
  * `Normalizer.isNormalized` fast path first — ASCII and
  * already-composed text (the overwhelming majority) never allocates —
  * and only round-trips through String for the rare decomposed input.
  * Cross-engine: DuckDB's `nfc_normalize` implements the same Unicode
  * canonical composition, so results hash-match by the standard.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_nfc requires a string argument, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_nfc"

  protected override def nullSafeEval(input: Any): Any =
    NfcNormalize.kernel(input.asInstanceOf[UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expr.NfcNormalize.kernel($c)")

  protected override def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  /** NFC kernel: fast-path identity for already-normalized input. */
  def kernel(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
