package graft.functions.expr

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, StringType}

/** Fused kernel for the span-gram digest build: the 16-byte MD5 of every
  * word n-gram of a token array, in one pass — the codegen replacement
  * for `transform(sequence(...), i => array_join(slice(toks,i,n)))`
  * followed by `md5(...)`.
  *
  * The built-in composition was the bench's heaviest allocation site
  * (r13 VERDICT #1: `q_text_boilerplate`'s 3× GC-band variance): the
  * higher-order `transform` is interpreted (no codegen, a lambda
  * evaluation per gram), each gram materializes a slice array plus an
  * ~8-word joined string, and Spark's `md5` constructs a fresh
  * commons-codec digest instance per call and emits a 32-char hex
  * string. This kernel hashes the token bytes directly with a
  * thread-local reused [[MessageDigest]] — per gram it allocates ONLY
  * the 16-byte output digest.
  *
  * Equivalence: MD5 runs over exactly the UTF-8 bytes of
  * `array_join(slice(toks, i, n), " ")` (token bytes joined by a single
  * 0x20), so the binary digest is the `unhex` of the old hex digest —
  * a bijection. Every consumer uses the gram digest for IDENTITY only
  * (groupBy / join / countDistinct keys; `g` never reaches a query's
  * output), so grouping semantics are exactly unchanged while the
  * carried key narrows from a 32-char string to 16 bytes.
  *
  * Token arrays come from [[graft.functions.TextFunctions.tokenize]]
  * and contain no null elements (split never yields nulls and
  * array_remove drops empties) — elements are read null-unsafely.
  */
case class NgramMd5(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_ngram_md5 requires array<string> and n >= 1, got $other, n=$n")
  }
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_ngram_md5"

  protected override def nullSafeEval(input: Any): Any =
    NgramMd5.kernel(input.asInstanceOf[ArrayData], n)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expr.NgramMd5.kernel($c, $n)")

  protected override def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NgramMd5 {
  /** One digest instance per thread, reset per gram — Spark's built-in
    * `md5` constructs a fresh instance per CALL, which at corpus-gram
    * volume is pure allocation pressure. */
  private val mdLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }
  private val Space = ' '.toByte

  /** Shared by interpreted eval and generated code. */
  def kernel(tokens: ArrayData, n: Int): ArrayData = {
    val t = tokens.numElements()
    val m = t - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val md = mdLocal.get()
    // extract each token's bytes once (a token participates in up to n
    // grams; re-slicing per gram was the old shape's other allocation)
    val toks = new Array[Array[Byte]](t)
    var i = 0
    while (i < t) {
      toks(i) = tokens.getUTF8String(i).getBytes
      i += 1
    }
    val out = new Array[Any](m)
    var s = 0
    while (s < m) {
      md.reset()
      var j = 0
      while (j < n) {
        if (j > 0) md.update(Space)
        md.update(toks(s + j))
        j += 1
      }
      out(s) = md.digest()
      s += 1
    }
    new GenericArrayData(out)
  }
}
