package graft.plugins

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.expr.{CosineSimilarity, LowerRemovePunc, NfcNormalize}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions in the SQL function registry, so `spark.sql` users get
  * them by name. Activate with
  * `.config("spark.sql.extensions", "graft.plugins.GraftExtensions")`
  * (or `withExtensions`) — the JVM-classpath analog of the reference's
  * dlopen plugin loading, complementing [[OperatorRegistry]]'s
  * DataFrame-level stage registry.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_normalize"),
      new ExpressionInfo(classOf[LowerRemovePunc].getName, "graft_normalize"),
      (children: Seq[Expression]) => LowerRemovePunc(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (children: Seq[Expression]) => NfcNormalize(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (children: Seq[Expression]) =>
        CosineSimilarity(children.head, children(1))))
    ext.injectOptimizerRule(_ => CollapseNormalize)
  }
}
