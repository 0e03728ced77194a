package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.DotProductF

/** Spark extensions entry point: lets any Spark deployment load graft's
  * native functions without code changes —
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * (cluster-wide what `GraftSession.tune` does per-session).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_f"),
      new ExpressionInfo("graft.functions.NativeFunctions", "dot_f"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.length == 2, "dot_f takes 2 arguments")
        DotProductF(args(0), args(1))
      }))
  }
}
