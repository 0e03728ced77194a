package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.NativeFunctions

/** Spark extensions entry point: lets any Spark deployment load graft's
  * native functions without code changes —
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * (cluster-wide what `GraftSession.tune` does per-session; both paths
  * iterate the same NativeFunctions.fns registry).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    NativeFunctions.fns.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.NativeFunctions", name),
        builder))
    }
}
