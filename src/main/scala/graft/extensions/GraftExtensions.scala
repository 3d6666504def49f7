package graft.extensions

import graft.functions.DotProductLong
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension entry point for cluster deployments:
  * `--conf spark.sql.extensions=graft.extensions.GraftExtensions`
  * injects graft's native expressions into every session's registry
  * (local code paths register on demand via GraftFunctions.register).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot_q"),
      new ExpressionInfo(classOf[DotProductLong].getName, "graft_dot_q"),
      (args: Seq[Expression]) => DotProductLong(args(0), args(1))))
  }
}
