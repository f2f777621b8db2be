package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.plans.{DotExpr, TokenizeExpr}

/** SparkSessionExtensions hook: registers graft's native expressions
  * as SQL functions, so `spark.sql("SELECT graft_tokens(text) …")`
  * plans the same codegen'd kernels the Column API uses.
  *
  * Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_tokens"),
      new ExpressionInfo(classOf[TokenizeExpr].getName, "graft_tokens"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_tokens(text) takes one argument")
        TokenizeExpr(args.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotExpr].getName, "graft_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_dot(a, b) takes two arguments")
        DotExpr(args.head, args(1))
      }))
  }
}
