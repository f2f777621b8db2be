package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.plans.{DotExpr, MinHashSigExpr, NearestCellsExpr, SimHashExpr, TokenizeExpr, TopKByScore}

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
    ext.injectFunction((
      new FunctionIdentifier("graft_nearest_cells"),
      new ExpressionInfo(classOf[NearestCellsExpr].getName, "graft_nearest_cells"),
      (args: Seq[Expression]) => {
        require(args.length == 4,
          "graft_nearest_cells(v, cids, units, nProbe) takes four arguments")
        NearestCellsExpr(args.head, args(1), args(2), intLit(args(3),
          "graft_nearest_cells nProbe"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinHashSigExpr].getName, "graft_minhash_sig"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "graft_minhash_sig(shingles, perms) takes two arguments")
        MinHashSigExpr(args.head, intLit(args(1), "graft_minhash_sig perms"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHashExpr].getName, "graft_simhash"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_simhash(tokens) takes one argument")
        SimHashExpr(args.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKByScore].getName, "graft_topk"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "graft_topk(score, id, k) takes three arguments")
        TopKByScore(args.head, args(1), intLit(args(2), "graft_topk k"))
          .toAggregateExpression()
      }))
  }

  /** Foldable-int argument (k / nProbe must be plan constants). */
  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case _ => throw new IllegalArgumentException(s"$what must be an integer literal")
  }
}
