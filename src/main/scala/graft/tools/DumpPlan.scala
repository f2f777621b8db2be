package graft.tools

/** Dev utility: print the formatted physical plan of registered
  * queries (for PLANS.md evidence). Usage:
  * `runMain graft.tools.DumpPlan <sfDir> <key> [<key> ...]` */
object DumpPlan {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = graft.GraftSession.local("graft-plan")
    args.tail.foreach { key =>
      println(s"==== $key ====")
      println(graft.SparkEntry.queries(key)(spark, dir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.SimpleMode))
    }
    spark.stop()
  }
}
