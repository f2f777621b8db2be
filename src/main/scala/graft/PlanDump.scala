package graft

/** Explain-audit helper: prints the formatted physical plan of one or
  * more registered queries. Usage:
  * `sbt "runMain graft.PlanDump <sfDir> <query> [<query> ...]"`.
  * The PLANS.md evidence snippets come from here. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <sfDir> <query> [<query> ...]")
    val spark = GraftSession.local("graft-plandump")
    args.drop(1).foreach { name =>
      println(s"==== $name ====")
      SparkEntry.queries(name)(spark, args(0)).explain("formatted")
    }
    spark.stop()
  }
}
