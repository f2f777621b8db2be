package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §4 claims skew is "absorbed by partial agg + AQE skew
  * handling" — this spec makes the claim checkable: a join keyed 90%
  * on one hot key must come out of AQE with the skewed partition
  * split (the SMJ marked skew=true), and the result unchanged. */
class AqeSkewSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.get

  test("AQE splits the hot partition of a skewed sort-merge join") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // shrink thresholds so a test-sized hot key counts as skewed
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // force SMJ
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 90% of left rows share key 0; right side is small and distinct.
      // The payload column survives the join (projected into the agg)
      // so the hot partition is genuinely heavy, and the downstream
      // aggregate is GLOBAL — a keyed agg on the join key would reuse
      // the join's partitioning and AQE would (correctly) refuse to
      // split the skewed partition rather than add a shuffle.
      val left = spark.range(0, 200000).select(
        when(col("id") % 10 =!= 0, 0L).otherwise(col("id") % 1000).as("k"),
        concat(lit("payload_padding_padding_padding_"), col("id")).as("pay"))
      val right = spark.range(0, 1000).select(col("id").as("k"),
        (col("id") * 2).as("rv"))
      val joined = left.join(right, "k")
        .agg(count(lit(1)).as("n"), sum(col("rv")).as("s"),
          sum(length(col("pay"))).as("bytes"))
      val row = joined.collect().head
      // correctness: every left row matches exactly one right key
      assert(row.getLong(0) == 200000L)
      // plan evidence: the final adaptive plan split the skewed side
      val adaptive = joined.queryExecution.executedPlan.collectFirst {
        case a: AdaptiveSparkPlanExec => a
      }.get
      val finalPlan = adaptive.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark/split the skewed join:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
