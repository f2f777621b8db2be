package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Num

/** The reproducibility claim behind every money aggregate: decimal
  * sums are associative, so results are bit-identical under any
  * partitioning — which plain double sums are not. */
class NumSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  test("dsum is bit-identical across partitionings") {
    val xs = (1 to 10000).map(i => math.sin(i) * 1e6)
    val results = Seq(1, 3, 17).map { p =>
      xs.toDF("x").repartition(p).agg(Num.dsum($"x")).as[Double].head()
    }
    assert(results.distinct.size == 1)
    // and it equals the sequential decimal reference
    val ref = xs.map(BigDecimal(_).setScale(6, BigDecimal.RoundingMode.HALF_UP))
      .sum.toDouble
    assert(results.head == ref)
  }
}
