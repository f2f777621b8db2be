package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Watermark + append-mode windowed aggregation: the bounded-state
  * streaming shape for unbounded streams (complete mode, used for the
  * oracle queries, keeps all windows forever; with a watermark the
  * engine finalizes and emits a window once event time passes its end
  * + delay, then drops its state). */
case class WmEv(ts: java.sql.Timestamp, value: Double)

class WatermarkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.get

  def ev(minute: Int, v: Double) = WmEv(new java.sql.Timestamp(minute * 60000L), v)

  test("append-mode window emits exactly the windows the watermark closed") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[WmEv]
    val agg = input.toDS()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(unix_micros(col("window.start")).as("start_us"),
        col("n"), col("total"))
    val q = agg.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("wm_spec").start()
    input.addData(ev(5, 1.0), ev(20, 2.0))   // hour-0 window
    q.processAllAvailable()
    // nothing emitted: watermark (20min - 10min) hasn't passed hour 0's end
    assert(spark.table("wm_spec").count() == 0)
    input.addData(ev(75, 4.0))               // hour-1 event...
    q.processAllAvailable()
    input.addData(ev(130, 8.0))              // pushes watermark past hour 1
    q.processAllAvailable()
    val rows = spark.table("wm_spec")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    q.stop()
    // hour-0 closed with both events; hour-1 closed with one
    assert(rows.toSeq == Seq((0L, 2L, 3.0), (3600L * 1000000L, 1L, 4.0)))
  }
}
