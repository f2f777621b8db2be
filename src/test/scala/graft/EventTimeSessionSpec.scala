package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Analytics
import graft.streaming.Streams

/** Append-mode sessionization with watermark + EventTimeTimeout:
  * sessions close either via an in-batch gap or when the watermark
  * passes end + gap across batches; out-of-order events within the
  * allowed lateness still extend (or prepend to) the open session. */
class EventTimeSessionSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.get

  private val M = 60L * 1000000L // one minute in micros
  // base offset: an event at ts=0 sits exactly on the initial
  // watermark and is late-filtered — start the clock at 1 hour
  private val B = 60 * M

  test("out-of-order batches: sessions close by timeout and match batch sessionize") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long)] // (user_id, event_id, ts_us)
    val events = input.toDF().toDF("user_id", "event_id", "ts_us")
      .select(col("user_id"), col("event_id"),
        timestamp_micros(col("ts_us")).as("ts"))
    val sessions = Streams.sessionizeClosedFromStream(
      events, gapMinutes = 30, lateness = "15 minutes")
    val sink = "ets_closed"
    val q = sessions.toDF().writeStream
      .outputMode("append").format("memory").queryName(sink).start()
    try {
      // batch 1: user 1 opens a session; events arrive OUT OF ORDER
      // (even if the engine splits them into micro-batches, 15 min of
      // allowed lateness keeps the earlier event on time)
      input.addData((1L, 2L, B + 10 * M), (1L, 1L, B))
      q.processAllAvailable() // nothing final yet
      assert(spark.table(sink).count() == 0)

      // batch 2: a late-but-allowed event extends the open session;
      // user 2's far-future event drags the watermark forward
      input.addData((1L, 3L, B + 12 * M), (2L, 10L, B + 120 * M))
      q.processAllAvailable() // watermark: 105m >> 12m + 30m gap

      // batch 3: timeout fires with the advanced watermark — user 1's
      // session (0..12m, 3 events) is now final and appended
      input.addData((2L, 11L, B + 121 * M))
      q.processAllAvailable()

      val closed = spark.table(sink)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(closed == Set((1L, B, B + 12 * M, 3L)))

      // the closed session must equal batch sessionization of the same
      // events (restricted to sessions the watermark has sealed)
      val batch = Analytics.sessionize(
        Seq((1L, 1L, B), (1L, 2L, B + 10 * M), (1L, 3L, B + 12 * M),
          (2L, 10L, B + 120 * M), (2L, 11L, B + 121 * M))
          .toDF("user_id", "event_id", "ts_us")
          .select(col("user_id"), col("event_id"),
            timestamp_micros(col("ts_us")).as("ts"),
            lit("x").as("event_type"), lit(1.0).as("value"),
            lit("{}").as("props")),
        gapMinutes = 30)
        .select(col("user_id"), col("session_start_us"),
          col("session_end_us"), col("n_events"))
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(closed.subsetOf(batch)) // appended sessions are exactly batch sessions
      // user 2's session is still open (watermark hasn't passed it)
      assert(batch -- closed == Set((2L, B + 120 * M, B + 121 * M, 2L)))
    } finally q.stop()
  }

  test("bounded file run appends exactly the sessions sealed by the final watermark") {
    import spark.implicits._
    val d = "/root/testdata/sf0.001"
    val gapUs = 30L * 60 * 1000000L
    val latenessUs = 10L * 60 * 1000000L
    val closed = Streams.sessionizeClosed(spark, d) // gap 30m, lateness 10m
      .select(col("user_id"), col("session_start_us"),
        col("session_end_us"), col("n_events"))
      .as[(Long, Long, Long, Long)].collect().toSet
    val batchDf = Analytics.sessionize(graft.sources.Tables.events(spark, d), 30)
      .select(col("user_id"), col("session_start_us"),
        col("session_end_us"), col("n_events"))
    val batch = batchDf.as[(Long, Long, Long, Long)].collect().toSet
    assert(closed.subsetOf(batch) && closed.nonEmpty)
    // the final watermark is max event time - lateness; a session is
    // closed iff its end + gap fell behind it, open otherwise
    val maxTsUs = graft.sources.Tables.events(spark, d)
      .agg(max(unix_micros(col("ts")))).as[Long].head()
    val watermarkUs = maxTsUs - latenessUs
    val expectedClosed = batch.filter(s => s._3 + gapUs < watermarkUs)
    assert(closed == expectedClosed)
  }
}
