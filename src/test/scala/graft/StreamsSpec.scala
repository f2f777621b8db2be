package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streams
import graft.streaming.Streams.SessionEvent

/** Multi-batch semantics of the stateful stream sessionizer: the open
  * session must carry across micro-batches through the state store and
  * the final snapshot must equal the batch sessionization. */
class StreamsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.get

  test("sessionizer state carries open sessions across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val m = 60L * 1000000L
    val input = MemoryStream[SessionEvent]
    val sessions = input.toDS()
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)(
        Streams.sessionizeGroup(30 * m))
    val q = sessions.toDF().writeStream
      .outputMode(OutputMode.Update())
      .format("memory").queryName("spec_sess")
      .start()
    // batch 1: two events 10 min apart (one open session)
    input.addData(SessionEvent(1L, 1L, 0L), SessionEvent(1L, 2L, 10 * m))
    q.processAllAvailable()
    // batch 2: one event 5 min later (extends the open session), then
    // one 2 hours later (new session)
    input.addData(SessionEvent(1L, 3L, 15 * m), SessionEvent(1L, 4L, 135 * m))
    q.processAllAvailable()
    val snap = spark.table("spec_sess")
      .groupBy("user_id", "session_start_us")
      .agg(org.apache.spark.sql.functions.max("session_end_us").as("session_end_us"),
        org.apache.spark.sql.functions.max("n_events").as("n_events"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._2)
    q.stop()
    // state carried: session 1 spans both batches with 3 events
    assert(snap.toSeq == Seq((1L, 0L, 15 * m, 3L), (1L, 135 * m, 135 * m, 1L)))
  }
}
