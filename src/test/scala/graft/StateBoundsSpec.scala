package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streams

/** Scale evidence for the streaming operators: state-store occupancy
  * is bounded by live keys (one open session per user; one row per
  * distinct fingerprint), and the EventTimeTimeout path actually
  * RELEASES state once the watermark seals a session — at 100 TB the
  * difference between bounded and leaking state is the job surviving
  * day two. */
class StateBoundsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.get

  private val M = 60L * 1000000L

  private def stateRows(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
    q.recentProgress.reverse.flatMap(p => Option(p.stateOperators))
      .headOption.map(_.map(_.numRowsTotal).sum).getOrElse(-1L)

  test("closed-session state: one row per open user, freed on timeout") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val B = 60 * M
    val input = MemoryStream[(Long, Long, Long)]
    val events = input.toDF().toDF("user_id", "event_id", "ts_us")
      .select(col("user_id"), col("event_id"),
        timestamp_micros(col("ts_us")).as("ts"))
    val sessions = Streams.sessionizeClosedFromStream(
      events, gapMinutes = 30, lateness = "5 minutes")
    val q = sessions.toDF().writeStream
      .outputMode("append").format("memory").queryName("sb_closed").start()
    try {
      // three users open sessions → three state rows, no more
      input.addData((1L, 1L, B), (2L, 2L, B + M), (3L, 3L, B + 2 * M))
      q.processAllAvailable()
      assert(stateRows(q) == 3)
      // a far-future event seals users 1-3; their state must be FREED
      input.addData((4L, 4L, B + 600 * M))
      q.processAllAvailable()
      input.addData((4L, 5L, B + 601 * M)) // trigger the timeout batch
      q.processAllAvailable()
      assert(stateRows(q) == 1) // only user 4 remains open
      assert(spark.table("sb_closed").count() == 3) // and all 3 emitted
    } finally q.stop()
  }

  test("stream-stream band join: pairs emitted, buffered state evicted by watermark") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val B = 60 * M
    val input = MemoryStream[(Long, Long, Long)]
    def side(alias: String) = input.toDF().toDF("user_id", "event_id", "ts_us")
      .select(col("user_id").as(s"${alias}_user"),
        col("event_id").as(s"${alias}_event"),
        timestamp_micros(col("ts_us")).as(s"${alias}_ts"))
      .withWatermark(s"${alias}_ts", "1 minute")
    val pairs = Streams.bandJoin(side("a"), side("b"), bandMinutes = 2)
    val q = pairs.writeStream
      .outputMode("append").format("memory").queryName("sb_pairs").start()
    try {
      // two events 1 min apart → one ordered pair; both rows buffered
      input.addData((1L, 1L, B), (1L, 2L, B + M))
      q.processAllAvailable()
      assert(spark.table("sb_pairs").as[(Long, Long, Long, Long, Long)]
        .collect().toSet == Set((1L, 1L, 2L, B, B + M)))
      val buffered = stateRows(q)
      assert(buffered > 0) // both sides hold band-window state
      // a far-future event advances the watermark past B + band +
      // lateness on both sides: the old buffered rows must be evicted
      input.addData((2L, 10L, B + 600 * M))
      q.processAllAvailable()
      input.addData((2L, 11L, B + 601 * M))
      q.processAllAvailable()
      assert(stateRows(q) < buffered + 4) // old rows gone; only recent remain
      assert(spark.table("sb_pairs").count() == 2) // (1,2) and (10,11)
    } finally q.stop()
  }

  test("streaming minhash: idle buckets are evicted once the watermark passes the TTL") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val H = 3600L * 1000000L // one hour in micros
    val textA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val textC = "completely different unrelated words over here instead now yes"
    val textD = "another disjoint vocabulary set nothing shared with prior docs"
    val input = MemoryStream[(Long, String, Long)]
    val docs = input.toDF().toDF("doc_id", "text", "ts_us")
      .select(col("doc_id"), col("text"),
        timestamp_micros(col("ts_us")).as("ts"))
    // event-time TTL of 1h: eviction is driven by the docs' own
    // timestamps, fully deterministic — no wall clock in the test
    val cands = Streams.minhashCandidatesFromStream(docs,
      idleTtlMs = 3600L * 1000L)
    val q = cands.toDF().writeStream
      .outputMode("update").format("memory").queryName("sb_mh_ttl").start()
    try {
      // batch 1: two identical docs at T0 populate 16 band buckets
      input.addData((1L, textA, H), (2L, textA, H))
      q.processAllAvailable()
      assert(stateRows(q) == 16) // one state row per (band, bkey) bucket
      assert(spark.table("sb_mh_ttl").distinct().count() == 1) // (1,2)
      // batch 2: unrelated doc at T0+3h → watermark advances past
      // T0+TTL AFTER this batch (eviction sweeps on the next one)
      input.addData((3L, textC, 4 * H))
      q.processAllAvailable()
      // batch 3: another unrelated doc — processed with watermark
      // T0+3h > T0+1h, so textA's 16 idle buckets are REMOVED while
      // textC/textD's stay: 32 rows, not 48.
      input.addData((5L, textD, 4 * H + 1000L))
      q.processAllAvailable()
      assert(stateRows(q) == 32)
      // recall-window trade, explicit: a post-TTL duplicate of doc 1
      // starts an empty bucket — no pair with the evicted members...
      input.addData((4L, textA, 4 * H + 2000L))
      q.processAllAvailable()
      val pairs = spark.table("sb_mh_ttl").distinct()
        .as[(Long, Long)].collect().toSet
      assert(!pairs.contains((1L, 4L)) && !pairs.contains((2L, 4L)))
      // ...and within-TTL arrivals still pair (doc 6 against doc 4).
      input.addData((6L, textA, 4 * H + 3000L))
      q.processAllAvailable()
      val pairs2 = spark.table("sb_mh_ttl").distinct()
        .as[(Long, Long)].collect().toSet
      assert(pairs2.contains((4L, 6L)))
    } finally q.stop()
  }

  test("long-horizon streaming minhash: state PLATEAUS across many TTL windows") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val H = 3600L * 1000000L
    // 10 ingests, each a fresh-vocabulary doc 2h of event time apart
    // (TTL 1h, lateness 10min): every batch adds 16 new (band, bkey)
    // buckets, and the watermark crossing lastTouch+TTL removes the
    // batch-before-last's 16 — so an UNBOUNDED run holds at most two
    // batches' buckets. This is the closest CI gets to the
    // unbounded-run contract: state is a plateau, not a line.
    val input = MemoryStream[(Long, String, Long)]
    val docs = input.toDF().toDF("doc_id", "text", "ts_us")
      .select(col("doc_id"), col("text"),
        timestamp_micros(col("ts_us")).as("ts"))
    val cands = Streams.minhashCandidatesFromStream(docs,
      idleTtlMs = 3600L * 1000L)
    val q = cands.toDF().writeStream
      .outputMode("update").format("memory").queryName("sb_plateau").start()
    try {
      val sizes = (0 until 10).map { k =>
        // disjoint vocabulary per batch: distinct shingle sets hash to
        // distinct buckets, the worst case for key growth
        val text = (0 until 6).map(i => s"w${k}x$i").mkString(" ")
        input.addData((k.toLong, text, (2 * k + 1) * H))
        q.processAllAvailable()
        stateRows(q)
      }
      info(s"state rows per batch: ${sizes.mkString(", ")}")
      // warm-up (16, then 32), then a hard plateau: the max over the
      // run is the steady-state two-batch residency, and the last 5
      // micro-batches sit exactly on it — zero net growth per ingest.
      assert(sizes.max <= 32, s"state exceeded two batches' buckets: $sizes")
      assert(sizes.takeRight(5).toSet.size == 1,
        s"state still moving over the last 5 batches: $sizes")
      assert(sizes.last < 10 * 16 / 2, s"state grew with corpus size: $sizes")
    } finally q.stop()
  }

  test("streaming dedup state is one row per distinct fingerprint") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val agg = input.toDF().toDF("doc_id", "text")
      .select(col("doc_id"), md5(col("text")).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_docs"))
    val q = agg.writeStream
      .outputMode("complete").format("memory").queryName("sb_dedup").start()
    try {
      input.addData((1L, "aa"), (2L, "bb"), (3L, "aa"), (4L, "aa"))
      q.processAllAvailable()
      assert(stateRows(q) == 2) // two distinct texts, not four docs
      input.addData((5L, "aa"), (6L, "cc"))
      q.processAllAvailable()
      assert(stateRows(q) == 3) // grows with distinct keys only
    } finally q.stop()
  }
}
