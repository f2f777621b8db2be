package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

import graft.functions.Text

/** G-family: Structured Streaming surfaces of the batch operators.
  *
  * Both run `Trigger.AvailableNow` over a parquet file source — the
  * same incremental execution a live stream would use (micro-batches,
  * state store), just bounded, so results are comparable 1:1 with the
  * batch oracle. At scale the file source becomes Kafka/object-store
  * listing; nothing below changes.
  */
object Streams {

  /** The file streaming source requires a directory; the corpus ships
    * as single parquet files in a read-only tree. Stage a per-table
    * directory of symlinks under /tmp (cheap, no copy). */
  private[streaming] def stageAsDir(file: String): String = {
    import java.nio.file.{Files, Paths}
    val src = Paths.get(file)
    val dir = Paths.get("/tmp/graft_stream",
      Integer.toHexString(file.hashCode), src.getFileName.toString)
    Files.createDirectories(dir)
    val link = dir.resolve(src.getFileName.toString)
    // Verify runs queries on a thread pool and several streams stage
    // the same table; check-then-create races, so treat "already
    // exists" as success instead.
    if (!Files.exists(link)) {
      try Files.createSymbolicLink(link, src)
      catch { case _: java.nio.file.FileAlreadyExistsException => () }
    }
    dir.toString
  }

  /** One event inside the sessionizer. */
  case class SessionEvent(user_id: Long, event_id: Long, ts_us: Long)

  /** Open-session state carried across micro-batches. */
  case class OpenSession(startUs: Long, endUs: Long, n: Long)

  /** Emitted session snapshot. */
  case class Session(user_id: Long, session_start_us: Long,
                     session_end_us: Long, n_events: Long)

  /** Streaming word count ≡ the batch `wc_wordcount`: complete-mode
    * aggregation into a memory sink. The plan is the identical
    * explode→partial-agg→final-agg shape; Spark keeps the running
    * (word → count) state in the state store between micro-batches —
    * the streaming twin of the reference's reducers
    * (reference main.go:185-197). */
  def wordCount(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    val stream = spark.readStream.schema(schema)
      .parquet(stageAsDir(s"$dir/documents.parquet"))
    val counts = stream
      .select(explode(Text.tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    val sink = s"st_wc_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = counts.writeStream
      .outputMode(OutputMode.Complete())
      .format("memory").queryName(sink)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(sink)
  }

  /** Streaming tumbling-window aggregation ≡ the batch `eventsHourly`:
    * event-time `window()` in complete mode (windows may always update
    * — for watermark-bounded state swap in `withWatermark` + append;
    * complete keeps the ≡-batch contract exact for the oracle). */
  def eventsHourly(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Num
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = spark.readStream.schema(schema)
      .parquet(stageAsDir(s"$dir/events.parquet"))
    val ts =
      if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
        timestamp_micros(expr("ts div 1000"))
      else col("ts")
    val agg = stream
      .select(ts.as("ts"), col("event_type"), col("value"))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), Num.dsum(col("value")).as("total_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n_events"), col("total_value"))
    val sink = s"st_hr_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = agg.writeStream
      .outputMode(OutputMode.Complete())
      .format("memory").queryName(sink)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(sink)
  }

  /** Streaming exact dedup ≡ batch [[graft.operators.Dedup.exact]]
    * keyed output: running (fingerprint → keeper, count) state in
    * complete mode. The keeper is min(doc_id) — deterministic under
    * any arrival order, unlike first-seen dropDuplicates. */
  def dedupExact(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    val stream = spark.readStream.schema(schema)
      .parquet(stageAsDir(s"$dir/documents.parquet"))
    val agg = stream
      .select(col("doc_id"), md5(col("text")).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_docs"))
    val sink = s"st_dd_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = agg.writeStream
      .outputMode(OutputMode.Complete())
      .format("memory").queryName(sink)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(sink)
  }

  /** Per-invocation sessionizer: merges the open session carried in
    * state with this batch's (sorted) events, emits every session seen
    * so far in its current extent, and keeps the last one open in
    * state. Update-mode snapshot semantics: a session may re-emit
    * longer in a later batch; the final snapshot equals the batch
    * sessionization. */
  def sessionizeGroup(gapUs: Long)(
      userId: Long, events: Iterator[SessionEvent],
      state: GroupState[OpenSession]): Iterator[Session] = {
    val sorted = events.toSeq.sortBy(e => (e.ts_us, e.event_id))
    var sessions = Vector.empty[OpenSession]
    var open = state.getOption
    sorted.foreach { e =>
      open match {
        case Some(s) if e.ts_us - s.endUs <= gapUs =>
          open = Some(OpenSession(s.startUs, e.ts_us, s.n + 1))
        case Some(s) =>
          sessions :+= s
          open = Some(OpenSession(e.ts_us, e.ts_us, 1))
        case None =>
          open = Some(OpenSession(e.ts_us, e.ts_us, 1))
      }
    }
    open.foreach(state.update)
    (sessions ++ open).iterator
      .map(s => Session(userId, s.startUs, s.endUs, s.n))
  }

  /** Streaming gap-sessionization via flatMapGroupsWithState — custom
    * per-key state (the open session) maintained by the engine's state
    * store, the Spark-native form of a stateful stream operator. */
  def sessionize(spark: SparkSession, dir: String,
                 gapMinutes: Int = 30): DataFrame = {
    import spark.implicits._
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = spark.readStream.schema(schema)
      .parquet(stageAsDir(s"$dir/events.parquet"))
    val tsUs =
      if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
        expr("ts div 1000") // epoch-nanos long → micros
      else unix_micros(col("ts"))
    val typed: Dataset[SessionEvent] = stream
      .select(col("user_id"), col("event_id"), tsUs.as("ts_us"))
      .as[SessionEvent]
    val sessions = typed
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout)(
        sessionizeGroup(gapMinutes * 60L * 1000000L))
    val sink = s"st_sess_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = sessions.toDF().writeStream
      .outputMode(OutputMode.Update())
      .format("memory").queryName(sink)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // Snapshot semantics: keep the latest (longest) extent per session
    // start — with a single AvailableNow batch this is a no-op.
    spark.table(sink)
      .groupBy(col("user_id"), col("session_start_us"))
      .agg(max(col("session_end_us")).as("session_end_us"),
        max(col("n_events")).as("n_events"))
  }
}
