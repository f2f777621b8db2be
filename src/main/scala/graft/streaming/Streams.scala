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
    * directory of symlinks under /tmp (cheap, no copy). A
    * Spark-written parquet DIRECTORY (part files — e.g. a ScaleProbe
    * corpus) is already a valid file-source dir and passes through:
    * symlinking a directory inside the staging dir reads as ZERO
    * files and the drain silently yields an empty result (r12 probe
    * finding — the G-family rows returned empty on any
    * directory-shaped corpus before this branch). */
  private[streaming] def stageAsDir(file: String): String = {
    import java.nio.file.{Files, Paths}
    val src = Paths.get(file)
    if (Files.isDirectory(src)) return file
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

  /** Event with its native event-time column: the EventTimeTimeout
    * checker requires the watermarked timestamp attribute to reach the
    * stateful operator, so the closed-session path keeps `ts` (an
    * Instant preserves the full micros) instead of projecting it to a
    * long upstream. */
  case class SessionEventTs(user_id: Long, event_id: Long,
                            ts: java.time.Instant) {
    def us: Long = ts.getEpochSecond * 1000000L + ts.getNano / 1000L
  }

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
    val counts = wordCountFromStream(
      FileStreamSource(s"$dir/documents.parquet").stream(spark))
    val sink = s"st_wc_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = counts.writeStream
      .outputMode(OutputMode.Complete())
      .format("memory").queryName(sink)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(sink)
  }

  /** Source-agnostic core of the streaming word count: any
    * [[StreamSource]] with a `text` column (file harness or
    * Kafka-shaped feed) runs the identical explode→agg plan. */
  def wordCountFromStream(stream: DataFrame): DataFrame =
    stream
      .select(explode(Text.tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Streaming tumbling-window aggregation ≡ the batch `eventsHourly`:
    * event-time `window()` in complete mode (windows may always update
    * — for watermark-bounded state swap in `withWatermark` + append;
    * complete keeps the ≡-batch contract exact for the oracle). */
  def eventsHourly(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Num
    val stream = FileStreamSource(s"$dir/events.parquet").stream(spark)
    val schema = stream.schema
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

  /** Streaming fixed-width value histogram ≡ batch
    * [[graft.operators.Analytics.eventValueHistogram]]: bucket =
    * floor(value/width) is a stateless per-row projection, so the
    * whole operator is ONE complete-mode aggregate on the
    * (type, bucket) key — the live distribution monitor (latency/spend
    * buckets updating as events arrive). State is one row per occupied
    * bucket: bounded by the value range over the width, not the
    * stream. Drained with AvailableNow the result equals the batch
    * histogram, so q_value_histogram's SQL is the oracle verbatim. */
  def valueHistogram(spark: SparkSession, dir: String,
                     width: Double): DataFrame = {
    val stream = FileStreamSource(s"$dir/events.parquet").stream(spark)
    val agg = stream
      .groupBy(col("event_type"),
        floor(col("value") / lit(width)).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_events"),
        min(col("value")).as("min_value"), max(col("value")).as("max_value"))
    val sink = s"st_vh_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = agg.writeStream
      .outputMode(OutputMode.Complete())
      .format("memory").queryName(sink)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(sink)
  }

  /** Streaming volume-spike anomaly detection ≡ batch
    * [[graft.operators.Analytics.eventAnomalies]]: the per-(type,
    * minute) counts maintain as ONE complete-mode aggregate (state
    * bounded by occupied minutes — the same state the histogram/hourly
    * rows carry), and the z-score stage runs as the POST-DRAIN serving
    * query over the drained count table (st_funnel's pattern: state in
    * the stream, the report as a query over it) — the live rate-alarm
    * shape: counts update per batch, the alarm query reads them on
    * demand. Drained, counts equal the batch minute counts, so the
    * report equals the batch anomaly pass and its SQL is the oracle
    * verbatim. */
  def eventAnomalies(spark: SparkSession, dir: String,
                     z: Double): DataFrame = {
    val stream = FileStreamSource(s"$dir/events.parquet").stream(spark)
    val perMin = stream.groupBy(col("event_type"),
        date_format(date_trunc("minute", col("ts")),
          "yyyy-MM-dd HH:mm:ss").as("minute"))
      .agg(count(lit(1)).as("n"))
    val sink = s"st_an_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = perMin.writeStream
      .outputMode(OutputMode.Complete())
      .format("memory").queryName(sink)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // the serving query: per-type exact-integer sufficient statistics
    // + the fixed-order z expression over the drained counts — the
    // identical tail as the batch operator. The counts land in a
    // parquet table first (the production shape — alarm queries read
    // a maintained counts table; it also sidesteps the memory-sink
    // view's self-join attribute conflict)
    val outDir = TempDirs.create("graft_st_anomaly")
    spark.table(sink).write.mode("overwrite").parquet(outDir)
    val counts = spark.read.parquet(outDir)
    val stats = counts.groupBy(col("event_type"))
      .agg(count(lit(1)).as("k"), sum(col("n")).as("s"),
        sum(col("n") * col("n")).as("ss"))
    counts.join(stats, "event_type")
      .withColumn("mean", col("s").cast("double") / col("k"))
      .withColumn("varr",
        (col("ss").cast("double") - col("s").cast("double") * col("s")
          / col("k")) / col("k"))
      .filter(col("varr") > 0)
      .withColumn("zscore", (col("n") - col("mean")) / sqrt(col("varr")))
      .filter(abs(col("zscore")) >= z)
      .select(col("event_type"), col("minute"), col("n"), col("zscore"))
  }

  /** Streaming corpus quality gate ≡ batch
    * [[graft.operators.Corpus.qualityGate]]: the gate is pure per-row
    * column math over `text` plus ONE aggregation on source, so the
    * identical operator chain runs unchanged over a stream in complete
    * mode — per-source pass counts update as document batches arrive
    * (the live ingest monitor a corpus pipeline runs). State is one
    * row per (source, gate) — bounded by the source enum, not the
    * corpus. Drained with AvailableNow the result equals the batch
    * gate, so cp_quality_gate's SQL is the oracle verbatim. */
  def qualityGate(spark: SparkSession, dir: String, minTokens: Int,
                  minStopRatio: Double, maxDupGram: Double,
                  maxTopWord: Double): DataFrame = {
    val stream = FileStreamSource(s"$dir/documents.parquet").stream(spark)
    val gated = graft.operators.Corpus.qualityGate(stream, minTokens,
      minStopRatio, maxDupGram, maxTopWord)
    val sink = s"st_qg_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = gated.writeStream
      .outputMode(OutputMode.Complete())
      .format("memory").queryName(sink)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(sink)
  }

  /** Streaming PII scrub ≡ batch [[graft.operators.Corpus.piiScrub]]:
    * the scrub is a pure per-row regex projection, so it runs
    * STATELESS in append mode — each document batch emits its scrubbed
    * rows exactly once and there is NO state store at all (the shape a
    * live ingest pipeline runs ahead of landing bytes: nothing to
    * watermark, nothing to bound, restart-safe by idempotence of the
    * projection). Drained with AvailableNow the appended batches union
    * to the batch result, so cp_pii_scrub's SQL is the oracle
    * verbatim. */
  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    val stream = FileStreamSource(s"$dir/documents.parquet").stream(spark)
    val scrubbed = graft.operators.Corpus.piiScrub(stream)
    val sink = s"st_pii_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = scrubbed.writeStream
      .outputMode(OutputMode.Append())
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
    val stream = FileStreamSource(s"$dir/documents.parquet").stream(spark)
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

  /** One event inside the streaming funnel. */
  case class FunnelEvent(user_id: Long, ts_us: Long, event_type: String)

  /** Per-(user, step) snapshot row: earliest qualifying time for the
    * step, or -1 while the user hasn't reached it. */
  case class FunnelStepTime(user_id: Long, step: Int, t_us: Long)

  /** Streaming funnel group function: state is the per-step earliest
    * qualifying times (-1 = not reached), exactly the batch fold's
    * accumulator ([[graft.operators.Analytics.funnel]]). Each batch's
    * events sort in-batch and fold FROM the carried state, so the
    * result equals the batch fold whenever each user's events arrive
    * time-ordered ACROSS batches (an AvailableNow drain qualifies);
    * state is monotone — a step time is set once and never lowered —
    * so a late out-of-order event can never un-convert a user, the
    * same open-state caveat as [[sessionizeGroup]]. Emits the full
    * k-row snapshot per touched user per batch (update mode). */
  def funnelGroup(steps: Seq[String], withinUs: Option[Long] = None)(
      userId: Long, events: Iterator[FunnelEvent],
      state: GroupState[Array[Long]]): Iterator[FunnelStepTime] = {
    val t = state.getOption.getOrElse(Array.fill(steps.length)(-1L))
    events.toSeq.sortBy(_.ts_us).foreach { e =>
      val i = steps.indexOf(e.event_type)
      if (i >= 0 && t(i) == -1L &&
          (i == 0 || (t(i - 1) != -1L && e.ts_us > t(i - 1) &&
            withinUs.forall(w => e.ts_us - t(i - 1) <= w))))
        t(i) = e.ts_us
    }
    state.update(t)
    steps.indices.iterator.map(i => FunnelStepTime(userId, i, t(i)))
  }

  /** Source-agnostic core of the streaming funnel: any typed event
    * stream (file harness, Kafka-shaped feed, MemoryStream in specs)
    * runs the identical stateful fold. */
  def funnelSnapshotsFromStream(events: Dataset[FunnelEvent],
                                steps: Seq[String],
                                withinUs: Option[Long] = None)
      : Dataset[FunnelStepTime] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout)(
        funnelGroup(steps, withinUs))
  }

  /** Streaming ordered funnel ≡ the batch `q_events_funnel`: per-user
    * step state via flatMapGroupsWithState (the engine's state store
    * carries each user's step times between micro-batches — at scale
    * this is the always-on conversion tracker a live event stream
    * feeds), snapshot-deduped and counted per step AFTER the drain
    * (an aggregation can't follow update-mode flatMapGroupsWithState
    * inside the stream; the step count is the serving query). */
  def funnel(spark: SparkSession, dir: String,
             steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    import spark.implicits._
    val stream = FileStreamSource(s"$dir/events.parquet").stream(spark)
    val schema = stream.schema
    val tsUs =
      if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
        expr("ts div 1000") // epoch-nanos long → micros
      else unix_micros(col("ts"))
    val snapshots = funnelSnapshotsFromStream(
      stream
        .filter(col("event_type").isin(steps: _*))
        .select(col("user_id"), tsUs.as("ts_us"), col("event_type"))
        .as[FunnelEvent],
      steps)
    val sink = s"st_fun_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = snapshots.toDF().writeStream
      .outputMode(OutputMode.Update())
      .format("memory").queryName(sink)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // Snapshot semantics: step times are monotone (-1 → set-once), so
    // the latest snapshot per (user, step) is the max; then the batch
    // funnel's closing shape — counts over reached steps, all steps
    // present whenever >= 1 user exists.
    spark.table(sink)
      .groupBy(col("user_id"), col("step"))
      .agg(max(col("t_us")).as("t_us"))
      .groupBy(col("step"))
      .agg(count(when(col("t_us") >= 0L, lit(1))).as("n_users"))
      .select(col("step"),
        element_at(array(steps.map(lit): _*), col("step") + 1)
          .as("step_name"),
        col("n_users"))
  }

  /** Closed-session sessionizer group function: append-mode semantics.
    * A session is emitted exactly once — either when a later event of
    * the same user starts a new session (in-batch gap), or when the
    * event-time watermark passes session_end + gap (EventTimeTimeout),
    * at which point no on-time event can ever extend it. Out-of-order
    * events within the allowed lateness land in earlier batches' open
    * state and re-sort here. */
  def sessionizeClosedGroup(gapUs: Long)(
      userId: Long, events: Iterator[SessionEventTs],
      state: GroupState[OpenSession]): Iterator[Session] = {
    if (state.hasTimedOut) {
      // watermark >= end + gap: the open session is final
      val s = state.get
      state.remove()
      Iterator.single(Session(userId, s.startUs, s.endUs, s.n))
    } else {
      // Interval merge: the open state session and this batch's events
      // (as unit intervals), sorted by start — handles late-but-allowed
      // events that precede the open session, not just extend it.
      val items = (state.getOption.toSeq ++
        events.map(e => OpenSession(e.us, e.us, 1)).toSeq)
        .sortBy(s => (s.startUs, s.endUs))
      var closed = Vector.empty[OpenSession]
      var open = Option.empty[OpenSession]
      items.foreach { it =>
        open match {
          case Some(s) if it.startUs <= s.endUs + gapUs =>
            open = Some(OpenSession(s.startUs, math.max(s.endUs, it.endUs),
              s.n + it.n))
          case Some(s) =>
            closed :+= s
            open = Some(it)
          case None =>
            open = Some(it)
        }
      }
      open.foreach { s =>
        state.update(s)
        // fire once the watermark proves no extension is possible
        state.setTimeoutTimestamp((s.endUs + gapUs) / 1000L + 1L)
      }
      closed.iterator.map(s => Session(userId, s.startUs, s.endUs, s.n))
    }
  }

  /** Closed-session streaming sessionization over any streaming frame
    * with (user_id, event_id, ts) columns: watermark + EventTimeTimeout
    * + append output. Unlike [[sessionize]]'s update-mode snapshots,
    * each session is emitted exactly once, when it can no longer grow —
    * the shape a downstream consumer (e.g. a sessions table) wants.
    * State per user is one open session; the watermark bounds it. */
  def sessionizeClosedFromStream(events: DataFrame, gapMinutes: Int,
                                 lateness: String): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .withWatermark("ts", lateness)
      .select(col("user_id"), col("event_id"), col("ts"))
      .as[SessionEventTs]
    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout)(
        sessionizeClosedGroup(gapMinutes * 60L * 1000000L))
  }

  /** File-source binding of [[sessionizeClosedFromStream]]: the
    * AvailableNow run drains the data, then the advanced watermark
    * (max event time - lateness) fires timeouts in the final batch, so
    * every session sealed by that watermark is appended exactly once;
    * sessions within gap+lateness of the stream's end stay open in
    * state — correct append semantics for a stream that could still
    * receive data. Multi-batch out-of-order behavior is
    * EventTimeSessionSpec's job. */
  def sessionizeClosed(spark: SparkSession, dir: String,
                       gapMinutes: Int = 30,
                       lateness: String = "10 minutes"): DataFrame = {
    val stream = FileStreamSource(s"$dir/events.parquet").stream(spark)
    val schema = stream.schema
    val ts =
      if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
        timestamp_micros(expr("ts div 1000"))
      else col("ts")
    val sessions = sessionizeClosedFromStream(
      stream.select(col("user_id"), col("event_id"), ts.as("ts")),
      gapMinutes, lateness)
    val sink = s"st_sessc_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = sessions.toDF().writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(sink)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(sink)
  }

  /** A near-dup candidate pair (id_a < id_b). */
  case class CandPair(id_a: Long, id_b: Long)

  /** Default idle-bucket TTL: long enough that any bounded
    * (AvailableNow / spec) run completes inside it — so the ≡-batch
    * candidate contract holds — while still bounding an unbounded run's
    * state to the buckets touched in the last hour of event time. */
  val DefaultBucketIdleTtlMs: Long = 60L * 60L * 1000L

  /** One banded doc arrival: the event-time `ts` must reach the
    * stateful operator for EventTimeTimeout (an Instant keeps micros). */
  case class BandedDoc(doc_id: Long, ts: java.time.Instant,
                       band: Int, bkey: Long)

  /** Per-bucket group function for streaming MinHash: each (band,
    * bkey) bucket keeps its `maxBucket` most recent member doc ids in
    * state; an arriving doc pairs with every stored member, then joins
    * the bucket (FIFO-capped — the bound that keeps per-bucket state
    * and per-arrival work O(maxBucket) forever). Docs within a batch
    * process in doc_id order so a bounded replay is deterministic.
    *
    * State KEY-COUNT bound: the FIFO caps rows per bucket, but the
    * number of (band, bkey) buckets grows with the corpus — unbounded
    * without eviction. Each update arms a WATERMARK-driven timeout at
    * last-touch + `idleTtlMs`; a bucket untouched while the event-time
    * watermark crosses that point is REMOVED (EventTimeTimeout, the
    * same machinery as the closed-session operator — chosen over
    * ProcessingTimeTimeout, whose shouldRunAnotherBatch=true busy-loops
    * AvailableNow/processAllAvailable drains). The recall trade is
    * explicit: a new doc cannot pair with members last seen more than
    * idleTtlMs of event time ago — near-dup detection over a sliding
    * recency window, the standard contract for an unbounded streaming
    * dedup. Runs whose event-time span stays inside the TTL (all
    * specs, any bounded drain with batch-time stamps) see the exact
    * batch candidate set. */
  def minhashBucketGroup(maxBucket: Int,
                         idleTtlMs: Long = DefaultBucketIdleTtlMs)(
      key: (Int, Long), rows: Iterator[BandedDoc],
      state: GroupState[Seq[Long]]): Iterator[CandPair] = {
    if (state.hasTimedOut) {
      state.remove() // idle bucket: free the key, not just the members
      Iterator.empty
    } else {
      var members = state.getOption.getOrElse(Seq.empty)
      val out = scala.collection.mutable.ArrayBuffer.empty[CandPair]
      var lastTouchMs = Long.MinValue
      rows.toSeq.sortBy(r => (r.doc_id, r.ts)).foreach { r =>
        lastTouchMs = math.max(lastTouchMs, r.ts.toEpochMilli)
        members.foreach { m =>
          if (m != r.doc_id)
            out += (if (m < r.doc_id) CandPair(m, r.doc_id)
                    else CandPair(r.doc_id, m))
        }
        // membership check: a replayed/duplicate doc must not occupy a
        // second FIFO slot and prematurely evict a distinct member
        // (members is ≤ maxBucket, so the linear scan is bounded).
        if (!members.contains(r.doc_id))
          members = (members :+ r.doc_id).takeRight(maxBucket)
      }
      state.update(members)
      // arm strictly above the current watermark (late data could put
      // last-touch + TTL behind it, which setTimeoutTimestamp rejects);
      // saturate the sum so idleTtlMs = Long.MaxValue means "never",
      // not an overflow-negative "immediately"
      val armAt =
        if (idleTtlMs > Long.MaxValue - math.max(lastTouchMs, 0L)) Long.MaxValue
        else lastTouchMs + idleTtlMs
      state.setTimeoutTimestamp(
        math.max(state.getCurrentWatermarkMs() + 1, armAt))
      out.iterator
    }
  }

  /** Streaming MinHash near-dup candidate detection — the incremental
    * form of [[graft.operators.Dedup.minhashLsh]]'s candidate stage,
    * possible as a stream because the banded signature is now a
    * PER-ROW projection ([[graft.plans.MinHashSigExpr]]), not an
    * aggregate: sign → band → stateful bucket membership, one shuffle
    * on the (band, bkey) key per micro-batch. Candidates feed a batch
    * exact-Jaccard verify (same contract as the batch pipeline).
    * With `maxBucket` ≥ the largest bucket occupancy a bounded run
    * emits exactly the batch pipeline's banded candidate set. */
  def minhashCandidatesFromStream(docs: DataFrame, n: Int = 3,
                                  bands: Int = 16, rowsPerBand: Int = 8,
                                  maxBucket: Int = 1024,
                                  idleTtlMs: Long = DefaultBucketIdleTtlMs,
                                  lateness: String = "10 minutes"): Dataset[CandPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // Event time for the idle clock: a `ts` column if the feed has one
    // (the Kafka shape, or a test's synthetic stamps), else the batch
    // timestamp — current_timestamp() in a streaming query is the
    // trigger time, constant per batch, so the watermark tracks
    // arrival time for sources with no native event time. The
    // `lateness` default keeps cross-partition event-time disorder
    // from dropping docs at the stateful operator (a 0-second
    // watermark discards anything behind the max seen ts); docs later
    // than `lateness` behind the front ARE dropped — the documented
    // trade of any watermarked stream.
    val stamped =
      if (docs.columns.contains("ts")) docs
      else docs.withColumn("ts", current_timestamp())
    stamped
      .withWatermark("ts", lateness)
      .select(col("doc_id"), col("ts"),
        Text.shingles(Text.tokens(col("text")), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), col("ts"), posexplode(graft.functions.Hashing.bandKeys(
          graft.plans.Exprs.minhashSig(col("sh"), bands * rowsPerBand),
          bands, rowsPerBand)).as(Seq("band", "bkey")))
      .as[BandedDoc]
      .groupByKey(r => (r.band, r.bkey))
      .flatMapGroupsWithState(OutputMode.Update(),
        GroupStateTimeout.EventTimeTimeout)(
        minhashBucketGroup(maxBucket, idleTtlMs))
  }

  /** File-source binding of [[minhashCandidatesFromStream]]: bounded
    * AvailableNow run, distinct pair set (a pair can surface from
    * several bands and batches). */
  def minhashCandidates(spark: SparkSession, dir: String): DataFrame = {
    val stream = FileStreamSource(s"$dir/documents.parquet").stream(spark)
    val cands = minhashCandidatesFromStream(stream)
    val sink = s"st_mh_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = cands.toDF().writeStream
      .outputMode(OutputMode.Update())
      .format("memory").queryName(sink)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(sink).distinct()
  }

  /** Streaming MinHash near-dup pipeline completed to the batch
    * contract: candidates → VERIFIED pairs. The stateful candidate
    * stream ([[minhashCandidatesFromStream]]) finds who to compare;
    * each micro-batch's candidates are then exact-Jaccard-confirmed
    * against a persisted shingle store with a bounded batch join
    * inside foreachBatch (the production shape — a streaming
    * aggregation can't follow update-mode flatMapGroupsWithState, and
    * the store is a maintained table at corpus scale, not stream
    * state). Output is appended to a parquet sink table; a bounded
    * run over the same corpus emits exactly the batch
    * [[graft.operators.Dedup.minhashLsh]] pair set (spec-proven). */
  def minhashVerifiedFromStream(docs: DataFrame, store: DataFrame,
                                outDir: String, n: Int = 3,
                                tau: Double = 0.8): Unit = {
    val cands = minhashCandidatesFromStream(docs, n)
    val q = cands.toDF().writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        // a pair can surface from several bands within the batch;
        // cross-batch repeats are deduped at read (the sink is a pair
        // SET, and jaccard is deterministic per pair)
        graft.operators.Dedup.verifyCandidates(batch.distinct(), store, tau)
          .write.mode("append").parquet(outDir)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** File-source binding of [[minhashVerifiedFromStream]]: shingle
    * store from the batch table, bounded drain, distinct pair set. */
  def minhashVerified(spark: SparkSession, dir: String, n: Int = 3,
                      tau: Double = 0.8): DataFrame = {
    val store = graft.operators.Dedup.shingleRows(
      spark.read.parquet(s"$dir/documents.parquet"), n)
    val outDir = TempDirs.create("graft_mh_ver")
    try
      minhashVerifiedFromStream(
        FileStreamSource(s"$dir/documents.parquet").stream(spark),
        store, outDir, n, tau)
    finally store.unpersist() // run-scoped: the drain is complete
    spark.read.parquet(outDir).distinct()
  }

  /** Streaming MEDIA-kind census (r12, the F-family's live form) ≡
    * batch [[graft.operators.Multimodal.kindCensus]]: the per-kind
    * payload/dedup/byte-volume dashboard a media ingest keeps current.
    * Streaming aggregations can't chain (the batch census'
    * count(DISTINCT pm) is a second aggregation level), so the stream
    * maintains the CONTENT LEDGER — one complete-mode row per
    * (kind, payload md5) with its occurrence count and byte length,
    * exactly the table a media store's dedup keeps anyway — and the
    * census report runs as the POST-DRAIN serving query over it
    * (st_anomaly's state-plus-serving-query pattern). State is
    * bounded by DISTINCT content, not stream length: re-ingested
    * bytes fold into their ledger row. Drained ≡ the batch census,
    * so mm_kind_census's SQL is the oracle verbatim. */
  def mmKindCensus(spark: SparkSession, dir: String): DataFrame = {
    val stream = FileStreamSource(s"$dir/documents.parquet").stream(spark)
    val mm = graft.operators.Multimodal
    val ledger = mm.withPayload(stream)
      .select(mm.sniffKind(col("payload")).as("kind"),
        md5(col("payload")).as("pm"),
        octet_length(col("payload")).cast("long").as("len"))
      .groupBy(col("kind"), col("pm"))
      .agg(count(lit(1)).as("n"), min(col("len")).as("len"))
    val sink = s"st_mm_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = ledger.writeStream
      .outputMode(OutputMode.Complete())
      .format("memory").queryName(sink)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // the serving query: ledger → census (len rides the ledger row —
    // byte-identical content has one length — so total_bytes = Σ n·len).
    // n_unique counts NON-NULL pm rows: the batch census'
    // countDistinct(pm) skips the null-payload group, so the ledger's
    // (kind, NULL) row must not count as a distinct payload (it still
    // counts in n_payloads, exactly like batch count(1)).
    spark.table(sink)
      .groupBy(col("kind"))
      .agg(sum(col("n")).as("n_payloads"),
        count(col("pm")).as("n_unique"),
        sum(col("n") * col("len")).as("total_bytes"))
  }

  /** Streaming INGEST-TIME contamination screening — fuzzy benchmark
    * decontamination run where it belongs in production: on the ingest
    * stream, before a document ever reaches the corpus. The eval set
    * is fixed and the check is per-train-doc, so each micro-batch is
    * screened independently with the batch operator
    * ([[graft.operators.Corpus.decontaminateFuzzy]]: two-table
    * lossless SSJoin blocking — per-batch df order differs from the
    * full corpus' but losslessness needs no particular order, and
    * verification is the exact Jaccard) inside foreachBatch, hits
    * appended to a parquet sink. Per-doc aggregates are complete
    * within the doc's one batch, so a bounded drain emits exactly the
    * batch screening of the whole train side — its SQL is the oracle
    * verbatim. Each batch's internal persists release at batch end
    * (scoped bracket). IDEMPOTENT under foreachBatch's at-least-once
    * contract: each micro-batch OVERWRITES its own `batch=<id>`
    * subdirectory (the [[searchIndexFromStream]] pattern) instead of
    * appending to a shared sink, so a retried batch (task/driver
    * retry) rewrites its own hit rows rather than double-appending
    * them — the drained ≡ batch equivalence the oracle relies on
    * survives retries. A full RE-DRAIN from a fresh checkpoint
    * additionally gets [[searchServe]]'s staged-swap (r12, review
    * finding): a re-drain may batch the source DIFFERENTLY (file
    * compaction, a changed maxFilesPerTrigger), leaving stale
    * higher-numbered `batch=N` dirs from the prior run to
    * double-count — so each drain lands in a `.staging` sibling and
    * replaces the live batch dirs only on success, which also means
    * a failed re-drain leaves the previous screening intact. Readers
    * drop the batchId partition column (layout, not screening
    * data). */
  def contaminationFromStream(docs: DataFrame, evalDocs: DataFrame,
                              outDir: String, n: Int, tau: Double): Unit = {
    val stage = s"$outDir.staging"
    scala.reflect.io.Directory(new java.io.File(stage)).deleteRecursively()
    val q = docs.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.operators.CacheTracker.scoped {
          graft.operators.Corpus.decontaminateFuzzy(batch, evalDocs, n, tau)
            .write.mode("overwrite").parquet(s"$stage/batch=$batchId")
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    promoteStaged(stage, outDir)
  }

  /** The screening columns of [[graft.operators.Corpus.decontaminateFuzzy]]
    * — what readers of a contamination sink select (dropping the
    * `batch` partition column the idempotent layout adds). */
  private val ContaminationCols =
    Seq("doc_id", "n_matches", "max_jaccard", "first_eval_id")

  /** File-source binding of [[contaminationFromStream]]: the mod-split
    * eval set is the static side, the train side streams. */
  def contaminationScreen(spark: SparkSession, dir: String, n: Int,
                          tau: Double, evalMod: Int): DataFrame = {
    val evalDocs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % evalMod === 0)
    val stream = FileStreamSource(s"$dir/documents.parquet").stream(spark)
      .filter(col("doc_id") % evalMod =!= 0)
    val outDir = TempDirs.create("graft_contam")
    contaminationFromStream(stream, evalDocs, outDir, n, tau)
    spark.read.parquet(outDir)
      .select(ContaminationCols.map(col): _*)
  }

  /** Streaming ANN serving — the online half of a similarity service:
    * PROBE vectors arrive as a stream and each micro-batch is answered
    * against the static indexed corpus with the bounded brute-force
    * scorer ([[graft.operators.Similarity.knnBruteForce]], broadcast-
    * guarded: a micro-batch is naturally probe-sized, the regime the
    * broadcast ladder is built for — an oversized batch shards instead
    * of over-broadcasting). Results append to a parquet sink. The
    * corpus is static within a run and scoring/ranking is per-probe
    * deterministic, so a bounded drain over a finite probe stream
    * emits exactly the batch answer — the batch kNN SQL is the
    * oracle. */
  def knnFromStream(probes: DataFrame, embeddings: DataFrame, outDir: String,
                    k: Int): Unit = {
    val q = probes.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.operators.Similarity.knnBruteForce(embeddings, batch, k)
          .write.mode("append").parquet(outDir)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  // session-scoped sink dirs, deleted at JVM exit (shared helper —
  // production callers use the path-taking overloads and own their
  // sinks)
  private def TempDirs = graft.sources.Sinks.TempDirs

  /** File-source binding of [[knnFromStream]], temp-sink form (the CI
    * harness binding; the sink is session-scoped and cleaned at JVM
    * exit): every `mod`-th corpus vector plays the probe stream,
    * answered against the full corpus — mirrors the batch
    * knn_bruteforce binding exactly. */
  def knnServe(spark: SparkSession, dir: String, k: Int = 10,
               mod: Int = 50): DataFrame =
    knnServe(spark, dir, TempDirs.create("graft_st_knn"), k, mod)

  /** [[knnFromStream]] with a CALLER-SUPPLIED parquet sink — the
    * production entry point: answers land durably at `outDir` and the
    * returned frame (re)reads them from there. */
  def knnServe(spark: SparkSession, dir: String, outDir: String, k: Int,
               mod: Int): DataFrame = {
    val probeStream = FileStreamSource(s"$dir/embeddings.parquet").stream(spark)
      .filter(col("vec_id") % mod === 0)
    knnFromStream(probeStream,
      spark.read.parquet(s"$dir/embeddings.parquet"), outDir, k)
    spark.read.parquet(outDir)
  }

  /** Streaming ANN serving AGAINST THE PERSISTED INDEX (r14, VERDICT
    * r13 item #8): [[knnFromStream]] answers by brute force against
    * the static corpus — the correctness baseline's price, a full
    * corpus scan per micro-batch — where a production serving tier
    * reads the prebuilt IVF index (assigned cells + codebook, the
    * knn_ivf_served shape) and pays PROBE-side work only: each
    * micro-batch takes its nProbe nearest cells against the broadcast
    * codebook and joins the cell-pruned index slice. Cell assignment
    * under a fixed codebook is a pure per-row function and
    * scoring/ranking is per-probe deterministic, so a bounded
    * AvailableNow drain over a finite probe stream appends exactly
    * the batch [[graft.operators.Similarity.knnIvfIndexed]] answer —
    * knn_ivf_served's SQL is the oracle verbatim (StreamsSpec proves
    * the multi-batch union). */
  def knnIndexedFromStream(probes: DataFrame,
                           index: graft.operators.Similarity.IvfIndex,
                           outDir: String, k: Int, nProbe: Int): Unit = {
    val q = probes.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.operators.Similarity.knnIvfIndexed(index, batch, k, nProbe)
          .write.mode("append").parquet(outDir)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** File-source binding of [[knnIndexedFromStream]], temp-sink form
    * (the CI harness binding): every `mod`-th corpus vector plays the
    * probe stream, answered against the CALLER's persisted IVF index
    * frames — mirrors the batch knn_ivf_served binding exactly. */
  def knnIndexedServe(spark: SparkSession, dir: String,
                      index: graft.operators.Similarity.IvfIndex,
                      k: Int, nProbe: Int, mod: Int = 50): DataFrame =
    knnIndexedServe(spark, dir, index,
      TempDirs.create("graft_st_knn_idx"), k, nProbe, mod)

  /** [[knnIndexedFromStream]] with a CALLER-SUPPLIED parquet sink —
    * the production entry point. */
  def knnIndexedServe(spark: SparkSession, dir: String,
                      index: graft.operators.Similarity.IvfIndex,
                      outDir: String, k: Int, nProbe: Int,
                      mod: Int): DataFrame = {
    val probeStream = FileStreamSource(s"$dir/embeddings.parquet").stream(spark)
      .filter(col("vec_id") % mod === 0)
    knnIndexedFromStream(probeStream, index, outDir, k, nProbe)
    spark.read.parquet(outDir)
  }

  /** Streaming inverted-index maintenance + serving ≡ batch
    * [[graft.operators.TextAnalysis.search]]: each document
    * micro-batch APPENDS its query-term postings — per-doc tf is a
    * within-row computation (the explode never crosses rows), so any
    * batch split yields the identical postings with NO cross-batch
    * state at all — plus its doc count; after the drain,
    * [[graft.operators.TextAnalysis.searchIndexed]] serves from the
    * accumulated postings with the streamed doc total. The shape of a
    * live ingest keeping a search index current while queries run
    * against it. Drained with AvailableNow the result equals the
    * batch search, so ta_search's SQL is the oracle verbatim. */
  def searchServe(spark: SparkSession, dir: String, terms: Seq[String],
                  k: Int): DataFrame =
    searchServe(spark, dir, terms, k,
      TempDirs.create("graft_st_search_p"),
      TempDirs.create("graft_st_search_d"))

  /** [[searchServe]] with CALLER-SUPPLIED index paths — the production
    * entry point: the postings and per-doc id tables land durably
    * where the caller says, survive the session, and can be re-served
    * (or grown by a later drain) without rebuilding. Re-draining the
    * same source into the same paths is IDEMPOTENT (each micro-batch
    * overwrites its own batchId-keyed subdirectory, see
    * [[searchIndexFromStream]]) and SAFE: the fresh drain lands in
    * `<dir>.staging` siblings and only replaces the live batch dirs
    * after it completes, so a drain that fails mid-way (source error,
    * job failure) leaves the caller's previous index fully intact and
    * serveable.
    *
    * r17 layout (the parameter was renamed `countsDir` → `docsDir` in
    * r18 to match, closing the ADVICE r17 naming seam): the second
    * tier holds one (doc_id) row per streamed doc —
    * [[graft.operators.TextAnalysis.PostingsStore]]'s id tier, same
    * size class as the per-batch (bigram-count) rows it replaced in
    * r17 and strictly more informative — so the drained artifacts ARE
    * a PostingsStore and
    * [[graft.operators.TextAnalysis.postingsRetract]] applies to a
    * STREAMED index verbatim (a takedown against the live search
    * index needs the surviving N, which a count-only tier cannot
    * produce once token-less docs are involved; StreamsSpec pins the
    * drained-then-retracted serve against the batch survivors). A
    * pre-r17 counts-tier directory fails the doc_id read loudly
    * rather than serving a wrong N — do NOT point `docsDir` at one. */
  def searchServe(spark: SparkSession, dir: String, terms: Seq[String],
                  k: Int, postingsDir: String, docsDir: String): DataFrame = {
    val stream = FileStreamSource(s"$dir/documents.parquet").stream(spark)
    // every drain starts a FRESH checkpoint and re-lists the full
    // current source, so stale batch=N subdirectories from a PRIOR
    // drain that produced MORE batches must not survive into the new
    // index. Rather than clearing the live dirs up front (which would
    // destroy the previous good index if THIS drain then fails), drain
    // into staging siblings and swap only on success.
    val (stageP, stageN) = (s"$postingsDir.staging", s"$docsDir.staging")
    Seq(stageP, stageN).foreach { p =>
      scala.reflect.io.Directory(new java.io.File(p)).deleteRecursively(); ()
    }
    searchIndexFromStream(stream, terms, stageP, stageN)
    Seq((stageP, postingsDir), (stageN, docsDir)).foreach {
      case (stage, live) => promoteStaged(stage, live)
    }
    val nDocs = spark.read.parquet(docsDir).select("doc_id").count()
    // the batchId partition column is layout, not postings data
    graft.operators.TextAnalysis.searchIndexed(
      spark.read.parquet(postingsDir).select("doc_id", "w", "tf"),
      nDocs, terms, k)
  }

  /** Replace `live`'s batch=N subdirectories with `stage`'s (directory
    * renames — no data copy) and drop the staging dir. Called only
    * after a drain completes, so the unprotected window is the swap
    * itself (two directory-rename passes), not the whole drain. */
  private def promoteStaged(stage: String, live: String): Unit = {
    val liveDir = new java.io.File(live)
    liveDir.mkdirs()
    Option(liveDir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("batch="))
      .foreach(f => { scala.reflect.io.Directory(f).deleteRecursively(); () })
    Option(new java.io.File(stage).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("batch="))
      .foreach { f =>
        java.nio.file.Files.move(f.toPath,
          liveDir.toPath.resolve(f.getName)); ()
      }
    scala.reflect.io.Directory(new java.io.File(stage)).deleteRecursively(); ()
  }

  /** Streaming LM-model maintenance + serving ≡ batch
    * [[graft.operators.TextAnalysis.lmScore]]: each document
    * micro-batch writes its own (bigram, c12) count table — bigram
    * counts are ADDITIVE and within-row (the explode never crosses
    * rows), so any batch split's partial counts sum to the batch
    * model with no cross-batch state; after the drain the model
    * builds from the accumulated counts
    * ([[graft.operators.TextAnalysis.lmModelFromCounts]] re-sums the
    * per-batch rows) and scores the corpus. The shape of a live
    * ingest keeping a quality-scoring model current. Same durability
    * contract as [[searchServe]]: batchId-keyed idempotent overwrite,
    * staged drain, swap on success. */
  def lmServe(spark: SparkSession, dir: String): DataFrame =
    lmServe(spark, dir, TempDirs.create("graft_st_lm"))

  /** [[lmServe]] with a CALLER-SUPPLIED model-counts path — the
    * production entry point (the counts survive the session and can
    * be grown by a later drain). */
  def lmServe(spark: SparkSession, dir: String, countsDir: String): DataFrame = {
    val stream = FileStreamSource(s"$dir/documents.parquet").stream(spark)
    val stage = s"$countsDir.staging"
    scala.reflect.io.Directory(new java.io.File(stage)).deleteRecursively()
    val q = stream.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.operators.TextAnalysis.lmCounts(batch)
          .write.mode("overwrite").parquet(s"$stage/batch=$batchId")
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    promoteStaged(stage, countsDir)
    val model = graft.operators.TextAnalysis.lmModelFromCounts(
      spark.read.parquet(countsDir).select("bigram", "c12"))
    graft.operators.TextAnalysis.lmScoreIndexed(
      spark.read.parquet(s"$dir/documents.parquet"), model)
  }

  /** Source-agnostic index-maintenance core: drain any document
    * stream, writing term postings and the per-doc ID TIER (r17 —
    * one (doc_id) row per streamed doc, replacing the per-batch count
    * rows: the serving N derives as its count, and the tier is what
    * makes a streamed index retraction-capable, see [[searchServe]]).
    * Each micro-batch OVERWRITES its own `batch=<id>` subdirectory
    * instead of appending to a shared one — foreachBatch is
    * at-least-once, so a replayed batch (failure retry, or a full
    * re-drain from a fresh checkpoint) rewrites its own output rather
    * than double-counting tf, df, and nDocs. */
  private[streaming] def searchIndexFromStream(stream: DataFrame,
      terms: Seq[String], postingsDir: String, docsDir: String): Unit = {
    val q = stream.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.operators.TextAnalysis.searchIndex(batch)
          .filter(col("w").isInCollection(terms))
          .write.mode("overwrite").parquet(s"$postingsDir/batch=$batchId")
        batch.select(col("doc_id"))
          .write.mode("overwrite").parquet(s"$docsDir/batch=$batchId")
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** The banded join core over two watermarked sides with
    * (x_user, x_event, x_ts) columns — shared by the file binding and
    * the MemoryStream state-eviction spec. */
  private[graft] def bandJoin(a: DataFrame, b: DataFrame,
                              bandMinutes: Int): DataFrame =
    a.join(b,
        col("a_user") === col("b_user") &&
          col("b_ts") > col("a_ts") &&
          col("b_ts") <= col("a_ts") + expr(s"INTERVAL $bandMinutes MINUTES"))
      .select(col("a_user").as("user_id"),
        col("a_event").as("event_a"), col("b_event").as("event_b"),
        unix_micros(col("a_ts")).as("ts_a_us"),
        unix_micros(col("b_ts")).as("ts_b_us"))

  /** Stream-STREAM inner self-join: ordered pairs of events from the
    * same user at most `bandMinutes` apart. Both sides carry a
    * watermark and the join condition bounds the time band, so each
    * side's buffered state is evicted once the watermark passes
    * ts + band + lateness — per-key state is bounded by the band's
    * event density, the requirement for an unbounded run. For a
    * bounded AvailableNow run an inner join emits exactly every
    * matching pair, so the batch band self-join is a valid oracle. */
  def eventPairs(spark: SparkSession, dir: String, bandMinutes: Int = 5,
                 lateness: String = "10 minutes"): DataFrame = {
    def side(alias: String): DataFrame = {
      val stream = FileStreamSource(s"$dir/events.parquet").stream(spark)
      val ts =
        if (stream.schema("ts").dataType == org.apache.spark.sql.types.LongType)
          timestamp_micros(expr("ts div 1000"))
        else col("ts")
      stream
        .select(col("user_id").as(s"${alias}_user"),
          col("event_id").as(s"${alias}_event"), ts.as(s"${alias}_ts"))
        .withWatermark(s"${alias}_ts", lateness)
    }
    val pairs = bandJoin(side("a"), side("b"), bandMinutes)
    val sink = s"st_pairs_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = pairs.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(sink)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(sink)
  }

  /** Streaming gap-sessionization via flatMapGroupsWithState — custom
    * per-key state (the open session) maintained by the engine's state
    * store, the Spark-native form of a stateful stream operator. */
  def sessionize(spark: SparkSession, dir: String,
                 gapMinutes: Int = 30): DataFrame = {
    import spark.implicits._
    val stream = FileStreamSource(s"$dir/events.parquet").stream(spark)
    val schema = stream.schema
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

  /** Source-agnostic SEMANTIC-store maintenance core: drain any
    * embedding stream through the EXACT incremental pass
    * ([[graft.operators.Dedup.semanticKeepersDelta]]) against the
    * store grown by all prior batches, returning the final store.
    * foreachBatch serializes micro-batches, so the sequential-state
    * handoff is safe by construction, and the RESULT is
    * batch-split-independent (min-id labels compose —
    * DeltaDedupSpec's sequential-ingest equivalence), so a drained
    * run equals the one-shot batch keeper map whatever the batching.
    * Both store frames are eagerly checkpointed per batch, so state
    * lineage stays flat across an unbounded run instead of chaining
    * one anti-join + union per ingest. SAME-BYTES re-ingested
    * vectors are replaced, not doubled (the delta's anti-join),
    * which is what makes an at-least-once replay of a batch a
    * no-op; an embedding UPDATE under a reused vec_id is out of the
    * delta contract (see [[graft.operators.Dedup.semanticKeepersDelta]]
    * — sticky-store semantics; mint a new id per content version or
    * rebuild). */
  private[streaming] def semanticMaintainFromStream(stream: DataFrame,
      store0: graft.operators.Dedup.SemanticStore,
      tau: Double): graft.operators.Dedup.SemanticStore = {
    var store = store0
    val q = stream.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        store = semanticBatchStep(store, batch.toDF(), tau)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    store
  }

  /** One micro-batch of semantic-store maintenance: the exact
    * incremental pass, result frames eagerly checkpointed so the
    * cross-batch state's lineage stays flat. Factored out so the
    * multi-batch spec drives the REAL step across genuine
    * processAllAvailable micro-batches. */
  private[graft] def semanticBatchStep(
      store: graft.operators.Dedup.SemanticStore, batch: DataFrame,
      tau: Double): graft.operators.Dedup.SemanticStore = {
    val u = graft.operators.Dedup.semanticKeepersDelta(store,
      batch.select(col("vec_id"), col("embedding")), tau).updatedStore
    graft.operators.Dedup.SemanticStore(
      u.lsh.copy(bucketed = u.lsh.bucketed.localCheckpoint(true)),
      u.assignment.localCheckpoint(true))
  }

  /** Streaming SEMANTIC-dedup maintenance + serving ≡ batch
    * [[graft.operators.Dedup.semanticKeepers]] — the D-family's live
    * ingest shape: an embedding stream keeps the semantic keeper
    * ASSIGNMENT (the table downstream corpus filtering reads) and the
    * LSH bucket store current, one exact incremental pass per
    * micro-batch. Drained with AvailableNow the assignment is
    * definitionally the batch run's, so dd_semantic's SQL is the
    * oracle verbatim. Temp-store form (CI harness binding). */
  def semanticServe(spark: SparkSession, dir: String,
                    tau: Double): DataFrame =
    semanticServe(spark, dir, tau, TempDirs.create("graft_st_semantic"))

  /** Resolve the LIVE semantic store tables under `storeDir`:
    * (assignment path, lsh path) — or None when no COMPLETE store
    * exists. r13 layout: a `CURRENT` pointer file names a versioned
    * subdir (`v00001/…`) holding BOTH tables; a pointer naming a
    * half-written or deleted version is REJECTED (both tables must
    * exist — the r12 advice scenario where a crash left an assignment
    * beside a stale/deleted lsh store can no longer be trusted into a
    * drain). The pre-r13 flat layout (`storeDir/assignment` +
    * `storeDir/lsh`) is accepted read-only — also only when both
    * halves exist — and is superseded by the first versioned write. */
  private[graft] def semanticStorePaths(storeDir: String): Option[(String, String)] = {
    def complete(asg: String, lsh: String): Option[(String, String)] =
      if (new java.io.File(asg).isDirectory && new java.io.File(lsh).isDirectory)
        Some((asg, lsh))
      else None
    // versioned resolution through the shared seam (r18 — the r13
    // contract generalized to graft.sources.VersionedStore so batch
    // retraction write-backs get the same atomicity); the flat-layout
    // fallback is this store's own pre-r13 compatibility path
    graft.sources.VersionedStore
      .resolve(storeDir, Seq("assignment", "lsh"))
      .map { case Seq(asg, lsh) => (asg, lsh) }
      .orElse(complete(s"$storeDir/assignment", s"$storeDir/lsh"))
  }

  /** [[semanticServe]] with a CALLER-SUPPLIED store path — the
    * production entry point. `storeDir` holds `assignment` and `lsh`
    * parquet tables that survive the session and seed the next drain
    * (a later ingest grows the SAME store — the whole point of the
    * incremental pass). Durability (r13, closing the r12 advice gap —
    * the old two-rename swap could crash between renames and leave a
    * new assignment beside a stale lsh store): each drain writes BOTH
    * tables into a fresh versioned subdir, then promotes it with ONE
    * atomic pointer move (`CURRENT.tmp` → `CURRENT`,
    * StandardCopyOption.ATOMIC_MOVE). Every failure point leaves the
    * prior store fully live: a crash mid-write orphans an unreferenced
    * version dir (reclaimed by the next successful drain's cleanup),
    * and the bootstrap refuses any version missing either table. */
  def semanticServe(spark: SparkSession, dir: String, tau: Double,
                    storeDir: String): DataFrame = {
    val stream = FileStreamSource(s"$dir/embeddings.parquet").stream(spark)
    // bootstrap: the live store when present AND complete, else an
    // EMPTY store with the exact pipeline schemas (semanticStore over
    // a zero-row slice — the closure on no pairs is the empty
    // assignment)
    val store0 = semanticStorePaths(storeDir) match {
      case Some((asg, lsh)) =>
        graft.operators.Dedup.SemanticStore(
          // explicit read-back geometry (ADVICE r18): this serve
          // binding builds its store with the Dedup-family defaults,
          // so the restore names them rather than inheriting silently
          graft.operators.Dedup.embeddingLshStoreReadBack(
            spark.read.parquet(lsh), nTables = 6, planesPerTable = 4,
            dim = 64),
          spark.read.parquet(asg))
      case None => graft.operators.Dedup.semanticStore(
        spark.read.parquet(s"$dir/embeddings.parquet").limit(0), tau)
    }
    val store = semanticMaintainFromStream(stream, store0, tau)
    // ONE atomic publish of both tables (r18: the r13 versioned-dir +
    // pointer-promote contract now lives in the shared
    // graft.sources.VersionedStore seam — identical semantics: fresh
    // vNNNNN, orphan-skipping numbering, atomic CURRENT move,
    // one-generation reader grace, flat/staging-leftover reclaim)
    val paths = graft.sources.VersionedStore.write(storeDir,
      Seq("assignment" -> store.assignment, "lsh" -> store.lsh.bucketed))
    spark.read.parquet(paths.head)
      .select(col("vec_id"), col("cluster_id"),
        (col("vec_id") =!= col("cluster_id")).cast("int").as("is_dup"))
  }

  /** INTERLEAVED ingest + takedown maintenance of ONE semantic store —
    * the production erasure shape (r19, VERDICT r18 item #5,
    * promoting the r18 StreamsSpec case to a driver-graded row): an
    * ingest pipeline and a legal-erasure queue share the store on one
    * timeline — ingest b1 → takedown wave1 → ingest b2 (possibly
    * re-clustering around the hole) → takedown wave2 — and the final
    * assignment must equal batch
    * [[graft.operators.Dedup.semanticKeepers]] over the NET corpus
    * (everything ingested minus everything retracted), which is what
    * makes dd_semantic's SQL over the net modulo slice the oracle
    * verbatim. The final store is PUBLISHED through
    * [[graft.sources.VersionedStore]] (one atomic pointer move) and
    * the graded frame is served from the read-back table, so the
    * graded pass exercises stream ingest + interleaved retraction +
    * durable write-back end to end.
    *
    * Batch shape: b1 = even vec_ids, b2 = odd; wave1 = `% waveMod ==
    * wave1Rem` (an EVEN remainder, so wave1 only names ids b1 already
    * ingested), wave2 = `% waveMod == wave2Rem` over the full id
    * space. Net corpus = `vec_id % waveMod NOT IN (wave1Rem,
    * wave2Rem)`.
    *
    * The MemoryStream feed collects the embeddings table driver-side
    * — that collect is the TEST HARNESS's stream feed (bounded by the
    * graded corpus table, thousands of rows), not operator work; a
    * deployment binds the same two foreachBatch steps
    * ([[semanticBatchStep]] / [[graft.operators.Dedup.semanticRetract]])
    * to its real ingest topic and takedown queue, where no collect
    * exists. foreachBatch serializes each query's batches, and the
    * explicit processAllAvailable fences order the two queries'
    * turns, so the cross-store handoff is deterministic. */
  def semanticRetractServe(spark: SparkSession, dir: String, tau: Double,
                           waveMod: Long, wave1Rem: Long,
                           wave2Rem: Long): DataFrame = {
    require(wave1Rem % 2 == 0,
      "wave1 fires before b2's odd ids exist — its remainder must be even")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val rows = emb.as[(Long, Array[Float])].collect()
    val (b1, b2) = rows.partition(_._1 % 2 == 0)
    // AtomicReference, not plain vars (r20, ADVICE r19): the two
    // streaming queries' microbatch threads hand the store/corpus
    // across each other, and while the processAllAvailable fences
    // order the TURNS, cross-thread memory visibility of a plain var
    // would ride those fences' internal locking incidentally — the
    // atomics make the ingest→takedown handoff's happens-before
    // explicit and guaranteed.
    val store = new java.util.concurrent.atomic.AtomicReference(
      graft.operators.Dedup.semanticStore(emb.limit(0), tau))
    // the corpus table a deployment maintains beside the store
    // (semanticRetract's contract accepts pre- or post-takedown rows,
    // so appending ingests without pruning takedowns is legal)
    val corpus = new java.util.concurrent.atomic.AtomicReference(emb.limit(0))
    val ingest = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Float])]
    val takedown = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Long]
    val qI = ingest.toDF().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        corpus.set(corpus.get.union(batch.toDF()).localCheckpoint(true))
        store.set(semanticBatchStep(store.get, batch.toDF(), tau))
        ()
      }
      .start()
    val qT = takedown.toDF().toDF("vec_id").writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val r = graft.operators.Dedup.semanticRetract(store.get,
          batch.toDF(), corpus.get, tau)
        store.set(graft.operators.Dedup.SemanticStore(
          r.updatedStore.lsh.copy(
            bucketed = r.updatedStore.lsh.bucketed.localCheckpoint(true)),
          r.updatedStore.assignment.select("vec_id", "cluster_id")
            .localCheckpoint(true)))
        ()
      }
      .start()
    try {
      ingest.addData(b1.toSeq); qI.processAllAvailable()
      takedown.addData(b1.map(_._1).filter(_ % waveMod == wave1Rem).toSeq)
      qT.processAllAvailable()
      ingest.addData(b2.toSeq); qI.processAllAvailable()
      takedown.addData(rows.map(_._1).filter(_ % waveMod == wave2Rem).toSeq)
      qT.processAllAvailable()
    } finally { qI.stop(); qT.stop() }
    // durable publish + read-back serve: the graded frame comes off
    // the PUBLISHED store, not the in-memory one
    val paths = graft.sources.VersionedStore.write(
      TempDirs.create("graft_st_semantic_retract"),
      Seq("assignment" -> store.get.assignment,
        "lsh" -> store.get.lsh.bucketed))
    spark.read.parquet(paths.head)
      .select(col("vec_id"), col("cluster_id"),
        (col("vec_id") =!= col("cluster_id")).cast("int").as("is_dup"))
  }
}
