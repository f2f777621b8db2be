package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{FileStreamSource, KafkaShapedSource, KafkaStreamSource, StreamSource, Streams}

/** The G-family over the Kafka-shaped source: keyed JSON records,
  * hash-partitioned with per-partition monotonic offsets, replayable
  * from retained offsets. st_wordcount and st_sessionize_closed must
  * produce results identical to the file-staging source — the operator
  * plans are source-agnostic, only the source node differs. */
class KafkaShapedSourceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.get
  val d = "/root/testdata/sf0.001"
  private val M = 60L * 1000000L

  test("word count over the Kafka-shaped source == over the file source") {
    implicit val s: SparkSession = spark
    val docSchema = StructType.fromDDL("doc_id BIGINT, text STRING, source STRING")
    val src = new KafkaShapedSource("documents", docSchema)
    val recs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id").cast("string"),
        to_json(struct(col("doc_id"), col("text"), col("source"))))
      .collect().map(r => (r.getString(0), r.getString(1), 0L)).toSeq
    src.send(recs)
    def run(name: String): Set[(String, Long)] = {
      val q = Streams.wordCountFromStream(src.source.stream(spark))
        .writeStream.outputMode("complete").format("memory")
        .queryName(name).start()
      try q.processAllAvailable() finally q.stop()
      import spark.implicits._
      spark.table(name).as[(String, Long)].collect().toSet
    }
    val viaKafka = run("kss_wc")
    import spark.implicits._
    val viaFile = Streams.wordCount(spark, d).as[(String, Long)].collect().toSet
    assert(viaKafka == viaFile && viaKafka.nonEmpty)
    // replayable offsets: a NEW query over the same source re-reads
    // from offset 0 (Kafka's seek-to-beginning) and gets the same answer
    assert(run("kss_wc_replay") == viaFile)
  }

  test("closed sessions over the Kafka-shaped source match the direct stream") {
    implicit val s: SparkSession = spark
    import spark.implicits._
    val B = 60 * M
    val evSchema = StructType.fromDDL("user_id BIGINT, event_id BIGINT, ts_us BIGINT")
    val src = new KafkaShapedSource("events", evSchema, numPartitions = 3)
    def rec(u: Long, e: Long, ts: Long) =
      (u.toString, s"""{"user_id":$u,"event_id":$e,"ts_us":$ts}""", ts)
    val events = src.source.stream(spark)
      .select(col("user_id"), col("event_id"),
        timestamp_micros(col("ts_us")).as("ts"))
    val sessions = Streams.sessionizeClosedFromStream(
      events, gapMinutes = 30, lateness = "15 minutes")
    val q = sessions.toDF().writeStream
      .outputMode("append").format("memory").queryName("kss_sess").start()
    try {
      // the EventTimeSessionSpec scenario, delivered as keyed records
      src.send(Seq(rec(1L, 2L, B + 10 * M), rec(1L, 1L, B)))
      q.processAllAvailable()
      src.send(Seq(rec(1L, 3L, B + 12 * M), rec(2L, 10L, B + 120 * M)))
      q.processAllAvailable()
      src.send(Seq(rec(2L, 11L, B + 121 * M)))
      q.processAllAvailable()
      val closed = spark.table("kss_sess")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(closed == Set((1L, B, B + 12 * M, 3L)))
    } finally q.stop()
  }

  test("records are keyed to stable partitions with monotonic per-partition offsets") {
    implicit val s: SparkSession = spark
    val schema = StructType.fromDDL("x BIGINT")
    val src = new KafkaShapedSource("t", schema, numPartitions = 4)
    val placed = src.send((0 until 20).map(i => (s"k${i % 5}", s"""{"x":$i}""", 0L)))
    // same key → same partition (Kafka's default-partitioner contract)
    val byKey = (0 until 20).map(i => s"k${i % 5}").zip(placed.map(_._1))
    byKey.groupBy(_._1).values.foreach(ps => assert(ps.map(_._2).distinct.size == 1))
    // offsets are 0,1,2,... within each partition, in send order
    placed.groupBy(_._1).values.foreach { offs =>
      assert(offs.map(_._2) == offs.indices.map(_.toLong))
    }
    assert(src.endOffsets.sum == 20)
  }

  test("source factory selects the real Kafka binding only when configured") {
    val schema = new StructType().add("doc_id", "long").add("text", "string")
    val file = StreamSource.forParquet(s"$d/documents.parquet", "docs", schema,
      env = Map.empty)
    assert(file == FileStreamSource(s"$d/documents.parquet"))
    val kafka = StreamSource.forParquet(s"$d/documents.parquet", "docs", schema,
      env = Map("SPARK_GRAFT_KAFKA_BROKERS" -> "broker-1:9092,broker-2:9092"))
    assert(kafka ==
      KafkaStreamSource("broker-1:9092,broker-2:9092", "docs", schema))
    // stream() needs the kafka connector + a live broker — absent in
    // this sandbox, so the shaped-feed specs above are the CI proof of
    // the consumer contract; here we only prove selection + wiring.
  }
}
