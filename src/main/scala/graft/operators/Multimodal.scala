package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** F-family: multimodal payload plumbing.
  *
  * Media (image/audio/video) rides through the engine as an opaque
  * `binary` column plus typed metadata. Metadata stays in normal
  * parquet columns (pruned, pushed down); the payload is only touched
  * by three shapes of operator:
  *   - per-row column math (length, hash, magic sniff) — codegen'd;
  *   - frame sampling — positional byte slices, exploded;
  *   - batched decode (`mapPartitions`) — partition-local batching so
  *     a real decoder (libjpeg, ffmpeg, …) amortizes setup per batch,
  *     never per row. The decoder here is a deterministic STUB (this
  *     container has no media libs); the batching, schema and
  *     partitioning are the real, tested plumbing.
  *
  * The driver's corpus has no binary table, so `withPayload` derives
  * the payload from `documents.text` (UTF-8 bytes) — opaque bytes as
  * far as every operator below is concerned.
  */
object Multimodal {

  /** Attach the opaque payload column. */
  def withPayload(docs: DataFrame): DataFrame =
    docs.withColumn("payload", col("text").cast("binary"))

  /** Magic-byte content sniffing over the first payload bytes —
    * real container formats first, then a printable-ASCII probe. */
  def sniffKind(payload: Column): Column =
    when(substring(payload, 1, 8) ===
        lit(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)),
        "image/png")
      .when(substring(payload, 1, 3) === lit(Array(0xFF, 0xD8, 0xFF).map(_.toByte)),
        "image/jpeg")
      .when(substring(payload, 1, 4) === lit("RIFF".getBytes), "audio/riff")
      .when(substring(payload, 1, 4) === lit("%PDF".getBytes), "application/pdf")
      .when(payload.cast("string").rlike("^[\\x09\\x0a\\x0d\\x20-\\x7e]*$"),
        "text/plain")
      .otherwise("application/octet-stream")

  /** Typed metadata for an opaque payload: byte length, content hash,
    * sniffed kind. Pure column ops — stays in whole-stage codegen.
    * `metadataOf` takes any (doc_id, payload binary) frame — a real
    * media table; `metadata` is the documents-table adapter. */
  def metadataOf(payloads: DataFrame): DataFrame =
    payloads.select(col("doc_id"),
      octet_length(col("payload")).as("payload_len"),
      md5(col("payload")).as("payload_md5"),
      sniffKind(col("payload")).as("kind"))

  def metadata(docs: DataFrame): DataFrame = metadataOf(withPayload(docs))

  /** Frame sampling: full `frameLen`-byte windows every `stride`
    * bytes — the shape of video frame extraction / audio windowing.
    * One explode, no shuffle; frame count bounded by payload length. */
  def frames(docs: DataFrame, frameLen: Int = 64, stride: Int = 48): DataFrame =
    framesOf(withPayload(docs), frameLen, stride)

  def framesOf(payloads: DataFrame, frameLen: Int = 64,
               stride: Int = 48): DataFrame = {
    val len = octet_length(col("payload"))
    val n = when(len >= frameLen,
      expr(s"CAST((octet_length(payload) - $frameLen) DIV $stride AS BIGINT) + 1"))
      .otherwise(0L)
    payloads
      .select(col("doc_id"), col("payload"),
        explode(when(n > 0, sequence(lit(0L), n - 1L))
          .otherwise(array().cast("array<bigint>"))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        expr(s"substring(payload, CAST(frame_idx * $stride + 1 AS INT), $frameLen)")
          .as("frame"))
      .select(col("doc_id"), col("frame_idx"),
        octet_length(col("frame")).as("frame_len"),
        md5(col("frame")).as("frame_md5"))
  }

  /** Per-kind payload census with dedup accounting: payload count,
    * DISTINCT-content count (payload md5 — the media-corpus dedup
    * key), and byte volume per sniffed kind. The planning report a
    * media dedup pass starts from: how much of each modality is
    * duplicated bytes. One map-side-combined aggregation on a
    * kind-bounded key; the distinct count is per-kind-partitioned, so
    * no single task sees the whole corpus. */
  def kindCensus(docs: DataFrame): DataFrame = kindCensusOf(withPayload(docs))

  def kindCensusOf(payloads: DataFrame): DataFrame =
    payloads.select(sniffKind(col("payload")).as("kind"),
        md5(col("payload")).as("pm"),
        octet_length(col("payload")).cast("long").as("len"))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_payloads"),
        countDistinct(col("pm")).as("n_unique"),
        sum(col("len")).as("total_bytes"))

  /** STUB decoder: a real implementation hands each batch of payloads
    * to a native decoder (libjpeg/ffmpeg/…) and returns one feature
    * row per input. This fake — a 16-bin byte histogram, L1-normalized
    * — is deterministic so the plumbing is testable bit-for-bit
    * without media libraries. */
  def decodeBatchStub(batch: Seq[(Long, Array[Byte])]): Seq[(Long, Int, Array[Float])] =
    batch.map { case (id, bytes) =>
      // exact Int counts (a Float accumulator stops incrementing at
      // 2^24 — ~268 MB payloads would silently plateau); rounding
      // happens once, at the final float conversion, exactly like an
      // oracle's count(*) cast to FLOAT.
      val hist = new Array[Int](16)
      bytes.foreach(b => hist((b & 0xFF) % 16) += 1)
      val n = math.max(bytes.length, 1).toFloat
      (id, bytes.length, hist.map(_.toFloat / n))
    }

  /** Batched per-partition feature extraction: each partition streams
    * through in `batchSize` groups (bounded memory), each batch hits
    * the decoder exactly once. Results carry no partition dependence,
    * so any upstream repartitioning (e.g. by payload size, to even
    * out decode cost) is safe. */
  def features(docs: DataFrame, batchSize: Int = 64): DataFrame =
    featuresOf(withPayload(docs), batchSize)

  def featuresOf(payloads: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(b => decodeBatchStub(b.toSeq)))
      .toDF("doc_id", "n_bytes", "features")
  }
}
