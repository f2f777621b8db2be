package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Multimodal
import graft.sources.Tables

/** F-family bindings. The oracle works on `text` directly: the payload
  * is its UTF-8 encoding and the corpus is pure ASCII (verified), so
  * byte offsets == char offsets and DuckDB's VARCHAR md5/substr see
  * the identical bytes Spark's BINARY ops see. The PNG/JPEG magic
  * branches of the sniffer cannot fire on ASCII input, so the oracle
  * CASE carries only the branches reachable in this corpus — same
  * output, every row. mm_features is spec-checked (mapPartitions
  * decode stub has no SQL equivalent).
  */
object MultimodalRegistry {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_metadata" -> ((s, d) => Multimodal.metadata(Tables.documents(s, d))),
    "mm_frames" -> ((s, d) => Multimodal.frames(Tables.documents(s, d))),
    "mm_features" -> ((s, d) => Multimodal.features(Tables.documents(s, d))),
  )

  def oracleSql: Map[String, String] = Map(
    "mm_metadata" ->
      """SELECT doc_id,
        |  length(text) AS payload_len,
        |  md5(text) AS payload_md5,
        |  CASE WHEN substr(text, 1, 4) = 'RIFF' THEN 'audio/riff'
        |       WHEN substr(text, 1, 4) = '%PDF' THEN 'application/pdf'
        |       WHEN regexp_matches(text, '^[\x09\x0a\x0d\x20-\x7e]*$')
        |         THEN 'text/plain'
        |       ELSE 'application/octet-stream' END AS kind
        |FROM documents""".stripMargin,
    "mm_frames" ->
      """WITH n AS (
        |  SELECT doc_id, text,
        |    CASE WHEN length(text) >= 64
        |         THEN (length(text) - 64) // 48 + 1 ELSE 0 END AS nf
        |  FROM documents
        |)
        |SELECT doc_id, unnest(range(nf)) AS frame_idx,
        |  length(substr(text, CAST(unnest(range(nf)) * 48 + 1 AS INTEGER), 64)) AS frame_len,
        |  md5(substr(text, CAST(unnest(range(nf)) * 48 + 1 AS INTEGER), 64)) AS frame_md5
        |FROM n WHERE nf > 0""".stripMargin,
  )
}
