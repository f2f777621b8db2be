package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  def docs = Seq(
    (1L, "a" * 200, "s"),
    (2L, "short", "s"),
    (3L, "%PDF-1.4 fake pdf header content", "s"),
  ).toDF("doc_id", "text", "source")

  test("metadata sniffs kind and hashes payload bytes") {
    val m = Multimodal.metadata(docs).as[(Long, Int, String, String)]
      .collect().map(r => r._1 -> r).toMap
    assert(m(1L)._2 == 200 && m(1L)._4 == "text/plain")
    assert(m(3L)._4 == "application/pdf")
  }

  test("frame sampling: full windows only, correct stride arithmetic") {
    val f = Multimodal.frames(docs, frameLen = 64, stride = 48)
      .as[(Long, Long, Int, String)].collect()
    val byDoc = f.groupBy(_._1)
    assert(byDoc(1L).length == (200 - 64) / 48 + 1) // = 3
    assert(byDoc(1L).forall(_._3 == 64)) // every frame full length
    assert(!byDoc.contains(2L)) // shorter than one frame → no rows
    // all frames of doc 1 are identical bytes → identical hashes
    assert(byDoc(1L).map(_._4).distinct.length == 1)
  }

  test("kind census counts payloads, distinct content, and bytes per kind") {
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A, 1, 2)
    val txt = "hello world".getBytes("UTF-8")
    val payloads = Seq(
      (1L, png), (2L, png),                                // duplicated image
      (3L, txt), (4L, txt), (5L, "other".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val r = Multimodal.kindCensusOf(payloads)
      .as[(String, Long, Long, Long)].collect().map(x => x._1 -> x).toMap
    assert(r.size == 2)
    assert(r("image/png") == (("image/png", 2L, 1L, 20L)))
    assert(r("text/plain") == (("text/plain", 3L, 2L, 27L)))
  }

  test("payload dedup elects the min-id keeper per byte-identical payload") {
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A, 1, 2)
    val txt = "hello world".getBytes("UTF-8")
    val payloads = Seq(
      (5L, png), (2L, png),                                // duplicated image
      (3L, txt), (4L, txt), (1L, "other".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val r = Multimodal.payloadDedupOf(payloads)
      .as[(Long, String, Long, Int)].collect().map(x => x._1 -> x).toMap
    assert(r.size == 5)
    assert(r(2L) == ((2L, "image/png", 2L, 0)))  // min id keeps
    assert(r(5L) == ((5L, "image/png", 2L, 1)))  // larger id is the dup
    assert(r(3L)._4 == 0 && r(4L) == ((4L, "text/plain", 3L, 1)))
    assert(r(1L)._4 == 0 && r(1L)._3 == 1L)      // unique content keeps itself
    // on the documents adapter the payload is the text's UTF-8 bytes, so
    // the keeper map must equal exact TEXT dedup's on the same corpus.
    // The corpus needs an actual duplicate (doc 4 repeats doc 2's text)
    // — on all-distinct rows every doc is its own keeper and the check
    // couldn't see keeper-election divergence between the operators.
    val dupDocs = docs.union(Seq((4L, "short", "s"))
      .toDF("doc_id", "text", "source"))
    val viaPayload = Multimodal.payloadDedup(dupDocs)
      .select("doc_id", "keep_id", "is_dup")
      .as[(Long, Long, Int)].collect().sortBy(_._1)
    val viaText = graft.operators.Dedup.exact(dupDocs)
      .as[(Long, Long, Int)].collect().sortBy(_._1)
    assert(viaPayload.sameElements(viaText))
    // and the duplicate really is non-trivial: doc 4 maps to keeper 2
    assert(viaPayload.find(_._1 == 4L).get == ((4L, 2L, 1)))
  }

  test("payload delta: sticky keepers, append-only ingest == full rescan") {
    // store corpus: docs 1-3; append-only delta: docs 4-6, where doc 4
    // repeats doc 2's bytes (must inherit the STORED keeper), docs 5+6
    // duplicate each other (new digest: delta-min election), and the
    // kind column rides the assignment
    val delta = Seq(
      (4L, "short", "s"), (5L, "%PDF-1.4 brand new", "s"),
      (6L, "%PDF-1.4 brand new", "s")).toDF("doc_id", "text", "source")
    val store = Multimodal.payloadKeeperStore(docs)
    val r = Multimodal.payloadDedupDelta(store, delta)
    val asg = r.assignment.as[(Long, String, Long, Int)].collect()
      .map(x => x._1 -> x).toMap
    assert(asg.size == 3)
    assert(asg(4L) == ((4L, "text/plain", 2L, 1)))        // sticky store keeper
    assert(asg(5L) == ((5L, "application/pdf", 5L, 0)))   // delta-min keeps
    assert(asg(6L) == ((6L, "application/pdf", 5L, 1)))
    // append-only ingest reproduces the full rescan exactly
    val full = Multimodal.payloadDedup(docs.union(delta))
      .filter(org.apache.spark.sql.functions.col("doc_id") >= 4L)
      .select("doc_id", "kind", "keep_id", "is_dup")
      .as[(Long, String, Long, Int)].collect().map(x => x._1 -> x).toMap
    assert(asg == full)
    // the updated store has exactly one row per distinct digest and
    // feeds the next ingest: a re-ingest of doc 6 is a no-op dup
    assert(r.updatedStore.count() == 4) // 3 store digests + 1 new
    val again = Multimodal.payloadDedupDelta(r.updatedStore,
      Seq((6L, "%PDF-1.4 brand new", "s")).toDF("doc_id", "text", "source"))
    assert(again.assignment.as[(Long, String, Long, Int)].collect()
      .toSeq == Seq((6L, "application/pdf", 5L, 1)))
    assert(again.updatedStore.count() == 4)
  }

  test("batched decode is batch-size- and partition-independent") {
    val a = Multimodal.features(docs.repartition(1), batchSize = 2)
      .as[(Long, Int, Array[Float])].collect().sortBy(_._1)
    val b = Multimodal.features(docs.repartition(3), batchSize = 64)
      .as[(Long, Int, Array[Float])].collect().sortBy(_._1)
    assert(a.length == 3 && a.map(_._1).sameElements(b.map(_._1)))
    a.zip(b).foreach { case (x, y) =>
      assert(x._2 == y._2 && x._3.sameElements(y._3))
    }
    assert(a.forall(_._3.length == 16)) // fixed-length feature vector
    // L1 normalization: histogram sums to ~1
    assert(math.abs(a.head._3.sum - 1f) < 1e-5)
  }

  // The F-family oracles slice `documents.text` with CHARACTER-indexed
  // substr()/length()/ord() while the Spark side frames UTF-8 BYTES —
  // equivalent only while the corpus is pure ASCII (one byte per char).
  // This gate makes that assumption fail LOUDLY on a driver data regen
  // that introduces any multi-byte character, instead of surfacing as
  // an unexplained mm_* hash mismatch (the failure mode the round-10
  // parquet-encoding regen showed is possible). octet_length == char
  // length under UTF-8 ⇔ every char is one byte ⇔ ASCII.
  test("GATE: documents.text is pure ASCII (F-family byte==char oracle assumption)") {
    import org.apache.spark.sql.functions.{col, length, octet_length}
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val dir = s"/root/testdata/$sf/documents.parquet"
      if (new java.io.File(dir).exists()) {
        val nonAscii = spark.read.parquet(dir)
          .filter(col("text").isNotNull &&
            octet_length(col("text")) =!= length(col("text"))).count()
        assert(nonAscii == 0L,
          s"$sf documents.text has $nonAscii non-ASCII rows: the " +
            "MultimodalRegistry oracles' char-indexed substr/length/ord " +
            "no longer equal the Spark side's byte framing — rewrite " +
            "those oracles over encode(text) BLOB byte offsets")
      }
    }
  }
}
