package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** The F-family over a TRUE binary column source (the driver corpus is
  * text-derived ASCII, which can never hit the media magic-byte
  * branches): write a parquet table with real PNG/JPEG/RIFF headers
  * and arbitrary bytes, round-trip it, and run metadata / frames /
  * features on the payload column directly. */
class BinaryPayloadSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.get

  private def binaryTable(): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val png = Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0D, 0x0A, 0x1A, 0x0A)
      .map(_.toByte) ++ Array.tabulate(200)(i => (i * 7 % 251).toByte)
    val jpeg = Array(0xFF, 0xD8, 0xFF, 0xE0).map(_.toByte) ++
      Array.tabulate(100)(i => (i * 13 % 256).toByte)
    val riff = "RIFF".getBytes ++ Array.tabulate(50)(i => (i * 3).toByte)
    val text = "plain ascii payload".getBytes("UTF-8")
    val dir = Files.createTempDirectory("graft_binary").toString + "/media.parquet"
    Seq((1L, png), (2L, jpeg), (3L, riff), (4L, text))
      .toDF("doc_id", "payload")
      .write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir) // genuine binary parquet column round-trip
  }

  test("magic-byte sniffing classifies real media headers") {
    import spark.implicits._
    val kinds = Multimodal.metadataOf(binaryTable())
      .select("doc_id", "kind").as[(Long, String)].collect().toMap
    assert(kinds == Map(1L -> "image/png", 2L -> "image/jpeg",
      3L -> "audio/riff", 4L -> "text/plain"))
  }

  test("frames and features run on binary payloads with exact lengths") {
    import spark.implicits._
    val t = binaryTable()
    val frames = Multimodal.framesOf(t, frameLen = 64, stride = 48)
      .select("doc_id", "frame_len").as[(Long, Int)].collect()
    // png payload is 208 bytes -> frames at offsets 0,48,96,144 (full 64B only)
    assert(frames.count(_._1 == 1L) == 4 && frames.forall(_._2 == 64))
    assert(!frames.exists(_._1 == 3L)) // 54-byte riff: shorter than one frame
    val feats = Multimodal.featuresOf(t).as[(Long, Int, Seq[Float])].collect()
    assert(feats.length == 4)
    feats.foreach { case (_, n, hist) =>
      assert(hist.length == 16)
      // L1-normalized histogram sums to ~1 for non-empty payloads
      assert(n > 0 && math.abs(hist.map(_.toDouble).sum - 1.0) < 1e-5)
    }
    assert(feats.find(_._1 == 2L).get._2 == 104) // jpeg byte length exact
  }
}
