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

  test("a real PNG's pixels decode into the feature vector via javax.imageio") {
    import spark.implicits._
    // 4x2 image: top row black (luminance 0 -> bin 0), bottom row
    // white (luminance 255 -> bin 15) — written through the actual
    // PNG encoder, so featuresOf exercises the real decode path
    val img = new java.awt.image.BufferedImage(4, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 4).foreach { x =>
      img.setRGB(x, 0, 0x000000)
      img.setRGB(x, 1, 0xFFFFFF)
    }
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", baos))
    val png = baos.toByteArray
    val gray = new java.awt.image.BufferedImage(3, 3,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 3).foreach(x => (0 until 3).foreach(y =>
      gray.setRGB(x, y, 0x808080))) // luminance 128 -> bin 8
    val baos2 = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(gray, "png", baos2))
    val text = "plain ascii payload".getBytes("UTF-8")
    val t = Seq((1L, png), (2L, baos2.toByteArray), (3L, text))
      .toDF("doc_id", "payload")
    // the payload really is a PNG as far as sniffing is concerned
    assert(Multimodal.metadataOf(t).select("doc_id", "kind")
      .as[(Long, String)].collect().toMap.apply(1L) == "image/png")
    val feats = Multimodal.featuresOf(t)
      .as[(Long, Int, Seq[Float])].collect().map(r => r._1 -> r).toMap
    // half the pixels at luminance 0, half at 255
    val (_, n1, h1) = feats(1L)
    assert(n1 == png.length && h1(0) == 0.5f && h1(15) == 0.5f
      && h1.sum == 1.0f)
    // all nine pixels in the mid-gray bin
    val (_, _, h2) = feats(2L)
    assert(h2(8) == 1.0f && h2.sum == 1.0f)
    // non-image payloads still take the byte-histogram stand-in
    val (_, n3, h3) = feats(3L)
    assert((n3, h3.toSeq) ==
      (text.length,
        Multimodal.decodeBatchStub(Seq((3L, text))).head._3.toSeq))
  }

  test("a real WAV's samples decode into the feature vector via javax.sound") {
    import spark.implicits._
    import javax.sound.sampled._
    // 16-bit mono PCM, 64 frames: half the samples silent (amplitude
    // 0 -> bin 0), half at full negative swing (-32768 -> bin 15) —
    // written through the actual WAV encoder so featuresOf exercises
    // the real javax.sound decode path
    def wav(samples: Array[Short]): Array[Byte] = {
      val fmt = new AudioFormat(8000f, 16, 1, true, false)
      val pcm = java.nio.ByteBuffer.allocate(samples.length * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      samples.foreach(pcm.putShort)
      val in = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm.array()), fmt, samples.length)
      val baos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(in, AudioFileFormat.Type.WAVE, baos)
      baos.toByteArray
    }
    val halfLoud = wav(Array.fill(32)(0.toShort) ++
      Array.fill(32)(Short.MinValue))
    val quiet = wav(Array.fill(16)(100.toShort)) // tiny amplitude -> bin 0
    val t = Seq((1L, halfLoud), (2L, quiet)).toDF("doc_id", "payload")
    // sniffed as RIFF audio, decoded as real samples
    assert(Multimodal.metadataOf(t).select("doc_id", "kind")
      .as[(Long, String)].collect().toMap.apply(1L) == "audio/riff")
    val feats = Multimodal.featuresOf(t)
      .as[(Long, Int, Seq[Float])].collect().map(r => r._1 -> r).toMap
    val (_, n1, h1) = feats(1L)
    assert(n1 == halfLoud.length && h1(0) == 0.5f && h1(15) == 0.5f
      && h1.sum == 1.0f)
    val (_, _, h2) = feats(2L)
    assert(h2(0) == 1.0f && h2.sum == 1.0f)
    // 8-bit unsigned PCM (the WAV convention for 8-bit): midpoint 128
    // is silence -> bin 0; 0x00 is full negative swing -> bin 15
    val fmt8 = new AudioFormat(8000f, 8, 1, false, false)
    val pcm8 = Array.fill(16)(128.toByte) ++ Array.fill(16)(0.toByte)
    val in8 = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm8), fmt8, pcm8.length)
    val baos8 = new java.io.ByteArrayOutputStream()
    AudioSystem.write(in8, AudioFileFormat.Type.WAVE, baos8)
    val h8 = Multimodal.featuresOf(
      Seq((4L, baos8.toByteArray)).toDF("doc_id", "payload"))
      .as[(Long, Int, Seq[Float])].collect().head._3
    assert(h8(0) == 0.5f && h8(15) == 0.5f && h8.sum == 1.0f)
    // a mu-law WAV parses with 8-bit samples but its bytes are
    // COMPANDED — it must take the byte stand-in, not read as linear
    // PCM (mu-law silence would otherwise report full-scale loud)
    val ulawFmt = new AudioFormat(AudioFormat.Encoding.ULAW,
      8000f, 8, 1, 1, 8000f, false)
    val ulawIn = AudioSystem.getAudioInputStream(ulawFmt,
      new AudioInputStream(new java.io.ByteArrayInputStream(
        Array.fill(64)(0.toByte)), new AudioFormat(8000f, 16, 1, true, false),
        32))
    val baosU = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ulawIn, AudioFileFormat.Type.WAVE, baosU)
    val ulaw = baosU.toByteArray
    val hU = Multimodal.featuresOf(
      Seq((5L, ulaw)).toDF("doc_id", "payload"))
      .as[(Long, Int, Seq[Float])].collect().head._3
    assert(hU == Multimodal.decodeBatchStub(Seq((5L, ulaw))).head._3.toSeq)
    // and a RIFF header that is NOT decodable audio falls back to the
    // byte histogram instead of failing the job
    val fake = ("RIFF1234WAVEgarbage" + "x" * 40).getBytes("UTF-8")
    val fb = Multimodal.featuresOf(Seq((3L, fake)).toDF("doc_id", "payload"))
      .as[(Long, Int, Seq[Float])].collect().head
    assert(fb._3 == Multimodal.decodeBatchStub(Seq((3L, fake))).head._3.toSeq)
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
