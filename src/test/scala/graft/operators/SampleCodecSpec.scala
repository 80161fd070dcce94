package graft.operators

import graft.{Engine, SparkTestBase}
import org.apache.spark.sql.functions._
import java.io.ByteArrayOutputStream

/** The real PCM sample decode (JdkAudioCodec): waveform statistics agree
  * with hand-computed values on JDK-written WAV (8-bit unsigned LE) and
  * AIFF (16-bit signed BE) square waves, and the qe5g tone-corpus
  * round-trip matches the planted arithmetic exactly. */
class SampleCodecSpec extends SparkTestBase {

  private def jdkPcm(tpe: javax.sound.sampled.AudioFileFormat.Type,
                     raw: Array[Byte], rate: Float, bits: Int, ch: Int,
                     signed: Boolean, bigEndian: Boolean): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(rate, bits, ch, signed, bigEndian)
    val frames = raw.length / fmt.getFrameSize
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, frames.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, tpe, out)
    out.toByteArray
  }

  test("8-bit unsigned WAV square wave: exact rms, zero crossings, peak") {
    import javax.sound.sampled.AudioFileFormat.Type
    val a = 40
    val n = 12
    val raw = Array.tabulate(n)(i => (128 + (if (i % 2 == 0) a else -a)).toByte)
    val b = jdkPcm(Type.WAVE, raw, 8000f, 8, 1, signed = false, bigEndian = false)
    assert(Multimodal.JdkAudioCodec.features(b) == (a.toDouble, (n - 1).toLong, a, n.toLong))
  }

  test("16-bit signed big-endian AIFF square wave: sign-extension and BE order") {
    import javax.sound.sampled.AudioFileFormat.Type
    val a = 1234
    val n = 10
    val raw = new Array[Byte](n * 2)
    (0 until n).foreach { i =>
      val v = if (i % 2 == 0) a else -a
      raw(2 * i) = ((v >> 8) & 0xFF).toByte; raw(2 * i + 1) = (v & 0xFF).toByte
    }
    val b = jdkPcm(Type.AIFF, raw, 44100f, 16, 1, signed = true, bigEndian = true)
    assert(Multimodal.JdkAudioCodec.features(b) == (a.toDouble, (n - 1).toLong, a, n.toLong))
  }

  test("stereo frames: statistics follow channel 0, frame walk honors frame size") {
    import javax.sound.sampled.AudioFileFormat.Type
    val n = 8
    // channel 0 alternates +/-50, channel 1 is silent
    val raw = new Array[Byte](n * 2)
    (0 until n).foreach { i =>
      raw(2 * i) = (128 + (if (i % 2 == 0) 50 else -50)).toByte
      raw(2 * i + 1) = 128.toByte
    }
    val b = jdkPcm(Type.WAVE, raw, 8000f, 8, 2, signed = false, bigEndian = false)
    assert(Multimodal.JdkAudioCodec.features(b) == (50.0, (n - 1).toLong, 50, n.toLong))
  }

  test("undecodable payloads return null / drop out of audioFeatures") {
    import spark.implicits._
    assert(Multimodal.JdkAudioCodec.features("not audio".getBytes) == null)
    val media = Seq((1L, "still not audio".getBytes)).toDF("doc_id", "payload")
    assert(Multimodal.audioFeatures(media).count() == 0)
  }

  test("tone corpus round-trip: decoded statistics equal the planted arithmetic") {
    // the qe5g property asserted directly at sf0.001
    val docs = Engine.Tables(spark, Sf0001).documents
    val got = Multimodal.audioFeatures(Multimodal.syntheticToneCorpus(docs))
    val bad = got.filter(
      col("rms") =!= (col("doc_id") % 100 + 1).cast("double") ||
      col("zero_crossings") =!= (col("doc_id") % 25 + 1) * 2 - 1 ||
      col("peak") =!= (col("doc_id") % 100 + 1).cast("int") ||
      col("n_frames") =!= (col("doc_id") % 25 + 1) * 2)
    assert(got.count() == docs.count() && bad.count() == 0)
  }
}
