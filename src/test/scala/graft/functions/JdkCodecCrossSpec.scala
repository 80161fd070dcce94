package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import java.io.ByteArrayOutputStream

/** Independent certification of the container parsers against files
  * written by the JDK's OWN encoders — not our hand-built fixtures:
  * javax.imageio produces real PNG/JPEG/GIF/BMP streams, javax.sound
  * produces real WAV and AIFF streams (both ship with the JDK; no
  * external codec libraries). If our byte-level readers disagree with
  * the JDK's writers about any planted parameter, one of them is wrong —
  * and it isn't the JDK. Pure JVM, no Spark session. */
class JdkCodecCrossSpec extends AnyFunSuite {

  private def jdkImage(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val out = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, out), s"JDK lacks a $fmt writer")
    out.toByteArray
  }

  test("ImageHeader agrees with ImageIO-written PNG/JPEG/GIF across a dim sweep") {
    val dims = Seq((1, 1), (5, 7), (255, 1), (256, 256), (640, 480), (1023, 17))
    for ((w, h) <- dims) {
      assert(ImageHeader.parse(jdkImage("png", w, h)) == ("image/png", w, h),
        s"png ${w}x$h")
      assert(ImageHeader.parse(jdkImage("jpg", w, h)) == ("image/jpeg", w, h),
        s"jpg ${w}x$h")
      assert(ImageHeader.parse(jdkImage("gif", w, h)) == ("image/gif", w, h),
        s"gif ${w}x$h")
    }
  }

  private def jdkAudio(tpe: javax.sound.sampled.AudioFileFormat.Type,
                       rate: Float, bits: Int, channels: Int,
                       frames: Int, bigEndian: Boolean,
                       signed: Boolean): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(rate, bits, channels, signed, bigEndian)
    val raw = new Array[Byte](frames * fmt.getFrameSize)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, frames.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, tpe, out)
    out.toByteArray
  }

  test("AudioHeader agrees with javax.sound-written WAV across a parameter sweep") {
    import javax.sound.sampled.AudioFileFormat.Type
    val cases = Seq((8000f, 8, 1, 1), (8000f, 16, 1, 37), (16000f, 16, 2, 100),
      (22050f, 8, 2, 5), (44100f, 16, 2, 441), (48000f, 16, 1, 480))
    for ((rate, bits, ch, frames) <- cases) {
      // WAV is little-endian by spec, 8-bit unsigned / 16-bit signed —
      // the JDK writer enforces both conventions
      val b = jdkAudio(Type.WAVE, rate, bits, ch, frames,
        bigEndian = false, signed = bits == 16)
      assert(AudioHeader.parse(b) ==
        ("audio/wav", ch, rate.toInt, bits, frames.toLong),
        s"wav rate=$rate bits=$bits ch=$ch frames=$frames")
    }
  }

  test("AudioHeader agrees with javax.sound-written AIFF (big-endian, 80-bit rate)") {
    import javax.sound.sampled.AudioFileFormat.Type
    val cases = Seq((8000f, 8, 1, 1), (11025f, 16, 1, 11), (22050f, 16, 2, 50),
      (44100f, 16, 2, 441), (96000f, 16, 1, 96))
    for ((rate, bits, ch, frames) <- cases) {
      // AIFF is big-endian signed PCM at every width
      val b = jdkAudio(Type.AIFF, rate, bits, ch, frames,
        bigEndian = true, signed = true)
      assert(AudioHeader.parse(b) ==
        ("audio/aiff", ch, rate.toInt, bits, frames.toLong),
        s"aiff rate=$rate bits=$bits ch=$ch frames=$frames")
    }
  }

  test("Utf8Stats agrees with the JDK's strict UTF-8 decoder on accept/reject") {
    // CharsetDecoder with REPORT is the JDK's strict RFC 3629 authority:
    // a byte array decodes cleanly iff our scan counts zero invalid bytes
    val rnd = new scala.util.Random(0xD0C5)
    var rejects = 0
    (0 until 4000).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(65))
      rnd.nextBytes(b)
      val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      val jdkValid =
        try { dec.decode(java.nio.ByteBuffer.wrap(b)); true }
        catch { case _: java.nio.charset.CharacterCodingException => false }
      val r = Utf8Stats.compute(b)
      assert(r.getBoolean(0) == jdkValid,
        s"validity disagreement on ${b.map("%02X".format(_)).mkString}")
      if (!jdkValid) rejects += 1
    }
    assert(rejects > 100, s"harness too weak: only $rejects invalid samples")
  }
}
