package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Fuzz safety for the three byte-level container parsers: on ARBITRARY
  * bytes — pure random, every truncation of a valid file, every
  * single-byte mutation of a valid file — the parser must either return
  * null or a well-formed result, and NEVER throw. At 100 TB a corpus
  * contains every corruption the wild can produce; an
  * ArrayIndexOutOfBounds in a codegen'd projection kills the stage, so
  * total-function behavior is a scale requirement, not a nicety. Pure JVM
  * (no Spark session): runs in milliseconds, seeds fixed. */
class MediaFuzzSpec extends AnyFunSuite {

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  // one valid exemplar per recognized container family
  private val valid: Seq[(String, Array[Byte])] = Seq(
    "png" -> hex(
      "89504E470D0A1A0A 0000000D 49484452 00000001 00000001 08 06 00 00 00 1F15C489" +
        "0000000A 49444154 789C63000100000500010D0A2DB4 0000000049454E44AE426082"),
    "jpeg" -> hex(
      "FFD8 FFE0 0010 4A46494600 0101 00 0001 0001 00 00" +
        "FFC0 0011 08 0007 0005 03 011100 021101 031101 FFD9"),
    "gif" -> hex("474946383961 0A00 1400 F70000"),
    "wav" -> hex(
      "52494646 48000000 57415645" +
        "4A554E4B 04000000 DEADBEEF" +
        "666D7420 10000000 0100 0200 44AC0000 10B10200 0400 1000" +
        "4C495354 03000000 414243 00" +
        "64617461 0C000000 000000000000000000000000"),
    "aiff" -> hex(
      "464F524D 0000003C 41494646" +
        "414E4E4F 00000004 74657374" +
        "434F4D4D 00000012 0001 00000005 0010 400EAC44000000000000" +
        "53534E44 0000000A 00000000 00000000 0000"),
    "mp4" -> hex(
      "00000010 66747970 69736F6D 00000000" +
        "0000000C 66726565 DEADBEEF" +
        "00000088 6D6F6F76" +
        "00000078 6D766864 01000000 0000000000000000 0000000000000000" +
        "00015F90 0000000000015F90" + "00" * 80 +
        "00000008 7472616B"))

  private def allParsers(b: Array[Byte]): Unit = {
    ImageHeader.parse(b)
    AudioHeader.parse(b)
    VideoHeader.parse(b)
  }

  test("pure random bytes never throw (10k arrays, lengths 0-512, fixed seeds)") {
    val rnd = new scala.util.Random(0xC0FFEE)
    (0 until 10000).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(513))
      rnd.nextBytes(b)
      allParsers(b)
    }
  }

  test("random bytes behind each valid magic never throw (stress past the signature check)") {
    val magics = Seq(
      hex("89504E470D0A1A0A"), hex("FFD8FF"), hex("474946383961"),
      "RIFF????WAVE".getBytes, "FORM????AIFF".getBytes,
      hex("00000010 66747970"))
    val rnd = new scala.util.Random(0xBEEF)
    magics.foreach { m =>
      (0 until 2000).foreach { _ =>
        val tail = new Array[Byte](rnd.nextInt(257))
        rnd.nextBytes(tail)
        allParsers(m ++ tail)
      }
    }
  }

  test("every truncation of every valid file parses to null or a result — never throws") {
    valid.foreach { case (name, b) =>
      (0 to b.length).foreach { n =>
        allParsers(b.take(n))
      }
      // and the full file must still parse (the sweep ends at a valid input)
      assert(ImageHeader.parse(b) != null || AudioHeader.parse(b) != null ||
        VideoHeader.parse(b) != null, s"$name no longer parses whole")
    }
  }

  test("every single-byte mutation of every valid file never throws") {
    val tweaks = Seq(0x00, 0xFF, 0x01, 0x80).map(_.toByte)
    valid.foreach { case (_, b) =>
      b.indices.foreach { i =>
        tweaks.foreach { t =>
          val m = b.clone(); m(i) = t
          allParsers(m)
        }
      }
    }
  }

  test("adversarial size fields never throw: u32-max, size<header, largesize overflow") {
    // RIFF chunk declaring u32-max size
    allParsers(hex("52494646 48000000 57415645 666D7420 FFFFFFFF 0100"))
    // AIFF chunk declaring u32-max size
    allParsers(hex("464F524D 0000003C 41494646 434F4D4D FFFFFFFF 0001"))
    // mp4 box size < 8 (desync), size==1 with 64-bit largesize overflowing Int
    allParsers(hex("00000010 66747970 69736F6D 00000000 00000002 6D6F6F76"))
    allParsers(hex("00000010 66747970 69736F6D 00000000" +
      "00000001 6D6F6F76 7FFFFFFFFFFFFFFF 0000006C 6D766864"))
    // JPEG segment with length 0 (would loop forever if not guarded)
    allParsers(hex("FFD8 FFE0 0000 FFC0"))
    // near-Int-max sizes: Int-space `off += 8 + size` would wrap NEGATIVE
    // and index out of bounds — the walk must advance in Long space
    allParsers(hex("52494646 48000000 57415645 4A554E4B 7FFFFFEF 00"))
    allParsers(hex("464F524D 0000003C 41494646 414E4E4F 7FFFFFEF 00"))
    allParsers(hex("00000010 66747970 69736F6D 00000000 7FFFFFEF 66726565"))
    allParsers(hex("00000010 66747970 69736F6D 00000000" +
      "00000018 6D6F6F76 7FFFFFEF 6D766864 00000000 00000000"))
  }
}
