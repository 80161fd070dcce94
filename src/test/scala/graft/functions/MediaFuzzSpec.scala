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
    // 2-frame animated GIF with GCEs and local color tables (r15: the
    // GifFrames block walk rides the truncation/byte-flip sweeps)
    "gifanim" -> hex("474946383961" + "0200 0100 00 00 00" +
      ("21F9" + "04 00 1900 00" + "00" +
        "2C" + "0000 0000 0200 0100" + "80" + "000000 FFFFFF" + "02" + "02 4C01" + "00") * 2 +
      "3B"),
    // BITMAPINFOHEADER BMP, 7x9 (r14: the BMP triage branch)
    "bmp" -> hex("424D" + "00" * 8 + "36000000" + "28000000 07000000 09000000" +
      "0100 1800" + "00" * 24),
    // minimal AVI: LIST('hdrl' avih[56: 40000 us/frame, 2 frames,
    // 1 stream]) + empty movi (r14: the AVI triage branch)
    "avi" -> hex("52494646 5C000000 41564920" +
      "4C495354 44000000 6864726C" +
      "61766968 38000000" + "409C0000" + "00000000" * 3 + "02000000" +
      "00000000" + "01000000" + "00000000" * 7 +
      "4C495354 04000000 6D6F7669"),
    "wav" -> hex(
      "52494646 48000000 57415645" +
        "4A554E4B 04000000 DEADBEEF" +
        "666D7420 10000000 0100 0200 44AC0000 10B10200 0400 1000" +
        "4C495354 03000000 414243 00" +
        "64617461 0C000000 000000000000000000000000"),
    // G.711 µ-law WAV (format tag 7, 18-byte fmt + fact — r16: the
    // companded branch of AudioHeader + the JDK-codec decode path ride
    // the truncation/byte-flip sweeps)
    "wavulaw" -> hex(
      "52494646 36000000 57415645" +
        "666D7420 12000000 0700 0100 401F0000 401F0000 0100 0800 0000" +
        "66616374 04000000 04000000" +
        "64617461 04000000 FF7F0380"),
    // IMA ADPCM WAV (format tag 17, 20-byte fmt with samplesPerBlock —
    // r16: the hand-derived golden block; see the golden-vector test)
    "wavadpcm" -> hex(
      "52494646 3C000000 57415645" +
        "666D7420 14000000 1100 0100 401F0000 0E1C0000 0800 0400 0200 0900" +
        "66616374 04000000 09000000" +
        "64617461 08000000 6400 00 00 71 00 00 08"),
    // MS ADPCM WAV (format tag 2, 50-byte fmt with samplesPerBlock + the
    // 7 standard coefficient pairs — r17: the hand-derived golden block;
    // see the golden-vector test)
    "wavmsadpcm" -> hex(
      "52494646 5B000000 57415645" +
        "666D7420 32000000 0200 0100 401F0000 E02E0000 0900 0400 2000 0600 0700" +
        "0001 0000 0002 00FF 0000 0000 C000 4000 F000 0000 CC01 30FF 8801 18FF" +
        "66616374 04000000 06000000" +
        "64617461 09000000 00 1000 C800 6400 18 2F"),
    // Sun AU µ-law, 4 mono frames (r17: the ".snd" triage branch)
    "au" -> hex("2E736E64 00000018 00000004 00000001 00001F40 00000001 FF7F0380"),
    "aiff" -> hex(
      "464F524D 0000003C 41494646" +
        "414E4E4F 00000004 74657374" +
        "434F4D4D 00000012 0001 00000005 0010 400EAC44000000000000" +
        "53534E44 0000000A 00000000 00000000 0000"),
    // AIFF-C ima4 (Apple IMA packetization — r17: the hand-derived
    // golden packet with a truncated final frame count; see the
    // golden-vector test)
    "aifcima4" -> hex(
      "464F524D 00000062 41494643" +
        "46564552 00000004 A2805140" +
        "434F4D4D 00000018 0001 0000003C 0010 400BFA00000000000000 696D6134 0000" +
        "53534E44 0000002A 00000000 00000000" +
        "0103 81" + "00" * 31),
    "mp4" -> hex(
      "00000010 66747970 69736F6D 00000000" +
        "0000000C 66726565 DEADBEEF" +
        "00000088 6D6F6F76" +
        "00000078 6D766864 01000000 0000000000000000 0000000000000000" +
        "00015F90 0000000000015F90" + "00" * 80 +
        "00000008 7472616B"),
    // ID3v2 (syncsafe size 10) + MPEG1 Layer III 128 kbps 44.1 kHz stereo
    // frame header + a little padding
    "mp3" -> hex("494433 0400 00 0000000A" + "00" * 10 + "FFFB9000" + "00" * 16),
    // Xing-mapped VBR MP3 (MPEG1 stereo: map at 4+32; see golden test)
    "mp3vbr" -> hex("FFFB9000" + "00" * 32 + "58696E67" + "00000001" +
      "000000C8"),
    // hand-derived golden ADTS frame (see the golden-vector test below)
    "aac" -> hex("FFF15080011FFCAA"),
    // hand-derived golden FLAC STREAMINFO (see the golden-vector test)
    "flac" -> hex("664C6143 80 000022" + "1000 1000 000000 000000" +
      "0AC442F00000AC44" + "00" * 16),
    // WAVE_FORMAT_EXTENSIBLE 16-bit mono PCM, samples 100, -100 (r17 —
    // see the golden-vector test): 40-byte fmt, PCM SubFormat GUID
    "wavx" -> hex("52494646 40000000 57415645" +
      "666D7420 28000000 FEFF 0100 401F0000 803E0000 0200 1000" +
      "1600 1000 01000000" + "01000000 0000 1000 800000AA00389B71" +
      "64617461 04000000 6400 9CFF"),
    // hand-derived golden Ogg/Opus BOS+EOS (see the golden-vector test)
    "opus" -> hex("4F676753 00 02 0000000000000000 78563412 00000000" +
      "00000000 01 13" + "4F70757348656164 01 01 6400 80BB0000 0000 00" +
      "4F676753 00 04 2404000000000000 78563412 01000000 00000000 01 05" +
      "0000000000"),
    // hand-derived golden SPS (see the golden-vector test below)
    "sps" -> hex("67 42 00 1E DA11E4"),
    // hand-derived golden ID3v2.3 tag: one TIT2 frame (BE u32 size 2,
    // ISO-8859-1 "A") then an MPEG frame (see the golden-vector test)
    "id3" -> hex("494433 0300 00 0000000C" +
      "54495432 00000002 0000 0041" + "FFFB9000"),
    // hand-derived golden EXIF JPEG: little-endian TIFF, orientation 6,
    // two ICC chunks (see the golden-vector test below)
    "jpegexif" -> hex("FFD8" +
      "FFE1 002E 457869660000" +
      "49492A00 08000000 0200" +
      "12010300 01000000 0600 0000" +
      "28010300 01000000 0200 0000" + "00000000" +
      "FFE2 0013 4943435F50524F46494C4500 0102 ABCDEF" +
      "FFE2 0012 4943435F50524F46494C4500 0202 ABCD" +
      "FFD9"))

  private def allParsers(b: Array[Byte]): Unit = {
    ImageHeader.parse(b)
    AudioHeader.parse(b)
    VideoHeader.parse(b)
    MpegAudioHeader.parse(b)
    AdtsHeader.parse(b)
    FlacHeader.parse(b)
    OggOpusHeader.parse(b)
    AvcSpsHeader.parse(b)
    Id3v2Tags.parse(b)
    JpegExif.parse(b)
    graft.operators.Multimodal.AnimatedGif.frameCount(b)
    ImaAdpcm.decode(b)
    MsAdpcm.decode(b)
    Ima4.decode(b)
    FlacDecode.decode(b)
    WavExtensible.decode(b)
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
      "RIFF????AVI ".getBytes, "BM".getBytes,
      hex("00000010 66747970"), hex("FFF1"), "fLaC".getBytes, "OggS".getBytes,
      hex("494433"), ".snd".getBytes)
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
        VideoHeader.parse(b) != null || MpegAudioHeader.parse(b) != null ||
        AdtsHeader.parse(b) != null || FlacHeader.parse(b) != null ||
        OggOpusHeader.parse(b) != null || AvcSpsHeader.parse(b) != null ||
        Id3v2Tags.parse(b) != null || JpegExif.parse(b) != null,
        s"$name no longer parses whole")
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

  test("MPEG audio golden vectors: canonical headers decode to the published values") {
    // FF FB 90 00: sync, MPEG1 (11), Layer III (01), no CRC; bitrate idx 9
    // -> 128 kbps (V1L3 table), sr idx 0 -> 44100, stereo (mode 00) — the
    // most common MP3 header on earth. 20 payload bytes -> 160 bits /
    // 128 kbps = 1 ms.
    assert(MpegAudioHeader.parse(hex("FFFB9000" + "00" * 16))
      == ("audio/mpeg", 3, 128, 44100, 2, 1L, "", 0L))
    // same stream behind an ID3v2 tag (syncsafe size 10): the 10-byte
    // header + 10-byte body must be skipped and EXCLUDED from duration
    assert(MpegAudioHeader.parse(
      hex("494433 0400 00 0000000A" + "00" * 10 + "FFFB9000" + "00" * 16))
      == ("audio/mpeg", 3, 128, 44100, 2, 1L, "", 0L))
    // FF F3 22 C0: MPEG2 (10), Layer III, bitrate idx 2 -> 16 kbps
    // (V2 L2/L3 table), sr idx 0 -> 22050, mode 11 -> mono
    assert(MpegAudioHeader.parse(hex("FFF322C0" + "00" * 12))
      == ("audio/mpeg", 3, 16, 22050, 1, 8L, "", 0L))
    // ID3v2 FOOTER flag (0x10): ten more bytes precede the frame — an
    // unskipped footer would misread the frame header as garbage
    assert(MpegAudioHeader.parse(
      hex("494433 0400 10 0000000A" + "00" * 10 + "00" * 10 + "FFFB9000" + "00" * 16))
      == ("audio/mpeg", 3, 128, 44100, 2, 1L, "", 0L))
    // FF E3 22 C0: MPEG2.5 (version bits 00), Layer III, bitrate idx 2 ->
    // 16 kbps (V2 tables), sr idx 0 -> 11025 (the 2.5 table's halved rates)
    assert(MpegAudioHeader.parse(hex("FFE322C0" + "00" * 12))
      == ("audio/mpeg", 3, 16, 11025, 1, 8L, "", 0L))
    // refusals: free bitrate (idx 0), invalid idx 15, reserved sample-rate
    // idx 3, reserved version bits (01), reserved layer bits (00)
    assert(MpegAudioHeader.parse(hex("FFFB0000")) == null)
    assert(MpegAudioHeader.parse(hex("FFFBF000")) == null)
    assert(MpegAudioHeader.parse(hex("FFFB9C00")) == null)
    assert(MpegAudioHeader.parse(hex("FFEB9000")) == null)
    assert(MpegAudioHeader.parse(hex("FFF99000")) == null)
  }

  test("VBR frame-map golden vectors: Xing/Info/VBRI hand-derived offsets and exact durations") {
    // Xing, MPEG1 stereo: side info 32, so the map sits at 4+32. Flags
    // BE 00000001 = frame count present; 0xC8 = 200 frames. Duration is
    // EXACT: 200 * 1152 * 1000 / 44100 = 5224 ms (not the byte estimate).
    assert(MpegAudioHeader.parse(hex(
      "FFFB9000" + "00" * 32 + "58696E67" + "00000001" + "000000C8"))
      == ("audio/mpeg", 3, 128, 44100, 2, 5224L, "xing", 200L))
    // "Info" (CBR encoder variant, same layout), MPEG2 MONO: side info 9.
    // 100 frames x 576 (MPEG2 Layer III halves) * 1000 / 22050 = 2612 ms.
    assert(MpegAudioHeader.parse(hex(
      "FFF322C0" + "00" * 9 + "496E666F" + "00000001" + "00000064"))
      == ("audio/mpeg", 3, 16, 22050, 1, 2612L, "info", 100L))
    // MPEG1 MONO Xing: side info 17, not 32 — the offset must follow the
    // version x mode table. 300 frames -> 300*1152*1000/44100 = 7836 ms.
    assert(MpegAudioHeader.parse(hex(
      "FFFB90C0" + "00" * 17 + "58696E67" + "00000001" + "0000012C"))
      == ("audio/mpeg", 3, 128, 44100, 1, 7836L, "xing", 300L))
    // VBRI sits at a FIXED 32 bytes past the header: magic, version u16,
    // delay u16, quality u16, bytes u32, frames u32 (all BE). 50 frames
    // -> 50*1152*1000/44100 = 1306 ms.
    assert(MpegAudioHeader.parse(hex(
      "FFFB9000" + "00" * 32 + "56425249" + "0001" + "0000" + "0000" +
        "00001000" + "00000032"))
      == ("audio/mpeg", 3, 128, 44100, 2, 1306L, "vbri", 50L))
    // Xing present but flags bit 0 CLEAR (toc+bytes only): no frame
    // count -> the CBR byte estimate stands. 48 bytes * 8 / 128 = 3 ms.
    assert(MpegAudioHeader.parse(hex(
      "FFFB9000" + "00" * 32 + "58696E67" + "00000006" + "00000000"))
      == ("audio/mpeg", 3, 128, 44100, 2, 3L, "", 0L))
    // Xing magic at the WRONG offset (right after the header, ignoring
    // side info) must NOT be honored — 36 bytes * 8 / 128 = 2 ms CBR.
    assert(MpegAudioHeader.parse(hex(
      "FFFB9000" + "58696E67" + "00000001" + "000000C8" + "00" * 20))
      == ("audio/mpeg", 3, 128, 44100, 2, 2L, "", 0L))
    // a frame count of ZERO under a set flag is no map at all
    assert(MpegAudioHeader.parse(hex(
      "FFFB9000" + "00" * 32 + "58696E67" + "00000001" + "00000000"))
      == ("audio/mpeg", 3, 128, 44100, 2, 3L, "", 0L))
    // CRC-protected frame (protection_absent=0 -> 0xFA), Xing at the
    // SPEC offset 4+2(CRC)+32: the fallback probe must find it.
    // 54 bytes would estimate 3 ms; the map gives the exact 5224.
    assert(MpegAudioHeader.parse(hex(
      "FFFA9000" + "0000" + "00" * 32 + "58696E67" + "00000001" + "000000C8"))
      == ("audio/mpeg", 3, 128, 44100, 2, 5224L, "xing", 200L))
    // CRC-protected frame, Xing at the CRC-IGNORING offset 4+32 (what
    // LAME/ffmpeg actually write): the primary probe finds it.
    assert(MpegAudioHeader.parse(hex(
      "FFFA9000" + "00" * 32 + "58696E67" + "00000001" + "000000C8"))
      == ("audio/mpeg", 3, 128, 44100, 2, 5224L, "xing", 200L))
    // CRC-protected VBRI at the spec offset 4+2+32, via the same fallback
    assert(MpegAudioHeader.parse(hex(
      "FFFA9000" + "0000" + "00" * 32 + "56425249" + "0001" + "0000" +
        "0000" + "00001000" + "00000032"))
      == ("audio/mpeg", 3, 128, 44100, 2, 1306L, "vbri", 50L))
    // NO CRC -> no fallback: a map at 4+2+sideInfo of a protection-
    // absent frame is inside audio data, not honored (50 B -> 3 ms CBR)
    assert(MpegAudioHeader.parse(hex(
      "FFFB9000" + "0000" + "00" * 32 + "58696E67" + "00000001" + "000000C8"))
      == ("audio/mpeg", 3, 128, 44100, 2, 3L, "", 0L))
  }

  test("trailing ID3v1 tag is metadata, not stream bytes, in the CBR estimate") {
    // 64 audio bytes + the exact 128-byte "TAG" trailer: 64*8/128 = 4 ms
    // (counting the tag would say 12 ms) — same convention the ADTS walk
    // pins structurally at a frame boundary
    val tag = "544147" + "00" * 125
    assert(MpegAudioHeader.parse(hex("FFFB9000" + "00" * 60 + tag))
      == ("audio/mpeg", 3, 128, 44100, 2, 4L, "", 0L))
    // header + nothing but the tag: zero stream bytes, zero duration
    assert(MpegAudioHeader.parse(hex("FFFB9000" + tag))
      == ("audio/mpeg", 3, 128, 44100, 2, 0L, "", 0L))
    // 128 bytes from the end but NOT the trailer magic: counted as audio
    assert(MpegAudioHeader.parse(hex("FFFB9000" + "00" * 60 + "424147" +
      "00" * 125))
      == ("audio/mpeg", 3, 128, 44100, 2, 12L, "", 0L))
    // a "tag" that would OVERLAP the frame header is impossible for a
    // real ID3v1 trailer and must not be subtracted: h3=0x54 is 'T' (a
    // legal stereo channel-mode byte) and the next two bytes spell "AG",
    // putting T-A-G exactly 128 bytes from the end of this 131-byte
    // payload — inside the header. All 131 bytes are stream: 8 ms, not
    // the 0 ms a 3-byte "stream" would give.
    assert(MpegAudioHeader.parse(hex("FFFB9054" + "4147" + "00" * 125))
      == ("audio/mpeg", 3, 128, 44100, 2, 8L, "", 0L))
  }

  test("ADTS golden vectors: hand-derived frames decode to the published values") {
    // FF F1 50 80 01 1F FC | AA — derived bit-by-bit BY HAND (independent
    // of syntheticAdtsCorpus, so a shared bit-offset misconception cannot
    // hide): F1 = sync(1111) id=0 layer=00 prot_absent=1; 50 = profile
    // 01(LC) sfIdx 0100(44100) priv=0 cc_hi=0; 80 = cc_lo=10 (cfg 2,
    // stereo) flags 0000 len_hi=00; len 13 bits = 0000000001 000 = 8
    // (7-byte header + 1 body byte); 1F/FC = fullness 0x7FF, 0 extra raw
    // blocks. One block = 1024 samples -> 1024000/44100 = 23 ms.
    assert(AdtsHeader.parse(hex("FFF15080011FFC AA"))
      == ("LC", 44100, 2, 1, 23L))
    // two back-to-back frames: the walk must chain on frame_length
    assert(AdtsHeader.parse(hex("FFF15080011FFC AA" + "FFF15080011FFC AA"))
      == ("LC", 44100, 2, 2, 46L))
    // behind an ID3v2 tag (syncsafe size 10): skipped, duration unchanged
    assert(AdtsHeader.parse(
      hex("494433 0400 00 0000000A" + "00" * 10 + "FFF15080011FFC AA"))
      == ("LC", 44100, 2, 1, 23L))
    // a trailing ID3v1 tag — EXACTLY 128 bytes starting "TAG" — is the
    // one legal non-frame tail (pre-ID3v2 taggers wrote it on .aac too)
    assert(AdtsHeader.parse(
      hex("FFF15080011FFC AA" + "544147" + "00" * 125))
      == ("LC", 44100, 2, 1, 23L))
    // "TAG" NOT 128 bytes from the end is garbage, not a tag
    assert(AdtsHeader.parse(
      hex("FFF15080011FFC AA" + "544147" + "00" * 10)) == null)
    // FF F8 2D C0 01 7F FD BE EF | CA FE: id=1(MPEG-2 marker, ignored),
    // prot_absent=0 -> 16-bit CRC makes the header 9 bytes; profile
    // 00(Main), sfIdx 1011(8000), cfg 111 -> 8 channels; len 11 = 9 + 2
    // body; raw-blocks field 1 -> TWO blocks = 2048 samples -> 256 ms
    assert(AdtsHeader.parse(hex("FFF82DC0017FFD BEEF CAFE"))
      == ("Main", 8000, 8, 1, 256L))
    // refusals: layer != 00; reserved sfIdx 13; channel cfg 0 (PCE —
    // layout needs payload decode); declared length overruns the payload
    // (truncated frame); trailing garbage after the last frame; a CRC
    // frame whose declared length is smaller than its own 9-byte header;
    // mid-stream parameter change (torn / concatenated streams)
    assert(AdtsHeader.parse(hex("FFF35080011FFC AA")) == null)
    assert(AdtsHeader.parse(hex("FFF17480011FFC AA")) == null)
    assert(AdtsHeader.parse(hex("FFF15000011FFC AA")) == null)
    assert(AdtsHeader.parse(hex("FFF15080011FFC")) == null)
    assert(AdtsHeader.parse(hex("FFF15080011FFC AA 00")) == null)
    assert(AdtsHeader.parse(hex("FFF02DC0011FFD BEEF")) == null)
    assert(AdtsHeader.parse(
      hex("FFF15080011FFC AA" + "FFF19080011FFC AA")) == null)
    // an ID3 tag swallowing the whole payload is a refusal, not a crash
    assert(AdtsHeader.parse(hex("494433 0400 00 0000000A" + "00" * 10)) == null)
  }

  test("FLAC golden vectors: hand-derived STREAMINFO decodes to the published values") {
    // 664C6143 = "fLaC"; 80 = last-block + type 0 (STREAMINFO); 000022 =
    // length 34. Body: blocksizes 0x1000/0x1000, framesizes 0/0, then the
    // packed group derived digit-by-digit BY HAND (independent of
    // syntheticFlacCorpus): rate 44100 = 0x0AC44 in bits 63-44, ch-1 = 1
    // in bits 43-41 ('2' nibble), bps-1 = 15 in bits 40-36 ('F' nibble),
    // total 44100 in bits 35-0 => 0AC4 42F0 0000 AC44; 16-byte MD5 zeros.
    val golden = "664C6143 80 000022" + "1000 1000 000000 000000"
    assert(FlacHeader.parse(hex(golden + "0AC442F00000AC44" + "00" * 16))
      == (44100, 2, 16, 44100L, 1000L))
    // a non-last STREAMINFO followed by a padding block parses the same
    assert(FlacHeader.parse(hex("664C6143 00 000022" +
      "1000 1000 000000 000000" + "0AC442F00000AC44" + "00" * 16 +
      "81 000004 00000000")) == (44100, 2, 16, 44100L, 1000L))
    // refusals: wrong magic; first block not STREAMINFO (type 1); body
    // length != 34; truncated body; zero sample rate; zero total samples
    assert(FlacHeader.parse(hex("664C6144 80 000022" +
      "1000 1000 000000 000000" + "0AC442F00000AC44" + "00" * 16)) == null)
    assert(FlacHeader.parse(hex("664C6143 81 000022" +
      "1000 1000 000000 000000" + "0AC442F00000AC44" + "00" * 16)) == null)
    assert(FlacHeader.parse(hex("664C6143 80 000023" +
      "1000 1000 000000 000000" + "0AC442F00000AC44" + "00" * 16)) == null)
    assert(FlacHeader.parse(hex(golden + "0AC442F00000AC44")) == null)
    assert(FlacHeader.parse(hex(golden + "000002F00000AC44" + "00" * 16)) == null)
    assert(FlacHeader.parse(hex(golden + "0AC442F000000000" + "00" * 16)) == null)
  }

  test("Ogg/Opus golden vectors: hand-derived pages decode to the published values") {
    // Derived byte-by-byte BY HAND (independent of syntheticOggOpusCorpus
    // — note every multi-byte field is LITTLE-endian): BOS page = "OggS"
    // v0 type 02, granule 0, serial 0x12345678 → 78563412, seq 0, CRC 0,
    // 1 segment of 0x13=19 bytes: OpusHead v1, 1 channel, pre-skip
    // 0x0064=100 → "6400", input rate 48000 = 0x0000BB80 → "80BB0000",
    // gain 0, family 0. EOS page = type 04, granule 100+960 = 1060 =
    // 0x424 → "2404…", 1 segment of 5 zero bytes. Duration = (1060−100)
    // · 1000 / 48000 = 20 ms at the 48 kHz granule clock.
    val bos = "4F676753 00 02 0000000000000000 78563412 00000000" +
      "00000000 01 13" + "4F70757348656164 01 01 6400 80BB0000 0000 00"
    val eos = "4F676753 00 04 2404000000000000 78563412 01000000" +
      "00000000 01 05" + "0000000000"
    assert(OggOpusHeader.parse(hex(bos + eos)) == (1, 100, 48000L, 0, 2, 20L))
    // a valid FAMILY-1 head (3 channels, 2 streams + 1 coupled, identity
    // mapping) — segment length grows from 0x13 to 0x18 (21 + 3 bytes)
    val bos1 = "4F676753 00 02 0000000000000000 78563412 00000000" +
      "00000000 01 18" +
      "4F70757348656164 01 03 6400 80BB0000 0000 01 02 01 000102"
    assert(OggOpusHeader.parse(hex(bos1 + eos)) == (3, 100, 48000L, 1, 2, 20L))
    // refusals, each a one-field corruption of a golden pair: stream
    // version != 0; first page missing the BOS flag; OpusHead magic off
    // by one byte; family 0 with 3 channels (defined only for 1-2); no
    // EOS flag on the final page; EOS granule 50 < pre-skip 100; a page
    // whose lacing table promises more body than the payload carries
    assert(OggOpusHeader.parse(hex(bos.replaceFirst("00 02", "01 02") + eos)) == null)
    assert(OggOpusHeader.parse(hex(bos.replaceFirst("00 02", "00 00") + eos)) == null)
    assert(OggOpusHeader.parse(hex(
      bos.replace("4F70757348656164", "4F70757348656165") + eos)) == null)
    assert(OggOpusHeader.parse(hex(
      bos.replace("01 01 6400", "01 03 6400") + eos)) == null)
    assert(OggOpusHeader.parse(hex(bos + eos.replaceFirst("00 04", "00 00"))) == null)
    assert(OggOpusHeader.parse(hex(
      bos + eos.replace("2404", "3200"))) == null)
    assert(OggOpusHeader.parse(hex((bos + eos).dropRight(2))) == null)
    // grouped / chained streams must refuse, not mix: a second serial
    // number on the EOS page; a second BOS flag mid-stream
    assert(OggOpusHeader.parse(hex(
      bos + eos.replace("78563412", "79563412"))) == null)
    assert(OggOpusHeader.parse(hex(
      bos + eos.replaceFirst("00 04", "00 06"))) == null)
    // impossible family-1 mappings: zero streams; an entry pointing past
    // streams + coupled (and not the 255 silence marker)
    assert(OggOpusHeader.parse(hex(
      bos1.replace("01 02 01 000102", "01 00 00 000102") + eos)) == null)
    assert(OggOpusHeader.parse(hex(
      bos1.replace("01 02 01 000102", "01 02 01 000103") + eos)) == null)
    // a u64 EOS granule of 2^62 passes the range checks but would
    // overflow the *1000 duration arithmetic — refuse, don't emit garbage
    assert(OggOpusHeader.parse(hex(
      bos + eos.replace("2404000000000000", "0000000000000040"))) == null)
  }

  test("AVC SPS golden vector: hand-derived baseline 64x48 bitstream") {
    // Derived bit-by-bit BY HAND (independent of the BitWriter, so a
    // shared exp-Golomb misconception between builder and parser cannot
    // hide): 67 = NAL(ref 3, type 7); 42 00 1E = profile 66, constraints
    // 0, level 30. RBSP bits: ue(0) sps_id='1', ue(0) log2mfn='1',
    // ue(2) poc_type='011', ue(1) refs='010', gaps='0',
    // ue(3) width_mbs_minus1='00100', ue(2) height_map_minus1='011',
    // frame_mbs_only='1', direct_8x8='1', cropping='0', vui='0',
    // stop='1', pad '00' => 11011010 00010001 11100100 = DA 11 E4.
    assert(AvcSpsHeader.parse(hex("6742001E DA11E4")) == (66, 30, 64, 48))
    // and the writer must reproduce the hand-derived bytes exactly
    assert(AvcSpsHeader.buildSps(66, 30, 64, 48).toSeq == hex("6742001E DA11E4").toSeq)
    // refusals: non-SPS NAL type; forbidden bit set; MBAFF (interlaced)
    assert(AvcSpsHeader.parse(hex("6142001E DA11E4")) == null)
    assert(AvcSpsHeader.parse(hex("E742001E DA11E4")) == null)
  }

  test("AVC SPS build->parse round-trips across profiles, crops, and huge dims; " +
    "emulation-prevention escaping engages and still parses") {
    var escaped = 0
    for {
      profile <- Seq(66, 77, 100)
      level <- Seq(10, 31, 51)
      // 2^21 * 16: ue(2^21 - 1) writes a 21-zero prefix whose terminating
      // 1 lands in a byte of value 0x02 — two zero bytes then <= 3, the
      // exact shape that REQUIRES an emulation-prevention 0x03
      w <- Seq(2, 64, 322, 640, 1920, 65536 * 16, 2097152 * 16)
      h <- Seq(2, 48, 242, 480, 1080)
    } {
      val sps = AvcSpsHeader.buildSps(profile, level, w, h)
      assert(AvcSpsHeader.parse(sps) == (profile, level, w, h),
        s"round trip failed for p=$profile l=$level ${w}x$h")
      // count payloads where the escaper actually fired (00 00 03 present)
      if (sps.sliding(3).exists(s => s(0) == 0 && s(1) == 0 && s(2) == 3)) escaped += 1
    }
    // the 65536*16 width needs a 16-zero exp-Golomb prefix -> zero bytes
    // -> escaping MUST have engaged somewhere in the sweep, proving the
    // parser's de-escape path is exercised, not dead code
    assert(escaped > 0, "no payload in the sweep engaged emulation prevention")
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
    // ID3 whose syncsafe size swallows the whole payload / sets a top bit
    allParsers(hex("494433 0400 00 7F7F7F7F FFFB9000"))
    allParsers(hex("494433 0400 00 00000080 FFFB9000"))
    // SPS whose exp-Golomb prefix never terminates (all-zero bitstream)
    allParsers(hex("67 42 00 1E" + "00" * 64))
    // near-Int-max sizes: Int-space `off += 8 + size` would wrap NEGATIVE
    // and index out of bounds — the walk must advance in Long space
    allParsers(hex("52494646 48000000 57415645 4A554E4B 7FFFFFEF 00"))
    allParsers(hex("464F524D 0000003C 41494646 414E4E4F 7FFFFFEF 00"))
    allParsers(hex("00000010 66747970 69736F6D 00000000 7FFFFFEF 66726565"))
    allParsers(hex("00000010 66747970 69736F6D 00000000" +
      "00000018 6D6F6F76 7FFFFFEF 6D766864 00000000 00000000"))
  }

  test("ID3v2 golden vectors: v2.3 BE vs v2.4 syncsafe frame sizes, UTF-16 BOM, " +
    "terminator strip; v2.2 and unsynchronised tags refuse") {
    // v2.3: TIT2, plain BE u32 size 2, ISO-8859-1 "A" (the `valid` bytes)
    assert(Id3v2Tags.parse(valid.find(_._1 == "id3").get._2) ==
      (("2.3", 1, "A", null, null)))
    // v2.4: frame size 129 crosses 128 so SYNCSAFE (00 00 01 01) differs
    // from BE u32 (= 257) — reading the wrong branch overruns the tag and
    // drops the frame; body is UTF-8 "B" * 128. Tag body 139 -> 00 00 01 0B.
    assert(Id3v2Tags.parse(hex("494433 0400 00 0000010B" +
      "54495432 00000101 0000 03" + "42" * 128)) ==
      (("2.4", 1, "B" * 128, null, null)))
    // UTF-16 with BOM (FE FF) + NUL terminator: decodes "Hi", strips the
    // 00 00; TPE1 lands in artist, title/album stay null
    assert(Id3v2Tags.parse(hex("494433 0300 00 00000013" +
      "54504531 00000009 0000 01 FEFF 0048 0069 0000")) ==
      (("2.3", 1, null, "Hi", null)))
    // refusals: ID3v2.2 (3-byte frame ids, out of scope) and the
    // unsynchronisation flag (0x80) — null, never a garbled guess
    assert(Id3v2Tags.parse(hex("494433 0200 00 0000000C" +
      "54495432 00000002 0000 0041")) == null)
    assert(Id3v2Tags.parse(hex("494433 0300 80 0000000C" +
      "54495432 00000002 0000 0041")) == null)
  }

  test("JPEG EXIF golden vectors: both TIFF endians, multi-chunk ICC sum, " +
    "absent-orientation null, torn TIFF refuses without erasing ICC") {
    // the `valid` exemplar: little-endian ("II") TIFF, orientation 6
    // walked PAST a ResolutionUnit entry, ICC spilled over two chunks
    // whose payloads sum 3 + 2 = 5 bytes
    assert(JpegExif.parse(valid.find(_._1 == "jpegexif").get._2) ==
      ((Some(6), Some("II"), 2, 5L)))
    // big-endian ("MM"): every multi-byte field flips — orientation 8
    assert(JpegExif.parse(hex("FFD8 FFE1 002E 457869660000" +
      "4D4D002A 00000008 0002" +
      "01120003 00000001 0008 0000" +
      "01280003 00000001 0002 0000" + "00000000" + "FFD9")) ==
      ((Some(8), Some("MM"), 0, 0L)))
    // Exif block WITHOUT an Orientation tag: byte order reads, orientation
    // stays null (legal per EXIF 2.3 — the tag is optional)
    assert(JpegExif.parse(hex("FFD8 FFE1 0022 457869660000" +
      "4D4D002A 00000008 0001" +
      "01280003 00000001 0002 0000" + "00000000" + "FFD9")) ==
      ((None, Some("MM"), 0, 0L)))
    // plain JFIF JPEG (the `valid` "jpeg" exemplar): a row with no EXIF
    // and no ICC — present file, absent metadata
    assert(JpegExif.parse(valid.find(_._1 == "jpeg").get._2) ==
      ((None, None, 0, 0L)))
    // torn TIFF (wrong magic 43): the Exif block contributes nothing,
    // but the ICC chunk AFTER it still counts — a refusal is per-field,
    // never a whole-payload erase
    assert(JpegExif.parse(hex("FFD8 FFE1 0022 457869660000" +
      "4D4D002B 00000008 0001" +
      "01280003 00000001 0002 0000" + "00000000" +
      "FFE2 0013 4943435F50524F46494C4500 0101 ABCDEF" + "FFD9")) ==
      ((None, None, 1, 3L)))
    // not JPEG at all: null, never a guess
    assert(JpegExif.parse(hex("89504E470D0A1A0A")) == null)
    // orientation out of the spec's 1-8 range: ignored, not reported
    assert(JpegExif.parse(hex("FFD8 FFE1 0022 457869660000" +
      "49492A00 08000000 0100" +
      "12010300 01000000 0900 0000" + "00000000" + "FFD9")) ==
      ((None, Some("II"), 0, 0L)))
  }

  test("animated-GIF frame walk: multi-frame counts, single-frame/torn/desynced refuse (r15)") {
    import graft.operators.Multimodal.AnimatedGif
    // hand-built GIF89a, 2x1 logical screen, NO global color table, two
    // image descriptors each with a 2-entry local color table + a
    // 1-sub-block LZW body, then the trailer — the walk must count 2
    def frame(lct: Boolean): String =
      "2C" + "0000 0000 0200 0100" + (if (lct) "80" else "00") +
        (if (lct) "000000 FFFFFF" else "") + "02" + "02 4C01" + "00"
    val two = hex("474946383961" + "0200 0100 00 00 00" + frame(true) + frame(true) + "3B")
    assert(AnimatedGif.frameCount(two) == 2)
    assert(AnimatedGif.isGif(two))
    // a graphic-control extension (0x21 F9) between frames is walked over
    val withExt = hex("474946383961" + "0200 0100 00 00 00" +
      "21F9" + "04 00000000" + "00" + frame(true) +
      "21F9" + "04 00000000" + "00" + frame(true) + "3B")
    assert(AnimatedGif.frameCount(withExt) == 2)
    // single frame: an IMAGE — count 1, and the video frame source refuses
    val one = hex("474946383961" + "0200 0100 00 00 00" + frame(true) + "3B")
    assert(AnimatedGif.frameCount(one) == 1)
    assert(AnimatedGif.frameSource(one) == null)
    // torn: trailer missing / sub-block running past the buffer / a
    // desynced block type — all -1, never a guess
    assert(AnimatedGif.frameCount(two.dropRight(1)) == -1)
    assert(AnimatedGif.frameCount(hex("474946383961" + "0200 0100 00 00 00" +
      "2C" + "0000 0000 0200 0100" + "00" + "02" + "FF 4C")) == -1)
    assert(AnimatedGif.frameCount(hex("474946383961" + "0200 0100 00 00 00" +
      "7A" + "3B")) == -1)
    assert(AnimatedGif.frameCount("GIF8".getBytes) == -1)
    assert(AnimatedGif.frameCount(null) == -1)
    // a REAL sequence-writer GIF round-trips: build → walk count == n,
    // and the decoder agrees with the byte walk
    val imgs = (0 until 3).map { i =>
      val img = new java.awt.image.BufferedImage(12, 10,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 10).foreach(y => (0 until 12).foreach(x =>
        img.setRGB(x, y, if ((x + y + i) % 2 == 0) 0x333333 else 0xCCCCCC)))
      img
    }
    val built = AnimatedGif.build(imgs)
    assert(AnimatedGif.frameCount(built) == 3)
    val src = AnimatedGif.frameSource(built)
    assert(src.n == 3)
    try (0 until 3).foreach { i =>
      val d = src.read(i)
      assert(d != null && d.getWidth == 12 && d.getHeight == 10)
      // losslessness: the sequence writer's palette is exact at 2 colors
      (0 until 10).foreach(y => (0 until 12).foreach(x =>
        assert((d.getRGB(x, y) & 0xFFFFFF) == (imgs(i).getRGB(x, y) & 0xFFFFFF))))
    } finally src.close()
    // double-close is safe (callers close in finally; a hash path that
    // already closed must not blow up a later defensive close)
    src.close()
  }

  test("IMA ADPCM golden vector: hand-derived step walk, clamp, stereo interleave; torn/misshaped refuse (r16)") {
    import graft.functions.ImaAdpcm
    // mono golden block (the wavadpcm corpus vector): predictor 100,
    // index 0, nibble bytes 71 00 00 08 (low nibble first). Hand walk of
    // the published IMA tables:
    //  s0=100 (header). n=1: step=7, diff=7>>2=1 → 101, idx→0.
    //  n=7: diff=1+3+7=11 → 112, idx→8. n=0: step=16, diff=2 → 114,
    //  idx→7. n=0: step=14 → 115, idx→6. n=0: step=13 → 116, idx→5.
    //  n=0: step=12 → 117, idx→4. n=8: step=11, diff=1, SIGN → 116,
    //  idx→3. n=0: step=10 → 117.
    val golden = valid.toMap.apply("wavadpcm")
    val d = ImaAdpcm.decode(golden)
    assert(d != null && d.channels == 1 && d.rate == 8000)
    assert(d.samples.toSeq == Seq[Short](100, 101, 112, 114, 115, 116, 117, 116, 117))
    assert(AudioHeader.parse(golden) == ("audio/wav", 1, 8000, 4, 9L))
    // positive-overflow clamp: predictor 32700, index 88 (step 32767),
    // nibble 7 adds st>>3 + st>>2 + st>>1 + st = 4095+8191+16383+32767
    // = 61436 → clamps to 32767
    val clampy = hex(
      "52494646 3C000000 57415645" +
        "666D7420 14000000 1100 0100 401F0000 0E1C0000 0800 0400 0200 0900" +
        "66616374 04000000 09000000" +
        "64617461 08000000 BC7F 58 00 77 77 77 77")
    val dc = ImaAdpcm.decode(clampy)
    assert(dc != null && dc.samples(0) == 32700.toShort &&
      dc.samples.drop(1).forall(_ == 32767.toShort))
    // stereo interleave: two channels' headers then 4-byte groups per
    // channel; all-zero nibbles at step 7 move nothing (7>>3 = 0), so
    // the output is the two predictors repeated frame-major
    val stereo = hex(
      "52494646 44000000 57415645" +
        "666D7420 14000000 1100 0200 401F0000 0E1C0000 1000 0400 0200 0900" +
        "66616374 04000000 09000000" +
        "64617461 10000000" +
        "0500 00 00" + "FDFF 00 00" + "00000000" + "00000000")
    val ds = ImaAdpcm.decode(stereo)
    assert(ds != null && ds.channels == 2 && ds.samples.length == 18)
    assert(ds.samples.toSeq == Seq.fill(9)(Seq[Short](5, -3)).flatten)
    // refusals: index seed > 88, nonzero reserved byte, torn final
    // block, samplesPerBlock inconsistent with blockAlign, fmt too
    // short to carry the extra — null, never a guess
    assert(ImaAdpcm.decode(hex(
      "52494646 3C000000 57415645" +
        "666D7420 14000000 1100 0100 401F0000 0E1C0000 0800 0400 0200 0900" +
        "66616374 04000000 09000000" +
        "64617461 08000000 6400 59 00 71 00 00 08")) == null)
    assert(ImaAdpcm.decode(hex(
      "52494646 3C000000 57415645" +
        "666D7420 14000000 1100 0100 401F0000 0E1C0000 0800 0400 0200 0900" +
        "66616374 04000000 09000000" +
        "64617461 08000000 6400 00 01 71 00 00 08")) == null)
    assert(ImaAdpcm.decode(hex(
      "52494646 3B000000 57415645" +
        "666D7420 14000000 1100 0100 401F0000 0E1C0000 0800 0400 0200 0900" +
        "66616374 04000000 09000000" +
        "64617461 07000000 6400 00 00 71 00 00")) == null)
    assert(ImaAdpcm.decode(hex(
      "52494646 3C000000 57415645" +
        "666D7420 14000000 1100 0100 401F0000 0E1C0000 0800 0400 0200 0A00" +
        "66616374 04000000 09000000" +
        "64617461 08000000 6400 00 00 71 00 00 08")) == null)
    assert(ImaAdpcm.decode(hex(
      "52494646 38000000 57415645" +
        "666D7420 10000000 1100 0100 401F0000 0E1C0000 0800 0400" +
        "66616374 04000000 09000000" +
        "64617461 08000000 6400 00 00 71 00 00 08")) == null)
    // AudioHeader agrees on the refusal class it can see (header-only)
    assert(AudioHeader.parse(hex(
      "52494646 28000000 57415645" +
        "666D7420 10000000 1100 0100 401F0000 401F0000 0800 0400" +
        "64617461 04000000 00000000")) == null)
    assert(ImaAdpcm.decode("not audio".getBytes) == null)
    assert(ImaAdpcm.decode(null) == null)
    // triage/decode agreement is BY CONSTRUCTION (one shared geometry
    // predicate): a 4-channel clip with valid layout is readable by
    // both; a 9-channel header is refused by both
    assert(ImaAdpcm.validGeometry(4, 32, 9) &&
      !ImaAdpcm.validGeometry(9, 72, 9))
    val quad = hex(
      "52494646 54000000 57415645" +
        "666D7420 14000000 1100 0400 401F0000 0E1C0000 2000 0400 0200 0900" +
        "66616374 04000000 09000000" +
        "64617461 20000000" +
        "0100 00 00" + "0200 00 00" + "0300 00 00" + "0400 00 00" +
        "00000000" * 4)
    val dq = ImaAdpcm.decode(quad)
    assert(dq != null && dq.channels == 4 && dq.samples.length == 36)
    assert(dq.samples.take(4).toSeq == Seq[Short](1, 2, 3, 4))
    assert(AudioHeader.parse(quad) == ("audio/wav", 4, 8000, 4, 9L))
  }

  test("MS ADPCM golden vectors: all-coefficient prediction, trunc-toward-zero, clamp, stereo rotation; misshaped refuse (r17)") {
    import graft.functions.MsAdpcm
    // the shared 50-byte tag-2 mono fmt (blockAlign 9, the 7 standard
    // coefficient pairs); samplesPerBlock is the one field the refusal
    // vectors vary
    def fmt(spb: Int): String =
      f"666D7420 32000000 0200 0100 401F0000 E02E0000 0900 0400 2000 0$spb%x00 0700 " +
        "0001 0000 0002 00FF 0000 0000 C000 4000 F000 0000 CC01 30FF 8801 18FF"
    // mono golden block (the wavmsadpcm corpus vector): coeff pair 0
    // (256, 0 — predict = iSamp1), delta 16, iSamp1 200, iSamp2 100,
    // nibble bytes 18 2F (HIGH nibble first). Hand walk of the published
    // algorithm:
    //  out: 100 (iSamp2), 200 (iSamp1).
    //  n=1: predict=200, samp=200+1·16=216; delta=230·16/256=14→16.
    //  n=8 (−8): predict=216, samp=216−128=88; delta=768·16/256=48.
    //  n=2: predict=88, samp=88+2·48=184; delta=230·48/256=43.
    //  n=F (−1): predict=184, samp=184−43=141.
    val golden = valid.toMap.apply("wavmsadpcm")
    val d = MsAdpcm.decode(golden)
    assert(d != null && d.channels == 1 && d.rate == 8000)
    assert(d.samples.toSeq == Seq[Short](100, 200, 216, 88, 184, 141))
    assert(AudioHeader.parse(golden) == ("audio/wav", 1, 8000, 4, 6L))
    // coefficient pair 1 (512, −256 — true 2nd-order prediction): delta
    // 16, iSamp1 10, iSamp2 4, nibbles 3,8:
    //  n=3: predict=(10·512+4·−256)/256=16, samp=16+48=64; delta→16.
    //  n=8: predict=(64·512+10·−256)/256=118, samp=118−128=−10.
    val pair1 = hex(
      "52494646 5A000000 57415645" +
        "666D7420 32000000 0200 0100 401F0000 803E0000 0800 0400 2000 0400 0700" +
        "0001 0000 0002 00FF 0000 0000 C000 4000 F000 0000 CC01 30FF 8801 18FF" +
        "66616374 04000000 04000000" +
        "64617461 08000000 01 1000 0A00 0400 38")
    val d1 = MsAdpcm.decode(pair1)
    assert(d1 != null && d1.samples.toSeq == Seq[Short](4, 10, 64, -10))
    // trunc-toward-zero on a NEGATIVE prediction (coeff pair 3 = 192,64;
    // iSamp1 −1, iSamp2 0): predict = −192/256 = 0 under C semantics —
    // an arithmetic >>8 would floor to −1 and this vector would read
    // [0,−1,−1,−1]
    val trunc = hex(
      "52494646 5A000000 57415645" +
        "666D7420 32000000 0200 0100 401F0000 803E0000 0800 0400 2000 0400 0700" +
        "0001 0000 0002 00FF 0000 0000 C000 4000 F000 0000 CC01 30FF 8801 18FF" +
        "66616374 04000000 04000000" +
        "64617461 08000000 03 1000 FFFF 0000 00")
    val dt = MsAdpcm.decode(trunc)
    assert(dt != null && dt.samples.toSeq == Seq[Short](0, -1, 0, 0))
    // positive-overflow clamp: delta 4096, iSamp1 32700, nibbles 7,7 —
    // 32700+7·4096=61372→32767, then predict=32767 clamps again
    val clampy = hex(
      "52494646 5A000000 57415645" +
        "666D7420 32000000 0200 0100 401F0000 803E0000 0800 0400 2000 0400 0700" +
        "0001 0000 0002 00FF 0000 0000 C000 4000 F000 0000 CC01 30FF 8801 18FF" +
        "66616374 04000000 04000000" +
        "64617461 08000000 00 0010 BC7F 0000 77")
    val dc = MsAdpcm.decode(clampy)
    assert(dc != null && dc.samples.toSeq == Seq[Short](0, 32700, 32767, 32767))
    // stereo: 14-byte grouped header (predictors, deltas, samp1s,
    // samp2s — channels interleaved within each FIELD), nibbles rotate
    // channels; all-zero nibbles at coeff 0 hold each channel's sample
    val stereo = hex(
      "52494646 62000000 57415645" +
        "666D7420 32000000 0200 0200 401F0000 007D0000 1000 0400 2000 0400 0700" +
        "0001 0000 0002 00FF 0000 0000 C000 4000 F000 0000 CC01 30FF 8801 18FF" +
        "66616374 04000000 04000000" +
        "64617461 10000000" +
        "00 00" + "1000 1000" + "0500 FDFF" + "0100 0200" + "00 00")
    val ds = MsAdpcm.decode(stereo)
    assert(ds != null && ds.channels == 2 && ds.samples.length == 8)
    assert(ds.samples.toSeq == Seq[Short](1, 2, 5, -3, 5, -3, 5, -3))
    assert(AudioHeader.parse(stereo) == ("audio/wav", 2, 8000, 4, 4L))
    // refusals: predictor index past the table, non-positive seed delta,
    // samplesPerBlock inconsistent with blockAlign, numCoef below the
    // spec's 7 — null, never a guess
    def mono(block: String, spb: Int = 6): Array[Byte] = hex(
      "52494646 5B000000 57415645 " + fmt(spb) +
        "66616374 04000000 06000000" +
        f"64617461 09000000 $block")
    assert(MsAdpcm.decode(mono("07 1000 C800 6400 18 2F")) == null)
    assert(MsAdpcm.decode(mono("00 0000 C800 6400 18 2F")) == null)
    assert(MsAdpcm.decode(mono("00 1000 C800 6400 18 2F", spb = 7)) == null)
    assert(AudioHeader.parse(mono("00 1000 C800 6400 18 2F", spb = 7)) == null)
    assert(MsAdpcm.decode(hex(
      "52494646 56000000 57415645" +
        "666D7420 2E000000 0200 0100 401F0000 E02E0000 0900 0400 1C00 0600 0600" +
        "0001 0000 0002 00FF 0000 0000 C000 4000 F000 0000 CC01 30FF" +
        "66616374 04000000 06000000" +
        "64617461 09000000 00 1000 C800 6400 18 2F")) == null)
    // torn final block: dataSize not block-aligned
    assert(MsAdpcm.decode(hex(
      "52494646 5A000000 57415645 " + fmt(6) +
        "66616374 04000000 06000000" +
        "64617461 08000000 00 1000 C800 6400 18")) == null)
    // chunk order [data, fmt] with the file ending EXACTLY at the fmt
    // chunk's last coefficient byte: a well-formed stream the r17 first
    // cut falsely refused (its bounds guard demanded 8 bytes past the
    // coefficient table — review r17); must decode identically to the
    // fmt-first golden
    val fmtLast = hex(
      "52494646 50000000 57415645" +
        "64617461 09000000 00 1000 C800 6400 18 2F" + "00" + // odd-size pad
        fmt(6))
    val dl = MsAdpcm.decode(fmtLast)
    assert(dl != null && dl.samples.toSeq == Seq[Short](100, 200, 216, 88, 184, 141))
    assert(AudioHeader.parse(fmtLast) == ("audio/wav", 1, 8000, 4, 6L))
    // the two from-scratch ADPCM decoders refuse each other's fmt tag —
    // the sequential fallback in AudioDedup.decodeFromScratch is format
    // dispatch
    assert(MsAdpcm.decode(valid.toMap.apply("wavadpcm")) == null)
    assert(graft.functions.ImaAdpcm.decode(golden) == null)
    assert(MsAdpcm.decode("not audio".getBytes) == null)
    assert(MsAdpcm.decode(null) == null)
    // triage/decode agreement is BY CONSTRUCTION (one shared geometry
    // predicate)
    assert(MsAdpcm.validGeometry(1, 9, 6) && MsAdpcm.validGeometry(2, 16, 4))
    assert(!MsAdpcm.validGeometry(3, 33, 4)) // past the published layouts
    assert(!MsAdpcm.validGeometry(1, 7, 2)) // header-only block
  }

  test("AIFF-C ima4 golden vectors: 9+7-bit header split, low-first nibbles, final-packet truncation, stereo interleave; misshaped refuse (r17)") {
    import graft.functions.Ima4
    // mono golden packet (the aifcima4 exemplar): header 0x0103 →
    // predictor (s16)(0x0103 & 0xFF80) = 256, index 3; data byte 0 =
    // 0x81 (LOW nibble first):
    //  n=1: step=10, diff=1+2=3 → 259, idx→2.
    //  n=8: step=9, diff=1, SIGN → 258, idx→1.
    //  byte 1 = 0x00: n=0: step=8, diff=1 → 259, idx→0.
    //  n=0 at idx 0: step=7, diff=0 → 259 thereafter.
    // COMM declares 60 frames over the 64-sample packet — the Apple
    // truncated-final-packet rule drops the 4 trailing pad samples.
    val golden = valid.toMap.apply("aifcima4")
    val d = Ima4.decode(golden)
    assert(d != null && d.channels == 1 && d.rate == 8000)
    assert(d.samples.length == 60)
    assert(d.samples.toSeq == Seq[Short](259, 258) ++ Seq.fill(58)(259.toShort))
    // triage agrees, header-only: frames from COMM, declared 16-bit
    assert(AudioHeader.parse(golden) == ("audio/aiff", 1, 8000, 16, 60L))
    // stereo: packets alternate L,R per 64-frame group; pred L=128
    // (0x0080), R=-128 (0xFF80), all-zero nibbles at index 0 hold both
    val stereo = hex(
      "464F524D 00000084 41494643" +
        "46564552 00000004 A2805140" +
        "434F4D4D 00000018 0002 00000040 0010 400BFA00000000000000 696D6134 0000" +
        "53534E44 0000004C 00000000 00000000" +
        "0080" + "00" * 32 + "FF80" + "00" * 32)
    val ds = Ima4.decode(stereo)
    assert(ds != null && ds.channels == 2 && ds.samples.length == 128)
    assert(ds.samples.toSeq == Seq.fill(64)(Seq[Short](128, -128)).flatten)
    assert(AudioHeader.parse(stereo) == ("audio/aiff", 2, 8000, 16, 64L))
    // refusals: index seed > 88 (header 0x0159 → idx 89), a COMM depth
    // other than 16 (both decode AND triage), a frame count outside the
    // final packet's range, SSND not packet-aligned — null, never a
    // guess
    def mono(hdr: String, frames: String = "0000003C", bits: String = "0010",
             ssnd: String = "0000002A", body: String = "81" + "00" * 31): Array[Byte] = hex(
      "464F524D 00000062 41494643" +
        "46564552 00000004 A2805140" +
        "434F4D4D 00000018 0001 " + frames + " " + bits +
        " 400BFA00000000000000 696D6134 0000" +
        "53534E44 " + ssnd + " 00000000 00000000" + hdr + body)
    assert(Ima4.decode(mono("0159")) == null)
    assert(Ima4.decode(mono("0103", bits = "000C")) == null)
    assert(AudioHeader.parse(mono("0103", bits = "000C")) == null)
    assert(Ima4.decode(mono("0103", frames = "00000041")) == null) // 65 > 64
    assert(Ima4.decode(mono("0103", frames = "00000000")) == null)
    // triage agrees on the header-available refusals (r17 review: the
    // tag-17/tag-2 invariant — triage never accepts a COMM the decode
    // refuses): zero frames, and channels past Ima4's packet-walk cap
    assert(AudioHeader.parse(mono("0103", frames = "00000000")) == null)
    assert(AudioHeader.parse(hex(
      "464F524D 00000062 41494643" +
        "46564552 00000004 A2805140" +
        "434F4D4D 00000018 0010 0000003C 0010 400BFA00000000000000 696D6134 0000" +
        "53534E44 0000002A 00000000 00000000" + "0103 81" + "00" * 31)) == null)
    assert(Ima4.decode(mono("0103", ssnd = "00000029", body = "81" + "00" * 30)) == null)
    // a NONE-compression AIFC is not ima4's to decode (the PCM path owns
    // it); the ima4 decoder must refuse, triage still accepts it as PCM
    assert(Ima4.decode(hex(
      "464F524D 00000038 41494643" +
        "434F4D4D 00000018 0001 00000002 0010 400BFA00000000000000 4E4F4E45 0000" +
        "53534E44 0000000C 00000000 00000000 00010002")) == null)
    assert(Ima4.decode("not audio".getBytes) == null)
    assert(Ima4.decode(null) == null)
    // shared geometry predicate: whole packet groups, frame count inside
    // the final group
    assert(Ima4.validGeometry(1, 34, 64) && Ima4.validGeometry(2, 136, 128))
    assert(Ima4.validGeometry(1, 68, 65) && !Ima4.validGeometry(1, 68, 64))
    assert(!Ima4.validGeometry(1, 33, 64) && !Ima4.validGeometry(9, 306, 64))
  }

  test("Sun AU triage: fixed-layout encodings parse, unknown-size/odd-offset/alien codecs refuse (r17)") {
    // the exemplar: µ-law (enc 1), 8000 Hz, mono, 4 code bytes at
    // offset 24 → ("audio/basic", 1, 8000, 8, 4 frames)
    assert(AudioHeader.parse(valid.toMap.apply("au")) ==
      ("audio/basic", 1, 8000, 8, 4L))
    def au(off: String = "00000018", size: String = "00000004",
           enc: String = "00000001", rate: String = "00001F40",
           ch: String = "00000001"): Array[Byte] =
      hex("2E736E64 " + off + size + enc + rate + ch + "FF7F0380")
    // s16 BE stereo: 4 data bytes = 1 frame of 2 channels
    assert(AudioHeader.parse(au(enc = "00000003", ch = "00000002")) ==
      ("audio/basic", 2, 8000, 16, 1L))
    // A-law (27 = 0x1B) and float32 (6) have fixed published layouts too
    assert(AudioHeader.parse(au(enc = "0000001B")) ==
      ("audio/basic", 1, 8000, 8, 4L))
    assert(AudioHeader.parse(au(enc = "00000006", size = "00000004")) ==
      ("audio/basic", 1, 8000, 32, 1L))
    // refusals: data offset below the 24-byte header, the 0xFFFFFFFF
    // unknown-size sentinel (a frame count would be a guess), a size not
    // frame-aligned, an alien encoding code, zero channels, torn header
    assert(AudioHeader.parse(au(off = "00000010")) == null)
    assert(AudioHeader.parse(au(size = "FFFFFFFF")) == null)
    assert(AudioHeader.parse(au(enc = "00000003", size = "00000003")) == null)
    assert(AudioHeader.parse(au(enc = "00000008")) == null)
    assert(AudioHeader.parse(au(ch = "00000000")) == null)
    assert(AudioHeader.parse(hex("2E736E64 00000018 0000")) == null)
  }

  test("FLAC frame golden vectors: constant/fixed+Rice/LPC hand-derived bits; CRC check values; misshaped refuse (r17)") {
    import graft.functions.FlacDecode
    // the CRC conventions pinned against PUBLISHED check values (input
    // "123456789"): CRC-8 poly 0x07 init 0 → 0xF4; CRC-16 poly 0x8005
    // init 0 non-reflected (CRC-16/UMTS) → 0xFEE8 — so using these
    // functions to assemble the golden streams below is anchored, not
    // circular
    assert(FlacDecode.crc8("123456789".getBytes, 0, 9) == 0xF4)
    assert(FlacDecode.crc16("123456789".getBytes, 0, 9) == 0xFEE8)
    // one-frame 16-bit mono stream builder: rate 8000 (STREAMINFO code),
    // block size bs via the 8-bit extension, total == bs
    def flacStream(bs: Int, subframe: String): Array[Byte] = {
      val minmax = f"$bs%04x$bs%04x"
      val packed = "01F400F" + f"$bs%09x" // 8000<<44 | ch 1 | bps 16 | total
      val hdrBytes = hex(f"FFF8 60 08 00 ${bs - 1}%02x")
      val c8 = FlacDecode.crc8(hdrBytes, 0, hdrBytes.length)
      val frame = hdrBytes ++ Array(c8.toByte) ++ hex(subframe)
      val c16 = FlacDecode.crc16(frame, 0, frame.length)
      hex("664C6143 80000022" + minmax + "000000 000000" + packed + "00" * 16) ++
        frame ++ Array((c16 >> 8).toByte, (c16 & 0xFF).toByte)
    }
    // CONSTANT: subframe bits 0|000000|0 then one 16-bit value (100)
    val const = flacStream(2, "00 0064")
    val dc = FlacDecode.decode(const)
    assert(dc != null && dc.channels == 1 && dc.rate == 8000)
    assert(dc.samples.toSeq == Seq[Short](100, 100))
    // FIXED order 1 + Rice (hand-derived): type 001001 → byte 0x12,
    // warmup 10 (0x000A), then method 00, partition order 0000, param
    // 0000, residuals +1,−1,+2 → zigzag 2,1,4 → unary 001|01|00001,
    // padded → bytes 00 0A 10. Samples: 10, 11, 10, 12.
    val fixed = flacStream(4, "12 000A 00 0A 10")
    val df = FlacDecode.decode(fixed)
    assert(df != null && df.samples.toSeq == Seq[Short](10, 11, 10, 12))
    // LPC order 1 (hand-derived): type 100000 → 0x40, warmup 5, then
    // precision-1 = 0011, shift 00001, coefficient 0010 (= 2; predict =
    // (2·prev)>>1 = prev), residual method/po/param zeros + r1 = +1 →
    // unary 001, padded → bytes 30 90 00 40. Samples: 5, 6.
    val lpc = flacStream(2, "40 0005 30 90 00 40")
    val dl = FlacDecode.decode(lpc)
    assert(dl != null && dl.samples.toSeq == Seq[Short](5, 6))
    // refusals: a corrupted frame CRC-16, a corrupted header CRC-8, a
    // blocking-strategy/reserved-bit flip, a declared total the frames
    // do not produce, and the metadata-only exemplar (no frames) — all
    // null, never a guess or a crash
    val broken = const.clone(); broken(broken.length - 1) = (broken.last ^ 1).toByte
    assert(FlacDecode.decode(broken) == null)
    val badHdr = const.clone(); badHdr(const.length - 5) = (badHdr(const.length - 5) ^ 1).toByte
    assert(FlacDecode.decode(badHdr) == null)
    val badSync = const.clone(); badSync(42 + 1) = 0xFA.toByte // reserved bit set
    assert(FlacDecode.decode(badSync) == null)
    assert(FlacDecode.decode(valid.toMap.apply("flac")) == null) // STREAMINFO only
    assert(FlacDecode.decode("not audio".getBytes) == null)
    assert(FlacDecode.decode(null) == null)
    // audio triage recognizes the container (r17 review: without this
    // the capstone router never reaches the sample decode) — STREAMINFO
    // fields with their standard meaning: 44100 Hz stereo 16-bit, 44100
    // total frames on the exemplar
    assert(AudioHeader.parse(valid.toMap.apply("flac")) ==
      ("audio/flac", 2, 44100, 16, 44100L))
    assert(AudioHeader.parse(const) == ("audio/flac", 1, 8000, 16, 2L))
    // a ~60-byte blob DECLARING 2^31-1 samples must refuse at the
    // payload-proportional bound (before sizing the output buffer), not
    // OOM: no 60-byte frame walk can produce that many samples
    val absurd = hex("664C6143 80000022 00C000C0 000000 000000" +
      "01F400F" + "07FFFFFF" + "F" + "00" * 16)
    assert(FlacDecode.decode(absurd) == null)
  }

  test("WAVE_FORMAT_EXTENSIBLE golden vectors: GUID/field layout; triage agreement; misshaped refuse (r17)") {
    import graft.functions.WavExtensible
    val golden = valid.toMap.apply("wavx")
    val d = WavExtensible.decode(golden)
    assert(d != null && d.channels == 1 && d.rate == 8000)
    assert(d.nFrames == 2 && d.containerBits == 16)
    assert(d.raw.toSeq == Seq[Byte](0x64, 0x00, 0x9C.toByte, 0xFF.toByte))
    // triage agrees and reports wValidBitsPerSample as the depth
    assert(AudioHeader.parse(golden) == ("audio/wav", 1, 8000, 16, 2L))
    // a float inner tag (3, container 32): STREAMINFO-standard fields so
    // triage ACCEPTS the metadata; decode refuses (outside the integer
    // hash domain — the plain tag-3 precedent)
    val floatx = hex("52494646 40000000 57415645" +
      "666D7420 28000000 FEFF 0100 401F0000 007D0000 0400 2000" +
      "1600 2000 01000000" + "03000000 0000 1000 800000AA00389B71" +
      "64617461 04000000 00000000")
    assert(AudioHeader.parse(floatx) == ("audio/wav", 1, 8000, 32, 1L))
    assert(WavExtensible.decode(floatx) == null)
    // refusals, each a single mutation of the golden file — both the
    // decoder AND triage must refuse (the shared-predicate contract):
    def mut(off: Int, v: Int): Array[Byte] = {
      val m = golden.clone(); m(off) = v.toByte; m
    }
    // GUID suffix last byte off the published base (0x71 -> 0x72)
    assert(WavExtensible.decode(mut(59, 0x72)) == null)
    assert(AudioHeader.parse(mut(59, 0x72)) == null)
    // SubFormat Data1 high half nonzero (tags are u16)
    assert(WavExtensible.decode(mut(46, 0x01)) == null)
    assert(AudioHeader.parse(mut(46, 0x01)) == null)
    // cbSize 21 (< the 22-byte extension)
    assert(WavExtensible.decode(mut(36, 21)) == null)
    assert(AudioHeader.parse(mut(36, 21)) == null)
    // wValidBitsPerSample 17 > the 16-bit container
    assert(WavExtensible.decode(mut(38, 17)) == null)
    assert(AudioHeader.parse(mut(38, 17)) == null)
    // wValidBitsPerSample 0
    assert(WavExtensible.decode(mut(38, 0)) == null)
    assert(AudioHeader.parse(mut(38, 0)) == null)
    // blockAlign 3 disagrees with channels x container bytes
    assert(WavExtensible.decode(mut(32, 3)) == null)
    assert(AudioHeader.parse(mut(32, 3)) == null)
    // an ADPCM inner tag (2): no fixed extensible layout — refuse
    assert(WavExtensible.decode(mut(44, 2)) == null)
    assert(AudioHeader.parse(mut(44, 2)) == null)
    // declared fmt size 39 (< the 40-byte extensible fmt)
    assert(WavExtensible.decode(mut(16, 39)) == null)
    assert(AudioHeader.parse(mut(16, 39)) == null)
    assert(WavExtensible.decode("not audio".getBytes) == null)
    assert(WavExtensible.decode(null) == null)
  }

  test("GIF GCE delay: pending-commit semantics — duplicates overwrite, orphans drop, padding ignored (r16)") {
    import graft.functions.GifFrames
    def frame: String =
      "2C" + "0000 0000 0200 0100" + "80" + "000000 FFFFFF" + "02" + "02 4C01" + "00"
    val hdr = "474946383961" + "0200 0100 00 00 00"
    def gce(cs: Int): String =
      "21F9" + "04" + "00" + f"${cs & 0xFF}%02x${(cs >> 8) & 0xFF}%02x" + "00" + "00"
    // well-formed: one GCE per frame — delays sum (5 + 3 = 8)
    assert(GifFrames.walk(hex(hdr + gce(5) + frame + gce(3) + frame + "3B")) == ((2, 8L)))
    // duplicate/consecutive GCEs before one image: LAST one wins (the
    // spec says a GCE applies to the next graphic block — a later GCE
    // replaces an unconsumed one, it does not stack)
    assert(GifFrames.walk(hex(hdr + gce(100) + gce(7) + frame + "3B")) == ((1, 7L)))
    // trailing orphan GCE with no following image: contributes nothing
    assert(GifFrames.walk(hex(hdr + gce(5) + frame + gce(9) + "3B")) == ((1, 5L)))
    // a delay-shaped value in a NON-FIRST sub-block of a padded GCE is
    // non-conformant noise: only the first sub-block's delay (2) counts
    val padded = "21F9" + "04 00 0200 00" + "04 00 6300 00" + "00"
    assert(GifFrames.walk(hex(hdr + padded + frame + "3B")) == ((1, 2L)))
  }
}
