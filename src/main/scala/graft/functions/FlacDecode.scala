package graft.functions

/** FLAC frame decoder (r17) — moves the lossless tier from
  * metadata-only ([[FlacHeader]], qe5l) to REAL sample decode. FLAC's
  * compression is Rice/Golomb-coded prediction residuals over fixed or
  * LPC predictors (xiph.org/flac/format.html): deterministic bit
  * arithmetic with no Huffman tables and no transforms, so unlike the
  * MP3/AAC/H.26x tier it is tractable from scratch, and it completes
  * the audio claim: every non-transform audio format now decodes real
  * samples.
  *
  * Implemented surface — the full frame layer for 16-bit streams:
  * fixed and variable blocking; all block-size and sample-rate codes
  * (incl. the 8/16-bit extensions); UTF-8-style coded numbers;
  * independent 1–8 channels plus all three stereo decorrelations
  * (left/side, right/side, mid/side — side subframes carry the +1
  * bit); subframe types CONSTANT, VERBATIM, FIXED 0–4, and LPC to
  * order 32 (file-supplied precision/shift/coefficients, 64-bit
  * accumulator); wasted-bits unary prefixes; both Rice methods (4- and
  * 5-bit parameters), partition orders 0–15, and the raw-bits escape;
  * CRC-8 on every frame header and CRC-16 on every frame.
  *
  * Refuse-don't-guess, byte-parser discipline: any reserved bit set,
  * reserved/invalid code, CRC mismatch, field disagreeing with
  * STREAMINFO (rate, channel count, 16-bit depth), torn bitstream,
  * partition geometry that does not divide the block, negative LPC
  * shift, or a decoded total different from STREAMINFO's sample count
  * — null, never a guess. Restricted to bits-per-sample 16, the
  * engine's PCM hash domain ([[graft.operators.AudioDedup]]); other
  * depths refuse rather than resample. */
object FlacDecode {

  /** One decoded stream: 16-bit samples, frame-major channel order. */
  final case class Decoded(channels: Int, rate: Int, samples: Array[Short])

  /** MSB-first bit reader; all reads bounds-checked via [[Torn]]. */
  private object Torn extends Exception { override def fillInStackTrace(): Throwable = this }

  private final class BitReader(b: Array[Byte], var bytePos: Int) {
    var bitPos: Int = 0 // 0..7, bit 0 = MSB
    def aligned: Boolean = bitPos == 0
    def bit(): Int = {
      if (bytePos >= b.length) throw Torn
      val v = (b(bytePos) >> (7 - bitPos)) & 1
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; bytePos += 1 }
      v
    }
    /** n ≤ 32 unsigned bits. */
    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def bitsL(n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** n-bit two's-complement signed. */
    def sbits(n: Int): Int = {
      val v = bits(n)
      if (n > 0 && (v & (1 << (n - 1))) != 0) v - (1 << n) else v
    }
    /** FLAC unary: q zero bits then a one → q. */
    def unary(): Int = {
      var q = 0
      while (bit() == 0) { q += 1; if (q > (1 << 24)) throw Torn }
      q
    }
    /** Skip to the next byte boundary; the pad bits must be ZERO. */
    def alignOrRefuse(): Unit = while (bitPos != 0) { if (bit() != 0) throw Torn }
  }

  /** CRC-8, poly 0x07, init 0 (the FLAC frame-header CRC). */
  def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0; var i = from
    while (i < until) {
      crc ^= b(i) & 0xFF
      var k = 0
      while (k < 8) { crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xFF else (crc << 1) & 0xFF; k += 1 }
      i += 1
    }
    crc
  }

  /** CRC-16, poly 0x8005, init 0 (the FLAC frame CRC). */
  def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0; var i = from
    while (i < until) {
      crc ^= (b(i) & 0xFF) << 8
      var k = 0
      while (k < 8) { crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xFFFF else (crc << 1) & 0xFFFF; k += 1 }
      i += 1
    }
    crc
  }

  private val RateTable = Array(-1, 88200, 176400, 192000, 8000, 16000,
    22050, 24000, 32000, 44100, 48000, 96000) // codes 1..11; 0 = STREAMINFO

  /** Decode a whole FLAC payload; null unless well-formed 16-bit. */
  def decode(b: Array[Byte]): Decoded = {
    val info = FlacHeader.parse(b)
    if (info == null) return null
    val (rate, channels, bps, total, _) = info
    if (bps != 16 || channels < 1 || channels > 8) return null
    if (total > (Int.MaxValue / channels).toLong) return null
    // the output buffer is sized from the HEADER-declared total, so bound
    // it by what the payload could possibly encode before allocating: the
    // densest legal FLAC frame (one CONSTANT subframe, max block size
    // 65536) spends ≥ 11 bytes for 65536 per-channel samples ≈ 5958
    // samples/byte — a declared total past 8192·|payload| is unreachable
    // by any frame walk, so a ~50-byte blob claiming 2³¹ samples refuses
    // here instead of allocating 4 GiB first
    if (total > b.length.toLong * 8192L) return null
    // walk the metadata blocks to the first frame byte — advance in
    // Long space: near Int.MaxValue, off + 4 + len wraps negative and
    // both bounds guards pass (the parseWav/parseAiff/Ima4 rule)
    var off = 4
    var last = false
    while (!last) {
      if (off + 4 > b.length) return null
      last = (b(off) & 0x80) != 0
      val len = ((b(off + 1) & 0xFF) << 16) | ((b(off + 2) & 0xFF) << 8) | (b(off + 3) & 0xFF)
      val next = off.toLong + 4L + len
      if (next > b.length) return null
      off = next.toInt
    }
    val out = new Array[Short](total.toInt * channels)
    var written = 0L // decoded frames so far
    // channel buffers hoisted out of the frame loop (the r16 per-record
    // hot-path discipline the sibling decoders follow): sized on first
    // use, regrown only when a later frame's block is larger
    var chBuf: Array[Array[Int]] = null
    try {
      while (off < b.length) {
        val frameStart = off
        val r = new BitReader(b, off)
        // sync (14) + reserved(1)=0 + blocking strategy(1)
        if (r.bits(8) != 0xFF) return null
        val b1 = r.bits(8)
        if ((b1 & 0xFC) != 0xF8 || (b1 & 0x02) != 0) return null
        val bsCode = r.bits(4)
        val srCode = r.bits(4)
        val chCode = r.bits(4)
        val ssCode = r.bits(3)
        if (r.bit() != 0) return null // reserved
        // UTF-8-style coded number (frame or sample index): validate shape
        val lead = r.bits(8)
        val extra =
          if ((lead & 0x80) == 0) 0
          else if ((lead & 0xE0) == 0xC0) 1
          else if ((lead & 0xF0) == 0xE0) 2
          else if ((lead & 0xF8) == 0xF0) 3
          else if ((lead & 0xFC) == 0xF8) 4
          else if ((lead & 0xFE) == 0xFC) 5
          else if (lead == 0xFE) 6
          else return null
        var i = 0
        while (i < extra) {
          if ((r.bits(8) & 0xC0) != 0x80) return null
          i += 1
        }
        val blockSize = bsCode match {
          case 0 => return null // reserved
          case 1 => 192
          case n if n >= 2 && n <= 5 => 576 << (n - 2)
          case 6 => r.bits(8) + 1
          case 7 => r.bits(16) + 1
          case n => 256 << (n - 8)
        }
        val frameRate = srCode match {
          case 0 => rate
          case 12 => r.bits(8) * 1000
          case 13 => r.bits(16)
          case 14 => r.bits(16) * 10
          case 15 => return null // invalid
          case n => RateTable(n)
        }
        if (frameRate != rate) return null // disagrees with STREAMINFO
        val frameBps = ssCode match {
          case 0 => bps
          case 1 => 8
          case 2 => 12
          case 4 => 16
          case 5 => 20
          case 6 => 24
          case 7 => 32
          case _ => return null // reserved
        }
        if (frameBps != 16) return null
        val (nCh, stereoMode) = chCode match {
          case n if n <= 7 => (n + 1, -1)
          case 8 => (2, 0) // left/side
          case 9 => (2, 1) // right/side
          case 10 => (2, 2) // mid/side
          case _ => return null // reserved
        }
        if (nCh != channels) return null
        // header CRC-8: covers sync through the extension fields — the
        // reader is byte-aligned here, so the range ends at its bytePos
        if (!r.aligned) return null
        if (r.bits(8) != crc8(b, frameStart, r.bytePos - 1)) return null
        // subframes (nCh == channels on every frame — checked above)
        if (chBuf == null || chBuf(0).length < blockSize)
          chBuf = Array.ofDim[Int](nCh, blockSize)
        var c = 0
        while (c < nCh) {
          // side channel carries one extra bit in L/S (ch1), R/S (ch0), M/S (ch1)
          val sideBit = stereoMode match {
            case 0 if c == 1 => 1
            case 1 if c == 0 => 1
            case 2 if c == 1 => 1
            case _ => 0
          }
          decodeSubframe(r, chBuf(c), blockSize, 16 + sideBit)
          c += 1
        }
        r.alignOrRefuse()
        val crcPos = r.bytePos
        if (r.bits(16) != crc16(b, frameStart, crcPos)) return null
        off = r.bytePos
        // stereo decorrelation
        if (stereoMode >= 0) {
          val a = chBuf(0); val s = chBuf(1)
          var k = 0
          while (k < blockSize) {
            stereoMode match {
              case 0 => s(k) = a(k) - s(k) // subframes L, S → R = L − S
              case 1 => a(k) = s(k) + a(k) // subframes S, R → L = R + S
              case 2 => // subframes M, S: mid lost side's low bit — restore
                val mid2 = (a(k) << 1) | (s(k) & 1)
                val side = s(k)
                a(k) = (mid2 + side) >> 1
                s(k) = (mid2 - side) >> 1
            }
            k += 1
          }
        }
        // emit frame-major; total is authoritative (the last frame may
        // not be full only if it completes the stream exactly)
        if (written + blockSize > total) return null
        var k = 0
        while (k < blockSize) {
          var c2 = 0
          while (c2 < nCh) {
            val v = chBuf(c2)(k)
            if (v < -32768 || v > 32767) return null // corrupt prediction
            out((written.toInt + k) * nCh + c2) = v.toShort
            c2 += 1
          }
          k += 1
        }
        written += blockSize
      }
    } catch { case Torn => return null }
    if (written != total) return null
    Decoded(channels, rate, out)
  }

  /** One subframe into `dst` (blockSize samples at `bps` effective bits). */
  private def decodeSubframe(r: BitReader, dst: Array[Int], blockSize: Int,
                             bps: Int): Unit = {
    if (r.bit() != 0) throw Torn // reserved pad bit
    val tpe = r.bits(6)
    val wasted = if (r.bit() == 1) r.unary() + 1 else 0
    val eff = bps - wasted
    if (eff <= 0 || eff > 32) throw Torn
    tpe match {
      case 0 => // CONSTANT
        val v = r.sbits(eff)
        java.util.Arrays.fill(dst, v)
      case 1 => // VERBATIM
        var i = 0
        while (i < blockSize) { dst(i) = r.sbits(eff); i += 1 }
      case t if t >= 8 && t <= 12 => // FIXED, order 0-4
        val order = t & 7
        if (order > blockSize) throw Torn
        var i = 0
        while (i < order) { dst(i) = r.sbits(eff); i += 1 }
        residual(r, dst, blockSize, order)
        i = order
        while (i < blockSize) {
          dst(i) += (order match {
            case 0 => 0
            case 1 => dst(i - 1)
            case 2 => 2 * dst(i - 1) - dst(i - 2)
            case 3 => 3 * dst(i - 1) - 3 * dst(i - 2) + dst(i - 3)
            case _ => 4 * dst(i - 1) - 6 * dst(i - 2) + 4 * dst(i - 3) - dst(i - 4)
          })
          i += 1
        }
      case t if t >= 32 => // LPC, order 1-32
        val order = (t & 31) + 1
        if (order > blockSize) throw Torn
        var i = 0
        while (i < order) { dst(i) = r.sbits(eff); i += 1 }
        val precM1 = r.bits(4)
        if (precM1 == 15) throw Torn // invalid per spec
        val precision = precM1 + 1
        val shift = r.sbits(5)
        if (shift < 0) throw Torn // negative shift is invalid
        val coef = new Array[Int](order)
        i = 0
        while (i < order) { coef(i) = r.sbits(precision); i += 1 }
        residual(r, dst, blockSize, order)
        i = order
        while (i < blockSize) {
          var acc = 0L
          var j = 0
          while (j < order) { acc += coef(j).toLong * dst(i - 1 - j); j += 1 }
          dst(i) += (acc >> shift).toInt
          i += 1
        }
      case _ => throw Torn // reserved subframe types
    }
    if (wasted > 0) {
      var i = 0
      while (i < blockSize) { dst(i) = dst(i) << wasted; i += 1 }
    }
  }

  /** Rice-coded residual into dst(order until blockSize). */
  private def residual(r: BitReader, dst: Array[Int], blockSize: Int,
                       order: Int): Unit = {
    val method = r.bits(2)
    if (method > 1) throw Torn // reserved
    val paramBits = if (method == 0) 4 else 5
    val escape = (1 << paramBits) - 1
    val po = r.bits(4)
    val partitions = 1 << po
    if (blockSize % partitions != 0) throw Torn
    val perPart = blockSize >> po
    // the FIRST partition holds perPart − order samples (the warmup
    // samples were stored verbatim) — a geometry where that is negative
    // cannot be walked
    if (perPart < order) throw Torn
    var idx = order
    var p = 0
    while (p < partitions) {
      val count = if (p == 0) perPart - order else perPart
      val param = r.bits(paramBits)
      if (param == escape) {
        val raw = r.bits(5)
        var i = 0
        while (i < count) { dst(idx) = if (raw == 0) 0 else r.sbits(raw); idx += 1; i += 1 }
      } else {
        var i = 0
        while (i < count) {
          val q = r.unary()
          val u = (q.toLong << param) | r.bitsL(param)
          val v = ((u >>> 1) ^ -(u & 1L)).toInt // zigzag⁻¹
          dst(idx) = v
          idx += 1
          i += 1
        }
      }
      p += 1
    }
  }
}
