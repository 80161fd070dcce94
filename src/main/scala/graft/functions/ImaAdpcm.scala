package graft.functions

/** IMA/DVI ADPCM WAV decoder (format tag 17) — the engine's first
  * PREDICTIVE-bitstream sample decode: the stock JDK's WaveFileReader
  * refuses ADPCM containers outright (probed r16), so unlike the G.711
  * route ([[graft.operators.AudioDedup]] via javax.sound) this decode is
  * a from-scratch implementation of the published IMA algorithm (IMA
  * Digital Audio Technical Working Group, 1992; the WAVE DVI/IMA layout
  * from Microsoft's multimedia registration): per block and channel a
  * 4-byte header seeds the predictor (which IS the block's first output
  * sample) and the step index, then 4-bit nibbles (low nibble first,
  * stereo interleaved in 4-byte groups per channel) each step the
  * predictor by a table-driven delta.
  *
  * Refuse-don't-guess, like every byte parser here: anything torn,
  * inconsistent (blockAlign vs samplesPerBlock, index seed > 88,
  * dataSize not block-aligned), or not a tag-17 WAV decodes to null.
  * Decoded output is 16-bit signed PCM, frame-major interleaved — the
  * exact stream a PCM spelling of the same recording stores, so the
  * sample-hash collapse is by construction (qe71c).
  */
object ImaAdpcm {

  private val IndexTable = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  private val StepTable = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  /** One decoded clip: 16-bit samples, frame-major channel order. */
  final case class Decoded(channels: Int, rate: Int, samples: Array[Short])

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    le16(b, i) | (le16(b, i + 2) << 16)
  private def fourcc(b: Array[Byte], i: Int, s: String): Boolean =
    i + 4 <= b.length && b(i) == s(0) && b(i + 1) == s(1) &&
      b(i + 2) == s(2) && b(i + 3) == s(3)

  /** Mutable per-channel decode state — the ONE place the IMA step
    * arithmetic lives (shared by the block-header seed and the nibble
    * loop). */
  private final class Ch(var pred: Int, var idx: Int) {
    def step(nibble: Int): Short = {
      val st = StepTable(idx)
      var diff = st >> 3
      if ((nibble & 1) != 0) diff += st >> 2
      if ((nibble & 2) != 0) diff += st >> 1
      if ((nibble & 4) != 0) diff += st
      pred = if ((nibble & 8) != 0) pred - diff else pred + diff
      if (pred > 32767) pred = 32767
      if (pred < -32768) pred = -32768
      idx += IndexTable(nibble & 7)
      if (idx < 0) idx = 0
      if (idx > 88) idx = 88
      pred.toShort
    }
  }

  /** Decode a tag-17 WAV payload; null unless it is a well-formed IMA
    * ADPCM container. */
  def decode(b: Array[Byte]): Decoded = {
    if (b == null || b.length < 12 || !fourcc(b, 0, "RIFF") ||
      !fourcc(b, 8, "WAVE")) return null
    var off = 12
    var ch = -1; var rate = -1; var blockAlign = -1; var spb = -1
    var dataOff = -1; var dataLen = -1
    while (off + 8 <= b.length && (dataOff < 0 || ch < 0)) {
      val size = le32(b, off + 4) & 0xFFFFFFFFL
      if (fourcc(b, off, "fmt ")) {
        // tag-17 fmt must carry cbSize >= 2 with samplesPerBlock: 20 bytes
        if (size < 20 || off + 8 + 20 > b.length) return null
        if (le16(b, off + 8) != 17) return null
        ch = le16(b, off + 10)
        rate = le32(b, off + 12)
        blockAlign = le16(b, off + 20)
        val bits = le16(b, off + 22)
        val cb = le16(b, off + 24)
        if (bits != 4 || cb < 2) return null
        spb = le16(b, off + 26)
      } else if (fourcc(b, off, "data")) {
        dataOff = off + 8
        if (size > Int.MaxValue || dataOff + size > b.length) return null
        dataLen = size.toInt
      }
      val next = off.toLong + 8L + size + (size & 1L)
      off = if (next > b.length) b.length else next.toInt
    }
    if (ch <= 0 || ch > 2 || rate <= 0 || blockAlign <= 0 || spb <= 0 ||
      dataOff < 0) return null
    // layout consistency: a block is 4 header bytes per channel plus
    // 4-byte nibble groups per channel; samplesPerBlock = header sample
    // + 8 per group
    val dataBytes = blockAlign - 4 * ch
    if (dataBytes < 0 || dataBytes % (4 * ch) != 0) return null
    if (spb != 1 + (dataBytes / ch) * 2) return null
    if (dataLen % blockAlign != 0) return null // torn final block
    val nBlocks = dataLen / blockAlign
    val out = new Array[Short](nBlocks * spb * ch)
    var w = 0
    var blk = 0
    while (blk < nBlocks) {
      val base = dataOff + blk * blockAlign
      val chans = new Array[Ch](ch)
      var c = 0
      while (c < ch) {
        val h = base + 4 * c
        val pred = le16(b, h).toShort.toInt // s16: the block's first sample
        val idx = b(h + 2) & 0xFF
        if (idx > 88 || b(h + 3) != 0) return null // spec: reserved byte 0
        chans(c) = new Ch(pred, idx)
        out(w) = pred.toShort
        w += 1
        c += 1
      }
      // data: 4-byte groups per channel, channels alternating; each
      // group holds 8 nibbles (low first) = 8 samples of that channel.
      // Decode group-by-group, writing frame-major output.
      val groupsPerCh = dataBytes / (4 * ch)
      var g = 0
      while (g < groupsPerCh) {
        // decode this group for every channel first, then interleave
        val dec = Array.ofDim[Short](ch, 8)
        var c2 = 0
        while (c2 < ch) {
          val gOff = base + 4 * ch + (g * ch + c2) * 4
          var k = 0
          while (k < 4) {
            val byte = b(gOff + k) & 0xFF
            dec(c2)(2 * k) = chans(c2).step(byte & 0x0F)
            dec(c2)(2 * k + 1) = chans(c2).step(byte >> 4)
            k += 1
          }
          c2 += 1
        }
        var s = 0
        while (s < 8) {
          var c3 = 0
          while (c3 < ch) { out(w) = dec(c3)(s); w += 1; c3 += 1 }
          s += 1
        }
        g += 1
      }
      blk += 1
    }
    Decoded(ch, rate, out)
  }

  /** True when the bytes sniff as a tag-17 WAV (cheap, header-only) —
    * the router check before paying [[decode]]. */
  def isImaAdpcmWav(b: Array[Byte]): Boolean = {
    if (b == null || b.length < 12 || !fourcc(b, 0, "RIFF") ||
      !fourcc(b, 8, "WAVE")) return false
    var off = 12
    while (off + 8 <= b.length) {
      val size = le32(b, off + 4) & 0xFFFFFFFFL
      if (fourcc(b, off, "fmt "))
        return size >= 16 && off + 10 <= b.length && le16(b, off + 8) == 17
      val next = off.toLong + 8L + size + (size & 1L)
      off = if (next > b.length) b.length else next.toInt
    }
    false
  }
}
