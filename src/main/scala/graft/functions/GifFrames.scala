package graft.functions

/** GIF87a/89a block walk (CompuServe GIF89a spec): image-descriptor count
  * and total animation delay, WITHOUT decoder startup — the triage-side
  * half of the animated-GIF video container (r14 verdict #4; the decode
  * half is `graft.operators.Multimodal.AnimatedGif`). The grammar after
  * the header + logical screen descriptor (+ optional global color
  * table) is a flat block sequence:
  *
  *  - 0x21 extension: label byte, then length-prefixed sub-blocks to a
  *    0x00 terminator. A graphic-control extension (label 0xF9) carries
  *    the next frame's delay in centiseconds (u16 LE at sub-block
  *    offset 1).
  *  - 0x2C image descriptor: 9 bytes of geometry + flags (+ optional
  *    local color table), LZW minimum-code byte, then sub-blocks.
  *  - 0x3B trailer: clean end.
  *
  * Anything else, or running off the buffer before the trailer, is a
  * torn/desynced file — refuse with count -1, never a guess (the same
  * contract as every other byte parser here). */
object GifFrames {

  def isGif(b: Array[Byte]): Boolean =
    b != null && b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  /** (image-descriptor count, total GCE delay in centiseconds);
    * (-1, 0) when the bytes are not a GIF or the walk tears.
    *
    * Delay semantics (spec §23: a GCE "applies to the first graphic
    * rendering block to follow"): each GCE's delay is held PENDING and
    * committed only when the next 0x2C image descriptor consumes it —
    * consecutive GCEs overwrite (last-before-the-image wins) and a
    * trailing/orphan GCE with no following image contributes nothing, so
    * a spec-odd file with duplicate or dangling GCEs cannot inflate the
    * total (ADVICE r15: the old walk summed every GCE it saw). The delay
    * is read from the GCE's FIRST sub-block only — the spec fixes the
    * GCE data block at exactly 4 bytes in one sub-block, so a delay-
    * shaped value in a later (padding) sub-block is non-conformant noise
    * and is deliberately ignored (pinned by a MediaFuzz vector). */
  def walk(b: Array[Byte]): (Int, Long) = {
    if (!isGif(b) || b.length < 13) return (-1, 0L)
    var off = 13 // header (6) + logical screen descriptor (7)
    val flags = b(10) & 0xFF
    if ((flags & 0x80) != 0) off += 3 * (1 << ((flags & 7) + 1)) // GCT
    var count = 0
    var delayCs = 0L
    var pendingCs = 0L
    while (off < b.length) {
      (b(off) & 0xFF) match {
        case 0x3B => return (count, delayCs) // trailer: clean end
        case 0x21 =>
          val label = if (off + 1 < b.length) b(off + 1) & 0xFF else -1
          off += 2
          var first = true
          var s = -1
          while (off < b.length && s != 0) {
            s = b(off) & 0xFF
            // GCE data block: [flags, delayLo, delayHi, transparentIdx] —
            // the u16 LE delay (centiseconds) sits at data bytes 1-2,
            // i.e. buffer offsets off+2 / off+3 (off is the length byte)
            if (first && label == 0xF9 && s >= 3 && off + 3 < b.length)
              pendingCs = ((b(off + 2) & 0xFF) | ((b(off + 3) & 0xFF) << 8)).toLong
            first = false
            off += 1 + s
          }
        case 0x2C =>
          if (off + 10 > b.length) return (-1, 0L)
          val lf = b(off + 9) & 0xFF
          off += 10
          if ((lf & 0x80) != 0) off += 3 * (1 << ((lf & 7) + 1)) // LCT
          off += 1 // LZW minimum code size
          count += 1
          delayCs += pendingCs // the descriptor consumes the pending GCE
          pendingCs = 0L
          var s = -1
          while (off < b.length && s != 0) { s = b(off) & 0xFF; off += 1 + s }
        case _ => return (-1, 0L) // unknown block type: desynced
      }
    }
    (-1, 0L) // ran off the buffer without a trailer: torn
  }

  /** Image-descriptor count alone; -1 on refuse. */
  def count(b: Array[Byte]): Int = walk(b)._1
}
