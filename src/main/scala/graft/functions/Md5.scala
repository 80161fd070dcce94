package graft.functions

/** MD5 + hex helpers for the media content-hash kernels (r18, guide §1.2
  * per-task work). Two per-clip costs hoisted out of the hot loops:
  *
  *  - `MessageDigest.getInstance` walks the JCA provider list per call;
  *    digests are cheap to RESET but not to look up, so each task thread
  *    reuses one instance (digest() leaves it reset — the JCA contract).
  *  - `"%02x".format(b)` builds a java.util.Formatter and parses the
  *    format string PER BYTE (16 allocations per 128-bit hash); the
  *    table-driven encoder below emits the identical lowercase hex.
  */
object Md5 {

  private val tl = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** A reset, thread-owned MD5 instance (never share across threads).
    * reset() makes the contract hold even when a PREVIOUS caller threw
    * between update() and digest() and left partial state behind —
    * without it one swallowed decode exception would silently poison
    * every later hash on that executor thread (review r18); it is a
    * no-op on an already-reset digest. */
  def digest(): java.security.MessageDigest = {
    val md = tl.get()
    md.reset()
    md
  }

  private val hexChars = "0123456789abcdef".toCharArray

  /** Lowercase hex of `bytes` — byte-identical to
    * `bytes.map("%02x".format(_)).mkString`. */
  def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xFF
      out(2 * i) = hexChars(b >>> 4)
      out(2 * i + 1) = hexChars(b & 0xF)
      i += 1
    }
    new String(out)
  }
}
