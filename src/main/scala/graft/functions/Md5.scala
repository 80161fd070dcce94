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

  /** A reset, thread-owned MD5 instance (never share across threads). */
  def digest(): java.security.MessageDigest = tl.get()

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
