package graft.plans

/** The ONE home of the md5-derived primitives the native expressions
  * share: the thread-local digest instance (getInstance per row
  * measurably costs on the 10^6-digest hot paths), the hex renderer
  * (byte order == hex lexicographic order), and the HLL register
  * derivation (bucket = first digest byte, rho = 1 + leading zero bits
  * of the 40-bit tail, capped 41) that [[HllAgg]] and [[HllReg]] must
  * keep bit-identical — one copy, so a layout tune cannot silently
  * diverge the imperative and declarative sketch paths.
  */
private[plans] object Md5Util {

  val local: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  def digest(bytes: Array[Byte]): Array[Byte] = {
    val md = local.get()
    md.reset()
    md.digest(bytes)
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  def hexString(b: Array[Byte]): String = {
    val out = new Array[Char](b.length * 2)
    var i = 0
    while (i < b.length) {
      out(2 * i) = hexDigits((b(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(b(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** (bucket << 8) | rho from a 16-byte md5 digest — the m=256 HLL
    * register coordinates (hex-derivation-equivalent; see [[HllReg]]).
    */
  def bucketRho(d: Array[Byte]): Int = {
    val bucket = d(0) & 0xff
    var tail = 0L
    var i = 1
    while (i <= 5) { tail = (tail << 8) | (d(i) & 0xffL); i += 1 }
    val rho =
      if (tail == 0L) 41
      else java.lang.Long.numberOfLeadingZeros(tail) - 24 + 1
    (bucket << 8) | rho
  }
}
