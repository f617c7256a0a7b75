package graft.kmers

/** 2-bit DNA encoding kernel (executor-local, no Spark).
  *
  * Encoding A=0, C=1, G=2, T/U=3 — chosen so that complement = XOR with 3
  * (behavioral spec from the reference: kmers/util/BitRepresentation.scala:31-38).
  * m-mers (m <= 32) are packed right-aligned into a single Long: the last
  * nucleotide occupies the lowest 2 bits. Priorities are compared unsigned.
  */
object Dna {

  val A = 0L; val C = 1L; val G = 2L; val T = 3L

  /** char -> 2-bit code, or -1 for ambiguous/invalid characters. */
  private val codes: Array[Byte] = {
    val t = Array.fill[Byte](128)(-1)
    t('a') = 0; t('A') = 0
    t('c') = 1; t('C') = 1
    t('g') = 2; t('G') = 2
    t('t') = 3; t('T') = 3
    t('u') = 3; t('U') = 3
    t
  }

  private val chars = Array('A', 'C', 'G', 'T')

  @inline def code(ch: Char): Int = if (ch < 128) codes(ch) else -1

  @inline def isValid(ch: Char): Boolean = code(ch) >= 0

  /** Decode a right-aligned packed m-mer to a string (debug/reporting). */
  def decode(mer: Long, m: Int): String = {
    val sb = new java.lang.StringBuilder(m)
    var i = m - 1
    while (i >= 0) {
      sb.append(chars(((mer >>> (2 * i)) & 3L).toInt))
      i -= 1
    }
    sb.toString
  }

  /** Encode an ACGT-only string as a right-aligned packed m-mer (m <= 32). */
  def encode(s: CharSequence): Long = {
    var r = 0L
    var i = 0
    while (i < s.length) {
      r = (r << 2) | code(s.charAt(i))
      i += 1
    }
    r
  }

  /** All-ones mask over the low 2m bits. */
  @inline def merMask(m: Int): Long =
    if (m >= 32) -1L else (1L << (2 * m)) - 1

  /** Reverse complement of a packed m-mer.
    * Complement = XOR all-ones; reverse = swap 2-bit groups end-to-end. */
  def reverseComplement(mer: Long, m: Int): Long = {
    var x = ~mer
    // swap adjacent 2-bit groups, then nibbles, bytes, shorts, ints
    x = ((x & 0x3333333333333333L) << 2) | ((x >>> 2) & 0x3333333333333333L)
    x = ((x & 0x0f0f0f0f0f0f0f0fL) << 4) | ((x >>> 4) & 0x0f0f0f0f0f0f0f0fL)
    x = ((x & 0x00ff00ff00ff00ffL) << 8) | ((x >>> 8) & 0x00ff00ff00ff00ffL)
    x = ((x & 0x0000ffff0000ffffL) << 16) | ((x >>> 16) & 0x0000ffff0000ffffL)
    x = (x << 32) | (x >>> 32)
    // after full 64-bit reversal the mer sits in the high bits; realign
    x >>> (64 - 2 * m)
  }

  /** Canonical form: unsigned-min of the mer and its reverse complement. */
  @inline def canonical(mer: Long, m: Int): Long = {
    val rc = reverseComplement(mer, m)
    if (java.lang.Long.compareUnsigned(mer, rc) <= 0) mer else rc
  }

  /** Pack an ACGT/U-only segment at 2 bits/base, 4 bases/byte, big-endian
    * within each byte (behavioral spec: reference kmers/util/NTBitArray
    * .scala:194-203 — the library payload representation that shuffles at
    * 1/4 the bytes of UTF-8 text and 1/8 of in-memory UTF-16). Ambiguous
    * characters must be split out first (see SupermerScanner.splitByAmbiguity). */
  def pack2bit(s: CharSequence): Array[Byte] = {
    val n = s.length
    val out = new Array[Byte]((n + 3) / 4)
    var i = 0
    while (i < n) {
      val c = code(s.charAt(i))
      require(c >= 0, s"cannot 2-bit pack ambiguous base '${s.charAt(i)}'")
      out(i >> 2) = (out(i >> 2) | (c << ((3 - (i & 3)) << 1))).toByte
      i += 1
    }
    out
  }

  /** Zero-copy CharSequence view over a 2-bit packed segment: the scanner
    * kernels consume CharSequence, so packed payloads never materialize an
    * unpacked string on the executor. */
  final class Packed(bytes: Array[Byte], val length: Int) extends CharSequence {
    @inline override def charAt(i: Int): Char =
      Dna.chars((bytes(i >> 2) >> ((3 - (i & 3)) << 1)) & 3)
    override def subSequence(start: Int, end: Int): CharSequence =
      new java.lang.StringBuilder(end - start).append(this, start, end)
    override def toString: String =
      new java.lang.StringBuilder(length).append(this, 0, length).toString
  }

  /** Reverse complement of a string (for RC-augmented inputs / tests). */
  def reverseComplement(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = s.length - 1
    while (i >= 0) {
      val c = code(s.charAt(i))
      sb.append(if (c >= 0) chars(3 - c) else s.charAt(i))
      i -= 1
    }
    sb.toString
  }
}
