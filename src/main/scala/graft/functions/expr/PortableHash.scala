package graft.functions.expr

/** md5-derived 32-bit hash words — the JVM twin of the repo's
  * cross-engine hashing convention ([[graft.operators.Sampling.md5Bucket]]:
  * `conv(substring(md5(x), 1, 8), 16, 10)`), recomputable in any engine
  * with an md5() function (DuckDB:
  * `CAST(('0x' || substr(md5(x), 1, 8)) AS BIGINT)`).
  *
  * The sketch/LSH operators hash through here instead of xxhash64 so
  * their signatures are auditable by other engines — the same
  * portability trade the CMS sketch ([[graft.operators.Sketches]]),
  * DSIR buckets, and the sampling family already made. md5 is ~5-10×
  * the per-call cost of xxhash64; for the one-pass signature scans that
  * use it the cost is bounded (one digest per token/shingle) and buys a
  * bit-for-bit DuckDB oracle for every hash-derived result.
  */
object PortableHash {
  private val tlDigest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 4 md5 digest bytes, big-endian, as an unsigned 32-bit value
    * in a long — exactly `conv(substring(md5(x), 1, 8), 16, 10)`. */
  def md5_32(bytes: Array[Byte]): Long = {
    val d = digest(bytes)
    word32(d, 0)
  }

  def md5_32(s: String): Long =
    md5_32(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** md5_32 of `prefix ++ suffix` WITHOUT concatenating the arrays —
    * streams both through the digest, so hashing a large payload under
    * many per-component suffixes costs zero payload copies (the
    * FakeCodec.embed hot path). */
  def md5_32(prefix: Array[Byte], suffix: Array[Byte]): Long = {
    val md = tlDigest.get()
    md.reset()
    md.update(prefix)
    md.update(suffix)
    word32(md.digest(), 0)
  }

  /** Digest bytes [4o, 4o+4) big-endian as an unsigned 32-bit word —
    * word32(d, 1) is `conv(substring(md5(x), 9, 8), 16, 10)` etc. */
  def word32(digest: Array[Byte], o: Int): Long =
    ((digest(4 * o) & 0xffL) << 24) | ((digest(4 * o + 1) & 0xffL) << 16) |
      ((digest(4 * o + 2) & 0xffL) << 8) | (digest(4 * o + 3) & 0xffL)

  def digest(bytes: Array[Byte]): Array[Byte] = {
    val md = tlDigest.get()
    md.reset()
    md.digest(bytes)
  }

  def digest(s: String): Array[Byte] =
    digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** First 8 md5 digest bytes big-endian as one 64-bit word: the high
    * 32 bits are hex chars 1-8, the low 32 bits hex chars 9-16 — an
    * engine without 64-bit unsigned literals recomputes the two halves
    * separately. */
  def md5_64(bytes: Array[Byte]): Long = {
    val d = digest(bytes)
    (word32(d, 0) << 32) | word32(d, 1)
  }

  def md5_64(s: String): Long =
    md5_64(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
}
