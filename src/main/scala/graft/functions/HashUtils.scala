package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Row-level hash helpers callable from generated code (Scala object →
  * static forwarders on the class).
  */
object HashUtils {

  private val mdPool =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  private val MASK60 = (1L << 60) - 1

  /** 60-bit integer from half of an MD5 digest, little-endian — the exact
    * value of DuckDB's `md5_number_lower/upper(s) % 2^60`, so the SQL
    * oracle reproduces it without hex-string parsing.
    */
  def md5Long60(s: UTF8String, upperHalf: Boolean): Long = {
    val md = mdPool.get()
    md.reset()
    val digest = md.digest(s.getBytes)
    val off = if (upperHalf) 0 else 8
    var v = 0L
    var k = 7
    while (k >= 0) { v = (v << 8) | (digest(off + k) & 0xffL); k -= 1 }
    v & MASK60
  }

  /** `md5Long60(prefix || s)` without materializing the concatenation —
    * the seed prefix streams into the digest directly, saving one
    * UTF8String allocation per (seed, shingle) in the MinHash hot loop.
    */
  def md5Long60p(prefix: Array[Byte], s: UTF8String, upperHalf: Boolean): Long = {
    val md = mdPool.get()
    md.reset()
    md.update(prefix)
    md.update(s.getBytes)
    val digest = md.digest()
    val off = if (upperHalf) 0 else 8
    var v = 0L
    var k = 7
    while (k >= 0) { v = (v << 8) | (digest(off + k) & 0xffL); k -= 1 }
    v & MASK60
  }
}
