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

  /** `k` Kirsch–Mitzenmacher hashes from ONE MD5 digest:
    * `h_i = (lower60 + i·upper60) mod 2^60` (KM, CACM 2008 — two base
    * hashes simulate any number of independent ones with no loss for
    * sketching). One digest per shingle replaces the per-seed digest
    * family — at 100 TB the digest is the MinHash bottleneck, so this is
    * a k× cut in hash CPU. `lower60 + 7·upper60 ≤ 8·(2^60−1) < 2^63−1`,
    * so the sum never overflows a signed long and the DuckDB oracle's
    * BIGINT arithmetic reproduces every value exactly.
    */
  def md5Km(s: UTF8String, k: Int): Array[Long] = {
    val md = mdPool.get()
    md.reset()
    val digest = md.digest(s.getBytes)
    var lo = 0L
    var hi = 0L
    var j = 7
    while (j >= 0) {
      lo = (lo << 8) | (digest(8 + j) & 0xffL)
      hi = (hi << 8) | (digest(j) & 0xffL)
      j -= 1
    }
    lo &= MASK60
    hi &= MASK60
    val out = new Array[Long](k)
    var i = 0
    while (i < k) { out(i) = (lo + i * hi) & MASK60; i += 1 }
    out
  }
}
