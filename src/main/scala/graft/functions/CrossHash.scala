package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Hash kernels shared by the dedup operators AND their cross-engine
  * (DuckDB) oracles. The base hash is the lower 64 bits of md5 — chosen
  * because both engines can compute it bit-identically: DuckDB's
  * `md5_number_lower(s)` is the little-endian uint64 of digest bytes 8..15
  * (verified empirically against java.security MD5), so a SQL oracle can
  * replay the exact candidate generation of MinHash-LSH / SimHash instead
  * of trusting the Spark side blindly.
  */
object CrossHash {

  private val mdLocal = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** Bit-compatible with DuckDB `md5_number_lower`: little-endian uint64 of
    * md5 digest bytes 8..15, as the same 64 bits in a signed Long.
    */
  def md5Lower64(s: String): Long = {
    val md = mdLocal.get()
    md.reset()
    val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
    var h = 0L
    var i = 15
    while (i >= 8) { h = (h << 8) | (d(i) & 0xffL); i -= 1 }
    h
  }

  /** splitmix64 — derives the per-function constants of the minhash family
    * (embedded as literals in the SQL oracle too).
    */
  def splitmix64(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Strongly-universal derived hash: split the 64-bit base into 32-bit
    * halves and combine with two per-i constants, mod 2^64. The 32x64-bit
    * products fit DuckDB's HUGEINT (int128) — a full 64x64 multiply would
    * not — which is what makes the family SQL-replayable.
    */
  def derive(base: Long, a: Long, b: Long): Long =
    (base >>> 32) * a + (base & 0xffffffffL) * b

  /** (A_i, B_i) constant pairs for `numHashes` derived functions. */
  def deriveConstants(numHashes: Int, seed: Long): Array[(Long, Long)] =
    Array.tabulate(numHashes) { i =>
      (splitmix64(seed * 2654435761L + 2L * i),
        splitmix64(seed * 2654435761L + 2L * i + 1L))
    }

  /** Unsigned decimal rendering — how a Java Long's bits read as a DuckDB
    * UBIGINT literal.
    */
  def ubig(x: Long): String = java.lang.Long.toUnsignedString(x)
}
