package graft.index

/** Stable hash functions shared by build-time (inside Spark expressions/UDFs)
  * and query-time (driver-side routing). Everything here must be a pure
  * function of values — never of partition layout — so that index builds at
  * different parallelism levels (N vs 4N executors) produce byte-identical
  * routing (BASELINE.json north_rule determinism requirement).
  */
object Hashing {

  /** splitmix64 finalizer — used to spread docIds over salt shards. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** FNV-1a 64-bit over a string — term routing hash. */
  def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Salt shard of a document within a term salted `numSalts` ways.
    * numSalts MUST be a power of two: shards of a term with fewer salts are
    * then exact unions of shards of a term with more salts, which is what
    * lets a WAND task own a doc subset consistently across terms.
    */
  def saltOf(docId: Long, numSalts: Int): Int =
    (mix64(docId) & (numSalts - 1)).toInt

  /** Physical bucket (directory partition) of a (term, salt) posting shard.
    * Salt participates so a hot term's shards spread over buckets/executors.
    */
  def bucketOf(term: String, salt: Int, numBuckets: Int): Int =
    java.lang.Math.floorMod(mix64(fnv64(term) + salt * 0x9e3779b97f4a7c15L), numBuckets.toLong).toInt

  /** Smallest power of two >= ceil(df / threshold), capped. */
  def numSaltsFor(df: Long, saltThreshold: Long, maxSalts: Int): Int = {
    if (df <= saltThreshold) return 1
    val needed = ((df + saltThreshold - 1) / saltThreshold).toInt
    var p = 1
    while (p < needed && p < maxSalts) p <<= 1
    math.min(p, maxSalts)
  }
}
