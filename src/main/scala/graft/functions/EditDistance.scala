package graft.functions

/** Edit-distance kernels.
  *
  * Two variants are needed for reference parity:
  *  - `osa`: optimal-string-alignment (Damerau with adjacent transposition,
  *    no substring reuse) with early exit — the semantics of ES/Lucene fuzzy
  *    term expansion (`fuzzy_transpositions: true` default) used by the
  *    match-query path (reference query shape:
  *    ner_v2/detectors/textual/queries.py:89-99).
  *  - `weighted`: plain Levenshtein with configurable substitution cost
  *    (default 2) and max-distance early exit — the reference's client-side
  *    matcher (lib/nlp/text_normalization.py:18-64,
  *    `edit_distance(... substitution_cost=2, max_distance=...)`).
  */
object EditDistance {

  /** OSA distance with cutoff: returns a value > maxDist (not exact) as soon
    * as the distance provably exceeds `maxDist` — banded evaluation keeps
    * this O(maxDist * min(n,m)) per pair, cheap enough for term-dictionary
    * expansion scans.
    */
  def osa(a: String, b: String, maxDist: Int): Int = {
    val n = a.length
    val m = b.length
    if (math.abs(n - m) > maxDist) return maxDist + 1
    if (n == 0) return m
    if (m == 0) return n
    // banded evaluation: any cell with |i - j| > maxDist is provably
    // > maxDist, so each row computes only the 2*maxDist+1 diagonal band —
    // O(maxDist * min(n, m)) for the vocabulary-scan hot path. BIG acts as
    // +infinity without overflow.
    val BIG = maxDist + 1
    var prev2: Array[Int] = null
    var prev = Array.tabulate(m + 1)(j => if (j <= maxDist) j else BIG)
    var cur = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      val jLo = math.max(1, i - maxDist)
      val jHi = math.min(m, i + maxDist)
      cur(0) = if (i <= maxDist) i else BIG
      if (jLo > 1) cur(jLo - 1) = BIG // left band edge
      var rowMin = cur(0)
      var j = jLo
      while (j <= jHi) {
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
        val up = if (prev(j) >= BIG) BIG else prev(j) + 1
        val left = if (cur(j - 1) >= BIG) BIG else cur(j - 1) + 1
        val diag = if (prev(j - 1) >= BIG) BIG else prev(j - 1) + cost
        var v = math.min(math.min(up, left), diag)
        if (i > 1 && j > 1 && a.charAt(i - 1) == b.charAt(j - 2)
          && a.charAt(i - 2) == b.charAt(j - 1)) {
          val tr = if (prev2(j - 2) >= BIG) BIG else prev2(j - 2) + 1
          v = math.min(v, tr)
        }
        if (v > BIG) v = BIG
        cur(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (jHi < m) cur(jHi + 1) = BIG // right band edge
      if (rowMin > maxDist) return maxDist + 1
      val tmp = prev2
      prev2 = prev
      prev = cur
      cur = if (tmp == null) new Array[Int](m + 1) else tmp
      i += 1
    }
    if (prev(m) > maxDist) maxDist + 1 else prev(m)
  }

  /** Weighted Levenshtein (reference lib/nlp/text_normalization.py:18-64):
    * insert/delete cost 1, substitution cost `subCost` (reference default 2),
    * early exit when the running row minimum exceeds `maxDist`.
    */
  def weighted(a: String, b: String, subCost: Int = 2,
      maxDist: Int = Int.MaxValue): Int = {
    val n = a.length
    val m = b.length
    if (n == 0) return m
    if (m == 0) return n
    var prev = Array.tabulate(m + 1)(identity)
    var cur = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      cur(0) = i
      var rowMin = cur(0)
      var j = 1
      while (j <= m) {
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else subCost
        val v = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), prev(j - 1) + cost)
        cur(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (rowMin > maxDist) return maxDist + 1
      val tmp = prev
      prev = cur
      cur = tmp
      i += 1
    }
    prev(m)
  }

  /** ES `fuzziness: "auto:4,7"` edit budget by token length
    * (documented at reference ner_v2/detectors/textual/text_detection.py:43-52,
    * emulated at datastore/elastic_search/query.py:371-388):
    * length 0–3 → 0 edits, 4–6 → 1, ≥7 → 2.
    */
  def autoFuzzyEdits(tokenLen: Int, low: Int = 4, high: Int = 7): Int =
    if (tokenLen < low) 0 else if (tokenLen < high) 1 else 2
}
