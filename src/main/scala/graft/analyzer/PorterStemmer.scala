package graft.analyzer

/** Classic Porter stemmer (M.F. Porter, "An algorithm for suffix stripping",
  * Program 14(3) 1980) — the algorithm behind Lucene's PorterStemFilter,
  * which backs the reference's ES analyzer filter `{'type':'stemmer',
  * 'name':'english'}` (reference: datastore/elastic_search/create.py:94-111).
  *
  * Pure, allocation-light, thread-safe (works on a reusable char buffer per
  * call). Index-time and query-time must share this exact implementation —
  * the analyzer symmetry the reference relies on.
  */
object PorterStemmer {

  /** Stem a lowercase word. Words shorter than 3 chars are returned as-is
    * (Porter's k <= 1 guard). Caller must lowercase first.
    */
  def stem(word: String): String = {
    if (word.length < 3) return word
    val b = word.toCharArray
    var k = b.length - 1
    k = step1ab(b, k)
    k = step1c(b, k)
    k = step2(b, k)
    k = step3(b, k)
    k = step4(b, k)
    k = step5(b, k)
    new String(b, 0, k + 1)
  }

  // --- helpers on buffer b[0..k] ---

  private def cons(b: Array[Char], i: Int): Boolean = b(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => false
    case 'y' => if (i == 0) true else !cons(b, i - 1)
    case _ => true
  }

  /** m() = number of consonant sequences in [0, j]. */
  private def m(b: Array[Char], j: Int): Int = {
    var n = 0
    var i = 0
    while (i <= j && cons(b, i)) i += 1
    if (i > j) return 0
    while (true) {
      while (i <= j && !cons(b, i)) i += 1
      if (i > j) return n
      n += 1
      while (i <= j && cons(b, i)) i += 1
      if (i > j) return n
    }
    n
  }

  private def vowelInStem(b: Array[Char], j: Int): Boolean = {
    var i = 0
    while (i <= j) { if (!cons(b, i)) return true; i += 1 }
    false
  }

  private def doubleC(b: Array[Char], j: Int): Boolean =
    j >= 1 && b(j) == b(j - 1) && cons(b, j)

  /** cvc(i) — consonant-vowel-consonant ending at i, last not w/x/y. */
  private def cvc(b: Array[Char], i: Int): Boolean = {
    if (i < 2 || !cons(b, i) || cons(b, i - 1) || !cons(b, i - 2)) return false
    val c = b(i)
    c != 'w' && c != 'x' && c != 'y'
  }

  private def ends(b: Array[Char], k: Int, s: String): Boolean = {
    val l = s.length
    if (l > k + 1) return false
    var i = 0
    while (i < l) {
      if (b(k - l + 1 + i) != s.charAt(i)) return false
      i += 1
    }
    true
  }

  /** replace suffix of length `sufLen` ending at k with s; returns new k. */
  private def setTo(b: Array[Char], k: Int, sufLen: Int, s: String): Int = {
    val base = k - sufLen
    var i = 0
    while (i < s.length) { b(base + 1 + i) = s.charAt(i); i += 1 }
    base + s.length
  }

  // step 1ab: plurals and -ed / -ing
  private def step1ab(b: Array[Char], k0: Int): Int = {
    var k = k0
    if (b(k) == 's') {
      if (ends(b, k, "sses")) k -= 2
      else if (ends(b, k, "ies")) k = setTo(b, k, 3, "i")
      else if (b(k - 1) != 's') k -= 1
    }
    if (ends(b, k, "eed")) {
      if (m(b, k - 3) > 0) k -= 1
    } else {
      val (hit, sufLen) =
        if (ends(b, k, "ed")) (vowelInStem(b, k - 2), 2)
        else if (ends(b, k, "ing")) (vowelInStem(b, k - 3), 3)
        else (false, 0)
      if (hit) {
        k -= sufLen
        if (ends(b, k, "at")) k = setTo(b, k, 2, "ate")
        else if (ends(b, k, "bl")) k = setTo(b, k, 2, "ble")
        else if (ends(b, k, "iz")) k = setTo(b, k, 2, "ize")
        else if (doubleC(b, k)) {
          val c = b(k)
          if (c != 'l' && c != 's' && c != 'z') k -= 1
        } else if (m(b, k) == 1 && cvc(b, k)) {
          k = setTo(b, k, 0, "e")
        }
      }
    }
    k
  }

  // step 1c: y -> i when vowel in stem
  private def step1c(b: Array[Char], k: Int): Int = {
    if (b(k) == 'y' && vowelInStem(b, k - 1)) b(k) = 'i'
    k
  }

  private def r(b: Array[Char], k: Int, sufLen: Int, s: String): Int =
    if (m(b, k - sufLen) > 0) setTo(b, k, sufLen, s) else k

  private def step2(b: Array[Char], k: Int): Int = {
    if (k < 1) return k
    b(k - 1) match {
      case 'a' =>
        if (ends(b, k, "ational")) return r(b, k, 7, "ate")
        if (ends(b, k, "tional")) return r(b, k, 6, "tion")
        k
      case 'c' =>
        if (ends(b, k, "enci")) return r(b, k, 4, "ence")
        if (ends(b, k, "anci")) return r(b, k, 4, "ance")
        k
      case 'e' =>
        if (ends(b, k, "izer")) return r(b, k, 4, "ize")
        k
      case 'l' =>
        // Porter's published improvement: abli -> able replaced by bli -> ble
        if (ends(b, k, "bli")) return r(b, k, 3, "ble")
        if (ends(b, k, "alli")) return r(b, k, 4, "al")
        if (ends(b, k, "entli")) return r(b, k, 5, "ent")
        if (ends(b, k, "eli")) return r(b, k, 3, "e")
        if (ends(b, k, "ousli")) return r(b, k, 5, "ous")
        k
      case 'o' =>
        if (ends(b, k, "ization")) return r(b, k, 7, "ize")
        if (ends(b, k, "ation")) return r(b, k, 5, "ate")
        if (ends(b, k, "ator")) return r(b, k, 4, "ate")
        k
      case 's' =>
        if (ends(b, k, "alism")) return r(b, k, 5, "al")
        if (ends(b, k, "iveness")) return r(b, k, 7, "ive")
        if (ends(b, k, "fulness")) return r(b, k, 7, "ful")
        if (ends(b, k, "ousness")) return r(b, k, 7, "ous")
        k
      case 't' =>
        if (ends(b, k, "aliti")) return r(b, k, 5, "al")
        if (ends(b, k, "iviti")) return r(b, k, 5, "ive")
        if (ends(b, k, "biliti")) return r(b, k, 6, "ble")
        k
      case 'g' =>
        // Lucene/Porter "logi" extension
        if (ends(b, k, "logi")) return r(b, k, 4, "log")
        k
      case _ => k
    }
  }

  private def step3(b: Array[Char], k: Int): Int = {
    b(k) match {
      case 'e' =>
        if (ends(b, k, "icate")) return r(b, k, 5, "ic")
        if (ends(b, k, "ative")) return r(b, k, 5, "")
        if (ends(b, k, "alize")) return r(b, k, 5, "al")
        k
      case 'i' =>
        if (ends(b, k, "iciti")) return r(b, k, 5, "ic")
        k
      case 'l' =>
        if (ends(b, k, "ical")) return r(b, k, 4, "ic")
        if (ends(b, k, "ful")) return r(b, k, 3, "")
        k
      case 's' =>
        if (ends(b, k, "ness")) return r(b, k, 4, "")
        k
      case _ => k
    }
  }

  private def step4(b: Array[Char], k0: Int): Int = {
    var k = k0
    if (k < 1) return k
    val sufLen: Int = b(k - 1) match {
      case 'a' => if (ends(b, k, "al")) 2 else 0
      case 'c' =>
        if (ends(b, k, "ance")) 4 else if (ends(b, k, "ence")) 4 else 0
      case 'e' => if (ends(b, k, "er")) 2 else 0
      case 'i' => if (ends(b, k, "ic")) 2 else 0
      case 'l' =>
        if (ends(b, k, "able")) 4 else if (ends(b, k, "ible")) 4 else 0
      case 'n' =>
        if (ends(b, k, "ant")) 3
        else if (ends(b, k, "ement")) 5
        else if (ends(b, k, "ment")) 4
        else if (ends(b, k, "ent")) 3
        else 0
      case 'o' =>
        if (ends(b, k, "ion") && k >= 3 && (b(k - 3) == 's' || b(k - 3) == 't')) 3
        else if (ends(b, k, "ou")) 2
        else 0
      case 's' => if (ends(b, k, "ism")) 3 else 0
      case 't' =>
        if (ends(b, k, "ate")) 3 else if (ends(b, k, "iti")) 3 else 0
      case 'u' => if (ends(b, k, "ous")) 3 else 0
      case 'v' => if (ends(b, k, "ive")) 3 else 0
      case 'z' => if (ends(b, k, "ize")) 3 else 0
      case _ => 0
    }
    if (sufLen > 0 && m(b, k - sufLen) > 1) k -= sufLen
    k
  }

  private def step5(b: Array[Char], k0: Int): Int = {
    var k = k0
    if (b(k) == 'e') {
      val a = m(b, k - 1)
      if (a > 1 || (a == 1 && !cvc(b, k - 1))) k -= 1
    }
    if (b(k) == 'l' && doubleC(b, k) && m(b, k - 1) > 1) k -= 1
    k
  }
}
