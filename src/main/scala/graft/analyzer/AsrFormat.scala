package graft.analyzer

import scala.collection.mutable.ListBuffer

/** ASR fuzzy format fitting (F11) — a from-scratch reimplementation of the
  * reference's `fit_text_to_format` / `perform_asr_correction`
  * (lib/nlp/text_normalization.py:67-118, :165-190): speech-to-text output
  * like "1 2 3 45" is edited to fit a target format like `\d{5}` by finding
  * the minimal set of EXTRA characters (insertions, in fuzzy-regex terms)
  * whose removal makes a substring match, then deleting exactly those.
  *
  * The reference leans on the `regex` module's `(?b)(pattern){i<=N}`
  * fuzzy-match; here the same semantics come from an explicit DP alignment
  * over a compiled element list. Pattern language supported (the subset the
  * ASR regex/PNR/phone paths use): literals, `\d` `\w` `\s`, `[...]`
  * classes, and `{n}` / `{m,n}` counts on any of those. `{m,n}` resolves
  * max-first like the reference (:95-110) because fuzzy matching is
  * non-greedy.
  */
object AsrFormat {

  /** Hindi spoken-letter constants (ner_v1/.../data/character_constants.py),
    * longest-first on replacement like the reference's resolve_characters.
    */
  val characterConstants: Map[String, String] = Map(
    "ए" -> "A", "बी" -> "B", "सी" -> "C", "डी" -> "D", "इ" -> "E",
    "ई" -> "E", "एफ" -> "F", "ऍफ़" -> "F", "जी" -> "G", "एच" -> "H",
    "आय" -> "I", "जे" -> "J", "के" -> "K", "एल" -> "L", "एम्" -> "M",
    "एम" -> "M", "एन" -> "N", "ओ" -> "O", "पी" -> "P", "क्यू" -> "Q",
    "आर" -> "R", "एस" -> "S", "टी" -> "T", "यु" -> "U", "वि" -> "V",
    "वी" -> "V", "डब्ल्यू" -> "W", "डब्ल्यु" -> "W", "डबल्यू" -> "W",
    "एक्स" -> "X", "वाय" -> "Y", "ज़ेड" -> "Z", "ज़ी" -> "Z")

  private val punctuation: Set[Char] =
    ("!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~" + "। ").toSet

  // ---- mini pattern compiler ----

  private sealed trait Elem { def matches(c: Char): Boolean }
  private final case class Lit(ch: Char) extends Elem {
    def matches(c: Char): Boolean = c == ch
  }
  private case object Digit extends Elem {
    def matches(c: Char): Boolean = Character.digit(c, 10) >= 0
  }
  private case object Word extends Elem {
    def matches(c: Char): Boolean =
      Character.isLetterOrDigit(c) || c == '_'
  }
  private case object Space extends Elem {
    def matches(c: Char): Boolean = Character.isWhitespace(c)
  }
  private final case class Cls(neg: Boolean, set: Set[Char],
      ranges: Seq[(Char, Char)]) extends Elem {
    def matches(c: Char): Boolean = {
      val in = set.contains(c) || ranges.exists(r => c >= r._1 && c <= r._2)
      in != neg
    }
  }

  /** Compile a fixed-count pattern (no {m,n} left) to an element list. */
  private def compile(pattern: String): Seq[Elem] = {
    val out = ListBuffer.empty[Elem]
    var i = 0
    def addWithCount(e: Elem): Unit = {
      if (i < pattern.length && pattern.charAt(i) == '{') {
        val close = pattern.indexOf('}', i)
        require(close > 0, s"unclosed count in $pattern")
        val n = pattern.substring(i + 1, close).toInt
        i = close + 1
        (0 until n).foreach(_ => out += e)
      } else out += e
    }
    while (i < pattern.length) {
      pattern.charAt(i) match {
        case '\\' =>
          require(i + 1 < pattern.length, s"dangling escape in $pattern")
          val c = pattern.charAt(i + 1)
          i += 2
          addWithCount(c match {
            case 'd' => Digit
            case 'w' => Word
            case 's' => Space
            case other => Lit(other)
          })
        case '[' =>
          val close = pattern.indexOf(']', i + 1)
          require(close > 0, s"unclosed class in $pattern")
          val body0 = pattern.substring(i + 1, close)
          val neg = body0.startsWith("^")
          val body = if (neg) body0.substring(1) else body0
          val set = ListBuffer.empty[Char]
          val ranges = ListBuffer.empty[(Char, Char)]
          var j = 0
          while (j < body.length) {
            if (j + 2 < body.length && body.charAt(j + 1) == '-') {
              ranges += ((body.charAt(j), body.charAt(j + 2)))
              j += 3
            } else { set += body.charAt(j); j += 1 }
          }
          i = close + 1
          addWithCount(Cls(neg, set.toSet, ranges.toSeq))
        case c =>
          i += 1
          addWithCount(Lit(c))
      }
    }
    out.toSeq
  }

  /** Insert-only fuzzy search: the positions (global text indices) of the
    * minimal set of extra chars inside some substring whose removal makes
    * the element list match, or None. Ties: fewest inserts, then earliest
    * start (the reference's (?b) BESTMATCH behavior on these shapes).
    */
  private def fuzzySearch(text: String, elems: Seq[Elem],
      maxInserts: Int): Option[Seq[Int]] = {
    var best: Option[Seq[Int]] = None
    var start = 0
    while (start <= text.length - elems.length) {
      if (elems.isEmpty || elems.head.matches(text.charAt(start))) {
        // greedy-min DP from this start: align elems to text[start..]
        // f(j) over text positions; track skipped indices
        val skipped = ListBuffer.empty[Int]
        var ti = start
        var ei = 0
        var inserts = 0
        while (ei < elems.length && ti < text.length && inserts <= maxInserts) {
          if (elems(ei).matches(text.charAt(ti))) { ei += 1; ti += 1 }
          else { skipped += ti; ti += 1; inserts += 1 }
        }
        if (ei == elems.length && inserts <= maxInserts &&
          best.forall(_.length > skipped.length))
          best = Some(skipped.toSeq)
      }
      start += 1
      if (best.exists(_.isEmpty)) return best // can't beat zero inserts
    }
    best
  }

  /** Modify `inputText` so a substring fits `regexPattern`, deleting the
    * minimal extra characters; unchanged when no fuzzy match exists.
    */
  def fitTextToFormat(inputText: String, regexPattern: String,
      insertEdits: Int = -1): String = {
    val budget =
      if (insertEdits > 0) insertEdits
      else inputText.count(punctuation.contains) + 2

    val rangeRx = java.util.regex.Pattern
      .compile("\\{(\\d+),(\\d+)\\}").matcher(regexPattern)
    var pattern = regexPattern
    if (rangeRx.find()) {
      // fuzzy matching is non-greedy: resolve {m,n} from max down, first
      // count that matches wins (standard_date_regex-style max preference)
      val min = rangeRx.group(2).toInt.min(rangeRx.group(1).toInt)
      val max = rangeRx.group(2).toInt.max(rangeRx.group(1).toInt)
      val found = (max to min by -1).iterator
        .map(i => pattern.replace(rangeRx.group(), s"{$i}"))
        .find(p => fuzzySearch(inputText, compile(p), budget).isDefined)
      found match {
        case Some(p) => pattern = p
        case None => return inputText
      }
    }
    fuzzySearch(inputText, compile(pattern), budget) match {
      case Some(skips) =>
        val keep = new java.lang.StringBuilder(inputText.length)
        val skipSet = skips.toSet
        var i = 0
        while (i < inputText.length) {
          if (!skipSet.contains(i)) keep.append(inputText.charAt(i))
          i += 1
        }
        keep.toString
      case None => inputText
    }
  }

  /** The full ASR correction pipeline (perform_asr_correction): spoken
    * Hindi letters → Latin, then fuzzy-fit to the target format. (The
    * numeral-resolution stage is NumberWords / the hi numerals table,
    * applied by callers that need it.)
    */
  def asrCorrection(inputText: String, regexPattern: String): String = {
    var t = inputText
    // longest-first: a 1-char letter ('ए') must not mangle a longer one
    // that contains it ('एच','एफ',...). Documented divergence: the
    // reference replaces shortest-first (text_normalization.py:158
    // sorted(key=len)), which garbles exactly those prefixed letters.
    for ((frag, rep) <- characterConstants.toSeq.sortBy(-_._1.length))
      t = t.replace(frag, rep)
    fitTextToFormat(t, regexPattern)
  }
}
