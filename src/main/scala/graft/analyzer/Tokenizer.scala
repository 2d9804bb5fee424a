package graft.analyzer

import scala.collection.mutable.ArrayBuffer

/** A token with its character offsets into the original text.
  *
  * Offsets are emitted from day one so that highlight / original-substring
  * recovery (reference: ner_v2/detectors/textual/text_detection.py:166-254,
  * the `__eos__` offset-bookkeeping trick) is a pure lookup instead of a
  * re-alignment pass.
  */
final case class Token(term: String, start: Int, end: Int)

/** Lucene-standard-mimic tokenizer.
  *
  * Behavioral spec: reference `lib/nlp/tokenizer.py:61-72` — the regex
  * `\w(?:\B\S)*` with UNICODE flag. Since `\B` between chars c1,c2 requires
  * isWord(c1) == isWord(c2), and the match starts on a word char, the match
  * can never cross a word→non-word transition: the regex reduces to maximal
  * runs of word characters (`foo.bar` → `foo`,`bar`; `don't` → `don`,`t`),
  * which also matches Lucene's standard tokenizer on ASCII code text.
  *
  * Implemented as a single linear scan (no java.util.regex) so it is cheap
  * enough to sit inside a per-row expression over 100 TB of text. The scan
  * below implements the regex semantics literally (boundary check against
  * the previous char) rather than the simplification, so behavior stays
  * tied to the spec.
  *
  * Documented divergence: word chars include non-spacing/combining marks
  * and connector punctuation (UAX#29, what ES's standard analyzer — the
  * reference's actual SEARCH analyzer — does), while Python's \w excludes
  * them and would split e.g. Devanagari words at their matras
  * (re.findall(r'\w+', 'मुंबई') == ['म', 'बई']). Keeping marks is required
  * for the Hindi dictionary path to work at all; index and query share
  * this tokenizer, so the engine is internally consistent.
  */
object Tokenizer {

  @inline private def isWordChar(c: Char): Boolean =
    Character.isLetterOrDigit(c) || c == '_' ||
      Character.getType(c) == Character.NON_SPACING_MARK ||
      Character.getType(c) == Character.COMBINING_SPACING_MARK ||
      Character.getType(c) == Character.CONNECTOR_PUNCTUATION

  @inline private def isSpace(c: Char): Boolean = Character.isWhitespace(c)

  /** Tokenize with offsets. Linear in text length; allocation = tokens only. */
  def tokenize(text: String): Array[Token] = {
    if (text == null || text.isEmpty) return Array.empty
    val out = new ArrayBuffer[Token](math.max(8, text.length / 6))
    val n = text.length
    var i = 0
    while (i < n) {
      val c = text.charAt(i)
      if (isWordChar(c)) {
        val start = i
        var prev = c
        var j = i + 1
        var done = false
        while (j < n && !done) {
          val cj = text.charAt(j)
          // continue iff cj is non-space AND (prev,cj) is NOT a boundary
          if (!isSpace(cj) && (isWordChar(prev) == isWordChar(cj))) {
            prev = cj
            j += 1
          } else done = true
        }
        out += Token(text.substring(start, j), start, j)
        i = j
      } else {
        i += 1
      }
    }
    out.toArray
  }

  /** Terms only (no offsets) — the hot path used by the index build. */
  def tokenizeTerms(text: String): Array[String] = {
    val toks = tokenize(text)
    val out = new Array[String](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = toks(i).term; i += 1 }
    out
  }
}
