package graft.surface

import graft.analyzer.Tokenizer
import graft.functions.EditDistance

/** Client-side fuzzy token alignment + original-substring recovery — the
  * post-search half of the reference's text detection.
  *
  * Faithful to reference semantics:
  *  - per-token edit budget from the auto:lo,hi rule on the TEXT token's
  *    length (text_detection.py:122-140 `_get_fuzziness_threshold_for_token`)
  *  - token match = equality OR (len(textToken) > minTokenSize AND
  *    levenshtein(substitution_cost=1, early exit) <= budget)
  *    (text_detection.py:486-505)
  *  - alignment resets on mismatch WITHOUT re-considering the failing token
  *    as a new match start — reproduced as-is (reference behavior, not a
  *    simplification; text_detection.py:497-505)
  *  - recovered original text spans from the first to the last matched
  *    token INCLUDING characters the tokenizer dropped in between (the
  *    `__eos__` offset trick at text_detection.py:166-254 — our tokenizer
  *    emits offsets, so this is a direct substring)
  */
object Alignment {

  /** Edit budget for a token (auto:lo,hi — default auto:4,7): the ONE
    * rule, shared with query-side fuzzy expansion so alignment and
    * expansion can never disagree on fuzzy eligibility.
    */
  def fuzzinessThreshold(tokenLen: Int, lo: Int = 4, hi: Int = 7): Int =
    EditDistance.autoFuzzyEdits(tokenLen, lo, hi)

  /** Find the substring of `text` (lowercased by caller) matching `variant`
    * by sliding fuzzy token alignment. Returns None if no alignment.
    */
  def entitySubstring(text: String, variant: String,
      lo: Int = 4, hi: Int = 7, minTokenSize: Int = 4): Option[String] = {
    val variantTokens = Tokenizer.tokenizeTerms(variant)
    if (variantTokens.isEmpty) return None
    val textTokens = Tokenizer.tokenize(text)
    var vi = 0
    var startOffset = -1
    var i = 0
    while (i < textTokens.length) {
      val tt = textTokens(i)
      val vt = variantTokens(vi)
      val same = vt == tt.term
      val ft = fuzzinessThreshold(tt.term.length, lo, hi)
      val matched = same || (tt.term.length > minTokenSize &&
        EditDistance.weighted(vt, tt.term, subCost = 1, maxDist = ft + 1) <= ft)
      if (matched) {
        if (vi == 0) startOffset = tt.start
        vi += 1
        if (vi == variantTokens.length)
          return Some(text.substring(startOffset, tt.end))
      } else {
        vi = 0
        startOffset = -1
      }
      i += 1
    }
    None
  }

  private val boundaryPunct =
    "^[\\p{Punct}]+|[\\p{Punct}]+$".r

  def stripBoundaryPunct(s: String): String =
    boundaryPunct.replaceAllIn(s, "")

  /** Replace a detected span with its consumption tag, word-boundary
    * anchored (text_detection.py:311-324 / F10).
    */
  def consume(text: String, originalText: String, entity: String): String = {
    val stripped = stripBoundaryPunct(originalText)
    if (stripped.isEmpty) text
    else text.replaceAll("\\b" + java.util.regex.Pattern.quote(stripped) + "\\b",
      java.util.regex.Matcher.quoteReplacement(s"__${entity}__"))
  }
}
