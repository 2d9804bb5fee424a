package graft.analyzer

/** Small NLP utilities from the reference's lib/nlp kernel that sit outside
  * the analyzer chain proper.
  */
object NlpUtils {

  /** Reference stop set for ngram filtering (lib/nlp/const.py:19-21). */
  val ngramStopwords: Set[String] = Set(
    "a", "an", "the", "of", "in", "on", "at", "to", "is", "am", "are",
    "was", "were", "be", "and", "or", "for", "with")

  /** n-grams over tokens, dropping grams whose tokens are ALL stopwords
    * (lib/nlp/ngram.py:24-46).
    */
  def ngrams(tokens: Seq[String], n: Int): Seq[String] = {
    if (tokens.length < n) return Seq.empty
    tokens.sliding(n)
      .filterNot(_.forall(t => ngramStopwords.contains(t.toLowerCase)))
      .map(_.mkString(" "))
      .toSeq
  }

  /** Ordered (pattern, replacement) substitution chain
    * (lib/nlp/regexreplace.py:25-55): each pair applies in sequence over
    * the running result.
    */
  def regexReplaceChain(text: String, rules: Seq[(String, String)]): String =
    rules.foldLeft(text) { case (t, (pat, repl)) => t.replaceAll(pat, repl) }

  /** Punctuation removal preset (const.py:25-26 semantics). */
  def stripPunctuation(text: String): String =
    regexReplaceChain(text, Seq(("[\\p{Punct}]+", " "), ("\\s+", " "))).strip()

  /** ASR email normalization (lib/nlp/text_normalization.py:197-208):
    * spoken "at"/"at the rate" → @, "dot" → . between tokens.
    */
  def normalizeAsrEmail(text: String): String =
    regexReplaceChain(text.toLowerCase(java.util.Locale.ROOT), Seq(
      ("\\s+at\\s+the\\s+rate\\s+", "@"),
      ("\\s+at\\s+rate\\s+", "@"),
      ("\\s+at\\s+", "@"),
      ("\\s+dot\\s+", "."),
      ("\\s*@\\s*", "@")))
}
