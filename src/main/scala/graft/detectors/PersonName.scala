package graft.detectors

/** A detected person name split into parts (reference envelope:
  * name_detection.py get_format_name — first/middle/last).
  */
final case class DetectedName(firstName: String, middleName: Option[String],
    lastName: Option[String], original: String)

/** Person-name heuristic (F31) — the capitalization/position subset of the
  * reference's NameDetector (ner_v1/detectors/textual/name/
  * name_detection.py:58-145). NON-PARITY, documented: the reference runs an
  * NLTK POS tagger to keep nouns/adjectives; this container has no tagger,
  * so the heuristic keeps alphabetic non-stopword tokens instead. The parts
  * that ARE parity:
  *  - first/middle/last split (get_format_name:59-103);
  *  - the question guard — interrogatives or cardinal numbers anywhere
  *    reject the whole message (:126-131 WR/WP/CD check);
  *  - the short-message rule — the free-text path only fires on messages
  *    under 4 tokens and only when the previous bot message asked for a
  *    name (:133, context_check_botmessage:370-390);
  *  - 'my name is X' templates fire regardless of bot context.
  */
object PersonName {

  private val questionWords = Set(
    "what", "who", "when", "where", "why", "which", "whose", "whom", "how")

  private val stopwords = Set(
    "i", "am", "is", "the", "a", "an", "my", "me", "you", "your", "it's",
    "its", "name", "yes", "no", "ok", "okay", "please", "hi", "hello", "hey")

  /** name-asking phrases for the bot-context check (subset of the
    * reference's PREVIOUS_MESSAGE_VARIATIONS, lang_constants.py:885-892).
    */
  private val nameContextPhrases = Seq(
    "call you", "your name", "address you", "is your name", "say your name",
    "know your name", "tell your name", "your full name", "enter your name",
    "share your name", "what's your name", "tell me your name",
    "what is your name", "mention your name", "provide your name",
    "help me with your name", "please enter your name")

  private val templates = Seq(
    "my name is ", "name is ", "i am ", "i'm ", "this is ", "myself ",
    "call me ")

  /** Does the previous bot message ask for a name? (context_check_botmessage:
    * punctuation stripped, lowercase, phrase containment.)
    */
  def nameContext(botMessage: String): Boolean = {
    val cleaned = " " + botMessage.toLowerCase(java.util.Locale.ROOT)
      .replaceAll("\\p{Punct}+", "").strip() + " "
    nameContextPhrases.exists(p => cleaned.contains(p))
  }

  private def formatName(tokens: Seq[String], text: String): Seq[DetectedName] = {
    if (tokens.isEmpty) return Seq.empty
    val nameText = tokens.mkString(" ")
    if (!text.contains(nameText)) return Seq.empty
    if (tokens.length == 1) Seq(DetectedName(tokens.head, None, None, nameText))
    else Seq(DetectedName(tokens.head,
      Some(tokens.slice(1, tokens.length - 1).mkString(" ")).filter(_.nonEmpty),
      Some(tokens.last), nameText))
  }

  private def nameLike(tok: String): Boolean =
    tok.nonEmpty && !stopwords.contains(tok.toLowerCase(java.util.Locale.ROOT)) &&
      tok.forall(c => c.isLetter || c == '.' || c == '\'' || c == '-')

  /** Detect a name in `text`. `botMessage` (the previous bot turn) gates the
    * free-text path exactly like the reference; templates fire without it.
    */
  def detect(text: String, botMessage: Option[String] = None): Seq[DetectedName] = {
    val lower = text.toLowerCase(java.util.Locale.ROOT)
    val tokens = text.split("\\s+").filter(_.nonEmpty).toSeq

    // question guard: interrogatives or cardinals anywhere → no name
    if (tokens.exists(t => questionWords.contains(
        t.toLowerCase(java.util.Locale.ROOT).replaceAll("\\p{Punct}+$", ""))) ||
      tokens.exists(_.exists(_.isDigit))) return Seq.empty

    // template path: 'my name is X Y' and friends
    for (tpl <- templates) {
      val at = lower.indexOf(tpl)
      if (at >= 0) {
        val rest = text.substring(at + tpl.length)
        val nameToks = rest.split("\\s+").filter(_.nonEmpty).takeWhile(nameLike)
        if (nameToks.nonEmpty) return formatName(nameToks.toSeq, text)
      }
    }

    // free-text path: short message + the bot asked for a name
    if (botMessage.exists(nameContext) && tokens.length < 4) {
      val nameToks = tokens.filter(nameLike)
      if (nameToks.nonEmpty) return formatName(nameToks, text)
    }
    Seq.empty
  }
}
