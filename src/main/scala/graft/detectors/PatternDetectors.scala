package graft.detectors

import java.util.regex.Pattern
import scala.collection.mutable.ListBuffer

/** Regex-family pattern detectors (reference ner_v1/detectors/pattern/...):
  * email, PNR, phone, and the user-supplied-regex detector. Each returns
  * (values, originals) like the reference's detect_entity contract.
  */
object PatternDetectors {

  /** RFC-5321-ish email matcher over lowercased text
    * (email_detection.py:120-155 semantics: dot-atom local part with the
    * full special-char set, dotted domain).
    */
  private val emailPattern = Pattern.compile(
    raw"[a-z0-9!#$$%&'*+/=?^_`{|}~-]+(?:\.[a-z0-9!#$$%&'*+/=?^_`{|}~-]+)*" +
      raw"@(?:[a-z0-9](?:[a-z0-9-]*[a-z0-9])?\.)+[a-z0-9](?:[a-z0-9-]*[a-z0-9])?")

  def emails(text: String): Seq[Detected] = {
    val m = emailPattern.matcher(text.toLowerCase(java.util.Locale.ROOT))
    val out = ListBuffer.empty[Detected]
    while (m.find()) out += Detected(m.group(), None, m.group())
    out.toSeq
  }

  /** Long travel PNR codes: 10-12 digit runs, optionally with separators
    * every few digits (pnr_detection.py:150-260 semantics: plain 10-12
    * digits, or 10 digits split by space/dash groups).
    */
  private val pnrPlain = Pattern.compile(raw"\b(\d{10,12})\b")
  private val pnrSeparated = Pattern.compile(
    raw"\b(\d{2,4}[\s-]\d{2,4}[\s-]\d{2,4}(?:[\s-]\d{1,4})?)\b")

  def pnrs(text: String): Seq[Detected] = {
    val out = ListBuffer.empty[Detected]
    val m1 = pnrPlain.matcher(text)
    while (m1.find()) out += Detected(m1.group(1), None, m1.group(1))
    val m2 = pnrSeparated.matcher(text)
    while (m2.find()) {
      val digits = m2.group(1).replaceAll("[\\s-]", "")
      if (digits.length >= 10 && digits.length <= 12)
        out += Detected(digits, None, m2.group(1))
    }
    out.toSeq
  }

  /** Generic serial/PNR codes — the reference's DEFAULT task for any
    * entity_name other than 'train_pnr' (pnr_detection.py:77-80 task_dict,
    * _detect_serial_pnr:253-283): a first-match-only chain of four
    * patterns over the space-padded lowercased text — mixed alnum token,
    * 'e'-prefixed digit run, [A-Z]{4,20} (dead code in the reference: it
    * searches the LOWERED text, so it can never match — reproduced for
    * parity by simply never firing), and a consonant-heavy 4-10 run.
    * At most ONE code is returned (the reference uses .search, not
    * findall).
    */
  private val serialMixed = Pattern.compile(
    raw"\s(([0-9]+[a-zA-Z]|[a-zA-Z]+[0-9])[A-Za-z0-9]*)\s")
  private val serialEDigits = Pattern.compile(raw"\se([0-9]{4,20})\s")
  private val serialConsonant = Pattern.compile(
    raw"\s([A-Za-z0-9]*[^AaEeIiOoUu+\-,!@#$$^&*();/|<>\s]{4,10}[A-Za-z0-9]+)[\s.]")

  def serialPnr(text: String): Seq[Detected] = {
    val padded = " " + text.toLowerCase(java.util.Locale.ROOT) + " "
    def first(p: Pattern): Option[String] = {
      val m = p.matcher(padded)
      if (m.find()) Some(m.group(1)) else None
    }
    val pnr = first(serialMixed).filter(_.length > 3)
      .orElse(first(serialEDigits))
      .orElse(first(serialConsonant))
    pnr.map(v => Detected(v, None, v)).toSeq
  }

  /** Phone numbers (lite): optional +CC, 8-13 digit national number with
    * optional separators; returns (countryCallingCode, nationalNumber)
    * packed as value "cc:number" when a calling code is present
    * (phone_number_detection.py:76-170 national length >= 8 rule).
    */
  private val phonePattern = Pattern.compile(
    raw"(?:\+|00)(\d{1,3})[\s-]?((?:\d[\s-]?){8,12}\d)|\b((?:\d[\s-]?){7,12}\d)\b")

  def phones(text: String, defaultCallingCode: String = "91"): Seq[Detected] = {
    val out = ListBuffer.empty[Detected]
    val m = phonePattern.matcher(text)
    while (m.find()) {
      if (m.group(1) != null) {
        val national = m.group(2).replaceAll("[\\s-]", "")
        if (national.length >= 8)
          out += Detected(national, Some(m.group(1)), m.group().strip())
      } else {
        val national = m.group(3).replaceAll("[\\s-]", "")
        if (national.length >= 8)
          out += Detected(national, Some(defaultCallingCode), m.group(3).strip())
      }
    }
    out.toSeq
  }

  /** User-pattern detector (regex_detection.py:84-131): compile-time
    * validation, whole-match (group 0) values, empty/whitespace-only
    * matches skipped, capped at maxMatches non-empty matches.
    */
  def custom(text: String, pattern: String, maxMatches: Int = 50): Seq[Detected] =
    new RegexEntityDetector("ent", pattern, maxMatches = maxMatches)
      .detect(text).map(v => Detected(v, None, v))

  /** ASR-mode user-pattern detector (regex_detection.py:104-105 when
    * asr_enabled): the text is first edited to fit the pattern — spoken
    * Hindi letters to Latin, minimal extra-character deletion
    * (analyzer.AsrFormat, F11) — then matched normally.
    */
  def customAsr(text: String, pattern: String, maxMatches: Int = 50): Seq[Detected] =
    custom(graft.analyzer.AsrFormat.asrCorrection(text, pattern), pattern, maxMatches)
}

/** Faithful mirror of the reference RegexDetector
  * (ner_v1/detectors/pattern/regex/regex_detection.py:29-148): compiles
  * the user pattern eagerly (PatternSyntaxException on invalid input —
  * the reference's container has no `regex` lib, so the stdlib-`re`
  * UNICODE-flag path is the behavior to match; Java's Pattern likewise
  * treats nested character sets '[[]]' the V0 way), collects whole-match
  * values skipping empty/whitespace-only matches up to maxMatches, and
  * maintains taggedText (each match replaced once, in match order, via the
  * placeholder two-pass) and processedText (matches removed once each).
  */
final class RegexEntityDetector(entityName: String, pattern: String,
    dotAll: Boolean = false, maxMatches: Int = 50) {

  // Java, like regex.V1, nests character classes ('[[\]]' is an unclosed
  // union); the reference falls back to V0 on that compile error
  // (regex_detection.py:69-77). V0's difference is that '[' inside a class
  // is literal — rewrite it escaped and retry.
  private def v0ify(p: String): String = {
    val sb = new StringBuilder
    var inClass = false
    var i = 0
    while (i < p.length) {
      val c = p.charAt(i)
      if (c == '\\' && i + 1 < p.length) {
        sb.append(c).append(p.charAt(i + 1)); i += 2
      } else {
        if (!inClass) { if (c == '[') inClass = true; sb.append(c) }
        else if (c == ']') { inClass = false; sb.append(c) }
        else if (c == '[') sb.append("\\[")
        else sb.append(c)
        i += 1
      }
    }
    sb.toString
  }

  private val flags = if (dotAll) Pattern.DOTALL else 0
  private val compiled =
    try Pattern.compile(pattern, flags)
    catch {
      case _: java.util.regex.PatternSyntaxException =>
        Pattern.compile(v0ify(pattern), flags)
    }
  private val tag = "__" + entityName + "__"
  private val Placeholder = "▁▁"

  var taggedText: String = ""
  var processedText: String = ""

  private def replaceOnce(s: String, find: String, repl: String): String = {
    val at = s.indexOf(find)
    if (at < 0 || find.isEmpty) s
    else s.substring(0, at) + repl + s.substring(at + find.length)
  }

  def detect(text: String): Seq[String] = {
    processedText = text
    taggedText = text
    val m = compiled.matcher(text)
    val out = ListBuffer.empty[String]
    var go = true
    while (go && m.find()) {
      if (m.group().strip().nonEmpty) out += m.group()
      if (out.size >= maxMatches) go = false
    }
    for (v <- out) {
      taggedText = replaceOnce(taggedText, v, Placeholder)
      processedText = replaceOnce(processedText, v, "")
    }
    taggedText = taggedText.replace(Placeholder, tag)
    out.toSeq
  }
}
