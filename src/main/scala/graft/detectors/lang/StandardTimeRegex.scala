package graft.detectors.lang

import java.time.LocalDateTime
import java.util.regex.Pattern

import graft.detectors.DetectedTime

import scala.collection.mutable.ListBuffer

/** Language-generic time detection compiled from CSV constant tables — the
  * reference's standard time regex engine
  * (ner_v2/detectors/temporal/time/standard_time_regex.py:98-163 builds ONE
  * composite regex from the language vocabulary; :222-340 are the parsers).
  * Handles: '2 baje', 'subah me paune 9 baje' (ref-magnitude −0.25 → 8:45),
  * '2 bajkar 30 minute', '30 minute baad' (relative → 'df'/'ndf'), and the
  * hh:mm colon format.
  *
  * Determinism: the reference's meridiem inference and relative times use
  * wall-clock now; here the reference time is an explicit constructor
  * argument.
  */
final class StandardTimeRegex(
    data: TimeLangData,
    referenceTime: LocalDateTime,
    entityName: String = "time") {

  import StandardDateRegex.{groupsOf, parseUnicodeInt, sortByWordCount}

  private def emptyable(xs: Seq[String]): String =
    "(" + sortByWordCount(xs).mkString("|") + "|)"

  private val dtDiffChoices =
    emptyable(data.dtConst.variantsOfType(2, "add_diff_datetime"))
  private val dtRefChoices =
    emptyable(data.dtConst.variantsOfType(2, "ref_datetime"))
  private val hourVariants = emptyable(data.timeConst.variantsOfType(0, "hour"))
  private val minuteVariants =
    emptyable(data.timeConst.variantsOfType(0, "minute"))
  private val meridiemVariants =
    emptyable(data.timeConst.variantsOfType(0, "daytime_meridiem"))
  private val numeralVariants =
    sortByWordCount(data.numerals.keys.toSeq).mkString("|")

  // groups: 1 whole, 2 meridiem, 3 ref, 4 value, 5 hour-word, 6 minute-value,
  // 7 minute-word, 8 diff, 9 trailing meridiem (standard_time_regex.py:151)
  private val regexTime = Pattern.compile(
    "(" + meridiemVariants + "\\s*[a-z]*?\\s*" + dtRefChoices +
      "\\s*(\\d+|" + numeralVariants + ")\\s*" + hourVariants +
      "\\s*(\\d*|" + numeralVariants + ")\\s*" + minuteVariants +
      "\\s+" + dtDiffChoices + "\\s*" + meridiemVariants + ")",
    Pattern.UNICODE_CASE | Pattern.UNICODE_CHARACTER_CLASS)

  private val regexColon = Pattern.compile("\\s*((\\d+)\\:(\\d+))\\s*",
    Pattern.UNICODE_CASE | Pattern.UNICODE_CHARACTER_CLASS)

  private def floatFromNumeral(numeral: String): Double =
    parseUnicodeInt(numeral).map(_.toDouble)
      .getOrElse(data.numerals(numeral)(0).toDouble)

  /** am/pm from a daytime word inside the original, else the 12-hour window
    * around the reference time; 'hrs' for 0 or >= 12
    * (standard_time_regex.py:179-220).
    */
  private def meridiemOf(hh: Int, mm: Int, original: String): String = {
    if (hh == 0 || hh >= 12) return "hrs"
    for ((k, cols) <- data.timeConst.entries
         if cols(0) == "daytime_meridiem" && original.contains(k))
      return cols(1)
    var curHour = referenceTime.getHour
    val curMin = referenceTime.getMinute
    if (curHour >= 12) {
      curHour -= 12
      if (curHour < hh || (curHour == hh && curMin < mm)) return "pm"
    } else {
      if (curHour > hh || (curHour == hh && curMin > mm)) return "pm"
    }
    "am"
  }

  /** hh:mm colon format, then the composite hour/minute regex, with tag
    * consumption between the two (detector_preferences order).
    */
  def detect(text: String): Seq[DetectedTime] = {
    var processed = " " + text.toLowerCase(java.util.Locale.ROOT) + " "
    val out = ListBuffer.empty[DetectedTime]

    val colon = detectColon(processed)
    for (t <- colon) processed = processed.replace(t.original, "")
    out ++= colon

    out ++= detectHourMinute(processed)
    out.toSeq
  }

  private def detectColon(processed: String): Seq[DetectedTime] = {
    val m = regexColon.matcher(processed)
    val out = ListBuffer.empty[DetectedTime]
    while (m.find()) {
      val t1 = m.group(2)
      val t2 = m.group(3)
      if (t1.length <= 2 && t2.length <= 2) {
        // parseUnicodeInt: \d under UNICODE_CHARACTER_CLASS matches e.g.
        // Devanagari/Bengali digits, which toInt cannot parse
        val hh = parseUnicodeInt(t1).get
        val mm = parseUnicodeInt(t2).get
        out += DetectedTime(hh, mm, meridiemOf(hh, mm, m.group(1)), m.group(1))
      }
    }
    out.toSeq
  }

  private def detectHourMinute(processed: String): Seq[DetectedTime] = {
    val m = regexTime.matcher(processed)
    val out = ListBuffer.empty[DetectedTime]
    while (m.find()) {
      val g = groupsOf(m)
      val original = g(1).strip()
      var value = floatFromNumeral(g(4))
      if (g(3).nonEmpty) value += data.dtConst(g(3))(1).toDouble // saade/paune
      var hh = 0.0
      var mm = 0.0
      if (g(5).nonEmpty) hh = value else mm = value
      if (g(6).nonEmpty) mm = floatFromNumeral(g(6))
      var nn: String = null
      if (g(8).nonEmpty) {
        // relative time: now ± (hh, mm) → difference back to 'df'/'ndf'
        val mag = data.dtConst(g(8))(1).toDouble.toInt
        val totalMin = ((hh * 60 + mm) * mag).toLong
        val ref = referenceTime.plusMinutes(totalMin)
        val diffMin = java.time.Duration.between(referenceTime, ref).toMinutes
        nn = if (diffMin >= 0) "df" else "ndf"
        val absMin = math.abs(diffMin)
        hh = (absMin / 60).toDouble
        mm = (absMin % 60).toDouble
      }
      if (hh != math.floor(hh)) {
        mm = ((hh - math.floor(hh)) * 60).round.toDouble
        hh = math.floor(hh)
      }
      val hhI = hh.toInt
      val mmI = mm.toInt
      if (nn == null) nn = meridiemOf(hhI, mmI, original)
      // a bare minute count with no diff direction is not a time; the
      // reference ABORTS the whole scan here, not just this match
      // (standard_time_regex.py:272-273 `break`) — replicated for parity
      if (hhI == 0 && mmI > 0 && nn == "hrs") return out.toSeq
      out += DetectedTime(hhI, mmI, nn, original)
    }
    out.toSeq
  }
}
