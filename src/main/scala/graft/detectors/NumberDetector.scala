package graft.detectors

import java.util.regex.Pattern
import scala.collection.mutable.ListBuffer

/** Detected scalar: stringified value + optional unit + original span text —
  * the reference's detector envelope (value/unit/original_text,
  * standard_number_detector.py:345-363).
  */
final case class Detected(value: String, unit: Option[String], original: String)

/** Number detection: digits (with thousands commas, decimal point, scale
  * suffix like `2.2k`) first, then number words — the reference's ordered
  * `detector_preferences` pipeline with tag consumption between stages
  * (standard_number_detector.py:66-102).
  */
final class NumberDetector(
    entityName: String = "number",
    unitsMap: Map[String, String] = Map.empty, // variant -> canonical unit
    minDigits: Int = 1,
    maxDigits: Int = 6) {

  private val tag = s"__${entityName}__"

  private val scaleAlt = NumberWords.enDigitScales.keys.toSeq
    .sortBy(-_.length).map(Pattern.quote).mkString("|")
  private val digitPattern = Pattern.compile(
    raw"(([\d,]+\.?[\d]*)\s?($scaleAlt))[\s\-:]|([\d,]+\.?[\d]*)")
  private val unitAlt = unitsMap.keys.toSeq
    .sortBy(-_.length).map(Pattern.quote).mkString("|")

  def detect(text: String): Seq[Detected] = {
    var processed = text.toLowerCase(java.util.Locale.ROOT)
    // (spanStart, Detected): results are span-sorted at the end, matching
    // the reference's position sort (standard_number_detector.py:95-101, O5)
    val out = ListBuffer.empty[(Int, Detected)]

    // stage 1: digits (+ scale suffix); trailing pad so an end-of-string
    // scale suffix ("...costs 2k") still matches the separator class
    val m = digitPattern.matcher(processed + " ")
    val stage1 = ListBuffer.empty[Detected]
    while (m.find()) {
      val (numStr, scale, originalRaw) =
        if (m.group(2) != null && isNumeric(m.group(2)))
          (m.group(2).replace(",", ""), NumberWords.enDigitScales(m.group(3)),
            m.group(1).strip().stripSuffix(",").stripSuffix(".").strip())
        else if (m.group(4) != null && isNumeric(m.group(4)))
          (m.group(4).replace(",", ""), 1L,
            m.group(4).strip().stripSuffix(",").stripSuffix(".").strip())
        else (null, 0L, null)
      if (numStr != null && numStr.nonEmpty && numStr != "." && originalRaw.nonEmpty) {
        val value: String =
          if (!numStr.contains('.')) (numStr.toLong * scale).toString
          else {
            val v = numStr.toDouble * scale
            if (v.isWhole) v.toLong.toString else v.toString
          }
        stage1 += Detected(value, None, originalRaw)
      }
    }
    for (d <- stage1) {
      val (unit, original) = captureUnit(d.original, processed)
      if (digitCountOk(d.value)) {
        val (consumed, at) = consumeOnceAt(processed, original)
        if (at >= 0) {
          processed = consumed
          out += ((at, Detected(d.value, unit, original)))
        }
      }
    }

    // stage 2: number words over the consumed text
    val (nums, origs) = NumberWords.numbersFromWords(processed)
    for ((n, o) <- nums.zip(origs) if digitCountOk(n.toString)) {
      val (unit, original) = captureUnit(o, processed)
      val (consumed, at) = consumeOnceAt(processed, original)
      if (at >= 0) {
        processed = consumed
        out += ((at, Detected(n.toString, unit, original)))
      }
    }
    out.sortBy(_._1).map(_._2).toSeq
  }

  private def isNumeric(s: String): Boolean = {
    val t = s.replace(",", "").replace(".", "")
    t.nonEmpty && t.forall(_.isDigit)
  }

  private def digitCountOk(value: String): Boolean = {
    val digits = value.takeWhile(c => c.isDigit)
    digits.length >= minDigits && digits.length <= maxDigits
  }

  /** Unit prefix/suffix capture around the detected span
    * (standard_number_detector.py:155-201).
    */
  private def captureUnit(original: String, processed: String): (Option[String], String) = {
    if (unitsMap.isEmpty) return (None, original)
    val padded = " " + processed.strip() + " "
    val esc = Pattern.quote(original)
    val p = Pattern.compile(
      raw"\W+(($unitAlt)[.,\s]*$esc)\W+|\W+($esc\s*($unitAlt))\W+")
    val m = p.matcher(padded)
    if (m.find()) {
      if (m.group(3) != null) (Some(unitsMap(m.group(4).strip())), m.group(3).strip())
      else (Some(unitsMap(m.group(2).strip())), m.group(1).strip())
    } else (None, original)
  }

  /** Word-boundary tag substitution, first occurrence only
    * (standard_number_detector.py:367-381 span template). Returns the new
    * text and the match position (-1 when not found).
    */
  private def consumeOnceAt(text: String, original: String): (String, Int) = {
    val p = Pattern.compile(raw"\b" + Pattern.quote(original) + raw"\b")
    val m = p.matcher(text)
    if (!m.find()) (text, -1)
    else (text.substring(0, m.start()) + tag + text.substring(m.end()), m.start())
  }
}
