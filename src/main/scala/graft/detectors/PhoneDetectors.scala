package graft.detectors

import java.util.regex.Pattern

import scala.collection.mutable.ListBuffer

/** A detected phone number: ITU country calling code + national number +
  * the original substring (reference envelope: phone_number_detection.py
  * detect_entity returns {country_calling_code, value} + original).
  */
final case class DetectedPhone(countryCallingCode: String, value: String,
    original: String)

/** Locale-aware phone detection (F16) — a from-scratch reimplementation of
  * the reference's phonenumbers-backed path
  * (ner_v2/detectors/pattern/phone_number/phone_number_detection.py:24-170):
  * candidate digit runs (any Unicode digits, separators allowed) are
  * accepted by length (>= 8 digits, the reference's POSSIBLE-leniency
  * behavior — arbitrary long digit runs ARE detected, as in the
  * reference); per-region metadata (calling code, trunk prefix,
  * national-number pattern) drives trunk/+CC resolution and
  * calling-code stripping, and candidates glued to letters are rejected
  * (check_for_alphas, :135-145).
  *
  * Divergence (documented): the reference's check_for_country_code
  * hardcodes the IN/US prefix mix '911|1|011 91|91' for every locale
  * (:155-160); here the strip rule is metadata-driven — the region's own
  * calling code is stripped when the remainder is a valid national number.
  * The reference's YAML cases are covered either way (PhoneSpec).
  */
object PhoneNumbers {

  final case class RegionMeta(region: String, countryCode: Int,
      trunkPrefix: Option[Char], validNational: Pattern)

  private def rx(p: String) = Pattern.compile(p)

  /** Pattern tables for the reference's test locales (+ GB as a template
    * for adding more): national-number shapes per region, mirroring the
    * metadata the reference pulls from the phonenumbers library.
    */
  val regions: Map[String, RegionMeta] = Map(
    "IN" -> RegionMeta("IN", 91, Some('0'), rx("[2-9][0-9]{9}")),
    "US" -> RegionMeta("US", 1, Some('1'), rx("[2-9][0-9]{2}[2-9][0-9]{6}")),
    "CN" -> RegionMeta("CN", 86, Some('0'), rx("1[3-9][0-9]{9}|[2-9][0-9]{8,9}")),
    "GB" -> RegionMeta("GB", 44, Some('0'), rx("7[0-9]{9}|[12][0-9]{9}")))

  /** Calling codes we can resolve from a +CC prefix, longest first. */
  private val callingCodes: Seq[String] =
    regions.values.map(_.countryCode.toString).toSeq.distinct.sortBy(-_.length)

  def regionOfLocale(locale: String): RegionMeta = {
    // 'en-IN' / 'en_in' → IN (get_country_code_from_locale)
    val m = "[-_](.*$)".r.findFirstMatchIn(locale)
    val region = m.map(_.group(1).toUpperCase(java.util.Locale.ROOT)).getOrElse("IN")
    regions.getOrElse(region, regions("IN"))
  }

  private[detectors] def asciiDigits(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val d = Character.digit(s.charAt(i), 10)
      if (d >= 0) sb.append(('0' + d).toChar)
      i += 1
    }
    sb.toString
  }

  // digit runs with separators; must start (optionally after +) and end on a
  // digit. \p{Nd} covers Devanagari etc. under UNICODE_CHARACTER_CLASS.
  private val candidateRx = Pattern.compile(
    "[+]?\\(?\\d(?:[\\d\\-. ()]*\\d)?",
    Pattern.UNICODE_CHARACTER_CLASS)

  def detect(text: String, locale: String): Seq[DetectedPhone] = {
    val region = regionOfLocale(locale)
    val padded = " " + text.toLowerCase(java.util.Locale.ROOT).strip() + " "
    val out = ListBuffer.empty[DetectedPhone]
    val m = candidateRx.matcher(padded)
    while (m.find()) {
      val original = m.group()
      val hasPlus = original.startsWith("+")
      val digits = asciiDigits(original)
      // reject candidates glued to letters (check_for_alphas): the padded
      // text must contain the original bounded by non-word chars
      val bounded = Pattern.compile(
        "\\W" + Pattern.quote(original) + "\\W",
        Pattern.UNICODE_CHARACTER_CLASS).matcher(padded).find()
      if (bounded) {
        val detected =
          if (hasPlus) {
            callingCodes.find(cc => digits.startsWith(cc)).flatMap { cc =>
              val national = digits.substring(cc.length)
              if (national.length < 8) None
              else if (cc.toInt == region.countryCode)
                Some(checkForCountryCode(national, region, original))
              else Some(DetectedPhone(cc, national, original))
            }
          } else {
            // try the trunk prefix strip first (e.g. IN '022...' → '22...')
            val national = region.trunkPrefix match {
              case Some(p) if digits.length > 1 && digits.charAt(0) == p &&
                region.validNational.matcher(digits.substring(1)).matches() =>
                digits.substring(1)
              case _ => digits
            }
            if (national.length < 8) None
            else Some(checkForCountryCode(national, region, original))
          }
        detected.foreach(out += _)
      }
    }
    out.toSeq
  }

  /** Strip the region's own calling code from an over-long national number
    * when the remainder is a valid national shape (the metadata-driven form
    * of the reference's check_for_country_code).
    */
  private def checkForCountryCode(num: String, region: RegionMeta,
      original: String): DetectedPhone = {
    val cc = region.countryCode.toString
    // a number that is ALREADY a valid national shape for the region stays
    // as-is: CN mobiles are 1[3-9]\d{9}, and the NANP '1'-strip below would
    // otherwise mangle most of them into US detections
    if (region.validNational.matcher(num).matches())
      DetectedPhone(cc, num, original.strip())
    else if (num.length > 10 && num.startsWith(cc) &&
      region.validNational.matcher(num.substring(cc.length)).matches())
      DetectedPhone(cc, num.substring(cc.length), original.strip())
    else if (num.length == 11 && num.startsWith("1") &&
      regions("US").validNational.matcher(num.substring(1)).matches())
      // NANP trunk form '1' + 10 digits (reference alternation '1\d{10}')
      DetectedPhone("1", num.substring(1), original.strip())
    else DetectedPhone(cc, num, original.strip())
  }
}

/** Chinese phone detection (F17) — the reference's ChinesePhoneDetector
  * (phone_number_detection.py:173-233): digit-word runs are extracted,
  * Chinese digits map char-for-char to ASCII (digit-by-digit, the
  * zh-TW number detector's get_number_digit_by_digit), native special
  * chars map (、→ ',' 點 → '.' 加 → '+'), then the standard locale-aware
  * matcher runs on the sanitized text. The char-for-char mapping keeps
  * spans aligned, so originals are the untranslated substrings.
  */
object ChinesePhone {

  private val digitMap: Map[Char, Char] = Map(
    '零' -> '0', '〇' -> '0',
    '一' -> '1', '壹' -> '1', '幺' -> '1',
    '二' -> '2', '貳' -> '2', '两' -> '2', '兩' -> '2',
    '三' -> '3', '叁' -> '3',
    '四' -> '4', '肆' -> '4',
    '五' -> '5', '伍' -> '5',
    '六' -> '6', '陸' -> '6',
    '七' -> '7', '柒' -> '7',
    '八' -> '8', '捌' -> '8',
    '九' -> '9', '玖' -> '9')

  private val specialMap: Map[Char, Char] =
    Map('、' -> ',', '點' -> '.', '加' -> '+')

  private[detectors] def sanitize(text: String): String =
    text.map(c => digitMap.getOrElse(c, specialMap.getOrElse(c, c)))

  // runs of digit words / digits / phone separators — the reference's
  // _text_list_for_detection (extract_digits_only with the phone format
  // regex), so CJK words around a number never block detection
  private val runRx = Pattern.compile(
    "[-(),.+\\s\\d" + Pattern.quote("零〇一壹幺二貳两兩三叁四肆五伍六陸七柒八捌九玖、點加") + "]+",
    Pattern.UNICODE_CHARACTER_CLASS)

  def detect(text: String, locale: String = "zh-CN"): Seq[DetectedPhone] = {
    val out = ListBuffer.empty[DetectedPhone]
    val m = runRx.matcher(text)
    while (m.find()) {
      val run = m.group().strip()
      if (run.nonEmpty) {
        val sanitized = sanitize(run)
        // char-for-char map keeps offsets identical → recover originals
        // positionally from the untranslated run
        val paddedSan = " " + sanitized.toLowerCase(java.util.Locale.ROOT).strip() + " "
        val paddedSrc = " " + run + " "
        PhoneNumbers.detect(sanitized, locale).foreach { d =>
          val at = paddedSan.indexOf(d.original)
          val original =
            if (at >= 0 && at + d.original.length <= paddedSrc.length)
              paddedSrc.substring(at, at + d.original.length).strip()
            else d.original
          out += DetectedPhone(d.countryCallingCode, d.value, original)
        }
      }
    }
    out.toSeq
  }
}
