package graft.detectors

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Column-level wrappers: each detector returns
  * array<struct<value:string, unit:string, original:string>> per row —
  * UDTF-like multi-match output modeled as array + explode
  * (SURVEY.md §2.10). Detections run per row, zero shuffles; the detector
  * objects compile their regexes once per executor (lazy vals in objects).
  */
object functions {

  private def pack(ds: Seq[Detected]): Seq[(String, Option[String], String)] =
    ds.map(d => (d.value, d.unit, d.original))

  private lazy val defaultNumberDetector = new NumberDetector()

  val detect_numbers: Column => Column = {
    val u = udf((text: String) =>
      if (text == null) Seq.empty[(String, Option[String], String)]
      else pack(defaultNumberDetector.detect(text)))
    c => u(c)
  }

  def detect_numbers_with(entity: String, units: Map[String, String],
      minDigits: Int = 1, maxDigits: Int = 6): Column => Column = {
    lazy val det = new NumberDetector(entity, units, minDigits, maxDigits)
    val u = udf((text: String) =>
      if (text == null) Seq.empty[(String, Option[String], String)]
      else pack(det.detect(text)))
    c => u(c)
  }

  val detect_emails: Column => Column = {
    val u = udf((text: String) =>
      if (text == null) Seq.empty[(String, Option[String], String)]
      else pack(PatternDetectors.emails(text)))
    c => u(c)
  }

  val detect_pnrs: Column => Column = {
    val u = udf((text: String) =>
      if (text == null) Seq.empty[(String, Option[String], String)]
      else pack(PatternDetectors.pnrs(text)))
    c => u(c)
  }

  val detect_phones: Column => Column = {
    val u = udf((text: String) =>
      if (text == null) Seq.empty[(String, Option[String], String)]
      else pack(PatternDetectors.phones(text)))
    c => u(c)
  }

  /** Locale-aware phone detection (F16): per-region calling-code + pattern
    * tables. Output array<struct<country_calling_code, value, original>>.
    */
  def detect_phone_numbers(locale: String = "en-IN"): Column => Column = {
    val u = udf((text: String) =>
      if (text == null) Seq.empty[(String, String, String)]
      else PhoneNumbers.detect(text, locale)
        .map(d => (d.countryCallingCode, d.value, d.original)))
    c => u(c)
  }

  /** Chinese digit-word phone detection (F17). */
  def detect_phone_numbers_zh(locale: String = "zh-CN"): Column => Column = {
    val u = udf((text: String) =>
      if (text == null) Seq.empty[(String, String, String)]
      else ChinesePhone.detect(text, locale)
        .map(d => (d.countryCallingCode, d.value, d.original)))
    c => u(c)
  }

  /** Dates need an explicit reference date (never the wall clock —
    * deterministic at any time and parallelism). Output
    * array<struct<dd:int, mm:int, yy:int, dtype:string, original:string>>.
    */
  // per-executor caches: detector construction compiles the large
  // month/weekday alternation Patterns — once per (refDate, JVM), never
  // per row
  private val dateDetCache =
    scala.collection.concurrent.TrieMap.empty[String, DateDetector]
  private lazy val defaultTimeDetector = new TimeDetector()

  def detect_dates(referenceDate: java.time.LocalDate): Column => Column = {
    val refStr = referenceDate.toString
    val u = udf((text: String) => {
      if (text == null) Seq.empty[(Int, Int, Int, String, String)]
      else dateDetCache.getOrElseUpdate(refStr,
          new DateDetector(java.time.LocalDate.parse(refStr)))
        .detect(text).map(d => (d.dd, d.mm, d.yy, d.dtype, d.original))
    })
    c => u(c)
  }

  val detect_times: Column => Column = {
    val u = udf((text: String) =>
      if (text == null) Seq.empty[(Int, Int, String, String)]
      else defaultTimeDetector.detect(text)
        .map(t => (t.hh, t.mm, t.nn, t.original)))
    c => u(c)
  }

  /** detect_times with an explicit reference clock for the bare-time
    * meridiem rule ("at 5" → am/pm within 12 h of `referenceTime`) —
    * the deterministic stand-in for the reference's datetime.now().
    */
  def detect_times_at(
      referenceTime: java.time.LocalDateTime): Column => Column = {
    val refStr = referenceTime.toString
    val u = udf((text: String) =>
      if (text == null) Seq.empty[(Int, Int, String, String)]
      else timeDetectorCache.getOrElseUpdate(refStr,
          new TimeDetector(referenceTime = java.time.LocalDateTime.parse(refStr)))
        .detect(text).map(t => (t.hh, t.mm, t.nn, t.original)))
    c => u(c)
  }
  private val timeDetectorCache =
    scala.collection.concurrent.TrieMap.empty[String, TimeDetector]

  // per-executor detector caches for the CSV-driven language engines:
  // the compiled regex families are built once per (lang, ref) per JVM,
  // not per row
  private val langDateCache =
    scala.collection.concurrent.TrieMap.empty[(String, String, Boolean), lang.StandardDateRegex]
  private val langTimeCache =
    scala.collection.concurrent.TrieMap.empty[(String, String), lang.StandardTimeRegex]

  /** Language-generic date detection (F27): CSV-driven regex families
    * (built-in: hi, bn). Same envelope as detect_dates.
    */
  def detect_dates_lang(language: String, referenceDate: java.time.LocalDate,
      pastDateReferenced: Boolean = false): Column => Column = {
    val refStr = referenceDate.toString
    val u = udf((text: String) =>
      if (text == null) Seq.empty[(Int, Int, Int, String, String)]
      else langDateCache.getOrElseUpdate((language, refStr, pastDateReferenced),
          new lang.StandardDateRegex(lang.LangData.date(language),
            java.time.LocalDate.parse(refStr), pastDateReferenced))
        .detect(text).map(d => (d.dd, d.mm, d.yy, d.dtype, d.original)))
    c => u(c)
  }

  /** Language-generic time detection (F30). Same envelope as detect_times. */
  def detect_times_lang(language: String,
      referenceTime: java.time.LocalDateTime): Column => Column = {
    val refStr = referenceTime.toString
    val u = udf((text: String) =>
      if (text == null) Seq.empty[(Int, Int, String, String)]
      else langTimeCache.getOrElseUpdate((language, refStr),
          new lang.StandardTimeRegex(lang.LangData.time(language),
            java.time.LocalDateTime.parse(refStr)))
        .detect(text).map(t => (t.hh, t.mm, t.nn, t.original)))
    c => u(c)
  }

  private val langNumberCache =
    scala.collection.concurrent.TrieMap.empty[(String, Option[String]), NumberDetection]
  private val langRangeCache =
    scala.collection.concurrent.TrieMap.empty[(String, Option[String]), NumberRangeDetector]

  /** Language-generic number detection (F18/F19 breadth): CSV-driven
    * vocabularies (built-in: hi, bn, gu, mr, ta, te, zh-TW). Same envelope
    * as detect_numbers.
    */
  def detect_numbers_lang(language: String,
      unitType: Option[String] = None): Column => Column = {
    val u = udf((text: String) =>
      if (text == null) Seq.empty[(String, Option[String], String)]
      else pack(langNumberCache.getOrElseUpdate((language, unitType),
        // plain surface: numbers without a unit of the requested type are
        // dropped (reference detect_without_unit=False default)
        lang.NumberDetectors.forLanguage(language, unitType,
          requireUnit = unitType.isDefined)).detect(text)))
    c => u(c)
  }

  /** Language-generic number-range detection (F22 breadth; built-in: hi).
    * Same envelope as detect_number_ranges.
    */
  def detect_number_ranges_lang(language: String,
      unitType: Option[String] = None): Column => Column = {
    val u = udf((text: String) =>
      if (text == null) Seq.empty[(Option[String], Option[String], Option[String], String)]
      else langRangeCache.getOrElseUpdate((language, unitType),
          lang.NumberRangeDetectors.forLanguage(language, unitType))
        .detect(text).map(r => (r.minValue, r.maxValue, r.unit, r.original)))
    c => u(c)
  }

  val detect_number_ranges: Column => Column = {
    lazy val det = new NumberRangeDetector()
    val u = udf((text: String) =>
      if (text == null) Seq.empty[(Option[String], Option[String], Option[String], String)]
      else det.detect(text).map(r => (r.minValue, r.maxValue, r.unit, r.original)))
    c => u(c)
  }

  val detect_budgets: Column => Column = {
    lazy val det = new BudgetDetector()
    val u = udf((text: String) =>
      if (text == null) Seq.empty[(Long, Long, String, String)]
      else det.detect(text).map(b => (b.minBudget, b.maxBudget, b.btype, b.original)))
    c => u(c)
  }

  def detect_regex(pattern: String, maxMatches: Int = 50): Column => Column = {
    Pattern.validate(pattern)
    val u = udf((text: String) =>
      if (text == null) Seq.empty[(String, Option[String], String)]
      else pack(PatternDetectors.custom(text, pattern, maxMatches)))
    c => u(c)
  }

  /** ASR-mode regex detector (F11): text is fuzzy-fitted to the pattern
    * (extra-character deletion + spoken-letter mapping) before matching.
    */
  def detect_regex_asr(pattern: String, maxMatches: Int = 50): Column => Column = {
    Pattern.validate(pattern)
    val u = udf((text: String) =>
      if (text == null) Seq.empty[(String, Option[String], String)]
      else pack(PatternDetectors.customAsr(text, pattern, maxMatches)))
    c => u(c)
  }

  /** Person-name detection (F31; en = the reference's POS path over the
    * bundled averaged-perceptron tagger, hi = the reference's POS-free
    * indic path — both at parity):
    * output array<struct<first_name, middle_name, last_name, original>>.
    */
  def detect_person_names(botMessage: Option[String] = None,
      language: String = "en"): Column => Column = {
    val u = udf((text: String) =>
      if (text == null) Seq.empty[(String, Option[String], Option[String], String)]
      else PersonName.detect(text, botMessage, language)
        .map(n => (n.firstName, n.middleName, n.lastName, n.original)))
    c => u(c)
  }

  private object Pattern {
    def validate(p: String): Unit = java.util.regex.Pattern.compile(p)
  }
}
