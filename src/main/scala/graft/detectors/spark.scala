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

  /** Dates need an explicit reference date (never the wall clock —
    * deterministic at any time and parallelism). Output
    * array<struct<dd:int, mm:int, yy:int, dtype:string, original:string>>.
    */
  def detect_dates(referenceDate: java.time.LocalDate): Column => Column = {
    val refStr = referenceDate.toString
    val u = udf((text: String) => {
      if (text == null) Seq.empty[(Int, Int, Int, String, String)]
      else new DateDetector(java.time.LocalDate.parse(refStr)).detect(text)
        .map(d => (d.dd, d.mm, d.yy, d.dtype, d.original))
    })
    c => u(c)
  }

  val detect_times: Column => Column = {
    val u = udf((text: String) =>
      if (text == null) Seq.empty[(Int, Int, String, String)]
      else new TimeDetector().detect(text).map(t => (t.hh, t.mm, t.nn, t.original)))
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

  private object Pattern {
    def validate(p: String): Unit = java.util.regex.Pattern.compile(p)
  }
}
