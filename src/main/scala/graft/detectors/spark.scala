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
