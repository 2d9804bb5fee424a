package graft.detectors

import java.time.LocalDate
import java.util.regex.Pattern
import scala.collection.mutable.ListBuffer

/** Date-range classification (reference `_detect_range`,
  * ner_v2/detectors/temporal/date/date_detection.py:166-300): detected
  * dates are tagged as placeholders, then span patterns classify
  * from/to pairs ("16th aug to 27th aug", "from X till Y",
  * "between X and Y"), open starts ("from X", "after X") and open ends
  * ("until X", "before X"). Unclassified dates pass through as `normal`.
  */
final case class DetectedDateRange(start: Option[DetectedDate],
    end: Option[DetectedDate], rangeType: String, original: String)

final class DateRangeDetector(referenceDate: LocalDate) {

  private val dd = new DateDetector(referenceDate)
  private val ph = raw"__ddate_(\d+)__"
  private val pPair = Pattern.compile(
    raw"(?:from\s+|between\s+)?$ph\s*(?:to|till|until|and|-)\s*$ph")
  private val pStart = Pattern.compile(raw"(?:from|after|starting)\s+$ph")
  private val pEnd = Pattern.compile(raw"(?:until|till|before|by|upto|up to)\s+$ph")
  private val pLone = Pattern.compile(ph)

  def detect(text0: String): Seq[DetectedDateRange] = {
    val lowered = text0.toLowerCase(java.util.Locale.ROOT)
    val dates = dd.detect(lowered)

    var tagged = lowered
    val byIdx = dates.zipWithIndex.map { case (d, i) =>
      val m = Pattern.compile(Pattern.quote(d.original)).matcher(tagged)
      if (m.find()) {
        tagged = tagged.substring(0, m.start()) + s"__ddate_${i}__" +
          tagged.substring(m.end())
      }
      i -> d
    }.toMap

    val results = ListBuffer.empty[(Int, DetectedDateRange)]

    def original(span: String): String =
      raw"__ddate_(\d+)__".r.replaceAllIn(span,
        m => java.util.regex.Matcher.quoteReplacement(byIdx(m.group(1).toInt).original))

    def run(p: Pattern)(mk: java.util.regex.Matcher => DetectedDateRange): Unit = {
      val m = p.matcher(tagged)
      val found = ListBuffer.empty[(String, DetectedDateRange)]
      while (m.find()) found += ((m.group(), mk(m)))
      for ((span, r) <- found) {
        val mm = Pattern.compile(Pattern.quote(span)).matcher(tagged)
        if (mm.find()) {
          results += ((mm.start(), r))
          tagged = tagged.substring(0, mm.start()) + "__date_range__" +
            tagged.substring(mm.end())
        }
      }
    }

    run(pPair) { m =>
      DetectedDateRange(Some(byIdx(m.group(1).toInt)), Some(byIdx(m.group(2).toInt)),
        "range", original(m.group()))
    }
    run(pStart) { m =>
      DetectedDateRange(Some(byIdx(m.group(1).toInt)), None,
        "start_range", original(m.group()))
    }
    run(pEnd) { m =>
      DetectedDateRange(None, Some(byIdx(m.group(1).toInt)),
        "end_range", original(m.group()))
    }
    run(pLone) { m =>
      val d = byIdx(m.group(1).toInt)
      DetectedDateRange(Some(d), Some(d), "normal", original(m.group()))
    }

    results.sortBy(_._1).map(_._2).toSeq
  }
}
