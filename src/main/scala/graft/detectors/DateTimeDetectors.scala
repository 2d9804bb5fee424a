package graft.detectors

import java.time.{DayOfWeek, LocalDate}
import java.util.regex.Pattern
import scala.collection.mutable.ListBuffer

/** Date detection (English subset of the reference's ordered format family —
  * ner_v2/detectors/temporal/date: pipeline order at
  * standard_date_regex.py:62-74, en formats at en/date_detection.py).
  *
  * Output struct {dd, mm, yy, type} (reference ner_v2/api.py:128-129);
  * relative dates resolve against an injected `referenceDate` instead of
  * datetime.now() — deterministic by construction (the reference reads the
  * clock at standard_date_regex.py:33-38; tests there freeze it).
  *
  * Each sub-detector consumes its span with a tag before the next runs
  * (ordered alternation with consumption), and results are span-sorted.
  */
final case class DetectedDate(dd: Int, mm: Int, yy: Int, dtype: String,
    original: String)

final class DateDetector(referenceDate: LocalDate,
    entityName: String = "date") {

  private val tag = s"__${entityName}__"

  private val monthNames: Map[String, Int] = {
    val full = Seq("january", "february", "march", "april", "may", "june",
      "july", "august", "september", "october", "november", "december")
    (full.zipWithIndex.map { case (m, i) => m -> (i + 1) } ++
      full.zipWithIndex.map { case (m, i) => m.take(3) -> (i + 1) } ++
      Seq("sept" -> 9)).toMap
  }
  private val monthAlt = monthNames.keys.toSeq.sortBy(-_.length).mkString("|")

  private val weekdays: Map[String, DayOfWeek] = {
    val full = Seq("monday", "tuesday", "wednesday", "thursday", "friday",
      "saturday", "sunday")
    (full.map(w => w -> DayOfWeek.valueOf(w.toUpperCase)) ++
      full.map(w => w.take(3) -> DayOfWeek.valueOf(w.toUpperCase)) ++
      Seq("tues" -> DayOfWeek.TUESDAY, "thurs" -> DayOfWeek.THURSDAY)).toMap
  }
  private val weekdayAlt = weekdays.keys.toSeq.sortBy(-_.length).mkString("|")

  // ordered sub-detector pipeline (reference order: explicit gregorian
  // first, then relative, day+month, diffs, weekdays)
  private val ddmmyyyy = Pattern.compile(
    raw"\b(\d{1,2})\s?[/.\-]\s?(\d{1,2})(?:\s?[/.\-]\s?((?:\d{2})?\d{2}))\b")
  private val dayMonth = Pattern.compile(
    raw"\b(\d{1,2})\s*(?:st|nd|rd|th)?\s*(?:of\s+)?($monthAlt)\.?(?:\s+(\d{4}))?\b")
  private val monthDay = Pattern.compile(
    raw"\b($monthAlt)\.?\s+(\d{1,2})\s*(?:st|nd|rd|th)?(?:\s*,?\s*(\d{4}))?\b")
  private val relative = Pattern.compile(
    raw"\b(day after tomorrow|day before yesterday|today|tonight|tomorrow|yesterday)\b")
  private val afterDays = Pattern.compile(
    raw"\b(?:in|after)\s+(\d{1,3})\s+days?\b|\b(\d{1,3})\s+days?\s+(?:later|from now)\b")
  private val weekdayRef = Pattern.compile(
    raw"\b(next|this|coming|last)?\s*($weekdayAlt)\b")
  private val recurrent = Pattern.compile(
    raw"\b(everyday|daily|every\s+day)\b|\bevery\s+($weekdayAlt)\b")

  private def out(d: LocalDate, dtype: String, original: String) =
    DetectedDate(d.getDayOfMonth, d.getMonthValue, d.getYear, dtype, original)

  /** Next occurrence of the weekday strictly AFTER the anchor for "next",
    * nearest upcoming (today counts) otherwise — reference
    * ner_v2/detectors/temporal/utils.py next_weekday semantics.
    */
  private def nextWeekday(anchor: LocalDate, day: DayOfWeek, strictNext: Boolean): LocalDate = {
    val diff0 = (day.getValue - anchor.getDayOfWeek.getValue + 7) % 7
    val diff = if (diff0 == 0 && strictNext) 7 else diff0
    anchor.plusDays(diff.toLong)
  }

  private def lastWeekday(anchor: LocalDate, day: DayOfWeek): LocalDate = {
    val diff0 = (anchor.getDayOfWeek.getValue - day.getValue + 7) % 7
    anchor.minusDays(if (diff0 == 0) 7 else diff0.toLong)
  }

  private def resolveYear(yRaw: String, mm: Int, dd: Int): Int = {
    if (yRaw == null || yRaw.isEmpty) {
      // yearless dates resolve to the NEXT occurrence (reference bias for
      // bookings): this year if not already past, else next year
      val candidate = LocalDate.of(referenceDate.getYear, mm, math.min(dd, 28))
      if (candidate.isBefore(referenceDate.withDayOfMonth(
        math.min(referenceDate.getDayOfMonth, 28)))) referenceDate.getYear + 1
      else referenceDate.getYear
    } else if (yRaw.length == 2) 2000 + yRaw.toInt
    else yRaw.toInt
  }

  def detect(text0: String): Seq[DetectedDate] = {
    var processed = text0.toLowerCase(java.util.Locale.ROOT)
    val results = ListBuffer.empty[(Int, DetectedDate)]

    def consume(original: String): Int = {
      val p = Pattern.compile(raw"\b" + Pattern.quote(original) + raw"\b")
      val m = p.matcher(processed)
      if (!m.find()) -1
      else {
        val at = m.start()
        processed = processed.substring(0, at) + tag + processed.substring(m.end())
        at
      }
    }

    def add(d: DetectedDate): Unit = {
      val at = consume(d.original)
      if (at >= 0) results += ((at, d))
    }

    def valid(dd: Int, mm: Int, yy: Int): Boolean =
      mm >= 1 && mm <= 12 && dd >= 1 &&
        dd <= LocalDate.of(yy, mm, 1).lengthOfMonth()

    // 1. dd/mm/yyyy (d-m-y order, the reference default locale ordering)
    locally {
      val m = ddmmyyyy.matcher(processed)
      val found = ListBuffer.empty[DetectedDate]
      while (m.find()) {
        val dd = m.group(1).toInt
        val mm = m.group(2).toInt
        val yy = resolveYear(m.group(3), if (mm >= 1 && mm <= 12) mm else 1, 1)
        if (valid(dd, mm, yy)) found += DetectedDate(dd, mm, yy, "date", m.group())
      }
      found.foreach(add)
    }
    // 2. relative words
    locally {
      val m = relative.matcher(processed)
      val found = ListBuffer.empty[DetectedDate]
      while (m.find()) {
        val d = m.group(1) match {
          case "today" | "tonight" => referenceDate
          case "tomorrow" => referenceDate.plusDays(1)
          case "yesterday" => referenceDate.minusDays(1)
          case "day after tomorrow" => referenceDate.plusDays(2)
          case "day before yesterday" => referenceDate.minusDays(2)
        }
        found += out(d, "date", m.group())
      }
      found.foreach(add)
    }
    // 3. "16th aug [2024]" / "16 of august"
    locally {
      val m = dayMonth.matcher(processed)
      val found = ListBuffer.empty[DetectedDate]
      while (m.find()) {
        val dd = m.group(1).toInt
        val mm = monthNames(m.group(2))
        val yy = resolveYear(m.group(3), mm, dd)
        if (valid(dd, mm, yy)) found += DetectedDate(dd, mm, yy, "date", m.group().strip())
      }
      found.foreach(add)
    }
    // 4. "aug 16[, 2024]"
    locally {
      val m = monthDay.matcher(processed)
      val found = ListBuffer.empty[DetectedDate]
      while (m.find()) {
        val mm = monthNames(m.group(1))
        val dd = m.group(2).toInt
        val yy = resolveYear(m.group(3), mm, dd)
        if (valid(dd, mm, yy)) found += DetectedDate(dd, mm, yy, "date", m.group().strip())
      }
      found.foreach(add)
    }
    // 5. "in/after N days", "N days later"
    locally {
      val m = afterDays.matcher(processed)
      val found = ListBuffer.empty[DetectedDate]
      while (m.find()) {
        val n = (if (m.group(1) != null) m.group(1) else m.group(2)).toInt
        found += out(referenceDate.plusDays(n.toLong), "date", m.group().strip())
      }
      found.foreach(add)
    }
    // 5b. recurrent forms: "everyday"/"daily" (type everyday), "every
    // monday" (type repeat_day resolved to the next occurrence) — reference
    // TYPE_EVERYDAY / repeat-day semantics
    locally {
      val m = recurrent.matcher(processed)
      val found = ListBuffer.empty[DetectedDate]
      while (m.find()) {
        if (m.group(2) != null) {
          val d = nextWeekday(referenceDate, weekdays(m.group(2)), strictNext = false)
          found += out(d, "repeat_day", m.group().strip())
        } else {
          found += out(referenceDate, "everyday", m.group().strip())
        }
      }
      found.foreach(add)
    }
    // 6. weekday references ("next monday", "this fri", bare "monday")
    locally {
      val m = weekdayRef.matcher(processed)
      val found = ListBuffer.empty[DetectedDate]
      while (m.find()) {
        val qualifier = Option(m.group(1)).getOrElse("")
        val day = weekdays(m.group(2))
        val d = qualifier match {
          case "last" => lastWeekday(referenceDate, day)
          case "next" => nextWeekday(referenceDate, day, strictNext = true)
          case _ => nextWeekday(referenceDate, day, strictNext = false)
        }
        found += out(d, "day_within_one_week", m.group().strip())
      }
      found.foreach(add)
    }

    results.sortBy(_._1).map(_._2).toSeq
  }
}

/** Time detection (English subset — ner_v2/detectors/temporal/time:
  * hh:mm / hh.mm / spaced with am-pm variants, bare "7 pm", 24h "19:30",
  * "20 min/hours" difference form). Output {hh, mm, nn} with
  * nn ∈ {am, pm, hrs, df} (standard_time_regex.py:64-92); meridiem hours
  * are NOT normalized (12:35 am stays hh=12 — reference time yaml en_1).
  */
final case class DetectedTime(hh: Int, mm: Int, nn: String, original: String)

final class TimeDetector(entityName: String = "time") {

  private val tag = s"__${entityName}__"

  private val meridiem = raw"(a\.?m\.?|p\.?m\.?)"
  private val clockMeridiem = Pattern.compile(
    raw"\b(\d{1,2})\s*(?:[:. ]\s*(\d{2}))?\s*$meridiem")
  private val clock24 = Pattern.compile(
    raw"\b(\d{1,2})\s*[:.]\s*(\d{2})\s*(?:hrs|hours|hr)?\b")
  private val diffTime = Pattern.compile(
    raw"\b(?:in|after)\s+(\d{1,3})\s*(min(?:ute)?s?|h(?:ou)?rs?)\b")

  def detect(text0: String): Seq[DetectedTime] = {
    var processed = text0.toLowerCase(java.util.Locale.ROOT)
    val results = ListBuffer.empty[(Int, DetectedTime)]

    def consume(original: String): Int = {
      val p = Pattern.compile(Pattern.quote(original))
      val m = p.matcher(processed)
      if (!m.find()) -1
      else {
        val at = m.start()
        processed = processed.substring(0, at) + tag + processed.substring(m.end())
        at
      }
    }
    def add(t: DetectedTime): Unit = {
      val at = consume(t.original)
      if (at >= 0) results += ((at, t))
    }

    // 1. difference form first ("in 20 mins" must not parse as clock)
    locally {
      val m = diffTime.matcher(processed)
      val found = ListBuffer.empty[DetectedTime]
      while (m.find()) {
        val n = m.group(1).toInt
        val isMin = m.group(2).startsWith("m")
        found += DetectedTime(if (isMin) 0 else n, if (isMin) n else 0, "df",
          m.group().strip())
      }
      found.foreach(add)
    }
    // 2. clock with meridiem
    locally {
      val m = clockMeridiem.matcher(processed)
      val found = ListBuffer.empty[DetectedTime]
      while (m.find()) {
        val hh = m.group(1).toInt
        val mm = Option(m.group(2)).map(_.toInt).getOrElse(0)
        if (hh >= 1 && hh <= 12 && mm < 60) {
          val nn = if (m.group(3).startsWith("a")) "am" else "pm"
          found += DetectedTime(hh, mm, nn, m.group().strip())
        }
      }
      found.foreach(add)
    }
    // 3. 24h clock
    locally {
      val m = clock24.matcher(processed)
      val found = ListBuffer.empty[DetectedTime]
      while (m.find()) {
        val hh = m.group(1).toInt
        val mm = m.group(2).toInt
        if (hh <= 23 && mm < 60) found += DetectedTime(hh, mm, "hrs", m.group().strip())
      }
      found.foreach(add)
    }

    results.sortBy(_._1).map(_._2).toSeq
  }
}
