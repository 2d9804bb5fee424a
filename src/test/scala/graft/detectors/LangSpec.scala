package graft.detectors

import java.time.{LocalDate, LocalDateTime}

import org.scalatest.funsuite.AnyFunSuite

import graft.detectors.lang.{LangData, StandardDateRegex, StandardTimeRegex}

/** Golden cases for the CSV-driven per-language date/time engines (F27/F30).
  * Expectations mirror the reference's documented examples
  * (standard_date_regex.py parser docstrings, standard_time_regex.py:222-233)
  * and the hi case of ner_v2/tests/temporal/time/time_ner_tests.yaml (hi_1).
  * Reference date 2026-01-15 is a Thursday.
  */
class LangSpec extends AnyFunSuite {

  private val refDate = LocalDate.of(2026, 1, 15) // Thursday
  private def dateDet(pastRef: Boolean = false) =
    new StandardDateRegex(LangData.date("hi"), refDate, pastRef)

  private def one(d: Seq[DetectedDate]): DetectedDate = {
    assert(d.length == 1, s"expected 1 detection, got $d")
    d.head
  }

  test("hi relative dates: aaj / kal / parso") {
    assert(one(dateDet().detect("chalo aaj milte hain")) ==
      DetectedDate(15, 1, 2026, "date", "aaj"))
    assert(one(dateDet().detect("kal chalenge")) ==
      DetectedDate(16, 1, 2026, "date", "kal"))
    assert(one(dateDet().detect("parso aana")) ==
      DetectedDate(17, 1, 2026, "date", "parso"))
    // past reference flips the direction
    assert(one(dateDet(pastRef = true).detect("kal aya tha")) ==
      DetectedDate(14, 1, 2026, "date", "kal"))
  }

  test("hi day+month: '2 july' resolves to nearest future occurrence") {
    assert(one(dateDet().detect("2 july ko aana")) ==
      DetectedDate(2, 7, 2026, "date", "2 july"))
    // date already passed this year -> next year
    assert(one(dateDet().detect("2 january ko aana")) ==
      DetectedDate(2, 1, 2027, "date", "2 january"))
    // past reference -> most recent past occurrence
    assert(one(dateDet(pastRef = true).detect("2 july ko aya tha")) ==
      DetectedDate(2, 7, 2025, "date", "2 july"))
  }

  test("hi devanagari numerals and digits") {
    assert(one(dateDet().detect("१२ july ko")) ==
      DetectedDate(12, 7, 2026, "date", "१२ july"))
    assert(one(dateDet().detect("दो july ko")) ==
      DetectedDate(2, 7, 2026, "date", "दो july"))
  }

  test("hi month-reference dates: 'X tarikh' forms") {
    // day not yet passed -> this month
    assert(one(dateDet().detect("20 tarikh ko chalenge")) ==
      DetectedDate(20, 1, 2026, "date", "20 tarikh"))
    // day passed -> next month
    assert(one(dateDet().detect("5 tarikh ko chalenge")) ==
      DetectedDate(5, 2, 2026, "date", "5 tarikh"))
    // explicit next-month reference (ref month_2 form)
    assert(one(dateDet().detect("agle mahine ki 2 tarikh ko")) ==
      DetectedDate(2, 2, 2026, "date", "agle mahine ki 2 tarikh"))
  }

  test("hi day diffs: '2 din baad'") {
    assert(one(dateDet().detect("2 din baad aana")) ==
      DetectedDate(17, 1, 2026, "date", "2 din baad"))
  }

  test("hi weekdays: bare and diff-referenced") {
    // coming monday from Thursday 2026-01-15
    val bare = dateDet().detect("somvar ko milte hain")
    assert(one(bare) == DetectedDate(19, 1, 2026, "date", "somvar"))
    // next monday
    assert(one(dateDet().detect("agla somvar chalenge")) ==
      DetectedDate(26, 1, 2026, "date", "agla somvar"))
  }

  test("hi gregorian d/m/y with unicode digit translation") {
    assert(one(dateDet().detect("15/2/26 ko aana")) ==
      DetectedDate(15, 2, 2026, "date", "15/2/26"))
    // devanagari digits: original text preserved
    assert(one(dateDet().detect("१/३/६६ ko janm hua")) ==
      DetectedDate(1, 3, 2066, "date", "१/३/६६"))
    // no year, already passed -> next year
    assert(one(dateDet().detect("milo 2/1 ko")) ==
      DetectedDate(2, 1, 2027, "date", "2/1"))
    // impossible date is skipped, not crashed on
    assert(dateDet().detect("31/11 ko").isEmpty)
  }

  test("bn tables load and detect relative dates") {
    val det = new StandardDateRegex(LangData.date("bn"), refDate)
    // বন tables: 'kal'-equivalent আগামীকাল (+1)
    val out = det.detect("আগামীকাল আসব")
    assert(out.nonEmpty && out.head.dd == 16 && out.head.mm == 1)
  }

  test("every built-in language's tables compile into working engines") {
    for (l <- LangData.builtinDateLanguages) {
      val det = new StandardDateRegex(LangData.date(l), refDate)
      // the gregorian format is language-independent — must fire everywhere
      assert(det.detect("15/2/26 ko").nonEmpty, s"date lang $l")
    }
    for (l <- LangData.builtinTimeLanguages) {
      val det = new StandardTimeRegex(LangData.time(l), refTime)
      assert(det.detect("5:30").nonEmpty, s"time lang $l")
    }
    // spot semantics beyond loading: ta 'நாளை' (tomorrow), mr 'उद्या'
    assert(new StandardDateRegex(LangData.date("ta"), refDate)
      .detect("நாளை வருவேன்").headOption.exists(_.dd == 16))
    assert(new StandardDateRegex(LangData.date("mr"), refDate)
      .detect("उद्या येतो").headOption.exists(_.dd == 16))
  }

  // ---- time ----

  private val refTime = LocalDateTime.of(2026, 1, 15, 14, 15)
  private def timeDet(lang: String = "hi") =
    new StandardTimeRegex(LangData.time(lang), refTime)

  private def oneT(d: Seq[DetectedTime]): DetectedTime = {
    assert(d.length == 1, s"expected 1 detection, got $d")
    d.head
  }

  test("hi time: reference YAML case hi_1 'सुबह 10 बजे'") {
    assert(oneT(timeDet().detect("सुबह 10 बजे")) ==
      DetectedTime(10, 0, "am", "सुबह 10 बजे"))
  }

  test("hi time: meridiem words and ref magnitudes") {
    assert(oneT(timeDet().detect("shaam me 5 baje")) ==
      DetectedTime(5, 0, "pm", "shaam me 5 baje"))
    // paune 9 = 8:45 (ref_datetime -0.25 applied to the hour)
    assert(oneT(timeDet().detect("subah me paune 9 baje")) ==
      DetectedTime(8, 45, "am", "subah me paune 9 baje"))
    // saade 2 = 2:30; 14:15 now -> 2:30 within coming 12h -> pm
    assert(oneT(timeDet().detect("saade 2 baje")) ==
      DetectedTime(2, 30, "pm", "saade 2 baje"))
  }

  test("hi time: hour+minute and relative diff") {
    assert(oneT(timeDet().detect("2 bajkar 30 minute")) ==
      DetectedTime(2, 30, "pm", "2 bajkar 30 minute"))
    // '30 minute baad' -> relative difference from now
    assert(oneT(timeDet().detect("30 minute baad aana")) ==
      DetectedTime(0, 30, "df", "30 minute baad"))
  }

  test("hi time: colon format with meridiem window") {
    assert(oneT(timeDet().detect("5:30 baje aana")) ==
      DetectedTime(5, 30, "pm", "5:30"))
  }

  test("bn time tables load: colon format with bengali digits") {
    val out = timeDet("bn").detect("১০:৩০ এ আসব")
    assert(out.nonEmpty && out.head.hh == 10 && out.head.mm == 30)
  }
}
