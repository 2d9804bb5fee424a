package graft.detectors

import java.time.LocalDate
import org.scalatest.funsuite.AnyFunSuite

/** Golden cases in the spirit of the reference's temporal YAML suites
  * (ner_v2/tests/temporal/...), with a frozen reference date — 2026-08-16,
  * a Sunday — instead of the reference's frozen clock.
  */
class DateTimeSpec extends AnyFunSuite {

  private val ref = LocalDate.of(2026, 8, 16) // Sunday
  private val dd = new DateDetector(ref)

  private def dates(text: String): Seq[(Int, Int, Int)] =
    dd.detect(text).map(d => (d.dd, d.mm, d.yy))

  test("gregorian d/m/y with separators") {
    assert(dates("flight on 16/08/2026 please") == Seq((16, 8, 2026)))
    assert(dates("16-08-26") == Seq((16, 8, 2026)))
    assert(dates("on 1.12.2027") == Seq((1, 12, 2027)))
    assert(dates("99/99/9999").isEmpty)
  }

  test("relative dates against the frozen reference") {
    assert(dates("let us meet tomorrow") == Seq((17, 8, 2026)))
    assert(dates("yesterday was nice; day after tomorrow works") ==
      Seq((15, 8, 2026), (18, 8, 2026)))
    assert(dates("today today") == Seq((16, 8, 2026), (16, 8, 2026)))
  }

  test("day+month and month+day, yearless resolves forward") {
    assert(dates("16th aug to 27th aug") == Seq((16, 8, 2026), (27, 8, 2026)))
    assert(dates("on 5 january") == Seq((5, 1, 2027))) // already past → next year
    assert(dates("august 21, 2027") == Seq((21, 8, 2027)))
    assert(dates("sept 3") == Seq((3, 9, 2026)))
  }

  test("after-days and weekday references") {
    assert(dates("remind me in 10 days") == Seq((26, 8, 2026)))
    assert(dates("3 days later") == Seq((19, 8, 2026)))
    assert(dates("see you next monday") == Seq((17, 8, 2026)))
    assert(dates("this friday") == Seq((21, 8, 2026)))
    // bare weekday = nearest upcoming, today counts (ref is a Sunday)
    assert(dates("sunday plans") == Seq((16, 8, 2026)))
    assert(dates("last tuesday") == Seq((11, 8, 2026)))
    assert(dd.detect("next monday").head.dtype == "day_within_one_week")
  }

  test("consumption: explicit date parsed first, weekday word separately") {
    // pipeline order: gregorian before weekday (ordered alternation with
    // consumption) — the numeric span is claimed by the gregorian format
    val r = dd.detect("on 16/08/2026 not on monday")
    assert(r.length == 2)
    assert(r.head.original == "16/08/2026" && r.head.dtype == "date")
    assert(r(1).original == "monday" && r(1).dtype == "day_within_one_week")
  }

  private val td = new TimeDetector()
  private def times(text: String): Seq[(Int, Int, String)] =
    td.detect(text).map(t => (t.hh, t.mm, t.nn))

  test("clock with meridiem — hours not normalized (ref yaml en_1)") {
    assert(times("the time is 12:35 am est") == Seq((12, 35, "am")))
    assert(times("meet me at 10:33 pm at the cafe") == Seq((10, 33, "pm")))
    assert(times("02 33 p.m works") == Seq((2, 33, "pm")))
    assert(times("7 pm or 7.30 pm") == Seq((7, 0, "pm"), (7, 30, "pm")))
  }

  test("24h clock and difference form") {
    assert(times("arrives 19:30") == Seq((19, 30, "hrs")))
    assert(times("in 20 mins") == Seq((0, 20, "df")))
    assert(times("after 2 hours") == Seq((2, 0, "df")))
    assert(times("no time here").isEmpty)
  }

  test("span ordering across formats") {
    val r = td.detect("in 15 minutes or at 8 pm")
    assert(r.map(_.nn) == Seq("df", "pm"))
  }
}
