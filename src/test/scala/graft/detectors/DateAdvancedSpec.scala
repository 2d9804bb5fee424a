package graft.detectors

import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite

import graft.detectors.lang.{LangData, StandardDateRegex}

/** Mirror of the reference's en date unit tests
  * (ner_v2/tests/temporal/date/en/test_date_detection.py) against
  * DateAdvancedDetector. The reference tests freeze nothing and compute
  * expectations from datetime.now(); here the reference date is pinned to
  * 2026-08-16 and the same arithmetic is applied, so every expectation
  * below is the reference's own formula evaluated at that date.
  */
class DateAdvancedSpec extends AnyFunSuite {

  private val ref = LocalDate.of(2026, 8, 16) // Sunday
  private def det(locale: String) = new DateAdvancedDetector(ref, Some(locale))

  private def flags(a: AdvancedDate): (Boolean, Boolean, Boolean, Boolean, Boolean) =
    (a.normal, a.startRange, a.endRange, a.from, a.to)

  test("date range ddth of mmm to ddth: '2nd jan to 5th'") {
    // reference: year1 = year2 = now.year + 1 because Aug > Jan
    val r = det("en-in").detect("2nd jan to 5th")
    assert(r.length == 2)
    val start = r.find(_.startRange).get
    assert((start.value.dd, start.value.mm, start.value.yy) == ((2, 1, 2027)))
    assert(flags(start) == ((false, true, false, false, false)))
    val end = r.find(_.endRange).get
    assert((end.value.dd, end.value.mm, end.value.yy) == ((5, 1, 2027)))
    assert(flags(end) == ((false, false, true, false, false)))
    // original_texts.count(message) == 2: both carry the whole span
    assert(r.count(_.original == "2nd jan to 5th") == 2)
  }

  test("day range for nth week of month: 'first week of jan'") {
    // the reference test mocks get_weekdays_for_month to [1, 7]; unmocked,
    // calendar.monthcalendar(2027, 1) week 1 (Monday-start) holds days
    // 1-3 (2027-01-01 is a Friday) — one normal date per day, all sharing
    // the matched span (reference quirk: normal, NOT start/end range)
    val r = det("en-in").detect("first week of jan")
    assert(r.map(a => (a.value.dd, a.value.mm, a.value.yy)) ==
      Seq((1, 1, 2027), (2, 1, 2027), (3, 1, 2027)))
    assert(r.forall(a => flags(a) == ((true, false, false, false, false))))
    assert(r.forall(_.original == "first week of jan"))
  }

  test("locale en-us: '2/3/19' reads month-first") {
    val r = det("en-us").detect("2/3/19")
    assert(r.length == 1)
    assert((r.head.value.dd, r.head.value.mm, r.head.value.yy) == ((3, 2, 2019)))
    assert(flags(r.head) == ((true, false, false, false, false)))
    assert(r.head.original == "2/3/19")
  }

  test("locale en-in: '2/3/17' reads day-first") {
    val r = det("en-in").detect("2/3/17")
    assert(r.length == 1)
    assert((r.head.value.dd, r.head.value.mm, r.head.value.yy) == ((2, 3, 2017)))
    assert(flags(r.head) == ((true, false, false, false, false)))
  }

  test("gregorian year/month/day: '2017/12/01'") {
    val r = det("en-in").detect("2017/12/01")
    assert(r.length == 1)
    assert((r.head.value.dd, r.head.value.mm, r.head.value.yy) == ((1, 12, 2017)))
    assert(flags(r.head) == ((true, false, false, false, false)))
  }

  test("gregorian advanced day month year: '02 january 1972'") {
    val r = det("en-in").detect("02 january 1972")
    assert(r.length == 1)
    assert((r.head.value.dd, r.head.value.mm, r.head.value.yy) == ((2, 1, 1972)))
    assert(flags(r.head) == ((true, false, false, false, false)))
  }

  test("gregorian advanced year month day: '1972 january 2'") {
    val r = det("en-in").detect("1972 january 2")
    assert(r.length == 1)
    assert((r.head.value.dd, r.head.value.mm, r.head.value.yy) == ((2, 1, 1972)))
  }

  test("gregorian year day month: '2099 21st Nov'") {
    val r = det("en-in").detect("2099 21st Nov")
    assert(r.length == 1)
    assert((r.head.value.dd, r.head.value.mm, r.head.value.yy) == ((21, 11, 2099)))
  }

  test("hi gregorian dd/mm/yy with past reference: '१/३/६६' → 1966") {
    // the hi path runs the CSV-driven engine; past_date_referenced sends a
    // future-landing two-digit year to the previous century
    val d = new StandardDateRegex(LangData.date("hi"), ref, pastDateReferenced = true)
    val r = d.detect("१/३/६६")
    assert(r.length == 1)
    assert((r.head.dd, r.head.mm, r.head.yy) == ((1, 3, 1966)))
    assert(r.head.original == "१/३/६६")
  }

  test("en past reference two-digit year via DateDetector: '2/3/66'") {
    val d = new DateDetector(ref, pastDateReferenced = true)
    val r = d.detect("2/3/66")
    assert(r.map(x => (x.dd, x.mm, x.yy)) == Seq((2, 3, 1966)))
  }

  test("advanced: departure and return keywords set from/to") {
    val dep = det("en-in").detect("departing on 21/11/2026")
    assert(dep.length == 1 && dep.head.from && !dep.head.normal)
    val ret = det("en-in").detect("returning on 25/11/2026")
    assert(ret.length == 1 && ret.head.to && !ret.head.normal)
  }

  test("advanced: pairwise split range 'monday to friday'") {
    // ref 2026-08-16 is a Sunday: monday → 2026-08-17, friday → 2026-08-21
    val r = det("en-in").detect("monday to friday")
    assert(r.exists(a => a.startRange && a.value.dd == 17))
    assert(r.exists(a => a.endRange && a.value.dd == 21))
  }
}
