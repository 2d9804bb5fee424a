package graft.detectors

import java.time.LocalDate
import org.scalatest.funsuite.AnyFunSuite
import graft.analyzer.NlpUtils

class DateRangeSpec extends AnyFunSuite {

  private val ref = LocalDate.of(2026, 8, 16)
  private val rd = new DateRangeDetector(ref)

  test("explicit pair range — the SURVEY F28 example") {
    val r = rd.detect("travel 16th aug to 27th aug please")
    assert(r.length == 1)
    val h = r.head
    assert(h.rangeType == "range")
    assert(h.start.map(d => (d.dd, d.mm)).contains((16, 8)))
    assert(h.end.map(d => (d.dd, d.mm)).contains((27, 8)))
    assert(h.original == "16th aug to 27th aug")
  }

  test("from/until open ranges and normal passthrough") {
    val r1 = rd.detect("from tomorrow")
    assert(r1.head.rangeType == "start_range" &&
      r1.head.start.map(_.dd).contains(17))
    val r2 = rd.detect("finish by 20/08/2026")
    assert(r2.head.rangeType == "end_range" &&
      r2.head.end.map(_.dd).contains(20))
    val r3 = rd.detect("meet on monday")
    assert(r3.head.rangeType == "normal")
  }

  test("between ... and ...") {
    val r = rd.detect("anytime between 1/09/2026 and 5/09/2026")
    assert(r.head.rangeType == "range")
    assert(r.head.start.map(_.dd).contains(1) && r.head.end.map(_.dd).contains(5))
  }

  test("ngram stopword exclusion + regex chain + asr email") {
    assert(NlpUtils.ngrams(Seq("the", "of", "spark", "merge"), 2) ==
      Seq("of spark", "spark merge")) // "the of" dropped: all stopwords
    assert(NlpUtils.stripPunctuation("a,b...c!") == "a b c")
    assert(NlpUtils.normalizeAsrEmail("john at gmail dot com") == "john@gmail.com")
    assert(NlpUtils.normalizeAsrEmail("a at the rate b dot co") == "a@b.co")
  }
}
