package graft.detectors

import org.scalatest.funsuite.AnyFunSuite

class RangeSpec extends AnyFunSuite {

  private val rd = new NumberRangeDetector()
  private def ranges(t: String): Seq[(Option[String], Option[String])] =
    rd.detect(t).map(r => (r.minValue, r.maxValue))

  test("min-max pair with separators") {
    assert(ranges("shirts between 2000 to 3000") ==
      Seq((Some("2000"), Some("3000"))))
    assert(rd.detect("2000 to 3000").head.original == "2000 to 3000")
    assert(ranges("from 5 - 10 items") == Seq((Some("5"), Some("10"))))
  }

  test("min with prefix/suffix keywords") {
    assert(ranges("more than 500 users") == Seq((Some("500"), None)))
    assert(ranges("salary 30k onwards") == Seq((Some("30000"), None)))
    assert(ranges("above 2.5k") == Seq((Some("2500"), None)))
  }

  test("max with prefix keywords") {
    assert(ranges("upto 800 only") == Seq((None, Some("800"))))
    assert(ranges("less than 50") == Seq((None, Some("50"))))
    // reference CSV variants added in round 3
    assert(ranges("around 500 please") == Seq((None, Some("500"))))
    assert(ranges("more den 75 items") == Seq((Some("75"), None)))
  }

  test("absolute numbers become point ranges; mixed sentence span-ordered") {
    assert(ranges("exactly 42") == Seq((Some("42"), Some("42"))))
    assert(ranges("between 10 to 20 but above 100") ==
      Seq((Some("10"), Some("20")), (Some("100"), None)))
  }

  test("units flow through from the number detector") {
    val units = Map("rs" -> "rupees", "rupees" -> "rupees")
    val d = new NumberRangeDetector(unitsMap = units)
    val r = d.detect("between rs 100 to rs 200").head
    assert(r.minValue.contains("100") && r.maxValue.contains("200"))
    assert(r.unit.contains("rupees"))
  }

  private val bd = new BudgetDetector()
  private def budgets(t: String): Seq[(Long, Long)] =
    bd.detect(t).map(b => (b.minBudget, b.maxBudget))

  test("budget min-max / min / max / any (reference examples)") {
    assert(budgets("shirts between 2000 to 3000") == Seq((2000L, 3000L)))
    assert(budgets("tshirts greater than 2k") == Seq((2000L, 0L)))
    assert(budgets("rs. 1000") == Seq((0L, 1000L)))
    assert(budgets("under 1.5 lakh") == Seq((0L, 150000L)))
    assert(budgets("flat for 50l") == Seq((0L, 5000000L)))
  }

  test("budget digit window and marker requirement") {
    assert(budgets("rate it 5 stars").isEmpty) // bare 1-digit, no marker
    assert(budgets("order #123456789").isEmpty) // > 5 digits
    assert(budgets("costs 45 bucks") == Seq((0L, 45L)))
  }

  test("R5 combine: model values subsumed by datastore are dropped") {
    import graft.surface.TextSurface
    import graft.surface.TextSurface.Detection
    val ds = Seq(Detection("city", "New Delhi", "new delhi", "message", "en"))
    val pre = Seq(
      Detection("city", "Delhi", "delhi", "model", "en"), // substring → drop
      Detection("city", "Pune", "pune", "model", "en")) // survives
    val out = TextSurface.combineResults(ds, pre)
    assert(out.map(_.value) == Seq("New Delhi", "Pune"))
    assert(out.head.datastoreVerified && !out.head.modelVerified)
    assert(out(1).modelVerified && !out(1).datastoreVerified)
  }
}
