package graft.detectors

import org.scalatest.funsuite.AnyFunSuite

/** Mirror of the reference's budget unit tests
  * (ner_v1/tests/numeral/budget/test_budget_detection.py) — all seven
  * test methods, every case. The reference's setUp widens the digit
  * window to (1, 15); test_min_max_digits_limits narrows it to (2, 5).
  */
class BudgetSpec extends AnyFunSuite {

  private def det(min: Int = 1, max: Int = 15) = new BudgetDetector(min, max)
  private def asTuple(b: DetectedBudget): (Long, Long, String) =
    (b.minBudget, b.maxBudget, b.btype)

  test("min max digits limits (2, 5)") {
    val bd = det(2, 5)
    val positives = Seq(
      "Show products in 10,000 - 20,000 range",
      "This costs about 10 rs")
    val negatives = Seq(
      "my budget is .5cr",
      "Annual operating budget is 1.2cr",
      "Show me cars that cost less than 2.99mil",
      "Rs. 1 is the minimum denomination")
    positives.foreach(t => assert(bd.detect(t).nonEmpty, t))
    negatives.foreach(t => assert(bd.detect(t).isEmpty, t))
  }

  test("max budget") {
    val cases = Seq(
      ("Show me cars that cost below rs. 5000", 5000L, "below rs. 5000"),
      ("Show me cars that cost less than 6k", 6000L, "less than 6k"),
      ("at most 30 rs.", 30L, "at most 30 rs."),
      ("costs upto Rs.100", 100L, "upto rs.100"))
    for ((text, maxB, orig) <- cases) {
      val r = det().detect(text)
      assert(r.map(asTuple) == Seq((0L, maxB, "normal_budget")), text)
      assert(r.map(_.original) == Seq(orig), text)
    }
  }

  test("min budget") {
    val cases = Seq(
      ("Show me cars that cost above rs. 5000", 5000L, "above rs. 5000"),
      ("Show me cars that cost more than 6k", 6000L, "more than 6k"),
      ("at least 30 rs.", 30L, "at least 30 rs."),
      ("costs greater than Rs.100", 100L, "greater than rs.100"))
    for ((text, minB, orig) <- cases) {
      val r = det().detect(text)
      assert(r.map(asTuple) == Seq((minB, 0L, "normal_budget")), text)
      assert(r.map(_.original) == Seq(orig), text)
    }
  }

  test("budget range") {
    val cases = Seq(
      ("Show products in 10,000 - 20,000 range", 10000L, 20000L, "10,000 - 20,000"),
      ("Show products in 10,000-20,000 range", 10000L, 20000L, "10,000-20,000"),
      ("Show products in 10,000 till Rs. 20k range", 10000L, 20000L, "10,000 till rs. 20k"),
      ("Show products from rs. 5,5,00 to 6,0,0,0 rupees", 5500L, 6000L, "rs. 5,5,00 to 6,0,0,0 rupees"))
    for ((text, minB, maxB, orig) <- cases) {
      val r = det().detect(text)
      assert(r.map(asTuple) == Seq((minB, maxB, "normal_budget")), text)
      assert(r.map(_.original) == Seq(orig), text)
    }
  }

  test("any budget") {
    val cases = Seq(
      (".5cr", 5000000L, ".5cr"),
      ("1.2cr", 12000000L, "1.2cr"),
      ("1.5 thousand", 1500L, "1.5 thousand"),
      ("5 hazar", 5000L, "5 hazar"),
      ("10 rs", 10L, "10 rs"))
    for ((text, maxB, orig) <- cases) {
      val r = det().detect(text)
      assert(r.map(asTuple) == Seq((0L, maxB, "normal_budget")), text)
      assert(r.map(_.original) == Seq(orig), text)
    }
  }

  test("not budgets") {
    val tests = Seq(
      "I want to buy 5liters of milk",
      "Your flight number is 9w998",
      "hello, your coupon code is Amazon50",
      "hello, your coupon code is 50Amazon",
      "the insect is 120millimeters tall")
    tests.foreach(t => assert(det().detect(t).isEmpty, t))
  }

  test("budgets without scales") {
    val cases = Seq(
      ("I want to buy 5 liters of milk", 5L, "5"),
      ("the insect is 120 millimeters tall", 120L, "120"),
      ("hello, your coupon code is 50 Amazon", 50L, "50"),
      ("Your flight number is 9w 998", 998L, "998"))
    for ((text, maxB, orig) <- cases) {
      val r = det().detect(text)
      assert(r.map(asTuple) == Seq((0L, maxB, "normal_budget")), text)
      assert(r.map(_.original) == Seq(orig), text)
    }
  }
}
