package graft.detectors

import org.scalatest.funsuite.AnyFunSuite
import graft.surface.Priority

class SizePassengerSpec extends AnyFunSuite {

  test("shopping sizes: dictionary + numeric in context") {
    assert(ShoppingSizeDetector.detect("need a large and an XL tshirt")
      .map(_.value) == Seq("L", "XL"))
    assert(ShoppingSizeDetector.detect("size 32 jeans").map(_.value) == Seq("32"))
    assert(ShoppingSizeDetector.detect("extra large please").map(_.value) == Seq("XL"))
    assert(ShoppingSizeDetector.detect("no sizes mentioned 45").isEmpty)
  }

  test("passenger counts: keyword-scoped numbers, digit and word forms") {
    assert(PassengerDetector.detect("2 adults and 1 child")
      .map(d => (d.value, d.unit)) ==
      Seq(("2", Some("adult")), ("1", Some("child"))))
    assert(PassengerDetector.detect("tickets for three passengers")
      .map(d => (d.value, d.unit)) == Seq(("3", Some("passenger"))))
    assert(PassengerDetector.detect("adults: 4").map(_.value) == Seq("4"))
    assert(PassengerDetector.detect("42 items").isEmpty)
  }

  test("R4 priority: structured > message > fallback (reference examples)") {
    val detectCity: String => Seq[(String, String)] = t =>
      if (t.contains("inferno")) Seq(("Inferno", "inferno")) else Seq.empty

    // structured value detected → verified
    val r1 = Priority.resolve(detectCity, Some("i wanted to watch movie"),
      structuredValue = Some("inferno"))
    assert(r1 == Seq(Priority.Resolved(Some("Inferno"), "inferno",
      "structure_value_verified", "en")))

    // structured value NOT detected → passes through unverified
    val r2 = Priority.resolve(detectCity, Some("i wanted to watch inferno"),
      structuredValue = Some("delhi"))
    assert(r2.head.detection == "structure_value_not_verified")
    assert(r2.head.value.isEmpty && r2.head.originalText == "delhi")

    // message path
    val r3 = Priority.resolve(detectCity, Some("i wanted to watch inferno"))
    assert(r3.head.detection == "message" && r3.head.value.contains("Inferno"))

    // fallback path
    val r4 = Priority.resolve(detectCity, Some("nothing here"),
      fallbackValue = Some("Mumbai"))
    assert(r4 == Seq(Priority.Resolved(Some("Mumbai"), "Mumbai",
      "fallback_value", "en")))

    // nothing anywhere
    assert(Priority.resolve(detectCity, Some("nothing")).isEmpty)
  }
}
