package graft.detectors

import org.scalatest.funsuite.AnyFunSuite

/** Golden cases mirror the reference's YAML-driven suites
  * (ner_v2/tests/numeral/number/en/number_ner_tests.yaml pattern) and the
  * detector docstring examples — re-derived, not copied.
  */
class DetectorSpec extends AnyFunSuite {

  private val nd = new NumberDetector()

  private def values(text: String): Seq[String] = nd.detect(text).map(_.value)
  private def originals(text: String): Seq[String] = nd.detect(text).map(_.original)

  test("digits: plain, ranges, floats, commas") {
    assert(values("200") == Seq("200"))
    assert(values("200-300") == Seq("200", "300"))
    assert(values("12.23") == Seq("12.23"))
    assert(values("1,22,000 items") == Seq("122000"))
    assert(values("1 2 3") == Seq("1", "2", "3"))
  }

  test("digits with scale suffix") {
    assert(values("costs 2k") == Seq("2000"))
    assert(values("2.2k views") == Seq("2200"))
    assert(values("5 lakh people") == Seq("500000"))
    // default max_digit=6 rejects 7-digit values (reference
    // number_detection.py set_min_max_digits default) ...
    assert(values("1.5 million") == Seq())
    // ... a wider detector accepts them
    assert(new NumberDetector(maxDigits = 10).detect("1.5 million")
      .map(_.value) == Seq("1500000"))
  }

  test("number words: reference algebra examples (utils.py docstring)") {
    assert(NumberWords.numbersFromWords("one thousand two")._1 == List(1002.0))
    assert(NumberWords.numbersFromWords("one two three")._1 == List(1.0, 2.0, 3.0))
    assert(NumberWords.numbersFromWords("two hundred three four hundred three")._1 ==
      List(203.0, 403.0))
    assert(NumberWords.numbersFromWords("twenty five")._1 == List(25.0))
    assert(NumberWords.numbersFromWords("thousand")._1 == List(1000.0))
    assert(NumberWords.numbersFromWords("double two")._1 == List(22.0))
    assert(NumberWords.numbersFromWords("triple five")._1 == List(555.0))
    // equal digit-length words break the run — reference flushes 22 then 3
    assert(NumberWords.numbersFromWords("double two three")._1 == List(22.0, 3.0))
    assert(NumberWords.numbersFromWords("no numbers here")._1 == Nil)
    // misspelling variants from the per-language data
    assert(NumberWords.numbersFromWords("fourty two")._1 == List(42.0))
  }

  test("words via the full detector, span-sorted (reference O5)") {
    assert(values("i want twenty five apples and 3 oranges") == Seq("25", "3"))
    assert(originals("i want twenty five apples") == Seq("twenty five"))
  }

  test("unit capture prefix and suffix") {
    val units = Map("rs" -> "rupees", "rupees" -> "rupees", "rupee" -> "rupees",
      "dollars" -> "dollar", "$" -> "dollar")
    val d = new NumberDetector("number", units)
    val hits = d.detect("that costs rs 200 or 3 dollars")
    assert(hits.map(h => (h.value, h.unit)) ==
      Seq(("200", Some("rupees")), ("3", Some("dollar"))))
    assert(hits.head.original == "rs 200")
  }

  test("min/max digit filter") {
    val d = new NumberDetector(minDigits = 2, maxDigits = 4)
    assert(d.detect("5 and 55 and 55555").map(_.value) == Seq("55"))
  }

  test("emails") {
    assert(PatternDetectors.emails("write to Example@Haptik.AI today")
      .map(_.value) == Seq("example@haptik.ai"))
    assert(PatternDetectors.emails("a.b+tag@sub.domain-x.co, no@no")
      .map(_.value) == Seq("a.b+tag@sub.domain-x.co"))
    assert(PatternDetectors.emails("not an email @ here").isEmpty)
  }

  test("pnrs: plain and separated") {
    assert(PatternDetectors.pnrs("my pnr is 4123456789").map(_.value) ==
      Seq("4123456789"))
    assert(PatternDetectors.pnrs("code 4123-4567-89").map(_.value) ==
      Seq("4123456789"))
    assert(PatternDetectors.pnrs("short 12345").isEmpty)
  }

  test("phones: with and without calling code") {
    val withCc = PatternDetectors.phones("call +91 98765 43210")
    assert(withCc.map(h => (h.unit, h.value)) == Seq((Some("91"), "9876543210")))
    val bare = PatternDetectors.phones("call 98765432")
    assert(bare.map(_.value) == Seq("98765432"))
    assert(PatternDetectors.phones("room 421").isEmpty)
  }

  test("custom regex detector: groups, cap, validation") {
    // reference returns whole matches (regex_detection.py:125-128 group 0)
    assert(PatternDetectors.custom("order #123 and #456", raw"#(\d+)")
      .map(_.value) == Seq("#123", "#456"))
    val many = PatternDetectors.custom("a " * 100, raw"a")
    assert(many.size == 50) // max_matches cap (regex_detection.py:45)
    intercept[java.util.regex.PatternSyntaxException] {
      PatternDetectors.custom("x", "([unclosed")
    }
  }

  test("spark column wrappers explode detections") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, "pay rs 2k to a@b.co or twenty five dollars"))
      .toDF("id", "text")
    val nums = df.select(explode(functions.detect_numbers(col("text"))).as("d"))
      .select("d._1").as[String].collect().toSeq
    assert(nums == Seq("2000", "25"))
    val mails = df.select(explode(functions.detect_emails(col("text"))).as("d"))
      .select("d._1").as[String].collect().toSeq
    assert(mails == Seq("a@b.co"))
  }
}
