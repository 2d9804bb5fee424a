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

  test("reference number_range YAML: all 28 en cases") {
    // goldens transcribed from ner_v2/tests/numeral/number_range/
    // number_range_ner_tests.yaml (en section, ids en_1..en_28); the
    // reference runner drops all-null outputs (unit_type-gated cases
    // expect empty) and compares as a set — mirrored here as sorted
    // multisets of (min, max, abs, unit, original). Our detector returns
    // absolutes as min==max point ranges; shape() maps them back to the
    // reference's abs_value slot (no en case has a genuine equal-endpoint
    // range).
    import graft.detectors.lang.NumberRangeDetectors
    type Out = (Option[String], Option[String], Option[String], Option[String], String)
    def shape(r: DetectedRange): Out =
      if (r.minValue.isDefined && r.minValue == r.maxValue)
        (None, None, r.minValue, r.unit, r.original)
      else (r.minValue, r.maxValue, None, r.unit, r.original)
    def run(unitType: Option[String], msg: String): Seq[Out] =
      NumberRangeDetectors.forLanguage("en", unitType).detect(msg).map(shape).sorted
    def mm(a: String, b: String, u: String, o: String): Out =
      (Some(a), Some(b), None, Option(u), o)
    def mn(a: String, u: String, o: String): Out = (Some(a), None, None, Option(u), o)
    def mx(b: String, u: String, o: String): Out = (None, Some(b), None, Option(u), o)
    def ab(v: String, u: String, o: String): Out = (None, None, Some(v), Option(u), o)
    val N: String = null

    val monster = "My name is Chirag Jain. The date is 28th Feb, 28/02/2021 " +
      "next Monday 9:30 pm. This morning next weekday, tomorrow evening. " +
      "emails are jain@abc.com chirag@example.com. yes no 1 2 3 12 123 1234 " +
      "12345 123456 1234567890 918097678009 ALWPG5809L. My number is " +
      "+911234567890. other number is 7123456789. The city is Mumbai, " +
      "Maharashtra and Lucknow Delhi. jio phone more Rs. 10. 500 - 1000 " +
      "rupees. less than 50000 rupees and 3 children. prod01 pillows " +
      "https://haptik.ai a-b 1-2 a ab active"

    val cases: Seq[(String, Option[String], String, Seq[Out])] = Seq(
      ("en_1", None, "I want more than 200 banana", Seq(mn("200", N, "more than 200"))),
      ("en_2", None, "My monthly salary will be more than 2k per month",
        Seq(mn("2000", N, "more than 2k"))),
      ("en_3", None, "more than 2.5k people in the stadium",
        Seq(mn("2500", N, "more than 2.5k"))),
      ("en_4", Some("currency"), "more than 200", Seq.empty),
      ("en_5", Some("currency"), "more than 2k", Seq.empty),
      ("en_6", Some("currency"), "more than 2.5k", Seq.empty),
      ("en_7", Some("currency"), "more than 200 rupees",
        Seq(mn("200", "rupees", "more than 200 rupees"))),
      ("en_8", Some("currency"), "more than 2k rupees",
        Seq(mn("2000", "rupees", "more than 2k rupees"))),
      ("en_9", Some("currency"), "more than 2.5k rupees",
        Seq(mn("2500", "rupees", "more than 2.5k rupees"))),
      ("en_10", None, "200 to 300", Seq(mm("200", "300", N, "200 to 300"))),
      ("en_11", None, "200 - 300", Seq(mm("200", "300", N, "200 - 300"))),
      ("en_12", None, "200-300", Seq(mm("200", "300", N, "200-300"))),
      ("en_13", Some("currency"), "200 to 300", Seq.empty),
      ("en_14", Some("currency"), "200 – 300", Seq.empty),
      ("en_15", Some("currency"), "200-300", Seq.empty),
      ("en_16", Some("currency"), "200 to 300 rupees",
        Seq(mm("200", "300", "rupees", "200 to 300 rupees"))),
      ("en_17", Some("currency"), "200 - 300 rupees",
        Seq(mm("200", "300", "rupees", "200 - 300 rupees"))),
      ("en_18", Some("currency"), "200-300 rupees",
        Seq(mm("200", "300", "rupees", "200-300 rupees"))),
      ("en_19", Some("currency"), "200 rupees to 300",
        Seq(mm("200", "300", "rupees", "200 rupees to 300"))),
      ("en_20", Some("currency"), "200 rupees to 300 rupees",
        Seq(mm("200", "300", "rupees", "200 rupees to 300 rupees"))),
      ("en_21", Some("currency"), "200 rupees - 300",
        Seq(mm("200", "300", "rupees", "200 rupees - 300"))),
      ("en_22", Some("currency"), "200 rupees - 300 rupees",
        Seq(mm("200", "300", "rupees", "200 rupees - 300 rupees"))),
      ("en_23", Some("currency"), "200-300 rupees",
        Seq(mm("200", "300", "rupees", "200-300 rupees"))),
      ("en_24", None, "200k-300k men and around 400 women",
        Seq(mm("200000", "300000", N, "200k-300k"), mx("400", N, "around 400"))),
      ("en_25", None, "200k-300k men and around 300k women",
        Seq(mm("200000", "300000", N, "200k-300k"), mx("300000", N, "around 300k"))),
      ("en_26", None, "between 2000 and 3000",
        Seq(mm("2000", "3000", N, "between 2000 and 3000"))),
      ("en_27", None, monster, Seq(
        mm("500", "1000", N, "500 - 1000"), mm("1", "2", N, "1-2"),
        mx("50000", N, "less than 50000"),
        ab("1", N, "1"), ab("2", N, "2"), ab("3", N, "3"), ab("12", N, "12"),
        ab("123", N, "123"), ab("1234", N, "1234"), ab("12345", N, "12345"),
        ab("123456", N, "123456"), ab("1234567890", N, "1234567890"),
        ab("918097678009", N, "918097678009"),
        ab("7123456789", N, "7123456789"), ab("10", N, "10"),
        ab("3", N, "3"))),
      ("en_28", Some("currency"), monster, Seq(
        mm("500", "1000", "rupees", "500 - 1000 rupees"),
        mx("50000", "rupees", "less than 50000 rupees"),
        ab("10", "rupees", "rs. 10"))))

    for ((id, unitType, msg, expected) <- cases)
      assert(run(unitType, msg) == expected.sorted, id)
  }

  test("reference number_range YAML: all 43 hi cases") {
    // goldens from the same YAML's hi section (ids hi_1..hi_46; the file
    // skips 4-6): hi keyword families (se jyada / se upar / jada se jada),
    // the hi min_max separators से|-|–, Devanagari digits and number words
    // (२ हजार), and hi unit variants (रुपया / रूपीस / rupees). The
    // reference runner lowercases expected originals; all-null outputs
    // mean expect-empty.
    import graft.detectors.lang.NumberRangeDetectors
    type Out = (Option[String], Option[String], Option[String], String)
    def run(unitType: Option[String], msg: String): Seq[Out] =
      NumberRangeDetectors.forLanguage("hi", unitType).detect(msg)
        .map(r => (r.minValue, r.maxValue, r.unit, r.original)).sorted
    def mm(a: String, b: String, u: String, o: String): Out =
      (Some(a), Some(b), Option(u), o)
    def mn(a: String, u: String, o: String): Out = (Some(a), None, Option(u), o)
    def mx(b: String, u: String, o: String): Out = (None, Some(b), Option(u), o)
    val N: String = null
    val C = Some("currency")

    val cases: Seq[(String, Option[String], String, Seq[Out])] = Seq(
      ("hi_1", None, "200 se jyada", Seq(mn("200", N, "200 se jyada"))),
      ("hi_2", None, "2k se upar", Seq(mn("2000", N, "2k se upar"))),
      ("hi_3", None, "jada se jada 2500", Seq(mx("2500", N, "jada se jada 2500"))),
      ("hi_7", C, "200 rupees se jyada", Seq(mn("200", "rupees", "200 rupees se jyada"))),
      ("hi_8", C, "Rupees 2000 se upar", Seq(mn("2000", "rupees", "rupees 2000 se upar"))),
      ("hi_9", C, "jada se jada 2500 rupees", Seq(mx("2500", "rupees", "jada se jada 2500 rupees"))),
      ("hi_10", None, "200 se 300", Seq(mm("200", "300", N, "200 se 300"))),
      ("hi_11", None, "200 - 300", Seq(mm("200", "300", N, "200 - 300"))),
      ("hi_12", None, "200-300", Seq(mm("200", "300", N, "200-300"))),
      ("hi_13", C, "200 se 300", Seq.empty),
      ("hi_14", C, "200 – 300", Seq.empty),
      ("hi_15", C, "200-300", Seq.empty),
      ("hi_16", C, "200 se 300 rupees", Seq(mm("200", "300", "rupees", "200 se 300 rupees"))),
      ("hi_17", C, "200 - 300 rupees", Seq(mm("200", "300", "rupees", "200 - 300 rupees"))),
      ("hi_18", C, "200-300 rupees", Seq(mm("200", "300", "rupees", "200-300 rupees"))),
      ("hi_19", C, "200 rupees se 300", Seq(mm("200", "300", "rupees", "200 rupees se 300"))),
      ("hi_20", C, "200 rupees se 300 rupees", Seq(mm("200", "300", "rupees", "200 rupees se 300 rupees"))),
      ("hi_21", C, "200 rupees - 300", Seq(mm("200", "300", "rupees", "200 rupees - 300"))),
      ("hi_22", C, "200 rupees - 300 rupees", Seq(mm("200", "300", "rupees", "200 rupees - 300 rupees"))),
      ("hi_23", C, "200-300 rupees", Seq(mm("200", "300", "rupees", "200-300 rupees"))),
      ("hi_24", None, "२०० से ज्यादा", Seq(mn("200", N, "२०० से ज्यादा"))),
      ("hi_25", None, "२ हजार से ऊपर", Seq(mn("2000", N, "२ हजार से ऊपर"))),
      ("hi_26", None, "ज्यादा से ज्यादा २ हजार", Seq(mx("2000", N, "ज्यादा से ज्यादा २ हजार"))),
      ("hi_27", C, "२०० से ज्यादा", Seq.empty),
      ("hi_28", C, "२ हजार से ऊपर", Seq.empty),
      ("hi_29", C, "ज्यादा से ज्यादा ५ हजार", Seq.empty),
      ("hi_30", C, "२०० रूपीस से ज्यादा", Seq(mn("200", "rupees", "२०० रूपीस से ज्यादा"))),
      ("hi_31", C, "रूपीस २ हजार से ऊपर", Seq(mn("2000", "rupees", "रूपीस २ हजार से ऊपर"))),
      ("hi_32", C, "ज्यादा से ज्यादा ५ हजार रुपया", Seq(mx("5000", "rupees", "ज्यादा से ज्यादा ५ हजार रुपया"))),
      ("hi_33", None, "२०० से  ३००", Seq(mm("200", "300", N, "२०० से  ३००"))),
      ("hi_34", None, "२०० - ३००", Seq(mm("200", "300", N, "२०० - ३००"))),
      ("hi_35", None, "२००-३००", Seq(mm("200", "300", N, "२००-३००"))),
      ("hi_36", C, "२०० से  ३००", Seq.empty),
      ("hi_37", C, "२०० – ३००", Seq.empty),
      ("hi_38", C, "२००-३००", Seq.empty),
      ("hi_39", C, "२०० से  ३००  रुपया", Seq(mm("200", "300", "rupees", "२०० से  ३००  रुपया"))),
      ("hi_40", C, "२००-३००  रुपया", Seq(mm("200", "300", "rupees", "२००-३००  रुपया"))),
      ("hi_41", C, "२०० रुपया से ३००", Seq(mm("200", "300", "rupees", "२०० रुपया से ३००"))),
      ("hi_42", C, "२०० रुपया से ३०० रुपया", Seq(mm("200", "300", "rupees", "२०० रुपया से ३०० रुपया"))),
      ("hi_43", C, "२०० -  ३००  रुपया", Seq(mm("200", "300", "rupees", "२०० -  ३००  रुपया"))),
      ("hi_44", C, "२०० रुपया -  ३००", Seq(mm("200", "300", "rupees", "२०० रुपया -  ३००"))),
      ("hi_45", C, "२०० रुपया -  ३०० रुपया ", Seq(mm("200", "300", "rupees", "२०० रुपया -  ३०० रुपया"))),
      ("hi_46", C, "२००-३०० रुपया", Seq(mm("200", "300", "rupees", "२००-३०० रुपया"))))

    for ((id, unitType, msg, expected) <- cases)
      assert(run(unitType, msg) == expected.sorted, id)
  }

  private val bd = new BudgetDetector()
  private def budgets(t: String): Seq[(Long, Long)] =
    bd.detect(t).map(b => (b.minBudget, b.maxBudget))

  test("budget min-max / min / max / any (reference examples)") {
    assert(budgets("shirts between 2000 to 3000") == Seq((2000L, 3000L)))
    assert(budgets("tshirts greater than 2k") == Seq((2000L, 0L)))
    assert(budgets("rs. 1000") == Seq((0L, 1000L)))
    // the digit window gates the SCALED amount (budget_detection.py:236):
    // 150000 and 5000000 overflow the default 2-5 window
    assert(budgets("under 1.5 lakh").isEmpty)
    assert(budgets("flat for 50l").isEmpty)
    val wide = new BudgetDetector(1, 15)
    assert(wide.detect("under 1.5 lakh").map(b => (b.minBudget, b.maxBudget)) ==
      Seq((0L, 150000L)))
    assert(wide.detect("flat for 50l").map(b => (b.minBudget, b.maxBudget)) ==
      Seq((0L, 5000000L)))
  }

  test("budget digit window") {
    assert(budgets("rate it 5 stars").isEmpty) // 1 digit < min 2
    assert(budgets("order #123456789").isEmpty) // no whitespace-led amount
    assert(budgets("costs 45 bucks") == Seq((0L, 45L)))
  }

  test("R5 combine: model values subsumed by datastore are dropped") {
    import graft.surface.TextSurface
    import graft.surface.TextSurface.Detection
    val ds = Seq(Detection("city", "New Delhi", "new delhi", "message", "en"))
    // 'delhi' is a word-bounded substring of 'new delhi' → dropped;
    // 'Pune' survives as a model-only entry. The subsumption regex is
    // CASE-SENSITIVE in the reference (re.escape on the raw predetected
    // value vs lowercased originals, text_detection.py:544) — only the
    // exact-equality check lowers — so capital 'Delhi' would NOT be
    // subsumed and appends as its own entry.
    val out = TextSurface.combineResults(ds, Seq("delhi", "Pune"), "city")
    assert(out.map(_.value) == Seq("New Delhi", "Pune"))
    assert(out.head.datastoreVerified && !out.head.modelVerified)
    assert(out(1).modelVerified && !out(1).datastoreVerified)
    val cap = TextSurface.combineResults(ds, Seq("Delhi"), "city")
    assert(cap.map(_.value) == Seq("New Delhi", "Delhi"))
  }
}
