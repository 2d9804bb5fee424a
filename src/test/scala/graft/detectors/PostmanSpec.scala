package graft.detectors

import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite

import graft.detectors.lang.NumberDetectors

/** Mirrors the reference's API-level test corpus (the json files under
  * postman_tests/data/entities/) as executed goldens — the cases a
  * real chatbot_ner deployment runs against its HTTP API. Each file maps
  * onto the corresponding detector; `data: null` expectations mean
  * expect-empty. v1-only quirks that conflict with the v2 engine this
  * library implements are skipped with a note (the v1/v2 twin detectors
  * are served by one engine here, v2 semantics — SURVEY §8).
  */
class PostmanSpec extends AnyFunSuite {

  test("postman numberV2.json: all 34 cases") {
    def nums(msg: String, maxD: Int): Seq[(String, String)] =
      NumberDetectors.forLanguage("en", None, minDigits = 1, maxDigits = maxD)
        .detect(msg).map(d => (d.value, d.original))
    val d3: Seq[(String, Int, Seq[(String, String)])] = Seq(
      ("I want to buy 3 kg onions", 3, Seq(("3", "3"))),
      ("Can I buy cheese", 3, Seq.empty),
      ("I want to buy 0 kg apples", 3, Seq(("0", "0"))),
      ("I want to buy 1 kilo orange", 3, Seq(("1", "1"))),
      ("I want to buy a dozen of apples", 3, Seq.empty),
      ("Can I get 1 bottle of milk,", 3, Seq(("1", "1"))),
      ("Please add a couple of batteries to my shopping cart,", 3, Seq.empty),
      ("Please remove 999 Dishwashing gel", 3, Seq(("999", "999"))),
      ("I am looking for 25 bottles of pepsi", 3, Seq(("25", "25"))),
      ("I need 2 kgs of Tomato", 3, Seq(("2", "2"))),
      ("Can you add half a dozen bananas to my cart", 3, Seq.empty),
      ("I want to buy a dozen of eggs", 3, Seq.empty),
      ("Can u get me 30 boxes of tissues please", 3, Seq(("30", "30"))),
      ("Please help me remove 750 gms of cheese block from my cart", 3,
        Seq(("750", "750"))),
      ("Do me a favor and add 3 loaves of bread to my cart", 3, Seq(("3", "3"))),
      ("I want you to remove 5 pcs of Baby Diapers from the cart", 3,
        Seq(("5", "5"))),
      ("Add half a kilo Mango to the cart", 3, Seq.empty),
      ("I would like to cancel the vermicelli from my cart", 3, Seq.empty),
      ("Can u remove all the shower gels from the cart,", 3, Seq.empty),
      ("Can u remove tea bags from my cart", 3, Seq.empty),
      ("Where can I find Tooth Brush", 3, Seq.empty),
      ("I want to purchase 30 units of mobile and 40 units of Television", 3,
        Seq(("30", "30"), ("40", "40"))),
      ("Want to purchase 12 units of banana and 15 units of apple", 3,
        Seq(("12", "12"), ("15", "15"))),
      ("Need 99 units of spoon and 1 plate please", 3,
        Seq(("99", "99"), ("1", "1"))),
      ("I need 7000 kgs onion", 6, Seq(("7000", "7000"))),
      ("My pincode is 400043", 9, Seq(("400043", "400043"))),
      ("Pincode of townside is 400001 i think", 9, Seq(("400001", "400001"))),
      ("98101 is the pincode for seattle", 9, Seq(("98101", "98101"))),
      ("Pincode for Australia is 2044", 9, Seq(("2044", "2044"))),
      ("98765432126 is not a valid pin code", 9, Seq.empty),
      ("My order id is AWB6754321", 12, Seq.empty),
      ("Google gives you a salary of 28,00,000 per annum", 9,
        Seq(("2800000", "28,00,000"))),
      ("My net take home is 5000 dollars Only", 4, Seq(("5000", "5000"))),
      ("I want 9999999 tissues please and 777777 shoes", 9,
        Seq(("9999999", "9999999"), ("777777", "777777"))))
    for ((msg, maxD, expected) <- d3)
      assert(nums(msg, maxD) == expected, msg)
    // v1 number.json extras consistent with the v2 engine
    assert(nums("98765432126 is not a valid phone number", 14) ==
      Seq(("98765432126", "98765432126")))
    assert(nums("98765432126 is not a valid pin code", 3) == Seq.empty)
    // v1-only quirks NOT mirrored: '000123765' keeps leading zeros in v1
    // (the v2 engine normalizes to an integer), and v1 rejects the
    // decimal '1.5' at min_digits=1 — both absent from numberV2.json.
  }

  test("postman budget.json: all 3 cases") {
    val bd = new BudgetDetector()
    def run(msg: String): Seq[(Long, Long, String, String)] =
      bd.detect(msg).map(b => (b.minBudget, b.maxBudget, b.btype, b.original))
    assert(run("shirts between 2000 to 3000") ==
      Seq((2000L, 3000L, "normal_budget", "2000 to 3000")))
    assert(run("I want to see jeans between 2500 to 4200") ==
      Seq((2500L, 4200L, "normal_budget", "2500 to 4200")))
    assert(run("formals between 5000 to 9999") ==
      Seq((5000L, 9999L, "normal_budget", "5000 to 9999")))
  }

  test("postman email.json: all 3 cases") {
    def run(msg: String): Seq[(String, String)] =
      PatternDetectors.emails(msg).map(d => (d.value, d.original))
    assert(run("my email id is apurv.nagvenkar@gmail.com") ==
      Seq(("apurv.nagvenkar@gmail.com", "apurv.nagvenkar@gmail.com")))
    assert(run("my email id is ashutosh@haptik.co") ==
      Seq(("ashutosh@haptik.co", "ashutosh@haptik.co")))
    assert(run("my email id is amansrivastava94@gmail.com") ==
      Seq(("amansrivastava94@gmail.com", "amansrivastava94@gmail.com")))
  }

  test("postman pnr.json: all 3 cases (the Default serial path)") {
    def run(msg: String): Seq[(String, String)] =
      PatternDetectors.serialPnr(msg).map(d => (d.value, d.original))
    assert(run("check my pnr status for 2141215305.") ==
      Seq(("2141215305", "2141215305")))
    assert(run("check my pnr status for 3714578.") ==
      Seq(("3714578", "3714578")))
    assert(run("check my pnr status for 11234456.") ==
      Seq(("11234456", "11234456")))
  }

  test("postman regex.json: all 3 cases") {
    def run(msg: String): Seq[(String, String)] =
      PatternDetectors.custom(msg, "\\d{4,6}").map(d => (d.value, d.original))
    assert(run("123456 is my otp") == Seq(("123456", "123456")))
    assert(run("798865 is my otp") == Seq(("798865", "798865")))
    assert(run("my otp is 112233") == Seq(("112233", "112233")))
  }

  test("postman person_name.json: all 3 cases") {
    val bot = Some("what is your name")
    assert(PersonName.detect("yash doshi", bot) ==
      Seq(DetectedName("yash", None, Some("doshi"), "yash doshi")))
    assert(PersonName.detect("Deep Viral Baweja", bot) ==
      Seq(DetectedName("Deep", Some("Viral"), Some("Baweja"),
        "Deep Viral Baweja")))
    assert(PersonName.detect("amaan srivastava", bot) ==
      Seq(DetectedName("amaan", None, Some("srivastava"), "amaan srivastava")))
  }

  test("postman number_range.json: all 3 cases") {
    import graft.detectors.lang.NumberRangeDetectors
    def run(msg: String): Seq[(Option[String], Option[String], String)] =
      NumberRangeDetectors.forLanguage("en").detect(msg)
        .map(r => (r.minValue, r.maxValue, r.original))
    assert(run("Give me a number between 1 and 100") ==
      Seq((Some("1"), Some("100"), "between 1 and 100")))
    assert(run("My monthly salary will be more than 2k per month") ==
      Seq((Some("2000"), None, "more than 2k")))
    assert(run("more than 200") == Seq((Some("200"), None, "more than 200")))
  }

  test("postman phoneV2.json: all 3 cases (+ v1-compatible phoneV1 cases)") {
    def run(msg: String): Seq[(String, String, String)] =
      PhoneNumbers.detect(msg, "en").map(p =>
        (p.countryCallingCode, p.value, p.original))
    assert(run("my contact number is 08877665543") ==
      Seq(("91", "8877665543", "08877665543")))
    assert(run("My phone number would be 9930341387") ==
      Seq(("91", "9930341387", "9930341387")))
    // the postman API envelope strips the '+' from original_text; the v2
    // detector YAML (PhoneSpec en_7/en_8) pins it WITH the '+' — the
    // engine follows the detector, so compare fields + endsWith here
    val plus = run("You can call me on +919920231234")
    assert(plus.map(p => (p._1, p._2)) == Seq(("91", "9920231234")))
    assert(plus.head._3.endsWith("919920231234"))
    // phoneV1's '+91...' case expects value WITH the country code
    // (v1-only envelope); its other two cases agree with v2:
    assert(run("my contact number is 9049961794") ==
      Seq(("91", "9049961794", "9049961794")))
  }

  test("postman date.json + dateV2.json: all 15 cases") {
    val dd = new DateDetector(LocalDate.of(2026, 8, 16))
    def run(msg: String): Seq[(Int, Int, Int, String, String)] =
      dd.detect(msg).map(d => (d.dd, d.mm, d.yy, d.dtype, d.original))
    // date.json (explicit dates — reference-clock-independent)
    assert(run("Set me a reminder for 23 December 2030") ==
      Seq((23, 12, 2030, "date", "23 december 2030")))
    assert(run("Set me a reminder for 2 May 2030") ==
      Seq((2, 5, 2030, "date", "2 may 2030")))
    assert(run("Set me a reminder for 3 June 2030") ==
      Seq((3, 6, 2030, "date", "3 june 2030")))
    // dateV2.json cases 1-11
    assert(run("my anniversary was on 3/3/1992") ==
      Seq((3, 3, 1992, "date", "3/3/1992")))
    assert(run("Coronoa Virus will end on 3rd Aug 2027") ==
      Seq((3, 8, 2027, "date", "3rd aug 2027")))
    assert(run("12.03.2016 is my nephew's birthday") ==
      Seq((12, 3, 2016, "date", "12.03.2016")))
    assert(run("12.4.2016 doesnt exist for me") ==
      Seq((12, 4, 2016, "date", "12.4.2016")))
    assert(run("A date i wont forget is 3.3.12") ==
      Seq((3, 3, 2012, "date", "3.3.12")))
    assert(run("3/2/17 changed my life forever") ==
      Seq((3, 2, 2017, "date", "3/2/17")))
    assert(run("12/12/12 is a strange date isnt it ?") ==
      Seq((12, 12, 2012, "date", "12/12/12")))
    assert(run("we got married on 12-30-12") ==
      Seq((30, 12, 2012, "date", "12-30-12")))
    assert(run("12/12/1943 is a bad day in american history") ==
      Seq((12, 12, 1943, "date", "12/12/1943")))
    assert(run("Gandhi Jayanti is on October 2nd 1937") ==
      Seq((2, 10, 1937, "date", "october 2nd 1937")))
    assert(run("2019 May 21st") == Seq((21, 5, 2019, "date", "2019 may 21st")))
    // dateV2 case 12: a date range — start_range/end_range flags
    val rd = new DateRangeDetector(LocalDate.of(2026, 8, 16))
    val r = rd.detect("My meeting is 2/3/2020 to 5/6/2024")
    assert(r.map(_.rangeType) == Seq("range"))
    assert(r.head.start.map(d => (d.dd, d.mm, d.yy)).contains((2, 3, 2020)))
    assert(r.head.end.map(d => (d.dd, d.mm, d.yy)).contains((5, 6, 2024)))
  }

  test("postman time.json + timeV2.json + time_range.json") {
    // the postman run's wall clock was morning-ish: '11:35' (no meridiem
    // anywhere) resolves to am via the within-12h rule — pin it with an
    // explicit morning reference clock
    val td = new TimeDetector(
      referenceTime = java.time.LocalDateTime.of(2026, 1, 15, 9, 0))
    def run(msg: String): Set[(Int, Int, String, String)] =
      td.detect(msg).map(t => (t.hh, t.mm, t.nn, t.original)).toSet
    // time.json (v1 envelope trims the trailing hours-word from '13:50
    // hrs'; the v2 engine keeps it — compare on a startsWith basis there)
    def originals(msg: String): Seq[String] = td.detect(msg).map(_.original)
    val m1 = "John arrived at the bus stop at 13:50 hrs expecting the bus " +
      "to be there in 15 mins.But the bus was scheduled for 12:30 pm"
    assert(run(m1).map(t => (t._1, t._2, t._3)) ==
      Set((12, 30, "pm"), (0, 15, "df"), (13, 50, "hrs")))
    assert(originals(m1).exists(_.startsWith("13:50")) &&
      originals(m1).contains("12:30 pm") && originals(m1).contains("in 15 mins"))
    val m2 = "Aman arrived at the bus stop at 17:20 hrs expecting the bus " +
      "to be there in 11 mins.But the bus was scheduled for 5:47 pm"
    assert(run(m2).map(t => (t._1, t._2, t._3)) ==
      Set((5, 47, "pm"), (0, 11, "df"), (17, 20, "hrs")))
    val m3 = "Hritik arrived at the bus stop at 11:35 hrs expecting the bus " +
      "to be there in 30 mins.But the bus was scheduled for 11:30 am"
    assert(run(m3).map(t => (t._1, t._2, t._3)) ==
      Set((11, 30, "am"), (0, 30, "df"), (11, 35, "am")))
    // timeV2.json: all three expect empty
    assert(run("the time is 16:62 am").isEmpty)
    assert(run("The lecture ends at 0 am").isEmpty)
    assert(run("meet me at 22:33 am at the cafe").isEmpty)
    // time_range.json: 12h ranges (v1 envelope strips the 'from' prefix
    // from original_text; the v2 range regex includes it — compare fields
    // + endsWith)
    val tr = new TimeRangeDetector()
    def range(msg: String): Seq[(Int, Int, String, String, String)] =
      tr.detect(msg).filter(_.rangeType == "range").flatMap(r =>
        r.start.map(s => (s.hh, s.mm, s.nn, "start", r.original)).toSeq ++
          r.end.map(e => (e.hh, e.mm, e.nn, "end", r.original)).toSeq)
    val r1 = range("Set a drink water reminder for tomorrow from 5:00 AM to 9:00 PM")
    assert(r1.map(t => (t._1, t._2, t._3, t._4)) ==
      Seq((5, 0, "am", "start"), (9, 0, "pm", "end")))
    assert(r1.forall(_._5.endsWith("5:00 am to 9:00 pm")))
    val r2 = range("Set a drink water reminder for tomorrow from 8:30 am to 5:30 pm")
    assert(r2.map(t => (t._1, t._2, t._3, t._4)) ==
      Seq((8, 30, "am", "start"), (5, 30, "pm", "end")))
    val r3 = range("Set a drink water reminder for tomorrow from 11:40 AM to 11:12 PM")
    assert(r3.map(t => (t._1, t._2, t._3, t._4)) ==
      Seq((11, 40, "am", "start"), (11, 12, "pm", "end")))
  }
}
