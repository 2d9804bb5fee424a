package graft.detectors

import org.scalatest.funsuite.AnyFunSuite

import graft.analyzer.AsrFormat

/** F11 fit_text_to_format golden cases (reference docstrings,
  * lib/nlp/text_normalization.py:67-118) and F31 person-name heuristic
  * cases (name_detection.py docstring examples).
  */
class AsrNameSpec extends AnyFunSuite {

  test("F11: docstring example — spaces deleted to fit \\d{5}") {
    assert(AsrFormat.fitTextToFormat("1 2 3 45", "\\d{5}") == "12345")
  }

  test("F11: {m,n} resolves max-first (reference \\d{3,5} example)") {
    // the reference notes fuzzy match on \d{3,5} over '12345' would detect
    // '123'; max-first resolution keeps all five digits
    assert(AsrFormat.fitTextToFormat("12345", "\\d{3,5}") == "12345")
    assert(AsrFormat.fitTextToFormat("1 2 3", "\\d{3,5}") == "123")
  }

  test("F11: no match leaves text unchanged") {
    assert(AsrFormat.fitTextToFormat("hello there", "\\d{5}") == "hello there")
  }

  test("F11: word + digits form (PNR-ish \\w\\d{4})") {
    assert(AsrFormat.fitTextToFormat("B 9 9 3 0", "\\w\\d{4}") == "B9930")
  }

  test("F11: asr correction maps spoken hindi letters then fits") {
    // reference pipeline example: 'बी nine nine three zero' after numeral
    // resolution is 'बी 9930'; character constants map बी → B
    assert(AsrFormat.asrCorrection("बी 9 9 3 0", "\\w\\d{4}") == "B9930")
  }

  test("F11: mid-text match only deletes inside the matched span") {
    assert(AsrFormat.fitTextToFormat("pnr is 4 5123 89 ok", "\\d{7}") ==
      "pnr is 4512389 ok")
  }

  test("F31: 'my name is yash doshi' template") {
    assert(PersonName.detect("my name is yash doshi") ==
      Seq(DetectedName("yash", None, Some("doshi"), "yash doshi")))
  }

  test("F31: middle names collapse (reference get_format_name example)") {
    assert(PersonName.detect("my name is yash p. m. doshi") ==
      Seq(DetectedName("yash", Some("p. m."), Some("doshi"), "yash p. m. doshi")))
  }

  test("F31: questions and cardinals are rejected") {
    assert(PersonName.detect("what is your name").isEmpty)
    assert(PersonName.detect("my name is 007 bond").isEmpty)
  }

  test("F31: free text fires only on short messages with name context") {
    val bot = Some("Please enter your name")
    assert(PersonName.detect("siddhant jain", bot) ==
      Seq(DetectedName("siddhant", None, Some("jain"), "siddhant jain")))
    // no bot context → no detection on free text
    assert(PersonName.detect("siddhant jain", None).isEmpty)
    // 4+ tokens → the short-message rule blocks the free-text path
    assert(PersonName.detect("here are some words today", bot).isEmpty)
  }

  test("F31: all 5 reference test_cases_person_name.csv cases") {
    // ner_v1/detectors/textual/name/tests/test_cases_person_name.csv —
    // the reference's own name test matrix (en free-text under a
    // name-asking bot message; hi via the POS-free indic path: Devanagari
    // names and a latin-script name under a hi bot message)
    val enBot = Some("what is your name")
    assert(PersonName.detect("pratik sridatt jayarao", enBot) ==
      Seq(DetectedName("pratik", Some("sridatt"), Some("jayarao"),
        "pratik sridatt jayarao")))
    assert(PersonName.detect("Pratik Jayarao", enBot) ==
      Seq(DetectedName("Pratik", None, Some("Jayarao"), "Pratik Jayarao")))
    assert(PersonName.detect("Pratik", enBot) ==
      Seq(DetectedName("Pratik", None, None, "Pratik")))
    val hiBot = Some("तुम्हारा नाम क्या है")
    assert(PersonName.detect("प्रतिक जयराओ", hiBot, "hi") ==
      Seq(DetectedName("प्रतिक", None, Some("जयराओ"), "प्रतिक जयराओ")))
    assert(PersonName.detect("मेरा नाम pratik jayarao है", hiBot, "hi") ==
      Seq(DetectedName("pratik", None, Some("jayarao"), "pratik jayarao")))
  }

  test("F31 hi: badword/question guards and the >4-token rule") {
    val hiBot = Some("आपका नाम क्या है")
    // question word in the message → no name
    assert(PersonName.detect("क्या प्रतिक", hiBot, "hi").isEmpty)
    // stopword/common-word-only message → nothing left, no latin → empty
    assert(PersonName.detect("मेरा नाम है", hiBot, "hi").isEmpty)
    // bot message that does not ask for a name → gated
    assert(PersonName.detect("प्रतिक जयराओ", Some("आप कहाँ रहते हैं"), "hi").isEmpty)
    // no bot message: indic path still runs (gate applies only when a
    // bot message is present, detect_entity:163-166)
    assert(PersonName.detect("प्रतिक जयराओ", None, "hi") ==
      Seq(DetectedName("प्रतिक", None, Some("जयराओ"), "प्रतिक जयराओ")))
  }
}

/** Banded OSA equivalence: the band must compute the same distances as the
  * unbanded DP wherever the true distance is within budget.
  */
class OsaBandSpec extends org.scalatest.funsuite.AnyFunSuite {
  import graft.functions.EditDistance

  private def reference(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length) {
      val cost = if (a(i - 1) == b(j - 1)) 0 else 1
      var v = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + cost)
      if (i > 1 && j > 1 && a(i - 1) == b(j - 2) && a(i - 2) == b(j - 1))
        v = math.min(v, d(i - 2)(j - 2) + 1)
      d(i)(j) = v
    }
    d(a.length)(b.length)
  }

  test("property: banded osa == full DP capped at maxDist+1") {
    val rnd = new scala.util.Random(5)
    val alphabet = "abcd" // small alphabet → many near-misses + transposes
    def word(): String =
      (0 until 1 + rnd.nextInt(12)).map(_ => alphabet(rnd.nextInt(4))).mkString
    for (_ <- 1 to 3000; maxDist <- 1 to 3) {
      val a = word(); val b = word()
      val expected = math.min(reference(a, b), maxDist + 1)
      val got = EditDistance.osa(a, b, maxDist)
      assert(got == expected, s"a=$a b=$b maxDist=$maxDist")
    }
    // known transposition and edge cases
    assert(EditDistance.osa("improt", "import", 2) == 1)
    assert(EditDistance.osa("abc", "abc", 1) == 0)
    assert(EditDistance.osa("abc", "xyz", 2) == 3)
  }
}
