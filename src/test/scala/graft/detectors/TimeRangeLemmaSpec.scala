package graft.detectors

import java.time.LocalDate
import org.scalatest.funsuite.AnyFunSuite
import graft.analyzer.Lemmatizer

class TimeRangeLemmaSpec extends AnyFunSuite {

  private val tr = new TimeRangeDetector()

  test("time ranges: pair, open, normal") {
    val r = tr.detect("open 7 pm to 9 pm daily")
    assert(r.head.rangeType == "range")
    assert(r.head.start.map(t => (t.hh, t.nn)).contains((7, "pm")))
    assert(r.head.end.map(t => (t.hh, t.nn)).contains((9, "pm")))
    val r2 = tr.detect("from 19:00 till 21:30")
    assert(r2.head.rangeType == "range")
    assert(r2.head.start.map(_.hh).contains(19) && r2.head.end.map(_.mm).contains(30))
    val r3 = tr.detect("by 10:00 am")
    assert(r3.head.rangeType == "end_range")
    assert(tr.detect("at 8:15 pm").head.rangeType == "normal")
  }

  test("bare hour in range context: meridiem distributes to the open side") {
    // the reference-documented form 'between 7 and 9 pm' (round-1 advice:
    // TimeDetector never claims a lone number — range context now tags it)
    val r = tr.detect("meet between 7 and 9 pm tonight")
    assert(r.head.rangeType == "range")
    assert(r.head.start.map(t => (t.hh, t.nn)).contains((7, "pm")))
    assert(r.head.end.map(t => (t.hh, t.nn)).contains((9, "pm")))
    // trailing bare hour takes the leading side's meridiem
    val r2 = tr.detect("open 7 pm to 9")
    assert(r2.head.rangeType == "range")
    assert(r2.head.end.map(t => (t.hh, t.nn)).contains((9, "pm")))
  }

  test("recurrent date forms") {
    val dd = new DateDetector(LocalDate.of(2026, 8, 16)) // Sunday
    val r = dd.detect("gym every monday and yoga daily")
    assert(r.map(_.dtype) == Seq("repeat_day", "everyday"))
    assert(r.head.dd == 17) // next monday
    assert(dd.detect("everyday at dawn").head.dtype == "everyday")
  }

  test("light lemmatizer: irregulars + suffix rules") {
    val cases = Seq(
      "children" -> "child", "went" -> "go", "indices" -> "index",
      "running" -> "run", "stopped" -> "stop", "making" -> "make",
      "moved" -> "move", "cities" -> "city", "boxes" -> "box",
      "classes" -> "class", "cats" -> "cat", "glass" -> "glass",
      "walked" -> "walk", "was" -> "be")
    for ((in, want) <- cases) assert(Lemmatizer.lemma(in) == want, in)
  }

  test("daypart default ranges fire only without explicit times (ref 20-24)") {
    def rr(t: String) = tr.detect(t).map(r =>
      (r.start.map(s => (s.hh, s.mm, s.nn)), r.end.map(e => (e.hh, e.mm, e.nn)),
        r.rangeType))
    // reference values: morning 12:00am-11:00am, evening 5pm-9pm,
    // anytime 12:00am-11:59pm
    assert(rr("i prefer flights in the morning") ==
      Seq((Some((12, 0, "am")), Some((11, 0, "am")), "range")))
    assert(rr("evening works for me") ==
      Seq((Some((5, 0, "pm")), Some((9, 0, "pm")), "range")))
    assert(rr("anytime is fine") ==
      Seq((Some((12, 0, "am")), Some((11, 59, "pm")), "range")))
    // explicit time present → the daypart fallback must NOT fire
    assert(rr("9 pm tonight") ==
      Seq((Some((9, 0, "pm")), Some((9, 0, "pm")), "normal")))
  }

  test("bundled lemma table fixes frequent words the suffix rules miss") {
    // table-vs-heuristic: the suffix rules alone produced the LEFT value
    // (wrong or unchanged); the bundled WordNet-style table (resources/
    // graft/lang/lemma/en.csv) now yields the reference lemma
    val cases = Seq(
      "women" -> "woman", // rules: "women" (no rule fires)
      "best" -> "good", // rules: "best"
      "worse" -> "bad", // rules: "worse"
      "criteria" -> "criterion", // rules: "criterium"? no — "criteria"
      "phenomena" -> "phenomenon", // rules: "phenomena"
      "analyses" -> "analysis", // rules: "analyse"
      "wolves" -> "wolf", // rules: "wolve"
      "taught" -> "teach", // rules: "taught"
      "ate" -> "eat", // rules: "ate"
      "oxen" -> "ox", // rules: "oxen"
      "spoke" -> "speak", // rules: "spoke"
      "further" -> "far", // rules: "further"
      "theses" -> "thesis", // rules: "these"
      "geese" -> "goose", // irregular map already had it; table agrees
      // protected words — the morphy membership stand-in: suffix rules
      // would mangle these, identity entries keep them whole
      "news" -> "news", // rules: "new"
      "species" -> "species", // rules: "specy"
      "string" -> "string", // rules: "str"
      "morning" -> "morning", // rules: "morn"
      "speed" -> "speed", // rules: "spe"
      // -ies noun whose singular ends -ie (ies->y rule is wrong)
      "movies" -> "movie", // rules: "movy"
      // silent-e families restoreE's consonant set cannot reach
      "tired" -> "tire", // rules: "tir"
      "handled" -> "handle", // rules: "handl"
      "created" -> "create", // rules: "creat"
      "writing" -> "write", // rules: "writ"
      "coding" -> "code", // rules: "cod"
      "scheduling" -> "schedule") // rules: "schedul"
    for ((in, want) <- cases)
      assert(Lemmatizer.lemma(in) == want, in)
    // round-5 harvest: words FROM THE REFERENCE'S OWN TEST CORPORA
    // (time/number YAMLs, person-name CSV, postman data) the suffix rules
    // mangled — the left comment shows what the rules alone produced
    val harvested = Seq(
      "changed" -> "change", // rules: "chang" (restoreE can't reach -nge)
      "coming" -> "come", // rules: "com"
      "dining" -> "dine", // rules: "din"
      "parsing" -> "parse", // rules: "pars"
      "married" -> "marry", // rules: "marri" (-ied has no rule)
      "verified" -> "verify", // rules: "verifi"
      "dominoes" -> "domino", // rules: "dominoe"
      // real WordNet nouns the rules would strip — identity-protected
      "wedding" -> "wedding", // rules: "wed"
      "dishwashing" -> "dishwashing", // rules: "dishwash"
      "madras" -> "madras", // rules: "madra"
      "james" -> "james") // rules: "jame"
    for ((in, want) <- harvested)
      assert(Lemmatizer.lemma(in) == want, in)
    // rules still serve the regular inflections (no table entry needed)
    assert(Lemmatizer.lemma("indexing") == "index")
    assert(Lemmatizer.lemma("tables") == "table")
    // bundled backs up a caller table too (checked before the length guard)
    assert(Lemmatizer.lemma("ate", Map("better" -> "good")) == "eat")
  }

  test("dictionary-first lemmatization: supplied table beats the rules") {
    // a caller table (WordNet-exception-style) overrides both the suffix
    // rules and the built-in irregulars; unlisted words fall through
    val table = Map("better" -> "good", "went" -> "wend", "oxen" -> "ox",
      "is" -> "be")
    assert(Lemmatizer.lemma("better", table) == "good")
    assert(Lemmatizer.lemma("went", table) == "wend") // table wins
    assert(Lemmatizer.lemma("oxen", table) == "ox")
    assert(Lemmatizer.lemma("is", table) == "be") // beats the length guard
    assert(Lemmatizer.lemma("running", table) == "run") // fallback rules
    assert(Lemmatizer.lemmatize(Array("better", "cities"), table).toSeq ==
      Seq("good", "city"))
  }

  test("R8 limits enforced on bulk requests") {
    val spark = graft.TestSpark.spark
    intercept[IllegalArgumentException] {
      graft.surface.TextSurface.searchVariantsBulk(spark, "/nonexistent",
        (1 to 101).map(_.toString), Seq("x"))
    }
  }
}
