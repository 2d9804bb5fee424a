package graft.detectors

import org.scalatest.funsuite.AnyFunSuite

/** Mirror of the reference's regex detector unit tests
  * (ner_v1/tests/pattern/regex/test_regex_detection.py). The reference
  * container has no `regex` lib, so the stdlib-`re` path is the behavior
  * under test; the V0/V1 nested-character-set case is included because
  * Java's Pattern parses those patterns the V0 way too.
  */
class RegexDetectorSpec extends AnyFunSuite {

  test("max matches") {
    val tag = "__num__"
    val pattern = raw"\b(\d+|)\b"
    val text = "there are some numbers like 345 and 2342, but the pattern is bad too it matches empty string! We " +
      "will now sprinkle this text with numbers 34634653 42342345234 12433345325 to test 17293847 345 2342"

    val d3 = new RegexEntityDetector("num", pattern, maxMatches = 3)
    assert(d3.detect(text) == Seq("345", "2342", "34634653"))
    val expectedTagged3 = ("there are some numbers like {t} and {t}, but the pattern is bad too " +
      "it matches empty string! We will now sprinkle this text with" +
      " numbers {t} 42342345234 12433345325 to test 17293847 345 2342").replace("{t}", tag)
    assert(d3.taggedText == expectedTagged3)

    val d50 = new RegexEntityDetector("num", pattern, maxMatches = 50)
    assert(d50.detect(text) == Seq("345", "2342", "34634653", "42342345234",
      "12433345325", "17293847", "345", "2342"))
    val expectedTagged50 = ("there are some numbers like {t} and {t}, but the pattern is bad too " +
      "it matches empty string! We will now sprinkle this text with" +
      " numbers {t} {t} {t} to test {t} {t} {t}").replace("{t}", tag)
    assert(d50.taggedText == expectedTagged50)
  }

  test("non empty matches only") {
    val pattern = raw"\b(\d+|)\b"
    val text = "there are no numbers in this text! but the pattern is bad too, it matches empty string"
    val d = new RegexEntityDetector("test", pattern)
    assert(d.detect(text).isEmpty)
    assert(d.taggedText == text)
  }

  test("recursive replace protection") {
    val multiplier = 30
    val tag = "__abab__"
    val text = Seq.fill(multiplier)("ab").mkString(" ")
    val d = new RegexEntityDetector("abab", raw"\bab\b")
    assert(d.detect(text) == Seq.fill(multiplier)("ab"))
    assert(d.taggedText == Seq.fill(multiplier)(tag).mkString(" "))
  }

  test("dot star: per line by default, whole text with DOTALL") {
    val tag = "__test__"
    val text = "hello world\nlorem ipsum dolor sit amet\ntest with new lines and stuff .^!@\"#$%^&*(){}[]:?><\n"

    val d = new RegexEntityDetector("test", ".*")
    assert(d.detect(text) == Seq("hello world", "lorem ipsum dolor sit amet",
      "test with new lines and stuff .^!@\"#$%^&*(){}[]:?><"))
    assert(d.taggedText == s"$tag\n$tag\n$tag\n")

    val dAll = new RegexEntityDetector("test", ".*", dotAll = true)
    assert(dAll.detect(text) == Seq(text))
    assert(dAll.taggedText == tag)
  }

  test("invalid pattern raises at construction") {
    intercept[java.util.regex.PatternSyntaxException] {
      new RegexEntityDetector("test", "(invalid!")
    }
  }

  test("nested character sets parse the V0 way") {
    val d1 = new RegexEntityDetector("test", "[[\\]]")
    assert(d1.detect("this pattern should extract box brackets [] [][[[ ]]]]]") ==
      Seq("[", "]", "[", "]", "[", "[", "[", "]", "]", "]", "]", "]"))

    val d2 = new RegexEntityDetector("test", "[[]]")
    assert(d2.detect("this pattern should extract box brackets pairs [] [][[[ ]]]]]") ==
      Seq("[]", "[]"))
  }
}
