package graft.detectors

import org.scalatest.funsuite.AnyFunSuite

/** Cases ported from the reference's
  * ner_v2/tests/pattern/phone_number/phone_number_ner_tests.yaml (F16/F17).
  */
class PhoneSpec extends AnyFunSuite {

  private def det(msg: String, locale: String): Seq[(String, String, String)] =
    PhoneNumbers.detect(msg, locale)
      .map(d => (d.countryCallingCode, d.value, d.original))

  test("en-in: national formats (en_1..en_5)") {
    assert(det("Set a reminder on 02226129854", "en-in") ==
      Seq(("91", "2226129854", "02226129854")))
    assert(det("Set a reminder on 022 26129854", "en-in") ==
      Seq(("91", "2226129854", "022 26129854")))
    assert(det("Call the number 9820334455", "en-in") ==
      Seq(("91", "9820334455", "9820334455")))
    assert(det("Set a reminder on 919820334455", "en-in") ==
      Seq(("91", "9820334455", "919820334455")))
    assert(det("Set a reminder on 91 9820334455", "en-in") ==
      Seq(("91", "9820334455", "91 9820334455")))
  }

  test("en-in: +CC formats and separators (en_6..en_12)") {
    assert(det("Set a reminder on +91 9820334455", "en-in") ==
      Seq(("91", "9820334455", "+91 9820334455")))
    assert(det("Set a reminder on +919820334455", "en-in") ==
      Seq(("91", "9820334455", "+919820334455")))
    assert(det("Set a reminder on 91 9820-3344-55", "en-in") ==
      Seq(("91", "9820334455", "91 9820-3344-55")))
    assert(det("Set a reminder on +1 (408) 912-6172", "en-in") ==
      Seq(("1", "4089126172", "+1 (408) 912-6172")))
    assert(det("Set a reminder on +1 408 9126172", "en-in") ==
      Seq(("1", "4089126172", "+1 408 9126172")))
    assert(det("Set a reminder on +14089126172", "en-in") ==
      Seq(("1", "4089126172", "+14089126172")))
  }

  test("multiple numbers + locale-dependent defaults (en_13, en_14)") {
    assert(det("Send 1000rs to +14089126172 and call 02226129854", "en-in") ==
      Seq(("1", "4089126172", "+14089126172"),
        ("91", "2226129854", "02226129854")))
    assert(det("Send 1000rs to +14089126172 and call 2226129854", "en-us") ==
      Seq(("1", "4089126172", "+14089126172"),
        ("1", "2226129854", "2226129854")))
  }

  test("letters glued to digits reject the candidate (en_15)") {
    assert(det("Send 1000rs to 2226129854b", "en-us").isEmpty)
  }

  test("devanagari digits (hi_1..hi_4)") {
    assert(det("मेरे लिए ५००र्स ९८२०३३४४५५ पे भेज देना", "en-in") ==
      Seq(("91", "9820334455", "९८२०३३४४५५")))
    assert(det("मेरे लिए ५००र्स ९८ २०३३४४५५ पे भेज देना", "en-in") ==
      Seq(("91", "9820334455", "९८ २०३३४४५५")))
    assert(det("मेरा लैंडलाइन नंबर ०२२२६१२९८५७ है", "en-in") ==
      Seq(("91", "2226129857", "०२२२६१२९८५७")))
    assert(det("मेरा लैंडलाइन नंबर ०२२ २६१२९८५७ है", "en-in") ==
      Seq(("91", "2226129857", "०२२ २६१२९८५७")))
  }

  test("CN mobiles keep their region (no NANP '1'-strip mangling)") {
    // a CN mobile whose tail happens to look NANP-valid must stay Chinese
    assert(det("打给 13912345678 谢谢", "zh-CN") ==
      Seq(("86", "13912345678", "13912345678")))
    assert(det("call +8613912345678 now", "zh-CN") ==
      Seq(("86", "13912345678", "+8613912345678")))
    // cc-prefixed form still strips to the national number
    assert(det("call 8613912345678", "zh-CN") ==
      Seq(("86", "13912345678", "8613912345678")))
  }

  test("chinese digit words map digit-by-digit (F17)") {
    val out = ChinesePhone.detect("请拨打一三八零零一三八零零零", "zh-CN")
    assert(out == Seq(DetectedPhone("86", "13800138000", "一三八零零一三八零零零")))
    // 加 = '+': full international form
    val intl = ChinesePhone.detect("请拨打加八六一三八零零一三八零零零", "zh-CN")
    assert(intl == Seq(DetectedPhone("86", "13800138000", "加八六一三八零零一三八零零零")))
    // mixed ascii digits pass through
    val mixed = ChinesePhone.detect("电话 138零零138零零零 谢谢", "zh-CN")
    assert(mixed == Seq(DetectedPhone("86", "13800138000", "138零零138零零零")))
  }
}
