package graft.detectors

/** Number-word algebra — a faithful re-implementation of the reference's
  * `get_number_from_number_word` (ner_v2/detectors/numeral/utils.py:6-130):
  * a left-to-right fold over whitespace-separated words carrying
  * (scale, increment) pairs, with the reference's quirks preserved:
  *  - 1-char scale shorthands (k/l/m/c/b) are excluded from the WORD path
  *    (they only apply as digit suffixes)
  *  - `double`/`triple` (scale 11/111) repeat the following unit's digits
  *  - equal digit-length words break the running number ("one two" → 1, 2)
  *  - a bare scale counts as 1× ("thousand" → 1000)
  */
object NumberWords {

  /** increment is a Double: several languages ship fractional unit words
    * (hi डेढ़ = 1.5, ढाई = 2.5 — numerals_constant.csv rows 3 and 5).
    */
  final case class NumberVariant(scale: Long, increment: Double)

  /** Reference value formatting: integral floats collapse to int strings
    * (utils.py:66-68), fractions keep their shortest decimal form.
    */
  def numString(v: Double): String =
    if (v.isWhole && math.abs(v) < 9.2e18) v.toLong.toString else v.toString

  /** English word map per the reference's per-language CSV semantics
    * (ner_v2/detectors/numeral/number/en/data/numerals_constant.csv),
    * including its misspelling variants.
    */
  val en: Map[String, NumberVariant] = {
    val units = Seq(
      "zero" -> 0, "one" -> 1, "two" -> 2, "three" -> 3, "four" -> 4,
      "five" -> 5, "six" -> 6, "seven" -> 7, "eight" -> 8, "nine" -> 9,
      "ten" -> 10, "eleven" -> 11, "twelve" -> 12, "tweleve" -> 12,
      "thirteen" -> 13, "fourteen" -> 14, "fifteen" -> 15, "sixteen" -> 16,
      "seventeen" -> 17, "eighteen" -> 18, "nineteen" -> 19, "twenty" -> 20,
      "thirty" -> 30, "forty" -> 40, "fourty" -> 40, "fifty" -> 50,
      "sixty" -> 60, "seventy" -> 70, "eighty" -> 80, "ninety" -> 90,
      "ninty" -> 90)
    val scales = Seq(
      "hundred" -> 100L, "thousand" -> 1000L, "thousands" -> 1000L,
      "k" -> 1000L, "lakh" -> 100000L, "lakhs" -> 100000L, "lac" -> 100000L,
      "lacs" -> 100000L, "l" -> 100000L, "million" -> 1000000L,
      "mil" -> 1000000L, "m" -> 1000000L, "crore" -> 10000000L,
      "crores" -> 10000000L, "c" -> 10000000L, "cr" -> 10000000L,
      "billion" -> 1000000000L, "bil" -> 1000000000L, "b" -> 1000000000L,
      "double" -> 11L, "triple" -> 111L)
    (units.map { case (w, v) => w -> NumberVariant(1L, v.toLong) } ++
      scales.map { case (w, s) => w -> NumberVariant(s, 0L) }).toMap
  }

  /** Scale suffixes usable after digits ("2.2k" → 2200) — longest first for
    * the alternation (standard_number_detector.py:62-64).
    */
  val enDigitScales: Map[String, Long] = Map(
    "hundred" -> 100L, "thousand" -> 1000L, "thousands" -> 1000L,
    "k" -> 1000L, "lakh" -> 100000L, "lakhs" -> 100000L, "lac" -> 100000L,
    "lacs" -> 100000L, "l" -> 100000L, "million" -> 1000000L,
    "mil" -> 1000000L, "m" -> 1000000L, "crore" -> 10000000L,
    "crores" -> 10000000L, "c" -> 10000000L, "cr" -> 10000000L,
    "billion" -> 1000000000L, "bil" -> 1000000000L, "b" -> 1000000000L)

  /** Returns (values, originalTexts). Values are Doubles; format with
    * [[numString]] for the reference's int-collapsing string form.
    */
  def numbersFromWords(text0: String,
      wordMap0: Map[String, NumberVariant] = en): (List[Double], List[String]) = {
    // exclude 1-char scale words (reference utils.py:38-39)
    val wordMap = wordMap0.filter { case (w, v) =>
      (w.length > 1 && v.increment == 0) || v.scale == 1
    }
    val text = text0.strip()
    if (text.isEmpty) return (Nil, Nil)

    // parts: token with its LEADING whitespace (utils.py:43-48)
    val raw = ("\\s+".r).split(" " + text).toList match {
      case _ :: rest => rest
      case Nil => Nil
    }
    // leading whitespace reconstruction: reference keeps the separator; we
    // only need originals joined by single spaces, so track tokens + join
    val parts = raw

    var current = 0.0
    var result = 0.0
    var currentText = ""
    var resultText = ""
    var onNumber = false
    var prevDigitLen = 0
    var prevScale = 0L
    var isDoubleOrTriple = false

    val numbers = List.newBuilder[Double]
    val originals = List.newBuilder[String]

    def flush(): Unit = {
      resultText += currentText
      numbers += (result + current)
      originals += resultText.strip()
    }

    for (part <- parts) {
      val word = part.strip()
      wordMap.get(word) match {
        case None =>
          if (onNumber) flush()
          result = 0; current = 0
          resultText = ""; currentText = ""
          onNumber = false
        case Some(nv) =>
          var scale = nv.scale
          var increment = nv.increment
          var continueToken = false
          if (scale % 100 == 11) {
            isDoubleOrTriple = true
            prevScale = scale
            continueToken = true
          }
          if (!continueToken) {
            if (prevScale > 1 && !(prevScale < scale)) {
              result += current
              resultText += currentText
              current = 0
              currentText = ""
            }
            // reference: max(len(str(int(increment))), len(str(scale)))
            val digitLen = math.max(increment.toLong.toString.length,
              scale.toString.length)
            if (digitLen == prevDigitLen) {
              if (onNumber) flush()
              result = 0; current = 0
              resultText = ""; currentText = ""
            }
            if (digitLen > prevDigitLen) {
              if (onNumber && prevScale == scale)
                current = current * math.pow(10, digitLen)
            }
            if (isDoubleOrTriple) {
              scale = prevScale
              current = increment
              increment = 0
              isDoubleOrTriple = false
            }
            if (scale > 1 && current == 0 && increment == 0) current = 1
            current = current * scale + increment
            currentText += " " + word
            if (scale > 1) {
              result += current
              resultText += currentText
              current = 0
              currentText = ""
            }
            onNumber = true
            prevDigitLen = digitLen
            prevScale = scale
          }
      }
    }
    if (onNumber) flush()
    (numbers.result(), originals.result())
  }
}
