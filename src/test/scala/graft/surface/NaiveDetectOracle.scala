package graft.surface

import graft.analyzer.{Analyzer, Tokenizer}
import graft.functions.EditDistance

/** Straight-line single-message reimplementation of the dictionary
  * detection semantics, written directly from the reference behavior
  * (ner_v2/detectors/textual/text_detection.py) as plain loops — no
  * inverted index, no BM25, no broadcast, no WAND. It reuses only the
  * primitive kernels that have their own golden-vector/property suites
  * (Analyzer, Tokenizer, EditDistance); all search/candidate/greedy logic
  * is re-derived here so EntrySpec can pin the distributed LocalDetector
  * path against an independent implementation on real corpus data.
  *
  * One documented divergence: the engine breaks score ties between
  * same-group variants by dictionary docId; with single-occurrence terms
  * all candidate scores tie, so this oracle orders ties by variant name.
  * The two orders can only disagree when two variants of the same
  * exact/fuzzy group compete for the same span — the comparison test
  * failing would surface exactly that.
  */
object NaiveDetectOracle {

  final case class DictRow(entity: String, value: String, variant: String,
      lang: String)

  /** All (entity, value, original) detections for one message. */
  def detect(message: String, dict: Seq[DictRow], entities: Seq[String],
      language: String = "en", lo: Int = 4, hi: Int = 7,
      minTokenSize: Int = 4): Seq[(String, String, String)] = {
    val tokens = Analyzer.analyze(message).distinct.toSeq
    val rows = dict.filter(_.lang == language)
    val termVocab = rows.flatMap(r => Analyzer.analyze(r.variant)).distinct
    // query-side fuzzy expansion: auto:lo,hi budget on the QUERY token,
    // first-char guard, length window, OSA metric — the search contract
    val matched: Set[String] = tokens.flatMap { q =>
      val k = EditDistance.autoFuzzyEdits(q.length, lo, hi)
      if (k == 0) termVocab.filter(_ == q)
      else termVocab.filter(t => t.nonEmpty && q.nonEmpty &&
        t.charAt(0) == q.charAt(0) && math.abs(t.length - q.length) <= k &&
        EditDistance.osa(q, t, k) <= k)
    }.toSet
    val processed = Analyzer.lower(message)
    val canonical = Tokenizer.tokenizeTerms(processed).mkString(" ")
    entities.flatMap { entity =>
      val cands = rows.filter(_.entity == entity)
        .filter { r =>
          val ts = Analyzer.analyze(r.variant)
          ts.nonEmpty && ts.forall(matched)
        }
        .map(r => (r.variant.toLowerCase(java.util.Locale.ROOT), r.value))
      val vToV = cands.toMap
      val variants = vToV.keys.toSeq.map(v => (v, Tokenizer.tokenizeTerms(v)))
      // exact (canonical substring) before fuzzy, token count desc within
      val (exactM, fuzzyM) = variants.partition { case (_, ts) =>
        canonical.contains(ts.mkString(" "))
      }
      val ordered = (exactM.sortBy(v => (-v._2.length, v._1)) ++
        fuzzyM.sortBy(v => (-v._2.length, v._1))).map(_._1)
      var remaining = processed
      val out = Seq.newBuilder[(String, String, String)]
      for (variant <- ordered)
        findSpan(remaining, variant, lo, hi, minTokenSize).foreach { orig =>
          out += ((entity, vToV(variant), orig))
          remaining = consume(remaining, orig, entity)
        }
      out.result()
    }
  }

  /** Sliding fuzzy token alignment over the raw (lowercased) text. */
  private def findSpan(text: String, variant: String, lo: Int, hi: Int,
      minTokenSize: Int): Option[String] = {
    val vts = Tokenizer.tokenizeTerms(variant)
    if (vts.isEmpty) return None
    val tts = Tokenizer.tokenize(text)
    var vi = 0
    var start = -1
    var i = 0
    while (i < tts.length) {
      val tt = tts(i)
      val budget = EditDistance.autoFuzzyEdits(tt.term.length, lo, hi)
      val ok = vts(vi) == tt.term || (tt.term.length > minTokenSize &&
        lev(vts(vi), tt.term) <= budget)
      if (ok) {
        if (vi == 0) start = tt.start
        vi += 1
        if (vi == vts.length) return Some(text.substring(start, tt.end))
      } else { vi = 0; start = -1 }
      i += 1
    }
    None
  }

  /** Fresh full-matrix unit-cost Levenshtein (no banding, no early exit) —
    * deliberately the naive O(nm) textbook recurrence.
    */
  private def lev(a: String, b: String): Int = {
    val d = Array.ofDim[Int](a.length + 1, b.length + 1)
    for (i <- 0 to a.length) d(i)(0) = i
    for (j <- 0 to b.length) d(0)(j) = j
    for (i <- 1 to a.length; j <- 1 to b.length) {
      val c = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + c)
    }
    d(a.length)(b.length)
  }

  private def consume(text: String, original: String, entity: String): String = {
    val stripped = original.replaceAll("^[\\p{Punct}]+|[\\p{Punct}]+$", "")
    if (stripped.isEmpty) text
    else text.replaceAll(
      "\\b" + java.util.regex.Pattern.quote(stripped) + "\\b",
      java.util.regex.Matcher.quoteReplacement(s"__${entity}__"))
  }
}
