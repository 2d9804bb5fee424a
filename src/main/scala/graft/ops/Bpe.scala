package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training and application — the "train a
  * tokenizer on the corpus" step of an LLM data pipeline, upgrading
  * [[TextAnalysis]]'s regex-heuristic subword count to a real trained
  * vocabulary.
  *
  * Shape at 100 TB: BPE trains from the WORD-FREQUENCY table, not the
  * corpus (the same shape HuggingFace tokenizers and SentencePiece use) —
  * the distributed work is ONE word-count aggregation whose result is
  * vocabulary-sized (tiny), and the merge loop runs driver-side over it.
  * Training is fully deterministic: counts are exact longs and the best
  * pair ties break lexicographically, so any parallelism and any engine
  * produce the identical merge list. Encoding is a per-row map-only UDF
  * with the merge ranks broadcast.
  *
  * Encoding uses the trained merge RANKS greedily (lowest-rank adjacent
  * pair merges first — the standard GPT-2 style algorithm), so
  * `encode(w).mkString == w` always: BPE only ever merges, never drops.
  */
object Bpe {

  /** Whitespace tokens, matching the pipeline's cross-engine tokenizer. */
  private def wsTokens(c: Column): Column =
    filter(split(c, " "), t => t =!= "")

  /** One trained merge: left symbol + right symbol, in rank order. */
  final case class Merge(left: String, right: String)

  /** Word-frequency table of the corpus: ONE aggregation, result is
    * vocabulary-sized. Exposed so callers can persist it and retrain
    * tokenizers at different sizes without touching the corpus again.
    */
  def wordFreq(df: DataFrame, textCol: String): Map[String, Long] =
    df.select(explode(wsTokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Train `numMerges` BPE merges from a word-frequency table. Stops
    * early when no adjacent pair occurs twice. Deterministic: the best
    * pair is (max count, then lexicographically smallest (left, right)).
    */
  def trainFromFreq(freq: Map[String, Long], numMerges: Int): Seq[Merge] = {
    require(numMerges >= 0, "numMerges must be non-negative")
    var seqs: Seq[(Array[String], Long)] = freq.toSeq.sortBy(_._1)
      .map { case (w, n) => (w.map(_.toString).toArray, n) }
    val merges = Seq.newBuilder[Merge]
    var k = 0
    var done = false
    while (k < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, n) <- seqs; i <- 0 until syms.length - 1)
        counts.updateWith((syms(i), syms(i + 1)))(c => Some(c.getOrElse(0L) + n))
      val candidates = counts.filter(_._2 >= 2L)
      if (candidates.isEmpty) done = true
      else {
        val best = candidates.toSeq
          .minBy { case ((l, r), n) => (-n, l, r) }._1
        merges += Merge(best._1, best._2)
        seqs = seqs.map { case (syms, n) => (mergeOnce(syms, best), n) }
        k += 1
      }
    }
    merges.result()
  }

  /** Train directly from the corpus (wordFreq + trainFromFreq). */
  def train(df: DataFrame, textCol: String, numMerges: Int): Seq[Merge] =
    trainFromFreq(wordFreq(df, textCol), numMerges)

  private def mergeOnce(syms: Array[String],
      pair: (String, String)): Array[String] = {
    if (syms.length < 2) return syms
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1)
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.result()
  }

  /** Encode one word with the trained merges: repeatedly merge the
    * adjacent pair with the LOWEST rank (GPT-2's algorithm). Always a
    * partition of the word's characters — concatenation restores it.
    */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Seq[String] = {
    var syms = word.map(_.toString).toArray
    var go = syms.length > 1
    while (go) {
      var bestRank = Int.MaxValue
      var bestPair: (String, String) = null
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestPair = (syms(i), syms(i + 1)) }
        i += 1
      }
      if (bestPair == null) go = false
      else {
        syms = mergeOnce(syms, bestPair)
        go = syms.length > 1
      }
    }
    syms.toSeq
  }

  /** Per-document BPE token count under the trained merges — map-only
    * (the rank table broadcasts with the UDF closure), the trained twin
    * of [[TextAnalysis]]'s heuristic subword count.
    */
  def tokenCount(df: DataFrame, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val ranks = merges.zipWithIndex
      .map { case (m, i) => (m.left, m.right) -> i }.toMap
    val u = udf { (text: String) =>
      if (text == null) 0
      else text.split(" ").iterator.filter(_.nonEmpty)
        .map(w => encodeWord(w, ranks).length).sum
    }
    df.withColumn("n_bpe_tokens", u(col(textCol)))
  }
}
