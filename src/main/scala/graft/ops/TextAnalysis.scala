package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token statistics,
  * quality scoring, n-gram language id, and rolling-hash fingerprints.
  * Everything per-row, expression-first (whole-stage codegen), no shuffles.
  */
object TextAnalysis {

  /** Exposed (not private): SparkEntry generates the DuckDB curation oracle
    * from this same list — one source of truth, like langProfiles below.
    */
  val stopwords = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is")

  def tokens(textCol: Column): Column = split(textCol, "\\s+")

  /** Integer token statistics (cross-engine-exact types). */
  def tokenStats(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = tokens(col(textCol))
    df.select(col(idCol),
      size(t).as("n_tokens"),
      size(array_distinct(t)).as("n_uniq"),
      size(filter(t, x => x.isin(stopwords: _*))).as("n_stop"),
      length(col(textCol)).as("n_chars"))
  }

  /** Heuristic quality score in [0,1]: penalizes very short/long docs, low
    * lexical diversity, missing stopwords, high punctuation density —
    * the standard pre-training quality-filter shape (Gopher-style rules).
    */
  def qualityScore(df: DataFrame, textCol: String): DataFrame = {
    val t = tokens(col(textCol))
    val nTok = size(t).cast("double")
    val diversity = when(nTok > 0, size(array_distinct(t)) / nTok).otherwise(0.0)
    val stopRatio = when(nTok > 0,
      size(filter(t, x => x.isin(stopwords: _*))) / nTok).otherwise(0.0)
    val punct = length(regexp_replace(col(textCol), "[^\\p{Punct}]", "")).cast("double")
    val punctRatio = when(length(col(textCol)) > 0,
      punct / length(col(textCol))).otherwise(0.0)
    val lengthOk = when(nTok.between(10, 100000), 1.0).otherwise(0.3)
    df.withColumn("quality",
      round(lengthOk * (lit(0.4) + lit(0.3) * diversity
        + lit(0.2) * least(stopRatio * 5, lit(1.0))
        + lit(0.1) * (lit(1.0) - least(punctRatio * 5, lit(1.0)))), 6))
  }

  /** Character-trigram language id against small built-in profiles — the
    * n-gram heuristic (real pipelines broadcast bigger profiles; the
    * mechanism — profile match per row, zero shuffles — is the same).
    */
  /** Exposed (not private): SparkEntry generates the DuckDB langid oracle
    * from this same table — one source of truth, like the minhash constants.
    */
  val langProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq(" th", "the", "he ", " an", "and", "nd ", " of", "of ", "ing", " to"),
    "de" -> Seq("er ", " de", "der", "ie ", " di", "die", "ein", "ich", "sch", "und"),
    "fr" -> Seq(" de", "de ", " le", "es ", "le ", "ent", " la", "la ", "ion", "que"),
    "es" -> Seq(" de", "de ", " la", "la ", "os ", " el", "el ", "que", " qu", "ión"))

  def langId(df: DataFrame, textCol: String): DataFrame = {
    // single compact UDF instead of a ~400-node expression tree: the
    // expression form triggered a pathological whole-stage-codegen method
    // (janino compile per task dominated runtime)
    val profiles = langProfiles.toSeq.sortBy(_._1)
    val idU = udf { (text: String) =>
      if (text == null) "und"
      else {
        val t = text.toLowerCase(java.util.Locale.ROOT)
        var bestLang = "und"
        var bestScore = -1
        for ((lang, grams) <- profiles) {
          var s = 0
          for (g <- grams) if (t.contains(g)) s += 1
          // tie → lexicographically larger lang (stable, documented)
          if (s > bestScore || (s == bestScore && lang > bestLang)) {
            bestScore = s; bestLang = lang
          }
        }
        bestLang
      }
    }
    df.withColumn("lang_pred", idU(col(textCol)))
  }

  /** Rolling fingerprint of the whitespace token stream: per-token hash
    * chained through xxhash64(acc, tokenHash) — order-sensitive like a
    * polynomial rolling hash but overflow-free under ANSI arithmetic. A
    * stable document fingerprint invariant to formatting-only whitespace
    * changes.
    */
  def fingerprint(df: DataFrame, textCol: String): DataFrame = {
    val t = filter(tokens(col(textCol)), x => x =!= "")
    df.withColumn("fingerprint",
      aggregate(t, lit(0L), (acc, tok) => xxhash64(acc, tok)))
  }

  /** BPE-ish subword token count estimate: whitespace tokens plus an extra
    * count for each internal case/digit/punct boundary — the cheap proxy for
    * tokenizer-cost accounting in data pipelines (no model download).
    */
  def subwordCount(df: DataFrame, textCol: String): DataFrame = {
    val pieces = split(col(textCol),
      "(?=[A-Z])|(?<=[a-z])(?=[0-9])|(?<=[0-9])(?=[a-z])|[^A-Za-z0-9]+")
    df.withColumn("n_subwords",
      size(filter(pieces, p => length(p) > 0)))
  }
}
