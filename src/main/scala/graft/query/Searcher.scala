package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analyzer.Analyzer
import graft.functions.EditDistance
import graft.index.{Hashing, Snapshot, SnapshotMeta}

/** Top-k BM25 search over a committed index snapshot.
  *
  * Execution model (the Spark re-expression of ES scatter-gather,
  * SURVEY.md §3.1): the analyzed query terms are resolved against the term
  * dictionary (driver-side, tiny), the candidate (bucket, term) shards are
  * read with partition pruning (bucket dirs) + parquet predicate pushdown
  * (term column), and block-max WAND runs once per salt-task — each task
  * owns the doc subset `mix64(docId) & (S-1) == task`, where S is the max
  * salt fan-out over the query's terms. Per-task top-k heaps merge on the
  * driver (k rows each). Queries touching only unsalted terms run as a
  * single task; queries touching hot terms parallelize across their salt
  * shards — the explicit skew path the north rule requires.
  */
object Searcher {

  final case class TermStats(term: String, df: Long, maxTf: Int, numSalts: Int)

  /** Analyzed, dictionary-resolved query. */
  final case class ResolvedQuery(terms: Seq[TermStats], meta: SnapshotMeta) {
    def bm25 = BM25(meta.k1, meta.b)
    def saltFanout: Int = if (terms.isEmpty) 1 else terms.map(_.numSalts).max
  }

  def resolve(spark: SparkSession, indexDir: String, queryText: String,
      fuzzy: Boolean = false): ResolvedQuery = {
    val meta = Snapshot.load(indexDir)
      .getOrElse(throw new IllegalStateException(s"no snapshot at $indexDir"))
    val tokens = Analyzer.analyze(queryText).distinct.sorted.toSeq
    val dict = spark.read.parquet(meta.dictDir(indexDir))
    val terms: Seq[TermStats] =
      if (!fuzzy) {
        if (tokens.isEmpty) Seq.empty
        else dict.filter(col("term").isin(tokens: _*))
          .select("term", "df", "maxTf", "numSalts")
          .collect()
          .map(r => TermStats(r.getString(0), r.getLong(1), r.getInt(2), r.getInt(3)))
          .toSeq
      } else expandFuzzy(spark, dict, tokens)
    ResolvedQuery(terms.sortBy(_.term), meta)
  }

  /** ES-style fuzzy expansion (match query with fuzziness auto:4,7,
    * prefix_length 1, max_expansions 50 — reference
    * ner_v2/detectors/textual/queries.py:89-99): each analyzed query token
    * expands to dictionary terms within its auto edit budget whose first
    * character matches; expansions are capped at 50 per token preferring
    * smaller edit distance, then higher df. Expanded terms score as
    * independent query terms with their own idf.
    *
    * Scale path: the expansion scan is a Spark filter over the dictionary
    * (first-char + length-window prune down to a sliver of the vocabulary,
    * then banded OSA distance), not a driver-side loop.
    */
  private def expandFuzzy(spark: SparkSession,
      dict: DataFrame, tokens: Seq[String]): Seq[TermStats] = {
    if (tokens.isEmpty) return Seq.empty
    val exact = tokens.filter(t => EditDistance.autoFuzzyEdits(t.length) == 0)
    val fuzzyToks = tokens.filter(t => EditDistance.autoFuzzyEdits(t.length) > 0)

    val exactStats: Seq[(String, TermStats, Int)] =
      if (exact.isEmpty) Seq.empty
      else dict.filter(col("term").isin(exact: _*))
        .select("term", "df", "maxTf", "numSalts").collect().toSeq
        .map(r => (r.getString(0),
          TermStats(r.getString(0), r.getLong(1), r.getInt(2), r.getInt(3)), 0))

    val fuzzyStats: Seq[(String, TermStats, Int)] = if (fuzzyToks.isEmpty) Seq.empty else {
      val toks = fuzzyToks.map(t => (t, EditDistance.autoFuzzyEdits(t.length)))
      val toksB = spark.sparkContext.broadcast(toks)
      val matchU = udf { (term: String) =>
        // all (queryToken, dist) pairs this dictionary term matches
        toksB.value.flatMap { case (q, kEd) =>
          if (term.isEmpty || q.isEmpty || term.charAt(0) != q.charAt(0)) None
          else if (math.abs(term.length - q.length) > kEd) None
          else {
            val d = EditDistance.osa(q, term, kEd)
            if (d <= kEd) Some((q, d)) else None
          }
        }
      }
      // cheap prune first: length window + first char over the whole vocab
      val firstChars = toks.map(_._1.charAt(0).toString).distinct
      val maxLen = toks.map { case (t, k) => t.length + k }.max
      val minLen = toks.map { case (t, k) => t.length - k }.min
      dict
        .filter(substring(col("term"), 1, 1).isin(firstChars: _*) &&
          length(col("term")).between(minLen, maxLen))
        .withColumn("matches", matchU(col("term")))
        .filter(size(col("matches")) > 0)
        .select(col("term"), col("df"), col("maxTf"), col("numSalts"),
          explode(col("matches")).as("m"))
        .select("term", "df", "maxTf", "numSalts", "m._1", "m._2")
        .collect().toSeq
        .map(r => (r.getString(4),
          TermStats(r.getString(0), r.getLong(1), r.getInt(2), r.getInt(3)),
          r.getInt(5)))
    }

    // per query token: keep <=50 expansions, smaller edit first, then df desc
    (exactStats ++ fuzzyStats)
      .groupBy(_._1)
      .flatMap { case (_, ms) =>
        ms.sortBy { case (_, ts, d) => (d, -ts.df, ts.term) }.take(50).map(_._2)
      }
      .toSeq.distinct
  }

  /** Distributed block-max WAND top-k. Returns (rank, docId, score). */
  def search(spark: SparkSession, indexDir: String, queryText: String,
      k: Int, fuzzy: Boolean = false): DataFrame = {
    val rq = resolve(spark, indexDir, queryText, fuzzy)
    hitsToDf(spark, searchHits(spark, indexDir, rq, k))
  }

  def searchHits(spark: SparkSession, indexDir: String,
      rq: ResolvedQuery, k: Int): Array[Hit] = {
    import spark.implicits._
    if (rq.terms.isEmpty) return Array.empty
    val meta = rq.meta
    val bm25 = rq.bm25
    val n = meta.numDocs
    val sQ = rq.saltFanout
    val idf = rq.terms.map(t => t.term -> bm25.idf(t.df, n)).toMap

    val termNames = rq.terms.map(_.term)
    val buckets = rq.terms.flatMap(t =>
      (0 until t.numSalts).map(s => Hashing.bucketOf(t.term, s, meta.numBuckets)))
      .distinct
    val segs = spark.read.parquet(meta.segmentsDir(indexDir))
      .filter(col("bucket").isin(buckets: _*) && col("term").isin(termNames: _*))
      .select("term", "salt", "numSalts", "maxTf", "postings")
      .as[(String, Int, Int, Int, Array[Byte])]

    val idfB = spark.sparkContext.broadcast(idf)
    val perTask: Array[Hit] = segs
      .flatMap { case (term, salt, numSalts, maxTf, postings) =>
        (0 until sQ).iterator
          .filter(task => (task & (numSalts - 1)) == salt)
          .map(task => (task, term, maxTf, postings))
      }
      .groupByKey(_._1)
      .flatMapGroups { (task, it) =>
        val shards = it.map { case (_, term, maxTf, postings) =>
          TermShard(term, idfB.value(term), maxTf, postings)
        }.toSeq
        val owns: Long => Boolean =
          if (sQ == 1) _ => true
          else d => Hashing.saltOf(d, sQ) == task
        Wand.topK(shards, k, bm25, owns).iterator
      }
      .collect()

    // global merge: per-task heaps are disjoint doc sets
    perTask.sortBy(h => (-h.score, h.docId)).take(k)
  }

  /** Exact distributed scorer — the rank-parity oracle (replaces the
    * reference's mocked-ES test harness, SURVEY.md §5). Decodes every
    * posting of the query terms, scores all matching docs via the identical
    * BM25 kernel with the identical term-ordered summation, and takes the
    * global top-k with Spark's TakeOrderedAndProject.
    */
  def searchExact(spark: SparkSession, indexDir: String, queryText: String,
      k: Int, fuzzy: Boolean = false): DataFrame = {
    val rq = resolve(spark, indexDir, queryText, fuzzy)
    hitsToDf(spark, searchExactHits(spark, indexDir, rq, k))
  }

  def searchExactHits(spark: SparkSession, indexDir: String,
      rq: ResolvedQuery, k: Int): Array[Hit] = {
    import spark.implicits._
    if (rq.terms.isEmpty) return Array.empty
    val meta = rq.meta
    val bm25 = rq.bm25
    val n = meta.numDocs
    val idf = rq.terms.map(t => t.term -> bm25.idf(t.df, n)).toMap
    val termNames = rq.terms.map(_.term)
    val buckets = rq.terms.flatMap(t =>
      (0 until t.numSalts).map(s => Hashing.bucketOf(t.term, s, meta.numBuckets)))
      .distinct
    val idfB = spark.sparkContext.broadcast(idf)
    val contributions = spark.read.parquet(meta.segmentsDir(indexDir))
      .filter(col("bucket").isin(buckets: _*) && col("term").isin(termNames: _*))
      .select("term", "postings")
      .as[(String, Array[Byte])]
      .flatMap { case (term, postings) =>
        graft.index.PostingCodec.decode(postings).iterator
          .map(p => (p.docId, term, idfB.value(term) * bm25.tfWeight(p.tf, 0.0)))
      }
    contributions
      .groupByKey(_._1)
      .mapGroups { (docId, it) =>
        // sum in lexicographic term order — the shared determinism contract
        val contribs = it.map(c => (c._2, c._3)).toArray.sortBy(_._1)
        var s = 0.0
        var i = 0
        while (i < contribs.length) { s += contribs(i)._2; i += 1 }
        Hit(docId, s)
      }
      .orderBy(desc("score"), asc("docId"))
      .limit(k)
      .collect()
  }

  private def hitsToDf(spark: SparkSession, hits: Array[Hit]): DataFrame = {
    import spark.implicits._
    hits.zipWithIndex
      .map { case (h, i) => (i + 1, h.docId, h.score) }.toSeq
      .toDF("rank", "doc_id", "score")
  }

  /** Resolve hits back to corpus rows (repo, path, commit, sha256) via the
    * forward index — docId-pushdown point lookup, broadcast-joined.
    */
  def resolveHits(spark: SparkSession, indexDir: String, hits: DataFrame): DataFrame = {
    val meta = Snapshot.load(indexDir).get
    val docs = spark.read.parquet(meta.docsDir(indexDir))
      .select("docId", "repo", "path", "commit", "lang", "sha256")
    docs.join(broadcast(hits), docs("docId") === hits("doc_id"), "inner")
      .drop("docId")
      .orderBy("rank")
  }
}
