package graft.index

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.{functions => gf}
import scala.collection.mutable.ArrayBuffer

/** Build-time configuration.
  *
  * @param numBuckets    physical (term,salt) hash buckets = directory
  *                      partitions of the segment store. Sized so one bucket's
  *                      postings fit executor memory at target scale; at
  *                      100 TB this is thousands, locally 32.
  * @param saltThreshold df above which a term's posting list is split across
  *                      power-of-two salt shards (explicit skew handling for
  *                      hot terms like `import` / `def` — north_rule).
  * @param maxSalts      cap on shards per term (power of two).
  */
final case class IndexConfig(
    numBuckets: Int = 32,
    saltThreshold: Long = 50000L,
    maxSalts: Int = 32,
    k1: Double = 1.2,
    b: Double = 0.0)

/** One stored posting shard: the postings of `term` restricted to docs whose
  * salt (mix64(docId) & (numSalts-1)) equals `salt`, delta-gap varbyte
  * encoded with block-max metadata.
  */
final case class SegmentRow(
    term: String, salt: Int, numSalts: Int,
    shardDf: Long, maxTf: Int, postings: Array[Byte], bucket: Int)

/** Inverted-index construction over an Iceberg-shaped corpus
  * `(repo, path, commit, lang, content)`.
  *
  * Dataflow (exactly ONE wide shuffle of posting data):
  * {{{
  *   corpus ─ analyze+tf per row (map-side, no shuffle) ─► docs/ (forward index)
  *   docs ─ explode(tfs) ─ groupBy(term) [partial-agg shuffle of tiny rows] ─► dict/
  *   docs ─ explode(tfs) ─ salt+bucket ─ repartition(bucket) ─
  *          sortWithinPartitions(term,salt,docId) ─ mapPartitions(encode) ─► segments/
  *   segments ─ per-bucket metrics ─► lineage/
  *   manifest vN + atomic pointer swap ─► meta/
  * }}}
  *
  * Scale notes: tf is computed row-locally (graft.functions.TermFrequencies)
  * so the posting exchange carries (term, docId, tf) exactly once; the dict
  * aggregation rides Spark's partial aggregation (map-side combine) and
  * shuffles only per-term partials. Hot terms are spread across buckets by
  * salting BEFORE the shuffle, so no single reducer receives a whole skewed
  * posting list. Each stage leaves a parquet `_SUCCESS` marker; re-running
  * `build` with the same version resumes after the last complete stage
  * (checkpoint resumability per north_rule).
  */
object IndexBuilder {

  /** Reusable literal: stable docId from the row's natural key, never from
    * partition layout — identical at any parallelism (north_rule).
    */
  def docIdCol = xxhash64(col("repo"), col("path"), col("commit"))

  def build(
      corpus: DataFrame,
      indexDir: String,
      cfg: IndexConfig = IndexConfig(),
      versionOpt: Option[Int] = None): SnapshotMeta = {
    val spark = corpus.sparkSession
    import spark.implicits._

    val version = versionOpt.getOrElse(
      Snapshot.listVersions(indexDir).lastOption.getOrElse(0) + 1)
    val base = s"$indexDir/v$version"
    val docsDir = s"$base/docs"
    val dictDir = s"$base/dict"
    val segmentsDir = s"$base/segments"
    val lineageDir = s"$base/lineage"

    def done(dir: String): Boolean =
      new java.io.File(dir, "_SUCCESS").exists()

    // ---- stage 1: forward index (docId, metadata, sha256, tfs, doclen) ----
    if (!done(docsDir)) {
      corpus.select(
          docIdCol.as("docId"),
          col("repo"), col("path"), col("commit"), col("lang"),
          sha2(col("content"), 256).as("sha256"),
          gf.term_frequencies(col("content")).as("tfs"))
        .withColumn("doclen",
          aggregate(map_values(col("tfs")), lit(0), (a, x) => a + x))
        .write.mode(SaveMode.Overwrite).parquet(docsDir)
    }
    val docs = spark.read.parquet(docsDir)

    // ---- stage 2: term dictionary / stats ----
    if (!done(dictDir)) {
      val flat = docs.select(col("docId"),
        explode(col("tfs")).as(Seq("term", "tf")))
      val saltThreshold = cfg.saltThreshold
      val maxSalts = cfg.maxSalts
      val numSaltsU = udf((df: Long) => Hashing.numSaltsFor(df, saltThreshold, maxSalts))
      flat.groupBy("term")
        .agg(count(lit(1)).as("df"), sum("tf").as("cf"), max("tf").as("maxTf"))
        .withColumn("numSalts", numSaltsU(col("df")))
        .write.mode(SaveMode.Overwrite).parquet(dictDir)
    }
    val dict = spark.read.parquet(dictDir)

    // hot terms: tiny by construction (df > saltThreshold) → driver map
    val hotTerms: Map[String, Int] = dict.filter(col("numSalts") > 1)
      .select("term", "numSalts").as[(String, Int)].collect().toMap

    // ---- stage 3: posting segments (the one wide shuffle) ----
    if (!done(segmentsDir)) {
      val hotB = spark.sparkContext.broadcast(hotTerms)
      val numBuckets = cfg.numBuckets
      val shardU = udf { (term: String, docId: Long) =>
        val ns = hotB.value.getOrElse(term, 1)
        val salt = Hashing.saltOf(docId, ns)
        (salt, ns, Hashing.bucketOf(term, salt, numBuckets))
      }
      val rows = docs
        .select(col("docId"), explode(col("tfs")).as(Seq("term", "tf")))
        .withColumn("shard", shardU(col("term"), col("docId")))
        .select(col("term"), col("shard._1").as("salt"),
          col("shard._2").as("numSalts"), col("shard._3").as("bucket"),
          col("docId"), col("tf"))
        .repartition(numBuckets, col("bucket"))
        .sortWithinPartitions("term", "salt", "docId")
        .as[(String, Int, Int, Int, Long, Int)]

      val segs: Dataset[SegmentRow] = rows.mapPartitions { it =>
        new Iterator[SegmentRow] {
          private var cur: (String, Int, Int, Int, Long, Int) =
            if (it.hasNext) it.next() else null
          override def hasNext: Boolean = cur != null
          override def next(): SegmentRow = {
            val (term, salt, numSalts, bucket, _, _) = cur
            val buf = new ArrayBuffer[Posting](64)
            var maxTf = 0
            var continue = true
            while (continue && cur != null) {
              if (cur._1 == term && cur._2 == salt) {
                // xxhash64 docId collisions within a (term,salt) run show up
                // as equal consecutive docIds: merge tf (strict monotonicity
                // is a codec invariant)
                if (buf.nonEmpty && buf.last.docId == cur._5) {
                  val m = buf.last
                  buf(buf.length - 1) = Posting(m.docId, m.tf + cur._6)
                } else buf += Posting(cur._5, cur._6)
                if (buf.last.tf > maxTf) maxTf = buf.last.tf
                cur = if (it.hasNext) it.next() else null
              } else continue = false
            }
            SegmentRow(term, salt, numSalts, buf.length.toLong, maxTf,
              PostingCodec.encode(buf.toArray), bucket)
          }
        }
      }
      segs.write.mode(SaveMode.Overwrite)
        .partitionBy("bucket").parquet(segmentsDir)
    }

    // ---- stage 4: per-partition lineage + metrics ----
    if (!done(lineageDir)) {
      spark.read.parquet(segmentsDir)
        .groupBy("bucket")
        .agg(count(lit(1)).as("numShards"),
          sum("shardDf").as("numPostings"),
          sum(length(col("postings"))).as("postingBytes"))
        .withColumn("snapshotVersion", lit(version))
        .write.mode(SaveMode.Overwrite).parquet(lineageDir)
    }

    // ---- stage 5: manifest + atomic pointer swap ----
    val statsRow = docs.agg(
      count(lit(1)).as("n"),
      avg(col("doclen")).as("avgdl"),
      // order-independent corpus fingerprint over the per-row sha256
      // invariant; decimal sum avoids ANSI long-overflow at scale
      sum(xxhash64(col("sha256")).cast(DecimalType(38, 0))).as("fp"))
      .collect()(0)
    val n = statsRow.getLong(0)
    val avgdl = if (statsRow.isNullAt(1)) 0.0 else statsRow.getDouble(1)
    val fp = if (statsRow.isNullAt(2)) 0L
      else statsRow.getDecimal(2).toBigInteger.longValue()

    val meta = SnapshotMeta(version, n, avgdl, cfg.numBuckets,
      cfg.saltThreshold, cfg.maxSalts, cfg.k1, cfg.b, fp, hotTerms)
    Snapshot.commit(indexDir, meta)
    meta
  }

  /** Resolve-or-build: readers get the committed snapshot if one exists. */
  def buildIfAbsent(corpus: => DataFrame, indexDir: String,
      cfg: IndexConfig = IndexConfig()): SnapshotMeta =
    Snapshot.load(indexDir).getOrElse(build(corpus, indexDir, cfg))
}
