package graft.index

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SaveMode, SparkSession}
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
    b: Double = 0.0,
    /** doc shards for dense docId assignment (docId = shard << 40 | rank);
      * fixed per index — determinism depends on config, not parallelism */
    docShards: Int = 64)

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
  * Dataflow:
  * {{{
  *   corpus ─ repartition(key → docShard) ─ per-shard key sort ─
  *            one pass: dense docId + sha256 + analyze/tf ─► docs/
  *   docs ─ per-partition dict partials (term, df, cf, maxTf) ─
  *          groupBy(term) of |vocab|-sized partials ─► dict/ (+ hot-term map)
  *   docs ─ per-partition COMPLETE compressed partial posting lists per
  *          (term, salt) ─ shuffle one byte-array per (partition,term,salt) ─
  *          ordered concat-merge per (term, salt) ─► segments/ (bucket dirs)
  *   segments ─ per-bucket metrics ─► lineage/
  *   manifest vN + atomic pointer swap ─► meta/
  * }}}
  *
  * Scale properties: corpus content is exchanged exactly once (docId
  * assignment); the posting exchange carries compressed partial lists —
  * byte volume ≈ final index size and row count = |vocab| x partitions, not
  * one row per posting. Hot terms are split across salt shards BEFORE the
  * shuffle, so no reducer receives a whole skewed posting list (north_rule
  * skew handling). Dense docIds over per-shard key order keep delta gaps in
  * the 1-2 byte range AND make each docs partition a contiguous docId range,
  * so the merge is ordered concatenation, not a k-way heap. Each stage
  * leaves a parquet `_SUCCESS` marker; re-running the same version resumes
  * after the last complete stage (checkpoint resumability per north_rule).
  */
object IndexBuilder {

  /** Internal row of the forward index (docs/ table). */
  private final case class DocRow(docId: Long, repo: String, path: String,
      commit: String, lang: String, sha256: String, tfs: Map[String, Int],
      doclen: Int)

  private val hexDigits = "0123456789abcdef".toCharArray

  private def toHex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      out(i * 2) = hexDigits(b >>> 4)
      out(i * 2 + 1) = hexDigits(b & 0xf)
      i += 1
    }
    new String(out)
  }

  def build(
      corpus: DataFrame,
      indexDir: String,
      cfg: IndexConfig = IndexConfig(),
      versionOpt: Option[Int] = None,
      onStageTime: (String, Double) => Unit = (_, _) => ()): SnapshotMeta = {
    require(cfg.b == 0.0,
      "v1 supports norms-off BM25 only (b = 0, the reference's mode — " +
        "create.py:177 disables field-length norms); doclen-aware scoring " +
        "needs per-posting norms in the codec (planned)")
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

    val verbose = spark.conf.getOption("graft.build.verbose").contains("true")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      onStageTime(label, sec)
      if (verbose) println(f"[build] $label: $sec%.2f s")
      r
    }

    // ---- stage 1: forward index (docId, metadata, sha256, tfs, doclen) ----
    // Bucket-dense docIds: docId = docShard << 40 | rankWithinShard, where
    // docShard = hash(repo,path,commit) % docShards and the rank follows the
    // per-shard lexicographic key order. Properties:
    //  - deterministic at ANY parallelism (shard and rank are pure functions
    //    of row values + the fixed docShards config — north_rule N vs 4N)
    //  - dense within shard runs → delta gaps stay 1-2 bytes (uniform hash
    //    ids would leave ~45-bit gaps: incompressible); one large jump per
    //    shard boundary per posting list is amortized away by varlong
    //  - ONE hash exchange of the corpus + per-shard sort; no global sort,
    //    no range-sampling job, no zipWithIndex passes
    // The analyze pass (sha256 + tf map) rides the same pass that assigns
    // ids, so corpus content is read and materialized exactly once.
    if (!done(docsDir)) timed("stage1 docs") {
      val docShards = cfg.docShards
      corpus
        .select(col("repo"), col("path"), col("commit"), col("lang"), col("content"))
        .repartition(docShards, col("repo"), col("path"), col("commit"))
        .sortWithinPartitions("repo", "path", "commit")
        .as[(String, String, String, String, String)]
        .mapPartitions { it =>
          val pid = org.apache.spark.TaskContext.get().partitionId().toLong
          val md = java.security.MessageDigest.getInstance("SHA-256")
          var i = 0L
          it.map { case (repo, path, commit, lang, content) =>
            val docId = (pid << 40) | i
            i += 1
            md.reset()
            val sha = toHex(
              md.digest(content.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
            val tfs = graft.analyzer.Analyzer.termFrequencies(content)
            var doclen = 0
            var j = 0
            while (j < tfs.length) { doclen += tfs(j)._2; j += 1 }
            DocRow(docId, repo, path, commit, lang, sha, tfs.toMap, doclen)
          }
        }
        .write.mode(SaveMode.Overwrite).parquet(docsDir)
    }
    val docs = spark.read.schema(IndexSchemas.docs).parquet(docsDir)

    // ---- stage 2: term dictionary / stats ----
    // Map-side pre-aggregation by hand: each partition folds its tf maps
    // into one HashMap and emits per-partition (term, df, cf, maxTf)
    // partials — the exchange carries |vocab| x partitions skinny rows
    // instead of one row per posting (~160x fewer at code-corpus shapes).
    if (!done(dictDir)) timed("stage2 dict") {
      import org.apache.spark.unsafe.types.UTF8String
      val saltThreshold = cfg.saltThreshold
      val maxSalts = cfg.maxSalts
      val numSaltsU = udf((df: Long) => Hashing.numSaltsFor(df, saltThreshold, maxSalts))
      // InternalRow scan: fold MapData directly (no per-row immutable-Map /
      // tuple materialization — the encoder path allocates ~|doc| objects
      // per row and GC dominates past a few cores)
      final class Stat { var df = 0L; var cf = 0L; var maxTf = 0 }
      val partialRdd = docs.select(col("tfs")).queryExecution.toRdd
        .mapPartitions { rows =>
          val acc = new java.util.HashMap[UTF8String, Stat]()
          rows.foreach { r =>
            val m = r.getMap(0)
            val keys = m.keyArray()
            val vals = m.valueArray()
            var i = 0
            val n = m.numElements()
            while (i < n) {
              val k = keys.getUTF8String(i) // transient: backed by row buffer
              val tf = vals.getInt(i)
              var s = acc.get(k)
              if (s == null) { s = new Stat; acc.put(k.clone(), s) }
              s.df += 1
              s.cf += tf
              if (tf > s.maxTf) s.maxTf = tf
              i += 1
            }
          }
          val out = new ArrayBuffer[(String, Long, Long, Int)](acc.size())
          acc.forEach((k, s) => out += ((k.toString, s.df, s.cf, s.maxTf)))
          out.iterator
        }
      spark.createDataset(partialRdd)(Encoders.product[(String, Long, Long, Int)])
        .toDF("term", "df", "cf", "maxTf")
        .groupBy("term")
        .agg(sum("df").as("df"), sum("cf").as("cf"), max("maxTf").as("maxTf"))
        .withColumn("numSalts", numSaltsU(col("df")))
        .write.mode(SaveMode.Overwrite).parquet(dictDir)
    }
    val dict = spark.read.schema(IndexSchemas.dict).parquet(dictDir)

    // hot terms: tiny by construction (df > saltThreshold) → driver map
    val hotTerms: Map[String, Int] = timed("hot-term collect")(dict.filter(col("numSalts") > 1)
      .select("term", "numSalts").as[(String, Int)].collect().toMap)

    // ---- stage 3: posting segments — two-phase partial build + merge ----
    // Phase A (map side): each docs partition builds COMPLETE compressed
    // partial posting lists per (term, salt) for its doc range. Dense docIds
    // assigned over the sorted corpus make each partition a contiguous docId
    // range, so phase B (reduce side) merges partials by simple ordered
    // concatenation. The exchange carries one compressed byte-array per
    // (partition, term, salt) — posting-count-independent row count, ~160x
    // fewer rows and a fraction of the bytes of a per-posting shuffle. Hot
    // terms are split across salts BEFORE the shuffle, so no reducer ever
    // receives a whole skewed posting list (north_rule skew handling).
    if (!done(segmentsDir)) timed("stage3 segments") {
      val hotB = spark.sparkContext.broadcast(hotTerms)
      val numBuckets = cfg.numBuckets

      // (term, salt, numSalts, firstDocId, shardDf, maxTf, bytes, bucket)
      // InternalRow scan + primitive dual-array buffers: zero boxed postings
      val partialRdd = docs.select(col("docId"), col("tfs"))
        .queryExecution.toRdd
        .mapPartitions { rows =>
          import org.apache.spark.unsafe.types.UTF8String
          final class Buf(val numSalts: Int) {
            // one growable (ids, tfs) pair per salt shard of this term
            val ids = Array.fill(numSalts)(new Array[Long](4))
            val tfs = Array.fill(numSalts)(new Array[Int](4))
            val n = new Array[Int](numSalts)
            def add(salt: Int, id: Long, tf: Int): Unit = {
              if (n(salt) == ids(salt).length) {
                ids(salt) = java.util.Arrays.copyOf(ids(salt), n(salt) * 2)
                tfs(salt) = java.util.Arrays.copyOf(tfs(salt), n(salt) * 2)
              }
              ids(salt)(n(salt)) = id
              tfs(salt)(n(salt)) = tf
              n(salt) += 1
            }
          }
          val hot = hotB.value
          val acc = new java.util.HashMap[UTF8String, Buf]()
          rows.foreach { r =>
            val docId = r.getLong(0)
            val m = r.getMap(1)
            val keys = m.keyArray()
            val vals = m.valueArray()
            var i = 0
            val nEl = m.numElements()
            while (i < nEl) {
              val k = keys.getUTF8String(i)
              var buf = acc.get(k)
              if (buf == null) {
                buf = new Buf(hot.getOrElse(k.toString, 1))
                acc.put(k.clone(), buf)
              }
              buf.add(Hashing.saltOf(docId, buf.numSalts), docId, vals.getInt(i))
              i += 1
            }
          }
          val out = new ArrayBuffer[(String, Int, Int, Long, Long, Int, Array[Byte], Int)](acc.size())
          acc.forEach { (k, buf) =>
            val term = k.toString
            var salt = 0
            while (salt < buf.numSalts) {
              val cnt = buf.n(salt)
              if (cnt > 0) {
                val ids = buf.ids(salt)
                val tfs = buf.tfs(salt)
                // rows arrive docId-ascending per contiguous file split; an
                // interleaved multi-split partition needs a local sort
                var monotonic = true
                var maxTf = 0
                var i = 0
                while (i < cnt) {
                  if (i > 0 && ids(i) <= ids(i - 1)) monotonic = false
                  if (tfs(i) > maxTf) maxTf = tfs(i)
                  i += 1
                }
                val arr = new Array[Posting](cnt)
                i = 0
                while (i < cnt) { arr(i) = Posting(ids(i), tfs(i)); i += 1 }
                if (!monotonic)
                  java.util.Arrays.sort(arr, Ordering.by((p: Posting) => p.docId))
                out += ((term, salt, buf.numSalts, arr(0).docId, cnt.toLong,
                  maxTf, PostingCodec.encode(arr),
                  Hashing.bucketOf(term, salt, numBuckets)))
              }
              salt += 1
            }
          }
          out.iterator
        }
      val partials = spark.createDataset(partialRdd)(
        Encoders.product[(String, Int, Int, Long, Long, Int, Array[Byte], Int)])

      // Phase B: co-locate by bucket, order runs by (term, salt, firstDocId),
      // concatenate each run's disjoint ranges into the final shard
      val segs: Dataset[SegmentRow] = partials
        .toDF("term", "salt", "numSalts", "firstDocId", "shardDf", "maxTf",
          "bytes", "bucket")
        .repartition(numBuckets, col("bucket"))
        .sortWithinPartitions("term", "salt", "firstDocId")
        .as[(String, Int, Int, Long, Long, Int, Array[Byte], Int)]
        .mapPartitions { it =>
          val in = it.buffered
          new Iterator[SegmentRow] {
            override def hasNext: Boolean = in.hasNext
            override def next(): SegmentRow = {
              val head = in.next()
              val (term, salt, numSalts, _, _, _, _, bucket) = head
              var df = head._5
              var maxTf = head._6
              val parts = ArrayBuffer(head._7)
              while (in.hasNext && in.head._1 == term &&
                in.head._2 == salt) {
                val p = in.next()
                df += p._5
                if (p._6 > maxTf) maxTf = p._6
                parts += p._7
              }
              val merged =
                if (parts.length == 1) parts(0)
                else {
                  // partials normally cover disjoint docId ranges (contiguous
                  // file splits of the docId-sorted docs table); a scan that
                  // packed non-adjacent files into one partition can overlap
                  // ranges — detect and sort before re-encoding
                  val all = new Array[Posting](df.toInt)
                  var off = 0
                  for (bytes <- parts) {
                    val ps = PostingCodec.decode(bytes)
                    System.arraycopy(ps, 0, all, off, ps.length)
                    off += ps.length
                  }
                  var monotonic = true
                  var i = 1
                  while (monotonic && i < all.length) {
                    if (all(i).docId <= all(i - 1).docId) monotonic = false
                    i += 1
                  }
                  if (!monotonic)
                    java.util.Arrays.sort(all, Ordering.by((p: Posting) => p.docId))
                  PostingCodec.encode(all)
                }
              SegmentRow(term, salt, numSalts, df, maxTf, merged, bucket)
            }
          }
        }
      segs.write.mode(SaveMode.Overwrite)
        .partitionBy("bucket").parquet(segmentsDir)
    }

    // ---- stage 4: per-partition lineage + metrics ----
    if (!done(lineageDir)) timed("stage4 lineage") {
      spark.read.schema(IndexSchemas.segments).parquet(segmentsDir)
        .groupBy("bucket")
        .agg(count(lit(1)).as("numShards"),
          sum("shardDf").as("numPostings"),
          sum(length(col("postings"))).as("postingBytes"))
        .withColumn("snapshotVersion", lit(version))
        .write.mode(SaveMode.Overwrite).parquet(lineageDir)
    }

    // ---- stage 5: manifest + atomic pointer swap ----
    val statsRow = timed("stage5 stats")(docs.agg(
      count(lit(1)).as("n"),
      avg(col("doclen")).as("avgdl"),
      // order-independent corpus fingerprint over the per-row sha256
      // invariant; decimal sum avoids ANSI long-overflow at scale
      sum(xxhash64(col("sha256")).cast(DecimalType(38, 0))).as("fp"))
      .collect()(0))
    val n = statsRow.getLong(0)
    val avgdl = if (statsRow.isNullAt(1)) 0.0 else statsRow.getDouble(1)
    val fp = if (statsRow.isNullAt(2)) 0L
      else statsRow.getDecimal(2).toBigInteger.longValue()

    val meta = SnapshotMeta(version, n, avgdl, cfg.numBuckets,
      cfg.saltThreshold, cfg.maxSalts, cfg.k1, cfg.b, fp, hotTerms)
    Snapshot.commit(indexDir, meta)
    meta
  }

  /** Resolve-or-build: readers get the committed snapshot if one exists AND
    * its on-disk format matches this code (older formats rebuild as a new
    * generation — the old one stays readable by old code, pointer-swap
    * semantics as usual).
    */
  def buildIfAbsent(corpus: => DataFrame, indexDir: String,
      cfg: IndexConfig = IndexConfig()): SnapshotMeta =
    Snapshot.load(indexDir)
      .filter(_.formatVersion == Snapshot.CurrentFormatVersion)
      .getOrElse(build(corpus, indexDir, cfg))
}
