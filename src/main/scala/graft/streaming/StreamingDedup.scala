package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.Dedup

/** Streaming exact-dedup gate for document ingestion: emit only the FIRST
  * occurrence of each content hash, with state BOUNDED by the event-time
  * watermark (`dropDuplicatesWithinWatermark` — hashes older than the
  * watermark are evicted from the state store).
  *
  * Contract at 100 TB: this is the bounded-state streaming GATE, not an
  * exact global dedup — a duplicate arriving more than `lateness` after
  * its original passes through (its hash has been evicted). Exactness is
  * restored downstream by the batch sweep (`ops.Dedup.exact` /
  * `exactCanonicalIds` over the landed corpus) — the standard
  * streaming-gate + batch-sweep layout; the gate's job is to stop the
  * (overwhelmingly common) near-in-time duplicates from ever landing.
  *
  * Works identically on a batch DataFrame (unified semantics — then it IS
  * exact); the spec drives both and pins agreement.
  */
object StreamingDedup {

  /** Adds `content_hash` and keeps first-seen rows per hash within the
    * watermark horizon. `tsCol` is the event-time column the watermark
    * tracks. On a BATCH frame (dropDuplicatesWithinWatermark is
    * streaming-only) this degrades to exact one-per-hash dedup — one
    * representative row per content hash; pipelines that need the
    * canonical-min-id contract use ops.Dedup.exact for the sweep.
    */
  def firstSeen(docs: DataFrame, textCol: String, tsCol: String,
      lateness: String = "2 hours"): DataFrame = {
    val hashed = docs.withColumn("content_hash", md5(col(textCol)))
    if (docs.isStreaming)
      hashed.withWatermark(tsCol, lateness)
        .dropDuplicatesWithinWatermark("content_hash")
    else hashed.dropDuplicates("content_hash")
  }

  /** Streaming NEAR-dup sweep: every micro-batch runs
    * [[graft.ops.Dedup.minHashLshIncremental]] against the band store of
    * everything previously landed, then appends itself to the store — the
    * incremental batch-sweep family driven continuously by Structured
    * Streaming. By the telescoping contract (spec-pinned at the ops
    * layer), the union of all per-batch pair outputs equals one full
    * [[graft.ops.Dedup.minHashLsh]] run over the whole landed corpus, with
    * every pair emitted exactly once, by the batch that completed it.
    *
    * State is three parquet tables under `stateDir`, each partitioned by
    * `_batch` (the foreachBatch batchId): `corpus` (id, text — verify
    * side), `bands` (the LSH band-row store), `pairs` (the output).
    * Restart safety: a replayed batchId dynamically OVERWRITES only its
    * own `_batch` partition, and the state reads exclude the current
    * batchId — so a batch re-run after a mid-write crash neither
    * double-lands rows nor pairs the batch against its own half-landed
    * remains. At 100 TB each sweep costs O(batch) hashing plus a banded
    * join against the store — never a full-corpus re-pair.
    */
  def nearDupSweep(docs: DataFrame, textCol: String, idCol: String,
      stateDir: String, checkpointDir: String, shingleSize: Int = 3,
      numHashes: Int = 64, bands: Int = 16, minJaccard: Double = 0.8,
      seed: Long = 42L, maxBucketSize: Int = 64): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sweepBatch(batch, batchId, textCol, idCol, stateDir, shingleSize,
          numHashes, bands, minJaccard, seed, maxBucketSize)
      }
      .start()

  /** One micro-batch of [[nearDupSweep]] (exposed for direct testing and
    * for callers driving their own batch loop): sweep `batch` against the
    * landed state under `stateDir`, write this batch's pairs, then land
    * the batch's band rows and text. Idempotent per batchId.
    */
  def sweepBatch(batch: DataFrame, batchId: Long, textCol: String,
      idCol: String, stateDir: String, shingleSize: Int, numHashes: Int,
      bands: Int, minJaccard: Double, seed: Long,
      maxBucketSize: Int): Unit = {
    val spark = batch.sparkSession
    val corpusDir = s"$stateDir/corpus"
    val bandDir = s"$stateDir/bands"
    val pairsDir = s"$stateDir/pairs"
    val b = batch.select(col(idCol), col(textCol))
    def landed(dir: String, template: DataFrame): DataFrame = {
      val path = new org.apache.hadoop.fs.Path(dir)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(path) && fs.listStatus(path).nonEmpty)
        // exclude the current batchId: a crash-replayed batch must not be
        // paired against its own half-landed remains (partition-pruned)
        spark.read.parquet(dir).filter(col("_batch") =!= batchId)
          .drop("_batch")
      else template.limit(0)
    }
    val corpus = landed(corpusDir, b)
    val store = landed(bandDir, Dedup.minHashBandRows(b.limit(0), textCol,
      idCol, shingleSize, numHashes, bands, seed))
    val pairs = Dedup.minHashLshIncremental(b, corpus, store, textCol,
      idCol, shingleSize, numHashes, bands, minJaccard, seed, maxBucketSize)
    def write(df: DataFrame, dir: String): Unit =
      df.withColumn("_batch", lit(batchId)).write
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_batch").mode("overwrite").parquet(dir)
    // pairs first (they read the PRE-batch state), then the state appends
    write(pairs, pairsDir)
    write(Dedup.minHashBandRows(b, textCol, idCol, shingleSize, numHashes,
      bands, seed), bandDir)
    write(b, corpusDir)
  }
}
