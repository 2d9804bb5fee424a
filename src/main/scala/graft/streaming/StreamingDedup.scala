package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
