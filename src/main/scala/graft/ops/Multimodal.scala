package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: media as opaque `binary`
  * columns + typed metadata structs, with decode / feature-extract /
  * resize / frame-sample as partition-batched transforms.
  *
  * The Spark-side plumbing — schema, partitioning, batch shape, null/error
  * channels — is real and tested. The codec kernels themselves are STUBBED
  * (this container ships no image/audio libraries): `decodeStub` derives a
  * deterministic fake decode from the bytes, and the single place to swap in
  * a real codec is marked. At scale the pattern is identical: mapPartitions
  * batches rows so a native decoder amortizes per-partition init (the same
  * shape as `mapInPandas` batches on the Python side).
  */
object Multimodal {

  /** Typed metadata carried alongside the opaque payload. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("codec", StringType))))))

  /** Deterministic synthetic media table (payload = seeded pseudo-bytes). */
  def synthetic(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame = {
    val genU = udf { (id: Long) =>
      val kind = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val len = 64 + ((graft.index.Hashing.mix64(id ^ seed) & 0xff).toInt)
      val bytes = new Array[Byte](len)
      var h = graft.index.Hashing.mix64(id ^ seed ^ 0xbeefL)
      var i = 0
      while (i < len) {
        bytes(i) = (h >>> ((i % 8) * 8)).toByte
        if (i % 8 == 7) h = graft.index.Hashing.mix64(h)
        i += 1
      }
      (kind, bytes)
    }
    spark.range(0, n, 1, math.max(2, spark.sparkContext.defaultParallelism))
      .withColumn("g", genU(col("id")))
      .select(col("id").as("media_id"), col("g._1").as("kind"),
        col("g._2").as("payload"),
        struct(
          lit(64).as("width"), lit(64).as("height"),
          lit(16000).as("sample_rate"), lit(16).as("n_frames"),
          lit("stub").as("codec")).as("meta"))
  }

  /** ==== STUB: swap this single function for a real codec binding ====
    * Deterministic fake decode: 8x8 "luma grid" per image / 16-sample
    * waveform per audio window, derived purely from payload bytes so tests
    * are reproducible at any parallelism.
    */
  def decodeStub(kind: String, payload: Array[Byte]): Array[Float] = {
    val n = if (kind == "audio") 16 else 64
    val out = new Array[Float](n)
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < payload.length) { h = (h ^ payload(i)) * 0x100000001b3L; i += 1 }
    i = 0
    while (i < n) {
      h = graft.index.Hashing.mix64(h + i)
      out(i) = ((h >>> 11).toDouble / (1L << 53).toDouble).toFloat
      i += 1
    }
    out
  }

  /** Decode + feature-extract, batched per partition (decoder init is
    * amortized per partition, not per row — the mapInPandas batch shape).
    * Output: (media_id, kind, features array<float>, decode_ok).
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val rows: Dataset[(Long, String, Array[Float], Boolean)] =
      media.select("media_id", "kind", "payload")
        .as[(Long, String, Array[Byte])]
        .mapPartitions { it =>
          // >>> per-partition decoder init would go here <<<
          it.map { case (id, kind, payload) =>
            try {
              val f = decodeStub(kind, payload)
              (id, kind, f, true)
            } catch {
              case _: Exception => (id, kind, Array.empty[Float], false)
            }
          }
        }
    rows.toDF("media_id", "kind", "features", "decode_ok")
  }

  /** Frame sampling for video: every `stride`-th frame index up to n_frames
    * (pure metadata operation — the real pipeline hands (payload, frameIdx)
    * pairs to the decoder).
    */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"),
        sequence(lit(0), col("meta.n_frames") - 1, lit(stride)).as("frame_idx"))
      .select(col("media_id"), explode(col("frame_idx")).as("frame"))

  /** Resize is metadata + payload transform; stubbed as metadata update. */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("meta",
      struct(lit(w).as("width"), lit(h).as("height"),
        col("meta.sample_rate").as("sample_rate"),
        col("meta.n_frames").as("n_frames"),
        col("meta.codec").as("codec")))
}
