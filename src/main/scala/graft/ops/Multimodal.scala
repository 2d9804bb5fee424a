package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: media as opaque `binary`
  * columns + typed metadata structs, with decode / feature-extract /
  * resize / frame-sample as partition-batched transforms.
  *
  * ALL THREE modalities decode for real — from-scratch codecs in
  * [[MediaCodecs]], no external libraries: PPM P6 / 24-bit BMP images,
  * RIFF/WAVE PCM-16 audio, and RIFF/AVI video with uncompressed RGB24
  * frames (frame extraction + per-frame luma features). COMPRESSED video
  * codecs (H.264 & co.) genuinely need an external library this container
  * does not ship — such payloads fail decode onto the error channel,
  * which is the one remaining documented seam. At scale the pattern is
  * mapPartitions batching so decoder init amortizes per partition (the
  * same shape as `mapInPandas` batches on the Python side).
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

  /** Deterministic synthetic media table with REAL payloads: images are
    * valid PPM (even ids) / BMP (odd ids) files with seeded pixel content;
    * audio is a valid PCM-16 WAV with seeded waveform; video is a valid
    * uncompressed-RGB24 AVI with seeded frames.
    */
  def synthetic(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame = {
    val genU = udf { (id: Long) =>
      val kind = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      def rng(i: Long): Long = graft.index.Hashing.mix64(id ^ seed ^ i)
      val payload: Array[Byte] = kind match {
        case "image" =>
          val w = 16 + (rng(1) & 15).toInt
          val h = 16 + (rng(2) & 15).toInt
          val rgb = new Array[Byte](w * h * 3)
          var i = 0
          while (i < rgb.length) { rgb(i) = (rng(3 + i / 8) >>> ((i % 8) * 8)).toByte; i += 1 }
          val img = MediaCodecs.Image(w, h, rgb)
          if (id % 2 == 0) MediaCodecs.encodePpm(img)
          else MediaCodecs.encodeBmp24(img)
        case "audio" =>
          val nSamp = 256 + (rng(1) & 255).toInt
          val samples = new Array[Short](nSamp)
          var i = 0
          while (i < nSamp) { samples(i) = (rng(4 + i / 4) >>> ((i % 4) * 16)).toShort; i += 1 }
          MediaCodecs.encodeWavPcm16(MediaCodecs.Audio(16000, 1, samples))
        case _ =>
          val w = 8 + (rng(1) & 7).toInt
          val h = 8 + (rng(2) & 7).toInt
          val nf = 4 + (rng(3) & 7).toInt
          val frames = (0 until nf).map { f =>
            val rgb = new Array[Byte](w * h * 3)
            var i = 0
            while (i < rgb.length) {
              rgb(i) = (rng(7 + f * 131 + i / 8) >>> ((i % 8) * 8)).toByte
              i += 1
            }
            rgb
          }
          MediaCodecs.encodeAviRgb(w, h, frames)
      }
      val nFrames = kind match {
        case "video" => MediaCodecs.decodeAviInfo(payload).map(_.nFrames).getOrElse(0)
        case "image" => 1
        case _ => 0
      }
      (kind, payload, nFrames)
    }
    spark.range(0, n, 1, math.max(2, spark.sparkContext.defaultParallelism))
      .withColumn("g", genU(col("id")))
      .select(col("id").as("media_id"), col("g._1").as("kind"),
        col("g._2").as("payload"),
        struct(
          lit(0).as("width"), lit(0).as("height"),
          lit(16000).as("sample_rate"), col("g._3").as("n_frames"),
          when(col("g._1") === "image", "ppm|bmp")
            .when(col("g._1") === "audio", "wav")
            .otherwise("avi").as("codec")).as("meta"))
  }

  /** REAL video features: sample up to 4 frames evenly across the clip,
    * 4x4 average-pooled luma grid per sampled frame, concatenated and
    * zero-padded to a fixed 64 floats. Compressed/corrupt containers
    * return None (the error channel) — the documented seam for codecs
    * that need an external library.
    */
  def videoFeatures(payload: Array[Byte]): Option[Array[Float]] =
    MediaCodecs.openAvi(payload).map { case (info, offs) =>
      // parse once (openAvi), decode sampled frames from the cached
      // offsets — not one container re-walk per sampled frame
      val take = math.min(4, info.nFrames)
      val out = new Array[Float](64)
      var s = 0
      while (s < take) {
        // even sampling: frame index s * n / take (first frame always in)
        val idx = (s.toLong * info.nFrames / take).toInt
        MediaCodecs.decodeAviFrameAt(payload, info, offs(idx)).foreach { img =>
          val g = MediaCodecs.grayGrid(img, 4)
          System.arraycopy(g, 0, out, s * 16, math.min(16, g.length))
        }
        s += 1
      }
      out
    }

  /** Real per-row decode: PPM/BMP → 8x8 average-pooled luma grid; WAV →
    * 16-window RMS energy; AVI video → sampled-frame luma features. None =
    * corrupt or unsupported payload (the error channel).
    */
  def decode(kind: String, payload: Array[Byte]): Option[Array[Float]] =
    kind match {
      case "image" =>
        MediaCodecs.decodePpm(payload).orElse(MediaCodecs.decodeBmp24(payload))
          .map(MediaCodecs.grayGrid(_))
      case "audio" =>
        MediaCodecs.decodeWavPcm16(payload).map(MediaCodecs.rmsWindows(_))
      case "video" => videoFeatures(payload)
      case _ => None
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
              decode(kind, payload) match {
                case Some(f) => (id, kind, f, true)
                case None => (id, kind, Array.empty[Float], false)
              }
            } catch {
              case _: Exception => (id, kind, Array.empty[Float], false)
            }
          }
        }
    rows.toDF("media_id", "kind", "features", "decode_ok")
  }

  /** Frame sampling for video: every `stride`-th frame index up to n_frames
    * (metadata fan-out — the real pipeline hands (payload, frameIdx) pairs
    * to the decoder seam).
    */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"),
        sequence(lit(0), col("meta.n_frames") - 1, lit(stride)).as("frame_idx"))
      .select(col("media_id"), explode(col("frame_idx")).as("frame"))

  /** REAL image resize: decode (PPM or BMP), nearest-neighbor resample,
    * re-encode as PPM, update metadata. Non-images and undecodable payloads
    * pass through unchanged with their original meta.
    */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val resized: Dataset[(Long, String, Array[Byte], Int, Int, Boolean)] =
      media.select("media_id", "kind", "payload")
        .as[(Long, String, Array[Byte])]
        .mapPartitions { it =>
          it.map { case (id, kind, payload) =>
            if (kind != "image") (id, kind, payload, 0, 0, false)
            else try {
              MediaCodecs.decodePpm(payload)
                .orElse(MediaCodecs.decodeBmp24(payload)) match {
                case Some(img) =>
                  val r = MediaCodecs.resizeNearest(img, w, h)
                  (id, kind, MediaCodecs.encodePpm(r), w, h, true)
                case None => (id, kind, payload, 0, 0, false)
              }
            } catch {
              // corrupt payloads pass through on the error channel — one
              // bad row must not fail the job
              case _: Exception => (id, kind, payload, 0, 0, false)
            }
          }
        }
    val out = resized.toDF("media_id", "kind", "payload", "width", "height",
      "resized")
    out.join(media.select(col("media_id"), col("meta").as("meta0")), "media_id")
      .withColumn("meta", struct(
        when(col("resized"), col("width")).otherwise(col("meta0.width")).as("width"),
        when(col("resized"), col("height")).otherwise(col("meta0.height")).as("height"),
        col("meta0.sample_rate").as("sample_rate"),
        col("meta0.n_frames").as("n_frames"),
        when(col("resized"), lit("ppm")).otherwise(col("meta0.codec")).as("codec")))
      .select("media_id", "kind", "payload", "meta")
  }
}
