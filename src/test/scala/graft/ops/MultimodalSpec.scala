package graft.ops

import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  test("synthetic media table has the contract schema") {
    val m = Multimodal.synthetic(spark, 30)
    assert(m.columns.toSeq == Seq("media_id", "kind", "payload", "meta"))
    assert(m.count() == 30)
    assert(m.select("kind").distinct().count() == 3)
  }

  test("codecs: PPM / BMP / WAV roundtrip exactly") {
    val img = MediaCodecs.Image(3, 2,
      Array[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90,
        -10, -20, -30, -40, -50, -60, -70, -80, -90))
    assert(MediaCodecs.decodePpm(MediaCodecs.encodePpm(img)).contains(img.copy(
      rgb = img.rgb)) || {
      val d = MediaCodecs.decodePpm(MediaCodecs.encodePpm(img)).get
      d.width == 3 && d.height == 2 && d.rgb.toSeq == img.rgb.toSeq
    })
    val db = MediaCodecs.decodeBmp24(MediaCodecs.encodeBmp24(img)).get
    assert(db.width == 3 && db.height == 2 && db.rgb.toSeq == img.rgb.toSeq)
    val a = MediaCodecs.Audio(16000, 1,
      Array[Short](0, 1000, -1000, 32767, -32768, 7))
    val da = MediaCodecs.decodeWavPcm16(MediaCodecs.encodeWavPcm16(a)).get
    assert(da.sampleRate == 16000 && da.channels == 1 &&
      da.samples.toSeq == a.samples.toSeq)
  }

  test("feature kernels: luma grid and RMS behave on known inputs") {
    // 2x2 image: white / black / black / white → grid cells hit exactly
    val white: Byte = -1 // 0xff
    val img = MediaCodecs.Image(2, 2,
      Array[Byte](white, white, white, 0, 0, 0, 0, 0, 0, white, white, white))
    val g = MediaCodecs.grayGrid(img, grid = 2)
    assert(math.abs(g(0) - 1.0f) < 1e-3 && math.abs(g(1)) < 1e-3)
    assert(math.abs(g(2)) < 1e-3 && math.abs(g(3) - 1.0f) < 1e-3)
    // silence → zero RMS; full-scale square wave → ~1.0 RMS
    val silent = MediaCodecs.rmsWindows(MediaCodecs.Audio(16000, 1,
      Array.fill[Short](160)(0)), 16)
    assert(silent.forall(_ == 0f))
    val loud = MediaCodecs.rmsWindows(MediaCodecs.Audio(16000, 1,
      Array.fill[Short](160)(32767)), 16)
    assert(loud.forall(v => math.abs(v - 1.0f) < 1e-3))
  }

  test("feature extraction REALLY decodes: batched, deterministic, typed") {
    val m = Multimodal.synthetic(spark, 30)
    val f = Multimodal.extractFeatures(m)
    val rows = f.select("media_id", "kind", "features", "decode_ok")
      .as[(Long, String, Array[Float], Boolean)].collect()
    assert(rows.length == 30 && rows.forall(_._4))
    assert(rows.filter(_._2 == "audio").forall(_._3.length == 16))
    assert(rows.filter(_._2 == "image").forall(_._3.length == 64))
    // luma grids are in [0,1] and non-degenerate (real pixels, not a hash)
    assert(rows.filter(_._2 == "image")
      .forall(r => r._3.forall(v => v >= 0f && v <= 1f) && r._3.distinct.length > 8))
    // deterministic at different parallelism
    val f2 = Multimodal.extractFeatures(m.repartition(7))
      .select("media_id", "features").as[(Long, Array[Float])]
      .collect().toMap
    for ((id, _, feat, _) <- rows) assert(f2(id).toSeq == feat.toSeq)
  }

  test("corrupt payloads land on the error channel, not as exceptions") {
    val bad = Seq(
      (100L, "image", Array[Byte](1, 2, 3)),
      (101L, "audio", "not a wav".getBytes.toArray),
      // a compressed/unknown container is exactly this case: parseable by
      // no bundled codec -> error channel, never an exception
      (102L, "video", "RIFFxxxxAVI corrupted".getBytes.toArray))
      .toDF("media_id", "kind", "payload")
    val f = Multimodal.extractFeatures(bad)
      .select("media_id", "decode_ok").as[(Long, Boolean)].collect().toMap
    assert(!f(100L) && !f(101L) && !f(102L))
  }

  test("AVI codec: RGB24 frames roundtrip exactly; features are real pixels") {
    val w = 5; val h = 3
    val frames = (0 until 6).map { f =>
      Array.tabulate(w * h * 3)(i => ((i * 7 + f * 31) % 256 - 128).toByte)
    }
    val avi = MediaCodecs.encodeAviRgb(w, h, frames, fps = 5)
    val info = MediaCodecs.decodeAviInfo(avi).get
    assert(info == MediaCodecs.VideoInfo(w, h, 6))
    for (f <- 0 until 6) {
      val img = MediaCodecs.decodeAviFrame(avi, f).get
      assert(img.width == w && img.height == h)
      assert(img.rgb.toSeq == frames(f).toSeq, s"frame $f")
    }
    assert(MediaCodecs.decodeAviFrame(avi, 6).isEmpty)
    // all-white first frame (8x8 so every 4x4 grid cell has pixels) ->
    // first 16 features exactly 1.0
    val white = Array.fill[Byte](8 * 8 * 3)(-1)
    val black = new Array[Byte](8 * 8 * 3)
    val avi2 = MediaCodecs.encodeAviRgb(8, 8, Seq(white, black))
    val feat = Multimodal.videoFeatures(avi2).get
    assert(feat.length == 64)
    assert(feat.take(16).forall(v => math.abs(v - 1.0f) < 1e-3))
    assert(feat.slice(16, 32).forall(v => math.abs(v) < 1e-3))
  }

  test("frame sampling explodes only videos with stride from real n_frames") {
    val m = Multimodal.synthetic(spark, 30)
    val expected = m.filter($"kind" === "video")
      .select($"media_id", $"meta.n_frames").as[(Long, Int)].collect().toMap
    assert(expected.nonEmpty && expected.values.forall(n => n >= 4 && n <= 11))
    val perVideo = Multimodal.sampleFrames(m, stride = 4)
      .groupBy("media_id").count()
      .select($"media_id", $"count").as[(Long, Long)].collect().toMap
    assert(perVideo.keySet == expected.keySet)
    for ((id, nf) <- expected)
      assert(perVideo(id) == (nf - 1) / 4 + 1, s"video $id with $nf frames")
  }

  test("resize REALLY resamples image pixels and re-encodes") {
    val m = Multimodal.synthetic(spark, 9)
    val r = Multimodal.resize(m, 24, 24)
    val imgs = r.filter($"kind" === "image")
      .select("payload", "meta.width", "meta.height")
      .as[(Array[Byte], Int, Int)].collect()
    assert(imgs.nonEmpty)
    for ((payload, w, h) <- imgs) {
      assert(w == 24 && h == 24)
      val dec = MediaCodecs.decodePpm(payload).get
      assert(dec.width == 24 && dec.height == 24)
    }
    // non-images pass through untouched
    val audio0 = m.filter($"kind" === "audio").select("payload")
      .as[Array[Byte]].collect().map(_.toSeq).toSet
    val audio1 = r.filter($"kind" === "audio").select("payload")
      .as[Array[Byte]].collect().map(_.toSeq).toSet
    assert(audio0 == audio1)
  }
}
