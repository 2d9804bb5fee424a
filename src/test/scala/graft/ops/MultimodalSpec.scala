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

  test("feature extraction is batched, deterministic, typed") {
    val m = Multimodal.synthetic(spark, 30)
    val f = Multimodal.extractFeatures(m)
    val rows = f.select("media_id", "kind", "features", "decode_ok")
      .as[(Long, String, Array[Float], Boolean)].collect()
    assert(rows.length == 30 && rows.forall(_._4))
    assert(rows.filter(_._2 == "audio").forall(_._3.length == 16))
    assert(rows.filter(_._2 == "image").forall(_._3.length == 64))
    // deterministic at different parallelism
    val f2 = Multimodal.extractFeatures(m.repartition(7))
      .select("media_id", "features").as[(Long, Array[Float])]
      .collect().toMap
    for ((id, _, feat, _) <- rows) assert(f2(id).toSeq == feat.toSeq)
  }

  test("frame sampling explodes only videos with stride") {
    val m = Multimodal.synthetic(spark, 30)
    val frames = Multimodal.sampleFrames(m, stride = 4)
    val perVideo = frames.groupBy("media_id").count()
      .select("count").as[Long].collect()
    assert(perVideo.nonEmpty && perVideo.forall(_ == 4)) // 16 frames / stride 4
  }

  test("resize updates metadata without touching payload") {
    val m = Multimodal.synthetic(spark, 6)
    val r = Multimodal.resize(m, 224, 224)
    assert(r.select("meta.width").as[Int].collect().forall(_ == 224))
    assert(r.select("payload").as[Array[Byte]].collect().map(_.toSeq).toSet ==
      m.select("payload").as[Array[Byte]].collect().map(_.toSeq).toSet)
  }
}
