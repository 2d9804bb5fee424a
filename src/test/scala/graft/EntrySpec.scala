package graft

import graft.SparkTestBase

/** Driver-contract sanity: entry() returns rows; every oracleSql key exists
  * in queries; every query runs at sf0.001 and returns a schema with
  * deterministic-friendly types.
  */
class EntrySpec extends SparkTestBase {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without impl: $missing")
  }

  test("q_entity_detect counts match the naive reimplementation oracle") {
    import graft.surface.NaiveDetectOracle
    import graft.surface.NaiveDetectOracle.DictRow
    // the exact dictionary q_entity_detect commits
    val dict = Seq(
      ("dbop", "Spark", Seq("spark", "sprk")), ("dbop", "Merge", Seq("merge", "mrege")),
      ("dbop", "Window", Seq("window")), ("dbop", "Filter", Seq("filter")),
      ("size", "Big", Seq("big", "huge")), ("size", "Small", Seq("small", "tiny"))
    ).flatMap { case (e, v, vs) => vs.map(DictRow(e, v, _, "en")) }
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val d = s"/root/testdata/$sf"
      val engine = SparkEntry.queries("q_entity_detect")(spark, d)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      val docs = spark.read.parquet(s"$d/documents.parquet")
        .select("doc_id", "text").collect()
      val naive = docs
        .flatMap(r => NaiveDetectOracle.detect(r.getString(1), dict,
          Seq("dbop", "size")))
        .groupBy(t => (t._1, t._2))
        .map { case ((e, v), xs) => (e, v, xs.length.toLong) }.toSet
      assert(engine == naive,
        s"$sf: engine=${engine.toSeq.sorted} naive=${naive.toSeq.sorted}")
    }
  }

  test("every query runs at sf0.001 and returns rows") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val n = fn(spark, "/root/testdata/sf0.001").count()
        if (n == 0) Some(s"$name: 0 rows") else None
      } catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(120)}") }
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }
}
