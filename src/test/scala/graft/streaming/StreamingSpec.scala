package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkTestBase
import graft.corpus.CodeCorpus
import graft.index.Snapshot
import graft.query.Searcher

class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  test("micro-batches land as snapshot generations; queries see each") {
    val dir = tmpDir("graft-stream")
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, String, String, String, String)]

    val source = stream.toDF()
      .toDF("repo", "path", "commit", "lang", "content")

    def rows(ids: Range): Seq[(String, String, String, String, String)] =
      ids.map { i =>
        (CodeCorpus.repoOf(i, 7L), CodeCorpus.pathOf(i, 7L)._1,
          CodeCorpus.commitOf(i, 7L), CodeCorpus.pathOf(i, 7L)._2,
          CodeCorpus.content(i, 7L))
      }

    stream.addData(rows(0 until 50): _*)
    val q1 = StreamingIngest.start(spark, dir, source)
    q1.processAllAvailable()
    q1.stop()
    val v1 = Snapshot.currentVersion(dir).get
    assert(Snapshot.load(dir).get.numDocs == 50)

    stream.addData(rows(50 until 120): _*)
    val q2 = StreamingIngest.start(spark, dir, source)
    q2.processAllAvailable()
    q2.stop()
    assert(Snapshot.currentVersion(dir).get > v1)
    assert(Snapshot.load(dir).get.numDocs == 120)
    // batch 2 landed as a DELTA generation layered on batch 1 (O(batch)
    // work), not a full rebuild
    assert(Snapshot.load(dir).get.baseVersions.nonEmpty)

    // the published snapshot answers queries over ALL ingested docs
    val hits = Searcher.search(spark, dir, "import", 200)
    assert(hits.count() > 0)

    // duplicate natural keys are deduped (upsert semantics)
    stream.addData(rows(100 until 120): _*)
    val q3 = StreamingIngest.start(spark, dir, source)
    q3.processAllAvailable()
    q3.stop()
    assert(Snapshot.load(dir).get.numDocs == 120)
  }

  test("crash recovery: rows appended without a snapshot commit are indexed by the next batch") {
    val dir = tmpDir("graft-stream-crash")
    def rows(ids: Range) =
      ids.map { i =>
        (CodeCorpus.repoOf(i, 9L), CodeCorpus.pathOf(i, 9L)._1,
          CodeCorpus.commitOf(i, 9L), CodeCorpus.pathOf(i, 9L)._2,
          CodeCorpus.content(i, 9L))
      }.toDF("repo", "path", "commit", "lang", "content")
    StreamingIngest.appendBatch(spark, dir, rows(0 until 40))
    assert(Snapshot.load(dir).get.numDocs == 40)
    // simulate a batch that appended to the corpus then died before its
    // snapshot commit: write rows 40..60 directly to the corpus dir
    rows(40 until 60).write.mode("append")
      .parquet(StreamingIngest.corpusDir(dir))
    // the next successful batch must pick them up (delta over full corpus)
    StreamingIngest.appendBatch(spark, dir, rows(60 until 70))
    assert(Snapshot.load(dir).get.numDocs == 70)
    assert(Snapshot.load(dir).get.baseVersions.nonEmpty)
  }
}
