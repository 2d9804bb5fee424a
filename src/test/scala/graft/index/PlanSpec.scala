package graft.index

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.corpus.CodeCorpus

/** Physical-plan assertions: the optimizations the engine depends on must
  * actually appear in the executed plan — filter pushdown to parquet,
  * partition (bucket) pruning on the segment store, column pruning on wide
  * tables, and broadcast joins for small-side lookups. `.explain`-driven
  * evidence, not hope.
  */
class PlanSpec extends SparkTestBase {

  private lazy val indexDir = {
    val dir = tmpDir("graft-plan")
    IndexBuilder.build(CodeCorpus.generate(spark, 400, seed = 11L), dir,
      IndexConfig(numBuckets = 8, saltThreshold = 100000L))
    dir
  }

  private def executedPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("segment reads push term filter to parquet and prune bucket dirs") {
    val meta = Snapshot.load(indexDir).get
    val df = spark.read.schema(IndexSchemas.segments)
      .parquet(meta.segmentsDir(indexDir))
      .filter(col("bucket").isin(1, 2) && col("term") === "import")
    val plan = executedPlan(df)
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(term,import)"),
      s"term filter not pushed:\n$plan")
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"bucket partition filter missing:\n$plan")
  }

  test("docs reads prune columns (ReadSchema excludes tfs)") {
    val meta = Snapshot.load(indexDir).get
    val df = spark.read.schema(IndexSchemas.docs)
      .parquet(meta.docsDir(indexDir))
      .select("docId", "sha256")
    val plan = executedPlan(df)
    val readSchema = plan.split("ReadSchema:").last
    assert(readSchema.contains("docId") && readSchema.contains("sha256"))
    assert(!readSchema.contains("tfs"), s"tfs not pruned:\n$readSchema")
  }

  test("hit resolution is a driver-merged point lookup (no join stage)") {
    import graft.query.Searcher
    val hits = Searcher.search(spark, indexDir, "import", 5)
    val resolved = Searcher.resolveHits(spark, indexDir, hits)
    // top-k hits merge on the driver after ONE pruned docs scan — the
    // returned frame is a local relation, not a distributed join
    val plan = executedPlan(resolved)
    assert(plan.contains("LocalTableScan"), s"expected local relation:\n$plan")
    assert(!plan.contains("Join"), s"expected no join stage:\n$plan")
    // ranks arrive in order and resolve to real corpus rows
    val rows = resolved.collect()
    assert(rows.map(_.getAs[Int]("rank")).toSeq == (1 to rows.length))
    assert(rows.forall(r => r.getAs[String]("sha256").length == 64))
  }

  test("analyzer expressions stay inside whole-stage codegen") {
    import graft.functions.{functions => gf}
    val df = CodeCorpus.generate(spark, 10, seed = 3L)
      .select(gf.analyze(col("content")).as("terms"),
        gf.term_frequencies(col("content")).as("tfs"))
      .filter(size(col("terms")) > 0)
    val plan = executedPlan(df)
    // the `*(n)` prefix marks operators fused into a WholeStageCodegen span
    assert(plan.linesIterator.count(_.contains("*(")) >= 3,
      s"analyzer stages not fused into codegen:\n$plan")
    assert(plan.contains("*(1) Project [graft_analyze") ||
      plan.contains("graft_analyze"), s"expression missing:\n$plan")
  }

  test("broadcast lemma table drives column-level lemmatization") {
    import spark.implicits._
    import graft.functions.{functions => gf}
    val table = Seq(("better", "good"), ("oxen", "ox")).toDF("word", "lemma")
    val lem = gf.lemmatize_with(table)
    val out = Seq((1L, Seq("better", "cities", "oxen", "running")))
      .toDF("id", "tokens")
      .select(lem(col("tokens")).as("lemmas"))
      .as[Seq[String]].head()
    assert(out == Seq("good", "city", "ox", "run"))
  }
}
