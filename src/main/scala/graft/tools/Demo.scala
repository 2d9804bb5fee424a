package graft.tools

import org.apache.spark.sql.SparkSession

import graft.corpus.CodeCorpus
import graft.index.{IndexBuilder, IndexConfig, Snapshot}
import graft.query.Searcher

/** CLI surface: build an index over the synthetic corpus and run queries —
  * the spark-submit entry a user of the library would start from.
  *
  * Usage: Demo [nDocs] [indexDir] [query...]
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(800L)
    val dir = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-demo").toString)
    val queries =
      if (args.length > 2) Seq(args.drop(2).mkString(" "))
      else Seq("import spark", "posting merge", "improt parsre")

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val meta = IndexBuilder.buildIfAbsent(
      CodeCorpus.generate(spark, nDocs), dir,
      IndexConfig(numBuckets = 8, saltThreshold = math.max(nDocs / 4, 100), maxSalts = 8))
    println(s"snapshot v${meta.version}: docs=${meta.numDocs} " +
      f"avgdl=${meta.avgDocLen}%.1f hotTerms=${meta.hotTerms}")

    for (q <- queries) {
      println(s"\n=== query: '$q' (top-5) ===")
      val hits = Searcher.search(spark, dir, q, 5, fuzzy = true)
      Searcher.resolveHits(spark, dir, hits)
        .select("rank", "score", "repo", "path")
        .show(5, 80)
    }
    spark.stop()
  }
}
