package graft.tools

import org.apache.spark.sql.{SparkSession, SaveMode}
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the index build (dev tool). */
object Profile {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(20000L)
    val cores = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.files.maxPartitionBytes", (4L * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (256L * 1024).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.corpus.CodeCorpus
    import graft.functions.{functions => gf}

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val corpusPath = s"/tmp/graft_profile_corpus_$n"
    if (!new java.io.File(corpusPath, "_SUCCESS").exists()) {
      time("corpus generate+write")(
        CodeCorpus.generate(spark, n, partitions = cores * 2)
          .write.mode(SaveMode.Overwrite).parquet(corpusPath))
    }
    println(s"[profile] corpus scan partitions: " +
      spark.read.parquet(corpusPath).rdd.getNumPartitions)
    val corpus = spark.read.parquet(corpusPath)
    time("corpus count")(corpus.count())
    time("analyze only")(corpus.select(gf.analyze(col("content"))).write.mode(SaveMode.Overwrite).format("noop").save())
    time("tf only")(corpus.select(gf.term_frequencies(col("content"))).write.mode(SaveMode.Overwrite).format("noop").save())
    time("sha2 only")(corpus.select(sha2(col("content"), 256)).write.mode(SaveMode.Overwrite).format("noop").save())
    val dir = s"/tmp/graft_profile_idx_${n}_$cores"
    spark.conf.set("graft.build.verbose", "true")
    val t0 = System.nanoTime()
    graft.index.IndexBuilder.build(corpus, dir,
      graft.index.IndexConfig(numBuckets = 64, saltThreshold = n / 8, maxSalts = 16))
    println(f"[profile] full build: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    // stage-by-stage rerun (resume markers make stages skippable: delete per stage)
    spark.stop()
  }
}
