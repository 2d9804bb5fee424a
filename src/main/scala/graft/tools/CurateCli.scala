package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Bpe, Curation, Packing, Similarity}

/** CLI surface for the training-data pipeline — the spark-submit entry a
  * user curating a corpus would start from: read the documents (and, when
  * present, embeddings) parquet, run the full gated curation pipeline
  * (exact dedup → MinHash near-dup → SemDeDup → quality → language →
  * repetition → split), write survivors partitioned by split, optionally
  * pack the train split into fixed-length training sequences, and print a
  * one-line JSON report.
  *
  * Usage: CurateCli <sfDir> <outDir> [seqLen]
  *   sfDir   directory with documents.parquet (+ embeddings.parquet)
  *   outDir  output root: curated/ (partitioned by split) and, with
  *           seqLen given, sequences/ (the materialized train sequences)
  */
object CurateCli {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val seqLen = args.lift(2).map(_.toLong)

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .appName("graft-curate")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val nIn = docs.count()

    // semantic stage only when an embeddings table rides along: train the
    // coarse quantizer, cluster, and let SemDeDup prune inside clusters
    val embPath = new java.io.File(s"$sfDir/embeddings.parquet")
    val semantic =
      if (!embPath.exists()) None
      else {
        val e = spark.read.parquet(embPath.toString)
        val model = Similarity.trainIvf(e, "embedding", "vec_id", k = 16,
          iters = 4)
        Some(Curation.Semantic(
          Similarity.withIvfCluster(e, "embedding", model),
          minCosine = 0.3))
      }

    val cfg = Curation.Config(shingleSize = 2, numHashes = 64, bands = 16,
      minJaccard = 0.5, maxBucketSize = 64, minQuality = 0.5,
      keepLangs = Seq("en"), splitSeed = "graft",
      fractions = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
      repTopN = 2, repDupN = 3, maxTopGramPct = Some(8),
      maxRepSpanPct = Some(5))
    val curated = Curation.curate(docs, "text", "doc_id", cfg, semantic)
      .localCheckpoint(true) // the report and both writes reuse one pass
    curated.write.mode("overwrite").partitionBy("split")
      .parquet(s"$outDir/curated")
    val bySplit = curated.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    val train = curated.filter(col("split") === "train")
    val nSeqs = seqLen.map { L =>
      val seqs = Packing.materializeSequences(train, "text", "doc_id", L)
      seqs.write.mode("overwrite").parquet(s"$outDir/sequences")
      seqs.count()
    }

    // tokenizer stats for the train split: 64 BPE merges trained on its
    // word-frequency table (one aggregation), then the trained token
    // count — the number a data-budget plan actually needs
    val merges = Bpe.train(train, "text", numMerges = 64)
    // coalesce: sum over an empty split is NULL, not 0 — aggressive gates
    // or a tiny corpus must yield a 0-token report, not a crash
    val bpeToks = Bpe.tokenCount(train, "text", merges)
      .agg(coalesce(sum(col("n_bpe_tokens")), lit(0L))).collect()(0).getLong(0)

    // last stdout line = the machine-readable report
    println(s"""{"in":$nIn,"kept":${bySplit.values.sum},""" +
      s""""train":${bySplit.getOrElse("train", 0L)},""" +
      s""""val":${bySplit.getOrElse("val", 0L)},""" +
      s""""test":${bySplit.getOrElse("test", 0L)},""" +
      s""""semantic":${semantic.isDefined},""" +
      s""""sequences":${nSeqs.getOrElse(0L)},""" +
      s""""bpe_merges":${merges.length},"train_bpe_tokens":$bpeToks}""")
    spark.stop()
  }
}
