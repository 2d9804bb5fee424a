package graft.tools

import org.apache.spark.sql.SparkSession
import graft.query.Searcher

/** Rank-parity audit against an EXISTING (e.g. bench-scale) index: block-max
  * WAND vs the exact scorer, exact float + tie equality, over the reference
  * query set. Usage: ParityCheck <indexDir> [k]
  */
object ParityCheck {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_bench_idx8")
    val k = args.lift(1).map(_.toInt).getOrElse(100)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val queries = Seq(
      "import spark", "def merge", "posting merge segment",
      "snapshot manifest reader", "parser builder", "import def val class",
      "scorer ranker codec", "the runner runs quickly", "partition shard",
      "codec", "import", "query planner executor", "improt mrege")
    var ok = 0
    for (q <- queries) {
      val fuzzy = q.contains("improt")
      val rq = Searcher.resolve(spark, dir, q, fuzzy)
      val wand = Searcher.searchHits(spark, dir, rq, k).toSeq
      val exact = Searcher.searchExactHits(spark, dir, rq, k).toSeq
      val status = if (wand == exact) { ok += 1; "OK " } else "DIFF"
      println(s"[parity] $status '$q' (${wand.length} hits)")
      if (wand != exact) {
        println(s"  wand : ${wand.take(3)}")
        println(s"  exact: ${exact.take(3)}")
      }
    }
    println(s"[parity] $ok/${queries.length} rank-identical at k=$k over ${graft.index.Snapshot.load(dir).get.numDocs} docs")

    // cross-parallelism determinism: a second index dir (same corpus, built
    // at a different core count) must answer every query identically and
    // carry the same corpus stats (north_rule N vs 4N determinism)
    args.lift(2).foreach { otherDir =>
      val m1 = graft.index.Snapshot.load(dir).get
      val m2 = graft.index.Snapshot.load(otherDir).get
      val statsOk = m1.numDocs == m2.numDocs && m1.avgDocLen == m2.avgDocLen &&
        m1.corpusFingerprint == m2.corpusFingerprint
      println(s"[parity] cross-index stats identical: $statsOk")
      var xok = 0
      for (q <- queries) {
        val h1 = Searcher.searchHits(spark, dir, Searcher.resolve(spark, dir, q), k).toSeq
        val h2 = Searcher.searchHits(spark, otherDir, Searcher.resolve(spark, otherDir, q), k).toSeq
        if (h1 == h2) xok += 1
        else println(s"[parity] XDIFF '$q': ${h1.take(2)} vs ${h2.take(2)}")
      }
      println(s"[parity] $xok/${queries.length} identical across build parallelisms")
    }
    spark.stop()
  }
}
