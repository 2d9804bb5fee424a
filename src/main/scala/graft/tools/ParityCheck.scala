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
    spark.stop()
  }
}
