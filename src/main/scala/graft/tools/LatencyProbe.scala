package graft.tools

import org.apache.spark.sql.SparkSession

import graft.query.Searcher

/** Standalone twin of Bench's query-latency phase (Bench.scala is frozen
  * for measurement): the same 12 reference queries against a built index,
  * warm-up pass + 3 measured repetitions, p50/p95/qps — so searcher
  * optimizations can be measured without a full Bench run.
  *
  * Usage: `runMain graft.tools.LatencyProbe [idxDir] [cores]`
  * (defaults: /tmp/graft_bench_idx8, 8 — the Bench phase-2 conditions).
  */
object LatencyProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_bench_idx8")
    val cores = args.lift(1).getOrElse("8")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val queries = Seq(
      "import spark", "def merge", "posting merge segment",
      "snapshot manifest reader", "parser builder", "import def val class",
      "scorer ranker codec", "the runner runs quickly", "partition shard",
      "codec", "import", "query planner executor")
    queries.foreach(q =>
      Searcher.searchHits(spark, dir, Searcher.resolve(spark, dir, q), 100))
    val perQ = scala.collection.mutable.Map.empty[String, Double]
    val lat = (1 to 3).flatMap { _ =>
      queries.map { q =>
        val t0 = System.nanoTime()
        Searcher.searchHits(spark, dir, Searcher.resolve(spark, dir, q), 100)
        val ms = (System.nanoTime() - t0) / 1e6
        perQ(q) = math.min(perQ.getOrElse(q, Double.MaxValue), ms)
        ms
      }
    }.sorted
    val total = lat.sum / 1000.0
    perQ.toSeq.sortBy(-_._2).foreach { case (q, ms) =>
      println(f"[lat] min $ms%8.2f ms  $q")
    }
    println(f"[lat] p50=${lat(lat.length / 2)}%.2f ms " +
      f"p95=${lat(math.min(lat.length - 1, (lat.length * 95) / 100))}%.2f ms " +
      f"qps=${lat.length / total}%.2f")
    spark.stop()
  }
}
