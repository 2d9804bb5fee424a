package graft.tools

import org.apache.spark.sql.SparkSession

import graft.query.IndexReader

/** Dev probe: warm query latency per serving tier over an existing index.
  * Usage: runMain graft.tools.TierProbe <indexDir>
  */
object TierProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_bench_idx8")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val queries = Seq("import spark", "def merge", "posting merge segment",
      "snapshot manifest reader", "parser builder", "codec", "import",
      "scorer ranker codec", "partition shard", "query planner executor")
    def bench(label: String, cfg: IndexReader.ReaderConfig): Unit = {
      val r = IndexReader.open(spark, dir, cfg)
      queries.foreach(q => r.searchHits(r.resolve(q), 100)) // warm
      val lat = (1 to 3).flatMap(_ => queries.map { q =>
        val t0 = System.nanoTime()
        r.searchHits(r.resolve(q), 100)
        (System.nanoTime() - t0) / 1e6
      }).sorted
      println(f"[tier] $label p50=${lat(lat.length / 2)}%.1f ms " +
        f"p95=${lat((lat.length * 95) / 100 min (lat.length - 1))}%.1f ms")
    }
    bench("scatter-gather", IndexReader.ReaderConfig(0, 0, 0))
    bench("coordinator   ", IndexReader.ReaderConfig(0, 0, 256L << 20))
    bench("driver-cached ", IndexReader.ReaderConfig())
    // cold-bulk J1 probe: a FRESH coordinator reader per variant (distinct
    // cache budgets force distinct readers), timing the first pass over the
    // whole query batch — without prewarm each novel-term query pays its
    // own pushdown job; with prewarm the union term set is one job
    def coldBulk(label: String, budget: Long, prewarm: Boolean): Unit = {
      val r = IndexReader.open(spark, dir, IndexReader.ReaderConfig(0, 0, budget))
      val t0 = System.nanoTime()
      if (prewarm)
        r.prewarmShards(r.resolveBulk(queries).flatMap(_.terms.map(_.term)))
      queries.foreach(q => r.searchHits(r.resolve(q), 100))
      println(f"[tier] $label ${(System.nanoTime() - t0) / 1e6}%.1f ms total" +
        f" (${queries.length} queries, cold)")
    }
    coldBulk("cold-bulk no-prewarm", (256L << 20) + 1, prewarm = false)
    coldBulk("cold-bulk prewarmed ", (256L << 20) + 2, prewarm = true)
    spark.stop()
  }
}
