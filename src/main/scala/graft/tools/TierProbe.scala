package graft.tools

import org.apache.spark.sql.SparkSession

import graft.query.IndexReader

/** Dev probe: warm query latency per serving tier over an existing index.
  * Usage: runMain graft.tools.TierProbe <indexDir> [grid]
  * `grid` additionally sweeps the cache-policy probe over a Zipf-exponent
  * × budget-fraction grid instead of the single default cell.
  */
object TierProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_bench_idx8")
    val fullGrid = args.contains("grid")
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
    // cache-policy probe: FIFO vs LRU on a Zipf-skewed single-term workload
    // under a tight byte budget (40% of the universe's resident bytes) —
    // the regime where eviction policy matters: the Zipf head fits, the
    // tail churns. Deterministic draw sequence, shared by both policies.
    // universe = the index's own top-df dictionary terms (so the probe
    // works over any corpus), restricted to analyzer fixed points so
    // resolve(term) round-trips to the same dict entry
    val meta = graft.index.Snapshot.load(dir)
      .getOrElse(sys.error(s"no snapshot at $dir"))
    val universe = spark.read.parquet(meta.dictDir(dir))
      .select("term", "df")
      .orderBy(org.apache.spark.sql.functions.desc("df"),
        org.apache.spark.sql.functions.col("term"))
      .limit(80).collect().map(_.getString(0))
      .filter(t =>
        graft.analyzer.Analyzers.analyze(meta.analyzer, t).toSeq == Seq(t))
      .take(30).toSeq
    val sizer = IndexReader.open(spark, dir,
      IndexReader.ReaderConfig(0, 0, 4096L << 20))
    sizer.prewarmShards(
      universe.flatMap(q => sizer.resolve(q).terms.map(_.term)))
    val totalBytes = sizer.shardCacheBytesUsed
    // the grid sweeps workload skew (Zipf exponent: flat -> peaky) and
    // cache pressure (budget fraction of the resident bytes); the default
    // single cell (1.1, 40%) is the regime the round-4 LRU decision was
    // measured in. Each cell shares ONE deterministic draw sequence across
    // both policies; the tiny budget offset per cell forces a fresh
    // reader (readers are cached by exact config).
    val cells: Seq[(Double, Int)] =
      if (fullGrid) for {
        zipf <- Seq(0.7, 1.1, 1.5); pct <- Seq(25, 40, 60)
      } yield (zipf, pct)
      else Seq((1.1, 40))
    for (((zipf, pct), cell) <- cells.zipWithIndex) {
      val budget = math.max(1L, totalBytes * pct / 100 + cell * 2)
      val rnd = new scala.util.Random(7)
      val weights = universe.indices.map(i => 1.0 / math.pow(i + 1, zipf))
      val cum = weights.scanLeft(0.0)(_ + _).tail
      val draws = Seq.fill(500) {
        val x = rnd.nextDouble() * cum.last
        universe(cum.indexWhere(x <= _))
      }
      def policy(label: String, lru: Boolean): Unit = {
        val r = IndexReader.open(spark, dir,
          IndexReader.ReaderConfig(0, 0, budget + (if (lru) 1 else 0),
            shardCacheLru = lru))
        val t0 = System.nanoTime()
        draws.foreach(q => r.searchHits(r.resolve(q), 100))
        val ms = (System.nanoTime() - t0) / 1e6
        val (h, m) = r.shardCacheStats
        println(f"[tier] policy $label zipf=$zipf%.1f budget=$pct%d%% " +
          f"hit-rate=${h.toDouble / (h + m)}%.3f (${h}h/${m}m) " +
          f"total=$ms%.0f ms (${budget / 1024}KB of " +
          f"${totalBytes / 1024}KB resident)")
      }
      policy("fifo", lru = false)
      policy("lru ", lru = true)
    }
    spark.stop()
  }
}
