package graft

import org.apache.spark.sql.SparkSession

import graft.corpus.CodeCorpus
import graft.index.{IndexBuilder, IndexConfig}
import graft.query.Searcher

/** Benchmark driver. Prints ONE JSON line:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...,
  *  "index_build":{...},"query_latency_ms":{...},"query_status":{...}}
  *
  * Three phases:
  *  1. scaling: the SAME deterministic stored corpus index-built at
  *     local[2] and local[8] (sandbox proxy for N vs 4N executors —
  *     BENCH/BASELINE.md; the shared host's noisy neighbor makes 32 threads
  *     measure contention, not scaling); reports docs/sec at both and
  *     scaling efficiency (thr_4N/thr_N)/4.
  *
  *     Contention robustness (the host is shared — load average ~8-12 at
  *     "idle", with spikes): each parallelism point is measured as the MIN
  *     of 3 trials, interleaved (8,2,8,2,8,2) so a load spike cannot bias
  *     one point only. Contention strictly adds wall time, so min is the
  *     unbiased estimator of the engine's own cost. Before each trial a
  *     load probe waits (bounded) for a quiet window; the observed loadavg
  *     is recorded per trial, and per-stage build timings are emitted for
  *     the chosen (min) trials, so a degraded run is diagnosable from the
  *     JSON alone.
  *  2. query latency: the reference query set against the built index,
  *     repeated; reports p50/p95 per the BASELINE.json metric.
  *  3. driver-contract queries over SPARK_GRAFT_SF_DIR. Failures are NOT
  *     swallowed: per-query ok/err lands in "query_status".
  */
object Bench {

  private def withSession[T](cores: Int)(f: SparkSession => T): T = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // bench corpora are small parquet files: without this Spark packs them
      // into ~2 scan partitions (128MB maxPartitionBytes + 4MB openCost) and
      // the analyze stage runs serial regardless of core count
      .config("spark.sql.files.maxPartitionBytes", (4L * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (256L * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try f(spark)
    finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  private def rmrf(p: java.io.File): Unit = {
    if (p.isDirectory) p.listFiles().foreach(rmrf)
    p.delete()
  }

  private def loadAvg(): Double =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ")(0).toDouble
    catch { case _: Throwable => -1.0 }

  /** Wait (bounded) for the 1-min load average to dip below `target`, so a
    * trial starts in a quiet window when one exists; returns the load seen
    * at trial start (diagnosable evidence either way).
    */
  private def waitForQuiet(target: Double, maxWaitSec: Int): Double = {
    val deadline = System.currentTimeMillis() + maxWaitSec * 1000L
    var l = loadAvg()
    while (l > target && System.currentTimeMillis() < deadline) {
      Thread.sleep(5000)
      l = loadAvg()
    }
    l
  }

  private def n(v: Double): String =
    BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString

  private def jstr(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  final case class Trial(sec: Double, load: Double,
      stages: Map[String, Double])

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val scaleDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "1500000").toLong
    val trialsPerPoint = sys.env.getOrElse("SPARK_GRAFT_BENCH_TRIALS", "3").toInt

    val queriesForLatency = Seq(
      "import spark", "def merge", "posting merge segment",
      "snapshot manifest reader", "parser builder", "import def val class",
      "scorer ranker codec", "the runner runs quickly", "partition shard",
      "codec", "import", "query planner executor")

    // ---- phase 1: scaling (N vs 4N cores, same stored input) ----
    // corpus is pre-generated to parquet OUTSIDE the timed region: the
    // metric is INDEX-BUILD throughput over a stored table, not synthetic
    // data generation speed
    val corpusPath = s"/tmp/graft_bench_corpus_$scaleDocs"
    if (!new java.io.File(corpusPath, "_SUCCESS").exists()) {
      withSession(32) { spark =>
        CodeCorpus.generate(spark, scaleDocs, seed = 42L, partitions = 64)
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(corpusPath)
      }
    }
    val cfg = IndexConfig(numBuckets = 64, saltThreshold = scaleDocs / 8,
      maxSalts = 16)
    def buildTrial(cores: Int, dir: String): Trial = {
      rmrf(new java.io.File(dir))
      // quiet-window probe: need ~`cores` free of 32; neighbor idles at
      // ~8-12 busy, so target 20 leaves 12 free. Bounded wait: 90 s.
      val load = waitForQuiet(target = 20.0, maxWaitSec = 90)
      val stages = scala.collection.mutable.Map.empty[String, Double]
      val sec = withSession(cores) { spark =>
        val corpus = spark.read.parquet(corpusPath)
        val t0 = System.nanoTime()
        IndexBuilder.build(corpus, dir, cfg,
          onStageTime = (label, s) => stages(label) = s)
        (System.nanoTime() - t0) / 1e9
      }
      Trial(sec, load, stages.toMap)
    }
    // N vs 4N parallelism: local[2] vs local[8]. The sandbox host carries a
    // noisy neighbor (~10 busy cores at "idle"); 8 threads fit the free
    // capacity, 32 would oversubscribe and measure contention, not scaling.
    // An untimed warm-up build levels JIT state for both timed runs.
    {
      rmrf(new java.io.File("/tmp/graft_bench_warm"))
      withSession(8) { spark =>
        IndexBuilder.build(CodeCorpus.generate(spark, 30000, seed = 1L,
          partitions = 16), "/tmp/graft_bench_warm",
          cfg.copy(saltThreshold = 4000L))
      }
    }
    // interleaved trials: a load spike hits both points, not just one
    val t8s = scala.collection.mutable.ArrayBuffer.empty[Trial]
    val t2s = scala.collection.mutable.ArrayBuffer.empty[Trial]
    for (_ <- 1 to trialsPerPoint) {
      t8s += buildTrial(8, "/tmp/graft_bench_idx8")
      t2s += buildTrial(2, "/tmp/graft_bench_idx2")
    }
    val best8 = t8s.minBy(_.sec)
    val best2 = t2s.minBy(_.sec)
    val thr8 = scaleDocs / best8.sec
    val thr2 = scaleDocs / best2.sec
    val eff = (thr8 / thr2) / 4.0

    // ---- phase 2: query latency over the built index ----
    val (p50, p95, qps) = withSession(8) { spark =>
      val dir = "/tmp/graft_bench_idx8"
      // warm-up pass (JIT + page cache), then 3 measured repetitions
      queriesForLatency.foreach(q =>
        Searcher.searchHits(spark, dir, Searcher.resolve(spark, dir, q), 100))
      val lat = (1 to 3).flatMap { _ =>
        queriesForLatency.map { q =>
          val t0 = System.nanoTime()
          Searcher.searchHits(spark, dir, Searcher.resolve(spark, dir, q), 100)
          (System.nanoTime() - t0) / 1e6
        }
      }.sorted
      val total = lat.sum / 1000.0
      (lat(lat.length / 2), lat(math.min(lat.length - 1, (lat.length * 95) / 100)),
        lat.length / total)
    }

    // ---- phase 3: driver-contract queries on sfDir ----
    // failures are recorded, never swallowed as fast successes
    val results = withSession(cpus) { spark =>
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        val status =
          try { fn(spark, sfDir).collect(); "ok" }
          catch { case e: Throwable =>
            val msg = Option(e.getMessage).filter(_.nonEmpty)
              .getOrElse(e.getClass.getName)
            "err: " + msg.linesIterator.nextOption().getOrElse("").take(160)
          }
        (name, (System.nanoTime() - t0) / 1e9, status)
      }
    }

    val qs = results.map { case (k, v, _) => jstr(k) + ":" + n(v) }
      .mkString("{", ",", "}")
    val qStatus = results.map { case (k, _, st) => jstr(k) + ":" + jstr(st) }
      .mkString("{", ",", "}")
    def stagesJson(t: Trial): String =
      t.stages.toSeq.sortBy(_._1)
        .map { case (k, v) => jstr(k) + ":" + n(v) }.mkString("{", ",", "}")
    def trialsJson(ts: Seq[Trial]): String =
      ts.map(t => s"""{"sec":${n(t.sec)},"load_at_start":${n(t.load)}}""")
        .mkString("[", ",", "]")
    val total = results.map(_._2).sum + t8s.map(_.sec).sum + t2s.map(_.sec).sum
    println(
      s"""{"metric":"total","value":${n(total)},"unit":"sec","queries":$qs,""" +
        s""""sf":"$sfDir","index_build":{"docs":$scaleDocs,""" +
        s""""n_cores":2,"fourn_cores":8,""" +
        s""""n_sec":${n(best2.sec)},"fourn_sec":${n(best8.sec)},""" +
        s""""n_docs_per_sec":${n(thr2)},"fourn_docs_per_sec":${n(thr8)},""" +
        s""""scaling_efficiency":${n(eff)},""" +
        s""""trials":$trialsPerPoint,"estimator":"min-of-trials (contention only adds time)",""" +
        s""""n_trials":${trialsJson(t2s.toSeq)},"fourn_trials":${trialsJson(t8s.toSeq)},""" +
        s""""n_stage_sec":${stagesJson(best2)},"fourn_stage_sec":${stagesJson(best8)}},""" +
        s""""query_latency_ms":{"p50":${n(p50)},"p95":${n(p95)},"qps":${n(qps)}},""" +
        s""""query_status":$qStatus}""")
  }
}
