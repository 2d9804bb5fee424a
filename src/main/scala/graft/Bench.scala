package graft

import org.apache.spark.sql.SparkSession

import graft.corpus.CodeCorpus
import graft.index.{IndexBuilder, IndexConfig}
import graft.query.Searcher

/** Benchmark driver. Prints a JSON line per completed milestone (same
  * schema every time, monotonically more complete, `"partial":true` until
  * the final line) so that a killed/timed-out run still leaves parseable
  * evidence on stdout — the LAST parseable line is the freshest state.
  *
  * Wall-clock budget: `SPARK_GRAFT_BENCH_BUDGET_SEC` (default 2250 s,
  * measured from JVM start). The mandatory work — ONE build-trial pair
  * (local[8] then local[2], same stored corpus), the query-latency probe,
  * and the driver-contract queries — always runs; extra interleaved trial
  * pairs (up to SPARK_GRAFT_BENCH_TRIALS total, default 3) run only while
  * the remaining budget comfortably covers another pair. Contention only
  * adds wall time, so each parallelism point reports the MIN across its
  * trials; per-trial start loadavg and per-stage splits make a degraded
  * run diagnosable from the JSON alone.
  *
  * Phases:
  *  1. scaling: the SAME deterministic stored corpus index-built at
  *     local[2] and local[8] (sandbox proxy for N vs 4N executors —
  *     BENCH/BASELINE.md; the shared host's noisy neighbor makes 32
  *     threads measure contention, not scaling); reports docs/sec at both
  *     and scaling efficiency (thr_4N/thr_N)/4.
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

  /** 1-min loadavg at trial start below which a trial counts as "quiet":
    * ~20 of 32 hardware threads busy leaves 12 free — enough for the
    * 8-thread point to run uncontended. min-of-trials only cancels
    * contention when each point has at least one quiet trial, so the
    * budget loop re-trials any point with zero quiet trials FIRST.
    */
  val QuietLoadMax = 20.0
  private def hasQuiet(ts: collection.Seq[Trial]): Boolean =
    ts.exists(_.load <= QuietLoadMax)

  // ---- mutable snapshot state: everything emitJson needs, updated as
  // ---- milestones complete; a timeout between emissions loses only the
  // ---- in-flight milestone
  private val t0Wall = System.nanoTime()
  private def elapsedSec: Double = (System.nanoTime() - t0Wall) / 1e9
  private var budgetSec: Double = 2250.0
  private var sfDir = ""
  private var scaleDocs = 0L
  private val t8s = scala.collection.mutable.ArrayBuffer.empty[Trial]
  private val t2s = scala.collection.mutable.ArrayBuffer.empty[Trial]
  private var latency: Option[(Double, Double, Double)] = None // p50,p95,qps
  private var contract: Seq[(String, Double, String)] = Seq.empty
  private val phasesDone = scala.collection.mutable.ArrayBuffer.empty[String]
  @volatile private var lastJson: String = ""
  @volatile private var lastCompact: String = ""
  @volatile private var finalEmitted = false

  private def stagesJson(t: Trial): String =
    t.stages.toSeq.sortBy(_._1)
      .map { case (k, v) => jstr(k) + ":" + n(v) }.mkString("{", ",", "}")

  private def trialsJson(ts: Seq[Trial]): String =
    ts.map(t => s"""{"sec":${n(t.sec)},"load_at_start":${n(t.load)}}""")
      .mkString("[", ",", "]")

  /** Serialize the full schema from whatever has completed so far and print
    * it as one clean line on stdout. Called after every milestone; the last
    * line a reader sees is always a valid, maximally-complete record.
    */
  private def emitJson(partial: Boolean): Unit = synchronized {
    if (finalEmitted) return
    if (!partial) finalEmitted = true
    val qs = contract.map { case (k, v, _) => jstr(k) + ":" + n(v) }
      .mkString("{", ",", "}")
    val qStatus = contract.map { case (k, _, st) => jstr(k) + ":" + jstr(st) }
      .mkString("{", ",", "}")
    val ib =
      if (t8s.isEmpty || t2s.isEmpty) "null"
      else {
        val best8 = t8s.minBy(_.sec)
        val best2 = t2s.minBy(_.sec)
        val thr8 = scaleDocs / best8.sec
        val thr2 = scaleDocs / best2.sec
        val eff = (thr8 / thr2) / 4.0
        s"""{"docs":$scaleDocs,"n_cores":2,"fourn_cores":8,""" +
          s""""n_sec":${n(best2.sec)},"fourn_sec":${n(best8.sec)},""" +
          s""""n_docs_per_sec":${n(thr2)},"fourn_docs_per_sec":${n(thr8)},""" +
          s""""scaling_efficiency":${n(eff)},""" +
          s""""trials_n":${t2s.length},"trials_fourn":${t8s.length},""" +
          s""""estimator":"min-of-trials (contention only adds time)",""" +
          s""""n_trials":${trialsJson(t2s.toSeq)},"fourn_trials":${trialsJson(t8s.toSeq)},""" +
          s""""n_stage_sec":${stagesJson(best2)},"fourn_stage_sec":${stagesJson(best8)}}"""
      }
    val lat = latency match {
      case Some((p50, p95, qps)) =>
        s"""{"p50":${n(p50)},"p95":${n(p95)},"qps":${n(qps)}}"""
      case None => "null"
    }
    val total = contract.map(_._2).sum + t8s.map(_.sec).sum + t2s.map(_.sec).sum
    val line =
      s"""{"metric":"total","value":${n(total)},"unit":"sec","queries":$qs,""" +
        s""""sf":${jstr(sfDir)},"index_build":$ib,""" +
        s""""query_latency_ms":$lat,"query_status":$qStatus,""" +
        s""""partial":$partial,"phases_done":${phasesDone.map(jstr).mkString("[", ",", "]")},""" +
        s""""budget_sec":${n(budgetSec)},"elapsed_sec":${n(elapsedSec)}}"""
    lastJson = line
    println(line)
    // The driver captures only the LAST ~2.3 KB of stdout (and sbt appends a
    // trailing "[success] ..." line); r1-r3's full-schema line above grew
    // past that window once 5 trial pairs + two 32-query maps were inlined,
    // so its head was chopped and nothing parsed. Readers take the last
    // parseable line, so ALWAYS follow the full record with one compact
    // headline-only line that fits the window with headroom.
    lastCompact = compactJson(partial, total)
    println(lastCompact)
    System.out.flush()
  }

  /** Headline-only record (≤ ~1 KB): same metric/value/unit/sf contract
    * fields, index-build + latency summaries flattened, per-query map
    * replaced by ok/err counts (full detail lives in the preceding
    * full-schema line and in PROGRESS evidence).
    */
  /** Per-trial evidence as compact [sec, load_at_start] pairs — the driver
    * keeps only the last ~2.3 KB of stdout, so this must stay terse while
    * still letting a reader tell "engine regressed" from "host was busy"
    * for EVERY trial, not just the min.
    */
  private def trialPairs(ts: Seq[Trial]): String =
    ts.map(t => s"[${n(t.sec)},${n(t.load)}]").mkString("[", ",", "]")

  private def compactJson(partial: Boolean, total: Double): String = {
    val ib =
      if (t8s.isEmpty || t2s.isEmpty) "null"
      else {
        val best8 = t8s.minBy(_.sec)
        val best2 = t2s.minBy(_.sec)
        val thr8 = scaleDocs / best8.sec
        val thr2 = scaleDocs / best2.sec
        s"""{"docs":$scaleDocs,"n_cores":2,"fourn_cores":8,""" +
          s""""n_sec":${n(best2.sec)},"fourn_sec":${n(best8.sec)},""" +
          s""""n_docs_per_sec":${n(thr2)},"fourn_docs_per_sec":${n(thr8)},""" +
          s""""scaling_efficiency":${n((thr8 / thr2) / 4.0)},""" +
          s""""trials_n":${t2s.length},"trials_fourn":${t8s.length},""" +
          s""""quiet_load_max":${n(QuietLoadMax)},""" +
          s""""quiet_n":${t2s.count(_.load <= QuietLoadMax)},""" +
          s""""quiet_fourn":${t8s.count(_.load <= QuietLoadMax)},""" +
          s""""n_trials_sec_load":${trialPairs(t2s.toSeq)},""" +
          s""""fourn_trials_sec_load":${trialPairs(t8s.toSeq)}}"""
      }
    val lat = latency match {
      case Some((p50, p95, qps)) =>
        s"""{"p50":${n(p50)},"p95":${n(p95)},"qps":${n(qps)}}"""
      case None => "null"
    }
    val nOk = contract.count(_._3 == "ok")
    val nErr = contract.length - nOk
    s"""{"metric":"total","value":${n(total)},"unit":"sec","compact":true,""" +
      s""""sf":${jstr(sfDir)},"index_build":$ib,"query_latency_ms":$lat,""" +
      s""""queries_ok":$nOk,"queries_err":$nErr,""" +
      s""""n_phases_done":${phasesDone.length},"partial":$partial,""" +
      s""""budget_sec":${n(budgetSec)},"elapsed_sec":${n(elapsedSec)}}"""
  }

  def main(args: Array[String]): Unit = {
    sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    scaleDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "1500000").toLong
    // up to 5 pairs (budget-gated — quiet hosts fit ~5 in the default
    // budget): min-of-trials only cancels contention if SOME trial of each
    // point lands in a quiet window, and spikes here last minutes
    val trialsPerPoint = sys.env.getOrElse("SPARK_GRAFT_BENCH_TRIALS", "5").toInt
    budgetSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_SEC", "2250").toDouble

    // a SIGTERM (e.g. an external `timeout`) still flushes the freshest
    // snapshot: shutdown hooks run on TERM, and re-printing is harmless
    // (readers take the last parseable line). Re-print the COMPACT line —
    // the full-schema line can exceed the driver's tail-capture window.
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      if (lastCompact.nonEmpty) { println(lastCompact); System.out.flush() }
    }))

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
    phasesDone += "corpus"
    val cfg = IndexConfig(numBuckets = 64, saltThreshold = scaleDocs / 8,
      maxSalts = 16)
    def buildTrial(cores: Int, dir: String): Trial = {
      rmrf(new java.io.File(dir))
      // quiet-window probe: need ~`cores` free of 32; neighbor idles at
      // ~8-12 busy, so target 20 leaves 12 free. Wait is bounded both by
      // 90 s and by 5% of the remaining budget — never trade evidence
      // time for quietness.
      val maxWait = math.max(0.0, math.min(90.0, (budgetSec - elapsedSec) * 0.05))
      val load = waitForQuiet(target = 20.0, maxWaitSec = maxWait.toInt)
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
    phasesDone += "warmup"
    // mandatory pair first: after this, scaling evidence exists and is
    // emitted no matter what the rest of the run does
    var pairStart = elapsedSec
    t8s += buildTrial(8, "/tmp/graft_bench_idx8")
    t2s += buildTrial(2, "/tmp/graft_bench_idx2")
    var lastPairSec = elapsedSec - pairStart
    phasesDone += "scaling_pair_1"
    emitJson(partial = true)

    // ---- phase 2: query latency over the built index ----
    def latencyProbe(): (Double, Double, Double) = withSession(8) { spark =>
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
    latency = Some(latencyProbe())
    phasesDone += "latency"
    emitJson(partial = true)

    // ---- phase 3: driver-contract queries on sfDir ----
    // failures are recorded, never swallowed as fast successes
    contract = withSession(cpus) { spark =>
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
    phasesDone += "contract"
    emitJson(partial = true)

    // ---- targeted re-trials: quiet-starved points first ----
    // min-of-trials cancels contention ONLY if each point has at least one
    // trial that started in a quiet window (r04 driver stamp read 0.72 while
    // nine builder runs at the same HEAD read 0.816-0.954 — the 8-core point
    // never got a quiet start). Before spending budget on full extra pairs,
    // re-trial just the quiet-starved point(s); a single-point re-trial
    // costs ~1/3 of a pair when it's the 8-core point.
    var retries = 0
    while (retries < 2 * trialsPerPoint &&
        (!hasQuiet(t8s) || !hasQuiet(t2s))) {
      val target8 = !hasQuiet(t8s)
      val est = (if (target8) t8s else t2s).map(_.sec).min * 1.3 + 100.0
      if (elapsedSec + est >= budgetSec) retries = 2 * trialsPerPoint
      else {
        if (target8) t8s += buildTrial(8, "/tmp/graft_bench_idx8")
        else t2s += buildTrial(2, "/tmp/graft_bench_idx2")
        retries += 1
        phasesDone += s"quiet_retrial_$retries"
        emitJson(partial = true)
      }
    }

    // ---- extra scaling trials, budget-adaptive ----
    // interleaved (8,2) pairs: a load spike hits both points, not just one;
    // each pair needs headroom of 1.3x the last observed pair cost
    var pairs = 1
    while (pairs < trialsPerPoint &&
        elapsedSec + 1.3 * lastPairSec < budgetSec) {
      pairStart = elapsedSec
      t8s += buildTrial(8, "/tmp/graft_bench_idx8")
      t2s += buildTrial(2, "/tmp/graft_bench_idx2")
      lastPairSec = elapsedSec - pairStart
      pairs += 1
      phasesDone += s"scaling_pair_$pairs"
      emitJson(partial = true)
    }

    // ---- latency re-probe in a quieter window ----
    // the first probe runs immediately after the mandatory pair, typically
    // inside the build's load shadow (run R: p50 105 ms at load ~8 vs
    // ~28 ms quiet); with budget left, wait for a dip and re-probe, keeping
    // the better measurement — the same min-of-trials rationale as the
    // build estimator (contention only adds time, never subtracts)
    if (elapsedSec + 150 < budgetSec) {
      waitForQuiet(target = 10.0,
        maxWaitSec = math.min(90.0, budgetSec - elapsedSec - 120).toInt)
      val again = latencyProbe()
      if (latency.forall(_._1 > again._1)) latency = Some(again)
      phasesDone += "latency_reprobe"
      emitJson(partial = true)
    }

    emitJson(partial = false)
  }
}
