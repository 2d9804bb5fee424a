package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness (guide §1): times the SAME
  * contract queries the frozen [[Bench]] times, with the SAME session
  * config and the same alphabetical cold-run order, but without the
  * index-build/latency phases — so per-query numbers are directly
  * comparable to the driver's BENCH `queries` map while iterating on an
  * operator. Never used by the driver; Bench.scala stays frozen.
  *
  * Usage: `runMain graft.BenchExtra [repeat] [nameSubstr ...]`
  *   - env SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *     SPARK_GRAFT_CPUS (default 32) — the Bench contract knobs.
  *   - `repeat` = how many full alphabetical passes (default 1; pass 1 is
  *     the cold pass matching the driver's methodology, later passes show
  *     warm floors).
  *   - remaining args filter queries by substring (empty = all).
  *
  * Prints one line per (pass, query) and a final JSON line
  * `{"metric":"extra", ...}` with the pass-1 per-query seconds.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val repeat = args.headOption.filter(_.forall(_.isDigit))
      .map(_.toInt).getOrElse(1)
    val filters = args.drop(if (args.headOption.exists(_.forall(_.isDigit))) 1 else 0)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-benchextra-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (4L * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (256L * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => filters.isEmpty || filters.exists(n.contains) }
    val firstPass = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    (1 to repeat).foreach { pass =>
      qs.foreach { case (name, fn) =>
        spark.sparkContext.setJobDescription(s"$name pass $pass")
        val t0 = System.nanoTime()
        val status =
          try { fn(spark, sfDir).collect(); "ok" }
          catch { case e: Throwable =>
            "err: " + Option(e.getMessage).getOrElse(e.getClass.getName)
              .linesIterator.nextOption().getOrElse("").take(120)
          }
        val sec = (System.nanoTime() - t0) / 1e9
        if (pass == 1) firstPass(name) = sec
        println(f"[extra] pass $pass $name%-24s $sec%7.3f s  $status")
      }
    }
    val json = firstPass.map { case (k, v) => s""""$k":${f"$v%.3f"}""" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"extra","unit":"sec","sf":"$sfDir","queries":$json}""")
    spark.stop()
  }
}
