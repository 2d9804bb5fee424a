package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-Spark-job timing breakdown for one contract query (guide §1/§7):
  * `runMain graft.tools.JobProbe <sfDir> <queryName> [repeat]` runs the
  * query exactly as BenchExtra would and prints one line per Spark job —
  * start offset, duration, and the job's call site — so the cost of a
  * multi-job operator (eager checkpoints, CC-loop rounds, final collect)
  * can be attributed without the UI. Bench/Verify stay frozen.
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val repeat = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (4L * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (256L * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    @volatile var t0 = System.nanoTime()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        starts.put(js.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach { case (s, site) =>
          val off = (s - t0) / 1e9
          val dur = (System.nanoTime() - s) / 1e9
          println(f"[job] ${je.jobId}%4d  +$off%7.3f  $dur%7.3f s  $site")
        }
      }
    })
    val fn = graft.SparkEntry.queries(name)
    (1 to repeat).foreach { pass =>
      println(s"=== pass $pass $name ===")
      t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val built = (System.nanoTime() - t0) / 1e9
      println(f"[probe] plan built (eager jobs above): $built%7.3f s")
      df.collect()
      val total = (System.nanoTime() - t0) / 1e9
      // listener events are async; give the queue a moment before printing
      Thread.sleep(500)
      println(f"[probe] pass $pass total $total%7.3f s")
    }
    spark.stop()
  }
}
