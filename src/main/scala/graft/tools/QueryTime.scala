package graft.tools

import org.apache.spark.sql.SparkSession

/** Time a single SparkEntry contract query: `runMain graft.tools.QueryTime
  * <sfDir> <queryName> [trials]`. Prints per-trial wall seconds and row
  * count so per-query optimizations can be measured without a full Bench
  * or Verify pass.
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val trials = args.lift(2).filter(_.forall(_.isDigit))
      .map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    if (args.length > 2 && args(2) == "explain") {
      // plan audit mode: formatted physical plan instead of timing —
      // check pushdown (PushedFilters/ReadSchema), codegen spans, and
      // exchange count the way the scale review expects
      fn(spark, sfDir).explain("formatted")
    } else (1 to trials).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[querytime] $name trial $i: $sec%.2f s ($n rows)")
    }
    spark.stop()
  }
}
