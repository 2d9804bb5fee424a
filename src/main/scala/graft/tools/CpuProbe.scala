package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: pure-CPU scaling probe (no IO, no shuffle, minimal alloc). */
object CpuProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000000L)
    for (cores <- Seq(8, 32, 8, 32)) {
      val spark = SparkSession.builder().master(s"local[$cores]")
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val t0 = System.nanoTime()
      val s = spark.sparkContext.range(0, n, 1, cores * 4)
        .map(graft.index.Hashing.mix64).reduce(_ ^ _)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[cpuprobe] cores=$cores%2d time=$dt%.2f s (checksum $s)")
      spark.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    }
  }
}
