package graft

import org.apache.spark.sql.SparkSession

/** Single-query repeat probe for stack-sampling attribution (round
  * 17): runs one declared query in a loop with the bench's exact
  * session shape so an external `jstack` sampler can attribute wall
  * time to frames.  Prints per-iteration seconds and the process CPU
  * / wall ratio (a ratio far below the core count on a 32-core box
  * means the query is driver/serial-bound, not data-bound).
  */
object ProbeLoop {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = args.lift(1).getOrElse("q_sql_asof_mor")
    val iters = args.lift(2).map(_.toInt).getOrElse(6)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.openCostInBytes", "131072")
      .config("spark.hadoop.fs.iostatistics.thread.level.enabled", "false")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.hadoop.fs.file.impl", "graft.sources.NioLocalFileSystem")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(name)
    def cpuSec(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case os: com.sun.management.OperatingSystemMXBean =>
          os.getProcessCpuTime / 1e9
        case _ => -1.0
      }
    // warm at sf0.001 (the bench's shape)
    try fn(spark, "/root/testdata/sf0.001").write.format("noop")
      .mode("overwrite").save()
    catch { case e: Throwable => e.printStackTrace() }
    graft.core.CacheBag.releaseAll()
    println(s"PROBE_READY pid=${ProcessHandle.current().pid()}")
    (1 to iters).foreach { i =>
      val c0 = cpuSec(); val t0 = System.nanoTime()
      fn(spark, sf).write.format("noop").mode("overwrite").save()
      graft.core.CacheBag.releaseAll()
      val dt = (System.nanoTime() - t0) / 1e9
      val dc = cpuSec() - c0
      println(f"PROBE_ITER $i $name $dt%.2f s  cpu/wall=${dc / dt}%.1f")
    }
    spark.stop()
  }
}
