package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Same-JVM A/B of the two decode paths on a MANY-TINY-FILE layout —
  * isolates per-reader init cost from hypervisor steal (both sides
  * run interleaved in one process).  Dev probe, not part of the
  * driver contract.
  */
object ProbeVecInit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.hadoop.fs.iostatistics.thread.level.enabled", "false")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.hadoop.fs.file.impl", "graft.sources.NioLocalFileSystem")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("vecinit").toString
    // ~300 files of ~70 rows each
    val df = (0 until 20000).map { i =>
      (i.toLong, (i % 50) * 25.0, (i % 37) * 25.0, i * 1.0)
    }.toDF("id", "x", "y", "z").repartition(300)
    graft.sources.GeoParquet.write(df, dir, 1e9)
    graft.sources.GeoParquet.writeManifest(spark, dir)
    val hc = spark.sparkContext.hadoopConfiguration
    def time(label: String): Double = {
      val t0 = System.nanoTime()
      val n = spark.read.format("graft").load(dir)
        .filter($"x" >= 100.0 && $"x" <= 900.0).count()
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[probe] $label $dt%.3f s (rows $n)")
      dt
    }
    (1 to 2).foreach(_ => time("warm"))
    val results = (1 to 4).flatMap { _ =>
      hc.unset("spark.graft.vectorizedReader")
      val a = time("vec  ")
      hc.set("spark.graft.vectorizedReader", "false")
      val b = time("group")
      Seq(("vec", a), ("group", b))
    }
    Seq("vec", "group").foreach { k =>
      val vs = results.filter(_._1 == k).map(_._2)
      System.err.println(f"[probe] $k min=${vs.min}%.3f median=${vs.sorted.apply(vs.length/2)}%.3f")
    }
    spark.stop()
  }
}
