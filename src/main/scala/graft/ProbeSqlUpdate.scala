package graft

import org.apache.spark.sql.SparkSession

/** Phase-timing probe for the q_sql_update regression hunt: splits
  * the gate query into write / manifest / UPDATE / compact / read and
  * times each, twice (warm JVM on the second pass).
  */
object ProbeSqlUpdate {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      // local NVMe open cost, not the 4 MB remote-storage default —
      // lets packPartitions collapse a many-tiny-file layout to a
      // handful of tasks (cluster deployments keep Spark's default)
      .config("spark.sql.files.openCostInBytes", "131072")
      // local-mode FS overhead killers, measured by stack sampling:
      // thread-level IOStatistics aggregation ran a parallel-stream
      // collect on EVERY stream close; the v1 committer double-renames
      // every staged file; the checksummed LocalFileSystem doubles
      // small-file IO with .crc siblings.  Cluster deployments on
      // HDFS/S3 are unaffected (their committers/stores differ).
      .config("spark.hadoop.fs.iostatistics.thread.level.enabled", "false")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.hadoop.fs.file.impl", "graft.sources.NioLocalFileSystem")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$tag%-28s $s%8.2f s")
      s
    }
    val pts = core.Tables.eventsPoints(spark, sf).select("id", "x", "y", "z")
    // Bench-shaped: catalog registered ONCE, warehouse pinned to the
    // first tempdir (conf.set after first use is ignored), so every
    // pass re-mutates the SAME layout — exactly what the in-battery
    // q_sql_update does across warmup+timed passes.
    val wh = java.nio.file.Files.createTempDirectory("probeupd").toString
    val path = s"$wh/geo/points"
    time("write")(graft.sources.GeoParquet.write(pts, path, 250.0))
    time("writeManifest")(graft.sources.GeoParquet.writeManifest(spark, path))
    spark.conf.set("spark.sql.catalog.graft_probe",
      classOf[graft.sources.v2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_probe.warehouse", wh)
    (1 to 7).foreach { rep =>
      println(s"--- pass $rep (same layout)")
      time("UPDATE")(spark.sql(
        "UPDATE graft_probe.geo.points SET z = z + 1000000.0 WHERE id % 7 = 0"))
      time("CALL compact")(spark.sql(
        "CALL graft_probe.system.compact('geo.points')").collect())
      time("read")(spark.sql(
        """SELECT id, x, y, z FROM graft_probe.geo.points
          |WHERE x >= -400 AND x < 400 AND y >= -400 AND y < 400
          |ORDER BY id""".stripMargin).collect())
    }
    spark.stop()
  }
}
