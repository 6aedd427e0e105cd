package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-timing probe for the MOR gate SETUP cost (the bench-tail
  * regression hunt, round 17): every q_sql_mor-family query pays a
  * fresh write + writeManifest (+ append) before its first SQL
  * statement.  Times each phase over fresh layouts, warm JVM by pass
  * 2 — exactly the bench's timed-pass shape.
  */
object ProbeMorSetup {
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
      .config("spark.hadoop.fs.iostatistics.thread.level.enabled", "false")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.hadoop.fs.file.impl", "graft.sources.NioLocalFileSystem")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val tasks = new java.util.concurrent.atomic.AtomicInteger(0)
    val trace = sys.env.contains("PROBE_TRACE")
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          if (trace) {
            val site = Option(j.properties)
              .flatMap(p => Option(p.getProperty("callSite.short")))
              .getOrElse("?")
            val ntasks = j.stageInfos.map(_.numTasks).sum
            val names = j.stageInfos.map(s => s"${s.name}[${s.numTasks}]")
              .mkString(" | ")
            println(f"      job ${j.jobId}%3d tasks=$ntasks%4d  $site  $names")
            if (sys.env.contains("PROBE_TRACE_DETAIL"))
              j.stageInfos.foreach { s =>
                val d = s.details.linesIterator
                  .filter(l => l.contains("graft") || l.contains("Geo"))
                  .take(3).mkString(" <- ")
                println(s"            stage ${s.stageId}: $d")
              }
          }
        }
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          tasks.incrementAndGet()
      })
    if (sys.env.contains("PROBE_QE")) {
      spark.listenerManager.register(
        new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              durationNs: Long): Unit = {
            val nodes = qe.executedPlan.collect {
              case n => n.nodeName
            }.groupBy(identity).view.mapValues(_.size)
              .toSeq.sortBy(-_._2).map { case (n, c) => s"$n x$c" }
              .mkString(", ")
            println(f"      QE $funcName ${durationNs / 1e9}%6.2f s  [$nodes]")
          }
          override def onFailure(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              e: Exception): Unit = ()
        })
    }
    def time(tag: String)(f: => Unit): Double = {
      val j0 = jobs.get(); val k0 = tasks.get()
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      // listener is async; give it a beat to drain
      Thread.sleep(200)
      println(f"$tag%-28s $s%8.2f s  jobs=${jobs.get() - j0}%3d tasks=${tasks.get() - k0}%5d")
      s
    }
    val pts = core.Tables.eventsPoints(spark, sf).select("id", "x", "y", "z")
    var cat = 0
    (1 to 4).foreach { pass =>
      println(s"--- pass $pass (fresh layout)")
      val wh = java.nio.file.Files.createTempDirectory("probemor").toString
      val path = s"$wh/geo/points"
      time("write(even)")(graft.sources.GeoParquet.write(
        pts.filter(col("id") % 2 === 0), path, 250.0))
      time("writeManifest")(graft.sources.GeoParquet.writeManifest(spark, path))
      time("append(odd)")(graft.sources.GeoParquet.appendWithManifest(
        pts.filter(col("id") % 2 === 1), path, 250.0))
      cat += 1
      val c = s"probe_mor$cat"
      spark.conf.set(s"spark.sql.catalog.$c",
        classOf[graft.sources.v2.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$c.warehouse", wh)
      time("UPDATE")(spark.sql(
        s"UPDATE $c.geo.points SET z = z + 1000000.0 WHERE id % 7 = 0"))
      time("DELETE")(spark.sql(
        s"DELETE FROM $c.geo.points WHERE id % 11 = 3"))
      var readDf: org.apache.spark.sql.DataFrame = null
      time("read analyze") { readDf = spark.sql(
        s"""SELECT 1 AS era, id, x, y, z FROM $c.geo.points VERSION AS OF 1
           |WHERE x >= -400 AND x < 400 AND y >= -400 AND y < 400
           |UNION ALL
           |SELECT 2 AS era, id, x, y, z FROM $c.geo.points VERSION AS OF 2
           |WHERE x >= -400 AND x < 400 AND y >= -400 AND y < 400
           |UNION ALL
           |SELECT 3 AS era, id, x, y, z FROM $c.geo.points VERSION AS OF 3
           |WHERE x >= -400 AND x < 400 AND y >= -400 AND y < 400
           |ORDER BY era, id""".stripMargin) }
      time("read v1-3")(readDf.write
        .format("noop").mode("overwrite").save())
      if (sys.env.contains("PROBE_PLAN") && pass == 2)
        println(readDf.queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
