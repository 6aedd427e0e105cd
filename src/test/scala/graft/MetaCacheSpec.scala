package graft

import org.apache.spark.sql.functions._

import graft.sources.GeoParquet

/** The driver-side sidecar cache (GeoParquet.metaParquet) and the
  * packed-scan partitions (GraftScan.packPartitions): planning reads
  * of `_manifest`/tombstone sidecars must stop costing a distributed
  * job each, and a many-small-file layout must stop costing one task
  * per file — without changing a single row either way.
  */
class MetaCacheSpec extends SparkSpec {
  import spark.implicits._

  private def pts(from: Int, until: Int) =
    (from until until).map { i =>
      (i.toLong, (i % 50) * 25.0, (i % 37) * 25.0, i * 1.0)
    }.toDF("id", "x", "y", "z")

  private def layout(n: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("metac").toString
    GeoParquet.write(pts(0, n), dir, 250.0)
    GeoParquet.writeManifest(spark, dir)
    dir
  }

  private def countJobs(f: => Unit): Int = {
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try { f; Thread.sleep(500) } // listener bus is async
    finally spark.sparkContext.removeSparkListener(l)
    jobs.get()
  }

  test("repeat manifest reads are cache hits that fold to LocalRelation") {
    val dir = layout(2000)
    val m0 = GeoParquet.metaMisses.get()
    val rows = GeoParquet.manifestDf(spark, dir).collect().length
    assert(rows > 0)
    assert(GeoParquet.metaMisses.get() == m0 + 1)
    val h0 = GeoParquet.metaHits.get()
    // second read: a hit, a LocalRelation, and ZERO jobs for the
    // filter+select+collect planners do on every statement
    val df = GeoParquet.manifestDf(spark, dir)
    assert(GeoParquet.metaHits.get() == h0 + 1)
    assert(df.queryExecution.optimizedPlan.isInstanceOf[
      org.apache.spark.sql.catalyst.plans.logical.LocalRelation])
    val jobs = countJobs {
      val got = df.filter(col("n_rows") > 0).select("file").collect()
      assert(got.length == rows)
    }
    assert(jobs == 0, s"cached manifest read still launched $jobs jobs")
    assert(GeoParquet.metaMisses.get() == m0 + 1) // still the one miss
  }

  test("any writer invalidates by listing signature") {
    val dir = layout(1000)
    val before = GeoParquet.manifestDf(spark, dir).collect().length
    // an append adds manifest part rows through the commit path
    GeoParquet.appendWithManifest(pts(1000, 1500), dir, 250.0)
    val after = GeoParquet.manifestDf(spark, dir).collect().length
    assert(after > before,
      s"append invisible through the cache: $before -> $after")
    // a REBUILD overwrites the manifest wholesale (new part names) —
    // the cache must re-read, not serve the retired listing
    GeoParquet.writeManifest(spark, dir)
    val rebuilt = GeoParquet.manifestDf(spark, dir)
    assert(rebuilt.collect().length == after)
    assert(rebuilt.agg(min("epoch")).head().getLong(0) ==
      rebuilt.agg(max("epoch")).head().getLong(0)) // re-stamped flat
  }

  test("scans pack small files instead of one task per file") {
    val dir = layout(4000)
    val files = spark.read.parquet(dir).inputFiles.length
    assert(files > 8, s"layout too coarse to exercise packing: $files")
    val df = spark.read.format("graft").load(dir)
      .filter(col("x") >= 0 && col("y") >= 0)
    val parts = df.rdd.getNumPartitions
    assert(parts < files,
      s"no packing: $parts partitions for $files files")
    // same rows as the raw parquet read, in any order
    val want = spark.read.parquet(dir)
      .filter(col("x") >= 0 && col("y") >= 0)
      .select("id").as[Long].collect().sorted.toSeq
    val got = df.select("id").as[Long].collect().sorted.toSeq
    assert(got == want)
  }

  test("packed partitions preserve merge-on-read delete subtraction") {
    val dir = layout(3000)
    // positional deletes via the API path, then a packed scan must
    // subtract them exactly
    GeoParquet.deleteWhere(spark, dir, col("id") % 10 === 3)
    val got = spark.read.format("graft").load(dir)
      .select("id").as[Long].collect().sorted.toSeq
    val want = (0L until 3000L).filterNot(_ % 10 == 3)
    assert(got == want)
  }
}
