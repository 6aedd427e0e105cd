package graft

import org.apache.spark.sql.functions._

import graft.sources.GeoParquet
import graft.sources.v2.GraftSource

/** The SQL-face WRITE path: `df.write.format("graft").mode("append")`
  * and SQL `INSERT INTO` route through the locked commit protocol
  * (appendWithManifest / appendCurve), keep the manifest fresh, and
  * refuse the shapes the face cannot express (overwrite).
  */
class SqlWriteSpec extends SparkSpec {
  import spark.implicits._

  private def pts(from: Int, until: Int, spread: Double = 25.0) =
    (from until until).map { i =>
      (i.toLong, (i % 50) * spread, (i % 37) * spread, i * 1.0)
    }.toDF("id", "x", "y", "z")

  private def binLayout(n: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("sqlw").toString
    GeoParquet.write(pts(0, n), dir, 250.0)
    GeoParquet.writeManifest(spark, dir)
    dir
  }

  test("df.write append to a bin layout lands through the manifest path") {
    val dir = binLayout(1000)
    pts(1000, 1500).write.format("graft").mode("append").save(dir)
    // rows visible through BOTH faces
    val api = GeoParquet.queryBoxViaManifest(spark, dir, (-1e9, 1e9), (-1e9, 1e9))
    assert(api.count() == 1500)
    spark.read.format("graft").load(dir).createOrReplaceTempView("w1")
    assert(spark.sql("SELECT count(*) AS n FROM w1").collect()(0).getLong(0) == 1500)
    // the manifest stayed FRESH — a pruned box read opens a strict
    // subset (the append maintained stats incrementally, no rebuild)
    val boxed = spark.sql("SELECT id FROM w1 WHERE x >= 0 AND x < 300 AND y >= 0 AND y < 300")
    boxed.collect()
    val planned = GraftSource.lastPlannedFiles.get(dir).size
    val total = spark.read.parquet(dir).inputFiles.length
    assert(planned < total, s"append staled the manifest: $planned of $total")
  }

  test("SQL INSERT INTO a layout view appends through the same path") {
    val dir = binLayout(500)
    spark.read.format("graft").load(dir).createOrReplaceTempView("w2")
    spark.sql("INSERT INTO w2 SELECT id + 800000, x + 1.0, y + 1.0, z FROM w2 WHERE id < 10")
    assert(spark.sql("SELECT count(*) AS n FROM w2").collect()(0).getLong(0) == 510)
    assert(spark.sql("SELECT count(*) AS n FROM w2 WHERE id >= 800000")
      .collect()(0).getLong(0) == 10)
  }

  test("append to a curve layout dispatches to appendCurve, reads stay pruned") {
    val dir = java.nio.file.Files.createTempDirectory("sqlwc").toString
    GeoParquet.writeZOrdered(pts(0, 1000), dir, 50.0, 8)
    GeoParquet.writeManifest(spark, dir)
    pts(1000, 1400).write.format("graft").mode("append").save(dir)
    val got = GeoParquet.queryBoxCurve(spark, dir, (-1e6, 1e6), (-1e6, 1e6), 50.0)
    assert(got.count() == 1400)
    // appended rows carry the curve key (internally sorted files)
    assert(spark.read.parquet(dir).columns.contains("zkey"))
  }

  test("overwrite mode refuses (no TRUNCATE capability)") {
    val dir = binLayout(200)
    val e = intercept[Throwable] {
      pts(0, 10).write.format("graft").mode("overwrite").save(dir)
    }
    assert(e.getMessage != null)
  }

  test("a pre-sidecar layout demands an explicit delta option") {
    val dir = binLayout(200)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/_delta"), false)
    val e = intercept[Throwable] {
      pts(200, 210).write.format("graft").mode("append").save(dir)
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else String.valueOf(t.getMessage) +: chain(t.getCause)
    assert(chain(e).exists(_.contains("delta")), chain(e).mkString(" | "))
    // ...and the option unblocks it
    pts(200, 210).write.format("graft").mode("append")
      .option("delta", "250.0").save(dir)
    spark.read.format("graft").load(dir).createOrReplaceTempView("w3")
    assert(spark.sql("SELECT count(*) AS n FROM w3").collect()(0).getLong(0) == 210)
  }

  test("SQL-face writer interleaves with API writers under the commit lock") {
    val dir = binLayout(400)
    GeoParquet.appendWithManifest(pts(400, 600), dir, 250.0)
    pts(600, 800).write.format("graft").mode("append").save(dir)
    GeoParquet.appendWithManifest(pts(800, 900), dir, 250.0)
    pts(900, 1000).write.format("graft").mode("append").save(dir)
    val all = GeoParquet.queryBoxViaManifest(spark, dir, (-1e9, 1e9), (-1e9, 1e9))
    assert(all.count() == 1000)
    assert(all.select("id").distinct().count() == 1000)
  }
}
