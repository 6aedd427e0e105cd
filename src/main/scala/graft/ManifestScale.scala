package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.GeoParquet

/** Planning-cost proof for [[GeoParquet.compactManifest]]: a
  * long-lived CDC layout accumulates ONE manifest part per commit
  * (commitStaged appends `coalesce(1)`), so every planner touch —
  * incremental append, SQL-face file pruning, streaming micro-batch
  * planning — reads one parquet footer per commit.  The metadata
  * coalesce rewrites the sidecar as a single part with identical
  * rows; this main measures the planner-touch latency before and
  * after, at a commit count where the O(commits) tax is visible.
  *
  * Emits one JSON line for BASELINE.md.
  *
  * Run: `sbt -batch "runMain graft.ManifestScale [nCommits]"`
  */
object ManifestScale {

  private def timeMs(body: => Unit): Double = {
    val t0 = System.nanoTime()
    body
    (System.nanoTime() - t0) / 1e6
  }

  private def medianOf(n: Int)(body: => Unit): Double = {
    val ts = (0 until n).map(_ => timeMs(body)).sorted
    ts(n / 2)
  }

  def main(args: Array[String]): Unit = {
    val nCommits = if (args.length > 0) args(0).toInt else 240
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("mscale").toString + "/lay"
    def batch(from: Int, n: Int) = (from until from + n).map { i =>
      (i.toLong, (i % 50) * 25.0, (i % 37) * 25.0, i * 1.0)
    }.toDF("id", "x", "y", "z")
    GeoParquet.write(batch(0, 500), dir, 250.0)
    GeoParquet.writeManifest(spark, dir)
    // the CDC shape: many tiny commits (each lands one manifest part)
    (1 to nCommits).foreach { i =>
      GeoParquet.appendWithManifest(batch(1000 + i * 10, 8), dir, 250.0)
    }
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def parts() = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$dir/_manifest"))
      .count(_.getPath.getName.endsWith(".parquet"))

    // the planner touch: manifest rows → pruned file list (exactly
    // what the SQL face, queryBoxViaManifest, and the stream planner
    // pay per plan/micro-batch)
    def planTouch(): Unit = {
      spark.read.parquet(s"$dir/_manifest")
        .filter(col("x1") >= 0 && col("x0") < 400 &&
          col("y1") >= 0 && col("y0") < 400)
        .select("file").collect()
      ()
    }
    // and a full pruned read through the SQL face
    def facedRead(): Unit = {
      spark.read.format("graft").load(dir)
        .where("x >= 0 AND x < 400 AND y >= 0 AND y < 400").count()
      ()
    }
    planTouch(); facedRead() // warm codegen/FS caches once
    // the append loop above ran under the AUTO-GATE
    // (coalesceManifestIfNeeded fires from inside appendWithManifest
    // once the sidecar exceeds 32 parts), so partsBefore is already
    // BOUNDED regardless of nCommits — that bound, and the resulting
    // flat planner touch, is the linear-scale claim this main pins
    val partsBefore = parts()
    require(partsBefore <= 33,
      s"auto-gate failed: $partsBefore manifest parts after $nCommits " +
        "commits (bound is maxParts=32 + the in-flight commit)")
    val planBefore = medianOf(7)(planTouch())
    val readBefore = medianOf(5)(facedRead())
    val rowsBefore = spark.read.parquet(s"$dir/_manifest").count()

    GeoParquet.compactManifest(spark, dir) // manual floor: one part

    val partsAfter = parts()
    val planAfter = medianOf(7)(planTouch())
    val readAfter = medianOf(5)(facedRead())
    val rowsAfter = spark.read.parquet(s"$dir/_manifest").count()
    require(rowsBefore == rowsAfter, "coalesce changed manifest rows")

    println(
      s"""{"metric":"manifest_coalesce","commits":$nCommits,""" +
        s""""parts_before":$partsBefore,"parts_after":$partsAfter,""" +
        s""""plan_ms_before":$planBefore,"plan_ms_after":$planAfter,""" +
        s""""read_ms_before":$readBefore,"read_ms_after":$readAfter,""" +
        s""""manifest_rows":$rowsAfter}""")
    spark.stop()
  }
}
