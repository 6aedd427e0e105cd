package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.Tables
import graft.operators.{Crossovers, GeoOps}
import graft.sources.{Atl06H5, GeoIndexH5}

/** Diagnostic main splitting `q_h5_pipeline`'s cost into phases:
  * granule encode, positional-run computation, index-file write,
  * index read + run assembly, sliced granule decode, crossover
  * search, and the xover tile sink cycle.  The granule/index writes
  * are test scaffolding a real deployment pays once at ingest; the
  * read+crossover side is the per-query cost.
  *
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.PipeSplit
  */
object PipeSplit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[pipesplit] $tag%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      a
    }
    val out = java.nio.file.Files.createTempDirectory("pipesplit").toString
    val tr = Tables.eventsTracks(spark, sfDir)
    val enc = tr.select(
      (col("track") / 6).cast("long").as("gran"),
      (col("seq") * 6 + col("track") % 6).as("id"),
      col("y").as("latitude"), col("x").as("longitude"),
      col("z").as("h_li"), col("t").cast("double").as("delta_time"))
    timed("granule encode")(Atl06H5.writeGranules(enc, out))
    val positioned = tr.select(
      (col("track") / 6).cast("long").as("gran"),
      (col("track") % 6).as("beam6"),
      (col("seq") - 1).as("pos"),
      GeoOps.binOf(col("x"), 400.0).as("bin_x"),
      GeoOps.binOf(col("y"), 400.0).as("bin_y"))
      .withColumn("file_num", col("gran") * 6 + col("beam6"))
    val runs = graft.operators.H5Ops.islandRuns(positioned)
    val nRuns = timed("run computation")(runs.count())
    println(s"[pipesplit] runs=$nRuns")
    val fileEntries =
      for (g <- 0 to 1; b <- graft.operators.H5Ops.beams)
        yield (s"${graft.operators.H5Ops.granFile(g)}:$b", "ATL06")
    val idxPath = s"$out/index.h5"
    timed("index-file write")(GeoIndexH5.write(
      runs, 400.0, "+proj=stere +lat_0=-90", "/data", fileEntries, idxPath))
    val matched = timed("index read+collect")(GeoIndexH5.readRuns(spark, idxPath)
      .select("file_num", "offset_start", "offset_end").collect())
    val segs = Atl06H5.readRuns(spark, out,
      graft.operators.H5Ops.assembleRuns(matched))
    val tracks = segs.select(
      (regexp_extract(col("file"), "ATL06_gran(\\d+)", 1).cast("long") * 6 +
        col("segment_id") % 6).as("track"),
      (col("segment_id") / 6).cast("long").as("seq"),
      col("longitude").as("x"), col("latitude").as("y"),
      col("h_li").as("z"), col("delta_time").as("t"))
    timed("sliced decode")(tracks.write.format("noop").mode("overwrite").save())
    val xo = Crossovers.crossoversOf(tracks)
    timed("decode+crossovers")(xo.write.format("noop").mode("overwrite").save())
    val sink = s"$out/xovers"
    timed("xover sink write")(Crossovers.writeXovers(xo, sink))
    timed("xover read-back")(Crossovers.readXovers(spark, sink)
      .filter(col("tile_e").between(0L, 100000L) &&
        col("tile_n").between(-100000L, 100000L))
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
