package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{GeoOps, H5Ops, Projections}
import graft.sources.{Atl06H5, GeoIndexH5}

/** Archive-scale proof for the `.h5` surface: build an N-granule
  * ATL06 archive, index it positionally (the production two-stage
  * shape: per-(file,beam,bin) offset runs → one reference-layout
  * master index), then answer a FIXED geographic box query through
  * the index with run-sliced decode — at two archive sizes with
  * identical per-granule content.
  *
  * The claim under test (Hdf5.scala:29-33): granules are the
  * embarrassingly-parallel task unit, so generation and indexing cost
  * ~N × per-granule (flat per granule), while an index-pruned box
  * query costs ~matched granules — FLAT in archive size.  Emits one
  * JSON line for BASELINE.md.
  *
  * Run: `sbt -batch "runMain graft.ArchiveScale [nBig] [rowsPerGranule]"`
  */
object ArchiveScale {

  def main(args: Array[String]): Unit = {
    val nBig = if (args.length > 0) args(0).toInt else 600
    val rows = if (args.length > 1) args(1).toInt else 1800
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    runOne(spark, 8, 120) // discarded: JIT/codegen warmup
    val sizes = Seq(nBig / 4, nBig)
    val runs = sizes.map(n => runOne(spark, n, rows))
    val per = runs.map { r =>
      f"""{"n":${r.n},"rows_per_granule":$rows,"t_gen":${r.tGen}%.2f,""" +
        f""""t_index":${r.tIndex}%.2f,"t_query":${r.tQuery}%.2f,""" +
        f""""granules_read":${r.granulesRead},"rows_read":${r.rowsRead},""" +
        f""""rows_expected":${r.rowsExpected}}"""
    }
    val Seq(a, b) = runs
    println(
      f"""{"metric":"archive_scale","sizes":[${per.mkString(",")}],""" +
        f""""gen_per_granule_ratio":${(b.tGen / b.n) / (a.tGen / a.n)}%.2f,""" +
        f""""index_per_granule_ratio":${(b.tIndex / b.n) / (a.tIndex / a.n)}%.2f,""" +
        f""""query_ratio":${b.tQuery / a.tQuery}%.2f}""")
    spark.stop()
  }

  final case class Result(n: Int, tGen: Double, tIndex: Double,
                          tQuery: Double, granulesRead: Int,
                          rowsRead: Long, rowsExpected: Long)

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** Granule g sits on a 25-wide patch grid: lat row = g%25, lon
    * col = g/25 — spaced well beyond the ±1-bin
    * dilation at δ=10 km so patches never share bins.  The box below
    * covers lat row 0 (0.5° steps) × lon cols {0,1,2} (2° steps) —
    * granules {0,25,50}
    * at EVERY archive size, so t_query measures the pruned path's
    * flatness.
    */
  private def runOne(spark: SparkSession, n: Int, rows: Int): Result = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(s"archive_$n").toString
    val delta = 10000.0
    val pts = spark.range(n.toLong * rows).select(
        (col("id") / rows).cast("long").as("gran"),
        (col("id") % rows).cast("long").as("rid"))
      .select(col("gran"), col("rid").as("id"),
        (lit(-70.0) - (col("gran") % 25) * 0.5 - (col("rid") % 600) * 1e-4)
          .as("latitude"),
        (lit(45.0) + (col("gran") / 25).cast("double") * 2.0 +
          (col("rid") / 600).cast("double") * 1e-4).as("longitude"),
        (col("rid") * 0.5).as("h_li"),
        (col("rid") * 0.1).as("delta_time"))
    val (_, tGen) = timed(Atl06H5.writeGranules(pts, dir))

    // positional master index: runs of element positions per
    // (file:beam, bin) — one distributed pass over the point table,
    // one driver-side index-sized write (the reference's model)
    val (px, py) = Projections.forward(col("latitude"), col("longitude"), 3031)
    val positioned = pts.select(col("gran"), (col("id") % 6).as("beam6"),
        (col("id") / 6).cast("long").as("pos"), px.as("x"), py.as("y"))
      .select(col("gran"), col("beam6"), col("pos"),
        GeoOps.binOf(col("x"), delta).as("bin_x"),
        GeoOps.binOf(col("y"), delta).as("bin_y"))
      .withColumn("file_num", col("gran") * 6 + col("beam6"))
    val idxPath = s"$dir/master_index.h5"
    val fileEntries = (0 until n).flatMap(g =>
      H5Ops.beams.map(b => (s"${H5Ops.granFile(g)}:$b", "ATL06")))
    val (_, tIndex) = timed {
      GeoIndexH5.write(H5Ops.islandRuns(positioned), delta,
        "+proj=stere +lat_0=-90 +lat_ts=-71 +datum=WGS84", "/data",
        fileEntries, idxPath)
    }

    // the fixed box, as bins: sample a lat/lon grid over it through
    // the SAME projection+binning the index used, ±1-bin dilated
    val (boxLat, boxLon) = ((-70.1, -69.9), (44.9, 49.1))
    val samples = spark.range(101 * 101).select(
      (lit(boxLat._1) + (col("id") % 101) * ((boxLat._2 - boxLat._1) / 100.0))
        .as("latitude"),
      (lit(boxLon._1) + (col("id") / 101) * ((boxLon._2 - boxLon._1) / 100.0))
        .as("longitude"))
    val d = delta.toLong
    val boxBins = samples.select(
        GeoOps.binOf(px, delta).as("bx"), GeoOps.binOf(py, delta).as("by"))
      .distinct().as[(Long, Long)].collect()
      .flatMap { case (bx, by) =>
        for (ox <- -1 to 1; oy <- -1 to 1) yield (bx + ox * d, by + oy * d)
      }.toSet

    val (got, tQuery) = timed {
      val matched = GeoIndexH5.readRuns(spark, idxPath)
        .select("bin_x", "bin_y", "file_num", "offset_start", "offset_end")
        .collect()
        .filter(r => boxBins((r.getLong(0), r.getLong(1))))
        .map(r => org.apache.spark.sql.Row(r.getLong(2), r.getLong(3), r.getLong(4)))
      val runsMap = H5Ops.assembleRuns(matched)
      System.err.println(s"[archive n=$n] matched files: " +
        runsMap.map { case (f, bs) => s"$f(${bs.values.map(_.size).sum} runs)" }
          .toSeq.sorted.mkString(", "))
      val segs = Atl06H5.readRuns(spark, dir, runsMap)
      (runsMap.size, segs.count())
    }
    Result(n, tGen, tIndex, tQuery, got._1, got._2, 3L * rows)
  }
}
