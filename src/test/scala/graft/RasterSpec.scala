package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.RasterOps
import graft.sources.{PointSources, RasterSink}

/** Raster product pipeline: normalize/toRGB semantics and the
  * to_geotif-analog tile sink.
  */
class RasterSpec extends SparkSpec {
  import spark.implicits._

  test("normalize + gray quantization stay in range and preserve order") {
    val r = RasterOps.rasterRgb(spark, sf)
    assert(r.filter($"norm" < 0.0 || $"norm" > 1.0).count() == 0)
    assert(r.filter($"gray" < 0L || $"gray" > 255L).count() == 0)
    // min and max cells hit the ends of the scale
    assert(r.filter($"norm" === 0.0).count() >= 1)
    assert(r.filter($"gray" === 255L).count() >= 1)
    // monotone: higher gz never gets a lower gray
    val viol = r.as("a").join(r.as("b"), $"a.gz" > $"b.gz" && $"a.gray" < $"b.gray")
    assert(viol.count() == 0)
  }

  test("RasterSink round-trips tiles with CRS metadata and prunes reads") {
    val dir = Files.createTempDirectory("raster").toString
    val grid = PointSources
      .rasterize(graft.core.Tables.eventsPoints(spark, sf), 100.0)
      .select($"gx", $"gy", $"gz")
    val meta = RasterSink.RasterMeta(epsg = 3031, delta = 100.0, tileSize = 500.0)
    RasterSink.write(grid, dir, meta)
    assert(RasterSink.readMeta(dir) == meta)
    val back = RasterSink.read(spark, dir)
    assert(back.count() == grid.count())
    // tile read is partition-pruned at planning time
    val one = RasterSink.readTile(spark, dir, 0L, 0L)
    val explained = one.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pf = explained.linesIterator.find(_.contains("PartitionFilters")).get
    assert(pf.contains("tile_e") && pf.contains("tile_n"))
    assert(one.count() ==
      grid.filter($"gx" >= 0 && $"gx" < 500 && $"gy" >= 0 && $"gy" < 500).count())
  }
}
