package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.PointSources

class ApiSpec extends SparkSpec {
  import spark.implicits._

  test("PointFrame mirrors the reference point_data/geo_index call surface") {
    val pf = PointFrame(graft.core.Tables.eventsPoints(spark, sf))
    assert(pf.queryBox((-200L, 400L), (-300L, 300L)).size > 0)
    assert(pf.geoIndex(100.0).df.columns.toSet == Set("bin_x", "bin_y", "n_points"))
    val bm = pf.blockmedian(50.0)
    assert(bm.columns.toSet == Set("cx", "cy", "x", "y", "z"))
    assert(pf.blockmax(50.0).count() == bm.count())
    val even = pf.where($"user_id" % 2 === 0)
    val odd  = pf.where($"user_id" % 2 === 1)
    val inter = even.intersectBins(odd)
    assert(inter.count() > 0)
    // padded intersect is a superset of the exact one (geo_index.py pad arg)
    assert(even.intersectBins(odd, pad = 1).count() >= inter.count())
    assert(pf.queryBins(Seq((0L, 0L)), pad = 1).size >= pf.queryBins(Seq((0L, 0L))).size)
    // return_index blockmedian joins back to full-width rows: every
    // selected id exists, and odd cells have id_lo == id_hi
    val bmi = pf.blockmedianIdx(50.0)
    val ids = graft.core.Tables.eventsPoints(spark, sf).select($"id".as("id_lo"))
    assert(bmi.join(ids, "id_lo", "left_anti").count() == 0)
    assert(bmi.count() == pf.blockmedian(50.0).count())
    // keys_from_xy (geo_index.py:489-492): probes snap to the lattice
    // and only POPULATED bins return keys
    val popBins = pf.geoIndex(100.0).df
      .select("bin_x", "bin_y").as[(Long, Long)].collect().toSet
    val (px, py) = (popBins.head, (1e7, 1e7)) // one populated, one not
    val keys = pf.keysFromXY(
      Seq(px._1.toDouble + 3.0, py._1), Seq(px._2.toDouble - 3.0, py._2))
    assert(keys == Seq(s"${px._1}_${px._2}"),
      s"keys_from_xy diverged: $keys (wanted the populated bin only)")
  }

  test("PointFrame round-trips through the geo-parquet layout") {
    val dir = Files.createTempDirectory("pframe").toString
    val pf = PointFrame(graft.core.Tables.eventsPoints(spark, sf))
    pf.toGeoParquet(dir)
    val back = PointFrame.fromGeoParquet(spark, dir)
    assert(back.size == pf.size)
    assert(back.queryBox((0L, 200L), (0L, 200L)).size ==
           pf.queryBox((0L, 200L), (0L, 200L)).size)
  }

  test("withXY projects lat/lon like the projection query") {
    val d = graft.core.Tables.eventsPoints(spark, sf)
      .select($"id", (lit(-70.0)).as("latitude"), (($"id" % 360) - 180.0).as("longitude"))
    val p = PointFrame(d).withXY()
    assert(p.df.filter($"x".isNull || $"y".isNull).count() == 0)
    // queryLatLon subsets by the lat/lon window after projection
    val sub = PointFrame(d.withColumn("latitude", lit(-70.0) - ($"id" % 10)))
      .queryLatLon((-75.0, -70.0), (-90.0, 90.0))
    assert(sub.size > 0 && sub.size < d.count())
  }

  test("queryLatLon(epsg): probe points return exactly their bins' points") {
    val pf = PointFrame(graft.core.Tables.eventsPoints(spark, sf), 250.0)
    // (-89.994, 30°) projects to EPSG:3031 (325.96, 564.58) → bin (250, 500)
    val got = pf.queryLatLon(3031, Seq((-89.994, 30.0))).df
    val expect = pf.df.filter(
      graft.operators.GeoOps.binOf($"x", 250.0) === 250L &&
      graft.operators.GeoOps.binOf($"y", 250.0) === 500L)
    assert(got.count() == expect.count() && got.count() > 0)
    assert(got.select("id").exceptAll(expect.select("id")).count() == 0)
    // round-trip consistency: inverse-projecting the matched points
    // keeps them in the probe's polar neighborhood
    val back = PointFrame(got, 250.0).withLatLon(3031).df
    assert(back.filter($"latitude" > -89.9 || $"latitude" < -90.0).count() == 0)
  }

  test("union concatenates point frames (point_data.from_list)") {
    val pf = PointFrame(graft.core.Tables.eventsPoints(spark, sf))
    val a = pf.where($"user_id" % 2 === 0)
    val b = pf.where($"user_id" % 2 === 1)
    assert(a.union(b).size == pf.size)
  }

  test("point sources: csv and json land in the canonical schema") {
    val dir = Files.createTempDirectory("psrc").toString
    val pts = graft.core.Tables.eventsPoints(spark, sf).select("id", "x", "y", "z", "t")
    pts.write.option("header", "true").mode("overwrite").csv(s"$dir/csv")
    pts.write.mode("overwrite").json(s"$dir/json")
    val fromCsv = PointSources.readCsv(spark, s"$dir/csv")
    val fromJson = PointSources.readJson(spark, s"$dir/json")
    assert(fromCsv.count() == pts.count() && fromJson.count() == pts.count())
    assert(fromCsv.schema == PointSources.pointSchema)
    // orc round-trips the canonical schema with pushdown-capable stats
    pts.write.orc(s"$dir/orc")
    val fromOrc = PointSources.readOrc(spark, s"$dir/orc")
    assert(fromOrc.count() == pts.count())
    val pushed = fromOrc.filter($"x" >= 0 && $"x" < 100)
      .queryExecution.executedPlan.toString
    assert(pushed.contains("PushedFilters") && pushed.contains("GreaterThanOrEqual(x"))
    // rasterize produces a grid with full coverage accounting
    val grid = PointSources.rasterize(fromJson, 100.0)
    assert(grid.agg(sum("n")).as[Long].head() == pts.count())
  }

  test("fromSource opens any registry kind as a PointFrame (incl. .h5 granules)") {
    val dir = java.nio.file.Files.createTempDirectory("pf_src").toString
    val recs = (0 until 48).map { i =>
      (i.toLong, -70.0 - i * 1e-4, 45.0 + i * 1e-4, 100.0 + i, i * 0.1)
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/ATL06_g0.h5"),
      graft.sources.Atl06H5.granuleBytes(recs, rgt = 1))
    val pf = PointFrame.fromSource(spark, "atl06_h5", dir, delta = 400.0)
    assert(pf.df.columns.toSeq == Seq("id", "x", "y", "z", "t"))
    assert(pf.size == 48)
    // same rows as the registry read the queries build on
    val direct = graft.sources.SourceRegistry.readAs(spark, "atl06_h5", dir)
    assert(pf.df.exceptAll(direct).count() == 0)
    // a projected frame composes with the query surface immediately:
    // the index rollup accounts for every point
    assert(pf.geoIndex().df.agg(org.apache.spark.sql.functions.sum("n_points"))
      .head.getLong(0) == 48)
  }

  test("the advertised registry surface matches what readAs dispatches") {
    import graft.sources.SourceRegistry
    // pointKinds ⊂ kinds, and every non-point kind raises the scoped
    // index/adoption error (not a misleading 'unregistered')
    assert(SourceRegistry.pointKinds.toSet.subsetOf(SourceRegistry.kinds.toSet))
    val indexKinds = SourceRegistry.kinds.toSet -- SourceRegistry.pointKinds.toSet
    assert(indexKinds ==
      Set("geoindex", "indexed_h5", "indexed_h5_from_matlab"))
    indexKinds.foreach { k =>
      val e = intercept[IllegalArgumentException] {
        PointFrame.fromSource(spark, k, "/nonexistent")
      }
      assert(e.getMessage.contains("index/adoption kind"), s"kind $k: ${e.getMessage}")
      assert(e.getMessage.contains("forFile"), s"kind $k lacks the redirect hint")
    }
    // a genuinely unknown kind names itself and the known list
    val unknown = intercept[IllegalArgumentException] {
      PointFrame.fromSource(spark, "netcdf", "/nonexistent")
    }
    assert(unknown.getMessage.contains("netcdf") &&
      unknown.getMessage.contains("atl06_h5"))
  }

  test("PointFrame mutation surface: deleteWhere, upsertInto, merged/asOf opens") {
    val dir = java.nio.file.Files.createTempDirectory("pfmut").toString
    val pts = graft.core.Tables.eventsPoints(spark, sf).select("id", "x", "y", "z")
    PointFrame(pts).toGeoParquet(dir, 250.0)
    graft.sources.GeoParquet.writeManifest(spark, dir)
    // MERGE by key through the facade
    PointFrame.upsertInto(
      pts.filter($"id" % 10 === 0).withColumn("z", $"z" + 100.0), dir, "id", 250.0)
    // DELETE WHERE through the facade
    PointFrame.deleteWhere(spark, dir, col("id") % 10 === 1)
    val merged = PointFrame.fromGeoParquetMerged(spark, dir).df
    assert(merged.filter($"id" % 10 === 1).count() == 0)
    assert(merged.count() == pts.filter($"id" % 10 =!= 1).count())
    assert(merged.filter($"id" % 10 === 0 && $"z" < 100.0).count() ==
      pts.filter($"id" % 10 === 0 && $"z" + 100.0 < 100.0).count())
    // snapshot opens COMPOSE with the pending merge-on-read deletes
    // (tombstone parts carry their commit epoch): AS OF 0 — before
    // both mutations — serves the untouched original corpus, and
    // AS OF the current epoch agrees with the merged present
    val asOf0 = PointFrame.fromGeoParquetAsOf(spark, dir, 0L).df
      .select("id", "x", "y", "z")
    assert(asOf0.exceptAll(pts).count() == 0 &&
      pts.exceptAll(asOf0).count() == 0,
      "AS OF 0 under pending deletes is not the pre-mutation corpus")
    val now = graft.sources.GeoParquet.readEpoch(spark, dir)
    val asOfNow = PointFrame.fromGeoParquetAsOf(spark, dir, now).df
      .select("id", "x", "y", "z")
    assert(asOfNow.exceptAll(merged.select("id", "x", "y", "z")).count() == 0 &&
      merged.select("id", "x", "y", "z").exceptAll(asOfNow).count() == 0,
      "AS OF the current epoch disagrees with the merged read")
  }

  test("native expressions are callable from SQL after extension registration") {
    GraftExtensions.register(spark)
    val r = spark.sql("SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .as[Double].head()
    assert(r == 11.0)
    assert(spark.sql("SELECT hamming(7L, 1L) AS h").as[Long].head() == 2L)
    // 'ababa' → grams aba, bab, aba → top (aba, 2)
    val t = spark.sql("SELECT top_trigram('ababa').g AS g, top_trigram('ababa').n AS n")
      .as[(String, Long)].head()
    assert(t == ("aba", 2L))
    // wrong arity is an analysis error, not a runtime crash
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT dot_product(array(1.0d))").collect()
    }
  }
}
