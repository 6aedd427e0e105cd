package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.GeoOps

class GeoOpsSpec extends SparkSpec {
  import spark.implicits._

  test("geoindex build covers every point exactly once") {
    val idx = GeoOps.geoindexBuild(spark, sf)
    val total = idx.agg(sum("n_points")).as[Long].head()
    val pts = graft.core.Tables.eventsPoints(spark, sf).count()
    assert(total == pts)
    assert(idx.filter($"id_min" > $"id_max").count() == 0)
  }

  test("box query returns only points whose bin is inside the box") {
    val d = GeoOps.geoQueryBox(spark, sf)
    val bad = d
      .withColumn("bx", GeoOps.binOf(col("x"), 100))
      .withColumn("by", GeoOps.binOf(col("y"), 100))
      .filter(!($"bx".between(-200, 400) && $"by".between(-300, 300)))
    assert(bad.count() == 0)
    assert(d.count() > 0)
  }

  test("padded bin query is a superset of the unpadded one") {
    val padded = GeoOps.geoQueryPad(spark, sf).count()
    assert(padded > 0)
  }

  test("index intersect only returns bins present on both sides") {
    val p = graft.core.Tables.eventsPoints(spark, sf)
      .withColumn("bin_x", GeoOps.binOf(col("x"), 100))
      .withColumn("bin_y", GeoOps.binOf(col("y"), 100))
    val even = p.filter($"user_id" % 2 === 0).select("bin_x", "bin_y").distinct().count()
    val inter = GeoOps.geoIntersect(spark, sf).count()
    assert(inter > 0 && inter <= even)
  }

  test("blockmedian: exact selection semantics on a hand-built cell") {
    // one cell, five points sorted by z → the reference picks the
    // point with 0-based index int(5/2-1)=1 (pt_blockmedian.py:39-57)
    val df = Seq(
      (1L, 1.0, 1.0, 10.0), (2L, 2.0, 2.0, 20.0), (3L, 3.0, 3.0, 30.0),
      (4L, 4.0, 4.0, 40.0), (5L, 5.0, 5.0, 50.0)
    ).toDF("id", "x", "y", "z")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("cx", "cy")
    val r = df
      .withColumn("cx", GeoOps.cellOf(col("x"), 50))
      .withColumn("cy", GeoOps.cellOf(col("y"), 50))
      .withColumn("rnk", row_number().over(w.orderBy("z", "x", "y", "id")))
      .withColumn("n", count("*").over(w))
      .filter(
        ($"n" % 2 === 0 && ($"rnk" === $"n" / 2 || $"rnk" === $"n" / 2 + 1)) ||
        ($"n" % 2 === 1 && $"rnk" === greatest(($"n" - 1) / 2, lit(1.0))))
    val sel = r.select("z").as[Double].collect()
    assert(sel.toSeq == Seq(20.0)) // rank 2 of 5, NOT the true median 30
  }

  test("blockmedian of an even cell averages the two middle points") {
    val df = Seq(
      (1L, 1.0, 1.0, 10.0), (2L, 2.0, 2.0, 20.0),
      (3L, 3.0, 3.0, 30.0), (4L, 4.0, 4.0, 40.0)
    ).toDF("id", "x", "y", "z")
    df.createOrReplaceTempView("even_cell")
    // ranks 2 and 3 of 4 → z = 25
    val got = spark.sql(
      """SELECT avg(z) FROM (
        |  SELECT z, row_number() OVER (ORDER BY z) rnk, count(*) OVER () n
        |  FROM even_cell)
        |WHERE rnk IN (n/2, n/2+1)""".stripMargin).as[Double].head()
    assert(got == 25.0)
  }

  test("blockmax picks the actual max-z point of each cell") {
    val bm = GeoOps.blockmax(spark, sf)
    val chk = graft.core.Tables.eventsPoints(spark, sf)
      .withColumn("cx", GeoOps.cellOf(col("x"), 50))
      .withColumn("cy", GeoOps.cellOf(col("y"), 50))
      .groupBy("cx", "cy").agg(max("z").as("zmax"))
    val joined = bm.join(chk, Seq("cx", "cy"))
    assert(joined.filter($"z" =!= $"zmax").count() == 0)
    assert(bm.count() == chk.count())
  }

  test("offset coalescing merges adjacent ids into single runs") {
    val runs = GeoOps.offsetCoalesce(spark, sf)
    assert(runs.filter($"run_end" - $"run_start" + 1 < $"run_len").count() == 0)
  }

  test("tile index row count equals distinct tiles") {
    val ti = GeoOps.tileIndex(spark, sf)
    assert(ti.count() > 0)
    assert(ti.select("tile_e", "tile_n").distinct().count() == ti.count())
  }

  test("indexMerge: merging partial indexes equals indexing the union") {
    val merged = GeoOps.indexMerge(spark, sf)
    val direct = graft.core.Tables.eventsPoints(spark, sf)
      .select(GeoOps.binOf(col("x"), 200).as("bin_x"),
        GeoOps.binOf(col("y"), 200).as("bin_y"), col("id"))
      .groupBy("bin_x", "bin_y")
      .agg(count("*").as("n_points"), min("id").as("id_min"), max("id").as("id_max"))
    val j = merged.join(direct.withColumnRenamed("n_points", "n_d")
        .withColumnRenamed("id_min", "min_d").withColumnRenamed("id_max", "max_d"),
      Seq("bin_x", "bin_y"))
    assert(merged.count() == direct.count())
    assert(j.filter($"n_points" =!= $"n_d" || $"id_min" =!= $"min_d" ||
      $"id_max" =!= $"max_d").count() == 0)
    // a bin's source multiplicity never exceeds the partial count
    assert(merged.filter($"n_sources" < 1 || $"n_sources" > 3).count() == 0)
  }

  test("HLL sketch rollup stays within its error bound of exact counts") {
    val r = GeoOps.binApproxUsers(spark, sf, rsd = 0.02)
      .withColumn("rel_err",
        abs($"approx_users" - $"exact_users") / $"exact_users".cast("double"))
    assert(r.count() > 0)
    // 2% rsd ⇒ essentially exact at these cardinalities; allow headroom
    val worst = r.agg(max("rel_err")).head().getDouble(0)
    assert(worst <= 0.10, s"worst HLL relative error $worst")
  }
}
