package graft

import org.apache.spark.sql.functions._
import graft.operators.Projections

/** Ellipsoidal polar stereographic (EPSG:3031/3413) — forward/inverse
  * consistency and agreement between the libm Column API and the
  * polynomial oracle form.
  */
class ProjectionSpec extends SparkSpec {
  import spark.implicits._

  private def southGrid = spark.range(1, 400)
    .select($"id",
      (lit(-60.0) - ($"id" % 300) / 10.0).as("latitude"),
      (($"id" % 3600) / 10.0 - 180.0).as("longitude"))

  private def northGrid = spark.range(1, 400)
    .select($"id",
      (lit(60.0) + ($"id" % 300) / 10.0).as("latitude"),
      (($"id" % 3600) / 10.0 - 180.0).as("longitude"))

  test("EPSG:3031 forward/inverse round-trip") {
    val p = PointFrame(southGrid).withXY(3031)
      .withLatLon(3031).df
      .withColumn("dlat", abs($"latitude" - (lit(-60.0) - ($"id" % 300) / 10.0)))
      .withColumn("dlon", abs($"longitude" - (($"id" % 3600) / 10.0 - 180.0)))
    val (ml, mo) = p.agg(max("dlat"), max("dlon")).as[(Double, Double)].head()
    assert(ml < 1e-9, s"lat round-trip error $ml")
    assert(mo < 1e-9, s"lon round-trip error $mo")
  }

  test("EPSG:3413 forward/inverse round-trip") {
    val p = PointFrame(northGrid).withXY(3413).withLatLon(3413).df
      .withColumn("dlat", abs($"latitude" - (lit(60.0) + ($"id" % 300) / 10.0)))
      .withColumn("dlon", abs($"longitude" - (($"id" % 3600) / 10.0 - 180.0)))
    val (ml, mo) = p.agg(max("dlat"), max("dlon")).as[(Double, Double)].head()
    assert(ml < 1e-9, s"lat round-trip error $ml")
    assert(mo < 1e-9, s"lon round-trip error $mo")
  }

  test("scale is true at the standard parallel (ρ = a·m_F at φ_F)") {
    val p = PointFrame(Seq((-71.0, 0.0)).toDF("latitude", "longitude"))
      .withXY(3031).df.select("x", "y").head()
    // at (φF, λ0): easting 0, northing = a·m_F (t/t_F = 1)
    val phiF = math.toRadians(-71.0)
    val sF = math.sin(phiF)
    val aMf = Projections.A *
      (math.cos(phiF) / math.sqrt(1.0 - Projections.E2 * sF * sF))
    assert(math.abs(p.getDouble(0)) < 1e-6)
    assert(math.abs(p.getDouble(1) - aMf) < 1e-4,
      s"northing at standard parallel: ${p.getDouble(1)} vs $aMf")
  }

  test("PolyTrig polynomials track libm within 1e-10 on their domains") {
    import graft.functions.PolyTrig._
    val xs = spark.range(-3141, 3142)
      .select(($"id" / 1000.0).as("x"))
      .withColumn("x2", $"x" * $"x")
    val err = xs.select(
        max(abs(sinC($"x", $"x2") - sin($"x"))).as("es"),
        max(abs(cosC($"x2") - cos($"x"))).as("ec"))
      .as[(Double, Double)].head()
    assert(err._1 < 1e-10 && err._2 < 1e-10, s"sin/cos poly error: $err")
    // exp on the ellipsoidal-correction range |w| <= 0.01
    val ws = spark.range(-100, 101).select(($"id" / 10000.0).as("w"))
    val ee = ws.select(max(abs(expC($"w") - exp($"w")))).as[Double].head()
    assert(ee < 1e-14, s"exp poly error: $ee")
    // atanh on |z| <= e ≈ 0.082
    val zs = spark.range(-82, 83).select(($"id" / 1000.0).as("z"))
      .withColumn("z2", $"z" * $"z")
    val ea = zs.select(max(abs(atanhC($"z", $"z2") - atanh($"z")))).as[Double].head()
    assert(ea < 1e-12, s"atanh poly error: $ea")
  }

  test("binLatLon inverse-projects the occupied bin centers") {
    val pts = PointFrame(southGrid).withXY(3031)
    val bins = PointFrame(pts.df, delta = 100000.0).binLatLon(3031)
    assert(bins.count() > 0)
    // every bin center lands back in the data's latitude band (southern)
    assert(bins.filter($"latitude" > -55.0 || $"latitude" < -90.0).count() == 0)
    assert(bins.filter(abs($"longitude") > 180.0).count() == 0)
  }

  test("polynomial oracle form agrees with the libm API to sub-cm") {
    val api = PointFrame(southGrid).withXY(3031).df.select($"id", $"x", $"y")
    val poly = Projections.projectEpsg(spark, sf)
      .select($"id", $"easting", $"northing")
    val diff = api.join(poly, "id")
      .agg(max(abs($"x" - $"easting")).as("dx"), max(abs($"y" - $"northing")).as("dy"))
      .as[(Double, Double)].head()
    assert(diff._1 < 0.01 && diff._2 < 0.01,
      s"poly vs libm divergence: $diff")
  }
}
