package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.PolyTrig

/** Ellipsoidal polar stereographic projections (EPSG:3031 Antarctic,
  * EPSG:3413 Arctic), the reference's actual working CRSs: point_data
  * .get_xy (point_data.py:135-160) and ATL06_tiles.py:221-223 pass
  * proj4/EPSG strings to pyproj.  Formulas are the public Snyder 1987
  * eqs. 15-9/21-33..35 (Polar Stereographic variant B of the EPSG
  * guidance), WGS84 ellipsoid.
  *
  * Two implementations:
  *  - [[forward]]/[[inverse]]: Column API on Spark's own
  *    tan/exp/atanh/atan2 — full libm accuracy, for users
  *    (PointFrame.withXY(epsg)); spec-verified by round-trip.
  *  - [[projectEpsg]] (+ oracle SQL): the same forward math with every
  *    transcendental replaced by [[PolyTrig]]'s shared polynomial, so
  *    Spark and DuckDB produce bit-identical doubles (the t-factor
  *    `((1−e·sinφ)/(1+e·sinφ))^(e/2)` is rewritten pow-free as
  *    `exp(−e·atanh(e·sinφ))`, and sqrt — IEEE-exact in both
  *    engines — is used directly).
  */
object Projections {

  /** Polar stereographic variant B parameters (WGS84). */
  final case class Polar(phiF: Double, lam0: Double, south: Boolean)

  /** EPSG:3031 — Antarctic Polar Stereographic, lat_ts=−71, lon_0=0. */
  val Epsg3031: Polar = Polar(-71.0, 0.0, south = true)

  /** EPSG:3413 — NSIDC Arctic, lat_ts=70, lon_0=−45. */
  val Epsg3413: Polar = Polar(70.0, -45.0, south = false)

  val A  = 6378137.0
  val F  = 1.0 / 298.257223563
  val E2 = F * (2.0 - F)
  val E  = math.sqrt(E2)

  private def ofEpsg(epsg: Int): Polar = epsg match {
    case 3031 => Epsg3031
    case 3413 => Epsg3413
    case other => throw new IllegalArgumentException(
      s"unsupported EPSG:$other (supported: 3031, 3413)")
  }

  // ---- libm Column API (user-facing; spec-verified) ----

  /** Snyder 15-9 t-factor, pow-free:
    * north t = tan(π/4 − φ/2)·exp(+e·atanh(e·sinφ));
    * south uses φ → −φ symmetry: tan(π/4 + φ/2)·exp(−e·atanh(e·sinφ)).
    */
  private def tFac(phiRad: Column, south: Boolean): Column =
    if (south)
      tan(lit(math.Pi / 4) + phiRad / 2.0) * exp(lit(-E) * atanh(lit(E) * sin(phiRad)))
    else
      tan(lit(math.Pi / 4) - phiRad / 2.0) * exp(lit(E) * atanh(lit(E) * sin(phiRad)))

  private def tFacD(phiRad: Double, south: Boolean): Double =
    if (south)
      math.tan(math.Pi / 4 + phiRad / 2) *
        math.exp(-E * atanhD(E * math.sin(phiRad)))
    else
      math.tan(math.Pi / 4 - phiRad / 2) *
        math.exp(E * atanhD(E * math.sin(phiRad)))

  private def atanhD(z: Double): Double = 0.5 * math.log((1 + z) / (1 - z))

  /** m = cosφ / sqrt(1 − e²sin²φ) at the standard parallel. */
  private def mD(phiRad: Double): Double = {
    val s = math.sin(phiRad)
    math.cos(phiRad) / math.sqrt(1.0 - E2 * s * s)
  }

  /** lat/lon (degrees) → (easting, northing) meters. */
  def forward(lat: Column, lon: Column, epsg: Int): (Column, Column) = {
    val p = ofEpsg(epsg)
    val phiF = math.toRadians(p.phiF)
    val rho  = lit(A * mD(phiF) / tFacD(phiF, p.south)) * tFac(radians(lat), p.south)
    val theta = radians(lon - p.lam0)
    if (p.south) (rho * sin(theta), rho * cos(theta))
    else         (rho * sin(theta), -rho * cos(theta))
  }

  /** (easting, northing) meters → lat/lon (degrees) — Snyder series
    * for the conformal-to-geodetic latitude (eqs. 3-5/7-13).
    */
  def inverse(x: Column, y: Column, epsg: Int): (Column, Column) = {
    val p = ofEpsg(epsg)
    val phiF = math.toRadians(p.phiF)
    val rhoP = sqrt(x * x + y * y)
    val tP   = rhoP * tFacD(phiF, p.south) / (A * mD(phiF))
    val chi  =
      if (p.south) lit(2.0) * atan(tP) - math.Pi / 2
      else         lit(math.Pi / 2) - lit(2.0) * atan(tP)
    val (e4, e6, e8) = (E2 * E2, E2 * E2 * E2, E2 * E2 * E2 * E2)
    val c2 = E2 / 2 + 5 * e4 / 24 + e6 / 12 + 13 * e8 / 360
    val c4 = 7 * e4 / 48 + 29 * e6 / 240 + 811 * e8 / 11520
    val c6 = 7 * e6 / 120 + 81 * e8 / 1120
    val c8 = 4279 * e8 / 161280
    val phi = chi + lit(c2) * sin(chi * 2) + lit(c4) * sin(chi * 4) +
      lit(c6) * sin(chi * 6) + lit(c8) * sin(chi * 8)
    val lam =
      if (p.south) lit(p.lam0) + degrees(atan2(x, y))
      else         lit(p.lam0) + degrees(atan2(x, -y))
    (degrees(phi), lam)
  }

  // ---- oracle query: bit-identical polynomial form (EPSG:3031) ----

  /** q_project_epsg: the synthetic southern lat/lon view projected to
    * EPSG:3031 with the all-polynomial forward — every step a column
    * mirrored 1:1 in the oracle CTE chain below.
    */
  def projectEpsg(s: SparkSession, dir: String): DataFrame = {
    import PolyTrig._
    Tables.eventsPoints(s, dir)
      .select(col("id"))
      .withColumn("lat", lit(-60.0) - (col("id") % 300) / lit(10.0))
      .withColumn("lon", (col("id") % 3600) / lit(10.0) - 180.0)
      // ellipsoid constants (constant-folded by Catalyst; DuckDB
      // evaluates the same IEEE ops)
      .withColumn("f", lit(1.0) / 298.257223563)
      .withColumn("e2c", col("f") * (lit(2.0) - col("f")))
      .withColumn("ecc", sqrt(col("e2c")))
      // standard-parallel constants at φF = −71°
      .withColumn("phif", lit(-71.0) * PI / 180.0)
      .withColumn("phif2", col("phif") * col("phif"))
      .withColumn("sphif", sinC(col("phif"), col("phif2")))
      .withColumn("sphif2", col("sphif") * col("sphif"))
      .withColumn("zf", col("ecc") * col("sphif"))
      .withColumn("zf2", col("zf") * col("zf"))
      .withColumn("athf", atanhC(col("zf"), col("zf2")))
      .withColumn("wf", -(col("ecc") * col("athf")))
      .withColumn("uf", (lit(45.0) + lit(-71.0) / 2.0) * PI / 180.0)
      .withColumn("uf2", col("uf") * col("uf"))
      .withColumn("tf", sinC(col("uf"), col("uf2")) / cosC(col("uf2")) * expC(col("wf")))
      .withColumn("mf", cosC(col("phif2")) / sqrt(lit(1.0) - col("e2c") * col("sphif2")))
      // per-point t-factor (south): tan(π/4+φ/2)·exp(−e·atanh(e·sinφ))
      .withColumn("rlat", col("lat") * PI / 180.0)
      .withColumn("rlat2", col("rlat") * col("rlat"))
      .withColumn("sphi", sinC(col("rlat"), col("rlat2")))
      .withColumn("z", col("ecc") * col("sphi"))
      .withColumn("z2", col("z") * col("z"))
      .withColumn("ath", atanhC(col("z"), col("z2")))
      .withColumn("w", -(col("ecc") * col("ath")))
      .withColumn("u", (lit(45.0) + col("lat") / 2.0) * PI / 180.0)
      .withColumn("u2", col("u") * col("u"))
      .withColumn("tv", sinC(col("u"), col("u2")) / cosC(col("u2")) * expC(col("w")))
      .withColumn("rho", lit(6378137.0) * col("mf") * col("tv") / col("tf"))
      .withColumn("rlon", col("lon") * PI / 180.0)
      .withColumn("rlon2", col("rlon") * col("rlon"))
      .select(col("id"), col("lat"), col("lon"),
        (col("rho") * sinC(col("rlon"), col("rlon2"))).as("easting"),
        (col("rho") * cosC(col("rlon2"))).as("northing"))
      .orderBy("id")
  }

  val projectEpsgSql: String = {
    import PolyTrig._
    s"""WITH pts AS (${Tables.eventsPointsSql}),
       |l1 AS (SELECT id, -60.0 - (id % 300)/10.0 AS lat,
       |              (id % 3600)/10.0 - 180.0 AS lon FROM pts),
       |k1 AS (SELECT *, 1.0/298.257223563 AS f FROM l1),
       |k2 AS (SELECT *, f * (2.0 - f) AS e2c FROM k1),
       |k3 AS (SELECT *, sqrt(e2c) AS ecc,
       |              (-71.0::DOUBLE) * $PI / 180.0 AS phif FROM k2),
       |k4 AS (SELECT *, phif * phif AS phif2 FROM k3),
       |k5 AS (SELECT *, ${sinS("phif", "phif2")} AS sphif FROM k4),
       |k6 AS (SELECT *, sphif * sphif AS sphif2, ecc * sphif AS zf FROM k5),
       |k7 AS (SELECT *, zf * zf AS zf2 FROM k6),
       |k8 AS (SELECT *, ${atanhS("zf", "zf2")} AS athf FROM k7),
       |k9 AS (SELECT *, -(ecc * athf) AS wf,
       |              (45.0 + (-71.0::DOUBLE)/2.0) * $PI / 180.0 AS uf FROM k8),
       |k10 AS (SELECT *, uf * uf AS uf2 FROM k9),
       |k11 AS (SELECT *, ${sinS("uf", "uf2")} / ${cosS("uf2")} * ${expS("wf")} AS tf,
       |               ${cosS("phif2")} / sqrt(1.0 - e2c * sphif2) AS mf FROM k10),
       |p1 AS (SELECT *, lat * $PI / 180.0 AS rlat FROM k11),
       |p2 AS (SELECT *, rlat * rlat AS rlat2 FROM p1),
       |p3 AS (SELECT *, ${sinS("rlat", "rlat2")} AS sphi FROM p2),
       |p4 AS (SELECT *, ecc * sphi AS z FROM p3),
       |p5 AS (SELECT *, z * z AS z2 FROM p4),
       |p6 AS (SELECT *, ${atanhS("z", "z2")} AS ath FROM p5),
       |p7 AS (SELECT *, -(ecc * ath) AS w,
       |              (45.0 + lat/2.0) * $PI / 180.0 AS u FROM p6),
       |p8 AS (SELECT *, u * u AS u2 FROM p7),
       |p9 AS (SELECT *, ${sinS("u", "u2")} / ${cosS("u2")} * ${expS("w")} AS tv FROM p8),
       |p10 AS (SELECT *, (6378137.0::DOUBLE) * mf * tv / tf AS rho,
       |               lon * $PI / 180.0 AS rlon FROM p9),
       |p11 AS (SELECT *, rlon * rlon AS rlon2 FROM p10)
       |SELECT id, lat, lon,
       |  rho * ${sinS("rlon", "rlon2")} AS easting,
       |  rho * ${cosS("rlon2")} AS northing
       |FROM p11 ORDER BY id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_project_epsg" -> (projectEpsg _))

  val oracles: Map[String, String] = Map(
    "q_project_epsg" -> projectEpsgSql)
}
