package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Along-track operators: track reconstruction (ATL06_tiles.py:142-160),
  * the ATL06 quality filters (ATL06_filters.py), the windowed derived
  * fields of ATL06_data.py, and the beam-pair collapse (ATL06_pair.py).
  *
  * All window ops partition by `track` — bounded per-partition state,
  * so the plan is a single shuffle on the track key at any scale.
  */
object TrackOps {

  private def trk(s: SparkSession, dir: String) = Tables.eventsTracks(s, dir)
  private val T = Tables.eventsTracksSql
  private def li(s: SparkSession, dir: String) = Tables.lineitemAtl06(s, dir)
  private val L = Tables.lineitemAtl06Sql

  /** Per-point along-track slope analog (dh_fit_dx). */
  private val dhFitDx = ((col("id") % 7) - 3).cast("double") / 1000.0
  private val dhFitDxSql = "((id % 7) - 3)/1000.0"

  // --- 10. reconstruct_tracks (ATL06_tiles.py:142-160) ---
  def tracks(s: SparkSession, dir: String): DataFrame =
    trk(s, dir).select("track", "seq", "id", "x_atc", "y", "z", "t")
      .orderBy("track", "seq")

  val tracksSql: String =
    s"""WITH trk AS ($T)
       |SELECT track, seq, id, x_atc, y, z, t FROM trk ORDER BY track, seq""".stripMargin

  // --- 11. segDifferenceFilter (ATL06_filters.py:29-51) ---
  /** segDiff[i] = max(|h[i]+20·m[i] − h[i+1]|, |h[i−1] − (h[i]−20·m[i])|)
    * with missing neighbors contributing 0 (the reference initializes
    * the array to zeros).  tol=100 on the z scale of the test data.
    */
  def segdiff(s: SparkSession, dir: String): DataFrame = {
    val w  = Window.partitionBy("track").orderBy("seq")
    val m  = dhFitDx
    val t1 = abs(col("z") + lit(20.0) * m - lead("z", 1).over(w))
    val t2 = abs(lag("z", 1).over(w) - (col("z") - lit(20.0) * m))
    trk(s, dir)
      .withColumn("segdiff", greatest(coalesce(t1, lit(0.0)), coalesce(t2, lit(0.0))))
      .select(col("track"), col("seq"), col("segdiff"),
              (col("segdiff") < 100.0).as("pass"))
      .orderBy("track", "seq")
  }

  val segdiffSql: String =
    s"""WITH trk AS ($T),
       |d AS (SELECT track, seq,
       |  greatest(
       |    coalesce(abs(z + 20.0*($dhFitDxSql) - lead(z,1) OVER w), 0.0),
       |    coalesce(abs(lag(z,1) OVER w - (z - 20.0*($dhFitDxSql))), 0.0)) AS segdiff
       |  FROM trk WINDOW w AS (PARTITION BY track ORDER BY seq))
       |SELECT track, seq, segdiff, segdiff < 100.0 AS pass
       |FROM d ORDER BY track, seq""".stripMargin

  // --- 12. rss_along_track_dh (ATL06_data.py:356-367) ---
  /** RSS of the slope-corrected misfit to both neighbors; single-sided
    * at track ends (ATL06_data.py:365-366 reduces to the same formula
    * with the missing side contributing 0).
    */
  def rssDh(s: SparkSession, dir: String): DataFrame = {
    val w  = Window.partitionBy("track").orderBy("seq")
    val m  = dhFitDx
    val tn = col("z") - m * (col("x_atc") - lead("x_atc", 1).over(w)) - lead("z", 1).over(w)
    val tp = col("z") - m * (col("x_atc") - lag("x_atc", 1).over(w)) - lag("z", 1).over(w)
    trk(s, dir)
      .withColumn("rss", sqrt(coalesce(tn * tn, lit(0.0)) + coalesce(tp * tp, lit(0.0))))
      .select(col("track"), col("seq"), col("rss").as("rss_dh"))
      .orderBy("track", "seq")
  }

  val rssDhSql: String =
    s"""WITH trk AS ($T),
       |d AS (SELECT track, seq,
       |  z - ($dhFitDxSql)*(x_atc - lead(x_atc,1) OVER w) - lead(z,1) OVER w AS tn,
       |  z - ($dhFitDxSql)*(x_atc - lag(x_atc,1) OVER w) - lag(z,1) OVER w AS tp
       |  FROM trk WINDOW w AS (PARTITION BY track ORDER BY seq))
       |SELECT track, seq, sqrt(coalesce(tn*tn,0.0)+coalesce(tp*tp,0.0)) AS rss_dh
       |FROM d ORDER BY track, seq""".stripMargin

  // --- 13. min_along_track_dh (ATL06_data.py:369-382) ---
  def minDh(s: SparkSession, dir: String): DataFrame = {
    val w  = Window.partitionBy("track").orderBy("seq")
    val m  = dhFitDx
    val an = abs(col("z") - m * (col("x_atc") - lead("x_atc", 1).over(w)) - lead("z", 1).over(w))
    val ap = abs(col("z") - m * (col("x_atc") - lag("x_atc", 1).over(w)) - lag("z", 1).over(w))
    trk(s, dir)
      .withColumn("min_dh", least(coalesce(an, ap), coalesce(ap, an)))
      .filter(col("min_dh").isNotNull) // single-point tracks → NaN in the reference
      .select(col("track"), col("seq"), col("min_dh"))
      .orderBy("track", "seq")
  }

  val minDhSql: String =
    s"""WITH trk AS ($T),
       |d AS (SELECT track, seq,
       |  abs(z - ($dhFitDxSql)*(x_atc - lead(x_atc,1) OVER w) - lead(z,1) OVER w) AS an,
       |  abs(z - ($dhFitDxSql)*(x_atc - lag(x_atc,1) OVER w) - lag(z,1) OVER w) AS ap
       |  FROM trk WINDOW w AS (PARTITION BY track ORDER BY seq))
       |SELECT track, seq, least(coalesce(an,ap), coalesce(ap,an)) AS min_dh
       |FROM d WHERE coalesce(an, ap) IS NOT NULL ORDER BY track, seq""".stripMargin

  // --- 14. qualitySummary (ATL06_filters.py:53-70) ---
  def quality(s: SparkSession, dir: String): DataFrame =
    li(s, dir)
      .filter(col("h_robust_sprd") < 1.0 && col("h_li_sigma") < 1.0 &&
              col("snr_significance") < 0.02)
      .select(col("l_orderkey"), col("l_linenumber"), col("h_li"))
      .orderBy("l_orderkey", "l_linenumber")

  val qualitySql: String =
    s"""WITH li AS ($L)
       |SELECT l_orderkey, l_linenumber, h_li FROM li
       |WHERE h_robust_sprd < 1.0 AND h_li_sigma < 1.0 AND snr_significance < 0.02
       |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // --- 14b. fpb_glitch_filter (ATL06_filters.py:72-80) ---
  /** First-photon-bias glitch screen: a segment is good when its fit
    * used no more photons than the FPB correction accounted for
    * (`n_fit_photons <= fpb_n_corr`) — the fourth and last ATL06
    * quality filter.
    */
  def fpbGlitch(s: SparkSession, dir: String): DataFrame =
    li(s, dir)
      .filter(col("n_fit_photons") <= col("fpb_n_corr"))
      .select(col("l_orderkey"), col("l_linenumber"),
        col("n_fit_photons"), col("fpb_n_corr"))
      .orderBy("l_orderkey", "l_linenumber")

  val fpbGlitchSql: String =
    s"""WITH li AS ($L)
       |SELECT l_orderkey, l_linenumber, n_fit_photons, fpb_n_corr FROM li
       |WHERE n_fit_photons <= fpb_n_corr
       |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // --- 15. phDensityFilter (ATL06_filters.py:9-27) ---
  /** density = n_fit_photons / w_surface_window_final, min 1 for weak
    * beams and 4 for strong beams.
    */
  def phDensity(s: SparkSession, dir: String): DataFrame = {
    val density = col("n_fit_photons") / col("w_surface_window_final")
    val minD    = when(col("beam_strong") === 1, 4.0).otherwise(1.0)
    li(s, dir)
      .withColumn("density", density)
      .filter(col("density") > minD)
      .select(col("l_orderkey"), col("l_linenumber"), col("density"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  val phDensitySql: String =
    s"""WITH li AS ($L)
       |SELECT l_orderkey, l_linenumber,
       |       n_fit_photons / w_surface_window_final AS density
       |FROM li
       |WHERE n_fit_photons / w_surface_window_final >
       |      (CASE WHEN beam_strong = 1 THEN 4.0 ELSE 1.0 END)
       |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // --- 16. ATL06_pair collapse (ATL06_pair.py:10-33) ---
  /** Collapse beam pairs (beam = id % 2, pair_id = id div 2) to the
    * pair level: means of coordinates/time and the cross-track slope
    * error dh_dy_sigma = sqrt(Σ σ²)/|Δy| (ATL06_pair.py:19).
    */
  def pairAgg(s: SparkSession, dir: String): DataFrame =
    Tables.eventsPoints(s, dir)
      .select(expr("id div 2").as("pair_id"), col("x"), col("y"), col("z"), col("t"),
              (col("z") / 100.0).as("sigma"),
              (((col("id") % 7) - 3).cast("double") / 1000.0).as("dh_dx"))
      .groupBy("pair_id")
      .agg(count("*").as("nb"), avg("x").as("xm"), avg("y").as("ym"),
           avg("t").as("tm"), avg("z").as("hm"), avg("dh_dx").as("dh_dx_m"),
           sum(col("sigma") * col("sigma")).as("ss"),
           max("y").as("y1"), min("y").as("y0"))
      .filter(col("nb") === 2 && col("y1") =!= col("y0"))
      .select(col("pair_id"), col("xm"), col("ym"), col("tm"), col("hm"),
              col("dh_dx_m"),
              (sqrt(col("ss")) / (col("y1") - col("y0"))).as("dh_dy_sigma"))
      .orderBy("pair_id")

  val pairAggSql: String =
    s"""WITH pts AS (${Tables.eventsPointsSql}),
       |g AS (SELECT id//2 AS pair_id, count(*) AS nb, avg(x) AS xm, avg(y) AS ym,
       |             avg(t) AS tm, avg(z) AS hm, avg(((id % 7) - 3)/1000.0) AS dh_dx_m,
       |             sum((z/100.0)*(z/100.0)) AS ss,
       |             max(y) AS y1, min(y) AS y0
       |      FROM pts GROUP BY 1)
       |SELECT pair_id, xm, ym, tm, hm, dh_dx_m, sqrt(ss)/(y1 - y0) AS dh_dy_sigma
       |FROM g WHERE nb = 2 AND y1 <> y0 ORDER BY pair_id""".stripMargin

  // --- 10b. resample_path (referenced by xover_search.py:139-146) ---
  /** Resample each track at a fixed 25-unit along-track spacing,
    * linearly interpolating z and t between the bracketing points
    * (x_atc is a uniform 10-unit grid, so the bracket index is
    * floor(p/10)).  The explode/join shape is the scalable form: one
    * shuffle on (track, seq), no per-track iteration.
    */
  def resample(s: SparkSession, dir: String): DataFrame = {
    val w   = Window.partitionBy("track").orderBy("seq")
    val seg = trk(s, dir)
      .withColumn("z2", lead("z", 1).over(w))
      .withColumn("t2", lead("t", 1).over(w))
      .filter(col("z2").isNotNull)
    val lens = trk(s, dir).groupBy("track").agg(max("seq").as("n"))
    val samples = lens
      .select(col("track"),
        explode(expr("sequence(1, greatest(cast(floor((n*10 - 10)/25) as int), 1))")).as("k"))
      .withColumn("p", col("k") * lit(25.0))
      .withColumn("i", expr("cast(floor(p/10) as bigint)"))
      .withColumn("frac", (col("p") - col("i") * 10.0) / 10.0)
    samples.join(seg, samples("track") === seg("track") && col("i") === col("seq"))
      .select(samples("track"), col("k").cast("long").as("k"), col("p"),
        (col("z") + col("frac") * (col("z2") - col("z"))).as("z_p"),
        (col("t") + col("frac") * (col("t2") - col("t"))).as("t_p"))
      .orderBy("track", "k")
  }

  val resampleSql: String =
    s"""WITH trk AS ($T),
       |seg AS (
       |  SELECT track, seq, z, t, lead(z,1) OVER w AS z2, lead(t,1) OVER w AS t2
       |  FROM trk WINDOW w AS (PARTITION BY track ORDER BY seq)),
       |lens AS (SELECT track, max(seq) AS n FROM trk GROUP BY 1),
       |samples AS (
       |  SELECT track, k, k*(25.0::DOUBLE) AS p,
       |    CAST(floor(k*25.0/10) AS BIGINT) AS i,
       |    (k*25.0 - CAST(floor(k*25.0/10) AS BIGINT)*10.0)/10.0 AS frac
       |  FROM lens,
       |    LATERAL (SELECT unnest(generate_series(1, greatest(CAST(floor((n*10 - 10)/25) AS INTEGER), 1))) AS k) t)
       |SELECT s.track, CAST(s.k AS BIGINT) AS k, s.p,
       |  g.z + s.frac*(g.z2 - g.z) AS z_p,
       |  g.t + s.frac*(g.t2 - g.t) AS t_p
       |FROM samples s JOIN seg g ON g.track = s.track AND g.seq = s.i
       |WHERE g.z2 IS NOT NULL
       |ORDER BY s.track, s.k""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_resample"  -> (resample _),
    "q_tracks"    -> (tracks _),
    "q_segdiff"   -> (segdiff _),
    "q_rss_dh"    -> (rssDh _),
    "q_min_dh"    -> (minDh _),
    "q_quality"   -> (quality _),
    "q_fpb_glitch" -> (fpbGlitch _),
    "q_phdensity" -> (phDensity _),
    "q_pair_agg"  -> (pairAgg _))

  val oracles: Map[String, String] = Map(
    "q_resample"  -> resampleSql,
    "q_tracks"    -> tracksSql,
    "q_segdiff"   -> segdiffSql,
    "q_rss_dh"    -> rssDhSql,
    "q_min_dh"    -> minDhSql,
    "q_quality"   -> qualitySql,
    "q_fpb_glitch" -> fpbGlitchSql,
    "q_phdensity" -> phDensitySql,
    "q_pair_agg"  -> pairAggSql)
}
