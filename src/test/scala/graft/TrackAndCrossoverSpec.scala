package graft

import org.apache.spark.sql.functions._
import graft.operators.{Crossovers, TrackOps}
import graft.core.Tables

class TrackAndCrossoverSpec extends SparkSpec {
  import spark.implicits._

  test("tracks are contiguous 1..n sequences per track") {
    val tr = Tables.eventsTracks(spark, sf)
    val bad = tr.groupBy("track")
      .agg(count("*").as("n"), max("seq").as("mx"), min("seq").as("mn"))
      .filter($"mx" =!= $"n" || $"mn" =!= 1)
    assert(bad.count() == 0)
  }

  test("crossovers finds the 9 geometrically-predicted track crossings") {
    // straight tracks y = a_t·x + b_t with a_t=((37t)%16)-7.5,
    // b_t=((53t)%11)·50 cross at x*=(b_j-b_i)/(a_i-a_j); exactly 9
    // pairs land at x* ∈ [10, 1250] for 8 tracks of 125 pts (sf0.001)
    val xo = Crossovers.crossovers(spark, sf).collect()
    assert(xo.length == 9)
    val pairs = xo.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((5L, 7L)))
    // verify one crossing analytically: tracks 1,2 cross at x=20
    val x12 = xo.find(r => r.getLong(0) == 1 && r.getLong(1) == 2).get
    assert(math.abs(x12.getAs[Double]("xc") - 20.0) < 1e-9)
    // y at crossing: a1·20+b1 = -2.5·20+450 = 400
    assert(math.abs(x12.getAs[Double]("yc") - 400.0) < 1e-9)
  }

  test("crossover interpolated values stay within segment endpoint bounds") {
    val xo = Crossovers.crossovers(spark, sf)
    // z interpolation is convex: z_a between the segment's z1,z2 is
    // checked implicitly by |dh| <= max z spread of the corpus
    val zmax = Tables.eventsPoints(spark, sf).agg(max("z")).as[Double].head()
    assert(xo.filter(abs($"dh") > zmax).count() == 0)
  }

  test("segdiff marks first/last rows using single-sided formula") {
    val sd = TrackOps.segdiff(spark, sf)
    assert(sd.count() == Tables.eventsTracks(spark, sf).count())
    assert(sd.filter($"segdiff" < 0).count() == 0)
  }

  test("rss_dh at track interior = sqrt(prev^2+next^2), ends single-sided") {
    val rss = TrackOps.rssDh(spark, sf)
    assert(rss.filter($"rss_dh" < 0).count() == 0)
    assert(rss.count() > 0)
  }

  test("pair aggregation keeps only complete pairs") {
    val pa = TrackOps.pairAgg(spark, sf)
    val n = Tables.eventsPoints(spark, sf).count()
    assert(pa.count() <= n / 2)
    assert(pa.filter($"dh_dy_sigma" < 0).count() == 0)
  }

  test("quality filter applies the three ATL06 thresholds") {
    val q = TrackOps.quality(spark, sf)
    val li = Tables.lineitemAtl06(spark, sf)
    val expected = li.filter(
      $"h_robust_sprd" < 1.0 && $"h_li_sigma" < 1.0 && $"snr_significance" < 0.02).count()
    assert(q.count() == expected && expected > 0)
  }

  test("incremental crossovers = full crossings involving the new tracks") {
    // archive = tracks 0..5, new batch = tracks 6..7 (run_tile_updates'
    // granule-vs-tile-store loop); incremental must reproduce exactly
    // the full result's rows that touch a new track — no more, no less
    val tracks = Tables.eventsTracks(spark, sf)
    val inc = Crossovers.incrementalCrossovers(
        tracks.filter($"track" < 6), tracks.filter($"track" >= 6))
      .select("track_a", "track_b", "seq_a", "seq_b", "dh")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    val full = Crossovers.crossovers(spark, sf)
      .filter($"track_a" >= 6 || $"track_b" >= 6)
      .select("track_a", "track_b", "seq_a", "seq_b", "dh")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(inc == full && inc.nonEmpty)
    // and nothing old-only leaked in
    assert(inc.forall { case (a, b, _, _, _) => a >= 6 || b >= 6 })
  }

  test("archive-backed incremental crossovers: same rows, only curve-matched files opened") {
    val tracks = Tables.eventsTracks(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("segarch").toString
    Crossovers.writeSegmentArchive(tracks.filter($"track" < 6), dir, nFiles = 16)
    val inc = Crossovers.incrementalCrossoversFromArchive(
        spark, dir, tracks.filter($"track" >= 6))
      .select("track_a", "track_b", "seq_a", "seq_b", "dh")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    // identical to the in-memory incremental operator (itself pinned
    // against the full result above)
    val want = Crossovers.incrementalCrossovers(
        tracks.filter($"track" < 6), tracks.filter($"track" >= 6))
      .select("track_a", "track_b", "seq_a", "seq_b", "dh")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(inc == want && inc.nonEmpty)
    // file pruning bites: the manifest key-range join opens fewer
    // archive files than exist (tracks 6..7 touch a band of cells,
    // not the whole domain)
    val total = spark.read.parquet(dir).inputFiles.length
    val newSegCells = Crossovers.segmentsOf(tracks.filter($"track" >= 6))
      .select(graft.functions.ZOrder.zkey($"cell_x", $"cell_y").as("k"))
    val opened = spark.read.parquet(s"$dir/_manifest")
      .join(org.apache.spark.sql.functions.broadcast(newSegCells),
        $"k".between($"k0", $"k1"), "leftsemi").count()
    assert(opened < total, s"$opened of $total archive files match")
  }

  test("snapshot-pinned archive crossovers: a grown archive replays old answers") {
    val tracks = Tables.eventsTracks(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("segarch2").toString
    // epoch 0: tracks 0-3 archived; epoch 1: tracks 4-5 appended
    Crossovers.writeSegmentArchive(tracks.filter($"track" < 4), dir, nFiles = 8)
    Crossovers.appendSegmentArchive(
      tracks.filter($"track" >= 4 && $"track" < 6), dir, nFiles = 2)
    def keyed(df: org.apache.spark.sql.DataFrame) = df
      .select("track_a", "track_b", "seq_a", "seq_b", "dh")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    val batch = tracks.filter($"track" >= 6)
    // pinned at epoch 0: exactly the answer the pre-append archive gave
    val pinned = keyed(Crossovers.incrementalCrossoversFromArchive(
      spark, dir, batch, asOfEpoch = Some(0L)))
    assert(pinned == keyed(Crossovers.incrementalCrossovers(
      tracks.filter($"track" < 4), batch)))
    // unpinned: the grown archive, appended segments included
    val now = keyed(Crossovers.incrementalCrossoversFromArchive(spark, dir, batch))
    assert(now == keyed(Crossovers.incrementalCrossovers(
      tracks.filter($"track" < 6), batch)))
    assert(pinned.subsetOf(now) && pinned != now)
    // pre-history pin refuses
    intercept[IllegalArgumentException] {
      Crossovers.incrementalCrossoversFromArchive(
        spark, dir, batch, asOfEpoch = Some(-1L))
    }
    // REPLAY SURVIVES GROWTH: append another batch — the epoch-0 pin
    // still reproduces the original answer against the larger archive
    Crossovers.appendSegmentArchive(
      tracks.filter($"track" === 6), dir, nFiles = 1)
    assert(keyed(Crossovers.incrementalCrossoversFromArchive(
      spark, dir, batch, asOfEpoch = Some(0L))) == pinned)
    // ...but NOT compaction: the rewrite collapses history to the
    // current epoch, so the old pin now throws instead of serving a
    // silently-wrong subset, while the unpinned read sees the full
    // (grown) archive
    graft.sources.GeoParquet.compactCurve(spark, dir, nFiles = 8)
    intercept[IllegalArgumentException] {
      Crossovers.incrementalCrossoversFromArchive(
        spark, dir, batch, asOfEpoch = Some(0L))
    }
    assert(keyed(Crossovers.incrementalCrossoversFromArchive(spark, dir, batch))
      == keyed(Crossovers.incrementalCrossovers(
        tracks.filter($"track" < 7), batch)))
  }

  test("self-crossovers: each folded track crosses itself once, at x = K") {
    // the fold construction pins the crossing analytically: outbound
    // y=(track+1)x vs return y=(track+1)(2K-x) meet at exactly x=K,
    // y=(track+1)K — the operator must find one crossing per track at
    // that point, with pass 0 always the 'a' side
    val tracks = Tables.eventsTracks(spark, sf)
    val xo = Crossovers.selfCrossovers(spark, sf)
    val perTrack = tracks.groupBy("track")
      .agg(max("seq").as("n")).as[(Long, Long)].collect().toMap
    val rows = xo.select("track", "xc", "yc")
      .as[(Long, Double, Double)].collect()
    assert(rows.length == perTrack.size) // exactly one per track
    rows.foreach { case (trk, xc, yc) =>
      val k = (perTrack(trk) / 4) * 10.0
      assert(xc == k, s"track $trk crossing at $xc, expected $k")
      assert(yc == (trk + 1) * k)
    }
  }
}
