package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.sources.GeoParquet
import graft.sources.v2.{GraftAggScan, GraftScan, GraftSource}

/** Aggregate pushdown through the SQL face: global
  * COUNT(*)/COUNT(c)/MIN/MAX with fully-pushed numeric filters are
  * answered from the manifest for interior files (the `cn` non-null
  * counts prove every row passes) and scanned only on the box
  * perimeter — the SQL twin of countBoxViaManifest /
  * minMaxBoxViaManifest.  Exactness is pinned against the same
  * aggregation computed by Spark over a plain parquet read,
  * including nulls, NaN ordering, strict bounds, and the
  * graceful-degradation paths (Or-shaped filters, stale manifests).
  */
class SqlAggPushdownSpec extends SparkSpec {
  import spark.implicits._

  /** Bin-partitioned layout over a 50×37-cell point lattice. */
  private def layout(n: Int, spread: Double): String = {
    val dir = java.nio.file.Files.createTempDirectory("sqlagg").toString
    val pts = (0 until n).map { i =>
      (i.toLong, (i % 50) * spread, (i % 37) * spread, i * 1.0)
    }.toDF("id", "x", "y", "z")
    GeoParquet.write(pts, dir, 250.0)
    GeoParquet.writeManifest(spark, dir)
    dir
  }

  private def face(dir: String, view: String): Unit =
    spark.read.format("graft").load(dir).createOrReplaceTempView(view)

  /** All physical nodes, descending through AQE wrappers (an
    * aggregate query's executedPlan is an AdaptiveSparkPlanExec leaf
    * until unwrapped).
    */
  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] =
    graft.core.PlanWalk.nodes(p) // stage-aware: sees inside executed stages

  private def scanOf(df: DataFrame) =
    allNodes(df.queryExecution.executedPlan).collectFirst {
      case b: BatchScanExec => b.scan
    }.getOrElse(fail("no BatchScanExec in plan"))

  private def truth(dir: String): DataFrame =
    spark.read.parquet(dir).select("id", "x", "y", "z")

  test("box COUNT/MIN/MAX push down and answer interior files from the manifest") {
    val dir = layout(4000, 25.0)
    face(dir, "agg1")
    val sql = spark.sql(
      """SELECT count(*) AS n, count(z) AS nz, min(z) AS zmin, max(z) AS zmax
        |FROM agg1 WHERE x >= 0 AND x < 400 AND y >= 0 AND y < 400""".stripMargin)
    assert(scanOf(sql).isInstanceOf[GraftAggScan], "aggregate was not pushed")
    val want = truth(dir)
      .filter($"x" >= 0 && $"x" < 400 && $"y" >= 0 && $"y" < 400)
      .agg(count("*").as("n"), count("z").as("nz"),
        min("z").as("zmin"), max("z").as("zmax"))
    assert(sql.collect().toSeq == want.collect().toSeq)
    val (answered, scanned) = GraftSource.lastAggPlan.get(dir)
    assert(answered > 0, "no file was answered from the manifest")
    val total = spark.read.parquet(dir).inputFiles.length
    assert(answered + scanned <= total)
    assert(scanned < total, s"no pruning: scanned $scanned of $total")
  }

  test("a zero-match box still answers COUNT 0, not NULL") {
    val dir = layout(500, 25.0)
    face(dir, "agg0")
    val r = spark.sql(
      """SELECT count(*) AS n, min(z) AS zmin
        |FROM agg0 WHERE x >= 1e6 AND y >= 1e6""".stripMargin).collect()(0)
    assert(r.getLong(0) == 0L)
    assert(r.isNullAt(1))
  }

  test("null values block containment proofs but never the answer") {
    val dir = layout(1000, 25.0)
    // a batch with null z INSIDE the box: its file must not be
    // manifest-answered for count(z)/min(z) unless provably null-free
    val extra = Seq(
      (900001L, 10.0, 10.0, Option.empty[Double]),
      (900002L, 11.0, 11.0, Some(-1e9)),
      (900003L, 12.0, 12.0, Option.empty[Double])
    ).toDF("id", "x", "y", "z")
    GeoParquet.appendWithManifest(extra, dir, 250.0)
    face(dir, "aggn")
    val sql = spark.sql(
      """SELECT count(*) AS n, count(z) AS nz, min(z) AS zmin
        |FROM aggn WHERE x >= 0 AND x < 400 AND y >= 0 AND y < 400""".stripMargin)
    assert(scanOf(sql).isInstanceOf[GraftAggScan])
    val want = truth(dir)
      .filter($"x" >= 0 && $"x" < 400 && $"y" >= 0 && $"y" < 400)
      .agg(count("*").as("n"), count("z").as("nz"), min("z").as("zmin"))
    assert(sql.collect().toSeq == want.collect().toSeq)
  }

  test("a null-valued FILTER column turns containment off for its file") {
    val dir = layout(1000, 25.0)
    // null x rides a file whose x-envelope would otherwise be interior
    val extra = Seq(
      (910001L, Some(10.0), 10.0, 5.0),
      (910002L, Option.empty[Double], 11.0, 6.0)
    ).toDF("id", "x", "y", "z")
    GeoParquet.appendWithManifest(extra, dir, 250.0)
    face(dir, "aggfn")
    val sql = spark.sql(
      "SELECT count(*) AS n FROM aggfn WHERE x >= 0 AND x < 400")
    val want = truth(dir).filter($"x" >= 0 && $"x" < 400)
      .agg(count("*").as("n"))
    assert(sql.collect().toSeq == want.collect().toSeq)
  }

  test("NaN orders greatest in pushed MAX, matching Spark") {
    val dir = layout(500, 25.0)
    val extra = Seq(
      (920001L, 10.0, 10.0, Double.NaN),
      (920002L, 11.0, 11.0, 123.0)
    ).toDF("id", "x", "y", "z")
    GeoParquet.appendWithManifest(extra, dir, 250.0)
    face(dir, "aggnan")
    val sql = spark.sql(
      "SELECT min(z) AS zmin, max(z) AS zmax FROM aggnan WHERE x >= 0 AND x < 400")
    val want = truth(dir).filter($"x" >= 0 && $"x" < 400)
      .agg(min("z").as("zmin"), max("z").as("zmax"))
    assert(sql.collect().toSeq == want.collect().toSeq)
    assert(sql.collect()(0).getDouble(1).isNaN, "NaN must win MAX")
  }

  test("strict bounds stay exact through pushdown") {
    val dir = layout(2000, 25.0)
    face(dir, "aggs")
    truth(dir).createOrReplaceTempView("aggs_raw")
    // 25.0 and 400.0 are exact lattice values — off-by-strictness
    // would change the count
    for (sqlTxt <- Seq(
      "SELECT count(*) AS n FROM aggs WHERE x > 25.0 AND x < 400.0",
      "SELECT count(*) AS n FROM aggs WHERE x >= 25.0 AND x <= 400.0",
      "SELECT count(*) AS n FROM aggs WHERE x > 25.0 AND y <= 300.0 AND y > 0.0")) {
      val got = spark.sql(sqlTxt).collect()(0).getLong(0)
      val want = spark.sql(sqlTxt.replace("FROM aggs", "FROM aggs_raw")).collect()(0).getLong(0)
      assert(got == want, sqlTxt)
      assert(got > 0, s"degenerate test: $sqlTxt")
    }
  }

  test("Or-shaped filters fall back to a row scan, results unchanged") {
    val dir = layout(1500, 25.0)
    face(dir, "aggor")
    val sql = spark.sql(
      "SELECT count(*) AS n FROM aggor WHERE x < 100 OR y < 100")
    // Or keeps the filter exact-pushable but blocks interval
    // containment — aggregation still pushes, nothing is
    // manifest-answered, every candidate file scans
    val want = truth(dir).filter($"x" < 100 || $"y" < 100)
      .agg(count("*").as("n"))
    assert(sql.collect().toSeq == want.collect().toSeq)
  }

  test("residual (non-numeric) predicates disable agg pushdown, not correctness") {
    val dir = java.nio.file.Files.createTempDirectory("sqlaggstr").toString
    val pts = (0 until 600).map { i =>
      (i.toLong, (i % 50) * 25.0, (i % 37) * 25.0, i * 1.0,
        if (i % 3 == 0) "keep" else "drop")
    }.toDF("id", "x", "y", "z", "tag")
    GeoParquet.write(pts, dir, 250.0)
    GeoParquet.writeManifest(spark, dir)
    face(dir, "aggres")
    // string EQUALITY is exact-evaluated (UTF8 binary order, Spark's
    // default collation): the aggregation pushes; with no per-file
    // tag stats in the manifest nothing is certified interior, so
    // every candidate file scans — correct counts, via the fold
    GraftSource.lastAggPlan.remove(dir)
    val sql = spark.sql(
      "SELECT count(*) AS n FROM aggres WHERE x >= 0 AND tag = 'keep'")
    assert(scanOf(sql).isInstanceOf[GraftAggScan],
      "string equality is exact; aggregates must push over it")
    val want = spark.read.parquet(dir)
      .filter($"x" >= 0 && $"tag" === "keep").agg(count("*").as("n"))
    assert(sql.collect().toSeq == want.collect().toSeq)
    val (answered, scanned) = GraftSource.lastAggPlan.get(dir)
    assert(answered == 0 && scanned > 0,
      s"no tag stats exist — a 'contained' certification ($answered) is unsound")
    // a shape the evaluator genuinely cannot handle (infix LIKE →
    // StringContains) stays residual and DISABLES the pushdown —
    // Spark re-filters, correctness unaffected
    val res = spark.sql(
      "SELECT count(*) AS n FROM aggres WHERE x >= 0 AND tag LIKE '%ee%'")
    assert(!scanOf(res).isInstanceOf[GraftAggScan],
      "StringContains is residual; aggregates must not push over it")
    assert(scanOf(res).isInstanceOf[GraftScan])
    assert(res.collect().toSeq == want.collect().toSeq)
  }

  test("COUNT stays manifest-answered UNDER pending merge-on-read deletes") {
    val dir = layout(3000, 25.0)
    GeoParquet.deleteWhere(spark, dir, col("id") % 9 === 4)
    assert(GeoParquet.pendingPositional(spark, dir).nonEmpty)
    face(dir, "morcount")
    GraftSource.lastAggPlan.remove(dir)
    // wide box: every file is contained — the count must come from
    // manifest stats minus each file's doomed-position count, with
    // ZERO files opened
    val n = spark.sql(
      """SELECT count(*) AS n, count(z) AS nz FROM morcount
        |WHERE x >= -1.0E7 AND x < 1.0E7 AND y >= -1.0E7 AND y < 1.0E7""".stripMargin)
      .collect()(0)
    val want = 3000L - (0 until 3000).count(_ % 9 == 4)
    assert(n.getLong(0) == want && n.getLong(1) == want)
    val (answered, scanned) = GraftSource.lastAggPlan.get(dir)
    assert(answered > 0 && scanned == 0,
      s"pending deletes degraded the count: answered=$answered scanned=$scanned")
    // a selective box makes boundary files SCAN — the subtracting
    // fold must skip doomed positions there too
    GraftSource.lastAggPlan.remove(dir)
    val sel = spark.sql(
      """SELECT count(*) AS n FROM morcount
        |WHERE x >= 0 AND x < 460 AND y >= 0 AND y < 460""".stripMargin)
      .collect()(0).getLong(0)
    val wantSel = (0 until 3000).count { i =>
      val x = (i % 50) * 25.0; val y = (i % 37) * 25.0
      i % 9 != 4 && x >= 0 && x < 460 && y >= 0 && y < 460
    }
    assert(sel == wantSel, s"boundary subtraction wrong: $sel vs $wantSel")
    assert(GraftSource.lastAggPlan.get(dir)._2 > 0, "no boundary file scanned")
    // MIN/MAX push under pending deletes too: stats cannot subtract
    // (a doomed row might BE the extremum), so every file holding a
    // doomed position boundary-scans with those positions skipped —
    // here the id%9 deletes land in EVERY file, so nothing is
    // stats-answered and the fold alone must exclude the dead rows
    GraftSource.lastAggPlan.remove(dir)
    val mm = spark.sql("SELECT min(z) AS zmin, max(z) AS zmax FROM morcount")
      .collect()(0)
    val zs = (0 until 3000).filter(_ % 9 != 4).map(_ * 1.0)
    assert(mm.getDouble(0) == zs.min && mm.getDouble(1) == zs.max)
    val mmPlan = GraftSource.lastAggPlan.get(dir)
    assert(mmPlan != null && mmPlan._2 > 0,
      s"MIN/MAX under corpus-wide deletes must boundary-scan the " +
        s"doomed files: $mmPlan")
  }

  test("MIN/MAX stay manifest-answered for files a localized delete never touched") {
    val dir = layout(3000, 25.0)
    // dooms only the bin-1000/bin-1250 files (x >= 1000); bins
    // 0..750 hold x <= 850 and keep zero doomed positions
    GeoParquet.deleteWhere(spark, dir, col("x") >= 1000.0)
    assert(GeoParquet.pendingPositional(spark, dir).nonEmpty)
    face(dir, "mormm")
    GraftSource.lastAggPlan.remove(dir)
    // 860 sits between the last innocent lattice point (850) and the
    // first doomed file's envelope (875): every candidate file is
    // innocent AND fully contained → MIN/MAX/COUNT all answered from
    // the manifest with ZERO files opened, deletes still pending —
    // the one-row-DELETE-must-not-rescan-the-corpus contract
    val mm = spark.sql(
      """SELECT min(z) AS zmin, max(z) AS zmax, count(*) AS n FROM mormm
        |WHERE x >= 0 AND x < 860.0""".stripMargin).collect()(0)
    val sel = (0 until 3000).filter(i => (i % 50) * 25.0 < 860.0)
    assert(mm.getDouble(0) == sel.min * 1.0 &&
      mm.getDouble(1) == sel.max * 1.0 && mm.getLong(2) == sel.size)
    val (answered, scanned) = GraftSource.lastAggPlan.get(dir)
    assert(answered > 0 && scanned == 0,
      s"a delete-disjoint MIN/MAX opened files: answered=$answered " +
        s"scanned=$scanned — innocence is provable from the tombstone " +
        "parts' file names")
    // the doomed band itself: stats refuse per-file, the boundary
    // scan subtracts, and the answer is exact
    GraftSource.lastAggPlan.remove(dir)
    val band = spark.sql(
      """SELECT min(z) AS zmin, max(z) AS zmax, count(*) AS n FROM mormm
        |WHERE x >= 1000.0""".stripMargin).collect()(0)
    assert(band.isNullAt(0) && band.isNullAt(1) && band.getLong(2) == 0L,
      s"every x >= 1000 row is deleted — a non-empty band aggregate " +
        s"leaked a doomed row: $band")
    assert(GraftSource.lastAggPlan.get(dir)._2 > 0,
      "the doomed band's files must scan (a doomed row might be the extremum)")
  }

  test("STRING MIN/MAX push down: key-banded from stats, non-key via the fold, nulls skipped") {
    // (a) string-KEYED layout: a key band's MIN/MAX serve from the
    // manifest k0/k1 stats (UTF8 binary order on both sides)
    val kdir = java.nio.file.Files.createTempDirectory("sqlaggstr").toString
    val rows = (0 until 3000).map { i =>
      (f"k$i%04d", i.toLong, i * 1.0)
    }.toDF("sid", "id", "z")
    GeoParquet.writeKeyed(rows, kdir, "sid", nFiles = 8)
    face(kdir, "aggstr")
    GraftSource.lastAggPlan.remove(kdir)
    val sql = spark.sql(
      """SELECT min(sid) AS s0, max(sid) AS s1, count(*) AS n FROM aggstr
        |WHERE sid >= 'k0100' AND sid < 'k0900'""".stripMargin)
    assert(scanOf(sql).isInstanceOf[GraftAggScan],
      "string MIN/MAX was not pushed")
    val r = sql.collect()(0)
    assert(r.getString(0) == "k0100" && r.getString(1) == "k0899" &&
      r.getLong(2) == 800L, s"string band aggregate diverged: $r")
    // the band spans files 0..2 of the 8-file range layout; file 1
    // (k0375..k0749) is INTERIOR and must have served from stats
    val (answered, _) = GraftSource.lastAggPlan.get(kdir)
    assert(answered > 0,
      "no file served its string MIN/MAX from the k0/k1 stats")
    // (b) non-key string column (no per-column stats): every file
    // boundary-scans, the fold orders by UTF8 bytes and SKIPS nulls
    val dir2 = java.nio.file.Files.createTempDirectory("sqlaggstr2").toString
    val withNulls = (0 until 1000).map { i =>
      (i.toLong, (i % 50) * 25.0, (i % 37) * 25.0,
        if (i % 3 == 0) null else f"t$i%04d")
    }.toDF("id", "x", "y", "tag")
    GeoParquet.write(withNulls, dir2, 250.0)
    GeoParquet.writeManifest(spark, dir2)
    face(dir2, "aggstr2")
    val mm = spark.sql(
      "SELECT min(tag) AS t0, max(tag) AS t1, count(tag) AS n FROM aggstr2")
    assert(scanOf(mm).isInstanceOf[GraftAggScan])
    val want = (0 until 1000).filter(_ % 3 != 0).map(i => f"t$i%04d")
    val got = mm.collect()(0)
    assert(got.getString(0) == want.min && got.getString(1) == want.max &&
      got.getLong(2) == want.size, s"non-key string aggregate: $got")
  }

  test("SUM/AVG push down: interior files answer from manifest sums, exact through nulls and deletes") {
    val dir = layout(4000, 25.0)
    face(dir, "aggsum")
    // z = i * 1.0 (integral-valued doubles): file-partial → merge
    // association is bit-exact, so equality against Spark's own
    // single-pass truth is a fair assertion
    // stats-served leg: z carries `zs` manifest sums (a per-file
    // output set is all-or-nothing, so this leg sums ONLY columns
    // with stats)
    val sql = spark.sql(
      """SELECT sum(z) AS sz, avg(z) AS az, count(*) AS n
        |FROM aggsum WHERE x >= 0 AND x < 400 AND y >= 0 AND y < 400"""
        .stripMargin)
    assert(scanOf(sql).isInstanceOf[GraftAggScan], "SUM/AVG was not pushed")
    val want = truth(dir)
      .filter($"x" >= 0 && $"x" < 400 && $"y" >= 0 && $"y" < 400)
      .agg(sum("z").as("sz"), avg("z").as("az"), count("*").as("n"))
    assert(sql.collect().toSeq == want.collect().toSeq)
    val (answered, scanned) = GraftSource.lastAggPlan.get(dir)
    assert(answered > 0, "no file served its SUM from the manifest stats")
    assert(scanned < spark.read.parquet(dir).inputFiles.length)
    // a stat-less column (id): the pushed fold computes it exactly
    // (long sum), every candidate file scanning
    val sqlId = spark.sql(
      """SELECT sum(id) AS sid FROM aggsum
        |WHERE x >= 0 AND x < 400 AND y >= 0 AND y < 400""".stripMargin)
    assert(scanOf(sqlId).isInstanceOf[GraftAggScan])
    val wantId = truth(dir)
      .filter($"x" >= 0 && $"x" < 400 && $"y" >= 0 && $"y" < 400)
      .agg(sum("id").as("sid"))
    assert(sqlId.collect().toSeq == wantId.collect().toSeq)
    // null values: sum/avg skip them on both the stats side (an
    // all-null file contributes SQL-null) and the fold side
    GeoParquet.appendWithManifest(Seq(
      (930001L, 10.0, 10.0, Option.empty[Double]),
      (930002L, 11.0, 11.0, Some(7.5))).toDF("id", "x", "y", "z"),
      dir, 250.0)
    val sql2 = spark.sql(
      """SELECT sum(z) AS sz, count(z) AS nz FROM aggsum
        |WHERE x >= 0 AND x < 400 AND y >= 0 AND y < 400""".stripMargin)
    val want2 = truth(dir)
      .filter($"x" >= 0 && $"x" < 400 && $"y" >= 0 && $"y" < 400)
      .agg(sum("z").as("sz"), count("z").as("nz"))
    assert(sql2.collect().toSeq == want2.collect().toSeq)
    // pending deletes: doomed files boundary-scan with the dead
    // positions excluded from the fold — a leaked doomed value skews
    // the sum and fails here
    GeoParquet.deleteWhere(spark, dir, col("id") % 10 === 3)
    assert(GeoParquet.pendingPositional(spark, dir).nonEmpty)
    val sql3 = spark.sql(
      """SELECT sum(id) AS sid, count(*) AS n FROM aggsum
        |WHERE x >= 0 AND x < 400 AND y >= 0 AND y < 400""".stripMargin)
    assert(scanOf(sql3).isInstanceOf[GraftAggScan],
      "SUM must stay pushed under pending positional deletes")
    val want3 = truth(dir).filter($"id" % 10 =!= 3)
      .filter($"x" >= 0 && $"x" < 400 && $"y" >= 0 && $"y" < 400)
      .agg(sum("id").as("sid"), count("*").as("n"))
    assert(sql3.collect().toSeq == want3.collect().toSeq)
  }

  test("a stale manifest degrades to scanning every file, still exact") {
    val dir = layout(800, 25.0)
    // plain append bumps the epoch without manifest stats → stale
    GeoParquet.append(
      Seq((930001L, 10.0, 10.0, 7.0)).toDF("id", "x", "y", "z"), dir, 250.0)
    face(dir, "aggstale")
    val sql = spark.sql(
      "SELECT count(*) AS n, max(z) AS zmax FROM aggstale WHERE x >= 0 AND x < 400")
    assert(scanOf(sql).isInstanceOf[GraftAggScan])
    val want = spark.read.option("recursiveFileLookup", "true").parquet(dir)
      .filter($"x" >= 0 && $"x" < 400)
      .agg(count("*").as("n"), max("z").as("zmax"))
    assert(sql.collect().toSeq == want.collect().toSeq)
    val (answered, _) = GraftSource.lastAggPlan.get(dir)
    assert(answered == 0, "stale manifest must answer nothing")
  }

  test("fully-pushed numeric filters leave no Filter node above the scan") {
    val dir = layout(1000, 25.0)
    face(dir, "aggplan")
    val q = spark.sql(
      "SELECT id, z FROM aggplan WHERE x >= 0 AND x < 300 AND y >= 0 AND y < 300")
    val hasFilter = allNodes(q.queryExecution.executedPlan).exists {
      case _: org.apache.spark.sql.execution.FilterExec => true
      case _ => false
    }
    assert(!hasFilter, "numeric filters are exact at the source — " +
      "Spark must not re-apply them:\n" + q.queryExecution.executedPlan)
    // and the rows are exactly the predicate's
    val want = truth(dir)
      .filter($"x" >= 0 && $"x" < 300 && $"y" >= 0 && $"y" < 300)
      .select("id", "z")
    assert(q.exceptAll(want).count() == 0 && want.exceptAll(q).count() == 0)
    assert(q.count() > 0)
  }

  test("filters on pruned-away columns still apply exactly") {
    val dir = layout(1000, 25.0)
    face(dir, "aggproj")
    // x/y filtered but only id projected — the reader must decode
    // the filter columns anyway
    val q = spark.sql(
      "SELECT id FROM aggproj WHERE x >= 100 AND x < 200 AND y >= 100 AND y < 200")
    val want = truth(dir)
      .filter($"x" >= 100 && $"x" < 200 && $"y" >= 100 && $"y" < 200)
      .select("id")
    assert(q.exceptAll(want).count() == 0 && want.exceptAll(q).count() == 0)
    assert(q.count() > 0)
  }
}
