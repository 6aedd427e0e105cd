package graft

import org.apache.spark.sql.functions._

import graft.sources.GeoParquet
import graft.sources.v2.{GraftCatalog, GraftSource}

/** Named-table SQL over layouts: the `GraftCatalog` TableCatalog maps
  * `<catalog>.<namespace>.<table>` onto warehouse layout directories —
  * SELECTs get the SQL face's pruning/pushdown, INSERT INTO its locked
  * appends, and the lifecycle verbs the catalog cannot own refuse
  * with directions.
  */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  private lazy val warehouse: String = {
    val w = java.nio.file.Files.createTempDirectory("graftwh").toString
    spark.conf.set("spark.sql.catalog.lake", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.lake.warehouse", w)
    w
  }

  private def pts(from: Int, until: Int) =
    (from until until).map { i =>
      (i.toLong, (i % 50) * 25.0, (i % 37) * 25.0, i * 1.0)
    }.toDF("id", "x", "y", "z")

  private def mkLayout(ns: String, tbl: String, n: Int): String = {
    val dir = s"$warehouse/$ns/$tbl"
    GeoParquet.write(pts(0, n), dir, 250.0)
    GeoParquet.writeManifest(spark, dir)
    dir
  }

  test("SELECT by name, pruned and aggregate-pushed") {
    val dir = mkLayout("ice", "atl06", 2000)
    val n = spark.sql(
      "SELECT count(*) AS n FROM lake.ice.atl06 WHERE x >= 0 AND x < 400 AND y >= 0 AND y < 400")
      .collect()(0).getLong(0)
    val want = spark.read.parquet(dir)
      .filter($"x" >= 0 && $"x" < 400 && $"y" >= 0 && $"y" < 400).count()
    assert(n == want && n > 0)
    // the aggregate was manifest-answered, not scanned wholesale
    val (answered, scanned) = GraftSource.lastAggPlan.get(dir)
    assert(answered > 0)
    assert(scanned < spark.read.parquet(dir).inputFiles.length)
  }

  test("two named layouts JOIN in one SQL query") {
    mkLayout("ice", "a", 1200)
    mkLayout("ice", "b", 1200)
    val joined = spark.sql(
      """SELECT a.id, a.z AS za, b.z AS zb
        |FROM lake.ice.a a JOIN lake.ice.b b ON a.id = b.id
        |WHERE a.x >= 0 AND a.x < 300 AND b.x >= 0 AND b.x < 300
        |ORDER BY a.id""".stripMargin)
    assert(joined.count() > 0)
    assert(joined.select("za").exceptAll(joined.select("zb")).count() == 0)
  }

  test("INSERT INTO a named layout appends through the locked path") {
    val dir = mkLayout("ice", "grow", 500)
    spark.sql(
      "INSERT INTO lake.ice.grow SELECT id + 700000, x + 2.0, y + 2.0, z FROM lake.ice.grow WHERE id < 20")
    assert(spark.sql("SELECT count(*) AS n FROM lake.ice.grow")
      .collect()(0).getLong(0) == 520)
    // manifest stayed fresh: a pruned read opens a subset
    spark.sql("SELECT id FROM lake.ice.grow WHERE x >= 0 AND x < 200 AND y >= 0 AND y < 200").collect()
    assert(GraftSource.lastPlannedFiles.get(dir).size <
      spark.read.parquet(dir).inputFiles.length)
  }

  test("SHOW NAMESPACES / SHOW TABLES list the warehouse") {
    mkLayout("sea", "tides", 100)
    val ns = spark.sql("SHOW NAMESPACES IN lake").collect().map(_.getString(0))
    assert(ns.contains("sea"), ns.mkString(","))
    val ts = spark.sql("SHOW TABLES IN lake.sea").collect().map(_.getString(1))
    assert(ts.contains("tides"), ts.mkString(","))
  }

  test("time travel by name") {
    val dir = mkLayout("ice", "hist", 600)
    GeoParquet.appendWithManifest(pts(600, 900), dir, 250.0)
    assert(spark.sql("SELECT count(*) AS n FROM lake.ice.hist")
      .collect()(0).getLong(0) == 900)
    assert(spark.sql("SELECT count(*) AS n FROM lake.ice.hist VERSION AS OF 0")
      .collect()(0).getLong(0) == 600)
  }

  test("time travel by wall clock (TIMESTAMP AS OF)") {
    val dir = mkLayout("ice", "thist", 600)
    Thread.sleep(30)
    val mid = System.currentTimeMillis() // between creation and append
    Thread.sleep(30)
    GeoParquet.appendWithManifest(pts(600, 900), dir, 250.0)
    // a wall time before the append resolves to the creation commit
    assert(spark.sql("SELECT count(*) AS n FROM lake.ice.thist " +
        s"TIMESTAMP AS OF timestamp_millis(${mid}L)")
      .collect()(0).getLong(0) == 600)
    // a wall time after every commit serves the full present
    val now = System.currentTimeMillis() + 500
    assert(spark.sql("SELECT count(*) AS n FROM lake.ice.thist " +
        s"TIMESTAMP AS OF timestamp_millis(${now}L)")
      .collect()(0).getLong(0) == 900)
    // the path face's twin: .option("snapshotTime", <wall-ms>)
    assert(spark.read.format("graft")
      .option("snapshotTime", mid.toString).load(dir).count() == 600)
    // before anything existed: refuse loudly, never guess an epoch
    val e = intercept[Throwable] {
      spark.sql("SELECT count(*) AS n FROM lake.ice.thist " +
        "TIMESTAMP AS OF timestamp_millis(1000L)").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("predates")), msgs(e).mkString(" | "))
  }

  test("CALL system.history lists stamped commits; times resolve back via TIMESTAMP AS OF") {
    val dir = mkLayout("ops", "hist2", 300)
    Thread.sleep(5)
    GeoParquet.appendWithManifest(pts(300, 400), dir, 250.0)
    val r = spark.sql("CALL lake.system.history('ops.hist2')").collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(0L, 1L), r.mkString(","))
    val times = r.map(_.getLong(1))
    assert(times(0) < times(1), "commit times must be monotone here")
    assert(times.forall(t => math.abs(t - System.currentTimeMillis()) < 600000))
    // the manifest inventory rides along: file/row counts per epoch
    assert(r.map(_.getLong(4)).sum == 400, r.mkString(","))
    // each stamped time resolves back to its own epoch
    assert(GeoParquet.epochAtTime(spark, dir, times(0)) == 0L)
    assert(GeoParquet.epochAtTime(spark, dir, times(1)) == 1L)
  }

  test("CALL system.rebuild_manifest repairs a staled layout from SQL") {
    val dir = mkLayout("ops", "repair", 400)
    // a plain append (no manifest maintenance) stales the sidecar
    GeoParquet.append(pts(400, 450), dir, 250.0)
    val r = spark.sql("CALL lake.system.rebuild_manifest('ops.repair')").collect()
    assert(r.length == 1 && r(0).getString(1) == "rebuilt")
    // pruned reads are back: a box read opens a strict subset again
    spark.sql("SELECT id FROM lake.ops.repair WHERE x >= 0 AND x < 200 AND y >= 0 AND y < 200").collect()
    assert(GraftSource.lastPlannedFiles.get(dir).size <
      spark.read.parquet(dir).inputFiles.length)
    assert(spark.sql("SELECT count(*) AS n FROM lake.ops.repair")
      .collect()(0).getLong(0) == 450)
  }

  test("CALL system.expire + compact + vacuum run the retention lifecycle") {
    val dir = mkLayout("ops", "ttl", 300)
    // give rows a time axis: rebuild the layout with t
    val withT = (0 until 300).map { i =>
      (i.toLong, (i % 50) * 25.0, (i % 37) * 25.0, i * 1.0,
        1700000000000L + i * 1000L)
    }.toDF("id", "x", "y", "z", "t")
    GeoParquet.write(withT, dir, 250.0)
    GeoParquet.writeManifest(spark, dir)
    val cutoff = 1700000000000L + 100 * 1000L
    spark.sql(s"CALL lake.system.expire('ops.ttl', ${cutoff}L)").collect()
    // merge-on-read deletes pending → compact reclaims, face readable again
    spark.sql("CALL lake.system.compact('ops.ttl')").collect()
    spark.sql("CALL lake.system.vacuum('ops.ttl')").collect()
    assert(spark.sql("SELECT count(*) AS n FROM lake.ops.ttl")
      .collect()(0).getLong(0) == 200)
  }

  test("CALL system.snapshots inventories commit history from SQL") {
    val dir = mkLayout("ops", "hist2", 500)
    GeoParquet.appendWithManifest(pts(500, 700), dir, 250.0)
    val snaps = spark.sql("CALL lake.system.snapshots('ops.hist2')")
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(snaps.map(_._2).sum == 700, snaps.mkString(","))
    assert(snaps.length >= 2, "two commits must inventory two epochs")
  }

  test("CALL system.rollback_to: bad commits undone, reads equal the pinned past, history shows the gap") {
    val dir = mkLayout("ops", "rb", 400)                        // epoch 0
    GeoParquet.appendWithManifest(pts(400, 500), dir, 250.0)    // epoch 1 (good)
    GeoParquet.appendWithManifest(pts(1000, 1100), dir, 250.0)  // epoch 2 (bad)
    GeoParquet.deleteWhere(spark, dir, col("id") < 10)          // epoch 3 (bad)
    assert(spark.sql("SELECT count(*) AS n FROM lake.ops.rb")
      .collect()(0).getLong(0) == 590) // bad state visible pre-rollback
    val r = spark.sql("CALL lake.system.rollback_to('ops.rb', 1)").collect()
    assert(r(0).getString(1).contains("rolled back"))
    // the present equals the pinned past: the bad append's rows are
    // gone AND the bad delete's rows are restored
    val ids = spark.sql("SELECT id FROM lake.ops.rb ORDER BY id")
      .collect().map(_.getLong(0))
    assert(ids.toSeq == (0L until 500L), s"rollback state wrong: ${ids.length} rows")
    // pre-target history still serves AS-OF exactly as before
    assert(spark.sql("SELECT count(*) AS n FROM lake.ops.rb VERSION AS OF 0")
      .collect()(0).getLong(0) == 400)
    // history shows the rollback: the undone epochs stay stamped but
    // carry no surviving files
    val hist = spark.sql("CALL lake.system.history('ops.rb')").collect()
      .map(r2 => (r2.getLong(0), if (r2.isNullAt(3)) None else Some(r2.getLong(3))))
      .toMap
    assert(hist.contains(2L) && hist(2L).isEmpty,
      s"rolled-back epoch 2 must show as stamped-but-empty: $hist")
    assert(hist(1L).nonEmpty, "surviving epoch lost its inventory")
    // the commit counter is NOT reset: the next append claims a fresh
    // epoch — no changelog range ever silently means different data
    GeoParquet.appendWithManifest(pts(600, 650), dir, 250.0)
    assert(GeoParquet.readEpoch(spark, dir) == 4L,
      s"epoch reuse after rollback: ${GeoParquet.readEpoch(spark, dir)}")
    assert(spark.sql("SELECT count(*) AS n FROM lake.ops.rb")
      .collect()(0).getLong(0) == 550)
    // refusal across history resets, exactly like AS-OF
    GeoParquet.compact(spark, dir)
    GeoParquet.writeManifest(spark, dir)
    val ex = intercept[Exception] {
      spark.sql("CALL lake.system.rollback_to('ops.rb', 1)").collect()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + msgs(t.getCause)
    assert(msgs(ex).contains("was reset"),
      s"rollback across a compaction reset must refuse: ${msgs(ex)}")
  }

  test("DELETE FROM: merge-on-read everywhere, compact reclaims") {
    val dir = mkLayout("ops", "del", 400)
    spark.sql("DELETE FROM lake.ops.del WHERE id < 50 OR id >= 380")
    // deletes are merge-on-read: API reads subtract immediately...
    assert(GeoParquet.readMerged(spark, dir).count() == 330)
    // ...and so do SQL reads (count(*) degrades from the manifest
    // shortcut to the subtracting row scan)
    assert(spark.sql("SELECT count(*) AS n FROM lake.ops.del")
      .collect()(0).getLong(0) == 330)
    spark.sql("CALL lake.system.compact('ops.del')").collect()
    assert(spark.sql("SELECT count(*) AS n FROM lake.ops.del")
      .collect()(0).getLong(0) == 330)
    assert(spark.sql("SELECT count(*) AS n FROM lake.ops.del WHERE id < 50")
      .collect()(0).getLong(0) == 0)
  }

  test("unknown procedures name the available ones") {
    val e = intercept[Throwable] {
      spark.sql("CALL lake.system.optimize('ops.ttl')").collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else String.valueOf(t.getMessage) +: chain(t.getCause)
    assert(chain(e).exists(_.contains("rebuild_manifest")), chain(e).mkString(" | "))
  }

  test("CREATE TABLE → INSERT → rebuild_manifest → pruned SELECT, all from SQL") {
    spark.sql(
      """CREATE TABLE lake.ddl.fresh (id BIGINT, x DOUBLE, y DOUBLE, z DOUBLE)
        |USING graft TBLPROPERTIES('delta'='250.0')""".stripMargin)
    // empty table reads as empty, not as an error
    assert(spark.sql("SELECT count(*) AS n FROM lake.ddl.fresh")
      .collect()(0).getLong(0) == 0)
    pts(0, 800).createOrReplaceTempView("ddl_src")
    spark.sql("INSERT INTO lake.ddl.fresh SELECT id, x, y, z FROM ddl_src")
    assert(spark.sql("SELECT count(*) AS n FROM lake.ddl.fresh")
      .collect()(0).getLong(0) == 800)
    spark.sql("CALL lake.system.rebuild_manifest('ddl.fresh')").collect()
    val dir = s"$warehouse/ddl/fresh"
    spark.sql("SELECT id FROM lake.ddl.fresh WHERE x >= 0 AND x < 200 AND y >= 0 AND y < 200").collect()
    assert(GraftSource.lastPlannedFiles.get(dir).size <
      spark.read.parquet(dir).inputFiles.length,
      "post-rebuild reads must prune")
    // the recorded δ drove the binning
    assert(GeoParquet.deltaOf(spark, dir).contains(250.0))
  }

  test("ALTER TABLE ADD COLUMNS declares a column ahead of its data") {
    spark.sql(
      """CREATE TABLE lake.ddl.widen (id BIGINT, x DOUBLE, y DOUBLE, z DOUBLE)
        |USING graft TBLPROPERTIES('delta'='250.0')""".stripMargin)
    pts(0, 400).createOrReplaceTempView("alter_src")
    spark.sql("INSERT INTO lake.ddl.widen SELECT id, x, y, z FROM alter_src")
    spark.sql("ALTER TABLE lake.ddl.widen ADD COLUMNS (w DOUBLE)")
    // declared-but-unpopulated reads as nulls, not as an error
    val afterAlter = spark.sql("SELECT id, w FROM lake.ddl.widen").collect()
    assert(afterAlter.length == 400 && afterAlter.forall(_.isNullAt(1)))
    // the next INSERT populates it; earlier rows stay null
    spark.sql(
      "INSERT INTO lake.ddl.widen SELECT id + 1000, x, y, z, z * 2 AS w FROM alter_src")
    assert(spark.sql(
      "SELECT count(*) AS n FROM lake.ddl.widen WHERE w IS NOT NULL")
      .collect()(0).getLong(0) == 400)
    assert(spark.sql("SELECT count(*) AS n FROM lake.ddl.widen")
      .collect()(0).getLong(0) == 800)
    // data-rewriting ALTERs refuse and point at the supported verb
    def chain(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else String.valueOf(t.getMessage) +: chain(t.getCause)
    val e = intercept[Throwable] {
      spark.sql("ALTER TABLE lake.ddl.widen DROP COLUMN z")
    }
    assert(chain(e).exists(_.contains("ADD COLUMNS")), chain(e).mkString(" | "))
    val dup = intercept[Throwable] {
      spark.sql("ALTER TABLE lake.ddl.widen ADD COLUMNS (z DOUBLE)")
    }
    assert(chain(dup).exists(_.contains("already exists")), chain(dup).mkString(" | "))
  }

  test("DESCRIBE EXTENDED surfaces the layout's geometry and epoch") {
    mkLayout("ops", "desc", 300)
    val props = spark.sql("DESCRIBE TABLE EXTENDED lake.ops.desc")
      .filter("col_name = 'Table Properties'")
      .collect().map(_.getString(1)).mkString
    assert(props.contains("delta=250.0"), props)
    assert(props.contains("epoch="), props)
  }

  test("unknown tables and refused verbs error helpfully") {
    intercept[Throwable] { spark.sql("SELECT * FROM lake.ice.nope").collect() }
    val e = intercept[Throwable] {
      spark.sql("CREATE TABLE lake.ice.fresh (id BIGINT, x DOUBLE, y DOUBLE) USING graft")
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else String.valueOf(t.getMessage) +: chain(t.getCause)
    assert(chain(e).exists(_.contains("clustering")), chain(e).mkString(" | "))
  }

  test("CREATE TABLE with 'filters' declares membership filters maintained from the first INSERT") {
    spark.sql(
      """CREATE TABLE lake.ice.filtered (id BIGINT, x DOUBLE, y DOUBLE, z DOUBLE)
        |USING graft TBLPROPERTIES('delta'='250.0', 'filters'='id')"""
        .stripMargin)
    val dir = s"$warehouse/ice/filtered"
    assert(GeoParquet.filterColsOf(spark, dir) == Seq("id"),
      "the DDL filter declaration was not recorded")
    pts(0, 2000).createOrReplaceTempView("filt_src")
    spark.sql("INSERT INTO lake.ice.filtered SELECT id, x, y, z FROM filt_src")
    spark.sql("CALL lake.system.rebuild_manifest('ice.filtered')").collect()
    // the manifest carries the id membership filter and an id point
    // probe opens fewer files than the layout holds
    assert(spark.read.parquet(s"$dir/_manifest").columns
      .contains("id_bloom"), "no membership filter in the manifest")
    val r = spark.sql(
      "SELECT id FROM lake.ice.filtered WHERE id IN (3, 777)")
      .as[Long].collect().sorted.toSeq
    assert(r == Seq(3L, 777L))
    assert(graft.sources.v2.GraftSource.lastPlannedFiles.get(dir).size <
      spark.read.parquet(dir).inputFiles.length,
      "the DDL-declared membership filter did not prune the point probe")
    // an unknown filter column refuses at CREATE
    val e = intercept[Throwable] {
      spark.sql(
        """CREATE TABLE lake.ice.badfilt (id BIGINT, x DOUBLE, y DOUBLE)
          |USING graft TBLPROPERTIES('delta'='250.0', 'filters'='nope')"""
          .stripMargin)
    }
    assert(String.valueOf(e.getMessage).contains("not in the declared schema"))
  }

  test("CREATE TABLE with 'curve' declares a curve-clustered layout; INSERTs key-sort and manifest ranges") {
    spark.sql("""CREATE TABLE lake.ice.curved (id BIGINT, x DOUBLE, y DOUBLE, z DOUBLE)
                |USING graft TBLPROPERTIES('delta'='250.0', 'curve'='hilbert')""".stripMargin)
    val dir = s"$warehouse/ice/curved"
    assert(GeoParquet.isCurveLayout(spark, dir), "k0/k1-less manifest: not a curve layout")
    assert(spark.sql("SELECT count(*) AS n FROM lake.ice.curved")
      .collect()(0).getLong(0) == 0)
    // two SQL INSERTs — each dispatches to appendCurve (key computed
    // at the recorded δ) and manifests its [k0,k1] range immediately
    pts(0, 600).createOrReplaceTempView("curve_src_a")
    pts(600, 1000).createOrReplaceTempView("curve_src_b")
    spark.sql("INSERT INTO lake.ice.curved SELECT id, x, y, z FROM curve_src_a")
    spark.sql("INSERT INTO lake.ice.curved SELECT id, x, y, z FROM curve_src_b")
    val m = spark.read.parquet(s"$dir/_manifest")
    assert(m.count() >= 2 && m.filter(col("k0").isNull).count() == 0,
      "an INSERT landed without its curve-key range")
    // data files are internally key-sorted and carry the key column
    assert(spark.read.parquet(dir).columns.contains("hkey"))
    // rebuild adds envelope stats; the curve reader prunes and agrees
    spark.sql("CALL lake.system.rebuild_manifest('ice.curved')").collect()
    val got = GeoParquet.queryBoxCurve(spark, dir, (0.0, 400.0), (0.0, 400.0), 250.0)
      .select("id").as[Long].collect().sorted.toSeq
    val want = (0 until 1000).filter { i =>
      val x = (i % 50) * 25.0; val y = (i % 37) * 25.0
      x >= 0 && x < 400 && y >= 0 && y < 400
    }.map(_.toLong)
    assert(got == want, s"curve read diverged: ${got.length} vs ${want.length}")
    // and the SQL face agrees
    assert(spark.sql(
      """SELECT count(*) AS n FROM lake.ice.curved
        |WHERE x >= 0 AND x < 400 AND y >= 0 AND y < 400""".stripMargin)
      .collect()(0).getLong(0) == want.length)
    // a bogus curve kind refuses with directions
    val e = intercept[Throwable] {
      spark.sql("""CREATE TABLE lake.ice.badcurve (id BIGINT, x DOUBLE, y DOUBLE)
                  |USING graft TBLPROPERTIES('delta'='250.0', 'curve'='peano')""".stripMargin)
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else String.valueOf(t.getMessage) +: chain(t.getCause)
    assert(chain(e).exists(_.contains("hilbert")), chain(e).mkString(" | "))
  }

  test("CREATE TABLE with 'key' declares a keyed CDC table; create/ingest/mutate/probe all from SQL") {
    spark.sql("""CREATE TABLE lake.ice.cdc (tenant BIGINT, id BIGINT, v DOUBLE)
                |USING graft TBLPROPERTIES('key'='tenant,id')""".stripMargin)
    val dir = s"$warehouse/ice/cdc"
    assert(GeoParquet.isCurveLayout(spark, dir), "keyed manifest carries no k0")
    // the empty table reads as empty and strips the physical key column
    assert(spark.sql("SELECT count(*) AS n FROM lake.ice.cdc")
      .collect()(0).getLong(0) == 0)
    assert(spark.table("lake.ice.cdc").columns.toSeq == Seq("tenant", "id", "v"))
    def src(t0: Int, t1: Int) = (0 until 400)
      .map(i => (i % 10L, i.toLong, i * 1.0))
      .filter(r => r._1 >= t0 && r._1 < t1).toDF("tenant", "id", "v")
    src(0, 5).createOrReplaceTempView("cdc_src_a")
    src(5, 10).createOrReplaceTempView("cdc_src_b")
    spark.sql("INSERT INTO lake.ice.cdc SELECT tenant, id, v FROM cdc_src_a")
    spark.sql("INSERT INTO lake.ice.cdc SELECT tenant, id, v FROM cdc_src_b")
    // each INSERT manifested a struct-typed DATA-key range (the
    // mirror — not a spatial curve key; there is no x/y anywhere)
    val m0 = spark.read.parquet(s"$dir/_manifest")
      .select(col("k0.tenant").as[Long], col("k1.tenant").as[Long]).collect()
    assert(m0.length == 2 && m0.toSet == Set((0L, 4L), (5L, 9L)),
      s"keyed INSERTs manifested wrong leading-key ranges: ${m0.toSeq}")
    // SQL UPDATE: row-level delta commit routes through the keyed
    // append — re-inserted rows keep the key mirror
    spark.sql("UPDATE lake.ice.cdc SET v = v + 100.0 WHERE tenant = 7 AND id < 200")
    // SQL DELETE: merge-on-read tombstones compose on the same table
    spark.sql("DELETE FROM lake.ice.cdc WHERE tenant = 3 AND id < 100")
    val total = spark.read.parquet(s"$dir/_manifest").count()
    def probe(t: Int): Seq[(Long, Long, Double)] = {
      val rows = spark.sql(
        s"SELECT tenant, id, v FROM lake.ice.cdc WHERE tenant = $t ORDER BY id")
        .as[(Long, Long, Double)].collect().toSeq
      val planned = GraftSource.lastPlannedFiles.get(dir).size
      assert(planned < total,
        s"tenant=$t planned $planned of $total files — composite prune dead")
      rows
    }
    val want7 = (0 until 400).filter(_ % 10 == 7)
      .map(i => (7L, i.toLong, if (i < 200) i + 100.0 else i * 1.0))
    assert(probe(7) == want7, "post-UPDATE read diverged")
    val want3 = (0 until 400).filter(i => i % 10 == 3 && i >= 100)
      .map(i => (3L, i.toLong, i * 1.0))
    assert(probe(3) == want3, "post-DELETE read diverged")
    // MERGE INTO composes on the same table (the full CDC verb set):
    // a matched update and a brand-new tenant, one statement
    Seq((7L, 7L, 9999.0), (12L, 9999L, 1.0)).toDF("tenant", "id", "v")
      .createOrReplaceTempView("cdc_merge_src")
    spark.sql("""MERGE INTO lake.ice.cdc t USING cdc_merge_src s
                |ON t.tenant = s.tenant AND t.id = s.id
                |WHEN MATCHED THEN UPDATE SET v = s.v
                |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.sql(
        "SELECT v FROM lake.ice.cdc WHERE tenant = 7 AND id = 7")
      .as[Double].collect().toSeq == Seq(9999.0), "MERGE matched-update lost")
    assert(spark.sql(
        "SELECT count(*) AS n FROM lake.ice.cdc WHERE tenant = 12")
      .collect()(0).getLong(0) == 1, "MERGE not-matched insert lost")
    // geometry contradictions and bad keys refuse with directions
    def chain(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else String.valueOf(t.getMessage) +: chain(t.getCause)
    val eDelta = intercept[Throwable] {
      spark.sql("""CREATE TABLE lake.ice.kbad1 (id BIGINT)
                  |USING graft TBLPROPERTIES('key'='id', 'delta'='250.0')""".stripMargin)
    }
    assert(chain(eDelta).exists(_.contains("omit 'delta'")), chain(eDelta).mkString(" | "))
    val eCurve = intercept[Throwable] {
      spark.sql("""CREATE TABLE lake.ice.kbad2 (id BIGINT)
                  |USING graft TBLPROPERTIES('key'='id', 'curve'='z')""".stripMargin)
    }
    assert(chain(eCurve).exists(_.contains("exclusive")), chain(eCurve).mkString(" | "))
    val eMissing = intercept[Throwable] {
      spark.sql("""CREATE TABLE lake.ice.kbad3 (id BIGINT)
                  |USING graft TBLPROPERTIES('key'='nope')""".stripMargin)
    }
    assert(chain(eMissing).exists(_.contains("not in the declared schema")),
      chain(eMissing).mkString(" | "))
    val eType = intercept[Throwable] {
      spark.sql("""CREATE TABLE lake.ice.kbad4 (id BIGINT, v DOUBLE)
                  |USING graft TBLPROPERTIES('key'='v')""".stripMargin)
    }
    assert(chain(eType).exists(_.contains("integral or string")),
      chain(eType).mkString(" | "))
  }

  test("DROP TABLE lifecycle: refuse non-empty, PURGE deletes data + debris, empty drops plain") {
    val dir = mkLayout("ice", "droppable", 600)
    // crash debris siblings a purge must sweep with the layout
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir + ".staging-deadbeef"))
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir + ".pre-compact"))
    // a data-bearing table refuses the plain DROP and names PURGE
    val e = intercept[Throwable] { spark.sql("DROP TABLE lake.ice.droppable") }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else String.valueOf(t.getMessage) +: chain(t.getCause)
    assert(chain(e).exists(_.contains("PURGE")), chain(e).mkString(" | "))
    assert(fs.exists(new org.apache.hadoop.fs.Path(dir)), "refused DROP deleted data")
    // PURGE retires it deliberately: directory, debris, listing entry
    spark.sql("DROP TABLE lake.ice.droppable PURGE")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir)))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + ".staging-deadbeef")),
      "purge left crash debris behind")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + ".pre-compact")))
    assert(!spark.sql("SHOW TABLES IN lake.ice").collect()
      .map(_.getString(1)).contains("droppable"))
    // an EMPTY (CREATE TABLE-shaped) layout drops without PURGE — the
    // create → retire lifecycle a SQL scheduler runs
    spark.sql("""CREATE TABLE lake.ice.scratch (id BIGINT, x DOUBLE, y DOUBLE)
                |USING graft TBLPROPERTIES('delta'='250.0')""".stripMargin)
    assert(spark.sql("SELECT count(*) AS n FROM lake.ice.scratch")
      .collect()(0).getLong(0) == 0)
    spark.sql("DROP TABLE lake.ice.scratch")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$warehouse/ice/scratch")))
  }
}
