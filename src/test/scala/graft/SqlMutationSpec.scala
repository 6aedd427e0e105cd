package graft

import org.apache.spark.sql.functions._

import graft.sources.GeoParquet
import graft.sources.v2.GraftCatalog

/** Delta-based SQL mutations: UPDATE / MERGE INTO / rewritten DELETE
  * route matched rows into positional tombstones + appended
  * replacements (the upsertPositional commit shape), staged by
  * executors and committed under the layout lock.  Reads are
  * merge-on-read on every path — API and SQL subtract pending
  * positional deletes immediately (no compact needed to read your
  * writes); `CALL system.compact` reclaims when scheduled.
  */
class SqlMutationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val warehouse: String = {
    val w = java.nio.file.Files.createTempDirectory("graftmut").toString
    spark.conf.set("spark.sql.catalog.mut", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.mut.warehouse", w)
    w
  }

  private def pts(from: Int, until: Int) =
    (from until until).map { i =>
      (i.toLong, (i % 50) * 25.0, (i % 37) * 25.0, i * 1.0)
    }.toDF("id", "x", "y", "z")

  private def mkLayout(tbl: String, n: Int): String = {
    val dir = s"$warehouse/ns/$tbl"
    GeoParquet.write(pts(0, n), dir, 250.0)
    GeoParquet.writeManifest(spark, dir)
    dir
  }

  test("_gfile/_gpos metadata columns match the parquet row addresses") {
    val dir = mkLayout("meta", 1000)
    val got = spark.sql("SELECT id, _gfile, _gpos FROM mut.ns.meta").collect()
    assert(got.length == 1000)
    // the exact convention the positional tombstones use: root-relative
    // file path + Spark's own _metadata.row_index
    val want = spark.read.parquet(dir)
      .select($"id", col("_metadata.file_path").as("fp"),
        col("_metadata.row_index").as("pos"))
      .as[(Long, String, Long)].collect()
      .map { case (id, fp, pos) =>
        id -> ((fp.substring(fp.indexOf(dir) + dir.length + 1), pos))
      }.toMap
    got.foreach { r =>
      assert(want(r.getLong(0)) == ((r.getString(1), r.getLong(2))),
        s"row ${r.getLong(0)}: got (${r.getString(1)}, ${r.getLong(2)})")
    }
  }

  test("UPDATE → compact → SELECT is the SQL mutation lifecycle") {
    val dir = mkLayout("upd", 2000)
    spark.sql("UPDATE mut.ns.upd SET z = z + 100000 WHERE id % 10 = 0")
    // API reads see the mutation immediately (pending deletes subtract)
    val api = GeoParquet.readMerged(spark, dir)
    assert(api.count() == 2000)
    assert(api.filter($"id" % 10 === 0 &&
      $"z" === $"id".cast("double") + 100000).count() == 200)
    assert(api.filter($"id" % 10 =!= 0 &&
      $"z" === $"id".cast("double")).count() == 1800)
    // SQL reads see it immediately too — merge-on-read subtraction in
    // the readers (count(*) degrades from the manifest shortcut to the
    // subtracting row scan, so it must AGREE, not refuse)
    assert(spark.sql("SELECT count(*) AS n FROM mut.ns.upd")
      .collect()(0).getLong(0) == 2000)
    assert(spark.sql(
      "SELECT count(*) AS n FROM mut.ns.upd WHERE z >= 100000")
      .collect()(0).getLong(0) == 200)
    // compaction reclaims; answers unchanged
    spark.sql("CALL mut.system.compact('ns.upd')").collect()
    assert(spark.sql(
      "SELECT count(*) AS n FROM mut.ns.upd WHERE z >= 100000")
      .collect()(0).getLong(0) == 200)
    assert(spark.sql("SELECT count(*) AS n FROM mut.ns.upd")
      .collect()(0).getLong(0) == 2000)
  }

  test("MERGE INTO upserts by key through the delta write") {
    val dir = mkLayout("mrg", 1500)
    pts(1400, 1700).withColumn("z", $"z" + 500000)
      .createOrReplaceTempView("mrg_src")
    spark.sql(
      """MERGE INTO mut.ns.mrg t USING mrg_src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET z = s.z
        |WHEN NOT MATCHED THEN INSERT (id, x, y, z)
        |  VALUES (s.id, s.x, s.y, s.z)""".stripMargin)
    val api = GeoParquet.readMerged(spark, dir)
    assert(api.count() == 1700)
    // every source key carries the shifted z exactly once
    assert(api.filter($"id" >= 1400 && $"z" < 500000).count() == 0)
    assert(api.filter($"id" >= 1400).count() == 300)
    spark.sql("CALL mut.system.compact('ns.mrg')").collect()
    assert(spark.sql(
      "SELECT count(*) AS n FROM mut.ns.mrg WHERE z >= 500000")
      .collect()(0).getLong(0) == 300)
    assert(spark.sql("SELECT count(*) AS n FROM mut.ns.mrg")
      .collect()(0).getLong(0) == 1700)
  }

  test("layout geometry survives compaction: repeat mutate/insert cycles") {
    val dir = mkLayout("again", 1200)
    GeoParquet.declareFilterCols(spark, dir, Seq("id"))
    spark.sql("UPDATE mut.ns.again SET z = z + 100000 WHERE id % 5 = 0")
    spark.sql("CALL mut.system.compact('ns.again')").collect()
    // the bin size and filter declaration must have ridden the swap —
    // without them every later sidecar-δ write (SQL INSERT, a second
    // UPDATE) refuses and membership-filter maintenance silently stops
    assert(GeoParquet.deltaOf(spark, dir).contains(250.0))
    assert(GeoParquet.filterColsOf(spark, dir) == Seq("id"))
    spark.sql("UPDATE mut.ns.again SET z = z + 100000 WHERE id % 5 = 1")
    spark.sql("CALL mut.system.compact('ns.again')").collect()
    pts(1200, 1300).createOrReplaceTempView("again_src")
    spark.sql("INSERT INTO mut.ns.again SELECT id, x, y, z FROM again_src")
    assert(spark.sql("SELECT count(*) AS n FROM mut.ns.again")
      .collect()(0).getLong(0) == 1300)
    assert(spark.sql(
      "SELECT count(*) AS n FROM mut.ns.again WHERE z >= 100000")
      .collect()(0).getLong(0) ==
      (0 until 1200).count(i => i % 5 == 0 || i % 5 == 1))
  }

  test("chained mutations without compaction: every read path subtracts") {
    val dir = mkLayout("chain", 1000)
    spark.sql("UPDATE mut.ns.chain SET z = z + 100000 WHERE id % 4 = 0")
    // the second mutation's own row-address scan runs WITH pending
    // deletes — it must subtract them or it would re-match dead rows
    spark.sql("UPDATE mut.ns.chain SET z = z + 1000000 WHERE id % 4 = 2")
    spark.sql("DELETE FROM mut.ns.chain WHERE id % 4 = 3")
    // no compact anywhere: SELECT, count(*), and the API read agree
    val r = spark.sql("SELECT id, z FROM mut.ns.chain ORDER BY id")
      .as[(Long, Double)].collect()
    assert(r.length == 750, s"${r.length} rows")
    r.foreach { case (id, z) =>
      val expect =
        if (id % 4 == 0) id + 100000.0
        else if (id % 4 == 2) id + 1000000.0
        else id * 1.0
      assert(id % 4 != 3 && z == expect, s"id=$id z=$z expected $expect")
    }
    assert(spark.sql("SELECT count(*) AS n FROM mut.ns.chain")
      .collect()(0).getLong(0) == 750)
    assert(GeoParquet.readMerged(spark, dir).count() == 750)
  }

  test("MERGE WITH SCHEMA EVOLUTION widens the target from the source") {
    val dir = mkLayout("wide", 900)
    pts(800, 1000).withColumn("grade", ($"id" % 5).cast("int"))
      .createOrReplaceTempView("wide_src")
    spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO mut.ns.wide t
        |USING wide_src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    // the new column landed via ALTER + evolution-recording append:
    // matched/inserted rows carry it, pre-merge rows read as null
    val r = spark.sql("SELECT id, grade FROM mut.ns.wide")
      .as[(Long, Option[Int])].collect().toMap
    assert(r.size == 1000)
    (0L until 800L).foreach(id => assert(r(id).isEmpty, s"id=$id"))
    (800L until 1000L).foreach(id =>
      assert(r(id).contains((id % 5).toInt), s"id=$id got ${r(id)}"))
  }

  test("MERGE with NOT MATCHED BY SOURCE deletes unmatched target rows") {
    val dir = mkLayout("bysrc", 600)
    pts(400, 800).createOrReplaceTempView("bysrc_src")
    // full sync semantics: matched update, unmatched-in-target insert,
    // unmatched-in-SOURCE delete — one statement, one commit
    spark.sql(
      """MERGE INTO mut.ns.bysrc t USING bysrc_src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET z = s.z + 100000
        |WHEN NOT MATCHED THEN INSERT *
        |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    val r = GeoParquet.readMerged(spark, dir)
      .select("id", "z").as[(Long, Double)].collect().toMap
    assert(r.size == 400, s"${r.size} rows")
    (400L until 600L).foreach(id => assert(r(id) == id + 100000.0, s"id=$id"))
    (600L until 800L).foreach(id => assert(r(id) == id.toDouble, s"id=$id"))
    // SQL face agrees (merge-on-read, no compaction)
    assert(spark.sql("SELECT count(*) AS n FROM mut.ns.bysrc")
      .collect()(0).getLong(0) == 400)
  }

  test("a localized mutation taxes only the files holding doomed rows") {
    val dir = mkLayout("local", 2000)
    spark.sql("UPDATE mut.ns.local SET z = z + 100000 WHERE x < 100")
    // full-table ROW read — sum over an EXPRESSION is not
    // agg-pushable (61z40 pushes only direct column refs), so this
    // cannot take the manifest-stats path: only the files that
    // actually contain doomed rows are flagged for the subtracting
    // reader, the rest of the layout keeps the bounded fast path
    assert(spark.sql("SELECT sum(abs(id)) AS s FROM mut.ns.local")
      .collect()(0).getLong(0) == (0L until 2000L).sum)
    val (planned, flagged) = graft.sources.v2.GraftSource.lastMorPlan.get(dir)
    assert(flagged > 0 && flagged < planned,
      s"flagged=$flagged planned=$planned")
    // count(*) takes the 61z19 agg pushdown even under the pending
    // deletes: interior files answer n_rows − doomed from the manifest
    // unopened, and the count is still exact
    assert(spark.sql("SELECT count(*) AS n FROM mut.ns.local")
      .collect()(0).getLong(0) == 2000)
    val (answered, scanned) = graft.sources.v2.GraftSource.lastAggPlan.get(dir)
    assert(answered > 0, s"answered=$answered scanned=$scanned")
    // a box disjoint from the mutation pays NO subtraction at all
    spark.sql("SELECT id FROM mut.ns.local WHERE x >= 500 AND y >= 0")
      .collect()
    val (p2, f2) = graft.sources.v2.GraftSource.lastMorPlan.get(dir)
    assert(p2 > 0 && f2 == 0, s"flagged=$f2 planned=$p2")
  }

  test("overlapping DELETE after UPDATE never re-dooms dead rows") {
    val dir = mkLayout("redoom", 1200)
    spark.sql("UPDATE mut.ns.redoom SET z = z + 100000 WHERE id < 300")
    // this DELETE's predicate also matches the old copies the UPDATE
    // already doomed — the harvest must come from the merged view, or
    // each old copy is tombstoned AGAIN under a new epoch and any
    // consumer counting per-file doomed rows over-subtracts
    spark.sql("DELETE FROM mut.ns.redoom WHERE id < 150")
    // the sidecar holds no duplicate (file, pos) addresses
    val addrs = spark.read.parquet(s"$dir/_tombstones_pos")
      .select("file", "pos")
    assert(addrs.count() == addrs.distinct().count(),
      "duplicate positional tombstone addresses")
    // 61z19 agg pushdown (manifest n_rows − doomed) stays exact
    assert(spark.sql("SELECT count(*) AS n FROM mut.ns.redoom")
      .collect()(0).getLong(0) == 1050)
    val (answered, scanned) = graft.sources.v2.GraftSource.lastAggPlan.get(dir)
    assert(answered > 0, s"answered=$answered scanned=$scanned")
    // row paths agree, API and SQL
    assert(GeoParquet.readMerged(spark, dir).count() == 1050)
    assert(spark.sql("SELECT id FROM mut.ns.redoom").collect().length == 1050)
  }

  test("two concurrent SQL UPDATEs on disjoint keys: both land, no row lost") {
    val dir = mkLayout("race", 800)
    def inThread(body: => Unit) = {
      val err = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val t = new Thread(() => try body catch { case e: Throwable => err.set(e) })
      t.start(); (t, err)
    }
    // each statement scans + stages outside the lock and commits under
    // it — the writer-vs-writer contention CommitContentionSpec pins
    // for the API merge, exercised through the SQL face end to end
    val (t1, e1) = inThread {
      spark.sql("UPDATE mut.ns.race SET z = z + 10000 WHERE id < 200")
    }
    val (t2, e2) = inThread {
      spark.sql("UPDATE mut.ns.race SET z = z + 20000 WHERE id >= 600")
    }
    t1.join(300000); t2.join(300000)
    Seq(e1, e2).foreach(e => if (e.get() != null) throw e.get())
    val r = GeoParquet.readMerged(spark, dir)
      .select("id", "z").as[(Long, Double)].collect()
    assert(r.length == 800, s"${r.length} rows — duplicate or lost keys")
    assert(r.map(_._1).distinct.length == 800)
    r.foreach { case (id, z) =>
      val expect =
        if (id < 200) id + 10000.0
        else if (id >= 600) id + 20000.0
        else id * 1.0
      assert(z == expect, s"id=$id z=$z expected $expect")
    }
  }

  test("non-translatable DELETE rewrites through the delta path") {
    val dir = mkLayout("del", 1000)
    // `id % 7 = 0` has no v1 Filter form — before row-level support
    // this refused; now it rewrites to positional tombstones
    spark.sql("DELETE FROM mut.ns.del WHERE id % 7 = 0")
    val want = 1000 - (0 until 1000).count(_ % 7 == 0)
    assert(GeoParquet.readMerged(spark, dir).count() == want)
    spark.sql("CALL mut.system.compact('ns.del')").collect()
    assert(spark.sql("SELECT count(*) AS n FROM mut.ns.del")
      .collect()(0).getLong(0) == want)
  }
}
