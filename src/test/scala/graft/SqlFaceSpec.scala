package graft

import org.apache.spark.sql.functions._

import graft.sources.GeoParquet
import graft.sources.v2.GraftSource

/** The DataSourceV2 SQL face (`format("graft")`): plain `spark.sql`
  * over manifested layouts with the same file-level pruning the API
  * readers do — including two-layout joins no hand-plumbed DataFrame
  * composition is needed for.
  */
class SqlFaceSpec extends SparkSpec {
  import spark.implicits._

  private def layout(n: Int, spread: Double): String = {
    val dir = java.nio.file.Files.createTempDirectory("sqlface").toString
    val pts = (0 until n).map { i =>
      (i.toLong, (i % 50) * spread, (i % 37) * spread, i * 1.0)
    }.toDF("id", "x", "y", "z")
    GeoParquet.write(pts, dir, 250.0)
    GeoParquet.writeManifest(spark, dir)
    dir
  }

  // layout-relative suffix: bin-partitioned part files share a
  // basename across bin dirs, so the directory part matters
  private def names(dir: String, files: Iterable[String]): Set[String] = {
    val tail = dir.substring(dir.lastIndexOf('/') + 1)
    files.map { f =>
      val i = f.indexOf(tail)
      if (i >= 0) f.substring(i + tail.length + 1) else f
    }.toSet
  }

  test("a SQL box query opens exactly the API path's file set") {
    val dir = layout(4000, 25.0)
    spark.read.format("graft").load(dir).createOrReplaceTempView("sface")
    val sql = spark.sql(
      "SELECT id, x, y, z FROM sface WHERE x >= 0 AND x < 400 AND y >= 0 AND y < 400")
    val api = GeoParquet.queryBoxViaManifest(spark, dir, (0.0, 400.0), (0.0, 400.0))
    // same rows
    assert(sql.exceptAll(api).count() == 0 && api.exceptAll(sql).count() == 0)
    assert(sql.count() > 0)
    // same FILES: the DSv2 scan planned exactly what the API opened
    sql.collect() // force planInputPartitions
    val planned = names(dir, GraftSource.lastPlannedFiles.get(dir))
    val apiFiles = names(dir, api.inputFiles.toSeq)
    assert(planned == apiFiles, s"SQL face planned $planned, API opened $apiFiles")
    // and it genuinely pruned: strictly fewer than the full layout
    val total = names(dir, spark.read.parquet(dir).inputFiles.toSeq)
    assert(planned.size < total.size,
      s"no pruning: ${planned.size} of ${total.size}")
  }

  test("spark.sql joins two layouts in one query, pruned on both sides") {
    val a = layout(3000, 25.0)
    val b = layout(3000, 40.0)
    spark.read.format("graft").load(a).createOrReplaceTempView("lay_a")
    spark.read.format("graft").load(b).createOrReplaceTempView("lay_b")
    val joined = spark.sql(
      """SELECT a.id, a.z AS za, b.z AS zb
        |FROM lay_a a JOIN lay_b b ON a.id = b.id
        |WHERE a.x >= 0 AND a.x < 300 AND a.y >= 0 AND a.y < 300
        |  AND b.x >= 0 AND b.x < 300 AND b.y >= 0 AND b.y < 300
        |ORDER BY a.id""".stripMargin)
    val want = GeoParquet.queryBoxViaManifest(spark, a, (0.0, 300.0), (0.0, 300.0))
      .select($"id", $"z".as("za"))
      .join(GeoParquet.queryBoxViaManifest(spark, b, (0.0, 300.0), (0.0, 300.0))
        .select($"id", $"z".as("zb")), Seq("id"))
      .orderBy("id")
    assert(joined.collect().toSeq == want.collect().toSeq)
    assert(joined.count() > 0)
    // both sides pruned below their full file counts
    Seq(a, b).foreach { p =>
      val planned = GraftSource.lastPlannedFiles.get(p)
      val total = spark.read.parquet(p).inputFiles.length
      assert(planned.size < total, s"$p: ${planned.size} of $total")
    }
  }

  test("schema-evolution columns the file predates read as null through SQL") {
    val dir = layout(500, 25.0)
    GeoParquet.appendWithManifest(
      Seq((900001L, 10.0, 10.0, 1.0, 42.0)).toDF("id", "x", "y", "z", "w"),
      dir, 250.0)
    spark.read.format("graft").load(dir).createOrReplaceTempView("sevolve")
    val r = spark.sql("SELECT id, w FROM sevolve WHERE id = 900001 OR id = 1")
      .collect().map(x => (x.getLong(0), if (x.isNullAt(1)) None else Some(x.getDouble(1))))
      .toMap
    assert(r(900001L).contains(42.0))
    assert(r(1L).isEmpty, "pre-evolution row must read the new column as null")
  }

  test("a broadcast-dim join prunes layout files at runtime via the manifest blooms") {
    val dir = java.nio.file.Files.createTempDirectory("sqldpp").toString
    val pts = (0 until 6000).map { i =>
      (i.toLong, (i % 50) * 25.0, (i % 37) * 25.0, i * 1.0)
    }.toDF("id", "x", "y", "z")
    GeoParquet.write(pts, dir, 250.0)
    GeoParquet.declareFilterCols(spark, dir, Seq("id"))
    GeoParquet.writeManifest(spark, dir)
    val total = spark.read.parquet(dir).inputFiles.length
    // a selective dim that stays a SOURCE (a local Seq would
    // constant-fold into a LocalRelation and DPP sees no filter)
    val dimDir = java.nio.file.Files.createTempDirectory("sqldppdim").toString
    Seq((3L, 1, "a"), (4007L, 1, "b"), (5999L, 1, "c"), (17L, 0, "d"))
      .toDF("id", "pick", "tag").write.mode("overwrite").parquet(dimDir)
    spark.read.parquet(dimDir).createOrReplaceTempView("dim_rt")
    spark.read.format("graft").load(dir).createOrReplaceTempView("lay_rt")
    val before = Map(
      "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly" -> "false",
      "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false",
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio" -> "50.0"
    ).map { case (k, v) =>
      val old = spark.conf.getOption(k); spark.conf.set(k, v); k -> old
    }
    try {
      val q = spark.sql(
        """SELECT l.id, l.z, d.tag
          |FROM lay_rt l JOIN dim_rt d ON l.id = d.id
          |WHERE d.pick = 1 ORDER BY l.id""".stripMargin)
      val got = q.collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
      assert(got.toSeq == Seq((3L, 3.0, "a"), (4007L, 4007.0, "b"), (5999L, 5999.0, "c")))
      val planned = GraftSource.lastPlannedFiles.get(dir).size
      assert(planned < total,
        s"runtime filter did not prune: opened $planned of $total files; " +
          s"delivered filters: ${GraftSource.lastRuntimeFilters.get(dir)}")
    } finally before.foreach { case (k, old) =>
      old.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("manifest statistics make a small layout auto-broadcast, unhinted") {
    val big = layout(6000, 25.0)
    val dirSmall = java.nio.file.Files.createTempDirectory("sqlstat").toString
    val small = (0 until 40).map { i =>
      (i.toLong * 150, i * 1.0, i * 1.0, i * 2.0)
    }.toDF("id", "x", "y", "z")
    GeoParquet.write(small, dirSmall, 250.0)
    GeoParquet.writeManifest(spark, dirSmall)
    spark.read.format("graft").load(big).createOrReplaceTempView("stat_big")
    spark.read.format("graft").load(dirSmall).createOrReplaceTempView("stat_small")
    val q = spark.sql(
      """SELECT b.id, b.z, s.z AS sz
        |FROM stat_big b JOIN stat_small s ON b.id = s.id""".stripMargin)
    // the join picks broadcast from the REPORTED stats — without
    // estimateStatistics a DSv2 scan reads as defaultSizeInBytes (∞)
    // and this would be a sort-merge join
    // stage-aware traversal: the one shared definition (PlanWalk)
    // also sees inside executed query stages
    def nodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] =
      graft.core.PlanWalk.nodes(p)
    assert(nodes(q.queryExecution.executedPlan).exists {
      case _: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => true
      case _ => false
    }, "small manifested layout did not broadcast:\n" +
      q.queryExecution.executedPlan)
    assert(q.count() > 0)
  }

  test("snapshot option time-travels rows and aggregates alike") {
    val dir = java.nio.file.Files.createTempDirectory("sqlsnap").toString
    val p = (0 until 1200).map { i =>
      (i.toLong, (i % 50) * 25.0, (i % 37) * 25.0, i * 1.0)
    }.toDF("id", "x", "y", "z")
    GeoParquet.write(p.filter($"id" % 2 === 0), dir, 250.0)
    GeoParquet.writeManifest(spark, dir)
    GeoParquet.appendWithManifest(p.filter($"id" % 2 === 1), dir, 250.0)
    // current state sees both halves
    spark.read.format("graft").load(dir).createOrReplaceTempView("snap_now")
    assert(spark.sql("SELECT count(*) AS n FROM snap_now").collect()(0).getLong(0) == 1200)
    // epoch 0 pins the base commit — rows AND pushed aggregates
    spark.read.format("graft").option("snapshot", "0").load(dir)
      .createOrReplaceTempView("snap_0")
    val rows = spark.sql("SELECT id FROM snap_0 ORDER BY id").collect().map(_.getLong(0))
    assert(rows.length == 600 && rows.forall(_ % 2 == 0))
    assert(spark.sql("SELECT count(*) AS n FROM snap_0 WHERE x >= 0")
      .collect()(0).getLong(0) == 600)
    // ...and matches the API's snapshot read exactly
    val api = GeoParquet.queryBoxAsOf(spark, dir, 0L, (-1e9, 1e9), (-1e9, 1e9))
    assert(api.count() == 600)
  }

  test("snapshot over a stale manifest refuses — history has no fallback") {
    val dir = layout(300, 25.0)
    GeoParquet.append(
      Seq((990001L, 1.0, 1.0, 1.0)).toDF("id", "x", "y", "z"), dir, 250.0)
    val v = spark.read.format("graft").option("snapshot", "0").load(dir)
    val e = intercept[Throwable] { v.count() }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else String.valueOf(t.getMessage) +: chain(t.getCause)
    assert(chain(e).exists(_.contains("stale")), chain(e).mkString(" | "))
  }

  test("pending positional deletes subtract in SQL reads; equality tombstones still refuse") {
    val dir = layout(500, 25.0)
    GeoParquet.deleteWhere(spark, dir, col("id") === 7)
    spark.read.format("graft").load(dir).createOrReplaceTempView("sdel")
    // merge-on-read: the row scan subtracts, and count(*) degrades
    // from the manifest shortcut to the subtracting scan — both agree
    assert(spark.sql("SELECT count(*) AS n FROM sdel")
      .collect()(0).getLong(0) == 499)
    assert(spark.sql("SELECT count(*) AS n FROM sdel WHERE id = 7")
      .collect()(0).getLong(0) == 0)
    // equality (key) tombstones are API-shaped; the face keeps
    // refusing those rather than guessing a join key
    import spark.implicits._
    GeoParquet.deleteIds(Seq(9L).toDF("id"), dir)
    val e = intercept[Throwable] {
      spark.sql("SELECT * FROM sdel").collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else t.getMessage +: chain(t.getCause)
    assert(chain(e).exists(m => m != null && m.contains("equality")),
      s"unexpected error: ${chain(e)}")
  }

  test("time travel composes with pending merge-on-read deletes") {
    // epochs: 0 = base (evens), 1 = append (odds), 2 = positional
    // delete (id % 5 == 2) — pending, never compacted.  A snapshot
    // subtracts exactly the deletes at-or-before its pinned epoch:
    // AS OF 1 must still show the later-deleted rows.
    val dir = java.nio.file.Files.createTempDirectory("sqlttmor").toString
    val p = (0 until 1000).map { i =>
      (i.toLong, (i % 50) * 25.0, (i % 37) * 25.0, i * 1.0)
    }.toDF("id", "x", "y", "z")
    GeoParquet.write(p.filter($"id" % 2 === 0), dir, 250.0)
    GeoParquet.writeManifest(spark, dir)
    GeoParquet.appendWithManifest(p.filter($"id" % 2 === 1), dir, 250.0)
    GeoParquet.deleteWhere(spark, dir, col("id") % 5 === 2)
    assert(GeoParquet.readEpoch(spark, dir) == 2L)
    def at(e: String) = {
      spark.read.format("graft").option("snapshot", e).load(dir)
        .createOrReplaceTempView(s"ttmor_$e")
      spark.sql(s"SELECT id FROM ttmor_$e").collect().map(_.getLong(0)).sorted.toSeq
    }
    assert(at("0") == (0L until 1000L).filter(_ % 2 == 0))
    assert(at("1") == (0L until 1000L), "AS OF before the delete lost rows")
    assert(at("2") == (0L until 1000L).filterNot(_ % 5 == 2))
    // the API face agrees epoch-for-epoch
    assert(GeoParquet.queryBoxAsOf(spark, dir, 1L, (-1e9, 1e9), (-1e9, 1e9))
      .count() == 1000)
    assert(GeoParquet.queryBoxAsOf(spark, dir, 2L, (-1e9, 1e9), (-1e9, 1e9))
      .filter($"id" % 5 === 2).count() == 0)
    // 61z19 × 61z17: the COUNT pushdown slices its doomed subtraction
    // by the pinned epoch too — exact at every era, and still answered
    // from the manifest (interior files unopened)
    def nAt(e: String): Long = spark.sql(s"SELECT count(*) AS n FROM ttmor_$e")
      .collect()(0).getLong(0)
    assert(nAt("0") == 500 && nAt("1") == 1000 && nAt("2") == 800)
    val (answered, scanned) = graft.sources.v2.GraftSource.lastAggPlan.get(dir)
    assert(answered > 0, s"answered=$answered scanned=$scanned")
    // an UN-epoched tombstone part (legacy/crash-healed shape) cannot
    // be placed on the snapshot axis: snapshots refuse, current-state
    // reads keep subtracting it
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tdir = new org.apache.hadoop.fs.Path(s"$dir/_tombstones_pos")
    val part = fs.listStatus(tdir)
      .map(_.getPath).find(_.getName.startsWith("e2-")).get
    assert(fs.rename(part, new org.apache.hadoop.fs.Path(tdir,
      part.getName.stripPrefix("e2-"))))
    val refuse = intercept[Throwable] {
      spark.read.format("graft").option("snapshot", "1").load(dir).count()
    }
    def chain2(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else String.valueOf(t.getMessage) +: chain2(t.getCause)
    assert(chain2(refuse).exists(_.contains("commit epoch")),
      chain2(refuse).mkString(" | "))
    intercept[IllegalArgumentException] {
      GeoParquet.queryBoxAsOf(spark, dir, 1L, (-1e9, 1e9), (-1e9, 1e9))
    }
    spark.read.format("graft").load(dir).createOrReplaceTempView("ttmor_cur")
    assert(spark.sql("SELECT count(*) AS n FROM ttmor_cur")
      .collect()(0).getLong(0) == 800)
  }

  test("LIMIT pushdown truncates the file plan to the certified budget") {
    // 8 flat key-sorted files of 500 rows each, ids 0..3999
    val dir = java.nio.file.Files.createTempDirectory("sqllim").toString
    val pts = (0 until 4000).map { i =>
      (i.toLong, (i % 50) * 25.0, (i % 37) * 25.0, i * 1.0)
    }.toDF("id", "x", "y", "z")
    GeoParquet.writeKeyed(pts, dir, "id", nFiles = 8)
    spark.read.format("graft").load(dir).createOrReplaceTempView("slim")
    val total = spark.read.parquet(s"$dir/_manifest").count()
    assert(total == 8)
    // bare preview: one file certifies 10 rows
    assert(spark.sql("SELECT id FROM slim LIMIT 10").collect().length == 10)
    assert(GraftSource.lastPlannedFiles.get(dir).size == 1,
      "bare LIMIT still planned more than one file")
    // filtered preview: the key band spans ~2 contained files; the
    // budget stops after the first, rows still honor the filter
    val got = spark.sql(
      "SELECT id FROM slim WHERE id >= 1000 AND id < 2000 LIMIT 20").collect()
    assert(got.length == 20 && got.forall { r =>
      val v = r.getLong(0); v >= 1000 && v < 2000 })
    assert(GraftSource.lastPlannedFiles.get(dir).size == 1,
      "contained-band LIMIT planned more than the certified file")
    // an uncoverable budget keeps the full (pruned) plan: the band
    // holds 1000 rows across ≤3 files, the limit wants them all
    val all = spark.sql(
      "SELECT id FROM slim WHERE id >= 1000 AND id < 2000 LIMIT 5000").collect()
    assert(all.length == 1000)
    // pending deletes disable truncation — results stay exact
    GeoParquet.deleteWhere(spark, dir, col("id") === 1L)
    val afterDel = spark.sql("SELECT id FROM slim LIMIT 4000").collect()
    assert(afterDel.length == 3999, s"got ${afterDel.length}")
    assert(!afterDel.exists(_.getLong(0) == 1L))
  }

  test("TopN pushdown plans the key-ordered head/tail of the file set") {
    val dir = java.nio.file.Files.createTempDirectory("sqltopn").toString
    val pts = (0 until 4000).map { i =>
      (i.toLong, (i % 50) * 25.0, (i % 37) * 25.0, i * 1.0)
    }.toDF("id", "x", "y", "z")
    GeoParquet.writeKeyed(pts, dir, "id", nFiles = 8)
    spark.read.format("graft").load(dir).createOrReplaceTempView("stopn")
    val total = spark.read.parquet(s"$dir/_manifest").count()
    // ascending head: exactly the smallest ids, one file planned
    val asc = spark.sql("SELECT id FROM stopn ORDER BY id LIMIT 10")
      .as[Long].collect().toSeq
    assert(asc == (0L until 10L), s"asc head diverged: $asc")
    assert(GraftSource.lastPlannedFiles.get(dir).size == 1,
      "ascending TopN planned more than the head file")
    // descending tail
    val desc = spark.sql("SELECT id FROM stopn ORDER BY id DESC LIMIT 10")
      .as[Long].collect().toSeq
    assert(desc == (3999L to 3990L by -1L), s"desc tail diverged: $desc")
    assert(GraftSource.lastPlannedFiles.get(dir).size == 1,
      "descending TopN planned more than the tail file")
    // with a pushed band filter the order still holds exactly
    val band = spark.sql(
      "SELECT id FROM stopn WHERE id >= 1000 AND id < 3000 ORDER BY id LIMIT 5")
      .as[Long].collect().toSeq
    assert(band == (1000L until 1005L), s"band head diverged: $band")
    assert(GraftSource.lastPlannedFiles.get(dir).size < total)
    // OVERLAPPING key ranges (a second commit spanning the whole key
    // space): the closure must keep every file whose range reaches
    // the threshold — results stay exactly ordered
    graft.sources.GeoParquet.appendCurve(
      Seq((2L, 0.0, 0.0, -1.0), (3997L, 0.0, 0.0, -2.0))
        .toDF("id", "x", "y", "z"), dir, 1.0)
    val asc2 = spark.sql("SELECT id, z FROM stopn ORDER BY id LIMIT 5")
      .as[(Long, Double)].collect().toSeq
    assert(asc2 == Seq((0L, 0.0), (1L, 1.0), (2L, -1.0), (2L, 2.0), (3L, 3.0)) ||
      asc2 == Seq((0L, 0.0), (1L, 1.0), (2L, 2.0), (2L, -1.0), (3L, 3.0)),
      s"overlap head diverged: $asc2")
    assert(GraftSource.lastPlannedFiles.get(dir).size < total + 1)
  }

  test("composite-key TopN pushes a leading-prefix order through the struct stats") {
    val dir = java.nio.file.Files.createTempDirectory("sqltopn2").toString
    val pts = (0 until 4000).map { i =>
      ((i % 20).toLong, i.toLong, i * 1.0)
    }.toDF("tenant", "id", "z")
    GeoParquet.writeKeyed(pts, dir, Seq("tenant", "id"), nFiles = 8)
    spark.read.format("graft").load(dir).createOrReplaceTempView("stopn2")
    val total = spark.read.parquet(s"$dir/_manifest").count()
    assert(total == 8)
    // FULL composite order: deterministic head, planned at ~one file
    val head = spark.sql(
      "SELECT tenant, id FROM stopn2 ORDER BY tenant, id LIMIT 10")
      .as[(Long, Long)].collect().toSeq
    assert(head == (0L until 200L by 20L).map(i => (0L, i)),
      s"composite head diverged: $head")
    assert(GraftSource.lastPlannedFiles.get(dir).size == 1,
      "full-key TopN planned more than the head file")
    // LEADING-COLUMN order only (prefix 1 of 2): ties beyond the
    // prefix make the row set nondeterministic, but every returned
    // row must carry the minimal tenant and the plan stays budgeted
    val pre = spark.sql("SELECT tenant FROM stopn2 ORDER BY tenant LIMIT 10")
      .as[Long].collect().toSeq
    assert(pre.length == 10 && pre.forall(_ == 0L),
      s"prefix head leaked a non-minimal tenant: $pre")
    // ≤ 2: the threshold tenant straddles a file boundary, and the
    // closure must keep the neighbor that shares it (its rows tie at
    // the threshold under the 1-column order)
    assert(GraftSource.lastPlannedFiles.get(dir).size <= 2,
      "leading-prefix TopN planned beyond the threshold closure")
    // DESC tail on the full key
    val tail = spark.sql(
      "SELECT tenant, id FROM stopn2 ORDER BY tenant DESC, id DESC LIMIT 10")
      .as[(Long, Long)].collect().toSeq
    assert(tail == (3999L to 3810L by -20L).map(i => (19L, i)).take(10),
      s"composite tail diverged: $tail")
    assert(GraftSource.lastPlannedFiles.get(dir).size == 1,
      "full-key DESC TopN planned more than the tail file")
    // MIXED directions cannot map onto one head/tail walk: the push
    // refuses (full plan) and the result is still exact
    val mixed = spark.sql(
      "SELECT tenant, id FROM stopn2 ORDER BY tenant ASC, id DESC LIMIT 5")
      .as[(Long, Long)].collect().toSeq
    assert(mixed == (3980L to 3900L by -20L).map(i => (0L, i)),
      s"mixed-direction head diverged: $mixed")
    assert(GraftSource.lastPlannedFiles.get(dir).size == total,
      "mixed directions must refuse the truncation (full plan)")
    // non-key leading column refuses too
    val off = spark.sql(
      "SELECT tenant, id, z FROM stopn2 ORDER BY z LIMIT 3")
      .as[(Long, Long, Double)].collect().toSeq
    assert(off == Seq((0L, 0L, 0.0), (1L, 1L, 1.0), (2L, 2L, 2.0)),
      s"non-key order diverged: $off")
    assert(GraftSource.lastPlannedFiles.get(dir).size == total,
      "a non-key sort column must refuse the truncation")
  }
}
