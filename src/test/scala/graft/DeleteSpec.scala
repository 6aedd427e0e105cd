package graft

import org.apache.spark.sql.functions._
import graft.sources.GeoParquet

/** Merge-on-read deletes: tombstone registration, read-side
  * subtraction on every entry point, stats-path degradation, refusal
  * where no sound answer exists, and physical apply at compaction.
  */
class DeleteSpec extends SparkSpec {
  import spark.implicits._

  private def p = graft.core.Tables.eventsPoints(spark, sf)
    .select("id", "x", "y", "z")

  test("deleteIds: merged reads subtract instantly, pruning survives") {
    val dir = java.nio.file.Files.createTempDirectory("del1").toString
    GeoParquet.write(p, dir, 250.0)
    GeoParquet.writeManifest(spark, dir)
    val doomed = p.filter($"id" % 7 === 0).select("id")
    val nDoomed = doomed.count()
    GeoParquet.deleteIds(doomed, dir)
    // zero data files rewritten, sidecar present, epoch UNCHANGED —
    // equality deletes assert nothing about files, so pruned reads
    // must not degrade
    assert(GeoParquet.pendingTombstones(spark, dir).get.count() == nDoomed)
    assert(GeoParquet.readEpoch(spark, dir) == 0L)
    // merged full read
    assert(GeoParquet.readMerged(spark, dir).count() == p.count() - nDoomed)
    assert(GeoParquet.readMerged(spark, dir)
      .filter($"id" % 7 === 0).count() == 0)
    // merged box read keeps bin-partition pruning: the bin predicates
    // stay PartitionFilters on the data scan despite the anti-join
    val boxed = GeoParquet.queryBoxMerged(spark, dir, (0L, 250L), (0L, 250L))
    val pf = boxed.queryExecution.executedPlan.toString
      .linesIterator.find(l => l.contains("PartitionFilters") && l.contains("bin_x"))
    assert(pf.exists(l => l.contains("(bin_x") && !l.contains("PartitionFilters: []")),
      s"bin predicates lost from the scan: $pf")
    assert(boxed.filter($"id" % 7 === 0).count() == 0)
    // raw read still sees everything (merged-ness is explicit)
    assert(GeoParquet.read(spark, dir).count() == p.count())
    // a second delete accumulates
    GeoParquet.deleteIds(p.filter($"id" % 7 === 1).select("id"), dir)
    assert(GeoParquet.readMerged(spark, dir)
      .filter($"id" % 7 <= 1).count() == 0)
  }

  test("stats shortcuts degrade to merged scans under pending deletes") {
    val dir = java.nio.file.Files.createTempDirectory("del2").toString
    GeoParquet.write(p, dir, 250.0)
    GeoParquet.writeManifest(spark, dir)
    GeoParquet.deleteIds(p.filter($"id" % 3 === 0).select("id"), dir)
    val want = p.filter($"id" % 3 =!= 0)
    val n = GeoParquet.countBoxViaManifest(spark, dir, (-1e9, 1e9), (-1e9, 1e9))
    assert(n.as[Long].head() == want.count())
    val mm = GeoParquet.minMaxBoxViaManifest(spark, dir, (-1e9, 1e9), (-1e9, 1e9))
    val wantAgg = want.agg(count("*"), min("z"), max("z"))
      .as[(Long, Double, Double)].head()
    assert(mm.as[(Long, Double, Double)].head() == wantAgg)
    // snapshots cannot be served under pending deletes — refuse
    intercept[IllegalArgumentException] {
      GeoParquet.queryBoxAsOf(spark, dir, 0L, (-1e9, 1e9), (-1e9, 1e9))
    }
  }

  test("compaction applies tombstones physically and clears the sidecar") {
    val dir = java.nio.file.Files.createTempDirectory("del3").toString
    GeoParquet.write(p, dir, 250.0)
    GeoParquet.writeManifest(spark, dir)
    GeoParquet.deleteIds(p.filter($"id" % 5 === 0).select("id"), dir)
    // tombstones count as compaction pressure on their own
    assert(GeoParquet.compactIfNeeded(spark, dir, maxFilesPerBin = 1000))
    assert(GeoParquet.pendingTombstones(spark, dir).isEmpty)
    // the RAW read now excludes the deleted rows — the delete is physical
    val raw = GeoParquet.read(spark, dir)
    assert(raw.filter($"id" % 5 === 0).count() == 0)
    assert(raw.count() == p.filter($"id" % 5 =!= 0).count())
    // rebuilt manifest serves snapshot reads again
    GeoParquet.writeManifest(spark, dir)
    val e = GeoParquet.readEpoch(spark, dir)
    assert(GeoParquet.queryBoxAsOf(spark, dir, e, (-1e9, 1e9), (-1e9, 1e9))
      .count() == raw.count())
  }

  test("upsert: replaces by key exactly once, leaves a clean fresh layout") {
    val dir = java.nio.file.Files.createTempDirectory("ups").toString
    GeoParquet.write(p, dir, 250.0)
    GeoParquet.writeManifest(spark, dir)
    GeoParquet.upsert(
      p.filter($"id" % 9 === 0).withColumn("z", $"z" + 1000.0), dir, "id", 250.0)
    val r = GeoParquet.read(spark, dir).select("id", "x", "y", "z")
    val expect = p.withColumn("z",
      when($"id" % 9 === 0, $"z" + 1000.0).otherwise($"z"))
    // multiset equality: every key exactly once, replaced values exact
    assert(r.exceptAll(expect).count() == 0 && expect.exceptAll(r).count() == 0)
    // the merge left no pending tombstones and a FRESH manifest —
    // pruned reads serve the post-merge state immediately
    assert(GeoParquet.pendingTombstones(spark, dir).isEmpty)
    val boxed = GeoParquet.queryBoxViaManifest(spark, dir, (0.0, 200.0), (0.0, 200.0))
    assert(boxed.count() ==
      expect.filter($"x" >= 0 && $"x" < 200 && $"y" >= 0 && $"y" < 200).count())
  }

  test("dedup drop-list as tombstones: retroactive dedup without a rewrite") {
    val dir = java.nio.file.Files.createTempDirectory("deldup").toString
    // corpus with every content duplicated under a second id
    val dupes = p.withColumn("id", $"id" + 10000000L)
    GeoParquet.write(p.unionByName(dupes), dir, 250.0)
    GeoParquet.writeManifest(spark, dir)
    // keeper = min id per content; everything else is the drop list
    val drops = GeoParquet.read(spark, dir)
      .groupBy("x", "y", "z").agg(min("id").as("keep"), collect_list("id").as("ids"))
      .select(explode($"ids").as("id"), $"keep")
      .filter($"id" =!= $"keep").select("id")
    GeoParquet.deleteIds(drops, dir)
    // instantly dedup-clean through the merged read — zero data rewritten
    val merged = GeoParquet.readMerged(spark, dir)
    assert(merged.count() == p.count())
    assert(merged.groupBy("x", "y", "z").count().filter($"count" > 1).count() == 0)
    // ...and physically clean after compaction
    GeoParquet.compact(spark, dir)
    assert(GeoParquet.read(spark, dir).count() == p.count())
  }

  test("deleteWhere: positional deletes keep the manifest fresh and pruning live") {
    val dir = java.nio.file.Files.createTempDirectory("delw").toString
    GeoParquet.write(p, dir, 250.0)
    GeoParquet.writeManifest(spark, dir)
    val e0 = GeoParquet.readEpoch(spark, dir)
    GeoParquet.deleteWhere(spark, dir, col("id") % 6 === 0)
    // the delete claims its OWN commit epoch (it is a point on the
    // snapshot axis now) — but `_manifest_epoch` advances in
    // lockstep, so the manifest STAYS FRESH and pruned reads keep
    // pruning: nothing the manifest asserts about files changed
    assert(GeoParquet.readEpoch(spark, dir) == e0 + 1)
    assert(GeoParquet.manifestFresh(spark, dir, verify = false),
      "a positional delete must not stale the manifest")
    val xr = (0.0, 200.0); val yr = (0.0, 200.0)
    val got = GeoParquet.queryBoxViaManifest(spark, dir, xr, yr)
    val want = p.filter($"x" >= 0 && $"x" < 200 && $"y" >= 0 && $"y" < 200 &&
      $"id" % 6 =!= 0)
    assert(got.count() == want.count())
    assert(got.filter($"id" % 6 === 0).count() == 0)
    // row-count shortcuts cannot subtract from manifest rows: degrade, correct
    val n = GeoParquet.countBoxViaManifest(spark, dir, (-1e9, 1e9), (-1e9, 1e9))
    assert(n.as[Long].head() == p.filter($"id" % 6 =!= 0).count())
    // snapshots COMPOSE with the pending positional delete: AS OF the
    // pre-delete epoch serves every row (the tombstones' epoch is
    // later — they must NOT subtract), AS OF the delete's own epoch
    // subtracts them
    assert(GeoParquet.queryBoxAsOf(spark, dir, e0, (-1e9, 1e9), (-1e9, 1e9))
      .count() == p.count(),
      "AS OF before the delete must serve the pre-delete rows")
    val postDelete = GeoParquet.queryBoxAsOf(spark, dir, e0 + 1,
      (-1e9, 1e9), (-1e9, 1e9))
    assert(postDelete.count() == p.filter($"id" % 6 =!= 0).count())
    assert(postDelete.filter($"id" % 6 === 0).count() == 0)
    // compaction applies and clears the positional sidecar too
    GeoParquet.compact(spark, dir)
    assert(GeoParquet.pendingPositional(spark, dir).isEmpty)
    assert(GeoParquet.read(spark, dir).filter($"id" % 6 === 0).count() == 0)
  }

  test("upsertPositional: repeated upserts keep exactly the latest copy") {
    val dir = java.nio.file.Files.createTempDirectory("upsp").toString
    GeoParquet.write(p, dir, 250.0)
    GeoParquet.writeManifest(spark, dir)
    val keys = p.filter($"id" % 13 === 0)
    GeoParquet.upsertPositional(keys.withColumn("z", $"z" + 500.0), dir, "id", 250.0)
    // second upsert of the SAME keys: the first replacement must die by
    // its (file, row) address — an equality tombstone could not tell it
    // from the second replacement
    GeoParquet.upsertPositional(keys.withColumn("z", $"z" + 900.0), dir, "id", 250.0)
    val r = GeoParquet.readMerged(spark, dir).select("id", "x", "y", "z")
    val expect = p.withColumn("z",
      when($"id" % 13 === 0, $"z" + 900.0).otherwise($"z"))
    assert(r.exceptAll(expect).count() == 0 && expect.exceptAll(r).count() == 0)
    // the manifest stayed fresh through BOTH merges — no full-scan fallback
    assert(GeoParquet.readEpoch(spark, dir) ==
      spark.read.parquet(s"$dir/_manifest").agg(max("epoch")).head().getLong(0))
  }

  test("upsertKeyed: position lookup prunes to key-overlapping files") {
    val dir = java.nio.file.Files.createTempDirectory("upsk").toString
    val base = p.select($"id", $"z") // a keyed "dimension" table
    GeoParquet.writeKeyed(base, dir, "id", nFiles = 8)
    // update a narrow key band: only the band's file(s) hold old copies
    val band = base.filter($"id" >= 100 && $"id" < 300)
      .withColumn("z", $"z" + 1.0)
    val nBand = band.count()
    assert(nBand > 0)
    GeoParquet.upsertKeyed(band, dir, "id", nFiles = 1)
    val r = GeoParquet.readMerged(spark, dir).select("id", "z")
    val expect = base.withColumn("z",
      when($"id" >= 100 && $"id" < 300, $"z" + 1.0).otherwise($"z"))
    assert(r.exceptAll(expect).count() == 0 && expect.exceptAll(r).count() == 0)
    // pruning evidence: the tombstoned positions live in a strict
    // subset of the files — the lookup never scanned the whole corpus
    val total = spark.read.parquet(s"$dir/_manifest").count()
    val touched = spark.read.parquet(s"$dir/_tombstones_pos")
      .select("file").distinct().count()
    assert(touched < total, s"lookup touched $touched of $total files")
    assert(spark.read.parquet(s"$dir/_tombstones_pos").count() == nBand)
    // manifest stayed fresh: the merge is repeatable without rebuilds
    assert(GeoParquet.readEpoch(spark, dir) ==
      spark.read.parquet(s"$dir/_manifest").agg(max("epoch")).head().getLong(0))
    GeoParquet.upsertKeyed(band.withColumn("z", $"z" + 1.0), dir, "id")
    val r2 = GeoParquet.readMerged(spark, dir).select("id", "z")
    val expect2 = base.withColumn("z",
      when($"id" >= 100 && $"id" < 300, $"z" + 2.0).otherwise($"z"))
    assert(r2.exceptAll(expect2).count() == 0 && expect2.exceptAll(r2).count() == 0)
  }

  // --- staged-merge crash windows: liveness is tied to the append's
  // --- ACTUAL data commit (markers), never to epoch arithmetic

  /** One real (file, pos) address per selected id, root-relative. */
  private def addressesOf(dir: String, cond: org.apache.spark.sql.Column) = {
    val root = new org.apache.hadoop.fs.Path(dir).toUri.getPath
    spark.read.parquet(dir).filter(cond)
      .select($"id",
        substring_index(col("_metadata.file_path"), root + "/", -1).as("file"),
        col("_metadata.row_index").as("pos"))
  }

  test("staged-merge liveness: landed stages subtract, void stages never resurrect") {
    val dir = java.nio.file.Files.createTempDirectory("mjrnl").toString
    GeoParquet.write(p.filter($"id" % 2 === 0), dir, 250.0)
    GeoParquet.writeManifest(spark, dir) // epoch 0
    val Seq(v1, v2) = spark.read.parquet(dir).select($"id")
      .orderBy("id").limit(2).as[Long].collect().toSeq
    def stage(name: String, id: Long, landed: Boolean): Unit = {
      addressesOf(dir, $"id" === id).select("file", "pos")
        .write.parquet(s"$dir/_merge_staging/$name")
      if (landed)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$dir/_merge_staging/$name/_landed"),
          "1".getBytes("UTF-8"))
    }
    // a LANDED stage (its append's files renamed in; the merge died
    // between the _landed marker and adoption)
    stage("landed", v1, landed = true)
    // a VOID stage (the merge died after staging, before its append
    // reached the commit step — old copies must stay)
    stage("void", v2, landed = false)
    // readers subtract the landed stage's row, keep the void one
    assert(GeoParquet.readMerged(spark, dir).filter($"id" === v1).count() == 0)
    assert(GeoParquet.readMerged(spark, dir).filter($"id" === v2).count() == 1)
    // THE round-7 advisory failure mode: an unrelated append bumps the
    // epoch past whatever the crashed merge would have committed at —
    // under marker-based liveness the void stage still must not go live
    GeoParquet.appendWithManifest(p.filter($"id" % 2 === 1), dir, 250.0)
    assert(GeoParquet.readEpoch(spark, dir) >= 1L)
    assert(GeoParquet.readMerged(spark, dir).filter($"id" === v2).count() == 1)
    // healing adopts the landed stage, discards the void one (the
    // staging writer is known dead here, so sweep without the lease)
    GeoParquet.adoptStagedMerges(spark, dir, voidSweepAgeMs = 0L)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/_merge_staging/landed")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/_merge_staging/void")))
    assert(spark.read.parquet(s"$dir/_tombstones_pos").count() == 1)
    assert(GeoParquet.readMerged(spark, dir).count() == p.count() - 1)
    assert(GeoParquet.readMerged(spark, dir).filter($"id" === v2).count() == 1)
  }

  test("staged-merge: epoch-colliding crash loses nothing (the r7 advisory)") {
    // reproduce advisory window (a): a merge's append bumps _epoch and
    // dies BEFORE renaming any data in.  The old protocol compared
    // epochs, saw the expected mark reached, and subtracted the old
    // copies of rows whose replacements never landed — silent loss.
    val dir = java.nio.file.Files.createTempDirectory("mcrash").toString
    GeoParquet.write(p, dir, 250.0)
    GeoParquet.writeManifest(spark, dir)
    val victims = addressesOf(dir, $"id" % 11 === 0).localCheckpoint()
    val nVict = victims.count()
    assert(nVict > 0)
    victims.select("file", "pos").write.parquet(s"$dir/_merge_staging/dead")
    // the crashed append got exactly as far as its epoch bump
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/_epoch"),
      (GeoParquet.readEpoch(spark, dir) + 1).toString.getBytes("UTF-8"))
    // every committed row is still readable — the stage is void
    assert(GeoParquet.readMerged(spark, dir).count() == p.count())
    GeoParquet.adoptStagedMerges(spark, dir, voidSweepAgeMs = 0L)
    assert(GeoParquet.readMerged(spark, dir).count() == p.count())
    assert(!new java.io.File(s"$dir/_tombstones_pos").exists())
  }

  test("staged-merge roll-forward: a crash mid-append lands batch AND deletes") {
    // advisory window (b)-adjacent: the merge died inside commitStaged
    // with the _tmp journal written and the staged batch intact in its
    // sibling directory.  The heal must finish the renames (batch
    // lands), adopt the deletes, and leave reads correct (manifest
    // stale => unpruned fallback, never a wrong answer).
    val dir = java.nio.file.Files.createTempDirectory("mroll").toString
    GeoParquet.write(p, dir, 250.0)
    GeoParquet.writeManifest(spark, dir)
    val repl = p.filter($"id" % 11 === 0).withColumn("z", $"z" + 777.0)
    val doomed = addressesOf(dir, $"id" % 11 === 0)
      .select("file", "pos").localCheckpoint()
    doomed.write.parquet(s"$dir/_merge_staging/m1")
    // stage the replacement batch exactly as appendWithManifest does
    val tmp = dir + ".staging-crash"
    repl.withColumn("bin_x", graft.operators.GeoOps.binOf($"x", 250.0))
      .withColumn("bin_y", graft.operators.GeoOps.binOf($"y", 250.0))
      .write.mode("overwrite").partitionBy("bin_x", "bin_y").parquet(tmp)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/_merge_staging/m1/_tmp"),
      tmp.getBytes("UTF-8"))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/_epoch"),
      (GeoParquet.readEpoch(spark, dir) + 1).toString.getBytes("UTF-8"))
    // pre-heal: deletes are NOT live (the batch hasn't landed) — the
    // old copies remain the committed truth; nothing lost, nothing dup
    assert(GeoParquet.readMerged(spark, dir).count() == p.count())
    GeoParquet.adoptStagedMerges(spark, dir)
    // post-heal: the batch landed, old copies died by address
    val r = GeoParquet.readMerged(spark, dir).select("id", "x", "y", "z")
    val expect = p.withColumn("z",
      when($"id" % 11 === 0, $"z" + 777.0).otherwise($"z"))
    assert(r.exceptAll(expect).count() == 0 && expect.exceptAll(r).count() == 0)
    assert(!new java.io.File(tmp).exists())
    // manifest is stale (the dead writer never appended its stats) —
    // the pruned reader must fall back, and still answer correctly
    assert(!GeoParquet.manifestFresh(spark, dir, verify = false))
    assert(GeoParquet.queryBoxViaManifest(spark, dir, (-1e9, 1e9), (-1e9, 1e9))
      .count() == p.count())
    // writeManifest is the repair verb: pruning resumes
    GeoParquet.writeManifest(spark, dir)
    assert(GeoParquet.manifestFresh(spark, dir, verify = false))
  }

  test("degraded-path MERGE (stale manifest) commits through the journal") {
    // upsertPositional on a stale manifest routes its append through
    // the plain-append fallback — which previously direct-wrote the
    // data and only THEN marked the stage landed, so a crash between
    // job commit and marker voided a landed merge (permanent
    // duplicate keys).  The fallback now stages + journals exactly
    // like commitStaged; end-to-end the MERGE contract must hold and
    // no unresolved stage or staging sibling may remain.
    val dir = java.nio.file.Files.createTempDirectory("mdeg").toString
    GeoParquet.write(p, dir, 250.0)
    GeoParquet.writeManifest(spark, dir)
    // stale the manifest: a plain append lands outside it
    GeoParquet.append(
      Seq((900001L, 5.0, 5.0, 0.0)).toDF("id", "x", "y", "z"), dir, 250.0)
    assert(!GeoParquet.manifestFresh(spark, dir, verify = false))
    GeoParquet.upsertPositional(
      p.filter($"id" % 11 === 0).withColumn("z", $"z" + 333.0),
      dir, "id", 250.0)
    val r = GeoParquet.readMerged(spark, dir).select("id", "x", "y", "z")
    val expect = p.withColumn("z",
        when($"id" % 11 === 0, $"z" + 333.0).otherwise($"z"))
      .unionByName(Seq((900001L, 5.0, 5.0, 0.0)).toDF("id", "x", "y", "z"))
    assert(r.exceptAll(expect).count() == 0 && expect.exceptAll(r).count() == 0)
    // the merge resolved its own stage and cleaned its staging sibling
    val staging = new java.io.File(s"$dir/_merge_staging")
    assert(!staging.exists() || staging.list().isEmpty)
    val parent = new java.io.File(dir).getParentFile
    assert(!parent.list().exists(_.startsWith(
      new java.io.File(dir).getName + ".staging-")))
  }

  test("upsertKeyed: string keys merge exactly, lookup prunes lexicographically") {
    val dir = java.nio.file.Files.createTempDirectory("upstr").toString
    // zero-padded string keys — the UUID/composite-key CDC shape
    val base = p.select(
      concat(lit("K"), lpad($"id".cast("string"), 8, "0")).as("sid"), $"z")
    GeoParquet.writeKeyed(base, dir, "sid", nFiles = 8)
    // manifest k0/k1 carry the string ranges
    val m = spark.read.parquet(s"$dir/_manifest")
    assert(m.schema("k0").dataType ==
      org.apache.spark.sql.types.StringType)
    // update a narrow lexicographic band
    val band = base.filter($"sid" >= "K00000100" && $"sid" < "K00000300")
      .withColumn("z", $"z" + 1.0)
    val nBand = band.count()
    assert(nBand > 0)
    GeoParquet.upsertKeyed(band, dir, "sid", nFiles = 1)
    val r = GeoParquet.readMerged(spark, dir).select("sid", "z")
    val expect = base.withColumn("z",
      when($"sid" >= "K00000100" && $"sid" < "K00000300", $"z" + 1.0)
        .otherwise($"z"))
    assert(r.exceptAll(expect).count() == 0 && expect.exceptAll(r).count() == 0)
    // pruning evidence: the tombstoned positions live in a strict
    // subset of the files — opened files ⊂ key-overlapping files,
    // proven the same way as the integral-key case
    val total = spark.read.parquet(s"$dir/_manifest").count()
    val touched = spark.read.parquet(s"$dir/_tombstones_pos")
      .select("file").distinct().count()
    assert(touched < total, s"lookup touched $touched of $total files")
    assert(spark.read.parquet(s"$dir/_tombstones_pos").count() == nBand)
  }

  test("SQL key predicates file-prune keyed layouts via the manifest [k0,k1]") {
    val dir = java.nio.file.Files.createTempDirectory("sqlkey").toString
    val base = p.select(
      concat(lit("K"), lpad($"id".cast("string"), 8, "0")).as("sid"), $"z")
    GeoParquet.writeKeyed(base, dir, "sid", nFiles = 8)
    val total = spark.read.parquet(s"$dir/_manifest").count()
    val probe = base.select("sid").orderBy("sid").limit(1)
      .collect()(0).getString(0)
    spark.read.format("graft").load(dir).createOrReplaceTempView("sqlkey")
    // STRING point lookup — the exact evaluator leaves it residual,
    // but the key range still reaches the manifest's [k0,k1]: the CDC
    // "fetch one key" query opens ~one file, not the corpus
    val got = spark.sql(s"SELECT sid FROM sqlkey WHERE sid = '$probe'")
      .collect()
    assert(got.nonEmpty && got.forall(_.getString(0) == probe))
    val planned = graft.sources.v2.GraftSource.lastPlannedFiles.get(dir).size
    assert(planned < total, s"point lookup planned $planned of $total files")
    // lexicographic band: pruned plan, unpruned answer
    val nBand = spark.sql("SELECT count(*) AS n FROM sqlkey " +
        "WHERE sid >= 'K00000100' AND sid < 'K00000300'")
      .collect()(0).getLong(0)
    assert(nBand ==
      base.filter($"sid" >= "K00000100" && $"sid" < "K00000300").count())
    assert(nBand > 0)
    assert(graft.sources.v2.GraftSource.lastPlannedFiles.get(dir).size < total)
  }

  test("integral-key COUNT pushdown prunes files by the key range") {
    val dir = java.nio.file.Files.createTempDirectory("sqlkeyagg").toString
    val base = p.select($"id".as("kid"), $"z")
    GeoParquet.writeKeyed(base, dir, "kid", nFiles = 8)
    val total = spark.read.parquet(s"$dir/_manifest").count()
    val (klo, khi) = {
      val r = base.agg(min("kid"), max("kid")).head()
      (r.getLong(0), r.getLong(1))
    }
    val mid = klo + (khi - klo) / 4
    spark.read.format("graft").load(dir).createOrReplaceTempView("sqlkeyagg")
    val n = spark.sql("SELECT count(*) AS n FROM sqlkeyagg " +
        s"WHERE kid >= $klo AND kid < $mid").collect()(0).getLong(0)
    assert(n == base.filter($"kid" >= klo && $"kid" < mid).count())
    val (answered, scanned) = graft.sources.v2.GraftSource.lastAggPlan.get(dir)
    assert(answered + scanned < total,
      s"key-range count planned $answered+$scanned of $total files")
  }

  test("string-banded COUNT pushdown: interior files answered from stats, boundaries scanned") {
    val dir = java.nio.file.Files.createTempDirectory("sqlkeystr").toString
    val base = p.select(
      concat(lit("K"), lpad($"id".cast("string"), 8, "0")).as("sid"), $"z")
    GeoParquet.writeKeyed(base, dir, "sid", nFiles = 8)
    val total = spark.read.parquet(s"$dir/_manifest").count()
    // a band over the 20th–70th key percentile: wide enough that at
    // least one of the 8 key-sorted files is strictly INTERIOR to it,
    // narrow enough that whole files fall outside it (pruned)
    val keys = base.orderBy("sid").select("sid")
      .collect().map(_.getString(0))
    val bLo = keys(keys.length / 5)
    val bHi = keys(keys.length * 7 / 10)
    val n = keys.count(k => k >= bLo && k <= bHi).toLong
    spark.read.format("graft").load(dir).createOrReplaceTempView("sqlkeystr")
    val got = spark.sql("SELECT count(*) AS n FROM sqlkeystr " +
        s"WHERE sid >= '$bLo' AND sid <= '$bHi'").collect()(0).getLong(0)
    assert(got == n, s"string-banded count wrong: $got vs $n")
    val (answered, scanned) = graft.sources.v2.GraftSource.lastAggPlan.get(dir)
    assert(answered > 0,
      s"no interior file was answered from k0/k1/kn stats ($answered+$scanned of $total)")
    assert(answered + scanned < total,
      s"string-banded count planned $answered+$scanned of $total files")

    // prefix form: LIKE 'p%' pushes as StringStartsWith — the
    // successor bound gives the band BOTH sides, so the count still
    // prunes and interior files still answer from stats
    val prefix = bLo.substring(0, 7) // a real key's prefix: nonempty match
    val nPre = base.filter($"sid".startsWith(prefix)).count()
    val gotPre = spark.sql("SELECT count(*) AS n FROM sqlkeystr " +
        s"WHERE sid LIKE '$prefix%'").collect()(0).getLong(0)
    assert(gotPre == nPre && nPre > 0,
      s"prefix count wrong: $gotPre vs $nPre")
    // exact row semantics through the reader too (StartsWith is
    // exact-evaluated now): a row SELECT under the prefix matches
    val rows = spark.sql("SELECT sid FROM sqlkeystr " +
        s"WHERE sid LIKE '$prefix%'").collect()
    assert(rows.length == nPre && rows.forall(_.getString(0).startsWith(prefix)))
  }

  test("generic append into a keyed layout mirrors the data key — pruning stays sound") {
    // regression: the SQL INSERT / streaming-sink dispatch reaches
    // appendCurve with preKeyed=false; recomputing zkey as a SPATIAL
    // curve key there (the pre-fix behavior, reachable because this
    // layout also carries x/y) would land files whose manifest
    // [k0,k1] are curve keys while _keycol still names the data key —
    // and the point lookup below would silently prune the row away.
    val dir = java.nio.file.Files.createTempDirectory("keymirror").toString
    val base = p.select(
      concat(lit("K"), lpad($"id".cast("string"), 8, "0")).as("sid"),
      $"x", $"y", $"z")
    GeoParquet.writeKeyed(base, dir, "sid", nFiles = 8)
    // a generic v2 append (the SQL INSERT path) of a brand-new key
    val extra = Seq(("K99999999", 1.0, 2.0, 3.0))
      .toDF("sid", "x", "y", "z")
    extra.write.format("graft").mode("append").save(dir)
    // the manifest row for the appended file must carry STRING key
    // stats covering the new key
    val m = spark.read.parquet(s"$dir/_manifest")
    assert(m.schema("k0").dataType ==
      org.apache.spark.sql.types.StringType,
      "appended manifest stats are not string-typed key ranges")
    assert(m.filter($"k0" <= "K99999999" && $"k1" >= "K99999999").count() >= 1,
      "no manifest row covers the appended key — zkey was not mirrored")
    // and the pruned point lookup FINDS the appended row
    spark.read.format("graft").load(dir).createOrReplaceTempView("keymirror")
    val got = spark.sql(
      "SELECT sid, z FROM keymirror WHERE sid = 'K99999999'").collect()
    assert(got.length == 1 && got(0).getDouble(1) == 3.0,
      "key-pruned lookup lost the generically-appended row")
    // a batch lacking the key column: Spark's insert resolution
    // null-fills it (AUTOMATIC_SCHEMA_EVOLUTION) — the file lands
    // with NULL key stats, which prune nothing ("unknown, must
    // open"), so keyed lookups stay sound and the row is reachable
    Seq((9.0, 9.0, 9.0)).toDF("x", "y", "z")
      .write.format("graft").mode("append").save(dir)
    val m2 = spark.read.parquet(s"$dir/_manifest")
    assert(m2.filter($"k0".isNull).count() >= 1,
      "null-keyed batch must land with null key stats")
    assert(spark.sql(
      "SELECT sid, z FROM keymirror WHERE sid = 'K99999999'")
      .collect().length == 1,
      "key lookup broke after a null-keyed append")
    assert(spark.read.format("graft").load(dir)
      .filter($"sid".isNull).count() == 1,
      "null-keyed row unreachable")
  }

  test("composite (tenant,id) cluster key: SQL prune fires, upsert prunes, merged read exact") {
    val dir = java.nio.file.Files.createTempDirectory("sqlkey2").toString
    val base = p.select(
      concat(lit("T"), ($"id" % 7).cast("string")).as("tenant"),
      $"id", $"z")
    GeoParquet.writeKeyed(base, dir, Seq("tenant", "id"), nFiles = 14)
    val total = spark.read.parquet(s"$dir/_manifest").count()
    // struct-typed k0/k1 landed with kn
    val mSchema = spark.read.parquet(s"$dir/_manifest").schema
    assert(mSchema("k0").dataType.isInstanceOf[
      org.apache.spark.sql.types.StructType], "composite key stats must be structs")
    // SQL point+band lookup: tenant pinned, id banded — leading-prefix
    // prune plus the id refinement on single-tenant files
    spark.read.format("graft").load(dir).createOrReplaceTempView("ck")
    val got = spark.sql(
      "SELECT tenant, id, z FROM ck WHERE tenant = 'T3' AND id >= 100 AND id < 3000 ORDER BY id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val want = base.filter($"tenant" === "T3" && $"id" >= 100 && $"id" < 3000)
      .orderBy("id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == want.toSeq && got.nonEmpty)
    val planned = graft.sources.v2.GraftSource.lastPlannedFiles.get(dir).size
    assert(planned < total,
      s"composite key probe planned $planned of $total files")
    // count(*) over the same band: pruned agg plan, exact answer
    graft.sources.v2.GraftSource.lastAggPlan.remove(dir)
    val n = spark.sql(
      "SELECT count(*) AS n FROM ck WHERE tenant = 'T3' AND id >= 100 AND id < 3000")
      .collect()(0).getLong(0)
    assert(n == want.length.toLong)
    val (answered, scanned) = graft.sources.v2.GraftSource.lastAggPlan.get(dir)
    assert(answered + scanned < total,
      s"composite key count planned $answered+$scanned of $total files")
    // composite upsert: a narrow (tenant, id band) replacement
    GeoParquet.upsertKeyed(
      base.filter($"tenant" === "T3" && $"id" >= 100 && $"id" < 3000)
        .withColumn("z", $"z" + 1000.0),
      dir, Seq("tenant", "id"), nFiles = 1)
    val merged = GeoParquet.readMerged(spark, dir)
    assert(merged.count() == base.count(), "composite upsert changed row count")
    val wantZ = base.select($"tenant", $"id",
      when($"tenant" === "T3" && $"id" >= 100 && $"id" < 3000, $"z" + 1000.0)
        .otherwise($"z").as("z"))
    assert(merged.select("tenant", "id", "z")
      .exceptAll(wantZ).count() == 0 &&
      wantZ.exceptAll(merged.select("tenant", "id", "z")).count() == 0,
      "composite upsert merged state diverged")
  }

  test("upsertKeyed refuses unordered key types (float keys)") {
    val dir = java.nio.file.Files.createTempDirectory("upflt").toString
    val base = p.select(($"id" + 0.5).as("fid"), $"z")
    GeoParquet.writeKeyed(base, dir, "fid", nFiles = 2)
    val ex = intercept[IllegalArgumentException] {
      GeoParquet.upsertKeyed(base.limit(5), dir, "fid")
    }
    assert(ex.getMessage.contains("integral or string"))
  }

  test("vacuum: removes crash debris, resolves merge stages, spares the layout") {
    val dir = java.nio.file.Files.createTempDirectory("vac").toString + "/layout"
    GeoParquet.write(p, dir, 250.0)
    GeoParquet.writeManifest(spark, dir)
    // fabricate the three crash-leftover shapes as siblings
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(".staging-dead1", ".pre-compact", ".compact").foreach { sfx =>
      fs.mkdirs(new org.apache.hadoop.fs.Path(dir + sfx))
    }
    // and an unrelated sibling vacuum must NOT touch
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir + "_other"))
    GeoParquet.vacuum(spark, dir, staleAgeMs = 0L)
    Seq(".staging-dead1", ".pre-compact", ".compact").foreach { sfx =>
      assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + sfx)), sfx)
    }
    assert(fs.exists(new org.apache.hadoop.fs.Path(dir + "_other")))
    // layout, manifest, and reads untouched
    assert(GeoParquet.read(spark, dir).count() == p.count())
    assert(GeoParquet.queryBoxViaManifest(spark, dir, (0.0, 200.0), (0.0, 200.0))
      .count() == p.filter($"x" >= 0 && $"x" < 200 &&
        $"y" >= 0 && $"y" < 200).count())
  }

  test("streaming MERGE: CDC batches upsert continuously, reads stay pruned") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("cdc").toString
    val mem = MemoryStream[(Long, Double, Double, Double, Long)]
    val updates = mem.toDF().toDF("id", "x", "y", "z", "t")
    val q = graft.streaming.EventStream.ingestUpserts(
      updates, s"$dir/data", "id", 250.0, s"$dir/ckpt")
    // batch 0 seeds; batch 1 updates id=1 twice (latest-in-batch wins)
    // and inserts id=3
    mem.addData((1L, 10.0, 20.0, 1.0, 100L), (2L, 510.0, -520.0, 2.0, 100L))
    q.processAllAvailable()
    mem.addData((1L, 10.0, 20.0, 7.0, 200L), (1L, 10.0, 20.0, 9.0, 300L),
      (3L, 12.0, 22.0, 3.0, 200L))
    q.processAllAvailable()
    // batch 2: update id=3 — a key first seen as an upsert, proving
    // replacements of replacements die by position
    mem.addData((3L, 12.0, 22.0, 5.0, 400L))
    q.processAllAvailable()
    q.stop()
    val r = GeoParquet.readMerged(spark, s"$dir/data")
      .select("id", "z").as[(Long, Double)].collect().toMap
    assert(r == Map(1L -> 9.0, 2L -> 2.0, 3L -> 5.0))
    // the manifest stayed fresh through every merge — pruned path live
    assert(GeoParquet.readEpoch(spark, s"$dir/data") ==
      spark.read.parquet(s"$dir/data/_manifest")
        .agg(max("epoch")).head().getLong(0))
    val boxed = GeoParquet.queryBoxViaManifest(
      spark, s"$dir/data", (0.0, 100.0), (0.0, 100.0))
    assert(boxed.select("id", "z").as[(Long, Double)].collect().toSet ==
      Set((1L, 9.0), (3L, 5.0)))
  }

  test("curve layouts: pruned reads subtract, compactCurve applies") {
    val dir = java.nio.file.Files.createTempDirectory("del4").toString
    GeoParquet.writeZOrdered(p, dir, 50.0, 8)
    GeoParquet.writeManifest(spark, dir)
    GeoParquet.deleteIds(p.filter($"id" % 4 === 0).select("id"), dir)
    // the manifest stays fresh — the PRUNED curve path runs, with the
    // tombstone subtraction riding it
    val xr = (0.0, 200.0); val yr = (0.0, 200.0)
    val got = GeoParquet.queryBoxCurve(spark, dir, xr, yr, 50.0)
    val want = p.filter($"x" >= 0 && $"x" < 200 && $"y" >= 0 && $"y" < 200 &&
      $"id" % 4 =!= 0).select("id").as[Long].collect().toSet
    assert(got.select("id").as[Long].collect().toSet == want)
    // writeManifest over the raw files re-freshens pruning; the
    // pending tombstones must STILL be subtracted on the pruned path
    GeoParquet.writeManifest(spark, dir)
    val pruned = GeoParquet.queryBoxCurve(spark, dir, xr, yr, 50.0)
    assert(pruned.select("id").as[Long].collect().toSet == want)
    assert(pruned.inputFiles.count(!_.contains("_manifest")) <
      spark.read.parquet(dir).inputFiles.length)
    // compactCurve applies the deletes physically
    GeoParquet.compactCurve(spark, dir, 4)
    assert(GeoParquet.pendingTombstones(spark, dir).isEmpty)
    assert(GeoParquet.read(spark, dir).filter($"id" % 4 === 0).count() == 0)
  }
}
