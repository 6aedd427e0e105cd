package graft

import org.apache.spark.sql.functions._

import graft.sources.GeoParquet

/** `spark.readStream.format("graft")` — the commit-epoch changelog as
  * a Structured Streaming source ([[graft.sources.v2.GraftMicroBatchStream]]).
  * The contract under test: every appended row is delivered exactly
  * once while history is continuous; a preserving history reset
  * (clean compaction / fresh rebuild) fast-forwards a CAUGHT-UP
  * checkpointed consumer instead of re-delivering the re-stamped
  * corpus; a consumer positioned before un-replayable history fails
  * loudly with a restart instruction; a stale manifest refuses.
  */
class GraftStreamSpec extends SparkSpec {
  import spark.implicits._

  private val nextId = new java.util.concurrent.atomic.AtomicInteger(0)

  private def batch(ids: Range) =
    ids.map(i => (i.toLong, (i % 40) * 25.0, (i % 30) * 25.0, i * 1.0))
      .toDF("id", "x", "y", "z")

  private def freshLayout(): String = {
    val dir = java.nio.file.Files.createTempDirectory("gstream").toString
    GeoParquet.write(batch(0 until 40), dir, 250.0)
    GeoParquet.writeManifest(spark, dir)                     // epoch 0 = floor
    GeoParquet.appendWithManifest(batch(100 until 140), dir, 250.0) // 1
    GeoParquet.appendWithManifest(batch(200 until 240), dir, 250.0) // 2
    dir
  }

  private def sinkOf(dir: String, ckpt: String,
                     where: Option[String] = None) = {
    val name = s"gstream_sink_${nextId.incrementAndGet()}"
    val src = spark.readStream.format("graft").load(dir)
    val q = where.fold(src)(src.where(_))
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .start()
    (q, name)
  }

  test("a streaming read delivers the standing commits, then live appends, exactly once") {
    val dir = freshLayout()
    val ckpt = java.nio.file.Files.createTempDirectory("gsck").toString
    val (q, name) = sinkOf(dir, ckpt)
    try {
      q.processAllAvailable()
      val first = spark.table(name).select("id").as[Long].collect().sorted
      assert(first.toSeq ==
        ((0L until 40L) ++ (100L until 140L) ++ (200L until 240L)),
        "initial batches were not delivered exactly once")
      // live append: the next poll sees exactly the new commit
      GeoParquet.appendWithManifest(batch(300 until 330), dir, 250.0)
      q.processAllAvailable()
      val all = spark.table(name).select("id").as[Long].collect().sorted
      assert(all.toSeq == (first ++ (300L until 330L)).sorted.toSeq,
        "a live append was lost or re-delivered")
      // an epoch-stamped positional DELETE is an empty micro-batch:
      // the append changelog never retracts (documented contract)
      GeoParquet.deleteWhere(spark, dir, col("id") < 10)
      q.processAllAvailable()
      assert(spark.table(name).count() == all.length,
        "a merge-on-read delete leaked into the append changelog")
    } finally q.stop()
  }

  test("changelog mode: deletes retract, updates fold, folded state == merged present") {
    val wh = java.nio.file.Files.createTempDirectory("gclog").toString
    val dir = s"$wh/ns/clog"
    GeoParquet.write(batch(0 until 40), dir, 250.0)
    GeoParquet.writeManifest(spark, dir)                            // epoch 0
    GeoParquet.appendWithManifest(batch(100 until 140), dir, 250.0) // epoch 1
    spark.conf.set("spark.sql.catalog.clog",
      classOf[graft.sources.v2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.clog.warehouse", wh)
    val ckpt = java.nio.file.Files.createTempDirectory("gclogck").toString
    val name = s"gstream_clog_${nextId.incrementAndGet()}"
    val q = spark.readStream.format("graft").option("changelog", "true")
      .load(dir)
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table(name).count() == 80)
      assert(spark.table(name).filter($"_change_type" =!= "insert").count() == 0)
      // a DELETE commit delivers the doomed rows' CONTENT tagged "delete"
      GeoParquet.deleteWhere(spark, dir, col("id") < 5)            // epoch 2
      q.processAllAvailable()
      assert(spark.table(name).filter($"_change_type" === "delete")
        .select("id").as[Long].collect().sorted.toSeq == (0L until 5L))
      // an UPDATE is its old copy's delete + its new copy's insert,
      // sharing ONE commit epoch — that is what makes a batch foldable
      spark.sql(
        "UPDATE clog.ns.clog SET z = z + 50000 WHERE id >= 100 AND id < 103")
      q.processAllAvailable()
      val chg = spark.table(name)
        .select("id", "z", "_change_type", "_change_epoch")
        .as[(Long, Double, String, Long)].collect()
      val updDel = chg.filter(c => c._3 == "delete" && c._1 >= 100)
      val updIns = chg.filter(c => c._3 == "insert" && c._2 >= 50000)
      assert(updDel.length == 3 && updIns.length == 3,
        s"update changes: ${updDel.length} deletes, ${updIns.length} inserts")
      assert(updDel.map(_._4).toSet == updIns.map(_._4).toSet,
        "an update's delete and insert must share a commit epoch")
      // the documented fold: per row key, epoch order, deletes before
      // inserts within an epoch — must reproduce the merged present
      val live = chg.groupBy(_._1).flatMap { case (id, cs) =>
        val last = cs.sortBy(c => (c._4, if (c._3 == "delete") 0L else 1L)).last
        if (last._3 == "insert") Some(id -> last._2) else None
      }.toMap
      val merged = GeoParquet.readMerged(spark, dir)
        .select("id", "z").as[(Long, Double)].collect().toMap
      assert(live == merged, "folded changelog diverges from the merged present")
    } finally q.stop()
  }

  test("native streaming sink: each micro-batch is one locked manifest commit") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("gsink").toString + "/lay"
    GeoParquet.write(batch(0 until 40), dir, 250.0)
    GeoParquet.writeManifest(spark, dir) // epoch 0, manifest fresh
    val ckpt = java.nio.file.Files.createTempDirectory("gsinkck").toString
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Double, Double, Double)]
    val q = mem.toDF().toDF("id", "x", "y", "z")
      .writeStream.format("graft")
      .option("checkpointLocation", ckpt)
      .start(dir)
    try {
      mem.addData((100 until 140).map(i =>
        (i.toLong, (i % 40) * 25.0, (i % 30) * 25.0, i * 1.0)): _*)
      q.processAllAvailable()
      mem.addData((200 until 230).map(i =>
        (i.toLong, (i % 40) * 25.0, (i % 30) * 25.0, i * 1.0)): _*)
      q.processAllAvailable()
    } finally q.stop()
    // two micro-batches = two manifest commits; reads stay PRUNED and
    // see every row exactly once
    assert(GeoParquet.readEpoch(spark, dir) == 2L)
    val ids = spark.read.format("graft").load(dir)
      .select("id").as[Long].collect().sorted
    assert(ids.toSeq == ((0L until 40L) ++ (100L until 140L) ++ (200L until 230L)),
      "sink lost or duplicated rows")
    // the manifest stayed fresh through both commits (pruned reads live)
    spark.read.format("graft").load(dir)
      .where("x >= 0 AND x < 200 AND y >= 0 AND y < 200").collect()
    assert(graft.sources.v2.GraftSource.lastPlannedFiles.get(dir).size <
      spark.read.parquet(dir).inputFiles.length)
    // epoch markers recorded: a replayed epoch commits as a no-op
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val markers = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/_batches"))
      .map(_.getPath.getName).filter(_.startsWith("stream-"))
    assert(markers.length == 2, markers.mkString(","))
    // no staged debris left behind after clean commits
    val staging = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).filter(_.startsWith(".staging-stream-"))
    staging.foreach { d =>
      assert(fs.listStatus(new org.apache.hadoop.fs.Path(dir, d)).isEmpty,
        s"staged parts left in $d")
    }
  }

  test("streaming sink through the catalog: writeStream.toTable") {
    implicit val sqlCtx = spark.sqlContext
    val wh = java.nio.file.Files.createTempDirectory("gsinkcat").toString
    val dir = s"$wh/ns/sunk"
    GeoParquet.write(batch(0 until 40), dir, 250.0)
    GeoParquet.writeManifest(spark, dir)
    spark.conf.set("spark.sql.catalog.sink",
      classOf[graft.sources.v2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.sink.warehouse", wh)
    val ckpt = java.nio.file.Files.createTempDirectory("gsinkcatck").toString
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Double, Double, Double)]
    val q = mem.toDF().toDF("id", "x", "y", "z")
      .writeStream.option("checkpointLocation", ckpt)
      .toTable("sink.ns.sunk")
    try {
      mem.addData((100 until 130).map(i =>
        (i.toLong, (i % 40) * 25.0, (i % 30) * 25.0, i * 1.0)): _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.sql("SELECT count(*) AS n FROM sink.ns.sunk")
      .collect()(0).getLong(0) == 70)
  }

  test("changelog mode composes with admission control (bounded CDC batches)") {
    val dir = freshLayout() // epochs 0, 1, 2
    GeoParquet.deleteWhere(spark, dir, col("id") < 5) // epoch 3
    val ckpt = java.nio.file.Files.createTempDirectory("gcladm").toString
    val name = s"gstream_cladm_${nextId.incrementAndGet()}"
    val q = spark.readStream.format("graft")
      .option("changelog", "true").option("maxFilesPerTrigger", "1")
      .load(dir)
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable()
      val chg = spark.table(name)
        .select("id", "_change_type").as[(Long, String)].collect()
      assert(chg.filter(_._2 == "insert").map(_._1).sorted.toSeq ==
        ((0L until 40L) ++ (100L until 140L) ++ (200L until 240L)))
      assert(chg.filter(_._2 == "delete").map(_._1).sorted.toSeq ==
        (0L until 5L))
      // the admission walk split the standing corpus across batches
      assert(q.recentProgress.count(_.numInputRows > 0) >= 3,
        s"expected bounded CDC batches, got ${q.recentProgress.length}")
    } finally q.stop()
  }

  test("maxFilesPerTrigger bounds micro-batches to whole epochs, exactly once") {
    val dir = freshLayout() // 3 commits: floor 0, appends 1 and 2
    val ckpt = java.nio.file.Files.createTempDirectory("gsadm").toString
    val name = s"gstream_adm_${nextId.incrementAndGet()}"
    // 1 file per trigger < any commit's file count, so the admission
    // walk must cap each batch at ONE whole epoch (its atomic unit)
    // instead of the standing corpus in the first batch
    val q = spark.readStream.format("graft")
      .option("maxFilesPerTrigger", "1").load(dir)
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable()
      val ids = spark.table(name).select("id").as[Long].collect().sorted
      assert(ids.toSeq ==
        ((0L until 40L) ++ (100L until 140L) ++ (200L until 240L)),
        "bounded batches lost or duplicated rows")
      val nonEmpty = q.recentProgress.count(_.numInputRows > 0)
      assert(nonEmpty >= 3,
        s"expected >= 3 bounded micro-batches (one per epoch), got $nonEmpty")
    } finally q.stop()
  }

  test("the changelog option on a batch read needs an epoch range (else refuses)") {
    val dir = freshLayout()
    val e = intercept[Throwable] {
      spark.read.format("graft").option("changelog", "true").load(dir)
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("changesFrom")), msgs(e).mkString(" | "))
  }

  test("batch changelog read: the change rows of an epoch range") {
    val dir = freshLayout() // epochs 0 (floor corpus), 1, 2
    GeoParquet.deleteWhere(spark, dir, col("id") >= 200 && col("id") < 210) // 3
    val chg = spark.read.format("graft").option("changelog", "true")
      .option("changesFrom", "0").load(dir)
      .select("id", "_change_type", "_change_epoch")
      .as[(Long, String, Long)].collect()
    // inserts of the appends only (the floor corpus is epoch 0 = before
    // the range), the delete commit's rows retracted with its epoch
    assert(chg.filter(_._2 == "insert").map(_._1).sorted.toSeq ==
      ((100L until 140L) ++ (200L until 240L)))
    assert(chg.filter(_._2 == "delete").map(_._1).sorted.toSeq ==
      (200L until 210L))
    assert(chg.filter(_._2 == "delete").forall(_._3 == 3L))
    // a bounded range serves exactly its commits
    val e1 = spark.read.format("graft").option("changelog", "true")
      .option("changesFrom", "0").option("changesTo", "1").load(dir)
      .select("id").as[Long].collect().sorted
    assert(e1.toSeq == (100L until 140L))
    // above the described prefix: refuse, never serve unsound epochs
    val err = intercept[Throwable] {
      spark.read.format("graft").option("changelog", "true")
        .option("changesFrom", "0").option("changesTo", "99").load(dir)
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(err).exists(_.contains("described")), msgs(err).mkString(" | "))
  }

  test("pushed filters ride the stream (row semantics exact per batch)") {
    val dir = freshLayout()
    val ckpt = java.nio.file.Files.createTempDirectory("gsck2").toString
    val (q, name) = sinkOf(dir, ckpt, Some("id >= 100 AND id < 220"))
    try {
      q.processAllAvailable()
      val got = spark.table(name).select("id").as[Long].collect().sorted
      assert(got.toSeq == ((100L until 140L) ++ (200L until 220L)),
        s"filtered stream delivered ${got.length} rows")
    } finally q.stop()
  }

  /** Parquet file sink — the fault-tolerant sink the RESTART tests
    * need (memory sinks refuse checkpoint recovery).  Reading the
    * output dir respects its `_spark_metadata` commit log, so the
    * read-back sees exactly the committed batches.
    */
  private def fileSinkOf(dir: String, ckpt: String, out: String) =
    spark.readStream.format("graft").load(dir)
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .start()

  test("a caught-up consumer fast-forwards across a preserving compaction") {
    val dir = freshLayout()
    val ckpt = java.nio.file.Files.createTempDirectory("gsck3").toString
    val out = java.nio.file.Files.createTempDirectory("gsout3").toString
    val q1 = fileSinkOf(dir, ckpt, out)
    q1.processAllAvailable() // consumed through epoch 2 (all data)
    q1.stop()
    // preserving reset: compaction from a FRESH manifest + rebuild
    GeoParquet.compact(spark, dir)
    GeoParquet.writeManifest(spark, dir)
    assert(GeoParquet.changelogFloor(spark, dir).preserved,
      "a fresh-manifest compaction must record a preserving reset")
    GeoParquet.appendWithManifest(batch(400 until 420), dir, 250.0)
    // restart from the SAME checkpoint: only the post-reset append
    // arrives — nothing re-delivered, nothing lost
    val q2 = fileSinkOf(dir, ckpt, out)
    try {
      q2.processAllAvailable()
      val got = spark.read.parquet(out).select("id").as[Long].collect().sorted
      assert(got.toSeq ==
        ((0L until 40L) ++ (100L until 140L) ++ (200L until 240L) ++
          (400L until 420L)),
        s"fast-forward across the compaction mis-delivered: ${got.length} rows")
    } finally q2.stop()
  }

  test("a NOT-caught-up consumer fails loudly across a reset (never silent re-delivery)") {
    val dir = freshLayout()
    val ckpt = java.nio.file.Files.createTempDirectory("gsck4").toString
    val out = java.nio.file.Files.createTempDirectory("gsout4").toString
    val q1 = fileSinkOf(dir, ckpt, out)
    q1.processAllAvailable()
    q1.stop()
    // an UNCONSUMED commit lands, then history resets over it: the
    // checkpointed offset is below the retired era's last data epoch,
    // so exactly-once resumption is impossible
    GeoParquet.appendWithManifest(batch(500 until 520), dir, 250.0)
    GeoParquet.compact(spark, dir)
    GeoParquet.writeManifest(spark, dir)
    val q2 = fileSinkOf(dir, ckpt, out)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable()
      q2.awaitTermination(30000)
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else String.valueOf(t.getMessage) +: chain(t.getCause)
    assert(chain(e).exists(_.contains("history was rewritten")),
      chain(e).mkString(" | "))
    q2.stop()
  }

  test("a degraded append stalls the stream; the repairing rebuild fails stragglers loudly") {
    val dir = freshLayout()
    GeoParquet.append(batch(600 until 610), dir, 250.0) // degraded: stale manifest
    val ckpt = java.nio.file.Files.createTempDirectory("gsck5").toString
    val out = java.nio.file.Files.createTempDirectory("gsout5").toString
    val q = fileSinkOf(dir, ckpt, out)
    q.processAllAvailable()
    // the stream advances only through the DESCRIBED prefix: the
    // unmanifested batch has no epoch, so it is not (yet) delivered —
    // a stall, not a spurious failure
    assert(spark.read.parquet(out).count() == 120,
      "a stale manifest leaked undescribed rows into the stream")
    // the repair verb resets the floor NON-preserving (the healed
    // rows join the floor corpus) — the running consumer now fails
    // loudly instead of silently skipping them
    GeoParquet.writeManifest(spark, dir)
    assert(!GeoParquet.changelogFloor(spark, dir).preserved)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
      q.awaitTermination(30000)
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else String.valueOf(t.getMessage) +: chain(t.getCause)
    assert(chain(e).exists(_.contains("history was rewritten")),
      chain(e).mkString(" | "))
    q.stop()
    // a fresh consumer serves the healed corpus in full
    val ckpt2 = java.nio.file.Files.createTempDirectory("gsck6").toString
    val out2 = java.nio.file.Files.createTempDirectory("gsout6").toString
    val q2 = fileSinkOf(dir, ckpt2, out2)
    try {
      q2.processAllAvailable()
      assert(spark.read.parquet(out2).count() == 40 + 40 + 40 + 10)
    } finally q2.stop()
    // and a pinned snapshot cannot stream at all
    val snapErr = intercept[Throwable] {
      spark.readStream.format("graft").option("snapshot", "0").load(dir)
        .writeStream.format("memory").queryName("gstream_snap")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("gsck7").toString)
        .start().processAllAvailable()
    }
    def chain2(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else String.valueOf(t.getMessage) +: chain2(t.getCause)
    assert(chain2(snapErr).exists(_.contains("cannot")),
      chain2(snapErr).mkString(" | "))
  }

  test("a windowed aggregation over the stream sees exactly the appended rows") {
    // the verdict's 'done' shape: three appends → streaming agg state
    // holds exactly their rows, replayable across restart
    val dir = freshLayout()
    val ckpt = java.nio.file.Files.createTempDirectory("gsck8").toString
    val name = s"gstream_agg_${nextId.incrementAndGet()}"
    val q = spark.readStream.format("graft").load(dir)
      .groupBy((col("id") % 10).as("bucket"))
      .agg(count("*").as("n"), sum("z").as("sum_z"))
      .writeStream.format("memory").queryName(name)
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable()
      val want = batch(0 until 40)
        .unionByName(batch(100 until 140)).unionByName(batch(200 until 240))
        .groupBy((col("id") % 10).as("bucket"))
        .agg(count("*").as("n"), sum("z").as("sum_z"))
      val got = spark.table(name)
      assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0,
        "streaming aggregate state diverged from the appended rows")
    } finally q.stop()
  }

  test("manifest coalesce: identical rows, one part, and a checkpointed stream polls across it") {
    val dir = freshLayout() // epochs 0..2, three manifest parts
    GeoParquet.appendWithManifest(batch(300 until 320), dir, 250.0) // 3
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def manifestParts() = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$dir/_manifest"))
      .count(_.getPath.getName.endsWith(".parquet"))
    assert(manifestParts() >= 4, "expected one manifest part per commit")
    val ckpt = java.nio.file.Files.createTempDirectory("gmcck").toString
    val (q, name) = sinkOf(dir, ckpt)
    try {
      q.processAllAvailable()
      val before = spark.table(name).count()
      val rowsBefore = spark.read.parquet(s"$dir/_manifest")
        .orderBy("epoch", "file").collect().toSeq
      val epochBefore = GeoParquet.readEpoch(spark, dir)
      GeoParquet.compactManifest(spark, dir)
      // identical rows, single part, NO history reset: epoch and
      // manifest freshness untouched
      assert(manifestParts() == 1, "coalesce left multiple parts")
      assert(spark.read.parquet(s"$dir/_manifest")
        .orderBy("epoch", "file").collect().toSeq == rowsBefore,
        "coalesce changed manifest rows")
      assert(GeoParquet.readEpoch(spark, dir) == epochBefore,
        "metadata compaction must not advance the commit epoch")
      // the checkpointed stream continues across the coalesce — no
      // restart error, and the next live commit arrives exactly once
      GeoParquet.appendWithManifest(batch(400 until 420), dir, 250.0)
      q.processAllAvailable()
      assert(spark.table(name).count() == before + 20,
        "stream lost or re-delivered rows across the manifest coalesce")
      // pruned reads stay pruned (freshness survived the swap)
      spark.read.format("graft").load(dir)
        .where("x >= 0 AND x < 200 AND y >= 0 AND y < 200").collect()
      assert(graft.sources.v2.GraftSource.lastPlannedFiles.get(dir).size <
        spark.read.parquet(dir).inputFiles.length)
    } finally q.stop()
  }

  test("the AUTO-gated coalesce fires from inside an append; the part bound holds and a checkpointed stream polls across it") {
    val dir = freshLayout() // epochs 0..2, three manifest parts
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def manifestParts() = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$dir/_manifest"))
      .count(_.getPath.getName.endsWith(".parquet"))
    val ckpt = java.nio.file.Files.createTempDirectory("gmack").toString
    val (q, name) = sinkOf(dir, ckpt)
    try {
      q.processAllAvailable()
      val before = spark.table(name).count()
      // a month of minutely CDC, miniaturized: tiny commits land one
      // manifest part each until the gate (maxParts=32) trips INSIDE
      // appendWithManifest — no operator CALL anywhere.  The observed
      // part count must never exceed the bound after any commit.
      var coalesced = false
      var n = 0
      var appended = 0L
      while (n < 40 && !coalesced) {
        GeoParquet.appendWithManifest(
          batch((1000 + n * 10) until (1000 + n * 10 + 4)), dir, 250.0)
        appended += 4
        val p = manifestParts()
        assert(p <= 32,
          s"auto-gate bound violated: $p manifest parts after commit $n")
        coalesced = p == 1
        n += 1
      }
      assert(coalesced,
        s"40 tiny commits never tripped the auto coalesce ($n commits, " +
          s"${manifestParts()} parts)")
      // the checkpointed stream polls across the auto-coalesce: every
      // tiny commit delivered exactly once, no restart error
      q.processAllAvailable()
      assert(spark.table(name).count() == before + appended,
        "stream lost or re-delivered rows across the AUTO manifest coalesce")
      // freshness survived: pruned reads still prune
      spark.read.format("graft").load(dir)
        .where("x >= 0 AND x < 200 AND y >= 0 AND y < 200").collect()
      assert(graft.sources.v2.GraftSource.lastPlannedFiles.get(dir).size <
        spark.read.parquet(dir).inputFiles.length)
    } finally q.stop()
  }

  test("rollback invalidates checkpointed streams loudly; a fresh stream re-delivers the standing corpus") {
    val dir = freshLayout() // epochs 0..2
    val ckpt = java.nio.file.Files.createTempDirectory("grbck").toString
    val out = java.nio.file.Files.createTempDirectory("grbout").toString
    // a FILE sink (memory sinks refuse checkpoint recovery): consume
    // everything, checkpoint past epoch 2, stop
    def fileSink() = spark.readStream.format("graft").load(dir)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).start()
    val q = fileSink()
    try q.processAllAvailable() finally q.stop()
    // undo epoch 2, then commit fresh data: the old consumer's
    // delivered rows were un-done — it must NOT silently continue
    GeoParquet.rollbackTo(spark, dir, 1L)
    GeoParquet.appendWithManifest(batch(400 until 420), dir, 250.0)
    val q2 = fileSink() // resume from the same checkpoint
    val ex = intercept[Exception] { q2.processAllAvailable() }
    try {
      def msgs(t: Throwable): String =
        if (t == null) "" else t.getMessage + " | " + msgs(t.getCause)
      assert(msgs(ex).contains("fresh checkpoint"),
        s"stale consumer must fail with the restart instruction: ${msgs(ex)}")
    } finally q2.stop()
    // a fresh checkpoint re-delivers the rolled-back standing corpus
    // plus the new commit, exactly once
    val ckpt2 = java.nio.file.Files.createTempDirectory("grbck2").toString
    val (q3, name3) = sinkOf(dir, ckpt2)
    try {
      q3.processAllAvailable()
      val ids = spark.table(name3).select("id").as[Long].collect().sorted
      assert(ids.toSeq ==
        ((0L until 40L) ++ (100L until 140L) ++ (400L until 420L)),
        "fresh stream after rollback lost or duplicated rows")
    } finally q3.stop()
  }

  test("streaming sink into a DDL keyed table: batches mirror the key, probes prune") {
    implicit val sqlCtx = spark.sqlContext
    // the 61z32 CDC table shape (CREATE TABLE … 'key'='tenant,id'),
    // fed by the native sink: each micro-batch must route through the
    // keyed append — its cluster key MIRRORED from the data columns,
    // never recomputed as a spatial key — so key pruning is sound on
    // a table that only ever ingested from a stream
    val dir = java.nio.file.Files.createTempDirectory("gsinkkey")
      .toString + "/cdc"
    GeoParquet.createKeyedLayout(spark, dir,
      Seq.empty[(Long, Long, Double)].toDF("tenant", "id", "v").schema,
      Seq("tenant", "id"))
    val ckpt = java.nio.file.Files.createTempDirectory("gsinkkeyck").toString
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Double)]
    val q = mem.toDF().toDF("tenant", "id", "v")
      .writeStream.format("graft")
      .option("checkpointLocation", ckpt)
      .start(dir)
    try {
      mem.addData((0 until 200).map(i =>
        ((i % 5).toLong, i.toLong, i * 1.0)): _*)
      q.processAllAvailable()
      mem.addData((200 until 400).map(i =>
        ((5 + i % 5).toLong, i.toLong, i * 1.0)): _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(GeoParquet.readEpoch(spark, dir) == 2L)
    // each micro-batch manifested a struct-typed DATA-key range
    val ranges = spark.read.parquet(s"$dir/_manifest")
      .select($"k0.tenant", $"k1.tenant").as[(Long, Long)].collect().toSet
    assert(ranges == Set((0L, 4L), (5L, 9L)),
      s"streamed batches manifested wrong leading-key ranges: $ranges")
    // a tenant probe prunes to the one file that can hold it and
    // sees exactly the streamed rows
    val got = spark.read.format("graft").load(dir)
      .where("tenant = 7").select("id").as[Long].collect().sorted.toSeq
    val want = (200 until 400).filter(i => 5 + i % 5 == 7).map(_.toLong)
    assert(got == want, s"keyed probe diverged: ${got.length} rows")
    assert(graft.sources.v2.GraftSource.lastPlannedFiles.get(dir).size == 1,
      "tenant probe did not prune to the single streamed file")
  }

  test("sink crash-injection: a marker-carrying commit interrupted at any point replays exactly once") {
    // The sink's replay barrier is atomic with the data: the marker is
    // stamped INSIDE the append's locked commit, journaled by an
    // atomic `.intent` before the first rename.  This test plants the
    // exact on-disk states a kill -9 leaves at each interruption point
    // and asserts the replay's healMarkedCommit classification makes
    // the batch land exactly once.
    val dir = java.nio.file.Files.createTempDirectory("gsinkcrash")
      .toString + "/lay"
    GeoParquet.write(batch(0 until 40), dir, 250.0)
    GeoParquet.writeManifest(spark, dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = s"$dir/_batches/stream-qX-7"

    // crash BEFORE the intent journal: nothing visible landed — the
    // replay must run the commit in full
    assert(!GeoParquet.healMarkedCommit(spark, dir, marker),
      "a commit that never journaled intent must replay in full")

    // crash BETWEEN the intent journal and the renames — the exact
    // window where the old two-step protocol duplicated: epoch
    // bumped, batch fully staged, intent journaled, marker missing
    val tmp = dir + ".staging-crash7"
    batch(500 until 530)
      .withColumn("bin_x", graft.operators.GeoOps.binOf(col("x"), 250.0))
      .withColumn("bin_y", graft.operators.GeoOps.binOf(col("y"), 250.0))
      .write.partitionBy("bin_x", "bin_y").parquet(tmp)
    val epochFile = java.nio.file.Paths.get(dir, "_epoch")
    val e0 = GeoParquet.readEpoch(spark, dir)
    java.nio.file.Files.write(epochFile, (e0 + 1).toString.getBytes("UTF-8"))
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/_batches"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/_batches", "stream-qX-7.intent"),
      tmp.getBytes("UTF-8"))
    assert(GeoParquet.healMarkedCommit(spark, dir, marker),
      "an intent-journaled commit must heal forward, not replay")
    assert(fs.exists(new org.apache.hadoop.fs.Path(marker)),
      "heal did not stamp the marker")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(marker + ".intent")),
      "heal left the intent journal behind")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(tmp)),
      "heal did not consume the staging dir")
    val ids = spark.read.format("graft").load(dir)
      .select("id").as[Long].collect().sorted
    assert(ids.toSeq == ((0L until 40L) ++ (500L until 530L)),
      "rolled-forward batch lost or duplicated rows")
    // replay of the replay: still a no-op
    assert(GeoParquet.healMarkedCommit(spark, dir, marker))
    assert(spark.read.format("graft").load(dir).count() == 70)
    // the abandoned stats left the manifest honestly stale (reads fell
    // back unpruned above); the repair verb restores pruning
    GeoParquet.writeManifest(spark, dir)
    assert(spark.read.format("graft").load(dir).count() == 70)

    // crash AFTER the renames, BEFORE the marker stamp: intent
    // present, staging consumed — the heal only re-stamps the marker
    val marker2 = s"$dir/_batches/stream-qX-8"
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/_batches", "stream-qX-8.intent"),
      (dir + ".staging-gone").getBytes("UTF-8"))
    assert(GeoParquet.healMarkedCommit(spark, dir, marker2),
      "a renamed-but-unmarked commit must no-op on replay")
    assert(fs.exists(new org.apache.hadoop.fs.Path(marker2)))
    assert(spark.read.format("graft").load(dir).count() == 70,
      "marker-only heal must not change data")
  }
}
