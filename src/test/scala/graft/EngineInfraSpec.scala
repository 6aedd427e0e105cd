package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.functions.VectorExprs
import graft.multimodal.MediaOps
import graft.sources.GeoParquet
import graft.streaming.EventStream

class EngineInfraSpec extends SparkSpec {
  import spark.implicits._

  test("DotProduct expression matches the HOF fold bit-for-bit and codegens") {
    val df = graft.core.Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
    val both = df.select(
      VectorExprs.dotp(col("v"), col("v")).as("native"),
      expr("aggregate(zip_with(v, v, (x, y) -> x * y), cast(0.0 as double), (acc, x) -> acc + x)").as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
    // the native expression stays inside whole-stage codegen — the HOF
    // form is a CodegenFallback and kicks its whole Project out of it
    // "*(n) " prefixes mark WholeStageCodegen stages in the plan tree
    val nativeOnly = df.select(VectorExprs.dotp(col("v"), col("v")).as("d"))
    val nativeLine = nativeOnly.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("dot_product")).get
    assert(nativeLine.trim.startsWith("*("))
    val hofOnly = df.select(
      expr("aggregate(zip_with(v, v, (x, y) -> x * y), cast(0.0 as double), (acc, x) -> acc + x)").as("d"))
    val hofLine = hofOnly.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("aggregate(zip_with")).get
    assert(!hofLine.trim.startsWith("*("))
  }

  test("TopTrigram expression matches the composed form and codegens") {
    val native = graft.operators.TextOps.charNgrams(spark, sf)
    val composed = graft.operators.TextOps.charNgramsComposed(spark, sf)
    assert(native.exceptAll(composed).count() == 0)
    assert(composed.exceptAll(native).count() == 0)
    // stays inside whole-stage codegen ("*(n)" stage marker)
    val docs = graft.core.Tables.t(spark, sf, "documents")
    val line = docs.select(graft.functions.TopTrigram.of(col("text")))
      .queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("top_trigram")).get
    assert(line.trim.startsWith("*("))
    // the plan has no exchange at all before the final sort
    val plan = native.queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("Exchange")) <= 1) // only the orderBy range exchange
  }

  test("WordShingleHashes matches the composed explode+md5+distinct form") {
    val docs = graft.core.Tables.t(spark, sf, "documents")
    val native = docs.select(col("doc_id"),
      explode(graft.functions.WordShingleHashes.of(col("text"), 5)).as("gh"))
    val composed = docs
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, greatest(size(split(text,' ')) - 4, 1)),
          |          i -> concat_ws(' ', slice(split(text,' '), i, 5)))""".stripMargin)).as("g"))
      .select(col("doc_id"), graft.operators.TextOps.md5long(col("g")).as("gh"))
      .distinct()
    assert(native.exceptAll(composed).count() == 0)
    assert(composed.exceptAll(native).count() == 0)
    // k=1 degenerates to distinct token hashes
    val nat1 = docs.select(col("doc_id"),
      explode(graft.functions.WordShingleHashes.of(col("text"), 1)).as("th"))
    val comp1 = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok")).distinct()
      .select(col("doc_id"), graft.operators.TextOps.md5long(col("tok")).as("th"))
    assert(nat1.exceptAll(comp1).count() == 0 && comp1.exceptAll(nat1).count() == 0)
    // stays inside whole-stage codegen
    val line = docs.select(graft.functions.WordShingleHashes.of(col("text"), 5))
      .queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("word_shingle_hashes")).get
    assert(line.trim.startsWith("*("))
  }

  test("GeoParquet: partitioned layout prunes bins at planning time") {
    val dir = Files.createTempDirectory("geoparquet").toString
    val pts = graft.core.Tables.eventsPoints(spark, sf)
    GeoParquet.write(pts, dir, 100.0)
    // directory layout is the index
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.exists(_.startsWith("bin_x=")))
    // box query correctness vs direct filter on the raw view
    val boxed = GeoParquet.queryBox(spark, dir, (-200L, 0L), (-200L, 0L))
    val expected = pts
      .withColumn("bx", graft.operators.GeoOps.binOf(col("x"), 100))
      .withColumn("by", graft.operators.GeoOps.binOf(col("y"), 100))
      .filter(col("bx").between(-200, 0) && col("by").between(-200, 0))
    assert(boxed.count() == expected.count() && boxed.count() > 0)
    // pruning proof: bin predicates became PartitionFilters in the scan
    val explained = boxed.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(explained.contains("PartitionFilters"))
    val pf = explained.linesIterator.find(_.contains("PartitionFilters")).get
    assert(pf.contains("bin_x") && pf.contains(">="))
    // bin list query with pad
    val binned = GeoParquet.queryBins(spark, dir, Seq((0L, 0L)), pad = 1, delta = 100.0)
    val expected2 = pts
      .withColumn("bx", graft.operators.GeoOps.binOf(col("x"), 100))
      .withColumn("by", graft.operators.GeoOps.binOf(col("y"), 100))
      .filter(col("bx").between(-100, 100) && col("by").between(-100, 100))
    assert(binned.count() == expected2.count())
    // a large bin list switches to the broadcast-semi-join path and
    // returns the same rows as the OR-chain would
    val manyBins = for { bx <- -1000L to 1000L by 100; by <- Seq(0L) } yield (bx, by)
    assert(manyBins.size * 9 > GeoParquet.OrChainMaxBins)
    val wide = GeoParquet.queryBins(spark, dir, manyBins, pad = 1, delta = 100.0)
    val expected3 = pts
      .withColumn("bx", graft.operators.GeoOps.binOf(col("x"), 100))
      .withColumn("by", graft.operators.GeoOps.binOf(col("y"), 100))
      .filter(col("by").between(-100, 100))
    assert(wide.count() == expected3.count())
  }

  test("streaming windowed counts with watermark over a memory stream") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double, Long)]
    val events = mem.toDF().toDF("ts", "event_type", "value", "event_id")
    val q = EventStream.windowedCounts(events, "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("update").start()
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    mem.addData((ts(0), "click", 1.5, 1L), (ts(1), "click", 2.5, 2L), (ts(6), "view", 3.0, 3L))
    q.processAllAvailable()
    val out = spark.table("win_counts").collect()
    q.stop()
    assert(out.nonEmpty)
    val click = out.find(_.getAs[String]("event_type") == "click").get
    assert(click.getAs[Long]("n_events") == 2 && click.getAs[Long]("value_cents") == 400)
  }

  test("streaming ingest maintains a queryable GeoParquet layout + compaction") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("geo_ingest")
    val mem = MemoryStream[(Long, Double, Double, Double)]
    val pts = mem.toDF().toDF("id", "x", "y", "z")
    val q = EventStream.ingestGeoParquet(pts, s"$dir/data", 100.0,
      s"$dir/ckpt")
    mem.addData((1L, 10.0, 20.0, 1.0), (2L, 510.0, -520.0, 2.0))
    q.processAllAvailable()
    mem.addData((3L, 12.0, 22.0, 3.0)) // lands in the same bin as id=1
    q.processAllAvailable()
    q.stop()
    // layout is immediately queryable with bin pruning
    val all = GeoParquet.read(spark, s"$dir/data")
    assert(all.count() == 3)
    val boxed = GeoParquet.queryBox(spark, s"$dir/data", (0L, 100L), (0L, 100L))
    assert(boxed.select("id").as[Long].collect().toSet == Set(1L, 3L))
    // two appends → ≥2 files in bin (0,0); compaction folds them to 1
    def filesInBin = new java.io.File(s"$dir/data/bin_x=0/bin_y=0")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(filesInBin >= 2)
    // the scheduling gate fires above the per-bin threshold…
    assert(GeoParquet.compactIfNeeded(spark, s"$dir/data", maxFilesPerBin = 1))
    assert(filesInBin == 1)
    // …and declines on an already-compact layout
    assert(!GeoParquet.compactIfNeeded(spark, s"$dir/data", maxFilesPerBin = 1))
    assert(GeoParquet.read(spark, s"$dir/data").count() == 3)
    assert(GeoParquet.queryBox(spark, s"$dir/data", (0L, 100L), (0L, 100L))
      .count() == 2)
    // idempotency markers survive compaction (a restarted stream must
    // not re-append committed batches)
    assert(new java.io.File(s"$dir/data/_batches").list().nonEmpty)
  }

  test("streaming granule ingest: arriving .h5 files extend the layout and partial index") {
    import graft.sources.{Atl06H5, SourceRegistry}
    val dir = Files.createTempDirectory("gran_ingest")
    val watch = s"$dir/arrivals"
    new java.io.File(watch).mkdirs()
    def granule(g: Long, ids: Seq[Long]): Array[Byte] =
      Atl06H5.granuleBytes(
        ids.map(i => (i, -70.0 - i * 1e-4, 45.0 + i * 1e-4, 100.0 + i, i * 0.1)), g)
    def drop(name: String, b: Array[Byte]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$watch/$name"), b)
    drop("ATL06_g0.h5", granule(0, 0L until 60L))
    val decodesBefore = Atl06H5.decodeCount.get()
    val q = EventStream.ingestGranules(spark, watch, s"$dir/data", s"$dir/idx",
      400.0, s"$dir/ckpt")
    q.processAllAvailable()
    assert(GeoParquet.read(spark, s"$dir/data").count() == 60)
    // the batch's emptiness check, point append, and index rollup all
    // ride ONE cached pass — each granule decodes exactly once
    assert(Atl06H5.decodeCount.get() - decodesBefore == 1,
      "granule decoded more than once per micro-batch")
    // a LATE-arriving granule extends both sides without a rescan
    drop("ATL06_g1.h5", granule(1, 60L until 100L))
    q.processAllAvailable()
    q.stop()
    assert(GeoParquet.read(spark, s"$dir/data").count() == 100)
    assert(Atl06H5.decodeCount.get() - decodesBefore == 2,
      "late batch re-decoded earlier granules")
    // the partial-index table adopts through the registry and its
    // from_list merge equals a direct rollup over ALL granules
    val merged = graft.operators.GeoOps.mergeIndexes(Seq(
      SourceRegistry.forFile(spark, "geoindex", s"$dir/idx", 400.0)))
      .select("bin_x", "bin_y", "n_points", "id_min", "id_max")
    val expected = SourceRegistry.indexOf(
      SourceRegistry.readAs(spark, "atl06_h5", watch), 400.0)
    assert(merged.as[(Long, Long, Long, Long, Long)].collect().toSet ==
      expected.as[(Long, Long, Long, Long, Long)].collect().toSet)
    assert(merged.count() > 0)
    // batch markers recorded for replay idempotency
    assert(new java.io.File(s"$dir/idx/_batches").list().nonEmpty)
  }

  test("stream-static enrichment joins a broadcast dimension per batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long)]
    val events = mem.toDF().toDF("ts", "user_id")
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val q = EventStream.enrich(events, dim, "user_id")
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    mem.addData((java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L),
      (java.sql.Timestamp.valueOf("2024-01-01 10:01:00"), 3L))
    q.processAllAvailable()
    val out = spark.table("enriched").collect()
    q.stop()
    assert(out.length == 2)
    assert(out.find(_.getAs[Long]("user_id") == 1L).get.getAs[String]("tier") == "gold")
    assert(out.find(_.getAs[Long]("user_id") == 3L).get.isNullAt(2)) // left join keeps unmatched
  }

  test("stream-static as-of enrichment picks the latest ref row per batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long)]
    val events = mem.toDF().toDF("k", "t", "id")
    val ref = Seq((1L, 100L, 20L, 1.0), (1L, 200L, 21L, 2.0))
      .toDF("k", "t", "id", "v")
    val got = scala.collection.mutable.ArrayBuffer[(Long, Option[Long])]()
    val q = EventStream.asofEnrich(events, ref, "k", "t", "id") { out =>
      got ++= out.select(col("id"), col("r_id"))
        .collect().map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long])))
    }
    mem.addData((1L, 150L, 10L), (1L, 250L, 11L))
    q.processAllAvailable()
    mem.addData((1L, 90L, 12L)) // a later batch re-resolves independently
    q.processAllAvailable()
    q.stop()
    assert(got.toMap == Map(10L -> Some(20L), 11L -> Some(21L), 12L -> None))
  }

  test("streaming dedup keeps first occurrence within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double, Long)]
    val events = mem.toDF().toDF("ts", "event_type", "value", "event_id")
    val q = EventStream.streamingDedup(events, "10 minutes")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    // two exact duplicates of (click, 1.5) + one distinct event
    mem.addData((ts(0), "click", 1.5, 1L), (ts(1), "click", 1.5, 2L),
      (ts(2), "view", 2.0, 3L))
    q.processAllAvailable()
    // a later-batch duplicate is also dropped (state held within watermark)
    mem.addData((ts(3), "click", 1.5, 4L))
    q.processAllAvailable()
    val out = spark.table("dedup_stream").collect()
    q.stop()
    assert(out.length == 2)
    assert(out.map(_.getAs[Long]("event_id")).toSet == Set(1L, 3L))
  }

  test("streaming df-state: streamed batches reproduce the batch dfCappedApprox kept-set") {
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.core.Tables.t(spark, sf, "documents")
      .select($"doc_id", $"text").limit(120).localCheckpoint()
    val stateDir = java.nio.file.Files.createTempDirectory("dfstate").toString
    val mem = MemoryStream[(Long, String)]
    val q = EventStream.ingestShingleDfState(
      mem.toDF().toDF("doc_id", "text"), stateDir, d = 4, w = 512)
    // three micro-batches partitioning the corpus
    val all = docs.as[(Long, String)].collect()
    (0 until 3).foreach { b =>
      mem.addData(all.filter(_._1 % 3 == b).toIndexedSeq: _*)
      q.processAllAvailable()
    }
    q.stop()
    // merged per-batch sketches == the one-pass corpus sketch, so the
    // streamed kept-set must equal the batch operator's EXACTLY
    // (a small w forces real collisions — the equality must survive them)
    val streamed = EventStream
      .dfCappedShinglesFromState(spark, stateDir, dfCap = 10, d = 4, w = 512)
      .select("doc_id", "gh").as[(Long, Long)].collect().toSet
    val batch = graft.operators.Dedup
      .dfCappedApprox(graft.operators.Dedup.shinglesOf(docs),
        dfCap = 10, d = 4, w = 512)
      .select("doc_id", "gh").as[(Long, Long)].collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
    // and the cap bit: something was actually dropped
    val rawN = graft.operators.Dedup.shinglesOf(docs).count()
    assert(streamed.size < rawN, s"df cap dropped nothing (raw $rawN)")
    // restart-REPLAY against the same state dir: foreachBatch is
    // at-least-once, so re-running every batch must be a pure no-op —
    // batchId-keyed overwrites, nothing appended or merged twice
    val mem2 = MemoryStream[(Long, String)]
    val q2 = EventStream.ingestShingleDfState(
      mem2.toDF().toDF("doc_id", "text"), stateDir, d = 4, w = 512)
    (0 until 3).foreach { b =>
      mem2.addData(all.filter(_._1 % 3 == b).toIndexedSeq: _*)
      q2.processAllAvailable()
    }
    q2.stop()
    val replayed = EventStream
      .dfCappedShinglesFromState(spark, stateDir, dfCap = 10, d = 4, w = 512)
      .select("doc_id", "gh").as[(Long, Long)].collect().toSet
    assert(replayed == batch, "replay must not change the streamed state")
  }

  test("streaming geo-index builder bins events on the fly") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long)]
    val events = mem.toDF().toDF("ts", "event_id")
    val q = EventStream.streamingGeoIndex(events.withColumn("event_type", lit("x")))
      .writeStream.format("memory").queryName("geo_stream")
      .outputMode("update").start()
    mem.addData((java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 42L))
    q.processAllAvailable()
    val rows = spark.table("geo_stream").collect()
    q.stop()
    assert(rows.length == 1 && rows.head.getAs[Long]("n_points") == 1)
  }

  test("stateful streaming sessionization closes sessions on gap") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long)]
    val events = mem.toDF().toDF("ts", "user_id")
    val q = EventStream.sessionize(events, gapMs = 60000L)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // user 7: two events 10s apart, then a 10-minute gap → first
    // session closes when the post-gap event arrives
    mem.addData((ts("2024-01-01 10:00:00"), 7L), (ts("2024-01-01 10:00:10"), 7L))
    q.processAllAvailable()
    mem.addData((ts("2024-01-01 10:10:00"), 7L))
    q.processAllAvailable()
    val out = spark.table("sessions").as[graft.streaming.ClosedSession].collect()
    q.stop()
    assert(out.length == 1)
    assert(out.head.user_id == 7L && out.head.n_events == 2)
  }

  test("stream-stream interval join attributes purchases to recent clicks") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, String, Long, Double)]
    val events = mem.toDF().toDF("ts", "user_id", "event_type", "event_id", "value")
    val q = EventStream.purchaseAttribution(events)
      .writeStream.format("memory").queryName("attribution")
      .outputMode("append").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    mem.addData(
      (ts("2024-01-01 10:00:00"), 1L, "click", 100L, 0.0),
      (ts("2024-01-01 10:05:00"), 1L, "purchase", 101L, 9.99),
      (ts("2024-01-01 09:30:00"), 1L, "click", 99L, 0.0),   // too old: > 10 min before
      (ts("2024-01-01 10:06:00"), 2L, "purchase", 102L, 5.0)) // no click from user 2
    q.processAllAvailable()
    val out = spark.table("attribution").collect()
    q.stop()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("purchase_id") == 101L &&
           out.head.getAs[Long]("click_id") == 100L)
  }

  test("stream-stream as-of keeps only the latest click per purchase") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, String, Long, Double)]
    val events = mem.toDF().toDF("ts", "user_id", "event_type", "event_id", "value")
    val q = EventStream.purchaseAsof(events)
      .writeStream.format("memory").queryName("asof_stream")
      .outputMode("append").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    mem.addData(
      (ts("2024-01-01 10:00:00"), 1L, "click", 100L, 0.0),
      (ts("2024-01-01 10:04:00"), 1L, "click", 103L, 0.0),  // later → wins
      (ts("2024-01-01 10:05:00"), 1L, "purchase", 101L, 9.99))
    q.processAllAvailable()
    // the global watermark is the min over BOTH sides, so the flush
    // must advance clicks AND purchases past window end + delay; a
    // second flush covers the one-batch propagation lag of chained
    // stateful operators
    mem.addData((ts("2024-01-01 11:00:00"), 9L, "click", 999L, 0.0),
      (ts("2024-01-01 11:00:00"), 9L, "purchase", 899L, 1.0))
    q.processAllAvailable()
    mem.addData((ts("2024-01-01 12:00:00"), 9L, "click", 998L, 0.0),
      (ts("2024-01-01 12:00:00"), 9L, "purchase", 898L, 1.0))
    q.processAllAvailable()
    val out = spark.table("asof_stream").collect()
    q.stop()
    // exactly one row for the probed purchase (flush rows also emit)
    val rs = out.filter(_.getAs[Long]("purchase_id") == 101L)
    assert(rs.length == 1)
    assert(rs.head.getAs[Long]("click_id") == 103L &&
           rs.head.getAs[Long]("n_candidate_clicks") == 2L)
  }

  test("event-time-timeout sessionization closes idle sessions via watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long)]
    val events = mem.toDF().toDF("ts", "user_id")
    val q = EventStream.sessionizeEventTime(events, gapMs = 60000L, watermark = "0 seconds")
      .writeStream.format("memory").queryName("et_sessions")
      .outputMode("append").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    mem.addData((ts("2024-01-01 10:00:00"), 7L), (ts("2024-01-01 10:00:10"), 7L))
    q.processAllAvailable()
    // another user far in the future advances the watermark past
    // user 7's last event + gap...
    mem.addData((ts("2024-01-01 11:00:00"), 9L))
    q.processAllAvailable()
    // ...and the following batch fires the timeout
    mem.addData((ts("2024-01-01 11:00:01"), 9L))
    q.processAllAvailable()
    val out = spark.table("et_sessions").as[graft.streaming.ClosedSession].collect()
    q.stop()
    assert(out.exists(s => s.user_id == 7L && s.n_events == 2))
  }

  test("streaming from the real events parquet source (readStream)") {
    val static = graft.core.Tables.t(spark, sf, "events")
    // the file source wants a directory: stream the sf dir, filtered
    // to the events table file
    val stream = spark.readStream.schema(static.schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sf)
    // ts may arrive as long nanos (legacy flag), TIMESTAMP_NTZ, or
    // TIMESTAMP depending on the parquet annotation → event-time col
    val events = static.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        stream.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        stream.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => stream
    }
    val q = EventStream.windowedCounts(events, "1 hour", "15 minutes")
      .writeStream.format("memory").queryName("file_stream_counts")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val total = spark.table("file_stream_counts")
      .agg(sum("n_events")).as[Long].collect().headOption.getOrElse(0L)
    // append mode emits only watermark-closed windows; all but the
    // final hour of events must have been emitted
    assert(total > 0 && total <= static.count())
  }

  test("multimodal decode: deterministic stub over real partition plumbing") {
    val docs = graft.core.Tables.t(spark, sf, "documents")
    val decoded = MediaOps.decode(MediaOps.mediaTable(docs))
    assert(decoded.count() == docs.count())
    val r = decoded.filter(col("doc_id") === 0).head()
    assert(r.n_bytes > 0 && r.width >= 16 && r.features.length == 8)
    // determinism: same input → same features
    val r2 = MediaOps.decode(MediaOps.mediaTable(docs)).filter(col("doc_id") === 0).head()
    assert(r.features.toSeq == r2.features.toSeq)
    val stats = MediaOps.mediaStats(spark, sf)
    assert(stats.count() == 3) // image/audio/video
    // resize: one row per item, true-dims scale factors, fixed output dims
    val rs = MediaOps.resize(decoded, 224, 224)
    assert(rs.count() == docs.count())
    val rr = rs.filter(col("doc_id") === 0).head()
    assert(rr.width == 224 && rr.height == 224)
    assert(rr.scale_x == r.width.toDouble / 224)
    // media features hand off to the similarity stack as (vec_id, v)
    val emb = MediaOps.mediaEmbeddings(decoded)
    assert(emb.columns.toSeq == Seq("vec_id", "v"))
    val selfDot = emb.filter(col("vec_id") === 0)
      .select(graft.functions.VectorExprs.dotp(col("v"), col("v")).as("d"))
      .head().getDouble(0)
    assert(selfDot > 0.0)
  }
}
