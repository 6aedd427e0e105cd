package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Accumulating per-user session state for [[EventStream.sessionize]]. */
case class SessionState(nEvents: Long, tStart: Long, tEnd: Long)

/** A closed session emitted by [[EventStream.sessionize]]. */
case class ClosedSession(user_id: Long, n_events: Long, t_start: Long, t_end: Long)

/** Structured Streaming operators over the events schema — the
  * streaming face of the engine (brief: readStream → transforms →
  * writeStream with watermarks).
  *
  * Each takes an unbounded DataFrame with an event-time `ts`
  * timestamp column; callers attach sources (`readStream.parquet`,
  * kafka, memory) and sinks.  State is bounded by the watermark, so
  * the plans run identically on a 1000-executor cluster.
  */
object EventStream {

  /** Tumbling-window per-type counts with a late-data watermark —
    * the streaming analog of the geo-bin rollup.
    */
  def windowedCounts(events: DataFrame,
                     watermark: String = "10 minutes",
                     window_ : String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count("*").as("n_events"),
           sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
              col("event_type"), col("n_events"), col("value_cents"))

  /** Per-user streaming point rollup: bins the deterministic x/y view
    * (SURVEY §4) on the fly — a streaming geo-index builder.
    */
  def streamingGeoIndex(events: DataFrame,
                        delta: Double = 100.0,
                        watermark: String = "10 minutes"): DataFrame = {
    val x = (col("event_id") * 7919 % 4000) / lit(2.0) - 1000.0
    val y = (col("event_id") * col("event_id") % 4001) * 104729 % 4000 / lit(2.0) - lit(1000.0)
    events
      .withWatermark("ts", watermark)
      .withColumn("bin_x", (round(x / delta) * delta).cast("long"))
      .withColumn("bin_y", (round(y / delta) * delta).cast("long"))
      .groupBy(window(col("ts"), "10 minutes"), col("bin_x"), col("bin_y"))
      .agg(count("*").as("n_points"), min("event_id").as("id_min"),
           max("event_id").as("id_max"))
  }

  /** Gap-based streaming sessionization with custom state
    * (flatMapGroupsWithState): a session closes — and is emitted
    * exactly once — when a later event of the same user arrives more
    * than `gapMs` after it.  State per user is one [[SessionState]] —
    * bounded custom state, the `KeyValueGroupedDataset` pattern of
    * the brief.  (No processing-time timeout: it would re-trigger
    * empty micro-batches forever; a production pipeline would close
    * idle tails with an event-time timeout + watermark.)
    */
  def sessionize(events: DataFrame, gapMs: Long = 1800000L): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), unix_millis(col("ts")).as("t"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (user, rows, state: GroupState[SessionState]) => {
            val ts = rows.map(_._2).toSeq.sorted
            val (closed, finalState) =
              ts.foldLeft((List.empty[ClosedSession], state.getOption)) {
                case ((acc, Some(s)), t) if t - s.tEnd > gapMs =>
                  (ClosedSession(user, s.nEvents, s.tStart, s.tEnd) :: acc,
                    Some(SessionState(1, t, t)))
                case ((acc, Some(s)), t) =>
                  // min/max merge: an out-of-order event from a later
                  // micro-batch (allowed within the watermark) with
                  // t <= s.tEnd must not regress the session bounds
                  (acc, Some(SessionState(s.nEvents + 1,
                    math.min(s.tStart, t), math.max(s.tEnd, t))))
                case ((acc, None), t) =>
                  (acc, Some(SessionState(1, t, t)))
              }
            finalState.foreach(state.update)
            closed.reverse.iterator
          }
      }
  }

  /** Streaming ingest into the GeoParquet spatial layout: every
    * micro-batch of points lands bin-partitioned, so the index stays
    * continuously queryable with partition pruning while data streams
    * in.  Pair with GeoParquet.compact on a schedule — appends leave
    * one file per bin per batch.
    *
    * Restart semantics: foreachBatch file appends are at-least-once;
    * a per-batch marker under `_batches/` makes replays of an
    * already-appended batch no-ops.  (The append+marker pair is not
    * atomic — a crash between them can still duplicate that one
    * batch; exactly-once needs a transactional sink or a downstream
    * `dedupExact` pass, which this engine also provides.)
    */
  def ingestGeoParquet(points: DataFrame, path: String, delta: Double,
                       checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    points.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // resolve the marker's OWN filesystem (an s3a:// layout under
        // an hdfs:// default FS must not throw Wrong FS)
        val marker = new org.apache.hadoop.fs.Path(s"$path/_batches/$batchId")
        val fs = marker.getFileSystem(
          batch.sparkSession.sparkContext.hadoopConfiguration)
        if (!fs.exists(marker)) {
          graft.sources.GeoParquet.append(batch, path, delta)
          fs.mkdirs(marker.getParent)
          fs.create(marker, true).close()
        }
      }
      .start()

  /** Streaming `.h5` GRANULE ingest — the reference's production
    * index build (index_AA_ATL06.py: per-granule partial index →
    * master merge) run as a CONTINUOUS process.  Granules ARRIVE in a
    * watched directory (`readStream` over the binaryFile source, so
    * discovery is incremental and each file decodes once, on an
    * executor); every micro-batch appends the new granules' points to
    * a GeoParquet layout and their per-file bin rollups to a partial-
    * index table.  The merged view of that table is `from_list`
    * ([[graft.operators.GeoOps.mergeIndexes]]), and the `geoindex`
    * registry kind adopts it directly — queries never rescan points.
    *
    * Scale shape: per batch the work is (new granules) × (decode +
    * bin rollup), never a re-read of the archive; the index append is
    * bin-count-sized.  Restart semantics match [[ingestGeoParquet]]:
    * `_batches/` markers make foreachBatch replays no-ops.
    */
  def ingestGranules(spark: org.apache.spark.sql.SparkSession,
                     watchDir: String, pointsPath: String, indexPath: String,
                     delta: Double, checkpoint: String, epsg: Int = 3031)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.types._
    val binaryFileSchema = StructType(Seq(
      StructField("path", StringType), StructField("modificationTime", TimestampType),
      StructField("length", LongType), StructField("content", BinaryType)))
    spark.readStream.format("binaryFile")
      .schema(binaryFileSchema)
      .option("pathGlobFilter", "*.h5")
      .load(watchDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        import s.implicits._
        val marker = new org.apache.hadoop.fs.Path(s"$indexPath/_batches/$batchId")
        val fs = marker.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (!fs.exists(marker)) {
          // the registry's canonical point contract for the atl06_h5
          // kind (SourceRegistry.readAs): id = segment id, x/y via
          // the registry CRS, t in ms
          val (px, py) = graft.operators.Projections.forward(
            col("latitude"), col("longitude"), epsg)
          val pts = batch.select(col("path"), col("content"))
            .as[(String, Array[Byte])]
            .flatMap { case (p, c) => graft.sources.Atl06H5.decode(p, c) }
            .select(col("segment_id").as("id"), px.as("x"), py.as("y"),
              col("h_li").as("z"),
              (col("delta_time") * 1000).cast("long").as("t"))
          // one decode per batch: count() materializes every partition
          // into the cache, so the emptiness check, the point append,
          // and the index rollup share a single pass over the granules
          pts.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            if (pts.count() > 0) {
              graft.sources.GeoParquet.append(pts, pointsPath, delta)
              graft.sources.SourceRegistry.indexOf(pts, delta)
                .write.mode("append").parquet(indexPath)
            }
          } finally pts.unpersist(blocking = false)
          fs.mkdirs(marker.getParent)
          fs.create(marker, true).close()
        }
      }
      .start()
  }

  /** Streaming ingest into a CURVE-clustered layout
    * (GeoParquet.writeZOrdered/writeHilbertClustered): every
    * micro-batch lands as internally-key-sorted files via
    * GeoParquet.appendCurve, which also extends the `_manifest` under
    * the epoch handshake — so BIGMIN curve-range reads
    * (queryBoxCurve) stay PRUNED, not fallback-scanning, while data
    * streams in.  Appends accumulate key-range overlap; the gated
    * compactCurveIfNeeded keeps point-read fan-out (files covering
    * one key) bounded by `maxOverlap`, and its gate reads the
    * manifest, not the file tree.  The first batch seeds the layout
    * (writeZOrdered/writeHilbertClustered + writeManifest); later
    * ones append.  Same restart semantics as [[ingestGeoParquet]]:
    * `_batches/` markers make replays no-ops.
    */
  def ingestCurveParquet(points: DataFrame, path: String, delta: Double,
                         checkpoint: String, hilbert: Boolean = false,
                         nFilesPerBatch: Int = 1,
                         compactTo: Int = 16, maxOverlap: Int = 4)
      : org.apache.spark.sql.streaming.StreamingQuery =
    points.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val marker = new org.apache.hadoop.fs.Path(s"$path/_batches/$batchId")
        val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(marker)) {
          if (!fs.exists(new org.apache.hadoop.fs.Path(s"$path/_manifest"))) {
            if (hilbert)
              graft.sources.GeoParquet.writeHilbertClustered(
                batch, path, delta, nFilesPerBatch)
            else
              graft.sources.GeoParquet.writeZOrdered(
                batch, path, delta, nFilesPerBatch)
            graft.sources.GeoParquet.writeManifest(spark, path)
          } else
            graft.sources.GeoParquet.appendCurve(batch, path, delta, nFilesPerBatch)
          fs.mkdirs(marker.getParent)
          fs.create(marker, true).close()
          graft.sources.GeoParquet.compactCurveIfNeeded(
            spark, path, compactTo, maxOverlap)
          ()
        }
      }
      .start()

  /** Streaming MERGE (CDC apply): every micro-batch UPSERTS into the
    * layout by key via GeoParquet.upsertPositional — old copies die by
    * (file, row) address, replacements stage-append with the manifest
    * maintained, so the layout is continuously queryable THROUGH the
    * pruned manifest path while updates stream in.  This is the
    * change-data-capture sink shape: a stream of latest-value records
    * keyed by entity, merged as they arrive, O(batch) per batch.
    * The first non-empty batch seeds the layout (write + manifest).
    * Same restart semantics as [[ingestGeoParquet]]: `_batches/`
    * markers make replays no-ops (at-least-once between append and
    * marker).
    *
    * `orderCols` must TOTALLY order each key's updates within a batch
    * (several CDC records for one key arrive together); the latest
    * wins.  The columns present in the stream are used in the given
    * priority order — at least one must exist, or the merge would
    * pick an arbitrary winner and the same input could merge
    * different values on different runs.
    */
  def ingestUpserts(updates: DataFrame, path: String, keyCol: String,
                    delta: Double, checkpoint: String,
                    orderCols: Seq[String] = Seq("t", "id"))
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val present = orderCols.filter(updates.columns.contains)
    require(present.nonEmpty,
      s"none of the order columns $orderCols exist in the stream " +
        s"(${updates.columns.toSeq}) — latest-per-key needs a total order")
    updates.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val marker = new org.apache.hadoop.fs.Path(s"$path/_batches/$batchId")
        val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(marker)) {
          // a batch may carry several updates for one key — keep the
          // latest under the caller's declared total order
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(keyCol)
            .orderBy(present.map(col(_).desc): _*)
          val latest = batch.withColumn("__rn", row_number().over(w))
            .filter(col("__rn") === 1).drop("__rn")
          // an empty batch must not attempt the schema-less seed write
          // (zero-row write + writeManifest cannot infer a schema)
          if (!latest.isEmpty) {
            if (!fs.exists(new org.apache.hadoop.fs.Path(s"$path/_manifest"))) {
              graft.sources.GeoParquet.write(latest, path, delta)
              graft.sources.GeoParquet.writeManifest(spark, path)
            } else
              graft.sources.GeoParquet.upsertPositional(latest, path, keyCol, delta)
          }
          fs.mkdirs(marker.getParent)
          fs.create(marker, true).close()
        }
      }
      .start()
  }

  /** Stream-static enrichment: join the unbounded event stream with a
    * static dimension frame (user attributes, tile metadata, a model
    * table).  Spark broadcasts the static side into every micro-batch
    * — no stream state at all, the cheapest join shape there is.
    */
  def enrich(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Stream-static AS-OF enrichment: every micro-batch of events picks
    * up the latest static reference row at-or-before its own
    * timestamp (rate tables, model versions, calibration records) —
    * foreachBatch + the batch [[graft.operators.TemporalJoins.asofJoin]].
    * The static side re-resolves per batch, so a slowly-changing
    * reference table stays current without restarting the query.
    */
  def asofEnrich(events: DataFrame, ref: DataFrame,
                 key: String, time: String, id: String)
                (sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        sink(graft.operators.TemporalJoins.asofJoin(batch, ref, key, time, id))
      }
      .start()

  /** Streaming exact dedup — the streaming face of Dedup.dedupExact
    * for a continuously-arriving corpus: keep only the first event
    * per content hash, with state bounded by the watermark horizon
    * (dropDuplicatesWithinWatermark — late duplicates beyond the
    * watermark age out of state instead of accumulating forever, the
    * requirement for an unbounded ingest pipeline).
    */
  def streamingDedup(events: DataFrame,
                     watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .withColumn("content_md5",
        md5(concat_ws("|", col("event_type"), col("value").cast("string"))))
      .dropDuplicatesWithinWatermark("content_md5")

  /** Streaming document-frequency state for the near-dup pipeline —
    * Dedup.dfCappedApprox's sketch face composed with streaming
    * ingest (the reason that operator uses a count-min sketch at
    * all): each micro-batch of documents lands its shingles AND its
    * own d·w count-min sketch under a batchId-keyed directory — one
    * scan per batch, no corpus re-count, and at-least-once replays
    * are idempotent overwrites of the same keys.  Because summed
    * per-batch counters are BIT-IDENTICAL to the counters cmsBuild
    * computes over the whole corpus in one pass (Sketches.cmsMerge —
    * counters are additive), [[dfCappedShinglesFromState]] reproduces
    * the batch pipeline's kept-set exactly, including across a
    * restart-replay — both proven by spec.
    */
  def ingestShingleDfState(docs: DataFrame, stateDir: String,
                           d: Int = 4, w: Int = 8192,
                           checkpoint: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery =
    checkpoint.foldLeft(docs.writeStream)(
        (ws, c) => ws.option("checkpointLocation", c))
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val sh = graft.operators.Dedup.shinglesOf(batch)
            .localCheckpoint() // one shingle pass feeds store AND sketch
          // PER-BATCH state keyed by batchId makes replays IDEMPOTENT:
          // foreachBatch is at-least-once, and a replayed batch
          // overwrites its own shingle partition and its own
          // per-batch sketch — nothing is appended twice or merged
          // twice, and there is no cross-store ordering window (a
          // crash between the two writes re-lands both on replay).
          // The sibling parquet sinks guard replays with `_batches`
          // markers; here the state itself can be replay-keyed.
          sh.write.mode("overwrite")
            .parquet(s"$stateDir/shingles/batch-$batchId")
          graft.operators.Sketches.cmsBuild(sh, "gh", d, w)
            .coalesce(1).write.mode("overwrite")
            .parquet(s"$stateDir/_cms/batch-$batchId")
        }
      }
      .start()

  /** The df-capped shingle frame of everything
    * [[ingestShingleDfState]] has ingested: estimate each shingle's
    * corpus df from the ACCUMULATED sketch, drop the stop-shingle
    * superset (est never undercounts — the skew bound is
    * unconditional), exactly Dedup.dfCappedApprox over the streamed
    * corpus.  Feed it to jaccardOf/minhash as the batch path does.
    */
  def dfCappedShinglesFromState(spark: org.apache.spark.sql.SparkSession,
                                stateDir: String,
                                dfCap: Int = graft.operators.Dedup.DfCap,
                                d: Int = 4, w: Int = 8192): DataFrame = {
    val sh = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$stateDir/shingles")
    // summing the per-batch sketches IS the corpus sketch (counters
    // are additive) — merged at read over d·w-sized frames, kilobytes
    // per batch regardless of corpus size
    val sk = graft.operators.Sketches.cmsMerge(Seq(
      spark.read.option("recursiveFileLookup", "true")
        .parquet(s"$stateDir/_cms")))
    val hot = graft.operators.Sketches.cmsEstimate(sk, sh, "gh", d, w)
      .filter(col("est") > dfCap)
      .select("gh")
    sh.join(broadcast(hot), Seq("gh"), "left_anti")
  }

  /** Stream-stream interval join: attribute each purchase to the
    * user's clicks in the preceding 10 minutes.  Watermarks bound the
    * join state on both sides — the canonical streaming-join shape.
    */
  def purchaseAttribution(events: DataFrame,
                          watermark: String = "20 minutes"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
              col("event_id").as("click_id"))
      .withWatermark("click_ts", watermark)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
              col("event_id").as("purchase_id"), col("value"))
      .withWatermark("purchase_ts", watermark)
    purchases.join(clicks,
      expr("""p_user = c_user AND
              click_ts <= purchase_ts AND
              click_ts >= purchase_ts - interval 10 minutes"""))
      .select(col("p_user").as("user_id"), col("purchase_id"), col("click_id"),
              col("purchase_ts"), col("click_ts"), col("value"))
  }

  /** Stream-stream AS-OF: [[purchaseAttribution]] reduced to the
    * single LATEST click per purchase — the streaming form of
    * TemporalJoins.asofJoin (which Structured Streaming cannot
    * express directly: no ordered windows over unbounded joins).
    * Shape: bounded interval join, then a windowed max_by keyed on
    * (purchase window, purchase) so the append-mode aggregation has
    * an event-time key and emits exactly once when the watermark
    * passes the window.  State on all three stages is
    * watermark-bounded.
    */
  def purchaseAsof(events: DataFrame,
                   watermark: String = "20 minutes"): DataFrame =
    // purchase_ts's pre-join watermark propagates through the join;
    // re-declaring it downstream is disallowed (multi-stateful rule)
    purchaseAttribution(events, watermark)
      .groupBy(window(col("purchase_ts"), "10 minutes"),
        col("user_id"), col("purchase_id"))
      .agg(max_by(
          struct(col("click_id"), col("click_ts")),
          struct(col("click_ts"), col("click_id"))).as("best"),
        count("*").as("n_candidate_clicks"))
      .select(col("user_id"), col("purchase_id"),
        col("best.click_id").as("click_id"),
        col("best.click_ts").as("click_ts"),
        col("n_candidate_clicks"))

  /** Event-time-timeout variant: idle sessions close when the
    * watermark passes last-event + gap, so tails are emitted without
    * waiting for the user's next event — the production shape (the
    * NoTimeout variant above only closes on a successor event).
    */
  def sessionizeEventTime(events: DataFrame,
                          gapMs: Long = 1800000L,
                          watermark: String = "10 minutes"): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .select(col("user_id").cast("long"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(s =>
              ClosedSession(user, s.nEvents, s.tStart, s.tEnd)).iterator
            state.remove()
            out
          } else {
            val ts = rows.map(_._2.getTime).toSeq.sorted
            val (closed, finalState) =
              ts.foldLeft((List.empty[ClosedSession], state.getOption)) {
                case ((acc, Some(s)), t) if t - s.tEnd > gapMs =>
                  (ClosedSession(user, s.nEvents, s.tStart, s.tEnd) :: acc,
                    Some(SessionState(1, t, t)))
                case ((acc, Some(s)), t) =>
                  // min/max merge — see sessionize: late events within
                  // the watermark must not regress the session bounds
                  (acc, Some(SessionState(s.nEvents + 1,
                    math.min(s.tStart, t), math.max(s.tEnd, t))))
                case ((acc, None), t) =>
                  (acc, Some(SessionState(1, t, t)))
              }
            finalState.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.tEnd + gapMs)
            }
            closed.reverse.iterator
          }
      }
  }
}
