package graft.sources.v2

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

import graft.sources.GeoParquet

/** Streaming read of a graft layout —
  * `spark.readStream.format("graft").load(path)` — as a DSv2
  * micro-batch source over the manifest's commit-epoch changelog:
  * offsets are layout epochs, and each micro-batch reads exactly the
  * files committed in `(fromEpoch, toEpoch]` (the batch twin is
  * [[GeoParquet.readChangesSince]]; this wraps the same axis in
  * Structured Streaming's offset/commit protocol, so a consumer gets
  * checkpointed exactly-once delivery instead of hand-rolled
  * foreachBatch polling).
  *
  * Semantics — two modes:
  *   - DEFAULT: the APPEND changelog.  Rows are delivered as
  *     committed; merge-on-read deletes are never retracted (an
  *     epoch-stamped delete is an empty micro-batch), the standard
  *     CDC append-stream contract (Iceberg's streaming read skips
  *     delete manifests the same way).  Consumers needing the merged
  *     present read the batch face.
  *   - `.option("changelog", "true")`: the FULL CDC view.  Every row
  *     carries `_change_type` ("insert"/"delete") and `_change_epoch`
  *     (its commit epoch); a delete commit delivers the DELETED ROWS'
  *     content tagged "delete" ([[planChanges]]).  A consumer folds a
  *     batch by applying epochs in order, deletes before inserts
  *     within an epoch — an UPDATE is its old copy's delete plus its
  *     new copy's insert at one epoch, so the fold nets to the
  *     update.  Pushed filters apply to delete rows too (a filtered
  *     CDC stream retracts only rows it would have delivered).
  *
  * Scale + soundness contract (the refusal rules of the batch
  * changelog, recast as stream-position errors):
  *   - planning touches the manifest sidecar only: one epoch-range
  *     filter per micro-batch, file names to the driver, one input
  *     partition per committed file — a 100 TB layout streams at
  *     manifest cost, never a listing;
  *   - a STALE manifest stalls the stream at the described prefix
  *     (an unmanifested append has no epoch, so no sound batch exists
  *     until `writeManifest` — whose non-preserving floor reset then
  *     fails stragglers loudly rather than skipping the healed rows);
  *   - offsets carry the [[GeoParquet.changelogFloor]] era they were
  *     minted in.  A history reset (rebuild/compaction re-stamps
  *     every row) changes the floor: a checkpointed consumer FAST-
  *     FORWARDS across it iff the reset was preserving and it had
  *     consumed through the retired era's last data epoch — otherwise
  *     it fails with a restart instruction instead of silently
  *     re-delivering (or skipping) the re-stamped corpus.
  *
  * Pushed filters ride the stream: exact filters evaluate in the
  * record readers, their bounds prune each batch's files through the
  * manifest envelope — a filtered stream of a wide layout opens only
  * the files that can match, per batch.
  */
final class GraftMicroBatchStream(path: String, dataSchema: StructType,
                                  required: StructType, exact: Seq[Filter],
                                  bounds: Seq[(String, Double, Double)],
                                  changelog: Boolean = false,
                                  trigger: TriggerLimits = TriggerLimits.none)
    extends MicroBatchStream with SupportsAdmissionControl {

  private def spark = SparkSession.active

  override def initialOffset(): Offset = {
    val st = GeoParquet.changelogFloor(spark, path)
    // floor - 1: the first batch delivers the floor era's standing
    // corpus (rows re-stamped at the floor ARE the initial state)
    GraftStreamOffset(st.floor, st.floor - 1)
  }

  /** The highest SOUND position: every epoch ≤ the manifest's
    * described prefix (`_manifest_epoch`) has its rows fully in the
    * sidecar.  A mid-commit append — or a degraded one that landed
    * without stats — keeps `_epoch` ahead of it; the stream simply
    * does not advance past the described prefix (never a spurious
    * failure on a healthy commit's tiny stale window).  A degraded
    * batch therefore STALLS the stream until `writeManifest`, whose
    * rebuild resets the changelog floor NON-preserving — which the
    * next poll turns into the loud restart error, exactly when the
    * un-describable rows join the corpus.
    */
  override def latestOffset(): Offset = retryAcrossCoalesce {
    val st = GeoParquet.changelogFloor(spark, path)
    GeoParquet.describedEpoch(spark, path) match {
      case Some(e) => GraftStreamOffset(st.floor, math.max(e, st.floor - 1))
      case None => GraftStreamOffset(st.floor, st.floor - 1) // no manifest yet
    }
  }

  /** The manifest coalesce (auto-gated from inside appends since
    * 61z30/r16) swaps `_manifest` via two renames; a lock-free poll
    * landing INSIDE that millisecond window sees the directory — or a
    * just-retired part file — missing and would otherwise kill the
    * stream with a restart error, even though the swapped-in sidecar
    * holds IDENTICAL rows (so every handed-out offset stays valid).
    * Retry transient missing-file failures briefly; anything else —
    * and anything persistent — still fails loudly.
    */
  private def retryAcrossCoalesce[T](body: => T): T = {
    var attempts = 0
    while (true) {
      try return body
      catch {
        case e: Throwable if attempts < 20 && transientManifestMiss(e) =>
          attempts += 1
          Thread.sleep(100)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def transientManifestMiss(e: Throwable): Boolean =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(12).exists {
      t =>
        t.isInstanceOf[java.io.FileNotFoundException] || {
          val m = String.valueOf(t.getMessage)
          m.contains("PATH_NOT_FOUND") || m.contains("does not exist") ||
            m.contains("FileNotFoundException")
        }
    }

  /** Admission control (`.option("maxFilesPerTrigger", n)` /
    * `.option("maxRowsPerTrigger", n)`): bound each micro-batch by
    * capping its END epoch.  Without this, the FIRST batch of a fresh
    * stream over a 100 TB layout is the entire standing corpus in one
    * micro-batch — the admission walk instead admits whole commit
    * epochs (the atomic changelog unit) until the file/row budget is
    * spent, from ONE metadata-scale manifest aggregation (per-epoch
    * file counts / row sums).  At least one epoch is always admitted
    * (an over-budget single commit must not stall the stream — the
    * file-source contract), and trailing epochs with no manifest rows
    * (delete-only commits) ride with the last admitted one.
    */
  override def getDefaultReadLimit: ReadLimit =
    trigger.maxFiles.map(ReadLimit.maxFiles)
      .orElse(trigger.maxRows.map(ReadLimit.maxRows))
      .getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: Offset,
                            limit: ReadLimit): Offset = retryAcrossCoalesce {
    val st = GeoParquet.changelogFloor(spark, path)
    val unbounded = latestOffset().asInstanceOf[GraftStreamOffset]
    val from = reconcile(start.asInstanceOf[GraftStreamOffset], st)
    if (unbounded.epoch <= from) return unbounded
    val end = limit match {
      case rl: ReadMaxFiles =>
        admit(from, unbounded.epoch, rl.maxFiles.toLong, rows = false)
      case rl: ReadMaxRows =>
        admit(from, unbounded.epoch, rl.maxRows, rows = true)
      case _ => unbounded.epoch
    }
    GraftStreamOffset(st.floor, end)
  }

  override def reportLatestOffset(): Offset = latestOffset()

  /** Largest end epoch in `(from, to]` whose cumulative weight (file
    * count or row sum, from the manifest) fits `budget` — always at
    * least the first file-bearing epoch, and always extended through
    * file-less trailing epochs.
    */
  private def admit(from: Long, to: Long, budget: Long,
                    rows: Boolean): Long = {
    // filter+select fold driver-side on the cached manifest (zero
    // jobs per poll); the per-epoch rollup is a scalar pass here
    val per = GeoParquet.manifestDf(spark, path)
      .filter(col("epoch") > from && col("epoch") <= to)
      .select(col("epoch"),
        (if (rows) col("n_rows") else org.apache.spark.sql.functions.lit(1L))
          .cast("long").as("w"))
      .collect()
      .groupBy(_.getLong(0)).view
      .map { case (e, rs) => (e, rs.iterator.map(_.getLong(1)).sum) }
      .toArray.sortBy(_._1)
    var acc = 0L
    var end = from
    var next = -1L // first unadmitted file-bearing epoch
    per.foreach { case (e, w) =>
      if (next < 0) {
        if (end == from || acc + w <= budget) { acc += w; end = e }
        else next = e
      }
    }
    if (next < 0) to else next - 1
  }

  /** Map an offset minted in a (possibly retired) floor era onto the
    * current era, or refuse — see the class note.
    */
  private def reconcile(o: GraftStreamOffset,
                        st: GeoParquet.ChangelogFloor): Long =
    if (o.floor == st.floor) o.epoch
    else if (o.floor == st.prevFloor && st.preserved && o.epoch >= st.prevMax)
      st.floor // caught up through the retired era: everything re-stamped at the floor was already delivered
    else throw new IllegalStateException(
      s"graft:$path changelog history was rewritten (offset era " +
        s"${o.floor}@${o.epoch} vs floor ${st.floor}" +
        (if (st.preserved) s", caught-up threshold ${st.prevMax}" else
          ", non-preserving reset") +
        ") — this stream cannot resume exactly-once; restart it from a " +
        "fresh checkpoint")

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = retryAcrossCoalesce {
    val st = GeoParquet.changelogFloor(spark, path)
    val from = reconcile(start.asInstanceOf[GraftStreamOffset], st)
    val to = reconcile(end.asInstanceOf[GraftStreamOffset], st)
    if (to <= from) return Array.empty
    // defensive: `to` always came from a latestOffset bounded by the
    // described prefix, and that prefix only moves forward
    require(GeoParquet.describedEpoch(spark, path).exists(_ >= to),
      s"graft:$path manifest regressed below a handed-out stream offset")
    val m = GeoParquet.manifestDf(spark, path)
    val committed = m.filter(col("epoch") > from && col("epoch") <= to &&
        GeoParquet.manifestBoundsCond(m, bounds))
    if (!changelog)
      committed.select("file").collect()
        .map(r => GraftPartition(s"$path/${r.getString(0)}"): InputPartition)
    else
      planChanges(committed, from, to)
  }

  private def planChanges(committed: org.apache.spark.sql.DataFrame,
                          from: Long, to: Long): Array[InputPartition] =
    GraftChanges.plan(spark, path, committed, from, to, bounds)

  override def createReaderFactory(): PartitionReaderFactory =
    if (changelog)
      new GraftChangeReaderFactory(
        new SerConf(spark.sparkContext.hadoopConfiguration),
        dataSchema.json, required.json, exact, bounds)
    else
      new GraftReaderFactory(
        new SerConf(spark.sparkContext.hadoopConfiguration),
        dataSchema.json, required.json, exact, bounds)

  override def deserializeOffset(json: String): Offset =
    GraftStreamOffset.parse(json)

  override def commit(end: Offset): Unit = () // nothing to reclaim
  override def stop(): Unit = ()
}

/** A stream position: the changelog-floor era it was minted in plus
  * the last consumed commit epoch.  Carrying the era is what turns a
  * history reset into a DETECTABLE event instead of a silent
  * re-delivery.
  */
final case class GraftStreamOffset(floor: Long, epoch: Long) extends Offset {
  override def json(): String = s"""{"floor":$floor,"epoch":$epoch}"""
}

object GraftStreamOffset {
  private val Re = """\s*\{\s*"floor"\s*:\s*(-?\d+)\s*,\s*"epoch"\s*:\s*(-?\d+)\s*\}\s*""".r
  def parse(json: String): GraftStreamOffset = json match {
    case Re(f, e) => GraftStreamOffset(f.toLong, e.toLong)
    case other => throw new IllegalArgumentException(
      s"not a graft stream offset: $other")
  }
}

/** Changelog planning shared by the micro-batch stream and the batch
  * changelog read: the range's INSERT partitions are the files
  * committed in `(from, to]` (each row tagged with its file's commit
  * epoch), and its DELETE partitions are the data files doomed by
  * positional-tombstone parts committed in the range — each such file
  * is re-opened and ONLY its doomed positions are emitted, tagged
  * "delete" with the tombstone's commit epoch (the Iceberg
  * changelog-scan shape).  Driver cost stays metadata-scale: file
  * names from the manifest, distinct doomed file names from the
  * kilobyte-scale tombstone parts; the (file, pos) sets stay
  * task-side ([[DoomedPositions]]).  Refusals, all loud: equality
  * (key) tombstones have no position to replay; un-epoched parts
  * (crash-healed adoptions) have no place on the axis; parts older
  * than the changelog floor describe deletes of rows whose
  * insert-epochs were re-stamped PAST them (a fold would resurrect
  * the dead) — compact first, which makes them physical.
  */
private[v2] object GraftChanges {
  def plan(spark: SparkSession, path: String,
           committed: org.apache.spark.sql.DataFrame,
           from: Long, to: Long,
           bounds: Seq[(String, Double, Double)] = Seq.empty)
      : Array[InputPartition] = {
    val st = GeoParquet.changelogFloor(spark, path)
    require(GeoParquet.pendingTombstones(spark, path).isEmpty,
      s"graft:$path has pending equality (key) tombstones — a changelog " +
        "read cannot replay key deletes as rows; run a compaction first")
    val allParts = GeoParquet.positionalDeletePartsEpoch(spark, path)
    require(allParts.forall(_._4.isDefined),
      s"graft:$path has pending merge-on-read deletes without a " +
        "recorded commit epoch (crash-healed) — a changelog read " +
        "cannot place them; run a compaction first")
    require(allParts.forall(_._4.exists(_ >= st.floor)),
      s"graft:$path has pending deletes committed before the changelog " +
        s"floor ${st.floor} (a scoped history reset left them behind) — " +
        "their rows' insert epochs were re-stamped past them, so a fold " +
        "would resurrect deleted rows; run a compaction first")
    val inserts = committed.select("file", "epoch").collect().map { r =>
      GraftChangePartition(s"$path/${r.getString(0)}", r.getString(0),
        r.getLong(1), isDelete = false, Seq.empty): InputPartition
    }
    val delParts = allParts.filter(_._4.exists(e => e > from && e <= to))
    val deletes: Array[InputPartition] =
      if (delParts.isEmpty) Array.empty
      else {
        // a pushed-filter read retracts only rows it would have
        // delivered, so a doomed file whose manifest envelope cannot
        // intersect the bounds is never re-opened (same file pruning
        // the insert arm gets from `committed`)
        val inBounds: String => Boolean =
          if (bounds.isEmpty) _ => true
          else {
            val m = GeoParquet.manifestDf(spark, path)
            m.filter(GeoParquet.manifestBoundsCond(m, bounds))
              .select("file").collect().map(_.getString(0)).toSet
          }
        GeoParquet.metaParquet(spark, delParts.map(_._1))
          .select("file").collect().map(_.getString(0)).distinct
          .filter(inBounds)
          .map { rel =>
            val parts = delParts.collect {
              case (f, lo, hi, Some(e)) if lo <= rel && rel <= hi => (f, e)
            }.sortBy(_._2) // ascending: a later re-doom (impossible today) wins
            GraftChangePartition(s"$path/$rel", rel, -1L,
              isDelete = true, parts): InputPartition
          }
      }
    inserts ++ deletes
  }
}

/** One changelog-mode work unit: a data file delivered either as the
  * inserts of its commit epoch, or as the doomed rows named by the
  * given tombstone parts (`(part path, delete epoch)` — only the
  * parts whose `file` footer interval can contain this file).
  */
final case class GraftChangePartition(file: String, relFile: String,
                                      epoch: Long, isDelete: Boolean,
                                      deleteParts: Seq[(String, Long)])
    extends InputPartition

private[v2] final class GraftChangeReaderFactory(
    conf: SerConf, dataJson: String, requiredJson: String,
    exact: Seq[Filter], bounds: Seq[(String, Double, Double)])
    extends PartitionReaderFactory {
  import org.apache.spark.sql.types.DataType
  override def createReader(p: InputPartition)
      : org.apache.spark.sql.connector.read.PartitionReader[
        org.apache.spark.sql.catalyst.InternalRow] = {
    val cp = p.asInstanceOf[GraftChangePartition]
    val dataSchema = DataType.fromJson(dataJson).asInstanceOf[StructType]
    val required = DataType.fromJson(requiredJson).asInstanceOf[StructType]
    conf.conf.size()
    val vecOk = !sys.env.contains("GRAFT_VEC_DISABLE") &&
      conf.conf.get("spark.graft.vectorizedReader", "true") != "false"
    if (cp.isDelete) {
      // columnar first (VecChange.scala); null = outside the
      // vectorized surface, fall back to the Group twin
      val vec = if (vecOk) VecChange.tryCreateDelete(cp.relFile, cp.file,
        conf, dataSchema, required, exact, cp.deleteParts) else null
      if (vec != null) vec
      else new GroupChangeDeleteReader(cp.relFile, cp.file, conf,
        dataSchema, required, exact, cp.deleteParts)
    } else {
      val vec = if (vecOk) VecChange.tryCreateInsert(cp.file, conf,
        dataSchema, required, exact, bounds, cp.epoch) else null
      if (vec != null) vec
      else new GroupChangeInsertReader(cp.file, conf, dataSchema,
        required, exact, bounds, cp.epoch)
    }
  }
}

/** Insert arm of the changelog read: a plain bounded file read whose
  * output rows additionally carry ("insert", commit epoch).  Parquet
  * record skipping stays ON — inserts need no positions.
  */
private[v2] final class GroupChangeInsertReader(
    file: String, ser: SerConf, dataSchema: StructType,
    required: StructType, exact: Seq[Filter],
    bounds: Seq[(String, Double, Double)], epoch: Long)
    extends GroupFileReader(file, ser, dataSchema,
      GroupFileReader.readFieldsFor(dataSchema, required, exact),
      exact, bounds)
    with org.apache.spark.sql.connector.read.PartitionReader[
      org.apache.spark.sql.catalyst.InternalRow] {

  private val verb =
    org.apache.spark.unsafe.types.UTF8String.fromString("insert")

  override def next(): Boolean = advance()

  override def get(): org.apache.spark.sql.catalyst.InternalRow = {
    val vals = new Array[Any](required.length)
    var i = 0
    while (i < required.length) {
      vals(i) = required.fields(i).name match {
        case GraftSource.ChangeTypeCol => verb
        case GraftSource.ChangeEpochCol => epoch
        case _ => valueAt(i)
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals)
  }
}

/** Delete arm of the changelog read: re-opens a doomed data file and
  * emits ONLY the positions named by this batch's tombstone parts,
  * tagged ("delete", the tombstone's commit epoch).  Positions are
  * physical row indexes, so the parquet record filter is disabled
  * (bounds empty — the [[GroupRowIdReader]] contract); pushed exact
  * filters still apply, AFTER each record's position is assigned.
  */
private[v2] final class GroupChangeDeleteReader(
    relFile: String, file: String, ser: SerConf, dataSchema: StructType,
    required: StructType, exact: Seq[Filter],
    deleteParts: Seq[(String, Long)])
    extends GroupFileReader(file, ser, dataSchema,
      GroupFileReader.readFieldsFor(dataSchema, required, exact),
      exact, Seq.empty)
    with org.apache.spark.sql.connector.read.PartitionReader[
      org.apache.spark.sql.catalyst.InternalRow] {

  private val verb =
    org.apache.spark.unsafe.types.UTF8String.fromString("delete")

  /** pos → delete epoch for THIS file, from the kilobyte-scale parts
    * (ascending epoch order: were a position ever doomed twice, the
    * later commit would win).
    */
  private val doomed: java.util.HashMap[java.lang.Long, java.lang.Long] = {
    val m = new java.util.HashMap[java.lang.Long, java.lang.Long]()
    deleteParts.foreach { case (pf, ep) =>
      DoomedPositions.load(relFile, Seq(pf), ser)
        .forEach(pos => m.put(pos, ep))
    }
    m
  }

  override def next(): Boolean = {
    var ok = advance()
    while (ok && !doomed.containsKey(recordPos)) ok = advance()
    ok
  }

  override def get(): org.apache.spark.sql.catalyst.InternalRow = {
    val vals = new Array[Any](required.length)
    var i = 0
    while (i < required.length) {
      vals(i) = required.fields(i).name match {
        case GraftSource.ChangeTypeCol => verb
        case GraftSource.ChangeEpochCol => doomed.get(recordPos).longValue()
        case _ => valueAt(i)
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals)
  }
}
