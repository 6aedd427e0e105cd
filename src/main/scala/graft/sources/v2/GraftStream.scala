package graft.sources.v2

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
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
  * Semantics, stated honestly: this is the APPEND changelog.  Rows
  * are delivered as committed; merge-on-read deletes are never
  * retracted (an epoch-stamped delete is an empty micro-batch), the
  * standard CDC append-stream contract (Iceberg's streaming read
  * skips delete manifests the same way).  Consumers needing the
  * merged present read the batch face.
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
                                  bounds: Seq[(String, Double, Double)])
    extends MicroBatchStream {

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
  override def latestOffset(): Offset = {
    val st = GeoParquet.changelogFloor(spark, path)
    GeoParquet.describedEpoch(spark, path) match {
      case Some(e) => GraftStreamOffset(st.floor, math.max(e, st.floor - 1))
      case None => GraftStreamOffset(st.floor, st.floor - 1) // no manifest yet
    }
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
                                   end: Offset): Array[InputPartition] = {
    val st = GeoParquet.changelogFloor(spark, path)
    val from = reconcile(start.asInstanceOf[GraftStreamOffset], st)
    val to = reconcile(end.asInstanceOf[GraftStreamOffset], st)
    if (to <= from) return Array.empty
    // defensive: `to` always came from a latestOffset bounded by the
    // described prefix, and that prefix only moves forward
    require(GeoParquet.describedEpoch(spark, path).exists(_ >= to),
      s"graft:$path manifest regressed below a handed-out stream offset")
    val m = spark.read.parquet(s"$path/_manifest")
    m.filter(col("epoch") > from && col("epoch") <= to &&
        GeoParquet.manifestBoundsCond(m, bounds))
      .select("file").collect()
      .map(r => GraftPartition(s"$path/${r.getString(0)}"): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
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
