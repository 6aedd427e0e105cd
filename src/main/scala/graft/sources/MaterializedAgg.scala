package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.GeoOps

/** Incrementally-maintained per-bin aggregate over a manifested
  * layout — the materialized-view face of [[GeoParquet.readChangesSince]].
  *
  * A 100 TB layout under continuous ingest is summarized constantly
  * (the reference's per-tile rollups; a corpus dashboard's per-bin
  * counts).  Recomputing the rollup per batch scans the corpus per
  * batch; maintaining it incrementally scans each batch ONCE: every
  * aggregate kept here is a commutative monoid (count, sum over
  * integers, min, max), so merging the delta-aggregate of the files
  * committed since the last refresh into the stored state is EXACT —
  * bit-identical to a from-scratch rollup, which is what the
  * q_incr_agg oracle pins cross-engine.  (A mean/float-sum would NOT
  * be: merge order changes IEEE addition order.  Keep sums integral;
  * derive ratios at read time.)
  *
  * Refresh protocol (crash-safe by roll-forward idempotency): the new
  * state lands at `state-<epoch>` FIRST, the `_agg_epoch` pointer
  * flips second, old state dirs are swept last.  A crash between any
  * two steps leaves the pointer on a state dir that still exists, and
  * the next refresh recomputes the same delta from the same pointer —
  * re-landing `state-<epoch>` byte-for-byte, never double-counting.
  *
  * Fallback ladder: a refresh merges incrementally only when the
  * layout's manifest is fresh, no deletes are pending, and the
  * changelog still reaches back to the stored epoch (compaction
  * resets history — [[GeoParquet.readChangesSince]]'s contract);
  * otherwise it recomputes from [[GeoParquet.readMerged]] — always
  * correct, just not O(batch).
  */
object MaterializedAgg {

  /** The maintained aggregate: per spatial bin — row count, id sum
    * (integral, merge-exact), z min/max.  Monoid-only on purpose. */
  private def aggOf(df: DataFrame, delta: Double): DataFrame =
    df.groupBy(
        GeoOps.binOf(col("x"), delta).as("bin_x"),
        GeoOps.binOf(col("y"), delta).as("bin_y"))
      .agg(count("*").as("n"), sum("id").as("sum_id"),
        min("z").as("z_min"), max("z").as("z_max"))

  private def mergeStates(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy("bin_x", "bin_y")
      .agg(sum("n").as("n"), sum("sum_id").as("sum_id"),
        min("z_min").as("z_min"), max("z_max").as("z_max"))

  /** The maintained state as of its last [[refresh]]. */
  def read(spark: SparkSession, stateDir: String): DataFrame = {
    val e = GeoParquet.readEpochFile(spark, s"$stateDir/_agg_epoch")
    spark.read.parquet(s"$stateDir/state-$e")
  }

  /** Bring the state under `stateDir` up to date with the layout at
    * `layoutDir`; returns the layout epoch the state now reflects.
    * Incremental when the changelog allows it, full recompute when it
    * does not — never wrong either way.
    */
  def refresh(spark: SparkSession, layoutDir: String, stateDir: String,
              delta: Double): Long = {
    val fs = new org.apache.hadoop.fs.Path(stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cur = GeoParquet.readEpoch(spark, layoutDir)
    val ptr = s"$stateDir/_agg_epoch"
    val hasState = fs.exists(new org.apache.hadoop.fs.Path(ptr))
    val last = if (hasState) GeoParquet.readEpochFile(spark, ptr) else -1L
    // pending deletes are INVISIBLE to the epoch (deleteWhere
    // deliberately does not bump it — nothing the manifest asserts
    // changed), so an equal epoch does not mean an unchanged layout:
    // under tombstones every refresh recomputes, until compaction
    // applies them and the epoch axis is trustworthy again
    val pending = GeoParquet.hasPendingDeletes(spark, layoutDir)
    if (hasState && last == cur && !pending) return cur // nothing landed since

    val incrementalOk = hasState && !pending &&
      GeoParquet.manifestFresh(spark, layoutDir, verify = false) && {
        // compaction stamps every manifest row with the current epoch;
        // if history no longer reaches back to `last`, the "changes
        // since last" set would be the whole layout — merging it would
        // double-count, so recompute instead.  An EMPTY manifest
        // (zero files) has no history at all — min(epoch) is null —
        // which is the same "unreachable" answer: recompute (over
        // nothing; the rollup comes out empty, correctly).
        val oldest = GeoParquet.snapshots(spark, layoutDir)
          .agg(min("epoch")).head()
        !oldest.isNullAt(0) && oldest.getLong(0) <= last
      }
    val next =
      if (incrementalOk)
        mergeStates(read(spark, stateDir),
          aggOf(GeoParquet.readChangesSince(spark, layoutDir, last), delta))
      else
        aggOf(GeoParquet.readMerged(spark, layoutDir), delta)

    // state is bin-sized (not data-sized): one file is the right shape
    next.localCheckpoint() // pin: the merge reads the dir being replaced
      .coalesce(1).write.mode("overwrite").parquet(s"$stateDir/state-$cur")
    GeoParquet.writeEpochFile(spark, ptr, cur)
    // sweep superseded state dirs (debris from this and crashed runs)
    val st = fs.listStatus(new org.apache.hadoop.fs.Path(stateDir))
    st.map(_.getPath).filter { p =>
      p.getName.startsWith("state-") && p.getName != s"state-$cur"
    }.foreach(fs.delete(_, true))
    cur
  }
}
