package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Count-min sketch as a pure DataFrame aggregation — the frequency
  * face of the sketch family (HLL cardinality: GeoOps.binApproxUsers;
  * quantiles: approx_percentile, CorpusOpsSpec).
  *
  * A CMS answers "how often does item x occur?" within ε·N using
  * d·w counters regardless of corpus size: d independent hash rows,
  * each hashing an item to one of w slots; estimate = min over rows
  * of the landed slot's counter.  Estimates never undercount and
  * overcount by at most ε·N (ε = e/w) with probability 1−(1/2)^d per
  * probe — the classic Cormode–Muthukrishnan bounds.
  *
  * Scale shape: the build is ONE map-side-combined groupBy onto at
  * most d·w keys (the explode multiplies rows d×, but partial
  * aggregation collapses each partition to ≤ d·w rows before the
  * shuffle), so a 100 TB corpus shuffles kilobytes.  The sketch
  * itself is a d·w-row DataFrame — broadcastable state for probing,
  * streamable (counters are additive: union + re-sum merges sketches
  * across batches or corpora).
  */
object Sketches {

  /** The d slot hashes of `c`: deterministic seeded xxhash64 mod w. */
  private def slotsOf(c: String, d: Int, w: Int) =
    array((0 until d).map(i => pmod(xxhash64(col(c), lit(i)), lit(w))): _*)

  /** Build the d×w counter table over `df(c)` (one row per non-empty
    * counter; absent (h_row, slot) pairs are zero).
    */
  def cmsBuild(df: DataFrame, c: String, d: Int, w: Int): DataFrame =
    df.select(posexplode(slotsOf(c, d, w)).as(Seq("h_row", "slot")))
      .groupBy("h_row", "slot").agg(count("*").as("cnt"))

  /** Estimated frequency of each distinct probe value: the minimum
    * counter over the d rows the value hashes to.  The sketch side is
    * d·w rows — broadcast, so probing is map-side.
    */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, c: String,
                  d: Int, w: Int): DataFrame =
    probes.select(col(c)).distinct()
      .select(col(c), posexplode(slotsOf(c, d, w)).as(Seq("h_row", "slot")))
      .join(broadcast(sketch), Seq("h_row", "slot"), "left")
      .na.fill(0L, Seq("cnt"))
      .groupBy(c).agg(min("cnt").as("est"))

  /** Merge sketches built with the same (d, w): counters are additive. */
  def cmsMerge(sketches: Seq[DataFrame]): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy("h_row", "slot").agg(sum("cnt").as("cnt"))
}
