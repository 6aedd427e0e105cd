package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for fact-fact joins on hot keys — the
  * salting pattern of the brief's scale checklist, kept deterministic
  * (salt derives from a row id, never from rand()) so results are
  * reproducible and oracle-comparable.
  *
  * AQE's skew-join handles sort-merge splits automatically; explicit
  * salting is for aggregation hot-keys and for joins where one side
  * must replicate (e.g. a near-dup candidate join against a shingle
  * posting list with a few pathological shingles).
  */
object Skew {

  /** Spread a hot-key aggregation: groupBy(key, salt) partial, then
    * groupBy(key) final — two short shuffles instead of one skewed
    * one.  `saltFrom` must be a stable per-row column (an id).
    */
  def saltedCount(df: DataFrame, key: Column, saltFrom: Column, buckets: Int): DataFrame =
    df.groupBy(key.as("k"), pmod(saltFrom, lit(buckets)).as("salt"))
      .agg(count("*").as("partial"))
      .groupBy("k")
      .agg(sum("partial").as("n"))

  /** Replicated-broadcast skew join: the small side is exploded
    * `buckets`× with every salt value, the big side salts each row
    * deterministically from `bigSaltFrom`; joining on (key, salt)
    * splits each hot key across `buckets` tasks.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 bigSaltFrom: Column, buckets: Int): DataFrame = {
    val salted = big.withColumn("__salt", pmod(bigSaltFrom, lit(buckets)))
    val replicated = small.withColumn("__salt",
      explode(array((0 until buckets).map(lit(_)): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
