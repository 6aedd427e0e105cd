package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator
  * inventory each entry maps to.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    GeoOps.queries ++ TrackOps.queries ++ Crossovers.queries ++
      Relational.queries ++ DateOps.queries ++ TextOps.queries ++
      Dedup.queries ++ Similarity.queries ++ Projections.queries ++
      RasterOps.queries ++ Components.queries ++ TemporalJoins.queries ++
      CorpusOps.queries ++ Bpe.queries ++ H5Ops.queries

  /** DuckDB-equivalent SQL per query key (driver correctness gate). */
  def oracleSql: Map[String, String] =
    GeoOps.oracles ++ TrackOps.oracles ++ Crossovers.oracles ++
      Relational.oracles ++ DateOps.oracles ++ TextOps.oracles ++
      Dedup.oracles ++ Similarity.oracles ++ Projections.oracles ++
      RasterOps.oracles ++ Components.oracles ++ TemporalJoins.oracles ++
      CorpusOps.oracles ++ Bpe.oracles ++ H5Ops.oracles
}
