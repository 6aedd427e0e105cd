package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for co-located fact-fact joins — the
  * pre-shuffle story of the brief's scale checklist.
  *
  * Writing both join sides `bucketBy(n, key)` materializes the
  * shuffle once at write time; every subsequent equi-join on the key
  * plans with zero Exchanges on either side (proved in the spec).
  * At 100 TB this is how the lineitem⋈orders-class joins and the
  * bin-keyed point joins avoid re-shuffling per query.
  */
object Bucketing {

  /** Persist `df` as a bucketed, sorted table in the session catalog. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", s"${df.sparkSession.conf.get("spark.sql.warehouse.dir")}/$table")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key. */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
                    key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
