package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc stage timing probe for hotspot queries. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    time("events read count")(core.Tables.t(spark, sf, "events").count())
    time("eventsTracks noop")(core.Tables.eventsTracks(spark, sf)
      .write.format("noop").mode("overwrite").save())
    time("segdiff no-sort noop")(operators.TrackOps.segdiff(spark, sf)
      .sortWithinPartitions("track").write.format("noop").mode("overwrite").save())
    time("segdiff full noop")(operators.TrackOps.segdiff(spark, sf)
      .write.format("noop").mode("overwrite").save())
    time("segdiff full again")(operators.TrackOps.segdiff(spark, sf)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
