package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main splitting `q_multi_probe`'s cost into its two
  * phases: the layout BUILD (write + declared-filter manifest stats +
  * append) and the PROBE (manifest-pruned two-column key lookup).
  * The build is test scaffolding — a real deployment pays it once at
  * ingest; the probe is the per-query cost the 100 TB design claim
  * rests on, so it is what must stay manifest-sized.
  *
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.ProbeSplit
  */
object ProbeSplit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val path = java.nio.file.Files.createTempDirectory("probesplit").toString
    val p = graft.core.Tables.eventsPoints(spark, sfDir)
      .select("id", "user_id", "x", "y", "z")
    // warmup pass so the JIT/codegen tax doesn't land on either phase
    p.write.format("noop").mode("overwrite").save()
    val (_, buildS) = timed {
      graft.sources.GeoParquet.write(p.filter(col("id") % 2 === 0), path, 250.0)
      graft.sources.GeoParquet.declareFilterCols(spark, path, Seq("id", "user_id"))
      graft.sources.GeoParquet.writeManifest(spark, path)
      graft.sources.GeoParquet.appendWithManifest(
        p.filter(col("id") % 2 === 1), path, 250.0)
    }
    // the probe contract is "keys arrive as frames" — materialize
    // them so the timing below measures the probe, not the key scan
    val idKeys = p.select("id").filter(col("id") % 97 === 0)
      .localCheckpoint(true)
    val userKeys = p.select("user_id").filter(col("user_id") % 5 === 0).distinct()
      .localCheckpoint(true)
    val (n, probeS) = timed {
      graft.sources.GeoParquet.queryKeysViaManifest(spark, path,
          Seq("id" -> idKeys, "user_id" -> userKeys))
        .select("id", "user_id", "x", "y", "z")
        .write.format("noop").mode("overwrite").save()
    }
    // second probe: the steady-state cost once the manifest is warm
    val (_, probe2S) = timed {
      graft.sources.GeoParquet.queryKeysViaManifest(spark, path,
          Seq("id" -> idKeys, "user_id" -> userKeys))
        .select("id", "user_id", "x", "y", "z")
        .write.format("noop").mode("overwrite").save()
    }
    println(f"""{"metric":"probe_split","sf":"$sfDir","build_s":$buildS%.3f,"probe_s":$probeS%.3f,"probe_warm_s":$probe2S%.3f}""")
    spark.stop()
  }
}
