package graft

import org.apache.spark.sql.functions._

import graft.sources.GeoParquet
import graft.sources.v2.{GraftCatalog, GraftSource}

/** Named-table SQL over layouts: the `GraftCatalog` TableCatalog maps
  * `<catalog>.<namespace>.<table>` onto warehouse layout directories —
  * SELECTs get the SQL face's pruning/pushdown, INSERT INTO its locked
  * appends, and the lifecycle verbs the catalog cannot own refuse
  * with directions.
  */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  private lazy val warehouse: String = {
    val w = java.nio.file.Files.createTempDirectory("graftwh").toString
    spark.conf.set("spark.sql.catalog.lake", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.lake.warehouse", w)
    w
  }

  private def pts(from: Int, until: Int) =
    (from until until).map { i =>
      (i.toLong, (i % 50) * 25.0, (i % 37) * 25.0, i * 1.0)
    }.toDF("id", "x", "y", "z")

  private def mkLayout(ns: String, tbl: String, n: Int): String = {
    val dir = s"$warehouse/$ns/$tbl"
    GeoParquet.write(pts(0, n), dir, 250.0)
    GeoParquet.writeManifest(spark, dir)
    dir
  }

  test("SELECT by name, pruned and aggregate-pushed") {
    val dir = mkLayout("ice", "atl06", 2000)
    val n = spark.sql(
      "SELECT count(*) AS n FROM lake.ice.atl06 WHERE x >= 0 AND x < 400 AND y >= 0 AND y < 400")
      .collect()(0).getLong(0)
    val want = spark.read.parquet(dir)
      .filter($"x" >= 0 && $"x" < 400 && $"y" >= 0 && $"y" < 400).count()
    assert(n == want && n > 0)
    // the aggregate was manifest-answered, not scanned wholesale
    val (answered, scanned) = GraftSource.lastAggPlan.get(dir)
    assert(answered > 0)
    assert(scanned < spark.read.parquet(dir).inputFiles.length)
  }

  test("two named layouts JOIN in one SQL query") {
    mkLayout("ice", "a", 1200)
    mkLayout("ice", "b", 1200)
    val joined = spark.sql(
      """SELECT a.id, a.z AS za, b.z AS zb
        |FROM lake.ice.a a JOIN lake.ice.b b ON a.id = b.id
        |WHERE a.x >= 0 AND a.x < 300 AND b.x >= 0 AND b.x < 300
        |ORDER BY a.id""".stripMargin)
    assert(joined.count() > 0)
    assert(joined.select("za").exceptAll(joined.select("zb")).count() == 0)
  }

  test("INSERT INTO a named layout appends through the locked path") {
    val dir = mkLayout("ice", "grow", 500)
    spark.sql(
      "INSERT INTO lake.ice.grow SELECT id + 700000, x + 2.0, y + 2.0, z FROM lake.ice.grow WHERE id < 20")
    assert(spark.sql("SELECT count(*) AS n FROM lake.ice.grow")
      .collect()(0).getLong(0) == 520)
    // manifest stayed fresh: a pruned read opens a subset
    spark.sql("SELECT id FROM lake.ice.grow WHERE x >= 0 AND x < 200 AND y >= 0 AND y < 200").collect()
    assert(GraftSource.lastPlannedFiles.get(dir).size <
      spark.read.parquet(dir).inputFiles.length)
  }

  test("SHOW NAMESPACES / SHOW TABLES list the warehouse") {
    mkLayout("sea", "tides", 100)
    val ns = spark.sql("SHOW NAMESPACES IN lake").collect().map(_.getString(0))
    assert(ns.contains("sea"), ns.mkString(","))
    val ts = spark.sql("SHOW TABLES IN lake.sea").collect().map(_.getString(1))
    assert(ts.contains("tides"), ts.mkString(","))
  }

  test("time travel by name") {
    val dir = mkLayout("ice", "hist", 600)
    GeoParquet.appendWithManifest(pts(600, 900), dir, 250.0)
    assert(spark.sql("SELECT count(*) AS n FROM lake.ice.hist")
      .collect()(0).getLong(0) == 900)
    assert(spark.sql("SELECT count(*) AS n FROM lake.ice.hist VERSION AS OF 0")
      .collect()(0).getLong(0) == 600)
  }

  test("unknown tables and refused verbs error helpfully") {
    intercept[Throwable] { spark.sql("SELECT * FROM lake.ice.nope").collect() }
    val e = intercept[Throwable] {
      spark.sql("CREATE TABLE lake.ice.fresh (id BIGINT, x DOUBLE, y DOUBLE) USING graft")
    }
    assert(String.valueOf(e.getMessage).contains("geometry") ||
      (e.getCause != null && String.valueOf(e.getCause.getMessage).contains("geometry")))
    intercept[Throwable] { spark.sql("DROP TABLE lake.ice.atl06") }
  }
}
