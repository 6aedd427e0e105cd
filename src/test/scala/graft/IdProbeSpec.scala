package graft

import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._
import graft.sources.GeoParquet

/** Manifest membership filters: point probes open only might-contain
  * files, never lose a row (no false negatives), ride appended
  * batches, subtract deletes, degrade to full scans when the manifest
  * cannot answer — and the probe is DISTRIBUTED end to end: the
  * per-file filter arrays never land on the driver (file names only).
  * Filters are opt-in per layout ([[GeoParquet.declareFilterCols]]);
  * undeclared layouts write plain manifests at pre-filter cost.
  */
class IdProbeSpec extends SparkSpec {
  import spark.implicits._

  private def p = graft.core.Tables.eventsPoints(spark, sf)
    .select("id", "x", "y", "z")

  test("id probe prunes to might-contain files and matches the exact filter") {
    val dir = java.nio.file.Files.createTempDirectory("idp").toString
    GeoParquet.write(p, dir, 250.0)
    GeoParquet.declareFilterCols(spark, dir, Seq("id"))
    GeoParquet.writeManifest(spark, dir)
    val m = spark.read.parquet(s"$dir/_manifest")
    assert(m.columns.contains("id_bloom"))
    val nFiles = m.count()
    assert(nFiles > 10, s"need a multi-file layout to prove pruning ($nFiles)")
    val want = Seq(10L, 501L, 1234L)

    // every collect the probe issues must carry file NAMES only —
    // the gigabytes of filter arrays a 100 TB manifest holds stay in
    // executors.  QueryExecutionListener events arrive async, so
    // poll until the probe's own collects surfaced, then assert the
    // negative over everything captured.
    val seen = new java.util.concurrent.CopyOnWriteArrayList[Seq[String]]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit =
        seen.add(qe.analyzed.output.map(_.name))
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val got = GeoParquet.queryIdsViaManifest(spark, dir, want)
      // exactness: same rows as the unpruned filter
      val expect = p.filter($"id".isin(want: _*))
      assert(got.select("id", "x", "y", "z").exceptAll(expect).count() == 0 &&
        expect.exceptAll(got.select("id", "x", "y", "z")).count() == 0)
      assert(got.count() == expect.count() && got.count() >= 2)
      // the probe actually pruned: explicit file-list reads report
      // their inputs faithfully (manifest-pruned, not partition-pruned)
      val opened = got.inputFiles.length
      assert(opened > 0 && opened < nFiles,
        s"expected bloom pruning, opened $opened of $nFiles")
      // wait for the planning collects (the candidate-file probe
      // projects exactly [file]) to reach the listener
      val deadline = System.nanoTime() + 10_000_000_000L
      while (System.nanoTime() < deadline &&
          !seen.asScala.exists(_ == Seq("file")))
        Thread.sleep(50)
      assert(seen.asScala.exists(_ == Seq("file")),
        s"expected a file-names-only planning collect, saw: ${seen.asScala}")
      val leaky = seen.asScala.filter(_.exists(_.endsWith("_bloom")))
      assert(leaky.isEmpty,
        s"probe collected filter arrays to the driver: $leaky")
    } finally spark.listenerManager.unregister(listener)
  }

  test("filters are opt-in: undeclared layouts write bloom-free manifests") {
    val dir = java.nio.file.Files.createTempDirectory("idp0").toString
    GeoParquet.write(p, dir, 250.0)
    GeoParquet.writeManifest(spark, dir)
    val m = spark.read.parquet(s"$dir/_manifest")
    assert(!m.columns.exists(_.endsWith("_bloom")),
      s"undeclared layout grew filter columns: ${m.columns.toSeq}")
    // probes still answer — unpruned, exact
    val got = GeoParquet.queryIdsViaManifest(spark, dir, Seq(10L, 501L))
    assert(got.select("id").as[Long].collect().toSet == Set(10L, 501L))
  }

  test("multi-column probe intersects candidate sets and matches the exact filter") {
    val dir = java.nio.file.Files.createTempDirectory("idpm").toString
    val pu = graft.core.Tables.eventsPoints(spark, sf)
      .select("id", "user_id", "x", "y", "z")
    GeoParquet.write(pu, dir, 250.0)
    GeoParquet.declareFilterCols(spark, dir, Seq("id", "user_id"))
    GeoParquet.writeManifest(spark, dir)
    val m = spark.read.parquet(s"$dir/_manifest")
    assert(m.columns.contains("id_bloom") && m.columns.contains("user_id_bloom"))
    val nFiles = m.count()
    val idKeys = pu.select("id").filter($"id" % 97 === 0)
    val userKeys = pu.select("user_id").filter($"user_id" % 5 === 0).distinct()
    val got = GeoParquet.queryKeysViaManifest(spark, dir,
      Seq("id" -> idKeys, "user_id" -> userKeys))
    val expect = pu.filter($"id" % 97 === 0 && $"user_id" % 5 === 0)
    assert(got.select("id", "user_id", "x", "y", "z").exceptAll(expect).count() == 0 &&
      expect.exceptAll(got.select("id", "user_id", "x", "y", "z")).count() == 0)
    assert(got.count() == expect.count() && got.count() >= 1)
    // the intersection prunes at least as hard as the tighter single
    // column: ∩ ⊆ each candidate set
    val both = got.inputFiles.length
    val idOnly = GeoParquet.queryKeysViaManifest(spark, dir,
      Seq("id" -> idKeys)).inputFiles.length
    assert(both > 0 && both <= idOnly && both < nFiles,
      s"expected intersected pruning, opened $both (id-only $idOnly, all $nFiles)")
  }

  test("bloom candidates prune the upsert position lookup, MERGE stays exact") {
    val dir = java.nio.file.Files.createTempDirectory("idp3").toString
    GeoParquet.write(p, dir, 250.0)
    GeoParquet.declareFilterCols(spark, dir, Seq("id"))
    GeoParquet.writeManifest(spark, dir)
    val nFiles = spark.read.parquet(s"$dir/_manifest").count()
    // the distributed probe answers, and answers selectively
    val cand = GeoParquet.bloomCandidateFiles(spark, dir,
      Seq(10L, 501L).toDF("id"))
    assert(cand.isDefined)
    assert(cand.get.nonEmpty && cand.get.size < nFiles,
      s"expected selective candidates, got ${cand.map(_.size)} of $nFiles")
    // and the MERGE riding it keeps the exactly-once contract
    GeoParquet.upsertPositional(
      p.filter($"id" % 13 === 0).withColumn("z", $"z" + 500.0),
      dir, "id", 250.0)
    val r = GeoParquet.readMerged(spark, dir).select("id", "x", "y", "z")
    val expect = p.withColumn("z",
      when($"id" % 13 === 0, $"z" + 500.0).otherwise($"z"))
    assert(r.exceptAll(expect).count() == 0 && expect.exceptAll(r).count() == 0)
  }

  test("string keys filter too: non-integral columns hash via xxhash64") {
    val dir = java.nio.file.Files.createTempDirectory("idps").toString
    val pd = graft.core.Tables.eventsPoints(spark, sf)
      .select("id", "event_type", "x", "y", "z")
    GeoParquet.write(pd, dir, 250.0)
    GeoParquet.declareFilterCols(spark, dir, Seq("event_type"))
    GeoParquet.writeManifest(spark, dir)
    assert(spark.read.parquet(s"$dir/_manifest")
      .columns.contains("event_type_bloom"))
    val keys = Seq("purchase").toDF("event_type")
    val got = GeoParquet.queryKeysViaManifest(spark, dir,
      Seq("event_type" -> keys))
    val expect = pd.filter($"event_type" === "purchase")
    assert(got.count() == expect.count() && got.count() >= 1)
    assert(got.select("id", "event_type", "x", "y", "z")
      .exceptAll(expect).count() == 0)
  }

  test("appended batches carry filters; deletes subtract; stale manifest degrades") {
    val dir = java.nio.file.Files.createTempDirectory("idp2").toString
    GeoParquet.write(p.filter($"id" % 2 === 0), dir, 250.0)
    GeoParquet.declareFilterCols(spark, dir, Seq("id"))
    GeoParquet.writeManifest(spark, dir)
    GeoParquet.appendWithManifest(p.filter($"id" % 2 === 1), dir, 250.0)
    // odd id 501 lives only in the APPENDED files — its manifest rows
    // must carry a filter that hits
    assert(GeoParquet.queryIdsViaManifest(spark, dir, Seq(501L))
      .select("id").as[Long].collect().toSeq == Seq(501L))
    // and the appended part must physically CARRY its arrays: the
    // align-to-existing-schema step once read the slim cached
    // manifest and silently stripped the fresh blooms — null blooms
    // ("unknown, open it") stay sound but decay pruning per append
    assert(spark.read.parquet(s"$dir/_manifest")
        .filter(col("id_bloom").isNull).count() == 0,
      "appended manifest part lost its filter arrays")
    // merge-on-read delete rides the probe like every other reader
    GeoParquet.deleteWhere(spark, dir, $"id" === 501L)
    assert(GeoParquet.queryIdsViaManifest(spark, dir, Seq(501L)).isEmpty)
    // stale manifest: plain append outside it → fallback scan, exact
    GeoParquet.append(
      Seq((900002L, 5.0, 5.0, 0.0)).toDF("id", "x", "y", "z"), dir, 250.0)
    assert(!GeoParquet.manifestFresh(spark, dir, verify = false))
    assert(GeoParquet.queryIdsViaManifest(spark, dir, Seq(900002L, 10L))
      .select("id").as[Long].collect().toSet == Set(900002L, 10L))
  }
}
