package graft

import org.apache.spark.sql.functions._
import graft.sources.VectorIndex

class VectorIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("vidx").toString
    VectorIndex.write(graft.operators.Similarity.emb(spark, sf), d, ncent = 8)
    d
  }

  private lazy val qvec: Array[Double] =
    graft.operators.Similarity.emb(spark, sf)
      .filter($"vec_id" === 3L).select("v").as[Seq[Double]].head().toArray

  test("probed search reads only its centroid partitions (PartitionFilters)") {
    val plan = VectorIndex.search(spark, dir, qvec, nprobe = 2, k = 5)
      .queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("cent"), s"no partition pruning on cent:\n$pf")
  }

  test("nprobe = ncent search equals exact brute-force top-k") {
    val got = VectorIndex.search(spark, dir, qvec, nprobe = 8, k = 5)
      .select("vec_id").as[Long].collect().toSeq
    val qn = math.sqrt(qvec.map(x => x * x).sum)
    val want = graft.operators.Similarity.emb(spark, sf)
      .withColumn("norm", sqrt(graft.functions.VectorExprs.dotp($"v", $"v")))
      .filter($"norm" > 0.0)
      .withColumn("cos",
        graft.functions.VectorExprs.dotp($"v", typedlit(qvec.toSeq)) / ($"norm" * qn))
      .orderBy($"cos".desc, $"vec_id")
      .limit(5).select("vec_id").as[Long].collect().toSeq
    assert(got == want)
  }

  test("streaming ingest: appended batches are searchable, full scan stays exact") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val all = graft.operators.Similarity.emb(spark, sf)
      .select("vec_id", "v").as[(Long, Seq[Double])].collect()
    val (seed, rest) = all.splitAt(all.length / 2)
    val d = java.nio.file.Files.createTempDirectory("vidx_s").toString
    VectorIndex.write(seed.toSeq.toDF("vec_id", "v"), d, ncent = 8)
    // stream the remainder in two micro-batches via foreachBatch
    val mem = MemoryStream[(Long, Seq[Double])]
    val q = mem.toDF().toDF("vec_id", "v").writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        VectorIndex.append(batch, d)
      }.start()
    val (r1, r2) = rest.splitAt(rest.length / 2)
    mem.addData(r1.toSeq); q.processAllAvailable()
    mem.addData(r2.toSeq); q.processAllAvailable()
    q.stop()
    // full-probe search over the ingested index == brute force over ALL
    val got = VectorIndex.search(spark, d, qvec, nprobe = 8, k = 5)
      .select("vec_id").as[Long].collect().toSeq
    val qn = math.sqrt(qvec.map(x => x * x).sum)
    val want = graft.operators.Similarity.emb(spark, sf)
      .withColumn("norm", sqrt(graft.functions.VectorExprs.dotp($"v", $"v")))
      .filter($"norm" > 0.0)
      .withColumn("cos",
        graft.functions.VectorExprs.dotp($"v", typedlit(qvec.toSeq)) / ($"norm" * qn))
      .orderBy($"cos".desc, $"vec_id")
      .limit(5).select("vec_id").as[Long].collect().toSeq
    assert(got == want)
    // streaming appends left >1 file in some cent partition; the
    // gated compaction folds them and search results are unchanged
    def maxFilesPerCent = new java.io.File(s"$d/data").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cent="))
      .map(_.listFiles().count(_.getName.endsWith(".parquet"))).max
    assert(maxFilesPerCent > 1)
    assert(VectorIndex.compactIfNeeded(spark, d, maxFilesPerCent = 1))
    assert(maxFilesPerCent == 1)
    assert(!VectorIndex.compactIfNeeded(spark, d, maxFilesPerCent = 1))
    val gotAfter = VectorIndex.search(spark, d, qvec, nprobe = 8, k = 5)
      .select("vec_id").as[Long].collect().toSeq
    assert(gotAfter == want)
  }

  test("deleteVectors: purged ids vanish from search without a rebuild") {
    // fresh index — the shared `dir` must not see these tombstones
    val d = java.nio.file.Files.createTempDirectory("vdel").toString
    VectorIndex.write(graft.operators.Similarity.emb(spark, sf), d, ncent = 8)
    val before = VectorIndex.search(spark, d, qvec, nprobe = 8, k = 5)
      .select("vec_id").as[Long].collect().toSeq
    val victim = before.head
    VectorIndex.deleteVectors(Seq(victim).toDF("vec_id"), d)
    val after = VectorIndex.search(spark, d, qvec, nprobe = 8, k = 5)
      .select("vec_id").as[Long].collect().toSeq
    // the victim is gone AND did not eat a slot: still k results,
    // exactly the before-list minus the victim plus one promoted id
    assert(!after.contains(victim))
    assert(after.size == 5)
    assert(after.take(4) == before.filterNot(_ == victim).take(4))
    // tombstones are compaction pressure on their own; the rewrite
    // applies them and retires the sidecar
    assert(VectorIndex.compactIfNeeded(spark, d, maxFilesPerCent = 1000))
    assert(VectorIndex.pendingDeleted(spark, d).isEmpty)
    assert(spark.read.parquet(s"$d/data")
      .filter($"vec_id" === victim).count() == 0)
    assert(VectorIndex.search(spark, d, qvec, nprobe = 8, k = 5)
      .select("vec_id").as[Long].collect().toSeq == after)
  }

  test("zero-norm vectors are excluded by contract: not persisted, never returned") {
    val dim = qvec.length
    val rows = Seq(
      (1L, Seq.fill(dim)(1.0)),
      (2L, Seq.fill(dim)(0.0)),        // the zero vector — excluded by contract
      (3L, Seq.tabulate(dim)(_.toDouble + 1.0)))
    val d = java.nio.file.Files.createTempDirectory("vidx_z").toString
    VectorIndex.write(rows.toDF("vec_id", "v"), d, ncent = 2)
    val persisted = spark.read.parquet(s"$d/data").select("vec_id").as[Long].collect().toSet
    assert(persisted == Set(1L, 3L), s"persisted $persisted")
    // append path honors the same contract
    VectorIndex.append(Seq((4L, Seq.fill(dim)(0.0)), (5L, Seq.fill(dim)(2.0)))
      .toDF("vec_id", "v"), d)
    val after = spark.read.parquet(s"$d/data").select("vec_id").as[Long].collect().toSet
    assert(after == Set(1L, 3L, 5L), s"after append $after")
    val hits = VectorIndex.search(spark, d, Array.fill(dim)(1.0), nprobe = 2, k = 10)
      .select("vec_id").as[Long].collect().toSet
    assert(hits == Set(1L, 3L, 5L))
  }

  test("centroid drift: appends far from every persisted centroid stay searchable") {
    val dim = qvec.length
    // seed cluster near the origin corner — centroids learn only this region
    val seed = (0L until 40L).map(i => (i, Seq.tabulate(dim)(j => 0.1 + 0.001 * ((i + j) % 7))))
    val d = java.nio.file.Files.createTempDirectory("vidx_drift").toString
    VectorIndex.write(seed.toDF("vec_id", "v"), d, ncent = 4)
    // drifted batch: a far-away direction no centroid represents
    val drift = (100L until 110L).map(i =>
      (i, Seq.tabulate(dim)(j => if (j == dim - 1) 50.0 + 0.01 * (i - 100) else -40.0)))
    VectorIndex.append(drift.toDF("vec_id", "v"), d)
    // full probe must have perfect recall on the drifted region…
    val q = Array.tabulate(dim)(j => if (j == dim - 1) 50.05 else -40.0)
    val got = VectorIndex.search(spark, d, q, nprobe = 4, k = 5)
      .select("vec_id").as[Long].collect().toSeq
    val qn = math.sqrt(q.map(x => x * x).sum)
    val want = (seed ++ drift).toDF("vec_id", "v")
      .withColumn("norm", sqrt(graft.functions.VectorExprs.dotp($"v", $"v")))
      .withColumn("cos",
        graft.functions.VectorExprs.dotp($"v", typedlit(q.toSeq)) / ($"norm" * qn))
      .orderBy($"cos".desc, $"vec_id")
      .limit(5).select("vec_id").as[Long].collect().toSeq
    assert(got == want, s"got $got want $want")
    assert(got.forall(_ >= 100L), "drifted vectors should dominate a drifted query")
    // …and even a 1-probe search lands on the drifted vectors' adopted
    // centroid (they all sit in ONE nearest-centroid partition)
    val narrow = VectorIndex.search(spark, d, q, nprobe = 1, k = 5)
      .select("vec_id").as[Long].collect().toSeq
    assert(narrow == want, s"narrow $narrow want $want")
  }

  test("narrow probe results are consistent with the probed partitions") {
    val res = VectorIndex.search(spark, dir, qvec, nprobe = 2, k = 5)
      .select("vec_id", "cent").as[(Long, Long)].collect()
    assert(res.nonEmpty && res.map(_._2).distinct.length <= 2)
  }
}
