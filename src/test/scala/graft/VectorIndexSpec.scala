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
  }

  test("narrow probe results are consistent with the probed partitions") {
    val res = VectorIndex.search(spark, dir, qvec, nprobe = 2, k = 5)
      .select("vec_id", "cent").as[(Long, Long)].collect()
    assert(res.nonEmpty && res.map(_._2).distinct.length <= 2)
  }
}
