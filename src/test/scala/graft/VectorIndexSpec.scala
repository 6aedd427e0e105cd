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

  test("narrow probe results are consistent with the probed partitions") {
    val res = VectorIndex.search(spark, dir, qvec, nprobe = 2, k = 5)
      .select("vec_id", "cent").as[(Long, Long)].collect()
    assert(res.nonEmpty && res.map(_._2).distinct.length <= 2)
  }
}
