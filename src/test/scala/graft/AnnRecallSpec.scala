package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.operators.Similarity

/** RECALL bound for the approximate-nearest-neighbor paths — the
  * number a user sizing `nprobe` at 100 TB actually needs.  The IVF
  * path's oracle queries prove deterministic EXACTNESS of the
  * machinery; this spec measures how much of the TRUE top-k the
  * probe-limited search surfaces, against the brute-force truth, on
  * the sf0.1 embeddings (2,000 × 64-dim).  Pins:
  *
  *  - recall@10 is monotone non-decreasing in nprobe (more lists
  *    probed can only add candidates);
  *  - nprobe == ncent is EXHAUSTIVE: recall 1.0, by construction
  *    (every list probed ⇒ identical candidate set to brute force);
  *  - the nprobe=2/ncent=8 operating point clears a measured floor.
  *    The test embeddings are RANDOM (no cluster structure — the
  *    worst case for IVF: a query's true neighbors spread across
  *    lists roughly uniformly, so recall tracks the fraction of the
  *    corpus probed plus the query-centroid alignment), which makes
  *    the floor here a LOWER bound for any real embedding corpus,
  *    where semantic clustering concentrates neighbors in few lists.
  *    The measured curve is recorded in BASELINE.md.
  */
class AnnRecallSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.1"
  private val K = 10
  private val NQ = 50L // queries: vec_id < 50; corpus: the rest

  /** (qid, set of true top-K vids) from brute-force cosine. */
  private lazy val truth: Map[Long, Set[Long]] = {
    val e = Similarity.emb(spark, dir)
      .withColumn("norm", sqrt(graft.functions.VectorExprs.dotp(col("v"), col("v"))))
      .filter(col("norm") > 0.0)
    val q = e.filter(col("vec_id") < NQ)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("norm").as("qn"))
    val c = e.filter(col("vec_id") >= NQ)
      .select(col("vec_id").as("vid"), col("v"), col("norm"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vid"))
    c.crossJoin(broadcast(q))
      .withColumn("cos", graft.functions.VectorExprs.dotp(col("qv"), col("v")) /
        (col("qn") * col("norm")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= K)
      .select("qid", "vid").collect()
      .groupBy(_.getLong(0)).map { case (q0, rs) =>
        q0 -> rs.map(_.getLong(1)).toSet }
  }

  private def recallAt(nprobe: Int, ncent: Int,
                       cents: Seq[Array[Double]]): Double = {
    val e = Similarity.emb(spark, dir)
    val got = Similarity.ivfSearch(e, (0L until NQ), cents, nprobe, K)
      .select("qid", "vid").collect()
      .groupBy(_.getLong(0)).map { case (q0, rs) =>
        q0 -> rs.map(_.getLong(1)).toSet }
    val hits = truth.toSeq.map { case (q0, t) =>
      got.getOrElse(q0, Set.empty).count(t.contains).toDouble / t.size }
    hits.sum / hits.size
  }

  test("IVF recall@10: monotone in nprobe, exhaustive at nprobe=ncent, floor at the 2/8 operating point") {
    val ncent = 8
    val e = Similarity.emb(spark, dir)
    val cents = Similarity.ivfCentroids(e, ncent)
    val curve = Seq(1, 2, 4, 8).map(p => p -> recallAt(p, ncent, cents))
    info(s"IVF recall@10 curve (ncent=$ncent, sf0.1): " +
      curve.map { case (p, r) => f"nprobe=$p%d -> $r%.3f" }.mkString(", "))
    // monotone non-decreasing (small numeric slack for rank ties)
    curve.sliding(2).foreach { case Seq((p0, r0), (p1, r1)) =>
      assert(r1 >= r0 - 1e-9,
        s"recall fell from $r0 (nprobe=$p0) to $r1 (nprobe=$p1)")
    }
    // every list probed == brute force
    assert(curve.last._2 == 1.0,
      s"nprobe=ncent must be exhaustive, got ${curve.last._2}")
    // the documented operating point (Similarity.scala nprobe knob):
    // measured 0.470 on the random sf0.1 embeddings — almost exactly
    // the 2/8 probed fraction plus query-centroid alignment, the
    // theoretical floor for structure-free data; real corpora cluster
    // and sit far above it.  Pin at 0.40 (measured minus tie noise).
    val r2 = curve.find(_._1 == 2).get._2
    assert(r2 >= 0.40, f"recall@10 at nprobe=2/ncent=8 fell to $r2%.3f " +
      "(measured 0.470 on the random sf0.1 embeddings; floor 0.40)")
  }
}
