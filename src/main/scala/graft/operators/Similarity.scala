package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Similarity search over the embedding column (`Array[Float]`,
  * 64-dim): brute-force cosine top-k as the exact baseline, and a
  * random-hyperplane LSH bucketed variant as the scale path.
  *
  * Dot products are left-fold `aggregate(zip_with(...))` higher-order
  * functions — codegen'd, deterministic summation order, no UDFs.
  * Ranking keys are the 6-dp-rounded cosine with the neighbor id as a
  * tiebreaker, so ordering is reproducible across engines.
  */
object Similarity {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))

  private val embSql =
    "SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings"

  /** Native codegen'd dot product (graft.functions.DotProduct) —
    * identical left-fold summation to the HOF form, compiled to a
    * primitive loop inside whole-stage codegen.
    */
  private def dot(a: String, b: String): Column =
    graft.functions.VectorExprs.dotp(col(a), col(b))

  /** DuckDB mirror of the left-fold dot product (list_sum's summation
    * order is unspecified, so fold explicitly via list_reduce).
    */
  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(generate_series(1, len($a)), i -> $a[i]*$b[i]), (acc, x) -> acc + x)"

  // --- 34. brute-force cosine top-k ---
  def cosineTopk(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
      .withColumn("norm", sqrt(dot("v", "v")))
      .filter(col("norm") > 0.0)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("norm").as("qn"))
    val c = e.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("vid"), col("v"), col("norm"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vid"))
    c.crossJoin(broadcast(q))
      .withColumn("cos", round(dot("qv", "v") / (col("qn") * col("norm")), 6))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 10)
      .select("qid", "rnk", "vid", "cos")
      .orderBy("qid", "rnk")
  }

  val cosineTopkSql: String = {
    val d  = dotSql("qv", "v"); val dq = dotSql("v", "v")
    s"""WITH e AS ($embSql),
       |n AS (SELECT vec_id, v, sqrt($dq) AS norm FROM e),
       |nn AS (SELECT * FROM n WHERE norm > 0.0),
       |q AS (SELECT vec_id AS qid, v AS qv, norm AS qn FROM nn WHERE vec_id < 5),
       |c AS (SELECT vec_id AS vid, v, norm FROM nn WHERE vec_id >= 5),
       |s AS (SELECT qid, vid, round(($d)/(qn*norm), 6) AS cos FROM c, q),
       |r AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rnk
       |      FROM s)
       |SELECT qid, rnk, vid, cos FROM r WHERE rnk <= 10 ORDER BY qid, rnk""".stripMargin
  }

  // --- 35. random-hyperplane LSH ANN (the 100 TB path) ---
  /** 8 integer hyperplanes r_j[k] = ((j·97 + k·31) mod 7) − 3;
    * bucket = Σ (v·r_j > 0) << j.  Neighbor search only compares
    * vectors in the query's bucket — candidate cost tracks bucket
    * occupancy, not corpus size.
    */
  private def bucketExpr: Column = {
    val bits = (0 until 8).map { j =>
      val dotj =
        s"""aggregate(zip_with(v, transform(sequence(0, 63), k -> cast((($j*97 + k*31) % 7) - 3 as double)),
           |  (x, y) -> x * y), cast(0.0 as double), (acc, x) -> acc + x)""".stripMargin
      s"(CASE WHEN round($dotj, 6) > 0.0 THEN ${1L << j}L ELSE 0L END)"
    }
    expr(bits.mkString(" + "))
  }

  private def bucketSqlExpr: String = {
    val bits = (0 until 8).map { j =>
      val dotj =
        s"list_reduce(list_transform(generate_series(1, 64), k -> v[k] * ((($j*97 + (k-1)*31) % 7) - 3)), (acc, x) -> acc + x)"
      s"(CASE WHEN round($dotj, 6) > 0.0 THEN CAST(${1L << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    }
    bits.mkString(" + ")
  }

  def annLsh(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
      .withColumn("norm", sqrt(dot("v", "v")))
      .filter(col("norm") > 0.0)
      .withColumn("bucket", bucketExpr)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("norm").as("qn"), col("bucket"))
    val c = e.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("vid"), col("v"), col("norm"), col("bucket"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vid"))
    c.join(broadcast(q), "bucket")
      .withColumn("cos", round(dot("qv", "v") / (col("qn") * col("norm")), 6))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 5)
      .select("qid", "rnk", "vid", "bucket", "cos")
      .orderBy("qid", "rnk")
  }

  val annLshSql: String = {
    val d = dotSql("qv", "v"); val dq = dotSql("v", "v")
    s"""WITH e AS ($embSql),
       |n AS (SELECT vec_id, v, sqrt($dq) AS norm FROM e),
       |nb AS (SELECT *, $bucketSqlExpr AS bucket FROM n WHERE norm > 0.0),
       |q AS (SELECT vec_id AS qid, v AS qv, norm AS qn, bucket FROM nb WHERE vec_id < 5),
       |c AS (SELECT vec_id AS vid, v, norm, bucket FROM nb WHERE vec_id >= 5),
       |s AS (SELECT qid, vid, c.bucket, round(($d)/(qn*norm), 6) AS cos
       |      FROM c JOIN q ON c.bucket = q.bucket),
       |r AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rnk
       |      FROM s)
       |SELECT qid, rnk, vid, bucket, cos FROM r WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cosine_topk" -> (cosineTopk _),
    "q_ann_lsh"     -> (annLsh _))

  val oracles: Map[String, String] = Map(
    "q_cosine_topk" -> cosineTopkSql,
    "q_ann_lsh"     -> annLshSql)
}
