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

  private[graft] def emb(s: SparkSession, dir: String): DataFrame =
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
      .withColumn("cos", dot("qv", "v") / (col("qn") * col("norm")))
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
       |s AS (SELECT qid, vid, ($d)/(qn*norm) AS cos FROM c, q),
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
  private def bucketExpr: Column = lshBucketCol(8)

  /** Random-hyperplane bucket id with `nplanes` planes (2^nplanes
    * buckets).  The knob trades bucket occupancy (candidate cost per
    * query) against recall; nplanes = 0 is a single bucket — exact
    * brute-force search.
    */
  def lshBucketCol(nplanes: Int): Column =
    if (nplanes == 0) lit(0L)
    else {
      val bits = (0 until nplanes).map { j =>
        val dotj =
          s"""aggregate(zip_with(v, transform(sequence(0, 63), k -> cast((($j*97 + k*31) % 7) - 3 as double)),
             |  (x, y) -> x * y), cast(0.0 as double), (acc, x) -> acc + x)""".stripMargin
        s"(CASE WHEN $dotj > 0.0 THEN ${1L << j}L ELSE 0L END)"
      }
      expr(bits.mkString(" + "))
    }

  /** LSH search as a parameterized API (the annLsh oracle query pins
    * nplanes = 8): bucket the corpus, join each query to its bucket,
    * exact cosine + top-k inside it.
    */
  def lshSearch(emb: DataFrame, queryIds: Seq[Long],
                nplanes: Int, k: Int): DataFrame = {
    val e = graft.core.CacheBag.register(emb
      .withColumn("norm", sqrt(dot("v", "v")))
      .filter(col("norm") > 0.0)
      .withColumn("bucket", lshBucketCol(nplanes)))
    val q = e.filter(col("vec_id").isInCollection(queryIds))
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("norm").as("qn"), col("bucket"))
    val c = e.filter(!col("vec_id").isInCollection(queryIds))
      .select(col("vec_id").as("vid"), col("v"), col("norm"), col("bucket"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vid"))
    c.join(broadcast(q), "bucket")
      .withColumn("cos", dot("qv", "v") / (col("qn") * col("norm")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("qid", "rnk", "vid", "bucket", "cos")
  }

  private def bucketSqlExpr: String = {
    val bits = (0 until 8).map { j =>
      val dotj =
        s"list_reduce(list_transform(generate_series(1, 64), k -> v[k] * ((($j*97 + (k-1)*31) % 7) - 3)), (acc, x) -> acc + x)"
      s"(CASE WHEN $dotj > 0.0 THEN CAST(${1L << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
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
      .withColumn("cos", dot("qv", "v") / (col("qn") * col("norm")))
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
       |s AS (SELECT qid, vid, c.bucket, ($d)/(qn*norm) AS cos
       |      FROM c JOIN q ON c.bucket = q.bucket),
       |r AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rnk
       |      FROM s)
       |SELECT qid, rnk, vid, bucket, cos FROM r WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin
  }

  // --- 35b. IVF-style ANN: coarse quantize, probe the 2 nearest lists ---
  /** Inverted-file search: deterministic formula centroids
    * c_j[k] = (((j·31 + k·17) mod 13) − 6)/6 seed one k-means
    * refinement pass ([[refinedCentroids]] — per-cluster means over
    * exact integer-quantized sums, so both engines learn identical
    * centroids); every vector is then assigned to its nearest refined
    * centroid (one pass, 8 native dot products) and a query probes
    * only the 2 centroid lists nearest to it.  At 100 TB the
    * assignment is the partition key — each probe touches 2/8 of the
    * corpus, and centroid lists are the unit of locality (the classic
    * IVF trade of recall for fan-in).
    */
  private val NCENT = 8

  /** Centroid j as plain values — becomes an array *literal* in the
    * plan (the expr-built transform(sequence(...)) form was rebuilt
    * per row and, combined with nested argmin folds, blew the
    * expression tree up to a 49 s/query plan at sf0.1).
    */
  private[graft] def centroidArr(j: Int): Array[Double] =
    Array.tabulate(64)(k0 => (((j * 31 + (k0 + 1) * 17) % 13) - 6).toDouble / 6.0)

  /** |c_j|² via the same left fold both engines use. */
  private def centroidSelfDot(j: Int): Double =
    centroidArr(j).foldLeft(0.0)((acc, x) => acc + x * x)

  private def centroidSqlExpr(j: Int): String =
    s"list_transform(generate_series(1, 64), k -> ((($j*31 + k*17) % 13) - 6)/6.0)"

  /** squared distance |v−c_j|² = |v|² − 2·v·c_j + |c_j|². */
  private def distExpr(j: Int): Column =
    col("vv") - lit(2.0) * graft.functions.VectorExprs.dotp(col("v"), typedlit(centroidArr(j))) +
      lit(centroidSelfDot(j))

  private def distSql(j: Int): String = {
    val c = centroidSqlExpr(j)
    s"(vv - 2.0*${dotSqlOn("v", c)} + ${dotSqlOn(c, c)})"
  }

  private def dotSqlOn(a: String, b: String): String =
    s"list_reduce(list_transform(generate_series(1, 64), i -> ($a)[i]*($b)[i]), (acc, x) -> acc + x)"

  /** argmin over materialized d0..d7 columns, ties to the lower id —
    * the strict-less-than-all-previous chain, structurally identical
    * to the oracle SQL and linear in plan size.
    */
  private def leastOf(cs: Seq[Column]): Column =
    if (cs.length == 1) cs.head else least(cs: _*)

  private def argminCol(prefix: String): Column =
    (1 until NCENT).foldLeft(lit(0L): Column) { (acc, j) =>
      when(col(s"$prefix$j") < leastOf((0 until j).map(i => col(s"$prefix$i"))), lit(j.toLong))
        .otherwise(acc)
    }

  /** second-nearest given `cent`: the argmin over the other seven. */
  private def secondCol(prefix: String): Column =
    (0 until NCENT).map { j =>
      val others = (0 until NCENT).filter(_ != j)
      val inner = others.tail.foldLeft(lit(others.head.toLong): Column) { (acc, k) =>
        when(col(s"$prefix$k") <
               leastOf(others.takeWhile(_ != k).map(i => col(s"$prefix$i"))),
             lit(k.toLong)).otherwise(acc)
      }
      (j, inner)
    }.foldLeft(lit(-1L): Column) { case (acc, (j, inner)) =>
      when(col("cent") === j, inner).otherwise(acc)
    }

  /** One deterministic k-means refinement pass over the seed
    * assignment: each refined centroid is its cluster's per-dimension
    * mean, accumulated as exact `floor(v[k]·1e6)` integer sums (float
    * sums would be partition-order-dependent and could never
    * hash-match the oracle; floor — unlike round — is exact on every
    * input).  The k×d model (8×64 doubles) is collected to the
    * driver: model parameters, not data — the classic Spark k-means
    * shape.  Empty clusters keep their formula seed (mirrored by the
    * oracle's COALESCE).
    */
  private[graft] def refinedCentroids(base0: DataFrame): IndexedSeq[Array[Double]] = {
    val seeded = (0 until NCENT)
      .foldLeft(base0)((df, j) => df.withColumn(s"d$j", distExpr(j)))
      .withColumn("cent0", argminCol("d"))
    val sumAggs = count("*").as("cnt") +: (0 until 64).map(k =>
      sum(floor(element_at(col("v"), k + 1) * 1000000.0).cast("long")).as(s"sk$k"))
    val learned = seeded.groupBy("cent0").agg(sumAggs.head, sumAggs.tail: _*)
      .collect().map { r =>
        val cnt = r.getLong(1)
        r.getLong(0) -> Array.tabulate(64)(k => r.getLong(k + 2) / 1000000.0 / cnt)
      }.toMap
    (0 until NCENT).map(j => learned.getOrElse(j.toLong, centroidArr(j)))
  }

  private def selfDot(c: Array[Double]): Double =
    c.foldLeft(0.0)((acc, x) => acc + x * x)

  def annIvf(s: SparkSession, dir: String): DataFrame = {
    val base0 = emb(s, dir)
      .withColumn("vv", dot("v", "v"))
      .withColumn("norm", sqrt(col("vv")))
      .filter(col("norm") > 0.0)
    val cents = refinedCentroids(base0)
    def rdist(j: Int): Column =
      col("vv") - lit(2.0) * graft.functions.VectorExprs.dotp(col("v"), typedlit(cents(j))) +
        lit(selfDot(cents(j)))
    val base = (0 until NCENT).foldLeft(base0)((df, j) => df.withColumn(s"d$j", rdist(j)))
    val assigned = base.withColumn("cent", argminCol("d"))
    val withSecond = assigned.withColumn("cent2", secondCol("d"))
    val q = withSecond.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("norm").as("qn"),
              col("cent").as("p1"), col("cent2").as("p2"))
    val c = assigned.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("vid"), col("v"), col("norm"), col("cent"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vid"))
    c.join(broadcast(q), col("cent") === col("p1") || col("cent") === col("p2"))
      .withColumn("cos", dot("qv", "v") / (col("qn") * col("norm")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 5)
      .select("qid", "rnk", "vid", "cent", "cos")
      .orderBy("qid", "rnk")
  }

  val annIvfSql: String = {
    val d  = dotSql("qv", "v"); val dq = dotSql("v", "v")
    val distCases = (0 until NCENT).map(j => s"${distSql(j)} AS d$j").mkString(",\n|    ")
    val argmin = (1 until NCENT).foldLeft("0") { (acc, j) =>
      s"CASE WHEN d$j < ${(0 until j).map(i => s"d$i").mkString("least(", ", ", ")")} THEN $j ELSE $acc END"
    }
    // refined distance: the centroid is a list column, so the argmin
    // is a row_number over the 8-row cents cross join (ties ORDER BY
    // d, j = the Spark CASE chain's ties-to-lowest-index)
    val dvc = dotSqlOn("v", "cv")
    val dcc = dotSqlOn("cv", "cv")
    s"""WITH e AS ($embSql),
       |n0 AS (SELECT vec_id, v, $dq AS vv FROM e),
       |n AS (SELECT *, sqrt(vv) AS norm FROM n0 WHERE sqrt(vv) > 0.0),
       |dd AS (SELECT *,
       |    $distCases
       |  FROM n),
       |a0 AS (SELECT *, CAST($argmin AS BIGINT) AS cent0 FROM dd),
       |dim AS (
       |  SELECT cent0, k, sum(CAST(floor(v[k]*1000000.0) AS BIGINT)) AS sk,
       |         count(*) AS cnt
       |  FROM a0, (SELECT unnest(generate_series(1, 64)) AS k) ks
       |  GROUP BY 1, 2),
       |refined AS (SELECT cent0 AS j, list(sk/1000000.0/cnt ORDER BY k) AS cv
       |            FROM dim GROUP BY 1),
       |seeds AS (SELECT j, list_transform(generate_series(1, 64),
       |                 k -> (((j*31 + k*17) % 13) - 6)/6.0) AS cv0
       |          FROM (SELECT unnest(generate_series(0, 7)) AS j)),
       |cents AS (SELECT seeds.j, COALESCE(refined.cv, seeds.cv0) AS cv
       |          FROM seeds LEFT JOIN refined ON refined.j = seeds.j),
       |dist AS (SELECT n.vec_id, n.norm, cc.j,
       |           (n.vv - 2.0*$dvc + $dcc) AS d
       |         FROM n, cents cc),
       |rk AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, j) AS r
       |       FROM dist),
       |asg AS (SELECT vec_id, max(CASE WHEN r = 1 THEN j END) AS cent,
       |               max(CASE WHEN r = 2 THEN j END) AS cent2
       |        FROM rk GROUP BY vec_id),
       |av AS (SELECT n.vec_id, n.v, n.norm, asg.cent, asg.cent2
       |       FROM n JOIN asg USING (vec_id)),
       |q AS (SELECT vec_id AS qid, v AS qv, norm AS qn, cent AS p1, cent2 AS p2
       |      FROM av WHERE vec_id < 5),
       |c AS (SELECT vec_id AS vid, v, norm, cent FROM av WHERE vec_id >= 5),
       |s AS (SELECT qid, vid, c.cent, ($d)/(qn*norm) AS cos
       |      FROM c JOIN q ON c.cent = q.p1 OR c.cent = q.p2),
       |r AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rnk
       |      FROM s)
       |SELECT qid, rnk, vid, cent, cos FROM r WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin
  }

  // --- IVF as a parameterized library API (ncent / nprobe knobs) ---
  /** Learn `ncent` centroids over any (vec_id, v) embedding frame:
    * deterministic formula seeds + one exact-integer-sum k-means pass
    * (same scheme as the oracle query, generalized to any k).
    */
  def ivfCentroids(emb: DataFrame, ncent: Int): IndexedSeq[Array[Double]] = {
    def seed(j: Int): Array[Double] =
      Array.tabulate(64)(k0 => (((j * 31 + (k0 + 1) * 17) % 13) - 6).toDouble / 6.0)
    val base = emb.withColumn("vv", graft.functions.VectorExprs.dotp(col("v"), col("v")))
    val dists = array((0 until ncent).map { j =>
      col("vv") - lit(2.0) * graft.functions.VectorExprs.dotp(col("v"), typedlit(seed(j))) +
        lit(selfDot(seed(j)))
    }: _*)
    val assigned = base.withColumn("cent0",
      (array_position(dists, array_min(dists)) - 1).cast("long"))
    val sumAggs = count("*").as("cnt") +: (0 until 64).map(k =>
      sum(floor(element_at(col("v"), k + 1) * 1000000.0).cast("long")).as(s"sk$k"))
    val learned = assigned.groupBy("cent0").agg(sumAggs.head, sumAggs.tail: _*)
      .collect().map { r =>
        val cnt = r.getLong(1)
        r.getLong(0) -> Array.tabulate(64)(k => r.getLong(k + 2) / 1000000.0 / cnt)
      }.toMap
    (0 until ncent).map(j => learned.getOrElse(j.toLong, seed(j)))
  }

  /** Assign each vector to its nearest centroid (`cent`), keeping
    * norm/vv columns for downstream scoring.
    */
  def ivfAssign(emb: DataFrame, cents: Seq[Array[Double]]): DataFrame = {
    val base = emb
      .withColumn("vv", graft.functions.VectorExprs.dotp(col("v"), col("v")))
      .withColumn("norm", sqrt(col("vv")))
      .filter(col("norm") > 0.0)
    val dists = array(cents.indices.map { j =>
      col("vv") - lit(2.0) * graft.functions.VectorExprs.dotp(col("v"), typedlit(cents(j))) +
        lit(selfDot(cents(j)))
    }: _*)
    base.withColumn("dists", dists)
      .withColumn("cent", (array_position(col("dists"), array_min(col("dists"))) - 1).cast("long"))
  }

  /** IVF search: probe the `nprobe` nearest centroid lists per query,
    * exact cosine + top-k inside the probed lists.  nprobe = ncent
    * degenerates to exact brute-force search (every list probed) —
    * the knob trades recall for the fraction of the corpus touched,
    * which at 100 TB is the difference between reading 2 partitions
    * and reading them all.
    */
  def ivfSearch(emb: DataFrame, queryIds: Seq[Long],
                cents: Seq[Array[Double]], nprobe: Int, k: Int): DataFrame = {
    val assigned = graft.core.CacheBag.register(ivfAssign(emb, cents))
    // nprobe nearest lists per query: sort (dist, cent) pairs, slice
    val probes = assigned
      .filter(col("vec_id").isInCollection(queryIds))
      .withColumn("ranked", expr(
        s"""transform(array_sort(zip_with(dists, sequence(0, ${cents.size - 1}),
           |  (d, i) -> struct(d as d, i as i))), p -> cast(p.i as bigint))""".stripMargin))
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("norm").as("qn"),
        slice(col("ranked"), 1, nprobe).as("probes"))
    val corpus = assigned.filter(!col("vec_id").isInCollection(queryIds))
      .select(col("vec_id").as("vid"), col("v"), col("norm"), col("cent"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vid"))
    corpus.join(broadcast(probes), array_contains(col("probes"), col("cent")))
      .withColumn("cos",
        graft.functions.VectorExprs.dotp(col("qv"), col("v")) / (col("qn") * col("norm")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("qid", "rnk", "vid", "cent", "cos")
  }

  // --- 35c. embedding-cosine near-duplicate pairs (dedup mode) ---
  /** The embedding-space flavor of near-dup detection: candidate
    * pairs share a random-hyperplane LSH bucket (same 8-plane family
    * as [[annLsh]] — cosine-similar vectors collide with high
    * probability), verified by exact cosine ≥ minCos.  The self-join
    * keys on the 256-way bucket, so pair cost tracks bucket occupancy
    * — the same shape that keeps MinHash LSH linear-ish at corpus
    * scale, here for the modality where shingles don't exist.
    *
    * A production dedup runs minCos ≈ 0.95-0.99; the synthetic test
    * embeddings are random (max pairwise cosine ≈ 0.46), so the
    * oracle query pins the threshold at the distribution's top tail
    * (0.3) to keep the verified path non-vacuous.
    */
  val NearDupMinCos = 0.3

  def embedNearDup(s: SparkSession, dir: String,
                   minCos: Double = NearDupMinCos): DataFrame = {
    val e = graft.core.CacheBag.register(emb(s, dir)
      .withColumn("norm", sqrt(dot("v", "v")))
      .filter(col("norm") > 0.0)
      .withColumn("bucket", bucketExpr))
    val a = e.select(col("vec_id").as("d1"), col("v").as("v1"),
      col("norm").as("n1"), col("bucket"))
    val b = e.select(col("vec_id").as("d2"), col("v").as("v2"),
      col("norm").as("n2"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("d1") < col("d2"))
      .withColumn("cos", dot("v1", "v2") / (col("n1") * col("n2")))
      .filter(col("cos") >= minCos)
      .select("d1", "d2", "cos")
      .orderBy("d1", "d2")
  }

  val embedNearDupSql: String = {
    val d12 = dotSql("v1", "v2"); val dq = dotSql("v", "v")
    s"""WITH e AS ($embSql),
       |n AS (SELECT vec_id, v, sqrt($dq) AS norm FROM e),
       |nb AS (SELECT *, $bucketSqlExpr AS bucket FROM n WHERE norm > 0.0),
       |p AS (SELECT a.vec_id AS d1, b.vec_id AS d2,
       |        a.v AS v1, b.v AS v2, a.norm AS n1, b.norm AS n2
       |      FROM nb a JOIN nb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
       |SELECT d1, d2, ($d12)/(n1*n2) AS cos
       |FROM p WHERE ($d12)/(n1*n2) >= $NearDupMinCos
       |ORDER BY d1, d2""".stripMargin
  }

  // --- 35e. cross-modality agreement audit ---
  /** For every TEXT near-dup pair (shingle jaccard ≥ 0.5), the
    * embedding cosine of the same id pair — the audit a pipeline runs
    * to check that its lexical and semantic dedup signals agree
    * (pairs with high jaccard but low cosine flag embedding-model or
    * extraction problems).  The near-dup frame is tiny relative to
    * the corpus, so the two embedding joins are broadcast lookups.
    */
  def modalityAudit(s: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.jaccardOf(Dedup.shinglesOf(Tables.t(s, dir, "documents")))
      .filter(col("jaccard") >= 0.5)
      .select("d1", "d2", "jaccard")
    val e = emb(s, dir)
      .withColumn("norm", sqrt(dot("v", "v")))
      .filter(col("norm") > 0.0)
    pairs
      .join(e.select(col("vec_id").as("d1"), col("v").as("v1"), col("norm").as("n1")), "d1")
      .join(e.select(col("vec_id").as("d2"), col("v").as("v2"), col("norm").as("n2")), "d2")
      .select(col("d1"), col("d2"), col("jaccard"),
        (dot("v1", "v2") / (col("n1") * col("n2"))).as("cos"))
      .orderBy("d1", "d2")
  }

  val modalityAuditSql: String = {
    val d12 = dotSql("v1", "v2"); val dq = dotSql("v", "v")
    s"""WITH jac AS (${Dedup.jaccardSql.replace("ORDER BY d1, d2", "")}),
       |p AS (SELECT d1, d2, jaccard FROM jac WHERE jaccard >= 0.5),
       |e AS ($embSql),
       |n AS (SELECT vec_id, v, sqrt($dq) AS norm FROM e WHERE sqrt($dq) > 0.0)
       |SELECT p.d1, p.d2, p.jaccard, ($d12)/(a.norm*b.norm) AS cos
       |FROM p
       |JOIN (SELECT vec_id, v AS v1, norm FROM n) a ON a.vec_id = p.d1
       |JOIN (SELECT vec_id, v AS v2, norm FROM n) b ON b.vec_id = p.d2
       |ORDER BY d1, d2""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_modality_audit" -> (modalityAudit _),
    "q_cosine_topk"  -> (cosineTopk _),
    "q_ann_lsh"      -> (annLsh _),
    "q_ann_ivf"      -> (annIvf _),
    "q_embed_neardup" -> ((s, d) => embedNearDup(s, d)))

  val oracles: Map[String, String] = Map(
    "q_modality_audit" -> modalityAuditSql,
    "q_cosine_topk"  -> cosineTopkSql,
    "q_ann_lsh"      -> annLshSql,
    "q_ann_ivf"      -> annIvfSql,
    "q_embed_neardup" -> embedNearDupSql)
}
