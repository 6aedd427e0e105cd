package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import TextOps.md5long

/** Deduplication operators for the training-data pipeline: exact
  * (hash groupBy), token-set Jaccard, MinHash+LSH, SimHash.
  *
  * Scale notes: exact dedup is one shuffle on the content hash.  The
  * Jaccard token join keys on tokens (high cardinality); MinHash/LSH
  * is the 100 TB path — candidate generation is a join on band
  * signatures, so cost tracks true-duplicate density instead of the
  * O(n²) pair space.
  */
object Dedup {

  private def docs(s: SparkSession, dir: String) = Tables.t(s, dir, "documents")

  // --- 26. exact dedup (content-hash groupBy, keep-first) ---
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .groupBy(md5(col("text")).as("content_md5"))
      .agg(min("doc_id").as("keeper_id"), count("*").as("n_copies"))
      .orderBy("content_md5")

  val dedupExactSql: String =
    """SELECT md5(text) AS content_md5, min(doc_id) AS keeper_id,
      |  count(*) AS n_copies
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin

  /** Distinct (doc_id, tok) pairs. */
  private def toks(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .distinct()

  private val toksSql =
    "SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents"

  // --- 31. token-set Jaccard near-dup pairs ---
  def jaccard(s: SparkSession, dir: String): DataFrame = {
    val tk    = toks(s, dir).cache()
    val sizes = tk.groupBy("doc_id").agg(count("*").as("sz"))
    val inter = tk.as("t1")
      .join(tk.as("t2"),
        col("t1.tok") === col("t2.tok") && col("t1.doc_id") < col("t2.doc_id"))
      .groupBy(col("t1.doc_id").as("d1"), col("t2.doc_id").as("d2"))
      .agg(count("*").as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("d1"), col("sz").as("s1")), "d1")
      .join(sizes.select(col("doc_id").as("d2"), col("sz").as("s2")), "d2")
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("s1") + col("s2") - col("inter")), 6))
      .filter(col("jaccard") >= 0.3)
      .select("d1", "d2", "inter", "jaccard")
      .orderBy("d1", "d2")
  }

  val jaccardSql: String =
    s"""WITH tk AS ($toksSql),
       |sz AS (SELECT doc_id, count(*) AS sz FROM tk GROUP BY 1),
       |inter AS (
       |  SELECT t1.doc_id AS d1, t2.doc_id AS d2, count(*) AS inter
       |  FROM tk t1 JOIN tk t2 ON t1.tok = t2.tok AND t1.doc_id < t2.doc_id
       |  GROUP BY 1, 2)
       |SELECT d1, d2, inter,
       |  round(CAST(inter AS DOUBLE)/(s1.sz + s2.sz - inter), 6) AS jaccard
       |FROM inter JOIN sz s1 ON s1.doc_id = d1 JOIN sz s2 ON s2.doc_id = d2
       |WHERE round(CAST(inter AS DOUBLE)/(s1.sz + s2.sz - inter), 6) >= 0.3
       |ORDER BY d1, d2""".stripMargin

  // --- 32. MinHash + LSH near-dup candidates ---
  /** 32 minhashes h_j = min over tokens of (a_j·H(tok)+b_j mod p),
    * p = 2^31−1, H = md5-derived 60-bit hash mod p; 8 bands × 4 rows;
    * candidates share a band signature; est_sim = matching sig
    * fraction.
    */
  def minhashLsh(s: SparkSession, dir: String): DataFrame = {
    val P = 2147483647L
    val seeds = s.range(0, 32).select(
      col("id").as("j"),
      (col("id") * 2 + 1).as("a"),
      (col("id") * col("id") + 7919).as("b"))
    val th = toks(s, dir).withColumn("th", pmod(md5long(col("tok")), lit(P)))
    val minh = th.crossJoin(broadcast(seeds))
      .groupBy("doc_id", "j")
      .agg(min(pmod(col("a") * col("th") + col("b"), lit(P))).as("minh"))
    val bands = minh
      .withColumn("band", expr("j div 4"))
      .groupBy("doc_id", "band")
      .agg(md5(expr(
        "array_join(transform(sort_array(collect_list(struct(j, minh))), s -> cast(s.minh as string)), ',')"))
        .as("bk"))
    val cand = bands.as("b1")
      .join(bands.as("b2"),
        col("b1.band") === col("b2.band") && col("b1.bk") === col("b2.bk") &&
        col("b1.doc_id") < col("b2.doc_id"))
      .select(col("b1.doc_id").as("d1"), col("b2.doc_id").as("d2"))
      .distinct()
    val m1 = minh.select(col("doc_id").as("d1"), col("j"), col("minh").as("h1"))
    val m2 = minh.select(col("doc_id").as("d2"), col("j"), col("minh").as("h2"))
    cand.join(m1, "d1").join(m2, Seq("d2", "j"))
      .groupBy("d1", "d2")
      .agg(sum(when(col("h1") === col("h2"), 1).otherwise(0)).as("matches"))
      .withColumn("est_sim", round(col("matches") / lit(32.0), 6))
      .orderBy("d1", "d2")
  }

  val minhashLshSql: String = {
    val H = TextOps.md5longSqlFmt.format("tok")
    s"""WITH tk AS ($toksSql),
       |seeds AS (SELECT j, 2*j + 1 AS a, j*j + 7919 AS b
       |          FROM (SELECT unnest(generate_series(0, 31)) AS j)),
       |th AS (SELECT doc_id, $H % 2147483647 AS th FROM tk),
       |minh AS (
       |  SELECT doc_id, j, CAST(min((a*th + b) % 2147483647) AS BIGINT) AS minh
       |  FROM th, seeds GROUP BY 1, 2),
       |bands AS (
       |  SELECT doc_id, j//4 AS band,
       |    md5(string_agg(CAST(minh AS VARCHAR), ',' ORDER BY j)) AS bk
       |  FROM minh GROUP BY 1, 2),
       |cand AS (
       |  SELECT DISTINCT b1.doc_id AS d1, b2.doc_id AS d2
       |  FROM bands b1 JOIN bands b2
       |    ON b1.band = b2.band AND b1.bk = b2.bk AND b1.doc_id < b2.doc_id)
       |SELECT d1, d2,
       |  CAST(sum(CASE WHEN m1.minh = m2.minh THEN 1 ELSE 0 END) AS BIGINT) AS matches,
       |  round(sum(CASE WHEN m1.minh = m2.minh THEN 1 ELSE 0 END)/32.0, 6) AS est_sim
       |FROM cand
       |JOIN minh m1 ON m1.doc_id = cand.d1
       |JOIN minh m2 ON m2.doc_id = cand.d2 AND m2.j = m1.j
       |GROUP BY d1, d2 ORDER BY d1, d2""".stripMargin
  }

  // --- 33. SimHash signatures ---
  /** 32-bit simhash over distinct tokens: bit b of H(tok) votes ±1;
    * sig bit = vote sum > 0.
    */
  def simhash(s: SparkSession, dir: String): DataFrame = {
    val bits = s.range(0, 32).select(col("id").as("bit"))
    val th = toks(s, dir).withColumn("th", md5long(col("tok")))
    th.crossJoin(broadcast(bits))
      .groupBy("doc_id", "bit")
      .agg(sum(expr("(shiftright(th, cast(bit as int)) % 2) * 2 - 1")).as("vote"))
      .groupBy("doc_id")
      .agg(sum(when(col("vote") > 0, expr("shiftleft(cast(1 as bigint), cast(bit as int))"))
        .otherwise(0L)).as("simhash32"))
      .orderBy("doc_id")
  }

  val simhashSql: String = {
    val H = TextOps.md5longSqlFmt.format("tok")
    s"""WITH tk AS ($toksSql),
       |th AS (SELECT doc_id, $H AS th FROM tk),
       |votes AS (
       |  SELECT doc_id, bit, sum((th >> bit) % 2 * 2 - 1) AS vote
       |  FROM th, (SELECT unnest(generate_series(0, 31)) AS bit) bits
       |  GROUP BY 1, 2)
       |SELECT doc_id,
       |  CAST(sum(CASE WHEN vote > 0 THEN 1::BIGINT << bit ELSE 0 END) AS BIGINT) AS simhash32
       |FROM votes GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_exact" -> (dedupExact _),
    "q_jaccard"     -> (jaccard _),
    "q_minhash_lsh" -> (minhashLsh _),
    "q_simhash"     -> (simhash _))

  val oracles: Map[String, String] = Map(
    "q_dedup_exact" -> dedupExactSql,
    "q_jaccard"     -> jaccardSql,
    "q_minhash_lsh" -> minhashLshSql,
    "q_simhash"     -> simhashSql)
}
