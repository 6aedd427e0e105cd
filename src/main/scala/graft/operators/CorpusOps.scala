package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Corpus-curation operators for the training-data pipeline:
  * repetition-based quality signals, benchmark-contamination
  * screening, and deterministic stratified sampling.
  */
object CorpusOps {

  private def docs(s: SparkSession, dir: String) = Tables.t(s, dir, "documents")

  /** Word n-gram hashes WITH multiplicity (unlike
    * [[graft.functions.WordShingleHashes]], which dedups in-row for
    * set-semantic joins) — repetition signals need the counts.
    * Slicing past the token-array end truncates identically in Spark
    * (`slice`) and DuckDB (`[i:i+k-1]`), pinning short-doc behavior.
    */
  private def gramHashExpr(k: Int): Column = {
    val gram = s"array_join(slice(split(text, ' '), i, $k), ' ')"
    expr(s"""transform(sequence(1, greatest(size(split(text, ' ')) - ${k - 1}, 1)),
             i -> cast(conv(substring(md5($gram), 1, 15), 16, 10) as bigint))""")
  }

  private def gramHashSql(k: Int): String = {
    val gram = s"array_to_string((string_split(text, ' '))[i:i+${k - 1}], ' ')"
    s"""SELECT doc_id, ${TextOps.md5longSqlFmt.format(gram)} AS gh
       |FROM documents,
       |  LATERAL (SELECT unnest(generate_series(1,
       |    greatest(len(string_split(text, ' ')) - ${k - 1}, 1))) AS i) t""".stripMargin
  }

  // --- 58. repetition quality signals (Gopher-style dup-ngram ratios) ---
  /** Per document: fraction of repeated 4-grams (1 − distinct/total)
    * and the share of the single most frequent 2-gram — the two
    * classic repetition filters of corpus curation.  Counting keys are
    * (doc_id, gram-hash): doc_id rides every shuffle key, so the
    * aggregation is embarrassingly parallel and skew-free regardless
    * of corpus-wide gram frequencies.
    */
  def repetition(s: SparkSession, dir: String): DataFrame = {
    val g4 = docs(s, dir)
      .select(col("doc_id"), explode(gramHashExpr(4)).as("gh"))
      .groupBy("doc_id")
      .agg(count("*").as("n4"), countDistinct("gh").as("n4_distinct"))
      .withColumn("dup4_ratio",
        lit(1.0) - col("n4_distinct").cast("double") / col("n4"))
    val g2 = docs(s, dir)
      .select(col("doc_id"), explode(gramHashExpr(2)).as("gh"))
      .groupBy("doc_id", "gh").agg(count("*").as("n"))
      .groupBy("doc_id")
      .agg(sum("n").as("n2"), max("n").as("top2_n"))
      .withColumn("top2_frac", col("top2_n").cast("double") / col("n2"))
    g4.join(g2, "doc_id")
      .select("doc_id", "n4", "n4_distinct", "dup4_ratio", "n2", "top2_n", "top2_frac")
      .orderBy("doc_id")
  }

  val repetitionSql: String =
    s"""WITH g4 AS (${gramHashSql(4)}),
       |a4 AS (SELECT doc_id, count(*) AS n4, count(DISTINCT gh) AS n4_distinct
       |       FROM g4 GROUP BY 1),
       |g2 AS (${gramHashSql(2)}),
       |c2 AS (SELECT doc_id, gh, count(*) AS n FROM g2 GROUP BY 1, 2),
       |a2 AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n2, max(n) AS top2_n
       |       FROM c2 GROUP BY 1)
       |SELECT a4.doc_id, n4, n4_distinct,
       |  1.0::DOUBLE - CAST(n4_distinct AS DOUBLE)/n4 AS dup4_ratio,
       |  n2, top2_n, CAST(top2_n AS DOUBLE)/n2 AS top2_frac
       |FROM a4 JOIN a2 ON a2.doc_id = a4.doc_id
       |ORDER BY 1""".stripMargin

  // --- 59. benchmark-contamination screen ---
  /** Flag corpus documents sharing 5-gram shingles with a held-out
    * "benchmark" set (here: doc_id % 97 = 0 — at real scale, the
    * eval suites).  The benchmark shingle set is tiny relative to the
    * corpus (eval suites are MBs; corpora are TBs), so the probe is a
    * broadcast hash join against the corpus shingle stream — one scan,
    * no corpus-side shuffle before the per-doc rollup.
    */
  def contamination(s: SparkSession, dir: String): DataFrame = {
    // 3-gram shingles (vs the 5-grams of near-dup): a contamination
    // screen wants recall on *partial* passage reuse, not whole-doc
    // similarity; the native expression dedups in-row
    val sh = graft.core.CacheBag.register(docs(s, dir).select(col("doc_id"),
      explode(graft.functions.WordShingleHashes.of(col("text"), 3)).as("gh")))
    val benchSet = sh.filter(col("doc_id") % 19 === 0)
      .select("gh").distinct()
    val corpus = sh.filter(col("doc_id") % 19 =!= 0)
    val shared = corpus.join(broadcast(benchSet), "gh")
      .groupBy("doc_id").agg(count("*").as("n_shared"))
    val sizes = corpus.groupBy("doc_id").agg(count("*").as("n_shingles"))
    shared.join(sizes, "doc_id")
      .select(col("doc_id"), col("n_shared"), col("n_shingles"),
        (col("n_shared").cast("double") / col("n_shingles")).as("overlap"),
        when(col("n_shared").cast("double") / col("n_shingles") >= 0.5, 1L)
          .otherwise(0L).as("contaminated"))
      .orderBy("doc_id")
  }

  val contaminationSql: String = {
    val shinglesAll =
      s"""SELECT DISTINCT doc_id,
         |  ${TextOps.md5longSqlFmt.format("array_to_string((string_split(text,' '))[i:i+2], ' ')")} AS gh
         |FROM documents,
         |  LATERAL (SELECT unnest(generate_series(1, greatest(len(string_split(text,' ')) - 2, 1))) AS i) t""".stripMargin
    s"""WITH sh AS ($shinglesAll),
       |bench AS (SELECT DISTINCT gh FROM sh WHERE doc_id % 19 = 0),
       |corpus AS (SELECT * FROM sh WHERE doc_id % 19 <> 0),
       |shared AS (SELECT doc_id, count(*) AS n_shared
       |           FROM corpus JOIN bench USING (gh) GROUP BY 1),
       |szs AS (SELECT doc_id, count(*) AS n_shingles FROM corpus GROUP BY 1)
       |SELECT doc_id, n_shared, n_shingles,
       |  CAST(n_shared AS DOUBLE)/n_shingles AS overlap,
       |  CAST(CASE WHEN CAST(n_shared AS DOUBLE)/n_shingles >= 0.5
       |       THEN 1 ELSE 0 END AS BIGINT) AS contaminated
       |FROM shared JOIN szs USING (doc_id) ORDER BY doc_id""".stripMargin
  }

  // --- 60. deterministic stratified sampling ---
  /** Hash-based stratified sampling: doc_id's md5-derived bucket in
    * [0,100) decides membership at a per-language rate — deterministic
    * (re-runs and retries select identical rows; no RNG state), purely
    * map-side (no shuffle at all until the output sort), and the 100 TB
    * form of "sample 10% of French".
    */
  def stratifiedSample(documents: DataFrame, rates: Map[String, Int],
                       defaultRate: Int): DataFrame = {
    val bucket = pmod(TextOps.md5long(concat(lit("smp:"), col("doc_id"))), lit(100))
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (lang, r)) =>
      when(col("lang") === lang, lit(r)).otherwise(acc)
    }
    documents.withColumn("bucket", bucket.cast("long"))
      .withColumn("rate", rate.cast("long"))
      .filter(col("bucket") < col("rate"))
  }

  def sample(s: SparkSession, dir: String): DataFrame =
    stratifiedSample(docs(s, dir), Map("en" -> 50), defaultRate = 20)
      .select("doc_id", "lang", "bucket", "rate")
      .orderBy("doc_id")

  val sampleSql: String = {
    val bucket = TextOps.md5longSqlFmt.format("concat('smp:', doc_id)") + " % 100"
    s"""SELECT doc_id, lang, CAST($bucket AS BIGINT) AS bucket,
       |  CAST(CASE WHEN lang = 'en' THEN 50 ELSE 20 END AS BIGINT) AS rate
       |FROM documents
       |WHERE $bucket < CASE WHEN lang = 'en' THEN 50 ELSE 20 END
       |ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_rep_ngrams"     -> (repetition _),
    "q_contamination"  -> (contamination _),
    "q_sample"         -> (sample _))

  val oracles: Map[String, String] = Map(
    "q_rep_ngrams"     -> repetitionSql,
    "q_contamination"  -> contaminationSql,
    "q_sample"         -> sampleSql)
}
