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

  // Gram slicing past the token-array end truncates identically in
  // Spark (`slice`) and DuckDB (`[i:i+k-1]`), pinning short-doc
  // behavior cross-engine.

  // --- 58. repetition quality signals (Gopher-style dup-ngram ratios) ---
  /** Per document: fraction of repeated 4-grams (1 − distinct/total)
    * and the share of the single most frequent 2-gram — the two
    * classic repetition filters of corpus curation.
    *
    * Both signals are row-local, so the whole query is ONE map-side
    * projection with zero shuffles (the ideal 100 TB shape): gram
    * lists, distinct counts, and the in-row mode all evaluate as
    * higher-order array expressions inside the scan stage.  (The
    * first cut exploded 2- and 4-grams through two corpus-wide
    * aggregations — two full shuffles for per-row arithmetic.)
    */
  def repetition(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
        col("doc_id"),
        graft.functions.WordGramStats.of(col("text"), 4).as("s4"),
        graft.functions.WordGramStats.of(col("text"), 2).as("s2"))
      .select(col("doc_id"),
        col("s4.n").as("n4"), col("s4.n_distinct").as("n4_distinct"),
        (lit(1.0) - col("s4.n_distinct").cast("double") / col("s4.n")).as("dup4_ratio"),
        col("s2.n").as("n2"), col("s2.top_n").as("top2_n"),
        (col("s2.top_n").cast("double") / col("s2.n")).as("top2_frac"))
      .orderBy("doc_id")

  val repetitionSql: String = {
    def grams(k: Int) =
      s"list_transform(generate_series(1, greatest(len(string_split(text, ' ')) - ${k - 1}, 1)), i -> array_to_string((string_split(text, ' '))[i:i+${k - 1}], ' '))"
    s"""SELECT doc_id,
       |  CAST(len(${grams(4)}) AS BIGINT) AS n4,
       |  CAST(len(list_distinct(${grams(4)})) AS BIGINT) AS n4_distinct,
       |  1.0::DOUBLE - CAST(len(list_distinct(${grams(4)})) AS DOUBLE)/len(${grams(4)}) AS dup4_ratio,
       |  CAST(len(${grams(2)}) AS BIGINT) AS n2,
       |  CAST(list_max(list_transform(list_distinct(${grams(2)}), g -> len(list_filter(${grams(2)}, x -> x = g)))) AS BIGINT) AS top2_n,
       |  CAST(list_max(list_transform(list_distinct(${grams(2)}), g -> len(list_filter(${grams(2)}, x -> x = g)))) AS DOUBLE)/len(${grams(2)}) AS top2_frac
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // --- 59. benchmark-contamination screen ---
  /** Flag corpus documents sharing 3-gram shingles with a held-out
    * "benchmark" set (here: doc_id % 19 = 0 — at real scale, the
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

  // --- 64. token-budget domain mixing ---
  /** Mixture re-weighting: hit a global token budget (here half the
    * corpus) at target per-language shares (en 40%, others 15%) by
    * computing each language's keep-rate from its token inventory and
    * applying it as a deterministic hash-bucket filter.  The inventory
    * is a per-lang aggregate (a dim-sized frame, broadcast back); the
    * apply pass is map-side — the 100 TB shape of "train on 40%
    * English at half my data budget".  Rates land under 1.0 when a
    * language is over-represented and clamp at 1.0 when the target
    * exceeds supply (no upsampling).
    */
  def domainMix(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("lang"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"),
      pmod(TextOps.md5long(concat(lit("mix:"), col("doc_id"))), lit(100))
        .cast("long").as("bucket"))
    val langTot = d.groupBy("lang").agg(sum("n_tokens").as("lang_tokens"))
    // total from the dim-sized inventory, NOT another corpus scan
    val total = langTot.agg(sum("lang_tokens").as("total_tokens"))
    val share = when(col("lang") === "en", lit(0.4)).otherwise(lit(0.15))
    d.join(broadcast(langTot), "lang").crossJoin(broadcast(total))
      .withColumn("rate", least(lit(1.0),
        share * lit(0.5) * col("total_tokens") / col("lang_tokens")))
      .filter(col("bucket").cast("double") / 100.0 < col("rate"))
      .select("doc_id", "lang", "n_tokens", "bucket", "rate")
      .orderBy("doc_id")
  }

  val domainMixSql: String = {
    val bucket = TextOps.md5longSqlFmt.format("concat('mix:', doc_id)") + " % 100"
    val rate = """least(1.0::DOUBLE,
      CASE WHEN d.lang = 'en' THEN 0.4::DOUBLE ELSE 0.15::DOUBLE END
        * 0.5::DOUBLE * total_tokens / lang_tokens)"""
    s"""WITH d AS (
       |  SELECT doc_id, lang,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |    CAST($bucket AS BIGINT) AS bucket
       |  FROM documents),
       |lt AS (SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS lang_tokens
       |       FROM d GROUP BY 1),
       |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens FROM d)
       |SELECT doc_id, d.lang, n_tokens, bucket, $rate AS rate
       |FROM d JOIN lt ON lt.lang = d.lang CROSS JOIN tot
       |WHERE bucket / 100.0 < $rate
       |ORDER BY doc_id""".stripMargin
  }

  // --- 65. end-to-end curation pipeline (composition proof) ---
  /** The full curation chain as ONE declarative plan: exact-dedup
    * keep-first → quality threshold → deterministic stratified
    * sample.  Each stage is the already-verified operator; composing
    * them hands Catalyst the whole pipeline to optimize as a unit
    * (shared scans, pushed filters) — the way a production corpus
    * build actually runs, rather than one materialized hop per stage.
    */
  def pipeline(s: SparkSession, dir: String): DataFrame = {
    val keepers = Dedup.dedupApply(s, dir).select("doc_id")
    val quality = TextOps.qualityScore(s, dir)
      .select(col("doc_id"), col("quality"))
    val sampled = sample(s, dir).select("doc_id", "bucket")
    docs(s, dir).select(col("doc_id"), col("lang"),
        length(col("text")).cast("long").as("n_chars_txt"))
      .join(keepers, Seq("doc_id"), "leftsemi")
      .join(quality, "doc_id")
      .filter(col("quality") >= 0.5)
      .join(sampled, "doc_id")
      .orderBy("doc_id")
  }

  val pipelineSql: String =
    s"""WITH keep AS (SELECT doc_id FROM (${Dedup.dedupApplySql})),
       |q AS (SELECT doc_id, quality FROM (${TextOps.qualityScoreSql})),
       |smp AS (SELECT doc_id, bucket FROM ($sampleSql))
       |SELECT d.doc_id, d.lang, length(d.text) AS n_chars_txt,
       |       q.quality, smp.bucket
       |FROM documents d
       |JOIN keep USING (doc_id) JOIN q USING (doc_id) JOIN smp USING (doc_id)
       |WHERE q.quality >= 0.5
       |ORDER BY d.doc_id""".stripMargin

  // --- 66. TF-IDF distinctive terms (corpus-signature extraction) ---
  /** Top-3 most distinctive terms per document by an exact rational
    * TF-IDF: score = tf·(N−df)/df.  The classic idf = ln(N/df) is
    * libm (could never hash-match cross-engine — see SURVEY §7); the
    * rational form keeps the same ordering intent (rare-in-corpus,
    * frequent-in-doc wins) with tf·(N−df) exact in BIGINT and the
    * single closing division bit-identical IEEE in both engines.
    *
    * Scale shape: (doc,term) tf and term df are the two natural
    * shuffles (df aggregates the tf table — already one row per
    * (doc,term) — so no second corpus scan); N arrives as a broadcast
    * 1-row aggregate, never a driver collect; the top-k window
    * partitions by doc_id over per-doc vocabularies (bounded state).
    * The BIGINT product tf·(N−df) stays exact under 2^53 — at
    * trillion-doc scale you would quantize df/N to keep the product
    * in range before the division.
    */
  def tfidf(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = docs(s, dir)
    val tk = d.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val tf = tk.groupBy("doc_id", "tok").agg(count("*").as("tf"))
    val dfT = tf.groupBy("tok").agg(count("*").as("df"))
    val n = d.agg(count("*").as("n_docs"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("tok"))
    tf.join(dfT, "tok")
      .crossJoin(broadcast(n))
      .withColumn("score",
        (col("tf") * (col("n_docs") - col("df"))).cast("double") / col("df"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("doc_id"), col("rnk"), col("tok"), col("tf"), col("df"), col("score"))
      .orderBy("doc_id", "rnk")
  }

  val tfidfSql: String =
    """WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tk GROUP BY 1, 2),
      |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |sc AS (SELECT tf.doc_id, tf.tok, tf.tf, df.df,
      |              CAST(tf.tf * (n.n_docs - df.df) AS DOUBLE) / df.df AS score
      |       FROM tf JOIN df ON df.tok = tf.tok CROSS JOIN n),
      |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
      |               ORDER BY score DESC, tok) AS BIGINT) AS rnk FROM sc)
      |SELECT doc_id, rnk, tok, tf, df, score FROM r
      |WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tfidf"          -> (tfidf _),
    "q_pipeline_e2e"   -> (pipeline _),
    "q_domain_mix"     -> (domainMix _),
    "q_rep_ngrams"     -> (repetition _),
    "q_contamination"  -> (contamination _),
    "q_sample"         -> (sample _))

  val oracles: Map[String, String] = Map(
    "q_tfidf"          -> tfidfSql,
    "q_pipeline_e2e"   -> pipelineSql,
    "q_domain_mix"     -> domainMixSql,
    "q_rep_ngrams"     -> repetitionSql,
    "q_contamination"  -> contaminationSql,
    "q_sample"         -> sampleSql)
}
