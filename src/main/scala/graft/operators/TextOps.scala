package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Text-analysis operators for the large-scale training-data pipeline
  * (brief §extensions): token statistics, quality scoring, language
  * ID, and document fingerprinting.  All pure `Column` expressions —
  * whole-stage codegen, no UDFs.
  */
object TextOps {

  /** 60-bit integer from the md5 of a string — the shared
    * deterministic hash of the engine (DuckDB mirror:
    * CAST('0x'||substr(md5(x),1,15) AS BIGINT)).
    */
  def md5long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  val md5longSqlFmt = "CAST('0x' || substr(md5(%s), 1, 15) AS BIGINT)"

  private def docs(s: SparkSession, dir: String) = Tables.t(s, dir, "documents")

  // --- 27. token counting (whitespace + alpha-run "BPE-ish" regex) ---
  def tokenCount(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        size(expr("regexp_extract_all(text, '[a-z]+', 0)")).cast("long").as("n_alpha_runs"))
      .withColumn("avg_tok_len",
        (col("n_chars") - (col("n_tokens") - 1)).cast("double") / col("n_tokens"))
      .orderBy("doc_id")

  val tokenCountSql: String =
    """SELECT doc_id, length(text) AS n_chars,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |  CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS n_alpha_runs,
      |  CAST(length(text) - (len(string_split(text,' ')) - 1) AS DOUBLE)
      |        / len(string_split(text,' ')) AS avg_tok_len
      |FROM documents ORDER BY doc_id""".stripMargin

  // --- 28. quality score (length / letter-ratio / stopword-ratio) ---
  private val stopset = "('the','a','of','and','to','in','is','on','for','with')"

  def qualityScore(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
        col("doc_id"),
        (length(regexp_replace(col("text"), "[^a-z]", "")).cast("double") /
          length(col("text"))).as("letter_ratio"),
        (expr(s"size(filter(split(text, ' '), t -> t IN $stopset))").cast("double") /
          size(split(col("text"), " "))).as("stop_ratio"),
        least(length(col("text")).cast("double") / 500.0, lit(1.0)).as("len_score"))
      .withColumn("quality",
        col("letter_ratio") * 0.4 + col("stop_ratio") * 0.3 + col("len_score") * 0.3)
      .select(col("doc_id"), col("letter_ratio"), col("stop_ratio"),
        col("len_score"), col("quality"))
      .orderBy("doc_id")

  val qualityScoreSql: String =
    s"""WITH q AS (
       |  SELECT doc_id,
       |    CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
       |      / length(text) AS letter_ratio,
       |    CAST(len(list_filter(string_split(text, ' '),
       |           t -> t IN $stopset)) AS DOUBLE)
       |      / len(string_split(text, ' ')) AS stop_ratio,
       |    least(CAST(length(text) AS DOUBLE)/500.0, 1.0) AS len_score
       |  FROM documents)
       |SELECT doc_id, letter_ratio, stop_ratio, len_score,
       |  letter_ratio*0.4 + stop_ratio*0.3 + len_score*0.3 AS quality
       |FROM q ORDER BY doc_id""".stripMargin

  // --- 29. language ID (stopword-hit n-gram heuristic) ---
  private val enSet = "('the','and','of','is','was','that','with')"
  private val deSet = "('der','die','das','und','ist','mit','ein')"
  private val esSet = "('el','la','los','las','es','con','una')"

  def langId(s: SparkSession, dir: String): DataFrame = {
    def hits(set: String) =
      expr(s"size(filter(split(text, ' '), t -> t IN $set))").cast("long")
    docs(s, dir).select(col("doc_id"), col("lang").as("lang_label"),
        hits(enSet).as("en_hits"), hits(deSet).as("de_hits"), hits(esSet).as("es_hits"))
      .withColumn("lang_pred",
        when(col("en_hits") >= col("de_hits") && col("en_hits") >= col("es_hits"), "en")
          .when(col("de_hits") >= col("es_hits"), "de")
          .otherwise("es"))
      .orderBy("doc_id")
  }

  val langIdSql: String =
    s"""WITH h AS (
       |  SELECT doc_id, lang AS lang_label,
       |    CAST(len(list_filter(string_split(text,' '), t -> t IN $enSet)) AS BIGINT) AS en_hits,
       |    CAST(len(list_filter(string_split(text,' '), t -> t IN $deSet)) AS BIGINT) AS de_hits,
       |    CAST(len(list_filter(string_split(text,' '), t -> t IN $esSet)) AS BIGINT) AS es_hits
       |  FROM documents)
       |SELECT doc_id, lang_label, en_hits, de_hits, es_hits,
       |  CASE WHEN en_hits >= de_hits AND en_hits >= es_hits THEN 'en'
       |       WHEN de_hits >= es_hits THEN 'de' ELSE 'es' END AS lang_pred
       |FROM h ORDER BY doc_id""".stripMargin

  // --- 29b. char-trigram profile (the n-gram half of language ID) ---
  /** Per document: its most frequent character trigram (ties to the
    * lexicographically smallest) and that trigram's count — the
    * building block of n-gram language profiles.
    */
  def charNgrams(s: SparkSession, dir: String): DataFrame =
    // the per-doc trigram argmax is row-local: the native one-pass
    // TopTrigram expression computes it inside whole-stage codegen —
    // no explode (one row per corpus character) and no shuffles
    // (groupBy(doc,g) + argmax) ever leave the scan stage
    docs(s, dir)
      .select(col("doc_id"), graft.functions.TopTrigram.of(col("text")).as("top"))
      .select(col("doc_id"), col("top.g").as("top_trigram"), col("top.n").as("n_occurrences"))
      .orderBy("doc_id")

  /** The composed (explode + aggregate) form of [[charNgrams]] — kept
    * as the cross-check reference for the native expression.
    */
  def charNgramsComposed(s: SparkSession, dir: String): DataFrame = {
    val grams = docs(s, dir)
      .select(col("doc_id"),
        explode(expr("transform(sequence(1, greatest(length(text) - 2, 1)), i -> substring(text, i, 3))"))
          .as("g"))
      .groupBy("doc_id", "g").agg(count("*").as("n"))
    grams.groupBy("doc_id")
      .agg(min_by(struct(col("g"), col("n")), struct(-col("n"), col("g"))).as("top"))
      .select(col("doc_id"), col("top.g").as("top_trigram"), col("top.n").as("n_occurrences"))
      .orderBy("doc_id")
  }

  val charNgramsSql: String =
    """WITH grams AS (
      |  SELECT doc_id, substr(text, i, 3) AS g, count(*) AS n
      |  FROM documents,
      |    LATERAL (SELECT unnest(generate_series(1, greatest(length(text) - 2, 1))) AS i) t
      |  GROUP BY 1, 2),
      |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, g) AS rnk
      |      FROM grams)
      |SELECT doc_id, g AS top_trigram, n AS n_occurrences
      |FROM r WHERE rnk = 1 ORDER BY doc_id""".stripMargin

  // --- 30. document fingerprinting (content + min-shingle hash) ---
  /** Winnowing-style: the fingerprint is the minimum hash over word
    * 3-gram shingles, plus a whole-content hash.
    */
  def fingerprint(s: SparkSession, dir: String): DataFrame =
    // the per-doc min-hash fingerprint is row-local: the native
    // MinShingleHash expression computes it in one pass inside
    // whole-stage codegen — the round-1 explode + groupBy + join-back
    // collapses to a single projection over one scan
    docs(s, dir)
      .select(col("doc_id"), md5long(col("text")).as("content_fp"),
        graft.functions.MinShingleHash.of(col("text"), 3).as("fp"))
      .select(col("doc_id"), col("content_fp"),
        col("fp.min_fp").as("min_shingle_fp"), col("fp.n").as("n_shingles"))
      .orderBy("doc_id")

  val fingerprintSql: String =
    """SELECT doc_id,
      |  CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) AS content_fp,
      |  list_aggregate(list_transform(
      |    generate_series(1, greatest(len(string_split(text,' ')) - 2, 1)),
      |    i -> CAST('0x' || substr(md5(array_to_string((string_split(text,' '))[i:i+2], ' ')), 1, 15) AS BIGINT)
      |  ), 'min') AS min_shingle_fp,
      |  CAST(greatest(len(string_split(text,' ')) - 2, 1) AS BIGINT) AS n_shingles
      |FROM documents ORDER BY doc_id""".stripMargin

  // --- 28b. text cleaning + redaction (pipeline normalization step) ---
  /** Normalize (lowercase, collapse whitespace, strip non-alnum) and
    * redact digit runs — the standard pre-tokenization cleanup of a
    * training-data pipeline, as pure codegen'd expressions.
    */
  def textClean(s: SparkSession, dir: String): DataFrame = {
    // one fused normalization pass: any run of characters outside
    // [a-z0-9] (spaces included) collapses to a single space —
    // equivalent to the round-1 strip('[^a-z0-9 ]') → collapse(' +')
    // sequence, one full-corpus regex pass cheaper
    val collapsed = trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " "))
    val redacted  = regexp_replace(collapsed, "[0-9]+", "<num>")
    docs(s, dir).select(
        col("doc_id"),
        length(collapsed).cast("long").as("clean_len"),
        md5(redacted).as("clean_md5"),
        size(expr("regexp_extract_all(text, '[0-9]+', 0)")).cast("long").as("n_digit_runs"))
      .orderBy("doc_id")
  }

  val textCleanSql: String =
    """SELECT doc_id,
      |  length(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS clean_len,
      |  md5(regexp_replace(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '[0-9]+', '<num>', 'g')) AS clean_md5,
      |  CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_digit_runs
      |FROM documents ORDER BY doc_id""".stripMargin

  // --- 28c. corpus-rarity quality signal (unigram-LM analog) ---
  /** Rarity-based quality scoring — the deterministic stand-in for a
    * unigram-logprob filter (log is libm, so a logprob could never
    * hash-match cross-engine; ranks are integers and can): build the
    * corpus vocabulary with counts, dense-rank it by frequency
    * (rank 1 = most common), broadcast the vocabulary, and score each
    * document by the mean/max rank of its tokens.  High mean rank =
    * rare vocabulary = candidate for quality/domain filtering.
    *
    * Scale shape: the global window runs over the *vocabulary* (a dim
    * table ≪ corpus — natural-language vocabularies are millions of
    * rows where corpora are trillions); the corpus-side join is
    * broadcast map-side, and the per-doc rollup is the one shuffle.
    */
  def tokenRarity(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tk = docs(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val vocab = tk.groupBy("tok").agg(count("*").as("cnt"))
    val ranked = vocab.select(col("tok"),
      dense_rank().over(Window.orderBy(col("cnt").desc, col("tok"))).cast("long").as("rnk"))
    tk.join(broadcast(ranked), "tok")
      .groupBy("doc_id")
      .agg(count("*").as("n_tokens"), sum("rnk").as("rank_sum"), max("rnk").as("rank_max"))
      .withColumn("mean_rank", col("rank_sum").cast("double") / col("n_tokens"))
      .orderBy("doc_id")
  }

  val tokenRaritySql: String =
    """WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |vocab AS (SELECT tok, count(*) AS cnt FROM tk GROUP BY 1),
      |ranked AS (SELECT tok, CAST(dense_rank() OVER (ORDER BY cnt DESC, tok) AS BIGINT) AS rnk
      |           FROM vocab),
      |j AS (SELECT tk.doc_id, r.rnk FROM tk JOIN ranked r ON r.tok = tk.tok)
      |SELECT doc_id, count(*) AS n_tokens, CAST(sum(rnk) AS BIGINT) AS rank_sum,
      |       max(rnk) AS rank_max, CAST(sum(rnk) AS DOUBLE)/count(*) AS mean_rank
      |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // --- 36b. chunked payload + frame sampling (video-style access) ---
  /** Split each payload into fixed 256-byte chunks and keep every 4th
    * ("frame sampling" over a chunked binary column; the corpus is
    * ASCII so char and byte offsets coincide).  The explode/filter
    * shape is exactly how a real frame sampler fans a blob out to
    * per-frame rows for parallel decode.
    */
  def frameSample(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      // the length guard pins the empty-payload behavior cross-engine:
      // Spark's sequence(0, -1) yields a descending [0, -1] (a phantom
      // frame), DuckDB's generate_series(0, -1) is empty
      .filter(length(col("text")) > 0)
      // text rides through the explode — one scan of documents, no
      // join-back (round 1 re-joined documents on doc_id to recover
      // text: a whole extra shuffle/broadcast in the plan)
      .select(col("doc_id"), col("text"),
        explode(expr("sequence(0, cast(ceil(length(text)/256.0) as int) - 1)")).as("chunk_idx"))
      .filter(col("chunk_idx") % 4 === 0)
      .select(col("doc_id"), col("chunk_idx").cast("long").as("frame_idx"),
        length(expr("substring(text, chunk_idx*256 + 1, 256)")).cast("long").as("chunk_len"),
        md5(expr("substring(text, chunk_idx*256 + 1, 256)")).as("chunk_md5"))
      .orderBy("doc_id", "frame_idx")

  val frameSampleSql: String =
    """WITH c AS (
      |  SELECT doc_id, text, i AS chunk_idx
      |  FROM documents,
      |    LATERAL (SELECT unnest(generate_series(0, CAST(ceil(length(text)/256.0) AS INTEGER) - 1)) AS i) t
      |  WHERE length(text) > 0 AND i % 4 = 0)
      |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS frame_idx,
      |  CAST(length(substr(text, chunk_idx*256 + 1, 256)) AS BIGINT) AS chunk_len,
      |  md5(substr(text, chunk_idx*256 + 1, 256)) AS chunk_md5
      |FROM c ORDER BY doc_id, frame_idx""".stripMargin

  // --- 26c. cross-document duplicated-passage detection ---
  /** Passage-level exact dedup (the chunked form of substring dedup
    * in training-data pipelines): split every document into fixed
    * 64-char chunks, hash them, and report chunks appearing in more
    * than one document.  One shuffle on the chunk hash; downstream a
    * pipeline semi-joins these spans back to redact or drop them.
    */
  def spanDedup(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), col("text"),
        explode(expr("sequence(0, cast(ceil(length(text)/64.0) as int) - 1)")).as("ci"))
      .select(col("doc_id"),
        md5(expr("substring(text, ci*64 + 1, 64)")).as("chunk_md5"))
      .groupBy("chunk_md5")
      .agg(countDistinct("doc_id").as("n_docs"),
           count("*").as("n_occurrences"),
           min("doc_id").as("first_doc"))
      .filter(col("n_docs") > 1)
      .orderBy("chunk_md5")

  val spanDedupSql: String =
    """WITH c AS (
      |  SELECT doc_id, md5(substr(text, i*64 + 1, 64)) AS chunk_md5
      |  FROM documents,
      |    LATERAL (SELECT unnest(generate_series(0, CAST(ceil(length(text)/64.0) AS INTEGER) - 1)) AS i) t
      |  WHERE length(text) > 0)
      |SELECT chunk_md5, count(DISTINCT doc_id) AS n_docs,
      |       count(*) AS n_occurrences, min(doc_id) AS first_doc
      |FROM c GROUP BY 1 HAVING count(DISTINCT doc_id) > 1
      |ORDER BY chunk_md5""".stripMargin

  // --- 36. multimodal metadata surface (binary-column plumbing) ---
  /** Image/audio/video are opaque binary columns with typed metadata;
    * the decode stub lives in graft.multimodal.  The queryable surface
    * (sizes, chunking, content hash) is plain expressions.
    */
  def multimodalMeta(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
        col("doc_id"),
        octet_length(col("text").cast("binary")).cast("long").as("n_bytes"),
        (octet_length(col("text").cast("binary")) % 640).cast("long").as("fake_w"),
        (octet_length(col("text").cast("binary")) % 480).cast("long").as("fake_h"),
        ceil(octet_length(col("text").cast("binary")) / lit(1024.0)).cast("long").as("n_chunks"),
        md5(col("text")).as("content_hash"))
      .orderBy("doc_id")

  val multimodalMetaSql: String =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  CAST(octet_length(encode(text)) % 640 AS BIGINT) AS fake_w,
      |  CAST(octet_length(encode(text)) % 480 AS BIGINT) AS fake_h,
      |  CAST(ceil(octet_length(encode(text))/1024.0) AS BIGINT) AS n_chunks,
      |  md5(text) AS content_hash
      |FROM documents ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_token_count"     -> (tokenCount _),
    "q_quality_score"   -> (qualityScore _),
    "q_text_clean"      -> (textClean _),
    "q_lang_id"         -> (langId _),
    "q_char_ngrams"     -> (charNgrams _),
    "q_fingerprint"     -> (fingerprint _),
    "q_multimodal_meta" -> (multimodalMeta _),
    "q_frame_sample"    -> (frameSample _),
    "q_token_rarity"    -> (tokenRarity _),
    "q_span_dedup"      -> (spanDedup _))

  val oracles: Map[String, String] = Map(
    "q_token_count"     -> tokenCountSql,
    "q_quality_score"   -> qualityScoreSql,
    "q_text_clean"      -> textCleanSql,
    "q_lang_id"         -> langIdSql,
    "q_char_ngrams"     -> charNgramsSql,
    "q_fingerprint"     -> fingerprintSql,
    "q_multimodal_meta" -> multimodalMetaSql,
    "q_frame_sample"    -> frameSampleSql,
    "q_token_rarity"    -> tokenRaritySql,
    "q_span_dedup"      -> spanDedupSql)
}
