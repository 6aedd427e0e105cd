package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding vocabulary training + tokenization
  * — the "BPE-ish" half of the brief's token-counting requirement,
  * done the way corpus-scale trainers actually work:
  *
  * The corpus collapses to its DISTINCT-WORD FREQUENCY table first
  * (one shuffle over the corpus); every subsequent merge iteration
  * runs on that dim-sized table (natural-language vocabularies are
  * 10⁵-10⁷ rows where corpora are 10¹²), so training cost is
  * independent of corpus size after the first aggregation.  Each
  * iteration: count adjacent symbol pairs weighted by word frequency
  * (one small agg), pick the most frequent pair (ties break
  * lexicographically — fully deterministic), and apply the merge with
  * a pure higher-order fold over each word's symbol array.  The only
  * driver-side data is the argmax pair per iteration — the merge
  * list IS the trained model.
  */
object Bpe {

  /** Left-fold merge of adjacent (a, b) occurrences in a symbol
    * array: [.., a, b, ..] → [.., ab, ..], greedy left-to-right —
    * standard BPE application order.
    */
  private def mergeExpr(symsCol: String, a: String, b: String): Column = {
    def q(s: String) = s.replace("\\", "\\\\").replace("'", "\\'")
    expr(s"""aggregate($symsCol, cast(array() as array<string>),
      (acc, x) -> CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '${q(a)}'
                        AND x = '${q(b)}'
                  THEN concat(slice(acc, 1, size(acc) - 1), array('${q(a)}${q(b)}'))
                  ELSE concat(acc, array(x)) END)""")
  }

  /** The distinct-word frequency table with initial char-level
    * symbol arrays.
    */
  def wordTable(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count("*").as("freq"))
      .withColumn("syms", expr("transform(split(w, ''), x -> x)"))

  /** Train `nMerges` merges; returns the ordered merge list.
    *
    * @param nParts partitioning of the training word table.  The
    *   default 1 is right for vocabulary-sized tables (every
    *   iteration becomes a single-task job — 12 rounds cost hundreds
    *   of ms, not 12 × a 32-partition shuffle); raise it when the
    *   distinct-word table itself is large.
    */
  def train(docs: DataFrame, nMerges: Int, nParts: Int = 1): Seq[(String, String)] = {
    // single-symbol words contribute no pairs — and would turn the
    // pair-position sequence(1, size-1) into Spark's descending
    // [1, 0] trap
    var words = wordTable(docs).select("freq", "syms")
      .filter(size(col("syms")) > 1)
      .repartition(nParts)
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var i = 0
    while (i < nMerges) {
      val top = words
        .select(col("freq"), explode(expr(
          """transform(sequence(1, size(syms) - 1),
             j -> struct(element_at(syms, j) as a, element_at(syms, j + 1) as b))"""))
          .as("p"))
        .groupBy("p").agg(sum("freq").as("n"))
        .orderBy(col("n").desc, col("p.a"), col("p.b"))
        .limit(1)
        .select("p.a", "p.b", "n")
        .collect()
      if (top.isEmpty || top(0).getLong(2) < 2) {
        i = nMerges // nothing left worth merging
      } else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        words = words
          .withColumn("syms", mergeExpr("syms", a, b))
          .filter(size(col("syms")) > 1) // fully-merged words can't contribute pairs
        // checkpoint every few rounds: enough to bound the chained-
        // fold plan depth without paying a materialization per merge
        if ((i + 1) % 4 == 0) words = words.localCheckpoint()
        i += 1
      }
    }
    merges.toSeq
  }

  /** Tokenize with a trained merge list: per word, apply the merges
    * in training order (the standard BPE application rule) via the
    * native one-pass [[graft.functions.BpeEncode]] expression — the
    * equivalent chained-higher-order-fold form costs one interpreted
    * corpus pass PER MERGE (HOFs don't codegen; measured 16 s vs
    * ~1 s at sf0.1 for 12 merges).
    */
  def tokenize(docs: DataFrame, merges: Seq[(String, String)]): DataFrame =
    docs.select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
      .filter(length(col("w")) > 0)
      .withColumn("tokens", graft.functions.BpeEncode.of(col("w"), merges))
      .select(col("doc_id"), col("pos"), col("w"),
        col("tokens"), size(col("tokens")).cast("long").as("n_tokens"))

  /** The composed fold form of [[tokenize]] — kept as the cross-check
    * reference for the native expression (BpeSpec).
    */
  private[graft] def tokenizeFold(docs: DataFrame,
                                  merges: Seq[(String, String)]): DataFrame = {
    val words = docs.select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
      .filter(length(col("w")) > 0)
      .withColumn("syms", expr("transform(split(w, ''), x -> x)"))
    val merged = merges.foldLeft(words) { case (df, (a, b)) =>
      df.withColumn("syms", mergeExpr("syms", a, b))
    }
    merged.select(col("doc_id"), col("pos"), col("w"),
      col("syms").as("tokens"), size(col("syms")).cast("long").as("n_tokens"))
  }

  // --- 27b (oracle side). encode against a PINNED merge table -------
  //
  // The trained model above is a driver loop; the ENCODE it produces
  // is a pure function of (text, merge list) and therefore
  // oracle-checkable once the merge list is pinned.  The encode is
  // expressed over a wrapped-symbol string form — "the" →
  // "(t)(h)(e)", merge (t,h) = replace "(t)(h)" → "(th)" — because a
  // single left-to-right replace pass over that form IS the standard
  // greedy exhaustive application of one merge (a replacement "(ab)"
  // can never recreate or complete its own pattern: token boundaries
  // are explicit, so no new occurrence can span a rewrite), and
  // `replace` exists verbatim in both engines.  Paired generators
  // (PolyTrig doctrine): [[encodeCol]] builds the Spark Column,
  // [[encodeSql]] the structurally identical DuckDB expression.

  /** The pinned merge table: [[train]]'s output (nMerges = 16) over
    * the sf0.01 documents corpus normalized as in [[encodeCol]] —
    * a real trained model frozen so the encode query needs no
    * training pass.
    */
  val PinnedMerges: Seq[(String, String)] = Seq(
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"),
    ("m", "er"), ("a", "t"), ("l", "u"), ("a", "r"), ("p", "ar"),
    ("j", "o"), ("jo", "in"), ("a", "s"), ("as", "h"), ("h", "ash"),
    ("r", "ow"))

  /** Wrapped-form BPE encode of `textCol`: normalize (lowercase,
    * non-letters → space), wrap each letter as "(c)", then apply the
    * merges in training order.  Output "(th)(e) (c)(at)"-style; token
    * count = number of '('.
    */
  def encodeCol(textCol: Column, merges: Seq[(String, String)]): Column = {
    val wrapped = regexp_replace(
      regexp_replace(lower(textCol), "[^a-z]+", " "), "([a-z])", "($1)")
    merges.foldLeft(wrapped) { case (c, (a, b)) =>
      replace(c, lit(s"($a)($b)"), lit(s"($a$b)"))
    }
  }

  /** DuckDB mirror of [[encodeCol]] over a text expression. */
  def encodeSql(textExpr: String, merges: Seq[(String, String)]): String = {
    val wrapped = s"regexp_replace(regexp_replace(lower($textExpr), " +
      s"'[^a-z]+', ' ', 'g'), '([a-z])', '(\\1)', 'g')"
    merges.foldLeft(wrapped) { case (s, (a, b)) =>
      s"replace($s, '($a)($b)', '($a$b)')"
    }
  }

  /** Per-doc BPE encode stats against [[PinnedMerges]] — one
    * codegen'd map pass (a chain of string replaces), no training
    * jobs, no shuffle besides the output sort.
    */
  def bpeEncodeStats(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val docs = graft.core.Tables.t(s, dir, "documents")
    docs
      .select(col("doc_id"), col("text"),
        encodeCol(col("text"), PinnedMerges).as("enc"))
      .select(col("doc_id"),
        size(regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0)))
          .cast("long").as("n_words"),
        (length(col("enc")) - length(replace(col("enc"), lit("("), lit(""))))
          .cast("long").as("n_bpe_tokens"),
        substring(col("enc"), 1, 48).as("enc_prefix"))
      .withColumn("compression",
        col("n_bpe_tokens").cast("double") / expr("nullif(n_words, 0)"))
      .orderBy("doc_id")
  }

  val bpeEncodeStatsSql: String = {
    val enc = encodeSql("text", PinnedMerges)
    s"""SELECT doc_id,
       |  CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS BIGINT) AS n_words,
       |  CAST(length(enc) - length(replace(enc, '(', '')) AS BIGINT) AS n_bpe_tokens,
       |  substr(enc, 1, 48) AS enc_prefix,
       |  CAST(length(enc) - length(replace(enc, '(', '')) AS DOUBLE)
       |    / nullif(len(regexp_extract_all(lower(text), '[a-z]+')), 0) AS compression
       |FROM (SELECT doc_id, text, $enc AS enc FROM documents)
       |ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame] =
    Map("q_bpe_tokenize" -> (bpeEncodeStats _))

  val oracles: Map[String, String] =
    Map("q_bpe_tokenize" -> bpeEncodeStatsSql)
}
