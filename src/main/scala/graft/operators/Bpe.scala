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

  /** Train-then-tokenize over the documents table, rolled up per doc.
    * Training is an iterative driver loop (the merge list is the
    * model), so there is no single-statement SQL oracle — the driver
    * records a rows-only check; BpeSpec pins training merge-for-merge
    * against a reference implementation.
    */
  def bpeStats(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val docs = graft.core.Tables.t(s, dir, "documents")
    val merges = train(docs, nMerges = 12)
    tokenize(docs, merges)
      .groupBy("doc_id")
      .agg(count("*").as("n_words"), sum("n_tokens").as("n_bpe_tokens"))
      .withColumn("compression",
        col("n_bpe_tokens").cast("double") / col("n_words"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame] =
    Map("q_bpe_tokenize" -> (bpeStats _))
}
