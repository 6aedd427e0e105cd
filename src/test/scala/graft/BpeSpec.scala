package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference BPE trainer: plain Scala over a word-frequency map. */
  private def refTrain(words: Map[String, Long], n: Int): Seq[(String, String)] = {
    var ws: Map[Vector[String], Long] =
      words.map { case (w, f) => w.map(_.toString).toVector -> f }
    val out = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var done = false
    while (out.size < n && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, f) <- ws; i <- 0 until syms.size - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      val best = counts.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.headOption
      best match {
        case Some(((a, b), c)) if c >= 2 =>
          out += ((a, b))
          ws = ws.map { case (syms, f) => merge(syms, a, b) -> f }
            .groupBy(_._1).map { case (k, vs) => k -> vs.values.sum }
            .filter(_._1.size > 1)
        case _ => done = true
      }
    }
    out.toSeq
  }

  private def merge(syms: Vector[String], a: String, b: String): Vector[String] =
    syms.foldLeft(Vector.empty[String]) { (acc, x) =>
      if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
      else acc :+ x
    }

  private val corpus = Seq(
    (1L, "low low low lower lower newest newest newest newest widest"),
    (2L, "newest widest widest low lowest"),
    (3L, "newest newest lowest lower low"))

  test("distributed training matches the reference trainer merge-for-merge") {
    val docs = corpus.toDF("doc_id", "text")
    val wordFreq = corpus.flatMap(_._2.split(" ")).groupBy(identity)
      .map { case (w, ws) => w -> ws.size.toLong }
    val got = Bpe.train(docs, nMerges = 8)
    val want = refTrain(wordFreq, 8)
    assert(got == want, s"got $got\nwant $want")
    assert(got.size == 8)
  }

  test("native encode splits by code point: surrogate pairs stay whole") {
    val docs = Seq((1L, "😀ab 😀ab ab")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, nMerges = 2)
    val native = Bpe.tokenize(docs, merges)
      .select("pos", "tokens").as[(Int, Seq[String])].collect().toMap
    val fold = Bpe.tokenizeFold(docs, merges)
      .select("pos", "tokens").as[(Int, Seq[String])].collect().toMap
    assert(native == fold, s"native $native\nfold $fold")
    // no token is a lone surrogate half, and words reassemble exactly
    assert(native.values.flatten.forall(t =>
      !(t.length == 1 && Character.isSurrogate(t.charAt(0)))))
    val broken = Bpe.tokenize(docs, merges)
      .filter(concat_ws("", $"tokens") =!= $"w").count()
    assert(broken == 0)
  }

  test("tokenization applies merges in order and conserves characters") {
    val docs = corpus.toDF("doc_id", "text")
    val merges = Bpe.train(docs, nMerges = 6)
    val toks = Bpe.tokenize(docs, merges).cache()
    // native BpeEncode == the composed fold form, row for row
    val fold = Bpe.tokenizeFold(docs, merges)
      .select("doc_id", "pos", "tokens").as[(Long, Int, Seq[String])].collect().toSet
    val native = toks
      .select("doc_id", "pos", "tokens").as[(Long, Int, Seq[String])].collect().toSet
    assert(native == fold)
    // every word's tokens concatenate back to the word
    assert(toks.filter(concat_ws("", $"tokens") =!= $"w").count() == 0)
    // merges actually compress: some word has fewer tokens than chars
    assert(toks.filter($"n_tokens" < length($"w")).count() > 0)
    // determinism: retraining yields the identical merge list
    assert(Bpe.train(docs, nMerges = 6) == merges)
    toks.unpersist()
  }

  test("chained-replace encode (the oracle form) segments exactly like the native tokenizer") {
    // normalize the way encodeCol does, then compare segmentations:
    // the wrapped-string replace chain must produce, per word, the
    // same token sequence as the native BpeEncode expression
    // deterministic doc selection (limit() without order is not);
    // tokenize emits no rows for a letterless doc while the replace
    // chain yields n = 0 for it, so compare over the nonzero support
    val docs = graft.core.Tables.t(spark, sf, "documents")
      .filter($"doc_id" < 200)
      .select($"doc_id",
        regexp_replace(lower($"text"), "[^a-z]+", " ").as("text"))
    val nativeCounts = Bpe.tokenize(docs, Bpe.PinnedMerges)
      .groupBy("doc_id").agg(sum("n_tokens").as("n")).as[(Long, Long)]
      .collect().toMap
    val viaReplace = docs
      .select($"doc_id", Bpe.encodeCol($"text", Bpe.PinnedMerges).as("enc"))
      .select($"doc_id",
        (length($"enc") - length(replace($"enc", lit("("), lit(""))))
          .cast("long").as("n")).as[(Long, Long)].collect().toMap
    assert(viaReplace.filter(_._2 > 0) == nativeCounts)
    assert(viaReplace.keySet.diff(nativeCounts.keySet).forall(viaReplace(_) == 0L))
    // and on a handful of fixed words, the full segmentation matches
    val words = Seq("master", "partition", "join", "hash", "rows",
      "interest", "lower", "a", "stow")
    val wdocs = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val seg = Bpe.tokenize(wdocs, Bpe.PinnedMerges)
      .select("w", "tokens").as[(String, Seq[String])].collect().toMap
    val segReplace = wdocs
      .select($"text", Bpe.encodeCol($"text", Bpe.PinnedMerges).as("enc"))
      .as[(String, String)].collect().toMap
      .map { case (w, enc) =>
        w -> enc.stripPrefix("(").stripSuffix(")").split("\\)\\(").toSeq
      }
    assert(seg == segReplace, s"native $seg\nreplace $segReplace")
  }
}
