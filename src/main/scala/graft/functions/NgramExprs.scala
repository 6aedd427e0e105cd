package graft.functions

import org.apache.spark.sql.{Column, GraftInputTypes, GraftSql}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass "most frequent character trigram" of a string.
  *
  * The composable form — explode the trigram positions, groupBy
  * (doc, gram), argmax — materializes one row per character of the
  * corpus and shuffles twice.  The per-document trigram profile is a
  * purely row-local computation, so this expression does it in one
  * pass over the string with a scratch hash map, inside whole-stage
  * codegen (the generated code calls the static [[TopTrigram.compute]]
  * — the StaticInvoke pattern), deleting the explode and both
  * shuffles from the plan.
  *
  * Semantics are identical to the SQL form `substring(text, i, 3)`
  * for i ∈ [1, max(len−2, 1)] with ties broken toward the
  * lexicographically smallest gram (binary order — the corpus is
  * ASCII, where Java and UTF8 binary order agree).
  */
case class TopTrigram(child: Expression)
    extends UnaryExpression with GraftInputTypes {

  override def graftInputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = StructType(Seq(
    StructField("g", StringType, nullable = false),
    StructField("n", LongType, nullable = false)))

  override def prettyName: String = "top_trigram"

  override def nullSafeEval(input: Any): Any =
    TopTrigram.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TopTrigram.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native one-pass word-shingle hasher: the DISTINCT 60-bit md5
  * hashes of a string's word k-grams, deduplicated inside the row.
  *
  * Replaces the composed pipeline `explode(transform(sequence(...),
  * i -> concat_ws(' ', slice(split(text,' '), i, k))))` →
  * `md5long(g)` → `.distinct()`: the distinct there exists only to
  * dedupe shingles *within* each document — a purely row-local fact —
  * yet it costs a full (doc_id, gh) exchange of the exploded corpus.
  * This expression dedupes in a per-row hash set, so the explode that
  * follows it needs no shuffle at all, and the per-shingle string
  * building (array slice + concat) happens in one pass without
  * intermediate arrays.
  *
  * Hash semantics are identical to `TextOps.md5long` (first 60 bits
  * of the md5 of the UTF-8 shingle text, words joined by a single
  * space; `split(' ', -1)` keeps empty tokens exactly like Spark's
  * `split(text, ' ')`), so the DuckDB oracle mirror is unchanged.
  * k = 1 degenerates to distinct token hashes (the simhash input).
  */
case class WordShingleHashes(child: Expression, k: Int)
    extends UnaryExpression with GraftInputTypes {

  override def graftInputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "word_shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    WordShingleHashes.compute(input.asInstanceOf[UTF8String], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShingleHashes.compute($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shared machinery of the word-gram expressions: the tokenize /
  * truncating-slice / join loop and the 60-bit md5 gram hash.  The
  * edge-gram truncation (positions [1, max(len−k+1, 1)], last grams
  * shortened) is load-bearing for oracle parity — one implementation,
  * three expressions.
  */
private[functions] object WordGrams {

  /** One digest instance per executor thread (getInstance per row is
    * measurable at corpus scale); hash60() resets it per shingle.
    */
  val mdLocal: ThreadLocal[java.security.MessageDigest] =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** First 60 bits of md5(g) — identical to
    * conv(substr(md5(g),1,15),16,10): bytes 0..6 plus the high nibble
    * of byte 7.
    */
  def hash60(md: java.security.MessageDigest, g: String): Long = {
    md.reset()
    val d = md.digest(g.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var b = 0
    while (b < 7) { v = (v << 8) | (d(b) & 0xFFL); b += 1 }
    (v << 4) | ((d(7) & 0xFFL) >>> 4)
  }

  /** Invoke f on every word k-gram of u, in position order. */
  def foreach(u: UTF8String, k: Int)(f: String => Unit): Unit = {
    val toks = u.toString.split(" ", -1)
    val sz = toks.length
    val last = math.max(sz - (k - 1), 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < last) {
      sb.setLength(0)
      var j = i
      val end = math.min(i + k, sz)
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      f(sb.toString)
      i += 1
    }
  }
}

object WordShingleHashes {

  def compute(u: UTF8String, k: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val md = WordGrams.mdLocal.get()
    WordGrams.foreach(u, k)(g => seen.add(WordGrams.hash60(md, g)))
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Column API. */
  def of(c: Column, k: Int): Column =
    GraftSql.column(WordShingleHashes(GraftSql.expression(c), k))
}

/** Native one-pass winnowing fingerprint: the minimum 60-bit md5 hash
  * over a string's word k-grams (ALL positions, duplicates included —
  * unlike [[WordShingleHashes]] this is positional, not set-semantic)
  * plus the position count, as one struct — the whole per-document
  * fingerprint without an explode, a groupBy, or a join.
  */
case class MinShingleHash(child: Expression, k: Int)
    extends UnaryExpression with GraftInputTypes {

  override def graftInputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = StructType(Seq(
    StructField("min_fp", LongType, nullable = false),
    StructField("n", LongType, nullable = false)))

  override def prettyName: String = "min_shingle_hash"

  override def nullSafeEval(input: Any): Any =
    MinShingleHash.compute(input.asInstanceOf[UTF8String], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinShingleHash.compute($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinShingleHash {

  def compute(u: UTF8String, k: Int): InternalRow = {
    val md = WordGrams.mdLocal.get()
    var minV = Long.MaxValue
    var n = 0L
    WordGrams.foreach(u, k) { g =>
      val v = WordGrams.hash60(md, g)
      if (v < minV) minV = v
      n += 1
    }
    new GenericInternalRow(Array[Any](minV, n))
  }

  /** Column API. */
  def of(c: Column, k: Int): Column =
    GraftSql.column(MinShingleHash(GraftSql.expression(c), k))
}

/** Native one-pass word k-gram statistics: total gram positions,
  * distinct gram count, and the multiplicity of the most frequent
  * gram, as one struct — the inputs of the Gopher-style repetition
  * filters (dup-ngram ratio, top-gram share).
  *
  * The composable forms both lose: explode + groupBy shuffles the
  * whole corpus twice for row-local arithmetic, and the higher-order
  * `transform(array_distinct(g), x -> size(filter(g, ...)))` form
  * re-evaluates the gram-array expression per lambda element (HOFs
  * don't whole-stage-codegen and CSE stops at lambda boundaries) —
  * measured 175 s at sf0.1 vs sub-second for this expression.
  * Gram semantics mirror the SQL `(string_split(text,' '))[i:i+k-1]`
  * slice for i ∈ [1, max(len−k+1, 1)]: edge grams truncate.
  */
case class WordGramStats(child: Expression, k: Int)
    extends UnaryExpression with GraftInputTypes {

  override def graftInputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_n", LongType, nullable = false)))

  override def prettyName: String = "word_gram_stats"

  override def nullSafeEval(input: Any): Any =
    WordGramStats.compute(input.asInstanceOf[UTF8String], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordGramStats.compute($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordGramStats {

  def compute(u: UTF8String, k: Int): InternalRow = {
    val counts = new java.util.HashMap[String, Long]()
    var top = 0L
    var total = 0L
    WordGrams.foreach(u, k) { g =>
      val prev = counts.get(g)
      val n = if (prev == null) 1L else prev + 1L
      counts.put(g, n)
      if (n > top) top = n
      total += 1
    }
    new GenericInternalRow(Array[Any](total, counts.size.toLong, top))
  }

  /** Column API. */
  def of(c: Column, k: Int): Column =
    GraftSql.column(WordGramStats(GraftSql.expression(c), k))
}

/** Native BPE encoder: apply a trained merge list (training order,
  * each merge greedy left-to-right — exactly the semantics of
  * [[graft.operators.Bpe]]'s higher-order-fold form) to one word per
  * row, in a single JVM pass.  The fold form chains one interpreted
  * HOF per merge (HOFs don't codegen), costing merges × corpus array
  * rebuilds; this does all merges in one call inside whole-stage
  * codegen.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with GraftInputTypes {

  override def graftInputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "bpe_encode"

  private lazy val flat: Array[String] =
    merges.flatMap(p => Seq(p._1, p._2)).toArray

  override def nullSafeEval(input: Any): Any =
    BpeEncode.compute(input.asInstanceOf[UTF8String], flat)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", flat, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeEncode.compute($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeEncode {

  /** flatMerges = [a0, b0, a1, b1, ...] in training order. */
  def compute(u: UTF8String,
              flatMerges: Array[String]): org.apache.spark.sql.catalyst.util.ArrayData = {
    val s = u.toString
    var syms = new java.util.ArrayList[String](s.length)
    // split by CODE POINT, exactly like the fold form's split(w, '')
    // — per-code-unit substring would break surrogate pairs (emoji)
    // into lone surrogates and diverge from the trainer's symbols
    var ci = 0
    while (ci < s.length) {
      val cp = s.codePointAt(ci)
      val n = Character.charCount(cp)
      syms.add(s.substring(ci, ci + n))
      ci += n
    }
    var m = 0
    while (m < flatMerges.length) {
      val a = flatMerges(m); val b = flatMerges(m + 1)
      val out = new java.util.ArrayList[String](syms.size)
      var i = 0
      while (i < syms.size) {
        val x = syms.get(i)
        if (!out.isEmpty && out.get(out.size - 1) == a && x == b)
          out.set(out.size - 1, a + b)
        else out.add(x)
        i += 1
      }
      syms = out
      m += 2
    }
    val arr = new Array[AnyRef](syms.size)
    var o = 0
    while (o < syms.size) { arr(o) = UTF8String.fromString(syms.get(o)); o += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  /** Column API. */
  def of(c: Column, merges: Seq[(String, String)]): Column =
    GraftSql.column(BpeEncode(GraftSql.expression(c), merges))
}

object TopTrigram {

  /** One pass: count every trigram, return (best gram, count). */
  def compute(u: UTF8String): InternalRow = {
    val s = u.toString
    val len = s.length
    val counts = new java.util.HashMap[String, Long]()
    val last = math.max(len - 2, 1)
    var i = 0
    while (i < last) {
      val g = s.substring(i, math.min(i + 3, len))
      val prev = counts.get(g)
      counts.put(g, if (prev == null) 1L else prev + 1L)
      i += 1
    }
    var bestG: String = null
    var bestN = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val better = e.getValue > bestN ||
        (e.getValue == bestN && (bestG == null || e.getKey.compareTo(bestG) < 0))
      if (better) { bestG = e.getKey; bestN = e.getValue }
    }
    new GenericInternalRow(Array[Any](UTF8String.fromString(bestG), bestN))
  }

  /** Column API. */
  def of(c: Column): Column = GraftSql.column(TopTrigram(GraftSql.expression(c)))
}
