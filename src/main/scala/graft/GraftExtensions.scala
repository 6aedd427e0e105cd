package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.DotProduct

/** SparkSessionExtensions entry point: makes graft's native
  * expressions available to plain SQL users —
  * `spark.sql.extensions=graft.GraftExtensions` or
  * [[GraftExtensions.register]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      GraftExtensions.dotProductBuilder))
    ext.injectFunction((
      new FunctionIdentifier("hamming"),
      new ExpressionInfo(classOf[graft.functions.HammingDistance].getName, "hamming"),
      GraftExtensions.binary("hamming", graft.functions.HammingDistance.apply)))
    ext.injectFunction((
      new FunctionIdentifier("top_trigram"),
      new ExpressionInfo(classOf[graft.functions.TopTrigram].getName, "top_trigram"),
      GraftExtensions.unary("top_trigram", graft.functions.TopTrigram.apply)))
    ext.injectFunction((
      new FunctionIdentifier("word_gram_stats"),
      new ExpressionInfo(classOf[graft.functions.WordGramStats].getName, "word_gram_stats"),
      GraftExtensions.wordGramStatsBuilder))
    ext.injectFunction((
      new FunctionIdentifier("hilbert_key"),
      new ExpressionInfo(classOf[graft.functions.HilbertKey].getName, "hilbert_key"),
      GraftExtensions.binary("hilbert_key", graft.functions.HilbertKey.apply)))
  }
}

object GraftExtensions {
  private type Expr = org.apache.spark.sql.catalyst.expressions.Expression

  /** Arity check at analysis time; input types are declared on the
    * expressions themselves via ExpectsInputTypes.
    */
  private def arity(name: String, expected: Int, actual: Int): Unit =
    if (actual != expected)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> name,
          "expectedNum" -> expected.toString,
          "actualNum" -> actual.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))

  private[graft] def unary(name: String, f: Expr => Expr): Seq[Expr] => Expr = {
    exprs => arity(name, 1, exprs.length); f(exprs(0))
  }

  private[graft] def binary(name: String, f: (Expr, Expr) => Expr): Seq[Expr] => Expr = {
    exprs => arity(name, 2, exprs.length); f(exprs(0), exprs(1))
  }

  private[graft] val dotProductBuilder: Seq[Expr] => Expr =
    binary("dot_product", DotProduct.apply)

  /** word_gram_stats(text, k) — k must be a positive int literal. */
  private[graft] val wordGramStatsBuilder: Seq[Expr] => Expr = { exprs =>
    arity("word_gram_stats", 2, exprs.length)
    def bad(why: String): Nothing =
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> s"word_gram_stats ($why)",
          "expectedNum" -> "2", "actualNum" -> exprs.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))
    val k = exprs(1) match {
      case e if e.foldable && (e.dataType == org.apache.spark.sql.types.IntegerType ||
          e.dataType == org.apache.spark.sql.types.LongType) =>
        e.eval(null) match {
          case null              => bad("k must not be null")
          case v: java.lang.Number
            if v.longValue >= 1 && v.longValue <= Int.MaxValue => v.intValue
          case _                 => bad("k must be a positive int literal")
        }
      case _ => bad("k must be a positive int literal")
    }
    graft.functions.WordGramStats(exprs(0), k)
  }

  /** Register graft SQL functions on an existing session. */
  def register(spark: SparkSession): Unit = {
    org.apache.spark.sql.GraftSql.registerFunction(
      spark, "dot_product", dotProductBuilder)
    org.apache.spark.sql.GraftSql.registerFunction(
      spark, "hamming", binary("hamming", graft.functions.HammingDistance.apply))
    org.apache.spark.sql.GraftSql.registerFunction(
      spark, "top_trigram", unary("top_trigram", graft.functions.TopTrigram.apply))
    org.apache.spark.sql.GraftSql.registerFunction(
      spark, "word_gram_stats", wordGramStatsBuilder)
    org.apache.spark.sql.GraftSql.registerFunction(
      spark, "hilbert_key", binary("hilbert_key", graft.functions.HilbertKey.apply))
  }
}
