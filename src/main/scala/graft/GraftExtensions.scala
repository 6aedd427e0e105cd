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
  }
}

object GraftExtensions {
  private[graft] val dotProductBuilder
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression = { exprs =>
    // arity checked here (analysis-time error); input types are
    // declared on the expression itself via ExpectsInputTypes
    if (exprs.length != 2)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> "dot_product",
          "expectedNum" -> "2",
          "actualNum" -> exprs.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))
    DotProduct(exprs(0), exprs(1))
  }

  /** Register graft SQL functions on an existing session. */
  def register(spark: SparkSession): Unit =
    org.apache.spark.sql.GraftSql.registerFunction(
      spark, "dot_product", dotProductBuilder)
}
