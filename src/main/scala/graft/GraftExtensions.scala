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
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(exprs(0), exprs(1))))
  }
}

object GraftExtensions {
  /** Register graft SQL functions on an existing session. */
  def register(spark: SparkSession): Unit =
    org.apache.spark.sql.GraftSql.registerFunction(
      spark, "dot_product", exprs => DotProduct(exprs(0), exprs(1)))
}
