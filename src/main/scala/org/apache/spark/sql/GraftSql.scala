package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column↔Expression converters — the
  * standard extension-library pattern for registering custom Catalyst
  * expressions (cf. public Spark extension projects that place a
  * factory in `org.apache.spark.sql` for the same reason).
  */
/** [[org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes]]
  * facade: `AbstractDataType` is `private[sql]`, so expressions living
  * outside this package declare their input types via the public
  * `DataType` subset.
  */
trait GraftInputTypes
    extends org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  def graftInputTypes: Seq[org.apache.spark.sql.types.DataType]
  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    graftInputTypes
}

object GraftSql {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a function builder on a live session's registry. */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "built-in")
}
