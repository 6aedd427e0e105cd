package graft.functions

import org.apache.spark.sql.{Column, GraftInputTypes, GraftSql}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd dot product over `array<double>` columns.
  *
  * The composable alternative — `aggregate(zip_with(a, b, (x,y) ->
  * x*y), 0d, (acc,x) -> acc+x)` — allocates an intermediate array and
  * interprets the lambda per element outside whole-stage codegen.
  * This expression compiles to a tight primitive loop inside the
  * generated code (the preference order of the brief: native
  * `Expression` with `doGenCode` over HOFs over UDFs for hot paths).
  * Summation is left-to-right, matching the HOF fold bit-for-bit.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with GraftInputTypes {

  // SQL users reach this via GraftExtensions: declared input types
  // turn a wrong-typed call into an analysis error instead of a
  // runtime ClassCastException
  override def graftInputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native codegen'd Hamming distance between two 64-bit signatures —
  * popcount of the xor, one instruction pair in generated code.
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression with GraftInputTypes {

  override def graftInputTypes: Seq[DataType] = Seq(LongType, LongType)

  override def dataType: DataType = LongType
  override def prettyName: String = "hamming"

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long]).toLong

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = (long) java.lang.Long.bitCount($a ^ $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  /** Column API for [[DotProduct]]. */
  def dotp(a: Column, b: Column): Column =
    GraftSql.column(DotProduct(GraftSql.expression(a), GraftSql.expression(b)))

  /** Column API for [[HammingDistance]]. */
  def hamming(a: Column, b: Column): Column =
    GraftSql.column(HammingDistance(GraftSql.expression(a), GraftSql.expression(b)))
}
