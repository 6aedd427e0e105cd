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
