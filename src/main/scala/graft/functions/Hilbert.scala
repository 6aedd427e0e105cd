package graft.functions

import org.apache.spark.sql.{Column, GraftInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType}

/** Native one-call Hilbert xy→d (kernel: [[Hilbert.xy2d]]). */
case class HilbertKey(left: Expression, right: Expression)
    extends BinaryExpression with GraftInputTypes {

  override def graftInputTypes: Seq[DataType] = Seq(LongType, LongType)

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_key"

  override def nullSafeEval(a: Any, b: Any): Any =
    Hilbert.xy2d(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.Hilbert.xy2d($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Hilbert curve index — the tighter-locality alternative to
  * [[ZOrder]] for write-time clustering: consecutive key values are
  * always Manhattan-adjacent cells (no Z-shaped jumps), so contiguous
  * row ranges have the best achievable bounding boxes.
  *
  * The xy→d walk is the classic bit-plane loop (Wikipedia "Hilbert
  * curve", converting between d and (x,y)): 21 iterations of
  * quadrant-digit extraction + frame rotation.  Each iteration is
  * pure integer CASE/shift/xor arithmetic, threaded as one
  * state-update stage per bit — the Spark side folds 21 projections,
  * the oracle side chains 21 CTE selects, and both execute the same
  * IEEE-free integer ops, so keys are identical cross-engine.
  *
  * Signed cell indexes use the same ±2²⁰ bias as [[ZOrder]].
  */
object Hilbert {

  val Bits = 21
  val Bias: Long = ZOrder.Bias
  private val N = 1L << Bits

  /** One rotation/accumulation stage at bit k, as (x', y', d'). */
  private def stage(k: Int, x: Column, y: Column, d: Column): (Column, Column, Column) = {
    val s = 1L << k
    val rx = shiftright(x, k).bitwiseAND(lit(1L))
    val ry = shiftright(y, k).bitwiseAND(lit(1L))
    val d2 = d + lit(s * s) * (lit(3L) * rx).bitwiseXOR(ry)
    // ry=1: frame unchanged; ry=0: flip when rx=1, then swap x/y
    val x2 = when(ry === 1, x).when(rx === 1, lit(N - 1) - y).otherwise(y)
    val y2 = when(ry === 1, y).when(rx === 1, lit(N - 1) - x).otherwise(x)
    (x2, y2, d2)
  }

  /** Hilbert d of two signed cell indexes in [−2²⁰, 2²⁰).
    *
    * Folds 21 stages with explicit intermediate columns via the
    * caller's select — see [[withDkey]]; the raw Column form would
    * nest the rotation CASEs 3^21 deep.
    */
  def withDkey(df: org.apache.spark.sql.DataFrame, cellX: String, cellY: String,
               out: String): org.apache.spark.sql.DataFrame = {
    val seeded = df
      .withColumn("_hx", col(cellX) + Bias)
      .withColumn("_hy", col(cellY) + Bias)
      .withColumn(out, lit(0L))
    val walked = (Bits - 1 to 0 by -1).foldLeft(seeded) { (acc, k) =>
      val (x2, y2, d2) = stage(k, col("_hx"), col("_hy"), col(out))
      // one projection per bit plane: rx/ry stay single-use per stage,
      // so CollapseProject can't explode the expression tree
      acc.withColumn("_hx2", x2).withColumn("_hy2", y2).withColumn(out, d2)
        .withColumn("_hx", col("_hx2")).withColumn("_hy", col("_hy2"))
        .drop("_hx2", "_hy2")
    }
    walked.drop("_hx", "_hy")
  }

  /** DuckDB mirror: chains one CTE per bit plane.  Returns the full
    * `WITH`-clause body (to splice after existing CTEs) and the name
    * of the final relation; `carry` columns pass through unchanged.
    * The seed CTE reads `cellX`/`cellY` from relation `base`.
    */
  def dkeySqlChain(base: String, cellX: String, cellY: String,
                   carry: Seq[String], out: String): (String, String) = {
    val cs = carry.mkString(", ")
    val seed =
      s"h$Bits AS (SELECT $cs, ($cellX) + $Bias AS hx, ($cellY) + $Bias AS hy, 0 AS hd FROM $base)"
    val stages = (Bits - 1 to 0 by -1).map { k =>
      val s = 1L << k
      s"""h$k AS (SELECT $cs,
         |  CASE WHEN ry = 1 THEN hx WHEN rx = 1 THEN ${N - 1} - hy ELSE hy END AS hx,
         |  CASE WHEN ry = 1 THEN hy WHEN rx = 1 THEN ${N - 1} - hx ELSE hx END AS hy,
         |  hd + ${s * s} * xor(3 * rx, ry) AS hd
         |  FROM (SELECT *, (hx >> $k) & 1 AS rx, (hy >> $k) & 1 AS ry FROM h${k + 1}))""".stripMargin
    }
    ((seed +: stages).mkString(",\n"),
      s"(SELECT $cs, CAST(hd AS BIGINT) AS $out FROM h0)")
  }

  /** The plain-loop walk — the native expression's kernel, the
    * driver-side reference of the specs, and the semantics the
    * Column fold / SQL CTE chain replicate stage by stage.
    */
  def xy2d(cellX: Long, cellY: Long): Long = {
    var x = cellX + Bias; var y = cellY + Bias; var d = 0L
    var k = Bits - 1
    while (k >= 0) {
      val s = 1L << k
      val rx = (x >> k) & 1L
      val ry = (y >> k) & 1L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = N - 1 - x; y = N - 1 - y }
        val t = x; x = y; y = t
      }
      k -= 1
    }
    d
  }

  /** One-call Column form via the native [[HilbertKey]] expression —
    * the 21-stage Column fold of [[withDkey]] is semantically
    * identical but pays 21 chained projection operators per row
    * (measured 3 s vs 0.3 s at sf0.1); prefer this in hot paths.
    */
  def dkey(cellX: org.apache.spark.sql.Column,
           cellY: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftSql.column(HilbertKey(
      org.apache.spark.sql.GraftSql.expression(cellX),
      org.apache.spark.sql.GraftSql.expression(cellY)))

  /** Driver-side inverse (specs): d → (cellX, cellY). */
  def d2xy(d0: Long): (Long, Long) = {
    var x = 0L; var y = 0L; var t = d0
    var s = 1L
    while (s < N) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1 - x; y = s - 1 - y }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s *= 2
    }
    (x - Bias, y - Bias)
  }
}
