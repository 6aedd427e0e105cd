package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine bit-identical elementary functions as fixed-degree
  * polynomials in plain IEEE arithmetic.
  *
  * libm trig (`sin`/`cos`/`tan`/`exp`/`pow`) differs by ≤1 ulp between
  * the JVM and DuckDB, and rounding the outputs does NOT absorb that
  * (round() itself diverges cross-engine on boundary-terminating
  * decimals — SURVEY §4/§7 invariant, and the cause of round 1's only
  * red correctness row).  The sound fix: evaluate the SAME truncated
  * series, in the SAME operation order, in both engines.  Every
  * operation here is +,−,×,÷ on doubles — IEEE-correctly-rounded in
  * both engines — so identical inputs give identical bits, with no
  * rounding step at all.
  *
  * Each function has a Column form (`sinC`…) and a SQL-text form
  * (`sinS`…) generated from the same denominator list, so the
  * operation trees are structurally identical by construction.  The
  * caller materializes `x` and `x2 = x*x` as columns on both sides.
  *
  * Accuracy (not the point, but good): sin/cos are Taylor to x^21/x^20
  * — |err| ≲ 1e-11 on [−π, π]; exp to w^6 — exact to 1e-16 for the
  * |w| ≤ 0.007 ellipsoidal-correction range; atanh to z^9 — 1e-13 for
  * |z| ≤ e ≈ 0.082.  `sqrt` is IEEE-exact in both engines and used
  * directly.
  */
object PolyTrig {

  /** Nearest double to π; the literal string round-trips identically
    * through Double.parseDouble and DuckDB's decimal→double cast.
    */
  val PI = 3.141592653589793

  // sin x = x·Π-form of Σ (−1)^k x^(2k+1)/(2k+1)!; denominators (2k)(2k+1)
  private val sinDen = Seq(6.0, 20.0, 42.0, 72.0, 110.0, 156.0, 210.0, 272.0, 342.0, 420.0)
  // cos x: denominators (2k−1)(2k)
  private val cosDen = Seq(2.0, 12.0, 30.0, 56.0, 90.0, 132.0, 182.0, 240.0, 306.0, 380.0)
  // exp w = nested 1 + w/k·(…)
  private val expDen = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0)

  def sinC(x: Column, x2: Column): Column =
    x * sinDen.reverse.foldLeft(lit(1.0): Column)((acc, d) => lit(1.0) - x2 / d * acc)

  def sinS(x: String, x2: String): String =
    s"($x * " + sinDen.reverse.foldLeft("1.0")((acc, d) => s"(1.0 - $x2/$d * $acc)") + ")"

  def cosC(x2: Column): Column =
    cosDen.reverse.foldLeft(lit(1.0): Column)((acc, d) => lit(1.0) - x2 / d * acc)

  def cosS(x2: String): String =
    "(" + cosDen.reverse.foldLeft("1.0")((acc, d) => s"(1.0 - $x2/$d * $acc)") + ")"

  def expC(w: Column): Column =
    expDen.reverse.foldLeft(lit(1.0): Column)((acc, d) => lit(1.0) + w / d * acc)

  def expS(w: String): String =
    "(" + expDen.reverse.foldLeft("1.0")((acc, d) => s"(1.0 + $w/$d * $acc)") + ")"

  def atanhC(z: Column, z2: Column): Column =
    z + z * z2 / 3.0 + z * z2 * z2 / 5.0 + z * z2 * z2 * z2 / 7.0 + z * z2 * z2 * z2 * z2 / 9.0

  def atanhS(z: String, z2: String): String =
    s"($z + $z*$z2/3.0 + $z*$z2*$z2/5.0 + $z*$z2*$z2*$z2/7.0 + $z*$z2*$z2*$z2*$z2/9.0)"
}
