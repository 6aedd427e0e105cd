package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve key — the write-time clustering key for
  * multi-dimensional data layouts (the technique behind Delta/Iceberg
  * Z-ORDER BY).  Sorting a 2-D point set by the interleaved-bit key
  * makes every contiguous chunk of rows spatially compact, so parquet
  * row-group min/max stats on x AND y are simultaneously tight and a
  * 2-D box query prunes on one sort order — a bin-partitioned layout
  * (GeoParquet.write) prunes directories, a z-ordered layout
  * additionally prunes row groups *within* large partitions/files.
  *
  * Paired generators (PolyTrig doctrine): [[zkey]] builds the Spark
  * Column, [[zkeySql]] the structurally identical DuckDB expression —
  * pure integer shifts/masks, so results are bit-identical
  * cross-engine.  21 bits per axis → 42-bit key, range ±2²⁰ per axis.
  */
object ZOrder {

  /** Bias making cell indexes non-negative before bit-spreading. */
  val Bias = 1L << 20
  private val M21 = (1L << 21) - 1

  // the 2-D Morton spread (part1by1): after the last step the 21
  // input bits sit at even positions 0,2,…,40, so x | y<<1 occupies
  // exactly bits 0..41 — a true 42-bit key
  private val steps = Seq(
    16 -> 0x0000ffff0000ffffL,
    8  -> 0x00ff00ff00ff00ffL,
    4  -> 0x0f0f0f0f0f0f0f0fL,
    2  -> 0x3333333333333333L,
    1  -> 0x5555555555555555L)

  // each step is (x | x<<s) & m, algebraically rewritten as
  // (x & m) | ((x & (m>>s)) << s) so the shift can never overflow a
  // signed 64-bit value — DuckDB raises on <<-overflow where Java
  // wraps, and the pre-masked form is bit-identical in both engines
  private def spread(c: Column): Column =
    steps.foldLeft(c.bitwiseAND(lit(M21))) { case (x, (s, m)) =>
      x.bitwiseAND(lit(m))
        .bitwiseOR(shiftleft(x.bitwiseAND(lit(m >>> s)), s))
    }

  private def spreadSql(e: String): String =
    steps.foldLeft(s"(($e) & $M21)") { case (x, (s, m)) =>
      s"((($x & $m) | (($x & ${m >>> s}) << $s)))"
    }

  /** Interleaved key of two signed cell indexes in [−2²⁰, 2²⁰). */
  def zkey(cellX: Column, cellY: Column): Column =
    spread(cellX + Bias).bitwiseOR(shiftleft(spread(cellY + Bias), 1))

  /** DuckDB mirror of [[zkey]] over two BIGINT cell-index expressions. */
  def zkeySql(cellX: String, cellY: String): String =
    s"(${spreadSql(s"($cellX) + $Bias")} | (${spreadSql(s"($cellY) + $Bias")} << 1))"

  /** Driver-side encode — the planning-time kernel of
    * [[CurveRanges]] (and the specs' reference for [[zkey]]).
    */
  def xy2z(cellX: Long, cellY: Long): Long = {
    def spread(v0: Long): Long =
      steps.foldLeft(v0 & M21) { case (x, (s, m)) =>
        (x & m) | ((x & (m >>> s)) << s)
      }
    spread(cellX + Bias) | (spread(cellY + Bias) << 1)
  }

  /** Driver-side decode (specs): recover (cellX, cellY) from a key. */
  def decode(key: Long): (Long, Long) = {
    def unspread(v0: Long): Long = {
      var v = v0 & 0x5555555555555555L
      Seq(1 -> 0x3333333333333333L, 2 -> 0x0f0f0f0f0f0f0f0fL,
        4 -> 0x00ff00ff00ff00ffL, 8 -> 0x0000ffff0000ffffL, 16 -> M21)
        .foreach { case (s, m) => v = (v | (v >> s)) & m }
      v
    }
    (unspread(key) - Bias, unspread(key >> 1) - Bias)
  }
}
