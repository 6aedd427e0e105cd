package graft.functions

import scala.collection.mutable.ArrayBuffer

/** Planning-time decomposition of a 2-D cell box into contiguous
  * space-filling-curve key ranges — the Spark analog of the
  * reference's offset-run pruned reads (geo_index.py:410-429): a box
  * query over a curve-clustered layout (GeoParquet.writeZOrdered /
  * writeHilbertClustered) enumerates the key intervals the box
  * actually covers and pushes `key BETWEEN lo AND hi` filters to the
  * scan, so parquet row-group min/max stats on the single sorted key
  * column — and file-level manifest stats — skip everything between
  * the intervals.  Filtering on x/y envelopes instead over-selects
  * wherever a file/row-group straddles a curve jump (its x/y bounding
  * box covers dead space the curve never enters); the key intervals
  * are exact.
  *
  * The classic formulation is BIGMIN/LITMAX skip scanning (Tropf &
  * Herzog 1981): on hitting a key outside the box, jump to the next
  * key inside it.  The set of maximal in-box key runs that walk
  * produces is exactly the quadtree decomposition computed here —
  * both Morton and Hilbert are quadrant-recursive, so every aligned
  * 2^k×2^k quad holds one contiguous block of 4^k keys starting at a
  * multiple of 4^k, and recursing until a quad is fully inside (or
  * fully outside) the box yields the maximal runs directly.  Doing it
  * as quadtree descent instead of per-gap BIGMIN arithmetic makes the
  * same code serve both curves: the only curve-specific piece is the
  * cell→key kernel.
  *
  * Driver-side and O(perimeter/2^floorLevel): the recursion refines
  * only boundary quads, and [[decompose]] stops refining below an
  * adaptive floor level so huge boxes emit coarse (superset) runs
  * instead of millions of exact ones.  Superset runs are safe — the
  * reader re-applies the exact x/y box predicate to rows — they only
  * trade pruning precision for a bounded predicate count.
  */
object CurveRanges {

  /** Cell→key kernels of the two shipped quadrant-recursive curves. */
  sealed trait Curve { def key(cellX: Long, cellY: Long): Long }
  case object Z extends Curve {
    def key(cellX: Long, cellY: Long): Long = ZOrder.xy2z(cellX, cellY)
  }
  case object H extends Curve {
    def key(cellX: Long, cellY: Long): Long = Hilbert.xy2d(cellX, cellY)
  }

  private val Bits = 21           // matches ZOrder/Hilbert cell space
  private val Bias = ZOrder.Bias  // signed cell → [0, 2^21) biased

  /** Decompose the inclusive signed cell box [cx0..cx1]×[cy0..cy1]
    * into ≤ `maxRanges` inclusive key intervals whose union covers
    * every cell in the box (exactly the box when the budget allows;
    * a superset once coarsening/merging kicks in).
    */
  def decompose(cx0: Long, cx1: Long, cy0: Long, cy1: Long,
                curve: Curve, maxRanges: Int = 32): Seq[(Long, Long)] = {
    require(cx0 <= cx1 && cy0 <= cy1, s"empty box [$cx0,$cx1]x[$cy0,$cy1]")
    require(maxRanges >= 1, "maxRanges must be >= 1")
    val lim = (1L << Bits) - 1
    val bx0 = (cx0 + Bias).max(0L); val bx1 = (cx1 + Bias).min(lim)
    val by0 = (cy0 + Bias).max(0L); val by1 = (cy1 + Bias).min(lim)
    if (bx0 > bx1 || by0 > by1) return Seq.empty // box outside the domain

    // refine boundary quads only down to a floor level sized so the
    // explored frontier stays a few hundred nodes regardless of box
    // size (below the floor a partial quad emits its whole run)
    val w = bx1 - bx0 + 1; val h = by1 - by0 + 1
    var floorLevel = 0
    while (((w >> floorLevel) + 2) * ((h >> floorLevel) + 2) > 256)
      floorLevel += 1

    val acc = ArrayBuffer.empty[(Long, Long)]
    def emit(x0: Long, y0: Long, level: Int): Unit = {
      val span = 1L << (2 * level) // 4^level keys in an aligned quad
      val base = curve.key(x0 - Bias, y0 - Bias) & ~(span - 1)
      acc += ((base, base + span - 1))
    }
    def go(x0: Long, y0: Long, level: Int): Unit = {
      val size = 1L << level
      if (x0 > bx1 || x0 + size - 1 < bx0 ||
          y0 > by1 || y0 + size - 1 < by0) () // disjoint
      else if ((x0 >= bx0 && x0 + size - 1 <= bx1 &&
                y0 >= by0 && y0 + size - 1 <= by1) || level <= floorLevel)
        emit(x0, y0, level)
      else {
        val half = size >> 1
        go(x0, y0, level - 1); go(x0 + half, y0, level - 1)
        go(x0, y0 + half, level - 1); go(x0 + half, y0 + half, level - 1)
      }
    }
    go(0L, 0L, Bits)

    // coalesce touching runs, then merge smallest gaps down to budget
    val sorted = acc.sortBy(_._1)
    val merged = ArrayBuffer.empty[(Long, Long)]
    sorted.foreach { r =>
      if (merged.nonEmpty && r._1 <= merged.last._2 + 1)
        merged(merged.size - 1) = (merged.last._1, merged.last._2.max(r._2))
      else merged += r
    }
    while (merged.size > maxRanges) {
      var best = 1; var bestGap = Long.MaxValue
      var i = 1
      while (i < merged.size) {
        val gap = merged(i)._1 - merged(i - 1)._2
        if (gap < bestGap) { bestGap = gap; best = i }
        i += 1
      }
      merged(best - 1) = (merged(best - 1)._1, merged(best)._2)
      merged.remove(best)
    }
    merged.toSeq
  }
}
