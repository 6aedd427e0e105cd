package graft.sources

/** Single-pass grouping of a KEY-SORTED iterator into (key, rows)
  * batches.  Granule writers run this inside `mapPartitions` after
  * `repartition(key).sortWithinPartitions(key)`: many granules hash
  * into one partition, and the previous `it.toSeq.groupBy` form
  * materialized ALL of them on the heap at once — executor memory was
  * the sum of co-resident granules.  With the sort + this iterator,
  * memory is ONE granule at a time regardless of fan-in, which is the
  * shape a 10⁶-granule archive needs.
  */
object GranuleGroups {

  /** Consecutive rows with equal `key` become one (key, rows) batch.
    * Requires the iterator sorted (or at least clustered) by key —
    * equal keys must be adjacent, which `sortWithinPartitions`
    * guarantees.  Each batch materializes only its own rows.
    */
  def byKey[T, K](it: Iterator[T])(key: T => K): Iterator[(K, Seq[T])] =
    new Iterator[(K, Seq[T])] {
      private val buf = it.buffered
      def hasNext: Boolean = buf.hasNext
      def next(): (K, Seq[T]) = {
        if (!buf.hasNext) throw new NoSuchElementException("empty group iterator")
        val k = key(buf.head)
        val rows = scala.collection.mutable.ArrayBuffer.empty[T]
        while (buf.hasNext && key(buf.head) == k) rows += buf.next()
        (k, rows.toSeq)
      }
    }
}
