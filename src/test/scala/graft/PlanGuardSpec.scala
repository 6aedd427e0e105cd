package graft

import org.apache.spark.sql.DataFrame
import graft.operators._

/** Plan-shape regression guard: the round-2 perf work moved several
  * operators to exchange-free or single-exchange plans (native
  * expressions, broadcast dims, map-side aggregation).  These bounds
  * pin that state — a future edit that silently re-introduces a
  * shuffle fails here, not in the bench report.
  *
  * Counts are on the pre-AQE physical plan: every `Exchange` line,
  * including the final orderBy's range exchange.
  */
class PlanGuardSpec extends SparkSpec {

  private def exchanges(df: DataFrame): Int =
    df.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange"))

  private val bounds: Seq[(String, DataFrame, Int)] = Seq(
    // single-pass native-expression plans: only the orderBy shuffles
    ("char_ngrams", TextOps.charNgrams(spark, sf), 1),
    ("fingerprint", TextOps.fingerprint(spark, sf), 1),
    // pure projections over one scan
    ("token_count", TextOps.tokenCount(spark, sf), 1),
    ("text_clean", TextOps.textClean(spark, sf), 1),
    ("frame_sample", TextOps.frameSample(spark, sf), 1),
    ("multimodal_meta", TextOps.multimodalMeta(spark, sf), 1),
    ("project_xy", DateOps.projectXy(spark, sf), 1),
    ("project_epsg", Projections.projectEpsg(spark, sf), 1),
    ("dates", DateOps.dates(spark, sf), 1),
    ("rep_ngrams", CorpusOps.repetition(spark, sf), 1),
    ("sample", CorpusOps.sample(spark, sf), 1),
    ("zorder", GeoOps.zorderKey(spark, sf), 1),
    // one aggregation + the output ordering
    ("geoindex_build", GeoOps.geoindexBuild(spark, sf), 2),
    ("block_stats", GeoOps.blockStats(spark, sf), 2),
    ("simhash", Dedup.simhash(spark, sf), 2),
    ("dedup_exact", Dedup.dedupExact(spark, sf), 2),
    // distinct-aggregate (countDistinct) plans one extra exchange
    ("span_dedup", TextOps.spanDedup(spark, sf), 3),
    ("q1_agg", Relational.q1Agg(spark, sf), 2),
    // nested from_json + explode stay map-side: agg + orderBy only
    ("json_nested", Relational.jsonNested(spark, sf), 2))

  test("exchange counts stay at their optimized bounds") {
    val over = bounds.flatMap { case (name, df, bound) =>
      val n = exchanges(df)
      if (n > bound) Some(s"$name: $n exchanges (bound $bound)") else None
    }
    assert(over.isEmpty, s"plan regressions:\n${over.mkString("\n")}")
  }

  test("scoped-compact planning is sub-second and heap-bounded at 1e5 manifest rows") {
    // a 100k-file manifest: 10k components of 10 overlapping runs
    // each (every component exceeds maxOverlap=4), interleaved with
    // wide gaps — the worst realistic interval-sweep shape
    val rows = Array.tabulate(100000) { i =>
      val comp = i / 10; val j = i % 10
      (f"part-$i%06d", comp * 10000L + j * 10L, comp * 10000L + j * 10L + 500L)
    }
    // shuffle deterministically: planning must not assume sorted input
    val jumbled = rows.indices.map(i =>
      rows(((i.toLong * 48271L) % rows.length).toInt)).toArray
    val t0 = System.nanoTime()
    val scope = graft.sources.GeoParquet.planCompactScope(jumbled, maxOverlap = 4)
    val tSec = (System.nanoTime() - t0) / 1e9
    assert(scope.size == 100000, s"all files are in >4-deep components, got ${scope.size}")
    assert(tSec < 1.0, s"planning took $tSec s for 1e5 manifest rows")
    // and the depth threshold really gates: disjoint runs plan nothing
    val disjoint = Array.tabulate(100000)(i => (s"f$i", i * 1000L, i * 1000L + 10L))
    assert(graft.sources.GeoParquet.planCompactScope(disjoint, 4).isEmpty)
    // correctness corner: two components, only the deep one doomed
    val mixed = Array(
      ("a", 0L, 100L), ("b", 10L, 110L), ("c", 20L, 120L),
      ("d", 30L, 130L), ("e", 40L, 140L), // depth 5 > 4
      ("x", 10000L, 10100L), ("y", 10200L, 10300L)) // depth 1
    assert(graft.sources.GeoParquet.planCompactScope(mixed, 4).toSet ==
      Set("a", "b", "c", "d", "e"))
  }
}
