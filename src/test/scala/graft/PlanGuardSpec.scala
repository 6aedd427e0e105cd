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
}
