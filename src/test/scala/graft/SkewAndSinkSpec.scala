package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.{Crossovers, Skew}

class SkewAndSinkSpec extends SparkSpec {
  import spark.implicits._

  test("salted count equals plain count on a skewed key") {
    val e = graft.core.Tables.t(spark, sf, "events")
      .withColumn("hot", when($"user_id" < 5, 0L).otherwise($"user_id")) // skew to key 0
    val plain = e.groupBy("hot").count().withColumnRenamed("hot", "k")
    val salted = Skew.saltedCount(e, $"hot", $"event_id", 8)
    assert(salted.join(plain, "k").filter($"n" =!= $"count").count() == 0)
    assert(salted.count() == plain.count())
  }

  test("salted join equals plain join") {
    val big = graft.core.Tables.t(spark, sf, "events")
      .select(($"user_id" % 3).as("k"), $"event_id")
    val small = Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("k", "v")
    val plain = big.join(small, "k")
    val salted = Skew.saltedJoin(big, small, "k", $"event_id", 4)
    assert(salted.count() == plain.count())
    assert(salted.select(sum($"event_id")).as[Long].head() ==
           plain.select(sum($"event_id")).as[Long].head())
  }

  test("runtime bloom filter prunes the fact side of a selective shuffle join") {
    // at 100 TB a selective dim predicate should reach the fact scan as
    // a runtime bloom filter (row-level semi-join pushdown) — assert
    // Spark's optimizer injects it when the join must shuffle
    // restore EVERY touched key afterwards — the session is a shared
    // singleton and leaked thresholds would inject bloom aggregates
    // into later suites' plans (PlanGuardSpec pins exchange counts)
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    val prev = keys.map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    // production default is 10GB of fact-side scan before a bloom
    // filter pays for itself; the sf-scale fact side is MBs, so lower
    // the gate to let the optimizer prove the mechanism here
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    try {
      val orders = graft.core.Tables.t(spark, sf, "orders")
        .filter($"o_orderpriority" === "1-URGENT")
      val li = graft.core.Tables.t(spark, sf, "lineitem")
      val joined = li.join(orders, li("l_orderkey") === orders("o_orderkey"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
        s"no runtime bloom filter in:\n${plan.take(2000)}")
      assert(joined.count() > 0)
    } finally {
      prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }
  }

  test("q6 predicates reach the parquet scan as PushedFilters") {
    val plan = graft.operators.Relational.q6Filter(spark, sf)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pushed = plan.linesIterator.find(_.contains("PushedFilters")).get
    assert(pushed.contains("l_shipdate") && pushed.contains("l_discount") &&
           pushed.contains("LessThan(l_quantity,24")) // all four predicates sargable
  }

  test("bucketed co-located join plans with zero exchanges") {
    import graft.sources.Bucketing
    Bucketing.writeBucketed(
      graft.core.Tables.t(spark, sf, "lineitem"), "li_b", "l_orderkey", 4)
    Bucketing.writeBucketed(
      graft.core.Tables.t(spark, sf, "orders")
        .withColumnRenamed("o_orderkey", "l_orderkey"), "ord_b", "l_orderkey", 4)
    // force the fact-fact (sort-merge) path: at 100 TB neither side
    // broadcasts, which is exactly when bucketing pays
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.colocatedJoin(spark, "li_b", "ord_b", "l_orderkey")
      assert(joined.count() == graft.core.Tables.t(spark, sf, "lineitem").count())
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"), s"expected shuffle-free bucketed join:\n$plan")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("bucketed shingle table: near-dup candidate self-join is exchange-free") {
    import graft.sources.Bucketing
    // at 100 TB the shingle table is materialized once, bucketed by
    // the shingle hash; every near-dup candidate pass then self-joins
    // with no shuffle at all — the layout IS the join plan
    val sh = graft.operators.Dedup.shinglesOf(
      graft.core.Tables.t(spark, sf, "documents"))
    Bucketing.writeBucketed(sh, "sh_b", "gh", 4)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val t = spark.table("sh_b")
      val cand = t.as("a").join(t.as("b"),
        col("a.gh") === col("b.gh") && col("a.doc_id") < col("b.doc_id"))
      assert(cand.count() > 0)
      val plan = cand.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"), s"expected shuffle-free self-join:\n$plan")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("crossover tile sink round-trips with partition pruning") {
    val dir = Files.createTempDirectory("xovers").toString
    val xo = Crossovers.crossovers(spark, sf)
    Crossovers.writeXovers(xo, dir)
    val all = Crossovers.readXovers(spark, dir)
    assert(all.count() == xo.count() && xo.count() == 9)
    // single-tile read prunes partitions
    val oneTile = all.select("tile_e", "tile_n").distinct().head()
    // partition-dir values read back with integer inference
    val tiled = Crossovers.readXovers(spark, dir,
      Some((oneTile.getAs[Number](0).longValue, oneTile.getAs[Number](1).longValue)))
    assert(tiled.count() > 0 && tiled.count() <= all.count())
    val explained = tiled.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(explained.linesIterator.exists(l =>
      l.contains("PartitionFilters") && l.contains("tile_e")))
  }
}
