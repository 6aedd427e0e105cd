package graft

import org.apache.spark.sql.functions._
import graft.operators.TemporalJoins

class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  test("asof join: basic semantics incl. same-instant match and no-match null") {
    val left = Seq((1L, 100L, 10L), (1L, 205L, 11L), (2L, 50L, 12L), (3L, 90L, 13L))
      .toDF("k", "t", "id")
    val right = Seq((1L, 100L, 20L, 1.0), (1L, 200L, 21L, 2.0), (1L, 300L, 22L, 3.0),
        (2L, 60L, 23L, 4.0))
      .toDF("k", "t", "id", "v")
    val got = TemporalJoins.asofJoin(left, right, "k", "t", "id")
      .select($"id", $"r_id", $"r_v").as[(Long, Option[Long], Option[Double])]
      .collect().map { case (k, a, b) => k -> ((a, b)) }.toMap
    assert(got(10L) == (Some(20L), Some(1.0)))  // same-instant right row matches
    assert(got(11L) == (Some(21L), Some(2.0)))  // latest at-or-before, not later
    assert(got(12L) == (None, None))            // right row is strictly later
    assert(got(13L) == (None, None))            // key with no right rows at all
  }

  test("asof join: right-side time ties resolve to the largest id") {
    val left = Seq((1L, 100L, 10L)).toDF("k", "t", "id")
    val right = Seq((1L, 90L, 20L, 1.0), (1L, 90L, 21L, 2.0)).toDF("k", "t", "id", "v")
    val got = TemporalJoins.asofJoin(left, right, "k", "t", "id")
    assert(got.select($"r_id").as[Long].head() == 21L)
  }

  test("asof join: a matched right row with null values is reported as-is, never stitched") {
    // the matched row (t=10) carries a null v; the match must NOT
    // borrow v=7.0 from the older t=5 row (per-column ignoreNulls
    // forward-fill would) — pandas merge_asof keeps the matched null
    val left = Seq((1L, 20L, 10L)).toDF("k", "t", "id")
    val right = Seq((1L, 5L, 20L, Some(7.0)), (1L, 10L, 21L, Option.empty[Double]))
      .toDF("k", "t", "id", "v")
    val got = TemporalJoins.asofJoin(left, right, "k", "t", "id")
      .select($"r_id", $"r_v").as[(Option[Long], Option[Double])].head()
    assert(got == ((Some(21L), None)))
  }

  test("asof join: tolerance nulls out stale matches, keeps fresh ones") {
    val left = Seq((1L, 100L, 10L), (1L, 300L, 11L)).toDF("k", "t", "id")
    val right = Seq((1L, 95L, 20L, 1.0), (1L, 110L, 21L, 2.0)).toDF("k", "t", "id", "v")
    val got = TemporalJoins.asofJoin(left, right, "k", "t", "id", tolerance = Some(50L))
      .select($"id", $"r_id", $"r_v").as[(Long, Option[Long], Option[Double])]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(10L) == ((Some(20L), Some(1.0))))   // age 5 ≤ 50: kept
    assert(got(11L) == ((None, None)))             // age 190 > 50: all nulled
  }

  test("asof join rejects inputs colliding with internal / output names") {
    val right = Seq((1L, 90L, 20L, 1.0)).toDF("k", "t", "id", "v")
    // internal working-name collision → clear contract error, not a
    // downstream ambiguous-reference failure
    val badInternal = Seq((1L, 100L, 10L, 0.0)).toDF("k", "t", "id", "_side")
    val e1 = intercept[IllegalArgumentException] {
      TemporalJoins.asofJoin(badInternal, right, "k", "t", "id")
    }
    assert(e1.getMessage.contains("_side"))
    // left column shadowing an r_-prefixed output column
    val badOut = Seq((1L, 100L, 10L, 0.0)).toDF("k", "t", "id", "r_v")
    val e2 = intercept[IllegalArgumentException] {
      TemporalJoins.asofJoin(badOut, right, "k", "t", "id")
    }
    assert(e2.getMessage.contains("r_v"))
  }

  test("range/interval join reject inputs claiming the _bin working column") {
    val pts = Seq((1L, 100L, 5L)).toDF("k", "t", "_bin")
    val ivs = Seq((1L, 90L, 110L)).toDF("k", "s", "e")
    val e1 = intercept[IllegalArgumentException] {
      TemporalJoins.rangeJoin(pts, ivs, "k", "t", "s", "e", 100L)
    }
    assert(e1.getMessage.contains("_bin"))
    val badIv = Seq((1L, 90L, 110L, 0L)).toDF("k", "s", "e", "_bin")
    val e2 = intercept[IllegalArgumentException] {
      TemporalJoins.intervalJoin(ivs, badIv, "k", "s", "e", "s", "e", 100L)
    }
    assert(e2.getMessage.contains("_bin"))
  }

  test("asof join plan: one keyed shuffle, no join operator at all") {
    val plan = TemporalJoins.asofAttribution(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"))
    // the whole asof is union + window — no join node in the plan
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"))
  }

  test("range join matches the brute-force pair filter exactly") {
    // intervals spanning 1, 2 and many bins; touching endpoints; a
    // point exactly on a bin edge; same-key disjoint intervals
    val points = Seq((1L, 0L, 100L), (1L, 999L, 101L), (1L, 1000L, 102L),
        (1L, 2500L, 103L), (2L, 500L, 104L), (3L, 777L, 105L))
      .toDF("k", "t", "pid")
    val ivals = Seq((1L, 0L, 999L, 200L), (1L, 1000L, 3999L, 201L),
        (1L, 2400L, 2600L, 202L), (2L, 600L, 700L, 203L))
      .toDF("k", "s", "e", "iid")
    val got = TemporalJoins.rangeJoin(points, ivals, "k", "t", "s", "e", binMs = 1000L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val want = points.as("p").crossJoin(ivals.as("i"))
      .filter($"p.k" === $"i.k" && $"t" >= $"s" && $"t" <= $"e")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == want && want.size == 5)
  }

  test("interval join matches brute force, duplicate-free across shared bins") {
    // intervals deliberately spanning many shared bins (the case where
    // a naive bin join duplicates pairs), plus touching endpoints
    val l = Seq((1L, 0L, 5000L, 10L), (1L, 6000L, 6500L, 11L), (2L, 0L, 999L, 12L))
      .toDF("k", "s1", "e1", "lid")
    val r = Seq((1L, 4000L, 9000L, 20L), (1L, 5000L, 5999L, 21L), (2L, 999L, 2000L, 22L),
        (2L, 1000L, 1500L, 23L))
      .toDF("k", "s2", "e2", "rid")
    val got = TemporalJoins.intervalJoin(l, r, "k", "s1", "e1", "s2", "e2", binMs = 1000L)
      .select("lid", "rid").as[(Long, Long)].collect().toList
    val want = l.crossJoin(r.withColumnRenamed("k", "k2"))
      .filter($"k" === $"k2" && $"s1" <= $"e2" && $"s2" <= $"e1")
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got.toSet == want && got.size == want.size, s"got $got want $want")
    assert(want == Set((10L, 20L), (10L, 21L), (11L, 20L), (12L, 22L)))
  }

  test("range join plan: equi-join on (key, bin), never a nested loop") {
    val plan = TemporalJoins.rangeAttribution(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"))
  }
}
