package graft

import org.apache.spark.sql.functions._
import graft.operators.Components

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap

  test("chain, clique, and isolated pair resolve to min-id components") {
    // chain 1-2-3-4-5 (worst case for label propagation), clique
    // {10,11,12}, pair {20,21}; edges in adversarial orientation/order
    val edges = Seq[(Long, Long)](
      (5L, 4L), (2L, 1L), (3L, 4L), (2L, 3L),
      (12L, 10L), (11L, 12L), (10L, 11L),
      (21L, 20L))
    val got = cc(edges)
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("long path converges (log-round contraction, not diameter-round)") {
    // a 64-node path: min-label propagation needs 63 rounds; the
    // alternating-star contraction must land well inside maxIter=25
    val edges = (0L until 63L).map(i => (i + 1, i))
    val got = cc(edges)
    assert(got.size == 64 && got.values.forall(_ == 0L))
  }

  test("duplicate and reversed edges, self-loops, and star shapes are harmless") {
    val edges = Seq[(Long, Long)](
      (7L, 7L),                               // self-loop: dropped
      (30L, 31L), (31L, 30L), (30L, 31L),     // dup + reversed
      (40L, 41L), (40L, 42L), (40L, 43L))     // star centered high
    val got = cc(edges)
    assert(got.get(7L).isEmpty)               // self-loop-only node has no edges
    assert(got(31L) == 30L && got(30L) == 30L)
    assert(Seq(40L, 41L, 42L, 43L).map(got).forall(_ == 40L))
  }

  test("CC converges on the dense simhash pair graph and labels every edge consistently") {
    // the realistic-density stress: tens of thousands of near-dup
    // edges (vs jaccard's dozens) — convergence must stay in the
    // round budget and both endpoints of every edge must land in the
    // same component
    val pairs = graft.operators.Dedup.simhashPairs(spark, sf)
      .select($"d1".as("src"), $"d2".as("dst")).cache()
    val nEdges = pairs.count()
    assert(nEdges > 1000L, s"expected a dense graph, got $nEdges edges")
    val labels = Components.connectedComponents(pairs)
    val lab1 = labels.select($"node".as("src"), $"component".as("c1"))
    val lab2 = labels.select($"node".as("dst"), $"component".as("c2"))
    val inconsistent = pairs.join(lab1, "src").join(lab2, "dst")
      .filter($"c1" =!= $"c2").count()
    assert(inconsistent == 0L)
    pairs.unpersist()
  }

  test("pageRank matches the integer-quantized reference power iteration exactly") {
    // a graph with a hub, a chain, a cycle, and a dangling sink
    val edges = Seq[(Long, Long)](
      (1L, 2L), (3L, 2L), (4L, 2L),           // 2 is a hub
      (2L, 5L), (5L, 6L),                     // chain into 6 (dangling)
      (7L, 8L), (8L, 9L), (9L, 7L),           // 3-cycle
      (2L, 1L))
    val got = Components.pageRank(edges.toDF("src", "dst"), iters = 10)
      .as[(Long, Double)].collect().toMap
    // reference: the same quantized arithmetic, driver-side
    val E9 = 1000000000L
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var r = nodes.map(_ -> E9 / nodes.size).toMap
    for (_ <- 1 to 10) {
      val in = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      for ((s, d) <- edges) in(d) += r(s) / deg(s)
      // NB (1 - 0.85), not the literal 0.15: they are different
      // doubles, and the floor must see the operator's exact value
      r = nodes.map(v => v ->
        (math.floor((1 - 0.85) * E9 / nodes.size).toLong +
          math.floor(0.85 * in(v)).toLong)).toMap
    }
    val want = r.map { case (k, v) => k -> v.toDouble / E9 }
    assert(got == want, s"got $got\nwant $want")
    // the hub outranks every spoke
    assert(got(2L) > got(1L) && got(2L) > got(3L) && got(2L) > got(4L))
    // determinism across reruns
    val again = Components.pageRank(edges.toDF("src", "dst"), iters = 10)
      .as[(Long, Double)].collect().toMap
    assert(again == got)
  }

  test("dup clusters: sizes consistent, exactly one keeper per cluster") {
    val d = Components.dupClusters(spark, sf).cache()
    // every cluster has exactly one keeper, and it is the component min
    val perCluster = d.groupBy("component")
      .agg(sum("is_keeper").as("nk"), count("*").as("n"),
        min("doc_id").as("mn"), max("cluster_sz").as("sz"))
    assert(perCluster.filter($"nk" =!= 1L || $"n" =!= $"sz" || $"mn" =!= $"component")
      .count() == 0)
    // transitivity did its job: at least one cluster is larger than a pair
    assert(d.filter($"cluster_sz" > 2).count() > 0)
    d.unpersist()
  }
}
