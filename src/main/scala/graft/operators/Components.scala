package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Duplicate-cluster resolution: near-dup *pairs* → connected
  * *components* → one keeper per cluster.  The last stage of a real
  * dedup pipeline — pairwise output (q_jaccard / q_minhash_lsh /
  * q_simhash_pairs) can't be applied to a corpus until transitive
  * chains (A~B, B~C ⇒ {A,B,C}) are resolved to a single canonical
  * document per group.
  *
  * The component algorithm is the alternating large-star / small-star
  * formulation (Kiveris et al., "Connected Components in MapReduce and
  * Beyond", SoCC 2014): each round is a pair of groupBy+join passes
  * over the edge set keyed on node id, and the edge set contracts
  * toward a star forest in O(log n) rounds — the published scale path
  * for trillion-edge graphs, vs. O(diameter) rounds for naive
  * min-label propagation (a 100 TB corpus adversarially chains
  * near-dup docs into long paths).  No driver-side data: the loop on
  * the driver only compares per-round convergence aggregates.
  */
object Components {

  /** Connected components over an undirected edge list.
    *
    * @param edges0 DataFrame with two long-typed columns `src`, `dst`.
    * @return (node, component) where component = min node id of the
    *         node's component.  Nodes with no edges don't appear (the
    *         caller unions isolated vertices if it needs them).
    *
    * Each round localCheckpoints the contracted edge set: iterative
    * self-joins otherwise stack an exponentially growing lineage that
    * re-executes from the scan each round (on a cluster a reliable
    * `checkpoint()` to the shuffle-tracking store does the same job).
    */
  def connectedComponents(edges0: DataFrame, maxIter: Int = 25): DataFrame = {
    // canonical orientation big→small; self-loops dropped
    var edges = edges0
      .select(col("src").cast("long").as("a"), col("dst").cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
      .distinct()
      .localCheckpoint()

    var converged = false
    var iter = 0
    var edgeCount = edges.count()
    while (!converged && iter < maxIter) {
      // large-star: every node u connects its *larger* neighbors to
      // its minimum neighborhood member m(u) = min(N(u) ∪ {u})
      val sym = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      val mLarge = sym.groupBy("u").agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      val large = sym.join(mLarge, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
      // small-star: every node u re-points itself and its (smaller)
      // neighbors at m(u) = min(N(u)); edges stay big→small
      val mSmall = large.groupBy("u").agg(min(col("v")).as("m"))
      val next = large.join(mSmall, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .union(mSmall.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()
        .localCheckpoint()
      // exact fixpoint test: both are distinct sets, so equal counts +
      // empty one-way difference ⇔ equality (a hash-sum comparison
      // would risk a silently wrong merge on collision); the cheap
      // count gate skips the except entirely on still-shrinking
      // rounds, and the previous round's count is carried instead of
      // re-counted (one job per round saved — iterative-loop hygiene)
      val nextCount = next.count()
      converged = nextCount == edgeCount && next.except(edges).head(1).isEmpty
      edgeCount = nextCount
      edges = next
      iter += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds")
    // at the fixpoint the edge set is a star forest: u → its root
    edges.select(col("u").as("node"), col("v").as("component"))
      .union(edges.select(col("v").as("node"), col("v").as("component")))
      .groupBy("node").agg(min("component").as("component"))
  }

  // --- 26d. dup-cluster resolution over jaccard near-dup pairs ---
  /** Near-dup pairs at jaccard ≥ 0.5 (the corpus is cleanly bimodal:
    * true near-dups sit ≥ 0.96, shared-shingle noise ≤ 0.02; the
    * threshold compares a single IEEE division of integer counts, so
    * it is bit-identical cross-engine) → components → per-doc cluster
    * assignment with size and keeper flag (keeper = min doc_id).
    */
  /** pairs → components → per-doc (cluster id, size, keeper flag) —
    * the shared resolution tail of every pair generator.
    */
  private def clustersOf(pairs: DataFrame): DataFrame = {
    val labels = connectedComponents(pairs)
    val sizes = labels.groupBy("component").agg(count("*").as("cluster_sz"))
    labels.join(sizes, "component")
      .select(col("node").as("doc_id"), col("component"), col("cluster_sz"),
        when(col("node") === col("component"), 1L).otherwise(0L).as("is_keeper"))
      .orderBy("doc_id")
  }

  /** Recursive-CTE transitive-closure oracle over a pair CTE body
    * producing (u, v) edges via `edgeSelect` — the SQL twin of
    * [[clustersOf]] (the oracle may be O(n·m); the Spark side must
    * not be).
    */
  private def clustersSqlOf(pairsBody: String, edgeSelect: String): String =
    s"""WITH RECURSIVE pairs AS MATERIALIZED ($pairsBody),
       |e0 AS MATERIALIZED ($edgeSelect),
       |e AS MATERIALIZED (SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
       |reach(node, r) AS (
       |  SELECT u, v FROM e
       |  UNION
       |  SELECT reach.node, e.v FROM reach JOIN e ON e.u = reach.r),
       |lab AS (SELECT node AS doc_id, least(node, min(r)) AS component
       |        FROM reach GROUP BY node),
       |szs AS (SELECT component, count(*) AS cluster_sz FROM lab GROUP BY 1)
       |SELECT doc_id, component, cluster_sz,
       |  CAST(CASE WHEN doc_id = component THEN 1 ELSE 0 END AS BIGINT) AS is_keeper
       |FROM lab JOIN szs USING (component) ORDER BY doc_id""".stripMargin

  def dupClusters(s: SparkSession, dir: String): DataFrame =
    clustersOf(
      Dedup.jaccardOf(Dedup.shinglesOf(Tables.t(s, dir, "documents")))
        .filter(col("jaccard") >= 0.5)
        .select(col("d1").as("src"), col("d2").as("dst")))

  val dupClustersSql: String = clustersSqlOf(
    Dedup.jaccardSql.replace("ORDER BY d1, d2", ""),
    "SELECT d1 AS u, d2 AS v FROM pairs WHERE jaccard >= 0.5")

  /** Deterministic PageRank over a directed edge list — the domain/
    * document authority signal crawl-curation pipelines rank sources
    * by.  Each iteration is one groupBy on dst of out-degree-
    * normalized contributions (the classic shuffle shape; dangling
    * mass redistributed uniformly).  Contributions are quantized to
    * integer nano-units before summation, so ranks are bit-identical
    * regardless of partition order or cluster size — the float-
    * hygiene doctrine (SURVEY §4) applied to iterative numerics: an
    * unquantized sum of doubles is nondeterministic across runs on
    * the same data.
    *
    * @return (node, rank); dangling-node mass evaporates (simplified
    *         variant), so ranks sum to ≤ 1.
    */
  def pageRank(edges0: DataFrame, iters: Int = 10, damping: Double = 0.85): DataFrame = {
    val E9 = 1000000000L
    // edges and outDeg are re-read every iteration — checkpoint once
    // so the loop doesn't re-plan the distinct/degree shuffles ×iters
    val edges = edges0
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .localCheckpoint()
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
      .localCheckpoint()
    val n = nodes.count()
    require(n > 0, "pageRank needs a non-empty edge list")
    val outDeg = edges.groupBy("src").agg(count("*").as("deg")).localCheckpoint()
    // ranks held as integer nano-units end to end
    var ranks = nodes.withColumn("r", lit(E9 / n)).localCheckpoint()
    var i = 0
    while (i < iters) {
      val contrib = edges
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .join(outDeg, "src")
        .select(col("dst").as("node"), floor(col("r") / col("deg")).cast("long").as("c"))
        .groupBy("node").agg(sum("c").as("in_mass"))
      // simplified-dangling variant: sink mass evaporates (ranks then
      // sum to < 1; relative ordering — the signal — is unaffected)
      ranks = nodes
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(math.floor((1 - damping) * E9 / n).toLong) +
            floor(lit(damping) * coalesce(col("in_mass"), lit(0L))).cast("long"))
            .as("r"))
        .localCheckpoint()
      i += 1
    }
    ranks.select(col("node"), (col("r").cast("double") / E9).as("rank"))
  }

  // --- 26e. cluster-based dedup apply ---
  /** Materialize the near-dup-deduplicated corpus: every document
    * except non-keeper cluster members survives — the transitive
    * completion of exact dedup's keep-first rule (A~B, B~C drops both
    * B and C even when A and C share nothing directly).  One leftanti
    * join of the corpus against the (tiny) drop list.
    */
  def dedupApplyNeardup(s: SparkSession, dir: String): DataFrame = {
    val drops = dupClusters(s, dir)
      .filter(col("is_keeper") === 0L)
      .select("doc_id")
    Tables.t(s, dir, "documents")
      .join(drops, Seq("doc_id"), "leftanti")
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy("doc_id")
  }

  val dedupApplyNeardupSql: String = {
    val clusters = dupClustersSql.replace("ORDER BY doc_id", "")
    s"""SELECT doc_id, lang, n_chars FROM documents
       |WHERE doc_id NOT IN (
       |  SELECT doc_id FROM ($clusters) WHERE is_keeper = 0)
       |ORDER BY doc_id""".stripMargin
  }

  // --- 33c. dup-cluster resolution over the SIMHASH pair graph ---
  /** [[dupClusters]] with the banded-simhash candidate generator as
    * the edge source instead of shingle-jaccard: hamming ≤ 8 pairs →
    * connected components → per-doc cluster id, size, keeper flag.
    * The two pair generators find overlapping-but-different duplicate
    * graphs; running CC over each is how a curation pipeline compares
    * them at corpus scale.
    */
  def simhashClusters(s: SparkSession, dir: String): DataFrame =
    clustersOf(Dedup.simhashPairs(s, dir)
      .select(col("d1").as("src"), col("d2").as("dst")))

  val simhashClustersSql: String = clustersSqlOf(
    Dedup.simhashPairsSql.replace("ORDER BY d1, d2", ""),
    "SELECT d1 AS u, d2 AS v FROM pairs")

  // --- 26f (oracle face). deterministic PageRank over an events graph ---
  /** [[pageRank]] as an oracle query: a 40-node deterministic graph
    * from events (src = user_id mod 40, dst = 31·event_id mod 40),
    * 10 power iterations.  Every arithmetic step is either exact
    * integer (nano-unit ranks, `//` init) or the identical IEEE
    * double op in both engines (deg division, 0.85 damping multiply,
    * the closing /1e9) — so the ranks hash-match bit-for-bit.  The
    * DuckDB mirror UNROLLS the 10 iterations as chained CTE pairs
    * (standard SQL's recursive CTEs cannot aggregate over the
    * recursive reference).
    */
  def pagerankQ(s: SparkSession, dir: String): DataFrame = {
    val e = graft.core.Tables.t(s, dir, "events").select(
      (col("user_id") % 40).cast("long").as("src"),
      (col("event_id") * 31 % 40).cast("long").as("dst"))
    pageRank(e, iters = 10)
      .select(col("node"), col("rank"))
      .orderBy("node")
  }

  val pagerankSql: String = {
    val iters = (1 to 10).map { i =>
      s"""c$i AS (
         |  SELECT e.dst AS node,
         |    CAST(sum(CAST(floor(p${i - 1}.r / od.deg) AS BIGINT)) AS BIGINT) AS in_mass
         |  FROM edges e
         |  JOIN p${i - 1} ON p${i - 1}.node = e.src
         |  JOIN outdeg od ON od.src = e.src
         |  GROUP BY e.dst),
         |p$i AS (
         |  SELECT n.node,
         |    CAST(FLOOR((1.0::DOUBLE - 0.85::DOUBLE) * 1000000000.0 / nn.n) AS BIGINT)
         |      + CAST(FLOOR(0.85::DOUBLE * COALESCE(c$i.in_mass, 0)) AS BIGINT) AS r
         |  FROM nodes n CROSS JOIN nn LEFT JOIN c$i ON c$i.node = n.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS (SELECT user_id % 40 AS src, (event_id*31) % 40 AS dst FROM events),
       |edges AS (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
       |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
       |nn AS (SELECT count(*) AS n FROM nodes),
       |outdeg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
       |p0 AS (SELECT node, 1000000000 // nn.n AS r FROM nodes CROSS JOIN nn),
       |$iters
       |SELECT node, CAST(r AS DOUBLE) / 1000000000 AS rank
       |FROM p10 ORDER BY node""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dup_clusters" -> (dupClusters _),
    "q_simhash_cc" -> (simhashClusters _),
    "q_pagerank" -> (pagerankQ _),
    "q_dedup_apply_neardup" -> (dedupApplyNeardup _))

  val oracles: Map[String, String] = Map(
    "q_dup_clusters" -> dupClustersSql,
    "q_simhash_cc" -> simhashClustersSql,
    "q_pagerank" -> pagerankSql,
    "q_dedup_apply_neardup" -> dedupApplyNeardupSql)
}
