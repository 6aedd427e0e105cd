package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables.t

/** Core relational substrate: the groupBy/join/window/sort machinery
  * every reference operation compiles down to, exercised TPC-H-style
  * on the test corpus.  Money aggregates go through exact integer
  * cents (`round(price*100)::long`) so Spark and the DuckDB oracle
  * hash-match bit-for-bit regardless of float summation order.
  */
object Relational {

  private def cents(c: org.apache.spark.sql.Column) = round(c * 100).cast("long")

  // --- 37. pricing summary (Q1 shape) ---
  def q1Agg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(cents(col("l_extendedprice"))).as("sum_base_cents"),
        sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("sum_disc_cents"),
        sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")))).as("sum_charge_cents"),
        count("*").as("count_order"))
      .withColumn("avg_qty", col("sum_qty") / col("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  sum(l_quantity) AS sum_qty,
      |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
      |  CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
      |  CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*(1.0+l_tax)*100) AS BIGINT)) AS BIGINT) AS sum_charge_cents,
      |  count(*) AS count_order,
      |  sum(l_quantity)/count(*) AS avg_qty
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // --- 38. shipping-priority join (Q3 shape) ---
  def q3Join(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val ord  = t(s, dir, "orders").filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val li   = t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy("l_orderkey")
      .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue_cents"))
      .orderBy(col("revenue_cents").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3JoinSql: String =
    """SELECT l_orderkey,
      |  CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |  AND l_shipdate > TIMESTAMP '1998-01-01'
      |GROUP BY l_orderkey
      |ORDER BY revenue_cents DESC, l_orderkey
      |LIMIT 10""".stripMargin

  // --- 39. local-supplier volume (Q5 shape, broadcast dims) ---
  def q5Join(s: SparkSession, dir: String): DataFrame = {
    val nat = t(s, dir, "nation"); val reg = t(s, dir, "region")
    li5(s, dir)
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue_cents"))
      .orderBy(col("revenue_cents").desc, col("n_name"))
  }

  private def li5(s: SparkSession, dir: String): DataFrame = {
    val sup = t(s, dir, "supplier")
    val ord = t(s, dir, "orders").filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                                         col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    t(s, dir, "lineitem")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
  }

  val q5JoinSql: String =
    """SELECT n_name,
      |  CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY n_name
      |ORDER BY revenue_cents DESC, n_name""".stripMargin

  // --- 39b. pure filter-aggregate (Q6 shape) — the pushdown showcase:
  //     every predicate reaches the parquet scan as PushedFilters ---
  def q6Filter(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
              col("l_discount").between(0.05, 0.07) &&
              col("l_quantity") < 24)
      .agg(sum(cents(col("l_extendedprice") * col("l_discount"))).as("revenue_cents"),
           count("*").as("n"))

  val q6FilterSql: String =
    """SELECT
      |  CAST(sum(CAST(round(l_extendedprice*l_discount*100) AS BIGINT)) AS BIGINT) AS revenue_cents,
      |  count(*) AS n
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  // --- 39c. large-volume customers (Q18 shape: having + join-back) ---
  def q18Having(s: SparkSession, dir: String): DataFrame = {
    val big = t(s, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(sum("l_quantity").as("sum_qty"))
      .filter(col("sum_qty") > 150.0)
    t(s, dir, "orders")
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
              col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
  }

  val q18HavingSql: String =
    """SELECT c_custkey, c_name, o_orderkey, o_totalprice, sum_qty
      |FROM orders
      |JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty
      |      FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 150.0) big
      |  ON o_orderkey = big.l_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 20""".stripMargin

  // --- 39d. anti join: orders with no shipped lineitem in a window ---
  def antiJoin(s: SparkSession, dir: String): DataFrame = {
    val shipped = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
      .select(col("l_orderkey"))
    t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))
      .join(shipped, col("o_orderkey") === col("l_orderkey"), "leftanti")
      .select("o_orderkey", "o_custkey", "o_orderstatus")
      .orderBy("o_orderkey")
  }

  val antiJoinSql: String =
    """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      |  AND NOT EXISTS (SELECT 1 FROM lineitem
      |                  WHERE l_orderkey = o_orderkey
      |                    AND l_shipdate >= TIMESTAMP '1997-01-01')
      |ORDER BY o_orderkey""".stripMargin

  // --- 40. window top-k per group ---
  def windowTopk(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey") % 10)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("bucket", (col("o_custkey") % 10).cast("long"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select("bucket", "rnk", "o_orderkey", "o_totalprice")
      .orderBy("bucket", "rnk")
  }

  val windowTopkSql: String =
    """SELECT * FROM (
      |  SELECT CAST(o_custkey % 10 AS BIGINT) AS bucket,
      |    row_number() OVER (PARTITION BY o_custkey % 10
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rnk,
      |    o_orderkey, o_totalprice
      |  FROM orders)
      |WHERE rnk <= 3 ORDER BY bucket, rnk""".stripMargin

  // --- 41. gap-based sessionization over the events stream table ---
  // --- 41c. ordered path aggregation (session-path signatures) ---
  /** Per user, the full time-ordered event-type path as one string
    * plus its md5 signature — the clickstream "path analysis"
    * primitive (and the LISTAGG/string_agg surface).  collect_list is
    * order-nondeterministic under parallelism, so the order is forced
    * structurally: collect (t, id, type) STRUCTS and sort_array them
    * — struct ordering is lexicographic and (t, id) is a unique key,
    * making the aggregation deterministic on any cluster.  One
    * shuffle on user_id; path state is bounded per user.
    */
  def userPaths(s: SparkSession, dir: String): DataFrame =
    graft.core.Tables.eventsPoints(s, dir)
      .select(col("user_id"),
        struct(col("t"), col("id"), col("event_type")).as("e"))
      .groupBy("user_id")
      .agg(sort_array(collect_list(col("e"))).as("es"))
      .select(col("user_id"),
        size(col("es")).cast("long").as("n_events"),
        array_join(expr("transform(es, x -> x.event_type)"), ">").as("path"))
      .withColumn("path_sig", md5(col("path")))
      .orderBy("user_id")

  val userPathsSql: String =
    s"""WITH pts AS (${graft.core.Tables.eventsPointsSql})
       |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       |       string_agg(event_type, '>' ORDER BY t, id) AS path,
       |       md5(string_agg(event_type, '>' ORDER BY t, id)) AS path_sig
       |FROM pts GROUP BY user_id ORDER BY user_id""".stripMargin

  def sessionize(s: SparkSession, dir: String): DataFrame = {
    val e  = graft.core.Tables.eventsPoints(s, dir) // has exact t (ms) + user_id
    val w  = Window.partitionBy("user_id").orderBy("t", "id")
    val gap = (col("t") - lag("t", 1).over(w) > 1800000L) // 30 min
    e.withColumn("new_sess", when(lag("t", 1).over(w).isNull || gap, 1L).otherwise(0L))
      .withColumn("session_id", sum("new_sess").over(
        Window.partitionBy("user_id").orderBy("t", "id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(count("*").as("n_events"), min("t").as("t_start"), max("t").as("t_end"))
      .orderBy("user_id", "session_id")
  }

  val sessionizeSql: String =
    s"""WITH pts AS (${graft.core.Tables.eventsPointsSql}),
       |m AS (SELECT user_id, id, t,
       |  CASE WHEN lag(t,1) OVER w IS NULL OR t - lag(t,1) OVER w > 1800000
       |       THEN 1 ELSE 0 END AS new_sess
       |  FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY t, id)),
       |s AS (SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY t, id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
       |      FROM m)
       |SELECT user_id, session_id, count(*) AS n_events,
       |       min(t) AS t_start, max(t) AS t_end
       |FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin

  // --- 39e. Q13 shape: outer-join count distribution ---
  /** Orders-per-customer histogram INCLUDING zero-order customers —
    * the left-outer-join + two-level aggregation shape (TPC-H Q13).
    * The outer join is what forces the engine to keep unmatched
    * build-side rows; counting `o_orderkey` (not `*`) makes the
    * zero bucket fall out of null semantics.
    */
  def q13Histogram(s: SparkSession, dir: String): DataFrame = {
    val perCust = t(s, dir, "customer")
      .join(t(s, dir, "orders")
          .filter(col("o_orderpriority") =!= "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count("o_orderkey").as("c_count"))
    perCust.groupBy("c_count")
      .agg(count("*").as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val q13HistogramSql: String =
    """WITH pc AS (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders
      |    ON o_custkey = c_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey)
      |SELECT c_count, count(*) AS custdist
      |FROM pc GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  // --- 39f. Q21 shape: correlated EXISTS + NOT EXISTS ---
  /** Suppliers whose line items are the ONLY late ones in a
    * multi-supplier order (TPC-H Q21's semi + anti double
    * correlation): exists(other supplier in order) AND NOT
    * exists(other supplier late in order).  Planned as one leftsemi
    * and one leftanti join against the same fact table — the shape
    * that separates engines that decorrelate from engines that
    * re-scan per row.
    */
  def q21Waiting(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    // "late" analog: shipped in H2-1997 (no receipt/commit dates in
    // this corpus; the join algebra is the point)
    val late = li.filter(col("l_shipdate") >= lit("1997-07-01").cast("timestamp"))
    val l1 = late.select(col("l_orderkey").as("k"), col("l_suppkey").as("sk"))
    val others = li.select(col("l_orderkey").as("k"), col("l_suppkey").as("osk"))
    val lateOthers = late.select(col("l_orderkey").as("k"), col("l_suppkey").as("osk"))
    l1.distinct()
      .join(others.filter(col("osk").isNotNull), Seq("k"), "inner")
      .filter(col("osk") =!= col("sk")).select("k", "sk").distinct().as("c")
      .join(lateOthers.as("lo"),
        col("c.k") === col("lo.k") && col("lo.osk") =!= col("c.sk"), "leftanti")
      .groupBy("sk").agg(count("*").as("numwait"))
      .orderBy(col("numwait").desc, col("sk"))
  }

  val q21WaitingSql: String =
    """WITH late AS (
      |  SELECT DISTINCT l_orderkey AS k, l_suppkey AS sk
      |  FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-07-01'),
      |cand AS (
      |  SELECT DISTINCT late.k, late.sk
      |  FROM late JOIN lineitem o ON o.l_orderkey = late.k
      |  WHERE o.l_suppkey <> late.sk),
      |waiting AS (
      |  SELECT k, sk FROM cand c
      |  WHERE NOT EXISTS (
      |    SELECT 1 FROM lineitem o
      |    WHERE o.l_orderkey = c.k AND o.l_suppkey <> c.sk
      |      AND o.l_shipdate >= TIMESTAMP '1997-07-01'))
      |SELECT sk, count(*) AS numwait
      |FROM waiting GROUP BY sk
      |ORDER BY numwait DESC, sk""".stripMargin

  // --- 39g. Q7 volume-shipping shape: the two-aliased-dimension join ---
  /** Revenue between a nation PAIR by ship year (TPC-H Q7): the same
    * dimension table joined twice under different roles (supplier's
    * nation, customer's nation), with a symmetric pair predicate that
    * can only apply above both joins.  Both nation joins broadcast;
    * the orders/customer joins shuffle on their keys.
    */
  def q7Nations(s: SparkSession, dir: String): DataFrame = {
    val n1 = t(s, dir, "nation")
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = t(s, dir, "nation")
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
              (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .as("revenue_cents"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  val q7NationsSql: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  year(l_shipdate) AS l_year,
      |  CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
      |GROUP BY 1, 2, 3
      |ORDER BY 1, 2, 3""".stripMargin

  // --- 39h'. Q14 promo-revenue shape: conditional-aggregate ratio ---
  /** Share of revenue from PROMO parts in a ship-date window (TPC-H
    * Q14): one broadcast join, two conditional sums, a ratio.  The
    * cents quantization keeps both sums exact BIGINTs, so the single
    * closing division is the only float op — bit-identical
    * cross-engine.
    */
  def q14Promo(s: SparkSession, dir: String): DataFrame = {
    val rev = cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1997-07-01").cast("timestamp"))
      .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0L))).as("promo_cents"),
        sum(rev).as("total_cents"))
      .select(col("promo_cents"), col("total_cents"),
        (col("promo_cents") * lit(100L) / col("total_cents")).as("promo_pct"))
  }

  val q14PromoSql: String =
    """WITH w AS (
      |  SELECT p_type,
      |    CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT) AS rev
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |    AND l_shipdate < TIMESTAMP '1997-07-01')
      |SELECT
      |  CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END) AS BIGINT) AS promo_cents,
      |  CAST(sum(rev) AS BIGINT) AS total_cents,
      |  (sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END) * 100) / sum(rev) AS promo_pct
      |FROM w""".stripMargin

  // --- 39i. semi-structured JSON column extraction ---
  /** Typed extraction from the events.props JSON column with
    * from_json (schema-on-read; codegen'd Jackson parse, no UDF) and
    * aggregation over the extracted field.  At 100 TB the point is
    * the EXTRACTION stays inside whole-stage codegen and the
    * aggregate is a plain map-side-combined groupBy — semi-structured
    * never forces a slow path.
    */
  def jsonProps(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_type"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
          .getField("k").as("k"))
      .groupBy("event_type")
      .agg(count("*").as("n"), sum("k").as("sum_k"),
        min("k").as("min_k"), max("k").as("max_k"))
      .orderBy("event_type")

  val jsonPropsSql: String =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
      |  min(CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)) AS min_k,
      |  max(CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // --- 39l. nested semi-structured extraction (VARIANT-style surface) ---
  /** Multi-level schema-on-read: a JSON document with a nested object
    * AND an array-of-structs — `{"u":{"id":…,"seg":…},"items":[{…},{…}]}`
    * — parsed by ONE codegen'd `from_json` into a typed nested struct,
    * the array lateral-exploded, and the leaves aggregated.  This is
    * the event-payload shape real pipelines carry (user envelope +
    * item list); the flat `q_json_props` covers scalar extraction,
    * this covers the nested/array path.  The document is constructed
    * deterministically from events columns in BOTH engines, and the
    * DuckDB oracle re-parses it with genuine JSON operators
    * (json_extract + from_json + unnest), so the hash-match pins the
    * full build → parse → explode → aggregate round trip.
    *
    * Scale shape: parse and explode are map-side (inside the scan
    * stage, whole-stage codegen — no UDF, no shuffle until the final
    * small groupBy on (seg, t)); map-side combine applies.
    */
  def jsonNested(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val doc = concat(
      lit("{\"u\":{\"id\":"), col("user_id").cast("string"),
      lit(",\"seg\":"), (col("user_id") % 7).cast("string"),
      lit("},\"items\":[{\"t\":\"a\",\"n\":"), (col("event_id") % 5).cast("string"),
      lit("},{\"t\":\"b\",\"n\":"), (col("event_id") % 3).cast("string"),
      lit("}]}"))
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "u STRUCT<id: BIGINT, seg: BIGINT>, items ARRAY<STRUCT<t: STRING, n: BIGINT>>")
    e.select(from_json(doc, schema).as("d"))
      .select(col("d.u.seg").as("seg"), explode(col("d.items")).as("it"))
      .groupBy(col("seg"), col("it.t").as("t"))
      .agg(count("*").as("n_events"),
        sum(col("it.n")).cast("long").as("sum_n"),
        max(col("it.n")).as("max_n"))
      .orderBy("seg", "t")
  }

  val jsonNestedSql: String =
    """WITH j AS (
      |  SELECT '{"u":{"id":' || CAST(user_id AS VARCHAR)
      |      || ',"seg":' || CAST(user_id % 7 AS VARCHAR)
      |      || '},"items":[{"t":"a","n":' || CAST(event_id % 5 AS VARCHAR)
      |      || '},{"t":"b","n":' || CAST(event_id % 3 AS VARCHAR)
      |      || '}]}' AS doc FROM events),
      |p AS (SELECT CAST(json_extract(doc, '$.u.seg') AS BIGINT) AS seg,
      |             unnest(from_json(json_extract(doc, '$.items'),
      |                              '[{"t":"VARCHAR","n":"BIGINT"}]')) AS it
      |      FROM j)
      |SELECT seg, it.t AS t, count(*) AS n_events,
      |       CAST(sum(it.n) AS BIGINT) AS sum_n, max(it.n) AS max_n
      |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // --- 41b. funnel analysis (staged event attrition) ---
  /** Per user: earliest view, earliest click strictly after it,
    * earliest purchase strictly after that — the classic conversion
    * funnel, as three cascaded conditional aggregations (each stage's
    * threshold is the previous stage's min, broadcast back on the
    * user key; null propagates "never reached").  All shuffles key
    * on user_id.
    */
  def funnel(s: SparkSession, dir: String): DataFrame = {
    val pts = graft.core.Tables.eventsPoints(s, dir)
      .select(col("user_id"), col("event_type"), col("t"))
    val v = pts.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("t").as("t_view"))
    val c = pts.filter(col("event_type") === "click").join(v, "user_id")
      .filter(col("t") > col("t_view"))
      .groupBy("user_id").agg(min("t").as("t_click"))
    val p = pts.filter(col("event_type") === "purchase").join(c, "user_id")
      .filter(col("t") > col("t_click"))
      .groupBy("user_id").agg(min("t").as("t_purchase"))
    v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
      .withColumn("stage",
        when(col("t_purchase").isNotNull, 3L)
          .when(col("t_click").isNotNull, 2L).otherwise(1L))
      .orderBy("user_id")
  }

  val funnelSql: String =
    s"""WITH pts AS (${graft.core.Tables.eventsPointsSql}),
       |v AS (SELECT user_id, min(t) AS t_view FROM pts
       |      WHERE event_type = 'view' GROUP BY 1),
       |c AS (SELECT p.user_id, min(t) AS t_click
       |      FROM pts p JOIN v ON v.user_id = p.user_id
       |      WHERE p.event_type = 'click' AND p.t > v.t_view GROUP BY 1),
       |pu AS (SELECT p.user_id, min(t) AS t_purchase
       |       FROM pts p JOIN c ON c.user_id = p.user_id
       |       WHERE p.event_type = 'purchase' AND p.t > c.t_click GROUP BY 1)
       |SELECT v.user_id, v.t_view, c.t_click, pu.t_purchase,
       |  CAST(CASE WHEN pu.t_purchase IS NOT NULL THEN 3
       |            WHEN c.t_click IS NOT NULL THEN 2 ELSE 1 END AS BIGINT) AS stage
       |FROM v LEFT JOIN c ON c.user_id = v.user_id
       |       LEFT JOIN pu ON pu.user_id = v.user_id
       |ORDER BY v.user_id""".stripMargin

  // --- 39g. ROLLUP: multi-level aggregation in one pass ---
  /** Subtotals at (flag, status), (flag), and grand-total levels from
    * ONE scan (Spark expands grouping sets map-side — no re-reads per
    * level).  Money stays in exact integer cents; grouping_id
    * disambiguates real NULL keys from subtotal markers.
    */
  def rollupAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(count("*").as("n"),
        sum(cents(col("l_extendedprice"))).as("sum_cents"),
        grouping_id().cast("long").as("gid"))
      .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))

  val rollupAggSql: String =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_cents,
      |  CAST(grouping(l_returnflag)*2 + grouping(l_linestatus) AS BIGINT) AS gid
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin

  // --- 39g2. CUBE: every grouping-set combination in one scan ---
  /** ROLLUP's sibling: CUBE(a, b) expands to all four grouping sets
    * — (a,b), (a), (b), () — still ONE scan + one Expand + one
    * shuffle; `gid` disambiguates which set a row belongs to (the
    * `(b)`-only set, which ROLLUP lacks, carries gid = 2).
    */
  def cubeAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .cube("l_returnflag", "l_linestatus")
      .agg(count("*").as("n"),
        sum(cents(col("l_extendedprice"))).as("sum_cents"),
        grouping_id().cast("long").as("gid"))
      .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))

  val cubeAggSql: String =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_cents,
      |  CAST(grouping(l_returnflag)*2 + grouping(l_linestatus) AS BIGINT) AS gid
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin

  // --- 39h. PIVOT: wide-format aggregation ---
  /** Order counts per priority pivoted by status — Spark's pivot()
    * with an explicit value list compiles to conditional aggregation
    * (one scan, one shuffle), which is also how the oracle states it.
    */
  def pivotAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .select(col("o_orderpriority"), col("F").cast("long").as("n_f"),
        col("O").cast("long").as("n_o"), col("P").cast("long").as("n_p"))
      .orderBy("o_orderpriority")

  val pivotAggSql: String =
    """SELECT o_orderpriority,
      |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
      |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
      |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // --- 40b. time-RANGE sliding aggregate ---
  /** Trailing 1-hour per-user average event value — a RANGE frame
    * (time-based, not row-count-based: all rows within the interval,
    * however many) over the millisecond axis.  Money quantized to
    * integer cents so the in-frame summation is order-free and
    * hash-matches cross-engine.
    */
  def movingAvg(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("t")
      .rangeBetween(-3600000L, 0L)
    graft.core.Tables.eventsPoints(s, dir)
      .select(col("id"), col("user_id"), col("t"),
        round(col("z") * 100).cast("long").as("cents"))
      .withColumn("win_n", count("*").over(w))
      .withColumn("win_cents", sum("cents").over(w))
      .withColumn("win_avg", col("win_cents").cast("double") / col("win_n"))
      .orderBy("id")
  }

  val movingAvgSql: String =
    s"""WITH pts AS (${graft.core.Tables.eventsPointsSql}),
       |c AS (SELECT id, user_id, t, CAST(round(z*100) AS BIGINT) AS cents FROM pts)
       |SELECT id, user_id, t, cents,
       |  CAST(count(*) OVER w AS BIGINT) AS win_n,
       |  CAST(sum(cents) OVER w AS BIGINT) AS win_cents,
       |  CAST(sum(cents) OVER w AS DOUBLE) / count(*) OVER w AS win_avg
       |FROM c
       |WINDOW w AS (PARTITION BY user_id ORDER BY t
       |             RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)
       |ORDER BY id""".stripMargin

  // --- 62. column profiling (the engine's ANALYZE surface) ---
  /** Null/distinct/min/max per numeric column, as ONE single-pass wide
    * aggregation melted afterwards — profiling at 100 TB must not melt
    * first (that multiplies the corpus by the column count before the
    * shuffle); here the stack() runs over the one aggregated row.
    */
  def profile(s: SparkSession, dir: String): DataFrame = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}_n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nnull"),
        countDistinct(col(c)).as(s"${c}_nd"),
        min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"))
    }
    val one = t(s, dir, "lineitem").agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map(c =>
      s"'$c', ${c}_n, ${c}_nnull, ${c}_nd, ${c}_min, ${c}_max").mkString(", ")
    one.selectExpr(
        s"stack(${cols.length}, $stacked) AS (col_name, n, n_null, n_distinct, vmin, vmax)")
      .orderBy("col_name")
  }

  val profileSql: String = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    val agg = cols.map(c =>
      s"""count($c) AS ${c}_n, CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS ${c}_nnull,
         |count(DISTINCT $c) AS ${c}_nd, min($c) AS ${c}_min, max($c) AS ${c}_max""".stripMargin).mkString(",\n")
    val rows = cols.map(c =>
      s"SELECT '$c' AS col_name, ${c}_n AS n, ${c}_nnull AS n_null, ${c}_nd AS n_distinct, ${c}_min AS vmin, ${c}_max AS vmax FROM a").mkString("\nUNION ALL\n")
    s"WITH a AS (SELECT $agg FROM lineitem)\n$rows\nORDER BY col_name"
  }

  // --- 63. group-wise exact quantiles (nearest-rank selection) ---
  /** p25/p50/p75/p95 of extended price per return flag, by the
    * nearest-rank definition (value at 1-based rank ⌈q·n⌉ of the
    * sorted group) — selection semantics like blockmedian, no
    * interpolation, so results hash-match raw doubles cross-engine.
    * One window sort per group + one aggregation; groups are the
    * shuffle keys.
    */
  def quantiles(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    val ranked = t(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count("*").over(Window.partitionBy("l_returnflag")))
    def at(q: Double, name: String) =
      min(when(col("rn") === ceil(lit(q) * col("n")), col("l_extendedprice"))).as(name)
    ranked.groupBy("l_returnflag")
      .agg(max("n").as("n"), at(0.25, "p25"), at(0.50, "p50"),
        at(0.75, "p75"), at(0.95, "p95"))
      .orderBy("l_returnflag")
  }

  val quantilesSql: String =
    """WITH r AS (
      |  SELECT l_returnflag, l_extendedprice,
      |    CAST(row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS BIGINT) AS rn,
      |    CAST(count(*) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
      |  FROM lineitem)
      |SELECT l_returnflag, max(n) AS n,
      |  min(CASE WHEN rn = ceil(0.25 * n) THEN l_extendedprice END) AS p25,
      |  min(CASE WHEN rn = ceil(0.5 * n) THEN l_extendedprice END) AS p50,
      |  min(CASE WHEN rn = ceil(0.75 * n) THEN l_extendedprice END) AS p75,
      |  min(CASE WHEN rn = ceil(0.95 * n) THEN l_extendedprice END) AS p95
      |FROM r GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_rollup"      -> (rollupAgg _),
    "q_cube"        -> (cubeAgg _),
    "q_pivot"       -> (pivotAgg _),
    "q_moving_avg"  -> (movingAvg _),
    "q_funnel"      -> (funnel _),
    "q13_histogram" -> (q13Histogram _),
    "q21_waiting"   -> (q21Waiting _),
    "q7_nations"    -> (q7Nations _),
    "q14_promo"     -> (q14Promo _),
    "q_json_props"  -> (jsonProps _),
    "q_json_nested" -> (jsonNested _),
    "q_user_paths"  -> (userPaths _),
    "q_profile"     -> (profile _),
    "q_quantiles"   -> (quantiles _),
    "q1_agg"        -> (q1Agg _),
    "q3_join"       -> (q3Join _),
    "q5_join"       -> (q5Join _),
    "q6_filter"     -> (q6Filter _),
    "q18_having"    -> (q18Having _),
    "q_anti_join"   -> (antiJoin _),
    "q_window_topk" -> (windowTopk _),
    "q_sessionize"  -> (sessionize _))

  val oracles: Map[String, String] = Map(
    "q_rollup"      -> rollupAggSql,
    "q_cube"        -> cubeAggSql,
    "q_pivot"       -> pivotAggSql,
    "q_moving_avg"  -> movingAvgSql,
    "q_funnel"      -> funnelSql,
    "q13_histogram" -> q13HistogramSql,
    "q21_waiting"   -> q21WaitingSql,
    "q7_nations"    -> q7NationsSql,
    "q14_promo"     -> q14PromoSql,
    "q_json_props"  -> jsonPropsSql,
    "q_json_nested" -> jsonNestedSql,
    "q_user_paths"  -> userPathsSql,
    "q_profile"     -> profileSql,
    "q_quantiles"   -> quantilesSql,
    "q1_agg"        -> q1AggSql,
    "q3_join"       -> q3JoinSql,
    "q5_join"       -> q5JoinSql,
    "q6_filter"     -> q6FilterSql,
    "q18_having"    -> q18HavingSql,
    "q_anti_join"   -> antiJoinSql,
    "q_window_topk" -> windowTopkSql,
    "q_sessionize"  -> sessionizeSql)
}
