package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Temporal join operators: as-of join and point-in-interval range
  * join — the two join shapes time-series / telemetry analysis needs
  * that plain equi-joins can't express without a cartesian blowup.
  *
  * Both are built from Spark's own partitioned window/equi-join
  * machinery, so Catalyst plans them as ONE keyed shuffle (+ sort):
  * no BroadcastNestedLoopJoin, no O(|L|·|R|) pair space, and a
  * 1000-executor cluster scales them by raising
  * spark.sql.shuffle.partitions.
  */
object TemporalJoins {

  /** Working column names [[asofJoin]] claims internally. */
  val AsofInternalNames: Set[String] = Set("_t", "_side", "_tie", "_r", "_ok")

  /** Working column name [[rangeJoin]]/[[intervalJoin]] claim. */
  val BinInternalName: String = "_bin"

  private def requireNoBin(op: String, dfs: DataFrame*): Unit = {
    val hit = dfs.exists(_.columns.contains(BinInternalName))
    require(!hit,
      s"$op: input column '$BinInternalName' collides with the internal " +
        "working name; rename it before joining")
  }

  /** As-of join: each left row is matched to the latest right row with
    * `right.time <= left.time` on the same `key` (the classic
    * trade-attribution / sensor-alignment join).
    *
    * Plan shape: tag each side, union, ONE shuffle on `key`, ONE sort
    * by (time, side, id), and a running `last(..., ignoreNulls)` window
    * — the right row's values "flow forward" onto every left row until
    * the next right row supersedes them.  This is the same
    * merge-by-time pass a dedicated asof physical operator performs,
    * expressed as a declarative plan Catalyst can push filters through.
    * Right rows at the exact left timestamp DO match (side tag sorts
    * right-before-left within a tie); ties between right rows at the
    * same time resolve to the largest `id` — deterministic, and
    * mirrored in the oracle.
    *
    * @param left  probe side; all its columns pass through unchanged.
    * @param right build side; its non-key columns come back `r_`-prefixed
    *              (null when no right row precedes the left row).
    * @param id    a column present in both sides, unique across their
    *              union (the deterministic tiebreak).
    * @param tolerance max allowed `left.time − right.time`; a match
    *              older than this nulls out (pandas merge_asof
    *              semantics), applied as a post-window projection —
    *              same plan shape.
    */
  def asofJoin(left: DataFrame, right: DataFrame,
               key: String, time: String, id: String,
               tolerance: Option[Long] = None): DataFrame = {
    val lCols = left.columns.filterNot(_ == key).toSeq
    val rCols = right.columns.filterNot(_ == key).toSeq
    // the merge pass claims these working names and the r_ output
    // prefix; colliding inputs would fail far downstream with an
    // ambiguous-reference error, so reject them at the contract edge
    val internal = (left.columns ++ right.columns).filter(AsofInternalNames).distinct
    require(internal.isEmpty,
      s"asofJoin: input column(s) ${internal.mkString(", ")} collide with " +
        s"internal working names ${AsofInternalNames.mkString("{", ", ", "}")}; " +
        "rename them before joining")
    val outClash = left.columns.filter(c => rCols.contains(c.stripPrefix("r_")) && c.startsWith("r_"))
    require(outClash.isEmpty,
      s"asofJoin: left column(s) ${outClash.mkString(", ")} collide with the " +
        "r_-prefixed right output columns; rename them before joining")
    val lType = left.schema.fields.map(f => f.name -> f.dataType).toMap
    val rType = right.schema.fields.map(f => f.name -> f.dataType).toMap
    val lu = left.select(
      Seq(col(key), col(time).as("_t"), lit(1).as("_side"), col(id).as("_tie")) ++
        lCols.map(col) ++
        rCols.map(c => lit(null).cast(rType(c)).as(s"r_$c")): _*)
    val ru = right.select(
      Seq(col(key), col(time).as("_t"), lit(0).as("_side"), col(id).as("_tie")) ++
        lCols.map(c => lit(null).cast(lType(c)).as(c)) ++
        rCols.map(c => col(c).as(s"r_$c")): _*)
    val w = Window.partitionBy(key).orderBy(col("_t"), col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ONE last() over a struct of all r_* columns: the struct is null
    // on left rows and non-null on right rows (even when individual
    // right VALUES are null), so the match is atomic — per-column
    // last(ignoreNulls) would stitch values from different right rows
    // whenever a right value column holds a null
    val matched = lu.unionByName(ru)
      .withColumn("_r",
        when(col("_side") === 0, struct(rCols.map(c => col(s"r_$c")): _*)))
      .withColumn("_r", last(col("_r"), ignoreNulls = true).over(w))
      .drop(rCols.map(c => s"r_$c"): _*)
    val unpacked = rCols.foldLeft(matched) { (df, c) =>
      df.withColumn(s"r_$c", col("_r").getField(s"r_$c"))
    }
    val withinTol = tolerance match {
      case None      => unpacked
      case Some(tol) =>
        // capture the age test against the ORIGINAL matched time once,
        // then null every r_* together (they came from one right row)
        val fresh = unpacked.withColumn("_ok", col("_t") - col(s"r_$time") <= tol)
        rCols.foldLeft(fresh) { (df, c) =>
          df.withColumn(s"r_$c", when(col("_ok"), col(s"r_$c")))
        }.drop("_ok")
    }
    withinTol.filter(col("_side") === 1)
      .select(col(key) +: (lCols.map(col) ++ rCols.map(c => col(s"r_$c"))): _*)
  }

  /** Point-in-interval range join: rows of `points` matched to every
    * row of `intervals` (same `key`) whose [start, end] contains the
    * point's time.
    *
    * Scale shape: intervals explode to the fixed-width time bins they
    * cover, points key to their single bin, and the match is a plain
    * equi-join on (key, bin) + an exact containment filter — a hash
    * join proportional to true match density, never a
    * BroadcastNestedLoopJoin over the pair space.  `binMs` trades
    * interval fan-out (span/binMs rows per interval) against join
    * selectivity, exactly like the crossover cell grid.  Each
    * (point, interval) pair matches at most once (a point has one bin),
    * so no dedup pass is needed.
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, key: String,
                time: String, start: String, end: String, binMs: Long): DataFrame = {
    requireNoBin("rangeJoin", points, intervals)
    val binned = intervals.withColumn(BinInternalName,
      explode(sequence(floor(col(start) / binMs).cast("long"),
                       floor(col(end) / binMs).cast("long"))))
    points.withColumn(BinInternalName, floor(col(time) / binMs).cast("long"))
      .join(binned, Seq(key, BinInternalName))
      .filter(col(time) >= col(start) && col(time) <= col(end))
      .drop(BinInternalName)
  }

  /** Interval-overlap join: pairs of intervals (same `key`, one from
    * each side) whose [start, end] ranges intersect.
    *
    * Both sides explode to covered bins and equi-join on (key, bin);
    * a pair overlapping several shared bins would match once per bin,
    * so the join keeps only the CANONICAL bin — the bin containing
    * max(start1, start2), the overlap's left edge — making the output
    * duplicate-free without any distinct/dedup exchange.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   s1: String, e1: String, s2: String, e2: String,
                   binMs: Long): DataFrame = {
    requireNoBin("intervalJoin", left, right)
    def binned(df: DataFrame, s: String, e: String) =
      df.withColumn(BinInternalName,
        explode(sequence(floor(col(s) / binMs).cast("long"),
                         floor(col(e) / binMs).cast("long"))))
    binned(left, s1, e1)
      .join(binned(right, s2, e2), Seq(key, BinInternalName))
      .filter(col(s1) <= col(e2) && col(s2) <= col(e1))
      .filter(col(BinInternalName) === floor(greatest(col(s1), col(s2)) / binMs).cast("long"))
      .drop(BinInternalName)
  }

  // ---- the events-domain views both queries share ----
  private def typed(s: SparkSession, dir: String, et: String): DataFrame =
    Tables.eventsPoints(s, dir).filter(col("event_type") === et)
      .select(col("id"), col("user_id"), col("t"), col("z").as("value"))

  private def typedSql(et: String): String =
    s"""SELECT id, user_id, t, z AS value FROM (${Tables.eventsPointsSql})
       | WHERE event_type = '$et'""".stripMargin

  /** Click sessions: gap-based sessionization (2-day gap) of click
    * events per user — the interval table of [[rangeAttribution]].
    */
  private val GapMs = 172800000L // 2 days

  private def sessionsOf(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("t"), col("id"))
    val ws = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("ns",
        when(col("t") - lag("t", 1).over(w) > GapMs, lit(1L)).otherwise(lit(0L)))
      .withColumn("sid", sum("ns").over(ws))
      .groupBy(col("user_id"), col("sid"))
      .agg(min("t").as("s_start"), max("t").as("s_end"),
        count("*").as("n_clicks"))
  }

  private def clickSessions(s: SparkSession, dir: String): DataFrame =
    sessionsOf(typed(s, dir, "click"))

  private def sessionsSqlFor(et: String): String =
    s"""SELECT user_id, CAST(sid AS BIGINT) AS sid, min(t) AS s_start,
       |       max(t) AS s_end, count(*) AS n_clicks
       |FROM (
       |  SELECT user_id, t,
       |    sum(ns) OVER (PARTITION BY user_id ORDER BY t, id
       |                  ROWS UNBOUNDED PRECEDING) AS sid
       |  FROM (
       |    SELECT user_id, id, t,
       |      CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t, id)
       |                > $GapMs THEN 1 ELSE 0 END AS ns
       |    FROM (${typedSql(et)})))
       |GROUP BY 1, 2""".stripMargin

  private val clickSessionsSql: String = sessionsSqlFor("click")

  // --- 56. as-of join: purchase → most recent prior click ---
  def asofAttribution(s: SparkSession, dir: String): DataFrame =
    asofJoin(typed(s, dir, "purchase"), typed(s, dir, "click"),
      key = "user_id", time = "t", id = "id")
      .select(col("id").as("purchase_id"), col("user_id"), col("t"), col("value"),
        col("r_id").as("click_id"), col("r_t").as("click_t"),
        col("r_value").as("click_value"),
        (col("t") - col("r_t")).as("ms_since_click"))
      .orderBy("purchase_id")

  val asofAttributionSql: String =
    s"""WITH p AS (${typedSql("purchase")}),
       |c AS (${typedSql("click")}),
       |u AS (
       |  SELECT user_id, t AS _t, 1 AS _side, id AS _tie, id, t, value,
       |         NULL::BIGINT AS r_id, NULL::BIGINT AS r_t, NULL::DOUBLE AS r_value
       |  FROM p
       |  UNION ALL
       |  SELECT user_id, t, 0, id, NULL, NULL, NULL, id, t, value FROM c),
       |m AS (
       |  SELECT user_id, _side, id, t, value,
       |    last_value(r_id IGNORE NULLS) OVER w AS click_id,
       |    last_value(r_t IGNORE NULLS) OVER w AS click_t,
       |    last_value(r_value IGNORE NULLS) OVER w AS click_value
       |  FROM u
       |  WINDOW w AS (PARTITION BY user_id ORDER BY _t, _side, _tie
       |               ROWS UNBOUNDED PRECEDING))
       |SELECT id AS purchase_id, user_id, t, value, click_id, click_t,
       |       click_value, t - click_t AS ms_since_click
       |FROM m WHERE _side = 1 ORDER BY purchase_id""".stripMargin

  // --- 57. range join: error events within click sessions ---
  def rangeAttribution(s: SparkSession, dir: String): DataFrame =
    rangeJoin(typed(s, dir, "error"), clickSessions(s, dir),
      key = "user_id", time = "t", start = "s_start", end = "s_end",
      binMs = GapMs)
      .select(col("id").as("error_id"), col("user_id"), col("t"),
        col("sid"), col("s_start"), col("s_end"), col("n_clicks"),
        (col("t") - col("s_start")).as("ms_into_session"))
      .orderBy("error_id")

  val rangeAttributionSql: String =
    s"""WITH e AS (${typedSql("error")}),
       |s AS ($clickSessionsSql)
       |SELECT e.id AS error_id, e.user_id, e.t, s.sid, s.s_start, s.s_end,
       |       s.n_clicks, e.t - s.s_start AS ms_into_session
       |FROM e JOIN s ON s.user_id = e.user_id
       |              AND e.t BETWEEN s.s_start AND s.s_end
       |ORDER BY error_id""".stripMargin

  // --- 57b. interval-overlap join: click sessions × error bursts ---
  /** Per user, which click sessions and error bursts coincide — the
    * interval×interval sibling of [[rangeAttribution]], duplicate-free
    * by canonical-bin selection rather than a distinct pass.
    */
  def intervalAttribution(s: SparkSession, dir: String): DataFrame = {
    val clicks = clickSessions(s, dir)
    val errors = sessionsOf(typed(s, dir, "error"))
      .select(col("user_id"), col("sid").as("esid"),
        col("s_start").as("e_start"), col("s_end").as("e_end"),
        col("n_clicks").as("n_errors"))
    intervalJoin(clicks, errors, "user_id",
      "s_start", "s_end", "e_start", "e_end", binMs = GapMs)
      .select(col("user_id"), col("sid"), col("esid"),
        col("s_start"), col("s_end"), col("e_start"), col("e_end"),
        col("n_clicks"), col("n_errors"),
        (least(col("s_end"), col("e_end")) -
          greatest(col("s_start"), col("e_start"))).as("overlap_ms"))
      .orderBy("user_id", "sid", "esid")
  }

  val intervalAttributionSql: String =
    s"""WITH c AS (${sessionsSqlFor("click")}),
       |e AS (SELECT user_id, sid AS esid, s_start AS e_start,
       |             s_end AS e_end, n_clicks AS n_errors
       |      FROM (${sessionsSqlFor("error")}))
       |SELECT c.user_id, c.sid, e.esid, c.s_start, c.s_end,
       |       e.e_start, e.e_end, c.n_clicks, e.n_errors,
       |       least(c.s_end, e.e_end) - greatest(c.s_start, e.e_start) AS overlap_ms
       |FROM c JOIN e ON e.user_id = c.user_id
       |             AND c.s_start <= e.e_end AND e.e_start <= c.s_end
       |ORDER BY c.user_id, sid, esid""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_join"     -> (asofAttribution _),
    "q_range_join"    -> (rangeAttribution _),
    "q_interval_join" -> (intervalAttribution _))

  val oracles: Map[String, String] = Map(
    "q_asof_join"     -> asofAttributionSql,
    "q_range_join"    -> rangeAttributionSql,
    "q_interval_join" -> intervalAttributionSql)
}
