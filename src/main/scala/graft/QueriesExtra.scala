package graft

import org.apache.spark.sql.functions._
import graft.Queries.QueryDef
import graft.core.Tables

/** Statistical, grouping-set, JSON, and pivot coverage — capabilities the
  * reference gets "for free" from its engines (SURVEY §2.5 tail), pinned
  * here with oracles so the engine's semantics are verified, not assumed.
  */
object QueriesExtra {

  private def t(spark: org.apache.spark.sql.SparkSession, dir: String, name: String) =
    Tables.load(spark, dir, name)

  /** Exact interpolated percentiles (Spark `percentile` == DuckDB
    * `quantile_cont`).
    */
  val q41 = QueryDef("q41_percentiles", (spark, dir) =>
    t(spark, dir, "events").groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.9)"), 4).as("p90"),
        round(stddev_pop(col("value")), 4).as("sd"))
      .orderBy("event_type"),
    Some(
      """SELECT event_type, count(*) AS n,
        |  round(quantile_cont(value, 0.5), 4) AS p50,
        |  round(quantile_cont(value, 0.9), 4) AS p90,
        |  round(stddev_pop(value), 4) AS sd
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin))

  /** Explicit GROUPING SETS with grouping() markers (same SQL text on both
    * engines; marker cast to BIGINT for dtype agreement).
    */
  val q42 = {
    val sql =
      """SELECT c_mktsegment, c_nationkey,
        |  CAST(grouping(c_mktsegment) AS BIGINT) AS g_seg,
        |  CAST(grouping(c_nationkey) AS BIGINT) AS g_nat,
        |  count(*) AS n, round(sum(c_acctbal), 2) AS bal
        |FROM customer
        |GROUP BY GROUPING SETS ((c_mktsegment, c_nationkey), (c_mktsegment), ())
        |ORDER BY g_seg, g_nat, c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST""".stripMargin
    QueryDef("q42_grouping_sets",
      (spark, dir) => { Tables.registerAll(spark, dir); spark.sql(sql) }, Some(sql))
  }

  /** JSON scalar extraction from the events props column. */
  val q43 = QueryDef("q43_json_extract", (spark, dir) =>
    t(spark, dir, "events")
      .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy((col("k") % 10).as("k_mod"))
      .agg(count(lit(1)).as("n"))
      .orderBy("k_mod"),
    Some(
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
        |  count(*) AS n
        |FROM events GROUP BY 1 ORDER BY k_mod""".stripMargin))

  /** Pivot: event counts per user decile by type (DataFrame pivot; oracle
    * is the equivalent conditional aggregation).
    */
  val q44 = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    QueryDef("q44_pivot", (spark, dir) =>
      t(spark, dir, "events")
        .groupBy((col("user_id") % 10).as("user_decile"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
        .na.fill(0L, types)
        .orderBy("user_decile"),
      Some(
        s"""SELECT user_id % 10 AS user_decile,
           |${types.map(t => s"  count(CASE WHEN event_type = '$t' THEN 1 END) AS $t").mkString(",\n")}
           |FROM events GROUP BY 1 ORDER BY user_decile""".stripMargin))
  }

  /** As-of join: each view/click event picks up the user's latest
    * purchase value at-or-before its timestamp. Oracle = DuckDB's native
    * ASOF LEFT JOIN.
    */
  val q45 = QueryDef("q45_asof_join", (spark, dir) => {
    val ev = t(spark, dir, "events")
    val activity = ev.filter(col("event_type").isin("view", "click"))
      .select("user_id", "ts", "event_type")
    // asofJoin requires right rows unique per (key, ts) — aggregate ties
    // deterministically (max value); the oracle does the identical prep
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts").agg(max("value").as("value"))
    graft.ops.TemporalJoins.asofJoin(activity, purchases,
        key = "user_id", leftTs = "ts", rightTs = "ts", rightVals = Seq("value"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        count(col("asof_value")).as("n_with_prior"),
        round(sum("asof_value"), 2).as("sum_prior"))
      .orderBy("event_type")
  }, Some(
    """WITH l AS (SELECT user_id, ts, event_type FROM events
      |           WHERE event_type IN ('view', 'click')),
      |r AS (SELECT user_id, ts, max(value) AS value FROM events
      |      WHERE event_type = 'purchase' GROUP BY user_id, ts)
      |SELECT l.event_type, count(*) AS n, count(r.value) AS n_with_prior,
      |  round(sum(r.value), 2) AS sum_prior
      |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
      |GROUP BY 1 ORDER BY event_type""".stripMargin))

  /** Range join: error events open a 30-minute incident window; count the
    * same user's events inside each window. Oracle = plain inequality
    * join (exact semantics; the bucketed plan must agree).
    */
  val q46 = QueryDef("q46_range_join", (spark, dir) => {
    val ev = t(spark, dir, "events")
    val windows = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("incident_id"), col("user_id"),
        col("ts").as("w_start"),
        (col("ts") + expr("INTERVAL 30 MINUTES")).as("w_end"))
    graft.ops.TemporalJoins.rangeJoin(
        ev.select(col("user_id"), col("ts"), col("event_id")), "ts",
        windows, "w_start", "w_end", bucketSeconds = 1800, key = Some("user_id"))
      .groupBy("incident_id")
      .agg(count(lit(1)).as("n_events"))
      .orderBy("incident_id")
  }, Some(
    """WITH w AS (SELECT event_id AS incident_id, user_id, ts AS w_start,
      |             ts + INTERVAL 30 MINUTE AS w_end
      |           FROM events WHERE event_type = 'error')
      |SELECT w.incident_id, count(*) AS n_events
      |FROM events e JOIN w ON e.user_id = w.user_id
      |  AND e.ts >= w.w_start AND e.ts <= w.w_end
      |GROUP BY 1 ORDER BY incident_id""".stripMargin))

  /** Batch sessionization (gaps-and-islands): session-size distribution
    * with average duration. The oracle floors epoch seconds to mirror
    * Spark's unix_timestamp truncation.
    */
  val q47 = QueryDef("q47_sessionize", (spark, dir) =>
    graft.ops.Sessions.sessionStats(t(spark, dir, "events"),
        keyCol = "user_id", tsCol = "ts", tieCol = "event_id", gapSeconds = 1800)
      .groupBy("n_events")
      .agg(count(lit(1)).as("n_sessions"),
        round(avg("duration_sec"), 4).as("avg_duration_sec"))
      .orderBy("n_events"),
    Some(
      """WITH ordered AS (
        |  SELECT user_id, ts, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS es,
        |    lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS prev_es
        |  FROM events),
        |flagged AS (SELECT user_id, ts, event_id, es,
        |    CASE WHEN prev_es IS NULL OR es - prev_es > 1800 THEN 1 ELSE 0 END AS new_s
        |  FROM ordered),
        |sess AS (SELECT user_id, es,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM flagged),
        |stats AS (SELECT user_id, session_id, count(*) AS n_events,
        |    max(es) - min(es) AS duration_sec
        |  FROM sess GROUP BY 1, 2)
        |SELECT n_events, count(*) AS n_sessions,
        |  round(avg(duration_sec), 4) AS avg_duration_sec
        |FROM stats GROUP BY n_events ORDER BY n_events""".stripMargin))

  val all: Seq[QueryDef] = Seq(q41, q42, q43, q44, q45, q46, q47)
}
