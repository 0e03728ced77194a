package graft

import org.apache.spark.sql.functions._
import graft.Queries.QueryDef
import graft.core.Tables
import graft.ops.Events

/** Batch event-analytics operators behind the hash gate ([[graft.ops.Events]]):
  * gap sessionization, ordered-step funnel, cohort retention. Oracles replay
  * the identical integer-microsecond arithmetic in DuckDB (`epoch_us` =
  * Spark `unix_micros` after [[Tables.load]]'s shared micros
  * normalization), with the usual conventions: deterministic ORDER BY,
  * rounded doubles, BIGINT counts, day strings never DATE.
  */
object QueriesEvents {

  private def t(spark: org.apache.spark.sql.SparkSession, dir: String, name: String) =
    Tables.load(spark, dir, name)

  /** Gap sessionization ([[Events.sessionize]], 30-min gap). The oracle is
    * the same lag→break→running-sum→aggregate chain in DuckDB SQL;
    * `session_id` CAST to BIGINT because DuckDB widens window SUM(INT) to
    * HUGEINT (which pandas renders as float — the CAST trap in the
    * project notes).
    */
  val q114 = QueryDef("q114_sessionize", (spark, dir) =>
    Events.sessionize(t(spark, dir, "events"), "user_id", "ts", "event_id",
        "value", gapSeconds = 1800L)
      .orderBy("user_id", "session_id"),
    Some(
      """WITH e AS (SELECT user_id, event_id, ts, value, epoch_us(ts) AS us
        |           FROM events),
        |l AS (SELECT *, lag(us) OVER
        |        (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |      FROM e),
        |f AS (SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
        |                     THEN 1 ELSE 0 END AS brk FROM l),
        |s AS (SELECT *, sum(brk) OVER
        |        (PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |      FROM f)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  CAST(count(*) AS BIGINT) AS n_events, min(ts) AS session_start,
        |  CAST(max(us) - min(us) AS BIGINT) AS duration_us,
        |  round((max(us) - min(us)) / 1000000.0, 3) AS duration_s,
        |  round(sum(value), 2) AS sum_value
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin))

  /** Ordered funnel view→click→purchase ([[Events.funnel]]). The oracle
    * chains the same running minima through WINDOW clauses; a later step
    * counts only when the previous step's running minimum is already set
    * at that row, i.e. sequence order is enforced, not mere presence.
    */
  val q115 = QueryDef("q115_funnel", (spark, dir) =>
    Events.funnel(t(spark, dir, "events"), "user_id", "ts", "event_id",
        "event_type", Seq("view", "click", "purchase"))
      .orderBy("step_idx"),
    Some(
      """WITH e AS (SELECT user_id, event_id, ts, event_type, epoch_us(ts) AS us
        |           FROM events),
        |w1 AS (SELECT *, min(CASE WHEN event_type = 'view' THEN us END)
        |         OVER win AS t0 FROM e
        |       WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |w2 AS (SELECT *, min(CASE WHEN event_type = 'click' AND t0 IS NOT NULL
        |                          THEN us END) OVER win AS t1 FROM w1
        |       WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |w3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND t1 IS NOT NULL
        |                          THEN us END) OVER win AS t2 FROM w2
        |       WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |u AS (SELECT user_id, min(t0) AS t0, min(t1) AS t1, min(t2) AS t2
        |      FROM w3 GROUP BY user_id)
        |SELECT * FROM (
        |  SELECT 1 AS step_idx, 'view' AS step,
        |    CAST(count(CASE WHEN t0 IS NOT NULL THEN 1 END) AS BIGINT) AS n_users
        |  FROM u
        |  UNION ALL SELECT 2, 'click',
        |    CAST(count(CASE WHEN t1 IS NOT NULL THEN 1 END) AS BIGINT) FROM u
        |  UNION ALL SELECT 3, 'purchase',
        |    CAST(count(CASE WHEN t2 IS NOT NULL THEN 1 END) AS BIGINT) FROM u)
        |ORDER BY step_idx""".stripMargin))

  /** Cohort retention ([[Events.cohortRetention]]): cohort = first active
    * day (window min, no self-join), offset in days, distinct active
    * users. Cohort day rendered as a string on both engines.
    */
  val q116 = QueryDef("q116_cohort_retention", (spark, dir) =>
    Events.cohortRetention(t(spark, dir, "events"), "user_id", "ts")
      .orderBy("cohort", "offset_days"),
    Some(
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        |f AS (SELECT *, min(day) OVER (PARTITION BY user_id) AS first_day
        |      FROM e)
        |SELECT strftime(first_day, '%Y-%m-%d') AS cohort,
        |  CAST(date_diff('day', first_day, day) AS INTEGER) AS offset_days,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM f GROUP BY 1, 2
        |ORDER BY cohort, offset_days""".stripMargin))

  /** Events pipeline END-TO-END from `conf/events_pipeline.yml`: the
    * micros-converted event table is written to a temp dir, then the
    * manifest chain — SessionizeJob (`class:`) → per-user SQL rollup —
    * runs purely from YAML via `Flow.runPipeline`. The oracle replays
    * q114's sessionization CTE plus the rollup; rounding happens at the
    * session grain on BOTH engines, so the replay is exact.
    */
  val q120 = QueryDef("q120_events_pipeline", (spark, dir) => {
    val out = graft.Queries.tmpDir("graft_q120")
    t(spark, dir, "events").write.mode("overwrite")
      .parquet(s"$out/events_micros")
    val loaded = graft.core.model.Manifest.loadFile("conf/events_pipeline.yml",
      Seq("dev"), Map("events_in" -> s"$out/events_micros",
        "out_root" -> out))
    graft.engine.Flow.runPipeline(spark, loaded.jobs, "user_stats",
      save = false)("user_stats").orderBy("user_id")
  }, Some(
    """WITH e AS (SELECT user_id, event_id, ts, value, epoch_us(ts) AS us
      |           FROM events),
      |l AS (SELECT *, lag(us) OVER
      |        (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      |      FROM e),
      |f AS (SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
      |                     THEN 1 ELSE 0 END AS brk FROM l),
      |s AS (SELECT *, sum(brk) OVER
      |        (PARTITION BY user_id ORDER BY ts, event_id
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |      FROM f),
      |sess AS (
      |  SELECT user_id, session_id,
      |    CAST(max(us) - min(us) AS BIGINT) AS duration_us,
      |    round(sum(value), 2) AS sum_value
      |  FROM s GROUP BY user_id, session_id)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
      |  round(sum(duration_us) / (count(*) * 1e6), 3) AS avg_duration_s,
      |  round(sum(sum_value), 2) AS total_value
      |FROM sess GROUP BY user_id ORDER BY user_id""".stripMargin))

  /** Rolling active users ([[Events.activeUsers]], DAU/WAU/MAU): the
    * oracle explodes the same distinct (day, user) pairs across the
    * 30-day contribution range with `unnest(generate_series)` and takes
    * the same conditional distinct counts — restricted, like the
    * operator, to days that actually have events.
    */
  val q121 = QueryDef("q121_active_users", (spark, dir) =>
    Events.activeUsers(t(spark, dir, "events"), "user_id", "ts",
        windows = Seq(1, 7, 30))
      .orderBy("day"),
    Some(
      """WITH pairs AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
        |days AS (SELECT DISTINCT day FROM pairs),
        |ex0 AS (SELECT day, user_id,
        |          unnest(generate_series(0, 29)) AS i FROM pairs),
        |ex AS (SELECT day + CAST(i AS INTEGER) AS tday, user_id, i
        |       FROM ex0),
        |agg AS (SELECT tday,
        |    CAST(count(DISTINCT CASE WHEN i < 1 THEN user_id END) AS BIGINT)
        |      AS au_1d,
        |    CAST(count(DISTINCT CASE WHEN i < 7 THEN user_id END) AS BIGINT)
        |      AS au_7d,
        |    CAST(count(DISTINCT user_id) AS BIGINT) AS au_30d
        |  FROM ex GROUP BY tday)
        |SELECT strftime(d.day, '%Y-%m-%d') AS day, au_1d, au_7d, au_30d
        |FROM agg JOIN days d ON d.day = agg.tday
        |ORDER BY day""".stripMargin))

  val all: Seq[QueryDef] = Seq(q114, q115, q116, q120, q121)
}
