package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.engine.SqlFile
import graft.ops.{Checks, Compare, Dedup, Similarity, TextAnalysis}

/** One verifiable query per operator of the engine (SURVEY.md §2).
  *
  * Each entry pairs a Spark plan (DataFrame API or SparkSQL) with ANSI SQL
  * the driver runs on DuckDB over the same parquet tables; results must
  * hash-match. Column names/order and row determinism (explicit ORDER BY,
  * NULLS FIRST, rounded floats, tie-breaks) are part of each query's
  * contract — the compare sorts columns by name and hashes values.
  *
  * Mirrors the reference's own dual-engine correctness pattern (same SQL on
  * SparkSQL and DuckDB, reference tests/jobs/examples/ex1_sql_pandas_job_test.py).
  */
object Queries {

  final case class QueryDef(name: String,
                            run: (SparkSession, String) => DataFrame,
                            oracle: Option[String])

  /** Self-cleaning temp dir for round-trip/side-effect queries — one
    * shared helper (shutdown-hook recursive delete) for every Queries*
    * module.
    */
  private[graft] def tmpDir(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(dir.toFile)
    }))
    dir.toString
  }

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** Same SQL text on both engines (dialect-shared subset). */
  private def sqlBoth(name: String, sql: String): QueryDef =
    QueryDef(name, (spark, dir) => { Tables.registerAll(spark, dir); spark.sql(sql) }, Some(sql))

  private def df(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, Some(oracle))

  private def noOracle(name: String)(run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, None)

  // ---------------------------------------------------------------- Layer B: relational

  /** TPC-H Q1-shaped pricing summary (agg coverage: sum/avg/count + arith). */
  val q01 = sqlBoth("q01_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  round(avg(l_extendedprice), 4) AS avg_price,
      |  round(avg(l_discount), 4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= DATE '2000-12-01'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin)

  /** Inner equi-join + group-by (reference ex1_sql_job.sql shape), DataFrame API. */
  val q02 = df("q02_market_segment",
    """SELECT c_mktsegment, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_price
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (spark, dir) =>
    t(spark, dir, "orders")
      .join(broadcast(t(spark, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("total_price"))
      .orderBy("c_mktsegment")
  }

  /** 5-way star join, dims broadcast; the flagship plan. */
  val q03 = df("q03_region_revenue",
    """SELECT r_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin) { (spark, dir) =>
    t(spark, dir, "lineitem")
      .join(t(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(spark, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(spark, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name")
  }

  /** Top-N by aggregate (global sort + limit, rounded tie-safe keys). */
  val q04 = df("q04_top_customers",
    """SELECT c_custkey, c_name, round(sum(o_totalprice), 2) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_custkey, c_name
      |ORDER BY revenue DESC, c_custkey LIMIT 10""".stripMargin) { (spark, dir) =>
    t(spark, dir, "orders")
      .join(broadcast(t(spark, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey", "c_name")
      .agg(round(sum("o_totalprice"), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(10)
  }

  /** Window first-value per partition (reference ex2 Q7 shape). */
  val q05 = df("q05_first_event",
    """SELECT user_id, event_type AS first_type, ts AS first_ts FROM (
      |  SELECT user_id, event_type, ts,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    t(spark, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("first_type"), col("ts").as("first_ts"))
      .orderBy("user_id")
  }

  /** Running total window (explicit ROWS frame so engines agree on peers). */
  val q06 = df("q06_running_total",
    """SELECT user_id, event_id, round(sum(value) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value
      |FROM events WHERE user_id < 50 ORDER BY user_id, event_id""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(spark, dir, "events").filter(col("user_id") < 50)
      .select(col("user_id"), col("event_id"),
        round(sum("value").over(w), 2).as("running_value"))
      .orderBy("user_id", "event_id")
  }

  /** Conditional aggregation (count CASE WHEN — reference ex2 Q5 shape). */
  val q07 = sqlBoth("q07_conditional_agg",
    """SELECT event_type, count(*) AS n,
      |  count(CASE WHEN value > 100 THEN 1 END) AS n_high,
      |  round(sum(value), 2) AS sum_value,
      |  round(avg(value), 4) AS avg_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)

  /** Full outer join + coalesce of both sides (people_merge Q2 shape). */
  val q08 = df("q08_nation_balance",
    """SELECT coalesce(c.k, s.k) AS nationkey, c.cust_bal, s.supp_bal FROM
      |  (SELECT c_nationkey AS k, round(sum(c_acctbal), 2) AS cust_bal
      |   FROM customer GROUP BY c_nationkey) c
      |FULL OUTER JOIN
      |  (SELECT s_nationkey AS k, round(sum(s_acctbal), 2) AS supp_bal
      |   FROM supplier GROUP BY s_nationkey) s
      |ON c.k = s.k ORDER BY nationkey""".stripMargin) { (spark, dir) =>
    val c = t(spark, dir, "customer").groupBy(col("c_nationkey").as("k"))
      .agg(round(sum("c_acctbal"), 2).as("cust_bal"))
    val s = t(spark, dir, "supplier").groupBy(col("s_nationkey").as("k"))
      .agg(round(sum("s_acctbal"), 2).as("supp_bal"))
    c.as("c").join(s.as("s"), col("c.k") === col("s.k"), "full_outer")
      .select(coalesce(col("c.k"), col("s.k")).as("nationkey"),
        col("cust_bal"), col("supp_bal"))
      .orderBy("nationkey")
  }

  /** Chained CTEs (reference ex2 Q10 shape). */
  val q09 = sqlBoth("q09_cte_distribution",
    """WITH per_cust AS (
      |  SELECT o_custkey, count(*) AS n FROM orders
      |  WHERE o_orderstatus = 'O' GROUP BY o_custkey),
      |dist AS (SELECT n AS orders_per_cust, count(*) AS n_cust
      |  FROM per_cust GROUP BY n)
      |SELECT orders_per_cust, n_cust FROM dist ORDER BY orders_per_cust""".stripMargin)

  /** DISTINCT projection (Q18). */
  val q10 = df("q10_distinct",
    """SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
      |ORDER BY c_mktsegment, c_nationkey""".stripMargin) { (spark, dir) =>
    t(spark, dir, "customer").select("c_mktsegment", "c_nationkey")
      .distinct().orderBy("c_mktsegment", "c_nationkey")
  }

  /** Scalar string functions (Q11: length/lower/concat/substr). */
  val q11 = sqlBoth("q11_string_funcs",
    """SELECT c_custkey, lower(c_name) AS lname, CAST(length(c_name) AS BIGINT) AS name_len,
      |  concat(c_mktsegment, '#', c_name) AS tagged, substr(c_name, 1, 9) AS prefix
      |FROM customer ORDER BY c_custkey""".stripMargin)

  /** Multi-branch CASE WHEN (Q13). */
  val q12 = sqlBoth("q12_case_when",
    """SELECT CASE WHEN o_totalprice > 400000 THEN 'huge'
      |            WHEN o_totalprice > 200000 THEN 'big'
      |            WHEN o_totalprice > 50000 THEN 'mid'
      |            ELSE 'small' END AS bucket,
      |  count(*) AS n, round(avg(o_totalprice), 2) AS avg_price
      |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin)

  /** LIKE pattern filter (Q16) on the JSON-ish props string. */
  val q13 = sqlBoth("q13_like_filter",
    """SELECT event_type, count(*) AS n FROM events
      |WHERE props LIKE '%"k": 1%' GROUP BY event_type ORDER BY event_type""".stripMargin)

  /** Set operations: symmetric difference via EXCEPT, plus INTERSECT. */
  val q14 = sqlBoth("q14_setops",
    """SELECT 'only_cust' AS side, k FROM (
      |  SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9000
      |  EXCEPT SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000)
      |UNION ALL
      |SELECT 'both' AS side, k FROM (
      |  SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9000
      |  INTERSECT SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000)
      |ORDER BY side, k""".stripMargin)

  /** Left semi + anti joins (beyond-reference coverage). */
  val q15 = df("q15_semi_anti",
    """SELECT c_mktsegment,
      |  count(CASE WHEN has_open THEN 1 END) AS n_with_open,
      |  count(CASE WHEN NOT has_open THEN 1 END) AS n_without_open
      |FROM (SELECT c_custkey, c_mktsegment,
      |        EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                AND o_orderstatus = 'O') AS has_open
      |      FROM customer)
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (spark, dir) =>
    val cust = t(spark, dir, "customer")
    val open = t(spark, dir, "orders").filter(col("o_orderstatus") === "O")
    val withOpen = cust.join(open, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n_with_open"))
    val withoutOpen = cust.join(open, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n_without_open"))
    withOpen.join(withoutOpen, Seq("c_mktsegment"), "full_outer")
      .select(col("c_mktsegment"),
        coalesce(col("n_with_open"), lit(0L)).as("n_with_open"),
        coalesce(col("n_without_open"), lit(0L)).as("n_without_open"))
      .orderBy("c_mktsegment")
  }

  /** ROLLUP grouping sets over a dim join. */
  val q16 = sqlBoth("q16_rollup",
    """SELECT r_name, n_name, count(*) AS n_cust, round(sum(c_acctbal), 2) AS bal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(r_name, n_name)
      |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin)

  /** Wordcount via explode/split (reference RDD wordcount Q22, Spark-first). */
  val q17 = df("q17_wordcount",
    """SELECT word, count(*) AS n FROM (
      |  SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
      |WHERE word <> '' GROUP BY word ORDER BY n DESC, word LIMIT 20""".stripMargin) { (spark, dir) =>
    t(spark, dir, "documents")
      .select(explode(split(lower(col("text")), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(20)
  }

  /** Incremental period filter (P1): one day's slice. */
  val q18 = df("q18_period_filter",
    """SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value
      |FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-15'
      |GROUP BY event_type ORDER BY event_type""".stripMargin) { (spark, dir) =>
    graft.ops.Incremental.periodFilter(t(spark, dir, "events"), "ts", "2024-01-15")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .orderBy("event_type")
  }

  /** Min-of-max incremental bound (P2): consume events only up to the
    * slowest input's high-water mark (here: the purchase stream).
    */
  val q19 = df("q19_min_of_max",
    """SELECT count(*) AS n, max(ts) AS max_ts FROM events
      |WHERE ts > TIMESTAMP '2024-01-10 00:00:00'
      |  AND ts <= (SELECT least(max(ts),
      |                (SELECT max(ts) FROM events WHERE event_type = 'purchase'))
      |             FROM events)""".stripMargin) { (spark, dir) =>
    val ev = t(spark, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
    graft.ops.Incremental.minOfMaxFilter(ev, "ts",
        lit("2024-01-10 00:00:00").cast("timestamp"),
        Seq((ev, "ts"), (purchases, "ts")))
      .agg(count(lit(1)).as("n"), max("ts").as("max_ts"))
  }

  /** Non-unique-PK finder (P5/P6) summarised. */
  val q20 = df("q20_non_unique_pk",
    """SELECT count(*) AS n_rows, count(DISTINCT l_orderkey) AS n_keys FROM (
      |  SELECT l_orderkey, count(*) OVER (PARTITION BY l_orderkey) AS _count_pk
      |  FROM lineitem) WHERE _count_pk >= 2""".stripMargin) { (spark, dir) =>
    Checks.nonUniquePks(t(spark, dir, "lineitem"), Seq("l_orderkey"))
      .agg(count(lit(1)).as("n_rows"), countDistinct("l_orderkey").as("n_keys"))
  }

  /** Exact dataset compare (C1): multiset diff counts. */
  val q21 = df("q21_compare_exact",
    """WITH r AS (SELECT * FROM events WHERE value <= 400)
      |SELECT 'only_left' AS side,
      |  (SELECT count(*) FROM (SELECT * FROM events EXCEPT ALL SELECT * FROM r)) AS n
      |UNION ALL SELECT 'only_right',
      |  (SELECT count(*) FROM (SELECT * FROM r EXCEPT ALL SELECT * FROM events))
      |UNION ALL SELECT 'rows_left', (SELECT count(*) FROM events)
      |UNION ALL SELECT 'rows_right', (SELECT count(*) FROM r)
      |ORDER BY side""".stripMargin) { (spark, dir) =>
    val ev = t(spark, dir, "events")
    Compare.exactSummary(ev, ev.filter(col("value") <= 400))
  }

  /** Fuzzy dataset compare (C2): full-outer on PK, pct-threshold match. */
  val q22 = df("q22_compare_fuzzy",
    """WITH l AS (SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 89 <> 0),
      |r AS (SELECT o_orderkey,
      |        CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice * 1.5
      |             ELSE o_totalprice END AS o_totalprice
      |      FROM orders WHERE o_orderkey % 97 <> 0)
      |SELECT status, count(*) AS n FROM (
      |  SELECT CASE
      |    WHEN l.o_orderkey IS NOT NULL AND r.o_orderkey IS NOT NULL THEN
      |      CASE WHEN l.o_totalprice IS NULL AND r.o_totalprice IS NULL THEN 'match'
      |           WHEN l.o_totalprice IS NULL OR r.o_totalprice IS NULL THEN 'delta_exceeds'
      |           WHEN l.o_totalprice = 0 THEN
      |             (CASE WHEN r.o_totalprice = 0 THEN 'match' ELSE 'delta_exceeds' END)
      |           WHEN abs((l.o_totalprice - r.o_totalprice) / l.o_totalprice) * 100 < 0.01
      |             THEN 'match' ELSE 'delta_exceeds' END
      |    WHEN l.o_orderkey IS NOT NULL THEN 'only_left'
      |    ELSE 'only_right' END AS status
      |  FROM l FULL OUTER JOIN r ON l.o_orderkey = r.o_orderkey)
      |GROUP BY status ORDER BY status""".stripMargin) { (spark, dir) =>
    val orders = t(spark, dir, "orders")
    val left = orders.filter(col("o_orderkey") % 89 =!= 0)
      .select("o_orderkey", "o_totalprice")
    val right = orders.filter(col("o_orderkey") % 97 =!= 0)
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 10 === 0, col("o_totalprice") * 1.5)
          .otherwise(col("o_totalprice")).as("o_totalprice"))
    Compare.fuzzySummary(left, right, Seq("o_orderkey"), Seq("o_totalprice"), 0.01)
  }

  /** SQL-file job (O7): param-header SQL through the engine. */
  private val sqlFileText =
    """----param---- 'status' : 'F' ----
      |SELECT o_orderpriority, count(*) AS n_orders,
      |  round(sum(o_totalprice), 2) AS total
      |FROM orders WHERE o_orderstatus = '{{status}}'
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  val q23 = QueryDef("q23_sqlfile_job",
    (spark, dir) => { Tables.registerAll(spark, dir); SqlFile.run(spark, sqlFileText) },
    Some(SqlFile.interpolate(SqlFile.body(sqlFileText), SqlFile.params(sqlFileText))))

  val relational: Seq[QueryDef] = Seq(q01, q02, q03, q04, q05, q06, q07, q08,
    q09, q10, q11, q12, q13, q14, q15, q16, q17, q18, q19, q20, q21, q22, q23)

  val all: Seq[QueryDef] =
    relational ++ QueriesScale.all ++ QueriesFramework.all ++
      QueriesExtra.all ++ QueriesText.all ++ QueriesOps.all ++
      QueriesData.all ++ QueriesSelect.all ++ QueriesEvents.all ++
      QueriesCurate.all ++ QueriesAnalytics.all ++ QueriesRound8.all ++
      QueriesRound9.all ++ QueriesRound10.all ++ QueriesRound11.all ++
      QueriesRound12.all ++ QueriesRound13.all

  def queryMap: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleMap: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
