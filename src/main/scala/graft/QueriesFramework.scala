package graft

import org.apache.spark.sql.functions._
import graft.Queries.QueryDef
import graft.core.Tables
import graft.core.io.Reader
import graft.core.model.{DatasetSpec, JobSpec}
import graft.engine.{Etl, Flow, MultiPass}

/** Framework-lifecycle operators (SURVEY §2.1/§2.2/§2.6) as verifiable
  * queries: each runs the real manifest-level machinery — Reader/Writer
  * format dispatch, the Etl load→transform→save loop, DAG chaining, and
  * the multi-pass incremental driver — and lands on an aggregate the
  * DuckDB oracle reproduces straight from the source parquet. A round-trip
  * through a sink+source that changes the result would break the hash.
  */
object QueriesFramework {

  /** CSV sink + scan round-trip (S1/K1): write orders as CSV via the job
    * lifecycle, read back (header-only, all strings — the reference's CSV
    * semantics), cast and aggregate.
    */
  val q36 = QueryDef("q36_csv_roundtrip", (spark, dir) => {
    val out = Queries.tmpDir("graft_q36")
    val job = JobSpec(name = "csv_copy",
      inputs = Map("orders" -> DatasetSpec(path = s"$dir/orders.parquet")),
      output = Some(DatasetSpec(path = s"$out/orders_csv", format = "csv")),
      sql = Some("SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders"))
    Etl.runJob(spark, job, now = "r1")
    Reader.read(spark, DatasetSpec(path = s"$out/orders_csv", format = "csv"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice").cast("double")), 2).as("total"))
      .orderBy("o_orderstatus")
  }, Some(
    """SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin))

  /** JSON sink + scan round-trip (S3/K1) with timestamp fidelity via epoch
    * micros.
    */
  val q37 = QueryDef("q37_json_roundtrip", (spark, dir) => {
    val out = Queries.tmpDir("graft_q37")
    val job = JobSpec(name = "json_copy",
      inputs = Map("orders" -> DatasetSpec(path = s"$dir/orders.parquet")),
      output = Some(DatasetSpec(path = s"$out/orders_json", format = "json")),
      sql = Some("""SELECT o_orderkey, o_orderpriority,
                   |  unix_micros(CAST(o_orderdate AS TIMESTAMP)) AS ts_us, o_totalprice
                   |FROM orders""".stripMargin))
    Etl.runJob(spark, job, now = "r1")
    Reader.read(spark, DatasetSpec(path = s"$out/orders_json", format = "json"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), max("ts_us").as("max_ts_us"),
        round(sum("o_totalprice"), 2).as("total"))
      .orderBy("o_orderpriority")
  }, Some(
    """SELECT o_orderpriority, count(*) AS n, max(epoch_us(o_orderdate)) AS max_ts_us,
      |  round(sum(o_totalprice), 2) AS total
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))

  /** Three-job DAG with in-memory chaining (O3): enrich → aggregate →
    * report, manifest-shaped specs, outputs handed downstream without
    * touching disk.
    */
  val q38 = QueryDef("q38_pipeline_dag", (spark, dir) => {
    val jobs = Map(
      "enrich" -> JobSpec(name = "enrich",
        inputs = Map(
          "orders" -> DatasetSpec(path = s"$dir/orders.parquet"),
          "customer" -> DatasetSpec(path = s"$dir/customer.parquet")),
        sql = Some("""SELECT o_orderkey, o_totalprice, c_mktsegment, c_nationkey
                     |FROM orders JOIN customer ON o_custkey = c_custkey""".stripMargin)),
      "agg" -> JobSpec(name = "agg",
        inputs = Map("enrich" -> DatasetSpec(format = "df")),
        dependencies = Seq("enrich"),
        sql = Some("""SELECT c_mktsegment, count(*) AS n,
                     |  round(sum(o_totalprice), 2) AS total
                     |FROM enrich GROUP BY c_mktsegment""".stripMargin)),
      "report" -> JobSpec(name = "report",
        inputs = Map("agg" -> DatasetSpec(format = "df")),
        dependencies = Seq("agg"),
        sql = Some("""SELECT c_mktsegment, n, total,
                     |  CASE WHEN n > 3000 THEN 'major' ELSE 'minor' END AS tier
                     |FROM agg ORDER BY c_mktsegment""".stripMargin)))
    Flow.runPipeline(spark, jobs, "report", save = false)("report")
  }, Some(
    """WITH enrich AS (
      |  SELECT o_orderkey, o_totalprice, c_mktsegment, c_nationkey
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |agg AS (SELECT c_mktsegment, count(*) AS n, round(sum(o_totalprice), 2) AS total
      |        FROM enrich GROUP BY c_mktsegment)
      |SELECT c_mktsegment, n, total,
      |  CASE WHEN n > 3000 THEN 'major' ELSE 'minor' END AS tier
      |FROM agg ORDER BY c_mktsegment""".stripMargin))

  /** Multi-pass incremental driver (O4/P1/K4): one pass per day over three
    * days, each appending an `inc_<now>_<period>` subfolder; the union of
    * the increments must equal a direct slice of the source.
    */
  val q39 = QueryDef("q39_incremental_multipass", (spark, dir) => {
    val out = Queries.tmpDir("graft_q39")
    // Normalize events' ts once (Tables.load branches on the stored
    // precision) so the incremental job reads a plain-micros parquet copy.
    Tables.load(spark, dir, "events").write.parquet(s"$out/events")
    val job = JobSpec(name = "inc_events",
      inputs = Map("ev" -> DatasetSpec(path = s"$out/events", incField = Some("ts"))),
      output = Some(DatasetSpec(path = s"$out/sink")),
      sql = Some("SELECT ts, event_type, value FROM ev"))
    MultiPass.run(spark, job, java.time.LocalDate.parse("2024-01-05"),
      java.time.LocalDate.parse("2024-01-07"), now = "r1")
    spark.read.parquet(s"$out/sink/inc_*")
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .orderBy("day")
  }, Some(
    """SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n,
      |  round(sum(value), 2) AS sum_value
      |FROM events
      |WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-05' AND DATE '2024-01-07'
      |GROUP BY 1 ORDER BY day""".stripMargin))

  /** Registered row-wise UDF used from SQL (Q20/Q21) — the reference's
    * most-copied pattern (`ex2_frameworked_job.py:18-26`: a python
    * `format_datetime` udf + `registerFunction`). Here the reformat runs
    * as a Scala UDF registered into the session; the oracle reproduces it
    * with DuckDB's strftime.
    */
  val q48 = QueryDef("q48_registered_udf", (spark, dir) => {
    Tables.registerAll(spark, dir)
    spark.udf.register("fmt_day",
      (d: String) => if (d == null) null else d.substring(0, 10).replace("-", "/"))
    spark.sql(
      """SELECT fmt_day(CAST(o_orderdate AS STRING)) AS day_fmt,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders WHERE o_orderdate >= '1998-01-01'
        |GROUP BY 1 ORDER BY day_fmt""".stripMargin)
  }, Some(
    """SELECT strftime(o_orderdate, '%Y/%m/%d') AS day_fmt,
      |  count(*) AS n, round(sum(o_totalprice), 2) AS total
      |FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
      |GROUP BY 1 ORDER BY day_fmt""".stripMargin))

  /** Catalog registration (K9): write parquet, register the location as a
    * catalog table, and answer the query THROUGH the table name — a stale
    * or wrong registration would change the aggregate.
    */
  val q49 = QueryDef("q49_catalog_table", (spark, dir) => {
    val out = Queries.tmpDir("graft_q49")
    val cust = Tables.load(spark, dir, "customer")
    cust.write.mode("overwrite").parquet(s"$out/cust")
    spark.sql("DROP TABLE IF EXISTS graft_q49_cust")
    graft.core.io.Writer.registerTable(cust, "graft_q49_cust", s"$out/cust", "parquet")
    spark.sql(
      """SELECT c_mktsegment, count(*) AS n, round(sum(c_acctbal), 2) AS bal
        |FROM graft_q49_cust GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
  }, Some(
    """SELECT c_mktsegment, count(*) AS n, round(sum(c_acctbal), 2) AS bal
      |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin))

  /** Excel sink + source round-trip (S5/K3): nation → .xlsx (driver-side
    * single-file write) → Reader excel dispatch (all-string frame, the
    * pandas read_excel twin) → cast + aggregate.
    */
  val q50 = QueryDef("q50_excel_roundtrip", (spark, dir) => {
    val out = Queries.tmpDir("graft_q50")
    val nation = Tables.load(spark, dir, "nation")
      .select("n_nationkey", "n_name", "n_regionkey")
    graft.sources.Excel.write(nation, s"$out/nation.xlsx")
    Reader.read(spark, DatasetSpec(path = s"$out/nation.xlsx", format = "excel"))
      // nation.n_regionkey is int32 in the source parquet — cast the
      // string round-trip back to int so dtypes agree with the oracle
      .groupBy(col("n_regionkey").cast("int").as("region"))
      .agg(count(lit(1)).as("n"), min("n_name").as("first_name"))
      .orderBy("region")
  }, Some(
    """SELECT n_regionkey AS region, count(*) AS n, min(n_name) AS first_name
      |FROM nation GROUP BY 1 ORDER BY region""".stripMargin))

  /** Structured Streaming equivalence (the engine's beyond-reference
    * surface): events replayed through a file-source STREAM into a
    * watermarked day-window aggregation must produce exactly the batch
    * answer the DuckDB oracle computes — the streaming path is held to
    * the same hash gate as every batch operator.
    */
  val q54 = QueryDef("q54_stream_windowed", (spark, dir) => {
    val out = Queries.tmpDir("graft_q54")
    // land a plain-micros copy (events.parquet precision varies by testdata
    // generation; Tables.load normalizes it for the schema'd file stream)
    Tables.load(spark, dir, "events").select("ts", "event_type", "value")
      .write.parquet(s"$out/ev")
    val stream = graft.streaming.Streams.readFileStream(spark,
      DatasetSpec(path = s"$out/ev", format = "parquet"),
      "ts TIMESTAMP, event_type STRING, value DOUBLE")
    val agg = graft.streaming.Streams.windowedAgg(stream, "ts", "event_type",
      watermarkDelay = "1 hour", windowDur = "1 day")
    val sink = s"q54_sink_${System.nanoTime}"
    graft.streaming.Streams.withStatePartitions(spark, 8) {
      val q = agg.writeStream.format("memory").queryName(sink)
        .outputMode("complete").start()
      try q.processAllAvailable() finally q.stop()
    }
    spark.table(sink)
      .select(date_format(col("window_start"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("n"), round(col("sum_value"), 2).as("sum_value"))
      .orderBy("day", "event_type")
  }, Some(
    """SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
      |  count(*) AS n, round(sum(value), 2) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin))

  /** ORC sink + scan round-trip (K1/S-formats): same lifecycle as q36 but
    * through the ORC dispatch — a column-type or value change through the
    * round-trip breaks the hash against the parquet-source oracle.
    */
  val q59 = QueryDef("q59_orc_roundtrip", (spark, dir) => {
    val out = Queries.tmpDir("graft_q59")
    val job = JobSpec(name = "orc_copy",
      inputs = Map("lineitem" -> DatasetSpec(path = s"$dir/lineitem.parquet")),
      output = Some(DatasetSpec(path = s"$out/li_orc", format = "orc")),
      sql = Some("""SELECT l_returnflag, l_linestatus, l_quantity, l_extendedprice
                   |FROM lineitem""".stripMargin))
    Etl.runJob(spark, job, now = "r1")
    Reader.read(spark, DatasetSpec(path = s"$out/li_orc", format = "orc"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("total"))
      .orderBy("l_returnflag", "l_linestatus")
  }, Some(
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS total
      |FROM lineitem GROUP BY 1, 2 ORDER BY l_returnflag, l_linestatus""".stripMargin))

  /** Multi-path template scan with `_source` provenance (S12) — the
    * reference's bread-and-butter multi-folder concat
    * (`ex15_copy_job_multi_path.py`). The corpus is split into two
    * PID-keyed side folders (so the DuckDB oracle can read the very same
    * files with `filename=true`), re-read through the `{part}` template,
    * and the output groups on a tag derived from `input_file_name()`.
    * `n_src_agree` counts rows whose `_source` column names the same part
    * as the physical file path — the oracle pins it to count(*), so any
    * provenance mismatch breaks the hash.
    */
  private val q60SidePath =
    s"/tmp/graft_oracle_side/q60_multipath_${ProcessHandle.current().pid()}"

  val q60 = QueryDef("q60_multipath_source", (spark, dir) => {
    QueriesScale.reapStaleSideTables("q60_multipath")
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    orders.filter(col("o_orderkey") % 2 === 0)
      .write.mode("overwrite").parquet(s"$q60SidePath/part_a")
    orders.filter(col("o_orderkey") % 2 =!= 0)
      .write.mode("overwrite").parquet(s"$q60SidePath/part_b")
    val multi = Reader.readMultiPath(spark,
      DatasetSpec(path = s"$q60SidePath/{part}"),
      Seq(Map("part" -> "part_a"), Map("part" -> "part_b")))
    multi
      .withColumn("part", regexp_extract(input_file_name(), "part_[ab]", 0))
      .withColumn("src_agree",
        (regexp_extract(col("_source"), "part_[ab]", 0) === col("part")).cast("long"))
      .groupBy("part")
      .agg(count(lit(1)).as("n"), sum("src_agree").as("n_src_agree"),
        round(sum("o_totalprice"), 2).as("total"))
      .orderBy("part")
  }, Some(
    s"""SELECT regexp_extract(filename, 'part_[ab]', 0) AS part,
       |  count(*) AS n, count(*) AS n_src_agree,
       |  round(sum(o_totalprice), 2) AS total
       |FROM read_parquet('$q60SidePath/part_*/*.parquet', filename=true)
       |GROUP BY 1 ORDER BY part""".stripMargin))

  /** Event-time streaming sessionization held to the BATCH oracle (q47's
    * gaps-and-islands SQL): events replay through a file stream into
    * `flatMapGroupsWithState` with event-time timeouts, and the resulting
    * sessions must aggregate to exactly what DuckDB computes from the
    * table at rest. Timestamps are pre-floored to whole seconds (matching
    * the batch operator's `unix_timestamp` truncation) so gap decisions
    * agree bit-for-bit. A far-future sentinel event for a dummy key
    * pushes the global watermark past every real session's end+gap, so
    * event-time timeouts flush ALL sessions deterministically — the
    * sentinel's own (still-open) session is excluded by key.
    */
  val q61 = QueryDef("q61_stream_sessionize", (spark, dir) => {
    import spark.implicits._
    val out = Queries.tmpDir("graft_q61")
    val ev = Tables.load(spark, dir, "events")
      .select(col("user_id"), (unix_timestamp(col("ts")) * 1000).as("ts_ms"),
        col("value"))
    val maxMs = ev.agg(max("ts_ms")).head().getLong(0)
    ev.write.parquet(s"$out/ev")
    Seq((-1L, maxMs + 10L * 3600 * 1000, 0.0)).toDF("user_id", "ts_ms", "value")
      .write.mode("append").parquet(s"$out/ev")
    val stream = graft.streaming.Streams.readFileStream(spark,
        DatasetSpec(path = s"$out/ev", format = "parquet"),
        "user_id BIGINT, ts_ms BIGINT, value DOUBLE")
      .as[graft.streaming.Sessionize.Event]
    val sess = graft.streaming.Sessionize.sessionsEventTime(stream,
      gapMs = 1800L * 1000, watermarkDelay = "1 second")
    val sink = s"q61_sink_${System.nanoTime}"
    graft.streaming.Streams.withStatePartitions(spark, 8) {
      val q = sess.toDF.writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    spark.table(sink).filter(col("user_id") >= 0)
      .withColumn("duration_sec", (col("end_ms") - col("start_ms")) / 1000)
      .groupBy("n_events")
      .agg(count(lit(1)).as("n_sessions"),
        round(avg("duration_sec"), 4).as("avg_duration_sec"))
      .orderBy("n_events")
  }, QueriesExtra.q47.oracle)

  /** The flagship YAML pipeline itself behind the hash gate: exact dedup →
    * MinHash+LSH near-dup clusters (keep min id per component) → in-place
    * quality gate → deterministic hash split, loaded from
    * `conf/llm_pipeline.yml` and run through `Flow.runPipeline` exactly as
    * the CLI does. The oracle replays every stage in SQL: keep-min-id by
    * normalized-text md5, EXACT 3-gram Jaccard pairs at 0.8 (q27 pins
    * LSH == exact on this corpus) clustered by a recursive CTE, the q33
    * quality formula gated at 0.3, and the q52 md5 bucket split with the
    * manifest's salt and 0.9/0.05/0.05 fractions.
    */
  val q62 = QueryDef("q62_llm_pipeline", (spark, dir) => {
    val loaded = graft.core.model.Manifest.loadFile("conf/llm_pipeline.yml",
      Seq("dev"), Map("data" -> dir))
    Flow.runPipeline(spark, loaded.jobs, "split_corpus", save = false)("split_corpus")
      .select(col("doc_id"), col("quality"), col("split"))
      .orderBy("doc_id")
  }, Some(
    // shingle + quality SQL come from the same shared fragments as
    // q26/q51/q33 — the pipeline gate and the per-operator gates cannot
    // silently diverge
    s"""WITH RECURSIVE
       |corpus AS (
       |  SELECT doc_id, text FROM (
       |    SELECT doc_id, text, row_number() OVER (
       |        PARTITION BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
       |        ORDER BY doc_id) AS rn
       |    FROM documents) WHERE rn = 1),
       |${QueriesScale.duckShingles("corpus")},
       |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_inter
       |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2),
       |pairs AS (SELECT a_id, b_id FROM inter
       |          JOIN sizes sa ON sa.doc_id = inter.a_id
       |          JOIN sizes sb ON sb.doc_id = inter.b_id
       |          WHERE n_inter::DOUBLE / (sa.n_sh + sb.n_sh - n_inter) >= 0.8),
       |edges AS (SELECT a_id AS s, b_id AS d FROM pairs
       |          UNION ALL SELECT b_id, a_id FROM pairs),
       |walk(id, lbl) AS (
       |  SELECT s, s FROM edges GROUP BY s
       |  UNION
       |  SELECT e.s, walk.lbl FROM edges e JOIN walk ON walk.id = e.d),
       |drops AS (SELECT id FROM walk GROUP BY id HAVING id <> min(lbl)),
       |kept AS (SELECT doc_id, text FROM corpus
       |         WHERE doc_id NOT IN (SELECT id FROM drops)),
       |scored AS (SELECT doc_id, quality
       |           FROM (${QueriesScale.duckQualityScored("kept")}))
       |SELECT doc_id, quality,
       |  CASE WHEN bucket < 9000 THEN 'train'
       |       WHEN bucket < 9500 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM (
       |  SELECT doc_id, quality,
       |    CAST(('0x' || substr(md5('demo1' || CAST(doc_id AS VARCHAR)), 1, 15))
       |      AS BIGINT) % 10000 AS bucket
       |  FROM scored WHERE quality >= 0.3)
       |ORDER BY doc_id""".stripMargin))

  /** The mixed-modality branch of the SAME manifest behind the hash gate:
    * opaque payload → byte-block features (q80's seam) → int8 quantize
    * (q79) → dequantized embedding → SemDeDup (q98), entirely from
    * `conf/llm_pipeline.yml` via `Flow.runPipeline` — the document-level
    * dedup path for media shards with no text. The oracle replays the
    * block means, quantization at the published (rounded) scale,
    * within-cell cosine pairing against the SAME materialized cell table
    * (q58/q98 side-path pattern — k-means itself is engine-specific), and
    * the recursive component contraction in SQL.
    */
  private val q102CellPath = QueriesScale.sidePath("q102_media_cells")
  private val q102Threshold = 0.9999

  val q102 = QueryDef("q102_media_pipeline", (spark, dir) => {
    QueriesScale.reapStaleSideTables("q102_media_cells")
    val loaded = graft.core.model.Manifest.loadFile("conf/llm_pipeline.yml",
      Seq("dev"), Map("data" -> dir, "media_cells" -> q102CellPath))
    Flow.runPipeline(spark, loaded.jobs, "media_dedup", save = false)("media_dedup")
      .select(col("doc_id"),
        round(element_at(col("embedding"), 1).cast("double"), 4).as("f0"))
      .orderBy("doc_id")
  }, Some(
    s"""WITH RECURSIVE
       |p AS (SELECT doc_id, encode(text) AS b FROM documents
       |      WHERE length(text) > 0),
       |h AS (SELECT doc_id, hex(b) AS hx, octet_length(b) AS n FROM p
       |      WHERE octet_length(b) > 0),
       |byte AS (
       |  SELECT doc_id, n, i, CAST('0x' || substr(hx, 2 * i + 1, 2) AS INT) AS v
       |  FROM (SELECT doc_id, hx, n, unnest(generate_series(0, n - 1)) AS i
       |        FROM h)),
       |blk AS (SELECT doc_id,
       |          CAST(floor(i / CAST(ceil(n / 8.0) AS INT)) AS INT) AS j, v
       |        FROM byte),
       |feats AS (SELECT doc_id, j, sum(v)::DOUBLE / count(*) AS f
       |          FROM blk GROUP BY 1, 2),
       |grid AS (SELECT doc_id, unnest(generate_series(0, 7)) AS j FROM h),
       |vecs AS (SELECT g.doc_id, list(coalesce(f.f, 0.0) ORDER BY g.j) AS emb
       |         FROM grid g LEFT JOIN feats f
       |           ON f.doc_id = g.doc_id AND f.j = g.j
       |         GROUP BY g.doc_id),
       |qz AS (SELECT doc_id, emb,
       |         list_max(list_transform(emb, x -> abs(x))) / 127.0 AS sr
       |       FROM vecs),
       |dq AS (SELECT doc_id,
       |         CASE WHEN sr = 0 THEN list_transform(emb, x -> CAST(0.0 AS REAL))
       |              ELSE list_transform(emb,
       |                     x -> CAST(round(x / sr) * round(sr, 8) AS REAL))
       |         END AS demb
       |       FROM qz),
       |cells AS (SELECT vec_id, cell
       |          FROM read_parquet('$q102CellPath/*.parquet')),
       |e AS (SELECT d.doc_id, demb, cell
       |      FROM dq d JOIN cells c ON c.vec_id = d.doc_id),
       |pairs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
       |          FROM e a JOIN e b ON a.cell = b.cell AND a.doc_id < b.doc_id
       |          WHERE ${QueriesScale.duckCos("a.demb", "b.demb")} >= $q102Threshold),
       |edges AS (SELECT a_id AS s, b_id AS d FROM pairs
       |          UNION ALL SELECT b_id, a_id FROM pairs),
       |walk(id, lbl) AS (
       |  SELECT s, s FROM edges GROUP BY s
       |  UNION
       |  SELECT e2.s, walk.lbl FROM edges e2 JOIN walk ON walk.id = e2.d),
       |dropped AS (SELECT id FROM (SELECT id, min(lbl) AS comp FROM walk
       |                            GROUP BY id) WHERE comp <> id)
       |SELECT doc_id, round(CAST(demb[1] AS DOUBLE), 4) AS f0 FROM dq
       |WHERE doc_id NOT IN (SELECT id FROM dropped)
       |ORDER BY doc_id""".stripMargin))

  /** WARC shard roundtrip ([[graft.sources.Warc]]): documents rendered
    * as ISO 28500 conversion records, written as a multi-part shard set,
    * re-read through the splittable `lineSep` reader. The oracle
    * recomputes the expected records straight from `documents` —
    * equality gates BOTH the renderer and the parser (promoted headers,
    * payload fidelity, octet Content-Length validation all land in the
    * hash; `strlen` is DuckDB's octet length, matching
    * `octet_length`).
    */
  val q110 = QueryDef("q110_warc_roundtrip", (spark, dir) => {
    val out = Queries.tmpDir("graft_q110")
    val recs = Tables.load(spark, dir, "documents").select(
      lit("conversion").as("warc_type"),
      concat(lit("https://example.com/doc/"), col("doc_id").cast("string"))
        .as("target_uri"),
      concat(lit("<urn:uuid:"), md5(col("doc_id").cast("string")), lit(">"))
        .as("record_id"),
      lit("2026-01-01T00:00:00Z").as("warc_date"),
      col("text").as("payload"))
    graft.sources.Warc.write(recs, graft.sources.Warc.WarcCols(), s"$out/shard")
    graft.sources.Warc.read(spark, s"$out/shard")
      .select(col("target_uri"), col("warc_type"), col("record_id"),
        col("warc_date"), col("payload"),
        octet_length(col("payload")).cast("long").as("n_octets"),
        col("length_ok"))
      .orderBy("target_uri")
  }, Some(
    """SELECT 'https://example.com/doc/' || doc_id AS target_uri,
      |  'conversion' AS warc_type,
      |  '<urn:uuid:' || md5(CAST(doc_id AS VARCHAR)) || '>' AS record_id,
      |  '2026-01-01T00:00:00Z' AS warc_date,
      |  text AS payload,
      |  CAST(strlen(text) AS BIGINT) AS n_octets,
      |  TRUE AS length_ok
      |FROM documents ORDER BY target_uri""".stripMargin))

  val all: Seq[QueryDef] = Seq(q36, q37, q38, q39, q48, q49, q50, q54, q59,
    q60, q61, q62, q102, q110)
}
