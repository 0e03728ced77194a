package graft

import org.apache.spark.sql.functions._
import graft.Queries.QueryDef
import graft.core.Tables

/** Round-7 widening past the VERDICT r6 list: ranked retrieval (BM25),
  * marketing-style attribution, and EWMA anomaly detection — the
  * analytics surfaces a training-data/eventstream team reaches for
  * right after the curation ops.
  */
object QueriesAnalytics {

  private def t(spark: org.apache.spark.sql.SparkSession, dir: String, name: String) =
    Tables.load(spark, dir, name)

  /** BM25 top-k retrieval ([[graft.ops.Search.bm25TopK]]): every 29th
    * document's first five tokens form a query; the corpus is scored
    * through the pruned inverted-index join. The oracle replays the
    * whole pipeline — postings, document lengths, idf, micro-quantized
    * per-term contributions, the order-free BIGINT score sum, and the
    * (score, id)-ranked top-k — so the hash gate pins the RANKING, not
    * just the score arithmetic.
    */
  /** The %29-of-documents query set shared by q142/q147/q152. */
  private[graft] def bm25Queries(docs: org.apache.spark.sql.DataFrame) =
    docs.filter(col("doc_id") % 29 === 0)
      .select(col("doc_id").as("query_id"),
        array_join(slice(split(lower(col("text")), " "), 1, 5), " ").as("qtext"))

  /** The BM25 replay CTE shared by the q142 and q152 oracles: ends at
    * `ranked`.
    */
  private[graft] val bm25OracleCte: String =
    """WITH dtok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
      |              FROM documents),
      |post AS (SELECT doc_id, term, count(*) AS tf FROM dtok
      |         WHERE term <> '' GROUP BY doc_id, term),
      |dl AS (SELECT doc_id, sum(tf) AS dl FROM post GROUP BY doc_id),
      |stats AS (SELECT count(*) AS n_docs,
      |                 CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
      |qraw AS (SELECT doc_id AS query_id,
      |           unnest(list_slice(string_split(lower(text), ' '), 1, 5)) AS term
      |         FROM documents WHERE doc_id % 29 = 0),
      |qt AS (SELECT DISTINCT query_id, term FROM qraw WHERE term <> ''),
      |qv AS (SELECT DISTINCT term FROM qt),
      |pruned AS (SELECT p.* FROM post p JOIN qv USING (term)),
      |dft AS (SELECT term, count(*) AS df_docs FROM pruned GROUP BY term),
      |contrib AS (
      |  SELECT qt.query_id, p.doc_id,
      |    CAST(round(round(
      |      ln(1.0 + (s.n_docs - f.df_docs + 0.5) / (f.df_docs + 0.5)) *
      |      (CAST(p.tf AS DOUBLE) * 2.2 /
      |       (p.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)))
      |    , 6) * 1e6, 0) AS BIGINT) AS c_micro
      |  FROM pruned p
      |  JOIN qt USING (term)
      |  JOIN dl ON dl.doc_id = p.doc_id
      |  JOIN dft f USING (term), stats s),
      |scored AS (SELECT query_id, doc_id, count(*) AS n_terms,
      |             CAST(sum(c_micro) AS BIGINT) AS score_micro
      |           FROM contrib GROUP BY query_id, doc_id),
      |ranked AS (SELECT query_id, doc_id, n_terms, score_micro,
      |             CAST(row_number() OVER (PARTITION BY query_id
      |               ORDER BY score_micro DESC, doc_id) AS INT) AS rank
      |           FROM scored)""".stripMargin

  val q142 = QueryDef("q142_bm25_topk", (spark, dir) => {
    val docs = t(spark, dir, "documents").select("doc_id", "text")
    graft.ops.Search.bm25TopK(docs, bm25Queries(docs), "doc_id", "text",
        "query_id", "qtext", k = 5)
      .orderBy("query_id", "rank")
  }, Some(bm25OracleCte +
    """
      |SELECT query_id, doc_id, n_terms, score_micro, rank
      |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin))

  /** Multi-touch attribution ([[graft.ops.Events.attribution]]): view /
    * click touches credit the next purchase within a 2-hour lookback
    * under first-touch, last-touch, and linear models. The oracle
    * replays the (ts, id)-total-order window logic, the micro-credit
    * split with first-touch remainder, and the order-free BIGINT sums —
    * the conservation law (`credit_micro` sums to 1e6 per credited
    * conversion per model) is enforced by the hash, not sampled.
    */
  val q143 = QueryDef("q143_attribution", (spark, dir) =>
    graft.ops.Events.attribution(t(spark, dir, "events"),
        "user_id", "ts", "event_id",
        conversionType = "purchase", touchTypes = Seq("view", "click"),
        lookbackSeconds = 7200L)
      .orderBy("model", "channel"),
    Some(
      """WITH ev AS (SELECT event_id, ts, user_id, event_type FROM events
        |            WHERE event_type IN ('purchase', 'view', 'click')),
        |rn AS (SELECT *, row_number() OVER
        |         (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |       FROM ev),
        |nxt AS (SELECT *,
        |          max(CASE WHEN event_type = 'purchase' THEN rn END)
        |            OVER w AS conv_rn,
        |          min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
        |            OVER w AS conv_us
        |        FROM rn
        |        WINDOW w AS (PARTITION BY user_id ORDER BY ts DESC, event_id DESC
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |touch AS (SELECT user_id, event_type AS channel, ts, event_id, conv_rn
        |          FROM nxt
        |          WHERE event_type <> 'purchase' AND conv_rn IS NOT NULL
        |            AND conv_us - epoch_us(ts) <= 7200000000),
        |grp AS (SELECT channel,
        |          count(*) OVER (PARTITION BY user_id, conv_rn) AS n,
        |          row_number() OVER (PARTITION BY user_id, conv_rn
        |                             ORDER BY ts, event_id) AS tn
        |        FROM touch),
        |cred AS (SELECT channel,
        |           CASE WHEN tn = 1 THEN 1000000 ELSE 0 END AS f_m,
        |           CASE WHEN tn = n THEN 1000000 ELSE 0 END AS l_m,
        |           1000000 // n +
        |             CASE WHEN tn = 1 THEN 1000000 % n ELSE 0 END AS lin_m
        |         FROM grp),
        |agg AS (SELECT channel, CAST(count(*) AS BIGINT) AS touches,
        |          CAST(sum(f_m) AS BIGINT) AS f, CAST(sum(l_m) AS BIGINT) AS l,
        |          CAST(sum(lin_m) AS BIGINT) AS lin
        |        FROM cred GROUP BY channel)
        |SELECT 'first_touch' AS model, channel, touches, f AS credit_micro FROM agg
        |UNION ALL SELECT 'last_touch', channel, touches, l FROM agg
        |UNION ALL SELECT 'linear', channel, touches, lin FROM agg
        |ORDER BY model, channel""".stripMargin))

  /** EWMA volume anomaly ([[graft.ops.Stats.ewmaAnomaly]]): per-type
    * daily event counts vs the half-life-one-day weighted average of the
    * prior 20 observed days. The oracle replays the integer bit-shift
    * weights, the order-free BIGINT weighted sums, the single final IEEE
    * division, and the pure-integer flag — first-day rows (null
    * prediction, false flag) included.
    */
  val q144 = QueryDef("q144_ewma_anomaly", (spark, dir) =>
    graft.ops.Stats.ewmaAnomaly(t(spark, dir, "events"), "event_type", "ts",
        horizonDays = 20, ratio = 2L)
      .orderBy("event_type", "day"),
    Some(
      """WITH daily AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
        |                 CAST(count(*) AS BIGINT) AS n
        |               FROM events GROUP BY 1, 2),
        |d2 AS (SELECT *, date_diff('day', DATE '1970-01-01', CAST(day AS DATE))
        |         AS idx FROM daily),
        |j AS (SELECT c.event_type, c.day, c.n,
        |        CAST(sum(p.n * (1::BIGINT << (20 - (c.idx - p.idx))))
        |          AS BIGINT) AS wsum,
        |        CAST(sum(1::BIGINT << (20 - (c.idx - p.idx))) AS BIGINT) AS wtot
        |      FROM d2 c LEFT JOIN d2 p
        |        ON p.event_type = c.event_type
        |       AND p.idx >= c.idx - 20 AND p.idx <= c.idx - 1
        |      GROUP BY c.event_type, c.day, c.n),
        |fin AS (SELECT event_type, day, n,
        |          CAST(round(round(CAST(wsum AS DOUBLE) / wtot, 6) * 1e6, 0)
        |            AS BIGINT) AS pred_micro
        |        FROM j)
        |SELECT event_type, day, n, pred_micro,
        |  coalesce(n * 1000000 > 2 * pred_micro, FALSE) AS is_anomaly
        |FROM fin ORDER BY event_type, day""".stripMargin))

  /** Spark's `pivot` surface (the reference's pandas `pivot_table`
    * territory, `yaetos/pandas_utils.py`): event counts pivoted to
    * weekday columns with explicit pivot values (never the
    * value-discovery scan). The oracle rebuilds the matrix with
    * conditional aggregation — `pivot` must agree with its own
    * unpivoted definition, nulls filled to zero.
    */
  val q145 = QueryDef("q145_event_pivot", (spark, dir) => {
    val days = (0 to 6).map(d => s"d$d")
    t(spark, dir, "events")
      .withColumn("dow", weekday(col("ts")))
      .groupBy("event_type")
      .pivot("dow", (0 to 6).map(d => d: Any))
      .agg(count(lit(1)))
      .na.fill(0L)
      .toDF("event_type" +: days: _*)
      .orderBy("event_type")
  }, Some(
    """SELECT event_type,
      |  CAST(count(*) FILTER (WHERE isodow(CAST(ts AS DATE)) = 1) AS BIGINT) AS d0,
      |  CAST(count(*) FILTER (WHERE isodow(CAST(ts AS DATE)) = 2) AS BIGINT) AS d1,
      |  CAST(count(*) FILTER (WHERE isodow(CAST(ts AS DATE)) = 3) AS BIGINT) AS d2,
      |  CAST(count(*) FILTER (WHERE isodow(CAST(ts AS DATE)) = 4) AS BIGINT) AS d3,
      |  CAST(count(*) FILTER (WHERE isodow(CAST(ts AS DATE)) = 5) AS BIGINT) AS d4,
      |  CAST(count(*) FILTER (WHERE isodow(CAST(ts AS DATE)) = 6) AS BIGINT) AS d5,
      |  CAST(count(*) FILTER (WHERE isodow(CAST(ts AS DATE)) = 7) AS BIGINT) AS d6
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin))

  /** Markov transition matrix ([[graft.ops.Events.transitionMatrix]]):
    * next-event conditional probabilities per user stream. The oracle
    * replays the (ts, id)-ordered `lead`, the pair counts, and the
    * per-from-type micro probability.
    */
  val q146 = QueryDef("q146_transition_matrix", (spark, dir) =>
    graft.ops.Events.transitionMatrix(t(spark, dir, "events"),
        "user_id", "ts", "event_id", "event_type")
      .orderBy("from_type", "to_type"),
    Some(
      """WITH nxt AS (SELECT event_type AS from_type,
        |               lead(event_type) OVER (PARTITION BY user_id
        |                 ORDER BY ts, event_id) AS to_type
        |             FROM events),
        |pairs AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
        |          FROM nxt WHERE to_type IS NOT NULL
        |          GROUP BY from_type, to_type),
        |tot AS (SELECT *, CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT)
        |          AS t FROM pairs)
        |SELECT from_type, to_type, n,
        |  CAST(round(round(CAST(n AS DOUBLE) / t, 6) * 1e6, 0) AS BIGINT)
        |    AS p_micro
        |FROM tot ORDER BY from_type, to_type""".stripMargin))

  /** BM25 through the PERSISTED index ([[graft.ops.Search
    * .writeBm25Index]]): the index is built from the even docs, GROWN
    * with the odd docs via the bucketed append, and queried through the
    * bucket-pruned path — held to the SAME oracle as q142's recompute.
    * The hash match proves both claims at once: the index changes the
    * plan, never the answer, and the grown index equals a full build.
    */
  val q147 = QueryDef("q147_bm25_index", (spark, dir) => {
    val docs = t(spark, dir, "documents").select("doc_id", "text")
    Seq("_postings", "_doclens", "_meta").foreach(s =>
      spark.sql(s"DROP TABLE IF EXISTS q147idx$s"))
    val idx = graft.ops.Search.writeBm25Index(
      docs.filter(col("doc_id") % 2 === 0), "doc_id", "text",
      "q147idx", numBuckets = 8)
    graft.ops.Search.appendBm25Index(
      docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", idx)
    val queries = bm25Queries(docs)
    graft.ops.Search.bm25TopKIndexed(spark,
        graft.ops.Search.loadBm25Index(spark, "q147idx"),
        queries, "query_id", "qtext", k = 5)
      .orderBy("query_id", "rank")
  }, q142.oracle)

  /** K-anonymity audit ([[graft.ops.Checks.kAnonymity]]) over customer
    * quasi-identifiers (nation × market segment, k=8) — the one-row
    * governance report. Pure integer aggregation; the oracle is the
    * same contraction written declaratively.
    */
  val q148 = QueryDef("q148_k_anonymity", (spark, dir) =>
    graft.ops.Checks.kAnonymity(t(spark, dir, "customer"),
      Seq("c_nationkey", "c_mktsegment"), k = 8L),
    Some(
      """WITH g AS (SELECT c_nationkey, c_mktsegment, count(*) AS n
        |           FROM customer GROUP BY 1, 2)
        |SELECT CAST(sum(n) AS BIGINT) AS n_rows,
        |  CAST(count(*) AS BIGINT) AS n_groups,
        |  CAST(count(*) FILTER (n < 8) AS BIGINT) AS n_violating_groups,
        |  CAST(coalesce(sum(n) FILTER (n < 8), 0) AS BIGINT) AS rows_at_risk,
        |  CAST(min(n) AS BIGINT) AS min_group_size,
        |  min(n) >= 8 AS k_anonymous
        |FROM g""".stripMargin))

  /** Per-label embedding outliers ([[graft.ops.Similarity
    * .embeddingOutliers]], z=2): the exact micro-unit centroid/distance
    * /moment pipeline replayed element-for-element in SQL — the flag
    * set (not just the distances) is what the hash pins.
    */
  val q149 = QueryDef("q149_embedding_outliers", (spark, dir) =>
    graft.ops.Similarity.embeddingOutliers(t(spark, dir, "embeddings"),
        "vec_id", "embedding", "label", z = 2.0)
      .orderBy("vec_id"),
    Some(
      """WITH el AS (SELECT vec_id, label, embedding,
        |              unnest(generate_series(1, len(embedding))) AS i
        |            FROM embeddings),
        |ex AS (SELECT vec_id, label, i,
        |         CAST(round(round(embedding[i]::DOUBLE, 6) * 1e6, 0) AS BIGINT)
        |           AS xm
        |       FROM el),
        |cent AS (SELECT label, i,
        |           CAST(round(CAST(sum(xm) AS DOUBLE) / count(*), 0) AS BIGINT)
        |             AS cm
        |         FROM ex GROUP BY label, i),
        |d AS (SELECT e.vec_id, e.label,
        |        CAST(sum((e.xm - c.cm) * (e.xm - c.cm)) AS BIGINT) AS d2
        |      FROM ex e JOIN cent c ON c.label = e.label AND c.i = e.i
        |      GROUP BY e.vec_id, e.label),
        |dm AS (SELECT vec_id, label,
        |         CAST(round(sqrt(d2), 0) AS BIGINT) AS dist_micro FROM d),
        |st AS (SELECT label, count(*) AS n,
        |         CAST(sum(dist_micro) AS BIGINT) AS s,
        |         CAST(sum(dist_micro * dist_micro) AS HUGEINT) AS s2
        |       FROM dm GROUP BY label),
        |thr AS (SELECT label,
        |          CAST(round(CAST(s AS DOUBLE) / n + 2.0 *
        |            sqrt(CAST(s2 AS DOUBLE) / n -
        |              (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)),
        |            0) AS BIGINT) AS thr_micro
        |        FROM st)
        |SELECT dm.vec_id, dm.label, dm.dist_micro, thr.thr_micro,
        |  dm.dist_micro > thr.thr_micro AS is_outlier
        |FROM dm JOIN thr USING (label) ORDER BY vec_id""".stripMargin))

  /** Freshness SLA ([[graft.ops.Checks.freshness]]): per event type,
    * newest event vs a fixed as-of instant with a 1-hour SLA — the
    * deterministic form of the ingest-lag monitor (as-of is a
    * parameter, never the wall clock).
    */
  val q150 = QueryDef("q150_freshness", (spark, dir) =>
    graft.ops.Checks.freshness(t(spark, dir, "events"), "event_type", "ts",
        asOf = "2024-01-31 00:00:00", maxLagSeconds = 3600L)
      .orderBy("grp"),
    Some(
      """SELECT event_type AS grp,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS max_ts,
        |  (epoch_us(TIMESTAMP '2024-01-31 00:00:00') - epoch_us(max(ts)))
        |    // 1000000 AS lag_s,
        |  epoch_us(TIMESTAMP '2024-01-31 00:00:00') - epoch_us(max(ts))
        |    <= 3600000000 AS fresh
        |FROM events GROUP BY 1 ORDER BY grp""".stripMargin))

  private val q151CellPath = QueriesScale.sidePath("q151_eval_cells")
  private val q151ProbePath = QueriesScale.sidePath("q151_eval_probes")

  /** ANN quality harness ([[graft.ops.Similarity.retrievalEval]]):
    * recall@10 and reciprocal rank of the nprobe=2 k-means IVF search
    * (q92's construction) against the brute-force ground truth (q29's),
    * per probe. The oracle replays BOTH retrieval pipelines from the
    * same side-materialized cell tables and then the micro-unit eval
    * arithmetic — the measured recall itself is hash-gated, so the
    * eval harness can never silently flatter the index.
    */
  val q151 = QueryDef("q151_ann_recall", (spark, dir) => {
    QueriesScale.reapStaleSideTables("q151_eval_cells")
    QueriesScale.reapStaleSideTables("q151_eval_probes")
    val emb = t(spark, dir, "embeddings").select("vec_id", "embedding")
    val probes = emb.filter(col("vec_id") % 100 === 0)
    val probeN = probes.count()
    val exact = graft.ops.Similarity.bruteForceTopK(emb, probes, k = 10,
      probeRows = Some(probeN))
    val (clustered, model) = graft.ops.Similarity.kmeansCells(emb,
      cells = 16, seed = 42L)
    clustered.select("vec_id", "cell").write.mode("overwrite")
      .parquet(q151CellPath)
    graft.ops.Similarity.assignCellsMulti(probes, model, nprobe = 2)
      .select("vec_id", "cell").write.mode("overwrite")
      .parquet(q151ProbePath)
    val corpus = emb.join(spark.read.parquet(q151CellPath), "vec_id")
    val probeSide = probes.join(spark.read.parquet(q151ProbePath), "vec_id")
    val approx = graft.ops.Similarity.ivfTopK(corpus, probeSide, "cell",
      k = 10, probeRows = Some(probeN * 2))
    graft.ops.Similarity.retrievalEval(approx, exact).orderBy("probe_id")
  }, Some(
    s"""WITH cells AS (SELECT vec_id, cell
       |               FROM read_parquet('$q151CellPath/*.parquet')),
       |pcells AS (SELECT vec_id, cell
       |           FROM read_parquet('$q151ProbePath/*.parquet')),
       |p0 AS (SELECT vec_id AS probe_id, embedding AS pe FROM embeddings
       |       WHERE vec_id % 100 = 0),
       |c0 AS (SELECT vec_id AS cand_id, embedding AS ce FROM embeddings),
       |ex_scored AS (
       |  SELECT probe_id, cand_id, ${QueriesScale.duckCos("pe", "ce")} AS cos
       |  FROM p0, c0 WHERE probe_id <> cand_id),
       |ex_ranked AS (SELECT probe_id, cand_id,
       |    row_number() OVER (PARTITION BY probe_id
       |                       ORDER BY round(cos, 6) DESC, cand_id) AS rank
       |  FROM ex_scored QUALIFY rank <= 10),
       |ap AS (SELECT e0.vec_id AS probe_id, embedding AS pe, pcells.cell
       |       FROM embeddings e0 JOIN pcells USING (vec_id)),
       |ac AS (SELECT e0.vec_id AS cand_id, embedding AS ce, cells.cell
       |       FROM embeddings e0 JOIN cells USING (vec_id)),
       |ap_scored AS (
       |  SELECT probe_id, cand_id, ${QueriesScale.duckCos("pe", "ce")} AS cos
       |  FROM ap JOIN ac ON ap.cell = ac.cell AND probe_id <> cand_id),
       |ap_ranked AS (SELECT probe_id, cand_id,
       |    row_number() OVER (PARTITION BY probe_id
       |                       ORDER BY round(cos, 6) DESC, cand_id) AS rank
       |  FROM ap_scored QUALIFY rank <= 10),
       |exn AS (SELECT probe_id, CAST(count(*) AS BIGINT) AS n_exact
       |        FROM ex_ranked GROUP BY 1),
       |hits AS (SELECT a.probe_id, CAST(count(*) AS BIGINT) AS nh,
       |           min(a.rank) AS first_r
       |         FROM ap_ranked a JOIN ex_ranked e
       |           ON e.probe_id = a.probe_id AND e.cand_id = a.cand_id
       |         GROUP BY 1)
       |SELECT exn.probe_id, n_exact,
       |  CAST(coalesce(nh, 0) AS BIGINT) AS n_hit,
       |  CAST(round(round(CAST(coalesce(nh, 0) AS DOUBLE) / n_exact, 6)
       |    * 1e6, 0) AS BIGINT) AS recall_micro,
       |  coalesce(CAST(round(round(1.0 / first_r, 6) * 1e6, 0) AS BIGINT), 0)
       |    AS rr_micro
       |FROM exn LEFT JOIN hits USING (probe_id)
       |ORDER BY probe_id""".stripMargin))

  /** Hard-negative mining ([[graft.ops.Search.hardNegatives]]): the
    * q142 BM25 pairs (self-hits removed) scored with embedding cosine
    * (`documents.doc_id` aligns with `embeddings.vec_id` in the
    * corpus); lexically-close-but-semantically-far pairs flag as
    * contrastive negatives. The oracle composes the shared BM25 replay
    * CTE with the ordered-fold cosine — both the ranking AND the flag
    * boundary are hash-pinned.
    */
  val q152 = QueryDef("q152_hard_negatives", (spark, dir) => {
    val docs = t(spark, dir, "documents").select("doc_id", "text")
    val pairs = graft.ops.Search.bm25TopK(docs, bm25Queries(docs),
        "doc_id", "text", "query_id", "qtext", k = 5)
      .filter(col("query_id") =!= col("doc_id"))
    val emb = t(spark, dir, "embeddings").select("vec_id", "embedding")
    graft.ops.Search.hardNegatives(pairs, emb)
      .orderBy("query_id", "rank")
  }, Some(bm25OracleCte +
    s""",
       |hn AS (SELECT r.query_id, r.doc_id, r.n_terms, r.score_micro, r.rank,
       |         CAST(round(round(
       |           ${QueriesScale.duckCos("qe.embedding", "de.embedding")}
       |         , 6) * 1e6, 0) AS BIGINT) AS cos_micro
       |       FROM ranked r
       |       JOIN embeddings qe ON qe.vec_id = r.query_id
       |       JOIN embeddings de ON de.vec_id = r.doc_id
       |       WHERE r.rank <= 5 AND r.query_id <> r.doc_id)
       |SELECT query_id, doc_id, n_terms, score_micro, rank, cos_micro,
       |  cos_micro < 300000 AS is_hard_negative
       |FROM hn ORDER BY query_id, rank""".stripMargin))

  /** Deterministic word dropout ([[graft.ops.TextAnalysis
    * .wordDropout]], rate 0.1): the oracle replays the positional
    * 60-bit hash (0-based position, the lambda-index contract) and the
    * ordered rebuild — identical threshold literal via
    * [[graft.ops.TextAnalysis.dropoutThreshold]].
    */
  val q153 = QueryDef("q153_word_dropout", (spark, dir) =>
    graft.ops.TextAnalysis.wordDropout(t(spark, dir, "documents"),
        "doc_id", "text", rate = 0.1, salt = "dropout")
      .orderBy("doc_id"),
    Some(
      s"""WITH px AS (SELECT doc_id, string_split(lower(text), ' ') AS l
         |            FROM documents),
         |pos AS (SELECT doc_id, l, unnest(generate_series(1, len(l))) AS i
         |        FROM px),
         |dec AS (SELECT doc_id, i, l[i] AS t,
         |          CAST('0x' || substr(md5('dropout' ||
         |            CAST(doc_id AS VARCHAR) || ':' ||
         |            CAST(i - 1 AS VARCHAR) || ':' || l[i]), 1, 15) AS BIGINT)
         |            >= ${graft.ops.TextAnalysis.dropoutThreshold(0.1)} AS keep
         |        FROM pos)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |  CAST(count(*) FILTER (keep) AS BIGINT) AS n_kept,
         |  coalesce(string_agg(CASE WHEN keep THEN t END, ' ' ORDER BY i), '')
         |    AS text_out
         |FROM dec GROUP BY doc_id ORDER BY doc_id""".stripMargin))

  /** Leakage-safe temporal split ([[graft.ops.Sampling.temporalSplit]]):
    * train < Jan 20, a 2-day embargo gap, test from Jan 22 — reported
    * as per-(split, type) counts with boundary timestamps, so the hash
    * pins the exact microsecond boundary semantics on both sides of the
    * gap.
    */
  val q154 = QueryDef("q154_temporal_split", (spark, dir) =>
    graft.ops.Sampling.temporalSplit(t(spark, dir, "events"), "ts",
        cutoff = "2024-01-20 00:00:00", embargoSeconds = 172800L)
      .groupBy("split", "event_type")
      .agg(count(lit(1)).as("n"),
        date_format(min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("min_ts"),
        date_format(max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("max_ts"))
      .orderBy("split", "event_type"),
    Some(
      """WITH s AS (SELECT event_type, ts,
        |    CASE WHEN epoch_us(ts) <
        |              epoch_us(TIMESTAMP '2024-01-20 00:00:00') THEN 'train'
        |         WHEN epoch_us(ts) >=
        |              epoch_us(TIMESTAMP '2024-01-20 00:00:00') + 172800000000
        |           THEN 'test'
        |         ELSE 'embargo' END AS split
        |  FROM events)
        |SELECT split, event_type, CAST(count(*) AS BIGINT) AS n,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS min_ts,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS max_ts
        |FROM s GROUP BY 1, 2 ORDER BY split, event_type""".stripMargin))

  /** Global stable ordinals ([[graft.ops.Layout.stableIds]]) without a
    * single-partition window: the oracle IS the single-partition
    * `row_number` — the hash proves the range-partition + zipWithIndex
    * plan computes exactly the global rank.
    */
  val q155 = QueryDef("q155_stable_ids", (spark, dir) =>
    graft.ops.Layout.stableIds(
        t(spark, dir, "orders").select("o_orderkey", "o_totalprice"),
        Seq("o_orderkey"))
      .select("o_orderkey", "ordinal")
      .orderBy("o_orderkey"),
    Some(
      """SELECT o_orderkey,
        |  CAST(row_number() OVER (ORDER BY o_orderkey) - 1 AS BIGINT)
        |    AS ordinal
        |FROM orders ORDER BY o_orderkey""".stripMargin))

  /** Peak session concurrency ([[graft.ops.Events.peakConcurrency]]):
    * gap-sessionized intervals swept per day with the split prefix-sum
    * (per-day windows + day-grain carry). The oracle replays
    * sessionization, the tie-free per-microsecond delta contraction,
    * ONE global running sum, and the per-day carry/max decomposition —
    * the hash proves the distributed split equals the global sweep.
    */
  val q156 = QueryDef("q156_peak_concurrency", (spark, dir) => {
    val sess = graft.ops.Events.sessionize(t(spark, dir, "events"),
        "user_id", "ts", "event_id", "value", gapSeconds = 1800L)
      .select(col("session_start"),
        timestamp_micros(unix_micros(col("session_start")) +
          col("duration_us")).as("session_end"))
    graft.ops.Events.peakConcurrency(sess, "session_start", "session_end")
      .orderBy("day")
  }, Some(
    """WITH e AS (SELECT user_id, event_id, ts, epoch_us(ts) AS us FROM events),
      |l AS (SELECT *, lag(us) OVER (PARTITION BY user_id
      |        ORDER BY ts, event_id) AS prev_us FROM e),
      |f AS (SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
      |                     THEN 1 ELSE 0 END AS brk FROM l),
      |s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id
      |        ORDER BY ts, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |        AS session_id FROM f),
      |sess AS (SELECT user_id, session_id, min(us) AS s_us, max(us) AS e_us
      |         FROM s GROUP BY 1, 2),
      |edges AS (SELECT s_us AS us, 1 AS d FROM sess
      |          UNION ALL SELECT e_us + 1, -1 FROM sess),
      |d AS (SELECT us, CAST(sum(d) AS BIGINT) AS d FROM edges GROUP BY us),
      |r AS (SELECT us, d,
      |        CAST(sum(d) OVER (ORDER BY us
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |          AS run,
      |        strftime(make_timestamp(us), '%Y-%m-%d') AS day
      |      FROM d),
      |agg AS (SELECT day,
      |          CAST(arg_min(run - d, us) AS BIGINT) AS carry_in,
      |          CAST(max(run) AS BIGINT) AS mx
      |        FROM r GROUP BY day)
      |SELECT day, carry_in, greatest(carry_in, mx) AS peak_concurrent
      |FROM agg ORDER BY day""".stripMargin))

  /** Lang-ID confusion matrix ([[graft.ops.TextAnalysis
    * .langConfusion]]): the heuristic's predictions against the
    * corpus' declared `lang`, row-normalized in micro-units. The
    * oracle regenerates the SAME stopword-hit SQL the q32 oracle
    * builds (shared list — operator and gate cannot drift), then the
    * grid aggregation.
    */
  val q157 = QueryDef("q157_lang_confusion", (spark, dir) =>
    graft.ops.TextAnalysis.langConfusion(t(spark, dir, "documents"),
        "doc_id", "text", "lang")
      .orderBy("declared", "pred_lang"),
    Some {
      val sw = graft.ops.TextAnalysis.stopwords
      val hits = sw.map { case (lang, words) =>
        val lst = words.map(w => s"'$w'").mkString(", ")
        s"CAST(len(list_filter(string_split(lower(text), ' '), x -> list_contains([$lst], x))) AS BIGINT) AS hits_$lang"
      }.mkString(",\n    ")
      val gExpr = sw.map(l => s"hits_${l._1}").mkString("greatest(", ", ", ")")
      val pred = sw.map { case (lang, _) =>
        s"WHEN hits_$lang = g AND hits_$lang > 0 THEN '$lang'"
      }.mkString(" ")
      s"""WITH scored AS (SELECT lang,
         |    $hits,
         |    $gExpr AS g
         |  FROM documents),
         |p AS (SELECT lang AS declared,
         |        CASE $pred ELSE 'und' END AS pred_lang
         |      FROM scored),
         |grid AS (SELECT declared, pred_lang, CAST(count(*) AS BIGINT) AS n
         |         FROM p GROUP BY 1, 2),
         |t AS (SELECT *, CAST(sum(n) OVER (PARTITION BY declared) AS BIGINT)
         |        AS tot FROM grid)
         |SELECT declared, pred_lang, n,
         |  CAST(round(round(CAST(n AS DOUBLE) / tot, 6) * 1e6, 0) AS BIGINT)
         |    AS frac_micro
         |FROM t ORDER BY declared, pred_lang""".stripMargin
    })

  /** SCD type-1 upsert ([[graft.ops.Scd.scd1Upsert]]): two change
    * versions per %3 customer (latest must win), plus inserts under
    * shifted keys; untouched customers pass through. The oracle replays
    * keep-latest + anti-join + union — last-write-wins is the
    * hash-pinned property.
    */
  val q158 = QueryDef("q158_scd1_upsert", (spark, dir) => {
    val dim = t(spark, dir, "customer")
      .select(col("c_custkey"), round(col("c_acctbal"), 2).as("c_acctbal"))
    val touched = t(spark, dir, "customer").filter(col("c_custkey") % 3 === 0)
    val changes = touched
      .select(col("c_custkey"), round(col("c_acctbal") + 500, 2).as("c_acctbal"),
        lit(1L).as("seq"))
      .unionByName(touched.select(col("c_custkey"),
        round(col("c_acctbal") + 1000, 2).as("c_acctbal"), lit(2L).as("seq")))
      .unionByName(t(spark, dir, "customer")
        .filter(col("c_custkey") % 7 === 0)
        .select((col("c_custkey") + 100000).as("c_custkey"),
          lit(0.0).as("c_acctbal"), lit(1L).as("seq")))
    graft.ops.Scd.scd1Upsert(dim, changes, Seq("c_custkey"), Seq("seq"))
      .orderBy("c_custkey")
  }, Some(
    """WITH changes AS (
      |  SELECT c_custkey, round(c_acctbal + 500, 2) AS c_acctbal, 1 AS seq
      |  FROM customer WHERE c_custkey % 3 = 0
      |  UNION ALL
      |  SELECT c_custkey, round(c_acctbal + 1000, 2), 2
      |  FROM customer WHERE c_custkey % 3 = 0
      |  UNION ALL
      |  SELECT c_custkey + 100000, 0.0, 1
      |  FROM customer WHERE c_custkey % 7 = 0),
      |latest AS (SELECT c_custkey, c_acctbal FROM (
      |    SELECT *, row_number() OVER (PARTITION BY c_custkey
      |      ORDER BY seq DESC) AS rn FROM changes) WHERE rn = 1),
      |kept AS (SELECT c_custkey, round(c_acctbal, 2) AS c_acctbal
      |         FROM customer
      |         WHERE c_custkey NOT IN (SELECT c_custkey FROM latest))
      |SELECT c_custkey, c_acctbal FROM latest
      |UNION ALL SELECT c_custkey, c_acctbal FROM kept
      |ORDER BY c_custkey""".stripMargin))

  /** L-diversity audit ([[graft.ops.Checks.lDiversity]]): nation ×
    * segment groups must each carry >= 3 distinct order priorities
    * among their customers' orders — the homogeneity-attack check
    * beside q148.
    */
  val q159 = QueryDef("q159_l_diversity", (spark, dir) => {
    val joined = t(spark, dir, "orders")
      .join(t(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
    graft.ops.Checks.lDiversity(joined,
      Seq("c_nationkey", "c_mktsegment"), "o_orderpriority", l = 3L)
  }, Some(
    """WITH j AS (SELECT c_nationkey, c_mktsegment, o_orderpriority
      |           FROM orders JOIN customer ON o_custkey = c_custkey),
      |g AS (SELECT c_nationkey, c_mktsegment, count(*) AS n,
      |        count(DISTINCT o_orderpriority) AS d
      |      FROM j GROUP BY 1, 2)
      |SELECT CAST(sum(n) AS BIGINT) AS n_rows,
      |  CAST(count(*) AS BIGINT) AS n_groups,
      |  CAST(count(*) FILTER (d < 3) AS BIGINT) AS n_violating_groups,
      |  CAST(coalesce(sum(n) FILTER (d < 3), 0) AS BIGINT) AS rows_at_risk,
      |  CAST(min(d) AS BIGINT) AS min_distinct_sensitive,
      |  min(d) >= 3 AS l_diverse
      |FROM g""".stripMargin))

  /** Rolling 7-day retention ([[graft.ops.Events.rollingRetention]]):
    * day-grain rate of lagged users returning; null rate when the
    * lagged day had no activity (first week) — the null row is part of
    * the contract the hash pins.
    */
  val q160 = QueryDef("q160_rolling_retention", (spark, dir) =>
    graft.ops.Events.rollingRetention(t(spark, dir, "events"),
        "user_id", "ts", lagDays = 7)
      .orderBy("day"),
    Some(
      """WITH pairs AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
        |               FROM events),
        |active AS (SELECT day, CAST(count(*) AS BIGINT) AS n_active
        |           FROM pairs GROUP BY day),
        |retained AS (SELECT t.day, CAST(count(*) AS BIGINT) AS n_retained
        |             FROM pairs t JOIN pairs p
        |               ON p.user_id = t.user_id
        |              AND p.day = t.day - 7
        |             GROUP BY t.day),
        |base AS (SELECT day + 7 AS day, n_active AS n_base
        |         FROM active)
        |SELECT strftime(a.day, '%Y-%m-%d') AS day, a.n_active, b.n_base,
        |  coalesce(r.n_retained, 0) AS n_retained,
        |  CAST(round(round(CAST(coalesce(r.n_retained, 0) AS DOUBLE)
        |    / b.n_base, 6) * 1e6, 0) AS BIGINT) AS rate_micro
        |FROM active a
        |LEFT JOIN base b ON b.day = a.day
        |LEFT JOIN retained r ON r.day = a.day
        |ORDER BY day""".stripMargin))

  /** Power-user curve ([[graft.ops.Events.activityHistogram]]):
    * users by distinct active-day count.
    */
  val q161 = QueryDef("q161_activity_histogram", (spark, dir) =>
    graft.ops.Events.activityHistogram(t(spark, dir, "events"),
        "user_id", "ts")
      .orderBy("n_days"),
    Some(
      """WITH pairs AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        |               FROM events),
        |per_user AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_days
        |             FROM pairs GROUP BY user_id)
        |SELECT n_days, CAST(count(*) AS BIGINT) AS n_users
        |FROM per_user GROUP BY n_days ORDER BY n_days""".stripMargin))

  /** STREAMING volume alerts: events replay through a watermarked
    * 1-day-window file-source stream ([[graft.streaming.Streams
    * .windowedAgg]]), the materialized daily counts feed
    * [[graft.ops.Stats.ewmaAnomalyDaily]], and the result is held to
    * the SAME oracle as q144's batch path — the monitor's streaming
    * lane can never drift from its batch definition.
    */
  val q162 = QueryDef("q162_stream_volume_alerts", (spark, dir) => {
    val out = graft.Queries.tmpDir("graft_q162")
    Tables.load(spark, dir, "events").select("ts", "event_type", "value")
      .write.parquet(s"$out/ev")
    val stream = graft.streaming.Streams.readFileStream(spark,
      graft.core.model.DatasetSpec(path = s"$out/ev", format = "parquet"),
      "ts TIMESTAMP, event_type STRING, value DOUBLE")
    val agg = graft.streaming.Streams.windowedAgg(stream, "ts", "event_type",
      watermarkDelay = "1 hour", windowDur = "1 day")
    val sink = s"q162_sink_${System.nanoTime}"
    graft.streaming.Streams.withStatePartitions(spark, 8) {
      val q = agg.writeStream.format("memory").queryName(sink)
        .outputMode("complete").start()
      try q.processAllAvailable() finally q.stop()
    }
    val daily = spark.table(sink)
      .select(col("event_type"),
        date_format(col("window_start"), "yyyy-MM-dd").as("day"), col("n"))
    graft.ops.Stats.ewmaAnomalyDaily(daily, "event_type", "day", "n",
        horizonDays = 20, ratio = 2L)
      .orderBy("event_type", "day")
  }, q144.oracle)

  /** Collocation mining ([[graft.ops.TextAnalysis.pmiPairs]]): top-20
    * adjacent-pair PMI over the corpus, min support 5. The oracle
    * replays bigram/unigram counts and the micro PMI with the same
    * (pmi, a, b) tie order — the SELECTED phrase list is what the hash
    * pins.
    */
  val q163 = QueryDef("q163_pmi_pairs", (spark, dir) =>
    graft.ops.TextAnalysis.pmiPairs(t(spark, dir, "documents"), "text",
      minCount = 5L, k = 20),
    Some(
      """WITH toksl AS (SELECT list_filter(string_split(lower(text), ' '),
        |                 x -> x <> '') AS l FROM documents),
        |uni AS (SELECT t, count(*) AS c FROM
        |          (SELECT unnest(l) AS t FROM toksl) GROUP BY t),
        |un AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uni),
        |bi0 AS (SELECT l, unnest(generate_series(1, len(l) - 1)) AS i
        |        FROM toksl WHERE len(l) >= 2),
        |bi AS (SELECT l[i] AS a, l[i+1] AS b, count(*) AS c_ab
        |       FROM bi0 GROUP BY 1, 2 HAVING count(*) >= 5),
        |bm AS (SELECT CAST(sum(c_ab) AS BIGINT) AS m FROM bi)
        |SELECT a, b, CAST(c_ab AS BIGINT) AS c_ab,
        |  CAST(round(round(ln((CAST(c_ab AS DOUBLE) / m) /
        |    ((CAST(ua.c AS DOUBLE) / n) * (CAST(ub.c AS DOUBLE) / n))), 6)
        |    * 1e6, 0) AS BIGINT) AS pmi_micro
        |FROM bi JOIN uni ua ON ua.t = bi.a JOIN uni ub ON ub.t = bi.b, un, bm
        |ORDER BY pmi_micro DESC, a, b LIMIT 20""".stripMargin))

  /** Token-entropy quality signal ([[graft.ops.TextAnalysis
    * .tokenEntropy]]): per-doc Shannon entropy + type-token ratio with
    * micro-quantized order-free contributions, replayed term-for-term.
    */
  val q164 = QueryDef("q164_token_entropy", (spark, dir) =>
    graft.ops.TextAnalysis.tokenEntropy(t(spark, dir, "documents"),
        "doc_id", "text")
      .orderBy("doc_id"),
    Some(
      """WITH tf AS (SELECT doc_id, t, count(*) AS c FROM
        |    (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
        |     FROM documents)
        |  WHERE t <> '' GROUP BY doc_id, t),
        |w AS (SELECT doc_id, t, c,
        |        CAST(sum(c) OVER (PARTITION BY doc_id) AS BIGINT) AS n
        |      FROM tf),
        |h AS (SELECT doc_id, n,
        |        CAST(round(round(-(CAST(c AS DOUBLE) / n) *
        |          ln(CAST(c AS DOUBLE) / n), 6) * 1e6, 0) AS BIGINT) AS hm
        |      FROM w)
        |SELECT doc_id, CAST(max(n) AS BIGINT) AS n_tokens,
        |  CAST(count(*) AS BIGINT) AS n_distinct,
        |  CAST(round(round(CAST(count(*) AS DOUBLE) / max(n), 6) * 1e6, 0)
        |    AS BIGINT) AS ttr_micro,
        |  CAST(sum(hm) AS BIGINT) AS entropy_micro
        |FROM h GROUP BY doc_id ORDER BY doc_id""".stripMargin))

  /** Equi-depth deciles ([[graft.ops.Stats.equiDepthBins]]) over
    * lineitem prices: edges at exact interpolated quantiles rounded to
    * 4 (Spark `percentile` == DuckDB `quantile_cont`, the q126
    * convention), lower-bucket tie rule replayed via the same
    * strict-greater edge count.
    */
  val q165 = QueryDef("q165_equidepth_bins", (spark, dir) =>
    graft.ops.Stats.equiDepthBins(t(spark, dir, "lineitem"),
        "l_extendedprice", bins = 10)
      .orderBy("bucket"),
    Some {
      val ps = (1 until 10).map(i => (i / 10.0).toString).mkString(", ")
      s"""WITH e AS (SELECT list_transform(
         |             quantile_cont(l_extendedprice, [$ps]),
         |             x -> round(x, 4)) AS edges
         |           FROM lineitem WHERE l_extendedprice IS NOT NULL),
         |b AS (SELECT l_extendedprice AS v,
         |        CAST(len(list_filter(e.edges, x -> l_extendedprice > x))
         |          AS BIGINT) AS bucket
         |      FROM lineitem, e WHERE l_extendedprice IS NOT NULL)
         |SELECT bucket, CAST(count(*) AS BIGINT) AS n,
         |  round(min(v), 4) AS lo_v, round(max(v), 4) AS hi_v
         |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin
    })

  /** Exact Pearson correlation matrix ([[graft.ops.Stats
    * .correlationMatrix]]) over lineitem quantity/price/discount: the
    * oracle replays the scaled-integer accumulators (HUGEINT sums ==
    * decimal sums), the identical double finalization, and the
    * degenerate-variance guard.
    */
  val q166 = QueryDef("q166_correlation_matrix", (spark, dir) =>
    graft.ops.Stats.correlationMatrix(t(spark, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount"))
      .orderBy("col_a", "col_b"),
    Some {
      val pairs = Seq(("l_quantity", "l_extendedprice"),
        ("l_quantity", "l_discount"), ("l_extendedprice", "l_discount"))
      val cells = pairs.map { case (a, b) =>
        s"""SELECT '$a' AS col_a, '$b' AS col_b, CAST(nn AS BIGINT) AS n,
           |  CASE WHEN
           |      CAST(nn AS DOUBLE) * CAST(saa AS DOUBLE) -
           |        CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) > 0 AND
           |      CAST(nn AS DOUBLE) * CAST(sbb AS DOUBLE) -
           |        CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) > 0
           |    THEN CAST(round(round(
           |      (CAST(nn AS DOUBLE) * CAST(sab AS DOUBLE) -
           |       CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE)) /
           |      sqrt((CAST(nn AS DOUBLE) * CAST(saa AS DOUBLE) -
           |            CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)) *
           |           (CAST(nn AS DOUBLE) * CAST(sbb AS DOUBLE) -
           |            CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))), 6)
           |      * 1e6, 0) AS BIGINT) END AS r_micro
           |FROM (SELECT
           |    CAST(count(*) FILTER (w) AS HUGEINT) AS nn,
           |    coalesce(sum(ua) FILTER (w), 0) AS sa,
           |    coalesce(sum(ub) FILTER (w), 0) AS sb,
           |    coalesce(sum(ua * ua) FILTER (w), 0) AS saa,
           |    coalesce(sum(ub * ub) FILTER (w), 0) AS sbb,
           |    coalesce(sum(ua * ub) FILTER (w), 0) AS sab
           |  FROM (SELECT
           |      CAST(round($a * 10000, 0) AS BIGINT) AS ua,
           |      CAST(round($b * 10000, 0) AS BIGINT) AS ub,
           |      $a IS NOT NULL AND $b IS NOT NULL AS w
           |    FROM lineitem))""".stripMargin
      }
      cells.mkString("", "\nUNION ALL\n", "\nORDER BY col_a, col_b")
    })

  /** Funnel conversion latency ([[graft.ops.Events.funnelLatency]]):
    * time-to-convert stats for view→click→purchase. The oracle extends
    * q115's chained-minima replay with exact integer latencies,
    * order-free means, and interpolated percentiles.
    */
  val q167 = QueryDef("q167_funnel_latency", (spark, dir) =>
    graft.ops.Events.funnelLatency(t(spark, dir, "events"),
        "user_id", "ts", "event_id", "event_type",
        Seq("view", "click", "purchase"))
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
        |      FROM w3 GROUP BY user_id),
        |lat AS (SELECT CAST(2 AS BIGINT) AS step_idx, 'click' AS step,
        |          t1 - t0 AS l FROM u WHERE t1 IS NOT NULL
        |        UNION ALL
        |        SELECT 3, 'purchase', t2 - t0 FROM u WHERE t2 IS NOT NULL)
        |SELECT step_idx, step, CAST(count(*) AS BIGINT) AS n_users,
        |  round(CAST(sum(l) AS DOUBLE) / count(*) / 1e6, 4) AS mean_s,
        |  round(quantile_cont(l, 0.5) / 1e6, 4) AS p50_s,
        |  round(quantile_cont(l, 0.9) / 1e6, 4) AS p90_s
        |FROM lat GROUP BY step_idx, step ORDER BY step_idx""".stripMargin))

  /** Top session paths ([[graft.ops.Events.topPaths]]): the 20 most
    * frequent gap-sessionized event-type sequences. The oracle replays
    * sessionization plus the ordered `string_agg` path render and the
    * (n, path) tie order.
    */
  val q168 = QueryDef("q168_top_paths", (spark, dir) =>
    graft.ops.Events.topPaths(t(spark, dir, "events"),
      "user_id", "ts", "event_id", "event_type",
      gapSeconds = 1800L, k = 20),
    Some(
      """WITH e AS (SELECT user_id, event_id, ts, event_type,
        |             epoch_us(ts) AS us FROM events),
        |l AS (SELECT *, lag(us) OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id) AS prev_us FROM e),
        |f AS (SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
        |                     THEN 1 ELSE 0 END AS brk FROM l),
        |s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |        AS sess FROM f),
        |p AS (SELECT user_id, sess,
        |        string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        |      FROM s GROUP BY user_id, sess)
        |SELECT path, CAST(count(*) AS BIGINT) AS n
        |FROM p GROUP BY path ORDER BY n DESC, path LIMIT 20""".stripMargin))

  /** Cohort LTV curves ([[graft.ops.Events.cohortValue]]): cumulative
    * per-user value by cohort and offset, exact scaled-integer event
    * sums under the cumulative window.
    */
  val q169 = QueryDef("q169_cohort_value", (spark, dir) =>
    graft.ops.Events.cohortValue(t(spark, dir, "events"),
        "user_id", "ts", "value")
      .orderBy("cohort", "offset_days"),
    Some(
      """WITH tagged AS (SELECT user_id, CAST(ts AS DATE) AS day,
        |    min(CAST(ts AS DATE)) OVER (PARTITION BY user_id) AS first_day,
        |    CAST(round(value * 10000, 0) AS BIGINT) AS u
        |  FROM events),
        |sz AS (SELECT first_day, CAST(count(*) AS BIGINT) AS n_users FROM
        |         (SELECT DISTINCT first_day, user_id FROM tagged)
        |       GROUP BY first_day),
        |grid AS (SELECT first_day,
        |           CAST(date_diff('day', first_day, day) AS INT) AS offset_days,
        |           CAST(sum(u) AS BIGINT) AS su
        |         FROM tagged GROUP BY 1, 2),
        |c AS (SELECT *, CAST(sum(su) OVER (PARTITION BY first_day
        |        ORDER BY offset_days
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |        AS cu FROM grid)
        |SELECT strftime(first_day, '%Y-%m-%d') AS cohort, offset_days, n_users,
        |  round(CAST(su AS DOUBLE) / 1e4, 2) AS value_sum,
        |  round(CAST(cu AS DOUBLE) / 1e4, 2) AS cum_value_sum,
        |  CAST(round(CAST(cu AS DOUBLE) * 100 / n_users, 0) AS BIGINT)
        |    AS cum_value_per_user_micro
        |FROM c JOIN sz USING (first_day)
        |ORDER BY cohort, offset_days""".stripMargin))

  /** RFM segmentation ([[graft.ops.Events.rfm]], as-of Jan 31): the
    * oracle replays the user contraction, all three exact quintile
    * edge lists, the ties-go-low scoring, and the digit-string
    * segment.
    */
  val q170 = QueryDef("q170_rfm_segments", (spark, dir) =>
    graft.ops.Events.rfm(t(spark, dir, "events"),
        "user_id", "ts", "value", asOf = "2024-01-31 00:00:00")
      .orderBy("user_id"),
    Some(
      """WITH pu AS (SELECT user_id,
        |    (epoch_us(TIMESTAMP '2024-01-31 00:00:00') - max(epoch_us(ts)))
        |      // 86400000000 AS recency_days,
        |    CAST(count(*) AS BIGINT) AS frequency,
        |    CAST(sum(CAST(round(value * 10000, 0) AS BIGINT)) AS BIGINT) AS m_u
        |  FROM events GROUP BY user_id),
        |pm AS (SELECT user_id, recency_days, frequency,
        |         round(CAST(m_u AS DOUBLE) / 1e4, 2) AS monetary FROM pu),
        |er AS (SELECT list_transform(
        |         quantile_cont(recency_days, [0.2, 0.4, 0.6, 0.8]),
        |         x -> round(x, 4)) AS e FROM pm),
        |ef AS (SELECT list_transform(
        |         quantile_cont(frequency, [0.2, 0.4, 0.6, 0.8]),
        |         x -> round(x, 4)) AS e FROM pm),
        |em AS (SELECT list_transform(
        |         quantile_cont(monetary, [0.2, 0.4, 0.6, 0.8]),
        |         x -> round(x, 4)) AS e FROM pm),
        |sc AS (SELECT user_id, recency_days, frequency, monetary,
        |         CAST(6 - (len(list_filter(er.e, x -> recency_days > x)) + 1)
        |           AS INT) AS r_score,
        |         CAST(len(list_filter(ef.e, x -> frequency > x)) + 1
        |           AS INT) AS f_score,
        |         CAST(len(list_filter(em.e, x -> monetary > x)) + 1
        |           AS INT) AS m_score
        |       FROM pm, er, ef, em)
        |SELECT *, CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR) ||
        |  CAST(m_score AS VARCHAR) AS segment
        |FROM sc ORDER BY user_id""".stripMargin))

  /** Trending terms ([[graft.ops.TextAnalysis.trendingTerms]]): the
    * corpus gets a synthetic ingest day (`doc_id % 10` days past
    * 2024-01-01 — documents carry no timestamp), and day-over-day term
    * growth ranks. The oracle replays the contraction, the
    * previous-OBSERVED-day lag, the support gate, and the
    * (growth, term, day) tie order.
    */
  val q171 = QueryDef("q171_trending_terms", (spark, dir) =>
    graft.ops.TextAnalysis.trendingTerms(
      t(spark, dir, "documents").withColumn("day",
        date_format(date_add(to_date(lit("2024-01-01")),
          (col("doc_id") % 10).cast("int")), "yyyy-MM-dd")),
      "text", "day", minCount = 5L, k = 20),
    Some(
      """WITH d AS (SELECT strftime(DATE '2024-01-01' +
        |             CAST(doc_id % 10 AS INT), '%Y-%m-%d') AS day, text
        |           FROM documents),
        |td AS (SELECT term, day, CAST(count(*) AS BIGINT) AS n FROM
        |         (SELECT day, unnest(string_split(lower(text), ' ')) AS term
        |          FROM d)
        |       WHERE term <> '' GROUP BY term, day),
        |l AS (SELECT *, lag(day) OVER (PARTITION BY term ORDER BY day)
        |        AS prev_day,
        |        lag(n) OVER (PARTITION BY term ORDER BY day) AS prev_n
        |      FROM td)
        |SELECT term, day, n, prev_day, prev_n,
        |  CAST(round(round(CAST(n AS DOUBLE) / prev_n, 6) * 1e6, 0) AS BIGINT)
        |    AS growth_micro
        |FROM l WHERE prev_n >= 5 AND n >= 5
        |ORDER BY growth_micro DESC, term, day LIMIT 20""".stripMargin))

  /** Co-visitation neighbors ([[graft.ops.Events.coVisitation]]) over
    * the event props' item key: distinct (user, item) self-join,
    * cosine normalization, per-item top-5. The oracle replays the
    * whole table including the per-user cap path.
    */
  val q172 = QueryDef("q172_covisitation", (spark, dir) =>
    graft.ops.Events.coVisitation(
        t(spark, dir, "events").select(col("user_id"),
          get_json_object(col("props"), "$.k").cast("long").as("item")),
        "user_id", "item", minPairCount = 2L, k = 5)
      .orderBy("item", "rank"),
    Some(
      """WITH p AS (SELECT DISTINCT user_id AS u,
        |             CAST(json_extract_string(props, '$.k') AS BIGINT) AS i
        |           FROM events),
        |capped AS (SELECT u, i FROM (
        |    SELECT *, row_number() OVER (PARTITION BY u ORDER BY i) AS rn
        |    FROM p) WHERE rn <= 1000),
        |itn AS (SELECT i, CAST(count(*) AS BIGINT) AS cn FROM capped GROUP BY i),
        |co AS (SELECT a.i AS x, b.i AS y, CAST(count(*) AS BIGINT) AS n_co
        |       FROM capped a JOIN capped b ON a.u = b.u AND a.i < b.i
        |       GROUP BY 1, 2 HAVING count(*) >= 2),
        |sym AS (SELECT x AS item, y AS neighbor, n_co FROM co
        |        UNION ALL SELECT y, x, n_co FROM co),
        |sc AS (SELECT s.item, s.neighbor, s.n_co,
        |         CAST(round(round(CAST(s.n_co AS DOUBLE) /
        |           sqrt(CAST(ca.cn AS DOUBLE) * cb.cn), 6) * 1e6, 0) AS BIGINT)
        |           AS sim_micro
        |       FROM sym s JOIN itn ca ON ca.i = s.item
        |       JOIN itn cb ON cb.i = s.neighbor),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY item
        |        ORDER BY sim_micro DESC, neighbor) AS INT) AS rank FROM sc)
        |SELECT item, neighbor, n_co, sim_micro, rank
        |FROM r WHERE rank <= 5 ORDER BY item, rank""".stripMargin))

  /** Lagged cross-correlation ([[graft.ops.Stats.crossCorrelation]]):
    * error-count vs purchase-count daily series at lags 0..7. The
    * oracle replays the lag join, exact HUGEINT accumulators, and the
    * identical double finalization per lag.
    */
  val q173 = QueryDef("q173_cross_correlation", (spark, dir) => {
    val ev = t(spark, dir, "events")
    def daily(tp: String) = ev.filter(col("event_type") === tp)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"))
    graft.ops.Stats.crossCorrelation(daily("error"), daily("purchase"),
        "day", "n", maxLag = 7)
      .orderBy("lag")
  }, Some(
    """WITH a AS (SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
      |             AS idx, CAST(count(*) AS BIGINT) AS v
      |           FROM events WHERE event_type = 'error' GROUP BY 1),
      |b AS (SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
      |        AS idx, CAST(count(*) AS BIGINT) AS v
      |      FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |lags AS (SELECT unnest(generate_series(0, 7)) AS lag),
      |j AS (SELECT lag,
      |        CAST(a.v * 10000 AS BIGINT) AS ua,
      |        CAST(b.v * 10000 AS BIGINT) AS ub
      |      FROM a CROSS JOIN lags JOIN b ON b.idx = a.idx + lag),
      |g AS (SELECT lag, CAST(count(*) AS BIGINT) AS n,
      |        CAST(sum(ua) AS HUGEINT) AS sa, CAST(sum(ub) AS HUGEINT) AS sb,
      |        CAST(sum(ua * ua) AS HUGEINT) AS saa,
      |        CAST(sum(ub * ub) AS HUGEINT) AS sbb,
      |        CAST(sum(ua * ub) AS HUGEINT) AS sab
      |      FROM j GROUP BY lag)
      |SELECT CAST(lag AS INT) AS lag, n,
      |  CASE WHEN
      |      CAST(n AS DOUBLE) * CAST(saa AS DOUBLE) -
      |        CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) > 0 AND
      |      CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE) -
      |        CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) > 0
      |    THEN CAST(round(round(
      |      (CAST(n AS DOUBLE) * CAST(sab AS DOUBLE) -
      |       CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE)) /
      |      sqrt((CAST(n AS DOUBLE) * CAST(saa AS DOUBLE) -
      |            CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)) *
      |           (CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE) -
      |            CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))), 6)
      |      * 1e6, 0) AS BIGINT) END AS r_micro
      |FROM g ORDER BY lag""".stripMargin))

  /** Key-skew report ([[graft.ops.Stats.keySkewReport]]): the heaviest
    * order keys in lineitem with shares and the table skew ratio — the
    * pre-join salting diagnostic, hash-gated.
    */
  val q174 = QueryDef("q174_key_skew", (spark, dir) =>
    graft.ops.Stats.keySkewReport(t(spark, dir, "lineitem"),
        "l_orderkey", topN = 10)
      .orderBy(col("n").desc, col("key")),
    Some(
      """WITH g AS (SELECT l_orderkey AS key, CAST(count(*) AS BIGINT) AS n
        |           FROM lineitem GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS rws,
        |        CAST(count(*) AS BIGINT) AS grps,
        |        CAST(max(n) AS BIGINT) AS mx FROM g)
        |SELECT key, n,
        |  CAST(round(round(CAST(n AS DOUBLE) / rws, 6) * 1e6, 0) AS BIGINT)
        |    AS share_micro,
        |  CAST(round(round(CAST(mx AS DOUBLE) * grps / rws, 6) * 1e6, 0)
        |    AS BIGINT) AS skew_ratio_micro
        |FROM g, t ORDER BY n DESC, key LIMIT 10""".stripMargin))

  /** Fuzzy entity dedup ([[graft.ops.Dedup.dropFuzzyKeyDuplicates]]):
    * every 5th part gets a one-character-typo twin under a shifted key;
    * blocked levenshtein matching (prefix + length-bucket blocking,
    * adjacent-bucket probing) must drop the twins. The oracle replays
    * blocking, probing orientation, the edit-distance confirm, and the
    * keep-first anti-join.
    */
  val q175 = QueryDef("q175_fuzzy_entity_dedup", (spark, dir) => {
    val part = t(spark, dir, "part").select("p_partkey", "p_name")
    val twins = part.filter(col("p_partkey") % 5 === 0)
      .select((col("p_partkey") + 100000).as("p_partkey"),
        concat(substring(col("p_name"), 1, 5), lit("x"),
          substring(col("p_name"), 7, 100000)).as("p_name"))
    graft.ops.Dedup.dropFuzzyKeyDuplicates(part.unionByName(twins),
        "p_partkey", "p_name", maxDistance = 1)
      .orderBy("p_partkey")
  }, Some(
    """WITH allp AS (SELECT p_partkey, p_name FROM part
      |  UNION ALL
      |  SELECT p_partkey + 100000,
      |         substr(p_name, 1, 5) || 'x' || substr(p_name, 7)
      |  FROM part WHERE p_partkey % 5 = 0),
      |b AS (SELECT p_partkey AS id, p_name,
      |        trim(regexp_replace(lower(p_name), '\s+', ' ', 'g')) AS nk
      |      FROM allp),
      |reps AS (SELECT nk, min(id) AS rid FROM b GROUP BY nk),
      |r2 AS (SELECT nk, rid, substr(nk, 1, 4) AS pfx,
      |         CAST(floor(len(nk) / 2.0) AS BIGINT) AS lb FROM reps),
      |sized AS (SELECT * FROM r2
      |          QUALIFY count(*) OVER (PARTITION BY pfx, lb) <= 10000),
      |pairs AS (SELECT least(x.rid, y.rid) AS a_id,
      |            greatest(x.rid, y.rid) AS b_id,
      |            levenshtein(x.nk, y.nk) AS dist
      |          FROM sized x JOIN sized y
      |            ON x.pfx = y.pfx
      |           AND ((y.lb = x.lb AND x.rid < y.rid) OR y.lb = x.lb + 1)),
      |drops AS (SELECT DISTINCT b_id FROM pairs WHERE dist <= 1)
      |SELECT b.id AS p_partkey, b.p_name FROM b JOIN reps ON reps.nk = b.nk
      |WHERE b.id = reps.rid
      |  AND reps.rid NOT IN (SELECT b_id FROM drops)
      |ORDER BY p_partkey""".stripMargin))

  /** Weekday-seasonal volume anomaly ([[graft.ops.Stats
    * .ewmaAnomalyDaily]] at stride 7, horizon 21): a Monday is judged
    * only against prior Mondays — the weekly-rhythm-aware variant of
    * q144. The oracle replays the strided lag set and stride-step
    * weights.
    */
  val q176 = QueryDef("q176_weekday_anomaly", (spark, dir) =>
    graft.ops.Stats.ewmaAnomalyDaily(
        t(spark, dir, "events")
          .groupBy(col("event_type"),
            date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .agg(count(lit(1)).as("n")),
        "event_type", "day", "n",
        horizonDays = 21, ratio = 2L, strideDays = 7)
      .orderBy("event_type", "day"),
    Some(
      """WITH daily AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
        |                 CAST(count(*) AS BIGINT) AS n
        |               FROM events GROUP BY 1, 2),
        |d2 AS (SELECT *, date_diff('day', DATE '1970-01-01', CAST(day AS DATE))
        |         AS idx FROM daily),
        |j AS (SELECT c.event_type, c.day, c.n,
        |        CAST(sum(p.n * (1::BIGINT << (3 - (c.idx - p.idx) // 7)))
        |          AS BIGINT) AS wsum,
        |        CAST(sum(1::BIGINT << (3 - (c.idx - p.idx) // 7)) AS BIGINT)
        |          AS wtot
        |      FROM d2 c LEFT JOIN d2 p
        |        ON p.event_type = c.event_type
        |       AND p.idx >= c.idx - 21 AND p.idx <= c.idx - 1
        |       AND (c.idx - p.idx) % 7 = 0
        |      GROUP BY c.event_type, c.day, c.n),
        |fin AS (SELECT event_type, day, n,
        |          CAST(round(round(CAST(wsum AS DOUBLE) / wtot, 6) * 1e6, 0)
        |            AS BIGINT) AS pred_micro
        |        FROM j)
        |SELECT event_type, day, n, pred_micro,
        |  coalesce(n * 1000000 > 2 * pred_micro, FALSE) AS is_anomaly
        |FROM fin ORDER BY event_type, day""".stripMargin))

  /** Referential integrity ([[graft.ops.Checks.referentialIntegrity]]):
    * lineitem→orders is clean in the corpus, so orphans are PLANTED
    * (every %13 lineitem re-pointed past the key space) — the audit
    * must count exactly them.
    */
  val q177 = QueryDef("q177_referential_integrity", (spark, dir) => {
    val li = t(spark, dir, "lineitem")
      .withColumn("l_orderkey",
        when(col("l_linenumber") % 13 === 0, col("l_orderkey") + 90000000L)
          .otherwise(col("l_orderkey")))
    graft.ops.Checks.referentialIntegrity(li, t(spark, dir, "orders"),
      "l_orderkey", "o_orderkey")
  }, Some(
    """WITH li AS (SELECT CASE WHEN l_linenumber % 13 = 0
      |                        THEN l_orderkey + 90000000
      |                        ELSE l_orderkey END AS k
      |            FROM lineitem),
      |ck AS (SELECT k, CAST(count(*) AS BIGINT) AS n FROM li GROUP BY k),
      |pk AS (SELECT DISTINCT o_orderkey AS k, 1 AS hit FROM orders),
      |j AS (SELECT ck.n, pk.hit FROM ck LEFT JOIN pk USING (k))
      |SELECT CAST(sum(n) AS BIGINT) AS n_child,
      |  CAST(count(*) AS BIGINT) AS n_child_keys,
      |  CAST(coalesce(sum(n) FILTER (hit IS NULL), 0) AS BIGINT) AS n_orphans,
      |  CAST(count(*) FILTER (hit IS NULL) AS BIGINT) AS n_orphan_keys,
      |  CAST(round(round(CAST(coalesce(sum(n) FILTER (hit IS NULL), 0)
      |    AS DOUBLE) / sum(n), 6) * 1e6, 0) AS BIGINT) AS orphan_rate_micro,
      |  coalesce(sum(n) FILTER (hit IS NULL), 0) = 0 AS ok
      |FROM j""".stripMargin))

  val all: Seq[QueryDef] = Seq(q142, q143, q144, q145, q146, q147,
    q148, q149, q150, q151, q152, q153, q154, q155, q156, q157,
    q158, q159, q160, q161, q162, q163, q164, q165, q166, q167, q168,
    q169, q170, q171, q172, q173, q174, q175, q176, q177)
}
