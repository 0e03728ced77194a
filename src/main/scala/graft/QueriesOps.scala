package graft

import org.apache.spark.sql.functions._
import graft.Queries.QueryDef
import graft.core.Tables
import graft.ops.{Joins, Multimodal, Scd, Similarity, Skew, Sketches, Stats, TextAnalysis}

/** Warehouse/scale operators behind the hash gate: SCD2 dimension merge,
  * bloom-pruned joins, exact heavy hitters via Misra-Gries candidates.
  * Oracle conventions as elsewhere: deterministic ORDER BY, rounded
  * doubles, BIGINT counts, dates as strings.
  */
object QueriesOps {

  private def t(spark: org.apache.spark.sql.SparkSession, dir: String, name: String) =
    Tables.load(spark, dir, name)

  /** Type-2 SCD merge: the customer dimension (open rows for every key +
    * pre-existing closed history for every 10th) folds in a snapshot that
    * changes every 3rd segment, repeats every (3k+1)th unchanged, and
    * introduces new keys — exercising all four merge outcomes (close+
    * insert / unchanged / insert-new / absent-untouched) in one run. The
    * oracle replays the merge relationally (FULL OUTER JOIN + UNION ALL).
    */
  val q75 = QueryDef("q75_scd2_merge", (spark, dir) => {
    val c = t(spark, dir, "customer")
    val open = c.select(col("c_custkey"), col("c_mktsegment").as("seg"),
      lit("2023-01-01").as("valid_from"), lit(null).cast("string").as("valid_to"))
    val hist = c.filter(col("c_custkey") % 10 === 0)
      .select(col("c_custkey"), lit("OLD").as("seg"),
        lit("2022-01-01").as("valid_from"), lit("2023-01-01").as("valid_to"))
    val dim = open.unionByName(hist)
    val snap = c.filter(col("c_custkey") % 3 === 0)
      .select(col("c_custkey"), concat(col("c_mktsegment"), lit("_V2")).as("seg"))
      .unionByName(c.filter(col("c_custkey") % 3 === 1)
        .select(col("c_custkey"), col("c_mktsegment").as("seg")))
      .unionByName(c.filter(col("c_custkey") % 7 === 0)
        .select((col("c_custkey") + 1000000L).as("c_custkey"), lit("NEWSEG").as("seg")))
    Scd.scd2Merge(dim, snap, Seq("c_custkey"), Seq("seg"), "2024-06-01")
      .orderBy(col("c_custkey"), col("valid_from"),
        coalesce(col("valid_to"), lit("9999-12-31")))
  }, Some(
    """WITH dim AS (
      |  SELECT c_custkey, c_mktsegment AS seg, '2023-01-01' AS valid_from,
      |         CAST(NULL AS VARCHAR) AS valid_to FROM customer
      |  UNION ALL
      |  SELECT c_custkey, 'OLD', '2022-01-01', '2023-01-01'
      |  FROM customer WHERE c_custkey % 10 = 0),
      |snap AS (
      |  SELECT c_custkey, c_mktsegment || '_V2' AS seg FROM customer WHERE c_custkey % 3 = 0
      |  UNION ALL
      |  SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 3 = 1
      |  UNION ALL
      |  SELECT c_custkey + 1000000, 'NEWSEG' FROM customer WHERE c_custkey % 7 = 0),
      |hist AS (SELECT * FROM dim WHERE valid_to IS NOT NULL),
      |cur AS (SELECT * FROM dim WHERE valid_to IS NULL),
      |j AS (SELECT cur.c_custkey AS ck, cur.seg AS cseg, cur.valid_from AS cvf,
      |             snap.c_custkey AS sk, snap.seg AS sseg
      |      FROM cur FULL OUTER JOIN snap ON cur.c_custkey = snap.c_custkey),
      |merged AS (
      |  SELECT ck AS c_custkey, cseg AS seg, cvf AS valid_from,
      |         CAST(NULL AS VARCHAR) AS valid_to
      |  FROM j WHERE ck IS NOT NULL AND (sk IS NULL OR cseg IS NOT DISTINCT FROM sseg)
      |  UNION ALL
      |  SELECT ck, cseg, cvf, '2024-06-01' FROM j
      |  WHERE ck IS NOT NULL AND sk IS NOT NULL AND cseg IS DISTINCT FROM sseg
      |  UNION ALL
      |  SELECT sk, sseg, '2024-06-01', CAST(NULL AS VARCHAR) FROM j
      |  WHERE sk IS NOT NULL AND (ck IS NULL OR cseg IS DISTINCT FROM sseg)
      |  UNION ALL
      |  SELECT * FROM hist)
      |SELECT c_custkey, seg, valid_from, valid_to FROM merged
      |ORDER BY c_custkey, valid_from, coalesce(valid_to, '9999-12-31')""".stripMargin))

  /** Bloom-pruned fact→dim join: lineitem pruned through a bloom of the
    * urgent/high order keys before joining. Blooms admit no false
    * negatives and the join drops false positives, so the result must
    * hash-match the plain relational join.
    */
  val q76 = QueryDef("q76_bloom_join", (spark, dir) => {
    val li = t(spark, dir, "lineitem")
    val dim = t(spark, dir, "orders")
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .select("o_orderkey", "o_orderpriority")
    Joins.bloomPrunedJoin(li, dim, "l_orderkey", "o_orderkey",
        expectedItems = 1000000L, fpp = 0.01)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice")), 2).as("total"))
      .orderBy("o_orderpriority")
  }, Some(
    """SELECT o_orderpriority, count(*) AS n_items,
      |  round(sum(l_extendedprice), 2) AS total
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))

  /** Exact heavy hitters over the document token stream (q17's
    * tokenization): Misra-Gries candidates + exact recount must equal the
    * full GROUP BY ... HAVING answer exactly — the sketch only bounds the
    * candidate set, never the counts.
    */
  val q77 = QueryDef("q77_heavy_hitters", (spark, dir) => {
    val toks = t(spark, dir, "documents")
      .select(explode(split(lower(col("text")), " ")).as("tok"))
      .filter(col("tok") =!= "")
    Sketches.heavyHitters(toks, "tok", phi = 0.01).orderBy("tok")
  }, Some(
    """WITH toks AS (
      |  SELECT tok FROM (
      |    SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents)
      |  WHERE tok <> '')
      |SELECT tok, count(*) AS cnt FROM toks GROUP BY tok
      |HAVING count(*) >= (SELECT ceil(0.01 * count(*)) FROM toks)
      |ORDER BY tok""".stripMargin))

  /** Unigram-LM document scoring (the cheap CCNet perplexity filter):
    * corpus-trained add-one unigram probabilities, mean token
    * log-probability and perplexity per document. The oracle retrains the
    * identical model in SQL — same vocabulary counts, same smoothing,
    * same natural log.
    */
  val q78 = QueryDef("q78_unigram_lm", (spark, dir) =>
    TextAnalysis.unigramLmScore(t(spark, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id"),
    Some(
      """WITH toks AS (
        |  SELECT doc_id, tok FROM (
        |    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
        |    FROM documents)
        |  WHERE tok <> ''),
        |vocab AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
        |tot AS (SELECT sum(c) AS n, count(*) AS v FROM vocab),
        |lp AS (SELECT doc_id, ln((c + 1.0) / (n + 1.0 * v)) AS lp
        |       FROM toks JOIN vocab USING (tok) CROSS JOIN tot)
        |SELECT doc_id, count(*) AS n_tokens, round(avg(lp), 4) AS avg_logprob,
        |  round(exp(-avg(lp)), 2) AS ppl
        |FROM lp GROUP BY doc_id ORDER BY doc_id""".stripMargin))

  /** Int8 embedding quantization: per-vector scale, quantized values,
    * and L2 reconstruction error. The hash gate compares the scale, the
    * EXACT integer digests of the quantized vector (sum and sum of
    * squares — integer arithmetic, no float tolerance), and the rounded
    * reconstruction error; the oracle requantizes in SQL with the same
    * round-half-up and ordered folds.
    */
  val q79 = QueryDef("q79_quantize_int8", (spark, dir) => {
    val q = Similarity.quantizeInt8(t(spark, dir, "embeddings"),
      "vec_id", "embedding")
    q.select(col("vec_id"), col("scale"),
        size(col("qvec")).cast("long").as("dim"),
        aggregate(col("qvec"), lit(0L), (a, v) => a + v.cast("long")).as("qsum"),
        aggregate(col("qvec"), lit(0L),
          (a, v) => a + v.cast("long") * v.cast("long")).as("qssq"),
        col("recon_err"))
      .orderBy("vec_id")
  }, Some(
    """WITH q AS (
      |  SELECT vec_id, embedding,
      |    list_max(list_transform(embedding, x -> abs(x::DOUBLE))) / 127.0 AS s
      |  FROM embeddings),
      |qq AS (
      |  SELECT vec_id, s,
      |    CASE WHEN s = 0 THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
      |         ELSE list_transform(embedding,
      |                x -> CAST(round(x::DOUBLE / s) AS BIGINT)) END AS qvec,
      |    embedding
      |  FROM q)
      |SELECT vec_id, round(s, 8) AS scale, len(qvec) AS dim,
      |  CAST(list_sum(qvec) AS BIGINT) AS qsum,
      |  CAST(list_sum(list_transform(qvec, v -> v * v)) AS BIGINT) AS qssq,
      |  round(sqrt(list_sum(list_transform(list_zip(embedding, qvec),
      |    p -> (p[1]::DOUBLE - p[2] * s) * (p[1]::DOUBLE - p[2] * s)))), 6)
      |    AS recon_err
      |FROM qq ORDER BY vec_id""".stripMargin))

  /** Multimodal feature extraction: byte-block mean features from the
    * binary payload (documents' UTF-8 bytes standing in for media), the
    * partition-local decode→vector seam. The oracle re-derives every
    * byte from `hex(payload)` in SQL and recomputes the identical block
    * means — integer sums and counts, so the doubles agree exactly.
    */
  val q80 = QueryDef("q80_multimodal_features", (spark, dir) => {
    val p = t(spark, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    // Zero-byte payloads are excluded on BOTH sides: extractFeatures
    // emits an all-zero row for them, but the oracle's generate_series
    // over 0 bytes produces no rows — filtering keeps the hash aligned.
    Multimodal.extractFeatures(p, "doc_id", "payload", dim = 8)
      .filter(col("n_bytes") > 0)
      .select(col("doc_id"), col("n_bytes"),
        round(element_at(col("features"), 1), 4).as("f0"),
        round(element_at(col("features"), 4), 4).as("f3"),
        round(element_at(col("features"), 8), 4).as("f7"))
      .orderBy("doc_id")
  }, Some(
    """WITH p AS (SELECT doc_id, encode(text) AS b FROM documents),
      |h AS (SELECT doc_id, hex(b) AS hx, octet_length(b) AS n FROM p
      |      WHERE octet_length(b) > 0),
      |byte AS (
      |  SELECT doc_id, n, i, CAST('0x' || substr(hx, 2 * i + 1, 2) AS INT) AS v
      |  FROM (SELECT doc_id, hx, n, unnest(generate_series(0, n - 1)) AS i
      |        FROM h)),
      |blk AS (SELECT doc_id, n,
      |          CAST(floor(i / CAST(ceil(n / 8.0) AS INT)) AS INT) AS j, v
      |        FROM byte),
      |feats AS (SELECT doc_id, n, j, sum(v)::DOUBLE / count(*) AS f
      |          FROM blk GROUP BY 1, 2, 3)
      |SELECT doc_id, CAST(n AS BIGINT) AS n_bytes,
      |  round(coalesce(max(CASE WHEN j = 0 THEN f END), 0), 4) AS f0,
      |  round(coalesce(max(CASE WHEN j = 3 THEN f END), 0), 4) AS f3,
      |  round(coalesce(max(CASE WHEN j = 7 THEN f END), 0), 4) AS f7
      |FROM feats GROUP BY doc_id, n ORDER BY doc_id""".stripMargin))

  /** Dataset-card statistics (per-language doc/token/char totals + mean
    * quality) via the YAML-reachable `CorpusStatsJob`. The quality SQL is
    * the shared q33/q62 fragment, so the card can never diverge from the
    * quality gate it summarizes.
    */
  val q81 = QueryDef("q81_corpus_stats", (spark, dir) =>
    new graft.jobs.CorpusStatsJob().transform(
      Map("documents" -> t(spark, dir, "documents")), spark, Map.empty),
    Some(
      s"""WITH q AS (${QueriesScale.duckQualityScored()})
         |SELECT d.lang AS grp, count(*) AS n_docs,
         |  CAST(sum(len(string_split(lower(d.text), ' '))) AS BIGINT)
         |    AS total_tokens,
         |  CAST(sum(length(d.text)) AS BIGINT) AS total_chars,
         |  round(avg(q.quality), 4) AS mean_quality
         |FROM documents d JOIN q USING (doc_id)
         |GROUP BY d.lang ORDER BY grp""".stripMargin))

  /** Exact equi-width histogram of lineitem prices: 16 × 5000-wide
    * buckets with edge clamping — the one-pass distribution shape check
    * run before gating on any score. Bucket math is pure double
    * arithmetic with an exact width, replayed identically in SQL.
    */
  val q82 = QueryDef("q82_histogram", (spark, dir) =>
    Stats.histogram(t(spark, dir, "lineitem"), "l_extendedprice",
      lo = 0.0, hi = 80000.0, bins = 16).orderBy("bucket"),
    Some(
      """SELECT bucket, round(bucket * 5000.0, 6) AS lo_edge,
        |  round((bucket + 1) * 5000.0, 6) AS hi_edge, count(*) AS cnt
        |FROM (SELECT CAST(least(greatest(floor(l_extendedprice / 5000.0), 0),
        |                        15) AS BIGINT) AS bucket
        |      FROM lineitem WHERE l_extendedprice IS NOT NULL)
        |GROUP BY bucket ORDER BY bucket""".stripMargin))

  /** Grouped numeric profile with scaled-integer-exact sums: mean and
    * population stddev are pure functions of the value multiset (a
    * double sum's order drift would flicker the rounded stddev at 1e8
    * magnitudes). The oracle accumulates the same scaled integers.
    */
  val q83 = QueryDef("q83_profile", (spark, dir) =>
    Stats.profile(t(spark, dir, "lineitem"), "l_returnflag",
      "l_extendedprice").orderBy("grp"),
    Some(
      """WITH d AS (SELECT l_returnflag AS grp,
        |             CAST(l_extendedprice AS DECIMAL(18,4)) AS v
        |           FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |u AS (SELECT grp, v, CAST(v * 10000 AS BIGINT) AS uv FROM d)
        |SELECT grp, count(*) AS cnt,
        |  round(CAST(min(v) AS DOUBLE), 4) AS min_v,
        |  round(CAST(max(v) AS DOUBLE), 4) AS max_v,
        |  round(CAST(sum(uv) AS DOUBLE) / 1e4 / count(*), 4) AS mean_v,
        |  round(sqrt(CAST(sum(CAST(uv AS HUGEINT) * uv) AS DOUBLE) / 1e8 / count(*)
        |    - (CAST(sum(uv) AS DOUBLE) / 1e4 / count(*))
        |      * (CAST(sum(uv) AS DOUBLE) / 1e4 / count(*))), 4) AS stddev_pop
        |FROM u GROUP BY grp ORDER BY grp""".stripMargin))

  /** Skew-relief salted join behind the hash gate: lineitem→supplier
    * through [[Skew.saltedJoin]] (big side salted by a deterministic
    * row hash, small side replicated `factor`×), aggregated per nation —
    * must equal the plain join the oracle runs. Only the shuffle
    * distribution may differ from an unsalted join, never the rows.
    */
  val q95 = QueryDef("q95_salted_join", (spark, dir) => {
    val li = t(spark, dir, "lineitem")
      .select(col("l_suppkey").as("suppkey"), col("l_quantity"))
    val sup = t(spark, dir, "supplier")
      .select(col("s_suppkey").as("suppkey"), col("s_nationkey"))
    Skew.saltedJoin(li, sup, Seq("suppkey"), factor = 8)
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
      .orderBy("s_nationkey")
  }, Some(
    """SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n,
      |       round(sum(l_quantity), 2) AS sum_qty
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin))

  /** Incremental dataset-card maintenance behind the hash gate: the
    * corpus split into two disjoint ingest batches, each reduced to its
    * MERGEABLE partial ([[Stats.profilePartial]]), merged
    * ([[Stats.profileMerge]]) — and held to the SAME DuckDB oracle as
    * q83's full-corpus profile. The decimal-exact accumulators are what
    * make this a hash-level (not approximate) equality.
    */
  val q94 = QueryDef("q94_profile_merge", (spark, dir) => {
    val li = t(spark, dir, "lineitem")
    val parts = Seq(0, 1).map(i =>
      Stats.profilePartial(li.filter(col("l_orderkey") % 2 === i),
        "l_returnflag", "l_extendedprice"))
    Stats.profileMerge(parts.reduce(_ unionByName _)).orderBy("grp")
  }, q83.oracle)


  /** Watermarked STREAM-STREAM join held to the batch-join oracle: click
    * events within the 4 hours before a purchase by the same user,
    * replayed through two file streams into
    * [[graft.streaming.Streams.streamJoin]]. An inner stream-stream join
    * emits matches as they arrive (the watermark only bounds join
    * state), and the whole fixture lands in one micro-batch, so the
    * emitted pair set must equal DuckDB's batch join row for row.
    */
  val q84 = QueryDef("q84_stream_stream_join", (spark, dir) => {
    val out = Queries.tmpDir("graft_q84")
    val ev = t(spark, dir, "events")
      .select("event_id", "ts", "user_id", "event_type")
    ev.filter(col("event_type") === "purchase").write.parquet(s"$out/purchase")
    ev.filter(col("event_type") === "click").write.parquet(s"$out/click")
    def stream(sub: String, idAs: String, tsAs: String) =
      graft.streaming.Streams.readFileStream(spark,
          graft.core.model.DatasetSpec(path = s"$out/$sub", format = "parquet"),
          "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING")
        .select(col("event_id").as(idAs), col("ts").as(tsAs), col("user_id"))
    val joined = graft.streaming.Streams.streamJoin(
      stream("purchase", "purchase_id", "p_ts"),
      stream("click", "click_id", "c_ts"),
      key = "user_id", leftTs = "p_ts", rightTs = "c_ts",
      watermarkDelay = "1 hour", within = "4 hours")
    val sink = s"q84_sink_${System.nanoTime}"
    // state keyed by ~150 user_ids — 8 state partitions, not the batch 32
    graft.streaming.Streams.withStatePartitions(spark, 8) {
      val q = joined.writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    spark.table(sink).select("purchase_id", "click_id", "user_id")
      .orderBy("purchase_id", "click_id")
  }, Some(
    """WITH p AS (SELECT event_id AS purchase_id, ts AS p_ts, user_id
      |          FROM events WHERE event_type = 'purchase'),
      |     c AS (SELECT event_id AS click_id, ts AS c_ts, user_id
      |          FROM events WHERE event_type = 'click')
      |SELECT p.purchase_id, c.click_id, p.user_id
      |FROM p JOIN c ON p.user_id = c.user_id
      |  AND c.c_ts >= p.p_ts - INTERVAL 4 HOUR AND c.c_ts <= p.p_ts
      |ORDER BY purchase_id, click_id""".stripMargin))

  /** Dataset-card distribution section via the YAML-reachable
    * `CorpusCardJob`: the quality histogram and per-language quality
    * profile in one long-format frame, replayed by the oracle from the
    * SAME shared quality fragment as q33/q62/q81 plus the q82/q83
    * scaled-integer conventions.
    */
  val q85 = QueryDef("q85_corpus_card", (spark, dir) =>
    new graft.jobs.CorpusCardJob().transform(
      Map("documents" -> t(spark, dir, "documents")), spark, Map.empty),
    Some(
      s"""WITH q AS (${QueriesScale.duckQualityScored()}),
         |b AS (SELECT CAST(least(greatest(floor(quality / 0.1), 0), 9)
         |        AS BIGINT) AS bucket
         |      FROM q WHERE quality IS NOT NULL),
         |hist AS (SELECT 'quality_hist' AS section,
         |    CAST(bucket AS VARCHAR) AS k, count(*) AS cnt,
         |    round(bucket * 0.1, 6) AS v1, round((bucket + 1) * 0.1, 6) AS v2,
         |    CAST(NULL AS DOUBLE) AS v3, CAST(NULL AS DOUBLE) AS v4
         |  FROM b GROUP BY bucket),
         |d AS (SELECT dd.lang AS grp, CAST(q.quality AS DECIMAL(18,4)) AS v
         |      FROM documents dd JOIN q USING (doc_id)
         |      WHERE q.quality IS NOT NULL),
         |u AS (SELECT grp, v, CAST(v * 10000 AS BIGINT) AS uv FROM d),
         |prof AS (SELECT 'quality_profile' AS section,
         |    CAST(grp AS VARCHAR) AS k, count(*) AS cnt,
         |    round(CAST(min(v) AS DOUBLE), 4) AS v1,
         |    round(CAST(max(v) AS DOUBLE), 4) AS v2,
         |    round(CAST(sum(uv) AS DOUBLE) / 1e4 / count(*), 4) AS v3,
         |    round(sqrt(CAST(sum(CAST(uv AS HUGEINT) * uv) AS DOUBLE) / 1e8
         |        / count(*)
         |      - (CAST(sum(uv) AS DOUBLE) / 1e4 / count(*))
         |        * (CAST(sum(uv) AS DOUBLE) / 1e4 / count(*))), 4) AS v4
         |  FROM u GROUP BY grp)
         |SELECT * FROM hist UNION ALL SELECT * FROM prof
         |ORDER BY section, k""".stripMargin))

  val all: Seq[QueryDef] = Seq(q75, q76, q77, q78, q79, q80, q81, q82, q83,
    q84, q85, q94, q95)
}
