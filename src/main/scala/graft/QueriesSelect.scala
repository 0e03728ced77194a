package graft

import org.apache.spark.sql.functions._
import graft.Queries.QueryDef
import graft.core.Tables
import graft.ops.{Dedup, Dsir, Pq, QualityClassifier, Similarity}

/** Round-6 data-selection operators behind the hash gate: dedup-grain
  * text canonicalization and DSIR importance resampling. Oracles replay
  * the identical arithmetic in DuckDB (QueriesScale conventions:
  * deterministic ORDER BY, BIGINT counts, md5-derived portable hashes,
  * micro-unit quantized log terms for order-free sums).
  */
object QueriesSelect {

  private def t(spark: org.apache.spark.sql.SparkSession, dir: String, name: String) =
    Tables.load(spark, dir, name)

  /** Normalized exact dedup ([[Dedup.dedupExactNormalized]]): every 3rd
    * doc gets a re-rendered copy — upper-cased, re-punctuated, different
    * numeric run, extra whitespace — that raw-byte dedup would keep and
    * the canonical form collapses. Survivors must be the original ids
    * with copy counts; `norm_len` pins the canonical form itself.
    */
  val q103 = QueryDef("q103_normalized_dedup", (spark, dir) => {
    val docs = t(spark, dir, "documents").select("doc_id", "text")
    val base = docs.select(col("doc_id"),
      concat(col("text"), lit(" 7 items.")).as("text"))
    val copies = docs.filter(col("doc_id") % 3 === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        concat(upper(col("text")), lit("   777 ITEMS !!")).as("text"))
    Dedup.dedupExactNormalized(base.unionByName(copies), "doc_id", "text")
      .select(col("doc_id"), col("n_copies"),
        length(graft.functions.TextFunctions.normalizeForDedup(col("text")))
          .cast("long").as("norm_len"))
      .orderBy("doc_id")
  }, Some(
    """WITH corpus AS (
      |  SELECT doc_id, text || ' 7 items.' AS text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000, upper(text) || '   777 ITEMS !!'
      |  FROM documents WHERE doc_id % 3 = 0),
      |n AS (SELECT doc_id,
      |        trim(regexp_replace(regexp_replace(regexp_replace(lower(text),
      |          '[^a-z0-9\s]', ' ', 'g'), '[0-9]+', '0', 'g'),
      |          '\s+', ' ', 'g')) AS nt
      |      FROM corpus),
      |g AS (SELECT md5(nt) AS fp, min(doc_id) AS doc_id,
      |        count(*) AS n_copies
      |      FROM n GROUP BY fp)
      |SELECT g.doc_id, g.n_copies,
      |  CAST(length(n.nt) AS BIGINT) AS norm_len
      |FROM g JOIN n ON n.doc_id = g.doc_id
      |ORDER BY g.doc_id""".stripMargin))

  /** DSIR importance resampling ([[Dsir]]): target = the `doc_id % 37`
    * slice (a stand-in domain corpus), raw = all documents; hashed-bigram
    * LMs at 512 buckets, Gumbel-top-100 selection. Everything — the
    * portable bucket hash, the micro-quantized smoothed log-probs, the
    * exact integer weight sums, the hash-derived Gumbel keys, the ranked
    * selection — replays in SQL, so the hash gate pins the SELECTED SET,
    * not just the scores.
    */
  val q104 = QueryDef("q104_dsir_select", (spark, dir) => {
    val docs = t(spark, dir, "documents").select("doc_id", "text")
    val target = docs.filter(col("doc_id") % 37 === 0)
    val targetLm = Dsir.fitHashedLm(target, "text", n = 2, buckets = 512)
    val rawLm = Dsir.fitHashedLm(docs, "text", n = 2, buckets = 512)
    val w = Dsir.importanceWeights(docs, "doc_id", "text",
      targetLm, rawLm, n = 2, buckets = 512)
    Dsir.gumbelTopK(w, "doc_id", k = 100)
      .select(col("doc_id"), col("n_grams"), col("key_micro"),
        round(col("log_w"), 6).as("log_w"), col("rank"))
      .orderBy("rank")
  }, Some(
    """WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS l
      |              FROM documents),
      |pos AS (SELECT doc_id, l, unnest(generate_series(1, len(l) - 1)) AS i
      |        FROM toks WHERE len(l) >= 2),
      |g AS (SELECT doc_id,
      |        CAST('0x' || substr(md5('dsir' || l[i] || ' ' || l[i+1]), 1, 15)
      |             AS BIGINT) % 512 AS bucket
      |      FROM pos),
      |tc AS (SELECT bucket, count(*) AS cnt FROM g
      |       WHERE doc_id % 37 = 0 GROUP BY bucket),
      |rc AS (SELECT bucket, count(*) AS cnt FROM g GROUP BY bucket),
      |tt AS (SELECT coalesce(sum(cnt), 0) AS total FROM tc),
      |rt AS (SELECT coalesce(sum(cnt), 0) AS total FROM rc),
      |buckets AS (SELECT unnest(generate_series(0, 511)) AS bucket),
      |tlm AS (SELECT b.bucket,
      |          CAST(round(round(ln((coalesce(tc.cnt, 0) + 1.0) /
      |            (tt.total + 512.0)), 6) * 1e6, 0) AS BIGINT) AS lp
      |        FROM buckets b LEFT JOIN tc USING (bucket), tt),
      |rlm AS (SELECT b.bucket,
      |          CAST(round(round(ln((coalesce(rc.cnt, 0) + 1.0) /
      |            (rt.total + 512.0)), 6) * 1e6, 0) AS BIGINT) AS lp
      |        FROM buckets b LEFT JOIN rc USING (bucket), rt),
      |sums AS (SELECT g.doc_id, count(*) AS n_grams,
      |           CAST(sum(tlm.lp - rlm.lp) AS BIGINT) AS logw_micro
      |         FROM g JOIN tlm USING (bucket) JOIN rlm
      |           ON rlm.bucket = g.bucket
      |         GROUP BY g.doc_id),
      |w AS (SELECT d.doc_id,
      |        coalesce(sums.n_grams, 0) AS n_grams,
      |        coalesce(sums.logw_micro, 0) AS logw_micro
      |      FROM documents d LEFT JOIN sums ON d.doc_id = sums.doc_id),
      |keyed AS (SELECT doc_id, n_grams,
      |            logw_micro + CAST(round(round(-ln(-ln(
      |              (CAST('0x' || substr(md5('dsir_gumbel' ||
      |                 CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) + 0.5)
      |              / 1152921504606846976.0)), 6) * 1e6, 0) AS BIGINT)
      |              AS key_micro,
      |            logw_micro
      |          FROM w),
      |ranked AS (SELECT doc_id, n_grams, key_micro,
      |             round(logw_micro / 1e6, 6) AS log_w,
      |             CAST(row_number() OVER (ORDER BY key_micro DESC, doc_id)
      |                  AS INT) AS rank
      |           FROM keyed)
      |SELECT doc_id, n_grams, key_micro, log_w, rank
      |FROM ranked WHERE rank <= 100 ORDER BY rank""".stripMargin))

  /** Model-based quality filter ([[graft.ops.QualityClassifier]]): a
    * spam twin of every 5th doc joins the corpus; the classifier is
    * trained on the labeled split (engine-specific MLlib fit → weights
    * MATERIALIZE to a side table, the q58 model pattern), then the
    * corpus-scale scoring pass — portable token hashing, exact integer
    * logit sums from the shared weight table, sigmoid, threshold —
    * replays fully in SQL. The hash gate pins scores AND the kept set.
    */
  private val q105WeightsPath = QueriesScale.sidePath("q105_qcls_weights")
  private val q105Junk =
    "click here buy now best price free offer limited deal 999 !!! "

  val q105 = QueryDef("q105_quality_classifier", (spark, dir) => {
    QueriesScale.reapStaleSideTables("q105_qcls_weights")
    val docs = t(spark, dir, "documents").select("doc_id", "text")
    val junk = docs.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 200000).as("doc_id"),
        concat(lit(q105Junk), substring(col("text"), 1, 40)).as("text"))
    val corpus = docs.unionByName(junk)
    // train on the 25% labeled slice, score the FULL corpus — the
    // production shape (labels are scarce; the corpus is not); junk ids
    // are 200000 + 5k, and 200000 % 4 == 0, so both classes survive
    val labeled = docs.withColumn("label", lit(1.0))
      .unionByName(junk.withColumn("label", lit(0.0)))
      .filter(pmod(col("doc_id"), lit(4)) === 0)
    QualityClassifier.fitQualityModel(labeled, "text", "label",
        buckets = 256)
      .write.mode("overwrite").parquet(q105WeightsPath)
    QualityClassifier.filterByQuality(corpus, "doc_id", "text",
        spark.read.parquet(q105WeightsPath), buckets = 256, tau = 0.5)
      .select(col("doc_id"), col("n_tokens"), col("z_micro"),
        round(col("score"), 6).as("score"), col("kept"))
      .orderBy("doc_id")
  }, Some(
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 200000, '$q105Junk' || substr(text, 1, 40)
       |  FROM documents WHERE doc_id % 5 = 0),
       |toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
       |         FROM corpus),
       |bux AS (SELECT doc_id,
       |          CAST('0x' || substr(md5('qcls' || tok), 1, 15) AS BIGINT)
       |            % 256 AS bucket
       |        FROM toks),
       |w AS (SELECT bucket, w_micro
       |      FROM read_parquet('$q105WeightsPath/*.parquet')
       |      WHERE bucket >= 0),
       |b0 AS (SELECT w_micro AS b0
       |       FROM read_parquet('$q105WeightsPath/*.parquet')
       |       WHERE bucket = -1),
       |sums AS (SELECT doc_id, count(*) AS n_tokens,
       |           CAST(sum(w_micro) AS BIGINT) AS zsum
       |         FROM bux JOIN w USING (bucket) GROUP BY doc_id),
       |scored AS (SELECT c.doc_id,
       |             coalesce(sums.n_tokens, 0) AS n_tokens,
       |             coalesce(sums.zsum, 0) + b0.b0 AS z_micro
       |           FROM corpus c LEFT JOIN sums ON c.doc_id = sums.doc_id, b0)
       |SELECT doc_id, n_tokens, z_micro,
       |  round(1.0 / (1.0 + exp(-z_micro / 1e6)), 6) AS score,
       |  round(1.0 / (1.0 + exp(-z_micro / 1e6)), 6) >= 0.5 AS kept
       |FROM scored ORDER BY doc_id""".stripMargin))

  /** IVF-PQ asymmetric-distance search ([[graft.ops.Pq]]): cells,
    * codebook, and codes materialize to side tables (the q58/q98 model
    * pattern — training and encoding are engine-specific argmins, each
    * spec-held to reference implementations), and the oracle replays the
    * SEARCH: per-probe distance tables against the shared codebook,
    * code-lookup aggregation in exact micro-units, cell-pruned ranking.
    * Every probe's full quantized top-5, pinned to the integer.
    */
  private val q106Dir = QueriesScale.sidePath("q106_pq")

  val q106 = QueryDef("q106_pq_adc", (spark, dir) => {
    QueriesScale.reapStaleSideTables("q106_pq")
    val emb = t(spark, dir, "embeddings").select("vec_id", "embedding")
    // models train on a 25% sample (codebooks need distribution
    // coverage, not the corpus); assignment/encoding runs on everything
    val sample = emb.filter(pmod(col("vec_id"), lit(4)) === 0)
    val (_, model) = Similarity.kmeansCells(sample, cells = 16, seed = 42L)
    val clustered = Similarity.assignCells(emb, model)
    clustered.select("vec_id", "cell")
      .write.mode("overwrite").parquet(s"$q106Dir/cells")
    Pq.trainPqCodebooks(sample, "embedding", m = 4, k = 16, seed = 7L)
      .write.mode("overwrite").parquet(s"$q106Dir/codebook")
    val codebook = spark.read.parquet(s"$q106Dir/codebook")
    val cb = Pq.codebookArrays(codebook)
    Pq.encodePq(clustered, "embedding", cb)
      .select(col("vec_id"), col("cell"), col("codes"))
      .write.mode("overwrite").parquet(s"$q106Dir/codes")
    val candCodes = spark.read.parquet(s"$q106Dir/codes")
      .select(col("vec_id").as("cand_id"), col("cell"), col("codes"))
    val probes = spark.read.parquet(s"$q106Dir/cells")
      .filter(col("vec_id") % 25 === 0)
      .join(emb, "vec_id")
      .select(col("vec_id").as("probe_id"), col("cell"), col("embedding"))
    Pq.adcTopKFused(candCodes, probes, cb, topk = 5)
      .select("probe_id", "cand_id", "adc_micro", "rank")
  }, Some(
    s"""WITH cells AS (SELECT vec_id, cell
       |               FROM read_parquet('$q106Dir/cells/*.parquet')),
       |cb AS (SELECT sub, code, centroid
       |       FROM read_parquet('$q106Dir/codebook/*.parquet')),
       |codes AS (SELECT vec_id, cell, codes
       |          FROM read_parquet('$q106Dir/codes/*.parquet')),
       |p AS (SELECT c.vec_id AS probe_id, c.cell, e.embedding
       |      FROM cells c JOIN embeddings e ON e.vec_id = c.vec_id
       |      WHERE c.vec_id % 25 = 0),
       |t AS (SELECT probe_id, p.cell, sub, code,
       |        CAST(round(round(list_sum(list_transform(
       |          list_zip(embedding[(sub * 16 + 1):(sub * 16 + 16)], centroid),
       |          x -> (x[1]::DOUBLE - x[2]::DOUBLE) *
       |               (x[1]::DOUBLE - x[2]::DOUBLE))), 6) * 1e6, 0)
       |          AS BIGINT) AS d_micro
       |      FROM p, cb),
       |cl AS (SELECT vec_id AS cand_id, cell, codes,
       |         unnest(generate_series(1, len(codes))) AS i
       |       FROM codes),
       |cl2 AS (SELECT cand_id, cell, i - 1 AS sub, codes[i] AS code FROM cl),
       |s AS (SELECT probe_id, cand_id,
       |        CAST(sum(d_micro) AS BIGINT) AS adc_micro
       |      FROM cl2 JOIN t USING (cell, sub, code)
       |      WHERE probe_id <> cand_id
       |      GROUP BY probe_id, cand_id),
       |r AS (SELECT probe_id, cand_id, adc_micro,
       |        CAST(row_number() OVER (PARTITION BY probe_id
       |             ORDER BY adc_micro, cand_id) AS BIGINT) AS rank
       |      FROM s)
       |SELECT probe_id, cand_id, adc_micro, rank FROM r WHERE rank <= 5
       |ORDER BY probe_id, rank""".stripMargin))

  /** Epoch-based source upsampling ([[graft.ops.Sampling.epochMix]]):
    * src0 trains 2.45 epochs, src1 0.3, src2 is dropped, everything else
    * one pass — the LLaMA-recipe mixing step. The oracle replays the
    * replication with `unnest(range(n))` and the identical pure-hash
    * fractional membership (floor/frac quantized driver-side, so both
    * engines compare the same integers).
    */
  val q118 = QueryDef("q118_epoch_mix", (spark, dir) => {
    val docs = t(spark, dir, "documents").select("doc_id", "source")
    graft.ops.Sampling.epochMix(docs, "doc_id", "source",
        epochs = Seq("src0" -> 2.45, "src1" -> 0.3, "src2" -> 0.0),
        defaultEpochs = 1.0)
      .select("doc_id", "source", "epoch")
      .orderBy("doc_id", "epoch")
  }, Some(
    """WITH d AS (
      |  SELECT doc_id, source,
      |    CAST('0x' || substr(md5('epoch' || CAST(doc_id AS VARCHAR)), 1, 15)
      |      AS BIGINT) % 1000000 AS b
      |  FROM documents),
      |n AS (SELECT doc_id, source,
      |        (CASE source WHEN 'src0' THEN 2 WHEN 'src1' THEN 0
      |              WHEN 'src2' THEN 0 ELSE 1 END)
      |        + (CASE WHEN b < (CASE source WHEN 'src0' THEN 450000
      |                WHEN 'src1' THEN 300000 WHEN 'src2' THEN 0
      |                ELSE 0 END) THEN 1 ELSE 0 END) AS n
      |      FROM d)
      |SELECT doc_id, source, unnest(range(n)) AS epoch FROM n
      |ORDER BY doc_id, epoch""".stripMargin))

  /** Token-budget sampling ([[graft.ops.Sampling.tokenBudgetSample]]):
    * 20k whitespace-tokens per language, priority = (md5, id) — the
    * oracle replays the identical prefix arithmetic with DuckDB's
    * `CAST('0x'||hex AS BIGINT)` (== Spark `conv(hex,16,10)`,
    * [[graft.ops.Sampling.hashBucket]]'s pinned equivalence) and an
    * exclusive running sum.
    */
  val q122 = QueryDef("q122_token_budget_sample", (spark, dir) => {
    val docs = t(spark, dir, "documents")
      .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
    graft.ops.Sampling
      .tokenBudgetSample(docs, "doc_id", "lang", "n_tok", 20000L)
      .select("doc_id", "lang", "n_tok")
      .orderBy("lang", "doc_id")
  }, Some(
    """WITH d AS (
      |  SELECT doc_id, lang,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
      |    CAST('0x' || substring(md5('budget' || doc_id), 1, 15) AS BIGINT)
      |      AS prio
      |  FROM documents),
      |c AS (SELECT *, coalesce(sum(n_tok) OVER (
      |        PARTITION BY lang ORDER BY prio, doc_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
      |      FROM d)
      |SELECT doc_id, lang, n_tok FROM c WHERE bef < 20000
      |ORDER BY lang, doc_id""".stripMargin))

  val all: Seq[QueryDef] = Seq(q103, q104, q105, q106, q118, q122)
}
