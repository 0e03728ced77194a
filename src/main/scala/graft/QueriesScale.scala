package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Queries.QueryDef
import graft.core.Tables
import graft.functions.TextFunctions
import graft.ops.{Dedup, Similarity, TextAnalysis}

/** Training-data-pipeline operators (dedup, similarity, text analysis,
  * multimodal) as verifiable queries. Oracles are DuckDB SQL that mirrors
  * the Spark plan's arithmetic exactly — including fold order for vector
  * math and rounded tie-break keys for rankings.
  */
object QueriesScale {

  /** DuckDB double-precision cosine between two FLOAT[] lists, matching
    * VectorFunctions.cosine's per-element double cast + ordered fold.
    * (DuckDB's built-in list_cosine_similarity computes in float32 and
    * diverges in the 6th decimal — not usable as an oracle.)
    */
  private[graft] def duckCos(a: String, b: String): String =
    s"""list_sum(list_transform(list_zip($a, $b), x -> x[1]::DOUBLE * x[2]::DOUBLE)) /
       |    (sqrt(list_sum(list_transform($a, x -> x::DOUBLE * x::DOUBLE))) *
       |     sqrt(list_sum(list_transform($b, x -> x::DOUBLE * x::DOUBLE))))""".stripMargin

  /** DuckDB word-3-gram distinct shingle table over `src(doc_id, text)` —
    * shared by every Jaccard-family oracle (q26/q27/q51/q62) so the
    * shingle SQL can never diverge between them.
    */
  private[graft] def duckShingles(src: String = "documents"): String =
    s"""toks AS (SELECT doc_id, string_split(lower(text), ' ') AS l FROM $src),
       |pos AS (SELECT doc_id, l, unnest(generate_series(1, len(l) - 2)) AS i
       |        FROM toks WHERE len(l) >= 3),
       |sh AS (SELECT DISTINCT doc_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS shingle
       |       FROM pos)""".stripMargin

  /** The TextAnalysis.stopwords English head as a DuckDB list literal. */
  private[graft] val enStopsSql: String =
    TextAnalysis.stopwords.head._2.map(w => s"'$w'").mkString(", ")

  /** DuckDB replay of the full quality-metric row over `src(doc_id,
    * text)` — the SAME SQL backs q33 and the q62 pipeline gate, so the
    * quality formula cannot silently diverge between them.
    */
  private[graft] def duckQualityScored(src: String = "documents"): String =
    s"""SELECT doc_id, n_chars, n_tokens,
       |  round((n_chars - (n_tokens - 1))::DOUBLE / n_tokens, 4) AS mean_tok_len,
       |  punct_ratio, digit_ratio, stopword_ratio,
       |  round(least(1.0, n_tokens / 100.0) * (1.0 - punct_ratio)
       |    * (1.0 - digit_ratio)
       |    * (0.8 + least(0.2, stopword_ratio)), 4) AS quality
       |FROM (
       |  SELECT doc_id,
       |    CAST(length(lower(text)) AS BIGINT) AS n_chars,
       |    CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens,
       |    round(length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g'))::DOUBLE
       |      / length(lower(text)), 4) AS punct_ratio,
       |    round(length(regexp_replace(lower(text), '[^0-9]', '', 'g'))::DOUBLE
       |      / length(lower(text)), 4) AS digit_ratio,
       |    round(len(list_filter(string_split(lower(text), ' '),
       |        x -> list_contains([$enStopsSql], x)))::DOUBLE
       |      / len(string_split(lower(text), ' ')), 4) AS stopword_ratio
       |  FROM $src)""".stripMargin

  private val jaccardOracle =
    s"""WITH ${duckShingles()},
       |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_inter
       |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2)
       |SELECT a_id, b_id,
       |  round(n_inter::DOUBLE / (sa.n_sh + sb.n_sh - n_inter), 4) AS jaccard
       |FROM inter
       |JOIN sizes sa ON sa.doc_id = inter.a_id
       |JOIN sizes sb ON sb.doc_id = inter.b_id
       |WHERE n_inter::DOUBLE / (sa.n_sh + sb.n_sh - n_inter) >= 0.6
       |ORDER BY a_id, b_id""".stripMargin

  private def t(spark: org.apache.spark.sql.SparkSession, dir: String, name: String) =
    Tables.load(spark, dir, name)

  /** Exact dedup with deterministic keep-first over a corpus with planted
    * duplicates (every 7th doc re-appears under a shifted id).
    */
  val q24 = QueryDef("q24_dedup_exact", (spark, dir) => {
    val docs = t(spark, dir, "documents").select("doc_id", "text")
    val dups = docs.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 100000).as("doc_id"), col("text"))
    val aug = docs.unionByName(dups)
      .select(col("doc_id"), TextFunctions.fingerprint(col("text")).as("fp"))
      .withColumn("n_copies", count(lit(1)).over(Window.partitionBy("fp")))
    Dedup.exactKeepFirst(aug, Seq("fp"), Seq(col("doc_id")))
      .select("doc_id", "fp", "n_copies").orderBy("doc_id")
  }, Some(
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL SELECT doc_id + 100000, text FROM documents WHERE doc_id % 7 = 0),
      |aug AS (SELECT doc_id,
      |          md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
      |        FROM corpus),
      |w AS (SELECT doc_id, fp,
      |        row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn,
      |        count(*) OVER (PARTITION BY fp) AS n_copies
      |      FROM aug)
      |SELECT doc_id, fp, n_copies FROM w WHERE rn = 1 ORDER BY doc_id""".stripMargin))

  /** Content + bag-of-words fingerprints (md5-based, engine-portable). */
  val q25 = QueryDef("q25_fingerprints", (spark, dir) => {
    t(spark, dir, "documents")
      .select(col("doc_id"),
        TextFunctions.fingerprint(col("text")).as("fp"),
        TextFunctions.bowFingerprint(col("text")).as("bow_fp"))
      .orderBy("doc_id")
  }, Some(
    """SELECT doc_id,
      |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
      |  md5(array_to_string(list_sort(string_split(lower(text), ' ')), ' ')) AS bow_fp
      |FROM documents ORDER BY doc_id""".stripMargin))

  /** Exact 3-gram Jaccard near-dup pairs (inverted-index join), run with
    * the stop-shingle frequency cap the 100 TB deployment would use — the
    * oracle computes UNCAPPED Jaccard, so the green hash is itself the
    * proof that the cap preserves the exact result on this corpus.
    */
  val q26 = QueryDef("q26_jaccard_pairs", (spark, dir) =>
    Dedup.jaccardPairs(t(spark, dir, "documents"), "doc_id", "text", threshold = 0.6,
        maxShingleFreq = Some(50))
      .orderBy("a_id", "b_id"),
    Some(jaccardOracle))

  /** MinHash+LSH near-dup pairs with exact-Jaccard verification. The
    * verification step removes all false positives, so the output is a
    * subset of q26; with 64 hashes / 16 bands recall at 0.6 is ≈1, and the
    * oracle asserts exact equality with the full Jaccard output.
    */
  val q27 = QueryDef("q27_minhash_lsh", (spark, dir) =>
    Dedup.minhashLshPairs(t(spark, dir, "documents"), "doc_id", "text", threshold = 0.6)
      .orderBy("a_id", "b_id"),
    Some(jaccardOracle))

  /** SimHash near-dup pairs. The fingerprint itself is engine-specific
    * (xxhash64 bit votes — DuckDB has no xxhash64), so the query
    * materializes the Spark-computed (doc_id, simhash) table to a fixed
    * side path and the oracle replays the banding-sensitive part — hamming
    * pairing via `bit_count(xor(ha, hb))` — from that table. That verifies
    * the 4-band blocking never loses a qualifying pair (the part that can
    * silently drop recall), while the fingerprint stays engine-native.
    */
  // PID-keyed so a Bench run (different JVM) can't clobber the table
  // between a Verify run and the driver's DuckDB compare, and concurrent
  // users never collide; the oracle string below is built in the SAME JVM
  // as the query run, so both sides agree on the path.
  private[graft] def sidePath(prefix: String): String =
    s"/tmp/graft_oracle_side/${prefix}_${ProcessHandle.current().pid()}"

  /** Best-effort reap of stale side tables from dead JVMs (> 1 day old). */
  private[graft] def reapStaleSideTables(prefix: String): Unit = {
    val parent = new java.io.File("/tmp/graft_oracle_side")
    Option(parent.listFiles()).foreach(_.foreach { f =>
      if (f.getName.startsWith(prefix + "_") &&
          f.lastModified() < System.currentTimeMillis() - 86400000L) {
        def rm(x: java.io.File): Unit = {
          if (x.isDirectory) Option(x.listFiles()).foreach(_.foreach(rm))
          x.delete(): Unit
        }
        rm(f)
      }
    })
  }

  private val q28FpPath = sidePath("q28_simhash_fp")

  val q28 = QueryDef("q28_simhash_pairs", (spark, dir) => {
    reapStaleSideTables("q28_simhash_fp")
    Dedup.simhash(t(spark, dir, "documents"), "doc_id", "text")
      .write.mode("overwrite").parquet(q28FpPath)
    Dedup.simhashPairsFrom(spark.read.parquet(q28FpPath), maxDist = 3)
      .orderBy("a_id", "b_id")
  }, Some(
    s"""WITH fp AS (SELECT doc_id, simhash
       |            FROM read_parquet('$q28FpPath/*.parquet')),
       |pairs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       |            CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS dist
       |          FROM fp a JOIN fp b ON a.doc_id < b.doc_id)
       |SELECT a_id, b_id, dist FROM pairs WHERE dist <= 3
       |ORDER BY a_id, b_id""".stripMargin))

  /** Brute-force cosine top-10 for a modulo probe set. */
  val q29 = QueryDef("q29_ann_topk", (spark, dir) => {
    val emb = t(spark, dir, "embeddings")
    Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") % 100 === 0), k = 10)
  }, Some(
    s"""WITH p AS (SELECT vec_id AS probe_id, embedding AS pe FROM embeddings
       |           WHERE vec_id % 100 = 0),
       |c AS (SELECT vec_id AS cand_id, embedding AS ce FROM embeddings),
       |scored AS (
       |  SELECT probe_id, cand_id, ${duckCos("pe", "ce")} AS cos
       |  FROM p, c WHERE probe_id <> cand_id),
       |ranked AS (SELECT probe_id, cand_id, cos,
       |    row_number() OVER (PARTITION BY probe_id
       |                       ORDER BY round(cos, 6) DESC, cand_id) AS rank
       |  FROM scored)
       |SELECT probe_id, cand_id, round(cos, 4) AS cos, rank
       |FROM ranked WHERE rank <= 10 ORDER BY probe_id, rank""".stripMargin))

  /** IVF-pruned top-5: candidates restricted to the probe's cluster. */
  val q30 = QueryDef("q30_ivf_topk", (spark, dir) => {
    val emb = t(spark, dir, "embeddings")
    Similarity.ivfTopK(emb, emb.filter(col("vec_id") % 100 === 0), "label", k = 5)
  }, Some(
    s"""WITH p AS (SELECT vec_id AS probe_id, embedding AS pe, label FROM embeddings
       |           WHERE vec_id % 100 = 0),
       |c AS (SELECT vec_id AS cand_id, embedding AS ce, label FROM embeddings),
       |scored AS (
       |  SELECT probe_id, cand_id, ${duckCos("pe", "ce")} AS cos
       |  FROM p JOIN c ON p.label = c.label AND probe_id <> cand_id),
       |ranked AS (SELECT probe_id, cand_id, cos,
       |    row_number() OVER (PARTITION BY probe_id
       |                       ORDER BY round(cos, 6) DESC, cand_id) AS rank
       |  FROM scored)
       |SELECT probe_id, cand_id, round(cos, 4) AS cos, rank
       |FROM ranked WHERE rank <= 5 ORDER BY probe_id, rank""".stripMargin))

  /** Trained k-means IVF top-k (the production ANN path: real fitted
    * cells, not the data's label column). The model's cell assignment is
    * engine-specific (MLlib k-means), so — exactly like q28's simhash
    * fingerprints — the Spark-computed (vec_id, cell) table materializes
    * to a side path and the oracle replays what the operator ADDS on top
    * of the model: cell-pruned scoring + ranking. The Spark query reads
    * the SAME materialized assignment back, so both engines rank from
    * identical cells and the hash pins the pruned-search semantics.
    */
  private val q58CellPath = sidePath("q58_kmeans_cells")

  val q58 = QueryDef("q58_kmeans_ivf", (spark, dir) => {
    reapStaleSideTables("q58_kmeans_cells")
    val emb = t(spark, dir, "embeddings").select("vec_id", "embedding")
    val (clustered, _) = Similarity.kmeansCells(emb, cells = 16, seed = 42L)
    clustered.select("vec_id", "cell").write.mode("overwrite").parquet(q58CellPath)
    val corpus = emb.join(spark.read.parquet(q58CellPath), "vec_id")
    // Gate hint: count the probe sample on the column-pruned base scan
    // instead of letting the gate count through the cell join.
    val probeN = emb.filter(col("vec_id") % 100 === 0).count()
    Similarity.ivfTopK(corpus, corpus.filter(col("vec_id") % 100 === 0),
      "cell", k = 5, probeRows = Some(probeN))
  }, Some(
    s"""WITH cells AS (SELECT vec_id, cell
       |               FROM read_parquet('$q58CellPath/*.parquet')),
       |e AS (SELECT e0.vec_id, embedding, cell
       |      FROM embeddings e0 JOIN cells USING (vec_id)),
       |p AS (SELECT vec_id AS probe_id, embedding AS pe, cell FROM e
       |      WHERE vec_id % 100 = 0),
       |c AS (SELECT vec_id AS cand_id, embedding AS ce, cell FROM e),
       |scored AS (
       |  SELECT probe_id, cand_id, ${duckCos("pe", "ce")} AS cos
       |  FROM p JOIN c ON p.cell = c.cell AND probe_id <> cand_id),
       |ranked AS (SELECT probe_id, cand_id, cos,
       |    row_number() OVER (PARTITION BY probe_id
       |                       ORDER BY round(cos, 6) DESC, cand_id) AS rank
       |  FROM scored)
       |SELECT probe_id, cand_id, round(cos, 4) AS cos, rank
       |FROM ranked WHERE rank <= 5 ORDER BY probe_id, rank""".stripMargin))

  /** Multi-cell (`nprobe = 2`) trained-IVF top-5 behind the hash gate —
    * the recall-repair path of [[Similarity.assignCellsMulti]]: each
    * probe scores against its TWO nearest cells. Same side-path pattern
    * as q58 for the model-specific parts (the corpus cell table AND the
    * probe→{cell₁, cell₂} assignment both materialize), so the oracle
    * replays exactly what the operator adds: multi-cell-pruned scoring +
    * ranking. A candidate holds one cell, so (probe, cand) pairs stay
    * unique across the probe's cells with no dedup step.
    */
  private val q92CellPath = sidePath("q92_nprobe_cells")
  private val q92ProbePath = sidePath("q92_nprobe_probes")

  val q92 = QueryDef("q92_ivf_nprobe", (spark, dir) => {
    reapStaleSideTables("q92_nprobe_cells")
    reapStaleSideTables("q92_nprobe_probes")
    val emb = t(spark, dir, "embeddings").select("vec_id", "embedding")
    val (clustered, model) = Similarity.kmeansCells(emb, cells = 16, seed = 42L)
    clustered.select("vec_id", "cell").write.mode("overwrite").parquet(q92CellPath)
    val probes = emb.filter(col("vec_id") % 100 === 0)
    Similarity.assignCellsMulti(probes, model, nprobe = 2)
      .select("vec_id", "cell").write.mode("overwrite").parquet(q92ProbePath)
    val corpus = emb.join(spark.read.parquet(q92CellPath), "vec_id")
    val probeSide = probes.join(spark.read.parquet(q92ProbePath), "vec_id")
    val probeN = probes.count() * 2 // one probe row per probed cell
    Similarity.ivfTopK(corpus, probeSide, "cell", k = 5,
      probeRows = Some(probeN))
  }, Some(
    s"""WITH cells AS (SELECT vec_id, cell
       |               FROM read_parquet('$q92CellPath/*.parquet')),
       |pcells AS (SELECT vec_id, cell
       |           FROM read_parquet('$q92ProbePath/*.parquet')),
       |p AS (SELECT e0.vec_id AS probe_id, embedding AS pe, pcells.cell
       |      FROM embeddings e0 JOIN pcells USING (vec_id)),
       |c AS (SELECT e0.vec_id AS cand_id, embedding AS ce, cells.cell
       |      FROM embeddings e0 JOIN cells USING (vec_id)),
       |scored AS (
       |  SELECT probe_id, cand_id, ${duckCos("pe", "ce")} AS cos
       |  FROM p JOIN c ON p.cell = c.cell AND probe_id <> cand_id),
       |ranked AS (SELECT probe_id, cand_id, cos,
       |    row_number() OVER (PARTITION BY probe_id
       |                       ORDER BY round(cos, 6) DESC, cand_id) AS rank
       |  FROM scored)
       |SELECT probe_id, cand_id, round(cos, 4) AS cos, rank
       |FROM ranked WHERE rank <= 5 ORDER BY probe_id, rank""".stripMargin))

  /** SemDeDup-style semantic dedup behind the hash gate: k-means cells
    * (engine-specific → side-path materialized, the q58 pattern), exact
    * within-cell cosine pairs, connected components, keep-min-id. The
    * oracle replays everything the operator ADDS on top of the model —
    * within-cell pairing, the recursive-CTE component contraction (q51's
    * fragment), and the survivor anti-join — from the SAME materialized
    * cell table both engines read.
    */
  private val q98CellPath = sidePath("q98_semdedup_cells")
  private val semDedupThreshold = 0.4

  val q98 = QueryDef("q98_semantic_dedup", (spark, dir) => {
    reapStaleSideTables("q98_semdedup_cells")
    val emb = t(spark, dir, "embeddings").select("vec_id", "embedding")
    val (clustered, _) = Similarity.kmeansCells(emb, cells = 16, seed = 42L)
    clustered.select("vec_id", "cell").write.mode("overwrite").parquet(q98CellPath)
    Dedup.semanticDedupWithCells(emb, spark.read.parquet(q98CellPath),
        "vec_id", "embedding", "cell", threshold = semDedupThreshold)
      .select("vec_id").orderBy("vec_id")
  }, Some(
    s"""WITH RECURSIVE cells AS (SELECT vec_id, cell
       |               FROM read_parquet('$q98CellPath/*.parquet')),
       |e AS (SELECT e0.vec_id, embedding, cell
       |      FROM embeddings e0 JOIN cells USING (vec_id)),
       |pairs AS (
       |  SELECT a.vec_id AS a_id, b.vec_id AS b_id
       |  FROM e a JOIN e b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  WHERE ${duckCos("a.embedding", "b.embedding")} >= $semDedupThreshold),
       |edges AS (SELECT a_id AS s, b_id AS d FROM pairs
       |          UNION ALL SELECT b_id, a_id FROM pairs),
       |walk(id, lbl) AS (
       |  SELECT s, s FROM edges GROUP BY s
       |  UNION
       |  SELECT e2.s, walk.lbl FROM edges e2 JOIN walk ON walk.id = e2.d),
       |dropped AS (SELECT id FROM (SELECT id, min(lbl) AS comp FROM walk
       |                            GROUP BY id) WHERE comp <> id)
       |SELECT vec_id FROM embeddings
       |WHERE vec_id NOT IN (SELECT id FROM dropped)
       |ORDER BY vec_id""".stripMargin))

  /** Embedding-cosine near-duplicate pairs above 0.4 for a delta sample. */
  val q31 = QueryDef("q31_cosine_neardup", (spark, dir) =>
    Similarity.cosineNearDupPairs(t(spark, dir, "embeddings"), probeModulo = 10,
      threshold = 0.4),
    Some(
      s"""WITH a AS (SELECT vec_id AS a_id, embedding AS ae FROM embeddings
         |           WHERE vec_id % 10 = 0),
         |b AS (SELECT vec_id AS b_id, embedding AS be FROM embeddings),
         |s AS (SELECT a_id, b_id, ${duckCos("ae", "be")} AS cos
         |      FROM a JOIN b ON a_id < b_id)
         |SELECT a_id, b_id, round(cos, 4) AS cos FROM s
         |WHERE cos >= 0.4 ORDER BY a_id, b_id""".stripMargin))

  /** Stopword-hit language ID; SQL mirror built from the same word lists. */
  val q32 = QueryDef("q32_lang_id", (spark, dir) =>
    TextAnalysis.langId(t(spark, dir, "documents"), "doc_id", "text").orderBy("doc_id"),
    Some {
      val hits = TextAnalysis.stopwords.map { case (lang, words) =>
        val lst = words.map(w => s"'$w'").mkString(", ")
        s"CAST(len(list_filter(string_split(lower(text), ' '), x -> list_contains([$lst], x))) AS BIGINT) AS hits_$lang"
      }.mkString(",\n    ")
      val gExpr = TextAnalysis.stopwords.map(l => s"hits_${l._1}").mkString("greatest(", ", ", ")")
      val pred = TextAnalysis.stopwords.map { case (lang, _) =>
        s"WHEN hits_$lang = g AND hits_$lang > 0 THEN '$lang'"
      }.mkString(" ")
      val hitCols = TextAnalysis.stopwords.map(l => s"hits_${l._1}").mkString(", ")
      s"""SELECT doc_id, $hitCols,
         |  CASE $pred ELSE 'und' END AS pred_lang
         |FROM (SELECT doc_id,
         |    $hits,
         |    $gExpr AS g
         |  FROM documents)
         |ORDER BY doc_id""".stripMargin
    })

  /** Text quality metrics + composite score (oracle embeds the same
    * stopword list as TextAnalysis.stopwords head).
    */
  val q33 = QueryDef("q33_quality_score", (spark, dir) =>
    TextAnalysis.qualityScore(t(spark, dir, "documents"), "doc_id", "text").orderBy("doc_id"),
    Some(s"""${duckQualityScored()}
            |ORDER BY doc_id""".stripMargin))

  /** Token statistics per language group (whitespace + BPE-ish subwords). */
  val q34 = QueryDef("q34_token_stats", (spark, dir) =>
    TextAnalysis.tokenStats(t(spark, dir, "documents"), "lang", "text").orderBy("grp"),
    Some(
      """SELECT lang AS grp, count(*) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS total_tokens,
        |  CAST(sum(n_sub) AS BIGINT) AS total_subwords,
        |  round(avg(n_tok), 4) AS avg_tokens
        |FROM (SELECT lang,
        |        CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tok,
        |        CAST(len(regexp_extract_all(lower(text),
        |          '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS n_sub
        |      FROM documents)
        |GROUP BY lang ORDER BY grp""".stripMargin))

  /** Multimodal metadata extraction: documents' text bytes stand in for an
    * opaque binary payload; a deterministic stub "decoder" (md5-derived
    * width/height/frames) runs per-partition with real Spark plumbing —
    * binary column in, typed metadata out, no shuffle.
    */
  val q35 = QueryDef("q35_multimodal_meta", (spark, dir) => {
    import spark.implicits._
    t(spark, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) =>
          md.reset()
          val hex = md.digest(bytes).map("%02x".format(_)).mkString
          // Deterministic fake of a media decoder: real decode would use the
          // same shape (binary in, metadata struct out, partition-local).
          val width = ((hex.charAt(0).toInt % 8) + 1) * 64L
          val height = ((hex.charAt(1).toInt % 8) + 1) * 64L
          val frames = (hex.charAt(2).toInt % 16) + 1L
          (id, bytes.length.toLong, hex, width, height, frames)
        }
      }
      .toDF("doc_id", "n_bytes", "content_md5", "width", "height", "n_frames")
      .orderBy("doc_id")
  }, Some(
    """SELECT doc_id,
      |  CAST(strlen(text) AS BIGINT) AS n_bytes,
      |  md5(text) AS content_md5,
      |  CAST(((ascii(substr(md5(text), 1, 1)) % 8) + 1) * 64 AS BIGINT) AS width,
      |  CAST(((ascii(substr(md5(text), 2, 1)) % 8) + 1) * 64 AS BIGINT) AS height,
      |  CAST((ascii(substr(md5(text), 3, 1)) % 16) + 1 AS BIGINT) AS n_frames
      |FROM documents ORDER BY doc_id""".stripMargin))

  /** Random-projection LSH near-dup pairs. The oracle rebuilds the SAME
    * seeded hyperplanes as FLOAT literals and replays bucketing +
    * verification in SQL — bucket bits come from sign(dot), which both
    * engines compute identically in double.
    */
  // bits pinned at 4 (not the ~6 the autoBits occupancy rule would pick
  // for 5000 vecs): at 16 tables the wider buckets buy ~0.94 recall at
  // cos 0.4 vs ~0.79 with 6 bits, and occupancy ~300 is nowhere near
  // quadratic danger at this corpus size — the auto rule is for scale,
  // the gate queries demonstrate recall. ONE definition of the replayed
  // LSH pipeline (planes, bucketing SQL, scored-pair CTEs) backs both the
  // pair gate (q40) and the cluster gate (q64), so they cannot diverge.
  private val lshGateBits = 4
  private val lshGateTables = 16
  private val lshGateSeed = 42L
  private val lshGateThreshold = 0.4
  private val lshGateDim = 64 // embeddings are 64-dim (TESTDATA corpus)

  /** hashed/cand/av/bv/scored CTE chain replaying the sign-bit LSH
    * bucketing + exact-cosine scoring in DuckDB (plane literals from the
    * same seeded generator the Spark side broadcasts).
    */
  private lazy val lshGateCtes: String = {
    val planes = Similarity.hyperplanes(lshGateDim, lshGateBits,
      lshGateTables, lshGateSeed)
    def planeSql(p: Array[Float]): String =
      p.map(_.toString).mkString("[", ", ", "]::FLOAT[]")
    def dotPlane(p: Array[Float]): String =
      s"list_sum(list_transform(list_zip(embedding, ${planeSql(p)}), x -> x[1]::DOUBLE * x[2]::DOUBLE))"
    val bucketRows = (0 until lshGateTables).map { t =>
      val bucket = (0 until lshGateBits).map { i =>
        s"(CASE WHEN ${dotPlane(planes(t)(i))} >= 0 THEN ${1 << i} ELSE 0 END)"
      }.mkString(" + ")
      s"SELECT vec_id, $t AS t, $bucket AS bucket FROM embeddings"
    }.mkString("\nUNION ALL ")
    s"""hashed AS ($bucketRows),
       |cand AS (SELECT DISTINCT x.vec_id AS a_id, y.vec_id AS b_id
       |         FROM hashed x JOIN hashed y
       |           ON x.t = y.t AND x.bucket = y.bucket AND x.vec_id < y.vec_id),
       |av AS (SELECT vec_id, embedding AS ae FROM embeddings),
       |bv AS (SELECT vec_id, embedding AS be FROM embeddings),
       |scored AS (SELECT a_id, b_id, ${duckCos("ae", "be")} AS cos
       |           FROM cand JOIN av ON a_id = av.vec_id
       |           JOIN bv ON b_id = bv.vec_id)""".stripMargin
  }

  val q40 = QueryDef("q40_lsh_cosine_pairs",
    (spark, dir) => Similarity.lshCosinePairs(
      t(spark, dir, "embeddings"), lshGateThreshold, lshGateBits,
      lshGateTables, lshGateSeed, dim = Some(lshGateDim)),
    Some(
      s"""WITH $lshGateCtes
         |SELECT a_id, b_id, round(cos, 4) AS cos FROM scored
         |WHERE cos >= $lshGateThreshold ORDER BY a_id, b_id""".stripMargin))

  /** Embedding-modality near-dup CLUSTERS — the [[q51]] twin for vectors:
    * q40's LSH cosine pairs fed through connected components, keep-min-id
    * semantics. The oracle replays the identical LSH pipeline (shared
    * CTE fragment) and clusters with the same recursive CTE as q51.
    */
  val q64 = QueryDef("q64_embedding_neardup_clusters", (spark, dir) => {
    val pairs = Similarity.lshCosinePairs(
        t(spark, dir, "embeddings"), lshGateThreshold, lshGateBits,
        lshGateTables, lshGateSeed, dim = Some(lshGateDim))
      .select(col("a_id"), col("b_id"))
    Dedup.connectedComponents(pairs)
      .select(col("id").as("vec_id"), col("comp"))
      .orderBy("vec_id")
  }, Some(
    s"""WITH RECURSIVE $lshGateCtes,
       |pairs AS (SELECT a_id, b_id FROM scored WHERE cos >= $lshGateThreshold),
       |edges AS (SELECT a_id AS s, b_id AS d FROM pairs
       |          UNION ALL SELECT b_id, a_id FROM pairs),
       |walk(id, lbl) AS (
       |  SELECT s, s FROM edges GROUP BY s
       |  UNION
       |  SELECT e.s, walk.lbl FROM edges e JOIN walk ON walk.id = e.d)
       |SELECT id AS vec_id, min(lbl) AS comp FROM walk
       |GROUP BY id ORDER BY vec_id""".stripMargin))

  /** Near-dup CLUSTERS: q26's pair output fed through connected
    * components (min-label propagation). The oracle replays the pairing
    * in SQL and clusters with a recursive CTE — label propagation to
    * fixpoint, then min per node.
    */
  val q51 = QueryDef("q51_neardup_clusters", (spark, dir) => {
    // CAPPED pairing — the production plan shape (q26 pins cap-vs-uncapped
    // equality on this corpus, so the oracle's uncapped replay still holds)
    val pairs = Dedup.jaccardPairs(t(spark, dir, "documents"), "doc_id", "text",
      threshold = 0.6, maxShingleFreq = Some(50))
    Dedup.connectedComponents(pairs)
      .select(col("id").as("doc_id"), col("comp"))
      .orderBy("doc_id")
  }, Some(
    s"""WITH RECURSIVE ${duckShingles()},
       |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_inter
       |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2),
       |pairs AS (SELECT a_id, b_id FROM inter
       |          JOIN sizes sa ON sa.doc_id = inter.a_id
       |          JOIN sizes sb ON sb.doc_id = inter.b_id
       |          WHERE n_inter::DOUBLE / (sa.n_sh + sb.n_sh - n_inter) >= 0.6),
       |edges AS (SELECT a_id AS s, b_id AS d FROM pairs
       |          UNION ALL SELECT b_id, a_id FROM pairs),
       |walk(id, lbl) AS (
       |  SELECT s, s FROM edges GROUP BY s
       |  UNION
       |  SELECT e.s, walk.lbl FROM edges e JOIN walk ON walk.id = e.d)
       |SELECT id AS doc_id, min(lbl) AS comp FROM walk
       |GROUP BY id ORDER BY doc_id""".stripMargin))

  /** Quality-aware near-dup collapse ([[Dedup.keepBestPerCluster]]): the
    * q51 cluster structure, but per cluster the LONGEST member (n_chars,
    * ties → lowest id) is elected representative instead of the minimum
    * id. The oracle extends q51's recursive-CTE contraction with the
    * documents join and a `row_number() ... ORDER BY n_chars DESC, id`
    * election — the same total order as Spark's `max(struct(q, -id))`.
    */
  val q119 = QueryDef("q119_neardup_keep_best", (spark, dir) => {
    val docs = t(spark, dir, "documents")
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text",
      threshold = 0.6, maxShingleFreq = Some(50))
    Dedup.keepBestPerCluster(docs, pairs, "doc_id", col("n_chars"))
      .orderBy("comp")
  }, Some(
    s"""WITH RECURSIVE ${duckShingles()},
       |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_inter
       |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2),
       |pairs AS (SELECT a_id, b_id FROM inter
       |          JOIN sizes sa ON sa.doc_id = inter.a_id
       |          JOIN sizes sb ON sb.doc_id = inter.b_id
       |          WHERE n_inter::DOUBLE / (sa.n_sh + sb.n_sh - n_inter) >= 0.6),
       |edges AS (SELECT a_id AS s, b_id AS d FROM pairs
       |          UNION ALL SELECT b_id, a_id FROM pairs),
       |walk(id, lbl) AS (
       |  SELECT s, s FROM edges GROUP BY s
       |  UNION
       |  SELECT e.s, walk.lbl FROM edges e JOIN walk ON walk.id = e.d),
       |comp AS (SELECT id, min(lbl) AS comp FROM walk GROUP BY id),
       |m AS (SELECT c.comp, c.id, d.n_chars FROM comp c
       |      JOIN documents d ON d.doc_id = c.id),
       |r AS (SELECT comp, id, n_chars, row_number() OVER
       |        (PARTITION BY comp ORDER BY n_chars DESC, id ASC) AS rn
       |      FROM m),
       |g AS (SELECT comp, CAST(count(*) AS BIGINT) AS n_members
       |      FROM m GROUP BY comp)
       |SELECT g.comp AS comp, g.n_members, r.id AS kept_id,
       |  r.n_chars AS kept_q
       |FROM g JOIN r ON r.comp = g.comp AND r.rn = 1
       |ORDER BY g.comp""".stripMargin))

  /** Leakage-safe split ([[graft.ops.Sampling.clusterSafeSplit]]): the
    * q51 near-dup cluster structure collapsed onto q52's hash split, so
    * every cluster member lands in the same partition — the oracle
    * rederives clusters with the recursive CTE, elects the min-id
    * representative, and replays the bucket CASE on the representative.
    */
  val q123 = QueryDef("q123_cluster_safe_split", (spark, dir) => {
    val docs = t(spark, dir, "documents")
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text",
      threshold = 0.6, maxShingleFreq = Some(50))
    graft.ops.Sampling.clusterSafeSplit(docs.select("doc_id"), pairs,
        "doc_id", salt = "s1",
        fractions = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("doc_id", "rep", "split")
      .orderBy("doc_id")
  }, Some(
    s"""WITH RECURSIVE ${duckShingles()},
       |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_inter
       |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2),
       |pairs AS (SELECT a_id, b_id FROM inter
       |          JOIN sizes sa ON sa.doc_id = inter.a_id
       |          JOIN sizes sb ON sb.doc_id = inter.b_id
       |          WHERE n_inter::DOUBLE / (sa.n_sh + sb.n_sh - n_inter) >= 0.6),
       |edges AS (SELECT a_id AS s, b_id AS d FROM pairs
       |          UNION ALL SELECT b_id, a_id FROM pairs),
       |walk(id, lbl) AS (
       |  SELECT s, s FROM edges GROUP BY s
       |  UNION
       |  SELECT e.s, walk.lbl FROM edges e JOIN walk ON walk.id = e.d),
       |comp AS (SELECT id, min(lbl) AS comp FROM walk GROUP BY id),
       |j AS (SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS rep
       |      FROM documents d LEFT JOIN comp c ON c.id = d.doc_id),
       |b AS (SELECT doc_id, rep,
       |        CAST(('0x' || substr(md5('s1' || CAST(rep AS VARCHAR)), 1, 15))
       |          AS BIGINT) % 10000 AS bucket
       |      FROM j)
       |SELECT doc_id, rep,
       |  CASE WHEN bucket < 8000 THEN 'train'
       |       WHEN bucket < 9000 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM b ORDER BY doc_id""".stripMargin))

  /** Multimodal frame sampling: the document's bytes stand in for an
    * opaque media container of fixed 64-byte frames; every 4th frame is
    * "decoded" (md5'd) partition-locally with one OUTPUT ROW PER FRAME —
    * the row-explosion shape a real video/audio sampler has. The oracle
    * replays the framing with generate_series + substr (the corpus text
    * is ASCII, so byte and char offsets agree — the same equivalence q35
    * already relies on).
    */
  val q53 = QueryDef("q53_frame_sample", (spark, dir) =>
    graft.ops.Multimodal.sampleFrames(
        t(spark, dir, "documents")
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload")),
        "doc_id", "payload", frameSize = 64, every = 4)
      .orderBy("doc_id", "frame_idx"),
    Some(
      """WITH fr AS (
        |  SELECT doc_id, text,
        |    unnest(generate_series(0,
        |      CAST(ceil(strlen(text) / 64.0) AS BIGINT) - 1)) AS idx
        |  FROM documents)
        |SELECT doc_id, idx AS frame_idx,
        |  CAST(strlen(substr(text, CAST(idx * 64 + 1 AS BIGINT), 64)) AS BIGINT)
        |    AS n_bytes,
        |  md5(substr(text, CAST(idx * 64 + 1 AS BIGINT), 64)) AS frame_md5
        |FROM fr WHERE idx % 4 = 0
        |ORDER BY doc_id, frame_idx""".stripMargin))

  /** Deterministic hash-based train/val/test split: the assignment is a
    * pure function of (salt, doc_id), bit-identical on both engines
    * (md5 60-bit prefix), so a document can never migrate between splits
    * across reruns or engines.
    */
  val q52 = QueryDef("q52_hash_split", (spark, dir) => {
    import graft.ops.Sampling
    val docs = t(spark, dir, "documents").select("doc_id")
    Sampling.hashSplit(docs, "doc_id", salt = "s1",
        fractions = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .withColumn("bucket", Sampling.hashBucket(col("doc_id"), "s1", 10000))
      .select("doc_id", "bucket", "split")
      .orderBy("doc_id")
  }, Some(
    """SELECT doc_id, bucket,
      |  CASE WHEN bucket < 8000 THEN 'train'
      |       WHEN bucket < 9000 THEN 'val'
      |       ELSE 'test' END AS split
      |FROM (
      |  SELECT doc_id,
      |    CAST(('0x' || substr(md5('s1' || CAST(doc_id AS VARCHAR)), 1, 15))
      |      AS BIGINT) % 10000 AS bucket
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin))

  /** Benchmark decontamination: every 50th doc plays the benchmark set;
    * corpus docs sharing any distinct 8-gram with it are flagged. The
    * benchmark docs flag themselves (full overlap) — the realistic shape,
    * since eval sets leak into crawls verbatim.
    */
  val q55 = QueryDef("q55_decontamination", (spark, dir) => {
    val docs = t(spark, dir, "documents")
    TextAnalysis.contaminationFlags(docs,
        docs.filter(col("doc_id") % 50 === 0), "doc_id", "text",
        n = 8, minShared = 1)
      .orderBy("doc_id")
  }, Some(
    """WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS l FROM documents),
      |pos AS (SELECT doc_id, l, unnest(generate_series(1, len(l) - 7)) AS i
      |        FROM toks WHERE len(l) >= 8),
      |g AS (SELECT DISTINCT doc_id,
      |        l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3] || ' ' ||
      |        l[i+4] || ' ' || l[i+5] || ' ' || l[i+6] || ' ' || l[i+7] AS gram
      |      FROM pos),
      |bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0),
      |shared AS (SELECT doc_id, count(*) AS n_shared
      |           FROM g JOIN bench USING (gram) GROUP BY doc_id)
      |SELECT d.doc_id, coalesce(shared.n_shared, 0) AS n_shared,
      |  coalesce(shared.n_shared, 0) >= 1 AS contaminated
      |FROM documents d LEFT JOIN shared ON d.doc_id = shared.doc_id
      |ORDER BY d.doc_id""".stripMargin))

  /** Intra-document n-gram repetition ratio (Gopher-style quality
    * signal); the corpus is augmented with a deliberately repetitive
    * variant of every 25th doc so the signal separates.
    */
  val q56 = QueryDef("q56_repetition_ratio", (spark, dir) => {
    val docs = t(spark, dir, "documents").select("doc_id", "text")
    val spam = docs.filter(col("doc_id") % 25 === 0)
      .select((col("doc_id") + 500000).as("doc_id"),
        concat(col("text"), lit(" "), col("text")).as("text"))
    TextAnalysis.repetitionRatio(docs.unionByName(spam), "doc_id", "text", n = 3)
      .orderBy("doc_id")
  }, Some(
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 500000, text || ' ' || text FROM documents
      |  WHERE doc_id % 25 = 0),
      |toks AS (SELECT doc_id, string_split(lower(text), ' ') AS l FROM corpus),
      |pos AS (SELECT doc_id, l, unnest(generate_series(1, len(l) - 2)) AS i
      |        FROM toks WHERE len(l) >= 3),
      |g AS (SELECT doc_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS gram FROM pos),
      |agg AS (SELECT doc_id, count(*) AS n_ngrams,
      |          count(DISTINCT gram) AS n_distinct
      |        FROM g GROUP BY doc_id)
      |SELECT c.doc_id,
      |  coalesce(agg.n_ngrams, 0) AS n_ngrams,
      |  coalesce(agg.n_distinct, 0) AS n_distinct,
      |  CASE WHEN coalesce(agg.n_ngrams, 0) = 0 THEN 0.0
      |       ELSE round(1.0 - agg.n_distinct::DOUBLE / agg.n_ngrams, 4) END
      |    AS rep_ratio
      |FROM corpus c LEFT JOIN agg ON c.doc_id = agg.doc_id
      |ORDER BY c.doc_id""".stripMargin))

  /** PII-pattern redaction: planted emails/phone numbers must come out as
    * placeholder tags; the oracle replays the identical RE2-compatible
    * regexes and the comparison is on the full redacted text hash plus
    * tag counts.
    */
  val q57 = QueryDef("q57_pii_redaction", (spark, dir) => {
    val planted = t(spark, dir, "documents").select(col("doc_id"),
      concat(col("text"), lit(" contact user"), col("doc_id"),
        lit("@example.com or +1 (555) 010-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0")).as("text"))
    val red = TextAnalysis.redactPii(col("text"))
    planted.select(col("doc_id"), md5(red).as("red_md5"),
        ((length(red) - length(regexp_replace(red, "<EMAIL>", ""))) / 7)
          .cast("long").as("n_email"),
        ((length(red) - length(regexp_replace(red, "<PHONE>", ""))) / 7)
          .cast("long").as("n_phone"))
      .orderBy("doc_id")
  }, Some(
    """WITH planted AS (
      |  SELECT doc_id,
      |    text || ' contact user' || doc_id || '@example.com or +1 (555) 010-' ||
      |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
      |  FROM documents),
      |red AS (SELECT doc_id,
      |    regexp_replace(
      |      regexp_replace(text,
      |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |      '\+?[0-9][0-9()\- \t\n\f\r]{7,}[0-9]', '<PHONE>', 'g') AS r
      |  FROM planted)
      |SELECT doc_id, md5(r) AS red_md5,
      |  CAST((length(r) - length(replace(r, '<EMAIL>', ''))) / 7 AS BIGINT) AS n_email,
      |  CAST((length(r) - length(replace(r, '<PHONE>', ''))) / 7 AS BIGINT) AS n_phone
      |FROM red ORDER BY doc_id""".stripMargin))

  /** MinHash+LSH with the hot-bucket skew cap ON — the production plan
    * shape for template-heavy corpora. Held to the same exact-Jaccard
    * oracle as the uncapped q27: the green hash is itself the proof that
    * the cap costs no recall on this corpus (no LSH bucket exceeds 50
    * docs), the identical contract q26 pins for the shingle-frequency
    * cap.
    */
  val q63 = QueryDef("q63_minhash_capped", (spark, dir) =>
    Dedup.minhashLshPairs(t(spark, dir, "documents"), "doc_id", "text",
        threshold = 0.6, maxBandFreq = Some(50))
      .orderBy("a_id", "b_id"),
    Some(jaccardOracle))

  /** Fuzzy decontamination ([[TextAnalysis.fuzzyContamination]]): the
    * reference set is every 40th document re-rendered with a two-token
    * suffix (a near- but not exact duplicate of its source), offset into
    * a disjoint id space. The oracle computes EXACT Jaccard across the
    * two shingle sets — with 2-row bands the LSH candidate stage has
    * ~1e-9 miss probability above the 0.7 threshold, so the exact-pair
    * oracle pins both the verification arithmetic and the recall claim.
    */
  val q113 = QueryDef("q113_fuzzy_decontamination", (spark, dir) => {
    val docs = t(spark, dir, "documents").select("doc_id", "text")
    val ref = docs.filter(col("doc_id") % 40 === 0)
      .select((col("doc_id") + 900000).as("doc_id"),
        concat(col("text"), lit(" eval probe")).as("text"))
    TextAnalysis.fuzzyContamination(docs, ref, "doc_id", "text",
        threshold = 0.7)
      .orderBy("doc_id", "ref_id")
  }, Some(
    """WITH refs AS (
      |  SELECT doc_id + 900000 AS doc_id, text || ' eval probe' AS text
      |  FROM documents WHERE doc_id % 40 = 0),
      |ctoks AS (SELECT doc_id, string_split(lower(text), ' ') AS l FROM documents),
      |cpos AS (SELECT doc_id, l, unnest(generate_series(1, len(l) - 2)) AS i
      |         FROM ctoks WHERE len(l) >= 3),
      |csh AS (SELECT DISTINCT doc_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS shingle
      |        FROM cpos),
      |rtoks AS (SELECT doc_id, string_split(lower(text), ' ') AS l FROM refs),
      |rpos AS (SELECT doc_id, l, unnest(generate_series(1, len(l) - 2)) AS i
      |         FROM rtoks WHERE len(l) >= 3),
      |rsh AS (SELECT DISTINCT doc_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS shingle
      |        FROM rpos),
      |cs AS (SELECT doc_id, count(*) AS n FROM csh GROUP BY doc_id),
      |rs AS (SELECT doc_id, count(*) AS n FROM rsh GROUP BY doc_id),
      |inter AS (SELECT c.doc_id AS did, r.doc_id AS rid, count(*) AS n_inter
      |          FROM csh c JOIN rsh r ON c.shingle = r.shingle
      |          GROUP BY 1, 2)
      |SELECT did AS doc_id, rid AS ref_id,
      |  round(n_inter::DOUBLE / (cs.n + rs.n - n_inter), 4) AS jaccard
      |FROM inter
      |JOIN cs ON cs.doc_id = did
      |JOIN rs ON rs.doc_id = rid
      |WHERE n_inter::DOUBLE / (cs.n + rs.n - n_inter) >= 0.7
      |ORDER BY doc_id, ref_id""".stripMargin))

  val all: Seq[QueryDef] = Seq(q24, q25, q26, q27, q28, q29, q30, q31, q32,
    q33, q34, q35, q40, q51, q52, q53, q55, q56, q57, q58, q63, q64, q92,
    q98, q113, q119, q123)
}
