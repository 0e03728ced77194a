package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.EtlJob
import graft.functions.TextFunctions
import graft.ops.{Chunking, Dedup, Dsir, QualityClassifier, Sampling, Scd,
  Stats, TextAnalysis, WebText}

/** Manifest-loadable job classes for the training-data pipeline — the
  * `class:` twin of the reference's frameworked jobs
  * (`jobs/examples/ex1_frameworked_job.py`), each a thin adapter from
  * manifest params onto a library operator so the whole dedup → quality
  * → split flow runs from YAML alone (see `conf/llm_pipeline.yml`).
  *
  * Params every job shares: `id_col` (default `doc_id`), `text_col`
  * (default `text`).
  */
private object P {
  def id(params: Map[String, String]): String = params.getOrElse("id_col", "doc_id")
  def text(params: Map[String, String]): String = params.getOrElse("text_col", "text")
}

/** Exact near-copy removal: keep the lowest-id document per content
  * fingerprint (whitespace-normalized md5). Runs FIRST in the pipeline —
  * the recall contract of the pair-based near-dup operators assumes
  * unbounded exact-copy groups are already collapsed.
  */
class DedupExactJob extends EtlJob {
  def transform(inputs: Map[String, DataFrame], spark: SparkSession,
                params: Map[String, String]): DataFrame = {
    val df = inputs.values.head
    Dedup.exactKeepFirst(
      df.withColumn("_fp", TextFunctions.fingerprint(col(P.text(params)))),
      Seq("_fp"), Seq(col(P.id(params)))).drop("_fp")
  }
}

/** Exact dedup at the NORMALIZED-text grain from YAML
  * ([[Dedup.dedupExactNormalized]]): collapses re-rendered copies
  * (casing/punctuation/digit-run/whitespace variants) in one
  * hash-groupBy, keeping the min id with a `n_copies` count — the
  * aggressive-canonicalization complement of [[DedupExactJob]].
  */
class NormalizedDedupJob extends EtlJob {
  def transform(inputs: Map[String, DataFrame], spark: SparkSession,
                params: Map[String, String]): DataFrame =
    Dedup.dedupExactNormalized(inputs.values.head, P.id(params), P.text(params))
}

/** DSIR importance-resampled selection from YAML ([[graft.ops.Dsir]]):
  * fit hashed-n-gram LMs on the `target_input` frame and the raw corpus
  * (the remaining input), score the raw corpus with importance
  * log-weights, keep a deterministic Gumbel-top-`k`, and return the
  * selected documents with their scores. Params: `target_input`
  * (required — the input name holding the target corpus), `n` (2),
  * `buckets` (4096), `alpha` (1.0), `k` (required), `salt`.
  */
class DsirSelectJob extends EtlJob {
  def transform(inputs: Map[String, DataFrame], spark: SparkSession,
                params: Map[String, String]): DataFrame = {
    val targetName = params.getOrElse("target_input",
      sys.error("DsirSelectJob: target_input param is required"))
    require(inputs.contains(targetName),
      s"DsirSelectJob: no input named '$targetName' (have ${inputs.keys.mkString(", ")})")
    val target = inputs(targetName)
    val raw = (inputs - targetName).values.headOption.getOrElse(
      sys.error("DsirSelectJob: needs a raw-corpus input besides target_input"))
    val textCol = P.text(params)
    val n = params.getOrElse("n", "2").toInt
    val buckets = params.getOrElse("buckets", "4096").toInt
    val alpha = params.getOrElse("alpha", "1.0").toDouble
    val k = params.getOrElse("k", sys.error("DsirSelectJob: k is required")).toInt
    val salt = params.getOrElse("salt", "dsir")
    val tLm = Dsir.fitHashedLm(target, textCol, n, buckets, alpha, salt)
    val rLm = Dsir.fitHashedLm(raw, textCol, n, buckets, alpha, salt)
    val w = Dsir.importanceWeights(raw, P.id(params), textCol, tLm, rLm,
      n, buckets, salt)
    Dsir.gumbelTopK(w, "doc_id", k, salt + "_gumbel")
      .join(raw.withColumnRenamed(P.id(params), "doc_id"), "doc_id")
  }
}

/** Model-based quality filter from YAML
  * ([[graft.ops.QualityClassifier]]): train the hashed bag-of-words
  * logistic model on the labeled input (`label_col`, default `label`),
  * score the same rows with the exact integer-logit pass, and keep docs
  * whose rounded score clears `tau`. Params: `buckets` (1024), `tau`
  * (0.5), `label_col`. Separate score-only corpora plug in by training
  * upstream and persisting the weight table ([[QualityClassifier]]'s
  * scoreDocs works from any weights frame).
  */
class ClassifierFilterJob extends EtlJob {
  def transform(inputs: Map[String, DataFrame], spark: SparkSession,
                params: Map[String, String]): DataFrame = {
    val df = inputs.values.head
    val buckets = params.getOrElse("buckets", "1024").toInt
    val tau = params.getOrElse("tau", "0.5").toDouble
    val weights = QualityClassifier.fitQualityModel(df, P.text(params),
      params.getOrElse("label_col", "label"), buckets)
    QualityClassifier.filterByQuality(df, P.id(params), P.text(params),
        weights, buckets, tau)
      .filter(col("kept"))
      .join(df.withColumnRenamed(P.id(params), "doc_id"), "doc_id")
  }
}

/** Near-duplicate removal: MinHash+LSH candidate pairs (verified with
  * exact Jaccard at `threshold`, default 0.8) clustered by connected
  * components; one document — the minimum id — survives per cluster.
  * Runs AFTER [[DedupExactJob]] per the operator's recall contract
  * (unbounded exact-copy groups must already be collapsed). Params:
  * `threshold`, `ngram` (shingle width, default 3), `max_band_freq`
  * (optional hot-bucket skew cap — see `Dedup.minhashLshPairs`).
  */
class NearDupJob extends EtlJob {
  def transform(inputs: Map[String, DataFrame], spark: SparkSession,
                params: Map[String, String]): DataFrame =
    Dedup.dropNearDuplicates(inputs.values.head, P.id(params), P.text(params),
      threshold = params.getOrElse("threshold", "0.8").toDouble,
      n = params.getOrElse("ngram", "3").toInt,
      maxBandFreq = params.get("max_band_freq").map(_.toInt))
}

/** SemDeDup-style semantic dedup from YAML: k-means the embedding column
  * into `cells`, pair within cells at exact cosine ≥ `threshold`, contract
  * with connected components, keep the minimum id per semantic cluster
  * ([[Dedup.semanticDedup]]). Catches paraphrases/re-renderings lexical
  * dedup misses; run it AFTER the lexical stages so cheap exact/LSH passes
  * shrink the corpus first. Params: `emb_col` (default `embedding`),
  * `threshold` (default 0.9), `cells` (default 256), `seed`, and
  * optionally `cell_path`: when set, the k-means cell assignment is
  * materialized there as parquet (`vec_id`, `cell`) and the dedup reads
  * it back — so the clustering can be audited and reused across
  * thresholds/reruns ([[Dedup.semanticDedupWithCells]]) instead of
  * re-trained per run.
  */
class SemanticDedupJob extends EtlJob {
  def transform(inputs: Map[String, DataFrame], spark: SparkSession,
                params: Map[String, String]): DataFrame = {
    val df = inputs.values.head
    val embCol = params.getOrElse("emb_col", "embedding")
    val threshold = params.getOrElse("threshold", "0.9").toDouble
    val cells = params.getOrElse("cells", "256").toInt
    val seed = params.getOrElse("seed", "42").toLong
    params.get("cell_path") match {
      case None =>
        Dedup.semanticDedup(df, P.id(params), embCol, threshold, cells, seed)
      case Some(path) =>
        val emb = df.select(col(P.id(params)).as("vec_id"),
          col(embCol).as("embedding"))
        val (clustered, _) = graft.ops.Similarity.kmeansCells(emb, cells, seed)
        clustered.select("vec_id", "cell")
          .write.mode("overwrite").parquet(path)
        Dedup.semanticDedupWithCells(df, spark.read.parquet(path),
          P.id(params), embCol, "cell", threshold)
    }
  }
}

/** Multimodal feature extraction from YAML: byte-block mean features over
  * an opaque binary payload column ([[graft.ops.Multimodal.extractFeatures]]
  * — the partition-local decode→vector seam; swap the block means for a
  * real decoder on a cluster with media libs). Params: `payload_col`
  * (default `payload`), `dim` (default 16).
  */
class FeatureExtractJob extends EtlJob {
  def transform(inputs: Map[String, DataFrame], spark: SparkSession,
                params: Map[String, String]): DataFrame =
    graft.ops.Multimodal.extractFeatures(inputs.values.head, P.id(params),
      params.getOrElse("payload_col", "payload"),
      dim = params.getOrElse("dim", "16").toInt)
}

/** Int8 vector quantization from YAML ([[graft.ops.Similarity.quantizeInt8]]):
  * per-row symmetric scale, quantized `qvec`, reconstruction error — the
  * storage/bandwidth reduction step between feature extraction and any
  * similarity stage. Params: `vec_col` (default `embedding`).
  */
class QuantizeInt8Job extends EtlJob {
  def transform(inputs: Map[String, DataFrame], spark: SparkSession,
                params: Map[String, String]): DataFrame =
    graft.ops.Similarity.quantizeInt8(inputs.values.head, P.id(params),
      params.getOrElse("vec_col", "embedding"))
}

/** Quality gate: score each document (length/punct/digit/stopword mix)
  * and keep rows at/above `min_quality` (default 0.3). The score is a
  * pure function of the text column already on the row
  * ([[TextAnalysis.qualityExpr]]), so the gate is an in-place
  * withColumn + filter — no join, no shuffle; at corpus scale the stage
  * is a single narrow pass.
  */
class QualityFilterJob extends EtlJob {
  def transform(inputs: Map[String, DataFrame], spark: SparkSession,
                params: Map[String, String]): DataFrame = {
    val df = inputs.values.head
    val minQ = params.getOrElse("min_quality", "0.3").toDouble
    df.withColumn("quality", TextAnalysis.qualityExpr(col(P.text(params))))
      .filter(col("quality") >= minQ)
  }
}

/** Dataset-card statistics from YAML: per-group (default `lang`) doc
  * counts, token/char totals, and mean quality — the corpus summary a
  * training-data pipeline publishes next to each snapshot. Pure column
  * expressions + one bounded-key aggregation; no joins, no corpus-sized
  * shuffle.
  */
class CorpusStatsJob extends EtlJob {
  def transform(inputs: Map[String, DataFrame], spark: SparkSession,
                params: Map[String, String]): DataFrame = {
    val df = inputs.values.head
    val text = col(P.text(params))
    df.select(col(params.getOrElse("group_by", "lang")).as("grp"),
        TextFunctions.tokenCount(text).cast("long").as("_nt"),
        length(text).cast("long").as("_nc"),
        TextAnalysis.qualityExpr(text).as("_q"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n_docs"),
        sum("_nt").as("total_tokens"),
        sum("_nc").as("total_chars"),
        round(avg("_q"), 4).as("mean_quality"))
      .orderBy("grp")
  }
}

/** Dataset-card DISTRIBUTION section from the same one-manifest run as
  * [[CorpusStatsJob]]'s totals: the quality score's exact equi-width
  * histogram ([[Stats.histogram]]) plus its per-group numeric profile
  * ([[Stats.profile]]), long-format in one frame — `(section, k, cnt,
  * v1..v4)`, histogram rows carrying (lo_edge, hi_edge) and profile rows
  * (min, max, mean, stddev). The quality column is the SAME
  * [[TextAnalysis.qualityExpr]] the gate uses, so the published card can
  * never diverge from the filter it documents. Params: `group_by`
  * (default `lang`), `bins`/`lo`/`hi` (default 10 over [0, 1]).
  */
class CorpusCardJob extends EtlJob {
  def transform(inputs: Map[String, DataFrame], spark: SparkSession,
                params: Map[String, String]): DataFrame = {
    val df = inputs.values.head
    val text = col(P.text(params))
    val bins = params.getOrElse("bins", "10").toInt
    val lo = params.getOrElse("lo", "0.0").toDouble
    val hi = params.getOrElse("hi", "1.0").toDouble
    val scored = df.select(
      col(params.getOrElse("group_by", "lang")).as("_g"),
      TextAnalysis.qualityExpr(text).as("_q"))
    val hist = Stats.histogram(scored, "_q", lo, hi, bins)
      .select(lit("quality_hist").as("section"),
        col("bucket").cast("string").as("k"), col("cnt"),
        col("lo_edge").as("v1"), col("hi_edge").as("v2"),
        lit(null).cast("double").as("v3"), lit(null).cast("double").as("v4"))
    val prof = Stats.profile(scored, "_g", "_q")
      .select(lit("quality_profile").as("section"),
        col("grp").cast("string").as("k"), col("cnt"),
        col("min_v").as("v1"), col("max_v").as("v2"),
        col("mean_v").as("v3"), col("stddev_pop").as("v4"))
    hist.unionByName(prof).orderBy("section", "k")
  }
}

/** Type-2 dimension maintenance from YAML: merges the input named by
  * `snapshot_input` (default `snapshot`) into the dimension named by
  * `dim_input` (default `dim`) via [[Scd.scd2Merge]]. Params: `keys` and
  * `tracked` (comma-separated column lists), `snapshot_date` (required),
  * `valid_from_col`/`valid_to_col` (default `valid_from`/`valid_to`).
  */
class Scd2MergeJob extends EtlJob {
  def transform(inputs: Map[String, DataFrame], spark: SparkSession,
                params: Map[String, String]): DataFrame = {
    val dim = inputs(params.getOrElse("dim_input", "dim"))
    val snap = inputs(params.getOrElse("snapshot_input", "snapshot"))
    Scd.scd2Merge(dim, snap,
      keys = params.getOrElse("keys", P.id(params)).split(",").map(_.trim).toSeq,
      tracked = params.getOrElse("tracked",
        sys.error("Scd2MergeJob needs param 'tracked'")).split(",").map(_.trim).toSeq,
      snapshotDate = params.getOrElse("snapshot_date",
        sys.error("Scd2MergeJob needs param 'snapshot_date'")),
      validFrom = params.getOrElse("valid_from_col", "valid_from"),
      validTo = params.getOrElse("valid_to_col", "valid_to"),
      closeMissing = params.getOrElse("close_missing", "false").toBoolean)
  }
}

/** Fuzzy decontamination from YAML
  * ([[TextAnalysis.dropFuzzyContaminated]]): drop corpus documents that
  * are MinHash near-duplicates of the reference input named by
  * `ref_input` (default `eval_ref`). Params: `threshold` (default 0.7).
  */
class FuzzyDecontaminateJob extends EtlJob {
  def transform(inputs: Map[String, DataFrame], spark: SparkSession,
                params: Map[String, String]): DataFrame = {
    val refInput = params.getOrElse("ref_input", "eval_ref")
    require(inputs.contains(refInput),
      s"FuzzyDecontaminateJob needs an input named '$refInput' " +
        s"(have: ${inputs.keys.mkString(", ")})")
    TextAnalysis.dropFuzzyContaminated((inputs - refInput).values.head,
      inputs(refInput), P.id(params), P.text(params),
      threshold = params.getOrElse("threshold", "0.7").toDouble)
  }
}

/** robots.txt politeness gate from YAML
  * ([[graft.ops.Robots.filterAllowed]]): the input named by
  * `robots_input` (default `robots`) supplies `(domain, robots_txt)`;
  * the remaining input is the page table, filtered in place. Params:
  * `url_col` (default `url`), `domain_col`, `txt_col`.
  */
class RobotsFilterJob extends EtlJob {
  def transform(inputs: Map[String, DataFrame], spark: SparkSession,
                params: Map[String, String]): DataFrame = {
    val robotsInput = params.getOrElse("robots_input", "robots")
    require(inputs.contains(robotsInput),
      s"RobotsFilterJob needs an input named '$robotsInput' " +
        s"(have: ${inputs.keys.mkString(", ")})")
    graft.ops.Robots.filterAllowed((inputs - robotsInput).values.head,
      inputs(robotsInput),
      urlCol = params.getOrElse("url_col", "url"),
      domainCol = params.getOrElse("domain_col", "domain"),
      txtCol = params.getOrElse("txt_col", "robots_txt"))
  }
}

/** HTML → visible-text extraction from YAML ([[WebText.htmlToText]]):
  * the head of a raw-crawl branch. Reads `html_col` (default `html`),
  * appends the extracted `text_col` + `n_chars`, and drops the raw HTML
  * unless `keep_html: "true"` — downstream line-grain gates (C4, Gopher)
  * then see real text. Row-local, shuffle-free.
  */
class HtmlExtractJob extends EtlJob {
  def transform(inputs: Map[String, DataFrame], spark: SparkSession,
                params: Map[String, String]): DataFrame = {
    val htmlCol = params.getOrElse("html_col", "html")
    val out = inputs.values.head
      .withColumn(P.text(params), WebText.htmlToText(col(htmlCol)))
      .withColumn("n_chars", length(col(P.text(params))).cast("long"))
    if (params.getOrElse("keep_html", "false").toBoolean) out
    else out.drop(htmlCol)
  }
}

/** Host-graph PageRank from YAML ([[graft.ops.Graph.pageRank]]): turn a
  * link table into `(id, rank_micro)` host quality priors. Params:
  * `src_col`/`dst_col` (defaults `src`/`dst`), `iterations` (default 5),
  * `damping_ppm` (default 850000), `checkpoint_every` (default 5).
  */
class PageRankJob extends EtlJob {
  def transform(inputs: Map[String, DataFrame], spark: SparkSession,
                params: Map[String, String]): DataFrame =
    graft.ops.Graph.pageRank(inputs.values.head,
      params.getOrElse("src_col", "src"),
      params.getOrElse("dst_col", "dst"),
      iterations = params.getOrElse("iterations", "5").toInt,
      dampingPpm = params.getOrElse("damping_ppm", "850000").toLong,
      checkpointEvery = params.getOrElse("checkpoint_every", "5").toInt)
}

/** C4-style line cleanup from YAML ([[WebText.c4CleanDocs]]): drop
  * boilerplate lines (short, unpunctuated, or blocklisted), replace the
  * text column with the reassembled clean text, and drop documents with
  * fewer than `min_kept` surviving lines (C4 uses 3). Params:
  * `min_words` (per line, default 5), `min_kept` (default 1),
  * `blocklist` (comma-separated, default lorem-ipsum/javascript/cookie).
  */
class C4CleanJob extends EtlJob {
  def transform(inputs: Map[String, DataFrame], spark: SparkSession,
                params: Map[String, String]): DataFrame = {
    val df = inputs.values.head
    val blocklist = params.get("blocklist")
      .map(_.split(",").map(_.trim).toSeq)
      .getOrElse(WebText.defaultBlocklist)
    WebText.c4CleanDocs(df, P.text(params),
        minWords = params.getOrElse("min_words", "5").toInt,
        blocklist = blocklist)
      .filter(col("n_kept") >= params.getOrElse("min_kept", "1").toInt)
      .withColumn(P.text(params), col("clean_text"))
      .drop("n_lines", "n_kept", "clean_text")
  }
}

/** Gopher rule gate from YAML ([[TextAnalysis.gopherFlags]]): keep rows
  * passing every deterministic Gopher rule, in place (no join, no
  * shuffle). Thresholds via params (`min_words`, `max_words`,
  * `min_mean_len`, `max_mean_len`, `max_symbol_ratio`,
  * `min_alpha_ratio`, `max_bullet_frac`, `max_ellipsis_frac`,
  * `min_stop_hits`); `keep_metrics: "true"` retains the metric columns.
  */
class GopherFilterJob extends EtlJob {
  def transform(inputs: Map[String, DataFrame], spark: SparkSession,
                params: Map[String, String]): DataFrame = {
    def d(k: String, v: Double) = params.get(k).map(_.toDouble).getOrElse(v)
    def i(k: String, v: Int) = params.get(k).map(_.toInt).getOrElse(v)
    val flagged = TextAnalysis.gopherFlags(inputs.values.head, P.text(params),
      minWords = i("min_words", 50), maxWords = i("max_words", 100000),
      minMeanLen = d("min_mean_len", 3.0), maxMeanLen = d("max_mean_len", 10.0),
      maxSymbolRatio = d("max_symbol_ratio", 0.1),
      minAlphaRatio = d("min_alpha_ratio", 0.8),
      maxBulletFrac = d("max_bullet_frac", 0.9),
      maxEllipsisFrac = d("max_ellipsis_frac", 0.3),
      minStopHits = i("min_stop_hits", 2)).filter(col("keep"))
    if (params.getOrElse("keep_metrics", "false").toBoolean) flagged
    else flagged.drop(TextAnalysis.gopherCols: _*)
  }
}

/** Context-window chunking from YAML ([[Chunking.chunkTokens]]): one row
  * per `chunk_size`-token window every `stride` tokens (default
  * non-overlapping). Params: `chunk_size` (default 1024), `stride`
  * (default = chunk_size).
  */
class ChunkJob extends EtlJob {
  def transform(inputs: Map[String, DataFrame], spark: SparkSession,
                params: Map[String, String]): DataFrame = {
    val size = params.getOrElse("chunk_size", "1024").toInt
    Chunking.chunkTokens(inputs.values.head, P.id(params), P.text(params),
      chunkSize = size, stride = params.getOrElse("stride", size.toString).toInt)
  }
}

/** Sequence packing from YAML ([[Sampling.packSequences]]): assign each
  * row a (shard, bin, bin_offset) so training concatenates rows into
  * fixed `budget`-token bins, reproducibly. Params: `budget` (required),
  * `token_col` (default `n_tokens` — [[ChunkJob]]'s output feeds this
  * directly), `shards` (default 1024), `salt`.
  */
class PackSequencesJob extends EtlJob {
  def transform(inputs: Map[String, DataFrame], spark: SparkSession,
                params: Map[String, String]): DataFrame =
    Sampling.packSequences(inputs.values.head, P.id(params),
      params.getOrElse("token_col", "n_tokens"),
      budget = params.getOrElse("budget",
        sys.error("PackSequencesJob needs param 'budget'")).toLong,
      shards = params.getOrElse("shards", "1024").toInt,
      salt = params.getOrElse("salt", "pack"))
}

/** Vocabulary induction + token-id encoding from YAML
  * ([[TextAnalysis.buildVocab]] + [[encodeDocs]]): self-trained on the
  * input corpus, OOV → 0. Params: `vocab_size` (default 65536),
  * `min_count` (default 1).
  */
class VocabEncodeJob extends EtlJob {
  def transform(inputs: Map[String, DataFrame], spark: SparkSession,
                params: Map[String, String]): DataFrame = {
    val df = inputs.values.head
    val vocab = TextAnalysis.buildVocab(df, P.text(params),
      maxSize = params.getOrElse("vocab_size", "65536").toInt,
      minCount = params.getOrElse("min_count", "1").toLong)
    TextAnalysis.encodeDocs(df, P.id(params), P.text(params), vocab)
  }
}

/** Deterministic train/val/test assignment: a pure function of
  * (`salt`, id) — `fractions` like "train:0.9,val:0.05,test:0.05" —
  * so membership never shifts across reruns, partitionings, or engines.
  */
class HashSplitJob extends EtlJob {
  def transform(inputs: Map[String, DataFrame], spark: SparkSession,
                params: Map[String, String]): DataFrame = {
    val df = inputs.values.head
    val fractions = params.getOrElse("fractions", "train:0.9,val:0.05,test:0.05")
      .split(",").toSeq.map { part =>
        val Array(name, frac) = part.split(":")
        name.trim -> frac.trim.toDouble
      }
    Sampling.hashSplit(df, P.id(params), params.getOrElse("salt", "graft"),
      fractions)
  }
}
