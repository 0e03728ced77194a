package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.EtlJob
import graft.functions.TextFunctions
import graft.ops.{Sampling, Sketches, TextAnalysis}

/** Manifest-loadable adapters onto the round-7 curation operators
  * (`conf/curate_pipeline.yml`), same `class:` mechanism as
  * [[LlmPipelineJobs]] / [[EventsJobs]].
  */

/** Pairwise corpus-overlap cards ([[Sketches.kmvOverlapCards]]).
  * Params: `group_col` (required); either `value_col` (pre-exploded
  * values) or `text_col` + optional `shingle_n` (default 3) to shingle
  * here; `k` (default 128); `with_exact` (default true — set false for
  * the corpus-shuffle-free production path).
  */
class CorpusOverlapJob extends EtlJob {
  def transform(inputs: Map[String, DataFrame], spark: SparkSession,
                params: Map[String, String]): DataFrame = {
    val in = inputs.values.head
    val group = params.getOrElse("group_col",
      sys.error("CorpusOverlapJob needs a 'group_col' param"))
    val values = params.get("value_col") match {
      case Some(v) => in.select(col(group), col(v).as("value"))
      case None =>
        val textCol = params.getOrElse("text_col", "text")
        val n = params.getOrElse("shingle_n", "3").toInt
        in.select(col(group),
          explode(TextFunctions.shingles(col(textCol), n)).as("value"))
    }
    Sketches.kmvOverlapCards(values, group, "value",
      k = params.getOrElse("k", "128").toInt,
      withExact = params.getOrElse("with_exact", "true").toBoolean)
      .orderBy("grp_a", "grp_b")
  }
}

/** CCNet head/middle/tail perplexity split
  * ([[TextAnalysis.perplexityBuckets]]). Params: `id_col` (default
  * `doc_id`), `text_col` (`text`), `lang_col` (`lang`), `exact`
  * (default true), `keep` (optional comma-list, e.g. `head,middle` —
  * when set, rows outside those buckets are dropped, the CCNet gate).
  */
class PerplexityBucketJob extends EtlJob {
  def transform(inputs: Map[String, DataFrame], spark: SparkSession,
                params: Map[String, String]): DataFrame = {
    val out = TextAnalysis.perplexityBuckets(inputs.values.head,
      params.getOrElse("id_col", "doc_id"),
      params.getOrElse("text_col", "text"),
      params.getOrElse("lang_col", "lang"),
      exact = params.getOrElse("exact", "true").toBoolean)
    params.get("keep") match {
      case Some(ks) =>
        val keep = ks.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        out.filter(col("bucket").isin(keep: _*))
      case None => out
    }
  }
}

/** Weighted priority sampling ([[Sampling.prioritySample]]). Params:
  * `id_col` (default `doc_id`), `weight_col` (required), `n` (required),
  * `salt` (default `es`).
  */
class PrioritySampleJob extends EtlJob {
  def transform(inputs: Map[String, DataFrame], spark: SparkSession,
                params: Map[String, String]): DataFrame =
    Sampling.prioritySample(inputs.values.head,
      params.getOrElse("id_col", "doc_id"),
      params.getOrElse("weight_col",
        sys.error("PrioritySampleJob needs a 'weight_col' param")),
      n = params.getOrElse("n",
        sys.error("PrioritySampleJob needs an 'n' param")).toInt,
      salt = params.getOrElse("salt", "es"))
}

/** Stupid-Backoff bigram LM ([[TextAnalysis.bigramLmScore]]): scores the
  * input named `score` against tables trained on the input named
  * `train` (both required — held-out scoring is the operator's point).
  * Params: `id_col` (default `doc_id`), `text_col` (`text`), `alpha`
  * (default 0.4); `train_input`/`score_input` remap the expected input
  * names (in-memory `type: df` inputs are named after their dependency
  * job).
  */
class BigramLmJob extends EtlJob {
  def transform(inputs: Map[String, DataFrame], spark: SparkSession,
                params: Map[String, String]): DataFrame = {
    def named(p: String, dflt: String) = {
      val n = params.getOrElse(p, dflt)
      inputs.getOrElse(n, sys.error(s"BigramLmJob needs an input named '$n'"))
    }
    TextAnalysis.bigramLmScore(named("score_input", "score"),
      named("train_input", "train"),
      params.getOrElse("id_col", "doc_id"),
      params.getOrElse("text_col", "text"),
      alpha = params.getOrElse("alpha", "0.4").toDouble)
  }
}

/** Quarantine ingestion from the manifest: the single input is the raw
  * file declared with `type: text` (one `value` column — the same scan
  * `Reader.readJsonQuarantine` starts from, so `input_file_name()`
  * provenance still works); the GOOD lane is the job's output frame,
  * the bad lane lands in `quarantine_dir`. Params: `schema` (DDL,
  * required), `format` (`json` default | `csv`), `quarantine_dir`
  * (required — an ingest that silently discards its rejects is the
  * failure mode this job exists to prevent).
  */
class QuarantineLoadJob extends EtlJob {
  def transform(inputs: Map[String, DataFrame], spark: SparkSession,
                params: Map[String, String]): DataFrame = {
    val raw = inputs.values.headOption.getOrElse(
      sys.error("QuarantineLoadJob needs one text input"))
    require(raw.columns.sameElements(Array("value")),
      "QuarantineLoadJob input must be a raw text scan (type: text)")
    val schema = params.getOrElse("schema",
      sys.error("QuarantineLoadJob needs a 'schema' param (DDL)"))
    val qdir = params.getOrElse("quarantine_dir",
      sys.error("QuarantineLoadJob needs a 'quarantine_dir' param"))
    val isJson = params.getOrElse("format", "json") match {
      case "json" => true
      case "csv" => false
      case other => sys.error(
        s"QuarantineLoadJob format must be json or csv, got '$other'")
    }
    val q = graft.core.io.Reader.quarantineSplit(raw, schema, isJson)
    q.bad.select("raw_line").write.mode("overwrite").text(qdir)
    q.good
  }
}

/** Targeted delete ([[graft.core.io.Maintenance.deleteMatching]]): the
  * input frame IS the delete list; `target_path` names the parquet
  * dataset to rewrite in place. Returns the one-row deletion report
  * (files_total/files_affected/files_rewritten/rows_deleted) — wire an
  * `output:` to keep the audit trail.
  * Params: `target_path` (required), `id_col` (required), `manifest`
  * (optional — an existing skipping manifest to delta-refresh after
  * the rewrites, so forgets and their manifest tick travel together).
  */
class TargetedDeleteJob extends EtlJob {
  def transform(inputs: Map[String, DataFrame], spark: SparkSession,
                params: Map[String, String]): DataFrame = {
    val target = params.getOrElse("target_path",
      sys.error("TargetedDeleteJob needs a 'target_path' param"))
    val idCol = params.getOrElse("id_col",
      sys.error("TargetedDeleteJob needs an 'id_col' param"))
    val r = graft.core.io.Maintenance.deleteMatching(
      spark, target, idCol, inputs.values.head,
      statsManifest = params.get("manifest"))
    import spark.implicits._
    Seq((target, r.filesTotal, r.filesAffected, r.filesRewritten,
      r.rowsDeleted))
      .toDF("target_path", "files_total", "files_affected",
        "files_rewritten", "rows_deleted")
  }
}

/** Deterministic word dropout ([[TextAnalysis.wordDropout]]) — the
  * augmentation step of a curation pipeline. Params: `id_col` (default
  * `doc_id`), `text_col` (default `text`), `rate` (default 0.1),
  * `salt` (default `dropout`).
  */
class WordDropoutJob extends EtlJob {
  def transform(inputs: Map[String, DataFrame], spark: SparkSession,
                params: Map[String, String]): DataFrame =
    TextAnalysis.wordDropout(inputs.values.head,
      params.getOrElse("id_col", "doc_id"),
      params.getOrElse("text_col", "text"),
      rate = params.getOrElse("rate", "0.1").toDouble,
      salt = params.getOrElse("salt", "dropout"))
}

/** Leakage-safe temporal split ([[Sampling.temporalSplit]]). Params:
  * `ts_col` (default `ts`), `cutoff` (required, `yyyy-MM-dd HH:mm:ss`),
  * `embargo_seconds` (default 0), `out_col` (default `split`).
  */
class TemporalSplitJob extends EtlJob {
  def transform(inputs: Map[String, DataFrame], spark: SparkSession,
                params: Map[String, String]): DataFrame =
    Sampling.temporalSplit(inputs.values.head,
      params.getOrElse("ts_col", "ts"),
      params.getOrElse("cutoff",
        sys.error("TemporalSplitJob needs a 'cutoff' param")),
      embargoSeconds = params.getOrElse("embargo_seconds", "0").toLong,
      outCol = params.getOrElse("out_col", "split"))
}

/** SCD type-1 upsert ([[graft.ops.Scd.scd1Upsert]]): inputs must be
  * named `dim` and `changes`. Params: `keys` (required,
  * comma-separated), `order_cols` (required, comma-separated).
  */
class Scd1UpsertJob extends EtlJob {
  def transform(inputs: Map[String, DataFrame], spark: SparkSession,
                params: Map[String, String]): DataFrame = {
    def list(k: String) = params.getOrElse(k,
      sys.error(s"Scd1UpsertJob needs a '$k' param"))
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    graft.ops.Scd.scd1Upsert(
      inputs.getOrElse("dim", sys.error("Scd1UpsertJob needs a 'dim' input")),
      inputs.getOrElse("changes",
        sys.error("Scd1UpsertJob needs a 'changes' input")),
      list("keys"), list("order_cols"))
  }
}

/** BM25 retrieval ([[graft.ops.Search.bm25TopK]]): inputs named `docs`
  * and `queries`. Params: `id_col`/`text_col` (defaults `doc_id`/
  * `text`), `query_id_col`/`query_text_col` (defaults `query_id`/
  * `qtext`), `k` (default 5).
  */
class Bm25Job extends EtlJob {
  def transform(inputs: Map[String, DataFrame], spark: SparkSession,
                params: Map[String, String]): DataFrame =
    graft.ops.Search.bm25TopK(
      inputs.getOrElse("docs", sys.error("Bm25Job needs a 'docs' input")),
      inputs.getOrElse("queries", sys.error("Bm25Job needs a 'queries' input")),
      params.getOrElse("id_col", "doc_id"),
      params.getOrElse("text_col", "text"),
      params.getOrElse("query_id_col", "query_id"),
      params.getOrElse("query_text_col", "qtext"),
      k = params.getOrElse("k", "5").toInt)
}
