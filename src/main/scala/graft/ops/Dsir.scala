package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Data Selection via Importance Resampling (DSIR — Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"):
  * select raw-corpus documents whose hashed-n-gram distribution looks
  * like a small TARGET corpus. Two bag-of-hashed-n-grams unigram LMs are
  * fit (target and raw), each document is scored with the importance
  * log-weight Σ_g [log p̂_target(g) − log p̂_raw(g)], and the selection is
  * a deterministic Gumbel-top-k over the weights — the paper's sampling-
  * without-replacement construction, with the Gumbel noise derived from a
  * salted md5 hash of the id so the draw is reproducible (and replayable
  * by an external engine) rather than RNG-dependent.
  *
  * Scale shape: the feature space is a FIXED `buckets`-sized hash table,
  * so both LMs are tiny broadcastable tables no matter the corpus size;
  * scoring is explode → two broadcast joins → one per-doc partial
  * aggregation (map-side combine); selection is a top-k, never a full
  * sort. Nothing grows with the corpus except the one scoring pass.
  *
  * Numeric determinism: log-probabilities are quantized to integer
  * MICRO-units (round to 6 decimals, scale to long) at the LM, so the
  * per-doc sum is exact integer arithmetic — order-free across engines
  * and partitionings (the repo's scaled-decimal convention, see
  * [[Sampling.temperatureSample]]).
  *
  * Reference scope note: yaetos has no data-selection operator; this is
  * part of the beyond-reference LLM-pipeline surface (SURVEY §2 addenda).
  */
object Dsir {

  /** Hashed word-`n`-gram feature buckets of a document, WITH duplicates
    * in document order (bag-of-n-grams, not set): the portable md5
    * construction ([[Sketches.hash60]]) mod `buckets`.
    */
  def ngramBuckets(text: Column, n: Int = 2, buckets: Int = 4096,
                   salt: String = "dsir"): Column =
    transform(TextFunctions.shinglesRaw(text, n),
      g => pmod(Sketches.hash60(g, salt), lit(buckets.toLong)))

  /** Micro-unit quantized log-probability of a bucket count under
    * Laplace-`alpha` smoothing: round(ln((cnt+α)/(total+αB)), 6)·1e6 as
    * an exact long. The double→6-decimal→integer path is reproducible in
    * any engine with IEEE doubles and a `round(x, d)`.
    */
  private def logpMicro(cnt: Column, total: Column, buckets: Int,
                        alpha: Double): Column =
    round(round(log((cnt.cast("double") + lit(alpha)) /
      (total.cast("double") + lit(alpha * buckets))), 6) * lit(1e6), 0)
      .cast("long")

  /** Fit a hashed-n-gram unigram LM: the FULL `buckets`-row table
    * `(bucket, cnt, logp_micro)` including unseen buckets (smoothed), so
    * downstream joins are total functions with no missing-key defaults.
    * One explode + one groupBy over the corpus; the result is
    * `buckets` rows — broadcastable at any corpus size.
    */
  def fitHashedLm(docs: DataFrame, textCol: String, n: Int = 2,
                  buckets: Int = 4096, alpha: Double = 1.0,
                  salt: String = "dsir"): DataFrame = {
    require(buckets > 0, s"buckets must be > 0, got $buckets")
    val bux = docs.select(
      explode(ngramBuckets(col(textCol), n, buckets, salt)).as("bucket"))
    val counts = bux.groupBy("bucket").agg(count(lit(1)).as("cnt"))
    val total = counts.agg(coalesce(sum("cnt"), lit(0L)).as("_total"))
    docs.sparkSession.range(buckets).toDF("bucket")
      .join(counts, Seq("bucket"), "left")
      .na.fill(0L, Seq("cnt"))
      .crossJoin(broadcast(total))
      .select(col("bucket"), col("cnt"),
        logpMicro(col("cnt"), col("_total"), buckets, alpha).as("logp_micro"))
  }

  /** Importance log-weight per raw document against fitted target/raw
    * LMs ([[fitHashedLm]] outputs, same `n`/`buckets`/`salt`): exact
    * micro-unit sum `logw_micro`, its double form `log_w`, and the
    * scored gram count. Docs with fewer than `n` tokens carry weight 0.
    */
  def importanceWeights(raw: DataFrame, idCol: String, textCol: String,
                        targetLm: DataFrame, rawLm: DataFrame, n: Int = 2,
                        buckets: Int = 4096,
                        salt: String = "dsir"): DataFrame = {
    val grams = raw.select(col(idCol).as("doc_id"),
      explode(ngramBuckets(col(textCol), n, buckets, salt)).as("bucket"))
    val t = broadcast(targetLm.select(col("bucket"),
      col("logp_micro").as("_lp_t")))
    val r = broadcast(rawLm.select(col("bucket"),
      col("logp_micro").as("_lp_r")))
    val sums = grams.join(t, "bucket").join(r, "bucket")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(col("_lp_t") - col("_lp_r")).as("logw_micro"))
    raw.select(col(idCol).as("doc_id"))
      .join(sums, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("logw_micro"), lit(0L)).as("logw_micro"),
        (coalesce(col("logw_micro"), lit(0L)) / lit(1e6)).as("log_w"))
  }

  /** Deterministic Gumbel-top-k selection over [[importanceWeights]]
    * output: key = logw_micro + micro-quantized Gumbel(0,1) noise from
    * the salted id hash (`u = (hash60(id)+0.5)/2^60`, `g = −ln(−ln u)`),
    * top `k` by key with id tie-break, ranked. Equivalent to sampling k
    * docs without replacement ∝ exp(log_w) (the Gumbel-max trick), but a
    * pure function of (ids, weights, salt). The plan is a TakeOrdered —
    * no global sort materializes.
    */
  def gumbelTopK(weights: DataFrame, idCol: String, k: Int,
                 salt: String = "dsir_gumbel"): DataFrame = {
    require(k > 0, s"k must be > 0, got $k")
    val u = (Sketches.hash60(col(idCol), salt).cast("double") + lit(0.5)) /
      lit(math.pow(2, 60))
    val gMicro = round(round(-log(-log(u)), 6) * lit(1e6), 0).cast("long")
    weights
      .withColumn("key_micro", col("logw_micro") + gMicro)
      .orderBy(col("key_micro").desc, col(idCol))
      .limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("key_micro").desc, col(idCol))))
  }
}
