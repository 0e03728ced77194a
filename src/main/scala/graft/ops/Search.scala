package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.tokens

/** Full-text retrieval over the document corpus: BM25 (Robertson &
  * Zaragoza 2009) scored through the classic inverted-index join, the
  * lexical side of training-data curation — hard-negative mining for
  * retrieval training, prompt/eval lookup, and "find the corpus docs
  * that answer this query" audits. The reference frames all search as
  * ad-hoc SQL (`yaetos/etl_utils.py:466-471` `query` — SparkSQL
  * strings over registered views); graft makes the ranked-retrieval
  * shape first-class.
  *
  * Scale shape (the 100 TB contract):
  *  - ONE corpus-sized token aggregation builds the postings
  *    (`(doc_id, term, tf)`, map-side combined), and doc lengths are a
  *    second aggregate over the POSTINGS (already one row per
  *    (doc, term)), never a second pass over raw tokens.
  *  - The query term list broadcasts and SEMI-PRUNES the postings
  *    before anything else happens — only postings of queried terms
  *    flow into scoring, so per-query cost tracks result size, not
  *    corpus size.
  *  - Document frequency is computed from the pruned postings (df of a
  *    term not in any query is never needed).
  *  - Per-term contributions are quantized to integer MICRO-units
  *    before the per-(query, doc) sum, so the score is an order-free
  *    BIGINT sum — deterministic under any shuffle order and
  *    bit-replayable on another engine (the [[graft.ops.Dsir]]
  *    convention).
  *  - Top-k per query is a rank-filtered window (WindowGroupLimit
  *    pushdown — no query group ever sorts more than k rows per
  *    input partition).
  */
object Search {

  /** `round(round(x, 6) * 1e6)` as BIGINT — the portable micro-unit
    * quantization shared with [[Dsir.logpMicro]].
    */
  private def micro(x: Column): Column =
    round(round(x, 6) * lit(1e6), 0).cast("long")

  /** BM25 top-k documents per query.
    *
    * @param docs     corpus; `idCol` (any orderable id) + `textCol`
    * @param queries  query set; `queryIdCol` + `queryTextCol`
    * @param k        results per query
    * @param k1       term-frequency saturation (default 1.2)
    * @param b        length normalization (default 0.75)
    *
    * Output `(query_id, doc_id, n_terms, score_micro, rank)`, ranked by
    * `(score_micro DESC, doc_id)` — ties break on the id, never on
    * float noise. `score_micro` is the BIGINT sum of micro-quantized
    * per-term contributions
    * `idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))` with
    * `idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))` (the standard
    * non-negative BM25+ idf). Queries whose terms match nothing are
    * absent from the output.
    */
  def bm25TopK(docs: DataFrame, queries: DataFrame,
               idCol: String, textCol: String,
               queryIdCol: String, queryTextCol: String,
               k: Int = 5, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(k1 >= 0 && b >= 0 && b <= 1, s"bad BM25 params k1=$k1 b=$b")

    val postings = docs
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

    // Doc lengths + corpus stats from the postings, not the raw tokens.
    val dl = postings.groupBy("doc_id").agg(sum("tf").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      (sum("dl").cast("double") / count(lit(1))).as("avgdl"))

    val qTerms = queries
      .select(col(queryIdCol).as("query_id"),
        explode(tokens(col(queryTextCol))).as("term"))
      .filter(col("term") =!= "")
      .distinct()

    // Query vocabulary broadcasts; postings are pruned to it FIRST.
    val pruned = postings.join(broadcast(qTerms.select("term").distinct()), "term")
    val dfT = pruned.groupBy("term").agg(count(lit(1)).as("df_docs"))

    val contrib = pruned
      .join(broadcast(qTerms), "term")
      .join(dl, "doc_id") // pruned side is small post-prune; AQE broadcasts it
      .crossJoin(broadcast(stats))
      .join(broadcast(dfT), "term")
      .withColumn("_idf",
        log(lit(1.0) + (col("n_docs") - col("df_docs") + lit(0.5)) /
          (col("df_docs") + lit(0.5))))
      .withColumn("_tfc",
        col("tf").cast("double") * lit(k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) +
            lit(b) * col("dl") / col("avgdl"))))
      .withColumn("_c_micro", micro(col("_idf") * col("_tfc")))

    val scored = contrib.groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_terms"), sum("_c_micro").as("score_micro"))

    val w = Window.partitionBy("query_id")
      .orderBy(col("score_micro").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("n_terms"),
        col("score_micro"), col("rank"))
  }
}
