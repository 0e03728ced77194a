package graft.ops

import graft.SparkSpec

/** [[Search.rrfFuse]] — hand-computable fusion arithmetic. */
class RrfFuseSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("contributions sum across lists; single-list items keep theirs; " +
      "ties break on item") {
    val a = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("q", "item", "rank")
    val b = Seq((1L, 11L, 1), (1L, 12L, 2)).toDF("q", "item", "rank")
    val out = Search.rrfFuse(Seq(a, b), "q", "item", "rank",
        kConst = 60, topk = 10)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("item"), r.getAs[Long]("rrf_micro"),
        r.getAs[Long]("n_lists"), r.getAs[Long]("rank")))
    // 1/61 -> 16393, 1/62 -> 16129 (round-6 micro)
    assert(out(0) === ((11L, 16129L + 16393L, 2L, 1L)), out.mkString(","))
    // 10 and 12 tie at 16393 and 16129: by score then item id
    assert(out(1) === ((10L, 16393L, 1L, 2L)))
    assert(out(2) === ((12L, 16129L, 1L, 3L)))
  }
}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Search]] — BM25 ranked retrieval on a planted corpus where the
  * expected ranking is hand-derivable.
  */
class SearchSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark shuffle join spark spark"),   // tf(spark)=3, dl=5
    (2L, "spark join"),                       // tf(spark)=1, dl=2
    (3L, "window agg sort"),                  // no query terms
    (4L, "join join join join")               // common term only
  ).toDF("doc_id", "text")

  test("rarer terms outscore common ones and tf saturates, not dominates") {
    val q = Seq((10L, "spark join")).toDF("query_id", "qtext")
    val out = Search.bm25TopK(docs, q, "doc_id", "text", "query_id", "qtext",
        k = 10)
      .orderBy("rank").collect()
    // doc 3 has no query term: absent.
    assert(out.map(_.getAs[Long]("doc_id")).toSet === Set(1L, 2L, 4L))
    // Both query terms hit docs 1 and 2; only `join` hits doc 4.
    assert(out.filter(_.getAs[Long]("doc_id") != 4L)
      .forall(_.getAs[Long]("n_terms") == 2L))
    // spark (df=2) is rarer than join (df=3): docs with spark outrank
    // the join-only doc 4 despite its tf=4 saturation.
    val ranked = out.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("doc_id"))
    assert(ranked.last === 4L)
    // Doc 2 is shorter (dl=2 < avgdl) so its length norm boosts it; doc 1
    // has tf(spark)=3. Both must rank above doc 4 in either order.
    assert(ranked.take(2).toSet === Set(1L, 2L))
  }

  test("ties break on doc_id, scores are exact BIGINT micro-sums") {
    // Two identical docs: identical score_micro, rank by id.
    val dup = Seq((7L, "alpha beta"), (5L, "alpha beta")).toDF("doc_id", "text")
    val q = Seq((1L, "alpha")).toDF("query_id", "qtext")
    val out = Search.bm25TopK(dup, q, "doc_id", "text", "query_id", "qtext",
        k = 2)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("score_micro")).distinct.length === 1)
    assert(out.map(_.getAs[Long]("doc_id")).toSeq === Seq(5L, 7L))
  }

  test("k truncates per query independently") {
    val q = Seq((1L, "join"), (2L, "spark")).toDF("query_id", "qtext")
    val out = Search.bm25TopK(docs, q, "doc_id", "text", "query_id", "qtext",
      k = 1).collect()
    assert(out.length === 2)
    assert(out.forall(_.getAs[Int]("rank") == 1))
  }

  test("query-term pruning keeps unmatched-vocabulary docs out of scoring") {
    // A query with an out-of-corpus term still scores on its in-corpus ones.
    val q = Seq((1L, "spark zzz_nothere")).toDF("query_id", "qtext")
    val out = Search.bm25TopK(docs, q, "doc_id", "text", "query_id", "qtext",
      k = 10).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSet === Set(1L, 2L))
    assert(out.forall(_.getAs[Long]("n_terms") == 1L))
  }
}
