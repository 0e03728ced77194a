package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Search]] persisted-index path: indexed == recompute, append ==
  * full build, bucket pruning actually prunes, drift fails loudly.
  */
class SearchIndexSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select("doc_id", "text")

  private def queries = docs.filter(col("doc_id") % 51 === 0)
    .select(col("doc_id").as("query_id"),
      array_join(slice(split(lower(col("text")), " "), 1, 4), " ").as("qtext"))

  private def drop(name: String): Unit =
    Seq("_postings", "_doclens", "_meta").foreach(s =>
      spark.sql(s"DROP TABLE IF EXISTS $name$s"))

  test("indexed search is bit-identical to the recompute path") {
    drop("sidx_a")
    val idx = Search.writeBm25Index(docs, "doc_id", "text", "sidx_a",
      numBuckets = 4)
    val indexed = Search.bm25TopKIndexed(spark, idx, queries,
      "query_id", "qtext", k = 5).collect().map(_.toSeq).toSet
    val direct = Search.bm25TopK(docs, queries, "doc_id", "text",
      "query_id", "qtext", k = 5).collect().map(_.toSeq).toSet
    assert(indexed === direct)
    assert(indexed.nonEmpty)
  }

  test("append grows the index to exactly a full build") {
    drop("sidx_b"); drop("sidx_c")
    val even = docs.filter(col("doc_id") % 2 === 0)
    val odd = docs.filter(col("doc_id") % 2 === 1)
    val grown = Search.writeBm25Index(even, "doc_id", "text", "sidx_b",
      numBuckets = 4)
    Search.appendBm25Index(odd, "doc_id", "text", grown)
    val full = Search.writeBm25Index(docs, "doc_id", "text", "sidx_c",
      numBuckets = 4)
    val a = Search.bm25TopKIndexed(spark, Search.loadBm25Index(spark, "sidx_b"),
      queries, "query_id", "qtext", k = 5).collect().map(_.toSeq).toSet
    val b = Search.bm25TopKIndexed(spark, full, queries,
      "query_id", "qtext", k = 5).collect().map(_.toSeq).toSet
    assert(a === b)
    // meta totals grew exactly
    val m = spark.table("sidx_b_meta").head()
    val mc = spark.table("sidx_c_meta").head()
    assert(m.getAs[Long]("n_docs") === mc.getAs[Long]("n_docs"))
    assert(m.getAs[Long]("sum_dl") === mc.getAs[Long]("sum_dl"))
  }

  test("query path reads only the buckets the query terms hash into") {
    drop("sidx_d")
    val idx = Search.writeBm25Index(docs, "doc_id", "text", "sidx_d",
      numBuckets = 32)
    val one = queries.limit(1)
    val out = Search.bm25TopKIndexed(spark, idx, one, "query_id", "qtext",
      k = 3)
    out.collect()
    val scan = out.queryExecution.executedPlan.toString()
    // a handful of terms cannot cover all 32 buckets
    val sel = "SelectedBucketsCount: (\\d+) out of 32".r
      .findFirstMatchIn(scan).map(_.group(1).toInt)
    assert(sel.isDefined, s"no bucket pruning in plan:\n$scan")
    assert(sel.get < 32)
  }

  test("bucket-count drift between meta and catalog fails loudly") {
    drop("sidx_e")
    Search.writeBm25Index(docs.limit(50), "doc_id", "text", "sidx_e",
      numBuckets = 4)
    import org.apache.spark.sql.SaveMode
    graft.core.io.Writer.writeTable(
      Seq((50L, 1000L, 8)).toDF("n_docs", "sum_dl", "num_buckets"),
      "sidx_e_meta", mode = SaveMode.Overwrite)
    val e = intercept[IllegalArgumentException](
      Search.loadBm25Index(spark, "sidx_e"))
    assert(e.getMessage.contains("rebuild"))
  }
}
