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
    Seq("_postings", "_doclens", "_meta", "_tombstones",
      "_postings_vac", "_doclens_vac", "_meta_vac").foreach(s =>
      spark.sql(s"DROP TABLE IF EXISTS $name$s"))

  /** name -> (size, mtime) per data file — the NearDupIndexSpec
    * byte-identity probe.
    */
  private def tableStamps(table: String): Map[String, (Long, Long)] = {
    val loc = new java.net.URI(spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
      .location.toString).getPath
    new java.io.File(loc).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_"))
      .map(f => f.getName -> (f.length(), f.lastModified())).toMap
  }

  private def rows(table: String): Set[Seq[Any]] =
    spark.table(table).collect().map(_.toSeq).toSet

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

  test("streaming ingest batches equal a full build; a replayed batch " +
      "leaves the index and its increment unchanged") {
    drop("sidx_s"); drop("sidx_sf")
    val even = docs.filter(col("doc_id") % 2 === 0)
    Search.writeBm25Index(even, "doc_id", "text", "sidx_s", numBuckets = 4)
    val ing = java.nio.file.Files
      .createTempDirectory("graft_bm25_ing").toString
    // two micro-batches through the streaming apply seam
    graft.streaming.Streams.applyBm25IngestBatch(
      docs.filter(col("doc_id") % 4 === 1), "sidx_s", "doc_id", "text",
      ing, 0L)
    graft.streaming.Streams.applyBm25IngestBatch(
      docs.filter(col("doc_id") % 4 === 3), "sidx_s", "doc_id", "text",
      ing, 1L)
    val full = Search.writeBm25Index(docs, "doc_id", "text", "sidx_sf",
      numBuckets = 4)
    Seq("_postings", "_doclens", "_meta").foreach(s =>
      spark.catalog.refreshTable(s"sidx_s$s"))
    val streamed = Search.bm25TopKIndexed(spark,
      Search.loadBm25Index(spark, "sidx_s"), queries,
      "query_id", "qtext", k = 5).collect().map(_.toSeq).toSet
    val direct = Search.bm25TopKIndexed(spark, full, queries,
      "query_id", "qtext", k = 5).collect().map(_.toSeq).toSet
    assert(streamed === direct)
    // crash-replay of batch 1: the anti-join append is a no-op and the
    // delete-first increment rewrites identically
    val before = spark.table("sidx_s_postings").count()
    val incBefore = spark.read.parquet(s"$ing/batch1")
      .collect().map(_.getLong(0)).toSet
    graft.streaming.Streams.applyBm25IngestBatch(
      docs.filter(col("doc_id") % 4 === 3), "sidx_s", "doc_id", "text",
      ing, 1L)
    spark.catalog.refreshTable("sidx_s_postings")
    assert(spark.table("sidx_s_postings").count() === before,
      "replayed batch must not duplicate postings")
    assert(spark.read.parquet(s"$ing/batch1")
      .collect().map(_.getLong(0)).toSet === incBefore)
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

  test("vacuum hides forgotten docs bit-identically to a rebuild without " +
      "them (zero file rewrites); compact scrubs physically") {
    drop("sidx_f"); drop("sidx_g")
    val keep = docs.filter(col("doc_id") % 7 =!= 0)
    val forget = docs.filter(col("doc_id") % 7 === 0).select("doc_id")
    val idx = Search.writeBm25Index(docs, "doc_id", "text", "sidx_f",
      numBuckets = 4)
    val before = Map(idx.postingsTable -> tableStamps(idx.postingsTable),
      idx.doclensTable -> tableStamps(idx.doclensTable))
    val removed = Search.vacuumBm25Index(spark, "sidx_f", forget)
    assert(removed === forget.count())
    // the ~deleted-ids cost contract: index data files stay byte-identical
    Seq(idx.postingsTable, idx.doclensTable).foreach(t =>
      assert(tableStamps(t) == before(t), s"$t rewritten by a vacuum"))
    // tombstone-hidden ranking == an index REBUILT without the forgotten
    // docs — same stats, same df, same scores
    Search.writeBm25Index(keep, "doc_id", "text", "sidx_g", numBuckets = 4)
    def topk(name: String) = Search.bm25TopKIndexed(spark,
      Search.loadBm25Index(spark, name), queries, "query_id", "qtext", k = 5)
      .collect().map(_.toSeq).toSet
    val hidden = topk("sidx_f")
    val rebuilt = topk("sidx_g")
    assert(hidden === rebuilt && hidden.nonEmpty)
    // already-tombstoned ids do not double-count
    assert(Search.vacuumBm25Index(spark, "sidx_f", forget) === 0L)
    // compact: physical scrub, tombstones cleared, same answer, meta
    // recounted to exactly the rebuilt index's totals
    assert(Search.compactBm25Index(spark, "sidx_f") === removed)
    assert(!spark.catalog.tableExists("sidx_f_tombstones"))
    assert(spark.table(idx.postingsTable)
      .filter(col("doc_id") % 7 === 0).isEmpty)
    assert(topk("sidx_f") === rebuilt)
    assert(spark.table("sidx_f_meta").head().toSeq ===
      spark.table("sidx_g_meta").head().toSeq)
    // compacting a clean index rewrites nothing
    val stable = tableStamps(idx.postingsTable)
    assert(Search.compactBm25Index(spark, "sidx_f") === 0L)
    assert(tableStamps(idx.postingsTable) == stable)
  }

  test("append killed at each boundary repairs by replay to the " +
      "clean-build state (at-least-once contract)") {
    drop("sidx_h"); drop("sidx_i"); drop("sidx_j")
    val even = docs.filter(col("doc_id") % 2 === 0)
    val odd = docs.filter(col("doc_id") % 2 === 1)
    Search.writeBm25Index(docs, "doc_id", "text", "sidx_i", numBuckets = 4)
    def sameAsClean(name: String): Unit = {
      assert(rows(s"${name}_postings") === rows("sidx_i_postings"))
      assert(rows(s"${name}_doclens") === rows("sidx_i_doclens"))
      assert(spark.table(s"${name}_meta").head().toSeq ===
        spark.table("sidx_i_meta").head().toSeq)
    }
    // boundary A: crash right after the postings append — doclens and
    // meta never ran. Replicate the internal first write, then replay.
    val hIdx = Search.writeBm25Index(even, "doc_id", "text", "sidx_h",
      numBuckets = 4)
    import graft.functions.TextFunctions.tokens
    val oddPost = odd
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
    graft.core.io.Writer.writeBucketed(oddPost, hIdx.postingsTable,
      Seq("term"), 4, mode = org.apache.spark.sql.SaveMode.Append)
    Search.appendBm25Index(odd, "doc_id", "text", hIdx) // the retry
    sameAsClean("sidx_h")
    // boundary B: crash after postings + doclens, before the meta
    // recount — meta still holds the pre-append totals
    val jIdx = Search.writeBm25Index(even, "doc_id", "text", "sidx_j",
      numBuckets = 4)
    graft.core.io.Writer.writeBucketed(oddPost, jIdx.postingsTable,
      Seq("term"), 4, mode = org.apache.spark.sql.SaveMode.Append)
    graft.core.io.Writer.writeBucketed(
      oddPost.groupBy("doc_id").agg(sum("tf").as("dl")),
      jIdx.doclensTable, Seq("doc_id"), 4,
      mode = org.apache.spark.sql.SaveMode.Append)
    Search.appendBm25Index(odd, "doc_id", "text", jIdx) // the retry
    sameAsClean("sidx_j")
    // boundary C: crash MID meta swap (meta dropped, rename pending) —
    // heal-on-next-open rolls the staged recount forward, no replay
    graft.core.io.Writer.writeTable(spark.table("sidx_j_meta"),
      "sidx_j_meta_vac")
    spark.sql("DROP TABLE sidx_j_meta")
    Search.loadBm25Index(spark, "sidx_j") // heals
    sameAsClean("sidx_j")
  }

  test("vacuum tombstones a postings-only crash-orphan (append died " +
      "between the postings and doclens writes); repeat vacuum is 0; " +
      "all-docs vacuum yields empty results, never NaN stats") {
    drop("sidx_k")
    val base = docs.filter(col("doc_id") % 2 === 0)
    val idx = Search.writeBm25Index(base, "doc_id", "text", "sidx_k",
      numBuckets = 4)
    val cleanTop = Search.bm25TopKIndexed(spark, idx, queries,
      "query_id", "qtext", k = 5).collect().map(_.toSeq).toSet
    // simulate boundary-A crash: odd docs' postings land, doclens never
    // does, and the batch is NEVER replayed before the GDPR forget
    import graft.functions.TextFunctions.tokens
    val orphan = docs.filter(col("doc_id") % 2 === 1)
    val orphanPost = orphan
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
    graft.core.io.Writer.writeBucketed(orphanPost, idx.postingsTable,
      Seq("term"), 4, mode = org.apache.spark.sql.SaveMode.Append)
    // the forget MUST catch the orphans even though doclens never saw
    // them — doclens-only derivation would return 0 and silently leave
    // their postings inflating df
    val forgotten = Search.vacuumBm25Index(spark, "sidx_k",
      orphan.select("doc_id"))
    assert(forgotten === orphan.count(),
      "postings-only orphans escaped the GDPR forget")
    // hidden ranking == the clean pre-crash index: df, stats, scores
    assert(Search.bm25TopKIndexed(spark, idx, queries,
      "query_id", "qtext", k = 5).collect().map(_.toSeq).toSet === cleanTop)
    // repeat forget of the same ids is idempotent (orphans stay
    // tombstoned until compact scrubs their postings)
    assert(Search.vacuumBm25Index(spark, "sidx_k",
      orphan.select("doc_id")) === 0L)
    // compact scrubs the orphan postings physically
    Search.compactBm25Index(spark, "sidx_k")
    assert(spark.table(idx.postingsTable)
      .filter(col("doc_id") % 2 === 1).isEmpty)
    assert(Search.bm25TopKIndexed(spark, idx, queries,
      "query_id", "qtext", k = 5).collect().map(_.toSeq).toSet === cleanTop)
    // tombstone EVERY remaining doc: results empty, no NaN-poisoned
    // stats row, and compact leaves a consistent empty index
    assert(Search.vacuumBm25Index(spark, "sidx_k",
      base.select("doc_id")) === base.count())
    assert(Search.bm25TopKIndexed(spark, idx, queries,
      "query_id", "qtext", k = 5).isEmpty)
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
