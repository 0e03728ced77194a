package graft

import org.apache.spark.sql.functions._

/** Editable scratch driver (see the project verify notes). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    val docs = graft.core.Tables.load(spark, dir, "documents")
      .select("doc_id", "text")
    // reference: q147-style even build + ONE odd append
    Seq("_postings", "_doclens", "_meta").foreach(s =>
      spark.sql(s"DROP TABLE IF EXISTS probeRef$s"))
    val refIdx = graft.ops.Search.writeBm25Index(
      docs.filter(col("doc_id") % 2 === 0), "doc_id", "text",
      "probeRef", numBuckets = 8)
    graft.ops.Search.appendBm25Index(
      docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", refIdx)
    // candidate: even build + TWO sequential appends (the q228 batching)
    Seq("_postings", "_doclens", "_meta").foreach(s =>
      spark.sql(s"DROP TABLE IF EXISTS probeTwo$s"))
    graft.ops.Search.writeBm25Index(
      docs.filter(col("doc_id") % 2 === 0), "doc_id", "text",
      "probeTwo", numBuckets = 8)
    graft.streaming.Streams.applyBm25IngestBatch(
      docs.filter(col("doc_id") % 4 === 1), "probeTwo", "doc_id", "text",
      Queries.tmpDir("probe_ing"), 0L)
    graft.streaming.Streams.applyBm25IngestBatch(
      docs.filter(col("doc_id") % 4 === 3), "probeTwo", "doc_id", "text",
      Queries.tmpDir("probe_ing2"), 1L)
    Seq("probeRef", "probeTwo").foreach { n =>
      Seq("_postings", "_doclens", "_meta").foreach(s =>
        spark.catalog.refreshTable(s"$n$s"))
      println(s"$n postings=" + spark.table(s"${n}_postings").count() +
        " doclens=" + spark.table(s"${n}_doclens").count() +
        " meta=" + spark.table(s"${n}_meta").collect().toSeq)
    }
    val diff = spark.table("probeRef_postings")
      .exceptAll(spark.table("probeTwo_postings")).count()
    val diff2 = spark.table("probeTwo_postings")
      .exceptAll(spark.table("probeRef_postings")).count()
    println(s"postings diff ref-two=$diff two-ref=$diff2")
    spark.stop()
  }
}
