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
    // q219 repro, direct (no stream): ingest pairs + the new incremental
    // cluster landing
    val (corpus, delta) = QueriesText.q70Corpus(spark, dir)
    Seq("_shingles", "_buckets", "_meta").foreach(s =>
      spark.sql(s"DROP TABLE IF EXISTS probe219idx$s"))
    graft.ops.Dedup.writeNearDupIndex(corpus, "doc_id", "text",
      "probe219idx", numBuckets = 8)
    val out = Queries.tmpDir("graft_probe219")
    val b0 = delta.filter(col("doc_id") < 300000)
    graft.streaming.Streams.applyNearDupBatch(b0, "probe219idx",
      "doc_id", "text", threshold = 0.8, maxBandFreq = None,
      acceptedPath = s"$out/acc", id = 0L,
      clustersPath = Some(s"$out/clusters"))
    println("batch 0 landed")
    val b1 = delta.filter(col("doc_id") >= 300000)
    graft.streaming.Streams.applyNearDupBatch(b1, "probe219idx",
      "doc_id", "text", threshold = 0.8, maxBandFreq = None,
      acceptedPath = s"$out/acc", id = 1L,
      clustersPath = Some(s"$out/clusters"))
    println("batch 1 landed")
    println("clusters: " +
      graft.streaming.Streams.loadClusters(spark, s"$out/clusters").count())
    spark.stop()
  }
}
