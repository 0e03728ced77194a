package graft.jobs

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.model.Manifest
import graft.engine.Flow

/** The curation pipeline runs from YAML alone and composes the SAME
  * library operators the oracle queries drive (`conf/curate_pipeline
  * .yml`): ppl gate → weighted sample export → targeted delete, plus
  * the overlap-cards branch.
  */
class CurateJobsSpec extends SparkSpec {

  private val docs = "/root/testdata/sf0.001/documents.parquet"

  test("ppl gate -> weighted sample -> targeted delete, from the manifest") {
    val out = java.nio.file.Files.createTempDirectory("graft_curate").toString
    val loaded = Manifest.loadFile("conf/curate_pipeline.yml", Seq("dev"),
      Map("docs_in" -> docs, "out_root" -> out))
    val outs = Flow.runPipeline(spark, loaded.jobs, "sample_export",
      save = true)
    assert(outs("sample_export").count() == 100)
    // the gate really gated: no sampled doc sits in the ppl tail
    val buckets = graft.ops.TextAnalysis.perplexityBuckets(
      spark.read.parquet(docs), "doc_id", "text", "lang")
    val sampledBuckets = outs("sample_export").select("doc_id")
      .join(buckets, "doc_id").select("bucket").distinct()
      .collect().map(_.getString(0)).toSet
    assert(!sampledBuckets.contains("tail"))

    // forget 20 of the exported ids: the export shrinks in place and the
    // report is the audit row
    val samplePath = s"$out/sample"
    val ids = spark.read.parquet(samplePath)
      .select("doc_id").orderBy("doc_id").limit(20)
    ids.write.parquet(s"$out/forget_ids")
    val report = Flow.runPipeline(spark, loaded.jobs, "forget",
      save = false)("forget").collect().head
    assert(report.getAs[Long]("rows_deleted") == 20L)
    assert(spark.read.parquet(samplePath).count() == 80)
  }

  test("overlap-cards branch equals the direct operator output") {
    val loaded = Manifest.loadFile("conf/curate_pipeline.yml", Seq("dev"),
      Map("docs_in" -> docs,
        "out_root" -> java.nio.file.Files
          .createTempDirectory("graft_curate2").toString))
    val cards = Flow.runPipeline(spark, loaded.jobs, "overlap_cards",
      save = false)("overlap_cards")
    val direct = graft.ops.Sketches.kmvOverlapCards(
      spark.read.parquet(docs).select(col("source"),
        explode(graft.functions.TextFunctions.shingles(col("text"), 3))
          .as("value")),
      "source", "value", k = 128)
    assert(cards.exceptAll(direct).isEmpty && direct.exceptAll(cards).isEmpty)
  }
}
