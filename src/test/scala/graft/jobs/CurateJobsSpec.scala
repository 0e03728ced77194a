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
  import spark.implicits._

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

  test("bigram-lm and quarantine-load branches run from the manifest") {
    val out = java.nio.file.Files.createTempDirectory("graft_curate3")
      .toString
    // raw jsonl with one corrupt line
    Seq("""{"doc_id": 1, "text": "good one"}""",
      """{"doc_id": 2, "bro""",
      """{"doc_id": 3, "text": "also fine"}""")
      .toDF("value").coalesce(1).write.text(s"$out/raw")
    val loaded = Manifest.loadFile("conf/curate_pipeline.yml", Seq("dev"),
      Map("docs_in" -> docs, "out_root" -> out,
        "jsonl_in" -> s"$out/raw"))
    val scored = Flow.runPipeline(spark, loaded.jobs, "bigram_lm",
      save = false)("bigram_lm")
    // matches the direct held-out operator call
    val d = spark.read.parquet(docs)
    val direct = graft.ops.TextAnalysis.bigramLmScore(
      d.filter(col("doc_id") % 2 === 1), d.filter(col("doc_id") % 2 === 0),
      "doc_id", "text")
    assert(scored.exceptAll(direct).isEmpty &&
      direct.exceptAll(scored).isEmpty)

    val good = Flow.runPipeline(spark, loaded.jobs, "quarantine_load",
      save = false)("quarantine_load")
    assert(good.count() == 2)
    assert(spark.read.text(s"$out/quarantine").count() == 1)
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

  test("augment and split_export branches run from the manifest") {
    val out = java.nio.file.Files.createTempDirectory("graft_curate4").toString
    val events = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "events")
    events.write.mode("overwrite").parquet(s"$out/events")
    val loaded = Manifest.loadFile("conf/curate_pipeline.yml", Seq("dev"),
      Map("docs_in" -> docs, "events_in" -> s"$out/events",
        "out_root" -> out))

    val aug = Flow.runPipeline(spark, loaded.jobs, "augment",
      save = false)("augment")
    val direct = graft.ops.TextAnalysis.wordDropout(
      Flow.runPipeline(spark, loaded.jobs, "gated_docs",
        save = false)("gated_docs"),
      "doc_id", "text", rate = 0.1, salt = "epoch1")
    assert(aug.collect().map(_.toSeq).toSet ===
      direct.collect().map(_.toSeq).toSet)

    val split = Flow.runPipeline(spark, loaded.jobs, "split_export",
      save = false)("split_export")
    val labels = split.select("split").distinct()
      .collect().map(_.getString(0)).toSet
    assert(labels.subsetOf(Set("train", "embargo", "test")))
    assert(labels.contains("train") && labels.contains("test"))
  }
}
