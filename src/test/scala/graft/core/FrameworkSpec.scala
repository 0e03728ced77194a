package graft.core

import graft.SparkSpec
import graft.core.io.{PathTemplating, Reader, Writer}
import graft.core.model.{DatasetSpec, JobSpec, Manifest, Params}
import graft.engine.{Etl, Flow, MultiPass, PeriodBuilder}
import org.apache.spark.sql.functions._
import java.nio.file.Files

class ManifestSpec extends SparkSpec {

  val yml =
    """common_params:
      |  all_mode_params:
      |    base: /data
      |    k1: all
      |  mode_specific_params:
      |    dev:
      |      k1: dev
      |      k2: dev-only
      |    prod:
      |      k1: prod
      |jobs:
      |  j1:
      |    inputs:
      |      ev: {path: "{{base}}/ev.csv", type: csv, inc_field: ts, glob: "part*"}
      |    output: {path: "{{base}}/out", type: parquet, pk: [id]}
      |    sql: SELECT 1
      |    params: {k2: job}
      |  j2:
      |    dependencies: [j1]
      |    output: {path: /o2, type: csv}
      |""".stripMargin

  test("mode layering precedence: all < mode < job < cmd") {
    val dev = Manifest.parse(yml, Seq("dev"))
    assert(dev.jobs("j1").params("k1") == "dev")
    assert(dev.jobs("j1").params("k2") == "job")
    assert(dev.jobs("j2").params("k2") == "dev-only")
    val prod = Manifest.parse(yml, Seq("prod"))
    assert(prod.jobs("j1").params("k1") == "prod")
    val cmd = Manifest.parse(yml, Seq("dev"), Map("k1" -> "cli"))
    assert(cmd.jobs("j1").params("k1") == "cli")
  }

  test("dataset attrs parse: type, inc_field, glob, pk; dependencies") {
    val m = Manifest.parse(yml, Seq("dev"))
    val ds = m.jobs("j1").inputs("ev")
    assert(ds.format == "csv" && ds.incField.contains("ts") && ds.glob.contains("part*"))
    assert(m.jobs("j1").output.get.pk == Seq("id"))
    assert(m.jobs("j2").dependencies == Seq("j1"))
    assert(m.jobs("j1").isIncremental && !m.jobs("j2").isIncremental)
  }

  test("param interpolation resolves paths") {
    val m = Manifest.parse(yml, Seq("dev"))
    val resolved = Params.resolve(m.jobs("j1").inputs("ev"), m.jobs("j1").params)
    assert(resolved.path == "/data/ev.csv")
  }
}

class FlowSpec extends SparkSpec {
  import spark.implicits._

  def job(name: String, deps: Seq[String] = Nil, sql: Option[String] = None): JobSpec =
    JobSpec(name = name, dependencies = deps, sql = sql)

  test("topoOrder respects dependencies and rejects cycles") {
    val jobs = Map(
      "a" -> job("a"), "b" -> job("b", Seq("a")),
      "c" -> job("c", Seq("a")), "d" -> job("d", Seq("b", "c")))
    val order = Flow.topoOrder(jobs)
    assert(order.indexOf("a") < order.indexOf("b"))
    assert(order.indexOf("b") < order.indexOf("d"))
    assert(order.indexOf("c") < order.indexOf("d"))
    val cyc = Map("x" -> job("x", Seq("y")), "y" -> job("y", Seq("x")))
    assertThrows[IllegalArgumentException](Flow.topoOrder(cyc))
  }

  test("upstream extracts only the target's ancestor subtree") {
    val jobs = Map(
      "a" -> job("a"), "b" -> job("b", Seq("a")),
      "z" -> job("z"))
    assert(Flow.upstream(jobs, "b").keySet == Set("a", "b"))
  }

  test("persistIntermediates caches shared upstreams and releases them after last consumer") {
    Seq((1, 10), (2, 20)).toDF("id", "v").createOrReplaceTempView("p_src")
    val jobs = Map(
      "base" -> JobSpec(name = "base", sql = Some("SELECT id, v * 2 AS v2 FROM p_src")),
      "left" -> JobSpec(name = "left",
        inputs = Map("base" -> DatasetSpec(format = "df")),
        sql = Some("SELECT sum(v2) AS s FROM base"), dependencies = Seq("base")),
      "right" -> JobSpec(name = "right",
        inputs = Map("base" -> DatasetSpec(format = "df")),
        sql = Some("SELECT count(*) AS c FROM base"), dependencies = Seq("base")),
      "join" -> JobSpec(name = "join",
        inputs = Map("left" -> DatasetSpec(format = "df"),
          "right" -> DatasetSpec(format = "df")),
        sql = Some("SELECT s, c FROM left CROSS JOIN right"),
        dependencies = Seq("left", "right")))
    val outs = Flow.runPipeline(spark, jobs, "join", save = false,
      persistIntermediates = true)
    assert(outs("join").head().toSeq == Seq(60L, 2L))
    // base (2 consumers) was persisted during the run and released after
    assert(outs("base").storageLevel ==
      org.apache.spark.storage.StorageLevel.NONE)
  }

  test("runPipeline chains outputs in memory by job name") {
    Seq((1, 10), (2, 20)).toDF("id", "v").createOrReplaceTempView("src")
    val jobs = Map(
      "base" -> JobSpec(name = "base", sql = Some("SELECT id, v * 2 AS v2 FROM src")),
      "final" -> JobSpec(name = "final",
        inputs = Map("base" -> DatasetSpec(format = "df")),
        sql = Some("SELECT sum(v2) AS total FROM base"),
        dependencies = Seq("base")))
    val outs = Flow.runPipeline(spark, jobs, "final", save = false)
    assert(outs("final").head().getLong(0) == 60L)
  }

  test("NearDupJob keeps one representative per near-dup cluster") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog today"), // near-dup of 1
      (3L, "completely different content entirely here now with words")
    ).toDF("doc_id", "text")
    val out = new graft.jobs.NearDupJob()
      .transform(Map("d" -> docs), spark, Map("threshold" -> "0.5"))
      .select("doc_id").as[Long].collect().sorted
    assert(out.toSeq == Seq(1L, 3L))
  }

  test("QualityFilterJob is a narrow in-place pass: no join, no exchange") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = new graft.jobs.QualityFilterJob()
      .transform(Map("d" -> docs), spark, Map("min_quality" -> "0.3"))
    // quality is a pure function of text, so the gate must compile to
    // scan -> project -> filter — any Exchange or Join here would be a
    // corpus-wide shuffle at 100 TB
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
    assert(!plan.toLowerCase.contains("join"), s"unexpected join in:\n$plan")
    assert(out.columns.contains("quality"))
    // the in-place score is the same expression qualityScore reports
    val viaScore = graft.ops.TextAnalysis
      .qualityScore(docs, "doc_id", "text").select("doc_id", "quality")
    val viaExpr = docs.select(col("doc_id"),
      graft.ops.TextAnalysis.qualityExpr(col("text")).as("quality"))
    assert(viaScore.except(viaExpr).isEmpty && viaExpr.except(viaScore).isEmpty)
  }

  test("llm_pipeline.yml declares a checkpoint_dir the Runner applies in --dependencies mode") {
    val loaded = Manifest.loadFile("conf/llm_pipeline.yml", Seq("dev"), Map.empty)
    // neardup_docs (the CC consumer) declares it directly...
    assert(graft.Runner.resolveCheckpointDir(
      loaded.jobs("neardup_docs"), loaded.jobs, withDependencies = false)
      .contains("/tmp/graft_llm_demo/_ckpt"))
    // ...and a --dependencies run targeting the downstream job inherits it
    assert(graft.Runner.resolveCheckpointDir(
      loaded.jobs("split_corpus"), loaded.jobs, withDependencies = true)
      .contains("/tmp/graft_llm_demo/_ckpt"))
    // a plain single-job run of the downstream job does NOT set one
    assert(graft.Runner.resolveCheckpointDir(
      loaded.jobs("split_corpus"), loaded.jobs, withDependencies = false).isEmpty)
    // a job OUTSIDE the target's upstream closure (an unrelated pipeline
    // sharing the manifest) must not redirect this run's checkpoints,
    // even when it sorts first
    val foreign = loaded.jobs("dedup_docs").copy(name = "aaa_foreign",
      dependencies = Nil, params = Map("checkpoint_dir" -> "/tmp/elsewhere"))
    assert(graft.Runner.resolveCheckpointDir(
      loaded.jobs("split_corpus"), loaded.jobs + ("aaa_foreign" -> foreign),
      withDependencies = true).contains("/tmp/graft_llm_demo/_ckpt"))
  }

  test("llm_pipeline.yml runs dedup -> quality gate -> split from the manifest") {
    val loaded = Manifest.loadFile("conf/llm_pipeline.yml", Seq("dev"), Map.empty)
    def run() = Flow.runPipeline(spark, loaded.jobs, "split_corpus",
      save = false)("split_corpus")
    val out = run()
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val n = out.count()
    assert(n > 0 && n <= docs.count(), s"pipeline kept $n docs")
    // every surviving doc carries a quality score and a split assignment
    assert(out.columns.contains("quality") && out.columns.contains("split"))
    val splits = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(splits.keySet.subsetOf(Set("train", "val", "test")))
    assert(splits.values.sum == n)
    // split membership is a pure function of (salt, id): rerun identical
    val again = run()
    assert(out.select("doc_id", "split")
      .except(again.select("doc_id", "split")).isEmpty)
    // the dataset card publishes from the same manifest, over the SAME
    // gated corpus: both sections present, profile counts = gated docs
    val card = Flow.runPipeline(spark, loaded.jobs, "corpus_card",
      save = false)("corpus_card")
    assert(card.filter("section = 'quality_hist'").count() > 0)
    val profiled = card.filter("section = 'quality_profile'")
      .agg(org.apache.spark.sql.functions.sum("cnt")).collect()(0).getLong(0)
    assert(profiled == n, s"profile covers $profiled of $n gated docs")
  }

  test("llm_pipeline.yml runs the C4 -> Gopher -> chunk pre-clean branch") {
    val loaded = Manifest.loadFile("conf/llm_pipeline.yml", Seq("dev"), Map.empty)
    val chunks = Flow.runPipeline(spark, loaded.jobs, "chunk_docs",
      save = false)("chunk_docs")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert(chunks.columns.toSeq ==
      Seq("doc_id", "chunk_id", "n_tokens", "chunk_text"))
    val n = chunks.count()
    assert(n > 0, "pre-clean branch produced no chunks")
    // chunking invariants: window cap respected, every doc starts at 0
    import org.apache.spark.sql.functions._
    assert(chunks.agg(max("n_tokens")).collect()(0).getLong(0) <= 64L)
    assert(chunks.filter(col("chunk_id") === 0).count() ==
      chunks.select("doc_id").distinct().count())
    // the C4 stage dropped the planted 'click here' boilerplate line and
    // the gopher stage only ever removes whole docs
    assert(chunks.filter(col("chunk_text").contains("click here")).count() == 0)
    assert(chunks.select("doc_id").distinct().count() <= docs.count())
    // ...and the chunks pack into 64-token bins, deterministically
    val packed = Flow.runPipeline(spark, loaded.jobs, "pack_chunks",
      save = false)("pack_chunks")
    assert(packed.count() == n)
    assert(Seq("shard", "bin", "bin_offset").forall(packed.columns.contains))
    assert(packed.agg(max(col("bin_offset"))).collect()(0).getLong(0) < 64L)
    val again = Flow.runPipeline(spark, loaded.jobs, "pack_chunks",
      save = false)("pack_chunks")
    assert(packed.select("seq_id", "shard", "bin", "bin_offset")
      .except(again.select("seq_id", "shard", "bin", "bin_offset")).isEmpty)
  }

  test("llm_pipeline.yml shapes the WET export as WARC record columns") {
    val loaded = Manifest.loadFile("conf/llm_pipeline.yml", Seq("dev"), Map.empty)
    val wet = Flow.runPipeline(spark, loaded.jobs, "wet_export",
      save = false)("wet_export")
    assert(wet.columns.toSeq == Seq("warc_type", "target_uri", "record_id",
      "warc_date", "payload"))
    assert(wet.count() > 0)
  }

  test("llm_pipeline.yml runs the link-graph host-rank branch") {
    import org.apache.spark.sql.functions._
    val loaded = Manifest.loadFile("conf/llm_pipeline.yml", Seq("dev"), Map.empty)
    val prior = Flow.runPipeline(spark, loaded.jobs, "doc_host_prior",
      save = false)("doc_host_prior")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // every document carries a positive host prior (the host graph covers
    // all 20 synthesized hosts, and ranks are integer micro-units > 0)
    assert(prior.count() == docs.count())
    assert(prior.filter(col("host_rank_micro") <= 0L).count() == 0)
    // same host => same prior; distinct priors stay within host count
    val perHost = prior.withColumn("h", pmod(col("doc_id"), lit(20)))
      .groupBy("h").agg(countDistinct("host_rank_micro").as("n"))
    assert(perHost.filter(col("n") =!= 1L).count() == 0)
  }

  test("llm_pipeline.yml runs the mixed-modality payload -> quantize -> semdedup branch") {
    import org.apache.spark.sql.functions._
    val cellPath = java.nio.file.Files
      .createTempDirectory("graft_media_cells").toString + "/cells"
    val loaded = Manifest.loadFile("conf/llm_pipeline.yml", Seq("dev"),
      Map("media_cells" -> cellPath))
    val kept = Flow.runPipeline(spark, loaded.jobs, "media_dedup",
      save = false)("media_dedup")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(length(col("text")) > 0)
    val n = kept.count()
    assert(n > 0 && n <= docs.count(), s"media branch kept $n docs")
    // the cell assignment was materialized: one cell per corpus doc
    val cells = spark.read.parquet(cellPath)
    assert(cells.columns.toSeq == Seq("vec_id", "cell"))
    assert(cells.count() == docs.count())
    // the job's composition IS the library op: replaying
    // semanticDedupWithCells over the same materialized cells and the
    // same dequantized embeddings reproduces the survivor set exactly
    val emb = Flow.runPipeline(spark, loaded.jobs, "media_emb",
      save = false)("media_emb")
    val direct = graft.ops.Dedup.semanticDedupWithCells(emb,
      spark.read.parquet(cellPath), "doc_id", "embedding", "cell",
      threshold = 0.9999)
    assert(kept.select("doc_id").except(direct.select("doc_id")).isEmpty &&
      direct.select("doc_id").except(kept.select("doc_id")).isEmpty)
  }

  test("llm_pipeline.yml runs the DSIR-select and classifier-filter branch") {
    import org.apache.spark.sql.functions._
    val loaded = Manifest.loadFile("conf/llm_pipeline.yml", Seq("dev"), Map.empty)
    val selected = Flow.runPipeline(spark, loaded.jobs, "dsir_select",
      save = false)("dsir_select")
    assert(selected.count() == 100) // k = 100 from the manifest
    assert(Seq("doc_id", "log_w", "rank", "text")
      .forall(selected.columns.contains))
    // the YAML composition IS the library op chain
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val target = docs.filter(col("doc_id") % 37 === 0)
    val tLm = graft.ops.Dsir.fitHashedLm(target, "text", 2, 512)
    val rLm = graft.ops.Dsir.fitHashedLm(docs, "text", 2, 512)
    val w = graft.ops.Dsir.importanceWeights(docs, "doc_id", "text",
      tLm, rLm, 2, 512)
    val direct = graft.ops.Dsir.gumbelTopK(w, "doc_id", 100)
    assert(selected.select("doc_id").except(direct.select("doc_id")).isEmpty)

    val kept = Flow.runPipeline(spark, loaded.jobs, "classifier_filter",
      save = false)("classifier_filter")
    val n = kept.count()
    assert(n > 0 && n < docs.count(), s"classifier kept $n docs")
    // every survivor is a positively-pseudo-labeled doc scored >= tau
    assert(kept.filter(col("score") < 0.5).count() == 0)
  }

  test("llm_pipeline.yml runs the fuzzy-decontamination branch") {
    import org.apache.spark.sql.functions._
    val loaded = Manifest.loadFile("conf/llm_pipeline.yml", Seq("dev"), Map.empty)
    val outs = Flow.runPipeline(spark, loaded.jobs, "decontam_corpus",
      save = false)
    val before = outs("neardup_docs").count()
    val after = outs("decontam_corpus").count()
    // every 40th raw doc has a planted eval twin: some survivors of the
    // dedup chain must be flagged, and only flagged docs may drop
    assert(after < before, "decontamination must drop the planted twins")
    assert(outs("decontam_corpus")
      .filter(pmod(col("doc_id"), lit(40)) === 0).count() == 0,
      "all eval-slice source docs must be gone")
  }

  test("runPipelineMetered accounts rows per stage in execution order") {
    val loaded = Manifest.loadFile("conf/llm_pipeline.yml", Seq("dev"), Map.empty)
    val (outs, ms) = Flow.runPipelineMetered(spark, loaded.jobs,
      "quality_gate", save = false)
    val byJob = ms.map(m => m.job -> m).toMap
    assert(ms.map(_.job) ==
      Seq("dedup_docs", "neardup_docs", "quality_gate"))
    // each metric is the stage's actual output cardinality, and the
    // gates can only shrink the corpus
    assert(byJob("quality_gate").rows == outs("quality_gate").count())
    assert(byJob("dedup_docs").rows >= byJob("neardup_docs").rows)
    assert(byJob("neardup_docs").rows >= byJob("quality_gate").rows)
    assert(ms.forall(_.seconds > 0))
  }

  test("crawl_pipeline.yml resolves its full warc -> robots -> clean chain") {
    val loaded = Manifest.loadFile("conf/crawl_pipeline.yml", Seq("dev"),
      Map("warc_in" -> "/tmp/does_not_matter_for_dry_run"))
    val plan = graft.Runner.dryRunPlan(loaded.jobs, "final_corpus",
      withDependencies = true)
    val names = Seq("warc_pages", "robots_gate", "html_extract", "c4_clean",
      "dedup_pages", "final_corpus")
    val idx = names.map(n => plan.indexWhere(_.contains(s" $n ")))
    assert(idx.forall(_ >= 0) && idx == idx.sorted,
      s"jobs missing or out of order in:\n${plan.mkString("\n")}")
    assert(plan.exists(l => l.contains("warc_pages") && l.contains("(warc)")))
    assert(plan.exists(_.contains("class graft.jobs.RobotsFilterJob")))
  }

  test("dry-run plan resolves the upstream closure without a SparkSession") {
    val loaded = Manifest.loadFile("conf/llm_pipeline.yml", Seq("dev"), Map.empty)
    val plan = graft.Runner.dryRunPlan(loaded.jobs, "split_corpus",
      withDependencies = true)
    // checkpoint dir first, then topo order over the four-job chain
    assert(plan.head == "checkpoint_dir: /tmp/graft_llm_demo/_ckpt")
    val names = Seq("dedup_docs", "neardup_docs", "quality_gate", "split_corpus")
    val idx = names.map(n => plan.indexWhere(_.contains(s" $n ")))
    assert(idx.forall(_ >= 0) && idx == idx.sorted,
      s"jobs missing or out of order in:\n${plan.mkString("\n")}")
    assert(plan.exists(l => l.contains("dedup_docs") &&
      l.contains("class graft.jobs.DedupExactJob") &&
      l.contains("documents.parquet (parquet)")))
    assert(plan.exists(l => l.contains("split_corpus") &&
      l.contains("<in-memory>") && l.contains("-> /tmp/graft_llm_demo/corpus/")))
    // single-job dry run has no inherited checkpoint line
    val single = graft.Runner.dryRunPlan(loaded.jobs, "split_corpus",
      withDependencies = false)
    assert(single.size == 1 && !single.head.startsWith("checkpoint_dir"))
  }

  test("skip_manifest / skip_ranges parse, interpolate, and surface in " +
    "the dry-run plan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_skipyml")
    val yml =
      """common_params:
        |  all_mode_params: {root: /tmp/skiproot}
        |jobs:
        |  pruned:
        |    inputs:
        |      li:
        |        path: "{{root}}/data"
        |        inc_field: l_shipdate
        |        skip_manifest: "{{root}}/mf"
        |        skip_blooms: true
        |        skip_ranges:
        |          - {column: l_orderkey, lower: 1000, upper: 2999}
        |          - {column: l_tag, values: [a, "{{root}}"]}
        |    sql: "SELECT 1"
        |""".stripMargin
    val f = dir.resolve("skip.yml")
    java.nio.file.Files.write(f, yml.getBytes("UTF-8"))
    val job = Manifest.loadFile(f.toString).jobs("pruned")
    val ds = graft.core.model.Params.resolve(job.inputs("li"), job.params)
    assert(ds.skipManifest === Some("/tmp/skiproot/mf"))
    assert(ds.skipBlooms, "skip_blooms: true must parse")
    assert(ds.skipRanges === Seq(
      graft.core.model.SkipRange("l_orderkey", Some("1000"), Some("2999")),
      graft.core.model.SkipRange("l_tag",
        values = Seq("a", "/tmp/skiproot"))))
    // typed predicates: integer bounds probe BIGINT slots, plus the
    // period window from inc_field
    val preds = graft.core.io.Reader.skipPredicates(ds,
      Some(("1995-06-01", "1995-06-02")))
    assert(preds === Seq(
      graft.core.io.Skipping.ColumnRange("l_orderkey",
        Some(1000L), Some(2999L)),
      graft.core.io.Skipping.ColumnIn("l_tag", Seq("a", "/tmp/skiproot")),
      graft.core.io.Skipping.ColumnRange("l_shipdate",
        Some("1995-06-01"), Some("1995-06-02"))))
    val plan = graft.Runner.dryRunPlan(Manifest.loadFile(f.toString).jobs,
      "pruned", withDependencies = false)
    assert(plan.exists(l => l.contains("skip_manifest=/tmp/skiproot/mf") &&
      l.contains("+footer_blooms") &&
      l.contains("l_orderkey in [1000, 2999]") &&
      l.contains("l_tag IN (a,/tmp/skiproot)") &&
      l.contains("l_shipdate in [period]")), plan.mkString("\n"))
  }

  test("jobs.yml runs the SCD2 dimension merge from the manifest") {
    val loaded = Manifest.loadFile("conf/jobs.yml", Seq("dev"), Map.empty)
    val out = Flow.runPipeline(spark, loaded.jobs, "customer_scd2",
      save = false)("customer_scd2")
    val customers = spark.read
      .parquet("/root/testdata/sf0.001/customer.parquet")
    val nCust = customers.count()
    val nChanged = customers
      .filter(org.apache.spark.sql.functions.col("c_custkey") % 3 === 0).count()
    // every changed key contributes a closed row + a new open row;
    // unchanged keys keep exactly their one open row
    assert(out.count() == nCust + nChanged)
    val closed = out.filter("valid_to = '2024-06-01'").count()
    val fresh = out.filter("valid_from = '2024-06-01' AND valid_to IS NULL").count()
    assert(closed == nChanged && fresh == nChanged)
  }
}

class EtlIoSpec extends SparkSpec {
  import spark.implicits._

  def tmp(): String = Files.createTempDirectory("graft_test").toString

  test("csv job end-to-end: read csv glob, sql transform, write csv with {{now}}") {
    val dir = tmp()
    Seq((1, "a", 5), (2, "b", 6), (3, "a", 7)).toDF("id", "grp", "v")
      .write.option("header", "true").csv(s"$dir/in")
    val job = JobSpec(name = "t",
      inputs = Map("raw" -> DatasetSpec(path = s"$dir/in", format = "csv")),
      output = Some(DatasetSpec(path = s"$dir/out/{{now}}", format = "csv")),
      sql = Some("SELECT grp, count(*) AS n FROM raw GROUP BY grp"))
    val res = Etl.runJob(spark, job, now = "20240101_000000")
    assert(res.writtenPath.get.endsWith("/out/20240101_000000"))
    val back = spark.read.option("header", "true").csv(res.writtenPath.get)
    assert(back.count() == 2)
    // schema sidecar written next to data
    assert(new java.io.File(res.writtenPath.get, "_schema.json").exists())
  }

  test("compactParquet collapses small files and preserves the data") {
    val dir = tmp()
    val df = spark.range(0, 10000).toDF("id")
      .withColumn("v", col("id") % 7)
    df.repartition(40).write.parquet(s"$dir/data")
    // sidecar metadata next to the data must survive the swap
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(s"$dir/data/_schema.json"), """{"fields":[]}""")
    val before = new java.io.File(s"$dir/data").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(before == 40)
    val res = graft.core.io.Maintenance.compactParquet(spark, s"$dir/data",
      targetFileBytes = 512L * 1024)
    assert(res.filesBefore == 40 && res.filesAfter < 40)
    val back = spark.read.parquet(s"$dir/data")
    assert(back.count() == 10000)
    assert(back.agg(org.apache.spark.sql.functions.sum("v")).head().getLong(0) ==
      df.agg(org.apache.spark.sql.functions.sum("v")).head().getLong(0))
    // no stray temp/old dirs left behind
    val siblings = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(!siblings.exists(_.contains("_compact")))
    // the sidecar rode along into the compacted directory
    assert(new java.io.File(s"$dir/data/_schema.json").exists())
  }

  test("compactIncrements collapses per-batch sink dirs, spares the " +
      "replay-eligible tail, and is idempotent") {
    val root = s"${tmp()}/sink"
    val batches = (0 until 4).map { i =>
      val d = s"$root/batch$i"
      spark.range(i * 1000, (i + 1) * 1000).toDF("id")
        .repartition(3).write.parquet(d)
      // ascending mtimes so "newest" is deterministic
      new java.io.File(d).setLastModified(1700000000000L + i * 60000L)
      d
    }
    def files(d: String) = new java.io.File(d).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(batches.forall(files(_) == 3))
    val res = graft.core.io.Maintenance.compactIncrements(spark, root,
      targetFileBytes = 512L * 1024 * 1024, keepLatest = 1)
    // three closed batches compacted to one file each; the newest — the
    // live stream's replay-eligible dir — stays untouched
    assert(res.dirsCompacted == 3 && res.filesBefore == 9 && res.filesAfter == 3)
    assert(batches.init.forall(files(_) == 1) && files(batches.last) == 3)
    // data intact, dir identity preserved
    val back = spark.read.parquet(s"$root/batch*")
    assert(back.count() == 4000)
    assert(back.agg(org.apache.spark.sql.functions.sum("id")).head().getLong(0)
      == (0L until 4000L).sum)
    // second pass WITHOUT touching mtimes: the swap refreshed the
    // compacted dirs' mtimes, so an mtime-keyed keep set would now call
    // a just-compacted OLD dir "newest" and compact the true live tail
    // (batch3) — the resurrection race. The keep set keys on the
    // batch<id> encoded in the name, which compaction cannot perturb:
    // steady state, nothing to do, batch3 still 3 files.
    val res2 = graft.core.io.Maintenance.compactIncrements(spark, root,
      targetFileBytes = 512L * 1024 * 1024, keepLatest = 1)
    assert(res2.dirsCompacted == 0)
    assert(files(batches.last) == 3,
      "the replay-eligible tail lost keepLatest protection on pass 2")
    // lexicographic batch ids must not confuse the numeric key: batch10
    // is newer than batch9 even though "batch10" < "batch9" as text
    spark.range(0, 10).toDF("id").repartition(2)
      .write.parquet(s"$root/batch10")
    val res3 = graft.core.io.Maintenance.compactIncrements(spark, root,
      targetFileBytes = 512L * 1024 * 1024, keepLatest = 1)
    // batch3 (now closed) compacts; batch10 is the protected tail
    assert(files(s"$root/batch10") == 2 && files(batches.last) == 1,
      "numeric batch ordering violated")
    assert(res3.dirsCompacted == 1)
  }

  test("bucketed tables join with no exchange on the bucket key") {
    import org.apache.spark.sql.functions.{col, sum}
    val orders = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .select("l_orderkey", "l_quantity")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    graft.core.io.Writer.writeBucketed(orders, "b_orders", Seq("o_orderkey"), 8)
    graft.core.io.Writer.writeBucketed(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", Seq("o_orderkey"), 8)
    // disable broadcast so the join would OTHERWISE shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
        .select("o_orderkey", "o_custkey", "l_quantity")
      // bucket co-location: the join itself plans with ZERO exchanges —
      // both sides read co-bucketed files directly
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"plan:\n$plan")
      assert(!plan.contains("Exchange"),
        s"expected a shuffle-free bucketed join; plan:\n$plan")
      // and the result is right
      val direct = orders.join(
          lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey")
        .select("o_orderkey", "o_custkey", "l_quantity")
      assert(joined.except(direct).isEmpty && direct.except(joined).isEmpty)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE b_orders")
      spark.sql("DROP TABLE b_lineitem")
    }
  }

  test("orc job round-trips through the Writer/Reader dispatch") {
    val dir = tmp()
    Seq((1, "a", 5.0), (2, "b", 6.5)).toDF("id", "grp", "v")
      .write.parquet(s"$dir/in")
    val job = JobSpec(name = "orc_copy",
      inputs = Map("raw" -> DatasetSpec(path = s"$dir/in")),
      output = Some(DatasetSpec(path = s"$dir/out", format = "orc")),
      sql = Some("SELECT id, grp, v FROM raw"))
    val res = Etl.runJob(spark, job, now = "20240101_000000")
    val back = graft.core.io.Reader.read(spark,
      DatasetSpec(path = res.writtenPath.get, format = "orc"))
    assert(back.count() == 2)
    assert(back.agg(org.apache.spark.sql.functions.sum("v")).head().getDouble(0) == 11.5)
  }

  test("git_info param writes a provenance sidecar next to the output") {
    val dir = tmp()
    Seq((1, "a")).toDF("id", "s").write.parquet(s"$dir/in")
    val job = JobSpec(name = "prov",
      inputs = Map("raw" -> DatasetSpec(path = s"$dir/in")),
      output = Some(DatasetSpec(path = s"$dir/out")),
      sql = Some("SELECT id, s FROM raw"),
      params = Map("git_info" -> "true", "git_repo_dir" -> "/root/repo"))
    val res = Etl.runJob(spark, job, now = "20240101_000001")
    val side = new java.io.File(res.writtenPath.get, "_git_info.json")
    assert(side.exists())
    val json = java.nio.file.Files.readString(side.toPath)
    assert(json.contains("\"last_commit\"") && json.contains("\"branch\""))
  }

  test("incremental no_schema sink appends inc_<now>_<period> subfolders") {
    val dir = tmp()
    Seq(("2024-01-01 01:00:00", 1.0), ("2024-01-02 01:00:00", 2.0),
        ("2024-01-02 02:00:00", 3.0))
      .toDF("ts", "v").select(col("ts").cast("timestamp").as("ts"), col("v"))
      .write.parquet(s"$dir/ev")
    val job = JobSpec(name = "inc",
      inputs = Map("ev" -> DatasetSpec(path = s"$dir/ev", incField = Some("ts"))),
      output = Some(DatasetSpec(path = s"$dir/out")),
      sql = Some("SELECT ts, v FROM ev"))
    val results = MultiPass.run(spark, job,
      java.time.LocalDate.parse("2024-01-01"), java.time.LocalDate.parse("2024-01-03"),
      now = "20240101_000000")
    assert(results.map(_.rows) == Seq(1L, 2L, 0L))
    assert(results.head.path.get.endsWith("inc_20240101_000000_2024-01-01"))
    val all = spark.read.parquet(s"$dir/out/inc_*")
    assert(all.count() == 3)
  }

  test("partitioned incremental sink partitions by a derived inc column") {
    val dir = tmp()
    Seq(("2024-01-01", 1.0), ("2024-01-02", 2.0)).toDF("day", "v")
      .write.parquet(s"$dir/ev")
    val job = JobSpec(name = "p",
      inputs = Map("ev" -> DatasetSpec(path = s"$dir/ev")),
      output = Some(DatasetSpec(path = s"$dir/out", incField = Some("day"))),
      incrementalMode = "partitioned",
      sql = Some("SELECT day, v FROM ev"))
    Etl.runJob(spark, job)
    val dirs = new java.io.File(s"$dir/out").list().filter(_.startsWith("day="))
    assert(dirs.toSet == Set("day=2024-01-01", "day=2024-01-02"))
  }

  test("pk violation on output fails the job") {
    val dir = tmp()
    Seq((1, "x"), (1, "y")).toDF("id", "s").write.parquet(s"$dir/in")
    val job = JobSpec(name = "pkfail",
      inputs = Map("t" -> DatasetSpec(path = s"$dir/in")),
      output = Some(DatasetSpec(path = s"$dir/out", pk = Seq("id"))),
      sql = Some("SELECT * FROM t"))
    assertThrows[IllegalArgumentException](Etl.runJob(spark, job))
  }

  test("{{latest}} resolves to max lexicographic subfolder") {
    val dir = tmp()
    Seq(1).toDF("x").write.parquet(s"$dir/v/2024-01-01")
    Seq(2).toDF("x").write.parquet(s"$dir/v/2024-02-01")
    val p = PathTemplating.expandLatest(s"$dir/v/{{latest}}", spark)
    assert(p == s"$dir/v/2024-02-01")
    assert(spark.read.parquet(p).head().getInt(0) == 2)
  }

  test("MultiPass.resume continues after the last written increment") {
    val dir = tmp()
    Seq(("2024-01-01 01:00:00", 1.0), ("2024-01-02 01:00:00", 2.0),
        ("2024-01-03 01:00:00", 3.0))
      .toDF("ts", "v").select(col("ts").cast("timestamp").as("ts"), col("v"))
      .write.parquet(s"$dir/ev")
    val job = JobSpec(name = "resume",
      inputs = Map("ev" -> DatasetSpec(path = s"$dir/ev", incField = Some("ts"))),
      output = Some(DatasetSpec(path = s"$dir/out", incField = Some("ts"))),
      sql = Some("SELECT ts, v FROM ev"))
    // first run covers days 1-2
    val r1 = MultiPass.resume(spark, job, java.time.LocalDate.parse("2024-01-01"),
      java.time.LocalDate.parse("2024-01-02"), now = "n1")
    assert(r1.map(_.period) == Seq("2024-01-01", "2024-01-02"))
    // resume to day 3: only day 3 runs (max probe saw day 2)
    val r2 = MultiPass.resume(spark, job, java.time.LocalDate.parse("2024-01-01"),
      java.time.LocalDate.parse("2024-01-03"), now = "n2")
    assert(r2.map(_.period) == Seq("2024-01-03"))
    // nothing new: no passes
    assert(MultiPass.resume(spark, job, java.time.LocalDate.parse("2024-01-01"),
      java.time.LocalDate.parse("2024-01-03"), now = "n3").isEmpty)
    assert(spark.read.parquet(s"$dir/out/inc_*").count() == 3)
  }

  test("resume probes day-named increments by LISTING, not by reading data") {
    val dir = tmp()
    Seq(("2024-01-01 01:00:00", 1.0), ("2024-01-02 01:00:00", 2.0),
        ("2024-01-03 01:00:00", 3.0))
      .toDF("ts", "v").select(col("ts").cast("timestamp").as("ts"), col("v"))
      .write.parquet(s"$dir/ev")
    val job = JobSpec(name = "lres",
      inputs = Map("ev" -> DatasetSpec(path = s"$dir/ev", incField = Some("ts"))),
      output = Some(DatasetSpec(path = s"$dir/out", incField = Some("ts"))),
      sql = Some("SELECT ts, v FROM ev"))
    MultiPass.resume(spark, job, java.time.LocalDate.parse("2024-01-01"),
      java.time.LocalDate.parse("2024-01-02"), now = "n1")
    // corrupt every written increment's data files: if the probe read the
    // sink back (the full-history scan this fast path removes), resume
    // would fail — the directory NAMES alone must answer "resume from 03"
    java.nio.file.Files.walk(java.nio.file.Path.of(s"$dir/out")).forEach { p =>
      if (p.toString.endsWith(".parquet"))
        java.nio.file.Files.write(p, "garbage".getBytes): Unit
    }
    // a crashed mid-write increment (dir exists, only uncommitted
    // _temporary inside) must NOT count as done — else its period would
    // silently never re-run
    java.nio.file.Files.createDirectories(
      java.nio.file.Path.of(s"$dir/out/inc_nX_2024-01-09/_temporary"))
    val r2 = MultiPass.resume(spark, job, java.time.LocalDate.parse("2024-01-01"),
      java.time.LocalDate.parse("2024-01-03"), now = "n2")
    assert(r2.map(_.period) == Seq("2024-01-03"))
  }

  test("resume works against a csv sink (format-aware probe and counts)") {
    val dir = tmp()
    Seq(("2024-01-01 01:00:00", 1.0), ("2024-01-02 01:00:00", 2.0),
        ("2024-01-03 01:00:00", 3.0))
      .toDF("ts", "v").select(col("ts").cast("timestamp").as("ts"), col("v"))
      .write.parquet(s"$dir/ev")
    val job = JobSpec(name = "csvres",
      inputs = Map("ev" -> DatasetSpec(path = s"$dir/ev", incField = Some("ts"))),
      output = Some(DatasetSpec(path = s"$dir/out", format = "csv",
        incField = Some("ts"))),
      sql = Some("SELECT CAST(ts AS STRING) AS ts, v FROM ev"))
    val r1 = MultiPass.resume(spark, job, java.time.LocalDate.parse("2024-01-01"),
      java.time.LocalDate.parse("2024-01-02"), now = "n1")
    assert(r1.map(_.rows) == Seq(1L, 1L))
    val r2 = MultiPass.resume(spark, job, java.time.LocalDate.parse("2024-01-01"),
      java.time.LocalDate.parse("2024-01-03"), now = "n2")
    assert(r2.map(_.period) == Seq("2024-01-03"))
    // 3 increments total, no duplicates, csv read back fine
    assert(spark.read.option("header", "true").csv(s"$dir/out/inc_*").count() == 3)
  }

  test("resume probes partitioned sinks and resolves params in paths") {
    val dir = tmp()
    Seq(("2024-01-01", 1.0), ("2024-01-02", 2.0), ("2024-01-03", 3.0))
      .toDF("day", "v").write.parquet(s"$dir/ev")
    val job = JobSpec(name = "presume",
      inputs = Map("ev" -> DatasetSpec(path = s"$dir/ev", incField = Some("day"))),
      output = Some(DatasetSpec(path = "{{root}}/out", incField = Some("day"))),
      incrementalMode = "partitioned",
      sql = Some("SELECT day, v FROM ev"),
      params = Map("root" -> dir))
    val r1 = MultiPass.resume(spark, job, java.time.LocalDate.parse("2024-01-01"),
      java.time.LocalDate.parse("2024-01-02"), now = "n1")
    assert(r1.map(_.period) == Seq("2024-01-01", "2024-01-02"))
    // partitioned layout (day=...) is probed, not inc_* subfolders
    val r2 = MultiPass.resume(spark, job, java.time.LocalDate.parse("2024-01-01"),
      java.time.LocalDate.parse("2024-01-03"), now = "n2")
    assert(r2.map(_.period) == Seq("2024-01-03"))
    assert(spark.read.parquet(s"$dir/out").count() == 3) // no duplicates
  }

  test("chaining: dependency edge takes the fresh frame, no edge reads the declared path") {
    val dir = tmp()
    Seq((1, "disk")).toDF("id", "srcname").write.parquet(s"$dir/snap")
    Seq((2, "mem")).toDF("id", "srcname").createOrReplaceTempView("shadow_src")
    val snapshot = JobSpec(name = "snapshot",
      sql = Some("SELECT id, srcname FROM shadow_src"))
    // path + dependency edge: chained output wins (that is what the edge means)
    val chained = JobSpec(name = "chained",
      inputs = Map("snapshot" -> DatasetSpec(path = s"$dir/snap")),
      dependencies = Seq("snapshot"),
      sql = Some("SELECT srcname FROM snapshot"))
    val outs = Flow.runPipeline(spark,
      Map("snapshot" -> snapshot, "chained" -> chained), "chained", save = false)
    assert(outs("chained").head().getString(0) == "mem")
    // path + NO dependency edge: an unrelated same-named frame in
    // loadedInputs must not shadow the declared data
    val independent = JobSpec(name = "independent",
      inputs = Map("snapshot" -> DatasetSpec(path = s"$dir/snap")),
      sql = Some("SELECT srcname FROM snapshot"))
    val res = graft.engine.Etl.runJob(spark, independent,
      loadedInputs = Map("snapshot" -> outs("snapshot")), save = false)
    assert(res.df.head().getString(0) == "disk")
  }

  test("json_array reader parses whole-file array layout") {
    val dir = tmp()
    Files.writeString(java.nio.file.Paths.get(dir, "a.json"),
      """[{"a": 1, "b": "x"}, {"a": 2, "b": "y"}]""")
    val df = Reader.read(spark, DatasetSpec(path = s"$dir/a.json", format = "json_array"))
    assert(df.count() == 2 && df.columns.sorted.toSeq == Seq("a", "b"))
  }

  test("json_records reader unwraps the records envelope") {
    val dir = tmp()
    Files.writeString(java.nio.file.Paths.get(dir, "r.json"),
      """{"records": [{"a": 1, "b": "x"}, {"a": 2, "b": "y"}]}""")
    val df = Reader.read(spark, DatasetSpec(path = s"$dir/r.json", format = "json_records"))
    assert(df.columns.sorted.toSeq == Seq("a", "b") && df.count() == 2)
  }

  test("multi-path reader unions combos with _source column") {
    val dir = tmp()
    Seq(1).toDF("x").write.option("header", "true").csv(s"$dir/cat1/sub1")
    Seq(2).toDF("x").write.option("header", "true").csv(s"$dir/cat2/sub2")
    val df = Reader.readMultiPath(spark,
      DatasetSpec(path = s"$dir/{cat}/{sub}", format = "csv"),
      Seq(Map("cat" -> "cat1", "sub" -> "sub1"), Map("cat" -> "cat2", "sub" -> "sub2")))
    assert(df.count() == 2 && df.columns.contains("_source"))
  }

  test("listFiles returns matching files as a frame") {
    val dir = tmp()
    Files.writeString(java.nio.file.Paths.get(dir, "a.txt"), "1")
    Files.writeString(java.nio.file.Paths.get(dir, "b.log"), "2")
    val df = PathTemplating.listFiles(spark, dir, Some("*.txt"))
    assert(df.count() == 1 && df.head().getString(0).endsWith("a.txt"))
  }

  test("MultiRun.runGrid re-runs the pipeline per param combo") {
    val dir = tmp()
    Seq(("us", 1), ("eu", 2), ("us", 3)).toDF("region", "v")
      .write.partitionBy("region").parquet(s"$dir/in")
    val jobs = Map("per_region" -> JobSpec(name = "per_region",
      inputs = Map("t" -> DatasetSpec(path = s"$dir/in/region={{region}}")),
      sql = Some("SELECT sum(v) AS total FROM t")))
    val out = graft.engine.MultiRun.runGrid(spark, jobs, "per_region",
      Seq(Map("region" -> "us"), Map("region" -> "eu")), save = false)
    assert(out(Map("region" -> "us")).head().getLong(0) == 4L)
    assert(out(Map("region" -> "eu")).head().getLong(0) == 2L)
  }

  test("QueryCache serves repeated queries from parquet by sql hash") {
    val dir = tmp()
    Seq((1, "x")).toDF("id", "s").createOrReplaceTempView("qc_src")
    val sql = "SELECT id, s FROM qc_src"
    val first = graft.ops.QueryCache.cached(spark, sql, dir)
    assert(first.count() == 1)
    // cache file exists under md5 key; second call reads it even if the
    // view changes underneath
    Seq((1, "x"), (2, "y")).toDF("id", "s").createOrReplaceTempView("qc_src")
    assert(graft.ops.QueryCache.cached(spark, sql, dir).count() == 1)
    assert(graft.ops.QueryCache.cached(spark, sql, dir, overwrite = true).count() == 2)
  }

  test("catalog registration makes a written location queryable by table name") {
    val dir = tmp()
    val df = Seq((1, "a"), (2, "b")).toDF("id", "s")
    df.write.parquet(s"$dir/tbl")
    graft.core.io.Writer.registerTable(df, "graft_reg_test", s"$dir/tbl", "parquet")
    assert(spark.sql("SELECT count(*) FROM graft_reg_test").head().getLong(0) == 2L)
    spark.sql("DROP TABLE graft_reg_test")
  }

  test("catalog registration quotes hostile table names and rejects bad formats") {
    val dir = tmp()
    val df = Seq((1, "a")).toDF("id", "s")
    df.write.parquet(s"$dir/tbl2")
    // a reserved word registers as ONE quoted identifier and is queryable
    graft.core.io.Writer.registerTable(df, "select", s"$dir/tbl2", "parquet")
    assert(spark.sql("SELECT count(*) FROM `select`").head().getLong(0) == 1L)
    spark.sql("DROP TABLE `select`")
    // an injection-shaped name parses as ONE identifier, which the session
    // catalog then rejects as invalid — nothing in it executes
    intercept[org.apache.spark.sql.AnalysisException] {
      graft.core.io.Writer.registerTable(df, "x; DROP TABLE y", s"$dir/tbl2", "parquet")
    }
    intercept[IllegalArgumentException] {
      graft.core.io.Writer.registerTable(df, "t", s"$dir/tbl2", "parquet) AS x--")
    }
  }

  test("copyRaw byte-copies files without parsing") {
    val dir = tmp()
    Files.writeString(java.nio.file.Paths.get(dir, "raw.bin"), "not,a\nvalid[csv")
    graft.core.io.PathTemplating.copyRaw(spark, s"$dir/raw.bin", s"$dir/copy.bin")
    assert(Files.readString(java.nio.file.Paths.get(dir, "copy.bin")) == "not,a\nvalid[csv")
  }

  test("auditCols stamps _created_at with the run timestamp") {
    Seq((1, "x")).toDF("id", "s").createOrReplaceTempView("audit_src")
    val job = JobSpec(name = "audit", sql = Some("SELECT id, s FROM audit_src"))
    val res = graft.engine.Etl.runJob(spark, job, now = "20240101_000000",
      save = false, auditCols = true)
    assert(res.df.columns.contains("_created_at"))
    assert(res.df.head().getAs[String]("_created_at") == "20240101_000000")
  }

  test("SqlFile.runFile reads a .sql file from disk with header params") {
    val dir = tmp()
    Files.writeString(java.nio.file.Paths.get(dir, "job.sql"),
      """----param---- 'lim' : '1' ----
        |SELECT id FROM file_src ORDER BY id LIMIT {{lim}}""".stripMargin)
    Seq(3, 1, 2).toDF("id").createOrReplaceTempView("file_src")
    val out = graft.engine.SqlFile.runFile(spark, s"$dir/job.sql")
    assert(out.collect().map(_.getInt(0)).toSeq == Seq(1))
  }

  test("periods generates inclusive day range") {
    assert(PeriodBuilder.periods(
      java.time.LocalDate.parse("2024-01-30"), java.time.LocalDate.parse("2024-02-02"))
      == Seq("2024-01-30", "2024-01-31", "2024-02-01", "2024-02-02"))
  }
}
