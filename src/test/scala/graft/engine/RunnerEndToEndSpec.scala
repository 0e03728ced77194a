package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** O5 end-to-end at the CLI boundary (the SubmitEndToEndSpec discipline
  * applied to `graft.Runner` itself): real `spark-submit` subprocesses
  * drive (a) the monitor manifest's DAG via `--dependencies`, and (b) a
  * crash→resume cycle on the demo manifest's incremental job — a
  * half-written increment (uncommitted `_temporary`-only dir, exactly
  * what a killed executor leaves) must be redone by `--resume`, while
  * committed increments are neither reread nor rewritten.
  */
class RunnerEndToEndSpec extends SparkSpec {
  import spark.implicits._

  private def jarUpClasses(classesDir: java.io.File,
                           jar: java.io.File): Unit = {
    val out = new java.util.jar.JarOutputStream(
      new java.io.FileOutputStream(jar))
    def walk(f: java.io.File, prefix: String): Unit =
      f.listFiles().foreach { c =>
        val name = s"$prefix${c.getName}"
        if (c.isDirectory) walk(c, s"$name/")
        else {
          out.putNextEntry(new java.util.jar.JarEntry(name))
          java.nio.file.Files.copy(c.toPath, out)
          out.closeEntry()
        }
      }
    try walk(classesDir, "") finally out.close()
  }

  private lazy val work = {
    val w = java.nio.file.Files.createTempDirectory("graft_runner_e2e").toFile
    val classes = new java.io.File("target/scala-2.13/classes")
    assume(classes.isDirectory, "compiled classes not found")
    jarUpClasses(classes, new java.io.File(w, "graft.jar"))
    w
  }

  private def runCli(appArgs: Map[String, String],
                     appKeys: Seq[String]): String = {
    val submit = new java.io.File("/opt/spark/bin/spark-submit")
    assume(submit.canExecute, "no spark-submit in this image")
    val jar = new java.io.File(work, "graft.jar")
    val cmd = Submit.buildCommand(jar.getAbsolutePath, Map(
      "spark_submit_keys" -> "class--master--conf",
      "class" -> "graft.Runner",
      "master" -> "local[2]",
      "conf" -> "spark.ui.enabled=false",
      "spark_app_keys" -> appKeys.mkString("--")) ++ appArgs)
    val pb = new ProcessBuilder(
      (submit.getAbsolutePath +: cmd.tail).toArray: _*)
    pb.redirectErrorStream(true)
    pb.directory(new java.io.File("."))
    val p = pb.start()
    val log = new String(p.getInputStream.readAllBytes(), "UTF-8")
    val done = p.waitFor(300, java.util.concurrent.TimeUnit.SECONDS)
    assert(done, s"runner did not finish:\n${log.takeRight(4000)}")
    assert(p.exitValue() == 0,
      s"runner exited ${p.exitValue()}:\n${log.takeRight(4000)}")
    log
  }

  private def rewriteManifest(src: String, outRoot: java.io.File,
                              oldRoot: String): java.io.File = {
    val m = new java.io.File(work,
      new java.io.File(src).getName)
    val yml = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(src).toPath), "UTF-8")
    val w = new java.io.PrintWriter(m, "UTF-8")
    try w.write(yml.replace(s"out_root: $oldRoot",
      s"out_root: ${outRoot.getAbsolutePath}")) finally w.close()
    m
  }

  test("the monitor manifest's drift DAG runs through the CLI with " +
      "--dependencies") {
    val outRoot = new java.io.File(work, "monitor_out")
    val manifest = rewriteManifest("conf/monitor_pipeline.yml", outRoot,
      "/tmp/graft_monitor")
    runCli(Map(
      "manifest" -> manifest.getAbsolutePath,
      "job_name" -> "price_psi",
      "dependencies" -> Submit.flagOnly,
      "mode" -> "dev"),
      Seq("manifest", "job_name", "dependencies", "mode"))
    val psi = spark.read.parquet(s"${outRoot.getAbsolutePath}/price_psi")
    assert(psi.count() === 10L, "price_psi should emit one row per bucket")
    assert(psi.columns.toSet.contains("psi_micro"))
  }

  test("crash -> --resume on the incremental job: the uncommitted " +
      "increment is redone, committed ones stay untouched") {
    val outRoot = new java.io.File(work, "demo_out")
    val manifest = rewriteManifest("conf/jobs.yml", outRoot, "/tmp/graft_demo")
    // seed four days of events for the incremental input
    val days = Seq("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04")
    days.zipWithIndex.flatMap { case (d, i) =>
      (1 to 10 + i).map(j =>
        (java.sql.Timestamp.valueOf(s"$d 0$i:00:0${j % 10}"), s"t${j % 3}",
          j.toDouble))
    }.toDF("ts", "event_type", "value")
      .write.parquet(s"${outRoot.getAbsolutePath}/events_micros")
    val common = Map("manifest" -> manifest.getAbsolutePath,
      "job_name" -> "daily_events", "mode" -> "dev",
      "period_first" -> "2024-01-01")
    // pass 1: days 1-2 commit
    runCli(common + ("period_until" -> "2024-01-02"),
      Seq("manifest", "job_name", "mode", "period_first", "period_until"))
    val sink = new java.io.File(outRoot, "daily_events")
    val committedDirs = sink.listFiles().filter(_.getName.startsWith("inc_"))
    assert(committedDirs.map(_.getName.takeRight(10)).toSet ===
      Set("2024-01-01", "2024-01-02"))
    val stamps = committedDirs.flatMap(d => d.listFiles().map(f =>
      f.getPath -> (f.length(), f.lastModified()))).toMap
    // the crash: a killed day-3 run left an increment dir holding only
    // uncommitted committer scratch
    val crashed = new java.io.File(sink, "inc_crashed_2024-01-03")
    assert(new java.io.File(crashed, "_temporary").mkdirs())
    // pass 2: --resume must redo day 3 (not committed) and run day 4,
    // never reprocessing days 1-2
    val log = runCli(common +
      ("period_until" -> "2024-01-04", "resume" -> Submit.flagOnly),
      Seq("manifest", "job_name", "mode", "period_first", "period_until",
        "resume"))
    assert(log.contains("[runner] period 2024-01-03") &&
      log.contains("[runner] period 2024-01-04"), log.takeRight(2000))
    assert(!log.contains("[runner] period 2024-01-01") &&
      !log.contains("[runner] period 2024-01-02"),
      "resume reprocessed an already-committed increment")
    // committed increments are byte-identical
    committedDirs.foreach(d => d.listFiles().foreach(f =>
      assert(stamps(f.getPath) == ((f.length(), f.lastModified())),
        s"committed file ${f.getPath} was rewritten by resume")))
    // the sink now holds each day exactly once
    val back = spark.read.parquet(s"${sink.getAbsolutePath}/inc_*")
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(back === days.zipWithIndex
      .map { case (d, i) => d -> (10L + i) }.toMap)
    // a third resume is a no-op
    val log3 = runCli(common +
      ("period_until" -> "2024-01-04", "resume" -> Submit.flagOnly),
      Seq("manifest", "job_name", "mode", "period_first", "period_until",
        "resume"))
    assert(log3.contains("nothing to do"), log3.takeRight(1500))
  }

  test("--streaming drains the SAME manifest entry as micro-batches " +
      "through the CLI; a second drain is a no-op") {
    val outRoot = new java.io.File(work, "stream_out")
    outRoot.mkdirs()
    // two feed files -> two micro-batches under maxFilesPerTrigger=1
    Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "k", "v")
      .coalesce(1).write.mode("append")
      .parquet(s"${outRoot.getAbsolutePath}/feed")
    Seq((3L, "a", 30.0)).toDF("id", "k", "v")
      .coalesce(1).write.mode("append")
      .parquet(s"${outRoot.getAbsolutePath}/feed")
    val m = new java.io.File(work, "stream.yml")
    val w = new java.io.PrintWriter(m, "UTF-8")
    try w.write(
      s"""jobs:
         |  stream_copy:
         |    inputs:
         |      src:
         |        path: ${outRoot.getAbsolutePath}/feed
         |        read_kwargs: {maxFilesPerTrigger: "1"}
         |    output:
         |      path: ${outRoot.getAbsolutePath}/sink
         |      inc_field: id
         |    sql: "SELECT id, k, v FROM src WHERE v > 15"
         |""".stripMargin) finally w.close()
    val common = Map("manifest" -> m.getAbsolutePath,
      "job_name" -> "stream_copy", "mode" -> "dev",
      "streaming" -> Submit.flagOnly,
      "stream_checkpoint" -> s"${outRoot.getAbsolutePath}/ckpt")
    val keys = Seq("manifest", "job_name", "mode", "streaming",
      "stream_checkpoint")
    val log = runCli(common, keys)
    assert(log.contains("drained 2 micro-batches"), log.takeRight(2000))
    val back = spark.read.parquet(
      s"${outRoot.getAbsolutePath}/sink/inc_*")
    assert(back.select("id").collect().map(_.getLong(0)).sorted.toSeq
      === Seq(2L, 3L))
    // checkpointed offsets survive the process: a rerun drains nothing
    val log2 = runCli(common, keys)
    assert(log2.contains("drained 0 micro-batches"), log2.takeRight(2000))
  }
}
