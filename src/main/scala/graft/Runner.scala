package graft

import graft.core.GraftSession
import graft.core.model.{JobSpec, Manifest}
import graft.engine.{Etl, Flow, MultiPass}
import java.time.LocalDate

/** CLI entry point (reference Runner/Commandliner surface,
  * yaetos/etl_utils.py:1122-1254): manifest-driven single-job or pipeline
  * runs, local mode.
  *
  * {{{
  * runMain graft.Runner --manifest=conf/jobs.yml --job_name=my_job \
  *   [--mode=dev[,prod]] [--dependencies] [--period_first=YYYY-MM-DD] \
  *   [--period_until=YYYY-MM-DD] [--no_save] [--dry_run] [--param.k=v ...]
  * }}}
  */
object Runner {

  /** Reliable-checkpoint opt-in (iterative ops like connectedComponents
    * upgrade from localCheckpoint when a dir is configured): a job param
    * or --param.checkpoint_dir=<shared fs path> on the CLI. The target
    * job's param wins; in --dependencies mode a job in the target's
    * UPSTREAM CLOSURE also counts (exactly the jobs `Flow.runPipeline`
    * executes in this session — an unrelated pipeline sharing the
    * manifest must not redirect this run's checkpoints) — ties broken by
    * job-name order so the pick is deterministic.
    */
  def resolveCheckpointDir(job: JobSpec, jobs: Map[String, JobSpec],
                           withDependencies: Boolean): Option[String] = {
    // param VALUES may reference other params ({{out_root}}/_ckpt) —
    // resolve against the declaring job's merged param map
    def dirOf(j: JobSpec): Option[String] =
      j.params.get("checkpoint_dir")
        .map(graft.core.model.Params.interpolate(_, j.params))
    dirOf(job).orElse(
      if (withDependencies)
        Flow.upstream(jobs, job.name).toSeq.sortBy(_._1)
          .flatMap(j => dirOf(j._2)).headOption
      else None)
  }

  /** `--dry_run`: the resolved execution plan as printable lines — job
    * order (the target's upstream closure under `--dependencies`), each
    * job's inputs (path/format or in-memory df), transform kind, output,
    * and the checkpoint dir a real run would set. Pure manifest
    * resolution: no SparkSession, no filesystem access — validate a
    * manifest edit without paying a cluster.
    */
  def dryRunPlan(jobs: Map[String, JobSpec], jobName: String,
                 withDependencies: Boolean): Seq[String] = {
    val job = jobs.getOrElse(jobName, sys.error(s"job not in manifest: $jobName"))
    val order =
      if (withDependencies) Flow.topoOrder(Flow.upstream(jobs, jobName))
      else Seq(jobName)
    val ckpt = resolveCheckpointDir(job, jobs, withDependencies)
      .map(d => s"checkpoint_dir: $d").toSeq
    ckpt ++ order.zipWithIndex.flatMap { case (name, i) =>
      val j = jobs(name)
      // resolve {{param}}s; runtime tokens ({{now}}, {{latest}}) stay
      def p(path: String): String =
        graft.core.model.Params.interpolate(path, j.params)
      val kind =
        if (j.sql.isDefined) "sql"
        else if (j.sqlFile.isDefined) s"sql_file ${j.sqlFile.get}"
        else j.className.map(c => s"class $c").getOrElse("copy")
      val ins = j.inputs.map { case (n, ds) =>
        // a skip_manifest input surfaces its pruning setup: the manifest
        // it will consult and each declared conjunct (the period window
        // from inc_field joins at run time)
        val skip = ds.skipManifest.map { mf =>
          val rs = ds.skipRanges.map(r =>
            if (r.notNull) s"${r.column} IS NOT NULL"
            else if (r.values.nonEmpty)
              s"${r.column} IN (${r.values.map(p).mkString(",")})"
            else s"${r.column} in [${r.lower.map(p).getOrElse("-inf")}, " +
              s"${r.upper.map(p).getOrElse("+inf")}]").mkString(" AND ")
          val inc = ds.incField.map(f =>
            (if (rs.nonEmpty) " AND " else "") + s"$f in [period]").getOrElse("")
          s" skip_manifest=${p(mf)}" +
            (if (ds.skipBlooms) " +footer_blooms" else "") +
            (if (rs.nonEmpty || inc.nonEmpty) s" prune: $rs$inc" else "")
        }.getOrElse("")
        if (ds.format == "df") s"$n=<in-memory>"
        else s"$n=${p(ds.path)} (${ds.format})$skip"
      }.mkString(", ")
      val out = j.output.map { o =>
        // a stats_manifest output surfaces its write-path maintenance:
        // the manifest the write will build-or-refresh
        val mf = o.statsManifest.map(m => s" stats_manifest=${p(m)}" +
          (if (o.statsCols.nonEmpty) s" cols=${o.statsCols.mkString(",")}"
           else "")).getOrElse("")
        s" -> ${p(o.path)} (${o.format})$mf"
      }.getOrElse("")
      Seq(f"${i + 1}%2d. $name [$kind] inputs: $ins$out")
    }
  }

  def main(args: Array[String]): Unit = {
    val kv = args.collect {
      case a if a.startsWith("--") && a.contains("=") =>
        val Array(k, v) = a.drop(2).split("=", 2); k -> v
      case a if a.startsWith("--") => a.drop(2) -> "true"
    }.toMap
    val manifestPath = kv.getOrElse("manifest", sys.error("--manifest=<yml> required"))
    val jobName = kv.getOrElse("job_name", sys.error("--job_name=<name> required"))
    val modes = kv.getOrElse("mode", "dev").split(",").toSeq
    val cmdParams = kv.collect { case (k, v) if k.startsWith("param.") => k.drop(6) -> v }
    val loaded = Manifest.loadFile(manifestPath, modes, cmdParams)
    val job = loaded.jobs.getOrElse(jobName, sys.error(s"job not in manifest: $jobName"))
    if (kv.contains("dry_run")) {
      dryRunPlan(loaded.jobs, jobName, kv.contains("dependencies"))
        .foreach(println)
      return
    }
    val spark = GraftSession.local(appName = s"graft-$jobName")
    resolveCheckpointDir(job, loaded.jobs, kv.contains("dependencies"))
      .foreach(spark.sparkContext.setCheckpointDir)
    // `--streaming`: run the SAME manifest entry as a Structured
    // Streaming drain (process everything available at the file source,
    // then stop) — graft.engine.StreamRun. Cadence-friendly and
    // crash-replay idempotent via the delete-first increment contract.
    if (kv.contains("streaming")) {
      val ckpt = kv.get("stream_checkpoint")
        .orElse(resolveCheckpointDir(job, loaded.jobs,
          withDependencies = false).map(_ + s"/_stream_$jobName"))
        .getOrElse(sys.error("--streaming needs --stream_checkpoint=<dir> " +
          "or a checkpoint_dir param"))
      val n = graft.engine.StreamRun.runOnce(spark, job, ckpt,
        graft.engine.Etl.defaultNow())
      println(s"[stream] $jobName drained $n micro-batches")
      spark.stop()
      return
    }
    val save = !kv.contains("no_save")
    // Failure notification (reference send_job_failure_email,
    // yaetos/etl_utils.py:754-755): fires only when the job declares
    // owners + a connection file; the notification itself never masks the
    // original failure.
    def notifyFailure(e: Throwable): Unit =
      (job.params.get("owners"), job.params.get("connection_file")) match {
        case (Some(owners), Some(cfg)) =>
          try graft.engine.Notify.sendMessage(
            graft.engine.Notify.failureMessage(jobName, String.valueOf(e)),
            owners.split(",").map(_.trim).filter(_.nonEmpty).toSeq,
            graft.core.Secrets.retrieve("local", cfg),
            job.params.getOrElse("email_cred_section", "email_notify")): Unit
          catch { case n: Throwable =>
            System.err.println(s"[runner] failure notification failed: $n") }
        case _ => ()
      }
    try {
      if (kv.contains("dependencies")) {
        if (kv.contains("metrics")) {
          // --metrics: per-stage row/time accounting (counts are real
          // work — see Flow.runPipelineMetered's caching policy)
          val (outs, ms) = Flow.runPipelineMetered(spark, loaded.jobs,
            jobName, save = save)
          ms.foreach(m => println(
            f"[metrics] ${m.job}%-24s ${m.rows}%12d rows ${m.seconds}%8.2f s"))
          outs(jobName).show(20, truncate = false)
        } else {
          val outs = Flow.runPipeline(spark, loaded.jobs, jobName, save = save)
          outs(jobName).show(20, truncate = false)
        }
      } else (kv.get("period_first"), kv.get("period_until")) match {
        case (Some(f), Some(u)) =>
          val results =
            if (kv.contains("resume"))
              MultiPass.resume(spark, job, LocalDate.parse(f), LocalDate.parse(u),
                save = save)
            else MultiPass.run(spark, job, LocalDate.parse(f), LocalDate.parse(u),
              save = save)
          if (results.isEmpty) println("[runner] nothing to do (all periods already processed)")
          results.foreach(r => println(s"[runner] period ${r.period}: ${r.rows} rows -> ${r.path}"))
        case _ =>
          val res = Etl.runJob(spark, job, save = save)
          res.df.show(20, truncate = false)
          res.writtenPath.foreach(p => println(s"[runner] wrote $p"))
      }
    } catch { case e: Throwable => notifyFailure(e); throw e }
    finally spark.stop()
  }
}
