package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Scratch profiler: run ONE gate query under the EXACT bench session
  * (same master/shuffle-partition/timezone shape as [[Bench]]) and
  * attribute wall time to the Spark jobs inside it — the measurement
  * step of the optimization loop (guide §1: find where the time goes
  * before changing anything). Not part of the library API.
  *
  * Usage: runMain graft.ProbeTime <queryName> [sfDir] [passes]
  *   env: SPARK_GRAFT_CPUS (default 32) — bench parity
  *
  * Prints per-pass wall seconds, then the last pass's job table
  * (jobId, seconds, description/callsite) sorted by start, so a
  * fixture-heavy query decomposes into its build/ingest/read phases.
  */
object ProbeTime {
  private final case class JobRow(id: Int, start: Long, var end: Long,
                                  desc: String)

  def main(args: Array[String]): Unit = {
    val name = args.head
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val passes = args.drop(2).headOption.map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // A/B knobs without a rebuild: PROBE_CONF="k=v,k=v"
    sys.env.get("PROBE_CONF").foreach(_.split(',').filter(_.nonEmpty)
      .foreach { kv => val Array(k, v) = kv.split("=", 2); b.config(k, v) })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRow]()
    // AQE submits query-stage jobs from a thread pool, so a job's own
    // callsite is useless — attribute through the SQL execution that owns
    // it (executionId -> the ACTION's callsite), falling back to the
    // result stage's callsite for plain RDD jobs (checkpoint, collect).
    val execSite = new java.util.concurrent.ConcurrentHashMap[Long, String]()
    @volatile var record = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        e match {
          case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
            execSite.put(s.executionId, s.description.linesIterator
              .toSeq.headOption.getOrElse("?")): Unit
          case _ =>
        }
      override def onJobStart(js: SparkListenerJobStart): Unit =
        if (record) {
          val stage = js.stageInfos.sortBy(_.stageId).lastOption
          val site = stage.map(_.name).getOrElse("?")
          val graftFrame = stage.map(_.details).getOrElse("")
            .split('\n').find(l => l.contains("graft.") &&
              !l.contains("ProbeTime")).map(_.trim).getOrElse("")
          val byExec = Option(js.properties)
            .flatMap(p => Option(p.getProperty("spark.sql.execution.id")))
            .flatMap(id => Option(execSite.get(id.toLong)))
          val desc = byExec.getOrElse(site) +
            (if (graftFrame.nonEmpty) s" | $graftFrame" else "")
          jobs.put(js.jobId, JobRow(js.jobId, js.time, js.time, desc))
        }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val r = jobs.get(je.jobId)
        if (r != null) r.end = je.time
      }
    })
    (1 to passes).foreach { p =>
      jobs.clear()
      record = p == passes // job table for the warmed pass only
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[probe] pass $p: $secs%.3f s (rows=$n)")
    }
    record = false
    import scala.jdk.CollectionConverters._
    val rows = jobs.values.asScala.toSeq.sortBy(_.start)
    val total = rows.map(r => (r.end - r.start) / 1e3).sum
    println(f"[probe] last-pass job time sum: $total%.3f s over ${rows.size} jobs")
    rows.foreach { r =>
      val s = (r.end - r.start) / 1e3
      if (s >= 0.05) println(f"[probe]   job ${r.id}%4d ${s}%8.3f s  ${r.desc.take(160)}")
    }
    println("[probe] by call site:")
    rows.groupBy(_.desc).map { case (d, rs) =>
      (rs.map(r => (r.end - r.start) / 1e3).sum, rs.size, d) }
      .toSeq.sortBy(-_._1).take(30).foreach { case (s, n, d) =>
        println(f"[probe]   ${s}%8.3f s  x$n%-4d $d") }
    spark.stop()
  }
}
