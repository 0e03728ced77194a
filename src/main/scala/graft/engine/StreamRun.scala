package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import graft.core.model.{JobSpec, Params}

/** YAML-declared STREAMING jobs: the same manifest entry that describes a
  * batch job (inputs → SQL/class transform → incremental output) runs as
  * a Structured Streaming pipeline — file-source micro-batches through
  * the job's transform into per-batch increments
  * ([[graft.streaming.Streams.writeIncrements]]), with the output's
  * `stats_manifest` ticked per batch like any other write. The reference
  * has no streaming at all (Kafka is a push-only sink,
  * yaetos/kafka_utils.py); here the SAME declarative job graduates from
  * cron cadence to continuous without a rewrite — the q133/q183 lanes'
  * operability story completed at the manifest level.
  *
  * Scope rules, enforced loudly:
  *  - exactly ONE input, a file-source format (parquet/csv/json/text) —
  *    multi-input streaming joins need the dedicated
  *    [[graft.streaming.Streams.streamStreamJoin]] lane with watermarks,
  *    not a silent unbounded-state SQL join;
  *  - the transform must be stream-safe (projections/filters/row-local
  *    functions — Spark rejects unsupported shapes at `start()`, which
  *    propagates);
  *  - the output must be incremental or partitioned (the
  *    [[graft.streaming.Streams.writeIncrements]] contract) — unless a
  *    `stream_lane` param routes the stream into one of the engine's
  *    stateful sink lanes (psi_drift/ks_drift/psi_by_group/ks_by_group/
  *    neardup/token_neardup/reservoir), making the drift monitors,
  *    near-dup ingest, and weighted reservoir manifest-declarable with
  *    the output path as the lane's partials/accepted sink.
  *
  * The input's schema comes from a one-time batch probe of the files
  * already at the path (streaming sources cannot infer) — a streaming
  * job therefore starts against a NON-EMPTY directory, the same contract
  * as every persisted-index ingest lane.
  *
  * `runOnce` is the cadence-friendly drain (process everything
  * available, then stop): idempotent under crash-replay via the
  * delete-first increment contract, so a scheduler can invoke it exactly
  * like a batch period pass — Trigger.AvailableNow semantics with the
  * engine's own replay guarantees.
  */
object StreamRun {

  /** Start the streaming query for a YAML job. Caller owns the returned
    * handle (stop/await).
    */
  def start(spark: SparkSession, job: JobSpec, checkpoint: String,
            now: String): StreamingQuery = {
    require(job.inputs.size == 1,
      s"streaming job ${job.name} needs exactly one input, got " +
        s"${job.inputs.keys.mkString(",")}")
    val (name, ds0) = job.inputs.head
    val ds = Params.resolve(ds0, job.params)
      .copy(path = graft.core.io.PathTemplating.expandNow(
        Params.resolve(ds0, job.params).path, now))
    require(Seq("parquet", "csv", "json", "text").contains(ds.format),
      s"streaming job ${job.name}: unsupported stream source ${ds.format}")
    // one-time schema probe: streaming file sources cannot infer
    val schema = graft.core.io.Reader.read(spark, ds, period = None).schema
    val stream = graft.streaming.Streams.readFileStream(spark, ds,
      schema.toDDL)
    stream.createOrReplaceTempView(name)
    val out: DataFrame = Etl.transformOf(job)
      .transform(Map(name -> stream), spark, job.params)
    val o = job.output.map(x => Params.resolve(x, job.params)).getOrElse(
      sys.error(s"streaming job ${job.name} needs an output"))
    val outPath = graft.core.io.PathTemplating.expandNow(o.path, now)
    def p(k: String): String = job.params.getOrElse(k,
      sys.error(s"streaming job ${job.name}: lane " +
        s"'${job.params("stream_lane")}' needs param '$k'"))
    // `stream_lane` dispatches the transformed stream into one of the
    // engine's stateful sink lanes instead of plain increments — the
    // whole streaming surface (drift monitors, near-dup ingest, the
    // weighted reservoir) becomes manifest-declarable. The output path
    // is the lane's partials/accepted sink; each lane keeps its own
    // replay contract (delete-first batch dirs, idempotent appends).
    job.params.get("stream_lane") match {
      case None =>
        graft.streaming.Streams.writeIncrements(out, job, o, checkpoint, now)
      case Some("psi_drift") =>
        graft.streaming.Streams.psiDriftSink(out, p("ref"),
          p("value_col"), outPath, checkpoint)
      case Some("ks_drift") =>
        graft.streaming.Streams.ksDriftSink(out, p("value_col"),
          outPath, checkpoint)
      case Some("psi_by_group") =>
        graft.streaming.Streams.psiByGroupDriftSink(out, p("ref"),
          p("group_col"), p("value_col"), outPath, checkpoint)
      case Some("ks_by_group") =>
        graft.streaming.Streams.ksByGroupDriftSink(out, p("group_col"),
          p("value_col"), outPath, checkpoint)
      case Some("neardup") =>
        graft.streaming.Streams.nearDupSink(out, p("index"), p("id_col"),
          p("text_col"), p("threshold").toDouble,
          job.params.get("max_band_freq").map(_.toInt), outPath,
          checkpoint, job.params.get("clusters_path"))
      case Some("token_neardup") =>
        graft.streaming.Streams.tokenNearDupSink(out, p("index"),
          p("id_col"), p("text_col"), p("threshold").toDouble,
          job.params.get("max_band_freq").map(_.toInt), outPath,
          checkpoint, job.params.get("clusters_path"))
      case Some("dedup") =>
        // watermarked exactly-once key dedup, then plain increments:
        // the q74 stateful lane composed with the increment landing —
        // a YAML-declared streaming dedup pipeline
        val deduped = graft.streaming.Streams.dedupStream(out,
          p("ts_col"), p("keys").split(",").map(_.trim).toSeq,
          p("watermark"))
        graft.streaming.Streams.writeIncrements(deduped, job, o,
          checkpoint, now)
      case Some("reservoir") =>
        graft.streaming.Streams.reservoirSampleSink(out, p("id_col"),
          p("group_col"), p("weight_col"), p("n").toInt, outPath,
          checkpoint, job.params.getOrElse("salt", "es"))
      case Some(other) => sys.error(
        s"streaming job ${job.name}: unknown stream_lane '$other' — " +
          "one of psi_drift|ks_drift|psi_by_group|ks_by_group|" +
          "neardup|token_neardup|reservoir|dedup, or omit for increments")
    }
  }

  /** Drain-and-stop: process every file currently at the source, then
    * stop — the run-once mode a scheduler drives on a cadence. Returns
    * the number of micro-batches the drain executed.
    */
  def runOnce(spark: SparkSession, job: JobSpec, checkpoint: String,
              now: String): Long = {
    val q = start(spark, job, checkpoint, now)
    try {
      q.processAllAvailable()
      q.lastProgress match {
        case null => 0L
        case p => p.batchId + 1
      }
    } finally q.stop()
  }
}
