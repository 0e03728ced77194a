package graft.core

import org.apache.spark.sql.SparkSession

/** SparkSession factory with the engine's standard tuning.
  *
  * Mirrors the session-construction role of the reference's
  * `yaetos/etl_utils.py:1318-1359` (packages/creds/memory knobs) but
  * Spark-first: AQE on, shuffle partitions sized to the machine instead of
  * the 200 default, UTC session time so results are reproducible against
  * external oracles.
  */
object GraftSession {

  /** Runtime confs that must hold on any session the engine uses, including
    * externally-created ones (Verify/Bench mains, tests).
    */
  def tune(spark: SparkSession): SparkSession = {
    // Some generations of the driver's `events` table store nanosecond
    // timestamps, which Spark's parquet reader rejects; read those as raw
    // longs and let Tables.load convert to microsecond timestamps
    // (micros-generation files are unaffected by this flag).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Tables.load's TIMESTAMP_NTZ -> TIMESTAMP cast (and every oracle
    // comparison) is only value-preserving under a UTC session.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // NOTE on parquet timestamps: the clustered-layout writers
    // (graft.ops.Layout) write INT64 micros per-write (INT96 carries no
    // usable min/max stats — it would blind row-group pushdown and the
    // Skipping footer profiler). That stays PER-WRITE, not session-wide:
    // downstream consumers (pandas/arrow correctness harnesses) read
    // adjusted-to-UTC INT64 as tz-AWARE and choke comparing against
    // tz-naive oracles, so general outputs keep the engine default.
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // Reading a glob path (incremental inc_* sinks) makes FileStreamSink's
    // metadata probe WARN-log a full FileNotFoundException stack before
    // batch resolution proceeds normally — pure noise on every incremental
    // read, silenced to ERROR.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.streaming.sinks.FileStreamSink",
      org.apache.logging.log4j.Level.ERROR)
    graft.functions.NativeFunctions.register(spark)
    spark
  }

  def local(cores: Int = Runtime.getRuntime.availableProcessors(),
            appName: String = "graft",
            shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    tune(spark)
  }
}
