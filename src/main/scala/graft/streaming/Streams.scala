package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import graft.core.io.Writer
import graft.core.model.{DatasetSpec, JobSpec}

/** Structured Streaming surface. The reference has no stream consumer
  * (Kafka is a push-only sink, reference yaetos/kafka_utils.py) — this
  * module is the Spark-native extension of its incremental jobs: the same
  * day-granularity batch increments, re-expressed as continuous streams
  * with watermarks and stateful operators.
  */
object Streams {

  /** Run `body` with `spark.sql.shuffle.partitions` set to `n`,
    * restoring the prior value after. A stateful streaming query creates
    * one state store per shuffle partition PER stateful operator, and
    * the count is frozen into the checkpoint at first start — so size it
    * to the expected state-key cardinality (join keys, open sessions),
    * not the batch shuffle width: a 100 TB batch job wants wide
    * shuffles, but a stream with bounded state only multiplies
    * state-store open/commit overhead per micro-batch by oversizing
    * (measured 2.2× end-to-end on the stream-stream join fixture going
    * 32 → 8).
    *
    * NOT thread-safe: the conf is session-global, so any query started
    * concurrently on the same SparkSession inside the block (or a nested
    * use with a different `n`) picks up or clobbers the wrong value.
    * Start streams from one thread, or give concurrent workloads their
    * own `spark.newSession()` (per-session conf, shared catalog/state).
    */
  def withStatePartitions[T](spark: SparkSession, n: Int)(body: => T): T = {
    require(n >= 1, s"state partitions must be >= 1, got $n")
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try body finally spark.conf.set(key, prev)
  }

  /** File-source stream over the same DatasetSpec formats as the batch
    * Reader (schema required — streaming reads can't infer).
    */
  def readFileStream(spark: SparkSession, ds: DatasetSpec, schemaDdl: String): DataFrame = {
    // defaults first, user readOptions second so they can override (same
    // precedence as the batch Reader)
    val reader = spark.readStream.schema(schemaDdl)
    ds.format match {
      case "csv" => reader.option("header", "true").options(ds.readOptions).csv(ds.path)
      case "json" => reader.options(ds.readOptions).json(ds.path)
      case "parquet" => reader.options(ds.readOptions).parquet(ds.path)
      case "text" => reader.options(ds.readOptions).text(ds.path)
      case other => sys.error(s"unsupported stream source format: $other")
    }
  }

  /** Streaming JSONL ingestion with the quarantine lane: the EXACT
    * row-local classification of [[graft.core.io.Reader
    * .readJsonQuarantine]] over an unbounded text file source — corrupt
    * lines flow to `bad` (raw line + source file) while parsed rows flow
    * to `good`, each a streaming frame for its own sink. Stateless, so
    * watermarks/state never enter the picture and batch == stream is a
    * code identity, not a re-implementation (q133 pins it behind the
    * hash gate anyway).
    */
  def quarantineJsonStream(spark: SparkSession, path: String,
                           schemaDdl: String)
      : graft.core.io.Reader.Quarantined =
    graft.core.io.Reader.quarantineSplit(
      spark.readStream.schema("value STRING").text(path), schemaDdl)

  /** [[quarantineJsonStream]] for strict headerless CSV
    * ([[graft.core.io.Reader.readCsvQuarantine]] semantics).
    */
  def quarantineCsvStream(spark: SparkSession, path: String,
                          schemaDdl: String)
      : graft.core.io.Reader.Quarantined =
    graft.core.io.Reader.quarantineSplit(
      spark.readStream.schema("value STRING").text(path), schemaDdl,
      isJson = false)

  /** Watermarked sliding-window aggregation: counts + sum per
    * (window, key). Late rows beyond `watermarkDelay` are dropped and
    * their state reclaimed — the property that keeps state bounded on an
    * unbounded stream.
    */
  def windowedAgg(df: DataFrame, tsCol: String, keyCol: String,
                  watermarkDelay: String, windowDur: String,
                  slide: Option[String] = None,
                  valueCol: String = "value"): DataFrame = {
    val win = slide match {
      case Some(s) => window(col(tsCol), windowDur, s)
      case None => window(col(tsCol), windowDur)
    }
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy(win.as("w"), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(valueCol).as("sum_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col(keyCol), col("n"), col("sum_value"))
  }

  /** Streaming dedup on a key within the watermark horizon — the streaming
    * twin of exact batch dedup (state bounded by the watermark).
    */
  def dedupStream(df: DataFrame, tsCol: String, keys: Seq[String],
                  watermarkDelay: String): DataFrame = {
    require(keys.nonEmpty, "dedupStream needs at least one key column")
    df.withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
  }

  /** Watermarked stream-stream inner join: right rows match left rows of
    * the same key within `[leftTs - within, leftTs]`. Both sides carry
    * watermarks and the join condition bounds event-time distance, so
    * Spark can expire join state — without the bound, stream-stream join
    * state grows forever.
    */
  def streamJoin(left: DataFrame, right: DataFrame, key: String,
                 leftTs: String, rightTs: String,
                 watermarkDelay: String, within: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermarkDelay)
    val r = right.withWatermark(rightTs, watermarkDelay)
    l.join(r,
        l(key) === r(key) &&
          r(rightTs) >= l(leftTs) - expr(s"INTERVAL $within") &&
          r(rightTs) <= l(leftTs))
      .drop(r(key))
  }

  /** foreachBatch bridge into the batch Writer: each micro-batch lands as
    * one increment through the same sink code as batch jobs (path
    * suffixing, partitioning). Requires an incremental job — otherwise
    * the Writer's error-if-exists mode would kill the stream on the
    * second batch.
    *
    * Replay safety: Spark re-runs a micro-batch when the query fails (or
    * restarts) after the write but before the checkpoint commit. For
    * `no_schema` increments the target `inc_<now>_batch<id>` dir is a
    * pure function of the batch id, so the bridge DELETES it before
    * writing — a replay rewrites the same increment instead of appending
    * a duplicate copy (pass the SAME `now` when restarting against the
    * same checkpoint, or stale-now increments survive as duplicates).
    * `partitioned` mode appends into shared partition dirs, where no
    * per-batch scope exists to delete — that mode is at-least-once on
    * replay; downstream consumers needing exactly-once should dedup on a
    * key or consume `no_schema` increments.
    */
  def writeIncrements(stream: DataFrame, job: JobSpec, out: DatasetSpec,
                      checkpoint: String, now: String): StreamingQuery = {
    require(job.isIncremental || job.partitionBy.nonEmpty,
      s"writeIncrements needs an incremental or partitioned job " +
        s"(${job.name} would error-if-exists on the second micro-batch)")
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        writeIncrement(batch.toDF(), job, out, now, id): Unit
      }
      .start()
  }

  /** One micro-batch's write — the foreachBatch body, separated so the
    * replay contract is directly testable: calling it twice with the same
    * batch id leaves exactly one copy of a `no_schema` increment.
    */
  def writeIncrement(batch: DataFrame, job: JobSpec, out: DatasetSpec,
                     now: String, id: Long): Writer.Written = {
    val period = Some(s"batch$id")
    if (job.isIncremental && job.incrementalMode == "no_schema") {
      // Writer.targetPath is the ONE definition of the increment layout —
      // deleting a hand-derived name here would silently stop matching if
      // the layout changed, and replays would duplicate again
      val p = new org.apache.hadoop.fs.Path(
        Writer.targetPath(job, out, now, period))
      val fs = p.getFileSystem(
        batch.sparkSession.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) { fs.delete(p, true); () }
    }
    val written = Writer.write(batch, job, out, now, period)
    // write-path skipping maintenance, streaming twin of the batch
    // Etl hook: each micro-batch ticks the sink's stats manifest
    // (first batch builds, later batches delta-refresh). Replay safe:
    // a replayed batch deletes its increment dir first, so the append
    // tick drops the vanished files' rows and profiles the rewrites —
    // the manifest converges to the on-disk file set either way.
    out.statsManifest.foreach { mf =>
      require(out.format == "parquet",
        s"stats_manifest needs a parquet sink, got ${out.format}")
      graft.core.io.Skipping.maintainManifest(batch.sparkSession,
        graft.core.io.PathTemplating.expandNow(out.path, now),
        graft.core.io.PathTemplating.expandNow(mf, now),
        out.statsCols): Unit
    }
    written
  }

  /** Continuous drift monitoring against a STORED PSI reference
    * ([[graft.ops.Stats.writePsiReference]]): each micro-batch
    * contracts to its integer bucket partial
    * ([[graft.ops.Stats.psiCurrentPartial]]) and lands as one parquet
    * increment per batch id — the mergeable-partials discipline made
    * continuous. The monitor's CURRENT score at any point is
    * [[graft.ops.Stats.psiFromPartials]] over the accumulated
    * partials (order-free integer sums, so reading them in any state
    * of the stream is consistent), bit-identical to a batch recompute
    * over everything streamed so far — the reference corpus is never
    * read after its one-time profile write.
    *
    * Replay safe: the per-batch dir is a pure function of the batch id
    * and is deleted before write (the [[writeIncrement]] contract), so
    * a crash between write and checkpoint commit re-lands the same
    * partial instead of double-counting it.
    */
  def psiDriftSink(stream: DataFrame, refPath: String, valueCol: String,
                   partialsPath: String, checkpoint: String): StreamingQuery = {
    // the stored reference edges are bins-sized and IMMUTABLE for the
    // life of the monitor — load them once per drain and feed every
    // micro-batch from the captured array instead of re-reading the
    // reference parquet per batch (a driver job per batch, pure
    // protocol overhead)
    val edges = graft.ops.Stats.loadPsiEdges(stream.sparkSession, refPath)
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        applyPsiDriftBatch(batch.toDF(), edges, valueCol, partialsPath, id)
      }
      .start()
  }

  /** One micro-batch's partial — separated so the replay contract is
    * directly testable: applying the same batch twice leaves one copy.
    */
  def applyPsiDriftBatch(batch: DataFrame, refPath: String, valueCol: String,
                         partialsPath: String, id: Long): Unit =
    applyPsiDriftBatch(batch,
      graft.ops.Stats.loadPsiEdges(batch.sparkSession, refPath), valueCol,
      partialsPath, id)

  /** [[applyPsiDriftBatch]] from pre-loaded reference edges — the form
    * the sink's per-batch loop uses (edges load once per drain).
    */
  def applyPsiDriftBatch(batch: DataFrame, edges: Array[Double],
                         valueCol: String, partialsPath: String,
                         id: Long): Unit = {
    val spark = batch.sparkSession
    val dir = new org.apache.hadoop.fs.Path(s"$partialsPath/batch$id")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(dir)) { fs.delete(dir, true); () }
    graft.ops.Stats.psiCurrentPartial(batch, valueCol, edges)
      .write.parquet(dir.toString)
  }

  /** Continuous KS drift monitoring — [[psiDriftSink]]'s discipline for
    * the distribution-free test: each micro-batch contracts to its
    * mergeable distinct-value counts
    * ([[graft.ops.Stats.ksCurrentPartial]] — integer `(v, n_cur)` rows,
    * order-free under union) and lands as one parquet increment per
    * batch id. The monitor's CURRENT statistic at any point is
    * [[graft.ops.Stats.ksFromPartials]] over the accumulated partials
    * against the stored reference ([[graft.ops.Stats.writeKsReference]]),
    * bit-identical to a batch [[graft.ops.Stats.ksStatistic]] recompute
    * over everything streamed so far — the reference corpus is never
    * read after its one-time value-count write.
    *
    * Replay safe: the per-batch dir is a pure function of the batch id
    * and is deleted before write (the [[writeIncrement]] contract).
    * Note the partial needs no reference access at all — value counts
    * are reference-free — so the sink takes no refPath.
    */
  def ksDriftSink(stream: DataFrame, valueCol: String,
                  partialsPath: String, checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        applyKsDriftBatch(batch.toDF(), valueCol, partialsPath, id)
      }
      .start()

  /** One micro-batch's KS partial — separated so the replay contract is
    * directly testable: applying the same batch twice leaves one copy.
    */
  def applyKsDriftBatch(batch: DataFrame, valueCol: String,
                        partialsPath: String, id: Long): Unit = {
    val spark = batch.sparkSession
    val dir = new org.apache.hadoop.fs.Path(s"$partialsPath/batch$id")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(dir)) { fs.delete(dir, true); () }
    graft.ops.Stats.ksCurrentPartial(batch, valueCol)
      .write.parquet(dir.toString)
  }

  /** PER-GROUP continuous PSI drift — [[psiDriftSink]] composed with the
    * persisted slice references ([[graft.ops.Stats.writePsiReferenceByGroup]]):
    * each micro-batch contracts to its `(group, bucket, n_cur)` integer
    * partial against the STORED per-group edges
    * ([[graft.ops.Stats.psiByGroupCurrentPartial]]) and lands as one
    * parquet increment per batch id. The monitor's slice matrix at any
    * point is [[graft.ops.Stats.psiByGroupFromPartials]] over the
    * accumulated partials — bit-identical to a batch
    * [[graft.ops.Stats.psiByGroup]] recompute over everything streamed,
    * with the reference slices never re-read after their one-time
    * profile. Replay-safe via the per-batch-dir delete-and-rewrite
    * contract, like every sink in this family.
    */
  def psiByGroupDriftSink(stream: DataFrame, refPath: String,
                          groupCol: String, valueCol: String,
                          partialsPath: String,
                          checkpoint: String): StreamingQuery = {
    // per-drain capture of the (groups × bins) stored edges as a LOCAL
    // relation — each micro-batch broadcasts driver rows instead of
    // re-scanning the reference parquet (the psiDriftSink discipline,
    // per-group form)
    val edges = graft.ops.Stats.loadPsiGroupEdges(stream.sparkSession,
      refPath)
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        applyPsiByGroupDriftBatch(batch.toDF(), edges, groupCol, valueCol,
          partialsPath, id)
      }
      .start()
  }

  /** One micro-batch's per-group PSI partial — separated so the replay
    * contract is directly testable: the same batch twice leaves one copy.
    */
  def applyPsiByGroupDriftBatch(batch: DataFrame, refPath: String,
                                groupCol: String, valueCol: String,
                                partialsPath: String, id: Long): Unit =
    applyPsiByGroupDriftBatch(batch,
      batch.sparkSession.read.parquet(s"$refPath/edges"), groupCol,
      valueCol, partialsPath, id)

  /** [[applyPsiByGroupDriftBatch]] from a pre-loaded edges frame — the
    * form the sink's per-batch loop uses (edges captured once per
    * drain).
    */
  def applyPsiByGroupDriftBatch(batch: DataFrame, edges: DataFrame,
                                groupCol: String, valueCol: String,
                                partialsPath: String, id: Long): Unit = {
    val spark = batch.sparkSession
    val dir = new org.apache.hadoop.fs.Path(s"$partialsPath/batch$id")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(dir)) { fs.delete(dir, true); () }
    graft.ops.Stats.psiByGroupCurrentPartial(batch, groupCol, valueCol,
        edges)
      .write.parquet(dir.toString)
  }

  /** PER-GROUP continuous KS drift — [[ksDriftSink]] composed with the
    * persisted per-group value counts
    * ([[graft.ops.Stats.writeKsReferenceByGroup]]): each micro-batch
    * contracts to mergeable `(g, v, n_cur)` counts
    * ([[graft.ops.Stats.ksByGroupCurrentPartial]] — reference-free, so
    * no refPath) and lands as one increment per batch id; score any
    * time with [[graft.ops.Stats.ksByGroupFromPartials]], bit-identical
    * to the batch [[graft.ops.Stats.ksByGroup]] recompute.
    */
  def ksByGroupDriftSink(stream: DataFrame, groupCol: String,
                         valueCol: String, partialsPath: String,
                         checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        applyKsByGroupDriftBatch(batch.toDF(), groupCol, valueCol,
          partialsPath, id)
      }
      .start()

  /** One micro-batch's per-group KS partial — replay-testable twin. */
  def applyKsByGroupDriftBatch(batch: DataFrame, groupCol: String,
                               valueCol: String, partialsPath: String,
                               id: Long): Unit = {
    val spark = batch.sparkSession
    val dir = new org.apache.hadoop.fs.Path(s"$partialsPath/batch$id")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(dir)) { fs.delete(dir, true); () }
    graft.ops.Stats.ksByGroupCurrentPartial(batch, groupCol, valueCol)
      .write.parquet(dir.toString)
  }

  /** Continuous weighted sampling WITHOUT replacement over an unbounded
    * stream — [[graft.ops.Sampling.prioritySamplePerGroup]] maintained
    * as a reservoir. Each micro-batch contracts to ITS OWN per-group
    * top-n under the deterministic Efraimidis–Spirakis key
    * ([[graft.ops.Sampling.esKeyMicro]] — a pure function of id and
    * weight, no RNG state) and lands as one parquet increment per batch
    * id; the reservoir at any point is [[loadReservoir]], the per-group
    * top-n over the union of partials. Because the key is deterministic,
    * top-n is associative — top_n(A ∪ B) = top_n(top_n(A) ∪ top_n(B)) —
    * so the streamed reservoir is bit-identical to the batch sampler run
    * over everything streamed so far, held to the SAME DuckDB oracle
    * (q210 vs q139).
    *
    * Scale: a partial never exceeds groups × n rows regardless of batch
    * size (the contraction happens inside the batch), so the read side
    * is bounded by batches × groups × n;
    * [[graft.core.io.Maintenance.compactIncrements]] folds old partials
    * when the batch count grows. Replay safe: delete-first batch dirs
    * (the [[writeIncrement]] contract) plus the largest-key-per-id
    * collapse in [[graft.ops.Sampling.reservoirMerge]].
    */
  def reservoirSampleSink(stream: DataFrame, idCol: String, groupCol: String,
                          weightCol: String, n: Int, partialsPath: String,
                          checkpoint: String,
                          salt: String = "es"): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        applyReservoirBatch(batch.toDF(), idCol, groupCol, weightCol, n,
          partialsPath, id, salt)
      }
      .start()

  /** One micro-batch's reservoir partial — separated so the replay
    * contract is directly testable: applying the same batch twice leaves
    * one copy.
    */
  def applyReservoirBatch(batch: DataFrame, idCol: String, groupCol: String,
                          weightCol: String, n: Int, partialsPath: String,
                          id: Long, salt: String = "es"): Unit = {
    val spark = batch.sparkSession
    val dir = new org.apache.hadoop.fs.Path(s"$partialsPath/batch$id")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(dir)) { fs.delete(dir, true); () }
    graft.ops.Sampling.prioritySamplePerGroup(batch, idCol, groupCol,
        weightCol, n, salt)
      .drop("rank") // rank is a property of the MERGED reservoir
      .write.parquet(dir.toString)
  }

  /** The current reservoir: per-group top-n over the accumulated batch
    * partials ([[graft.ops.Sampling.reservoirMerge]]), with the same
    * `rank` column the batch sampler emits.
    */
  def loadReservoir(spark: SparkSession, partialsPath: String, idCol: String,
                    groupCol: String, n: Int): DataFrame =
    graft.ops.Sampling.reservoirMerge(
      spark.read.parquet(s"$partialsPath/batch*"), idCol, groupCol, n)

  /** Continuous near-dup ingest through a PERSISTED index
    * ([[graft.ops.Dedup.writeNearDupIndex]]): each micro-batch collapses
    * its own near-dup clusters, drops rows near-duplicating the corpus,
    * appends the survivors' index entries (so the NEXT batch sees them),
    * and lands the accepted rows as one parquet increment per batch id —
    * the q86 steady-state ingest, applied continuously.
    *
    * Replay safe end to end: (1) the index append is idempotent per table
    * (anti-join vs existing ids, `appendToNearDupIndex`); (2) pairing
    * runs with `excludeSelfIds = true`, so a batch replayed after a crash
    * between append and checkpoint commit does NOT drop against its own
    * first-run index entries — the recomputed accepted set is identical;
    * (3) the per-batch increment dir is a pure function of the batch id
    * and is deleted before write, so a replay rewrites the same rows
    * instead of duplicating them. Requires ids unique across the stream
    * (the standard ingest contract).
    */
  def nearDupSink(stream: DataFrame, indexName: String, idCol: String,
                  textCol: String, threshold: Double,
                  maxBandFreq: Option[Int], acceptedPath: String,
                  checkpoint: String,
                  clustersPath: Option[String] = None): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        applyNearDupBatch(batch.toDF(), indexName, idCol, textCol,
          threshold, maxBandFreq, acceptedPath, id, clustersPath,
          assumeFresh =
            ingestBatchIsFresh(batch.sparkSession, checkpoint, id))
      }
      .start()

  def applyNearDupBatch(batch: DataFrame, indexName: String, idCol: String,
                        textCol: String, threshold: Double,
                        maxBandFreq: Option[Int], acceptedPath: String,
                        id: Long): Unit =
    applyNearDupBatch(batch, indexName, idCol, textCol, threshold,
      maxBandFreq, acceptedPath, id, clustersPath = None)

  /** One micro-batch's near-dup ingest — separated so the replay contract
    * is directly testable: applying the same batch twice leaves the same
    * accepted increment, the same index, and the same clusters table.
    *
    * `clustersPath`: maintain a persisted `(id, comp)` cluster table —
    * every streamed id labeled with its component under the DISCOVERED
    * edge set (within-batch pairs plus batch-to-indexed-corpus pairs),
    * folded per batch with [[graft.ops.Dedup.updateClusters]] at delta
    * cost and atomically swapped (the scd2Sink rename dance). The fold
    * is bit-identical to a full [[graft.ops.Dedup.connectedComponents]]
    * recompute over every discovered edge (min-label preservation —
    * RandomizedInvariantsSpec), and REPLAY-IDEMPOTENT: a replayed batch
    * recomputes the same pairs (excludeSelfIds keeps its own first-run
    * index entries out of the corpus side) and re-folding already-merged
    * edges into star labels is a no-op. Note the contract is the
    * discovered edges: an edge between two DROPPED documents of
    * different batches is not observed (a dropped doc never enters the
    * index) — its endpoints still label into the corpus components that
    * dropped them.
    */
  def applyNearDupBatch(batch: DataFrame, indexName: String, idCol: String,
                        textCol: String, threshold: Double,
                        maxBandFreq: Option[Int], acceptedPath: String,
                        id: Long, clustersPath: Option[String],
                        assumeFresh: Boolean = false): Unit = {
    val spark = batch.sparkSession
    val idx = graft.ops.Dedup.loadNearDupIndex(spark, indexName)
    refreshIndexTables(spark, idx)
    val (accepted, pairs) = clustersPath match {
      case None =>
        (graft.ops.Dedup.dropNearDuplicatesAgainst(idx, batch,
          idCol, textCol, threshold, maxBandFreq,
          appendAccepted = true, excludeSelfIds = true,
          assumeFresh = assumeFresh), None)
      case Some(_) =>
        val (acc, p) = graft.ops.Dedup.ingestNearDupWithPairs(idx, batch,
          idCol, textCol, threshold, maxBandFreq, excludeSelfIds = true,
          assumeFresh = assumeFresh)
        (acc, Some(p))
    }
    landAcceptedAndClusters(batch, idCol, accepted, pairs, acceptedPath,
      id, clustersPath)
  }

  /** TOKEN-GRAIN streaming near-dup ingest — [[nearDupSink]] through a
    * persisted BPE-piece index ([[graft.ops.Dedup.writeTokenNearDupIndex]]):
    * each micro-batch encodes ONLY itself under the index's STORED merge
    * table (the piece space is pinned at build time — an append under
    * re-learned merges fails loudly inside
    * [[graft.ops.Dedup.appendToTokenNearDupIndex]]), collapses its own
    * piece-n-gram near-dup clusters, drops rows near-duplicating the
    * indexed corpus, and appends the survivors' entries so the next
    * batch sees them. Same landing contract as the word-grain lane:
    * per-batch accepted increments (delete-first replay), optional
    * continuous cluster maintenance via `clustersPath`. This is q209's
    * steady-state ingest made CONTINUOUS — per-batch cost tracks the
    * batch, never the corpus (BenchStress token exponent ~0.01).
    */
  def tokenNearDupSink(stream: DataFrame, indexName: String, idCol: String,
                       textCol: String, threshold: Double,
                       maxBandFreq: Option[Int], acceptedPath: String,
                       checkpoint: String,
                       clustersPath: Option[String] = None): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        applyTokenNearDupBatch(batch.toDF(), indexName, idCol, textCol,
          threshold, maxBandFreq, acceptedPath, id, clustersPath,
          assumeFresh =
            ingestBatchIsFresh(batch.sparkSession, checkpoint, id))
      }
      .start()

  /** One micro-batch's token-grain ingest — same replay contract as
    * [[applyNearDupBatch]] (idempotent index append via anti-join,
    * excludeSelfIds, delete-first increment dirs, no-op cluster
    * re-fold).
    */
  def applyTokenNearDupBatch(batch: DataFrame, indexName: String,
                             idCol: String, textCol: String,
                             threshold: Double, maxBandFreq: Option[Int],
                             acceptedPath: String, id: Long,
                             clustersPath: Option[String],
                             assumeFresh: Boolean = false): Unit = {
    val spark = batch.sparkSession
    val (idx, _) = graft.ops.Dedup.loadTokenNearDupIndex(spark, indexName)
    refreshIndexTables(spark, idx)
    val (accepted, pairs) = clustersPath match {
      case None =>
        (graft.ops.Dedup.dropNearDuplicatesAgainstTokens(spark, indexName,
          batch, idCol, textCol, threshold, maxBandFreq,
          appendAccepted = true, excludeSelfIds = true,
          assumeFresh = assumeFresh), None)
      case Some(_) =>
        val (acc, p) = graft.ops.Dedup.ingestTokenNearDupWithPairs(spark,
          indexName, batch, idCol, textCol, threshold, maxBandFreq,
          excludeSelfIds = true, assumeFresh = assumeFresh)
        (acc, Some(p))
    }
    landAcceptedAndClusters(batch, idCol, accepted, pairs, acceptedPath,
      id, clustersPath)
  }

  /** Streaming BM25 index maintenance: each micro-batch appends into the
    * persisted inverted index through
    * [[graft.ops.Search.appendBm25Index]] — postings and doclens append
    * into the bucketed layout (never a rewrite of existing files), the
    * one-row stats table refreshes by exact recount. The append is
    * AT-LEAST-ONCE idempotent (per-table anti-join on doc ids + staged
    * meta swap), which is exactly the foreachBatch replay contract: a
    * crashed batch is repaired by Spark re-running it. `ingestedPath`
    * lands each batch's doc ids as a delete-first `batch<id>` increment
    * — the lane's observable output (what got indexed, when).
    */
  def bm25IngestSink(stream: DataFrame, indexName: String, idCol: String,
                     textCol: String, ingestedPath: String,
                     checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        applyBm25IngestBatch(batch.toDF(), indexName, idCol, textCol,
          ingestedPath, id,
          assumeFresh =
            ingestBatchIsFresh(batch.sparkSession, checkpoint, id))
      }
      .start()

  /** One micro-batch's BM25 ingest — separated so the replay contract is
    * directly testable (re-applying a batch leaves the index and the
    * increment unchanged).
    */
  def applyBm25IngestBatch(batch: DataFrame, indexName: String,
                           idCol: String, textCol: String,
                           ingestedPath: String, id: Long,
                           assumeFresh: Boolean = false): Unit = {
    val spark = batch.sparkSession
    val idx = graft.ops.Search.loadBm25Index(spark, indexName)
    (Seq(idx.postingsTable, idx.doclensTable, idx.metaTable) ++
      Seq(idx.tombstonesTable).filter(spark.catalog.tableExists))
      .foreach(spark.catalog.refreshTable)
    graft.ops.Search.appendBm25Index(batch, idCol, textCol, idx, assumeFresh)
    val dir = new org.apache.hadoop.fs.Path(s"$ingestedPath/batch$id")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(dir)) { fs.delete(dir, true); () }
    batch.select(col(idCol)).distinct().write.parquet(dir.toString)
  }

  /** Streaming IVF-PQ index maintenance: each micro-batch of
    * `(vec_id, embedding)` rows encodes with the STORED codebook and
    * assigns with the STORED centroids via
    * [[graft.ops.Pq.appendPqIndex]] (appends never retrain — mixed
    * codebooks would corrupt ADC), appending into the cell-partitioned
    * codes layout. Same at-least-once replay contract and delete-first
    * `ingestedPath` increments as [[bm25IngestSink]].
    */
  def pqIngestSink(stream: DataFrame, indexDir: String,
                   ingestedPath: String, checkpoint: String)
      : StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        applyPqIngestBatch(batch.toDF(), indexDir, ingestedPath, id,
          assumeFresh =
            ingestBatchIsFresh(batch.sparkSession, checkpoint, id))
      }
      .start()

  /** One micro-batch's PQ ingest — see [[applyBm25IngestBatch]]. */
  def applyPqIngestBatch(batch: DataFrame, indexDir: String,
                         ingestedPath: String, id: Long,
                         assumeFresh: Boolean = false): Unit = {
    val spark = batch.sparkSession
    graft.ops.Pq.appendPqIndex(spark, indexDir, batch, assumeFresh)
    val dir = new org.apache.hadoop.fs.Path(s"$ingestedPath/batch$id")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(dir)) { fs.delete(dir, true); () }
    batch.select(col("vec_id")).distinct().write.parquet(dir.toString)
  }

  /** Happy-path freshness gate for the ingest lanes' per-batch append
    * probes: a high-water mark file under the CHECKPOINT records the
    * largest batch id that may have (even partially) started an index
    * append. The mark is written BEFORE any append work for a new id,
    * so `id > mark` PROVES this stream never appended any of the
    * batch's rows — with ids unique across the stream (the lanes'
    * stated ingest contract) the per-table ids anti-join probes, whose
    * cost scales with the INDEX rather than the batch, are then safely
    * skipped. Everything suspicious takes the probing path: a replayed
    * id (≤ mark), a missing mark (first batch of a drain — or a
    * checkpoint newly pointed at a populated index), and an unreadable
    * mark (crash mid-write → parse failure → probe, and the stamp
    * self-heals). Disable outright with
    * `spark.graft.stream.ingestHwmEnabled=false` for pipelines that
    * re-stream previously-ingested ids through fresh checkpoints
    * (which violates the uniqueness contract the skip stands on).
    */
  private def ingestBatchIsFresh(spark: SparkSession, checkpoint: String,
                                 id: Long): Boolean = {
    if (spark.conf.get("spark.graft.stream.ingestHwmEnabled", "true")
        != "true") return false
    val p = new org.apache.hadoop.fs.Path(checkpoint, "graft_ingest_hwm")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // missing and unreadable both read as "unknown" = +∞ → probe; the
    // skip only ever rides a mark THIS lane wrote
    val hwm = try {
      if (!fs.exists(p)) Long.MaxValue
      else {
        val in = fs.open(p)
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
        finally in.close()
      }
    } catch { case _: Throwable => Long.MaxValue }
    val fresh = id > hwm
    // stamp BEFORE any append runs (the invariant is "id ≤ mark may
    // have partially appended"): create-overwrite — a crash mid-write
    // leaves a partial file that reads back as unknown, never as a
    // too-low mark
    if (fresh || hwm == Long.MaxValue)
      try {
        val out = fs.create(p, true)
        out.write(id.toString.getBytes("UTF-8"))
        out.close()
      } catch { case _: Throwable => return false }
    fresh
  }

  /** Another session (a prior stream's micro-batch clone, a different
    * driver) may have appended since THIS session last listed the index
    * tables — a stale cached file listing would silently pair against a
    * smaller corpus. Refresh is metadata-cheap next to the pairing join.
    */
  private def refreshIndexTables(spark: SparkSession,
                                 idx: graft.ops.NearDupIndex): Unit =
    (Seq(idx.shinglesTable, idx.bucketsTable) ++
      Seq(idx.tombstonesTable).filter(spark.catalog.tableExists))
      .foreach(spark.catalog.refreshTable)

  /** The shared landing half of the near-dup ingest lanes: per-batch
    * accepted increment (delete-first — replay rewrites, never
    * duplicates) plus the optional cluster-label DELTA landing.
    *
    * The clusters table is INCREMENTAL: per-batch `inc_b<id>` dirs hold
    * only the labels this batch ADDED or CHANGED; a cadence compaction
    * ([[compactClusters]], every [[clustersCompactEvery]] batches) folds
    * them into the `base/` snapshot. Per-batch write I/O therefore
    * tracks the BATCH (plus whatever the batch's merges relabel), never
    * the accumulated streamed-id count — the property that lets a
    * long-lived ingest run for months without each minutely micro-batch
    * rewriting a billions-row snapshot.
    *
    * Correctness rests on MIN-LABEL MONOTONICITY: component labels are
    * member ids with min-preservation under merge
    * ([[graft.ops.Dedup.updateClusters]]), so an id's label only ever
    * DECREASES — the current label of an id is `min(comp)` over every
    * row ever written for it, which is exactly [[loadClusters]]' read
    * collapse. That also makes every landing replay-idempotent: the
    * zero-pair fast path rewrites the batch's self-labels (absorbed by
    * the min), and a replayed merge batch recomputes the same delta
    * against the same standing (its own inc dir is deleted FIRST, so
    * standing is bit-identical to the first run's).
    */
  private def landAcceptedAndClusters(batch: DataFrame, idCol: String,
                                      accepted: DataFrame,
                                      pairs: Option[DataFrame],
                                      acceptedPath: String, id: Long,
                                      clustersPath: Option[String],
                                      clustersCompactEvery: Int = 16)
      : Unit = {
    val spark = batch.sparkSession
    val dir = new org.apache.hadoop.fs.Path(s"$acceptedPath/batch$id")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(dir)) { fs.delete(dir, true); () }
    accepted.write.parquet(dir.toString)
    clustersPath.foreach { cp =>
      val incDir = new org.apache.hadoop.fs.Path(s"$cp/inc_b$id")
      val cfs = incDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // delete-first: a replayed batch recomputes its delta against the
      // same standing state the first run saw
      if (cfs.exists(incDir)) { cfs.delete(incDir, true); () }
      val batchLabels = batch
        .select(col(idCol).cast("long").as("id")).distinct()
        .withColumn("comp", col("id"))
      // a batch with NO discovered edges writes ONLY its own self-labels
      // — O(|batch|) rows with no read of the standing table at all: a
      // standing id's smaller label wins at read time (min collapse),
      // a fresh id IS its own label. The steady-state common case skips
      // both the CC rounds and the snapshot entirely.
      val delta =
        if (pairs.get.isEmpty) batchLabels
        else {
          // BOTH truncates are load-bearing, not just lineage hygiene:
          // the standing∪batch union carries an alias-equality
          // constraint (comp = id on the batch side) that crashes
          // Catalyst's Union constraint rewrite inside the CC fold
          // (`key not found: src#...`), and the delta join's inferred
          // constraints pushed into the fold's unions trip the same
          // bug — truncation makes each a constraint-free leaf. The old
          // layout WROTE the whole updated frame per batch, so the
          // materializations cost no more than before.
          val labels = graft.core.Checkpoints.truncate(
            loadClusters(spark, cp).unionByName(batchLabels))
          val updated = graft.core.Checkpoints.truncate(
            graft.ops.Dedup.updateClusters(labels, pairs.get))
          // only rows this fold ADDED or RELABELED — labels decrease
          // monotonically, so "changed" is exactly "comp < standing's".
          // The previous labels come from an INDEPENDENT re-read (fresh
          // plan, own attribute ids): `updated` already carries
          // `standing`'s lineage through the CC fold, and joining a
          // frame against its own ancestor trips analysis
          val prev = loadClusters(spark, cp)
            .withColumnRenamed("comp", "comp_prev")
          updated.join(prev, Seq("id"), "left")
            .where(col("comp_prev").isNull ||
              col("comp") =!= col("comp_prev"))
            .select("id", "comp")
        }
      delta.write.parquet(incDir.toString)
      // deterministic in the batch id — a replayed compact tick re-folds
      // already-folded rows, a no-op under the min collapse
      if (clustersCompactEvery > 0 && id > 0 &&
          id % clustersCompactEvery == 0)
        compactClusters(spark, cp)
    }
  }

  /** Visible read of a streaming clusters table: `base/` snapshot plus
    * every `inc_b*` delta, collapsed to the CURRENT label per id —
    * `min(comp)`, exact because labels only ever decrease (min-label
    * preservation under merge). This is the ONLY correct way to read a
    * `clustersPath` table; a plain directory read misses the inc dirs
    * (Spark only recurses into key=value partition dirs) and would
    * return stale labels.
    */
  def loadClusters(spark: SparkSession, clustersPath: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(clustersPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val base = new org.apache.hadoop.fs.Path(root, "base")
    val old = new org.apache.hadoop.fs.Path(root, ".base_old")
    // crash between compaction's move-aside and swap leaves the only
    // snapshot copy at `old` — heal forward before listing
    if (fs.exists(root) && !fs.exists(base) && fs.exists(old))
      require(fs.rename(old, base),
        s"could not restore $clustersPath/base from $old")
    val incs =
      if (!fs.exists(root)) Array.empty[String]
      else fs.listStatus(root).collect {
        case s if s.isDirectory && s.getPath.getName.startsWith("inc_b") =>
          s.getPath.toString
      }
    val parts = (if (fs.exists(base)) Seq(base.toString) else Nil) ++ incs
    if (parts.isEmpty)
      spark.range(0).select(col("id"), col("id").as("comp"))
    else spark.read.parquet(parts: _*)
      .groupBy("id").agg(min("comp").as("comp"))
  }

  /** Fold every `inc_b*` delta into the `base/` snapshot and drop the
    * deltas — the cadence maintenance that bounds the inc-dir count.
    * Atomic via the write-tmp → move-aside → swap dance; inc dirs are
    * deleted only AFTER the swap, so every crash window leaves a state
    * [[loadClusters]] reads correctly (leftover deltas are redundant
    * with the new base — absorbed by the min collapse; a missing base
    * with `.base_old` present heals forward on the next read).
    */
  def compactClusters(spark: SparkSession, clustersPath: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(clustersPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    val base = new org.apache.hadoop.fs.Path(root, "base")
    val tmp = new org.apache.hadoop.fs.Path(root, ".base_tmp")
    val old = new org.apache.hadoop.fs.Path(root, ".base_old")
    fs.delete(tmp, true)
    loadClusters(spark, clustersPath).write.parquet(tmp.toString)
    fs.delete(old, true)
    if (fs.exists(base))
      require(fs.rename(base, old), s"could not move $base aside")
    if (!fs.rename(tmp, base)) {
      if (fs.exists(old)) fs.rename(old, base)
      sys.error(s"could not swap clusters base at $clustersPath; restored")
    }
    fs.delete(old, true)
    fs.listStatus(root).foreach { s =>
      if (s.isDirectory && s.getPath.getName.startsWith("inc_b"))
        fs.delete(s.getPath, true)
    }
  }

  /** CDC-apply sink: maintain an SCD2 dimension at `dimPath` under a
    * stream of snapshot batches — each micro-batch is merged with
    * [[graft.ops.Scd.scd2Merge]] and the dimension atomically swapped
    * (write-tmp → rename, the [[graft.core.io.Maintenance]] dance; the
    * merged plan reads the old dim lazily, so overwriting in place would
    * corrupt it mid-read).
    *
    * Replay safe WITHOUT per-batch bookkeeping: re-applying the same
    * snapshot with the same date is a no-op by the merge's own semantics
    * (tracked values now equal → every row "unchanged"), so a micro-batch
    * re-run after a crash between swap and checkpoint-commit converges to
    * the identical dimension. Requires each batch be unique per key —
    * CDC upstreams that emit multiple updates per key per batch must
    * pre-compact (keep-latest) upstream.
    *
    * `dateOf` maps the batch id to the snapshot date (deterministic —
    * wall-clock here would break replay idempotency).
    */
  def scd2Sink(stream: DataFrame, dimPath: String, keys: Seq[String],
               tracked: Seq[String], checkpoint: String,
               dateOf: Long => String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        applyScd2Batch(batch.toDF(), dimPath, keys, tracked, dateOf(id)): Unit
      }
      .start()

  /** One micro-batch's SCD2 apply — separated so the replay contract is
    * directly testable: applying the same batch twice leaves the same
    * dimension.
    */
  def applyScd2Batch(batch: DataFrame, dimPath: String, keys: Seq[String],
                     tracked: Seq[String], snapshotDate: String): Unit = {
    val spark = batch.sparkSession
    val path = new org.apache.hadoop.fs.Path(dimPath)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(path.getParent,
      s".${path.getName}_scd2_tmp")
    val old = new org.apache.hadoop.fs.Path(path.getParent,
      s".${path.getName}_scd2_old")
    // Crash recovery: a prior apply can die between moving the live
    // dimension aside and swapping the new one in, leaving the ONLY copy
    // at the hidden `old` path — restore it before deciding bootstrap vs
    // merge, and treat `old` as garbage only when `path` itself exists.
    if (!fs.exists(path) && fs.exists(old))
      require(fs.rename(old, path), s"could not restore $dimPath from $old")
    val snapshot = batch.select((keys ++ tracked).map(col): _*)
    val merged =
      if (fs.exists(path))
        graft.ops.Scd.scd2Merge(spark.read.parquet(dimPath), snapshot,
          keys, tracked, snapshotDate)
      else // first batch bootstraps the dimension: every key inserts
        snapshot.withColumn("valid_from", lit(snapshotDate))
          .withColumn("valid_to", lit(null).cast("string"))
    fs.delete(tmp, true); fs.delete(old, true)
    merged.write.parquet(tmp.toString)
    if (fs.exists(path))
      require(fs.rename(path, old), s"could not move $dimPath aside")
    if (!fs.rename(tmp, path)) {
      if (fs.exists(old)) fs.rename(old, path) // restore; dim intact
      sys.error(s"could not swap SCD2 dimension into $dimPath; original restored")
    }
    fs.delete(old, true); ()
  }
}

/** Gap-based sessionization with explicit state — the canonical
  * `flatMapGroupsWithState` pattern: one state entry per key, emitted and
  * cleared when the gap elapses (processing-time timeout keeps the example
  * test-drivable; event-time gap logic is in `fold`).
  *
  * Skew scope note: within one micro-batch, a key's events are drained
  * and sorted on one task (`fold` needs event order) — state across
  * batches stays one summary per key, but a single key emitting tens of
  * millions of events in ONE batch is a straggler/OOM risk. That is a
  * data-quality signal (bot/default-id traffic), so the drain is BOUNDED
  * (`maxBatchEventsPerKey`): past the bound the query fails loudly with
  * the key named, instead of OOMing an executor — bound the trigger
  * (`maxFilesPerTrigger`/`maxOffsetsPerTrigger`) or filter the key
  * upstream; the watermarked `windowedAgg`/`dedupStream` operators are
  * the right tool when per-event ordering is not needed.
  */
object Sessionize {

  /** Default per-key per-micro-batch event bound (~a few hundred MB of
    * buffered Event objects — survivable once, named loudly instead of a
    * silent OOM).
    */
  val DefaultMaxBatchEventsPerKey: Int = 5000000

  private def boundedDrain[T](uid: Long, it: Iterator[T],
                              max: Int): collection.Seq[T] = {
    val buf = collection.mutable.ArrayBuffer.empty[T]
    it.foreach { e =>
      require(buf.size < max,
        s"sessionize: key $uid has >= $max events in one micro-batch — a " +
          "degenerate hot key (bot/default-id traffic) would OOM the " +
          "executor; bound the trigger (maxFilesPerTrigger/" +
          "maxOffsetsPerTrigger) or filter the key upstream")
      buf += e
    }
    // no defensive copy: this buffer is at the exact memory-pressure
    // point the bound protects — fold only reads it
    buf
  }

  final case class Event(user_id: Long, ts_ms: Long, value: Double)
  final case class SessionState(start: Long, end: Long, n: Long, sum: Double)
  final case class Session(user_id: Long, start_ms: Long, end_ms: Long,
                           n_events: Long, sum_value: Double)

  /** Pure state fold: feed sorted events; emit a session whenever the gap
    * between consecutive events exceeds `gapMs`.
    */
  def fold(state: Option[SessionState], events: collection.Seq[Event],
           gapMs: Long):
      (Option[SessionState], Seq[(SessionState, Long)]) = {
    var cur = state
    val out = collection.mutable.ArrayBuffer.empty[(SessionState, Long)]
    events.sortBy(_.ts_ms).foreach { e =>
      cur match {
        case Some(s) if e.ts_ms - s.end > gapMs =>
          out += ((s, e.user_id))
          cur = Some(SessionState(e.ts_ms, e.ts_ms, 1, e.value))
        case Some(s) =>
          cur = Some(SessionState(s.start, math.max(s.end, e.ts_ms), s.n + 1, s.sum + e.value))
        case None =>
          cur = Some(SessionState(e.ts_ms, e.ts_ms, 1, e.value))
      }
    }
    (cur, out.toSeq)
  }

  final case class TimedEvent(user_id: Long, ts_ms: Long, value: Double,
                              ts: java.sql.Timestamp)

  /** Event-time sessionization: idle keys flush when the WATERMARK passes
    * session end + gap — no wall-clock dependence, so replays and
    * backfills produce identical sessions (the production-correct shape;
    * the processing-time variant below stays for wall-clock-driven
    * flushing). Spark runs a no-data micro-batch when the watermark
    * advances, so the flush needs no new same-key data.
    */
  def sessionsEventTime(events: Dataset[Event], gapMs: Long,
                        watermarkDelay: String,
                        maxBatchEventsPerKey: Int = DefaultMaxBatchEventsPerKey):
      Dataset[Session] = {
    import events.sparkSession.implicits._
    val timed = events
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .withWatermark("ts", watermarkDelay)
      .as[TimedEvent]
    timed.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, it, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(uid, s.start, s.end, s.n, s.sum))
          } else {
            val (next, closed) = fold(state.getOption,
              boundedDrain(uid, it.map(t => Event(t.user_id, t.ts_ms, t.value)),
                maxBatchEventsPerKey), gapMs)
            next.foreach { s =>
              state.update(s)
              // flush when the watermark passes end+gap; a timeout in the
              // watermark's past is illegal, so clamp just beyond it
              state.setTimeoutTimestamp(
                math.max(s.end + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            closed.iterator.map { case (s, u) =>
              Session(u, s.start, s.end, s.n, s.sum)
            }
          }
      }
  }

  /** Sessions close when a later event arrives past the gap. With
    * `idleTimeout=true` (production default) a processing-time timeout
    * also flushes sessions whose key goes silent — note that
    * processing-time timeouts only fire when a micro-batch runs, so a
    * completely quiet stream needs a processing-time trigger interval on
    * the query for idle sessions to flush. Tests use `false` so
    * micro-batches stay purely data-driven.
    */
  def sessions(events: Dataset[Event], gapMs: Long,
               idleTimeout: Boolean = true,
               maxBatchEventsPerKey: Int = DefaultMaxBatchEventsPerKey):
      Dataset[Session] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (idleTimeout) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, timeoutConf) {
        case (uid, it, state: GroupState[SessionState]) =>
          if (idleTimeout && state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(uid, s.start, s.end, s.n, s.sum))
          } else {
            val (next, closed) = fold(state.getOption,
              boundedDrain(uid, it, maxBatchEventsPerKey), gapMs)
            next.foreach { s =>
              state.update(s)
              if (idleTimeout) state.setTimeoutDuration(gapMs)
            }
            closed.iterator.map { case (s, u) => Session(u, s.start, s.end, s.n, s.sum) }
          }
      }
  }
}

/** Streaming multi-touch attribution — [[graft.ops.Events.attribution]]'s
  * event-time lane, held to the SAME semantics (q143's oracle gates the
  * composed pipeline as q183): per user, buffered touches credit the
  * EARLIEST conversion at-or-after them in `(ts, id)` order once the
  * WATERMARK passes the conversion's timestamp — at that point no
  * earlier touch and no earlier conversion can still arrive, so each
  * conversion's credit split (first/last/linear, exact integer
  * micro-credits, remainder on the first touch) is final the moment it
  * emits and a replay/backfill produces identical credits.
  *
  * State per user is the un-finalized event suffix: everything before
  * the first pending (post-watermark) conversion is consumed on
  * finalization, and orphan touches GC once `ts + lookback` falls
  * behind the watermark (no future conversion can reach them — their
  * batch fate, dropped-with-no-credit, is already decided). An
  * event-time timeout re-fires the fold when the watermark advances
  * with no new same-key data ([[Sessionize.sessionsEventTime]]'s
  * no-data-batch contract), so quiet users still flush.
  *
  * Emits one [[AttributionStream.Credit]] row per credited touch;
  * aggregate downstream (`groupBy(channel)`, stack) for the q143
  * report shape.
  */
object AttributionStream {

  final case class AttrEvent(user_id: Long, us: Long, event_id: Long,
                             event_type: String, ts: java.sql.Timestamp)
  final case class AttrState(events: List[(Long, Long, String)])
  final case class Credit(user_id: Long, conv_us: Long, conv_id: Long,
                          channel: String, first_micro: Long,
                          last_micro: Long, linear_micro: Long)

  def credits(events: DataFrame, userCol: String, tsCol: String,
              idCol: String, typeCol: String,
              conversionType: String = "purchase",
              touchTypes: Seq[String] = Seq("view", "click"),
              lookbackSeconds: Long = 7200L,
              watermarkDelay: String = "1 hour",
              maxBatchEventsPerKey: Int =
                Sessionize.DefaultMaxBatchEventsPerKey): Dataset[Credit] = {
    require(touchTypes.nonEmpty, "touchTypes must be non-empty")
    require(!touchTypes.contains(conversionType),
      s"conversion type $conversionType cannot also be a touch type")
    val spark = events.sparkSession
    import spark.implicits._
    val typeSet = (conversionType +: touchTypes).toSet
    val lookbackUs = lookbackSeconds * 1000000L
    // NO pre-state type filter: a Column filter between source and the
    // watermark would be PUSHED BELOW the EventTimeWatermark node by
    // Catalyst, so untracked rows (a far-future sentinel, unrelated
    // event types) would stop advancing event time and the final
    // lookback-window of real conversions would never flush (caught
    // live by the sf0.1 gate — three last-hour conversions missing).
    // Untracked types are skipped at DRAIN time instead: they advance
    // the watermark, hold no state, and emit nothing — the batch op's
    // semantics exactly.
    val timed = events.select(
        col(userCol).cast("long").as("user_id"),
        unix_micros(col(tsCol).cast("timestamp")).as("us"),
        col(idCol).cast("long").as("event_id"),
        col(typeCol).as("event_type"),
        col(tsCol).cast("timestamp").as("ts"))
      .withWatermark("ts", watermarkDelay)
      .as[AttrEvent]
    timed.groupByKey(_.user_id)
      .flatMapGroupsWithState[AttrState, Credit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, it, state: GroupState[AttrState]) =>
          val wmMs = state.getCurrentWatermarkMs()
          val wmUs = wmMs * 1000L
          val drained = collection.mutable.ArrayBuffer.empty[(Long, Long, String)]
          if (!state.hasTimedOut) it.foreach { e =>
            require(drained.size < maxBatchEventsPerKey,
              s"attribution: key $uid has >= $maxBatchEventsPerKey events " +
                "in one micro-batch — bound the trigger or filter the key " +
                "upstream (the Sessionize hot-key contract)")
            if (typeSet.contains(e.event_type))
              drained += ((e.us, e.event_id, e.event_type))
          }
          val buf = (state.getOption.map(_.events).getOrElse(Nil) ++ drained)
            .sortBy(t => (t._1, t._2))
          val out = collection.mutable.ArrayBuffer.empty[Credit]
          val pending = collection.mutable.ArrayBuffer.empty[(Long, Long, String)]
          var rest = collection.mutable.ArrayBuffer.empty[(Long, Long, String)]
          var halted = false
          buf.foreach { e =>
            if (halted) rest += e
            else if (e._3 == conversionType) {
              if (e._1 < wmUs) {
                val inw = pending.filter(t => e._1 - t._1 <= lookbackUs)
                val n = inw.size
                if (n > 0) {
                  val per = 1000000L / n
                  val rem = 1000000L % n
                  inw.zipWithIndex.foreach { case (t, k) =>
                    out += Credit(uid, e._1, e._2, t._3,
                      if (k == 0) 1000000L else 0L,
                      if (k == n - 1) 1000000L else 0L,
                      per + (if (k == 0) rem else 0L))
                  }
                }
                pending.clear()
              } else {
                halted = true
                rest ++= pending
                rest += e
                pending.clear()
              }
            } else pending += e
          }
          val keep = (rest ++ pending.filter(t => t._1 + lookbackUs >= wmUs))
            .toList
          if (keep.isEmpty) { if (state.exists) state.remove() }
          else {
            state.update(AttrState(keep))
            // wake when the watermark can finalize the next pending
            // conversion, or GC the oldest orphan touch
            val nextConvMs = keep.find(_._3 == conversionType)
              .map(_._1 / 1000L + 1L)
            val gcMs = keep.headOption
              .map(_._1 / 1000L + lookbackSeconds * 1000L + 1L)
            val cand = nextConvMs.orElse(gcMs).getOrElse(wmMs + 1L)
            state.setTimeoutTimestamp(math.max(cand, wmMs + 1L))
          }
          out.iterator
      }
  }
}

/** Streaming ordered-step funnel — [[graft.ops.Events.funnel]]'s
  * event-time lane (q115's semantics, gated as q187): per user the
  * chained-minima rule is a tiny state machine — an event advances the
  * funnel iff its type is the NEXT step in `(ts, id)` order — and the
  * advance decision for an event is final once the WATERMARK passes its
  * timestamp (no earlier event can still arrive). A skipped-ahead event
  * (step k seen while the user sits below k-1) is discarded, exactly as
  * the batch running-min never counts it: any later completion of k-1
  * has a larger timestamp, which that event can no longer satisfy.
  *
  * State per user: the completed-step counter plus only the
  * not-yet-final event suffix (ts >= watermark) — completed and
  * discarded events hold no state, so a user's footprint is O(pending
  * events in the watermark window), not O(history). Emits one
  * [[FunnelStream.StepCompletion]] per advance; counting distinct users
  * per step downstream reproduces the batch funnel report (a user who
  * reached step k emitted every step 1..k once).
  *
  * RETENTION: exact batch equivalence requires remembering every user
  * who advanced at least one step FOREVER — a later step can always
  * arrive, so by default the state store grows with the distinct
  * advanced-user count (a few counters per user, but monotone). At the
  * 100 TB / billions-of-users scale that is the wrong default trade, so
  * `inactivityTtlSeconds` bounds it: a user whose funnel has no pending
  * events and no tracked activity for the TTL is evicted, and a
  * TTL-late step restarts that user's funnel from step 1 (it may
  * re-emit early steps — downstream `count_distinct(user_id)` per step
  * absorbs the duplicate; a strict-exactness consumer leaves the TTL
  * unset). Pick the TTL like a watermark: longer than any plausible
  * funnel dwell time.
  *
  * CHECKPOINT COMPATIBILITY: [[FunnelStream.FunnelState]] gained a
  * `lastUs` field when the TTL landed (round 9). flatMapGroupsWithState
  * state is encoder-schema-bound, so a query restarted from a
  * checkpoint written BEFORE that change will fail to decode its state
  * — this is a deliberate one-time break, not silent misdecoding (the
  * extra Long shifts the UnsafeRow layout and Spark's state-store
  * schema check rejects it at restart). Migration: drain the old query
  * to a quiet point (watermark past all pending funnels), then restart
  * with a FRESH checkpoint dir; in-flight funnels below the watermark
  * re-emit nothing, and downstream per-step `count_distinct` absorbs
  * any tail overlap. Future state evolutions must follow the same
  * drain-and-restart protocol (Spark's state schema evolution does not
  * cover case-class field additions on this API).
  */
object FunnelStream {

  final case class FunnelEvent(user_id: Long, us: Long, event_id: Long,
                               event_type: String, ts: java.sql.Timestamp)
  final case class FunnelState(completed: Int,
                               pending: List[(Long, Long, String)],
                               lastUs: Long = 0L)
  final case class StepCompletion(user_id: Long, step_idx: Int,
                                  step: String, us: Long)

  def completions(events: DataFrame, userCol: String, tsCol: String,
                  idCol: String, typeCol: String, steps: Seq[String],
                  watermarkDelay: String = "1 hour",
                  maxBatchEventsPerKey: Int =
                    Sessionize.DefaultMaxBatchEventsPerKey,
                  inactivityTtlSeconds: Option[Long] = None):
      Dataset[StepCompletion] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, "duplicate funnel steps")
    inactivityTtlSeconds.foreach(t =>
      require(t > 0, s"inactivityTtlSeconds must be > 0: $t"))
    val ttlUs = inactivityTtlSeconds.map(_ * 1000000L)
    val spark = events.sparkSession
    import spark.implicits._
    val stepArr = steps.toArray
    val stepSet = steps.toSet
    // no pre-state type filter — see AttributionStream.credits: Catalyst
    // would push it below the watermark node and untracked rows would
    // stop advancing event time; non-step types are skipped at drain
    val timed = events.select(
        col(userCol).cast("long").as("user_id"),
        unix_micros(col(tsCol).cast("timestamp")).as("us"),
        col(idCol).cast("long").as("event_id"),
        col(typeCol).as("event_type"),
        col(tsCol).cast("timestamp").as("ts"))
      .withWatermark("ts", watermarkDelay)
      .as[FunnelEvent]
    timed.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, StepCompletion](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, it, state: GroupState[FunnelState]) =>
          val wmMs = state.getCurrentWatermarkMs()
          val wmUs = wmMs * 1000L
          val prior = state.getOption.getOrElse(FunnelState(0, Nil))
          val drained = collection.mutable.ArrayBuffer.empty[(Long, Long, String)]
          if (!state.hasTimedOut) it.foreach { e =>
            require(drained.size < maxBatchEventsPerKey,
              s"funnel: key $uid has >= $maxBatchEventsPerKey events in " +
                "one micro-batch — bound the trigger or filter the key " +
                "upstream (the Sessionize hot-key contract)")
            if (stepSet.contains(e.event_type))
              drained += ((e.us, e.event_id, e.event_type))
          }
          val buf = (prior.pending ++ drained).sortBy(t => (t._1, t._2))
          var completed = prior.completed
          val out = collection.mutable.ArrayBuffer.empty[StepCompletion]
          val keep = collection.mutable.ListBuffer.empty[(Long, Long, String)]
          buf.foreach { e =>
            if (e._1 >= wmUs) keep += e
            else if (completed < stepArr.length &&
                e._3 == stepArr(completed)) {
              completed += 1
              out += StepCompletion(uid, completed, stepArr(completed - 1),
                e._1)
            } // else: final non-advancing event — discard
          }
          val lastUs = (prior.lastUs +: drained.map(_._1).toList).max
          val next = FunnelState(completed, keep.toList, lastUs)
          // evict: nothing to remember, or (TTL mode) a quiescent funnel
          // whose tracked activity aged past the inactivity horizon — the
          // documented exactness-for-bounded-state trade
          val ttlExpired = next.pending.isEmpty &&
            ttlUs.exists(t => wmUs >= next.lastUs + t)
          if ((next.pending.isEmpty && next.completed == 0) || ttlExpired) {
            if (state.exists) state.remove()
          } else {
            state.update(next)
            // wake to finalize the next pending event, or (TTL mode, no
            // pending) to expire the quiescent funnel
            val pendWake = next.pending.headOption.map(_._1 / 1000L + 1L)
            val ttlWake =
              if (next.pending.isEmpty)
                ttlUs.map(t => (next.lastUs + t) / 1000L + 1L)
              else None
            pendWake.orElse(ttlWake).foreach { w =>
              state.setTimeoutTimestamp(math.max(w, wmMs + 1L))
            }
          }
          out.iterator
      }
  }
}

/** Kafka-sink payload semantics (reference yaetos/kafka_utils.py:14-73):
  * one JSON document per record with required-field validation before
  * send. The actual transport rides the spark-sql-kafka connector WHEN
  * its jar is on the classpath ([[push]] probes for it) — in this
  * zero-egress image it is absent, so `push` degrades to building and
  * validating the exact (key, value) frame `.format("kafka")` consumes,
  * reporting `sent = false`.
  */
object KafkaSink {

  /** Whether the spark-sql-kafka connector is loadable. Probed by CLASS
    * (not by format-name resolution) so the check is cheap and
    * side-effect-free — through the CONTEXT classloader, because jars
    * supplied via `--jars`/`--packages` live in Spark's mutable
    * classloader, not the application loader that defined this class
    * (a bare `Class.forName` would miss them and silently skip the
    * send). `initialize = false` plus the LinkageError catch keep a
    * half-present connector (jar without its kafka-clients dependency)
    * reporting unavailable instead of crashing the probe.
    */
  def transportAvailable: Boolean = transportAvailableFor("kafka")

  /** Per-format transport probe. The default `"kafka"` format resolves
    * to the connector class probe above; any other format (a stand-in
    * provider in tests, an alternative producer in a custom deploy) is
    * probed by loading it as a class through the same context
    * classloader — `CreatableRelationProvider` implementations are
    * addressed by fully-qualified class name, so a loadable class IS an
    * available transport for `.write.format(name)`.
    */
  def transportAvailableFor(format: String): Boolean = {
    val probeClass =
      if (format == "kafka") "org.apache.spark.sql.kafka010.KafkaSourceProvider"
      else format
    val loader = Option(Thread.currentThread().getContextClassLoader)
      .getOrElse(getClass.getClassLoader)
    try {
      Class.forName(probeClass, false, loader)
      true
    } catch {
      case _: ClassNotFoundException => false
      case _: LinkageError => false
    }
  }

  /** Outcome of a [[push]]: whether the transport ran, the (key, value)
    * frame that was (or would have been) produced, and the rows dropped
    * by required-field validation — the caller decides whether a
    * non-empty `invalid` is an error (the reference logs and drops).
    */
  final case class PushResult(sent: Boolean, payload: DataFrame, invalid: DataFrame)

  /** Validate, serialize, and produce `df` to a Kafka topic. With the
    * connector jar present this is a real batch produce via
    * `.write.format("kafka")`; without it (this image) the validated
    * payload is still built — same plan, same validation errors — and
    * `sent = false` is returned with a loud stderr note, so pipelines
    * are testable end-to-end up to the network boundary.
    *
    * `format` is the produce seam: it defaults to the real connector
    * (`"kafka"`) but accepts any `CreatableRelationProvider` class name,
    * which receives the identical frame + options through the identical
    * `.write.format(...)` plumbing — StreamsSpec drives the FULL send
    * branch through a recording stand-in provider, so the only code this
    * image cannot execute is the connector jar itself (covered by the
    * connector's own contract).
    */
  def push(df: DataFrame, bootstrapServers: String, topic: String,
           required: Seq[String] = Nil, keyCol: Option[String] = None,
           format: String = "kafka"): PushResult = {
    val (valid, invalid) =
      if (required.nonEmpty) validateRequired(df, required)
      else (df, df.limit(0))
    val frame = payload(valid, keyCol)
    if (transportAvailableFor(format)) {
      frame.write.format(format)
        .option("kafka.bootstrap.servers", bootstrapServers)
        .option("topic", topic)
        .save()
      PushResult(sent = true, payload = frame, invalid = invalid)
    } else {
      System.err.println(s"[graft] KafkaSink.push: transport '$format' " +
        s"not on the classpath; payload for topic '$topic' validated and " +
        "built but NOT sent")
      PushResult(sent = false, payload = frame, invalid = invalid)
    }
  }

  /** (key, value) frame: value = to_json(struct(*)), key optional. */
  def payload(df: DataFrame, keyCol: Option[String] = None): DataFrame = {
    val value = to_json(struct(df.columns.map(col): _*)).as("value")
    keyCol match {
      case Some(k) => df.select(col(k).cast("string").as("key"), value)
      case None => df.select(value)
    }
  }

  /** Split records by required-field presence (the reference's JSON-schema
    * check, as a distributed filter): returns (valid, invalid).
    */
  def validateRequired(df: DataFrame, required: Seq[String]): (DataFrame, DataFrame) = {
    val missing = required.filterNot(df.columns.contains)
    require(missing.isEmpty, s"schema missing required fields: $missing")
    val ok = required.map(col(_).isNotNull).reduce(_ && _)
    (df.filter(ok), df.filter(!ok))
  }
}
