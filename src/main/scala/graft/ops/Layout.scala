package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators for scan efficiency at rest: multi-dimensional
  * (Z-order) clustering of parquet output.
  *
  * At 100 TB the cheapest query is the one that never reads the bytes:
  * parquet row-group and file pruning works off per-file min/max column
  * stats, and min/max stats are only selective when the writer clustered
  * the data. A single-column sort clusters one predicate dimension;
  * interleaving the bits of several columns (the Morton / Z-order curve)
  * keeps EVERY interleaved dimension locally clustered, so filters on any
  * of them prune files.
  */
object Layout {

  /** Run `f` with parquet timestamps written as INT64 micros, restoring
    * the session's previous setting after. The clustered layouts this
    * object writes exist to be PRUNED — and legacy INT96 timestamps
    * carry no usable min/max statistics, which would blind both
    * parquet's own row-group pushdown and the Skipping footer profiler
    * on every timestamp-clustered layout. Scoped per-write (not
    * session-wide) because adjusted-to-UTC INT64 reads back tz-aware in
    * pandas/arrow, which general job outputs must not impose on
    * downstream consumers.
    *
    * There is no per-DataFrameWriter option for this conf — the flip is
    * necessarily on the session's shared SQLConf — so the set/restore
    * window is serialized against OTHER LAYOUT WRITES on the same
    * session (they queue behind the session monitor; distinct sessions,
    * own SQLConf each, proceed in parallel). Plain writes elsewhere do
    * NOT take this lock: a non-layout write racing on the same session
    * can still observe the flipped conf inside the window. Callers that
    * mix layout and plain writes concurrently should give each thread
    * its own `spark.newSession()` (own SQLConf, shared catalog/state).
    */
  private def withMicrosTimestamps[T](df: DataFrame)(f: => T): T =
    df.sparkSession.synchronized {
      val key = "spark.sql.parquet.outputTimestampType"
      val conf = df.sparkSession.conf
      val prev = conf.getOption(key)
      conf.set(key, "TIMESTAMP_MICROS")
      try f
      finally prev match {
        case Some(v) => conf.set(key, v)
        case None => conf.unset(key)
      }
    }

  /** Morton (Z-order) value: interleave the low `bits` bits of each
    * column — bit `i` of dimension `d` lands at position `i·ndims + d`.
    * Columns are masked to `bits` (callers should range-bucket raw values
    * first — e.g. `pmod`, division, or a rank — so truncation is a
    * deliberate bucketing, not silent). Pure codegen'd integer math.
    */
  def zValue(cols: Seq[Column], bits: Int = 16): Column = {
    require(cols.size >= 2, s"zValue needs >= 2 dimensions, got ${cols.size}")
    require(bits >= 1 && bits * cols.size <= 62,
      s"bits·dims must fit a long: got $bits × ${cols.size}")
    val ndims = cols.size
    val terms = for {
      (c, d) <- cols.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)),
      i * ndims + d)
    terms.reduce(_ bitwiseOR _)
  }

  /** Write `df` as parquet clustered on the Z-curve of `dims`:
    * range-repartition on the z-value (contiguous curve segments per
    * file — range, not hash, is what makes per-file min/max tight), sort
    * within partitions, drop the helper column, write.
    *
    * `numFiles` targets the file count; size it at
    * `expected_bytes / ~1 GB`. The range exchange samples the z
    * distribution, so skewed dimensions still yield balanced files.
    */
  /** `statsManifest`: emit a [[graft.core.io.Skipping]] stats manifest
    * for `statsCols` (typically the clustered dimensions' source
    * columns) beside the data as part of the write — footer-derived, so
    * the emission costs one metadata read per written file, not a
    * second corpus scan. This makes the write-then-prune cycle
    * self-maintaining: every rewrite refreshes the manifest the
    * planning-time skip reads.
    */
  /** `bloomCols`/`bloomNdv`: write parquet BLOOM FILTERS for the named
    * columns (per-file footer structures, the point-lookup complement
    * of min/max clustering — consumed by
    * [[graft.core.io.Skipping.pruneFiles]]'s `footerBlooms` stage for
    * IN-probes on columns the layout does NOT cluster). `bloomNdv`
    * sizes each filter to the expected per-file distinct count; parquet
    * caps the bytes at its `parquet.bloom.filter.max.bytes` (1 MB).
    */
  def zorderWrite(df: DataFrame, dims: Seq[Column], outPath: String,
                  numFiles: Int, bits: Int = 16,
                  mode: String = "overwrite",
                  statsManifest: Option[String] = None,
                  statsCols: Seq[String] = Nil,
                  bloomCols: Seq[String] = Nil,
                  bloomNdv: Long = 100000L): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    require(statsManifest.isEmpty || statsCols.nonEmpty,
      "statsManifest needs statsCols: the z-value dims are derived " +
        "expressions; name the source columns to profile")
    withMicrosTimestamps(df) {
      var w = df.withColumn("_z", zValue(dims, bits))
        .repartitionByRange(numFiles, col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
      bloomCols.foreach { c =>
        w = w.option(s"parquet.bloom.filter.enabled#$c", "true")
          .option(s"parquet.bloom.filter.expected.ndv#$c", bloomNdv.toString)
      }
      w.parquet(outPath)
    }
    statsManifest.foreach(mf => graft.core.io.Skipping
      .emitManifest(df.sparkSession, outPath, statsCols, mf): Unit)
  }

  /** Write `df` clustered on ONE sort dimension: range-repartition (the
    * sampled range exchange keeps files balanced under skew) + sort
    * within partitions. The single-dimension complement of
    * [[zorderWrite]]: when queries filter on one column — an event date,
    * a tenant id — a plain range-cluster beats the Z-curve (no bit
    * budget split across dimensions), and per-file min/max stats become
    * disjoint, so a point/range predicate prunes all but ~one file.
    */
  /** `tiebreak`: extra sort (and range-key) columns pinning the order of
    * equal-`sortCol` rows — without one, tie order is shuffle arrival
    * order and reruns are not byte-identical.
    */
  /** `statsManifest`/`statsCols`: see [[zorderWrite]] — footer-derived
    * write-time manifest emission.
    */
  /** `bloomCols`/`bloomNdv`: see [[zorderWrite]] — footer bloom filters
    * for point-lookup pruning on the columns this sort does NOT cluster.
    */
  def rangeSortedWrite(df: DataFrame, sortCol: Column, outPath: String,
                       numFiles: Int, mode: String = "overwrite",
                       tiebreak: Seq[Column] = Nil,
                       statsManifest: Option[String] = None,
                       statsCols: Seq[String] = Nil,
                       bloomCols: Seq[String] = Nil,
                       bloomNdv: Long = 100000L): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    require(statsManifest.isEmpty || statsCols.nonEmpty,
      "statsManifest needs statsCols: name the columns to profile")
    val keys = col("_r") +: tiebreak
    withMicrosTimestamps(df) {
      var w = df.withColumn("_r", sortCol)
        .repartitionByRange(numFiles, keys: _*)
        .sortWithinPartitions(keys: _*)
        .drop("_r")
        .write.mode(mode)
      bloomCols.foreach { c =>
        w = w.option(s"parquet.bloom.filter.enabled#$c", "true")
          .option(s"parquet.bloom.filter.expected.ndv#$c", bloomNdv.toString)
      }
      w.parquet(outPath)
    }
    statsManifest.foreach(mf => graft.core.io.Skipping
      .emitManifest(df.sparkSession, outPath, statsCols, mf): Unit)
  }

  /** Write `df` globally SHUFFLED, deterministically: the training-export
    * step — a model must not see the corpus in crawl/ingest order, but a
    * `rand()` shuffle is unreproducible and breaks task-retry semantics.
    * The sort key is the portable md5 hash of (salt, id)
    * ([[Sampling.hashBucket]]'s domain), range-partitioned and sorted
    * within files, so the SAME rows land in the SAME files in the SAME
    * order on every rerun and every engine — and a different `salt` is a
    * fresh, independent shuffle (epoch reshuffles without rewriting
    * logic). Cost: one sampled range exchange, same as any sorted write.
    *
    * `idCol` rides along as the tiebreaker: the hash is mod 2^30, so
    * birthday collisions are EXPECTED past ~10^5 rows (certain at target
    * scale), and without a pinned tie order colliding rows would land in
    * shuffle-arrival order — silently different layouts per rerun.
    */
  def shuffledWrite(df: DataFrame, idCol: String, salt: String,
                    outPath: String, numFiles: Int,
                    mode: String = "overwrite"): Unit =
    rangeSortedWrite(df,
      Sampling.hashBucket(col(idCol), salt, buckets = 1 << 30),
      outPath, numFiles, mode, tiebreak = Seq(col(idCol)))

  /** Contiguous global ordinals `0..n-1` in `sortCols` order WITHOUT a
    * single-partition window (the `Window.orderBy`-with-no-partition
    * shape that funnels 100 TB through one task): range-repartition on
    * the sort key, sort within partitions, then `zipWithIndex` — range
    * partitions are ordered by construction, so partition-index +
    * within-partition position IS the global rank, wherever the sampled
    * range bounds happen to fall. Cost: one range exchange plus
    * zipWithIndex's partition-count pre-pass.
    *
    * `sortCols` must be a UNIQUE total order (append an id tiebreaker):
    * with duplicate keys, rows tied across a range boundary would take
    * arrival order and the mapping would not be a pure function of the
    * data. The stable-surrogate-key / training-example-numbering
    * primitive (the reference's `monotonically_increasing_id` ad-hoc
    * territory, but reproducible).
    *
    * This is a terminal labeling step (RDD zip breaks codegen) — apply
    * just before a write, not mid-pipeline.
    */
  def stableIds(df: DataFrame, sortCols: Seq[String],
                idName: String = "ordinal",
                partitions: Option[Int] = None): DataFrame = {
    require(sortCols.nonEmpty, "stableIds needs at least one sort column")
    val spark = df.sparkSession
    val n = partitions.getOrElse(spark.conf.get("spark.sql.shuffle.partitions", "32").toInt)
    val sorted = df.repartitionByRange(n, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+ org.apache.spark.sql.types.StructField(
        idName, org.apache.spark.sql.types.LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
    }
    spark.createDataFrame(rdd, schema)
  }
}
