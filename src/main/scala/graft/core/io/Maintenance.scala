package graft.core.io

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.hadoop.fs.Path

/** Dataset maintenance for long-lived sinks. Incremental appends (the
  * no_schema sink writes one folder per period) accumulate small files;
  * at scale the file count, not the byte count, becomes the scan
  * bottleneck (driver listing + task-per-file overhead).
  */
object Maintenance {

  final case class Compacted(filesBefore: Int, filesAfter: Int, bytes: Long)

  /** Rewrite a parquet directory into ~`targetFileBytes` files: read,
    * repartition to ceil(total/target), write to a sibling temp dir, then
    * swap via rename. The swap is atomic on HDFS/local rename semantics;
    * on object stores rename is copy+delete, so there is a visibility
    * window — run compaction when no reader races the swap (or use a
    * table format with atomic commits for that case).
    *
    * Parquet compresses ~on par with itself on rewrite, so input bytes
    * approximate output bytes well enough for file sizing.
    */
  def compactParquet(spark: SparkSession, dir: String,
                     targetFileBytes: Long = 128L * 1024 * 1024): Compacted = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverOrphanedSwap(fs, path,
      new Path(path.getParent, s".${path.getName}_compact_old"))
    require(fs.exists(path), s"no dataset at $dir")
    val files = fs.listStatus(path)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    require(files.nonEmpty, s"no parquet files directly under $dir " +
      "(partitioned layouts compact per partition directory)")
    val totalBytes = files.map(_.getLen).sum
    val n = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt

    val tmp = new Path(path.getParent, s".${path.getName}_compact_tmp")
    val old = new Path(path.getParent, s".${path.getName}_compact_old")
    fs.delete(tmp, true)
    fs.delete(old, true)
    spark.read.parquet(dir).repartition(n)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val after = carrySidecarsAndSwap(spark, fs, path, tmp, old)
    Compacted(files.length, after, totalBytes)
  }

  /** Sidecar carry + atomic-ish swap shared by the compactors: copy every
    * non-parquet sidecar (_schema.json, _git_info.json, ...) into `tmp`
    * so the swap replaces data files only, then rename `path` aside and
    * `tmp` into place (restoring on failure). Returns the post-swap
    * parquet file count.
    */
  private def carrySidecarsAndSwap(spark: SparkSession,
                                   fs: org.apache.hadoop.fs.FileSystem,
                                   path: Path, tmp: Path, old: Path): Int = {
    val after = fs.listStatus(tmp)
      .count(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    fs.listStatus(path)
      .filter(st => st.isFile && !st.getPath.getName.endsWith(".parquet")
        && st.getPath.getName != "_SUCCESS")
      .foreach { st =>
        org.apache.hadoop.fs.FileUtil.copy(fs, st.getPath,
          fs, new Path(tmp, st.getPath.getName), false, true,
          spark.sparkContext.hadoopConfiguration)
      }
    require(fs.rename(path, old), s"could not move $path aside")
    if (!fs.rename(tmp, path)) {
      fs.rename(old, path) // restore — compaction failed, data intact
      sys.error(s"could not swap compacted data into $path; original restored")
    }
    fs.delete(old, true)
    after
  }

  /** Crash recovery for the swap: a previous run may have died between
    * [[carrySidecarsAndSwap]]'s two renames, leaving the ONLY surviving
    * copy at the hidden `old` path — which dataset reads silently skip
    * (dot-prefixed). Restore it before touching `path`.
    */
  private def recoverOrphanedSwap(fs: org.apache.hadoop.fs.FileSystem,
                                  path: Path, old: Path): Unit =
    if (!fs.exists(path) && fs.exists(old))
      require(fs.rename(old, path), s"could not restore $path from $old")

  final case class ZorderCompacted(partition: String, filesBefore: Int,
                                   filesAfter: Int, maxOverlapBefore: Int,
                                   reclustered: Boolean)

  /** Z-order-PRESERVING incremental compaction: appended increments decay
    * the clustering a [[graft.ops.Layout.zorderWrite]] established — each
    * unsorted append adds files whose z-range spans the whole curve, so
    * per-file min/max stats stop pruning. This re-clusters ONLY where the
    * layout measurably degraded, leaving still-tight data untouched (at
    * 100 TB a blanket rewrite of a mostly-clean table is the cost this
    * operator exists to avoid).
    *
    * Degradation test, per partition directory (one level of `key=value`
    * dirs, or the root itself when unpartitioned):
    *  - file-overlap: per-file [min, max] of the z-value — one
    *    column-pruned scan of the `dims` columns — sorted and swept;
    *    a file whose range intersects more than `maxOverlapPerFile`
    *    other files' ranges marks the partition degraded (a fresh
    *    range-repartitioned write has disjoint ranges: equal keys land
    *    in one range partition);
    *  - file-count: more than 2× the byte-derived target file count
    *    (disjoint but tiny appended files degrade listing + task grain,
    *    not min/max tightness).
    *
    * A degraded partition is rewritten with the SAME cluster expression
    * ([[graft.ops.Layout.zValue]] of `dims`, or the bare column for one
    * dim) via range-repartition + in-partition sort, then swapped in
    * with sidecars carried — restoring the tightness the original write
    * had. Clean partitions are returned with `reclustered = false` and
    * their files untouched.
    */
  def compactZorder(spark: SparkSession, dir: String, dims: Seq[String],
                    bits: Int = 16,
                    targetFileBytes: Long = 128L * 1024 * 1024,
                    maxOverlapPerFile: Int = 0): Seq[ZorderCompacted] = {
    require(dims.nonEmpty, "compactZorder needs at least one dim column")
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverOrphanedSwap(fs, root,
      new Path(root.getParent, s".${root.getName}_zcompact_old"))
    require(fs.exists(root), s"no dataset at $dir")
    // restore any PARTITION orphaned by a crashed swap first — its
    // visible dir is gone, so the listing below would never find it
    fs.listStatus(root)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(".") &&
        st.getPath.getName.endsWith("_zcompact_old"))
      .foreach { st =>
        val visible = new Path(root, st.getPath.getName
          .stripPrefix(".").stripSuffix("_zcompact_old"))
        recoverOrphanedSwap(fs, visible, st.getPath)
      }
    // hidden swap leftovers (.p=a_zcompact_tmp/_old) also contain '=' —
    // only visible dirs are data partitions
    val partDirs = fs.listStatus(root)
      .filter(st => st.isDirectory && st.getPath.getName.contains("=") &&
        !st.getPath.getName.startsWith(".") &&
        !st.getPath.getName.startsWith("_"))
      .map(_.getPath).sortBy(_.getName)
    val targets = if (partDirs.nonEmpty) partDirs.toSeq else Seq(root)
    targets.map(p =>
      compactZorderOne(spark, fs, p, dims, bits, targetFileBytes,
        maxOverlapPerFile))
  }

  private def compactZorderOne(spark: SparkSession,
                               fs: org.apache.hadoop.fs.FileSystem,
                               path: Path, dims: Seq[String], bits: Int,
                               targetFileBytes: Long,
                               maxOverlapPerFile: Int): ZorderCompacted = {
    import org.apache.spark.sql.functions.{col, input_file_name, min, max}
    recoverOrphanedSwap(fs, path,
      new Path(path.getParent, s".${path.getName}_zcompact_old"))
    val files = fs.listStatus(path)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    if (files.isEmpty)
      return ZorderCompacted(path.toString, 0, 0, 0, reclustered = false)
    def zExpr = if (dims.size == 1) col(dims.head).cast("long")
      else graft.ops.Layout.zValue(dims.map(col), bits)
    // per-file z ranges: one scan pruned to the dim columns
    val ranges = spark.read.parquet(path.toString)
      .select(input_file_name().as("_f"), zExpr.as("_z"))
      .filter(col("_z").isNotNull)
      .groupBy("_f").agg(min("_z").as("lo"), max("_z").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    val maxOverlap =
      if (ranges.length < 2) 0
      else ranges.indices.map { i =>
        val (lo, hi) = ranges(i)
        ranges.indices.count(j => j != i &&
          ranges(j)._1 <= hi && ranges(j)._2 >= lo)
      }.max
    val totalBytes = files.map(_.getLen).sum
    val targetN =
      math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    val degraded = maxOverlap > maxOverlapPerFile || files.length > 2 * targetN
    if (!degraded)
      return ZorderCompacted(path.toString, files.length, files.length,
        maxOverlap, reclustered = false)
    val tmp = new Path(path.getParent, s".${path.getName}_zcompact_tmp")
    val old = new Path(path.getParent, s".${path.getName}_zcompact_old")
    fs.delete(tmp, true)
    fs.delete(old, true)
    spark.read.parquet(path.toString)
      .withColumn("_z", zExpr)
      .repartitionByRange(targetN, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val after = carrySidecarsAndSwap(spark, fs, path, tmp, old)
    ZorderCompacted(path.toString, files.length, after, maxOverlap,
      reclustered = true)
  }
}
