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
    val after = fs.listStatus(tmp)
      .count(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    // Sidecars (_schema.json, _git_info.json, ...) live NEXT TO the data:
    // carry every non-parquet file into the compacted dir so the swap
    // replaces data files only, not the dataset's metadata.
    fs.listStatus(path)
      .filter(st => st.isFile && !st.getPath.getName.endsWith(".parquet")
        && st.getPath.getName != "_SUCCESS")
      .foreach { st =>
        org.apache.hadoop.fs.FileUtil.copy(fs, st.getPath,
          fs, new Path(tmp, st.getPath.getName), false, true,
          spark.sparkContext.hadoopConfiguration)
      }
    // swap: two renames, then drop the old data
    require(fs.rename(path, old), s"could not move $path aside")
    if (!fs.rename(tmp, path)) {
      fs.rename(old, path) // restore — compaction failed, data intact
      sys.error(s"could not swap compacted data into $dir; original restored")
    }
    fs.delete(old, true)
    Compacted(files.length, after, totalBytes)
  }
}
