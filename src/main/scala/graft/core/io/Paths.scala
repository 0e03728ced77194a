package graft.core.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Path templating beyond plain `{{param}}` interpolation (reference
  * Path_Handler, yaetos/etl_utils.py:1089-1111):
  *
  *  - `{{latest}}` — replaced by the lexicographically greatest subfolder
  *    at that point in the path (filesystem listing, works on any Hadoop
  *    FS scheme, same max-string rule as the reference).
  *  - `{{now}}` — replaced by the supplied run timestamp (passed in, not
  *    sampled here, so reruns and tests are deterministic).
  */
object PathTemplating {

  def expandNow(path: String, now: String): String = path.replace("{{now}}", now)

  def expandLatest(path: String, spark: SparkSession): String = {
    if (!path.contains("{{latest}}")) return path
    val idx = path.indexOf("{{latest}}")
    val base = path.substring(0, idx).stripSuffix("/")
    val fs = FileSystem.get(new java.net.URI(base), spark.sparkContext.hadoopConfiguration)
    val children = fs.listStatus(new Path(base)).filter(_.isDirectory).map(_.getPath.getName)
    require(children.nonEmpty, s"no subfolders under $base for {{latest}}")
    expandLatest(path.substring(0, idx) + children.max + path.substring(idx + "{{latest}}".length), spark)
  }

  def expand(path: String, spark: SparkSession, now: String): String =
    expandLatest(expandNow(path, now), spark)

  /** List files under a base path matching an optional glob — the
    * list-files job (reference jobs/generic/list_files_job.py:9-66) as a
    * DataFrame of (path, size, mtime).
    */
  def listFiles(spark: SparkSession, base: String, glob: Option[String] = None):
      org.apache.spark.sql.DataFrame = {
    val fs = FileSystem.get(new java.net.URI(base), spark.sparkContext.hadoopConfiguration)
    val pattern = new Path(base, glob.getOrElse("*"))
    val statuses = fs.globStatus(pattern)
    val rows = if (statuses == null) Seq.empty else statuses.toSeq.map(s =>
      (s.getPath.toString, s.getLen, s.getModificationTime))
    import spark.implicits._
    rows.toDF("path", "size", "mtime")
  }

  /** Raw byte-copy of files (reference copy_raw job,
    * jobs/generic/copy_raw_job.py:5-27) — driver-side Hadoop FileUtil, no
    * parsing.
    */
  def copyRaw(spark: SparkSession, src: String, dst: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val srcFs = FileSystem.get(new java.net.URI(src), conf)
    val dstFs = FileSystem.get(new java.net.URI(dst), conf)
    org.apache.hadoop.fs.FileUtil.copy(srcFs, new Path(src), dstFs, new Path(dst),
      false, true, conf)
  }
}
