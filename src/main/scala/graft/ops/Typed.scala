package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Typed Dataset paths for the reference's raw-RDD jobs (S4/K2/Q22:
  * wordcount via flatMap/map/reduceByKey,
  * reference jobs/examples/wordcount_frameworked_job.py:6-10). On Spark
  * these are `Dataset[String]` transformations — same per-partition
  * imperative shape, but schema-aware and Catalyst-planned after the
  * typed boundary.
  */
object Typed {

  def readText(spark: SparkSession, path: String): Dataset[String] =
    spark.read.textFile(path)

  /** flatMap → groupBy → count; the explode/groupBy plan equivalent is in
    * Queries q17 — this is the typed twin kept for RDD-style parity.
    */
  def wordcount(lines: Dataset[String]): DataFrame = {
    import lines.sparkSession.implicits._
    lines.flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupByKey(identity).count()
      .toDF("word", "n")
  }

  def saveText(ds: Dataset[String], path: String): Unit =
    ds.write.text(path)
}
