package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet-backed query result memoization (reference query_helper's
  * pickle/csv cache with interactive overwrite,
  * yaetos/libs/analysis_toolkit/query_helper.py:7-96 — non-interactive
  * here: content-addressed by SQL text, explicit invalidation).
  */
object QueryCache {

  def keyOf(sql: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(sql.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Run `sql` or serve its cached result from `cacheDir/<md5(sql)>`. */
  def cached(spark: SparkSession, sql: String, cacheDir: String,
             overwrite: Boolean = false): DataFrame = {
    val path = s"${cacheDir.stripSuffix("/")}/${keyOf(sql)}"
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(path),
      spark.sparkContext.hadoopConfiguration)
    val exists = fs.exists(new org.apache.hadoop.fs.Path(path))
    if (exists && !overwrite) spark.read.parquet(path)
    else {
      val df = spark.sql(sql)
      df.write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
    }
  }
}
