package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-file jobs: a `.sql` file whose header lines declare parameters as
  *
  *   ----param---- 'key' : 'value' ----
  *
  * and whose body is a SparkSQL query over registered temp views, with
  * `{{key}}` placeholders interpolated before execution (reference
  * yaetos/sql_spark_job.py:7-43; header fixture
  * reference tests/fixtures/sql_job.sql:1-4). The whole
  * parse→analyze→optimize→execute pipeline is Catalyst's.
  */
object SqlFile {

  private val ParamLine =
    """^\s*----param----\s*'([^']+)'\s*:\s*'([^']*)'\s*----\s*$""".r

  /** Extract header params from SQL text. */
  def params(sql: String): Map[String, String] =
    sql.linesIterator.collect {
      case ParamLine(k, v) => k -> v
    }.toMap

  /** SQL body with header param lines removed. */
  def body(sql: String): String =
    sql.linesIterator.filterNot(l => ParamLine.matches(l)).mkString("\n")

  /** Recursive `{{param}}` interpolation, cycle-limited (reference
    * Job_Args_Parser.replace_placeholders, yaetos/etl_utils.py:1051-1078).
    */
  def interpolate(text: String, args: Map[String, String], maxDepth: Int = 100): String =
    graft.core.model.Params.interpolate(text, args, maxDepth)

  /** Run a SQL-file job: parse header params (overridable by `overrides`),
    * interpolate, execute via `spark.sql`. Inputs must already be
    * registered as temp views.
    */
  def run(spark: SparkSession, sql: String,
          overrides: Map[String, String] = Map.empty): DataFrame = {
    val args = params(sql) ++ overrides
    spark.sql(interpolate(body(sql), args))
  }

  def runFile(spark: SparkSession, path: String,
              overrides: Map[String, String] = Map.empty): DataFrame =
    run(spark, new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"), overrides)

  /** Load a SQL file bundled as a classpath resource. */
  def resource(name: String): String = {
    val in = getClass.getResourceAsStream(name)
    require(in != null, s"missing SQL resource: $name")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  /** SQL text from a classpath resource if present, else a filesystem path. */
  def resourceOrFile(path: String): String = {
    val in = getClass.getResourceAsStream(path)
    if (in != null)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    else new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")
  }
}
