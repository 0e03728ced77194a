package graft

import graft.core.GraftSession

/** Scratch: write each named gate query's `explain("formatted")` to
  * `<outDir>/<name>_<suffix>.txt` — the plans/rNN before/after evidence
  * files. Not part of the library API.
  *
  *   sbt "runMain graft.ProbeDump plans/r13 after q182_record_linkage ..."
  *   env: SPARK_GRAFT_SF_DIR (default sf0.001)
  */
object ProbeDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2).toSet
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = GraftSession.local(cores = 8, shufflePartitions = 8)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.toSeq.sorted.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"[dump] $name: not in the registry")
        case Some(fn) =>
          try {
            val df = fn(spark, dir)
            val plan = df.queryExecution.explainString(
              org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
            java.nio.file.Files.write(
              java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
              plan.getBytes("UTF-8"))
            println(s"[dump] $name ok")
          } catch {
            case e: Throwable => println(s"[dump] $name ERROR $e")
          }
      }
    }
    spark.stop()
  }
}
