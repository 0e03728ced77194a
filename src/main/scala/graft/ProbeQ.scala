package graft

import graft.core.GraftSession

/** Scratch probe: run ONE gate query by name at a given sf dir and show
  * rows + the formatted plan. Not part of the library API.
  *
  * Usage: runMain graft.ProbeQ <queryName> [sfDir] [--explain]
  */
object ProbeQ {
  def main(args: Array[String]): Unit = {
    val name = args.head
    val dir = args.drop(1).filterNot(_.startsWith("--")).headOption
      .getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local(cores = 8, shufflePartitions = 8)
    spark.sparkContext.setLogLevel("WARN")
    val df = Queries.queryMap(name)(spark, dir)
    df.show(20, truncate = false)
    println(s"rows: ${df.count()}")
    if (args.contains("--explain")) df.explain("formatted")
  }
}
