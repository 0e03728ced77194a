package graft

import graft.core.GraftSession

/** Scratch plan inspector: prints the formatted physical plan of the
  * named gate queries at sf0.001. Not part of the library API.
  *
  *   sbt "runMain graft.ProbePlan q90_token_chunks q91_countmin_sketch"
  */
object ProbePlan {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = GraftSession.local(cores = 8, shufflePartitions = 8)
    val qs = Queries.all.filter(q => args.contains(q.name))
    qs.foreach { q =>
      println(s"\n======== ${q.name} ========")
      val df = q.run(spark, dir)
      df.explain("formatted")
      println(s"rows: ${df.count()}")
    }
    spark.stop()
  }
}
