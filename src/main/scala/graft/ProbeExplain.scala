package graft

import graft.core.{GraftSession, Tables}
import graft.ops.Dedup

/** Scratch: dump physical plans for shape audits (exchange reuse, skew
  * guard, broadcast/pruning checks). Not part of the library API.
  * Usage: runMain graft.ProbeExplain [sfDir] [what]
  *   what = jaccard (default) | q58 | q60 | q26cache
  */
object ProbeExplain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val what = args.drop(1).headOption.getOrElse("jaccard")
    val spark = GraftSession.local(cores = 8, shufflePartitions = 8)
    val q = what match {
      case "jaccard" =>
        Dedup.jaccardPairs(Tables.load(spark, dir, "documents"),
          "doc_id", "text", threshold = 0.6, maxShingleFreq = Some(50))
      case "q58" => Queries.queryMap("q58_kmeans_ivf")(spark, dir)
      case "q60" => Queries.queryMap("q60_multipath_source")(spark, dir)
      case "q26cache" =>
        val out = Dedup.jaccardPairs(Tables.load(spark, dir, "documents"),
          "doc_id", "text", threshold = 0.6, maxShingleFreq = Some(2))
        println("persisted RDDs after capped call: " +
          spark.sparkContext.getPersistentRDDs.size)
        out
      case "q75" => Queries.queryMap("q75_scd2_merge")(spark, dir)
      case "q76" => Queries.queryMap("q76_bloom_join")(spark, dir)
      case "q77" => Queries.queryMap("q77_heavy_hitters")(spark, dir)
      case "q78" => Queries.queryMap("q78_unigram_lm")(spark, dir)
      case name if Queries.queryMap.contains(name) =>
        Queries.queryMap(name)(spark, dir)
      case other => sys.error(s"unknown probe: $other")
    }
    q.explain("formatted")
    println("rows: " + q.count())
    if (what == "q26cache")
      println("persisted RDDs after action: " +
        spark.sparkContext.getPersistentRDDs.size)
    spark.stop()
  }
}
