package graft

import graft.core.{GraftSession, Tables}
import graft.ops.Dedup

/** Scratch: dump the physical plan of the capped jaccard path (exchange
  * reuse + skew-guard shape audit). Not part of the library API.
  */
object ProbeExplain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local(cores = 8, shufflePartitions = 8)
    val docs = Tables.load(spark, dir, "documents")
    val q = Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.6,
      maxShingleFreq = Some(50))
    q.explain("formatted")
    println("rows: " + q.count())
    spark.stop()
  }
}
