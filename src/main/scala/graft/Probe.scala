package graft

import org.apache.spark.sql.functions._
import graft.core.{GraftSession, Tables}

/** Editable scratch driver (see .claude/skills/verify): currently probing
  * q201's executed plan for exchange reuse of the BPE-encode subtree.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.local(cores = 8, shufflePartitions = 8)
    val docs = Tables.load(spark, dir, "documents").select("doc_id", "text")
    val merges = graft.ops.Bpe.mergesOf(
      graft.ops.Bpe.learn(docs, "text", numMerges = 20))
    val pairs = graft.ops.Dedup.jaccardPairsTokens(docs, "doc_id", "text",
      merges, threshold = 0.6, n = 5, maxShingleFreq = Some(50))
    val t0 = System.nanoTime()
    println("pairs: " + pairs.count())
    println(f"time: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val plan = pairs.queryExecution.executedPlan.toString
    val agg = "HashAggregate".r.findAllIn(plan).length
    val reused = "ReusedExchange".r.findAllIn(plan).length
    val exch = "Exchange ".r.findAllIn(plan).length
    val gens = "Generate explode".r.findAllIn(plan).length
    println(s"HashAggregate=$agg ReusedExchange=$reused Exchange=$exch Generate=$gens")
    spark.stop()
  }
}
