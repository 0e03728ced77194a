package graft

import org.apache.spark.sql.functions._
import graft.core.{GraftSession, Tables}
import graft.engine.SqlFile
import graft.ops.{Checks, Compare, Dedup, Similarity, TextAnalysis}

/** Scratch probe: drives the library's public surface end-to-end on the
  * sf0.001 corpus. Not part of the library API.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local(cores = 8, shufflePartitions = 8)
    Tables.registerAll(spark, dir)

    // engine.SqlFile: param-header SQL job over registered views
    val sql =
      """----param---- 'seg' : 'BUILDING' ----
        |SELECT c_mktsegment, count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment <> '{{seg}}'
        |GROUP BY c_mktsegment ORDER BY n DESC""".stripMargin
    println("== SqlFile.run ==")
    SqlFile.run(spark, sql).show(5, truncate = false)

    // ops.Checks
    val li = Tables.load(spark, dir, "lineitem")
    println(s"pk(l_orderkey,l_linenumber) unique: " +
      Checks.pkIsUnique(li, Seq("l_orderkey", "l_linenumber")))
    println("non-unique by l_orderkey: " +
      Checks.nonUniquePks(li, Seq("l_orderkey")).count())

    // ops.Compare
    val ev = Tables.load(spark, dir, "events")
    println("== Compare.exactSummary ==")
    Compare.exactSummary(ev, ev.filter(col("value") > 0)).show()

    // ops.Dedup
    val docs = Tables.load(spark, dir, "documents")
    println("exact dup groups: " +
      Dedup.exactKeepFirst(docs, Seq("text"), Seq(col("doc_id"))).count()
        + " / " + docs.count())
    val jp = Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.6)
    println("jaccard>=0.6 pairs: " + jp.count())
    val jpCapped = Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.6,
      maxShingleFreq = Some(50))
    println("capped jaccard pairs: " + jpCapped.count())
    jpCapped.explain("formatted")
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text", threshold = 0.6)
    println("minhash-LSH verified pairs: " + lsh.count())
    println("simhash pairs dist<=3: " +
      Dedup.simhashPairs(docs, "doc_id", "text", maxDist = 3).count())

    // ops.Similarity
    val emb = Tables.load(spark, dir, "embeddings")
    val probes = emb.filter(col("vec_id") % 100 === 0)
    println("== Similarity.bruteForceTopK ==")
    Similarity.bruteForceTopK(emb, probes, k = 3).show(10, truncate = false)

    // ops.TextAnalysis
    println("== TextAnalysis.langId ==")
    TextAnalysis.langId(docs, "doc_id", "text")
      .groupBy("pred_lang").count().orderBy("pred_lang").show()
    println("== TextAnalysis.qualityScore ==")
    TextAnalysis.qualityScore(docs, "doc_id", "text").show(3)

    // plan sanity: the region-revenue join should broadcast the dims
    val plan = spark.sql(
      """SELECT r_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin)
    plan.show()
    plan.explain("formatted")
    spark.stop()
  }
}
