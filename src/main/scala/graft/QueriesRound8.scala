package graft

import org.apache.spark.sql.functions._
import graft.Queries.QueryDef

/** Round-8 widening: the tombstone-lane index vacuum gate plus the
  * operators added this round.
  */
object QueriesRound8 {

  /** Tombstone-only index vacuum ([[graft.ops.Dedup
    * .vacuumNearDupIndex]], NO compact — q140's other lane): after the
    * forget ids append to the tombstone table, every index READ must
    * already treat the forgotten docs as gone — their planted near-dups
    * in the q70 delta are accepted again — while the index parquet
    * files stay byte-identical (the ~deleted-rows vacuum cost contract;
    * file identity is spec-asserted in NearDupIndexSpec, the acceptance
    * semantics hash-gate here). Same oracle as q140: the q70 recursive
    * replay with the forgotten docs excluded from the corpus.
    */
  val q178 = QueryDef("q178_index_vacuum_tombstone", (spark, dir) => {
    val (corpus, delta) = QueriesText.q70Corpus(spark, dir)
    Seq("_shingles", "_buckets", "_meta", "_shingles_vac", "_buckets_vac",
      "_tombstones")
      .foreach(s => spark.sql(s"DROP TABLE IF EXISTS q178idx$s"))
    val idx = graft.ops.Dedup.writeNearDupIndex(corpus, "doc_id", "text",
      "q178idx", numBuckets = 8)
    graft.ops.Dedup.vacuumNearDupIndex(spark, "q178idx",
      corpus.filter(col("doc_id") % 20 === 0).select("doc_id"))
    graft.ops.Dedup.dropNearDuplicatesAgainst(idx, delta, "doc_id",
        "text", threshold = 0.8, maxBandFreq = None,
        appendAccepted = false)
      .orderBy("doc_id")
  }, QueriesText.q70.oracle.map(_.replace(
    "corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0)",
    "corpus AS (SELECT doc_id, text FROM documents " +
      "WHERE doc_id % 2 = 0 AND doc_id % 20 <> 0)")))

  val all: Seq[QueryDef] = Seq(q178)
}
