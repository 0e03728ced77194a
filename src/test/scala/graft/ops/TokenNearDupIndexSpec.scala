package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The TOKEN-GRAIN persisted near-dup index: ingest semantics at BPE
  * piece grain, the stored merge table as part of the index contract,
  * and the word-grain GDPR lanes applying verbatim.
  */
class TokenNearDupIndexSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog near " +
    "the old stone bridge today while birds watch from above the water"
  private val fresh = "completely different words about spark shuffles " +
    "and parquet row groups inside the executor memory model here"

  private def dropIndex(name: String): Unit =
    Seq("_shingles", "_buckets", "_meta", "_tombstones", "_merges",
      "_shingles_vac", "_buckets_vac").foreach(s =>
      spark.sql(s"DROP TABLE IF EXISTS $name$s"))

  test("token ingest: within-delta collapse keep-min, corpus drop, " +
      "grown-index replay drops everything, merges pinned to the index") {
    dropIndex("tndx1")
    val corpus = Seq((10L, base), (11L, fresh)).toDF("doc_id", "text")
    val merges = Bpe.learn(corpus, "text", numMerges = 10)
    Dedup.writeTokenNearDupIndex(corpus, "doc_id", "text", merges,
      "tndx1", n = 5, numBuckets = 4)
    try {
      // 20/21 near-dup each other within the delta (keep-min → 20) and
      // nothing in the corpus; 22 near-dups the CORPUS (base) →
      // dropped; 23 is novel
      val novel = "seven silver llamas carry heavy ancient scrolls " +
        "across the windy mountain pass before sunrise every winter"
      val delta = Seq(
        (20L, novel + " with one extra tail"),
        (21L, novel + " with one extra tail indeed"),
        (22L, base + " almost"),
        (23L, "entirely unrelated text about catalyst optimizer rules " +
          "and broadcast thresholds and nothing else whatsoever at all"))
        .toDF("doc_id", "text")
      val accepted = Dedup.dropNearDuplicatesAgainstTokens(spark, "tndx1",
        delta, "doc_id", "text", threshold = 0.5, maxBandFreq = None,
        appendAccepted = true)
      assert(accepted.select("doc_id").as[Long].collect().toSet
        === Set(20L, 23L))
      // replaying the SAME delta against the grown index drops all of it
      val replay = Dedup.dropNearDuplicatesAgainstTokens(spark, "tndx1",
        delta, "doc_id", "text", threshold = 0.5, maxBandFreq = None,
        appendAccepted = false)
      assert(replay.isEmpty,
        "a replayed delta must be fully dropped by the grown token index")
      // excludeSelfIds: the replay-idempotence switch reproduces the
      // first run's accepted set even though the index holds 20/23
      val replaySelf = Dedup.dropNearDuplicatesAgainstTokens(spark,
        "tndx1", delta, "doc_id", "text", threshold = 0.5,
        maxBandFreq = None, appendAccepted = false, excludeSelfIds = true)
      assert(replaySelf.select("doc_id").as[Long].collect().toSet
        === Set(20L, 23L))
      // the stored merges ARE the index's piece space
      val (_, stored) = Dedup.loadTokenNearDupIndex(spark, "tndx1")
      assert(stored.length === 10)
    } finally dropIndex("tndx1")
  }

  test("word-grain GDPR lanes apply verbatim: vacuum re-accepts a " +
      "forgotten doc's near-dup, compact scrubs physically") {
    dropIndex("tndx2")
    val corpus = Seq((10L, base), (11L, fresh)).toDF("doc_id", "text")
    val merges = Bpe.learn(corpus, "text", numMerges = 10)
    Dedup.writeTokenNearDupIndex(corpus, "doc_id", "text", merges,
      "tndx2", n = 5, numBuckets = 4)
    try {
      val nearBase = Seq((30L, base + " almost")).toDF("doc_id", "text")
      def ingest() = Dedup.dropNearDuplicatesAgainstTokens(spark, "tndx2",
        nearBase, "doc_id", "text", threshold = 0.5, maxBandFreq = None,
        appendAccepted = false)
      assert(ingest().isEmpty, "the fixture must near-dup the corpus")
      // forget doc 10: its near-dup must be ACCEPTED again
      assert(Dedup.vacuumNearDupIndex(spark, "tndx2",
        Seq(10L).toDF("doc_id")) === 1L)
      assert(ingest().select("doc_id").as[Long].collect().toSet
        === Set(30L))
      // compact scrubs the shingle rows physically; ingest unchanged
      assert(Dedup.compactNearDupIndex(spark, "tndx2") === 1L)
      assert(spark.table("tndx2_shingles")
        .filter(col("doc_id") === 10L).isEmpty)
      assert(ingest().select("doc_id").as[Long].collect().toSet
        === Set(30L))
    } finally dropIndex("tndx2")
  }

  test("appending under RE-LEARNED merges fails loudly; the rebuild path " +
      "re-encodes the corpus under the new table") {
    dropIndex("tndx3")
    val corpus = Seq((10L, base), (11L, fresh)).toDF("doc_id", "text")
    val v1 = Bpe.learn(corpus, "text", numMerges = 10)
    val idx = Dedup.writeTokenNearDupIndex(corpus, "doc_id", "text", v1,
      "tndx3", n = 5, numBuckets = 4)
    try {
      val delta = Seq((20L, "novel words that appear in no other " +
        "document of this tiny spec corpus at all")).toDF("doc_id", "text")
      // a re-learned table (different corpus slice + budget) is a
      // DIFFERENT piece space: the append must refuse, not silently
      // shingle into a split vocabulary
      val v2 = Bpe.mergesOf(Bpe.learn(
        corpus.unionByName(delta), "text", numMerges = 18))
      val err = intercept[IllegalArgumentException] {
        Dedup.appendToTokenNearDupIndex(idx, delta, "doc_id", "text", v2)
      }
      assert(err.getMessage.contains("merge-table mismatch") &&
        err.getMessage.contains("writeTokenNearDupIndex"))
      // the stored table verbatim still appends (the supported path —
      // exactly what dropNearDuplicatesAgainstTokens passes)
      val stored = Bpe.mergesOf(spark.table("tndx3_merges"))
      Dedup.appendToTokenNearDupIndex(idx, delta, "doc_id", "text", stored)
      spark.catalog.refreshTable("tndx3_shingles")
      assert(spark.table("tndx3_shingles")
        .filter(col("doc_id") === 20L).count() > 0)
      // and the rebuild path accepts the new merges wholesale
      Dedup.writeTokenNearDupIndex(corpus.unionByName(delta), "doc_id",
        "text", Bpe.learn(corpus.unionByName(delta), "text", numMerges = 18),
        "tndx3", n = 5, numBuckets = 4)
      assert(Bpe.mergesOf(spark.table("tndx3_merges")).length === 18)
    } finally dropIndex("tndx3")
  }

  test("loading a word-grain index as token-grain fails loudly") {
    dropIndex("tndx3")
    val corpus = Seq((1L, base)).toDF("doc_id", "text")
    Dedup.writeNearDupIndex(corpus, "doc_id", "text", "tndx3",
      numBuckets = 4)
    try {
      val e = intercept[IllegalArgumentException](
        Dedup.loadTokenNearDupIndex(spark, "tndx3"))
      assert(e.getMessage.contains("_merges"))
    } finally dropIndex("tndx3")
  }
}
