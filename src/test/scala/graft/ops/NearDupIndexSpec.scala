package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.SortMergeJoinExec

/** The persisted near-dup index: same pairs as the recompute path, zero
  * exchange on the stored corpus side of the pairing join, and an append
  * path that keeps the index equal to a full rewrite.
  */
class NearDupIndexSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog near the old stone bridge today"
  private val fresh = "completely different words about spark shuffles and parquet row groups here"

  private def dropIndex(name: String): Unit =
    Seq("_shingles", "_buckets", "_meta", "_tombstones").foreach(s =>
      spark.sql(s"DROP TABLE IF EXISTS $name$s"))

  /** name -> (size, mtime) for every data file under a managed table's
    * warehouse location — the DeleteSpec file-identity probe at catalog
    * grain.
    */
  private def tableStamps(table: String): Map[String, (Long, Long)] = {
    val loc = new java.net.URI(spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
      .location.toString).getPath
    new java.io.File(loc).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_"))
      .map(f => f.getName -> (f.length(), f.lastModified())).toMap
  }

  private def physical(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }

  private def pairSet(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("stored-index pairs are bit-identical to the recompute path") {
    dropIndex("ndx1")
    val corpus = Seq((10L, base), (11L, fresh),
      (12L, base + " with a small drift at the end")).toDF("doc_id", "text")
    val delta = Seq((20L, base + " again"), (21L, fresh + " too"),
      (22L, "entirely unrelated text about catalyst plans and shuffle partitions today")
    ).toDF("doc_id", "text")
    val idx = Dedup.writeNearDupIndex(corpus, "doc_id", "text", "ndx1")
    try {
      for (cap <- Seq(None, Some(3))) {
        val direct = pairSet(Dedup.minhashLshPairsAcross(corpus, delta,
          "doc_id", "text", threshold = 0.7, maxBandFreq = cap))
        val stored = pairSet(Dedup.minhashLshPairsAcross(idx, delta,
          "doc_id", "text", threshold = 0.7, cap))
        assert(stored == direct, s"cap=$cap")
        if (cap.isEmpty) assert(direct.map(p => (p._1, p._2)) ==
          Set((10L, 20L), (11L, 21L)))
      }
      assert(Dedup.loadNearDupIndex(spark, "ndx1") == idx,
        "parameters must survive the catalog round-trip")
    } finally dropIndex("ndx1")
  }

  test("pairing and verification joins read co-bucketed corpus files with no exchange") {
    dropIndex("ndx2")
    val corpus = (1L to 40L).map(i =>
      (i, s"$fresh unique token $i marks this document as number $i"))
      .toDF("doc_id", "text")
    val delta = Seq((100L, fresh + " unique token 7 marks this document as number 7 too"))
      .toDF("doc_id", "text")
    val idx = Dedup.writeNearDupIndex(corpus, "doc_id", "text", "ndx2")
    // disable broadcast so every join would OTHERWISE shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val pairs = Dedup.minhashLshPairsAcross(idx, delta, "doc_id", "text",
        threshold = 0.5, maxBandFreq = None)
      val plan = physical(pairs)
      val smjs = plan.collect { case j: SortMergeJoinExec => j }
      // the stored table feeds its join directly: no shuffle between the
      // bucketed scan and the sort-merge join consuming it
      def shuffleFreeSide(table: String): Boolean = smjs.exists(j =>
        Seq(j.left, j.right).exists(s => s.toString.contains(table) &&
          s.collect { case e: ShuffleExchangeLike => e }.isEmpty))
      assert(shuffleFreeSide(idx.bucketsTable),
        s"corpus buckets shuffled before the pairing join:\n$plan")
      assert(shuffleFreeSide(idx.shinglesTable),
        s"corpus shingles shuffled before the verification join:\n$plan")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      dropIndex("ndx2")
    }
  }

  test("loadNearDupIndex fails loudly when meta and catalog bucket specs drift") {
    dropIndex("ndx4")
    val corpus = Seq((1L, base)).toDF("doc_id", "text")
    Dedup.writeNearDupIndex(corpus, "doc_id", "text", "ndx4", numBuckets = 8)
    try {
      // simulate drift: meta claims a different bucket count than the tables
      import spark.implicits._
      graft.core.io.Writer.writeTable(
        Seq((3, 64, 16, 16)).toDF("n", "num_hashes", "num_bands", "num_buckets"),
        "ndx4_meta")
      val e = intercept[IllegalArgumentException] {
        Dedup.loadNearDupIndex(spark, "ndx4")
      }
      assert(e.getMessage.contains("bucketed 8-way"))
    } finally dropIndex("ndx4")
  }

  test("append round-trip: the grown index equals a recompute over the grown corpus") {
    dropIndex("ndx3")
    val corpus = Seq((10L, base)).toDF("doc_id", "text")
    val delta1 = Seq((20L, base + " again"), (30L, fresh)).toDF("doc_id", "text")
    val idx = Dedup.writeNearDupIndex(corpus, "doc_id", "text", "ndx3")
    try {
      val accepted = Dedup.dropNearDuplicatesAgainst(idx, delta1, "doc_id",
        "text", threshold = 0.8, maxBandFreq = None, appendAccepted = true)
      assert(accepted.select("doc_id").as[Long].collect().toSet == Set(30L))
      // the next delta pairs against corpus ∪ accepted with no recompute
      val delta2 = Seq((40L, fresh + " as well"), (41L, base + " again"))
        .toDF("doc_id", "text")
      val viaIndex = pairSet(Dedup.minhashLshPairsAcross(idx, delta2,
        "doc_id", "text", threshold = 0.8, None))
      val grown = corpus.unionByName(Seq((30L, fresh)).toDF("doc_id", "text"))
      val direct = pairSet(Dedup.minhashLshPairsAcross(grown, delta2,
        "doc_id", "text", threshold = 0.8))
      assert(viaIndex == direct)
      assert(viaIndex.map(p => (p._1, p._2)) == Set((30L, 40L), (10L, 41L)))
      // replaying the SAME delta against the grown index drops everything:
      // every accepted doc now matches its own index entry
      val reingest = Dedup.dropNearDuplicatesAgainst(idx, delta1, "doc_id",
        "text", threshold = 0.8, maxBandFreq = None, appendAccepted = false)
      assert(reingest.isEmpty,
        "a replayed delta must be fully dropped by the grown index")
    } finally dropIndex("ndx3")
  }

  test("vacuum forgets docs: their near-dups are accepted again, and a " +
      "crashed swap heals") {
    dropIndex("ndx4")
    spark.sql("DROP TABLE IF EXISTS ndx4_shingles_vac")
    spark.sql("DROP TABLE IF EXISTS ndx4_buckets_vac")
    val corpus = Seq((10L, base), (11L, fresh)).toDF("doc_id", "text")
    val dup = Seq((20L, base + " again")).toDF("doc_id", "text")
    val idx = Dedup.writeNearDupIndex(corpus, "doc_id", "text", "ndx4")
    try {
      // before the vacuum the near-dup of doc 10 is rejected
      assert(Dedup.dropNearDuplicatesAgainst(idx, dup, "doc_id", "text",
        threshold = 0.8, maxBandFreq = None,
        appendAccepted = false).isEmpty)
      val removed = Dedup.vacuumNearDupIndex(spark, "ndx4",
        Seq(10L).toDF("doc_id"))
      assert(removed == 1L)
      // forgotten: the same near-dup is now accepted; doc 11 still guards
      assert(Dedup.dropNearDuplicatesAgainst(idx, dup, "doc_id", "text",
        threshold = 0.8, maxBandFreq = None, appendAccepted = false)
        .select("doc_id").as[Long].collect().toSet == Set(20L))
      assert(Dedup.dropNearDuplicatesAgainst(idx,
        Seq((21L, fresh + " too")).toDF("doc_id", "text"), "doc_id",
        "text", threshold = 0.8, maxBandFreq = None,
        appendAccepted = false).isEmpty)
      // re-vacuuming an already-tombstoned id counts zero (no double
      // tombstone rows), as does an id never indexed
      assert(Dedup.vacuumNearDupIndex(spark, "ndx4",
        Seq(10L).toDF("doc_id")) == 0L)
      assert(Dedup.vacuumNearDupIndex(spark, "ndx4",
        Seq(999L).toDF("doc_id")) == 0L)
      // crashed COMPACT swap: original dropped, _vac left behind -> the
      // next vacuum rolls it forward before touching anything
      spark.sql("ALTER TABLE ndx4_shingles RENAME TO ndx4_shingles_vac")
      assert(Dedup.vacuumNearDupIndex(spark, "ndx4",
        Seq(999L).toDF("doc_id")) == 0L)
      assert(spark.catalog.tableExists("ndx4_shingles"))
      assert(!spark.catalog.tableExists("ndx4_shingles_vac"))
    } finally {
      dropIndex("ndx4")
      spark.sql("DROP TABLE IF EXISTS ndx4_shingles_vac")
      spark.sql("DROP TABLE IF EXISTS ndx4_buckets_vac")
    }
  }

  test("vacuum is a tombstone append: every index data file stays " +
      "byte-identical until compact physically scrubs") {
    dropIndex("ndx5")
    val corpus = (1L to 30L).map(i =>
      (i, s"$fresh unique token $i marks this document as number $i"))
      .toDF("doc_id", "text")
    val idx = Dedup.writeNearDupIndex(corpus, "doc_id", "text", "ndx5",
      numBuckets = 4)
    try {
      val before = Map(idx.shinglesTable -> tableStamps(idx.shinglesTable),
        idx.bucketsTable -> tableStamps(idx.bucketsTable))
      val removed = Dedup.vacuumNearDupIndex(spark, "ndx5",
        Seq(3L, 7L).toDF("doc_id"))
      assert(removed == 2L)
      // the ~deleted-rows cost contract: zero index-file rewrites
      Seq(idx.shinglesTable, idx.bucketsTable).foreach { t =>
        assert(tableStamps(t) == before(t),
          s"$t files changed under a tombstone-only vacuum")
      }
      // but every read already hides the forgotten docs
      assert(!spark.table(idx.shinglesTable).isEmpty)
      val visibleIds = Dedup.minhashLshPairsAcross(idx,
        Seq((100L, s"$fresh unique token 3 marks this document as number 3 x"))
          .toDF("doc_id", "text"),
        "doc_id", "text", threshold = 0.5, maxBandFreq = None)
        .select("a_id").as[Long].collect().toSet
      assert(!visibleIds.contains(3L), "tombstoned doc still paired")
      // compact: physical scrub, tombstones cleared, files rewritten
      assert(Dedup.compactNearDupIndex(spark, "ndx5") == 2L)
      assert(!spark.catalog.tableExists(idx.tombstonesTable))
      val shIds = spark.table(idx.shinglesTable)
        .select("doc_id").distinct().as[Long].collect().toSet
      assert(!shIds.contains(3L) && !shIds.contains(7L) && shIds.size == 28)
      // compacting a clean index rewrites nothing
      val stable = tableStamps(idx.shinglesTable)
      assert(Dedup.compactNearDupIndex(spark, "ndx5") == 0L)
      assert(tableStamps(idx.shinglesTable) == stable)
    } finally dropIndex("ndx5")
  }

  test("pairing stays exchange-free on the corpus side after a vacuum") {
    dropIndex("ndx6")
    val corpus = (1L to 40L).map(i =>
      (i, s"$fresh unique token $i marks this document as number $i"))
      .toDF("doc_id", "text")
    val delta = Seq((100L, fresh + " unique token 7 marks this document as number 7 too"))
      .toDF("doc_id", "text")
    val idx = Dedup.writeNearDupIndex(corpus, "doc_id", "text", "ndx6")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      assert(Dedup.vacuumNearDupIndex(spark, "ndx6",
        Seq(1L).toDF("doc_id")) == 1L)
      val pairs = Dedup.minhashLshPairsAcross(idx, delta, "doc_id", "text",
        threshold = 0.5, maxBandFreq = None)
      val plan = physical(pairs)
      val smjs = plan.collect { case j: SortMergeJoinExec => j }
      // the tombstone anti-join is a broadcast join: it must not insert a
      // shuffle between the bucketed scan and the sort-merge join
      def shuffleFreeSide(table: String): Boolean = smjs.exists(j =>
        Seq(j.left, j.right).exists(s => s.toString.contains(table) &&
          s.collect { case e: ShuffleExchangeLike => e }.isEmpty))
      assert(shuffleFreeSide(idx.bucketsTable),
        s"corpus buckets shuffled after vacuum:\n$plan")
      assert(shuffleFreeSide(idx.shinglesTable),
        s"corpus shingles shuffled after vacuum:\n$plan")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      dropIndex("ndx6")
    }
  }

  test("compact resumed after a crash between the two table swaps still " +
      "scrubs the buckets table (per-table gating)") {
    dropIndex("ndx8")
    val corpus = (1L to 20L).map(i =>
      (i, s"$fresh unique token $i marks this document as number $i"))
      .toDF("doc_id", "text")
    val idx = Dedup.writeNearDupIndex(corpus, "doc_id", "text", "ndx8",
      numBuckets = 4)
    try {
      assert(Dedup.vacuumNearDupIndex(spark, "ndx8",
        Seq(5L, 9L).toDF("doc_id")) == 2L)
      // simulate a compact that crashed AFTER the shingles swap but
      // BEFORE the buckets rewrite: scrub the shingles table exactly the
      // way compact does, leave buckets + tombstones untouched
      val idList = spark.table(idx.tombstonesTable).select("doc_id").distinct()
      val survivors = spark.table(idx.shinglesTable)
        .join(idList, Seq("doc_id"), "left_anti")
      graft.core.io.Writer.writeBucketed(survivors,
        s"${idx.shinglesTable}_vac", Seq("doc_id"), idx.numBuckets)
      spark.sql(s"DROP TABLE ${idx.shinglesTable}")
      spark.sql(s"ALTER TABLE ${idx.shinglesTable}_vac RENAME TO ${idx.shinglesTable}")
      // the re-run must NOT read the scrubbed shingles as "nothing to
      // do": the buckets table still holds the forgotten docs' band
      // hashes (a derivable content signature)
      assert(Dedup.compactNearDupIndex(spark, "ndx8") == 2L)
      assert(!spark.catalog.tableExists(idx.tombstonesTable))
      val bkIds = spark.table(idx.bucketsTable)
        .select("doc_id").distinct().as[Long].collect().toSet
      assert(!bkIds.contains(5L) && !bkIds.contains(9L),
        "forgotten docs' bucket rows survived the resumed compact")
      assert(bkIds.size == 18)
    } finally dropIndex("ndx8")
  }

  test("appending a tombstoned id fails loudly until compact") {
    dropIndex("ndx7")
    val corpus = Seq((10L, base), (11L, fresh)).toDF("doc_id", "text")
    val idx = Dedup.writeNearDupIndex(corpus, "doc_id", "text", "ndx7")
    try {
      assert(Dedup.vacuumNearDupIndex(spark, "ndx7",
        Seq(10L).toDF("doc_id")) == 1L)
      val e = intercept[IllegalArgumentException] {
        Dedup.appendToNearDupIndex(idx,
          Seq((10L, base + " resubmitted")).toDF("doc_id", "text"),
          "doc_id", "text")
      }
      assert(e.getMessage.contains("tombstoned"))
      // fresh ids still append fine while tombstones exist
      Dedup.appendToNearDupIndex(idx,
        Seq((30L, fresh + " thirty")).toDF("doc_id", "text"),
        "doc_id", "text")
      // and after compact the forgotten id may return
      Dedup.compactNearDupIndex(spark, "ndx7")
      Dedup.appendToNearDupIndex(idx,
        Seq((10L, base + " resubmitted")).toDF("doc_id", "text"),
        "doc_id", "text")
      val ids = spark.table(idx.shinglesTable)
        .select("doc_id").distinct().as[Long].collect().toSet
      assert(ids == Set(10L, 11L, 30L))
    } finally dropIndex("ndx7")
  }
}

/** A fresh session's in-memory catalog forgets managed tables but their
  * warehouse files survive — writeBucketed(Overwrite) must replace such
  * an orphaned location instead of failing LOCATION_ALREADY_EXISTS
  * (exactly what a re-run of Verify in the same workspace hits).
  */
class OrphanedWarehouseSpec extends SparkSpec {
  import spark.implicits._

  test("writeBucketed Overwrite replaces an orphaned warehouse location") {
    val name = "orphan_tbl"
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val loc = new org.apache.hadoop.fs.Path(
      org.apache.spark.sql.GraftSqlBridge.defaultTablePath(spark, name))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(loc)
    fs.create(new org.apache.hadoop.fs.Path(loc, "junk.parquet")).close()
    try {
      graft.core.io.Writer.writeBucketed(
        Seq((1L, "a"), (2L, "b")).toDF("id", "v"), name, Seq("id"), 4)
      assert(spark.table(name).count() == 2)
    } finally spark.sql(s"DROP TABLE IF EXISTS $name"): Unit
  }
}

/** The index append paths materialize via Checkpoints.truncate: RELIABLE
  * checkpoints when a dir is configured (executor loss on a cluster drops
  * localCheckpoint blocks mid-ingest), reclaimable by the caller once the
  * accepted batch is consumed.
  */
class IndexAppendCheckpointSpec extends SparkSpec {
  import spark.implicits._

  test("index-append materialization is a reliable, caller-cleanable checkpoint") {
    val dir = java.nio.file.Files.createTempDirectory("graft-idx-ckpt")
    spark.sparkContext.setCheckpointDir(dir.toString)
    spark.sql("DROP TABLE IF EXISTS ckfx_fps")
    val corpus = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    val delta = Seq((2L, "gamma delta")).toDF("doc_id", "text")
    val idx = Dedup.writeFingerprintIndex(corpus, "text", "ckfx")
    try {
      val accepted = Dedup.dropExactDuplicatesAgainst(idx, delta, "doc_id",
        "text", appendAccepted = true)
      assert(accepted.select("doc_id").as[Long].collect().toSet == Set(2L))
      // a reliable checkpoint backs the returned frame...
      val ckpt = graft.core.Checkpoints.pathOf(accepted)
      assert(ckpt.isDefined, "expected a reliable checkpoint under the " +
        "configured dir, found none (localCheckpoint used?)")
      val fs = ckpt.get.getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(fs.exists(ckpt.get))
      // ...and the caller can reclaim it once the batch is consumed
      graft.core.Checkpoints.delete(spark.sparkContext, ckpt)
      assert(!fs.exists(ckpt.get), "superseded checkpoint not cleaned")
    } finally {
      spark.sql("DROP TABLE IF EXISTS ckfx_fps"): Unit
    }
  }
}

/** The exact-dup complement: persisted fingerprint index for incremental
  * exact dedup — reference equivalence, zero-exchange anti-join on the
  * bucketed corpus side, append round-trip.
  */
class FingerprintIndexSpec extends SparkSpec {
  import spark.implicits._

  private def dropIdx(name: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS ${name}_fps"): Unit

  test("incremental exact dedup: keep-first, corpus drop, append, plan shape") {
    dropIdx("fpx1")
    val corpus = Seq((2L, "alpha beta"), (4L, "gamma delta"))
      .toDF("doc_id", "text")
    val delta = Seq(
      (11L, "alpha  beta"),  // normalizes to corpus doc 2 → drops
      (13L, "epsilon zeta"), // fresh → survives
      (15L, "epsilon zeta"), // exact copy of 13 within delta → drops
      (17L, "eta theta")     // fresh → survives
    ).toDF("doc_id", "text")
    val idx = Dedup.writeFingerprintIndex(corpus, "text", "fpx1")
    try {
      val accepted = Dedup.dropExactDuplicatesAgainst(idx, delta, "doc_id",
        "text", appendAccepted = true)
      assert(accepted.select("doc_id").as[Long].collect().toSet == Set(13L, 17L))
      // grown index: a replay of the same delta drops every row
      val replay = Dedup.dropExactDuplicatesAgainst(idx, delta, "doc_id", "text")
      assert(replay.isEmpty, "replayed delta must be fully dropped")
      // a re-opened handle reads the true bucket count from the catalog
      val loaded = Dedup.loadFingerprintIndex(spark, "fpx1")
      assert(loaded == idx, s"catalog round-trip drifted: $loaded vs $idx")
      intercept[IllegalArgumentException] {
        Dedup.loadFingerprintIndex(spark, "no_such_index")
      }
      // plan shape: the bucketed corpus side feeds the anti-join unshuffled
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val df = Dedup.dropExactDuplicatesAgainst(idx, delta, "doc_id", "text")
        val plan = df.queryExecution.executedPlan match {
          case a: AdaptiveSparkPlanExec => a.executedPlan
          case p => p
        }
        val smjs = plan.collect { case j: SortMergeJoinExec => j }
        assert(smjs.exists(j => Seq(j.left, j.right).exists(s =>
            s.toString.contains("fpx1_fps") &&
            s.collect { case e: ShuffleExchangeLike => e }.isEmpty)),
          s"corpus fingerprints shuffled before the anti-join:\n$plan")
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    } finally dropIdx("fpx1")
  }

  private def dropIdxFull(name: String): Unit =
    Seq("_fps", "_fps_tombstones", "_fps_vac", "_fps_tombstones_vac")
      .foreach(s => spark.sql(s"DROP TABLE IF EXISTS $name$s"))

  private def tableStamps(table: String): Map[String, (Long, Long)] = {
    val loc = new java.net.URI(spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
      .location.toString).getPath
    new java.io.File(loc).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_"))
      .map(f => f.getName -> (f.length(), f.lastModified())).toMap
  }

  test("fingerprint vacuum: tombstone append, identical content accepted " +
      "again, re-ingest clears the tombstone, compact scrubs") {
    dropIdxFull("fpx2")
    val corpus = Seq((2L, "alpha beta"), (4L, "gamma delta"))
      .toDF("doc_id", "text")
    val idx = Dedup.writeFingerprintIndex(corpus, "text", "fpx2")
    try {
      val resubmit = Seq((30L, "alpha  beta")).toDF("doc_id", "text")
      // guarded before the vacuum
      assert(Dedup.dropExactDuplicatesAgainst(idx, resubmit, "doc_id",
        "text").isEmpty)
      val before = tableStamps(idx.fpsTable)
      assert(Dedup.vacuumFingerprintIndex(spark, "fpx2",
        Seq((2L, "alpha beta")).toDF("doc_id", "text"), "text") == 1L)
      // ~deleted-rows cost: index files untouched, content accepted again
      assert(tableStamps(idx.fpsTable) == before)
      // re-vacuum and unknown-content vacuum are no-ops
      assert(Dedup.vacuumFingerprintIndex(spark, "fpx2",
        Seq((2L, "alpha beta")).toDF("doc_id", "text"), "text") == 0L)
      assert(Dedup.vacuumFingerprintIndex(spark, "fpx2",
        Seq((9L, "never indexed")).toDF("doc_id", "text"), "text") == 0L)
      val accepted = Dedup.dropExactDuplicatesAgainst(idx, resubmit,
        "doc_id", "text", appendAccepted = true)
      assert(accepted.select("doc_id").as[Long].collect().toSet == Set(30L))
      // the append cleared the tombstone: the content guards again...
      assert(Dedup.dropExactDuplicatesAgainst(idx, resubmit, "doc_id",
        "text").isEmpty)
      assert(spark.table(idx.tombstonesTable).isEmpty)
      // ...and doc 4 was never affected
      assert(Dedup.dropExactDuplicatesAgainst(idx,
        Seq((40L, "gamma delta")).toDF("doc_id", "text"), "doc_id",
        "text").isEmpty)
      // compact with a live tombstone physically scrubs it
      assert(Dedup.vacuumFingerprintIndex(spark, "fpx2",
        Seq((4L, "gamma delta")).toDF("doc_id", "text"), "text") == 1L)
      assert(Dedup.compactFingerprintIndex(spark, "fpx2") == 1L)
      assert(!spark.catalog.tableExists(idx.tombstonesTable))
      assert(Dedup.dropExactDuplicatesAgainst(idx,
        Seq((41L, "gamma delta")).toDF("doc_id", "text"), "doc_id", "text")
        .select("doc_id").as[Long].collect().toSet == Set(41L))
      // crashed fps-table swap heals on the next vacuum
      spark.sql("ALTER TABLE fpx2_fps RENAME TO fpx2_fps_vac")
      assert(Dedup.vacuumFingerprintIndex(spark, "fpx2",
        Seq((9L, "never indexed")).toDF("doc_id", "text"), "text") == 0L)
      assert(spark.catalog.tableExists("fpx2_fps"))
      assert(!spark.catalog.tableExists("fpx2_fps_vac"))
    } finally dropIdxFull("fpx2")
  }
}
