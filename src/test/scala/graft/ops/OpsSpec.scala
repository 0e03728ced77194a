package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChecksSpec extends SparkSpec {
  import spark.implicits._

  test("pkIsUnique detects duplicates") {
    val df = Seq((1, "a"), (1, "b"), (2, "a")).toDF("k1", "k2")
    assert(Checks.pkIsUnique(df, Seq("k1", "k2")))
    assert(!Checks.pkIsUnique(df, Seq("k1")))
  }

  test("nonUniquePks returns only duplicated keys with counts") {
    val df = Seq((1, "a"), (1, "b"), (2, "c")).toDF("k", "v")
    val out = Checks.nonUniquePks(df, Seq("k")).collect()
    assert(out.length == 2 && out.forall(_.getAs[Long]("_count_pk") == 2L))
  }

  test("piiProfile scans only string columns and counts per pattern") {
    val df = Seq(
      (1L, "mail me a@b.com", "clean"),
      (2L, "call +1 555 010 9999 now", "x@y.org"),
      (3L, "server 10.0.0.1 up", "clean"),
      (4L, "nothing here", "clean")).toDF("id", "notes", "aux")
    val out = Checks.piiProfile(df).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_hits"), r.getAs[Long]("n_rows"))).toMap
    // 2 string cols x 3 patterns; the bigint id column is not scanned
    assert(out.size == 6 && !out.keys.exists(_._1 == "id"))
    assert(out(("notes", "email")) == ((1L, 4L)))
    assert(out(("notes", "phone")) == ((1L, 4L)))
    assert(out(("notes", "ipv4")) == ((1L, 4L)))
    assert(out(("aux", "email")) == ((1L, 4L)))
    assert(out(("aux", "phone")) == ((0L, 4L)))
    // all-numeric frame fails loudly instead of returning nothing
    intercept[IllegalArgumentException] {
      Checks.piiProfile(Seq((1L, 2L)).toDF("a", "b"))
    }
  }

  test("schemaContract reports drift; enforceContract gates on it") {
    val df = Seq((1L, "x", 2.5)).toDF("id", "name", "score")
    // clean contract: empty report, enforce passes df through
    assert(Checks.schemaContract(df,
      "id BIGINT, name STRING, score DOUBLE").count() == 0)
    assert(Checks.enforceContract(df,
      "id BIGINT, name STRING, score DOUBLE").collect().length == 1)
    // allowExtra suppresses only the extra class
    val r = Checks.schemaContract(df, "id BIGINT, name STRING",
        allowExtra = true)
    assert(r.count() == 0)
    val strict = Checks.schemaContract(df, "id BIGINT, name STRING")
      .collect().map(x => (x.getString(0), x.getString(1))).toSet
    assert(strict == Set(("score", "extra")))
    val err = intercept[IllegalArgumentException] {
      Checks.enforceContract(df, "id INT, missing_col STRING",
        allowExtra = true)
    }
    assert(err.getMessage.contains("type_mismatch") &&
      err.getMessage.contains("missing_col"))
  }
}

class CompareSpec extends SparkSpec {
  import spark.implicits._

  test("exactSummary reports multiset differences") {
    val l = Seq(1, 2, 2, 3).toDF("x")
    val r = Seq(2, 3, 4).toDF("x")
    val m = Compare.exactSummary(l, r).collect()
      .map(row => row.getString(0) -> row.getLong(1)).toMap
    assert(m == Map("only_left" -> 2L, "only_right" -> 1L,
      "rows_left" -> 4L, "rows_right" -> 3L))
  }

  test("fuzzyRows statuses: match, delta, only-left/right, zero case") {
    val l = Seq((1, 100.0), (2, 0.0), (3, 50.0), (4, 10.0)).toDF("id", "v")
    val r = Seq((1, 100.000001), (2, 0.1), (3, 60.0), (5, 1.0)).toDF("id", "v")
    val rows = Compare.fuzzyRows(l, r, Seq("id"), Seq("v"), thresholdPct = 0.01).collect()
    val m = rows.map(row => row.getInt(0) -> row.getString(1)).toMap
    assert(m == Map(1 -> "match", 2 -> "delta_exceeds", 3 -> "delta_exceeds",
      4 -> "only_left", 5 -> "only_right"))
    // per-column verdicts: present for both-sided rows, null otherwise
    val byId = rows.map(r => r.getInt(0) -> r).toMap
    assert(byId(1).getAs[Boolean]("v_match") && !byId(3).getAs[Boolean]("v_match"))
    assert(byId(4).isNullAt(byId(4).fieldIndex("v_match")))
    assert(byId(1).getAs[Boolean]("_no_deltas"))
  }
}

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  test("periodFilter keeps a single day") {
    val df = Seq("2024-01-01 05:00:00", "2024-01-02 00:00:00")
      .toDF("ts").select(col("ts").cast("timestamp").as("ts"))
    assert(Incremental.periodFilter(df, "ts", "2024-01-01").count() == 1)
  }

  test("minOfMaxFilter bounds by the slowest input") {
    val main = Seq("2024-01-01", "2024-01-05", "2024-01-09")
      .toDF("ts").select(col("ts").cast("timestamp").as("ts"))
    val lagging = Seq("2024-01-06")
      .toDF("ts").select(col("ts").cast("timestamp").as("ts"))
    val out = Incremental.minOfMaxFilter(main, "ts",
      lit("2024-01-01").cast("timestamp"), Seq((main, "ts"), (lagging, "ts")))
    // (2024-01-01, 2024-01-06]: only 2024-01-05 qualifies
    assert(out.collect().map(_.getTimestamp(0).toString).toSeq ==
      Seq("2024-01-05 00:00:00.0"))
  }
}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),  // near-dup of 1
    (3L, "the quick brown fox jumps over the lazy dog"),  // exact dup of 1
    (4L, "completely different words entirely here now today")
  ).toDF("doc_id", "text")

  test("exactKeepFirst keeps lowest-ordered row per key deterministically") {
    val out = Dedup.exactKeepFirst(docs, Seq("text"), Seq(col("doc_id")))
      .select("doc_id").as[Long].collect().sorted
    assert(out.toSeq == Seq(1L, 2L, 4L))
  }

  test("jaccardPairs finds near and exact dups above threshold") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val ids = pairs.map(p => (p._1, p._2)).toSet
    assert(ids == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    val exact = pairs.find(p => (p._1, p._2) == (1L, 3L)).get
    assert(exact._3 == 1.0)
    // 7 shingles each, 6 shared between 1 and 2 -> 6/8 = 0.75
    val near = pairs.find(p => (p._1, p._2) == (1L, 2L)).get
    assert(near._3 == 0.75)
  }

  test("minhashLshPairs output is the verified subset of exact jaccard") {
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 0.5)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text", 0.5)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact))
    assert(lsh.contains((1L, 3L))) // identical docs always collide in every band
  }

  test("token-grain dedup: tokenizer-collapsed twins are identical, LSH " +
      "pairs are the verified subset of exact token jaccard") {
    val corpus = Seq(
      (10L, "the quick brown fox jumps over the lazy dog tonight"),
      // differs ONLY in case and run-length of spaces — the tokenizer
      // collapses both, so at BPE-piece grain this is an EXACT duplicate
      (11L, "The  QUICK brown   fox jumps over the LAZY dog tonight"),
      (12L, "the quick brown fox jumps over the lazy cat tonight"),
      (13L, "completely different words entirely here now today again")
    ).toDF("doc_id", "text")
    val merges = graft.ops.Bpe.mergesOf(
      graft.ops.Bpe.learn(corpus, "text", numMerges = 10))
    val exact = Dedup.jaccardPairsTokens(corpus, "doc_id", "text", merges,
        threshold = 0.5, n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val ids = exact.map(p => (p._1, p._2)).toSet
    assert(ids.contains((10L, 11L)) && ids.contains((10L, 12L)))
    assert(!ids.exists(p => p._1 == 13L || p._2 == 13L))
    assert(exact.find(p => (p._1, p._2) == ((10L, 11L))).get._3 == 1.0,
      "tokenizer-collapsed twin must score exactly 1.0 at token grain")
    // contrast: the WORD-grain path keeps the empty tokens a double
    // space mints, so its 10/11 shingles differ and the score is < 1 —
    // the tokenizer grain is what makes the twin exact
    val word = Dedup.jaccardPairs(corpus, "doc_id", "text", threshold = 0.5)
      .filter(col("a_id") === 10L && col("b_id") === 11L)
      .select("jaccard").collect()
    assert(word.isEmpty || word.head.getDouble(0) < 1.0)
    // LSH lane: verified subset of exact, twin found in every band
    val lsh = Dedup.minhashLshPairsTokens(corpus, "doc_id", "text", merges,
        threshold = 0.5, n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(lsh.map(p => (p._1, p._2)).toSet
      .subsetOf(exact.map(p => (p._1, p._2)).toSet))
    assert(lsh.find(p => (p._1, p._2) == ((10L, 11L))).exists(_._3 == 1.0),
      "identical piece sequences collide in every band")
    // scores agree pair-for-pair (verification is the same exact jaccard)
    val exactMap = exact.map(p => (p._1, p._2) -> p._3).toMap
    lsh.foreach(p => assert(exactMap((p._1, p._2)) == p._3))
  }

  test("simhash of identical docs is identical; pairs found at distance 0") {
    val out = Dedup.simhashPairs(docs, "doc_id", "text", maxDist = 0).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 3L)))
    assert(out.head.getInt(2) == 0)
  }

  test("maxShingleFreq cap: hot shingle in every doc, result identical to uncapped") {
    // One stop-shingle ("alpha beta gamma") lands in 100% of docs — the
    // unguarded inverted-index join would put all 102 docs on that one key
    // (quadratic within-key pairs); the cap excludes it from candidate
    // generation while the two planted exact dups still surface via their
    // rare tail shingles, with UNCHANGED jaccard scores (full-table sizes
    // and verification).
    val base = (1 to 100).map(i =>
      (i.toLong, s"alpha beta gamma unique$i token$i word$i filler$i"))
    val planted = Seq((201L, base(0)._2), (202L, base(5)._2))
    val corpus = (base ++ planted).toDF("doc_id", "text")
    def run(cap: Option[Int]) =
      Dedup.jaccardPairs(corpus, "doc_id", "text", threshold = 0.6,
          maxShingleFreq = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val uncapped = run(None)
    val capped = run(Some(10))
    assert(capped == uncapped)
    assert(capped == Set((1L, 201L, 1.0), (6L, 202L, 1.0)))
  }

  test("capped jaccardPairs leaves nothing in the block-manager cache") {
    // hot keys present -> the correction-join branch runs; the whole plan
    // must consume its candidate table once, with no persist left behind
    val base = (1 to 100).map(i =>
      (i.toLong, s"alpha beta gamma unique$i token$i word$i filler$i"))
    val corpus = (base ++ Seq((201L, base(0)._2))).toDF("doc_id", "text")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val out = Dedup.jaccardPairs(corpus, "doc_id", "text", threshold = 0.6,
      maxShingleFreq = Some(10)).collect()
    assert(out.nonEmpty)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked cached RDDs: $leaked")
  }

  test("exactKeepFirst is a partial-combining aggregate; desc orders fall back") {
    val df = Seq((1L, "a", 3L), (1L, "b", 1L), (1L, "c", 2L), (2L, "d", 9L))
      .toDF("k", "v", "o")
    val kept = Dedup.exactKeepFirst(df, Seq("k"), Seq(col("o")))
    assert(kept.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "b"), (2L, "d")))
    // the hot-key-safe plan: aggregation (map-side combine), no Window sort
    assert(!kept.queryExecution.executedPlan.toString.contains("Window"))
    // explicit sort direction can't nest in the aggregate -> window path
    val last = Dedup.exactKeepFirst(df, Seq("k"), Seq(col("o").desc))
    assert(last.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "a"), (2L, "d")))
  }

  test("connectedComponents writes reliable checkpoints when a dir is set") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt")
    spark.sparkContext.setCheckpointDir(dir.toString)
    // force the distributed star rounds — this test pins THEIR checkpoint
    // hygiene, which the small-graph fast path never exercises
    spark.conf.set("spark.graft.cc.localEdgeLimit", "0")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a_id", "b_id")
    val comp = try Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
      finally spark.conf.unset("spark.graft.cc.localEdgeLimit")
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // checkpoint FILES (not just the uuid subdir) landed under the dir...
    import scala.jdk.CollectionConverters._
    def walk[A](f: Iterator[java.nio.file.Path] => A): A = {
      val s = java.nio.file.Files.walk(dir)
      try f(s.iterator().asScala) finally s.close()
    }
    assert(walk(_.count(java.nio.file.Files.isRegularFile(_))) > 0,
      "no reliable checkpoint files were written")
    // ...and superseded rounds + the edges table were CLEANED: only the
    // returned labels' single rdd-* dir survives the call
    val rddDirs = walk(_.filter(p => java.nio.file.Files.isDirectory(p) &&
      p.getFileName.toString.startsWith("rdd-")).toSeq)
    assert(rddDirs.size == 1, s"expected exactly the final labels' " +
      s"checkpoint to remain, found: $rddDirs")
  }

  test("connectedComponents clusters pairs into min-labeled components") {
    // chain 1-2-3 (transitive, never a direct 1-3 pair), clique 10-11-12,
    // isolated pair 20-21 — all must resolve to their min id
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (10L, 12L), (11L, 12L),
      (20L, 21L)).toDF("a_id", "b_id")
    val comp = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("updateClusters folds new edges into standing labels at delta cost") {
    // wave 1: components {1,2,3} and {10,11}, plus a singleton label
    val labels = Dedup.connectedComponents(
        Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a_id", "b_id"))
      .unionByName(Seq((50L, 50L)).toDF("id", "comp"))
    // wave 2: a bridge merges the two components, one fresh pair, and a
    // brand-new node attaching to an old component
    val newPairs = Seq((3L, 10L), (20L, 21L), (60L, 1L)).toDF("a_id", "b_id")
    val merged = Dedup.updateClusters(labels, newPairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // must equal the full recompute over every edge ever seen, with the
    // untouched singleton carried through self-labeled
    val full = Dedup.connectedComponents(
        Seq((1L, 2L), (2L, 3L), (10L, 11L), (3L, 10L), (20L, 21L), (60L, 1L))
          .toDF("a_id", "b_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged == full + (50L -> 50L))
    assert(merged(11L) == 1L && merged(60L) == 1L)
  }

  test("connectedComponents converges on a 100-node path in O(log n) rounds") {
    // Path 0-1-2-...-99 — diameter 99. One-hop min-label propagation would
    // need 99 rounds; large-star/small-star contracts the remaining depth
    // geometrically, so maxIter = 10 suffices (and pins the O(log n) bound:
    // a diameter-many algorithm fails this test loudly).
    val pairs = (0L until 99L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    spark.conf.set("spark.graft.cc.localEdgeLimit", "0") // pin the DISTRIBUTED bound
    val comp = try Dedup.connectedComponents(pairs, maxIter = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
      finally spark.conf.unset("spark.graft.cc.localEdgeLimit")
    assert(comp.values.toSet == Set(0L) && comp.size == 100)
  }

  test("connectedComponents matches brute-force union-find on random graphs") {
    // randomized cross-check of the star-contraction rewrite: any shape
    // (chains, cliques, isolated pairs, self-loop-free random mix) must
    // agree with a driver-side union-find
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 4) {
      val n = 40
      val edges = Seq.fill(30)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(p => p._1 != p._2)
      val parent = collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val expected = nodes.map { v =>
        v -> nodes.filter(u => find(u) == find(v)).min
      }.toMap
      // BOTH paths must match the reference: the distributed star rounds
      // (limit 0) and the default small-graph union-find fast path
      spark.conf.set("spark.graft.cc.localEdgeLimit", "0")
      val distributed = try Dedup.connectedComponents(
          edges.toDF("a_id", "b_id"), maxIter = 12).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
        finally spark.conf.unset("spark.graft.cc.localEdgeLimit")
      assert(distributed == expected)
      val local = Dedup.connectedComponents(edges.toDF("a_id", "b_id"),
          maxIter = 12).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(local == expected)
    }
  }

  test("connectedComponents small-graph fast path leaves no checkpoint files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-local")
    spark.sparkContext.setCheckpointDir(dir.toString)
    val pairs = Seq((5L, 9L), (9L, 2L), (30L, 31L)).toDF("a_id", "b_id")
    val comp = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(2L -> 2L, 5L -> 2L, 9L -> 2L, 30L -> 30L, 31L -> 30L))
    // the fast path's one reliable checkpoint (the canonical edge set) is
    // deleted after the bounded collect — nothing may accumulate across
    // the per-batch streaming folds that hit this path every micro-batch
    import scala.jdk.CollectionConverters._
    val s = java.nio.file.Files.walk(dir)
    val rddDirs = try s.iterator().asScala
      .filter(p => java.nio.file.Files.isDirectory(p) &&
        p.getFileName.toString.startsWith("rdd-")).toSeq
      finally s.close()
    assert(rddDirs.isEmpty,
      s"fast path must clean its edge checkpoint, found: $rddDirs")
  }

  test("exactKeepFirst matches a driver-side reference on random data") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(120)((rnd.nextInt(10).toLong, rnd.nextInt(1000).toLong,
      rnd.nextInt(100)))
      // unique (k, o) keeps the declared order total — ties would make
      // both the operator and the reference legitimately arbitrary
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
    val df = rows.toDF("k", "o", "v")
    val expected = rows.groupBy(_._1).map { case (_, g) => g.minBy(_._2) }.toSet
    val got = Dedup.exactKeepFirst(df, Seq("k"), Seq(col("o"))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expected)
  }

  test("connectedComponents handles interleaved chains and high-id minima") {
    // Two chains whose ids interleave (7-5-3-1 and 2-4-6-8 linked as
    // given pairs in arbitrary a/b order) — exercises the greatest/least
    // canonicalization and min-id labeling with non-contiguous ids.
    val pairs = Seq((7L, 5L), (3L, 5L), (1L, 3L), (4L, 2L), (4L, 6L), (8L, 6L))
      .toDF("a_id", "b_id")
    val comp = Dedup.connectedComponents(pairs, maxIter = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 3L -> 1L, 5L -> 1L, 7L -> 1L,
      2L -> 2L, 4L -> 2L, 6L -> 2L, 8L -> 2L))
  }

  test("exactKeepFirst null order values sort first, matching the window path") {
    // struct-wrapped ordering compares fields nulls-first — identical to
    // the window's default asc_nulls_first, so the aggregate and window
    // implementations can never disagree on null handling
    val df = Seq((1L, Option.empty[String], "kept"), (1L, Some("a"), "dropped"),
      (2L, Some("z"), "only")).toDF("k", "ord", "tag")
    val agg = Dedup.exactKeepFirst(df, Seq("k"), Seq(col("ord")))
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(agg == Set((1L, "kept"), (2L, "only")))
    // and the window fallback (desc => nulls LAST by default) stays the
    // mirror image
    val desc = Dedup.exactKeepFirst(df, Seq("k"), Seq(col("ord").desc))
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(desc == Set((1L, "dropped"), (2L, "only")))
  }

  test("simhash maxBandFreq prunes hot bands; rare-band pairs survive") {
    // 6 identical boilerplate docs (every band hot) + one isolated
    // near-dup pair with rare bands
    val docs = ((1L to 6L).map(i => (i, "identical boilerplate text repeated "
      + "across the whole template corpus")) ++ Seq(
      (10L, "unique snowflake content entirely its own here"),
      (11L, "unique snowflake content entirely its own here")))
      .toDF("doc_id", "text")
    val uncapped = Dedup.simhashPairs(docs, "doc_id", "text")
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.contains((10L, 11L)) && uncapped.size > 1)
    val capped = Dedup.simhashPairs(docs, "doc_id", "text", maxBandFreq = Some(3))
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // boilerplate cluster (band freq 6 > 3) pruned; rare pair kept
    assert(capped == Set((10L, 11L)))
  }

  test("minhash maxBandFreq prunes hot buckets; rare-bucket pairs survive") {
    val docs = ((1L to 6L).map(i => (i, "identical boilerplate text repeated "
      + "across the whole template corpus")) ++ Seq(
      (10L, "unique snowflake content entirely its own here today"),
      (11L, "unique snowflake content entirely its own here today")))
      .toDF("doc_id", "text")
    val uncapped = Dedup.minhashLshPairs(docs, "doc_id", "text", threshold = 0.6)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.contains((10L, 11L)) && uncapped.size > 1)
    val capped = Dedup.minhashLshPairs(docs, "doc_id", "text", threshold = 0.6,
        maxBandFreq = Some(3))
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((10L, 11L)))
  }

  test("maxShingleFreq cap-vs-uncapped equality on the testdata corpus") {
    val corpus = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    def run(cap: Option[Int]) =
      Dedup.jaccardPairs(corpus, "doc_id", "text", threshold = 0.6,
          maxShingleFreq = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(run(Some(50)) == run(None))
  }
}

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("hashSplit is exhaustive, deterministic, and near the fractions") {
    val ids = (1L to 2000L).toDF("id")
    val split = Sampling.hashSplit(ids, "id", salt = "exp1",
      fractions = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 2000L)
    assert(math.abs(counts("train") - 1600L) < 100, s"train=${counts("train")}")
    assert(counts.keySet == Set("train", "val", "test"))
    // pure function of (salt, id): rerun identical, different salt differs
    val again = Sampling.hashSplit(ids, "id", "exp1",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(split.except(again).isEmpty && again.except(split).isEmpty)
    val other = Sampling.hashSplit(ids, "id", "exp2",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(!other.except(split).isEmpty)
  }

  test("hashSample keeps a stable deterministic subset") {
    val ids = (1L to 1000L).toDF("id")
    val s = Sampling.hashSample(ids, "id", "s", 0.25)
    val n = s.count()
    assert(math.abs(n - 250L) < 60, s"n=$n")
    assert(s.except(Sampling.hashSample(ids, "id", "s", 0.25)).isEmpty)
    // monotone: a bigger fraction is a superset of a smaller one
    assert(s.except(Sampling.hashSample(ids, "id", "s", 0.5)).isEmpty)
  }

  test("balancedDownsample equalizes classes to the min (or cap), " +
      "deterministically across partitionings") {
    val rows = (1L to 300L).map(i => (i, "big")) ++
      (301L to 400L).map(i => (i, "mid")) ++
      (401L to 440L).map(i => (i, "small"))
    val df = rows.toDF("id", "cls")
    val out = Sampling.balancedDownsample(df, "cls", "id")
    val counts = out.groupBy("cls").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("big" -> 40L, "mid" -> 40L, "small" -> 40L))
    // pure function of the id set: any partitioning picks the same rows
    val again = Sampling.balancedDownsample(df.repartition(13), "cls", "id")
    assert(out.select("id").except(again.select("id")).isEmpty &&
      again.select("id").except(out.select("id")).isEmpty)
    // explicit per-label cap, bounded by each class's size
    val capped = Sampling.balancedDownsample(df, "cls", "id",
        perLabel = Some(60L))
      .groupBy("cls").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(capped === Map("big" -> 60L, "mid" -> 60L, "small" -> 40L))
    // the keep cap is a LITERAL, so the rank filter must plan as a
    // WindowGroupLimit (per-partition per-label top-n below the
    // exchange) — with a Column cap a 90%-majority label would sort its
    // whole row set inside one window task at scale
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(800))
    val planCapped = Sampling.balancedDownsample(df, "cls", "id",
      perLabel = Some(60L)).queryExecution.executedPlan.toString
    assert(planCapped.contains("WindowGroupLimit"), planCapped.take(800))
  }
}

/** [[Similarity.embeddingDrift]] — planted centroid shifts on
  * hand-checkable vectors.
  */
class EmbeddingDriftSpec extends SparkSpec {
  import spark.implicits._

  test("identical snapshots score 1e6; an offset label drops; one-sided " +
      "labels report null cosine with live counts") {
    val ref = Seq(
      (1L, "a", Array(1.0f, 0.0f)), (2L, "a", Array(0.8f, 0.2f)),
      (3L, "b", Array(0.0f, 1.0f)),
      (4L, "gone", Array(0.5f, 0.5f))).toDF("id", "label", "emb")
    val sameOut = Similarity.embeddingDrift(ref, ref, "label", "emb")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("centroid_cos_micro"))
      .toMap
    assert(sameOut.values.toSet === Set(1000000L))
    val cur = Seq(
      (5L, "a", Array(1.0f, 0.0f)), (6L, "a", Array(0.8f, 0.2f)),
      (7L, "b", Array(1.0f, 0.0f)), // b rotated 90 degrees
      (8L, "new", Array(0.1f, 0.9f))).toDF("id", "label", "emb")
    val out = Similarity.embeddingDrift(ref, cur, "label", "emb")
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_ref"), r.getAs[Long]("n_cur"),
          Option(r.get(3)).map(_.asInstanceOf[Long])))).toMap
    assert(out("a")._3.contains(1000000L))
    assert(out("b")._3.exists(_ < 100000L), s"rotated label still close: $out")
    assert(out("gone") === ((1L, 0L, None)))
    assert(out("new") === ((0L, 1L, None)))
  }
}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("sampleFrames explodes every Nth frame with correct slicing") {
    // 150 bytes -> frames [0,64) [64,128) [128,150); every=2 keeps 0 and 2
    val payload = ("a" * 150).getBytes("UTF-8")
    val df = Seq((1L, payload), (2L, Array.emptyByteArray),
      (3L, null.asInstanceOf[Array[Byte]])).toDF("doc_id", "payload")
    val out = Multimodal.sampleFrames(df, "doc_id", "payload",
        frameSize = 64, every = 2)
      .orderBy("doc_id", "frame_idx").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 0L, 64L), (1L, 2L, 22L)))
    // frame md5 is of the SLICE, not the whole payload
    val md = java.security.MessageDigest.getInstance("MD5")
    val h0 = md.digest(("a" * 64).getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(0).getString(3) == h0)
  }

  private def hexBytes(h: String): Array[Byte] =
    h.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("imageMeta parses real PNG/GIF/JPEG headers and nulls the rest") {
    // real container headers, byte-for-byte per spec:
    // PNG 640x480; GIF89a 320x200 (little-endian); JPEG 48x32 with an
    // APP0 segment BEFORE the SOF0 (the marker scan must length-skip it)
    val png = hexBytes(
      "89504e470d0a1a0a 0000000d 49484452 00000280 000001e0 08 06 00 00 00 00000000")
    val gif = "GIF89a".getBytes("US-ASCII") ++ hexBytes("4001 c800 00 00 00")
    val jpeg = hexBytes(
      "ffd8 ffe00010 4a46494600 0101 00 0001 0001 00 00" +
        " ffc00011 08 0020 0030 03 012200 021101 031101 ffd9")
    val truncated = hexBytes("89504e470d0a1a0a 0000")
    val garbage = "not an image at all".getBytes("UTF-8")
    val df = Seq(
      (1L, png), (2L, gif), (3L, jpeg), (4L, truncated), (5L, garbage),
      (6L, null.asInstanceOf[Array[Byte]])).toDF("doc_id", "payload")
    val out = Multimodal.imageMeta(df, "payload")
      .select("doc_id", "format", "width", "height")
      .orderBy("doc_id").collect()
    def row(i: Int) = (out(i).getAs[String]("format"),
      if (out(i).isNullAt(2)) -1 else out(i).getInt(2),
      if (out(i).isNullAt(3)) -1 else out(i).getInt(3))
    assert(row(0) === (("png", 640, 480)))
    assert(row(1) === (("gif", 320, 200)))
    assert(row(2) === (("jpeg", 48, 32)))
    assert(out(3).isNullAt(1) && out(4).isNullAt(1) && out(5).isNullAt(1),
      "truncated/garbage/null payloads must yield null format, not a throw")
  }

  test("mediaMeta parses real WAV and MP4 headers, nulls the rest") {
    // canonical 16-bit PCM WAV header: mono, 8000 Hz, byteRate 16000,
    // data chunk of 32000 bytes -> exactly 2000 ms (data bytes omitted —
    // the header scan reads sizes, not samples)
    val wav = "RIFF".getBytes("US-ASCII") ++ hexBytes("247d0000") ++
      "WAVEfmt ".getBytes("US-ASCII") ++
      hexBytes("10000000 0100 0100 401f0000 803e0000 0200 1000") ++
      "data".getBytes("US-ASCII") ++ hexBytes("007d0000")
    // minimal BMFF: ftyp box then moov > mvhd v0, timescale 600,
    // duration 1500 units -> 2500 ms
    val mvhd = hexBytes("0000006c") ++ "mvhd".getBytes("US-ASCII") ++
      hexBytes("00" + "000000" + "00000000" + "00000000" +
        "00000258" + "000005dc") ++ Array.fill[Byte](0x6c - 8 - 20)(0)
    val moov = hexBytes("%08x".format(8 + mvhd.length)) ++
      "moov".getBytes("US-ASCII") ++ mvhd
    val ftyp = hexBytes("00000010") ++ "ftypisom".getBytes("US-ASCII") ++
      hexBytes("00000000")
    val mp4 = ftyp ++ moov
    val df = Seq((1L, wav), (2L, mp4),
      (3L, "garbage not a container".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val out = Multimodal.mediaMeta(df, "payload").orderBy("doc_id").collect()
    assert(out(0).getAs[String]("format") === "wav")
    assert(out(0).getAs[Long]("channels") === 1L)
    assert(out(0).getAs[Long]("sample_rate") === 8000L)
    assert(out(0).getAs[Long]("duration_ms") === 2000L)
    assert(out(1).getAs[String]("format") === "mp4")
    assert(out(1).isNullAt(out(1).fieldIndex("channels")))
    assert(out(1).getAs[Long]("duration_ms") === 2500L)
    assert(out(2).isNullAt(out(2).fieldIndex("format")))
  }

  test("mediaMeta is total on adversarial 32-bit size fields (no hang/throw)") {
    import graft.functions.MediaMeta
    // WAV chunk size 0xFFFFFFF8: .toInt = -8, so the pre-fix walk advanced
    // by ZERO — an infinite loop in a codegen'd expression. Must be null.
    val wavLoop = "RIFF".getBytes("US-ASCII") ++ hexBytes("247d0000") ++
      "WAVE".getBytes("US-ASCII") ++
      "junk".getBytes("US-ASCII") ++ hexBytes("f8ffffff") ++
      Array.fill[Byte](16)(0)
    assert(MediaMeta.parse(wavLoop) == null)
    // top-level BMFF box size 0xFFFFFFF0: .toInt is negative — the pre-fix
    // walk went to a negative index. Must be null, not a throw.
    val mp4Neg = hexBytes("fffffff0") ++ "ftypisom".getBytes("US-ASCII") ++
      Array.fill[Byte](24)(0)
    assert(MediaMeta.parse(mp4Neg) == null)
    // moov child csize 0xFFFFFFF0 — same guard on the inner walk
    val child = hexBytes("fffffff0") ++ "trak".getBytes("US-ASCII") ++
      Array.fill[Byte](16)(0)
    val moovBad = hexBytes("%08x".format(8 + child.length)) ++
      "moov".getBytes("US-ASCII") ++ child
    assert(MediaMeta.parse(moovBad) == null)
    // a valid WAV whose LAST chunk size overruns the buffer still parses:
    // the loop exit (not the guard) handles benign truncation
    val wavOk = "RIFF".getBytes("US-ASCII") ++ hexBytes("247d0000") ++
      "WAVEfmt ".getBytes("US-ASCII") ++
      hexBytes("10000000 0100 0100 401f0000 803e0000 0200 1000") ++
      "data".getBytes("US-ASCII") ++ hexBytes("007d0000")
    assert(MediaMeta.parse(wavOk) != null)
  }

  test("imageMeta skips arbitrary JPEG APP segments (EXIF-sized)") {
    // 3000-byte APP1 blob between SOI and SOF0 — the scan must hop over
    // it via the segment length, not scan into it
    val app1Payload = Array.fill[Byte](2998)(0x41)
    val app1Len = 3000 // includes the 2 length bytes
    val jpeg = hexBytes("ffd8") ++
      hexBytes("ffe1") ++
      Array(((app1Len >> 8) & 0xff).toByte, (app1Len & 0xff).toByte) ++
      app1Payload ++
      hexBytes("ffc2 0011 08 0100 0200 03 012200 021101 031101 ffd9")
    val out = Multimodal.imageMeta(
        Seq((1L, jpeg)).toDF("doc_id", "payload"), "payload")
      .select("format", "width", "height").head()
    assert(out.getString(0) === "jpeg") // SOF2 (progressive) counts too
    assert(out.getInt(1) === 512 && out.getInt(2) === 256)
  }

  test("aHash: integer-exact bits, hand-checked pattern, clone stability") {
    // blocks=4 on an 8-byte payload: block sums (0+0, 255+255, 0+0,
    // 255+255), total mean 127.5 — bits 1 and 3 set, hash = 0b1010
    val hi = 0xff.toByte; val lo = 0x00.toByte
    val payload = Array(lo, lo, hi, hi, lo, lo, hi, hi)
    val one = Multimodal.aHash(Seq((1L, payload)).toDF("doc_id", "payload"),
      "doc_id", "payload", blocks = 4).select("simhash").head().getLong(0)
    assert(one === 10L)
    // a re-encoded copy (tiny byte perturbation) stays within hamming 3
    // of the original at 63 blocks — the property q213 pairs on
    val text = ("the quick brown fox jumps over the lazy dog " * 6).trim
    val a = text.getBytes("UTF-8")
    val b = (text + " .").getBytes("UTF-8")
    val fp = Multimodal.aHash(
      Seq((1L, a), (2L, b)).toDF("doc_id", "payload"), "doc_id", "payload")
      .orderBy("doc_id").collect().map(_.getLong(2))
    assert(java.lang.Long.bitCount(fp(0) ^ fp(1)) <= 3)
    // empty payload: no block has bytes, hash 0, n_bytes 0
    val z = Multimodal.aHash(
      Seq((3L, Array.empty[Byte])).toDF("doc_id", "payload"),
      "doc_id", "payload").head()
    assert(z.getLong(1) === 0L && z.getLong(2) === 0L)
  }
}

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("repetitionRatio separates clean prose from repeated boilerplate") {
    val docs = Seq(
      (1L, "every word here appears exactly once in this sentence"),
      (2L, "buy now buy now buy now buy now buy now"),
      (3L, "ab")  // shorter than one 3-gram
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionRatio(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Double]("rep_ratio") == 0.0)
    assert(out(1).getAs[Double]("rep_ratio") > 0.6)
    assert(out(2).getAs[Long]("n_ngrams") == 0L &&
      out(2).getAs[Double]("rep_ratio") == 0.0)
  }

  test("contaminationFlags marks docs sharing benchmark n-grams only") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "a completely unrelated document about maritime navigation routes"),
      (3L, "something else entirely with the quick brown fox jumps over the lazy dog inside")
    ).toDF("doc_id", "text")
    val bench = Seq((99L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.contaminationFlags(corpus, bench, "doc_id", "text",
        n = 8, minShared = 1)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getBoolean(2))).toSeq ==
      Seq((1L, true), (2L, false), (3L, true)))
  }

  test("fuzzyContamination catches near-matches exact n-grams miss") {
    val base = (1 to 30).map(i => s"w$i").mkString(" ")           // 30 tokens
    val paraphrased = base.replace("w15", "swapped") + " extra"    // ~0.8 jacc
    val corpus = Seq(
      (1L, base),                                                  // exact-ish hit
      (2L, paraphrased),                                           // fuzzy hit
      (3L, "a wholly different document about something unrelated entirely today")
    ).toDF("doc_id", "text")
    val ref = Seq((900L, base + " tail")).toDF("doc_id", "text")
    val pairs = TextAnalysis.fuzzyContamination(corpus, ref, "doc_id", "text",
        threshold = 0.5)
      .orderBy("doc_id").collect()
    assert(pairs.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(pairs.forall(_.getLong(1) == 900L))
    assert(pairs.forall(_.getDouble(2) >= 0.5))
    // the filter form drops exactly the flagged docs
    val kept = TextAnalysis.dropFuzzyContaminated(corpus, ref, "doc_id", "text",
      threshold = 0.5).select("doc_id").as[Long].collect().toSeq
    assert(kept == Seq(3L))
  }

  test("redactPii replaces emails and phone-like runs with tags") {
    val out = Seq("reach me at jane.doe+x@corp.example.org or +1 (555) 123-4567 ok")
      .toDF("t").select(TextAnalysis.redactPii(col("t"))).head().getString(0)
    assert(out == "reach me at <EMAIL> or <PHONE> ok")
  }

  test("langId scores stopword hits and predicts argmax with und fallback") {
    val docs = Seq(
      (1L, "the cat is on a mat of the king"),
      (2L, "der hund ist nicht ein tier und"),
      (3L, "zzz qqq www")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.langId(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getAs[String]("pred_lang") == "en")
    assert(out(1).getAs[String]("pred_lang") == "de")
    assert(out(2).getAs[String]("pred_lang") == "und")
  }

  test("qualityScore arithmetic on a known string") {
    val out = TextAnalysis.qualityScore(
      Seq((1L, "ab cd 12!")).toDF("doc_id", "text"), "doc_id", "text").head()
    assert(out.getAs[Long]("n_chars") == 9L)
    assert(out.getAs[Long]("n_tokens") == 3L)
    assert(out.getAs[Double]("punct_ratio") == math.rint(1.0 / 9 * 10000) / 10000)
    assert(out.getAs[Double]("digit_ratio") == math.rint(2.0 / 9 * 10000) / 10000)
  }
}
