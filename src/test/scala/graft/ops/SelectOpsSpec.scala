package graft.ops

import graft.SparkSpec
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Round-6 data-selection operators: dedup-grain canonicalization and
  * DSIR importance resampling. Fixtures pin the semantics; the DSIR
  * check holds the distributed plan to a driver-side reference
  * implementation of the same smoothed-LM arithmetic.
  */
class SelectOpsSpec extends SparkSpec {
  import spark.implicits._

  test("normalizeForDedup collapses case/punct/digit/whitespace variants only") {
    val rows = Seq(
      "Hello, World! 42 items",
      "hello world    7 items",          // same canonical form
      "HELLO -- WORLD ... 123456 ITEMS", // same canonical form
      "hello world item",                // different content
      "hello world 42 item"              // different content (no plural)
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val out = rows.toDF("id", "text")
      .select(col("id"), TextFunctions.normalizeForDedup(col("text")).as("n"))
      .as[(Long, String)].collect().toMap
    assert(out(0L) == "hello world 0 items")
    assert(out(1L) == out(0L) && out(2L) == out(0L))
    assert(out(3L) == "hello world item")
    assert(out(4L) == "hello world 0 item")
  }

  test("dedupExactNormalized keeps the min id per canonical group with copy counts") {
    val docs = Seq(
      (10L, "The cat; sat!  On 3 mats."),
      (7L, "the CAT sat on 99 mats"),   // same group -> keeper (min id)
      (3L, "a different document"),
      (5L, "A DIFFERENT document?!")    // same group as 3
    ).toDF("doc_id", "text")
    val out = Dedup.dedupExactNormalized(docs, "doc_id", "text")
      .select("doc_id", "n_copies").as[(Long, Long)].collect().toMap
    assert(out == Map(7L -> 2L, 3L -> 2L))
  }

  test("fitHashedLm is a full smoothed distribution over the bucket table") {
    val docs = Seq("alpha beta gamma beta", "alpha beta").toDF("text")
    val lm = Dsir.fitHashedLm(docs, "text", n = 2, buckets = 64)
    val rows = lm.select("bucket", "cnt", "logp_micro")
      .as[(Long, Long, Long)].collect()
    assert(rows.length == 64)
    assert(rows.map(_._2).sum == 4L) // 3 bigrams + 1 bigram
    // smoothed probs sum to ~1 over the full table
    val psum = rows.map(r => math.exp(r._3 / 1e6)).sum
    assert(math.abs(psum - 1.0) < 1e-3, s"prob mass $psum")
    // every unseen bucket carries the same floor logp
    val floors = rows.filter(_._2 == 0L).map(_._3).distinct
    assert(floors.length == 1)
  }

  test("importanceWeights match a driver-side reference and favor target-like docs") {
    val n = 2; val buckets = 128; val alpha = 1.0
    val target = Seq("quantum physics entangles quantum states",
      "quantum field theory states").toDF("text")
    val raw = Seq(
      (1L, "quantum physics entangles quantum states daily"),
      (2L, "the stock market closed lower on tuesday"),
      (3L, "x")  // under n tokens -> weight 0
    ).toDF("doc_id", "text")
    val tLm = Dsir.fitHashedLm(target, "text", n, buckets, alpha)
    val rLm = Dsir.fitHashedLm(raw, "text", n, buckets, alpha)
    val w = Dsir.importanceWeights(raw, "doc_id", "text", tLm, rLm, n, buckets)
      .orderBy("doc_id")
      .select("doc_id", "n_grams", "logw_micro")
      .as[(Long, Long, Long)].collect()

    // driver-side reference: same hash via the materialized LM tables
    val tMap = tLm.select("bucket", "logp_micro").as[(Long, Long)].collect().toMap
    val rMap = rLm.select("bucket", "logp_micro").as[(Long, Long)].collect().toMap
    val gramRows = raw.select(col("doc_id"),
        explode(Dsir.ngramBuckets(col("text"), n, buckets)).as("bucket"))
      .as[(Long, Long)].collect()
    val ref = gramRows.groupBy(_._1).view.mapValues(gs =>
      (gs.size.toLong, gs.map(g => tMap(g._2) - rMap(g._2)).sum)).toMap
    for ((id, ng, lw) <- w) {
      val (refNg, refLw) = ref.getOrElse(id, (0L, 0L))
      assert(ng == refNg && lw == refLw, s"doc $id: ($ng,$lw) vs ref ($refNg,$refLw)")
    }
    val byId = w.map(r => r._1 -> r._3).toMap
    assert(byId(1L) > byId(2L), "target-like doc must outweigh off-domain doc")
    assert(byId(3L) == 0L, "sub-n-gram doc carries zero weight")
  }

  test("quality classifier separates classes; scoring matches the weight table exactly") {
    val buckets = 128
    val good = Seq.tabulate(40)(i =>
      (i.toLong, s"the committee published a detailed report on regional trade policy item $i", 1.0))
    val spam = Seq.tabulate(40)(i =>
      (1000L + i, s"click here buy now free offer best price deal $i !!!", 0.0))
    val labeled = (good ++ spam).toDF("doc_id", "text", "label")
    val weights = QualityClassifier.fitQualityModel(labeled, "text", "label",
      buckets = buckets)
    assert(weights.count() == buckets + 1) // full table + intercept row

    val scored = QualityClassifier.scoreDocs(labeled, "doc_id", "text",
      weights, buckets).select("doc_id", "n_tokens", "z_micro", "score")
      .as[(Long, Long, Long, Double)].collect()
    val byId = scored.map(r => r._1 -> r._4).toMap
    assert(good.forall(g => byId(g._1) > 0.9), "good docs must score high")
    assert(spam.forall(s => byId(s._1) < 0.1), "spam docs must score low")

    // the distributed logit is the exact integer sum over the weight table
    val wMap = weights.select("bucket", "w_micro").as[(Long, Long)]
      .collect().toMap
    val bux = labeled.select(col("doc_id"),
        QualityClassifier.tokenBuckets(col("text"), buckets).as("b"))
      .as[(Long, Seq[Long])].collect()
    for ((id, bs) <- bux) {
      val refZ = bs.map(wMap).sum + wMap(-1L)
      val got = scored.find(_._1 == id).get
      assert(got._3 == refZ && got._2 == bs.length,
        s"doc $id: z ${got._3} vs ref $refZ")
    }

    // threshold pass keeps exactly the high scorers
    val kept = QualityClassifier.filterByQuality(labeled, "doc_id", "text",
        weights, buckets, tau = 0.5)
      .filter(col("kept")).select("doc_id").as[Long].collect().toSet
    assert(kept == good.map(_._1).toSet)
  }

  test("gumbelTopK is deterministic, ranked, and id-tie-broken") {
    val w = Seq.tabulate(50)(i => (i.toLong, 10L, i.toLong * 1000, i / 1e3))
      .toDF("doc_id", "n_grams", "logw_micro", "log_w")
    val a = Dsir.gumbelTopK(w, "doc_id", k = 10, salt = "s")
      .select("doc_id", "rank").as[(Long, Int)].collect()
    val b = Dsir.gumbelTopK(w, "doc_id", k = 10, salt = "s")
      .select("doc_id", "rank").as[(Long, Int)].collect()
    assert(a.toSeq == b.toSeq)
    assert(a.map(_._2).toSeq == (1 to 10))
    // a different salt redraws the noise -> (almost surely) different set
    val c = Dsir.gumbelTopK(w, "doc_id", k = 10, salt = "other")
      .select("doc_id").as[Long].collect()
    assert(a.map(_._1).toSet != c.toSet)
  }

  test("epochMix replicates whole epochs and hash-selects the fraction") {
    val docs = (1L to 1000L).map(i => (i, if (i <= 600) "big" else "rare"))
      .toDF("id", "src")
    val out = Sampling.epochMix(docs, "id", "src",
      epochs = Seq("rare" -> 2.5, "big" -> 1.0), salt = "e1")
    val counts = out.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(counts("big") === 600L) // exactly 1 epoch
    // rare: 2 full copies each + ~50% get a third
    assert(counts("rare") >= 2 * 400 && counts("rare") <= 3 * 400)
    val frac = counts("rare") - 2 * 400
    assert(frac > 100 && frac < 300, s"~50% of 400 expected, got $frac")
    // epoch indexes are dense 0..n-1 per id
    val perId = out.filter(col("src") === "rare")
      .groupBy("id").agg(count(lit(1)).as("n"), max(col("epoch")).as("mx"))
      .as[(Long, Long, Long)].collect()
    assert(perId.forall { case (_, n, mx) => mx === n - 1 })
    // deterministic across reruns and partitionings
    val out2 = Sampling.epochMix(docs.repartition(7), "id", "src",
      epochs = Seq("rare" -> 2.5, "big" -> 1.0), salt = "e1")
      .select("id", "epoch").as[(Long, Long)].collect().toSet
    assert(out.select("id", "epoch").as[(Long, Long)].collect().toSet === out2)
  }

  test("epochMix drops zero-epoch groups and downsamples e < 1") {
    val docs = (1L to 400L).map(i => (i, if (i % 2 == 0) "drop" else "down"))
      .toDF("id", "src")
    val out = Sampling.epochMix(docs, "id", "src",
      epochs = Seq("drop" -> 0.0, "down" -> 0.25), salt = "e2")
      .groupBy("src").count().as[(String, Long)].collect().toMap
    assert(!out.contains("drop"))
    assert(out("down") > 20 && out("down") < 80, s"~25% of 200, got $out")
  }

  test("clusterSafeSplit keeps near-dup cluster members in one split") {
    // pairs chain 1-2-3 and 10-11; 20 is a singleton
    val docs = Seq(1L, 2L, 3L, 10L, 11L, 20L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a_id", "b_id")
    val out = Sampling.clusterSafeSplit(docs, pairs, "doc_id", "s",
      Seq("train" -> 0.5, "test" -> 0.5))
      .select("doc_id", "rep", "split")
      .as[(Long, Long, String)].collect().toSeq.sortBy(_._1)
    assert(out.map(_._2).toSeq === Seq(1L, 1L, 1L, 10L, 10L, 20L))
    val splits = out.map(r => r._1 -> r._3).toMap
    assert(splits(1L) === splits(2L) && splits(2L) === splits(3L))
    assert(splits(10L) === splits(11L))
  }
}
