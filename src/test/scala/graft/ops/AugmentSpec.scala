package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[TextAnalysis.wordDropout]] — reproducible positional dropout. */
class WordDropoutSpec extends SparkSpec {
  import spark.implicits._

  test("same (doc, rate, salt) always drops the same words; order survives") {
    val df = Seq((1L, "a b c d e f g h i j k l m n o p")).toDF("doc_id", "text")
    val a = TextAnalysis.wordDropout(df, "doc_id", "text", 0.5, "s").head()
    val b = TextAnalysis.wordDropout(df, "doc_id", "text", 0.5, "s").head()
    assert(a.getAs[String]("text_out") === b.getAs[String]("text_out"))
    assert(a.getAs[Long]("n_tokens") === 16L)
    // kept tokens preserve original relative order
    val kept = a.getAs[String]("text_out").split(" ").filter(_.nonEmpty)
    val orig = "a b c d e f g h i j k l m n o p".split(" ")
    assert(kept.toSeq === orig.filter(kept.contains(_)).toSeq)
    assert(a.getAs[Long]("n_kept") === kept.length.toLong)
  }

  test("rate 0 keeps everything; salt changes the mask") {
    val df = Seq((7L, "x y z w v u t s r q")).toDF("doc_id", "text")
    val zero = TextAnalysis.wordDropout(df, "doc_id", "text", 0.0, "s").head()
    assert(zero.getAs[String]("text_out") === "x y z w v u t s r q")
    val s1 = TextAnalysis.wordDropout(df, "doc_id", "text", 0.5, "salt1").head()
    val s2 = TextAnalysis.wordDropout(df, "doc_id", "text", 0.5, "salt2").head()
    assert(s1.getAs[String]("text_out") !== s2.getAs[String]("text_out"))
  }

  test("position matters: a repeated token can drop at one spot and stay at another") {
    // with enough repeats of the same token, a 0.5 mask virtually always
    // splits them — which proves the hash is positional, not content-only
    val df = Seq((3L, Seq.fill(40)("tok").mkString(" "))).toDF("doc_id", "text")
    val r = TextAnalysis.wordDropout(df, "doc_id", "text", 0.5, "s").head()
    assert(r.getAs[Long]("n_kept") > 0L)
    assert(r.getAs[Long]("n_kept") < 40L)
  }

  test("dropout rate lands near nominal on a long stream") {
    val text = (1 to 2000).map(i => s"w$i").mkString(" ")
    val df = Seq((9L, text)).toDF("doc_id", "text")
    val r = TextAnalysis.wordDropout(df, "doc_id", "text", 0.2, "s").head()
    val dropped = r.getAs[Long]("n_tokens") - r.getAs[Long]("n_kept")
    assert(dropped > 300 && dropped < 500, s"dropped $dropped of 2000 at rate 0.2")
  }
}

/** [[TextAnalysis.pmiPairs]] / [[TextAnalysis.tokenEntropy]] —
  * collocations and distribution stats on planted corpora.
  */
class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  test("a true collocation outranks a chance pairing at equal support") {
    // "san francisco" always adjacent; "the end" co-occurs as often but
    // both words are everywhere, so independence explains it.
    val rows = Seq.fill(6)("san francisco is the end of the bay the end") ++
      Seq.fill(6)("the cat saw the dog near the end of the day") :+
      "rare pairing here"
    val df = rows.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val out = TextAnalysis.pmiPairs(df, "text", minCount = 5L, k = 50)
      .collect()
    val pmi = out.map(r => (r.getAs[String]("a"), r.getAs[String]("b"))
      -> r.getAs[Long]("pmi_micro")).toMap
    assert(pmi(("san", "francisco")) > pmi(("the", "end")))
    // min support: the once-off pair never appears
    assert(!pmi.contains(("rare", "pairing")))
  }

  test("trending terms compare against the previous OBSERVED day and gate support") {
    val df = Seq(
      // "surge" 5x on day1, 15x on day3 (day2 absent -> lag skips to day1)
      (1L, "2024-01-01", ("surge " * 5).trim),
      (2L, "2024-01-03", ("surge " * 15).trim),
      // "steady" 10x each day: growth 1.0
      (3L, "2024-01-01", ("steady " * 10).trim),
      (4L, "2024-01-03", ("steady " * 10).trim),
      // "rare" 1x -> 4x: below min support, absent
      (5L, "2024-01-01", "rare"),
      (6L, "2024-01-03", "rare rare rare rare"))
      .toDF("doc_id", "day", "text")
    val out = TextAnalysis.trendingTerms(df, "text", "day",
        minCount = 5L, k = 10)
      .collect()
    val g = out.map(r => r.getAs[String]("term") ->
      (r.getAs[String]("prev_day"), r.getAs[Long]("growth_micro"))).toMap
    assert(g("surge") === (("2024-01-01", 3000000L)))
    assert(g("steady")._2 === 1000000L)
    assert(!g.contains("rare"))
    assert(out.head.getAs[String]("term") === "surge")
  }

  test("entropy separates diverse prose from a repeated token; ttr is exact") {
    val df = Seq(
      (1L, "a b c d e f g h"),       // 8 distinct of 8: max entropy ln(8)
      (2L, "x x x x x x x x"),       // 1 distinct: entropy 0
      (3L, "a a b b")                // H = ln 2
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tokenEntropy(df, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_distinct"),
          r.getAs[Long]("ttr_micro"), r.getAs[Long]("entropy_micro"))).toMap
    assert(out(1L) === ((8L, 8L, 1000000L, 2079440L)))  // 8 * (1/8)ln8 rounded per-term
    assert(out(2L) === ((8L, 1L, 125000L, 0L)))
    assert(out(3L)._4 === 693148L)                      // 2 * round(.5 ln 2)
  }
}

/** [[Sampling.temporalSplit]] — microsecond-exact leakage boundaries. */
class TemporalSplitSpec extends SparkSpec {
  import spark.implicits._

  test("strict boundaries: cutoff row embargoes, embargo end tests") {
    val df = Seq(
      (1L, "2024-01-09 23:59:59.999999"),  // last train microsecond
      (2L, "2024-01-10 00:00:00"),         // exactly cutoff: embargo
      (3L, "2024-01-10 23:59:59.999999"),  // last embargo microsecond
      (4L, "2024-01-11 00:00:00"),         // exactly cutoff+86400s: test
      (5L, "2024-02-01 12:00:00"))
      .toDF("id", "ts_s").withColumn("ts", to_timestamp(col("ts_s")))
    val out = Sampling.temporalSplit(df, "ts", "2024-01-10 00:00:00",
        embargoSeconds = 86400L)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("split")).toMap
    assert(out === Map(1L -> "train", 2L -> "embargo", 3L -> "embargo",
      4L -> "test", 5L -> "test"))
  }

  test("zero embargo degenerates to a two-way split") {
    val df = Seq((1L, "2024-01-09 00:00:00"), (2L, "2024-01-10 00:00:00"))
      .toDF("id", "ts_s").withColumn("ts", to_timestamp(col("ts_s")))
    val out = Sampling.temporalSplit(df, "ts", "2024-01-10 00:00:00")
      .collect().map(_.getAs[String]("split")).sorted
    assert(out.toSeq === Seq("test", "train"))
  }
}

/** [[Layout.stableIds]] — global ranks without the one-task window. */
class StableIdsSpec extends SparkSpec {
  import spark.implicits._

  test("ordinals are the contiguous global sort rank") {
    val df = (1L to 500L).map(i => (i * 7 % 501, s"v$i")).toDF("k", "v")
    val out = Layout.stableIds(df, Seq("k"), partitions = Some(7))
      .orderBy("ordinal").collect()
    assert(out.map(_.getAs[Long]("ordinal")).toSeq === (0L until 500L))
    assert(out.map(_.getAs[Long]("k")).toSeq === out.map(_.getAs[Long]("k")).sorted.toSeq)
  }

  test("the mapping is a pure function of the data, not the partitioning") {
    val df = (1L to 300L).map(i => (i, i % 13)).toDF("id", "grp")
    val a = Layout.stableIds(df.repartition(3), Seq("id"), partitions = Some(4))
      .select("id", "ordinal").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Layout.stableIds(df.repartition(17), Seq("id"), partitions = Some(11))
      .select("id", "ordinal").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a === b)
  }

  test("composite keys give the lexicographic rank") {
    val df = Seq((2L, 1L), (1L, 2L), (1L, 1L), (2L, 0L)).toDF("a", "b")
    val out = Layout.stableIds(df, Seq("a", "b"), partitions = Some(2))
      .orderBy("ordinal").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((1L, 1L), (1L, 2L), (2L, 0L), (2L, 1L)))
  }
}

/** [[Dedup.fuzzyKeyPairs]] — blocked edit-distance entity matching. */
class FuzzyKeySpec extends SparkSpec {
  import spark.implicits._

  test("typos match; different names don't; prefix blocking bound holds") {
    val df = Seq(
      (1L, "acme widgets inc"),
      (2L, "acme widgetz inc"),     // 1 substitution
      (3L, "acme widgets incorp"),  // 4 inserts: beyond distance 2
      (4L, "zcme widgets inc"))     // typo INSIDE the 4-char prefix: blocked away
      .toDF("id", "name")
    val pairs = Dedup.fuzzyKeyPairs(df, "id", "name", maxDistance = 2)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")))
    assert(pairs.toSeq === Seq((1L, 2L)))
  }

  test("adjacent length buckets pair regardless of which side has the smaller id") {
    // maxDistance 1 -> bucket width 2. "abcdefgh" (len 8, bucket 4) and
    // "abcdefghi" (len 9, bucket 4)... force a boundary: len 9 vs len 10
    // (buckets 4 and 5). Give the LARGER bucket the SMALLER id — the
    // case the one-directional probe must still find.
    val df = Seq(
      (1L, "abcdefghij"),  // len 10, bucket 5, smaller id
      (2L, "abcdefghi"))   // len 9, bucket 4
      .toDF("id", "name")
    val pairs = Dedup.fuzzyKeyPairs(df, "id", "name", maxDistance = 1)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")))
    assert(pairs.toSeq === Seq((1L, 2L)))
  }

  test("oversized blocks are skipped deterministically; keep-first drops larger ids") {
    val crowd = (1L to 30L).map(i => (i, "same name"))
    val out = Dedup.fuzzyKeyPairs(crowd.toDF("id", "name"), "id", "name",
      maxDistance = 1, maxBlockSize = 10L)
    assert(out.count() === 0L) // block of 30 > cap: skipped, not exploded
    val ok = Dedup.dropFuzzyKeyDuplicates(crowd.toDF("id", "name"),
      "id", "name", maxDistance = 1, maxBlockSize = 100L)
    assert(ok.collect().map(_.getAs[Long]("id")).toSeq === Seq(1L))
  }
}

/** [[Search.hardNegatives]] — the lexical-close/semantic-far flag. */
class HardNegativesSpec extends SparkSpec {
  import spark.implicits._

  test("flags low-cosine pairs and passes high-cosine ones through") {
    val pairs = Seq((1L, 2L, 1), (1L, 3L, 2)).toDF("query_id", "doc_id", "rank")
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(1.0f, 0.05f)),   // nearly parallel: cos ~ 1
      (3L, Array(0.0f, 1.0f)))    // orthogonal: cos = 0
      .toDF("vec_id", "embedding")
    val out = Search.hardNegatives(pairs, emb, cosThresholdMicro = 300000L)
      .orderBy("rank").collect()
    assert(!out(0).getAs[Boolean]("is_hard_negative"))
    assert(out(0).getAs[Long]("cos_micro") > 900000L)
    assert(out(1).getAs[Boolean]("is_hard_negative"))
    assert(out(1).getAs[Long]("cos_micro") === 0L)
    // extra pair columns ride through
    assert(out(0).getAs[Int]("rank") === 1)
  }
}
