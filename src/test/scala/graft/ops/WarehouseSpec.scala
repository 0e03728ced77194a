package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def dim = Seq(
    (1L, "A", "2022-01-01", "2023-01-01"), // closed history, passes through
    (1L, "A2", "2023-01-01", null),
    (2L, "B", "2023-01-01", null),
    (3L, "C", "2023-01-01", null)
  ).toDF("k", "attr", "valid_from", "valid_to")

  test("one merge exercises all four outcomes") {
    val snap = Seq(
      (1L, "A2"), // unchanged
      (2L, "X"),  // changed -> close + insert
      (4L, "N")   // new key -> insert
      // key 3 absent -> open row untouched
    ).toDF("k", "attr")
    val out = Scd.scd2Merge(dim, snap, Seq("k"), Seq("attr"), "2024-01-01")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getString(2), r.getString(3))).toSet
    assert(out == Set(
      (1L, "A", "2022-01-01", "2023-01-01"),
      (1L, "A2", "2023-01-01", null),
      (2L, "B", "2023-01-01", "2024-01-01"),
      (2L, "X", "2024-01-01", null),
      (3L, "C", "2023-01-01", null),
      (4L, "N", "2024-01-01", null)))
  }

  test("tracked comparison is null-safe") {
    val d = Seq((1L, null.asInstanceOf[String], "2023-01-01", null.asInstanceOf[String]),
      (2L, "B", "2023-01-01", null.asInstanceOf[String]))
      .toDF("k", "attr", "valid_from", "valid_to")
    val snap = Seq((1L, null.asInstanceOf[String]), // null == null: unchanged
      (2L, null.asInstanceOf[String]))              // B -> null: changed
      .toDF("k", "attr")
    val out = Scd.scd2Merge(d, snap, Seq("k"), Seq("attr"), "2024-01-01")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        r.getString(2), Option(r.getString(3)))).toSet
    assert(out == Set(
      (1L, None, "2023-01-01", None),
      (2L, Some("B"), "2023-01-01", Some("2024-01-01")),
      (2L, None, "2024-01-01", None)))
  }

  test("Scd2MergeJob adapts manifest params onto the operator") {
    val snap = Seq((2L, "X")).toDF("k", "attr")
    val out = new graft.jobs.Scd2MergeJob().transform(
      Map("dim" -> dim, "snapshot" -> snap), spark,
      Map("keys" -> "k", "tracked" -> "attr", "snapshot_date" -> "2024-01-01"))
    val rows = out.filter(col("k") === 2L).collect()
      .map(r => (r.getString(1), Option(r.getString(3)))).toSet
    assert(rows == Set(("B", Some("2024-01-01")), ("X", None)))
    intercept[RuntimeException] {
      new graft.jobs.Scd2MergeJob().transform(
        Map("dim" -> dim, "snapshot" -> snap), spark, Map("keys" -> "k"))
    }
  }

  test("composite keys merge on all key columns") {
    val d = Seq((1L, "us", "A", "2023-01-01", null.asInstanceOf[String]),
      (1L, "eu", "B", "2023-01-01", null.asInstanceOf[String]))
      .toDF("k", "region", "attr", "valid_from", "valid_to")
    val snap = Seq((1L, "us", "A2")).toDF("k", "region", "attr")
    val out = Scd.scd2Merge(d, snap, Seq("k", "region"), Seq("attr"), "2024-01-01")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        Option(r.getString(4)))).toSet
    // (1, us) closes + reopens; (1, eu) untouched despite the shared k
    assert(out == Set(
      (1L, "us", "A", Some("2024-01-01")),
      (1L, "us", "A2", None),
      (1L, "eu", "B", None)))
  }

  test("scd2Merge matches a driver-side reference on random dims and snapshots") {
    val rnd = new scala.util.Random(23)
    for (round <- 1 to 3) {
      val n = 30
      // open rows for a random subset of keys, closed history for another
      val openKeys = (0 until n).filter(_ => rnd.nextBoolean()).map(_.toLong)
      val open = openKeys.map(k => (k, s"v${rnd.nextInt(3)}", "2023-01-01",
        null.asInstanceOf[String]))
      val hist = (0 until n).filter(_ => rnd.nextInt(4) == 0)
        .map(k => (k.toLong, "old", "2022-01-01", "2023-01-01"))
      val snapRows = (0 until n + 5).filter(_ => rnd.nextBoolean())
        .map(k => (k.toLong, s"v${rnd.nextInt(3)}"))
      val d = (open ++ hist).toDF("k", "attr", "valid_from", "valid_to")
      val s = snapRows.toDF("k", "attr")

      val openMap = open.map(r => r._1 -> r._2).toMap
      val snapMap = snapRows.toMap
      val expected: Set[(Long, String, String, Option[String])] =
        (hist.map(h => (h._1, h._2, h._3, Option(h._4))) ++
          openMap.flatMap { case (k, a) => snapMap.get(k) match {
            case None => Seq((k, a, "2023-01-01", None))
            case Some(sa) if sa == a => Seq((k, a, "2023-01-01", None))
            case Some(sa) => Seq((k, a, "2023-01-01", Some("2024-01-01")),
              (k, sa, "2024-01-01", None))
          }} ++
          snapMap.collect { case (k, sa) if !openMap.contains(k) =>
            (k, sa, "2024-01-01", None) }).toSet
      val got = Scd.scd2Merge(d, s, Seq("k"), Seq("attr"), "2024-01-01")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
          Option(r.getString(3)))).toSet
      assert(got == expected, s"random round $round diverged")
    }
  }

  test("closeMissing treats absence as deletion; default keeps the row open") {
    val snap = Seq((1L, "A2")).toDF("k", "attr") // keys 2, 3 absent
    val out = Scd.scd2Merge(dim, snap, Seq("k"), Seq("attr"), "2024-01-01",
        closeMissing = true)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        Option(r.getString(3)))).toSet
    assert(out == Set(
      (1L, "A", "2022-01-01", Some("2023-01-01")),
      (1L, "A2", "2023-01-01", None),
      (2L, "B", "2023-01-01", Some("2024-01-01")),
      (3L, "C", "2023-01-01", Some("2024-01-01"))))
  }

  test("scd2FoldSnapshots replays dated snapshots; matches a driver-side reference") {
    val rnd = new scala.util.Random(31)
    for (closeMissing <- Seq(false, true)) {
      val n = 25
      val dim0rows = (0 until n).filter(_ => rnd.nextBoolean())
        .map(k => (k.toLong, s"v${rnd.nextInt(3)}", "2023-01-01",
          null.asInstanceOf[String]))
      val dim0 = dim0rows.toDF("k", "attr", "valid_from", "valid_to")
      val dates = Seq("2024-01-01", "2024-02-01", "2024-03-01")
      val snaps = dates.map(d => d -> (0 until n + 5)
        .filter(_ => rnd.nextBoolean()).map(k => (k.toLong, s"v${rnd.nextInt(3)}")))
      // driver-side reference fold over (open-rows map, closed history)
      var open = dim0rows.map(r => r._1 -> (r._2, r._3)).toMap
      val hist = scala.collection.mutable
        .ArrayBuffer.empty[(Long, String, String, Option[String])]
      for ((d, rows) <- snaps) {
        val snapMap = rows.toMap
        for ((k, a) <- rows) open.get(k) match {
          case None => open += k -> (a, d)
          case Some((ca, _)) if ca == a => ()
          case Some((ca, cf)) => hist += ((k, ca, cf, Some(d))); open += k -> (a, d)
        }
        if (closeMissing)
          for ((k, (ca, cf)) <- open if !snapMap.contains(k)) {
            hist += ((k, ca, cf, Some(d))); open -= k
          }
      }
      val expected = (hist ++ open.map { case (k, (a, f)) => (k, a, f, None) }).toSet
      val got = Scd.scd2FoldSnapshots(dim0,
          snaps.map { case (d, rows) => d -> rows.toDF("k", "attr") },
          Seq("k"), Seq("attr"), closeMissing = closeMissing)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
          Option(r.getString(3)))).toSet
      assert(got == expected, s"closeMissing=$closeMissing diverged")
    }
    // out-of-order replay is refused, not silently merged
    intercept[IllegalArgumentException] {
      Scd.scd2FoldSnapshots(dim,
        Seq("2024-02-01" -> dim.select("k", "attr"),
          "2024-01-01" -> dim.select("k", "attr")), Seq("k"), Seq("attr"))
    }
  }

  test("result is invariant to partitioning and a second merge is a no-op") {
    val snap = Seq((2L, "X"), (4L, "N")).toDF("k", "attr").repartition(7)
    val once = Scd.scd2Merge(dim.repartition(5), snap, Seq("k"), Seq("attr"), "2024-01-01")
    val again = Scd.scd2Merge(once, snap, Seq("k"), Seq("attr"), "2024-06-01")
    val a = once.collect().map(_.toSeq).toSet
    val b = again.collect().map(_.toSeq).toSet
    assert(a == b, "re-applying the same snapshot must change nothing")
  }
}

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bloom-pruned join equals the plain join, even with a tiny lossy bloom") {
    val fact = (1L to 2000L).map(i => (i % 500, s"f$i")).toDF("fk", "payload")
    val dim = (0L to 499L by 7).map(i => (i, s"d$i")).toDF("dk", "name")
    // expectedItems far below reality -> fpp well above nominal; the join
    // must still drop every false positive.
    val got = Joins.bloomPrunedJoin(fact, dim, "fk", "dk",
        expectedItems = 8, fpp = 0.4)
      .select("fk", "payload", "name").collect().map(_.toSeq).toSet
    val want = fact.join(dim, $"fk" === $"dk")
      .select("fk", "payload", "name").collect().map(_.toSeq).toSet
    assert(got == want)
  }

  test("pruning filters the fact side before any join and keeps all matches") {
    val fact = (1L to 1000L).map(i => (i, i)).toDF("fk", "v")
    val dim = (1L to 1000L by 100).map(i => (i, "x")).toDF("dk", "t")
    val pruned = Joins.bloomPrune(fact, dim, "fk", "dk", expectedItems = 100)
    val n = pruned.count()
    assert(n < 1000, s"bloom should prune most of the fact side, kept $n")
    val matching = fact.join(dim, $"fk" === $"dk").select("fk")
      .as[Long].collect().toSet
    val kept = pruned.select("fk").as[Long].collect().toSet
    assert(matching.subsetOf(kept), "a bloom must never drop a true match")
  }

  test("string keys work; unsupported key types fail loudly") {
    val fact = Seq(("a", 1), ("b", 2), ("zz", 3)).toDF("k", "v")
    val dim = Seq(("a", "x"), ("zz", "y")).toDF("dk", "t")
    val out = Joins.bloomPrunedJoin(fact, dim, "k", "dk", expectedItems = 10)
      .select("k", "v", "t").collect().map(_.toSeq).toSet
    assert(out == Set(Seq("a", 1, "x"), Seq("zz", 3, "y")))
    val binFact = Seq((Array[Byte](1), 1)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Joins.bloomPrune(binFact, dim, "k", "dk", expectedItems = 10)
    }
  }
}

class SaltedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals the plain join on a heavily skewed fixture") {
    // one hot key holds 90% of the big side — the shape AQE can't split
    val big = ((1L to 9000L).map(i => (7L, s"hot$i")) ++
      (1L to 1000L).map(i => (i % 50, s"cold$i"))).toDF("k", "payload")
    val small = (0L to 49L).map(i => (i, s"dim$i")).toDF("k", "name")
    val got = Skew.saltedJoin(big, small, Seq("k"), factor = 8)
      .collect().map(_.toSeq).toSet
    val want = big.join(small, Seq("k")).collect().map(_.toSeq).toSet
    assert(got == want)
    // the hot key's rows really spread: >1 distinct salt value
    val salts = big.withColumn("_salt",
        pmod(hash(col("k"), col("payload")), lit(8)))
      .filter($"k" === 7L).select("_salt").distinct().count()
    assert(salts > 1, "salting must spread the hot key over reducers")
  }

  test("left join keeps unmatched rows exactly once; bad args rejected") {
    val big = Seq((1L, "a"), (99L, "nomatch"), (99L, "nomatch2"))
      .toDF("k", "payload")
    val small = Seq((1L, "dim1")).toDF("k", "name")
    val got = Skew.saltedJoin(big, small, Seq("k"), factor = 4, "left")
      .collect().map(_.toSeq).toSet
    val want = big.join(small, Seq("k"), "left").collect().map(_.toSeq).toSet
    assert(got == want)
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(big, small, Seq("k"), factor = 4, "full")
    }
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(big.withColumn("_salt", lit(1)), small, Seq("k"), 4)
    }
  }
}

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("int8 quantization saturates at ±127, zero vectors stay zero") {
    val df = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.125f)),
      (2L, Array(0f, 0f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.quantizeInt8(df, "vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1),
        r.getSeq[Int](2), r.getDouble(3))).toMap
    val (s1, q1, e1) = out(1L)
    assert(q1 == Seq(64, -127, 32, 16))
    // scale is emitted rounded to 8 decimals
    assert(math.abs(s1 - 1.0 / 127) < 5e-9)
    // per-component error ≤ scale/2 ⇒ L2 error ≤ scale/2·√dim
    assert(e1 <= s1 / 2 * math.sqrt(4) + 1e-9)
    val (s2, q2, e2) = out(2L)
    assert(s2 == 0.0 && q2.forall(_ == 0) && e2 == 0.0)
  }

  test("quantization matches a driver-side reference on random vectors") {
    val rnd = new scala.util.Random(17)
    val vecs = (1L to 50L).map(i =>
      (i, Array.fill(32)((rnd.nextFloat() - 0.5f) * 4f)))
    val got = Similarity.quantizeInt8(vecs.toDF("vec_id", "embedding"),
        "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](2)).toMap
    vecs.foreach { case (id, v) =>
      val s = v.map(x => math.abs(x.toDouble)).max / 127.0
      val exp = v.map(x => BigDecimal(x.toDouble / s)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toInt).toSeq
      assert(got(id) == exp, s"vector $id diverged")
      assert(got(id).forall(q => q >= -127 && q <= 127))
    }
  }
}

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("histogram conserves totals and clamps out-of-range into edge buckets") {
    val df = Seq(-5.0, 0.0, 1.0, 9.99, 10.0, 25.0, 99.0, 1000.0).toDF("v")
    val out = Stats.histogram(df, "v", lo = 0.0, hi = 100.0, bins = 10)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2),
        r.getLong(3))).toMap
    assert(out.values.map(_._3).sum == 8L, "every row lands in some bucket")
    assert(out(0L) == ((0.0, 10.0, 4L)))   // -5 clamps down; [0,10) holds 3
    assert(out(9L) == ((90.0, 100.0, 2L))) // 1000 clamps up; 99 in range
    assert(out(2L)._3 == 1L && out(1L)._3 == 1L)
    intercept[IllegalArgumentException](Stats.histogram(df, "v", 5, 5, 10))
  }

  test("profile is identical across partitionings (decimal-exact sums)") {
    val rnd = new scala.util.Random(53)
    val df = Seq.fill(5000)(("g" + rnd.nextInt(3),
      rnd.nextDouble() * 1e8)).toDF("k", "v")
    val a = Stats.profile(df, "k", "v").collect().map(_.toSeq).toSet
    val b = Stats.profile(df.repartition(17), "k", "v")
      .collect().map(_.toSeq).toSet
    assert(a == b, "sum-order drift leaked into the rounded profile")
    a.foreach { row =>
      val std = row(5).asInstanceOf[Double]
      assert(std > 0 && std < 1e8) }
  }

  test("merged batch partials are bit-identical to a full-corpus profile") {
    val rnd = new scala.util.Random(71)
    val rows = Seq.fill(4000)((rnd.nextInt(100).toLong,
      "g" + rnd.nextInt(4), rnd.nextDouble() * 1e7 - 5e6))
    val df = rows.toDF("id", "k", "v")
    val direct = Stats.profile(df, "k", "v").collect().map(_.toSeq).toSet
    // three disjoint ingest batches, profiled independently, merged later
    val parts = (0 until 3).map(i =>
      Stats.profilePartial(df.filter(col("id") % 3 === i), "k", "v"))
    val merged = Stats.profileMerge(parts.reduce(_ unionByName _))
      .collect().map(_.toSeq).toSet
    assert(merged == direct,
      "incremental card drifted from the full-corpus profile")
    // merging a single batch's partial is profile of that batch
    val one = Stats.profileMerge(parts(1)).collect().map(_.toSeq).toSet
    val oneDirect = Stats.profile(df.filter(col("id") % 3 === 1), "k", "v")
      .collect().map(_.toSeq).toSet
    assert(one == oneDirect)
  }

  test("CorpusStatsJob summarizes per language with no join in the plan") {
    val docs = Seq((1L, "the cat sat", "en"), (2L, "der hund", "de"),
      (3L, "the dog ran far", "en")).toDF("doc_id", "text", "lang")
    val out = new graft.jobs.CorpusStatsJob()
      .transform(Map("d" -> docs), spark, Map.empty)
    val rows = out.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2))).toMap
    assert(rows("en") == ((2L, 7L)) && rows("de") == ((1L, 2L)))
    val plan = out.queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("join"), "card must not join the corpus")
  }
}

class FeatureExtractSpec extends SparkSpec {
  import spark.implicits._

  test("byte-block means are exact, unsigned, and zero-padded") {
    val df = Seq(
      (1L, Array.tabulate(16)(_.toByte)),          // 0..15 -> 4 blocks of 4
      (2L, Array[Byte](-1)),                       // 0xff must read as 255
      (3L, Array.tabulate(6)(_.toByte))            // 6 bytes over dim 4: blocks of 2
    ).toDF("doc_id", "payload")
    val out = Multimodal.extractFeatures(df, "doc_id", "payload", dim = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getSeq[Double](2))).toMap
    assert(out(1L) == ((16L, Seq(1.5, 5.5, 9.5, 13.5))))
    assert(out(2L) == ((1L, Seq(255.0, 0.0, 0.0, 0.0))))
    assert(out(3L) == ((6L, Seq(0.5, 2.5, 4.5, 0.0))))
  }

  test("non-integral id column fails loudly instead of dropping rows") {
    val df = Seq(("a", Array[Byte](1))).toDF("doc_id", "payload")
    val e = intercept[IllegalArgumentException] {
      Multimodal.extractFeatures(df, "doc_id", "payload", dim = 4)
    }
    assert(e.getMessage.contains("integral id"))
  }

  test("extracted features feed the similarity/quantization path unchanged") {
    val rnd = new scala.util.Random(41)
    val docs = (1L to 20L).map(i =>
      (i, Array.fill(256)(rnd.nextInt(256).toByte))).toDF("doc_id", "payload")
    val emb = Multimodal.extractFeatures(docs, "doc_id", "payload", dim = 8)
      .select(col("doc_id").as("vec_id"), col("features").as("embedding"))
    val q = Similarity.quantizeInt8(emb, "vec_id", "embedding").collect()
    assert(q.length == 20)
    // byte means sit in [0, 255]; per-component quantization error ≤ scale/2
    q.foreach { r =>
      assert(r.getDouble(3) <= r.getDouble(1) / 2 * math.sqrt(8) + 1e-6) }
  }
}

class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  test("rare-token documents score lower avg_logprob and higher ppl") {
    val docs = Seq(
      (1L, "the cat sat on the mat the cat sat again"),
      (2L, "the dog sat on the rug the dog sat there"),
      (3L, "zyx qwv plk mnb vcx asd")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.unigramLmScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out(1)._1 == 10L)
    assert(out(3)._2 < out(1)._2, "garbage doc must score lower log-prob")
    assert(out(3)._3 > out(1)._3, "garbage doc must have higher perplexity")
  }

  test("scores are stable across partitioning; empty docs are absent") {
    val docs = ((1L to 50L).map(i => (i, "alpha beta gamma delta")) :+
      (99L, "")).toDF("doc_id", "text")
    val a = TextAnalysis.unigramLmScore(docs, "doc_id", "text")
      .collect().map(_.toSeq).toSet
    val b = TextAnalysis.unigramLmScore(docs.repartition(13), "doc_id", "text")
      .collect().map(_.toSeq).toSet
    assert(a == b)
    assert(!a.exists(_.head == 99L), "token-free docs have no score")
    intercept[IllegalArgumentException] {
      TextAnalysis.unigramLmScore(docs, "doc_id", "text", smoothing = 0.0)
    }
  }
}

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("exactly matches the full GROUP BY answer on a skewed stream") {
    // zipf-ish: value v appears ~ 3000/v times
    val rows = (1 to 60).flatMap(v => Seq.fill(3000 / v)(s"w$v"))
    val df = rows.toDF("tok").repartition(13)
    val phi = 0.02
    val n = rows.size.toLong
    val threshold = math.ceil(phi * n).toLong
    val want = rows.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= threshold).toMap
    val got = Sketches.heavyHitters(df, "tok", phi)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("values just under the threshold are excluded, counts are exact") {
    // 100 distinct fillers keep MG counters churning; two true hitters
    val rows = Seq.fill(300)("hot") ++ Seq.fill(60)("warm") ++
      (1 to 100).flatMap(v => Seq.fill(3)(s"noise$v"))
    val n = rows.size // 660
    val phi = 0.05    // threshold = 33
    val got = Sketches.heavyHitters(rows.toDF("tok").repartition(7), "tok", phi)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("hot" -> 300L, "warm" -> 60L))
    assert(math.ceil(phi * n) <= 60)
  }

  test("heavyHitters matches exact counts on random zipf-ish data") {
    val rnd = new scala.util.Random(31)
    for (round <- 1 to 3) {
      // random skew profile: value v drawn with weight ~ 1/(v+1)
      val vals = Seq.fill(4000)(s"t${(4000 / (rnd.nextInt(4000) + 1)) % 97}")
      val phi = Seq(0.01, 0.03, 0.05)(round - 1)
      val threshold = math.ceil(phi * vals.size).toLong
      val expected = vals.groupBy(identity).view.mapValues(_.size.toLong)
        .filter(_._2 >= threshold).toMap
      val got = Sketches.heavyHitters(
          vals.toDF("tok").repartition(rnd.nextInt(15) + 2), "tok", phi)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected, s"random round $round (phi=$phi) diverged")
    }
  }

  test("heavyHittersPerGroup: exact per-group answers under one shared " +
      "sketch pass; groups never cross-talk") {
    val rnd = new scala.util.Random(7)
    // group A: zipf-ish; group B: two planted hitters in heavy noise —
    // thresholds differ per group because the group sizes differ
    val a = (1 to 40).flatMap(v => Seq.fill(2000 / v)(("A", s"w$v")))
    val b = Seq.fill(200)(("B", "hot")) ++ Seq.fill(50)(("B", "warm")) ++
      (1 to 80).flatMap(v => Seq.fill(3)(("B", s"noise$v")))
    val rows = rnd.shuffle(a ++ b)
    val phi = 0.04
    val want = (a ++ b).groupBy(_._1).flatMap { case (g, vs) =>
      val thr = math.ceil(phi * vs.size).toLong
      vs.groupBy(_._2).view.mapValues(_.size.toLong)
        .filter(_._2 >= thr).map { case (v, c) => (g, v) -> c }
    }
    val got = Sketches.heavyHittersPerGroup(
        rows.toDF("src", "tok").repartition(11), "src", "tok", phi)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got === want)
  }

  test("empty input yields an empty frame; phi bounds are enforced") {
    val empty = Seq.empty[String].toDF("tok")
    assert(Sketches.heavyHitters(empty, "tok", 0.01).count() == 0)
    intercept[IllegalArgumentException] {
      Sketches.heavyHitters(empty, "tok", 0.5)
    }
  }

  test("all-unique stream yields no hitters; int key types cast through") {
    val unique = (1 to 500).map(i => s"u$i").toDF("tok").repartition(9)
    assert(Sketches.heavyHitters(unique, "tok", 0.01).count() == 0)
    // integer-typed fact key against a long-typed dim bloom: same
    // integral hash domain, so matches survive
    val fact = (1 to 100).map(i => (i, i)).toDF("fk", "v") // fk is Int
    val dim = Seq((10L, "x"), (20L, "y")).toDF("dk", "t")  // dk is Long
    val kept = Joins.bloomPrune(fact, dim, "fk", "dk", expectedItems = 10)
      .select("fk").collect().map(_.getInt(0)).toSet
    assert(Set(10, 20).subsetOf(kept))
  }
}
