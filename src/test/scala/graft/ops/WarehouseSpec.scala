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

  test("empty input yields an empty frame; phi bounds are enforced") {
    val empty = Seq.empty[String].toDF("tok")
    assert(Sketches.heavyHitters(empty, "tok", 0.01).count() == 0)
    intercept[IllegalArgumentException] {
      Sketches.heavyHitters(empty, "tok", 0.5)
    }
  }
}
