package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Checks.kAnonymity]] / [[Checks.freshness]] — governance gates on
  * planted fixtures.
  */
class GovernanceChecksSpec extends SparkSpec {
  import spark.implicits._

  test("kAnonymity counts sub-k groups and their rows") {
    val df = Seq(
      ("US", "A"), ("US", "A"), ("US", "A"),   // group of 3: ok at k=2
      ("US", "B"),                             // singleton: violates
      ("FR", "A"), ("FR", "A"),                // group of 2: ok
      ("FR", "B")                              // singleton: violates
    ).toDF("country", "seg")
    val r = Checks.kAnonymity(df, Seq("country", "seg"), k = 2L).head()
    assert(r.getAs[Long]("n_rows") === 7L)
    assert(r.getAs[Long]("n_groups") === 4L)
    assert(r.getAs[Long]("n_violating_groups") === 2L)
    assert(r.getAs[Long]("rows_at_risk") === 2L)
    assert(r.getAs[Long]("min_group_size") === 1L)
    assert(!r.getAs[Boolean]("k_anonymous"))

    val v = Checks.kAnonymityViolations(df, Seq("country", "seg"), k = 2L)
      .collect().map(r => (r.getAs[String]("country"), r.getAs[String]("seg")))
    assert(v.toSet === Set(("US", "B"), ("FR", "B")))
  }

  test("a k-anonymous release reports clean") {
    val df = Seq.fill(4)(("US", "A")).toDF("country", "seg")
    val r = Checks.kAnonymity(df, Seq("country", "seg"), k = 3L).head()
    assert(r.getAs[Boolean]("k_anonymous"))
    assert(r.getAs[Long]("rows_at_risk") === 0L)
  }

  test("freshness compares against the as-of parameter, inclusive SLA") {
    val df = Seq(
      ("a", "2024-01-01 11:00:00"),   // lag 3600 == SLA: fresh (inclusive)
      ("b", "2024-01-01 10:59:59"),   // lag 3601: stale
      ("b", "2024-01-01 09:00:00"))   // older row must not win the max
      .toDF("k", "ts_s").withColumn("ts", to_timestamp(col("ts_s")))
    val out = Checks.freshness(df, "k", "ts", "2024-01-01 12:00:00", 3600L)
      .orderBy("grp").collect()
    assert(out(0).getAs[Long]("lag_s") === 3600L)
    assert(out(0).getAs[Boolean]("fresh"))
    assert(out(1).getAs[Long]("lag_s") === 3601L)
    assert(!out(1).getAs[Boolean]("fresh"))
    assert(out(1).getAs[String]("max_ts").startsWith("2024-01-01 10:59:59"))
  }
}

/** [[Scd.scd1Upsert]] — last-write-wins merge semantics. */
class Scd1UpsertSpec extends SparkSpec {
  import spark.implicits._

  test("latest change wins, inserts land, untouched rows pass through") {
    val dim = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq(
      (1L, "a1", 10L), (1L, "a2", 20L),  // two versions: seq 20 wins
      (9L, "new", 5L))                   // insert
      .toDF("k", "v", "seq")
    val out = Scd.scd1Upsert(dim, changes, Seq("k"), Seq("seq"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq === Seq((1L, "a2"), (2L, "b"), (3L, "c"), (9L, "new")))
  }

  test("ordering columns compose lexicographically") {
    val dim = Seq((1L, "old")).toDF("k", "v")
    val changes = Seq((1L, "x", 1L, 9L), (1L, "y", 2L, 0L))
      .toDF("k", "v", "major", "minor")
    val out = Scd.scd1Upsert(dim, changes, Seq("k"), Seq("major", "minor"))
      .collect()
    assert(out.head.getAs[String]("v") === "y") // major 2 beats (1, 9)
  }

  test("the order column is dropped unless the dimension carries it") {
    val dim = Seq((1L, "a")).toDF("k", "v")
    val changes = Seq((1L, "b", 1L)).toDF("k", "v", "seq")
    val out = Scd.scd1Upsert(dim, changes, Seq("k"), Seq("seq"))
    assert(out.columns.toSeq === Seq("k", "v"))
  }
}

/** [[Checks.lDiversity]] — homogeneity-attack audit. */
class LDiversitySpec extends SparkSpec {
  import spark.implicits._

  test("a homogeneous group violates even when it is k-large") {
    val df = Seq(
      ("US", "flu"), ("US", "flu"), ("US", "flu"),   // 3 rows, 1 value: violates l=2
      ("FR", "flu"), ("FR", "cold"))                 // 2 distinct: ok
      .toDF("region", "diagnosis")
    val r = Checks.lDiversity(df, Seq("region"), "diagnosis", l = 2L).head()
    assert(r.getAs[Long]("n_groups") === 2L)
    assert(r.getAs[Long]("n_violating_groups") === 1L)
    assert(r.getAs[Long]("rows_at_risk") === 3L)
    assert(r.getAs[Long]("min_distinct_sensitive") === 1L)
    assert(!r.getAs[Boolean]("l_diverse"))
  }
}

/** [[Similarity.retrievalEval]] — recall/RR arithmetic on planted
  * ranked sets.
  */
class RetrievalEvalSpec extends SparkSpec {
  import spark.implicits._

  private def ranked(rows: (Long, Long, Int)*) =
    rows.toDF("probe_id", "cand_id", "rank")

  test("recall counts ground-truth hits; RR is the first hit's rank") {
    val exact = ranked((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3), (1L, 13L, 4))
    // approx finds 12 (at rank 2) and 10 (at rank 3); misses 11, 13
    val approx = ranked((1L, 99L, 1), (1L, 12L, 2), (1L, 10L, 3), (1L, 98L, 4))
    val r = Similarity.retrievalEval(approx, exact).head()
    assert(r.getAs[Long]("n_exact") === 4L)
    assert(r.getAs[Long]("n_hit") === 2L)
    assert(r.getAs[Long]("recall_micro") === 500000L)
    assert(r.getAs[Long]("rr_micro") === 500000L) // first hit at rank 2
  }

  test("a query the index misses entirely reports zeros, not absence") {
    val exact = ranked((1L, 10L, 1), (2L, 20L, 1))
    val approx = ranked((1L, 10L, 1)) // query 2 retrieved nothing relevant
    val out = Similarity.retrievalEval(approx, exact)
      .orderBy("probe_id").collect()
    assert(out.length === 2)
    assert(out(1).getAs[Long]("n_hit") === 0L)
    assert(out(1).getAs[Long]("recall_micro") === 0L)
    assert(out(1).getAs[Long]("rr_micro") === 0L)
    val s = Similarity.retrievalEvalSummary(
      Similarity.retrievalEval(approx, exact)).head()
    assert(s.getAs[Long]("n_queries") === 2L)
    assert(s.getAs[Long]("mean_recall_micro") === 500000L)
    assert(s.getAs[Long]("mean_rr_micro") === 500000L)
  }
}

/** [[Similarity.embeddingOutliers]] — the exact pipeline flags the
  * planted far vector and nothing else.
  */
class EmbeddingOutliersSpec extends SparkSpec {
  import spark.implicits._

  test("a far-from-centroid vector flags; the tight cluster does not") {
    // label 0: eight near-identical vectors + one planted far point.
    val base = (1L to 8L).map(i =>
      (i, Array(1.0f + i * 0.001f, 1.0f), 0))
    val far = Seq((99L, Array(5.0f, -3.0f), 0))
    val df = (base ++ far).toDF("vec_id", "embedding", "label")
    val out = Similarity.embeddingOutliers(df, "vec_id", "embedding", "label",
      z = 2.0).collect()
    val flagged = out.filter(_.getAs[Boolean]("is_outlier"))
      .map(_.getAs[Long]("vec_id"))
    assert(flagged.toSeq === Seq(99L))
    // distances are exact micro-units: the far point dominates
    val d = out.map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("dist_micro")).toMap
    // (the planted point drags the shared centroid, so the honest ratio
    // is ~8x here, not the naive 10/0.001)
    assert(d(99L) > 5 * d.filter(_._1 != 99L).values.max)
  }

  test("labels are independent: an outlier in one never flags the other") {
    val a = (1L to 6L).map(i => (i, Array(0.0f, 0.0f), 0))
    val b = (11L to 16L).map(i => (i, Array(10.0f, 10.0f), 1))
    val df = (a ++ b :+ ((99L, Array(3.0f, 3.0f), 0))).toDF("vec_id", "embedding", "label")
    val out = Similarity.embeddingOutliers(df, "vec_id", "embedding", "label")
    val flagged = out.filter(col("is_outlier")).collect()
      .map(_.getAs[Long]("vec_id"))
    assert(flagged.toSeq === Seq(99L))
  }

  test("zero variance never divides by zero or flags the identical cluster") {
    val df = (1L to 5L).map(i => (i, Array(2.0f, 2.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.embeddingOutliers(df, "vec_id", "embedding", "label")
      .collect()
    assert(out.forall(!_.getAs[Boolean]("is_outlier")))
    assert(out.forall(_.getAs[Long]("dist_micro") === 0L))
  }
}
