package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Events]] — gap sessionization, ordered funnel, cohort retention on
  * planted fixtures where every boundary case is hand-checkable.
  */
class EventsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String, Long, String, Double)*) =
    rows.toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("ts_s")))
      .drop("ts_s")

  test("sessionize splits on gap strictly greater than the threshold") {
    val df = ev(
      (1L, "2024-01-01 10:00:00", 1L, "view", 1.0),
      (2L, "2024-01-01 10:30:00", 1L, "click", 2.0),   // gap == 1800s: same session
      (3L, "2024-01-01 11:00:01", 1L, "view", 3.0),    // 1801s: new session
      (4L, "2024-01-01 09:00:00", 2L, "view", 5.0))
    val out = Events.sessionize(df, "user_id", "ts", "event_id", "value",
        gapSeconds = 1800L)
      .orderBy("user_id", "session_id")
      .collect()
    assert(out.length === 3)
    val s1 = out(0)
    assert(s1.getAs[Long]("user_id") === 1L)
    assert(s1.getAs[Long]("session_id") === 1L)
    assert(s1.getAs[Long]("n_events") === 2L)
    assert(s1.getAs[Double]("duration_s") === 1800.0)
    assert(s1.getAs[Double]("sum_value") === 3.0)
    assert(out(1).getAs[Long]("session_id") === 2L)
    assert(out(1).getAs[Long]("n_events") === 1L)
    assert(out(2).getAs[Long]("user_id") === 2L)
  }

  test("sessionize breaks ties in ts by event id") {
    val df = ev(
      (2L, "2024-01-01 10:00:00", 1L, "view", 1.0),
      (1L, "2024-01-01 10:00:00", 1L, "click", 2.0),
      (3L, "2024-01-01 12:00:00", 1L, "view", 4.0))
    val out = Events.sessionize(df, "user_id", "ts", "event_id", "value")
      .orderBy("session_id").collect()
    assert(out.map(_.getAs[Long]("n_events")).toSeq === Seq(2L, 1L))
  }

  test("funnel enforces step order, not mere presence") {
    val df = ev(
      // user 1: full ordered funnel
      (1L, "2024-01-01 10:00:00", 1L, "view", 0.0),
      (2L, "2024-01-01 10:01:00", 1L, "click", 0.0),
      (3L, "2024-01-01 10:02:00", 1L, "purchase", 0.0),
      // user 2: purchase BEFORE click — purchase must not count
      (4L, "2024-01-01 10:00:00", 2L, "view", 0.0),
      (5L, "2024-01-01 10:01:00", 2L, "purchase", 0.0),
      (6L, "2024-01-01 10:02:00", 2L, "click", 0.0),
      // user 3: click with no prior view — counts nowhere
      (7L, "2024-01-01 10:00:00", 3L, "click", 0.0))
    val out = Events.funnel(df, "user_id", "ts", "event_id", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy("step_idx").collect()
    assert(out.map(r => (r.getAs[Int]("step_idx"), r.getAs[String]("step"),
      r.getAs[Long]("n_users"))).toSeq ===
      Seq((1, "view", 2L), (2, "click", 2L), (3, "purchase", 1L)))
  }

  test("funnelWithin drops conversions outside the window, first-touch") {
    val df = ev(
      // user 1: click 30 min after view — inside a 1h window
      (1L, "2024-01-01 10:00:00", 1L, "view", 0.0),
      (2L, "2024-01-01 10:30:00", 1L, "click", 0.0),
      // user 2: click 2h after view — outside
      (3L, "2024-01-01 10:00:00", 2L, "view", 0.0),
      (4L, "2024-01-01 12:00:00", 2L, "click", 0.0),
      // user 3: FIRST view at 10:00, second at 11:30; click at 12:00 is
      // within 1h of the SECOND view but first-touch anchors at the
      // first — no conversion
      (5L, "2024-01-01 10:00:00", 3L, "view", 0.0),
      (6L, "2024-01-01 11:30:00", 3L, "view", 0.0),
      (7L, "2024-01-01 12:00:00", 3L, "click", 0.0))
    val out = Events.funnelWithin(df, "user_id", "ts", "event_id",
        "event_type", Seq("view", "click"), withinSeconds = 3600)
      .orderBy("step_idx").collect()
    assert(out.map(r => (r.getAs[Int]("step_idx"),
      r.getAs[Long]("n_users"))).toSeq === Seq((1, 3L), (2, 1L)))
    // boundary: exactly at the window edge still converts (inclusive)
    val edge = ev(
      (1L, "2024-01-01 10:00:00", 1L, "view", 0.0),
      (2L, "2024-01-01 11:00:00", 1L, "click", 0.0))
    val eo = Events.funnelWithin(edge, "user_id", "ts", "event_id",
        "event_type", Seq("view", "click"), withinSeconds = 3600)
      .orderBy("step_idx").collect()
    assert(eo.map(_.getAs[Long]("n_users")).toSeq === Seq(1L, 1L))
  }

  test("activeUsersSketch is exact below k and lands near the exact " +
      "counts above it") {
    val rnd = new scala.util.Random(9)
    // 14 days, 5..120 distinct users/day from a 400-user pool
    val rows = (0 until 14).flatMap { d =>
      val n = 5 + rnd.nextInt(116)
      (0 until n).map { j =>
        (d * 1000L + j, f"2024-02-${d + 1}%02d 0${rnd.nextInt(9)}:00:00",
          (rnd.nextInt(400) + 1).toLong, "view", 0.0)
      }
    }
    val df = ev(rows: _*)
    val exact = Events.activeUsers(df, "user_id", "ts", Seq(1, 7))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("au_1d"), r.getAs[Long]("au_7d"))).toMap
    val sk = Events.activeUsersSketch(df, "user_id", "ts", Seq(1, 7),
        k = 64)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("au_1d_est"), r.getAs[Double]("au_7d_est"))).toMap
    assert(sk.keySet == exact.keySet)
    sk.foreach { case (day, (e1, e7)) =>
      val (x1, x7) = exact(day)
      // sub-k windows are EXACT by construction
      if (x1 < 64) assert(e1 == x1.toDouble, s"$day 1d: $e1 != $x1")
      // k=64 → ~1/sqrt(62) ≈ 13% relative error; allow 3 sigma
      assert(math.abs(e7 - x7) / x7 < 0.4, s"$day 7d: est $e7 vs $x7")
    }
    // at least one window actually exercised the estimator branch
    assert(exact.values.exists(_._2 >= 64))
  }

  test("cohort retention offsets from each user's first day") {
    val df = ev(
      (1L, "2024-01-01 10:00:00", 1L, "view", 0.0),
      (2L, "2024-01-03 10:00:00", 1L, "view", 0.0),
      (3L, "2024-01-03 11:00:00", 1L, "click", 0.0), // same user+day: 1 distinct
      (4L, "2024-01-03 10:00:00", 2L, "view", 0.0))
    val out = Events.cohortRetention(df, "user_id", "ts")
      .orderBy("cohort", "offset_days").collect()
    assert(out.map(r => (r.getAs[String]("cohort"), r.getAs[Int]("offset_days"),
      r.getAs[Long]("n_users"))).toSeq ===
      Seq(("2024-01-01", 0, 1L), ("2024-01-01", 2, 1L), ("2024-01-03", 0, 1L)))
  }

  test("sessionize plan shuffles once on the user key") {
    val df = ev((1L, "2024-01-01 10:00:00", 1L, "view", 1.0),
      (2L, "2024-01-01 10:05:00", 1L, "click", 2.0))
    val plan = Events.sessionize(df, "user_id", "ts", "event_id", "value")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected a single user-key shuffle, plan:\n$plan")
  }
}

/** [[Dedup.keepBestPerCluster]] / [[Dedup.dropNearDuplicatesKeepBest]] —
  * representative election on planted clusters.
  */
class KeepBestSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("highest quality wins; ties fall to the lowest id") {
    val docs = Seq((1L, 10L), (2L, 30L), (3L, 30L), (4L, 5L), (9L, 7L))
      .toDF("doc_id", "q")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a_id", "b_id")
    val out = graft.ops.Dedup
      .keepBestPerCluster(docs, pairs, "doc_id", col("q"))
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("comp") === 1L)
    assert(r.getAs[Long]("n_members") === 3L)
    assert(r.getAs[Long]("kept_id") === 2L) // q=30 tie between 2 and 3
    assert(r.getAs[Long]("kept_q") === 30L)
  }

  test("dropNearDuplicatesKeepBest keeps the best member and all singletons") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, base, 10L),
      (2L, base + " lambda", 99L),          // near-dup of 1, higher quality
      (3L, "completely different text about other things entirely here", 1L))
      .toDF("doc_id", "text", "q")
    val kept = graft.ops.Dedup
      .dropNearDuplicatesKeepBest(docs, "doc_id", "text", col("q"),
        threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(2L, 3L))
  }
}

/** [[Events.activeUsers]] and [[graft.ops.Sampling.tokenBudgetSample]]. */
class ActiveUsersSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("rolling windows count trailing distinct users on observed days only") {
    val df = Seq(
      (1L, "2024-01-01 10:00:00"), (2L, "2024-01-01 11:00:00"),
      (1L, "2024-01-02 10:00:00"),
      (3L, "2024-01-09 10:00:00")) // day 8 gap: u1/u2 out of the 7d window
      .toDF("user_id", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = Events.activeUsers(df, "user_id", "ts", windows = Seq(1, 7))
      .orderBy("day")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      ("2024-01-01", 2L, 2L),   // u1,u2 that day
      ("2024-01-02", 1L, 2L),   // u1 active; u2 within 7d
      ("2024-01-09", 1L, 1L)))  // only u3; Jan 1/2 outside 7d trailing
    // ghost days (Jan 3..8) must not appear
    assert(out.length === 3)
  }

  test("tokenBudgetSample keeps a deterministic prefix that reaches budget") {
    val docs = (1L to 100L).map(i => (i, "g", 10L)).toDF("id", "grp", "n_tok")
    val kept = graft.ops.Sampling
      .tokenBudgetSample(docs, "id", "grp", "n_tok", 55L)
      .select("id").as[Long].collect().toSet
    // 10 tokens each: rows with <55 consumed before them = first 6 by hash
    assert(kept.size === 6)
    val kept2 = graft.ops.Sampling
      .tokenBudgetSample(docs.repartition(7), "id", "grp", "n_tok", 55L)
      .select("id").as[Long].collect().toSet
    assert(kept === kept2) // rerun/partitioning stable
  }

  test("tokenBudgetSample budgets per group independently") {
    val docs = Seq((1L, "a", 30L), (2L, "a", 30L), (3L, "b", 30L))
      .toDF("id", "grp", "n_tok")
    val kept = graft.ops.Sampling
      .tokenBudgetSample(docs, "id", "grp", "n_tok", 31L)
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(kept("a") === 2L) // 0 < 31 and 30 < 31: both kept
    assert(kept("b") === 1L)
  }
}
